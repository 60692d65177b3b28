"""Smoke + semantics tests for the relational core (sf0.001). The heavy
cross-engine check lives in tools/check_oracle.py (and the driver's t2);
these tests pin Spark-side semantics and plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_poc_spark import registry
from data_ingestion_poc_spark.operators.filters import SANITIZE_GOLDEN, sanitize_col


def test_flagship_shape(spark, sf_dir):
    df = registry.get("agg_hash_group").fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    assert rows[0]["count_order"] > 0
    assert set(df.columns) == {
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "sum_charge", "avg_qty", "avg_price", "avg_disc",
        "count_order",
    }


def test_sanitize_golden_cases(spark):
    """The reference's nine unit tests (tests/test_basic.py:18-80), run
    through the Column-expression port."""
    df = spark.createDataFrame(
        [(i, raw) for i, raw, _ in SANITIZE_GOLDEN], "input_id int, raw string"
    ).select("input_id", sanitize_col(F.col("raw")).alias("got"))
    got = {r["input_id"]: r["got"] for r in df.collect()}
    for i, _, expected in SANITIZE_GOLDEN:
        assert got[i] == expected, f"case {i}: {got[i]!r} != {expected!r}"


def test_topk_is_take_ordered(spark, sf_dir):
    df = registry.get("limit_topk").fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_broadcast_join_plan(spark, sf_dir):
    df = registry.get("join_broadcast").fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_scan_pushdown(spark, sf_dir):
    """Filter + projection must reach the parquet scan."""
    df = registry.get("scan_parquet").fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "LessThanOrEqual(l_quantity" in plan


def test_asof_join_semantics(spark, sf_dir):
    """Every purchase maps to the latest prior click of the same user."""
    res = registry.get("join_asof_time").fn(spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = {r["event_id"]: r for r in ev.where("event_type='purchase'").collect()}
    clicks = ev.where("event_type='click'").collect()
    checked = 0
    for row in res.limit(2000).collect():
        p = purchases[row["event_id"]]
        prior = [c for c in clicks if c["user_id"] == p["user_id"] and c["ts"] <= p["ts"]]
        expect = max(prior, key=lambda c: (c["ts"], c["event_id"]))["event_id"] if prior else None
        assert row["click_id"] == expect
        checked += 1
    assert checked > 0


def test_dedup_clusters_partitions_pair_graph(spark, sf_dir):
    """Connected-components invariants: every cluster_id is the min
    doc_id of its members, both endpoints of every near-dup pair land in
    the same cluster, and cluster_size matches the member count."""
    pairs = registry.get("dedup_ngram_jaccard").fn(spark, sf_dir)
    clusters = registry.get("dedup_clusters").fn(spark, sf_dir)
    members: dict[int, int] = {}
    sizes: dict[int, int] = {}
    for r in clusters.collect():
        members[r["doc_id"]] = r["cluster_id"]
        sizes[r["cluster_id"]] = r["cluster_size"]
    assert members, "expected at least one near-dup cluster in fixtures"
    for doc_a, doc_b in [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]:
        assert members[doc_a] == members[doc_b]
    by_cluster: dict[int, list[int]] = {}
    for doc, cl in members.items():
        by_cluster.setdefault(cl, []).append(doc)
    for cl, docs in by_cluster.items():
        assert cl == min(docs)
        assert sizes[cl] == len(docs)


def test_hll_sketch_merge_accuracy(spark, sf_dir):
    """Merged per-nation sketches must estimate the global distinct count
    within HLL error bounds (lgConfigK=12 => ~1.6% rsd; allow 5%)."""
    row = registry.get("agg_hll_sketch").fn(spark, sf_dir).collect()[0]
    exact = row["n_customers"]  # c_custkey is unique per customer row
    assert row["n_sketches"] == 25
    assert abs(row["merged_distinct"] - exact) <= 0.05 * exact


def test_minhash_recall_accounting(spark, sf_dir):
    """The recall report must agree with its inputs: exact_pairs matches
    dedup_ngram_jaccard's row count, lsh_pairs + missed_pairs = exact_pairs,
    and the banded-LSH recall on the planted fixtures stays high (the
    8x4-band S-curve is steep above s=0.5, where the planted dups live)."""
    exact_n = registry.get("dedup_ngram_jaccard").fn(spark, sf_dir).count()
    row = registry.get("dedup_minhash_recall").fn(spark, sf_dir).collect()[0]
    assert row["exact_pairs"] == exact_n
    assert row["lsh_pairs"] + row["missed_pairs"] == row["exact_pairs"]
    assert row["recall_pct"] >= 80.0


def test_ann_recall_multiprobe_dominates(spark, sf_dir):
    """Recall@10 per query: multi-probe candidates are a superset of
    single-probe (same bucket always probed), so its recall can never be
    lower; the report must show both variants for all 5 queries and be
    deterministic across runs (seeded hyperplanes, no RNG)."""
    fn = registry.get("sim_search_recall").fn
    rows = fn(spark, sf_dir).collect()
    assert len(rows) == 10
    by_variant = {}
    for r in rows:
        by_variant.setdefault(r["variant"], {})[r["query_id"]] = r
    assert set(by_variant) == {"single_probe", "multi_probe"}
    for qid, single in by_variant["single_probe"].items():
        multi = by_variant["multi_probe"][qid]
        assert single["exact_k"] == 10 and multi["exact_k"] == 10
        assert multi["ann_hits"] >= single["ann_hits"]
    again = {(r["variant"], r["query_id"]): r["ann_hits"] for r in fn(spark, sf_dir).collect()}
    assert again == {(r["variant"], r["query_id"]): r["ann_hits"] for r in rows}


def test_pca_projection_invariants(spark, sf_dir):
    """embed_pca_project is rows-only (no SQL eigensolve), so pin the
    linear-algebra contract instead: projections are deterministic
    across runs, the two components are uncorrelated (orthogonal
    directions => ~zero dot of projection vectors over the data), and
    pc1 captures at least as much energy as pc2."""
    from data_ingestion_poc_spark import registry

    fn = registry.get("embed_pca_project").fn
    rows = {r["vec_id"]: (r["pc1"], r["pc2"]) for r in fn(spark, sf_dir).collect()}
    again = {r["vec_id"]: (r["pc1"], r["pc2"]) for r in fn(spark, sf_dir).collect()}
    assert rows == again
    import math

    n = len(rows)
    e1 = sum(p1 * p1 for p1, _ in rows.values())
    e2 = sum(p2 * p2 for _, p2 in rows.values())
    cross = sum(p1 * p2 for p1, p2 in rows.values())
    assert e1 >= e2 > 0
    # uncentered PCA on (near) zero-mean data: cross-energy ~ 0 relative
    # to the component energies
    assert abs(cross) < 0.01 * math.sqrt(e1 * e2), (cross, e1, e2)


def test_fuzzy_name_blocking_is_complete(spark, sf_dir):
    """SymSpell deletion-neighborhood blocking must reproduce the exact
    brute-force edit-distance pair set (the deletion-variant guarantee:
    ed(a,b) <= t implies a shared <=t-deletion variant), and the candidate
    join must be an equi hash join — no BroadcastNestedLoopJoin."""
    from pyspark.sql import functions as F

    from data_ingestion_poc_spark.catalog import load

    fn = registry.get("dedup_fuzzy_name").fn
    got = {tuple(r) for r in fn(spark, sf_dir).collect()}
    t = load(spark, sf_dir)
    a = t.customer.select(
        F.col("c_custkey").alias("key_a"), F.col("c_name").alias("name_a")
    )
    b = t.customer.select(
        F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b")
    )
    dist = F.levenshtein("name_a", "name_b")
    brute = {
        tuple(r)
        for r in F.broadcast(a)
        .join(b, F.col("key_a") < F.col("key_b"))
        .where(dist <= 2)
        .select("key_a", "key_b", dist.cast("int").alias("edit_dist"))
        .collect()
    }
    assert got == brute and got
    plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_cosine_lsh_subset_and_recall(spark, sf_dir):
    """Banded sign-LSH semantic dedup: every emitted pair must be a true
    cosine>=0.30 pair (post-verify), the recall report must account
    exactly, and the candidate join must be an equi join (no BNLJ)."""
    pairs = registry.get("dedup_embedding_cosine").fn(spark, sf_dir)
    rows = pairs.collect()
    assert rows and all(r["cosine"] >= 0.30 for r in rows)
    rep = registry.get("dedup_embedding_recall").fn(spark, sf_dir).collect()[0]
    from data_ingestion_poc_spark.llm.evaluation import EMB_RECALL_ANCHOR_MOD

    anchored = [r for r in rows if r["vec_a"] % EMB_RECALL_ANCHOR_MOD == 0]
    assert rep["lsh_pairs"] == len(anchored)
    assert rep["lsh_pairs"] + rep["missed_pairs"] == rep["exact_pairs"]
    assert rep["recall_pct"] >= 50.0  # 8x4-band curve at the 0.30 boundary
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_pluggable_fetcher_drives_fetch_stage(spark):
    """The Fetcher protocol (reference child.py:35-81) must be swappable:
    an in-memory fetcher runs through the SAME mapInPandas stage and
    FETCHED_SCHEMA, with stat-vs-read size mismatches and raised errors
    landing in the error channel, never failing the task."""
    from data_ingestion_poc_spark.ingest.pipeline import (
        FETCHED_SCHEMA,
        Fetcher,
        fetch,
        split_verified,
    )

    class MemFetcher(Fetcher):
        BLOBS = {"/ok.bin": b"hello", "/short.bin": b"xy"}

        def stat(self, server, remote_path):
            if remote_path == "/missing.bin":
                raise FileNotFoundError(remote_path)
            # /short.bin advertises 3 bytes but reads 2: A9 must catch it
            return (5 if remote_path == "/ok.bin" else 3), 1700000000

        def read(self, server, remote_path):
            return self.BLOBS[remote_path]

    manifest = [
        ("ftp://u:p@host:21", "/ok.bin"),
        ("ftp://u:p@host:21", "/short.bin"),
        ("ftp://u:p@host:21", "/missing.bin"),
    ]
    fetched = fetch(spark, manifest=manifest, n_batches=2, fetcher=MemFetcher())
    assert fetched.schema.simpleString() == (
        "struct<" + FETCHED_SCHEMA.replace(" string", ":string")
        .replace(" binary", ":binary").replace(" bigint", ":bigint")
        .replace(", ", ",") + ">"
    )
    ok, quarantine = split_verified(fetched)
    assert {r["remote_path"] for r in ok.collect()} == {"/ok.bin"}
    q = {r["remote_path"]: r["error"] for r in quarantine.collect()}
    assert set(q) == {"/short.bin", "/missing.bin"}
    assert q["/short.bin"] == "size mismatch"
    assert q["/missing.bin"].startswith("FileNotFoundError")


def test_token_budget_is_greedy_prefix(spark, sf_dir):
    """corpus_token_budget invariants: the kept set is exactly the
    longest-first prefix (every kept doc ranks above every dropped doc in
    (n_chars DESC, doc_id)), the cumulative sums are internally
    consistent, the budget holds, and the NEXT doc would break it."""
    from data_ingestion_poc_spark.catalog import load
    from data_ingestion_poc_spark.llm.corpus import TOKEN_BUDGET

    kept = {
        r["doc_id"]: r
        for r in registry.get("corpus_token_budget").fn(spark, sf_dir).collect()
    }
    assert kept, "budget should admit at least one doc"
    docs = load(spark, sf_dir).documents.selectExpr(
        "doc_id", "n_chars", "size(split(text, ' ')) AS tok_len"
    ).collect()
    order = sorted(docs, key=lambda r: (-r["n_chars"], r["doc_id"]))
    cum = 0
    for i, d in enumerate(order):
        cum += d["tok_len"]
        if cum <= TOKEN_BUDGET:
            assert d["doc_id"] in kept, f"rank-{i} doc missing from prefix"
            assert kept[d["doc_id"]]["cum_tokens"] == cum
        else:
            assert d["doc_id"] not in kept
            break  # first overflow ends the prefix; rest must also be absent
    assert len(kept) == sum(
        1 for i in range(len(order))
        if sum(d["tok_len"] for d in order[: i + 1]) <= TOKEN_BUDGET
    )


def test_mix_report_consistent_with_mix(spark, sf_dir):
    """corpus_mix_report must account exactly for corpus_mix_weighted's
    kept rows, and achieved fractions must be within hash-sampling noise
    of the configured targets (3-sigma binomial bound)."""
    from data_ingestion_poc_spark.llm.corpus import MIX_WEIGHTS

    kept_rows = registry.get("corpus_mix_weighted").fn(spark, sf_dir).collect()
    by_lang: dict[str, int] = {}
    for r in kept_rows:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    report = {
        r["lang"]: r
        for r in registry.get("corpus_mix_report").fn(spark, sf_dir).collect()
    }
    targets = {lang: int(t, 16) / 256 for lang, t in MIX_WEIGHTS}
    for lang, row in report.items():
        assert row["n_kept"] == by_lang.get(lang, 0)
        p = targets[lang]
        sigma = (p * (1 - p) / row["n_total"]) ** 0.5
        assert abs(row["achieved_frac"] - p) <= 3 * sigma + 1 / row["n_total"]


def test_shard_assign_partitions_corpus(spark, sf_dir):
    """corpus_shard_assign invariants: 16 shards, doc counts sum to the
    corpus size, token counts sum to the corpus token total, and no
    shard is empty or pathologically skewed (binomial 5-sigma bound)."""
    from data_ingestion_poc_spark.catalog import load

    rows = registry.get("corpus_shard_assign").fn(spark, sf_dir).collect()
    docs = load(spark, sf_dir).documents
    n_total = docs.count()
    tok_total = docs.selectExpr("sum(size(split(text, ' '))) AS t").collect()[0]["t"]
    assert len(rows) == 16
    assert sum(r["n_docs"] for r in rows) == n_total
    assert sum(r["n_tokens"] for r in rows) == tok_total
    mean = n_total / 16
    bound = 5 * (mean * (1 - 1 / 16)) ** 0.5 + 1
    for r in rows:
        assert abs(r["n_docs"] - mean) <= bound, (r["shard_id"], r["n_docs"])


def test_geo_grid_join_equals_bruteforce(spark):
    """The grid-bucketed radius join must return EXACTLY the brute-force
    cross-join answer (the 1-cell-neighborhood coverage proof made
    executable), and the plan must broadcast the replicated small side
    rather than fall back to a cartesian product."""
    import math

    from data_ingestion_poc_spark.catalog import load
    from data_ingestion_poc_spark.operators.geo import (
        EARTH_RADIUS_KM,
        GEO_RADIUS_KM,
        _LAT_C,
        _LAT_S,
        _LON_C,
        _LON_S,
    )

    sf = "/root/testdata/sf0.01"
    t = load(spark, sf)
    cust = [
        (r["c_custkey"],) for r in t.customer.select("c_custkey").collect()
    ]
    supp = [
        (r["s_suppkey"],) for r in t.supplier.select("s_suppkey").collect()
    ]

    def coords(key, lat_mul, lat_mod, lon_mul, lon_mod):
        return (
            (key * lat_mul) % lat_mod / 100.0 - 60.0,
            (key * lon_mul) % lon_mod / 100.0 - 170.0,
        )

    def hav(a, b):
        (la1, lo1), (la2, lo2) = a, b
        dla = math.radians(la2 - la1) / 2
        dlo = math.radians(lo2 - lo1) / 2
        x = (
            math.sin(dla) ** 2
            + math.cos(math.radians(la1))
            * math.cos(math.radians(la2))
            * math.sin(dlo) ** 2
        )
        return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(x))

    expect = set()
    for (ck,) in cust:
        c = coords(ck, 7919, 12000, 104729, 34000)
        for (sk,) in supp:
            s = coords(sk, 6007, 12000, 31337, 34000)
            if hav(c, s) <= GEO_RADIUS_KM:
                expect.add((ck, sk))
    df = registry.get("join_geo_distance").fn(spark, sf)
    got = {(r["c_custkey"], r["s_suppkey"]) for r in df.collect()}
    assert got == expect and len(got) > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_stateful_decay_recursion_exact(spark, tmp_path):
    """Three constant-value events: hand-computed integer recursion
    10e6 -> 19e6 -> 27.1e6 (floor division at each step)."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), 1, "view", 10.0, None)
        for i in range(3)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = sorted(
        registry.get("udf_stateful_decay").fn(spark, str(tmp_path)).collect(),
        key=lambda r: r["event_id"],
    )
    assert [r["decay_units"] for r in out] == [
        10_000_000,
        19_000_000,
        27_100_000,
    ]


def test_welch_t_test_known_values(spark, tmp_path):
    """purchase=[10,12,14] vs click=[10,10,10]: t = 2/sqrt(4/3) and the
    Welch df collapses to n_a-1 = 2 when one arm has zero variance."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i, v in enumerate([10.0, 12.0, 14.0]):
        rows.append((i, base + datetime.timedelta(minutes=i), 1, "purchase", v, None))
    for i, v in enumerate([10.0, 10.0, 10.0]):
        rows.append((10 + i, base + datetime.timedelta(minutes=i), 2, "click", v, None))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    (r,) = registry.get("agg_t_test").fn(spark, str(tmp_path)).collect()
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert (r["mean_a"], r["mean_b"]) == (12.0, 10.0)
    assert abs(r["t_stat"] - round(2 / (4 / 3) ** 0.5, 4)) < 1e-9
    assert r["welch_df"] == 2.0
    assert not r["significant"]


def test_browse_abandonment_sessions(spark, tmp_path):
    """Session 1 (click, view, no purchase) is abandoned; after a 40-min
    gap session 2 (click then purchase) is not."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    evs = [
        (0, base, "click"),
        (1, base + datetime.timedelta(minutes=5), "view"),
        (2, base + datetime.timedelta(minutes=50), "click"),
        (3, base + datetime.timedelta(minutes=55), "purchase"),
    ]
    spark.createDataFrame(
        [(i, ts, 1, et, 1.0, None) for i, ts, et in evs],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r["session_no"]: r
        for r in registry.get("q_browse_abandonment").fn(spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["abandoned"] and out[1]["n_clicks"] == 1 and out[1]["n_purchases"] == 0
    assert not out[2]["abandoned"] and out[2]["n_purchases"] == 1


def test_mann_whitney_known_values(spark, tmp_path):
    """a=[1,2,3] vs b=[4,5,6]: U_a = 0, z = -4.5/sqrt(5.25); with ties
    a=[1,1] vs b=[1,2] the midrank rule gives U_a = 1."""
    import datetime

    base = datetime.datetime(2024, 1, 1)

    def write(avals, bvals):
        rows = []
        for i, v in enumerate(avals):
            rows.append((i, base + datetime.timedelta(minutes=i), 1, "purchase", float(v), None))
        for i, v in enumerate(bvals):
            rows.append((100 + i, base + datetime.timedelta(minutes=i), 2, "click", float(v), None))
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    write([1, 2, 3], [4, 5, 6])
    (r,) = registry.get("agg_mann_whitney").fn(spark, str(tmp_path)).collect()
    assert r["u_a"] == 0.0
    import math

    z = -4.5 / math.sqrt(5.25)
    assert abs(r["z_stat"] - math.floor(z * 10000) / 10000) < 1e-9
    assert r["significant"] == (abs(z) > 1.96)

    write([1, 1], [1, 2])
    (r,) = registry.get("agg_mann_whitney").fn(spark, str(tmp_path)).collect()
    assert r["u_a"] == 1.0 and not r["significant"]


def test_ks_test_known_values(spark, tmp_path):
    """a=[1,2,3,4] vs b=[3,4,5,6]: ECDFs diverge most at value 2 where
    F_a=0.5, F_b=0 -> D=0.5; crit = 1.36*sqrt(8/16) ~ 0.9617 -> not
    significant at these tiny n."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i, v in enumerate([1, 2, 3, 4]):
        rows.append((i, base + datetime.timedelta(minutes=i), 1, "purchase", float(v), None))
    for i, v in enumerate([3, 4, 5, 6]):
        rows.append((10 + i, base + datetime.timedelta(minutes=i), 2, "click", float(v), None))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    (r,) = registry.get("agg_ks_test").fn(spark, str(tmp_path)).collect()
    assert (r["n_a"], r["n_b"]) == (4, 4)
    assert r["d_stat"] == 0.5
    import math

    crit = 1.36 * math.sqrt(8 / 16)
    assert abs(r["d_crit"] - math.floor(crit * 10000) / 10000) < 1e-9
    assert not r["significant"]


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))


def test_chi_squared_known_values(spark, tmp_path):
    """2x2 table [[30,10],[10,30]]: all expected cells are 20, chi2 =
    4 * 10^2/20 = 20, dof = 1, Cramer's V = sqrt(20/80) = 0.5. The
    'dependent' flag selects the critical value matching the EMITTED
    dof (r6 ADVICE fix), so this 2x2 table is judged against the dof-1
    critical value: 20 > 3.8415 -> True."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    k = 0
    for pri, sta, n in [("A", "X", 30), ("A", "Y", 10), ("B", "X", 10), ("B", "Y", 30)]:
        for _ in range(n):
            rows.append((k, 1, sta, 100.0, base, pri))
            k += 1
    _write_orders(spark, tmp_path, rows)
    out = registry.get("agg_chi_squared").fn(spark, str(tmp_path)).collect()
    assert len(out) == 4
    r = out[0]
    assert r["chi2_total"] == 20.0
    assert r["dof"] == 1
    assert r["cramers_v"] == 0.5
    assert r["dependent"]
    by_cell = {(x["o_orderpriority"], x["o_orderstatus"]): x for x in out}
    assert by_cell[("A", "X")]["obs"] == 30
    assert by_cell[("A", "X")]["expected"] == 20.0
    assert by_cell[("A", "X")]["chi2_term"] == 5.0


def test_gini_known_values(spark, tmp_path):
    """Equal values -> Gini 0; [1,1,1,97] -> 2*394/400 - 5/4 = 0.72."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [(i, 1, "O", 5.0, base, "EQ") for i in range(10)]
    rows += [
        (100 + i, 1, "O", v, base, "SKEW")
        for i, v in enumerate([1.0, 1.0, 1.0, 97.0])
    ]
    _write_orders(spark, tmp_path, rows)
    out = {
        r["o_orderpriority"]: r
        for r in registry.get("agg_gini").fn(spark, str(tmp_path)).collect()
    }
    assert out["EQ"]["gini"] == 0.0
    assert out["EQ"]["n"] == 10 and out["EQ"]["total_price"] == 50.0
    assert out["SKEW"]["gini"] == 0.72
    assert out["SKEW"]["total_price"] == 100.0


def test_benford_known_values(spark, tmp_path):
    """Leading digits from CENTS strings: 1.00->1, 25.00->2, 123.45->1,
    9.99->9; shares .5/.25/.25. ALL NINE digits are emitted — digits
    absent from the data contribute their full expected share to the
    MAD (zero-filled domain join, the r6 ADVICE fix), so MAD =
    (0.199 + 0.0739 + 0.2042 + 0.1249 + 0.0969 + 0.0792 + 0.067
     + 0.058 + 0.0512)/9 = 0.106."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    vals = [1.00, 25.00, 123.45, 9.99]
    rows = [(i, 1, "O", v, base, "P") for i, v in enumerate(vals)]
    _write_orders(spark, tmp_path, rows)
    out = {
        r["digit"]: r
        for r in registry.get("agg_benford").fn(spark, str(tmp_path)).collect()
    }
    assert set(out) == {str(d) for d in range(1, 10)}
    assert out["1"]["n"] == 2 and out["1"]["obs_share"] == 0.5
    assert out["1"]["benford_share"] == 0.30103
    assert out["1"]["abs_dev"] == 0.199
    assert out["9"]["abs_dev"] == 0.2042
    assert out["3"]["n"] == 0 and out["3"]["abs_dev"] == 0.1249
    assert out["1"]["mad"] == out["3"]["mad"] == 0.106


def test_geo_knn_matches_bruteforce_topk(spark):
    """join_geo_knn must return exactly the brute-force per-customer
    top-3-within-R ranking, and keep the broadcast grid plan."""
    import math

    from data_ingestion_poc_spark.catalog import load
    from data_ingestion_poc_spark.operators.geo import (
        EARTH_RADIUS_KM,
        GEO_KNN_K,
        GEO_RADIUS_KM,
    )

    sf = "/root/testdata/sf0.01"
    t = load(spark, sf)
    cust = [r["c_custkey"] for r in t.customer.select("c_custkey").collect()]
    supp = [r["s_suppkey"] for r in t.supplier.select("s_suppkey").collect()]

    def coords(key, lat_mul, lon_mul):
        return (
            (key * lat_mul) % 12000 / 100.0 - 60.0,
            (key * lon_mul) % 34000 / 100.0 - 170.0,
        )

    def hav(a, b):
        (la1, lo1), (la2, lo2) = a, b
        dla = math.radians(la2 - la1) / 2
        dlo = math.radians(lo2 - lo1) / 2
        x = (
            math.sin(dla) ** 2
            + math.cos(math.radians(la1))
            * math.cos(math.radians(la2))
            * math.sin(dlo) ** 2
        )
        return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(x))

    expect = set()
    for ck in cust:
        c = coords(ck, 7919, 104729)
        cands = sorted(
            (hav(c, coords(sk, 6007, 31337)), sk)
            for sk in supp
            if hav(c, coords(sk, 6007, 31337)) <= GEO_RADIUS_KM
        )
        for rnk, (_, sk) in enumerate(cands[:GEO_KNN_K], start=1):
            expect.add((ck, sk, rnk))
    df = registry.get("join_geo_knn").fn(spark, sf)
    got = {(r["c_custkey"], r["s_suppkey"], r["rnk"]) for r in df.collect()}
    assert got == expect and len(got) > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_mutual_info_known_values(spark, tmp_path):
    """Independent 2x2 [[25,25],[25,25]] -> MI = 0, NMI = 0; perfectly
    dependent [[30,0],[0,30]] -> MI = 1 bit, NMI = 1."""
    import datetime

    base = datetime.datetime(2024, 1, 1)

    def write(cells):
        rows, k = [], 0
        for pri, sta, n in cells:
            for _ in range(n):
                rows.append((k, 1, sta, 100.0, base, pri))
                k += 1
        _write_orders(spark, tmp_path, rows)

    write([("A", "X", 25), ("A", "Y", 25), ("B", "X", 25), ("B", "Y", 25)])
    out = registry.get("agg_mutual_info").fn(spark, str(tmp_path)).collect()
    assert len(out) == 4
    assert out[0]["mi_bits"] == 0.0 and out[0]["nmi"] == 0.0
    assert out[0]["h_priority"] == out[0]["h_status"] == 1.0
    assert all(r["pmi"] == 0.0 for r in out)

    write([("A", "X", 30), ("B", "Y", 30)])
    out = registry.get("agg_mutual_info").fn(spark, str(tmp_path)).collect()
    assert len(out) == 2
    assert out[0]["mi_bits"] == 1.0 and out[0]["nmi"] == 1.0
    assert all(r["pmi"] == 1.0 for r in out)


def test_hhi_known_values(spark, tmp_path):
    """One segment, two customers with revenue 3:1 -> HHI =
    10000*(9+1)/16 = 6250, effective_n = 1.6."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    _write_orders(
        spark,
        tmp_path,
        [
            (1, 10, "O", 2.00, base, "P"),
            (2, 10, "O", 1.00, base, "P"),
            (3, 20, "O", 1.00, base, "P"),
        ],
    )
    spark.createDataFrame(
        [(10, "cust-a", 1, 0.0, "SEG"), (20, "cust-b", 1, 0.0, "SEG")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    (r,) = registry.get("agg_hhi").fn(spark, str(tmp_path)).collect()
    assert r["c_mktsegment"] == "SEG"
    assert r["n_customers"] == 2 and r["total_rev"] == 4.0
    assert r["hhi"] == 6250.0 and r["effective_n"] == 1.6
