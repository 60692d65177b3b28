"""Scaling probe: measure how representative operators scale when the
FACT tables grow 1x -> 4x -> 16x beyond sf0.1 (dims held constant, like a
real star schema where facts dwarf dimensions).

Synthesizes m{K} datasets under /tmp by unioning sf0.1 orders/lineitem K
times with disjoint key offsets (join selectivity and per-key fan-in are
preserved; group-key cardinality stays constant, so aggregates test
map-side partial-combine efficiency). Runs each probe query end-to-end to
a noop sink and reports wall-clock per scale plus the 16x/1x ratio — the
'would this plan survive a 100x scale-up' evidence for BASELINE.md
(linear-ish ratios = shuffle-bound plans are healthy; superlinear = a
plan that breaks at 100 TB).

Usage: python tools/scale_probe.py [--mults 1,4,16]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_ingestion_poc_spark import registry
from data_ingestion_poc_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/dip_scale_probe"
KEY_OFFSET = 10_000_000
DIMS = ["region", "nation", "customer", "supplier", "part",
        "events", "documents", "embeddings"]

PROBES = [
    "agg_hash_group",        # scan + grouped aggregate (constant key card.)
    "join_sort_merge",       # large x large shuffle join + agg
    "q_shipping_priority",   # 3-way join, broadcast dim, top-k
    "q_sole_late_shippers",  # dual grouped aggregate sharing a shuffle
    "win_topk_per_group",    # window shuffle + per-partition sort
]

#: LLM-pipeline probes: corpus (documents/embeddings) grows instead of the
#: relational facts. These are the operators whose cost is NOT linear by
#: construction (LSH candidate pairs, ANN probe lists), so measuring the
#: growth curve is the point.
DOC_PROBES = [
    "dedup_exact_hash",      # digest groupBy: linear scan + hash agg
    "dedup_minhash",         # banded LSH: candidate pairs grow w/ corpus
    "text_tokenize_tf",      # explode + word count: linear in tokens
    "text_quality_score",    # pure per-row exprs: linear
    "sim_search_ivf",        # IVF ANN: probe-list re-rank over 10x vectors
    # r3 additions: gram-explode aggregates must stay linear in tokens
    "text_repetition_filter",
    "text_entropy",
    "text_boilerplate_ngrams",
]

#: Event-time probes: events grow horizontally (event_id AND user_id
#: offset, so K x more users with UNCHANGED per-user timeline length) —
#: the regime a growing product sees. Window/funnel/sessionization cost
#: should scale with the one user_id shuffle; per-partition sort depth
#: stays constant by construction.
EVENT_PROBES = [
    "win_sessionize",        # lag-gap flag + running sum, one shuffle
    "q_funnel_conversion",   # 3 stacked windows + agg, one shuffle
    "win_time_range",        # trailing 1-hour RANGE frame at us precision
    "win_ignore_nulls",      # 3 IGNORE NULLS navigations, one window sort
]

#: Skew probes: ONE hot user owns ~50% of all events (--events-skew remaps
#: half the rows to user_id -1 while scaling timelines deeper). The plain
#: per-user window serializes the hot user onto one core (AQE skew
#: splitting rewrites JOINS only — a window partition cannot be split
#: adaptively), so the time-chunked rewrite is the fix to measure.
EVENT_SKEW_PROBES = [
    "win_sessionize",         # per-user window: hot-user straggler
    "win_sessionize_salted",  # (user, hour) chunked + stitch: spreads it
]

#: Hot-shingle probe (--jaccard-hot): every doc copy gets the same
#: appended phrase, so its 3-grams reach df = n_docs. Without the
#: JACCARD_DF_CAP filter the inverted-index self-join would produce
#: C(n_docs, 2) candidate rows from those shingles alone (quadratic);
#: with the cap they are dropped before the join and the probe should
#: scale like the linear-reference digest dedup next to it.
JACCARD_HOT_PROBES = [
    "dedup_ngram_jaccard",   # df-capped inverted index: must stay linear
    "dedup_exact_hash",      # linear reference: digest groupBy
]

#: The phrase appended to every doc in --jaccard-hot mode (4 words =>
#: two shared 3-grams per doc).
HOT_PHRASE = "one of the most"

#: --cc-chain: words per chain doc / word shift between consecutive docs.
#: With 30-word docs and a shift of 8, consecutive docs share ~20 of
#: their 28 3-gram shingles (J ~= 0.55 >= 0.30) while docs two apart
#: share ~12/44 (J ~= 0.27 < 0.30) — so the planted docs form a PATH in
#: the near-dup graph (no chords), i.e. a component whose diameter equals
#: the chain length. That is the adversarial case for min-label
#: propagation (O(diameter) rounds without pointer jumping).
CHAIN_DOC_WORDS = 30
CHAIN_SHIFT = 8


def _cc_chain_probe(spark, chain_len: int) -> None:
    """Plant a chain_len-deep path of near-duplicate docs on top of the
    corpus, run dedup_clusters, and report (a) propagation rounds until
    convergence — the pointer-jumping payoff vs the >= chain_len/2 a
    plain two-hop min-label loop needs — and (b) that the whole chain
    resolved to ONE cluster labeled by its min doc_id (long-chain
    correctness, not just speed)."""
    import pandas as pd

    from data_ingestion_poc_spark.llm import dedup

    out = f"{ROOT}/ccchain{chain_len}"
    docs_src = f"{BASE}/documents.parquet"
    base_docs = spark.read.parquet(docs_src)
    base_max = base_docs.agg(F.max("doc_id")).collect()[0][0]
    words = [f"ccw{i:04d}" for i in range(CHAIN_SHIFT * chain_len + CHAIN_DOC_WORDS)]
    rows = []
    for i in range(chain_len):
        w = words[i * CHAIN_SHIFT : i * CHAIN_SHIFT + CHAIN_DOC_WORDS]
        rows.append(
            {
                "doc_id": base_max + 1 + i,
                "text": " ".join(w),
                "lang": "en",
                "source": "ccchain",
                "n_chars": len(" ".join(w)),
            }
        )
    chain = spark.createDataFrame(pd.DataFrame(rows), schema=base_docs.schema)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for d in DIMS + ["orders", "lineitem"]:
        if d != "documents":
            shutil.copy(f"{BASE}/{d}.parquet", f"{out}/{d}.parquet")
    base_docs.unionByName(chain).coalesce(4).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )

    t0 = time.time()
    labels = registry.all_queries()["dedup_clusters"].fn(spark, out).toPandas()
    wall = time.time() - t0
    chain_lbl = labels[labels.doc_id > base_max]
    ok_one_cluster = (
        len(chain_lbl) == chain_len
        and chain_lbl.cluster_id.nunique() == 1
        and chain_lbl.cluster_id.iloc[0] == base_max + 1
        and int(chain_lbl.cluster_size.iloc[0]) == chain_len
    )
    print(json.dumps({
        "mode": "cc_chain", "chain_len": chain_len,
        "rounds": dedup.LAST_CC_ROUNDS,
        "plain_two_hop_rounds_lower_bound": chain_len // 2,
        "chain_is_one_cluster": bool(ok_one_cluster),
        "seconds": round(wall, 2),
    }))
    if not ok_one_cluster:
        raise SystemExit("cc-chain probe FAILED: chain did not resolve to one cluster")


def _pair_budget_probe(spark, mult: int) -> None:
    """Predictor-vs-actual for the candidate join at docs{mult}
    (VERDICT r7 item 5): run dedup_candidate_budget FIRST (the cheap
    index-build aggregate), then build the shared capped candidate
    frame and compare its actual posting-level join volume
    (sum of n_common over candidate pairs == sum over shingles of
    C(df,2), df<=cap) against the prediction. Exact match required —
    both sides derive from the same shingle universe, so any drift is
    a real bug in one of them. Also times the two output-bound riders
    (corpus_curate_e2e, dedup_threshold_sweep) on the same corpus so
    the wall numbers land next to the budget that predicted them."""
    from data_ingestion_poc_spark.llm import dedup

    sf_dir = build(spark, mult, mode="corpus")
    qs = registry.all_queries()

    t0 = time.time()
    budget = qs["dedup_candidate_budget"].fn(spark, sf_dir).collect()[0]
    t_budget = time.time() - t0

    # actual join volume: stream-through aggregate over the RAW frame
    # (no checkpoint — the 1e8-row adversarial frame never needs to be
    # pinned; the shuffle spills and the agg reduces it to one row)
    t0 = time.time()
    raw = dedup.candidate_frame_from_index(
        dedup._capped_shingle_index(spark, sf_dir)
    )
    actual = raw.agg(
        F.count(F.lit(1)).alias("pairs"),
        F.sum("n_common").cast("bigint").alias("join_rows"),
    ).collect()[0]
    t_raw = time.time() - t0

    # the session-materialized frame the riders actually consume
    # (plausibility-filtered before its checkpoint)
    t0 = time.time()
    kept = dedup.capped_candidate_frame(spark, sf_dir).count()
    t_cand = time.time() - t0

    walls = {}
    for rider in ("dedup_threshold_sweep", "corpus_curate_e2e"):
        t0 = time.time()
        qs[rider].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        walls[rider] = round(time.time() - t0, 2)

    ok = int(budget["candidates_capped"]) == int(actual["join_rows"])
    print(json.dumps({
        "mode": "pair_budget", "mult": mult,
        "predicted_join_rows": int(budget["candidates_capped"]),
        "actual_join_rows": int(actual["join_rows"]),
        "predictor_exact_match": bool(ok),
        "candidate_pairs": int(actual["pairs"]),
        "materialized_pairs": int(kept),
        "uncapped_join_rows": int(budget["candidates_uncapped"]),
        "volume_saved_share": float(budget["volume_saved_share"]),
        "budget_seconds": round(t_budget, 2),
        "raw_volume_agg_seconds": round(t_raw, 2),
        "materialize_seconds": round(t_cand, 2),
        "rider_seconds": walls,
    }))
    if not ok:
        raise SystemExit(
            "pair-budget probe FAILED: predictor != actual join rows"
        )


def _curate_ladder_probe(spark, mult: int) -> None:
    """Corpus-axis endpoint for the CURATION LADDER itself (VERDICT r8
    item 8): at docs{mult}, run dedup_candidate_budget first (the gate —
    its prediction must exactly price the near-dup stage's candidate
    join before the ladder runs it), then corpus_curate_e2e end to end,
    and report the whole-corpus FUNNEL (docs in, dropped per rung,
    survivors, token retention) plus walls. This makes the e2e ladder's
    100x claim a measured artifact of the ladder's own output instead
    of a composition of rider timings."""
    sf_dir = build(spark, mult, mode="corpus")
    qs = registry.all_queries()

    t0 = time.time()
    budget = qs["dedup_candidate_budget"].fn(spark, sf_dir).collect()[0]
    t_budget = time.time() - t0

    t0 = time.time()
    per_source = qs["corpus_curate_e2e"].fn(spark, sf_dir)
    funnel = per_source.agg(
        F.count(F.lit(1)).alias("n_sources"),
        *[
            F.sum(c).cast("bigint").alias(c)
            for c in (
                "n_docs", "n_drop_url", "n_drop_exact", "n_drop_near",
                "n_drop_quality", "n_kept", "raw_tokens", "kept_tokens",
            )
        ],
    ).collect()[0]
    t_ladder = time.time() - t0

    print(json.dumps({
        "mode": "curate_ladder", "mult": mult,
        "predicted_join_rows": int(budget["candidates_capped"]),
        "uncapped_join_rows": int(budget["candidates_uncapped"]),
        "budget_seconds": round(t_budget, 2),
        "ladder_seconds": round(t_ladder, 2),
        "funnel": {k: int(funnel[k]) for k in funnel.asDict()},
        "kept_share": round(funnel["n_kept"] / funnel["n_docs"], 4),
        "token_retention": round(
            funnel["kept_tokens"] / funnel["raw_tokens"], 4
        ),
    }))


def _scale_tables(spark, out: str, mult: int, scaled: dict[str, list[str]]) -> None:
    for tbl, keys in scaled.items():
        base = spark.read.parquet(f"{BASE}/{tbl}.parquet")
        parts = []
        for i in range(mult):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * KEY_OFFSET))
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        # few files per table keeps the layout comparable across mults;
        # spark re-splits by maxPartitionBytes on read anyway
        u.coalesce(max(1, mult // 2)).write.mode("overwrite").parquet(
            f"{out}/{tbl}.parquet"
        )


def build(spark, mult: int, mode: str = "facts") -> str:
    """mode="facts" scales orders/lineitem; "corpus" scales
    documents/embeddings; "events" scales events horizontally (event_id
    AND user_id offset => K x users, constant per-user timeline). Corpus
    copies keep the TEXTS identical (only ids offset), so every doc gains
    K-1 exact duplicates across copies and LSH candidate volume grows
    ~quadratically in K (C(K,2) collisions per original) — deliberately
    the adversarial regime for dedup probes."""
    prefix = {"facts": "m", "corpus": "docs", "events": "ev",
              "events_deep": "evd", "events_skew": "evs",
              "jaccard_hot": "doch"}[mode]
    out = f"{ROOT}/{prefix}{mult}"
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    scaled = {
        "facts": {"orders": ["o_orderkey"], "lineitem": ["l_orderkey"]},
        "corpus": {"documents": ["doc_id"], "embeddings": ["vec_id"]},
        "events": {"events": ["event_id", "user_id"]},
        # deep: only event_id offset => same users, K x longer per-user
        # timelines — the window-state / sort-depth stress axis
        "events_deep": {"events": ["event_id"]},
        "events_skew": {"events": ["event_id"]},
        "jaccard_hot": {"documents": ["doc_id"], "embeddings": ["vec_id"]},
    }[mode]
    for d in [t for t in DIMS + ["orders", "lineitem", "events"] if t not in scaled]:
        shutil.copy(f"{BASE}/{d}.parquet", f"{out}/{d}.parquet")
    _scale_tables(spark, out, mult, scaled)
    if mode == "jaccard_hot":
        # plant the hot shingles: every doc ends with the same phrase
        docs = spark.read.parquet(f"{out}/documents.parquet")
        hot = docs.withColumn(
            "text", F.concat(F.col("text"), F.lit(" " + HOT_PHRASE))
        )
        tmp = f"{out}/documents_hot.parquet"
        hot.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(f"{out}/documents.parquet", ignore_errors=True)
        os.replace(tmp, f"{out}/documents.parquet")
    if mode == "events_skew":
        # remap a deterministic half of all events onto one hot user
        ev = spark.read.parquet(f"{out}/events.parquet")
        skewed = ev.withColumn(
            "user_id",
            F.when(F.pmod(F.xxhash64("event_id"), F.lit(2)) == 0, F.lit(-1))
            .otherwise(F.col("user_id")),
        )
        tmp = f"{out}/events_skewed.parquet"
        skewed.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(f"{out}/events.parquet", ignore_errors=True)
        os.replace(tmp, f"{out}/events.parquet")
    open(os.path.join(out, "_DONE"), "w").write("ok")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,4,16")
    ap.add_argument("--corpus", action="store_true",
                    help="scale documents/embeddings and run the LLM probes")
    ap.add_argument("--events", action="store_true",
                    help="scale events horizontally and run the window probes")
    ap.add_argument("--events-deep", action="store_true",
                    help="scale events vertically (same users, K x longer "
                         "timelines) and run the window probes")
    ap.add_argument("--events-skew", action="store_true",
                    help="one hot user owns ~50% of events; compare the "
                         "plain vs time-chunked sessionize windows")
    ap.add_argument("--jaccard-hot", action="store_true",
                    help="plant a corpus-wide hot shingle; the df-capped "
                         "inverted-index jaccard must stay linear")
    ap.add_argument("--cc-chain", type=int, default=0, metavar="LEN",
                    help="plant a LEN-deep near-dup chain and report "
                         "dedup_clusters propagation rounds + correctness")
    ap.add_argument("--curate-ladder", type=int, default=0, metavar="MULT",
                    help="docs{MULT} curation-ladder endpoint: budget gate "
                         "+ corpus_curate_e2e whole-corpus funnel + walls")
    ap.add_argument("--pair-budget", type=int, default=0, metavar="MULT",
                    help="docs{MULT} predictor-vs-actual: assert "
                         "dedup_candidate_budget's capped join-row count "
                         "equals the built candidate frame's, and time "
                         "the output-bound riders on the same corpus")
    ap.add_argument("--probes", nargs="*", default=None,
                    help="restrict to these probe queries (keeps very "
                         "large mults, e.g. --mults 1,16,100, bounded)")
    args = ap.parse_args()
    if args.cc_chain:
        spark = get_spark(app_name="dip-cc-chain-probe")
        _cc_chain_probe(spark, args.cc_chain)
        return
    if args.curate_ladder:
        spark = get_spark(app_name="dip-curate-ladder-probe")
        _curate_ladder_probe(spark, args.curate_ladder)
        return
    if args.pair_budget:
        spark = get_spark(app_name="dip-pair-budget-probe")
        _pair_budget_probe(spark, args.pair_budget)
        return
    mults = [int(m) for m in args.mults.split(",")]
    mode = ("corpus" if args.corpus else "events" if args.events
            else "events_deep" if args.events_deep
            else "events_skew" if args.events_skew
            else "jaccard_hot" if args.jaccard_hot else "facts")
    probes = {"corpus": DOC_PROBES, "events": EVENT_PROBES,
              "events_deep": EVENT_PROBES, "events_skew": EVENT_SKEW_PROBES,
              "jaccard_hot": JACCARD_HOT_PROBES, "facts": PROBES}[mode]
    if args.probes:
        probes = args.probes  # any registered query, regardless of mode
    spark = get_spark(app_name="dip-scale-probe")
    qs = registry.all_queries()

    # warmup JVM/codegen on the base data
    qs["agg_hash_group"].fn(spark, BASE).write.format("noop").mode(
        "overwrite"
    ).save()

    results: dict[str, dict[int, float]] = {q: {} for q in probes}
    for mult in mults:
        sf_dir = build(spark, mult, mode=mode)
        for q in probes:
            t0 = time.time()
            qs[q].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            results[q][mult] = round(time.time() - t0, 3)

    lo, hi = min(mults), max(mults)
    print(json.dumps({"base": BASE, "mults": mults,
                      "mode": mode, "seconds": results}))
    print(f"\n| query | " + " | ".join(f"{m}x" for m in mults)
          + f" | {hi}x/{lo}x (data {hi // lo}x) |")
    print("|---|" + "---|" * (len(mults) + 1))
    for q in probes:
        r = results[q]
        ratio = r[hi] / r[lo] if r[lo] else float("nan")
        print(f"| `{q}` | " + " | ".join(f"{r[m]:.2f} s" for m in mults)
              + f" | {ratio:.1f}x |")


if __name__ == "__main__":
    main()
