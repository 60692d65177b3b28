"""Aggregations (SURVEY.md section 2 B4).

Generalizes the reference's per-batch success accounting (A22,
main.py:101-107 counts succeeded/failed batches) and dedup identity triples
(A16/A17, child.py:183-184). Spark's hash aggregate does map-side partial
aggregation automatically — at 100 TB the shuffle carries one partial row
per (task, group), not raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import fanout_repartition, load
from ..registry import register


@register(
    "agg_hash_group",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE)                                                  AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))
                          * (1 + CAST(l_tax AS DECIMAL(18,4)))), 2)
                AS DOUBLE)                                                  AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 6)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_hash_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pricing-summary query (TPC-H Q1 shape): scan -> filter ->
    hash aggregate, multi-measure. Partial aggregation happens map-side, so
    the shuffle is O(groups), and only 8 of 11 lineitem columns are read
    (column pruning). Generalizes A22 (main.py:101-107).

    The disc_price/charge measures run in DECIMAL: their products sit
    exactly on the 1e-4/1e-6 lattice, where double accumulation order can
    straddle a round-half boundary differently per engine; decimal
    arithmetic is exact, so the ROUND result is engine- and
    partitioning-independent (output cast back to double)."""
    t = load(spark, sf_dir)
    price_d = F.col("l_extendedprice").cast("decimal(18,4)")
    disc_d = F.col("l_discount").cast("decimal(18,4)")
    tax_d = F.col("l_tax").cast("decimal(18,4)")
    return (
        t.lineitem.where(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(price_d * (1 - disc_d)), 2)
            .cast("double")
            .alias("sum_disc_price"),
            F.round(F.sum(price_d * (1 - disc_d) * (1 + tax_d)), 2)
            .cast("double")
            .alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_supps,
           COUNT(*)                  AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per group (the dedup identity triple of
    A16/A17 reduced to cardinality). Spark plans multi-distinct in ONE
    aggregate via EXPAND (rows replicated once per distinct column);
    r15 splits the two distinct columns into separate two-phase
    aggregations joined on the 3-row group key — each scan prunes to
    its own column, no Expand, value-identical (the
    agg_approx_distinct_bound / q_full_star_rollup recipe; 0.94 ->
    0.67 s at sf0.1). At extreme scale prefer agg_approx_distinct."""
    t = load(spark, sf_dir)
    li = t.lineitem.select("l_returnflag", "l_partkey", "l_suppkey")
    parts = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts")
    )
    supps = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("distinct_supps")
    )
    n = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        parts.join(supps, "l_returnflag")
        .join(n, "l_returnflag")
        .select(
            "l_returnflag", "distinct_parts", "distinct_supps", "n_rows"
        )
    )


@register("agg_approx_distinct", oracle=None)  # approximate: rows-only check
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB replacement for exact
    distinct (fixed-size sketch per group, no EXPAND blowup)."""
    t = load(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
    )


@register(
    "agg_approx_distinct_bound",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT)  AS exact_parts,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS within_parts,
           TRUE AS within_orders
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_distinct_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable bound contract for the HLL++ estimate: the same
    query computes the approximate AND the exact distinct count and emits
    `within_* = |approx - exact| / exact <= 5 * rsd` (rsd=0.02, so a 10%
    band — 5 standard errors; a correct sketch fails this with
    probability ~1e-6, a broken one deterministically). The exact counts
    are hard-matched values, so the row is not vacuously true. This keeps
    `agg_approx_distinct` itself rows-only (the estimate has no golden
    value) while giving the correctness gate a real verdict on the
    sketch. The exact side uses Expand-based COUNT DISTINCT — fine here;
    at 100 TB you would run the bound audit on a sampled partition, not
    the full fact table."""
    t = load(spark, sf_dir)
    tol = 5 * 0.02

    def within(approx: str, exact: str):
        return (
            F.abs(F.col(approx) - F.col(exact)) / F.col(exact) <= F.lit(tol)
        )

    # r14 optimization round (value-identical — both sides see the same
    # multiset and HLL++ is order-independent): approx and exact run as
    # SEPARATE aggregations joined on the 3-row group key. Fused in one
    # Aggregate, the planner routes the HLL sketch buffers through the
    # multi-distinct Expand (rows x3 with sketch state) — measured
    # 5-9 s for a frame whose two halves cost 1.1 s + 1.4 s apart.
    approx = t.lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
    )
    exact = t.lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    return approx.join(exact, "l_returnflag").select(
        "l_returnflag",
        "exact_parts",
        "exact_orders",
        within("approx_parts", "exact_parts").alias("within_parts"),
        within("approx_orders", "exact_orders").alias("within_orders"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           ROUND(SUM(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy (detail -> per-flag -> grand total) in one pass
    via Spark's Expand operator."""
    t = load(spark, sf_dir)
    return t.lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@register(
    "agg_dedup_exact",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber FROM lineitem",
)
def agg_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact full-row dedup over the projected columns (reference A16/A17
    dedup on the (name, size, mtime) identity triple, child.py:183-184).
    dropDuplicates == hash-shuffle on all columns; scales linearly."""
    t = load(spark, sf_dir)
    return t.lineitem.select(
        "l_returnflag", "l_linestatus", "l_linenumber"
    ).dropDuplicates()


@register(
    "agg_dedup_keyed",
    oracle="""
    SELECT c_nationkey, c_custkey, c_name, c_acctbal
    FROM (
      SELECT c_nationkey, c_custkey, c_name, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
      FROM customer
    ) WHERE rn = 1
    """,
)
def agg_dedup_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup with a deterministic keep-first policy (reference A16
    keeps an existing blob and renames the newcomer, child.py:174-191 —
    i.e. 'first writer wins'). row_number over an explicit ordering makes
    the kept row deterministic, unlike bare dropDuplicates(keys)."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    return (
        t.customer.select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "agg_stats_corr",
    oracle="""
    SELECT o_orderpriority,
           ROUND(CORR(o_totalprice, epoch(o_orderdate) / 86400.0), 6) AS price_date_corr,
           ROUND(COVAR_SAMP(o_totalprice, epoch(o_orderdate) / 86400.0), 2)
                                                                       AS price_date_covar,
           ROUND(STDDEV_SAMP(o_totalprice), 4)                    AS price_stddev,
           ROUND(VAR_SAMP(o_totalprice), 4)                       AS price_var
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per group: Pearson correlation, sample
    covariance/stddev/variance. All are single-pass mergeable moments
    (sum, sum-of-squares, cross-products), so partial aggregation applies
    exactly like count/sum — the shuffle stays O(groups) at any scale."""
    t = load(spark, sf_dir)
    # day-scaled time axis: second-scaled covariance sits at ~1e11 where
    # engine float noise exceeds any reasonable rounding; corr is scale-free
    epoch = F.unix_timestamp("o_orderdate").cast("double") / 86400.0
    return t.orders.groupBy("o_orderpriority").agg(
        F.round(F.corr(F.col("o_totalprice"), epoch), 6).alias("price_date_corr"),
        F.round(F.covar_samp(F.col("o_totalprice"), epoch), 2).alias("price_date_covar"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("o_totalprice"), 4).alias("price_var"),
    )


@register("agg_hll_sketch", oracle=None)  # approximate sketch: rows-only
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable HLL sketches (Apache DataSketches, Spark 3.5+):
    stage 1 builds a fixed-size binary sketch of distinct customers PER
    NATION (the shape you'd persist in a rollup table at 100 TB); stage 2
    merges the 25 sketches with hll_union_agg and estimates the global
    distinct count WITHOUT rescanning raw data — the property plain
    approx_count_distinct lacks (its partials aren't storable). Accuracy
    vs the exact count is pinned in tests/test_relational.py."""
    t = load(spark, sf_dir)
    per_nation = t.customer.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey", 12).alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return per_nation.agg(
        F.count(F.lit(1)).alias("n_sketches"),
        F.sum("n_rows").alias("n_customers"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_distinct"),
    )


@register(
    "agg_hll_sketch_bound",
    oracle="""
    SELECT CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_sketches,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT)   AS exact_distinct,
           TRUE AS within_tolerance
    FROM customer
    """,
)
def agg_hll_sketch_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bound contract for the DataSketches HLL merge path: build the
    per-nation sketches, union-merge them, and compare the merged
    estimate against the exact global distinct computed in the SAME
    query. lgConfigK=12 gives rsd ~= 1.04/sqrt(4096) ~= 1.6%;
    `within_tolerance` uses 5x that (8%), so a correct merge practically
    cannot fail and a broken one (double counting, dropped sketch)
    deterministically does. n_sketches and exact_distinct are
    hard-matched values — the row carries real data, the boolean carries
    the sketch verdict."""
    t = load(spark, sf_dir)
    per_nation = t.customer.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey", 12).alias("sk")
    )
    exact = t.customer.agg(
        F.countDistinct("c_custkey").alias("exact_distinct")
    )
    merged = per_nation.agg(
        F.count(F.lit(1)).alias("n_sketches"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    return merged.crossJoin(exact).select(
        "n_sketches",
        "exact_distinct",
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            <= F.lit(5 * 0.016)
        ).alias("within_tolerance"),
    )


@register(
    "rollup_time_hierarchy",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d')           AS bday,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bhour,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY ROLLUP (bday, bhour, event_type)
    """,
)
def rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate shape: one pass produces the
    hour-by-type detail AND its day/hour/grand-total rollups via Spark's
    Expand operator — the materialization you'd maintain incrementally
    (foreachBatch upsert) so dashboards never rescan raw events at 100 TB.
    Buckets are emitted as strings so NULL rollup rows and timestamp
    encodings compare identically across engines."""
    t = load(spark, sf_dir)
    buckets = t.events.select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("bday"),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "bhour"
        ),
        "event_type",
        "value",
    )
    return buckets.rollup("bday", "bhour", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@register(
    "agg_unpivot",
    oracle="""
    SELECT measure,
           COUNT(*) AS n_values,
           ROUND(SUM(value), 2) AS sum_value,
           ROUND(MIN(value), 2) AS min_value,
           ROUND(MAX(value), 2) AS max_value
    FROM (
      SELECT 'l_quantity' AS measure, l_quantity AS value
      FROM lineitem WHERE l_orderkey < 5000
      UNION ALL
      SELECT 'l_extendedprice', l_extendedprice
      FROM lineitem WHERE l_orderkey < 5000
      UNION ALL
      SELECT 'l_discount', l_discount FROM lineitem WHERE l_orderkey < 5000
      UNION ALL
      SELECT 'l_tax', l_tax FROM lineitem WHERE l_orderkey < 5000
    )
    GROUP BY measure
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) — the inverse of agg_pivot: four measure columns
    become (measure, value) rows via DataFrame.unpivot, which plans as a
    single Expand over ONE scan (the oracle's UNION ALL form would scan
    four times — the rewrite IS the optimization), then a per-measure
    profile aggregate."""
    t = load(spark, sf_dir)
    long = t.lineitem.where(F.col("l_orderkey") < 5000).unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


@register(
    "agg_arg_extrema",
    oracle="""
    SELECT c_nationkey,
           MAX(CASE WHEN rn_desc = 1 THEN c_name END) AS richest,
           MAX(CASE WHEN rn_asc = 1 THEN c_name END)  AS poorest,
           ROUND(MAX(c_acctbal), 2) AS max_bal,
           ROUND(MIN(c_acctbal), 2) AS min_bal
    FROM (
      SELECT c_nationkey, c_name, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey DESC) AS rn_desc,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal, c_custkey) AS rn_asc
      FROM customer
    )
    GROUP BY c_nationkey
    """,
)
def agg_arg_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-extrema aggregates: the value of ONE column at another
    column's max/min, without a self-join or window (one hash aggregate,
    map-side combinable — the 100 TB-friendly form of 'row with the max').
    Ordering key is the (acctbal, custkey) struct so ties break on the
    unique key identically in both engines."""
    t = load(spark, sf_dir)
    key = F.struct(F.col("c_acctbal"), F.col("c_custkey"))
    return t.customer.groupBy("c_nationkey").agg(
        F.max_by("c_name", key).alias("richest"),
        F.min_by("c_name", key).alias("poorest"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
    )


@register(
    "agg_string_concat",
    oracle="""
    SELECT c_nationkey,
           string_agg(c_name, ',' ORDER BY c_custkey) AS names_csv,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer
    WHERE c_custkey < 100
    GROUP BY c_nationkey
    """,
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg, Spark 4.0+): concatenation is
    NOT commutative, so without the WITHIN GROUP ordering the result is
    partitioning-dependent garbage — the ordering clause is the whole
    operator. Bounded input: at 100 TB an unbounded listagg is a
    single-row OOM; real pipelines cap the group (as here) or switch to
    collect_list + slice."""
    t = load(spark, sf_dir)
    return (
        t.customer.where(F.col("c_custkey") < 100)
        .groupBy("c_nationkey")
        .agg(
            F.expr(
                "listagg(c_name, ',') WITHIN GROUP (ORDER BY c_custkey)"
            ).alias("names_csv"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "agg_boolean",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(o_totalprice > 300000) AS BIGINT) AS n_big,
           bool_and(o_totalprice > 0)                      AS all_positive,
           bool_or(o_orderstatus = 'F')                    AS any_finished
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate surface: conditional count without a CASE
    scaffold, universal/existential group predicates (every/any) — all
    map-side combinable single-bit partials, the cheapest aggregates that
    exist at 100 TB."""
    t = load(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 300000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
    )


@register(
    "agg_mode",
    oracle="""
    SELECT c_nationkey, c_mktsegment AS mode_segment, cnt AS mode_count
    FROM (
      SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY COUNT(*) DESC, c_mktsegment) AS rn
      FROM customer
      GROUP BY c_nationkey, c_mktsegment
    ) WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: each nation's most common market
    segment, ties broken by smallest segment value. Spark's built-in
    mode() leaves ties engine-picked, so this uses the composable form:
    count per (group, value), then min_by over the struct (-count,
    value) — struct ordering gives 'highest count, then lexicographically
    first value' with NO window pass, and both aggregates are map-side
    combinable (the second input is only (groups x distinct values)
    rows). The oracle spells the same tie-break as row_number."""
    t = load(spark, sf_dir)
    counts = t.customer.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return counts.groupBy("c_nationkey").agg(
        F.min_by(
            "c_mktsegment", F.struct((-F.col("cnt")).alias("neg"), "c_mktsegment")
        ).alias("mode_segment"),
        F.max("cnt").alias("mode_count"),
    )


@register(
    "agg_approx_top_k",
    oracle="""
    SELECT item, cnt, rk
    FROM (
      SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS cnt,
             row_number() OVER (ORDER BY COUNT(*) DESC, event_type) AS rk
      FROM events GROUP BY event_type
    ) WHERE rk <= 3
    """,
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items sketch (Spark 4 approx_top_k): heavy-hitter counts
    in one pass with bounded memory — at 100 TB cardinalities you cannot
    hash-aggregate the full key space, but the sketch tracks the top k
    with maxItemsTracked slots and merges across partitions. At fixture
    cardinality (5 event types << 10k tracked slots) the sketch is EXACT,
    which is what makes an oracle check possible; ranking is re-derived
    with an item tie-break after exploding, so array order never leaks
    into the comparison."""
    t = load(spark, sf_dir)
    raw = t.events.agg(
        F.expr("approx_top_k(event_type, 3)").alias("top")
    ).select(F.explode("top").alias("e"))
    w = Window.orderBy(F.col("cnt").desc(), "item")
    return (
        raw.select(
            F.col("e.item").alias("item"), F.col("e.count").alias("cnt")
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
    )


@register(
    "agg_regr",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT)                              AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6)        AS r2
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (regr_slope/intercept/r2): fit
    extendedprice against quantity per return flag in ONE grouped pass —
    the moment sums (sum x, sum y, sum xy, sum x^2) are map-side
    combinable partials, so the shuffle carries five doubles per group
    regardless of fact size. The in-database supervised-fit primitive
    (same family as agg_stats_corr's covariance)."""
    t = load(spark, sf_dir)
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return t.lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT re-aggregatable distinct counting via bitmaps (Spark 3.5
    bitmap functions): keys bucket into 32k-bit bitmaps
    (bitmap_bucket_number / bitmap_bit_position), per-bucket bitmaps OR
    together map-side, and the final count is the sum of per-bucket
    popcounts. Unlike agg_hll_sketch this is exact, and unlike
    COUNT(DISTINCT) the partial state is mergeable across partitions /
    incremental batches without a second shuffle of raw keys — the
    ClickHouse/Iceberg materialized-distinct recipe. The oracle is plain
    COUNT(DISTINCT): same numbers, different machinery."""
    t = load(spark, sf_dir)
    per_bucket = (
        t.orders.select(
            "o_orderpriority",
            F.expr("bitmap_bucket_number(o_custkey)").alias("bkt"),
            F.expr("bitmap_bit_position(o_custkey)").alias("pos"),
        )
        .groupBy("o_orderpriority", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return per_bucket.groupBy("o_orderpriority").agg(
        F.expr("CAST(SUM(bitmap_count(bm)) AS BIGINT)").alias("n_customers")
    )


@register(
    "agg_grouping_id",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS ret_flag,
           COALESCE(l_linestatus, 'ALL') AS line_status,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with GROUPING flags: subtotal rows are distinguishable from
    real NULL group keys (grouping(col)=1 marks 'aggregated over', not
    'value was NULL') — the disambiguation every report layer needs
    before it can render 'ALL' rows. One Expand-based aggregate, same
    plan family as agg_grouping_sets / rollup_time_hierarchy."""
    t = load(spark, sf_dir)
    return (
        t.lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
            F.grouping("l_linestatus").cast("bigint").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("ret_flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("line_status"),
            "g_flag",
            "g_status",
            "n",
            "sum_qty",
        )
    )


@register(
    "rollup_ohlc_bars",
    oracle="""
    WITH ranked AS (
      SELECT event_type,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bar,
             value,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id)        AS rn_open,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events
    )
    SELECT event_type, bar,
           ROUND(MAX(CASE WHEN rn_open  = 1 THEN value END), 2) AS open,
           ROUND(MAX(value), 2)                                 AS high,
           ROUND(MIN(value), 2)                                 AS low,
           ROUND(MAX(CASE WHEN rn_close = 1 THEN value END), 2) AS close,
           CAST(COUNT(*) AS BIGINT)                             AS n_events,
           ROUND(SUM(value), 2)                                 AS volume
    FROM ranked
    GROUP BY event_type, bar
    """,
)
def rollup_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC time-bar rollup (the financial-candlestick / TimescaleDB
    continuous-aggregate shape): per (event_type, hour) the first, max,
    min, and last `value` plus count and sum. First/last are `min_by` /
    `max_by` over a (ts, event_id) struct key — tie-broken, and unlike
    the window-rank formulation they are MAP-SIDE COMBINABLE partials, so
    the shuffle carries one partial row per (group, partition) no matter
    how many events the hour holds. The oracle uses the row_number form
    precisely to prove the two formulations agree."""
    t = load(spark, sf_dir)
    key = F.struct(F.col("ts"), F.col("event_id"))
    bar = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
    return (
        t.events.select("event_type", bar.alias("bar"), "ts", "event_id", "value")
        .groupBy("event_type", "bar")
        .agg(
            F.round(F.min_by("value", key), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", key), 2).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("volume"),
        )
    )


#: Equi-depth bucket count. 7 interior boundaries at ranks i/8.
EQUIDEPTH_BUCKETS = 8

_EQUIDEPTH_PROBS = [i / EQUIDEPTH_BUCKETS for i in range(1, EQUIDEPTH_BUCKETS)]


@register(
    "agg_histogram_equidepth",
    oracle=f"""
    WITH b AS (
      SELECT [floor(q * 100) / 100
              FOR q IN quantile_cont(l_extendedprice,
                                     {_EQUIDEPTH_PROBS!r})] AS bounds
      FROM lineitem
    )
    SELECT CAST(1 + len(list_filter(bounds,
                                    q -> q < l_extendedprice)) AS INTEGER)
             AS bucket,
           CAST(COUNT(*) AS BIGINT)          AS n_rows,
           ROUND(MIN(l_extendedprice), 2)    AS lo,
           ROUND(MAX(l_extendedprice), 2)    AS hi
    FROM lineitem, b
    GROUP BY bucket
    """,
)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram (the CBO column-statistics build, complement
    of agg_histogram's equi-width): exact interpolated quantiles at ranks
    i/8 form the bucket boundaries, every row is banded against them, and
    per-bucket counts verify the depth balance. Two-pass shape that scales:
    pass 1 reduces the fact to ONE row of 7 boundaries (exact `percentile`
    here; `approx_percentile` at 100 TB — same plan), broadcast back via a
    1-row cross join (scalar-subquery shape, like embed_norm_stats); pass
    2 is a scan-local band assignment + hash aggregate. Boundaries are
    floored to cents so the banding comparison is engine-stable against
    the 2-dp price domain."""
    t = load(spark, sf_dir)
    # r14 optimization round: repartition the projected price column —
    # the one-split fixture otherwise runs the banding pass (8 array
    # comparisons per row) and the percentile partials inside the
    # single scan task. The exact-percentile FINAL aggregate remains a
    # single task by construction (the documented audit-scale shape).
    par = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    li = fanout_repartition(t.lineitem.select("l_extendedprice"), par)
    probs = ", ".join(str(p) for p in _EQUIDEPTH_PROBS)
    bounds = li.agg(
        F.transform(
            F.expr(f"percentile(l_extendedprice, array({probs}))"),
            lambda q: F.floor(q * 100) / 100,
        ).alias("bounds")
    )
    price = F.col("l_extendedprice")
    bucket = (
        F.size(F.filter("bounds", lambda q: q < price)) + 1
    ).alias("bucket")
    return (
        li.crossJoin(F.broadcast(bounds))
        .groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min(price), 2).alias("lo"),
            F.round(F.max(price), 2).alias("hi"),
        )
    )


#: Count-min geometry: CM_DEPTH independent hash rows x CM_WIDTH buckets.
#: Estimate = min over rows of the bucket counter; never underestimates,
#: overestimates by colliding keys' mass (expected N/CM_WIDTH per row,
#: min over CM_DEPTH rows shrinks the tail exponentially).
CM_DEPTH = 4
CM_WIDTH = 256

_CM_HEX = "0123456789abcdef"


def _cm_bucket_spark(key, r):
    """md5('cm{r}:'||key) first byte as 0..255 — the engine-portable
    bucket (two applications of the corpus_shard_assign nibble idiom)."""
    h = F.md5(
        F.concat(F.lit("cm"), r.cast("string"), F.lit(":"), key).cast("binary")
    )
    n1 = F.instr(F.lit(_CM_HEX), F.substring(h, 1, 1)) - 1
    n2 = F.instr(F.lit(_CM_HEX), F.substring(h, 2, 1)) - 1
    return (n1 * 16 + n2).cast("int")


def _cm_bucket_duck(key: str, r: str) -> str:
    h = f"md5('cm' || {r} || ':' || {key})"
    return (
        f"CAST((strpos('{_CM_HEX}', substr({h}, 1, 1)) - 1) * 16"
        f" + (strpos('{_CM_HEX}', substr({h}, 2, 1)) - 1) AS INTEGER)"
    )


_CM_ORACLE = f"""
    WITH keys AS (SELECT CAST(l_suppkey AS VARCHAR) AS k FROM lineitem),
    rs AS (SELECT CAST(unnest(range({CM_DEPTH})) AS INTEGER) AS r),
    cells AS (
      SELECT r, {_cm_bucket_duck('k', 'r')} AS b, COUNT(*) AS c
      FROM keys, rs GROUP BY 1, 2
    ),
    probes AS (
      SELECT l_suppkey, CAST(l_suppkey AS VARCHAR) AS k,
             COUNT(*) AS exact_n
      FROM lineitem WHERE l_suppkey < 20 GROUP BY 1, 2
    ),
    est AS (
      SELECT p.l_suppkey, p.exact_n, MIN(c.c) AS est_n
      FROM probes p
      CROSS JOIN rs
      JOIN cells c ON c.r = rs.r AND c.b = {_cm_bucket_duck('p.k', 'rs.r')}
      GROUP BY p.l_suppkey, p.exact_n
    )
    SELECT l_suppkey, CAST(exact_n AS BIGINT) AS exact_n,
           CAST(est_n AS BIGINT) AS est_n,
           est_n >= exact_n AS no_underestimate
    FROM est
"""


@register("agg_countmin_sketch", oracle=_CM_ORACLE)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch (Cormode & Muthukrishnan 2005) built
    and probed as pure relational algebra, with the ESTIMATES themselves
    value-checked: the md5-derived bucket functions are deterministic
    and engine-portable, so DuckDB replays sketch construction bit for
    bit — stronger than the tolerance contracts the HLL/GK sketches get
    (their estimates are implementation-defined; this one is algebra).

    Scale shape: the sketch build is one groupBy over a CM_DEPTH-way
    map-side fan-out — the shuffle carries at most DEPTH x WIDTH = 1024
    partial cells per map task regardless of input rows (this is WHY
    count-min exists: heavy-hitter counting with O(1) state). The probe
    side broadcasts the 1024-cell sketch to the 20 probe keys. The
    `no_underestimate` column states the CM one-sided error guarantee;
    it can only be false if the sketch math is broken."""
    t = load(spark, sf_dir)
    # r14 optimization round: repartition the key stream before the
    # depth fan-out — the fixture is one parquet split, so the
    # rows x CM_DEPTH md5 bucket hashes otherwise all evaluate inside
    # the single scan task (1 of 32 cores; r13 --all read 7.6 s).
    par = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    keys = fanout_repartition(
        t.lineitem.select(F.col("l_suppkey").cast("string").alias("k")),
        par,
    )
    rows = keys.select(
        "k", F.explode(F.array(*[F.lit(r) for r in range(CM_DEPTH)])).alias("r")
    )
    cells = (
        rows.select("r", _cm_bucket_spark(F.col("k"), F.col("r")).alias("b"))
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = (
        t.lineitem.where(F.col("l_suppkey") < 20)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .select("l_suppkey", F.col("l_suppkey").cast("string").alias("k"), "exact_n")
    )
    probe_rows = probes.select(
        "l_suppkey",
        "exact_n",
        F.explode(F.array(*[F.lit(r) for r in range(CM_DEPTH)])).alias("r"),
        F.col("k"),
    ).select(
        "l_suppkey", "exact_n", "r",
        _cm_bucket_spark(F.col("k"), F.col("r")).alias("b"),
    )
    est = (
        probe_rows.join(F.broadcast(cells), ["r", "b"])
        .groupBy("l_suppkey", "exact_n")
        .agg(F.min("c").alias("est_n"))
    )
    return est.select(
        "l_suppkey",
        "exact_n",
        "est_n",
        (F.col("est_n") >= F.col("exact_n")).alias("no_underestimate"),
    )


#: Fixed shift for the central-moment power sums: statistically the
#: moments are shift-invariant, numerically the shift is load-bearing —
#: raw sums of x^4 at price scale (~5e4^4 per row) hit catastrophic
#: cancellation in the m2 = E[x^2]-E[x]^2 step (ten digits gone), while
#: sums of (x - 4e4)^k keep every term small. A LITERAL shift (not a
#: data-dependent mean) keeps the query single-pass on both engines.
MOMENTS_SHIFT = 40000.0

_MOMENTS_ORACLE = f"""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(l_extendedprice - {MOMENTS_SHIFT})                          AS s1,
             SUM(POWER(l_extendedprice - {MOMENTS_SHIFT}, 2))               AS s2,
             SUM(POWER(l_extendedprice - {MOMENTS_SHIFT}, 3))               AS s3,
             SUM(POWER(l_extendedprice - {MOMENTS_SHIFT}, 4))               AS s4
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           ROUND(s1 / n + {MOMENTS_SHIFT}, 2) AS mean_price,
           ROUND(s2 / n - POWER(s1 / n, 2), 2) AS var_pop,
           ROUND((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * POWER(s1 / n, 3))
                 / POWER(s2 / n - POWER(s1 / n, 2), 1.5), 5) AS skewness,
           ROUND((s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * POWER(s1 / n, 2) * (s2 / n) - 3 * POWER(s1 / n, 4))
                 / POWER(s2 / n - POWER(s1 / n, 2), 2) - 3, 5) AS excess_kurtosis
    FROM s
"""


@register("agg_moments", oracle=_MOMENTS_ORACLE)
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shape profile per group: population mean/variance/
    skewness/excess-kurtosis from SHIFTED power sums. Built-in
    skewness()/kurtosis() differ across engines (sample-vs-population
    corrections), so the profile is computed from first principles —
    four SUM aggregates per group, all map-side combinable, one shuffle
    carrying 6 numbers per (group, partition). The literal MOMENTS_SHIFT
    is the numerical-conditioning trick that makes single-pass moment
    computation viable at all (see constant's comment); a two-pass
    mean-centered version would scan the fact table twice at 100 TB for
    digits the report rounds away."""
    t = load(spark, sf_dir)
    x = F.col("l_extendedprice") - MOMENTS_SHIFT
    s = t.lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(F.pow(x, 2)).alias("s2"),
        F.sum(F.pow(x, 3)).alias("s3"),
        F.sum(F.pow(x, 4)).alias("s4"),
    )
    m1 = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - F.pow(m1, 2)
    m3 = F.col("s3") / F.col("n") - 3 * m1 * (F.col("s2") / F.col("n")) + 2 * F.pow(m1, 3)
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * m1 * (F.col("s3") / F.col("n"))
        + 6 * F.pow(m1, 2) * (F.col("s2") / F.col("n"))
        - 3 * F.pow(m1, 4)
    )
    return s.select(
        "l_returnflag",
        "n",
        F.round(m1 + MOMENTS_SHIFT, 2).alias("mean_price"),
        F.round(m2, 2).alias("var_pop"),
        F.round(m3 / F.pow(m2, 1.5), 5).alias("skewness"),
        F.round(m4 / F.pow(m2, 2) - 3, 5).alias("excess_kurtosis"),
    )


_OLS_ORACLE = f"""
    WITH s AS (
      SELECT COUNT(*) * 1.0 AS n,
             SUM(l_quantity)                 AS sx1,
             SUM(l_discount)                 AS sx2,
             SUM(l_extendedprice)            AS sy,
             SUM(l_quantity * l_quantity)    AS sx1x1,
             SUM(l_quantity * l_discount)    AS sx1x2,
             SUM(l_discount * l_discount)    AS sx2x2,
             SUM(l_quantity * l_extendedprice) AS sx1y,
             SUM(l_discount * l_extendedprice) AS sx2y
      FROM lineitem
    ),
    solved AS (
      SELECT n,
             (n * sx1x1 - sx1 * sx1)   AS a11,
             (n * sx1x2 - sx1 * sx2)   AS a12,
             (n * sx2x2 - sx2 * sx2)   AS a22,
             (n * sx1y  - sx1 * sy)    AS b1,
             (n * sx2y  - sx2 * sy)    AS b2,
             sx1, sx2, sy
      FROM s
    )
    SELECT ROUND((b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12), 4) AS beta_qty,
           ROUND((b2 * a11 - b1 * a12) / (a11 * a22 - a12 * a12), 4) AS beta_disc,
           ROUND((sy - (b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12) * sx1
                     - (b2 * a11 - b1 * a12) / (a11 * a22 - a12 * a12) * sx2)
                 / n, 4) AS intercept,
           CAST(n AS BIGINT) AS n
    FROM solved
"""


@register("agg_ols_two_factor", oracle=_OLS_ORACLE)
def agg_ols_two_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature ordinary least squares (extendedprice ~ quantity +
    discount) fitted ENTIRELY as one aggregation pass: the normal
    equations need only the 9 sufficient statistics (sums of products),
    and a 2x2 system solves in closed form by Cramer's rule — so the
    regression is a map-side-combinable aggregate plus arithmetic on ONE
    row. This is how distributed OLS actually scales: the fact table
    streams through once, the shuffle carries 9 numbers per partition,
    and no iterative optimizer touches the data (contrast gradient
    descent: a full pass PER STEP). agg_regr covers the single-feature
    builtin; this is the multivariate generalization engines leave to
    the user. Centered determinants (n*Sxx - Sx*Sx) keep the
    conditioning workable at price scale; for many features you would
    accumulate X'X upper-triangular the same way and solve k x k on the
    driver (k^2 numbers, not data)."""
    t = load(spark, sf_dir)
    q, d, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    s = t.lineitem.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).alias("sx1"),
        F.sum(d).alias("sx2"),
        F.sum(y).alias("sy"),
        F.sum(q * q).alias("sx1x1"),
        F.sum(q * d).alias("sx1x2"),
        F.sum(d * d).alias("sx2x2"),
        F.sum(q * y).alias("sx1y"),
        F.sum(d * y).alias("sx2y"),
    )
    n = F.col("n")
    a11 = n * F.col("sx1x1") - F.col("sx1") * F.col("sx1")
    a12 = n * F.col("sx1x2") - F.col("sx1") * F.col("sx2")
    a22 = n * F.col("sx2x2") - F.col("sx2") * F.col("sx2")
    b1 = n * F.col("sx1y") - F.col("sx1") * F.col("sy")
    b2 = n * F.col("sx2y") - F.col("sx2") * F.col("sy")
    det = a11 * a22 - a12 * a12
    beta1 = (b1 * a22 - b2 * a12) / det
    beta2 = (b2 * a11 - b1 * a12) / det
    return s.select(
        F.round(beta1, 4).alias("beta_qty"),
        F.round(beta2, 4).alias("beta_disc"),
        F.round(
            (F.col("sy") - beta1 * F.col("sx1") - beta2 * F.col("sx2")) / n, 4
        ).alias("intercept"),
        n.cast("bigint").alias("n"),
    )


_CUBE_ORACLE = """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("agg_cube", oracle=_CUBE_ORACLE)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation — all 2^k grouping combinations in one pass
    (completes the grouping-analytics triple: agg_grouping_sets picks
    explicit sets, rollup_time_hierarchy does the prefix chain, CUBE
    does the powerset). GROUPING() flags disambiguate real NULL keys
    from subtotal rows. Physically one Expand node multiplies each input
    row into its 4 grouping streams BEFORE the shuffle, so partial
    aggregation still applies per stream — the shuffle carries one
    partial per (stream, group, partition), never 4x the data."""
    t = load(spark, sf_dir)
    return (
        t.lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
            F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        )
    )


#: Poisson(1) inverse-CDF thresholds on the first 4 md5 hex digits
#: (u < cdf(k) <=> hex4 < floor(cdf(k)*65536) as a 4-digit hex string):
#: the engine-portable Poisson draw behind the one-pass bootstrap.
_POIS_THRESHOLDS = ["5e2d", "bc5a", "eb71", "fb23", "ff10", "ffd9", "fffa"]
#: Number of bootstrap replicates maintained in the single pass.
BOOT_REPS = 8


def _boot_hex_sql(b: int) -> str:
    return (
        f"substr(md5('boot{b}:' || CAST(l_orderkey AS VARCHAR) || '_' "
        f"|| CAST(l_linenumber AS VARCHAR)), 1, 4)"
    )


def _boot_w_sql(b: int) -> str:
    h = _boot_hex_sql(b)
    cases = " ".join(
        f"WHEN {h} < '{t}' THEN {k}" for k, t in enumerate(_POIS_THRESHOLDS)
    )
    return f"(CASE {cases} ELSE {len(_POIS_THRESHOLDS)} END)"


def _bootstrap_oracle() -> str:
    sums = ",\n             ".join(
        f"SUM({_boot_w_sql(b)} * l_extendedprice) AS sx{b},\n"
        f"             CAST(SUM({_boot_w_sql(b)}) AS DOUBLE) AS sw{b}"
        for b in range(BOOT_REPS)
    )
    reps = ", ".join(f"sx{b} / sw{b}" for b in range(BOOT_REPS))
    return f"""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n_rows,
             AVG(l_extendedprice) AS mean_price,
             {sums}
      FROM lineitem
      GROUP BY l_returnflag
    ),
    r AS (
      SELECT l_returnflag, n_rows, mean_price, [{reps}] AS reps
      FROM s
    )
    SELECT l_returnflag, CAST(n_rows AS BIGINT) AS n_rows,
           ROUND(mean_price, 4) AS mean_price,
           ROUND(stddev_samp(x.r), 2) AS boot_se,
           ROUND(mean_price - 1.96 * stddev_samp(x.r), 2) AS ci_lo,
           ROUND(mean_price + 1.96 * stddev_samp(x.r), 2) AS ci_hi
    FROM r, unnest(r.reps) AS x(r)
    GROUP BY l_returnflag, n_rows, mean_price
    """


@register("agg_bootstrap_ci", oracle=_bootstrap_oracle())
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-PASS Poisson-bootstrap confidence interval for a grouped mean
    (r5; Chamandy et al., "Estimating Uncertainty for Massive Data
    Streams" — Google's streaming bootstrap; also the Bag-of-Little-
    Bootstraps regime): classical bootstrap resamples the data B times
    — B full shuffles at 100 TB — while the Poisson trick observes that
    a multinomial resample is approximated by giving every row an
    independent Poisson(1) weight PER REPLICATE, so all B=8 replicate
    means are just extra conditional SUMs maintained in the SAME
    single-scan aggregate. The standard deviation ACROSS replicate means
    estimates the sampling SE of the mean; the 1.96-SE normal interval
    is the CI a dashboard needs next to every big aggregate.

    Engine-portable randomness: the Poisson draw inverts the CDF on the
    first 4 md5 hex digits of (replicate, row-key) — deterministic,
    retry/repartition-stable (the sampling.py hash convention), and
    replayed exactly by the DuckDB oracle, so even the bootstrap's
    randomness is value-checked. The cost at scale is B extra
    sum-columns in one map-side-combinable aggregate: no extra scan, no
    extra shuffle, no RNG state."""
    t = load(spark, sf_dir)

    def w(b: int):
        h = F.substring(
            F.md5(
                F.concat(
                    F.lit(f"boot{b}:"),
                    F.col("l_orderkey").cast("string"),
                    F.lit("_"),
                    F.col("l_linenumber").cast("string"),
                ).cast("binary")
            ),
            1,
            4,
        )
        expr = F.when(h < _POIS_THRESHOLDS[0], 0)
        for k, thr in enumerate(_POIS_THRESHOLDS[1:], start=1):
            expr = expr.when(h < thr, k)
        return expr.otherwise(len(_POIS_THRESHOLDS))

    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.avg("l_extendedprice").alias("mean_price"),
    ]
    for b in range(BOOT_REPS):
        wb = w(b)
        aggs.append(F.sum(wb * F.col("l_extendedprice")).alias(f"sx{b}"))
        aggs.append(F.sum(wb).cast("double").alias(f"sw{b}"))
    # r14 optimization round: repartition before the aggregate — the
    # BOOT_REPS md5 draws per row otherwise all evaluate inside the
    # single scan task of the one-split fixture (r13 --all read 5.2 s);
    # the map-side-combinable aggregate is unchanged.
    par = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    s = (
        fanout_repartition(
            t.lineitem.select(
                "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
            ),
            par,
        )
        .groupBy("l_returnflag")
        .agg(*aggs)
    )
    reps = [F.col(f"sx{b}") / F.col(f"sw{b}") for b in range(BOOT_REPS)]
    m = sum(reps) / BOOT_REPS
    var = sum((r - m) * (r - m) for r in reps) / (BOOT_REPS - 1)
    se = F.sqrt(var)
    return s.select(
        "l_returnflag",
        "n_rows",
        F.round("mean_price", 4).alias("mean_price"),
        F.round(se, 2).alias("boot_se"),
        F.round(F.col("mean_price") - 1.96 * se, 2).alias("ci_lo"),
        F.round(F.col("mean_price") + 1.96 * se, 2).alias("ci_hi"),
    )


#: Welch two-sample t-test groups: the experimentation primitive runs on
#: the two comparable monetized event streams.
TTEST_A, TTEST_B = "purchase", "click"

_TTEST_ORACLE = f"""
    WITH g AS (
      SELECT event_type,
             COUNT(*) AS n, AVG(value) AS m, VAR_SAMP(value) AS v
      FROM events
      WHERE event_type IN ('{TTEST_A}', '{TTEST_B}')
      GROUP BY event_type
    ),
    ab AS (
      SELECT
        (SELECT n FROM g WHERE event_type = '{TTEST_A}') AS na,
        (SELECT m FROM g WHERE event_type = '{TTEST_A}') AS ma,
        (SELECT v FROM g WHERE event_type = '{TTEST_A}') AS va,
        (SELECT n FROM g WHERE event_type = '{TTEST_B}') AS nb,
        (SELECT m FROM g WHERE event_type = '{TTEST_B}') AS mb,
        (SELECT v FROM g WHERE event_type = '{TTEST_B}') AS vb
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           ROUND(ma, 4) AS mean_a, ROUND(mb, 4) AS mean_b,
           ROUND((ma - mb) / sqrt(va / na + vb / nb), 4) AS t_stat,
           ROUND(POWER(va / na + vb / nb, 2)
                 / (POWER(va / na, 2) / (na - 1)
                    + POWER(vb / nb, 2) / (nb - 1)), 2) AS welch_df,
           abs((ma - mb) / sqrt(va / na + vb / nb)) > 1.96 AS significant
    FROM ab
"""


@register("agg_t_test", oracle=_TTEST_ORACLE)
def agg_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test between the purchase and click value
    distributions — the A/B-experimentation primitive (unequal
    variances, Welch-Satterthwaite degrees of freedom, |t| > 1.96 for
    the 5% two-sided call). Every input is a map-side-combinable
    grouped aggregate (n, mean, var per arm), so at 100 TB the test
    costs one scan + a 2-row shuffle; the statistic itself is driver-
    free arithmetic on the 1-row pivoted frame. agg_bootstrap_ci is the
    nonparametric sibling; this is the classic parametric form."""
    t = load(spark, sf_dir)
    g = (
        t.events.where(F.col("event_type").isin(TTEST_A, TTEST_B))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
    )
    a = g.where(F.col("event_type") == TTEST_A).select(
        F.col("n").alias("na"), F.col("m").alias("ma"), F.col("v").alias("va")
    )
    b = g.where(F.col("event_type") == TTEST_B).select(
        F.col("n").alias("nb"), F.col("m").alias("mb"), F.col("v").alias("vb")
    )
    se2 = F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    tstat = (F.col("ma") - F.col("mb")) / F.sqrt(se2)
    df = F.pow(se2, 2) / (
        F.pow(F.col("va") / F.col("na"), 2) / (F.col("na") - 1)
        + F.pow(F.col("vb") / F.col("nb"), 2) / (F.col("nb") - 1)
    )
    return a.crossJoin(b).select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round("ma", 4).alias("mean_a"),
        F.round("mb", 4).alias("mean_b"),
        F.round(tstat, 4).alias("t_stat"),
        F.round(df, 2).alias("welch_df"),
        (F.abs(tstat) > 1.96).alias("significant"),
    )


_MWU_ORACLE = f"""
    WITH ev AS (
      SELECT event_type, value FROM events
      WHERE event_type IN ('{TTEST_A}', '{TTEST_B}')
    ),
    vg AS (
      SELECT value,
             COUNT(*) AS c,
             SUM(CASE WHEN event_type = '{TTEST_A}' THEN 1 ELSE 0 END) AS ca
      FROM ev GROUP BY value
    ),
    ranked AS (
      SELECT value, c, ca,
             SUM(c) OVER (ORDER BY value
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS cum,
             COALESCE(SUM(c) OVER (ORDER BY value
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) + (c + 1) / 2.0 AS avg_rank
      FROM vg
    ),
    s AS (
      SELECT SUM(ca) AS na, SUM(c - ca) AS nb,
             SUM(ca * avg_rank) AS ra,
             SUM(CAST(c AS DOUBLE) * c * c - c) AS tie_term
      FROM ranked
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           ROUND(ra - na * (na + 1) / 2.0, 1) AS u_a,
           floor((ra - na * (na + 1) / 2.0 - na * nb / 2.0)
                 / sqrt(na * nb / 12.0
                        * ((na + nb + 1)
                           - tie_term / ((na + nb) * (na + nb - 1.0))))
                 * 10000) / 10000 AS z_stat,
           abs((ra - na * (na + 1) / 2.0 - na * nb / 2.0)
               / sqrt(na * nb / 12.0
                      * ((na + nb + 1)
                         - tie_term / ((na + nb) * (na + nb - 1.0)))))
             > 1.96 AS significant
    FROM s
"""


@register("agg_mann_whitney", oracle=_MWU_ORACLE)
def agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between the purchase and click
    value distributions — the NONPARAMETRIC sibling of agg_t_test
    (rank-based, so heavy tails and outliers cannot fake or mask a
    shift), with midrank tie handling and the tie-corrected normal
    approximation for z.

    The distributed trick: ranks are never assigned per ROW. Grouping by
    VALUE first makes the rank table bounded by the value DOMAIN (2-dp
    money in [0.01, 490.02] — at most ~49k rows at ANY corpus size), and
    each distinct value's midrank is cum_preceding + (count+1)/2 from
    one cumulative window over that bounded table. Rank sums are then
    combinable SUMs of count * midrank. Parity note: midranks are
    dyadic rationals (x.0 or x.5) and counts are ints, so every sum is
    EXACT in both engines regardless of order — the z statistic's
    divisions are the only inexact ops, and they are identical
    single expressions (floor-at-4dp for the decimal-tie convention)."""
    t = load(spark, sf_dir)
    ev = t.events.where(F.col("event_type").isin(TTEST_A, TTEST_B))
    vg = ev.groupBy("value").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.when(F.col("event_type") == TTEST_A, 1).otherwise(0)).alias(
            "ca"
        ),
    )
    wcum = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = vg.select(
        "c",
        "ca",
        (
            F.coalesce(F.sum("c").over(wcum), F.lit(0))
            + (F.col("c") + 1) / 2.0
        ).alias("avg_rank"),
    )
    s = ranked.agg(
        F.sum("ca").alias("na"),
        F.sum(F.col("c") - F.col("ca")).alias("nb"),
        F.sum(F.col("ca") * F.col("avg_rank")).alias("ra"),
        F.sum(
            F.col("c").cast("double") * F.col("c") * F.col("c") - F.col("c")
        ).alias("tie_term"),
    )
    na, nb = F.col("na"), F.col("nb")
    u_a = F.col("ra") - na * (na + 1) / 2.0
    sigma = F.sqrt(
        na * nb / 12.0
        * ((na + nb + 1) - F.col("tie_term") / ((na + nb) * (na + nb - 1.0)))
    )
    z = (u_a - na * nb / 2.0) / sigma
    return s.select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        F.round(u_a, 1).alias("u_a"),
        (F.floor(z * 10000) / 10000).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant"),
    )


_KS_ORACLE = f"""
    WITH ev AS (
      SELECT event_type, value FROM events
      WHERE event_type IN ('{TTEST_A}', '{TTEST_B}')
    ),
    vg AS (
      SELECT value,
             SUM(CASE WHEN event_type = '{TTEST_A}' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN event_type = '{TTEST_B}' THEN 1 ELSE 0 END) AS cb
      FROM ev GROUP BY value
    ),
    cum AS (
      SELECT value,
             SUM(ca) OVER (ORDER BY value
                           ROWS UNBOUNDED PRECEDING) AS cca,
             SUM(cb) OVER (ORDER BY value
                           ROWS UNBOUNDED PRECEDING) AS ccb,
             SUM(ca) OVER () AS na,
             SUM(cb) OVER () AS nb
      FROM vg
    ),
    s AS (
      SELECT MAX(na) AS na, MAX(nb) AS nb,
             MAX(abs(CAST(cca AS DOUBLE) / na
                     - CAST(ccb AS DOUBLE) / nb)) AS d
      FROM cum
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           floor(d * 10000) / 10000 AS d_stat,
           floor(1.36 * sqrt((na + nb) / (CAST(na AS DOUBLE) * nb))
                 * 10000) / 10000 AS d_crit,
           d > 1.36 * sqrt((na + nb) / (CAST(na AS DOUBLE) * nb))
             AS significant
    FROM s
"""


@register("agg_ks_test", oracle=_KS_ORACLE)
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the purchase and click
    value distributions: D = sup |ECDF_a - ECDF_b|, compared to the 5%
    large-sample critical value 1.36 * sqrt((na+nb)/(na*nb)). Completes
    the experimentation trio — agg_t_test asks "did the MEAN move",
    agg_mann_whitney "did the DISTRIBUTION shift", KS "did the SHAPE
    change anywhere" (it catches variance/tail changes both rank tests
    miss).

    Same bounded-domain recipe as agg_mann_whitney: group by VALUE
    first, so both ECDFs are cumulative sums over the <=49k-row value
    domain, never per-row ranks; the sup is a MAX over that bounded
    table. Cumulative counts are exact integers — the only doubles are
    the two final divisions per domain row, identical expressions in
    both engines."""
    t = load(spark, sf_dir)
    ev = t.events.where(F.col("event_type").isin(TTEST_A, TTEST_B))
    vg = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == TTEST_A, 1).otherwise(0)).alias(
            "ca"
        ),
        F.sum(F.when(F.col("event_type") == TTEST_B, 1).otherwise(0)).alias(
            "cb"
        ),
    )
    wcum = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    cum = vg.select(
        F.sum("ca").over(wcum).alias("cca"),
        F.sum("cb").over(wcum).alias("ccb"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
    )
    s = cum.agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.max(
            F.abs(
                F.col("cca").cast("double") / F.col("na")
                - F.col("ccb").cast("double") / F.col("nb")
            )
        ).alias("d"),
    )
    na, nb = F.col("na"), F.col("nb")
    crit = 1.36 * F.sqrt((na + nb) / (na.cast("double") * nb))
    return s.select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        (F.floor(F.col("d") * 10000) / 10000).alias("d_stat"),
        (F.floor(crit * 10000) / 10000).alias("d_crit"),
        (F.col("d") > crit).alias("significant"),
    )


#: Asymptotic 5% critical value of the Cramer-von Mises limit
#: distribution (Anderson-Darling 1952 table; the two-sample T shares
#: the one-sample omega^2 limit, Anderson 1962).
_CVM_CRIT_5PCT = 0.461

_CVM_ORACLE = f"""
    WITH ev AS (
      SELECT event_type, value FROM events
      WHERE event_type IN ('{TTEST_A}', '{TTEST_B}')
    ),
    vg AS (
      SELECT value,
             CAST(SUM(CASE WHEN event_type = '{TTEST_A}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN event_type = '{TTEST_B}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM ev GROUP BY value
    ),
    cum AS (
      SELECT ca + cb AS l,
             SUM(ca) OVER wc AS cca, SUM(cb) OVER wc AS ccb,
             SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
      FROM vg
      WINDOW wc AS (ORDER BY value ROWS UNBOUNDED PRECEDING)
    ),
    term AS (
      SELECT na, nb,
             SUM(l * POWER(CAST(CAST(cca AS HUGEINT) * nb
                                - CAST(ccb AS HUGEINT) * na
                                AS DOUBLE), 2)) OVER wt AS cum_term
      FROM cum
      WINDOW wt AS (ORDER BY cca + ccb ROWS UNBOUNDED PRECEDING)
    ),
    s AS (
      SELECT MAX(na) AS na, MAX(nb) AS nb, MAX(cum_term) AS ssq
      FROM term
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           floor(ssq / (CAST(na AS DOUBLE) * nb
                        * POWER(CAST(na + nb AS DOUBLE), 2))
                 * 1000000) / 1000000 AS t_stat,
           ssq / (CAST(na AS DOUBLE) * nb
                  * POWER(CAST(na + nb AS DOUBLE), 2))
             > {_CVM_CRIT_5PCT} AS significant
    FROM s
"""


@register("agg_cvm_test", oracle=_CVM_ORACLE)
def agg_cvm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramer-von Mises test between the purchase and click
    value distributions: T = na*nb/N^2 * sum over the POOLED sample of
    (ECDF_a - ECDF_b)^2 (Anderson 1962), against the 5% asymptotic
    critical value {_CVM_CRIT_5PCT}. Completes the two-sample family —
    agg_t_test (mean), agg_mann_whitney (location), agg_ks_test (max
    ECDF gap): CvM INTEGRATES the squared gap over the whole support,
    so many small distributed differences that never breach KS's single
    sup can still reject — the drift shape a slow corpus-mix change
    produces.

    Scale/determinism: the agg_ks_test bounded-domain recipe — counts
    fold per VALUE first (<=49k-row domain at any SF), the ECDF gap per
    domain row is kept as the EXACT integer cca*nb - ccb*na
    (decimal(38,0) / HUGEINT: ~1e13 x 1e13 passes 2^63) and only enters
    doubles inside the squared term; the sum of nonnegative terms folds
    as a cumulative window in pooled-rank order (identical summation
    order both engines — a groupBy SUM of doubles would fold in
    partition order) and its MAX is the total. t_stat floors at 1e-6 —
    the established lattice convention."""
    t = load(spark, sf_dir)
    ev = t.events.where(F.col("event_type").isin(TTEST_A, TTEST_B))
    vg = ev.groupBy("value").agg(
        F.sum(
            F.when(F.col("event_type") == TTEST_A, 1).otherwise(0)
        ).cast("bigint").alias("ca"),
        F.sum(
            F.when(F.col("event_type") == TTEST_B, 1).otherwise(0)
        ).cast("bigint").alias("cb"),
    )
    wcum = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = vg.select(
        (F.col("ca") + F.col("cb")).alias("l"),
        F.sum("ca").over(wcum).alias("cca"),
        F.sum("cb").over(wcum).alias("ccb"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
    )
    gap = (
        F.col("cca").cast("decimal(20,0)") * F.col("nb")
        - F.col("ccb").cast("decimal(20,0)") * F.col("na")
    ).cast("decimal(38,0)")
    wterm = Window.orderBy(F.col("cca") + F.col("ccb")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    term = cum.select(
        "na",
        "nb",
        F.sum(
            F.col("l") * F.pow(gap.cast("double"), F.lit(2))
        ).over(wterm).alias("cum_term"),
    )
    s = term.agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.max("cum_term").alias("ssq"),
    )
    na, nb = F.col("na"), F.col("nb")
    t_stat = F.col("ssq") / (
        na.cast("double") * nb * F.pow((na + nb).cast("double"), F.lit(2))
    )
    return s.select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        (F.floor(t_stat * 1_000_000) / 1_000_000).alias("t_stat"),
        (t_stat > _CVM_CRIT_5PCT).alias("significant"),
    )


@register(
    "agg_hll_intersection_bound",
    oracle="""
    WITH yr AS (
      SELECT year(o_orderdate) AS y, o_custkey FROM orders
      WHERE year(o_orderdate) IN (1996, 1997)
    )
    SELECT CAST((SELECT COUNT(DISTINCT o_custkey) FROM yr WHERE y = 1996)
                AS BIGINT) AS exact_a,
           CAST((SELECT COUNT(DISTINCT o_custkey) FROM yr WHERE y = 1997)
                AS BIGINT) AS exact_b,
           CAST((SELECT COUNT(DISTINCT o_custkey) FROM yr)
                AS BIGINT) AS exact_union,
           CAST((SELECT COUNT(DISTINCT o_custkey) FROM yr WHERE y = 1996)
                + (SELECT COUNT(DISTINCT o_custkey) FROM yr WHERE y = 1997)
                - (SELECT COUNT(DISTINCT o_custkey) FROM yr)
                AS BIGINT) AS exact_intersection,
           TRUE AS within_tolerance
    """,
)
def agg_hll_intersection_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET-INTERSECTION estimate via inclusion-exclusion over
    re-aggregatable HLL sketches, with the bound-contract verdict — the
    question a 100 TB audience-overlap / retention query answers from
    PERSISTED per-cohort sketches without rescanning either cohort:
    |1996 buyers ∩ 1997 buyers| ~ est(A) + est(B) - est(A ∪ B), where
    the union estimate comes from hll_union_agg over the two sketches
    (HLL unions are lossless; intersections are not natively supported,
    inclusion-exclusion is the standard recipe and its error compounds
    across the three estimates). Completes the sketch family's set
    algebra next to the distinct-count bounds.

    Contract shape (the agg_hll_sketch_bound pattern): the exact
    cohort/union/intersection counts are hard-matched values (the
    intersection exactly equals a + b - union by identity, no join
    needed); `within_tolerance` compares the sketch-side estimate
    against the exact intersection with a 5-sigma-per-term budget
    (3 estimates x 5 x 1.6% rsd at lgK=12, scaled by the magnitudes
    that enter the subtraction) — a correct pipeline practically
    cannot fail it, a double-merged or dropped sketch deterministically
    does. One scan builds both cohort sketches (groupBy year);
    everything downstream is a 2-row fold."""
    t = load(spark, sf_dir)
    yr = t.orders.select(
        F.year("o_orderdate").alias("y"), "o_custkey"
    ).where(F.col("y").isin(1996, 1997))
    per_yr = yr.groupBy("y").agg(
        F.hll_sketch_agg("o_custkey", 12).alias("sk"),
        F.countDistinct("o_custkey").alias("exact"),
    )
    folded = per_yr.agg(
        F.min(F.when(F.col("y") == 1996, F.col("exact"))).alias("exact_a"),
        F.min(F.when(F.col("y") == 1997, F.col("exact"))).alias("exact_b"),
        F.min(
            F.when(F.col("y") == 1996, F.hll_sketch_estimate(F.col("sk")))
        ).alias("est_a"),
        F.min(
            F.when(F.col("y") == 1997, F.hll_sketch_estimate(F.col("sk")))
        ).alias("est_b"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_union"),
    )
    exact_union = yr.agg(
        F.countDistinct("o_custkey").alias("exact_union")
    )
    est_int = F.col("est_a") + F.col("est_b") - F.col("est_union")
    exact_int = (
        F.col("exact_a") + F.col("exact_b") - F.col("exact_union")
    )
    tol = 5 * 0.016 * (
        F.col("exact_a") + F.col("exact_b") + F.col("exact_union")
    )
    return folded.crossJoin(F.broadcast(exact_union)).select(
        F.col("exact_a").cast("bigint").alias("exact_a"),
        F.col("exact_b").cast("bigint").alias("exact_b"),
        F.col("exact_union").cast("bigint").alias("exact_union"),
        exact_int.cast("bigint").alias("exact_intersection"),
        (F.abs(est_int - exact_int) <= tol).alias("within_tolerance"),
    )


_WINSOR_ORACLE = """
    WITH cuts AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS lo,
             quantile_cont(l_extendedprice, 0.95) AS hi
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(l.l_extendedprice), 2) AS raw_mean,
           ROUND(AVG(LEAST(GREATEST(l.l_extendedprice, c.lo), c.hi)), 2)
             AS winsorized_mean,
           ROUND(c.lo, 2) AS p05, ROUND(c.hi, 2) AS p95
    FROM lineitem l JOIN cuts c USING (l_returnflag)
    GROUP BY l.l_returnflag, c.lo, c.hi
"""


@register("agg_winsorized_mean", oracle=_WINSOR_ORACLE)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per return flag: clamp the measure to its own
    [p5, p95] band before averaging — the standard heavy-tail guard for
    revenue-per-user style metrics (a single whale order cannot move
    the reported mean by more than the p95 clamp; pairs with the
    experimentation suite, where winsorization is what actually ships
    before a t-test on revenue). Emits raw vs winsorized means so the
    tail influence is visible.

    Scale shape: pass 1 reduces the facts to a |flags|-row cut frame
    (exact percentile per group — approx_percentile sketch partials at
    100 TB, the q_rfm_segmentation note); the frame broadcasts back and
    pass 2 is one combinable clamped average. Exact-percentile
    interpolation is bit-identical to DuckDB's quantile_cont (the
    text_length_trim precedent); means are 2-dp rounded (t-test
    doctrine)."""
    t = load(spark, sf_dir)
    cuts = t.lineitem.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.05)).alias("lo"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("hi"),
    )
    clamped = F.least(
        F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi")
    )
    return (
        t.lineitem.select("l_returnflag", "l_extendedprice")
        .join(F.broadcast(cuts), "l_returnflag")
        .groupBy("l_returnflag", "lo", "hi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg("l_extendedprice"), 2).alias("raw_mean"),
            F.round(F.avg(clamped), 2).alias("winsorized_mean"),
        )
        .select(
            "l_returnflag",
            "n",
            "raw_mean",
            "winsorized_mean",
            F.round("lo", 2).alias("p05"),
            F.round("hi", 2).alias("p95"),
        )
    )
