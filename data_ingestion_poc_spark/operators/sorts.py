"""Sorts / limits / top-k (SURVEY.md section 2 B6). All extensions (the
reference never sorts). The driver's value-hash is order-insensitive, so
each query materializes its ordering as a `sort_pos` column computed over a
TOTAL order (unique tiebreaker) — deterministic across engines.

Scale note: orderBy().limit(k) compiles to TakeOrderedAndProject — each
task keeps a k-row heap and the driver merges, no global sort. A full
global sort uses range partitioning (sampled bounds) and is the expensive
path; prefer top-k when k is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import register


@register(
    "sort_multi_key",
    oracle="""
    SELECT o_orderkey, pri, o_totalprice,
           row_number() OVER (
             ORDER BY pri ASC NULLS LAST, o_totalprice DESC, o_orderkey ASC
           ) AS sort_pos
    FROM (
      SELECT o_orderkey, nullif(o_orderpriority, '1-URGENT') AS pri, o_totalprice
      FROM orders
      WHERE o_orderkey < 2000
    )
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key sort with mixed asc/desc and explicit NULLS LAST
    placement (nulls manufactured via nullif). sort_pos pins the ordering
    into the values so the order-insensitive hash still checks it.

    ``row_number().over(Window.orderBy(...))`` would move the whole table
    into ONE partition (WindowExec warns exactly that; the r4 plan audit
    flagged it), so the global position is assigned distributedly
    instead — the classic two-phase recipe:

    1. range-partition on the sort keys + sort within partitions (the
       one full-data exchange a global sort needs anyway);
    2. ``monotonically_increasing_id`` encodes (partition index << 33) +
       local row position — computed in place, no shuffle, deterministic
       here because the tiebreak on unique o_orderkey makes the sort a
       total order;
    3. per-partition row counts (one row per range partition) get a
       prefix-sum offset via a tiny window and broadcast-join back;
       sort_pos = offset + local position.

    The only SinglePartition exchange left is the prefix-sum over the
    partition-count frame — bounded at one row per range partition."""
    t = load(spark, sf_dir)
    base = t.orders.where(F.col("o_orderkey") < 2000).select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("pri"),
        "o_totalprice",
    )
    order = [
        F.col("pri").asc_nulls_last(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    ]
    return (
        global_row_number(base, order, "sort_pos", num_partitions=8)
        .select("o_orderkey", "pri", "o_totalprice", "sort_pos")
        .sortWithinPartitions(*order)
    )


def global_row_number(
    df: DataFrame, order: list, pos_col: str, num_partitions: int = 8
) -> DataFrame:
    """Assign a 1-based global row number under `order` WITHOUT moving the
    table into one partition (the two-phase distributed recipe — see
    sort_multi_key's docstring). `order` must be a TOTAL order (include a
    unique tiebreak column) or the assignment is nondeterministic within
    ties. Output keeps all input columns plus `pos_col` (int), range-
    partitioned and locally sorted by `order`.

    The localCheckpoint is the CONSISTENCY BARRIER this recipe needs:
    the offsets aggregate and the main frame are two plan branches over
    the same range exchange, and repartitionByRange's boundary SAMPLING
    is nondeterministic per evaluation — without the barrier the two
    branches can see different partitionings, so offsets no longer match
    the rows they are joined back to and ranks duplicate/skip (caught by
    the r10 full-registry sf0.1 sweep on corpus_heaps_law: bucket sizes
    439-550 instead of 500; sf0.01 masked it because range sampling is
    exhaustive on small inputs). Spark's own RDD.zipWithIndex pins an
    evaluation the same way (an eager count job per partition); lazy
    localCheckpoint materializes each partition once (MEMORY_AND_DISK)
    on first use and both branches then read the same blocks — the one
    full-table materialization a distributed global rank fundamentally
    requires."""
    ranged = (
        df.repartitionByRange(num_partitions, *order)
        .sortWithinPartitions(*order)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftrightunsigned("_mid", 33))
        .withColumn("_local", F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)))
        .localCheckpoint(eager=False)
    )
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_off",
            F.sum("_cnt").over(Window.orderBy("_pid")) - F.col("_cnt"),
        )
        .select("_pid", "_off")
    )
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(
            pos_col, (F.col("_off") + F.col("_local") + 1).cast("int")
        )
        .drop("_mid", "_pid", "_local", "_off")
    )


@register(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: compiles to TakeOrderedAndProject (per-task heaps, driver
    merge — no shuffle of the full table). Tiebreak on o_orderkey keeps the
    k-row frontier deterministic."""
    t = load(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


_SKYLINE_ORACLE = """
    SELECT q.p_partkey, q.p_retailprice, CAST(q.p_size AS BIGINT) AS p_size
    FROM part q
    WHERE NOT EXISTS (
      SELECT 1 FROM part p
      WHERE p.p_retailprice <= q.p_retailprice AND p.p_size <= q.p_size
        AND (p.p_retailprice < q.p_retailprice OR p.p_size < q.p_size)
    )
"""


@register("sort_pareto_skyline", oracle=_SKYLINE_ORACLE)
def sort_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline (dominance / maximal-vector) query: the parts not
    STRICTLY dominated on (minimize retail price, minimize size) — the
    preference-query operator behind "show me the options where nothing
    else is both cheaper and smaller" (Borzsony/Kossmann/Stocker's
    SKYLINE OF, which naive engines write as the quadratic NOT EXISTS
    self-join the oracle runs). Points tied on both dimensions dominate
    neither, so identical (price, size) twins both survive.

    Distributed 2-D form, zero quadratic work: (1) one combinable
    groupBy collapses parts to min-size per price — bounded by the
    PRICE DOMAIN (1-dp lattice on [900, 999.9]: <=1000 rows at any
    corpus size, the agg_mann_whitney bounded-domain argument); (2) a
    strict-preceding running MIN over that bounded frame gives the best
    size among all strictly-cheaper prices, so a price's min-size row
    is skyline iff it beats that prefix; (3) the surviving (price,
    min_size) chain is monotone decreasing in size — at most |size
    domain| = 50 rows here — joined back on (price, size) to pull
    every surviving part row. The join-back carries NO hard broadcast
    hint: the skyline is domain-bounded on THIS fixture but a Pareto
    front has no size guarantee in general, so AQE sizes it at
    runtime (broadcast when tiny, shuffle join when not). The
    quadratic dominance test is the ORACLE's cost, never the
    operator's."""
    t = load(spark, sf_dir)
    pp = t.part.groupBy("p_retailprice").agg(
        F.min("p_size").alias("ms")
    )
    w = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # Alias both sides: `sky` derives from t.part, so an unqualified
    # broadcast-back join would resolve both sides' attributes to the
    # same lineage (MISSING_ATTRIBUTES AnalysisException).
    sky = (
        pp.withColumn("pm", F.min("ms").over(w))
        .where(F.col("pm").isNull() | (F.col("pm") > F.col("ms")))
        .select(
            F.col("p_retailprice").alias("sky_price"),
            F.col("ms").alias("sky_size"),
        )
    )
    return (
        t.part.alias("p")
        .join(
            sky.alias("k"),
            (F.col("p.p_retailprice") == F.col("k.sky_price"))
            & (F.col("p.p_size") == F.col("k.sky_size")),
        )
        .select(
            "p.p_partkey",
            "p.p_retailprice",
            F.col("p.p_size").cast("bigint").alias("p_size"),
        )
    )
