"""Subquery-decorrelation composites: the TPC-H shapes whose defining
feature is a subquery (scalar, correlated, or derived-table) rather than a
plain join tree — Q2/Q11/Q12/Q13/Q15/Q17/Q22 adapted to the TESTDATA
schema (no partsupp/shipmode/commitdate columns; see FIXTURES.md).

Spark-first posture: none of these use a correlated loop. Every correlated
subquery is expressed as its decorrelated form — aggregate-then-join —
which is exactly what Catalyst's RewriteCorrelatedScalarSubquery produces
from the SQL form, but written explicitly so the plan is pinned and
readable. The aggregate always runs BEFORE the join it feeds, so at 100 TB
the join inputs are already reduced (per-part averages, per-supplier
revenues, one global scalar), never the raw fact table twice.

Cross-engine parity: scalar comparison thresholds are kept in exact
DECIMAL arithmetic rearranged to multiply-compare form (``qty * 5 * cnt <
sum`` instead of ``qty < 0.2 * avg``) so no float rounding can flip a
boundary row between Spark and DuckDB.

Reference lineage: the reference pipeline's only subquery-like construct
is the sink-state dedup probe (child.py:174-191 — a lookup per candidate
file); these queries generalize that probe-against-derived-state pattern
to relational form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"
)


def _revenue_d():
    return F.col("l_extendedprice").cast("decimal(18,4)") * (
        1 - F.col("l_discount").cast("decimal(18,4)")
    )


@register(
    "q_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) per_cust
    GROUP BY c_count
    """,
)
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer — a
    two-level aggregate over a LEFT OUTER join whose filter lives in the
    ON clause (so customers with only urgent orders still appear, with
    c_count = 0). Pre-filtering the orders side before the left join is
    the equivalent rewrite. The first groupBy shuffles on c_custkey; the
    second input is one row per customer, so its shuffle is tiny."""
    t = load(spark, sf_dir)
    o = t.orders.where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t.customer.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q_priority_lines",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode column absent -> linestatus): dual
    conditional counts over a fact x fact equi join with a pushed date
    range. One pass, one join, one aggregate — the CASE pair never forces
    a second scan."""
    t = load(spark, sf_dir)
    li = t.lineitem.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t.orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, SUM({_REV_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(rev.total_rev, 2) AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the quarter's maximum
    revenue — a scalar MAX subquery over a derived aggregate, decorrelated
    as aggregate -> global-max -> broadcast the one-row max back onto the
    aggregate. DECIMAL revenue keeps the max-equality exact across
    engines and partitionings (a double sum would make ties
    nondeterministic). The heavy groupBy runs once; the max is O(suppliers)."""
    t = load(spark, sf_dir)
    rev = (
        t.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue_d()).alias("total_rev"))
    )
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(max_rev), F.col("total_rev") == F.col("max_rev"))
        .join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "q_small_qty_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) / 7.0, 2)
                AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey AS a_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty,
             COUNT(*) AS cnt_qty
      FROM lineitem GROUP BY l_partkey
    ) a ON a.a_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND CAST(l.l_quantity AS DECIMAL(18,4)) * 5 * a.cnt_qty < a.sum_qty
    """,
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders — the
    classic correlated AVG subquery (l_quantity < 0.2 * avg per part),
    decorrelated into a per-part aggregate joined back to the fact. The
    threshold is rearranged to exact multiply-compare form
    (qty * 5 * cnt < sum, all DECIMAL) so no engine's float AVG can flip
    a boundary row. At scale the per-part aggregate is a map-side-combine
    friendly shuffle on l_partkey, reused by the join on the same key —
    one exchange feeds both."""
    t = load(spark, sf_dir)
    per_part = t.lineitem.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt_qty"),
    )
    li = t.lineitem.join(
        t.part.where(F.col("p_brand") == "Brand#3"),
        F.col("p_partkey") == F.col("l_partkey"),
    )
    return (
        li.join(per_part, F.col("a_partkey") == F.col("l_partkey"))
        .where(
            F.col("l_quantity").cast("decimal(18,4)") * 5 * F.col("cnt_qty")
            < F.col("sum_qty")
        )
        .agg(
            (F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")) / 7.0, 2))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q_idle_rich_customers",
    oracle="""
    WITH bal AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s, COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment, COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS totacctbal
    FROM customer c, bal
    WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * bal.n > bal.s
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2001-01-01'
      )
    GROUP BY c.c_mktsegment
    """,
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders, grouped by segment. Two subquery forms in one query: a global
    scalar (average balance, decorrelated to a one-row broadcast in
    multiply-compare form so the comparison is exact DECIMAL) and a NOT
    EXISTS (left anti join against the date-filtered orders — the direct
    generalization of the reference's dedup-skip probe,
    scrap/child_otherftp.py:280-298). The anti join's right side is
    pre-filtered by the pushed date predicate before it shuffles."""
    t = load(spark, sf_dir)
    bal = F.broadcast(
        t.customer.where(F.col("c_acctbal") > 0.0).agg(
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    recent = t.orders.where(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    rich = t.customer.crossJoin(bal).where(
        F.col("c_acctbal").cast("decimal(18,2)") * F.col("n") > F.col("s")
    )
    return (
        rich.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
    )


@register(
    "q_min_cost_supplier",
    oracle="""
    WITH offer AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(18,4))) AS min_price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey AS b_partkey, MIN(min_price) AS best_price
      FROM offer GROUP BY l_partkey
    )
    SELECT p.p_partkey, p.p_name, p.p_brand, s.s_suppkey, s.s_name, n.n_name,
           CAST(ROUND(o.min_price, 2) AS DOUBLE) AS best_price
    FROM offer o
    JOIN best ON best.b_partkey = o.l_partkey AND o.min_price = best.best_price
    JOIN part p ON p.p_partkey = o.l_partkey
    JOIN supplier s ON s.s_suppkey = o.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size BETWEEN 1 AND 10
    ORDER BY best_price, p.p_partkey, s.s_suppkey
    LIMIT 20
    """,
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (partsupp absent -> offers derived from lineitem):
    for each part, the supplier(s) quoting the minimum price — the
    correlated MIN subquery decorrelated as aggregate -> per-part min ->
    join back on (partkey, price). Ties keep all minimal suppliers,
    matching Q2. DECIMAL min keeps the equality join exact. The explicit
    repartition(l_partkey) makes the shuffle-sharing REAL: hash(l_partkey)
    satisfies the clustering requirement of the (partkey, suppkey)
    aggregate, the per-part min, and the offer-to-best join, so one
    exchange feeds all three (plain groupBy would plan hash(pk,sk) and
    hash(pk) as separate shuffles). Dims join after reduction, nation
    broadcast."""
    t = load(spark, sf_dir)
    offer = t.lineitem.repartition("l_partkey").groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast("decimal(18,4)")).alias("min_price")
    )
    best = offer.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("min_price").alias("best_price")
    )
    return (
        offer.join(
            best,
            (F.col("b_partkey") == F.col("l_partkey"))
            & (F.col("min_price") == F.col("best_price")),
        )
        .join(
            t.part.where(F.col("p_size").between(1, 10)),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t.nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            "s_suppkey",
            "s_name",
            "n_name",
            F.round("min_price", 2).cast("double").alias("best_price"),
        )
        .orderBy("best_price", "p_partkey", "s_suppkey")
        .limit(20)
    )


@register(
    "q_important_part_value",
    oracle="""
    WITH pv AS (
      SELECT l.l_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * CAST(l.l_quantity AS DECIMAL(8,2))) AS part_val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey
    )
    SELECT pv.l_partkey, CAST(ROUND(pv.part_val, 2) AS DOUBLE) AS part_value
    FROM pv, (SELECT SUM(part_val) AS total FROM pv) t
    WHERE pv.part_val * 1000 > t.total
    """,
)
def q_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts representing a significant fraction of one
    nation's traded value — HAVING against a scalar aggregate over the
    same derived table. The per-part aggregate is computed ONCE and
    reused for both the scalar total and the filter (self-referencing
    CTE), so the fact table is scanned a single time. The fraction test
    runs as exact DECIMAL multiply-compare (val * 1000 > total); scales
    are sized (12,2)x(8,2)->(21,4) so the x1000 never overflows either
    engine's decimal lattice."""
    t = load(spark, sf_dir)
    nat = F.broadcast(
        t.nation.where(F.col("n_name") == "NATION_3").select("n_nationkey")
    )
    sup = t.supplier.join(
        nat, F.col("n_nationkey") == F.col("s_nationkey")
    ).select("s_suppkey")
    pv = (
        t.lineitem.join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * F.col("l_quantity").cast("decimal(8,2)")
            ).alias("part_val")
        )
    )
    total = F.broadcast(pv.agg(F.sum("part_val").alias("total")))
    return (
        pv.crossJoin(total)
        .where(F.col("part_val") * 1000 > F.col("total"))
        .select(
            "l_partkey", F.round("part_val", 2).cast("double").alias("part_value")
        )
    )
