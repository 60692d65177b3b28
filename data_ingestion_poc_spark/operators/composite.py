"""Composite analytics queries: multi-join + aggregate + top-k pipelines
(TPC-H Q3/Q4/Q5/Q10/Q14/Q18 shapes adapted to the TESTDATA schema).

The single-operator inventory (SURVEY.md section 2 B1-B8) proves each
primitive in isolation; these queries prove the primitives COMPOSE the way
a real analytics workload uses them: selective dimension filters feeding
multi-way joins feeding grouped aggregation feeding top-k. They are also
the plans where Catalyst's work shows up — join reordering, filter
pushdown through joins, broadcast selection for dims, AQE shuffle
coalescing — so they anchor the bench.

Parity conventions follow registry.py: revenue sums run in DECIMAL(18,4)
(exact lattice arithmetic -> partitioning-independent ROUND), dates are
output as 'yyyy-MM-dd' strings, every top-k ORDER BY carries a unique
tiebreaker so LIMIT is deterministic cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import register


def _revenue_d():
    # DECIMAL revenue measure (see agg_hash_group's rationale).
    return F.col("l_extendedprice").cast("decimal(18,4)") * (
        1 - F.col("l_discount").cast("decimal(18,4)")
    )


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"
)


@register(
    "q_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE)   AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d')         AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-07-01'
      AND l.l_shipdate > TIMESTAMP '1998-07-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter on customer, date filters on both
    fact inputs, 3-way join, grouped revenue, top-10. Both filters push
    below the joins; the aggregate's shuffle is O(qualifying orders);
    the final top-k is a TakeOrderedAndProject, not a global sort."""
    t = load(spark, sf_dir)
    c = t.customer.where(F.col("c_mktsegment") == "BUILDING")
    o = t.orders.where(F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
    li = t.lineitem.where(F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_revenue_d()), 2).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: existence probe (left semi join) feeding a grouped
    count — late-shipping orders per priority class. The semi join emits
    each order at most once, so no post-join dedup is needed; the
    non-equi residual (shipdate vs orderdate+60d) rides on the equi key."""
    t = load(spark, sf_dir)
    o = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    late = o.join(
        t.lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join (2 facts, 4 dims) with a same-nation
    residual between customer and supplier, grouped revenue per nation.
    nation/region are broadcast (25/5 rows); the region filter prunes to
    1/5 of nations BEFORE the big joins via the broadcast chain."""
    t = load(spark, sf_dir)
    o = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    n_asia = F.broadcast(
        t.nation.join(
            F.broadcast(t.region.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return (
        t.lineitem.join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t.customer,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n_asia, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(_revenue_d()), 2).cast("double").alias("revenue"))
    )


@register(
    "q_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS revenue,
           ROUND(c.c_acctbal, 2) AS c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last quarter.
    Selective flag+date filters, 4-way join with a broadcast dim, grouped
    revenue per customer, deterministic top-20."""
    t = load(spark, sf_dir)
    o = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = t.lineitem.where(F.col("l_returnflag") == "R")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_revenue_d()), 2).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q_promo_revenue",
    oracle=f"""
    SELECT CAST(ROUND(
             100.0 * SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL}
                              ELSE CAST(0 AS DECIMAL(18,4)) END)
                   / SUM({_REV_SQL}), 4) AS DOUBLE) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one month — conditional
    aggregation over a fact x dim join, single-row result. The part side
    joins on its key; at sf bench sizes AQE broadcasts it."""
    t = load(spark, sf_dir)
    li = t.lineitem.where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = _revenue_d()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4)
            .cast("double")
            .alias("promo_pct")
        )
    )


@register(
    "q_large_volume_customer",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           ROUND(big.sum_qty, 2) AS sum_qty
    FROM (
      SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 180
    ) big
    JOIN orders o   ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-then-join with a HAVING filter. The
    heavy groupBy runs FIRST so the join inputs are already reduced to
    qualifying orders — the aggregate-pushdown pattern that keeps the
    join's shuffle small at scale."""
    t = load(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 180)
    )
    return (
        big.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
    )


@register(
    "q_forecast_revenue",
    oracle=f"""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS forecast_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, no join, no groupBy —
    the query where pushdown does ALL the work. Every predicate reaches
    the parquet scan (range on shipdate, between on discount, bound on
    quantity), so at 100 TB entire row groups skip on column statistics
    and the aggregate sees only qualifying rows."""
    t = load(spark, sf_dir)
    li = t.lineitem.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * F.col("l_discount").cast(
        "decimal(18,4)"
    )
    return li.agg(F.round(F.sum(rev), 2).cast("double").alias("forecast_revenue"))


@register(
    "q_discounted_brand_revenue",
    oracle=f"""
    SELECT CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 35)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 50)
    """,
)
def q_discounted_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-branch predicate spanning both
    join sides. Catalyst extracts the common join key as an equi
    condition and keeps the OR-of-ANDs as a post-join filter, while the
    single-side conjuncts it can derive (brand IN (...), size/quantity
    hulls) push into the scans — the classic test that disjunctions
    don't force a cartesian plan."""
    t = load(spark, sf_dir)
    j = t.lineitem.join(t.part, F.col("p_partkey") == F.col("l_partkey"))
    b = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#7")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    ) | (
        (F.col("p_brand") == "Brand#20")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    return j.where(b).agg(
        F.round(F.sum(_revenue_d()), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q_nation_trade_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(strftime(l.l_shipdate, '%Y') AS INT) AS l_year,
           CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_9')
        OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, l_year
    """,
)
def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dimension table joined in TWO ROLES
    (supplier nation and customer nation) with a disjunctive pairing
    constraint, revenue by year. Both nation broadcasts are filtered to
    the two relevant rows BEFORE joining, so the pairing disjunction
    costs a 2x2 check, not a filter over the full join."""
    t = load(spark, sf_dir)
    pair = ["NATION_3", "NATION_9"]  # fixture nation names are synthetic
    n1 = F.broadcast(
        t.nation.where(F.col("n_name").isin(pair)).select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        t.nation.where(F.col("n_name").isin(pair)).select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    li = t.lineitem.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        li.join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("n1_key") == F.col("s_nationkey"))
        .join(n2, F.col("n2_key") == F.col("c_nationkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(_revenue_d()), 2).cast("double").alias("revenue"))
    )


@register(
    "q_market_share",
    oracle=f"""
    SELECT l_year,
           CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_9' THEN volume
                               ELSE CAST(0 AS DECIMAL(28,4)) END)
                      / SUM(volume), 6) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(strftime(o.o_orderdate, '%Y') AS INT) AS l_year,
             {_REV_SQL} AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n2.n_regionkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
    ) all_sales
    GROUP BY l_year
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's (NATION_9) share of a region's revenue
    per year — conditional numerator over a common denominator in a
    single aggregate pass (never two scans). The DECIMAL volume keeps the
    share ratio exact until the final division."""
    t = load(spark, sf_dir)
    n2_asia = F.broadcast(
        t.nation.join(
            F.broadcast(t.region.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("n2_key"))
    )
    n1 = F.broadcast(
        t.nation.select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    o = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    sales = (
        t.lineitem.join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("n1_key") == F.col("s_nationkey"))
        .join(n2_asia, F.col("n2_key") == F.col("c_nationkey"))
        .select(
            F.year("o_orderdate").alias("l_year"),
            _revenue_d().alias("volume"),
            "supp_nation",
        )
    )
    china = F.when(F.col("supp_nation") == "NATION_9", F.col("volume")).otherwise(
        F.lit(0).cast("decimal(28,4)")
    )
    return sales.groupBy("l_year").agg(
        F.round(F.sum(china) / F.sum("volume"), 6).cast("double").alias("mkt_share")
    )


@register(
    "q_yearly_growth",
    oracle="""
    WITH yearly AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS revenue
      FROM orders GROUP BY o_year
    )
    SELECT o_year, revenue,
           ROUND(revenue - lag(revenue) OVER (ORDER BY o_year), 2) AS yoy_delta,
           ROUND(revenue / NULLIF(lag(revenue) OVER (ORDER BY o_year), 0) - 1, 6)
             AS yoy_growth
    FROM yearly
    """,
)
def q_yearly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth: aggregate THEN window — the window runs
    over one row per year (a global unpartitioned window is safe only
    because the aggregate already reduced the input to O(years) rows;
    running lag over raw orders would serialize 100 TB through one
    task). DECIMAL yearly sums make the deltas exact across engines."""
    t = load(spark, sf_dir)
    yearly = t.orders.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("revenue")
    )
    w = Window.orderBy("o_year")
    prev = F.lag("revenue").over(w)
    return yearly.select(
        "o_year",
        "revenue",
        F.round(F.col("revenue") - prev, 2).alias("yoy_delta"),
        F.round(F.col("revenue") / F.nullif(prev, F.lit(0.0)) - 1, 6).alias(
            "yoy_growth"
        ),
    )


@register(
    "q_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS fv
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS fc
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.fv
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS fp
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.fc
      GROUP BY e.user_id
    )
    SELECT v.user_id,
           strftime(fv, '%Y-%m-%d %H:%M:%S.%f') AS first_view,
           strftime(fc, '%Y-%m-%d %H:%M:%S.%f') AS first_click,
           strftime(fp, '%Y-%m-%d %H:%M:%S.%f') AS first_purchase,
           CASE WHEN fp IS NOT NULL THEN 3
                WHEN fc IS NOT NULL THEN 2
                WHEN fv IS NOT NULL THEN 1
                ELSE 0 END AS funnel_stage
    FROM v LEFT JOIN c ON c.user_id = v.user_id
           LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis per user: first view, first click AFTER
    that view, first purchase AFTER that click (strict event-order
    funnel, not mere presence — a click before the first view does not
    count). The product-analytics staple (Amplitude/Mixpanel funnels).

    The sequential dependency (each stage's threshold is the previous
    stage's result) is expressed as three stacked Window minima over the
    SAME user_id partitioning — Catalyst plans consecutive Window nodes
    over ONE exchange + sort, and the closing per-user aggregate reuses
    it too: a three-stage funnel for one shuffle of the events table.
    The oracle has to re-join events per stage instead (no window
    nesting in plain SQL) — same semantics, clunkier shape; µs-precision
    timestamps make the strict > comparisons exact on both engines."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("user_id")
    fv = t.events.select(
        "user_id",
        "event_type",
        "ts",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w).alias("fv"),
    )
    fc = fv.select(
        "*",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("fv")),
                F.col("ts"),
            )
        ).over(w).alias("fc"),
    )
    fp = fc.select(
        "*",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("fc")),
                F.col("ts"),
            )
        ).over(w).alias("fp"),
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return fp.groupBy("user_id").agg(
        F.date_format(F.max("fv"), fmt).alias("first_view"),
        F.date_format(F.max("fc"), fmt).alias("first_click"),
        F.date_format(F.max("fp"), fmt).alias("first_purchase"),
        F.when(F.max("fp").isNotNull(), 3)
        .when(F.max("fc").isNotNull(), 2)
        .when(F.max("fv").isNotNull(), 1)
        .otherwise(0)
        .alias("funnel_stage"),
    )


@register(
    "q_retention_cohorts",
    oracle="""
    WITH cohort AS (
      SELECT user_id,
             date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
      FROM events
    )
    SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', c.cohort_week, a.active_week) / 7 AS BIGINT)
                                                          AS week_offset,
           CAST(COUNT(*) AS BIGINT)                       AS active_users
    FROM cohort c JOIN activity a ON a.user_id = c.user_id
    GROUP BY c.cohort_week, date_diff('day', c.cohort_week, a.active_week) / 7
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    counted in each subsequent week they remain active (week_offset 0 =
    the cohort week itself) — THE product-analytics retention table
    (weekly buckets because the fixture spans ~3 weeks; swap the
    date_trunc unit for monthly cohorts).

    One user_id shuffle does all the per-user work: the cohort week
    (min ts) comes from a window over the same partitioning the distinct
    (user, week) activity reduction uses, so Catalyst stacks them
    without re-exchanging; the closing (cohort, offset) aggregate is
    O(weeks^2) groups. Week arithmetic is datediff/7 on Monday-truncated
    dates — exact integers on both engines."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("user_id")
    per_event = t.events.select(
        "user_id",
        F.date_trunc("week", "ts").alias("active_week"),
        F.date_trunc("week", F.min("ts").over(w)).alias("cohort_week"),
    )
    user_weeks = per_event.distinct()
    return (
        user_weeks.groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@register(
    "q_fulfillment_latency",
    oracle="""
    WITH fill AS (
      SELECT o.o_orderkey, o.o_orderpriority,
             date_diff('day', o.o_orderdate, MAX(l.l_shipdate)) AS days_to_ship
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT)                       AS n_orders,
           ROUND(quantile_cont(days_to_ship, 0.50), 1)    AS p50_days,
           ROUND(quantile_cont(days_to_ship, 0.95), 1)    AS p95_days,
           CAST(MAX(days_to_ship) AS BIGINT)              AS max_days
    FROM fill
    GROUP BY o_orderpriority
    """,
)
def q_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-fulfillment latency report: days from order to LAST line
    shipment per order, then p50/p95/max per priority class — the SLA
    dashboard shape (join -> per-entity reduction -> per-class percentile).
    The per-order aggregate groups on the join key, so it reuses the
    lineitem/orders shuffle partitioning; the percentile aggregate then
    reduces ~orders/priority-class rows — exact percentiles are fine
    here because the SECOND aggregate's groups are small; at 100 TB the
    first-stage reduction is what keeps them small."""
    t = load(spark, sf_dir)
    fill = (
        t.orders.select("o_orderkey", "o_orderpriority", "o_orderdate")
        .join(
            t.lineitem.select("l_orderkey", "l_shipdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            "o_orderpriority",
            F.datediff(F.col("last_ship"), F.col("o_orderdate")).alias("days_to_ship"),
        )
    )
    return fill.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.percentile("days_to_ship", F.lit(0.50)), 1).alias("p50_days"),
        F.round(F.percentile("days_to_ship", F.lit(0.95)), 1).alias("p95_days"),
        F.max("days_to_ship").cast("bigint").alias("max_days"),
    )


#: Max distinct items per basket admitted to the pair join: a basket of
#: f items emits f(f-1)/2 pair rows, so one degenerate mega-order would
#: dominate the shuffle. 64 is far above TPC-H order widths.
BASKET_CAP = 64

_BASKET_ORACLE = f"""
    WITH baskets AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS item
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    sized AS (
      SELECT okey, item FROM baskets
      QUALIFY COUNT(*) OVER (PARTITION BY okey) <= {BASKET_CAP}
    ),
    n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM sized),
    items AS (SELECT item, COUNT(*) AS n_item FROM sized GROUP BY item),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_pair
      FROM sized a JOIN sized b ON a.okey = b.okey AND a.item < b.item
      GROUP BY a.item, b.item
    )
    SELECT item_a, item_b,
           CAST(n_pair AS BIGINT) AS n_pair,
           ROUND(n_pair * 1.0 / n_orders, 6) AS support,
           ROUND(n_pair * 1.0 / ia.n_item, 6) AS conf_a_to_b,
           ROUND(n_pair * 1.0 * n_orders / (ia.n_item * ib.n_item), 6) AS lift
    FROM pairs
    JOIN items ia ON ia.item = item_a
    JOIN items ib ON ib.item = item_b
    CROSS JOIN n
    WHERE n_pair >= 5
"""


@register("q_market_basket", oracle=_BASKET_ORACLE)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity (association rules): for every brand pair
    co-occurring in an order, exact support, confidence and lift — the
    co-purchase analytics staple (and the exact counting core an Apriori
    / FP-growth run reduces to once candidate pairs are fixed).

    Scale shape: baskets = one distinct-project off the lineitem⨝part
    join (part dimension broadcasts); the pair self-join is keyed on
    l_orderkey, so fan-out is per-basket C(f,2) with f capped at
    BASKET_CAP by a count window over the SAME okey partitioning the
    join shuffles on (no extra Exchange) — the jaccard df-cap policy
    applied to baskets. Item totals and the 1-row basket count broadcast
    back onto the (item, item) pair table."""
    t = load(spark, sf_dir)
    baskets = (
        t.lineitem.join(
            # part scales with SF: no hard broadcast hint (AQE decides)
            t.part.select(
                F.col("p_partkey").alias("l_partkey"), "p_brand"
            ),
            "l_partkey",
        )
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("item"))
        .distinct()
    )
    w_okey = Window.partitionBy("okey")
    # Materialize the capped basket table once: it feeds BOTH sides of
    # the pair self-join plus the item/basket totals, and the window
    # subtree would otherwise recompute per consumer (the same
    # build-once policy as dedup's _capped_shingle_index persist) — at
    # 100 TB this is the bucketed intermediate table you'd write.
    sized = (
        baskets.withColumn("f", F.count(F.lit(1)).over(w_okey))
        .where(F.col("f") <= BASKET_CAP)
        .drop("f")
        .localCheckpoint()
    )
    n = sized.agg(F.countDistinct("okey").alias("n_orders"))
    items = sized.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    # aliased self-join (un-aliased same-lineage attribute refs are the
    # r5 sort_pareto_skyline defect class)
    pairs = (
        sized.alias("sa")
        .join(
            sized.alias("sb"),
            (F.col("sa.okey") == F.col("sb.okey"))
            & (F.col("sa.item") < F.col("sb.item")),
        )
        .groupBy(
            F.col("sa.item").alias("item_a"),
            F.col("sb.item").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= 5)
    )
    ia = items.select(F.col("item").alias("item_a"), F.col("n_item").alias("na"))
    ib = items.select(F.col("item").alias("item_b"), F.col("n_item").alias("nb"))
    return (
        pairs.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(n))
        .select(
            "item_a",
            "item_b",
            "n_pair",
            F.round(F.col("n_pair") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("n_pair") / F.col("na"), 6).alias("conf_a_to_b"),
            F.round(
                F.col("n_pair") * F.col("n_orders") / (F.col("na") * F.col("nb")), 6
            ).alias("lift"),
        )
    )


_RFM_ORACLE = """
    WITH per_cust AS (
      SELECT o_custkey,
             MAX(o_orderdate)            AS last_order,
             COUNT(*)                    AS frequency,
             ROUND(SUM(o_totalprice), 2) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    cuts AS (
      SELECT quantile_cont(epoch(last_order), 0.5) AS r_cut,
             quantile_cont(frequency * 1.0, 0.5)   AS f_cut,
             quantile_cont(monetary, 0.5)          AS m_cut
      FROM per_cust
    ),
    scored AS (
      SELECT CASE WHEN epoch(last_order) >= r_cut THEN 'R1' ELSE 'R0' END
               || CASE WHEN frequency * 1.0 >= f_cut THEN 'F1' ELSE 'F0' END
               || CASE WHEN monetary >= m_cut THEN 'M1' ELSE 'M0' END AS segment,
             frequency, monetary
      FROM per_cust, cuts
    )
    SELECT segment,
           COUNT(*)                     AS n_customers,
           CAST(SUM(frequency) AS BIGINT) AS total_orders,
           ROUND(SUM(monetary), 2)      AS total_spend
    FROM scored GROUP BY segment
"""


@register("q_rfm_segmentation", oracle=_RFM_ORACLE)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the warehouse-classic recency /
    frequency / monetary split, each dimension cut at its MEDIAN into 8
    segments (R1F1M1 = best customers ... R0F0M0 = churned low-value).

    Scale-safe banding: the naive recipe is ntile() over the whole
    customer table — a single-partition global sort. Here the three
    medians reduce to ONE 3-number row (exact percentile locally;
    approx_percentile at 100 TB — agg_histogram_equidepth's documented
    swap) broadcast back over the per-customer aggregate, so band
    assignment is scan-local and the only shuffles are the per-customer
    groupBy and the 8-group rollup. Median epoch-seconds keeps the
    recency cut engine-portable (timestamp quantile interpolation
    differs across engines; epoch doubles do not)."""
    t = load(spark, sf_dir)
    per_cust = t.orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    epoch = F.unix_timestamp("last_order").cast("double")
    cuts = per_cust.agg(
        F.percentile(epoch, F.lit(0.5)).alias("r_cut"),
        F.percentile(F.col("frequency").cast("double"), F.lit(0.5)).alias("f_cut"),
        F.percentile("monetary", F.lit(0.5)).alias("m_cut"),
    )
    seg = F.concat(
        F.when(epoch >= F.col("r_cut"), "R1").otherwise("R0"),
        F.when(F.col("frequency") >= F.col("f_cut"), "F1").otherwise("F0"),
        F.when(F.col("monetary") >= F.col("m_cut"), "M1").otherwise("M0"),
    )
    return (
        per_cust.crossJoin(F.broadcast(cuts))
        .select(seg.alias("segment"), "frequency", "monetary")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("frequency").cast("bigint").alias("total_orders"),
            F.round(F.sum("monetary"), 2).alias("total_spend"),
        )
    )


_ABANDON_ORACLE = """
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_id, ts, event_type,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clicks,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases,
           SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) > 0
             AND SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 0
             AS abandoned
    FROM sess
    GROUP BY user_id, session_no
"""


@register("q_browse_abandonment", oracle=_ABANDON_ORACLE)
def q_browse_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level abandonment report: sessionize each user's events
    on a 30-minute silence gap (win_sessionize's gap-islands recursion),
    then roll each session up to its click/purchase counts and flag
    sessions that clicked but never purchased — the conversion-funnel
    twin of q_funnel_conversion at SESSION grain instead of user grain
    (the grain merchandising teams actually action).

    One user_id shuffle serves the lag flag, the running session
    number, AND the session rollup (groupBy on a prefix of the window
    key re-uses the partitioning); output is one row per session. At
    hot-key scale the sessionize stage swaps to the chunk+stitch
    rewrite exactly as win_sessionize documents."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond precision on BOTH engines (oracle: epoch_us): a plain
    # cast("long") truncates to seconds and can sessionize sub-second
    # timestamps near the 30-min boundary differently across engines.
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = t.events.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = flagged.select(
        "user_id",
        "event_type",
        "ts",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_no"),
    )
    clicks = F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
    buys = F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
    return sess.groupBy("user_id", "session_no").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.count(F.lit(1)).alias("n_events"),
        clicks.alias("n_clicks"),
        buys.alias("n_purchases"),
        ((clicks > 0) & (buys == 0)).alias("abandoned"),
    )


#: Attribution lookback: a purchase is credited to the user's most
#: recent click no older than this (microseconds).
ATTRIB_LOOKBACK_US = 7 * 86400 * 1_000_000

_ATTRIB_ORACLE = f"""
    WITH e AS (
      SELECT event_id, user_id, ts, event_type,
             CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS cts,
             CASE WHEN event_type = 'click' THEN event_id END AS cid
      FROM events
    ),
    lastc AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS pts,
             last_value(cts IGNORE NULLS) OVER w AS last_ts,
             last_value(cid IGNORE NULLS) OVER w AS last_id
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id AS purchase_id, user_id,
           CASE WHEN pts - last_ts <= {ATTRIB_LOOKBACK_US}
                THEN last_id END AS click_id,
           CASE WHEN pts - last_ts <= {ATTRIB_LOOKBACK_US}
                THEN pts - last_ts END AS gap_us,
           COALESCE(pts - last_ts <= {ATTRIB_LOOKBACK_US}, FALSE)
             AS attributed
    FROM lastc WHERE event_type = 'purchase'
"""


@register("q_attribution_last_touch", oracle=_ATTRIB_ORACLE)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to
    the same user's MOST RECENT prior click within a 7-day lookback —
    the default attribution model every ads/analytics warehouse
    computes before graduating to multi-touch. Purchases with no click
    in the window stay unattributed (organic).

    Plan: ONE user_id shuffle serves everything — the "last preceding
    click" is last(click_cols, ignorenulls) over a strictly-preceding
    ROWS frame (no self-join, no as-of join against a second copy of
    events); click id and timestamp are nulled on non-click rows, and
    because they null TOGETHER the two ignore-nulls navigations always
    read the same click row. Gap math at microsecond precision on both
    engines (the q_browse_abandonment lesson). At a hot-user corpus the
    same chunk+stitch rewrite as win_sessionize applies."""
    t = load(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    e = t.events.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", us).alias("cts"),
        F.when(F.col("event_type") == "click", F.col("event_id")).alias(
            "cid"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lastc = e.select(
        "event_id",
        "user_id",
        "event_type",
        us.alias("pts"),
        F.last("cts", ignorenulls=True).over(w).alias("last_ts"),
        F.last("cid", ignorenulls=True).over(w).alias("last_id"),
    )
    gap = F.col("pts") - F.col("last_ts")
    hit = gap <= ATTRIB_LOOKBACK_US
    return lastc.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(hit, F.col("last_id")).alias("click_id"),
        F.when(hit, gap).alias("gap_us"),
        F.coalesce(hit, F.lit(False)).alias("attributed"),
    )


_FUNNEL_PATH_ORACLE = """
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
    ),
    s1 AS (
      SELECT *, MIN(CASE WHEN event_type = 'view' THEN us END)
                  OVER (PARTITION BY user_id) AS v1
      FROM e
    ),
    s2 AS (
      SELECT *, MIN(CASE WHEN event_type = 'click' AND us > v1 THEN us END)
                  OVER (PARTITION BY user_id) AS c1
      FROM s1
    ),
    s3 AS (
      SELECT *, MIN(CASE WHEN event_type = 'purchase' AND us > c1 THEN us END)
                  OVER (PARTITION BY user_id) AS p1
      FROM s2
    )
    SELECT user_id, MIN(v1) AS view_us, MIN(c1) AS click_us,
           MIN(p1) AS purchase_us,
           MIN(p1) IS NOT NULL AS completed,
           MIN(p1) - MIN(v1) AS elapsed_us
    FROM s3 GROUP BY user_id
"""


@register("q_pattern_funnel_path", oracle=_FUNNEL_PATH_ORACLE)
def q_pattern_funnel_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered sequential-pattern match (the MATCH_RECOGNIZE / funnel-
    path shape): per user, the EARLIEST strictly-ordered completion of
    view -> click -> purchase — first view, first click strictly after
    it, first purchase strictly after that — with the end-to-end
    elapsed time. q_funnel_conversion counts stage membership; this
    emits the matched PATH, the semantics a product-analytics
    MATCH_RECOGNIZE query or an eventstream funnel engine implements.
    Greedy earliest-match is the deterministic canonical choice.

    Plan: three STACKED conditional-min windows over ONE user_id
    shuffle (each projection feeds the next; Catalyst plans a single
    Exchange and three Window nodes over the same partitioning — the
    q_funnel_conversion precedent), then the per-user rollup reuses the
    same partitioning. Timestamps compare at microsecond precision on
    both engines; no self-joins, no per-stage rescans of the events
    table."""
    t = load(spark, sf_dir)
    wu = Window.partitionBy("user_id")
    us = F.unix_micros(F.col("ts"))
    e = t.events.select("user_id", "event_type", us.alias("us"))
    s1 = e.withColumn(
        "v1",
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(wu),
    )
    s2 = s1.withColumn(
        "c1",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("us") > F.col("v1")),
                F.col("us"),
            )
        ).over(wu),
    )
    s3 = s2.withColumn(
        "p1",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("us") > F.col("c1")),
                F.col("us"),
            )
        ).over(wu),
    )
    return s3.groupBy("user_id").agg(
        F.min("v1").alias("view_us"),
        F.min("c1").alias("click_us"),
        F.min("p1").alias("purchase_us"),
        F.min("p1").isNotNull().alias("completed"),
        (F.min("p1") - F.min("v1")).alias("elapsed_us"),
    )


_SEQ_RULES_ORACLE = """
    WITH nxt AS (
      SELECT o_custkey, o_orderkey,
             lead(o_orderkey) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey)
               AS next_orderkey
      FROM orders
    ),
    ob AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    pair_orders AS (
      SELECT o_orderkey, next_orderkey FROM nxt
      WHERE next_orderkey IS NOT NULL
    ),
    rules AS (
      SELECT a.p_brand AS brand_then, b.p_brand AS brand_next,
             COUNT(*) AS n_pairs
      FROM pair_orders po
      JOIN ob a ON a.l_orderkey = po.o_orderkey
      JOIN ob b ON b.l_orderkey = po.next_orderkey
      GROUP BY a.p_brand, b.p_brand
    ),
    lhs AS (
      SELECT a.p_brand AS brand_then, COUNT(*) AS n_lhs
      FROM pair_orders po JOIN ob a ON a.l_orderkey = po.o_orderkey
      GROUP BY a.p_brand
    )
    SELECT r.brand_then, r.brand_next,
           CAST(r.n_pairs AS BIGINT) AS n_pairs,
           ROUND(r.n_pairs / CAST(l.n_lhs AS DOUBLE), 4) AS confidence
    FROM rules r JOIN lhs l USING (brand_then)
    WHERE r.n_pairs >= 5
"""


@register("q_basket_sequence_rules", oracle=_SEQ_RULES_ORACLE)
def q_basket_sequence_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENTIAL association rules over consecutive orders: "customers
    who bought brand A last time buy brand B next time" with
    confidence = P(B in next | A in current) — the temporal upgrade of
    q_market_basket's same-basket affinity (the counting core of a
    GSP/PrefixSpan sequence-mining run restricted to length-2 patterns,
    which is what product recommendation actually deploys first).

    Scale shape, all linear: consecutive order pairs come from ONE lead
    window per customer (n_orders - 1 pairs, never a per-customer cross
    join); order -> distinct brand sets ride a broadcast part join; the
    rule join fans out |brands(o1)| x |brands(o2)| per pair — bounded
    by basket width, the q_market_basket cap argument; rule and LHS
    counts are map-side-combinable aggregates over the BRAND-pair
    domain (<= |brands|^2 rows at any corpus size). Support floor 5
    keeps the emitted rule table denoised and deterministic."""
    t = load(spark, sf_dir)
    nxt = t.orders.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_orderkey")
        .over(
            Window.partitionBy("o_custkey").orderBy(
                "o_orderdate", "o_orderkey"
            )
        )
        .alias("next_orderkey"),
    ).where(F.col("next_orderkey").isNotNull())
    ob = (
        t.lineitem.join(
            # part scales with SF: no hard broadcast hint — AQE
            # broadcasts it while small, shuffles it at cluster scale
            t.part.select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = ob.select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("p_brand").alias("brand_then"),
    )
    b = ob.select(
        F.col("l_orderkey").alias("next_orderkey"),
        F.col("p_brand").alias("brand_next"),
    )
    pairs = nxt.join(a, "o_orderkey").join(b, "next_orderkey")
    rules = pairs.groupBy("brand_then", "brand_next").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    lhs = nxt.join(a, "o_orderkey").groupBy("brand_then").agg(
        F.count(F.lit(1)).alias("n_lhs")
    )
    return (
        rules.join(lhs, "brand_then")
        .where(F.col("n_pairs") >= 5)
        .select(
            "brand_then",
            "brand_next",
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            F.round(
                F.col("n_pairs") / F.col("n_lhs").cast("double"), 4
            ).alias("confidence"),
        )
    )


_STICKINESS_ORACLE = """
    WITH du AS (
      SELECT DISTINCT strftime(ts, '%Y-%m') AS month,
             strftime(ts, '%Y-%m-%d') AS day, user_id
      FROM events
    ),
    daily AS (
      SELECT month,
             COUNT(*) AS dau_sum,
             COUNT(DISTINCT day) AS n_days
      FROM du GROUP BY month
    ),
    monthly AS (
      SELECT month, COUNT(DISTINCT user_id) AS mau FROM du GROUP BY month
    )
    SELECT d.month,
           CAST(d.n_days AS BIGINT) AS n_days,
           ROUND(d.dau_sum / CAST(d.n_days AS DOUBLE), 4) AS avg_dau,
           CAST(m.mau AS BIGINT) AS mau,
           ROUND(d.dau_sum / CAST(d.n_days AS DOUBLE) / m.mau, 4)
             AS stickiness
    FROM daily d JOIN monthly m USING (month)
"""


@register("q_stickiness_dau_mau", oracle=_STICKINESS_ORACLE)
def q_stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month — the product-health ratio ("what
    fraction of the month's users show up on an average day"): mean
    daily active users over monthly active users. 1.0 = everyone daily,
    1/days = everyone exactly once; the single most-watched engagement
    ratio next to retention (q_retention_cohorts gives the cohort view,
    this the calendar view).

    Scale shape: ONE distinct aggregate reduces events to (month, day,
    user) visit rows (map-side combinable); both the daily sum and the
    MAU re-aggregate that frame, joined back on the tiny month domain.
    Determinism: ratios are single divisions of exact integers computed
    identically in both engines, rounded for display."""
    t = load(spark, sf_dir)
    du = t.events.select(
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "user_id",
    ).distinct()
    daily = du.groupBy("month").agg(
        F.count(F.lit(1)).alias("dau_sum"),
        F.countDistinct("day").alias("n_days"),
    )
    monthly = du.groupBy("month").agg(F.countDistinct("user_id").alias("mau"))
    avg_dau = F.col("dau_sum") / F.col("n_days").cast("double")
    return daily.join(monthly, "month").select(
        "month",
        F.col("n_days").cast("bigint").alias("n_days"),
        F.round(avg_dau, 4).alias("avg_dau"),
        F.col("mau").cast("bigint").alias("mau"),
        F.round(avg_dau / F.col("mau"), 4).alias("stickiness"),
    )


_DECILES_ORACLE = """
    WITH rev AS (
      SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS revenue
      FROM orders GROUP BY o_custkey
    ),
    cuts AS (
      SELECT [quantile_cont(revenue, 0.1), quantile_cont(revenue, 0.2),
              quantile_cont(revenue, 0.3), quantile_cont(revenue, 0.4),
              quantile_cont(revenue, 0.5), quantile_cont(revenue, 0.6),
              quantile_cont(revenue, 0.7), quantile_cont(revenue, 0.8),
              quantile_cont(revenue, 0.9)] AS qs
      FROM rev
    ),
    assigned AS (
      SELECT r.revenue,
             1 + len(list_filter(c.qs, q -> r.revenue > q)) AS decile
      FROM rev r, cuts c
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(revenue), 2) AS revenue,
           ROUND(SUM(SUM(revenue)) OVER (ORDER BY decile
                                         ROWS UNBOUNDED PRECEDING)
                 / SUM(SUM(revenue)) OVER (), 6) AS cum_revenue_share
    FROM assigned GROUP BY decile
"""


@register("q_revenue_deciles", oracle=_DECILES_ORACLE)
def q_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue deciles with cumulative share — the Lorenz
    curve as a table ("the top decile carries X% of revenue"), the
    concentration view finance actually reads next to agg_gini's one
    number; decile 10 holds the biggest spenders.

    Scale shape: customers reduce to one revenue row each (combinable),
    the 9 exact-percentile cuts are ONE 1-row frame broadcast back
    (approx_percentile at 100 TB — the agg_winsorized_mean note), and
    decile assignment is 9 comparisons, NOT a global ntile sort — the
    difference between a distributable plan and a single-task one. The
    report aggregates onto the 10-row decile domain; the cumulative
    share is a window over that bounded frame. Determinism: revenue on
    the 2-dp lattice; percentile interpolation bit-identical
    (text_length_trim precedent); shares divide lattice sums."""
    t = load(spark, sf_dir)
    rev = t.orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    cuts = rev.agg(
        F.array(
            *[
                F.percentile("revenue", F.lit(x / 10.0)).alias(f"q{x}")
                for x in range(1, 10)
            ]
        ).alias("qs")
    )
    assigned = rev.crossJoin(F.broadcast(cuts)).select(
        "revenue",
        (
            1
            + F.size(
                F.filter(F.col("qs"), lambda q: F.col("revenue") > q)
            )
        ).cast("bigint").alias("decile"),
    )
    g = assigned.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(F.sum("revenue"), 2).alias("revenue"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    return g.select(
        "decile",
        "n_customers",
        "revenue",
        F.round(
            F.sum("revenue").over(w_cum) / F.sum("revenue").over(w_all), 6
        ).alias("cum_revenue_share"),
    )


_REPURCHASE_ORACLE = """
    WITH gaps AS (
      SELECT c.c_mktsegment AS segment,
             date_diff('day',
                       lag(o.o_orderdate) OVER (PARTITION BY o.o_custkey
                                                ORDER BY o.o_orderdate,
                                                         o.o_orderkey),
                       o.o_orderdate) AS gap_days
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT segment,
           CAST(COUNT(gap_days) AS BIGINT) AS n_gaps,
           ROUND(quantile_cont(gap_days, 0.25), 2) AS p25_days,
           ROUND(quantile_cont(gap_days, 0.50), 2) AS median_days,
           ROUND(quantile_cont(gap_days, 0.75), 2) AS p75_days,
           ROUND(AVG(gap_days), 4) AS mean_days
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY segment
"""


@register("q_repurchase_interval", oracle=_REPURCHASE_ORACLE)
def q_repurchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repurchase-interval distribution per market segment: day gaps
    between each customer's consecutive orders, summarized as
    p25/median/p75/mean — the metric that sets reorder-reminder timing,
    churn-risk cutoffs ("3x the median gap = at risk"), and inventory
    cadence; the calendar-free companion to q_retention_cohorts.

    Scale shape: one custkey window computes the gaps (orders are
    already the fact stream; the customer dim broadcasts for the
    segment label), then one aggregate per segment — exact percentiles
    over the segment-DOMAIN-bounded grouping (approx_percentile at
    100 TB, the q_rfm_segmentation note). Determinism: day gaps are
    exact integers (date arithmetic), percentile interpolation
    bit-identical, mean = one division of exact ints."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        t.orders.join(
            # customer scales with SF: no hard broadcast hint (AQE decides)
            t.customer.select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_mktsegment").alias("segment"),
            ),
            "o_custkey",
        )
        .select(
            "segment",
            F.datediff(
                "o_orderdate", F.lag("o_orderdate").over(w)
            ).alias("gap_days"),
        )
        .where(F.col("gap_days").isNotNull())
    )
    return gaps.groupBy("segment").agg(
        F.count("gap_days").cast("bigint").alias("n_gaps"),
        F.round(F.percentile("gap_days", F.lit(0.25)), 2).alias("p25_days"),
        F.round(F.percentile("gap_days", F.lit(0.50)), 2).alias("median_days"),
        F.round(F.percentile("gap_days", F.lit(0.75)), 2).alias("p75_days"),
        F.round(F.avg("gap_days"), 4).alias("mean_days"),
    )


_COHORT_LTV_ORACLE = """
    WITH firsts AS (
      SELECT user_id, MIN(strftime(ts, '%Y-%m')) AS cohort
      FROM events GROUP BY user_id
    ),
    spend AS (
      SELECT f.cohort,
             (CAST(substr(strftime(e.ts, '%Y-%m'), 1, 4) AS INTEGER) * 12
              + CAST(substr(strftime(e.ts, '%Y-%m'), 6, 2) AS INTEGER))
             - (CAST(substr(f.cohort, 1, 4) AS INTEGER) * 12
                + CAST(substr(f.cohort, 6, 2) AS INTEGER)) AS age_months,
             CAST(ROUND(e.value * 100) AS BIGINT) AS vc
      FROM events e JOIN firsts f USING (user_id)
      WHERE e.event_type = 'purchase'
    ),
    sizes AS (SELECT cohort, COUNT(*) AS n_users FROM firsts GROUP BY cohort),
    cells AS (
      SELECT cohort, age_months, SUM(vc) AS rev_c
      FROM spend GROUP BY cohort, age_months
    )
    SELECT c.cohort, CAST(c.age_months AS BIGINT) AS age_months,
           CAST(s.n_users AS BIGINT) AS cohort_users,
           ROUND(c.rev_c / 100.0, 2) AS revenue,
           ROUND(SUM(c.rev_c) OVER (PARTITION BY c.cohort ORDER BY c.age_months
                                    ROWS UNBOUNDED PRECEDING)
                 / 100.0 / s.n_users, 4) AS cum_ltv_per_user
    FROM cells c JOIN sizes s USING (cohort)
"""


@register("q_cohort_ltv", oracle=_COHORT_LTV_ORACLE)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users grouped by first-seen month,
    purchase revenue accumulated by cohort AGE (months since joining),
    reported as cumulative LTV per cohort user — the table a growth
    team reads to see whether newer cohorts monetize faster, and the
    payback-period input for acquisition spend; the revenue-weighted
    sibling of q_retention_cohorts' presence counts.

    Scale shape: one user_id aggregate pins each user's cohort; the
    broadcast-joinable cohort frame rides back onto the purchase scan;
    everything then reduces onto the (cohort x age) DOMAIN, with the
    cumulative LTV a window over that bounded frame. Determinism:
    month arithmetic is exact integers, revenue sums are exact integer
    CENTS (order-free), per-user division identical both engines."""
    t = load(spark, sf_dir)
    month = F.date_format("ts", "yyyy-MM")
    firsts = t.events.groupBy("user_id").agg(F.min(month).alias("cohort"))
    mnum = lambda c: (  # noqa: E731
        F.substring(c, 1, 4).cast("int") * 12 + F.substring(c, 6, 2).cast("int")
    )
    spend = (
        t.events.where(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            "cohort",
            (mnum(month) - mnum(F.col("cohort"))).alias("age_months"),
            F.round(F.col("value") * 100).cast("bigint").alias("vc"),
        )
    )
    sizes = firsts.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_users"))
    cells = spend.groupBy("cohort", "age_months").agg(
        F.sum("vc").alias("rev_c")
    )
    w_cum = (
        Window.partitionBy("cohort")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return cells.join(F.broadcast(sizes), "cohort").select(
        "cohort",
        F.col("age_months").cast("bigint").alias("age_months"),
        F.col("n_users").cast("bigint").alias("cohort_users"),
        F.round(F.col("rev_c") / 100.0, 2).alias("revenue"),
        F.round(
            F.sum("rev_c").over(w_cum) / 100.0 / F.col("n_users"), 4
        ).alias("cum_ltv_per_user"),
    )


_GROWTH_ORACLE = """
    WITH um AS (
      SELECT DISTINCT user_id, strftime(ts, '%Y-%m') AS month FROM events
    ),
    flagged AS (
      SELECT user_id, month,
             month = MIN(month) OVER (PARTITION BY user_id) AS is_new,
             lag(month) OVER (PARTITION BY user_id ORDER BY month)
               AS prev_month,
             (CAST(substr(month, 1, 4) AS INTEGER) * 12
              + CAST(substr(month, 6, 2) AS INTEGER)) AS mnum
      FROM um
    ),
    states AS (
      SELECT month,
             CASE WHEN is_new THEN 'new'
                  WHEN (CAST(substr(prev_month, 1, 4) AS INTEGER) * 12
                        + CAST(substr(prev_month, 6, 2) AS INTEGER))
                       = mnum - 1 THEN 'retained'
                  ELSE 'resurrected' END AS state
      FROM flagged
    )
    SELECT month, state, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM states GROUP BY month, state
"""


@register("q_growth_accounting", oracle=_GROWTH_ORACLE)
def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly growth accounting: every active user classified as NEW
    (first month ever), RETAINED (also active the month before), or
    RESURRECTED (returning after a gap) — the standard MAU
    decomposition (churn is the prior month's actives missing from the
    current, derivable as prev_MAU - retained) that tells a growth team
    whether MAU grows from acquisition or from retention; the
    month-over-month flow view beside q_retention_cohorts' triangle
    and q_stickiness_dau_mau's intensity ratio.

    Scale shape: ONE distinct aggregate to (user, month) visit rows,
    then per-user min/lag windows on a second user_id shuffle and a
    combinable count onto the (month x state) domain. Determinism:
    month strings and integer month numbers are exact; no floats at
    all."""
    t = load(spark, sf_dir)
    um = t.events.select(
        "user_id", F.date_format("ts", "yyyy-MM").alias("month")
    ).distinct()
    wu = Window.partitionBy("user_id")
    wl = Window.partitionBy("user_id").orderBy("month")
    mnum = lambda c: (  # noqa: E731
        F.substring(c, 1, 4).cast("int") * 12 + F.substring(c, 6, 2).cast("int")
    )
    flagged = um.select(
        "month",
        (F.col("month") == F.min("month").over(wu)).alias("is_new"),
        F.lag("month").over(wl).alias("prev_month"),
        mnum(F.col("month")).alias("mn"),
    )
    state = (
        F.when(F.col("is_new"), "new")
        .when(mnum(F.col("prev_month")) == F.col("mn") - 1, "retained")
        .otherwise("resurrected")
    )
    return (
        flagged.select("month", state.alias("state"))
        .groupBy("month", "state")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


_ELASTICITY_ORACLE = """
    WITH pts AS (
      SELECT p.p_brand,
             CAST(ROUND(ln(l.l_extendedprice / l.l_quantity) * 10000)
                  AS BIGINT) AS lx,
             CAST(ROUND(ln(CAST(l.l_quantity AS DOUBLE)) * 10000)
                  AS BIGINT) AS ly
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
    ),
    s AS (
      SELECT p_brand, COUNT(*) AS n,
             CAST(SUM(lx) AS DOUBLE) AS sx, CAST(SUM(ly) AS DOUBLE) AS sy,
             CAST(SUM(lx * ly) AS DOUBLE) AS sxy,
             CAST(SUM(lx * lx) AS DOUBLE) AS sxx
      FROM pts GROUP BY p_brand
    )
    SELECT p_brand, CAST(n AS BIGINT) AS n,
           floor((sxy / n - (sx / n) * (sy / n))
                 / (sxx / n - (sx / n) * (sx / n)) * 10000) / 10000
             AS elasticity,
           (sxy / n - (sx / n) * (sy / n))
             / (sxx / n - (sx / n) * (sx / n)) < -0.5 AS is_elastic
    FROM s
"""


@register("q_price_elasticity", oracle=_ELASTICITY_ORACLE)
def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand per brand: the OLS slope of
    ln(quantity) on ln(unit price) over line items — the classic
    econometric read ("a 1% price increase moves quantity by
    elasticity %"), with the is_elastic flag at the conventional -0.5
    screen. The agg_regr machinery pointed at the question pricing
    teams actually ask of 100 TB of order history.

    Scale/determinism: unit-price and quantity logs run on identical
    doubles (agg_mutual_info precedent) and quantize to integer
    1e-4-units, so the per-brand sufficient statistics are EXACT
    integer sums (order-independent; the means-form slope keeps every
    product below 2^53 — the agg_autocorr overflow note); one
    combinable aggregate on the brand domain; slope floor-scaled,
    verdict on the unfloored value in both engines."""
    t = load(spark, sf_dir)
    pts = (
        t.lineitem.where(
            (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
        )
        .join(
            # part scales with SF: no hard broadcast hint (AQE decides)
            t.part.select(
                F.col("p_partkey").alias("l_partkey"), "p_brand"
            ),
            "l_partkey",
        )
        .select(
            "p_brand",
            F.round(
                F.log(F.col("l_extendedprice") / F.col("l_quantity")) * 10_000
            )
            .cast("bigint")
            .alias("lx"),
            F.round(F.log(F.col("l_quantity").cast("double")) * 10_000)
            .cast("bigint")
            .alias("ly"),
        )
    )
    s = pts.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    mx, my = F.col("sx") / n, F.col("sy") / n
    slope = (F.col("sxy") / n - mx * my) / (F.col("sxx") / n - mx * mx)
    return s.select(
        "p_brand",
        F.col("n").cast("bigint").alias("n"),
        (F.floor(slope * 10_000) / 10_000).alias("elasticity"),
        (slope < -0.5).alias("is_elastic"),
    )


_ABC_ORACLE = """
    WITH rev AS (
      SELECT p.p_brand, ROUND(SUM(l.l_extendedprice), 2) AS revenue
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand
    ),
    ranked AS (
      SELECT p_brand, revenue,
             SUM(revenue) OVER (ORDER BY revenue DESC, p_brand
                                ROWS UNBOUNDED PRECEDING)
               / SUM(revenue) OVER () AS cum_share,
             revenue / SUM(revenue) OVER () AS share
      FROM rev
    )
    SELECT p_brand, revenue,
           ROUND(cum_share, 6) AS cum_share,
           CASE WHEN cum_share - share < 0.5 THEN 'A'
                WHEN cum_share - share < 0.8 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
"""


@register("q_abc_classification", oracle=_ABC_ORACLE)
def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification by brand: brands ranked by revenue,
    class A = the head carrying the first 50% of cumulative revenue
    (the brand that CROSSES a boundary stays in the head class),
    B = to 80%, C = the long tail — the Pareto working-capital
    segmentation operations teams run before setting stocking policy
    (A items get tight control, C items get bulk rules); the
    named-class cousin of q_revenue_deciles' neutral bands.

    Scale shape: facts reduce to ONE revenue row per brand (combinable,
    part dim broadcast), so the ranking window runs over the BRAND
    CATALOG domain — bounded by the product catalog, never by order
    volume, which is what keeps the global cumulative sort legitimate
    at 100 TB (SINGLE_PARTITION_OK: catalog-scale frame). Determinism:
    revenue on the 2-dp lattice; ties rank by brand; cumulative shares
    are identical divisions of lattice sums."""
    t = load(spark, sf_dir)
    rev = (
        t.lineitem.join(
            # part scales with SF: no hard broadcast hint (AQE decides)
            t.part.select(F.col("p_partkey").alias("l_partkey"), "p_brand"),
            "l_partkey",
        )
        .groupBy("p_brand")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
    )
    w_cum = Window.orderBy(F.col("revenue").desc(), "p_brand").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    total = F.sum("revenue").over(w_all)
    cum = F.sum("revenue").over(w_cum) / total
    prev = cum - F.col("revenue") / total
    return rev.select(
        "p_brand",
        "revenue",
        F.round(cum, 6).alias("cum_share"),
        F.when(prev < 0.5, "A").when(prev < 0.8, "B").otherwise("C").alias(
            "abc_class"
        ),
    )


_STREAKS_ORACLE = """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    islands AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INTEGER)
               AS grp
      FROM days
    ),
    runs AS (
      SELECT user_id, COUNT(*) AS len,
             MIN(day) AS streak_start, MAX(day) AS streak_end
      FROM islands GROUP BY user_id, grp
    ),
    best AS (
      SELECT user_id, len, streak_start, streak_end,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY len DESC, streak_start) AS rk,
             COUNT(*) OVER (PARTITION BY user_id) AS n_streaks
      FROM runs
    )
    SELECT user_id,
           CAST(len AS BIGINT) AS longest_streak_days,
           strftime(streak_start, '%Y-%m-%d') AS streak_start,
           strftime(streak_end, '%Y-%m-%d') AS streak_end,
           CAST(n_streaks AS BIGINT) AS n_streaks
    FROM best WHERE rk = 1
"""


@register("q_activity_streaks", oracle=_STREAKS_ORACLE)
def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the classic
    GAPS-AND-ISLANDS pattern (day minus dense row position is constant
    within a run of consecutive days, so the difference IS the island
    key), the engagement metric behind every streak badge and the
    canonical interview-question shape the engine should express
    natively. Emits each user's longest run, its span, and how many
    separate runs they have (earliest run wins length ties).

    Scale shape: ONE distinct aggregate to (user, day) rows, then two
    windows on the same user_id shuffle — the island trick needs no
    self-join and no iteration. Determinism: pure integer date
    arithmetic; ties break on streak_start."""
    t = load(spark, sf_dir)
    days = t.events.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.select(
        "user_id",
        "day",
        F.date_sub("day", F.row_number().over(w)).alias("grp"),
    )
    runs = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("day").alias("streak_start"),
        F.max("day").alias("streak_end"),
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), "streak_start"
    )
    wu = Window.partitionBy("user_id")
    return (
        runs.select(
            "user_id",
            "len",
            "streak_start",
            "streak_end",
            F.row_number().over(wb).alias("rk"),
            F.count(F.lit(1)).over(wu).alias("n_streaks"),
        )
        .where(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("len").cast("bigint").alias("longest_streak_days"),
            F.date_format("streak_start", "yyyy-MM-dd").alias("streak_start"),
            F.date_format("streak_end", "yyyy-MM-dd").alias("streak_end"),
            F.col("n_streaks").cast("bigint").alias("n_streaks"),
        )
    )


_FULL_STAR_ORACLE = f"""
    SELECT r.r_name AS region,
           p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS n_suppliers,
           CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY r.r_name, p.p_brand
"""


@register("q_full_star_rollup", oracle=_FULL_STAR_ORACLE)
def q_full_star_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full-star stress query: every table in the schema joined in
    one plan (region -> nation -> customer -> orders -> lineitem ->
    part -> supplier), rolled up to revenue and distinct-entity counts
    per (region, brand) — the widest join breadth any report here
    exercises, and the plan-shape exhibit for Catalyst's join layering.
    Broadcast policy: only the CONSTANT-cardinality dims (region=5,
    nation=25 rows at every SF) carry a hard F.broadcast hint.
    customer/part/supplier GROW LINEARLY with SF — at a genuine 100 TB
    they are tens of GB and a hard hint (which Spark obeys regardless
    of size) would OOM every executor — so those joins are left to AQE,
    which broadcasts them while they fit under
    spark.sql.autoBroadcastJoinThreshold and falls back to shuffle hash
    / sort-merge beyond it. At fixture scale AQE picks broadcast for
    all three, so the executed plan is identical to the old hinted one;
    at cluster scale the plan degrades gracefully instead of failing.
    Distinct counts ride the same two-phase machinery as
    profile_fd_audit.

    Determinism: money on the 2-dp lattice, counts exact."""
    t = load(spark, sf_dir)
    df = (
        t.lineitem.join(
            t.orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            # SF-scaling dim: no hard hint — AQE broadcasts while small
            t.customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t.nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t.region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(
            # SF-scaling dim: no hard hint — AQE broadcasts while small
            t.part.select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            # SF-scaling dim: no hard hint — AQE broadcasts while small
            t.supplier.select("s_suppkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
    )
    # r15 (the agg_approx_distinct_bound recipe, guide §2.3): TWO
    # countDistinct columns in one aggregate force an Expand x3 of the
    # whole joined fact through the hash aggregate (every row
    # replicated once per distinct column plus once for the plain
    # aggregates). Splitting into three aggregations over ONE
    # checkpointed projection of the star join — each a plain
    # two-phase (partial + final) aggregate, no Expand — and joining
    # the 125-row results is value-identical (verified row-for-row)
    # and measured 8.4 -> 4.7 s at sf0.1. The checkpoint materializes
    # the join once for its three consumers (intra-query; the
    # dedup-consensus persist precedent).
    base = df.select(
        F.col("r_name").alias("region"),
        "p_brand",
        "c_custkey",
        "s_suppkey",
        _revenue_d().alias("rev"),
    ).localCheckpoint()
    main = base.groupBy("region", "p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        # DECIMAL revenue (_revenue_d convention) — the r10 sf0.001
        # sweep caught the raw-double sum landing on a half-cent
        # rounding tie (partition-order float fold, the one q_ op that
        # had missed the convention)
        F.round(F.sum("rev"), 2).cast("double").alias("revenue"),
    )
    cust = base.groupBy("region", "p_brand").agg(
        F.countDistinct("c_custkey").cast("bigint").alias("n_customers")
    )
    supp = base.groupBy("region", "p_brand").agg(
        F.countDistinct("s_suppkey").cast("bigint").alias("n_suppliers")
    )
    return (
        main.join(cust, ["region", "p_brand"])
        .join(supp, ["region", "p_brand"])
        .select(
            "region",
            "p_brand",
            "n_lines",
            "n_customers",
            "n_suppliers",
            "revenue",
        )
    )


_SEASONAL_HEATMAP_ORACLE = """
    WITH cells AS (
      SELECT CAST(month(o_orderdate) AS BIGINT) AS month,
             CAST(isodow(o_orderdate) AS BIGINT) AS dow,
             COUNT(*) AS n_orders,
             CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1, 2
    ),
    m AS (
      SELECT month, dow, n_orders, rev_cents,
             SUM(n_orders) OVER (PARTITION BY month) AS mt,
             SUM(n_orders) OVER (PARTITION BY dow) AS dt,
             SUM(n_orders) OVER () AS n
      FROM cells
    )
    SELECT month, dow,
           CAST(n_orders AS BIGINT) AS n_orders,
           ROUND(rev_cents / 100.0, 2) AS revenue,
           ROUND(n_orders / CAST(n AS DOUBLE), 6) AS share,
           ROUND(n_orders * CAST(n AS DOUBLE) / (mt * CAST(dt AS DOUBLE)), 4)
             AS lift
    FROM m
"""


@register("q_seasonal_order_heatmap", oracle=_SEASONAL_HEATMAP_ORACLE)
def q_seasonal_order_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-seasonality heatmap: the (month x ISO weekday) grid of
    order counts and revenue, each cell's corpus share, and its LIFT
    against the independence expectation (row_total * col_total / N —
    the chi-squared expected-cell machinery re-emitted as a planning
    surface instead of a test statistic): lift > 1 = that weekday
    over-indexes in that month. The staffing/inventory calendar view
    every ops dashboard ships; agg_seasonal_strength says IF there is
    seasonality, this says WHERE it lives.

    Scale shape: facts reduce to the <= 84-cell (month x dow) DOMAIN
    frame in one combinable aggregate; share/lift are windows over
    that frame. Money on the cents lattice; counts exact; lift one
    identical division."""
    t = load(spark, sf_dir)
    cells = t.orders.groupBy(
        F.month("o_orderdate").cast("bigint").alias("month"),
        # ISO weekday 1=Mon..7=Sun: Spark weekday() is 0=Mon..6=Sun,
        # matching DuckDB isodow() after the +1
        (F.expr("weekday(o_orderdate)") + 1).cast("bigint").alias("dow"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice") * 100).cast("bigint").alias("rev_cents"),
    )
    w_m = Window.partitionBy("month")
    w_d = Window.partitionBy("dow")
    w_all = Window.partitionBy()
    m = cells.select(
        "month",
        "dow",
        "n_orders",
        "rev_cents",
        F.sum("n_orders").over(w_m).alias("mt"),
        F.sum("n_orders").over(w_d).alias("dt"),
        F.sum("n_orders").over(w_all).alias("n"),
    )
    return m.select(
        "month",
        "dow",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.round(F.col("rev_cents") / 100.0, 2).alias("revenue"),
        F.round(F.col("n_orders") / F.col("n").cast("double"), 6).alias(
            "share"
        ),
        F.round(
            F.col("n_orders")
            * F.col("n").cast("double")
            / (F.col("mt") * F.col("dt").cast("double")),
            4,
        ).alias("lift"),
    )


#: Spend-band migration: customers band by FIXED yearly-spend edges
#: (cents), so the band definition is engine-portable and stable
#: across years (quartile cuts would re-derive per year and muddy the
#: migration signal with cut drift).
BAND_EDGES_CENTS = (10_000_00, 20_000_00, 40_000_00)

_BAND_MIGRATION_ORACLE = f"""
    WITH yearly AS (
      SELECT o_custkey, year(o_orderdate) AS yr,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1, 2
    ),
    banded AS (
      SELECT o_custkey, yr,
             CASE WHEN cents < {BAND_EDGES_CENTS[0]} THEN 'B1_low'
                  WHEN cents < {BAND_EDGES_CENTS[1]} THEN 'B2_mid'
                  WHEN cents < {BAND_EDGES_CENTS[2]} THEN 'B3_high'
                  ELSE 'B4_top' END AS band
      FROM yearly
    ),
    flows AS (
      SELECT a.band AS band_from, b.band AS band_to, COUNT(*) AS n
      FROM banded a
      JOIN banded b ON b.o_custkey = a.o_custkey AND b.yr = a.yr + 1
      GROUP BY 1, 2
    )
    SELECT band_from, band_to,
           CAST(n AS BIGINT) AS n_customers,
           ROUND(n / CAST(SUM(n) OVER (PARTITION BY band_from) AS DOUBLE), 6)
             AS transition_share
    FROM flows
"""


@register("q_customer_band_migration", oracle=_BAND_MIGRATION_ORACLE)
def q_customer_band_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year spend-band migration matrix: customers band by
    fixed yearly-spend edges, consecutive years join per customer, and
    each (from, to) cell carries the count and row-normalized
    transition share — the customer-value Markov matrix behind
    upgrade/downgrade forecasting (q_growth_accounting counts
    new/churned/retained; this says where the RETAINED went). Fixed
    edges, not per-year quantiles, so migration is real movement and
    not cut drift.

    Scale/determinism: facts reduce to one (customer, year) cents row
    (combinable), the year+1 self-join runs on the customer-year frame
    (orders-bounded, never line items), and shares are windows over
    the <=16-cell band-pair domain. Exact integers end to end."""
    t = load(spark, sf_dir)
    yearly = t.orders.groupBy(
        "o_custkey", F.year("o_orderdate").alias("yr")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        )
    )
    band = (
        F.when(F.col("cents") < BAND_EDGES_CENTS[0], "B1_low")
        .when(F.col("cents") < BAND_EDGES_CENTS[1], "B2_mid")
        .when(F.col("cents") < BAND_EDGES_CENTS[2], "B3_high")
        .otherwise("B4_top")
    )
    banded = yearly.select("o_custkey", "yr", band.alias("band"))
    flows = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("b.o_custkey") == F.col("a.o_custkey"))
            & (F.col("b.yr") == F.col("a.yr") + 1),
        )
        .groupBy(
            F.col("a.band").alias("band_from"),
            F.col("b.band").alias("band_to"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("band_from")
    return flows.select(
        "band_from",
        "band_to",
        F.col("n").cast("bigint").alias("n_customers"),
        F.round(F.col("n") / F.sum("n").over(w).cast("double"), 6).alias(
            "transition_share"
        ),
    )


_LEAD_TIME_ORACLE = """
    WITH lag AS (
      SELECT l.l_suppkey,
             datediff('day', o.o_orderdate, l.l_shipdate) AS lead_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    , dom AS (
      SELECT l_suppkey, lead_days, COUNT(*) AS c
      FROM lag GROUP BY l_suppkey, lead_days
    ),
    cum AS (
      SELECT l_suppkey, lead_days, c,
             SUM(c) OVER (PARTITION BY l_suppkey ORDER BY lead_days) AS cum_c,
             SUM(c) OVER (PARTITION BY l_suppkey) AS n
      FROM dom
    )
    SELECT CAST(l_suppkey AS BIGINT) AS l_suppkey,
           CAST(MAX(n) AS BIGINT) AS n_lines,
           CAST(MIN(CASE WHEN cum_c >= ceil(0.5 * n) THEN lead_days END)
                AS BIGINT) AS p50_days,
           CAST(MIN(CASE WHEN cum_c >= ceil(0.95 * n) THEN lead_days END)
                AS BIGINT) AS p95_days,
           CAST(MAX(lead_days) AS BIGINT) AS max_days,
           ROUND(SUM(CASE WHEN lead_days > 90 THEN c ELSE 0 END)
                 / CAST(MAX(n) AS DOUBLE), 6) AS late_share
    FROM cum GROUP BY l_suppkey
"""


@register("q_supplier_lead_time", oracle=_LEAD_TIME_ORACLE)
def q_supplier_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier lead-time scorecard: order-to-ship day percentiles
    (p50/p95), worst case, and the >90-day late share per supplier —
    the delivery-performance half of the vendor scorecard beside
    q_supplier_wilson_score's quality half (a supplier can ship clean
    goods slowly; procurement needs both axes). q_fulfillment_latency
    profiles the same lag by PRIORITY class; this is the accountable-
    party grain.

    Scale/determinism: the join reduces to integer day lags keyed by
    supplier; exact percentiles run per supplier over day-DOMAIN-
    bounded groups (approx_percentile at 100 TB, the q_rfm note);
    counts/shares exact."""
    t = load(spark, sf_dir)
    lag = t.lineitem.select("l_suppkey", "l_orderkey", "l_shipdate").join(
        t.orders.select("o_orderkey", "o_orderdate"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    ).select(
        "l_suppkey",
        F.datediff("l_shipdate", "o_orderdate").alias("lead_days"),
    )
    # DISCRETE order-statistic percentiles (value at rank ceil(p*n))
    # via the per-supplier day-DOMAIN cumulative frame — interpolated
    # percentiles put an ulp-sensitive fraction under a 1-dp round,
    # which flipped a boundary row cross-engine in testing; rank
    # lookups are exact integers (the agg_median_ci machinery).
    dom = lag.groupBy("l_suppkey", "lead_days").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = Window.partitionBy("l_suppkey").orderBy("lead_days")
    w_all = Window.partitionBy("l_suppkey")
    cum = dom.select(
        "l_suppkey",
        "lead_days",
        "c",
        F.sum("c").over(w_cum).alias("cum_c"),
        F.sum("c").over(w_all).alias("n"),
    )
    return cum.groupBy("l_suppkey").agg(
        F.max("n").cast("bigint").alias("n_lines"),
        F.min(
            F.when(
                F.col("cum_c") >= F.ceil(0.5 * F.col("n")), F.col("lead_days")
            )
        ).cast("bigint").alias("p50_days"),
        F.min(
            F.when(
                F.col("cum_c") >= F.ceil(0.95 * F.col("n")),
                F.col("lead_days"),
            )
        ).cast("bigint").alias("p95_days"),
        F.max("lead_days").cast("bigint").alias("max_days"),
        F.round(
            F.sum(F.when(F.col("lead_days") > 90, F.col("c")).otherwise(0))
            / F.max("n").cast("double"),
            6,
        ).alias("late_share"),
    ).select(
        F.col("l_suppkey").cast("bigint").alias("l_suppkey"),
        "n_lines",
        "p50_days",
        "p95_days",
        "max_days",
        "late_share",
    )


_TIME_TO_CONVERT_ORACLE = """
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               AS first_purchase
      FROM events GROUP BY user_id
    ),
    conv AS (
      SELECT user_id,
             CAST(floor((epoch_us(first_purchase) - epoch_us(first_view))
                        / 60000000.0) AS BIGINT) AS mins
      FROM firsts
      WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        AND first_purchase >= first_view
    ),
    dom AS (SELECT mins, COUNT(*) AS c FROM conv GROUP BY mins),
    cum AS (
      SELECT mins,
             SUM(c) OVER (ORDER BY mins) AS cum_c,
             SUM(c) OVER () AS n
      FROM dom
    ),
    tot AS (
      SELECT (SELECT COUNT(*) FROM firsts WHERE first_view IS NOT NULL)
               AS n_viewers,
             (SELECT MAX(n) FROM cum) AS n_converted
    )
    SELECT CAST(n_viewers AS BIGINT) AS n_viewers,
           CAST(n_converted AS BIGINT) AS n_converted,
           ROUND(n_converted / CAST(n_viewers AS DOUBLE), 6)
             AS conversion_rate,
           CAST((SELECT MIN(mins) FROM cum
                 WHERE cum_c >= ceil(0.5 * n)) AS BIGINT) AS p50_minutes,
           CAST((SELECT MIN(mins) FROM cum
                 WHERE cum_c >= ceil(0.9 * n)) AS BIGINT) AS p90_minutes
    FROM tot
"""


@register("q_time_to_convert", oracle=_TIME_TO_CONVERT_ORACLE)
def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-view-to-first-purchase latency: conversion rate over all
    viewers plus the p50/p90 minutes-to-convert among converters —
    the funnel's TIME dimension, which q_funnel_conversion's stage
    counts flatten away (two products with identical conversion rates
    and 10 minutes vs 10 days to convert need opposite interventions:
    friction removal vs nurture campaigns).

    Scale/determinism: one conditional-MIN pair per user (combinable,
    one user_id shuffle shared with every funnel operator), latencies
    floored to integer MINUTES, and the percentiles are DISCRETE
    order-statistic lookups on the minutes-DOMAIN cumulative frame
    (the q_supplier_lead_time convention — no interpolation to drift
    cross-engine)."""
    t = load(spark, sf_dir)
    firsts = t.events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    conv = firsts.where(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        F.floor(
            (
                F.unix_micros("first_purchase")
                - F.unix_micros("first_view")
            )
            / 60_000_000.0
        )
        .cast("bigint")
        .alias("mins")
    )
    dom = conv.groupBy("mins").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("mins")
    w_all = Window.partitionBy()
    cum = dom.select(
        "mins",
        F.sum("c").over(w_cum).alias("cum_c"),
        F.sum("c").over(w_all).alias("n"),
    )
    pcts = cum.agg(
        F.max("n").alias("n_converted"),
        F.min(
            F.when(
                F.col("cum_c") >= F.ceil(0.5 * F.col("n")), F.col("mins")
            )
        ).cast("bigint").alias("p50_minutes"),
        F.min(
            F.when(
                F.col("cum_c") >= F.ceil(0.9 * F.col("n")), F.col("mins")
            )
        ).cast("bigint").alias("p90_minutes"),
    )
    viewers = firsts.where(F.col("first_view").isNotNull()).agg(
        F.count(F.lit(1)).alias("n_viewers")
    )
    return viewers.crossJoin(F.broadcast(pcts)).select(
        F.col("n_viewers").cast("bigint").alias("n_viewers"),
        F.col("n_converted").cast("bigint").alias("n_converted"),
        F.round(
            F.col("n_converted") / F.col("n_viewers").cast("double"), 6
        ).alias("conversion_rate"),
        "p50_minutes",
        "p90_minutes",
    )
