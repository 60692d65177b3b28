"""The last four TPC-H shapes (Q9/Q16/Q20/Q21) adapted to the TESTDATA
schema — completing the 22-query composite family started in composite.py
and subqueries.py. The fixtures lack partsupp / l_commitdate /
l_receiptdate / comment columns (FIXTURES.md), so:

- part-supplier relationships derive from DISTINCT (l_partkey, l_suppkey)
  pairs in lineitem (the only table recording who supplied what);
- supply cost derives from part.p_retailprice (Q9 profit);
- "kept orders waiting" (Q21) uses l_shipdate > o_orderdate + 90 days as
  the lateness predicate (no receipt/commit dates exist);
- the Q16 complaint-supplier NOT IN set becomes negative-balance
  suppliers (no comment column).

Scale posture: every aggregate runs before the join it feeds; dimension
sides are filtered before joining and broadcast when small; consecutive
groupBys share a key prefix so one Exchange feeds both (Q20/Q21). Money
and quantity arithmetic stays in DECIMAL multiply-compare form so no
float rounding can flip a boundary row between Spark and DuckDB.

Reference lineage: generalizes the accounting/summary operators
(main.py:101-109, A22) and the sink-state probe (child.py:174-191,
A16/A17) to multi-table analytic form; the reference itself computes no
joins (SURVEY.md section 2 Part A, "explicitly absent").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "q_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(ROUND(SUM(
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,4)))
             - CAST(p.p_retailprice AS DECIMAL(12,2))
               * CAST(l.l_quantity AS DECIMAL(8,2))
               * CAST(0.05 AS DECIMAL(3,2))
           ), 2) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    """,
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier-nation and order year for parts
    matching a name pattern. partsupp.ps_supplycost is absent, so unit
    cost is modeled as 5% of p_retailprice per unit — the shape (revenue
    minus cost, two fact-side measures from different tables) is what
    matters. Join order: the name-filtered part table prunes lineitem
    FIRST (the most selective edge), then supplier/nation (broadcast)
    attach the grouping key, and orders joins last on the already-reduced
    fact. All money math is DECIMAL end-to-end; the 0.05 factor is a
    DECIMAL literal so neither engine rounds in binary float."""
    t = load(spark, sf_dir)
    red_parts = t.part.where(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    profit = F.col("l_extendedprice").cast("decimal(12,2)") * (
        1 - F.col("l_discount").cast("decimal(4,4)")
    ) - F.col("p_retailprice").cast("decimal(12,2)") * F.col("l_quantity").cast(
        "decimal(8,2)"
    ) * F.lit("0.05").cast("decimal(3,2)")
    return (
        t.lineitem.join(red_parts, F.col("p_partkey") == F.col("l_partkey"))
        .join(t.supplier.select("s_suppkey", "s_nationkey"),
              F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t.nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(t.orders.select("o_orderkey", "o_orderdate"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


@register(
    "q_supplier_part_counts",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT pr.l_suppkey) AS supplier_cnt
    FROM pairs pr
    JOIN part p ON p.p_partkey = pr.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND pr.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    LIMIT 20
    """,
)
def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many suppliers can serve each (brand, type,
    size) bucket, excluding a blacklist via NOT IN. The part-supplier
    relation derives from DISTINCT lineitem pairs (no partsupp table);
    the complaint blacklist becomes negative-balance suppliers (no
    comment column). NOT IN over a non-nullable key column is exactly a
    left anti join, and the blacklist is O(suppliers) so it broadcasts —
    no shuffle for the exclusion. The DISTINCT pair extraction is the
    one big shuffle; the part join then lands on its l_partkey
    partitioning. Ordered + limited for a deterministic top-20."""
    t = load(spark, sf_dir)
    pairs = t.lineitem.select("l_partkey", "l_suppkey").distinct()
    blacklist = F.broadcast(
        t.supplier.where(F.col("s_acctbal") < 0.0).select("s_suppkey")
    )
    good_parts = t.part.where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        pairs.join(blacklist, F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(good_parts, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
        .limit(20)
    )


@register(
    "q_dominant_suppliers",
    oracle="""
    WITH pair AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(8,2))) AS pair_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate < TIMESTAMP '1999-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    tot AS (
      SELECT l_partkey AS t_partkey, SUM(pair_qty) AS part_qty
      FROM pair GROUP BY l_partkey
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_regionkey = 0
      AND s.s_suppkey IN (
        SELECT pair.l_suppkey
        FROM pair
        JOIN tot ON tot.t_partkey = pair.l_partkey
        JOIN part p ON p.p_partkey = pair.l_partkey
        WHERE p.p_name LIKE 'red%' AND pair.pair_qty * 2 > tot.part_qty
      )
    ORDER BY s.s_suppkey
    """,
)
def q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one region who dominated the 1998
    supply (>50% of shipped quantity) of some red-named part — the
    original's nested IN subqueries (partkeys by name -> availqty vs half
    of shipped qty) decorrelated into: per-(part,supplier) aggregate,
    per-part total reusing the same shuffle key prefix, exact DECIMAL
    multiply-compare (pair_qty * 2 > part_qty), then a semi join into the
    supplier dimension. The year filter pushes to the parquet scan before
    either aggregate; the part-name filter reduces the probe side before
    the semi join; nation broadcasts.

    The explicit repartition(l_partkey) is the load-bearing scale choice:
    hash(l_partkey) satisfies the clustering requirement of the
    (l_partkey, l_suppkey) aggregate, the l_partkey rollup, AND the
    pair-to-total join, so ONE exchange feeds all three (groupBy alone
    would plan hash(pk,sk) + hash(pk) + join exchanges = three shuffles
    of fact-derived rows). Nothing is lost to skipped partial-combine
    because year-filtered (pk,sk) pairs are ~unique per row. Measured at
    16x sf0.1: 3.45s -> 1.39s cold, 1.69s -> 1.09s warm."""
    t = load(spark, sf_dir)
    pair = (
        t.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(8,2)")).alias("pair_qty"))
    )
    tot = pair.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("pair_qty").alias("part_qty")
    )
    red = t.part.where(F.col("p_name").like("red%")).select("p_partkey")
    dominant = (
        pair.join(tot, F.col("t_partkey") == F.col("l_partkey"))
        .join(red, F.col("p_partkey") == F.col("l_partkey"))
        .where(F.col("pair_qty") * 2 > F.col("part_qty"))
        .select("l_suppkey")
    )
    region_nations = F.broadcast(
        t.nation.where(F.col("n_regionkey") == 0).select("n_nationkey", "n_name")
    )
    return (
        t.supplier.join(
            region_nations, F.col("n_nationkey") == F.col("s_nationkey")
        )
        .join(dominant, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@register(
    "q_sole_late_shippers",
    oracle="""
    WITH ls AS (
      SELECT l.l_orderkey, l.l_suppkey,
             MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey, l.l_suppkey
    ),
    per_o AS (
      SELECT l_orderkey AS p_orderkey, COUNT(*) AS nsupp, SUM(late) AS nlate
      FROM ls GROUP BY l_orderkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM ls
    JOIN per_o ON per_o.p_orderkey = ls.l_orderkey
    JOIN supplier s ON s.s_suppkey = ls.l_suppkey
    WHERE ls.late = 1 AND per_o.nsupp > 1 AND per_o.nlate = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q_sole_late_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    finished multi-supplier order — the original's EXISTS (another
    supplier on the order) plus NOT EXISTS (another LATE supplier)
    correlated pair, decorrelated into per-order counts: nsupp > 1
    encodes the EXISTS, nlate = 1 (with this supplier late) encodes the
    NOT EXISTS. Lateness is l_shipdate > o_orderdate + 90 days (no
    receipt/commit dates in the fixtures).

    Shuffle plan (r3 rewrite, was 4 Exchanges): the per-order counts are
    WINDOW aggregates over the (orderkey, suppkey) rollup instead of a
    second groupBy + self-join. hashpartitioning(l_orderkey) from the
    lineitem/orders sort-merge join satisfies the clustered distribution
    of BOTH the (l_orderkey, l_suppkey) aggregate (subset key) and the
    l_orderkey window, so the whole reduction chain runs with zero new
    Exchanges: 2 (join sides) + 1 (final s_name agg) = 3 total, with
    supplier broadcast. Deterministic top-20 by wait count."""
    t = load(spark, sf_dir)
    late_flag = F.max(
        F.when(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
            1,
        ).otherwise(0)
    ).alias("late")
    ls = (
        t.lineitem.join(
            t.orders.where(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(late_flag)
    )
    w_order = Window.partitionBy("l_orderkey")
    flagged = ls.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.count(F.lit(1)).over(w_order).alias("nsupp"),
        F.sum("late").over(w_order).alias("nlate"),
    )
    return (
        flagged.where(
            (F.col("late") == 1) & (F.col("nsupp") > 1) & (F.col("nlate") == 1)
        )
        # supplier scales with SF: no hard broadcast hint (AQE decides)
        .join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


#: Wilson lower-bound confidence (z for 95%): the ranking score for
#: "reliable supplier" that does not reward tiny samples the way a raw
#: success rate does.
WILSON_Z = 1.96

_WILSON_ORACLE = f"""
    WITH s AS (
      SELECT l_suppkey,
             COUNT(*) AS n,
             SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS ok
      FROM lineitem GROUP BY l_suppkey
    ),
    w AS (
      SELECT l_suppkey, n, ok,
             ok / CAST(n AS DOUBLE) AS p,
             (ok / CAST(n AS DOUBLE) + {WILSON_Z} * {WILSON_Z} / (2.0 * n)
              - {WILSON_Z} * sqrt((ok / CAST(n AS DOUBLE))
                    * (1 - ok / CAST(n AS DOUBLE)) / n
                    + {WILSON_Z} * {WILSON_Z} / (4.0 * n * n)))
             / (1 + {WILSON_Z} * {WILSON_Z} / CAST(n AS DOUBLE)) AS wlb
      FROM s
    )
    SELECT CAST(l_suppkey AS BIGINT) AS l_suppkey,
           CAST(n AS BIGINT) AS n_lines,
           CAST(ok AS BIGINT) AS n_clean,
           ROUND(p, 6) AS clean_rate,
           ROUND(wlb, 6) AS wilson_lower,
           CAST(row_number() OVER (ORDER BY floor(wlb * 1000000) DESC,
                                   l_suppkey) AS BIGINT) AS reliability_rank
    FROM w
"""


@register("q_supplier_wilson_score", oracle=_WILSON_ORACLE)
def q_supplier_wilson_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier reliability ranking by the WILSON LOWER BOUND of the
    non-returned-line rate — the ranking statistic that fixes the two
    classic failures of sorting by raw rate (a 2/2 supplier beats a
    198/200 one) and by volume (big sellers win regardless of quality):
    the lower confidence bound rewards both a high rate AND the
    evidence for it. The e-commerce "sort by rating" algorithm applied
    to the supply base.

    Scale/determinism: one combinable (n, ok) aggregate per supplier;
    the Wilson expression is identical arithmetic on exact integers;
    the global ranking window orders by the score FLOORED to 1e-6 (ties
    then break by key, so sub-lattice libm drift cannot reorder) over
    the SUPPLIER-domain frame."""
    t = load(spark, sf_dir)
    s = t.lineitem.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_returnflag") != "R", 1).otherwise(0)).alias(
            "ok"
        ),
    )
    nd = F.col("n").cast("double")
    p = F.col("ok") / nd
    z2 = WILSON_Z * WILSON_Z
    wlb = (
        p + z2 / (2.0 * F.col("n"))
        - WILSON_Z
        * F.sqrt(p * (1 - p) / F.col("n") + z2 / (4.0 * F.col("n") * F.col("n")))
    ) / (1 + z2 / nd)
    w = Window.orderBy(F.floor(wlb * 1_000_000).desc(), "l_suppkey")
    return s.select(
        F.col("l_suppkey").cast("bigint").alias("l_suppkey"),
        F.col("n").cast("bigint").alias("n_lines"),
        F.col("ok").cast("bigint").alias("n_clean"),
        F.round(p, 6).alias("clean_rate"),
        F.round(wlb, 6).alias("wilson_lower"),
        F.row_number().over(w).cast("bigint").alias("reliability_rank"),
    )


#: XYZ demand-variability classes on the weekly coefficient of
#: variation (the standard inventory-planning cutoffs).
XYZ_X_MAX = 0.5
XYZ_Y_MAX = 1.0

_XYZ_ORACLE = f"""
    WITH wk AS (
      SELECT p.p_brand,
             date_trunc('week', l.l_shipdate) AS week,
             SUM(CAST(l.l_quantity AS BIGINT)) AS qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    s AS (
      SELECT p_brand,
             COUNT(*) AS n_weeks,
             AVG(qty) AS mu,
             STDDEV_SAMP(qty) AS sd
      FROM wk GROUP BY p_brand
    )
    SELECT p_brand,
           CAST(n_weeks AS BIGINT) AS n_weeks,
           ROUND(mu, 4) AS mean_weekly_qty,
           ROUND(sd / mu, 6) AS cv,
           CASE WHEN sd / mu < {XYZ_X_MAX} THEN 'X'
                WHEN sd / mu < {XYZ_Y_MAX} THEN 'Y'
                ELSE 'Z' END AS xyz_class
    FROM s
"""


@register("q_xyz_variability", oracle=_XYZ_ORACLE)
def q_xyz_variability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classification per brand: coefficient of
    variation of WEEKLY shipped quantity — X (steady, forecastable,
    cv < {XYZ_X_MAX}), Y (swinging, cv < {XYZ_Y_MAX}), Z (erratic).
    The planning twin of q_abc_classification: ABC says how much a
    brand MATTERS, XYZ says how PREDICTABLE it is; AX items get lean
    stock, CZ items get make-to-order. Run together they are the
    standard inventory-policy matrix.

    Scale/determinism: facts reduce to the (brand x week)
    calendar-DOMAIN frame (combinable integer qty sums on the part-dim
    join), then one (n, mean, sd) fold per brand; cv is one identical
    division on the brand-domain frame."""
    t = load(spark, sf_dir)
    wk = (
        t.lineitem.join(
            # part scales with SF: no hard broadcast hint (AQE decides)
            t.part.select(F.col("p_partkey").alias("l_partkey"), "p_brand"),
            "l_partkey",
        )
        .groupBy(
            "p_brand",
            F.date_trunc("week", F.col("l_shipdate")).alias("week"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
    )
    s = wk.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_weeks"),
        F.avg("qty").alias("mu"),
        F.stddev_samp("qty").alias("sd"),
    )
    cv = F.col("sd") / F.col("mu")
    return s.select(
        "p_brand",
        F.col("n_weeks").cast("bigint").alias("n_weeks"),
        F.round("mu", 4).alias("mean_weekly_qty"),
        F.round(cv, 6).alias("cv"),
        F.when(cv < XYZ_X_MAX, "X")
        .when(cv < XYZ_Y_MAX, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
