"""spark.sql surface: the engine is usable as plain SQL over the
registered views, with CTEs, scalar subqueries, and correlated
subqueries resolved by Catalyst (decorrelated into joins — no
per-row re-execution). The DataFrame operators and these SQL forms
compile to the same plans; this module proves the SQL entry point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from ..registry import register

_SQL = """
    WITH nation_stats AS (
      SELECT c_nationkey, AVG(c_acctbal) AS nation_avg
      FROM customer GROUP BY c_nationkey
    )
    SELECT c.c_custkey, c.c_nationkey,
           ROUND(c.c_acctbal, 2)                       AS c_acctbal,
           ROUND(ns.nation_avg, 4)                     AS nation_avg,
           ROUND(c.c_acctbal - (SELECT AVG(c_acctbal) FROM customer), 4)
                                                       AS vs_global
    FROM customer c
    JOIN nation_stats ns ON ns.c_nationkey = c.c_nationkey
    WHERE c.c_acctbal > ns.nation_avg
      AND EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""


@register("sql_cte_subquery", oracle=_SQL)
def sql_cte_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One spark.sql query exercising a CTE, an uncorrelated scalar
    subquery (global average — computed once and broadcast), and a
    correlated EXISTS (decorrelated by Catalyst into a left semi join):
    customers above their nation's average balance who have at least one
    big order. The oracle is the IDENTICAL SQL text run by DuckDB — the
    strongest form of SQL-surface parity."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL)


_RECURSIVE_SQL = """
    WITH RECURSIVE chain(c_custkey, depth, chain_bal) AS (
      SELECT c_custkey, 0, ROUND(c_acctbal, 2)
      FROM customer WHERE c_custkey = 0
      UNION ALL
      SELECT c.c_custkey, p.depth + 1, ROUND(p.chain_bal + c.c_acctbal, 2)
      FROM chain p
      JOIN customer c
        ON CAST(FLOOR(c.c_custkey / 2) AS BIGINT) = p.c_custkey
       AND c.c_custkey > p.c_custkey
    )
    SELECT c_custkey, depth, chain_bal FROM chain
"""


@register("sql_recursive_cte", oracle=_RECURSIVE_SQL)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): walk the implicit binary
    tree over customer keys (parent = floor(key/2)) from the root,
    carrying depth and an accumulated ancestor-balance down each path —
    the org-hierarchy / BOM-explosion query shape, expressed natively
    instead of a driver-side loop. The recursion is a per-level
    UNION ALL (Spark's recursive CTEs don't support UNION-distinct yet,
    so the shape must be acyclic — cyclic graphs go to dedup_clusters'
    iterative min-label propagation instead). Each level is one
    broadcast/hash join against customer; depth = log2(N) levels.
    Per-step ROUND(…, 2) keeps the accumulated double identical across
    engines. Oracle: the IDENTICAL SQL text in DuckDB."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


_LATERAL_SQL = """
    SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
      FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) l
"""


@register("join_lateral_topk", oracle=_LATERAL_SQL)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT: each customer's
    top-2 orders, written the way an analyst writes it. Catalyst
    decorrelates the per-row subquery into a window top-k over ONE join
    (no per-customer re-execution), i.e. the same physical shape as
    win_topk_per_group — proving the SQL sugar and the DataFrame idiom
    meet in the same plan. Oracle: identical SQL in DuckDB (native
    lateral execution), so the decorrelation is checked against a real
    row-at-a-time semantics."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


#: The pipe query and its classic-SQL equivalent compute the same report;
#: DuckDB runs the classic text (pipe syntax is Spark's), so parity here
#: proves the |> surface lowers to the same semantics.
_PIPE_SQL = """
    FROM lineitem
    |> WHERE l_quantity >= 30
    |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
    |> AGGREGATE ROUND(SUM(disc_price), 2) AS revenue,
                 COUNT(*) AS n_lines
       GROUP BY l_returnflag, l_linestatus
    |> WHERE n_lines > 100
    |> SELECT l_returnflag, l_linestatus, revenue, n_lines
"""

_PIPE_CLASSIC = """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT)                          AS n_lines
    FROM lineitem
    WHERE l_quantity >= 30
    GROUP BY l_returnflag, l_linestatus
    HAVING COUNT(*) > 100
"""


@register("sql_pipe_syntax", oracle=_PIPE_CLASSIC)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax (SPARK-49555): the |> operator chain
    (FROM |> WHERE |> EXTEND |> AGGREGATE ... GROUP BY |> WHERE |>
    SELECT) — each stage consumes the previous stage's table, reading
    top-to-bottom in dataflow order like the DataFrame API. Catalyst
    lowers it to exactly the classic GROUP BY/HAVING plan the oracle
    runs, so this is pure surface: same pushdown, same partial
    aggregation, same exchanges."""
    register_views(spark, sf_dir)
    return spark.sql(_PIPE_SQL)


_SQL_UDF_ORACLE = """
    SELECT c_mktsegment,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END AS tier,
           COUNT(*) AS n_customers,
           ROUND(SUM(c_acctbal * (1 - 0.05)), 2) AS discounted_balance
    FROM customer
    GROUP BY 1, 2
"""


@register("sql_scalar_udf", oracle=_SQL_UDF_ORACLE)
def sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar functions (Spark 4 CREATE FUNCTION ... RETURNS
    ... RETURN expr, SPARK-46246 SQL UDFs): business logic named once in
    the catalog and reused across queries — WITHOUT the Python-worker
    round trip a pyspark UDF costs. Catalyst INLINES the function body
    into the calling plan, so `tier(c_acctbal)` groups and filters with
    full codegen/pushdown, indistinguishable from writing the CASE
    inline (the oracle IS the inlined text — passing proves the
    inlining). This is the 100 TB answer to 'we need reusable business
    logic': SQL UDFs stay JVM-side and optimizer-visible; reach for
    Python only when the logic genuinely cannot be expressed
    relationally (functions/udfs.py measures that cliff)."""
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION cust_tier(b DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN b < 0 THEN 'negative' "
        "WHEN b < 5000 THEN 'standard' ELSE 'premium' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION after_fee(b DOUBLE) "
        "RETURNS DOUBLE RETURN b * (1 - 0.05)"
    )
    return spark.sql(
        """
        SELECT c_mktsegment,
               cust_tier(c_acctbal) AS tier,
               COUNT(*) AS n_customers,
               ROUND(SUM(after_fee(c_acctbal)), 2) AS discounted_balance
        FROM customer
        GROUP BY 1, 2
        """
    )
