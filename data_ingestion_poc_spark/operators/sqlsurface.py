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
