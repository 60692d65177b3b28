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
    into the values so the order-insensitive hash still checks it."""
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
    return base.withColumn(
        "sort_pos", F.row_number().over(Window.orderBy(*order))
    ).orderBy(*order)


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
