"""Nested struct functions (SURVEY.md section 2 B8 family extension).

The reference's closest nested datum is the blob metadata map (A18,
child.py:200-204 — covered by fn_map); structs extend that to typed
records: composite grouping keys, field re-projection, and
struct-in-array sorting with deterministic semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "fn_struct",
    oracle="""
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           COUNT(*) AS n_orders, ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct as a composite grouping key, then field re-projection
    (k.status / k.priority). Catalyst flattens the struct key into its
    fields for the hash aggregate, so this costs exactly the same as
    grouping on two plain columns — structs are a naming device, not a
    runtime penalty."""
    t = load(spark, sf_dir)
    k = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )
    return (
        t.orders.groupBy(k.alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .select(
            F.col("k.status").alias("status"),
            F.col("k.priority").alias("priority"),
            "n_orders",
            "max_price",
        )
    )


@register(
    "fn_struct_array",
    oracle="""
    SELECT o_custkey, first_orderkey, first_orderdate, n_orders FROM (
      SELECT o_custkey, o_orderkey AS first_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS first_orderdate,
             COUNT(*)     OVER (PARTITION BY o_custkey) AS n_orders,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders)
    WHERE rn = 1
    """,
)
def fn_struct_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest order per customer via sort_array over collected
    (date, key) structs: structs sort lexicographically by field order,
    which makes collect_list's nondeterministic ordering harmless — the
    deterministic-aggregation idiom for 'first row by X' without a window
    shuffle-and-filter."""
    t = load(spark, sf_dir)
    pair = F.struct(F.col("o_orderdate").alias("d"), F.col("o_orderkey").alias("k"))
    first = F.element_at(F.sort_array(F.collect_list(pair)), 1)
    return (
        t.orders.groupBy("o_custkey")
        .agg(
            first.alias("first"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_custkey",
            F.col("first.k").alias("first_orderkey"),
            F.date_format("first.d", "yyyy-MM-dd").alias("first_orderdate"),
            "n_orders",
        )
    )
