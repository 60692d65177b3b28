"""Map functions (SURVEY.md section 2 B8 fn_map). Origin: the blob metadata
map {creation_time, modified_time, file_size} attached at upload
(A18 child.py:200-204). The map is built and queried Spark-side; outputs
are plain scalars so the DuckDB oracle computes them directly (DuckDB MAP
internals never need to match Spark's).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "fn_map",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey * 100 AS VARCHAR)                 AS file_size,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')        AS creation_time,
           'creation_time,file_size,modified_time'           AS keys_sorted,
           3                                                 AS n_keys,
           TRUE                                              AS has_size
    FROM orders
    WHERE o_orderkey < 1000
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the reference's metadata map as MapType, then read it back via
    element_at / map_keys / map_contains_key."""
    t = load(spark, sf_dir)
    o = t.orders.where(F.col("o_orderkey") < 1000)
    meta = F.create_map(
        F.lit("creation_time"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        F.lit("modified_time"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        F.lit("file_size"),
        (F.col("o_orderkey") * 100).cast("string"),
    )
    df = o.select("o_orderkey", meta.alias("meta"))
    return df.select(
        "o_orderkey",
        F.element_at("meta", "file_size").alias("file_size"),
        F.element_at("meta", "creation_time").alias("creation_time"),
        F.concat_ws(",", F.array_sort(F.map_keys("meta"))).alias("keys_sorted"),
        F.size("meta").alias("n_keys"),
        F.map_contains_key("meta", "file_size").alias("has_size"),
    )


@register(
    "fn_map_hof",
    oracle="""
    SELECT event_id,
           ROUND(value * 2 * 10, 4) AS v2_scaled,
           CAST((CASE WHEN value * 10 > 100 THEN 1 ELSE 0 END)
              + (CASE WHEN value * 2 * 10 > 100 THEN 1 ELSE 0 END)
              AS INTEGER) AS n_kept
    FROM events
    WHERE event_id < 3000
    """,
)
def fn_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order MAP functions: transform_values rewrites every value
    without exploding the map; map_filter prunes entries by (k, v)
    predicate — both Catalyst expressions (the blob-metadata map of A18
    child.py:200-204 processed without leaving codegen). The oracle
    checks the arithmetic through scalar equivalents since DuckDB's MAP
    surface differs."""
    t = load(spark, sf_dir)
    ev = t.events.where(F.col("event_id") < 3000)
    m = F.create_map(
        F.lit("v"), F.col("value"), F.lit("v2"), F.col("value") * 2
    )
    scaled = F.transform_values(m, lambda k, v: v * 10)
    kept = F.map_filter(scaled, lambda k, v: v > 100)
    return ev.select(
        "event_id",
        F.round(F.element_at(scaled, F.lit("v2")), 4).alias("v2_scaled"),
        F.size(kept).alias("n_kept"),
    )
