"""Table profiling: per-column statistics in one pass (the engine-side
analog of ANALYZE / data-quality summaries a training pipeline runs
before trusting a new drop of data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


def _col_oracle(c: str) -> str:
    return f"""
    SELECT '{c}' AS column_name,
           COUNT({c})                  AS n_nonnull,
           COUNT(DISTINCT {c})         AS n_distinct,
           CAST(MIN({c}) AS VARCHAR)   AS min_s,
           CAST(MAX({c}) AS VARCHAR)   AS max_s
    FROM orders"""


@register(
    "profile_table",
    oracle="\nUNION ALL\n".join(_col_oracle(c) for c in _COLS),
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of orders: non-null count, exact distinct
    count, min/max (stringified for a uniform schema). All measures for
    all columns compute in a single aggregate over a single scan — the
    profile costs one pass regardless of column count. Numeric min/max
    stringification matches DuckDB because the fixture doubles carry
    short decimal representations."""
    t = load(spark, sf_dir)
    aggs = []
    for c in _COLS:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.countDistinct(c).alias(f"{c}__d"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = t.orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__d, {c}__min, {c}__max" for c in _COLS
    )
    return one.selectExpr(
        f"stack({len(_COLS)}, {stack_args}) AS "
        "(column_name, n_nonnull, n_distinct, min_s, max_s)"
    )


@register(
    "agg_histogram",
    oracle="""
    SELECT bucket,
           CAST(900 + bucket * 10 AS DOUBLE)      AS lo,
           CAST(900 + (bucket + 1) * 10 AS DOUBLE) AS hi,
           CAST(COUNT(*) AS BIGINT)                AS n
    FROM (
      SELECT CAST(floor((p_retailprice - 900.0) / 10.0) AS INTEGER) AS bucket
      FROM part
    )
    GROUP BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (data-profiling primitive): bucket index by
    closed-form floor arithmetic — one scan, one hash aggregate on a tiny
    key space, no sort, no window. This is how column statistics are
    built at 100 TB (the same shape Spark's ANALYZE uses); contrast with
    agg_approx_quantile for the equi-DEPTH variant."""
    t = load(spark, sf_dir)
    bucket = F.floor((F.col("p_retailprice") - 900.0) / 10.0).cast("int")
    return (
        t.part.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (900 + F.col("bucket") * 10).cast("double").alias("lo"),
            (900 + (F.col("bucket") + 1) * 10).cast("double").alias("hi"),
            "n",
        )
    )
