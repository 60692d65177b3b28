"""Conditional / null-semantics functions (SURVEY.md section 2 B8
family extension): CASE WHEN, coalesce, nullif, null-safe equality.

The fixtures contain no NULLs, so the query manufactures them with
nullif — which is itself under test. Null semantics are where engines
quietly diverge (three-valued logic, null-safe compare), so pinning them
against the oracle is cheap insurance for every other operator."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debit'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END                                   AS balance_band,
           nullif(c_mktsegment, 'BUILDING')                       AS seg_or_null,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER')    AS seg_filled,
           (nullif(c_mktsegment, 'BUILDING')
              IS NOT DISTINCT FROM NULL)                          AS is_building,
           CASE WHEN c_acctbal > 0 THEN ROUND(c_acctbal, 2) END   AS pos_bal
    FROM customer
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN ladder, nullif-manufactured NULLs, coalesce backfill,
    null-safe equality (Spark <=> == SQL IS NOT DISTINCT FROM), and a
    CASE with no ELSE (implicit NULL). All Column exprs — conditionals
    never need UDFs."""
    t = load(spark, sf_dir)
    seg_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return t.customer.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debit")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("balance_band"),
        seg_null.alias("seg_or_null"),
        F.coalesce(seg_null, F.lit("OTHER")).alias("seg_filled"),
        seg_null.eqNullSafe(F.lit(None)).alias("is_building"),
        F.when(F.col("c_acctbal") > 0, F.round("c_acctbal", 2)).alias("pos_bal"),
    )
