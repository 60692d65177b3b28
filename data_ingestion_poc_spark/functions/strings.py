"""String function surface (SURVEY.md section 2 B8 fn_string).

Origin: the reference's string work is sanitization (A11 child.py:20-33)
and name derivation (A12 child.py:131-132). All JVM-side Column exprs —
inside whole-stage codegen, never a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           lower(c_name)                                   AS name_lower,
           upper(c_mktsegment)                             AS seg_upper,
           substring(c_name, 10, 6)                        AS name_sub,
           lpad(CAST(c_custkey AS VARCHAR), 9, '0')        AS key_pad,
           split_part(c_name, '#', 2)                      AS name_num,
           replace(c_name, 'Customer', 'Cust')             AS name_rep,
           length(c_name)                                  AS name_len,
           concat(c_mktsegment, ':', c_name)               AS seg_name,
           regexp_extract(c_name, '([1-9][0-9]*|0)$', 1)   AS trailing_num,
           starts_with(c_name, 'Customer')                 AS is_customer,
           trim('  ' || c_mktsegment || '  ')              AS seg_trim
    FROM customer
    WHERE c_custkey < 500
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string functions: case, substring, pad, split, replace,
    length, concat, regexp_extract, prefix test, trim."""
    t = load(spark, sf_dir)
    c = t.customer.where(F.col("c_custkey") < 500)
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 10, 6).alias("name_sub"),
        F.lpad(F.col("c_custkey").cast("string"), 9, "0").alias("key_pad"),
        F.element_at(F.split("c_name", "#"), 2).alias("name_num"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("name_rep"),
        F.length("c_name").alias("name_len"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("seg_name"),
        F.regexp_extract("c_name", r"([1-9][0-9]*|0)$", 1).alias("trailing_num"),
        F.col("c_name").startswith("Customer").alias("is_customer"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit("  "))).alias(
            "seg_trim"
        ),
    )


@register(
    "fn_collation",
    oracle="""
    SELECT lower(et) AS et_ci, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(CASE WHEN lower(et) = 'click' THEN 1 END) AS BIGINT)
             AS n_click_ci
    FROM (SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                      ELSE event_type END AS et
          FROM events)
    GROUP BY lower(et)
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: case-insensitive grouping and comparison via
    UTF8_LCASE collation on the column itself — no lower() rewrites at
    every use site (the pre-collation idiom the oracle still has to
    use). The fixture has uniform case, so half the rows are upper-cased
    first (event_id parity — deterministic). The grouped key under a
    collation keeps an arbitrary representative casing, so the output
    canonicalizes with lower() — the COUNTS are what the collation
    determines. Collation is expression-level metadata: the aggregate is
    still one ordinary hash shuffle, and comparisons stay in codegen."""
    t = load(spark, sf_dir)
    mixed = t.events.select(
        F.when(
            F.col("event_id") % 2 == 0, F.upper("event_type")
        ).otherwise(F.col("event_type")).alias("et")
    )
    ci = F.collate(F.col("et"), "UTF8_LCASE")
    return (
        mixed.groupBy(ci.alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(ci == F.lit("click"), 1)).alias("n_click_ci"),
        )
        .select(F.lower(F.col("k")).alias("et_ci"), "n", "n_click_ci")
    )
