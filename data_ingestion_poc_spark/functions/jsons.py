"""JSON functions (SURVEY.md section 2 B8 fn_json) over events.props
(a JSON string column). Extension — the reference never parses payloads.
from_json parses once into a struct (the scalable pattern: parse a column
one time, not per-field with repeated get_json_object).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')       AS k_str,
           CAST(json_extract(props, '$.k') AS INT) AS k_int,
           CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod,
           json_extract_string(props, '$.missing') AS missing_field
    FROM events
    WHERE event_id < 3000
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object (path extraction) and from_json (schema'd parse) on
    the props JSON column; missing paths yield NULL in both engines."""
    t = load(spark, sf_dir)
    ev = t.events.where(F.col("event_id") < 3000)
    parsed = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        (parsed.getField("k") % 10).alias("k_mod"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
    )


@register(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           CAST(json_extract(props, '$.missing') AS INTEGER) AS absent
    FROM events
    WHERE event_id < 3000
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT type (Spark 4): parse_json ONCE into a
    binary variant column, then typed path extraction — unlike
    from_json, no schema must be declared up front, and unlike repeated
    get_json_object there is no re-parse per field. This is the
    schema-on-read path for heterogeneous event payloads at 100 TB
    (variant columns shred to parquet efficiently). Missing paths via
    try_variant_get return NULL, not errors (ANSI-safe)."""
    t = load(spark, sf_dir)
    ev = t.events.where(F.col("event_id") < 3000)
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.try_variant_get(v, "$.missing", "int").alias("absent"),
    )
