"""Hash functions (SURVEY.md section 2 B8 fn_hash).

Origin: the reference verifies integrity by SIZE EQUALITY ONLY (A9
child.py:83-88 — no md5/sha anywhere). fn_hash is that check upgraded to
real digests; fn_hash_native adds Spark's cheap non-cryptographic hashes
(xxhash64 — the right 100 TB dedup/bucketing key; no DuckDB analog, so
rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text)                 AS text_md5,
           sha256(text)              AS text_sha256,
           md5(lang || ':' || source) AS ident_md5
    FROM documents
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digests over document text (A9's size-equality check
    upgraded to content digests)."""
    t = load(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
        F.sha2(F.col("text").cast("binary"), 256).alias("text_sha256"),
        F.md5(F.concat(F.col("lang"), F.lit(":"), F.col("source")).cast("binary")).alias(
            "ident_md5"
        ),
    )


@register("fn_hash_native", oracle=None)  # xxhash64/crc32: no DuckDB analog
def fn_hash_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-cryptographic engine hashes — xxhash64 is the cheap shuffle-key
    / dedup-key at scale (8 bytes, JVM-side, no UDF)."""
    t = load(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.xxhash64("text").alias("text_xxh64"),
        F.crc32(F.col("text").cast("binary")).alias("text_crc32"),
        F.hash("text", "lang").alias("row_hash32"),
    )
