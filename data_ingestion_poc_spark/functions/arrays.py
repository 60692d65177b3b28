"""Array functions (SURVEY.md section 2 B8 fn_array). Origin: A14's 1->N
zip explode is the reference's only collection op; here the collection
surface is exercised over tokenized document text. All higher-order
functions (transform/filter/aggregate) are Catalyst expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "fn_array",
    oracle="""
    SELECT doc_id,
           len(words)                                        AS n_words,
           words[1]                                          AS first_word,
           list_contains(words, 'spark')                     AS has_spark,
           array_to_string(words[1:3], ' ')                  AS first3,
           len(list_distinct(words))                         AS n_distinct,
           list_sort(list_distinct(words))[1]                AS min_word,
           len(list_filter(words, w -> length(w) > 5))       AS n_long_words
    FROM (SELECT doc_id, string_split(text, ' ') AS words
          FROM documents WHERE doc_id < 300)
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / element_at / contains / slice / distinct / sort / filter over
    tokenized text arrays."""
    t = load(spark, sf_dir)
    docs = t.documents.where(F.col("doc_id") < 300).select(
        "doc_id", F.split("text", " ").alias("words")
    )
    return docs.select(
        "doc_id",
        F.size("words").alias("n_words"),
        F.element_at("words", 1).alias("first_word"),
        F.array_contains("words", "spark").alias("has_spark"),
        F.concat_ws(" ", F.slice("words", 1, 3)).alias("first3"),
        F.size(F.array_distinct("words")).alias("n_distinct"),
        F.element_at(F.array_sort(F.array_distinct("words")), 1).alias("min_word"),
        F.size(F.filter("words", lambda w: F.length(w) > 5)).alias("n_long_words"),
    )


@register(
    "fn_array_hof",
    oracle="""
    SELECT doc_id,
           len(list_filter(words, w -> length(w) > 8)) > 0          AS has_long,
           len(list_filter(words, w -> length(w) = 0)) = 0          AS all_nonempty,
           CAST(list_sum(list_transform(words, w -> length(w)))
                AS BIGINT)                                          AS total_chars,
           CAST(list_max(list_transform(words, w -> length(w)))
                AS INTEGER)                                         AS max_word_len
    FROM (SELECT doc_id, string_split(text, ' ') AS words
          FROM documents WHERE doc_id < 300)
    """,
)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full higher-order-function quartet as Catalyst expressions:
    exists / forall (short-circuiting predicates), transform -> aggregate
    (map-reduce over an array in ONE projection — the pattern the
    embedding dot products build on). No UDF, no explode: per-row array
    work stays inside whole-stage codegen."""
    t = load(spark, sf_dir)
    docs = t.documents.where(F.col("doc_id") < 300).select(
        "doc_id", F.split("text", " ").alias("words")
    )
    lens = F.transform("words", lambda w: F.length(w))
    return docs.select(
        "doc_id",
        F.exists("words", lambda w: F.length(w) > 8).alias("has_long"),
        F.forall("words", lambda w: F.length(w) > 0).alias("all_nonempty"),
        F.aggregate(lens, F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
            "total_chars"
        ),
        F.array_max(lens).alias("max_word_len"),
    )
