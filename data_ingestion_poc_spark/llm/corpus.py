"""Corpus-cleaning composition queries: the end-to-end shapes a training-
data pipeline actually runs, built by COMPOSING the registered dedup and
text-analysis operators (dedup_exact_hash, dedup_clusters,
text_quality_score, text_lang_id) rather than re-deriving their logic —
the test that the operator surface composes.

Reference lineage: the reference's pipeline is exactly such a composition
(fetch -> verify -> dedup -> sink, child.py:128-221); these queries are
the corpus-level analog over `documents`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import register
from .dedup import _CLUSTERS_ORACLE, dedup_clusters
from .textstats import _STOP_SQL, STOPWORDS

# The near-dup cluster CTE chain, reusable inside larger oracles: strip the
# recursive keyword and final SELECT from _CLUSTERS_ORACLE's text.
_CLUSTER_CTES = _CLUSTERS_ORACLE.strip().removeprefix("WITH RECURSIVE").rsplit(
    "SELECT l.doc_id", 1
)[0].rstrip().rstrip(",")


@register(
    "corpus_dedup_keep",
    oracle=f"""
    WITH RECURSIVE {_CLUSTER_CTES},
    near_drop AS (
      SELECT src AS doc_id FROM (
        SELECT src, LEAST(src, MIN(dst)) AS cluster_id FROM reach GROUP BY src
      ) WHERE doc_id <> cluster_id
    ),
    exact_drop AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (PARTITION BY sha256(lower(text))
                                  ORDER BY doc_id) AS rn
        FROM documents
      ) WHERE rn > 1
    )
    SELECT d.doc_id,
           CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN n.doc_id IS NOT NULL THEN 'near_dup'
                ELSE 'kept' END AS status
    FROM documents d
    LEFT JOIN exact_drop e ON e.doc_id = d.doc_id
    LEFT JOIN near_drop n ON n.doc_id = d.doc_id
    """,
)
def corpus_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep/drop resolution for the whole corpus: exact duplicates drop to
    their min-doc_id keeper (dedup_exact_hash policy), near-dup cluster
    members drop to the cluster canonical (dedup_clusters), everything
    else is kept. Exact beats near when both apply — the same precedence
    a real pipeline uses (exact dedup runs first because it is cheapest).
    One hash window + one broadcast-sized flag join per drop reason; the
    expensive cluster build is the dedup_clusters operator itself."""
    t = load(spark, sf_dir)
    w = Window.partitionBy(F.sha2(F.lower("text").cast("binary"), 256)).orderBy(
        "doc_id"
    )
    exact_drop = (
        t.documents.select("doc_id", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") > 1)
        .select("doc_id")
        .withColumn("is_exact", F.lit(True))
    )
    near_drop = (
        dedup_clusters(spark, sf_dir)
        .where(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
        .withColumn("is_near", F.lit(True))
    )
    return (
        t.documents.select("doc_id")
        .join(F.broadcast(exact_drop), "doc_id", "left")
        .join(F.broadcast(near_drop), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_exact"), "exact_dup")
            .when(F.col("is_near"), "near_dup")
            .otherwise("kept")
            .alias("status"),
        )
    )


@register(
    "corpus_quality_filter",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             floor((
               0.4 * least(len(string_split(text, ' ')) / 200.0, 1.0)
             + 0.3 * (len(list_filter(string_split(text, ' '),
                                      w -> w IN ({_STOP_SQL})))
                      / CAST(len(string_split(text, ' ')) AS DOUBLE))
             + 0.3 * (len(list_distinct(string_split(text, ' ')))
                      / CAST(len(string_split(text, ' ')) AS DOUBLE))) * 10000)
               / 10000 AS quality,
             length(text) >= 100 AND length(text) <= 2000 AS len_ok,
             CASE WHEN len(list_filter(string_split(text, ' '),
                                       w -> w IN ({_STOP_SQL})))
                       / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.05
                  THEN 'en' ELSE 'unknown' END AS lang_guess
      FROM documents
    )
    SELECT s.doc_id, s.quality, s.lang_guess, d.source
    FROM scored s JOIN documents d USING (doc_id)
    WHERE s.quality >= 0.28 AND s.len_ok
    """,
)
def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate: keep docs whose heuristic score clears 0.28 (the
    corpus median) AND whose length is in-band, carrying the language
    guess and source for downstream mixture accounting. Composes the
    text_quality_score and text_lang_id column logic in ONE scan of
    documents — no join between the two scorers, they are expressions
    over the same row."""
    t = load(spark, sf_dir)
    words = F.split("text", " ")
    n_words = F.size(words).cast("double")
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    n_distinct = F.size(F.array_distinct(words))
    raw = (
        0.4 * F.least(F.size(words) / F.lit(200.0), F.lit(1.0))
        + 0.3 * (n_stop / n_words)
        + 0.3 * (n_distinct / n_words)
    )
    quality = F.floor(raw * 10000) / 10000
    lang_guess = F.when((n_stop / n_words) >= 0.05, "en").otherwise("unknown")
    len_ok = (F.length("text") >= 100) & (F.length("text") <= 2000)
    return (
        t.documents.select(
            "doc_id",
            "source",
            quality.alias("quality"),
            lang_guess.alias("lang_guess"),
            len_ok.alias("len_ok"),
        )
        .where((F.col("quality") >= 0.28) & F.col("len_ok"))
        .select("doc_id", "quality", "lang_guess", "source")
    )
