"""Sampling operators for training-data pipelines (SURVEY.md section 2
B10 extension family): corpus subsampling, stratified class balancing,
and train/validation splits are the standard steps between 'cleaned
corpus' and 'training mix'.

All three are rows-only checks: Spark's samplers are deterministic given
(seed, input partitioning) — the same plan yields the same sample, which
is exactly the reproducibility property a training pipeline needs — but
the accept/reject stream is Spark-specific, so no cross-engine SQL can
reproduce it. Tests pin determinism and statistical bounds instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

SEED = 42


@register("sample_bernoulli", oracle=None)
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli row sampling (~20%), seed-pinned. One scan, no shuffle:
    each task accepts/rejects its own rows — the only sane way to
    subsample 100 TB (never ORDER BY rand() LIMIT n, which is a global
    sort)."""
    t = load(spark, sf_dir)
    return t.documents.sample(fraction=0.2, seed=SEED).select(
        "doc_id", "lang", "n_chars"
    )


@register("sample_stratified", oracle=None)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-language fractions (sampleBy): the
    class-rebalancing step of a training mix. Same scan-local execution
    as sample_bernoulli; fractions are the knob a data mixer tunes."""
    t = load(spark, sf_dir)
    langs = [r["lang"] for r in t.documents.select("lang").distinct().collect()]
    fractions = {lang: (0.5 if lang == "en" else 0.1) for lang in langs}
    return t.documents.sampleBy("lang", fractions=fractions, seed=SEED).select(
        "doc_id", "lang", "source"
    )


@register("sample_train_split", oracle=None)
def sample_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation assignment via content-hash ranges
    (hash mod 100 < 90 => train): unlike randomSplit, membership is a
    PURE FUNCTION of the row, so it is stable under repartitioning,
    re-runs, and incremental appends — the property that keeps a 100 TB
    corpus's split consistent across pipeline versions."""
    t = load(spark, sf_dir)
    bucket = F.pmod(F.xxhash64("doc_id"), F.lit(100))
    return t.documents.select(
        "doc_id",
        F.when(bucket < 90, "train").otherwise("valid").alias("split"),
    )
