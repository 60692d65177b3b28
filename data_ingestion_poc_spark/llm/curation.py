"""Corpus-curation scoring operators beyond the Gopher battery.

Reference parity: the reference repo (an 802-LoC file-ETL) has no text
analytics; these extend SURVEY.md section 2 Part C's LLM-pipeline
surface with the statistical quality signals curation teams layer on
top of rule batteries: readability (Flesch), rank-frequency (Zipf) fit
per source, and lexical diversity (type-token ratio / hapax fraction).

All three are single-scan shapes: per-document Column expressions or
explode -> map-side-combinable COUNT aggregates. Nothing here shuffles
document text; shuffles carry (doc_id|source, word, count) rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import register

#: Vowel-group regex: one syllable per maximal [aeiouy]+ run. The
#: standard cheap heuristic (true syllabification needs a dictionary);
#: consistent across engines because both regex these exact runs.
SYLLABLE_RE = "[aeiouy]+"

#: Zipf fit uses the top-K ranks per source; the classic power law only
#: holds for head ranks, and a fixed K makes the OLS deterministic.
ZIPF_TOP_K = 100

_READABILITY_ORACLE = f"""
    WITH m AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS wc,
             greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS sc,
             len(regexp_extract_all(lower(text), '{SYLLABLE_RE}')) AS syl
      FROM documents
    )
    SELECT doc_id,
           CAST(wc AS BIGINT) AS wc,
           CAST(sc AS BIGINT) AS n_sentences,
           CAST(syl AS BIGINT) AS n_syllables,
           ROUND(206.835 - 1.015 * (wc / CAST(sc AS DOUBLE))
                 - 84.6 * (syl / CAST(wc AS DOUBLE)), 4) AS flesch_ease,
           ROUND(0.39 * (wc / CAST(sc AS DOUBLE))
                 + 11.8 * (syl / CAST(wc AS DOUBLE)) - 15.59, 4)
             AS fk_grade
    FROM m
"""


@register("text_readability", oracle=_READABILITY_ORACLE)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade per document, with the
    vowel-group syllable heuristic (one syllable per maximal [aeiouy]+
    run) and sentence count from terminal-punctuation runs (floor 1 —
    this synthetic corpus is unpunctuated, so every doc is one
    "sentence" and the words-per-sentence term degenerates to word
    count; on punctuated text the same expression splits properly).
    Readability is a standard curation feature: C4/FineWeb-class
    pipelines bucket documents by grade level to tune mixtures.

    Scale shape: one scan, zero shuffles — three regexp counts and two
    arithmetic scores per row, all JVM Column expressions inside one
    WholeStageCodegen span. The cheapest kind of corpus pass."""
    t = load(spark, sf_dir)
    words = F.split("text", " ")
    wc = F.size(words)
    sc = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), F.lit(0)))
    )
    syl = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(SYLLABLE_RE), F.lit(0))
    )
    wps = wc.cast("double") / sc.cast("double")
    spw = syl.cast("double") / wc.cast("double")
    return t.documents.select(
        "doc_id",
        wc.cast("bigint").alias("wc"),
        sc.cast("bigint").alias("n_sentences"),
        syl.cast("bigint").alias("n_syllables"),
        F.round(206.835 - 1.015 * wps - 84.6 * spw, 4).alias("flesch_ease"),
        F.round(0.39 * wps + 11.8 * spw - 15.59, 4).alias("fk_grade"),
    )


_ZIPF_ORACLE = f"""
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    freq AS (
      SELECT source, w, COUNT(*) AS cnt
      FROM tok WHERE w <> '' GROUP BY source, w
    ),
    ranked AS (
      SELECT source, w, cnt,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY cnt DESC, w) AS rnk,
             COUNT(*) OVER (PARTITION BY source) AS vocab
      FROM freq
    )
    SELECT source,
           CAST(MAX(vocab) AS BIGINT) AS vocab,
           CAST(COUNT(*) AS BIGINT) AS n_ranks,
           ROUND(regr_slope(ln(cnt), ln(rnk)), 4) AS zipf_slope,
           ROUND(regr_intercept(ln(cnt), ln(rnk)), 4) AS zipf_intercept,
           ROUND(regr_r2(ln(cnt), ln(rnk)), 4) AS zipf_r2
    FROM ranked
    WHERE rnk <= {ZIPF_TOP_K}
    GROUP BY source
"""


@register("text_zipf_fit", oracle=_ZIPF_ORACLE)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per source: token rank-frequency tables, then an
    OLS of ln(count) on ln(rank) over the top-ZIPF_TOP_K ranks — slope near -1
    with high R² is the signature of natural language; a flat or ragged
    fit flags boilerplate-heavy, templated, or machine-generated
    sources. A corpus-health diagnostic run per ingest source
    (Heaps/Zipf checks appear in C4 and CCNet postmortems).

    Scale shape: explode -> (source, word) COUNT is map-side combinable
    (the shuffle carries partial counts, never token streams); the
    rank window partitions by source over the VOCABULARY table (bounded
    by corpus vocab, not corpus size); the regression aggregates 100
    points per source via Spark's native regr_* aggregates. The
    (cnt DESC, w) tiebreak makes ranks deterministic cross-engine."""
    t = load(spark, sf_dir)
    toks = t.documents.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).where(F.col("w") != "")
    freq = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("cnt"))
    rw = Window.partitionBy("source").orderBy(F.desc("cnt"), F.asc("w"))
    ranked = freq.select(
        "source",
        "cnt",
        F.row_number().over(rw).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("vocab"),
    )
    ly, lx = F.log(F.col("cnt").cast("double")), F.log(
        F.col("rnk").cast("double")
    )
    return (
        ranked.where(F.col("rnk") <= ZIPF_TOP_K)
        .groupBy("source")
        .agg(
            F.max("vocab").cast("bigint").alias("vocab"),
            F.count(F.lit(1)).alias("n_ranks"),
            F.round(F.regr_slope(ly, lx), 4).alias("zipf_slope"),
            F.round(F.regr_intercept(ly, lx), 4).alias("zipf_intercept"),
            F.round(F.regr_r2(ly, lx), 4).alias("zipf_r2"),
        )
    )


_TTR_ORACLE = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    freq AS (
      SELECT doc_id, w, COUNT(*) AS cnt
      FROM tok WHERE w <> '' GROUP BY doc_id, w
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           ROUND(COUNT(*) / CAST(SUM(cnt) AS DOUBLE), 4) AS ttr,
           ROUND(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS hapax_frac
    FROM freq
    GROUP BY doc_id
"""


@register("text_ttr", oracle=_TTR_ORACLE)
def text_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per document: type-token ratio (distinct words
    over total words) and hapax-legomena fraction (share of the doc's
    vocabulary used exactly once). Low TTR flags keyword-stuffed or
    looping machine text (the signal text_repetition_filter thresholds;
    this emits the raw score for mixture tuning), while hapax fraction
    near 1 on a LONG doc flags word-salad.

    Scale shape: explode -> (doc_id, word) COUNT with map-side partial
    aggregation, then a doc-level re-aggregate of the count table —
    two combinable aggregations, shuffle rows bounded by per-doc vocab.
    No text ever shuffles, no UDFs, no windows."""
    t = load(spark, sf_dir)
    toks = t.documents.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).where(F.col("w") != "")
    freq = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("cnt"))
    one = F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
    return freq.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        one.cast("bigint").alias("n_hapax"),
        F.round(F.count(F.lit(1)) / F.sum("cnt").cast("double"), 4).alias(
            "ttr"
        ),
        F.round(one / F.count(F.lit(1)).cast("double"), 4).alias(
            "hapax_frac"
        ),
    )


#: Heaps'-law fit: vocabulary growth sampled at HEAPS_BUCKETS points of
#: the doc_id-ordered corpus prefix.
HEAPS_BUCKETS = 10

_HEAPS_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, text,
             row_number() OVER (ORDER BY doc_id) AS rn,
             COUNT(*) OVER () AS n
      FROM documents
    ),
    db AS (
      SELECT doc_id, text,
             CAST((rn - 1) * {HEAPS_BUCKETS} // n + 1 AS BIGINT) AS bucket
      FROM d
    ),
    tok AS (
      SELECT bucket, unnest(string_split(lower(text), ' ')) AS w FROM db
    ),
    toks AS (SELECT bucket, w FROM tok WHERE w <> ''),
    bt AS (SELECT bucket, COUNT(*) AS n_tokens FROM toks GROUP BY bucket),
    fw AS (SELECT w, MIN(bucket) AS fb FROM toks GROUP BY w),
    nv AS (SELECT fb AS bucket, COUNT(*) AS n_new FROM fw GROUP BY fb),
    cum AS (
      SELECT bt.bucket,
             SUM(bt.n_tokens) OVER (ORDER BY bt.bucket) AS cum_tokens,
             SUM(COALESCE(nv.n_new, 0)) OVER (ORDER BY bt.bucket)
               AS cum_vocab
      FROM bt LEFT JOIN nv ON nv.bucket = bt.bucket
    ),
    fit AS (
      SELECT regr_slope(ln(cum_vocab), ln(cum_tokens)) AS beta,
             exp(regr_intercept(ln(cum_vocab), ln(cum_tokens))) AS k
      FROM cum
    )
    SELECT bucket,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(cum_vocab AS BIGINT) AS cum_vocab,
           ROUND(beta, 4) + 0 AS heaps_beta,
           ROUND(k, 4) + 0 AS heaps_k
    FROM cum, fit
"""


@register("corpus_heaps_law", oracle=_HEAPS_ORACLE)
def corpus_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve with fitted exponent: the
    corpus is cut into HEAPS_BUCKETS prefix buckets in doc_id order,
    each bucket reports CUMULATIVE tokens and CUMULATIVE distinct
    vocabulary, and an OLS of ln(V) on ln(T) estimates V = k * T^beta
    (natural language: beta ~ 0.5-0.8; a saturating curve flags a
    closed template vocabulary, runaway beta ~ 1 flags id-like token
    noise). With text_zipf_fit this completes the pair of corpus-scale
    health diagnostics CCNet-class pipelines run per crawl snapshot.

    The distributed trick is counting cumulative DISTINCTs without
    rescanning prefixes: a word's contribution is its FIRST bucket
    (min over one map-side-combinable aggregate), so cumulative vocab
    is a running sum over per-bucket first-occurrence counts — the
    shuffle carries (word, min_bucket) once, never per-prefix sets.
    Token counts shuffle as {HEAPS_BUCKETS} partials; the final window
    and regression run over {HEAPS_BUCKETS} rows. Bucket assignment
    ranks docs with sorts.global_row_number (two-phase range partition
    + broadcast offsets), NOT a global-ORDER BY window — the audit
    would rightly flag that Exchange SinglePartition; the corpus total
    is a 1-row aggregate broadcast back."""
    from ..operators.sorts import global_row_number

    t = load(spark, sf_dir)
    n1 = t.documents.agg(F.count(F.lit(1)).alias("n"))
    d = global_row_number(
        t.documents.select("doc_id", "text"), ["doc_id"], "rn"
    )
    db = d.crossJoin(F.broadcast(n1)).select(
        "text",
        (
            F.floor((F.col("rn") - 1) * HEAPS_BUCKETS / F.col("n")) + 1
        ).cast("bigint").alias("bucket"),
    )
    toks = db.select(
        "bucket", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).where(F.col("w") != "")
    bt = toks.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_tokens"))
    nv = (
        toks.groupBy("w")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    wcum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = (
        bt.join(nv, "bucket", "left")
        .select(
            "bucket",
            F.sum("n_tokens").over(wcum).alias("cum_tokens"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0))).over(wcum).alias(
                "cum_vocab"
            ),
        )
    )
    ly = F.log(F.col("cum_vocab").cast("double"))
    lx = F.log(F.col("cum_tokens").cast("double"))
    fit = cum.agg(
        F.regr_slope(ly, lx).alias("beta"),
        F.exp(F.regr_intercept(ly, lx)).alias("k"),
    )
    return cum.crossJoin(F.broadcast(fit)).select(
        "bucket",
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        F.col("cum_vocab").cast("bigint").alias("cum_vocab"),
        # + 0.0 folds IEEE negative zero (a saturated-vocab slope is an
        # ~1e-17 epsilon whose SIGN depends on parallel summation order)
        (F.round("beta", 4) + 0.0).alias("heaps_beta"),
        (F.round("k", 4) + 0.0).alias("heaps_k"),
    )


#: Novelty n-gram width: 3-shingles over whitespace tokens (the
#: dedup_ngram_jaccard shingle, reused as a novelty unit).
NOVELTY_N = 3

_NOVELTY_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    sh AS (
      SELECT doc_id,
             ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS g
      FROM tok, LATERAL (
        SELECT unnest(range(1, len(ws) - {NOVELTY_N} + 2)) AS i)
      WHERE len(ws) >= {NOVELTY_N}
    ),
    dsh AS (SELECT DISTINCT doc_id, g FROM sh),
    firstg AS (SELECT g, MIN(doc_id) AS first_doc FROM dsh GROUP BY g)
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           floor(SUM(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE) * 10000) / 10000 AS novelty
    FROM dsh d JOIN firstg f ON f.g = d.g
    GROUP BY d.doc_id
"""


@register("text_ngram_novelty", oracle=_NOVELTY_ORACLE)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct word
    3-grams whose FIRST appearance (in doc_id order) is in this doc —
    "how much content does this document add to the corpus so far".
    Novelty ~ 0 marks late near-copies and boilerplate carriers
    (complementing dedup_ngram_jaccard, which scores PAIRS — novelty is
    the cheaper corpus-ORDER signal dedup-aware samplers weight by:
    RefinedWeb-style pipelines prefer high-novelty docs when trimming
    to a token budget).

    Scale shape: the same shingle explode as the dedup family, then two
    map-side-combinable aggregates — MIN(doc_id) per gram (the
    first-occurrence table, corpus-vocabulary-sized) joined back on the
    gram key, and a per-doc conditional count. No quadratic pair space
    anywhere: novelty is a property of the (gram, first_doc) index, so
    hot boilerplate grams cost one index row however often they recur.
    Ratio floored at 4 dp (integer-ratio tie convention)."""
    t = load(spark, sf_dir)
    ws = F.split(F.lower("text"), " ")
    n = F.size(ws)
    grams = (
        t.documents.select("doc_id", ws.alias("ws"))
        .where(F.size("ws") >= NOVELTY_N)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - NOVELTY_N + 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("ws", i),
                        F.element_at("ws", i + 1),
                        F.element_at("ws", i + 2),
                    ),
                )
            ).alias("g"),
        )
        .distinct()
    )
    firstg = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        grams.join(firstg, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            novel.alias("n_novel"),
            (
                F.floor(novel / F.count(F.lit(1)).cast("double") * 10000)
                / 10000
            ).alias("novelty"),
        )
    )
