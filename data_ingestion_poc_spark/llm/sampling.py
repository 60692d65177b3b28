"""Sampling operators for training-data pipelines (SURVEY.md section 2
B10 extension family): corpus subsampling, stratified class balancing,
and train/validation splits are the standard steps between 'cleaned
corpus' and 'training mix'.

All three sample by CONTENT HASH (md5 of the row key), not by an RNG
stream: membership is a pure function of the row, so the sample is stable
under repartitioning, re-runs, speculative retries, and incremental
appends — the property that keeps a 100 TB corpus's subsample consistent
across pipeline versions (Spark's seeded .sample() is deterministic only
for a FIXED partitioning). Execution is still scan-local: each task
accepts/rejects its own rows, no shuffle, no ORDER BY rand(). And because
md5 is engine-portable, every query carries a full DuckDB oracle — the
accept/reject decision reproduces bit-for-bit across engines.

Thresholds compare the first two hex chars of the digest (256 buckets):
fraction f maps to the first round(f*256) buckets. The hex alphabet sorts
0-9a-f in both engines, so a plain string compare is the bucket test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import register


def _bucket(prefix: str, col: str = "doc_id"):
    """First-byte md5 bucket ('00'..'ff') of prefix||key — the Spark side
    of the portable hash sampler (oracles use substr(md5(...),1,2))."""
    return F.substring(
        F.md5(F.concat(F.lit(prefix), F.col(col).cast("string")).cast("binary")),
        1,
        2,
    )


@register(
    "sample_bernoulli",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE substr(md5('b:' || CAST(doc_id AS VARCHAR)), 1, 2) < '33'
    """,
)
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli row sampling (~20%: 51/256 md5 buckets), hash-pinned.
    One scan, no shuffle — the only sane way to subsample 100 TB."""
    t = load(spark, sf_dir)
    return t.documents.where(_bucket("b:") < "33").select(
        "doc_id", "lang", "n_chars"
    )


@register(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5('s:' || CAST(doc_id AS VARCHAR)), 1, 2)
          < CASE WHEN lang = 'en' THEN '80' ELSE '1a' END
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-language fractions (en 50% = 128/256
    buckets, others ~10% = 26/256): the class-rebalancing step of a
    training mix. The per-stratum threshold is one CASE over the same
    scan-local hash — no sampleBy RNG stream, no distinct-strata collect
    on the driver."""
    t = load(spark, sf_dir)
    threshold = F.when(F.col("lang") == "en", F.lit("80")).otherwise(F.lit("1a"))
    return t.documents.where(_bucket("s:") < threshold).select(
        "doc_id", "lang", "source"
    )


@register(
    "sample_train_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN substr(md5('t:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                THEN 'train' ELSE 'valid' END AS split
    FROM documents
    """,
)
def sample_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation assignment via content-hash buckets
    (first md5 byte < 0xe6 => train, ~90% = 230/256): unlike randomSplit,
    membership is a PURE FUNCTION of the row, stable under
    repartitioning, re-runs, and incremental appends."""
    t = load(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.when(_bucket("t:") < "e6", "train").otherwise("valid").alias("split"),
    )


#: Exact per-stratum sample size for sample_reservoir_group.
RESERVOIR_K = 20


@register(
    "sample_reservoir_group",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('r:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= {RESERVOIR_K}
    """,
)
def sample_reservoir_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum sampling (eval-set construction: k docs per
    language, uniformly at random but DETERMINISTIC): rank rows inside
    each stratum by a content hash and keep the top k. The hash order is
    a uniform random permutation that is a pure function of the rows —
    the same k survive any repartitioning, retry, or re-run (a true
    reservoir's outcome depends on encounter order, so this is the
    distributed-safe equivalent). One window shuffle on the stratum key;
    Spark plans rk<=k as WindowGroupLimit, so each task keeps k rows per
    stratum, never the full sort."""
    t = load(spark, sf_dir)
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("r:"), F.col("doc_id").cast("string")).cast("binary")),
        "doc_id",
    )
    return (
        t.documents.select(
            "doc_id", "lang", "n_chars", F.row_number().over(w).alias("rk")
        )
        .where(F.col("rk") <= RESERVOIR_K)
        .select("doc_id", "lang", "n_chars")
    )


def _leakage_safe_oracle() -> str:
    from .dedup import _CLUSTERS_ORACLE

    return f"""
    WITH clusters AS (
      SELECT doc_id, cluster_id FROM ({_CLUSTERS_ORACLE}) c
    ),
    labeled AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN clusters c USING (doc_id)
    )
    SELECT doc_id, cluster_id,
           CASE WHEN substr(md5('t:' || CAST(cluster_id AS VARCHAR)), 1, 2) < 'e6'
                THEN 'train' ELSE 'valid' END AS split
    FROM labeled
    """


@register("sample_split_leakage_safe", oracle=_leakage_safe_oracle())
def sample_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/validation split with NEAR-DUP LEAKAGE protection: the hash
    bucket is keyed by the document's duplicate-CLUSTER id (dedup_clusters
    connected components; singletons key by their own doc_id), so every
    group of mutually-similar documents lands on the SAME side. A plain
    per-doc split (sample_train_split) leaks: a near-copy of a training
    document in the validation set inflates eval scores — the
    contamination mode decontamination-against-external-evals
    (corpus_decontaminate) cannot catch because both copies are internal.
    Same 90/10 md5 bucketing as sample_train_split, same determinism
    guarantees (pure function of cluster_id, stable under repartition,
    re-runs, and appends — and stable for UNCHANGED clusters when new
    docs only create new clusters). split is a pure function of
    cluster_id, so intra-cluster consistency holds by construction; the
    cluster map is the near-dup pair graph's node set — orders of
    magnitude smaller than the corpus, so the left join broadcasts or
    AQE-plans cheaply at scale."""
    from .dedup import dedup_clusters

    clusters = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    t = load(spark, sf_dir)
    labeled = (
        t.documents.select("doc_id")
        .join(clusters, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("doc_id")))
    )
    return labeled.select(
        "doc_id",
        "cluster_id",
        F.when(_bucket("t:", "cluster_id") < "e6", "train")
        .otherwise("valid")
        .alias("split"),
    )


#: Weighted-sample size for sample_weighted.
WEIGHTED_K = 100

_WEIGHTED_ORACLE = f"""
    WITH keyed AS (
      SELECT o_orderkey, o_totalprice AS weight,
             ln((CAST('0x' || substr(md5('ws:' || CAST(o_orderkey AS VARCHAR)),
                                     1, 8) AS BIGINT) + 1) / 4294967297.0)
               / o_totalprice AS es_key
      FROM orders
    )
    SELECT o_orderkey, ROUND(weight, 2) AS weight,
           ROUND(es_key, 9) + 0 AS es_key, rk
    FROM (
      SELECT *, row_number() OVER (ORDER BY es_key DESC, o_orderkey) AS rk
      FROM keyed
    ) WHERE rk <= {WEIGHTED_K}
"""


@register("sample_weighted", oracle=_WEIGHTED_ORACLE)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis-Spirakis
    exponential-key trick (Inf. Proc. Letters 2006): each row draws
    u ~ U(0,1), its key is u^(1/w) — keep the k largest keys and you have
    an exact weight-proportional sample. Comparing ln(u)/w (monotone in
    u^(1/w)) avoids the fractional power.

    u comes from md5 of the row key, not an RNG stream (the module-wide
    hash-sampler policy: membership is a pure function of the row, so
    the sample survives repartitioning, retries, and incremental appends;
    every training-mix builder that upsamples high-quality sources by
    weight needs exactly this stability). The top-k runs as
    TakeOrderedAndProject — per-partition heaps then a k-row merge, no
    global sort, no shuffle of the data — so the plan is one scan at any
    corpus size. The 32-bit hash-to-uniform has 1/2^32 granularity;
    (o_orderkey) tiebreaks make the selection total-ordered."""
    t = load(spark, sf_dir)
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("ws:"), F.col("o_orderkey").cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        + 1
    ) / F.lit(4294967297.0)
    keyed = t.orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("weight"),
        (F.log(u) / F.col("o_totalprice")).alias("es_key"),
    )
    topk = keyed.orderBy(F.col("es_key").desc(), "o_orderkey").limit(WEIGHTED_K)
    w = Window.orderBy(F.col("es_key").desc(), "o_orderkey")
    return topk.select(
        "o_orderkey",
        F.round("weight", 2).alias("weight"),
        (F.round("es_key", 9) + F.lit(0.0)).alias("es_key"),
        F.row_number().over(w).alias("rk"),
    )


_CLASS_BALANCE_ORACLE = """
    WITH sized AS (
      SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
    ),
    target AS (SELECT MIN(n) AS floor_n FROM sized),
    ranked AS (
      SELECT e.event_id, e.event_type,
             row_number() OVER (PARTITION BY e.event_type
                                ORDER BY md5('cb:' ||
                                             CAST(e.event_id AS VARCHAR)),
                                         e.event_id) AS rk
      FROM events e
    )
    SELECT r.event_type,
           CAST(s.n AS BIGINT) AS n_rows,
           CAST(t.floor_n AS BIGINT) AS n_kept,
           CAST(s.n - t.floor_n AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN r.rk <= t.floor_n THEN r.event_id ELSE 0 END)
                AS BIGINT) AS kept_id_sum
    FROM ranked r
    JOIN sized s USING (event_type) CROSS JOIN target t
    GROUP BY r.event_type, s.n, t.floor_n
"""


@register("sample_class_balance", oracle=_CLASS_BALANCE_ORACLE)
def sample_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic class-balancing downsample: every event type is
    cut to the MINORITY class's count, members chosen by md5 hash
    order (the sampling.py content-hash convention — stable across
    runs, partitions, and engines, unlike an RNG stream) — the
    rebalancing step before training any classifier on skewed labels.
    Emits the per-class manifest summary (kept/dropped) plus the
    kept-member id-sum as the selection fingerprint (two engines that
    picked different members cannot agree on it).

    Scale shape: class sizes = one combinable count; the per-class
    hash-order cut is one window over the class partitioning (the
    honest cost — ranking within each class; at extreme scale the
    rank swaps for a per-class hash-threshold estimated from the
    counts, trading exactness of k for one less sort). Selection is
    total-ordered (md5, then id) so the kept set is unique."""
    t = load(spark, sf_dir)
    sized = t.events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    target = sized.agg(F.min("n").alias("floor_n"))
    w = Window.partitionBy("event_type").orderBy(
        F.md5(
            F.concat(F.lit("cb:"), F.col("event_id").cast("string")).cast(
                "binary"
            )
        ),
        "event_id",
    )
    ranked = t.events.select(
        "event_id", "event_type", F.row_number().over(w).alias("rk")
    )
    return (
        ranked.join(F.broadcast(sized), "event_type")
        .crossJoin(F.broadcast(target))
        .groupBy("event_type", "n", "floor_n")
        .agg(
            F.sum(
                F.when(F.col("rk") <= F.col("floor_n"), F.col("event_id"))
                .otherwise(0)
            ).cast("bigint").alias("kept_id_sum")
        )
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_rows"),
            F.col("floor_n").cast("bigint").alias("n_kept"),
            (F.col("n") - F.col("floor_n")).cast("bigint").alias("n_dropped"),
            "kept_id_sum",
        )
    )


#: Systematic-sampling stride: keep every K-th row of the hash-ordered
#: stream (a deterministic 1-in-K sample with EXACT per-class rates,
#: unlike Bernoulli whose realized rate wobbles).
SYSTEMATIC_K = 10

_SYSTEMATIC_ORACLE = f"""
    WITH ranked AS (
      SELECT event_id, event_type,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY md5('sys:' ||
                                             CAST(event_id AS VARCHAR)),
                                         event_id) AS rk
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN (rk - 1) % {SYSTEMATIC_K} = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN (rk - 1) % {SYSTEMATIC_K} = 0
                         THEN event_id ELSE 0 END) AS BIGINT) AS kept_id_sum
    FROM ranked GROUP BY event_type
"""


@register("sample_systematic", oracle=_SYSTEMATIC_ORACLE)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic 1-in-{SYSTEMATIC_K} sample per event type: rows are
    ordered by a content hash (md5 of the id under a fixed salt — the
    sampling.py convention) and every {SYSTEMATIC_K}-th row is kept.
    Versus sample_bernoulli this guarantees the EXACT per-class rate
    (ceil(n/K), no realized-rate wobble) with perfectly even coverage
    of the hash order — the classic survey-sampling design, and the
    deterministic analog of evenly-strided shard reads. Emits the
    per-class manifest summary with the kept-id-sum fingerprint
    (engines that picked different members cannot agree on it).

    Scale shape: one window over the class partitioning (the
    sample_class_balance cost shape); selection is total-ordered
    (md5, then id) so the kept set is unique and append-stable."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        F.md5(
            F.concat(F.lit("sys:"), F.col("event_id").cast("string")).cast(
                "binary"
            )
        ),
        "event_id",
    )
    ranked = t.events.select(
        "event_id", "event_type", F.row_number().over(w).alias("rk")
    )
    kept = ((F.col("rk") - 1) % SYSTEMATIC_K) == 0
    return ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(kept, F.col("event_id")).otherwise(0))
        .cast("bigint")
        .alias("kept_id_sum"),
    )


#: Temporal split: train share of the observed time range, then an
#: embargo gap before test (leakage control for time-series models).
TEMPORAL_TRAIN_SHARE = 0.8
TEMPORAL_EMBARGO_HOURS = 24

_TEMPORAL_SPLIT_ORACLE = f"""
    WITH span AS (
      SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM events
    ),
    cut AS (
      SELECT date_trunc('hour',
               lo + to_microseconds(CAST(FLOOR({TEMPORAL_TRAIN_SHARE}
                 * epoch_us(hi - lo)) AS BIGINT))) AS t_cut
      FROM span
    ),
    seg AS (
      SELECT CASE
               WHEN ts <= t_cut THEN 'train'
               WHEN ts <= t_cut + INTERVAL {TEMPORAL_EMBARGO_HOURS} HOUR
                 THEN 'embargo'
               ELSE 'test'
             END AS segment,
             user_id
      FROM events, cut
    ),
    spanning AS (
      SELECT COUNT(*) AS overlap_users FROM (
        SELECT user_id FROM seg WHERE segment = 'train'
        INTERSECT
        SELECT user_id FROM seg WHERE segment = 'test'
      )
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MAX(overlap_users) AS BIGINT) AS train_test_user_overlap
    FROM seg, spanning
    GROUP BY segment
"""


@register("sample_temporal_split", oracle=_TEMPORAL_SPLIT_ORACLE)
def sample_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based train/embargo/test split: train = first
    {TEMPORAL_TRAIN_SHARE:.0%} of the observed range (cut floored to the
    hour), then a {TEMPORAL_EMBARGO_HOURS}h embargo gap, then test —
    the split a forecasting/ranking model needs where
    sample_train_split's hash split would leak the future into
    training and sample_split_leakage_safe's group split would leak
    time. The embargo absorbs label-window lookahead (an event at
    t_cut carries a label computed from t_cut+24h). The
    train/test USER overlap is emitted as context, not a defect —
    temporal splits share users by design; the gap is in TIME.

    Scale/determinism: the cut is a 1-row min/max fold applied as a
    scalar; segments are one CASE over the scan; user counts are exact
    distincts per segment."""
    t = load(spark, sf_dir)
    span = t.events.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    )
    cut = span.select(
        F.date_trunc(
            "hour",
            F.timestamp_micros(
                F.unix_micros("lo")
                + F.floor(
                    TEMPORAL_TRAIN_SHARE
                    * (F.unix_micros("hi") - F.unix_micros("lo"))
                ).cast("bigint")
            ),
        ).alias("t_cut")
    )
    seg = t.events.crossJoin(cut).select(
        F.when(F.col("ts") <= F.col("t_cut"), "train")
        .when(
            F.col("ts")
            <= F.col("t_cut") + F.expr(
                f"INTERVAL {TEMPORAL_EMBARGO_HOURS} HOURS"
            ),
            "embargo",
        )
        .otherwise("test")
        .alias("segment"),
        "user_id",
    )
    overlap = (
        seg.where(F.col("segment") == "train")
        .select("user_id")
        .distinct()
        .join(
            seg.where(F.col("segment") == "test")
            .select("user_id")
            .distinct(),
            "user_id",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("overlap_users"))
    )
    return (
        seg.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .crossJoin(overlap)
        .select(
            "segment",
            "n_events",
            "n_users",
            F.col("overlap_users").alias("train_test_user_overlap"),
        )
    )


#: Total annotation/eval budget Neyman allocation distributes across
#: the language strata.
NEYMAN_BUDGET = 200

_NEYMAN_ORACLE = f"""
    WITH s AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_h,
             CAST(SUM(LENGTH(text)) AS BIGINT) AS s1,
             CAST(SUM(CAST(LENGTH(text) AS BIGINT) * LENGTH(text))
                  AS DECIMAL(38,0)) AS s2
      FROM documents GROUP BY lang
    ),
    sd AS (
      SELECT lang, n_h,
             CAST(FLOOR(SQRT(CAST(s2 AS DOUBLE) / n_h
                             - POWER(CAST(s1 AS DOUBLE) / n_h, 2))
                        * 1000000) AS BIGINT) AS sd_u
      FROM s
    ),
    w AS (
      SELECT lang, n_h, sd_u,
             CAST(n_h AS DECIMAL(38,0)) * sd_u AS w_u,
             CAST(SUM(CAST(n_h AS DECIMAL(38,0)) * sd_u) OVER ()
                  AS DECIMAL(38,0)) AS tot_u
      FROM sd
    )
    SELECT lang, n_h,
           ROUND(sd_u / 1e6, 4) AS stratum_sd,
           CASE WHEN tot_u > 0 THEN
             CAST((CAST({NEYMAN_BUDGET} AS HUGEINT) * CAST(w_u AS HUGEINT)
                   - (CAST({NEYMAN_BUDGET} AS HUGEINT) * CAST(w_u AS HUGEINT))
                     % CAST(tot_u AS HUGEINT))
                  // CAST(tot_u AS HUGEINT) AS BIGINT) END AS n_alloc,
           CASE WHEN tot_u > 0 THEN
             ROUND(CAST(w_u AS DOUBLE) / CAST(tot_u AS DOUBLE), 6)
           END AS alloc_share
    FROM w
    ORDER BY lang
"""


@register("sample_neyman_allocation", oracle=_NEYMAN_ORACLE)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal allocation of a {NEYMAN_BUDGET}-item budget across
    the language strata: n_h proportional to N_h x S_h (stratum size x
    stratum std of doc length) — the variance-minimizing way to spend a
    fixed labeling/eval budget (Neyman 1934), vs sample_stratified's
    equal-rate take: a big HOMOGENEOUS stratum gets fewer slots than
    proportional because more draws there buy almost no variance
    reduction. Run this first to SIZE the strata, then
    sample_reservoir_group to draw exactly those counts.

    Scale/determinism: one combinable pass per stratum (n, sum,
    sum-of-squares with the decimal(38,0) overflow cast); the std
    FLOORS to integer micro-units so the N_h x S_h weights, their
    total, and the floor-division allocation are exact integer
    arithmetic (remainder-subtracted exact division on decimal /
    HUGEINT — see the n_alloc comment); the LANGUAGE
    domain bounds every later frame. Floor allocation under-spends at
    most (strata - 1) items — the documented remainder policy (largest
    -remainder top-up is a 5-row driver-side fix a consumer applies)."""
    t = load(spark, sf_dir)
    ln = F.length("text").cast("bigint")
    s = t.documents.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.sum(ln).cast("bigint").alias("s1"),
        F.sum((ln * ln).cast("decimal(38,0)")).alias("s2"),
    )
    nd = F.col("n_h").cast("double")
    var = F.col("s2").cast("double") / nd - F.pow(
        F.col("s1").cast("double") / nd, 2
    )
    sd = s.select(
        "lang",
        "n_h",
        F.floor(F.sqrt(var) * 1_000_000).cast("bigint").alias("sd_u"),
    )
    w_all = Window.partitionBy()
    # weights in decimal(38,0): N_h (~1e13 docs) x S_u (~1e9 micro-units)
    # wraps a bigint product at 100 TB (overflow doctrine; DuckDB's
    # BIGINT * BIGINT errors rather than widening, so both sides cast)
    w_u = F.col("n_h").cast("decimal(38,0)") * F.col("sd_u")
    w = sd.select(
        "lang",
        "n_h",
        "sd_u",
        w_u.alias("w_u"),
        F.sum(w_u).over(w_all).cast("decimal(38,0)").alias("tot_u"),
    )
    _NEYMAN_NUM = F.lit(NEYMAN_BUDGET).cast("decimal(38,0)") * F.col("w_u")
    return w.select(
        "lang",
        "n_h",
        F.round(F.col("sd_u") / 1e6, 4).alias("stratum_sd"),
        # exact floor division on the decimal weights (the
        # agg_page_hinkley construction): Spark's decimal/decimal
        # division rounds HALF_UP to its result scale BEFORE F.floor,
        # and DuckDB's decimal / degrades to a double quotient — a
        # quotient within ~5e-7 of an integer would allocate off-by-one
        # between engines. Subtracting the remainder first makes the
        # division exact in both (all operands non-negative here, so
        # remainder == pmod); DuckDB does the same on HUGEINT.
        # NULL when every stratum has zero spread (allocation undefined;
        # ANSI mode would raise DIVIDE_BY_ZERO)
        F.when(
            F.col("tot_u") > 0,
            (
                (_NEYMAN_NUM - F.pmod(_NEYMAN_NUM, F.col("tot_u")))
                / F.col("tot_u")
            ).cast("bigint"),
        ).alias("n_alloc"),
        F.when(
            F.col("tot_u") > 0,
            F.round(
                F.col("w_u").cast("double") / F.col("tot_u").cast("double"),
                6,
            ),
        ).alias("alloc_share"),
    ).orderBy("lang")
