"""Model-evaluation metrics over scored events: ROC AUC, Brier
decomposition, log loss, precision/recall thresholds, lift deciles.

Reference parity: the reference ETL (child.py) has no evaluation
surface; this extends SURVEY.md section 2 Part C's calibration family
(agg_calibration_ece) into the full binary-classifier report a
training-data pipeline runs on every quality/routing model before its
scores gate the corpus (filter thresholds, dedup keepers, mix weights
all consume such scores). The score column here is the SAME
deterministic logistic of event value as agg_calibration_ece — a real
model column drops in unchanged; the label is the purchase outcome.

Cross-engine determinism doctrine (stats.py): predictions quantize to
integer micro-units (p_u = round(p*1e6)) so every sum is a sum of
exact integers; rank arithmetic runs on the quantized-score DOMAIN
(<= 1e6+1 distinct values — bounded, so the ordering window is over a
domain-sized frame, never a data-sized one); doubles appear only in
final single-expression divisions written identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import register

#: The shared deterministic score: P(purchase) as a logistic of value —
#: identical to agg_calibration_ece's recipe (stats.py) so every metric
#: in the family grades the SAME model.
_SCORE_SQL = "1 / (1 + exp(-(value - 50) / 20.0))"


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> (y, p_u): binary purchase label + micro-unit score."""
    t = load(spark, sf_dir)
    p = 1 / (1 + F.exp(-(F.col("value") - 50) / 20.0))
    return t.events.select(
        (F.col("event_type") == "purchase").cast("int").alias("y"),
        F.round(p * 1_000_000).cast("bigint").alias("p_u"),
    )


_SCORED_CTE = f"""
    WITH scored AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             CAST(ROUND(({_SCORE_SQL}) * 1000000) AS BIGINT) AS p_u
      FROM events
    )
"""

_AUC_ORACLE = f"""
    {_SCORED_CTE},
    g AS (
      SELECT p_u, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos
      FROM scored GROUP BY p_u
    ),
    r AS (
      SELECT pos,
             SUM(n) OVER (ORDER BY p_u
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) - n AS cum_before,
             n
      FROM g
    ),
    s AS (
      SELECT CAST(SUM(pos * (2 * cum_before + n + 1)) AS BIGINT)
               AS two_rank_sum,
             CAST(SUM(pos) AS BIGINT) AS npos,
             CAST(SUM(n - pos) AS BIGINT) AS nneg
      FROM r
    )
    SELECT npos AS n_pos, nneg AS n_neg,
           ROUND((two_rank_sum / 2.0 - npos * (npos + 1) / 2.0)
                 / (npos * CAST(nneg AS DOUBLE)), 6) AS auc
    FROM s
"""


@register("agg_auc_roc", oracle=_AUC_ORACLE)
def agg_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the purchase-probability score via the Mann-Whitney
    rank identity: AUC = (R+ - n+(n+1)/2) / (n+ n-), with average ranks
    for ties — the probability a random positive outscores a random
    negative, the one-number discrimination check that complements
    agg_calibration_ece's calibration check (a model can be perfectly
    calibrated and useless, or sharp and miscalibrated; you read both).

    Scale/determinism: scores quantize to micro-units, so the rank
    window runs over the QUANTIZED DOMAIN (<= 1e6+1 rows after the
    groupBy — bounded regardless of corpus size; the 100 TB form of
    every rank-based metric). Tie handling is exact: a tied group's
    doubled average rank 2*cum_before + n + 1 keeps every sum integer
    until the single final division."""
    g = _scored(spark, sf_dir).groupBy("p_u").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    w = Window.orderBy("p_u").rowsBetween(Window.unboundedPreceding, 0)
    r = g.select(
        "pos",
        "n",
        (F.sum("n").over(w) - F.col("n")).alias("cum_before"),
    )
    s = r.agg(
        F.sum(
            F.col("pos") * (2 * F.col("cum_before") + F.col("n") + 1)
        ).cast("bigint").alias("two_rank_sum"),
        F.sum("pos").cast("bigint").alias("npos"),
        F.sum(F.col("n") - F.col("pos")).cast("bigint").alias("nneg"),
    )
    return s.select(
        F.col("npos").alias("n_pos"),
        F.col("nneg").alias("n_neg"),
        F.round(
            (F.col("two_rank_sum") / 2.0 - F.col("npos") * (F.col("npos") + 1) / 2.0)
            / (F.col("npos") * F.col("nneg").cast("double")),
            6,
        ).alias("auc"),
    )


#: Reliability-diagram bucket count shared with agg_calibration_ece.
BRIER_BUCKETS = 10

_BRIER_ORACLE = f"""
    {_SCORED_CTE},
    b AS (
      SELECT LEAST(p_u * {BRIER_BUCKETS} // 1000000, {BRIER_BUCKETS - 1})
               AS bucket,
             COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos,
             CAST(SUM(p_u) AS BIGINT) AS sp,
             SUM(CAST((p_u - y * 1000000) * (p_u - y * 1000000)
                      AS HUGEINT)) AS sq
      FROM scored GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(pos) AS BIGINT) AS post,
             CAST(SUM(sq) AS DOUBLE) AS sqt
      FROM b
    )
    SELECT nt AS n,
           ROUND(sqt / 1e12 / nt, 6) AS brier,
           ROUND(SUM(n * POWER(sp / 1e6 / n - pos / CAST(n AS DOUBLE), 2))
                 / nt, 6) AS reliability,
           ROUND(SUM(n * POWER(pos / CAST(n AS DOUBLE)
                               - post / CAST(nt AS DOUBLE), 2))
                 / nt, 6) AS resolution,
           ROUND((post / CAST(nt AS DOUBLE))
                 * (1 - post / CAST(nt AS DOUBLE)), 6) AS uncertainty
    FROM b, tot
    GROUP BY nt, post, sqt
"""


@register("agg_brier_score", oracle=_BRIER_ORACLE)
def agg_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score with the Murphy decomposition: mean squared error of
    the probability forecast, split into reliability (bucketed
    calibration gap — agg_calibration_ece's quantity, squared and
    n-weighted), resolution (how far bucket outcome rates stray from
    the base rate — the part you WANT large), and uncertainty (base
    rate variance, the irreducible floor). Brier ~= reliability -
    resolution + uncertainty over the bucketed forecasts.

    Scale/determinism: the squared error sums as exact integers in
    micro-unit^2 (DECIMAL/HUGEINT — a 6e9-row corpus would pass 2^63),
    onto the {BRIER_BUCKETS}-bucket domain; decomposition terms are
    single divisions over bucket aggregates."""
    scored = _scored(spark, sf_dir)
    dev = F.col("p_u") - F.col("y") * 1_000_000
    b = scored.groupBy(
        F.least(
            (F.col("p_u") * BRIER_BUCKETS / 1_000_000).cast("bigint"),
            F.lit(BRIER_BUCKETS - 1),
        ).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
        F.sum("p_u").cast("bigint").alias("sp"),
        F.sum((dev * dev).cast("decimal(38,0)")).alias("sq"),
    )
    tot = b.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("pos").cast("bigint").alias("post"),
        F.sum("sq").cast("double").alias("sqt"),
    )
    base = F.col("post") / F.col("nt").cast("double")
    out = (
        b.crossJoin(tot)
        .groupBy("nt", "post", "sqt")
        .agg(
            F.round(
                F.sum(
                    F.col("n")
                    * F.pow(
                        F.col("sp") / 1e6 / F.col("n")
                        - F.col("pos") / F.col("n").cast("double"),
                        2,
                    )
                )
                / F.max("nt"),
                6,
            ).alias("reliability"),
            F.round(
                F.sum(
                    F.col("n")
                    * F.pow(
                        F.col("pos") / F.col("n").cast("double")
                        - F.col("post") / F.col("nt").cast("double"),
                        2,
                    )
                )
                / F.max("nt"),
                6,
            ).alias("resolution"),
        )
    )
    return out.select(
        F.col("nt").alias("n"),
        F.round(F.col("sqt") / 1e12 / F.col("nt"), 6).alias("brier"),
        "reliability",
        "resolution",
        F.round(base * (1 - base), 6).alias("uncertainty"),
    )


#: ln clamp for p in {0,1} — same boundary policy as privacy_dp_counts'
#: ln(0) clamp: micro-unit probabilities clamp to [1, 999999].
_LL_LO = 1
_LL_HI = 999_999

_LOGLOSS_ORACLE = f"""
    {_SCORED_CTE},
    c AS (
      SELECT y,
             GREATEST({_LL_LO}, LEAST({_LL_HI}, p_u)) / 1e6 AS p
      FROM scored
    ),
    terms AS (
      SELECT y,
             CAST(FLOOR(-(y * ln(p) + (1 - y) * ln(1 - p)) * 1000000)
                  AS BIGINT) AS t_u
      FROM c
    ),
    s AS (
      SELECT COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos,
             CAST(SUM(t_u) AS BIGINT) AS st
      FROM terms
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(st / 1e6 / n, 6) AS log_loss,
           ROUND(-((pos / CAST(n AS DOUBLE)) * ln(pos / CAST(n AS DOUBLE))
                   + (1 - pos / CAST(n AS DOUBLE))
                     * ln(1 - pos / CAST(n AS DOUBLE))), 6)
             AS baseline_entropy,
           ROUND(1 - (st / 1e6 / n)
                 / -((pos / CAST(n AS DOUBLE)) * ln(pos / CAST(n AS DOUBLE))
                     + (1 - pos / CAST(n AS DOUBLE))
                       * ln(1 - pos / CAST(n AS DOUBLE))), 6) AS skill
    FROM s
"""


@register("agg_log_loss", oracle=_LOGLOSS_ORACLE)
def agg_log_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-entropy of the probability forecast plus the skill score
    against the constant base-rate predictor (1 - LL/H(base)): the
    proper scoring rule that punishes confident wrongness harder than
    Brier, and the skill normalization that makes it readable (0 = no
    better than predicting the base rate every time, 1 = perfect).

    Scale/determinism: per-event ln terms compute on micro-unit-derived
    doubles (identical in both engines), floor to integer micro-units
    and sum exactly (theil/markov precedent); probabilities clamp to
    [1e-6, 1-1e-6] before ln (dp_counts boundary policy); baseline
    entropy is a single closed-form expression of the exact counts."""
    scored = _scored(spark, sf_dir)
    p = (
        F.greatest(F.lit(_LL_LO), F.least(F.lit(_LL_HI), F.col("p_u"))) / 1e6
    )
    t_u = F.floor(
        -(F.col("y") * F.log(p) + (1 - F.col("y")) * F.log(1 - p)) * 1_000_000
    ).cast("bigint")
    s = scored.select(F.col("y"), t_u.alias("t_u")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
        F.sum("t_u").cast("bigint").alias("st"),
    )
    base = F.col("pos") / F.col("n").cast("double")
    h_base = -(base * F.log(base) + (1 - base) * F.log(1 - base))
    ll = F.col("st") / 1e6 / F.col("n")
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(ll, 6).alias("log_loss"),
        F.round(h_base, 6).alias("baseline_entropy"),
        F.round(1 - ll / h_base, 6).alias("skill"),
    )


#: Decision thresholds priced by the PR report.
PR_THRESHOLDS = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)

_PR_ORACLE = f"""
    {_SCORED_CTE},
    tot AS (
      SELECT COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos FROM scored
    )
    SELECT tau,
           CAST(SUM(CASE WHEN p_u >= tau * 1000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS predicted_pos,
           CAST(SUM(CASE WHEN p_u >= tau * 1000000 THEN y ELSE 0 END)
                AS BIGINT) AS true_pos,
           ROUND(SUM(CASE WHEN p_u >= tau * 1000000 THEN y ELSE 0 END)
                 / NULLIF(CAST(SUM(CASE WHEN p_u >= tau * 1000000
                                        THEN 1 ELSE 0 END) AS DOUBLE), 0),
                 6) AS precision,
           ROUND(SUM(CASE WHEN p_u >= tau * 1000000 THEN y ELSE 0 END)
                 / CAST(MAX(pos) AS DOUBLE), 6) AS recall
    FROM scored, tot,
         (VALUES {", ".join(f"({t})" for t in PR_THRESHOLDS)}) AS taus(tau)
    GROUP BY tau ORDER BY tau
"""


@register("agg_pr_thresholds", oracle=_PR_ORACLE)
def agg_pr_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall at the nine decision thresholds {PR_THRESHOLDS}
    — the operating table a curation team reads to SET a score cutoff
    (the classifier twin of dedup_threshold_sweep's similarity sweep):
    each row prices one threshold's kept-volume vs purity trade.

    Scale/determinism: integer counts only until the final divisions —
    one conditional aggregate per threshold from ONE scan (the
    thresholds unroll as columns, not as re-scans); output is the
    bounded 9-row threshold domain."""
    scored = _scored(spark, sf_dir)
    aggs = []
    for t_ in PR_THRESHOLDS:
        cut = int(t_ * 1_000_000)
        hit = (F.col("p_u") >= cut).cast("int")
        aggs.append(F.sum(hit).cast("bigint").alias(f"pp_{cut}"))
        aggs.append(
            F.sum(hit * F.col("y")).cast("bigint").alias(f"tp_{cut}")
        )
    aggs.append(F.sum("y").cast("bigint").alias("pos"))
    one = scored.agg(*aggs)
    # unroll the single aggregate row onto the 9-row threshold domain
    # with one explode — never re-scan per threshold
    structs = [
        F.struct(
            F.lit(t_).alias("tau"),
            F.col(f"pp_{int(t_ * 1_000_000)}").alias("predicted_pos"),
            F.col(f"tp_{int(t_ * 1_000_000)}").alias("true_pos"),
        )
        for t_ in PR_THRESHOLDS
    ]
    exploded = one.select(
        "pos", F.explode(F.array(*structs)).alias("row")
    ).select("pos", "row.*")
    return exploded.select(
        "tau",
        "predicted_pos",
        "true_pos",
        F.round(
            F.col("true_pos")
            / F.nullif(F.col("predicted_pos").cast("double"), F.lit(0.0)),
            6,
        ).alias("precision"),
        F.round(F.col("true_pos") / F.col("pos").cast("double"), 6).alias(
            "recall"
        ),
    ).orderBy("tau")


LIFT_DECILES = 10

_LIFT_ORACLE = f"""
    {_SCORED_CTE},
    g AS (
      SELECT p_u, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos
      FROM scored GROUP BY p_u
    ),
    r AS (
      SELECT n, pos,
             SUM(n) OVER (ORDER BY p_u DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) - n AS cum_before,
             SUM(n) OVER () AS nt, SUM(pos) OVER () AS post
      FROM g
    ),
    d AS (
      SELECT LEAST({LIFT_DECILES} * cum_before // nt, {LIFT_DECILES - 1})
               AS decile,
             n, pos, nt, post
      FROM r
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(SUM(n) AS BIGINT) AS n,
           CAST(SUM(pos) AS BIGINT) AS responders,
           ROUND(SUM(pos) / CAST(SUM(n) AS DOUBLE), 6) AS response_rate,
           ROUND((SUM(pos) / CAST(SUM(n) AS DOUBLE))
                 / (MAX(post) / CAST(MAX(nt) AS DOUBLE)), 4) AS lift
    FROM d GROUP BY decile ORDER BY decile
"""


@register("agg_lift_deciles", oracle=_LIFT_ORACLE)
def agg_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-gains lift table: events ranked by score, cut into
    {LIFT_DECILES} deciles (top decile = highest scores), each decile's
    response rate vs the base rate — "how much better than random is
    the top 10%" in one bounded table, the campaign/routing view of the
    same model agg_auc_roc grades globally.

    Scale/determinism: decile assignment happens on the QUANTIZED score
    domain (a tied micro-unit group lands wholly in the decile of its
    first row — floor(10*cum_before/N), the documented tie rule both
    engines apply identically); all sums are integers over the
    <= 1e6+1-row domain frame."""
    g = _scored(spark, sf_dir).groupBy("p_u").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    w = Window.orderBy(F.desc("p_u")).rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    r = g.select(
        "n",
        "pos",
        (F.sum("n").over(w) - F.col("n")).alias("cum_before"),
        F.sum("n").over(wall).alias("nt"),
        F.sum("pos").over(wall).alias("post"),
    )
    d = r.select(
        F.least(
            # Integer floor DIVISION (div), not a double quotient + cast:
            # 10*cum_before/nt as a double can round up across an integer
            # near 2^53, diverging from the oracle's exact // semantics.
            F.expr(
                f"CAST(CAST({LIFT_DECILES} AS BIGINT) * cum_before AS"
                " BIGINT) div nt"
            ),
            F.lit(LIFT_DECILES - 1).cast("bigint"),
        ).alias("decile"),
        "n",
        "pos",
        "nt",
        "post",
    )
    return (
        d.groupBy("decile")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("responders"),
            F.round(
                F.sum("pos") / F.sum("n").cast("double"), 6
            ).alias("response_rate"),
            F.round(
                (F.sum("pos") / F.sum("n").cast("double"))
                / (F.max("post") / F.max("nt").cast("double")),
                4,
            ).alias("lift"),
        )
        .orderBy("decile")
    )


#: Decision threshold for the confusion-matrix metrics (micro-units).
#: 0.5 is the Bayes cut for a calibrated probability — fixed, so the
#: metric needs no data-dependent scalar.
MCC_THRESHOLD_U = 500_000

_MCC_ORACLE = f"""
    {_SCORED_CTE},
    c AS (
      SELECT
        CAST(SUM(CASE WHEN y = 1 AND p_u >= {MCC_THRESHOLD_U} THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(SUM(CASE WHEN y = 0 AND p_u >= {MCC_THRESHOLD_U} THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(SUM(CASE WHEN y = 1 AND p_u <  {MCC_THRESHOLD_U} THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        CAST(SUM(CASE WHEN y = 0 AND p_u <  {MCC_THRESHOLD_U} THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM scored
    )
    SELECT tp, fp, fn, tn,
           CASE WHEN tp + fp > 0 AND tp + fn > 0 AND tn + fp > 0
                 AND tn + fn > 0 THEN
             ROUND((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
                   / (SQRT(CAST(tp + fp AS DOUBLE)) * SQRT(CAST(tp + fn AS DOUBLE))
                      * SQRT(CAST(tn + fp AS DOUBLE)) * SQRT(CAST(tn + fn AS DOUBLE))),
                   6) END AS mcc
    FROM c
"""


@register("agg_matthews_corr", oracle=_MCC_ORACLE)
def agg_matthews_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient of the thresholded score vs the
    purchase label — the confusion-matrix summary that stays honest
    under class imbalance (accuracy and even F1 reward the
    majority-class constant; MCC is the phi coefficient, 0 for any
    constant classifier). Complements agg_auc_roc (threshold-free
    ranking) with the one-number verdict AT the deployed 0.5 cut.

    Scale/determinism: one combinable 4-counter pass (the whole metric
    is four integer sums); the products tp*tn and the four marginals
    are taken in DOUBLE via per-factor sqrt — counts at 100 TB (~1e13)
    square past decimal(38) range, and the identical single expression
    on both engines is the stats.py doctrine for final divisions."""
    s = _scored(spark, sf_dir)
    pred = (F.col("p_u") >= MCC_THRESHOLD_U).cast("int")
    c = s.agg(
        F.sum(((F.col("y") == 1) & (pred == 1)).cast("int")).cast("bigint").alias("tp"),
        F.sum(((F.col("y") == 0) & (pred == 1)).cast("int")).cast("bigint").alias("fp"),
        F.sum(((F.col("y") == 1) & (pred == 0)).cast("int")).cast("bigint").alias("fn"),
        F.sum(((F.col("y") == 0) & (pred == 0)).cast("int")).cast("bigint").alias("tn"),
    )
    tp, fp, fn, tn = (F.col(x) for x in ("tp", "fp", "fn", "tn"))
    num = tp.cast("double") * tn - fp.cast("double") * fn
    den = (
        F.sqrt((tp + fp).cast("double"))
        * F.sqrt((tp + fn).cast("double"))
        * F.sqrt((tn + fp).cast("double"))
        * F.sqrt((tn + fn).cast("double"))
    )
    defined = (
        ((tp + fp) > 0) & ((tp + fn) > 0) & ((tn + fp) > 0) & ((tn + fn) > 0)
    )
    # NULL, not NaN, for a constant classifier: a zero marginal zeroes
    # the denominator, and ANSI mode (Spark 4 default) would otherwise
    # raise DIVIDE_BY_ZERO instead of returning the undefined value
    return c.select(
        "tp", "fp", "fn", "tn",
        F.when(defined, F.round(num / den, 6)).alias("mcc"),
    )


_KAPPA_ORACLE = f"""
    {_SCORED_CTE},
    c AS (
      SELECT
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN y = 1 AND p_u >= {MCC_THRESHOLD_U} THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(SUM(CASE WHEN y = 0 AND p_u <  {MCC_THRESHOLD_U} THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        CAST(SUM(CASE WHEN p_u >= {MCC_THRESHOLD_U} THEN 1 ELSE 0 END) AS BIGINT) AS pred_pos,
        CAST(SUM(y) AS BIGINT) AS true_pos
      FROM scored
    )
    SELECT n,
           ROUND((tp + tn) / CAST(n AS DOUBLE), 6) AS observed_agreement,
           ROUND((CAST(pred_pos AS DOUBLE) / n) * (CAST(true_pos AS DOUBLE) / n)
                 + (CAST(n - pred_pos AS DOUBLE) / n) * (CAST(n - true_pos AS DOUBLE) / n),
                 6) AS chance_agreement,
           CASE WHEN ((CAST(pred_pos AS DOUBLE) / n) * (CAST(true_pos AS DOUBLE) / n)
                      + (CAST(n - pred_pos AS DOUBLE) / n) * (CAST(n - true_pos AS DOUBLE) / n))
                     < 1.0 THEN
             ROUND(((tp + tn) / CAST(n AS DOUBLE)
                    - ((CAST(pred_pos AS DOUBLE) / n) * (CAST(true_pos AS DOUBLE) / n)
                       + (CAST(n - pred_pos AS DOUBLE) / n) * (CAST(n - true_pos AS DOUBLE) / n)))
                   / (1.0 - ((CAST(pred_pos AS DOUBLE) / n) * (CAST(true_pos AS DOUBLE) / n)
                             + (CAST(n - pred_pos AS DOUBLE) / n) * (CAST(n - true_pos AS DOUBLE) / n))),
                   6) ELSE 0.0 END AS kappa
    FROM c
"""


@register("agg_cohens_kappa", oracle=_KAPPA_ORACLE)
def agg_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the thresholded score and the purchase
    label: chance-corrected agreement — how much better than a
    marginal-respecting random rater the classifier agrees with truth.
    Reads beside agg_matthews_corr (same confusion matrix): kappa
    penalizes via the raters' own marginals, MCC via the geometric
    mean of all four; a large gap between them flags skewed marginals.

    Scale/determinism: the same single combinable 4-counter pass
    (n, tp, tn, and the two positive marginals determine the matrix);
    observed/chance agreement and kappa are each ONE closed-form double
    expression over those integers, written identically in both
    engines, rounded once at 6 dp."""
    s = _scored(spark, sf_dir)
    pred = (F.col("p_u") >= MCC_THRESHOLD_U).cast("int")
    c = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(((F.col("y") == 1) & (pred == 1)).cast("int")).cast("bigint").alias("tp"),
        F.sum(((F.col("y") == 0) & (pred == 0)).cast("int")).cast("bigint").alias("tn"),
        F.sum(pred).cast("bigint").alias("pred_pos"),
        F.sum("y").cast("bigint").alias("true_pos"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("tp") + F.col("tn")) / nd
    pe = (F.col("pred_pos").cast("double") / nd) * (
        F.col("true_pos").cast("double") / nd
    ) + ((F.col("n") - F.col("pred_pos")).cast("double") / nd) * (
        (F.col("n") - F.col("true_pos")).cast("double") / nd
    )
    return c.select(
        "n",
        F.round(po, 6).alias("observed_agreement"),
        F.round(pe, 6).alias("chance_agreement"),
        # pe = 1 means the marginals force agreement; kappa's own
        # convention is 0 there (no skill beyond chance is expressible),
        # and the guard keeps ANSI mode from raising DIVIDE_BY_ZERO
        F.when(pe < 1.0, F.round((po - pe) / (1.0 - pe), 6))
        .otherwise(F.lit(0.0))
        .alias("kappa"),
    )
