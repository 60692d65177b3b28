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


# ---------------------------------------------------------------------------
# r13 block: calibration slope/intercept, Murphy Brier decomposition,
# chance-corrected agreement beyond kappa (Gwet AC1, Krippendorff
# alpha), and ranking quality (nDCG@k).
# ---------------------------------------------------------------------------

_CALIB_SLOPE_ORACLE = f"""
    {_SCORED_CTE},
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(p_u AS DECIMAL(38,0))) AS sp,
             SUM(CAST(p_u AS DECIMAL(38,0)) * p_u) AS spp,
             CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(p_u AS DECIMAL(38,0)) * y) AS spy
      FROM scored
    ),
    d AS (
      SELECT n,
             1000000.0 * (CAST(n AS DOUBLE) * CAST(spy AS DOUBLE)
                          - CAST(sp AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)) AS slope,
             CAST(sy AS DOUBLE) / n AS ybar,
             CAST(sp AS DOUBLE) / n / 1000000.0 AS pbar
      FROM m
      WHERE CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
            - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) > 0
    )
    SELECT n,
           floor((ybar - pbar) * 1000000) / 1000000 AS calibration_in_large,
           floor(slope * 1000000) / 1000000 AS calibration_slope,
           floor((ybar - slope * pbar) * 1000000) / 1000000
             AS calibration_intercept
    FROM d
"""


@register("agg_calibration_slope", oracle=_CALIB_SLOPE_ORACLE)
def agg_calibration_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration slope and intercept (Cox 1958 recalibration form,
    linear-probability variant) of the purchase score: OLS of the
    binary outcome on the predicted probability. A well-calibrated
    model has slope 1 and intercept 0; slope < 1 means overfit
    (predictions too extreme), calibration-in-the-large =
    mean(y) - mean(p) catches a global base-rate shift that ECE's
    absolute bins can mask. Completes the calibration pair VERDICT r12
    asked for beside agg_calibration_ece.

    Scale/determinism: one combinable moment pass over (y, micro-unit
    p_u) — p_u^2 and p_u*y sums pre-widen to DECIMAL(38,0) (1e12-scale
    squares times corpus rows overflow BIGINT); slope/intercept are
    single closed-form double expressions over those exact integers,
    floored 1e-6. Zero score variance emits 0 rows on both engines."""
    s = _scored(spark, sf_dir)
    m = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("p_u").cast("decimal(38,0)")).alias("sp"),
        F.sum(F.col("p_u").cast("decimal(38,0)") * F.col("p_u")).alias("spp"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("p_u").cast("decimal(38,0)") * F.col("y")).alias("spy"),
    )
    nd = F.col("n").cast("double")
    var_n = nd * F.col("spp").cast("double") - F.col("sp").cast("double") * F.col(
        "sp"
    ).cast("double")
    slope = (
        1_000_000.0
        * (nd * F.col("spy").cast("double") - F.col("sp").cast("double") * F.col("sy"))
        / var_n
    )
    ybar = F.col("sy").cast("double") / nd
    pbar = F.col("sp").cast("double") / nd / 1_000_000.0
    d = m.where(var_n > 0).select(
        "n", slope.alias("slope"), ybar.alias("ybar"), pbar.alias("pbar")
    )
    return d.select(
        "n",
        (F.floor((F.col("ybar") - F.col("pbar")) * 1_000_000) / 1_000_000).alias(
            "calibration_in_large"
        ),
        (F.floor(F.col("slope") * 1_000_000) / 1_000_000).alias(
            "calibration_slope"
        ),
        (
            F.floor(
                (F.col("ybar") - F.col("slope") * F.col("pbar")) * 1_000_000
            )
            / 1_000_000
        ).alias("calibration_intercept"),
    )


#: Brier-decomposition bins: same 10-bucket grid as agg_calibration_ece
#: so the reliability term reads against the same diagram.
BRIER_BINS = 10

_BRIER_DECOMP_ORACLE = f"""
    {_SCORED_CTE},
    b AS (
      SELECT CAST(floor(LEAST(p_u / 1000000.0, 0.9999999)
                        * {BRIER_BINS}) AS BIGINT) AS bin,
             COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos,
             SUM(CAST(p_u AS DECIMAL(38,0))) AS sp
      FROM scored GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(pos) AS BIGINT) AS np
      FROM b
    ),
    fold AS (
      SELECT bin, nn, np,
             SUM(n * (CAST(sp AS DOUBLE) / 1000000 / n
                      - pos / CAST(n AS DOUBLE))
                   * (CAST(sp AS DOUBLE) / 1000000 / n
                      - pos / CAST(n AS DOUBLE)))
               OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS rel_cum,
             SUM(n * (pos / CAST(n AS DOUBLE)
                      - np / CAST(nn AS DOUBLE))
                   * (pos / CAST(n AS DOUBLE)
                      - np / CAST(nn AS DOUBLE)))
               OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS res_cum
      FROM b CROSS JOIN tot
    ),
    s AS (
      SELECT MAX(nn) AS nn, MAX(np) AS np,
             MAX_BY(rel_cum, bin) AS rel, MAX_BY(res_cum, bin) AS res
      FROM fold
    )
    SELECT nn AS n,
           floor(rel / nn * 1000000) / 1000000 AS reliability,
           floor(res / nn * 1000000) / 1000000 AS resolution,
           floor((np / CAST(nn AS DOUBLE))
                 * (1 - np / CAST(nn AS DOUBLE)) * 1000000) / 1000000
             AS uncertainty,
           floor((rel / nn - res / nn
                  + (np / CAST(nn AS DOUBLE))
                    * (1 - np / CAST(nn AS DOUBLE))) * 1000000) / 1000000
             AS brier_binned
    FROM s
"""


@register("agg_brier_decomposition", oracle=_BRIER_DECOMP_ORACLE)
def agg_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy (1973) decomposition of the BINNED Brier score:
    reliability (n-weighted squared gap between each bin's mean
    forecast and its outcome rate — calibration, smaller is better),
    resolution (how far bin outcome rates spread from the base rate —
    discrimination, larger is better), and uncertainty (base-rate
    variance, the no-skill floor). brier_binned = REL - RES + UNC
    exactly, because within-bin forecasts are collapsed to the bin
    mean — the identity the raw agg_brier_score cannot expose. The
    skill question becomes one subtraction: the model beats climate
    iff RES > REL.

    Scale/determinism: one combinable pass onto the {BRIER_BINS}-bin
    domain (micro-unit sums, DECIMAL(38,0) widening); the two
    unavoidable double sums fold cumulatively in BIN ORDER over the
    bounded bin frame and finish via max_by (ordered-fold doctrine —
    the ECE precedent's unordered OVER () is avoided here because
    squared terms amplify reorder ulps). All four outputs floor at
    1e-6."""
    s = _scored(spark, sf_dir)
    b = s.groupBy(
        F.floor(
            F.least(F.col("p_u") / 1_000_000.0, F.lit(0.9999999)) * BRIER_BINS
        )
        .cast("bigint")
        .alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
        F.sum(F.col("p_u").cast("decimal(38,0)")).alias("sp"),
    )
    tot = b.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("pos").cast("bigint").alias("np"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    gap = F.col("sp").cast("double") / 1_000_000 / F.col("n") - F.col(
        "pos"
    ) / F.col("n").cast("double")
    spread = F.col("pos") / F.col("n").cast("double") - F.col("np") / F.col(
        "nn"
    ).cast("double")
    fold = b.crossJoin(F.broadcast(tot)).select(
        "bin",
        "nn",
        "np",
        F.sum(F.col("n") * gap * gap).over(w).alias("rel_cum"),
        F.sum(F.col("n") * spread * spread).over(w).alias("res_cum"),
    )
    agg = fold.agg(
        F.max("nn").alias("nn"),
        F.max("np").alias("np"),
        F.max_by("rel_cum", "bin").alias("rel"),
        F.max_by("res_cum", "bin").alias("res"),
    )
    base = F.col("np") / F.col("nn").cast("double")
    return agg.select(
        F.col("nn").alias("n"),
        (F.floor(F.col("rel") / F.col("nn") * 1_000_000) / 1_000_000).alias(
            "reliability"
        ),
        (F.floor(F.col("res") / F.col("nn") * 1_000_000) / 1_000_000).alias(
            "resolution"
        ),
        (F.floor(base * (1 - base) * 1_000_000) / 1_000_000).alias(
            "uncertainty"
        ),
        (
            F.floor(
                (
                    F.col("rel") / F.col("nn")
                    - F.col("res") / F.col("nn")
                    + base * (1 - base)
                )
                * 1_000_000
            )
            / 1_000_000
        ).alias("brier_binned"),
    )


_GWET_AC1_ORACLE = f"""
    {_SCORED_CTE},
    c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN y = 1 AND p_u >= {MCC_THRESHOLD_U}
                           THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN y = 0 AND p_u < {MCC_THRESHOLD_U}
                           THEN 1 ELSE 0 END) AS BIGINT) AS tn,
             CAST(SUM(CASE WHEN p_u >= {MCC_THRESHOLD_U}
                           THEN 1 ELSE 0 END) AS BIGINT) AS pred_pos,
             CAST(SUM(y) AS BIGINT) AS true_pos
      FROM scored
    ),
    d AS (
      SELECT n, (tp + tn) / CAST(n AS DOUBLE) AS po,
             2 * ((pred_pos + true_pos) / (2.0 * n))
               * (1 - (pred_pos + true_pos) / (2.0 * n)) AS pe
      FROM c
    )
    SELECT n, ROUND(po, 6) AS observed_agreement,
           ROUND(pe, 6) AS chance_agreement_gamma,
           CASE WHEN pe < 1.0 THEN ROUND((po - pe) / (1.0 - pe), 6)
                ELSE 0.0 END AS gwet_ac1
    FROM d
"""


@register("agg_gwet_ac1", oracle=_GWET_AC1_ORACLE)
def agg_gwet_ac1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gwet's AC1 (Gwet 2008) between the thresholded score and the
    purchase label: chance-corrected agreement whose chance term
    2*pi*(1-pi) uses the MEAN of the two raters' positive rates —
    immune to the kappa paradox (agg_cohens_kappa collapses toward 0
    on skewed marginals even when raters agree on nearly every item;
    AC1 stays interpretable). Read the pair together: kappa much
    smaller than AC1 flags prevalence distortion, not disagreement.

    Scale/determinism: the identical single combinable 4-counter pass
    as agg_cohens_kappa (same confusion matrix, deliberately — the two
    statistics must be comparable on the same data); AC1 is one
    closed-form double expression over those integers, rounded at
    6 dp with kappa's pe<1 guard convention."""
    s = _scored(spark, sf_dir)
    pred = (F.col("p_u") >= MCC_THRESHOLD_U).cast("int")
    c = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(((F.col("y") == 1) & (pred == 1)).cast("int"))
        .cast("bigint")
        .alias("tp"),
        F.sum(((F.col("y") == 0) & (pred == 0)).cast("int"))
        .cast("bigint")
        .alias("tn"),
        F.sum(pred).cast("bigint").alias("pred_pos"),
        F.sum("y").cast("bigint").alias("true_pos"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("tp") + F.col("tn")) / nd
    pi = (F.col("pred_pos") + F.col("true_pos")) / (2.0 * F.col("n"))
    pe = 2 * pi * (1 - pi)
    return c.select(
        "n",
        F.round(po, 6).alias("observed_agreement"),
        F.round(pe, 6).alias("chance_agreement_gamma"),
        F.when(pe < 1.0, F.round((po - pe) / (1.0 - pe), 6))
        .otherwise(F.lit(0.0))
        .alias("gwet_ac1"),
    )


_KRIPP_ORACLE = f"""
    {_SCORED_CTE},
    c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN y = 1 AND p_u >= {MCC_THRESHOLD_U}
                           THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN y = 0 AND p_u < {MCC_THRESHOLD_U}
                           THEN 1 ELSE 0 END) AS BIGINT) AS tn,
             CAST(SUM(CASE WHEN p_u >= {MCC_THRESHOLD_U}
                           THEN 1 ELSE 0 END) AS BIGINT) AS pred_pos,
             CAST(SUM(y) AS BIGINT) AS true_pos
      FROM scored
    ),
    d AS (
      SELECT n, n - tp - tn AS disc,
             pred_pos + true_pos AS n1, 2 * n - pred_pos - true_pos AS n0
      FROM c
    )
    SELECT n, CAST(disc AS BIGINT) AS n_disagreements,
           CASE WHEN n0 * n1 > 0
                THEN ROUND(1 - CAST(disc AS DOUBLE) * (2 * n - 1)
                               / (CAST(n0 AS DOUBLE) * n1), 6)
           END AS krippendorff_alpha
    FROM d
"""


@register("agg_krippendorff_alpha", oracle=_KRIPP_ORACLE)
def agg_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal data, two raters) between the
    thresholded score and the purchase label, via the closed
    coincidence-matrix form: alpha = 1 - disc*(2n-1)/(n0*n1), where
    disc counts disagreeing units and n0/n1 are the value totals
    pooled across BOTH raters. Unlike kappa (rater-specific marginals)
    and AC1 (mean marginal), alpha's expected disagreement comes from
    the pooled value distribution WITHOUT replacement — the
    content-analysis standard, and the third leg of the agreement
    family so annotation pipelines can report whichever their field
    expects from one confusion matrix.

    Scale/determinism: same single combinable 4-counter pass as the
    kappa/AC1 pair; alpha is one closed-form double expression over
    exact integers, rounded at 6 dp; a value never used by either
    rater (n0*n1 = 0) yields NULL on both engines."""
    s = _scored(spark, sf_dir)
    pred = (F.col("p_u") >= MCC_THRESHOLD_U).cast("int")
    c = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(((F.col("y") == 1) & (pred == 1)).cast("int"))
        .cast("bigint")
        .alias("tp"),
        F.sum(((F.col("y") == 0) & (pred == 0)).cast("int"))
        .cast("bigint")
        .alias("tn"),
        F.sum(pred).cast("bigint").alias("pred_pos"),
        F.sum("y").cast("bigint").alias("true_pos"),
    )
    d = c.select(
        "n",
        (F.col("n") - F.col("tp") - F.col("tn")).alias("disc"),
        (F.col("pred_pos") + F.col("true_pos")).alias("n1"),
        (2 * F.col("n") - F.col("pred_pos") - F.col("true_pos")).alias("n0"),
    )
    alpha = 1 - F.col("disc").cast("double") * (2 * F.col("n") - 1) / (
        F.col("n0").cast("double") * F.col("n1")
    )
    return d.select(
        "n",
        F.col("disc").cast("bigint").alias("n_disagreements"),
        F.when(F.col("n0") * F.col("n1") > 0, F.round(alpha, 6)).alias(
            "krippendorff_alpha"
        ),
    )


#: nDCG contract: rank part brands per nation by FIRST-period revenue,
#: grade against SECOND-period graded relevance, cut at k.
NDCG_K = 10
NDCG_SPLIT = "1996-01-01"

_NDCG_ORACLE = f"""
    WITH rev AS (
      SELECT n.n_name AS nation, p.p_brand AS brand,
             o.o_orderdate < DATE '{NDCG_SPLIT}' AS is_train,
             CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT) AS vc
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN customer cu ON cu.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = cu.c_nationkey
    ),
    agg AS (
      SELECT nation, brand,
             SUM(CASE WHEN is_train THEN vc ELSE 0 END) AS train_c,
             SUM(CASE WHEN is_train THEN 0 ELSE vc END) AS test_c
      FROM rev GROUP BY nation, brand
    ),
    rel AS (
      SELECT nation, brand, train_c,
             GREATEST(0, {NDCG_K} -
               ROW_NUMBER() OVER (PARTITION BY nation
                                  ORDER BY test_c DESC, brand)) AS rel
      FROM agg
    ),
    pred AS (
      SELECT nation, brand, rel,
             ROW_NUMBER() OVER (PARTITION BY nation
                                ORDER BY train_c DESC, brand) AS pos
      FROM rel WHERE train_c > 0
    ),
    dcg AS (
      SELECT nation,
             CAST(SUM(CAST(FLOOR(rel * 1000000.0 / log2(pos + 1))
                           AS BIGINT)) AS BIGINT) AS dcg_u
      FROM pred WHERE pos <= {NDCG_K} GROUP BY nation
    ),
    ideal AS (
      SELECT nation, rel,
             ROW_NUMBER() OVER (PARTITION BY nation
                                ORDER BY rel DESC, brand) AS ipos
      FROM rel
    ),
    idcg AS (
      SELECT nation,
             CAST(SUM(CAST(FLOOR(rel * 1000000.0 / log2(ipos + 1))
                           AS BIGINT)) AS BIGINT) AS idcg_u
      FROM ideal WHERE ipos <= {NDCG_K} GROUP BY nation
    )
    SELECT d.nation, d.dcg_u, i.idcg_u,
           CASE WHEN i.idcg_u > 0
                THEN floor(CAST(d.dcg_u AS DOUBLE) / i.idcg_u * 1000000)
                     / 1000000 END AS ndcg
    FROM dcg d JOIN idcg i ON i.nation = d.nation
    ORDER BY d.nation
"""


@register("agg_ndcg", oracle=_NDCG_ORACLE)
def agg_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@{NDCG_K} (Järvelin & Kekäläinen 2002) of a
    revenue-history ranker: per nation, brands rank by pre-{NDCG_SPLIT}
    revenue (the "model"); graded relevance is {NDCG_K}-minus-rank of
    the brand's POST-split revenue (so the top post-split brand is
    worth {NDCG_K - 1}, the {NDCG_K}th and below 0); DCG discounts by
    1/log2(pos+1) and normalizes by the ideal ordering of the full
    relevance pool truncated at k. This is the ranking-eval census gap
    beside agg_auc_roc (pairwise) and agg_lift_deciles (decile) — the
    position-discounted metric retrieval and recommendation pipelines
    report; swap the revenue ranker for any model score column
    unchanged.

    Scale/determinism: revenue folds to exact cents per
    (nation, brand) in one combinable shuffle; both rankings are
    ROW_NUMBER windows over the bounded brand-per-nation frame (25
    rows per partition at any SF) with brand-name tiebreaks; each
    DCG term floors to integer micro-units BEFORE summing
    (graph_adamic_adar's b_u doctrine — order-free integer sums), one
    final division per nation floored 1e-6."""
    t = load(spark, sf_dir)
    vc = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    rev = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.part, F.col("p_partkey") == F.col("l_partkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(t.nation, F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.col("p_brand").alias("brand"),
            (F.col("o_orderdate") < F.lit(NDCG_SPLIT).cast("date")).alias(
                "is_train"
            ),
            vc.alias("vc"),
        )
    )
    agg = rev.groupBy("nation", "brand").agg(
        F.sum(F.when(F.col("is_train"), F.col("vc")).otherwise(0)).alias(
            "train_c"
        ),
        F.sum(F.when(F.col("is_train"), 0).otherwise(F.col("vc"))).alias(
            "test_c"
        ),
    )
    w_test = Window.partitionBy("nation").orderBy(
        F.col("test_c").desc(), "brand"
    )
    rel = agg.select(
        "nation",
        "brand",
        "train_c",
        F.greatest(
            F.lit(0), F.lit(NDCG_K) - F.row_number().over(w_test)
        ).alias("rel"),
    )
    w_pred = Window.partitionBy("nation").orderBy(
        F.col("train_c").desc(), "brand"
    )
    pred = rel.where(F.col("train_c") > 0).select(
        "nation", "rel", F.row_number().over(w_pred).alias("pos")
    )
    dcg = (
        pred.where(F.col("pos") <= NDCG_K)
        .groupBy("nation")
        .agg(
            F.sum(
                F.floor(
                    F.col("rel") * 1_000_000.0 / F.log2(F.col("pos") + 1)
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("dcg_u")
        )
    )
    w_ideal = Window.partitionBy("nation").orderBy(
        F.col("rel").desc(), "brand"
    )
    ideal = rel.select(
        "nation", "rel", F.row_number().over(w_ideal).alias("ipos")
    )
    idcg = (
        ideal.where(F.col("ipos") <= NDCG_K)
        .groupBy("nation")
        .agg(
            F.sum(
                F.floor(
                    F.col("rel") * 1_000_000.0 / F.log2(F.col("ipos") + 1)
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("idcg_u")
        )
    )
    return (
        dcg.join(idcg, "nation")
        .select(
            "nation",
            "dcg_u",
            "idcg_u",
            F.when(
                F.col("idcg_u") > 0,
                F.floor(
                    F.col("dcg_u").cast("double") / F.col("idcg_u") * 1_000_000
                )
                / 1_000_000,
            ).alias("ndcg"),
        )
        .orderBy("nation")
    )
