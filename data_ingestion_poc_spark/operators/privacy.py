"""Privacy / governance audits (round 6): re-identification risk
measurement over quasi-identifier combinations — the checks a data-
release or training-data governance gate runs BEFORE publishing a
table (text_pii_scrub removes direct identifiers; these quantify what
the remaining columns still leak in combination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import register

#: Quasi-identifier set for the customer table: nation + market segment
#: + account-balance band (bucketed so the QI is categorical, the
#: standard generalization step), and the k-anonymity alert line.
K_ANON_MIN = 5
ACCTBAL_BAND = 1000

_QI_SQL = (
    "c_nationkey, c_mktsegment, "
    f"CAST(floor(c_acctbal / {ACCTBAL_BAND}) AS BIGINT) AS bal_band"
)

_K_ANON_ORACLE = f"""
    WITH classes AS (
      SELECT {_QI_SQL}, COUNT(*) AS k
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT CAST(k AS BIGINT) AS class_size,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(k) AS BIGINT) AS n_rows,
           k < {K_ANON_MIN} AS at_risk,
           ROUND(SUM(SUM(k)) FILTER (WHERE k < {K_ANON_MIN}) OVER ()
                 / CAST(SUM(SUM(k)) OVER () AS DOUBLE), 6) AS risk_row_share,
           CAST(MIN(MIN(k)) OVER () AS BIGINT) AS k_anonymity
    FROM classes GROUP BY k
"""


@register("privacy_k_anonymity", oracle=_K_ANON_ORACLE)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifier set
    (nation, segment, balance band): the class-size histogram, the
    share of rows in classes smaller than {K_ANON_MIN} (re-identifiable
    by QI intersection), and the table's k-anonymity (the MINIMUM class
    size — the number Sweeney's definition asks for). The release gate
    reads `k_anonymity >= {K_ANON_MIN}`; the histogram says how far the
    generalization has to coarsen to get there.

    Scale shape: one combinable groupBy to the QI classes, one more to
    the class-SIZE histogram (bounded by the largest class, not the
    table); the risk share and global minimum are windows over that
    bounded frame. All exact integers and one exact-ratio division."""
    t = load(spark, sf_dir)
    classes = t.customer.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / ACCTBAL_BAND).cast("bigint").alias(
            "bal_band"
        ),
    ).agg(F.count(F.lit(1)).alias("k"))
    hist = classes.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("k").alias("n_rows"),
        F.min("k").alias("mn"),
    )
    w = Window.partitionBy()
    risk_rows = F.sum(
        F.when(F.col("k") < K_ANON_MIN, F.col("n_rows")).otherwise(0)
    ).over(w)
    return hist.select(
        F.col("k").cast("bigint").alias("class_size"),
        F.col("n_classes").cast("bigint").alias("n_classes"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        (F.col("k") < K_ANON_MIN).alias("at_risk"),
        F.round(
            risk_rows / F.sum("n_rows").over(w).cast("double"), 6
        ).alias("risk_row_share"),
        F.min("mn").over(w).cast("bigint").alias("k_anonymity"),
    )


#: l-diversity: the sensitive attribute audited within each QI class.
#: A class where every member shares one sensitive value leaks it to
#: anyone who can place a person in the class, however large k is.
L_DIV_MIN = 2

_L_DIV_ORACLE = f"""
    WITH classes AS (
      SELECT {_QI_SQL},
             COUNT(*) AS k,
             COUNT(DISTINCT o_orderpriority) AS l
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY 1, 2, 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(l) AS BIGINT) AS l_diversity,
           CAST(SUM(CASE WHEN l < {L_DIV_MIN} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_homogeneous_classes,
           ROUND(SUM(CASE WHEN l < {L_DIV_MIN} THEN k ELSE 0 END)
                 / CAST(SUM(k) AS DOUBLE), 6) AS homogeneous_row_share,
           MIN(l) >= {L_DIV_MIN} AS passes
    FROM classes
"""


@register("privacy_l_diversity", oracle=_L_DIV_ORACLE)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al.): within each customer
    QI class, how many DISTINCT values of the sensitive attribute
    (order priority, standing in for any sensitive label) appear —
    k-anonymity's blind spot is the homogeneous class whose members all
    share one sensitive value, which this measures directly. Emits the
    table's l (minimum distinct count), the homogeneous-class count and
    row share, and the release verdict l >= {L_DIV_MIN}.

    Scale shape: facts join the broadcastable dim, then ONE two-phase
    distinct aggregate per QI class and a 1-row fold — the same
    distinct-count machinery as profile_fd_audit pointed at a
    governance question. Exact integers end to end."""
    t = load(spark, sf_dir)
    classes = (
        t.orders.join(
            # customer scales with SF: no hard broadcast hint (AQE decides)
            (
                t.customer.select(
                    F.col("c_custkey").alias("o_custkey"),
                    "c_nationkey",
                    "c_mktsegment",
                    F.floor(F.col("c_acctbal") / ACCTBAL_BAND)
                    .cast("bigint")
                    .alias("bal_band"),
                )
            ),
            "o_custkey",
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.countDistinct("o_orderpriority").alias("l"),
        )
    )
    homo = F.sum(F.when(F.col("l") < L_DIV_MIN, 1).otherwise(0))
    return classes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("l").cast("bigint").alias("l_diversity"),
        homo.cast("bigint").alias("n_homogeneous_classes"),
        F.round(
            F.sum(F.when(F.col("l") < L_DIV_MIN, F.col("k")).otherwise(0))
            / F.sum("k").cast("double"),
            6,
        ).alias("homogeneous_row_share"),
        (F.min("l") >= L_DIV_MIN).alias("passes"),
    )


#: DP release parameters: epsilon 1.0 on a count query (sensitivity 1)
#: means Laplace scale b = 1/epsilon. The noise is SEEDED — derived
#: from md5 of the release label + group key — so the release is
#: reproducible and cross-engine verifiable; a production run swaps in
#: a cryptographic RNG and the plan is unchanged.
DP_EPSILON = 1.0
DP_RELEASE = "r6"


@register(
    "privacy_dp_counts",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, COUNT(*) AS true_n FROM customer GROUP BY c_nationkey
    ),
    u AS (
      SELECT c_nationkey, true_n,
             (CAST(('0x' || substr(md5('{DP_RELEASE}:'
                    || CAST(c_nationkey AS VARCHAR)), 1, 8)) AS BIGINT)
              % 999999 + 0.5) / 1000000.0 - 0.5 AS s
      FROM g
    )
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
           CAST(GREATEST(0, CAST(ROUND(true_n
                 - (1.0 / {DP_EPSILON})
                   * (CASE WHEN s >= 0 THEN 1 ELSE -1 END)
                   * ln(1 - 2 * abs(s))) AS BIGINT)) AS BIGINT)
             AS dp_count,
           {DP_EPSILON} AS epsilon,
           ROUND(1.0 / {DP_EPSILON}, 4) AS laplace_scale
    FROM u
    """,
)
def privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (epsilon = {DP_EPSILON},
    Laplace mechanism): per-nation customer counts with
    Laplace(1/epsilon) noise via inverse-CDF sampling, clamped at 0 —
    the aggregate-release shape a governance gate requires when even
    exact small counts leak membership (pairs with privacy_k_anonymity:
    that audits the raw table, this is how you publish from it anyway).
    The uniform draw is SEEDED from md5(release || group) — the
    engine-portable corpus_shard_assign convention — so the release is
    REPRODUCIBLE (same epsilon, same release tag, same noise), which is
    both what makes it oracle-verifiable and what a real redaction
    pipeline wants (re-runs must not leak fresh noise draws: each
    re-release with new noise spends more privacy budget).

    Scale shape: one combinable count per group, then pure per-row
    noise arithmetic — release cost is O(groups). Determinism: the md5
    nibble-hex parse is exact integer work; sign/ln run on identical
    doubles (agg_mutual_info precedent); the final count rounds to
    integer in both engines."""
    t = load(spark, sf_dir)
    g = t.customer.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("true_n"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{DP_RELEASE}:"),
                        F.col("c_nationkey").cast("string"),
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 999_999
        # +0.5 keeps |s| < 0.5 strictly: s = -0.5 exactly would make
        # ln(1 - 2|s|) = -inf, which Spark clamps but DuckDB's
        # CAST(ROUND(-inf) AS BIGINT) errors out.
        + 0.5
    ) / 1_000_000.0 - 0.5
    noise = (
        (1.0 / DP_EPSILON)
        * F.when(u >= 0, 1).otherwise(-1)
        * F.log(1 - 2 * F.abs(u))
    )
    return g.select(
        F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
        F.greatest(
            F.lit(0), F.round(F.col("true_n") - noise).cast("bigint")
        ).cast("bigint").alias("dp_count"),
        F.lit(DP_EPSILON).alias("epsilon"),
        F.round(F.lit(1.0 / DP_EPSILON), 4).alias("laplace_scale"),
    )


#: t-closeness release threshold (Li, Li & Venkatasubramanian 2007's
#: illustrative t): a QI class whose sensitive-attribute distribution
#: sits further than this EMD from the global one leaks attribute
#: information even when k-anonymity and l-diversity both pass.
T_CLOSE_MAX = 0.2

_T_CLOSE_ORACLE = f"""
    WITH joined AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / {ACCTBAL_BAND}) AS BIGINT) AS bal_band,
             o_orderpriority
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    pr AS (SELECT DISTINCT o_orderpriority FROM joined),
    cls AS (
      SELECT DISTINCT c_nationkey, c_mktsegment, bal_band FROM joined
    ),
    cell AS (
      SELECT cls.c_nationkey, cls.c_mktsegment, cls.bal_band,
             pr.o_orderpriority,
             COALESCE(j.c, 0) AS c
      FROM cls CROSS JOIN pr
      LEFT JOIN (
        SELECT c_nationkey, c_mktsegment, bal_band, o_orderpriority,
               COUNT(*) AS c
        FROM joined GROUP BY 1, 2, 3, 4
      ) j USING (c_nationkey, c_mktsegment, bal_band, o_orderpriority)
    ),
    gdist AS (
      SELECT o_orderpriority, COUNT(*) AS g,
             SUM(COUNT(*)) OVER () AS big_n,
             COUNT(*) OVER () AS m
      FROM joined GROUP BY o_orderpriority
    ),
    cum AS (
      SELECT cell.c_nationkey, cell.c_mktsegment, cell.bal_band,
             cell.o_orderpriority,
             SUM(cell.c) OVER (PARTITION BY cell.c_nationkey,
                               cell.c_mktsegment, cell.bal_band
                               ORDER BY cell.o_orderpriority) AS cum_c,
             SUM(cell.c) OVER (PARTITION BY cell.c_nationkey,
                               cell.c_mktsegment, cell.bal_band) AS n_cls,
             SUM(gdist.g) OVER (PARTITION BY cell.c_nationkey,
                               cell.c_mktsegment, cell.bal_band
                               ORDER BY cell.o_orderpriority) AS cum_g,
             gdist.big_n, gdist.m
      FROM cell JOIN gdist USING (o_orderpriority)
    ),
    emd AS (
      SELECT c_nationkey, c_mktsegment, bal_band,
             MAX(n_cls) AS n,
             SUM(CASE WHEN o_orderpriority <> (SELECT MAX(o_orderpriority)
                                               FROM pr)
                      THEN abs(big_n * cum_c - n_cls * cum_g)
                      ELSE 0 END) AS numer,
             MAX(big_n) AS big_n, MAX(m) AS m
      FROM cum GROUP BY 1, 2, 3
    )
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
           c_mktsegment,
           bal_band,
           CAST(n AS BIGINT) AS n,
           ROUND(numer / (CAST(n AS DOUBLE) * big_n * (m - 1)), 6)
             AS emd,
           numer / (CAST(n AS DOUBLE) * big_n * (m - 1)) <= {T_CLOSE_MAX}
             AS t_close_ok
    FROM emd
"""


@register("privacy_t_closeness", oracle=_T_CLOSE_ORACLE)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit per QI class (nation, segment, balance band):
    ordinal earth-mover's distance between each class's order-priority
    distribution and the GLOBAL one, judged at t <= {T_CLOSE_MAX} — the
    third rung of the release ladder (privacy_k_anonymity counts class
    sizes, privacy_l_diversity counts distinct sensitive values; this
    catches the skew attack both miss, where a class is big and diverse
    but 90% one priority). For an ordered attribute EMD reduces to the
    mean absolute difference of the cumulative distributions.

    Scale/determinism: facts reduce to the (QI x priority)-DOMAIN cell
    frame (combinable counts; the dense cross join is class-count x 5
    rows); each cumulative-gap term is the EXACT INTEGER
    |N*cumC - n*cumG| (common-denominator rationals, no float
    accumulation), so the EMD is one exact integer fold per class
    divided once at the end."""
    t = load(spark, sf_dir)
    joined = t.orders.join(
        t.customer.select(
            F.col("c_custkey").alias("o_custkey"),
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / ACCTBAL_BAND)
            .cast("bigint")
            .alias("bal_band"),
        ),
        "o_custkey",
    ).select("c_nationkey", "c_mktsegment", "bal_band", "o_orderpriority")
    qi = ["c_nationkey", "c_mktsegment", "bal_band"]
    counts = joined.groupBy(*qi, "o_orderpriority").agg(
        F.count(F.lit(1)).alias("c")
    )
    glob = joined.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("g"))
    w_all = Window.partitionBy()
    glob = glob.select(
        "o_orderpriority",
        "g",
        F.sum("g").over(w_all).alias("big_n"),
        F.count(F.lit(1)).over(w_all).alias("m"),
        F.max("o_orderpriority").over(w_all).alias("last_p"),
    )
    cls = counts.select(*qi).distinct()
    dense = cls.crossJoin(F.broadcast(glob)).join(
        counts, [*qi, "o_orderpriority"], "left"
    ).fillna({"c": 0})
    w_cum = Window.partitionBy(*qi).orderBy("o_orderpriority")
    w_cls = Window.partitionBy(*qi)
    cum = dense.select(
        *qi,
        "o_orderpriority",
        "big_n",
        "m",
        "last_p",
        F.sum("c").over(w_cum).alias("cum_c"),
        F.sum("c").over(w_cls).alias("n_cls"),
        F.sum("g").over(w_cum).alias("cum_g"),
    )
    emd_units = F.sum(
        F.when(
            F.col("o_orderpriority") != F.col("last_p"),
            F.abs(
                F.col("big_n") * F.col("cum_c")
                - F.col("n_cls") * F.col("cum_g")
            ),
        ).otherwise(F.lit(0))
    )
    out = cum.groupBy(*qi).agg(
        F.max("n_cls").alias("n"),
        emd_units.alias("numer"),
        F.max("big_n").alias("big_n"),
        F.max("m").alias("m"),
    )
    emd = F.col("numer") / (
        F.col("n").cast("double") * F.col("big_n") * (F.col("m") - 1)
    )
    return out.select(
        F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
        "c_mktsegment",
        "bal_band",
        F.col("n").cast("bigint").alias("n"),
        F.round(emd, 6).alias("emd"),
        (emd <= T_CLOSE_MAX).alias("t_close_ok"),
    )


#: Generalization ladder: candidate account-balance band widths, from
#: the shipped QI's 1000 to coarser releases.
GENERALIZATION_BANDS = (500, 1000, 2000, 4000)

_GEN_LADDER_ORACLE = f"""
    WITH bands AS (
      SELECT * FROM (VALUES {", ".join(f"({b})" for b in GENERALIZATION_BANDS)})
        AS t(band_width)
    ),
    classes AS (
      SELECT b.band_width, c.c_nationkey, c.c_mktsegment,
             CAST(floor(c.c_acctbal / b.band_width) AS BIGINT) AS bal_band,
             COUNT(*) AS k
      FROM customer c CROSS JOIN bands b
      GROUP BY 1, 2, 3, 4
    )
    SELECT band_width,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(k) AS BIGINT) AS k_anonymity,
           ROUND(SUM(CASE WHEN k < {K_ANON_MIN} THEN k ELSE 0 END)
                 / CAST(SUM(k) AS DOUBLE), 6) AS risk_row_share,
           MIN(k) >= {K_ANON_MIN} AS releasable
    FROM classes GROUP BY band_width
"""


@register("privacy_generalization_ladder", oracle=_GEN_LADDER_ORACLE)
def privacy_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity across a LADDER of generalization levels (balance
    band widths {GENERALIZATION_BANDS}) in one pass — the question
    privacy_k_anonymity's single-level audit raises but cannot answer:
    HOW FAR must the quasi-identifier coarsen before the table is
    releasable (min class size >= {K_ANON_MIN})? One row per level
    with its k, at-risk row share, and the release verdict — pick the
    finest releasable rung and you have priced the utility cost of
    privacy in band width.

    Scale/determinism: the ladder cross join multiplies the CUSTOMER
    scan by |bands| = {len(GENERALIZATION_BANDS)} (one combinable
    aggregate per level, same shuffle); at 100 TB you'd band-assign all
    levels in ONE projection pass the same way. Exact integers + one
    exact division per rung."""
    t = load(spark, sf_dir)
    bands = spark.createDataFrame(
        [(b,) for b in GENERALIZATION_BANDS], "band_width int"
    )
    classes = (
        t.customer.select("c_nationkey", "c_mktsegment", "c_acctbal")
        .crossJoin(F.broadcast(bands))
        .groupBy(
            "band_width",
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / F.col("band_width"))
            .cast("bigint")
            .alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).alias("k"))
    )
    return classes.groupBy("band_width").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("k").cast("bigint").alias("k_anonymity"),
        F.round(
            F.sum(F.when(F.col("k") < K_ANON_MIN, F.col("k")).otherwise(0))
            / F.sum("k").cast("double"),
            6,
        ).alias("risk_row_share"),
        (F.min("k") >= K_ANON_MIN).alias("releasable"),
    )


#: Pseudonymization salt. In production this is a managed secret; a
#: literal here keeps both engines bit-identical.
PSEUDO_SALT = "dip-pseudo-v1"

_PSEUDO_ORACLE = f"""
    WITH c AS (
      SELECT c_custkey,
             substr(sha256('{PSEUDO_SALT}' || CAST(c_custkey AS VARCHAR)),
                    1, 16) AS token
      FROM customer
    ),
    o AS (
      SELECT o_custkey,
             substr(sha256('{PSEUDO_SALT}' || CAST(o_custkey AS VARCHAR)),
                    1, 16) AS token,
             o_totalprice
      FROM orders
    ),
    joined AS (
      SELECT c.token, COUNT(o.o_custkey) AS n_orders,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM c LEFT JOIN o ON o.token = c.token
      GROUP BY c.token
    ),
    audit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct_tokens,
             CAST(SUM(n_orders) AS BIGINT) AS joined_orders
      FROM joined
    )
    SELECT j.token, CAST(j.n_orders AS BIGINT) AS n_orders,
           ROUND(COALESCE(j.cents, 0) / 100.0, 2) AS revenue,
           a.n_tokens = a.n_distinct_tokens AS tokens_collision_free,
           a.joined_orders = (SELECT COUNT(*) FROM orders)
             AS referential_integrity
    FROM joined j, audit a
    ORDER BY j.n_orders DESC, j.token LIMIT 20
"""


@register("privacy_pseudonymize", oracle=_PSEUDO_ORACLE)
def privacy_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed pseudonymization with a referential-integrity proof: the
    customer key is replaced by a salted SHA-256 token in BOTH the
    customer and orders tables, then the per-token order rollup runs
    ENTIRELY in token space — demonstrating the GDPR-style
    pseudonymization contract (analyses still join; identities need
    the salt) that privacy_k_anonymity's generalization ladder can't
    give (it destroys joinability). The audit columns prove no token
    collision and no orders dropped by tokenization.

    Scale/determinism: tokenization is a per-row hash projection (no
    shuffle added — the join shuffles on the token exactly as it would
    on the raw key, same cardinality); SHA-256 of identical salted
    strings is identical in both engines; top-20 by (n_orders, token)
    is a bounded deterministic slice."""
    t = load(spark, sf_dir)
    tok = lambda c: F.substring(  # noqa: E731
        F.sha2(F.concat(F.lit(PSEUDO_SALT), F.col(c).cast("string")), 256),
        1,
        16,
    )
    c = t.customer.select(tok("c_custkey").alias("token"))
    o = t.orders.select(
        tok("o_custkey").alias("token"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    joined = (
        c.join(o, "token", "left")
        .groupBy("token")
        .agg(
            F.count("cents").cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
    )
    n_orders_total = t.orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("total_orders")
    )
    audit = joined.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("token").alias("n_distinct_tokens"),
        F.sum("n_orders").cast("bigint").alias("joined_orders"),
    )
    return (
        joined.crossJoin(audit)
        .crossJoin(n_orders_total)
        .select(
            "token",
            "n_orders",
            F.round(F.coalesce(F.col("sum_cents"), F.lit(0)) / 100.0, 2).alias(
                "revenue"
            ),
            (F.col("n_tokens") == F.col("n_distinct_tokens")).alias(
                "tokens_collision_free"
            ),
            (F.col("joined_orders") == F.col("total_orders")).alias(
                "referential_integrity"
            ),
        )
        .orderBy(F.desc("n_orders"), "token")
        .limit(20)
    )


#: Small-cell suppression threshold (the census-style "rule of 5").
SUPPRESS_MIN_CELL = 5

_SUPPRESS_ORACLE = f"""
    WITH cells AS (
      SELECT c.c_nationkey AS nation, o.o_orderpriority AS priority,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    flagged AS (
      SELECT nation, priority, n, cents,
             n < {SUPPRESS_MIN_CELL} AS primary_suppressed
      FROM cells
    ),
    rowstat AS (
      SELECT nation,
             SUM(CASE WHEN primary_suppressed THEN 1 ELSE 0 END) AS n_supp
      FROM flagged GROUP BY nation
    ),
    marked AS (
      SELECT f.nation, f.priority, f.n, f.cents, f.primary_suppressed,
             -- complementary suppression: if EXACTLY ONE cell in the row
             -- is primary-suppressed, the row total would reveal it, so
             -- the smallest unsuppressed sibling suppresses too
             (NOT f.primary_suppressed) AND r.n_supp = 1
               AND f.n = (SELECT MIN(g.n) FROM flagged g
                          WHERE g.nation = f.nation
                            AND NOT g.primary_suppressed)
               AS complementary_suppressed
      FROM flagged f JOIN rowstat r USING (nation)
    )
    SELECT CAST(nation AS BIGINT) AS nation, priority,
           CASE WHEN primary_suppressed OR complementary_suppressed
                THEN NULL ELSE CAST(n AS BIGINT) END AS n_orders,
           CASE WHEN primary_suppressed OR complementary_suppressed
                THEN NULL ELSE ROUND(cents / 100.0, 2) END AS revenue,
           primary_suppressed, complementary_suppressed
    FROM marked
"""


@register("privacy_suppression_smallcell", oracle=_SUPPRESS_ORACLE)
def privacy_suppression_smallcell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-cell suppression for the nation x priority order report:
    cells under {SUPPRESS_MIN_CELL} orders blank out (primary), and when
    a row has exactly ONE suppressed cell its smallest unsuppressed
    sibling blanks too (complementary — otherwise the row total
    subtracts the secret right back out). The census/healthcare
    disclosure-control rule that publication pipelines apply AFTER
    privacy_k_anonymity passes (k-anonymity bounds re-identification;
    suppression bounds small-count DIFFERENCING), emitting the
    suppression flags so auditors see what was withheld and why.

    Scale/determinism: facts fold to the (nation x priority) CELL
    domain first; the sibling-minimum rule runs as windows over that
    bounded frame; the flag tests n == MIN(n), so cells tied on the
    minimum suppress together — documented and identical in both
    engines."""
    t = load(spark, sf_dir)
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    cells = (
        t.orders.join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).cast("bigint").alias("cents"),
        )
    )
    prim = F.col("n") < SUPPRESS_MIN_CELL
    w_row = Window.partitionBy("nation")
    flagged = cells.select(
        "nation",
        "priority",
        "n",
        "cents",
        prim.alias("primary_suppressed"),
        F.sum(prim.cast("int")).over(w_row).alias("n_supp"),
        F.min(F.when(~prim, F.col("n"))).over(w_row).alias("min_open"),
    )
    comp = (
        (~F.col("primary_suppressed"))
        & (F.col("n_supp") == 1)
        & (F.col("n") == F.col("min_open"))
    )
    hidden = F.col("primary_suppressed") | comp
    return flagged.select(
        F.col("nation").cast("bigint").alias("nation"),
        "priority",
        F.when(~hidden, F.col("n").cast("bigint")).alias("n_orders"),
        F.when(~hidden, F.round(F.col("cents") / 100.0, 2)).alias("revenue"),
        "primary_suppressed",
        comp.alias("complementary_suppressed"),
    )
