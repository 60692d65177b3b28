"""Joins (SURVEY.md section 2 B3).

The reference's only join-like construct is the dedup probe against sink
state: an equi-join on the (name, size, mtime) identity triple with
anti-join semantics (A16 child.py:174-191, A17
scrap/child_otherftp.py:280-298). join_semi/join_anti generalize it; the
rest are north-star extensions on the TPC-H-ish tables.

Scale strategy per join:
- small x large  -> broadcast() hint, no shuffle of the big side;
- large x large  -> shuffled hash / sort-merge on the equi key (AQE picks,
  and splits skewed partitions);
- non-equi band  -> broadcast nested-loop with a TINY broadcast side only;
- as-of          -> no built-in: union + last(ignoreNulls) over a
  user-partitioned window = ONE shuffle on the partition key, instead of a
  quadratic range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import register


@register(
    "join_inner_hash",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus,
           ROUND(l.l_extendedprice * (1 - l.l_discount), 4) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join, planner's choice of physical strategy (shuffled
    hash / sort-merge; AQE may downgrade to broadcast after the filter).
    The status filter is pushed below the join into the orders scan."""
    t = load(spark, sf_dir)
    o = t.orders.where(F.col("o_orderstatus") == "F")
    return t.lineitem.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_linenumber",
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
    )


@register(
    "join_broadcast",
    oracle="""
    SELECT c.c_custkey, n.n_name, r.r_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dim broadcast chain (nation: 25 rows, region: 5). broadcast()
    pins BroadcastHashJoin so the customer side never shuffles — at 100 TB
    this is the difference between a map-side join and a full exchange."""
    t = load(spark, sf_dir)
    return (
        t.customer.join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name", "r_name")
    )


@register(
    "join_sort_merge",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_sort_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large x large equi join pinned to sort-merge via the MERGE hint.
    Both sides shuffle once on the join key; the following aggregation
    reuses nothing — at scale, bucketing both tables on o_orderkey removes
    this exchange entirely."""
    t = load(spark, sf_dir)
    joined = t.lineitem.join(
        t.orders.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, big.n_big, ROUND(big.max_price, 2) AS max_price
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS n_big, MAX(o_totalprice) AS max_price
      FROM orders WHERE o_totalprice > 400000
      GROUP BY o_custkey
    ) big ON c.c_custkey = big.o_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null extension (customers without a qualifying
    order keep NULL measure columns). Aggregate-then-join keeps the right
    side small enough for AQE to broadcast."""
    t = load(spark, sf_dir)
    big = (
        t.orders.where(F.col("o_totalprice") > 400000)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_big"),
            F.max("o_totalprice").alias("max_price"),
        )
    )
    return t.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left"
    ).select(
        "c_custkey",
        "c_mktsegment",
        "n_big",
        F.round("max_price", 2).alias("max_price"),
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT c.nationkey AS cust_nation, s.nationkey AS supp_nation
    FROM (SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000) c
    FULL JOIN (SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000) s
      ON c.nationkey = s.nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: rows surviving on either side only get NULL
    extension on the other."""
    t = load(spark, sf_dir)
    c = (
        t.customer.where(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("cust_nation"))
        .distinct()
    )
    s = (
        t.supplier.where(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("supp_nation"))
        .distinct()
    )
    return c.join(s, F.col("cust_nation") == F.col("supp_nation"), "full").select(
        "cust_nation", "supp_nation"
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000
    )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join — existence probe, emits the left row at most once.
    This is the positive half of the reference's dedup probe (A16/A17)."""
    t = load(spark, sf_dir)
    big = t.orders.where(F.col("o_totalprice") > 450000)
    return t.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join — absence probe. Direct generalization of the
    reference's dedup-skip: upload only files NOT already present in sink
    state (scrap/child_otherftp.py:280-298)."""
    t = load(spark, sf_dir)
    big = t.orders.where(F.col("o_totalprice") > 400000)
    return t.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


#: price-band dimension for the theta join (covers p_retailprice 900-1000)
PRICE_BANDS: list[tuple[int, float, float]] = [
    (0, 900.0, 925.0),
    (1, 925.0, 950.0),
    (2, 950.0, 975.0),
    (3, 975.0, 1000.0),
]


def _bands_values() -> str:
    return ",\n      ".join(f"({b}, {lo}, {hi})" for b, lo, hi in PRICE_BANDS)


@register(
    "join_theta_range",
    oracle=f"""
    SELECT p.p_partkey, b.band_id
    FROM part p
    JOIN (VALUES
      {_bands_values()}) AS b(band_id, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi band join. Physical plan: BroadcastNestedLoopJoin with the
    4-row band table broadcast — the only sane shape for theta joins at
    scale (never NLJ two large sides; bucketize instead)."""
    t = load(spark, sf_dir)
    bands = spark.createDataFrame(PRICE_BANDS, "band_id int, lo double, hi double")
    cond = (F.col("p_retailprice") >= F.col("lo")) & (
        F.col("p_retailprice") < F.col("hi")
    )
    return t.part.join(F.broadcast(bands), cond).select("p_partkey", "band_id")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_id: str,
    matched_col: str = "matched_id",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """Engine API: as-of LEFT join — every `left` row gets the `right_id`
    of the nearest `right` row with the same `on` key: the latest with
    right_ts <= left_ts (direction="backward", default) or the earliest
    with right_ts >= left_ts ("forward"); NULL when none exists, or when
    the match is further than `tolerance` (a SQL interval body like
    "1 HOUR"). Spark has no ASOF JOIN, so: union both sides tagged, ONE
    window partitioned by the key ordered by (ts, tag, id), and
    last/first over a one-sided frame carries the nearest right-row
    (ts, id) struct onto each left row. ONE shuffle on the key — linear,
    vs the quadratic naive range join. The tag ordering makes ts-equal
    right rows visible in both directions (matching >= / <= inclusive).
    Requires `right_id` to be non-null on the right side."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    back = direction == "backward"
    # right sorts before left at equal ts for backward, after for forward,
    # so the equal-ts right row lands inside the one-sided frame either way.
    rtag, ltag = (0, 1) if back else (1, 0)
    lcols = left.columns
    r = right.select(
        F.col(on).alias(on),
        F.col(right_ts).alias("_ts"),
        F.col(right_id).alias("_rid"),
        F.lit(rtag).alias("_tag"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c != on],
    )
    l = left.select(
        on,
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(dict(right.dtypes)[right_id]).alias("_rid"),
        F.lit(ltag).alias("_tag"),
        *[F.col(c) for c in lcols if c != on],
    )
    pair = F.when(
        F.col("_rid").isNotNull(),
        F.struct(F.col("_ts").alias("rts"), F.col("_rid").alias("rid")),
    )
    w = Window.partitionBy(on).orderBy("_ts", "_tag", "_rid")
    if back:
        nearest = F.last(pair, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        nearest = F.first(pair, ignorenulls=True).over(
            w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
    merged = r.unionByName(l).withColumn("_m", nearest)
    matched = F.col("_m.rid")
    if tolerance is not None:
        bound = F.expr(f"INTERVAL {tolerance}")
        in_tol = (
            F.col("_m.rts") >= F.col("_ts") - bound
            if back
            else F.col("_m.rts") <= F.col("_ts") + bound
        )
        matched = F.when(in_tol, matched)
    return (
        merged.where(F.col("_tag") == ltag)
        .select(*lcols, matched.alias(matched_col))
    )


@register(
    "join_asof_time",
    oracle="""
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           c.event_id AS click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    prior-or-equal click, via the asof_join engine API (SURVEY.md B3
    'window trick'; see asof_join for the single-shuffle argument)."""
    t = load(spark, sf_dir)
    ev = t.events
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    res = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_id="event_id",
        matched_col="click_id",
    )
    return res.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        "click_id",
    )


@register(
    "join_interval_overlap",
    oracle="""
    SELECT a.o_orderkey AS a_key, b.o_orderkey AS b_key
    FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS s,
                 CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS e
          FROM orders WHERE o_orderkey < 200) a
    JOIN (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS s,
                 CAST(o_orderdate + INTERVAL 45 DAY AS DATE) AS e
          FROM orders WHERE o_orderkey >= 200 AND o_orderkey < 400) b
      ON a.s < b.e AND b.s < a.e
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap via conjunctive range predicates (s1 < e2 AND
    s2 < e1). Small side broadcast; for two LARGE interval sets, the scale
    path is binning each interval to fixed-width buckets and equi-joining
    on bucket id before the residual predicate."""
    t = load(spark, sf_dir)
    a = t.orders.where(F.col("o_orderkey") < 200).select(
        F.col("o_orderkey").alias("a_key"),
        F.to_date("o_orderdate").alias("a_s"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("a_e"),
    )
    b = t.orders.where((F.col("o_orderkey") >= 200) & (F.col("o_orderkey") < 400)).select(
        F.col("o_orderkey").alias("b_key"),
        F.to_date("o_orderdate").alias("b_s"),
        F.date_add(F.to_date("o_orderdate"), 45).alias("b_e"),
    )
    cond = (F.col("a_s") < F.col("b_e")) & (F.col("b_s") < F.col("a_e"))
    return a.join(F.broadcast(b), cond).select("a_key", "b_key")


@register(
    "join_range_bucketed",
    oracle="""
    SELECT a.o_orderkey AS a_key, b.o_orderkey AS b_key
    FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS s,
                 CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS e
          FROM orders WHERE o_orderkey < 200) a
    JOIN (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS s,
                 CAST(o_orderdate + INTERVAL 45 DAY AS DATE) AS e
          FROM orders WHERE o_orderkey >= 200 AND o_orderkey < 400) b
      ON a.s < b.e AND b.s < a.e
    """,
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path for interval-overlap joins (the plan
    join_interval_overlap's docstring promises): bin every interval into
    fixed-width date buckets (explode), equi-join on bucket id, apply the
    overlap predicate as a residual, dedup pairs that collide in several
    buckets. Identical relation to the naive theta join — the oracle is
    the SAME SQL — but the join is a shuffled HASH join on bucket id:
    both sides can be arbitrarily large, no broadcast or nested loop
    required. Bucket width trades fan-out (intervals span few buckets)
    against selectivity (few residual misses); 30 days matches the
    interval scale here."""
    t = load(spark, sf_dir)
    bucket_days = 30
    day = F.lit(86400)

    def with_buckets(df, key_min, key_max, span_days, prefix):
        iv = df.where((F.col("o_orderkey") >= key_min) & (F.col("o_orderkey") < key_max)).select(
            F.col("o_orderkey").alias(f"{prefix}_key"),
            F.to_date("o_orderdate").alias(f"{prefix}_s"),
            F.date_add(F.to_date("o_orderdate"), span_days).alias(f"{prefix}_e"),
        )
        b_lo = F.floor(F.unix_timestamp(F.col(f"{prefix}_s").cast("timestamp")) / (day * bucket_days))
        b_hi = F.floor(F.unix_timestamp(F.col(f"{prefix}_e").cast("timestamp")) / (day * bucket_days))
        return iv.withColumn("bucket", F.explode(F.sequence(b_lo, b_hi)))

    a = with_buckets(t.orders, 0, 200, 30, "a")
    b = with_buckets(t.orders, 200, 400, 45, "b")
    overlap = (F.col("a_s") < F.col("b_e")) & (F.col("b_s") < F.col("a_e"))
    return (
        a.join(b, "bucket")
        .where(overlap)
        .select("a_key", "b_key")
        .dropDuplicates(["a_key", "b_key"])
    )


@register(
    "join_asof_forward",
    oracle="""
    SELECT p.event_id, p.user_id, c.event_id AS next_click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each purchase matched to the user's EARLIEST
    following-or-equal click (did the user come back?). Same single
    window shuffle as the backward variant, with the one-sided frame
    flipped to [current, unbounded following]."""
    t = load(spark, sf_dir)
    ev = t.events
    return asof_join(
        ev.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        ),
        ev.where(F.col("event_type") == "click"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_id="event_id",
        matched_col="next_click_id",
        direction="forward",
    ).select("event_id", "user_id", "next_click_id")


@register(
    "join_asof_tolerance",
    oracle="""
    SELECT p.event_id, p.user_id,
           CASE WHEN c.ts >= p.ts - INTERVAL 1 HOUR THEN c.event_id END
             AS recent_click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded as-of join: nearest prior click only if within 1 hour of
    the purchase (attribution-window semantics). The tolerance test runs
    on the carried (ts, id) struct AFTER the window pass, so it adds no
    join or shuffle — exactly how pandas.merge_asof's tolerance behaves,
    pinned against DuckDB ASOF + CASE."""
    t = load(spark, sf_dir)
    ev = t.events
    return asof_join(
        ev.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        ),
        ev.where(F.col("event_type") == "click"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_id="event_id",
        matched_col="recent_click_id",
        tolerance="1 HOUR",
    ).select("event_id", "user_id", "recent_click_id")


@register(
    "join_asof_nearest",
    oracle="""
    SELECT p.event_id, p.user_id,
           CASE
             WHEN b.event_id IS NOT NULL AND f.event_id IS NOT NULL THEN
               CASE WHEN p.ts - b.ts <= f.ts - p.ts THEN b.event_id
                    ELSE f.event_id END
             ELSE coalesce(b.event_id, f.event_id)
           END AS nearest_click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
      ON p.user_id = b.user_id AND p.ts >= b.ts
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') f
      ON p.user_id = f.user_id AND p.ts <= f.ts
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (pandas merge_asof direction='nearest'): the
    closest click on EITHER side of each purchase, ties to the earlier
    one. Composed from one backward and one forward pass — each is the
    single-shuffle window union, and both windows partition on the same
    user_id key, so the second pass reuses the first's exchange layout.
    The arbitration (compare the two carried timestamps) is a pure
    projection."""
    t = load(spark, sf_dir)
    ev = t.events
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    # carry matched ts through each direction by joining the click side back
    back = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_id="event_id", matched_col="b_id",
    )
    both = asof_join(
        back, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_id="event_id", matched_col="f_id", direction="forward",
    )
    bts = clicks.select(F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts"))
    fts = clicks.select(F.col("event_id").alias("f_id"), F.col("ts").alias("f_ts"))
    armed = both.join(F.broadcast(bts), "b_id", "left").join(
        F.broadcast(fts), "f_id", "left"
    )
    nearest = (
        F.when(
            F.col("b_id").isNotNull() & F.col("f_id").isNotNull(),
            F.when(
                # microsecond-exact arithmetic: a seconds-granular cast
                # would collapse sub-second gaps and flip ties vs the
                # oracle's INTERVAL comparison
                F.unix_micros("ts") - F.unix_micros("b_ts")
                <= F.unix_micros("f_ts") - F.unix_micros("ts"),
                F.col("b_id"),
            ).otherwise(F.col("f_id")),
        )
        .otherwise(F.coalesce("b_id", "f_id"))
    )
    return armed.select(
        "event_id", "user_id", nearest.alias("nearest_click_id")
    )


@register(
    "join_null_safe",
    oracle="""
    SELECT c.k AS join_key, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM (SELECT NULLIF(c_nationkey, 3) AS k FROM customer) c
    JOIN (SELECT NULLIF(s_nationkey, 3) AS k FROM supplier) s
      ON c.k IS NOT DISTINCT FROM s.k
    GROUP BY c.k
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
    each other instead of silently vanishing — the semantics a dedup join
    on nullable identity columns needs (a regular equi join would drop
    every NULL-keyed row, under-reporting duplicates). Nationkey 3 is
    mapped to NULL on both sides to force a populated NULL group. Spark
    still plans this as a hash-partitioned equi join (the <=> key
    shuffles as coalesce(k, sentinel) internally) — no nested loop."""
    t = load(spark, sf_dir)
    c = t.customer.select(F.nullif(F.col("c_nationkey"), F.lit(3)).alias("ck"))
    s = t.supplier.select(F.nullif(F.col("s_nationkey"), F.lit(3)).alias("sk"))
    return (
        c.join(s, F.col("ck").eqNullSafe(F.col("sk")))
        .groupBy(F.col("ck").alias("join_key"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "join_existence_or",
    oracle="""
    SELECT c_custkey, ROUND(c_acctbal, 2) AS c_acctbal
    FROM customer c
    WHERE c_acctbal > 9000
       OR EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_existence_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS under a disjunction: `local_pred OR EXISTS(...)` cannot
    decorrelate to a plain semi join (rows failing the subquery must
    survive when the local predicate holds), so Catalyst plans an
    ExistenceJoin — a join that ADDS a boolean 'matched' column instead
    of filtering, with the OR evaluated afterward. The third join
    semantic next to semi/anti (B3), and the reason disjunctive dedup
    policies (A16's match-OR-rename) stay single-pass on the engine."""
    t = load(spark, sf_dir)
    t.customer.createOrReplaceTempView("customer")
    t.orders.createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT c_custkey, ROUND(c_acctbal, 2) AS c_acctbal
        FROM customer c
        WHERE c_acctbal > 9000
           OR EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    """)
