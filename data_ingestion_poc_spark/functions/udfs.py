"""UDF surface demonstration (SURVEY.md section 2 B10 `udf_surface`).

The engine's UDF strategy (SURVEY.md section 2, "UDF/UDAF/UDTF surface
decision"): built-in Column expressions everywhere possible; when Python is
unavoidable, Arrow-batched pandas UDFs (vectorized, ~10-100x faster than
row-at-a-time); plain scalar @udf only for inherently per-row side-effecting
work (the ingest fetch stage, pipeline.py); @udtf for 1->N row generation;
applyInPandas for grouped-map logic; applyInPandasWithState for streaming
state (streaming/batch_parity.py).

Both queries here are ORACLE-CHECKED: every UDF computes something a pure
SQL expression can reproduce, so DuckDB verifies the Python results
bit-for-bit. That is the point — the UDF plumbing (serialization, Arrow
batching, schema contracts) is what is under test, not novel math.

Scale notes (100 TB): the scalar @udf column is deliberately the slow path
and documented as such; the pandas UDF and applyInPandas stages move
Arrow columnar batches and scale linearly with no shuffle beyond the
grouped-map's own groupBy exchange. The UDTF is a narrow 1->N flatMap --
no shuffle at all, pipeline-parallel per input split.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf
from pyspark.sql.types import IntegerType, StringType

from ..catalog import load, register_views
from ..llm.textstats import TOKEN_RE
from ..registry import register

ZSCHEMA = (
    "doc_id bigint, lang string, rev_words string, n_tokens int, z_chars double"
)


# DataType objects, not DDL strings: DDL parsing happens lazily and can
# land inside a Python worker with no active session.
@F.udf(StringType())
def _rev_words(text):
    # Row-at-a-time scalar UDF: the deliberately-slow path, kept tiny.
    if text is None:
        return None
    return " ".join(reversed(text.split(" ")))


@F.pandas_udf(IntegerType())
def _n_tokens(texts: pd.Series) -> pd.Series:
    # Vectorized over Arrow batches; pandas' regex count == DuckDB's
    # len(regexp_extract_all(...)) (non-overlapping matches).
    return texts.str.count(TOKEN_RE).astype("int32")


def _lang_zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    # Grouped-map: per-language z-score of document length. ddof=1 matches
    # SQL STDDEV_SAMP; the raw double is rounded Spark-side for parity.
    mu = pdf["n_chars"].mean()
    sd = pdf["n_chars"].std(ddof=1)
    out = pdf[["doc_id", "lang", "rev_words", "n_tokens"]].copy()
    out["z_chars"] = (pdf["n_chars"] - mu) / sd
    return out


@register(
    "udf_surface",
    oracle=f"""
    SELECT doc_id, lang,
           array_to_string(list_reverse(string_split(text, ' ')), ' ')
                                                        AS rev_words,
           CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS INTEGER)
                                                        AS n_tokens,
           ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY lang))
                 / STDDEV_SAMP(n_chars) OVER (PARTITION BY lang), 4)
                                                        AS z_chars
    FROM documents
    """,
)
def udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three UDF flavors in one oracle-checked query: scalar @udf
    (word-order reverse), Arrow @pandas_udf (regex token count), and
    groupBy().applyInPandas (per-language length z-score). The fourth
    flavor, applyInPandasWithState, is exercised by `stream_stateful`;
    mapInPandas by the ingest fetch/explode stages (A6-A8, A14 at
    reference child.py:35-81, child.py:94-121)."""
    t = load(spark, sf_dir)
    prepped = t.documents.select(
        "doc_id",
        "lang",
        "n_chars",
        _rev_words("text").alias("rev_words"),
        _n_tokens("text").alias("n_tokens"),
    )
    z = prepped.groupBy("lang").applyInPandas(_lang_zscore, schema=ZSCHEMA)
    return z.withColumn("z_chars", F.round("z_chars", 4))


@udtf(returnType="doc_id: bigint, pos: bigint, word: string")
class WordExplode:
    """Python UDTF: 1->N flatMap of a document into positioned words —
    the same generator shape as the ingest zip-explode (A14, reference
    child.py:94-121), but pure so DuckDB can oracle-check it."""

    def eval(self, doc_id: int, text: str):
        if text is None:
            return
        for i, w in enumerate(text.split(" "), start=1):
            yield doc_id, i, w


@register(
    "udtf_explode",
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(1, len(string_split(text, ' ')) + 1))
                AS BIGINT)                        AS pos,
           unnest(string_split(text, ' '))        AS word
    FROM documents
    """,
)
def udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral-join a Python UDTF against the documents table: each doc
    row fans out to one row per word with its 1-based position."""
    register_views(spark, sf_dir)
    spark.udtf.register("word_explode", WordExplode)
    return spark.sql(
        """
        SELECT t.doc_id, t.pos, t.word
        FROM documents d, LATERAL word_explode(d.doc_id, d.text) t
        """
    )


def _merge_asof_group(purchases: pd.DataFrame, clicks: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas cogroup function: a backward as-of match within one
    BUCKET of users (r15 — the cogroup key is a hash bucket, not a
    single user; see udf_cogrouped's docstring for why).

    r14 made the inner match a NumPy searchsorted instead of
    pd.merge_asof (merge_asof's ~1 ms per-call setup x n_users
    dominated; guide §4.3). r15 removes the remaining per-USER cost —
    one Python invocation plus two pandas frames per user — by
    regrouping MANY users inside one kernel call: both sides are
    merged into a single (user, ts, kind) lexsort with clicks ordered
    BEFORE purchases at equal ts (the allow_exact_matches rule), and
    the latest preceding click is a running maximum-accumulate of
    click positions, validated against the user of the row it points
    at (a carried-over click from the previous user segment fails the
    user check and yields NULL). Per-user semantics are identical to
    the per-key searchsorted: the LATEST click with c.ts <= p.ts,
    ties on (user, ts) resolved by the same stable original order the
    old argsort used (vacuous on the fixture's per-user-unique
    timestamps), NULL where no click precedes."""
    import numpy as np

    n = len(purchases)
    if n == 0:
        return pd.DataFrame(
            {
                "event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "click_id": pd.Series(dtype="Int64"),
            }
        )
    p_user = purchases["user_id"].to_numpy()
    p_ts = purchases["ts"].to_numpy()
    if clicks.empty:
        click_id = pd.arrays.IntegerArray(
            np.zeros(n, dtype="int64"), mask=np.ones(n, dtype=bool)
        )
    else:
        c_user = clicks["user_id"].to_numpy()
        c_ts = clicks["ts"].to_numpy()
        c_ids = clicks["event_id"].to_numpy()
        nc = len(c_user)
        users = np.concatenate([c_user, p_user])
        ts = np.concatenate([c_ts, p_ts])
        kind = np.concatenate(
            [np.zeros(nc, dtype=np.int8), np.ones(n, dtype=np.int8)]
        )
        order = np.lexsort((kind, ts, users))
        k_sorted = kind[order]
        u_sorted = users[order]
        pos = np.arange(len(order))
        # most recent click position so far (global); a click from an
        # earlier user segment fails the same-user check below
        ff = np.maximum.accumulate(np.where(k_sorted == 0, pos, -1))
        valid = ff >= 0
        same_user = np.zeros(len(order), dtype=bool)
        same_user[valid] = u_sorted[ff[valid]] == u_sorted[valid]
        is_p = k_sorted == 1
        has = (valid & same_user)[is_p]
        # ff points into the sorted stream; order[...] maps back to the
        # concatenated frame, where positions < nc are clicks
        click_src = order[np.maximum(ff[is_p], 0)]
        matched = np.where(has, c_ids[np.minimum(click_src, nc - 1)], 0)
        # purchases come back in sorted order; map to original rows
        p_orig = order[is_p] - nc
        inv = np.empty(n, dtype=np.int64)
        inv[p_orig] = np.arange(n)
        click_id = pd.arrays.IntegerArray(
            matched[inv].astype("int64"), mask=~has[inv]
        )
    # output row order is free (every consumer canonicalizes rows), so
    # the purchases frame is never sorted or copied
    return pd.DataFrame(
        {
            "event_id": purchases["event_id"].to_numpy(),
            "user_id": p_user,
            "click_id": click_id,
        }
    )


@register(
    "udf_cogrouped",
    oracle="""
    SELECT p.event_id, p.user_id, c.event_id AS click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def udf_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last piece of the UDF surface: CO-GROUPED applyInPandas — two
    DataFrames grouped on the same key, each key's pair of pandas frames
    handed to one Python function (here: pandas merge_asof per user).
    Semantically identical to join_asof_time, and checked against the
    same DuckDB ASOF oracle — demonstrating when-you-must-drop-to-pandas
    with zero correctness loss. Scale note: the JVM window-trick asof
    (operators/joins.py) is the preferred path — this shape exists for
    per-key logic that genuinely needs pandas (model scoring, curve
    fitting); the cogroup still shuffles each side only once on user_id.

    NB merge_asof ties: with allow_exact_matches, pandas takes the LAST
    right row at equal ts only if timestamps are unique per user — the
    events fixture guarantees per-user ts uniqueness, matching the
    window-trick's max-id tiebreak vacuously.

    Scale note 2 (r15, VERDICT r14 item 5): the cogroup KEY is a
    deterministic hash BUCKET of user_id, not user_id itself. Cogrouped
    applyInPandas pays per KEY — one Python function call plus two
    pandas frames — so keying by user serialized n_users tiny frames
    (~1 ms each; this operator's whole residual cost). Bucketing packs
    ~thousands of users per call and the kernel regroups them with one
    vectorized lexsort + running-maximum pass (see _merge_asof_group);
    users are disjoint across buckets, so the result is row-identical.
    Bucket count = 8x the shuffle parallelism — enough keys to spread
    evenly (guide §2.5 synthetic-key note; xxhash64 is deterministic
    under task retry), few enough to amortize the per-key boundary;
    per-bucket memory is rows/B, sized by the same conf that sizes
    every other partition."""
    from ..catalog import load

    t = load(spark, sf_dir)
    ev = t.events
    par = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(8 * par)).alias("b")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", bucket
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", bucket
    )
    return (
        purchases.groupBy("b")
        .cogroup(clicks.groupBy("b"))
        .applyInPandas(
            _merge_asof_group, schema="event_id long, user_id long, click_id long"
        )
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT vec_id, label,
           ROUND(sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                                FOR x IN embedding])), 6) AS l2_norm,
           CAST(len(embedding) AS INTEGER)                AS dim
    FROM embeddings
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy rung below mapInPandas — the UDF receives
    raw pyarrow RecordBatches (no pandas conversion, no index/NaN
    semantics), which is what a vectorized C++/GPU kernel or a
    tensor-library bridge consumes. The batch computes per-row L2 norms
    of the embedding column; the float64 accumulation runs in LIST ORDER
    so the DuckDB oracle's sequential list_sum reproduces it bit-for-bit
    before the 6-dp round."""
    import pyarrow as pa

    def norms(batches):
        for batch in batches:
            vec_ids = batch.column("vec_id")
            labels = batch.column("label")
            embs = batch.column("embedding").to_pylist()
            out = []
            for v in embs:
                s = 0.0
                for x in v:
                    x = float(x)
                    s += x * x
                out.append(round(s**0.5, 6))
            yield pa.RecordBatch.from_arrays(
                [
                    vec_ids,
                    labels,
                    pa.array(out, type=pa.float64()),
                    pa.array([len(v) for v in embs], type=pa.int32()),
                ],
                names=["vec_id", "label", "l2_norm", "dim"],
            )

    t = load(spark, sf_dir)
    return t.embeddings.mapInArrow(
        norms, "vec_id long, label int, l2_norm double, dim int"
    )


#: Integer decay recursion: score = value_units + (9 * prev_score) // 10.
#: Fixed-point on purpose (the graph_pagerank determinism rule): the
#: floor inside the recursion is what makes it NON-associative, so no
#: window algebra can express it — and integer states make the Python
#: recursion and the oracle's WITH RECURSIVE bit-identical.
DECAY_NUM, DECAY_DEN = 9, 10
DECAY_UNIT = 1_000_000


def _decay_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # r14 optimization round: numpy lexsort + preallocated output in
    # place of pandas sort_values/reset_index/assign — the recursion
    # itself must stay a Python loop (non-associative integer floor),
    # but each per-user call's pandas setup dominated it (guide §4.3).
    # int() per element keeps the arithmetic in unbounded Python ints,
    # exactly as before.
    # r15 (VERDICT r14 item 5 applied to the sibling): the group is a
    # hash BUCKET of users; the lexsort orders (user, ts, event_id) and
    # the state resets at each user boundary — per-user recursion
    # identical, n_users fewer Python invocations and pandas frames.
    import numpy as np

    u_raw = pdf["user_id"].to_numpy()
    order = np.lexsort(
        (pdf["event_id"].to_numpy(), pdf["ts"].to_numpy(), u_raw)
    )
    u = u_raw[order]
    v = pdf["v"].to_numpy()[order]
    s = 0
    prev_u = None
    out = np.empty(len(v), dtype="int64")
    for i, x in enumerate(v):
        if u[i] != prev_u:
            s = 0
            prev_u = u[i]
        s = int(x) + (DECAY_NUM * s) // DECAY_DEN
        out[i] = s
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"].to_numpy()[order],
            "user_id": u,
            "decay_units": out,
        }
    )


@register(
    "udf_stateful_decay",
    oracle=f"""
    WITH RECURSIVE e AS (
      SELECT event_id, user_id,
             CAST(floor(value * {DECAY_UNIT}) AS BIGINT) AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    r AS (
      SELECT event_id, user_id, rn, v AS s FROM e WHERE rn = 1
      UNION ALL
      SELECT e.event_id, e.user_id, e.rn,
             e.v + ({DECAY_NUM} * r.s) // {DECAY_DEN}
      FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1
    )
    SELECT event_id, user_id, s AS decay_units FROM r
    """,
)
def udf_stateful_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-decayed engagement score as a STATEFUL
    per-key recursion: score_i = value_i + floor(9 * score_{{i-1}} / 10)
    over the user's events in time order — the recsys/feature-store
    accumulator ("recent activity counts more") in its
    production-realistic integer form. The floor inside the recursion
    makes it non-associative, so NO window-function identity can
    express it (contrast win_ewma, whose float closed form factorizes;
    and win_cusum_drift, whose prefix-min identity rescues max(0, .)) —
    this is the documented escape hatch: applyInPandas over groups,
    each user's history iterated ONCE in sorted order.

    Scale shape: one shuffle on user_id, per-group state is a single
    integer, output rows = input rows. The Arrow batch carries
    (event_id, user_id, v) ints only. Skewed mega-users stream through
    one task each — the same bound any per-key sequential semantics
    implies (Flink keyed state, Spark transformWithState). The oracle
    replays the identical recursion as a WITH RECURSIVE chain, joined
    on rn = prev.rn + 1 per user — integer states, so cross-engine
    equality is exact, not approximate.

    r15: grouped on a hash BUCKET of user_id (the udf_cogrouped recipe
    — applyInPandas pays one Python call + one pandas frame per KEY,
    so per-user keys serialized n_users tiny frames); the kernel
    resets the accumulator at user boundaries, so per-user semantics
    and the skew bound (a mega-user still streams through one task)
    are unchanged."""
    t = load(spark, sf_dir)
    par = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    base = t.events.select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * DECAY_UNIT).cast("bigint").alias("v"),
        F.pmod(F.xxhash64("user_id"), F.lit(8 * par)).alias("b"),
    )
    return base.groupBy("b").applyInPandas(
        _decay_group, schema="event_id long, user_id long, decay_units long"
    )


#: Trim fraction for the grouped-agg UDF: floor(n/10) rows clipped from
#: EACH side of the sorted per-group values (exact integer trim counts,
#: so both engines drop the same multiset).
TRIM_TENTH = 10

_TRIMMED_ORACLE = f"""
    WITH c AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc FROM events
    ),
    r AS (
      SELECT event_type, vc,
             row_number() OVER (PARTITION BY event_type ORDER BY vc) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM c
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           floor(CAST(SUM(vc) AS DOUBLE) / 100.0 / COUNT(*) * 10000) / 10000
             AS trimmed_mean
    FROM r
    WHERE rn > n // {TRIM_TENTH} AND rn <= n - n // {TRIM_TENTH}
    GROUP BY event_type
"""


@register("udf_grouped_trimmed_mean", oracle=_TRIMMED_ORACLE)
def udf_grouped_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUPED_AGG pandas UDF flavor (Series -> scalar inside
    groupBy().agg(), the one Arrow UDF rung udf_surface/udf_cogrouped/
    udf_map_in_arrow do not touch): a 10%-per-side trimmed mean of the
    event value per type — the robust location estimate metric
    pipelines ship when winsorizing (agg_winsorized_mean) is too
    aggressive. The UDF receives each group's value Series as ONE Arrow
    batch; Spark's partial-aggregation machinery does NOT apply to
    grouped-agg UDFs (whole group materializes per key), which is the
    honest scale caveat: at 100 TB you pre-reduce per partition or use
    the SQL rewrite; here the UDF plumbing is what is under test.

    Determinism: values quantize to integer CENTS inside the UDF; trim
    counts are exact integer floor(n/10); the kept multiset is
    order-free; Python's exact int sum then converts and divides in
    the same sequence as the oracle; output floor-scaled."""
    import math

    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def _trimmed(v: pd.Series) -> float:
        # half-UP cent quantization (DuckDB ROUND semantics) — Python's
        # round() is banker's half-even and can disagree on exact .5
        vc = sorted(int(math.floor(x * 100 + 0.5)) for x in v)
        k = len(vc) // TRIM_TENTH
        kept = vc[k : len(vc) - k]
        return math.floor(sum(kept) / 100.0 / len(kept) * 10_000) / 10_000

    t = load(spark, sf_dir)
    # grouped-agg pandas UDFs cannot mix with plain aggregates in one
    # agg() (INVALID_PANDAS_UDF_PLACEMENT): counts come from a separate
    # combinable aggregate joined back on the tiny type domain.
    means = t.events.groupBy("event_type").agg(
        _trimmed("value").alias("trimmed_mean")
    )
    n = F.count(F.lit(1))
    counts = t.events.groupBy("event_type").agg(
        n.cast("bigint").alias("n"),
        (n - 2 * F.floor(n / TRIM_TENTH)).cast("bigint").alias("n_kept"),
    )
    return counts.join(F.broadcast(means), "event_type").select(
        "event_type", "n", "n_kept", "trimmed_mean"
    )


#: "Model weights" for the iterator UDF: a fixed quality-scoring
#: polynomial, stood in for the real model an inference pass loads
#: once per WORKER and reuses across every Arrow batch.
ITER_MODEL_W = (0.5, 3.0, -0.02)

_SCALAR_ITER_ORACLE = f"""
    SELECT doc_id,
           floor(({ITER_MODEL_W[0]}
                  + {ITER_MODEL_W[1]} * ln(1 + n_chars)
                  + {ITER_MODEL_W[2]} * len(string_split(text, ' ')))
                 * 10000) / 10000 AS model_score
    FROM documents
"""


@register("udf_scalar_iter", oracle=_SCALAR_ITER_ORACLE)
def udf_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALAR_ITER pandas UDF flavor (Iterator[Series] -> Iterator
    [Series]) — the rung built for model inference: the "model" (here
    a literal scoring polynomial; in production gigabytes of weights)
    loads ONCE per Python worker, outside the batch loop, and every
    Arrow batch reuses it. With plain scalar pandas UDFs the init cost
    lands per batch; with this shape it amortizes across the worker's
    whole partition stream — the difference between reloading an
    embedding model thousands of times and once per executor. Last
    missing Arrow UDF rung after udf_surface / udf_cogrouped /
    udf_map_in_arrow / udf_grouped_trimmed_mean.

    Determinism: the polynomial runs on (n_chars, word count) integers
    with one ln on identical doubles (agg_mutual_info precedent),
    NumPy's vectorized ln matching libm's scalar results here;
    floor-scaled output. Scale: pure map, no shuffle, linear."""
    import numpy as np
    from pyspark.sql.types import DoubleType

    # the Iterator[...] type hints are what select the SCALAR_ITER
    # evaluation mode (plain Series -> Series hints mean per-batch init)
    @F.pandas_udf(DoubleType())
    def _score(
        batches: Iterator[Tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        w0, w1, w2 = ITER_MODEL_W  # "load the model" once per worker
        for n_chars, n_words in batches:
            # np.log(1+x), NOT log1p: the oracle computes ln(1+n) and
            # log1p can differ by 1 ulp across libm implementations,
            # enough to straddle the floor(x*1e4) boundary.
            yield np.floor(
                (w0 + w1 * np.log(1.0 + n_chars) + w2 * n_words) * 10_000
            ) / 10_000

    t = load(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        _score(
            F.col("n_chars").cast("double"),
            F.size(F.split("text", " ")).cast("double"),
        ).alias("model_score"),
    )
