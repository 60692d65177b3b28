"""Round 15 optimization equivalence pins.

The r14 fused pair kernels materialized one dense (n, n) cosine matrix
per LSH bucket / IVF cell inside a single Python worker; r15 tiles them
into fixed-size blocks (VERDICT r14 item 2). These tests force the
MULTI-BLOCK code path on real operators by shrinking the tile to a few
rows — every bucket/cell becomes a "hot bucket" spanning many tiles —
and pin that the output is IDENTICAL (exact float equality, not
approximate) to the default single-block run.

Also pinned: the size-dispatched broadcast hint of the iterative graph
family (VERDICT r14 item 1) — the forced-shuffle path (cap=0) must emit
the identical rows the broadcast path emits, and _topk_ids_tiled's
running top-k merge must replay the dense lexsort rule under
adversarial ties.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_ingestion_poc_spark import registry
from data_ingestion_poc_spark.llm import dedup as dedup_mod
from data_ingestion_poc_spark.llm import evaluation as eval_mod
from data_ingestion_poc_spark.llm import similarity as sim_mod
from data_ingestion_poc_spark.llm.similarity import _topk_ids_tiled

SF_SMOKE = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "name",
    [
        "dedup_embedding_cosine",   # _bucket_pairs (LSH bucket kernel)
        "dedup_semantic",           # _cell_dups (best-earlier kernel)
        "embed_hubness_ivf",        # _assign + _cell_topk
        "sim_search_nsw",           # _assign + _cell_knn (graph build)
        "dedup_embedding_recall",   # _exact_pairs (anchor-axis tiling)
    ],
)
def test_tiled_kernels_match_dense_on_hot_buckets(spark, name, monkeypatch):
    """tile=3 forces every bucket/cell through many blocks (sf0.001 has
    ~500 vectors, cells of ~20 rows -> 7+ blocks each); the collected
    result must equal the default run bit-for-bit. The tile is captured
    driver-side into each kernel closure, so the monkeypatch reaches the
    executors through pickling."""
    fn = registry.get(name).fn
    base = _rows(fn(spark, SF_SMOKE))
    for mod in (dedup_mod, sim_mod, eval_mod):
        monkeypatch.setattr(mod, "_PAIR_TILE", 3, raising=False)
    tiled = _rows(fn(spark, SF_SMOKE))
    assert tiled == base


def test_topk_tiled_merge_replays_dense_lexsort_under_ties():
    """Adversarial ties: duplicated vectors (equal cosines everywhere)
    must rank by ascending id, exactly the dense kernel's
    np.lexsort((ids, -C[i])) rule, at every tile size."""
    rng = np.random.RandomState(7)
    base = rng.randn(9, 4)
    V = np.vstack([base, base[:4], base[:2]])  # planted exact ties
    ids = np.arange(100, 100 + len(V), dtype=np.int64)
    rng.shuffle(ids)  # id order decoupled from row order
    nsq = np.zeros(len(V))
    for d in range(V.shape[1]):
        nsq = nsq + V[:, d] * V[:, d]
    nrm = np.sqrt(nsq)
    acc = np.zeros((len(V), len(V)))
    for d in range(V.shape[1]):
        acc = acc + np.outer(V[:, d], V[:, d])
    C = acc / np.outer(nrm, nrm)
    k = 5
    dense = []
    for i in range(len(V)):
        order = np.lexsort((ids, -C[i]))
        order = order[ids[order] != ids[i]][:k]
        dense.append(list(ids[order]))
    for tile in (1, 2, 3, 7, 64):
        got = [list(row) for row in _topk_ids_tiled(ids, V, nrm, k, tile)]
        assert got == dense, f"tile={tile}"


def test_cell_kernels_assert_on_zero_norm_vectors():
    """A zero-norm vector's NaN cosines would silently rank LAST in the
    NumPy kernels while the SQL window they replay ranks NaN FIRST
    (r14 ADVICE): the kernels must fail loudly instead of diverging."""
    V = np.array([[1.0, 0.0], [0.0, 0.0]])
    ids = np.array([1, 2], dtype=np.int64)
    nrm = np.sqrt((V * V).sum(axis=1))
    with pytest.raises(AssertionError):
        _topk_ids_tiled(ids, V, nrm, 1)


def test_graph_bcast_shuffle_path_emits_identical_rows(spark, monkeypatch):
    """VERDICT r14 item 1 'done' axis: with the broadcast cap forced to
    0 every node-sized frame takes the partitioned-edges shuffle join
    instead of the (size-checked) broadcast, and the results must be
    row-identical."""
    from data_ingestion_poc_spark.operators import graph as graph_mod

    for name in (
        "graph_pagerank",
        "graph_label_propagation",
        "graph_bfs_distance",
        "graph_kcore",
        "graph_hits",
        "graph_katz_centrality",
    ):
        fn = registry.get(name).fn
        base = _rows(fn(spark, SF_SMOKE))
        monkeypatch.setenv("DIP_GRAPH_BCAST_MAX_NODES", "0")
        shuffled = _rows(fn(spark, SF_SMOKE))
        monkeypatch.delenv("DIP_GRAPH_BCAST_MAX_NODES")
        assert shuffled == base, name


def test_lp_code_is_order_isomorphic_and_invertible(spark):
    """The label-prop integer code must sort exactly like the node-id
    STRINGS (the tie-break domain the oracle replays: 'c1' < 'c10' <
    'c2' < 's1') and decode back to the identical strings."""
    from data_ingestion_poc_spark.operators.graph import _lp_code, _lp_decode

    ids = [
        f"{p}{n}"
        for p in "cs"
        for n in [1, 2, 9, 10, 11, 19, 20, 100, 101, 999, 1000, 15000,
                  999999, 1500000, 9999999999999]
    ]
    df = spark.createDataFrame([(s,) for s in ids], "node string")
    out = (
        df.select("node", _lp_code("node").alias("code"))
        .withColumn("back", _lp_decode("code"))
        .collect()
    )
    assert all(r.back == r.node for r in out)
    by_string = sorted(out, key=lambda r: r.node)
    assert [r.code for r in by_string] == sorted(r.code for r in out)


def test_fanout_repartition_noops_on_presplit_input(spark):
    """VERDICT r14 item 3 'done' axis: the scale-adaptive helper must
    not add an Exchange when the input already has >= par partitions
    (the 100 TB arrival shape), and must keep the r14 round-robin
    spread for the single-split local fixture shape."""
    from data_ingestion_poc_spark.catalog import fanout_repartition

    wide = spark.range(1000).repartition(64)
    out = fanout_repartition(wide, 32)
    assert out is wide  # no new plan node at all
    assert out.rdd.getNumPartitions() == 64

    narrow = spark.range(1000, numPartitions=1)
    out2 = fanout_repartition(narrow, 32)
    assert out2 is not narrow
    assert out2.rdd.getNumPartitions() == 32
    assert "Exchange" in out2._jdf.queryExecution().executedPlan().toString()


def test_node_bcast_dispatches_on_table_stats(spark):
    """The hint is F.broadcast below the cap and the identity above it —
    the §3.1 fits-in-memory condition is CHECKED, not asserted."""
    from pyspark.sql import functions as F

    from data_ingestion_poc_spark.operators.graph import _node_bcast

    assert _node_bcast(spark, SF_SMOKE) is F.broadcast
    import os

    os.environ["DIP_GRAPH_BCAST_MAX_NODES"] = "0"
    try:
        bc = _node_bcast(spark, SF_SMOKE)
        assert bc is not F.broadcast
        df = spark.range(3)
        assert bc(df) is df
    finally:
        del os.environ["DIP_GRAPH_BCAST_MAX_NODES"]


def test_profile_table_splits_the_multi_distinct_expand(spark):
    """profile_table (r15): five countDistinct columns fused in one
    aggregate force the multi-distinct Expand — every orders row
    replicated x6 through SortAggregates keyed on all five profiled
    columns. The split spelling (plain count/min/max aggregate +
    one partial-distinct aggregate per column, cross-joined 1-row
    frames) must produce the identical profile with no Expand node."""
    from pyspark.sql import functions as F

    fn = registry.get("profile_table").fn
    df = fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan

    from data_ingestion_poc_spark.catalog import load
    from data_ingestion_poc_spark.operators.profile import _COLS

    t = load(spark, SF_SMOKE)
    aggs = []
    for c in _COLS:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.countDistinct(c).alias(f"{c}__d"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    fused = t.orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__d, {c}__min, {c}__max" for c in _COLS
    )
    ref = fused.selectExpr(
        f"stack({len(_COLS)}, {stack_args}) AS "
        "(column_name, n_nonnull, n_distinct, min_s, max_s)"
    )
    assert _rows(df) == _rows(ref)
    assert df.schema == ref.schema


def test_daemon_preload_modules_all_import():
    """The worker daemon preloads engine modules whose kernel helpers
    ship by reference in UDF closures (r15: _topk_ids_tiled pickles as
    (module, qualname), so a fresh forked worker re-imports ~0.8 s of
    engine modules on its first kernel task — measured 4x on
    embed_hubness_ivf's cell stage). The preload loop swallows import
    errors by design (stock-daemon degradation), so this test is the
    only thing that catches a typo'd or bit-rotted module name."""
    import importlib

    from data_ingestion_poc_spark.daemon_preload import PRELOAD_MODULES

    assert "data_ingestion_poc_spark.llm.similarity" in PRELOAD_MODULES
    for mod in PRELOAD_MODULES:
        importlib.import_module(mod)
