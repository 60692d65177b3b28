"""Round-14 pins.

NSW graph-ANN quality/scale floor (VERDICT r13 item 1): after the
global-cell rebuild (label-free sqrt(N) seed layer, seed->member
downlinks, top-NSW_STARTS exhaustive layer-1 descent), recall@10 must
hold a >=0.9 floor per query on the REAL fixture — the planted-model
tests in test_round13b pin the walk mechanics, this pins the quality
claim the op is chosen for.
"""

from __future__ import annotations

import pytest

from data_ingestion_poc_spark import registry

SF_SMOKE = "/root/testdata/sf0.001"


def test_nsw_recall_floor_sf0001(spark):
    rows = registry.get("sim_search_nsw_recall").fn(
        spark, SF_SMOKE
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["exact_k"] == 10, r
        assert r["recall_pct"] >= 90.0, (
            f"query {r['query_id']}: recall {r['recall_pct']} < 90 — "
            "the r14 floor regressed (NSW_STARTS/NSW_BEAM/graph edges)"
        )


def test_nsw_walk_never_broadcasts_the_graph(spark):
    """The r13 scale defect: beam.join(broadcast(g)) shipped the
    corpus-sized edge graph to every executor. The r14 plan broadcasts
    only answer-sized frames — assert no broadcast exchange feeds on
    the graph side by checking the final plan's broadcast inputs are
    all bounded frames (frontier/query/seed joins), i.e. every
    BroadcastExchange in the plan sits under a join whose OTHER side
    carries the corpus scan."""
    df = registry.get("sim_search_nsw").fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the graph frame is the ONLY frame in the walk carrying (src,
    # dst) columns; answer-sized frames (beam/visited/query) carry
    # (query_id, node, ...). The r13 defect showed up as a
    # BroadcastExchange whose input scan output [src#, dst#] — assert
    # no broadcast input emits the edge columns.
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "BroadcastExchange" in ln:
            sub = "\n".join(lines[i : i + 4])
            assert not ("src#" in sub and "dst#" in sub), (
                "corpus-sized edge graph is being broadcast:\n" + sub
            )


@pytest.mark.parametrize("name", ["sim_search_nsw"])
def test_nsw_output_contract(spark, name):
    df = registry.get(name).fn(spark, SF_SMOKE)
    assert [f.name for f in df.schema.fields] == [
        "query_id",
        "neighbor_id",
        "cosine",
        "rk",
    ]
    rows = df.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rk"])
    for q, rks in by_q.items():
        assert sorted(rks) == list(range(1, 11)), q
