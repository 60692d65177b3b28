"""Round-14 exhibit-op planted tests: bucketed edit-distance dedup,
variable-length row-pattern matching, VARIANT shredding pushdown (with
plan-shape pins), and the streaming state-store reader."""

from __future__ import annotations

import pytest

from data_ingestion_poc_spark import registry
from tests.test_round12 import _run, _write_events, spark  # noqa: F401
from tests.test_round12g import _write_docs  # noqa: F401


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


EDIT_DOCS = [
    # same 12-char prefix + same length band (len//20) + tiny edits
    (0, "the quick brown fox jumps over the lazy dog", "en", "s0"),
    (1, "the quick brown fox jumps over the lazy cat", "en", "s1"),
    (2, "the quick brown fox leaps over the lazy dog!", "en", "s0"),
    # same prefix but different length band -> blocked out
    (3, "the quick brown fox " + "x" * 40, "en", "s1"),
    # different prefix -> blocked out even though globally similar
    (4, "a  quick brown fox jumps over the lazy dog", "en", "s0"),
    # exact duplicate of 0
    (5, "the quick brown fox jumps over the lazy dog", "en", "s2"),
    # far edit distance, same bucket -> filtered by threshold
    (6, "the quick brAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAWWWn f", "en", "s0"),
]


def test_dedup_edit_distance_model(spark, tmp_path):
    _write_docs(spark, tmp_path, EDIT_DOCS)
    rows = _run("dedup_edit_distance", spark, tmp_path)
    # model: bucket by (len//20, lower 12-prefix), pairs, window-80 lev
    buckets = {}
    for i, tx, _, _ in EDIT_DOCS:
        key = (len(tx) // 20, tx.lower()[:12])
        buckets.setdefault(key, []).append((i, tx.lower()[:80]))
    want = {}
    for key, members in buckets.items():
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                a, wa = members[ai]
                b, wb = members[bi]
                d = _lev(wa, wb)
                if d <= 8:
                    want[(a, b)] = d
    got = {(r["doc_a"], r["doc_b"]): r["edit_dist"] for r in rows}
    assert got == want
    assert (0, 5) in got and got[(0, 5)] == 0       # exact dup found
    assert (0, 1) in got and got[(0, 1)] == 3       # near dup found
    assert all(3 not in p and 4 not in p and 6 not in p for p in got)


VARLEN_VALUES = [
    # user 0: 10 9 8 5 | 6 7 9 -> one (DOWN,len3)(UP,len3) match;
    # then 9 9 (flat breaks) 8 7 | 8 -> second match (down2, up1)
    (0, [10, 9, 8, 5, 6, 7, 9, 9, 8, 7, 8]),
    # user 1: monotone rise only -> no match
    (1, [1, 2, 3, 4]),
    # user 2: down only -> no match
    (2, [4, 3, 2, 1]),
]


def test_win_pattern_varlen_model(spark, tmp_path):
    rows_in = []
    eid = 0
    for uid, vals in VARLEN_VALUES:
        for i, v in enumerate(vals):
            rows_in.append((eid, i, uid, "view", float(v)))
            eid += 1
    _write_events(spark, tmp_path, rows_in)
    rows = _run("win_pattern_varlen", spark, tmp_path)
    got = [
        (
            r["user_id"], r["down_len"], r["up_len"], r["v_peak_in"],
            r["v_trough"], r["v_peak_out"], r["depth"], r["rebound"],
        )
        for r in rows
    ]
    assert got == [
        (0, 3, 3, 10.0, 5.0, 9.0, 5.0, 4.0),
        (0, 2, 1, 9.0, 7.0, 8.0, 2.0, 1.0),
    ]
    # trough rows are the 4th event (value 5) and the 10th (value 7)
    assert [r["trough_event_id"] for r in rows] == [3, 9]


VAR_DOCS = [
    (0, "x" * 150, "en", "s0"),
    (1, "y" * 50, "en", "s1"),    # below the n_chars filter
    (2, "z" * 200, "de", "s0"),
    (3, "w" * 101, "de", "s1"),
    (4, "v" * 100, "fr", "s0"),   # boundary: NOT > 100
]


def test_scan_variant_shred_values_and_plan(spark, tmp_path):
    _write_docs(spark, tmp_path, VAR_DOCS)
    df = registry.get("scan_variant_shred").fn(spark, str(tmp_path))
    rows = {r["lang"]: (r["n_docs"], r["total_chars"]) for r in df.collect()}
    assert rows == {"en": (1, 150), "de": (2, 301)}
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the shredding pins: the variant scan must (a) push the $.n_chars
    # comparison down to the parquet reader and (b) narrow ReadSchema
    # to a typed struct of the touched paths, not the variant blob
    assert "PushedFilters: [" in plan
    assert "GreaterThan" in plan, plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "struct<" in read_schema[0]
    # touched paths come back TYPED (lang -> string, n_chars -> bigint);
    # only the untouched path may stay as a variant leftover
    assert ":string" in read_schema[0] and ":bigint" in read_schema[0], (
        read_schema[0]
    )


def test_stream_state_reader_matches_batch(spark, tmp_path):
    _write_docs(spark, tmp_path, VAR_DOCS)
    rows = _run("stream_state_reader", spark, tmp_path)
    got = {r["lang"]: (r["total_chars"], r["n_docs"]) for r in rows}
    assert got == {"en": (200, 2), "de": (301, 2), "fr": (100, 1)}
