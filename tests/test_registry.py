"""Registry hygiene: properties every registered query must satisfy for
the driver's compare to be meaningful. Schema-level only (no actions) for
the batch queries; streaming queries execute on construction and are
covered by their own oracle checks, so they are skipped here."""

from __future__ import annotations

import re

import pytest

from data_ingestion_poc_spark import registry

SKIP_PREFIXES = ("stream_",)  # constructing these executes a streaming query
SKIP_EXPENSIVE = {"ingest_observe"}  # runs an action internally


def _batch_queries():
    return {
        n: q
        for n, q in registry.all_queries().items()
        if not n.startswith(SKIP_PREFIXES) and n not in SKIP_EXPENSIVE
    }


def test_names_are_wellformed():
    for name in registry.all_queries():
        assert re.fullmatch(r"[a-z][a-z0-9_]*", name), name


def test_oracles_reference_known_views():
    """Every oracle must only read the pre-registered fixture views (or
    inline VALUES) — anything else fails in the driver's DuckDB."""
    known = {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    for name, q in registry.all_queries().items():
        if q.oracle is None:
            continue
        # CTE names, including the column-list form `name(c1, c2) AS (`
        # used by recursive CTEs
        ctes = set(
            re.findall(
                r"([a-z_][a-z_0-9]*)\s*(?:\([^()]*\))?\s+AS\s*\(", q.oracle, re.I
            )
        )
        # derived-table aliases: only `FROM (subquery) alias` / `JOIN
        # (subquery) alias` count — paren-match from each FROM/JOIN (so a
        # stray `COUNT(*) AS n` cannot whitelist `n` as a table name)
        aliases = set()
        for m in re.finditer(r"(?:FROM|JOIN)\s*\(", q.oracle, re.I):
            depth, i = 1, m.end()
            while i < len(q.oracle) and depth:
                depth += {"(": 1, ")": -1}.get(q.oracle[i], 0)
                i += 1
            tail = re.match(
                r"\s*(?:AS\s+)?([a-z_][a-z_0-9]*)\b", q.oracle[i:], re.I
            )
            if tail:
                aliases.add(tail.group(1).lower())
        # `IS NOT DISTINCT FROM x.k` / `FROM x.y`: dotted refs are alias
        # uses, not table reads — treated below via the \b word boundary
        # builtin DuckDB table functions usable without any registration
        table_fns = {"range", "unnest", "generate_series"}
        for tbl in re.findall(r"(?:FROM|JOIN)\s+([a-z_][a-z_0-9]*)\b", q.oracle):
            ok = tbl in known or tbl in ctes or tbl in aliases or tbl == "t"
            assert ok or tbl in table_fns, (name, tbl)


@pytest.mark.parametrize("name", sorted(_batch_queries()))
def test_output_columns_unique_and_named(spark, sf_dir, name):
    """Duplicate or auto-generated output column names silently corrupt
    the driver's sorted-column value hash — every query must emit unique,
    explicitly-aliased columns."""
    df = registry.get(name).fn(spark, sf_dir)
    cols = df.columns
    assert len(cols) == len(set(cols)), (name, cols)
    for c in cols:
        assert re.fullmatch(r"[A-Za-z][A-Za-z0-9_]*", c), (name, c)


def test_rows_only_queries_have_rationale():
    """Every oracle=None query needs a written rationale in
    registry.ROWS_ONLY_RATIONALE (and no stale entries for queries that
    since gained an oracle) — the checklist that keeps rows-only checks an
    explicit, justified exception rather than silent verification debt.

    Golden-VALUES oracles are computed from the fixture dir at import and
    degrade to None when it is absent; on a machine without the fixtures
    the exact-set assertion is meaningless, so only assert the documented
    names are a subset and skip the staleness half."""
    import os

    from data_ingestion_poc_spark.goldens import ORACLE_SF_DIR

    rows_only = {n for n, q in registry.all_queries().items() if q.oracle is None}
    documented = set(registry.ROWS_ONLY_RATIONALE)
    if not os.path.isdir(ORACLE_SF_DIR):
        assert documented <= rows_only, (
            f"stale rationale: {sorted(documented - rows_only)}"
        )
        pytest.skip(
            f"fixture dir {ORACLE_SF_DIR} missing — golden-oracle queries "
            "degrade to rows-only, exact-set check not meaningful"
        )
    assert rows_only == documented, (
        f"missing rationale: {sorted(rows_only - documented)}; "
        f"stale rationale: {sorted(documented - rows_only)}"
    )


def test_cli_list_and_unknown_query(capsys):
    """`list` prints every registered query with its oracle kind;
    `run` with an unknown name exits 2 without starting Spark."""
    from data_ingestion_poc_spark import registry
    from data_ingestion_poc_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    for name in ("agg_hash_group", "dedup_minhash", "join_geo_distance"):
        assert name in out
    assert out.count("\n") == len(registry.all_queries())
    assert main(["run", "no_such_query"]) == 2
