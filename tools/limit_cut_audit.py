"""LIMIT-cut totality audit: for every registered oracle containing
ORDER BY ... LIMIT n, run the oracle WITHOUT the limit in DuckDB and
inspect the boundary rows around the cut.

Why: a LIMIT over a non-total ORDER BY is nondeterministic — both
engines may cut a key-tie differently (the fn_business_days defect the
sf0.001 sweep caught), and a NULL in a sort key diverges by default
(Spark ASC = NULLS FIRST, DuckDB ASC = NULLS LAST). Differential sweeps
only catch these when the fixture data actually puts a hazardous tie at
the cut; this audit finds LATENT hazards: key-ties straddling the cut
whose rows are not fully identical, and NULLs present in any sort-key
column, at every scale point.

Verdicts per (query, sf):
  SAFE tie-free        — boundary rows differ on the ORDER BY key tuple
  SAFE identical-rows  — key-tie at the cut, but tied rows are fully
                         identical, so the emitted multiset is unique
  SAFE under-limit     — result has fewer rows than the LIMIT (no cut)
  HAZARD key-tie       — rows tied on every sort key yet differing in
                         some other column straddle the cut
  HAZARD null-key      — a sort-key column contains NULL anywhere
"""

from __future__ import annotations

import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

_LIMIT_RE = re.compile(r"\bLIMIT\s+(\d+)\s*$", re.I | re.S)
_ORDER_RE = re.compile(r"\bORDER\s+BY\s+(.*?)\s*\bLIMIT\b", re.I | re.S)


def _split_top_level(clause: str) -> list[str]:
    """Split an ORDER BY clause on commas OUTSIDE parens, so composite
    keys like round(x, 2) stay whole (ADVICE r10: naive split shattered
    them into fragments that could bind to the wrong column)."""
    parts, cur, depth = [], [], 0
    for ch in clause:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def order_keys(sql: str) -> list[tuple[str, str]]:
    """Parse ORDER BY into (expr, direction) pairs. Direction is
    PRESERVED (ADVICE r10 medium: stripping DESC made the boundary probe
    re-sort ascending and inspect the bottom-N cut instead of the real
    top-N cut, a false-negative SAFE for the exact defect class this
    audit exists to catch). Only NULLS FIRST/LAST is stripped — the
    re-projection judges NULL presence separately."""
    m = _ORDER_RE.search(sql)
    if not m:
        return []
    keys = []
    for part in _split_top_level(m.group(1)):
        k = part.strip()
        k = re.sub(r"\s+NULLS\s+(FIRST|LAST)\s*$", "", k, flags=re.I)
        mdir = re.search(r"\s+(ASC|DESC)\s*$", k, flags=re.I)
        direction = mdir.group(1).upper() if mdir else "ASC"
        if mdir:
            k = k[: mdir.start()]
        keys.append((k.strip(), direction))
    return keys


def audit(con: duckdb.DuckDBPyConnection, name: str, sql: str) -> list[str]:
    m = _LIMIT_RE.search(sql.strip())
    if not m:
        # inner LIMIT (CTE/subquery): print each ORDER BY ... LIMIT
        # clause for manual totality review — the automated boundary
        # probe only handles tail position
        inner = re.findall(
            r"ORDER\s+BY\s+[^)]*?\bLIMIT\s+\d+", sql, re.I | re.S
        )
        return [
            f"INNER       {name}: {' | '.join(c.replace(chr(10), ' ') for c in inner)}"
        ]
    n = int(m.group(1))
    keys = order_keys(sql)
    if not keys:
        return [f"HAZARD      {name}: LIMIT with no ORDER BY"]
    unlimited = _LIMIT_RE.sub("", sql.strip())
    # project the sort-key expressions alongside the full row so ties can
    # be judged even when a key is not an output column; the re-sort
    # keeps each key's original ASC/DESC so the probe inspects the SAME
    # cut the oracle takes
    def _project(ks: list[tuple[str, str]]):
        key_cols = ", ".join(f"({k}) AS __k{i}" for i, (k, _) in enumerate(ks))
        order = ", ".join(f"({k}) {d}" for k, d in ks)
        return con.execute(
            f"SELECT *, {key_cols} FROM ({unlimited}) __audit_t "
            f"ORDER BY {order}"
        ).df()

    try:
        full = _project(keys)
    except duckdb.BinderException:
        try:
            # ORDER BY keys qualified with an inner alias (j.col): the
            # subquery output carries the bare column, strip qualifiers.
            # Restricted to identifier.identifier so decimal literals
            # (0.5) survive intact (ADVICE r10).
            keys = [
                (re.sub(r"\b[A-Za-z_]\w*\.(\w+)", r"\1", k), d)
                for k, d in keys
            ]
            full = _project(keys)
        except duckdb.BinderException as e2:
            return [
                f"MANUAL      {name}: sort key not re-projectable "
                f"({e2.__class__.__name__}); review ORDER BY {keys} by hand"
            ]
    out = []
    kcols = [f"__k{i}" for i in range(len(keys))]
    if full[kcols].isna().any().any():
        out.append(f"HAZARD null-key   {name}: NULL present in sort key(s)")
    if len(full) <= n:
        out.append(f"SAFE under-limit  {name}: {len(full)} rows <= LIMIT {n}")
        return out
    lo, hi = full.iloc[n - 1], full.iloc[n]
    if tuple(lo[kcols]) != tuple(hi[kcols]):
        out.append(f"SAFE tie-free     {name}: boundary keys differ")
        return out
    # key-tie straddles the cut: safe only if every row in the tie block
    # is fully identical (multiset output is then unique)
    tie = full[(full[kcols] == lo[kcols].values).all(axis=1)]
    if len(tie.drop_duplicates()) == 1:
        out.append(f"SAFE identical    {name}: cut tie rows fully identical")
    else:
        pretty = ", ".join(f"{k} {d}" for k, d in keys)
        out.append(
            f"HAZARD key-tie    {name}: {len(tie)} rows tied on "
            f"[{pretty}] straddle the LIMIT-{n} cut with differing payloads"
        )
    return out


def main() -> int:
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    limited = {k: v for k, v in oracles.items() if re.search(r"\bLIMIT\b", v, re.I)}
    print(f"{len(limited)} oracles carry LIMIT")
    n_haz = 0
    for sf in SFS:
        con = duckdb.connect()
        from data_ingestion_poc_spark.catalog import TABLES

        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        print(f"\n== {sf}")
        for name, sql in sorted(limited.items()):
            for line in audit(con, name, sql):
                print("  " + line)
                if line.startswith("HAZARD"):
                    n_haz += 1
        con.close()
    print(f"\n{n_haz} hazards")
    return 1 if n_haz else 0


if __name__ == "__main__":
    sys.exit(main())
