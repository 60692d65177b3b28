"""Pin the committed physical-plan audit (PLANS.md) invariants.

tools/plan_audit.py executes every registered batch query at sf0.1 and
writes PLANS.md; regenerating it takes minutes, so the table is committed
and these tests re-parse the committed file instead of re-running Spark.
The two hard invariants (VERDICT r3 item 8):

  1. no CartesianProduct anywhere — an accidental cross join is the
     single fastest way to turn a 100 TB plan into a non-terminating one;
  2. Exchange SinglePartition only where tools/plan_audit.py's
     SINGLE_PARTITION_OK documents a bounded reason — an undocumented
     single-partition stage is a driver-shaped bottleneck.

plan_audit.py itself exits non-zero on violation at generation time;
these tests make a stale or hand-edited PLANS.md equally loud.
"""

from __future__ import annotations

import os
import re
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.plan_audit import EXCLUDED_PREFIXES, SINGLE_PARTITION_OK  # noqa: E402

PLANS = os.path.join(REPO, "PLANS.md")


def _rows() -> list[dict]:
    with open(PLANS) as f:
        text = f.read()
    rows = []
    for m in re.finditer(
        r"^\| `(?P<name>\w+)` \| (?P<shuffles>\d+) \| (?P<onepart>\d+) \| "
        r"(?P<bcast>\d+) \| (?P<joins>[^|]*) \| (?P<pushdown>[^|]*) \| "
        r"(?P<wscg>\d+) \| (?P<notes>[^|]*) \|$",
        text,
        re.M,
    ):
        rows.append(
            {
                "name": m["name"],
                "shuffles": int(m["shuffles"]),
                "single_partition": int(m["onepart"]),
                "joins": m["joins"].strip(),
                "notes": m["notes"].strip(),
            }
        )
    return rows


@pytest.fixture(scope="module")
def rows():
    assert os.path.exists(PLANS), "PLANS.md missing — run tools/plan_audit.py"
    r = _rows()
    assert len(r) >= 150, f"PLANS.md parsed only {len(r)} rows — format drift?"
    return r


def test_plans_covers_every_batch_query(rows):
    from data_ingestion_poc_spark import registry

    batch = {
        n for n in registry.all_queries() if not n.startswith(EXCLUDED_PREFIXES)
    }
    audited = {r["name"] for r in rows}
    missing = batch - audited
    assert not missing, f"batch queries absent from PLANS.md: {sorted(missing)}"


def test_no_cartesian_product(rows):
    offenders = [
        r["name"]
        for r in rows
        if "CartesianProduct" in r["joins"] or "CARTESIAN" in r["notes"]
    ]
    assert not offenders, f"CartesianProduct in plans: {offenders}"


def test_single_partition_only_where_documented(rows):
    undocumented = [
        r["name"]
        for r in rows
        if r["single_partition"] > 0 and r["name"] not in SINGLE_PARTITION_OK
    ]
    assert not undocumented, (
        "Exchange SinglePartition without a documented bounded reason: "
        f"{undocumented} — add to SINGLE_PARTITION_OK with a rationale or "
        "fix the plan"
    )


def test_no_violations_section():
    with open(PLANS) as f:
        assert "## VIOLATIONS" not in f.read()


def test_allowlist_has_no_stale_entries(rows):
    # every allowlisted name must still exist as a registered query (it may
    # legitimately have 0 SinglePartition nodes now — AQE can plan the
    # 1-row reduction away — but a deleted query means a stale allowlist)
    from data_ingestion_poc_spark import registry

    names = set(registry.all_queries())
    stale = [n for n in SINGLE_PARTITION_OK if n not in names]
    assert not stale, f"SINGLE_PARTITION_OK entries no longer registered: {stale}"
