"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship pricing-summary query on sf0.001 (smoke).
queries()      — every implemented operator from SURVEY.md section 2,
                 name -> fn(spark, sf_dir) -> DataFrame.
oracle_sql()   — matching DuckDB SQL per query (omitted => rows-only).

All real logic lives in data_ingestion_poc_spark/; this module only
exposes the registry.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from data_ingestion_poc_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.get("agg_hash_group").fn(spark, "/root/testdata/sf0.001")


# The correctness driver samples queries from the FRONT of this dict (every
# round judges exactly the first 50 entries). Names whose IMPLEMENTATION
# changed this round lead the list so their verdicts refresh; everything
# else is ordered computationally: driver-unjudged value-oracled queries
# first (registration order), then unjudged rows-only, then every name
# that already has a driver verdict (from the committed
# CORRECTNESS_r0*.json files — r5's hand-maintained 180-line _JUDGED list
# is gone; drift there silently wasted window slots).
_CHANGED_THIS_ROUND = [
    # r12 semantic fixes (ADVICE r11), each re-oracled at 3 SFs on the
    # day of the fix and pinned by planted-model tests:
    # - agg_brunner_munzel: W denominator restored to the published
    #   Brunner-Munzel 2000 form na*nb*(Rb-Ra)/((na+nb)*sqrt(na*Sa^2
    #   + nb*Sb^2)) — the r11 form deflated W by ~sqrt(n) on BOTH
    #   engines (the differential-oracle blind spot, ADVICE high).
    # - agg_welch_anova: means_differ critical value now keyed on the
    #   observed k-1 via F_CRIT_INF_BY_DOF1 (null when untabled)
    #   instead of the hard-wired dof1=4 constant (ADVICE low).
    "agg_brunner_munzel",
    "agg_welch_anova",
    # r12 planted-model sweep finds (same class as the welch fix): the
    # hard-wired dof1=4 critical values in levene / kruskal now key on
    # the observed k-1, null when untabled. Re-oracled at 3 SFs.
    "agg_levene_test",
    "agg_kruskal_wallis",
    # r12 item 5: embed_hubness's dispatch boundary moved off the sf0.1
    # bench point (HUBNESS_BRUTE_MAX 2000 -> 1000) and its oracle now
    # dispatches identically in SQL; re-oracled at 3 SFs (IVF regime at
    # sf0.1, brute at the small SFs).
    "embed_hubness",
]

# r12 diffs that touch function bodies WITHOUT changing semantics —
# agg_yuen_trimmed_t gained a docstring paragraph documenting its
# large-h normal-approximation verdict (ADVICE low), and graph_hits
# was rewritten onto dual pre-partitioned edge frames (VERDICT item 3,
# m100 6.3x -> 3.1x; output identical, oracle unchanged and green).
# Names here queue at the head of the judged block for a driver
# re-hash.
_CHANGED_JUDGED_THIS_ROUND: list[str] = [
    "agg_yuen_trimmed_t",
    "graph_hits",
]


def _verdict_rounds() -> dict[str, int]:
    """name -> LATEST round with a driver verdict, derived from the
    committed CORRECTNESS_r0*.json files (the driver's own per-round
    records). Feeds both the judged/unjudged split and the r12
    oldest-verdict rotation (VERDICT r11 item 2): with the backlog at
    zero, the spare window slots go to the stalest verdicts, so every
    name re-verifies on a ~20-round cycle instead of never."""
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                names = list(json.load(f).keys())
        except (OSError, ValueError):
            continue
        for n in names:
            if rnd > last.get(n, -1):
                last[n] = rnd
    return last


#: Names first registered THIS round (r12). Window math: 2 changed
#: leads + 0 backlog + len(_NEW_THIS_ROUND) newcomers, and every
#: remaining slot (>= 15 required by VERDICT r11 item 2) goes to the
#: oldest-verdict rotation. r12 is the planted-model-sweep round, so
#: the new-op cap is deliberately small (~10-15).
_NEW_THIS_ROUND: set[str] = {
    # VERDICT r11 item 5: the forced brute-force hubness audit path,
    # value-oracled at 3 SFs on arrival
    "embed_hubness_exact",
    # r12 batch (12 total, inside the sweep-round cap): agreement /
    # association / effect-size classics (stats.py), five more bar
    # indicators (windows.py), the link-prediction pair (graph.py).
    # Each: 3-SF oracle pass on arrival + planted-model test in
    # tests/test_round12f.py from day one.
    "agg_cramers_v_corrected",
    "agg_cohens_h",
    "agg_ansari_bradley",
    "agg_somers_d",
    "win_kaufman_er",
    "win_force_index",
    "win_ease_of_movement",
    "win_choppiness_index",
    "win_fractal_dimension",
    "graph_resource_allocation",
    "graph_preferential_attachment",
    # r12 mini-batch 2 (new total 15, within the sweep-round cap;
    # window: 5 changed leads + 15 new + 1 changed-judged = 21, leaving
    # 29 oldest-verdict rotation slots >= the 15 required)
    "agg_g_test",
    "agg_fisher_z_corr_ci",
    "win_trix",
}


def _ordered() -> dict[str, registry.Query]:
    all_q = registry.all_queries()
    verdicts = _verdict_rounds()
    front = [n for n in _CHANGED_THIS_ROUND if n in all_q]
    seen = set(front)
    # Never-judged names (this round's registrations, normally) come
    # right after the changed leads so the backlog stays at zero;
    # value-oracled before rows-only, registration order within each.
    fresh = [n for n in all_q if n not in seen and n not in verdicts]
    reg_index = {n: i for i, n in enumerate(all_q)}
    fresh_oracle = sorted(
        (n for n in fresh if all_q[n].oracle),
        key=lambda n: (n in _NEW_THIS_ROUND, reg_index[n]),
    )
    fresh_rows_only = sorted(
        (n for n in fresh if not all_q[n].oracle),
        key=lambda n: (n in _NEW_THIS_ROUND, reg_index[n]),
    )
    changed_judged = [
        n for n in _CHANGED_JUDGED_THIS_ROUND if n in all_q and n not in seen
    ]
    seen.update(changed_judged)
    # Oldest-verdict rotation (VERDICT r11 item 2): the judged block is
    # sorted by last-verdict round ASCENDING, so the window's spare
    # slots always re-hash the stalest names first — a mechanical full
    # re-verification cycle every ~20 rounds.
    back = sorted(
        (n for n in all_q if n not in seen and n in verdicts),
        key=lambda n: (verdicts[n], reg_index[n]),
    )
    order = front + fresh_oracle + fresh_rows_only + changed_judged + back
    return {n: all_q[n] for n in order}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle
        for name, q in _ordered().items()
        if q.oracle is not None
    }
