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
    # r13 semantic edge-case guards (ADVICE r12), each re-oracled at
    # 3 SFs on the day of the fix:
    # - win_fractal_dimension: exact-integer singularity guard — the
    #   FD nulls when |steps*d - L| * 100000 < L, so the log10-ratio
    #   denominator can never hit 0 (Spark floor(LONG) saturation vs
    #   DuckDB inf divergence) and the 1e-4 floor stays ulp-stable.
    # - agg_cohens_h: empty-arm parity — the oracle's scalar-subquery
    #   CTE now drops its NULL-stats row (WHERE n1/n2 IS NOT NULL) so
    #   both engines emit 0 rows on degenerate empty-arm inputs.
    "win_fractal_dimension",
    "agg_cohens_h",
]

# r13 diffs that touch plans/oracles WITHOUT changing values —
# embed_hubness's dispatching oracle gained the brute-branch cost gate
# (ADVICE r12: the quadratic CTE now scans 0 rows above
# HUBNESS_BRUTE_MAX whether or not DuckDB prunes the UNION branch;
# values identical, the outer constant WHERE still removes the
# spurious n=0 row), and graph_hits now unpersists its two edge caches
# before return (the r12 cosmetic nit; output identical). Names here
# queue at the head of the judged block for a driver re-hash.
_CHANGED_JUDGED_THIS_ROUND: list[str] = [
    "embed_hubness",
    "graph_hits",
    # r13 --all sweep perf fix: scored columns materialize via
    # localCheckpoint so the anomaly filter stops re-evaluating the
    # interpreted HOF tree per row (8.9 s -> ~1.5 s at sf0.1; output
    # identical, 5379 rows either way at sf0.1).
    "win_mad_anomaly",
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


#: Names first registered THIS round (r13). Window math: 2 changed
#: leads + 0 backlog + 20 newcomers + 2 changed-judged = 24, leaving
#: 26 oldest-verdict rotation slots (>= the 15 required by VERDICT r11
#: item 2; the r13 rotation block draws from the stalest r2/r3-verdict
#: cohort per VERDICT r12 item 3 — mechanical via _verdict_rounds()).
_NEW_THIS_ROUND: set[str] = {
    # VERDICT r12 item 4 trio: streaming near-dup (the banded-MinHash
    # index as streaming state, golden-replay value oracle), the
    # HNSW-style navigable-graph ANN + its recall gate.
    "stream_dedup_minhash",
    "sim_search_nsw",
    "sim_search_nsw_recall",
    # Model-eval completions: calibration slope/intercept beside ECE
    # (VERDICT r12 item 4), Murphy Brier decomposition, ranking nDCG,
    # and the agreement family beyond kappa (Gwet AC1, Krippendorff
    # alpha).
    "agg_calibration_slope",
    "agg_brier_decomposition",
    "agg_ndcg",
    "agg_gwet_ac1",
    "agg_krippendorff_alpha",
    # Census stats: the paired Wilcoxon, two more scale/concordance
    # classics, residual autocorrelation, method agreement,
    # probability-of-superiority, and equivalence testing.
    "agg_wilcoxon_signed_rank",
    "agg_siegel_tukey",
    "agg_kendall_w",
    "agg_durbin_watson",
    "agg_lin_ccc",
    "agg_vargha_delaney_a",
    "agg_tost_equivalence",
    # Bar indicators on the shared OHLC lattice: volume-flow pair
    # (CMF + ADL), Elder ray, Know Sure Thing (fixture-scaled spans).
    "win_chaikin_money_flow",
    "win_accum_dist_line",
    "win_elder_ray",
    "win_kst",
    # The missing classical centrality (truncated harmonic closeness).
    "graph_closeness_centrality",
    # Mini-batch 2 (new total 23; window = 2 changed + 23 new + 3
    # changed-judged = 28, leaving 22 rotation slots >= 15): Cox-Stuart
    # trend, Bartels rank von Neumann (the DW rank companion), and the
    # paired sign test completing the paired family.
    "agg_cox_stuart",
    "agg_bartels_rank",
    "agg_sign_test",
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
