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
    # r11: the six r10 changed-but-output-identical names (VERDICT r10
    # "What's missing" item 2 / "Next round" item 1). Each fix was
    # re-oracled locally at up to 3 SFs during r10 and judge-verified,
    # but their latest DRIVER verdicts predate the change — leading the
    # r11 window refreshes the hard signal:
    # - embed_hubness: eager-count dispatch -> parquet-footer stats
    # - corpus_heaps_law / sort_multi_key: global_row_number
    #   localCheckpoint consistency barrier (sorts.py)
    # - stream_hll_active_users_bound: rsd 0.05 -> 0.01 gate retune
    # - fn_business_days: total-order LIMIT tiebreak
    # - q_full_star_rollup: DECIMAL revenue convention
    "embed_hubness",
    "corpus_heaps_law",
    "sort_multi_key",
    "stream_hll_active_users_bound",
    "fn_business_days",
    "q_full_star_rollup",
]

# r11 diffs that touch function bodies WITHOUT changing semantics —
# none yet this round. Names here queue at the head of the judged
# block (behind the 50-slot window) for an eventual driver re-hash.
_CHANGED_JUDGED_THIS_ROUND: list[str] = []


def _driver_judged() -> set[str]:
    """Names with any driver verdict, derived from the committed
    CORRECTNESS_r0*.json files (the driver's own per-round records)."""
    judged: set[str] = set()
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                judged.update(json.load(f).keys())
        except (OSError, ValueError):
            continue
    return judged


#: Names first registered THIS round (r11). The unjudged BACKLOG (the 8
#: r10 batch-2 names, all locally + judge oracle-verified) outranks them
#: so the oldest names retire first. r11 window math (VERDICT r10 item
#: 1): 6 changed-judged leads + 8 backlog = 14 slots, leaving 36 for
#: r11 registrations — cap new ops at ~25-30 so every newcomer is
#: driver-judged the same round and the backlog stays at zero.
_NEW_THIS_ROUND: set[str] = {
    # indicator batch (windows.py) — locally value-oracled at
    # sf0.001/0.01/0.1 on arrival
    "win_qstick",
    "win_balance_of_power",
    "win_awesome_oscillator",
    "win_chande_momentum",
    "win_dpo",
    "win_williams_r",
    "win_hull_ma",
    # lexical-statistics batch (textstats.py)
    "text_yules_k",
    "text_lexical_richness",
    "text_char_bigram_entropy",
    # graph batch (graph.py)
    "graph_avg_neighbor_degree",
    "graph_katz_centrality",
    # two-sample distribution batch (stats.py)
    "agg_cliff_delta",
    "agg_wasserstein_1d",
    "agg_energy_distance",
    "agg_hist_distance",
    "agg_mood_scale_test",
    # k-sample + estimation batch (stats.py)
    "agg_welch_anova",
    "agg_jonckheere_terpstra",
    "agg_hodges_lehmann",
    "agg_dagostino_k2",
    "agg_yuen_trimmed_t",
    # final r11 trio (cap 25, VERDICT r10 item 1)
    "agg_brunner_munzel",
    "agg_page_trend_test",
    "win_coppock",
}


def _ordered() -> dict[str, registry.Query]:
    all_q = registry.all_queries()
    judged = _driver_judged()
    front = [n for n in _CHANGED_THIS_ROUND if n in all_q]
    seen = set(front)
    # Backlog (pre-r10 never-judged) outranks _NEW_THIS_ROUND, and the
    # backlog's rows-only stragglers outrank the new names too — the
    # VERDICT r9 item-1 goal is a driver verdict for EVERY pre-existing
    # name this round, so the 50-slot window must cover all 48 backlog
    # names (44 value-oracled + 4 rows-only-by-design) before any new
    # registration spends a slot.
    fresh = [n for n in all_q if n not in seen and n not in judged]
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
    back = [n for n in all_q if n not in seen and n in judged]
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
