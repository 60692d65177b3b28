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
_CHANGED_THIS_ROUND: list[str] = [
    # r15 (optimization round 2 of 2): NO query's values changed — every
    # rewrite is pinned value-identical by the oracle. The restructured
    # names sit in _CHANGED_JUDGED_THIS_ROUND below so the driver's
    # window re-hashes them; this list is for VALUE changes only.
]

# r15: every operator whose PHYSICAL implementation was restructured
# this round (driver-walk NSW, tiled pair kernels, size-dispatched
# graph broadcasts, integer label codes, Expand splits, candidate
# dedup, bucketed UDF groups, fanout_repartition call sites) — values
# identical, re-oracled locally at sf0.01 plus robustness axes; listed
# here so CORRECTNESS_r15 re-verifies their hashes on the driver.
_CHANGED_JUDGED_THIS_ROUND: list[str] = [
    "sim_search_nsw",
    "sim_search_nsw_recall",
    "dedup_fuzzy_name",
    "udf_cogrouped",
    "udf_stateful_decay",
    "graph_label_propagation",
    "q_full_star_rollup",
    "agg_distinct",
    "graph_hits",
    "graph_jaccard_neighbors",
    "graph_assortativity",
    "ingest_blob_store_policies",
    "graph_pagerank",
    "graph_katz_centrality",
    "graph_kcore",
    "graph_bfs_distance",
    "dedup_embedding_cosine",
    "dedup_semantic",
    "dedup_embedding_recall",
    "dedup_semantic_recall",
    "embed_hubness",
    "embed_hubness_ivf",
    "embed_hubness_exact",
    "embed_intrinsic_dim",
    "agg_countmin_sketch",
    "agg_bootstrap_ci",
    "agg_histogram_equidepth",
    "dedup_minhash",
    "corpus_decontaminate",
    "corpus_decontaminate_bloom",
    "profile_table",
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


#: Names first registered THIS round (r14). Window math is asserted at
#: round close by committing the PREDICTED first-50 window (BASELINE
#: "r14 window bookkeeping") so the CORRECTNESS_r14 diff is mechanical
#: (VERDICT r13 item 2).
_NEW_THIS_ROUND: set[str] = {
    # Batch A: method agreement + moment/scale screens.
    "agg_deming_regression",
    "agg_bland_altman",
    "agg_bimodality_coefficient",
    "agg_cochran_c",
    "agg_hartley_fmax",
    "agg_gini_mean_difference",
    # Batch B: ordinal-association companions to kendall_tau.
    "agg_gk_gamma",
    "agg_stuart_tau_c",
    "agg_blomqvist_beta",
    # Exhibits (VERDICT r13 item 5's named gaps + the dedup-ladder
    # character-level member).
    "dedup_edit_distance",
    "win_pattern_varlen",
    "scan_variant_shred",
    "stream_state_reader",
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
