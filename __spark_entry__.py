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
    # r8 semantic implementation changes (VERDICT r7 items 1 & 3: the
    # data-proportional F.broadcast hints dropped, the inverted-index
    # candidate frame materialized once per session). Per VERDICT r7
    # item 7, changed names LEAD the window even when they already
    # carry a driver verdict (first eight below), capped at ~10; the
    # last three are changed AND never driver-judged.
    "corpus_dedup_keep",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_clusters",
    "join_geo_distance",
    "join_geo_knn",
    "sort_pareto_skyline",
    "corpus_curate_e2e",
    "dedup_threshold_sweep",
    "dedup_lsh_tuning",
    "dedup_cross_source_matrix",
]

# r8 diffs that touch function bodies WITHOUT changing semantics
# (finish_stream plan capture replaced bare awaitTermination — output
# identical, locally oracle-verified 7/7): beyond the ~10-name cap, so
# they lead the judged block (positions 51+) instead of spending
# backlog slots.
_CHANGED_JUDGED_THIS_ROUND = [
    "stream_foreach_batch_sink",
    "stream_file_ingest_clean",
    "stream_rollup_upsert",
    "stream_checkpoint_resume",
    "stream_quality_gate",
]


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


#: Names first registered in r8 — the unjudged BACKLOG (r7 and older)
#: outranks them in the fresh ordering so the 50-slot driver window
#: retires the oldest names first (VERDICT r6 item 1); the new ops are
#: all locally oracle-verified and queue right behind. (Older rounds'
#: new-name sets need no list here: registration order already ages
#: them correctly once the round closes.)
_NEW_THIS_ROUND: set[str] = {
    "agg_auc_roc", "agg_brier_score", "agg_log_loss",
    "agg_pr_thresholds", "agg_lift_deciles", "agg_bartlett_test",
    "agg_partial_corr", "agg_friedman_test", "quality_outlier_iqr",
    "win_atr", "win_donchian", "win_pivot_points",
    "corpus_lang_quotas", "text_vocab_coverage", "embed_hubness",
    "graph_modularity", "profile_column_entropy",
    "stream_topk_per_window", "sample_temporal_split", "join_geo_bbox",
    "privacy_pseudonymize", "fn_business_days",
    "privacy_suppression_smallcell", "agg_benjamini_hochberg",
    "stream_hll_active_users_bound",
}


def _ordered() -> dict[str, registry.Query]:
    all_q = registry.all_queries()
    judged = _driver_judged()
    front = [n for n in _CHANGED_THIS_ROUND if n in all_q]
    seen = set(front)
    fresh_oracle = sorted(
        (
            n for n in all_q
            if n not in seen and n not in judged and all_q[n].oracle
        ),
        key=lambda n: (n in _NEW_THIS_ROUND, list(all_q).index(n)),
    )
    fresh_rows_only = [
        n for n in all_q
        if n not in seen and n not in judged and not all_q[n].oracle
    ]
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
