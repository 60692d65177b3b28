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
    # r6 fixes: broken self-join repaired (r5's one FAIL), dof-matched
    # chi-squared verdict, zero-filled Benford digit domain,
    # microsecond-precision sessionize gap.
    "sort_pareto_skyline",
    "agg_chi_squared",
    "agg_benford",
    "q_browse_abandonment",
    # r6 new operators (zero verdicts of any kind yet):
    "agg_anova_oneway",
    "agg_ratio_delta_ci",
    "q_attribution_last_touch",
    "win_holt_linear",
    "dedup_soft_reweight",
    "fn_geohash",
    "graph_label_propagation",
    "agg_survival_km",
    "win_kalman_1d",
    "dedup_cluster_histogram",
    "q_pattern_funnel_path",
    "agg_hll_intersection_bound",
    "corpus_dedup_manifest",
    "sim_search_bq",
    "sim_search_bq_recall",
    "q_basket_sequence_rules",
    "agg_power_analysis",
    "agg_cuped_adjustment",
    "win_seasonal_baseline",
    "win_theil_sen",
    "graph_bfs_distance",
    "embed_hard_negatives",
    "text_source_drift",
    "agg_winsorized_mean",
    "win_bollinger",
    "win_rsi",
    "agg_srm_check",
    "quality_freshness",
    "graph_hits",
    "graph_kcore",
    "profile_fd_audit",
    "q_stickiness_dau_mau",
    "text_bigram_lm",
    "embed_outlier_centroid",
    "agg_autocorr",
    "corpus_curriculum_phases",
    "win_changepoint_scan",
    "sink_expire_snapshots",
    "udf_grouped_trimmed_mean",
    "corpus_importance_weights",
    "text_code_detect",
    "embed_scalar_quant",
    "agg_seasonal_strength",
    "graph_assortativity",
    "agg_markov_transitions",
    "q_revenue_deciles",
    "q_repurchase_interval",
    "corpus_tokenizer_fertility",
    "q_cohort_ltv",
    "agg_category_drift",
    "dedup_lsh_tuning",
    "win_rescaled_range",
    "privacy_k_anonymity",
    "privacy_l_diversity",
    "privacy_dp_counts",
    "q_growth_accounting",
    "corpus_dedup_best_keeper",
    "agg_hill_tail_index",
    "scan_partition_evolution",
    "quality_calendar_gaps",
    "sim_search_mips",
    "q_price_elasticity",
    "q_abc_classification",
    "udf_scalar_iter",
    "dedup_cross_source_matrix",
    "agg_expected_shortfall",
    "corpus_post_dedup_mix",
    "q_activity_streaks",
    "q_full_star_rollup",
    "agg_sprt_monitor",
    "agg_calibration_ece",
    "agg_gumbel_maxima",
    "win_spc_rules",
    "text_oov_rate",
    "sim_search_ivf_balance",
    "agg_mann_kendall",
    "profile_join_skew",
    "agg_overdispersion",
    "agg_markov_stationary",
    "sample_class_balance",
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


def _ordered() -> dict[str, registry.Query]:
    all_q = registry.all_queries()
    judged = _driver_judged()
    front = [n for n in _CHANGED_THIS_ROUND if n in all_q]
    seen = set(front)
    fresh_oracle = [
        n for n in all_q
        if n not in seen and n not in judged and all_q[n].oracle
    ]
    fresh_rows_only = [
        n for n in all_q
        if n not in seen and n not in judged and not all_q[n].oracle
    ]
    back = [n for n in all_q if n not in seen and n in judged]
    order = front + fresh_oracle + fresh_rows_only + back
    return {n: all_q[n] for n in order}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle
        for name, q in _ordered().items()
        if q.oracle is not None
    }
