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
    # r7 new operator (no verdict of any kind yet):
    "corpus_curate_e2e",
    # r7 implementation changes that are ALSO driver-unjudged (ADVICE
    # fixes: mips constant augmented norm, scalar_iter ln(1+x),
    # dp_counts boundary clamp; de-broadcast of SF-scaling dims;
    # aliased self-joins; url-canonicalization refactor):
    "sim_search_mips",
    "udf_scalar_iter",
    "privacy_dp_counts",
    "dedup_consensus",
    "privacy_k_anonymity",
    "q_repurchase_interval",
    "q_price_elasticity",
    "q_abc_classification",
    "q_full_star_rollup",
    "dedup_url_canonical",
]

# r7 implementation changes whose names ALREADY carry a driver verdict
# (oracle re-verified locally this round): these lead the judged block
# (positions 51+) so the 50-slot window stays fully spent on the 95
# never-driver-judged names — the r6 VERDICT's top rotation ask.
_CHANGED_JUDGED_THIS_ROUND = [
    "udf_grouped_trimmed_mean",
    "q_sole_late_shippers",
    "q_basket_sequence_rules",
    "graph_triangle_count",
    "q_market_basket",
    # r7 profile fix: edge set materializes once (same output)
    "dedup_clusters",
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


#: Names first registered in r7 — the unjudged BACKLOG (r6 and older)
#: outranks them in the fresh ordering so the 50-slot driver window
#: retires the oldest names first (VERDICT r6 item 1); the new ops are
#: all locally oracle-verified and queue right behind.
_NEW_THIS_ROUND = {
    "corpus_curate_e2e", "agg_jarque_bera", "agg_levene_test",
    "agg_cohens_d", "agg_theil_index", "agg_spearman_corr",
    "agg_kruskal_wallis", "agg_capability_index", "agg_odds_ratio",
    "agg_runs_test", "agg_entropy_rate", "agg_mcnemar_test",
    "agg_median_ci", "agg_weibull_fit", "privacy_t_closeness",
    "privacy_generalization_ladder", "win_stochastic_oscillator",
    "win_ulcer_index", "win_vwap", "win_parkinson_volatility",
    "win_obv", "win_ewma_crossover", "graph_clustering_coefficient",
    "graph_degree_powerlaw", "sample_systematic", "quality_fk_orphans",
    "embed_cluster_purity", "embed_intrinsic_dim",
    "embed_dim_variance_spectrum", "embed_centroid_margin",
    "q_seasonal_order_heatmap", "q_supplier_wilson_score",
    "q_xyz_variability", "corpus_mix_kl", "text_language_mix",
    "text_word_pmi", "text_source_similarity_js",
    "sink_dynamic_partition_overwrite", "stream_quality_gate",
    "dedup_shingle_df_histogram", "dedup_threshold_sweep",
    "agg_poisson_rate_ci", "q_customer_band_migration",
    "q_supplier_lead_time", "agg_eb_shrinkage", "embed_isotropy",
    "text_word_burstiness", "q_time_to_convert",
    "dedup_candidate_budget", "stream_hourly_active_users",
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
