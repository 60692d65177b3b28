"""Physical-plan audit: dump scale-relevant plan properties for the bench
headline queries into PLANS.md.

For each query: exchange (shuffle) count, broadcast usage, join
strategies, parquet pushdown evidence (PushedFilters / ReadSchema), and
whole-stage-codegen span count. This is the '.explain and iterate' loop
made repeatable — re-run after any operator change and diff PLANS.md.

Usage: python tools/plan_audit.py [--sf SF_DIR] [-o PLANS.md]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_poc_spark import registry
from data_ingestion_poc_spark.session import get_spark

# Streaming queries execute via their own sink; their micro-batch plans are
# not reachable from the returned (memory-table) DataFrame, so audit the
# batch-relational headliners only.
AUDITED = [
    "scan_parquet",
    "agg_hash_group",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_pivot",
    "join_inner_hash",
    "join_broadcast",
    "join_sort_merge",
    "join_anti",
    "join_asof_time",
    "join_skew_salted",
    "join_bucketed_colocated",
    "q_shipping_priority",
    "q_order_priority",
    "q_local_supplier_volume",
    "q_returned_items",
    "q_promo_revenue",
    "q_large_volume_customer",
    "q_forecast_revenue",
    "q_discounted_brand_revenue",
    "q_customer_distribution",
    "q_priority_lines",
    "q_top_supplier",
    "q_small_qty_revenue",
    "q_idle_rich_customers",
    "q_min_cost_supplier",
    "q_important_part_value",
    "q_product_profit",
    "q_supplier_part_counts",
    "q_dominant_suppliers",
    "q_sole_late_shippers",
    "join_range_bucketed",
    "scan_partition_pruned",
    "scan_schema_evolution",
    "scan_orc_roundtrip",
    "rollup_time_hierarchy",
    "agg_unpivot",
    "agg_arg_extrema",
    "corpus_quality_filter",
    "join_asof_forward",
    "win_moving_frame",
    "fn_bitwise",
    "fn_datetime_calendar",
    "win_time_range",
    "join_null_safe",
    "agg_histogram",
    "agg_string_concat",
    "dedup_fuzzy_name",
    "dedup_embedding_cosine",
    "dedup_embedding_recall",
    "win_sessionize_salted",
    "ingest_sink_metadata",
    "sql_cte_subquery",
    "profile_table",
    "win_topk_per_group",
    "win_distribution",
    "limit_topk",
    "text_stats",
    "text_tokenize_tf",
    "dedup_exact_hash",
    "dedup_minhash",
    "sim_search_knn",
    "sim_search_ivf",
    "embed_centroids",
    "win_gapfill_locf",
    "win_ignore_nulls",
    "text_tfidf",
    "text_pii_scrub",
    # r3 additions
    "dedup_ngram_jaccard",
    "corpus_mix_weighted",
    "corpus_mix_report",
    "corpus_token_budget",
    "text_repetition_filter",
    "text_boilerplate_ngrams",
    "embed_norm_stats",
    "sink_merge_upsert",
    "join_dpp_pruned",
    "join_bloom_pruned",
    "scan_metadata_columns",
    "sample_reservoir_group",
    "text_entropy",
    "corpus_shard_assign",
    "corpus_decontaminate",
    "sim_search_ann_multiprobe",
    "join_lateral_topk",
    "sql_recursive_cte",
    "scan_cbo_stats",
    "q_funnel_conversion",
    "corpus_pack_blocks",
    "agg_regr",
    "agg_bitmap_distinct",
    "agg_mode",
    "win_ratio_to_report",
    "join_existence_or",
    "embed_gram_matrix",
    "scan_python_datasource",
    "agg_approx_top_k",
]


def audit(df) -> dict:
    df.collect()  # force execution so AQE finalizes and codegen annotates
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    # the adaptive plan string appends "== Initial Plan ==" — audit only
    # the final (post-AQE) section or every node counts twice
    plan = plan.split("== Initial Plan ==")[0]
    # drop ReusedExchange lines first: they embed the text "Exchange
    # hashpartitioning(...)" of the exchange they POINT AT, but move no
    # data themselves — counting them overstates the shuffle budget.
    exec_lines = "\n".join(
        ln for ln in plan.splitlines() if "ReusedExchange" not in ln
    )
    return {
        "shuffles": len(
            re.findall(r"Exchange (?:hash|range|SinglePartition)", exec_lines)
        ),
        "broadcasts": plan.count("BroadcastExchange"),
        "joins": sorted(set(re.findall(r"(\w+Join)\b", plan)) - {"LateralJoin"}),
        # non-empty on AT LEAST one scan (a dimension scanned in full must
        # not mask a pushed fact-side filter); Spark truncates long scan
        # lines ("...") so the list's closing bracket may never appear
        "pushed_filters": any(
            p.strip()
            for p in re.findall(r"PushedFilters: \[(.*?)(?:\]|, ReadSchema)", plan)
        ),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "take_ordered": "TakeOrderedAndProject" in plan,
        "bucketed_scan": "Bucketed: true" in plan,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("-o", "--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"))
    args = ap.parse_args()
    spark = get_spark(app_name="dip-plan-audit")
    qs = registry.all_queries()

    lines = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        f"Generated by `python tools/plan_audit.py --sf {args.sf}` "
        "(re-run after operator changes; see tools/plan_audit.py).",
        "",
        "Columns: shuffles = `Exchange hash/range` nodes (the scale cost driver);",
        "bcast = BroadcastExchange nodes (map-side joins, no big-side shuffle);",
        "pushdown = non-empty parquet PushedFilters; wscg = distinct",
        "whole-stage-codegen spans; notes = plan facts worth knowing.",
        "",
        "| query | shuffles | bcast | joins | pushdown | wscg | notes |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in AUDITED:
        df = qs[name].fn(spark, args.sf)
        a = audit(df)
        notes = []
        if a["take_ordered"]:
            notes.append("top-k via TakeOrderedAndProject")
        if a["bucketed_scan"]:
            notes.append("bucketed scan, zero-shuffle join")
        lines.append(
            f"| `{name}` | {a['shuffles']} | {a['broadcasts']} | "
            f"{', '.join(a['joins']) or '—'} | "
            f"{'yes' if a['pushed_filters'] else '—'} | {a['codegen_spans']} | "
            f"{'; '.join(notes) or '—'} |"
        )
    out = "\n".join(lines) + "\n"
    with open(args.out, "w") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    main()
