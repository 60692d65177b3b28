"""Profile dedup_clusters' cost structure (VERDICT r6 watch item: the
headline crept 4.9 -> 6.9 s over two rounds and docs10 swings 43-99 s).

Breaks the operator into its three phases and times each:

  1. pair graph  — jaccard_pairs_checkpointed (shingle index + candidate
     join + verify + localCheckpoint), the input the CC loop consumes;
  2. CC loop     — per-round wall: hop join/agg + jump join lineage vs
     the localCheckpoint materialization vs the convergence collect;
  3. consumers   — the final sizes join.

Then compares materialization strategies for the loop frame at the same
fixture:

  every   — localCheckpoint every round (shipped behavior);
  every2  — localCheckpoint every 2nd round (lineage grows one round
            deeper between cuts; convergence check still needs a job,
            which executes the uncheckpointed lineage twice on the off
            rounds);
  persist — persist(MEMORY_AND_DISK) + a count() to force, unpersist the
            previous round (no lineage TRUNCATION — the DAG still grows,
            but replay hits the cached partitions).

Usage: python tools/profile_cc.py [--sf SF_DIR] [--mults 1,4,10]
Writes one JSON line per (mult, strategy); paste the table into
BASELINE.md's dedup_clusters section.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from data_ingestion_poc_spark.llm import dedup
from data_ingestion_poc_spark.session import get_spark


def time_phases(spark, sf_dir: str, strategy: str = "every") -> dict:
    """Run the CC pipeline with per-phase timers. Returns phase seconds."""
    # fresh pair cache per run so phase 1 is really measured
    dedup._PAIRS_CACHE.clear()
    out: dict = {"strategy": strategy}

    t0 = time.time()
    pairs = dedup.jaccard_pairs_checkpointed(spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    n_pairs = pairs.count()
    out["pairs_sec"] = round(time.time() - t0, 2)
    out["n_pairs"] = n_pairs

    t0 = time.time()
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    n_parts = max(
        1,
        min(
            int(spark.conf.get("spark.sql.shuffle.partitions")),
            (2 * n_pairs) // 100_000 + 1,
        ),
    )
    edges = edges.repartition(n_parts, "dst").localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("lbl"))
        .localCheckpoint()
    )
    out["edges_init_sec"] = round(time.time() - t0, 2)

    rounds = []
    mat_total = 0.0
    prev_persisted = None
    for rnd in range(50):
        r0 = time.time()
        nbr_min = (
            edges.join(
                labels.select(F.col("doc_id").alias("dst_id"), "lbl"),
                F.col("dst") == F.col("dst_id"),
            )
            .groupBy("src")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        cand = labels.join(
            nbr_min, F.col("doc_id") == F.col("src"), "left"
        ).select(
            "doc_id",
            F.col("lbl").alias("old_lbl"),
            F.least("lbl", F.coalesce("nbr_lbl", "lbl")).alias("cand"),
        )
        if rnd == 0:
            new_labels = cand.select(
                "doc_id",
                F.col("cand").alias("lbl"),
                (F.col("cand") != F.col("old_lbl")).cast("long").alias("chg"),
            )
        else:
            new_labels = cand.join(
                labels.select(
                    F.col("doc_id").alias("p"), F.col("lbl").alias("p_lbl")
                ),
                F.col("cand") == F.col("p"),
                "left",
            ).select(
                "doc_id",
                F.least("cand", F.coalesce("p_lbl", "cand")).alias("lbl"),
                (F.least("cand", F.coalesce("p_lbl", "cand")) != F.col("old_lbl"))
                .cast("long")
                .alias("chg"),
            )
        build_sec = time.time() - r0

        m0 = time.time()
        if strategy == "every" or (strategy == "every2" and rnd % 2 == 1):
            new_labels = new_labels.localCheckpoint()
        elif strategy == "persist":
            new_labels = new_labels.persist(StorageLevel.MEMORY_AND_DISK)
            new_labels.count()  # force
            if prev_persisted is not None:
                prev_persisted.unpersist()
            prev_persisted = new_labels
        mat_sec = time.time() - m0
        mat_total += mat_sec

        c0 = time.time()
        changed = new_labels.agg(F.sum("chg")).collect()[0][0]
        check_sec = time.time() - c0

        rounds.append(
            {
                "round": rnd,
                "build_sec": round(build_sec, 2),
                "mat_sec": round(mat_sec, 2),
                "check_sec": round(check_sec, 2),
            }
        )
        labels = new_labels.select("doc_id", "lbl")
        if not changed:
            break
    if prev_persisted is not None:
        prev_persisted.unpersist()
    out["rounds"] = rounds
    out["n_rounds"] = len(rounds)
    out["loop_sec"] = round(
        sum(r["build_sec"] + r["mat_sec"] + r["check_sec"] for r in rounds), 2
    )
    out["mat_sec_total"] = round(mat_total, 2)
    out["total_sec"] = round(
        out["pairs_sec"] + out["edges_init_sec"] + out["loop_sec"], 2
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--mults", default="")
    ap.add_argument("--strategies", default="every,every2,persist")
    args = ap.parse_args()
    spark = get_spark(app_name="dip-profile-cc")

    dirs = [args.sf]
    if args.mults:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from scale_probe import build  # noqa: PLC0415

        dirs = [
            build(spark, int(m), mode="corpus")
            for m in args.mults.split(",")
        ]
    for d in dirs:
        for strat in args.strategies.split(","):
            res = time_phases(spark, d, strat)
            res["sf_dir"] = d
            print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
