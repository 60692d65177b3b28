"""Time named queries with bench.py's exact methodology (noop sink,
warm session, min/mean of N runs). Usage:

    python tools/time_queries.py [--runs 3] NAME [NAME ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_poc_spark import registry
from data_ingestion_poc_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="time-queries")
    qs = registry.all_queries()

    def run(name: str) -> float:
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        df = qs[name].fn(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        return dt

    run("agg_hash_group")  # warmup
    import bench

    bench._warm_python_worker_pools(spark)
    samples = {n: [] for n in args.names}
    for _ in range(args.runs):
        for n in samples:
            samples[n].append(run(n))
    out = {
        n: {"min": round(min(ts), 3), "mean": round(sum(ts) / len(ts), 3)}
        for n, ts in samples.items()
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
