"""Dump .explain('formatted') for named queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py --tag r14 --suffix before NAME [NAME ...]
       python tools/dump_plans.py --tag r14 --suffix before --battery   # both bench batteries

Driver-only: builds each DataFrame and captures the FORMATTED plan; no
job is executed except whatever eager materialization the operator
itself performs while constructing (localCheckpoint barriers etc.).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_poc_spark import registry
from data_ingestion_poc_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--battery", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    names = list(args.names)
    if args.battery:
        import bench

        names += [n for n in bench.HEADLINE + bench.HEADLINE2 if n not in names]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "plans", args.tag)
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark(app_name="dump-plans")
    qs = registry.all_queries()
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not registered")
            continue
        try:
            df = qs[name].fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: {exc}")
            continue
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"OK   {name} -> {path}")


if __name__ == "__main__":
    main()
