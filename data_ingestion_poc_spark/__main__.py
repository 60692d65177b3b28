"""Command-line front door: run any registered query or ad-hoc SQL.

A user of the reference repo drives it as `python worker.py` over a
config file (reference worker.py:1-40); the equivalent surface here is:

    python -m data_ingestion_poc_spark list [--grep PAT]
    python -m data_ingestion_poc_spark run <query> [--sf DIR] [--limit N]
                                               [--explain] [--json]
    python -m data_ingestion_poc_spark sql "SELECT ..." [--sf DIR] ...

`run` executes a registry query by name; `sql` registers every testdata
table as a temp view and hands the statement to spark.sql() — the
ad-hoc escape hatch. Output is a plain .show() table or JSON lines.
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF = "/root/testdata/sf0.01"


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m data_ingestion_poc_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list registered queries")
    lp.add_argument("--grep", default=None, help="substring filter")

    rp = sub.add_parser("run", help="run a registered query")
    rp.add_argument("query")
    rp.add_argument("--sf", default=DEFAULT_SF)
    rp.add_argument("--limit", type=int, default=20)
    rp.add_argument("--explain", action="store_true")
    rp.add_argument("--json", action="store_true")

    sp = sub.add_parser("sql", help="run ad-hoc Spark SQL over the tables")
    sp.add_argument("statement")
    sp.add_argument("--sf", default=DEFAULT_SF)
    sp.add_argument("--limit", type=int, default=20)
    sp.add_argument("--json", action="store_true")
    return p


def _emit(df, limit: int, as_json: bool) -> None:
    if as_json:
        for line in df.limit(limit).toJSON().collect():
            print(line)
    else:
        df.show(limit, truncate=False)


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from . import registry

    if args.cmd == "list":
        for name, q in sorted(registry.all_queries().items()):
            if args.grep and args.grep not in name:
                continue
            kind = "sql-oracle" if q.oracle else "rows-only"
            doc = (q.doc or "").strip().splitlines()
            head = doc[0] if doc else ""
            print(f"{name:36s} {kind:10s} {head}")
        return 0

    if args.cmd == "run":
        # Validate the name BEFORE the Spark session: `run <unknown>`
        # exits 2 without paying JVM startup for an error message.
        q = registry.all_queries().get(args.query)
        if q is None:
            print(f"unknown query: {args.query}", file=sys.stderr)
            return 2

    from .session import get_spark

    spark = get_spark()
    if args.cmd == "run":
        df = q.fn(spark, args.sf)
        if args.explain:
            df.explain("formatted")
        _emit(df, args.limit, args.json)
        return 0

    from .catalog import register_views

    register_views(spark, args.sf)
    _emit(spark.sql(args.statement), args.limit, args.json)
    return 0


if __name__ == "__main__":
    sys.exit(main())
