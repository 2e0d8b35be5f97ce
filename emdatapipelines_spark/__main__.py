"""CLI entry point: run any query from the inventory against a fixture dir.

The reference exposes its marts through Dagster jobs and a REST layer
(`jobs/public_jobs.py`, `ops/public_ops.py`); the minimal operational twin
here is a runnable module so an operator can execute/inspect any named
query without writing code:

    python -m emdatapipelines_spark list
    python -m emdatapipelines_spark run a1_pricing_summary --limit 10
    python -m emdatapipelines_spark run w1_lag_yoy --format json
    python -m emdatapipelines_spark explain dd_prefix_jaccard
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="emdatapipelines_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list available query names")
    for cmd, hlp in (("run", "execute a query"), ("explain", "print the plan")):
        s = sub.add_parser(cmd, help=hlp)
        s.add_argument("query", help="query name (see `list`)")
        s.add_argument(
            "--sf-dir", default="/root/testdata/sf0.01", help="fixture directory"
        )
        if cmd == "run":
            s.add_argument("--format", choices=("table", "json", "csv"), default="table")
            s.add_argument("--limit", type=int, default=20)
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from .queries import QUERIES as queries
    if args.cmd == "list":
        for name in sorted(queries):
            print(name)
        return 0
    if args.query not in queries:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2
    from .session import get_spark

    spark = get_spark(app_name=f"emdp-cli-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    df = queries[args.query](spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
        return 0
    rows = df.limit(args.limit).collect()
    if args.format == "table":
        df.limit(args.limit).show(args.limit, truncate=40)
    elif args.format == "json":
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
    else:
        cols = df.columns
        print(",".join(cols))
        for r in rows:
            print(",".join(str(r[c]) for c in cols))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
