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
import csv
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
    cols = df.columns
    if args.format == "table":
        # rendered from the already-collected rows: one execution, not two
        cells = [[_cell(r[c]) for c in cols] for r in rows]
        widths = [
            max(len(c), *(len(row[i]) for row in cells)) if cells else len(c)
            for i, c in enumerate(cols)
        ]
        print(" | ".join(c.ljust(w) for c, w in zip(cols, widths)))
        print("-+-".join("-" * w for w in widths))
        for row in cells:
            print(" | ".join(v.ljust(w) for v, w in zip(row, widths)))
    elif args.format == "json":
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
    else:
        w = csv.writer(sys.stdout)
        w.writerow(cols)
        for r in rows:
            w.writerow(["" if r[c] is None else r[c] for c in cols])
    return 0


def _cell(v: object, width: int = 40) -> str:
    s = "null" if v is None else str(v)
    return s if len(s) <= width else s[: width - 1] + "…"


if __name__ == "__main__":
    raise SystemExit(main())
