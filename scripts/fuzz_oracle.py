#!/usr/bin/env python
"""Randomized differential fuzzer vs DuckDB (VERDICT r10 #2).

Generates seeded random plans over the fixture schemas
(`emdatapipelines_spark/fuzz.py`), runs each on Spark (DataFrame API) and
DuckDB (oracle SQL), and compares canonical row sets. Writes a ledger to
stdout and exits non-zero on any divergence.

Usage: python scripts/fuzz_oracle.py [n_cases] [start_seed] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"

    from pyspark.sql import SparkSession

    from emdatapipelines_spark.fuzz import generate_case, run_case
    from tests.oracle_harness import duckdb_con

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_con(sf_dir)

    shapes: Counter = Counter()
    failures: list[tuple[int, str, str]] = []
    t0 = time.time()
    for seed in range(start, start + n):
        case = generate_case(seed)
        shapes[case.shape.split("->")[-1]] += 1
        err = run_case(case, spark, con, sf_dir)
        if err is not None:
            failures.append((seed, case.shape, err))
            print(f"FAIL seed={seed} shape={case.shape}\n  {err}\n  SQL: {case.duck_sql}")
        if (seed - start + 1) % 50 == 0:
            print(
                f"... {seed - start + 1}/{n} cases, {len(failures)} failures,"
                f" {time.time() - t0:.0f}s",
                flush=True,
            )
    dt = time.time() - t0
    print(
        f"\n{n} cases (seeds {start}..{start + n - 1}) @ {sf_dir}: "
        f"{n - len(failures)} ok, {len(failures)} diverged, {dt:.0f}s "
        f"({dt / n:.2f}s/case); shapes: {dict(shapes)}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
