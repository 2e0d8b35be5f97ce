#!/usr/bin/env python
"""Parameter-sweep differential fuzzer for the LLM-data families
(fuzz phase 4, VERDICT r13 #6).

Draws random PARAMETERS per family (`emdatapipelines_spark/paramfuzz.py`:
minhash bands/rows/shingle-n, chunk length, BM25 k1/b/k/terms, BPE merge
count, ts lag grids) and checks the engine against brute-force pure-Python
baselines computed from the same collected sample. Writes a ledger to
stdout and exits non-zero on any divergence.

Usage: python scripts/param_fuzz.py [n_cases] [start_seed] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"

    from pyspark.sql import SparkSession

    from emdatapipelines_spark.paramfuzz import run_case

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    fams: Counter = Counter()
    failures: list[tuple[int, str, str]] = []
    t0 = time.time()
    for seed in range(start, start + n):
        family, errs = run_case(spark, sf_dir, seed)
        fams[family] += 1
        if errs:
            failures.append((seed, family, errs[0]))
            print(f"FAIL seed={seed} family={family}")
            for e in errs[:5]:
                print(f"  {e}")
        if (seed - start + 1) % 25 == 0:
            print(
                f"... {seed - start + 1}/{n} cases, {len(failures)} failures,"
                f" {time.time() - t0:.0f}s",
                flush=True,
            )
    dt = time.time() - t0
    print(
        f"\n{n} param draws (seeds {start}..{start + n - 1}) @ {sf_dir}: "
        f"{n - len(failures)} ok, {len(failures)} diverged, {dt:.0f}s "
        f"({dt / n:.2f}s/case); families: {dict(fams)}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
