#!/usr/bin/env python
"""Measure DataFrame CONSTRUCTION time per query (guide §1: attribute cost).

``fn(spark, sf_dir)`` runs on the driver before any job: py4j expression
building + Catalyst analysis. The bench calls fn per pass, so this cost is
part of every per-query number. Queries built from large Python loops
(64-bit fingerprint folds, 110-branch CASE macros, iterative unrolls) can
spend 100s of ms here — this script ranks them.

Eager-materializing queries (checkpoint/persist inside fn) also run jobs
during fn; their numbers here include that and are tagged ``pins>0``.

Usage: python scripts/plan_build_times.py [N_slowest]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from emdatapipelines_spark import cachectl
    from emdatapipelines_spark.queries import QUERIES
    from emdatapipelines_spark.session import get_spark

    spark = get_spark(app_name="emdp-plan-build")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the session (parquet footers, py4j)
    QUERIES["a1_pricing_summary"](spark, sf_dir).schema
    cachectl.release_tracked()

    rows = []
    for name in sorted(QUERIES):
        m = cachectl.mark()
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, sf_dir)
            df.schema  # force analysis, no execution
            dt = time.perf_counter() - t0
            rows.append((round(dt, 4), name, cachectl.tracked_count(since=m)))
        except Exception as exc:  # noqa: BLE001
            rows.append((-1.0, f"{name} ERROR {type(exc).__name__}", 0))
        cachectl.release_tracked(since=m)
        spark.catalog.clearCache()
    rows.sort(reverse=True)
    out = {n: {"build_sec": s, "pins": p} for s, n, p in rows[:top_n]}
    print(json.dumps(out, indent=1))
    print(json.dumps({"total_build_sec": round(sum(max(s, 0) for s, _, _ in rows), 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
