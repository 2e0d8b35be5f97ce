#!/usr/bin/env python
"""Benchmark harness: run the full query inventory at sf0.1 and emit ONE JSON line.

Contract (driver): ``{"metric": ..., "value": N, "unit": "sec", "queries":
{"q1": sec, ...}, "sf": ...}`` on stdout. Inputs come from
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

Each query is forced end-to-end with the built-in ``noop`` sink so every
column is materialized through the whole plan (a bare ``count()`` would let
Catalyst prune the projection and under-report the work). One warmup query
amortizes JVM startup, and each query runs ``$SPARK_GRAFT_BENCH_PASSES``
times (default 2) with the LAST pass reported — r3's apparent 2-4.5x
regressions on the front-of-suite queries were cold-JVM/codegen artifacts,
so the steady-state pass is the comparable number (cold pass-1 times are
kept in BENCH_FULL.json under "cold_pass" for the diagnosis trail).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def _force(df) -> None:
    """Execute the full plan, all columns, no driver-side result transfer."""
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from emdatapipelines_spark.session import get_spark

    spark = get_spark(app_name="emdatapipelines-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()

    # Warmup: trigger codegen/JIT + parquet footer reads once.
    warm = queries.get("a1_pricing_summary") or next(iter(queries.values()))
    _force(warm(spark, sf_dir))

    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2")))
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name in sorted(queries):
        try:
            last = 0.0
            for p in range(passes):
                t0 = time.perf_counter()
                _force(queries[name](spark, sf_dir))
                last = time.perf_counter() - t0
                if p == 0:
                    cold[name] = round(last, 4)
            timings[name] = round(last, 4)
            # Benchmark isolation: operators that persist() intermediates
            # (e.g. the jaccard shingle frame) leak cached blocks into the
            # NEXT query's memory budget — across 145 queries the
            # accumulated cache thrashes eviction and inflated heavy-query
            # times up to 3x, run-order dependent. A production driver owns
            # its cache lifecycle; the bench isolates per query.
            spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001 - report, don't abort the suite
            # keep head+tail so the artifact records the full exception class
            # and the end of the message (truncating mid-token loses both)
            msg = f"{type(exc).__name__}: {exc}"
            # artifact keeps first+last 2 KB (stdout line carries names only)
            failures[name] = msg if len(msg) <= 4096 else msg[:2048] + " ... " + msg[-2048:]

    total = round(sum(timings.values()), 4)
    line = {
        "metric": "suite_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "passes": passes,
    }
    if passes > 1:
        line["cold_pass"] = cold
    if failures:
        line["failures"] = failures

    # Full record to a repo artifact (the driver keeps only the LAST 2000
    # chars of stdout — BENCH_r01.json's "tail" proved it — so the full
    # per-query map lives here and the stdout line is trimmed to fit).
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_FULL.json"), "w") as fh:
        json.dump(line, fh, indent=1, sort_keys=True)

    budget = 1820
    out = dict(line)
    out.pop("cold_pass", None)  # full map lives in BENCH_FULL.json
    if failures:
        out["failures"] = sorted(failures)  # names only; messages in BENCH_FULL.json
    q = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    while len(json.dumps({**out, "queries": q}, separators=(",", ":"))) > budget and len(q) > 1:
        q.pop(next(reversed(q)))  # drop the fastest remaining query
    out["queries"] = q
    if len(q) < len(timings):
        out["omitted_fast_queries"] = len(timings) - len(q)
        out["detail"] = "BENCH_FULL.json"
    print(json.dumps(out, separators=(",", ":")))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
