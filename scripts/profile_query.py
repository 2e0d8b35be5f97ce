#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1: measure first).

For each named query: run ``passes`` noop-sink passes (same methodology as
bench.py), and report wall seconds plus Spark-side job/stage/task counts
pulled from the AppStatusStore — the attribution bench.py's wall numbers
lack (is a slow query many tiny jobs, one big shuffle, or per-row CPU?).

Usage: python scripts/profile_query.py [--explain DIR] name [name ...]
       --explain DIR also writes ``DIR/<name>.txt`` with explain("formatted").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _counters(spark):
    store = spark.sparkContext._jsc.sc().statusStore()
    jobs = store.jobsList(None)
    n_jobs = jobs.size()
    n_stages = n_tasks = 0
    it = jobs.iterator()
    while it.hasNext():
        j = it.next()
        n_stages += j.stageIds().size()
        n_tasks += j.numTasks()
    return n_jobs, n_stages, n_tasks


def main() -> int:
    args = sys.argv[1:]
    explain_dir = None
    if args[:1] == ["--explain"]:
        explain_dir = args[1]
        os.makedirs(explain_dir, exist_ok=True)
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))

    import __spark_entry__ as entrymod
    from bench import _host_calibration
    from emdatapipelines_spark.cachectl import release_tracked
    from emdatapipelines_spark.session import get_spark

    # Same host-drift control as bench.py: shared-host speed drift (r7
    # finding) can swing same-code numbers 1.2-3x; the scalar separates
    # drift (calibration moved too) from plan changes (calibration steady).
    print(json.dumps({"host_calib_sec_start": _host_calibration()}), flush=True)

    spark = get_spark(app_name="emdp-profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    warm = queries["a1_pricing_summary"]
    _force(warm(spark, sf_dir))
    release_tracked()
    spark.catalog.clearCache()

    out = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(name)
        times = []
        j0, s0, t0c = _counters(spark)
        for _ in range(passes):
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            times.append(round(time.perf_counter() - t0, 4))
            release_tracked()
            spark.catalog.clearCache()
        j1, s1, t1c = _counters(spark)
        spark.sparkContext.setJobDescription(None)
        rec = {
            "passes": times,
            "min_warm": round(min(times[1:]) if len(times) > 1 else times[0], 4),
            "jobs_per_pass": round((j1 - j0) / passes, 1),
            "stages_per_pass": round((s1 - s0) / passes, 1),
            "tasks_per_pass": round((t1c - t0c) / passes, 1),
        }
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
        if explain_dir:
            from emdatapipelines_spark.queries import QUERIES

            raw = QUERIES[name](spark, sf_dir)
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(raw._sc._jvm.PythonSQLUtils.explainString(
                    raw._jdf.queryExecution(), "formatted"))
            release_tracked()
            spark.catalog.clearCache()
    print(json.dumps({"host_calib_sec_end": _host_calibration()}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
