#!/usr/bin/env python
"""Skew stress probe (VERDICT r10 stretch #8): measure — not assert —
what a 90/10-skewed join key does at 10M rows, comparing

  baseline   plain shuffle join, AQE skew-split OFF (the pathology)
  aqe        plain shuffle join, AQE skew-split ON (the default engine fix)
  salted     operators/joins.py:salted_join (the explicit fallback), AQE
             skew-split OFF so the salt's own effect is visible

Shape: fact(10M rows), key = 0 for 90% of rows (the hot state) and
uniform over 1..999 for the rest; dim(1000 rows). Broadcast is disabled
(autoBroadcastJoinThreshold=-1) — with a broadcastable dim there is no
shuffle skew to study; this probes the joins-AQE-must-rebalance regime
(both-sides-shuffled SMJ/SHJ).

Each variant runs in its OWN subprocess with the Spark event log on; the
probe parses SparkListenerTaskEnd events of the heaviest stage into a
task-duration histogram (max / p95 / p50), which is the number the skew
story is actually about: one 9M-row task vs many even ones.

Usage: python scripts/skew_probe.py [rows]   (writes SKEW_PROBE.json)
Subprocess mode: python scripts/skew_probe.py --one <variant> <rows> <logdir>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _variant_session(log_dir: str):
    from pyspark.sql import SparkSession

    os.makedirs(log_dir, exist_ok=True)
    return (
        SparkSession.builder.master("local[32]")
        .appName("skew-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.eventLog.dir", log_dir)
        .getOrCreate()
    )


def run_variant(variant: str, rows: int, log_dir: str) -> int:
    from pyspark.sql import functions as F

    spark = _variant_session(log_dir)
    spark.sparkContext.setLogLevel("ERROR")
    skew_on = variant == "aqe"
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
    # scale AQE's skew thresholds to the probe size: the hot partition is
    # ~144 MB (9M rows x 16B), below the 256 MB default threshold — at
    # cluster scale the same 90/10 skew would be tens of GB, far past it.
    # Same values for every variant so coalescing behaves identically.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")

    fact = spark.range(rows).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(999)) + 1)
        .cast("bigint")
        .alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("w")
    )
    t0 = time.perf_counter()
    if variant == "salted":
        from emdatapipelines_spark.operators.joins import salted_join

        out = salted_join(fact, dim, "k", salt_buckets=32)
    else:
        out = fact.join(dim, "k")
    res = out.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    ).collect()
    wall = time.perf_counter() - t0
    print(json.dumps({"variant": variant, "wall_sec": round(wall, 2),
                      "n": res[0]["n"], "s": int(res[0]["s"])}))
    spark.stop()  # flush the event log
    return 0


def _task_histogram(log_dir: str) -> dict:
    """Parse the newest event log: task durations of the heaviest stage."""
    logs = sorted(
        (os.path.join(log_dir, f) for f in os.listdir(log_dir)
         if not f.startswith(".")),
        key=os.path.getmtime,
    )
    newest = logs[-1]
    if os.path.isdir(newest):  # Spark 4 rolled event-log directory
        parts = sorted(
            os.path.join(newest, f)
            for f in os.listdir(newest)
            if f.startswith("events")
        )
        newest = parts[-1]
    stages: dict[int, list[float]] = {}
    with open(newest) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerTaskEnd":
                info = ev.get("Task Info", {})
                dur = (info.get("Finish Time", 0) - info.get("Launch Time", 0)) / 1e3
                stages.setdefault(ev.get("Stage ID", -1), []).append(dur)
    def _summ(sid: int) -> dict:
        ds = sorted(stages[sid])
        n = len(ds)
        return {
            "stage_id": sid,
            "n_tasks": n,
            "task_sec_max": round(ds[-1], 2),
            "task_sec_p95": round(ds[int(0.95 * (n - 1))], 2),
            "task_sec_p50": round(ds[n // 2], 2),
            "task_sec_sum": round(sum(ds), 2),
            "skew_ratio_max_over_p50": round(ds[-1] / max(ds[n // 2], 1e-3), 1),
        }

    # the JOIN stage is the one with the fattest single task (the scan
    # stages have even tasks by construction); keep all stages for audit
    join_stage = max(stages, key=lambda s: max(stages[s]))
    out = _summ(join_stage)
    out["all_stages"] = [_summ(s) for s in sorted(stages)]
    return out


def main() -> int:
    if sys.argv[1:2] == ["--one"]:
        return run_variant(sys.argv[2], int(sys.argv[3]), sys.argv[4])

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    report: dict = {"rows": rows, "hot_key_share": 0.9, "variants": {}}
    for variant in ("baseline", "aqe", "salted"):
        log_dir = f"/tmp/skew_probe_{variant}"
        if os.path.isdir(log_dir):
            import shutil

            shutil.rmtree(log_dir)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", variant,
             str(rows), log_dir],
            capture_output=True, text=True, timeout=1200,
        )
        line = next((l for l in reversed(proc.stdout.splitlines())
                     if l.startswith("{")), None)
        if proc.returncode != 0 or line is None:
            report["variants"][variant] = {"error": (proc.stderr or "")[-500:]}
            continue
        rec = json.loads(line)
        rec.update(_task_histogram(log_dir))
        report["variants"][variant] = rec
    with open("SKEW_PROBE.json", "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
