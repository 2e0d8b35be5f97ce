#!/usr/bin/env python
"""Per-query A/B of the ingest restore repartition (r15, VERDICT #1).

For every registered query, time noop-sink passes with the starved-scan
restore ACTIVE vs DISABLED (``registry._RESTORE_SPLITS`` emptied), arms
alternating inside one session so host drift cancels pair-wise. The output
ranks queries by (on_min - off_min): a positive delta means the query pays
more for the ingest exchange than the exchange buys in map-side
parallelism — the restore-aware opt-out candidates (guide §2.5, §1.2; the
p1/p7 pattern). Decisions are then applied as per-query ``restore=False``
in code, never as a config flip.

Usage: python scripts/ab_restore.py [passes] [query ...]
Writes /tmp/ab_restore.json with per-query {"on": min, "off": min}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from emdatapipelines_spark.session import get_spark  # noqa: E402
from emdatapipelines_spark.queries import registry  # noqa: E402
from emdatapipelines_spark.cachectl import release_tracked  # noqa: E402


def _force(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark(app_name="ab-restore")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    names = sorted(n for n in queries if not only or n in only)

    restore_on = set(registry._RESTORE_SPLITS)
    default_restore = registry.t.__defaults__

    def run_arm(fn, arm: str) -> float:
        # Force the arm GLOBALLY: the per-query restore decisions live as
        # explicit kwargs in the query bodies (r15 opt-in model), so the
        # "on" arm must also flip t()'s default for the queries that pass
        # nothing, and the "off" arm must defeat explicit restore=True
        # callers by clearing the split set.
        if arm == "off":
            registry._RESTORE_SPLITS.clear()
            registry.t.__defaults__ = (False,)
        else:
            registry._RESTORE_SPLITS.update(restore_on)
            registry.t.__defaults__ = (True,)
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        dt = time.perf_counter() - t0
        release_tracked()
        spark.catalog.clearCache()
        return dt

    results: dict[str, dict[str, float]] = {}
    for i, name in enumerate(names):
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"ab_restore:{name}")
        try:
            run_arm(fn, "on")  # warm each arm's codegen once, unpaired
            run_arm(fn, "off")
            ons, offs = [], []
            for _ in range(passes):
                ons.append(run_arm(fn, "on"))
                offs.append(run_arm(fn, "off"))
            results[name] = {"on": round(min(ons), 4), "off": round(min(offs), 4)}
        except Exception as exc:  # noqa: BLE001
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
        finally:
            registry._RESTORE_SPLITS.update(restore_on)
            registry.t.__defaults__ = default_restore
        if (i + 1) % 25 == 0:
            print(f"... {i + 1}/{len(names)}", file=sys.stderr)

    with open("/tmp/ab_restore.json", "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)

    rows = [
        (r["on"] - r["off"], n, r["on"], r["off"])
        for n, r in results.items()
        if "on" in r
    ]
    rows.sort(reverse=True)
    print(f"{'delta(on-off)':>14} {'on':>8} {'off':>8}  query")
    for d, n, on, off in rows:
        print(f"{d:>14.3f} {on:>8.3f} {off:>8.3f}  {n}")
    errs = {n: r["error"] for n, r in results.items() if "error" in r}
    if errs:
        print(json.dumps(errs, indent=1), file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
