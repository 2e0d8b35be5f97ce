#!/usr/bin/env python
"""sf1 → sf2 growth-rate probe for the quadratic-risk dedup families
(VERDICT r13 stretch #8): turn SCALING.md's 100 TB extrapolation from an
argument into measured points on the curve.

Runs each query in a FRESH JVM per (query, scale) cell via ``bench.py
--one`` (the r12 lesson: one OOM'd or heavy rung poisons a shared JVM —
GCLocker retries inflate every later measurement), 2 passes each, min
reported. Emits one JSON with per-family times and the sf1→sf2 scaling
exponent log2(t2/t1) — doubling the corpus doubles a linear family
(exponent ~1) and quadruples a quadratic one (exponent ~2).

Usage: python scripts/sf2_probe.py [sf1_dir] [sf2_dir] [out_json]
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILIES = ("dd_containment", "dd_jaccard_pairs", "dd_contamination_exact")


def run_one(name: str, sf_dir: str) -> dict:
    bench = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
    proc = subprocess.run(
        [sys.executable, bench, "--one", name],
        capture_output=True,
        text=True,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir,
             "SPARK_GRAFT_BENCH_PASSES": "2"},
        timeout=3600,
    )
    line = next(
        (l for l in reversed(proc.stdout.splitlines()) if l.startswith("{")), None
    )
    if proc.returncode != 0 or not line:
        return {"error": (proc.stderr or "no output")[-500:]}
    rec = json.loads(line)
    return {"min_sec": rec["min_sec"], "median_sec": rec["median_sec"],
            "host_calib_sec": rec["host_calib_sec"]}


def main() -> int:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.testdata/sf1"
    sf2 = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.testdata/sf2"
    out = sys.argv[3] if len(sys.argv) > 3 else "SF2_PROBE.json"

    res: dict = {"sf1_dir": sf1, "sf2_dir": sf2, "isolation": "fresh JVM per cell",
                 "passes": 2, "families": {}}
    for name in FAMILIES:
        r1 = run_one(name, sf1)
        r2 = run_one(name, sf2)
        cell: dict = {"sf1": r1, "sf2": r2}
        if "min_sec" in r1 and "min_sec" in r2:
            cell["exponent_sf1_to_sf2"] = round(
                math.log2(r2["min_sec"] / r1["min_sec"]), 3
            )
        res["families"][name] = cell
        print(json.dumps({name: cell}), flush=True)
    with open(out, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps({"wrote": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
