#!/usr/bin/env python
"""Execute the governed STREAMING run (VERDICT r11 #4) and write the
committed artifact.

Usage: python scripts/run_governed_stream.py [sf_dir] [out_json] [kill_leg]

``kill_leg`` is ``dedup`` (default — crash post-sink/pre-commit, replay
re-applies), ``rollup`` (VERDICT r12 #4 — crash post-commit/
pre-checkpoint, replay must SKIP), or ``cooccurrence`` (VERDICT r13 #4 —
same post-commit window in the most state-heavy leg, the graph-edge
accumulator), proving recovery isn't leg-specific.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "GOVERNED_STREAM.json"
    kill_leg = sys.argv[3] if len(sys.argv) > 3 else "dedup"

    from emdatapipelines_spark.pipelines.governed_stream import run_governed_stream
    from emdatapipelines_spark.session import get_spark

    spark = get_spark("governed-stream")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="governed_stream_")
    try:
        report = run_governed_stream(spark, sf_dir, work, kill_leg=kill_leg)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    if kill_leg in ("rollup", "cooccurrence"):
        killed_ok = (
            report[kill_leg]["crashed_as_planned"]
            and report[kill_leg]["replay_skipped"]
        )
    else:
        killed_ok = (
            report["dedup"]["crashed_as_planned"] and report["dedup"]["replayed"]
        )
    ok = (
        report["gate_status"] == "pass"
        and all(report["equivalence"].values())
        and killed_ok
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
