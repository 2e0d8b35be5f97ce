#!/usr/bin/env python
"""Execute one governed production run (VERDICT r10 stretch #7) and write
the run report to GOVERNED_RUN.json.

Usage: python scripts/run_governed_pipeline.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1"
    out = sys.argv[2] if len(sys.argv) > 2 else "GOVERNED_RUN.json"

    from emdatapipelines_spark.pipelines.governed import run_governed_pipeline
    from emdatapipelines_spark.session import get_spark

    spark = get_spark("governed-run")
    spark.sparkContext.setLogLevel("ERROR")
    report = run_governed_pipeline(spark, sf_dir)
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report))
    return 0 if report["gate_status"] == "pass" else 2


if __name__ == "__main__":
    raise SystemExit(main())
