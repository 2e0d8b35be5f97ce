#!/usr/bin/env python
"""Dev sweep: find queries whose physical plan contains an
Exchange SinglePartition not bounded below by an aggregate / limit /
window-group-limit — the single-task corpus-window smell (VERDICT r9 #1)."""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

BOUNDING = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "WindowGroupLimit",
    "TakeOrderedAndProject",
    "LocalLimit",
    "CollectLimit",
)


def _prefix_len(line: str) -> int:
    m = re.match(r"^[\s:+\-*()0-9]*", line)
    return m.end()


def violations(plan: str) -> list[str]:
    lines = plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        p = _prefix_len(line)
        bounded = False
        for j in range(i + 1, len(lines)):
            if lines[j].strip() and _prefix_len(lines[j]) <= p:
                break
            if any(b in lines[j] for b in BOUNDING):
                bounded = True
                break
        if not bounded:
            bad.append(line.strip()[:120])
    return bad


def main():
    import __spark_entry__ as entry
    from emdatapipelines_spark.session import get_spark

    spark = get_spark("sweep", master="local[8]", shuffle_partitions=8)
    sf = "/root/testdata/sf0.01"
    names = sys.argv[1:] or list(entry.queries())
    n_bad = 0
    for name in names:
        try:
            df = entry.queries()[name](spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {e}")
            continue
        v = violations(plan)
        if v:
            n_bad += 1
            print(f"FLAG {name}: {v}")
    print(f"done, {n_bad} flagged")


if __name__ == "__main__":
    main()
