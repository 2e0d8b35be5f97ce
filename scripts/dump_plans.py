#!/usr/bin/env python
"""Write explain("formatted") for named queries to a directory — the plan
evidence companion to profile_query.py, without the timing passes.

Usage: python scripts/dump_plans.py DIR name [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from emdatapipelines_spark.cachectl import release_tracked
    from emdatapipelines_spark.queries import QUERIES
    from emdatapipelines_spark.session import get_spark

    spark = get_spark(app_name="emdp-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(txt)
        release_tracked()
        spark.catalog.clearCache()
        n_lines = txt.count("\n")
        n_ex = txt.count("Exchange")
        print(f"{name}: {n_lines} lines, {n_ex} Exchange", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
