#!/usr/bin/env python
"""Candidate-pair growth probe for the exact-Jaccard family (VERDICT r13 #3).

The sf1 mart bench showed `text_jaccard_pairs` serving at 8.11s vs 0.24s at
sf0.1 — ~34x for 10x data. The superlinear term is structural: the shingle
self-join emits SUM_shingle C(df,2) candidate rows, and a shingle present in
a constant FRACTION of docs contributes df^2 — quadratic in corpus size.
This probe turns that argument into measured points:

- candidate_pairs: SUM C(df,2) over the shingle df distribution — computed
  by a pure aggregation (no join), so the count is exact and cheap even
  where the join itself would be expensive.
- join_s / emitted_pairs: the REAL pair join (threshold 0.05), timed.
- serve: the pairs-MART read — the result cached once (repartition(1)),
  then collected twice; min time. This is the serving fix: the quadratic
  join runs ONCE at build, reads are linear in result rows.
- caps: for each df-cap, capped candidate count, emitted pairs with the
  cap applied, and recall vs the exact result. Capping drops shingles with
  df > cap BEFORE the join while sizes stay uncapped, so capped jaccard <=
  exact jaccard and the capped output is a strict subset of the exact
  output — recall is a pure count ratio. These are the documented knobs
  for the 100 TB path, where even the one-time build must be capped.

Usage: python scripts/jaccard_growth_probe.py SF_DIR [--caps 64,256,1024]
Prints one JSON line; the harness collects lines into JACCARD_GROWTH.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLD = 0.05  # the dd_jaccard_pairs / text_jaccard_pairs contract value


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--caps", default="64,256,1024")
    args = ap.parse_args()
    caps = [int(c) for c in args.caps.split(",") if c]

    from pyspark.sql import functions as F

    from emdatapipelines_spark.llmdata.dedup import (
        hashed_shingles,
        jaccard_pairs_from_hashes,
    )
    from emdatapipelines_spark.queries.registry import t
    from emdatapipelines_spark.session import get_spark

    spark = get_spark("jaccard-growth-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = t(spark, args.sf_dir, "documents", restore=True)
    hashes = hashed_shingles(docs, "doc_id", "text", n=3).persist()
    n_docs = docs.count()
    n_shingle_rows = hashes.count()

    # df distribution -> exact candidate count, no join
    df_dist = hashes.groupBy("h").agg(F.count(F.lit(1)).alias("df")).persist()
    stats = df_dist.agg(
        F.count(F.lit(1)).alias("distinct_shingles"),
        F.max("df").alias("max_df"),
        F.sum(F.expr("df * (df - 1) / 2")).cast("bigint").alias("candidate_pairs"),
    ).collect()[0]

    out = {
        "sf_dir": args.sf_dir,
        "n_docs": n_docs,
        "n_shingle_rows": n_shingle_rows,
        "distinct_shingles": stats["distinct_shingles"],
        "max_df": stats["max_df"],
        "candidate_pairs": stats["candidate_pairs"],
    }

    # exact join, timed (min of 2 warm-ish passes; pass 1 doubles as warmup)
    times, exact_n = [], None
    for _ in range(2):
        t0 = time.perf_counter()
        exact_n = jaccard_pairs_from_hashes(hashes, threshold=THRESHOLD).count()
        times.append(round(time.perf_counter() - t0, 3))
    out["join_s"] = min(times)
    out["join_passes"] = times
    out["emitted_pairs"] = exact_n

    # pairs-mart serve: cache the (small) result once, read it twice
    pairs = (
        jaccard_pairs_from_hashes(hashes, threshold=THRESHOLD)
        .repartition(1)
        .persist()
    )
    t0 = time.perf_counter()
    pairs.count()  # build-side materialization (charged to build, not serve)
    out["mart_build_s"] = round(time.perf_counter() - t0, 3)
    serve = []
    for _ in range(2):
        t0 = time.perf_counter()
        pairs.collect()
        serve.append(round(time.perf_counter() - t0, 3))
    out["mart_serve_s"] = min(serve)
    pairs.unpersist()

    # df-cap ladder: capped candidates (aggregation) + capped join + recall
    out["caps"] = {}
    for cap in caps:
        capped_cand = (
            df_dist.filter(F.col("df") <= cap)
            .agg(F.sum(F.expr("df * (df - 1) / 2")).cast("bigint"))
            .collect()[0][0]
            or 0
        )
        t0 = time.perf_counter()
        capped_n = jaccard_pairs_from_hashes(
            hashes, threshold=THRESHOLD, max_shingle_df=cap
        ).count()
        cap_s = round(time.perf_counter() - t0, 3)
        out["caps"][str(cap)] = {
            "candidate_pairs": capped_cand,
            "join_s": cap_s,
            "emitted_pairs": capped_n,
            "recall": round(capped_n / exact_n, 4) if exact_n else None,
        }

    df_dist.unpersist()
    hashes.unpersist()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
