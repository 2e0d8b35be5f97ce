#!/usr/bin/env python
"""Containment accuracy-vs-cost ladder (VERDICT r11 #6): exact naive
self-join vs PPJoin+ prefix-filtered exact vs banded MinHash-LSH, one
row per rung — candidates entering verification, wall seconds, output
pairs, and recall of the true (exact) pair set.

The two exact rungs must emit IDENTICAL pair sets (a standing
cross-check of the PPJoin prefix/positional filters); the banded rung's
declared blind spot is high-containment / low-Jaccard pairs, and the
ladder splits its recall by the underlying Jaccard so the miss profile
is on record (tests/test_containment_ladder.py pins the j ≥ 0.8 band at
recall 1.0 — the 16×4 S-curve knee).

Usage: python scripts/containment_ladder.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 3
THRESHOLD = 0.5


def naive_containment(spark, docs, stats):
    """The deliberate anti-pattern baseline: FULL hashed-shingle self-join
    (every pair sharing any shingle becomes a candidate), then directed
    containment from the common counts — the oracle SQL's plan shape."""
    from pyspark.sql import functions as F

    from emdatapipelines_spark.cachectl import tracked_persist
    from emdatapipelines_spark.llmdata.dedup import hashed_shingles

    sh = tracked_persist(hashed_shingles(docs, "doc_id", "text", N))
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("set_size"))
    a, b = sh.alias("a"), sh.hint("SHUFFLE_HASH").alias("b")
    common = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    ).localCheckpoint(eager=True)
    stats["candidates"] = common.count()
    sa = sizes.select(F.col("id").alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("set_size").alias("size_b"))
    directed = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_a").alias("contained_id"),
                        F.col("id_b").alias("container_id"),
                        F.round(F.col("common") / F.col("size_a"), 6).alias(
                            "containment"
                        ),
                    ),
                    F.struct(
                        F.col("id_b").alias("contained_id"),
                        F.col("id_a").alias("container_id"),
                        F.round(F.col("common") / F.col("size_b"), 6).alias(
                            "containment"
                        ),
                    ),
                )
            ).alias("e")
        )
        .select("e.*")
        .filter(F.col("containment") >= THRESHOLD)
    )
    return directed


def run_ladder(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from emdatapipelines_spark.cachectl import release_tracked
    from emdatapipelines_spark.llmdata.dedup import (
        containment_pairs,
        containment_pairs_lsh,
    )
    from emdatapipelines_spark.queries.registry import t

    docs = t(spark, sf_dir, "documents")
    out: dict = {"sf_dir": sf_dir, "n": N, "threshold": THRESHOLD}

    def timed(fn):
        stats: dict = {}
        t0 = time.perf_counter()
        rows = fn(stats).collect()
        wall = round(time.perf_counter() - t0, 2)
        release_tracked()
        spark.catalog.clearCache()
        return rows, stats, wall

    naive_rows, naive_stats, naive_wall = timed(
        lambda s: naive_containment(spark, docs, s)
    )
    pp_rows, pp_stats, pp_wall = timed(
        lambda s: containment_pairs(docs, n=N, threshold=THRESHOLD, stats=s)
    )
    lsh_rows, lsh_stats, lsh_wall = timed(
        lambda s: containment_pairs_lsh(docs, n=N, threshold=THRESHOLD, stats=s)
    )

    truth = {(r["contained_id"], r["container_id"]) for r in naive_rows}
    pp = {(r["contained_id"], r["container_id"]) for r in pp_rows}
    lsh = {(r["contained_id"], r["container_id"]) for r in lsh_rows}

    # split the banded rung's recall by the pair's underlying Jaccard —
    # the LSH S-curve's own axis (j >= 0.8 is past the 16x4 knee,
    # P(candidate) ≈ 0.9998; low-j/high-containment is the blind spot)
    from emdatapipelines_spark.llmdata.dedup import hashed_shingles

    hs = hashed_shingles(docs, "doc_id", "text", N)
    sets = hs.groupBy("id").agg(F.collect_set("h").alias("hs"))
    pairs_df = spark.createDataFrame(
        [(a, b) for a, b in truth], "contained_id bigint, container_id bigint"
    )
    jac = (
        pairs_df.join(
            sets.select(F.col("id").alias("contained_id"), F.col("hs").alias("ha")),
            "contained_id",
        )
        .join(
            sets.select(F.col("id").alias("container_id"), F.col("hs").alias("hb")),
            "container_id",
        )
        .select(
            "contained_id",
            "container_id",
            (
                F.size(F.array_intersect("ha", "hb"))
                / (F.size("ha") + F.size("hb") - F.size(F.array_intersect("ha", "hb")))
            ).alias("jaccard"),
        )
        .collect()
    )
    j_of = {(r["contained_id"], r["container_id"]): r["jaccard"] for r in jac}
    hi = {p for p in truth if j_of.get(p, 0.0) >= 0.8}
    lo = truth - hi

    def recall(found, want):
        return round(len(found & want) / len(want), 4) if want else 1.0

    out["rungs"] = {
        "naive_exact": {
            "candidates": naive_stats["candidates"],
            "wall_sec": naive_wall,
            "pairs": len(truth),
            "recall": 1.0,
        },
        "ppjoin_exact": {
            "candidates": pp_stats["candidates"],
            "wall_sec": pp_wall,
            "pairs": len(pp),
            "recall": recall(pp, truth),
            "identical_to_naive": pp == truth,
        },
        "banded_lsh_16x4": {
            "candidates": lsh_stats["candidates"],
            "wall_sec": lsh_wall,
            "pairs": len(lsh),
            "recall": recall(lsh, truth),
            "recall_jaccard_ge_0.8": recall(lsh, hi),
            "recall_jaccard_lt_0.8": recall(lsh, lo),
            "true_pairs_jaccard_ge_0.8": len(hi),
            "true_pairs_jaccard_lt_0.8": len(lo),
            "false_positive_pairs": len(lsh - truth),
        },
    }
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "CONTAINMENT_LADDER.json"

    from emdatapipelines_spark.session import get_spark

    spark = get_spark("containment-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    res = run_ladder(spark, sf_dir)
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))
    return 0 if res["rungs"]["ppjoin_exact"]["identical_to_naive"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
