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

``--isolate`` runs each rung in its OWN JVM (the bench --isolate
pattern): the naive rung legitimately dies at sf1 (its Σ C(df,2) join
volume grows superquadratically across the corpus — that failure IS a
ladder datapoint), and an OOM'd executor pool must not poison the
feasible rungs' numbers. The in-process path stays for tests/small SFs.

Usage:
  python scripts/containment_ladder.py [sf_dir] [out_json] [--isolate]
  python scripts/containment_ladder.py --one-rung RUNG SF_DIR OUT_JSON
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 3
THRESHOLD = 0.5
RUNGS = ("naive_exact", "ppjoin_exact", "banded_lsh_16x4")


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
    return (
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


def _rung_frame(spark, sf_dir: str, rung: str, stats: dict):
    from emdatapipelines_spark.llmdata.dedup import (
        containment_pairs,
        containment_pairs_lsh,
    )
    from emdatapipelines_spark.queries.registry import t

    docs = t(spark, sf_dir, "documents", restore=True)
    if rung == "naive_exact":
        return naive_containment(spark, docs, stats)
    if rung == "ppjoin_exact":
        return containment_pairs(docs, n=N, threshold=THRESHOLD, stats=stats)
    return containment_pairs_lsh(docs, n=N, threshold=THRESHOLD, stats=stats)


def run_rung(spark, sf_dir: str, rung: str) -> dict:
    """One rung end-to-end in the current session; returns its ladder row
    (with the directed pair list) or an ``error`` row."""
    from emdatapipelines_spark.cachectl import release_tracked

    stats: dict = {}
    t0 = time.perf_counter()
    try:
        rows = _rung_frame(spark, sf_dir, rung, stats).collect()
    except Exception as exc:  # noqa: BLE001 - rung death IS a datapoint
        release_tracked()
        spark.catalog.clearCache()
        return {"rung": rung, "error": type(exc).__name__, "stats": stats}
    wall = round(time.perf_counter() - t0, 2)
    release_tracked()
    spark.catalog.clearCache()
    return {
        "rung": rung,
        "stats": stats,
        "wall_sec": wall,
        "pairs": sorted((int(r["contained_id"]), int(r["container_id"])) for r in rows),
    }


def _naive_join_volume(spark, sf_dir: str) -> int:
    """Σ C(df,2) over shingle document frequencies — the naive rung's join
    volume, computable WITHOUT running the join, so its cost is on record
    even where the rung itself is infeasible (OOM at sf1)."""
    from pyspark.sql import functions as F

    from emdatapipelines_spark.llmdata.dedup import hashed_shingles
    from emdatapipelines_spark.queries.registry import t

    docs = t(spark, sf_dir, "documents", restore=True)
    return int(
        hashed_shingles(docs, "doc_id", "text", N)
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.sum(F.expr("df * (df - 1) div 2")).alias("v"))
        .first()["v"]
    )


def _assemble(spark, sf_dir: str, rung_results: dict) -> dict:
    """Recall/jaccard analysis over the per-rung pair lists."""
    from pyspark.sql import functions as F

    from emdatapipelines_spark.llmdata.dedup import hashed_shingles
    from emdatapipelines_spark.queries.registry import t

    out: dict = {"sf_dir": sf_dir, "n": N, "threshold": THRESHOLD}
    naive = rung_results["naive_exact"]
    pp = rung_results["ppjoin_exact"]
    lsh = rung_results["banded_lsh_16x4"]
    if "error" in pp:
        raise RuntimeError(f"PPJoin rung failed ({pp['error']}) — no exact truth")
    pp_set = set(map(tuple, pp["pairs"]))
    lsh_set = set(map(tuple, lsh["pairs"])) if "error" not in lsh else set()
    truth = set(map(tuple, naive["pairs"])) if "error" not in naive else pp_set

    # split the banded rung's recall by the pair's underlying Jaccard —
    # the LSH S-curve's own axis (j >= 0.8 is past the 16x4 knee,
    # P(candidate) ≈ 0.9998; low-j/high-containment is the blind spot)
    docs = t(spark, sf_dir, "documents", restore=True)
    sets = (
        hashed_shingles(docs, "doc_id", "text", N)
        .groupBy("id")
        .agg(F.collect_set("h").alias("hs"))
    )
    pairs_df = spark.createDataFrame(
        [(a, b) for a, b in truth], "contained_id bigint, container_id bigint"
    )
    inter = F.size(F.array_intersect("ha", "hb"))
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
            (inter / (F.size("ha") + F.size("hb") - inter)).alias("jaccard"),
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
            "join_rows_sum_cdf2": _naive_join_volume(spark, sf_dir),
            "candidates": naive["stats"].get("candidates"),
            "wall_sec": naive.get("wall_sec", naive.get("error")),
            "pairs": len(truth) if "error" not in naive else None,
            "recall": 1.0 if "error" not in naive else None,
        },
        "ppjoin_exact": {
            "candidates": pp["stats"]["candidates"],
            "wall_sec": pp["wall_sec"],
            "pairs": len(pp_set),
            "recall": recall(pp_set, truth),
            "identical_to_naive": (pp_set == truth) if "error" not in naive else None,
        },
        "banded_lsh_16x4": {
            "candidates": lsh["stats"].get("candidates"),
            "wall_sec": lsh.get("wall_sec", lsh.get("error")),
            "pairs": len(lsh_set),
            "recall": recall(lsh_set, truth),
            "recall_jaccard_ge_0.8": recall(lsh_set, hi),
            "recall_jaccard_lt_0.8": recall(lsh_set, lo),
            "true_pairs_jaccard_ge_0.8": len(hi),
            "true_pairs_jaccard_lt_0.8": len(lo),
            "false_positive_pairs": len(lsh_set - truth),
        },
    }
    return out


def run_ladder(spark, sf_dir: str) -> dict:
    """In-process ladder (tests / small SFs — every rung feasible)."""
    results = {rung: run_rung(spark, sf_dir, rung) for rung in RUNGS}
    return _assemble(spark, sf_dir, results)


def main() -> int:
    args = sys.argv[1:]
    if args[:1] == ["--one-rung"]:
        rung, sf_dir, out_path = args[1], args[2], args[3]
        from emdatapipelines_spark.session import get_spark

        spark = get_spark(f"ladder-{rung}")
        spark.sparkContext.setLogLevel("ERROR")
        res = run_rung(spark, sf_dir, rung)
        with open(out_path, "w") as fh:
            json.dump(res, fh)
        print(json.dumps({k: v for k, v in res.items() if k != "pairs"}))
        return 0

    isolate = "--isolate" in args
    args = [a for a in args if a != "--isolate"]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    out_path = args[1] if len(args) > 1 else "CONTAINMENT_LADDER.json"

    from emdatapipelines_spark.session import get_spark

    if isolate:
        results = {}
        for rung in RUNGS:
            tmp = f"/tmp/ladder_rung_{rung}.json"
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one-rung",
                 rung, sf_dir, tmp],
                capture_output=True, text=True, timeout=3600,
            )
            if proc.returncode == 0 and os.path.exists(tmp):
                with open(tmp) as fh:
                    results[rung] = json.load(fh)
            else:
                # the JVM died hard (OOM kill) before writing its row
                results[rung] = {
                    "rung": rung,
                    "error": f"subprocess rc={proc.returncode}",
                    "stats": {},
                    "pairs": [],
                }
        spark = get_spark("containment-ladder")
        spark.sparkContext.setLogLevel("ERROR")
        res = _assemble(spark, sf_dir, results)
    else:
        spark = get_spark("containment-ladder")
        spark.sparkContext.setLogLevel("ERROR")
        res = run_ladder(spark, sf_dir)

    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))
    # identical_to_naive is None where the naive rung was infeasible (its
    # own ladder datapoint); only an actual exactness violation fails
    return 1 if res["rungs"]["ppjoin_exact"]["identical_to_naive"] is False else 0


if __name__ == "__main__":
    raise SystemExit(main())
