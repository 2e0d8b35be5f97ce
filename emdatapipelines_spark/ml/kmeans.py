"""Deterministic Lloyd's k-means over embedding columns.

MLlib's KMeans seeds randomly and averages in partition order — two runs
(or two engines) disagree, which breaks both reproducible pipelines and
the cross-engine oracle. This implementation pins every source of
nondeterminism, the same discipline as ``operators/graph.pagerank_weighted``
and ``llmdata/bpe``:

- seeding: the k vectors with the smallest ``md5(id)`` (hash order — no
  RNG, engine-identical);
- assignment: squared-L2 distances evaluated as a LEFT FOLD over the
  dimension pairs (``F.aggregate`` with 0.0 init ≡ DuckDB ``list_reduce``)
  against PLAN-LITERAL centroids, so every engine runs the identical IEEE
  operation sequence; argmin tie-breaks on the lowest cluster index;
- update: per-(cluster, dim) means via DECIMAL-exact sums (partition-order
  independent), divided in double once.

Scale shape: each iteration is one groupBy over (cluster, dim) rows —
corpus-bounded map side, k·d-bounded reduce side — plus a k·d driver pull
(k=8, d=64 → 512 doubles) to embed the next round's centroids as literals,
the same bounded-pull pattern as BPE's argmax. Centroid count k and dims d
are plan constants; the corpus is never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _sq_dist_to(vec_col, centroid: list[float]):
    """Squared L2 distance from ``vec_col`` to a literal centroid, as a
    left fold (init 0.0) over the zipped dimension pairs."""
    lit_c = F.array(*[F.lit(float(v)) for v in centroid])
    diffs = F.zip_with(vec_col, lit_c, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d)


def kmeans_lloyd(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iters`` Lloyd iterations; returns the long-format model:
    one row per (cluster, dim) with the centroid component (rounded to 6)
    and the cluster's member count — the fully-checkable representation.

    Empty clusters keep their previous centroid (the standard convention).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    spark = df.sparkSession
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col).alias("id"), vec_d.alias("vec"))
    seed_rows = (
        base.select("id", "vec", F.md5(F.col("id").cast("string")).alias("h"))
        .orderBy("h", "id")
        .limit(k)
        .collect()
    )
    centroids: list[list[float]] = [list(r["vec"]) for r in seed_rows]
    # degenerate inputs: fewer points than k -> fit what exists; empty ->
    # empty model (not an IndexError mid-iteration)
    k = min(k, len(centroids))
    if k == 0:
        return spark.createDataFrame(
            [], "cluster int, dim int, c_val double, n_vecs bigint"
        )

    assigned = None
    for _ in range(iters):
        dists = F.array(*[_sq_dist_to(F.col("vec"), c) for c in centroids])
        cluster = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        assigned = base.select("id", "vec", cluster.alias("cluster"))
        sums = (
            assigned.select("cluster", F.posexplode("vec").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(
                F.sum(F.col("val").cast("decimal(28,12)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        counts: dict[int, int] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = float(r["s"]) / r["n"]
            counts[r["cluster"]] = r["n"]
        centroids = [
            [by_cluster[ci][d] for d in sorted(by_cluster[ci])]
            if ci in by_cluster
            else centroids[ci]
            for ci in range(k)
        ]

    model = spark.createDataFrame(
        [
            (ci, d, round(v, 6))
            for ci, c in enumerate(centroids)
            for d, v in enumerate(c)
        ],
        "cluster int, dim int, c_val double",
    )
    sizes = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs")
    )
    return model.join(sizes, "cluster", "left").select(
        "cluster", "dim", "c_val", F.coalesce("n_vecs", F.lit(0)).alias("n_vecs")
    )
