"""Similarity search over embedding columns (``array<float>``).

Three tiers:

- :func:`brute_force_cosine_topk` — exact, pure column expressions
  (``zip_with`` dot product + ``aggregate`` fold). Deterministic left-to-right
  double summation → oracle-comparable. Baseline and correctness reference.
- :func:`cosine_topk_pandas` — exact, Arrow-batched numpy matmul via
  ``mapInPandas``: the throughput path (vectorized BLAS beats per-row
  expressions ~10-100×). Queries broadcast to every corpus partition; each
  partition emits its local top-k; a final window takes the global top-k.
  This is the shape that scales: corpus-partitioned, queries-broadcast,
  k·partitions intermediate rows only.
- :func:`lsh_cosine_topk` — approximate scale path: random-hyperplane LSH
  buckets (deterministic seed), cosine only within matching buckets.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F


def _as_double(col):
    return F.transform(F.col(col) if isinstance(col, str) else col, lambda x: x.cast("double"))


def _dot(a, b):
    """Deterministic dot product: zip_with multiply, left-to-right fold."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def brute_force_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query over the corpus.

    Broadcast the (small) query side against the corpus — the corpus never
    shuffles; ranking is per-query-partitioned window. Self-matches
    (same id) are excluded. Output: (query_id, neighbor_id, cosine, rank).
    """
    q = queries.select(
        F.col(q_id).alias("query_id"),
        _as_double(q_vec).alias("qv"),
        _norm(_as_double(q_vec)).alias("qn"),
    )
    c = corpus.select(
        F.col(c_id).alias("neighbor_id"),
        _as_double(c_vec).alias("cv"),
        _norm(_as_double(c_vec)).alias("cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk_pandas(
    queries_pdf: pd.DataFrame,
    corpus: DataFrame,
    k: int = 5,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Vectorized exact top-k: queries as a driver-side pandas frame
    (id, vector) broadcast into an Arrow-batched ``mapInPandas`` over corpus
    partitions; per-partition numpy matmul + partial top-k, then a global
    window reduces partials to the final top-k. Intermediate volume is
    O(queries · k · partitions), independent of corpus size."""
    spark = corpus.sparkSession
    q_ids = queries_pdf.iloc[:, 0].to_numpy()
    q_mat = np.vstack(queries_pdf.iloc[:, 1].to_numpy()).astype(np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_norm))

    out_schema = "query_id long, neighbor_id long, cosine double"

    def part_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, qm, qn = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf[c_id].to_numpy()
            cm = np.vstack(pdf[c_vec].to_numpy()).astype(np.float64)
            cn = np.linalg.norm(cm, axis=1)
            sims = (qm @ cm.T) / (qn[:, None] * cn[None, :])  # (n_q, n_c)
            kk = min(k + 1, sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = {
                "query_id": np.repeat(ids, kk),
                "neighbor_id": c_ids[idx].ravel(),
                "cosine": np.take_along_axis(sims, idx, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    partial = corpus.select(c_id, c_vec).mapInPandas(part_topk, out_schema)
    partial = partial.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        partial.withColumn("cosine", F.round("cosine", 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: random-hyperplane (sign) LSH buckets.

    ``n_planes`` fixed hyperplanes (seeded numpy, embedded as literal arrays)
    → each vector hashes to a sign-bit bucket; candidates are corpus vectors
    in the query's bucket; exact cosine ranks candidates. Recall grows with
    multi-probe or fewer planes; cost is Σ bucket² instead of |Q|·|C|.
    """
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)

    def bucket_expr(vec_col):
        v = _as_double(vec_col)
        bits = []
        for p in planes:
            lits = F.array(*[F.lit(float(x)) for x in p])
            bits.append(F.when(_dot(v, lits) >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)

    q = queries.select(
        F.col(q_id).alias("query_id"),
        _as_double(q_vec).alias("qv"),
        _norm(_as_double(q_vec)).alias("qn"),
        bucket_expr(q_vec).alias("bucket"),
    )
    c = corpus.select(
        F.col(c_id).alias("neighbor_id"),
        _as_double(c_vec).alias("cv"),
        _norm(_as_double(c_vec)).alias("cn"),
        bucket_expr(c_vec).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
