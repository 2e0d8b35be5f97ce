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


def _grid_block_directory(
    base: DataFrame, n_projections: int, n_blocks: int
) -> tuple[DataFrame, DataFrame]:
    """(blocked rows, unordered candidate block-pair list) for the lossless
    grid prefilter. ``base`` must carry ``pid``, ``pvec`` and ``cell``
    (array<int> of grid coordinates). Cells whose row count exceeds the
    target block size (``total/n_blocks``) split into hash sub-blocks, so
    peak task memory stays ~2·n·d/n_blocks even when one cell holds
    everything (the low-threshold degenerate case == the old behavior).
    """
    spark = base.sparkSession
    cells = base.groupBy("cell").agg(F.count(F.lit(1)).alias("n_rows"))
    cells = cells.localCheckpoint(eager=True)  # tiny: one row per occupied cell
    total = cells.agg(F.sum("n_rows")).first()[0] or 0
    target = max(1, -(-total // n_blocks))  # ceil
    directory = cells.select(
        "cell",
        F.greatest(
            F.lit(1), F.ceil(F.col("n_rows") / F.lit(target)).cast("int")
        ).alias("n_sub"),
    )
    dir_rows = directory.select(
        "cell", "n_sub", F.explode(F.sequence(F.lit(0), F.col("n_sub") - 1)).alias("sub")
    )
    # Block ids need only be DISTINCT, not dense: a deterministic hash of
    # (cell, sub) replaces the former row_number over a GLOBAL window,
    # which funneled the whole cell×sub directory through one task — fine
    # at metadata rate, a serialization point once occupied cells ~ n
    # (tight pitch / many projections). A 64-bit collision (~n²/2⁶⁴) would
    # merely MERGE two blocks — the merged block inherits every candidate
    # pair of both, so coverage stays lossless; never a missed pair.
    dir_rows = dir_rows.withColumn("bid", F.xxhash64("cell", "sub"))

    dsel = dir_rows.select(
        F.col("cell").alias("d_cell"),
        F.col("n_sub").alias("d_n_sub"),
        F.col("sub").alias("d_sub"),
        "bid",
    )
    blocked = base.join(
        dsel,
        on=(F.col("cell") == F.col("d_cell"))
        & (F.pmod(F.xxhash64(F.col("pid")), F.col("d_n_sub")) == F.col("d_sub")),
    ).select("pid", "pvec", "bid")

    # neighbor offsets: δ = 0 (same cell, sub_a <= sub_b dedupes) plus the
    # lexicographically-positive half of {-1,0,1}^p \ {0} — each unordered
    # cell pair within Chebyshev distance 1 is generated exactly once.
    p = n_projections
    offsets = [
        off
        for off in __import__("itertools").product((-1, 0, 1), repeat=p)
        if off > tuple([0] * p)
    ]
    da = dir_rows.select(
        F.col("cell").alias("cell_a"), F.col("sub").alias("sub_a"), F.col("bid").alias("ba")
    )
    db = dir_rows.select(
        F.col("cell").alias("cell_b"), F.col("sub").alias("sub_b"), F.col("bid").alias("bb")
    )
    same_cell = da.join(
        db, (F.col("cell_a") == F.col("cell_b")) & (F.col("sub_a") <= F.col("sub_b"))
    )
    if offsets:
        shifted = da.select(
            "ba",
            F.explode(
                F.array(
                    *[
                        F.zip_with(
                            F.col("cell_a"),
                            F.array(*[F.lit(int(o)) for o in off]),
                            lambda c, d: c + d,
                        )
                        for off in offsets
                    ]
                )
            ).alias("cell_b"),
        )
        cross_cell = shifted.join(db, "cell_b")
        pairs = same_cell.select("ba", "bb").unionByName(cross_cell.select("ba", "bb"))
    else:
        pairs = same_cell.select("ba", "bb")
    pairs = pairs.select(
        F.least("ba", "bb").alias("ba"), F.greatest("ba", "bb").alias("bb")
    )
    return blocked, pairs


def _pca_directions(sample: np.ndarray, p: int) -> np.ndarray:
    """Top-``p`` principal directions of the NORMALIZED sample vectors
    (driver-side eigh of the d×d Gram — d=64 → 4 KB).

    Direction choice affects only pruning POWER, never correctness — the
    grid bound holds for ANY unit direction — which is why a bounded SAMPLE
    suffices: a slightly-off direction estimate costs a few extra candidate
    block pairs, never a missed answer pair.
    """
    n = np.linalg.norm(sample, axis=1, keepdims=True)
    m = sample / np.maximum(n, 1e-12)
    vals, vecs = np.linalg.eigh(m.T @ m)
    return vecs[:, np.argsort(-vals)[:p]].T  # rows = directions, unit norm


def _estimate_candidate_fraction(smat: np.ndarray, proj: np.ndarray, w: float) -> float:
    """Sample-based estimate of the candidate row-pair fraction the grid
    prefilter would leave: Σ over Chebyshev-adjacent cell pairs of the
    sample-mass product, over total². Pure driver math on the ≤4096-row
    direction-fitting sample — the cost-based dispatch input."""
    n = np.linalg.norm(smat, axis=1, keepdims=True)
    m = smat / np.maximum(n, 1e-12)
    cells = np.floor((m @ proj.T) / w).astype(np.int64)
    from collections import Counter

    hist = Counter(map(tuple, cells))
    total = sum(hist.values())
    if total < 2:
        return 1.0
    p = cells.shape[1]
    import itertools

    cand = 0.0
    for c, cnt in hist.items():
        for off in itertools.product((-1, 0, 1), repeat=p):
            nb = tuple(a + b for a, b in zip(c, off))
            other = hist.get(nb)
            if other:
                cand += cnt * other
    return min(1.0, cand / (total * total))


def _random_blocks(
    corpus: DataFrame, id_col: str, vec_col: str, n_blocks: int
) -> tuple[DataFrame, DataFrame]:
    """The zero-pre-pass fallback blocking: rows hash into ``n_blocks``
    random blocks, every unordered block pair is a candidate — the exact
    pre-prefilter plan (bounded all-pairs)."""
    B = n_blocks
    blocked = corpus.select(
        F.col(id_col).cast("long").alias("pid"),
        F.col(vec_col).alias("pvec"),
        F.pmod(F.xxhash64(F.col(id_col).cast("long")), F.lit(B))
        .cast("int")
        .alias("bid"),
    )
    all_pairs = corpus.sparkSession.createDataFrame(
        [(a, b) for a in range(B) for b in range(a, B)], "ba int, bb int"
    )
    return blocked, all_pairs


def _neardup_blocks(
    corpus: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    n_blocks: int,
    n_projections: int,
    projections: str,
    force_grid: bool = False,
) -> tuple[DataFrame | None, DataFrame | None]:
    """Shared prefilter front end for :func:`embedding_neardup_pairs` /
    :func:`embedding_neardup_stats`: compute projection directions, grid
    cells of pitch ``w``, and the (blocked rows, candidate block pairs)
    directory. Returns (None, None) on an empty corpus. The only driver
    pull is a fixed 4096-row sample (direction fitting only — see
    :func:`_pca_directions` for why a sample is sufficient).

    Cost-based dispatch: when the sample estimates the grid would leave
    >80% of row pairs as candidates (low threshold and/or isotropic data —
    the grid collapses to a few mutually-adjacent cells), the grid's
    pre-passes buy nothing, so fall back to the zero-pre-pass random
    blocking with ALL block pairs — the exact pre-prefilter plan. Either
    path feeds the same exact-verify kernel, so the dispatch affects cost
    only, never the result set. At ``threshold <= -1`` (e.g. the exact
    k-NN graph keeps every pair) pruning is PROVABLY impossible — the
    pitch ``w >= 2`` covers the whole [-1, 1] projection range, so every
    cell is adjacent — and the dispatch short-circuits without even the
    sample pull."""
    if not force_grid and threshold <= -1.0:
        return _random_blocks(corpus, id_col, vec_col, int(n_blocks))
    sample = corpus.select(F.col(vec_col)).limit(4096).toPandas()
    if sample.empty:
        return None, None
    smat = np.vstack(sample.iloc[:, 0].to_numpy()).astype(np.float64)
    dim = smat.shape[1]
    p = max(1, int(n_projections))
    if projections == "pca":
        proj = _pca_directions(smat, p)
    elif projections == "random":
        rng = np.random.RandomState(0x5EED)
        proj = rng.standard_normal((p, dim))
        proj /= np.linalg.norm(proj, axis=1, keepdims=True)
    else:
        raise ValueError(f"projections must be 'pca' or 'random', got {projections!r}")
    # pitch with a relative epsilon so float noise at the exact-threshold
    # boundary can't push a qualifying pair across two cells
    w = float(np.sqrt(max(2.0 - 2.0 * float(threshold), 1e-12))) * (1.0 + 1e-6)

    if not force_grid and _estimate_candidate_fraction(smat, proj, w) > 0.8:
        return _random_blocks(corpus, id_col, vec_col, int(n_blocks))

    vd = _as_double(vec_col)
    nrm = _norm(vd)
    cells = F.array(
        *[
            F.floor(
                F.when(nrm == 0, F.lit(0.0)).otherwise(
                    _dot(vd, F.array(*[F.lit(float(v)) for v in u])) / nrm
                )
                / F.lit(w)
            ).cast("int")
            for u in proj
        ]
    )
    base = corpus.select(
        F.col(id_col).cast("long").alias("pid"),
        F.col(vec_col).alias("pvec"),
        cells.alias("cell"),
    )
    return _grid_block_directory(base, p, n_blocks)


def embedding_neardup_stats(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
    n_projections: int = 2,
    projections: str = "pca",
) -> dict:
    """Prefilter effectiveness report (for SCALING.md measurements): how
    many block pairs the grid prefilter generates vs the unfiltered
    all-pairs count, and the row-pair (flop-proxy) reduction. Always runs
    the grid path (no cost-based fallback) — it measures the prefilter."""
    blocked, pair_list = _neardup_blocks(
        corpus, threshold, id_col, vec_col, n_blocks, n_projections, projections,
        force_grid=True,
    )
    if blocked is None:
        return {"n_rows": 0, "n_blocks": 0, "candidate_block_pairs": 0,
                "all_block_pairs": 0, "candidate_row_pairs": 0, "all_row_pairs": 0}
    sizes = blocked.groupBy("bid").agg(F.count(F.lit(1)).alias("n"))
    nb = sizes.count()
    n_rows = blocked.count()
    pl = pair_list.alias("pl")
    sa = sizes.select(F.col("bid").alias("ba"), F.col("n").alias("na"))
    sb = sizes.select(F.col("bid").alias("bb"), F.col("n").alias("nb"))
    joined = pl.join(sa, "ba").join(sb, "bb")
    cand_rows = joined.select(
        F.sum(
            F.when(F.col("ba") == F.col("bb"), F.col("na") * (F.col("na") - 1) / 2)
            .otherwise(F.col("na") * F.col("nb"))
        )
    ).first()[0]
    return {
        "n_rows": int(n_rows),
        "n_blocks": int(nb),
        "candidate_block_pairs": int(pair_list.count()),
        "all_block_pairs": int(nb * (nb + 1) // 2),
        "candidate_row_pairs": int(cand_rows or 0),
        "all_row_pairs": int(n_rows * (n_rows - 1) // 2),
    }


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
    n_projections: int = 2,
    projections: str = "pca",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) with
    cosine ≥ ``threshold``. Exact (matches the all-pairs SQL oracle).

    Fully distributed block-pair matmul behind a LOSSLESS grid prefilter —
    nothing data-sized is collected to the driver. Each row's normalized
    vector is projected onto ``n_projections`` unit directions (top PCA
    directions by default — real embedding corpora are anisotropic, so the
    leading principal axes carry the most between-cluster spread; or fixed
    seeded random hyperplanes with ``projections="random"``) and bucketed on
    a grid of pitch ``w = sqrt(2 - 2·threshold)``: for unit vectors,
    ``cosine(a,b) >= t  ⇒  |<a-b, u>| <= ||a-b|| <= w``, so every
    qualifying pair lands within ONE grid cell in EVERY projection —
    adjacent-cell block pairs provably cover all answers at any threshold
    (no recall loss, unlike sign-bit LSH banding). Blocks are the grid
    cells, hash-split when a cell exceeds ``total/n_blocks`` rows so peak
    task memory stays ~2·n·d/n_blocks even in the degenerate one-cell case
    (where the plan reduces to the unfiltered all-block-pairs matmul —
    exactly the pre-prefilter behavior, never worse than it). Each
    candidate block pair (ba <= bb) is one ``applyInPandas`` group that
    BLAS-matmuls its two blocks and keeps ≥-threshold survivors: flops drop
    from O(n²·d) to O(Σ_{adjacent cell pairs} |ca|·|cb|·d). Pruning power
    scales with corpus spread along the projections relative to ``w`` —
    strong on clustered/anisotropic corpora at dedup thresholds (measured
    in SCALING.md); on an isotropic-random corpus the grid collapses to few
    cells and the plan degrades gracefully to the bounded all-pairs path.
    """
    blocked, pair_list = _neardup_blocks(
        corpus, threshold, id_col, vec_col, n_blocks, n_projections, projections
    )
    if blocked is None:
        return corpus.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cosine double"
        )

    a_rows = blocked.join(pair_list, blocked["bid"] == pair_list["ba"]).select(
        "pid", "pvec", F.lit(0).alias("side"), "ba", "bb"
    )
    b_rows = blocked.join(
        pair_list,
        (blocked["bid"] == pair_list["bb"]) & (pair_list["ba"] != pair_list["bb"]),
    ).select("pid", "pvec", F.lit(1).alias("side"), "ba", "bb")
    tagged = a_rows.unionByName(b_rows)

    out_schema = "id_a long, id_b long, cosine double"

    def block_pair(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ba, bb = key
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
            {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
        )
        a = pdf[pdf["side"] == 0]
        if ba == bb:
            if len(a) < 2:
                return empty
            ids = a["pid"].to_numpy()
            m = np.vstack(a["pvec"].to_numpy()).astype(np.float64)
            nrm = np.linalg.norm(m, axis=1)
            sims = (m @ m.T) / (nrm[:, None] * nrm[None, :])
            ii, jj = np.nonzero((sims >= threshold) & (ids[:, None] < ids[None, :]))
            if len(ii) == 0:
                return empty
            return pd.DataFrame(
                {"id_a": ids[ii], "id_b": ids[jj], "cosine": np.round(sims[ii, jj], 6)}
            )
        b = pdf[pdf["side"] == 1]
        if a.empty or b.empty:
            return empty
        a_ids, b_ids = a["pid"].to_numpy(), b["pid"].to_numpy()
        am = np.vstack(a["pvec"].to_numpy()).astype(np.float64)
        bm = np.vstack(b["pvec"].to_numpy()).astype(np.float64)
        an, bn = np.linalg.norm(am, axis=1), np.linalg.norm(bm, axis=1)
        sims = (am @ bm.T) / (an[:, None] * bn[None, :])
        ii, jj = np.nonzero(sims >= threshold)
        if len(ii) == 0:
            return empty
        lo = np.minimum(a_ids[ii], b_ids[jj])
        hi = np.maximum(a_ids[ii], b_ids[jj])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": np.round(sims[ii, jj], 6)})

    return tagged.groupBy("ba", "bb").applyInPandas(block_pair, out_schema)


def centroid_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    c_id: str = "cid",
    c_vec: str = "cv",
) -> DataFrame:
    """Nearest-centroid assignment: (id, cluster_id, cos_c).

    The centroid frame broadcasts (it is K rows, K ≪ n by construction),
    so the corpus side never shuffles for scoring; the argmax collapses
    map-side via ``max_by`` over a (cos, −cid) struct — one exchange on
    ``id_col`` total, no window. Cosines are rounded to 6 BEFORE the
    argmax so fold-order noise cannot flip an assignment; ties break to
    the lowest centroid id (both properties mirror the SQL twin)."""
    v = vectors.select(
        F.col(id_col).alias("id"),
        _as_double(vec_col).alias("v"),
        _norm(_as_double(vec_col)).alias("vn"),
    )
    c = centroids.select(
        F.col(c_id).alias("cid"),
        _as_double(c_vec).alias("cvec"),
        _norm(_as_double(c_vec)).alias("cn"),
    )
    scored = v.crossJoin(F.broadcast(c)).select(
        "id",
        "cid",
        F.round(_dot(F.col("v"), F.col("cvec")) / (F.col("vn") * F.col("cn")), 6).alias(
            "cos_c"
        ),
    )
    return (
        scored.groupBy("id")
        .agg(
            F.expr(
                "max_by(named_struct('cid', cid, 'cos_c', cos_c),"
                " named_struct('c', cos_c, 'i', -cid))"
            ).alias("m")
        )
        .select(
            F.col("id").alias(id_col),
            F.col("m.cid").alias("cluster_id"),
            F.col("m.cos_c").alias("cos_c"),
        )
    )


def semdedup(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    c_id: str = "cid",
    c_vec: str = "cv",
) -> DataFrame:
    """SemDeDup-style semantic pruning (Abbas et al. 2023): assign every
    vector to its nearest centroid, then inside each cluster mark a vector
    a duplicate iff an EARLIER (lower-id) same-cluster vector is within
    ``cosine >= threshold``. Output: (id, cluster_id, cos_c, is_dup,
    dup_of) — dup_of is the lowest-id qualifying neighbor, NULL for
    survivors.

    Scale shape: assignment is the broadcast-K map-side pass of
    :func:`centroid_assign`; the candidate pairs ride the LOSSLESS grid
    prefilter of :func:`embedding_neardup_pairs` (block-pair BLAS matmul,
    nothing collected), and only pairs whose endpoints share a cluster
    survive — so the cluster constraint PRUNES the near-dup pair stream
    rather than generating per-cluster all-pairs work. The min-id survivor
    rule makes the operator incremental across snapshots for free: with
    monotonically increasing ids per snapshot, re-running over
    old ∪ new marks exactly the new-snapshot vectors that semantically
    collide with the retained corpus (or an earlier new vector) — the
    cross-snapshot dedup contract of the incremental MinHash index
    (`streaming/incremental.py`), re-expressed for embeddings."""
    assign = centroid_assign(corpus, centroids, id_col, vec_col, c_id, c_vec)
    pairs = embedding_neardup_pairs(
        corpus, threshold=threshold, id_col=id_col, vec_col=vec_col
    ).select("id_a", "id_b")
    ca = assign.select(F.col(id_col).alias("id_a"), F.col("cluster_id").alias("ka"))
    cb = assign.select(F.col(id_col).alias("id_b"), F.col("cluster_id").alias("kb"))
    same = (
        pairs.join(ca, "id_a")
        .join(cb, "id_b")
        .filter(F.col("ka") == F.col("kb"))
        .groupBy("id_b")
        .agg(F.min("id_a").alias("dup_of"))
        .select(F.col("id_b").alias(id_col), "dup_of")
    )
    return assign.join(same, id_col, "left").select(
        id_col,
        "cluster_id",
        "cos_c",
        F.col("dup_of").isNotNull().alias("is_dup"),
        "dup_of",
    )


def _ivf_centroid_bc(corpus, nlist, kmeans_iters, c_id, c_vec):
    """Deterministic IVF coarse centroids as a broadcast of
    ``(ids, matrix, norms)`` — the nlist corpus vectors with smallest
    md5(id), optionally refined by ``kmeans_iters`` distributed Lloyd
    steps (see ivf_cosine_topk's docstring for the scale analysis)."""
    spark = corpus.sparkSession
    cents = (
        corpus.select(F.col(c_id).alias("cell_id"), F.col(c_vec).alias("cvec"))
        .orderBy(F.md5(F.col("cell_id").cast("string")), F.col("cell_id"))
        .limit(int(nlist))
    )
    cpdf = cents.toPandas()
    cent_ids = cpdf["cell_id"].to_numpy()
    cent_mat = np.vstack(cpdf["cvec"].to_numpy()).astype(np.float64)
    cent_norm = np.linalg.norm(cent_mat, axis=1)

    for _ in range(int(kmeans_iters)):
        bc_it = spark.sparkContext.broadcast((cent_ids, cent_mat, cent_norm))

        def nearest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            ids_, cmat, cnorm = bc_it.value
            for pdf in batches:
                if pdf.empty:
                    continue
                m = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
                norms = np.maximum(np.linalg.norm(m, axis=1), 1e-12)
                sims = (m @ cmat.T) / (norms[:, None] * cnorm[None, :])
                yield pd.DataFrame(
                    {"cell": ids_[np.argmax(sims, axis=1)], "vec": pdf["vec"]}
                )

        assigned = corpus.select(F.col(c_vec).alias("vec")).mapInPandas(
            nearest, "cell long, vec array<float>"
        )
        means = (
            assigned.select("cell", F.posexplode("vec").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
        )
        mpdf = means.toPandas()  # ≤ nlist·d rows — constant in corpus size
        pivot = mpdf.pivot(index="cell", columns="pos", values="m").sort_index()
        cent_ids = pivot.index.to_numpy()
        cent_mat = pivot.to_numpy(dtype=np.float64)
        cent_norm = np.maximum(np.linalg.norm(cent_mat, axis=1), 1e-12)

    return spark.sparkContext.broadcast((cent_ids, cent_mat, cent_norm))


def ivf_corpus_cells(
    corpus: DataFrame,
    nlist: int = 64,
    kmeans_iters: int = 0,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """The IVF INDEX: corpus rows assigned to their nearest coarse cell —
    ``(neighbor_id, cv, cell)``. nprobe-independent, so build (and
    materialize) it once and hand it to any number of ``ivf_cosine_topk``
    calls via ``corpus_cells`` (`sim_ann_param_sweep` prices 4 nprobe
    points against ONE corpus pass this way)."""
    bc = _ivf_centroid_bc(corpus, nlist, kmeans_iters, c_id, c_vec)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_, cmat, cnorm = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(m, axis=1)
            sims = (m @ cmat.T) / (norms[:, None] * cnorm[None, :])
            # same tie-break path as ivf_cosine_topk's assign(1) (argsort,
            # not argmax) so precomputed and in-call assignments agree
            top = np.argsort(-sims, axis=1)[:, 0]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "vec": pdf["vec"],
                    "cell": ids_[top],
                }
            )

    c_in = corpus.select(F.col(c_id).alias("item_id"), F.col(c_vec).alias("vec"))
    return c_in.mapInPandas(run, "item_id long, vec array<float>, cell long").select(
        F.col("item_id").alias("neighbor_id"),
        F.col("vec").alias("cv"),
        "cell",
    )


def ivf_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nlist: int = 64,
    nprobe: int = 2,
    kmeans_iters: int = 0,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    corpus_cells: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: coarse quantize the corpus into cells,
    probe only the query's ``nprobe`` nearest cells.

    Coarse centroids are a BOUNDED deterministic sample: the ``nlist``
    corpus vectors with the smallest md5(id) (TakeOrdered — the driver
    receives exactly ``nlist``·d floats regardless of corpus size).
    ``kmeans_iters`` optionally refines them with distributed Lloyd steps:
    each iteration assigns the corpus to its nearest centroid (broadcast
    matmul, map-only) and recomputes per-cell means JVM-side
    (posexplode → groupBy(cell, dim) partial-aggregated avg), pulling only
    the nlist·d mean matrix back — per-iteration driver transfer stays
    constant in corpus size; empty cells drop out. Corpus vectors are then
    assigned once more and a query scans only its ``nprobe`` closest cells
    — cost drops from |Q|·|C| to |Q|·|C|·nprobe/nlist with recall
    controlled by nprobe.

    ``corpus_cells``: optionally pass the precomputed cell-assigned corpus
    (``ivf_corpus_cells`` — a materialized INDEX). nprobe only changes the
    QUERY-side fan-out, so a parameter sweep assigns the corpus once and
    reuses it per point instead of re-running the corpus pass per nprobe
    (exactly how a deployed IVF index works). Centroid selection is
    deterministic, so the in-call query assignment agrees with any
    precomputed corpus assignment at the same (nlist, kmeans_iters).
    """
    bc = _ivf_centroid_bc(corpus, nlist, kmeans_iters, c_id, c_vec)

    def assign(n_cells: int):
        schema = "item_id long, vec array<float>, cells array<long>"

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            ids_, cmat, cnorm = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                m = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
                norms = np.linalg.norm(m, axis=1)
                sims = (m @ cmat.T) / (norms[:, None] * cnorm[None, :])
                top = np.argsort(-sims, axis=1)[:, :n_cells]
                yield pd.DataFrame(
                    {
                        "item_id": pdf["item_id"],
                        "vec": pdf["vec"],
                        "cells": [ids_[row].tolist() for row in top],
                    }
                )

        return run, schema

    if corpus_cells is not None:
        c_cells = corpus_cells
    else:
        c_in = corpus.select(F.col(c_id).alias("item_id"), F.col(c_vec).alias("vec"))
        run1, schema1 = assign(1)
        c_cells = c_in.mapInPandas(run1, schema1).select(
            F.col("item_id").alias("neighbor_id"),
            F.col("vec").alias("cv"),
            F.element_at("cells", 1).alias("cell"),
        )
    q_in = queries.select(F.col(q_id).alias("item_id"), F.col(q_vec).alias("vec"))
    runp, schemap = assign(nprobe)
    q_cells = q_in.mapInPandas(runp, schemap).select(
        F.col("item_id").alias("query_id"),
        F.col("vec").alias("qv"),
        F.explode("cells").alias("cell"),
    )
    joined = c_cells.join(F.broadcast(q_cells), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    qa, ca = _as_double(F.col("qv")), _as_double(F.col("cv"))
    scored = joined.withColumn(
        "cosine", F.round(_dot(qa, ca) / (_norm(qa) * _norm(ca)), 6)
    ).select("query_id", "neighbor_id", "cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def knn_graph_ann(
    corpus: DataFrame,
    k: int = 3,
    nlist: int = 8,
    nprobe: int = 2,
    block_rows: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate k-NN graph: IVF candidate edges + exact cosine re-rank —
    the sub-quadratic SCALE TWIN of the exact all-pairs graph
    (``sim_knn_graph``), mirroring the repo's baseline/scale-path split
    (``dd_jaccard_pairs`` → ``dd_minhash_lsh``). The exact graph is
    provably un-prunable (threshold −1 keeps every pair), so it stays the
    oracle baseline; this path bounds work per vector to its ``nprobe``
    nearest coarse cells.

    Scale shape: ``nlist`` coarse centroids from a BOUNDED deterministic
    sample (smallest md5(id) — the only driver pull, nlist·d floats at any
    corpus size). ONE ``mapInPandas`` pass over the corpus emits, per
    vector, its owner cell (nearest centroid) and its ``nprobe`` probe
    cells (nprobe ≥ 1 ⇒ each vector probes its own cell, so the graph is
    never starved of candidates). Owners hash-split into sub-blocks of ≤
    ``block_rows`` rows via a tiny checkpointed cell-size directory
    (broadcast), probers replicate to each sub-block of their probed
    cells; each (cell, sub) group is one ``applyInPandas`` BLAS matmul
    emitting per-prober LOCAL top-k — shuffled rows are candidate-bounded
    (≤ nprobe·n_sub·k per vector), never Σcell². A final per-src
    WindowGroupLimit rank merges the partials. Total cost:
    O(n·nprobe·(n/nlist)·d) flops vs the exact graph's O(n²·d); with
    nlist ~ √n this is O(n^1.5·d).

    Returns (src, neighbor, rank, cosine) — same schema/rounding/ties as
    the exact graph, so recall is directly measurable (see
    ``sim_knn_graph_ann``'s sampled in-query recall column).
    """
    spark = corpus.sparkSession
    cents = (
        corpus.select(F.col(id_col).alias("cell_id"), F.col(vec_col).alias("cvec"))
        .orderBy(F.md5(F.col("cell_id").cast("string")), F.col("cell_id"))
        .limit(int(nlist))
    )
    cpdf = cents.toPandas()
    if cpdf.empty:
        return spark.createDataFrame([], "src long, neighbor long, rank int, cosine double")
    cent_ids = cpdf["cell_id"].to_numpy()
    cent_mat = np.vstack(cpdf["cvec"].to_numpy()).astype(np.float64)
    cent_norm = np.maximum(np.linalg.norm(cent_mat, axis=1), 1e-12)
    bc = spark.sparkContext.broadcast((cent_ids, cent_mat, cent_norm))
    npb = max(1, min(int(nprobe), len(cent_ids)))

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_, cmat, cnorm = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
            norms = np.maximum(np.linalg.norm(m, axis=1), 1e-12)
            sims = (m @ cmat.T) / (norms[:, None] * cnorm[None, :])
            top = np.argsort(-sims, axis=1)[:, :npb]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "vec": pdf["vec"],
                    "own_cell": ids_[top[:, 0]],
                    "probe_cells": [ids_[row].tolist() for row in top],
                }
            )

    base = corpus.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("vec"))
    assigned = base.mapInPandas(
        assign, "item_id long, vec array<float>, own_cell long, probe_cells array<long>"
    )
    # tiny directory: rows per owner cell → sub-block count (≤ nlist rows)
    sizes = assigned.groupBy("own_cell").agg(F.count(F.lit(1)).alias("n"))
    sizes = sizes.localCheckpoint(eager=True)
    directory = sizes.select(
        F.col("own_cell").alias("d_cell"),
        F.greatest(
            F.lit(1), F.ceil(F.col("n") / F.lit(int(block_rows))).cast("int")
        ).alias("n_sub"),
    )
    owners = assigned.join(
        F.broadcast(directory), F.col("own_cell") == F.col("d_cell")
    ).select(
        F.col("own_cell").alias("cell"),
        F.pmod(F.xxhash64("item_id"), F.col("n_sub")).cast("int").alias("sub"),
        F.lit(1).alias("side"),
        F.col("item_id"),
        "vec",
    )
    probers = (
        assigned.select("item_id", "vec", F.explode("probe_cells").alias("cell"))
        .join(F.broadcast(directory), F.col("cell") == F.col("d_cell"))
        .select(
            "cell",
            F.explode(F.sequence(F.lit(0), F.col("n_sub") - 1)).alias("sub"),
            F.lit(0).alias("side"),
            "item_id",
            "vec",
        )
    )
    tagged = probers.unionByName(owners)

    def cell_topk(key, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"src": [], "neighbor": [], "cosine": []}).astype(
            {"src": "int64", "neighbor": "int64", "cosine": "float64"}
        )
        q = pdf[pdf["side"] == 0]
        c = pdf[pdf["side"] == 1]
        if q.empty or c.empty:
            return empty
        q_ids, c_ids = q["item_id"].to_numpy(), c["item_id"].to_numpy()
        qm = np.vstack(q["vec"].to_numpy()).astype(np.float64)
        cm = np.vstack(c["vec"].to_numpy()).astype(np.float64)
        qn = np.maximum(np.linalg.norm(qm, axis=1), 1e-12)
        cn = np.maximum(np.linalg.norm(cm, axis=1), 1e-12)
        sims = (qm @ cm.T) / (qn[:, None] * cn[None, :])
        sims[q_ids[:, None] == c_ids[None, :]] = -np.inf  # no self edges
        kk = min(int(k), sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        vals = np.take_along_axis(sims, idx, axis=1)
        keep = np.isfinite(vals)
        return pd.DataFrame(
            {
                "src": np.repeat(q_ids, kk)[keep.ravel()],
                "neighbor": c_ids[idx].ravel()[keep.ravel()],
                "cosine": np.round(vals, 6).ravel()[keep.ravel()],
            }
        )

    partial = tagged.groupBy("cell", "sub").applyInPandas(
        cell_topk, "src long, neighbor long, cosine double"
    )
    # a neighbor can reach a src via several probed cells — dedupe (the
    # rounded cosine is identical on every route), then the global top-k
    merged = partial.groupBy("src", "neighbor").agg(F.max("cosine").alias("cosine"))
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("neighbor"))
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src", "neighbor", F.col("rank").cast("int").alias("rank"), "cosine")
    )


def _lsh_prep(df, id_col, vec_col, out_id, out_vec, out_norm, planes):
    """Sign-LSH projection: id, double vector, norm, and the n_planes-bit
    bucket string. Two-stage projection: materialize the double vector once
    per row, then derive norm + plane-dots from the attribute —
    CollapseProject keeps the non-cheap cast-transform in its own
    projection instead of re-evaluating it per consumer."""

    def bucket_bits(v):
        bits = []
        for p in planes:
            lits = F.array(*[F.lit(float(x)) for x in p])
            bits.append(F.when(_dot(v, lits) >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)

    staged = df.select(F.col(id_col).alias(out_id), _as_double(vec_col).alias(out_vec))
    return staged.select(
        out_id,
        out_vec,
        _norm(F.col(out_vec)).alias(out_norm),
        bucket_bits(F.col(out_vec)).alias("bucket"),
    )


def lsh_corpus_buckets(
    corpus: DataFrame,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """The LSH INDEX: the bucketed corpus ``(neighbor_id, cv, cn, bucket)``
    for a fixed (dim, n_planes, seed). multiprobe-independent — build and
    materialize once, reuse across probe radii via ``corpus_buckets``."""
    planes = np.random.RandomState(seed).randn(n_planes, dim)
    return _lsh_prep(corpus, c_id, c_vec, "neighbor_id", "cv", "cn", planes)


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: int = 0,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    corpus_buckets: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: random-hyperplane (sign) LSH buckets.

    ``corpus_buckets``: optionally pass the precomputed bucketed corpus
    (``lsh_corpus_buckets`` at the same (dim, n_planes, seed) — the LSH
    INDEX). multiprobe only fans out the QUERY side, so a parameter sweep
    hashes the corpus once and reuses it per probe radius.

    ``n_planes`` fixed hyperplanes (seeded numpy, embedded as literal arrays)
    → each vector hashes to a sign-bit bucket; candidates are corpus vectors
    in the query's bucket; exact cosine ranks candidates. Cost is Σ bucket²
    instead of |Q|·|C|.

    ``multiprobe``: additionally probe every bucket within Hamming distance
    ≤ ``multiprobe`` of the query's bucket (the standard LSH recall lever —
    Lv et al., VLDB'07): the QUERY side fans out to
    Σ_{i≤multiprobe} C(n_planes, i) probe keys (the corpus index is
    untouched — query fan-out is the cheap side since queries are the
    bounded sample), trading candidate volume for recall without
    rebuilding or widening the index. ``multiprobe=1`` multiplies query
    rows by (1 + n_planes); corpus-side cost grows with the probed buckets'
    sizes only."""
    planes = np.random.RandomState(seed).randn(n_planes, dim)
    q = _lsh_prep(queries, q_id, q_vec, "query_id", "qv", "qn", planes)
    if multiprobe > 0:
        from itertools import combinations

        # enumerate bit-flip masks up to the probe radius; applied JVM-side
        # by rebuilding the bucket string with translated characters
        flips: list[tuple[int, ...]] = [()]
        for r in range(1, multiprobe + 1):
            flips.extend(combinations(range(n_planes), r))

        def probe_key(mask: tuple[int, ...]):
            if not mask:
                return F.col("bucket")
            parts = []
            for i in range(n_planes):
                ch = F.substring("bucket", i + 1, 1)
                if i in mask:
                    ch = F.when(ch == "1", F.lit("0")).otherwise(F.lit("1"))
                parts.append(ch)
            return F.concat(*parts)

        q = q.withColumn(
            "bucket", F.explode(F.array(*[probe_key(m) for m in flips]))
        )
    if corpus_buckets is not None:
        c = corpus_buckets
    else:
        c = _lsh_prep(corpus, c_id, c_vec, "neighbor_id", "cv", "cn", planes)
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6))
        .select("query_id", "neighbor_id", "cosine")
        # no distinct needed: each corpus vector lives in exactly ONE bucket,
        # so a (query, neighbor) pair can only match via that bucket even
        # when the query probes several
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# tagged candidates: single-pass parameter sweeps (VERDICT r10 #1)
#
# A recall-vs-cost sweep prices the SAME index at several probe settings.
# Running the probe once per setting re-scores the same candidates
# |settings| times — at 9 sweep points that made `sim_ann_param_sweep` the
# suite's costliest sf0.1 query. The fix is the classic minimal-config
# labeling: score the candidate set of the LARGEST setting once, tagging
# every candidate with the MINIMAL setting that reaches it (IVF: the rank
# of its cell in the query's centroid ordering; LSH: the Hamming distance
# of its bucket from the query's). Any smaller setting's result is then a
# FILTER + re-rank over the already-scored frame — per-family corpus work
# drops from O(settings · candidates) to O(candidates_max).
# ---------------------------------------------------------------------------
def topk_from_tagged(
    tagged: DataFrame, tag_col: str, setting: int, k: int = 5
) -> DataFrame:
    """Reconstruct the top-k result at probe ``setting`` from a tagged
    candidate frame: keep candidates whose minimal setting ≤ ``setting``,
    re-rank per query. Byte-identical to running the family's
    ``*_cosine_topk`` at that setting (same dedup + tie-break:
    cosine DESC, neighbor_id ASC) — pinned by
    `tests/test_tagged_sweep.py`."""
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        tagged.filter(F.col(tag_col) <= setting)
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_tagged_candidates(
    queries: DataFrame,
    corpus: DataFrame,
    nlist: int = 64,
    max_nprobe: int = 8,
    kmeans_iters: int = 0,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    corpus_cells: DataFrame | None = None,
) -> DataFrame:
    """Every candidate the ``nprobe=max_nprobe`` IVF probe would score,
    tagged with ``min_nprobe`` — the 1-based rank of its cell in the
    query's centroid-similarity ordering, i.e. the minimal nprobe whose
    probe set contains it. ``filter(min_nprobe <= p)`` reproduces
    ``ivf_cosine_topk(nprobe=p)``'s candidate set exactly (the probe set
    at p is the length-p prefix of the SAME argsort both functions
    compute), so one scored pass prices every sweep point. Returns
    (query_id, neighbor_id, cosine, min_nprobe)."""
    bc = _ivf_centroid_bc(corpus, nlist, kmeans_iters, c_id, c_vec)

    def assign_ranked(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_, cmat, cnorm = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(m, axis=1)
            sims = (m @ cmat.T) / (norms[:, None] * cnorm[None, :])
            # SAME tie-break path as ivf_cosine_topk's assign() (full
            # argsort, prefix-sliced) so tagged prefixes agree per-point
            top = np.argsort(-sims, axis=1)[:, :max_nprobe]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "vec": pdf["vec"],
                    "cells": [ids_[row].tolist() for row in top],
                }
            )

    if corpus_cells is not None:
        c_cells = corpus_cells
    else:
        c_cells = ivf_corpus_cells(corpus, nlist=nlist, kmeans_iters=kmeans_iters,
                                   c_id=c_id, c_vec=c_vec)
    q_in = queries.select(F.col(q_id).alias("item_id"), F.col(q_vec).alias("vec"))
    q_cells = q_in.mapInPandas(
        assign_ranked, "item_id long, vec array<float>, cells array<long>"
    ).select(
        F.col("item_id").alias("query_id"),
        F.col("vec").alias("qv"),
        F.posexplode("cells").alias("cell_rank0", "cell"),
    ).withColumn("min_nprobe", (F.col("cell_rank0") + 1).cast("int"))
    joined = c_cells.join(F.broadcast(q_cells), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    qa, ca = _as_double(F.col("qv")), _as_double(F.col("cv"))
    return joined.withColumn(
        "cosine", F.round(_dot(qa, ca) / (_norm(qa) * _norm(ca)), 6)
    ).select("query_id", "neighbor_id", "cosine", "min_nprobe")


def lsh_tagged_candidates(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    max_multiprobe: int = 2,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    corpus_buckets: DataFrame | None = None,
) -> DataFrame:
    """Every candidate the radius-``max_multiprobe`` multiprobe would
    score, tagged with ``min_radius`` — the Hamming distance between the
    candidate's bucket and the query's home bucket, i.e. the minimal
    multiprobe radius that reaches it. Each corpus vector lives in exactly
    ONE bucket and the probe keys are distinct, so every (query, neighbor)
    pair appears once with its exact radius; ``filter(min_radius <= r)``
    reproduces ``lsh_cosine_topk(multiprobe=r)``'s candidate set exactly.
    Returns (query_id, neighbor_id, cosine, min_radius)."""
    from itertools import combinations

    planes = np.random.RandomState(seed).randn(n_planes, dim)
    q = _lsh_prep(queries, q_id, q_vec, "query_id", "qv", "qn", planes)
    flips: list[tuple[int, ...]] = [()]
    for r in range(1, max_multiprobe + 1):
        flips.extend(combinations(range(n_planes), r))

    def probe_key(mask: tuple[int, ...]):
        if not mask:
            return F.col("bucket")
        parts = []
        for i in range(n_planes):
            ch = F.substring("bucket", i + 1, 1)
            if i in mask:
                ch = F.when(ch == "1", F.lit("0")).otherwise(F.lit("1"))
            parts.append(ch)
        return F.concat(*parts)

    q = q.withColumn(
        "probe",
        F.explode(
            F.array(
                *[
                    F.struct(
                        probe_key(m).alias("bucket"),
                        F.lit(len(m)).cast("int").alias("min_radius"),
                    )
                    for m in flips
                ]
            )
        ),
    ).select(
        "query_id", "qv", "qn",
        F.col("probe.bucket").alias("bucket"),
        F.col("probe.min_radius").alias("min_radius"),
    )
    if corpus_buckets is not None:
        c = corpus_buckets
    else:
        c = _lsh_prep(corpus, c_id, c_vec, "neighbor_id", "cv", "cn", planes)
    return (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
        )
        .select("query_id", "neighbor_id", "cosine", "min_radius")
    )


# ---------------------------------------------------------------------------
# product quantization: memory-bounded ANN (the BYTES-bounded scale path,
# complementing IVF's candidate-bounded path and LSH's bucket-bounded path)
# ---------------------------------------------------------------------------
def pq_train(
    corpus: DataFrame,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    m: int = 8,
    k: int = 16,
    sample_cap: int = 2048,
    iters: int = 10,
) -> np.ndarray:
    """Train PQ codebooks: split the (unit-normalized) vector into ``m``
    subvectors and k-means each subspace to ``k`` centroids.

    Bounded by construction: training reads the ``sample_cap`` vectors with
    the smallest ``md5(id)`` (the same deterministic TakeOrdered device as
    the IVF centroid seed — no unbounded collect, stable across runs and
    partitionings), and the result is an (m, k, dim/m) array of
    m·k·(dim/m) = k·dim floats — constant in corpus size. Lloyd iterations
    run in numpy on the driver over the bounded sample; init = the first k
    sample points per subspace in hash order (deterministic).
    """
    sample_rows = (
        corpus.select(F.col(c_id).alias("i"), _as_double(c_vec).alias("v"))
        .withColumn("h", F.md5(F.col("i").cast("string")))
        .orderBy("h", "i")
        .limit(sample_cap)
        .collect()
    )
    x = np.vstack([r["v"] for r in sample_rows]).astype(np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, k, dsub))
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        # hash-order init; cycle the sample when it is smaller than k
        # (duplicate centroids are harmless — argmin takes the first)
        cents = sub[np.arange(k) % len(sub)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                pts = sub[assign == c]
                if len(pts):
                    cents[c] = pts.mean(axis=0)
        books[j] = cents
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Encode every vector as ``m`` one-byte-ish codes (nearest centroid per
    subspace, after unit normalization). 100 TB story: a dim-64 float corpus
    compresses 32× (256 B → 8 B per vector), which is what lets the whole
    index live in executor memory for ADC scans; encoding is one Arrow-batch
    map over the corpus, no shuffle."""
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books = bc.value
        mm, kk, dsub = books.shape
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
            x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(x), mm), dtype=np.int32)
            for j in range(mm):
                sub = x[:, j * dsub : (j + 1) * dsub]
                d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"item_id": pdf["item_id"], "codes": [row.tolist() for row in codes]}
            )

    return corpus.select(
        F.col(c_id).alias("item_id"), _as_double(c_vec).alias("vec")
    ).mapInPandas(run, "item_id long, codes array<int>")


def pq_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m: int = 16,
    n_centroids: int = 32,
    oversample: int = 4,
    rerank: bool = True,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance (ADC) + exact re-rank.

    On unit vectors ‖q−c‖² = 2−2·cos(q,c), so ranking by ADC L2 ranks by
    cosine. Per query a (m × n_centroids) lookup table of subspace distances
    is precomputed driver-side (queries are bounded, as in lsh/ivf_topk);
    scoring the corpus is then ONE join-free Arrow map — for each encoded
    row, sum m table lookups — with a MAP-SIDE PARTIAL TOP-K (each batch
    emits only its best shortlist_k+1 rows per query, tie-broken identically
    to the global ordering), followed by the per-query top-k window that
    reduces the partials. Peak Arrow output per batch is |Q|·(shortlist+1)
    rows, not |Q|·batch; no float vectors move after encoding; shuffle
    volume is partials-per-batch, not the corpus.

    ``rerank=True`` is the standard two-stage shape: ADC shortlists
    ``k·oversample`` candidates from the compressed index, then exact cosine
    runs on the shortlist only (a |Q|·k·oversample-row join back to the
    float vectors). The ADC scan economics stay (the corpus is touched in
    compressed form), while quantization error stops costing recall —
    measured on the fixture: 0.78 raw → ~1.0 re-ranked at k=10.
    """
    spark = corpus.sparkSession
    books = pq_train(corpus, c_id, c_vec, m=m, k=n_centroids)
    encoded = pq_encode(corpus, books, c_id, c_vec)

    q_rows = queries.select(F.col(q_id).alias("i"), _as_double(q_vec).alias("v")).collect()
    qmat = np.vstack([r["v"] for r in q_rows]).astype(np.float64)
    qmat /= np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    qids = np.array([r["i"] for r in q_rows])
    mm, kk, dsub = books.shape
    # luts[qi, j, c] = ||q_sub - centroid||^2
    luts = np.empty((len(qmat), mm, kk))
    for j in range(mm):
        sub = qmat[:, j * dsub : (j + 1) * dsub]
        luts[:, j, :] = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
    bc = spark.sparkContext.broadcast((qids, luts))

    shortlist_k = k * oversample if rerank else k

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_, luts_ = bc.value
        nq = len(ids_)
        for pdf in batches:
            if pdf.empty:
                continue
            # map-side partial top-k: emit only the per-batch best
            # shortlist_k+1 rows per query (+1 because the self-match is
            # filtered AFTER this map and may occupy one slot), instead of
            # |Q|×batch rows — the union of per-batch partials provably
            # contains the global shortlist, and the downstream window
            # reduces them. Batch rows are pre-ordered by neighbor id so
            # the STABLE dist-sort breaks ties exactly like the global
            # window's (adc_dist, neighbor_id) ordering — boundary ties
            # select identically with or without the partial step.
            item_ids = pdf["item_id"].to_numpy()
            order = np.argsort(item_ids, kind="stable")
            item_ids = item_ids[order]
            codes = np.vstack(pdf["codes"].to_numpy())[order]  # (n, m)
            n = len(codes)
            # dists[qi, row] = sum_j luts[qi, j, codes[row, j]]
            dists = np.zeros((nq, n))
            for j in range(codes.shape[1]):
                dists += luts_[:, j, :][:, codes[:, j]]
            keep = min(shortlist_k + 1, n)
            idx = np.argsort(dists, axis=1, kind="stable")[:, :keep]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids_, keep),
                    "neighbor_id": item_ids[idx].reshape(-1),
                    "adc_dist": np.take_along_axis(dists, idx, axis=1).reshape(-1),
                }
            )

    scored = encoded.mapInPandas(
        score, "query_id long, neighbor_id long, adc_dist double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= shortlist_k)
        .select("query_id", "neighbor_id", F.round("adc_dist", 6).alias("adc_dist"), "rank")
    )
    if not rerank:
        return shortlist

    cand = shortlist.join(
        corpus.select(F.col(c_id).alias("neighbor_id"), _as_double(c_vec).alias("cv")),
        "neighbor_id",
    )

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_, _ = bc.value
        qlookup = {int(i): qmat[n] for n, i in enumerate(ids_)}
        for pdf in batches:
            if pdf.empty:
                continue
            cv = np.vstack(pdf["cv"].to_numpy()).astype(np.float64)
            cv /= np.maximum(np.linalg.norm(cv, axis=1, keepdims=True), 1e-12)
            qv = np.vstack([qlookup[int(q)] for q in pdf["query_id"]])
            cos = (qv * cv).sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "cosine": np.round(cos, 6),
                }
            )

    reranked = cand.mapInPandas(exact, "query_id long, neighbor_id long, cosine double")
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        reranked.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def truncated_rerank_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    prefix_dims: int = 16,
    oversample: int = 4,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Matryoshka-style two-stage ANN (Kusupati et al. 2022): shortlist by
    cosine over the first ``prefix_dims`` dimensions (a d/prefix_dims flop
    cut on the corpus-sized pass), keep ``k·oversample`` candidates per
    query, then exact-re-rank the shortlist on the full vector. With
    MRL-trained embeddings the prefix preserves neighborhood structure, so
    modest oversampling recovers near-1 recall; on arbitrary embeddings
    recall degrades gracefully and is measured per-query by the caller via
    :func:`with_recall_vs_exact`. Same broadcast-query shape as
    :func:`brute_force_cosine_topk` — the corpus never shuffles; only the
    query-sample-sized shortlist reaches the re-rank join."""
    q = queries.select(
        F.col(q_id).alias("query_id"),
        _as_double(q_vec).alias("qv"),
        _norm(_as_double(q_vec)).alias("qn"),
        _norm(F.slice(_as_double(q_vec), 1, prefix_dims)).alias("qpn"),
        F.slice(_as_double(q_vec), 1, prefix_dims).alias("qp"),
    )
    c = corpus.select(
        F.col(c_id).alias("neighbor_id"),
        _as_double(c_vec).alias("cv"),
        _norm(_as_double(c_vec)).alias("cn"),
        _norm(F.slice(_as_double(c_vec), 1, prefix_dims)).alias("cpn"),
        F.slice(_as_double(c_vec), 1, prefix_dims).alias("cp"),
    )
    staged = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "pcos",
            F.round(_dot(F.col("qp"), F.col("cp")) / (F.col("qpn") * F.col("cpn")), 6),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(F.desc("pcos"), F.asc("neighbor_id"))
    shortlist = (
        staged.withColumn("prank", F.row_number().over(w1))
        .filter(F.col("prank") <= k * oversample)
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6).alias(
                "cosine"
            ),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        shortlist.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def with_recall_vs_exact(
    approx_topk: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    exact: DataFrame | None = None,
) -> DataFrame:
    """Attach a self-validating ``recall_at_k`` column to an approximate
    top-k result: per query, |approx ∩ exact| / k against the brute-force
    exact top-k over the same corpus. Makes "runs" distinguishable from
    "right" for the ANN paths that have no SQL oracle — the driver's
    rows-only check then carries a measured quality number, and unit tests
    assert a floor on it.

    Scale: the exact baseline is computed only for the QUERY SAMPLE (the
    standard ANN recall protocol — FAISS/ann-benchmarks measure exactly
    this way): one broadcast-query pass over the corpus, no corpus shuffle.
    At 100 TB you bound the sample, not the corpus scan count; the recall
    join itself is query-sample-sized and broadcast.

    ``exact``: optionally pass a precomputed ``(query_id,
    exact_neighbor_id)`` baseline so multi-point sweeps
    (`sim_ann_param_sweep` prices 9 configs against the SAME sample) pay
    the corpus-scanning brute-force pass once, not per point.
    """
    if exact is None:
        exact = brute_force_cosine_topk(
            queries, corpus, k=k, q_id=q_id, q_vec=q_vec, c_id=c_id, c_vec=c_vec
        ).select("query_id", F.col("neighbor_id").alias("exact_neighbor_id"))
    hits = (
        approx_topk.alias("a")
        .join(
            F.broadcast(exact).alias("e"),
            (F.col("a.query_id") == F.col("e.query_id"))
            & (F.col("a.neighbor_id") == F.col("e.exact_neighbor_id")),
            "left",
        )
        .groupBy(F.col("a.query_id").alias("query_id"))
        .agg(
            F.round(
                F.count("e.exact_neighbor_id") / F.lit(float(k)), 6
            ).alias("recall_at_k")
        )
    )
    return approx_topk.join(F.broadcast(hits), "query_id", "left")


def mmr_rerank(
    candidates: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    cand_id: str = "neighbor_id",
    rel_col: str = "cosine",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    query_col: str | None = None,
) -> DataFrame:
    """Maximal Marginal Relevance re-rank (Carbonell & Goldstein SIGIR'98):
    greedily pick ``k`` results maximizing
    ``lam·relevance − (1−lam)·max_similarity_to_already_selected`` — the
    diversity stage after any retrieval shortlist (BM25 / ANN top-N), so a
    RAG answer set stops collapsing onto near-duplicates of one hit.

    ``query_col`` names the shortlist's query-partition column: the greedy
    selection runs INDEPENDENTLY per query (the natural multi-query top-k
    frame from :func:`brute_force_cosine_topk` et al. feeds straight in).
    With ``query_col=None`` the whole frame is treated as ONE query's
    shortlist — feeding a multi-query frame in that mode would mix queries
    into a single greedy selection, which is why the per-query mode is the
    default path for retrieval outputs.

    Structurally: the shortlist is join-enriched with its vectors, pairwise
    candidate-candidate cosines are computed ONCE per query (shortlist²
    rows per query — the shortlist is retrieval-bounded, e.g. 50, so this
    is metadata-rate work, never corpus-rate), and the k greedy steps are
    UNROLLED into the plan: each step joins the remaining candidates
    against that query's selected winners, takes the per-candidate max
    similarity, scores, and picks the per-query argmax with a
    deterministic (score DESC, id) tie-break. All scores round to 6 before
    every argmax so the plan is engine-exact (oracle-comparable). Returns
    (query_col?, selected_id, mmr_rank, relevance, mmr_score — the score
    at selection time; rank 1's score is lam·rel).
    """
    qid = F.col(query_col) if query_col else F.lit(0)
    cand = candidates.select(
        qid.alias("qid"),
        F.col(cand_id).alias("cid"),
        F.round(F.col(rel_col), 6).alias("rel"),
    )
    vecs = corpus.select(F.col(c_id).alias("cid"), _as_double(c_vec).alias("v"))
    cv = cand.join(vecs, "cid")
    a = cv.select("qid", F.col("cid").alias("ia"), F.col("v").alias("va"))
    b = cv.select(
        F.col("qid").alias("qb"), F.col("cid").alias("ib"), F.col("v").alias("vb")
    )
    # Single-query mode (query_col=None): the qid equi-key folds to a
    # literal and a plain join would plan a two-sided CartesianProduct, so
    # broadcast the b side — ONE query's retrieval-bounded shortlist
    # (~dozens of rows), always broadcast-safe. Multi-query mode (r15,
    # VERDICT r14 #3/#9): the qid key is real, so the equi-join needs no
    # broadcast — the former unconditional F.broadcast(b) shipped the
    # FULL k·|queries| shortlist union to the driver, a ceiling at
    # millions of concurrent queries; the hash join shuffles each query's
    # shortlist to one partition instead, unbounded in |queries|.
    b_side = b if query_col else F.broadcast(b)
    sims = (
        a.join(b_side, (F.col("qid") == F.col("qb")) & (F.col("ia") != F.col("ib")))
        .select(
            "qid",
            "ia",
            "ib",
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (_norm(F.col("va")) * _norm(F.col("vb"))),
                6,
            ).alias("sim"),
        )
    )
    # r14 (guide §1.2 "the distributed algorithm" + §4.2): the k greedy
    # steps used to be unrolled into the plan with a localCheckpoint per
    # step (winner is consumed twice: selected-union + remaining-anti-join)
    # — k sequential driver jobs plus a checkpoint of a rows-per-query
    # frame each, ~30 of rag_mmr_rerank's 54 jobs/pass. The greedy argmax
    # over a shortlist is a per-query problem on a shortlist²-bounded sim
    # matrix (metadata-rate, never corpus-rate), so it now runs as ONE
    # cogrouped Arrow stage: per qid, the candidate list and its pairwise
    # sims arrive together and the k steps run in-memory.
    #
    # Bit-exactness with the former plan (and the unrolled-CTE oracle):
    # rel and sim enter PRE-ROUNDED to 6dp (same expressions as before);
    # the per-step score mirrors Spark's
    #   round((lam·rel − (1−lam)·msim) · 1e6, HALF_UP) / 1e6
    # exactly — identical IEEE multiply/subtract order on the same
    # doubles, then HALF_UP on the shortest decimal repr (Python repr ==
    # Java Double.toString), which is precisely what Spark's
    # BigDecimal.valueOf(double).setScale(0, HALF_UP) rounds. Ties break
    # (score DESC, cid ASC) as the former window did.
    import pandas as pd
    from decimal import ROUND_HALF_UP, Decimal

    lam_f = float(lam)
    one_minus_lam = 1.0 - lam_f  # the former plan's F.lit(1.0 - lam) double
    k_steps = int(k)

    def _round_half_up_1e6(v: float) -> float:
        # Spark's Round returns non-finite doubles unchanged (Catalyst
        # checks isNaN/isInfinite before the BigDecimal path) — mirror
        # that so a NaN/inf score survives to the comparison below
        # instead of raising inside Decimal.quantize.
        if v != v or v in (float("inf"), float("-inf")):
            return v
        scaled = v * 1000000.0
        return float(
            Decimal(repr(scaled)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
        ) / 1000000.0

    def _beats(score: float, best: float | None) -> bool:
        # Spark's former window (ORDER BY mmr_score DESC) sorts NaN as the
        # GREATEST double (r14 ADVICE): a NaN-scored candidate (NaN
        # relevance, or a NaN embedding component poisoning the cosine;
        # under ANSI a zero NORM raises DIVIDE_BY_ZERO before reaching
        # here) must win over any finite score, and among NaN scores the
        # first candidate in cid-ASC order keeps the win (strictly-beats
        # semantics = the former window's cid tie-break). Note the output
        # VALUE of a NaN score crosses the Arrow boundary as NULL (pandas
        # NaN is Arrow's null sentinel); the selection order is what this
        # preserves, pinned by test_mmr_rerank_nan_candidate_sorts_greatest.
        if best is None:
            return True
        if score != score:  # NaN challenger
            return best == best  # beats any finite best, never another NaN
        if best != best:  # finite challenger never beats a NaN best
            return False
        return score > best

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    cand_fields = {f.name: f.dataType for f in cand.schema.fields}
    out_schema = StructType(
        [
            StructField("qid", cand_fields["qid"], True),
            StructField("cid", cand_fields["cid"], True),
            StructField("mmr_rank", IntegerType(), True),
            StructField("rel", DoubleType(), True),
            StructField("mmr_score", DoubleType(), True),
        ]
    )

    empty_out = pd.DataFrame(
        {"qid": [], "cid": [], "mmr_rank": [], "rel": [], "mmr_score": []}
    )

    def greedy(cand_pdf, sim_pdf):
        if cand_pdf.empty:
            return empty_out
        qid_v = cand_pdf["qid"].iloc[0]
        rel_by_cid = dict(zip(cand_pdf["cid"], cand_pdf["rel"]))
        sim_to: dict = {}
        if sim_pdf is not None and not sim_pdf.empty:
            for ia, ib, s in zip(sim_pdf["ia"], sim_pdf["ib"], sim_pdf["sim"]):
                sim_to.setdefault(ia, {})[ib] = s
        remaining = sorted(rel_by_cid)  # cid ASC = the tie-break order
        selected: list = []
        rows = []
        for step in range(1, k_steps + 1):
            if not remaining:
                break
            best_cid, best_score = None, None
            for cid_v in remaining:
                rel_v = float(rel_by_cid[cid_v])
                if step == 1:
                    score = _round_half_up_1e6(lam_f * rel_v)
                else:
                    neigh = sim_to.get(cid_v)
                    msim = 0.0
                    if neigh:
                        hits = [neigh[s] for s in selected if s in neigh]
                        if hits:
                            # Spark's max aggregate sorts NaN greatest;
                            # Python's max() is order-dependent under NaN —
                            # propagate NaN explicitly to match the former
                            # plan (a NaN cosine poisons the penalty term)
                            msim = (
                                float("nan")
                                if any(h != h for h in hits)
                                else max(hits)
                            )
                    score = _round_half_up_1e6(
                        lam_f * rel_v - one_minus_lam * msim
                    )
                if _beats(score, best_score):
                    best_cid, best_score = cid_v, score
            selected.append(best_cid)
            remaining.remove(best_cid)
            rows.append((qid_v, best_cid, step, float(rel_by_cid[best_cid]), best_score))
        return pd.DataFrame(
            rows, columns=["qid", "cid", "mmr_rank", "rel", "mmr_score"]
        )

    # sims derives from cand, so grouping both by the SAME attribute trips
    # the ambiguous-self-join check; rename the sim side's key (cogroup
    # matches groups by key VALUE, not name)
    sims_g = sims.select(
        F.col("qid").alias("sqid"), "ia", "ib", "sim"
    )

    out = (
        cand.groupBy("qid")
        .cogroup(sims_g.groupBy("sqid"))
        .applyInPandas(greedy, out_schema)
        .select(
            "qid",
            F.col("cid").alias("selected_id"),
            "mmr_rank",
            "rel",
            "mmr_score",
        )
    )
    if query_col:
        return out.withColumnRenamed("qid", query_col)
    return out.drop("qid")


def rrf_fuse(
    ranked: list[tuple[str, DataFrame]],
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Büttcher SIGIR'09): fuse
    the top-k lists of several retrievers — lexical BM25 next to dense ANN
    is the canonical hybrid-RAG pairing — by summing ``1/(rrf_k + rank)``
    over the lists each document appears in. Rank-only fusion needs no
    score calibration between retrievers, which is why it is the default
    hybrid combiner in production search stacks.

    ``ranked`` is an ORDERED list of ``(name, frame)``; each frame carries
    ``id_col`` + ``rank_col`` and is already top-N bounded by its
    retriever. The fused score is built as a left-to-right sum of
    ``coalesce(1/(rrf_k+rank_<name>), 0)`` in the declared order, so float
    association is fixed and engine-exact (oracle-comparable); with the
    usual two retrievers the two-term sum is order-independent anyway.

    Scale shape: every input list is top-N bounded (metadata-rate, never
    corpus-rate), so the per-retriever full-outer joins on the id never
    touch corpus-cardinality data; the final (score DESC, id) row_number
    runs over at most ``sum(N_i)`` rows. Returns
    (``id_col``, rank_<name>..., rrf_score, fused_rank ≤ k).
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    out = None
    for name, df in ranked:
        r = df.select(
            F.col(id_col).cast("long").alias(id_col),
            F.col(rank_col).cast("int").alias(f"rank_{name}"),
        )
        out = r if out is None else out.join(r, id_col, "full_outer")
    score = None
    for name, _ in ranked:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(f"rank_{name}")),
            F.lit(0.0),
        )
        score = term if score is None else score + term
    scored = out.withColumn("rrf_score", F.round(score, 6))
    w = Window.orderBy(F.desc("rrf_score"), F.asc(id_col))
    return (
        scored.withColumn("fused_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("fused_rank") <= k)
        .select(
            id_col,
            *[F.col(f"rank_{name}") for name, _ in ranked],
            "rrf_score",
            "fused_rank",
        )
    )
