"""Deterministic Lloyd's k-means (ml/kmeans.py) — partitioning
independence, correct clustering of separated blobs, empty-cluster
carry-over, and WCSS non-increase across iterations."""

from __future__ import annotations

from emdatapipelines_spark.ml.kmeans import kmeans_lloyd

# Three well-separated 2-D blobs (9 points); k=3 must recover them.
BLOBS = [
    (1, [0.0, 0.1]), (2, [0.1, 0.0]), (3, [0.05, 0.05]),
    (4, [10.0, 10.1]), (5, [10.1, 10.0]), (6, [10.05, 10.05]),
    (7, [-10.0, 5.0]), (8, [-10.1, 5.1]), (9, [-10.05, 5.05]),
]


def _df(spark, parts=4):
    return spark.createDataFrame(
        BLOBS, "vec_id bigint, embedding array<double>"
    ).repartition(parts)


def _model(spark, parts=4, k=3, iters=3):
    rows = kmeans_lloyd(_df(spark, parts), k=k, iters=iters).collect()
    cents: dict[int, dict[int, float]] = {}
    sizes: dict[int, int] = {}
    for r in rows:
        cents.setdefault(r["cluster"], {})[r["dim"]] = r["c_val"]
        sizes[r["cluster"]] = r["n_vecs"]
    return {c: [d[i] for i in sorted(d)] for c, d in cents.items()}, sizes


def test_recovers_separated_blobs(spark):
    cents, sizes = _model(spark)
    assert sorted(sizes.values()) == [3, 3, 3]
    # every centroid sits inside one blob's bounding box
    blobs = [(0.0, 0.1), (10.0, 10.1), (-10.1, 5.0)]
    for c in cents.values():
        assert any(
            abs(c[0] - bx) < 0.2 and abs(c[1] - by) < 0.2 for bx, by in blobs
        )


def test_partitioning_independent(spark):
    a = _model(spark, parts=1)
    b = _model(spark, parts=8)
    assert a == b


def test_empty_cluster_keeps_seed(spark):
    # k=4 over 3 tight blobs: at least one cluster may end empty; its
    # centroid must survive (n_vecs 0) instead of vanishing or NaN-ing.
    rows = kmeans_lloyd(_df(spark), k=4, iters=2).collect()
    clusters = {r["cluster"] for r in rows}
    assert clusters == {0, 1, 2, 3}
    assert all(r["c_val"] == r["c_val"] for r in rows)  # no NaN
    assert len(rows) == 4 * 2


def test_wcss_non_increasing(spark):
    import math

    def wcss(iters):
        cents, _ = _model(spark, k=3, iters=iters)
        total = 0.0
        for _, v in BLOBS:
            total += min(
                sum((a - b) ** 2 for a, b in zip(v, c)) for c in cents.values()
            )
        return total

    w1, w3 = wcss(1), wcss(3)
    assert w3 <= w1 + 1e-9 and math.isfinite(w3)


def test_zero_iters_rejected(spark):
    import pytest

    for bad in (0, -1):
        with pytest.raises(ValueError, match="iters"):
            kmeans_lloyd(_df(spark), k=3, iters=bad)


def test_degenerate_inputs(spark):
    # fewer points than k: fits the points that exist
    two = spark.createDataFrame(
        BLOBS[:2], "vec_id bigint, embedding array<double>"
    )
    rows = kmeans_lloyd(two, k=5, iters=2).collect()
    assert {r["cluster"] for r in rows} <= {0, 1} and rows
    # empty input: empty model with the right schema, no crash
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    out = kmeans_lloyd(empty, k=3, iters=2)
    assert out.count() == 0
    assert out.columns == ["cluster", "dim", "c_val", "n_vecs"]
