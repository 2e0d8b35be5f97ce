"""Grouped EWMA fold (operators/windows.py: grouped_ewma) — recurrence
matches pandas ewm(adjust=False), order totality, partitioning
independence."""

from __future__ import annotations

import pandas as pd

from emdatapipelines_spark.operators.windows import grouped_ewma

ROWS = [
    ("u1", 1, 10.0), ("u1", 2, 20.0), ("u1", 3, 5.0), ("u1", 4, 40.0),
    ("u2", 1, 7.5), ("u2", 2, 2.5),
    ("u3", 9, 1.0),                       # single-element group: ewma = x1
]


def _df(spark, parts=4):
    return spark.createDataFrame(
        ROWS, "uid string, seq int, value double"
    ).repartition(parts)


def test_matches_pandas_ewm(spark):
    out = {
        r["uid"]: (r["n_obs"], r["ewma"])
        for r in grouped_ewma(_df(spark), "value", ["uid"], ["seq"], alpha=0.2).collect()
    }
    pdf = pd.DataFrame(ROWS, columns=["uid", "seq", "value"]).sort_values(["uid", "seq"])
    for uid, g in pdf.groupby("uid"):
        want = g["value"].ewm(alpha=0.2, adjust=False).mean().iloc[-1]
        n, got = out[uid]
        assert n == len(g)
        assert abs(got - round(want, 6)) < 1e-9
    assert out["u3"] == (1, 1.0)


def test_partitioning_independent(spark):
    a = sorted(map(tuple, grouped_ewma(_df(spark, 1), "value", ["uid"], ["seq"]).collect()))
    b = sorted(map(tuple, grouped_ewma(_df(spark, 7), "value", ["uid"], ["seq"]).collect()))
    assert a == b


def test_streaming_twin_composes_bit_exactly(spark, tmp_path):
    """Chunked folds with carried state == one global fold (the recurrence
    composes), including keys absent from later batches and keys first seen
    mid-stream; replayed and stale batches follow the watermark contract."""
    import pytest

    from emdatapipelines_spark.streaming.incremental import (
        StaleBatchError,
        apply_ewma_batch,
    )

    table = str(tmp_path / "ewma_state")
    batches = [ROWS[:3], ROWS[3:5], ROWS[5:]]  # u3 appears only in batch 3
    for i, rows in enumerate(batches):
        b = spark.createDataFrame(rows, "uid string, seq int, value double")
        assert apply_ewma_batch(b, i, table, "value", ["uid"], ["seq"]) is True

    from emdatapipelines_spark.versioned import read_versioned

    got = {
        r["uid"]: (r["n_obs"], round(r["ewma"], 6))
        for r in read_versioned(spark, table).collect()
    }
    want = {
        r["uid"]: (r["n_obs"], r["ewma"])
        for r in grouped_ewma(_df(spark), "value", ["uid"], ["seq"], alpha=0.2).collect()
    }
    assert got == want

    # replay of the last epoch: skipped, state unchanged
    b = spark.createDataFrame(batches[-1], "uid string, seq int, value double")
    assert apply_ewma_batch(b, 2, table, "value", ["uid"], ["seq"]) is False
    again = {
        r["uid"]: (r["n_obs"], round(r["ewma"], 6))
        for r in read_versioned(spark, table).collect()
    }
    assert again == want

    # fresh-checkpoint signature (id far below watermark): loud failure
    with pytest.raises(StaleBatchError):
        apply_ewma_batch(b, 0, table, "value", ["uid"], ["seq"])


def test_grouped_holt_matches_python_recurrence(spark):
    """Holt level/trend fold vs a plain python reference, plus n=1 and
    constant-series edge cases (trend must stay 0 on a flat series)."""
    from emdatapipelines_spark.operators.windows import grouped_holt

    rows = [
        ("a", i, float(v)) for i, v in enumerate([10, 12, 14, 16, 18, 20])
    ] + [("b", 0, 5.0)] + [("c", i, 7.0) for i in range(4)]
    df = spark.createDataFrame(rows, "g string, seq long, value double")
    got = {
        r["g"]: (r["n_obs"], r["level"], r["trend"], r["forecast_1"])
        for r in grouped_holt(df, "value", ["g"], ["seq"], alpha=0.3, beta=0.1).collect()
    }

    def ref(vals, a=0.3, b=0.1):
        l, t = vals[0], 0.0
        for y in vals[1:]:
            l_new = a * y + (1.0 - a) * (l + t)
            t = b * (l_new - l) + (1.0 - b) * t
            l = l_new
        r6 = lambda x: round(x * 1e6) / 1e6
        return r6(l), r6(t), r6(l + t)

    la, ta, fa = ref([10, 12, 14, 16, 18, 20])
    assert got["a"] == (6, la, ta, fa)
    assert ta > 0  # rising series -> positive trend
    assert got["b"] == (1, 5.0, 0.0, 5.0)          # single point: no trend
    assert got["c"] == (4, 7.0, 0.0, 7.0)          # flat series: trend 0


def test_grouped_holt_partitioning_independent(spark):
    from emdatapipelines_spark.operators.windows import grouped_holt

    rows = [("g", i, float((i * 37) % 11) + 0.25) for i in range(200)]
    a = grouped_holt(
        spark.createDataFrame(rows, "g string, seq long, value double").repartition(1),
        "value", ["g"], ["seq"],
    ).collect()
    b = grouped_holt(
        spark.createDataFrame(rows, "g string, seq long, value double").repartition(16),
        "value", ["g"], ["seq"],
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_chunked_recurrences_match_single_array_on_million_row_group(spark):
    """The chunked scale paths (per-chunk affine maps + bounded chaining
    fold — grouped_ewma_chunked / grouped_holt_chunked) must reproduce the
    single-array fold on a 10^6-row group: at 100 TB a hot (event_type)
    group is years of rows, and the single-array path would put them all
    in one collect_list cell. Rounded-to-6 outputs must agree exactly;
    cross-chunk float association is the only divergence source (~ulp per
    chunk composition)."""
    from pyspark.sql import functions as F

    from emdatapipelines_spark.operators.windows import (
        grouped_ewma,
        grouped_ewma_chunked,
        grouped_holt,
        grouped_holt_chunked,
    )

    df = spark.range(1_000_000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.col("id").alias("ts"),
        (F.sin(F.col("id") * 0.001) * 10 + F.col("id") * 1e-5).alias("v"),
    )
    e1 = {tuple(r) for r in grouped_ewma(df, "v", ["g"], ["ts"]).collect()}
    e2 = {
        tuple(r)
        for r in grouped_ewma_chunked(df, "v", ["g"], ["ts"], chunk_size=8192).collect()
    }
    assert e1 == e2 and len(e1) == 2
    h1 = {tuple(r) for r in grouped_holt(df, "v", ["g"], ["ts"]).collect()}
    h2 = {
        tuple(r)
        for r in grouped_holt_chunked(df, "v", ["g"], ["ts"], chunk_size=8192).collect()
    }
    assert h1 == h2 and len(h1) == 2


def test_chunked_recurrences_small_groups_and_boundaries(spark):
    """Chunked == single-array on groups smaller than, equal to, and just
    above the chunk size (the boundary cases: single-chunk groups take the
    exact-state branch; a 1-element second chunk exercises the affine
    composition)."""
    from emdatapipelines_spark.operators.windows import (
        grouped_ewma,
        grouped_ewma_chunked,
        grouped_holt,
        grouped_holt_chunked,
    )

    rows = [
        (g, i, float((i * 37 + hash(g) % 7) % 11) + 0.25)
        for g, n in [("a", 3), ("b", 8), ("c", 9), ("d", 17), ("e", 1)]
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "g string, seq long, value double")
    for single, chunked in [
        (grouped_ewma, grouped_ewma_chunked),
        (grouped_holt, grouped_holt_chunked),
    ]:
        want = sorted(tuple(r) for r in single(df, "value", ["g"], ["seq"]).collect())
        got = sorted(
            tuple(r)
            for r in chunked(df, "value", ["g"], ["seq"], chunk_size=8).collect()
        )
        assert got == want
