"""Misra-Gries heavy hitters (operators/heavyhitters.py) — the mergeable-
summary guarantees (undercount bounded by N/(k+1), no overcount, no false
negatives above the bound, <= k+1 rows per partition) on skewed data, and
end-to-end equality with the exact groupBy."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from emdatapipelines_spark.operators.heavyhitters import (
    heavy_hitters,
    merge_mg,
    misra_gries_partials,
)

# Zipf-ish skew: item i appears ~ 3000/i times, plus a long uniform tail.
ITEMS = [f"item{i}" for i in range(1, 40) for _ in range(3000 // i)] + [
    f"tail{j}" for j in range(2000)
]


def _df(spark, partitions=8):
    return spark.createDataFrame(
        [(v,) for v in ITEMS], "item string"
    ).repartition(partitions)


def test_mg_guarantees(spark):
    k = 50
    df = _df(spark)
    n = len(ITEMS)
    true = Counter(ITEMS)
    merged, totals = merge_mg(misra_gries_partials(df, "item", k), "item")
    est = {r["item"]: r["est"] for r in merged.collect()}
    assert totals.first()["total_n"] == n
    bound = n / (k + 1)
    for item, e in est.items():
        assert e <= true[item]                   # never overcounts
        assert true[item] - e <= bound           # bounded undercount
    for item, c in true.items():                 # no false negatives
        if c > bound:
            assert item in est


def test_partition_summaries_are_bounded(spark):
    k = 20
    partials = misra_gries_partials(_df(spark, partitions=6), "item", k)
    # 6 partitions x at most (k items + 1 total row) each
    assert partials.count() <= 6 * (k + 1)
    per_part = (
        partials.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per_part <= k + 1


def test_heavy_hitters_exact_vs_groupby(spark):
    df = _df(spark)
    s = 0.01
    got = {
        (r["item"], r["cnt"]) for r in heavy_hitters(df, "item", min_share=s).collect()
    }
    n = len(ITEMS)
    want = {(i, c) for i, c in Counter(ITEMS).items() if c * 1.0 / n >= s}
    assert got == want and got


def test_undersized_explicit_k_rejected(spark):
    """k+1 <= 1/min_share would let a qualifying item be fully evicted from
    the merged sketch (silent false negative) — must raise, not mislead."""
    import pytest

    df = _df(spark)
    with pytest.raises(ValueError, match="no-false-negative"):
        heavy_hitters(df, "item", min_share=0.01, k=50)  # 51 <= 100
    # the boundary-legal k (k+1 > 1/min_share) still works and stays exact
    got = {
        (r["item"], r["cnt"])
        for r in heavy_hitters(_df(spark), "item", min_share=0.01, k=100).collect()
    }
    n = len(ITEMS)
    want = {(i, c) for i, c in Counter(ITEMS).items() if c * 1.0 / n >= 0.01}
    assert got == want


def test_result_independent_of_partitioning(spark):
    a = heavy_hitters(_df(spark, 2), "item", 0.01).collect()
    b = heavy_hitters(_df(spark, 16), "item", 0.01).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_streaming_mg_state_maintenance(spark, tmp_path):
    """Streaming MG: merged state over chunked batches keeps the mergeable-
    summary bounds for the WHOLE stream, stays <= k+1 rows, and every item
    above the bound survives; replay/stale batches follow the watermark
    contract."""
    import pytest

    from emdatapipelines_spark.streaming.incremental import (
        StaleBatchError,
        apply_mg_batch,
        heavy_hitters_from_state,
    )
    from emdatapipelines_spark.versioned import read_versioned

    k = 40
    table = str(tmp_path / "mg_state")
    third = len(ITEMS) // 3
    chunks = [ITEMS[:third], ITEMS[third : 2 * third], ITEMS[2 * third :]]
    for i, chunk in enumerate(chunks):
        b = spark.createDataFrame([(v,) for v in chunk], "item string").repartition(4)
        assert apply_mg_batch(b, i, table, "item", k) is True

    state = read_versioned(spark, table)
    assert state.count() <= k + 1
    est = {
        r["item"]: r["est"] for r in state.filter(state.item.isNotNull()).collect()
    }
    n = len(ITEMS)
    total = state.filter(state.item.isNull()).agg(F.sum("est")).first()[0]
    assert total == n
    true = Counter(ITEMS)
    bound = n / (k + 1)
    for item, e in est.items():
        assert e <= true[item] and true[item] - e <= bound
    for item, c in true.items():
        if c > bound:
            assert item in est

    # candidate read-back: no false negatives at s with k > 2/s
    s = 0.02
    cands = {r["item"] for r in heavy_hitters_from_state(spark, table, "item", s, k).collect()}
    for item, c in true.items():
        if c / n >= s:
            assert item in cands

    # replay skipped; fresh-checkpoint signature raises
    b = spark.createDataFrame([(v,) for v in chunks[-1]], "item string")
    assert apply_mg_batch(b, 2, table, "item", k) is False
    with pytest.raises(StaleBatchError):
        apply_mg_batch(b, 0, table, "item", k)
