"""Overlap-chunk window carrier (VERDICT r8 #1).

``with_overlap_chunks`` splits a huge low-cardinality-keyed ordered series
into fixed-size row chunks carrying the previous chunk's last ``overlap``
rows as context, so fixed ROWS-frame windows run per (group, chunk) —
exact by construction — instead of one single-task sort per key.

1. Million-row chunk equivalence: the chunked frame sums are byte-identical
   to the naive global-window plan on a 1M-row single-key series.
2. Mechanics: global row numbers are a correct 1..n permutation, context
   duplication hits exactly the last ``overlap`` slots of each chunk.
3. Plan guards: w16/w17's Window operators partition by (event_type,
   __chunk) — never by event_type alone — and at runtime a >chunk_size
   series really splits into multiple chunks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

import __spark_entry__ as entry
from emdatapipelines_spark.operators.windows import with_overlap_chunks

SF = "/root/testdata/sf0.01"


def _series(spark, n: int, keys: int = 1):
    """Deterministic integer series: key, ts-like position, value."""
    return spark.range(n).select(
        (F.col("id") % keys).cast("string").alias("k"),
        # bucket ~ "day": 1000 rows per bucket, a prefix of the sort order
        (F.col("id") / 1000).cast("long").alias("b"),
        F.col("id").alias("ord"),
        ((F.col("id") * 2654435761) % 10007).cast("double").alias("v"),
    )


def test_million_row_chunk_equivalence(spark):
    n = 1_000_000
    df = _series(spark, n)
    ck = with_overlap_chunks(
        df, ["k"], ["ord"], bucket=F.col("b"), overlap=20, chunk_size=4096
    )
    w_ck = (
        Window.partitionBy("k", "__chunk").orderBy("__rn").rowsBetween(-20, -1)
    )
    got = (
        ck.select(
            "k",
            "ord",
            F.count(F.lit(1)).over(w_ck).alias("n20"),
            F.sum("v").over(w_ck).alias("s"),
            "__is_ctx",
        )
        .filter((F.col("n20") == 20) & ~F.col("__is_ctx"))
        .select("k", "ord", "s")
    )
    w_glob = Window.partitionBy("k").orderBy("ord").rowsBetween(-20, -1)
    want = (
        df.select(
            "k",
            "ord",
            F.count(F.lit(1)).over(w_glob).alias("n20"),
            F.sum("v").over(w_glob).alias("s"),
        )
        .filter(F.col("n20") == 20)
        .select("k", "ord", "s")
    )
    assert got.count() == n - 20
    # byte-identical: inner-join on (k, ord) and demand bitwise-equal sums
    # (both plans sum the same 20 doubles in frame order — same result).
    joined = got.alias("g").join(want.alias("w"), ["k", "ord"])
    mismatches = joined.filter(F.col("g.s") != F.col("w.s")).count()
    assert mismatches == 0
    assert joined.count() == n - 20


def test_row_numbers_are_exact_permutation(spark):
    df = _series(spark, 50_000, keys=3)
    ck = with_overlap_chunks(
        df, ["k"], ["ord"], bucket=F.col("b"), overlap=14, chunk_size=4096
    )
    base = ck.filter(~F.col("__is_ctx"))
    per_key = (
        base.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("__rn").alias("dn"),
            F.min("__rn").alias("lo"),
            F.max("__rn").alias("hi"),
        )
        .collect()
    )
    for r in per_key:
        assert r["dn"] == r["n"] and r["lo"] == 1 and r["hi"] == r["n"]
    # __rn must follow the sort order: ord ascending <=> __rn ascending
    bad = (
        base.withColumn(
            "rn2",
            F.row_number().over(Window.partitionBy("k").orderBy("ord")),
        )
        .filter(F.col("rn2") != F.col("__rn"))
        .count()
    )
    assert bad == 0


def test_context_rows_are_exact_chunk_tails(spark):
    s, p = 4096, 14
    df = _series(spark, 50_000, keys=3)
    ck = with_overlap_chunks(
        df, ["k"], ["ord"], bucket=F.col("b"), overlap=p, chunk_size=s
    )
    ctx = ck.filter(F.col("__is_ctx"))
    # every context row sits in the last p slots of its HOME chunk and is
    # assigned to home+1
    bad = ctx.filter(
        ((F.col("__rn") - 1) % s < s - p)
        | (F.col("__chunk") != ((F.col("__rn") - 1) / s).cast("long") + 1)
    ).count()
    assert bad == 0
    # count: per key, one duplicate per overlap slot per full chunk
    n_per_key = 50_000 // 3
    full_chunks = n_per_key // s  # chunks that HAVE a successor
    got = ctx.groupBy("k").count().collect()
    for r in got:
        assert r["count"] == full_chunks * p


def test_overlap_must_be_smaller_than_chunk(spark):
    df = _series(spark, 10)
    with pytest.raises(ValueError, match="overlap"):
        with_overlap_chunks(df, ["k"], ["ord"], F.col("b"), overlap=64, chunk_size=64)


@pytest.mark.parametrize("name", ["w16_bollinger", "w17_rsi"])
def test_window_partitions_by_chunk_not_event_type_alone(spark, name):
    df = entry.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().toString()
    # every RAW-ROW frame window (bounded negative RowFrame: the -20/-13
    # rolling frames and the lag) must carry __chunk next to event_type; a
    # bare PARTITION BY event_type window over raw rows (5-value key) is
    # the 100x single-task-sort regression. The two windows legitimately
    # NOT chunked — the per-(event_type, __bucket) row_number and the
    # bucket-count prefix sum — have unbounded-preceding frames and run
    # over bucket-level rows, so the "RowFrame, -" filter skips them.
    import re

    specs = re.findall(r"windowspecdefinition\((.*?)\)\)", plan)
    frame_specs = [
        s for s in specs if "event_type" in s and "RowFrame, -" in s
    ]
    assert frame_specs, f"{name}: no bounded-frame event_type window in plan"
    for s in frame_specs:
        assert "__chunk" in s, f"{name}: window partitions by event_type alone: {s}"


def test_multi_chunk_split_at_runtime(spark):
    # one key, > chunk_size rows -> the carrier must actually split
    df = _series(spark, 20_000)
    ck = with_overlap_chunks(
        df, ["k"], ["ord"], bucket=F.col("b"), overlap=20, chunk_size=4096
    )
    n_chunks = ck.select("__chunk").distinct().count()
    assert n_chunks == 5  # ceil(20000 / 4096)
