"""with_global_index / exact_ntile (VERDICT r9 #1): the distributed
two-phase replacement for partition-less windows must be BYTE-IDENTICAL to
the single-task ``Window.orderBy(...)`` forms it replaces — global row
number, exclusive running sums, and SQL-standard NTILE — while never
funneling the corpus through one task, and must keep NULL bucket /
partition keys (the r9 ADVICE null-drop gap in the offsets equi-join).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from emdatapipelines_spark.llmdata.sampling import (
    hash_shuffle_order,
    pack_sequences_plan,
)
from emdatapipelines_spark.operators.windows import (
    exact_ntile,
    with_global_index,
    with_overlap_chunks,
)


def _docs(spark, n=20_000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).cast("int").alias("toks"),
        F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias("source"),
    )


def test_global_index_matches_partitionless_row_number(spark):
    d = _docs(spark).withColumn(
        "h", F.md5(F.concat(F.lit("x"), F.col("doc_id").cast("string")))
    )
    naive = d.withColumn(
        "rn", F.row_number().over(Window.orderBy("h", "doc_id")).cast("long")
    )
    dev = with_global_index(
        d, [F.col("h").asc(), F.col("doc_id").asc()], F.substring("h", 1, 2), out="rn"
    )
    assert (
        naive.select("doc_id", "rn").exceptAll(dev.select("doc_id", "rn")).count() == 0
    )
    assert dev.count() == naive.count()


def test_shuffle_order_byte_identical_to_single_window(spark):
    d = _docs(spark, 30_000)
    h = F.md5(F.concat(F.lit("emdp"), F.col("doc_id").cast("string")))
    naive = d.withColumn(
        "shuffle_rank",
        F.row_number().over(Window.orderBy(h.asc(), F.col("doc_id").asc())).cast("bigint"),
    ).select("doc_id", "shuffle_rank")
    dev = hash_shuffle_order(d, "doc_id").select("doc_id", "shuffle_rank")
    assert naive.exceptAll(dev).count() == 0 and dev.count() == naive.count()


def test_pack_plan_byte_identical_to_single_window(spark):
    d = _docs(spark, 30_000)
    w = Window.orderBy(F.col("doc_id").asc()).rowsBetween(Window.unboundedPreceding, -1)
    naive = d.withColumn(
        "pack_id",
        F.floor(F.coalesce(F.sum("toks").over(w), F.lit(0)) / F.lit(2048)).cast("bigint"),
    ).select("doc_id", "pack_id")
    dev = pack_sequences_plan(d, "toks", budget=2048, order_col="doc_id").select(
        "doc_id", "pack_id"
    )
    assert naive.exceptAll(dev).count() == 0 and dev.count() == naive.count()


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (4, 4), (17, 4), (100, 3), (101, 7)])
def test_exact_ntile_matches_spark_ntile(spark, n, k):
    """SQL-standard tile sizing: first n%k tiles get one extra row — the
    formula must agree with Spark's own NTILE at every (n, k) shape,
    including n < k (one row per tile, trailing tiles empty)."""
    d = spark.range(n).select(F.col("id").alias("v"))
    naive = d.withColumn("t", F.ntile(k).over(Window.orderBy("v")))
    dev = with_global_index(
        d, [F.col("v").asc()], F.expr("v div 7"), out="rn", total_col="n"
    ).select("v", exact_ntile("rn", "n", k).alias("t"))
    assert naive.exceptAll(dev).count() == 0 and dev.count() == n


def test_null_bucket_and_partition_keys_survive(spark):
    """ADVICE r9: the offsets join must be null-safe — null-keyed rows
    grouped by groupBy must not vanish in the equi-join back. NULLs sort
    first (NULLS FIRST), matching the single-window order."""
    rows = [(None, None), (None, 5), ("a", 1), ("a", None), ("a", 2), ("b", 9)]
    d = spark.createDataFrame(rows, "k string, v int")
    out = with_global_index(
        d, [F.col("v").asc_nulls_first()], F.col("v"), partition_cols=["k"], out="rn"
    )
    assert out.count() == len(rows)
    got = {(r["k"], r["v"]): r["rn"] for r in out.collect()}
    # per-partition ranks, NULL v first
    assert got[("a", None)] == 1 and got[("a", 1)] == 2 and got[("a", 2)] == 3
    assert got[(None, None)] == 1 and got[(None, 5)] == 2
    assert got[("b", 9)] == 1


def test_carry_sums_are_exclusive_prefix_sums(spark):
    d = _docs(spark, 5_000)
    w = Window.orderBy(F.col("doc_id").asc()).rowsBetween(Window.unboundedPreceding, -1)
    naive = d.withColumn("s", F.coalesce(F.sum("toks").over(w), F.lit(0))).select(
        "doc_id", "s"
    )
    dev = with_global_index(
        d,
        [F.col("doc_id").asc()],
        F.expr("doc_id div 512"),
        carry_sums={"s": F.col("toks")},
    ).select("doc_id", "s")
    assert naive.exceptAll(dev).count() == 0


def test_overlap_chunks_non_power_of_two_chunk_size(spark):
    """ADVICE r9: chunk/home assignment now uses integer div — the
    carrier must stay an exact permutation for chunk sizes where float
    division could round across a boundary."""
    d = spark.range(10_007).select(
        F.lit("k").alias("k"),
        F.col("id").alias("ord"),
        F.expr("id div 1000").alias("b"),
    )
    ck = with_overlap_chunks(d, ["k"], ["ord"], F.col("b"), overlap=7, chunk_size=997)
    real = ck.filter(~F.col("__is_ctx"))
    assert real.count() == 10_007
    # __rn is a 1..n permutation and each row's chunk is (rn-1) div 997
    bad = real.filter(F.col("__chunk") != F.expr("(__rn - 1) div 997")).count()
    assert bad == 0
    rn = real.agg(
        F.min("__rn"), F.max("__rn"), F.countDistinct("__rn")
    ).first()
    assert tuple(rn) == (1, 10_007, 10_007)
