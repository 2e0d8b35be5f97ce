"""Frequent-item (heavy-hitter) detection with Misra-Gries sketch partials.

An exact "items with frequency share >= s" is one groupBy — but on a
high-cardinality column (URLs, tokens, user ids at 100 TB) the shuffle
carries EVERY distinct item even though only ~1/s can qualify. The classic
fix is the Misra-Gries summary (Misra & Gries 1982; merge analysis in
Agarwal et al., "Mergeable Summaries", PODS 2012): each partition keeps at
most k counters, and merged estimates undercount any item by at most
N/(k+1). Items with true count > N/(k+1) are GUARANTEED to survive — so
with k >= 2/s there are provably no false negatives at threshold s.

``heavy_hitters`` uses the sketch as a PREFILTER, then re-counts the
surviving candidates exactly with a broadcast semi-join. Two passes over
the data, but the shuffle of pass one is <= k rows per partition and pass
two touches only candidate rows — the right trade at scale, and the output
is exact (oracle-verifiable), not an estimate.
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType


def misra_gries_partials(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: at most ``k`` rows
    ``(col, est)`` per partition, plus one ``col IS NULL`` row carrying the
    partition's row count (so the merged frame also yields exact total N).

    Arrow-batched ``mapInPandas`` — the sketch is inherently imperative
    (counter eviction), which is the documented escape hatch; per-batch work
    is one vectorized ``value_counts`` plus an O(k) eviction.

    Summing ``est`` per item across partitions is the mergeable-summaries
    merge: the result undercounts any item's true count by at most
    ``N/(k+1)`` and never overcounts.
    """
    import pandas as pd

    field = df.schema[col]
    out_schema = StructType(
        [StructField(col, field.dataType, True), StructField("est", LongType(), True)]
    )

    def sketch(batches):
        counters: dict = {}
        n = 0
        for pdf in batches:
            n += len(pdf)
            for v, c in pdf[col].value_counts(dropna=True).items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                # Batched eviction: subtracting the (k+1)-th largest count
                # from everything and dropping <=0 is the MG decrement run
                # to convergence; at most k counters stay (strictly-greater
                # survivors of the (k+1)-th order statistic).
                off = heapq.nlargest(k + 1, counters.values())[-1]
                counters = {v: c - off for v, c in counters.items() if c > off}
        yield pd.DataFrame(
            {col: list(counters.keys()) + [None], "est": list(counters.values()) + [n]}
        )

    return df.select(col).mapInPandas(sketch, out_schema)


def merge_mg(partials: DataFrame, col: str) -> tuple[DataFrame, DataFrame]:
    """Merge partition summaries: (per-item merged estimates, 1-row total N)."""
    merged = partials.groupBy(col).agg(F.sum("est").alias("est"))
    totals = merged.filter(F.col(col).isNull()).agg(F.sum("est").alias("total_n"))
    return merged.filter(F.col(col).isNotNull()), totals


def heavy_hitters(
    df: DataFrame, col: str, min_share: float, k: int | None = None
) -> DataFrame:
    """EXACT items with count/N >= ``min_share``, sketch-prefiltered.

    ``k`` defaults to ``ceil(2/min_share)`` so the sketch deficit
    ``N/(k+1) <= min_share*N/2`` — any qualifying item's merged estimate is
    at least ``(min_share/2)*N``, which is the candidate cut. Candidates are
    then counted exactly (semi-join keeps only their rows) and thresholded
    on the true share. Returns (col, cnt, share) — exact values.
    """
    if k is None:
        k = int(2.0 / min_share) + 1
    elif k + 1 <= 1.0 / min_share:
        # deficit bound N/(k+1) >= min_share*N would let a qualifying item
        # be fully evicted from the merged sketch — a silent false negative
        raise ValueError(
            f"k={k} too small for min_share={min_share}: need k+1 > 1/min_share "
            f"(>= {int(1.0 / min_share) + 1}) to preserve the no-false-negative "
            "guarantee; omit k to default to ceil(2/min_share)"
        )
    merged, totals = merge_mg(misra_gries_partials(df, col, k), col)
    cand = (
        merged.crossJoin(F.broadcast(totals))
        .filter(
            F.col("est")
            >= F.lit(min_share) * F.col("total_n") - F.col("total_n") / F.lit(k + 1)
        )
        .select(col)
    )
    return (
        df.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(totals))
        .filter(F.col("cnt") * 1.0 / F.col("total_n") >= F.lit(min_share))
        .select(
            col,
            "cnt",
            F.round(F.col("cnt") * 1.0 / F.col("total_n"), 6).alias("share"),
        )
    )
