"""Deterministic stratified sampling for training-mix construction.

Large-scale training-data pipelines need per-stratum (language / source /
quality-band) down-sampling that is (a) reproducible across runs and engines,
(b) shuffle-free, and (c) stable under re-partitioning — properties a seeded
RNG sample (``df.sampleBy``) cannot give across engines because the RNG stream
depends on partition layout.

The scheme here is the standard hash-mod sampler: bucket each row into a
65536-slot space via the first four hex chars of ``md5(key)`` and keep the row
when the bucket falls below ``fraction * 65536``.  Because lowercase hex sorts
lexicographically in numeric order, the comparison is a plain string ``<``
against a 4-hex-digit threshold — identical in Spark, DuckDB, or any ANSI SQL
engine, which makes the sample oracle-verifiable row-for-row.

At 100 TB this is a narrow-dependency map over the scan (no shuffle, no seed
coordination between executors); the md5 is whole-stage-codegen'd JVM-side.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket_threshold(fraction: float) -> str:
    """4-hex-digit threshold t such that P[substr(md5(k),1,4) < t] ≈ fraction."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return "g"  # sorts above every hex string → keep all rows
    bucket = int(round(fraction * 65536))
    if bucket >= 65536:
        # fractions in ~[0.9999924, 1.0) round to 65536, which would format
        # to the 5-char '10000' and lexicographically keep only '0…' hashes
        return "g"
    return format(bucket, "04x")


def _keep_condition(key: Column, threshold: str) -> Column:
    return F.substring(F.md5(key.cast("string")), 1, 4) < F.lit(threshold)


def hash_stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str,
) -> DataFrame:
    """Keep each stratum at its configured fraction, deterministically.

    Strata absent from ``fractions`` are dropped (same contract as
    ``DataFrame.sampleBy``). ``key_col`` should be a stable unique id so the
    decision for a row never changes across runs or engines.
    """
    cond = F.lit(False)
    for stratum, fraction in fractions.items():
        cond = F.when(
            F.col(strata_col) == F.lit(stratum),
            _keep_condition(F.col(key_col), hash_bucket_threshold(fraction)),
        ).otherwise(cond)
    return df.filter(cond)


def hash_sample_sql_predicate(key_sql: str, fraction: float) -> str:
    """The equivalent ANSI-SQL predicate (for oracle parity / documentation)."""
    return f"substring(md5(CAST({key_sql} AS VARCHAR)), 1, 4) < '{hash_bucket_threshold(fraction)}'"


def stratified_topk_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    key_col: str,
    seed: str = "emdp",
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, deterministically:
    rank rows within each stratum by ``md5(seed || key)`` (a reproducible
    per-stratum permutation — the hash-order analog of a uniform draw) and
    keep rank ≤ k. Unlike fraction sampling this guarantees the per-stratum
    COUNT — what an eval-set or few-shot-pool builder actually needs.

    Scale shape: the ``row_number() ≤ k`` filter compiles to Spark's
    WindowGroupLimit rewrite — each input partition pre-prunes to its local
    top-k per stratum BEFORE the exchange, so the shuffle carries at most
    k·partitions rows per stratum, never the full stratum (guarded in
    tests/test_physical_plans.py with the other rank-filter queries).
    Change ``seed`` for an independent re-draw.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def hash_shuffle_order(
    df: DataFrame, key_col: str, seed: str = "emdp", out: str = "shuffle_rank"
) -> DataFrame:
    """Deterministic global shuffle for training-data export: rank every row
    by ``md5(seed || key)`` — a reproducible, engine-portable permutation
    (same hash-ordering trick as the sampler; a seeded RNG shuffle is neither
    stable across engines nor across partition layouts). Change ``seed`` to
    get an independent epoch permutation.

    Scale shape: one global sort — a range-partitioned shuffle, the same cost
    Spark pays for any ORDER BY write. At 100 TB you'd write
    ``sortWithinPartitions`` after ``repartition(n, hash)`` instead to skip
    the global range exchange; the total order here is what makes the result
    oracle-checkable row-for-row.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    w = Window.orderBy(h.asc(), F.col(key_col).asc())
    return df.withColumn(out, F.row_number().over(w).cast("bigint"))


def pack_sequences_plan(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_col: str,
    out: str = "pack_id",
) -> DataFrame:
    """Deterministic sequence-packing plan for training export: documents are
    laid out in ``order_col`` order and cut into packs of ~``budget`` tokens
    by cumulative token count (``pack_id = floor(tokens_before / budget)``).

    This is the streaming-concat packing layout (documents may straddle a
    boundary and continue in the next pack — the standard pretraining
    treatment), not per-pack greedy bin-packing, which is inherently
    sequential. The plan is one global sort (range-partitioned shuffle, the
    ORDER BY cost any deterministic export pays) + a running-sum window; at
    100 TB, pre-bucketing by a hash of ``order_col`` and packing within
    buckets removes the global exchange at the cost of cross-bucket pack
    boundaries.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.col(order_col).asc()).rowsBetween(Window.unboundedPreceding, -1)
    tokens_before = F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0))
    return df.withColumn(out, F.floor(tokens_before / F.lit(budget)).cast("bigint"))
