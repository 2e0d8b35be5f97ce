"""Two-stage aggregation machinery: reusable partials and skew salting.

The reference recomputes its rollups from raw rows on every schedule tick
(`ops/data_processing_ops.py:221-283` re-runs the full groupby; the dbt marts
rebuild whole tables). At 100 TB the standard fix is to keep *mergeable
partial aggregates* at fine grain (day) and re-aggregate to coarser grains
(month, total) from the partials — touching GB of partials instead of TB of
raw rows. Sum/count/min/max are trivially mergeable; avg is derived as
total_sum / total_count at read time, never averaged-of-averages.

``salted_aggregate`` applies the same merge algebra to the skew problem: a
groupBy on a low-cardinality hot key (5 event types across 10^11 rows) puts
each key's entire volume on one reducer. Salting splits stage one into
``key × salt`` partials (even partitions, map-side combine still applies)
and merges the bounded partial set in stage two. The result is byte-identical
to the unsalted groupBy — only the physical distribution changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

def partial_aggregate(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, Column | str],
    scale: int = 2,
) -> DataFrame:
    """Stage one: per-``keys`` mergeable partials for each measure.

    Emits ``<m>_sum`` (exact DECIMAL), ``<m>_min``, ``<m>_max``, ``<m>_n``
    per measure. The decimal sum keeps the partial exactly mergeable — a
    double partial would make the merged total depend on merge order.
    """
    exprs: list[Column] = []
    for name, col in measures.items():
        c = F.col(col) if isinstance(col, str) else col
        d = c.cast(f"decimal(28,{scale})")
        exprs += [
            F.sum(d).alias(f"{name}_sum"),
            F.min(c).alias(f"{name}_min"),
            F.max(c).alias(f"{name}_max"),
            F.count(c).alias(f"{name}_n"),
        ]
    return df.groupBy(*keys).agg(*exprs)


def merge_partials(
    partials: DataFrame, keys: list[str], measures: list[str]
) -> DataFrame:
    """Stage two: roll partials up to the coarser ``keys`` grain.

    sum-of-sums / min-of-mins / max-of-maxes / sum-of-counts, plus the
    derived ``<m>_avg`` = merged sum ÷ merged count (single double division,
    deterministic under any merge order because the sums are decimal-exact).
    """
    exprs: list[Column] = []
    for m in measures:
        total = F.sum(f"{m}_sum")
        n = F.sum(f"{m}_n")
        exprs += [
            total.cast("double").alias(f"{m}_sum"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
            n.alias(f"{m}_n"),
            (total.cast("double") / n).alias(f"{m}_avg"),
        ]
    return partials.groupBy(*keys).agg(*exprs)


def combine_partials(
    frames: list[DataFrame], keys: list[str], measures: list[str]
) -> DataFrame:
    """Merge several partial frames into one, STAYING in partial format
    (decimal sums, no derived avg) so the result remains mergeable — this is
    the maintenance operation for an incrementally-kept rollup: stored
    partials ∪ new batch partials → combined partials.

    Sum precision is pinned to DECIMAL(38, scale-of-input) so repeated
    combines keep a stable schema across snapshot round-trips.
    """
    from functools import reduce

    union = reduce(lambda a, b: a.unionByName(b), frames)
    exprs: list[Column] = []
    for m in measures:
        scale = union.schema[f"{m}_sum"].dataType.scale
        exprs += [
            F.sum(f"{m}_sum").cast(f"decimal(38,{scale})").alias(f"{m}_sum"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
            F.sum(f"{m}_n").alias(f"{m}_n"),
        ]
    return union.groupBy(*keys).agg(*exprs)


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    measures: dict[str, Column | str],
    salt_col: Column,
    salt_buckets: int = 16,
    scale: int = 2,
) -> DataFrame:
    """Skew-safe groupBy: aggregate on (keys, salt) then merge per keys.

    ``salt_col`` must be deterministic (e.g. ``pmod(col('id'), 16)``) so the
    plan is stable, but the OUTPUT is invariant to the salt entirely — the
    merge algebra guarantees the same totals as a direct groupBy. Stage one
    spreads each hot key over ``salt_buckets`` partitions; stage two shuffles
    only ``|keys| × salt_buckets`` partial rows.
    """
    salted = df.withColumn("__salt", F.pmod(salt_col, F.lit(salt_buckets)))
    partials = partial_aggregate(salted, key_cols + ["__salt"], measures, scale)
    return merge_partials(partials, key_cols, list(measures)).drop("__salt")


def hll_partial(
    df: DataFrame, keys: list[str], col: str, lg_k: int = 12, out: str = "sketch"
) -> DataFrame:
    """Per-``keys`` HyperLogLog sketch of ``col`` (Apache DataSketches HLL,
    Spark-native `hll_sketch_agg`). The approximate member of the mergeable
    -partials family: a COUNT(DISTINCT) cannot be merged across grains, but
    its sketch can — the union of daily sketches serves the monthly grain.
    Estimates are deterministic for a fixed merge tree but can differ by a
    fraction of a percent across DIFFERENT merge trees (sparse→dense
    promotion happens at different points), so the serving contract is
    "always serve a grain from the same partials"; error stays within the
    sketch's own ±~1.6% at lg_k=12 under any tree.

    At 100 TB this replaces the expand+double-shuffle exact distinct with a
    fixed 2^lg_k-byte state per group, map-side combined.
    """
    return df.groupBy(*keys).agg(F.hll_sketch_agg(col, F.lit(lg_k)).alias(out))


def hll_merge(
    partials: DataFrame, keys: list[str], sketch_col: str = "sketch", out: str = "approx_distinct"
) -> DataFrame:
    """Roll sketch partials up to coarser ``keys``: union the sketches, then
    estimate. Deterministic for a fixed partial layout (verified by unit
    test), which is what makes stored sketch partials a valid serving layer
    for any grain ≥ the partial grain."""
    return partials.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(out)
    )


def histogram_partial(
    df: DataFrame,
    keys: list[str],
    col: str,
    lo: float,
    hi: float,
    nbins: int = 64,
    out: str = "bin",
) -> DataFrame:
    """Fixed-bin histogram partials per group: long-form ``(keys..., bin,
    bin_count)`` rows, clamped to ``[lo, hi)`` edge bins. The quantile member
    of the mergeable-partials family (exact sums `partial_aggregate`, HLL
    distincts `hll_partial`): bin counts merge across grains by plain
    addition, so daily partials serve weekly/monthly percentiles without
    re-scanning raw data — and unlike a sketch, the merged result is a
    DETERMINISTIC function of the counts, hence oracle-checkable.

    At 100 TB: state per group is ≤ nbins longs, the aggregation is a
    map-side-combined count, and serving any coarser grain reads
    |groups|·nbins partial rows instead of the fact table.
    """
    width = (hi - lo) / nbins
    b = F.floor((F.col(col) - F.lit(lo)) / F.lit(width)).cast("int")
    clamped = F.least(F.greatest(b, F.lit(0)), F.lit(nbins - 1))
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(*keys, clamped.alias(out))
        .agg(F.count(F.lit(1)).alias("bin_count"))
    )


def quantiles_from_histogram(
    partials: DataFrame,
    keys: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    nbins: int = 64,
    bin_col: str = "bin",
) -> DataFrame:
    """Interpolated quantile estimates from (possibly multi-grain-merged)
    histogram partials: per key and quantile q, locate the first bin whose
    cumulative count reaches ``q * total`` and interpolate linearly inside
    it. One window cumsum over ≤ nbins rows per group, then a tiny
    aggregate — never touches raw rows. Output: one row per key with a
    ``p{q}`` column per requested quantile, rounded to 6 dp (integer counts
    in, so the arithmetic is engine-deterministic).
    """
    width = (hi - lo) / nbins
    merged = partials.groupBy(*keys, bin_col).agg(
        F.sum("bin_count").alias("n")
    )
    w = Window.partitionBy(*keys).orderBy(bin_col)
    cum = merged.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(Window.partitionBy(*keys))
    )
    aggs = []
    for q in qs:
        target = F.lit(q) * F.col("total")
        # exactly ONE bin contains the target rank: the first whose
        # cumulative count reaches it AND whose predecessor cumulative was
        # still short of it — without the second conjunct every later bin
        # also matches and its (negative-fraction) interpolation poisons the
        # aggregate. min() then just extracts the single qualifying value.
        in_bin = (F.col("cum") >= target) & ((F.col("cum") - F.col("n")) < target)
        est = F.when(
            in_bin,
            F.lit(lo)
            + (
                F.col(bin_col)
                + (target - (F.col("cum") - F.col("n"))) / F.col("n")
            )
            * F.lit(width),
        )
        name = f"p{str(q).replace('0.', '').ljust(2, '0')}"
        aggs.append(F.round(F.min(est), 6).alias(name))
    return cum.groupBy(*keys).agg(*aggs)
