"""Aggregation operators (SURVEY §2.4 A1–A10).

Determinism convention: sums/avgs over floating columns route through
DECIMAL so partial-aggregation order (which differs between Spark's two-phase
hash agg and any single-node oracle) cannot perturb low-order bits. Exactness
here is also what the reference's privacy operators require (SURVEY §7.4.6).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def dec_sum(col, scale: int = 4, out: str = "double") -> Column:
    """Order-independent exact sum of a double column: cast each value to
    DECIMAL(28, scale) (exact for fixture magnitudes), sum exactly, cast back.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(28,{scale})")).cast(out)


def dec_avg(col, scale: int = 4, round_to: int = 6) -> Column:
    """Deterministic mean: exact decimal sum ÷ count, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.sum(c.cast(f"decimal(28,{scale})")).cast("double")
    return F.round(s / F.count(c), round_to)


def conditional_count(cond: Column) -> Column:
    """A2 — ``COUNT(CASE WHEN cond THEN 1 END)``
    (`models/marts/weather_impacts.sql:58-62`, `disaster_analytics.sql:60-72`)."""
    return F.count(F.when(cond, F.lit(1)))


def conditional_flag_max(cond: Column) -> Column:
    """A1 — ``MAX(CASE WHEN cond THEN 1 ELSE 0 END)`` boolean-any flag."""
    return F.max(F.when(cond, F.lit(1)).otherwise(F.lit(0)))


def privacy_threshold_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: list[Column],
    min_group_size: int = 5,
    count_col: str = "group_size",
) -> DataFrame:
    """A4 — privacy-thresholded aggregation.

    ≈ ``GROUP BY county HAVING COUNT(*) >= 5`` with magnitude-dependent
    rounding (`models/public/public_agricultural_data.sql:33-57,80-94`).
    Small groups are suppressed entirely — this is a compliance semantic and
    must stay exact at any scale (no approximate counts here).
    """
    out = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias(count_col), *aggs)
    return out.filter(F.col(count_col) >= min_group_size)


def privacy_round(col, magnitude: int = -3) -> Column:
    """A4 — privacy rounding ``ROUND(x, -3/-4/-5)``
    (`public_agricultural_data.sql:80-94`). Routed through decimal so the
    HALF_UP boundary behaves identically everywhere."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("decimal(28,4)"), magnitude).cast("double")


def union_of_aggregates(frames: list[DataFrame]) -> DataFrame:
    """A6/U2 — stack per-source aggregate rows.

    ≈ the UNION ALL quality scan (`models/metrics/data_quality_metrics.sql:7-121`).
    """
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)


def windowed_agg(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    window_duration: str,
    aggs: dict[str, Column],
) -> DataFrame:
    """A7 — generic config-driven aggregation with a time bucket.

    ≈ `ops/data_processing_ops.py:221-283`: groupby fields + agg dict +
    ``dt.floor(window)`` bucket + record_count. Uses ``window()`` so the same
    shape serves batch and Structured Streaming.
    """
    exprs = [v.alias(k) for k, v in aggs.items()] + [F.count(F.lit(1)).alias("record_count")]
    return (
        df.groupBy(*group_cols, F.window(F.col(ts_col), window_duration).alias("time_window"))
        .agg(*exprs)
        .withColumn("window_start", F.col("time_window.start"))
        .withColumn("window_end", F.col("time_window.end"))
        .drop("time_window")
    )


def basket_association_rules(
    df: DataFrame,
    basket_cols: list[str],
    item_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Pairwise association rules (support / confidence / lift) over
    baskets — the market-basket co-occurrence miner, here asking "which
    event types fire together for the same user on the same day".

    Scale shape: one distinct() collapses the corpus to (basket, item)
    rows; item supports are a hash-agg; the pair join is a self-join ON
    THE BASKET KEY, so its blow-up is quadratic only in items-per-basket
    (bounded by the item vocabulary, e.g. ~10 event types), never in
    baskets. Supports broadcast onto the pair frame (item-vocabulary
    cardinality). All three metrics stay in the oracle's exact operand
    order: counts are bigint; each ratio is a single double division
    rounded to 6 dp. Top-k by (lift DESC, antecedent, consequent) — a
    total order, so the cut is engine-deterministic.
    """
    items = df.select(
        *[F.col(c) for c in basket_cols], F.col(item_col).alias("__it")
    ).distinct()
    n_baskets = items.select(*basket_cols).distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_baskets")
    )
    supp = items.groupBy(F.col("__it").alias("it")).agg(
        F.count(F.lit(1)).cast("bigint").alias("it_cnt")
    )
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in basket_cols]
    pairs = (
        items.alias("a")
        .join(items.alias("b"), cond)
        .filter(F.col("a.__it") < F.col("b.__it"))
        .groupBy(
            F.col("a.__it").alias("antecedent"),
            F.col("b.__it").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_cnt"))
    )
    ca = supp.select(F.col("it").alias("antecedent"), F.col("it_cnt").alias("ca"))
    cb = supp.select(F.col("it").alias("consequent"), F.col("it_cnt").alias("cb"))
    return (
        pairs.join(F.broadcast(ca), "antecedent")
        .join(F.broadcast(cb), "consequent")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "pair_cnt",
            F.round(F.col("pair_cnt") * 1.0 / F.col("n_baskets"), 6).alias(
                "support"
            ),
            F.round(F.col("pair_cnt") * 1.0 / F.col("ca"), 6).alias("confidence"),
            F.round(
                (F.col("pair_cnt") * F.col("n_baskets") * F.lit(1.0))
                / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "antecedent", "consequent")
        .limit(top_k)
    )
