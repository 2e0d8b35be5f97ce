"""Q2/Q3/Q5 — accuracy, consistency and validity checks.

≈ `ops/data_quality_ops.py:193-326,368-426` and the declarative rule configs
in `config/validation_schemas.py:9-264`. Statistical checks compute moments
via exact decimal sums (deterministic under distributed partial aggregation)
and never collect raw data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _dec(c: Column, scale: int = 6) -> Column:
    return c.cast(f"decimal(38,{scale})")


def accuracy_outlier_count(df: DataFrame, col: str, z_threshold: float = 3.0) -> DataFrame:
    """Q2 — count of |z| > threshold outliers.

    ≈ z-score outlier detection (`ops/data_quality_ops.py:193-266`). Mean and
    sample variance are derived from exact sums (Σx, Σx², n) so the result is
    identical regardless of partitioning: var = (Σx² − (Σx)²/n)/(n−1).
    """
    c = F.col(col)
    stats = df.agg(
        F.sum(_dec(c)).cast("double").alias("s"),
        F.sum(_dec(c * c, 4)).cast("double").alias("ss"),
        F.count(c).cast("double").alias("n"),
    )
    enriched = df.crossJoin(F.broadcast(stats))
    mean = F.col("s") / F.col("n")
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    z = (c - mean) / F.sqrt(var)
    return enriched.agg(
        F.sum((F.abs(z) > z_threshold).cast("bigint")).alias("outlier_count"),
        F.count(c).cast("bigint").alias("checked_count"),
    )


def consistency_checks(
    df: DataFrame,
    key_cols: list[str],
    ordered_pairs: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Q3 — duplicate ratio + temporal-ordering violations.

    ≈ `ops/data_quality_ops.py:269-326`: duplicate count over key columns,
    begin≤end / effective≤expires pair violations. One pass for the pair
    predicates + one keyed aggregation for duplicates.
    """
    total = F.count(F.lit(1))
    aggs = [total.cast("bigint").alias("row_count")]
    for lo, hi in ordered_pairs or []:
        bad = (F.col(lo) > F.col(hi)) & F.col(lo).isNotNull() & F.col(hi).isNotNull()
        aggs.append(F.sum(bad.cast("bigint")).alias(f"violations_{lo}_gt_{hi}"))
    base = df.agg(*aggs)
    dupes = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") - 1).cast("bigint").alias("duplicate_rows"))
        .select(F.coalesce(F.col("duplicate_rows"), F.lit(0)).alias("duplicate_rows"))
    )
    return base.crossJoin(dupes)


def validity_checks(df: DataFrame, rules: dict[str, dict]) -> DataFrame:
    """Q5 — declarative business-rule engine.

    ``rules`` maps column → rule dict with any of ``pattern`` (regex must
    match), ``enum`` (accepted values), ``min``/``max`` (range), matching the
    shapes in `config/validation_schemas.py:34-66,97-132,164-250` (disaster
    number ``^\\d{4,5}$``, severity enums, lat/lon bounds, non-negative
    money). Output: one row with a violation count per rule.
    """
    aggs: list[Column] = [F.count(F.lit(1)).cast("bigint").alias("row_count")]
    for col, rule in rules.items():
        c = F.col(col)
        if "pattern" in rule:
            bad = c.isNotNull() & ~c.rlike(rule["pattern"])
            aggs.append(F.sum(bad.cast("bigint")).alias(f"bad_pattern_{col}"))
        if "enum" in rule:
            bad = c.isNotNull() & ~c.isin(list(rule["enum"]))
            aggs.append(F.sum(bad.cast("bigint")).alias(f"bad_enum_{col}"))
        if "min" in rule or "max" in rule:
            lo = rule.get("min", float("-inf"))
            hi = rule.get("max", float("inf"))
            bad = c.isNotNull() & ~c.between(lo, hi)
            aggs.append(F.sum(bad.cast("bigint")).alias(f"bad_range_{col}"))
    return df.agg(*aggs)
