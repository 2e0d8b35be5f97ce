"""Sort / limit / top-k operators (SURVEY §2.6 O1–O5)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def case_rank(col, ordering: list[str], default_rank: int | None = None) -> Column:
    """O2 — custom CASE ordering rank: position in ``ordering`` (1-based),
    unknown values last.

    ≈ severity sort Extreme→Severe→Moderate→else
    (`assets/public_assets.py:142-149`, `ops/public_ops.py:108-115`).
    """
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for i, v in enumerate(ordering, start=1):
        expr = F.when(c == v, F.lit(i)) if expr is None else expr.when(c == v, F.lit(i))
    return expr.otherwise(F.lit(default_rank or len(ordering) + 1))


def top_k_by_group(
    df: DataFrame, group_cols: list[str], metric: Column, k: int, metric_name: str = "metric"
) -> DataFrame:
    """O4 — top-k groups by an aggregate metric.

    ≈ ``GROUP BY state ORDER BY disaster_count DESC LIMIT k``
    (`resources/public_resources.py:563-572`). Spark plans this as partial
    agg → shuffle → TakeOrderedAndProject: only k rows ever reach the driver,
    which is the scale-safe shape (never sort-then-collect).
    Ties break on the group columns for determinism.
    """
    agg = df.groupBy(*group_cols).agg(metric.alias(metric_name))
    return agg.orderBy(F.desc(metric_name), *[F.asc(c) for c in group_cols]).limit(k)
