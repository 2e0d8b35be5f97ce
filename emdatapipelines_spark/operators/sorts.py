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


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """2-D skyline (Pareto frontier, maximize both): keep exactly the rows
    no other row dominates, where ``a`` dominates ``b`` iff ``a.x ≥ b.x ∧
    a.y ≥ b.y`` with at least one strict — the Börzsönyi et al. (ICDE'01)
    skyline operator, the multi-criteria cousin of top-k.

    Window formulation (no self-join): a row is dominated iff
    (1) the max ``y`` among rows with STRICTLY larger ``x`` reaches its
    ``y`` (x-strictness already supplies the required strict edge), or
    (2) a row with the SAME ``x`` has strictly larger ``y``.
    (1) is a range-frame running max over ``x DESC`` excluding the
    current x-value (x must be integral for the value-offset frame);
    (2) is a plain max over the x-partition. Cost: one global sort of
    the (already aggregated, entity-cardinality) frame — for
    corpus-scale inputs, grid-prefilter to the per-cell local skyline
    first (skyline is distributive: the global frontier is a subset of
    the union of cell frontiers), then run this on the bounded union.
    """
    from pyspark.sql import Window

    w_strict = (
        Window.orderBy(F.col(x_col).desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same_x = Window.partitionBy(x_col)
    best_above = F.max(F.col(y_col)).over(w_strict)
    best_same = F.max(F.col(y_col)).over(w_same_x)
    return (
        df.withColumn("__ba", best_above)
        .withColumn("__bs", best_same)
        .filter(
            (F.col("__ba").isNull() | (F.col("__ba") < F.col(y_col)))
            & (F.col("__bs") <= F.col(y_col))
        )
        .drop("__ba", "__bs")
    )
