"""Window-function operators (SURVEY §2.5 W1–W5).

All windows partition by a business key, so at scale each partition's state
fits one task; no global ordering is ever required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec, functions as F


def keyed_window(partition_cols: list[str], order_cols: list) -> WindowSpec:
    return Window.partitionBy(*partition_cols).orderBy(*order_cols)


def lag_over(col, partition_cols: list[str], order_cols: list, offset: int = 1) -> Column:
    """W1 — ``LAG(x, 1) OVER (PARTITION BY ... ORDER BY ...)`` for
    year-over-year trends (`models/marts/disaster_analytics.sql:108-111`)."""
    return F.lag(col, offset).over(keyed_window(partition_cols, order_cols))


def lead_over(col, partition_cols: list[str], order_cols: list, offset: int = 1) -> Column:
    """W5 — ``shift(-1)`` targets: next event date / severity
    (`assets/ml_assets.py:146-151`)."""
    return F.lead(col, offset).over(keyed_window(partition_cols, order_cols))


def trend_label(pct_change: Column, up: float = 10.0, down: float = -10.0) -> Column:
    """INCREASING / DECREASING / STABLE banding of a YoY % change
    (`disaster_analytics.sql:143-158`)."""
    return (
        F.when(pct_change > up, F.lit("INCREASING"))
        .when(pct_change < down, F.lit("DECREASING"))
        .when(pct_change.isNotNull(), F.lit("STABLE"))
    )


def rolling_time_count(
    df: DataFrame,
    partition_cols: list[str],
    ts_col: str,
    days: int,
    out_col: str = "rolling_count",
    exclude_current: bool = True,
) -> DataFrame:
    """W3 — trailing time-range rolling count.

    ≈ pandas ``rolling(window='30D').count() - 1`` per source
    (`assets/ml_assets.py:81-83`): events in the prior ``days`` window,
    excluding the current row. Implemented as a RANGE frame over epoch
    seconds — a true time-range frame, not a row frame.
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.unix_timestamp(F.col(ts_col)))
        .rangeBetween(-days * 86400, 0)
    )
    cnt = F.count(F.lit(1)).over(w)
    if exclude_current:
        cnt = cnt - 1
    return df.withColumn(out_col, cnt)


def trailing_mean(
    df: DataFrame,
    value_col: str,
    partition_cols: list[str],
    order_cols: list,
    n_rows: int = 5,
    out_col: str = "trailing_mean",
) -> DataFrame:
    """W4 — shifted trailing mean ``rolling(5, min_periods=1).mean().shift(1)``
    (`assets/ml_assets.py:86-88`): mean of the previous ``n_rows`` rows,
    current row excluded. ``order_cols`` must include a unique tiebreaker for
    a deterministic ROWS frame.
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(-n_rows, -1)
    )
    return df.withColumn(out_col, F.avg(F.col(value_col)).over(w))


def row_number_code(partition_cols: list[str], order_cols: list) -> Column:
    """W2 — ``ROW_NUMBER()`` sequence for public-code generation
    (`models/public/public_disasters.sql:44`)."""
    return F.row_number().over(keyed_window(partition_cols, order_cols))


def grouped_ewma(
    df: DataFrame,
    value_col: str,
    partition_cols: list[str],
    order_cols: list,
    alpha: float = 0.2,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-group exponentially weighted moving average (final value):
    ``ewma_1 = x_1; ewma_t = alpha*x_t + (1-alpha)*ewma_{t-1}``.

    An EWMA is a sequential recurrence — not expressible as any SQL window
    frame aggregate — but per GROUP it is a plain ordered fold, so the
    Spark-first form is one groupBy building the group's ordered value
    array (``array_sort(collect_list(struct(order, value)))``) followed by
    a row-local ``F.aggregate`` fold: ONE shuffle, no UDF, no iteration.
    Groups must individually fit in memory (true for per-user / per-sensor
    series; for million-row groups chunk by time first and chain the folds —
    the recurrence composes: ewma(chunk2 init=ewma(chunk1))).

    ``order_cols`` must make the order total (include a unique tiebreaker)
    or the fold result is partitioning-dependent. Emits one row per group:
    partition_cols + n_obs + ``out_col`` (rounded to 6).
    """
    ordkey = F.struct(*[F.col(c) if isinstance(c, str) else c for c in order_cols])
    grouped = df.groupBy(*partition_cols).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(ordkey.alias("k"), F.col(value_col).alias("v")))
            ),
            lambda s: s["v"].cast("double"),
        ).alias("__vals"),
        F.count(value_col).alias("n_obs"),
    )
    a = float(alpha)
    fold = F.aggregate(
        F.slice("__vals", 2, F.greatest(F.size("__vals") - 1, F.lit(0))),
        F.element_at("__vals", 1),
        lambda acc, x: F.lit(a) * x + F.lit(1.0 - a) * acc,
    )
    return grouped.select(*partition_cols, "n_obs", F.round(fold, 6).alias(out_col))


def grouped_holt(
    df: DataFrame,
    value_col: str,
    partition_cols: list[str],
    order_cols: list,
    alpha: float = 0.3,
    beta: float = 0.1,
) -> DataFrame:
    """Per-group Holt double exponential smoothing (level + trend), final
    state: ``l_1 = y_1, b_1 = 0``; for t ≥ 2
    ``l_t = α·y_t + (1−α)(l_{t−1}+b_{t−1})``,
    ``b_t = β(l_t − l_{t−1}) + (1−β) b_{t−1}``.
    Emits one row per group: n_obs, level, trend, and the one-step
    forecast ``level + trend`` — the EWMA's trend-aware sibling
    (`grouped_ewma`), same ordered-fold shape.

    The recurrence carries TWO mutually-recursive state components, so the
    fold accumulator is the string-encoded state ``"l|b"`` (the BPE-fold
    trick: a cross-engine fold's accumulator must match the element type,
    and shortest-repr double↔string round-trips exactly in both engines).
    One shuffle (groupBy building the ordered array), no UDF; groups must
    individually fit in memory, and the recurrence composes across time
    chunks exactly as EWMA's does (chain folds with carried (l, b) init).
    """
    a, bt = float(alpha), float(beta)
    ordkey = F.struct(*[F.col(c) if isinstance(c, str) else c for c in order_cols])
    grouped = df.groupBy(*partition_cols).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(ordkey.alias("k"), F.col(value_col).alias("v")))
            ),
            lambda s: s["v"].cast("double"),
        ).alias("__vals"),
        F.count(value_col).alias("n_obs"),
    )
    state0 = F.concat(F.element_at("__vals", 1).cast("string"), F.lit("|0.0"))
    rest = F.slice("__vals", 2, F.greatest(F.size("__vals") - 1, F.lit(0)))

    def step(acc, x):
        parts = F.split(acc, r"\|")
        l_prev = F.element_at(parts, 1).cast("double")
        b_prev = F.element_at(parts, 2).cast("double")
        level = F.lit(a) * x + F.lit(1.0 - a) * (l_prev + b_prev)
        trend = F.lit(bt) * (level - l_prev) + F.lit(1.0 - bt) * b_prev
        return F.concat(level.cast("string"), F.lit("|"), trend.cast("string"))

    folded = F.split(F.aggregate(rest, state0, step), r"\|")
    level = F.element_at(folded, 1).cast("double")
    trend = F.element_at(folded, 2).cast("double")

    def r6(c):
        return F.round(c * F.lit(1000000.0)) / F.lit(1000000.0)

    return grouped.select(
        *partition_cols,
        "n_obs",
        r6(level).alias("level"),
        r6(trend).alias("trend"),
        r6(level + trend).alias("forecast_1"),
    )
