"""Event-time windows + watermarks (T1/T2/T7).

≈ the documented Flink streaming aggregate: ``TUMBLE(ts, INTERVAL '1' HOUR)``
count by (type, state) (`ReadMe.md:154-163`) with event-time watermarking
(`flink/conf/flink-conf.yml:87-89`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_event_time(df: DataFrame, ts_col: str, watermark: str = "10 minutes") -> DataFrame:
    """T1 — declare event time + allowed lateness."""
    return df.withWatermark(ts_col, watermark)


def tumbling_window_counts(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    group_cols: list[str],
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """T2 — tumbling-window count by group. Works identically on batch and
    streaming frames (same ``window()`` expression), which is how the engine
    unit-tests streaming semantics against the batch oracle."""
    src = df
    if watermark and df.isStreaming:
        src = df.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window_duration).alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).cast("bigint").alias("event_count"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "event_count",
        )
    )


def sliding_window_counts(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    slide_duration: str,
    group_cols: list[str],
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """T2 companion — SLIDING (hopping) window count by group: each event
    lands in window/slide overlapping windows (e.g. 4 for 1h/15m). Same
    batch≡streaming duality as tumbling_window_counts — the identical
    ``window(ts, size, slide)`` expression runs under a watermark on a
    stream and as a plain expand+hash-agg in batch. Scale shape: Spark's
    Expand multiplies rows by the overlap factor BEFORE the map-side
    combine, so the shuffle still carries one row per (window × group ×
    mapper) — the blow-up is bounded by window/slide, a plan constant.
    """
    src = df
    if watermark and df.isStreaming:
        src = df.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.window(F.col(ts_col), window_duration, slide_duration).alias("w"),
            *group_cols,
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("event_count"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "event_count",
        )
    )


def session_window_counts(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: list[str],
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """T2-extension — session (inactivity-gap) windows, the Flink
    ``SESSION(ts, INTERVAL g)`` counterpart of `tumbling_window_counts`.
    Same expression on batch and streaming frames; on streaming the
    watermark bounds session state so closed sessions are evicted.

    Spark merges an event into the open session while it lands strictly
    BEFORE prev_ts + gap; the emitted window end is last_ts + gap. The
    batch oracle twin (`st_session_window`) replicates exactly that
    convention.
    """
    src = df
    if watermark and df.isStreaming:
        src = df.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).cast("bigint").alias("event_count"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *group_cols,
            "event_count",
        )
    )
