"""Stream-stream interval (time-bounded) joins.

The reference correlates its Kafka topics downstream in StarRocks after
landing (`ReadMe.md:154-163` routes streams through Flink into tables and
joins there); Structured Streaming can express the correlation online: both
sides watermarked, joined on an equi key plus an event-time interval. State
is bounded by (watermark + interval) — Spark evicts buffered rows older
than the watermark minus the join range, so executor state does NOT grow
with stream length; that is the property that makes this viable on an
unbounded 100 TB/day stream.

The same expression runs on batch frames (watermarks become no-ops), which
is how the oracle-checked batch twin (`j10_click_to_purchase`) and the
streaming-equality test share one definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    *,
    lower: str = "2 hours",
    upper: str = "0 seconds",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join rows with equal ``key`` where
    ``left_ts - lower < right_ts <= left_ts + upper``.

    Column name collisions must be resolved by the caller (alias/rename
    before the join). On streaming inputs both sides are watermarked —
    required for state eviction in stream-stream joins.
    """
    l, r = left, right
    if l.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    lk, rk = f"__lk_{key}", key
    l = l.withColumnRenamed(key, lk)
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(right_ts) > F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    # the right side's key is redundant after the equi match (and NULL on
    # left-outer misses) — keep the left copy under the original name
    return l.join(r, cond, how).drop(rk).withColumnRenamed(lk, key)
