"""Gap-based sessionization (batch) — the batch twin of streaming session
windows.

The reference's Flink layer documents event-time windowed aggregation over
the public stream (`ReadMe.md:154-163`); session semantics (variable-length
windows closed by an inactivity gap) are the standard extension Flink spells
``SESSION(ts, INTERVAL g)``. Here it is two window functions + one
aggregate, all sharing ONE hash shuffle on the entity key:

  lag(ts)        -> gap to previous event        (Window user_id ORDER BY ts)
  sum(is_start)  -> running session ordinal      (same window frame)
  groupBy(user_id, session_seq)                  (no new Exchange: hash
                                                  partitioning on user_id
                                                  already clusters every
                                                  (user_id, session_seq)
                                                  group — EnsureRequirements
                                                  accepts the subset)

Gap comparison is done in exact integer microseconds (``unix_micros``), not
float seconds, so boundary behavior is bit-identical to the SQL oracle's
INTERVAL comparison.

At 100 TB: cost is one shuffle of the event stream keyed by entity — the
minimum any per-entity ordering requires. Skewed entities (bot users) are
the classic hazard; AQE skew-join doesn't apply to windows, so pathological
keys should be pre-capped upstream (events_per_user guardrail in the quality
layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MICROS = {"second": 1_000_000, "minute": 60_000_000, "hour": 3_600_000_000}


def _gap_micros(gap: str) -> int:
    qty, unit = gap.split()
    return int(qty) * MICROS[unit.rstrip("s")]


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    order_tiebreak: list[str] | None = None,
    *,
    strict_gt: bool = True,
) -> DataFrame:
    """Tag every row with ``session_seq`` (1-based per entity).

    ``strict_gt=True`` starts a new session only when the gap EXCEEDS the
    threshold (SQL ``> INTERVAL`` convention); ``False`` matches Spark's
    ``session_window`` convention where an event landing exactly at
    ``prev_ts + gap`` opens a new session.
    """
    tie = order_tiebreak or []
    w = Window.partitionBy(entity_col).orderBy(ts_col, *tie)
    gap_us = F.lit(_gap_micros(gap))
    prev = F.lag(ts_col).over(w)
    # defensive cast: unix_micros refuses TIMESTAMP_NTZ (pandas-written
    # parquet under pyspark 4.x); cast is a no-op on TIMESTAMP input
    delta = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
        prev.cast("timestamp")
    )
    opened = (delta > gap_us) if strict_gt else (delta >= gap_us)
    is_start = F.when(prev.isNull() | opened, 1).otherwise(0)
    run = Window.partitionBy(entity_col).orderBy(ts_col, *tie).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_seq", F.sum(is_start).over(run))


def session_stats(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    value_col: str | None = None,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Per-session rollup: start/end/count(+ exact decimal value sum)."""
    tagged = sessionize(df, entity_col, ts_col, gap, order_tiebreak)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(28,2)")).cast("double").alias("session_value")
        )
    return tagged.groupBy(entity_col, "session_seq").agg(*aggs)


def funnel_stages(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    stages: list[str],
) -> DataFrame:
    """Ordered-funnel analysis: how many users reached stage k via a
    strictly-increasing-timestamp path through ``stages``.

    A user counts for stage k when there exist events e_1 < e_2 < ... < e_k
    (by ``ts_col``) with the required types — the standard product-funnel
    semantic (each step must happen AFTER the previous step's first valid
    occurrence; earliest-completion path).

    Scale shape: one hash Exchange on ``user_col`` serves every stage — each
    stage is a conditional-min window over the same partitioning (Catalyst
    plans k Window operators over one shuffle), then a per-user collapse and
    a tiny global count. Compare the join-chain formulation (k shuffles of
    filtered subsets + k joins); at 10^11 events the single-Exchange window
    chain wins on both shuffle volume and plan depth.
    """
    w = Window.partitionBy(user_col)
    out = df.select(user_col, ts_col, event_col)
    prev = None
    reach_cols = []
    for i, stage in enumerate(stages):
        cond = F.col(event_col) == F.lit(stage)
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
        reach = F.min(F.when(cond, F.col(ts_col))).over(w)
        name = f"__t{i}"
        out = out.withColumn(name, reach)
        prev = F.col(name)
        reach_cols.append(name)

    per_user = out.groupBy(user_col).agg(
        *[F.max(c).alias(c) for c in reach_cols]
    )
    counts = per_user.agg(
        *[F.count(c).alias(f"__c{i}") for i, c in enumerate(reach_cols)]
    )
    stack_args = ", ".join(
        f"'{'>'.join(stages[: i + 1])}', __c{i}" for i in range(len(stages))
    )
    return counts.selectExpr(
        f"stack({len(stages)}, {stack_args}) AS (stage, users)"
    )
