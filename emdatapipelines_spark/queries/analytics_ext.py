"""Warehouse-analytics extensions: gaps-and-islands streaks, NTILE decile
profiling, and weekly retention cohorts.

The reference's dashboards consume per-entity activity rollups
(``ops/public_ops.py`` builds usage/latency summaries for Grafana panels);
these queries are the standard analytic shapes a serving layer over the same
tables needs. Each is expressed as pure DataFrame/window ops — one or two
key-partitioned shuffles, no UDFs — so the plans survive a 100x scale-up:

- ``w8_streak_islands``: per-user consecutive-day streaks via the classic
  day-index-minus-row-number island key. Cost = two window passes over the
  same ``user_id`` partitioning (Catalyst reuses one Exchange) + a final
  per-user agg; no joins.
- ``a16_ntile_deciles``: NTILE(10) per market segment with a total tiebreak
  order (acctbal, custkey) so tile assignment is deterministic, then a
  per-(segment, decile) rollup — a single hash partition on segment.
- ``a20_retention_cohorts``: cohort = week of first activity; one
  user-partitioned window pass assigns every active week its cohort, then a
  (cohort, offset) count-distinct. Window-over-join avoids a second
  fact-to-dim shuffle of the user spine.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .registry import dsum, query, t


@query(
    "w8_streak_islands",
    """
    WITH days AS (
      SELECT DISTINCT user_id,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx
      FROM events
    ), islands AS (
      SELECT user_id, day_idx,
             day_idx - ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY day_idx) AS island
      FROM days
    ), streaks AS (
      SELECT user_id, island, COUNT(*) AS streak_len
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
           CAST(SUM(streak_len) AS BIGINT) AS n_active_days
    FROM streaks GROUP BY user_id
    ORDER BY longest_streak DESC, user_id LIMIT 100
    """,
)
def w8_streak_islands(spark, sf_dir):
    """Longest consecutive-active-day streak per user (gaps and islands).

    Reference behavior: the activity-monitor sensors
    (`sensors/public_sensors.py`) track per-source continuity of arrivals;
    this is the per-entity generalization. Day index is an integer offset
    from a fixed epoch so the island key (`day_idx - row_number`) stays in
    pure int arithmetic on both engines.
    """
    days = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
                "day_idx"
            ),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_idx")
    islands = days.withColumn("island", F.col("day_idx") - F.row_number().over(w))
    streaks = islands.groupBy("user_id", "island").agg(F.count("*").alias("streak_len"))
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("streak_len").alias("longest_streak"),
            F.sum("streak_len").alias("n_active_days"),
        )
        .orderBy(F.desc("longest_streak"), "user_id")
        .limit(100)
    )


@query(
    "a16_ntile_deciles",
    """
    WITH tiled AS (
      SELECT c_mktsegment, c_acctbal,
             NTILE(10) OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal, c_custkey) AS decile
      FROM customer
    )
    SELECT c_mktsegment, decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(c_acctbal) AS lo,
           MAX(c_acctbal) AS hi,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DECIMAL(28,2))
                AS DOUBLE) AS bal_sum
    FROM tiled GROUP BY c_mktsegment, decile
    ORDER BY c_mktsegment, decile
    """,
)
def a16_ntile_deciles(spark, sf_dir):
    """Account-balance decile profile per market segment.

    NTILE is only deterministic under a total order, so the tile window
    carries the ``c_custkey`` tiebreak — without it two engines may split
    equal balances across adjacent tiles differently. One shuffle on
    segment serves both the window and the rollup.
    """
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    tiled = (
        t(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_acctbal", "c_custkey")
        .withColumn("decile", F.ntile(10).over(w))
    )
    return (
        tiled.groupBy("c_mktsegment", "decile")
        .agg(
            F.count("*").alias("n"),
            F.min("c_acctbal").alias("lo"),
            F.max("c_acctbal").alias("hi"),
            dsum("c_acctbal").alias("bal_sum"),
        )
        .orderBy("c_mktsegment", "decile")
    )


@query(
    "a20_retention_cohorts",
    """
    WITH weeks AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk
      FROM events
    ), cohorted AS (
      SELECT user_id, wk,
             MIN(wk) OVER (PARTITION BY user_id) AS cohort_week
      FROM weeks
    )
    SELECT cohort_week,
           CAST(datediff('day', cohort_week, wk) / 7 AS INT) AS week_no,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
    FROM cohorted
    GROUP BY cohort_week, week_no
    ORDER BY cohort_week, week_no
    """,
)
def a20_retention_cohorts(spark, sf_dir):
    """Weekly retention triangle: users grouped by first-active week, counted
    in each subsequent week they return.

    Scale shape: the cohort week comes from a ``MIN OVER (PARTITION BY
    user_id)`` window on the deduped user-week frame instead of a
    groupBy-then-join back — one shuffle on ``user_id`` instead of two plus
    a join. Both weeks are Monday-truncated dates, so the offset division
    by 7 is exact integer math.
    """
    weeks = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_trunc("week", F.col("ts").cast("date")).cast("date").alias("wk"),
        )
        .distinct()
    )
    cohorted = weeks.withColumn(
        "cohort_week", F.min("wk").over(Window.partitionBy("user_id"))
    )
    return (
        cohorted.groupBy(
            "cohort_week",
            (F.datediff("wk", "cohort_week") / 7).cast("int").alias("week_no"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_no")
    )
