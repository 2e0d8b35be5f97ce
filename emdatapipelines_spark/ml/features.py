"""M1 — feature engineering over the event stream.

≈ `assets/ml_assets.py:47-173`: temporal features, rolling counts, daily
summaries, lead targets — all as window/agg expressions (the pandas
`rolling`/`shift` calls become RANGE/ROWS frames, SURVEY §2.5 W3–W5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..operators.windows import rolling_time_count


def daily_event_features(events: DataFrame, ts_col: str = "ts", type_col: str = "event_type", value_col: str = "value") -> DataFrame:
    """Per (event_type, day): counts, mean/max value, plus temporal features
    (year/month/quarter/day-of-year), a 7-day rolling count, a 5-row trailing
    mean (shifted), and lead targets (next day's count)."""
    daily = (
        events.groupBy(type_col, F.to_date(F.col(ts_col)).alias("event_date"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("event_count"),
            (F.round(F.sum(F.col(value_col).cast("decimal(28,4)")).cast("double") / F.count(F.lit(1)) * F.lit(1000000.0)) / F.lit(1000000.0)).alias("mean_value"),
            F.max(value_col).alias("max_value"),
        )
    )
    feat = (
        daily.withColumn("year", F.year("event_date").cast("int"))
        .withColumn("month", F.month("event_date").cast("int"))
        .withColumn("quarter", F.quarter("event_date").cast("int"))
        .withColumn("day_of_year", F.dayofyear("event_date").cast("int"))
    )
    feat = rolling_time_count(
        feat.withColumn("__ts", F.col("event_date").cast("timestamp")),
        [type_col], "__ts", days=7, out_col="rolling_7d_days", exclude_current=True,
    ).drop("__ts")
    w = Window.partitionBy(type_col).orderBy("event_date")
    feat = feat.withColumn(
        "trailing_mean_count", F.avg("event_count").over(w.rowsBetween(-5, -1))
    ).withColumn("next_day_count", F.lead("event_count", 1).over(w))
    return feat
