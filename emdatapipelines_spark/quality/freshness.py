"""Q4/Q11 — timeliness / freshness SLAs.

≈ `ops/data_quality_ops.py:329-365,429-511` and the dbt source freshness
tiers (`models/sources/sources.yml:11-13` + per-source overrides; sensors at
`sensors/data_sensors.py:33-40`): age of ``max(ingestion_timestamp)`` vs
warn/error thresholds per source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..clock import DEFAULT_CLOCK, Clock

#: per-source max-age SLAs in minutes (warn, error) — NOAA 15 min … USDA 24 h
#: (`sensors/data_sensors.py:33-40`; dbt `sources.yml:31-33,128-130,230-232,321-324`).
DEFAULT_SLAS = {
    "noaa": (15, 120),
    "coagmet": (60, 180),
    "fema": (360, 1440),
    "usda": (1440, 4320),
}


def freshness_check(
    df: DataFrame,
    ts_col: str,
    source_name: str,
    warn_minutes: int,
    error_minutes: int,
    clock: Clock = DEFAULT_CLOCK,
) -> DataFrame:
    """One row: max timestamp, age in minutes vs the pinned clock, and a
    PASS/WARN/ERROR status band."""
    agg = df.agg(F.max(F.col(ts_col)).alias("latest_ts"))
    age_min = F.floor(
        (F.unix_timestamp(F.to_timestamp(F.lit(clock.iso_ts()))) - F.unix_timestamp(F.col("latest_ts"))) / 60
    ).cast("bigint")
    return agg.select(
        F.lit(source_name).alias("source_name"),
        F.col("latest_ts"),
        age_min.alias("age_minutes"),
        F.when(age_min > error_minutes, F.lit("ERROR"))
        .when(age_min > warn_minutes, F.lit("WARN"))
        .otherwise(F.lit("PASS"))
        .alias("freshness_status"),
    )
