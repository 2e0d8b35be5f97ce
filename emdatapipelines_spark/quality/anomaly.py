"""Q6 — anomaly detection over aggregate profiles.

≈ `ops/data_quality_ops.py:519-735`: volume vs baseline min/max, temporal
clustering, geographic concentration, extreme z>4 outliers. All checks
evaluate a small aggregate profile (computed distributed) against a
config-supplied baseline — the raw data is never collected.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class VolumeBaseline:
    min_rows: int
    max_rows: int


def volume_anomaly(df: DataFrame, source: str, baseline: VolumeBaseline) -> DataFrame:
    """Row-volume outside [min, max] baseline (`data_quality_ops.py:540-570`)."""
    n = F.count(F.lit(1))
    return df.agg(n.cast("bigint").alias("row_count")).select(
        F.lit(source).alias("source_name"),
        "row_count",
        F.when(F.col("row_count") < baseline.min_rows, F.lit("VOLUME_LOW"))
        .when(F.col("row_count") > baseline.max_rows, F.lit("VOLUME_HIGH"))
        .otherwise(F.lit("OK"))
        .alias("volume_status"),
    )


def temporal_clustering(df: DataFrame, ts_col: str, spread_minutes: int = 6) -> DataFrame:
    """Suspiciously tight timestamp spread — whole batch within < n minutes
    (`data_quality_ops.py:590-620`)."""
    agg = df.agg(
        F.min(ts_col).alias("min_ts"),
        F.max(ts_col).alias("max_ts"),
        F.count(F.lit(1)).cast("bigint").alias("row_count"),
    )
    spread = (F.unix_timestamp("max_ts") - F.unix_timestamp("min_ts")) / 60
    return agg.select(
        "row_count",
        F.round(spread, 2).alias("spread_minutes"),
        ((spread < spread_minutes) & (F.col("row_count") > 10)).alias("is_clustered"),
    )


def concentration_anomaly(df: DataFrame, dim_col: str, threshold: float = 0.5) -> DataFrame:
    """Geographic/dimensional concentration: one value holding more than
    ``threshold`` of rows (`data_quality_ops.py:630-670`). Two-stage agg —
    no window over the whole table."""
    counts = df.groupBy(dim_col).agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("total"))
    top = counts.orderBy(F.desc("n"), F.asc(dim_col)).limit(1)
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            F.col(dim_col).alias("top_value"),
            F.col("n").cast("bigint").alias("top_count"),
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
        )
        .withColumn("is_concentrated", F.col("share") > threshold)
    )
