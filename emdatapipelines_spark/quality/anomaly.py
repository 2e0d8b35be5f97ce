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


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier profile via median / MAD — the
    heavy-tail-safe twin of the z-score check (`data_quality_ops.py`'s
    extreme-outlier scan, which a single billion-dollar event can blind by
    inflating the mean and stddev; the median/MAD pair has a 50%
    breakdown point). A value is flagged when
    ``|x − median| > k · 1.4826 · MAD`` (1.4826 scales MAD to σ under
    normality, Hampel's rule).

    Three grouped passes, Spark-first: exact per-group median
    (one-buffer `percentile`), deviations via a BROADCAST join of the
    group-cardinality median frame, MAD as the median of deviations, and
    a final conditional count — group keys are dimension-sized
    (event-type-grain), so every join broadcasts and only the
    value-stream aggregations shuffle. At 100 TB swap the exact
    percentiles for `approx_percentile` (documented divergence) to fold
    the three passes into sketch merges; the exact form here is the
    oracle baseline. Both compare operands round to 6 dp so the flag
    predicate is engine-exact.
    """
    med = df.groupBy(*group_cols).agg(
        F.percentile(value_col, F.lit(0.5)).alias("__med")
    )
    dev = df.join(F.broadcast(med), group_cols).withColumn(
        "__ad", F.abs(F.col(value_col) - F.col("__med"))
    )
    mad = dev.groupBy(*group_cols).agg(
        F.percentile("__ad", F.lit(0.5)).alias("__mad")
    )
    flagged = dev.join(F.broadcast(mad), group_cols)
    is_out = F.round(F.col("__ad"), 6) > F.round(
        F.lit(k) * F.lit(1.4826) * F.col("__mad"), 6
    )
    return (
        flagged.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_values"),
            F.round(F.max("__med"), 6).alias("median_value"),
            F.round(F.max("__mad"), 6).alias("mad"),
            # when/otherwise (not a bare cast-sum) so null values count 0,
            # matching SQL's CASE WHEN <unknown> THEN 1 ELSE 0
            F.sum(F.when(is_out, F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("outlier_count"),
        )
        .orderBy(*group_cols)
    )


def theil_sen_trend(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Per-group Theil-Sen trend estimate: the MEDIAN of all pairwise
    daily-mean slopes — the robust-regression sibling of
    :func:`mad_outliers` (a single spiked day can swing an OLS slope
    arbitrarily; Theil-Sen tolerates ~29% contamination). Mirrors the
    reference's trend interest (`dbt .../trend_analysis.sql`'s LAG-based
    deltas) with a breakdown-resistant estimator.

    Scale shape: the corpus-rate pass is ONE hash-agg to the daily grain;
    the pairwise self-join is quadratic only in days-per-group —
    calendar-bounded, independent of corpus row count — and shuffles on
    the group key. Determinism: daily means land in the integer ppm
    domain (the repo's davg trick), each pairwise slope rounds to an
    integer ppm/day (exact-integer diff over an exact-integer day gap is
    ≥ 1/(2·gap) away from any .5 boundary unless exactly on it, where
    both engines round half away from zero), and the median interpolates
    two integers — exact in doubles, no rounding tie possible.
    """
    daily = df.groupBy(
        *group_cols, F.col(ts_col).cast("date").alias("__d")
    ).agg(
        F.round(
            F.sum(F.col(value_col).cast("decimal(28,4)")).cast("double")
            / F.count(F.lit(1))
            * F.lit(1000000.0)
        )
        .cast("bigint")
        .alias("__ppm")
    )
    a, b = daily.alias("a"), daily.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in group_cols]
    pairs = (
        a.join(b, cond)
        .filter(F.col("a.__d") < F.col("b.__d"))
        .select(
            *[F.col(f"a.{c}").alias(c) for c in group_cols],
            F.round(
                (F.col("b.__ppm") - F.col("a.__ppm"))
                * 1.0
                / F.datediff(F.col("b.__d"), F.col("a.__d"))
            )
            .cast("bigint")
            .alias("__slope"),
        )
    )
    n_days = daily.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    return (
        pairs.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.percentile("__slope", F.lit(0.5)).alias("trend_slope_ppm"),
        )
        .join(F.broadcast(n_days), group_cols)
        .select(*group_cols, "n_days", "n_pairs", "trend_slope_ppm")
        .orderBy(*group_cols)
    )
