"""Q1 — completeness / whole-frame profiling in one aggregation pass.

≈ `ops/data_quality_ops.py:142-190` (completeness score, per-column null
ratios) and `ops/data_processing_ops.py:388-430` (duplicate counts, null by
column). The pandas version iterates columns over an in-memory frame; here a
single ``agg`` computes every metric in one distributed scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def completeness_profile(df: DataFrame, source_name: str, critical_cols: list[str] | None = None) -> DataFrame:
    """One metrics row: total rows, per-critical-column null counts,
    overall completeness ratio (1 − nulls/cells) across all columns."""
    cols = df.columns
    null_frac_exprs = [F.avg(F.col(c).isNull().cast("int")) for c in cols]
    overall = F.round(F.lit(1.0) - sum(null_frac_exprs) / F.lit(len(cols)), 6)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("row_count"), overall.alias("completeness")]
    for c in critical_cols or []:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"null_{c}"))
    return df.agg(*aggs).select(F.lit(source_name).alias("source_table"), "*")


def column_profile(df: DataFrame, col: str) -> DataFrame:
    """Value-distribution profile of one column (`value_counts` analog,
    `ops/data_quality_ops.py:142-190`)."""
    return df.groupBy(col).agg(F.count(F.lit(1)).cast("bigint").alias("value_count"))
