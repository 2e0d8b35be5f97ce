"""Q1 — completeness / whole-frame profiling in one aggregation pass.

≈ `ops/data_quality_ops.py:142-190` (completeness score, per-column null
ratios) and `ops/data_processing_ops.py:388-430` (duplicate counts, null by
column). The pandas version iterates columns over an in-memory frame; here a
single ``agg`` computes every metric in one distributed scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


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


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Join/shuffle-key skew diagnostic: Gini coefficient, hottest-key
    share, and p99/p50 of the per-key row counts — the numbers that decide
    whether a key needs salting (a17_salted_skew_agg) or AQE skew-join
    before a 100 TB shuffle is attempted.

    Scale shape mirrors the rank-sum AUC: the corpus-rate pass is ONE
    hash-agg to per-key counts; the Gini rank-sum then needs keys sorted
    by count, which is done WITHOUT a key-cardinality window — keys are
    grouped by their count VALUE (the distinct-count frame is bounded by
    max rows-per-key, not key count), the cumulative window runs on that
    frame, and each count value contributes its closed-form rank-block
    sum m·B + m(m+1)/2 in exact bigint arithmetic. The only doubles are
    the final ratios. Keys-with-equal-count are rank-interchangeable, so
    the block formula equals any per-key ranking's sum.
    """
    counts = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    per = counts.groupBy("cnt").agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    w = Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, -1)
    cum = per.withColumn(
        "b", F.coalesce(F.sum("m").over(w), F.lit(0).cast("bigint"))
    )
    tot = cum.agg(
        F.sum("m").cast("bigint").alias("n"),
        F.sum(F.col("m") * F.col("cnt")).cast("bigint").alias("s"),
        F.sum(F.expr("cnt * (m * b + (m * (m + 1)) div 2)"))
        .cast("bigint")
        .alias("t"),
        F.max("cnt").cast("bigint").alias("maxc"),
    )
    q = counts.agg(
        F.percentile("cnt", F.lit(0.5)).alias("p50_cnt"),
        F.percentile("cnt", F.lit(0.99)).alias("p99_cnt"),
    )
    return tot.crossJoin(F.broadcast(q)).select(
        F.col("n").alias("n_keys"),
        F.col("s").alias("total_rows"),
        F.round(
            (F.lit(2) * F.col("t") - (F.col("n") + 1) * F.col("s"))
            * 1.0
            / (F.col("n") * F.col("s")),
            6,
        ).alias("gini"),
        F.round(F.col("maxc") * 1.0 / F.col("s"), 6).alias("top_share"),
        "p50_cnt",
        "p99_cnt",
        F.round(F.col("p99_cnt") / F.col("p50_cnt"), 6).alias("skew_ratio"),
    )
