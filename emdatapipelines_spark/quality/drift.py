"""Distribution-drift detection (PSI) between two slices of a table.

The reference's anomaly sensors compare current batch statistics to a
trailing baseline and alert on deviation (`sensors/error_sensors.py` latency
z-checks; `quality/anomaly.py` here covers the point-metric side). PSI —
Population Stability Index, the standard model-monitoring drift score —
covers the *distributional* side: bin a measure, compare the bin shares of a
reference window against a current window, and score
``sum((p_cur - p_ref) * ln(p_cur / p_ref))``.

Conventional read: PSI < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 major.

Scale shape: each side collapses to ``n_bins`` rows via one map-side-combined
count; the join of two bin tables is trivially broadcast. Cost is two scans
of the measure column only (column-pruned at the parquet reader) — no UDFs,
no driver collect. At 100 TB you'd persist per-day bin counts once and PSI
any pair of windows from the partials (see ``operators/reaggregate.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def bin_counts(df: DataFrame, bin_expr: Column, name: str = "bin") -> DataFrame:
    """Per-bin row counts for one slice. ``bin_expr`` must be deterministic
    (e.g. ``floor(col / width)``)."""
    return df.groupBy(bin_expr.alias(name)).agg(F.count(F.lit(1)).alias("n"))


def psi_by_bin(ref: DataFrame, cur: DataFrame, bin_col: str = "bin") -> DataFrame:
    """Per-bin PSI terms from two ``bin_counts`` frames.

    Bins missing on either side carry an undefined ln-ratio; the standard
    practice (and the deterministic one) is an inner join — only bins present
    in both windows contribute. Shares are computed against each side's FULL
    total (including rows in non-shared bins) so a vanishing bin still shifts
    the remaining shares.
    """
    r = ref.withColumn("p_ref", F.col("n") / F.sum("n").over(_whole())).drop("n")
    c = cur.withColumn("p_cur", F.col("n") / F.sum("n").over(_whole())).drop("n")
    joined = r.join(c, bin_col)  # n_bins rows × n_bins rows — broadcast-trivial
    return joined.select(
        bin_col,
        "p_ref",
        "p_cur",
        ((F.col("p_cur") - F.col("p_ref")) * F.log(F.col("p_cur") / F.col("p_ref"))).alias(
            "psi_term"
        ),
    )


def _whole():
    from pyspark.sql import Window

    return Window.partitionBy()


def ks_two_sample(
    df: DataFrame,
    value_col: Column | str,
    group_expr: Column,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the rows where
    ``group_expr`` is true (sample 1) and false (sample 2):
    ``D = max_v |F1(v) - F2(v)|`` over the pooled distinct values.

    Everything up to the final division stays in the INTEGER domain:
    per-distinct-value counts (the only corpus-rate pass, a map-side
    combined hash-agg), cumulative counts over the distinct-VALUE frame,
    and the scaled gap ``|k1·n2 - k2·n1|`` as an exact bigint — so the
    argmax row is engine-deterministic (ties broken by smallest value)
    and ``D = gap/(n1·n2)`` is one IEEE division. The unpartitioned
    window runs on the distinct-value frame only; use a discretized or
    naturally low-cardinality measure (here: 50 quantity levels) so that
    frame stays metadata-rate at any corpus size.

    Returns one row: (n1, n2, at_value, ks_d).
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    per = df.groupBy(v.alias("v")).agg(
        F.sum(F.when(group_expr, F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(group_expr, F.lit(0)).otherwise(F.lit(1)))
        .cast("bigint")
        .alias("c2"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "v",
        F.sum("c1").over(w).alias("k1"),
        F.sum("c2").over(w).alias("k2"),
    )
    tot = cum.agg(
        F.max("k1").cast("bigint").alias("n1"),
        F.max("k2").cast("bigint").alias("n2"),
    )
    d = cum.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        F.col("v").cast("double").alias("at_value"),
        F.abs(F.col("k1") * F.col("n2") - F.col("k2") * F.col("n1")).alias("__dn"),
    )
    return (
        d.orderBy(F.desc("__dn"), F.asc("at_value"))
        .limit(1)
        .select(
            "n1",
            "n2",
            "at_value",
            (F.col("__dn").cast("double") / (F.col("n1").cast("double") * F.col("n2").cast("double"))).alias("ks_d"),
        )
    )
