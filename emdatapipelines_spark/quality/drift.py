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
