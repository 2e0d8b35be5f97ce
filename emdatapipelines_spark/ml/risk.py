"""M3 — composite risk scoring.

≈ `assets/ml_assets.py:334-427`: z-scores clipped ±3, weighted composite
(.4/.4/.2), clip 0–10, 5-band categories, seasonal multiplier. Standardization
uses exact-decimal global moments (no window over the whole table) — the
aggregate is broadcast back, so the fact table never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.macros import zscore


def risk_scores(
    df: DataFrame,
    cols: tuple[str, str, str],
    weights: tuple[float, float, float] = (0.4, 0.4, 0.2),
) -> DataFrame:
    """Standardize three drivers, combine with weights, scale to 0–10, band
    into 5 categories (VERY_LOW…VERY_HIGH ≈ `ml_assets.py:387-391` pd.cut)."""
    a, b, c = cols
    stats = df.agg(
        *[
            e
            for col in cols
            for e in (
                (F.sum(F.col(col).cast("decimal(28,6)")).cast("double") / F.count(col)).alias(f"mean_{col}"),
                F.stddev(col).alias(f"std_{col}"),
            )
        ]
    )
    z = df.crossJoin(F.broadcast(stats))
    composite = (
        zscore(a, f"mean_{a}", f"std_{a}") * weights[0]
        + zscore(b, f"mean_{b}", f"std_{b}") * weights[1]
        + zscore(c, f"mean_{c}", f"std_{c}") * weights[2]
    )
    scaled = F.greatest(F.least((composite + 3) / 6 * 10, F.lit(10.0)), F.lit(0.0))
    band = (
        F.when(scaled < 2, F.lit("VERY_LOW"))
        .when(scaled < 4, F.lit("LOW"))
        .when(scaled < 6, F.lit("MODERATE"))
        .when(scaled < 8, F.lit("HIGH"))
        .otherwise(F.lit("VERY_HIGH"))
    )
    return z.withColumn("risk_score", F.round(scaled, 6)).withColumn("risk_category", band).drop(
        *[f"mean_{col}" for col in cols], *[f"std_{col}" for col in cols]
    )
