"""Distributed full-batch logistic regression via unrolled gradient descent.

The ML family (M2 forest, kmeans, M3 risk bands — reference
`dbt_projects/emergency_data/models/ml/` + `pipelines/dagster/
emergency_pipeline/ops/ml_ops.py` train simple supervised models over
daily aggregates) gains a gradient-based learner whose training loop is
fully plan-expressible: each step is ONE map-side-combined aggregation of
the per-row gradient over the feature frame, the textbook data-parallel
GD decomposition — at 100 TB each step is a single partial-agg shuffle of
three numbers per partition, and the only driver traffic is the 1-row
gradient vector per step (the bounded-collect pattern the kmeans trainer
already uses).

Determinism (the repo's oracle convention): z rounds to 8 dp before the
sigmoid, the sigmoid output rounds to 8 dp (and clamps to
[1e-8, 1−1e-8] so log-loss never hits ln(0)), per-row gradient
contributions round to 8 dp and sum in exact DECIMAL — so the hash-agg
order cannot move the result, and weight updates are plain IEEE doubles
computed identically driver-side and in the oracle's chained CTEs. exp()
is the one libm call in the loop; its ≤1-ulp cross-engine wiggle is
absorbed by the 8-dp rounding on a bounded (daily-grain) feature frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_P_LO = 1e-8
_P_HI = 0.99999999


def daily_count_features(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-(type, day) training frame: x1 = ln(1+count), x2 = mean value
    scaled by 1/100, label y = 1 when the next day's count is strictly
    higher. Daily grain keeps the frame dimension-sized (types × days) at
    any corpus scale; the mean goes through the DECIMAL `davg` convention.
    """
    daily = events.groupBy(
        F.col(type_col), F.col(ts_col).cast("date").alias("d")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        (
            F.round(
                F.sum(F.col(value_col).cast("decimal(28,4)")).cast("double")
                / F.count(F.lit(1))
                * F.lit(1000000.0)
            )
            / F.lit(1000000.0)
        ).alias("mv"),
    )
    w = Window.partitionBy(type_col).orderBy("d")
    return (
        daily.withColumn("nxt", F.lead("cnt").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            F.round(F.log(F.lit(1.0) + F.col("cnt")), 8).alias("x1"),
            F.round(F.col("mv") / F.lit(100.0), 8).alias("x2"),
            F.when(F.col("nxt") > F.col("cnt"), F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("y"),
        )
    )


def _sigmoid(z):
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 8)
    return F.least(F.greatest(p, F.lit(_P_LO)), F.lit(_P_HI))


def logreg_gd(
    feats: DataFrame,
    feature_cols: tuple[str, ...] = ("x1", "x2"),
    label_col: str = "y",
    lr: float = 0.5,
    steps: int = 5,
) -> DataFrame:
    """Train ``steps`` full-batch GD steps from zero weights; return ONE row
    (bias, w_<feature>..., n_rows, avg_log_loss with the final weights).

    Each step aggregates sum(round((p−y)·x_j, 8)) in exact DECIMAL (one
    distributed pass), pulls the (k+1)-element gradient to the driver, and
    updates ``w ← w − lr·g/n`` in plain doubles — the same arithmetic an
    unrolled SQL oracle replays CTE-by-CTE.
    """
    names = list(feature_cols)
    w = [0.0] * (1 + len(names))

    def _z(weights):
        z = F.lit(weights[0])
        for wi, c in zip(weights[1:], names):
            z = z + F.lit(wi) * F.col(c)
        return F.round(z, 8)

    for _ in range(steps):
        p = _sigmoid(_z(w))
        r = F.round(p - F.col(label_col), 8)
        aggs = [F.sum(r.cast("decimal(28,8)")).cast("double").alias("gb")]
        for i, c in enumerate(names):
            aggs.append(
                F.sum(
                    F.round((p - F.col(label_col)) * F.col(c), 8).cast(
                        "decimal(28,8)"
                    )
                )
                .cast("double")
                .alias(f"g{i}")
            )
        aggs.append(F.count(F.lit(1)).alias("n"))
        row = feats.agg(*aggs).first()
        n = row["n"]
        if not n:
            break
        w[0] = w[0] - lr * row["gb"] / n
        for i in range(len(names)):
            w[i + 1] = w[i + 1] - lr * row[f"g{i}"] / n

    p = _sigmoid(_z(w))
    loss = F.round(
        -F.when(F.col(label_col) == 1.0, F.log(p)).otherwise(
            F.log(F.lit(1.0) - p)
        ),
        8,
    )
    out = feats.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (
            F.round(
                F.sum(loss.cast("decimal(28,8)")).cast("double")
                / F.count(F.lit(1))
                * F.lit(1000000.0)
            )
            / F.lit(1000000.0)
        ).alias("avg_log_loss"),
    )
    sel = [F.round(F.lit(w[0]), 6).alias("bias")]
    sel += [
        F.round(F.lit(w[i + 1]), 6).alias(f"w_{c}") for i, c in enumerate(names)
    ]
    return out.select(*sel, "n_rows", "avg_log_loss")


def ridge_closed_form_2d(
    feats: DataFrame,
    target: str = "y",
    lam: float = 0.01,
) -> DataFrame:
    """Closed-form ridge regression on the 2-feature frame — the
    no-iteration linear model: β = (XᵀX + λI)⁻¹ Xᵀy solved with the
    explicit 2×2 inverse, so the whole fit is ONE distributed moment
    pass + scalar algebra (the shape that beats iterative GD outright
    whenever the normal equations fit in a register file — here, always).

    Determinism: features arrive on a 1e-4 grid, so casting to
    DECIMAL(18,4) is exact and every moment (Σx², Σxy, …) is an exact
    decimal — partial-agg order cannot move a bit. The 2×2
    solve is a fixed IEEE expression on those exact moments; training
    MSE re-walks the frame once with the broadcast β, per-row squared
    residuals 8-dp-rounded into a decimal sum (the a32 convention).
    """
    yv = F.col(target).cast("decimal(18,0)")
    # scale 4, not 8: the features live on a 1e-4 grid so the cast stays
    # exact, and the PRODUCT sums then carry scale 8 — small enough that
    # their unscaled integer fits 2^53, making the decimal→double cast a
    # single correctly-rounded conversion in every engine (DuckDB converts
    # high-scale decimals via hugeint→double THEN /10^scale — two roundings
    # that disagreed with Spark's one-step conversion by 1 ulp at sf0.1)
    x1 = F.col("x1").cast("decimal(18,4)")
    x2 = F.col("x2").cast("decimal(18,4)")
    m = feats.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x1 * x1).cast("double").alias("a"),
        F.sum(x1 * x2).cast("double").alias("b"),
        F.sum(x2 * x2).cast("double").alias("c"),
        F.sum(x1 * yv).cast("double").alias("d"),
        F.sum(x2 * yv).cast("double").alias("e"),
    )
    det = (F.col("a") + F.lit(lam)) * (F.col("c") + F.lit(lam)) - F.col("b") * F.col("b")
    beta = m.select(
        "n",
        (((F.col("c") + F.lit(lam)) * F.col("d") - F.col("b") * F.col("e")) / det).alias("b1"),
        (((F.col("a") + F.lit(lam)) * F.col("e") - F.col("b") * F.col("d")) / det).alias("b2"),
    )
    scored = feats.crossJoin(F.broadcast(beta))
    resid = F.col(target) - (F.col("b1") * F.col("x1") + F.col("b2") * F.col("x2"))
    return (
        scored.groupBy("n", "b1", "b2")
        .agg(
            (
                F.round(
                    F.sum(F.round(resid * resid, 8).cast("decimal(28,8)")).cast("double")
                    / F.max("n")
                    * F.lit(1000000.0)
                )
                / F.lit(1000000.0)
            ).alias("mse")
        )
        .select("n", "b1", "b2", "mse")
    )
