"""Logistic regression GD (ml/logreg.py) — python-reference equivalence,
loss decrease, label balance sanity, and empty-frame behavior."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from emdatapipelines_spark.ml.logreg import daily_count_features, logreg_gd


def _reference(rows, lr=0.5, steps=5):
    # rows: list of (x1, x2, y); mirrors the engine arithmetic exactly
    def sig(z):
        p = round(1.0 / (1.0 + math.exp(-round(z, 8))), 8)
        return min(max(p, 1e-8), 0.99999999)

    b = w1 = w2 = 0.0
    n = len(rows)
    for _ in range(steps):
        gb = g1 = g2 = 0.0
        for x1, x2, y in rows:
            p = sig(b + w1 * x1 + w2 * x2)
            gb += round(p - y, 8)
            g1 += round((p - y) * x1, 8)
            g2 += round((p - y) * x2, 8)
        b, w1, w2 = b - lr * gb / n, w1 - lr * g1 / n, w2 - lr * g2 / n
    loss = sum(
        round(
            -(
                math.log(sig(b + w1 * x1 + w2 * x2))
                if y == 1.0
                else math.log(1.0 - sig(b + w1 * x1 + w2 * x2))
            ),
            8,
        )
        for x1, x2, y in rows
    )
    return (
        round(b, 6),
        round(w1, 6),
        round(w2, 6),
        n,
        round(loss / n * 1e6) / 1e6,
    )


def _frame(spark, rows):
    return spark.createDataFrame(rows, "x1 double, x2 double, y double")


def test_logreg_matches_python_reference(spark):
    rng = random.Random(11)
    rows = [
        (
            round(rng.uniform(0.5, 4.5), 8),
            round(rng.uniform(-1.0, 1.0), 8),
            float(rng.random() < 0.5),
        )
        for _ in range(200)
    ]
    got = logreg_gd(_frame(spark, rows)).collect()[0]
    exp = _reference(rows)
    assert (
        got["bias"],
        got["w_x1"],
        got["w_x2"],
        got["n_rows"],
        got["avg_log_loss"],
    ) == exp


def test_logreg_loss_decreases_on_separable_data(spark):
    # y perfectly correlated with x1 — GD must beat the 0-weight loss ln(2)
    rows = [(float(i % 5), 0.0, float(i % 5 >= 3)) for i in range(100)]
    out = logreg_gd(_frame(spark, rows), steps=5).collect()[0]
    assert out["avg_log_loss"] < math.log(2.0)
    assert out["w_x1"] > 0  # higher x1 -> y=1, learned sign must be positive


def test_logreg_empty_frame(spark):
    out = logreg_gd(_frame(spark, [])).collect()
    assert len(out) == 1  # agg over empty frame: n_rows=0, null loss
    assert out[0]["n_rows"] == 0


def test_daily_features_shape(spark):
    rows = [
        (i, f"2024-01-{(i % 9) + 1:02d} 06:00:00", 1, "A", float(i), "{}")
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    feats = daily_count_features(df)
    got = feats.collect()
    # 9 distinct days, one type -> 8 rows (last day has no lead)
    assert len(got) == 8
    assert set(feats.columns) == {"x1", "x2", "y"}
    assert all(r["y"] in (0.0, 1.0) for r in got)
