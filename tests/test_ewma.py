"""Grouped EWMA fold (operators/windows.py: grouped_ewma) — recurrence
matches pandas ewm(adjust=False), order totality, partitioning
independence."""

from __future__ import annotations

import pandas as pd

from emdatapipelines_spark.operators.windows import grouped_ewma

ROWS = [
    ("u1", 1, 10.0), ("u1", 2, 20.0), ("u1", 3, 5.0), ("u1", 4, 40.0),
    ("u2", 1, 7.5), ("u2", 2, 2.5),
    ("u3", 9, 1.0),                       # single-element group: ewma = x1
]


def _df(spark, parts=4):
    return spark.createDataFrame(
        ROWS, "uid string, seq int, value double"
    ).repartition(parts)


def test_matches_pandas_ewm(spark):
    out = {
        r["uid"]: (r["n_obs"], r["ewma"])
        for r in grouped_ewma(_df(spark), "value", ["uid"], ["seq"], alpha=0.2).collect()
    }
    pdf = pd.DataFrame(ROWS, columns=["uid", "seq", "value"]).sort_values(["uid", "seq"])
    for uid, g in pdf.groupby("uid"):
        want = g["value"].ewm(alpha=0.2, adjust=False).mean().iloc[-1]
        n, got = out[uid]
        assert n == len(g)
        assert abs(got - round(want, 6)) < 1e-9
    assert out["u3"] == (1, 1.0)


def test_partitioning_independent(spark):
    a = sorted(map(tuple, grouped_ewma(_df(spark, 1), "value", ["uid"], ["seq"]).collect()))
    b = sorted(map(tuple, grouped_ewma(_df(spark, 7), "value", ["uid"], ["seq"]).collect()))
    assert a == b
