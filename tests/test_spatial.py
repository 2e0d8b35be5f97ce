"""Grid-bucketed radius join (operators/spatial.py) — exactness vs the
naive cross join, boundary cells, the no-cartesian plan property, and the
haversine helper."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from emdatapipelines_spark.operators.spatial import (
    derive_planar_point,
    haversine_km,
    radius_join,
)

# Points chosen to exercise same-cell, neighbor-cell, diagonal-cell, and
# just-inside/just-outside pairs at radius 10 (cell side 10).
LEFT = [(1, 5.0, 5.0), (2, 95.0, 95.0), (3, 19.9, 0.0)]
RIGHT = [
    (10, 6.0, 6.0),     # same cell as 1
    (11, 12.0, 12.0),   # diagonal neighbor cell of 1, dist ~9.9 -> in
    (12, 5.0, 16.0),    # north neighbor of 1, dist 11 -> out
    (13, 29.5, 0.0),    # neighbor cell of 3, dist 9.6 -> in
    (14, 30.1, 0.0),    # dist 10.2 -> out
    (15, 95.0, 94.0),   # same cell as 2
]


def _frames(spark):
    l = spark.createDataFrame(LEFT, "id bigint, x double, y double")
    r = spark.createDataFrame(RIGHT, "pid bigint, x double, y double")
    return l, r


def test_matches_naive_cross_join(spark):
    l, r = _frames(spark)
    fast = {
        (row["l_id"], row["r_pid"])
        for row in radius_join(l, r, radius=10.0).collect()
    }
    naive = {
        (a, p)
        for (a, xa, ya) in LEFT
        for (p, xp, yp) in RIGHT
        if round(math.sqrt((xa - xp) ** 2 + (ya - yp) ** 2), 6) <= 10.0
    }
    assert fast == naive
    assert (1, 11) in fast and (1, 12) not in fast  # diagonal in, north out
    assert (3, 13) in fast and (3, 14) not in fast  # cross-cell boundary


def test_pairs_emitted_once(spark):
    l, r = _frames(spark)
    rows = radius_join(l, r, radius=10.0).select("l_id", "r_pid").collect()
    assert len(rows) == len(set((r["l_id"], r["r_pid"]) for r in rows))


def test_cell_must_cover_radius(spark):
    l, r = _frames(spark)
    with pytest.raises(ValueError):
        radius_join(l, r, radius=10.0, cell_size=5.0)


def test_no_cartesian_in_plan(spark):
    l, r = _frames(spark)
    plan = (
        radius_join(l, r, radius=10.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_haversine_known_distance(spark):
    # London (51.5007, -0.1246) to Paris (48.8566, 2.3522) ~ 343 km
    df = spark.range(1).select(
        haversine_km(
            F.lit(51.5007), F.lit(-0.1246), F.lit(48.8566), F.lit(2.3522)
        ).alias("d")
    )
    assert abs(df.first()["d"] - 342.8) < 2.0


def test_derive_planar_point_in_extent(spark):
    df = spark.range(1, 1000).select("id")
    x, y = derive_planar_point(F.col("id"))
    row = df.select(
        F.min(x).alias("x0"), F.max(x).alias("x1"),
        F.min(y).alias("y0"), F.max(y).alias("y1"),
    ).first()
    assert 0 <= row["x0"] and row["x1"] < 1000.0
    assert 0 <= row["y0"] and row["y1"] < 1000.0
