"""coalesce_intervals (operators/windows.py) and ks_two_sample
(quality/drift.py) behavioral tests."""

from pyspark.sql import functions as F

from emdatapipelines_spark.operators.windows import coalesce_intervals
from emdatapipelines_spark.quality.drift import ks_two_sample


def test_coalesce_overlapping_and_disjoint(spark):
    rows = [
        ("a", 0, 10), ("a", 5, 12), ("a", 20, 25),   # [0,12], [20,25]
        ("b", 0, 1), ("b", 1, 2),                    # touching -> merged
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = sorted(
        (r["k"], r["island_start"], r["island_end"], r["n_merged"])
        for r in coalesce_intervals(df, "s", "e", ["k"]).collect()
    )
    assert out == [("a", 0, 12, 2), ("a", 20, 25, 1), ("b", 0, 2, 2)]


def test_coalesce_contained_interval_extends_running_max(spark):
    # [0,100] swallows [10,20]; [30,40] must NOT start a new island even
    # though its start exceeds the PREVIOUS ROW's end (20) — the running
    # max (100) is what matters
    rows = [("a", 0, 100), ("a", 10, 20), ("a", 30, 40)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = coalesce_intervals(df, "s", "e", ["k"]).collect()
    assert len(out) == 1 and out[0]["n_merged"] == 3
    assert out[0]["island_end"] == 100


def test_ks_identical_samples_zero(spark):
    rows = [(float(v), g) for v in range(1, 6) for g in ("x", "y")]
    df = spark.createDataFrame(rows, "v double, g string")
    r = ks_two_sample(df, "v", F.col("g") == "x").collect()[0]
    assert r["ks_d"] == 0.0 and r["n1"] == 5 and r["n2"] == 5


def test_ks_disjoint_samples_one(spark):
    rows = [(1.0, "x"), (2.0, "x"), (10.0, "y"), (11.0, "y")]
    df = spark.createDataFrame(rows, "v double, g string")
    r = ks_two_sample(df, "v", F.col("g") == "x").collect()[0]
    assert r["ks_d"] == 1.0
    assert r["at_value"] == 2.0  # smallest value achieving the max gap


def test_column_entropy_constant_and_uniform(spark):
    from emdatapipelines_spark.quality.stats import column_entropy

    const = spark.createDataFrame([("a",)] * 8, "v string")
    r = column_entropy(const, "v", "c").collect()[0]
    assert r["entropy_nats"] == 0.0 and r["norm_entropy"] is None
    assert r["modal_share"] == 1.0

    uni = spark.createDataFrame([(str(i % 4),) for i in range(8)], "v string")
    r = column_entropy(uni, "v", "u").collect()[0]
    # uniform over 4 values: H = ln 4, normalized = 1
    assert abs(r["entropy_nats"] - 1.386294) < 1e-5
    assert r["norm_entropy"] == 1.0


def test_skyline_2d_dominance(spark):
    from emdatapipelines_spark.operators.sorts import skyline_2d

    rows = [
        ("a", 10, 1), ("b", 8, 5), ("c", 8, 3),   # c dominated by b (same x)
        ("d", 5, 5),                               # dominated by b (8>=5, 5>=5, strict x)
        ("e", 1, 9), ("f", 10, 1),                 # f ties a exactly -> both kept
    ]
    df = spark.createDataFrame(rows, "k string, x long, y long")
    out = sorted(r["k"] for r in skyline_2d(df, "x", "y").collect())
    assert out == ["a", "b", "e", "f"]
