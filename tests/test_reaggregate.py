"""Two-stage aggregation algebra (operators/reaggregate.py) and PSI drift
(quality/drift.py): merge identity, salt invariance, plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from emdatapipelines_spark.operators.reaggregate import (
    merge_partials,
    partial_aggregate,
    salted_aggregate,
)
from emdatapipelines_spark.quality.drift import bin_counts, psi_by_bin


def _facts(spark):
    return spark.range(0, 1000).selectExpr(
        "id",
        "id % 7 AS day",
        "id % 3 AS grp",
        "CAST(id % 100 AS DOUBLE) / 4 AS x",
    )


def _direct(df, keys):
    return {
        (r[keys[0]] if len(keys) == 1 else tuple(r[k] for k in keys)): (
            r["s"], r["lo"], r["hi"], r["n"],
        )
        for r in df.groupBy(*keys)
        .agg(
            F.sum(F.col("x").cast("decimal(28,2)")).cast("double").alias("s"),
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
            F.count("x").alias("n"),
        )
        .collect()
    }


def test_merge_partials_equals_direct_aggregation(spark):
    df = _facts(spark)
    partials = partial_aggregate(df, ["day", "grp"], {"x": "x"}, scale=2)
    merged = merge_partials(partials, ["grp"], ["x"])
    want = _direct(df, ["grp"])
    got = {r["grp"]: r for r in merged.collect()}
    assert set(got) == set(want)
    for k, (s, lo, hi, n) in want.items():
        r = got[k]
        assert (r["x_sum"], r["x_min"], r["x_max"], r["x_n"]) == (s, lo, hi, n)
        assert math.isclose(r["x_avg"], s / n, rel_tol=0, abs_tol=0)


def test_salted_aggregate_invariant_to_salt_choice(spark):
    df = _facts(spark)
    a = salted_aggregate(df, ["grp"], {"x": "x"}, F.col("id").cast("int"), 16)
    b = salted_aggregate(df, ["grp"], {"x": "x"}, F.col("id").cast("int") * 7, 4)
    rows_a = {r["grp"]: r.asDict() for r in a.collect()}
    rows_b = {r["grp"]: r.asDict() for r in b.collect()}
    assert rows_a == rows_b
    want = _direct(df, ["grp"])
    for k, (s, lo, hi, n) in want.items():
        r = rows_a[k]
        assert (r["x_sum"], r["x_min"], r["x_max"], r["x_n"]) == (s, lo, hi, n)


def test_salted_stage_one_groups_by_salt(spark):
    """The salted plan must aggregate on (key, salt) first — visible as a
    partial_aggregate output with salt_buckets rows per key."""
    df = _facts(spark)
    salted = df.withColumn("__salt", F.pmod(F.col("id").cast("int"), F.lit(8)))
    partials = partial_aggregate(salted, ["grp", "__salt"], {"x": "x"})
    per_key = partials.groupBy("grp").count().collect()
    assert all(r["count"] == 8 for r in per_key)


def test_psi_zero_for_identical_distributions(spark):
    df = _facts(spark)
    bins = bin_counts(df, (F.col("x") / 5).cast("int"))
    out = psi_by_bin(bins, bins).collect()
    assert len(out) > 1
    for r in out:
        assert r["p_ref"] == r["p_cur"]
        assert abs(r["psi_term"]) == 0.0


def test_psi_positive_for_shifted_distribution(spark):
    df = _facts(spark)
    ref = bin_counts(df, (F.col("x") / 5).cast("int"))
    cur = bin_counts(df.filter("x < 12"), (F.col("x") / 5).cast("int"))
    out = psi_by_bin(ref, cur).collect()
    total = sum(r["psi_term"] for r in out)
    assert total > 0.1  # major shift: upper bins vanished
    # only shared bins appear
    assert {r["bin"] for r in out} == {0, 1, 2}


def test_hll_sketch_merge_deterministic_and_accurate(spark):
    """The serving contract for sketch partials: a fixed merge tree is
    deterministic (same plan → same estimate, run to run), and ANY merge
    tree stays within the sketch's error bound. Estimates are NOT identical
    across different merge trees (sparse→dense promotion happens at
    different points — measured: direct=1007, day→month=997,
    day→week→month=999 for 997 true distinct), which is exactly why the
    contract is 'always serve the same grain from the same partials'."""
    from emdatapipelines_spark.operators.reaggregate import hll_merge, hll_partial

    df = spark.range(0, 5000).selectExpr(
        "id % 30 AS day", "CAST(id % 5 AS INT) AS week", "CAST(id % 997 AS STRING) AS uid"
    ).withColumn("month", F.lit(1))
    daily = hll_partial(df, ["month", "week", "day"], "uid")
    run1 = hll_merge(daily, ["month"]).collect()[0]["approx_distinct"]
    run2 = hll_merge(daily, ["month"]).collect()[0]["approx_distinct"]
    assert run1 == run2  # deterministic for a fixed merge tree
    weekly = daily.groupBy("month", "week").agg(
        F.hll_union_agg("sketch").alias("sketch")
    )
    two_level = hll_merge(weekly, ["month"]).collect()[0]["approx_distinct"]
    for est in (run1, two_level):
        assert abs(est - 997) / 997 < 0.05


def test_histogram_partials_merge_identity(spark):
    """Daily histogram partials merged to the type grain must serve the SAME
    quantiles as partials built directly at the type grain — the additive
    merge identity that makes stored daily partials a valid serving layer."""
    from pyspark.sql import functions as F

    from emdatapipelines_spark.operators.reaggregate import (
        histogram_partial,
        quantiles_from_histogram,
    )
    from emdatapipelines_spark.queries.registry import t

    e = t(spark, "/root/testdata/sf0.001", "events").withColumn("day", F.to_date("ts"))
    daily = histogram_partial(e, ["event_type", "day"], "value", 0.0, 500.0, 50)
    direct = histogram_partial(e, ["event_type"], "value", 0.0, 500.0, 50)
    qs = [0.5, 0.9, 0.99]
    via_merge = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in quantiles_from_histogram(
            daily.drop("day"), ["event_type"], qs, 0.0, 500.0, 50
        ).collect()
    }
    via_direct = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in quantiles_from_histogram(direct, ["event_type"], qs, 0.0, 500.0, 50).collect()
    }
    assert via_merge == via_direct and len(via_merge) > 0
    # estimates are ordered and inside the histogram range
    for p50, p90, p99 in via_merge.values():
        assert 0.0 <= p50 <= p90 <= p99 <= 500.0


def test_histogram_quantile_accuracy_vs_exact(spark):
    """Interpolated estimates land within one bin width of the exact
    percentile (the histogram resolution guarantee)."""
    from pyspark.sql import functions as F

    from emdatapipelines_spark.operators.reaggregate import (
        histogram_partial,
        quantiles_from_histogram,
    )
    from emdatapipelines_spark.queries.registry import t

    e = t(spark, "/root/testdata/sf0.001", "events")
    h = histogram_partial(e, ["event_type"], "value", 0.0, 500.0, 50)
    est = {
        r["event_type"]: r["p90"]
        for r in quantiles_from_histogram(h, ["event_type"], [0.9], 0.0, 500.0, 50).collect()
    }
    exact = {
        r["event_type"]: r["x"]
        for r in e.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.9)").alias("x"))
        .collect()
    }
    for k, v in est.items():
        assert abs(v - exact[k]) <= 10.0 + 1e-6  # one bin width
