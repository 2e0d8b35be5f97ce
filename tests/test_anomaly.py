"""Q6 anomaly detectors: volume baselines, temporal clustering,
dimensional concentration.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from emdatapipelines_spark.quality.anomaly import (
    VolumeBaseline,
    concentration_anomaly,
    mad_outliers,
    temporal_clustering,
    volume_anomaly,
)


def test_volume_anomaly_bands(spark):
    df = spark.range(100)
    low = volume_anomaly(df, "s", VolumeBaseline(min_rows=200, max_rows=500)).first()
    ok = volume_anomaly(df, "s", VolumeBaseline(min_rows=50, max_rows=500)).first()
    high = volume_anomaly(df, "s", VolumeBaseline(min_rows=1, max_rows=50)).first()
    assert low["volume_status"] == "VOLUME_LOW"
    assert ok["volume_status"] == "OK"
    assert high["volume_status"] == "VOLUME_HIGH"
    assert ok["row_count"] == 100


def test_temporal_clustering_detects_tight_batch(spark):
    base = datetime(2024, 1, 10, 12, 0, 0)
    tight = spark.createDataFrame(
        [(i, base + timedelta(seconds=i)) for i in range(50)], "id int, ts timestamp"
    )
    spread = spark.createDataFrame(
        [(i, base + timedelta(hours=i)) for i in range(50)], "id int, ts timestamp"
    )
    assert temporal_clustering(tight, "ts", spread_minutes=6).first()["is_clustered"]
    assert not temporal_clustering(spread, "ts", spread_minutes=6).first()["is_clustered"]
    # small batches are never flagged (row_count > 10 guard)
    tiny = spark.createDataFrame([(1, base), (2, base)], "id int, ts timestamp")
    assert not temporal_clustering(tiny, "ts", spread_minutes=6).first()["is_clustered"]


def test_concentration_anomaly(spark):
    skewed = spark.createDataFrame(
        [(i, "CA" if i < 90 else "TX") for i in range(100)], "id int, state string"
    )
    even = spark.createDataFrame(
        [(i, f"S{i % 10}") for i in range(100)], "id int, state string"
    )
    s = concentration_anomaly(skewed, "state", threshold=0.5).first()
    assert s["top_value"] == "CA" and s["is_concentrated"] and s["share"] == 0.9
    assert not concentration_anomaly(even, "state", threshold=0.5).first()["is_concentrated"]


def test_mad_outliers_robust_to_single_extreme(spark):
    # 49 values near 10 plus one at 1e9: the extreme inflates mean/std so a
    # z-score scan flags nothing else, but median/MAD still sees the scale
    # of the bulk — exactly one outlier, and the median/MAD stats are
    # untouched by the extreme (50% breakdown point).
    rows = [("a", 10.0 + (i % 7) * 0.5) for i in range(49)] + [("a", 1e9)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = mad_outliers(df, "value", ["event_type"], k=3.0).first()
    assert out["n_values"] == 50
    assert out["outlier_count"] == 1
    assert 10.0 <= out["median_value"] <= 13.0
    assert out["mad"] <= 1.5


def test_mad_outliers_constant_group_flags_any_deviation(spark):
    # MAD == 0 for a constant group: threshold collapses to 0, so any
    # deviating value is an outlier and constants are not.
    rows = [("c", 5.0)] * 20 + [("c", 5.1)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = mad_outliers(df, "value", ["event_type"], k=3.0).first()
    assert out["mad"] == 0.0
    assert out["outlier_count"] == 1


def test_theil_sen_ignores_single_spike(spark):
    # mv rises exactly 1.0/day except one wild spiked day; the median of
    # pairwise slopes stays 1e6 ppm/day (OLS would be dragged far off).
    rows = []
    for i in range(11):
        v = 100.0 + i if i != 5 else 10000.0
        rows.append(("a", datetime(2024, 1, 1 + i), v))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    from emdatapipelines_spark.quality.anomaly import theil_sen_trend

    out = theil_sen_trend(df, "value", "ts", ["event_type"]).first()
    assert out["n_days"] == 11 and out["n_pairs"] == 55
    assert out["trend_slope_ppm"] == 1000000.0


def test_theil_sen_single_day_group_emits_nothing(spark):
    from emdatapipelines_spark.quality.anomaly import theil_sen_trend

    df = spark.createDataFrame(
        [("solo", datetime(2024, 1, 1), 1.0)],
        "event_type string, ts timestamp, value double",
    )
    assert theil_sen_trend(df, "value", "ts", ["event_type"]).count() == 0
