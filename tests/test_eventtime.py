"""Event-time normalization layer (eventtime.py): the load-boundary contract
that pandas/Arrow-written NTZ parquet and nano-precision columns surface as
session-tz TIMESTAMP everywhere downstream."""

from __future__ import annotations

import pandas as pd

from emdatapipelines_spark.eventtime import epoch_seconds, normalize_event_time
from emdatapipelines_spark.io import load_table
from emdatapipelines_spark.queries.registry import t


def _ntz_parquet(tmp_path):
    """pandas-written parquet: timestamp[us] WITHOUT the UTC flag → Spark 4
    reads TIMESTAMP_NTZ."""
    p = str(tmp_path / "ntz.parquet")
    df = pd.DataFrame(
        {"k": [1, 2], "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-02 12:30:00"])}
    )
    # micros, not pandas-default nanos: nano columns fail the scan outright
    # (PARQUET_TYPE_ILLEGAL) unless read via the nanosAsLong loader path
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(p, index=False)
    return p


def test_ntz_column_normalizes_to_session_tz_timestamp(spark, tmp_path):
    p = _ntz_parquet(tmp_path)
    raw = spark.read.parquet(p)
    assert dict(raw.dtypes)["ts"] == "timestamp_ntz"  # the hazard is real
    norm = normalize_event_time(raw)
    assert dict(norm.dtypes)["ts"] == "timestamp"
    # UTC session zone: the naive wall-clock instant is preserved
    rows = {r["k"]: r["ts"].isoformat() for r in norm.collect()}
    assert rows[1].startswith("2024-01-01T00:00:00")
    # idempotent: normalizing twice is a no-op
    assert dict(normalize_event_time(norm).dtypes)["ts"] == "timestamp"


def test_epoch_seconds_accepts_both_timestamp_types(spark, tmp_path):
    from pyspark.sql import functions as F

    p = _ntz_parquet(tmp_path)
    raw = spark.read.parquet(p)
    got_ntz = raw.select(epoch_seconds("ts").alias("e")).orderBy("e").first()["e"]
    got_ltz = (
        normalize_event_time(raw).select(epoch_seconds("ts").alias("e")).orderBy("e").first()["e"]
    )
    assert got_ntz == got_ltz == 1704067200.0  # 2024-01-01T00:00:00Z


def test_loaders_normalize_every_fixture_table(spark):
    for loader in (lambda n: t(spark, "/root/testdata/sf0.001", n),
                   lambda n: load_table(spark, "/root/testdata/sf0.001", n)):
        for name in ("events", "orders", "lineitem"):
            dtypes = dict(loader(name).dtypes).values()
            assert "timestamp_ntz" not in dtypes
