"""Custom stateful streaming operators (applyInPandasWithState)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from emdatapipelines_spark.queries.registry import t
from emdatapipelines_spark.streaming.sinks import start_to_memory
from emdatapipelines_spark.streaming.sources import stream_source
from emdatapipelines_spark.streaming.stateful import (
    running_group_stats,
    streaming_dedup_first_seen,
)

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # 4 files + maxFilesPerTrigger=1 → 4 microbatches, so state genuinely
    # carries across batches instead of being exercised on a single batch
    d = str(tmp_path_factory.mktemp("events_stateful"))
    t(spark, SF_SMALL, "events").repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_running_group_stats_matches_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    schema = batch.schema
    stream = stream_source(
        spark, "file", schema=schema, path=events_dir, max_files_per_trigger=1
    ).drop("proc_time")

    stats = running_group_stats(stream, "event_type", "value")
    q = start_to_memory(stats, "stateful_stats", output_mode="update")
    q.awaitTermination(120)

    # last update per key is the final running value
    final = (
        spark.table("stateful_stats")
        .groupBy("event_type")
        .agg(F.max("total_count").alias("total_count"), F.max("max_value").alias("max_value"))
    )
    got = {r["event_type"]: (r["total_count"], r["max_value"]) for r in final.collect()}
    expected = {
        r["event_type"]: (r["c"], r["m"])
        for r in batch.groupBy("event_type")
        .agg(F.count("value").alias("c"), F.max("value").alias("m"))
        .collect()
    }
    assert got == expected and len(got) > 0


def test_streaming_dedup_first_seen(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    schema = batch.schema
    stream = stream_source(spark, "file", schema=schema, path=events_dir).drop("proc_time")
    # fingerprint = coarse value bucket → plenty of stream-level duplicates
    stream_fp = stream.select(
        "event_type", F.floor(F.col("value") / 50).cast("string").alias("fp")
    )
    dedup = streaming_dedup_first_seen(stream_fp, "event_type", "fp")
    q = start_to_memory(dedup, "stateful_dedup", output_mode="update")
    q.awaitTermination(120)

    got = spark.table("stateful_dedup")
    # one row per distinct (key, fingerprint), none duplicated
    assert got.count() == got.select("event_type", "fp").distinct().count()
    expected = (
        batch.select("event_type", F.floor(F.col("value") / 50).cast("string").alias("fp"))
        .distinct()
        .count()
    )
    assert got.count() == expected


def _tws_available() -> bool:
    """transformWithStateInPandas runs a protobuf-speaking state-server
    worker (TransformWithStateInPySpark driver worker); without the
    google.protobuf package it crashes at query start. Same gating stance
    as the Kafka connector: the operator code is real, the transport
    dependency is absent in this container."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_running_group_stats_tws_matches_batch(spark, events_dir):
    """transformWithState twin: identical output contract to the
    applyInPandasWithState path, verified against the batch aggregate."""
    from emdatapipelines_spark.streaming.stateful import running_group_stats_tws

    if not _tws_available():
        pytest.skip("google.protobuf unavailable (expected in this container)")
    batch = spark.read.parquet(events_dir)
    stream = stream_source(
        spark, "file", schema=batch.schema, path=events_dir, max_files_per_trigger=1
    ).drop("proc_time")

    stats = running_group_stats_tws(stream, "event_type", "value")
    q = start_to_memory(stats, "tws_stats", output_mode="update")
    q.awaitTermination(120)

    final = (
        spark.table("tws_stats")
        .groupBy("event_type")
        .agg(F.max("total_count").alias("total_count"), F.max("max_value").alias("max_value"))
    )
    got = {r["event_type"]: (r["total_count"], r["max_value"]) for r in final.collect()}
    expected = {
        r["event_type"]: (r["c"], r["m"])
        for r in batch.groupBy("event_type")
        .agg(F.count("value").alias("c"), F.max("value").alias("m"))
        .collect()
    }
    assert got == expected and len(got) > 0


def test_streaming_dedup_first_seen_tws(spark, events_dir):
    """MAP-state dedup twin: exactly one row per distinct (key, fingerprint)
    across all microbatches, matching the batch distinct count."""
    from emdatapipelines_spark.streaming.stateful import streaming_dedup_first_seen_tws

    if not _tws_available():
        pytest.skip("google.protobuf unavailable (expected in this container)")
    batch = spark.read.parquet(events_dir)
    stream = stream_source(
        spark, "file", schema=batch.schema, path=events_dir, max_files_per_trigger=1
    ).drop("proc_time")
    stream_fp = stream.select(
        "event_type", F.floor(F.col("value") / 50).cast("string").alias("fp")
    )
    dedup = streaming_dedup_first_seen_tws(stream_fp, "event_type", "fp")
    q = start_to_memory(dedup, "tws_dedup", output_mode="update")
    q.awaitTermination(120)

    got = spark.table("tws_dedup")
    assert got.count() == got.select("event_type", "fp").distinct().count()
    expected = (
        batch.select("event_type", F.floor(F.col("value") / 50).cast("string").alias("fp"))
        .distinct()
        .count()
    )
    assert got.count() == expected


def test_tws_plan_shape_without_execution(spark, events_dir):
    """Plan construction (analysis) needs no protobuf worker: the tws twins
    must produce streaming frames with the v1 twins' exact schemas, so the
    two APIs stay drop-in interchangeable."""
    from emdatapipelines_spark.streaming.stateful import (
        running_group_stats,
        running_group_stats_tws,
        streaming_dedup_first_seen,
        streaming_dedup_first_seen_tws,
    )

    batch = spark.read.parquet(events_dir)
    stream = stream_source(
        spark, "file", schema=batch.schema, path=events_dir
    ).drop("proc_time")
    fp = stream.select("event_type", F.lit("x").alias("fp"))

    v1 = running_group_stats(stream, "event_type", "value")
    v2 = running_group_stats_tws(stream, "event_type", "value")
    assert v2.isStreaming and v2.schema == v1.schema

    d1 = streaming_dedup_first_seen(fp, "event_type", "fp")
    d2 = streaming_dedup_first_seen_tws(fp, "event_type", "fp")
    assert d2.isStreaming and d2.schema == d1.schema
