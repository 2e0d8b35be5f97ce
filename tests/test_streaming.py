"""Structured Streaming semantics: replay the events fixture as a file
stream and check the streaming results equal their batch twins
(SURVEY §2.9 T1/T2/T4/T6/T9).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from emdatapipelines_spark.queries.registry import t
from emdatapipelines_spark.streaming.sinks import foreach_batch_upsert, start_to_memory
from emdatapipelines_spark.streaming.sources import stream_source
from emdatapipelines_spark.streaming.windows import tumbling_window_counts, with_event_time

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """events fixture re-landed as microsecond-timestamp parquet (the raw
    fixture is nanos, which streaming readers can't scan directly)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    t(spark, SF_SMALL, "events").write.mode("overwrite").parquet(d)
    return d


def test_tumbling_window_stream_equals_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    schema = batch.schema
    stream = stream_source(spark, "file", schema=schema, path=events_dir).drop("proc_time")

    windowed = tumbling_window_counts(stream, "ts", "1 hour", ["event_type"])
    q = start_to_memory(windowed, "t2_stream", output_mode="complete")
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): r["event_count"]
        for r in spark.table("t2_stream").collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): r["event_count"]
        for r in tumbling_window_counts(batch, "ts", "1 hour", ["event_type"]).collect()
    }
    assert got == expected and len(got) > 0


def test_watermark_is_declared(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    stream = stream_source(spark, "file", schema=schema, path=events_dir)
    wm = with_event_time(stream, "ts", "15 minutes")
    assert "watermark" in wm._jdf.queryExecution().analyzed().toString().lower()


def test_foreach_batch_upsert_idempotent(spark, events_dir, tmp_path):
    schema = spark.read.parquet(events_dir).schema
    target = str(tmp_path / "upsert_target")

    def run(checkpoint: str):
        stream = stream_source(spark, "file", schema=schema, path=events_dir).drop("proc_time")
        q = foreach_batch_upsert(
            stream, target, keys=["event_id"], version_col="ts",
            checkpoint_dir=checkpoint, available_now=True,
        )
        q.awaitTermination(120)

    run(str(tmp_path / "ckpt1"))
    first = spark.read.parquet(target)
    n_first = first.count()
    sum_first = first.select(F.sum("value")).first()[0]
    batch = spark.read.parquet(events_dir)
    # exactly-once effect: one row per event key, none lost
    assert n_first == batch.select("event_id").distinct().count()

    # replay from a fresh checkpoint (simulated recovery/duplicate delivery):
    # keyed last-wins merge must converge, not double rows
    run(str(tmp_path / "ckpt2"))
    again = spark.read.parquet(target)
    assert again.count() == n_first
    assert again.select(F.sum("value")).first()[0] == sum_first


def test_rate_source_smoke(spark):
    r = stream_source(spark, "rate", rows_per_second=10)
    assert r.isStreaming and "timestamp" in r.columns


def test_stream_static_dim_join_equals_batch(spark, events_dir):
    """Stream-static join (dim enrichment of a stream): the static side is
    planned as a broadcast against every microbatch — the streaming twin of
    J1. Results must equal the batch join."""
    batch = spark.read.parquet(events_dir)
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"),
         ("purchase", "revenue"), ("signup", "growth"), ("error", "ops")],
        "event_type STRING, category STRING",
    )
    stream = stream_source(spark, "file", schema=batch.schema, path=events_dir).drop(
        "proc_time"
    )
    joined = (
        stream.join(F.broadcast(dim), "event_type")
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = start_to_memory(joined, "ss_dim_join", output_mode="complete")
    q.awaitTermination(120)

    got = {r["category"]: r["n"] for r in spark.table("ss_dim_join").collect()}
    want = {
        r["category"]: r["n"]
        for r in batch.join(dim, "event_type")
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) == 4


def test_streaming_drift_bins_equal_batch(spark, events_dir):
    """Drift monitoring in-stream: per-bin counts aggregated over microbatches
    (complete mode) must equal the batch bin_counts — so a PSI against a
    static reference window can run on live data with the same machinery."""
    from emdatapipelines_spark.quality.drift import bin_counts

    batch = spark.read.parquet(events_dir)
    stream = stream_source(spark, "file", schema=batch.schema, path=events_dir).drop(
        "proc_time"
    )
    binned = bin_counts(stream, F.floor(F.col("value") / 50).cast("int"))
    q = start_to_memory(binned, "drift_bins", output_mode="complete")
    q.awaitTermination(120)

    got = {r["bin"]: r["n"] for r in spark.table("drift_bins").collect()}
    want = {
        r["bin"]: r["n"]
        for r in bin_counts(batch, F.floor(F.col("value") / 50).cast("int")).collect()
    }
    assert got == want and len(got) > 3


def test_append_mode_emits_only_watermark_closed_windows(spark, events_dir):
    """Append output mode + watermark: a window row is emitted once the
    watermark passes its end, and the still-open tail window is withheld —
    the emission contract that makes append-mode sinks exactly-once-per
    -window. (T3: the reference's Flink jobs fire early per element; our
    documented divergence emits once, on close.)"""
    batch = spark.read.parquet(events_dir)
    schema = batch.schema
    stream = stream_source(spark, "file", schema=schema, path=events_dir).drop("proc_time")
    # tumbling_window_counts declares the 10-minute watermark itself
    windowed = tumbling_window_counts(stream, "ts", "1 hour", ["event_type"])
    q = start_to_memory(windowed, "t3_append", output_mode="append")
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["event_count"]
        for r in spark.table("t3_append").collect()
    }

    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    import datetime as dt

    final_wm = max_ts - dt.timedelta(minutes=10)
    twin = tumbling_window_counts(batch, "ts", "1 hour", ["event_type"]).collect()
    closed = {
        (r["window_start"], r["event_type"]): r["event_count"]
        for r in twin
        if r["window_end"] <= final_wm
    }
    withheld = [r for r in twin if r["window_end"] > final_wm]
    assert got == closed and len(got) > 0
    assert withheld  # the open tail window exists and was NOT emitted
