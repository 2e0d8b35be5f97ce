"""Sessionization semantics (operators/sessions.py + streaming
session_window): boundary conventions, single-shuffle plan, and
streaming-equals-batch for session windows."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from emdatapipelines_spark.operators.sessions import session_stats, sessionize
from emdatapipelines_spark.streaming.sinks import start_to_memory
from emdatapipelines_spark.streaming.sources import stream_source
from emdatapipelines_spark.streaming.windows import session_window_counts
from emdatapipelines_spark.queries.registry import t

SF_SMALL = "/root/testdata/sf0.001"


def _events(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 1.0),
        (1, base + dt.timedelta(minutes=10), 2.0),   # same session
        (1, base + dt.timedelta(minutes=40), 3.0),   # exactly 30m after prev
        (1, base + dt.timedelta(minutes=200), 4.0),  # new session
        (2, base, 5.0),
    ]
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")


def test_boundary_conventions(spark):
    df = _events(spark)
    # strict_gt (SQL "> gap"): the exactly-30m event stays in session 1
    strict = sessionize(df, "user_id", "ts", "30 minutes")
    seqs = {
        (r["user_id"], r["ts"].minute, r["ts"].hour): r["session_seq"]
        for r in strict.collect()
    }
    assert seqs[(1, 40, 0)] == 1 and seqs[(1, 20, 3)] == 2
    # session_window convention (">= gap"): the boundary event opens session 2
    spark_conv = sessionize(df, "user_id", "ts", "30 minutes", strict_gt=False)
    seqs2 = {
        (r["user_id"], r["ts"].minute, r["ts"].hour): r["session_seq"]
        for r in spark_conv.collect()
    }
    assert seqs2[(1, 40, 0)] == 2 and seqs2[(1, 20, 3)] == 3


def test_session_stats_rollup(spark):
    out = session_stats(_events(spark), "user_id", "ts", "30 minutes", value_col="value")
    rows = {(r["user_id"], r["session_seq"]): r for r in out.collect()}
    assert rows[(1, 1)]["n_events"] == 3 and rows[(1, 1)]["session_value"] == 6.0
    assert rows[(1, 2)]["n_events"] == 1
    assert rows[(2, 1)]["n_events"] == 1


def test_single_shuffle_plan(spark):
    """The windows AND the (user_id, session_seq) aggregate must share one
    hash Exchange on user_id — a second Exchange would double the shuffle
    volume of every sessionization at scale."""
    ev = t(spark, SF_SMALL, "events")
    out = session_stats(ev, "user_id", "ts", "4 hours", value_col="value")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the ingest restore repartition (xxhash64 key, r14) is not a
    # sessionization shuffle — exclude it from the single-exchange budget
    non_ingest = sum(
        1
        for seg in plan.split("Exchange hashpartitioning")[1:]
        if not seg.lstrip("( ").startswith("xxhash64")
    )
    assert non_ingest == 1, plan


def test_session_window_stream_equals_batch(spark, tmp_path):
    d = str(tmp_path / "events_stream")
    t(spark, SF_SMALL, "events").write.mode("overwrite").parquet(d)
    batch = spark.read.parquet(d)
    stream = stream_source(spark, "file", schema=batch.schema, path=d).drop("proc_time")

    windowed = session_window_counts(stream, "ts", "4 hours", ["user_id"])
    q = start_to_memory(windowed, "sess_stream", output_mode="complete")
    q.awaitTermination(120)

    key = lambda r: (r["user_id"], r["session_start"], r["session_end"], r["event_count"])
    got = sorted(key(r) for r in spark.table("sess_stream").collect())
    expected = sorted(
        key(r)
        for r in session_window_counts(batch, "ts", "4 hours", ["user_id"], watermark=None).collect()
    )
    assert got == expected and len(got) > 0


def test_funnel_stages_semantics(spark):
    """Hand-computed funnel: order matters, equal timestamps do NOT chain
    (strictly-later requirement), missing steps stop the path."""
    from emdatapipelines_spark.operators.sessions import funnel_stages

    rows = [
        # u1: full ordered path
        (1, "2024-01-01 10:00:00", "click"),
        (1, "2024-01-01 11:00:00", "view"),
        (1, "2024-01-01 12:00:00", "purchase"),
        # u2: purchase BEFORE view → stops at click>view
        (2, "2024-01-01 10:00:00", "click"),
        (2, "2024-01-01 12:00:00", "view"),
        (2, "2024-01-01 11:00:00", "purchase"),
        # u3: view at the SAME instant as click → strict > fails, stops at click
        (3, "2024-01-01 10:00:00", "click"),
        (3, "2024-01-01 10:00:00", "view"),
        # u4: never clicked → counts nowhere
        (4, "2024-01-01 10:00:00", "view"),
        (4, "2024-01-01 11:00:00", "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id INT, ts STRING, event_type STRING").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {
        r["stage"]: r["users"]
        for r in funnel_stages(df, "user_id", "ts", "event_type",
                               ["click", "view", "purchase"]).collect()
    }
    assert got == {"click": 3, "click>view": 2, "click>view>purchase": 1}


def test_funnel_single_exchange(spark):
    """The window-chain funnel must shuffle the fact table exactly once."""
    from emdatapipelines_spark.operators.sessions import funnel_stages

    df = spark.range(0, 1000).selectExpr(
        "id % 100 AS user_id",
        "timestamp_micros(CAST(id * 1000000 AS LONG)) AS ts",
        "CASE WHEN id % 3 = 0 THEN 'click' WHEN id % 3 = 1 THEN 'view' "
        "ELSE 'purchase' END AS event_type",
    )
    out = funnel_stages(df, "user_id", "ts", "event_type", ["click", "view", "purchase"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one hash exchange on user_id + the single-partition final agg exchange
    assert plan.count("Exchange hashpartitioning") == 1
