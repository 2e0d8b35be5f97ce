"""Stream-stream interval join (streaming/joins.py): streaming result equals
the batch twin, and state-bounding watermarks are declared on both sides."""

from __future__ import annotations

from pyspark.sql import functions as F

from emdatapipelines_spark.queries.registry import t
from emdatapipelines_spark.streaming.joins import interval_join
from emdatapipelines_spark.streaming.sinks import start_to_memory
from emdatapipelines_spark.streaming.sources import stream_source

SF_SMALL = "/root/testdata/sf0.001"


def _sides(df):
    purchases = df.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
    )
    clicks = df.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    return purchases, clicks


def test_stream_join_equals_batch(spark, tmp_path):
    d = str(tmp_path / "events_stream")
    t(spark, SF_SMALL, "events").write.mode("overwrite").parquet(d)
    batch = spark.read.parquet(d)

    sp, sc = _sides(stream_source(spark, "file", schema=batch.schema, path=d).drop("proc_time"))
    joined = interval_join(sp, sc, "user_id", "purchase_ts", "click_ts", lower="4 hours")
    q = start_to_memory(joined, "ssj_stream", output_mode="append")
    q.awaitTermination(180)

    bp, bc = _sides(batch)
    expected = sorted(
        (r["purchase_id"], r["click_id"])
        for r in interval_join(bp, bc, "user_id", "purchase_ts", "click_ts", lower="4 hours").collect()
    )
    got = sorted((r["purchase_id"], r["click_id"]) for r in spark.table("ssj_stream").collect())
    assert got == expected and len(got) > 0


def test_watermarks_on_both_sides(spark, tmp_path):
    d = str(tmp_path / "events_wm")
    t(spark, SF_SMALL, "events").limit(10).write.mode("overwrite").parquet(d)
    schema = spark.read.parquet(d).schema
    sp, sc = _sides(stream_source(spark, "file", schema=schema, path=d).drop("proc_time"))
    joined = interval_join(sp, sc, "user_id", "purchase_ts", "click_ts")
    analyzed = joined._jdf.queryExecution().analyzed().toString().lower()
    assert analyzed.count("watermark") >= 2
