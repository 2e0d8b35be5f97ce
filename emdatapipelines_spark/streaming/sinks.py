"""Streaming sinks (T4/T6/T9, S9/S11).

Exactly-once contract = checkpointed source offsets + an idempotent sink:
every microbatch runs keyed last-wins dedup against the target before
overwrite (`upsert_last_wins`), so replays after failure converge —
equivalent to the reference's Flink EXACTLY_ONCE checkpointing
(`flink-conf.yml:33-44`) + StarRocks upsert keys
(`resources/database.py:86-138`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.upsert import upsert_last_wins


def foreach_batch_upsert(
    stream_df: DataFrame,
    target_path: str,
    keys: list[str],
    version_col: str,
    checkpoint_dir: str,
    trigger_seconds: int = 30,
    available_now: bool = False,
) -> StreamingQuery:
    """T4/T9 — `foreachBatch` idempotent upsert into a parquet target.

    The 30 s default trigger mirrors the reference's microbatch interval
    (`config/sources.yml:256-258`). Each batch: read current target (if
    any) → keyed last-wins merge → atomic overwrite. On Delta/Iceberg this
    becomes a MERGE; plain-parquet semantics are kept here to stay
    dependency-free.
    """
    spark = stream_df.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        existing = None
        if os.path.exists(target_path):
            existing = spark.read.parquet(target_path)
        merged = upsert_last_wins(existing, batch_df, keys, version_col)
        tmp = f"{target_path}__staging"
        merged.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(target_path)

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        # drain everything available then stop — deterministic test/backfill mode
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def kafka_frame(df: DataFrame, key_col: str) -> DataFrame:
    """S9 — shape a DataFrame for the Kafka sink: ``key`` = the geographic/
    entity partition key, ``value`` = the whole row as JSON.

    ≈ the reference's keyed per-row producer (`ops/data_ingestion_ops.py:
    277-317`, keys at 277-306; producer config `resources/kafka.py:48-64`).
    Works for both ``df.write.format("kafka")`` and
    ``writeStream.format("kafka")`` — compression/acks/batching are
    broker-client options, not row shape.
    """
    payload_cols = [c for c in df.columns]
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*payload_cols)).alias("value"),
    )


def write_kafka_stream(
    stream_df: DataFrame,
    key_col: str,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    trigger_seconds: int = 30,
) -> StreamingQuery:
    """S9/S11 — keyed JSON Kafka producer sink (requires the Kafka connector
    on the classpath; tests cover :func:`kafka_frame` shaping only)."""
    shaped = kafka_frame(stream_df, key_col)
    return (
        shaped.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("kafka.compression.type", "gzip")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def start_to_memory(stream_df: DataFrame, name: str, output_mode: str = "update") -> StreamingQuery:
    """Test sink: materialize a streaming aggregation into an in-memory
    table (used by the streaming unit tests)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
