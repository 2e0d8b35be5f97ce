"""Streaming source abstraction (S8, T5, T6).

One interface over kafka / file / rate sources so pipelines are written once
and bound to transport at deploy time — the reference binds Flink tables to
Kafka topics the same way (`pipelines/scrapers/main.py:82-96`), with
``json.ignore-parse-errors`` tolerance (`resources/flink.py:217-226`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType


def stream_source(
    spark: SparkSession,
    kind: str,
    schema: StructType | None = None,
    path: str | None = None,
    kafka_bootstrap: str | None = None,
    topic: str | None = None,
    rows_per_second: int = 100,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Build a streaming DataFrame.

    - ``kafka``: value-JSON parsed against ``schema``; unparseable records
      land with null fields (PERMISSIVE ≈ ignore-parse-errors) instead of
      failing the job.
    - ``file``: parquet/json directory tailing (used by tests to replay the
      ``events`` fixture), with a processing-time column ``proc_time``
      (≈ ``PROCTIME()``, `scrapers/main.py:85`).
    - ``rate``: synthetic load for throughput tests.
    """
    if kind == "kafka":
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", kafka_bootstrap)
            .option("subscribe", topic)
            .option("startingOffsets", "latest")
            .load()
        )
        parsed = raw.select(
            F.col("key").cast("string").alias("record_key"),
            F.from_json(F.col("value").cast("string"), schema).alias("data"),
            F.col("timestamp").alias("kafka_ts"),
        )
        return parsed.select("record_key", "kafka_ts", "data.*")
    if kind == "file":
        from ..eventtime import normalize_event_time

        reader = spark.readStream.schema(schema)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        # NTZ columns (pandas/Arrow-written parquet) refuse withWatermark —
        # normalize to session-tz TIMESTAMP at the source boundary
        df = normalize_event_time(reader.parquet(path))
        return df.withColumn("proc_time", F.current_timestamp())
    if kind == "rate":
        return spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    raise ValueError(f"unknown stream source kind: {kind}")
