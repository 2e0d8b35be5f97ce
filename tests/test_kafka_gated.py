"""Kafka transport smoke — runs only when the Spark Kafka connector is on
the classpath (it is not bundled with plain pyspark). The engine's Kafka
paths are exercised structurally either way: frame shaping in
tests/test_quality_schema.py, parse-tolerant source wiring here.
"""

from __future__ import annotations

import pytest

from pyspark.sql.types import StringType, StructField, StructType


def _kafka_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def test_kafka_source_wiring(spark):
    from emdatapipelines_spark.streaming.sources import stream_source

    if not _kafka_available(spark):
        pytest.skip("Kafka connector not on classpath (expected in this container)")
    schema = StructType([StructField("k", StringType())])
    df = stream_source(
        spark, "kafka", schema=schema, kafka_bootstrap="localhost:9092", topic="t"
    )
    assert df.isStreaming and {"record_key", "kafka_ts", "k"} <= set(df.columns)
