"""Maintenance (ANALYZE/compaction) + the end-to-end ingestion lifecycle +
freshness monitoring.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from emdatapipelines_spark.clock import Clock
from emdatapipelines_spark.maintenance import analyze_table, compact_parquet, parquet_file_count
from emdatapipelines_spark.pipelines.ingest import run_ingestion
from emdatapipelines_spark.quality.freshness import freshness_check
from emdatapipelines_spark.quality.schema import ColumnSpec, SchemaSpec
from emdatapipelines_spark.sources.rest import RestSourceConfig


def test_compact_small_files(spark, tmp_path):
    path = str(tmp_path / "fragmented")
    # 32 tiny files
    spark.range(10000).repartition(32).write.parquet(path)
    assert parquet_file_count(path) == 32
    n_after = compact_parquet(spark, path, target_file_bytes=10 * 1024 * 1024)
    assert n_after < 32
    assert spark.read.parquet(path).count() == 10000


def test_analyze_table_feeds_cbo(spark):
    spark.range(100).write.mode("overwrite").saveAsTable("maint_stats_tbl")
    try:
        analyze_table(spark, "maint_stats_tbl", columns=["id"])
        stats = spark.sql("DESCRIBE EXTENDED maint_stats_tbl id").collect()
        info = {r["info_name"]: r["info_value"] for r in stats}
        assert info.get("distinct_count") not in (None, "NULL")
    finally:
        spark.sql("DROP TABLE IF EXISTS maint_stats_tbl")


def _payload_good():
    return {
        "data": [
            {"disaster_number": "4001", "state": "CO", "declaration_date": "2024-01-05 00:00:00"},
            {"disaster_number": "4002", "state": "TX", "declaration_date": "2024-01-06 00:00:00"},
        ]
    }


def _payload_bad():
    return {"data": [{"disaster_number": "oops", "state": None} for _ in range(5)]}


def _spec():
    return SchemaSpec(
        "declarations",
        [
            ColumnSpec("disaster_number", "numeric", required=True, not_null=True),
            ColumnSpec("state", "string", required=True, not_null=True),
        ],
    )


def _cfg():
    return RestSourceConfig(
        name="fema",
        endpoint="http://x",
        required_fields=["disaster_number", "state", "declaration_date"],
        type_map={"disaster_number": "int", "declaration_date": "timestamp"},
    )


def test_ingestion_lands_clean_data(spark, tmp_path):
    res = run_ingestion(
        spark, _cfg(), lambda u, p: _payload_good(), str(tmp_path / "out"),
        schema_spec=_spec(),
    )
    assert res.landed and res.n_rows == 2
    out = spark.read.parquet(res.output_path)
    assert out.count() == 2 and "ingestion_timestamp" in out.columns


def test_ingestion_quarantines_bad_data(spark, tmp_path):
    res = run_ingestion(
        spark, _cfg(), lambda u, p: _payload_bad(), str(tmp_path / "out"),
        schema_spec=_spec(), quarantine_path=str(tmp_path / "quarantine"),
    )
    assert not res.landed
    assert res.output_path.endswith("quarantine")
    assert spark.read.parquet(res.output_path).count() == 5


def test_freshness_tiers(spark):
    clock = Clock(datetime(2024, 2, 1))
    df = spark.createDataFrame(
        [("fresh", datetime(2024, 1, 31, 23)), ("fresh", datetime(2024, 1, 31, 22))],
        "src string, ingestion_timestamp timestamp",
    )
    ok = freshness_check(
        df, "ingestion_timestamp", "fema", warn_minutes=360, error_minutes=1440, clock=clock
    ).first()
    assert ok["freshness_status"] == "PASS" and ok["age_minutes"] == 60
    stale = freshness_check(
        df, "ingestion_timestamp", "noaa", warn_minutes=15, error_minutes=45, clock=clock
    ).first()
    assert stale["freshness_status"] == "ERROR"
