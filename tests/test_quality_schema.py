"""Q8 schema validator + S9 kafka frame shape + S14 write layout +
M2 regressor / M4 recommendations / S15 artifact sink.
"""

from __future__ import annotations

import json
import os
from datetime import datetime

from pyspark.sql import functions as F

from emdatapipelines_spark.clock import Clock
from emdatapipelines_spark.io import optimal_bucket_count, write_olap_table
from emdatapipelines_spark.ml.forest import save_model_with_metadata, train_forest_regressor
from emdatapipelines_spark.ml.recommend import recommendations
from emdatapipelines_spark.quality.schema import ColumnSpec, SchemaSpec, validate_schema
from emdatapipelines_spark.streaming.sinks import kafka_frame


def _spec():
    return SchemaSpec(
        "fema_disasters",
        [
            ColumnSpec("disaster_number", "numeric", required=True, not_null=True,
                       pattern=r"^\d{4,5}$"),
            ColumnSpec("state", "string", required=True, enum=["CO", "TX", "WA"]),
            ColumnSpec("severity", "numeric", min_value=0, max_value=10),
            ColumnSpec("declaration_date", "datetime", required=True),
        ],
    )


def test_validate_schema_clean(spark):
    df = spark.createDataFrame(
        [(4001, "CO", 5.0, datetime(2024, 1, 5))],
        "disaster_number int, state string, severity double, declaration_date timestamp",
    )
    report = validate_schema(df, _spec())
    assert report["is_valid"] and report["compliance_score"] == 1.0


def test_validate_schema_violations(spark):
    df = spark.createDataFrame(
        [
            (123, "CO", 5.0),     # pattern violation (3 digits)
            (None, "ZZ", 11.0),   # null + enum + range violations
        ],
        "disaster_number int, state string, severity double",
    )
    report = validate_schema(df, _spec())
    assert not report["is_valid"]
    assert "missing required column: declaration_date" in report["structural_errors"]
    assert report["violations"]["disaster_number.null_violations"] == 1
    assert report["violations"]["disaster_number.pattern_violations"] == 1
    assert report["violations"]["state.enum_violations"] == 1
    assert report["violations"]["severity.range_violations"] == 1
    assert 0 <= report["compliance_score"] < 1


def test_kafka_frame_shape(spark):
    df = spark.createDataFrame([(1, "CO", 9.5)], "event_id int, state string, score double")
    shaped = kafka_frame(df, key_col="state")
    assert shaped.columns == ["key", "value"]
    row = shaped.first()
    assert row["key"] == "CO"
    assert json.loads(row["value"]) == {"event_id": 1, "state": "CO", "score": 9.5}


def test_write_olap_layout(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"S{i % 3}", 2020 + i % 2) for i in range(100)],
        "id int, state string, year int",
    )
    path = str(tmp_path / "olap")
    write_olap_table(df, path, partition_cols=["year"], distribute_by=["state"],
                     sort_by=["id"], buckets=4)
    # range-partition analog: one directory per year value
    assert sorted(d for d in os.listdir(path) if d.startswith("year=")) == ["year=2020", "year=2021"]
    assert spark.read.parquet(path).count() == 100
    assert [optimal_bucket_count(n) for n in (10, 5 * 10**5, 5 * 10**6, 5 * 10**7, 10**9)] == [1, 4, 8, 16, 32]


def test_forest_regressor_and_artifact_sink(spark, tmp_path):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.rand(8)], float(i % 5)) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>, label double")
    model, metrics = train_forest_regressor(df, num_trees=5, max_depth=3)
    assert metrics["mse"] >= 0 and metrics["n_train"] + metrics["n_test"] == 200

    meta = save_model_with_metadata(model, str(tmp_path / "model"), metrics, spark, "risk_rf")
    got = {r["metric_name"]: r["metric_value"] for r in meta.collect()}
    assert "mse" in got and got["mse"] == metrics["mse"]
    assert os.path.exists(str(tmp_path / "model"))


def test_recommendations_rules():
    recs = recommendations(
        model_accuracy=0.5,
        recent_risk_level="HIGH",
        quality_status="POOR",
        clock=Clock(datetime(2024, 7, 15)),
    )
    cats = [r["category"] for r in recs]
    assert cats == sorted(cats, key=lambda c: [r["category"] for r in recs].index(c))  # stable
    assert {r["category"] for r in recs} == {"model", "operations", "data_quality", "seasonal"}
    assert recs[0]["priority"] == 1
    assert any("wildfire" in r["action"] for r in recs)  # July → summer watch
