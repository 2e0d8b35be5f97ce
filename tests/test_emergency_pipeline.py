"""End-to-end rebuild of the reference's staging→marts→metrics→public DAG
over the sf0.001 fixtures (SURVEY §7.2 step 5).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from emdatapipelines_spark.pipelines import build_emergency_dag

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dag_results(spark):
    reg = build_emergency_dag(spark, SF_SMALL)
    results = reg.build(spark)
    return reg, results


def test_all_layers_materialize(spark, dag_results):
    _, results = dag_results
    expected = {
        "src_declarations", "src_alerts", "seed_regions",
        "stg_declarations", "stg_alerts",
        "emergency_events", "disaster_analytics",
        "data_quality_metrics", "public_disasters", "public_region_stats",
    }
    assert expected <= set(results)
    for name in expected:
        assert results[name].count() > 0, name
    # models are queryable by name, like dbt refs
    assert spark.sql("SELECT COUNT(*) c FROM emergency_events").first()["c"] > 0


def test_staging_contract(dag_results):
    _, results = dag_results
    stg = results["stg_declarations"]
    for c in ("ingestion_timestamp", "data_source", "data_classification", "retention_date"):
        assert c in stg.columns
    assert stg.filter(F.col("declaration_id").isNull()).count() == 0


def test_union_and_enrichment(dag_results):
    _, results = dag_results
    ev = results["emergency_events"]
    srcs = {r["event_source"] for r in ev.select("event_source").distinct().collect()}
    assert srcs == {"DECLARATION", "ALERT"}
    # dim enrichment is left-extending: every row keeps a region_key
    assert ev.filter(F.col("region_key").isNull()).count() == 0
    assert {r["event_season"] for r in ev.select("event_season").distinct().collect()} <= {
        "WINTER", "SPRING", "SUMMER", "FALL"
    }


def test_analytics_trend_labels(dag_results):
    _, results = dag_results
    da = results["disaster_analytics"]
    labels = {r["trend"] for r in da.select("trend").distinct().collect()}
    assert labels <= {"INCREASING", "DECREASING", "STABLE", None}
    # surrogate key is unique
    assert da.count() == da.select("analytics_id").distinct().count()


def test_public_privacy_threshold(dag_results):
    _, results = dag_results
    pub = results["public_region_stats"]
    assert pub.filter(F.col("group_size") < 5).count() == 0
    # privacy rounding to -3 → all totals are multiples of 1000
    assert pub.filter(F.col("total_magnitude_rounded") % 1000 != 0).count() == 0


def test_public_codes_unique(dag_results):
    _, results = dag_results
    pub = results["public_disasters"]
    assert pub.count() == pub.select("public_code").distinct().count()


def test_weather_impacts_null_extension(spark, dag_results):
    _, results = dag_results
    wi = results["weather_impacts"]
    # left interval join: every daily row survives, matched or not
    stg = results["stg_alerts"]
    assert wi.count() == stg.select("region_key", "alert_date").distinct().count()
    # null-extension semantics: unmatched days carry FALSE, never NULL
    assert wi.filter(F.col("has_concurrent_alert").isNull()).count() == 0
    flags = {r["has_concurrent_alert"] for r in wi.select("has_concurrent_alert").distinct().collect()}
    assert flags == {True, False}


def test_scd2_snapshot_lifecycle_over_dag(spark, dag_results):
    """dbt-snapshot flow on top of the DAG: day-1 snapshot of the current
    declarations, then a merged day-2 source with changes/deletes/inserts."""
    from emdatapipelines_spark.operators.scd2 import IS_CURRENT, scd2_init, scd2_merge

    _, results = dag_results
    src = results["stg_declarations"].select(
        "declaration_id", "incident_type", F.col("processed_at").alias("updated_at")
    )
    snap = scd2_init(src, "updated_at")
    day2 = src.withColumn("updated_at", F.col("updated_at") + F.expr("INTERVAL 1 DAY")).withColumn(
        "incident_type",
        F.when(F.col("declaration_id") % 7 == 0, F.lit("RECLASSIFIED")).otherwise(
            F.col("incident_type")
        ),
    ).filter(F.col("declaration_id") % 11 != 0)  # hard deletes
    merged = scd2_merge(snap, day2, key="declaration_id", updated_at="updated_at")
    n_src = src.count()
    cur = merged.filter(F.col(IS_CURRENT))
    # every non-deleted key has exactly one current version
    assert cur.count() == day2.count()
    # changed keys carry history: closed old version + open new one
    changed = merged.filter(F.col("incident_type") == "RECLASSIFIED")
    assert changed.count() > 0 and changed.filter(~F.col(IS_CURRENT)).count() == 0
    assert merged.count() >= n_src


def test_mv_refresh(spark, dag_results):
    reg, results = dag_results
    before = results["public_region_stats"].count()
    refreshed = reg.refresh_materialized(spark, "public_region_stats")
    assert refreshed.count() == before
