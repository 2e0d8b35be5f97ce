"""The composed governed run (VERDICT r10 stretch #7): staging -> marts
(incl. the graph/text MV roots) -> metrics -> public under lineage,
quality gates, retention, and SCD2 — one registry, one report."""

from __future__ import annotations

import pytest

from emdatapipelines_spark.pipelines.governed import run_governed_pipeline

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def report(spark):
    return run_governed_pipeline(spark, SF)


def test_gates_pass_and_tables_serve(report):
    assert report["gate_status"] == "pass", report["gate_failures"]
    assert set(report["gate_results"].values()) == {"pass"}
    counts = report["table_counts"]
    for name in ("public_disasters", "public_region_stats", "graph_edges",
                 "doc_shingles", "graph_pagerank"):
        assert counts.get(name, 0) > 0, f"{name} empty"


def test_retention_purges_and_logs_compliance(report):
    r = report["retention"]
    assert r["rows_before"] == r["rows_kept"] + r["rows_purged"]
    # events span a month against the frozen 2024-02-01 clock, so a
    # 21-day window must purge a nonempty strict subset
    assert 0 < r["rows_purged"] < r["rows_before"]
    assert report["compliance_events"] >= 1


def test_scd2_versions(report):
    s = report["scd2"]
    # merge closes changed versions and appends fresh ones: total rows
    # strictly exceed current rows, and both are nonzero
    assert 0 < s["current_rows"] < s["snapshot_rows"]


def test_lineage_covers_every_model(report):
    assert report["lineage_records"] >= report["n_models"]
    assert report["wall_sec"] > 0
