"""Tenant isolation (tenant.py) — twin of tenant_resources.py:24-426.
Registry parsing, scope/classification predicates, storage paths, audit
action classification."""

from __future__ import annotations

import textwrap

import pytest

from pyspark.sql import functions as F

from emdatapipelines_spark.tenant import (
    TenantSpec,
    classify_action,
    load_tenant_yaml,
    parse_tenant_config,
    tenant_storage_path,
    tenant_view,
)

TENANT_YAML = textwrap.dedent(
    """
    tenants:
      colorado_state:
        organization: "State of Colorado Emergency Management"
        classification_level: "INTERNAL"
        database:
          schema: "tenant_colorado"
          password: "${COLORADO_DB_PASSWORD:-unset}"
          backup_retention_days: 2555
        data_restrictions:
          allowed_states: ["CO"]
          allowed_classifications: ["PUBLIC", "INTERNAL"]
      federal_fema:
        classification_level: "RESTRICTED"
        data_restrictions:
          allowed_states: ["ALL"]
    """
)


def _registry(tmp_path):
    p = tmp_path / "tenant_config.yml"
    p.write_text(TENANT_YAML)
    return load_tenant_yaml(str(p), env={})


def test_registry_parse_and_validate(tmp_path):
    reg = _registry(tmp_path)
    assert reg.all_tenants() == ["colorado_state", "federal_fema"]
    assert reg.validate_access("colorado_state") and not reg.validate_access("nope")
    with pytest.raises(KeyError):
        reg.get("nope")
    co = reg.get("colorado_state")
    assert co.schema == "tenant_colorado" and co.retention_days == 2555
    assert co.allowed_scopes == ["CO"] and co.organization.startswith("State of")


def test_effective_classifications_lattice():
    # explicit list wins
    assert TenantSpec("t", allowed_classifications=["PUBLIC"]).effective_classifications() == ["PUBLIC"]
    # otherwise everything <= the tenant's level
    assert TenantSpec("t", classification_level="RESTRICTED").effective_classifications() == [
        "PUBLIC",
        "INTERNAL",
        "RESTRICTED",
    ]


def test_tenant_view_scopes_rows_and_stamps_tenant(spark, tmp_path):
    reg = _registry(tmp_path)
    df = spark.createDataFrame(
        [(1, "CO", "PUBLIC"), (2, "CO", "RESTRICTED"), (3, "TX", "PUBLIC")],
        "id int, state string, classification string",
    )
    co = tenant_view(df, reg.get("colorado_state"), "state", "classification").collect()
    assert {(r["id"], r["tenant_id"]) for r in co} == {(1, "colorado_state")}
    # ALL scope + RESTRICTED level sees everything except CONFIDENTIAL
    fed = tenant_view(df, reg.get("federal_fema"), "state", "classification").collect()
    assert {r["id"] for r in fed} == {1, 2, 3}


def test_isolation_predicate_reaches_the_scan(spark, tmp_path):
    """The tenant filter must be a pushed data filter, not post-processing."""
    reg = _registry(tmp_path)
    path = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(1, "CO", "PUBLIC"), (2, "TX", "PUBLIC")], "id int, state string, classification string"
    ).write.mode("overwrite").parquet(path)
    plan = (
        tenant_view(spark.read.parquet(path), reg.get("colorado_state"), "state", "classification")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters:" in plan and "state" in plan.split("PushedFilters:")[1][:200]


def test_storage_path_isolation(tmp_path):
    reg = _registry(tmp_path)
    assert tenant_storage_path("s3://lake/", reg.get("colorado_state")).endswith(
        "/tenant_colorado"
    )
    assert (
        tenant_storage_path("/lake", TenantSpec("acme")).replace("\\", "/")
        == "/lake/tenant_acme"
    )


def test_classify_action():
    assert classify_action("SELECT * FROM t") == "READ"
    assert classify_action("  insert into t values (1)") == "WRITE"
    assert classify_action("CREATE TABLE x (i int)") == "DDL"
    assert classify_action("EXPLAIN SELECT 1") == "OTHER"
    assert classify_action("") == "OTHER"
