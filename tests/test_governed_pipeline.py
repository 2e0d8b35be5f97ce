"""End-to-end governance composition: the round-2 subsystems working as one
pipeline — YAML source config → resilient fetcher → REST ingest → tenant
row-level scope → column encryption → per-tenant storage → quality alert
rules. This is the switch-over story for a reference user: every stage is
the Spark twin of a reference component (config_loader.py, api_clients.py,
raw_data.py ingestion, tenant_resources.py, utils/encryption.py,
sensors/error_sensors.py)."""

from __future__ import annotations

import textwrap

from pyspark.sql import functions as F

from emdatapipelines_spark.crypto import decrypt_columns, encrypt_columns
from emdatapipelines_spark.quality.alerts import AlertRule, evaluate_alert_rules
from emdatapipelines_spark.sources.config_loader import load_sources_yaml
from emdatapipelines_spark.sources.resilience import RetryPolicy, resilient_fetcher
from emdatapipelines_spark.sources.rest import ingest_rest_source
from emdatapipelines_spark.tenant import (
    load_tenant_yaml,
    tenant_storage_path,
    tenant_view,
)

SOURCES_YAML = textwrap.dedent(
    """
    fema:
      enabled: true
      api:
        base_url: "https://fake.test/v2/"
        retry_attempts: 3
        retry_delay_seconds: 0
      endpoints:
        declarations:
          path: "DisasterDeclarationsSummaries"
          required_fields: [disasterNumber, state, classification, contact_email]
          type_map: {disasterNumber: bigint}
          key_field: state
    """
)

TENANT_YAML = textwrap.dedent(
    """
    tenants:
      colorado_state:
        classification_level: "INTERNAL"
        database: {schema: "tenant_colorado"}
        data_restrictions:
          allowed_states: ["CO"]
          allowed_classifications: ["PUBLIC", "INTERNAL"]
    """
)

PAYLOAD = {
    "DisasterDeclarationsSummaries": [
        {"disasterNumber": "1", "state": "CO", "classification": "PUBLIC", "contact_email": "a@co.gov"},
        {"disasterNumber": "2", "state": "CO", "classification": "RESTRICTED", "contact_email": "b@co.gov"},
        {"disasterNumber": "3", "state": "TX", "classification": "PUBLIC", "contact_email": "c@tx.gov"},
    ]
}

MASTER = "e2e-master-secret"


def test_governed_ingest_to_tenant_store(spark, tmp_path):
    src_path = tmp_path / "sources.yml"
    src_path.write_text(SOURCES_YAML)
    ten_path = tmp_path / "tenants.yml"
    ten_path.write_text(TENANT_YAML)

    sources = load_sources_yaml(str(src_path), env={})
    tenants = load_tenant_yaml(str(ten_path), env={})

    # 1. config-driven ingest through the resilience policy (1 flaky failure)
    attempts = {"n": 0}

    def flaky(endpoint, params):
        attempts["n"] += 1
        if attempts["n"] == 1:
            raise ConnectionError("transient")
        return PAYLOAD

    fetch = resilient_fetcher(flaky, sources.retry_policy("fema"), sleep=lambda s: None)
    raw = ingest_rest_source(spark, sources.rest_config("fema", "declarations"), fetch)
    assert raw.count() == 3 and attempts["n"] == 2

    # 2. tenant row-level scope: CO + (PUBLIC|INTERNAL) only
    spec = tenants.get("colorado_state")
    scoped = tenant_view(raw, spec, scope_col="state", classification_col="classification")
    assert {r["disasterNumber"] for r in scoped.collect()} == {1}

    # 3. auto-encrypt sensitive columns under the tenant's derived keys
    secured = encrypt_columns(scoped, MASTER, tenant_id=spec.tenant_id)
    assert "contact_email_encrypted" in secured.columns
    assert secured.filter(F.col("contact_email").contains("@")).count() == 0

    # 4. per-tenant physical isolation
    out = tenant_storage_path(str(tmp_path / "lake"), spec)
    secured.write.mode("overwrite").parquet(out)
    assert "tenant_colorado" in out

    # 5. round-trip read + decrypt restores the plaintext for the right tenant
    back = decrypt_columns(
        spark.read.parquet(out), MASTER, ["contact_email"], tenant_id=spec.tenant_id
    )
    assert [r["contact_email"] for r in back.collect()] == ["a@co.gov"]
    wrong = decrypt_columns(
        spark.read.parquet(out), MASTER, ["contact_email"], tenant_id="other_tenant"
    )
    assert [r["contact_email"] for r in wrong.collect()] == [None]

    # 6. alert rules over ingest metrics: scoped-out fraction breaches warn
    metrics = spark.createDataFrame(
        [("fema_declarations", "scope_drop_rate", 2 / 3)], "entity string, metric string, value double"
    )
    fired = evaluate_alert_rules(
        metrics, [AlertRule("scope_drop", "scope_drop_rate", "gt", warn=0.5, crit=0.9)]
    ).collect()
    assert len(fired) == 1 and fired[0]["severity"] == "warning"
