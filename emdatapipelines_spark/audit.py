"""Audit / classification / retention columns.

Every table in the reference carries mandated audit columns
(`resources/database.py:148-154`; `macros/data_classification.sql:2-26`;
staging models e.g. `models/staging/stg_fema_disasters.sql:41-49`):
``ingestion_timestamp, data_source, data_classification, retention_date,
processed_at, processing_version``. This module reproduces that contract as a
single declarative transformation (pure column expressions — JVM-side, no
Python UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .clock import DEFAULT_CLOCK, Clock

#: classification → retention days (`dbt_project.yml:52-83` retention_periods;
#: `resources/database.py:211-226` per-table policies 90/1095/2555 days).
RETENTION_DAYS = {
    "PUBLIC": 2555,
    "INTERNAL": 1095,
    "RESTRICTED": 90,
}


def with_audit_columns(
    df: DataFrame,
    data_source: str,
    classification: str = "PUBLIC",
    processing_version: str = "1.0",
    clock: Clock = DEFAULT_CLOCK,
) -> DataFrame:
    """Append the mandated audit columns (≈ `macros/data_classification.sql`
    ``add_audit_columns`` + `resources/database.py:148-154`)."""
    retention = RETENTION_DAYS.get(classification.upper(), 1095)
    return (
        df.withColumn("ingestion_timestamp", clock.timestamp())
        .withColumn("data_source", F.lit(data_source))
        .withColumn("data_classification", F.lit(classification.upper()))
        .withColumn("retention_date", F.date_add(clock.date(), retention))
        .withColumn("processed_at", clock.timestamp())
        .withColumn("processing_version", F.lit(processing_version))
    )


def retention_filter(
    df: DataFrame,
    ts_col: str,
    retention_days: int,
    clock: Clock = DEFAULT_CLOCK,
    governance=None,
    table_name: str | None = None,
) -> DataFrame:
    """Retention enforcement as a keep-filter rewrite.

    ≈ ``DELETE FROM t WHERE ts < DATE_SUB(NOW(), INTERVAL n DAY)``
    (`resources/database.py:211-226`, `jobs/public_jobs.py:309-356`). On
    immutable Parquet the delete is expressed as rewriting the retained rows;
    at 100 TB with date-partitioned layout this prunes to whole-partition
    drops instead of row scans.

    ``governance`` (a `lineage.GovernanceLog`) records the retention
    enforcement as a compliance event — the reference logs exactly this via
    `macros/log_federal_compliance_event.sql` when its cleanup jobs run.
    """
    if governance is not None:
        governance.compliance_event(
            "retention_enforced",
            table_name or "<unnamed>",
            f"{ts_col} < now - {retention_days}d",
        )
    return df.filter(F.col(ts_col) >= F.to_timestamp(F.lit(clock.iso_ts_sub(days=retention_days))))


def mask_sensitive(col, classification_col):
    """PII masking for non-admin readers — delegates to the reference-exact
    macro (`macros/federal_compliance.sql:15-25`: ``CONCAT(LEFT(col, 2),
    REPEAT('*', LENGTH(col) - 2))`` for RESTRICTED/CONFIDENTIAL rows)."""
    from .functions.macros import mask_sensitive as _mask

    return _mask(col, classification_col)
