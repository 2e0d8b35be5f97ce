"""The batch ingestion lifecycle (SURVEY §3.1): fetch → conform → validate →
quality-gate → enrich → write.

≈ the reference's scheduled path: Dagster cron → ingestion asset → pandas
conform → Kafka keyed produce → processed asset → StarRocks bulk upsert
(`assets/raw_data.py:38-99` → `assets/processed_data.py:24-115` →
`resources/database.py:86-138`). Here the whole chain is one Catalyst plan
per source ending in a partitioned columnar write; the quality gate decides
land-vs-quarantine instead of failing the batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..clock import DEFAULT_CLOCK, Clock
from ..io import write_olap_table
from ..quality.schema import SchemaSpec, validate_schema
from ..sources.rest import Fetcher, RestSourceConfig, ingest_rest_source


@dataclass
class IngestResult:
    source: str
    n_rows: int
    landed: bool
    schema_report: dict = field(default_factory=dict)
    output_path: str | None = None


def run_ingestion(
    spark: SparkSession,
    config: RestSourceConfig,
    fetcher: Fetcher,
    output_path: str,
    schema_spec: SchemaSpec | None = None,
    min_compliance: float = 0.8,
    partition_cols: list[str] | None = None,
    distribute_by: list[str] | None = None,
    clock: Clock = DEFAULT_CLOCK,
    quarantine_path: str | None = None,
) -> IngestResult:
    """One source's ingestion run. Data that fails the schema-compliance gate
    lands in quarantine (if given) instead of the public table — mirroring
    the reference's quality-check-then-store flow
    (`ops/data_quality_ops.py:738-872` feeding `jobs/quality_jobs.py`)."""
    df: DataFrame = ingest_rest_source(spark, config, fetcher, clock=clock)
    n_rows = df.count()

    report: dict = {}
    landed = True
    if schema_spec is not None and n_rows > 0:
        report = validate_schema(df, schema_spec)
        landed = report["compliance_score"] >= min_compliance

    target = output_path if landed else (quarantine_path or output_path + "__quarantine")
    write_olap_table(
        df,
        target,
        partition_cols=partition_cols,
        distribute_by=distribute_by,
        buckets=4,
    )
    return IngestResult(
        source=config.name,
        n_rows=n_rows,
        landed=landed,
        schema_report=report,
        output_path=target,
    )
