"""Lineage + compliance records (`lineage.py`): the reference's
`create_data_lineage_record.sql` / `log_federal_compliance_event.sql` analog,
emitted from the model-registry build path and the retention filter.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from emdatapipelines_spark.audit import retention_filter
from emdatapipelines_spark.lineage import GovernanceLog
from emdatapipelines_spark.plans.registry import Model, ModelRegistry


def _toy_registry(gov):
    reg = ModelRegistry(governance=gov)
    reg.register(Model("src_a", lambda spark, deps: spark.range(5).withColumnRenamed("id", "a")))
    reg.register(Model("src_b", lambda spark, deps: spark.range(3).withColumnRenamed("id", "b")))
    reg.register(
        Model(
            "mart_ab",
            lambda spark, deps: deps["src_a"].crossJoin(deps["src_b"]),
            deps=["src_a", "src_b"],
            materialization="table",
        )
    )
    return reg


def test_build_emits_one_lineage_edge_per_dependency(spark):
    gov = GovernanceLog(frameworks=["FedRAMP", "FISMA"], user_name="etl")
    reg = _toy_registry(gov)
    reg.build(spark)

    assert gov.edges() == {
        ("<none>", "src_a"),
        ("<none>", "src_b"),
        ("src_a", "mart_ab"),
        ("src_b", "mart_ab"),
    }
    df = gov.lineage_df(spark)
    assert df.count() == 4
    row = df.filter(F.col("target_table") == "mart_ab").first()
    assert row["transformation_type"] == "table"
    assert row["compliance_frameworks"] == "FedRAMP,FISMA"
    assert row["run_id"] == gov.run_id
    assert row["user_name"] == "etl"

    # transitive upstream closure — the impact question lineage answers
    assert gov.upstream_of("mart_ab") == {"src_a", "src_b"}
    assert gov.upstream_of("src_a") == set()


def test_refresh_and_scheduler_tick_emit_refresh_lineage(spark):
    gov = GovernanceLog()
    reg = _toy_registry(gov)
    reg._models["mart_ab"].refresh_interval = timedelta(minutes=5)
    t0 = datetime(2024, 2, 1)
    reg.build(spark, now=t0)
    n_after_build = len(gov.lineage_rows)
    assert reg.run_due(spark, t0 + timedelta(minutes=1)) == []  # fresh → no-op
    assert len(gov.lineage_rows) == n_after_build
    assert reg.run_due(spark, t0 + timedelta(minutes=6)) == ["mart_ab"]
    assert gov.lineage_rows[-1][1] == "mart_ab"
    assert gov.lineage_rows[-1][2] == "refresh:table"


def test_retention_filter_logs_compliance_event(spark):
    gov = GovernanceLog(frameworks=["FISMA"], environment="prod")
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1),), (datetime(2020, 1, 1),)], "ts timestamp"
    )
    kept = retention_filter(df, "ts", 365, governance=gov, table_name="events")
    assert kept.count() == 1  # the 2020 row ages out
    ev = gov.compliance_df(spark).first()
    assert ev["event_type"] == "retention_enforced"
    assert ev["table_name"] == "events"
    assert ev["environment"] == "prod"
    assert ev["compliance_frameworks"] == "FISMA"


def test_flush_appends_to_parquet_audit_tables(spark, tmp_path):
    gov = GovernanceLog()
    gov.lineage_record(["a"], "b", "view")
    gov.compliance_event("export_approved", "b", "ticket-42")
    lp, cp = str(tmp_path / "lineage"), str(tmp_path / "compliance")
    gov.flush(spark, lp, cp)
    assert not gov.lineage_rows and not gov.compliance_rows
    # second invocation appends (INSERT INTO semantics)
    gov.lineage_record(["b"], "c", "view")
    gov.flush(spark, lp, cp)
    audit = spark.read.parquet(lp)
    assert audit.count() == 2
    assert {r["target_table"] for r in audit.collect()} == {"b", "c"}
    assert spark.read.parquet(cp).first()["event_details"] == "ticket-42"


def test_query_engine_emits_data_access_and_denial_events(spark):
    """The query boundary is where the reference logs federal-compliance
    usage: every served query emits a data_access event, and a rate-limit
    rejection emits rate_limit_denied BEFORE raising."""
    import pytest

    from emdatapipelines_spark.api import QueryEngine

    gov = GovernanceLog(frameworks=["FedRAMP"])
    eng = QueryEngine(spark, governance=gov)
    spark.range(3).createOrReplaceTempView("gov_probe")
    eng.sql("SELECT COUNT(*) AS n FROM gov_probe", org="lab", org_type="research")
    assert [r[0] for r in gov.compliance_rows] == ["data_access"]
    assert "org=lab" in gov.compliance_rows[0][2]

    eng.rate_limiter.quotas["research"] = 1  # next call exceeds
    with pytest.raises(PermissionError):
        eng.sql("SELECT 1 AS x", org="lab", org_type="research")
    assert [r[0] for r in gov.compliance_rows] == ["data_access", "rate_limit_denied"]
