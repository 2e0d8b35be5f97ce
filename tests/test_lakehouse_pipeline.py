"""Medallion-lakehouse composition: the versioned sink, WAP gating,
streaming incremental rollup, compaction, CDF, drift, and alert rules
working as ONE pipeline over the events fixture — the serving-layer
switch-over story (the reference's StarRocks ingestion + Grafana monitoring,
re-expressed as snapshot commits + metric frames)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from emdatapipelines_spark.operators.reaggregate import merge_partials
from emdatapipelines_spark.quality.alerts import AlertRule, evaluate_alert_rules
from emdatapipelines_spark.quality.drift import bin_counts, psi_by_bin
from emdatapipelines_spark.queries.registry import t
from emdatapipelines_spark.streaming.incremental import apply_rollup_batch
from emdatapipelines_spark.versioned import (
    AuditFailed,
    compact,
    diff_versions,
    history,
    read_versioned,
    write_versioned,
)

SF_SMALL = "/root/testdata/sf0.001"


def _no_null_keys(staged):
    n = staged.filter("event_id IS NULL OR ts IS NULL").count()
    return [f"{n} rows with null keys"] if n else []


def test_medallion_roundtrip(spark, tmp_path):
    events = t(spark, SF_SMALL, "events")
    first = events.filter("ts <  TIMESTAMP '2024-01-16 00:00:00'")
    second = events.filter("ts >= TIMESTAMP '2024-01-16 00:00:00'")
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")

    # -- bronze: WAP-gated raw commits ------------------------------------
    assert write_versioned(first, bronze, audit=_no_null_keys) == 0
    poisoned = second.unionByName(
        spark.createDataFrame(
            [(None, None, 1, "click", 1.0, "{}")], second.schema
        )
    )
    with pytest.raises(AuditFailed):
        write_versioned(poisoned, bronze, mode="append", audit=_no_null_keys)
    assert [h["version"] for h in history(bronze)] == [0]  # bad batch invisible
    assert write_versioned(second, bronze, mode="append", audit=_no_null_keys) == 1

    # CDF bronze v0 → v1: pure inserts, exactly the second half
    changes = diff_versions(spark, bronze, 0, 1, keys=["event_id"])
    kinds = {r["change_type"] for r in changes.select("change_type").distinct().collect()}
    assert kinds == {"insert"}
    assert changes.count() == second.count()

    # -- silver: incremental partials, one batch per bronze commit --------
    for bid, v in ((0, 0), (1, 1)):
        batch = (
            read_versioned(spark, bronze, v)
            if v == 0
            else diff_versions(spark, bronze, v - 1, v, keys=["event_id"]).join(
                read_versioned(spark, bronze, v), "event_id"
            ).drop("change_type")
        )
        assert apply_rollup_batch(
            batch, bid, silver, ["event_type"], {"value": "value"}
        )

    compact(spark, silver, num_files=1)

    # -- gold: serve from partials == direct aggregation over ALL bronze --
    gold = {
        r["event_type"]: (round(r["value_sum"], 2), r["value_n"])
        for r in merge_partials(
            read_versioned(spark, silver), ["event_type"], ["value"]
        ).collect()
    }
    direct = {
        r["event_type"]: (round(r["s"], 2), r["n"])
        for r in events.groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(38,2)")).cast("double").alias("s"),
            F.count("value").alias("n"),
        )
        .collect()
    }
    assert gold == direct

    # -- monitoring: PSI of second half vs first, fed to alert rules ------
    bins = lambda df: bin_counts(df, F.floor(F.col("value") / 50).cast("int"))  # noqa: E731
    psi = psi_by_bin(bins(first), bins(second))
    total_psi = psi.agg(F.sum("psi_term").alias("v")).collect()[0]["v"]
    metrics = spark.createDataFrame(
        [("events", "psi_value_dist", float(total_psi))], "entity STRING, metric STRING, value DOUBLE"
    )
    fired = evaluate_alert_rules(
        metrics,
        [AlertRule(name="value_drift", metric="psi_value_dist", op="gt", warn=0.1, crit=0.25)],
    )
    # fixture halves are near-identically distributed → no alert fires
    assert fired.count() == 0
    # sanity: a hair-trigger rule DOES fire through the same path
    assert (
        evaluate_alert_rules(
            metrics,
            [AlertRule(name="any_drift", metric="psi_value_dist", op="gt", warn=-1.0)],
        ).count()
        == 1
    )
