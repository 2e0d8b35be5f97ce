"""Alert-rule evaluation (quality/alerts.py) — tier selection, comparator
dispatch, escalation. Twin of sensors/error_sensors.py:75-101,349-411."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from emdatapipelines_spark.quality.alerts import (
    AlertRule,
    escalate_entities,
    evaluate_alert_rules,
)


def _metrics(spark, rows):
    return spark.createDataFrame(rows, "entity string, metric string, value double")


def test_tier_selection_critical_beats_warning(spark):
    m = _metrics(
        spark,
        [("a", "err_rate", 0.6), ("b", "err_rate", 0.3), ("c", "err_rate", 0.1)],
    )
    fired = evaluate_alert_rules(
        m, [AlertRule("errs", "err_rate", "gt", warn=0.2, crit=0.5)]
    ).collect()
    got = {r["entity"]: (r["severity"], r["threshold"]) for r in fired}
    # a crosses BOTH tiers -> critical only, with the critical threshold
    assert got == {"a": ("critical", 0.5), "b": ("warning", 0.2)}


def test_comparator_dispatch(spark):
    m = _metrics(spark, [("x", "throughput", 0.4), ("y", "throughput", 0.9)])
    fired = evaluate_alert_rules(
        m, [AlertRule("tput_low", "throughput", "lt", warn=0.8, crit=0.5)]
    ).collect()
    got = {r["entity"]: r["severity"] for r in fired}
    assert got == {"x": "critical"}  # y is above warn -> silent
    for op, val, fires in [("ge", 0.2, True), ("le", 0.2, True), ("gt", 0.2, False)]:
        f = evaluate_alert_rules(
            _metrics(spark, [("e", "m", 0.2)]), [AlertRule("r", "m", op, warn=0.2)]
        ).count()
        assert (f == 1) == fires, (op, val)


def test_warn_only_and_crit_only_rules(spark):
    m = _metrics(spark, [("a", "lat", 5.0)])
    warn_only = evaluate_alert_rules(m, [AlertRule("w", "lat", "gt", warn=1.0)]).collect()
    assert warn_only[0]["severity"] == "warning"
    crit_only = evaluate_alert_rules(m, [AlertRule("c", "lat", "gt", crit=1.0)]).collect()
    assert crit_only[0]["severity"] == "critical"


def test_unmatched_metric_and_quiet_values_fire_nothing(spark):
    m = _metrics(spark, [("a", "other_metric", 99.0), ("b", "err_rate", 0.05)])
    assert (
        evaluate_alert_rules(m, [AlertRule("errs", "err_rate", "gt", warn=0.2)]).count()
        == 0
    )


def test_escalation_severe_at_two_alerts(spark):
    m = _metrics(
        spark,
        [("a", "err_rate", 0.9), ("a", "lat_ms", 900.0), ("b", "err_rate", 0.9)],
    )
    fired = evaluate_alert_rules(
        m,
        [
            AlertRule("errs", "err_rate", "gt", warn=0.2, crit=0.5),
            AlertRule("lat", "lat_ms", "gt", warn=500.0),
        ],
    )
    esc = {r["entity"]: r for r in escalate_entities(fired).collect()}
    assert esc["a"]["escalation"] == "severe" and esc["a"]["n_alerts"] == 2
    assert esc["b"]["escalation"] == "moderate" and esc["b"]["n_critical"] == 1


def test_rule_validation():
    with pytest.raises(ValueError):
        AlertRule("bad", "m", "between", warn=1.0)
    with pytest.raises(ValueError):
        AlertRule("bad", "m", "gt")


def test_alert_rules_over_streaming_microbatches(spark, tmp_path):
    """Alert evaluation composes with Structured Streaming: per-microbatch
    metrics (foreachBatch) flow through the same rule table — the streaming
    twin of the reference's sensor tick (error_sensors.py:25-146)."""
    from emdatapipelines_spark.queries.registry import t as load
    from emdatapipelines_spark.streaming.sources import stream_source

    events_dir = str(tmp_path / "events")
    load(spark, "/root/testdata/sf0.001", "events").write.mode("overwrite").parquet(events_dir)
    schema = spark.read.parquet(events_dir).schema
    stream = stream_source(spark, "file", schema=schema, path=events_dir).drop("proc_time")

    fired_batches = []
    rules = [AlertRule("low_value", "mean_value", "lt", warn=60.0, crit=10.0)]

    def on_batch(batch_df, batch_id):
        metrics = batch_df.groupBy(F.col("event_type").alias("entity")).agg(
            F.avg("value").alias("value")
        ).withColumn("metric", F.lit("mean_value"))
        fired_batches.append(evaluate_alert_rules(metrics, rules).collect())

    q = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    fired = [r for b in fired_batches for r in b]
    # fixture means are ~48-51 -> every event_type breaches the warn tier
    assert len(fired) >= 5 and all(r["severity"] == "warning" for r in fired)
