"""Declarative alert-rule evaluation over quality metrics.

Twin of the reference's rule-based monitoring sensors
(``sensors/error_sensors.py:75-101`` — tiered error thresholds with
warning/critical severities; ``:349-411`` — degradation ratios with
per-component severity escalation when ≥2 issues fire;
``sensors/public_sensors.py`` — the same shape over public-source run
metadata). The reference walks Python dicts per sensor tick; here the
rules are DATA (a tiny broadcast table) evaluated against a metrics
DataFrame in one joined projection, so the same rule set runs over five
metrics or five billion without a plan change.

Expected metrics shape is long-form ``(entity, metric, value)`` — what
the Q1–Q9 operators produce once melted — so new rules never change the
schema.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

_OPS = ("gt", "ge", "lt", "le")


@dataclass(frozen=True)
class AlertRule:
    """One tiered threshold rule: fire 'warning' past ``warn``, escalate to
    'critical' past ``crit`` (reference error_thresholds shape :75-101)."""

    name: str
    metric: str
    op: str = "gt"
    warn: float | None = None
    crit: float | None = None

    def __post_init__(self):
        if self.op not in _OPS:
            raise ValueError(f"op must be one of {_OPS}, got {self.op!r}")
        if self.warn is None and self.crit is None:
            raise ValueError(f"rule {self.name!r} needs at least one threshold")


def _breach(op: str, value: Column, thr: Column) -> Column:
    if op == "gt":
        return value > thr
    if op == "ge":
        return value >= thr
    if op == "lt":
        return value < thr
    return value <= thr


def evaluate_alert_rules(
    metrics: DataFrame,
    rules: list[AlertRule],
    entity_col: str = "entity",
    metric_col: str = "metric",
    value_col: str = "value",
) -> DataFrame:
    """Fired alerts: one row per (entity, rule) whose value crosses a tier.

    The rule table is literal-sized → broadcast join against the (already
    aggregated, hence small) metrics frame: no shuffle is added on top of
    whatever produced the metrics. Output: (entity, rule_name, metric,
    value, threshold, severity) with threshold = the highest tier crossed.
    """
    spark = metrics.sparkSession
    rules_df = spark.createDataFrame(
        [(r.name, r.metric, r.op, r.warn, r.crit) for r in rules],
        "rule_name string, rule_metric string, op string, warn double, crit double",
    )
    j = metrics.join(
        F.broadcast(rules_df), F.col(metric_col) == F.col("rule_metric"), "inner"
    )
    value = F.col(value_col)
    crit_hit = F.lit(False)
    warn_hit = F.lit(False)
    for op in _OPS:  # dispatch comparator column → expression per op
        crit_hit = F.when((F.col("op") == op) & F.col("crit").isNotNull(), _breach(op, value, F.col("crit"))).otherwise(crit_hit)
        warn_hit = F.when((F.col("op") == op) & F.col("warn").isNotNull(), _breach(op, value, F.col("warn"))).otherwise(warn_hit)
    severity = F.when(crit_hit, F.lit("critical")).when(warn_hit, F.lit("warning"))
    return (
        j.withColumn("severity", severity)
        .filter(F.col("severity").isNotNull())
        .select(
            F.col(entity_col).alias("entity"),
            "rule_name",
            F.col(metric_col).alias("metric"),
            value.alias("value"),
            F.when(F.col("severity") == "critical", F.col("crit")).otherwise(F.col("warn")).alias("threshold"),
            "severity",
        )
    )


def escalate_entities(fired: DataFrame, min_alerts: int = 2) -> DataFrame:
    """Per-entity escalation (reference ``:411``: 'severe' when ≥2 issues
    fire for a component, else 'moderate'). Input is
    :func:`evaluate_alert_rules` output; one groupBy over the tiny fired
    set."""
    return fired.groupBy("entity").agg(
        F.count(F.lit(1)).alias("n_alerts"),
        F.sum((F.col("severity") == "critical").cast("int")).alias("n_critical"),
        F.when(F.count(F.lit(1)) >= min_alerts, F.lit("severe"))
        .otherwise(F.lit("moderate"))
        .alias("escalation"),
    )
