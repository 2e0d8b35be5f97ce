"""Usage-metrics and API-performance marts over the engine's request log.

The reference materializes two operational views over its serving layer:
a 7-day windowed per-endpoint usage rollup
(`dbt_projects/emergency_data/models/metrics/usage_metrics.sql:6-76` —
request counts, distinct hours accessed, first/last access, success rate,
health + usage-level ladders) and a dataset-health / performance view
(`models/metrics/api_performance.sql:1-99` — totals, recent activity,
error rates, coverage and freshness ladders). Both are views over whatever
the platform logged; here the log is a first-class DataFrame.

Spark-first analog:

- :func:`usage_log_frame` materializes :class:`~emdatapipelines_spark.api.
  QueryEngine`'s driver-side ``usage_log`` (metadata-rate, one row per
  served query) as a typed DataFrame, so the marts below run over the
  engine's OWN serving history;
- :func:`usage_metrics` / :func:`api_performance` are generic over any
  request-log frame ``(endpoint, ts, ok, latency_ms, org)`` — at 100 TB the
  log is a partitioned parquet table appended by the serving tier and both
  marts are single hash-aggregate passes (map-side partial combine; the
  percentile buffer is the only per-group state). "now" comes from the
  injectable :class:`~emdatapipelines_spark.clock.Clock`, never the wall
  clock (determinism convention).

Latency percentiles use Spark's exact ``percentile`` (one sort buffer per
group, all three fractions in a single buffer) so the mart is
oracle-comparable; at 100 TB swap to ``percentile_approx`` — the documented
accuracy/cost knob, same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .clock import DEFAULT_CLOCK, Clock

_LOG_SCHEMA = (
    "endpoint string, ts timestamp, ok boolean, latency_ms double, org string"
)


def usage_log_frame(spark: SparkSession, usage_log: list[dict]) -> DataFrame:
    """Materialize ``QueryEngine.usage_log`` entries as a request-log frame.

    The engine log is per-served-query (metadata-rate — a driver list is the
    right cost model; see `lineage.py`), so this is a bounded
    ``createDataFrame``, not a data-path collect."""
    rows = [
        (
            e.get("type", "other"),
            float(e["at"]),
            bool(e.get("ok", True)),
            float(e.get("elapsed_ms", 0.0)),
            e.get("org", "anonymous"),
        )
        for e in usage_log
    ]
    df = spark.createDataFrame(
        rows, "endpoint string, at double, ok boolean, latency_ms double, org string"
    )
    return df.select(
        "endpoint",
        F.timestamp_seconds("at").alias("ts"),
        "ok",
        "latency_ms",
        "org",
    )


def usage_metrics(
    log: DataFrame, clock: Clock = DEFAULT_CLOCK, window_days: int = 7
) -> DataFrame:
    """Per-endpoint usage rollup over the trailing ``window_days``
    (`models/metrics/usage_metrics.sql:6-76`): request volume, distinct
    hours accessed, first/last access, success rate, and the reference's
    health/usage ladders. One hash aggregate keyed by endpoint."""
    recent = log.filter(F.col("ts") >= F.to_timestamp(clock.date_sub(window_days)))
    agg = recent.groupBy("endpoint").agg(
        F.count(F.lit(1)).cast("bigint").alias("total_requests"),
        F.countDistinct(F.date_trunc("hour", "ts")).cast("bigint").alias(
            "unique_hours_accessed"
        ),
        F.min("ts").alias("first_access"),
        F.max("ts").alias("last_access"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("__n_ok"),
    )
    rate = F.col("__n_ok") * 1.0 / F.col("total_requests")
    health = (
        F.when(rate >= 0.99, "EXCELLENT")
        .when(rate >= 0.95, "GOOD")
        .when(rate >= 0.90, "ACCEPTABLE")
        .otherwise("DEGRADED")
    )
    usage = (
        F.when(F.col("total_requests") > 1000, "HIGH_USAGE")
        .when(F.col("total_requests") > 100, "MODERATE_USAGE")
        .when(F.col("total_requests") > 10, "LOW_USAGE")
        .otherwise("MINIMAL_USAGE")
    )
    # percents/ratios round in the INTEGER domain (round(x*10^k)/10^k):
    # a decimal tie like 3/20 = 0.15 is unrepresentable as a double, and
    # Spark rounds the shortest decimal repr while DuckDB rounds the exact
    # binary value — they disagree exactly at such ties. Scaled to integer
    # ties (x.5), the tie value IS representable and both engines round it
    # half-away-from-zero identically.
    return agg.select(
        F.col("endpoint").alias("api_endpoint"),
        "total_requests",
        "unique_hours_accessed",
        "first_access",
        "last_access",
        (F.round(F.col("__n_ok") * 10000.0 / F.col("total_requests")) / 100.0).alias(
            "success_rate_percent"
        ),
        F.round(F.col("total_requests") / float(window_days), 0).alias(
            "avg_daily_requests"
        ),
        (
            F.round(F.col("total_requests") * 10.0 / F.col("unique_hours_accessed"))
            / 10.0
        ).alias("avg_requests_per_hour"),
        health.alias("system_health_status"),
        usage.alias("usage_level"),
        clock.timestamp().alias("metrics_generated_at"),
    )


def api_performance(
    log: DataFrame,
    clock: Clock = DEFAULT_CLOCK,
    window_days: int = 365,
    recent_days: int = 7,
) -> DataFrame:
    """Per-endpoint serving-health view
    (`models/metrics/api_performance.sql:1-99`): totals, recent activity,
    error counts, caller coverage, latency percentiles (p50/p95/p99 in ONE
    exact-percentile buffer — the a11 pattern), activity/error percents and
    the reference's coverage + compliance ladders. One hash aggregate."""
    windowed = log.filter(F.col("ts") >= F.to_timestamp(clock.date_sub(window_days)))
    recent_cut = F.to_timestamp(clock.date_sub(recent_days))
    pcts = F.percentile(
        "latency_ms", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99))
    )
    agg = windowed.groupBy("endpoint").agg(
        F.count(F.lit(1)).cast("bigint").alias("total_requests"),
        F.sum(F.when(F.col("ts") >= recent_cut, 1).otherwise(0))
        .cast("bigint")
        .alias("recent_requests"),
        F.sum(F.when(~F.col("ok"), 1).otherwise(0)).cast("bigint").alias(
            "error_requests"
        ),
        F.countDistinct("org").cast("bigint").alias("distinct_orgs"),
        F.max("ts").alias("last_request_at"),
        pcts.alias("__p"),
    )
    coverage = (
        F.when(F.col("distinct_orgs") >= 45, "BROAD_COVERAGE")
        .when(F.col("distinct_orgs") >= 30, "WIDE_COVERAGE")
        .when(F.col("distinct_orgs") >= 10, "MULTI_ORG_COVERAGE")
        .otherwise("LIMITED_COVERAGE")
    )
    freshness = (
        F.when(
            F.col("last_request_at") >= clock.timestamp() - F.expr("INTERVAL 6 HOURS"),
            "CURRENT",
        )
        .when(
            F.col("last_request_at") >= clock.timestamp() - F.expr("INTERVAL 24 HOURS"),
            "RECENT",
        )
        .when(
            F.col("last_request_at") >= clock.timestamp() - F.expr("INTERVAL 48 HOURS"),
            "STALE",
        )
        .otherwise("OUTDATED")
    )
    # integer-domain rounding — see the tie note in usage_metrics
    recent_pct = F.round(
        F.col("recent_requests") * 10000.0 / F.col("total_requests")
    ) / 100.0
    compliance = (
        F.when(F.col("total_requests") == 0, "DATA_MISSING")
        .when(F.col("recent_requests") == 0, "NO_RECENT_ACTIVITY")
        .otherwise("OPERATIONAL")
    )
    return agg.select(
        F.col("endpoint").alias("api_endpoint"),
        "total_requests",
        "recent_requests",
        "error_requests",
        "distinct_orgs",
        F.round(F.element_at("__p", 1), 4).alias("p50_latency_ms"),
        F.round(F.element_at("__p", 2), 4).alias("p95_latency_ms"),
        F.round(F.element_at("__p", 3), 4).alias("p99_latency_ms"),
        recent_pct.alias("recent_activity_percent"),
        (
            F.round(F.col("error_requests") * 10000.0 / F.col("total_requests"))
            / 100.0
        ).alias("error_percent"),
        coverage.alias("caller_coverage"),
        freshness.alias("endpoint_freshness"),
        compliance.alias("compliance_status"),
        "last_request_at",
        clock.timestamp().alias("performance_check_timestamp"),
    )
