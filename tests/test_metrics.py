"""Usage-metrics / API-performance marts (metrics.py) — the reference's
`models/metrics/usage_metrics.sql` + `api_performance.sql` twins, fed END
TO END by the engine's own query log: QueryEngine serves real queries, its
usage_log materializes through usage_log_frame, and the marts aggregate it.
"""

from __future__ import annotations

import pytest

from emdatapipelines_spark.api import QueryEngine, RateLimiter
from emdatapipelines_spark.clock import Clock
from emdatapipelines_spark.metrics import (
    api_performance,
    usage_log_frame,
    usage_metrics,
)

from datetime import datetime


def _drive_engine(spark):
    """Serve a deterministic mix of queries (including a rate-denied one)
    and return the engine. Timestamps are injected epoch seconds."""
    eng = QueryEngine(spark, cache_ttl_seconds=0)
    eng.rate_limiter = RateLimiter(quotas={"public": 1})
    spark.range(5).createOrReplaceTempView("metrics_test_tbl")
    base = datetime(2024, 1, 30, 12, 0, 0).timestamp()
    eng.sql("SELECT COUNT(*) AS n FROM metrics_test_tbl", org="o1",
            use_cache=False, now=base)
    eng.sql("SELECT * FROM metrics_test_tbl WHERE id > 1", org="o2",
            use_cache=False, now=base + 3600)
    eng.sql("SELECT COUNT(*) AS n FROM metrics_test_tbl -- disaster", org="o1",
            use_cache=False, now=base + 7200)
    eng.sql("SELECT 1", org="o3", use_cache=False, now=base + 7260)
    with pytest.raises(PermissionError):  # o3 again inside its 1-hour window
        eng.sql("SELECT 2", org="o3", use_cache=False, now=base + 7320)
    return eng


def test_usage_metrics_over_live_query_log(spark):
    eng = _drive_engine(spark)
    log = usage_log_frame(spark, eng.usage_log)
    clock = Clock(datetime(2024, 2, 1))
    rows = {r["api_endpoint"]: r for r in usage_metrics(log, clock).collect()}

    # 3 select_query (2 ok + the later select), 1 disaster_query, 1 denied
    # "select_query" carrying ok=False — classify + success-rate both land
    sel = rows["select_query"]
    assert sel["total_requests"] == 4          # 3 served + 1 denied
    assert sel["unique_hours_accessed"] == 3   # 12:00, 13:00, 14:00 buckets
    assert sel["success_rate_percent"] == 75.0
    assert sel["system_health_status"] == "DEGRADED"
    assert sel["usage_level"] == "MINIMAL_USAGE"
    dis = rows["disaster_query"]
    assert dis["total_requests"] == 1 and dis["success_rate_percent"] == 100.0
    assert dis["system_health_status"] == "EXCELLENT"


def test_api_performance_over_live_query_log(spark):
    eng = _drive_engine(spark)
    log = usage_log_frame(spark, eng.usage_log)
    clock = Clock(datetime(2024, 2, 1))
    rows = {r["api_endpoint"]: r for r in api_performance(log, clock).collect()}

    sel = rows["select_query"]
    assert sel["total_requests"] == 4
    assert sel["error_requests"] == 1          # the rate-denied request
    assert sel["error_percent"] == 25.0
    assert sel["distinct_orgs"] == 3           # o1, o2, o3
    assert sel["caller_coverage"] == "LIMITED_COVERAGE"
    # served-query latencies were measured (plan-build time > 0); the denied
    # request contributes 0.0 — p50 over [0, x, y, z] is still >= 0
    assert sel["p50_latency_ms"] >= 0.0
    assert sel["p99_latency_ms"] >= sel["p50_latency_ms"]
    # last request 2024-01-30 14:02 vs clock 2024-02-01 -> ~34h: in the
    # 24-48h band
    assert sel["endpoint_freshness"] == "STALE"
    assert sel["compliance_status"] == "OPERATIONAL"


def test_usage_metrics_window_filters_old_requests(spark):
    """Requests older than the 7-day window must not count."""
    eng = QueryEngine(spark, cache_ttl_seconds=0)
    spark.range(3).createOrReplaceTempView("metrics_test_tbl2")
    old = datetime(2024, 1, 1, 0, 0, 0).timestamp()
    new = datetime(2024, 1, 31, 0, 0, 0).timestamp()
    eng.sql("SELECT 1", org="a", use_cache=False, now=old)
    eng.sql("SELECT 1", org="a", use_cache=False, now=new)
    log = usage_log_frame(spark, eng.usage_log)
    rows = usage_metrics(log, Clock(datetime(2024, 2, 1))).collect()
    assert len(rows) == 1 and rows[0]["total_requests"] == 1


def test_empty_log_yields_empty_marts(spark):
    log = usage_log_frame(spark, [])
    assert usage_metrics(log).count() == 0
    assert api_performance(log).count() == 0
