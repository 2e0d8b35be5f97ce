"""Public query API middleware: rate limiting, usage logging, TTL cache
(SURVEY §3.3 read path).
"""

from __future__ import annotations

import pytest

from emdatapipelines_spark.api import (
    QueryEngine,
    RateLimiter,
    classify_query,
    fingerprint_query,
)


def test_rate_limiter_sliding_window():
    rl = RateLimiter(quotas={"public": 3})
    t0 = 1000.0
    assert all(rl.check("org1", "public", t0 + i) for i in range(3))
    assert not rl.check("org1", "public", t0 + 3)          # quota exhausted
    assert rl.check("org2", "public", t0 + 3)              # per-org isolation
    assert rl.check("org1", "public", t0 + 3601)           # window slides


def test_classify_and_fingerprint():
    assert classify_query("SELECT * FROM disaster_events") == "disaster_query"
    assert classify_query("select 1") == "select_query"
    # fingerprint is whitespace/case insensitive
    assert fingerprint_query("SELECT  1") == fingerprint_query("select 1")
    assert fingerprint_query("select 1") != fingerprint_query("select 2")


def test_engine_sql_cache_and_quota(spark):
    eng = QueryEngine(spark, cache_ttl_seconds=300)
    eng.rate_limiter = RateLimiter(quotas={"public": 5})
    t0 = 5000.0

    spark.range(10).createOrReplaceTempView("api_test_tbl")
    df1 = eng.sql("SELECT COUNT(*) AS n FROM api_test_tbl", org="o", now=t0)
    assert df1.first()["n"] == 10
    # cache hit returns the identical cached DataFrame
    df2 = eng.sql("select   count(*) as n from api_test_tbl", org="o", now=t0 + 1)
    assert df2 is df1
    assert len(eng.usage_log) == 2

    # TTL expiry evicts
    assert eng.evict_expired(now=t0 + 301) == 1
    df3 = eng.sql("SELECT COUNT(*) AS n FROM api_test_tbl", org="o", now=t0 + 302)
    assert df3 is not df1

    # rate limit raises once quota is burned
    with pytest.raises(PermissionError):
        for i in range(10):
            eng.sql("SELECT 1 AS one", org="greedy", now=t0 + 10 + i)
