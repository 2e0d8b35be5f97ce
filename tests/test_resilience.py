"""Retry/backoff/rate-cap fetcher policy (sources/resilience.py) — twin of
utils/api_clients.py:20-78. Driven entirely by fake clocks and sleeps."""

from __future__ import annotations

import pytest

from emdatapipelines_spark.sources.resilience import (
    RetryPolicy,
    health_check,
    resilient_fetcher,
)


class FlakyFetcher:
    def __init__(self, fail_times: int, exc: BaseException = ConnectionError("boom")):
        self.fail_times = fail_times
        self.exc = exc
        self.calls = []

    def __call__(self, endpoint, params):
        self.calls.append((endpoint, dict(params)))
        if len(self.calls) <= self.fail_times:
            raise self.exc
        return {"data": [{"ok": 1}]}


def test_retries_then_succeeds_with_backoff_schedule():
    flaky = FlakyFetcher(fail_times=2)
    sleeps = []
    fetch = resilient_fetcher(
        flaky, RetryPolicy(max_attempts=4, base_delay=0.5, multiplier=2.0), sleep=sleeps.append
    )
    assert fetch("ep", {"a": 1}) == {"data": [{"ok": 1}]}
    assert len(flaky.calls) == 3
    assert sleeps == [0.5, 1.0]  # capped exponential: 0.5, 1.0, (2.0 ...)


def test_exhaustion_reraises_last_error():
    flaky = FlakyFetcher(fail_times=99)
    fetch = resilient_fetcher(flaky, RetryPolicy(max_attempts=3, base_delay=0.1), sleep=lambda s: None)
    with pytest.raises(ConnectionError):
        fetch("ep", {})
    assert len(flaky.calls) == 3


def test_non_retryable_error_propagates_immediately():
    flaky = FlakyFetcher(fail_times=99, exc=ValueError("bad request"))
    fetch = resilient_fetcher(flaky, RetryPolicy(max_attempts=5), sleep=lambda s: None)
    with pytest.raises(ValueError):
        fetch("ep", {})
    assert len(flaky.calls) == 1


def test_delay_is_capped():
    p = RetryPolicy(base_delay=1.0, multiplier=10.0, max_delay=5.0)
    assert [p.delay(a) for a in (1, 2, 3)] == [1.0, 5.0, 5.0]


def test_rate_cap_spaces_calls():
    ok = FlakyFetcher(fail_times=0)
    sleeps = []
    t = {"now": 100.0}

    def clock():
        return t["now"]

    def sleep(s):
        sleeps.append(round(s, 6))
        t["now"] += s

    fetch = resilient_fetcher(ok, RetryPolicy(min_interval=2.0), sleep=sleep, clock=clock)
    fetch("a", {})
    t["now"] += 0.5  # half a second later, next call must wait ~1.5s
    fetch("b", {})
    assert sleeps == [1.5]
    t["now"] += 10.0  # long gap -> no wait
    fetch("c", {})
    assert sleeps == [1.5]


def test_health_check_true_false():
    assert health_check(FlakyFetcher(fail_times=0)) is True
    assert health_check(FlakyFetcher(fail_times=99)) is False


def test_composes_with_ingest_rest_source(spark):
    from emdatapipelines_spark.sources.rest import RestSourceConfig, ingest_rest_source

    flaky = FlakyFetcher(fail_times=1)
    fetch = resilient_fetcher(flaky, RetryPolicy(max_attempts=3, base_delay=0.0), sleep=lambda s: None)
    cfg = RestSourceConfig(name="flaky_src", endpoint="things", required_fields=["ok"])
    df = ingest_rest_source(spark, cfg, fetch)
    assert df.count() == 1
    assert len(flaky.calls) == 2
