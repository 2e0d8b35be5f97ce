"""Fetcher resilience policy: retry, capped exponential backoff, per-source
rate caps.

Twin of the reference API-client plumbing (``utils/api_clients.py``:
APIRateLimiter min-interval pacing :20-32, rate-limited ``_make_request``
with error propagation :54-70, ``health_check`` probe :72-78). The
reference builds these into each client class; here it is a DECORATOR over
the injectable ``Fetcher`` callable that ``ingest_rest_source`` already
takes, so every configured source gets the same policy without subclassing
— and tests drive it with fake clocks/sleeps.

Driver-side by design: REST ingestion is control-plane work (the data
plane reads the landed files, see ``rest.py`` module docstring), so pacing
state lives in one process and needs no coordination.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from .rest import Fetcher


@dataclass
class RetryPolicy:
    """Capped exponential backoff + minimum spacing between calls.

    ``min_interval`` ≈ the reference's ``60 / rate_limit`` seconds between
    requests (`api_clients.py:22-26`); delays follow
    ``base_delay * multiplier**(attempt-1)`` capped at ``max_delay``.
    """

    max_attempts: int = 4
    base_delay: float = 0.5
    multiplier: float = 2.0
    max_delay: float = 30.0
    min_interval: float = 0.0
    #: exception types worth retrying; anything else propagates immediately
    retryable: tuple[type[BaseException], ...] = (ConnectionError, TimeoutError, OSError)

    def delay(self, attempt: int) -> float:
        """Backoff before retry ``attempt`` (1-based)."""
        return min(self.base_delay * self.multiplier ** (attempt - 1), self.max_delay)


@dataclass
class _Pacing:
    last_call: float | None = None


def resilient_fetcher(
    fetcher: Fetcher,
    policy: RetryPolicy | None = None,
    sleep=time.sleep,
    clock=time.monotonic,
) -> Fetcher:
    """Wrap ``fetcher`` with the policy; drop-in for ``ingest_rest_source``.

    Order per call: wait out the per-source rate cap, attempt, and on a
    retryable failure back off and re-attempt up to ``max_attempts``; the
    final failure re-raises (the caller decides whether a source is
    skippable, matching `_make_request`'s raise-through :64-70).
    """
    policy = policy or RetryPolicy()
    pacing = _Pacing()

    def fetch(endpoint: str, params: dict) -> object:
        last_exc: BaseException | None = None
        for attempt in range(1, policy.max_attempts + 1):
            if policy.min_interval > 0:
                now = clock()
                if pacing.last_call is not None:
                    wait = policy.min_interval - (now - pacing.last_call)
                    if wait > 0:
                        sleep(wait)
                pacing.last_call = clock()
            try:
                return fetcher(endpoint, params)
            except policy.retryable as exc:
                last_exc = exc
                if attempt < policy.max_attempts:
                    sleep(policy.delay(attempt))
        raise last_exc  # exhausted

    return fetch


def health_check(fetcher: Fetcher, endpoint: str = "", params: dict | None = None) -> bool:
    """Probe a source (`api_clients.py:72-78`): one cheap request, bool out."""
    try:
        fetcher(endpoint, params if params is not None else {"$limit": 1})
        return True
    except Exception:
        return False
