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

Releasing before materialization would recompute (persist) or break
(checkpoint) the plan, so release is strictly caller-side — exactly the
"caller owns the cache lifetime" contract the dedup docstrings promise,
now with a handle instead of ``spark.catalog.clearCache()``. A caller that
never releases gets today's behavior (GC-bound), no worse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: (kind, frame) pairs pinned by engine internals since the last release.
_TRACKED: list[tuple[str, DataFrame]] = []


def tracked_local_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``df.localCheckpoint(eager)`` + ledger entry for later release."""
    ck = df.localCheckpoint(eager=eager)
    _TRACKED.append(("checkpoint", ck))
    return ck


def tracked_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist(level)`` + ledger entry for later release."""
    from pyspark import StorageLevel

    p = df.persist(storage_level or StorageLevel.MEMORY_AND_DISK)
    _TRACKED.append(("persist", p))
    return p


def tracked_count() -> int:
    """Frames currently on the ledger (pinned, not yet released)."""
    return len(_TRACKED)


def release_tracked() -> int:
    """Unpersist every ledger entry; returns how many were released.

    Call ONLY after the consuming query's result is fully materialized
    (collected / written): a checkpointed frame's blocks ARE its data — a
    plan still referencing them cannot re-derive the rows.

    Checkpointed frames are not released by ``unpersist()`` on the Python
    ``DataFrame`` (that maps to the Dataset cache manager, and a
    checkpoint is not a catalog cache entry); the pinned blocks belong to
    the ``LogicalRDD``'s underlying RDD, reached via the analyzed plan.
    """
    released = 0
    while _TRACKED:
        kind, df = _TRACKED.pop()
        try:
            if kind == "persist":
                df.unpersist(blocking=False)
            else:
                df._jdf.queryExecution().analyzed().rdd().unpersist(False)
            released += 1
        except Exception:  # noqa: BLE001 - a dead session/frame is already free
            pass
    return released
