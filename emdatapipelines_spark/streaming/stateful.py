"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference needs no custom operator state (SURVEY §2.9 — only tumbling
windows, T2), but a training-data pipeline does: running per-key corpus
counters, dedup state, quota enforcement. This module provides the canonical
shape — Arrow-batched per-group state with explicit schemas — so new stateful
operators are a function body away.

Scale notes: state lives in the state store partitioned by group key; the
pandas function sees one key's microbatch rows at a time. Keep state rows
small (fixed-width counters) — state size, not input size, is what breaks
streaming jobs at scale.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import StructType


def running_group_stats(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Running (count, sum, max) per key across microbatches — a
    StarRocks-style incrementally-maintained aggregate without a rewrite of
    the whole table per batch.

    Emits one updated row per key per microbatch (output mode: update).
    """
    out_schema = f"{key_col} string, total_count long, total_value double, max_value double"
    state_schema = StructType.fromDDL("cnt long, total double, maxv double")

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cnt, total, maxv = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            cnt += len(vals)
            total += float(vals.sum()) if len(vals) else 0.0
            if len(vals):
                maxv = max(maxv, float(vals.max()))
        state.update((cnt, total, maxv))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "total_count": [cnt],
                "total_value": [total],
                "max_value": [maxv if maxv != float("-inf") else None],
            }
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_first_seen(
    stream_df: DataFrame,
    key_col: str,
    fingerprint_col: str,
) -> DataFrame:
    """Streaming exact-dedup: emit only first-seen fingerprints per key —
    the stateful twin of the batch ``exact_dedup`` operator (and of a
    compacted Kafka topic's keep-latest semantics inverted to keep-first).

    State per key = set of seen fingerprints. For web-scale corpora the set
    becomes a Bloom/sketch column with the same operator shape.
    """
    out_schema = f"{key_col} string, {fingerprint_col} string"
    state_schema = StructType.fromDDL("seen array<string>")

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (seen,) = state.get if state.exists else ([],)
        seen_set = set(seen)
        fresh: list[Any] = []
        for pdf in pdfs:
            for fp in pdf[fingerprint_col]:
                if fp not in seen_set:
                    seen_set.add(fp)
                    fresh.append(fp)
        state.update((list(seen_set),))
        if fresh:
            yield pd.DataFrame({key_col: [key[0]] * len(fresh), fingerprint_col: fresh})

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState twins (Spark 4.x arbitrary stateful processing v2)
# ---------------------------------------------------------------------------
#
# ``transformWithStateInPandas`` supersedes ``applyInPandasWithState`` with a
# processor-object API: typed state handles (value/list/map) instead of one
# tuple-shaped state row, per-key timers, TTL support, and initial-state
# bootstrap. Both twins below are semantically identical to their v1
# counterparts above — same output schema, same emit cadence — so callers
# migrate by swapping the function; the v1 paths stay for compatibility.
# Scale posture is unchanged: state is per-key in the state store, and the
# MAP state in the dedup twin lets the store check membership per
# fingerprint instead of deserializing one ever-growing set blob per batch
# (the concrete scale win of the v2 API: state granularity).


class _RunningStatsProcessor(StatefulProcessor):
    """count/sum/max per key in a single value-state struct."""

    def __init__(self, key_col: str, value_col: str):
        self._key_col = key_col
        self._value_col = value_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "stats", StructType.fromDDL("cnt long, total double, maxv double")
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        cnt, total, maxv = self._state.get() if self._state.exists() else (0, 0.0, float("-inf"))
        for pdf in rows:
            vals = pdf[self._value_col].dropna()
            cnt += len(vals)
            total += float(vals.sum()) if len(vals) else 0.0
            if len(vals):
                maxv = max(maxv, float(vals.max()))
        self._state.update((cnt, total, maxv))
        yield pd.DataFrame(
            {
                self._key_col: [key[0]],
                "total_count": [cnt],
                "total_value": [total],
                "max_value": [maxv if maxv != float("-inf") else None],
            }
        )

    def close(self) -> None:
        pass


def running_group_stats_tws(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """`running_group_stats` on the transformWithState API — identical
    output contract (one updated row per key per microbatch, update mode)."""
    out_schema = f"{key_col} string, total_count long, total_value double, max_value double"
    return stream_df.groupBy(key_col).transformWithStateInPandas(
        _RunningStatsProcessor(key_col, value_col),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


class _FirstSeenDedupProcessor(StatefulProcessor):
    """Seen-fingerprint membership as MAP state: the store probes one key
    per fingerprint instead of round-tripping a monolithic array blob —
    state I/O per batch is O(new fingerprints), not O(all ever seen)."""

    def __init__(self, key_col: str, fingerprint_col: str):
        self._key_col = key_col
        self._fp_col = fingerprint_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getMapState(
            "seen", StructType.fromDDL("fp string"), StructType.fromDDL("one tinyint")
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        fresh: list = []
        emitted: set = set()
        for pdf in rows:
            for fp in pdf[self._fp_col]:
                if fp in emitted:
                    continue
                if not self._seen.containsKey((fp,)):
                    self._seen.updateValue((fp,), (1,))
                    emitted.add(fp)
                    fresh.append(fp)
        if fresh:
            yield pd.DataFrame({self._key_col: [key[0]] * len(fresh), self._fp_col: fresh})

    def close(self) -> None:
        pass


def streaming_dedup_first_seen_tws(
    stream_df: DataFrame,
    key_col: str,
    fingerprint_col: str,
) -> DataFrame:
    """`streaming_dedup_first_seen` on the transformWithState API with MAP
    state (per-fingerprint store entries instead of one array blob)."""
    out_schema = f"{key_col} string, {fingerprint_col} string"
    return stream_df.groupBy(key_col).transformWithStateInPandas(
        _FirstSeenDedupProcessor(key_col, fingerprint_col),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
