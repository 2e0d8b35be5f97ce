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
