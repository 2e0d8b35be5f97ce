"""Incrementally-maintained rollup: streaming partials into a versioned table.

The reference refreshes its serving marts by re-running the full dbt model on
a schedule (`jobs/public_jobs.py` wires assets to cron ticks; S12 in SURVEY
§2). The streaming-native equivalent never recomputes from raw history:

  each microbatch → mergeable partials (``operators/reaggregate.py``)
                  → combined with the stored partials
                  → committed as the next snapshot of a versioned table

Readers serve any grain ≥ the partial grain via ``merge_partials`` without
touching raw rows. The versioned sink's atomic pointer flip gives readers
snapshot isolation, and the commit's ``meta.batch_id`` gives the writer
exactly-once effect under Structured Streaming's replay contract: a batch
re-delivered after a crash (same epoch id) is detected in the commit log and
skipped, so partials are never double-counted.

Scale: per batch the job aggregates only that batch's rows (map-side combine,
one shuffle at |keys| cardinality) plus a |partials|-sized merge — independent
of table history length. The stored frame is one row per key combination, so
overwrite commits stay cheap even when the raw fact table is 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.reaggregate import combine_partials, partial_aggregate
from ..versioned import history, read_versioned, write_versioned


def apply_rollup_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_path: str,
    keys: list[str],
    measures: dict[str, Column | str],
    scale: int = 2,
) -> bool:
    """Apply one microbatch to the partial-rollup table. Returns False if the
    batch was already applied (replay after restart) and was skipped."""
    applied = {h["meta"].get("batch_id") for h in history(table_path)}
    if batch_id in applied:
        return False
    spark = batch_df.sparkSession
    partials = partial_aggregate(batch_df, keys, measures, scale)
    try:
        current = read_versioned(spark, table_path)
    except FileNotFoundError:
        combined = partials
    else:
        combined = combine_partials([current, partials], keys, list(measures))
    write_versioned(combined, table_path, meta={"batch_id": batch_id})
    return True


def incremental_rollup(
    stream_df: DataFrame,
    table_path: str,
    keys: list[str],
    measures: dict[str, Column | str],
    checkpoint_dir: str,
    scale: int = 2,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the maintenance query: stream → per-batch partials → versioned
    snapshot commits. ``available_now=True`` drains the backlog and stops
    (backfill/test mode); otherwise it runs on the default microbatch tick.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        apply_rollup_batch(batch_df, batch_id, table_path, keys, measures, scale)

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_upsert(
    stream_df: DataFrame,
    table_path: str,
    keys: list[str],
    version_col: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming keyed upsert into a VERSIONED table — the serving-table twin
    of the reference's StarRocks primary-key ingestion
    (`resources/database.py:111-117`), with what StarRocks gives implicitly
    made explicit: each microbatch commits one snapshot (readers get atomic
    last-wins state + time travel), and `meta.batch_id` makes post-crash
    batch replays a detected no-op instead of a double-merge.
    """
    from ..operators.upsert import upsert_last_wins
    from ..versioned import history, read_versioned, write_versioned

    def process(batch_df: DataFrame, batch_id: int) -> None:
        applied = {h["meta"].get("batch_id") for h in history(table_path)}
        if batch_id in applied:
            return
        spark = batch_df.sparkSession
        try:
            current = read_versioned(spark, table_path)
        except FileNotFoundError:
            current = None
        merged = upsert_last_wins(current, batch_df, keys, version_col)
        write_versioned(merged, table_path, meta={"batch_id": batch_id})

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
