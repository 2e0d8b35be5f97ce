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

Exactly-once bookkeeping: every commit records BOTH its own ``batch_id`` and
the monotone high-water mark ``max_batch_id``. Structured Streaming replays
only the LAST committed epoch after a crash, so "already applied" is the
comparison ``batch_id == watermark``, where the watermark is the max of
``max_batch_id``/``batch_id`` over ALL retained commits
(``versioned.batch_watermark``) — it survives ``compact`` + ``vacuum``
dropping the old per-batch history entries in any maintenance-commit order.
A batch id BELOW the watermark is not a replay at all: it is the signature
of a fresh checkpoint (epoch ids restart at 0) pointed at an existing table,
and it raises :class:`StaleBatchError` instead of silently dropping data.
Batch ids are only comparable within one checkpoint lineage; deliberately
re-pointing a table at a new checkpoint goes through
``versioned.reset_batch_watermark``.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.reaggregate import combine_partials, partial_aggregate
from ..versioned import batch_watermark, read_versioned, write_versioned


class StaleBatchError(RuntimeError):
    """A batch id arrived FAR below the table's applied-batch high-water
    mark. Structured Streaming only ever redelivers the LAST epoch after a
    crash (batch_id == watermark), so a lower id means the query is running
    against a DIFFERENT checkpoint than the one that built the table —
    typically a fresh checkpoint whose epoch ids restarted at 0. Silently
    skipping such batches would drop their data (every id below the stale
    mark looks "already applied"); failing loudly forces the operator to
    either point the query back at its original checkpoint or call
    ``versioned.reset_batch_watermark(table_path)`` after deliberately
    re-pointing the table at a new checkpoint."""


def applied_batch_watermark(table_path: str) -> int | None:
    """Highest batch id known to be applied, from any RETAINED commit's meta
    (``max_batch_id`` preferred, per-commit ``batch_id`` as fallback for
    tables written before the high-water mark existed). Delegates to
    ``versioned.batch_watermark`` (max over ALL retained manifests, honoring
    ``watermark_reset`` markers)."""
    return batch_watermark(table_path)


def _replay_check(batch_id: int, hw: int | None, table_path: str) -> bool:
    """True ⇔ skip: ``batch_id == hw`` is the one legitimate replay
    Structured Streaming produces (the last epoch re-run after a crash).
    ``batch_id < hw`` is the fresh-checkpoint signature → raise. Every
    writer in this module SHARES the table's checkpoint lineage as a
    precondition: batch ids are only comparable within one checkpoint."""
    if hw is None or batch_id > hw:
        return False
    if batch_id < hw:
        raise StaleBatchError(
            f"batch_id={batch_id} is below the applied-batch watermark {hw} "
            f"of {table_path!r}; a restarted query only replays the last "
            "epoch, so this query is using a different (likely fresh) "
            "checkpoint than the one that built this table. Restore the "
            "original checkpointLocation, or call "
            "versioned.reset_batch_watermark(table_path) to deliberately "
            "re-seed the table from a new checkpoint."
        )
    return True


def dedup_within_watermark(
    stream_df: DataFrame, keys: list[str], ts_col: str, watermark: str
) -> DataFrame:
    """Streaming keyed dedup — the streaming twin of T8 keep-latest
    (`operators/upsert.py`): duplicate deliveries of the same key within the
    watermark horizon are dropped by state-store lookup
    (``dropDuplicatesWithinWatermark``), and state for keys older than the
    watermark is evicted, so memory is bounded by the horizon's key
    cardinality, not the stream's lifetime (the unbounded-state hazard of
    plain ``dropDuplicates`` on an infinite stream). Mirrors the reference's
    compacted-topic keep-latest contract (`resources/kafka.py:226-291`)
    without requiring a compacted transport."""
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def apply_rollup_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_path: str,
    keys: list[str],
    measures: dict[str, Column | str],
    scale: int = 2,
) -> bool:
    """Apply one microbatch to the partial-rollup table. Returns False if the
    batch was already applied (replay after restart) and was skipped.

    Precondition: all batches for ``table_path`` come from ONE streaming
    checkpoint lineage — batch ids are epoch ids, comparable only within a
    checkpoint. A fresh checkpoint (ids restarting at 0) raises
    :class:`StaleBatchError` instead of silently dropping data; see
    ``versioned.reset_batch_watermark`` for the deliberate-reset path."""
    hw = applied_batch_watermark(table_path)
    if _replay_check(batch_id, hw, table_path):
        return False
    spark = batch_df.sparkSession
    partials = partial_aggregate(batch_df, keys, measures, scale)
    try:
        current = read_versioned(spark, table_path)
    except FileNotFoundError:
        combined = partials
    else:
        combined = combine_partials([current, partials], keys, list(measures))
    write_versioned(
        combined,
        table_path,
        meta={"batch_id": batch_id, "max_batch_id": batch_id if hw is None else max(hw, batch_id)},
    )
    return True


def incremental_rollup(
    stream_df: DataFrame,
    table_path: str,
    keys: list[str],
    measures: dict[str, Column | str],
    checkpoint_dir: str,
    scale: int = 2,
    available_now: bool = True,
    dedup_keys: list[str] | None = None,
    event_time_col: str = "ts",
    dedup_watermark: str = "1 hour",
    on_batch=None,
) -> StreamingQuery:
    """Start the maintenance query: stream → per-batch partials → versioned
    snapshot commits. ``available_now=True`` drains the backlog and stops
    (backfill/test mode); otherwise it runs on the default microbatch tick.

    ``dedup_keys`` enables at-source keyed dedup within ``dedup_watermark``
    (:func:`dedup_within_watermark`) so at-least-once transports (Kafka
    redelivery, file re-drops) don't inflate the rollup counts.

    ``on_batch(batch_id, applied)`` runs AFTER the batch committed to the
    versioned table but BEFORE the streaming checkpoint records the epoch
    — the observability/fault-injection point: an exception raised here
    leaves a committed table whose epoch the checkpoint will REPLAY, so
    the replay-skip idempotence (``_replay_check``) is what prevents
    double-counting (exercised by `pipelines/governed_stream.py`'s
    rollup-leg kill)."""
    if dedup_keys:
        stream_df = dedup_within_watermark(
            stream_df, dedup_keys, event_time_col, dedup_watermark
        )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        applied = apply_rollup_batch(
            batch_df, batch_id, table_path, keys, measures, scale
        )
        if on_batch is not None:
            on_batch(batch_id, applied)

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def apply_histogram_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_path: str,
    keys: list[str],
    col: str,
    lo: float,
    hi: float,
    nbins: int = 64,
) -> bool:
    """Apply one microbatch to a HISTOGRAM-partial table (the quantile
    member of the mergeable family — `operators/reaggregate.py:
    histogram_partial`): batch bin counts add onto the stored counts, so the
    table serves interpolated percentiles (`quantiles_from_histogram`) at
    any grain without re-reading the stream's history. Same replay contract
    as :func:`apply_rollup_batch` (monotone ``max_batch_id``, same
    single-checkpoint precondition and :class:`StaleBatchError` behavior)."""
    from ..operators.reaggregate import histogram_partial

    hw = applied_batch_watermark(table_path)
    if _replay_check(batch_id, hw, table_path):
        return False
    spark = batch_df.sparkSession
    partials = histogram_partial(batch_df, keys, col, lo, hi, nbins)
    try:
        current = read_versioned(spark, table_path)
    except FileNotFoundError:
        combined = partials
    else:
        combined = (
            current.unionByName(partials)
            .groupBy(*keys, "bin")
            .agg(F.sum("bin_count").alias("bin_count"))
        )
    write_versioned(
        combined,
        table_path,
        meta={"batch_id": batch_id, "max_batch_id": batch_id if hw is None else max(hw, batch_id)},
    )
    return True


def incremental_histogram_rollup(
    stream_df: DataFrame,
    table_path: str,
    keys: list[str],
    col: str,
    lo: float,
    hi: float,
    checkpoint_dir: str,
    nbins: int = 64,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain streaming histogram partials: stream → per-batch bin counts
    → additive merge into the versioned table. Readers serve p50/p90/p99
    from the stored partials while the stream runs."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        apply_histogram_batch(batch_df, batch_id, table_path, keys, col, lo, hi, nbins)

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def apply_dedup_index_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.8,
    survivors_sink=None,
) -> DataFrame | None:
    """Apply one microbatch of documents to the continuously-maintained
    MinHash corpus index: flag batch docs that near-duplicate the indexed
    corpus, commit the surviving signatures to the index exactly-once, and
    return the SURVIVORS frame (None if the batch was a detected replay).

    ``survivors_sink`` (optional ``Callable[[DataFrame], None]``) is invoked
    with the survivors frame BEFORE the index snapshot is committed. Order
    matters for crash safety: if the sink ran after the commit, a crash in
    between would make the replayed batch a detected no-op whose survivors
    were never written — silent loss despite the idempotent contract. With
    sink-before-commit, a mid-process crash leaves the watermark unadvanced,
    so the replay recomputes and rewrites both (the sink must itself be
    idempotent, e.g. an overwrite into a batch_id= subdirectory).

    This is continuous-ingest dedup — the streaming twin of
    ``llmdata.dedup.incremental_minhash_dedup``: every arriving snapshot is
    deduped against everything already accepted, without re-reading corpus
    text. The index commit carries the same monotone ``max_batch_id``
    watermark as the rollup/upsert sinks, so post-crash microbatch replays
    are detected no-ops rather than double-inserted signatures (a replayed
    batch would otherwise self-collide: its docs are already indexed, so
    every doc would be flagged as a duplicate and silently dropped — the
    exactly-once guard is what makes at-least-once delivery safe here).
    Intra-batch duplicates are deliberately NOT collapsed (corpus-vs-batch
    contract); run :func:`dedup_within_watermark` upstream for that.
    """
    from ..llmdata.dedup import incremental_minhash_dedup, minhash_signatures

    hw = applied_batch_watermark(index_path)
    if _replay_check(batch_id, hw, index_path):
        return None
    spark = batch_df.sparkSession
    try:
        index = read_versioned(spark, index_path)
    except FileNotFoundError:
        index = None
    if index is None:
        sigs = minhash_signatures(
            batch_df, id_col=id_col, text_col=text_col, n=n, num_hashes=num_hashes
        )
        survivors, updated = batch_df, sigs
    else:
        step = incremental_minhash_dedup(
            batch_df,
            index,
            id_col=id_col,
            text_col=text_col,
            n=n,
            num_hashes=num_hashes,
            bands=bands,
            rows_per_band=rows_per_band,
            threshold=threshold,
        )
        survivors, updated = step["survivors"], step["updated_index"]
    # breaks the lineage to the previous snapshot's files BEFORE the commit
    # rewrites them (same hazard as combine_partials in apply_rollup_batch)
    updated = updated.localCheckpoint(eager=True)
    if survivors_sink is not None:
        survivors_sink(survivors)
    write_versioned(
        updated,
        index_path,
        meta={
            "batch_id": batch_id,
            "max_batch_id": batch_id if hw is None else max(hw, batch_id),
        },
    )
    return survivors


def incremental_dedup_ingest(
    stream_df: DataFrame,
    index_path: str,
    survivors_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
    **dedup_kwargs,
) -> StreamingQuery:
    """Start the continuous-ingest dedup query: stream of documents →
    per-batch dedup against the corpus index → surviving docs appended to
    ``survivors_path`` (one subdirectory per batch id, so a replayed batch
    overwrites its own output instead of duplicating it — idempotent)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        def sink(survivors: DataFrame) -> None:
            survivors.write.mode("overwrite").parquet(
                os.path.join(survivors_path, f"batch_id={batch_id}")
            )

        # sink runs inside apply_dedup_index_batch BEFORE the index commit:
        # a crash between the two leaves the watermark unadvanced and the
        # replay rewrites both (overwrite into batch_id= is idempotent)
        apply_dedup_index_batch(
            batch_df,
            batch_id,
            index_path,
            id_col,
            text_col,
            survivors_sink=sink,
            **dedup_kwargs,
        )

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def snapshot_dedup_rate_ingest(
    stream_df: DataFrame,
    index_path: str,
    rates_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
    **dedup_kwargs,
) -> StreamingQuery:
    """Streaming twin of the ``dd_snapshot_dedup_rate`` query: each arriving
    snapshot (microbatch) is deduped against the continuously-maintained
    MinHash corpus index, and a ONE-ROW rate record — (snap=batch_id,
    n_docs, n_dup_vs_earlier, dup_rate_ppm) — is appended to
    ``rates_path``. Where the batch query recomputes every snapshot's rate
    from the full corpus each run, this maintains the same mart
    incrementally: per batch the only corpus-rate work is the banded
    signature join against the index (never a text re-read), so the cost
    of snapshot k is O(|snapshot k|), not O(corpus). Idempotent like the
    other sinks: the record writes into a batch_id= subdirectory BEFORE
    the index watermark commits, so replays overwrite rather than
    double-append, and a detected replay (watermark already past) writes
    nothing.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        n_docs = batch_df.count()

        def sink(survivors: DataFrame) -> None:
            spark = survivors.sparkSession
            n_surv = survivors.count()
            n_dup = n_docs - n_surv
            rate = spark.createDataFrame(
                [(batch_id, n_docs, n_dup, (n_dup * 1_000_000) // max(n_docs, 1))],
                "snap long, n_docs long, n_dup_vs_earlier long, dup_rate_ppm long",
            )
            rate.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(rates_path, f"batch_id={batch_id}")
            )

        apply_dedup_index_batch(
            batch_df,
            batch_id,
            index_path,
            id_col,
            text_col,
            survivors_sink=sink,
            **dedup_kwargs,
        )

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

    def process(batch_df: DataFrame, batch_id: int) -> None:
        hw = applied_batch_watermark(table_path)
        if _replay_check(batch_id, hw, table_path):
            return
        spark = batch_df.sparkSession
        try:
            current = read_versioned(spark, table_path)
        except FileNotFoundError:
            current = None
        merged = upsert_last_wins(current, batch_df, keys, version_col)
        write_versioned(
            merged,
            table_path,
            meta={
                "batch_id": batch_id,
                "max_batch_id": batch_id if hw is None else max(hw, batch_id),
            },
        )

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def apply_scd2_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_path: str,
    key: str,
    updated_at: str,
    hard_deletes: bool = False,
) -> bool:
    """Apply one microbatch of source rows to a VERSIONED SCD2 dimension —
    the continuous twin of the reference's scheduled dbt snapshots
    (`dbt_projects/emergency_data/snapshots/*.sql` run on a cron; this
    applies the same timestamp-strategy merge per microbatch, so history
    capture lags by one trigger interval instead of one schedule tick).

    Each batch is collapsed to last-per-key first (several updates to one
    key within a batch → the snapshot records the latest state, exactly
    what a scheduled snapshot would have seen), then merged via
    ``operators.scd2.scd2_merge``. ``hard_deletes`` defaults to False
    because a CDC/changed-rows stream is a PARTIAL slice — absence means
    unchanged; pass True only when every batch is a full table image.
    Exactly-once via the shared ``max_batch_id`` watermark. Returns True
    if applied, False for a detected replay."""
    from pyspark.sql import Window

    from ..operators.scd2 import scd2_init, scd2_merge

    hw = applied_batch_watermark(table_path)
    if _replay_check(batch_id, hw, table_path):
        return False
    spark = batch_df.sparkSession
    w = Window.partitionBy(key).orderBy(F.desc(updated_at))
    latest = (
        batch_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    try:
        snap = read_versioned(spark, table_path)
    except FileNotFoundError:
        snap = None
    if snap is None:
        out = scd2_init(latest, updated_at)
    else:
        out = scd2_merge(snap, latest, key, updated_at, hard_deletes=hard_deletes)
    # break lineage to the previous snapshot's files before the commit
    # (same hazard as every read-merge-write sink in this module)
    out = out.localCheckpoint(eager=True)
    write_versioned(
        out,
        table_path,
        meta={
            "batch_id": batch_id,
            "max_batch_id": batch_id if hw is None else max(hw, batch_id),
        },
    )
    return True


def incremental_scd2(
    stream_df: DataFrame,
    table_path: str,
    key: str,
    updated_at: str,
    checkpoint_dir: str,
    hard_deletes: bool = False,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the continuous SCD2 snapshot query: stream of source rows →
    per-batch timestamp-strategy merge into the versioned dimension at
    ``table_path`` (valid_from / valid_to / is_current columns, dbt
    snapshot parity — see ``apply_scd2_batch``)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        apply_scd2_batch(
            batch_df, batch_id, table_path, key, updated_at, hard_deletes
        )

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def apply_ewma_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_path: str,
    value_col: str,
    keys: list[str],
    order_cols: list[str],
    alpha: float = 0.2,
) -> bool:
    """Apply one microbatch to a per-key EWMA state table — the streaming
    twin of ``operators.windows.grouped_ewma``, exploiting that the EWMA
    recurrence COMPOSES: folding a new chunk with the stored state as the
    initial accumulator is bit-identical to folding the whole history at
    once (same operation sequence on the same doubles). State per key is
    one row (n_obs, ewma) — O(keys), independent of history length.

    Precondition (beyond the shared-checkpoint contract of every writer in
    this module): per key, batches must arrive in event order — an EWMA is
    order-sensitive, so a late row belongs BEFORE already-folded ones and
    cannot be merged into the recurrence. Bound disorder upstream with a
    watermark + ``dedup_within_watermark`` and sort within the batch (done
    here via the ``order_cols`` sort key).
    """
    hw = applied_batch_watermark(table_path)
    if _replay_check(batch_id, hw, table_path):
        return False
    spark = batch_df.sparkSession
    ordkey = F.struct(*[F.col(c) for c in order_cols])
    grouped = batch_df.groupBy(*keys).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(ordkey.alias("k"), F.col(value_col).alias("v")))
            ),
            lambda s: s["v"].cast("double"),
        ).alias("__vals"),
        F.count(value_col).alias("__n"),
    )
    try:
        state = read_versioned(spark, table_path)
    except FileNotFoundError:
        state = None
    step = lambda acc, x: F.lit(float(alpha)) * x + F.lit(1.0 - float(alpha)) * acc  # noqa: E731
    if state is None:
        fresh = grouped.select(
            *keys,
            F.col("__n").alias("n_obs"),
            F.aggregate(
                F.slice("__vals", 2, F.greatest(F.size("__vals") - 1, F.lit(0))),
                F.element_at("__vals", 1),
                step,
            ).alias("ewma"),
        )
        combined = fresh
    else:
        st = state.select(
            *keys, F.col("n_obs").alias("__n0"), F.col("ewma").alias("__e0")
        )
        joined = grouped.join(st, keys, "left")
        updated = joined.select(
            *keys,
            (F.coalesce("__n0", F.lit(0)) + F.col("__n")).alias("n_obs"),
            F.when(
                F.col("__e0").isNotNull(),
                F.aggregate(F.col("__vals"), F.col("__e0"), step),
            )
            .otherwise(
                F.aggregate(
                    F.slice("__vals", 2, F.greatest(F.size("__vals") - 1, F.lit(0))),
                    F.element_at("__vals", 1),
                    step,
                )
            )
            .alias("ewma"),
        )
        untouched = state.join(grouped.select(*keys), keys, "left_anti")
        combined = untouched.select(*keys, "n_obs", "ewma").unionByName(updated)
    write_versioned(
        combined,
        table_path,
        meta={
            "batch_id": batch_id,
            "max_batch_id": batch_id if hw is None else max(hw, batch_id),
        },
    )
    return True


def incremental_ewma(
    stream_df: DataFrame,
    table_path: str,
    value_col: str,
    keys: list[str],
    order_cols: list[str],
    checkpoint_dir: str,
    alpha: float = 0.2,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the EWMA maintenance query: stream → per-batch ordered fold →
    versioned per-key state commits (exactly-once under the batch
    watermark, like every writer in this module)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        apply_ewma_batch(
            batch_df, batch_id, table_path, value_col, keys, order_cols, alpha
        )

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def apply_mg_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_path: str,
    col: str,
    k: int,
) -> bool:
    """Apply one microbatch to a persisted Misra-Gries heavy-hitter state —
    streaming maintenance of ``operators.heavyhitters``: MG summaries are
    MERGEABLE (Agarwal et al., PODS'12), so state ∪ batch-partials summed
    per item and re-pruned to k counters is again a valid summary of the
    whole stream, with total deficit <= N_total/(k+1). State is <= k+1 rows
    (k counters + the NULL total-N row) regardless of stream length.
    Exactly-once under the shared batch watermark like every writer here.
    """
    from ..operators.heavyhitters import misra_gries_partials

    hw = applied_batch_watermark(table_path)
    if _replay_check(batch_id, hw, table_path):
        return False
    spark = batch_df.sparkSession
    partials = misra_gries_partials(batch_df, col, k)
    try:
        state = read_versioned(spark, table_path)
    except FileNotFoundError:
        state = None
    merged = partials if state is None else state.unionByName(partials)
    summed = merged.groupBy(col).agg(F.sum("est").alias("est"))
    items = summed.filter(F.col(col).isNotNull())
    total = summed.filter(F.col(col).isNull())
    # re-prune to k via the MG decrement: subtract the (k+1)-th largest,
    # drop non-positive — same reduction the in-partition sketch applies.
    from pyspark.sql import Window

    ranked = items.withColumn(
        "__rk", F.row_number().over(Window.orderBy(F.desc("est"), F.col(col)))
    )
    offset_row = ranked.filter(F.col("__rk") == k + 1).select("est").first()
    offset = int(offset_row["est"]) if offset_row is not None else 0
    pruned = (
        ranked.select(col, (F.col("est") - F.lit(offset)).alias("est"))
        .filter(F.col("est") > 0)
    )
    write_versioned(
        pruned.unionByName(total),
        table_path,
        meta={
            "batch_id": batch_id,
            "max_batch_id": batch_id if hw is None else max(hw, batch_id),
        },
    )
    return True


def incremental_heavy_hitters(
    stream_df: DataFrame,
    table_path: str,
    col: str,
    checkpoint_dir: str,
    k: int = 64,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain the streaming MG state; read back with
    ``heavy_hitters_from_state`` to get candidates at any moment."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        apply_mg_batch(batch_df, batch_id, table_path, col, k)

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def heavy_hitters_from_state(
    spark, table_path: str, col: str, min_share: float, k: int = 64
):
    """Candidate heavy hitters from the maintained state: items whose MG
    estimate clears the share threshold minus the accumulated deficit
    bound N/(k+1) — with k > 2/min_share there are provably no false
    negatives. Exact recount (the second pass of
    ``operators.heavyhitters.heavy_hitters``) is the caller's step when
    exact counts are required."""
    state = read_versioned(spark, table_path)
    total = state.filter(F.col(col).isNull()).agg(
        F.sum("est").alias("total_n")
    )
    return (
        state.filter(F.col(col).isNotNull())
        .crossJoin(F.broadcast(total))
        .filter(
            F.col("est")
            >= F.lit(min_share) * F.col("total_n") - F.col("total_n") / F.lit(k + 1)
        )
        .select(col, "est", "total_n")
    )


def apply_cooccurrence_graph_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    group_col: str,
    node_col: str,
    *,
    min_shared: int = 5,
    edges_sink=None,
) -> DataFrame | None:
    """Apply one microbatch of fact rows to the continuously-maintained
    co-occurrence GRAPH state (VERDICT r9 stretch #8 — the streaming twin
    of ``operators.graph.cooccurrence_edges`` / the ``graph_edges`` MV):
    returns the thresholded edge list after this batch, or None for a
    detected replay.

    State (one versioned table, tagged rows, so the commit + watermark
    stay atomic like the dedup index):

      - ``kind='m'``: accepted (group, node) memberships,
      - ``kind='p'``: per-(src, dst) shared-group counts.

    Incremental invariant: a (group, {a, b}) co-occurrence is credited in
    EXACTLY the batch where the later of the two memberships first
    arrives — new×new pairs come from the batch self-join, new×old pairs
    from joining new memberships to the membership state on the group key
    — so the summed pair counts equal the batch operator's
    COUNT(DISTINCT group) at every point, and the thresholded edge frame
    is identical to rebuilding from scratch. Per-batch cost is
    O(|batch| + new-pair volume), never O(corpus): arriving rows join one
    group-keyed membership index, exactly the snapshot-dedup-rate shape.
    Duplicate (group, node) rows — within a batch or across batches — are
    no-ops (distinct + anti-join), so at-least-once upstream delivery is
    safe; the versioned watermark makes whole-batch replays detected
    no-ops.
    """
    hw = applied_batch_watermark(state_path)
    if _replay_check(batch_id, hw, state_path):
        return None
    spark = batch_df.sparkSession
    try:
        state = read_versioned(spark, state_path)
    except FileNotFoundError:
        state = None

    new_m = batch_df.select(
        F.col(group_col).cast("long").alias("g"), F.col(node_col).cast("long").alias("v")
    ).distinct()
    if state is not None:
        members = state.filter(F.col("kind") == "m").select(
            F.col("a").alias("g"), F.col("b").alias("v")
        )
        pairs = state.filter(F.col("kind") == "p").select(
            F.col("a").alias("src"), F.col("b").alias("dst"), F.col("cnt")
        )
        new_m = new_m.join(members, ["g", "v"], "left_anti")
    else:
        members = None
        pairs = None

    a, b = new_m.alias("a"), new_m.alias("b")
    within = a.join(
        b, (F.col("a.g") == F.col("b.g")) & (F.col("a.v") < F.col("b.v"))
    ).select(
        F.col("a.g").alias("g"), F.col("a.v").alias("src"), F.col("b.v").alias("dst")
    )
    if members is not None:
        o = members.alias("o")
        cross = (
            a.join(o, (F.col("a.g") == F.col("o.g")) & (F.col("a.v") != F.col("o.v")))
            .select(
                F.col("a.g").alias("g"),
                F.least(F.col("a.v"), F.col("o.v")).alias("src"),
                F.greatest(F.col("a.v"), F.col("o.v")).alias("dst"),
            )
        )
        delta_src = within.unionByName(cross)
    else:
        delta_src = within
    delta = delta_src.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    if pairs is not None:
        merged = (
            pairs.join(delta, ["src", "dst"], "full_outer")
            .select(
                "src",
                "dst",
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.coalesce(F.col("d"), F.lit(0)))
                .cast("long")
                .alias("cnt"),
            )
        )
        all_m = members.unionByName(new_m)
    else:
        merged = delta.withColumnRenamed("d", "cnt")
        all_m = new_m
    new_state = (
        all_m.select(
            F.lit("m").alias("kind"),
            F.col("g").alias("a"),
            F.col("v").alias("b"),
            F.lit(None).cast("long").alias("cnt"),
        )
        .unionByName(
            merged.select(
                F.lit("p").alias("kind"),
                F.col("src").alias("a"),
                F.col("dst").alias("b"),
                "cnt",
            )
        )
        # break lineage to the previous snapshot's files BEFORE the commit
        # rewrites them (the apply_dedup_index_batch hazard)
        .localCheckpoint(eager=True)
    )
    edges = (
        new_state.filter((F.col("kind") == "p") & (F.col("cnt") >= int(min_shared)))
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    if edges_sink is not None:
        edges_sink(edges)
    write_versioned(
        new_state,
        state_path,
        meta={
            "batch_id": batch_id,
            "max_batch_id": batch_id if hw is None else max(hw, batch_id),
        },
    )
    return edges


def cooccurrence_graph_ingest(
    stream_df: DataFrame,
    state_path: str,
    edges_path: str,
    checkpoint_dir: str,
    group_col: str,
    node_col: str,
    min_shared: int = 5,
    available_now: bool = True,
    on_batch=None,
) -> StreamingQuery:
    """Continuous graph maintenance: stream of fact rows → per-batch
    incremental membership/pair-count update → the current thresholded
    edge list snapshotted to ``edges_path/batch_id=N`` (idempotent
    overwrite, written BEFORE the state watermark commits — the
    sink-before-commit crash-safety ordering all the incremental sinks
    share).

    ``on_batch(batch_id, applied)`` fires after each microbatch is
    applied (or detected as a replay no-op, ``applied=False``) and BEFORE
    the streaming checkpoint records the epoch — the same observability
    hook as :func:`incremental_rollup`'s, used by the governed-stream
    harness to prove post-commit/pre-checkpoint crash recovery for the
    most state-heavy leg (VERDICT r13 #4)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        def sink(edges: DataFrame) -> None:
            edges.write.mode("overwrite").parquet(
                os.path.join(edges_path, f"batch_id={batch_id}")
            )

        res = apply_cooccurrence_graph_batch(
            batch_df,
            batch_id,
            state_path,
            group_col,
            node_col,
            min_shared=min_shared,
            edges_sink=sink,
        )
        if on_batch is not None:
            on_batch(batch_id, res is not None)

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
