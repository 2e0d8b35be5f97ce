"""Incrementally-maintained rollup (streaming/incremental.py): streamed
partials must serve the same answer as a direct batch aggregation, and
replayed batches must not double-count."""

from __future__ import annotations

from pyspark.sql import functions as F

from emdatapipelines_spark.operators.reaggregate import merge_partials
from emdatapipelines_spark.queries.registry import t
from emdatapipelines_spark.streaming.incremental import (
    apply_rollup_batch,
    incremental_rollup,
)
from emdatapipelines_spark.streaming.sources import stream_source
from emdatapipelines_spark.versioned import history, read_versioned

SF_SMALL = "/root/testdata/sf0.001"


def _serve(spark, path):
    return {
        r["event_type"]: (r["value_sum"], r["value_min"], r["value_max"], r["value_n"])
        for r in merge_partials(
            read_versioned(spark, path), ["event_type"], ["value"]
        ).collect()
    }


def _direct(df):
    return {
        r["event_type"]: (r["s"], r["lo"], r["hi"], r["n"])
        for r in df.groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(38,2)")).cast("double").alias("s"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.count("value").alias("n"),
        )
        .collect()
    }


def test_streamed_rollup_equals_batch(spark, tmp_path):
    events = t(spark, SF_SMALL, "events")
    src = str(tmp_path / "src")
    events.write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)

    stream = stream_source(spark, "file", schema=batch.schema, path=src).drop("proc_time")
    table = str(tmp_path / "rollup")
    q = incremental_rollup(
        stream,
        table,
        keys=["event_type"],
        measures={"value": "value"},
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    assert _serve(spark, table) == _direct(batch)


def test_multi_batch_accumulation_and_replay_skip(spark, tmp_path):
    events = t(spark, SF_SMALL, "events")
    first = events.filter("event_id % 2 = 0")
    second = events.filter("event_id % 2 = 1")
    table = str(tmp_path / "rollup")

    assert apply_rollup_batch(first, 0, table, ["event_type"], {"value": "value"})
    assert apply_rollup_batch(second, 1, table, ["event_type"], {"value": "value"})
    want = _direct(events)
    assert _serve(spark, table) == want

    # replay of an applied epoch must be a no-op (exactly-once effect)
    assert not apply_rollup_batch(second, 1, table, ["event_type"], {"value": "value"})
    assert _serve(spark, table) == want
    assert [h["meta"]["batch_id"] for h in history(table)] == [0, 1]


def test_partial_schema_stable_across_commits(spark, tmp_path):
    """Repeated combines must not drift the decimal precision of stored sums
    (schema drift would break readers pinned to an old snapshot)."""
    events = t(spark, SF_SMALL, "events")
    table = str(tmp_path / "rollup")
    for i in range(3):
        apply_rollup_batch(
            events.filter(f"event_id % 3 = {i}"), i, table, ["event_type"], {"value": "value"}
        )
    v1 = read_versioned(spark, table, version=1)
    v2 = read_versioned(spark, table, version=2)
    assert dict(v1.dtypes)["value_sum"] == dict(v2.dtypes)["value_sum"]


def test_replay_after_compact_and_vacuum_not_double_counted(spark, tmp_path):
    """Exactly-once must survive table maintenance: compact + vacuum drops
    the per-batch history commits, so the applied-batch high-water mark has
    to ride in every retained commit's meta (``max_batch_id``), not be
    recovered by scanning history for individual batch ids."""
    from emdatapipelines_spark.versioned import compact, vacuum

    events = t(spark, SF_SMALL, "events")
    table = str(tmp_path / "rollup")
    for i in range(3):
        assert apply_rollup_batch(
            events.filter(f"event_id % 3 = {i}"), i, table, ["event_type"], {"value": "value"}
        )
    want = _direct(events)
    assert _serve(spark, table) == want

    # crash window: maintenance runs between the last commit and the replay
    compact(spark, table)
    vacuum(table, keep_last=1)
    assert len(history(table)) == 1  # only the compaction commit survives

    # Structured Streaming redelivers the last epoch after restart
    assert not apply_rollup_batch(
        events.filter("event_id % 3 = 2"), 2, table, ["event_type"], {"value": "value"}
    )
    assert _serve(spark, table) == want  # no double-count


def test_watermark_survives_retention_commit_then_compact(spark, tmp_path):
    """The maintenance-interleaving hazard: a retention (drop_partitions)
    commit lands AFTER the last rollup commit, then compact+vacuum run.
    compact must derive the carried watermark from ALL retained manifests —
    taking only the latest (the retention commit) would drop it and a
    replayed batch would double-count."""
    from emdatapipelines_spark.versioned import (
        batch_watermark,
        compact,
        drop_partitions,
        history,
        vacuum,
        write_versioned,
    )

    table = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], "day INT, x DOUBLE")
    write_versioned(df, table, partition_by=["day"], meta={"batch_id": 0, "max_batch_id": 0})
    write_versioned(
        df.filter("day = 2"), table, mode="append",
        partition_by=["day"], meta={"batch_id": 1, "max_batch_id": 1},
    )
    drop_partitions(spark, table, "day", keep=lambda v: v == "2")  # retention latest
    assert history(table)[-1]["meta"]["max_batch_id"] == 1  # propagated
    compact(spark, table)
    vacuum(table, keep_last=1)
    assert len(history(table)) == 1  # only the compaction commit survives
    assert batch_watermark(table) == 1  # the mark rode through maintenance


def test_fresh_checkpoint_fails_loudly_and_reset_recovers(spark, tmp_path):
    """A batch id FAR below the watermark is the fresh-checkpoint signature
    (epoch ids restart at 0): silently skipping would lose data, so it must
    raise; after an explicit reset_batch_watermark the new lineage applies."""
    import pytest

    from emdatapipelines_spark.streaming.incremental import StaleBatchError
    from emdatapipelines_spark.versioned import reset_batch_watermark

    events = t(spark, SF_SMALL, "events")
    table = str(tmp_path / "rollup")
    for i in range(3):
        assert apply_rollup_batch(
            events.filter(f"event_id % 3 = {i}"), i, table, ["event_type"], {"value": "value"}
        )
    # batch_id == watermark: the one legitimate Structured Streaming replay
    assert not apply_rollup_batch(
        events.filter("event_id % 3 = 2"), 2, table, ["event_type"], {"value": "value"}
    )
    # batch_id < watermark: different checkpoint — loud failure, no data loss
    with pytest.raises(StaleBatchError):
        apply_rollup_batch(
            events.filter("event_id % 3 = 0"), 0, table, ["event_type"], {"value": "value"}
        )
    # deliberate re-point at a new checkpoint: reset, then id 0 applies again
    reset_batch_watermark(table)
    assert apply_rollup_batch(
        events.limit(0), 0, table, ["event_type"], {"value": "value"}
    )


def test_streaming_dedup_within_watermark_drops_late_duplicate(spark, tmp_path):
    """dropDuplicatesWithinWatermark (T8's streaming twin): a duplicate key
    redelivered in a LATER microbatch, within the watermark horizon, must be
    dropped by state-store lookup — and the rollup built on top must count
    each key once."""
    import shutil

    from emdatapipelines_spark.streaming.incremental import dedup_within_watermark

    events = t(spark, SF_SMALL, "events").limit(200).cache()
    src = str(tmp_path / "src")
    # file 1: the original events; file 2: the SAME events redelivered
    events.coalesce(1).write.mode("overwrite").parquet(src)
    part = [f for f in __import__("os").listdir(src) if f.startswith("part-")][0]
    shutil.copy(f"{src}/{part}", f"{src}/redelivered-{part}")
    batch = spark.read.parquet(src)
    assert batch.count() == 2 * events.count()  # duplicates really landed

    stream = stream_source(
        spark, "file", schema=batch.schema, path=src, max_files_per_trigger=1
    ).drop("proc_time")
    deduped = dedup_within_watermark(stream, ["event_id"], "ts", "2 hours")

    from emdatapipelines_spark.streaming.sinks import start_to_memory

    q = start_to_memory(deduped, "dedup_wm", output_mode="append")
    q.awaitTermination(120)

    got = spark.table("dedup_wm")
    assert got.count() == events.count()
    assert got.select("event_id").distinct().count() == events.count()


def test_streaming_histogram_rollup_serves_batch_quantiles(spark, tmp_path):
    """Streamed histogram partials must serve the same interpolated
    percentiles as a batch-built histogram — live quantiles from stored
    partials, never re-reading stream history."""
    from emdatapipelines_spark.operators.reaggregate import (
        histogram_partial,
        quantiles_from_histogram,
    )
    from emdatapipelines_spark.streaming.incremental import incremental_histogram_rollup

    events = t(spark, SF_SMALL, "events")
    src = str(tmp_path / "src")
    events.repartition(3).write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)

    stream = stream_source(
        spark, "file", schema=batch.schema, path=src, max_files_per_trigger=1
    ).drop("proc_time")
    table = str(tmp_path / "hist")
    q = incremental_histogram_rollup(
        stream, table, ["event_type"], "value", 0.0, 500.0,
        checkpoint_dir=str(tmp_path / "ckpt"), nbins=50,
    )
    q.awaitTermination(120)

    served = {
        r["event_type"]: (r["p50"], r["p90"])
        for r in quantiles_from_histogram(
            read_versioned(spark, table), ["event_type"], [0.5, 0.9], 0.0, 500.0, 50
        ).collect()
    }
    direct = {
        r["event_type"]: (r["p50"], r["p90"])
        for r in quantiles_from_histogram(
            histogram_partial(batch, ["event_type"], "value", 0.0, 500.0, 50),
            ["event_type"], [0.5, 0.9], 0.0, 500.0, 50,
        ).collect()
    }
    assert served == direct and len(served) > 0


def test_continuous_ingest_dedup_maintains_index_exactly_once(spark, tmp_path):
    """Continuous-ingest dedup: batch 0 bootstraps the index; batch 1's
    exact copy of an indexed doc is dropped while fresh docs survive and
    join the index; replaying batch 1 is a detected no-op (otherwise the
    replayed docs would self-collide with their own signatures and be
    silently dropped)."""
    from emdatapipelines_spark.streaming.incremental import apply_dedup_index_batch

    idx = str(tmp_path / "dedup_index")
    b0 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
        ],
        "doc_id bigint, text string",
    )
    s0 = apply_dedup_index_batch(b0, 0, idx)
    assert sorted(r["doc_id"] for r in s0.collect()) == [1, 2]

    b1 = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),  # dup of 1
            (11, "sphinx of black quartz judge my vow tonight"),
        ],
        "doc_id bigint, text string",
    )
    s1 = apply_dedup_index_batch(b1, 1, idx)
    assert sorted(r["doc_id"] for r in s1.collect()) == [11]
    assert sorted(r["id"] for r in read_versioned(spark, idx).collect()) == [1, 2, 11]

    # replay of batch 1 after a simulated crash: detected, skipped
    assert apply_dedup_index_batch(b1, 1, idx) is None
    assert sorted(r["id"] for r in read_versioned(spark, idx).collect()) == [1, 2, 11]


def test_continuous_ingest_dedup_streaming_end_to_end(spark, tmp_path):
    """The foreachBatch wiring: a bounded stream drains through
    incremental_dedup_ingest; survivors land per-batch and the index holds
    one signature per accepted doc."""
    from emdatapipelines_spark.streaming.incremental import incremental_dedup_ingest

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id bigint, text string",
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    q = incremental_dedup_ingest(
        stream,
        str(tmp_path / "idx"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    # one batch: intra-batch dups are NOT collapsed (corpus-vs-batch contract)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2]
    idx = read_versioned(spark, str(tmp_path / "idx"))
    assert sorted(r["id"] for r in idx.collect()) == [1, 2]


def test_dedup_ingest_crash_between_sink_and_commit(spark, tmp_path):
    """Crash safety of the sink-before-commit ordering: a crash AFTER the
    survivors write but BEFORE the index commit leaves the watermark
    unadvanced, so the replayed batch recomputes (not a detected no-op) and
    both artifacts land. The reverse order would silently lose survivors."""
    import os

    import pytest

    from emdatapipelines_spark.streaming.incremental import apply_dedup_index_batch

    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    b1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id bigint, text string",
    )

    def real_sink(survivors, batch_id=1):
        survivors.write.mode("overwrite").parquet(
            os.path.join(out, f"batch_id={batch_id}")
        )

    def crashing_sink(survivors):
        real_sink(survivors)
        raise RuntimeError("simulated crash before index commit")

    with pytest.raises(RuntimeError, match="simulated crash"):
        apply_dedup_index_batch(b1, 1, idx, survivors_sink=crashing_sink)
    # survivors landed, index did NOT commit -> watermark unadvanced
    assert spark.read.parquet(out).count() == 1
    with pytest.raises(FileNotFoundError):
        read_versioned(spark, idx)

    # replay: recomputes (not skipped), rewrites survivors, commits index
    replay = apply_dedup_index_batch(b1, 1, idx, survivors_sink=real_sink)
    assert replay is not None
    assert sorted(r["doc_id"] for r in spark.read.parquet(out).collect()) == [1]
    assert sorted(r["id"] for r in read_versioned(spark, idx).collect()) == [1]

    # a second replay of the SAME batch after the commit is a detected no-op
    assert apply_dedup_index_batch(b1, 1, idx, survivors_sink=real_sink) is None


def test_streaming_ewma_end_to_end(spark, tmp_path):
    """incremental_ewma drains a file stream and matches the batch
    grouped_ewma exactly (the recurrence composes across microbatches)."""
    from emdatapipelines_spark.operators.windows import grouped_ewma
    from emdatapipelines_spark.streaming.incremental import incremental_ewma
    from emdatapipelines_spark.versioned import read_versioned

    events = t(spark, SF_SMALL, "events")
    src = str(tmp_path / "src")
    events.write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)

    stream = stream_source(spark, "file", schema=batch.schema, path=src).drop(
        "proc_time"
    )
    table = str(tmp_path / "ewma")
    q = incremental_ewma(
        stream,
        table,
        value_col="value",
        keys=["user_id"],
        order_cols=["ts", "event_id"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {
        r["user_id"]: (r["n_obs"], round(r["ewma"], 6) if r["ewma"] is not None else None)
        for r in read_versioned(spark, table).collect()
    }
    want = {
        r["user_id"]: (r["n_obs"], r["ewma"])
        for r in grouped_ewma(
            batch, "value", ["user_id"], ["ts", "event_id"], alpha=0.2
        ).collect()
    }
    assert got == want


def test_streaming_heavy_hitters_end_to_end(spark, tmp_path):
    """incremental_heavy_hitters maintains an MG state whose candidates
    cover every true heavy hitter of the drained stream."""
    from collections import Counter

    from emdatapipelines_spark.streaming.incremental import (
        heavy_hitters_from_state,
        incremental_heavy_hitters,
    )

    events = t(spark, SF_SMALL, "events")
    src = str(tmp_path / "src")
    events.write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)

    stream = stream_source(spark, "file", schema=batch.schema, path=src).drop(
        "proc_time"
    )
    table = str(tmp_path / "mg")
    k = 64
    q = incremental_heavy_hitters(
        stream, table, "user_id", str(tmp_path / "ckpt"), k=k
    )
    q.awaitTermination(120)

    s = 0.008
    cands = {
        r["user_id"]
        for r in heavy_hitters_from_state(spark, table, "user_id", s, k).collect()
    }
    true = Counter(r["user_id"] for r in batch.select("user_id").collect())
    n = sum(true.values())
    for item, c in true.items():
        if c / n >= s:
            assert item in cands


def test_rollup_partials_are_merge_order_independent(spark):
    """r12 ADVICE: the governed-stream eq_rollup equivalence compares
    chunked-then-merged partials against a one-pass aggregate with EXACT
    equality. That is sound because `partial_aggregate` casts each row's
    double to DECIMAL before summing and `combine_partials` merges decimal
    sums — associative, so any chunking/merge order yields bit-identical
    rows. Prove it: 1-chunk, 4-chunk, reversed-4-chunk, and 7-chunk
    applications of the same events all serve identical partial rows."""
    from emdatapipelines_spark.operators.reaggregate import (
        combine_partials,
        partial_aggregate,
    )

    events = (
        t(spark, SF_SMALL, "events")
        .withColumn("event_date", F.to_date("ts"))
        .select("event_id", "event_date", "event_type", "value")
    )
    keys = ["event_date", "event_type"]
    measures = {"value": "value"}
    one_pass = partial_aggregate(events, keys, measures)

    def chunked(n: int, reverse: bool = False):
        order = range(n - 1, -1, -1) if reverse else range(n)
        acc = None
        for kk in order:
            part = partial_aggregate(
                events.filter(F.col("event_id") % n == kk), keys, measures
            )
            acc = part if acc is None else combine_partials(
                [acc, part], keys, list(measures)
            )
        return acc

    for variant in (chunked(4), chunked(4, reverse=True), chunked(7)):
        assert variant.exceptAll(one_pass).count() == 0
        assert one_pass.exceptAll(variant).count() == 0
