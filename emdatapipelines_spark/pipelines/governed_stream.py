"""One governed STREAMING production run (VERDICT r11 #4): the streaming
layer working as a composed pipeline under the same ``GovernanceLog`` as
the batch governed run (`pipelines/governed.py`), with a mid-stream
kill/restart proving the exactly-once recovery contract end-to-end.

Four streams run over file-replayed fixtures (one parquet file per
microbatch, ``Trigger.AvailableNow`` + ``maxFilesPerTrigger=1``):

- **dedup ingest** (documents → MinHash corpus index + survivors +
  per-snapshot dup-rate records): a crash is INJECTED inside the
  ``kill_snapshot`` microbatch at the worst possible point — after the
  survivors/rate sink wrote but before the index watermark committed.
  The restarted query (same checkpoint) replays that exact batch; the
  sink's ``batch_id=`` overwrite and the index's monotone watermark make
  the replay converge instead of double-applying
  (`streaming/incremental.apply_dedup_index_batch`).
- **rollup** (events → daily per-type versioned partials,
  `incremental_rollup`): exactly-once mergeable partials.
- **co-occurrence graph** (lineitem → supplier co-occurrence edge state,
  `cooccurrence_graph_ingest`).
- **upsert** (events → latest-event-per-user serving table,
  `incremental_upsert`, struct (ts, event_id) version so last-wins is a
  total order).

Every stream's FINAL STATE is compared against its batch twin — the same
primitive driven once over the full input (dedup: the identical snapshot
sequence applied without a crash; rollup: one `partial_aggregate` over
all events; graph: `operators.graph.cooccurrence_edges`; upsert: one
`upsert_last_wins` merge) — so the report's ``equivalence`` block is the
machine-checked claim "kill/restart changed nothing".

Governance: lineage records per stream edge, compliance events for the
injected crash and the measured recovery, dbt-style quality gates on the
serving outputs. `scripts/run_governed_stream.py` executes this and
commits GOVERNED_STREAM.json; `tests/test_governed_stream.py` pins the
invariants at sf0.001.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession, functions as F

from ..lineage import GovernanceLog
from ..operators.reaggregate import partial_aggregate
from ..quality.dbt_tests import (
    TestCase,
    run_test_suite,
    test_not_null,
    test_unique,
)
from ..streaming.incremental import (
    apply_dedup_index_batch,
    applied_batch_watermark,
    cooccurrence_graph_ingest,
    incremental_rollup,
    incremental_upsert,
)
from ..versioned import read_versioned

DOC_SCHEMA = "doc_id bigint, text string, snap int"
EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double"
)
LINE_SCHEMA = "l_orderkey long, l_suppkey long"


def _write_chunks(df, out_dir: str, n: int, chunk_expr) -> list[int]:
    """Split ``df`` into ``n`` single-file parquet chunks with strictly
    increasing mtimes so the file stream delivers chunk k as microbatch k
    (FileStreamSource orders by modification time, oldest first)."""
    counts = []
    base = time.time() - 3600
    for k in range(n):
        part = df.filter(chunk_expr == k)
        counts.append(part.count())
        path = os.path.join(out_dir, f"chunk{k}")
        part.coalesce(1).write.mode("overwrite").parquet(path)
        for root, _dirs, files in os.walk(path):
            for fn in files:
                os.utime(os.path.join(root, fn), (base + k, base + k))
        os.utime(path, (base + k, base + k))
    return counts


def _same_rows(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def run_governed_stream(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    n_snapshots: int = 3,
    kill_snapshot: int = 1,
    n_event_chunks: int = 4,
    kill_leg: str = "dedup",
) -> dict:
    """Run the composed streaming pipeline under governance and return the
    JSON-able run report (see module docstring for the contract).

    ``kill_leg`` selects where the crash is injected (VERDICT r12 #4 —
    recovery must not be leg-specific):

    - ``"dedup"``: inside the dedup-ingest microbatch, AFTER the
      survivors/rate sink wrote but BEFORE the index watermark commits —
      replay must RE-APPLY the killed batch (sink overwrite + monotone
      watermark make it converge).
    - ``"rollup"``: in the rollup leg's ``on_batch`` hook, AFTER the
      versioned partial table committed but BEFORE the streaming
      checkpoint records the epoch — the OTHER half of the exactly-once
      window: replay must SKIP the already-committed batch
      (``_replay_check``) or the partials double-count.
    - ``"cooccurrence"`` (VERDICT r13 #4): same post-commit/
      pre-checkpoint window, injected in the MOST STATE-HEAVY leg — the
      graph-edge accumulator, whose versioned state carries memberships
      AND pair counts. Replay must be a detected no-op (``applied=False``)
      or every co-occurrence in the killed batch double-credits.
    """
    if kill_leg not in ("dedup", "rollup", "cooccurrence"):
        raise ValueError(f"unknown kill_leg: {kill_leg!r}")
    from ..queries.registry import t as load

    gov = GovernanceLog()
    wall0 = time.perf_counter()

    # ---- input replay directories ----------------------------------------
    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "text",
        (F.col("doc_id") % n_snapshots).cast("int").alias("snap"),
    )
    in_docs = os.path.join(work_dir, "in_docs")
    snap_counts = _write_chunks(docs, in_docs, n_snapshots, F.col("snap"))
    gov.lineage_record("documents", "stream_in_docs", "file_replay")

    events = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    in_events = os.path.join(work_dir, "in_events")
    _write_chunks(
        events, in_events, n_event_chunks, F.col("event_id") % n_event_chunks
    )
    gov.lineage_record("events", "stream_in_events", "file_replay")

    lineitem = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    in_lines = os.path.join(work_dir, "in_lines")
    _write_chunks(
        lineitem, in_lines, 3, F.abs(F.xxhash64("l_orderkey", "l_suppkey")) % 3
    )
    gov.lineage_record("lineitem", "stream_in_lines", "file_replay")

    report: dict = {
        "sf_dir": sf_dir,
        "n_snapshots": n_snapshots,
        "kill_leg": kill_leg,
    }

    # ---- stream 1: dedup ingest with injected mid-stream crash ------------
    index_path = os.path.join(work_dir, "dedup_index")
    rates_path = os.path.join(work_dir, "dedup_rates")
    surv_path = os.path.join(work_dir, "dedup_survivors")
    ckpt = os.path.join(work_dir, "ckpt_dedup")
    fuse = os.path.join(work_dir, "crash_fuse")
    processed: list[int] = []

    def doc_stream():
        return (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_docs + "/*")
        )

    def process_docs(batch_df, batch_id: int) -> None:
        n_docs = batch_df.count()

        def sink(survivors) -> None:
            n_surv = survivors.count()
            snap = batch_df.agg(F.min("snap")).first()[0]
            spark.createDataFrame(
                [
                    (
                        int(snap),
                        n_docs,
                        n_docs - n_surv,
                        ((n_docs - n_surv) * 1_000_000) // max(n_docs, 1),
                    )
                ],
                "snap long, n_docs long, n_dup_vs_earlier long, dup_rate_ppm long",
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(rates_path, f"batch_id={batch_id}")
            )
            survivors.select("doc_id").write.mode("overwrite").parquet(
                os.path.join(surv_path, f"batch_id={batch_id}")
            )
            # the injected crash: AFTER the sink wrote, BEFORE the index
            # watermark commits — the worst-case point the sink-before-
            # commit ordering is designed for. The fuse file arms exactly
            # one crash; the restarted query sails through the replay.
            if (
                kill_leg == "dedup"
                and batch_id == kill_snapshot
                and not os.path.exists(fuse)
            ):
                with open(fuse, "w") as fh:
                    fh.write("blown")
                raise RuntimeError("injected crash: post-sink, pre-commit")

        res = apply_dedup_index_batch(
            batch_df, batch_id, index_path, survivors_sink=sink
        )
        processed.append(batch_id if res is not None else -batch_id)

    q = doc_stream().writeStream.foreachBatch(process_docs).option(
        "checkpointLocation", ckpt
    ).trigger(availableNow=True).start()
    crashed = False
    try:
        q.awaitTermination()
    except Exception:
        crashed = True
    if kill_leg == "dedup":
        gov.compliance_event(
            "stream_crash_injected",
            "dedup_index",
            f"batch {kill_snapshot}, post-sink pre-commit",
        )
    leg1_batches = list(processed)
    hw_at_crash = applied_batch_watermark(index_path)

    t_rec = time.perf_counter()
    q2 = doc_stream().writeStream.foreachBatch(process_docs).option(
        "checkpointLocation", ckpt
    ).trigger(availableNow=True).start()
    q2.awaitTermination()
    recovery_sec = round(time.perf_counter() - t_rec, 2)
    if kill_leg == "dedup":
        gov.compliance_event(
            "stream_recovered",
            "dedup_index",
            f"replayed batch {kill_snapshot}, drained in {recovery_sec}s",
        )
    gov.lineage_record("stream_in_docs", "dedup_index", "streaming_dedup")
    gov.lineage_record("dedup_index", "dedup_survivors", "streaming_dedup")
    gov.lineage_record("dedup_index", "dedup_rates", "streaming_dedup")

    report["dedup"] = {
        "snapshots": snap_counts,
        # r13 VERDICT cosmetic note: crashed_as_planned=False on a leg
        # that was never the kill target reads as a failure — was_kill_leg
        # makes each block self-describing
        "was_kill_leg": kill_leg == "dedup",
        "crashed_as_planned": crashed,
        "kill_batch": kill_snapshot,
        "watermark_at_crash": hw_at_crash,
        "leg1_batches": leg1_batches,
        "leg2_batches": processed[len(leg1_batches):],
        "replayed": kill_snapshot in processed[len(leg1_batches):],
        "recovery_sec": recovery_sec,
        "final_watermark": applied_batch_watermark(index_path),
    }

    # batch twin: the SAME snapshot sequence applied once, no crash
    index_b = os.path.join(work_dir, "dedup_index_batchtwin")
    twin_rates: list[tuple] = []
    twin_surv = None
    for k in range(n_snapshots):
        part = spark.read.parquet(os.path.join(in_docs, f"chunk{k}"))
        n_docs = part.count()
        surv = apply_dedup_index_batch(part, k, index_b)
        n_surv = surv.count()
        twin_rates.append(
            (k, n_docs, n_docs - n_surv, ((n_docs - n_surv) * 1_000_000) // max(n_docs, 1))
        )
        ids = surv.select("doc_id")
        twin_surv = ids if twin_surv is None else twin_surv.unionByName(ids)
    stream_rates = spark.read.parquet(rates_path).select(
        "snap", "n_docs", "n_dup_vs_earlier", "dup_rate_ppm"
    )
    twin_rates_df = spark.createDataFrame(
        twin_rates,
        "snap long, n_docs long, n_dup_vs_earlier long, dup_rate_ppm long",
    )
    eq_rates = _same_rows(stream_rates, twin_rates_df)
    eq_surv = _same_rows(
        spark.read.parquet(surv_path).select("doc_id"), twin_surv
    )
    eq_index = _same_rows(
        read_versioned(spark, index_path), read_versioned(spark, index_b)
    )

    # ---- stream 2: incremental rollup (events → daily per-type partials) --
    rollup_path = os.path.join(work_dir, "rollup")
    rollup_ckpt = os.path.join(work_dir, "ckpt_rollup")
    fuse2 = os.path.join(work_dir, "crash_fuse_rollup")
    rollup_batches: list[tuple[int, bool]] = []
    kill_chunk = min(1, n_event_chunks - 1)

    def rollup_hook(batch_id: int, applied: bool) -> None:
        rollup_batches.append((batch_id, applied))
        # the injected crash (kill_leg="rollup"): AFTER the versioned
        # partial table committed, BEFORE the streaming checkpoint
        # records the epoch — the dual of the dedup leg's pre-commit
        # kill. The replay MUST be skipped (applied=False) or the
        # partials double-count.
        if (
            kill_leg == "rollup"
            and batch_id == kill_chunk
            and not os.path.exists(fuse2)
        ):
            with open(fuse2, "w") as fh:
                fh.write("blown")
            raise RuntimeError("injected crash: post-commit, pre-checkpoint")

    def ev_stream():
        return (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_events + "/*")
            .withColumn("event_date", F.to_date("ts"))
        )

    keys = ["event_date", "event_type"]
    measures = {"value": "value"}
    q3 = incremental_rollup(
        ev_stream(), rollup_path, keys, measures, rollup_ckpt,
        on_batch=rollup_hook,
    )
    rollup_crashed = False
    try:
        q3.awaitTermination()
    except Exception:
        rollup_crashed = True
    rollup_leg1 = list(rollup_batches)
    rollup_recovery_sec = None
    if kill_leg == "rollup":
        gov.compliance_event(
            "stream_crash_injected",
            "events_rollup",
            f"batch {kill_chunk}, post-commit pre-checkpoint",
        )
        t_rec = time.perf_counter()
        q3b = incremental_rollup(
            ev_stream(), rollup_path, keys, measures, rollup_ckpt,
            on_batch=rollup_hook,
        )
        q3b.awaitTermination()
        rollup_recovery_sec = round(time.perf_counter() - t_rec, 2)
        gov.compliance_event(
            "stream_recovered",
            "events_rollup",
            f"replay skipped committed batch {kill_chunk},"
            f" drained in {rollup_recovery_sec}s",
        )
    gov.lineage_record("stream_in_events", "events_rollup", "streaming_rollup")
    stream_partials = read_versioned(spark, rollup_path)
    batch_partials = partial_aggregate(
        events.withColumn("event_date", F.to_date("ts")), keys, measures
    )
    # Exact equality here is deterministic, not flaky (r12 ADVICE): both
    # paths cast each row's double `value` to DECIMAL(28,2) BEFORE summing
    # (`partial_aggregate`), and `combine_partials` merges decimal sums —
    # decimal addition is associative, so chunked-then-merged equals
    # one-pass bit-for-bit regardless of microbatch boundaries or
    # partitioning. min/max/count are order-independent selections of
    # input values. Pinned by tests/test_incremental_rollup.py::
    # test_rollup_partials_are_merge_order_independent.
    eq_rollup = _same_rows(stream_partials, batch_partials)
    report["rollup"] = {
        "event_chunks": n_event_chunks,
        "was_kill_leg": kill_leg == "rollup",
        "rows": stream_partials.count(),
        "final_watermark": applied_batch_watermark(rollup_path),
    }
    if kill_leg == "rollup":
        leg2 = rollup_batches[len(rollup_leg1):]
        report["rollup"].update(
            {
                "crashed_as_planned": rollup_crashed,
                "kill_batch": kill_chunk,
                # leg 1 committed the killed batch (applied=True) before
                # the crash; the replay must show it SKIPPED
                "leg1_batches": [
                    {"batch": b, "applied": a} for b, a in rollup_leg1
                ],
                "leg2_batches": [{"batch": b, "applied": a} for b, a in leg2],
                "replay_skipped": any(
                    b == kill_chunk and not a for b, a in leg2
                ),
                "recovery_sec": rollup_recovery_sec,
            }
        )

    # ---- stream 3: co-occurrence graph (lineitem → supplier edges) ---------
    from ..operators.graph import cooccurrence_edges

    state_path = os.path.join(work_dir, "cooc_state")
    edges_path = os.path.join(work_dir, "cooc_edges")
    cooc_ckpt = os.path.join(work_dir, "ckpt_cooc")
    fuse3 = os.path.join(work_dir, "crash_fuse_cooc")
    cooc_batches: list[tuple[int, bool]] = []
    cooc_kill_batch = 1  # middle of the 3 lineitem chunks

    def cooc_hook(batch_id: int, applied: bool) -> None:
        cooc_batches.append((batch_id, applied))
        # the injected crash (kill_leg="cooccurrence"): AFTER the versioned
        # graph state committed (memberships + pair counts + watermark in
        # one atomic snapshot), BEFORE the streaming checkpoint records the
        # epoch. This is the most state-heavy leg: re-applying the batch
        # would double-credit every co-occurrence in it, so the replay
        # must be a DETECTED NO-OP (applied=False via the versioned
        # watermark, `_replay_check`).
        if (
            kill_leg == "cooccurrence"
            and batch_id == cooc_kill_batch
            and not os.path.exists(fuse3)
        ):
            with open(fuse3, "w") as fh:
                fh.write("blown")
            raise RuntimeError("injected crash: post-commit, pre-checkpoint")

    def li_stream():
        return (
            spark.readStream.schema(LINE_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_lines + "/*")
        )

    q4 = cooccurrence_graph_ingest(
        li_stream(), state_path, edges_path, cooc_ckpt,
        "l_orderkey", "l_suppkey", min_shared=2, on_batch=cooc_hook,
    )
    cooc_crashed = False
    try:
        q4.awaitTermination()
    except Exception:
        cooc_crashed = True
    cooc_leg1 = list(cooc_batches)
    cooc_recovery_sec = None
    if kill_leg == "cooccurrence":
        gov.compliance_event(
            "stream_crash_injected",
            "cooc_edges",
            f"batch {cooc_kill_batch}, post-commit pre-checkpoint",
        )
        t_rec = time.perf_counter()
        q4b = cooccurrence_graph_ingest(
            li_stream(), state_path, edges_path, cooc_ckpt,
            "l_orderkey", "l_suppkey", min_shared=2, on_batch=cooc_hook,
        )
        q4b.awaitTermination()
        cooc_recovery_sec = round(time.perf_counter() - t_rec, 2)
        gov.compliance_event(
            "stream_recovered",
            "cooc_edges",
            f"replay skipped committed batch {cooc_kill_batch},"
            f" drained in {cooc_recovery_sec}s",
        )
    gov.lineage_record("stream_in_lines", "cooc_edges", "streaming_graph")
    batches = sorted(os.listdir(edges_path))
    final_edges = spark.read.parquet(os.path.join(edges_path, batches[-1]))
    want_edges = cooccurrence_edges(lineitem, "l_orderkey", "l_suppkey", min_shared=2)
    eq_edges = _same_rows(final_edges, want_edges.select("src", "dst"))
    report["cooccurrence"] = {
        "edge_snapshots": len(batches),
        "was_kill_leg": kill_leg == "cooccurrence",
        "final_edges": final_edges.count(),
    }
    if kill_leg == "cooccurrence":
        leg2 = cooc_batches[len(cooc_leg1):]
        report["cooccurrence"].update(
            {
                "crashed_as_planned": cooc_crashed,
                "kill_batch": cooc_kill_batch,
                # leg 1 committed the killed batch (applied=True) before
                # the crash; the replay must show it SKIPPED
                "leg1_batches": [
                    {"batch": b, "applied": a} for b, a in cooc_leg1
                ],
                "leg2_batches": [{"batch": b, "applied": a} for b, a in leg2],
                "replay_skipped": any(
                    b == cooc_kill_batch and not a for b, a in leg2
                ),
                "recovery_sec": cooc_recovery_sec,
            }
        )

    # ---- stream 4: keyed upsert (latest event per user) --------------------
    from ..operators.upsert import upsert_last_wins

    upsert_path = os.path.join(work_dir, "latest_events")
    up_stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_events + "/*")
        .withColumn("ver", F.struct("ts", "event_id"))
    )
    q5 = incremental_upsert(
        up_stream, upsert_path, ["user_id"], "ver",
        os.path.join(work_dir, "ckpt_upsert"),
    )
    q5.awaitTermination()
    gov.lineage_record("stream_in_events", "latest_events", "streaming_upsert")
    stream_latest = read_versioned(spark, upsert_path)
    batch_latest = upsert_last_wins(
        None,
        events.withColumn("ver", F.struct("ts", "event_id")),
        ["user_id"],
        "ver",
    )
    eq_upsert = _same_rows(stream_latest, batch_latest)
    report["upsert"] = {"rows": stream_latest.count()}

    # ---- gates + governance -------------------------------------------------
    surv_all = spark.read.parquet(surv_path)
    gates = run_test_suite(
        [
            TestCase("dedup_survivors.not_null.doc_id",
                     test_not_null(surv_all, "doc_id")),
            TestCase("dedup_survivors.unique.doc_id",
                     test_unique(surv_all, "doc_id")),
            TestCase("events_rollup.not_null.event_type",
                     test_not_null(stream_partials, "event_type")),
            TestCase("latest_events.unique.user_id",
                     test_unique(stream_latest, "user_id")),
        ]
    ).collect()
    gate_failures = [r["test_name"] for r in gates if r["status"] == "fail"]

    report.update(
        {
            "equivalence": {
                "dedup_rates": eq_rates,
                "dedup_survivors": eq_surv,
                "dedup_index": eq_index,
                "rollup_partials": eq_rollup,
                "cooccurrence_edges": eq_edges,
                "upsert_latest": eq_upsert,
            },
            "gate_status": "fail" if gate_failures else "pass",
            "gate_results": {r["test_name"]: r["status"] for r in gates},
            "lineage_records": int(gov.lineage_df(spark).count()),
            "compliance_events": int(gov.compliance_df(spark).count()),
            "wall_sec": round(time.perf_counter() - wall0, 2),
        }
    )
    return report
