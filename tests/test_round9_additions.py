"""Round-9 additions without SQL oracles: the ANN parameter sweep's
self-validation contract and the streaming snapshot-dedup-rate twin."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.01"


def test_ann_param_sweep_recall_monotone(spark):
    all_rows = entry.queries()["sim_ann_param_sweep"](spark, SF).collect()
    fam = {}
    for r in all_rows:
        fam.setdefault(r["family"], {})[r["config"]] = r
    assert set(fam) == {"ivf", "lsh", "pq"}
    # IVF: recall monotone non-decreasing in nprobe (more cells scanned can
    # only add candidates), exact scan-cost axis
    ivf = fam["ivf"]
    recalls = [ivf[f"nprobe={p}"]["mean_recall_at_k"] for p in (1, 2, 4, 8)]
    assert all(a <= b + 1e-9 for a, b in zip(recalls, recalls[1:]))
    assert recalls[-1] > recalls[0]
    for p in (1, 2, 4, 8):
        assert ivf[f"nprobe={p}"]["scan_fraction_ppm"] == p * 1_000_000 // 64
        assert ivf[f"nprobe={p}"]["bytes_fraction_ppm"] == 1_000_000
    # LSH: recall monotone in the multiprobe Hamming radius; bucket-count
    # cost axis is the exact Hamming-ball size of 2^8 buckets
    lsh = fam["lsh"]
    lrec = [lsh[f"multiprobe={p}"]["mean_recall_at_k"] for p in (0, 1, 2)]
    assert all(a <= b + 1e-9 for a, b in zip(lrec, lrec[1:]))
    assert [lsh[f"multiprobe={p}"]["scan_fraction_ppm"] for p in (0, 1, 2)] == [
        1 * 1_000_000 // 256,
        9 * 1_000_000 // 256,
        37 * 1_000_000 // 256,
    ]
    # PQ: scans everything (row axis = 1.0), prices bytes; more subspaces
    # (m) = more bytes and >= recall
    pq = fam["pq"]
    assert all(r["scan_fraction_ppm"] == 1_000_000 for r in pq.values())
    assert (
        pq["m=16,k=16"]["bytes_fraction_ppm"] > pq["m=8,k=16"]["bytes_fraction_ppm"]
    )
    assert (
        pq["m=16,k=16"]["mean_recall_at_k"]
        >= pq["m=8,k=16"]["mean_recall_at_k"] - 1e-9
    )
    for r in all_rows:
        assert r["n_queries"] == 8


def test_snapshot_dedup_rate_streaming_twin(spark, tmp_path):
    """Three snapshots drain through the maintained index; each leaves one
    idempotent rate row: snapshot 0 bootstraps (rate 0), snapshot 1 has one
    exact copy of an indexed doc (rate 500000 of 2), snapshot 2 is fresh."""
    from emdatapipelines_spark.streaming.incremental import (
        apply_dedup_index_batch,
        snapshot_dedup_rate_ingest,
    )

    idx = str(tmp_path / "idx")
    rates = str(tmp_path / "rates")

    # batch-level (deterministic) drive of the same process function the
    # stream wrapper uses, via three manual snapshots
    snaps = [
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs")],
        [(10, "the quick brown fox jumps over the lazy dog"),  # dup of 1
         (11, "sphinx of black quartz judge my vow tonight")],
        [(20, "jackdaws love my big quartz sphinx of onyx")],
    ]
    import os

    for b, rows in enumerate(snaps):
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        n_docs = df.count()

        def sink(survivors, b=b, n_docs=n_docs):
            n_surv = survivors.count()
            n_dup = n_docs - n_surv
            spark.createDataFrame(
                [(b, n_docs, n_dup, (n_dup * 1_000_000) // max(n_docs, 1))],
                "snap long, n_docs long, n_dup_vs_earlier long, dup_rate_ppm long",
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(rates, f"batch_id={b}")
            )

        apply_dedup_index_batch(df, b, idx, survivors_sink=sink)

    got = {r["snap"]: r for r in spark.read.parquet(rates).collect()}
    assert got[0]["dup_rate_ppm"] == 0 and got[0]["n_docs"] == 2
    assert got[1]["n_dup_vs_earlier"] == 1 and got[1]["dup_rate_ppm"] == 500_000
    assert got[2]["dup_rate_ppm"] == 0


def test_snapshot_dedup_rate_stream_wrapper(spark, tmp_path):
    """End-to-end foreachBatch wiring: a bounded file stream drains through
    snapshot_dedup_rate_ingest and leaves one rate row covering the batch."""
    from emdatapipelines_spark.streaming.incremental import snapshot_dedup_rate_ingest

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs")],
        "doc_id bigint, text string",
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    q = snapshot_dedup_rate_ingest(
        stream,
        str(tmp_path / "idx2"),
        str(tmp_path / "rates2"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(str(tmp_path / "rates2")).collect()
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 2 and rows[0]["dup_rate_ppm"] == 0
