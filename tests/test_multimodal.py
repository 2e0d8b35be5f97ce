"""Multimodal binary-column plumbing: metadata expressions, byte-budget
partitioning, Arrow-batched decode stage (stubbed kernel), frame sampling.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from emdatapipelines_spark.llmdata.multimodal import (
    attach_media_metadata,
    decode_and_featurize,
    frame_sample_plan,
    partition_by_bytes,
)


def _media(spark):
    rows = [
        (0, "image/png", b"\x89PNG-fake-bytes-0"),
        (1, "video/mp4", b"ftyp-fake-bytes-1"),
        (2, "audio/wav", b"RIFF-fake-bytes-22"),
        (3, "image/png", None),
    ]
    return spark.createDataFrame(rows, "media_id long, mime_type string, payload binary")


def test_metadata_is_expression_only(spark):
    m = attach_media_metadata(_media(spark))
    got = {r["media_id"]: (r["byte_size"], r["content_hash"]) for r in m.collect()}
    assert got[0][0] == 17 and got[3][0] is None
    # deterministic content hash
    again = {r["media_id"]: r["content_hash"] for r in attach_media_metadata(_media(spark)).collect()}
    assert {k: v[1] for k, v in got.items()} == again


def test_partition_by_bytes(spark):
    m = attach_media_metadata(_media(spark))
    out = partition_by_bytes(m, "byte_size", target_partition_bytes=16)
    assert out.rdd.getNumPartitions() >= 2
    assert out.count() == 4


def test_decode_stage_deterministic_and_null_safe(spark):
    m = _media(spark)
    f1 = decode_and_featurize(m, feature_dim=8, kernel="stub").collect()
    f2 = decode_and_featurize(m, feature_dim=8, kernel="stub").collect()
    by_id = {r["media_id"]: r for r in f1}
    assert all(len(r["feature"]) == 8 for r in f1 if r["feature"] is not None)
    # stubbed kernel is deterministic run-to-run
    assert {r["media_id"]: r["feature"] for r in f1} == {r["media_id"]: r["feature"] for r in f2}
    # null payload → flagged, not failed
    assert by_id[3]["decode_status"] == "decode_unavailable" and by_id[3]["feature"] is None
    assert by_id[0]["decode_status"] == "ok"


def test_frame_sample_plan_counts(spark):
    m = spark.createDataFrame(
        [(1, "video/mp4", 3500), (2, "video/mp4", 999), (3, "image/png", 5000)],
        "media_id long, mime_type string, duration_ms int",
    )
    plan = frame_sample_plan(m, every_ms=1000)
    counts = {r["media_id"]: r["n"] for r in plan.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    # samples at 0,1000,2000,3000 for 3500ms; just 0 for sub-interval clips
    assert counts == {1: 4, 2: 1}


def test_resize_stage_stub_semantics(spark):
    from emdatapipelines_spark.llmdata.multimodal import resize_images

    out = {r["media_id"]: r for r in resize_images(_media(spark), 64, 32, kernel="stub").collect()}
    budget = (64 * 32) // 8
    assert out[0]["resize_status"] == "ok"
    assert len(out[0]["payload"]) == budget
    assert (out[0]["width"], out[0]["height"]) == (64, 32)
    # non-image rows pass through untouched
    assert out[1]["resize_status"] == "skipped_not_image"
    assert bytes(out[1]["payload"]) == b"ftyp-fake-bytes-1"
    assert out[1]["width"] is None
    # null payload flagged, not failed
    assert out[3]["resize_status"] == "decode_unavailable" and out[3]["payload"] is None
    # deterministic run-to-run
    again = {r["media_id"]: r for r in resize_images(_media(spark), 64, 32, kernel="stub").collect()}
    assert {k: bytes(v["payload"]) if v["payload"] is not None else None for k, v in out.items()} == {
        k: bytes(v["payload"]) if v["payload"] is not None else None for k, v in again.items()
    }
