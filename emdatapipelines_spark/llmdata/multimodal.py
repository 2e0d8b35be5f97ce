"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The decode kernels themselves are STUBBED (the
image/audio libraries are not in this container — marked clearly below); the
Spark-side contract — schema, batch shape, partition sizing, UDF signature —
is real and tested.

Scale notes: binary payloads dominate partition size, so the pipeline
repartitions by byte budget before the Python stage (`partition_by_bytes`),
and metadata-only operations (filtering by width/duration/mime) stay
column-expression-only so Catalyst prunes the binary column out of the scan
when it isn't needed.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # optional dependency: real image kernels activate when PIL is present
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover - sandbox has no PIL
    _PILImage = None
    HAS_PIL = False

#: canonical multimodal record schema
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime_type", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("byte_size", LongType(), True),
    ]
)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Metadata derivable without decoding: byte size + a deterministic
    content hash. Pure expressions — the binary column is only read, never
    shipped to Python."""
    return df.withColumn("byte_size", F.length(F.col(payload_col)).cast("long")).withColumn(
        "content_hash", F.md5(F.col(payload_col))
    )


def partition_by_bytes(df: DataFrame, byte_size_col: str, target_partition_bytes: int = 256 * 1024 * 1024) -> DataFrame:
    """Repartition so each partition carries ~``target_partition_bytes`` of
    payload — keeps Arrow batches bounded in the Python stage."""
    total = df.agg(F.sum(byte_size_col)).first()[0] or 0
    n = max(1, int(total // target_partition_bytes) + 1)
    return df.repartition(n)


FEATURE_SCHEMA = "media_id long, mime_type string, feature array<double>, decode_status string"


def _pil_feature(payload: bytes, dim: int) -> list | None:
    """Real image feature: decode, grayscale, ``dim``-bin normalized
    histogram. Deterministic for a given payload. None on undecodable."""
    import io

    try:
        with _PILImage.open(io.BytesIO(payload)) as im:
            g = np.asarray(im.convert("L"), dtype=np.uint8)
        hist, _ = np.histogram(g, bins=dim, range=(0, 256))
        total = max(int(hist.sum()), 1)
        return (hist / total).astype(np.float64).tolist()
    except Exception:
        return None


def _pil_resize(payload: bytes, w: int, h: int) -> bytes | None:
    """Real resize kernel: decode → bilinear resample → PNG re-encode."""
    import io

    try:
        with _PILImage.open(io.BytesIO(payload)) as im:
            out = io.BytesIO()
            im.convert("RGB").resize((w, h)).save(out, format="PNG")
            return out.getvalue()
    except Exception:
        return None


def decode_and_featurize(df: DataFrame, feature_dim: int = 8, kernel: str = "auto") -> DataFrame:
    """Decode + feature-extract stage over media batches.

    ``kernel='auto'`` uses the REAL PIL grayscale-histogram kernel for
    ``image/*`` rows when PIL is importable on the executors (gated like
    the Kafka integration test — see ``tests/test_multimodal_pil.py``)
    and falls back to the deterministic stub otherwise. ``'stub'`` forces
    the fallback: a pseudo-feature mixed from the payload bytes so the
    full distributed path — Arrow batch in, feature rows out — is
    exercised in environments without image libraries. Either way the
    batch shape, schema, and failure contract (status column, never a
    failed job) are identical.
    """
    use_pil = kernel == "pil" or (kernel == "auto" and HAS_PIL)

    def _fake_decode_batch(payloads: list, dim: int) -> tuple[list, list]:
        # Deterministic fake decode, vectorized over the whole Arrow batch
        # (NOT a real decode — a real kernel would also be batch-shaped:
        # stacked tensors in, feature matrix out). Per-payload seed = first 8
        # bytes; features from a splitmix64-style mix, one numpy pass.
        seeds = np.array(
            [
                0 if p is None else int.from_bytes(p[:8].ljust(8, b"\0"), "little")
                for p in payloads
            ],
            dtype=np.uint64,
        )
        idx = np.arange(1, dim + 1, dtype=np.uint64)
        x = seeds[:, None] + idx[None, :] * np.uint64(0x9E3779B97F4A7C15)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        feats_mat = (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        feats, status = [], []
        for i, p in enumerate(payloads):
            if p is None:
                # real kernels raise NotImplementedError per unsupported
                # payload; surfaced as a status column, never a failed job
                feats.append(None)
                status.append("decode_unavailable")
            else:
                feats.append(feats_mat[i].tolist())
                status.append("ok")
        return feats, status

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, status = _fake_decode_batch(list(pdf["payload"]), feature_dim)
            if use_pil:
                for i, (mime, payload) in enumerate(zip(pdf["mime_type"], pdf["payload"])):
                    if payload is not None and isinstance(mime, str) and mime.startswith("image/"):
                        real = _pil_feature(bytes(payload), feature_dim)
                        if real is not None:
                            feats[i], status[i] = real, "ok_pil"
                        else:
                            feats[i], status[i] = None, "decode_failed"
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime_type": pdf["mime_type"],
                    "feature": feats,
                    "decode_status": status,
                }
            )

    return df.select("media_id", "mime_type", "payload").mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "media_id long, mime_type string, payload binary, "
    "width int, height int, resize_status string"
)


def resize_images(
    df: DataFrame, target_width: int = 224, target_height: int = 224, kernel: str = "auto"
) -> DataFrame:
    """Resize stage for image rows — same distributed shape as
    ``decode_and_featurize``: Arrow batches in, resized rows out.

    ``kernel='auto'`` runs the REAL kernel (PIL decode → bilinear resample
    → PNG re-encode) when PIL is importable, else the stand-in: a
    deterministic payload — the source bytes cycled to the target byte
    budget (``target_width * target_height // 8``, capped) — so output
    sizes scale with the target dims and the pipeline downstream of
    resize (batching, re-partitioning, writes) is exercised with
    realistic row weights.

    Non-image rows pass through unchanged (``skipped_not_image``); null /
    undecodable payloads are flagged, never failed — one corrupt object
    must not kill a 100 TB job.
    """
    budget = max(1, (target_width * target_height) // 8)
    use_pil = kernel == "pil" or (kernel == "auto" and HAS_PIL)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, widths, heights, status = [], [], [], []
            for mime, payload in zip(pdf["mime_type"], pdf["payload"]):
                is_image = isinstance(mime, str) and mime.startswith("image/")
                if not is_image:
                    out_payload.append(payload)
                    widths.append(None)
                    heights.append(None)
                    status.append("skipped_not_image")
                elif payload is None:
                    out_payload.append(None)
                    widths.append(None)
                    heights.append(None)
                    status.append("decode_unavailable")
                elif use_pil:
                    real = _pil_resize(bytes(payload), target_width, target_height)
                    out_payload.append(real)
                    widths.append(target_width if real is not None else None)
                    heights.append(target_height if real is not None else None)
                    status.append("ok_pil" if real is not None else "decode_failed")
                else:
                    reps = budget // max(len(payload), 1) + 1
                    out_payload.append((bytes(payload) * reps)[:budget])
                    widths.append(target_width)
                    heights.append(target_height)
                    status.append("ok")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime_type": pdf["mime_type"],
                    "payload": out_payload,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "resize_status": status,
                }
            )

    return df.select("media_id", "mime_type", "payload").mapInPandas(run, RESIZE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: explode the sample timeline from
    metadata only (no decode): one row per (media_id, sample_ts_ms). The
    actual frame grab would run in `decode_and_featurize`."""
    return df.filter(F.col("mime_type").startswith("video/")).select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("sample_ts_ms"),
    )
