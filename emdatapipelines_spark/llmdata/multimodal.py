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


def decode_and_featurize(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Decode + feature-extract stage over media batches.

    STUB: real decoding (PIL/libav/torchaudio) is unavailable in this
    container; ``_fake_decode`` below produces a deterministic
    pseudo-feature from the payload bytes so the full distributed path —
    Arrow batch in, feature rows out — is exercised end-to-end. Swap
    ``_fake_decode`` for a real kernel in production.
    """

    def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
        # deterministic fake: seed an RNG from the payload hash (NOT a real decode)
        if payload is None:
            raise NotImplementedError("real media decode not available in this environment")
        seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little", signed=False) % (2**32)
        rng = np.random.RandomState(seed)
        return rng.rand(dim)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, status = [], []
            for payload in pdf["payload"]:
                try:
                    feats.append(_fake_decode(payload, feature_dim).tolist())
                    status.append("ok")
                except NotImplementedError:
                    feats.append(None)
                    status.append("decode_unavailable")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime_type": pdf["mime_type"],
                    "feature": feats,
                    "decode_status": status,
                }
            )

    return df.select("media_id", "mime_type", "payload").mapInPandas(run, FEATURE_SCHEMA)


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
