"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The Spark-side plumbing — schema, batch shape, partition sizing, UDF
signatures — is real and tested; the codec step is stubbed because no
image/audio library ships in this container:

- ``decode_image`` with ``codec="fake"`` runs a deterministic synthetic
  decoder (dimensions + checksum derived from the bytes) so pipelines
  are testable end-to-end;
- ``codec="real"`` raises NotImplementedError at the exact seam where
  Pillow/libav would plug in.

Scale notes: binary payloads dominate row size, so operators here
(a) never collect payloads to the driver, (b) project metadata-only
columns before any wide operation, and (c) use ``mapInPandas`` so one
Python worker invocation amortizes over a whole Arrow batch. For 100 TB
of media the table should be written with payloads in their own parquet
column chunk (automatic) and ``spark.sql.files.maxPartitionBytes`` sized
so a task's batch of blobs fits executor memory.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), True),
    ]
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), False),
        StructField("checksum", StringType(), False),
    ]
)


def synthesize_media(spark, n: int = 64, payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake media table (seeded by media_id) for tests and
    benchmarks — stands in for a real ingest of binary files
    (spark.read.format('binaryFile') in production)."""
    rows = []
    for i in range(n):
        rng = np.random.RandomState(i)
        payload = rng.bytes(payload_bytes)
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, bytearray(payload), f"application/x-fake-{kind}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic 'decode': dimensions derived from a stable digest of
    the payload — any engine computing this gets identical results."""
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def decode_image(df: DataFrame, codec: str = "fake") -> DataFrame:
    """payload → (width, height, n_bytes, checksum) metadata frame.
    ``codec="real"`` marks the Pillow seam."""
    if codec == "real":
        raise NotImplementedError(
            "real image decoding requires Pillow/opencv — not in this "
            "container; the 'fake' codec exercises identical plumbing"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = batch["payload"]
            dims = [_fake_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "checksum": [
                        hashlib.md5(bytes(p)).hexdigest() for p in payloads
                    ],
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(decode, IMAGE_META_SCHEMA)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """payload → deterministic pseudo-embedding (unit-norm float array
    seeded from the checksum) — the feature-extraction seam where a real
    model (ONNX/torch via mapInPandas) would run. Output feeds the
    similarity operators unchanged."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("embedding", ArrayType(FloatType()), False),
        ]
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for p in batch["payload"]:
                seed = zlib.crc32(bytes(p)) & 0xFFFFFFFF
                rng = np.random.RandomState(seed)
                v = rng.randn(dim)
                v /= np.linalg.norm(v)
                out.append([float(x) for x in v])
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "kind": batch["kind"],
                    "embedding": out,
                }
            )

    return df.mapInPandas(feats, schema)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: explodes per-video frame indices from
    metadata (frame count derived deterministically from payload length)
    without decoding — the shuffle-light pattern: plan rows first, decode
    only sampled frames in a later mapInPandas."""
    n_frames = (F.length(F.col("payload")) / 8).cast("int")
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("payload", BinaryType(), False),
        StructField("n_bytes", LongType(), False),
    ]
)


def resize_images(
    df: DataFrame, target_w: int = 64, target_h: int = 64, codec: str = "fake"
) -> DataFrame:
    """payload → resized payload at (target_w, target_h). The 'fake'
    codec produces a deterministic downsampled byte stream (stride
    sampling of the source bytes to the target pixel count) so the
    batch shape, output schema, and size contraction are all real;
    ``codec="real"`` marks the Pillow ``Image.resize`` seam.

    Scale: resize is the classic payload-shrinking projection — run it
    EARLY so every downstream shuffle moves target-size bytes, not
    source-size. Output row size is bounded by target dims regardless of
    input skew (a 100 MB source row and a 100 KB one both emit
    target_w*target_h)."""
    if codec == "real":
        raise NotImplementedError(
            "real resize requires Pillow — not in this container; the "
            "'fake' codec exercises identical plumbing"
        )
    n_out = target_w * target_h

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            outs = []
            for p in batch["payload"]:
                b = bytes(p)
                if len(b) >= n_out:
                    stride = len(b) // n_out
                    out = b[:: stride][:n_out]
                else:
                    out = (b * (n_out // max(len(b), 1) + 1))[:n_out]
                outs.append(out)
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": outs,
                    "n_bytes": [len(o) for o in outs],
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(resize, RESIZED_SCHEMA)
