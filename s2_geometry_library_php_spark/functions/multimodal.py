"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment) behind ``DecoderUnavailable`` or a deterministic
fake; the Spark-side plumbing — schema, batch iteration shape,
partition sizing — is real and tested (tests/test_multimodal.py).

Pattern: ``mapInPandas`` with an iterator of batches so a single
executor thread never materializes more than one Arrow batch of
binary payloads (critical when payloads are MBs: tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` down for media
tables)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
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
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


class DecoderUnavailable(NotImplementedError):
    """Raised by the real decode path: the media libraries (PIL,
    ffmpeg, soundfile) are not present in this environment."""


def _decode_image(payload: bytes) -> np.ndarray:
    raise DecoderUnavailable(
        "image decode requires PIL/opencv — not available; "
        "use deterministic_fake=True for plumbing tests"
    )


def _fake_feature(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in feature: byte-histogram moments — a pure
    function of the payload so tests are reproducible."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    return (hist / max(len(arr), 1)).astype(np.float32)


def extract_features(
    media: DataFrame, deterministic_fake: bool = True, dim: int = 16
) -> DataFrame:
    """media table -> per-item feature vector via ``mapInPandas``.

    Batch shape: the iterator yields one output batch per input batch;
    payload column is dropped before return so the (large) binaries
    never travel further down the plan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if deterministic_fake:
                    feats.append(_fake_feature(payload, dim).tolist())
                else:
                    feats.append(_decode_image(payload).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_ts_ms)
    rows for each sample instant — the decode of the actual frame is
    the stubbed step.  Pure column math (sequence + explode)."""
    from pyspark.sql import functions as F

    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def synth_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for plumbing tests (no
    external data): payload bytes derived from media_id."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(((i * 7 + j * 13) % 251) for j in range(128 + i))
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 16,
                48 + i % 9,
                (i % 10) * 1000 + 500,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
