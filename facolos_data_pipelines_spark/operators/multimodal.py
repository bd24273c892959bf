"""Multimodal columns — image/audio/video as opaque binary + metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual media decode is STUBBED —
the container has no image/audio libraries — behind
``NotImplementedError`` or a deterministic fake, clearly marked. In
production, swap ``_decode_image_stub`` for Pillow/torchvision etc.;
nothing else changes.

Design for 100 TB of media: binary payloads stay in parquet binary
columns (or pointers to object-store keys for >~100 MB blobs), work is
``mapInPandas`` over Arrow batches so each Python worker touches a
columnar slab, and ``spark.sql.files.maxPartitionBytes`` bounds batch
memory. Feature extraction emits fixed-width arrays ready for the
similarity operators.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata travels beside the blob — never inside it.
IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("format", T.StringType(), True),  # png/jpeg/...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("fps", T.DoubleType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

FEATURE_DIM = 16


def _make_image_decoder():
    """Returns the (stub) image decoder as a standalone closure.

    UDFs must bind the decoder as a *local* so cloudpickle serializes it
    by value — a module-level function would pickle by reference and
    force every executor to have this package importable (breaks
    clusters without --py-files).
    """

    def decode(payload: bytes) -> np.ndarray:
        """STUB — deterministic fake decode (no Pillow in this container).

        Produces a pseudo-pixel array seeded by the payload so tests are
        reproducible. Replace with a real decoder in production.
        """
        if payload is None:
            raise NotImplementedError("real image decode requires Pillow/cv2 — stubbed")
        # crc32, NOT hash(): Python's hash of bytes is salted per process
        # (PYTHONHASHSEED), which would make the fake decode differ
        # across executors and runs.
        rng = np.random.default_rng(zlib.crc32(bytes(payload)))
        return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)

    return decode


_decode_image_stub = _make_image_decoder()


def extract_image_features(df: DataFrame) -> DataFrame:
    """Decode (stub) + feature-extract images into array<float> columns.

    Real Spark plumbing: mapInPandas over Arrow batches; output schema
    carries the metadata through plus a FEATURE_DIM-float embedding and
    a mean-pixel summary column.
    """
    out_schema = T.StructType(
        [f for f in IMAGE_SCHEMA.fields if f.name != "payload"]
        + [
            T.StructField("mean_pixel", T.DoubleType(), True),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    decode = _make_image_decoder()  # local bind -> pickled by value
    dim = FEATURE_DIM

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            means, feats = [], []
            for payload in pdf["payload"]:
                px = decode(payload)
                means.append(float(px.mean()))
                hist = np.histogram(px, bins=dim, range=(0, 256))[0]
                total = max(int(hist.sum()), 1)
                feats.append((hist / total).astype(np.float32).tolist())
            yield pdf.drop(columns=["payload"]).assign(mean_pixel=means, features=feats)

    return df.mapInPandas(run, out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing — stub re-encodes metadata only (decode stubbed);
    the batch shape, signature, and schema are production-real."""
    out_schema = IMAGE_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # STUB: a real impl decodes, resizes, re-encodes the payload.
            yield pdf.assign(width=width, height=height)

    return df.mapInPandas(run, out_schema)


def sample_video_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index.

    Frame *selection* is pure Spark (sequence + explode — no Python);
    only the per-frame decode would be a UDF, and it is stubbed.
    """
    return (
        df.withColumn(
            "frame_index",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("n_frames"), F.lit(1)) - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ),
        )
        .withColumn("frame_ts_s", F.col("frame_index") / F.coalesce(F.col("fps"), F.lit(30.0)))
        .drop("payload")
    )


def audio_features(df: DataFrame) -> DataFrame:
    """Audio feature plumbing (stub decode): emits duration-normalized
    byte-rate and a FEATURE_DIM zero-vector placeholder with the real
    Arrow batch shape."""
    out_schema = T.StructType(
        [f for f in AUDIO_SCHEMA.fields if f.name != "payload"]
        + [
            T.StructField("byte_rate", T.DoubleType(), True),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rate = pdf["n_bytes"] / pdf["duration_s"].clip(lower=1e-9)
            feats = [[0.0] * FEATURE_DIM for _ in range(len(pdf))]  # STUB
            yield pdf.drop(columns=["payload"]).assign(byte_rate=rate, features=feats)

    return df.mapInPandas(run, out_schema)
