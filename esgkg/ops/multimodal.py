"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over mapInPandas.

The decode step is STUBBED (no image/audio libraries in this container):
`decode_image` raises NotImplementedError unless `fake=True`, in which case a
deterministic fake decoder derives (width, height, mean_luma) from the bytes.
Everything Spark-side — schema, partitioning, UDF signature, Arrow batch
shape — is real and tested; swapping in PIL/librosa is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import session as _session

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),   # image|audio|video
        T.StructField("payload", T.BinaryType(), True), # opaque bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic opaque-binary media table for plumbing tests."""
    _session.ensure_shipped(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                payload = hashlib.blake2b(
                    f"{seed}:{i}".encode(), digest_size=32
                ).digest() * (4 + i % 7)
                kind = ("image", "audio", "video")[i % 3]
                rows.append(
                    (i, kind, payload, {"codec": "fake", "src": f"s{i % 5}"})
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, float]:
    """STUB: real decode needs an image library not present in this
    container. The fake decoder is deterministic in the payload bytes."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/opencv (not installed); "
            "pass fake=True for the deterministic stand-in"
        )
    h = hashlib.blake2b(payload or b"", digest_size=8).digest()
    w = 64 + h[0] % 192
    ht = 64 + h[1] % 192
    luma = sum(payload[:256]) / max(1, len(payload[:256])) / 255.0
    return w, ht, luma


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """media → per-item decoded features (Arrow-batched; decode stubbed)."""
    _session.ensure_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(payload) if payload is not None else b""
                w, h, luma = decode_image(b, fake=fake)
                rows.append((int(mid), kind, w, h, luma, len(b)))
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA])

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame index
    (the actual frame decode is the same stub). Demonstrates the 1→many
    Arrow-batched expansion shape used for real video pipelines."""
    _session.ensure_shipped(media.sparkSession)
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_fp", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video" or payload is None:
                    continue
                b = bytes(payload)
                n_frames = max(1, len(b) // 16)
                for fi in range(0, n_frames, every_n):
                    fp = struct.unpack(
                        "<q",
                        hashlib.blake2b(
                            b[fi * 16 : (fi + 1) * 16], digest_size=8
                        ).digest(),
                    )[0]
                    rows.append((int(mid), fi, fp))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_fp"])

    return media.mapInPandas(run, schema=schema)
