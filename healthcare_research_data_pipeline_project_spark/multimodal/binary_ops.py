"""Multimodal columns: image/audio/video payloads as opaque BINARY
columns with typed metadata structs, processed via Arrow-batched
`mapInPandas` (north-star extension).

The container has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic fake behind the real Spark plumbing —
schema, partitioning, UDF signature, and batch shape are production-
real; swapping `_fake_decode` for PIL/librosa is a one-function
change.

Scale posture: payloads never pass through the driver; `mapInPandas`
streams Arrow batches executor-side, and metadata-only queries prune
the binary column entirely (columnar parquet reads skip it)."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),      # image | audio | video
        StructField("format", StringType()),    # png | wav | mp4 ...
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("byte_len", LongType()),
        StructField("sha256", StringType()),
        StructField("entropy_proxy", LongType()),
    ]
)


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from
    sha256(id, seed) — real binary columns without codec deps."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            rows = []
            for i in ids:
                h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
                kind = ["image", "audio", "video"][i % 3]
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                        "payload": h * (4 + i % 8),
                        "width": 64 + (i % 16) * 8 if kind != "audio" else None,
                        "height": 64 + (i % 12) * 8 if kind != "audio" else None,
                        "duration_ms": 1000 + i * 37 if kind != "image" else None,
                    }
                )
            yield pd.DataFrame(rows)

    # size the partition count to the data, not the cluster: every
    # mapInPandas partition forks an Arrow-connected Python worker, and
    # 32 workers for 64 rows is pure startup cost. ~16 rows per batch
    # keeps worker count proportional to real work at any n.
    num_parts = max(1, min(spark.sparkContext.defaultParallelism, n // 16))
    return spark.range(0, n, 1, num_parts).mapInPandas(gen, MEDIA_SCHEMA)


def decode_media(df: DataFrame) -> DataFrame:
    """STUB: real decoding (PIL/torchaudio/ffmpeg) is unavailable in
    this container. The Spark-side contract is real; the decode body
    raises to make the stub explicit."""
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "media decode requires an image/audio codec library; "
            "swap this body for PIL/librosa in a full environment"
        )

    return df.mapInPandas(decode, df.schema)


def extract_features(df: DataFrame) -> DataFrame:
    """Real feature extraction over the binary payload (byte length,
    content hash, distinct-byte entropy proxy) — Arrow-batched, no
    driver involvement."""
    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "entropy_proxy": pdf["payload"].map(
                        lambda b: len(set(b))
                    ).astype("int64"),
                }
            )
            yield out

    return df.mapInPandas(feats, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing: slice the payload at fixed strides
    (stands in for video frame extraction; JVM-side `substring` on
    binary — no Python in the hot path)."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, int(length(payload) / {every_n_bytes}) - 1),"
                f" i -> substring(payload, i * {every_n_bytes} + 1, {every_n_bytes}))"
            )
        ).alias("frame_idx", "frame_bytes"),
    )
