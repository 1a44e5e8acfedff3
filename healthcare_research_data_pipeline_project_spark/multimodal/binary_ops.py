"""Multimodal columns: image/audio/video payloads as opaque BINARY
columns with typed metadata structs, processed via Arrow-batched
`mapInPandas` (north-star extension).

The decode path is REAL for containerless formats: images are PPM
(P6) and audio is PCM16 WAV, both synthesized as genuine files and
decoded with numpy + the stdlib `wave` module — no external codec
libraries. Video (`mp4`) has no in-container codec, so video rows
carry a synthetic payload and the decoder quarantines them with a
`decode_error` instead of crashing the batch — the production
behavior for undecodable blobs. Swapping in PIL/ffmpeg widens the
format set without touching the Spark plumbing.

Scale posture: payloads never pass through the driver; `mapInPandas`
streams Arrow batches executor-side, and metadata-only queries prune
the binary column entirely (columnar parquet reads skip it)."""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
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
        StructField("format", StringType()),    # ppm | wav | mp4 ...
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

DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),        # image
        StructField("height", IntegerType()),       # image
        StructField("mean_pixel", DoubleType()),    # image
        StructField("sample_rate", IntegerType()),  # audio
        StructField("n_samples", IntegerType()),    # audio
        StructField("rms", DoubleType()),           # audio
        StructField("decode_error", StringType()),  # quarantined rows
    ]
)

_WAV_RATE = 8000


def _bytes_stream(seed: int, media_id: int, n: int) -> np.ndarray:
    """n deterministic pseudo-random bytes from a sha256 counter-mode
    stream — partition-invariant, engine-free randomness."""
    out = bytearray()
    ctr = 0
    while len(out) < n:
        out += hashlib.sha256(f"{seed}:{media_id}:{ctr}".encode()).digest()
        ctr += 1
    return np.frombuffer(bytes(out[:n]), dtype=np.uint8)


def _make_ppm(seed: int, media_id: int, w: int, h: int) -> bytes:
    """A real P6 PPM image: ASCII header + raw RGB24 raster."""
    raster = _bytes_stream(seed, media_id, w * h * 3)
    return f"P6 {w} {h} 255\n".encode() + raster.tobytes()


def _make_wav(seed: int, media_id: int, n_samples: int) -> bytes:
    """A real PCM16 mono WAV file via the stdlib wave writer."""
    raw = _bytes_stream(seed, media_id, n_samples * 2)
    samples = raw.view("<i2")  # little-endian int16
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(_WAV_RATE)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL payloads: P6 PPM images and
    PCM16 WAV audio (decodable below); video rows get a hash-derived
    opaque payload (no in-container codec) so the quarantine path is
    exercised too."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                kind = ["image", "audio", "video"][i % 3]
                if kind == "image":
                    w, h = 32 + (i % 16) * 8, 32 + (i % 12) * 8
                    payload, fmt = _make_ppm(seed, i, w, h), "ppm"
                    dur = None
                elif kind == "audio":
                    n_samp = _WAV_RATE // 4 + (i % 8) * 250  # 0.25-0.5 s
                    payload, fmt = _make_wav(seed, i, n_samp), "wav"
                    w = h = None
                    dur = int(n_samp * 1000 / _WAV_RATE)
                else:
                    digest = hashlib.sha256(f"{seed}:{i}".encode()).digest()
                    payload, fmt = digest * (4 + i % 8), "mp4"
                    w, h = 64 + (i % 16) * 8, 64 + (i % 12) * 8
                    dur = 1000 + i * 37
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "format": fmt,
                        "payload": payload,
                        "width": w,
                        "height": h,
                        "duration_ms": dur,
                    }
                )
            yield pd.DataFrame(rows)

    # size the partition count to the data, not the cluster: every
    # mapInPandas partition forks an Arrow-connected Python worker, and
    # 32 workers for 64 rows is pure startup cost. ~16 rows per batch
    # keeps worker count proportional to real work at any n.
    num_parts = max(1, min(spark.sparkContext.defaultParallelism, n // 16))
    return spark.range(0, n, 1, num_parts).mapInPandas(gen, MEDIA_SCHEMA)


def _parse_ppm(b: bytes) -> tuple[int, int, np.ndarray]:
    head = b.split(b"\n", 1)
    magic, w, h, maxv = head[0].split()
    if magic != b"P6":
        raise ValueError(f"not a P6 PPM (magic={magic!r})")
    w, h = int(w), int(h)
    raster = np.frombuffer(head[1], dtype=np.uint8, count=w * h * 3)
    return w, h, raster.reshape(h, w, 3)


def _parse_wav(b: bytes) -> tuple[int, np.ndarray]:
    with wave.open(io.BytesIO(b), "rb") as wf:
        rate = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    return rate, np.frombuffer(frames, dtype="<i2")


def decode_media(df: DataFrame) -> DataFrame:
    """REAL decode for ppm (numpy raster parse) and wav (stdlib wave +
    numpy PCM): per-row stats, Arrow-batched, executor-side only.
    Undecodable rows (video/mp4, corrupt payloads) are quarantined with
    a `decode_error` instead of failing the batch."""
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                out = {
                    "media_id": r.media_id,
                    "kind": r.kind,
                    "width": None,
                    "height": None,
                    "mean_pixel": None,
                    "sample_rate": None,
                    "n_samples": None,
                    "rms": None,
                    "decode_error": None,
                }
                try:
                    if r.format == "ppm":
                        w, h, px = _parse_ppm(bytes(r.payload))
                        out.update(
                            width=w,
                            height=h,
                            mean_pixel=float(px.mean()),
                        )
                    elif r.format == "wav":
                        rate, samples = _parse_wav(bytes(r.payload))
                        out.update(
                            sample_rate=rate,
                            n_samples=int(samples.size),
                            rms=float(
                                np.sqrt((samples.astype(np.float64) ** 2).mean())
                            ),
                        )
                    else:
                        raise ValueError(f"no codec for format={r.format!r}")
                except Exception as e:  # quarantine, don't crash the batch
                    out["decode_error"] = f"{type(e).__name__}: {e}"[:200]
                rows.append(out)
            yield pd.DataFrame(rows)

    return df.mapInPandas(decode, DECODE_SCHEMA)


def resize_images(df: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """Nearest-neighbor resize of PPM payloads to (out_w, out_h) —
    a real image transform (numpy index striding), emitting new valid
    PPM payloads. Non-image rows pass through untouched."""
    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def one(row):
                if row["format"] != "ppm":
                    return row["payload"]
                w, h, px = _parse_ppm(bytes(row["payload"]))
                ys = (np.arange(out_h) * h // out_h)
                xs = (np.arange(out_w) * w // out_w)
                small = px[ys][:, xs]
                return (
                    f"P6 {out_w} {out_h} 255\n".encode() + small.tobytes()
                )

            pdf = pdf.copy()
            pdf["payload"] = pdf.apply(one, axis=1)
            pdf.loc[pdf["format"] == "ppm", "width"] = out_w
            pdf.loc[pdf["format"] == "ppm", "height"] = out_h
            yield pdf

    return df.mapInPandas(resize, df.schema)


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
