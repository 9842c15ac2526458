"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery — schema, partition sizing, Arrow batch shape,
mapInPandas UDF signatures — is real and tested; the actual media decoding is
STUBBED (the container ships no image/audio libraries): `decode_image` either
raises NotImplementedError (strict mode) or produces a deterministic fake
derived from the bytes (test mode), clearly marked.

Pattern: keep media blobs in their own column family (Parquet splits big
binary columns into their own pages; column pruning means metadata-only scans
never touch them), carry typed metadata beside them, and process with
mapInPandas so one Arrow batch = one work unit with bounded memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("payload", T.BinaryType()),      # opaque encoded bytes
    T.StructField("width", T.IntegerType()),       # typed metadata
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])

_FEATURE_DIM = 16

_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("sha256", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def synthesize_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests.

    Payload bytes are an md5 chain over the media_id (utf-8 of
    ``md5("i:0") || md5("i:1") || ...``) — a portable construction any SQL
    engine reproduces exactly, so sha256/n_bytes get a real DuckDB oracle.
    ``seed`` is kept for API compatibility (the chain is seedless)."""
    rows = []
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
    for i in range(n):
        kind = kinds[i % 3]
        nchunks = 2 + (i % 5)  # 64..192 payload bytes
        payload = "".join(
            hashlib.md5(f"{i}:{j}".encode()).hexdigest()
            for j in range(nchunks)).encode("utf-8")
        rows.append((i, kind, mimes[kind], payload,
                     64 + i % 512 if kind != "audio" else None,
                     48 + i % 256 if kind != "audio" else None,
                     int(1000 + i * 17) if kind != "image" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(payload: bytes, strict: bool = False) -> np.ndarray:
    """STUB — no imaging libs in this container.

    strict=True raises (production posture until a decoder is wired in);
    otherwise returns a deterministic fake 'decoded frame' derived from the
    byte content so downstream plumbing is testable.
    """
    if strict:
        raise NotImplementedError(
            "image decoding requires an imaging library not present in this "
            "environment; wire in PIL/libvips here")
    h = hashlib.sha256(payload).digest()
    side = 4
    arr = np.frombuffer((h * ((side * side * 3) // len(h) + 1))[: side * side * 3],
                        dtype=np.uint8)
    return arr.reshape(side, side, 3).astype(np.float32) / 255.0


def extract_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """mapInPandas feature extraction: sha256 + byte stats + a fake embedding
    from the (stubbed) decode.  One Arrow batch per call, all-numpy inside."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats: List[list] = []
            shas: List[str] = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                shas.append(hashlib.sha256(b).hexdigest())
                frame = decode_image(b, strict=strict)
                v = frame.mean(axis=(0, 1))
                arr = np.concatenate([v, np.zeros(_FEATURE_DIM - v.size,
                                                  dtype=np.float32)])
                feats.append([float(x) for x in arr[:_FEATURE_DIM]])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "sha256": shas,
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "features": feats,
            })

    return df.mapInPandas(run, _FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, ts_ms) to decode.
    The expensive decode stays stubbed; the plan (explode over timestamps,
    partition-bounded) is the real Spark work at scale."""
    ts = F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms))
    return (df.filter(F.col("kind") == "video")
            .select("media_id", F.explode(ts).alias("ts_ms")))
