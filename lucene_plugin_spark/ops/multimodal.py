"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The decode step is STUBBED (this container has no image/audio libraries):
``decode_image`` raises ``NotImplementedError`` unless ``fake=True``, in
which case a deterministic fake decoder (bytes -> pseudo pixel stats) stands
in.  Everything around the stub — schema, batching, partition sizing, UDF
signatures — is real and tested, so dropping in PIL/librosa later only
replaces the marked function body.

Scale notes: binary payloads dominate partition size; ``rebalance_binary``
repartitions by a target bytes-per-partition budget so Arrow batches stay
under executor memory; metadata-only transformations select away the blob
column first (column pruning keeps the scan cheap).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("mime", StringType()),
    StructField("payload", BinaryType()),
    StructField("meta_width", IntegerType()),
    StructField("meta_height", IntegerType()),
    StructField("meta_duration_ms", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("sha256", StringType()),
    StructField("mean_byte", DoubleType()),
    StructField("feat_dim", IntegerType()),
])


def _decode_stub(payload: bytes, kind: str, fake: bool) -> np.ndarray:
    """STUB: real decode (PIL.Image.open / soundfile.read / pyav) is not
    available in this environment.  fake=True -> deterministic pseudo-decode
    (byte histogram as 'pixels') so the pipeline shape is testable."""
    if not fake:
        raise NotImplementedError(
            "media decode requires an image/audio library not present here; "
            "run with fake=True or install PIL/soundfile and replace this stub")
    arr = np.frombuffer(payload, dtype=np.uint8)
    return arr.astype(np.float64)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """binary payloads -> per-item feature rows via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = {k: [] for k in ("media_id", "kind", "n_bytes", "sha256",
                                     "mean_byte", "feat_dim")}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                raw = bytes(payload)
                px = _decode_stub(raw, kind, fake)
                feats["media_id"].append(mid)
                feats["kind"].append(kind)
                feats["n_bytes"].append(len(raw))
                feats["sha256"].append(hashlib.sha256(raw).hexdigest())
                feats["mean_byte"].append(float(px.mean()) if px.size else 0.0)
                feats["feat_dim"].append(int(px.size))
            yield pd.DataFrame(feats)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def rebalance_binary(media: DataFrame, target_bytes_per_partition: int = 256 << 20,
                     size_col_bytes: str = "payload") -> DataFrame:
    """Repartition a binary table so each partition carries ~target bytes
    (blob-aware sizing; row counts are meaningless when payloads vary 1000x)."""
    total = media.select(F.sum(F.length(F.col(size_col_bytes)))).collect()[0][0] or 0
    n = max(1, int(total / target_bytes_per_partition))
    return media.repartition(n)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video -> (media_id, frame_ts_ms) sampling plan, computed from metadata
    only (no decode): the downstream decode task list for frame extraction."""
    v = media.where(F.col("kind") == "video")
    return (v.select("media_id",
                     F.explode(F.sequence(F.lit(0), F.col("meta_duration_ms"),
                                          F.lit(every_ms))).alias("frame_ts_ms")))


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 2048)),
                               dtype=np.uint8).tobytes()
        rows.append((i, kind, f"application/x-{kind}", bytearray(payload),
                     64 if kind == "image" else None,
                     48 if kind == "image" else None,
                     5000 if kind == "video" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
