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


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("out_width", IntegerType()),
    StructField("out_height", IntegerType()),
    StructField("payload", BinaryType()),
    StructField("n_bytes", LongType()),
])


def resize_images(media: DataFrame, width: int = 32, height: int = 32,
                  fake: bool = True) -> DataFrame:
    """Image resize through the Arrow batch path (brief: 'resize as Pandas
    UDFs over mapInPandas').

    Real pipeline shape — blob-aware partitions in, one decoded+resampled
    payload out per image; only the marked decode/encode pair is fake
    (deterministic nearest-neighbor resample of the pseudo-pixel stream;
    a real build swaps in PIL decode + Lanczos + re-encode in the same
    function body)."""
    imgs = media.where(F.col("kind") == "image")
    out_n = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "out_width", "out_height",
                                    "payload", "n_bytes")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = _decode_stub(bytes(payload), "image", fake)
                if px.size == 0:
                    px = np.zeros(1)
                idx = np.minimum((np.arange(out_n) * px.size) // out_n,
                                 px.size - 1)
                resized = px[idx].astype(np.uint8).tobytes()
                rows["media_id"].append(mid)
                rows["out_width"].append(width)
                rows["out_height"].append(height)
                rows["payload"].append(resized)
                rows["n_bytes"].append(len(resized))
            yield pd.DataFrame(rows)

    return imgs.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_ts_ms", IntegerType()),
    StructField("frame_sha256", StringType()),
    StructField("mean_byte", DoubleType()),
])


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  fake: bool = True) -> DataFrame:
    """Execute the frame-sampling plan: explode timestamps from metadata
    (no decode), join payloads back, decode each (media_id, ts) pair in the
    Arrow batch path.  The fake frame decode slices the payload
    deterministically by timestamp — the real one seeks the container and
    decodes the keyframe in the same function body."""
    plan = frame_sample_plan(media, every_ms)
    src = plan.join(media.select("media_id", "payload", "meta_duration_ms"),
                    "media_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "frame_ts_ms", "frame_sha256",
                                    "mean_byte")}
            for mid, ts, payload, dur in zip(pdf["media_id"], pdf["frame_ts_ms"],
                                             pdf["payload"], pdf["meta_duration_ms"]):
                px = _decode_stub(bytes(payload), "video", fake)
                dur = max(int(dur or 1), 1)
                # integer arithmetic: float division here would round
                # differently from an oracle's integer // at boundaries
                lo = (px.size * min(int(ts), dur)) // (dur + 1)
                frame = px[lo:lo + max(px.size // 8, 1)].astype(np.uint8)
                rows["media_id"].append(mid)
                rows["frame_ts_ms"].append(ts)
                rows["frame_sha256"].append(
                    hashlib.sha256(frame.tobytes()).hexdigest())
                rows["mean_byte"].append(float(frame.mean()) if frame.size else 0.0)
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, schema=FRAME_SCHEMA)


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
