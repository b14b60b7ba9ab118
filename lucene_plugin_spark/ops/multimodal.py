"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

Decode is REAL for four public, dependency-free formats (numpy only):

- **PPM (P6)** and **BMP (24-bit BI_RGB)** images -> uint8 ``[h, w, 3]``;
- **WAV (RIFF PCM16)** audio -> int16 sample stream + rate;
- **Y4M (YUV4MPEG2, C444)** video -> per-frame planar planes + fps.

Formats that genuinely need external codecs (JPEG/PNG/MP4/Opus…) are NOT
faked as real: ``decode_media`` raises ``NotImplementedError`` for them
unless ``fake=True``, in which case a clearly-marked deterministic
pseudo-decode (payload bytes as the sample stream) stands in so pipeline
shape stays testable on arbitrary blobs.

Scale notes: binary payloads dominate partition size; ``rebalance_binary``
repartitions by a target bytes-per-partition budget so Arrow batches stay
under executor memory; metadata-only transformations select away the blob
column first (column pruning keeps the scan cheap).
"""

from __future__ import annotations

import hashlib
import struct
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


# --------------------------------------------------------------------------
# real, dependency-free codecs (public formats, numpy only)
# --------------------------------------------------------------------------

def encode_ppm(px: np.ndarray) -> bytes:
    """uint8 ``[h, w, 3]`` -> binary PPM (P6, maxval 255)."""
    h, w, c = px.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        px.astype(np.uint8)).tobytes()


def decode_ppm(b: bytes) -> np.ndarray:
    """Binary PPM (P6) -> uint8 ``[h, w, 3]``.  Handles '#' comments and
    arbitrary whitespace in the header per the netpbm spec."""
    if not b.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    toks, i, n = [], 2, len(b)
    while len(toks) < 3:
        while i < n and b[i:i + 1].isspace():
            i += 1
        if i < n and b[i:i + 1] == b"#":
            while i < n and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not b[j:j + 1].isspace():
            j += 1
        toks.append(int(b[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = toks
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    raster = b[i:i + need]
    if len(raster) != need:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_bmp(px: np.ndarray) -> bytes:
    """uint8 ``[h, w, 3]`` RGB -> 24-bit uncompressed BMP (BI_RGB,
    bottom-up rows, BGR byte order, rows padded to 4 bytes)."""
    h, w, c = px.shape
    assert c == 3
    pad = (-(w * 3)) % 4
    rows = px[::-1, :, ::-1].astype(np.uint8).reshape(h, w * 3)
    if pad:
        rows = np.hstack([rows, np.zeros((h, pad), dtype=np.uint8)])
    data = rows.tobytes()
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return hdr + info + data


def decode_bmp(b: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP -> uint8 ``[h, w, 3]`` RGB (top-down or
    bottom-up row order both supported)."""
    if not b.startswith(b"BM"):
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", b, 10)[0]
    hsz, w, h = struct.unpack_from("<Iii", b, 14)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    comp = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raster = np.frombuffer(b, dtype=np.uint8, count=h * stride, offset=off)
    rows = raster.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR -> RGB


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM16."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    return struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data),
                       b"WAVE", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
                       b"data", len(data)) + data


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 -> (int16 samples [n] or [n, ch], rate).  Walks the
    chunk list, so extra chunks (LIST/fact/...) are fine."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, n = 12, len(b)
    rate, channels, bits, data = None, 1, 16, None
    while i + 8 <= n:
        cid, sz = struct.unpack_from("<4sI", b, i)
        body = b[i + 8:i + 8 + sz]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={fmt}, bits={bits})")
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    if channels > 1:
        samples = samples.reshape(-1, channels)
    return samples, rate


def encode_y4m(frames: np.ndarray, fps: int = 1) -> bytes:
    """uint8 ``[n, h, w, 3]`` (3 full-res planes per frame) -> YUV4MPEG2
    C444 stream: stream header, then per frame ``FRAME\\n`` + planar data."""
    n, h, w, c = frames.shape
    assert c == 3
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (w, h, fps)]
    for f in frames:
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(
            f.astype(np.uint8).transpose(2, 0, 1)).tobytes())
    return b"".join(out)


def decode_y4m(b: bytes) -> tuple[np.ndarray, int]:
    """YUV4MPEG2 C444 -> (uint8 ``[n, h, w, 3]``, fps).  Parses the header
    parameter list and walks FRAME markers (per-frame params allowed)."""
    nl = b.index(b"\n")
    head = b[:nl].split(b" ")
    if head[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = fps = None
    colorspace = b"C420"
    for p in head[1:]:
        if p[:1] == b"W":
            w = int(p[1:])
        elif p[:1] == b"H":
            h = int(p[1:])
        elif p[:1] == b"F":
            fps = int(p[1:].split(b":")[0])
        elif p[:1] == b"C":
            colorspace = p
    if colorspace != b"C444":
        raise ValueError(f"unsupported Y4M colorspace {colorspace!r}")
    if not (w and h and fps):
        raise ValueError("incomplete Y4M header")
    fsize = 3 * w * h
    frames, i, n = [], nl + 1, len(b)
    while i < n:
        if b[i:i + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        i = b.index(b"\n", i) + 1  # skip optional frame params
        raw = b[i:i + fsize]
        if len(raw) != fsize:
            raise ValueError("truncated Y4M frame")
        frames.append(np.frombuffer(raw, dtype=np.uint8)
                      .reshape(3, h, w).transpose(1, 2, 0))
        i += fsize
    return np.stack(frames), fps


def sniff_format(payload: bytes) -> str | None:
    """Magic-byte dispatch for the real decoders; None = unknown format."""
    if payload.startswith(b"P6"):
        return "ppm"
    if payload.startswith(b"BM"):
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload.startswith(b"YUV4MPEG2"):
        return "y4m"
    return None


def decode_image(payload: bytes) -> np.ndarray:
    """Real image decode (PPM/BMP) -> uint8 ``[h, w, 3]``."""
    fmt = sniff_format(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    raise NotImplementedError(
        f"image format {payload[:2]!r} needs an external codec "
        "(real support here: PPM P6, BMP 24-bit)")


def _decode_stream(payload: bytes, kind: str, fake: bool) -> np.ndarray:
    """Payload -> flat float64 sample/pixel stream for feature extraction.
    Real for PPM/BMP (pixel bytes), WAV (int16 samples), Y4M (frame plane
    bytes); ``fake=True`` falls back to the deterministic pseudo-decode
    (payload bytes as the stream) for formats needing external codecs."""
    fmt = sniff_format(payload)
    if fmt in ("ppm", "bmp"):
        return decode_image(payload).reshape(-1).astype(np.float64)
    if fmt == "wav":
        return decode_wav(payload)[0].reshape(-1).astype(np.float64)
    if fmt == "y4m":
        return decode_y4m(payload)[0].reshape(-1).astype(np.float64)
    if not fake:
        raise NotImplementedError(
            "payload is not PPM/BMP/WAV/Y4M; other formats need external "
            "codecs — run with fake=True for the deterministic pseudo-decode")
    return np.frombuffer(payload, dtype=np.uint8).astype(np.float64)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """binary payloads -> per-item feature rows via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = {k: [] for k in ("media_id", "kind", "n_bytes", "sha256",
                                     "mean_byte", "feat_dim")}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                raw = bytes(payload)
                px = _decode_stream(raw, kind, fake)
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


def resize_rgb(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """2-D nearest-neighbor resample of uint8 ``[h, w, 3]`` pixels: output
    pixel (y, x) = input pixel (y*h//out_h, x*w//out_w)."""
    h, w, _ = px.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return px[ys][:, xs]


def resize_images(media: DataFrame, width: int = 32, height: int = 32,
                  fake: bool = True) -> DataFrame:
    """Image resize through the Arrow batch path (brief: 'resize as Pandas
    UDFs over mapInPandas').

    REAL for PPM/BMP payloads: decode -> 2-D nearest-neighbor resample ->
    re-encode in the same container.  Unknown formats use the marked
    deterministic 1-D pseudo-resample when ``fake=True`` (pipeline-shape
    testing on arbitrary blobs), else raise."""
    imgs = media.where(F.col("kind") == "image")
    out_n = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "out_width", "out_height",
                                    "payload", "n_bytes")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                fmt = sniff_format(raw)
                if fmt in ("ppm", "bmp"):
                    small = resize_rgb(decode_image(raw), width, height)
                    resized = (encode_ppm(small) if fmt == "ppm"
                               else encode_bmp(small))
                else:
                    px = _decode_stream(raw, "image", fake)
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
    Arrow batch path.

    REAL for Y4M payloads: parse the stream header (dims, fps), seek to
    frame ``min(ts*fps//1000, n-1)`` and hash that frame's planar bytes.
    Unknown containers use the marked deterministic payload-slice
    pseudo-decode when ``fake=True``, else raise."""
    plan = frame_sample_plan(media, every_ms)
    src = plan.join(media.select("media_id", "payload", "meta_duration_ms"),
                    "media_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "frame_ts_ms", "frame_sha256",
                                    "mean_byte")}
            y4m_cache: dict[int, tuple] = {}
            for mid, ts, payload, dur in zip(pdf["media_id"], pdf["frame_ts_ms"],
                                             pdf["payload"], pdf["meta_duration_ms"]):
                raw = bytes(payload)
                if sniff_format(raw) == "y4m":
                    hit = y4m_cache.get(mid)  # one decode per media per batch
                    if hit is None:
                        hit = y4m_cache[mid] = decode_y4m(raw)
                    frames, fps = hit
                    fi = min(int(ts) * fps // 1000, len(frames) - 1)
                    # hash the planar bytes exactly as stored in the stream
                    frame = np.ascontiguousarray(
                        frames[fi].transpose(2, 0, 1)).reshape(-1)
                else:
                    px = _decode_stream(raw, "video", fake)
                    dur_i = max(int(dur or 1), 1)
                    # integer arithmetic: float division here would round
                    # differently from an oracle's integer // at boundaries
                    lo = (px.size * min(int(ts), dur_i)) // (dur_i + 1)
                    frame = px[lo:lo + max(px.size // 8, 1)].astype(np.uint8)
                rows["media_id"].append(mid)
                rows["frame_ts_ms"].append(ts)
                rows["frame_sha256"].append(
                    hashlib.sha256(frame.tobytes()).hexdigest())
                rows["mean_byte"].append(float(frame.mean()) if frame.size else 0.0)
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, schema=FRAME_SCHEMA)


def synthetic_media(spark, n: int = 64, seed: int = 42,
                    real: bool = True) -> DataFrame:
    """Deterministic media table for tests.  ``real=True`` emits genuine
    payloads in the dependency-free formats (BMP/PPM images, WAV audio,
    Y4M video) so the REAL decoders run end-to-end; ``real=False`` keeps
    the legacy opaque random blobs for the fake-path plumbing tests."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if not real:
            payload = rng.integers(0, 256, size=int(rng.integers(64, 2048)),
                                   dtype=np.uint8).tobytes()
            mime = f"application/x-{kind}"
            w, h, dur = (64, 48, None) if kind == "image" else (None, None,
                         5000 if kind == "video" else None)
        elif kind == "image":
            w, h, dur = 64, 48, None
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload = encode_bmp(px) if i % 2 else encode_ppm(px)
            mime = "image/bmp" if i % 2 else "image/x-portable-pixmap"
        elif kind == "audio":
            w, h = None, None
            samples = (np.sin(np.arange(1600) * (0.01 + 0.001 * i))
                       * 12000).astype(np.int16)
            dur = 100  # 1600 samples at 16 kHz
            payload = encode_wav(samples, rate=16000)
            mime = "audio/wav"
        else:
            w, h = 8, 6
            frames = rng.integers(0, 256, size=(5, 6, 8, 3), dtype=np.uint8)
            dur = 5000  # 5 frames at 1 fps
            payload = encode_y4m(frames, fps=1)
            mime = "video/x-yuv4mpeg"
        rows.append((i, kind, mime, bytearray(payload), w, h, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


AHASH_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("ahash", LongType()),
    StructField("n_bits", IntegerType()),
])


def image_ahash(media: DataFrame, blocks_x: int = 8, blocks_y: int = 4,
                fake: bool = False) -> DataFrame:
    """(media_id, ahash, n_bits): PERCEPTUAL average-hash over REAL decoded
    rasters — the classic image near-dup fingerprint (block-mean aHash):
    partition the image into ``blocks_y x blocks_x`` blocks, set bit
    ``by*blocks_x + bx`` iff the block's mean exceeds the image mean.

    The comparison is INTEGER-EXACT: with ``B = blocks_x * blocks_y``
    equal-sized blocks, ``block_mean > image_mean`` iff
    ``B * block_sum > total_sum`` — pure int64 arithmetic, so the hash is
    bit-identical across engines and runs (no float mean boundaries).
    Identical hashes = perceptual duplicates; Hamming neighbours are the
    near-dups, and the pigeonhole block join (ops/dedup) applies to these
    hashes exactly as it does to SimHash.

    Scale shape: one ``mapInPandas`` decode pass over the (rebalanced)
    binary column — the inherent per-payload Python of every real codec —
    emitting 16 bytes per image; everything downstream is columnar.
    Requires image dims divisible by the grid (raises otherwise);
    non-image rows are ignored, unknown formats follow ``fake``.
    """
    imgs = media.where(F.col("kind") == "image")
    nb = blocks_x * blocks_y
    if nb > 63:
        raise ValueError("grid must fit in an int64 hash (<= 63 bits)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "ahash", "n_bits")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                fmt = sniff_format(raw)
                if fmt in ("ppm", "bmp"):
                    px = decode_image(raw).astype(np.int64)
                else:
                    # unknown format via the fake stream: stride-resample
                    # into one pixel per grid cell so the grid check holds
                    # for any blob (same trick as resize_images' fake path)
                    flat = _decode_stream(raw, "image", fake)
                    if flat.size == 0:
                        flat = np.zeros(1)
                    want = blocks_y * blocks_x * 3
                    idxs = np.minimum((np.arange(want) * flat.size) // want,
                                      flat.size - 1)
                    px = (flat[idxs].astype(np.int64)
                          .reshape(blocks_y, blocks_x, 3))
                h, w = px.shape[0], px.shape[1]
                if h % blocks_y or w % blocks_x:
                    raise ValueError(
                        f"image {h}x{w} not divisible by the "
                        f"{blocks_y}x{blocks_x} grid")
                by, bx = h // blocks_y, w // blocks_x
                sums = (px.reshape(blocks_y, by, blocks_x, bx, 3)
                        .sum(axis=(1, 3, 4)))
                total = int(px.sum())
                bits = (nb * sums > total)
                val = 0
                for r in range(blocks_y):
                    for c in range(blocks_x):
                        if bits[r, c]:
                            val |= 1 << (r * blocks_x + c)
                rows["media_id"].append(mid)
                rows["ahash"].append(val)
                rows["n_bits"].append(nb)
            yield pd.DataFrame(rows)

    return imgs.mapInPandas(run, schema=AHASH_SCHEMA)


AUDIO_FP_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("afp", LongType()),
    StructField("n_bits", IntegerType()),
])


def audio_fingerprint(media: DataFrame, n_samples: int = 64,
                      fake: bool = False) -> DataFrame:
    """(media_id, afp, n_bits): sign-of-delta acoustic fingerprint over
    REAL decoded PCM — the integer-exact audio analogue of
    :func:`image_ahash` (the spectral-delta bit rule of Chromaprint/
    Shazam-style fingerprints reduced to the time domain, which needs no
    FFT dependency): uniformly stride ``n_samples`` samples from the
    decoded stream and set bit ``i`` iff ``s[i+1] > s[i]`` — pure int16
    comparisons, so the fingerprint is bit-identical across engines and
    runs.  ``n_samples - 1`` bits must fit an int64.

    Identical fingerprints = same coarse waveform shape; Hamming
    neighbours via the pigeonhole block join, like the image and SimHash
    paths.  One ``mapInPandas`` decode (RIFF chunk walk) per payload.
    """
    if not (2 <= n_samples <= 64):
        raise ValueError(f"n_samples must be 2..64, got {n_samples}")
    auds = media.where(F.col("kind") == "audio")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "afp", "n_bits")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                if sniff_format(raw) == "wav":
                    samples, _rate = decode_wav(raw)
                    if samples.ndim > 1:
                        samples = samples[:, 0]
                    s = samples.astype(np.int64)
                else:
                    s = _decode_stream(raw, "audio", fake).astype(np.int64)
                if s.size < 2:
                    rows["media_id"].append(mid)
                    rows["afp"].append(0)
                    rows["n_bits"].append(0)
                    continue
                idx = np.minimum((np.arange(n_samples) * s.size)
                                 // n_samples, s.size - 1)
                sel = s[idx]
                bits = sel[1:] > sel[:-1]
                val = 0
                for i, b in enumerate(bits):
                    if b:
                        val |= 1 << i
                rows["media_id"].append(mid)
                rows["afp"].append(val)
                rows["n_bits"].append(int(bits.size))
            yield pd.DataFrame(rows)

    return auds.mapInPandas(run, schema=AUDIO_FP_SCHEMA)
