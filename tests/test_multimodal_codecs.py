"""Real dependency-free media codecs (PPM/BMP/WAV/Y4M) and the real decode
paths through the Arrow-batched multimodal operators.

The brief asks for multimodal binary columns as first-class citizens; these
tests prove the decode step is genuinely format-aware (headers parsed, row
padding honored, chunk lists walked, frames seeked), not a byte-stream fake.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from lucene_plugin_spark.ops.multimodal import (decode_bmp, decode_image,
                                                decode_ppm, decode_wav,
                                                decode_y4m, encode_bmp,
                                                encode_ppm, encode_wav,
                                                encode_y4m, extract_features,
                                                resize_images, resize_rgb,
                                                sample_frames, sniff_format,
                                                synthetic_media)


def _px(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3),
                                                dtype=np.uint8)


def test_ppm_roundtrip():
    px = _px(5, 7)
    b = encode_ppm(px)
    assert sniff_format(b) == "ppm"
    assert np.array_equal(decode_ppm(b), px)


def test_ppm_header_comments_and_whitespace():
    px = _px(2, 3, seed=1)
    raster = px.tobytes()
    b = b"P6 # comment\n# another\n 3\t2\n255\n" + raster
    assert np.array_equal(decode_ppm(b), px)


def test_bmp_roundtrip_with_row_padding():
    # w=3 -> 9-byte rows padded to 12: the decode must strip padding and
    # un-reverse the bottom-up BGR row order
    px = _px(4, 3, seed=2)
    b = encode_bmp(px)
    assert sniff_format(b) == "bmp"
    assert np.array_equal(decode_bmp(b), px)
    # aligned width too
    px4 = _px(3, 4, seed=3)
    assert np.array_equal(decode_bmp(encode_bmp(px4)), px4)


def test_bmp_rejects_unsupported():
    b = bytearray(encode_bmp(_px(2, 2)))
    b[28] = 8  # bpp=8
    with pytest.raises(ValueError):
        decode_bmp(bytes(b))


def test_wav_roundtrip_and_chunk_walk():
    s = (np.sin(np.arange(800) * 0.02) * 20000).astype(np.int16)
    b = encode_wav(s, rate=8000)
    assert sniff_format(b) == "wav"
    out, rate = decode_wav(b)
    assert rate == 8000
    assert np.array_equal(out, s)
    # an extra LIST chunk between fmt and data must be skipped
    extra = b[:36] + b"LIST" + (7).to_bytes(4, "little") + b"INFOxyz" + b"\x00" \
        + b[36:]
    out2, _ = decode_wav(extra)
    assert np.array_equal(out2, s)


def test_y4m_roundtrip_and_seek():
    frames = np.random.default_rng(4).integers(0, 256, size=(4, 3, 5, 3),
                                               dtype=np.uint8)
    b = encode_y4m(frames, fps=2)
    assert sniff_format(b) == "y4m"
    out, fps = decode_y4m(b)
    assert fps == 2
    assert np.array_equal(out, frames)


def test_decode_image_dispatch():
    px = _px(3, 3, seed=5)
    assert np.array_equal(decode_image(encode_ppm(px)), px)
    assert np.array_equal(decode_image(encode_bmp(px)), px)
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\nfakepng")


def test_resize_rgb_nearest_neighbor():
    px = _px(8, 8, seed=6)
    small = resize_rgb(px, 4, 2)
    assert small.shape == (2, 4, 3)
    assert np.array_equal(small[0, 0], px[0, 0])
    assert np.array_equal(small[1, 3], px[4, 6])


def test_real_pipeline_features(spark):
    media = synthetic_media(spark, n=12, real=True)
    # fake=False: every synthetic payload must decode through a REAL codec
    feats = {r["media_id"]: r for r in
             extract_features(media, fake=False).collect()}
    assert len(feats) == 12
    rows = {r["media_id"]: (r["kind"], bytes(r["payload"]))
            for r in media.collect()}
    for mid, (kind, payload) in rows.items():
        f = feats[mid]
        assert f["n_bytes"] == len(payload)
        if kind == "image":
            px = decode_image(payload)
            assert f["feat_dim"] == px.size
            assert abs(f["mean_byte"] - float(px.mean())) < 1e-9
        elif kind == "audio":
            s, _ = decode_wav(payload)
            assert f["feat_dim"] == s.size
            assert abs(f["mean_byte"] - float(s.astype(np.float64).mean())) < 1e-9
        else:
            fr, _ = decode_y4m(payload)
            assert f["feat_dim"] == fr.size


def test_real_pipeline_resize_reencodes_container(spark):
    media = synthetic_media(spark, n=12, real=True)
    resized = resize_images(media, width=16, height=12, fake=False).collect()
    assert len(resized) == 4  # kinds cycle image/audio/video
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in resized:
        out = bytes(r["payload"])
        in_fmt = sniff_format(src[r["media_id"]])
        assert sniff_format(out) == in_fmt  # same container back
        got = decode_image(out)
        assert got.shape == (12, 16, 3)
        expect = resize_rgb(decode_image(src[r["media_id"]]), 16, 12)
        assert np.array_equal(got, expect)


def test_real_pipeline_frame_sampling_seeks_y4m(spark):
    media = synthetic_media(spark, n=12, real=True)
    frames = sample_frames(media, every_ms=1000, fake=False).collect()
    vids = {r["media_id"]: bytes(r["payload"])
            for r in media.where("kind = 'video'").collect()}
    assert {r["media_id"] for r in frames} == set(vids)
    by_key = {(r["media_id"], r["frame_ts_ms"]): r["frame_sha256"]
              for r in frames}
    for mid, payload in vids.items():
        decoded, fps = decode_y4m(payload)
        for ts in (0, 1000, 2000, 3000, 4000, 5000):
            fi = min(ts * fps // 1000, len(decoded) - 1)
            planar = np.ascontiguousarray(
                decoded[fi].transpose(2, 0, 1)).tobytes()
            assert by_key[(mid, ts)] == hashlib.sha256(planar).hexdigest()


def test_image_ahash_integer_exact(spark):
    from lucene_plugin_spark.ops.multimodal import encode_bmp, image_ahash

    def py_ahash(px, by=4, bx=8):
        p = px.astype(np.int64)
        h, w = p.shape[0], p.shape[1]
        sums = p.reshape(by, h // by, bx, w // bx, 3).sum(axis=(1, 3, 4))
        total = int(p.sum())
        val = 0
        for r in range(by):
            for c in range(bx):
                if by * bx * sums[r, c] > total:
                    val |= 1 << (r * bx + c)
        return val

    imgs = [_px(8, 16, seed=s) for s in range(6)]
    imgs.append(imgs[0].copy())               # exact perceptual duplicate
    flat = np.full((8, 16, 3), 77, dtype=np.uint8)
    imgs.append(flat)                         # uniform: every bit off (>)
    rows = [(i, "image", "image/x-ms-bmp", bytearray(encode_ppm(px)
             if i % 2 else encode_bmp(px)), 16, 8, None)
            for i, px in enumerate(imgs)]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, mime string, payload binary, "
              "meta_width int, meta_height int, meta_duration_ms int")
    got = {r["media_id"]: (r["ahash"], r["n_bits"])
           for r in image_ahash(media).collect()}
    for i, px in enumerate(imgs):
        assert got[i] == (py_ahash(px), 32), i
    assert got[0][0] == got[6][0]             # duplicate detected
    assert got[7][0] == 0                     # strict > on the uniform image
    # indivisible grid raises
    bad = spark.createDataFrame(
        [(0, "image", "m", bytearray(encode_ppm(_px(5, 7))), 7, 5, None)],
        "media_id long, kind string, mime string, payload binary, "
        "meta_width int, meta_height int, meta_duration_ms int")
    with pytest.raises(Exception):
        image_ahash(bad).collect()
    # unknown-format blobs follow the fake stream (stride-resampled into
    # the grid) instead of failing the job
    blob = spark.createDataFrame(
        [(0, "image", "application/octet-stream", bytearray(b"opaque" * 40),
          None, None, None)],
        "media_id long, kind string, mime string, payload binary, "
        "meta_width int, meta_height int, meta_duration_ms int")
    r = image_ahash(blob, fake=True).collect()
    assert len(r) == 1 and r[0]["n_bits"] == 32


def test_audio_fingerprint_integer_exact(spark):
    from lucene_plugin_spark.ops.multimodal import (audio_fingerprint,
                                                    encode_wav)
    rng = np.random.default_rng(5)
    streams = [rng.integers(-3000, 3000, size=n).astype(np.int16)
               for n in (64, 200, 64, 2)]
    streams.append(streams[0].copy())         # duplicate waveform
    rows = [(i, "audio", "audio/wav", bytearray(encode_wav(s)), None, None,
             None) for i, s in enumerate(streams)]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, mime string, payload binary, "
              "meta_width int, meta_height int, meta_duration_ms int")
    got = {r["media_id"]: (r["afp"], r["n_bits"])
           for r in audio_fingerprint(media, n_samples=64).collect()}

    def py_fp(s, n=64):
        s = s.astype(np.int64)
        idx = np.minimum((np.arange(n) * s.size) // n, s.size - 1)
        sel = s[idx]
        val = 0
        for i, b in enumerate(sel[1:] > sel[:-1]):
            if b:
                val |= 1 << i
        return val

    for i, s in enumerate(streams):
        assert got[i] == (py_fp(s), 63), i
    assert got[0][0] == got[4][0]             # duplicate detected
    import pytest as _pytest
    with _pytest.raises(ValueError):
        audio_fingerprint(media, n_samples=65)
