"""Delta + varint (LEB128) posting-block codec, numpy-vectorized.

The analogue of Lucene's postings compression (docID delta gaps + variable
byte / FOR packing in the default codec — config untouched by the reference
plugin, SURVEY.md §4 P12).  Required explicitly by the north rule:
"delta-encoded docID gaps and varint compression".

No Python byte loops: encode loops over at most 10 7-bit *groups* (vectorized
inner ops), decode is pure numpy segment math over the byte array.
"""

from __future__ import annotations

import numpy as np

_MASK7 = np.uint64(0x7F)
_CONT = np.uint8(0x80)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int array -> bytes."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value (>=1)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    nz = tmp > 0
    while nz.any():
        nbits[nz] += 1
        tmp >>= np.uint64(7)
        nz = tmp > 0
    ngroups = np.maximum(nbits, 1)
    total = int(ngroups.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(ngroups)
    starts = ends - ngroups
    tmp = v.copy()
    offs = starts.copy()
    remaining = ngroups.copy()
    # at most ceil(64/7)=10 iterations; each fully vectorized
    while (remaining > 0).any():
        m = remaining > 0
        byte = (tmp[m] & _MASK7).astype(np.uint8)
        last = remaining[m] == 1
        byte[~last] |= _CONT
        out[offs[m]] = byte
        tmp[m] >>= np.uint64(7)
        offs[m] += 1
        remaining[m] -= 1
    return out.tobytes()


def varint_encode_with_offsets(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode an int array -> (byte array uint8, per-value byte offsets).

    ``offsets`` has len(values)+1 entries; value i occupies bytes
    ``[offsets[i], offsets[i+1])``.  Lets a caller encode one concatenated
    stream and slice out contiguous sub-ranges (posting blocks) without
    re-encoding per block.
    """
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, np.uint8), np.zeros(1, np.int64)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    nz = tmp > 0
    while nz.any():
        nbits[nz] += 1
        tmp >>= np.uint64(7)
        nz = tmp > 0
    ngroups = np.maximum(nbits, 1)
    offsets = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(ngroups, out=offsets[1:])
    out = np.empty(int(offsets[-1]), dtype=np.uint8)
    tmp = v.copy()
    offs = offsets[:-1].copy()
    remaining = ngroups.copy()
    while (remaining > 0).any():
        m = remaining > 0
        byte = (tmp[m] & _MASK7).astype(np.uint8)
        last = remaining[m] == 1
        byte[~last] |= _CONT
        out[offs[m]] = byte
        tmp[m] >>= np.uint64(7)
        offs[m] += 1
        remaining[m] -= 1
    return out, offsets


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes -> uint64 array (inverse of varint_encode).

    Byte-slot accumulation: pass k gathers the k-th byte of every value
    still active (most values are 1-2 bytes, so 1-2 tight fancy-indexing
    passes over shrinking index arrays — ~10x faster than the scatter-based
    ``np.add.at`` formulation on multi-million-position phrase decodes)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & _CONT) == 0
    starts_mask = np.ones(b.size, dtype=bool)
    starts_mask[1:] = is_last[:-1]
    start_idx = np.flatnonzero(starts_mask)
    n_values = start_idx.size
    lengths = np.diff(np.append(start_idx, b.size))
    payload = b & np.uint8(0x7F)
    out = np.zeros(n_values, dtype=np.uint64)
    active = np.arange(n_values, dtype=np.int64)
    k = 0
    while active.size:
        idx = start_idx[active] + k
        out[active] |= payload[idx].astype(np.uint64) << np.uint64(7 * k)
        k += 1
        active = active[lengths[active] > k]
    return out


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing id array -> gap array (first gap = first id)."""
    a = np.asarray(sorted_ids, dtype=np.int64)
    out = np.empty_like(a)
    if a.size:
        out[0] = a[0]
        np.subtract(a[1:], a[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.int64))


def encode_ids(sorted_ids: np.ndarray) -> bytes:
    return varint_encode(delta_encode(sorted_ids))


def decode_ids(buf: bytes) -> np.ndarray:
    return delta_decode(varint_decode(buf).astype(np.int64))


def encode_positions(positions_concat: np.ndarray, lengths: np.ndarray) -> bytes:
    """Encode per-doc position lists.

    ``positions_concat`` is all docs' sorted position lists concatenated;
    ``lengths`` is the per-doc list length (= tf).  Within each doc the
    positions are delta-encoded (first value absolute) — same trick Lucene's
    ``.pos`` file uses.  Lengths are NOT stored here; the tf stream provides
    them at decode time.
    """
    p = np.asarray(positions_concat, dtype=np.int64)
    if p.size == 0:
        return b""
    ends = np.cumsum(np.asarray(lengths, dtype=np.int64))
    starts = ends - lengths
    gaps = np.empty_like(p)
    gaps[0] = p[0]
    np.subtract(p[1:], p[:-1], out=gaps[1:])
    gaps[starts] = p[starts]  # reset delta at each doc boundary
    return varint_encode(gaps)


def decode_positions(buf: bytes, lengths: np.ndarray) -> np.ndarray:
    """Inverse of encode_positions -> flat absolute positions array."""
    gaps = varint_decode(buf).astype(np.int64)
    if gaps.size == 0:
        return gaps
    ends = np.cumsum(np.asarray(lengths, dtype=np.int64))
    starts = ends - lengths
    acc = np.cumsum(gaps)
    # subtract the running total at each doc start to re-zero the cumsum
    base = np.zeros_like(gaps)
    base[starts[1:]] = acc[starts[1:] - 1]
    return acc - np.maximum.accumulate(base)


def decode_ids_concat(bufs, counts) -> "np.ndarray":
    """Decode MANY encode_ids blocks in one vectorized pass.

    ``bufs``: iterable of per-block byte strings (delta+varint docID gaps,
    first value absolute); ``counts``: docIDs per block.  One varint_decode
    over the concatenated stream, then cumsum with per-block resets — no
    per-block Python round trips.
    """
    counts = np.asarray(counts, dtype=np.int64)
    gaps = varint_decode(b"".join(bufs)).astype(np.int64)
    if gaps.size == 0:
        return gaps
    offsets = np.zeros(counts.size + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    acc = np.cumsum(gaps)
    base = np.zeros_like(gaps)
    starts = offsets[:-1]
    base[starts[1:]] = acc[starts[1:] - 1]
    return acc - np.maximum.accumulate(base)
