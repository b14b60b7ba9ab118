"""Posting codec property tests (SURVEY.md §5.3: encode∘decode = id)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_plugin_spark.index import codec


@given(st.lists(st.integers(min_value=0, max_value=2**62 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(codec.varint_decode(codec.varint_encode(arr)), arr)


@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=300))
@settings(max_examples=200, deadline=None)
def test_docid_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    assert np.array_equal(codec.decode_ids(codec.encode_ids(arr)), arr)


@given(st.lists(st.lists(st.integers(min_value=0, max_value=10**6),
                         min_size=1, max_size=50), max_size=40))
@settings(max_examples=100, deadline=None)
def test_positions_roundtrip(pos_lists):
    pos_lists = [sorted(set(p)) or [0] for p in pos_lists]
    lens = np.array([len(p) for p in pos_lists], dtype=np.int64)
    flat = np.array([x for p in pos_lists for x in p], dtype=np.int64)
    enc = codec.encode_positions(flat, lens)
    assert np.array_equal(codec.decode_positions(enc, lens), flat)


def test_empty():
    assert codec.varint_encode(np.array([], dtype=np.uint64)) == b""
    assert codec.varint_decode(b"").size == 0
    assert codec.decode_positions(b"", np.array([], dtype=np.int64)).size == 0


def test_compression_is_compact():
    # dense gaps must stay ~1 byte per posting
    ids = np.arange(0, 100_000, 3, dtype=np.int64)
    enc = codec.encode_ids(ids)
    assert len(enc) < ids.size * 1.2
