"""Codec round-trips — exhaustive-edge style like the reference's codec
tests (`test/chearch_test.chpl:6-45`)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from chearch_spark.operators import codec

EDGES = [0, 1, 127, 128, 255, 256, 16383, 16384, 2**24 - 1, 2**24,
         2**32 - 1, 2**32, 2**56, 2**63, 2**64 - 1]


def test_varint_edges():
    arr = np.array(EDGES, dtype=np.uint64)
    assert (codec.decode_varints(codec.encode_varints(arr)) == arr).all()


def test_varint_empty():
    assert codec.encode_varints(np.empty(0, np.uint64)) == b""
    assert len(codec.decode_varints(b"")) == 0


def test_varint_lengths_split():
    arr = np.array([0, 300, 5, 2**40], dtype=np.uint64)
    buf, lens = codec.encode_varints_with_lengths(arr)
    assert lens.tolist() == [1, 2, 1, 6]
    assert len(buf) == int(lens.sum())
    # splitting at value boundaries decodes piecewise
    off = 0
    for v, ln in zip(arr, lens):
        piece = buf[off: off + ln]
        assert codec.decode_varints(piece)[0] == v
        off += ln


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_varint_property(xs):
    arr = np.array(xs, dtype=np.uint64)
    assert (codec.decode_varints(codec.encode_varints(arr)) == arr).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**48), max_size=300))
def test_postings_roundtrip(xs):
    arr = np.sort(np.unique(np.array(xs, dtype=np.uint64)))
    assert (codec.decode_postings(codec.encode_postings(arr)) == arr).all()


def test_postings_large_random():
    rng = np.random.default_rng(7)
    d = np.sort(
        rng.choice(2**40, size=100_000, replace=False).astype(np.uint64)
    )
    assert (codec.decode_postings(codec.encode_postings(d)) == d).all()
