"""Codec round-trip tests (mirrors the reference's format round-trip suites,
tests/formats/formats_test_case_base.cpp)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from iresearch_spark.index.codec import (
    delta_decode,
    delta_encode,
    pack_doc_block,
    pack_positions,
    unpack_doc_block,
    unpack_positions,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_simple():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**31, 2**63 - 1], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_varint_single_byte_density():
    # values < 128 encode to exactly 1 byte (vint tail parity,
    # reference formats_10.cpp:689-704)
    vals = np.arange(128, dtype=np.uint64)
    assert len(varint_encode(vals)) == 128


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=1, max_value=2**40), min_size=1, max_size=256))
def test_doc_block_roundtrip(docset):
    docs = np.array(sorted(docset), dtype=np.uint64)
    tfs = (docs % 7 + 1).astype(np.uint64)
    db, tb = pack_doc_block(docs, tfs)
    d2, t2 = unpack_doc_block(db, tb)
    assert np.array_equal(d2, docs)
    assert np.array_equal(t2, tfs)


def test_delta_roundtrip():
    a = np.array([5, 9, 12, 100, 101], dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(a)), a)


def test_positions_roundtrip():
    per_doc = [np.array([0, 3, 9], np.uint64), np.array([5], np.uint64), np.array([1, 2], np.uint64)]
    tfs = np.array([3, 1, 2], np.uint64)
    blob = pack_positions(per_doc)
    out = unpack_positions(blob, tfs)
    for a, b in zip(per_doc, out):
        assert np.array_equal(a, b)
