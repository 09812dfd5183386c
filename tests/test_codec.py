"""Codec roundtrip tests (FIXTURES.md section 4, property-based)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from horus_ner_ray.state import codec


def test_empty():
    assert codec.varint_encode(np.zeros(0, dtype=np.uint64)) == b""
    assert len(codec.varint_decode(b"")) == 0
    assert len(codec.decode_doc_ids(b"", 0)) == 0


def test_known_values():
    v = np.array([0, 1, 127, 128, 300, 2**32, 2**63], dtype=np.uint64)
    assert (codec.varint_decode(codec.varint_encode(v)) == v).all()


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=500),
    st.integers(min_value=0, max_value=1000),
)
def test_docid_roundtrip(ids, base_gap):
    ids = np.array(sorted(set(ids)), dtype=np.int64)
    base = int(ids[0]) - base_gap
    blob = codec.encode_doc_ids(ids, base)
    assert (codec.decode_doc_ids(blob, base) == ids).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=100000), min_size=0, max_size=500))
def test_tf_roundtrip(tfs):
    tfs = np.array(tfs, dtype=np.int64)
    assert (codec.decode_tfs(codec.encode_tfs(tfs)) == tfs).all()


def test_compression_wins_on_dense_ids():
    ids = np.arange(100000, dtype=np.int64) * 3 + 7
    blob = codec.encode_doc_ids(ids, 0)
    assert len(blob) < len(ids) * 2  # gaps of 3 -> ~1 byte each vs 8 raw
