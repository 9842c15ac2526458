import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tantivy4java_spark import codec


def test_varint_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 300, 2**20, 2**40, 2**63], dtype=np.uint64)
    buf = codec.varint_encode(vals)
    out = codec.varint_decode(buf, len(vals))
    assert (out == vals).all()


def test_varint_empty():
    assert codec.varint_encode(np.array([], dtype=np.uint64)) == b""
    assert codec.varint_decode(b"").size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (codec.varint_decode(codec.varint_encode(arr), len(vals)) == arr).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=256, unique=True))
def test_doc_block_roundtrip(docs):
    arr = np.sort(np.array(docs, dtype=np.int64))
    buf = codec.encode_doc_block(arr, base=int(arr[0]))
    out = codec.decode_doc_block(buf, int(arr[0]), len(arr))
    assert (out == arr).all()


def test_positions_roundtrip():
    pos = np.array([0, 3, 3, 7, 100], dtype=np.int64)  # non-strict sort ok
    assert (codec.decode_positions(codec.encode_positions(pos)) == pos).all()


def test_compression_is_compact():
    docs = np.arange(0, 128, dtype=np.int64) + 10_000_000
    buf = codec.encode_doc_block(docs, base=int(docs[0]))
    assert len(buf) <= 128 + 2  # gap=1 each -> ~1 byte per doc
