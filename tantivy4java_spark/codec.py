"""Delta-gap + LEB128-varint codec for posting blocks, vectorized with numpy.

The reference's posting lists (tantivy's .idx component) store docIDs as
delta-gaps with bitpacked/VInt blocks of 128 plus skip data.  We reproduce the
*capability* — compressed docID/tf blocks with per-block skip metadata
(first/last doc, max tf, block-max BM25 score) — as rows of a Parquet
`postings` table; the codec below runs inside Arrow-batched UDFs only
(no per-row Python anywhere on the hot path).

Layout per posting block row (see build.py):
  docs_bin : varint(delta-gaps of sorted doc_ids, first gap vs first_doc base)
  tfs_bin  : varint(term frequencies)
  norms_bin: raw uint8 fieldnorm ids, one per posting (lets the scorer work
             without a norms join)
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # docs per block (Lucene/tantivy block width)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized; loops over byte-slots only)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    # bit_length via successive shifts is O(10) passes; use frexp-free approach
    nz = tmp > 0
    while nz.any():
        nbits[nz] += 1
        tmp[nz] >>= np.uint64(1)
        nz = tmp > 0
    nbytes = np.maximum((nbits + 6) // 7, 1)
    offsets = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.zeros(offsets[-1], dtype=np.uint8)
    rem = v.copy()
    pos = offsets[:-1].copy()
    left = nbytes.copy()
    active = left > 0
    while active.any():
        byte = (rem[active] & np.uint64(0x7F)).astype(np.uint8)
        cont = (left[active] > 1).astype(np.uint8) << 7
        out[pos[active]] = byte | cont
        rem[active] >>= np.uint64(7)
        pos[active] += 1
        left[active] -= 1
        active = left > 0
    return out.tobytes()


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes -> uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.nonzero(is_last)[0]
    starts = np.empty(ends.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    vals = np.zeros(ends.size, dtype=np.uint64)
    maxlen = int((ends - starts).max()) + 1
    for j in range(maxlen):
        idx = starts + j
        alive = idx <= ends
        vals[alive] |= (b[idx[alive]] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * j)
    if count is not None and vals.size != count:
        raise ValueError(f"varint_decode: expected {count} values, got {vals.size}")
    return vals


def encode_doc_block(doc_ids: np.ndarray, base: int | None = None) -> bytes:
    """Delta-gap encode a *sorted* docID block relative to its first doc."""
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    if d.size == 0:
        return b""
    gaps = np.empty(d.size, dtype=np.uint64)
    first = base if base is not None else int(d[0])
    gaps[0] = np.uint64(int(d[0]) - first)
    gaps[1:] = np.diff(d).astype(np.uint64)
    return varint_encode(gaps)


def decode_doc_block(buf: bytes, base: int, count: int | None = None) -> np.ndarray:
    """Decode delta-gap varints back to absolute docIDs."""
    gaps = varint_decode(buf, count)
    if gaps.size == 0:
        return np.zeros(0, dtype=np.int64)
    return (np.cumsum(gaps.astype(np.int64)) + base).astype(np.int64)


def encode_tf_block(tfs: np.ndarray) -> bytes:
    return varint_encode(np.ascontiguousarray(tfs, dtype=np.uint64))


def decode_tf_block(buf: bytes, count: int | None = None) -> np.ndarray:
    return varint_decode(buf, count).astype(np.int64)


def encode_positions(positions: np.ndarray) -> bytes:
    """Delta-encode a sorted positions array (within one doc)."""
    p = np.ascontiguousarray(positions, dtype=np.int64)
    if p.size == 0:
        return b""
    gaps = np.empty(p.size, dtype=np.uint64)
    gaps[0] = np.uint64(p[0])
    gaps[1:] = np.diff(p).astype(np.uint64)
    return varint_encode(gaps)


def decode_positions(buf: bytes) -> np.ndarray:
    gaps = varint_decode(buf)
    if gaps.size == 0:
        return np.zeros(0, dtype=np.int64)
    return np.cumsum(gaps.astype(np.int64))
