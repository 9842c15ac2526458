"""Tantivy-compatible fieldnorm (document length) quantization.

Tantivy compresses each document's per-field token count to a 1-byte
"fieldnorm id" through a 256-entry table and decodes it back before BM25
scoring.  The codec is Lucene's SmallFloat ``intToByte4``/``byte4ToInt``
scheme (public knowledge; tantivy's src/fieldnorm/code.rs documents it as
inspired by Lucene's SmallFloat): values 0..23 are exact, above that a
4-bit-mantissa floating point with truncation (round down).

Rank-identity (SURVEY.md §1.4) requires scoring with the *decoded quantized*
length, not the raw length — both the Spark pipeline and the independent
golden scorer (tests/golden.py) go through this module.
"""

from __future__ import annotations

import numpy as np

_NUM_FREE_VALUES = 24  # 255 - longToInt4(i64::MAX expressible) == 24 in Lucene SmallFloat byte4


def _byte4_to_int(b: int) -> int:
    """Decode one fieldnorm id (0..255) to a token count (Lucene byte4ToInt)."""
    if b < _NUM_FREE_VALUES:
        return b
    i = b - _NUM_FREE_VALUES
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        decoded = bits  # subnormal
    else:
        decoded = (bits | 0x08) << shift
    return _NUM_FREE_VALUES + decoded


#: 256-entry id -> token-count table (monotonically increasing).
FIELDNORM_TABLE: np.ndarray = np.array(
    [_byte4_to_int(b) for b in range(256)], dtype=np.int64
)
FIELDNORM_TABLE.setflags(write=False)


def fieldnorm_to_id(lengths) -> np.ndarray:
    """Quantize token counts to fieldnorm ids (vectorized).

    Picks the largest table entry <= length (truncation), exactly like
    Lucene's intToByte4 / tantivy's binary-search encode.
    """
    arr = np.asarray(lengths, dtype=np.int64)
    ids = np.searchsorted(FIELDNORM_TABLE, arr, side="right") - 1
    return np.clip(ids, 0, 255).astype(np.int64)


def id_to_fieldnorm(ids) -> np.ndarray:
    """Decode fieldnorm ids back to (quantized) token counts (vectorized)."""
    arr = np.asarray(ids, dtype=np.int64)
    return FIELDNORM_TABLE[arr]


def quantized_length(lengths) -> np.ndarray:
    """Round-trip: the quantized token count used for BM25 scoring."""
    return id_to_fieldnorm(fieldnorm_to_id(lengths))
