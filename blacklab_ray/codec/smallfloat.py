"""Lucene-style SmallFloat 1-byte norm quantization (4-bit mantissa).

BlackLab's BM25 scoring is delegated to Lucene 8, which stores each
document's field length as a single byte via SmallFloat (reference:
BlackLab indexes the token length per doc — engine/src/main/java/nl/inl/
blacklab/search/lucene/DocFieldLengthGetter.java:48 — and Lucene's
BM25Similarity quantizes it with SmallFloat.intToByte4). This module
reimplements that public algorithm from its description: a monotone,
lossy int -> byte mapping exact for small values, with a 4-bit mantissa
and 5-bit exponent above that. ``byte4_to_int(int_to_byte4(x))`` truncates
x to 4 significant bits — identical quantization buckets are what makes
engine scores rank-identical to a Lucene-backed oracle.
"""

from __future__ import annotations

import numpy as np


def _long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError("negative")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07  # drop the implicit leading 1 bit
    encoded |= (shift + 1) << 3
    return encoded


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = _long_to_int4(2**31 - 1)
_NUM_FREE_VALUES = 255 - _MAX_INT4  # ints below this encode exactly


def int_to_byte4(i: int) -> int:
    """Quantize a non-negative int to an unsigned byte (0..255), monotone."""
    if i < 0:
        raise ValueError("negative")
    if i < _NUM_FREE_VALUES:
        return i
    return _NUM_FREE_VALUES + _long_to_int4(i - _NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Inverse (lossy) of :func:`int_to_byte4`."""
    if b < _NUM_FREE_VALUES:
        return b
    return _NUM_FREE_VALUES + _int4_to_long(b - _NUM_FREE_VALUES)


# Precomputed decode table: norm byte -> quantized doc length.
DECODE_TABLE = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)


def encode_lengths(lengths: np.ndarray) -> np.ndarray:
    """Vectorized int_to_byte4 over an array of doc lengths -> uint8."""
    v = np.asarray(lengths, dtype=np.int64)
    # searchsorted over the monotone decode table: the encoded byte is the
    # largest b with DECODE_TABLE[b] <= v (table is strictly increasing).
    idx = np.searchsorted(DECODE_TABLE, v, side="right") - 1
    return idx.astype(np.uint8)


def decode_norms(norm_bytes: np.ndarray) -> np.ndarray:
    """Vectorized byte4_to_int -> int64 quantized lengths."""
    return DECODE_TABLE[np.asarray(norm_bytes, dtype=np.uint8)]
