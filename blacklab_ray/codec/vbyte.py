"""Vectorized VByte (varint) + delta codec for posting lists.

Plays the role of BlackLab/Lucene's postings compression (reference:
engine/src/main/java/nl/inl/blacklab/codec/TokensCodec.java and the Lucene
postings format BlackLab40PostingsWriter delegates to,
engine/src/main/java/nl/inl/blacklab/codec/BlackLab40PostingsWriter.java:146).

Encoding: little-endian base-128 varints — each value is emitted as 7-bit
groups, low group first; every byte except the last of a value has the high
(0x80) continuation bit set. Doc ids are delta-coded (strictly ascending)
before varint packing, positions are delta-coded within each posting.

Everything is numpy-vectorized: encode is O(max_bytes_per_value) vector
passes (10 for uint64), decode likewise — no Python per-value loops.
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # ceil(64 / 7)


def vbyte_encode(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative ints as a varint byte stream."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bitlen/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    # bit length via repeated shift is fine (6 passes for 64-bit)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = tmp >= (np.uint64(1) << np.uint64(shift))
        nbits[mask] += shift
        tmp[mask] >>= np.uint64(shift)
    nbits += 1  # bitlen of 0 is treated as 1
    nbytes = (nbits + 6) // 7
    offsets = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.empty(offsets[-1], dtype=np.uint8)
    for k in range(_MAX_VARINT_BYTES):
        mask = nbytes > k
        if not mask.any():
            break
        idx = offsets[:-1][mask] + k
        chunk = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = nbytes[mask] > (k + 1)
        out[idx] = chunk.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out.tobytes()


def vbyte_decode(data: bytes | memoryview | np.ndarray) -> np.ndarray:
    """Decode a varint byte stream back to a uint64 array."""
    raw = np.frombuffer(data, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = raw < 0x80
    n_values = int(is_last.sum())
    if n_values == raw.size:
        # fast path: every value fits one byte (dense doc deltas, tfs —
        # the overwhelmingly common case in 128-posting blocks); skips
        # the starts/ends bookkeeping and the per-byte-position loop
        return raw.astype(np.uint64)
    # start offset of each value = 0, then 1 past each terminator
    starts = np.empty(n_values, dtype=np.int64)
    ends = np.flatnonzero(is_last)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    nbytes = ends - starts + 1
    out = np.zeros(n_values, dtype=np.uint64)
    for k in range(_MAX_VARINT_BYTES):
        mask = nbytes > k
        if not mask.any():
            break
        b = raw[starts[mask] + k].astype(np.uint64)
        out[mask] |= (b & np.uint64(0x7F)) << np.uint64(7 * k)
    return out


def delta_encode(sorted_values: np.ndarray) -> bytes:
    """Delta + varint encode an ascending int array (first value absolute)."""
    v = np.asarray(sorted_values, dtype=np.int64)
    if v.size == 0:
        return b""
    deltas = np.empty_like(v)
    deltas[0] = v[0]
    np.subtract(v[1:], v[:-1], out=deltas[1:])
    if deltas[1:].size and deltas[1:].min() < 0:
        raise ValueError("delta_encode requires ascending input")
    return vbyte_encode(deltas.astype(np.uint64))


def delta_decode(data: bytes | memoryview | np.ndarray) -> np.ndarray:
    """Inverse of :func:`delta_encode`; returns int64 ascending array."""
    deltas = vbyte_decode(data).astype(np.int64)
    if deltas.size == 0:
        return deltas
    return np.cumsum(deltas)


def encode_position_lists(positions: np.ndarray, counts: np.ndarray) -> bytes:
    """Pack concatenated per-posting position lists.

    ``positions`` is the concatenation of each posting's ascending token
    positions; ``counts`` gives the number of positions per posting (== tf).
    Layout: varint stream of, per posting, the delta-coded positions
    (first absolute). Counts are stored separately (the tf stream), so no
    length prefixes are needed here.
    """
    pos = np.asarray(positions, dtype=np.int64)
    cnt = np.asarray(counts, dtype=np.int64)
    if pos.size == 0:
        return b""
    deltas = np.empty_like(pos)
    np.subtract(pos[1:], pos[:-1], out=deltas[1:])
    deltas[0] = pos[0]
    # reset delta at the start of each posting's list to the absolute value
    starts = np.zeros(cnt.size, dtype=np.int64)
    np.cumsum(cnt[:-1], out=starts[1:])
    deltas[starts] = pos[starts]
    if deltas.min() < 0:
        raise ValueError("positions must be ascending within each posting")
    return vbyte_encode(deltas.astype(np.uint64))


def decode_position_lists(data: bytes | memoryview | np.ndarray,
                          counts: np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_position_lists`: concatenated abs positions."""
    deltas = vbyte_decode(data).astype(np.int64)
    cnt = np.asarray(counts, dtype=np.int64)
    if deltas.size == 0:
        return deltas
    # segmented cumsum: cumsum all, then subtract the running total at the
    # start of each segment (minus the segment's absolute first value).
    csum = np.cumsum(deltas)
    starts = np.zeros(cnt.size, dtype=np.int64)
    np.cumsum(cnt[:-1], out=starts[1:])
    base = csum[starts] - deltas[starts]  # cumsum just before each segment
    correction = np.repeat(base, cnt)
    return csum - correction
