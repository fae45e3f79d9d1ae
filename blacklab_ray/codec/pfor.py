"""Patched Frame-of-Reference (NewPFD-style) posting-block codec.

The second implementation behind the posting-block codec slot
(BASELINE north_star: "docID-delta + VByte/PForDelta-compressed
blocks"; the reference's analogous slot is the Lucene postings format
BlackLab40PostingsWriter delegates to,
engine/src/main/java/nl/inl/blacklab/codec/BlackLab40PostingsWriter.java:146
— Lucene's own ForUtil bit-packs 128-posting blocks the same way).

Per-block layout (block length ``n`` comes from segment metadata, so
blocks are NOT self-delimiting — spans decode via the per-block byte
offsets the reader already holds):

    byte 0          bit width  b   (0..32)
    byte 1          n_exceptions e (0..n, n <= 256)
    ceil(n*b/8)     packed low b bits of every value, little-endian
                    bit order (value i occupies bits [i*b, (i+1)*b))
    e bytes         exception positions within the block (uint8)
    e varints       exception high parts (value >> b), LEB128

``b`` is chosen per block to minimize exact encoded bytes:
``2 + ceil(n*b/8) + sum(1 + varint_len(v >> b) for exceptions)``.
Values whose bit length exceeds ``b`` keep their low ``b`` bits in the
packed area and patch the rest back from the exception list — this is
what absorbs the one large absolute first-doc delta per block without
widening the whole block.

Everything is numpy-vectorized; the only Python loops are over
distinct (n, b) shape groups (a handful per segment) and bit indices
(<= 32).
"""

from __future__ import annotations

import numpy as np

from blacklab_ray.codec.vbyte import vbyte_decode, vbyte_encode

MAX_WIDTH = 32
MAX_BLOCK = 255          # exception positions AND counts are uint8

# per-process growable arange cache: encode runs in shuffle workers
# where 32 concurrent processes allocating fresh index vectors per call
# turned np.arange/np.repeat into the contended hot spot
_ARANGE = np.empty(0, dtype=np.int64)
_COST_MATS: dict = {}


def _arange(n: int) -> np.ndarray:
    global _ARANGE
    if _ARANGE.size < n:
        _ARANGE = np.arange(max(n, 2 * _ARANGE.size), dtype=np.int64)
    return _ARANGE[:n]


def _cost_matrix(cap: int) -> np.ndarray:
    """(NW x cap+1) float32 per-value exception cost, cached per cap."""
    m = _COST_MATS.get(cap)
    if m is None:
        NW = 65
        wp = np.arange(NW)[:, None]
        bc = np.arange(cap + 1)[None, :]
        m = np.where(
            wp > bc, 1 + (np.maximum(wp - bc, 1) + 6) // 7,
            0).astype(np.float32)
        _COST_MATS[cap] = m
    return m


def _bit_widths(v: np.ndarray) -> np.ndarray:
    """Bits needed to represent each value; width(0) == 0."""
    w = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = tmp >= (np.uint64(1) << np.uint64(shift))
        w[mask] += shift
        tmp[mask] >>= np.uint64(shift)
    w[v > 0] += 1
    return w


def encode_blocks(values: np.ndarray, blk_lo: np.ndarray,
                  blk_hi: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode ``values[blk_lo[i]:blk_hi[i]]`` per block.

    Returns ``(stream, offsets)``: the concatenated per-block blobs and
    the ``n_blocks+1`` byte offsets into it.

    Fully vectorized with NO per-shape Python loops (real segments mix
    many short rare-term blocks with full 128s, so anything iterating
    distinct block lengths degenerates):

    - width choice: per-block width HISTOGRAM (one bincount) @ a
      (width x candidate) byte-cost matrix -> exact argmin over all
      widths 0..cap in one small matmul;
    - packing: every value's bits scatter into one global little-endian
      bit array at block-aligned bit offsets, packbits once, byte
      scatter into the output.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    blk_lo = np.asarray(blk_lo, dtype=np.int64)
    blk_hi = np.asarray(blk_hi, dtype=np.int64)
    nb = blk_lo.size
    if nb == 0:
        return b"", np.zeros(1, dtype=np.int64)
    ns = blk_hi - blk_lo
    if ns.max() > MAX_BLOCK:
        raise ValueError("pfor blocks hold at most %d values" % MAX_BLOCK)
    nv = v.size
    w = _bit_widths(v)
    cap = min(MAX_WIDTH, int(w.max()) if w.size else 0)
    val_block = np.repeat(_arange(nb), ns)

    # ---- exact cost of every width 0..cap via histogram @ matrix ----
    # hist[B, w'] = how many values of block B have bit width w'
    NW = 65
    hist = np.bincount(val_block * NW + w,
                       minlength=nb * NW).reshape(nb, NW)         if nv else np.zeros((nb, NW), np.int64)
    # cost contribution of a width-w' value under candidate b:
    # 0 if w' <= b else 1 (position byte) + ceil(max(w'-b,1)/7)
    wp = np.arange(NW)[:, None]                  # w'
    bc = np.arange(cap + 1)[None, :]             # candidate b
    exc_cost = np.where(
        wp > bc, 1 + (np.maximum(wp - bc, 1) + 6) // 7, 0)
    # float32 sgemm (BLAS) instead of numpy's int64 loop: EXACT here
    # (counts <= 255, weights <= 11, sums << 2^24) and an order of
    # magnitude less memory traffic — the int64 matmul was the
    # contended-worker hot spot (32 concurrent reduces thrash LLC)
    costs = hist.astype(np.float32) @ exc_cost.astype(np.float32)
    costs += 2.0 + ((ns[:, None] * bc + 7) // 8).astype(np.float32)
    b_blk = np.argmin(costs, axis=1).astype(np.int64)
    b_val = b_blk[val_block]

    # ---- exceptions (global order == block order) -------------------
    exc_mask = w > b_val
    exc_idx_g = np.flatnonzero(exc_mask)
    e_blk = np.bincount(val_block[exc_idx_g], minlength=nb)         .astype(np.int64)
    blk_of_exc = val_block[exc_idx_g]
    exc_local = (exc_idx_g - blk_lo[blk_of_exc]).astype(np.uint8)
    exc_high = v[exc_idx_g] >> b_val[exc_idx_g].astype(np.uint64)
    high_stream = vbyte_encode(exc_high)
    from blacklab_ray.stages.tokenize import _varint_byte_lens
    high_lens = _varint_byte_lens(exc_high.astype(np.int64))         if exc_high.size else np.empty(0, np.int64)
    exc_starts = np.zeros(nb, dtype=np.int64)
    np.cumsum(e_blk[:-1], out=exc_starts[1:])
    cum_high = np.zeros(exc_high.size + 1, dtype=np.int64)
    np.cumsum(high_lens, out=cum_high[1:])
    high_blk = cum_high[exc_starts + e_blk] - cum_high[exc_starts]
    high_off = cum_high

    # ---- layout ------------------------------------------------------
    plen = (ns * b_blk + 7) // 8
    blk_len = 2 + plen + e_blk + high_blk
    offsets = np.zeros(nb + 1, dtype=np.int64)
    np.cumsum(blk_len, out=offsets[1:])
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    out[offsets[:-1]] = b_blk.astype(np.uint8)
    out[offsets[:-1] + 1] = e_blk.astype(np.uint8)

    # ---- packed payloads: one global bit scatter --------------------
    total_plen = int(plen.sum())
    if total_plen:
        pay_base_bits = np.zeros(nb, dtype=np.int64)
        np.cumsum(plen[:-1] * 8, out=pay_base_bits[1:])
        local_idx = _arange(nv) - blk_lo[val_block]
        val_bit_start = pay_base_bits[val_block] + local_idx * b_val
        bit_cum = np.zeros(nv + 1, dtype=np.int64)
        np.cumsum(b_val, out=bit_cum[1:])
        tot_bits = int(bit_cum[-1])
        if tot_bits:
            vi = np.repeat(_arange(nv), b_val)
            k = _arange(tot_bits) - np.repeat(bit_cum[:-1], b_val)
            bitvals = ((v[vi] >> k.astype(np.uint64))
                       & np.uint64(1)).astype(np.uint8)
            bitarr = np.zeros(total_plen * 8, dtype=np.uint8)
            bitarr[val_bit_start[vi] + k] = bitvals
            payload = np.packbits(bitarr, bitorder="little")
            byte_block = np.repeat(_arange(nb), plen)
            pay_byte_base = np.zeros(nb, dtype=np.int64)
            np.cumsum(plen[:-1], out=pay_byte_base[1:])
            dst = (offsets[:-1][byte_block] + 2
                   + _arange(total_plen) - pay_byte_base[byte_block])
            out[dst] = payload

    # ---- exception positions + high varints -------------------------
    if exc_idx_g.size:
        dst_idx = (offsets[:-1][blk_of_exc] + 2 + plen[blk_of_exc]
                   + (_arange(exc_idx_g.size) - exc_starts[blk_of_exc]))
        out[dst_idx] = exc_local
        hs = np.frombuffer(high_stream, dtype=np.uint8)
        hi_base = (offsets[:-1] + 2 + plen + e_blk)[blk_of_exc]
        src_rep = np.repeat(_arange(exc_idx_g.size), high_lens)
        # offset of each exception's varint within its block's high area
        within = high_off[:-1] - high_off[exc_starts][blk_of_exc]
        dst_hi = hi_base[src_rep] + within[src_rep] + (
            _arange(hs.size) - np.repeat(high_off[:-1], high_lens))
        out[dst_hi] = hs
    return out.tobytes(), offsets


def decode_span(blob, offsets: np.ndarray, ns: np.ndarray) -> np.ndarray:
    """Decode concatenated blocks; ``offsets`` are the ``n_blocks+1``
    byte offsets within ``blob``, ``ns`` the per-block value counts.
    Returns the uint64 values in order."""
    raw = np.frombuffer(blob, dtype=np.uint8)
    offsets = np.asarray(offsets, dtype=np.int64)
    ns = np.asarray(ns, dtype=np.int64)
    nb = ns.size
    total = int(ns.sum())
    out = np.zeros(total, dtype=np.uint64)
    if total == 0:
        return out
    starts = offsets[:-1]
    b_blk = raw[starts].astype(np.int64)
    e_blk = raw[starts + 1].astype(np.int64)
    plen = (ns * b_blk + 7) // 8
    val_start = np.zeros(nb, dtype=np.int64)
    np.cumsum(ns[:-1], out=val_start[1:])

    shape_key = ns * (MAX_WIDTH + 1) + b_blk
    for key in np.unique(shape_key):
        n, b = divmod(int(key), MAX_WIDTH + 1)
        if n == 0 or b == 0:
            continue
        g = np.flatnonzero(shape_key == key)
        pl = (n * b + 7) // 8
        payload = raw[(starts[g] + 2)[:, None] + np.arange(pl)]
        bits = np.unpackbits(payload, axis=1, bitorder="little")[:, :n * b]
        bits = bits.reshape(g.size, n, b)
        vals = np.zeros((g.size, n), dtype=np.uint64)
        for k in range(b):
            vals |= bits[:, :, k].astype(np.uint64) << np.uint64(k)
        out[val_start[g][:, None] + np.arange(n)] = vals

    if e_blk.sum():
        eb = np.flatnonzero(e_blk)
        blk_rep = np.repeat(eb, e_blk[eb])
        idx_pos = (starts[eb] + 2 + plen[eb])
        local = raw[np.repeat(idx_pos, e_blk[eb])
                    + (np.arange(blk_rep.size)
                       - np.repeat(np.cumsum(e_blk[eb]) - e_blk[eb],
                                   e_blk[eb]))].astype(np.int64)
        # high varints: gather every block's high area, decode in one pass
        hi_lo = starts[eb] + 2 + plen[eb] + e_blk[eb]
        hi_hi = offsets[1:][eb]
        lens = hi_hi - hi_lo
        cat_off = np.zeros(eb.size + 1, dtype=np.int64)
        np.cumsum(lens, out=cat_off[1:])
        gi = np.repeat(np.arange(eb.size), lens)
        src = hi_lo[gi] + np.arange(int(cat_off[-1])) - cat_off[gi]
        high = vbyte_decode(raw[src]).astype(np.uint64)
        out[val_start[blk_rep] + local] |= \
            high << b_blk[blk_rep].astype(np.uint64)
    return out
