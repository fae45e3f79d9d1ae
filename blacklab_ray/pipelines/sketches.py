"""Mergeable sketches: HyperLogLog distinct-count and Count-Min
frequency estimation.

Neither exists in the reference (Lucene counts exactly); both are
what a 100-TB corpus pipeline actually uses for vocabulary size /
heavy-hitter questions where the exact groupby is an all-to-all
shuffle of every token. Both sketches here are DETERMINISTIC —
value hash = md5 low 8 bytes little-endian (== DuckDB
``md5_number_lower``, pipelines/dedup.py:_md5_low64) — so the driver
oracle replicates the register/counter tables bit-exactly; the
approximate-vs-exact error bounds are asserted in
tests/test_sketches.py.

Scale shape (the whole point of a sketch):
- HLL: each block folds to at most ``2^b`` (bucket, max_rank) partial
  rows inside ``map_batches`` (the combiner), then ONE tiny
  ``groupby(bucket).max`` merges partials — no token ever shuffles.
- Count-Min: each block folds to at most ``d*w`` (row, bucket, count)
  partials, merged by ONE ``groupby.sum``. Estimates are one-sided
  (never under the true count).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import _md5_low64


def _hash_values(vals: list[str], memo: dict | None = None
                 ) -> np.ndarray:
    if memo is None:
        from blacklab_ray.util import md5_low64_batch
        return md5_low64_batch(vals)
    if len(memo) > 1_000_000:       # bound per-actor memo growth
        memo.clear()
    out = np.empty(len(vals), np.uint64)
    for i, v in enumerate(vals):
        h = memo.get(v)
        if h is None:
            h = _md5_low64(v)
            memo[v] = h
        out[i] = h
    return out


def _tokens_of(batch: pa.Table, col: str) -> list[str]:
    """Whitespace tokens, empty strings dropped — byte-identical to
    DuckDB ``unnest(string_split(col, ' ')) ... WHERE t <> ''``."""
    toks = pc.split_pattern(batch.column(col), " ")
    flat = toks.combine_chunks().flatten() if isinstance(
        toks, pa.ChunkedArray) else toks.flatten()
    flat = flat.filter(pc.not_equal(flat, ""))
    return flat.to_pylist()


# ---- HyperLogLog -----------------------------------------------------------

def _hll_partial(h: np.ndarray, b: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, max_rank) partial registers of one block's hashes."""
    if not 1 <= b <= 32:
        raise ValueError("b must be in [1, 32]")
    m = 1 << b
    bucket = (h % m).astype(np.int64)
    w = h >> np.uint64(b)          # < 2^(64-b) <= 2^63, never full width
    width = 64 - b
    # rank = leading zeros of the (64-b)-bit remainder, + 1; the float
    # log2 bit-length estimate can be off by one at power-of-two
    # boundaries above 2^53, so verify 2^(bl-1) <= w < 2^bl exactly
    bl = np.zeros(h.size, np.int64)
    nz = w > 0
    wv = w[nz]
    est = np.floor(np.log2(wv.astype(np.float64))).astype(np.int64) + 1
    est = np.clip(est, 1, 63)
    lo = np.uint64(1) << (est - 1).astype(np.uint64)
    est = np.where(wv < lo, est - 1, est)
    lo = np.uint64(1) << np.maximum(est - 1, 0).astype(np.uint64)
    est = np.where(wv >= (lo << np.uint64(1)), est + 1, est)
    bl[nz] = est
    rank = np.where(nz, width - bl + 1, width + 1).astype(np.int64)
    reg = np.full(m, -1, np.int64)
    np.maximum.at(reg, bucket, rank)
    nzb = np.flatnonzero(reg >= 0)
    return nzb, reg[nzb]


def hll_registers(ds: ray.data.Dataset, col: str, b: int = 12,
                  tokenize: bool = False) -> pa.Table:
    """Non-empty HLL registers (bucket, max_rank) of a column (or of
    its whitespace tokens with ``tokenize=True``). Integer-exact and
    order-independent → driver-oracleable as-is."""

    class _Partial:
        def __init__(self):
            self.memo: dict = {}

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"bucket": pa.array([], pa.int64()),
                                 "max_rank": pa.array([], pa.int64())})
            vals = (_tokens_of(batch, col) if tokenize
                    else [v for v in batch.column(col).to_pylist()
                          if v is not None])
            if not vals:
                return pa.table({"bucket": pa.array([], pa.int64()),
                                 "max_rank": pa.array([], pa.int64())})
            h = _hash_values(vals, self.memo)
            nzb, ranks = _hll_partial(h, b)
            return pa.table({"bucket": pa.array(nzb, pa.int64()),
                             "max_rank": pa.array(ranks, pa.int64())})

    merged = (ds.map_batches(_Partial, concurrency=(1, 8),
                             batch_format="pyarrow")
              .groupby("bucket").max("max_rank"))
    t = pa.Table.from_pylist(merged.take_all())
    if t.num_rows == 0:
        return pa.table({"bucket": pa.array([], pa.int64()),
                         "max_rank": pa.array([], pa.int64())})
    t = (t.select(["bucket", "max(max_rank)"])
         .rename_columns(["bucket", "max_rank"]))
    return t.sort_by("bucket")


def hll_estimate(registers: pa.Table, b: int = 12) -> float:
    """Flajolet et al. 2007 estimator with the small-range linear
    counting correction (large-range correction unnecessary with a
    64-bit hash)."""
    m = 1 << b
    ranks = registers.column("max_rank").to_numpy(
        zero_copy_only=False)
    if b < 4:
        alpha = {0: 1.0, 1: 0.7, 2: 0.63, 3: 0.66}.get(b, 0.7)
    elif m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1 + 1.079 / m)
    empty = m - len(ranks)
    s = float(np.power(2.0, -ranks).sum()) + empty * 1.0
    e = alpha * m * m / s
    if e <= 2.5 * m and empty > 0:
        return m * float(np.log(m / empty))
    return e


def hll_distinct(ds: ray.data.Dataset, col: str, b: int = 12,
                 tokenize: bool = False) -> float:
    """Approximate distinct count (relative error ~= 1.04/sqrt(2^b))."""
    return hll_estimate(hll_registers(ds, col, b=b,
                                      tokenize=tokenize), b=b)


# ---- Count-Min -------------------------------------------------------------

def _cm_buckets(vals: list[str], d: int, w: int) -> np.ndarray:
    """(d, n) bucket matrix: row i hashes ``f"{i}:{val}"``."""
    from blacklab_ray.util import md5_low64_keyed
    return np.stack([
        (md5_low64_keyed(str(i), vals) % w).astype(np.int64)
        for i in range(d)])


def count_min_sketch(ds: ray.data.Dataset, col: str, w: int = 1024,
                     d: int = 4, tokenize: bool = False) -> pa.Table:
    """Count-Min counter table (row, bucket, cnt), non-zero cells
    only. Each block folds to <= d*w partial cells in map_batches;
    one groupby.sum merges (counts are exact ints → deterministic)."""

    def _partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"row": pa.array([], pa.int64()),
                          "bucket": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        vals = (_tokens_of(batch, col) if tokenize
                else [v for v in batch.column(col).to_pylist()
                      if v is not None])
        if not vals:
            return empty
        uniq, cnts = np.unique(np.asarray(vals, dtype=object),
                               return_counts=True)
        bk = _cm_buckets(list(uniq), d, w)
        dense = np.zeros((d, w), np.int64)
        for i in range(d):
            np.add.at(dense[i], bk[i], cnts)
        rows, buckets = np.nonzero(dense)
        return pa.table({"row": pa.array(rows, pa.int64()),
                         "bucket": pa.array(buckets, pa.int64()),
                         "cnt": pa.array(dense[rows, buckets],
                                         pa.int64())})

    merged = (ds.map_batches(_partial, batch_format="pyarrow")
              .groupby(["row", "bucket"]).sum("cnt"))
    t = pa.Table.from_pylist(merged.take_all())
    if t.num_rows == 0:
        return pa.table({"row": pa.array([], pa.int64()),
                         "bucket": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})
    t = (t.select(["row", "bucket", "sum(cnt)"])
         .rename_columns(["row", "bucket", "cnt"]))
    return t.sort_by([("row", "ascending"), ("bucket", "ascending")])


def cm_estimate(sketch: pa.Table, values: list[str], w: int = 1024,
                d: int = 4) -> np.ndarray:
    """Point estimates: min over rows of the value's cells. One-sided
    — never below the true count."""
    dense = np.zeros((d, w), np.int64)
    dense[sketch.column("row").to_numpy(zero_copy_only=False),
          sketch.column("bucket").to_numpy(zero_copy_only=False)] = \
        sketch.column("cnt").to_numpy(zero_copy_only=False)
    bk = _cm_buckets(values, d, w)
    return dense[np.arange(d)[:, None], bk].min(axis=0)


# ---- mergeable quantile digest ---------------------------------------------

def _compress(values: np.ndarray, weights: np.ndarray,
              k: int) -> tuple[np.ndarray, np.ndarray]:
    """(value, weight) points sorted by value → ≤ k equi-weight points.

    Each output point sits at the weighted-rank midpoint of its slot,
    so one compression moves any rank estimate by at most W/(2k) —
    the classic equi-depth summary bound (GK/t-digest-lite)."""
    if values.size <= k:
        return values, weights
    W = float(weights.sum())
    cum = np.cumsum(weights) - weights / 2.0   # midpoint ranks
    targets = (np.arange(k) + 0.5) * (W / k)
    idx = np.searchsorted(cum, targets)
    idx = np.clip(idx, 0, values.size - 1)
    return values[idx], np.full(k, W / k, np.float64)


def quantile_digest(ds: ray.data.Dataset, col: str,
                    k: int = 256) -> pa.Table:
    """Mergeable equi-depth quantile summary of an UNBOUNDED-cardinality
    numeric column — the general-path companion to
    ``docsops.exact_quantiles`` (whose value-count shuffle is exact but
    assumes bounded distinct values, e.g. integer doc lengths).

    Per block: sort + compress to ≤ k (value, weight) points inside
    ``map_batches`` (the combiner); the driver merge sees ≤ k × blocks
    rows (digest-sized, never corpus-sized) and recompresses once.
    Two compression levels bound the rank error of any quantile by
    ~W/k. Deterministic (no sampling)."""

    def _partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"value": pa.array([], pa.float64()),
                          "weight": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        v = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return empty
        v = np.sort(v)
        cv, cw = _compress(v, np.ones(v.size, np.float64), k)
        return pa.table({"value": pa.array(cv, pa.float64()),
                         "weight": pa.array(cw, pa.float64())})

    parts = [b for b in ds.select_columns([col])
             .map_batches(_partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow") if b.num_rows]
    if not parts:
        return pa.table({"value": pa.array([], pa.float64()),
                         "weight": pa.array([], pa.float64())})
    t = pa.concat_tables(parts)
    v = t.column("value").to_numpy(zero_copy_only=False)
    w = t.column("weight").to_numpy(zero_copy_only=False)
    order = np.argsort(v, kind="stable")
    cv, cw = _compress(v[order], w[order], k)
    return pa.table({"value": pa.array(cv, pa.float64()),
                     "weight": pa.array(cw, pa.float64())})


def digest_quantiles(digest: pa.Table, qs: list[float]) -> dict:
    """q → approximate value: the first digest point whose cumulative
    weight reaches q·W (quantile_disc-style lower selection)."""
    v = digest.column("value").to_numpy(zero_copy_only=False)
    w = digest.column("weight").to_numpy(zero_copy_only=False)
    if v.size == 0:
        return {float(q): None for q in qs}
    cum = np.cumsum(w)
    W = float(cum[-1])
    out = {}
    for q in qs:
        i = int(np.searchsorted(cum, q * W, side="left"))
        out[float(q)] = float(v[min(i, v.size - 1)])
    return out


def approx_quantiles(ds: ray.data.Dataset, col: str, qs: list[float],
                     k: int = 256) -> dict:
    """Convenience: digest + query in one call (rank error ~n/k)."""
    return digest_quantiles(quantile_digest(ds, col, k), qs)
