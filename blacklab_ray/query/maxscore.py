"""Vectorized Block-Max MaxScore: exact top-k OR without full decode.

The doc-at-a-time WAND (engine.search_wand) is the faithful Lucene-style
iterator design, but doc-at-a-time Python costs ~35 µs per evaluation.
This module implements the MaxScore family (Turtle & Flood) with numpy
batch operations instead:

1. Seed a threshold θ by fully scoring the few highest-impact terms
   (partial scores are lower bounds on true scores, so their k-th best
   is a valid θ).
2. Split terms into non-essential (ascending-max-score prefix whose sum
   < θ — no doc matching only these can reach the top-k) and essential.
3. Candidates = union of essential postings, scored vectorized (TAAT
   over essential only).
4. For each non-essential term in descending max-score order: prune
   candidates whose upper bound (current partial + remaining prefix sum)
   falls below θ, then add that term's true contributions — decoding
   ONLY the blocks that contain surviving candidates (block-targeted
   gather via searchsorted on block last-docs).

Exact: ties kept via strict-inequality pruning; final order
(-score, doc_id) matches TAAT/WAND bit-for-bit (verified in tests).
Stopword lists (the non-essential ones) are never fully decoded —
the property that matters at 10^12 docs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from blacklab_ray.codec.smallfloat import decode_norms
from blacklab_ray.query.bm25 import block_upper_bounds, idf, score_tf
from blacklab_ray.query.reader import IndexReader, Segment


class _TermList:
    """Lazily decodable postings of one term (all salted segments)."""

    def __init__(self, reader: IndexReader, term: str, df: int,
                 segs: list[Segment], quantize: bool):
        self.term = term
        self.df = df
        self.idf = float(idf(df, reader.n_docs))
        self.reader = reader
        self.quantize = quantize
        self.segs = [s for s in segs if s.n_blocks]
        self.max_score = max(
            (float(block_upper_bounds(s.max_tfs, s.min_norms,
                                      reader.avgdl, self.idf).max())
             for s in self.segs), default=0.0)
        self._full = None

    def full(self):
        """(sorted doc_ids, scores) fully decoded (cached)."""
        if self._full is None:
            docs, tfs, norms = [], [], []
            for s in self.segs:
                d, t, n = s.decode_all()
                docs.append(d), tfs.append(t), norms.append(n)
            d = np.concatenate(docs) if docs else np.empty(0, np.int64)
            t = np.concatenate(tfs) if tfs else np.empty(0, np.int64)
            n = np.concatenate(norms) if norms else np.empty(0, np.uint8)
            keep = self.reader.mask_tombstones(d)
            if not keep.all():
                d, t, n = d[keep], t[keep], n[keep]
            order = np.argsort(d, kind="stable")
            d, t, n = d[order], t[order], n[order]
            dl = decode_norms(n) if self.quantize \
                else self.reader.doc_lens(d)
            self._full = (d, self.idf * score_tf(t, dl,
                                                 self.reader.avgdl))
        return self._full

    def scores_for(self, targets: np.ndarray) -> np.ndarray:
        """True contribution of this term for each target doc (0 when
        absent) — decodes only the blocks containing targets. When the
        target set is dense (would touch most blocks anyway), a full
        decode + one searchsorted is cheaper than per-block gathers."""
        if self._full is None and targets.size >= 4096:
            self.full()
        if self._full is not None:
            d, s = self._full
            idx = np.searchsorted(d, targets)
            idx_c = np.minimum(idx, d.size - 1) if d.size else idx
            out = np.zeros(targets.size, dtype=np.float64)
            if d.size:
                hit = d[idx_c] == targets
                out[hit] = s[idx_c[hit]]
            return out
        out = np.zeros(targets.size, dtype=np.float64)
        for seg in self.segs:
            last_docs = seg.last_docs
            bi = np.searchsorted(last_docs, targets)
            in_range = bi < last_docs.size
            if not in_range.any():
                continue
            for b in np.unique(bi[in_range]):
                sel = np.flatnonzero((bi == b) & in_range)
                d, t, n = seg.decode_block(int(b))
                dl = decode_norms(n) if self.quantize \
                    else self.reader.doc_lens(d)
                s = self.idf * score_tf(t, dl, self.reader.avgdl)
                pos = np.searchsorted(d, targets[sel])
                pos_c = np.minimum(pos, d.size - 1)
                hit = d[pos_c] == targets[sel]
                out[sel[hit]] += s[pos_c[hit]]
        if self.reader.tombstones:
            out[~self.reader.mask_tombstones(targets)] = 0.0
        return out


def _kth_largest(values: np.ndarray, k: int) -> float:
    if values.size < k:
        return -np.inf
    return float(np.partition(values, values.size - k)[values.size - k])


def search_maxscore(reader: IndexReader, terms: list[str], k: int = 10,
                    quantize: bool = True,
                    resolve_urls: bool = False) -> pa.Table:
    from blacklab_ray.query.engine import _result_table
    terms = list(dict.fromkeys(terms))
    stats = reader.term_stats(terms)
    present = [t for t in terms if t in stats]
    if not present:
        return _result_table(reader, np.empty(0, np.int64),
                             np.empty(0, np.float64), resolve_urls)
    segs = reader.segments(present)
    lists = [_TermList(reader, t, stats[t][0], segs[t], quantize)
             for t in present]
    lists.sort(key=lambda x: x.max_score)          # ascending
    prefix = np.concatenate(([0.0],
                             np.cumsum([x.max_score for x in lists])))

    # ---- seed θ from the highest-impact terms (lower-bound partials) ---
    seed: list[_TermList] = []
    total_df = 0
    for tl in reversed(lists):
        seed.append(tl)
        total_df += tl.df
        if total_df >= max(4 * k, 64):
            break
    seed_docs, seed_scores = _union_scores(seed)
    theta = _kth_largest(seed_scores, k)

    # ---- essential / non-essential split -------------------------------
    j = 0
    while j < len(lists) - 1 and prefix[j + 1] < theta:
        j += 1
    essential = lists[j:]
    non_essential = lists[:j]

    cand, partial = _union_scores(essential)
    theta = max(theta, _kth_largest(partial, k))
    remaining = float(prefix[j])
    keep = partial + remaining >= theta
    cand, partial = cand[keep], partial[keep]
    for tl in reversed(non_essential):             # descending max_score
        partial = partial + tl.scores_for(cand)
        remaining -= tl.max_score
        theta = max(theta, _kth_largest(partial, k))
        keep = partial + remaining >= theta
        cand, partial = cand[keep], partial[keep]
    order = np.lexsort((cand, -partial))[:k]
    return _result_table(reader, cand[order], partial[order], resolve_urls)


def _union_scores(lists: list[_TermList]):
    """Union of fully decoded lists with summed scores (vectorized)."""
    if not lists:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    docs = []
    scores = []
    for tl in lists:
        d, s = tl.full()
        docs.append(d)
        scores.append(s)
    d = np.concatenate(docs)
    s = np.concatenate(scores)
    uniq, inv = np.unique(d, return_inverse=True)
    sums = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(sums, inv, s)
    return uniq, sums
