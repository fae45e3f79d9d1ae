"""Lucene-8-style BM25 scoring math (shared by engine and test oracle).

BlackLab runs its span queries unscored and delegates relevance scoring to
Lucene's BM25Similarity (search/results/HitsFromQuery.java:103 runs
ScoreMode.COMPLETE_NO_SCORES; the Lucene-backed behavior is the scoring
reference). Formula (Lucene 8 dropped the (k1+1) numerator factor —
rank-preserving):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    K(dl)   = k1 * (1 - b + b * dl / avgdl)
    score   = sum_t idf(t) * tf / (tf + K(dl_q))

where ``dl_q`` is the SmallFloat-quantized doc length decoded from the
1-byte norm (``quantize=True``, the Lucene-parity path) or the exact
length (``quantize=False``, used where an exact SQL oracle is compared).
"""

from __future__ import annotations

import numpy as np

from blacklab_ray.codec.smallfloat import decode_norms

K1 = 1.2
B = 0.75


def idf(df: float | np.ndarray, n_docs: int) -> float | np.ndarray:
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def length_norm_k(doc_len: np.ndarray, avgdl: float,
                  k1: float = K1, b: float = B) -> np.ndarray:
    return k1 * (1.0 - b + b * (doc_len / avgdl))


def score_tf(tf: np.ndarray, doc_len: np.ndarray, avgdl: float,
             k1: float = K1, b: float = B) -> np.ndarray:
    """Per-posting tf-side weight tf / (tf + K(dl)); multiply by idf."""
    tf = tf.astype(np.float64)
    return tf / (tf + length_norm_k(doc_len.astype(np.float64), avgdl, k1, b))


def score_block(tfs: np.ndarray, norms: np.ndarray, avgdl: float,
                term_idf: float, quantize: bool = True,
                exact_lens: np.ndarray | None = None) -> np.ndarray:
    """Score a decoded posting block."""
    if quantize:
        dl = decode_norms(norms)
    else:
        assert exact_lens is not None
        dl = exact_lens
    return term_idf * score_tf(tfs, dl, avgdl)


def block_upper_bounds(max_tfs: np.ndarray, min_norms: np.ndarray,
                       avgdl: float, term_idf: float) -> np.ndarray:
    """Vectorized block_upper_bound over per-block metadata arrays."""
    dl = decode_norms(
        np.asarray(min_norms).astype(np.uint8)).astype(np.float64)
    k = K1 * (1.0 - B + B * dl / avgdl)
    mt = np.asarray(max_tfs, dtype=np.float64)
    return term_idf * mt / (mt + k)


def block_upper_bound(max_tf: int, min_norm: int, avgdl: float,
                      term_idf: float) -> float:
    """Upper bound for any posting in a block with (max_tf, min_norm).

    tf/(tf+K) is increasing in tf and decreasing in K (and K is increasing
    in dl, dl increasing in norm byte), so (max_tf, min_norm) dominates.
    """
    dl = float(decode_norms(np.array([min_norm]))[0])
    k = K1 * (1.0 - B + B * dl / avgdl)
    return term_idf * max_tf / (max_tf + k)
