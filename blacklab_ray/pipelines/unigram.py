"""Unigram-LM subword tokenizer training and encoding (Kudo 2018 —
the SentencePiece 'unigram' model), the companion trainer to
pipelines/bpe.py.

Scale design (100 TB): identical to BPE's — the ONLY distributed
stage is the exact word-frequency table (``bpe.word_counts``: one
part-hash shuffle of ``value_counts`` partials), because unigram
training operates on word TYPES (~1e6 rows where the corpus is
1e12). The EM + prune loop runs on the driver over the type table,
exactly how SentencePiece trains (it also reduces the corpus to a
sentence/word frequency table first). Encoding is an actor-pool
``map_batches`` stage that Viterbi-segments each batch's UNIQUE
words once through a per-actor cache and fans results back out.

Algorithm (from the published paper):
1. seed vocabulary: the most frequent substrings (≤ ``max_piece_len``
   chars) of the word types, frequency-weighted, plus every single
   character (coverage guarantee);
2. EM rounds: E-step computes expected piece counts per word type by
   forward-backward over all segmentations (log-space), weighted by
   word frequency; M-step re-normalizes piece log-probs;
3. prune: drop the lowest-expected-count pieces (never single chars)
   by ``shrink`` per round until ``vocab_size`` remains.

Deterministic: ties in seeding and pruning break lexicographically,
and the input count table is exact — training is reproducible across
corpus partitionings by construction.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data

from blacklab_ray.pipelines.bpe import word_counts

_NEG_INF = float("-inf")


def _seed_pieces(counts: pa.Table, seed_size: int,
                 max_piece_len: int) -> dict[str, float]:
    """Frequency-weighted substring seed vocabulary + all chars.
    Input is pre-sorted by term (train_unigram) so every accumulation
    below runs in one canonical order — training must be bit-identical
    however the distributed count table happened to be ordered."""
    terms = counts["term"].to_pylist()
    freq = counts["n"].to_numpy(zero_copy_only=False)
    sub: dict[str, int] = {}
    chars: set = set()
    for t, f in zip(terms, freq.tolist()):
        n = len(t)
        for i in range(n):
            chars.add(t[i])
            for j in range(i + 1, min(n, i + max_piece_len) + 1):
                s = t[i:j]
                sub[s] = sub.get(s, 0) + f
    # score = count * len (longer pieces carry more likelihood);
    # single chars are mandatory and excluded from the cap
    multi = [(s, c * len(s)) for s, c in sub.items() if len(s) > 1]
    multi.sort(key=lambda x: (-x[1], x[0]))
    pieces = {c: float(sub.get(c, 1)) for c in sorted(chars)}
    for s, sc in multi[:max(0, seed_size - len(pieces))]:
        pieces[s] = float(sc)
    total = math.fsum(pieces[s] for s in sorted(pieces))
    return {s: math.log(v / total) for s, v in pieces.items()}


def _forward_backward(word: str, logp: dict[str, float],
                      max_len: int):
    """(loglik, {piece: expected count}) over all segmentations."""
    n = len(word)
    alpha = [_NEG_INF] * (n + 1)
    alpha[0] = 0.0
    for j in range(1, n + 1):
        acc = _NEG_INF
        for i in range(max(0, j - max_len), j):
            lp = logp.get(word[i:j])
            if lp is None or alpha[i] == _NEG_INF:
                continue
            v = alpha[i] + lp
            acc = v if acc == _NEG_INF else \
                (acc + math.log1p(math.exp(v - acc)) if acc >= v
                 else v + math.log1p(math.exp(acc - v)))
        alpha[j] = acc
    if alpha[n] == _NEG_INF:
        return _NEG_INF, {}
    beta = [_NEG_INF] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = _NEG_INF
        for j in range(i + 1, min(n, i + max_len) + 1):
            lp = logp.get(word[i:j])
            if lp is None or beta[j] == _NEG_INF:
                continue
            v = lp + beta[j]
            acc = v if acc == _NEG_INF else \
                (acc + math.log1p(math.exp(v - acc)) if acc >= v
                 else v + math.log1p(math.exp(acc - v)))
        beta[i] = acc
    z = alpha[n]
    exp: dict[str, float] = {}
    for i in range(n):
        if alpha[i] == _NEG_INF:
            continue
        for j in range(i + 1, min(n, i + max_len) + 1):
            s = word[i:j]
            lp = logp.get(s)
            if lp is None or beta[j] == _NEG_INF:
                continue
            exp[s] = exp.get(s, 0.0) + \
                math.exp(alpha[i] + lp + beta[j] - z)
    return z, exp


def train_unigram(counts: pa.Table, vocab_size: int,
                  seed_size: int | None = None, n_em: int = 2,
                  shrink: float = 0.75,
                  max_piece_len: int = 8) -> pa.Table:
    """Train over a (term, n) word-type table → (piece, logprob),
    sorted by descending logprob then piece. ``vocab_size`` counts
    pieces incl. the mandatory single characters."""
    if counts.num_rows == 0:
        return pa.table({"piece": pa.array([], pa.string()),
                         "logprob": pa.array([], pa.float64())})
    seed_size = seed_size or max(vocab_size * 4, 1000)
    n_chars = len({c for t in counts["term"].to_pylist() for c in t})
    if vocab_size < n_chars:
        # single characters are unprunable (coverage guarantee), so a
        # smaller target can never be reached — SentencePiece raises
        # the same way ('vocab_size too small')
        raise ValueError(
            f"vocab_size={vocab_size} is smaller than the corpus's "
            f"{n_chars} distinct characters (the unprunable floor)")
    # canonical order FIRST: the distributed count table arrives in
    # whatever partition order the shuffle produced, and float
    # accumulation is order-sensitive — sorting makes training
    # bit-identical across partitionings
    counts = counts.sort_by([("term", "ascending")])
    logp = _seed_pieces(counts, seed_size, max_piece_len)
    terms = counts["term"].to_pylist()
    freq = counts["n"].to_numpy(zero_copy_only=False).tolist()

    def _em_round():
        nonlocal logp
        exp_tot: dict[str, float] = {}
        for t, f in zip(terms, freq):
            _, exp = _forward_backward(t, logp, max_piece_len)
            for s, c in exp.items():
                exp_tot[s] = exp_tot.get(s, 0.0) + c * f
        # chars never die even with zero expectation (coverage)
        floor = 1e-10
        tot = math.fsum(exp_tot[s] for s in sorted(exp_tot)) or 1.0
        logp = {s: math.log(max(exp_tot.get(s, 0.0), floor) / tot)
                for s in logp}
        return exp_tot

    exp_tot = _em_round()
    while len(logp) > vocab_size:
        before = len(logp)
        keep_n = max(vocab_size, int(len(logp) * shrink))
        multi = [(s, exp_tot.get(s, 0.0))
                 for s in logp if len(s) > 1]
        chars = [s for s in logp if len(s) == 1]
        multi.sort(key=lambda x: (-x[1], x[0]))
        kept = set(chars)
        for s, _c in multi:
            if len(kept) >= keep_n:
                break
            kept.add(s)
        logp = {s: lp for s, lp in logp.items() if s in kept}
        if len(logp) >= before:
            break    # nothing prunable left (all-chars floor)
        for _ in range(n_em):
            exp_tot = _em_round()
    out = sorted(logp.items(), key=lambda x: (-x[1], x[0]))
    return pa.table({
        "piece": pa.array([s for s, _ in out], pa.string()),
        "logprob": pa.array([lp for _, lp in out], pa.float64())})


def train_unigram_from_corpus(ds: ray.data.Dataset, vocab_size: int,
                              text_col: str = "text",
                              **kw) -> pa.Table:
    return train_unigram(word_counts(ds, text_col), vocab_size, **kw)


def viterbi_encode(word: str, logp: dict[str, float],
                   max_len: int = 8) -> list[str]:
    """Most-likely segmentation; unknown characters become their own
    pieces (the byte/char fallback convention)."""
    n = len(word)
    best = [_NEG_INF] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    unk = min(logp.values(), default=-10.0) - 10.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            if best[i] == _NEG_INF:
                continue
            lp = logp.get(word[i:j])
            if lp is None:
                if j - i > 1:
                    continue
                lp = unk          # single-char fallback
            v = best[i] + lp
            if v > best[j]:
                best[j], back[j] = v, i
    out = []
    j = n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    return out[::-1]


class UnigramEncode:
    """``map_batches`` actor: per-doc subword count under the trained
    model (fertility analytics — the unigram analogue of
    bpe.BPEEncode). Encodes each batch's UNIQUE words once through a
    per-actor cache."""

    def __init__(self, pieces_ref, text_col: str = "text",
                 id_col: str = "doc_id", max_piece_len: int = 8):
        tbl = ray.get(pieces_ref) if not isinstance(pieces_ref,
                                                   pa.Table) \
            else pieces_ref
        self._logp = dict(zip(tbl["piece"].to_pylist(),
                              tbl["logprob"].to_pylist()))
        self._text = text_col
        self._id = id_col
        self._max = max_piece_len
        self._cache: dict[str, int] = {}

    def _n_subwords(self, word: str) -> int:
        n = self._cache.get(word)
        if n is None:
            if len(self._cache) > 1_000_000:
                self._cache.clear()
            n = len(viterbi_encode(word, self._logp, self._max))
            self._cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from blacklab_ray.analysis.analyzers import tokenize_column
        parents, toks, _, doc_lens = tokenize_column(
            batch.column(self._text))
        d = pc.dictionary_encode(toks.combine_chunks()
                                 if isinstance(toks, pa.ChunkedArray)
                                 else toks)
        per_uniq = np.array([self._n_subwords(w)
                             for w in d.dictionary.to_pylist()],
                            np.int64)
        idx = d.indices.to_numpy(zero_copy_only=False)
        sub = np.bincount(parents,
                          weights=(per_uniq[idx]
                                   if idx.size else None),
                          minlength=batch.num_rows).astype(np.int64)
        n_words = np.asarray(doc_lens, np.int64)
        fert = np.divide(sub, np.maximum(n_words, 1),
                         dtype=np.float64)
        return pa.table({
            self._id: batch.column(self._id).cast(pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "n_subwords": pa.array(sub, pa.int64()),
            "fertility": pa.array(np.round(fert, 6), pa.float64()),
        })


def unigram_stats(ds: ray.data.Dataset, pieces: pa.Table,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-doc (n_words, n_subwords, fertility) under the model —
    broadcast the piece table once, one actor-pool pass."""
    ref = ray.put(pieces)
    return ds.map_batches(
        UnigramEncode, fn_constructor_args=(ref, text_col, id_col),
        batch_format="pyarrow", concurrency=2)
