"""Unigram-LM tokenizer (pipelines/unigram.py — Kudo 2018)."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from blacklab_ray.pipelines.unigram import (
    UnigramEncode, train_unigram, train_unigram_from_corpus,
    unigram_stats, viterbi_encode,
)


def _counts(pairs):
    return pa.table({"term": pa.array([t for t, _ in pairs]),
                     "n": pa.array([n for _, n in pairs], pa.int64())})


def test_train_basic_properties():
    counts = _counts([("foobar", 50), ("foo", 30), ("bar", 30),
                      ("baz", 10), ("qux", 5)])
    tbl = train_unigram(counts, vocab_size=12)
    pieces = tbl["piece"].to_pylist()
    lps = tbl["logprob"].to_pylist()
    assert len(pieces) <= 12
    # every single character survives (coverage guarantee)
    chars = {c for t, _ in zip(counts["term"].to_pylist(),
                               counts["n"].to_pylist()) for c in t}
    assert chars <= set(pieces)
    # probabilities are a (floored) distribution, sorted descending
    assert all(a >= b for a, b in zip(lps, lps[1:]))
    assert all(lp < 0 for lp in lps)
    # frequent multi-char pieces learned
    assert any(len(p) > 1 for p in pieces)


def test_train_deterministic():
    counts = _counts([("alpha", 7), ("alphabet", 3), ("beta", 9)])
    a = train_unigram(counts, vocab_size=15)
    b = train_unigram(counts, vocab_size=15)
    assert a.equals(b)
    # row order of the input must not matter (partitioning
    # independence — the distributed count table has no fixed order)
    c = train_unigram(_counts([("beta", 9), ("alphabet", 3),
                               ("alpha", 7)]), vocab_size=15)
    assert a.equals(c)


def test_viterbi_round_trip_and_fallback():
    counts = _counts([("foofoo", 20), ("barbar", 20)])
    tbl = train_unigram(counts, vocab_size=10)
    logp = dict(zip(tbl["piece"].to_pylist(),
                    tbl["logprob"].to_pylist()))
    for w in ("foofoo", "barbar", "foobar", "bazzz"):
        segs = viterbi_encode(w, logp)
        assert "".join(segs) == w      # lossless
    # a frequent word segments into fewer pieces than characters
    assert len(viterbi_encode("foofoo", logp)) < 6


def test_corpus_stats_end_to_end(ray_session):
    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["hello hello world", "hello unseen"],
    })
    ds = ray.data.from_arrow(docs)
    tbl = train_unigram_from_corpus(ds, vocab_size=30)
    out = unigram_stats(ds, tbl).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["n_words"].tolist() == [3, 2]
    assert (out["n_subwords"] >= out["n_words"]).all()
    assert (out["fertility"] >= 1.0).all()
    # the trained pieces segment in-vocab words compactly
    logp = dict(zip(tbl["piece"].to_pylist(),
                    tbl["logprob"].to_pylist()))
    assert len(viterbi_encode("hello", logp)) <= 2


def test_em_improves_or_holds_likelihood():
    """One extra EM round must not decrease total corpus
    log-likelihood (the EM guarantee, modulo the prune floor)."""
    from blacklab_ray.pipelines.unigram import (_forward_backward,
                                                _seed_pieces)
    counts = _counts([("mississippi", 5), ("missing", 7),
                      ("pipes", 3)])
    terms = counts["term"].to_pylist()
    freq = counts["n"].to_numpy(zero_copy_only=False).tolist()
    logp = _seed_pieces(counts, 60, 8)

    def loglik(lp):
        return sum(f * _forward_backward(t, lp, 8)[0]
                   for t, f in zip(terms, freq))

    before = loglik(logp)
    exp_tot = {}
    for t, f in zip(terms, freq):
        _, e = _forward_backward(t, logp, 8)
        for s, c in e.items():
            exp_tot[s] = exp_tot.get(s, 0.0) + c * f
    tot = sum(exp_tot.values())
    logp2 = {s: math.log(max(exp_tot.get(s, 0.0), 1e-10) / tot)
             for s in logp}
    assert loglik(logp2) >= before - 1e-6


def test_vocab_size_below_char_floor_raises():
    import pytest
    counts = _counts([("abcdefghij", 3), ("klmnopqrst", 2)])
    with pytest.raises(ValueError, match="distinct characters"):
        train_unigram(counts, vocab_size=5)
