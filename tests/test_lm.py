"""Bigram-LM perplexity scoring (pipelines/lm.py).

The contract oracle (test_entry: lm_perplexity vs DuckDB) covers the
self-scored corpus; these tests cover what SQL can't reach — the
broadcast-vs-join parity and the unseen-bigram smoothing an EXTERNAL
model requires — against an independent pure-Python reference.
"""

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from blacklab_ray.pipelines.lm import (
    lm_perplexity, score_perplexity, train_bigram_lm, vocab_size,
)

DOCS = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "",                          # no tokens -> dropped
    "word",                      # one token, no bigram -> dropped
    "on the mat the cat sat",
    "completely different text here",
    "THE CAT... sat!",           # analyzer folds case/punct
]


def _tok(s):
    return re.findall(r"[a-z0-9]+", s.lower())


def _ref_model(texts):
    cnt, hist, vocab = {}, {}, set()
    for t in texts:
        toks = _tok(t)
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
            hist[a] = hist.get(a, 0) + 1
    return cnt, hist, len(vocab)


def _ref_scores(texts, ids, cnt, hist, v):
    out = {}
    for i, t in zip(ids, texts):
        toks = _tok(t)
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            continue
        lp = sum(math.log((cnt.get(p, 0) + 0.5)
                          / (hist.get(p[0], 0) + 0.5 * v))
                 for p in pairs)
        out[i] = (len(pairs), round(math.exp(-lp / len(pairs)), 4))
    return out


def _ds(texts, start_id=0):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(start_id, start_id + len(texts)),
                           pa.int64()),
        "text": pa.array(texts, pa.string())}))


@pytest.fixture(scope="module")
def lm_and_v(ray_session):
    lm = train_bigram_lm(_ds(DOCS), parts=8).materialize()
    return lm, vocab_size(lm)


def test_vocab_size_and_counts(ray_session, lm_and_v):
    lm, v = lm_and_v
    _, hist, ref_v = _ref_model(DOCS)
    assert v == ref_v
    tbl = pa.concat_tables(ray.get(lm.to_arrow_refs()))
    big = tbl.filter(tbl["w2"].combine_chunks().is_valid()).to_pandas()
    cnt, _, _ = _ref_model(DOCS)
    got = {(r.w1, r.w2): r.n for r in big.itertuples()}
    assert got == cnt
    # history totals attached per row
    for r in big.itertuples():
        assert r.h == hist[r.w1], (r.w1, r.h)


def _collect(ds):
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return {r.doc_id: (r.n_bigrams, r.ppl) for r in df.itertuples()}


def test_self_scored_matches_reference(ray_session, lm_and_v):
    cnt, hist, v = _ref_model(DOCS)
    ref = _ref_scores(DOCS, range(len(DOCS)), cnt, hist, v)
    got = _collect(lm_perplexity(_ds(DOCS), method="broadcast"))
    assert got == ref


def test_join_path_matches_broadcast(ray_session, lm_and_v):
    lm, v = lm_and_v
    a = _collect(score_perplexity(_ds(DOCS), lm, v=v,
                                  method="broadcast"))
    b = _collect(score_perplexity(_ds(DOCS), lm, v=v, method="join",
                                  parts=8))
    assert a == b and len(a) == 5   # two no-bigram docs dropped


def test_external_lm_unseen_bigrams(ray_session, lm_and_v):
    """Scoring a DIFFERENT corpus: unseen words (h=0, n=0) and seen
    words in unseen pairs (h>0, n=0) must smooth, not crash — the case
    the self-scoring SQL oracle can never produce."""
    lm, v = lm_and_v
    other = ["the dog sat on the cat",       # unseen pairs, seen words
             "zebra quagga okapi",           # fully unseen words
             "the cat sat on the mat"]       # fully seen
    cnt, hist, _ = _ref_model(DOCS)
    ref = _ref_scores(other, range(100, 103), cnt, hist, v)
    for method in ("broadcast", "join"):
        got = _collect(score_perplexity(_ds(other, 100), lm, v=v,
                                        method=method, parts=8))
        assert got == ref, method


def test_perplexity_buckets(ray_session):
    """Terciles cover the corpus; every scored doc gets a bucket and
    bucket order agrees with ppl order (oracle parity runs in
    test_entry against quantile_disc SQL)."""
    from blacklab_ray.pipelines.lm import perplexity_buckets
    df = perplexity_buckets(_ds(DOCS)).to_pandas()
    assert set(df.columns) == {"doc_id", "n_bigrams", "ppl", "bucket"}
    assert len(df) == 5
    order = {"head": 0, "middle": 1, "tail": 2}
    s = df.sort_values("ppl")
    ranks = [order[b] for b in s.bucket]
    assert ranks == sorted(ranks)           # monotone in ppl
    assert ranks[0] == 0 and ranks[-1] == 2  # all three present at n=5


def test_fully_seen_doc_scores_lower(ray_session, lm_and_v):
    lm, v = lm_and_v
    got = _collect(score_perplexity(
        _ds(["the cat sat on the mat", "zebra quagga okapi"], 200),
        lm, v=v, method="broadcast"))
    assert got[200][1] < got[201][1]
