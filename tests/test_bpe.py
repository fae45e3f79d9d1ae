"""BPE trainer/encoder (pipelines/bpe.py) vs an independent brute
reference: the brute recounts every pair from scratch each round and
scans for the max with the same (count desc, pair asc) rule, so it
shares no code with the incremental heap trainer."""

import re

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from blacklab_ray.pipelines.bpe import (
    EOW, BpeEncoder, bpe_stats, encode_word, train_bpe,
    train_bpe_from_corpus, word_counts,
)


def _tok(s):
    return re.findall(r"[a-z0-9]+", s.lower())


def _brute_train(word_freq: dict, num_merges: int):
    words = {w: list(w) + [EOW] for w in word_freq}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for w, syms in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + word_freq[w]
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] <= 0:
            break
        merges.append(best)
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and (syms[i], syms[i + 1]) == best):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def _counts_table(word_freq: dict) -> pa.Table:
    items = sorted(word_freq.items())
    return pa.table({"term": pa.array([w for w, _ in items]),
                     "n": pa.array([n for _, n in items], pa.int64())})


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_trainer_matches_brute_sennrich():
    got = train_bpe(_counts_table(SENNRICH), 10)
    want = _brute_train(dict(SENNRICH), 10)
    assert got == want
    # the classic first merges: ('e','s') then ('es','t')
    assert got[0] == ("e", "s") and got[1] == ("es", "t")


def test_trainer_matches_brute_random():
    rng = np.random.default_rng(11)
    alphabet = "abcdef"
    for trial in range(5):
        wf = {}
        for _ in range(40):
            w = "".join(alphabet[i] for i in
                        rng.integers(0, len(alphabet),
                                     int(rng.integers(1, 8))))
            wf[w] = wf.get(w, 0) + int(rng.integers(1, 9))
        n_merges = int(rng.integers(1, 30))
        assert train_bpe(_counts_table(wf), n_merges) == \
            _brute_train(dict(wf), n_merges), (trial, wf, n_merges)


def test_encode_word_roundtrip_and_unseen():
    merges = train_bpe(_counts_table(SENNRICH), 8)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in SENNRICH:
        subs = encode_word(w, ranks)
        assert "".join(subs) == w + EOW        # lossless
    # unseen characters fall back to char-level symbols
    subs = encode_word("zqx", ranks)
    assert "".join(subs) == "zqx" + EOW and len(subs) >= 3


DOCS = ["the lowest and newest low", "a wider and lower view",
        "newest newest newest", ""]


def test_corpus_train_and_stats(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(DOCS)), pa.int64()),
        "text": pa.array(DOCS)})).repartition(2)
    wc = word_counts(ds)
    got = {r["term"]: r["n"] for r in wc.to_pylist()}
    want = {}
    for t in DOCS:
        for w in _tok(t):
            want[w] = want.get(w, 0) + 1
    assert got == want
    merges = train_bpe_from_corpus(ds, 20)
    assert merges == _brute_train(dict(want), 20)
    df = bpe_stats(ds, merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(df) == len(DOCS)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for r in df.itertuples():
        toks = _tok(DOCS[r.doc_id])
        assert r.n_words == len(toks)
        want_sub = sum(len(encode_word(w, ranks)) for w in toks)
        assert r.n_subwords == want_sub
        assert r.compression == round(want_sub / max(len(toks), 1), 4)


def test_encode_ids_and_packed_export(ray_session, tmp_path):
    """Full BPE training pipeline: train → encode to ids → pack into
    shards via export(ids_col=...) → reconstruct the stream and check
    it equals the brute per-doc concatenation in doc order."""
    from blacklab_ray.pipelines.bpe import bpe_vocab, encode_ids
    from blacklab_ray.pipelines.export import (
        export_packed_sequences, read_packed,
    )
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(DOCS)), pa.int64()),
        "text": pa.array(DOCS)})).repartition(2)
    wc_tbl = word_counts(ds)
    merges = train_bpe(wc_tbl, 15)
    vocab = bpe_vocab(merges, wc_tbl)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    ids_of = {s: i for s, i in zip(vocab["subword"].to_pylist(),
                                   vocab["token_id"].to_pylist())}
    want_stream = []
    for t in DOCS:        # docs pack in doc_id order
        for w in _tok(t):
            want_stream += [ids_of[s]
                            for s in encode_word(w, ranks)]
    enc = encode_ids(ds, merges, vocab)
    out = str(tmp_path / "bpe_shards")
    stats = export_packed_sequences(
        enc, out, seq_len=8, seqs_per_shard=2,
        ids_col="token_ids", n_vocab=int(vocab.num_rows) + 2)
    assert stats["total_tokens"] == len(want_stream)
    assert stats["vocab_size"] == int(vocab.num_rows) + 2
    packed = read_packed(out).to_pandas().sort_values("seq_id")
    got = [t for row in packed["tokens"] for t in row]
    n_real = int(sum(packed["n_real"]))
    assert n_real == len(want_stream)
    assert got[:n_real] == want_stream       # exact stream, doc order
    assert all(t == 0 for t in got[n_real:])  # PAD tail
    # vocab/eos are upstream concerns in ids mode
    with pytest.raises(ValueError):
        export_packed_sequences(enc, str(tmp_path / "x"),
                                ids_col="token_ids", eos=True)


def test_encoder_cache_and_determinism(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(DOCS)), pa.int64()),
        "text": pa.array(DOCS)}))
    merges = train_bpe_from_corpus(ds, 12)
    a = bpe_stats(ds, merges).to_pandas().sort_values("doc_id")
    b = bpe_stats(ds, merges).to_pandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    # tiny cache still correct (epoch-clear path)
    enc = BpeEncoder(merges, cache_cap=2)
    out = enc(pa.table({"doc_id": pa.array([0], pa.int64()),
                        "text": pa.array([DOCS[0]])}))
    assert out["n_words"][0].as_py() == 5
