"""Randomized cross-checks (the testing the reference lacks, SURVEY §5:
'no property-based/randomized testing' — we add it): WAND vs TAAT vs the
loop-based oracle on small random corpora, and codec roundtrips under
hypothesis."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from blacklab_ray.codec.vbyte import (
    decode_position_lists, delta_decode, delta_encode,
    encode_position_lists, vbyte_decode, vbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
@settings(max_examples=60, deadline=None)
def test_vbyte_roundtrip_hypothesis(values):
    v = np.array(values, dtype=np.uint64)
    assert vbyte_decode(vbyte_encode(v)).tolist() == values


@given(st.lists(st.integers(min_value=0, max_value=2**50), min_size=1,
                max_size=200, unique=True))
@settings(max_examples=60, deadline=None)
def test_delta_roundtrip_hypothesis(values):
    v = np.array(sorted(values), dtype=np.int64)
    assert (delta_decode(delta_encode(v)) == v).all()


@given(st.lists(st.lists(st.integers(min_value=0, max_value=5000),
                         min_size=1, max_size=6),
                min_size=1, max_size=40))
@settings(max_examples=40, deadline=None)
def test_position_lists_hypothesis(lists):
    lists = [sorted(set(l)) for l in lists if l]
    if not lists:
        return
    counts = np.array([len(l) for l in lists])
    pos = np.concatenate([np.array(l) for l in lists])
    got = decode_position_lists(encode_position_lists(pos, counts), counts)
    assert (got == pos).all()


def _random_corpus(rng, n_docs, vocab_size):
    vocab = [f"t{i}" for i in range(vocab_size)]
    pages = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    for i in range(n_docs):
        n = int(rng.integers(1, 60))
        toks = [vocab[int(rng.integers(0, vocab_size))] for _ in range(n)]
        text = " ".join(toks)
        pages["url"].append(f"u{i}")
        pages["warc_ts"].append(0)
        pages["html"].append(text.encode())
        pages["text"].append(text)
        pages["lang"].append("en")
    return pa.table({
        "url": pa.array(pages["url"], pa.string()),
        "warc_ts": pa.array(pages["warc_ts"], pa.timestamp("us")),
        "html": pa.array(pages["html"], pa.binary()),
        "text": pa.array(pages["text"], pa.string()),
        "lang": pa.array(pages["lang"], pa.string()),
    })


@pytest.mark.parametrize("seed,codec", [(11, "vbyte"), (12, "vbyte"),
                                        (13, "pfor"), (14, "pfor")])
def test_wand_taat_oracle_on_random_corpus(ray_session, tmp_path, seed,
                                           codec):
    import pyarrow.parquet as pq

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader, search_taat, search_wand
    from blacklab_ray.testoracle import CorpusOracle
    rng = np.random.default_rng(seed)
    pages = _random_corpus(rng, int(rng.integers(20, 90)),
                           int(rng.integers(3, 40)))
    src = tmp_path / f"pages{seed}"
    src.mkdir()
    pq.write_table(pages, str(src / "p.parquet"))
    idx = str(tmp_path / f"idx{seed}")
    build_index(str(src), idx,
                BuildParams(num_buckets=3, n_salts=2, block_size=4,
                            max_seg_postings=16, codec=codec))
    reader = IndexReader(idx)
    oracle = CorpusOracle.from_pages(pages)
    vocab = sorted(oracle.doc_freq())
    for _ in range(12):
        nt = int(rng.integers(1, 4))
        terms = [vocab[int(rng.integers(0, len(vocab)))]
                 for _ in range(nt)]
        k = int(rng.integers(1, 20))
        exp = oracle.topk(terms, k)
        t = search_taat(reader, terms, k)
        assert t["doc_id"].to_pylist() == [d for d, _ in exp]
        w = search_wand(reader, terms, k)
        assert w["doc_id"].to_pylist() == [d for d, _ in exp]
        for g, (_, s) in zip(w["score"].to_pylist(), exp):
            assert abs(g - s) < 1e-9
