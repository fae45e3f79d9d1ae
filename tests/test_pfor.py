"""PForDelta posting-block codec: roundtrip properties and end-to-end
index parity with the VByte codec (the posting codec slot —
BASELINE north_star "VByte/PForDelta-compressed blocks"; reference
slot: the Lucene postings format BlackLab40PostingsWriter delegates
to, engine/src/main/java/nl/inl/blacklab/codec/BlackLab40PostingsWriter.java:146)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------- codec


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                  max_size=600),
    bs=st.integers(min_value=1, max_value=255),
)
def test_pfor_roundtrip_property(vals, bs):
    from blacklab_ray.codec.pfor import decode_span, encode_blocks
    v = np.array(vals, dtype=np.uint64)
    blk_lo = np.arange(0, v.size, bs)
    blk_hi = np.minimum(blk_lo + bs, v.size)
    stream, offs = encode_blocks(v, blk_lo, blk_hi)
    got = decode_span(stream, offs, blk_hi - blk_lo)
    assert np.array_equal(got, v)


def test_pfor_rejects_oversized_blocks():
    from blacklab_ray.codec.pfor import encode_blocks
    v = np.zeros(300, np.uint64)
    with pytest.raises(ValueError):
        encode_blocks(v, np.array([0]), np.array([300]))


def test_pfor_smaller_than_vbyte_on_skewed_deltas():
    from blacklab_ray.codec.pfor import encode_blocks
    from blacklab_ray.codec.vbyte import vbyte_encode
    rng = np.random.default_rng(7)
    deltas = rng.geometric(0.3, 50000).astype(np.uint64)
    deltas[::128] = rng.integers(1 << 30, 1 << 40, deltas[::128].size)
    blk_lo = np.arange(0, deltas.size, 128)
    blk_hi = np.minimum(blk_lo + 128, deltas.size)
    stream, _ = encode_blocks(deltas, blk_lo, blk_hi)
    assert len(stream) < 0.7 * len(vbyte_encode(deltas))


# ------------------------------------------------------- index parity


@pytest.fixture(scope="module")
def pfor_index(ray_session, small_corpus_dir, tmp_path_factory):
    from blacklab_ray.index import BuildParams, build_index
    idx = str(tmp_path_factory.mktemp("pfor_index") / "idx")
    build_index(small_corpus_dir, idx,
                BuildParams(num_buckets=8, n_salts=4, block_size=16,
                            max_seg_postings=500, codec="pfor"))
    return idx


QUERIES = [["the"], ["the", "of"], ["the", "of", "and", "a"],
           ["quick", "the"], ["nosuchterm", "the"]]


def test_pfor_meta_records_codec(pfor_index):
    """On-disk size note: at this fixture's block_size=16 the 2-byte
    per-block header outweighs the packing (pfor ~8% larger); the
    compression win appears at the default 128-posting blocks —
    asserted on raw streams in test_pfor_smaller_than_vbyte_*."""
    import json
    with open(pfor_index + "/meta.json") as f:
        assert json.load(f)["params"]["codec"] == "pfor"


def test_pfor_matches_vbyte_all_algos(pfor_index, small_index):
    """Same corpus, both codecs: every algorithm returns EQUAL tables."""
    from blacklab_ray.query import IndexReader
    from blacklab_ray.query.engine import search
    rp, rv = IndexReader(pfor_index), IndexReader(small_index)
    for q in QUERIES:
        for algo in ("taat", "maxscore", "wand", "auto"):
            for mode in ("or", "and"):
                tp = search(rp, q, k=10, mode=mode, algo=algo)
                tv = search(rv, q, k=10, mode=mode, algo=algo)
                assert tp.equals(tv), (q, algo, mode)


def test_pfor_ckernel_parity(pfor_index, monkeypatch):
    """The C kernel's pfor block decode is bit-identical to the Python
    fallback on a pfor-codec index."""
    from blacklab_ray.query import IndexReader, ckernel
    from blacklab_ray.query.engine import search_wand
    r = IndexReader(pfor_index)
    orig = ckernel._kernel
    try:
        ckernel._kernel = False
        if ckernel.get_kernel() is None:
            pytest.skip("no C toolchain in this environment")
        for q in QUERIES:
            ckernel._kernel = False
            monkeypatch.delenv("BLRAY_NO_CKERNEL", raising=False)
            t_c = search_wand(r, q, k=10)
            monkeypatch.setenv("BLRAY_NO_CKERNEL", "1")
            ckernel._kernel = False
            t_p = search_wand(r, q, k=10)
            assert t_c.equals(t_p), q
        monkeypatch.delenv("BLRAY_NO_CKERNEL", raising=False)
    finally:
        ckernel._kernel = orig


def test_pfor_andnot_and_phrase(pfor_index, small_index):
    from blacklab_ray.query import IndexReader
    from blacklab_ray.query.engine import phrase_search, search_andnot
    rp, rv = IndexReader(pfor_index), IndexReader(small_index)
    for pos, neg in ([["the"], ["of"]], [["the", "of"], ["and"]]):
        assert search_andnot(rp, pos, neg, k=10).equals(
            search_andnot(rv, pos, neg, k=10))
    assert phrase_search(rp, ["the", "quick"], k=10).equals(
        phrase_search(rv, ["the", "quick"], k=10))


def test_pfor_update_compact_roundtrip(pfor_index, tmp_path):
    """Incremental add + delete + tiered compaction re-encode stays in
    the pfor codec (meta-inherited) and keeps results consistent."""
    import shutil

    from blacklab_ray.index.update import (
        add_documents, compact_generations, delete_documents,
    )
    from blacklab_ray.query import IndexReader
    from blacklab_ray.query.engine import search
    idx = str(tmp_path / "idx")
    shutil.copytree(pfor_index, idx)
    import pyarrow as pa
    import ray
    new = pa.table({
        "url": ["http://x.test/pfor-new-1", "http://x.test/pfor-new-2"],
        "text": ["zebra quartz the of", "zebra zebra quartz"],
        "lang": ["en", "en"],
    })
    add_documents(idx, ray.data.from_arrow(new))
    r = IndexReader(idx)
    t = search(r, ["zebra"], k=10)
    assert t.num_rows == 2
    gone = t["doc_id"][0].as_py()
    delete_documents(idx, [gone])
    compact_generations(idx, max_files_per_bucket=1)
    r2 = IndexReader(idx)
    t2 = search(r2, ["zebra"], k=10)
    assert t2.num_rows == 1 and t2["doc_id"][0].as_py() != gone
    import json
    with open(idx + "/meta.json") as f:
        assert json.load(f)["params"]["codec"] == "pfor"
