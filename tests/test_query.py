import math

import numpy as np
import pytest

from blacklab_ray.query import (
    IndexReader, phrase_search, search, search_taat, search_wand,
)
from blacklab_ray.query.bm25 import B, K1


@pytest.fixture(scope="module")
def reader(small_index):
    return IndexReader(small_index)


def _pairs(tbl):
    return list(zip(tbl["doc_id"].to_pylist(), tbl["score"].to_pylist()))


def _assert_match(got, exp):
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, a), (_, b) in zip(got, exp):
        assert abs(a - b) < 1e-9


def test_pangram_bm25_exact_scores(pangram_index, small_oracle):
    """Hand-checkable: score of 'aap' on u1 (df=1, tf=5, dl=12)."""
    r = IndexReader(pangram_index)
    res = search_taat(r, ["aap"], 5, quantize=False, resolve_urls=True)
    assert res.num_rows == 1
    assert res["url"].to_pylist() == ["u1"]
    n, df, tf, dl = 4, 1, 5, 12
    avgdl = 37 / 4
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    exp = idf * tf / (tf + K1 * (1 - B + B * dl / avgdl))
    assert abs(res["score"][0].as_py() - exp) < 1e-12


def test_random_queries_match_oracle(reader, small_oracle):
    rng = np.random.default_rng(43)
    vocab = sorted(small_oracle.doc_freq().keys())
    for qi in range(30):
        nt = int(rng.integers(1, 5))
        terms = [vocab[int(rng.integers(0, len(vocab)))] for _ in range(nt)]
        if qi % 3 == 0:
            terms.append("the")        # hot term (salted postings)
        if qi % 7 == 0:
            terms.append("zz_nohit")   # zero-hit term mixed in
        mode = "and" if qi % 5 == 4 else "or"
        k = int(rng.integers(1, 25))
        exp = small_oracle.topk(terms, k, mode)
        _assert_match(_pairs(search_taat(reader, terms, k, mode=mode)), exp)
        if mode == "or":
            _assert_match(_pairs(search_wand(reader, terms, k)), exp)


def test_quantize_false_uses_exact_lengths(reader, small_oracle):
    exp = small_oracle.topk(["the", "of"], 15, quantize=False)
    got = search_taat(reader, ["the", "of"], 15, quantize=False)
    _assert_match(_pairs(got), exp)


def test_empty_and_missing_terms(reader):
    assert search(reader, ["zz_nohit"], 10).num_rows == 0
    assert search(reader, ["zz_nohit", "the"], 10, mode="and").num_rows == 0
    assert search(reader, ["zz_nohit", "the"], 10).num_rows > 0


def test_duplicate_query_terms_deduped(reader):
    a = _pairs(search_taat(reader, ["the", "the"], 10))
    b = _pairs(search_taat(reader, ["the"], 10))
    assert a == b


def test_phrase_matches_oracle(reader, small_oracle):
    # pick a phrase known to occur: most common bigram starting with 'the'
    import collections
    follow = collections.Counter()
    for toks in small_oracle.docs.values():
        for x, y in zip(toks, toks[1:]):
            if x == "the":
                follow[y] += 1
    nxt = follow.most_common(1)[0][0]
    phrase = ["the", nxt]
    exp = small_oracle.phrase_docs(phrase)
    got = phrase_search(reader, phrase, k=10_000)
    got_map = dict(zip(got["doc_id"].to_pylist(),
                       got["phrase_tf"].to_pylist()))
    assert got_map == exp
    assert phrase_search(reader, ["zz_a", "zz_b"], 10).num_rows == 0


def test_wand_equals_taat_on_hot_terms(reader):
    """Stopword-heavy query stresses salted-segment k-way correctness."""
    terms = ["the", "of", "and", "to", "a"]
    for k in (1, 5, 37, 200):
        _assert_match(_pairs(search_wand(reader, terms, k)),
                      _pairs(search_taat(reader, terms, k)))


def test_rank_column_and_url_resolution(reader):
    t = search(reader, ["the"], 5, resolve_urls=True)
    assert t["rank"].to_pylist() == [1, 2, 3, 4, 5]
    assert all(u.startswith("https://") for u in t["url"].to_pylist())


def test_phrase_candidate_skipping(ray_session, tmp_path):
    """VERDICT r1 item 6: a phrase of (stopword, rare term) must NOT
    fully decode the stopword's posting list — candidates come from the
    rare term and only stopword blocks containing candidates decode."""
    import pyarrow.parquet as pq

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader, phrase_search
    from blacklab_ray.query.reader import DECODE_STATS, reset_decode_stats
    from blacklab_ray.sources.synth import generate_pages
    from blacklab_ray.testoracle import CorpusOracle
    pages = generate_pages(5000)
    src = tmp_path / "pages"
    src.mkdir()
    pq.write_table(pages, str(src / "p.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx, BuildParams(num_buckets=4, n_salts=2))
    oracle = CorpusOracle.from_pages(pages)
    # pick a rare term that actually follows "the" somewhere
    rare = None
    for did, toks in oracle.docs.items():
        for x, y in zip(toks, toks[1:]):
            if x == "the" and y.startswith("w0") and \
                    sum(y in t for t in oracle.docs.values()) <= 5:
                rare = y
                break
        if rare:
            break
    assert rare is not None
    reader = IndexReader(idx)
    the_blocks = sum(len(s.blocks) for s in reader.segments(["the"])["the"])
    rare_blocks = sum(len(s.blocks)
                      for s in reader.segments([rare])[rare])
    assert the_blocks >= 8, "fixture too small to prove skipping"
    reset_decode_stats()
    res = phrase_search(reader, ["the", rare], k=10**9)
    decoded = DECODE_STATS["blocks_decoded"]
    # decodes scale with the candidate count (few docs × salted
    # segments × [membership + positions] passes), NOT with the
    # stopword's list length: the old full-decode path cost
    # >= 2*(the_blocks + rare_blocks). Assert we stay below even ONE
    # full decode of the stopword.
    assert decoded < the_blocks, (decoded, the_blocks)
    assert DECODE_STATS["full_segments"] <= rare_blocks + 2
    # correctness unchanged vs brute oracle
    exp = sorted(did for did, toks in oracle.docs.items()
                 if any(a == "the" and b == rare
                        for a, b in zip(toks, toks[1:])))
    assert sorted(res["doc_id"].to_pylist()) == exp


def test_count_hits_clamps(ray_session, small_index):
    """maxHitsToProcess / maxHitsToCount safety rails
    (BLConfigSearch.java:13-15)."""
    from blacklab_ray.query import IndexReader
    from blacklab_ray.query.engine import count_hits, count_hits_clamped
    r = IndexReader(small_index)
    exact = count_hits(r, ["the"])
    # no clamp hit: same numbers, flags false
    c = count_hits_clamped(r, ["the"])
    assert c["n_docs"][0].as_py() == exact["n_docs"][0].as_py()
    assert c["n_hits"][0].as_py() == exact["n_hits"][0].as_py()
    assert not c["clamped_process"][0].as_py()
    assert not c["clamped_count"][0].as_py()
    # count clamp: n_hits capped, flagged
    c2 = count_hits_clamped(r, ["the"], max_count=5)
    assert c2["n_hits"][0].as_py() == 5
    assert c2["clamped_count"][0].as_py()
    # process clamp: stops decoding early, flagged, counts are a
    # lower bound
    c3 = count_hits_clamped(r, ["the"], max_process=1)
    assert c3["clamped_process"][0].as_py()
    assert c3["n_hits"][0].as_py() <= exact["n_hits"][0].as_py()
    assert c3["n_docs"][0].as_py() >= 1


def test_search_cache(ray_session, small_index):
    """BlsCache analogue: repeated identical searches hit the memo."""
    from blacklab_ray.query import IndexReader, search_taat
    from blacklab_ray.query.cache import SearchCache, describe
    r = IndexReader(small_index)
    cache = SearchCache(max_entries=4)
    calls = {"n": 0}

    def run():
        calls["n"] += 1
        return search_taat(r, ["the", "of"], k=5)

    key = describe("search", terms=["the", "of"], k=5, mode="or")
    a = cache.get_or_run(key, run)
    b = cache.get_or_run(key, run)
    assert calls["n"] == 1 and a is b
    assert cache.stats()["hits"] == 1
    # same query as tuple → same key (normalization)
    assert describe("search", terms=("the", "of"), k=5, mode="or") == key
    # LRU eviction at capacity
    for i in range(5):
        cache.get_or_run(f"k{i}", lambda: i)
    assert cache.stats()["entries"] == 4
    cache.invalidate()
    assert cache.stats()["entries"] == 0


def test_search_cache_byte_budget():
    """VERDICT r3 #6 (BlsCache.java:351-407 analogue): a few OVERSIZED
    results evict by the byte watermark long before the entry cap."""
    import numpy as np

    from blacklab_ray.query.cache import SearchCache, SharedCacheShard
    cache = SearchCache(max_entries=100, max_bytes=1 << 20)  # 1 MiB
    # 3 × 512 KiB results: the third insert must evict the first
    for i in range(3):
        cache.get_or_run(f"big{i}",
                         lambda: np.zeros(512 << 10, np.uint8))
    st = cache.stats()
    assert st["entries"] == 2, "byte budget did not evict"
    assert st["byte_evictions"] >= 1
    assert st["bytes"] <= 1 << 20
    # small entries still obey the entry cap
    cache = SearchCache(max_entries=4, max_bytes=1 << 30)
    for i in range(6):
        cache.get_or_run(f"k{i}", lambda: i)
    assert cache.stats()["entries"] == 4
    # the shared tier enforces the same budget through put()
    shard = SharedCacheShard(max_entries=100, max_bytes=1 << 20)
    for i in range(3):
        shard.put(f"big{i}", np.zeros(512 << 10, np.uint8))
    assert shard.stats()["entries"] == 2
    assert shard.get("big0") is None       # evicted
    assert shard.get("big2") is not None


def test_find_hits_clamp(ray_session):
    import pyarrow as pa
    import ray.data

    from blacklab_ray.pipelines.hits import find_hits
    tbl = pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "text": pa.array(["spark spark spark"] * 100, pa.string()),
    })
    ds = ray.data.from_arrow(tbl)
    assert find_hits(ds, "spark").count() == 300
    assert find_hits(ds, "spark", max_hits=7).count() == 7


def test_quantized_paths_avoid_doc_table(ray_session, small_index,
                                         monkeypatch):
    """VERDICT r1 #7 / r3 #2: query paths must never materialize the
    full doc table (query-actor OOM at corpus scale). Spy on every
    fwd-dataset read: `to_table` must always carry a doc_id filter
    (pruned gather); whole-table `pq.read_table` over fwd is banned."""
    import numpy as np

    from blacklab_ray.query import IndexReader, phrase_search, search
    from blacklab_ray.query import reader as reader_mod
    r = IndexReader(small_index)

    real_dataset = reader_mod.pa_ds.dataset

    class _SpyDS:
        def __init__(self, inner):
            self._inner = inner

        def to_table(self, columns=None, filter=None, **kw):
            assert filter is not None, \
                "unfiltered fwd to_table — full doc-table load"
            return self._inner.to_table(columns=columns, filter=filter,
                                        **kw)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    def spy_dataset(path, *a, **kw):
        inner = real_dataset(path, *a, **kw)
        return _SpyDS(inner) if "fwd" in str(path) else inner

    real_read_table = reader_mod.pq.read_table

    def banned_read_table(path, *a, **kw):
        if "fwd" in str(path):   # terms/meta loads are vocabulary-sized
            raise AssertionError(f"pq.read_table on {path} in query path")
        return real_read_table(path, *a, **kw)

    monkeypatch.setattr(reader_mod.pa_ds, "dataset", spy_dataset)
    monkeypatch.setattr(reader_mod.pq, "read_table", banned_read_table)

    phrase_search(r, ["the", "of"], k=5, quantize=False)  # doc_lens path
    t = search(r, ["the"], 5, resolve_urls=True)          # urls path
    assert all(u.startswith("https://") for u in t["url"].to_pylist())
    # negated-position CQL exercises spans.py's doc_lens(cand)
    from blacklab_ray.query.cql import search_cql
    search_cql(r, '"the" [word != "of"]', k=5)
    # norms gathered == norms computed from doc lengths
    from blacklab_ray.codec.smallfloat import encode_lengths
    ids = t["doc_id"].to_numpy()
    assert (r.norms_for(ids) == encode_lengths(r.doc_lens(ids))).all()


def test_wand_ckernel_parity_and_fallback(ray_session, small_index,
                                          monkeypatch):
    """The compiled WAND kernel must return BIT-identical tables to the
    pure-Python loop, and disabling it (BLRAY_NO_CKERNEL) must silently
    select the fallback."""
    import pytest as _pytest

    from blacklab_ray.query import IndexReader, ckernel
    from blacklab_ray.query.engine import search_wand
    r = IndexReader(small_index)
    orig = ckernel._kernel
    try:
        ckernel._kernel = False
        if ckernel.get_kernel() is None:
            _pytest.skip("no C toolchain in this environment")
        queries = [["the"], ["the", "of"], ["the", "of", "and", "a"],
                   ["quick", "the"], ["nosuchterm", "the"]]
        for q in queries:
            for k in (3, 10):
                ckernel._kernel = False
                monkeypatch.delenv("BLRAY_NO_CKERNEL", raising=False)
                t_c = search_wand(r, q, k=k)
                monkeypatch.setenv("BLRAY_NO_CKERNEL", "1")
                ckernel._kernel = False
                t_p = search_wand(r, q, k=k)
                assert t_c.equals(t_p), (q, k)
        monkeypatch.delenv("BLRAY_NO_CKERNEL", raising=False)
    finally:
        ckernel._kernel = orig


def test_wand_ckernel_exact_scoring_parity(ray_session, small_index,
                                           monkeypatch):
    """quantize=False (exact doc-length scoring) also rides the kernel:
    a sorted (doc_id, K(dl)) side table replaces the 256-entry norm
    table. Results must be BIT-identical to the Python exact loop and
    value-match the exact TAAT scorer."""
    import pytest as _pytest

    from blacklab_ray.query import IndexReader, ckernel
    from blacklab_ray.query.engine import search_taat, search_wand
    r = IndexReader(small_index)
    orig = ckernel._kernel
    try:
        ckernel._kernel = False
        if ckernel.get_kernel() is None:
            _pytest.skip("no C toolchain in this environment")
        for q in (["the"], ["the", "of"], ["quick", "the", "and"]):
            for k in (3, 10):
                ckernel._kernel = False
                monkeypatch.delenv("BLRAY_NO_CKERNEL", raising=False)
                t_c = search_wand(r, q, k=k, quantize=False)
                monkeypatch.setenv("BLRAY_NO_CKERNEL", "1")
                ckernel._kernel = False
                t_p = search_wand(r, q, k=k, quantize=False)
                assert t_c.equals(t_p), (q, k)
                t_exact = search_taat(r, q, k=k, quantize=False)
                assert t_c["doc_id"].to_pylist() \
                    == t_exact["doc_id"].to_pylist(), (q, k)
                for a, b in zip(t_c["score"].to_pylist(),
                                t_exact["score"].to_pylist()):
                    assert abs(a - b) < 1e-9
        monkeypatch.delenv("BLRAY_NO_CKERNEL", raising=False)
    finally:
        ckernel._kernel = orig


def _brute_andnot(oracle, pos, neg, k):
    scored = oracle.topk(pos, 10**6, "or")
    negdocs = {did for did, toks in oracle.docs.items()
               if any(t in toks for t in neg)}
    return [(d, s) for d, s in scored if d not in negdocs][:k]


def test_andnot_matches_brute(small_index, small_oracle):
    from blacklab_ray.query.engine import search_andnot
    r = IndexReader(small_index)
    for pos, neg in ([["the"], ["of"]], [["the", "of"], ["and"]],
                     [["the"], ["zz_nohit"]], [["of", "and"], ["the"]]):
        got = _pairs(search_andnot(r, pos, neg, k=10))
        _assert_match(got, _brute_andnot(small_oracle, pos, neg, 10))


def test_andnot_negative_decode_bounded(small_index, small_oracle):
    """VERDICT r2 #4: a stopword NEGATIVE must not be fully decoded —
    it is probed block-at-a-time over the positive candidate set."""
    from blacklab_ray.query.engine import search_andnot
    from blacklab_ray.query.reader import DECODE_STATS, reset_decode_stats
    r = IndexReader(small_index)  # fresh reader: no cached decodes
    vocab = small_oracle.doc_freq()
    rare = min((t for t in vocab if t.startswith("w")),
               key=lambda t: vocab[t])
    the_blocks = sum(len(s.blocks) for s in r.segments(["the"])["the"])
    assert the_blocks >= 8, "fixture too small to prove skipping"
    reset_decode_stats()
    got = _pairs(search_andnot(r, [rare], ["the"], k=10))
    assert DECODE_STATS["blocks_decoded"] < the_blocks, \
        "negative stopword list was fully decoded"
    _assert_match(got, _brute_andnot(small_oracle, [rare], ["the"], 10))


def test_andnot_wand_exclusion_path(small_index, small_oracle,
                                    monkeypatch):
    """Stopword-heavy POSITIVE side takes Block-Max WAND with the
    negatives as forward-only exclusion probes (not k=2^62 TAAT)."""
    from blacklab_ray.query import engine
    monkeypatch.setattr(engine, "AUTO_TAAT_MAX_POSTINGS", 0)
    r = IndexReader(small_index)
    for pos, neg in ([["the", "of"], ["and"]],
                     [["the", "of", "a"], ["w000001", "and"]],
                     [["the"], ["of"]]):
        got = _pairs(engine.search_andnot(r, pos, neg, k=10))
        _assert_match(got, _brute_andnot(small_oracle, pos, neg, 10))


def test_andnot_ckernel_exclusion_parity(small_index, small_oracle,
                                         monkeypatch):
    """The compiled kernel's exclusion probes (ExclIt) must return
    BIT-identical tables to the pure-Python _DocIter fallback on the
    WAND AND-NOT path."""
    import pytest as _pytest

    from blacklab_ray.query import ckernel, engine
    monkeypatch.setattr(engine, "AUTO_TAAT_MAX_POSTINGS", 0)
    r = IndexReader(small_index)
    orig = ckernel._kernel
    try:
        ckernel._kernel = False
        if ckernel.get_kernel() is None:
            _pytest.skip("no C toolchain in this environment")
        cases = ([["the", "of"], ["and"]],
                 [["the"], ["of"]],
                 [["the", "of", "a"], ["w000001", "and"]],
                 [["of", "and"], ["the"]],
                 [["the"], ["zz_nohit"]])
        for pos, neg in cases:
            for k in (3, 10):
                ckernel._kernel = False
                monkeypatch.delenv("BLRAY_NO_CKERNEL", raising=False)
                t_c = engine.search_andnot(r, pos, neg, k=k)
                monkeypatch.setenv("BLRAY_NO_CKERNEL", "1")
                ckernel._kernel = False
                t_p = engine.search_andnot(r, pos, neg, k=k)
                assert t_c.equals(t_p), (pos, neg, k)
                _assert_match(_pairs(t_c),
                              _brute_andnot(small_oracle, pos, neg, k))
        monkeypatch.delenv("BLRAY_NO_CKERNEL", raising=False)
    finally:
        ckernel._kernel = orig


def test_kwic_fwd_candidates_pruned(ray_session, small_index,
                                    small_oracle):
    """VERDICT r2 #4 (kwic): index-backed KWIC seeds candidate docs
    from the term's postings instead of scanning the whole fwd."""
    from blacklab_ray.pipelines.hits import (
        kwic_from_forward_index, term_doc_ids,
    )
    vocab = small_oracle.doc_freq()
    rare = min((t for t in vocab if t.startswith("w")),
               key=lambda t: vocab[t])
    cand = term_doc_ids(small_index, rare)
    exp_docs = sorted(did for did, toks in small_oracle.docs.items()
                      if rare in toks)
    assert sorted(cand.tolist()) == exp_docs
    assert cand.size < len(small_oracle.docs), "no pruning happened"
    out = kwic_from_forward_index(small_index, rare, context=2)
    tbl = out.take_all()
    assert sorted({r["doc_id"] for r in tbl}) == exp_docs
    # windows match the oracle token streams
    for row in tbl:
        toks = small_oracle.docs[row["doc_id"]]
        p = row["pos"]
        assert toks[p] == rare
        assert row["left"] == " ".join(toks[max(0, p - 2):p])
        assert row["right"] == " ".join(toks[p + 1:p + 3])
