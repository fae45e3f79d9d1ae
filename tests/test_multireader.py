"""Query-time federation (MultiIndexReader, the Lucene MultiReader
analogue): N independently built indexes searched as one corpus with
EXACT global BM25 stats — verified rank- and score-identical to the
single union-built index."""

import pyarrow.parquet as pq
import pytest

from blacklab_ray.index import BuildParams, build_index
from blacklab_ray.query import IndexReader, search_taat
from blacklab_ray.query.engine import phrase_search, search
from blacklab_ray.query.multireader import MultiIndexReader


@pytest.fixture(scope="module")
def federated(ray_session, tmp_path_factory):
    """Three sub-indexes over disjoint corpora (deliberately DIFFERENT
    layouts) + the union-built oracle index."""
    from blacklab_ray.sources.synth import generate_pages
    tmp = tmp_path_factory.mktemp("fed")
    sizes = [(0, 50), (50, 40), (90, 30)]
    sub_dirs = []
    union_src = tmp / "union_src"
    union_src.mkdir()
    for i, (off, n) in enumerate(sizes):
        src = tmp / f"src{i}"
        src.mkdir()
        pages = generate_pages(n, doc_offset=off)
        pq.write_table(pages, str(src / "p.parquet"))
        pq.write_table(pages, str(union_src / f"p{i}.parquet"))
        idx = str(tmp / f"idx{i}")
        build_index(str(src), idx,
                    BuildParams(num_buckets=2 + i, n_salts=1 + i % 2))
        sub_dirs.append(idx)
    union_idx = str(tmp / "union_idx")
    build_index(str(union_src), union_idx,
                BuildParams(num_buckets=4, n_salts=2))
    return MultiIndexReader(sub_dirs), IndexReader(union_idx)


QUERIES = (["the"], ["the", "w000010"], ["w000123"], ["w000010", "and"])


def test_global_stats_match_union(federated):
    multi, union = federated
    assert multi.n_docs == union.n_docs == 120
    assert abs(multi.avgdl - union.avgdl) < 1e-12
    mt = multi.terms_table.to_pydict()
    ut = union.terms_table.to_pydict()
    m = dict(zip(mt["term"], zip(mt["doc_freq"], mt["collection_tf"])))
    u = dict(zip(ut["term"], zip(ut["doc_freq"], ut["collection_tf"])))
    assert m == u


@pytest.mark.parametrize("terms", QUERIES)
@pytest.mark.parametrize("algo", ["taat", "wand"])
def test_topk_identical_to_union_index(federated, terms, algo):
    multi, union = federated
    if algo == "taat":
        got = search_taat(multi, terms, 15)
        want = search_taat(union, terms, 15)
    else:
        got = search(multi, terms, 15)
        want = search(union, terms, 15)
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    for g, w in zip(got["score"].to_pylist(),
                    want["score"].to_pylist()):
        assert abs(g - w) < 1e-9


def test_phrase_identical_to_union_index(federated):
    multi, union = federated
    got = phrase_search(multi, ["the", "quick"], 10)
    want = phrase_search(union, ["the", "quick"], 10)
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    for g, w in zip(got["score"].to_pylist(),
                    want["score"].to_pylist()):
        assert abs(g - w) < 1e-9


def test_gathers_route_to_owning_sub(federated):
    import numpy as np
    multi, union = federated
    # one doc from each sub-index, interleaved + repeated
    ids = search_taat(multi, ["the"], 120)["doc_id"].to_numpy()
    probe = np.concatenate([ids[:3], ids[-3:], ids[:3]])
    assert (multi.doc_lens(probe) == union.doc_lens(probe)).all()
    assert (multi.norms_for(probe) == union.norms_for(probe)).all()
    assert multi.urls(probe) == union.urls(probe)
    pos = np.zeros(probe.size, dtype=np.int64)
    assert multi.tokens_at(probe, pos) == union.tokens_at(probe, pos)


def test_tombstone_union_masks_federated_hits(federated, tmp_path):
    """Deleting in ONE sub-index hides the doc from federated search."""
    import numpy as np
    multi, _ = federated
    from blacklab_ray.index.update import delete_documents
    sub = multi.subs[1]
    victim_ids = sub.all_doc_ids()[:2]
    urls = sub.urls(victim_ids)
    delete_documents(sub.index_dir, urls=urls)
    fresh = MultiIndexReader(multi.index_dirs)
    res = search_taat(fresh, ["the"], 10**9)
    assert not set(int(v) for v in victim_ids) \
        & set(res["doc_id"].to_pylist())
    mask = fresh.mask_tombstones(np.asarray(victim_ids))
    assert not mask.any()


def test_query_service_federated(federated):
    """The replicated query-actor pool accepts the comma-dir spec and
    serves federated results (minus the sub-1 docs deleted by the
    tombstone test, which may run first in module order)."""
    multi, _ = federated
    from blacklab_ray.query import QueryService
    fresh = MultiIndexReader(multi.index_dirs)
    svc = QueryService(",".join(multi.index_dirs), n_actors=1)
    try:
        import ray
        got = ray.get(svc.submit(["the"], k=12, algo="taat"))["rows"]
        want = search_taat(fresh, ["the"], 12)
        assert [r["doc_id"] for r in got] == \
            want["doc_id"].to_pylist()
    finally:
        svc.shutdown()


def test_open_reader_empty_spec_raises():
    from blacklab_ray.query import open_reader
    with pytest.raises(ValueError):
        open_reader("")
    with pytest.raises(ValueError):
        open_reader(",")


def test_partial_annotation_not_advertised(ray_session,
                                           tmp_path_factory):
    """An annotation only SOME subs carry is excluded from
    annotations() and fails fast when queried."""
    from blacklab_ray.sources.synth import generate_pages
    tmp = tmp_path_factory.mktemp("partannot")
    dirs = []
    for i, sens in enumerate((True, False)):
        src = tmp / f"s{i}"
        src.mkdir()
        pq.write_table(generate_pages(12, doc_offset=12 * i),
                       str(src / "p.parquet"))
        idx = str(tmp / f"i{i}")
        build_index(str(src), idx,
                    BuildParams(num_buckets=2, n_salts=1,
                                sensitive=sens))
        dirs.append(idx)
    multi = MultiIndexReader(dirs)
    assert "s" not in multi.annotations()
    assert "i" in multi.annotations()
    with pytest.raises(FileNotFoundError, match="not universal"):
        multi.terms_table_for("s")
    import numpy as np
    with pytest.raises(FileNotFoundError, match="not universal"):
        multi.tokens_at(np.array([0]), np.array([0]), "s")


def test_compact_federation(ray_session, tmp_path_factory):
    """Size-tiered physical compaction: 3 sub-indexes -> 2, results
    identical to the pre-compaction federation (smallest merged into
    second-smallest; the surviving spec still covers every doc)."""
    from blacklab_ray.query.multireader import compact_federation
    from blacklab_ray.sources.synth import generate_pages
    tmp = tmp_path_factory.mktemp("compactfed")
    dirs = []
    for i, n in enumerate((40, 10, 25)):   # deliberately uneven sizes
        src = tmp / f"s{i}"
        src.mkdir()
        pq.write_table(generate_pages(n, doc_offset=100 * i),
                       str(src / "p.parquet"))
        idx = str(tmp / f"i{i}")
        build_index(str(src), idx,
                    BuildParams(num_buckets=2, n_salts=1))
        dirs.append(idx)
    before = search_taat(MultiIndexReader(dirs), ["the"], 10**9)

    kept = compact_federation(dirs, max_indexes=2)
    assert len(kept) == 2
    assert str(tmp / "i1") not in kept   # the 10-doc index was absorbed
    after = search_taat(MultiIndexReader(kept), ["the"], 10**9)
    assert before["doc_id"].to_pylist() == after["doc_id"].to_pylist()
    for g, w in zip(before["score"].to_pylist(),
                    after["score"].to_pylist()):
        assert abs(g - w) < 1e-9
    # compaction to 1 = a plain single index
    (only,) = compact_federation(kept, max_indexes=1)
    solo = search_taat(IndexReader(only), ["the"], 10**9)
    assert before["doc_id"].to_pylist() == solo["doc_id"].to_pylist()


def test_kwic_federated_spec(ray_session, tmp_path_factory):
    """kwic_from_forward_index accepts the comma-dir federation spec
    and windows hits from every sub-index."""
    import pyarrow as pa
    from blacklab_ray.pipelines.hits import kwic_from_forward_index
    tmp = tmp_path_factory.mktemp("kwicfed")
    dirs = []
    for i, text in enumerate(("alpha target beta gamma",
                              "delta epsilon target zeta")):
        src = tmp / f"s{i}"
        src.mkdir()
        pq.write_table(pa.table({
            "doc_id": pa.array([i], pa.int64()),
            "url": [f"u{i}"], "text": [text], "lang": ["en"]}),
            str(src / "p.parquet"))
        idx = str(tmp / f"i{i}")
        build_index(str(src), idx,
                    BuildParams(num_buckets=2, n_salts=1,
                                id_column="doc_id"))
        dirs.append(idx)
    out = kwic_from_forward_index(",".join(dirs), "target",
                                  context=1).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1]
    row0 = out[out["doc_id"] == 0].iloc[0]
    assert row0["left"] == "alpha" and row0["right"] == "beta"
    row1 = out[out["doc_id"] == 1].iloc[0]
    assert row1["left"] == "epsilon" and row1["right"] == "zeta"


def test_federated_content_store(ray_session, tmp_path_factory):
    """usecontent=orig and stored contents work over a federation:
    _stored_texts gathers through the union fwd dataset."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import MultiIndexReader
    from blacklab_ray.server import handle_doc_contents, handle_hits
    tmp = tmp_path_factory.mktemp("fedcs")
    texts = [("d0", "The QUICK fox."), ("d1", "A QUICK dog!")]
    dirs = []
    for i, (u, t) in enumerate(texts):
        src = tmp / f"s{i}"
        src.mkdir()
        pq.write_table(pa.table({"url": [u], "text": [t]}),
                       str(src / "p.parquet"))
        idx = str(tmp / f"i{i}")
        build_index(str(src), idx,
                    BuildParams(num_buckets=2, n_salts=1,
                                store_text=True))
        dirs.append(idx)
    multi = MultiIndexReader(dirs)
    assert handle_doc_contents(multi, "d1") == "A QUICK dog!"
    resp = handle_hits(multi, {"patt": '"quick"',
                               "usecontent": "orig",
                               "wordsaroundhit": "1"})
    matches = {h["docPid"]: h["match"] for h in resp["hits"]}
    assert matches == {"d0": "QUICK", "d1": "QUICK"}
