"""Incremental index maintenance: add / delete / update documents."""

import os

import pyarrow.parquet as pq
import pytest

from blacklab_ray.index import BuildParams, build_index
from blacklab_ray.index.update import (
    add_documents, delete_documents, update_documents,
)
from blacklab_ray.query import IndexReader, search_taat
from blacklab_ray.stages.tokenize import hash64
from blacklab_ray.testoracle import CorpusOracle


@pytest.fixture()
def incremental_index(ray_session, tmp_path):
    from blacklab_ray.sources.synth import generate_pages
    src = tmp_path / "pages"
    src.mkdir()
    pq.write_table(generate_pages(80), str(src / "base.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx, BuildParams(num_buckets=4, n_salts=2))
    return idx


def test_add_documents_matches_full_rebuild(incremental_index, tmp_path,
                                            ray_session):
    import pyarrow as pa

    from blacklab_ray.sources.synth import generate_pages
    extra = generate_pages(40, doc_offset=80)
    extra_dir = tmp_path / "extra"
    extra_dir.mkdir()
    pq.write_table(extra, str(extra_dir / "e.parquet"))
    rec = add_documents(incremental_index, str(extra_dir),
                        BuildParams(num_buckets=4, n_salts=2))
    assert rec["op"] == "add" and rec["postings"] > 0

    # oracle over the union corpus
    full = pa.concat_tables([generate_pages(120)])
    oracle = CorpusOracle.from_pages(full)
    reader = IndexReader(incremental_index)
    assert reader.n_docs == 120
    for terms in (["the"], ["the", "w000010"], ["w000123"]):
        exp = oracle.topk(terms, 15)
        got = search_taat(reader, terms, 15)
        assert got["doc_id"].to_pylist() == [d for d, _ in exp]
        for g, (_, s) in zip(got["score"].to_pylist(), exp):
            assert abs(g - s) < 1e-9
    # term stats equal the union's
    terms_tbl = pq.read_table(os.path.join(incremental_index, "terms"))
    df = dict(zip(terms_tbl["term"].to_pylist(),
                  terms_tbl["doc_freq"].to_pylist()))
    assert df == oracle.doc_freq()


def test_delete_documents_tombstones(incremental_index, ray_session):
    from blacklab_ray.sources.synth import generate_pages
    pages = generate_pages(80)
    urls = pages["url"].to_pylist()
    victim_urls = urls[:10]
    delete_documents(incremental_index, urls=victim_urls)
    reader = IndexReader(incremental_index)
    victims = {hash64(u) for u in victim_urls}
    res = search_taat(reader, ["the"], k=10**9)
    assert not victims & set(res["doc_id"].to_pylist())
    # WAND path honors tombstones too
    from blacklab_ray.query import search_wand
    res_w = search_wand(reader, ["the", "of"], k=10**9)
    assert not victims & set(res_w["doc_id"].to_pylist())
    # phrase + counts
    from blacklab_ray.query.engine import count_hits
    c = count_hits(reader, ["the"])
    oracle = CorpusOracle.from_pages(pages)
    live_df = sum(1 for did, toks in oracle.docs.items()
                  if "the" in toks and did not in victims)
    assert c["n_docs"][0].as_py() == live_df


def test_update_documents_replaces_content(incremental_index, ray_session):
    import pyarrow as pa

    from blacklab_ray.sources.synth import generate_pages
    pages = generate_pages(80)
    url0 = pages["url"][0].as_py()
    new_text = "zzzupdated content only here"
    new_tbl = pa.table({
        "url": pa.array([url0], pa.string()),
        "warc_ts": pa.array([0], pa.timestamp("us")),
        "html": pa.array([new_text.encode()], pa.binary()),
        "text": pa.array([new_text], pa.string()),
        "lang": pa.array(["en"], pa.string()),
    })
    update_documents(incremental_index, new_tbl,
                     BuildParams(num_buckets=4, n_salts=2))
    reader = IndexReader(incremental_index)
    # old doc id is tombstoned; new content findable
    res = search_taat(reader, ["zzzupdated"], 10, resolve_urls=True)
    assert res.num_rows == 1
    assert res["url"][0].as_py() == f"{url0}@g1"
    assert hash64(url0) in reader.tombstones


def test_compact_folds_tombstones(incremental_index, ray_session):
    from blacklab_ray.index.update import compact_index
    from blacklab_ray.sources.synth import generate_pages
    pages = generate_pages(80)
    urls = pages["url"].to_pylist()
    delete_documents(incremental_index, urls=urls[:15])
    rec = compact_index(incremental_index,
                        BuildParams(num_buckets=4, n_salts=2))
    assert rec["removed"] == 15
    reader = IndexReader(incremental_index)
    assert not reader.tombstones
    assert reader.n_docs == 65  # stats exact again
    # results equal an oracle over the surviving docs
    import pyarrow as pa
    keep = pa.compute.invert(pa.compute.is_in(
        pages["url"], value_set=pa.array(urls[:15])))
    survivors = pages.filter(keep)
    oracle = CorpusOracle.from_pages(survivors)
    res = search_taat(reader, ["the"], 10)
    exp = oracle.topk(["the"], 10)
    assert res["doc_id"].to_pylist() == [d for d, _ in exp]
    for g, (_, s) in zip(res["score"].to_pylist(), exp):
        assert abs(g - s) < 1e-9


def test_add_documents_inherits_layout(incremental_index, tmp_path,
                                       ray_session):
    """ADVICE fix: an add run with caller-default BuildParams (32
    buckets) on a 4-bucket base index must inherit the recorded layout —
    otherwise the new segments land under a modulus the reader prunes
    away and the added docs are silently unsearchable."""
    from blacklab_ray.sources.synth import generate_pages
    extra = generate_pages(20, doc_offset=200)
    extra_dir = tmp_path / "extra2"
    extra_dir.mkdir()
    pq.write_table(extra, str(extra_dir / "e.parquet"))
    add_documents(incremental_index, str(extra_dir))  # defaults on purpose
    reader = IndexReader(incremental_index)
    assert reader.n_docs == 100
    new_urls = set(extra["url"].to_pylist())
    new_ids = {hash64(u) for u in new_urls}
    res = search_taat(reader, ["the"], k=10**9)
    assert new_ids & set(res["doc_id"].to_pylist())


def test_add_documents_on_sort_built_index(tmp_path, ray_session):
    """ADVICE fix: exchange='sort' builds write no terms_parts;
    add_documents must backfill them so base-corpus terms survive the
    terms-table refresh."""
    import pyarrow as pa

    from blacklab_ray.sources.synth import generate_pages
    src = tmp_path / "pages"
    src.mkdir()
    pq.write_table(generate_pages(60), str(src / "base.parquet"))
    idx = str(tmp_path / "idx_sort")
    build_index(str(src), idx,
                BuildParams(num_buckets=4, n_salts=2, exchange="sort"))
    extra = generate_pages(30, doc_offset=60)
    extra_dir = tmp_path / "extra3"
    extra_dir.mkdir()
    pq.write_table(extra, str(extra_dir / "e.parquet"))
    add_documents(idx, str(extra_dir))
    oracle = CorpusOracle.from_pages(pa.concat_tables(
        [generate_pages(90)]))
    terms_tbl = pq.read_table(os.path.join(idx, "terms"))
    df = dict(zip(terms_tbl["term"].to_pylist(),
                  terms_tbl["doc_freq"].to_pylist()))
    assert df == oracle.doc_freq()


def test_delete_by_url_covers_updated_generations(incremental_index,
                                                  ray_session):
    """ADVICE fix: after update_documents, delete by the ORIGINAL url
    must also tombstone the generation-salted live re-add."""
    import pyarrow as pa

    from blacklab_ray.sources.synth import generate_pages
    pages = generate_pages(80)
    url0 = pages["url"][0].as_py()
    new_text = "qqqreplacement text body"
    new_tbl = pa.table({
        "url": pa.array([url0], pa.string()),
        "warc_ts": pa.array([0], pa.timestamp("us")),
        "html": pa.array([new_text.encode()], pa.binary()),
        "text": pa.array([new_text], pa.string()),
        "lang": pa.array(["en"], pa.string()),
    })
    update_documents(incremental_index, new_tbl,
                     BuildParams(num_buckets=4, n_salts=2))
    delete_documents(incremental_index, urls=[url0])
    reader = IndexReader(incremental_index)
    res = search_taat(reader, ["qqqreplacement"], 10)
    assert res.num_rows == 0


def test_doc_id_collision_audit(tmp_path, ray_session):
    """verify_doc_ids flags duplicate urls (same 63-bit id) at build."""
    import pyarrow as pa
    import ray.data

    from blacklab_ray.index.build import check_doc_id_collisions
    from blacklab_ray.sources.synth import generate_pages
    pages = generate_pages(20)
    src = tmp_path / "pages"
    src.mkdir()
    pq.write_table(pages, str(src / "p.parquet"))
    idx = str(tmp_path / "idx_ok")
    build_index(str(src), idx, BuildParams(num_buckets=4, n_salts=2,
                                           verify_doc_ids=True))
    assert check_doc_id_collisions(os.path.join(idx, "fwd")) == 0

    dup = pa.concat_tables([pages, pages.slice(0, 3)])
    idx2 = str(tmp_path / "idx_dup")
    with pytest.raises(RuntimeError, match="collision"):
        build_index(ray.data.from_arrow(dup), idx2,
                    BuildParams(num_buckets=4, n_salts=2,
                                verify_doc_ids=True))


def test_compact_generations_tiered(tmp_path, ray_session):
    """Size-tiered merge: many generation part files collapse to one
    per bucket, tombstones fold in, and results equal a full oracle
    over the surviving corpus."""
    import os as _os

    import pyarrow as pa

    from blacklab_ray.index.update import compact_generations
    from blacklab_ray.query import search_wand
    from blacklab_ray.sources.synth import generate_pages
    src_dir = tmp_path / "pages"
    src_dir.mkdir()
    pq.write_table(generate_pages(60), str(src_dir / "base.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src_dir), idx, BuildParams(num_buckets=4, n_salts=2))
    # three generations of adds -> many part files per bucket
    for g in range(3):
        extra = generate_pages(30, doc_offset=100 + g * 30)
        d = tmp_path / f"extra{g}"
        d.mkdir()
        pq.write_table(extra, str(d / "e.parquet"))
        add_documents(idx, str(d))
    # delete a few docs from the base
    pages = generate_pages(60)
    victims = pages["url"].to_pylist()[:8]
    delete_documents(idx, urls=victims)
    before_files = sum(
        len([f for f in _os.listdir(_os.path.join(idx, "postings", b))
             if f.endswith(".parquet")])
        for b in _os.listdir(_os.path.join(idx, "postings")))
    rec = compact_generations(idx, max_files_per_bucket=1)
    after_files = sum(
        len([f for f in _os.listdir(_os.path.join(idx, "postings", b))
             if f.endswith(".parquet")])
        for b in _os.listdir(_os.path.join(idx, "postings")))
    assert rec["buckets_merged"] == 4
    assert after_files == 4 < before_files
    # correctness: equal to an oracle over the union minus victims
    all_pages = pa.concat_tables(
        [generate_pages(60)]
        + [generate_pages(30, doc_offset=100 + g * 30)
           for g in range(3)])
    keep = pa.compute.invert(pa.compute.is_in(
        all_pages["url"], value_set=pa.array(victims)))
    survivors = all_pages.filter(keep)
    oracle = CorpusOracle.from_pages(survivors)
    reader = IndexReader(idx)
    assert not reader.tombstones
    assert reader.n_docs == survivors.num_rows
    terms_tbl = pq.read_table(_os.path.join(idx, "terms"))
    df = dict(zip(terms_tbl["term"].to_pylist(),
                  terms_tbl["doc_freq"].to_pylist()))
    assert df == oracle.doc_freq()
    for terms in (["the"], ["the", "w000010"], ["w000123", "of"]):
        exp = oracle.topk(terms, 15)
        got = search_taat(reader, terms, 15)
        assert got["doc_id"].to_pylist() == [d for d, _ in exp]
        for gv, (_, s) in zip(got["score"].to_pylist(), exp):
            assert abs(gv - s) < 1e-9
    w = search_wand(reader, ["the", "of"], 10)
    t = search_taat(reader, ["the", "of"], 10)
    assert w["doc_id"].to_pylist() == t["doc_id"].to_pylist()


def test_merge_indexes_matches_full_rebuild(tmp_path, ray_session):
    """IndexWriter.addIndexes analogue: two independently built indexes
    merge into one that scores identically to a single union build —
    without re-tokenizing the source corpus."""
    from blacklab_ray.index.update import compact_index, merge_indexes
    from blacklab_ray.sources.synth import generate_pages
    a_src, b_src = tmp_path / "a_src", tmp_path / "b_src"
    a_src.mkdir(); b_src.mkdir()
    pq.write_table(generate_pages(70), str(a_src / "p.parquet"))
    pq.write_table(generate_pages(50, doc_offset=70),
                   str(b_src / "p.parquet"))
    a_idx, b_idx = str(tmp_path / "a_idx"), str(tmp_path / "b_idx")
    build_index(str(a_src), a_idx, BuildParams(num_buckets=4, n_salts=2))
    # deliberately DIFFERENT layout on the source index — the merge
    # re-exchanges into the destination's layout
    build_index(str(b_src), b_idx, BuildParams(num_buckets=2, n_salts=1))

    rec = merge_indexes(a_idx, b_idx)
    assert rec["op"] == "merge" and rec["postings"] > 0

    oracle = CorpusOracle.from_pages(generate_pages(120))
    reader = IndexReader(a_idx)
    assert reader.n_docs == 120
    for terms in (["the"], ["the", "w000010"], ["w000123"]):
        exp = oracle.topk(terms, 15)
        got = search_taat(reader, terms, 15)
        assert got["doc_id"].to_pylist() == [d for d, _ in exp]
        for g, (_, s) in zip(got["score"].to_pylist(), exp):
            assert abs(g - s) < 1e-9
    terms_tbl = pq.read_table(os.path.join(a_idx, "terms"))
    df = dict(zip(terms_tbl["term"].to_pylist(),
                  terms_tbl["doc_freq"].to_pylist()))
    assert df == oracle.doc_freq()
    # merged generations compact like any add
    compact_index(a_idx)
    reader2 = IndexReader(a_idx)
    got2 = search_taat(reader2, ["the"], 15)
    exp2 = oracle.topk(["the"], 15)
    assert got2["doc_id"].to_pylist() == [d for d, _ in exp2]


def test_merge_indexes_source_tombstones_dropped(tmp_path, ray_session):
    from blacklab_ray.index.update import merge_indexes
    from blacklab_ray.sources.synth import generate_pages
    a_src, b_src = tmp_path / "a_src", tmp_path / "b_src"
    a_src.mkdir(); b_src.mkdir()
    pq.write_table(generate_pages(40), str(a_src / "p.parquet"))
    b_pages = generate_pages(40, doc_offset=40)
    pq.write_table(b_pages, str(b_src / "p.parquet"))
    a_idx, b_idx = str(tmp_path / "a_idx"), str(tmp_path / "b_idx")
    build_index(str(a_src), a_idx, BuildParams(num_buckets=4, n_salts=2))
    build_index(str(b_src), b_idx, BuildParams(num_buckets=4, n_salts=2))
    victims = b_pages["url"].to_pylist()[:5]
    delete_documents(b_idx, urls=victims)
    merge_indexes(a_idx, b_idx)
    reader = IndexReader(a_idx)
    assert reader.n_docs == 75  # source deletes never arrive
    dead = {hash64(u) for u in victims}
    res = search_taat(reader, ["the"], k=10**9)
    assert not dead & set(res["doc_id"].to_pylist())


def test_merge_indexes_incompatible_analysis(tmp_path, ray_session):
    from blacklab_ray.index.update import merge_indexes
    from blacklab_ray.sources.synth import generate_pages
    import pytest as _pytest
    a_src, b_src = tmp_path / "a_src", tmp_path / "b_src"
    a_src.mkdir(); b_src.mkdir()
    pq.write_table(generate_pages(10), str(a_src / "p.parquet"))
    pq.write_table(generate_pages(10, doc_offset=10),
                   str(b_src / "p.parquet"))
    a_idx, b_idx = str(tmp_path / "a_idx"), str(tmp_path / "b_idx")
    build_index(str(a_src), a_idx, BuildParams(num_buckets=2, n_salts=1))
    build_index(str(b_src), b_idx,
                BuildParams(num_buckets=2, n_salts=1,
                            analyzer="whitespace"))
    with _pytest.raises(ValueError, match="analyzer"):
        merge_indexes(a_idx, b_idx)


def test_merge_indexes_imports_src_remap(tmp_path, ray_session):
    """Collision-remap entries from the source survive the merge so
    delete/update-by-url keeps addressing remapped merged docs."""
    from blacklab_ray.index.idspace import load_remap, save_remap
    from blacklab_ray.index.update import merge_indexes
    from blacklab_ray.sources.synth import generate_pages
    a_src, b_src = tmp_path / "a_src", tmp_path / "b_src"
    a_src.mkdir(); b_src.mkdir()
    pq.write_table(generate_pages(15), str(a_src / "p.parquet"))
    pq.write_table(generate_pages(15, doc_offset=15),
                   str(b_src / "p.parquet"))
    a_idx, b_idx = str(tmp_path / "a_idx"), str(tmp_path / "b_idx")
    build_index(str(a_src), a_idx, BuildParams(num_buckets=2, n_salts=1))
    build_index(str(b_src), b_idx, BuildParams(num_buckets=2, n_salts=1))
    # simulate a prior collision resolution on the source
    save_remap(b_idx, {"https://remapped.example/x": 424242})
    # plus one whose doc was deleted in src (must NOT be imported)
    from blacklab_ray.index.update import delete_documents as _del
    _del(b_idx, doc_ids=[555])
    save_remap(b_idx, {"https://remapped.example/x": 424242,
                       "https://dead.example/y": 555})
    merge_indexes(a_idx, b_idx)
    got = load_remap(a_idx)
    assert got.get("https://remapped.example/x") == 424242
    assert "https://dead.example/y" not in got


def test_merge_indexes_resurrects_dst_tombstoned_url(tmp_path,
                                                     ray_session):
    """src re-indexed a url that dst had deleted: the merged copy must
    be SEARCHABLE (generation-salted re-add), while dst's own deleted
    fwd rows stay hidden; a later delete-by-url removes it again."""
    import pyarrow as pa

    from blacklab_ray.index.update import merge_indexes
    from blacklab_ray.sources.synth import generate_pages
    a_src, b_src = tmp_path / "a_src", tmp_path / "b_src"
    a_src.mkdir(); b_src.mkdir()
    pages = generate_pages(30)
    pq.write_table(pages, str(a_src / "p.parquet"))
    # source: 10 fresh docs PLUS a re-index of dst's first url
    extra = generate_pages(10, doc_offset=30)
    shared = pages.slice(0, 1)
    pq.write_table(pa.concat_tables([extra, shared]),
                   str(b_src / "p.parquet"))
    a_idx, b_idx = str(tmp_path / "a_idx"), str(tmp_path / "b_idx")
    build_index(str(a_src), a_idx, BuildParams(num_buckets=2, n_salts=1))
    build_index(str(b_src), b_idx, BuildParams(num_buckets=2, n_salts=1))
    victim = pages["url"][0].as_py()
    delete_documents(a_idx, urls=[victim])
    rec = merge_indexes(a_idx, b_idx)
    reader = IndexReader(a_idx)
    # 30 - 1 deleted + 10 fresh + 1 resurrected
    assert reader.n_docs == 41, rec
    res = search_taat(reader, ["the"], k=10**9)
    ids = set(res["doc_id"].to_pylist())
    assert hash64(victim) not in ids          # dst's copy stays dead
    assert hash64(f"{victim}@g1") in ids      # src's copy is live
    # delete-by-url reaches the salted generation too
    delete_documents(a_idx, urls=[victim])
    reader2 = IndexReader(a_idx)
    res2 = search_taat(reader2, ["the"], k=10**9)
    assert hash64(f"{victim}@g1") not in set(res2["doc_id"].to_pylist())


def test_merge_indexes_retry_after_partial_crash(tmp_path, ray_session):
    """Stale merge-g{gen}-* partials from a crashed attempt are swept
    before re-linking, so a retry succeeds and counts nothing twice."""
    import shutil

    from blacklab_ray.index.update import merge_indexes
    from blacklab_ray.sources.synth import generate_pages
    a_src, b_src = tmp_path / "a_src", tmp_path / "b_src"
    a_src.mkdir(); b_src.mkdir()
    pq.write_table(generate_pages(20), str(a_src / "p.parquet"))
    pq.write_table(generate_pages(20, doc_offset=20),
                   str(b_src / "p.parquet"))
    a_idx, b_idx = str(tmp_path / "a_idx"), str(tmp_path / "b_idx")
    build_index(str(a_src), a_idx, BuildParams(num_buckets=2, n_salts=1))
    build_index(str(b_src), b_idx, BuildParams(num_buckets=2, n_salts=1))
    # fake a crashed attempt: one already-linked partial for gen 1
    src_f = next(f for f in os.listdir(os.path.join(b_idx, "fwd"))
                 if f.endswith(".parquet"))
    shutil.copy(os.path.join(b_idx, "fwd", src_f),
                os.path.join(a_idx, "fwd", f"merge-g1-{src_f}"))
    merge_indexes(a_idx, b_idx)
    reader = IndexReader(a_idx)
    assert reader.n_docs == 40   # not 60 — the stale partial was swept
    oracle = CorpusOracle.from_pages(generate_pages(40))
    exp = oracle.topk(["the"], 10)
    got = search_taat(reader, ["the"], 10)
    assert got["doc_id"].to_pylist() == [d for d, _ in exp]


def test_merge_indexes_incompatible_metadata_fields(tmp_path,
                                                    ray_session):
    import pytest as _pytest

    from blacklab_ray.index.update import merge_indexes
    from blacklab_ray.sources.synth import generate_pages
    a_src, b_src = tmp_path / "a_src", tmp_path / "b_src"
    a_src.mkdir(); b_src.mkdir()
    pq.write_table(generate_pages(8), str(a_src / "p.parquet"))
    pq.write_table(generate_pages(8, doc_offset=8),
                   str(b_src / "p.parquet"))
    a_idx, b_idx = str(tmp_path / "a_idx"), str(tmp_path / "b_idx")
    build_index(str(a_src), a_idx, BuildParams(
        num_buckets=2, n_salts=1,
        metadata_fields=(("lang", "untokenized"),)))
    build_index(str(b_src), b_idx, BuildParams(num_buckets=2, n_salts=1))
    with _pytest.raises(ValueError, match="metadata_fields"):
        merge_indexes(a_idx, b_idx)


def test_delete_by_url_id_column_index(ray_session, tmp_path_factory):
    """delete-by-url on an --id-column build must resolve urls
    THROUGH the index (pushdown fwd gather), not via hash64(url) —
    which names ids that don't exist there (silent no-op)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.index.update import delete_documents
    from blacklab_ray.query import IndexReader
    tmp = tmp_path_factory.mktemp("delidcol")
    tbl = pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "url": ["a", "b", "c"],
        "text": ["alpha beta", "beta gamma", "gamma delta"],
    })
    src = tmp / "p.parquet"
    pq.write_table(tbl, str(src))
    idx = str(tmp / "idx")
    build_index(str(src), idx,
                BuildParams(num_buckets=2, n_salts=1,
                            id_column="doc_id"))
    delete_documents(idx, urls=["b"])
    r = IndexReader(idx)
    assert 11 in r.tombstones
    mask = r.mask_tombstones(np.array([10, 11, 12], np.int64))
    assert mask.tolist() == [True, False, True]
    # deleted doc no longer matches queries
    from blacklab_ray.query.engine import search
    res = search(r, ["gamma"], k=10)
    assert 11 not in res["doc_id"].to_pylist()


def test_merge_indexes_incompatible_store_text(tmp_path, ray_session):
    """store_text is fwd-schema-shaping: merging a content-store index
    into a store-less one would split the fwd schema — rejected."""
    import pyarrow.parquet as pq
    import pytest as _pytest

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.index.update import merge_indexes
    from blacklab_ray.sources.synth import generate_pages
    a_src = tmp_path / "a"
    b_src = tmp_path / "b"
    a_src.mkdir(); b_src.mkdir()
    pq.write_table(generate_pages(10), str(a_src / "p.parquet"))
    pq.write_table(generate_pages(10, doc_offset=10),
                   str(b_src / "p.parquet"))
    a_idx = str(tmp_path / "ai")
    b_idx = str(tmp_path / "bi")
    build_index(str(a_src), a_idx,
                BuildParams(num_buckets=2, n_salts=1, store_text=True))
    build_index(str(b_src), b_idx, BuildParams(num_buckets=2, n_salts=1))
    with _pytest.raises(ValueError, match="store_text"):
        merge_indexes(a_idx, b_idx)


def test_sync_snapshot_store_text(ray_session, tmp_path):
    """sync_snapshot brings a store_text index in line with a new
    snapshot: removed docs stop matching, changed docs re-index under
    the new content, added docs appear — old side derived from the
    index's own content store."""
    import pyarrow as pa
    import ray.data

    from blacklab_ray.index.update import sync_snapshot
    from blacklab_ray.query import IndexReader
    from blacklab_ray.query.engine import search

    old = pa.table({
        "url": ["a", "b", "c"],
        "text": ["alpha words here", "bravo words there",
                 "charlie words gone"],
    })
    src = tmp_path / "old"
    src.mkdir()
    pq.write_table(old, str(src / "p.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx,
                BuildParams(num_buckets=2, n_salts=1,
                            store_text=True))
    new = pa.table({
        "url": ["a", "b", "d"],
        "text": ["alpha words here",              # unchanged
                 "bravo NEWTEXT there",           # changed
                 "delta fresh content"],          # added; c removed
    })
    rec = sync_snapshot(idx, ray.data.from_arrow(new))
    assert (rec["removed"], rec["changed"], rec["added"]) == (1, 1, 1)
    r = IndexReader(idx)

    def hits(term):
        res = search(r, [term], k=10, resolve_urls=True)
        return set(res["url"].to_pylist())

    assert hits("charlie") == set()               # removed
    nt = hits("newtext")                          # changed, regen'd
    assert len(nt) == 1 and next(iter(nt)).startswith("b@g")
    assert hits("bravo") == nt
    assert hits("delta") == {"d"}                 # added
    assert hits("alpha") == {"a"}                 # untouched
    # a second sync against the SAME snapshot is a no-op... except the
    # generation-salted re-add diffs as removed+added (documented);
    # everything still matches afterwards
    rec2 = sync_snapshot(idx, ray.data.from_arrow(new))
    r2 = IndexReader(idx)
    res = search(r2, ["newtext"], k=10, resolve_urls=True)
    assert res.num_rows == 1


def test_lifecycle_differential_fuzz(ray_session, tmp_path):
    """Randomized op sequences (add / delete-by-url / update /
    compact) applied incrementally answer queries identically to a
    FROM-SCRATCH build of the equivalent final corpus — the
    generation-salting / tombstone / compaction machinery has no
    order-dependent state (updated docs live under salted urls, so
    comparison keys are @g-stripped urls, and sequences end with a
    compact so deleted docs leave the stats like the pinned
    deletes-count-until-merge semantics)."""
    import re as _re

    import numpy as np
    import pyarrow as pa

    from blacklab_ray.index.update import compact_generations
    from blacklab_ray.sources.synth import generate_pages

    def strip_gen(u):
        return _re.sub(r"@g\d+$", "", u)

    for seed in (5, 19):
        rng = np.random.default_rng(seed)
        root = tmp_path / f"fz{seed}"
        root.mkdir()
        src = root / "base"
        src.mkdir()
        base = generate_pages(50, doc_offset=9000 + seed * 100)
        pq.write_table(base, str(src / "b.parquet"))
        idx = str(root / "idx")
        build_index(str(src), idx, BuildParams(num_buckets=4,
                                               n_salts=2))
        model = {r["url"]: r for r in base.to_pylist()}
        next_off = 9000 + seed * 100 + 50
        for step in range(5):
            op = rng.choice(["add", "delete", "update", "compact"])
            if op == "add":
                extra = generate_pages(15, doc_offset=next_off)
                next_off += 15
                d = root / f"a{step}"
                d.mkdir()
                pq.write_table(extra, str(d / "e.parquet"))
                add_documents(idx, str(d),
                              BuildParams(num_buckets=4, n_salts=2))
                model.update({r["url"]: r
                              for r in extra.to_pylist()})
            elif op == "delete" and len(model) > 10:
                urls = sorted(model)
                pick = [urls[int(i)] for i in
                        rng.choice(len(urls), size=5, replace=False)]
                delete_documents(idx, urls=[strip_gen(u)
                                            for u in pick])
                for u in pick:
                    del model[u]
            elif op == "update" and len(model) > 10:
                urls = sorted(model)
                pick = [urls[int(i)] for i in
                        rng.choice(len(urls), size=4, replace=False)]
                rows = []
                for u in pick:
                    r = dict(model[u])
                    base_u = strip_gen(u)
                    r["url"] = base_u
                    r["text"] = r["text"] + f" updated{step} the"
                    rows.append(r)
                    del model[u]
                    model[base_u] = r
                update_documents(idx, pa.Table.from_pylist(rows),
                                 BuildParams(num_buckets=4,
                                             n_salts=2))
            else:
                compact_generations(idx)
        compact_generations(idx)

        # fresh rebuild of the equivalent corpus
        ref_src = root / "ref"
        ref_src.mkdir()
        ref_rows = []
        for u, r in model.items():
            rr = dict(r)
            rr["url"] = strip_gen(u)
            ref_rows.append(rr)
        pq.write_table(pa.Table.from_pylist(ref_rows),
                       str(ref_src / "r.parquet"))
        ref_idx = str(root / "ref_idx")
        build_index(str(ref_src), ref_idx,
                    BuildParams(num_buckets=4, n_salts=2))

        inc = IndexReader(idx)
        ref = IndexReader(ref_idx)
        assert inc.n_docs == ref.n_docs == len(model)
        for terms in (["the"], ["the", "of"]):
            gi = search_taat(inc, terms, 25)
            gr = search_taat(ref, terms, 25)
            mi = sorted((strip_gen(u), round(s, 9)) for u, s in
                        zip(inc.urls(gi["doc_id"].to_numpy()),
                            gi["score"].to_pylist()))
            mr = sorted((u, round(s, 9)) for u, s in
                        zip(ref.urls(gr["doc_id"].to_numpy()),
                            gr["score"].to_pylist()))
            assert mi == mr, (seed, terms)
        # dictionary stats agree post-compaction
        ti = pq.read_table(os.path.join(idx, "terms"))
        tr = pq.read_table(os.path.join(ref_idx, "terms"))
        di = dict(zip(ti["term"].to_pylist(),
                      ti["doc_freq"].to_pylist()))
        dr = dict(zip(tr["term"].to_pylist(),
                      tr["doc_freq"].to_pylist()))
        assert di == dr, seed
