"""63-bit doc-id collision detection + resolution (index/idspace.py).

Real blake2b collisions are unfindable at test scale, so: the pure
resolver is unit-tested with injected weak hashes (forcing primary and
secondary collisions), and the end-to-end paths are driven through
``id_column="doc_id"`` builds with deliberately colliding user ids —
the resolution machinery is id-origin-agnostic (it re-ids by rehashing
the url, the stable identity), so the same code path handles both.
"""

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from blacklab_ray.index import BuildParams, build_index
from blacklab_ray.index.idspace import (
    load_remap, resolve_collisions, resolve_index_doc_ids, salted_url,
)
from blacklab_ray.stages.tokenize import hash64


def _weak(mod):
    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest(), 16) % mod
    return h


# ---------------------------------------------------------------------------
# pure resolver


def test_resolver_basic_deterministic():
    groups = {5: ["b", "a", "c"]}
    used = lambda cands: set()  # noqa: E731
    r1 = resolve_collisions(groups, used, hash_fn=hash64)
    r2 = resolve_collisions(groups, used, hash_fn=hash64)
    assert r1 == r2
    # lexicographically-smallest url keeps the id → only b, c move
    assert set(r1) == {"b", "c"}
    assert r1["b"] == hash64(salted_url("b", 1))
    assert r1["c"] == hash64(salted_url("c", 1))
    assert len({r1["b"], r1["c"]} | {5}) == 3


def test_resolver_secondary_collisions_iterate():
    # weak 16-slot hash: first-level candidates collide with the corpus
    # and each other; the resolver must walk salt levels to a fixed point
    h = _weak(16)
    groups = {h("u0"): sorted(["u0", "u1", "u2", "u3"],)}
    corpus = set(range(8))  # half the id space already occupied

    def used(cands):
        return cands & corpus

    remap = resolve_collisions(groups, used, hash_fn=h)
    assert set(remap) == set(groups[h("u0")]) - {min(groups[h("u0")])}
    ids = list(remap.values())
    assert len(ids) == len(set(ids))           # pairwise distinct
    assert not (set(ids) & corpus)             # none occupied
    assert not (set(ids) & set(groups))        # none equal a base id


def test_resolver_exhaustion_raises():
    h = _weak(2)
    groups = {0: ["a", "b", "c", "d"]}
    with pytest.raises(RuntimeError, match="exhausted"):
        resolve_collisions(groups, lambda c: c & {0, 1}, hash_fn=h)


def test_resolver_incumbent_keeps_id():
    groups = {7: ["aaa", "zzz"]}
    r = resolve_collisions(groups, lambda c: set(), hash_fn=hash64,
                           incumbents={"zzz"})
    # incumbent keeps the id even though "aaa" sorts first
    assert set(r) == {"aaa"}


def test_resolver_two_incumbents_is_an_error():
    groups = {7: ["x", "y"]}
    with pytest.raises(ValueError, match="incumbent"):
        resolve_collisions(groups, lambda c: set(), hash_fn=hash64,
                           incumbents={"x", "y"})


# ---------------------------------------------------------------------------
# end-to-end build


def _pages(ids, urls, texts):
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "url": pa.array(urls, pa.string()),
        "text": pa.array(texts, pa.string()),
    })


@pytest.fixture()
def collided_index(ray_session, tmp_path):
    src = tmp_path / "pages"
    src.mkdir()
    pq.write_table(_pages(
        [5, 5, 7],
        ["a", "b", "c"],
        ["alpha common words here", "bravo common words here",
         "charlie common words here"]),
        str(src / "p.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx, BuildParams(
        num_buckets=4, n_salts=2, id_column="doc_id",
        resolve_doc_ids=True))
    return idx


def test_build_resolves_user_id_collision(collided_index):
    from blacklab_ray.query import IndexReader, search_taat
    remap = load_remap(collided_index)
    # "a" (lexicographically smallest) keeps 5; "b" re-idd by url rehash
    assert set(remap) == {"b"}
    new_b = hash64(salted_url("b", 1))
    assert remap["b"] == new_b
    reader = IndexReader(collided_index)
    assert reader.n_docs == 3
    got_a = search_taat(reader, ["alpha"], 10)["doc_id"].to_pylist()
    got_b = search_taat(reader, ["bravo"], 10)["doc_id"].to_pylist()
    assert got_a == [5]
    assert got_b == [new_b]
    # both docs contribute separate postings to the shared term
    got_all = search_taat(reader, ["common"], 10)["doc_id"].to_pylist()
    assert set(got_all) == {5, new_b, 7}
    # the manifest recorded the resolution stage
    import json
    with open(os.path.join(collided_index, "manifest.json")) as f:
        st = json.load(f)["stages"]["doc_ids"]
    assert st["n_remapped"] == 1 and st["rows_rewritten"] == 1


def test_resolution_idempotent(collided_index):
    info = resolve_index_doc_ids(collided_index)
    assert info == {"n_collision_groups": 0, "n_remapped": 0,
                    "rows_rewritten": 0}
    # the persisted remap survives the no-op re-run
    assert set(load_remap(collided_index)) == {"b"}


def test_delete_by_url_uses_remap(collided_index):
    from blacklab_ray.index.update import delete_documents
    from blacklab_ray.query import IndexReader, search_taat
    delete_documents(collided_index, urls=["b"])
    reader = IndexReader(collided_index)
    assert search_taat(reader, ["bravo"], 10).num_rows == 0
    got = search_taat(reader, ["common"], 10)["doc_id"].to_pylist()
    assert set(got) == {5, 7}


def test_no_collision_is_a_noop(ray_session, tmp_path):
    src = tmp_path / "pages"
    src.mkdir()
    pq.write_table(_pages([1, 2], ["a", "b"],
                          ["one text", "two text"]),
                   str(src / "p.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx, BuildParams(
        num_buckets=4, n_salts=2, id_column="doc_id",
        resolve_doc_ids=True))
    assert load_remap(idx) == {}
    assert not os.path.exists(os.path.join(idx, "id_remap.json"))


def test_incremental_add_incumbent_keeps_id(ray_session, tmp_path):
    from blacklab_ray.index.update import add_documents
    from blacklab_ray.query import IndexReader, search_taat
    src = tmp_path / "pages"
    src.mkdir()
    pq.write_table(_pages([1, 2], ["a", "b"],
                          ["alpha shared", "bravo shared"]),
                   str(src / "p.parquet"))
    idx = str(tmp_path / "idx")
    params = BuildParams(num_buckets=4, n_salts=2, id_column="doc_id",
                         resolve_doc_ids=True)
    build_index(str(src), idx, params)

    extra = tmp_path / "extra"
    extra.mkdir()
    # url "0c" collides with incumbent "a" on id 1 AND sorts before it —
    # the incumbent rule (not lexicographic order) must decide
    pq.write_table(_pages([1], ["0c"], ["charlie shared"]),
                   str(extra / "e.parquet"))
    add_documents(idx, str(extra), params)

    remap = load_remap(idx)
    assert set(remap) == {"0c"}
    new_c = hash64(salted_url("0c", 1))
    reader = IndexReader(idx)
    assert reader.n_docs == 3
    assert search_taat(reader, ["alpha"], 10)["doc_id"].to_pylist() == [1]
    assert search_taat(reader, ["charlie"], 10)["doc_id"].to_pylist() \
        == [new_c]
    got = search_taat(reader, ["shared"], 10)["doc_id"].to_pylist()
    assert set(got) == {1, 2, new_c}
