"""More-like-this (Lucene MoreLikeThis analogue): seed-term selection
and the similarity search checked against the pure-Python corpus
model, plus federation behavior."""

import math

import numpy as np
import pytest

from blacklab_ray.query import IndexReader
from blacklab_ray.query.mlt import more_like_this, seed_terms


@pytest.fixture(scope="module")
def reader(small_index):
    return IndexReader(small_index)


def _oracle_seed_terms(oracle, doc_id, max_terms=25, min_len=2,
                       stop_ratio=0.5):
    df = oracle.doc_freq()
    n = oracle.n_docs
    toks = oracle.docs[doc_id]
    import collections
    tf = collections.Counter(toks)
    scored = []
    for t, c in tf.items():
        if len(t) < min_len or df[t] > stop_ratio * n:
            continue
        idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
        scored.append((-c * idf, t))
    scored.sort()
    return [t for _s, t in scored[:max_terms]]


def test_seed_terms_match_oracle(reader, small_oracle):
    for doc_id in list(small_oracle.docs)[:6]:
        got = seed_terms(reader, doc_id)
        want = _oracle_seed_terms(small_oracle, doc_id)
        assert got == want, doc_id


def test_more_like_this_matches_oracle_topk(reader, small_oracle):
    for doc_id in list(small_oracle.docs)[:4]:
        terms = _oracle_seed_terms(small_oracle, doc_id)
        exp = [(d, s) for d, s in small_oracle.topk(terms, 11)
               if d != doc_id][:10]
        got = more_like_this(reader, doc_id, k=10)
        assert got["doc_id"].to_pylist() == [d for d, _ in exp]
        for g, (_, s) in zip(got["score"].to_pylist(), exp):
            assert abs(g - s) < 1e-9
        assert got["rank"].to_pylist() == \
            list(range(1, got.num_rows + 1))
        assert doc_id not in got["doc_id"].to_pylist()


def test_more_like_this_self_included_when_asked(reader, small_oracle):
    doc_id = next(iter(small_oracle.docs))
    got = more_like_this(reader, doc_id, k=5, exclude_self=False)
    assert doc_id in got["doc_id"].to_pylist()


def test_more_like_this_unknown_doc_raises(reader):
    with pytest.raises(KeyError):
        more_like_this(reader, -12345)


def test_more_like_this_federated(ray_session, tmp_path_factory):
    """MLT over a federation == MLT over the union build (global stats
    make seed idf identical)."""
    import pyarrow.parquet as pq

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import MultiIndexReader
    from blacklab_ray.sources.synth import generate_pages
    tmp = tmp_path_factory.mktemp("mltfed")
    union_src = tmp / "u"
    union_src.mkdir()
    dirs = []
    for i, (off, n) in enumerate([(0, 30), (30, 30)]):
        pages = generate_pages(n, doc_offset=off)
        pq.write_table(pages, str(union_src / f"p{i}.parquet"))
        src = tmp / f"s{i}"
        src.mkdir()
        pq.write_table(pages, str(src / "p.parquet"))
        idx = str(tmp / f"i{i}")
        build_index(str(src), idx, BuildParams(num_buckets=2,
                                               n_salts=1))
        dirs.append(idx)
    union_idx = str(tmp / "ui")
    build_index(str(union_src), union_idx,
                BuildParams(num_buckets=4, n_salts=1))
    multi = MultiIndexReader(dirs)
    union = IndexReader(union_idx)
    seed = int(union.all_doc_ids()[7])
    a = more_like_this(multi, seed, k=8)
    b = more_like_this(union, seed, k=8)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    for g, w in zip(a["score"].to_pylist(), b["score"].to_pylist()):
        assert abs(g - w) < 1e-9


def test_more_like_this_deleted_seed_raises(ray_session,
                                            tmp_path_factory):
    """MLT on a tombstoned doc must KeyError, not rank from the
    deleted content (the fwd rows linger until compaction)."""
    import pyarrow.parquet as pq

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.index.update import delete_documents
    from blacklab_ray.sources.synth import generate_pages
    tmp = tmp_path_factory.mktemp("mltdel")
    src = tmp / "src"
    src.mkdir()
    pq.write_table(generate_pages(30), str(src / "p.parquet"))
    idx = str(tmp / "idx")
    build_index(str(src), idx, BuildParams(num_buckets=2, n_salts=1))
    r = IndexReader(idx)
    doc = int(r.all_doc_ids()[0])
    url = r.urls(np.array([doc], np.int64))[0]
    assert more_like_this(r, doc, k=3).num_rows > 0
    delete_documents(idx, urls=[url])
    r2 = IndexReader(idx)
    with pytest.raises(KeyError):
        more_like_this(r2, doc, k=3)


def test_more_like_this_empty_terms_keeps_url_schema(reader,
                                                     monkeypatch):
    """The all-stopword early return must carry the same schema as
    the non-empty path when resolve_urls is on."""
    import blacklab_ray.query.mlt as mlt_mod
    monkeypatch.setattr(mlt_mod, "seed_terms", lambda *a, **k: [])
    res = mlt_mod.more_like_this(reader, 0, resolve_urls=True)
    assert res.num_rows == 0
    assert res.column_names == ["doc_id", "score", "rank", "url"]
    res2 = mlt_mod.more_like_this(reader, 0, resolve_urls=False)
    assert res2.column_names == ["doc_id", "score", "rank"]


def test_cli_mlt_url_resolves_through_index(ray_session,
                                            tmp_path_factory, capsys):
    """`cli mlt --url` must resolve the seed THROUGH the index (a
    url-filtered gather), not re-derive hash64(url) — which is wrong
    for --id-column builds and collision-remapped ids."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from blacklab_ray import cli
    from blacklab_ray.index import BuildParams, build_index
    tmp = tmp_path_factory.mktemp("mltcli")
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "url": ["u0", "u1", "u2", "u3"],
        "text": ["alpha beta gamma", "alpha beta delta",
                 "gamma delta epsilon", "zeta eta theta"],
    })
    src = tmp / "p.parquet"
    pq.write_table(tbl, str(src))
    idx = str(tmp / "idx")
    build_index(str(src), idx,
                BuildParams(num_buckets=2, n_salts=1,
                            id_column="doc_id"))
    rc = cli.main(["mlt", "--index", idx, "--url", "u0", "-k", "2"])
    assert rc == 0
    rows = [_json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert rows and all(r["doc_id"] != 0 for r in rows)
    assert rows[0]["url"] in {"u1", "u2", "u3"}
