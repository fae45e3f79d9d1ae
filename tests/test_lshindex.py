"""Persisted MinHash-LSH index (pipelines/lshindex.py): build once,
probe new shards against the stored state without re-reading the
indexed text. Uses the planted-duplicate corpus from
test_dedup_recall — ids 60-64 are exact copies of 0-4, ids 65-69 are
one-token-changed near-dups of 5-9."""

import numpy as np
import pyarrow as pa
import pytest

from tests.test_dedup_recall import _docs_with_planted_dups


def _split(table: pa.Table, lo: int, hi: int) -> pa.Table:
    ids = table.column("doc_id").to_numpy(zero_copy_only=False)
    return table.filter(pa.array((ids >= lo) & (ids < hi)))


@pytest.fixture(scope="module")
def corpus():
    return _docs_with_planted_dups()


def test_build_probe_finds_planted(ray_session, tmp_path_factory, corpus):
    import ray.data

    from blacklab_ray.pipelines.lshindex import (build_minhash_index,
                                                 probe_minhash_index)
    idx = str(tmp_path_factory.mktemp("lshidx"))
    stats = build_minhash_index(
        ray.data.from_arrow(_split(corpus, 0, 60)), idx)
    assert stats["n_docs"] == 60
    out = probe_minhash_index(
        ray.data.from_arrow(_split(corpus, 60, 70)), idx, threshold=0.8)
    pairs = set(zip(out["doc_id"].to_pylist(),
                    out["index_doc_id"].to_pylist()))
    # exact copies must all surface with jaccard 1.0
    for i in range(5):
        assert (60 + i, i) in pairs, pairs
    j = dict(zip(zip(out["doc_id"].to_pylist(),
                     out["index_doc_id"].to_pylist()),
                 out["jaccard"].to_pylist()))
    assert all(j[(60 + i, i)] == 1.0 for i in range(5))
    # near-dups: >= 4/5 recall (banded LSH is probabilistic)
    near = sum((65 + k, 5 + k) in pairs for k in range(5))
    assert near >= 4, pairs
    # nothing pairs with the unrelated random docs
    assert all(b == a - 60 for a, b in pairs)


def test_append_then_probe(ray_session, tmp_path_factory, corpus):
    """Incremental ingest: index halves added in two appends behave
    like one build; probe state never saw the first half's text again."""
    import ray.data

    from blacklab_ray.pipelines.lshindex import (append_minhash_index,
                                                 build_minhash_index,
                                                 probe_minhash_index)
    idx = str(tmp_path_factory.mktemp("lshidx_app"))
    build_minhash_index(ray.data.from_arrow(_split(corpus, 0, 30)), idx)
    append_minhash_index(ray.data.from_arrow(_split(corpus, 30, 60)), idx)
    out = probe_minhash_index(
        ray.data.from_arrow(_split(corpus, 60, 70)), idx, threshold=0.8)
    pairs = set(zip(out["doc_id"].to_pylist(),
                    out["index_doc_id"].to_pylist()))
    for i in range(5):
        assert (60 + i, i) in pairs, pairs


def test_probe_multiblock_partitions(ray_session, tmp_path_factory,
                                     corpus):
    """The r3 minhash lesson: single-block tests hid a multi-partition
    failure. Force many blocks on both build and probe sides."""
    import ray.data

    from blacklab_ray.pipelines.lshindex import (build_minhash_index,
                                                 probe_minhash_index)
    idx = str(tmp_path_factory.mktemp("lshidx_mb"))
    build_minhash_index(
        ray.data.from_arrow(_split(corpus, 0, 60)).repartition(16), idx)
    out = probe_minhash_index(
        ray.data.from_arrow(_split(corpus, 60, 70)).repartition(8),
        idx, threshold=0.8)
    pairs = set(zip(out["doc_id"].to_pylist(),
                    out["index_doc_id"].to_pylist()))
    assert all((60 + i, i) in pairs for i in range(5)), pairs


def test_probe_empty_and_no_match(ray_session, tmp_path_factory, corpus):
    import ray.data

    from blacklab_ray.pipelines.lshindex import (build_minhash_index,
                                                 probe_minhash_index)
    idx = str(tmp_path_factory.mktemp("lshidx_empty"))
    build_minhash_index(ray.data.from_arrow(_split(corpus, 0, 30)), idx)
    # probe docs unrelated to the index → no pairs, stable schema
    out = probe_minhash_index(
        ray.data.from_arrow(_split(corpus, 40, 50)), idx, threshold=0.8)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "index_doc_id", "jaccard"]


def test_exact_index_probe(ray_session, tmp_path_factory, corpus):
    import ray.data

    from blacklab_ray.pipelines.lshindex import (append_exact_index,
                                                 build_exact_index,
                                                 probe_exact_index)
    idx = str(tmp_path_factory.mktemp("exidx"))
    stats = build_exact_index(
        ray.data.from_arrow(_split(corpus, 0, 30)).repartition(8), idx)
    assert stats["n_docs"] == 30
    append_exact_index(
        ray.data.from_arrow(_split(corpus, 30, 60)).repartition(8), idx)
    out = probe_exact_index(
        ray.data.from_arrow(_split(corpus, 60, 70)).repartition(4), idx)
    pairs = set(zip(out["doc_id"].to_pylist(),
                    out["index_doc_id"].to_pylist()))
    # ids 60-64 are exact copies of 0-4; 65-69 are near-dups (no match)
    assert pairs == {(60 + i, i) for i in range(5)}, pairs


def test_exact_index_min_id_and_misses(ray_session, tmp_path_factory,
                                       corpus):
    import ray.data

    from blacklab_ray.pipelines.lshindex import (build_exact_index,
                                                 probe_exact_index)
    idx = str(tmp_path_factory.mktemp("exidx_min"))
    # index includes BOTH copies of doc 0's text (ids 0 and 60)
    build_exact_index(ray.data.from_arrow(_split(corpus, 0, 70)), idx)
    texts = corpus.column("text").to_pylist()
    probe = pa.table({"doc_id": pa.array([100, 101], pa.int64()),
                      "text": pa.array([texts[0], "nothing like this"])})
    out = probe_exact_index(ray.data.from_arrow(probe), idx)
    assert out["doc_id"].to_pylist() == [100]
    assert out["index_doc_id"].to_pylist() == [0]  # min of {0, 60}
