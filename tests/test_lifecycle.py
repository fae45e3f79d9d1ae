"""The 100-TB operational lifecycle, end-to-end on one corpus:

    crawl shards (WARC) → independent per-shard index builds →
    IMMEDIATE federated serving (exact global BM25) → incremental
    delete in one shard → background size-tiered compaction →
    re-opened single index — score-identical at every step to the
    union-built oracle index.

Every stage is an existing tested operator; this test pins the
COMPOSITION (the lifecycle a fleet actually runs) so a regression in
any seam — WARC payload fidelity, per-shard build determinism,
federated stats, tombstone union, merge re-exchange — fails here
even if each piece's own suite stays green."""

import numpy as np
import pyarrow.parquet as pq

from blacklab_ray.index import BuildParams, build_index
from blacklab_ray.index.update import delete_documents
from blacklab_ray.query import IndexReader, MultiIndexReader, search_taat
from blacklab_ray.query.multireader import compact_federation
from blacklab_ray.sources.synth import generate_pages
from blacklab_ray.sources.warc import read_warc, write_warc
from blacklab_ray.testoracle import CorpusOracle


def test_crawl_to_compacted_index_lifecycle(ray_session, tmp_path):
    shard_sizes = [(0, 30), (30, 20), (50, 25)]
    all_pages = generate_pages(75)
    union_src = tmp_path / "union_src"
    union_src.mkdir()
    pq.write_table(all_pages, str(union_src / "p.parquet"))

    # 1. three crawl shards arrive as WARC (the CC container)
    sub_dirs = []
    for i, (off, n) in enumerate(shard_sizes):
        pages = generate_pages(n, doc_offset=off)
        warc_path = str(tmp_path / f"crawl{i}.warc.gz")
        write_warc(warc_path,
                   [("response", u, ts.value, h) for u, ts, h in
                    zip(pages["url"].to_pylist(), pages["warc_ts"],
                        pages["html"].to_pylist())],
                   gzip_members=True)
        # 2. each shard builds its own index, independently
        idx = str(tmp_path / f"idx{i}")
        build_index(read_warc(warc_path), idx,
                    BuildParams(num_buckets=2 + i, n_salts=1,
                                extract_html=True, trust_text=False))
        sub_dirs.append(idx)

    # 3. federated serving starts immediately; the union build is the
    # oracle (extract_html through the same path for byte identity)
    union_idx = str(tmp_path / "union_idx")
    build_index(str(union_src), union_idx,
                BuildParams(num_buckets=4, n_salts=2,
                            extract_html=True, trust_text=False))
    union = IndexReader(union_idx)
    multi = MultiIndexReader(sub_dirs)
    assert multi.n_docs == union.n_docs == 75
    want = search_taat(union, ["the"], 10**9)
    got = search_taat(multi, ["the"], 10**9)
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    for g, w in zip(got["score"].to_pylist(),
                    want["score"].to_pylist()):
        assert abs(g - w) < 1e-9
    # and against the loop-based pure-Python oracle
    oracle = CorpusOracle.from_pages(all_pages)
    exp = oracle.topk(["the", "quick"], 10)
    res = search_taat(multi, ["the", "quick"], 10)
    assert res["doc_id"].to_pylist() == [d for d, _ in exp]

    # 4. incremental delete lands in ONE shard; the federation hides it
    victim_url = generate_pages(1, doc_offset=30)["url"][0].as_py()
    delete_documents(sub_dirs[1], urls=[victim_url])
    multi2 = MultiIndexReader(sub_dirs)
    from blacklab_ray.stages.tokenize import hash64
    assert hash64(victim_url) not in set(
        search_taat(multi2, ["the"], 10**9)["doc_id"].to_pylist())

    # 5. background compaction: 3 shards → 1 physical index. The doc
    # SET is preserved (delete survives the merge), and scores now
    # reflect live-docs-only stats — tombstoned docs stop counting in
    # n_docs/avgdl once physically removed (Lucene semantics: deletes
    # affect stats only after merge), so the oracle is the pure-Python
    # model over the 74 surviving pages, not the pre-compaction
    # federation (whose stats still include the tombstone).
    before_ids = set(
        search_taat(multi2, ["the"], 10**9)["doc_id"].to_pylist())
    (only,) = compact_federation(sub_dirs, max_indexes=1)
    solo = IndexReader(only)
    after = search_taat(solo, ["the"], 10**9)
    assert set(after["doc_id"].to_pylist()) == before_ids
    assert hash64(victim_url) not in before_ids
    assert solo.n_docs == 74
    live = all_pages.filter(
        np.array([u != victim_url
                  for u in all_pages["url"].to_pylist()]))
    live_oracle = CorpusOracle.from_pages(live)
    exp2 = live_oracle.topk(["the"], 15)
    res2 = search_taat(solo, ["the"], 15)
    assert res2["doc_id"].to_pylist() == [d for d, _ in exp2]
    for g, (_, s) in zip(res2["score"].to_pylist(), exp2):
        assert abs(g - s) < 1e-9
