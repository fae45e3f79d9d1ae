"""Multi-value (position-increment-0) annotations: secondary values
indexed at existing token positions; forward index keeps the primary
(AnnotationWriter.java:44-47, AddIsPrimaryValueToPayloadFilter.java:28).
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

MULTI_TYPE = pa.list_(pa.struct([("pos", pa.int32()),
                                 ("value", pa.string())]))


def _corpus_table():
    # doc 0: "the quick fox" + synonym speedy@1
    # doc 1: "a quick dog runs" + synonyms fast@1, hound@2
    # doc 2: "slow fox" + synonym quick@0  (collides with doc 0/1's
    #        real token "quick" → exercises the merge path when the
    #        synonym string also occurs as a REAL token in the corpus)
    # doc 3: "quick quick" + synonym quick@0 (same-string collision in
    #        the SAME doc → tf merge + position-blob merge)
    return pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "url": ["u0", "u1", "u2", "u3"],
        "text": ["the quick fox", "a quick dog runs", "slow fox",
                 "quick quick"],
        "lang": ["en"] * 4,
        "multi": pa.array(
            [[{"pos": 1, "value": "speedy"}],
             [{"pos": 1, "value": "fast"}, {"pos": 2, "value": "hound"}],
             [{"pos": 0, "value": "quick"}],
             [{"pos": 0, "value": "quick"}]],
            MULTI_TYPE),
    })


@pytest.fixture(scope="module")
def mv_index(ray_session, tmp_path_factory):
    from blacklab_ray.index import BuildParams, build_index
    root = tmp_path_factory.mktemp("mv")
    src = root / "pages.parquet"
    pq.write_table(_corpus_table(), str(src))
    idx = str(root / "idx")
    build_index(str(src), idx,
                BuildParams(num_buckets=4, n_salts=2, block_size=16,
                            id_column="doc_id",
                            multivalue_column="multi"))
    return idx


@pytest.fixture(scope="module")
def mv_reader(mv_index):
    from blacklab_ray.query import IndexReader
    return IndexReader(mv_index)


def test_secondary_value_matches_term_query(mv_reader):
    from blacklab_ray.query import search_taat
    t = search_taat(mv_reader, ["speedy"], k=100)
    assert t["doc_id"].to_pylist() == [0]
    t = search_taat(mv_reader, ["hound"], k=100)
    assert t["doc_id"].to_pylist() == [1]


def test_secondary_position_supports_phrase(mv_reader):
    from blacklab_ray.query import phrase_search
    # speedy is at position 1 of doc 0 ("the [quick|speedy] fox") —
    # the phrase "speedy fox" must match through the synonym position
    t = phrase_search(mv_reader, ["speedy", "fox"], k=100)
    assert t["doc_id"].to_pylist() == [0]
    # and "the speedy" too (left adjacency)
    t = phrase_search(mv_reader, ["the", "speedy"], k=100)
    assert t["doc_id"].to_pylist() == [0]


def test_synonym_string_collision_merges_postings(mv_reader):
    """'quick' occurs as a real token (docs 0,1,3) and as a synonym
    (docs 2,3). df must count each doc once; doc 3's tf must be 3
    (two real + one synonym) with positions {0, 1}."""
    from blacklab_ray.query import search_taat
    t = search_taat(mv_reader, ["quick"], k=100)
    assert sorted(t["doc_id"].to_pylist()) == [0, 1, 2, 3]
    terms = mv_reader.terms_table
    row = terms.filter(
        pa.compute.equal(terms["term"], "quick")).to_pylist()[0]
    assert row["doc_freq"] == 4
    # ctf: doc0 1 + doc1 1 + doc2 1(syn) + doc3 3(2 real + 1 syn)
    assert row["collection_tf"] == 6


def test_phrase_through_merged_position(mv_reader):
    from blacklab_ray.query import phrase_search
    # doc 2 "slow fox" with quick@0: "quick fox" phrase must match the
    # synonym position 0 → 1 adjacency
    t = phrase_search(mv_reader, ["quick", "fox"], k=100)
    assert sorted(t["doc_id"].to_pylist()) == [0, 2]


def test_forward_index_keeps_primary_only(mv_index):
    import pyarrow.parquet as _pq
    fwd = _pq.read_table(f"{mv_index}/fwd")
    row = {r["doc_id"]: r for r in fwd.to_pylist()}
    # display vector for doc 0 has no 'speedy'
    assert "speedy" not in row[0]["terms"]
    assert "speedy" in row[0]["terms_mv"]
    # doc_len counts token POSITIONS (reference lengthTokens), not
    # secondary values
    assert row[0]["doc_len"] == 3
    assert row[3]["doc_len"] == 2


def test_doc_len_and_norm_unaffected(mv_reader):
    assert mv_reader.meta["total_tokens"] == 3 + 4 + 2 + 2


def test_multivalue_position_out_of_range_raises(ray_session,
                                                 tmp_path_factory):
    from blacklab_ray.index import BuildParams, build_index
    root = tmp_path_factory.mktemp("mvbad")
    bad = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "url": ["u0"],
        "text": ["one two"],
        "lang": ["en"],
        "multi": pa.array([[{"pos": 5, "value": "x"}]], MULTI_TYPE),
    })
    src = root / "pages.parquet"
    pq.write_table(bad, str(src))
    with pytest.raises(Exception, match="multivalue position"):
        build_index(str(src), str(root / "idx"),
                    BuildParams(num_buckets=2, n_salts=2,
                                id_column="doc_id",
                                multivalue_column="multi"))


def test_multivalue_requires_mapreduce():
    from blacklab_ray.index import BuildParams, build_index
    with pytest.raises(ValueError, match="mapreduce"):
        build_index("/nonexistent", "/tmp/never",
                    BuildParams(exchange="fused",
                                multivalue_column="multi"))


def test_merge_duplicate_doc_terms_unit():
    """Direct unit test of the (term, doc) merge: tf sums, positions
    interleave sorted, singletons untouched."""
    from blacklab_ray.codec.vbyte import vbyte_decode, vbyte_encode
    from blacklab_ray.index.postings import _merge_duplicate_doc_terms

    def blob(positions):
        p = np.asarray(positions, dtype=np.int64)
        d = np.empty(p.size, dtype=np.int64)
        d[0] = p[0]
        d[1:] = np.diff(p)
        return vbyte_encode(d)

    tbl = pa.table({
        "gkey": pa.array([1, 1, 2], pa.int64()),
        "term": ["x", "x", "y"],
        "doc_id": pa.array([7, 7, 7], pa.int64()),
        "tf": pa.array([2, 1, 1], pa.int32()),
        "norm": pa.array([3, 3, 3], pa.int32()),
        "posbin": pa.array([blob([0, 4]), blob([2]), blob([9])],
                           pa.binary()),
    })
    codes = np.array([0, 0, 1], dtype=np.int64)
    out = _merge_duplicate_doc_terms(tbl, codes)
    assert out.num_rows == 2
    rows = {r["term"]: r for r in out.to_pylist()}
    assert rows["x"]["tf"] == 3
    got = np.cumsum(vbyte_decode(np.frombuffer(rows["x"]["posbin"],
                                               np.uint8)))
    assert got.tolist() == [0, 2, 4]
    assert rows["y"]["tf"] == 1


# ---- non-main-annotation multi-values (naf.blf.yaml word_or_lemma) ----

NAF_DOC = """<NAF xml:lang="en" version="3.0">
 <nafHeader>
  <fileDesc title="Multivalue test"/>
  <public publicId="naf-1"/>
 </nafHeader>
 <text>
  <wf id="w1" lemma="the">The</wf>
  <wf id="w2" lemma="run">ran</wf>
  <wf id="w3">fast</wf>
 </text>
 <terms>
  <term id="t2" lemma="rennen" pos="verb"><span><target id="w2"/></span></term>
 </terms>
</NAF>"""


def test_naf_word_or_lemma_extraction(ray_session):
    """The REAL naf.blf.yaml loads without the first-value warning and
    word_or_lemma's union valuePath (.//text()|./@lemma) yields the
    word AND the lemma — lemma as an increment-0 secondary."""
    import warnings

    from blacklab_ray.stages.blfyaml import load_blf_yaml
    from blacklab_ray.stages.xmlconfig import extract_xml_config

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        cfg = load_blf_yaml(
            "/root/reference/core/src/main/resources/formats/"
            "naf.blf.yaml")
    assert "word_or_lemma" in cfg.multivalue_annotations
    fn = extract_xml_config(cfg)
    t = fn(pa.table({"path": ["n.xml"],
                     "bytes": [NAF_DOC.encode()]}))
    assert t["text"][0].as_py() == "The ran fast"
    # primary = first matched node in DOCUMENT ORDER: the XPath data
    # model places an element's attributes before its children, so
    # @lemma wins when present and the word text is the secondary
    assert t["word_or_lemma"][0].as_py() == ["the", "run", "fast"]
    mv = t["multi_word_or_lemma"][0].as_py()
    assert {(m["pos"], m["value"]) for m in mv} == \
        {(0, "The"), (1, "ran")}   # w3 has no @lemma -> no secondary
    # standoff lemma layer attaches by token ref as before
    assert t["lemma"][0].as_py() == ["_", "rennen", "_"]


def test_naf_word_or_lemma_cql(ray_session, tmp_path):
    """End-to-end: the secondary (lemma) value is searchable through
    [word_or_lemma="..."] while the forward index keeps the primary."""
    from blacklab_ray.formats import read_pages, register_yaml_format
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader
    from blacklab_ray.query.cql import cql_spans

    src = tmp_path / "naf"
    src.mkdir()
    (src / "a.xml").write_text(NAF_DOC)
    name = register_yaml_format(
        "/root/reference/core/src/main/resources/formats/naf.blf.yaml",
        name="naf-mv-test")
    try:
        ds = read_pages(name, [str(src / "a.xml")])
        idx = str(tmp_path / "idx")
        build_index(ds, idx, BuildParams(
            num_buckets=2, n_salts=1, analyzer="whitespace",
            annotations=("word_or_lemma", "lemma", "pos")))
        r = IndexReader(idx)
        # secondary value "run" (wf @lemma) matches at position 1
        got = cql_spans(r, '[word_or_lemma="run"]')
        assert got.num_rows == 1 and got["start"][0].as_py() == 1
        # so does the primary word form at the same position
        got2 = cql_spans(r, '[word_or_lemma="ran"]')
        assert got2.num_rows == 1 and got2["start"][0].as_py() == 1
        # a secondary on another position
        assert cql_spans(r, '[word_or_lemma="the"]').num_rows == 1
        # absent value stays absent
        assert cql_spans(r, '[word_or_lemma="rennen"]').num_rows == 0
        # standoff annotation still routes separately
        assert cql_spans(r, '[lemma="rennen"]').num_rows == 1
    finally:
        from blacklab_ray import formats as F
        F._FORMATS.pop(name, None)
        F.USER_FORMATS.discard(name)
