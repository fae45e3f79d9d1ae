"""Golden parity against the REFERENCE'S OWN integration corpus.

The reference ships its integration-test inputs (three VOICE-project
TEI files, test/data/input/*.xml), the indexing config
(test/data/voice-tei.blf.yaml) and the expected server responses
(test/data/saved-responses/). This module indexes the SAME inputs
through the config-driven extractor + whitespace-analyzer build and
asserts the SAME hit counts, document distributions, group sizes and
— for the single-word query — the exact per-document hit positions
recorded in the saved responses. The strongest external correctness
signal available: the expectations were produced by the reference,
not by this repo.
"""

import json
import os
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

VOICE_IN = "/root/reference/test/data/input"
SAVED = "/root/reference/test/data/saved-responses"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(VOICE_IN), reason="reference test data not present")


def _saved(kind: str, name: str) -> dict:
    with open(os.path.join(SAVED, kind, name + ".json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def voice_index(ray_session, tmp_path_factory):
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.stages.xmlconfig import (
        XmlFormatConfig, extract_xml_config,
    )
    # voice-tei.blf.yaml: documentPath /TEI, container .//text,
    # wordPath .//w, word=".", lemma=@lemma, pos=@type, inline <u/>,
    # pid=@xml:id, title=teiHeader/fileDesc/titleStmt/title
    cfg = XmlFormatConfig(
        name="voice-tei",
        document_path=".//TEI",
        word_path=".//text//w",
        word_value=".",
        annotations={"lemma": "@lemma", "pos": "@type"},
        inline_tags=("u",),
        metadata={"title": "teiHeader/fileDesc/titleStmt/title"},
        doc_id_value="@xml:id",
    )
    files = sorted(pathlib.Path(VOICE_IN).glob("*.xml"))
    batch = pa.table({
        "path": pa.array([f.name for f in files]),
        "bytes": pa.array([f.read_bytes() for f in files]),
    })
    pages = extract_xml_config(cfg)(batch)
    root = tmp_path_factory.mktemp("voice")
    src = root / "pages"
    src.mkdir()
    pq.write_table(pages, str(src / "p.parquet"))
    idx = str(root / "idx")
    build_index(str(src), idx, BuildParams(
        num_buckets=4, n_salts=2, analyzer="whitespace",
        annotations=("lemma", "pos"),
        # title is TOKENIZED in the reference's index metadata
        # (info/metadata field info with values.json: type TOKENIZED)
        metadata_fields=(("meta_title", "tokenized"),)))
    return idx


@pytest.fixture(scope="module")
def voice_reader(voice_index):
    from blacklab_ray.query import IndexReader
    return IndexReader(voice_index)


def _hits(reader, patt, number=2000):
    from blacklab_ray.server import handle_hits
    return handle_hits(reader, {"patt": patt, "number": str(number),
                                "wordsaroundhit": "1"})


# reference patt → (saved-response file, notes)
HIT_CASES = [
    ('[]', "any token"),
    ('"the"', "single word the"),
    ('<u/> containing "good"', "containing"),
    ('"very" "good" within <u/>', "within"),
    ('"a" [lemma="successful"]', "simple phrase a succesful"),
    ('"a" [lemma="successful"]', "phrase a succesful with _FI1"),
    ('"a" [lemma="successful"]', "phrase a succesful with _FI2"),
    ('"one" A:[]', "simple capture group"),
    ('[lemma="be" & word="are"]', "token level AND"),
    ('[lemma="be" & word!="are"]', "token level AND NOT"),
    ('"two"|"four"', "two-four-separate"),
    ('"two|four"', "two-four-single-regex"),
]


@pytest.mark.parametrize("patt,saved_name", HIT_CASES,
                         ids=[c[1] for c in HIT_CASES])
def test_hits_match_saved_response(voice_reader, patt, saved_name):
    exp = _saved("hits", saved_name)
    resp = _hits(voice_reader, patt)
    assert resp["summary"]["numberOfHits"] == \
        exp["summary"]["numberOfHits"], patt
    assert resp["summary"]["numberOfDocs"] == \
        exp["summary"]["numberOfDocs"], patt
    # exact hit positions (both windows cover all hits for the small
    # queries; 'any token' truncates to the requested window)
    if exp["summary"]["numberOfHits"] <= len(exp["hits"]):
        want = sorted((h["docPid"], h["start"], h["end"])
                      for h in exp["hits"])
        got = sorted((h["docPid"], h["start"], h["end"])
                     for h in resp["hits"])
        assert got == want, patt


def test_the_match_words_and_context(voice_reader):
    """Word forms of match + left/right context agree token-for-token
    with the reference (modulo its sort: compare as sorted sets)."""
    exp = _saved("hits", "single word the")
    resp = _hits(voice_reader, '"the"')
    want = sorted((h["docPid"], h["start"],
                   tuple(h["left"]["word"]), tuple(h["match"]["word"]),
                   tuple(h["right"]["word"])) for h in exp["hits"])
    got = sorted((h["docPid"], h["start"],
                  tuple(h["left"]["word"]), tuple(h["match"]["word"]),
                  tuple(h["right"]["word"])) for h in resp["hits"])
    assert got == want


def test_any_token_per_doc_counts(voice_reader):
    from blacklab_ray.server import handle_docs
    exp = _saved("docs", "any token")
    resp = handle_docs(voice_reader, {"patt": "[]", "number": "50"})
    want = {d["docPid"]: d["numberOfHits"] for d in exp["docs"]}
    got = {d["docPid"]: d["numberOfHits"] for d in resp["docs"]}
    assert got == want == {"PBsve430": 334, "PBsve435": 164,
                           "PRint602": 268}


@pytest.mark.parametrize("saved_name,patt", [
    ("single word she", '"she"'),
    ("single word they", '"they"'),
    ("pattern and filter", '"the"'),
])
def test_docs_hit_distribution(voice_reader, saved_name, patt):
    from blacklab_ray.server import handle_docs
    exp = _saved("docs", saved_name)
    sp = exp["summary"]["searchParam"]
    params = {"patt": patt, "number": "50"}
    if sp.get("filter"):
        params["filter"] = sp["filter"]
    resp = handle_docs(voice_reader, params)
    want = {d["docPid"]: d["numberOfHits"] for d in exp["docs"]}
    got = {d["docPid"]: d["numberOfHits"] for d in resp["docs"]}
    assert got == want, saved_name


def test_hits_grouped_by_title(voice_reader):
    from blacklab_ray.server import handle_hits_grouped
    exp = _saved("hits-grouped", "a grouped by title")
    resp = handle_hits_grouped(
        voice_reader, {"patt": '"a"', "group": "field:meta_title"})
    want = sorted((g["identityDisplay"], g["size"])
                  for g in exp["hitGroups"])
    got = sorted((g["identityDisplay"], g["size"])
                 for g in resp["hitGroups"])
    assert got == want
    # subcorpusSize exact parity: per-group {documents, tokens} and
    # the summary-level whole-corpus size match the saved response
    want_sizes = {g["identityDisplay"]: g["subcorpusSize"]
                  for g in exp["hitGroups"]}
    got_sizes = {g["identityDisplay"]: g["subcorpusSize"]
                 for g in resp["hitGroups"]}
    assert got_sizes == want_sizes
    assert resp["summary"]["subcorpusSize"] == \
        exp["summary"]["subcorpusSize"]


def test_hits_grouped_by_word(voice_reader):
    from blacklab_ray.server import handle_hits_grouped
    exp = _saved("hits-grouped", "any token grouped by word")
    resp = handle_hits_grouped(
        voice_reader, {"patt": "[]", "group": "hit:word:i",
                       "number": "500"})
    assert resp["summary"]["numberOfGroups"] == \
        exp["summary"]["numberOfGroups"]
    want = {g["identityDisplay"]: g["size"] for g in exp["hitGroups"]}
    got = {g["identityDisplay"]: g["size"] for g in resp["hitGroups"]}
    for k, v in want.items():
        assert got.get(k) == v, k


def test_hits_grouped_by_right_context(voice_reader):
    """'very grouped by word right' — HitPropertyRightContext: exact
    identities (cwo: prefix), displays and sizes."""
    from blacklab_ray.server import handle_hits_grouped
    exp = _saved("hits-grouped", "very grouped by word right")
    resp = handle_hits_grouped(
        voice_reader, {"patt": '"very"', "group": "wordright:word:i"})
    want = sorted((g["identity"], g["identityDisplay"], g["size"])
                  for g in exp["hitGroups"])
    got = sorted((g["identity"], g["identityDisplay"], g["size"])
                 for g in resp["hitGroups"])
    assert got == want


def test_colloc_matches_saved(voice_reader):
    """colloc token frequencies around '"the"' — token-for-token equal
    to the reference's saved response at context width 10."""
    from blacklab_ray.server import handle_colloc
    exp = _saved("colloc", "single word the")
    resp = handle_colloc(voice_reader, {"patt": '"the"'})
    assert resp["tokenFrequencies"] == exp["tokenFrequencies"]


def test_doc_snippet_wordstart_matches_saved(voice_reader):
    """snippet by word window: the reference's saved response is
    positions [5, 15) of PBsve430 — word AND annotation arrays must
    agree (punct column not stored in this build: compared without
    it)."""
    from blacklab_ray.server import handle_doc_snippet
    exp = _saved("docs", "document snippet wordstart")["snippet"]
    resp = handle_doc_snippet(voice_reader, "PBsve430",
                              {"wordstart": "5", "wordend": "15"})
    for k in ("word", "lemma", "pos"):
        assert resp["snippet"][k] == exp[k], k


def test_doc_snippet_hitstart_matches_saved(voice_reader):
    from blacklab_ray.server import handle_doc_snippet
    exp = _saved("docs", "document snippet hitstart")
    resp = handle_doc_snippet(voice_reader, "PBsve430",
                              {"hitstart": "3", "hitend": "5",
                               "wordsaroundhit": "2"})
    for part in ("left", "match", "right"):
        for k in ("word", "lemma", "pos"):
            assert resp[part][k] == exp[part][k], (part, k)


def test_doc_info_metadata_matches_saved(voice_reader):
    from blacklab_ray.server import handle_doc_info
    exp = _saved("docs", "document metadata")
    resp = handle_doc_info(voice_reader, "PBsve430")
    assert resp["docPid"] == "PBsve430"
    assert resp["docInfo"]["pid"] == exp["docInfo"]["pid"]
    assert resp["docInfo"]["title"] == exp["docInfo"]["title"]
    assert resp["docInfo"]["lengthInTokens"] == \
        exp["docInfo"]["lengthInTokens"]


def test_hits_grouped_by_capture(voice_reader):
    """capture:word:i:A groups hits by the captured token's word (the
    reference's 'group by capture' property; its saved response uses
    an unrecorded pattern, so expectations here come from the corpus
    itself: 'the X' captures)."""
    from blacklab_ray.server import handle_hits_grouped
    resp = handle_hits_grouped(
        voice_reader, {"patt": '"the" A:[]',
                       "group": "capture:word:i:A"})
    gm = {g["identityDisplay"]: g["size"] for g in resp["hitGroups"]}
    assert gm["confirmation"] == 4
    assert sum(gm.values()) == 21   # every 'the' hit grouped
    top = resp["hitGroups"][0]
    assert top["identity"] == "cws:word:i:confirmation"


def test_hits_grouped_with_filter(voice_reader):
    """'any token grouped by word with filter': group counts restricted
    by a pid filter reproduce exactly (the saved numbers identify the
    filter as pid:PBsve430)."""
    from blacklab_ray.server import handle_hits_grouped
    exp = _saved("hits-grouped", "any token grouped by word with filter")
    resp = handle_hits_grouped(
        voice_reader, {"patt": "[]", "group": "hit:word:i",
                       "filter": "pid:PBsve430", "number": "500"})
    assert resp["summary"]["numberOfGroups"] == \
        exp["summary"]["numberOfGroups"] == 118
    want = {g["identityDisplay"]: g["size"] for g in exp["hitGroups"]}
    got = {g["identityDisplay"]: g["size"] for g in resp["hitGroups"]}
    for k, v in want.items():
        assert got.get(k) == v, k
    # the summary subcorpusSize reflects the FILTERED corpus
    assert resp["summary"]["subcorpusSize"] == \
        exp["summary"]["subcorpusSize"] == {"documents": 1,
                                            "tokens": 334}


def test_viewgroup_matches_saved(voice_reader):
    """'view single group': the hits of ONE title group — exact
    positions."""
    from blacklab_ray.server import handle_hits_grouped
    exp = _saved("hits", "view single group")
    title = ("service encounter about visa application for "
             "family members")
    resp = handle_hits_grouped(
        voice_reader, {"patt": '"a"', "group": "field:meta_title",
                       "viewgroup": f"str:{title}"})
    assert resp["summary"]["numberOfHits"] == \
        exp["summary"]["numberOfHits"] == 5
    want = sorted((h["docPid"], h["start"], h["end"])
                  for h in exp["hits"])
    got = sorted((h["docPid"], h["start"], h["end"])
                 for h in resp["hits"])
    assert got == want


def test_hits_facets_matches_saved(voice_reader):
    """'document facets' (hits): per-facet distinct-doc counts."""
    from blacklab_ray.server import handle_hits
    exp = _saved("hits", "document facets")
    resp = handle_hits(voice_reader, {"patt": '"the"',
                                      "facets": "field:pid"})
    want = sorted((f["value"], f["size"]) for f in exp["facets"]["pid"])
    got = sorted((f["value"], f["size"]) for f in resp["facets"]["pid"])
    assert got == want


def test_docs_facets_matches_saved(voice_reader):
    from blacklab_ray.server import handle_docs
    exp = _saved("docs", "document facets")
    resp = handle_docs(voice_reader, {"patt": '"the"',
                                      "facets": "field:meta_title"})
    want = sorted((f["value"], f["size"])
                  for f in exp["facets"]["title"])
    got = sorted((f["value"], f["size"])
                 for f in resp["facets"]["title"])
    assert got == want


def test_docs_grouped_by_title(voice_reader):
    from blacklab_ray.server import handle_docs_grouped
    exp = _saved("docs-grouped", "a grouped by title")
    resp = handle_docs_grouped(
        voice_reader, {"patt": '"a"', "group": "field:meta_title"})
    want = sorted((g["identityDisplay"], g["size"])
                  for g in exp["docGroups"])
    got = sorted((g["identityDisplay"], g["size"])
                 for g in resp["docGroups"])
    assert got == want
    # per-group and summary subcorpusSize exact parity
    want_sizes = {g["identityDisplay"]: g["subcorpusSize"]
                  for g in exp["docGroups"]}
    got_sizes = {g["identityDisplay"]: g["subcorpusSize"]
                 for g in resp["docGroups"]}
    assert got_sizes == want_sizes
    assert resp["summary"]["subcorpusSize"] == \
        exp["summary"]["subcorpusSize"]


# ---- info / autocomplete / field-info endpoints (saved-responses/info) ----


def test_autocomplete_annotated_field_matches_saved(voice_reader):
    """/test/autocomplete/contents/lemma?term=b — exact list."""
    from blacklab_ray.server import handle_autocomplete
    exp = _saved("info", "autocomplete annotated field")
    want = [exp[str(i)] for i in range(len(exp))]
    got = handle_autocomplete(voice_reader, "lemma", {"term": "b"})
    assert got == want


def test_autocomplete_metadata_field_matches_saved(voice_reader):
    """/test/autocomplete/title?term=a — a TOKENIZED metadata field
    completes from its ANALYZED tokens, not its raw values."""
    from blacklab_ray.server import handle_autocomplete
    exp = _saved("info", "autocomplete metadata field")
    want = [exp[str(i)] for i in range(len(exp))]
    got = handle_autocomplete(voice_reader, "meta_title", {"term": "a"})
    assert got == want


def test_corpus_status_matches_saved(voice_reader):
    from blacklab_ray.server import handle_index_status
    exp = _saved("info", "corpus status")
    resp = handle_index_status(voice_reader, "test")
    assert resp["indexName"] == exp["indexName"] == "test"
    assert resp["status"] == exp["status"] == "available"
    assert resp["tokenCount"] == exp["tokenCount"] == 766


def test_corpus_and_server_info_counts_match_saved(voice_reader):
    from blacklab_ray.server import handle_server_info
    corpus = _saved("info", "corpus")
    assert voice_reader.n_docs == corpus["documentCount"] == 3
    assert int(voice_reader.meta["total_tokens"]) == \
        corpus["tokenCount"] == 766
    exp = _saved("info", "server")
    resp = handle_server_info({"test": voice_reader})
    assert resp["indices"]["test"]["tokenCount"] == \
        exp["indices"]["test"]["tokenCount"]
    assert resp["indices"]["test"]["status"] == \
        exp["indices"]["test"]["status"]


def test_annotated_field_values_match_saved(voice_reader):
    """/test/fields/contents?listvalues=lemma — the lemma term
    dictionary, value-for-value (incl. the '' empty-lemma entry)."""
    from blacklab_ray.server import handle_fieldinfo
    exp = _saved("info", "annotated field info with values")
    resp = handle_fieldinfo(voice_reader, "contents",
                            {"listvalues": "lemma"})
    lem = resp["annotations"]["lemma"]
    assert lem["values"] == exp["annotations"]["lemma"]["values"]
    assert lem["valueListComplete"] is True
    assert resp["mainAnnotation"] == exp["mainAnnotation"] == "word"
    # every non-internal reference annotation exists here
    assert {"word", "lemma", "pos"} <= set(resp["annotations"])


def test_metadata_field_info_matches_saved(voice_reader):
    """/test/fields/title — TOKENIZED type + exact value counts."""
    from blacklab_ray.server import handle_fieldinfo
    exp = _saved("info", "metadata field info with values")
    resp = handle_fieldinfo(voice_reader, "meta_title", {})
    assert resp["fieldValues"] == exp["fieldValues"]
    assert resp["type"].upper() == exp["type"] == "TOKENIZED"
    assert resp["valueListComplete"] == \
        exp["valueListComplete"] is True


def test_docs_filter_only_matches_saved(voice_reader):
    """'filter only': docs by pid filter with no pattern."""
    from blacklab_ray.server import handle_docs
    exp = _saved("docs", "filter only")
    resp = handle_docs(voice_reader, {"filter": "pid:PBsve435"})
    assert resp["summary"]["numberOfDocs"] == \
        exp["summary"]["numberOfDocs"] == 1
    assert [d["docPid"] for d in resp["docs"]] == \
        [d["docPid"] for d in exp["docs"]] == ["PBsve435"]
    assert resp["docs"][0]["docInfo"]["lengthInTokens"] == \
        exp["docs"][0]["docInfo"]["lengthInTokens"]


def test_input_formats_cover_reference_registry():
    """Every format id the reference's server lists (minus its test
    fixture format) resolves in this registry too — a reference user's
    --format keeps working."""
    from blacklab_ray.server import handle_input_formats
    exp = _saved("info", "input formats")
    want = set(exp["supportedInputFormats"]) - {"testformat"}
    got = set(handle_input_formats()["supportedInputFormats"])
    assert want <= got, want - got


def test_single_doc_index_matches_expected_index_content(
        ray_session, tmp_path_factory):
    """indices/expected-index-content.json: the reference's private-
    index CRUD test — create an index, upload ONE document
    (PBsve430), list docs. Reproduce the resulting listing: exactly
    one doc, pid PBsve430, title and lengthInTokens (334) as saved."""
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import handle_docs
    from blacklab_ray.stages.xmlconfig import (
        XmlFormatConfig, extract_xml_config,
    )
    exp = _saved("indices", "expected-index-content")
    cfg = XmlFormatConfig(
        name="voice-tei",
        document_path=".//TEI",
        word_path=".//text//w",
        word_value=".",
        annotations={"lemma": "@lemma", "pos": "@type"},
        inline_tags=("u",),
        metadata={"title": "teiHeader/fileDesc/titleStmt/title"},
        doc_id_value="@xml:id",
    )
    f = pathlib.Path(VOICE_IN) / "PBsve430.xml"
    batch = pa.table({"path": pa.array([f.name]),
                      "bytes": pa.array([f.read_bytes()])})
    pages = extract_xml_config(cfg)(batch)
    root = tmp_path_factory.mktemp("one_doc")
    src = root / "pages"
    src.mkdir()
    pq.write_table(pages, str(src / "p.parquet"))
    idx = str(root / "idx")
    build_index(str(src), idx, BuildParams(
        num_buckets=2, n_salts=1, analyzer="whitespace",
        annotations=("lemma", "pos"),
        metadata_fields=(("meta_title", "tokenized"),)))
    resp = handle_docs(IndexReader(idx), {})
    assert resp["summary"]["numberOfDocs"] == \
        exp["summary"]["numberOfDocs"] == 1
    got, want = resp["docs"][0], exp["docs"][0]
    assert got["docPid"] == want["docPid"] == "PBsve430"
    assert got["docInfo"]["lengthInTokens"] == \
        want["docInfo"]["lengthInTokens"] == 334
    assert got["docInfo"]["mayView"] is want["docInfo"]["mayView"]


def test_colloc_phrase_matches_saved(voice_reader):
    """colloc around the phrase '"a" []' — the reference's saved
    response carries a known artifact: an empty term "" with
    frequency 2 from its integrated index format (colloc.js:41,
    issue #333 FIXME in the reference's own suite). Every REAL term
    frequency must match exactly."""
    from blacklab_ray.server import handle_hits
    exp = _saved("colloc", "phrase")["tokenFrequencies"]
    resp = handle_hits(voice_reader, {"patt": '"a" []',
                                      "calc": "colloc",
                                      "wordsaroundhit": "10"})
    got = resp["tokenFrequencies"]
    want = {k: v for k, v in exp.items() if k != ""}
    assert got == want


def test_docs_grouped_viewgroup_matches_saved(voice_reader):
    """docs-grouped viewgroup: the documents of ONE title group —
    exact pid and hit count."""
    from blacklab_ray.server import handle_docs_grouped
    exp = _saved("docs-grouped", "view single group")
    title = ("interview about conference experience and "
             "impressions of city")
    resp = handle_docs_grouped(
        voice_reader, {"patt": '"a"', "group": "field:meta_title",
                       "viewgroup": f"str:{title}"})
    want = [(d["docPid"], d["numberOfHits"]) for d in exp["docs"]]
    got = [(d["docPid"], d["numberOfHits"]) for d in resp["docs"]]
    assert got == want == [("PRint602", 8)]
    assert resp["summary"]["numberOfDocs"] == \
        exp["summary"]["numberOfDocs"] == 1


def test_group_by_capture_matches_saved(voice_reader):
    """hits-grouped/group by capture: '"a|the" X:[]' grouped by the
    captured token's word (capture:word:i:X), filtered to PBsve430 —
    exact group identities, sizes and doc counts
    (hits-grouped.js:63)."""
    from blacklab_ray.server import handle_hits_grouped
    exp = _saved("hits-grouped", "group by capture")
    resp = handle_hits_grouped(
        voice_reader, {"patt": '"a|the" X:[]',
                       "filter": "pid:PBsve430",
                       "group": "capture:word:i:X", "number": "30"})
    for k in ("numberOfGroups", "largestGroupSize", "numberOfHits",
              "numberOfDocs", "subcorpusSize"):
        assert resp["summary"][k] == exp["summary"][k], k
    want = sorted((g["identity"], g["size"], g["numberOfDocs"])
                  for g in exp["hitGroups"])
    got = sorted((g["identity"], g["size"], g["numberOfDocs"])
                 for g in resp["hitGroups"])
    assert got == want


def test_server_info_page_matches_saved(voice_reader):
    """info/Server info page.json: GET / carries the indices block
    (tokenCount over the whole corpus) and the user block
    (loggedIn/canCreateIndex) like RequestHandlerServerInfo."""
    from blacklab_ray.server import handle_server_info
    exp = _saved("info", "Server info page")
    resp = handle_server_info({"test": voice_reader})
    assert resp["indices"]["test"]["tokenCount"] == \
        exp["indices"]["test"]["tokenCount"] == 766
    assert resp["indices"]["test"]["status"] == "available"
    assert resp["user"]["loggedIn"] is \
        exp["user"]["loggedIn"] is False
    # no data_dir passed → like the reference's logged-out default
    assert resp["user"]["canCreateIndex"] is \
        exp["user"]["canCreateIndex"] is False


def test_index_metadata_matches_expected_shape(voice_index):
    """indices/expected-index-metadata.json: the IndexMetadata
    response of the voice index — field info, annotated-field block
    (annotations with forward-index/sensitivity/internal flags,
    display order starting at the main annotation), versionInfo
    stamps, and metadata-field typing."""
    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import handle_info
    exp = _saved("indices", "expected-index-metadata")
    resp = handle_info(IndexReader(voice_index), "voice")
    # scalar shape keys the reference pins
    for k in ("displayName", "description", "status",
              "contentViewable", "textDirection"):
        assert k in resp, k
    assert resp["status"] == exp["status"] == "available"
    assert resp["textDirection"] == exp["textDirection"] == "ltr"
    assert resp["tokenCount"] == 766 and resp["documentCount"] == 3
    assert set(resp["fieldInfo"]) == set(exp["fieldInfo"])
    # annotated-field block: same flags per annotation as the
    # reference's contents field (this index has no inline tags or
    # punct capture, so starttag/punct are absent — the reference
    # includes them because its indexer captures both)
    got_c = resp["annotatedFields"]["contents"]
    want_c = exp["annotatedFields"]["contents"]
    assert got_c["mainAnnotation"] == want_c["mainAnnotation"]
    assert got_c["isAnnotatedField"] is True
    assert got_c["displayOrder"][0] == "word"
    for a in ("word", "lemma", "pos"):
        ga, wa = got_c["annotations"][a], want_c["annotations"][a]
        assert ga["hasForwardIndex"] is wa["hasForwardIndex"], a
        assert ga["isInternal"] is wa["isInternal"], a
    # whitespace-analyzer build is insensitive-only; flag must say so
    assert got_c["annotations"]["word"]["sensitivity"] == \
        "ONLY_INSENSITIVE"
    vi = resp["versionInfo"]
    assert vi["indexFormat"] and vi["timeCreated"] \
        and vi["timeModified"]
    assert resp["metadataFields"]["meta_title"]["type"] == "tokenized"
