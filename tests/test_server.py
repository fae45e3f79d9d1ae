"""BLS-style serving surface: handlers, DataStream XML/CSV, WSGI app."""

import json
import threading
import urllib.request
import xml.etree.ElementTree as ET

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def srv_index(ray_session, tmp_path_factory):
    from blacklab_ray.index import BuildParams, build_index
    root = tmp_path_factory.mktemp("srv")
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "url": ["d0", "d1", "d2"],
        "text": ["the quick fox jumps", "a quick dog", "slow snail"],
        "lang": ["en", "en", "fr"],
        "year": pa.array([2000, 2010, 2020], pa.int64()),
        "title": ["The Fox Story", "Dog Days", "Snail Mail"],
    })
    src = root / "pages.parquet"
    pq.write_table(tbl, str(src))
    idx = str(root / "idx")
    build_index(str(src), idx,
                BuildParams(num_buckets=4, n_salts=2,
                            id_column="doc_id",
                            metadata_fields=(("year", "numeric"),
                                             ("title", "tokenized"))))
    return idx


@pytest.fixture(scope="module")
def srv_reader(srv_index):
    from blacklab_ray.query import IndexReader
    return IndexReader(srv_index)


def test_handle_hits_shape(srv_reader):
    from blacklab_ray.server import handle_hits
    resp = handle_hits(srv_reader, {"patt": '"quick"',
                                    "wordsaroundhit": "1"})
    assert resp["summary"]["numberOfHits"] == 2
    assert resp["summary"]["numberOfDocs"] == 2
    hits = resp["hits"]
    assert [h["docPid"] for h in hits] == ["d0", "d1"]
    h0 = hits[0]
    assert h0["match"]["word"] == ["quick"]
    assert h0["left"]["word"] == ["the"]
    assert h0["right"]["word"] == ["fox"]
    assert resp["docInfos"]["d0"]["lengthInTokens"] == 4


def test_handle_hits_window(srv_reader):
    from blacklab_ray.server import handle_hits
    resp = handle_hits(srv_reader, {"patt": '"quick"', "first": 1,
                                    "number": 1})
    assert resp["summary"]["windowHasPrevious"] is True
    assert resp["summary"]["windowHasNext"] is False
    assert len(resp["hits"]) == 1


def test_handle_hits_with_filter(srv_reader):
    from blacklab_ray.server import handle_hits
    resp = handle_hits(srv_reader, {"patt": '"quick"',
                                    "filter": "year:[2005 TO 2015]"})
    assert [h["docPid"] for h in resp["hits"]] == ["d1"]


def test_handle_hits_grouped(srv_reader):
    from blacklab_ray.server import groups_csv, handle_hits_grouped
    resp = handle_hits_grouped(srv_reader,
                               {"patt": '[word="q.*|s.*"]',
                                "group": "hit:word:i"})
    assert resp["summary"]["numberOfGroups"] >= 2
    top = resp["hitGroups"][0]
    assert top["size"] == 2 and top["identityDisplay"] == "quick"
    csv_txt = groups_csv(resp)
    assert csv_txt.splitlines()[0] == "identity,size,numberOfDocs"
    assert "quick,2," in csv_txt


def test_handle_hits_grouped_multitoken_identity(srv_reader):
    """Multi-token hits group by the FULL matched text, not the first
    word (ADVICE r3)."""
    from blacklab_ray.server import handle_hits_grouped
    resp = handle_hits_grouped(srv_reader,
                               {"patt": '"quick" [word="fox|dog"]',
                                "group": "hit:word:i"})
    idents = sorted(g["identityDisplay"] for g in resp["hitGroups"])
    assert idents == ["quick dog", "quick fox"]


def test_handle_hits_filter_tokenized_field(srv_reader):
    """BLS-style field:value on a TOKENIZED field is an analyzed-token
    match, not a FieldTypeError 500 (ADVICE r3)."""
    from blacklab_ray.server import handle_hits
    resp = handle_hits(srv_reader, {"patt": '"quick"',
                                    "filter": "title:fox"})
    assert [h["docPid"] for h in resp["hits"]] == ["d0"]


def test_handle_hits_grouped_by_field(srv_reader):
    from blacklab_ray.server import handle_hits_grouped
    resp = handle_hits_grouped(srv_reader, {"patt": '[word="q.*"]',
                                            "group": "field:lang"})
    assert resp["hitGroups"][0]["properties"][0]["name"] == "doc:lang"
    assert resp["hitGroups"][0]["identityDisplay"] == "en"


def test_handle_docs(srv_reader):
    from blacklab_ray.server import handle_docs
    resp = handle_docs(srv_reader, {"patt": '"quick"'})
    assert resp["summary"]["numberOfDocs"] == 2
    assert resp["docs"][0]["numberOfHits"] == 1
    resp = handle_docs(srv_reader, {"filter": "lang:fr"})
    assert [d["docPid"] for d in resp["docs"]] == ["d2"]
    resp = handle_docs(srv_reader, {})
    assert len(resp["docs"]) == 3


def test_handle_info(srv_reader):
    from blacklab_ray.server import handle_info
    resp = handle_info(srv_reader, "testcorpus")
    assert resp["documentCount"] == 3
    assert resp["metadataFields"]["year"]["type"] == "numeric"


def test_to_xml_wellformed(srv_reader):
    from blacklab_ray.server import handle_hits, to_xml
    resp = handle_hits(srv_reader, {"patt": '"quick"'})
    xml = to_xml(resp)
    root = ET.fromstring(xml)
    assert root.tag == "blacklabResponse"
    hits = root.find("hits")
    assert len(hits.findall("hit")) == 2
    # docInfos pid attribute convention
    infos = root.find("docInfos")
    pids = {di.get("pid") for di in infos.findall("docInfo")}
    assert pids == {"d0", "d1"}


def test_handle_doc_info_and_snippet(srv_reader):
    from blacklab_ray.server import handle_doc_info, handle_doc_snippet
    info = handle_doc_info(srv_reader, "d0")
    assert info["docInfo"]["lengthInTokens"] == 4
    # "the quick fox jumps": hit window [1,2) with 1 ctx word each side
    snip = handle_doc_snippet(srv_reader, "d0",
                              {"hitstart": 1, "hitend": 2,
                               "wordsaroundhit": 1})
    assert snip["left"]["word"] == ["the"]
    assert snip["match"]["word"] == ["quick"]
    assert snip["right"]["word"] == ["fox"]
    import pytest as _pytest
    with _pytest.raises(KeyError):
        handle_doc_info(srv_reader, "nope")
    with _pytest.raises(ValueError):
        handle_doc_snippet(srv_reader, "d0", {"hitstart": 99})


def test_handle_doc_contents(srv_reader):
    from blacklab_ray.server import handle_doc_contents
    txt = handle_doc_contents(srv_reader, "d0")
    assert txt == "the quick fox jumps"


def test_handle_termfreq(srv_reader):
    from blacklab_ray.server import handle_termfreq
    resp = handle_termfreq(srv_reader, {"number": 3})
    tf = resp["termFreq"]
    assert len(tf) == 3
    assert tf["quick"] == 2          # in two docs
    # restriction list
    resp = handle_termfreq(srv_reader, {"terms": "quick,snail"})
    assert set(resp["termFreq"]) == {"quick", "snail"}


def test_handle_autocomplete(srv_reader):
    from blacklab_ray.server import handle_autocomplete
    # annotation completion from the terms dictionary
    out = handle_autocomplete(srv_reader, "word", {"term": "s"})
    assert out == ["slow", "snail"]
    # metadata field completion from distinct values
    out = handle_autocomplete(srv_reader, "lang", {"term": ""})
    assert out == ["en", "fr"]


def test_new_routes_xml_json_parity(srv_index):
    """The r4 endpoints speak both DataStream formats over the WSGI
    app (RequestHandlerDocSnippet / RequestHandlerTermFreq /
    RequestHandlerAutocomplete analogues)."""
    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import BlsApp
    app = BlsApp({"test": IndexReader(srv_index)})

    def call(path_qs):
        path, _, qs = path_qs.partition("?")
        out = {}

        def sr(status, headers):
            out["status"] = status
            out["ctype"] = dict(headers)["Content-Type"]
        body = b"".join(app({"PATH_INFO": path, "QUERY_STRING": qs},
                            sr))
        return out["status"], out["ctype"], body.decode()

    st, ct, body = call("/corpora/test/docs/d0/snippet?hitstart=1"
                        "&hitend=2&wordsaroundhit=1")
    assert st.startswith("200")
    snip = json.loads(body)
    assert snip["match"]["word"] == ["quick"]
    st, ct, xml_body = call("/corpora/test/docs/d0/snippet?hitstart=1"
                            "&hitend=2&outputformat=xml")
    root = ET.fromstring(xml_body)
    assert [w.text for w in
            root.find("match").find("word").findall("w")] == ["quick"]

    st, ct, body = call("/corpora/test/docs/d0/contents")
    assert ct.startswith("text/plain")
    assert body == "the quick fox jumps"

    st, ct, body = call("/corpora/test/termfreq?number=2")
    assert len(json.loads(body)["termFreq"]) == 2
    st, ct, xml_body = call("/corpora/test/termfreq?number=2"
                            "&outputformat=xml")
    root = ET.fromstring(xml_body)
    terms = root.find("termFreq").findall("term")
    assert len(terms) == 2 and all(t.get("text") for t in terms)

    st, ct, body = call("/corpora/test/autocomplete/word?term=s")
    assert json.loads(body) == ["slow", "snail"]
    st, ct, xml_body = call("/corpora/test/autocomplete/word?term=s"
                            "&outputformat=xml")
    root = ET.fromstring(xml_body)
    assert [t.text for t in root.find("terms").findall("term")] == \
        ["slow", "snail"]

    st, ct, body = call("/corpora/test/docs/d1")
    assert json.loads(body)["docInfo"]["lengthInTokens"] == 3


def _mkcall(app):
    import io

    def call(path_qs, method="GET", body=None):
        path, _, qs = path_qs.partition("?")
        out = {}

        def sr(status, headers):
            out["status"] = status
            out["ctype"] = dict(headers)["Content-Type"]
        env = {"PATH_INFO": path, "QUERY_STRING": qs,
               "REQUEST_METHOD": method}
        if body is not None:
            env["CONTENT_LENGTH"] = str(len(body))
            env["wsgi.input"] = io.BytesIO(body)
        b = b"".join(app(env, sr))
        return out["status"], out["ctype"], b.decode()
    return call


def test_breadth_endpoints(srv_index):
    """Server info / status / explain / fields / docs-grouped /
    input-formats / cache endpoints + hits/docs CSV (the remaining
    BLS RequestHandler analogues)."""
    from urllib.parse import quote

    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import BlsApp
    call = _mkcall(BlsApp({"test": IndexReader(srv_index)}))

    st, _, body = call("/")
    assert json.loads(body)["indices"]["test"]["tokenCount"] > 0

    st, _, body = call("/corpora/test/status")
    s = json.loads(body)
    assert s["status"] == "available" and s["documentCount"] == 3
    assert s["generation"] == 0 and s["tombstones"] == 0

    st, _, body = call("/corpora/test/explain?patt="
                       + quote('"the" "quick"'))
    e = json.loads(body)["explain"]
    # the rewrite layer fuses the adjacent literals into a phrase
    assert e["originalQuery"] != "" and e["rewrittenQuery"] != ""

    st, _, body = call("/corpora/test/fields/year")
    fv = json.loads(body)
    assert fv["type"] == "numeric" and fv["valueListComplete"] is True
    assert fv["fieldValues"] == {"2000": 1, "2010": 1, "2020": 1}
    st, _, body = call("/corpora/test/fields/contents")
    fc = json.loads(body)
    assert fc["isAnnotatedField"] is True and "word" in fc["annotations"]

    st, _, body = call("/corpora/test/docs?group=field:lang")
    dg = json.loads(body)
    assert dg["summary"]["numberOfGroups"] == 2
    gm = {g["identityDisplay"]: g for g in dg["docGroups"]}
    assert gm["en"]["size"] == 2 and gm["fr"]["size"] == 1
    assert gm["en"]["numberOfTokens"] == 7

    st, _, body = call("/corpora/test/docs?group=field:lang"
                       "&patt=%22quick%22")
    gm = {g["identityDisplay"]: g
          for g in json.loads(body)["docGroups"]}
    assert gm["en"]["numberOfHits"] == 2 and "fr" not in gm

    st, ct, body = call("/corpora/test/hits?patt=%22quick%22"
                        "&outputformat=csv")
    assert ct.startswith("text/csv")
    assert body.startswith("docPid,start,end")
    assert body.count("\n") == 3  # header + 2 hits
    st, ct, body = call("/corpora/test/docs?patt=%22quick%22"
                        "&outputformat=csv")
    assert body.startswith("docPid,numberOfHits")

    st, _, body = call("/input-formats")
    assert "plaintext" in json.loads(body)["supportedInputFormats"]

    st, _, body = call("/cache-info")
    assert "test" in json.loads(body)["cacheStatus"]
    st, _, body = call("/cache-clear", method="POST")
    assert json.loads(body)["status"]["code"] == "SUCCESS"
    st, _, _ = call("/cache-clear")          # GET is rejected
    assert st.startswith("400")

    for path in ("/corpora/test/docs?group=field:lang&outputformat=xml",
                 "/corpora/test/fields/year?outputformat=xml",
                 "/corpora/test/status?outputformat=xml",
                 "/?outputformat=xml"):
        st, _, xml_body = call(path)
        assert st.startswith("200")
        ET.fromstring(xml_body)


def test_mutation_endpoints(ray_session, srv_index, tmp_path):
    """POST /docs (AddToIndex analogue) and DELETE /docs/<pid>: the
    index mutates through update.add/delete_documents and the corpus
    reader reopens with the new state."""
    import shutil

    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import BlsApp
    idx = str(tmp_path / "idx")
    shutil.copytree(srv_index, idx)
    app = BlsApp({"m": IndexReader(idx)}, {"m": idx})
    call = _mkcall(app)

    pages = [{"doc_id": 7, "url": "d7", "text": "a fresh quick doc",
              "lang": "en", "year": 2021, "title": "New Doc"}]
    st, _, body = call("/corpora/m/docs", method="POST",
                       body=json.dumps(pages).encode())
    assert st.startswith("200"), body
    assert json.loads(body)["status"]["code"] == "SUCCESS"
    st, _, body = call("/corpora/m/hits?patt=%22quick%22")
    assert json.loads(body)["summary"]["numberOfHits"] == 3
    st, _, body = call("/corpora/m/docs/d7")
    assert json.loads(body)["docInfo"]["lengthInTokens"] == 4

    st, _, body = call("/corpora/m/docs/d7", method="DELETE")
    assert st.startswith("200"), body
    st, _, body = call("/corpora/m/hits?patt=%22quick%22")
    assert json.loads(body)["summary"]["numberOfHits"] == 2
    st, _, body = call("/corpora/m/status")
    # one per tombstoned id form (doc_id + url hash + generation salt)
    assert json.loads(body)["tombstones"] >= 1

    # a reader-only corpus refuses mutation
    ro = BlsApp({"r": IndexReader(idx)})
    st, _, body = _mkcall(ro)("/corpora/r/docs", method="POST",
                              body=b"[]")
    assert st.startswith("400")


def test_wsgi_live_roundtrip(srv_index):
    """Full HTTP round-trip on localhost (the BLS wire protocol)."""
    from blacklab_ray.server import serve
    httpd, _app = serve({"test": srv_index}, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}/corpora/test"
        with urllib.request.urlopen(
                base + "/hits?patt=%22quick%22") as r:
            data = json.loads(r.read())
        assert data["summary"]["numberOfHits"] == 2
        with urllib.request.urlopen(
                base + "/hits?patt=%22quick%22&outputformat=xml") as r:
            assert r.headers["Content-Type"] == "application/xml"
            ET.fromstring(r.read())
        with urllib.request.urlopen(base) as r:
            info = json.loads(r.read())
        assert info["documentCount"] == 3
        # grouped CSV over the wire
        url = (base + "/hits?patt=%22quick%22&group=hit:word:i"
               "&outputformat=csv")
        with urllib.request.urlopen(url) as r:
            assert r.read().decode().startswith("identity,size")
        # 404 for unknown corpus
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/corpora/nope/hits")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_affinity_routing_same_results(ray_session, small_index):
    """routing="affinity" returns the same results as round-robin and
    deterministically pins a query's term set to one replica."""
    from blacklab_ray.query.service import QueryService
    svc = QueryService(small_index, n_actors=3)
    qs = [{"terms": ["the"]}, {"terms": ["of", "the"]},
          {"terms": ["quick"]}, {"terms": ["the", "of"]}]
    try:
        rr = svc.search_many(qs)
        aff = svc.search_many(qs, routing="affinity")
        for a, b in zip(rr, aff):
            assert a["rows"] == b["rows"]
        # same term SET -> same replica (order-insensitive hash)
        from blacklab_ray.stages.tokenize import hash64
        k1 = hash64("\x00".join(sorted({"of", "the"}))) % 3
        k2 = hash64("\x00".join(sorted({"the", "of"}))) % 3
        assert k1 == k2
    finally:
        svc.shutdown()


def test_federated_corpus_serving(ray_session, tmp_path_factory):
    """A corpus registered as 'dirA,dirB' serves hits/doc-info across
    BOTH sub-indexes (MultiIndexReader behind the same handlers) and
    rejects HTTP mutations."""
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.server import BlsApp, _open_index
    root = tmp_path_factory.mktemp("fedsrv")
    corp = [
        pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "url": ["a0", "a1"],
                  "text": ["the quick fox", "a quick dog"],
                  "lang": ["en", "en"]}),
        pa.table({"doc_id": pa.array([2, 3], pa.int64()),
                  "url": ["b0", "b1"],
                  "text": ["quick snail mail", "slow boat"],
                  "lang": ["en", "en"]}),
    ]
    dirs = []
    for i, tbl in enumerate(corp):
        src = root / f"p{i}.parquet"
        pq.write_table(tbl, str(src))
        idx = str(root / f"idx{i}")
        build_index(str(src), idx,
                    BuildParams(num_buckets=2, n_salts=1,
                                id_column="doc_id"))
        dirs.append(idx)
    spec = ",".join(dirs)
    call = _mkcall(BlsApp({"fed": _open_index(spec)}, {"fed": spec}))

    st, _, body = call("/corpora/fed/hits?patt=%22quick%22&number=10")
    assert st.startswith("200")
    resp = json.loads(body)
    assert resp["summary"]["numberOfHits"] == 3
    pids = {h["docPid"] for h in resp["hits"]}
    assert pids == {"a0", "a1", "b0"}   # hits from BOTH sub-indexes
    assert resp["docInfos"]["b0"]["lengthInTokens"] == 3

    st, _, body = call("/corpora/fed/status")
    assert json.loads(body)["documentCount"] == 4

    st, _, body = call("/corpora/fed/docs/a1",
                       method="DELETE")
    assert not st.startswith("200") and "federated" in body

    # breadth endpoints over the federation: grouped hits span both
    # subs, termfreq sums global stats, autocomplete merges the
    # dictionaries
    st, _, body = call("/corpora/fed/hits?patt=%22quick%22"
                       "&group=hit%3Aword%3Ai")
    groups = json.loads(body)["hitGroups"]
    assert [g["identityDisplay"] for g in groups] == ["quick"]
    assert groups[0]["size"] == 3
    st, _, body = call("/corpora/fed/termfreq?terms=quick,snail")
    assert json.loads(body)["termFreq"] == {"quick": 3, "snail": 1}
    st, _, body = call("/corpora/fed/autocomplete/word?term=s")
    assert "snail" in json.loads(body) and "slow" in json.loads(body)


def test_handle_hits_sort(srv_reader):
    """sort= orders hits by a HitProperty before windowing: context
    word right of the hit, ascending and descending."""
    from blacklab_ray.server import handle_hits
    asc = handle_hits(srv_reader, {"patt": '"quick"',
                                   "sort": "wordright:word:i"})
    # d0: quick -> right "fox"; d1: quick -> right "dog"
    assert [h["docPid"] for h in asc["hits"]] == ["d1", "d0"]
    desc = handle_hits(srv_reader, {"patt": '"quick"',
                                    "sort": "-wordright:word:i"})
    assert [h["docPid"] for h in desc["hits"]] == ["d0", "d1"]
    # by metadata field
    by_year = handle_hits(srv_reader, {"patt": '"quick"',
                                       "sort": "field:year"})
    assert [h["docPid"] for h in by_year["hits"]] == ["d0", "d1"]


def test_handle_hits_sample(srv_reader):
    """sample= / samplenum= / sampleseed=: deterministic seeded hit
    sampling (HashSampleHits hash semantics) applied before the
    window."""
    from blacklab_ray.pipelines.hits import md5_low64
    from blacklab_ray.server import handle_hits
    full = handle_hits(srv_reader, {"patt": '"quick"'})
    assert full["summary"]["numberOfHits"] == 2
    # samplenum=1 keeps the hash-smallest hit, deterministically
    one = handle_hits(srv_reader, {"patt": '"quick"',
                                   "samplenum": "1",
                                   "sampleseed": "5"})
    assert one["summary"]["numberOfHits"] == 1
    again = handle_hits(srv_reader, {"patt": '"quick"',
                                     "samplenum": "1",
                                     "sampleseed": "5"})
    assert one["hits"] == again["hits"]
    # percentage form reproduces the hash-threshold rule exactly:
    # hits are (doc 0, start 1) and (doc 1, start 1)
    pct = handle_hits(srv_reader, {"patt": '"quick"', "sample": "50",
                                   "sampleseed": "5"})
    thresh = int(round(0.5 * (1 << 20)))
    want = sum(md5_low64(f"{d}:1:5") % (1 << 20) < thresh
               for d in (0, 1))
    assert pct["summary"]["numberOfHits"] == want


def test_handle_hits_hitfilter(srv_reader):
    """hitfiltercrit/hitfilterval keep only hits whose property equals
    the value (HitsFiltered analogue)."""
    from blacklab_ray.server import handle_hits
    resp = handle_hits(srv_reader, {
        "patt": '"quick"',
        "hitfiltercrit": "wordright:word:i",
        "hitfilterval": "dog"})
    assert resp["summary"]["numberOfHits"] == 1
    assert resp["hits"][0]["docPid"] == "d1"
    by_meta = handle_hits(srv_reader, {
        "patt": '"quick"',
        "hitfiltercrit": "field:lang", "hitfilterval": "en"})
    assert by_meta["summary"]["numberOfHits"] == 2


def test_handle_hits_calc_colloc(srv_reader):
    """calc=colloc returns context-word frequencies around the hits,
    hit tokens excluded (TermFrequencyList.collocations analogue)."""
    from blacklab_ray.server import handle_hits
    resp = handle_hits(srv_reader, {"patt": '"quick"',
                                    "calc": "colloc",
                                    "wordsaroundhit": "1"})
    # d0: the [quick] fox ; d1: a [quick] dog
    assert resp["tokenFrequencies"] == {"a": 1, "dog": 1,
                                        "fox": 1, "the": 1}
    assert "quick" not in resp["tokenFrequencies"]


def test_colloc_route_honors_hit_params(srv_index):
    """/hits?calc=colloc through the ROUTER composes with samplenum/
    hitfiltercrit (it must reach handle_hits' colloc branch, not a
    param-dropping shortcut), and handle_colloc delegates to the same
    code (identical output, shared default context 10)."""
    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import BlsApp, handle_colloc, handle_hits
    reader = IndexReader(srv_index)
    call = _mkcall(BlsApp({"test": IndexReader(srv_index)}))
    base = "/corpora/test/hits?patt=%22quick%22&calc=colloc" \
           "&wordsaroundhit=1"
    _, _, all_body = call(base)
    all_freqs = json.loads(all_body)["tokenFrequencies"]
    assert sum(all_freqs.values()) >= 2
    # samplenum=1 keeps one hit -> strictly fewer context tokens
    _, _, s_body = call(base + "&samplenum=1&sampleseed=3")
    s_freqs = json.loads(s_body)["tokenFrequencies"]
    assert 0 < sum(s_freqs.values()) < sum(all_freqs.values())
    # hitfiltercrit composes too (no 'fr' doc matches "quick")
    _, _, f_body = call(base + "&hitfiltercrit=field:lang"
                        "&hitfilterval=fr")
    assert json.loads(f_body)["tokenFrequencies"] == {}
    # the two entry points are the same code path (default ctx 10)
    a = handle_colloc(reader, {"patt": '"quick"'})
    b = handle_hits(reader, {"patt": '"quick"', "calc": "colloc"})
    assert a == b


def test_hits_capture_groups_rendered(srv_reader):
    """Hits from a capture-group pattern carry BLS's per-hit
    captureGroups [{name, start, end}] (DStream.java:329 shape);
    patterns without captures omit the entry."""
    from blacklab_ray.server import handle_hits
    resp = handle_hits(srv_reader, {"patt": 'A:"quick"',
                                    "wordsaroundhit": "1"})
    assert resp["summary"]["numberOfHits"] == 2
    for h in resp["hits"]:
        assert h["captureGroups"] == [
            {"name": "A", "start": h["start"], "end": h["end"]}]
    plain = handle_hits(srv_reader, {"patt": '"quick"'})
    assert all("captureGroups" not in h for h in plain["hits"])


def test_hits_capture_groups_xml_and_multitoken(srv_index):
    """Multi-token group captures render as <captureGroups><group>
    in DataStream XML; viewgroup hit lists carry captures too."""
    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import BlsApp, handle_hits_grouped
    call = _mkcall(BlsApp({"test": IndexReader(srv_index)}))
    patt = 'A:("the" "quick")'
    from urllib.parse import quote
    _, _, body = call(f"/corpora/test/hits?patt={quote(patt)}"
                      "&outputformat=xml")
    assert "<captureGroups><group><name>A</name>" in body \
        .replace("\n", "")
    # JSON: start/end of the captured sub-span
    _, _, jbody = call(f"/corpora/test/hits?patt={quote(patt)}")
    h = json.loads(jbody)["hits"][0]
    assert h["captureGroups"][0]["name"] == "A"
    assert h["captureGroups"][0]["end"] - \
        h["captureGroups"][0]["start"] == 2
    # viewgroup path keeps captures
    r = IndexReader(srv_index)
    resp = handle_hits_grouped(r, {"patt": 'A:"quick"',
                                   "group": "field:lang",
                                   "viewgroup": "en"})
    assert all(h["captureGroups"][0]["name"] == "A"
               for h in resp["hits"])


def test_handle_docs_sort(srv_reader):
    """/docs sort= orders before windowing: field:<meta> (collated),
    numhits, pid; '-' prefix descends; doc order is the stable tie."""
    from blacklab_ray.server import handle_docs
    by_year = handle_docs(srv_reader, {"sort": "-field:year"})
    assert [d["docPid"] for d in by_year["docs"]] == ["d2", "d1", "d0"]
    by_lang = handle_docs(srv_reader, {"sort": "field:lang"})
    assert [d["docPid"] for d in by_lang["docs"]] == ["d0", "d1", "d2"]
    by_hits = handle_docs(srv_reader, {"patt": '[word="q.*|f.*"]',
                                       "sort": "-numhits"})
    assert by_hits["docs"][0]["docPid"] == "d0"    # quick+fox = 2 hits
    assert by_hits["docs"][0]["numberOfHits"] == 2
    # windowing applies AFTER the sort
    win = handle_docs(srv_reader, {"sort": "-field:year", "first": 1,
                                   "number": 1})
    assert [d["docPid"] for d in win["docs"]] == ["d1"]
    import pytest as _p
    with _p.raises(KeyError):
        handle_docs(srv_reader, {"sort": "bogus"})


def test_content_store_orig_contents_and_concordances(
        ray_session, tmp_path_factory):
    """store_text builds carry the original text: /docs/<pid>/contents
    serves the STORED original (casing + punctuation preserved), and
    /hits?usecontent=orig cuts raw-text concordances from it by token
    char offsets (ConcordanceType.CONTENT_STORE analogue). Indexes
    without store_text keep the reconstructed-text deviation."""
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.server import handle_doc_contents, handle_hits
    from blacklab_ray.query import IndexReader
    root = tmp_path_factory.mktemp("cstore")
    orig = "The QUICK, brown fox -- jumps!"
    tbl = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "url": ["d0", "d1"],
        "text": [orig, "a quick dog"],
    })
    src = root / "p.parquet"
    pq.write_table(tbl, str(src))
    idx = str(root / "idx")
    build_index(str(src), idx,
                BuildParams(num_buckets=2, n_salts=1,
                            id_column="doc_id", store_text=True))
    r = IndexReader(idx)
    assert handle_doc_contents(r, "d0") == orig
    resp = handle_hits(r, {"patt": '"quick"', "usecontent": "orig",
                           "wordsaroundhit": "1"})
    h0 = next(h for h in resp["hits"] if h["docPid"] == "d0")
    assert h0["match"] == "QUICK"
    assert h0["left"] == "The "
    assert h0["right"] == ", brown"
    # fwd rendering unchanged without the param
    resp_fi = handle_hits(r, {"patt": '"quick"',
                              "wordsaroundhit": "1"})
    h0fi = next(h for h in resp_fi["hits"] if h["docPid"] == "d0")
    assert h0fi["match"]["word"] == ["quick"]
    # a store-less index keeps the deviation (reconstructed text)
    idx2 = str(root / "idx2")
    build_index(str(src), idx2,
                BuildParams(num_buckets=2, n_salts=1,
                            id_column="doc_id"))
    r2 = IndexReader(idx2)
    assert handle_doc_contents(r2, "d0") != orig


def test_doc_contents_patt_highlighting(ray_session, tmp_path_factory):
    """/docs/<pid>/contents?patt= wraps that doc's hits in <hl> within
    the stored original (RequestHandlerDocContents highlighting)."""
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import BlsApp
    root = tmp_path_factory.mktemp("hlstore")
    tbl = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "url": ["d0", "d1"],
        "text": ["The quick fox, the quick dog.", "slow snail"],
    })
    src = root / "p.parquet"
    pq.write_table(tbl, str(src))
    idx = str(root / "idx")
    build_index(str(src), idx,
                BuildParams(num_buckets=2, n_salts=1,
                            id_column="doc_id", store_text=True))
    call = _mkcall(BlsApp({"c": IndexReader(idx)}))
    _, ct, body = call("/corpora/c/docs/d0/contents?patt=%22quick%22")
    assert body == "The <hl>quick</hl> fox, the <hl>quick</hl> dog."
    # no patt -> raw stored original
    _, _, raw = call("/corpora/c/docs/d0/contents")
    assert raw == "The quick fox, the quick dog."


def test_doc_snippet_usecontent_orig(ray_session, tmp_path_factory):
    """/docs/<pid>/snippet?usecontent=orig returns raw-text fragments
    from the stored original (content-store snippet)."""
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import handle_doc_snippet
    root = tmp_path_factory.mktemp("snorig")
    tbl = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "url": ["d0"],
        "text": ["The QUICK, brown fox jumps."],
    })
    src = root / "p.parquet"
    pq.write_table(tbl, str(src))
    idx = str(root / "idx")
    build_index(str(src), idx,
                BuildParams(num_buckets=2, n_salts=1,
                            id_column="doc_id", store_text=True))
    r = IndexReader(idx)
    snip = handle_doc_snippet(r, "d0", {"hitstart": 1, "hitend": 2,
                                        "wordsaroundhit": 1,
                                        "usecontent": "orig"})
    assert snip["left"] == "The " and snip["match"] == "QUICK" \
        and snip["right"] == ", brown"
    # token-array shape preserved without the param
    fi = handle_doc_snippet(r, "d0", {"hitstart": 1, "hitend": 2,
                                      "wordsaroundhit": 1})
    assert fi["match"]["word"] == ["quick"]


def test_hits_listvalues_annotations(ray_session, tmp_path_factory):
    """listvalues= adds parallel annotations (lemma/...) to the
    left/match/right context dicts; unknown names 400 clearly."""
    from blacklab_ray.formats import read_pages
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import handle_hits
    tmp = tmp_path_factory.mktemp("listv")
    lines = ["url\tpos\tword\tlemma",
             "d1\t0\tcats\tcat", "d1\t1\tand\tand", "d1\t2\tdogs\tdog"]
    tsv = tmp / "c.tsv"
    tsv.write_text("\n".join(lines) + "\n")
    idx = str(tmp / "idx")
    build_index(read_pages("tabular-tsv", str(tsv)), idx,
                BuildParams(num_buckets=2, n_salts=1,
                            annotations=("lemma",)))
    r = IndexReader(idx)
    resp = handle_hits(r, {"patt": '"and"', "wordsaroundhit": "1",
                           "listvalues": "lemma"})
    h = resp["hits"][0]
    assert h["match"]["word"] == ["and"]
    assert h["match"]["lemma"] == ["and"]
    assert h["left"]["lemma"] == ["cat"]
    assert h["right"]["lemma"] == ["dog"]
    # default stays word-only
    resp0 = handle_hits(r, {"patt": '"and"', "wordsaroundhit": "1"})
    assert "lemma" not in resp0["hits"][0]["match"]
    import pytest as _p
    with _p.raises(KeyError):
        handle_hits(r, {"patt": '"and"', "listvalues": "nope"})


def test_hits_grouped_compound_criteria(srv_reader):
    """Comma-separated group= composes criteria (HitPropertyMultiple):
    identities join component values with ' / '."""
    from blacklab_ray.server import handle_hits_grouped
    resp = handle_hits_grouped(srv_reader,
                               {"patt": '[word="q.*|s.*"]',
                                "group": "hit:word:i,field:lang"})
    idents = sorted(g["identityDisplay"] for g in resp["hitGroups"])
    assert idents == ["quick / en", "slow / fr", "snail / fr"]
    sizes = {g["identityDisplay"]: g["size"]
             for g in resp["hitGroups"]}
    assert sizes["quick / en"] == 2
    # viewgroup addresses a compound identity
    v = handle_hits_grouped(srv_reader,
                            {"patt": '[word="q.*|s.*"]',
                             "group": "hit:word:i,field:lang",
                             "viewgroup": "quick / en"})
    assert v["summary"]["numberOfHits"] == 2
    # compound sort works too
    from blacklab_ray.server import handle_hits
    s = handle_hits(srv_reader, {"patt": '[word="q.*|s.*"]',
                                 "sort": "field:lang,hit:word:i"})
    assert [h["docPid"] for h in s["hits"]][-1] == "d2"   # fr last? no:
    # en < fr collated; the fr doc's hit sorts last


def test_docs_grouped_viewgroup(srv_reader):
    """/docs?group=field:lang&viewgroup=en returns that group's doc
    list (the docs-grouped group-contents view)."""
    from blacklab_ray.server import handle_docs_grouped
    v = handle_docs_grouped(srv_reader, {"group": "field:lang",
                                         "viewgroup": "en"})
    assert [d["docPid"] for d in v["docs"]] == ["d0", "d1"]
    assert v["summary"]["numberOfDocs"] == 2
    # with patt, per-doc hit counts carry into the view
    v2 = handle_docs_grouped(srv_reader, {"group": "field:lang",
                                          "viewgroup": "en",
                                          "patt": '"quick"'})
    assert all(d["numberOfHits"] == 1 for d in v2["docs"])
    # str: prefix convention accepted
    v3 = handle_docs_grouped(srv_reader, {"group": "field:lang",
                                          "viewgroup": "str:fr"})
    assert [d["docPid"] for d in v3["docs"]] == ["d2"]


def test_hits_grouped_by_multitoken_capture(srv_reader):
    """group=capture:word:i:<NAME> over a multi-token group capture
    uses the captured sub-span's full text as the identity."""
    from blacklab_ray.server import handle_hits_grouped
    resp = handle_hits_grouped(
        srv_reader, {"patt": 'A:("the" "quick") [word="fox"]',
                     "group": "capture:word:i:A"})
    assert [g["identityDisplay"] for g in resp["hitGroups"]] \
        == ["the quick"]
    assert resp["hitGroups"][0]["size"] == 1


def test_index_create_and_delete_lifecycle(ray_session,
                                           tmp_path_factory):
    """POST /corpora/<name> creates an empty data-dir index (searches
    return nothing), POST docs fills it, DELETE /corpora/<name>
    removes it; non-data-dir indexes refuse deletion."""
    import os

    from blacklab_ray.server import BlsApp
    data_dir = str(tmp_path_factory.mktemp("blsdata"))
    app = BlsApp({}, {}, data_dir=data_dir)
    call = _mkcall(app)
    st, _, body = call("/corpora/mycorp?buckets=2", method="POST")
    assert st.startswith("200") and \
        json.loads(body)["status"]["code"] == "SUCCESS"
    st, _, body = call("/corpora/mycorp/hits?patt=%22hello%22")
    assert json.loads(body)["summary"]["numberOfHits"] == 0
    # fill it
    pages = json.dumps([{"url": "u0", "text": "hello world"}]).encode()
    st, _, body = call("/corpora/mycorp/docs", method="POST",
                       body=pages)
    assert json.loads(body)["status"]["code"] == "SUCCESS"
    st, _, body = call("/corpora/mycorp/hits?patt=%22hello%22")
    assert json.loads(body)["summary"]["numberOfHits"] == 1
    # duplicate create rejected; bad names rejected
    st, _, _b = call("/corpora/mycorp", method="POST")
    assert st.startswith("400")
    st, _, _b = call("/corpora/..%2Fevil", method="POST")
    assert st.startswith("400")
    # delete removes dir + registry
    st, _, body = call("/corpora/mycorp", method="DELETE")
    assert json.loads(body)["deleted"] == "mycorp"
    assert not os.path.exists(os.path.join(data_dir, "mycorp"))
    st, _, _b = call("/corpora/mycorp/hits?patt=%22x%22")
    assert not st.startswith("200")


def test_serve_data_dir_autoregister(ray_session, tmp_path_factory):
    """serve(data_dir=...) auto-registers existing data-dir indexes
    and enables create/delete on the live server."""
    import urllib.request

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.server import serve
    data_dir = str(tmp_path_factory.mktemp("servedd"))
    import os

    import pyarrow.parquet as pq
    src = tmp_path_factory.mktemp("servesrc")
    pq.write_table(pa.table({"url": ["a"], "text": ["hello there"]}),
                   str(src / "p.parquet"))
    build_index(str(src), os.path.join(data_dir, "pre"),
                BuildParams(num_buckets=2, n_salts=1))
    httpd, app = serve({}, port=0, data_dir=data_dir)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        j = json.load(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/corpora/pre/hits?patt=%22hello%22"))
        assert j["summary"]["numberOfHits"] == 1
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/corpora/fresh", method="POST")
        assert json.load(urllib.request.urlopen(req))["status"][
            "code"] == "SUCCESS"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/corpora/fresh", method="DELETE")
        assert json.load(urllib.request.urlopen(req))["deleted"] \
            == "fresh"
    finally:
        httpd.shutdown()


def test_input_format_add_delete_and_use(ray_session,
                                         tmp_path_factory):
    """POST /input-formats registers a user .blf.yaml (AddFormat),
    GET lists it, a build can use it, DELETE removes it."""
    from blacklab_ray.formats import read_pages
    from blacklab_ray.server import BlsApp
    app = BlsApp({}, {})
    call = _mkcall(app)
    yml = b"""
documentPath: //doc
annotatedFields:
  contents:
    wordPath: .//w
    annotations:
    - name: word
      valuePath: .
"""
    st, _, body = call("/input-formats?name=httpfmt", method="POST",
                       body=yml)
    assert json.loads(body)["formatName"] == "httpfmt"
    _, _, listing = call("/input-formats")
    assert "httpfmt" in json.loads(listing)["supportedInputFormats"]
    # the registered format actually reads
    p = tmp_path_factory.mktemp("httpfmt") / "d.xml"
    p.write_text("<doc><w>hi</w> <w>there</w></doc>")
    rows = read_pages("httpfmt", str(p)).take_all()
    assert rows[0]["text"].split() == ["hi", "there"]
    st, _, body = call("/input-formats/httpfmt", method="DELETE")
    assert json.loads(body)["deleted"] == "httpfmt"
    _, _, listing = call("/input-formats")
    assert "httpfmt" not in json.loads(listing)[
        "supportedInputFormats"]
    st, _, _b = call("/input-formats/nope", method="DELETE")
    assert st.startswith("404")


def test_upload_file_in_registered_format(ray_session,
                                          tmp_path_factory):
    """The full HTTP lifecycle a BLS user runs: register a .blf.yaml
    format, create an index, UPLOAD a raw file in that format
    (AddToIndex), and search it."""
    from blacklab_ray.server import BlsApp
    data_dir = str(tmp_path_factory.mktemp("upldd"))
    app = BlsApp({}, {}, data_dir=data_dir)
    call = _mkcall(app)
    yml = b"""
documentPath: //doc
annotatedFields:
  contents:
    wordPath: .//w
    annotations:
    - name: word
      valuePath: .
metadata:
  fields:
  - name: title
    valuePath: .//title
pidField: title
"""
    st, _, b1 = call("/input-formats?name=uplfmt", method="POST",
                     body=yml)
    assert json.loads(b1)["formatName"] == "uplfmt"
    st, _, _b = call("/corpora/uplcorp?buckets=2", method="POST")
    assert st.startswith("200")
    xml = (b"<corpus><doc><title>D1</title><w>hello</w> <w>world"
           b"</w></doc></corpus>")
    st, _, b2 = call("/corpora/uplcorp/docs?format=uplfmt"
                     "&filename=d.xml", method="POST", body=xml)
    assert json.loads(b2)["status"]["code"] == "SUCCESS"
    st, _, b3 = call("/corpora/uplcorp/hits?patt=%22hello%22")
    resp = json.loads(b3)
    assert resp["summary"]["numberOfHits"] == 1
    assert resp["hits"][0]["docPid"] == "D1"


def test_store_text_flows_through_add_documents(ray_session,
                                                tmp_path_factory):
    """store_text must reach appended docs too: the create-empty →
    upload → read-stored-contents server workflow (the fix for the
    add_documents tokenizer dropping the flag)."""
    from blacklab_ray.server import BlsApp
    data_dir = str(tmp_path_factory.mktemp("stadd"))
    app = BlsApp({}, {}, data_dir=data_dir)
    call = _mkcall(app)
    call("/corpora/st1?buckets=2&storetext=true", method="POST")
    orig = "The QUICK fox."
    pages = json.dumps([{"url": "u0", "text": orig}]).encode()
    st, _, body = call("/corpora/st1/docs", method="POST", body=pages)
    assert json.loads(body)["status"]["code"] == "SUCCESS"
    st, ct, body = call("/corpora/st1/docs/u0/contents")
    assert body == orig
    # orig concordances in CSV don't crash (string contexts)
    st, ct, body = call("/corpora/st1/hits?patt=%22quick%22"
                        "&usecontent=orig&outputformat=csv")
    assert st.startswith("200") and "QUICK" in body


def test_input_format_body_never_a_path_and_builtins_protected(
        ray_session):
    """POST /input-formats body must not be interpretable as a
    server-side file path; built-in formats can be neither shadowed
    nor deleted."""
    from blacklab_ray.server import BlsApp
    call = _mkcall(BlsApp({}, {}))
    # a path-looking body is parsed AS YAML (a bare string -> 400),
    # never opened from disk
    st, _, body = call("/input-formats?name=evil", method="POST",
                       body=b"/root/repo/README.md")
    assert st.startswith("400")
    # shadowing a built-in name is rejected
    yml = (b"documentPath: //d\nannotatedFields:\n  contents:\n"
           b"    wordPath: .//w\n    annotations:\n"
           b"    - name: word\n      valuePath: .\n")
    st, _, _b = call("/input-formats?name=plaintext", method="POST",
                     body=yml)
    assert st.startswith("400")
    # deleting a built-in is rejected
    st, _, _b = call("/input-formats/plaintext", method="DELETE")
    assert st.startswith("404")


def test_empty_index_metadata_sort_and_annotations(ray_session,
                                                   tmp_path_factory):
    """A freshly created empty index answers metadata sorts and
    annotated routes cleanly (the configured-columns fallback)."""
    import ray.data

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import handle_docs
    idx = str(tmp_path_factory.mktemp("emptymeta") / "idx")
    empty = pa.table({
        "url": pa.array([], pa.string()),
        "text": pa.array([], pa.string()),
        "author": pa.array([], pa.string()),
        "year": pa.array([], pa.int64()),
    })
    build_index(ray.data.from_arrow(empty), idx,
                BuildParams(num_buckets=2, n_salts=1,
                            store_text=True,
                            metadata_fields=(("author", "tokenized"),
                                             ("year", "numeric"))))
    r = IndexReader(idx)
    resp = handle_docs(r, {"sort": "field:author"})
    assert resp["docs"] == []
    resp = handle_docs(r, {"sort": "-field:year"})
    assert resp["docs"] == []


def test_orig_concordances_accented_text_alignment(ray_session,
                                                   tmp_path_factory):
    """usecontent=orig slices the accent-stripped display text, so
    NFKD length changes (ligatures) cannot garble the match window."""
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import handle_hits
    idx = str(tmp_path_factory.mktemp("accent") / "idx")
    # 'ﬁ' NFKD-decomposes to 'fi' (string gets LONGER)
    tbl = pa.table({"doc_id": pa.array([0], pa.int64()),
                    "url": ["d0"],
                    "text": ["ﬁsh eat QUICK fox now"]})
    src = tmp_path_factory.mktemp("accentsrc") / "p.parquet"
    pq.write_table(tbl, str(src))
    build_index(str(src), idx,
                BuildParams(num_buckets=2, n_salts=1,
                            id_column="doc_id", store_text=True))
    r = IndexReader(idx)
    resp = handle_hits(r, {"patt": '"quick"', "usecontent": "orig",
                           "wordsaroundhit": "1"})
    h = resp["hits"][0]
    assert h["match"] == "QUICK", h
    assert h["left"].strip() == "eat" and h["right"].strip() == "fox"


def test_colloc_annotation_param(ray_session, tmp_path_factory):
    """calc=colloc&annotation=lemma collocates the parallel
    annotation's tokens; unknown annotations 404."""
    from blacklab_ray.formats import read_pages
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import handle_hits
    tmp = tmp_path_factory.mktemp("collann")
    lines = ["url\tpos\tword\tlemma",
             "d1\t0\tcats\tcat", "d1\t1\tand\tand",
             "d1\t2\tdogs\tdog"]
    tsv = tmp / "c.tsv"
    tsv.write_text("\n".join(lines) + "\n")
    idx = str(tmp / "idx")
    build_index(read_pages("tabular-tsv", str(tsv)), idx,
                BuildParams(num_buckets=2, n_salts=1,
                            annotations=("lemma",)))
    r = IndexReader(idx)
    resp = handle_hits(r, {"patt": '"and"', "calc": "colloc",
                           "wordsaroundhit": "1",
                           "annotation": "lemma"})
    assert resp["tokenFrequencies"] == {"cat": 1, "dog": 1}
    word = handle_hits(r, {"patt": '"and"', "calc": "colloc",
                           "wordsaroundhit": "1"})
    assert word["tokenFrequencies"] == {"cats": 1, "dogs": 1}
    import pytest as _p
    with _p.raises(KeyError):
        handle_hits(r, {"patt": '"and"', "calc": "colloc",
                        "annotation": "nope"})


def test_server_param_fuzz_no_500(srv_index):
    """Random (sometimes nonsensical) param combos over /hits and
    /docs: the router answers 200/400/404, never a raw 500 — bad
    input must map to the BLS error contract."""
    import itertools
    import random

    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import BlsApp
    call = _mkcall(BlsApp({"test": IndexReader(srv_index)}))
    rng = random.Random(41)
    patts = ['"quick"', '[word="q.*"]', 'A:"quick"', '"quick" "fox"',
             "", "(((", '"nosuchtoken"']
    groups = [None, "hit:word:i", "field:lang", "field:nope",
              "hit:word:i,field:lang", "capture:word:i:A",
              "capture:word:i:NOPE", "bogus:crit"]
    sorts = [None, "hit:word:i", "-field:lang", "numhits", "pid",
             "field:year", "junk"]
    extras = [{}, {"samplenum": "1"}, {"sample": "150"},
              {"hitfiltercrit": "field:lang", "hitfilterval": "en"},
              {"listvalues": "nope"}, {"usecontent": "orig"},
              {"calc": "colloc"}, {"annotation": ""},
              {"first": "-1"}, {"number": "0"},
              {"wordsaroundhit": "99"},
              {"omitemptycapture": "true"},
              {"viewgroup": "zzz"}, {"facets": "field:lang"}]
    from urllib.parse import urlencode
    checked = 0
    for _ in range(120):
        params = {}
        p = rng.choice(patts)
        if p:
            params["patt"] = p
        g = rng.choice(groups)
        if g:
            params["group"] = g
        s = rng.choice(sorts)
        if s:
            params["sort"] = s
        params.update(rng.choice(extras))
        op = rng.choice(["hits", "docs"])
        st, _ct, body = call(f"/corpora/test/{op}?"
                             + urlencode(params))
        code = int(st.split()[0])
        assert code in (200, 400, 404), (op, params, st, body[:200])
        checked += 1
    assert checked == 120


def test_subcorpus_size_grouped_by_field(srv_reader):
    """Metadata grouping carries per-group subcorpusSize (all corpus
    docs with that value, not just hit docs) plus a summary-level
    filter-subcorpus size — ResultHitGroup.java:55,
    ResultHitsGrouped.java:96."""
    from blacklab_ray.server import handle_hits_grouped
    resp = handle_hits_grouped(srv_reader, {"patt": '[word="q.*"]',
                                            "group": "field:lang"})
    # whole corpus: 3 docs, 4+3+2 tokens
    assert resp["summary"]["subcorpusSize"] == {"documents": 3,
                                                "tokens": 9}
    g = resp["hitGroups"][0]
    assert g["identityDisplay"] == "en"
    # subcorpus lang=en: d0 (4 tokens) + d1 (3 tokens)
    assert g["subcorpusSize"] == {"documents": 2, "tokens": 7}


def test_subcorpus_size_respects_filter(srv_reader):
    """findSubcorpusSize ANDs the group value with the request's
    metadata filter (WebserviceOperations.java:500-503)."""
    from blacklab_ray.server import handle_hits_grouped
    resp = handle_hits_grouped(srv_reader,
                               {"patt": '[word="q.*"]',
                                "group": "field:lang",
                                "filter": "year:[2005 TO 2025]"})
    # filter keeps d1 (2010, en, 3 tok) + d2 (2020, fr, 2 tok)
    assert resp["summary"]["subcorpusSize"] == {"documents": 2,
                                                "tokens": 5}
    assert resp["hitGroups"][0]["subcorpusSize"] == {"documents": 1,
                                                     "tokens": 3}


def test_subcorpus_size_only_for_metadata_groups(srv_reader):
    """Non-metadata criteria get no per-group subcorpusSize (the
    reference emits it only when metadataGroupProperties != null,
    RequestHandlerHitsGrouped.java:87-89); compound criteria with a
    field: component do."""
    from blacklab_ray.server import handle_hits_grouped
    resp = handle_hits_grouped(srv_reader, {"patt": '"quick"',
                                            "group": "hit:word:i"})
    assert "subcorpusSize" in resp["summary"]
    assert all("subcorpusSize" not in g for g in resp["hitGroups"])
    resp = handle_hits_grouped(srv_reader,
                               {"patt": '[word="q.*"]',
                                "group": "field:lang,hit:word:i"})
    assert all(g["subcorpusSize"] == {"documents": 2, "tokens": 7}
               for g in resp["hitGroups"])


def test_tokens_in_matching_documents(srv_reader):
    """includetokencount=yes adds tokensInMatchingDocuments to the
    /hits and /docs summaries (RequestHandlerHits.java:76,
    RequestHandlerDocs.java:57); absent without the param."""
    from blacklab_ray.server import handle_docs, handle_hits
    resp = handle_hits(srv_reader, {"patt": '"quick"',
                                    "includetokencount": "yes"})
    assert resp["summary"]["tokensInMatchingDocuments"] == 7
    resp = handle_hits(srv_reader, {"patt": '"quick"'})
    assert "tokensInMatchingDocuments" not in resp["summary"]
    resp = handle_docs(srv_reader, {"includetokencount": "true"})
    assert resp["summary"]["tokensInMatchingDocuments"] == 9
    resp = handle_docs(srv_reader, {"patt": '"quick"',
                                    "includetokencount": "true",
                                    "number": 1})
    # full result set (d0+d1), not just the 1-doc window
    assert resp["summary"]["tokensInMatchingDocuments"] == 7


def test_docs_grouped_subcorpus_size(srv_reader):
    """Docs-grouped: summary subcorpusSize always; per-group only
    with a pattern (ResultDocsGrouped.java:75,95-99)."""
    from blacklab_ray.server import handle_docs_grouped
    resp = handle_docs_grouped(srv_reader, {"group": "field:lang"})
    assert resp["summary"]["subcorpusSize"] == {"documents": 3,
                                                "tokens": 9}
    assert all("subcorpusSize" not in g for g in resp["docGroups"])
    resp = handle_docs_grouped(srv_reader, {"patt": '"quick"',
                                            "group": "field:lang"})
    g = resp["docGroups"][0]
    assert g["identityDisplay"] == "en"
    assert g["subcorpusSize"] == {"documents": 2, "tokens": 7}


def test_hit_property_breadth(srv_reader):
    """decade:/docid/doc/hitposition/fieldlen criteria
    (HitPropertyDocumentDecade, HitPropertyDocumentId,
    HitPropertyDoc, HitPropertyHitPosition,
    DocPropertyAnnotatedFieldLength analogues)."""
    from blacklab_ray.server import handle_hits, handle_hits_grouped
    resp = handle_hits_grouped(srv_reader, {"patt": '[word="q.*"]',
                                            "group": "decade:year"})
    idents = sorted(g["identityDisplay"] for g in resp["hitGroups"])
    assert idents == ["2000-2009", "2010-2019"]
    # decade counts as a metadata criterion -> per-group subcorpusSize
    by_id = {g["identityDisplay"]: g for g in resp["hitGroups"]}
    assert by_id["2000-2009"]["subcorpusSize"] == {"documents": 1,
                                                   "tokens": 4}
    resp = handle_hits_grouped(srv_reader, {"patt": '"quick"',
                                            "group": "docid"})
    assert sorted(g["identityDisplay"] for g in resp["hitGroups"]) \
        == ["0", "1"]
    resp = handle_hits_grouped(srv_reader, {"patt": '"quick"',
                                            "group": "doc"})
    assert sorted(g["identityDisplay"] for g in resp["hitGroups"]) \
        == ["d0", "d1"]
    resp = handle_hits(srv_reader, {"patt": '"quick"',
                                    "sort": "hitposition"})
    starts = [h["start"] for h in resp["hits"]]
    assert starts == sorted(starts)
    resp = handle_hits(srv_reader, {"patt": '"quick"',
                                    "sort": "-fieldlen"})
    # d0 has 4 tokens, d1 has 3 -> d0 first under descending fieldlen
    assert [h["docPid"] for h in resp["hits"]] == ["d0", "d1"]


def test_left_right_context_criteria(srv_reader):
    """left:/right: full-context criteria — left identity is
    nearest-word-first (HitPropertyLeftContext.java:63-66)."""
    from blacklab_ray.server import handle_hits, handle_hits_grouped
    resp = handle_hits_grouped(srv_reader, {"patt": '"fox"',
                                            "group": "left:word:i",
                                            "wordsaroundhit": "2"})
    # d0 = "the quick fox jumps": left context of "fox" nearest-first
    assert resp["hitGroups"][0]["identityDisplay"] == "quick the"
    resp = handle_hits_grouped(srv_reader, {"patt": '"quick"',
                                            "group": "right:word:i",
                                            "wordsaroundhit": "2"})
    idents = sorted(g["identityDisplay"] for g in resp["hitGroups"])
    assert idents == ["dog", "fox jumps"]
    # sort by left context: d1's "a" < d0's "the"
    resp = handle_hits(srv_reader, {"patt": '"quick"',
                                    "sort": "left:word:i"})
    assert [h["docPid"] for h in resp["hits"]] == ["d1", "d0"]


def test_docs_grouped_by_decade(srv_reader):
    """docs?group=decade:<meta> — DocPropertyDecade grouping with
    per-group subcorpusSize under a pattern."""
    from blacklab_ray.server import handle_docs, handle_docs_grouped
    resp = handle_docs_grouped(srv_reader, {"group": "decade:year"})
    assert resp["summary"]["numberOfGroups"] == 3
    idents = sorted(g["identityDisplay"] for g in resp["docGroups"])
    assert idents == ["2000-2009", "2010-2019", "2020-2029"]
    resp = handle_docs_grouped(srv_reader, {"patt": '"quick"',
                                            "group": "decade:year"})
    by_id = {g["identityDisplay"]: g for g in resp["docGroups"]}
    assert set(by_id) == {"2000-2009", "2010-2019"}
    assert by_id["2000-2009"]["subcorpusSize"] == {"documents": 1,
                                                   "tokens": 4}
    assert by_id["2000-2009"]["properties"][0]["name"] == "decade:year"
    # viewgroup by decade identity
    resp = handle_docs_grouped(srv_reader, {"group": "decade:year",
                                            "viewgroup": "2010-2019"})
    assert [d["docPid"] for d in resp["docs"]] == ["d1"]
    # doc sort by decade
    resp = handle_docs(srv_reader, {"sort": "-decade:year"})
    assert [d["docPid"] for d in resp["docs"]] == ["d2", "d1", "d0"]


def test_maxretrieve_maxcount_clamps(srv_reader):
    """BLS maxretrieve/maxcount: hits beyond maxretrieve are not
    retrieved, counting continues to maxcount, stopped* flags set."""
    from blacklab_ray.server import handle_hits
    base = {"patt": '[word="q.*|s.*"]'}
    full = handle_hits(srv_reader, base)
    n_all = full["summary"]["numberOfHits"]
    assert n_all == 4
    resp = handle_hits(srv_reader, {**base, "maxretrieve": "2"})
    assert len(resp["hits"]) == 2
    assert resp["summary"]["numberOfHits"] == 4  # counted past
    assert resp["summary"]["numberOfHitsRetrieved"] == 2
    assert resp["summary"]["stoppedRetrievingHits"] is True
    assert resp["summary"]["stoppedCountingHits"] is False
    resp = handle_hits(srv_reader, {**base, "maxretrieve": "2",
                                    "maxcount": "3"})
    assert resp["summary"]["numberOfHits"] == 3
    assert resp["summary"]["stoppedCountingHits"] is True
    # grouped path carries the flags too
    from blacklab_ray.server import handle_hits_grouped
    resp = handle_hits_grouped(srv_reader, {**base, "maxretrieve": "2",
                                            "group": "hit:word:i"})
    assert resp["summary"]["stoppedRetrievingHits"] is True


def test_include_group_contents(srv_reader):
    """includegroupcontents=yes: groups carry their hits
    (listOfHits) and the response carries docInfos
    (RequestHandlerHitsGrouped.java:61-66,99-101)."""
    from blacklab_ray.server import handle_hits_grouped
    resp = handle_hits_grouped(srv_reader,
                               {"patt": '"quick"',
                                "group": "hit:word:i",
                                "includegroupcontents": "yes"})
    g = resp["hitGroups"][0]
    assert len(g["listOfHits"]) == 2
    assert {h["docPid"] for h in g["listOfHits"]} == {"d0", "d1"}
    assert "d0" in resp["docInfos"]
    # off by default
    resp = handle_hits_grouped(srv_reader, {"patt": '"quick"',
                                            "group": "hit:word:i"})
    assert "listOfHits" not in resp["hitGroups"][0]


def test_doc_infos_carry_metadata(srv_reader):
    """docInfos include metadata field values (ResultDocInfo), with
    listmetadatavalues restricting the listed fields."""
    from blacklab_ray.server import handle_docs, handle_hits
    resp = handle_hits(srv_reader, {"patt": '"quick"'})
    info = resp["docInfos"]["d0"]
    assert info["year"] == ["2000"]
    assert info["title"] == ["The Fox Story"]
    resp = handle_hits(srv_reader, {"patt": '"quick"',
                                    "listmetadatavalues": "year"})
    info = resp["docInfos"]["d0"]
    assert info["year"] == ["2000"] and "title" not in info
    resp = handle_docs(srv_reader, {"number": 1})
    assert resp["docs"][0]["docInfo"]["year"] == ["2000"]


def test_csv_sepline_and_summary(srv_index):
    """csvsepline/csvsummary params (WriteCsv.java:159,308) and
    docGroups CSV rows."""
    from urllib.parse import urlencode
    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import BlsApp
    app = BlsApp({"test": IndexReader(srv_index)})
    call = _mkcall(app)
    st, ct, body = call("/corpora/test/hits?" + urlencode(
        {"patt": '"quick"', "outputformat": "csv",
         "csvsepline": "yes", "csvsummary": "yes"}))
    assert st.startswith("200") and ct == "text/csv"
    lines = body.splitlines()
    assert lines[0] == "sep=,"
    assert lines[1].startswith("docPid,")
    assert any(ln.startswith("summary.numberOfHits,2") for ln in lines)
    st, ct, body = call("/corpora/test/docs?" + urlencode(
        {"group": "field:lang", "outputformat": "csv"}))
    lines = body.splitlines()
    assert lines[0] == "identity,size,numberOfTokens"
    assert "en,2,7" in lines and "fr,1,2" in lines


def test_metrics_endpoint(srv_index):
    """GET /metrics — Prometheus text exposition of request counters,
    per-handler wall time, and per-corpus index gauges (the
    instrumentation module's PrometheusMetricsProvider analogue)."""
    from urllib.parse import urlencode
    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import BlsApp
    app = BlsApp({"test": IndexReader(srv_index)})
    call = _mkcall(app)
    call("/corpora/test/hits?" + urlencode({"patt": '"quick"'}))
    call("/corpora/test/hits?" + urlencode({"patt": '"quick"'}))
    call("/corpora/test/docs")
    call("/corpora/test/docs/d0")
    call("/corpora/test/hits")          # missing patt -> error status
    st, ct, body = call("/metrics")
    assert st.startswith("200") and ct.startswith("text/plain")
    lines = body.splitlines()
    assert ('blacklab_requests_total{handler="hits",method="GET",'
            'status="200"} 2') in lines
    assert ('blacklab_requests_total{handler="docs",method="GET",'
            'status="200"} 1') in lines
    assert any(ln.startswith('blacklab_requests_total{handler='
                             '"doc-info"') for ln in lines)
    assert any(ln.startswith('blacklab_request_seconds_total'
                             '{handler="hits"}') for ln in lines)
    assert 'blacklab_index_documents{corpus="test"} 3' in lines
    assert 'blacklab_index_tokens{corpus="test"} 9' in lines
    # the hits error is counted with its status, and /metrics itself
    # is not self-counted
    assert any('handler="hits"' in ln and 'status="5' in ln or
               'status="4' in ln for ln in lines
               if ln.startswith("blacklab_requests_total"))
    st2, _ct, body2 = call("/metrics")
    assert 'handler="metrics"' not in body2


def test_sharing_endpoint(srv_index):
    """GET/POST /corpora/<name>/sharing — RequestHandlerSharing:
    users[] list persisted to the index dir's .shareWithUsers file."""
    import os
    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import BlsApp
    app = BlsApp({"test": IndexReader(srv_index)},
                 index_dirs={"test": srv_index})
    call = _mkcall(app)
    st, _ct, body = call("/corpora/test/sharing")
    assert st.startswith("200")
    assert json.loads(body) == {"users[]": []}
    st, _ct, body = call(
        "/corpora/test/sharing?users[]=alice&users[]=bob",
        method="POST", body=b"")
    assert st.startswith("200")
    assert json.loads(body)["status"]["code"] == "SUCCESS"
    with open(os.path.join(srv_index, ".shareWithUsers")) as f:
        assert f.read() == "alice\nbob\n"
    st, _ct, body = call("/corpora/test/sharing")
    assert json.loads(body) == {"users[]": ["alice", "bob"]}
    # XML stays well-formed (users[] is not a valid element name)
    st, _ct, body = call("/corpora/test/sharing?outputformat=xml")
    import xml.etree.ElementTree as ET
    x = ET.fromstring(body)
    assert [u.text for u in x.findall(".//user")] == ["alice", "bob"]
    # form-body users[] and un-share via empty POST
    st, _ct, _b = call("/corpora/test/sharing", method="POST",
                       body=b"users[]=carol")
    st, _ct, body = call("/corpora/test/sharing")
    assert json.loads(body) == {"users[]": ["carol"]}
    st, _ct, _b = call("/corpora/test/sharing", method="POST",
                       body=b"")
    st, _ct, body = call("/corpora/test/sharing")
    assert json.loads(body) == {"users[]": []}
    # a reader-only corpus (no index dir) rejects sharing
    app2 = BlsApp({"ro": IndexReader(srv_index)})
    call2 = _mkcall(app2)
    st, _ct, _b = call2("/corpora/ro/sharing")
    assert st.startswith("400")


def test_review_fixes_session12(srv_index):
    """Regression tests for the session-12 review findings."""
    import numpy as np
    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import BlsApp, handle_hits, \
        handle_hits_grouped
    reader = IndexReader(srv_index)
    app = BlsApp({"test": reader}, index_dirs={"test": srv_index})
    call = _mkcall(app)

    # 1. /corpora (one segment) is a clean 404, not an IndexError 500
    st, _ct, _b = call("/corpora")
    assert st.startswith("404")

    # 2. numeric sort criteria order numerically, not lexically:
    # doc d0 'the quick fox jumps' -> 'the' at positions 0 and... use
    # hitposition across docs with 2-digit positions via a fresh doc
    resp = handle_hits(reader, {"patt": '[word="fox|jumps|the"]',
                                "sort": "-hitposition"})
    starts = [h["start"] for h in resp["hits"]]
    assert starts == sorted(starts, reverse=True)

    # 3. maxcount below maxretrieve also caps retrieval
    resp = handle_hits(reader, {"patt": '[word="q.*|s.*"]',
                                "maxcount": "2"})
    assert resp["summary"]["numberOfHits"] == 2
    assert len(resp["hits"]) == 2
    assert resp["summary"]["numberOfHitsRetrieved"] <= 2
    assert resp["summary"]["stoppedCountingHits"] is True

    # 6. grouped summary reports the counted total under clamps,
    # matching the ungrouped response; viewgroup carries the flags
    resp = handle_hits_grouped(reader,
                               {"patt": '[word="q.*|s.*"]',
                                "group": "hit:word:i",
                                "maxretrieve": "2", "maxcount": "3"})
    assert resp["summary"]["numberOfHits"] == 3
    assert resp["summary"]["stoppedRetrievingHits"] is True
    resp = handle_hits_grouped(reader,
                               {"patt": '[word="q.*|s.*"]',
                                "group": "hit:word:i",
                                "maxretrieve": "1",
                                "viewgroup": "quick"})
    assert resp["summary"]["stoppedRetrievingHits"] is True

    # 5. unknown paths collapse to one 'other' metrics label
    call("/scan-123")
    call("/scan-456")
    call('/%22quoted')
    st, _ct, body = call("/metrics")
    assert 'handler="scan-123"' not in body
    assert '"x' not in body.replace('handler="other"', "")
    others = [ln for ln in body.splitlines()
              if 'handler="other"' in ln
              and ln.startswith("blacklab_requests_total")]
    assert others and sum(int(ln.rsplit(" ", 1)[1])
                          for ln in others) >= 3

    # 7. the subcorpus-size scan is cached per reader
    handle_hits_grouped(reader, {"patt": '[word="q.*"]',
                                 "group": "field:lang"})
    assert getattr(reader, "_subcorpus_cache", None)
    n0 = len(reader._subcorpus_cache)
    handle_hits_grouped(reader, {"patt": '[word="q.*"]',
                                 "group": "field:lang"})
    assert len(reader._subcorpus_cache) == n0

    # 10. sharing rejects ids with embedded newlines
    st, _ct, _b = call("/corpora/test/sharing?users[]=a%0Ab",
                       method="POST", body=b"")
    assert st.startswith("400")



def test_grouped_sort_param(srv_reader):
    """sort=size/identity on grouped endpoints (HitGroupPropertySize/
    Identity); largestGroupSize stays the max regardless of order."""
    from blacklab_ray.server import handle_docs_grouped, \
        handle_hits_grouped
    base = {"patt": '[word="q.*|s.*"]', "group": "hit:word:i"}
    resp = handle_hits_grouped(srv_reader, {**base, "sort": "size"})
    sizes = [g["size"] for g in resp["hitGroups"]]
    assert sizes == sorted(sizes)
    assert resp["summary"]["largestGroupSize"] == max(sizes)
    resp = handle_hits_grouped(srv_reader,
                               {**base, "sort": "-identity"})
    idents = [g["identityDisplay"] for g in resp["hitGroups"]]
    assert idents == sorted(idents, reverse=True)
    resp = handle_docs_grouped(srv_reader, {"group": "field:lang",
                                            "sort": "identity"})
    assert [g["identityDisplay"] for g in resp["docGroups"]] == \
        ["en", "fr"]
    # bad sort param is a client error (ValueError -> HTTP 400),
    # not a KeyError (-> 404)
    with pytest.raises(ValueError):
        handle_hits_grouped(srv_reader, {**base, "sort": "bogus"})


def test_order_groups_numeric_and_tiebreak():
    """Numeric group identities (docid/fieldlen/decade) sort by
    number, not string collation; sort=-size keeps the identity
    tie-break ascending (same view as the no-sort default)."""
    from blacklab_ray.server import _order_groups
    items = [(str(i), {"size": 1}) for i in (2, 10, 1, 30, 3)]
    got = [k for k, _g in _order_groups(items, "identity",
                                        numeric=True)]
    assert got == ["1", "2", "3", "10", "30"]
    # decade ranges order by leading year; 'unknown' sorts last
    dec = [(k, {"size": 1}) for k in
           ("1990-1999", "200-209", "unknown", "2010-2019")]
    got = [k for k, _g in _order_groups(dec, "identity",
                                        numeric=True)]
    assert got == ["200-209", "1990-1999", "2010-2019", "unknown"]
    # equal sizes: -size and the default agree (identity asc)
    ties = [("b", {"size": 2}), ("a", {"size": 2}),
            ("c", {"size": 5})]
    default = [k for k, _g in _order_groups(ties, None)]
    explicit = [k for k, _g in _order_groups(ties, "-size")]
    assert default == explicit == ["c", "a", "b"]
    assert [k for k, _g in _order_groups(ties, "size")] == \
        ["a", "b", "c"]


def test_hits_grouped_docid_numeric_order(srv_reader):
    """group=docid&sort=identity orders by doc id number."""
    from blacklab_ray.server import handle_hits_grouped
    resp = handle_hits_grouped(srv_reader, {"patt": '[]',
                                            "group": "docid",
                                            "sort": "identity"})
    idents = [g["identityDisplay"] for g in resp["hitGroups"]]
    assert idents == sorted(idents, key=int)


def test_param_parity_batch(srv_index):
    """The remaining BlackLabServerParams NAMES: pattlang=contextql
    routing, pattgapdata gap filling, docpid restriction (404 when
    unknown), filterlang validation, and accepted no-op execution
    params (usecache/waitfortotal/fimatch)."""
    from urllib.parse import quote

    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import BlsApp
    call = _mkcall(BlsApp({"test": IndexReader(srv_index)}))

    # pattlang=contextql: or / prox route through the SRU parser
    st, _ct, body = call("/corpora/test/hits?patt="
                         + quote('"quick" or "slow"')
                         + "&pattlang=contextql")
    assert st.startswith("200")
    assert json.loads(body)["summary"]["numberOfHits"] == 3
    st, _ct, body = call("/corpora/test/hits?patt="
                         + quote('"quick" prox/distance=2 "jumps"')
                         + "&pattlang=contextql")
    assert st.startswith("200")
    hits = json.loads(body)["hits"]
    assert len(hits) == 1 and hits[0]["docPid"] == "d0"
    # bad pattlang -> 400
    st, _ct, body = call("/corpora/test/hits?patt=%22a%22"
                         "&pattlang=sparql")
    assert st.startswith("400")

    # pattgapdata: @@ gaps filled per TSV row, rows OR'ed
    st, _ct, body = call("/corpora/test/hits?patt="
                         + quote('"@@"') + "&pattgapdata="
                         + quote("quick\nslow"))
    assert st.startswith("200")
    assert json.loads(body)["summary"]["numberOfHits"] == 3

    # docpid restricts hits to one document; unknown pid -> 404
    st, _ct, body = call("/corpora/test/hits?patt=%22quick%22"
                         "&docpid=d1")
    assert st.startswith("200")
    hits = json.loads(body)["hits"]
    assert [h["docPid"] for h in hits] == ["d1"]
    st, _ct, _b = call("/corpora/test/hits?patt=%22quick%22"
                       "&docpid=nope")
    assert st.startswith("404")

    # filterlang: luceneql accepted, anything else 400
    st, _ct, _b = call("/corpora/test/hits?patt=%22quick%22"
                       "&filterlang=luceneql")
    assert st.startswith("200")
    st, _ct, _b = call("/corpora/test/hits?patt=%22quick%22"
                       "&filterlang=contextql")
    assert st.startswith("400")

    # accepted no-op execution params
    st, _ct, body = call("/corpora/test/hits?patt=%22quick%22"
                         "&usecache=no&waitfortotal=yes&fimatch=900")
    assert st.startswith("200")
    assert json.loads(body)["summary"]["numberOfHits"] == 2


def test_contextql_and_translation(srv_reader):
    """pattlang=contextql 'and' is position-coincident
    (TextPatternAnd): same term and'ed with itself matches, two
    different terms do not."""
    from blacklab_ray.server import _normalize_params, handle_hits
    p = {"patt": '"quick" and "quick"', "pattlang": "contextql"}
    _normalize_params(srv_reader, p)
    assert handle_hits(srv_reader, p)["summary"]["numberOfHits"] == 2
    p = {"patt": '"quick" and "fox"', "pattlang": "contextql"}
    _normalize_params(srv_reader, p)
    assert handle_hits(srv_reader, p)["summary"]["numberOfHits"] == 0
    p = {"patt": '"quick" not "fox"', "pattlang": "contextql"}
    _normalize_params(srv_reader, p)
    assert handle_hits(srv_reader, p)["summary"]["numberOfHits"] == 2


def test_version_info_without_index_dir(tmp_path, monkeypatch):
    """A reader with no index_dir (federation) reports empty stamps —
    never a cwd-relative meta.json's mtime."""
    from blacklab_ray.server import _version_info
    (tmp_path / "meta.json").write_text("{}")
    monkeypatch.chdir(tmp_path)

    class NoDir:
        pass
    vi = _version_info(NoDir())
    assert vi["timeCreated"] == "" and vi["timeModified"] == ""


def test_filter_value_containing_and(ray_session, tmp_path):
    """A quoted filter/pid value containing the word AND is ONE
    clause (quote-aware AND split), and a docpid whose url embeds
    ' AND ' round-trips instead of corrupting the spliced filter."""
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader
    from blacklab_ray.query.metafilter import parse_filter_expr
    from blacklab_ray.server import BlsApp

    assert parse_filter_expr('pid:"x AND y" AND lang:en') == (
        "and", [("leaf", "pid", '"x AND y"'),
                ("leaf", "lang", "en")])
    assert parse_filter_expr('pid:"a AND b"') \
        == ("leaf", "pid", '"a AND b"')

    tbl = pa.table({
        "url": ["doc one AND two", "plain"],
        "text": ["quick fox", "quick dog"],
        "lang": ["en", "en"],
    })
    src = tmp_path / "p.parquet"
    pq.write_table(tbl, str(src))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx, BuildParams(num_buckets=2, n_salts=1))
    call = _mkcall(BlsApp({"t": IndexReader(idx)}))
    from urllib.parse import quote
    st, _ct, body = call("/corpora/t/hits?patt=%22quick%22&docpid="
                         + quote("doc one AND two"))
    assert st.startswith("200")
    hits = json.loads(body)["hits"]
    assert [h["docPid"] for h in hits] == ["doc one AND two"]


def test_gap_value_with_quotes(srv_index):
    """pattgapdata values containing double quotes are escaped into
    the pattern and PARSE (cql.jj:85 escaped-string parity) — a 200
    with zero hits, not a 400 parse error."""
    from urllib.parse import quote

    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import BlsApp
    call = _mkcall(BlsApp({"test": IndexReader(srv_index)}))
    st, _ct, body = call("/corpora/test/hits?patt="
                         + quote('"@@"') + "&pattgapdata="
                         + quote('say "hi"\nquick'))
    assert st.startswith("200")
    assert json.loads(body)["summary"]["numberOfHits"] == 2


def test_filter_param_boolean_expressions(srv_reader):
    """The BLS filter param accepts Lucene-QL boolean expressions
    (OR/NOT/parens/wildcards), not just AND conjunctions."""
    from blacklab_ray.server import handle_docs, handle_hits
    resp = handle_docs(srv_reader, {"filter": "lang:fr OR year:2000"})
    assert sorted(d["docPid"] for d in resp["docs"]) == ["d0", "d2"]
    resp = handle_docs(srv_reader, {"filter": "NOT lang:fr"})
    assert sorted(d["docPid"] for d in resp["docs"]) == ["d0", "d1"]
    resp = handle_hits(srv_reader, {
        "patt": '"quick"',
        "filter": "(year:2000 OR year:2010) AND NOT title:dog"})
    assert [h["docPid"] for h in resp["hits"]] == ["d0"]
    # wildcard on a tokenized field
    resp = handle_docs(srv_reader, {"filter": "title:d*"})
    assert [d["docPid"] for d in resp["docs"]] == ["d1"]


def test_contextql_full_grammar(srv_index):
    """Full contextql.jj grammar through the server: parens +
    recursive boolean trees, [index relation] term clauses routed to
    annotations or metadata filters (CompleteQuery analogue),
    wildcards, quoted phrases, scope prefixes, reference-parity
    errors."""
    from urllib.parse import quote

    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import BlsApp
    call = _mkcall(BlsApp({"test": IndexReader(srv_index)}))

    def hits(q, extra=""):
        st, _ct, body = call("/corpora/test/hits?pattlang=contextql"
                             "&patt=" + quote(q) + extra)
        assert st.startswith("200"), (q, body)
        return json.loads(body)

    # parens + nested boolean tree
    r = hits('(quick or slow) and fox')
    assert r["summary"]["numberOfHits"] == 0    # position-coincident
    # token-level and-not (TextPatternAndNot): no matched POSITION is
    # 'slow', so all three survive — not a doc-level exclusion
    r = hits('(quick or snail) not slow')
    assert r["summary"]["numberOfHits"] == 3
    r = hits('(quick or slow) not slow')
    assert r["summary"]["numberOfHits"] == 2
    # wildcards (TextPatternWildcard)
    r = hits('qu?ck or sl*')
    assert r["summary"]["numberOfHits"] == 3
    # quoted phrase -> sequence
    r = hits('"quick fox"')
    assert r["summary"]["numberOfHits"] == 1
    # metadata clause + contents clause (CompleteQuery.and)
    r = hits('quick and lang = en')
    assert [h["docPid"] for h in r["hits"]] == ["d0", "d1"]
    r = hits('quick and title = "dog days"')
    assert [h["docPid"] for h in r["hits"]] == ["d1"]
    # metadata clause composes with a user filter
    r = hits('quick and year = 2000', extra="&filter=lang%3Aen")
    assert [h["docPid"] for h in r["hits"]] == ["d0"]
    # pure-metadata ContextQL on /docs (no pattern)
    st, _ct, body = call("/corpora/test/docs?pattlang=contextql"
                         "&patt=" + quote('lang = fr'))
    assert st.startswith("200")
    assert [d["docPid"] for d in json.loads(body)["docs"]] == ["d2"]
    # scope prefix parsed and discarded
    r = hits('> dc = "http://dublincore.org/" quick')
    assert r["summary"]["numberOfHits"] == 2
    # reference-parity errors -> 400
    for bad in ("a any b", "a < b", "quick dog", "a or lang = en"):
        st, _ct, _b = call("/corpora/test/hits?pattlang=contextql"
                           "&patt=" + quote(bad))
        assert st.startswith("400"), bad


def test_docpid_with_or_filter(srv_index):
    """docpid composes with an OR filter without leaking other docs
    (the spliced pid clause parenthesizes the user filter)."""
    from urllib.parse import quote

    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import BlsApp
    call = _mkcall(BlsApp({"test": IndexReader(srv_index)}))
    st, _ct, body = call(
        "/corpora/test/hits?patt=%22quick%22&docpid=d1&filter="
        + quote("lang:en OR lang:fr"))
    assert st.startswith("200")
    assert [h["docPid"] for h in json.loads(body)["hits"]] == ["d1"]


def test_contextql_quoted_metadata_values(srv_index):
    """ContextQL metadata values outside the bare-token charset are
    quoted into the filter language; embedded double quotes raise."""
    from urllib.parse import quote

    from blacklab_ray.query import IndexReader
    from blacklab_ray.query.contextql import contextql_to_patterns
    from blacklab_ray.server import BlsApp
    p, f = contextql_to_patterns('title = "(draft)"')
    assert p is None and f == 'title:"(draft)"'
    with pytest.raises(ValueError, match="double quote"):
        contextql_to_patterns('title = "say \\"hi\\""')
    # end-to-end: a parenthesized value parses and filters (no 400)
    call = _mkcall(BlsApp({"test": IndexReader(srv_index)}))
    st, _ct, body = call("/corpora/test/docs?pattlang=contextql"
                         "&patt=" + quote('title = "(draft)"'))
    assert st.startswith("200")
    assert json.loads(body)["summary"]["numberOfDocs"] == 0


def test_index_name_validation_reference_cases(ray_session, tmp_path):
    """TestBlsUtils.testIsValidIndexName (Index.PATT_INDEXID): the
    user-scoped 'user@example.com:name' form is valid (stored under
    a path-safe per-user subdir); malformed ids are rejected."""
    import os

    from blacklab_ray.server import BlsApp, _INDEXID_RE
    valid = ["user@example.com:my_index_name",
             "user@example.com:my-index-name1",
             "user@example.com:a1", "0abd"]
    invalid = ["user@example.com:", "user@example.com:bla:bla",
               "user@example.com:bla:", ":user@example.com:bla",
               ":user@example.com:bla:", "", "a*b"]
    for n in valid:
        assert _INDEXID_RE.fullmatch(n), n
    for n in invalid:
        assert _INDEXID_RE.fullmatch(n) is None, n

    app = BlsApp({}, data_dir=str(tmp_path))
    call = _mkcall(app)
    st, _ct, _b = call("/corpora/user@example.com:mine?buckets=2",
                       method="POST", body=b"")
    assert st.startswith("2"), st
    # the FULL id quotes into one flat dir — ':' becomes %3A, which
    # no plain index name can contain, so 'alice' vs 'alice:sub'
    # can never collide
    assert os.path.isdir(
        os.path.join(str(tmp_path), "user%40example.com%3Amine"))
    st, _ct, _b = call("/corpora/a*b", method="POST", body=b"")
    assert st.startswith("400")
    # java \w is ASCII: unicode letters are rejected too
    st, _ct, _b = call("/corpora/caf%C3%A9", method="POST", body=b"")
    assert st.startswith("400")
    # traversal-shaped ids never create dirs
    st, _ct, _b = call("/corpora/..", method="POST", body=b"")
    assert st.startswith("400")
    # a plain index named like the user part does NOT collide
    st, _ct, _b = call("/corpora/user@example.com:mine2?buckets=2",
                       method="POST", body=b"")
    assert st.startswith("2"), st

    # restart: the data-dir scan rediscovers user-scoped indexes
    from blacklab_ray.server import serve
    httpd, app2 = serve({}, port=0, data_dir=str(tmp_path))
    try:
        call2 = _mkcall(app2)
        st, _ct, body = call2("/corpora/user@example.com:mine")
        assert st.startswith("2"), st
    finally:
        httpd.server_close()

    st, _ct, _b = call("/corpora/user@example.com:mine",
                       method="DELETE")
    assert st.startswith("2"), st


# ---- auth layer (wslib auth package analogue) -----------------------------


def _mkcall_auth(app):
    """Like _mkcall but with per-request extra environ (auth headers)."""
    import io

    def call(path, method="GET", body=b"", qs="", headers=None):
        environ = {
            "PATH_INFO": path, "REQUEST_METHOD": method,
            "QUERY_STRING": qs, "CONTENT_LENGTH": str(len(body)),
            "wsgi.input": io.BytesIO(body),
        }
        for k, v in (headers or {}).items():
            environ["HTTP_" + k.upper().replace("-", "_")] = v
        out = {}

        def start(status, hdrs):
            out["status"] = status

        data = b"".join(app(environ, start))
        return out["status"], json.loads(data) if data else None

    return call


def test_auth_private_corpus_acl(ray_session, srv_index, tmp_path):
    """Header auth: a user-scoped corpus is readable by its owner and
    shared users, 403 for others; mutations are owner-only; the
    server-info listing hides inaccessible corpora."""
    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import BlsApp

    import shutil
    priv = str(tmp_path / "alice_priv")
    shutil.copytree(srv_index, priv)
    app = BlsApp({"public": IndexReader(srv_index),
                  "alice:priv": IndexReader(priv)},
                 {"alice:priv": priv},
                 auth_method="http-header")
    call = _mkcall_auth(app)

    # server info: anonymous sees only the public corpus; alice both
    st, r = call("/")
    assert st.startswith("200")
    assert set(r["indices"]) == {"public"}
    assert r["user"]["loggedIn"] is False
    st, r = call("/", headers={"X-BlackLabUser": "alice"})
    assert set(r["indices"]) == {"public", "alice:priv"}
    assert r["user"] == {"loggedIn": True, "canCreateIndex": False,
                         "id": "alice"}

    # reads: owner yes, anonymous/bob 403, public corpus open to all
    st, _ = call("/corpora/alice:priv/hits", qs="patt=%22the%22",
                 headers={"X-BlackLabUser": "alice"})
    assert st.startswith("200")
    for hdrs in ({}, {"X-BlackLabUser": "bob"}):
        st, r = call("/corpora/alice:priv/hits", qs="patt=%22the%22",
                     headers=hdrs)
        assert st.startswith("403")
        assert r["error"]["code"] == "NOT_AUTHORIZED"
    st, _ = call("/corpora/public/hits", qs="patt=%22the%22")
    assert st.startswith("200")

    # sharing: owner shares with bob -> bob can read, carol cannot;
    # bob cannot re-share or mutate
    st, _ = call("/corpora/alice:priv/sharing", method="POST",
                 qs="users%5B%5D=bob",
                 headers={"X-BlackLabUser": "alice"})
    assert st.startswith("200")
    st, _ = call("/corpora/alice:priv/hits", qs="patt=%22the%22",
                 headers={"X-BlackLabUser": "bob"})
    assert st.startswith("200")
    st, _ = call("/corpora/alice:priv/hits", qs="patt=%22the%22",
                 headers={"X-BlackLabUser": "carol"})
    assert st.startswith("403")
    st, _ = call("/corpora/alice:priv/sharing", method="POST",
                 qs="users%5B%5D=bob&users%5B%5D=carol",
                 headers={"X-BlackLabUser": "bob"})
    assert st.startswith("403")
    st, _ = call("/corpora/alice:priv/docs/u1", method="DELETE",
                 headers={"X-BlackLabUser": "bob"})
    assert st.startswith("403")


def test_auth_create_requires_user_scope(ray_session, tmp_path):
    """With auth enabled, logged-in users create PRIVATE (user-scoped)
    corpora only, and anonymous users cannot mutate at all."""
    from blacklab_ray.server import BlsApp

    app = BlsApp({}, {}, data_dir=str(tmp_path / "data"),
                 auth_method="debug-fixed", auth_fixed_user="alice")
    (tmp_path / "data").mkdir()
    call = _mkcall_auth(app)
    st, r = call("/corpora/plain", method="POST")
    assert st.startswith("403") and "user-scoped" in r["error"]["message"]
    st, r = call("/corpora/alice:mine", method="POST")
    assert st.startswith("200")
    st, r = call("/corpora/bob:theirs", method="POST")
    assert st.startswith("403")
    st, r = call("/")
    assert "alice:mine" in r["indices"]
    assert r["user"]["canCreateIndex"] is True

    # anonymous mutation with header auth on
    anon = BlsApp({}, {}, data_dir=str(tmp_path / "data"),
                  auth_method="http-header")
    call2 = _mkcall_auth(anon)
    st, r = call2("/corpora/x", method="POST")
    assert st.startswith("403")


def test_auth_none_is_unenforced(ray_session, srv_index):
    """auth_method='none' (default): the pre-auth behavior — no user,
    no ACL, user-scoped ids fully accessible (backward compat)."""
    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import BlsApp

    app = BlsApp({"u:priv": IndexReader(srv_index)})
    call = _mkcall_auth(app)
    st, r = call("/corpora/u:priv/hits", qs="patt=%22the%22")
    assert st.startswith("200")
    st, r = call("/")
    assert r["user"]["loggedIn"] is False


def test_auth_top_level_routes(ray_session, srv_index, tmp_path):
    """With auth enabled, cache-clear/input-formats mutations need a
    logged-in user and cache-info lists only visible corpora (review
    fix: the ACL initially covered /corpora routes only)."""
    import shutil

    from blacklab_ray.query import IndexReader
    from blacklab_ray.server import BlsApp

    priv = str(tmp_path / "p")
    shutil.copytree(srv_index, priv)
    app = BlsApp({"pub": IndexReader(srv_index),
                  "alice:p": IndexReader(priv)}, {"alice:p": priv},
                 auth_method="http-header", admin_users=("root",))
    call = _mkcall_auth(app)
    # anonymous mutations refused
    st, r = call("/cache-clear", method="POST")
    assert st.startswith("403")
    st, r = call("/input-formats", method="POST", body=b"name: x")
    assert st.startswith("403")
    st, r = call("/input-formats/whatever", method="DELETE")
    assert st.startswith("403")
    # cache-clear is ADMIN-only under auth (reference: debug mode)
    st, r = call("/cache-clear", method="POST",
                 headers={"X-BlackLabUser": "bob"})
    assert st.startswith("403")
    st, r = call("/cache-clear", method="POST",
                 headers={"X-BlackLabUser": "root"})
    assert st.startswith("200")
    # cache-info hides the private corpus from anonymous/others
    st, r = call("/cache-info")
    assert "alice:p" not in json.dumps(r)
    st, r = call("/cache-info", headers={"X-BlackLabUser": "alice"})
    assert st.startswith("200")
