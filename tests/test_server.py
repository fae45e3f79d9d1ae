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
