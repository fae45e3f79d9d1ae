"""Input-format registry: plaintext + tabular readers produce the
canonical pages schema and index identically to equivalent text."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from blacklab_ray.formats import formats, read_pages, register_format


TEXTS = {
    "docs/a.txt": "the quick brown fox jumps over the lazy dog",
    "docs/b.txt": "pack my box with five dozen liquor jugs",
    "docs/c.txt": "the five boxing wizards jump quickly",
}


@pytest.fixture()
def plaintext_dir(tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    for name, text in TEXTS.items():
        (tmp_path / name).write_text(text)
    return str(d)


def test_registry_lists_builtins():
    assert {"webtext-html", "webtext-text", "plaintext",
            "tabular-tsv", "tabular-csv"} <= set(formats())
    with pytest.raises(ValueError, match="unknown input format"):
        read_pages("no-such-format", [])


def test_plaintext_reader(ray_session, plaintext_dir):
    ds = read_pages("plaintext", plaintext_dir)
    rows = {os.path.basename(r["url"]): r for r in ds.take_all()}
    assert set(rows) == {"a.txt", "b.txt", "c.txt"}
    assert rows["a.txt"]["text"] == TEXTS["docs/a.txt"]
    assert rows["b.txt"]["html"] == TEXTS["docs/b.txt"].encode()


def test_tabular_reader_matches_plaintext_index(ray_session, tmp_path,
                                                plaintext_dir):
    """A word-per-line TSV of the same corpus indexes to identical
    term statistics (DocIndexerTabular vs DocIndexerPlainText parity)."""
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader, search_taat

    # build from plaintext
    idx_p = str(tmp_path / "idx_p")
    build_index(read_pages("plaintext", plaintext_dir), idx_p,
                BuildParams(num_buckets=2, n_salts=1))

    # the same docs as (url, pos, word) TSV — urls must match the
    # plaintext paths so doc ids coincide
    lines = ["url\tpos\tword"]
    for name, text in TEXTS.items():
        url = os.path.join(str(tmp_path), name)
        for i, w in enumerate(text.split()):
            lines.append(f"{url}\t{i}\t{w}")
    tsv = tmp_path / "corpus.tsv"
    tsv.write_text("\n".join(lines) + "\n")
    idx_t = str(tmp_path / "idx_t")
    build_index(read_pages("tabular-tsv", str(tsv)), idx_t,
                BuildParams(num_buckets=2, n_salts=1))

    rp, rt = IndexReader(idx_p), IndexReader(idx_t)
    tp = rp.terms_table.sort_by("term").to_pylist()
    tt = rt.terms_table.sort_by("term").to_pylist()
    assert tp == tt
    a = search_taat(rp, ["the", "five"], k=10)
    b = search_taat(rt, ["the", "five"], k=10)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()


def test_tabular_csv_and_custom_format(ray_session, tmp_path):
    csv = tmp_path / "c.csv"
    csv.write_text("url,pos,word\nd1,0,hello\nd1,1,world\nd2,0,bye\n")
    ds = read_pages("tabular-csv", str(csv))
    rows = {r["url"]: r["text"] for r in ds.take_all()}
    assert rows == {"d1": "hello world", "d2": "bye"}
    # extension slot: registering a custom format makes it resolvable
    register_format("null-format", lambda paths, **o: None)
    assert "null-format" in formats()


def test_lemma_annotation_end_to_end(ray_session, tmp_path):
    """tsv-frog-style (url, pos, word, lemma) input -> parallel lemma
    annotation -> CQL [lemma=...] routing (the reference's
    multi-annotation bread and butter)."""
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader, search_taat
    from blacklab_ray.query.cql import cql_spans
    from blacklab_ray.stages.tokenize import hash64
    docs = {
        "d1": [("the", "the"), ("cats", "cat"), ("ran", "run"),
               ("home", "home")],
        "d2": [("a", "a"), ("cat", "cat"), ("runs", "run"),
               ("fast", "fast")],
        "d3": [("dogs", "dog"), ("run", "run"), ("the", "the"),
               ("race", "race")],
    }
    lines = ["url\tpos\tword\tlemma"]
    for url, toks in docs.items():
        for i, (w, l) in enumerate(toks):
            lines.append(f"{url}\t{i}\t{w}\t{l}")
    tsv = tmp_path / "c.tsv"
    tsv.write_text("\n".join(lines) + "\n")
    ds = read_pages("tabular-tsv", str(tsv))
    idx = str(tmp_path / "idx")
    build_index(ds, idx,
                BuildParams(num_buckets=2, n_salts=1,
                            annotations=("lemma",)))
    r = IndexReader(idx)
    assert "lemma" in r.annotations()
    # lemma stats: 'run' occurs in all three docs under the lemma
    # annotation but only once as a word form
    assert r.term_stats(["run"], "lemma")["run"] == (3, 3)
    assert r.term_stats(["run"])["run"][0] == 1
    # lemma BM25 search hits all three docs
    res = search_taat(r, ["run"], k=10, sensitivity="lemma")
    assert set(res["doc_id"].to_pylist()) == {hash64(u) for u in docs}
    # CQL routing: [lemma="cat"] [word="run.*"] — only d2's "runs"
    # matches the word regex ("ran" in d1 does not)
    t = cql_spans(r, '[lemma="cat"] [word="run.*"]')
    assert t["doc_id"].to_pylist() == [hash64("d2")]
    # lemma-routed second position catches both surface forms
    t1 = cql_spans(r, '[lemma="cat"] [lemma="run"]')
    assert sorted(t1["doc_id"].to_pylist()) == \
        sorted([hash64("d1"), hash64("d2")])
    # unknown annotation errors with the fix hint
    import pytest as _pt
    with _pt.raises(FileNotFoundError, match="annotation"):
        cql_spans(r, '[pos="VERB"]')


def test_annotation_misalignment_raises(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from blacklab_ray.index import BuildParams, build_index
    pages = pa.table({
        "url": pa.array(["u1"], pa.string()),
        "warc_ts": pa.array([0], pa.timestamp("us")),
        "html": pa.array([b""], pa.binary()),
        "text": pa.array(["three token text"], pa.string()),
        "lemma": pa.array([["only", "two"]], pa.list_(pa.string())),
        "lang": pa.array(["en"], pa.string()),
    })
    src = tmp_path / "p"
    src.mkdir()
    pq.write_table(pages, str(src / "x.parquet"))
    with pytest.raises(Exception, match="misaligned"):
        build_index(str(src), str(tmp_path / "idx"),
                    BuildParams(num_buckets=2, n_salts=1,
                                annotations=("lemma",)))


def test_xml_format(ray_session, tmp_path):
    """Config-driven XML extraction: per-element docs + text tags."""
    xml = """<corpus>
      <TEI><teiHeader><title>Doc One</title></teiHeader>
        <body><p>the quick fox</p><p>jumps high</p></body></TEI>
      <TEI><teiHeader><title>Doc Two</title></teiHeader>
        <body><p>lazy dogs sleep</p></body></TEI>
    </corpus>"""
    f = tmp_path / "corpus.xml"
    f.write_text(xml)
    ds = read_pages("tei", str(f))
    rows = sorted(ds.take_all(), key=lambda r: r["url"])
    assert len(rows) == 2
    assert rows[0]["url"].endswith("#0")
    assert rows[0]["text"] == "the quick fox\njumps high"
    assert rows[1]["text"] == "lazy dogs sleep"
    # whole-file mode grabs everything
    ds2 = read_pages("xml", str(f))
    rows2 = ds2.take_all()
    assert len(rows2) == 1
    assert "Doc One" in rows2[0]["text"]
    # and it indexes + searches end-to-end
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader, search_taat
    idx = str(tmp_path / "idx")
    build_index(read_pages("tei", str(f)), idx,
                BuildParams(num_buckets=2, n_salts=1))
    r = IndexReader(idx)
    assert r.n_docs == 2
    assert search_taat(r, ["fox"], k=5).num_rows == 1


SKETCH_WPL = """<doc id="d1" lang="en" year="2001">
<p>
<s>
Hello\tUH\thello
<g/>
,\t,\t,
world\tNN\tworld
</s>
</p>
</doc>
<doc id="d2">
<s>
Bye\tUH\tbye
</s>
</doc>
"""


def test_sketch_wpl_reader(ray_session, tmp_path):
    """sketch-wpl.blf.yaml: word/pos/lemma columns, <doc> attrs →
    metadata, inline <s>/<p> → spans, <g/> glue → empty punct."""
    from blacklab_ray.formats import read_pages
    p = tmp_path / "c.wpl"
    p.write_text(SKETCH_WPL)
    t = read_pages("sketch-wpl", [str(p)],
                   meta_fields=("id", "lang", "year")).take_all()
    assert len(t) == 2
    d1 = next(r for r in t if r["url"] == "d1")
    assert d1["text"] == "Hello , world"
    assert d1["lemma"] == ["hello", ",", "world"]
    assert d1["pos"] == ["UH", ",", "NN"]
    assert d1["lang"] == "en"
    assert d1["meta_year"] == "2001"
    # glue tag: no space between Hello and ","
    assert d1["punct"] == ["", "", " ", ""]
    names = sorted((s["name"], s["start"], s["end"])
                   for s in d1["tags"])
    assert names == [("p", 0, 3), ("s", 0, 3)]
    d2 = next(r for r in t if r["url"] == "d2")
    assert d2["text"] == "Bye" and d2["lang"] is None


def test_sketch_wpl_glue_space_variant(ray_session, tmp_path):
    """A self-closing glue tag written as '<g />' is still glue
    (ADVICE r3: only the exact '<g/>' string was recognized)."""
    from blacklab_ray.formats import read_pages
    p = tmp_path / "g.wpl"
    p.write_text(SKETCH_WPL.replace("<g/>", "<g />"))
    t = read_pages("sketch-wpl", [str(p)],
                   meta_fields=("id",)).take_all()
    d1 = next(r for r in t if r["url"] == "d1")
    assert d1["punct"] == ["", "", " ", ""]


def test_sketch_wpl_punct_aware_kwic(ray_session, tmp_path):
    """punct rides the forward index and kwic_fwd renders original
    spacing: the glue tag makes 'Hello,' (no space) in the left
    context."""
    from blacklab_ray.formats import read_pages
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.pipelines.hits import kwic_from_forward_index
    p = tmp_path / "c.wpl"
    p.write_text(SKETCH_WPL)
    ds = read_pages("sketch-wpl", [str(p)])
    idx = str(tmp_path / "idx")
    build_index(ds, idx, BuildParams(num_buckets=2, n_salts=1,
                                     analyzer="whitespace"))
    out = kwic_from_forward_index(idx, "world", context=2).take_all()
    assert len(out) == 1
    assert out[0]["left"] == "Hello,"


REF_FORMATS = "/root/reference/core/src/main/resources/formats"


@pytest.mark.skipif(not os.path.isdir(REF_FORMATS),
                    reason="reference formats dir not present")
def test_load_reference_blf_yaml_files():
    """Every shipped XML .blf.yaml parses into an XmlFormatConfig
    (tabular/text configs route to the native readers with a clear
    error) — a reference user's own format file is accepted as-is."""
    from blacklab_ray.stages.blfyaml import load_blf_yaml
    xml_ok, routed = [], []
    for fn in sorted(os.listdir(REF_FORMATS)):
        if not fn.endswith(".blf.yaml"):
            continue
        path = os.path.join(REF_FORMATS, fn)
        try:
            cfg = load_blf_yaml(path)
            assert cfg.word_path or cfg.document_path
            xml_ok.append(fn)
        except ValueError as e:
            assert "native" in str(e), (fn, e)
            routed.append(fn)
    assert len(xml_ok) >= 8, (xml_ok, routed)   # the xml family
    # cmdi (metadata-only, linked documents) loads too
    assert "cmdi.blf.yaml" in xml_ok
    assert any("tsv" in f or "csv" in f or "txt" in f
               for f in routed)


def test_register_yaml_format_end_to_end(ray_session, tmp_path):
    """A user-authored .blf.yaml registers and reads a corpus through
    the config-driven XML engine: words, annotations, punct, inline
    tags, static + forEachPath metadata."""
    from blacklab_ray.formats import read_pages, register_yaml_format
    yml = """
displayName: my user format
documentPath: //doc
annotatedFields:
  contents:
    containerPath: .//body
    wordPath: .//w
    punctPath: .//text()[not(ancestor::w)]
    annotations:
    - name: word
      valuePath: .
    - name: lemma
      valuePath: "@lem"
    inlineTags:
    - path: .//s
metadata:
  containerPath: .//meta
  fields:
  - name: title
    valuePath: title
  - forEachPath: kv
    namePath: "@k"
    valuePath: .
pidField: title
"""
    name = register_yaml_format(yml, name="userfmt")
    assert name == "userfmt"
    xml = ("<root><doc><meta><title>T1</title>"
           "<kv k='lang'>en</kv></meta>"
           "<body><s><w lem='the'>The</w> <w lem='cat'>cats</w>"
           "</s></body></doc></root>")
    p = tmp_path / "c.xml"
    p.write_text(xml)
    rows = read_pages("userfmt", str(p)).take_all()
    assert len(rows) == 1
    r = rows[0]
    assert r["url"] == "T1"                 # pidField routing
    assert r["text"].split() == ["The", "cats"]
    assert r["lemma"] == ["the", "cat"]
    assert r["meta_title"] == "T1" or r.get("title") == "T1"


def test_subannotations_folia_style(ray_session, tmp_path):
    """Subannotations (ConfigAnnotation.java:42-65) index as separate
    parent_<name> annotations (AnnotatedFieldNameUtil.java:32-35):
    a basePath-relative static valuePath plus a forEachPath fill
    (folia.blf.yaml's folia:feat @subset/@class), queried with the
    `[pos/head="..."]` annotName production."""
    from blacklab_ray.formats import read_pages, register_yaml_format
    yml = """
displayName: subannot test
documentPath: //doc
annotatedFields:
  contents:
    containerPath: .//body
    wordPath: .//w
    annotations:
    - name: word
      valuePath: .
    - name: pos
      basePath: p
      valuePath: "@class"
      subannotations:
      - name: head
        valuePath: "@head"
      - name: getal
      - forEachPath: feat
        namePath: "@subset"
        valuePath: "@class"
metadata:
  fields:
  - name: title
    valuePath: .//title
pidField: title
"""
    name = register_yaml_format(yml, name="subfmt")
    xml = ("<root><doc><title>D1</title><body>"
           "<w><p class='WW' head='V'><feat subset='getal' "
           "class='ev'/><feat subset='ignored' class='x'/></p>"
           "loopt</w> "
           "<w><p class='N' head='N'><feat subset='getal' "
           "class='mv'/></p>katten</w>"
           "</body></doc></root>")
    p = tmp_path / "c.xml"
    p.write_text(xml)
    rows = read_pages(name, str(p)).take_all()
    assert len(rows) == 1
    r = rows[0]
    assert r["text"].split() == ["loopt", "katten"]
    assert r["pos"] == ["WW", "N"]          # basePath-relative value
    assert r["pos_head"] == ["V", "N"]      # static subannotation
    assert r["pos_getal"] == ["ev", "mv"]   # forEachPath fill
    assert "pos_ignored" not in r           # undeclared names dropped

    # build + query through the annot/subannot CQL production
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader
    from blacklab_ray.query.cql import cql_spans
    idx = str(tmp_path / "idx")
    build_index(read_pages(name, str(p)), idx,
                BuildParams(num_buckets=2, n_salts=1,
                            annotations=("pos", "pos_head",
                                         "pos_getal")))
    rd = IndexReader(idx)
    t = cql_spans(rd, '[pos/head="V"]')
    assert t["start"].to_pylist() == [0]
    t = cql_spans(rd, '[pos/getal="mv"]')
    assert t["start"].to_pylist() == [1]
    t = cql_spans(rd, '[pos="WW" & pos/getal="ev"]')
    assert t["start"].to_pylist() == [0]


def test_reference_folia_config_subannotations():
    """The REAL folia.blf.yaml loads with basePath-relative pos and
    parent_sub annotation names."""
    import os as _os
    if not _os.path.isdir(REF_FORMATS):
        pytest.skip("reference formats dir not present")
    from blacklab_ray.stages.blfyaml import load_blf_yaml
    cfg = load_blf_yaml(_os.path.join(REF_FORMATS, "folia.blf.yaml"))
    assert cfg.annotations["pos"] == "folia:pos/@class"
    assert "pos_head" in cfg.annotations
    assert cfg.annotations["pos_head"] == "folia:pos/@head"
    assert "pos_getal" in cfg.annotations       # declared, no path
    assert cfg.annotations["pos_getal"] is None
    assert cfg.subannotation_foreach and \
        cfg.subannotation_foreach[0][0] == "pos"


# ---------------------------------------------------------------------------
# standoff SPAN annotations (TestStandoffSpans.java)
# ---------------------------------------------------------------------------

REF_STANDOFF = "/root/reference/engine/src/test/resources/standoff"


def test_standoff_spans_reference_fixture(ray_session, tmp_path):
    """TestStandoffSpans.java replicated over the reference's own
    tei-standoff-spans.blf.yaml + test.xml: spanGrp/span standoff
    annotations become queryable <character/> tag spans, start/end
    resolved through BOTH w/@xml:id word ids and anchor/@synch
    position markers (inline-tag tokenIdPath).

    Expected spans per the reference test's assertions: (0,2)
    [time-based, exclusive anchor end — the asserted-correct value;
    the reference impl's known off-by-one yields 3 and the test
    comment calls that wrong] and (3,5) [inclusive word end]."""
    if not os.path.isdir(REF_STANDOFF):
        pytest.skip("reference standoff dir not present")
    from blacklab_ray.formats import register_yaml_format
    with open(os.path.join(REF_STANDOFF,
                           "tei-standoff-spans.blf.yaml")) as f:
        name = register_yaml_format(f.read(), name="tei-standoff")
    rows = read_pages(name,
                      os.path.join(REF_STANDOFF, "test.xml")).take_all()
    assert len(rows) == 1
    r = rows[0]
    # tokens: w w pause w w vocal incident (wordPath matches all four
    # element kinds); element annotation via name()
    assert r["element"] == ["w", "w", "pause", "w", "w", "vocal",
                            "incident"]
    ch = sorted((t["start"], t["end"]) for t in r["tags"]
                if t["name"] == "character")
    assert ch == [(0, 2), (3, 5)]
    # span annotations land as tag attributes
    attrs = {(t["start"], t["end"]): t["attrs"] for t in r["tags"]
             if t["name"] == "character"}
    assert "value=Santa Claus" in attrs[(0, 2)]
    assert "value=Easter Bunny" in attrs[(3, 5)]

    # build + query <character/> like SpanQueryTags
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader
    from blacklab_ray.query.cql import cql_spans
    idx = str(tmp_path / "idx")
    build_index(read_pages(name, os.path.join(REF_STANDOFF,
                                              "test.xml")),
                idx, BuildParams(num_buckets=2, n_salts=1))
    rd = IndexReader(idx)
    t = cql_spans(rd, "<character/>")
    got = sorted(zip(t["start"].to_pylist(), t["end"].to_pylist()))
    assert got == [(0, 2), (3, 5)]


def test_blf_yaml_duplicate_keys_rejected():
    """TestYaml.java: duplicate mapping keys in a .blf.yaml are a
    configuration error (InputFormatReader), not YAML last-wins —
    the reference's own nodups.blf.yaml fixture must be rejected."""
    from blacklab_ray.stages.blfyaml import load_blf_yaml
    nodups = ("/root/reference/engine/src/test/resources/yaml/"
              "nodups.blf.yaml")
    if not os.path.exists(nodups):
        pytest.skip("reference yaml dir not present")
    with pytest.raises(ValueError, match="Duplicate"):
        load_blf_yaml(nodups)
    with pytest.raises(ValueError, match="Duplicate"):
        load_blf_yaml("documentPath: //a\ndocumentPath: //b\n",
                      allow_path=False)


def test_capture_value_paths(ray_session, tmp_path):
    """captureValuePaths (ConfigAnnotation.java:55-56,
    DocIndexerXPath.java:693-702): per word element each capture
    path's string value substitutes $1..$9 into the valuePath before
    evaluation — the nodups.blf.yaml lemma-join shape, where a word
    without its own @lemma inherits it from a following tei:join
    element whose @target lists the word's xml:id."""
    from blacklab_ray.formats import read_pages, register_yaml_format
    yml = """
documentPath: //TEI
annotatedFields:
  contents:
    containerPath: text
    wordPath: .//w
    annotations:
    - name: word
      valuePath: .
    - name: lemma
      captureValuePaths:
      - "@xml:id"
      valuePath: "@lemma | following-sibling::join[position()=1 and\
 '$1'!='' and contains(concat(@target,' '),'#$1 ')]/@lemma"
"""
    name = register_yaml_format(yml, name="capfmt")
    xml = ("<TEI><text>"
           "<w xml:id='a1' lemma='direct'>one</w>"
           "<w xml:id='a2'>two</w>"
           "<w xml:id='a3'>three</w>"
           "<join target='#a2 #a3' lemma='joined'/>"
           "<w xml:id='a4'>four</w>"
           "</text></TEI>")
    p = tmp_path / "c.xml"
    p.write_text(xml)
    rows = read_pages(name, str(p)).take_all()
    assert len(rows) == 1
    r = rows[0]
    assert r["text"].split() == ["one", "two", "three", "four"]
    assert r["lemma"] == ["direct", "joined", "joined", ""]


# ---- convert/tag plugin chain (DocIndexerConvertAndTag analogue) ----------


MD_DOC = """# Crawl Report

First paragraph with **bold** text and a [link](http://example.com).

- alpha item
- beta item

Second paragraph mentions zebras.
"""


def test_markdown_to_tei_converter():
    from blacklab_ray.stages.convert import (markdown_to_tei,
                                             whitespace_tag_tei)
    tei = markdown_to_tei(MD_DOC.encode())
    s = tei.decode()
    assert "<title>Crawl Report</title>" in s
    assert "<head>Crawl Report</head>" in s
    assert "<p>First paragraph with bold text and a link.</p>" in s
    assert "<item>alpha item</item>" in s
    tagged = whitespace_tag_tei(tei).decode()
    assert "<w>zebras.</w>" in tagged
    assert "<w>alpha</w><w>item</w>" in tagged.replace("> <", "><")


def test_convert_plugin_format_chain(ray_session, tmp_path):
    """The full chain the reference's convertPlugin/tagPlugin keys
    drive: markdown file → TEI (convert) → <w>-tokenized TEI (tag) →
    .blf.yaml extraction → index build → CQL search."""
    from blacklab_ray import formats as F
    from blacklab_ray.formats import read_pages, register_yaml_format
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader
    from blacklab_ray.query.cql import cql_spans

    src = tmp_path / "docs"
    src.mkdir()
    (src / "a.md").write_text(MD_DOC)
    name = register_yaml_format("""
name: md-tei-test
fileType: xml
convertPlugin: markdown-to-tei
tagPlugin: whitespace-tagger
documentPath: //TEI
annotatedFields:
  contents:
    containerPath: .//body
    wordPath: .//w
    annotations:
      - name: word
        valuePath: .
metadata:
  fields:
    - name: title
      valuePath: "//titleStmt/title"
""", allow_path=False)
    try:
        ds = read_pages(name, [str(src / "a.md")])
        t = ds.take_all()
        assert t[0]["meta_title"] == "Crawl Report"
        assert "zebras." in t[0]["text"].split()
        idx = str(tmp_path / "idx")
        build_index(read_pages(name, [str(src / "a.md")]), idx,
                    BuildParams(num_buckets=2, n_salts=1,
                                analyzer="whitespace"))
        r = IndexReader(idx)
        assert cql_spans(r, '"zebras."').num_rows == 1
        assert cql_spans(r, '"alpha" "item"').num_rows == 1
    finally:
        F._FORMATS.pop(name, None)
        F.USER_FORMATS.discard(name)


def test_unknown_plugin_name_errors():
    import pyarrow as pa
    import pytest

    from blacklab_ray.stages.xmlconfig import (XmlFormatConfig,
                                               extract_xml_config)
    cfg = XmlFormatConfig(name="x", document_path=".//d",
                          word_path=".//w",
                          convert_plugin="no-such-plugin")
    fn = extract_xml_config(cfg)
    with pytest.raises(ValueError, match="unknown convertPlugin"):
        fn(pa.table({"path": ["a.xml"], "bytes": [b"<d/>"]}))
