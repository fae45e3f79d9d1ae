"""Config-driven XML extraction (DocIndexerXPath analogue) tests:
TEI-with-<w>, FoLiA, Alto shapes → pages schema with token-aligned
annotations + standoff tag spans → full index build + CQL."""
import pyarrow as pa
import pytest

from blacklab_ray.stages.xmlconfig import (ALTO, FOLIA,
                                           TEI_P5_ANNOTATED,
                                           XmlFormatConfig,
                                           extract_xml_config)


def _pages(cfg, docs: dict[str, str]) -> pa.Table:
    fn = extract_xml_config(cfg)
    batch = pa.table({
        "path": pa.array(list(docs), pa.string()),
        "bytes": pa.array([d.encode() for d in docs.values()],
                          pa.binary()),
    })
    return fn(batch)


TEI_DOC = """
<TEI xmlns="http://www.tei-c.org/ns/1.0">
 <teiHeader><fileDesc><titleStmt><title>Proef</title></titleStmt>
  <idno>doc-1</idno></fileDesc>
  <profileDesc><langUsage><language>nl</language></langUsage>
  </profileDesc></teiHeader>
 <text><body>
  <p><s><w lemma="de" type="LID">De</w>
        <w lemma="kat" type="ZN">kat</w></s>
     <s><w lemma="slapen" type="WW">slaapt</w></s></p>
 </body></text>
</TEI>
"""

FOLIA_DOC = """
<FoLiA xmlns="http://ilk.uvt.nl/folia" xml:id="f1">
 <text>
  <p><s><w xml:id="w1"><t>Een</t><lemma class="een"/>
         <pos class="LID"/></w>
        <w xml:id="w2"><t>huis</t><lemma class="huis"/>
         <pos class="N"/></w></s></p>
 </text>
</FoLiA>
"""

ALTO_DOC = """
<alto xmlns="http://www.loc.gov/standards/alto/ns-v2#">
 <Description><sourceImageInformation><fileName>scan1.tif</fileName>
 </sourceImageInformation></Description>
 <Layout><Page><PrintSpace>
  <TextBlock ID="b1"><TextLine>
    <String CONTENT="Lorem"/><String CONTENT="ipsum"/>
  </TextLine><TextLine><String CONTENT="dolor"/></TextLine></TextBlock>
 </PrintSpace></Page></Layout>
</alto>
"""


def test_tei_extraction():
    t = _pages(TEI_P5_ANNOTATED, {"a.xml": TEI_DOC})
    assert t.num_rows == 1
    assert t["url"][0].as_py() == "doc-1"           # idno pid
    assert t["text"][0].as_py() == "De kat slaapt"
    assert t["lemma"][0].as_py() == ["de", "kat", "slapen"]
    assert t["pos"][0].as_py() == ["LID", "ZN", "WW"]
    assert t["lang"][0].as_py() == "nl"
    assert t["meta_title"][0].as_py() == "Proef"
    spans = t["tags"][0].as_py()
    by = {(s["name"], s["start"], s["end"]) for s in spans}
    assert ("s", 0, 2) in by and ("s", 2, 3) in by and ("p", 0, 3) in by


def test_folia_extraction():
    t = _pages(FOLIA, {"f.xml": FOLIA_DOC})
    assert t["text"][0].as_py() == "Een huis"
    assert t["lemma"][0].as_py() == ["een", "huis"]
    assert t["pos"][0].as_py() == ["LID", "N"]
    assert {(s["name"], s["start"], s["end"])
            for s in t["tags"][0].as_py()} >= {("s", 0, 2), ("p", 0, 2)}


def test_alto_extraction():
    t = _pages(ALTO, {"s.xml": ALTO_DOC})
    assert t["text"][0].as_py() == "Lorem ipsum dolor"
    assert t["meta_filename"][0].as_py() == "scan1.tif"
    names = {(s["name"], s["start"], s["end"])
             for s in t["tags"][0].as_py()}
    assert ("TextLine", 0, 2) in names and ("TextLine", 2, 3) in names
    assert ("TextBlock", 0, 3) in names


def test_multi_doc_file_and_fallbacks():
    cfg = XmlFormatConfig(name="multi", document_path=".//doc",
                          word_path=".//w", word_value=".")
    xml = "<c><doc><w>a</w><w>b</w></doc><doc><w>c</w></doc></c>"
    t = _pages(cfg, {"m.xml": xml})
    assert t.num_rows == 2
    assert t["url"].to_pylist() == ["m.xml#0", "m.xml#1"]
    assert t["text"].to_pylist() == ["a b", "c"]
    # a form with internal whitespace cannot break token alignment
    xml2 = "<doc><w>New  York</w><w>x</w></doc>"
    cfg2 = XmlFormatConfig(name="d", document_path=".//doc",
                           word_path=".//w")
    t2 = _pages(cfg2, {"n.xml": xml2})
    assert t2["text"][0].as_py() == "New_York x"


def test_tei_index_build_and_cql(ray_session, tmp_path):
    """End-to-end: config extraction → whitespace-analyzer build with
    lemma/pos annotations → [lemma=...] and within <s/> queries."""
    from blacklab_ray.formats import read_pages
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader
    from blacklab_ray.query.cql import cql_spans

    src = tmp_path / "tei"
    src.mkdir()
    (src / "a.xml").write_text(TEI_DOC)
    ds = read_pages("tei-p5-annotated", [str(src / "a.xml")])
    idx = str(tmp_path / "idx")
    build_index(ds, idx, BuildParams(num_buckets=2, n_salts=1,
                                     analyzer="whitespace",
                                     annotations=("lemma", "pos")))
    r = IndexReader(idx)
    got = cql_spans(r, '[lemma="slapen"]')
    assert got.num_rows == 1 and got["start"][0].as_py() == 2
    got2 = cql_spans(r, '[lemma="de"] [pos="ZN"] within <s/>')
    assert got2.num_rows == 1
    assert (got2["start"][0].as_py(), got2["end"][0].as_py()) == (0, 2)
    # the second sentence does not contain the phrase
    assert cql_spans(r, '[lemma="kat"] within <s/>').num_rows == 1


def test_formats_registry_has_xml_configs():
    from blacklab_ray.formats import formats
    for name in ("tei-p5-annotated", "folia", "alto", "pagexml", "naf"):
        assert name in formats()


# ---- XPath-subset extensions (DocIndexerSaxon analogue) ---------------

TEI_INL_DOC = """
<TEI xmlns="http://www.tei-c.org/ns/1.0">
 <teiHeader><fileDesc><titleStmt><title>Reis</title></titleStmt>
  <idno>doc-9</idno>
  <sourceDesc>
   <listBibl id="inlMetadata">
    <bibl>
     <interpGrp type="author"><interp>W. Bilderdijk</interp></interpGrp>
     <interpGrp type="witnessYear_from"><interp>1795</interp></interpGrp>
     <interpGrp type="ignoredField"><interp>x</interp></interpGrp>
    </bibl>
   </listBibl>
  </sourceDesc></fileDesc>
  <profileDesc><langUsage><language>nl</language></langUsage>
  </profileDesc></teiHeader>
 <text><body>
  <p><s><w lemma="de" type="LID">De</w>
        <w lemma="reis" type="ZN">reis</w></s></p>
 </body></text>
</TEI>
"""


def test_foreach_metadata_and_predicates():
    """tei-p5.blf.yaml's inlMetadata block: forEachPath
    bibl/interpGrp/interp under listBibl[@id='inlMetadata'], namePath
    ../@type (parent axis), valuePath '.' — only DECLARED names become
    columns."""
    from blacklab_ray.stages.xmlconfig import TEI_P5_INL
    t = _pages(TEI_P5_INL, {"x.xml": TEI_INL_DOC})
    assert t.num_rows == 1
    assert t["url"][0].as_py() == "doc-9"
    assert t["meta_author"][0].as_py() == "W. Bilderdijk"
    assert t["meta_witnessYear_from"][0].as_py() == "1795"
    assert "meta_ignoredField" not in t.schema.names
    assert t["text"][0].as_py() == "De reis"


def test_predicate_shapes():
    """[@a], [@a='v'], [not(@a)], [child='v'] and positional [n]."""
    doc = """<root>
      <item kind="a"><v>one</v></item>
      <item kind="b"><v>two</v></item>
      <item><v>three</v></item>
    </root>"""
    cfg = XmlFormatConfig(name="p", document_path=".")
    import xml.etree.ElementTree as ET

    from blacklab_ray.stages.xmlconfig import _iter_path, _text_of
    root = ET.fromstring(doc)
    got = [_text_of(e) for e in _iter_path(root, "item[@kind='b']")]
    assert got == ["two"]
    got = [_text_of(e) for e in _iter_path(root, "item[@kind]")]
    assert got == ["one", "two"]
    got = [_text_of(e) for e in _iter_path(root, "item[not(@kind)]")]
    assert got == ["three"]
    got = [_text_of(e) for e in _iter_path(root, "item[v='two']")]
    assert got == ["two"]
    got = [_text_of(e) for e in _iter_path(root, "item[2]")]
    assert got == ["two"]
    got = [_text_of(e) for e in _iter_path(root, ".//v[3]")]
    assert got == ["three"]


def test_wildcard_union_and_absolute():
    doc = """<d><a><w>x</w></a><b><w>y</w></b><c>z</c></d>"""
    import xml.etree.ElementTree as ET

    from blacklab_ray.stages.xmlconfig import _iter_path, _text_of
    root = ET.fromstring(doc)
    got = [_text_of(e) for e in _iter_path(root, "*/w")]
    assert got == ["x", "y"]
    got = [_text_of(e) for e in _iter_path(root, "a/w|c")]
    assert got == ["x", "z"]
    got = [_text_of(e) for e in _iter_path(root, "//w")]
    assert got == ["x", "y"]


def test_parent_axis_value():
    doc = """<d><g type="author"><i>A. Smith</i></g></d>"""
    import xml.etree.ElementTree as ET

    from blacklab_ray.stages.xmlconfig import _iter_path, _value
    root = ET.fromstring(doc)
    parents = {c: p for p in root.iter() for c in p}
    (i_el,) = _iter_path(root, ".//i", parents)
    assert _value(i_el, "../@type", parents) == "author"


def test_xpath_function_subset():
    """User-config XPath functions (DocIndexerSaxon.java:30 shapes):
    concat / substring / normalize-space / local-name in value paths,
    including nesting and path arguments."""
    import xml.etree.ElementTree as ET

    from blacklab_ray.stages.xmlconfig import _value
    root = ET.fromstring(
        "<d year='1984'><t>  A   Tale  </t><a n='x'>body</a></d>")
    assert _value(root, "concat(@year, '-', t)") == "1984-A   Tale"
    assert _value(root, "normalize-space(t)") == "A Tale"
    assert _value(root, "substring(@year, 1, 2)") == "19"
    assert _value(root, "substring(@year, 3)") == "84"
    assert _value(root, "local-name(a)") == "a"
    assert _value(root, "local-name()") == "d"
    # nesting + literal/number args
    assert _value(root,
                  "concat(substring(@year, 1, 2), '00')") == "1900"
    assert _value(root, "concat('a,b', normalize-space(t))") == \
        "a,bA Tale"


def test_xpath_functions_in_metadata_extraction():
    """Functions flow through a user-style config's metadata and pid
    paths end-to-end."""
    cfg = XmlFormatConfig(
        name="user-fmt",
        document_path=".//doc",
        word_path=".//w",
        doc_id_value="concat('doc-', @n)",
        metadata={"title": "normalize-space(head)",
                  "century": "substring(@year, 1, 2)"})
    t = _pages(cfg, {"f.xml": (
        "<root><doc n='7' year='1848'><head> The   Title </head>"
        "<w>hello</w><w>world</w></doc></root>")})
    row = t.to_pylist()[0]
    assert row["url"] == "doc-7"
    assert row["meta_title"] == "The Title"
    assert row["meta_century"] == "18"
    assert row["text"] == "hello world"


EAF_DOC = """
<ANNOTATION_DOCUMENT>
 <TIER LINGUISTIC_TYPE_REF="Words" TIER_ID="w">
  <ANNOTATION><ALIGNABLE_ANNOTATION ANNOTATION_ID="a1">
    <ANNOTATION_VALUE>ik</ANNOTATION_VALUE>
  </ALIGNABLE_ANNOTATION></ANNOTATION>
  <ANNOTATION><ALIGNABLE_ANNOTATION ANNOTATION_ID="a2">
    <ANNOTATION_VALUE>loop</ANNOTATION_VALUE>
  </ALIGNABLE_ANNOTATION></ANNOTATION>
 </TIER>
 <TIER LINGUISTIC_TYPE_REF="Lemma" TIER_ID="l">
  <ANNOTATION><REF_ANNOTATION ANNOTATION_ID="l1" ANNOTATION_REF="a2">
    <ANNOTATION_VALUE>lopen</ANNOTATION_VALUE>
  </REF_ANNOTATION></ANNOTATION>
 </TIER>
 <TIER LINGUISTIC_TYPE_REF="PoS" TIER_ID="p">
  <ANNOTATION><REF_ANNOTATION ANNOTATION_ID="p1" ANNOTATION_REF="a1">
    <ANNOTATION_VALUE>VNW</ANNOTATION_VALUE>
  </REF_ANNOTATION></ANNOTATION>
 </TIER>
 <TIER LINGUISTIC_TYPE_REF="Other" TIER_ID="o">
  <ANNOTATION><ALIGNABLE_ANNOTATION ANNOTATION_ID="x1">
    <ANNOTATION_VALUE>NOTAWORD</ANNOTATION_VALUE>
  </ALIGNABLE_ANNOTATION></ANNOTATION>
 </TIER>
</ANNOTATION_DOCUMENT>
"""


def test_eaf_standoff_tiers():
    """eaf.blf.yaml: tier-predicated word path (the Other tier must NOT
    produce tokens) + standoff lemma/pos attached by ANNOTATION_REF."""
    from blacklab_ray.stages.xmlconfig import EAF
    t = _pages(EAF, {"e.eaf": EAF_DOC})
    assert t["text"][0].as_py() == "ik loop"
    assert t["lemma"][0].as_py() == ["_", "lopen"]
    assert t["pos"][0].as_py() == ["VNW", "_"]


TCF_DOC = """
<D-Spin xmlns="http://www.dspin.de/data">
 <TextCorpus xmlns="http://www.dspin.de/data/textcorpus">
  <tokens>
   <token ID="t1">Das</token>
   <token ID="t2">Haus</token>
  </tokens>
  <lemmas>
   <lemma tokenIDs="t1">der</lemma>
   <lemma tokenIDs="t2">haus</lemma>
  </lemmas>
  <POStags>
   <tag tokenIDs="t1 t2">X</tag>
  </POStags>
 </TextCorpus>
</D-Spin>
"""


def test_tcf_token_id_lists():
    """tcf.blf.yaml: @tokenIDs may reference a LIST of tokens (the
    reference expresses this with a contains() XPath contortion)."""
    from blacklab_ray.stages.xmlconfig import TCF
    t = _pages(TCF, {"t.xml": TCF_DOC})
    assert t["text"][0].as_py() == "Das Haus"
    assert t["lemma"][0].as_py() == ["der", "haus"]
    assert t["pos"][0].as_py() == ["X", "X"]


def test_punct_path_capture():
    """punctPath analogue: inter-word text nodes (not inside <w>)
    become the punct column, punct-before-each-word + trailing."""
    doc = """<doc><s><w>Hello</w>, <w>world</w>!</s> the end</doc>"""
    cfg = XmlFormatConfig(name="pp", document_path=".",
                          word_path=".//w", capture_punct=True)
    t = _pages(cfg, {"p.xml": doc})
    assert t["text"][0].as_py() == "Hello world"
    assert t["punct"][0].as_py() == ["", ",", "! the end"]


CMDI_DOC = """
<CMD xmlns="http://www.clarin.eu/cmd/">
 <Header><MdSelfLink>hdl:1839/00-X</MdSelfLink></Header>
 <Components>
  <Session>
   <Name>sess-1</Name>
   <Location><Country>Netherlands</Country></Location>
   <Empty/>
  </Session>
 </Components>
</CMD>
"""


def test_cmdi_leaf_metadata_and_linked_join(ray_session):
    """cmdi.blf.yaml: every leaf element with text becomes a metadata
    field (forEachPath .//*[not(*) and text()], namePath
    local-name()); the extracted table joins onto pages via the
    linked-document broadcast join."""
    import ray.data

    from blacklab_ray.stages.linked import join_linked_metadata
    from blacklab_ray.stages.xmlconfig import cmdi_config
    cfg = cmdi_config(("Name", "Country"))
    t = _pages(cfg, {"m.cmdi": CMDI_DOC})
    assert t["meta_Name"][0].as_py() == "sess-1"
    assert t["meta_Country"][0].as_py() == "Netherlands"
    # metadata-only: attach to a content corpus by id
    side = pa.table({"link": ["sess-1"],
                     "Country": ["Netherlands"]})
    pages = ray.data.from_arrow(pa.table({
        "url": ["u1", "u2"], "link": ["sess-1", "nope"],
        "text": ["a", "b"]}))
    out = join_linked_metadata(pages, side, on="link").take_all()
    assert out[0]["Country"] == "Netherlands"
    assert out[1]["Country"] is None


def test_path_engine_properties():
    """Property check: on random trees, `a/b`-style child paths agree
    with an independent recursive matcher, and predicates always
    select a subset of the unpredicated step."""
    import random
    import xml.etree.ElementTree as ET

    from blacklab_ray.stages.xmlconfig import _iter_path

    rng = random.Random(7)
    NAMES = ["a", "b", "c"]

    def rand_tree(depth=0):
        el = ET.Element(rng.choice(NAMES))
        if rng.random() < 0.5:
            el.set("k", rng.choice(["x", "y"]))
        if rng.random() < 0.4:
            el.text = rng.choice(["t", ""])
        if depth < 4:
            for _ in range(rng.randrange(0, 4)):
                el.append(rand_tree(depth + 1))
        return el

    def brute_children(el, names):
        if not names:
            return [el]
        out = []
        for c in el:
            if c.tag == names[0]:
                out.extend(brute_children(c, names[1:]))
        return out

    for _ in range(60):
        root = rand_tree()
        steps = [rng.choice(NAMES)
                 for _ in range(rng.randrange(1, 4))]
        path = "/".join(steps)
        got = list(_iter_path(root, path))
        assert got == brute_children(root, steps), path
        # descendant form yields a superset of the child form when
        # the first step can appear deeper
        desc = list(_iter_path(root, ".//" + path))
        assert set(map(id, got)) <= set(map(id, desc)), path
        # a predicate never widens a step's result
        pred = list(_iter_path(root, f"{steps[0]}[@k='x']"))
        base = list(_iter_path(root, steps[0]))
        assert set(map(id, pred)) <= set(map(id, base))
        assert all(e.get("k") == "x" for e in pred)


def test_xpath_axes_and_function_breadth():
    """Round-4 Saxon-gap narrowing: explicit axes, comparison/boolean
    predicates and the wider string-function set on user-style paths."""
    import xml.etree.ElementTree as ET

    from blacklab_ray.stages.xmlconfig import _iter_path, _value

    root = ET.fromstring(
        "<doc><head><title>The Title</title></head>"
        "<body><s n='1'><w id='w1' t='Db'>aa</w><w id='w2'>bb</w></s>"
        "<s n='2'><w id='w3'>cc</w></s></body></doc>")
    parents = {c: p for p in root.iter() for c in p}
    w2 = next(_iter_path(root, ".//w[@id='w2']"))

    # axes
    assert [e.get("n") for e in
            _iter_path(w2, "ancestor::s", parents)] == ["1"]
    assert next(_iter_path(w2, "parent::s", parents)).get("n") == "1"
    assert [e.get("id") for e in
            _iter_path(w2, "preceding-sibling::w", parents)] == ["w1"]
    s1 = next(_iter_path(root, ".//s[@n='1']"))
    assert [e.get("n") for e in
            _iter_path(s1, "following-sibling::s", parents)] == ["2"]
    assert len(list(_iter_path(root, "descendant::w"))) == 3
    assert next(_iter_path(w2, "self::w", parents)) is w2

    # comparison / boolean predicates
    assert [e.get("id") for e in
            _iter_path(root, ".//w[@id!='w2']")] == ["w1", "w3"]
    assert [e.get("n") for e in
            _iter_path(root, ".//s[position()=2]")] == ["2"]
    assert [e.get("id") for e in
            _iter_path(root, ".//w[@id='w1' or @id='w3']")] \
        == ["w1", "w3"]
    assert [e.get("id") for e in
            _iter_path(root, ".//w[contains(@id,'2')]")] == ["w2"]
    assert [e.get("n") for e in _iter_path(root, ".//s[@n>1]")] == ["2"]

    # string functions in value paths
    v = lambda p: _value(root, p, parents)  # noqa: E731
    assert v("contains(.//title, 'Title')") == "true"
    assert v("starts-with(.//title, 'The')") == "true"
    assert v("ends-with(.//title, 'The')") == ""
    assert v("string-length(.//title)") == "9"
    assert v("upper-case(substring-before(.//title, ' '))") == "THE"
    assert v("substring-after(.//title, ' ')") == "Title"
    assert v("translate(.//title, 'Te', 'Xy')") == "Xhy Xitly"
    assert v("lower-case(replace(.//title, '[aeiou]', '*'))") \
        == "th* t*tl*"
    assert v("string(.//w[@id='w3'])") == "cc"
    assert _value(w2, "attribute::id", parents) == "w2"


def test_xpath_axes_in_extraction_config():
    """A user-style config whose annotation paths use sibling/ancestor
    axes and functions extracts correctly end-to-end."""
    from blacklab_ray.stages.xmlconfig import (XmlFormatConfig,
                                               extract_xml_config)
    doc = ("<corpus><text id='T1'>"
           "<s n='1'><w pos='DET'>De</w><w pos='N'>kat</w></s>"
           "</text></corpus>")
    cfg = XmlFormatConfig(
        name="user-axes",
        document_path=".//text",
        word_path=".//w",
        word_value=".",
        annotations={
            "pos": "lower-case(@pos)",
            "sid": "ancestor::s/@n",
        },
        metadata={"title": "upper-case(@id)"},
    )
    fn = extract_xml_config(cfg)
    import pyarrow as pa
    t = fn(pa.table({
        "path": pa.array(["a.xml"], pa.string()),
        "bytes": pa.array([doc.encode()], pa.binary()),
    }))
    assert t.num_rows == 1
    assert t["text"][0].as_py() == "De kat"
    assert t["pos"][0].as_py() == ["det", "n"]
    assert t["sid"][0].as_py() == ["1", "1"]
    assert t["meta_title"][0].as_py() == "T1"
