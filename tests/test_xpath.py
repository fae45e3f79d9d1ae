"""Grammar-based XPath engine (stages/xpath.py) + its fallback wiring
into the config extractor's subset (stages/xmlconfig.py)."""

import xml.etree.ElementTree as ET

import pytest

from blacklab_ray.stages import xpath
from blacklab_ray.stages.xpath import (
    AttrNode, XPathSyntaxError, evaluate, evaluate_nodes,
    evaluate_string,
)

DOC = """
<doc id="d1">
  <meta year="2001"><title>The Tale</title><author>A. B.</author></meta>
  <s n="1"><w pos="DET">The</w><w pos="NN">tale</w></s>
  <s n="2"><w pos="VB">Begins</w></s>
</doc>
"""


@pytest.fixture(scope="module")
def doc():
    root = ET.fromstring(DOC)
    parents = {}
    for p in root.iter():
        for c in p:
            parents[c] = p
    return root, parents


# ---------------------------------------------------------------------------
# expressions


def test_arithmetic(doc):
    root, _ = doc
    assert evaluate("1 + 2 * 3", root) == 7.0
    assert evaluate("(1 + 2) * 3", root) == 9.0
    assert evaluate("10 div 4", root) == 2.5
    assert evaluate("10 mod 3", root) == 1.0
    assert evaluate("-2 + 5", root) == 3.0
    assert evaluate_string("1 + 1", root) == "2"


def test_string_functions(doc):
    root, _ = doc
    assert evaluate("concat('a', 1 + 1)", root) == "a2"
    assert evaluate("substring('12345', 2, 2)", root) == "23"
    assert evaluate("normalize-space('  a   b ')", root) == "a b"
    assert evaluate("translate('abc', 'ab', 'x')", root) == "xc"
    assert evaluate("upper-case('ab')", root) == "AB"
    assert evaluate("string-length('abcd')", root) == 4.0
    assert evaluate("substring-after('a-b', '-')", root) == "b"
    assert evaluate("contains('hello', 'ell')", root) is True
    assert evaluate("matches('w123', '^w\\d+$')", root) is True
    assert evaluate("replace('a1b2', '\\d', '_')", root) == "a_b_"


def test_boolean_and_numeric_functions(doc):
    root, _ = doc
    assert evaluate("not(false())", root) is True
    assert evaluate("boolean('')", root) is False
    assert evaluate("floor(2.7)", root) == 2.0
    assert evaluate("ceiling(2.1)", root) == 3.0
    assert evaluate("round(2.5)", root) == 3.0
    assert evaluate("number('3.5') * 2", root) == 7.0


def test_paths_and_predicates(doc):
    root, parents = doc
    assert len(evaluate_nodes("//w", root)) == 3
    assert evaluate("count(//w)", root) == 3.0
    ws = evaluate_nodes("//w[@pos='NN']", root)
    assert [w.text for w in ws] == ["tale"]
    assert evaluate_string("//s[2]/w[1]", root) == "Begins"
    # position()=last() applies per parent step context
    assert evaluate("count(//w[position() = last()])", root) == 2.0
    # existential node-set comparison
    ss = evaluate_nodes("//s[w/@pos = 'VB']", root)
    assert [s.get("n") for s in ss] == ["2"]
    ss = evaluate_nodes("//s[@n > 1]", root)
    assert [s.get("n") for s in ss] == ["2"]
    # arithmetic over attribute node-sets
    assert evaluate("//s[1]/@n + 1", root) == 2.0
    assert evaluate("sum(//s/@n)", root) == 3.0


def test_union_document_order(doc):
    root, _ = doc
    nodes = evaluate_nodes("//w[@pos='DET'] | //meta/title", root)
    assert [xpath.string_value(n) for n in nodes] == ["The Tale", "The"]


def test_filter_expression_and_tail(doc):
    root, _ = doc
    assert evaluate_string("(//w)[1]", root) == "The"
    assert evaluate_string("(//s)[2]/w", root) == "Begins"
    assert evaluate("count((//w)[position() < 3])", root) == 2.0


def test_axes(doc):
    root, parents = doc
    first_w = evaluate_nodes("(//w)[1]", root)[0]
    ctx = xpath.Context(root, parents)
    assert evaluate("count(following::w)", first_w, ctx=ctx) == 2.0
    assert evaluate("count(preceding::w)", first_w, ctx=ctx) == 0.0
    assert evaluate_string("following-sibling::w", first_w,
                           ctx=ctx) == "tale"
    last_w = evaluate_nodes("(//w)[3]", root)[0]
    assert evaluate("count(preceding::w)", last_w, ctx=ctx) == 2.0
    assert evaluate_string("ancestor::s/@n", last_w, ctx=ctx) == "2"
    assert evaluate_string("../@n", last_w, ctx=ctx) == "2"


def test_attribute_and_text_nodes(doc):
    root, _ = doc
    attrs = evaluate_nodes("//s/@n", root)
    assert all(isinstance(a, AttrNode) for a in attrs)
    assert [a.value for a in attrs] == ["1", "2"]
    texts = evaluate_nodes("//w/text()", root)
    assert [t.value for t in texts] == ["The", "tale", "Begins"]
    assert evaluate("count(//meta/@*)", root) == 1.0


def test_absolute_path_from_inner_node(doc):
    root, parents = doc
    w = evaluate_nodes("(//w)[3]", root)[0]
    got = evaluate_nodes("/doc/meta/title", w, parents=parents)
    assert [xpath.string_value(n) for n in got] == ["The Tale"]


def test_name_functions(doc):
    root, _ = doc
    assert evaluate("local-name(//s/w)", root) == "w"
    assert evaluate("local-name()", root) == "doc"


def test_syntax_errors(doc):
    root, _ = doc
    with pytest.raises(XPathSyntaxError):
        evaluate("$var + 1", root)
    with pytest.raises(XPathSyntaxError):
        evaluate("nosuchfn(1)", root)
    with pytest.raises(XPathSyntaxError):
        evaluate("//w[", root)


def test_fuzz_against_elementtree_findall():
    """Property check: on the path subset ElementTree's findall
    implements (steps, //, wildcards, [@a], [@a='v'], [child],
    [child='text'], [n]), the engine must return the same elements in
    the same (document) order. 300 random (tree, path) pairs."""
    import random
    rng = random.Random(4242)

    def rand_tree(depth=0):
        el = ET.Element(rng.choice("abcd"))
        if rng.random() < 0.6:
            el.set(rng.choice("xy"), rng.choice("123"))
        if rng.random() < 0.5:
            el.text = rng.choice(["t1", "t2"])  # leaf-ish single token
        if depth < 3:
            for _ in range(rng.randint(0, 3)):
                el.append(rand_tree(depth + 1))
        return el

    def rand_step(allow_positional):
        name = rng.choice("abcd*")
        pred = ""
        r = rng.random()
        if r < 0.15:
            pred = f"[@{rng.choice('xy')}]"
        elif r < 0.3:
            pred = f"[@{rng.choice('xy')}='{rng.choice('123')}']"
        elif r < 0.4:
            pred = f"[{rng.choice('abcd')}]"
        elif r < 0.5:
            pred = f"[{rng.choice('abcd')}='t1']"
        elif r < 0.6 and allow_positional:
            # positional predicates only on '/'-reached steps:
            # ElementTree's [n] after '//' is NOT XPath-conformant
            # (.//*[1] returns nearly every element), so the engines
            # legitimately diverge on those shapes
            pred = f"[{rng.randint(1, 3)}]"
        return name + pred

    checked = 0
    for _ in range(300):
        root = rand_tree()
        n_steps = rng.randint(1, 3)
        sep = [rng.choice(["/", "//"]) for _ in range(n_steps)]
        no_desc = all(s == "/" for s in sep)
        path = "." + "".join(s + rand_step(no_desc) for s in sep)
        # ET findall returns DUPLICATES when nested '//' reach one
        # element through several bases; XPath node-sets are sets, so
        # dedup the oracle and require doc order of the engine result
        exp_ids = {id(e) for e in root.findall(path)}
        got = evaluate_nodes(path, root)
        assert {id(e) for e in got} == exp_ids, \
            (path, ET.tostring(root))
        order = {el: i for i, el in enumerate(root.iter())}
        assert [order[e] for e in got] == \
            sorted(order[e] for e in got), (path,)
        checked += 1
    assert checked == 300


# ---------------------------------------------------------------------------
# fallback wiring in the config extractor


def test_value_falls_back_to_full_engine(doc):
    from blacklab_ray.stages.xmlconfig import _value
    root, parents = doc
    s1 = root.find("s")
    # outside the subset: arithmetic, count(), comparisons
    assert _value(s1, "@n + 1", parents) == "2"
    assert _value(s1, "count(w)", parents) == "2"
    assert _value(root, "count(//w[@pos != 'NN'])", parents) == "2"
    assert _value(s1, "concat(../@id, '-', count(w))", parents) == "d1-2"
    # subset shapes still answer identically
    assert _value(s1, "w/@pos", parents) == "DET"
    assert _value(s1, "concat(@n, 'x')", parents) == "1x"


def test_iter_path_falls_back(doc):
    from blacklab_ray.stages.xmlconfig import _iter_path
    root, parents = doc
    got = list(_iter_path(root, "//s[count(w) = 2]", parents))
    assert [g.get("n") for g in got] == ["1"]
    got = list(_iter_path(root, "(//w)[2]", parents))
    assert [g.text for g in got] == ["tale"]


def test_config_extraction_with_full_engine_paths(ray_session, tmp_path):
    """A user-style config whose metadata valuePath needs the full
    engine extracts end-to-end (the DocIndexerSaxon surface)."""
    import pyarrow as pa

    from blacklab_ray.stages.xmlconfig import (
        XmlFormatConfig, extract_xml_config,
    )
    xml = ("<corpus><text id='t1'>"
           "<p><tok>Hello</tok><tok>world</tok></p>"
           "<p><tok>Bye</tok></p>"
           "</text></corpus>")
    cfg = XmlFormatConfig(
        name="user-style",
        document_path="//text",
        word_path=".//tok",
        metadata={"n_paras": "count(p)",
                  "n_toks": "count(.//tok)",
                  "label": "concat(@id, ':', count(p) * 10)"})
    fn = extract_xml_config(cfg)
    out = fn(pa.table({"path": pa.array(["u1"]),
                       "bytes": pa.array([xml.encode()])}))
    assert out.num_rows == 1
    assert out["text"][0].as_py() == "Hello world Bye"
    assert out["meta_n_paras"][0].as_py() == "2"
    assert out["meta_n_toks"][0].as_py() == "3"
    assert out["meta_label"][0].as_py() == "t1:20"


def test_fuzz_namespaced_against_elementtree_findall():
    """Prefixed name tests (tei:w) match by LOCAL name (the session's
    xpath change): on single-namespace trees local-name matching is
    exactly ElementTree's namespace-resolved findall — fuzz the two
    against each other (150 random (tree, path) pairs)."""
    import random
    rng = random.Random(777)
    URI = "http://example.org/ns"
    NS = {"p": URI}

    def rand_tree(depth=0):
        el = ET.Element(f"{{{URI}}}{rng.choice('abcd')}")
        if rng.random() < 0.6:
            el.set(rng.choice("xy"), rng.choice("123"))
        if rng.random() < 0.5:
            el.text = rng.choice(["t1", "t2"])
        if depth < 3:
            for _ in range(rng.randint(0, 3)):
                el.append(rand_tree(depth + 1))
        return el

    def rand_step():
        name = rng.choice("abcd*")
        qname = name if name == "*" else f"p:{name}"
        pred = ""
        r = rng.random()
        if r < 0.2:
            pred = f"[@{rng.choice('xy')}]"
        elif r < 0.4:
            pred = f"[@{rng.choice('xy')}='{rng.choice('123')}']"
        elif r < 0.6:
            # no positional predicates here: ElementTree's [n] after
            # '//' is per-BASE (first child of every descendant), not
            # XPath's per-parent position — the engines legitimately
            # diverge there and this fuzzer targets PREFIX matching
            pred = f"[p:{rng.choice('abcd')}]"
        return qname + pred

    for _ in range(150):
        root = rand_tree()
        n_steps = rng.randint(1, 3)
        sep = [rng.choice(["/", "//"]) for _ in range(n_steps)]
        path = "." + "".join(s + rand_step() for s in sep)
        exp_ids = {id(e) for e in root.findall(path, NS)}
        got = evaluate_nodes(path, root)
        assert {id(e) for e in got} == exp_ids, \
            (path, ET.tostring(root))


# ---- XPath 2.0 increment: for-expressions, sequences, tokenize() ----------


class TestXPath2Constructs:
    def _root(self):
        import xml.etree.ElementTree as ET
        return ET.fromstring(
            '<d><w l="aa">X</w><w l="bb">Y</w><n>1,2,3</n></d>')

    def test_for_expression(self):
        from blacklab_ray.stages import xpath
        r = self._root()
        got = xpath.evaluate('for $x in w return $x/@l', r)
        assert [xpath.string_value(x) for x in got] == ["aa", "bb"]

    def test_for_cartesian_and_sequence_literal(self):
        from blacklab_ray.stages import xpath
        r = self._root()
        got = xpath.evaluate(
            "for $x in w, $y in ('1', '2') return concat($x/@l, $y)",
            r)
        assert got == ["aa1", "aa2", "bb1", "bb2"]
        assert xpath.evaluate("()", r) == []
        assert xpath.evaluate("('a', 'b')", r) == ["a", "b"]

    def test_tokenize_and_string_join(self):
        from blacklab_ray.stages import xpath
        r = self._root()
        assert xpath.evaluate("tokenize(string(n), ',')", r) == \
            ["1", "2", "3"]
        assert xpath.evaluate("tokenize('', ',')", r) == []
        assert xpath.evaluate(
            "string-join(for $x in w return $x/@l, '-')", r) == "aa-bb"

    def test_unbound_variable_raises(self):
        import pytest

        from blacklab_ray.stages import xpath
        with pytest.raises(xpath.XPathSyntaxError):
            xpath.evaluate("$nope", self._root())

    def test_for_in_fixture_config(self, ray_session):
        """A user .blf.yaml whose valuePath uses for/tokenize()
        extracts through the config engine (the DocIndexerSaxon
        surface the reference hands to Saxon)."""
        import pyarrow as pa

        from blacklab_ray.stages.blfyaml import load_blf_yaml
        from blacklab_ray.stages.xmlconfig import extract_xml_config

        cfg = load_blf_yaml("""
name: xp2test
fileType: xml
documentPath: //doc
annotatedFields:
  contents:
    containerPath: .
    wordPath: .//w
    annotations:
      - name: word
        valuePath: .
      - name: morphs
        valuePath: "string-join(for $m in m return $m/@v, '+')"
metadata:
  fields:
    - name: kws
      valuePath: "string-join(tokenize(string(//kw), ','), ';')"
""", allow_path=False)
        fn = extract_xml_config(cfg)
        xml = ('<doc><kw>alpha,beta</kw>'
               '<w><m v="un"/><m v="do"/>undo</w>'
               '<w><m v="re"/>re</w></doc>')
        t = fn(pa.table({"path": ["x.xml"],
                         "bytes": [xml.encode()]}))
        assert t["text"][0].as_py() == "undo re"
        assert t["morphs"][0].as_py() == ["un+do", "re"]
        assert t["meta_kws"][0].as_py() == "alpha;beta"


def test_tokenize_one_arg_clean_error():
    import pytest
    import xml.etree.ElementTree as ET

    from blacklab_ray.stages import xpath
    with pytest.raises(xpath.XPathSyntaxError, match="tokenize"):
        xpath.evaluate("tokenize('a b')", ET.fromstring("<d/>"))
