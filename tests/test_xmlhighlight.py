"""XML-wellformed highlighting (XmlHighlighter semantics)."""

import random
import xml.etree.ElementTree as ET

import pyarrow as pa
import pytest

from blacklab_ray.stages.xmlhighlight import (
    HighlightContent, cut_around_tags, highlight_xml, make_well_formed,
    snippet,
)


def _well_formed(s: str) -> bool:
    try:
        ET.fromstring(f"<root>{s}</root>")
        return True
    except ET.ParseError:
        return False


def test_plain_text_span():
    out = highlight_xml("the quick brown fox", [(4, 9)])
    assert out == "the <hl>quick</hl> brown fox"


def test_span_crossing_element_boundary_stays_well_formed():
    xml = "<p><b>ab</b> cd</p>"
    # highlight "b</b> c" : chars 7..14 cross the </b> boundary
    out = highlight_xml(xml, [(7, 14)])
    assert _well_formed(out)
    assert "<hl>" in out and "</hl>" in out
    # highlighting must be split at the element boundary
    assert out == "<p><b>a<hl>b</hl></b><hl> c</hl>d</p>"


def test_span_covering_whole_element():
    xml = "<p><b>ab</b> cd</p>"
    out = highlight_xml(xml, [(3, 12)])   # exactly <b>ab</b>
    assert _well_formed(out)
    assert "ab" in out


def test_self_closing_tags():
    xml = "a<br/>b<br />c"
    out = highlight_xml(xml, [(0, len(xml))])
    assert _well_formed(out)
    assert out.startswith("<hl>")
    # '<br / >' (space before >) is not well-formed XML but the
    # reference's backward scan still treats it as self-closing — no
    # spurious fix-up close tag is appended
    out2 = highlight_xml("a<br / >b", None)
    assert out2 == "a<br / >b"


def test_make_well_formed_add():
    assert make_well_formed("</i> text <b>") == "<i></i> text <b></b>"


def test_make_well_formed_remove():
    assert make_well_formed("</i> text <b>", strategy="remove") \
        == "text <b></b>".replace("<b></b>", "") or True
    out = make_well_formed("</i> text <b>", strategy="remove")
    assert out == "text"


def test_make_well_formed_nested_cut():
    # cut out of "<i><b>..." mid-document: unmatched closes must nest
    out = make_well_formed("x</b></i>y")
    assert out == "<i><b>x</b></i>y"
    assert _well_formed(out)


def test_cut_around_tags():
    xml = "<p>abcdef<span>ghij</span>klmn</p>"
    out = cut_around_tags(xml, 8)
    assert _well_formed(out)
    # 8 visible chars kept, all tags intact, ellipsis marks the cut
    assert out.endswith("...")
    visible = "".join(ET.fromstring(f"<r>{out}</r>").itertext())
    assert visible.replace("...", "") == "abcdefgh"


def test_empty_hl_removed():
    xml = "<p>ab</p>"
    out = highlight_xml(xml, [(0, 3)])   # span ends right after <p>
    assert "<hl></hl>" not in out
    assert _well_formed(out)


def test_offset_fragment():
    # fragment cut at position 100 of the original doc
    frag = "abc <b>def</b>"
    out = highlight_xml(frag, [(107, 110)], offset=100)
    assert out == "abc <b><hl>def</hl></b>"


def test_snippet_window():
    doc = "<doc><p>" + "x" * 50 + " target " + "y" * 50 + "</p></doc>"
    s = doc.index("target")
    out = snippet(doc, (s, s + 6), context_chars=10)
    assert "<hl>target</hl>" in out
    assert _well_formed(out)
    assert len(out) < len(doc)


def test_snippet_never_cuts_inside_tag():
    doc = "<article class='aaaaaaaaaaaaaaaaaaaa'>hit here</article>"
    s = doc.index("hit")
    out = snippet(doc, (s, s + 3), context_chars=5)
    assert _well_formed(out)
    assert "<hl>hit</hl>" in out


def test_property_random_fragments_always_well_formed():
    """Any cut of a random well-formed doc + random spans must
    highlight to well-formed output (the reference's core guarantee)."""
    rng = random.Random(99)
    names = ["a", "b", "c"]

    def gen(depth=0):
        parts = []
        for _ in range(rng.randint(1, 3)):
            if depth < 3 and rng.random() < 0.5:
                n = rng.choice(names)
                parts.append(f"<{n}>{gen(depth + 1)}</{n}>")
            else:
                parts.append("".join(rng.choice("wxyz ")
                                     for _ in range(rng.randint(1, 6))))
        return "".join(parts)

    for _ in range(120):
        doc = gen()
        # cut at random tag-safe boundaries
        safe = [i for i in range(len(doc) + 1)
                if not _inside_tag(doc, i)]
        lo, hi = sorted(rng.sample(safe, 2)) if len(safe) > 2 else (0, len(doc))
        frag = doc[lo:hi]
        spans = []
        for _ in range(rng.randint(0, 3)):
            a, b = sorted((rng.randint(lo, hi), rng.randint(lo, hi)))
            spans.append((a, b))
        for strategy in ("add", "remove"):
            out = highlight_xml(frag, spans, offset=lo,
                                strategy=strategy)
            assert _well_formed(out), (frag, spans, strategy, out)


def _inside_tag(doc: str, i: int) -> bool:
    lt = doc.rfind("<", 0, i)
    return lt != -1 and doc.find(">", lt) >= i


def test_highlight_stage_batch():
    tbl = pa.table({
        "doc_id": [0, 1],
        "html": ["<p>hello world</p>", "<p>nothing</p>"],
        "spans": [[{"start": 3, "end": 8}], []],
    })
    out = HighlightContent()(tbl)
    got = out.column("highlighted").to_pylist()
    assert got[0] == "<p><hl>hello</hl> world</p>"
    assert got[1] == "<p>nothing</p>"
