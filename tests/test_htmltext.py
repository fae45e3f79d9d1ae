"""HTML main-text extraction (blacklab_ray/stages/htmltext.py).

The crawl→text step of a webtext pipeline: strip markup, drop
script/style payloads and nav/header/footer boilerplate, recover
block text. The driver contract (test_entry: html_extract) replays the
Dataset stage against a DuckDB-recomputed ground truth; these tests
pin the parser semantics on hand-built pages.
"""

import hashlib

import pyarrow as pa
import ray.data

from blacklab_ray.stages.htmltext import extract_html_text, extract_text

PAGE = (
    '<html><head><title>My &amp; Page</title>'
    '<script>var x = "<p>not text</p>";</script>'
    "<style>p{color:red}</style></head><body>"
    "<nav>home | about</nav><header>Site Header</header>"
    "<h1>Main   Heading</h1>"
    '<p>First paragraph with a <a href="/x">link</a> and <b>bold</b>.</p>'
    "<div>Second block<br>after break</div>"
    "<ul><li>item one</li><li>item two</li></ul>"
    "<aside>ad ad ad</aside>"
    '<footer>copyright <a href="/y">legal</a></footer></body></html>'
)


def test_blocks_title_links():
    text, title, n_blocks, n_links = extract_text(PAGE)
    assert title == "My & Page"  # entity decoded
    assert text == (
        "Main Heading\n"
        "First paragraph with a link and bold.\n"
        "Second block\nafter break\n"
        "item one\nitem two")
    assert n_blocks == 6
    assert n_links == 1  # footer link is boilerplate, not counted


def test_boilerplate_kept_when_asked():
    text, _, n_blocks, n_links = extract_text(PAGE,
                                              drop_boilerplate=False)
    assert text.startswith("home | about\nSite Header\n")
    assert text.endswith("\nad ad ad\ncopyright legal")
    assert n_links == 2
    # nav, header, h1, p, div-half, br-half, 2 li, aside, footer
    assert n_blocks == 10


def test_script_style_never_leak():
    text, _, _, _ = extract_text(PAGE)
    assert "not text" not in text
    assert "color:red" not in text
    assert "var x" not in text


def test_whitespace_collapse_and_inline_tags():
    text, _, n_blocks, _ = extract_text(
        "<body><p>a\n  b\t\tc</p><p><i>x</i> <em>y</em></p></body>")
    assert text == "a b c\nx y"
    assert n_blocks == 2


def test_malformed_and_empty():
    assert extract_text("") == ("", "", 0, 0)
    assert extract_text(None) == ("", "", 0, 0)
    # unclosed tags: best-effort block splits, no crash
    text, _, n_blocks, _ = extract_text("<p>unclosed <div>nested <p>deep")
    assert text == "unclosed\nnested\ndeep"
    assert n_blocks == 3


def test_dropped_subtree_separates_blocks():
    text, _, n_blocks, _ = extract_text(
        "<body>before<nav>chrome</nav>after</body>")
    assert text == "before\nafter"
    assert n_blocks == 2


def test_dataset_stage(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "html": pa.array([PAGE, "<p>tiny page here</p>"]),
    })).repartition(2)
    t = extract_html_text(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert t.loc[0, "title"] == "My & Page"
    assert t.loc[0, "n_blocks"] == 6
    assert t.loc[1, "text"] == "tiny page here"
    assert t.loc[1, "text_md5"] == hashlib.md5(
        b"tiny page here").hexdigest()
    # keep_text=False drops the body but keeps the witness
    cols = extract_html_text(ds, keep_text=False).schema().names
    assert "text" not in cols and "text_md5" in cols


def test_binary_html_column(ray_session):
    """input_hint carries html:binary — bytes must decode, not silently
    produce empty text (HTMLParser.feed raises on bytes)."""
    t0, title, nb, nl = extract_text(b"<html><p>bytes body</p></html>")
    assert t0 == "bytes body" and nb == 1
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "html": pa.array([b"<p>bin page</p>"], pa.binary()),
    }))
    t = extract_html_text(ds).to_pandas()
    assert t.loc[0, "text"] == "bin page"
