import pyarrow as pa

from blacklab_ray.sources.synth import (
    generate_pages, pangram4_table, render_html,
)
from blacklab_ray.stages.extract import HtmlExtractor, extract_text


def test_extraction_byte_identity():
    """North-rule invariant: extract(html) == text byte-for-byte per url."""
    pages = generate_pages(100)
    for url, html, text in zip(pages["url"].to_pylist(),
                               pages["html"].to_pylist(),
                               pages["text"].to_pylist()):
        assert extract_text(html) == text, url


def test_extractor_strips_boilerplate():
    html = render_html("My Title", ["para one", "para two"])
    text = extract_text(html)
    assert text == "My Title\npara one\npara two"
    assert "home" not in text and "copyright" not in text


def test_extractor_batch_stage():
    pages = generate_pages(20)
    stage = HtmlExtractor()
    out = stage(pages.drop_columns(["text"]))
    assert out["text"].to_pylist() == pages["text"].to_pylist()
    # trust_text path leaves the given text column untouched
    stage2 = HtmlExtractor(trust_text=True)
    t2 = stage2(pages)
    assert t2["text"].to_pylist() == pages["text"].to_pylist()


def test_generator_determinism_and_shard_stability():
    a = generate_pages(40)
    b = generate_pages(40)
    assert a.equals(b)
    c = pa.concat_tables([generate_pages(25, doc_offset=0),
                          generate_pages(15, doc_offset=25)])
    assert c.equals(a)
    assert len(set(a["url"].to_pylist())) == 40


def test_pangram4_fixture():
    t = pangram4_table()
    assert t.num_rows == 4
    assert t["url"].to_pylist() == ["u0", "u1", "u2", "u3"]
