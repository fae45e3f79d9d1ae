"""HTML → text extraction as a stateful ``map_batches`` actor stage.

The Ray-native analogue of BlackLab's config-driven document extraction
(DocIndexerXPath pulls title/word values out of XML via XPath,
engine/src/main/java/nl/inl/blacklab/indexers/config/DocIndexerXPath.java:53).
Here the "format config" is the webtext-html format: text = <title> plus
the text of each <p> block, one '\n' between blocks, boilerplate
(nav/footer/script/style) stripped. Extraction is deterministic and must
be byte-identical per url across runs and parallelism levels (the
north-rule per-row invariant).

Used as ``ds.map_batches(HtmlExtractor, batch_format="pyarrow",
concurrency=N)`` — the parser is constructed once per actor
(mirrors the reference's analyzer-per-Indexer reuse, IndexerImpl.java:45).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa

_SKIP_TAGS = {"script", "style", "nav", "footer", "head"}
_BOILERPLATE_CLASSES = {"nav", "footer", "menu", "sidebar", "ads"}
_BLOCK_TAGS = {"p", "title", "h1", "h2", "h3", "h4", "li"}


class _TextExtractor(HTMLParser):
    """Collects title + block-level text, skipping boilerplate subtrees."""

    def reset_state(self):
        self.blocks: list[str] = []
        self._buf: list[str] = []
        self._skip_depth = 0
        self._in_block = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if self._skip_depth:
            self._skip_depth += 1
            return
        cls = dict(attrs).get("class", "")
        if tag in _SKIP_TAGS and tag != "head" or (
                tag == "div" and cls in _BOILERPLATE_CLASSES):
            self._skip_depth = 1
            return
        if tag == "title":
            self._in_title = True
            self._buf = []
        elif tag in _BLOCK_TAGS:
            self._in_block += 1
            self._buf = []

    def handle_endtag(self, tag):
        if self._skip_depth:
            self._skip_depth -= 1
            return
        if tag == "title" and self._in_title:
            self._in_title = False
            self._flush()
        elif tag in _BLOCK_TAGS and self._in_block:
            self._in_block -= 1
            self._flush()

    def _flush(self):
        text = "".join(self._buf)
        if text:
            self.blocks.append(text)
        self._buf = []

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_title or self._in_block:
            self._buf.append(data)

    def extract(self, html: bytes | str) -> str:
        if isinstance(html, (bytes, memoryview)):
            html = bytes(html).decode("utf-8", errors="replace")
        self.reset()
        self.reset_state()
        self.feed(html)
        self.close()
        return "\n".join(self.blocks)


def extract_text(html: bytes | str) -> str:
    """One-shot extraction (tests / fixtures)."""
    return _TextExtractor().extract(html)


class HtmlExtractor:
    """Actor-pool batch transform: adds/overwrites the ``text`` column.

    If the batch already carries a non-null ``text`` column and
    ``trust_text`` is set, extraction is skipped for those rows (the
    testdata ``documents`` adapter path); otherwise ``text`` is computed
    from ``html``.
    """

    def __init__(self, trust_text: bool = False):
        self._parser = _TextExtractor()
        self._trust_text = trust_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._trust_text and "text" in batch.column_names:
            return batch
        htmls = batch.column("html")
        texts = [self._parser.extract(h.as_py()) for h in htmls]
        text_arr = pa.array(texts, pa.string())
        if "text" in batch.column_names:
            batch = batch.drop_columns(["text"])
        return batch.append_column("text", text_arr)
