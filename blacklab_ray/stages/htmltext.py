"""HTML main-text extraction — the crawl→text step of a webtext
pipeline (trafilatura / jusText shape, stdlib-only).

No reference analogue (BlackLab ingests already-tokenized XML/TEI; see
DocIndexerXPath for that path — stages/xmlconfig.py). Raw web crawls
need the step BEFORE that: strip markup, drop script/style payloads
and boilerplate chrome (nav/header/footer), and recover readable block
text. This module implements it on Python's ``html.parser`` (the only
HTML tokenizer in this sandbox), wrapped as a vector-shaped
``map_batches`` stage.

Scale notes: HTML parsing is inherently per-document (a recursive
grammar — no Arrow kernel exists), so the hot loop is per-row Python
by necessity; the stage is embarrassingly parallel, nothing shuffles,
and the parser is allocation-light (one list of block buffers per
doc). At 100 TB this runs as a wide ``map_batches`` over the crawl
shards with ``concurrency`` sized to the cluster; each task is pure
CPU with zero-copy Arrow in/out of the string columns.
"""

from __future__ import annotations

import hashlib

import numpy as np
from html.parser import HTMLParser

import pyarrow as pa
import ray.data

# elements whose entire subtree is non-content (never extracted)
_DROP_SUBTREE = frozenset(
    {"script", "style", "noscript", "template", "svg", "head"})
# boilerplate chrome dropped when drop_boilerplate=True (jusText/
# trafilatura default behavior)
_BOILERPLATE = frozenset({"nav", "header", "footer", "aside", "form"})
# elements that open a new text block (CSS block-level display)
_BLOCK = frozenset({
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "tr", "td", "th", "blockquote", "pre", "article",
    "section", "main", "figure", "figcaption", "dl", "dt", "dd",
    "body", "br", "hr",
    # boilerplate chrome is block-level too (matters when it is KEPT)
    "nav", "header", "footer", "aside", "form",
})
# void elements: no closing tag, must not push the open-element stack
_VOID = frozenset({
    "br", "hr", "img", "input", "meta", "link", "area", "base", "col",
    "embed", "source", "track", "wbr",
})


class _Extractor(HTMLParser):
    """One-pass block-text extractor.

    Maintains a depth counter per suppressed category instead of a full
    DOM: ``_drop`` > 0 means we are inside script/style/head/...,
    ``_boiler`` > 0 inside nav/header/... (when dropping boilerplate).
    Text lands in the current block buffer; block-level tags seal the
    buffer. Entities are decoded by the parser (convert_charrefs).
    """

    def __init__(self, drop_boilerplate: bool = True):
        super().__init__(convert_charrefs=True)
        self._drop_boiler = drop_boilerplate
        self.blocks: list[list[str]] = [[]]
        self.title_parts: list[str] = []
        self.n_links = 0
        self.hrefs: list[str] = []
        self.anchor_texts: list[str] = []
        self._anchor_buf: list[str] | None = None
        self._drop = 0
        self._boiler = 0
        self._in_title = False
        # parallel stacks so mismatched end tags can't underflow
        self._drop_stack: list[str] = []
        self._boiler_stack: list[str] = []

    # -- tag events --------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _DROP_SUBTREE:
            self._drop += 1
            self._drop_stack.append(tag)
            if tag == "head":
                # title lives in head and is tracked separately below,
                # so head itself contributes nothing further
                return
        if tag == "title":
            self._in_title = True
            return
        if self._drop and not self._in_title:
            return
        if self._drop_boiler and tag in _BOILERPLATE:
            # a dropped subtree still separates its neighbors' blocks
            self._seal()
            self._boiler += 1
            self._boiler_stack.append(tag)
            return
        if self._boiler:
            return
        if tag == "a":
            self.n_links += 1
            href = next((v for k, v in attrs if k == "href" and v), None)
            if href:
                if self._anchor_buf is not None:
                    # nested <a> (invalid HTML): seal the outer one
                    self.anchor_texts.append("".join(self._anchor_buf))
                self.hrefs.append(href)
                self._anchor_buf = []
        if tag in _BLOCK:
            self._seal()

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in _VOID:
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag == "title":
            self._in_title = False
            return
        if tag == "a" and self._anchor_buf is not None:
            self.anchor_texts.append("".join(self._anchor_buf))
            self._anchor_buf = None
        if self._drop_stack and tag in _DROP_SUBTREE:
            # pop the innermost matching suppressed element
            if tag in self._drop_stack:
                self._drop_stack.remove(tag)
                self._drop -= 1
            return
        if self._boiler_stack and tag in _BOILERPLATE:
            if tag in self._boiler_stack:
                self._boiler_stack.remove(tag)
                self._boiler -= 1
            return
        if self._drop or self._boiler:
            return
        if tag in _BLOCK:
            self._seal()

    # -- text --------------------------------------------------------
    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
            return
        if self._drop or self._boiler:
            return
        if data:
            if self._anchor_buf is not None:
                self._anchor_buf.append(data)
            self.blocks[-1].append(data)

    def close(self):
        super().close()
        if self._anchor_buf is not None:  # EOF inside an open <a>
            self.anchor_texts.append("".join(self._anchor_buf))
            self._anchor_buf = None

    # -- assembly ----------------------------------------------------
    def _seal(self):
        if self.blocks[-1]:
            self.blocks.append([])

    def result(self) -> tuple[str, str, int, int]:
        """(text, title, n_blocks, n_links); block text is
        whitespace-collapsed, blocks joined with newline."""
        out = []
        for buf in self.blocks:
            t = " ".join("".join(buf).split())
            if t:
                out.append(t)
        title = " ".join("".join(self.title_parts).split())
        return "\n".join(out), title, len(out), self.n_links


def extract_text(html: str | bytes, drop_boilerplate: bool = True
                 ) -> tuple[str, str, int, int]:
    """Extract (text, title, n_blocks, n_links) from one HTML string.

    Accepts ``bytes`` too (the input-hint schema carries
    ``html:binary``) — decoded utf-8 with replacement, since feeding
    bytes to HTMLParser raises and would silently yield empty text."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", "replace")
    p = _Extractor(drop_boilerplate)
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        # malformed markup: keep whatever was extracted before the
        # parser gave up (crawl data is dirty by definition)
        pass
    return p.result()


def extract_html_text(ds: ray.data.Dataset, html_col: str = "html",
                      id_col: str = "doc_id",
                      drop_boilerplate: bool = True,
                      keep_text: bool = True,
                      keep_cols: tuple = ()) -> ray.data.Dataset:
    """Dataset stage: per page, the extracted main text (+ md5 witness),
    title, block count and link count.

    ``keep_text=False`` returns only ``text_md5`` (compact equality
    witness for driver hashing, as in ``cleaning.pii_scrub``).
    """

    def _extract(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.int64())
        html = batch.column(html_col).to_pylist()
        texts, titles, n_blocks, n_links, md5s = [], [], [], [], []
        for h in html:
            t, title, nb, nl = extract_text(h, drop_boilerplate)
            texts.append(t)
            titles.append(title)
            n_blocks.append(nb)
            n_links.append(nl)
            md5s.append(hashlib.md5(t.encode()).hexdigest())
        cols = {
            id_col: ids,
            "title": pa.array(titles, pa.string()),
            "n_blocks": pa.array(n_blocks, pa.int64()),
            "n_links": pa.array(n_links, pa.int64()),
            "text_md5": pa.array(md5s, pa.string()),
        }
        if keep_text:
            cols["text"] = pa.array(texts, pa.string())
        for c in keep_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return ds.map_batches(_extract, batch_format="pyarrow")


def extract_links(ds: ray.data.Dataset, html_col: str = "html",
                  id_col: str = "doc_id",
                  drop_boilerplate: bool = True) -> ray.data.Dataset:
    """Outgoing-link edge list: one row (src, href, anchor, link_pos)
    per content-area anchor with an href (same drop/boilerplate
    scoping as the text extraction — chrome links don't become edges).
    ``anchor`` is the whitespace-collapsed link text — the classic
    target-side relevance signal.

    The crawl→graph step: feed the result to
    ``pipelines.graph.pagerank`` / host-level aggregations."""

    def _links(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        src, hrefs, anchors, pos = [], [], [], []
        for i, h in enumerate(batch.column(html_col).to_pylist()):
            if isinstance(h, bytes):
                h = h.decode("utf-8", "replace")
            p = _Extractor(drop_boilerplate)
            try:
                p.feed(h or "")
                p.close()
            except Exception:
                if p._anchor_buf is not None:  # EOF mid-anchor
                    p.anchor_texts.append("".join(p._anchor_buf))
            src.extend([ids[i]] * len(p.hrefs))
            hrefs.extend(p.hrefs)
            anchors.extend(" ".join(a.split()) for a in p.anchor_texts)
            pos.extend(range(len(p.hrefs)))
        return pa.table({
            "src": pa.array(np.asarray(src, np.int64), pa.int64()),
            "href": pa.array(hrefs, pa.string()),
            "anchor": pa.array(anchors, pa.string()),
            "link_pos": pa.array(np.asarray(pos, np.int64), pa.int64()),
        })

    return ds.map_batches(_links, batch_format="pyarrow")
