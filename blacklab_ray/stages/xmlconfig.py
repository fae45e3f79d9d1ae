"""Config-driven XML extraction — the DocIndexerXPath analogue.

The reference's config-driven indexer (indexers/config/
DocIndexerXPath.java:53; config model ConfigInputFormat /
.blf.yaml files under core/src/main/resources/formats/) is driven by
a handful of paths: documentPath selects document roots, wordPath
selects token elements, valuePath extracts the word form, per-
annotation valuePaths extract lemma/pos/…, inline tags become
structural spans, and metadata paths fill document fields.

``XmlFormatConfig`` is that config object re-expressed for the
Ray-Data pipeline: an extraction config compiles to a pure
``map_batches`` function over batches of raw XML blobs producing the
canonical pages schema plus token-aligned annotation columns
(``list<string>``) and a standoff ``tags`` column — exactly the
input contract of TokenizeForwardIndex (stages/tokenize.py), so a
config-driven corpus builds with ``BuildParams(analyzer="whitespace",
annotations=(...))`` and queries with ``[lemma="…"]`` /
``within <s/>`` out of the box.

Path subset (vs full XPath): steps are matched by LOCAL NAME (TEI /
FoLiA / PageXML namespaces need no declaration), ``.//x`` means
descendant, ``a/b`` child steps, ``@attr`` an attribute, ``a/@attr``
an attribute of a child, ``.`` the element's own text. That covers
every shipped .blf.yaml word/annotation path shape; anything fancier
belongs in a custom ``register_format`` reader.

Pre-tokenized formats pair with the whitespace analyzer (the
reference pairs them with BLWhitespaceAnalyzer for the same reason:
the token stream is the document's, not the tokenizer's).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping

import pyarrow as pa
import ray.data

__all__ = ["XmlFormatConfig", "extract_xml_config", "read_xml_config",
           "TAG_SPANS_TYPE"]

TAG_SPANS_TYPE = pa.list_(pa.struct([
    ("name", pa.string()), ("start", pa.int32()),
    ("end", pa.int32()), ("attrs", pa.string())]))


@dataclass(frozen=True)
class XmlFormatConfig:
    """One .blf.yaml-shaped extraction config."""
    name: str
    document_path: str = "."        # element path selecting doc roots
    word_path: str | None = None    # token elements (pre-tokenized XML)
    word_value: str = "."           # word form relative to the token el
    annotations: Mapping[str, str] = field(default_factory=dict)
    inline_tags: tuple[str, ...] = ()   # element names → standoff spans
    metadata: Mapping[str, str] = field(default_factory=dict)
    doc_id_value: str | None = None     # pid path relative to doc root
    text_path: str | None = None        # non-tokenized text extraction


def _local(tag) -> str:
    """Local name of an ElementTree tag ('{ns}w' → 'w')."""
    if not isinstance(tag, str):
        return ""                       # comments / PIs
    return tag.rsplit("}", 1)[-1]


def _iter_path(el, path: str):
    """Elements matching a local-name path relative to ``el``."""
    if path in (".", ""):
        yield el
        return
    descend = path.startswith(".//")
    steps = (path[3:] if descend else path.lstrip("./")).split("/")
    if descend:
        first, rest = steps[0], steps[1:]
        for sub in el.iter():
            if sub is not el and _local(sub.tag) == first:
                yield from _walk_steps(sub, rest)
    else:
        yield from _walk_steps_from(el, steps)


def _walk_steps_from(el, steps):
    if not steps:
        yield el
        return
    first, rest = steps[0], steps[1:]
    for child in el:
        if _local(child.tag) == first:
            yield from _walk_steps_from(child, rest)


def _walk_steps(el, rest):
    yield from _walk_steps_from(el, rest) if rest else iter((el,))


def _text_of(el) -> str:
    return " ".join(s.strip() for s in el.itertext() if s.strip())


def _value(el, path: str) -> str:
    """Resolve a value path: '.', '@attr', 'a/b', 'a/@attr', './/a'."""
    if path in (".", "text()"):
        return _text_of(el)
    if path.startswith("@"):
        return el.get(path[1:], "") or ""
    if "/@" in path:
        sub_path, attr = path.rsplit("/@", 1)
        for sub in _iter_path(el, sub_path):
            return sub.get(attr, "") or ""
        return ""
    for sub in _iter_path(el, path):
        return _text_of(sub)
    return ""


def _extract_doc(doc_el, cfg: XmlFormatConfig):
    """One document element → (text, {ann: values}, tag_spans, meta)."""
    meta = {k: _value(doc_el, p) for k, p in cfg.metadata.items()}
    if cfg.word_path is None:
        if cfg.text_path:
            parts = [_text_of(s) for s in _iter_path(doc_el,
                                                     cfg.text_path)]
            text = "\n".join(p for p in parts if p)
        else:
            text = _text_of(doc_el)
        return text, {}, [], meta

    word_tag = cfg.word_path.split("/")[-1]
    inline = set(cfg.inline_tags)
    words: list[str] = []
    anns: dict[str, list[str]] = {a: [] for a in cfg.annotations}
    spans: list[dict] = []

    def walk(el):
        if _local(el.tag) == word_tag:
            w = _value(el, cfg.word_value)
            # keep whitespace-analyzer alignment: a form may not
            # contain token separators
            words.append("_".join(w.split()) or "_")
            for a, p in cfg.annotations.items():
                v = _value(el, p)
                anns[a].append("_".join(v.split()) or "_")
            return
        opened = None
        if _local(el.tag) in inline:
            opened = {"name": _local(el.tag), "start": len(words),
                      "attrs": ";".join(
                          f"{_local(k)}={v}"
                          for k, v in sorted(el.attrib.items()))}
        for child in el:
            walk(child)
        if opened is not None:
            opened["end"] = len(words)
            if opened["end"] > opened["start"]:
                spans.append(opened)

    walk(doc_el)
    return " ".join(words), anns, spans, meta


def extract_xml_config(cfg: XmlFormatConfig, encoding: str = "utf-8"):
    """Compile a config to a batch extraction fn:
    (path, bytes) batch → pages batch (+ annotations/tags/meta)."""
    import xml.etree.ElementTree as ET

    def to_pages(batch: pa.Table) -> pa.Table:
        urls, texts, payloads = [], [], []
        ann_cols: dict[str, list] = {a: [] for a in cfg.annotations}
        tag_col: list = []
        meta_cols: dict[str, list] = {m: [] for m in cfg.metadata}
        langs: list = []
        for path, body in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            root = ET.fromstring(body.decode(encoding,
                                             errors="replace"))
            if cfg.document_path in (".", ""):
                doc_els = [root]
            else:
                doc_els = list(_iter_path(root, cfg.document_path))
                first_step = cfg.document_path.removeprefix(
                    ".//").lstrip("./").split("/")[0]
                if not doc_els and _local(root.tag) == first_step:
                    # the file's root element IS the document tag
                    doc_els = [root]
            for i, el in enumerate(doc_els):
                text, anns, spans, meta = _extract_doc(el, cfg)
                pid = (_value(el, cfg.doc_id_value)
                       if cfg.doc_id_value else "") or f"{path}#{i}"
                urls.append(pid)
                texts.append(text)
                payloads.append(ET.tostring(el))
                for a in ann_cols:
                    ann_cols[a].append(anns.get(a, []))
                tag_col.append(spans)
                for m in meta_cols:
                    meta_cols[m].append(meta.get(m, ""))
                langs.append(meta.get("lang") or None)
        n = len(urls)
        cols = {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.nulls(n, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
        for a, vals in ann_cols.items():
            cols[a] = pa.array(vals, pa.list_(pa.string()))
        if cfg.word_path is not None:
            cols["tags"] = pa.array(
                [[{"name": s["name"], "start": s["start"],
                   "end": s["end"], "attrs": s["attrs"]} for s in row]
                 for row in tag_col], TAG_SPANS_TYPE)
        for m, vals in meta_cols.items():
            if m != "lang":
                cols[f"meta_{m}"] = pa.array(vals, pa.string())
        return pa.table(cols)

    return to_pages


def read_xml_config(paths, cfg: XmlFormatConfig,
                    encoding: str = "utf-8", **opts) -> ray.data.Dataset:
    """Config-driven XML corpus reader: one doc per documentPath
    element; parsing runs inside map_batches tasks."""
    ds = ray.data.read_binary_files(paths, include_paths=True, **opts)
    return ds.map_batches(extract_xml_config(cfg, encoding),
                          batch_format="pyarrow")


# ---------------------------------------------------------------------------
# built-in configs — the shipped .blf.yaml analogues
# (core/src/main/resources/formats/*.blf.yaml)
# ---------------------------------------------------------------------------

TEI_P5_ANNOTATED = XmlFormatConfig(
    name="tei-p5-annotated",        # tei-p5.blf.yaml with <w> tokens
    document_path=".//TEI",
    word_path=".//w",
    word_value=".",
    annotations={"lemma": "@lemma", "pos": "@type"},
    inline_tags=("s", "p"),
    metadata={"title": ".//title", "lang": ".//language"},
    doc_id_value=".//idno",
)

FOLIA = XmlFormatConfig(
    name="folia",                   # folia.blf.yaml
    document_path=".",
    word_path=".//w",
    word_value="t",
    annotations={"lemma": "lemma/@class", "pos": "pos/@class"},
    inline_tags=("s", "p"),
    metadata={},
)

ALTO = XmlFormatConfig(
    name="alto",                    # legacy DocIndexerAlto
    document_path=".",
    word_path=".//String",
    word_value="@CONTENT",
    inline_tags=("TextLine", "TextBlock"),
    metadata={"filename": ".//fileName"},
)

PAGEXML = XmlFormatConfig(
    name="pagexml",                 # legacy DocIndexerPageXml
    document_path=".",
    word_path=".//Word",
    word_value="TextEquiv/Unicode",
    inline_tags=("TextLine", "TextRegion"),
)

NAF = XmlFormatConfig(
    name="naf",                     # naf.blf.yaml
    document_path=".",
    word_path=".//wf",
    word_value=".",
    inline_tags=(),
    metadata={"title": ".//fileDesc/@title"},
)

BUILTIN_CONFIGS = {c.name: c for c in
                   (TEI_P5_ANNOTATED, FOLIA, ALTO, PAGEXML, NAF)}
