"""Convert / tag plugin slot — real implementations.

The reference runs input files through an optional ConvertPlugin
(e.g. docx→TEI via OpenConvert) and TagPlugin (e.g. a tokenizer/
tagger) before the config-driven indexer sees them
(engine/src/main/java/nl/inl/blacklab/indexers/preprocess/
ConvertPlugin.java:12, TagPlugin.java, DocIndexerConvertAndTag.java:35
— activated by the format's ``convertPlugin``/``tagPlugin`` keys).
This module is the registry plus two REAL stdlib implementations:

- ``markdown-to-tei``: a markdown subset (headings, paragraphs,
  lists, fenced code, inline emphasis/code/links) → TEI P5 XML.
- ``whitespace-tagger``: plain TEI → ``<w>``-tokenized TEI (wraps
  the text of ``p``/``head``/``item`` blocks in ``<w>`` elements),
  so the converted document flows through the ordinary
  wordPath-based extraction. The reference ships TagPluginNoop as
  its default tagger; this one actually produces the token layer.

Both are pure functions bytes → bytes; a format config activates
them by name (stages/blfyaml.py parses the keys, xmlconfig's
extractor applies them before XML parsing).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable


@dataclass(frozen=True)
class ConvertPlugin:
    name: str
    fn: Callable[[bytes], bytes]
    input_formats: frozenset = frozenset()
    output_format: str = "tei"


CONVERT_PLUGINS: dict[str, ConvertPlugin] = {}
TAG_PLUGINS: dict[str, Callable[[bytes], bytes]] = {}


def register_convert_plugin(name: str, fn, input_formats=(),
                            output_format: str = "tei") -> None:
    CONVERT_PLUGINS[name] = ConvertPlugin(
        name, fn, frozenset(input_formats), output_format)


def register_tag_plugin(name: str, fn) -> None:
    TAG_PLUGINS[name] = fn


def get_convert_plugin(name: str) -> ConvertPlugin:
    try:
        return CONVERT_PLUGINS[name]
    except KeyError:
        raise ValueError(f"unknown convertPlugin {name!r} "
                         f"(registered: {sorted(CONVERT_PLUGINS)})") \
            from None


def get_tag_plugin(name: str):
    try:
        return TAG_PLUGINS[name]
    except KeyError:
        raise ValueError(f"unknown tagPlugin {name!r} "
                         f"(registered: {sorted(TAG_PLUGINS)})") \
            from None


# ---------------------------------------------------------------------------
# markdown → TEI


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


_INLINE_RES = (
    (re.compile(r"`([^`]*)`"), r"\1"),            # inline code
    (re.compile(r"\*\*([^*]+)\*\*"), r"\1"),      # bold
    (re.compile(r"__([^_]+)__"), r"\1"),
    (re.compile(r"\*([^*]+)\*"), r"\1"),          # italic
    (re.compile(r"_([^_]+)_"), r"\1"),
    (re.compile(r"!?\[([^\]]*)\]\([^)]*\)"), r"\1"),   # links/images
)


def _inline(s: str) -> str:
    for rx, rep in _INLINE_RES:
        s = rx.sub(rep, s)
    return _esc(s.strip())


def markdown_to_tei(data: bytes) -> bytes:
    """Markdown subset → TEI P5. The first ``# heading`` becomes the
    title; headings → ``<head>``, list items → ``<item>`` inside
    ``<list>``, fenced code blocks → ``<ab type="code">`` (verbatim,
    escaped), everything else paragraphs."""
    text = data.decode("utf-8", errors="replace")
    title = ""
    body: list[str] = []
    para: list[str] = []
    in_list = False
    in_code = False
    code: list[str] = []

    def flush_para():
        nonlocal para
        if para:
            body.append(f"<p>{_inline(' '.join(para))}</p>")
            para = []

    def close_list():
        nonlocal in_list
        if in_list:
            body.append("</list>")
            in_list = False

    for line in text.splitlines():
        if in_code:
            if line.strip().startswith("```"):
                body.append(f'<ab type="code">'
                            f"{_esc(chr(10).join(code))}</ab>")
                code, in_code = [], False
            else:
                code.append(line)
            continue
        stripped = line.strip()
        if stripped.startswith("```"):
            flush_para()
            close_list()
            in_code = True
            continue
        m = re.match(r"^(#{1,6})\s+(.*)$", stripped)
        if m:
            flush_para()
            close_list()
            h = _inline(m.group(2))
            if not title:
                title = h
            body.append(f"<head>{h}</head>")
            continue
        m = re.match(r"^[-*+]\s+(.*)$", stripped)
        if m:
            flush_para()
            if not in_list:
                body.append("<list>")
                in_list = True
            body.append(f"<item>{_inline(m.group(1))}</item>")
            continue
        if not stripped:
            flush_para()
            close_list()
            continue
        para.append(stripped)
    flush_para()
    close_list()
    if in_code:
        body.append(f'<ab type="code">{_esc(chr(10).join(code))}</ab>')
    out = (
        "<TEI>"
        "<teiHeader><fileDesc><titleStmt>"
        f"<title>{title}</title>"
        "</titleStmt></fileDesc></teiHeader>"
        f"<text><body>{''.join(body)}</body></text></TEI>")
    return out.encode("utf-8")


# ---------------------------------------------------------------------------
# whitespace tagger: plain TEI → <w>-tokenized TEI


_TOKEN_BLOCKS = ("p", "head", "item", "ab")


def whitespace_tag_tei(data: bytes) -> bytes:
    """Wrap the text of TEI block elements in ``<w>`` tokens so a
    wordPath ``.//w`` config extracts the converted document — the
    tagger stage of the convert→tag→index chain."""
    import xml.etree.ElementTree as ET
    root = ET.fromstring(data)
    for el in root.iter():
        tag = el.tag.rsplit("}", 1)[-1]
        if tag in _TOKEN_BLOCKS and el.text and el.text.strip() \
                and len(el) == 0:
            words = el.text.split()
            el.text = None
            for wd in words:
                w = ET.SubElement(el, "w")
                w.text = wd
    return ET.tostring(root)


register_convert_plugin("markdown-to-tei", markdown_to_tei,
                        input_formats=("md", "markdown"),
                        output_format="tei")
register_tag_plugin("whitespace-tagger", whitespace_tag_tei)
