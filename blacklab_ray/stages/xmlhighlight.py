"""XML-wellformed highlighting of hits in original content.

Semantics follow the reference's XmlHighlighter
(util/src/main/java/nl/inl/util/XmlHighlighter.java:19): insert
``<hl>``/``</hl>`` markers at hit character spans inside (a fragment
of) a well-formed XML/HTML document such that the OUTPUT is still
well formed, even when a hit span crosses element boundaries —
highlighting is suspended around any existing tag whose matching tag
lies outside the current highlight span, and unbalanced tags from
fragment cutting are repaired by adding (or removing) fix-up tags
(UnbalancedTagsStrategy, XmlHighlighter.java:25).

Also provided, mirroring the same reference class:

- ``make_well_formed``: repair a fragment cut out of a well-formed
  document (XmlHighlighter.makeWellFormed, :587).
- ``cut_around_tags``: truncate to N visible (non-tag) characters
  while keeping the tag structure intact (XmlHighlighter.cutAroundTags,
  :543) — the "first lines of a document on the results page" helper.
- ``snippet``: cut a window of visible characters around a hit span
  and return it well-formed + highlighted (the search/DocUtil.java
  snippet concern).
- ``HighlightContent``: the Ray ``map_batches`` stage applying the
  highlighter over a batch of (content, spans) rows. Display path:
  runs on RESULT-sized tables (top-k hits), never on the full corpus.

This is a from-scratch reimplementation of the documented behavior;
only the semantics (suspension rule, fix-up strategies, empty-tag
cleanup) come from the reference.
"""

from __future__ import annotations

import re

import pyarrow as pa

# group 1: "/" if close tag; group 2: tag name. Skips <!...> and <?...>.
_TAG_RE = re.compile(r"<(?![!?])\s*(/?)\s*([^>\s]+)(\s+[^>]*)?>")


def _is_self_closing(tag_text: str) -> bool:
    """Backward scan before '>': only '/' (past whitespace) means
    self-closing — mirrors XmlHighlighter.isSelfClosing:457."""
    for ch in reversed(tag_text[:-1]):
        if ch == "/":
            return True
        if ch not in " \t\n\r":
            return False
    return False

# tag-record types
_EXISTING = 0
_HL_START = 1
_HL_END = 2
_FIX_START = 3
_FIX_END = 4
_REMOVE = 5


class _Tag:
    __slots__ = ("type", "start", "end", "partner", "name", "num")

    def __init__(self, type_: int, start: int, end: int, num: int):
        self.type = type_
        self.start = start
        self.end = end
        self.partner = None   # the matching open/close _Tag, if linked
        self.name = None
        self.num = num

    def sort_key(self):
        return (self.start, self.end, self.num)


def _make_tag_list(content: str, strategy: str) -> tuple[list[_Tag], int]:
    """Scan all tags, link open/close pairs, and repair unbalanced tags
    per strategy ('add' inserts fix-up tags, 'remove' drops the
    unbalanced ones) — XmlHighlighter.makeTagList semantics."""
    tags: list[_Tag] = []
    stack: list[_Tag] = []
    num = 0
    fix_num = -1   # fix-up opens number backwards so nesting sorts right
    for m in _TAG_RE.finditer(content):
        t = _Tag(_EXISTING, m.start(), m.end(), num)
        num += 1
        is_close = bool(m.group(1))
        self_closing = (not is_close) and _is_self_closing(m.group(0))
        if not is_close:
            if self_closing:
                t.partner = t
            else:
                t.name = m.group(2)
                stack.append(t)
        else:
            open_tag = None
            if stack:
                open_tag = stack.pop()
                open_tag.name = None
            elif strategy == "remove":
                t.type = _REMOVE
            else:
                open_tag = _Tag(_FIX_START, 0, 0, fix_num)
                open_tag.name = m.group(2)
                fix_num -= 1
                tags.append(open_tag)
            if open_tag is not None:
                open_tag.partner = t
                t.partner = open_tag
        tags.append(t)
    # still-open tags: close (or remove) in reverse order
    for t in reversed(stack):
        if strategy == "remove":
            t.type = _REMOVE
        else:
            fix = _Tag(_FIX_END, len(content), len(content), num)
            num += 1
            fix.name = t.name
            fix.partner = t
            t.partner = fix
            tags.append(fix)
    return tags, num


def _add_hit_tags(tags: list[_Tag], spans, offset: int, length: int,
                  num: int) -> None:
    # existing-tag intervals, for clamping span boundaries that land
    # INSIDE a <...> tag (a start inside a tag would be skipped by the
    # renderer while its end still fired, unbalancing the highlight —
    # the reference never hits this because its spans come from token
    # offsets, but we guarantee well-formed output for any input spans)
    import bisect
    iv = sorted((t.start, t.end) for t in tags
                if t.type in (_EXISTING, _REMOVE))
    starts = [s for s, _ in iv]

    def _clamp(p: int, to_end: bool) -> int:
        i = bisect.bisect_right(starts, p) - 1
        if i >= 0 and iv[i][0] < p < iv[i][1]:
            return iv[i][1] if to_end else iv[i][0]
        return p

    clamped = []
    for s, e in spans:
        a, b = s - offset, e - offset
        if a < 0 or b > length:
            continue   # outside this fragment
        a = _clamp(a, to_end=True)
        b = _clamp(b, to_end=False)
        if a < b:
            clamped.append((a, b))
    # merge overlapping spans (SpansUnique-style normalization): with
    # overlaps, the single outer-highlight tracking used for the
    # suspension rule misjudges which span is active and can emit
    # crossing tags — merged spans keep highlight depth at most 1
    merged: list[list[int]] = []
    for a, b in sorted(clamped):
        if merged and a <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], b)
        else:
            merged.append([a, b])
    for a, b in merged:
        st = _Tag(_HL_START, a, a, num)
        en = _Tag(_HL_END, b, b, num + 1)
        st.partner = en
        en.partner = st
        num += 2
        tags.append(st)
        tags.append(en)


_EMPTY_HL = None   # compiled per (open, close) pair lazily


def _render(content: str, tags: list[_Tag], stop_after: int,
            hl_open: str, hl_close: str, trim: bool = True) -> str:
    """Emit content + tags in order, maintaining well-formedness around
    highlight spans (XmlHighlighter.highlightInternal). ``stop_after``
    < 0 disables cutting; otherwise visible (non-tag) characters are
    truncated at that count with an ellipsis."""
    if stop_after < 0:
        stop_after = len(content) + 1
    out: list[str] = []
    pos = 0
    in_hl = 0
    outer: _Tag | None = None
    visible = 0
    adding = True
    was_cut = False
    for t in sorted(tags, key=_Tag.sort_key):
        if t.start < pos:
            continue   # overlapping/malformed tag; skip defensively
        seg = content[pos:t.start]
        if adding:
            if visible + len(seg) >= stop_after:
                seg = seg[:stop_after - visible]
                if len(seg) < t.start - pos:
                    was_cut = True
                adding = False
            out.append(seg)
            visible += len(seg)
        elif pos < t.start:
            was_cut = True
        # process the tag itself
        if t.type == _HL_START:
            if in_hl == 0:
                out.append(hl_open)
                outer = t
            in_hl += 1
        elif t.type == _HL_END:
            in_hl -= 1
            if in_hl == 0:
                out.append(hl_close)
                outer = None
        elif t.type == _REMOVE:
            pass
        else:
            text = (content[t.start:t.end] if t.type == _EXISTING
                    else f"<{t.name}>" if t.type == _FIX_START
                    else f"</{t.name}>")
            suspend = False
            if in_hl > 0:
                # suspend highlighting when the matching tag falls
                # outside the current highlight span — compared in SORT
                # order (not raw positions) so fix-up tags at position 0
                # and boundary ties order correctly
                p = t.partner
                if (p is None
                        or p.sort_key() < outer.sort_key()
                        or p.sort_key() >= outer.partner.sort_key()):
                    suspend = True
            if suspend:
                out.append(hl_close)
            out.append(text)
            if suspend:
                out.append(hl_open)
        pos = t.end
    tail = content[pos:]
    if adding:
        if visible + len(tail) >= stop_after:
            cut_tail = tail[:stop_after - visible]
            was_cut = was_cut or len(cut_tail) < len(tail)
            tail = cut_tail
        out.append(tail)
    elif tail:
        was_cut = True
    joined = "".join(out)
    if trim:
        joined = joined.strip()
    return joined + ("..." if was_cut else "")


def highlight_xml(content: str, spans, offset: int = 0,
                  strategy: str = "add", remove_empty_hl: bool = True,
                  hl_open: str = "<hl>",
                  hl_close: str = "</hl>", trim: bool = True) -> str:
    """Insert highlight markers at [start, end) CHARACTER spans into
    (a fragment of) well-formed XML; output stays well-formed.

    ``offset`` is the original-document position of ``content[0]``
    (spans are given in original-document coordinates), matching
    XmlHighlighter.highlight(partialContent, hits, offset):506.
    """
    tags, num = _make_tag_list(content, strategy)
    if spans:
        _add_hit_tags(tags, spans, offset, len(content), num)
    out = _render(content, tags, -1, hl_open, hl_close, trim=trim)
    if remove_empty_hl:
        out = re.sub(re.escape(hl_open) + r"(\s*)" + re.escape(hl_close),
                     r"\1", out)
    return out


def make_well_formed(fragment: str, strategy: str = "add") -> str:
    """Repair a fragment cut (at tag boundaries) out of a well-formed
    document by adding open tags at the start / close tags at the end
    (or removing the unbalanced tags with strategy='remove')."""
    return highlight_xml(fragment, None, strategy=strategy)


def cut_around_tags(content: str, stop_after_chars: int,
                    strategy: str = "add") -> str:
    """Truncate to ``stop_after_chars`` VISIBLE characters, keeping all
    tags (and therefore well-formedness) intact."""
    tags, _ = _make_tag_list(content, strategy)
    return _render(content, tags, stop_after_chars, "<hl>", "</hl>")


def snippet(content: str, span: tuple[int, int],
            context_chars: int = 40, strategy: str = "add",
            hl_open: str = "<hl>", hl_close: str = "</hl>",
            trim: bool = True) -> str:
    """Well-formed highlighted snippet around one hit char span: cut a
    window of ± ``context_chars`` around the span, nudged outward so the
    cut never lands inside a tag, then repair + highlight (the
    search/DocUtil.java snippet path)."""
    s, e = span
    lo = max(0, s - context_chars)
    hi = min(len(content), e + context_chars)
    # never cut inside a tag: move the boundary outside any <...> that
    # straddles it
    lt = content.rfind("<", 0, lo)
    if lt != -1 and content.find(">", lt) >= lo:
        lo = lt
    gt = content.find(">", hi - 1)
    lt2 = content.rfind("<", 0, hi)
    if lt2 != -1 and gt != -1 and lt2 < hi <= gt:
        hi = gt + 1
    frag = content[lo:hi]
    return highlight_xml(frag, [(s, e)], offset=lo, strategy=strategy,
                         hl_open=hl_open, hl_close=hl_close, trim=trim)


class HighlightContent:
    """map_batches stage: add a ``highlighted`` column by applying
    ``highlight_xml`` to a content column with a parallel
    ``spans:list<struct<start,end>>`` column of char spans. Result-sized
    display stage (runs on top-k hit tables, not the corpus)."""

    def __init__(self, content_col: str = "html",
                 spans_col: str = "spans", strategy: str = "add"):
        self._content = content_col
        self._spans = spans_col
        self._strategy = strategy

    def __call__(self, batch: pa.Table) -> pa.Table:
        contents = batch.column(self._content).to_pylist()
        spans = batch.column(self._spans).to_pylist()
        out = [highlight_xml(
                   c if isinstance(c, str) else c.decode("utf-8"),
                   [(sp["start"], sp["end"]) for sp in (sl or [])],
                   strategy=self._strategy)
               for c, sl in zip(contents, spans)]
        return batch.append_column("highlighted",
                                   pa.array(out, pa.string()))
