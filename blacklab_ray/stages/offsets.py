"""Token char-offset tracking + span highlighting (display support).

The reference records per-token character offsets so hits can be
highlighted in the original content (TokenStreamWithOffsets,
engine/src/main/java/nl/inl/blacklab/index/annotated/
AnnotationWriter.java:148-169; serving side util/XmlHighlighter.java).
Here:

- ``TokenOffsets``: map_batches stage adding
  ``offsets:list<struct<start,end>>`` — the [start, end) character
  range of each token in the accent-stripped display text. Offsets are
  found with per-doc ``re.finditer`` over ``[A-Za-z0-9]+`` — this is a
  display-support stage (KWIC/snippets/highlighting), NOT on the index
  hot path; the pattern matches the sensitive tokenizer so offsets
  align 1:1 with token positions.
- ``punct_between``: the punctuation/whitespace captured between
  consecutive tokens (DocIndexerBase punctuation buffer analogue,
  indexers/config/DocIndexerBase.java:86-99) — derived from the same
  offsets, so one scan serves both.
- ``highlight``: wrap token-position spans in markers within the
  display text (XmlHighlighter's well-formed-output concern is moot:
  markers are inserted outermost-first over non-overlapping spans).
"""

from __future__ import annotations

import re

import pyarrow as pa

from blacklab_ray.analysis.analyzers import strip_accents

_TOKEN_RAW = re.compile(r"[A-Za-z0-9]+")

OFFSET_STRUCT = pa.struct([("start", pa.int32()), ("end", pa.int32())])


def token_offsets(text: str) -> list[tuple[int, int]]:
    """[start, end) char offsets of each token in the display text."""
    return [(m.start(), m.end())
            for m in _TOKEN_RAW.finditer(strip_accents(text))]


def punct_between(text: str) -> list[str]:
    """Separator strings around tokens: element i is the text before
    token i; the final element is the trailing text (len = n_tokens+1,
    the reference's punct-before-each-word convention)."""
    disp = strip_accents(text)
    offs = token_offsets(text)
    out = []
    prev = 0
    for s, e in offs:
        out.append(disp[prev:s])
        prev = e
    out.append(disp[prev:])
    return out


class TokenOffsets:
    """map_batches: add ``offsets`` (+ optional ``punct``) columns."""

    def __init__(self, text_col: str = "text", punct: bool = False):
        self._text = text_col
        self._punct = punct

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self._text).to_pylist()
        offs = [token_offsets(t) for t in texts]
        arr = pa.array(
            [[{"start": s, "end": e} for s, e in o] for o in offs],
            pa.list_(OFFSET_STRUCT))
        batch = batch.append_column("offsets", arr)
        if self._punct:
            batch = batch.append_column(
                "punct", pa.array([punct_between(t) for t in texts],
                                  pa.list_(pa.string())))
        return batch


def highlight(text: str, spans: list[tuple[int, int]],
              open_tag: str = "<hl>", close_tag: str = "</hl>") -> str:
    """Display text with [start, end) TOKEN-position spans wrapped in
    markers. Overlapping spans are merged first (SpansUnique-style
    normalization keeps the output well formed)."""
    disp = strip_accents(text)
    offs = token_offsets(text)
    merged: list[list[int]] = []
    for s, e in sorted(spans):
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    out = []
    prev = 0
    for s, e in merged:
        if s >= len(offs) or s >= e:
            continue
        cs = offs[s][0]
        ce = offs[min(e, len(offs)) - 1][1]
        out.append(disp[prev:cs])
        out.append(open_tag)
        out.append(disp[cs:ce])
        out.append(close_tag)
        prev = ce
    out.append(disp[prev:])
    return "".join(out)
