"""Corpus Query Language (CQL) subset parser + executor.

A from-scratch recursive-descent parser for the working core of
BlackLab's CQL (reference grammar: query-parser/src/main/javacc/nl/inl/
blacklab/queryParser/corpusql/cql.jj:80-547; parser front-end
CorpusQueryLanguageParser.java:12). Supported subset:

  "fox"                       literal term
  "f.x" / "fo*"               regex term (full-match; * ? treated as regex)
  [word="re"]                 token constraint on the word annotation
  "a" "b"                     sequence (adjacent)
  []{n,m} / []{n} / [] / []?  bounded any-token gaps inside a sequence
  "a"{n}                      fixed repetition of a term
  X within Y  /  X containing Y   position filters between sequences

Lowering: each sequence position expands (via the term dictionary,
expand_terms) to a set of concrete terms; sequences run through
sequence_spans (multi-term positions = positional union); within/
containing run through the span algebra. Scoring: spans per doc become a
BM25 'phrase tf' exactly like phrase_search.

Out of subset (rejected with a clear error): capture groups, global
constraints (::), non-word annotations, tags (<s/>), | between sequence
items (alternation inside one position is covered by regex `a|b`).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<quoted>"(?P<qbody>[^"]*)")
    | (?P<bracket>\[\s*(?P<battr>\w+)\s*=\s*"(?P<bval>[^"]*)"\s*\])
    | (?P<any>\[\s*\])
    | (?P<rep>\{\s*(?P<rlo>\d+)\s*(?:,\s*(?P<rhi>\d+)\s*)?\})
    | (?P<qmark>\?)
    | (?P<tag><\s*(?P<tagname>\w+)\s*/\s*>)
    | (?P<word>within|containing)
    )""", re.VERBOSE)


@dataclass
class SeqPos:
    pattern: str          # regex (full-match) over the term dictionary
    literal: bool         # True → exact term, no expansion needed


@dataclass
class SeqPlan:
    positions: list[SeqPos]
    gaps: list[tuple[int, int]]     # between consecutive positions


@dataclass
class TagPlan:
    name: str                       # structural span source ("p")


@dataclass
class FilterPlan:
    op: str                         # "within" | "containing"
    producer: SeqPlan
    filter: "SeqPlan | TagPlan"


_REGEX_META = set(".*+?[](){}|\\^$")


def _is_regex(s: str) -> bool:
    return any(c in _REGEX_META for c in s)


def parse_cql(q: str) -> SeqPlan | FilterPlan:
    """Parse the CQL subset into a plan; raises ValueError on anything
    outside the subset."""
    items: list[tuple[str, object]] = []   # (kind, payload)
    pos = 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m or m.end() == pos:
            if q[pos:].strip() == "":
                break
            raise ValueError(f"CQL parse error at: {q[pos:]!r}")
        pos = m.end()
        if m.group("quoted") is not None:
            items.append(("term", m.group("qbody")))
        elif m.group("bracket") is not None:
            if m.group("battr") != "word":
                raise ValueError(
                    f"only the 'word' annotation is indexed; got "
                    f"{m.group('battr')!r}")
            items.append(("term", m.group("bval")))
        elif m.group("any") is not None:
            items.append(("any", None))
        elif m.group("rep") is not None:
            lo = int(m.group("rlo"))
            hi = int(m.group("rhi")) if m.group("rhi") else lo
            items.append(("rep", (lo, hi)))
        elif m.group("qmark") is not None:
            items.append(("rep", (0, 1)))
        elif m.group("tag") is not None:
            items.append(("tag", m.group("tagname")))
        elif m.group("word") is not None:
            items.append(("op", m.group("word")))
    # split on within/containing
    for i, (kind, val) in enumerate(items):
        if kind == "op":
            left = _build_seq(items[:i])
            rest = items[i + 1:]
            if len(rest) == 1 and rest[0][0] == "tag":
                right: SeqPlan | TagPlan = TagPlan(name=str(rest[0][1]))
            else:
                right = _build_seq(rest)
            return FilterPlan(op=str(val), producer=left, filter=right)
    if any(k == "tag" for k, _ in items):
        raise ValueError("structural tags are only supported as the "
                         "filter operand of within/containing")
    return _build_seq(items)


def _build_seq(items: list) -> SeqPlan:
    positions: list[SeqPos] = []
    gaps: list[tuple[int, int]] = []
    pending_gap: tuple[int, int] | None = None
    i = 0
    while i < len(items):
        kind, val = items[i]
        if kind == "term":
            rep = (1, 1)
            if i + 1 < len(items) and items[i + 1][0] == "rep":
                rep = items[i + 1][1]
                if rep[0] != rep[1]:
                    raise ValueError(
                        "variable repetition of terms is out of subset "
                        "(use []{n,m} gaps)")
                i += 1
            for _ in range(rep[0]):
                if positions:
                    gaps.append(pending_gap or (0, 0))
                pending_gap = None
                positions.append(SeqPos(pattern=str(val),
                                        literal=not _is_regex(str(val))))
        elif kind == "any":
            lo, hi = 1, 1
            if i + 1 < len(items) and items[i + 1][0] == "rep":
                lo, hi = items[i + 1][1]
                i += 1
            if not positions:
                raise ValueError(
                    "leading any-token is out of subset (no anchor)")
            g = pending_gap or (0, 0)
            pending_gap = (g[0] + lo, g[1] + hi)
        elif kind == "rep":
            raise ValueError("repetition without a preceding item")
        else:
            raise ValueError(f"unexpected {kind}")
        i += 1
    if pending_gap is not None:
        raise ValueError("trailing any-token is out of subset (no anchor)")
    if not positions:
        raise ValueError("empty query")
    return SeqPlan(positions=positions, gaps=gaps)


# ---------------------------------------------------------------------------
# execution
# ---------------------------------------------------------------------------

def _expand_position(reader, p: SeqPos, max_terms: int = 1024) -> list[str]:
    from blacklab_ray.query.engine import expand_terms
    if p.literal:
        return [p.pattern] if reader.term_stats([p.pattern]) else []
    return expand_terms(reader, p.pattern, "regex", max_terms)


def cql_spans(reader, q: str) -> pa.Table:
    """Evaluate a CQL query to a span table (doc_id, start, end)."""
    from blacklab_ray.query.spans import (
        SPAN_SCHEMA, sequence_spans_multi, spans_containing, spans_within,
    )
    plan = parse_cql(q)
    if isinstance(plan, FilterPlan):
        prod = cql_spans_seq(reader, plan.producer)
        if isinstance(plan.filter, TagPlan):
            if plan.filter.name != "p":
                raise ValueError(
                    f"unknown structural tag <{plan.filter.name}/>")
            filt = reader.paragraph_spans()
        else:
            filt = cql_spans_seq(reader, plan.filter)
        if plan.op == "within":
            return spans_within(prod, filt)
        return spans_containing(prod, filt)
    return cql_spans_seq(reader, plan)


def cql_spans_seq(reader, plan: SeqPlan) -> pa.Table:
    from blacklab_ray.query.spans import SPAN_SCHEMA, sequence_spans_multi
    term_sets = [_expand_position(reader, p) for p in plan.positions]
    if any(not ts for ts in term_sets):
        return SPAN_SCHEMA.empty_table()
    return sequence_spans_multi(reader, term_sets, plan.gaps)


def search_cql(reader, q: str, k: int = 10, quantize: bool = True,
               resolve_urls: bool = False) -> pa.Table:
    """Top-k docs for a CQL query, BM25-scored with tf = span count
    (the Lucene PhraseQuery convention, as in phrase_search)."""
    from blacklab_ray.codec.smallfloat import decode_norms
    from blacklab_ray.query.bm25 import idf, score_tf
    from blacklab_ray.query.engine import _norms_for, _result_table
    spans = cql_spans(reader, q)
    d_all = spans["doc_id"].to_numpy()
    if d_all.size == 0:
        return _result_table(reader, np.empty(0, np.int64),
                             np.empty(0, np.float64), resolve_urls)
    uniq, counts = np.unique(d_all, return_counts=True)
    p_idf = float(idf(uniq.size, reader.n_docs))
    dl = decode_norms(_norms_for(reader, uniq)) if quantize \
        else reader.doc_lens(uniq)
    scores = p_idf * score_tf(counts, dl, reader.avgdl)
    order = np.lexsort((uniq, -scores))[:k]
    tbl = _result_table(reader, uniq[order], scores[order], resolve_urls)
    return tbl.append_column("span_tf",
                             pa.array(counts[order], pa.int64()))
