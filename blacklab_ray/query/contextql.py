"""Contextual Query Language (SRU CQL) subset parser + executor.

The reference's second query front-end
(query-parser/src/main/java/nl/inl/blacklab/queryParser/contextql/
ContextualQueryLanguageParser.java): a simpler and/or/not/prox language.
Subset supported here (flat chains, one operator kind per level —
out-of-subset shapes raise with a clear message):

  spark                      bare or quoted term
  word = "spark"             explicit index relation (word only)
  a and b [and c...]         all terms in the document (doc-level AND)
  a or b [or c...]           any term (BM25 OR)
  a and b not c [not d...]   AND of positives minus docs with negatives
  a prox/distance=N b        terms within N tokens, in order
                             (lowered onto the gapped sequence join)

Lowering targets: search_taat (and/or), search_andnot (not),
sequence_search (prox) — the same operators CQL lowers onto, so both
front-ends share one execution engine (the reference's design:
ContextQL translates to the same TextPattern tree, SURVEY §2.4).
"""

from __future__ import annotations

import re

import pyarrow as pa

_TOK = re.compile(r'''\s*(?:
      "(?P<quoted>[^"]*)"
    | (?P<prox>prox(?:/[A-Za-z]+=\w+)*)
    | (?P<word>[^\s"=]+)
    | (?P<eq>=)
    )''', re.VERBOSE)

_PROX_DIST = re.compile(r"distance=(\d+)")


def _tokenize(q: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(q):
        m = _TOK.match(q, pos)
        if not m or m.end() == pos:
            if q[pos:].strip() == "":
                break
            raise ValueError(f"ContextQL parse error at: {q[pos:]!r}")
        pos = m.end()
        if m.group("quoted") is not None:
            out.append(("term", m.group("quoted")))
        elif m.group("prox") is not None:
            out.append(("prox", m.group("prox")))
        elif m.group("eq") is not None:
            out.append(("eq", "="))
        else:
            w = m.group("word")
            if w.lower() in ("and", "or", "not"):
                out.append((w.lower(), w))
            else:
                out.append(("term", w))
    return out


def parse_contextql(q: str) -> dict:
    """Parse to a flat plan dict:
    {op: 'or'|'and'|'prox', terms: [...], neg_terms: [...],
     distance: int|None}."""
    toks = _tokenize(q)
    # fold `word = "x"` relations into plain terms (only the word index
    # is searchable; anything else is out of subset)
    folded: list[tuple[str, str]] = []
    i = 0
    while i < len(toks):
        if (i + 2 < len(toks) and toks[i][0] == "term"
                and toks[i + 1][0] == "eq" and toks[i + 2][0] == "term"):
            if toks[i][1] != "word":
                raise ValueError(
                    f"only the 'word' index is searchable; got "
                    f"{toks[i][1]!r}")
            folded.append(("term", toks[i + 2][1]))
            i += 3
        elif toks[i][0] == "eq":
            raise ValueError("dangling '='")
        else:
            folded.append(toks[i])
            i += 1
    if not folded:
        raise ValueError("empty query")
    terms: list[str] = []
    neg_terms: list[str] = []
    op: str | None = None
    distance: int | None = None
    expect_term = True
    negating = False
    for kind, val in folded:
        if expect_term:
            if kind != "term":
                raise ValueError(f"expected a term, got {val!r}")
            (neg_terms if negating else terms).append(val)
            expect_term = False
        else:
            if kind == "term":
                raise ValueError(
                    f"expected and/or/not/prox before {val!r}")
            if kind == "not":
                negating = True
            elif kind in ("and", "or"):
                if negating:
                    raise ValueError(
                        "positive operator after 'not' is out of subset")
                if op is not None and op != kind:
                    raise ValueError(
                        "mixed and/or without parens is out of subset")
                op = kind
            elif kind == "prox":
                if op is not None or negating:
                    raise ValueError(
                        "prox cannot mix with and/or/not (subset)")
                op = "prox"
                m = _PROX_DIST.search(val)
                distance = int(m.group(1)) if m else 1
            else:
                raise ValueError(f"unexpected {val!r}")
            expect_term = True
    if expect_term:
        raise ValueError("query ends with an operator")
    if not terms:
        raise ValueError("empty query")
    if op == "prox" and (len(terms) != 2 or neg_terms):
        raise ValueError("prox takes exactly two terms")
    if neg_terms and op == "or":
        raise ValueError("'or ... not' is out of subset (use and)")
    return {"op": op or "or", "terms": terms, "neg_terms": neg_terms,
            "distance": distance}


def search_contextql(reader, q: str, k: int = 10,
                     quantize: bool = True,
                     resolve_urls: bool = False) -> pa.Table:
    """Execute a ContextQL query against the index."""
    from blacklab_ray.query.engine import (
        search_andnot, search_taat, sequence_search,
    )
    plan = parse_contextql(q)
    if plan["op"] == "prox":
        a, b = plan["terms"]
        return sequence_search(reader, [a, b],
                               gaps=[(0, max(0, plan["distance"] - 1))],
                               k=k, quantize=quantize,
                               resolve_urls=resolve_urls)
    mode = "and" if plan["op"] == "and" else "or"
    if plan["neg_terms"]:
        return search_andnot(reader, plan["terms"], plan["neg_terms"],
                             k=k, mode=mode, quantize=quantize,
                             resolve_urls=resolve_urls)
    return search_taat(reader, plan["terms"], k=k, mode=mode,
                       quantize=quantize, resolve_urls=resolve_urls)
