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


# ---------------------------------------------------------------------------
# FULL grammar (contextql.jj parity): recursive boolean trees, parens,
# [index relation] term clauses, metadata filters, wildcards
# ---------------------------------------------------------------------------
# queryInternal := scope queryInternal | scopedClause
# scopedClause  := searchClause [ booleanGroup scopedClause ]   (right-assoc)
# searchClause  := "(" queryInternal ")" | [index relation] term
# (contextql.jj:60-199). Clause semantics follow ContextualQuery-
# LanguageParser.clause/contains (annotation fields -> contents
# patterns via TextPatternWildcard, other fields -> metadata filter
# queries) and CompleteQuery.and/or/not combination rules. Deviations,
# both documented: `prox/distance=N` executes (the reference throws
# on prox and on all modifiers), and span-level NOT of multi-token
# patterns raises as out of subset.

_CT_TOKEN = re.compile(r'''\s*(?:
      (?P<comment>\#[^\n]*|/\*(?:[^*]|\*(?!/))*\*/)
    | (?P<string>"(?:[^"\\]|\\.)*")
    | (?P<cmp>>=|<=|<>|=|<|>)
    | (?P<lp>\()
    | (?P<rp>\))
    | (?P<slash>/)
    | (?P<ident>[A-Za-z0-9_.\-*?]+)
    )''', re.VERBOSE)

_NAMED_COMPARITORS = {"any", "all", "exact"}
_KEYWORDS = {"and", "or", "not", "prox"}


def _ct_tokenize(q: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(q):
        m = _CT_TOKEN.match(q, pos)
        if not m or m.end() == pos:
            if q[pos:].strip() == "":
                break
            raise ValueError(f"ContextQL parse error at: {q[pos:]!r}")
        pos = m.end()
        if m.group("comment"):
            continue
        for g in ("string", "cmp", "lp", "rp", "slash", "ident"):
            if m.group(g) is not None:
                out.append((g, m.group(g)))
                break
    return out


def _unquote(tok: tuple[str, str]) -> str:
    kind, val = tok
    if kind == "string":
        body = val[1:-1]
        return re.sub(r"\\(.)", r"\1", body)
    return val


class _CtParser:
    def __init__(self, q: str):
        self.toks = _ct_tokenize(q)
        self.i = 0

    def peek(self, ahead: int = 0):
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self):
        node = self.query_internal()
        if self.i != len(self.toks):
            k, v = self.peek()
            raise ValueError(f"trailing ContextQL tokens at {v!r}")
        return node

    def query_internal(self):
        # scope: "> uri" or "> prefix = uri" — parsed and DISCARDED
        # (contextql.jj:79-91: the scope does not affect the query)
        while self.peek() == ("cmp", ">"):
            self.take()
            if self.peek()[0] not in ("ident", "string"):
                raise ValueError("expected a uri after '>'")
            self.take()
            if self.peek() == ("cmp", "="):
                self.take()
                if self.peek()[0] not in ("ident", "string"):
                    raise ValueError("expected a uri after '='")
                self.take()
        return self.scoped_clause()

    def scoped_clause(self):
        a = self.search_clause()
        k, v = self.peek()
        if k == "ident" and v.lower() in _KEYWORDS:
            op = v.lower()
            self.take()
            dist = self._modifiers(op)
            b = self.scoped_clause()
            return ("bool", op, a, b, dist)
        return a

    def _modifiers(self, op: str) -> int | None:
        """`/name=value` modifier list after a boolean. The reference
        throws on EVERY modifier (contextql.jj:218); `prox/distance=N`
        is this engine's executable extension."""
        dist = None
        while self.peek() == ("slash", "/"):
            self.take()
            k, name = self.take()
            if k != "ident":
                raise ValueError("expected a modifier name after '/'")
            val = None
            if self.peek()[0] == "cmp":
                cmp = self.take()[1]
                if cmp != "=":
                    raise ValueError(
                        "Relation modifiers not supported yet!")
                val = _unquote(self.take())
            if op == "prox" and name.lower() in ("distance", "dist"):
                dist = int(val or 1)
            elif op == "prox" and name.lower() in ("unit", "ordered"):
                pass  # accepted no-ops of the prox extension
            else:
                raise ValueError("Relation modifiers not supported yet!")
        return dist

    def search_clause(self):
        k, v = self.peek()
        if k == "lp":
            self.take()
            node = self.query_internal()
            if self.peek()[0] != "rp":
                raise ValueError("unbalanced '(' in ContextQL query")
            self.take()
            return node
        if k not in ("ident", "string") or (
                k == "ident" and v.lower() in _KEYWORDS):
            raise ValueError(f"expected a search term, got {v!r}")
        term = self.take()
        nk, nv = self.peek()
        # LOOKAHEAD(2): index relation term
        if nk == "cmp":
            rel = self.take()[1]
            if rel != "=":
                raise ValueError(
                    "Only contains (=) relation is supported!")
            self._modifiers("=")
            vk, vv = self.peek()
            if vk not in ("ident", "string"):
                raise ValueError("expected a term after the relation")
            value = _unquote(self.take())
            return ("leaf", _unquote(term), value)
        if nk == "ident" and nv.lower() in _NAMED_COMPARITORS:
            raise ValueError(f"{nv} not yet supported")
        if nk in ("ident", "string") and nv is not None \
                and (nk == "string"
                     or nv.lower() not in _KEYWORDS):
            # two adjacent terms: the middle token would have to be a
            # relation operator (reference: "Unknown relation
            # operator"); a bare juxtaposition is a parse error
            raise ValueError(
                f"Unknown relation operator: {nv}")
        return ("leaf", None, _unquote(term))


def parse_contextql_tree(q: str):
    """Parse the FULL ContextQL grammar to a tree:
    ``("leaf", field|None, value)`` /
    ``("bool", op, a, b, distance)``."""
    return _CtParser(q).parse()


def _ct_wildcard_rx(value: str) -> str:
    """TextPatternWildcard semantics: * and ? are wildcards, every
    other char is literal (shared with the filter language's
    WildcardQuery translation)."""
    from blacklab_ray.query.metafilter import _wildcard_rx
    return _wildcard_rx(value)


def _cql_esc(rx: str) -> str:
    return rx.replace("\\", "\\\\").replace('"', '\\"')


class _Pat:
    """Contents-pattern tree that stringifies to the CQL subset.

    Single-POSITION patterns (a test, or any and/or/not combination
    of width-1 patterns) carry a boolean bracket BODY — CQL's token
    expressions `[(a="x" | b="y") & !(c="z")]` express token-level
    and/or/and-not exactly (CompleteQuery's TextPatternAndNot is
    position-coincident for width-1 operands). Multi-token patterns
    combine at the span level (`&` / `|` / sequences)."""

    def __init__(self, kind, body=None, parts=None, dist=0):
        self.kind = kind        # "body" | "seq" | "and" | "or" | "prox"
        self.body = body        # bracket body (single position)
        self.parts = parts
        self.dist = dist

    def to_cql(self) -> str:
        if self.kind == "body":
            return f"[{self.body}]"
        if self.kind == "seq":
            return " ".join(p.to_cql() for p in self.parts)
        if self.kind in ("and", "or"):
            op = "&" if self.kind == "and" else "|"
            return f" {op} ".join(f"({p.to_cql()})"
                                  for p in self.parts)
        # prox: a within-distance-d ordered gap
        a, b = self.parts
        gap = "" if self.dist <= 1 else f"[]{{0,{self.dist - 1}}} "
        return f"({a.to_cql()}) {gap}({b.to_cql()})"


def _leaf_complete(field, value, annots):
    """ContextualQueryLanguageParser.contains analogue: resolve one
    clause to (pattern, filter)."""
    annot = None
    if field is None or field == "contents":
        annot = "word"
    elif field.startswith("contents."):
        annot = field[9:]
    elif field in annots:
        annot = field
    if annot is not None:
        parts = value.split()
        if not parts:
            raise ValueError("empty search term")
        poss = [_Pat("body",
                     body=f'{annot}="{_cql_esc(_ct_wildcard_rx(p))}"')
                for p in parts]
        pat = poss[0] if len(poss) == 1 else _Pat("seq", parts=poss)
        return pat, None
    # metadata filter clause (WildcardQuery / PhraseQuery analogue);
    # values outside the filter language's bare-token charset are
    # quoted, and the filter grammar's quoted strings carry no
    # escapes, so an embedded double quote is unrepresentable
    v = value
    if re.fullmatch(r"[\w.\-*?]+", v):
        flt = f"{field}:{v}"
    elif '"' not in v:
        flt = f'{field}:"{v}"'
    else:
        raise ValueError(
            "a metadata value containing a double quote is out of "
            "subset for the filter language")
    return None, flt


def _combine_complete(op, a, b, dist):
    """CompleteQuery.and/or/not combination rules (CompleteQuery.java:
    58-157), over (pattern, filter) pairs."""
    pa_, fa = a
    pb, fb = b
    if op == "and":
        if pa_ is not None and pb is not None:
            if pa_.kind == "body" and pb.kind == "body":
                p = _Pat("body",
                         body=f"({pa_.body}) & ({pb.body})")
            else:
                p = _Pat("and", parts=[pa_, pb])
        else:
            p = pa_ if pb is None else pb
        f = _and_flt(fa, fb)
        return p, f
    if op == "or":
        if (pa_ is None) != (pb is None) or (fa is None) != (fb is None):
            raise ValueError(
                "or can only be used to combine contents clauses or "
                "metadata clauses; you can't combine the two with "
                "eachother with or")
        if pa_ is None:
            p = None
        elif pa_.kind == "body" and pb.kind == "body":
            p = _Pat("body", body=f"({pa_.body}) | ({pb.body})")
        else:
            p = _Pat("or", parts=[pa_, pb])
        f = None if fa is None else f"(({fa}) OR ({fb}))"
        return p, f
    if op == "not":
        if pa_ is not None and pb is not None:
            p = _andnot_pat(pa_, pb)
        elif pa_ is None and pb is not None:
            p = _negate_pat(pb)
        else:
            p = pa_
        if fb is not None and fa is None:
            raise ValueError(
                "Cannot have not without positive clause first!")
        f = fa if fb is None else f"(({fa}) AND NOT ({fb}))"
        return p, f
    # prox (extension; the reference throws)
    if fa is not None or fb is not None:
        raise ValueError("prox cannot combine metadata clauses")
    if pa_ is None or pb is None:
        raise ValueError("prox takes two content clauses")
    return _Pat("prox", parts=[pa_, pb], dist=dist or 1), None


def _and_flt(fa, fb):
    if fa is not None and fb is not None:
        return f"(({fa}) AND ({fb}))"
    return fa if fb is None else fb


def _andnot_pat(a: _Pat, b: _Pat) -> _Pat:
    """TextPatternAndNot(a, Not(b)): token-level and-not. Expressible
    when both sides are single positions (boolean bracket body with
    `!(...)`)."""
    if a.kind == "body" and b.kind == "body":
        return _Pat("body", body=f"({a.body}) & !({b.body})")
    raise ValueError(
        "'not' between multi-token patterns is out of subset "
        "(span-level NOT)")


def _negate_pat(b: _Pat) -> _Pat:
    if b.kind == "body":
        return _Pat("body", body=f"!({b.body})")
    raise ValueError(
        "bare 'not' of a multi-token pattern is out of subset")


def contextql_to_patterns(q: str, annotations=("word", "lemma",
                                               "pos")) -> tuple:
    """Full-grammar ContextQL → ``(cql_pattern | None,
    filter_expression | None)``: the CompleteQuery analogue as a CQL
    string plus a Lucene-ish filter-language string (both already
    supported downstream)."""
    tree = parse_contextql_tree(q)
    annots = set(annotations)

    def walk(n):
        if n[0] == "leaf":
            return _leaf_complete(n[1], n[2], annots)
        _k, op, a, b, dist = n
        return _combine_complete(op, walk(a), walk(b), dist)

    pat, flt = walk(tree)
    return (None if pat is None else pat.to_cql()), flt
