"""Corpus Query Language (CQL) subset parser + executor.

A from-scratch recursive-descent parser for the working core of
BlackLab's CQL (reference grammar: query-parser/src/main/javacc/nl/inl/
blacklab/queryParser/corpusql/cql.jj:80-547; parser front-end
CorpusQueryLanguageParser.java:12). Supported subset:

  "fox"                       literal term
  "f.x" / "fo*"               regex term (full-match; * ? treated as regex)
  [word="re"]                 token constraint on the word annotation
  [word!="re"]                negated token constraint (SpanQueryNot /
                              SpansNot semantics: matches every token
                              position whose term does not match)
  "a" "b"                     sequence (adjacent)
  []{n,m} / []{n} / [] / []?  bounded any-token gaps inside a sequence
  "a"{n} / "a"{n,m}           fixed and RANGE repetition
                              (SpanQueryRepetition.java:25 — ranges lower
                              to a union of fixed-count variants)
  "a"? / "a"+ / "a"* / "a"{n,}  quantifiers; unbounded forms are EXACT
                              (run-enumerated span elements chained to
                              a fixed point — SpansRepetition semantics
                              without the reference's NFA machinery)
  ("a" "b"){n,m} / (...)+     repetition of a multi-token group: union
                              over counts of the body concatenated
                              count times (captures cannot repeat)
  "a" "b" | "c"               alternation between sequences
                              (BLSpanOrQuery.java:57 — union of spans)
  ("a"|"b")                   single-position alternation group
  A:"x" / A:[word="re"]       capture groups: hit rows gain a {A}_pos
                              column (SpanQueryCaptureGroup.java:18)
  "Xyz"%c / [word="Xyz"]%c    case-SENSITIVE position: matched against
                              the @s annotation's postings
                              (TextPatternSensitive / MatchSensitivity
                              routing; index must be built with
                              BuildParams.sensitive=True)
  ... :: <constraints>        global constraints over captured tokens,
                              evaluated via the forward index
                              (SpansConstrained.java:15) with the full
                              MatchFilter algebra (matchfilter/
                              MatchFilter.java): comparisons
                              `A.word = B.word`, `A.lemma != "x"`,
                              annotation operands (A.lemma, A.pos, ...),
                              string constants, combined with
                              & | ! -> (implication) and parens
  X within Y  /  X containing Y   position filters between sequences

Lowering: each sequence position expands (via the term dictionary,
expand_terms) to a set of concrete terms; sequences run through
sequence_spans_multi (positional union per position, complement for
negated positions); alternation and repetition ranges union their
branches' span tables; within/containing run through the span algebra.
Scoring: spans per doc become a BM25 'phrase tf' exactly like
phrase_search.

Out of subset (rejected with a clear error): nested parens, groups of
multi-position sequences, repetition of captured positions, constraints
on non-captured names.  (Parallel annotations ARE supported: `[lemma=…]`
positions route to that annotation's postings, and constraints may
compare any indexed annotation.)
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<quoted>"(?P<qbody>(?:[^"\\]|\\.)*)")
    | (?P<bracket>\[\s*(?P<battr>\w+(?:/\w+)?)\s*(?P<bneg>!?)=\s*"(?P<bval>(?:[^"\\]|\\.)*)"\s*\])
    | (?P<any>\[\s*\])
    | (?P<rep>\{\s*(?P<rlo>\d+)\s*(?:(?P<rcomma>,)\s*(?P<rhi>\d+)?\s*)?\})
    | (?P<qmark>\?)
    | (?P<plus>\+)
    | (?P<star>\*)
    | (?P<tag><\s*(?P<tagname>\w+)(?P<tagattrs>(?:\s+\w+\s*=\s*"(?:[^"\\]|\\.)*")*)\s*/\s*>)
    | (?P<tagclose><\s*/\s*(?P<ctagname>\w+)\s*>)
    | (?P<tagopen><\s*(?P<otagname>\w+)(?P<otagattrs>(?:\s+\w+\s*=\s*"(?:[^"\\]|\\.)*")*)\s*>)
    | (?P<word>within|containing)
    | (?P<capture>(?P<capname>\w+)\s*:)
    | (?P<flag>%\s*c)
    | (?P<arrow>->)
    | (?P<amp>&)
    | (?P<pipe>\|)
    | (?P<lparen>\()
    | (?P<rparen>\))
    )""", re.VERBOSE)

MAX_VARIANTS = 256   # cap on the cross-product of BOUNDED repetition ranges

# `x+` / `x*` / `x{n,}` are EXACT (r4; closes the r3 UNBOUNDED_REP_CAP
# deviation): an unbounded repetition becomes one run-enumerated span
# element — the matched positions' consecutive runs yield every subrun
# of length >= lo, iterated to a fixed point for multi-token bodies —
# and the sequence composes span tables with a packed concat join
# (spans.concat_spans). Matches SpansRepetition semantics
# (SpanQueryRepetition.java:25) without the reference's NFA machinery
# (fimatch/Nfa.java): runs of ANY length are matched.


@dataclass
class SeqPos:
    pattern: str          # regex (full-match) over the term dictionary
    literal: bool         # True → exact term, no expansion needed
    negate: bool = False  # [word != "..."] complement position
    alts: tuple[str, ...] = ()   # additional ("a"|"b") alternatives
    capture: str | None = None   # A:[...] capture-group label
    sensitivity: str = "i"       # "%c" flag → match the @s annotation
    verify: str | None = None    # too-broad pattern: post-verify via
    #                              forward index (ClauseCombinerNfa /
    #                              SpanQueryFiSeq semantics)
    cap_open: str | None = None   # A:( ... ) group-capture start here
    cap_close: str | None = None  # ... and ends here (inclusive token)
    rep_min: int = 1              # unbounded repetition minimum (>= 1)
    unbounded: bool = False       # True → matches rep_min..∞ consecutive
    #                               occurrences (SpansRepetition exact)
    body: tuple | None = None     # unbounded GROUP repetition body:
    #                               (positions: tuple[SeqPos], gaps: tuple)


# ---------------------------------------------------------------------------
# global constraint algebra (the MatchFilter tree)
# ---------------------------------------------------------------------------
# The reference models `::` constraints as a 15-class MatchFilter tree
# (search/matchfilter/MatchFilter.java; TextPatternConstrained.java:17):
# and/or/not/implication over comparisons of captured tokens' annotation
# values (A.word, A.lemma, ...) and string constants.  Re-expressed here
# as a small recursive-descent expression parser producing CNode trees,
# evaluated vectorized over the span table via forward-index gathers
# (reader.tokens_at with annotation routing).  Values compared are the
# ANALYZED token forms (the forward index stores analyzer output), like
# the reference's insensitive default.

@dataclass
class CCmp:
    """`A.annot = B.annot` / `A.annot != "lit"` (MatchFilterEquals /
    MatchFilterCompare over MatchFilterTokenAnnotation and
    MatchFilterString operands)."""
    left: tuple     # ("cap", name, annot) | ("lit", value)
    op: str         # "=" | "!="
    right: tuple
    regex: bool = False  # right literal is a token-test REGEX — set
    #                      only by _lower_multitest's lowering of
    #                      [a="x" & b="y.*"] token tests (regex
    #                      semantics); user `::` constraints compare
    #                      literally (MatchFilterString)


@dataclass
class CNot:
    x: "CNode"


@dataclass
class CAnd:
    parts: list


@dataclass
class COr:
    parts: list


@dataclass
class CImpl:
    """`a -> b` (MatchFilterImplication): !a | b."""
    a: "CNode"
    b: "CNode"


@dataclass
class CCapRef:
    """Bare capture reference used as a boolean: true when the
    (possibly optional) capture matched in this hit
    (TestSearches.testConstraintImplication1: `c -> (a.word =
    b.word)` with `(c:'noot')?` — the reference resolves the label to
    the capture's match state)."""
    name: str


CNode = CCmp | CNot | CAnd | COr | CImpl | CCapRef

_C_TOKEN_RE = re.compile(r"""\s*(?:
      (?P<name>[A-Za-z_]\w*)\s*\.\s*(?P<annot>[A-Za-z_]\w*)
    | (?P<bare>[A-Za-z_]\w*)
    | "(?P<lit>(?:[^"\\]|\\.)*)"
    | (?P<arrow>->)
    | (?P<neq>!=)
    | (?P<eq>=)
    | (?P<bang>!)
    | (?P<amp>&)
    | (?P<pipe>\|)
    | (?P<lp>\()
    | (?P<rp>\))
    )""", re.VERBOSE)


class _ConstraintParser:
    """expr := or ('->' expr)? ; or := and ('|' and)* ;
    and := unary ('&' unary)* ; unary := '!' unary | '(' expr ')' | cmp ;
    cmp := operand ('='|'!=') operand ;
    operand := NAME.NAME | "literal"."""

    def __init__(self, expr: str):
        self.toks: list[tuple[str, object]] = []
        pos = 0
        while pos < len(expr):
            m = _C_TOKEN_RE.match(expr, pos)
            if not m or m.end() == pos:
                if expr[pos:].strip() == "":
                    break
                raise ValueError(
                    f"unsupported global constraint at: {expr[pos:]!r}")
            pos = m.end()
            if m.group("name") is not None:
                self.toks.append(("cap", (m.group("name"),
                                          m.group("annot"))))
            elif m.group("bare") is not None:
                # bare capture label: A.word-style default annotation
                # in comparisons, match-state boolean standalone
                self.toks.append(("cap", (m.group("bare"), None)))
            elif m.group("lit") is not None:
                self.toks.append(("lit", m.group("lit")))
            elif m.group("arrow"):
                self.toks.append(("op", "->"))
            elif m.group("neq"):
                self.toks.append(("op", "!="))
            elif m.group("eq"):
                self.toks.append(("op", "="))
            elif m.group("bang"):
                self.toks.append(("op", "!"))
            elif m.group("amp"):
                self.toks.append(("op", "&"))
            elif m.group("pipe"):
                self.toks.append(("op", "|"))
            elif m.group("lp"):
                self.toks.append(("lp", None))
            else:
                self.toks.append(("rp", None))
        self.i = 0

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None,
                                                                  None)

    def parse(self) -> CNode:
        node = self._expr()
        if self.i < len(self.toks):
            raise ValueError(
                f"trailing constraint tokens: {self.toks[self.i:]!r}")
        return node

    def _expr(self) -> CNode:
        left = self._or()
        if self._peek() == ("op", "->"):
            self.i += 1
            return CImpl(a=left, b=self._expr())   # right-assoc
        return left

    def _or(self) -> CNode:
        parts = [self._and()]
        while self._peek() == ("op", "|"):
            self.i += 1
            parts.append(self._and())
        return parts[0] if len(parts) == 1 else COr(parts=parts)

    def _and(self) -> CNode:
        parts = [self._unary()]
        while self._peek() == ("op", "&"):
            self.i += 1
            parts.append(self._unary())
        return parts[0] if len(parts) == 1 else CAnd(parts=parts)

    def _unary(self) -> CNode:
        kind, val = self._peek()
        if (kind, val) == ("op", "!"):
            self.i += 1
            return CNot(x=self._unary())
        if kind == "lp":
            self.i += 1
            node = self._expr()
            if self._peek()[0] != "rp":
                raise ValueError("unbalanced '(' in constraint")
            self.i += 1
            return node
        return self._cmp()

    def _operand(self) -> tuple:
        kind, val = self._peek()
        if kind == "cap":
            self.i += 1
            return ("cap", val[0], val[1])
        if kind == "lit":
            self.i += 1
            return ("lit", val)
        raise ValueError(
            f"expected A.annotation or \"literal\" in constraint, "
            f"got {val!r}")

    def _cmp(self) -> "CCmp | CCapRef":
        left = self._operand()
        kind, val = self._peek()
        if kind != "op" or val not in ("=", "!="):
            if left[0] == "cap" and left[2] is None:
                # bare capture as a boolean: did it match?
                return CCapRef(name=left[1])
            raise ValueError(
                "constraint comparisons support = and != only "
                f"(got {val!r})")
        self.i += 1
        right = self._operand()
        return CCmp(left=left, op=str(val), right=right)


def parse_constraints(expr: str) -> CNode:
    """Parse a `::` constraint expression into a MatchFilter tree."""
    return _ConstraintParser(expr).parse()


def _constraint_captures(node: CNode) -> set[str]:
    if isinstance(node, CCapRef):
        return {node.name}
    if isinstance(node, CCmp):
        return {o[1] for o in (node.left, node.right) if o[0] == "cap"}
    if isinstance(node, CNot):
        return _constraint_captures(node.x)
    if isinstance(node, CImpl):
        return _constraint_captures(node.a) | _constraint_captures(node.b)
    return set().union(*(_constraint_captures(p) for p in node.parts))


def _eval_constraint(reader, node: CNode, spans: pa.Table,
                     d: np.ndarray) -> np.ndarray:
    """Vectorized boolean evaluation of a MatchFilter tree over a span
    table (SpansConstrained.java:15 post-filter, one forward-index
    gather per distinct (capture, annotation) operand)."""
    if isinstance(node, CCmp):
        from blacklab_ray.analysis.analyzers import normalize_text

        def resolve(op):
            if op[0] == "lit":
                return None  # handled below
            _, name, annot = op
            pos = spans[f"{name}_pos"].to_numpy()
            toks = reader.tokens_at(d, np.where(pos < 0, 0, pos),
                                    annotation=annot)
            # -1 sentinel = the optional capture did not match in
            # this hit: its value is undefined → comparisons false
            return [None if p < 0 else t
                    for t, p in zip(toks, pos)]

        def fold(x):
            # MatchFilterEquals compares INSENSITIVE (cql.jj:147):
            # lowercase + accent strip both sides (idempotent when the
            # fwd stream is already the normalized 'i' annotation)
            return None if x is None else normalize_text(x)
        ta = resolve(node.left)
        tb = resolve(node.right)
        if ta is None and tb is None:
            eq = np.full(len(d), normalize_text(str(node.left[1]))
                         == normalize_text(str(node.right[1])))
        elif ta is None or tb is None:
            toks = tb if ta is None else ta
            lit = node.left[1] if ta is None else node.right[1]
            if node.regex and _is_regex(str(lit)):
                rx = re.compile(f"^(?:{lit})$")
                eq = np.array([x is not None and bool(rx.match(x))
                               for x in toks], dtype=bool)
            else:
                nlit = normalize_text(str(lit))
                eq = np.array([x is not None and fold(x) == nlit
                               for x in toks], dtype=bool)
        else:
            eq = np.array([x is not None and fold(x) == fold(y)
                           for x, y in zip(ta, tb)], dtype=bool)
        return eq if node.op == "=" else ~eq
    if isinstance(node, CCapRef):
        # bare capture: true where the (optional) capture matched
        return spans[f"{node.name}_pos"].to_numpy() >= 0
    if isinstance(node, CNot):
        return ~_eval_constraint(reader, node.x, spans, d)
    if isinstance(node, CImpl):
        return (~_eval_constraint(reader, node.a, spans, d)
                | _eval_constraint(reader, node.b, spans, d))
    parts = [_eval_constraint(reader, p, spans, d) for p in node.parts]
    return np.logical_and.reduce(parts) if isinstance(node, CAnd) \
        else np.logical_or.reduce(parts)


@dataclass
class SeqPlan:
    positions: list[SeqPos]
    gaps: list[tuple[int, int]]     # between consecutive positions
    lead: tuple[int, int] | None = None    # leading []{n,m} expansion
    trail: tuple[int, int] | None = None   # trailing []{n,m} expansion


@dataclass
class UnionPlan:
    branches: list[SeqPlan]         # span union (BLSpanOrQuery)


@dataclass
class AndPlan:
    """Query-level `a & b` (simpleQuery booleanOperator,
    GeneratedCorpusQueryLanguageParser.java:231 — RIGHT-associative):
    TextPatternAnd / SpanQueryAnd.java:7-10 keeps only spans with the
    same doc, start AND end in every clause. Capture columns of the
    FIRST clause are kept."""
    parts: list


@dataclass
class AnchorPlan:
    """Edge-anchored query: a leading `<s>` / trailing `</s>` tag
    (corpusql tag() production → TextPatternEdge: the zero-width
    LEFT/RIGHT edge of the tag spans, sequenced with the rest —
    equivalently, the inner spans filtered to start at a tag start /
    end at a tag end)."""
    inner: object
    open: tuple | None    # (name, attrs) — inner.start ∈ tag starts
    close: tuple | None   # (name, attrs) — inner.end ∈ tag ends


@dataclass
class TagPlan:
    name: str                       # structural span source
    attrs: dict = None              # attribute filters (<s type="q"/>)


@dataclass
class FilterPlan:
    op: str                         # "within" | "containing"
    producer: "SeqPlan | UnionPlan"
    filter: "SeqPlan | UnionPlan | TagPlan"


@dataclass
class NGramPlan:
    """Pure any-token n-gram producer of a position filter
    (`[]{1,5} containing X` — SpanQueryFilterNGrams.java:18): grams
    are enumerated around the filter spans, never materialized
    corpus-wide."""
    lo: int
    hi: int


@dataclass
class ExpandPlan:
    """A parenthesized subquery sequenced with any-token (optionally
    captured) neighbours — `a:[] (X containing Y) b:[]` — lowered to
    stretch-by-n expansion of the subquery spans
    (SpanQueryExpansion.java:36, the reference's own rewrite for
    TestSearches.testConstraintSimple4/4a shapes). Units are
    (lo, hi, capture_name|None); captured units must be width 1."""
    inner: object
    pre: tuple = ()
    post: tuple = ()


_REGEX_META = set(".*+?[](){}|\\^$")


def _scan_quoted(q: str, i: int, quote: str) -> int:
    """``q[i] == quote``: return the index of the CLOSING quote,
    honoring backslash escapes (cql.jj:85 QUOTED_STRING:
    ``(~["\\"","\\\\"] | "\\\\" ~[])*``), or -1 if unterminated."""
    j, n = i + 1, len(q)
    while j < n:
        c = q[j]
        if c == "\\":
            j += 2
        elif c == quote:
            return j
        else:
            j += 1
    return -1


def _normalize_quotes(q: str) -> str:
    """Single-quoted strings are allowed wherever double-quoted ones
    are (CorpusQueryLanguageParser.getStringBetweenQuotes,
    allowSingleQuotes default true; chopEnds keeps backslash escapes
    raw). Normalized to double quotes before tokenizing; a bare ``"``
    inside a single-quoted string becomes ``\\"``."""
    out: list[str] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c == '"':
            j = _scan_quoted(q, i, '"')
            if j < 0:
                out.append(q[i:])
                break
            out.append(q[i:j + 1])
            i = j + 1
        elif c == "'":
            j = _scan_quoted(q, i, "'")
            if j < 0:
                raise ValueError("unterminated single-quoted string")
            body = q[i + 1:j]
            # escape bare double quotes (escape pairs pass through)
            buf, k, m = [], 0, len(body)
            while k < m:
                if body[k] == "\\":
                    buf.append(body[k:k + 2])
                    k += 2
                elif body[k] == '"':
                    buf.append('\\"')
                    k += 1
                else:
                    buf.append(body[k])
                    k += 1
            out.append('"' + "".join(buf) + '"')
            i = j + 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _is_regex(s: str) -> bool:
    return any(c in _REGEX_META for c in s)


def _tokenize(q: str) -> list[tuple[str, object]]:
    items: list[tuple[str, object]] = []
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
            # annot/subannot routes to the parent_sub annotation
            # (annotName production; AnnotatedFieldNameUtil.java:32)
            attr = m.group("battr").replace("/", "_")
            kind = "nterm" if m.group("bneg") else "term"
            if attr == "word":
                items.append((kind, m.group("bval")))
            else:
                # parallel-annotation constraint ([lemma="..."] etc.):
                # routed at execution time; unknown annotations fail
                # there with the index's actual annotation list
                items.append((kind, (attr, m.group("bval"))))
        elif m.group("any") is not None:
            items.append(("any", None))
        elif m.group("rep") is not None:
            lo = int(m.group("rlo"))
            if m.group("rhi"):
                hi: int | None = int(m.group("rhi"))
            elif m.group("rcomma"):        # {n,} — open range, EXACT
                hi = None
            else:
                hi = lo
            if hi is not None and hi < lo:
                raise ValueError(f"bad repetition range {{{lo},{hi}}}")
            items.append(("rep", (lo, hi)))
        elif m.group("qmark") is not None:
            items.append(("rep", (0, 1)))
        elif m.group("plus") is not None:
            items.append(("rep", (1, None)))
        elif m.group("star") is not None:
            items.append(("rep", (0, None)))
        elif m.group("tag") is not None:
            attrs = dict(re.findall(r'(\w+)\s*=\s*"((?:[^"\\\\]|\\\\.)*)"',
                                    m.group("tagattrs") or ""))
            items.append(("tag", (m.group("tagname"), attrs)))
        elif m.group("tagclose") is not None:
            items.append(("tagclose", (m.group("ctagname"), {})))
        elif m.group("tagopen") is not None:
            attrs = dict(re.findall(r'(\w+)\s*=\s*"((?:[^"\\\\]|\\\\.)*)"',
                                    m.group("otagattrs") or ""))
            items.append(("tagopen", (m.group("otagname"), attrs)))
        elif m.group("word") is not None:
            items.append(("op", m.group("word")))
        elif m.group("capture") is not None:
            items.append(("cap", m.group("capname")))
        elif m.group("flag") is not None:
            items.append(("flag", "c"))
        elif m.group("arrow") is not None:
            items.append(("arrow", None))
        elif m.group("amp") is not None:
            items.append(("amp", None))
        elif m.group("pipe") is not None:
            items.append(("pipe", None))
        elif m.group("lparen") is not None:
            items.append(("lparen", None))
        elif m.group("rparen") is not None:
            items.append(("rparen", None))
    return items


_FUNC_CALL_RE = re.compile(r"(?<![\w.%])(?P<fn>[A-Za-z_]\w*)\s*\(")


def _lower_query_functions(q: str) -> str:
    """Lower query-function calls — ``_FI1(a, b)`` / ``_FI2(a, b)``
    (cql.jj:386 queryFunctionCall → TextPatternQueryFunction.java:31)
    — to the plain two-clause sequence ``a b``: the functions are
    execution-strategy hints (resolve one clause via the forward
    index, SpanQueryFiSeq) whose MATCHES equal the sequence's; this
    engine chooses its own per-clause strategy. Non-``_``-prefixed
    names and wrong arity raise, like the reference."""
    if "(" not in q or not _FUNC_CALL_RE.search(q):
        return q
    out: list[str] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c == '"':
            j = _scan_quoted(q, i, '"')
            j = n - 1 if j < 0 else j
            out.append(q[i:j + 1])
            i = j + 1
            continue
        m = _FUNC_CALL_RE.match(q, i)
        if m is None or m.group("fn") in ("within", "containing"):
            out.append(c)
            i += 1
            continue
        name = m.group("fn")
        # scan to the matching ')' (quote/brace-aware), splitting
        # depth-0 commas (commas inside {n,m} are repetition bounds)
        j = m.end()
        depth, brace = 1, 0
        args: list[str] = []
        a0 = j
        while j < n and depth > 0:
            cj = q[j]
            if cj == '"':
                k = _scan_quoted(q, j, '"')
                j = (n if k < 0 else k) + 1
                continue
            if cj == "(":
                depth += 1
            elif cj == ")":
                depth -= 1
                if depth == 0:
                    args.append(q[a0:j])
                    j += 1
                    break
            elif cj == "{":
                brace += 1
            elif cj == "}":
                brace = max(0, brace - 1)
            elif cj == "," and depth == 1 and brace == 0:
                args.append(q[a0:j])
                a0 = j + 1
            j += 1
        else:
            if depth > 0:
                raise ValueError(
                    f"unbalanced '(' in query function {name}(...)")
        if not name.startswith("_"):
            raise ValueError(
                "query functions are a BlackLab-specific extension "
                "and must start with '_'")
        if name not in ("_FI1", "_FI2"):
            raise ValueError(
                f"unsupported query function {name!r} "
                "(supported: _FI1, _FI2)")
        if len(args) != 2 or not all(a.strip() for a in args):
            raise ValueError(
                f"query function {name} takes two arguments")
        parts = []
        for a in (s.strip() for s in args):
            a = _lower_query_functions(a)
            # an arg with a top-level boolean or position-filter
            # operator needs grouping (without it, '"a", "b" within
            # <s/>' would silently regroup as '("a" "b") within <s/>')
            parts.append(f"({a})" if _needs_func_arg_group(a) else a)
        out.append(" ".join(parts))
        i = j
    return "".join(out)


_DEPTH0_OP_RE = re.compile(r"\b(?:within|containing)\b")


def _needs_func_arg_group(q: str) -> bool:
    depth, i, n = 0, 0, len(q)
    while i < n:
        c = q[i]
        if c == '"':
            j = _scan_quoted(q, i, '"')
            i = (n if j < 0 else j) + 1
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif depth == 0:
            if c in "|&":
                return True
            m = _DEPTH0_OP_RE.match(q, i)
            if m:
                return True
        i += 1
    return False


def parse_cql(q: str) -> SeqPlan | UnionPlan | FilterPlan:
    """Parse the CQL subset into a plan; raises ValueError on anything
    outside the subset.

    Edge-anchored tags (`<s> X`, `X </s>`) bind at the SEQUENCE level,
    tighter than the boolean operators (cql.jj:215 simpleQuery :=
    sequence [booleanOperator simpleQuery] where tag() is a
    sequencePart) — `<p> "a" | "b"` anchors only the `"a"` branch —
    so anchor stripping happens per sequence inside `_build_union`,
    not here."""
    return _parse_items(_tokenize(
        _lower_query_functions(_normalize_quotes(q))))


def _collapse_filter_groups(items: list) -> list:
    """Replace parenthesized groups whose body contains a depth-0
    within/containing — `("a" within <s/>)` — with one
    ("subplan", FilterPlan) item (sequencePart := "(" complexQuery ")",
    cql.jj:351: the position-filter operators are legal inside
    parens). Recursive; other paren groups pass through untouched."""
    out: list = []
    i, n = 0, len(items)
    while i < n:
        kind, _val = items[i]
        if kind != "lparen":
            out.append(items[i])
            i += 1
            continue
        depth, j = 1, i + 1
        has_op = False
        while j < n and depth > 0:
            k = items[j][0]
            if k == "lparen":
                depth += 1
            elif k == "rparen":
                depth -= 1
            elif k == "op" and depth == 1:
                has_op = True
            j += 1
        if depth > 0:
            raise ValueError("unbalanced '('")
        if has_op:
            out.append(("subplan", _parse_items(items[i + 1:j - 1])))
        else:
            out.extend(items[i:j])
        i = j
    return out


def _parse_items(items: list):
    items = _collapse_filter_groups(items)
    # split on within/containing (only meaningful at paren depth 0)
    depth = 0
    for i, (kind, val) in enumerate(items):
        if kind == "lparen":
            depth += 1
        elif kind == "rparen":
            depth -= 1
        elif kind == "op" and depth == 0:
            head = items[:i]
            if len(head) == 1 and head[0][0] == "tag":
                # `<u/> containing X`: structural spans as the PRODUCER
                # (SpanQueryPositionFilter with a tag producer)
                hname, hattrs = head[0][1]
                left: SeqPlan | UnionPlan | TagPlan = \
                    TagPlan(name=str(hname), attrs=hattrs)
            elif (rng := _pure_any_range(head)) is not None:
                # `[]{1,5} containing X`: n-gram producer enumerated
                # around the filter spans (SpanQueryFilterNGrams)
                if rng[1] is None:
                    raise ValueError(
                        "unbounded any-token producers of a position "
                        "filter are out of subset")
                left = NGramPlan(lo=rng[0], hi=rng[1])
            else:
                left = _build_union(head)
            rest = items[i + 1:]
            if len(rest) == 1 and rest[0][0] == "tag":
                tname, tattrs = rest[0][1]
                right: SeqPlan | UnionPlan | TagPlan = \
                    TagPlan(name=str(tname), attrs=tattrs)
            else:
                right = _build_union(rest)
            return FilterPlan(op=str(val), producer=left, filter=right)
    if len(items) == 1 and items[0][0] == "tag":
        # standalone structural tag query (`<character/>` —
        # SpanQueryTags.java:31 as a top-level query, the
        # TestStandoffSpans.java shape): the tag spans ARE the result
        name, attrs = items[0][1]
        return TagPlan(name=str(name), attrs=attrs)
    if any(k == "tag" for k, _ in items):
        raise ValueError("structural tags are only supported as the "
                         "filter operand of within/containing, a "
                         "standalone tag query, or edge anchors")
    return _build_union(items)


def _lower_subplan_sequence(items: list) -> "ExpandPlan | None":
    """Lower `pre... (subplan) post...` where pre/post are any-token
    units (optionally captured, `a:[]`) to an ExpandPlan. Returns
    None when the neighbours contain term positions (out of subset).
    """
    sub = None
    pre: list[tuple] = []
    post: list[tuple] = []
    side = pre
    cap = None
    i = 0
    while i < len(items):
        kind, val = items[i]
        if kind == "subplan":
            if sub is not None:
                return None            # two subplans in one sequence
            sub = val
            side = post
            if cap is not None:
                return None            # capture label on the subplan
        elif kind == "cap":
            if cap is not None:
                return None
            cap = str(val)
        elif kind == "any":
            lo, hi = 1, 1
            if i + 1 < len(items) and items[i + 1][0] == "rep":
                lo, hi = items[i + 1][1]
                i += 1
            if cap is not None and (lo, hi) != (1, 1):
                raise ValueError(
                    "captured any-token next to a group must have "
                    "width 1")
            side.append((lo, hi, cap))
            cap = None
        else:
            return None
        i += 1
    if sub is None or cap is not None:
        return None
    if any(u[1] is None for u in pre + post):
        raise ValueError(
            "unbounded any-token stretch around a parenthesized "
            "group is out of subset")
    return ExpandPlan(inner=sub, pre=tuple(pre), post=tuple(post))


def _pure_any_range(items: list) -> "tuple[int, int | None] | None":
    """If ``items`` is ONLY any-token units (`[] []{2,3} …`), the
    summed width range (lo, hi) — hi None for unbounded; else None."""
    lo, hi = 0, 0
    i = 0
    seen = False
    while i < len(items):
        k, _v = items[i]
        if k != "any":
            return None
        seen = True
        l, h = 1, 1
        if i + 1 < len(items) and items[i + 1][0] == "rep":
            l, h = items[i + 1][1]
            i += 1
        lo += l
        hi = None if (hi is None or h is None) else hi + h
        i += 1
    return (lo, hi) if seen else None


def _collapse_groups(items: list) -> list:
    """Replace `( p1 | p2 | ... )` groups (single positions only) with
    one ("alt", [patterns]) item. Nested parens are out of subset."""
    out = []
    i = 0
    while i < len(items):
        kind, val = items[i]
        if kind == "lparen":
            j = i + 1
            inner = []
            while j < len(items) and items[j][0] != "rparen":
                if items[j][0] == "lparen":
                    raise ValueError("nested parens are out of subset")
                inner.append(items[j])
                j += 1
            if j >= len(items):
                raise ValueError("unbalanced '('")
            if not any(k == "pipe" for k, _ in inner):
                # pipe-free group: a SEQUENCE group — splice its items
                # back wrapped in markers so a preceding capture label
                # binds the whole sub-span (A:("x" "y") →
                # SpanQueryCaptureGroup over a multi-token clause)
                if not inner:
                    raise ValueError("empty group")
                out.append(("gopen", None))
                out.extend(inner)
                out.append(("gclose", None))
                i = j + 1
                continue
            members: list[tuple] = []
            expect_term = True
            for k, v in inner:
                if expect_term and k in ("term", "nterm"):
                    members.append((k, v))
                    expect_term = False
                elif not expect_term and k == "pipe":
                    expect_term = True
                else:
                    raise ValueError(
                        "parenthesized groups support single-position "
                        "alternation only, e.g. (\"a\"|\"b\") — or a "
                        "pipe-free sequence group")
            if expect_term or not members:
                raise ValueError("empty or dangling '|' in group")
            if all(k == "term" and not isinstance(v, tuple)
                   for k, v in members):
                # homogeneous word-annotation positives: ONE position
                # whose postings are the union (the cheap path)
                out.append(("alt", [str(v) for _k, v in members]))
            else:
                # heterogeneous members (parallel annotations or
                # negations): expanded into sequence variants by
                # _expand_alt_groups (TextPatternOr over one position)
                out.append(("altv", members))
            i = j + 1
        elif kind == "rparen":
            raise ValueError("unbalanced ')'")
        else:
            out.append((kind, val))
            i += 1
    return out


def _expand_alt_groups(items: list) -> list[list]:
    """Lower heterogeneous single-position alternation groups —
    `([word="a"] | [lemma="b"])`, negated members — into item-list
    variants, one per member choice (cross product across groups,
    capped at MAX_VARIANTS). Homogeneous word-only groups stay the
    single-position ("alt", patterns) fast path."""
    variants: list[list] = [[]]
    for it in items:
        if it[0] == "altv":
            variants = [v + [m] for v in variants for m in it[1]]
            if len(variants) > MAX_VARIANTS:
                raise ValueError(
                    f"alternation groups expand to {len(variants)} "
                    f"variants (cap {MAX_VARIANTS})")
        else:
            for v in variants:
                v.append(it)
    return variants


def _build_union(items: list) -> "SeqPlan | UnionPlan | AndPlan":
    # query-level boolean operators first (simpleQuery := sequence
    # (booleanOperator simpleQuery)? — the FIRST depth-0 operator
    # decides, RIGHT-associative like the reference grammar)
    depth = 0
    for i, (kind, _val) in enumerate(items):
        if kind == "lparen":
            depth += 1
        elif kind == "rparen":
            depth -= 1
        elif depth == 0 and kind == "arrow":
            raise ValueError(
                "implication is only supported within global "
                "constraints (`:: a -> b`)")
        elif depth == 0 and kind == "amp":
            if not items[:i] or not items[i + 1:]:
                raise ValueError("dangling '&'")
            return AndPlan(parts=[_build_union(items[:i]),
                                  _build_union(items[i + 1:])])
        elif depth == 0 and kind == "pipe":
            if not items[:i] or not items[i + 1:]:
                raise ValueError("dangling '|'")
            left = _build_union(items[:i])
            right = _build_union(items[i + 1:])
            lb = left.branches if isinstance(left, UnionPlan) \
                else [left]
            rb = right.branches if isinstance(right, UnionPlan) \
                else [right]
            return UnionPlan(branches=lb + rb)
    # no depth-0 boolean operator: this is one sequence() — strip its
    # edge anchors (tag() is a sequencePart, cql.jj:351, so a leading
    # <s> / trailing </s> anchor THIS branch only, not the whole query)
    open_anchor = close_anchor = None
    if items and items[0][0] == "tagopen":
        open_anchor = items[0][1]
        items = items[1:]
    if items and items[-1][0] == "tagclose":
        close_anchor = items[-1][1]
        items = items[:-1]
    if any(k in ("tagopen", "tagclose") for k, _ in items):
        raise ValueError(
            "edge-anchored tags (<s> / </s>) are only supported at "
            "the start/end of a sequence")
    if any(k == "subplan" for k, _ in items):
        if len(items) == 1:
            sub = items[0][1]
        else:
            sub = _lower_subplan_sequence(items)
            if sub is None:
                raise ValueError(
                    "a parenthesized within/containing group may only "
                    "be sequenced with any-token elements "
                    "(`a:[] (X containing Y) b:[]`); sequencing it "
                    "with term positions is out of subset")
        if open_anchor or close_anchor:
            return AnchorPlan(inner=sub, open=open_anchor,
                              close=close_anchor)
        return sub
    branches: list[SeqPlan] = []
    for var0 in _expand_alt_groups(_collapse_groups(items)):
        for var in _expand_group_reps(var0):
            branches.extend(_build_seq_variants(var))
    if not branches:
        raise ValueError("empty query")
    plan = branches[0] if len(branches) == 1 \
        else UnionPlan(branches=branches)
    if open_anchor or close_anchor:
        return AnchorPlan(inner=plan, open=open_anchor,
                          close=close_anchor)
    return plan


def _expand_group_reps(items: list) -> list[list]:
    """Lower repeated sequence groups — `("a" "b"){2,3}` — into item-
    list variants (SpanQueryRepetition over a multi-token clause: the
    union over counts of the body concatenated count times). Group
    markers are dropped for repeated groups (captures cannot repeat);
    un-repeated groups pass through untouched for the capture
    machinery."""
    variants: list[list] = [[]]
    i = 0
    while i < len(items):
        kind, val = items[i]
        if kind == "gopen":
            j = i + 1
            while j < len(items) and items[j][0] != "gclose":
                j += 1
            if j + 1 < len(items) and items[j + 1][0] == "rep":
                lo, hi = items[j + 1][1]
                body = items[i + 1:j]
                if any(k == "cap" for k, _ in body) and \
                        not (hi is not None and hi <= 1):
                    # `(c:'noot')?` is fine (the capture occurs at
                    # most once: the zero-count variant leaves it
                    # unset, the -1 sentinel); true repetition of an
                    # inner capture is out of subset
                    raise ValueError(
                        "captures inside repeated groups are out of "
                        "subset")
                cap_label = None
                if i > 0 and items[i - 1][0] == "cap":
                    # `group:('aap')+` — the capture spans the WHOLE
                    # repetition (the group is the repetition's
                    # operand); the label item was already appended
                    # to every variant — take it back
                    cap_label = str(items[i - 1][1])
                    for v in variants:
                        if v and v[-1] == items[i - 1]:
                            v.pop()
                if hi is None:
                    # `(...){n,}` / `(...)+` / `(...)*` — EXACT: one
                    # unbounded-group element (chained to a fixed
                    # point at execution), plus the absent variant
                    # for lo == 0
                    marker = ("ubgroup", (tuple(body), max(lo, 1),
                                          cap_label))
                    absent = [list(v) for v in variants] if lo == 0 \
                        else []
                    variants = [v + [marker] for v in variants]
                    variants += absent
                    i = j + 2
                    continue
                counts = []
                for c in range(lo, hi + 1):
                    if c == 0:
                        counts.append([])       # capture stays unset
                    elif cap_label is None:
                        counts.append(list(body) * c)
                    elif (lo, hi) == (1, 1) and len(body) == 1:
                        # degenerate {1,1}: single-token capture
                        # (c_pos — usable in `::` constraints, like
                        # an unparenthesized `c:'noot'`)
                        counts.append([("cap", cap_label)]
                                      + list(body))
                    else:
                        # multi-token capture over the c copies —
                        # ALL counts of one range use the SAME
                        # column shape (A_start/A_end); mixing a
                        # c==1 A_pos variant with c>=2 group
                        # variants would leave the union's -1
                        # sentinel masquerading as 'capture unset'
                        # for every multi-count hit
                        counts.append([("cap", cap_label),
                                       ("gopen", None)]
                                      + list(body) * c
                                      + [("gclose", None)])
                variants = [pre + c for pre in variants for c in counts]
                if len(variants) > MAX_VARIANTS:
                    raise ValueError(
                        f"group repetitions expand to {len(variants)} "
                        f"variants (cap {MAX_VARIANTS})")
                i = j + 2
                continue
        for v in variants:
            v.append(items[i])
        i += 1
    # a zero-count variant of a lone repeated group is the empty
    # sequence — drop it (it matches nothing span-shaped) unless it is
    # the only variant, which should fail as an empty query downstream
    non_empty = [v for v in variants if v]
    return non_empty if non_empty else variants[:1]


def _build_seq_variants(items: list) -> list[SeqPlan]:
    """One tokenized branch → SeqPlans, one per combination of
    repetition-range counts (SpanQueryRepetition lowering: `x{2,3}` is
    the union of `x x` and `x x x`)."""
    # pass 1: attach repetitions to positions / any-tokens
    structs: list[tuple] = []   # ("pos", patterns, negate, (lo,hi),
    #                               cap, sens, copen, cclose)
    #                           | ("any", (lo,hi))
    pending_cap: str | None = None
    open_group: str | None = None      # capture name of an open group
    group_cap: str | None = None       # pending label for next gopen
    i = 0
    while i < len(items):
        kind, val = items[i]
        if kind == "cap":
            if pending_cap is not None:
                raise ValueError("dangling capture label")
            pending_cap = str(val)
            i += 1
            continue
        if kind == "gopen":
            if open_group is not None or group_cap is not None:
                raise ValueError("nested groups are out of subset")
            group_cap = pending_cap      # may be None (plain grouping)
            pending_cap = None
            open_group = "PENDING"
            i += 1
            continue
        if kind == "gclose":
            if open_group is None:
                raise ValueError("unbalanced group close")
            # mark the LAST emitted position as the capture close
            if group_cap is not None:
                for bi in range(len(structs) - 1, -1, -1):
                    if structs[bi][0] == "pos":
                        s = structs[bi]
                        structs[bi] = s[:7] + (group_cap,)
                        break
                else:
                    raise ValueError("captured group has no positions")
            open_group = None
            group_cap_done = group_cap
            group_cap = None
            i += 1
            continue
        if kind == "ubgroup":
            body_items, m_min, ub_cap = val
            bplans = _build_seq_variants(list(body_items))
            if len(bplans) != 1:
                raise ValueError(
                    "bounded repetition inside an unbounded group "
                    "is out of subset")
            bp = bplans[0]
            if bp.lead is not None or bp.trail is not None:
                raise ValueError(
                    "any-token at repeated-group edges is out of "
                    "subset")
            if any(p.unbounded for p in bp.positions):
                raise ValueError(
                    "nested unbounded repetition is out of subset")
            if pending_cap is not None or open_group is not None:
                raise ValueError(
                    "captured groups cannot repeat (out of subset)")
            structs.append(("ubody", tuple(bp.positions),
                            tuple(bp.gaps), m_min, ub_cap))
            i += 1
            continue
        if kind in ("term", "nterm", "alt"):
            annot = None
            if kind in ("term", "nterm") and isinstance(val, tuple):
                annot, val = val
            patterns = list(val) if kind == "alt" else [str(val)]
            rep = (1, 1)
            sens = "i"
            # inline sensitivity flags (TextPatternRegex.java:52-115):
            # a leading (?-i) / (?c) forces case-SENSITIVE matching
            # (the @s annotation, like %c), (?i) forces the
            # insensitive default; the flag is stripped from the
            # pattern before regex/literal detection
            flags = []
            stripped = []
            for p0 in patterns:
                if p0.startswith("(?-i)"):
                    flags.append(True)
                    p0 = p0[5:]
                elif p0.startswith("(?c)"):
                    flags.append(True)
                    p0 = p0[4:]
                else:
                    if p0.startswith("(?i)"):
                        p0 = p0[4:]
                    flags.append(False)
                stripped.append(p0)
            patterns = stripped
            if any(flags):
                if not all(flags):
                    # the reference binds the flag per regex clause;
                    # this position holds ONE sensitivity — refuse
                    # rather than silently forcing the unflagged
                    # branches sensitive
                    raise ValueError(
                        "mixed (?-i)/(?c) sensitivity flags across "
                        "alternation branches are out of subset "
                        "(split the alternation)")
                sens = "s"
            # %c and {n,m} may follow the position in either order
            while i + 1 < len(items) and items[i + 1][0] in ("rep",
                                                             "flag"):
                if items[i + 1][0] == "rep":
                    rep = items[i + 1][1]
                else:
                    sens = "s"
                i += 1
            if pending_cap is not None and rep != (1, 1):
                raise ValueError(
                    "captured positions cannot repeat (out of subset)")
            if annot is not None:
                if sens == "s":
                    raise ValueError(
                        "%c applies to the word annotation only")
                sens = annot
            copen = None
            if open_group == "PENDING" and group_cap is not None:
                copen = group_cap          # first position of the group
                open_group = "OPENED"
            elif open_group == "PENDING":
                open_group = "OPENED"
            if open_group is not None and rep != (1, 1):
                raise ValueError(
                    "repetition inside groups is out of subset")
            structs.append(("pos", patterns, kind == "nterm", rep,
                            pending_cap, sens, copen, None))
            pending_cap = None
        elif kind == "any":
            lo, hi = 1, 1
            if i + 1 < len(items) and items[i + 1][0] == "rep":
                lo, hi = items[i + 1][1]
                i += 1
            if pending_cap is not None:
                # A:[] — a CAPTURED any-token is a real position
                # (complement of the empty term set), not a gap, so
                # the capture machinery can bind it (the reference's
                # SpanQueryCaptureGroup over SpanQueryAnyToken)
                if (lo, hi) != (1, 1):
                    raise ValueError(
                        "captured any-token cannot repeat "
                        "(out of subset)")
                structs.append(("pos", [""], True, (1, 1),
                                pending_cap, "i", None, None))
                pending_cap = None
            else:
                structs.append(("any", (lo, hi)))
        elif kind in ("rep", "flag"):
            raise ValueError(f"{kind} without a preceding position")
        else:
            raise ValueError(f"unexpected {kind}")
        i += 1
    if pending_cap is not None:
        raise ValueError("dangling capture label")
    if open_group is not None:
        raise ValueError("unclosed group")
    # pass 2: cross product over variable repetition counts. Bounded
    # ranges enumerate counts as before; UNBOUNDED ranges contribute a
    # single run-element option (plus an absent option when lo == 0) —
    # exact SpansRepetition semantics, no cap on match length.
    pos_options: list[list] = []
    for s in structs:
        if s[0] != "pos":
            continue
        lo, hi = s[3]
        if hi is None:
            opts: list = [0] if lo == 0 else []
            opts.append(("U", max(lo, 1)))
            pos_options.append(opts)
        else:
            pos_options.append(list(range(lo, hi + 1)))
    n_variants = 1
    for r in pos_options:
        n_variants *= len(r)
    if n_variants > MAX_VARIANTS:
        raise ValueError(
            f"repetition ranges expand to {n_variants} variants "
            f"(cap {MAX_VARIANTS})")
    plans: list[SeqPlan] = []
    for combo in itertools.product(*pos_options):
        positions: list[SeqPos] = []
        gaps: list[tuple[int, int | None]] = []
        pending: tuple[int, int | None] | None = None
        lead: tuple[int, int | None] | None = None

        def _emit(pos: SeqPos):
            nonlocal pending, lead
            if not positions and pending is not None:
                # any-tokens before the first position become a
                # LEADING expansion (SpanQueryExpansion.java:36 /
                # SpansExpansionRaw left-stretch semantics)
                lead = pending
                pending = None
            if positions:
                gaps.append(pending or (0, 0))
            pending = None
            positions.append(pos)

        ci = 0
        for s in structs:
            if s[0] == "any":
                lo, hi = s[1]
                g = pending or (0, 0)
                ghi = None if (hi is None or g[1] is None) \
                    else g[1] + hi
                pending = (g[0] + lo, ghi)
                continue
            if s[0] == "ubody":
                _, bpositions, bgaps, m_min, ub_cap = s
                _emit(SeqPos(
                    pattern=bpositions[0].pattern, literal=True,
                    rep_min=m_min, unbounded=True,
                    body=(bpositions, bgaps),
                    # group:(...)+ — capture the WHOLE run span
                    cap_open=ub_cap, cap_close=ub_cap))
                continue
            _, patterns, negate, _, cap, sens, copen, cclose = s
            count = combo[ci]
            ci += 1
            if isinstance(count, tuple):      # ("U", m): unbounded run
                _emit(SeqPos(
                    pattern=patterns[0],
                    literal=not _is_regex(patterns[0]),
                    negate=negate,
                    alts=tuple(patterns[1:]),
                    sensitivity=sens,
                    rep_min=count[1],
                    unbounded=True))
                continue
            for _ in range(count):
                _emit(SeqPos(
                    pattern=patterns[0],
                    literal=not _is_regex(patterns[0]),
                    negate=negate,
                    alts=tuple(patterns[1:]),
                    capture=cap,
                    sensitivity=sens,
                    cap_open=copen,
                    cap_close=cclose))
        if not positions:
            if pending is not None and (pending[0] > 0
                                        or pending[1] is None
                                        or pending[1] > 0):
                raise ValueError(
                    "pure any-token queries are out of subset (no "
                    "anchor; use filter_ngrams for n-gram generation)")
            # all-optional variant where every position chose zero
            # repetitions ('a'? 'b'? → the empty combo): the empty
            # sequence matches nothing in the reference either
            # (TestSearches.testOptional3 returns only non-empty
            # matches) — skip the variant, keep the others
            continue
        plans.append(SeqPlan(positions=positions, gaps=gaps,
                             lead=lead, trail=pending))
    if not plans:
        raise ValueError("empty query (all-zero repetitions)")
    return plans


# ---------------------------------------------------------------------------
# execution
# ---------------------------------------------------------------------------

class TooBroad(ValueError):
    """A pattern matches too much of the term dictionary to expand."""


def _expand_position(reader, p: SeqPos, max_terms: int = 1024) -> list[str]:
    from blacklab_ray.query.engine import expand_terms
    out: set[str] = set()
    # one batched dictionary probe for ALL literal alternatives (the
    # rewritten OR-of-terms clause arrives here as one position with
    # many literals; per-literal probes would re-scan the dictionary)
    literals = [pat for pat in (p.pattern, *p.alts) if not _is_regex(pat)]
    if literals:
        if p.sensitivity == "i":
            # insensitive literals probe the desensitized dictionary
            # with a desensitized key ('May' → 'may',
            # TextPattern.optInsensitive)
            from blacklab_ray.analysis.analyzers import normalize_text
            literals = [normalize_text(t) for t in literals]
        out.update(reader.term_stats(literals, p.sensitivity))
    for pat in (p.pattern, *p.alts):
        if not _is_regex(pat):
            continue
        else:
            matched = expand_terms(reader, pat, "regex", max_terms,
                                   sensitivity=p.sensitivity)
            if len(matched) >= max_terms:
                # silent truncation would return wrong (incomplete)
                # spans; anchored sequences fall back to forward-index
                # verification instead (the reference's NFA resolution,
                # ClauseCombinerNfa.java:38 / SpanQueryFiSeq.java:24)
                raise TooBroad(
                    f"pattern {pat!r} expands to >= {max_terms} "
                    "dictionary terms; narrow it")
            out.update(matched)
    return sorted(out)


def _seq_args(reader, plan: SeqPlan):
    term_sets = [_expand_position(reader, p) for p in plan.positions]
    negates = [p.negate for p in plan.positions]
    return term_sets, negates


_PURE_ANY_RE = re.compile(
    r"^\s*(?:\[\s*\]\s*(?:\{\d+(?:,\d+)?\}|[+*?])?\s*)+$")
_ANY_UNIT_RE = re.compile(r"\[\s*\]\s*(\{(\d+)(?:,(\d+))?\}|[+*?])?")


def _pure_any_widths(q: str) -> "tuple[int, int] | None":
    """(min_width, max_width) when the query is ONLY any-token units
    (``[] []{2,3} …`` — BLS SpanQueryAnyToken with no anchor), else
    None. Unbounded forms raise: every-window-of-every-width is not a
    meaningful result set."""
    if not _PURE_ANY_RE.match(q):
        return None
    lo = hi = 0
    for m in _ANY_UNIT_RE.finditer(q):
        quant = m.group(1)
        if quant in ("+", "*"):
            raise ValueError("unbounded pure any-token query")
        if quant == "?":
            a, b = 0, 1
        elif quant:
            a = int(m.group(2))
            b = int(m.group(3)) if m.group(3) else a
        else:
            a = b = 1
        lo, hi = lo + a, hi + b
    if hi == 0:
        raise ValueError("empty query (all-zero repetitions)")
    return lo, hi


def _all_window_spans(reader, lo: int, hi: int) -> pa.Table:
    """Every [i, i+w) window, w in [lo, hi], of every live doc — the
    anchorless any-token result (result is corpus-sized by nature;
    doc ids/lengths stream in chunks, the reference enumerates the
    same set per leaf-reader)."""
    from blacklab_ray.query.spans import active_span_budget
    lo = max(lo, 1)
    budget = active_span_budget()
    chunk_docs = 256 if budget is not None else (1 << 20)
    produced = 0
    ds_, ss_ = [], []
    ws_ = []
    for chunk in reader.iter_doc_id_chunks(chunk_docs):
        chunk = np.asarray(chunk, dtype=np.int64)
        lens = reader.doc_lens(chunk)
        for w in range(lo, hi + 1):
            n = np.maximum(lens - w + 1, 0)
            tot = int(n.sum())
            if not tot:
                continue
            csum = np.cumsum(n)
            s = np.arange(tot, dtype=np.int64) \
                - np.repeat(csum - n, n)
            ds_.append(np.repeat(chunk, n))
            ss_.append(s)
            ws_.append(np.full(tot, w, dtype=np.int64))
            produced += tot
        # stoppedRetrieving: the anchorless window set is corpus-sized
        # by definition — stop enumerating once past the budget
        if budget is not None and produced >= budget.limit:
            budget.stopped = True
            break
    if not ds_:
        e = np.empty(0, np.int64)
        return pa.table({"doc_id": pa.array(e), "start": pa.array(e),
                         "end": pa.array(e)})
    d = np.concatenate(ds_)
    s = np.concatenate(ss_)
    e = s + np.concatenate(ws_)
    order = np.lexsort((e, s, d))
    return pa.table({"doc_id": pa.array(d[order]),
                     "start": pa.array(s[order]),
                     "end": pa.array(e[order])})


_BRACKET_EXPR_RE = re.compile(
    r'\[(?P<body>(?:[^\]"]|"(?:[^"\\]|\\.)*")*)\](?P<flag>%c)?')


def _iter_bracket_exprs(q: str):
    """Yield `_BRACKET_EXPR_RE` matches for brackets OUTSIDE quoted
    strings only — a `[` inside a quoted regex term (`"x[a|b]y"`) is
    a character class, not a token expression (the raw-regex
    ``finditer`` misparsed those as boolean bodies). Input is already
    double-quote-normalized; quoted strings have no escapes."""
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c == '"':
            j = _scan_quoted(q, i, '"')
            i = n if j < 0 else j + 1
        elif c == '[':
            m = _BRACKET_EXPR_RE.match(q, i)
            if m is None:
                i += 1
            else:
                yield m
                i = m.end()
        else:
            i += 1
_BOOL_TEST_RE = re.compile(
    r'(\w+(?:/\w+)?)\s*(!?)=\s*"((?:[^"\\]|\\.)*)"')
_DNF_CAP = 64


def _bool_body_tokens(s: str) -> list:
    """Tokenize a bracket body's boolean expression: tests
    (annot (!)= "val") plus & | ! ( )."""
    toks: list = []
    i = 0
    while i < len(s):
        c = s[i]
        if c.isspace():
            i += 1
            continue
        if c in "()|&!":
            toks.append((c, None))
            i += 1
            continue
        m = _BOOL_TEST_RE.match(s, i)
        if not m:
            raise ValueError(f"bad token test at {s[i:]!r}")
        toks.append(("test",
                     (m.group(1).replace("/", "_"),
                      bool(m.group(2)), m.group(3))))
        i = m.end()
    if not toks:
        raise ValueError("empty token expression")
    return toks


def _dnf_body(body: str) -> list:
    """Parse a boolean token-constraint body and normalize to DNF:
    a list of conjunctions, each a list of (annot, negated, value)
    tests. Blow-up is capped at _DNF_CAP conjunctions."""
    toks = _bool_body_tokens(body)
    pos = 0

    def peek():
        return toks[pos][0] if pos < len(toks) else None

    def _cross(a: list, b: list) -> list:
        out = [c1 + c2 for c1 in a for c2 in b]
        if len(out) > _DNF_CAP:
            raise ValueError("token expression too complex")
        return out

    def expr() -> list:
        nonlocal pos
        parts = [andexpr()]
        while peek() == "|":
            pos += 1
            parts.append(andexpr())
        return [c for p in parts for c in p]

    def andexpr() -> list:
        nonlocal pos
        cur = unary()
        while peek() == "&":
            pos += 1
            cur = _cross(cur, unary())
        return cur

    def unary() -> list:
        nonlocal pos
        if peek() == "!":
            pos += 1
            return negate(unary())
        if peek() == "(":
            pos += 1
            e = expr()
            if peek() != ")":
                raise ValueError("unbalanced parens in token "
                                 "expression")
            pos += 1
            return e
        if peek() == "test":
            t = toks[pos][1]
            pos += 1
            return [[t]]
        raise ValueError("bad token expression")

    def negate(dnf: list) -> list:
        # De Morgan: !(c1 | c2 ...) = !c1 & !c2 ...; a negated
        # conjunction is the union of its negated tests
        cur: list = [[]]
        for conj in dnf:
            cur = _cross(cur, [[(a, not n, v)] for a, n, v in conj])
        return cur

    out = expr()
    if pos != len(toks):
        raise ValueError("trailing tokens in token expression")
    return out


def _lower_boolexpr_variants(q: str) -> list[str]:
    """Lower boolean token-constraint bodies — ``[a="x" | b="y"]``,
    parens, ``!(...)`` (CorpusQL boolean token expressions,
    TextPatternOr/And/Not inside one position; the reference's
    corpusql.jj complexQuery/simpleQuery production) — by DNF-ing
    each body and CROSS-PRODUCING the conjunct choices into full
    query-string variants, each inside the pure-conjunction subset
    (_lower_multitest handles those). The caller unions + dedups the
    per-variant span tables (TextPatternOr semantics). A ``%c`` flag
    distributes onto each alternative. Queries without boolean
    brackets return ``[q]`` unchanged."""
    res: list[list[str]] = [[]]
    pos = 0
    for m in _iter_bracket_exprs(q):
        body = m.group("body")
        pre = q[pos:m.start()]
        pos = m.end()
        # only boolean structure beyond pure conjunction triggers: a
        # disjunction, parens, or a negation that is not '!='
        if not re.search(r'\||\(|!(?!=)', body):
            for r in res:
                r.append(pre + m.group(0))
            continue
        conjs = _dnf_body(body)
        flag = m.group("flag") or ""
        alts = ["[" + " & ".join(
            f'{a}{"!" if n else ""}="{v}"' for a, n, v in c)
            + "]" + flag for c in conjs]
        if len(res) * len(alts) > _DNF_CAP:
            raise ValueError("token expressions expand to too many "
                             f"query variants (cap {_DNF_CAP})")
        res = [r + [pre + a] for r in res for a in alts]
    tail = q[pos:]
    return ["".join(r) + tail for r in res]


_MULTITEST_RE = re.compile(
    r"(?:(?P<cap>\w+)\s*:\s*)?"
    r"\[(?P<body>\s*\w+(?:/\w+)?\s*!?=\s*\"(?:[^\"\\\\]|\\\\.)*\""
    r"(?:\s*&\s*\w+(?:/\w+)?\s*!?=\s*\"(?:[^\"\\\\]|\\\\.)*\")+)\s*\]")
_ONE_TEST_RE = re.compile(
    r"(\w+(?:/\w+)?)\s*(!?)=\s*\"((?:[^\"\\\\]|\\\\.)*)\"")


def _lower_multitest(q: str) -> "tuple[str, list[CCmp], list[str]]":
    """Lower intra-position conjunctions — ``[lemma="be" &
    word="are"]`` (TextPatternAndNot over token-level clauses) — onto
    the capture + global-constraint machinery: the FIRST test stays as
    the position's pattern (it drives posting selection), the rest
    become ``::``-style comparisons on a capture of that position
    (hidden ``_xK`` unless the user already captured it). Returns the
    rewritten query, the extra constraint nodes, and the hidden
    capture names to drop from the result."""
    extra: list[CCmp] = []
    hidden: list[str] = []
    k = 0

    def repl(m: "re.Match") -> str:
        nonlocal k
        tests = _ONE_TEST_RE.findall(m.group("body"))
        cap = m.group("cap")
        if cap is None:
            cap = f"_x{k}"
            k += 1
            hidden.append(cap)
        tests = [(a.replace("/", "_"), n, v) for a, n, v in tests]
        for attr, neg, val in tests[1:]:
            extra.append(CCmp(left=("cap", cap, attr),
                              op="!=" if neg else "=",
                              right=("lit", val), regex=True))
        a0, n0, v0 = tests[0]
        return f'{cap}:[{a0}{"!" if n0 else ""}="{v0}"]'

    return _MULTITEST_RE.sub(repl, q), extra, hidden


def _tag_plan_spans(reader, tp: TagPlan) -> pa.Table:
    """Resolve a structural TagPlan to its span table — derived block
    spans for <p>/<s> when the corpus stores them, else standoff tag
    spans (config-driven XML input), attribute filters applied."""
    if tp.name == "p" and not tp.attrs:
        try:
            return reader.paragraph_spans()
        except (FileNotFoundError, KeyError, pa.lib.ArrowInvalid):
            return reader.tag_spans("p")
    if tp.name == "s" and not tp.attrs:
        try:
            return reader.sentence_spans()
        except (FileNotFoundError, KeyError, pa.lib.ArrowInvalid):
            return reader.tag_spans("s")
    return reader.tag_spans(tp.name, tp.attrs or None)


def _apply_edge_anchors(reader, out: pa.Table,
                        open_anchor: "tuple | None",
                        close_anchor: "tuple | None") -> pa.Table:
    """Filter spans to those starting at a tag start (`<s>` left
    edge) / ending at a tag end (`</s>` right edge) — SpansEdge
    sequenced with the rest, expressed as a vectorized membership
    filter."""
    for spec, col in ((open_anchor, "start"), (close_anchor, "end")):
        if spec is None or out.num_rows == 0:
            continue
        name, attrs = spec
        tags = _tag_plan_spans(reader,
                               TagPlan(name=str(name), attrs=attrs))
        k_tags = np.rec.fromarrays([tags["doc_id"].to_numpy(),
                                    tags[col].to_numpy()],
                                   names=["d", "p"])
        k_out = np.rec.fromarrays([out["doc_id"].to_numpy(),
                                   out[col].to_numpy()],
                                  names=["d", "p"])
        out = out.filter(pa.array(np.isin(k_out, k_tags)))
    return out


def cql_spans(reader, q: str) -> pa.Table:
    """Evaluate a CQL query to a span table (doc_id, start, end[,
    {cap}_pos per capture group]); `:: A.word = B.word` global
    constraints post-filter via forward-index lookups."""
    from blacklab_ray.query.spans import spans_containing, spans_within
    from blacklab_ray.query.rewrite import rewrite
    q = _lower_query_functions(_normalize_quotes(q))
    widths = _pure_any_widths(q)
    if widths is not None:
        return _all_window_spans(reader, *widths)
    bool_variants = _lower_boolexpr_variants(q)
    if len(bool_variants) > 1:
        # boolean token expressions: evaluate each DNF-conjunct
        # choice as its own query, union + dedup the span tables
        # (TextPatternOr over one position)
        return _union_span_tables(
            [cql_spans(reader, v) for v in bool_variants])
    q = bool_variants[0]
    constraints: CNode | None = None
    if "::" in q:
        q, _, cexpr = q.partition("::")
        constraints = parse_constraints(cexpr)
    q, extra_cmp, hidden_caps = _lower_multitest(q)
    if extra_cmp:
        parts: list = list(extra_cmp)
        if constraints is not None:
            parts.append(constraints)
        constraints = parts[0] if len(parts) == 1 else CAnd(parts=parts)
    plan = rewrite(parse_cql(q))
    anchors = (None, None)
    if isinstance(plan, AnchorPlan):
        anchors = (plan.open, plan.close)
        plan = plan.inner
    if isinstance(plan, FilterPlan):
        out = _filter_plan_spans(reader, plan)
    else:
        out = _plan_spans(reader, plan)
    out = _apply_edge_anchors(reader, out, *anchors)
    out = _apply_constraints(reader, out, constraints)
    if hidden_caps:
        drop = [c for c in out.column_names
                if any(c == f"{h}_pos" for h in hidden_caps)]
        if drop:
            out = out.drop_columns(drop)
    return out


def cql_spans_budgeted(reader, q: str,
                       max_spans: int) -> tuple[pa.Table, bool]:
    """``cql_spans`` under a result budget — the engine-side
    maxHitsToProcess (SearchSettings.java / MaxStats): output-bound
    shapes (all-negative complements, anchorless windows, unbounded
    gaps — inherently O(L²) result sets) stop ENUMERATING once
    ``max_spans`` rows exist instead of materializing tens of
    millions of spans and timing out. Returns ``(spans, stopped)``;
    ``stopped=True`` means retrieval was cut short
    (stoppedRetrievingHits semantics — the table holds the first
    ``max_spans`` spans the plan produced, and the true total is
    unknown)."""
    from blacklab_ray.query.spans import _SPAN_BUDGET, SpanBudget
    b = SpanBudget(max_spans)
    tok = _SPAN_BUDGET.set(b)
    try:
        out = cql_spans(reader, q)
    finally:
        _SPAN_BUDGET.reset(tok)
    stopped = b.stopped or out.num_rows > max_spans
    if out.num_rows > max_spans:
        out = out.slice(0, max_spans)
    return out, stopped


def _apply_constraints(reader, spans: pa.Table,
                       constraints: CNode | None) -> pa.Table:
    if constraints is None:
        return spans
    # validate capture references even for empty results (a group
    # capture has {name}_start/_end, not a single token — constraints
    # need single-position captures)
    for name in sorted(_constraint_captures(constraints)):
        if f"{name}_pos" not in spans.column_names:
            hint = (" (group captures span multiple tokens; "
                    "constraints need single-position captures)"
                    if f"{name}_start" in spans.column_names else "")
            raise ValueError(
                f"constraint references unknown capture "
                f"{name!r}{hint}")
    if spans.num_rows == 0:
        return spans
    d = spans["doc_id"].to_numpy()
    keep = _eval_constraint(reader, constraints, spans, d)
    return spans.filter(pa.array(keep))


def _union_span_tables(parts: list) -> pa.Table:
    """Union span tables from alternative branches: align capture
    columns (absent captures = -1 sentinel — no captured position in
    that branch, BLS leaves the group empty there too), concat,
    (doc,start,end)-dedup + sort."""
    from blacklab_ray.query.spans import unique_spans
    all_cols = list(dict.fromkeys(
        c for t in parts for c in t.column_names))
    if any(t.column_names != all_cols for t in parts):
        parts = [
            t if t.column_names == all_cols else pa.table({
                c: (t[c] if c in t.column_names
                    else pa.array(
                        np.full(t.num_rows, -1, dtype=np.int64)))
                for c in all_cols})
            for t in parts]
    return unique_spans(pa.concat_tables(parts))


def _intersect_span_tables(tabs: list) -> pa.Table:
    """Exact (doc, start, end) intersection across clause span tables
    (SpansAnd: same doc+start+end in every clause). The first table's
    capture columns are kept."""
    base = tabs[0]
    if any(t.num_rows == 0 for t in tabs):
        return base.slice(0, 0)

    def key(t):
        return np.rec.fromarrays([t["doc_id"].to_numpy(),
                                  t["start"].to_numpy(),
                                  t["end"].to_numpy()],
                                 names=["d", "s", "e"])
    k0 = key(base)
    keep = np.ones(len(k0), dtype=bool)
    for t in tabs[1:]:
        keep &= np.isin(k0, key(t))
    return base.filter(pa.array(keep))


def _filter_plan_spans(reader, plan: FilterPlan) -> pa.Table:
    """Execute a within/containing position filter (works nested —
    `("a" within <s/>) | "b"` — as well as at the top level)."""
    from blacklab_ray.query.spans import (filter_ngrams,
                                          spans_containing,
                                          spans_within)
    if isinstance(plan.filter, TagPlan):
        filt = _tag_plan_spans(reader, plan.filter)
    else:
        filt = _plan_spans(reader, plan.filter)
    if isinstance(plan.producer, NGramPlan):
        # grams enumerated around the filter spans, never the corpus
        return filter_ngrams(reader, filt, plan.op,
                             plan.producer.lo, plan.producer.hi)
    prod = (_tag_plan_spans(reader, plan.producer)
            if isinstance(plan.producer, TagPlan)
            else _plan_spans(reader, plan.producer))
    return spans_within(prod, filt) if plan.op == "within" \
        else spans_containing(prod, filt)


def _expand_plan_spans(reader, plan: ExpandPlan) -> pa.Table:
    """Stretch the inner subquery's spans by the surrounding
    any-token units (SpansExpansionRaw), clamped to doc bounds;
    captured width-1 units land as {name}_pos columns. The
    capture-free case delegates to ``_expand_edges`` (the shared
    lead/trail stretch kernel); only captured units need the
    per-unit combo enumeration below."""
    import itertools as _it
    inner = _plan_spans(reader, plan.inner)
    if not any(cap for _lo, _hi, cap in (*plan.pre, *plan.post)):
        def _total(units):
            if not units:
                return None
            return (sum(u[0] for u in units),
                    sum(u[1] for u in units))
        return _expand_edges(reader, inner, _total(plan.pre),
                             _total(plan.post))
    if inner.num_rows == 0:
        cols = dict(zip(inner.column_names, inner.columns))
        for _lo, _hi, cap in (*plan.pre, *plan.post):
            if cap:
                cols[f"{cap}_pos"] = pa.array([], pa.int64())
        return pa.table(cols)
    d = inner["doc_id"].to_numpy()
    s = inner["start"].to_numpy()
    e = inner["end"].to_numpy()
    uniq = np.unique(d)
    lens = dict(zip(uniq.tolist(), reader.doc_lens(uniq).tolist()))
    dl = np.array([lens[int(x)] for x in d], dtype=np.int64)
    extra_cols = [c for c in inner.column_names
                  if c not in ("doc_id", "start", "end")]
    pre_opts = [range(lo, hi + 1) for lo, hi, _c in plan.pre]
    post_opts = [range(lo, hi + 1) for lo, hi, _c in plan.post]
    parts: list[pa.Table] = []
    for pw in _it.product(*pre_opts):
        for qw in _it.product(*post_opts):
            W, V = sum(pw), sum(qw)
            ns, ne = s - W, e + V
            keep = (ns >= 0) & (ne <= dl)
            if not keep.any():
                continue
            cols = {"doc_id": pa.array(d[keep]),
                    "start": pa.array(ns[keep]),
                    "end": pa.array(ne[keep])}
            for c in extra_cols:
                cols[c] = inner[c].filter(pa.array(keep))
            # capture offsets: pre unit j sits at start - sum(w_j..)
            off = 0
            for (_, _, cap), w in zip(reversed(plan.pre),
                                      reversed(pw)):
                off += w
                if cap:
                    cols[f"{cap}_pos"] = pa.array(ns[keep] + (W - off))
            off = 0
            for (_, _, cap), w in zip(plan.post, qw):
                if cap:   # width-1 unit at old_end + off
                    cols[f"{cap}_pos"] = pa.array(ne[keep] - V + off)
                off += w
            parts.append(pa.table(cols))
    if not parts:
        cols = dict(zip(inner.slice(0, 0).column_names,
                        inner.slice(0, 0).columns))
        for _lo, _hi, cap in (*plan.pre, *plan.post):
            if cap:
                cols[f"{cap}_pos"] = pa.array([], pa.int64())
        return pa.table(cols)
    out = pa.concat_tables(parts)
    # dedup on ALL columns (distinct capture placements are distinct
    # matches), stable (doc,start,end) order
    df = out.to_pandas().drop_duplicates()
    df = df.sort_values(["doc_id", "start", "end"]).reset_index(
        drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def _plan_spans(reader, plan: "SeqPlan | UnionPlan | AndPlan") \
        -> pa.Table:
    if isinstance(plan, TagPlan):
        return _tag_plan_spans(reader, plan)
    if isinstance(plan, ExpandPlan):
        return _expand_plan_spans(reader, plan)
    if isinstance(plan, NGramPlan):
        raise ValueError(
            "pure any-token n-gram plans only execute as position-"
            "filter producers")
    if isinstance(plan, SeqPlan):
        return cql_spans_seq(reader, plan)
    if isinstance(plan, FilterPlan):
        return _filter_plan_spans(reader, plan)
    if isinstance(plan, AnchorPlan):
        return _apply_edge_anchors(
            reader, _plan_spans(reader, plan.inner),
            plan.open, plan.close)
    if isinstance(plan, AndPlan):
        return _intersect_span_tables(
            [_plan_spans(reader, p) for p in plan.parts])
    return _union_span_tables(
        [(cql_spans_seq(reader, b) if isinstance(b, SeqPlan)
          else _plan_spans(reader, b)) for b in plan.branches])


def _has_unbounded(plan: SeqPlan) -> bool:
    return (any(p.unbounded for p in plan.positions)
            or any(g[1] is None for g in plan.gaps)
            or (plan.lead is not None and plan.lead[1] is None)
            or (plan.trail is not None and plan.trail[1] is None))


def _rep_spans(reader, p: SeqPos,
               end_anchors: "tuple | None" = None,
               start_anchors: "tuple | None" = None) -> pa.Table:
    """EXACT unbounded repetition (SpansRepetition semantics,
    SpanQueryRepetition.java:25): spans of ``rep_min..∞`` consecutive
    matches of the unit.

    Single-token units enumerate their maximal runs directly in one
    vectorized pass (the generic fixed-point ``concat_spans`` chain
    below is kept for multi-token bodies). ``end_anchors`` /
    ``start_anchors`` — (doc_ids, positions) of the abutting
    neighbor element in the sequence — restrict enumeration to spans
    the downstream (0,0)-gap join could keep anyway: without them a
    near-universal unit (``[word != "x"]+``) materializes O(run²)
    subspans."""
    from blacklab_ray.query.spans import (SPAN_SCHEMA, concat_spans,
                                          unique_spans)
    if p.body is not None:
        bpos, bgaps = p.body
        base = cql_spans_seq(reader, SeqPlan(
            positions=list(bpos), gaps=list(bgaps),
            lead=None, trail=None))
    else:
        single = SeqPos(pattern=p.pattern, literal=p.literal,
                        negate=p.negate, alts=p.alts,
                        sensitivity=p.sensitivity)
        base = cql_spans_seq(reader, SeqPlan(positions=[single],
                                             gaps=[]))
    if base.num_rows == 0:
        return SPAN_SCHEMA.empty_table()
    base = base.select(["doc_id", "start", "end"])
    if p.body is None:
        d = base["doc_id"].to_numpy(zero_copy_only=False)
        s = base["start"].to_numpy(zero_copy_only=False)
        order = np.lexsort((s, d))
        d, s = d[order], s[order]
        new_run = np.ones(d.size, dtype=bool)
        new_run[1:] = (d[1:] != d[:-1]) | (s[1:] != s[:-1] + 1)
        run_start_i = np.flatnonzero(new_run)
        L = np.diff(np.append(run_start_i, d.size))
        rs = s[run_start_i]
        rd = d[run_start_i]
        lo = max(1, p.rep_min)
        anchors = end_anchors or start_anchors
        if anchors is not None:
            ad = np.asarray(anchors[0], dtype=np.int64)
            ap = np.asarray(anchors[1], dtype=np.int64)
            aorder = np.lexsort((ap, ad))
            ad, ap = ad[aorder], ap[aorder]
            alld = np.unique(np.concatenate([rd, ad]))
            rdi = np.searchsorted(alld, rd).astype(np.int64)
            adi = np.searchsorted(alld, ad).astype(np.int64)
            akey = (adi << np.int64(32)) | ap
            if end_anchors is not None:
                # anchor = candidate span END: e in [rs+lo, rs+L]
                lo_k = (rdi << np.int64(32)) | (rs + lo)
                hi_k = (rdi << np.int64(32)) | (rs + L)
            else:
                # anchor = candidate span START: s in [rs, rs+L-lo]
                lo_k = (rdi << np.int64(32)) | rs
                hi_k = (rdi << np.int64(32)) | (rs + L - lo)
            i0 = np.searchsorted(akey, lo_k, side="left")
            i1 = np.searchsorted(akey, hi_k, side="right")
            cnt = np.maximum(i1 - i0, 0)
            tot = int(cnt.sum())
            if tot == 0:
                return SPAN_SCHEMA.empty_table()
            rr = np.repeat(np.arange(cnt.size), cnt)
            cum = np.zeros(cnt.size + 1, dtype=np.int64)
            np.cumsum(cnt, out=cum[1:])
            a_idx = i0[rr] + np.arange(tot) - cum[rr]
            a_pos = ap[a_idx]
            if end_anchors is not None:
                # per anchored end e: s in [rs, e-lo]
                n_s = a_pos - lo - rs[rr] + 1
                rr2 = np.repeat(np.arange(tot), n_s)
                cum2 = np.zeros(tot + 1, dtype=np.int64)
                np.cumsum(n_s, out=cum2[1:])
                start = rs[rr][rr2] + (np.arange(int(cum2[-1]))
                                       - cum2[rr2])
                end = np.repeat(a_pos, n_s)
            else:
                # per anchored start st: e in [st+lo, rs+L]
                n_e = (rs[rr] + L[rr]) - (a_pos + lo) + 1
                rr2 = np.repeat(np.arange(tot), n_e)
                cum2 = np.zeros(tot + 1, dtype=np.int64)
                np.cumsum(n_e, out=cum2[1:])
                start = np.repeat(a_pos, n_e)
                end = (a_pos[rr2] + lo
                       + (np.arange(int(cum2[-1])) - cum2[rr2]))
            out = pa.table({
                "doc_id": pa.array(rd[rr][rr2], pa.int64()),
                "start": pa.array(start, pa.int64()),
                "end": pa.array(end, pa.int64()),
            })
            return unique_spans(out)
        # anchorless: emit per (run, start asc, end asc) — exactly
        # (doc, start, end) sorted and unique, no sort pass needed
        n_starts = np.maximum(L - lo + 1, 0)
        tot = int(n_starts.sum())
        if tot == 0:
            return SPAN_SCHEMA.empty_table()
        pr = np.repeat(np.arange(n_starts.size), n_starts)
        cum = np.zeros(n_starts.size + 1, dtype=np.int64)
        np.cumsum(n_starts, out=cum[1:])
        j = np.arange(tot) - cum[pr]
        start1 = rs[pr] + j
        n_ends = L[pr] - lo + 1 - j
        sp = np.repeat(np.arange(tot), n_ends)
        cum2 = np.zeros(tot + 1, dtype=np.int64)
        np.cumsum(n_ends, out=cum2[1:])
        start = start1[sp]
        end = start + lo + (np.arange(int(cum2[-1])) - cum2[sp])
        return pa.table({
            "doc_id": pa.array(rd[pr][sp], pa.int64()),
            "start": pa.array(start, pa.int64()),
            "end": pa.array(end, pa.int64()),
        })
    levels: list[pa.Table] = []
    cur = base
    c = 1
    while cur.num_rows:
        if c >= p.rep_min:
            levels.append(cur)
        cur = concat_spans(cur, base, gap=(0, 0))
        c += 1
    if not levels:
        return SPAN_SCHEMA.empty_table()
    return unique_spans(pa.concat_tables(levels))


def _cql_spans_seq_unbounded(reader, plan: SeqPlan) -> pa.Table:
    """Evaluate a SeqPlan containing unbounded repetitions and/or
    unbounded any-token gaps: split into maximal BOUNDED segments
    (evaluated by the existing vectorized positional join, captures
    and all) interleaved with run elements, then compose the span
    tables left-to-right with ``concat_spans``."""
    from blacklab_ray.query.spans import concat_spans, unique_spans
    elems: list[tuple[str, object]] = []
    conns: list[tuple[int, int | None]] = []
    cur: list[int] = []
    cur_gaps: list[tuple[int, int]] = []
    seg_gap_before: tuple[int, int | None] = (0, 0)

    def add_elem(kind, payload, gap_before):
        if elems:
            conns.append(gap_before)
        elems.append((kind, payload))

    for i, p in enumerate(plan.positions):
        g = (0, 0) if i == 0 else plan.gaps[i - 1]
        if p.unbounded:
            if cur:
                add_elem("seg", (cur, cur_gaps), seg_gap_before)
                cur, cur_gaps = [], []
            add_elem("rep", i, g)
        elif cur and g[1] is not None:
            cur_gaps.append(g)
            cur.append(i)
        else:
            if cur:                      # split on an unbounded gap
                add_elem("seg", (cur, cur_gaps), seg_gap_before)
                cur, cur_gaps = [], []
            seg_gap_before = g
            cur.append(i)
    if cur:
        add_elem("seg", (cur, cur_gaps), seg_gap_before)

    # bounded segments first: their span positions anchor the rep
    # elements that abut them with a (0,0) gap, collapsing the rep's
    # O(run^2) enumeration to spans the join could keep anyway
    tables: list[pa.Table | None] = [None] * len(elems)
    for j, (kind, payload) in enumerate(elems):
        if kind == "seg":
            idxs, sgaps = payload
            sub = SeqPlan(positions=[plan.positions[i] for i in idxs],
                          gaps=list(sgaps), lead=None, trail=None)
            tables[j] = cql_spans_seq(reader, sub)
    for j, (kind, payload) in enumerate(elems):
        if kind != "rep":
            continue
        end_anchors = start_anchors = None
        if (j + 1 < len(elems) and elems[j + 1][0] == "seg"
                and conns[j] == (0, 0)
                and tables[j + 1] is not None):
            nxt = tables[j + 1]
            end_anchors = (
                nxt["doc_id"].to_numpy(zero_copy_only=False),
                nxt["start"].to_numpy(zero_copy_only=False))
        elif (j > 0 and elems[j - 1][0] == "seg"
                and conns[j - 1] == (0, 0)
                and tables[j - 1] is not None):
            prv = tables[j - 1]
            start_anchors = (
                prv["doc_id"].to_numpy(zero_copy_only=False),
                prv["end"].to_numpy(zero_copy_only=False))
        rp = plan.positions[payload]
        rt = _rep_spans(reader, rp, end_anchors=end_anchors,
                        start_anchors=start_anchors)
        if rp.cap_open:
            # group:(...)+ — the capture is the run's own span;
            # recorded before concatenation extends start/end
            rt = rt.append_column(f"{rp.cap_open}_start", rt["start"])
            rt = rt.append_column(f"{rp.cap_close}_end", rt["end"])
        tables[j] = rt
    from blacklab_ray.query.spans import clamp_to_budget
    out = tables[0]
    for t, g in zip(tables[1:], conns):
        if out.num_rows == 0:
            break
        # unbounded gaps pair left×right positions per doc — clamp
        # each composition to the active budget (stoppedRetrieving)
        out = clamp_to_budget(concat_spans(out, t, gap=g))
    out = _expand_edges(reader, out, plan.lead, plan.trail)
    if out.num_rows == 0:
        return out
    if out.column_names == ["doc_id", "start", "end"]:
        return unique_spans(out)
    d = out.to_pandas().drop_duplicates().sort_values(
        list(out.column_names), kind="mergesort")
    return pa.Table.from_pandas(d.reset_index(drop=True),
                                preserve_index=False)


def cql_spans_seq(reader, plan: SeqPlan) -> pa.Table:
    from blacklab_ray.query.spans import SPAN_SCHEMA, sequence_spans_multi
    import re as _re
    if _has_unbounded(plan):
        return _cql_spans_seq_unbounded(reader, plan)
    # positions whose pattern is too broad to expand become VERIFY
    # positions: matched as any-token during the positional join and
    # post-checked against the forward index from the anchors — the
    # reference's NFA strategy (doc/blacklab-internals.md:52-63,
    # SpanQueryFiSeq.java:24), realized with the capture machinery.
    positions = list(plan.positions)
    term_sets = []
    negates = []
    verifies: list[str | None] = []
    n_anchors = 0
    for p in positions:
        try:
            ts = _expand_position(reader, p)
            term_sets.append(ts)
            negates.append(p.negate)
            verifies.append(None)
            if not p.negate:
                n_anchors += 1
        except TooBroad:
            if p.negate or p.sensitivity != "i":
                raise
            term_sets.append([])
            negates.append(True)     # complement of nothing = any token
            verifies.append(p.pattern)
    if any(verifies) and n_anchors == 0:
        raise ValueError(
            "every position is too broad to expand and there is no "
            "anchor for forward-index verification; narrow a pattern")
    captures: list = []
    for p in positions:
        specs = []
        if p.capture:
            specs.append((p.capture, "pos"))
        if p.cap_open:
            specs.append((p.cap_open, "start"))
        if p.cap_close:
            specs.append((p.cap_close, "end"))
        captures.append(specs or None)
    auto = []
    for i, v in enumerate(verifies):
        if v:
            name = None
            for spec in (captures[i] or []):
                if spec[1] == "pos":
                    name = spec[0]
            if name is None:
                name = f"__v{i}"
                captures[i] = (captures[i] or []) + [(name, "pos")]
            auto.append((i, name, v))
    if any(not ts and not neg for ts, neg in zip(term_sets, negates)):
        if not any(captures):
            return SPAN_SCHEMA.empty_table()
        cols = {"doc_id": pa.array([], pa.int64()),
                "start": pa.array([], pa.int64()),
                "end": pa.array([], pa.int64())}
        for specs in captures:
            for n, k in (specs or []):
                cols[f"{n}_{k}"] = pa.array([], pa.int64())
        return pa.table(cols)
    spans = sequence_spans_multi(reader, term_sets, plan.gaps,
                                 negates=negates, captures=captures,
                                 annots=[p.sensitivity
                                         for p in positions])
    # forward-index verification of too-broad positions
    for i, cap, pattern in auto:
        if spans.num_rows:
            rx = _re.compile(f"^(?:{pattern})$")
            toks = reader.tokens_at(spans["doc_id"].to_numpy(),
                                    spans[f"{cap}_pos"].to_numpy())
            keep = pa.array([t is not None and rx.match(t) is not None
                             for t in toks])
            spans = spans.filter(keep)
    drop = [f"__v{i}_pos" for i, c, v in auto if c == f"__v{i}"]
    if drop:
        spans = spans.drop_columns([c for c in drop
                                    if c in spans.column_names])
        from blacklab_ray.query.spans import unique_spans
        if spans.num_rows and spans.column_names == ["doc_id", "start",
                                                     "end"]:
            spans = unique_spans(spans)
    return _expand_edges(reader, spans, plan.lead, plan.trail)


def _expand_edges(reader, spans: pa.Table,
                  lead: tuple[int, int] | None,
                  trail: tuple[int, int] | None) -> pa.Table:
    """Stretch spans by leading/trailing any-token ranges: one span per
    expansion length, dropped when it would cross a doc bound (the
    expansion needs L real tokens — SpansExpansionRaw.java:36)."""
    if (lead is None and trail is None) or spans.num_rows == 0:
        return spans
    from blacklab_ray.query.spans import unique_spans
    d = spans["doc_id"].to_numpy()
    s = spans["start"].to_numpy()
    e = spans["end"].to_numpy()
    extra = [c for c in spans.column_names
             if c not in ("doc_id", "start", "end")]
    parts = []
    import numpy as _np
    uniq = _np.unique(d)
    dl = dict(zip(uniq.tolist(), reader.doc_lens(uniq).tolist()))
    lens = _np.array([dl[x] for x in d.tolist()], dtype=_np.int64)
    # unbounded lead/trail ([]{n,} at the edges): stretch to the doc
    # bounds — the per-span ok mask below makes the enumeration exact
    lead_hi = (int(s.max()) if lead[1] is None else lead[1]) \
        if lead else 0
    trail_hi = (int((lens - e).max()) if trail[1] is None
                else trail[1]) if trail else 0
    lead_r = range(lead[0], lead_hi + 1) if lead else range(0, 1)
    trail_r = range(trail[0], trail_hi + 1) if trail else range(0, 1)
    for L in lead_r:
        for R in trail_r:
            s2 = s - L
            e2 = e + R
            ok = (s2 >= 0) & (e2 <= lens)
            if not ok.any():
                continue
            t = pa.table({"doc_id": pa.array(d[ok], pa.int64()),
                          "start": pa.array(s2[ok], pa.int64()),
                          "end": pa.array(e2[ok], pa.int64())})
            for c in extra:
                t = t.append_column(c, spans[c].filter(pa.array(ok)))
            parts.append(t)
    if not parts:
        return spans.slice(0, 0)
    out = pa.concat_tables(parts)
    if extra:
        df = out.to_pandas().drop_duplicates().sort_values(
            list(out.column_names), kind="mergesort")
        return pa.Table.from_pandas(df.reset_index(drop=True),
                                    preserve_index=False)
    return unique_spans(out)


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
