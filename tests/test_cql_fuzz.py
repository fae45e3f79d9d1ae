"""Property-based CQL fuzzing: random queries from the supported
grammar, executed by the engine AND by a brute-force interpreter over
the raw token lists. Catches interaction bugs between negation,
repetition, alternation, gaps, captures and edge expansion that
hand-written cases miss (the randomized-coverage upgrade over the
reference's hand-built TestSpans* suites, SURVEY §5)."""

import re

import numpy as np
import pytest

from blacklab_ray.query import IndexReader
from blacklab_ray.query.cql import cql_spans


@pytest.fixture(scope="module")
def reader(small_index):
    return IndexReader(small_index)


# ---------------------------------------------------------------------------
# brute interpreter over docs: dict[doc_id -> list[str]]
# ---------------------------------------------------------------------------

def _match_at(pos, toks, q, pred_of):
    """End positions (exclusive) for matches of one plan position
    starting at token q — handles EXACT unbounded repetitions
    (single-token runs and repeated group bodies) independently of the
    engine's run/chain machinery."""
    n = len(toks)
    if getattr(pos, "unbounded", False):
        m = pos.rep_min
        if pos.body is not None:
            bpos, bgaps = pos.body
            out: set[int] = set()
            frontier = {q}
            level = 0
            while frontier:
                nxt: set[int] = set()
                for st in frontier:
                    nxt.update(_match_seq_at(list(bpos), list(bgaps),
                                             toks, st, pred_of))
                level += 1
                if level >= m:
                    out.update(nxt)
                frontier = nxt
            return sorted(out)
        pred = pred_of(pos)
        c = 0
        while q + c < n and pred(toks[q + c]):
            c += 1
        return [q + k for k in range(m, c + 1)]
    if q < n and pred_of(pos)(toks[q]):
        return [q + 1]
    return []


def _match_seq_at(positions, gaps, toks, s, pred_of):
    """End positions for the full position sequence anchored at s."""
    n = len(toks)
    frontier = list(_match_at(positions[0], toks, s, pred_of))
    for (lo, hi), pos in zip(gaps, positions[1:]):
        nxt: set[int] = set()
        hi_eff = n if hi is None else hi
        for en in frontier:
            for g in range(lo, hi_eff + 1):
                q = en + g
                if q >= n:
                    break
                nxt.update(_match_at(pos, toks, q, pred_of))
        frontier = sorted(nxt)
        if not frontier:
            break
    return frontier


def _brute_positions(plan_positions, gaps, docs, pred_of):
    """All (doc, start, end) for a sequence of plan positions."""
    out = set()
    for did, toks in docs.items():
        for s in range(len(toks)):
            for e in _match_seq_at(plan_positions, gaps, toks, s,
                                   pred_of):
                out.add((did, s, e))
    return out


def _brute_cql(q, docs):
    """Interpret the same subset grammar by expanding to predicate
    sequences (mirrors the parser's lowering independently)."""
    from blacklab_ray.query.cql import (
        AndPlan, FilterPlan, SeqPlan, UnionPlan, parse_cql,
    )
    plan = parse_cql(q)

    def pred_of(p):
        if p.negate:
            rxs = [re.compile(f"^(?:{x})$") for x in (p.pattern,
                                                      *p.alts)]
            return lambda t: not any(r.match(t) for r in rxs)
        rxs = [re.compile(f"^(?:{x})$") for x in (p.pattern, *p.alts)]
        return lambda t: any(r.match(t) for r in rxs)

    def seq_spans(sp: SeqPlan):
        spans = _brute_positions(sp.positions, sp.gaps, docs, pred_of)
        # edge expansion (hi=None → stretch to the doc bounds)
        if sp.lead or sp.trail:
            lead = sp.lead or (0, 0)
            trail = sp.trail or (0, 0)
            out = set()
            for did, s, e in spans:
                n = len(docs[did])
                lead_hi = s if lead[1] is None else lead[1]
                trail_hi = (n - e) if trail[1] is None else trail[1]
                for L in range(lead[0], lead_hi + 1):
                    for R in range(trail[0], trail_hi + 1):
                        if s - L >= 0 and e + R <= n:
                            out.add((did, s - L, e + R))
            spans = out
        return spans

    def filter_spans(pl):
        prod = plan_spans(pl.producer)
        filt = plan_spans(pl.filter)
        if pl.op == "within":
            return {x for x in prod
                    if any(f[0] == x[0] and f[1] <= x[1] and x[2] <= f[2]
                           for f in filt)}
        return {x for x in prod
                if any(f[0] == x[0] and x[1] <= f[1] and f[2] <= x[2]
                       for f in filt)}

    def plan_spans(pl):
        if isinstance(pl, SeqPlan):
            return seq_spans(pl)
        if isinstance(pl, FilterPlan):
            return filter_spans(pl)
        if isinstance(pl, AndPlan):
            sets = [plan_spans(p) for p in pl.parts]
            out = sets[0]
            for s in sets[1:]:
                out = out & s
            return out
        if isinstance(pl, UnionPlan):
            out = set()
            for b in pl.branches:
                out |= plan_spans(b)
            return out
        raise AssertionError(type(pl))

    return plan_spans(plan)


# ---------------------------------------------------------------------------
# random query generation from the supported grammar
# ---------------------------------------------------------------------------

def _rand_position(rng, vocab):
    r = rng.random()
    term = vocab[int(rng.integers(0, len(vocab)))]
    if r < 0.45:
        body = f'"{term}"'
    elif r < 0.65:
        body = f'[word="{term[:2]}.*"]'       # narrow regex
    elif r < 0.8:
        t2 = vocab[int(rng.integers(0, len(vocab)))]
        body = f'("{term}"|"{t2}")'
    else:
        body = f'[word != "{term}"]'
    if rng.random() < 0.2 and not body.startswith("[word !="):
        r2 = rng.random()
        if r2 < 0.5:
            lo = int(rng.integers(1, 3))
            hi = lo + int(rng.integers(0, 2))
            body += f"{{{lo},{hi}}}" if hi > lo else f"{{{lo}}}"
        elif r2 < 0.7:
            body += "?"
        elif r2 < 0.8:
            body += "+"          # EXACT unbounded (r4)
        elif r2 < 0.9:
            body += "*"
        else:
            body += f"{{{int(rng.integers(1, 3))},}}"
    return body


def _rand_query(rng, vocab) -> str:
    n = int(rng.integers(1, 4))
    parts = []
    for i in range(n):
        parts.append(_rand_position(rng, vocab))
        if i < n - 1 and rng.random() < 0.4:
            lo = int(rng.integers(0, 2))
            if rng.random() < 0.25:          # unbounded any-gap
                parts.append(f"[]{{{lo},}}")
            else:
                hi = lo + int(rng.integers(0, 3))
                parts.append(f"[]{{{lo},{hi}}}")
    q = " ".join(parts)
    if rng.random() < 0.1:
        # queryFunctionCall: _FI1/_FI2 are strategy hints lowered to
        # the plain sequence of their two args
        t = vocab[int(rng.integers(0, len(vocab)))]
        fn = "_FI1" if rng.random() < 0.5 else "_FI2"
        q = f'{fn}({q}, "{t}")'
    if rng.random() < 0.15:
        # repeated multi-token group prefix (group-rep lowering);
        # sometimes UNBOUNDED (chained fixed-point path)
        a = vocab[int(rng.integers(0, len(vocab)))]
        b = vocab[int(rng.integers(0, len(vocab)))]
        lo = int(rng.integers(0, 2))
        if rng.random() < 0.3:
            q = f'("{a}" "{b}"){{{max(lo, 1)},}} {q}'
        else:
            q = f'("{a}" "{b}"){{{lo},{lo + 1}}} {q}'
    if rng.random() < 0.12:
        # query-level '&' (SpanQueryAnd: exact span intersection)
        t = vocab[int(rng.integers(0, len(vocab)))]
        if rng.random() < 0.5:
            q = f'{q} & [word="{t[:2]}.*"]'
        else:
            t2 = vocab[int(rng.integers(0, len(vocab)))]
            q = f'{q} & ("{t}" | "{t2}")'
    if rng.random() < 0.15:
        q = f"[]{{1,2}} {q}"                    # leading expansion
    if rng.random() < 0.2:
        t = vocab[int(rng.integers(0, len(vocab)))]
        q = f'{q} | "{t}"'                      # alternation branch
    elif rng.random() < 0.25:
        # position filter against a window sequence
        a = vocab[int(rng.integers(0, len(vocab)))]
        b = vocab[int(rng.integers(0, len(vocab)))]
        op = "within" if rng.random() < 0.5 else "containing"
        lo = int(rng.integers(0, 2))
        hi = lo + int(rng.integers(1, 4))
        filt = f'"{a}" []{{{lo},{hi}}} "{b}"'
        if rng.random() < 0.3:
            # parenthesized filter group as an alternation branch
            t = vocab[int(rng.integers(0, len(vocab)))]
            q = f'({q} {op} {filt}) | "{t}"'
        else:
            q = f'{q} {op} {filt}'
    return q


def test_cql_fuzz_vs_brute(reader, small_oracle):
    rng = np.random.default_rng(97)
    # vocab skewed toward common terms so sequences actually match
    df = small_oracle.doc_freq()
    vocab = sorted(df, key=df.get, reverse=True)[:40]
    docs = small_oracle.docs
    checked = 0
    for qi in range(80):
        q = _rand_query(rng, vocab)
        try:
            exp = _brute_cql(q, docs)
        except ValueError:
            continue    # generated an out-of-subset shape
        try:
            t = cql_spans(reader, q)
        except ValueError as e:
            # declared refusal (e.g. all positions too broad with no
            # anchor) — allowed; count as exercised error handling
            assert "anchor" in str(e) or "expands" in str(e), (q, e)
            continue
        got = set(zip(*[t[c].to_pylist()
                        for c in ("doc_id", "start", "end")])) \
            if t.num_rows else set()
        assert got == exp, f"query {qi}: {q!r}\nonly engine: " \
            f"{sorted(got - exp)[:5]}\nonly brute: " \
            f"{sorted(exp - got)[:5]}"
        checked += 1
    assert checked >= 50, f"only {checked} queries exercised"


# ---------------------------------------------------------------------------
# constraint-clause fuzzing (MatchFilter tree)
# ---------------------------------------------------------------------------

def _rand_cexpr(rng, caps, vocab, depth=0):
    """Random constraint expression + an INDEPENDENT evaluator built
    alongside it (fn: {cap: token} -> bool), so the check never reuses
    the engine's parser."""
    r = rng.random()
    if depth >= 2 or r < 0.45:
        a = caps[int(rng.integers(0, len(caps)))]
        op = "=" if rng.random() < 0.6 else "!="
        if rng.random() < 0.5:
            b = caps[int(rng.integers(0, len(caps)))]
            expr = f"{a}.word {op} {b}.word"
            fn = (lambda tm, a=a, b=b: tm[a] == tm[b]) if op == "=" \
                else (lambda tm, a=a, b=b: tm[a] != tm[b])
        else:
            lit = vocab[int(rng.integers(0, len(vocab)))]
            expr = f'{a}.word {op} "{lit}"'
            fn = (lambda tm, a=a, lit=lit: tm[a] == lit) if op == "=" \
                else (lambda tm, a=a, lit=lit: tm[a] != lit)
        return expr, fn
    xa, fa = _rand_cexpr(rng, caps, vocab, depth + 1)
    if r < 0.6:
        return f"!({xa})", lambda tm, fa=fa: not fa(tm)
    xb, fb = _rand_cexpr(rng, caps, vocab, depth + 1)
    if r < 0.75:
        return f"({xa} & {xb})", lambda tm, fa=fa, fb=fb: \
            fa(tm) and fb(tm)
    if r < 0.9:
        return f"({xa} | {xb})", lambda tm, fa=fa, fb=fb: \
            fa(tm) or fb(tm)
    return f"({xa} -> {xb})", lambda tm, fa=fa, fb=fb: \
        (not fa(tm)) or fb(tm)


def test_cql_constraint_fuzz_vs_brute(reader, small_oracle):
    """Random captured sequences + random MatchFilter constraint trees
    vs a brute evaluator over the raw token lists."""
    rng = np.random.default_rng(131)
    df = small_oracle.doc_freq()
    vocab = sorted(df, key=df.get, reverse=True)[:30]
    docs = small_oracle.docs
    names = ["A", "B", "C"]
    checked = 0
    for qi in range(60):
        n = int(rng.integers(2, 4))
        caps = names[:n]
        parts, preds, offsets = [], [], []
        off = 0
        for i, cap in enumerate(caps):
            r = rng.random()
            term = vocab[int(rng.integers(0, len(vocab)))]
            if r < 0.4:
                parts.append(f'{cap}:"{term}"')
                preds.append(lambda t, term=term: t == term)
            elif r < 0.7:
                rx = f"{term[:2]}.*"
                parts.append(f'{cap}:[word="{rx}"]')
                preds.append(lambda t, rx=rx:
                             re.match(f"^(?:{rx})$", t) is not None)
            else:
                parts.append(f"{cap}:[]")
                preds.append(lambda t: True)
            offsets.append(off)
            off += 1
            if i < n - 1 and rng.random() < 0.3:
                g = int(rng.integers(1, 3))
                parts.append(f"[]{{{g}}}")
                off += g
        cexpr, cfn = _rand_cexpr(rng, caps, vocab)
        q = " ".join(parts) + " :: " + cexpr
        exp = set()
        for did, toks in docs.items():
            for s in range(len(toks) - off + 1):
                if all(p(toks[s + o]) for p, o in zip(preds, offsets)):
                    tm = {c: toks[s + o]
                          for c, o in zip(caps, offsets)}
                    if cfn(tm):
                        exp.add((did, s, s + off))
        t = cql_spans(reader, q)
        got = set(zip(*[t[c].to_pylist()
                        for c in ("doc_id", "start", "end")])) \
            if t.num_rows else set()
        assert got == exp, f"query {qi}: {q!r}\nonly engine: " \
            f"{sorted(got - exp)[:5]}\nonly brute: " \
            f"{sorted(exp - got)[:5]}"
        checked += 1
    assert checked >= 50


# ---------------------------------------------------------------------------
# boolean token-expression fuzzing (DNF lowering, r4)
# ---------------------------------------------------------------------------

_BF_TEST = re.compile(r'\s*word\s*(!?)=\s*"([^"]*)"')


def _pred_of_body(body: str):
    """Independent recursive-descent evaluator for a boolean bracket
    body over the word annotation — shares NO code with the engine's
    _dnf_body lowering."""
    pos = 0

    def skip():
        nonlocal pos
        while pos < len(body) and body[pos].isspace():
            pos += 1

    def parse_or():
        nonlocal pos
        p = parse_and()
        while True:
            skip()
            if pos < len(body) and body[pos] == "|":
                pos += 1
                q = parse_and()
                p = (lambda a, b: lambda t: a(t) or b(t))(p, q)
            else:
                return p

    def parse_and():
        nonlocal pos
        p = parse_un()
        while True:
            skip()
            if pos < len(body) and body[pos] == "&":
                pos += 1
                q = parse_un()
                p = (lambda a, b: lambda t: a(t) and b(t))(p, q)
            else:
                return p

    def parse_un():
        nonlocal pos
        skip()
        if body[pos] == "!":
            pos += 1
            p = parse_un()
            return lambda t: not p(t)
        if body[pos] == "(":
            pos += 1
            p = parse_or()
            skip()
            assert body[pos] == ")", body
            pos += 1
            return p
        m = _BF_TEST.match(body, pos)
        assert m, (body, pos)
        pos = m.end()
        neg, val = m.group(1), m.group(2)
        rx = re.compile(f"^(?:{val})$")
        if neg:
            return lambda t: not rx.match(t)
        return lambda t: bool(rx.match(t))

    p = parse_or()
    skip()
    assert pos == len(body), body
    return p


def _rand_bool_body(rng, vocab, depth=0) -> str:
    def test():
        t = vocab[int(rng.integers(0, len(vocab)))]
        val = t if rng.random() < 0.7 else t[:2] + ".*"
        neg = "!" if rng.random() < 0.3 else ""
        return f'word{neg}="{val}"'
    r = rng.random()
    if depth >= 2 or r < 0.35:
        return test()
    a = _rand_bool_body(rng, vocab, depth + 1)
    b = _rand_bool_body(rng, vocab, depth + 1)
    if r < 0.6:
        e = f"{a} & {b}"
    elif r < 0.85:
        e = f"{a} | {b}"
    else:
        return f"!({a})"
    return f"({e})" if depth > 0 else e


def test_cql_bool_bracket_fuzz_vs_brute(reader, small_oracle):
    """Boolean bracket bodies, alone and inside short sequences,
    span-exact vs an independent predicate evaluator."""
    rng = np.random.default_rng(211)
    df = small_oracle.doc_freq()
    vocab = sorted(df, key=df.get, reverse=True)[:30]
    docs = small_oracle.docs

    def brute(preds, gaps):
        out = set()
        for did, toks in docs.items():
            n = len(toks)
            for s in range(n):
                if not preds[0](toks[s]):
                    continue
                frontier = {s + 1}
                for (lo, hi), p in zip(gaps, preds[1:]):
                    nxt = set()
                    for en in frontier:
                        for g in range(lo, hi + 1):
                            q = en + g
                            if q < n and p(toks[q]):
                                nxt.add(q + 1)
                    frontier = nxt
                for en in frontier:
                    out.add((did, s, en))
        return out

    checked = 0
    for qi in range(60):
        n = 1 if rng.random() < 0.5 else 2
        bodies, parts, gaps = [], [], []
        for i in range(n):
            if rng.random() < 0.75:
                body = _rand_bool_body(rng, vocab)
            else:
                t = vocab[int(rng.integers(0, len(vocab)))]
                body = f'word="{t}"'
            bodies.append(body)
            parts.append(f"[{body}]")
            if i < n - 1:
                if rng.random() < 0.4:
                    lo = int(rng.integers(0, 2))
                    hi = lo + int(rng.integers(0, 3))
                    parts.append(f"[]{{{lo},{hi}}}")
                    gaps.append((lo, hi))
                else:
                    gaps.append((0, 0))
        q = " ".join(parts)
        preds = [_pred_of_body(b) for b in bodies]
        exp = brute(preds, gaps)
        try:
            t = cql_spans(reader, q)
        except ValueError as e:
            assert "anchor" in str(e) or "expands" in str(e) \
                or "variants" in str(e), (q, e)
            continue
        got = set(zip(*[t[c].to_pylist()
                        for c in ("doc_id", "start", "end")])) \
            if t.num_rows else set()
        assert got == exp, f"query {qi}: {q!r}\nonly engine: " \
            f"{sorted(got - exp)[:5]}\nonly brute: " \
            f"{sorted(exp - got)[:5]}"
        checked += 1
    assert checked >= 45, f"only {checked} queries exercised"


# ---------------------------------------------------------------------------
# session-15 productions: optional captures / bare caprefs / n-gram
# filters / expansion around parenthesized groups
# ---------------------------------------------------------------------------

def test_optional_capture_implication_fuzz_vs_brute(reader,
                                                    small_oracle):
    """`(c:'T')? a:[] 'X' b:[] :: <tree over c, a, b>` span-exact vs
    an independent enumerator that models the optional capture's
    matched/unmatched state (TestSearches.testConstraintImplication
    generalized)."""
    rng = np.random.default_rng(1501)
    df = small_oracle.doc_freq()
    vocab = sorted(df, key=df.get, reverse=True)[:25]
    checked = 0
    for _qi in range(40):
        T = vocab[int(rng.integers(0, len(vocab)))]
        X = vocab[int(rng.integers(0, len(vocab)))]
        # random constraint: c -> cmp | c & cmp | !c | bare c,
        # where cmp compares a/b words to each other or a literal
        lit = vocab[int(rng.integers(0, len(vocab)))]
        r = rng.random()
        if r < 0.3:
            cexpr = "c -> (a.word = b.word)"
            fn = lambda cset, ta, tb: (not cset) or ta == tb
        elif r < 0.55:
            cexpr = f'c & a.word = "{lit}"'
            fn = lambda cset, ta, tb, lit=lit: cset and ta == lit
        elif r < 0.8:
            cexpr = "!c"
            fn = lambda cset, ta, tb: not cset
        else:
            cexpr = "c | a.word != b.word"
            fn = lambda cset, ta, tb: cset or ta != tb
        q = f"(c:'{T}')? a:[] '{X}' b:[] :: {cexpr}"
        got = cql_spans(reader, q)
        got_rows = set(zip(got["doc_id"].to_pylist(),
                           got["start"].to_pylist(),
                           got["end"].to_pylist()))
        exp = set()
        for did, toks in small_oracle.docs.items():
            n = len(toks)
            # variant WITHOUT c: a X b at p..p+3
            for p in range(n - 2):
                if toks[p + 1] == X and fn(False, toks[p],
                                           toks[p + 2]):
                    exp.add((did, p, p + 3))
            # variant WITH c: T a X b at p..p+4
            for p in range(n - 3):
                if toks[p] == T and toks[p + 2] == X and \
                        fn(True, toks[p + 1], toks[p + 3]):
                    exp.add((did, p, p + 4))
        assert got_rows == exp, (q, len(got_rows), len(exp))
        checked += 1
    assert checked == 40


def test_ngram_filter_and_expansion_fuzz_vs_brute(reader,
                                                  small_oracle):
    """`[] ([]{1,k} containing 'T')` and `a:[] ([]{lo,k} containing
    'T') b:[]` span-exact vs direct window enumeration
    (SpanQueryFilterNGrams + SpanQueryExpansion shapes)."""
    rng = np.random.default_rng(1502)
    df = small_oracle.doc_freq()
    vocab = sorted(df, key=df.get, reverse=True)[:20]
    for _qi in range(25):
        T = vocab[int(rng.integers(0, len(vocab)))]
        lo = int(rng.integers(1, 3))
        k = lo + int(rng.integers(0, 3))
        pre = int(rng.integers(0, 2))
        post = int(rng.integers(0, 2))
        caps = ("a:[] " if pre else "") + \
            f"([]{{{lo},{k}}} containing '{T}')" + \
            (" b:[]" if post else "")
        got = cql_spans(reader, caps)
        got_rows = set(zip(got["doc_id"].to_pylist(),
                           got["start"].to_pylist(),
                           got["end"].to_pylist()))
        exp = set()
        for did, toks in small_oracle.docs.items():
            n = len(toks)
            hits = [p for p, t in enumerate(toks) if t == T]
            grams = set()
            for p in hits:
                for L in range(lo, k + 1):
                    for s in range(max(0, p - L + 1), p + 1):
                        if s + L <= n:
                            grams.add((s, s + L))
            for s, e in grams:
                ns, ne = s - pre, e + post
                if ns >= 0 and ne <= n:
                    exp.add((did, ns, ne))
        assert got_rows == exp, (caps, len(got_rows), len(exp))
