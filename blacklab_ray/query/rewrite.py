"""Query rewrite / optimization layer over the parsed CQL plan IR.

The reference rewrites its TextPattern / BLSpanQuery tree before
execution (BLSpanQuery.rewrite, SpanQuerySequence.optimize,
ClauseCombiner* in engine/src/main/java/nl/inl/blacklab/search/lucene/,
exercised by TestQueryRewrite.java): sequences are flattened, adjacent
literals combine into phrase queries, OR-of-terms collapses into one
multi-term clause, and no-op wrappers disappear.  Our parse layer
(query/cql.py) already lowers repetition/gap structure at build time,
so the rewrites that remain profitable on the SeqPlan/UnionPlan IR are:

R1  literal-alternation demotion: a regex position whose pattern is a
    depth-0 alternation of pure literals (``"the|a|an"``) becomes a
    literal position with alternatives — skipping the term-dictionary
    regex scan entirely (TextPatternRegex -> TextPatternTerm demotion).
R2  union branch dedup: identical OR branches evaluate once
    (BLSpanOrQuery.rewrite duplicate elimination).
R3  OR-of-single-terms merge: a UnionPlan whose branches are bare
    single-position clauses with identical flags merges into ONE
    position with alternatives — one postings pass instead of
    N passes + union/dedup (ClauseCombiner merging of OR-terms).
R4  single-branch union unwrap.
R5  empty lead/trail expansion drop ( ``[]{0,0}`` edges).
R6  self-filter elimination: ``X within X`` / ``X containing X`` -> X.

``plan_str`` renders the canonical plan string asserted by the golden
rewrite tests (tests/test_rewrite.py), mirroring the reference's
TestQueryRewrite assertion style.
"""
from __future__ import annotations

import re

from blacklab_ray.query.cql import (AnchorPlan, AndPlan, ExpandPlan,
                                     FilterPlan, NGramPlan, SeqPlan,
                                     SeqPos, TagPlan, UnionPlan,
                                     _is_regex)

__all__ = ["rewrite", "plan_str"]


# ---------------------------------------------------------------------------
# canonical plan strings (golden-test surface)
# ---------------------------------------------------------------------------

def _pos_str(p: SeqPos) -> str:
    if p.unbounded and p.body is not None:
        inner = ", ".join(_pos_str(x) for x in p.body[0])
        return f"REP({inner}){{{p.rep_min},}}"
    pats = "|".join((p.pattern, *p.alts))
    kind = "TERM" if p.literal and not any(_is_regex(a) for a in p.alts) \
        else "REGEX"
    if p.pattern == "" and p.negate:
        body = "ANYTOKEN"
    else:
        body = f"{kind}({pats})"
        if p.negate:
            body = f"NOT({body})"
    if p.unbounded:
        body = f"{body}{{{p.rep_min},}}"
    if p.sensitivity != "i":
        suffix = "@s" if p.sensitivity == "s" else f"@{p.sensitivity}"
        body += suffix
    for label, mark in ((p.capture, ""), (p.cap_open, "<"),
                        (p.cap_close, ">")):
        if label is not None:
            body = f"{label}{mark}:{body}"
    return body


def plan_str(plan) -> str:
    """Canonical, deterministic rendering of a plan tree."""
    if isinstance(plan, SeqPlan):
        parts: list[str] = []
        if plan.lead is not None:
            parts.append(f"EXPAND{plan.lead}")
        for i, p in enumerate(plan.positions):
            if i > 0:
                g = plan.gaps[i - 1]
                if g != (0, 0):
                    parts.append(f"GAP{g}")
            parts.append(_pos_str(p))
        if plan.trail is not None:
            parts.append(f"EXPAND{plan.trail}")
        if len(parts) == 1:
            return parts[0]
        return f"SEQ({', '.join(parts)})"
    if isinstance(plan, UnionPlan):
        return f"OR({', '.join(plan_str(b) for b in plan.branches)})"
    if isinstance(plan, TagPlan):
        attrs = "".join(f" {k}={v!r}"
                        for k, v in sorted((plan.attrs or {}).items()))
        return f"TAGS({plan.name}{attrs})"
    if isinstance(plan, FilterPlan):
        return (f"{plan.op.upper()}({plan_str(plan.producer)}, "
                f"{plan_str(plan.filter)})")
    if isinstance(plan, AndPlan):
        return f"AND({', '.join(plan_str(p) for p in plan.parts)})"
    if isinstance(plan, AnchorPlan):
        o = f"<{plan.open[0]}>" if plan.open else ""
        c = f"</{plan.close[0]}>" if plan.close else ""
        return f"ANCHOR({o}{plan_str(plan.inner)}{c})"
    if isinstance(plan, NGramPlan):
        return f"NGRAMS({plan.lo},{plan.hi})"
    if isinstance(plan, ExpandPlan):
        return (f"EXPANDSEQ({plan.pre}, {plan_str(plan.inner)}, "
                f"{plan.post})")
    raise TypeError(f"not a plan: {plan!r}")


# ---------------------------------------------------------------------------
# rewrite rules
# ---------------------------------------------------------------------------

_LITERAL_ALT_SAFE = re.compile(r"[^.*+?\[\](){}|\\^$]*")


def _split_literal_alternation(pattern: str) -> list[str] | None:
    """``the|a|an`` (or ``(the|a|an)`` spanning the whole pattern) ->
    its literal branches, or None if any branch needs regex matching."""
    if "|" not in pattern:
        return None
    s = pattern
    if s.startswith("(") and s.endswith(")"):
        inner = s[1:-1]
        if "(" not in inner and ")" not in inner:
            s = inner
    branches = s.split("|")
    for b in branches:
        if not b or _is_regex(b):
            return None
    return branches


def _rw_pos(p: SeqPos) -> SeqPos:
    pats = [p.pattern, *p.alts]
    out: list[str] = []
    for pat in pats:
        lits = _split_literal_alternation(pat) if _is_regex(pat) else None
        out.extend(lits if lits is not None else [pat])
    # dedupe, alternatives in sorted order (canonical form); the head
    # pattern slot keeps the first alternative for stable plan strings
    seen: dict[str, None] = dict.fromkeys(out)
    alts = sorted(seen)
    head, rest = alts[0], tuple(alts[1:])
    if head == p.pattern and rest == p.alts:
        return p
    return SeqPos(pattern=head, literal=not _is_regex(head),
                  negate=p.negate, alts=rest, capture=p.capture,
                  sensitivity=p.sensitivity, verify=p.verify,
                  cap_open=p.cap_open, cap_close=p.cap_close,
                  rep_min=p.rep_min, unbounded=p.unbounded,
                  body=p.body)


def _rw_seq(s: SeqPlan) -> SeqPlan:
    lead = None if s.lead == (0, 0) else s.lead
    trail = None if s.trail == (0, 0) else s.trail
    return SeqPlan(positions=[_rw_pos(p) for p in s.positions],
                   gaps=list(s.gaps), lead=lead, trail=trail)


def _mergeable_single(b: SeqPlan) -> SeqPos | None:
    """A branch eligible for the OR-of-terms merge (R3): exactly one
    position, no gaps/edges, not negated, not captured."""
    if (len(b.positions) != 1 or b.gaps or b.lead is not None
            or b.trail is not None):
        return None
    p = b.positions[0]
    if (p.negate or p.capture is not None or p.cap_open is not None
            or p.cap_close is not None or p.verify is not None
            or p.pattern == "" or p.unbounded):
        return None
    return p


def _rw_union(u: UnionPlan) -> SeqPlan | UnionPlan:
    branches = [_rw_seq(b) for b in u.branches]
    # R2: dedupe identical branches (first occurrence wins)
    seen: set[str] = set()
    deduped: list[SeqPlan] = []
    for b in branches:
        key = plan_str(b)
        if key not in seen:
            seen.add(key)
            deduped.append(b)
    # R3: merge OR-of-single-terms per sensitivity class
    merged: list[SeqPlan] = []
    slot_of: dict[str, int] = {}
    for b in deduped:
        p = _mergeable_single(b)
        if p is None:
            merged.append(b)
            continue
        if p.sensitivity in slot_of:
            tgt = merged[slot_of[p.sensitivity]].positions[0]
            merged[slot_of[p.sensitivity]].positions[0] = _rw_pos(
                SeqPos(pattern=tgt.pattern, literal=tgt.literal,
                       alts=(*tgt.alts, p.pattern, *p.alts),
                       sensitivity=tgt.sensitivity))
        else:
            slot_of[p.sensitivity] = len(merged)
            merged.append(b)
    if len(merged) == 1:                       # R4
        return merged[0]
    return UnionPlan(branches=merged)


def rewrite(plan):
    """Rewrite a parsed plan to its canonical optimized form.

    Pure tree transform (no reader / no I/O), applied by
    ``cql_spans`` between parse and execution."""
    if isinstance(plan, FilterPlan):
        producer = plan.producer if isinstance(plan.producer, TagPlan) \
            else rewrite(plan.producer)
        filt = plan.filter if isinstance(plan.filter, TagPlan) \
            else rewrite(plan.filter)
        if not isinstance(filt, TagPlan) and \
                not isinstance(producer, TagPlan) and \
                plan_str(producer) == plan_str(filt):      # R6
            return producer
        return FilterPlan(op=plan.op, producer=producer, filter=filt)
    if isinstance(plan, AndPlan):
        return AndPlan(parts=[rewrite(p) for p in plan.parts])
    if isinstance(plan, AnchorPlan):
        return AnchorPlan(inner=rewrite(plan.inner), open=plan.open,
                          close=plan.close)
    if isinstance(plan, ExpandPlan):
        return ExpandPlan(inner=rewrite(plan.inner), pre=plan.pre,
                          post=plan.post)
    if isinstance(plan, UnionPlan):
        if any(not isinstance(b, SeqPlan) for b in plan.branches):
            # mixed branches (query-level '&' under '|'): rewrite each
            return UnionPlan(branches=[rewrite(b) for b in
                                       plan.branches])
        return _rw_union(plan)
    if isinstance(plan, SeqPlan):
        return _rw_seq(plan)
    return plan
