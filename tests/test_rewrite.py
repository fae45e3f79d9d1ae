"""Golden query-rewrite tests, mirroring the reference's
TestQueryRewrite.java (assert canonical plan strings after rewrite;
BLSpanQuery.rewrite / SpanQuerySequence.optimize / ClauseCombiner*)."""
import pytest

from blacklab_ray.query.cql import parse_cql
from blacklab_ray.query.rewrite import plan_str, rewrite


GOLDEN = [
    # sequences stay flat (parse-time lowering + identity rewrite)
    ('"the" "quick"', "SEQ(TERM(the), TERM(quick))"),
    # R3: OR-of-terms merges into ONE multi-term clause
    ('"the" | "a" | "an"', "TERM(a|an|the)"),
    # R1: regex alternation of literals demotes to a literal clause
    ('"the|a|an"', "TERM(a|an|the)"),
    ('"(the|a|an)"', "TERM(a|an|the)"),
    # R1 inside a sequence position
    ('"cat|dog" "runs"', "SEQ(TERM(cat|dog), TERM(runs))"),
    # true regexes are left alone
    ('"qu.*" []{1,2} "dog"', "SEQ(REGEX(qu.*), GAP(1, 2), TERM(dog))"),
    ('"qu.*|dog"', "REGEX(qu.*|dog)"),
    # R2/R4: duplicate branches collapse, singleton union unwraps
    ('"x" | "x"', "TERM(x)"),
    # quoted-group alternation canonicalizes (sorted alternatives)
    ('("b"|"a") "c"', "SEQ(TERM(a|b), TERM(c))"),
    # R6: self-filter eliminates
    ('"a" within "a"', "TERM(a)"),
    ('"a" containing "a"', "TERM(a)"),
    # different sensitivity classes must NOT merge
    ('"a" | "b" %c', "OR(TERM(a), TERM(b)@s)"),
    # negated positions must NOT merge into the OR-of-terms clause
    ('"a" | [word != "b"]', "OR(TERM(a), NOT(TERM(b)))"),
    # captures are preserved and never merged away
    ('A:[pos="V.*"] "x"', "SEQ(A:REGEX(V.*)@pos, TERM(x))"),
    ('A:"a" | B:"b"', "OR(A:TERM(a), B:TERM(b))"),
    # mixed: mergeable single terms merge, the sequence branch stays
    ('"a" | "b" | "c" "d"', "OR(TERM(a|b), SEQ(TERM(c), TERM(d)))"),
    # tag filters pass through untouched
    ('"a" within <s/>', "WITHIN(TERM(a), TAGS(s))"),
]


@pytest.mark.parametrize("query,expected", GOLDEN,
                         ids=[q for q, _ in GOLDEN])
def test_golden_rewrite(query, expected):
    assert plan_str(rewrite(parse_cql(query))) == expected


def test_rewrite_idempotent():
    for query, _ in GOLDEN:
        once = rewrite(parse_cql(query))
        assert plan_str(rewrite(once)) == plan_str(once)


@pytest.fixture(scope="module")
def small_reader(small_index):
    from blacklab_ray.query import IndexReader
    return IndexReader(small_index)


def test_literal_alternation_skips_dictionary_scan(small_reader,
                                                   monkeypatch):
    """The R1/R3 win: a rewritten OR-of-literals never touches the
    regex term-dictionary expansion path."""
    import blacklab_ray.query.engine as eng
    from blacklab_ray.query.cql import cql_spans

    baseline = cql_spans(small_reader, '"the|a|of"')

    def _boom(*a, **k):
        raise AssertionError("dictionary regex scan should be skipped")

    monkeypatch.setattr(eng, "expand_terms", _boom)
    rewritten = cql_spans(small_reader, '"the|a|of"')
    assert rewritten.equals(baseline)
    # and the union form produces the identical span set
    monkeypatch.undo()
    union = cql_spans(small_reader, '"the" | "a" | "of"')
    assert union.equals(baseline)
