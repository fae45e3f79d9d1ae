"""CQL subset parser + executor vs a loop-based scan oracle."""

import re

import numpy as np
import pytest

from blacklab_ray.query import IndexReader
from blacklab_ray.query.cql import (FilterPlan, UnionPlan, parse_cql,
                                    search_cql)
from blacklab_ray.query.cql import cql_spans


@pytest.fixture(scope="module")
def reader(small_index):
    return IndexReader(small_index)


def _brute_seq_spans(docs, patterns, gaps):
    """All (doc, start, end) where tokens match the sequence with gaps."""
    out = []
    regs = [re.compile(f"^(?:{p})$") for p in patterns]
    for did, toks in docs.items():
        n = len(toks)
        # dp over positions
        for s in range(n):
            if not regs[0].match(toks[s]):
                continue
            frontier = [s]
            for (lo, hi), rg in zip(gaps, regs[1:]):
                nxt = []
                for last in frontier:
                    for q in range(last + 1 + lo,
                                   min(n, last + 1 + hi + 1)):
                        if rg.match(toks[q]):
                            nxt.append(q)
                frontier = nxt
                if not frontier:
                    break
            for last in set(frontier):
                out.append((did, s, last + 1))
    return sorted(set(out))


def _rows(t):
    return sorted(zip(t["doc_id"].to_pylist(), t["start"].to_pylist(),
                      t["end"].to_pylist()))


def test_parse_shapes():
    p = parse_cql('"the" "quick"')
    assert len(p.positions) == 2 and p.gaps == [(0, 0)]
    p = parse_cql('"a" []{1,3} "b"')
    assert p.gaps == [(1, 3)]
    p = parse_cql('"a" [] "b"')
    assert p.gaps == [(1, 1)]
    p = parse_cql('"a" []? "b"')
    assert p.gaps == [(0, 1)]
    p = parse_cql('[word="th.*"] "x"')
    assert p.positions[0].pattern == "th.*" and not p.positions[0].literal
    p = parse_cql('"a"{3}')
    assert len(p.positions) == 3
    p = parse_cql('"a" "b" within "c" "d"')
    assert isinstance(p, FilterPlan) and p.op == "within"
    p = parse_cql('[] "a"')
    assert p.lead == (1, 1) and len(p.positions) == 1
    p = parse_cql('"a" []{0,2}')
    assert p.trail == (0, 2)
    with pytest.raises(ValueError):
        parse_cql('[]{2}')          # pure any-token: no anchor
    p = parse_cql('[lemma="x"]')     # parallel-annotation routing
    assert p.positions[0].sensitivity == "lemma"


def test_cql_literal_phrase(reader, small_oracle):
    import collections
    follow = collections.Counter()
    for toks in small_oracle.docs.values():
        for x, y in zip(toks, toks[1:]):
            if x == "the":
                follow[y] += 1
    nxt = follow.most_common(1)[0][0]
    got = _rows(cql_spans(reader, f'"the" "{nxt}"'))
    exp = _brute_seq_spans(small_oracle.docs, ["the", nxt], [(0, 0)])
    assert got == exp


def test_cql_regex_and_gaps(reader, small_oracle):
    q = '[word="th.*"] []{0,2} [word="w000.."]'
    got = _rows(cql_spans(reader, q))
    exp = _brute_seq_spans(small_oracle.docs, ["th.*", "w000.."],
                           [(0, 2)])
    assert got == exp


def test_cql_repetition(reader, small_oracle):
    got = _rows(cql_spans(reader, '"the"{2}'))
    exp = _brute_seq_spans(small_oracle.docs, ["the", "the"], [(0, 0)])
    assert got == exp


def test_cql_within(reader, small_oracle):
    # "the" X within "the" []{0,5} "the"  — anchors inside wider windows
    q = '"the" within "the" []{0,3} "the"'
    got = _rows(cql_spans(reader, q))
    singles = _brute_seq_spans(small_oracle.docs, ["the"], [])
    windows = _brute_seq_spans(small_oracle.docs, ["the", "the"],
                               [(0, 3)])
    exp = sorted(x for x in singles
                 if any(w[0] == x[0] and w[1] <= x[1] and x[2] <= w[2]
                        for w in windows))
    assert got == exp


def test_search_cql_scoring(reader, small_oracle):
    import collections
    follow = collections.Counter()
    for toks in small_oracle.docs.values():
        for x, y in zip(toks, toks[1:]):
            if x == "the":
                follow[y] += 1
    nxt = follow.most_common(1)[0][0]
    res = search_cql(reader, f'"the" "{nxt}"', k=10**9)
    from blacklab_ray.query import phrase_search
    ph = phrase_search(reader, ["the", nxt], k=10**9)
    assert res["doc_id"].to_pylist() == ph["doc_id"].to_pylist()
    assert res["span_tf"].to_pylist() == ph["phrase_tf"].to_pylist()
    for a, b in zip(res["score"].to_pylist(), ph["score"].to_pylist()):
        assert abs(a - b) < 1e-12


def test_cql_within_paragraph(ray_session, tmp_path):
    """`X within <p/>`: sequences crossing a paragraph boundary are
    matched by the plain sequence but excluded by the filter."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query.cql import cql_spans
    texts = [
        "alpha beta\ngamma delta",     # 'beta gamma' crosses the boundary
        "alpha beta gamma\ndelta",     # 'beta gamma' inside paragraph 1
    ]
    pages = pa.table({
        "url": pa.array(["d0", "d1"], pa.string()),
        "warc_ts": pa.array([0, 0], pa.timestamp("us")),
        "html": pa.array([t.encode() for t in texts], pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
    })
    src = tmp_path / "p"
    src.mkdir()
    pq.write_table(pages, str(src / "x.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx,
                BuildParams(num_buckets=2, n_salts=1,
                            paragraph_spans=True))
    r = IndexReader(idx)
    from blacklab_ray.stages.tokenize import hash64
    plain = cql_spans(r, '"beta" "gamma"')
    filt = cql_spans(r, '"beta" "gamma" within <p/>')
    assert set(plain["doc_id"].to_pylist()) == {hash64("d0"), hash64("d1")}
    assert filt["doc_id"].to_pylist() == [hash64("d1")]


def _brute_seq_spans_neg(docs, preds, gaps):
    """Brute sequence spans where preds[i] is a callable tok->bool."""
    out = []
    for did, toks in docs.items():
        n = len(toks)
        for s in range(n):
            if not preds[0](toks[s]):
                continue
            frontier = [s]
            for (lo, hi), pred in zip(gaps, preds[1:]):
                nxt = []
                for last in frontier:
                    for q in range(last + 1 + lo,
                                   min(n, last + 1 + hi + 1)):
                        if pred(toks[q]):
                            nxt.append(q)
                frontier = nxt
                if not frontier:
                    break
            for last in set(frontier):
                out.append((did, s, last + 1))
    return sorted(set(out))


def test_parse_negated_bracket():
    p = parse_cql('"the" [word != "of"]')
    assert p.positions[1].negate and p.positions[1].pattern == "of"
    p = parse_cql('[word!="th.*"]')
    assert p.positions[0].negate and not p.positions[0].literal


def test_cql_negated_position(reader, small_oracle):
    """TestSpansNot analogue: "the" followed by a non-"of" token."""
    got = _rows(cql_spans(reader, '"the" [word != "of"]'))
    exp = _brute_seq_spans_neg(
        small_oracle.docs,
        [lambda t: t == "the", lambda t: t != "of"], [(0, 0)])
    assert got == exp


def test_cql_negated_regex_position(reader, small_oracle):
    got = _rows(cql_spans(reader, '[word!="th.*"] "the"'))
    rx = re.compile(r"^(?:th.*)$")
    exp = _brute_seq_spans_neg(
        small_oracle.docs,
        [lambda t: not rx.match(t), lambda t: t == "the"], [(0, 0)])
    assert got == exp


def test_not_spans_complement(reader, small_oracle):
    """not_spans == all positions whose token != any of the terms,
    over the whole doc universe (SpansNot semantics)."""
    from blacklab_ray.query.spans import not_spans
    got = _rows(not_spans(reader, ["the", "of"]))
    exp = []
    for did, toks in small_oracle.docs.items():
        for i, t in enumerate(toks):
            if t not in ("the", "of"):
                exp.append((did, i, i + 1))
    assert got == sorted(exp)


def test_all_negative_cql(reader, small_oracle):
    """An all-negative query runs over the full doc universe."""
    got = _rows(cql_spans(reader, '[word != "the"]'))
    exp = [(did, i, i + 1)
           for did, toks in small_oracle.docs.items()
           for i, t in enumerate(toks) if t != "the"]
    assert got == sorted(exp)


def test_andnot_spans(reader):
    from blacklab_ray.query.spans import andnot_spans, span_table
    a = span_table([1, 1, 2], [0, 3, 5], [1, 4, 6])
    b = span_table([1, 2], [3, 9], [4, 10])
    got = _rows(andnot_spans(a, b))
    assert got == [(1, 0, 1), (2, 5, 6)]


def test_search_andnot_matches_oracle(reader, small_oracle):
    from blacklab_ray.query.engine import search_andnot, search_taat
    pos, neg = ["the", "of"], ["w000010"]
    res = search_andnot(reader, pos, neg, k=10**9)
    # oracle: taat result minus docs containing the neg term
    full = search_taat(reader, pos, k=10**9)
    neg_docs = {did for did, toks in small_oracle.docs.items()
                if "w000010" in toks}
    exp = [(d, s) for d, s in zip(full["doc_id"].to_pylist(),
                                  full["score"].to_pylist())
           if d not in neg_docs]
    assert res["doc_id"].to_pylist() == [d for d, _ in exp]
    for g, (_, s) in zip(res["score"].to_pylist(), exp):
        assert abs(g - s) < 1e-12


def test_parse_repetition_range_and_alternation():
    """TestQueryRewrite-style golden checks on the lowered plans."""
    p = parse_cql('"a"{1,3}')
    assert isinstance(p, UnionPlan) and len(p.branches) == 3
    assert [len(b.positions) for b in p.branches] == [1, 2, 3]
    p = parse_cql('"a" "b" | "c"')
    assert isinstance(p, UnionPlan) and len(p.branches) == 2
    assert len(p.branches[0].positions) == 2
    assert len(p.branches[1].positions) == 1
    p = parse_cql('("a"|"b") "c"')
    assert len(p.positions) == 2
    assert p.positions[0].pattern == "a" and p.positions[0].alts == ("b",)
    p = parse_cql('"x" "y"{0,1} "z"')
    assert isinstance(p, UnionPlan) and len(p.branches) == 2
    assert [len(b.positions) for b in p.branches] == [2, 3]
    with pytest.raises(ValueError):
        parse_cql('("a" "b"|"c")')     # multi-position group
    with pytest.raises(ValueError):
        parse_cql('(("a"))')           # nested parens
    with pytest.raises(ValueError):
        parse_cql('"a"{3,1}')          # bad range


def test_cql_repetition_range(reader, small_oracle):
    """`"the"{1,2}` == spans of "the" plus spans of "the the"."""
    got = _rows(cql_spans(reader, '"the"{1,2}'))
    exp = sorted(set(
        _brute_seq_spans(small_oracle.docs, ["the"], []) +
        _brute_seq_spans(small_oracle.docs, ["the", "the"], [(0, 0)])))
    assert got == exp


def test_cql_alternation_sequences(reader, small_oracle):
    import collections
    follow = collections.Counter()
    for toks in small_oracle.docs.values():
        for x, y in zip(toks, toks[1:]):
            if x == "the":
                follow[y] += 1
    nxt = follow.most_common(1)[0][0]
    got = _rows(cql_spans(reader, f'"the" "{nxt}" | "of"'))
    exp = sorted(set(
        _brute_seq_spans(small_oracle.docs, ["the", nxt], [(0, 0)]) +
        _brute_seq_spans(small_oracle.docs, ["of"], [])))
    assert got == exp


def test_cql_group_alternation(reader, small_oracle):
    got = _rows(cql_spans(reader, '("the"|"of") "the"'))
    exp = _brute_seq_spans(small_oracle.docs, ["the|of", "the"], [(0, 0)])
    assert got == exp


def test_cql_optional_position(reader, small_oracle):
    """`"the" "of"{0,1} "the"` — optional middle term."""
    got = _rows(cql_spans(reader, '"the" "of"{0,1} "the"'))
    exp = sorted(set(
        _brute_seq_spans(small_oracle.docs, ["the", "the"], [(0, 0)]) +
        _brute_seq_spans(small_oracle.docs, ["the", "of", "the"],
                         [(0, 0), (0, 0)])))
    assert got == exp


def test_capture_groups(reader, small_oracle):
    """A:[...] capture groups: hit rows carry the captured token
    position (SpanQueryCaptureGroup semantics)."""
    # narrow regex: stays under the 1024-term expansion cap
    t = cql_spans(reader, 'A:"the" []{0,1} B:[word="w000.."]')
    assert {"A_pos", "B_pos"} <= set(t.column_names)
    docs = small_oracle.docs
    got = sorted(zip(t["doc_id"].to_pylist(), t["start"].to_pylist(),
                     t["end"].to_pylist(), t["A_pos"].to_pylist(),
                     t["B_pos"].to_pylist()))
    exp = []
    for did, toks in docs.items():
        for i, tok in enumerate(toks):
            if tok != "the":
                continue
            for j in (i + 1, i + 2):
                if j < len(toks) and re.match(r"^(?:w000..)$", toks[j]):
                    exp.append((did, i, j + 1, i, j))
    assert got == sorted(exp)
    # capture positions always equal the captured token's position
    assert all(a == s for a, s in zip(t["A_pos"].to_pylist(),
                                      t["start"].to_pylist()))


def test_global_constraint_equal(reader, small_oracle):
    """`A:[] ... :: A.word = B.word` — same-token repetition at
    distance 2 (TestSpansConstrained-style)."""
    t = cql_spans(reader, 'A:[word="th.*"] [] B:[word="th.*"] '
                          ':: A.word = B.word')
    docs = small_oracle.docs
    rx = re.compile(r"^(?:th.*)$")
    exp = []
    for did, toks in docs.items():
        for i in range(len(toks) - 2):
            if rx.match(toks[i]) and rx.match(toks[i + 2]) \
                    and toks[i] == toks[i + 2]:
                exp.append((did, i, i + 3))
    got = sorted(zip(t["doc_id"].to_pylist(), t["start"].to_pylist(),
                     t["end"].to_pylist()))
    assert got == sorted(exp)


def test_global_constraint_not_equal(reader, small_oracle):
    t_eq = cql_spans(reader, 'A:"the" B:[word="th.*"] '
                             ':: A.word = B.word')
    t_ne = cql_spans(reader, 'A:"the" B:[word="th.*"] '
                             ':: A.word != B.word')
    t_all = cql_spans(reader, '"the" [word="th.*"]')
    assert t_eq.num_rows + t_ne.num_rows == t_all.num_rows
    # eq keeps only "the the"
    docs = small_oracle.docs
    exp_eq = sum(1 for did, toks in docs.items()
                 for i in range(len(toks) - 1)
                 if toks[i] == "the" and toks[i + 1] == "the")
    assert t_eq.num_rows == exp_eq


def test_constraint_errors(reader):
    with pytest.raises(ValueError, match="unknown capture"):
        cql_spans(reader, 'A:"the" "of" :: A.word = Z.word')
    with pytest.raises(ValueError, match="unsupported global"):
        cql_spans(reader, 'A:"the" B:"of" :: A.word < B.word')
    with pytest.raises(ValueError, match="cannot repeat"):
        parse_cql('A:"the"{2}')
    with pytest.raises(ValueError, match="dangling capture"):
        parse_cql('A: B:"the"')


def test_too_broad_pattern_rejected_without_anchor(reader):
    with pytest.raises(ValueError, match="no\\s+anchor|too broad"):
        cql_spans(reader, '[word=".*"] [word=".*"]')


def test_cql_sensitive_flag(ray_session, tmp_path):
    """`"X"%c` routes a position to the @s annotation: case-sensitive
    match inside an otherwise-insensitive sequence."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader
    texts = ["The spark engine runs",
             "the spark engine runs",
             "THE spark engine stops"]
    pages = pa.table({
        "url": pa.array([f"u{i}" for i in range(3)], pa.string()),
        "warc_ts": pa.array([0] * 3, pa.timestamp("us")),
        "html": pa.array([t.encode() for t in texts], pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
    })
    src = tmp_path / "p"
    src.mkdir()
    pq.write_table(pages, str(src / "x.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx,
                BuildParams(num_buckets=2, n_salts=1, sensitive=True))
    r = IndexReader(idx)
    from blacklab_ray.stages.tokenize import hash64
    ids = {f"u{i}": hash64(f"u{i}") for i in range(3)}
    # insensitive: all three docs
    all3 = cql_spans(r, '"the" "spark"')
    assert set(all3["doc_id"].to_pylist()) == set(ids.values())
    # sensitive first position: only the "The" doc
    only_The = cql_spans(r, '"The"%c "spark"')
    assert only_The["doc_id"].to_pylist() == [ids["u0"]]
    only_THE = cql_spans(r, '"THE"%c "spark"')
    assert only_THE["doc_id"].to_pylist() == [ids["u2"]]
    # sensitive regex position
    rx = cql_spans(r, '[word="TH.*"]%c "spark"')
    assert rx["doc_id"].to_pylist() == [ids["u2"]]
    # flag without a position errors
    with pytest.raises(ValueError, match="flag without"):
        parse_cql('%c "the"')


def test_cql_within_sentence(ray_session, tmp_path):
    """`X within <s/>`: sequences crossing a sentence boundary are
    excluded (sentence spans from [.!?\\n]+ splits)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.stages.tokenize import hash64
    texts = [
        "alpha beta. gamma delta",     # 'beta gamma' crosses sentences
        "alpha beta gamma! delta",     # 'beta gamma' inside sentence 1
        "what? beta gamma\ndelta",     # inside sentence 2 (newline ends it)
    ]
    pages = pa.table({
        "url": pa.array([f"d{i}" for i in range(3)], pa.string()),
        "warc_ts": pa.array([0] * 3, pa.timestamp("us")),
        "html": pa.array([t.encode() for t in texts], pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
    })
    src = tmp_path / "p"
    src.mkdir()
    pq.write_table(pages, str(src / "x.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx,
                BuildParams(num_buckets=2, n_salts=1,
                            sentence_spans=True))
    from blacklab_ray.query import IndexReader
    r = IndexReader(idx)
    plain = cql_spans(r, '"beta" "gamma"')
    filt = cql_spans(r, '"beta" "gamma" within <s/>')
    assert set(plain["doc_id"].to_pylist()) == \
        {hash64(f"d{i}") for i in range(3)}
    assert sorted(filt["doc_id"].to_pylist()) == \
        sorted([hash64("d1"), hash64("d2")])


def test_contextql(reader, small_oracle):
    """SRU ContextQL front-end lowers onto the shared engine."""
    from blacklab_ray.query.contextql import (
        parse_contextql, search_contextql,
    )
    from blacklab_ray.query.engine import (
        search_andnot, search_taat, sequence_search,
    )
    p = parse_contextql('word = "the" and of not w000010')
    assert p == {"op": "and", "terms": ["the", "of"],
                 "neg_terms": ["w000010"], "distance": None}
    a = search_contextql(reader, '"the" or "of"', k=15)
    b = search_taat(reader, ["the", "of"], k=15)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    c = search_contextql(reader, 'the and of not w000010', k=15)
    d = search_andnot(reader, ["the", "of"], ["w000010"], k=15,
                      mode="and")
    assert c["doc_id"].to_pylist() == d["doc_id"].to_pylist()
    e = search_contextql(reader, 'the prox/distance=2 of', k=15)
    f = sequence_search(reader, ["the", "of"], gaps=[(0, 1)], k=15)
    assert e["doc_id"].to_pylist() == f["doc_id"].to_pylist()
    for bad in ("the and of or x", "the not", "prox the",
                "lemma = \"x\"", "the prox/distance=2 of and x"):
        with pytest.raises(ValueError):
            parse_contextql(bad)


def test_cql_edge_expansion(reader, small_oracle):
    """Leading/trailing []{n,m} stretch matched spans by real tokens,
    dropping expansions that cross doc bounds (SpanQueryExpansion)."""
    got = _rows(cql_spans(reader, '[]{1,2} "the"'))
    exp = set()
    for did, toks in small_oracle.docs.items():
        for i, t in enumerate(toks):
            if t == "the":
                for L in (1, 2):
                    if i - L >= 0:
                        exp.add((did, i - L, i + 1))
    assert got == sorted(exp)
    got_t = _rows(cql_spans(reader, '"the" []'))
    exp_t = set()
    for did, toks in small_oracle.docs.items():
        for i, t in enumerate(toks):
            if t == "the" and i + 2 <= len(toks):
                exp_t.add((did, i, i + 2))
    assert got_t == sorted(exp_t)
    # both edges at once
    got_b = _rows(cql_spans(reader, '[] "the" []'))
    exp_b = set()
    for did, toks in small_oracle.docs.items():
        for i, t in enumerate(toks):
            if t == "the" and i - 1 >= 0 and i + 2 <= len(toks):
                exp_b.add((did, i - 1, i + 2))
    assert got_b == sorted(exp_b)


def test_fiseq_verification(reader, small_oracle):
    """Too-broad patterns in anchored sequences resolve via forward-
    index verification (ClauseCombinerNfa / SpanQueryFiSeq analogue):
    same result as if the pattern had been expanded."""
    # '.*' expands past the term cap; anchored on "the" it must match
    # every token following "the"
    got = _rows(cql_spans(reader, '"the" [word=".*"]'))
    exp = []
    for did, toks in small_oracle.docs.items():
        for i, t in enumerate(toks[:-1]):
            if t == "the":
                exp.append((did, i, i + 2))
    assert got == sorted(set(exp))
    # broad pattern with real selectivity: token after "the" ending 'e'
    got2 = _rows(cql_spans(reader, '"the" [word=".*e"]'))
    exp2 = []
    for did, toks in small_oracle.docs.items():
        for i, t in enumerate(toks[:-1]):
            if t == "the" and toks[i + 1].endswith("e"):
                exp2.append((did, i, i + 2))
    assert got2 == sorted(set(exp2))
    # verify position may carry an explicit capture label
    t = cql_spans(reader, 'A:[word=".*"] "the"')
    assert "A_pos" in t.column_names and t.num_rows > 0


def test_tags_with_attributes(ray_session, tmp_path):
    """Standoff tag spans with attributes: `X within <q speaker="a"/>`
    (SpanQueryTags + @attr__value filtering)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader
    from blacklab_ray.stages.tokenize import hash64
    tag_t = pa.list_(pa.struct([("name", pa.string()),
                                ("start", pa.int32()),
                                ("end", pa.int32()),
                                ("attrs", pa.string())]))
    texts = ["alpha beta gamma delta", "beta gamma epsilon zeta"]
    tags = [
        [{"name": "q", "start": 0, "end": 3, "attrs": "speaker=a"},
         {"name": "q", "start": 2, "end": 4, "attrs": "speaker=b"}],
        [{"name": "q", "start": 0, "end": 2, "attrs": "speaker=b"},
         {"name": "ne", "start": 2, "end": 3, "attrs": "type=loc"}],
    ]
    pages = pa.table({
        "url": pa.array(["d0", "d1"], pa.string()),
        "warc_ts": pa.array([0, 0], pa.timestamp("us")),
        "html": pa.array([b"", b""], pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
        "tags": pa.array(tags, tag_t),
    })
    src = tmp_path / "p"
    src.mkdir()
    pq.write_table(pages, str(src / "x.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx, BuildParams(num_buckets=2, n_salts=1))
    r = IndexReader(idx)
    # raw tag spans with attr filter
    q_a = r.tag_spans("q", {"speaker": "a"})
    assert _rows(q_a) == [(hash64("d0"), 0, 3)]
    assert r.tag_spans("q").num_rows == 3
    assert r.tag_spans("ne", {"type": "loc"}).num_rows == 1
    # CQL: 'beta gamma' within <q speaker="b"/> — d0's speaker-b q is
    # [2,4) (no beta gamma); d1's is [0,2) which contains it
    got = _rows(cql_spans(r, '"beta" "gamma" within <q speaker="b"/>'))
    assert got == [(hash64("d1"), 0, 2)]
    # without the attribute both docs' q spans count
    got_all = _rows(cql_spans(r, '"beta" "gamma" within <q/>'))
    assert got_all == [(hash64("d0"), 1, 3), (hash64("d1"), 0, 2)]
    # unknown tag name → empty spans, not an error (tag column exists)
    assert cql_spans(r, '"beta" within <nope/>').num_rows == 0


def test_sequence_group_capture(reader, small_oracle):
    """A:("x" "y") captures the SUB-SPAN of the group
    (SpanQueryCaptureGroup over a multi-token clause): hit rows gain
    {A}_start / {A}_end columns covering the group's tokens."""
    import collections
    follow = collections.Counter()
    for toks in small_oracle.docs.values():
        for x, y in zip(toks, toks[1:]):
            if x == "the":
                follow[y] += 1
    nxt = follow.most_common(1)[0][0]
    t = cql_spans(reader, f'A:("the" "{nxt}") [word="w0.*"]'
                  .replace("w0.*", "w000.."))
    assert {"A_start", "A_end"} <= set(t.column_names)
    for s, a_s, a_e, e in zip(t["start"].to_pylist(),
                              t["A_start"].to_pylist(),
                              t["A_end"].to_pylist(),
                              t["end"].to_pylist()):
        assert a_s == s and a_e == s + 2 and e == s + 3
    # brute check of the full matches
    exp = _brute_seq_spans(small_oracle.docs, ["the", nxt, "w000.."],
                           [(0, 0), (0, 0)])
    got = _rows(t)
    assert got == exp
    # plain (uncaptured) sequence groups parse and run identically
    t2 = cql_spans(reader, f'("the" "{nxt}") [word="w000.."]')
    assert _rows(t2) == exp
    # group capture composes with a gap inside the group
    t3 = cql_spans(reader, f'B:("the" []? "{nxt}")')
    assert {"B_start", "B_end"} <= set(t3.column_names)
    for s, b_s, b_e, e in zip(t3["start"].to_pylist(),
                              t3["B_start"].to_pylist(),
                              t3["B_end"].to_pylist(),
                              t3["end"].to_pylist()):
        assert b_s == s and b_e == e
    with pytest.raises(ValueError, match="nested"):
        parse_cql('A:(("x") "y")')
    with pytest.raises(ValueError, match="repetition inside"):
        parse_cql('("x" "y"{2})')


def test_constraint_literal_comparison(reader, small_oracle):
    """MatchFilterEquals with a string-constant operand
    (matchfilter/MatchFilterString.java semantics)."""
    t = cql_spans(reader, 'A:[word="th.*"] :: A.word = "the"')
    t_the = cql_spans(reader, '"the"')
    assert sorted(zip(t["doc_id"].to_pylist(), t["start"].to_pylist())) \
        == sorted(zip(t_the["doc_id"].to_pylist(),
                      t_the["start"].to_pylist()))
    # reversed operand order works too
    t2 = cql_spans(reader, 'A:[word="th.*"] :: "the" = A.word')
    assert t2.num_rows == t.num_rows


def test_constraint_boolean_algebra(reader):
    """and/or/not/implication over comparisons
    (MatchFilterAnd/Or/Not/Implication)."""
    base = 'A:[word="th.*"] B:[word="th.*"]'
    t_eq = cql_spans(reader, f'{base} :: A.word = B.word')
    t_ne = cql_spans(reader, f'{base} :: A.word != B.word')
    t_all = cql_spans(reader, base)
    n = t_all.num_rows
    assert t_eq.num_rows + t_ne.num_rows == n
    # ! distributes: !(A = B) == A != B
    t_not = cql_spans(reader, f'{base} :: !(A.word = B.word)')
    assert t_not.num_rows == t_ne.num_rows
    # or of complementary halves covers everything
    t_or = cql_spans(reader,
                     f'{base} :: A.word = B.word | A.word != B.word')
    assert t_or.num_rows == n
    # and with a literal narrows
    t_and = cql_spans(reader,
                      f'{base} :: A.word = B.word & A.word = "the"')
    assert t_and.num_rows <= t_eq.num_rows
    # implication == !a | b
    t_imp = cql_spans(reader,
                      f'{base} :: A.word = "the" -> B.word = "the"')
    t_equiv = cql_spans(
        reader, f'{base} :: !(A.word = "the") | B.word = "the"')
    assert t_imp.num_rows == t_equiv.num_rows
    # precedence: & binds tighter than |
    t_prec = cql_spans(
        reader,
        f'{base} :: A.word = "the" & A.word != "the" | A.word = B.word')
    assert t_prec.num_rows == t_eq.num_rows


def test_constraint_annotation_operands(ray_session, tmp_path):
    """`A.lemma = B.lemma` constraints gather the lemma annotation's
    forward index (MatchFilterTokenAnnotation)."""
    from blacklab_ray.formats import read_pages
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader
    from blacklab_ray.stages.tokenize import hash64
    docs = {
        "d1": [("cats", "cat"), ("and", "and"), ("cat", "cat")],
        "d2": [("cat", "cat"), ("and", "and"), ("dogs", "dog")],
        "d3": [("runs", "run"), ("and", "and"), ("ran", "run")],
    }
    lines = ["url\tpos\tword\tlemma"]
    for url, toks in docs.items():
        for i, (w, le) in enumerate(toks):
            lines.append(f"{url}\t{i}\t{w}\t{le}")
    tsv = tmp_path / "c.tsv"
    tsv.write_text("\n".join(lines) + "\n")
    idx = str(tmp_path / "idx")
    build_index(read_pages("tabular-tsv", str(tsv)), idx,
                BuildParams(num_buckets=2, n_salts=1,
                            annotations=("lemma",)))
    r = IndexReader(idx)
    t = cql_spans(r, 'A:[] "and" B:[] :: A.lemma = B.lemma')
    assert sorted(t["doc_id"].to_pylist()) == \
        sorted([hash64("d1"), hash64("d3")])
    t2 = cql_spans(r, 'A:[] "and" B:[] :: A.lemma != B.lemma')
    assert t2["doc_id"].to_pylist() == [hash64("d2")]
    # annotation vs literal
    t3 = cql_spans(r, 'A:[] "and" B:[] :: A.lemma = "cat"')
    assert sorted(t3["doc_id"].to_pylist()) == \
        sorted([hash64("d1"), hash64("d2")])
    # unknown annotation errors clearly
    with pytest.raises(FileNotFoundError, match="annotation"):
        cql_spans(r, 'A:[] "and" B:[] :: A.pos = B.pos')


def test_quantifiers_and_group_repetition(ray_session, tmp_path):
    """`+`/`*`/`{n,}` quantifiers (EXACT unbounded forms, r4) and
    repetition of multi-token groups, cross-checked against a brute
    regex matcher over the token streams."""
    import re as _re

    import pyarrow as pa
    import pyarrow.parquet as pq

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.stages.tokenize import hash64

    texts = ["a b a b c", "x a b y", "a a b b", "a a a a a b",
             "c a b a b a b c",
             # run FAR past the old UNBOUNDED_REP_CAP=4 lowering —
             # exactness means these 12-deep runs must all match
             "a a a a a a a a a a a a b"]
    pages = tmp_path / "p"
    pages.mkdir()
    pq.write_table(pa.table({
        "url": [f"u{i}" for i in range(len(texts))],
        "warc_ts": pa.nulls(len(texts), pa.timestamp("us")),
        "html": [t.encode() for t in texts],
        "text": texts, "lang": ["en"] * len(texts)}),
        str(pages / "0.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(pages), idx,
                BuildParams(num_buckets=2, n_salts=1,
                            analyzer="whitespace"))
    r = IndexReader(idx)

    def brute(tok_regex):
        """All (doc, start, end) where the concatenated tokens match
        tok_regex (tokens here are single chars)."""
        out = set()
        for i, t in enumerate(texts):
            toks = t.split()
            for s in range(len(toks)):
                for e in range(s + 1, len(toks) + 1):
                    if _re.fullmatch(tok_regex, "".join(toks[s:e])):
                        out.add((hash64(f"u{i}"), s, e))
        return out

    cases = [
        ('("a" "b"){2}', "(ab){2}"),
        ('("a" "b")+', "(ab)+"),
        ('("a" "b")*  "c"', "(ab)*c"),
        ('"a"+ "b"', "a+b"),
        ('"a"* "b"', "a*b"),
        ('"a"{2,}', "a{2,}"),
        ('"a"{3,} "b"', "a{3,}b"),
        ('("a" "b"){0,1} "c"', "(ab)?c"),
        # negated near-universal units take the ANCHORED run
        # enumeration (r4: end/start anchors from the abutting
        # element collapse the O(run^2) closure)
        ('[word != "c"]+ "b"', "[^c]+b"),
        ('"b" [word != "c"]+', "b[^c]+"),
        ('[word != "c"]{2,} "b"', "[^c]{2,}b"),
        ('[word != "c"]+', "[^c]+"),
    ]
    for q, rx in cases:
        tb = cql_spans(r, q)
        got = set(zip(tb["doc_id"].to_pylist(),
                      tb["start"].to_pylist(), tb["end"].to_pylist()))
        exp = brute(rx)
        assert got == exp, (q, sorted(got), sorted(exp))

    # a capture on a repeated group spans the WHOLE repetition
    # (TestSearches.testNGramsNotContaining's group:('aap')+ shape)
    tb = cql_spans(r, 'A:("a" "b"){2}')
    plain = cql_spans(r, '("a" "b"){2}')
    assert set(zip(tb["doc_id"].to_pylist(), tb["start"].to_pylist(),
                   tb["end"].to_pylist())) == \
        set(zip(plain["doc_id"].to_pylist(),
                plain["start"].to_pylist(), plain["end"].to_pylist()))
    assert tb["A_start"].to_pylist() == tb["start"].to_pylist()
    assert tb["A_end"].to_pylist() == tb["end"].to_pylist()
    # true repetition of an INNER capture stays out of subset
    with pytest.raises(ValueError, match="repeated groups"):
        cql_spans(r, '(A:"a" "b"){2}')


def test_boolean_token_expressions(ray_session, tmp_path):
    """Boolean token-constraint bodies — `[a="x" | b="y"]`, parens,
    `!(...)` (CorpusQL boolean token expressions) — lower to the
    subset via DNF and match like the reference's TextPatternOr/
    And/Not inside one position. Overlapping alternatives dedup."""
    from blacklab_ray.formats import read_pages
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader
    from blacklab_ray.stages.tokenize import hash64
    docs = {
        "d1": [("cats", "cat"), ("and", "and"), ("cat", "cat")],
        "d2": [("cat", "cat"), ("and", "and"), ("dogs", "dog")],
        "d3": [("runs", "run"), ("and", "and"), ("ran", "run")],
    }
    lines = ["url\tpos\tword\tlemma"]
    for url, toks in docs.items():
        for i, (w, le) in enumerate(toks):
            lines.append(f"{url}\t{i}\t{w}\t{le}")
    tsv = tmp_path / "c.tsv"
    tsv.write_text("\n".join(lines) + "\n")
    idx = str(tmp_path / "idx")
    build_index(read_pages("tabular-tsv", str(tsv)), idx,
                BuildParams(num_buckets=2, n_salts=1,
                            annotations=("lemma",)))
    r = IndexReader(idx)
    d1, d2, d3 = hash64("d1"), hash64("d2"), hash64("d3")

    def spans(q):
        t = cql_spans(r, q)
        return sorted(zip(t["doc_id"].to_pylist(),
                          t["start"].to_pylist()))

    # cross-annotation disjunction
    assert spans('[word="cat" | lemma="run"]') == \
        sorted([(d1, 2), (d2, 0), (d3, 0), (d3, 2)])
    # overlapping alternatives dedup (d1:0 matches BOTH tests)
    assert spans('[word="cats" | lemma="cat"]') == \
        sorted([(d1, 0), (d1, 2), (d2, 0)])
    # parenthesized disjunction conjoined with a test
    assert spans('[(word="cat" | word="cats") & lemma="cat"]') == \
        sorted([(d1, 0), (d1, 2), (d2, 0)])
    # negated group (De Morgan into negative conjunction)
    assert spans('[!(lemma="cat" | lemma="and")]') == \
        sorted([(d2, 2), (d3, 0), (d3, 2)])
    # inside a sequence
    assert spans('"and" [word="dogs" | word="ran"]') == \
        sorted([(d2, 1), (d3, 1)])
    # malformed expression errors clearly
    with pytest.raises(ValueError):
        cql_spans(r, '[word="a" | ]')
    # user-written heterogeneous groups (previously the non-word
    # alternative was silently corrupted via str() of its tuple)
    assert spans('([word="cat"] | [lemma="run"])') == \
        sorted([(d1, 2), (d2, 0), (d3, 0), (d3, 2)])
    # negated member in a group
    assert spans('"and" ([word="dogs"] | [word!="cat"])') == \
        sorted([(d2, 1), (d3, 1)])
    # constraint suffix composes with boolean-bracket expansion
    t = cql_spans(r, 'A:[word="cats" | lemma="run"] "and"'
                     ' :: A.lemma = "cat"')
    assert sorted(zip(t["doc_id"].to_pylist(),
                      t["start"].to_pylist())) == [(d1, 0)]
    # REGEX values keep regex semantics in non-first conjunct tests
    # (the multitest lowering routes them through constraints, which
    # compare literally for user `::` expressions)
    assert spans('[lemma="cat" & word="ca.*"]') == \
        sorted([(d1, 0), (d1, 2), (d2, 0)])
    assert spans('[lemma="cat" & word!="ca.*"]') == []
    # user `::` constraints still compare literally — a regex-looking
    # literal does NOT match (MatchFilterString semantics)
    t = cql_spans(r, 'A:[] "and" :: A.word = "ca.*"')
    assert t.num_rows == 0
    # query-level '&' (SpanQueryAnd: same doc+start+end): lemma cat
    # AND word cat — excludes 'cats' (word differs)
    assert spans('[lemma="cat"] & [word="cat"]') == \
        sorted([(d1, 2), (d2, 0)])
    # sequence & sequence: identical two-token windows only
    assert spans('"and" [word="ca.*"] & [lemma="and"] [lemma="cat"]') \
        == [(d1, 1)]
    # right-associative mixed ops: a & (b | c)
    assert spans('[lemma="run"] & "runs" | "ran"') == \
        sorted([(d3, 0), (d3, 2)])
    # implication is a constraint-only operator
    with pytest.raises(ValueError, match="global constraints"):
        cql_spans(r, '"a" -> "b"')


def test_edge_anchored_tags(ray_session, tmp_path):
    """`<p> X` / `X </p>` edge anchors (tag() production →
    TextPatternEdge): X constrained to start at a tag start / end at
    a tag end."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.stages.tokenize import hash64
    texts = [
        "alpha beta\ngamma delta",   # p1: alpha beta | p2: gamma delta
        "alpha beta gamma\ndelta",   # p1: alpha beta gamma | p2: delta
    ]
    pages = pa.table({
        "url": pa.array(["d0", "d1"], pa.string()),
        "warc_ts": pa.array([0, 0], pa.timestamp("us")),
        "html": pa.array([t.encode() for t in texts], pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
    })
    src = tmp_path / "p"
    src.mkdir()
    pq.write_table(pages, str(src / "x.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx,
                BuildParams(num_buckets=2, n_salts=1,
                            paragraph_spans=True))
    r = IndexReader(idx)
    d0, d1 = hash64("d0"), hash64("d1")

    def spans(q):
        t = cql_spans(r, q)
        return sorted(zip(t["doc_id"].to_pylist(),
                          t["start"].to_pylist(),
                          t["end"].to_pylist()))

    # gamma at a paragraph START: only d0 (p2 starts at gamma)
    assert spans('<p> "gamma"') == [(d0, 2, 3)]
    # beta at a paragraph END: only d0 (p1 = alpha beta)
    assert spans('"beta" </p>') == [(d0, 1, 2)]
    # exactly a whole paragraph
    assert spans('<p> "alpha" "beta" </p>') == [(d0, 0, 2)]
    assert spans('<p> "gamma" "delta" </p>') == [(d0, 2, 4)]
    # anchors compose with unions/sequences inside
    assert spans('<p> ("gamma" | "delta")') == [(d0, 2, 3),
                                                (d1, 3, 4)]
    # anchors bind at the SEQUENCE level (cql.jj simpleQuery :=
    # sequence [booleanOperator simpleQuery]): a top-level '|' branch
    # without the tag is NOT anchored — every delta hit survives
    assert spans('<p> "gamma" | "delta"') == [(d0, 2, 3), (d0, 3, 4),
                                              (d1, 3, 4)]
    # ...and on the right-hand branch of '&'
    assert spans('"gamma" & <p> "gamma"') == [(d0, 2, 3)]
    # mid-sequence edges are a clear error
    with pytest.raises(ValueError, match="start/end"):
        cql_spans(r, '"alpha" <p> "beta"')


def test_single_quoted_strings(reader, small_oracle):
    """Single-quoted strings parse like double-quoted ones
    (CorpusQueryLanguageParser allowSingleQuotes default)."""
    a = _rows(cql_spans(reader, '"the" "the"'))
    assert _rows(cql_spans(reader, "'the' 'the'")) == a
    assert _rows(cql_spans(reader, "[word='the'] \"the\"")) == a
    with pytest.raises(ValueError, match="unterminated"):
        cql_spans(reader, "'the")


def test_numeric_capture_labels(reader):
    """captureLabel accepts NUMBER (GeneratedCorpusQueryLanguage-
    Parser.java:594): `1:"the"` captures under the name '1'."""
    t = cql_spans(reader, '1:"the" "the"')
    assert "1_pos" in t.column_names
    assert t["1_pos"].to_pylist() == t["start"].to_pylist()


def test_numeric_capture_on_multitest(reader):
    """Numeric labels also work on multi-test brackets (the
    _MULTITEST_RE cap group must match the tokenizer's label set)."""
    a = cql_spans(reader, '2:[word="the" & word="th.*"] "the"')
    b = cql_spans(reader, 'A:[word="the" & word="th.*"] "the"')
    assert "2_pos" in a.column_names
    assert a["2_pos"].to_pylist() == b["A_pos"].to_pylist()


def test_regex_char_class_with_bool_metachars(reader, small_oracle):
    """A quoted regex whose character class contains '|', '(' or '!'
    is a TERM, not a boolean token expression — the bracket scan must
    be quote-aware (r4 session-14 regression)."""
    base = _rows(cql_spans(reader, '"the"'))
    assert _rows(cql_spans(reader, '"th[e|e]"')) == base
    assert _rows(cql_spans(reader, '[word="th[e|e]"]')) == base
    # char class inside a :: constraint literal parses (no bogus
    # boolean-body error); MatchFilterEquals is a LITERAL compare so
    # it matches nothing here
    t = cql_spans(reader, '(A:"the") (B:"the") :: A.word = "th[e!(]"')
    assert t.num_rows == 0
    # a regex char class in a multitest conjunct (regex semantics)
    got = _rows(cql_spans(reader, '[word="the" & word="th[e|e]"]'))
    assert got == base
    # regex metachars that can't match anything real still parse
    assert cql_spans(reader, '"x[(]y"').num_rows == 0


def test_query_functions_fi(reader, small_oracle):
    """`_FI1(a, b)` / `_FI2(a, b)` (cql.jj:386 queryFunctionCall →
    TextPatternQueryFunction): forward-index-strategy hints whose
    matches equal the plain sequence `a b`."""
    base = _rows(cql_spans(reader, '"the" "the"'))
    assert _rows(cql_spans(reader, '_FI1("the", "the")')) == base
    assert _rows(cql_spans(reader, '_FI2("the", "the")')) == base
    # nested + multi-token args
    assert _rows(cql_spans(reader, '_FI1(_FI2("the", "the"), [])')) \
        == _rows(cql_spans(reader, '"the" "the" []'))
    # reference-parity errors: non-underscore name, unknown name, arity
    with pytest.raises(ValueError, match="must start with '_'"):
        cql_spans(reader, 'foo("a", "b")')
    with pytest.raises(ValueError, match="unsupported query function"):
        cql_spans(reader, '_NFA("a", "b")')
    with pytest.raises(ValueError, match="two arguments"):
        cql_spans(reader, '_FI1("a")')
    # 'containing (' is the operator, not a function call
    n = cql_spans(reader, '"the" []{0,3} "the" containing ("the")')
    assert n.num_rows > 0


def test_parenthesized_filter_groups(ray_session, tmp_path):
    """`("a" within <s/>) | "b"` — sequencePart := "(" complexQuery
    ")" (cql.jj:351) admits within/containing inside parens; the
    group executes as a nested FilterPlan branch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from blacklab_ray.index import BuildParams, build_index
    texts = ["alpha beta\ngamma delta", "alpha beta gamma\ndelta"]
    pq.write_table(pa.table({
        "url": ["d0", "d1"],
        "text": texts, "lang": ["en", "en"]}),
        str(tmp_path / "x.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path), idx,
                BuildParams(num_buckets=2, n_salts=1,
                            paragraph_spans=True))
    r = IndexReader(idx)

    def rows(q):
        return _rows(cql_spans(r, q))

    manual = sorted(set(rows('"beta" "gamma" within <p/>')
                        + rows('"delta"')))
    assert rows('("beta" "gamma" within <p/>) | "delta"') == manual
    assert rows('("beta" "gamma" within <p/>)') \
        == rows('"beta" "gamma" within <p/>')
    # nested as the FILTER operand too: alpha..delta windows contain
    # gamma in both docs, so every beta inside such a window matches
    assert rows('"beta" within ("alpha" []{0,3} "delta" '
                'containing "gamma")') == rows('"beta"')
    # sequencing a filtered group with TERM positions is a clear
    # subset error; any-token neighbours lower to expansion
    with pytest.raises(ValueError, match="out of subset"):
        cql_spans(r, '("beta" within <p/>) "gamma"')
    exp = rows('"beta" within <p/>')
    got = rows('[] ("beta" within <p/>)')
    assert got == sorted(set((d, s - 1, e) for d, s, e in exp
                             if s >= 1))


def test_query_function_filter_args(reader):
    """A _FI arg containing a depth-0 within/containing is
    parenthesized by the lowering, surfacing the filtered-group
    subset rule instead of SILENTLY regrouping — previously
    '_FI1("a", "b" within <s/>)' lowered to '"a" "b" within <s/>',
    which filters the two-token sequence instead of just "b"."""
    # a trailing any-token next to the parenthesized filtered group
    # now lowers to right-expansion of the group's spans
    base = _rows(cql_spans(reader,
                           '"the" within "the" []{0,4} "the"'))
    lens = {int(i): int(n) for i, n in zip(
        *[np.unique([d for d, _s, _e in base]),
          reader.doc_lens(np.unique(
              [d for d, _s, _e in base]).astype(np.int64))])}
    exp = sorted({(d, s, e + 1) for d, s, e in base
                  if e + 1 <= lens[int(d)]})
    got = _rows(cql_spans(reader,
                          '_FI1("the" within "the" []{0,4} "the", [])'))
    assert got == exp
    # sequencing with TERM positions stays out of subset
    with pytest.raises(ValueError, match="out of subset"):
        cql_spans(reader, '_FI1("the", "the" within "the" "the")')
    # a filtered group as the WHOLE query still works through _FI
    # lowering when it is the only element
    a = _rows(cql_spans(reader, '("the" within "the" []{0,4} "the")'))
    assert a == _rows(cql_spans(reader,
                                '"the" within "the" []{0,4} "the"'))


def test_constraint_equality_insensitive(reader):
    """MatchFilterEquals compares with MatchSensitivity.INSENSITIVE
    (cql.jj:147): literal case/diacritics don't matter."""
    base = cql_spans(reader, '(A:"the") (B:"the") :: A.word = "the"')
    cap = cql_spans(reader, '(A:"the") (B:"the") :: A.word = "The"')
    assert cap.num_rows == base.num_rows > 0
    neq = cql_spans(reader, '(A:"the") (B:"the") :: A.word != "THE"')
    assert neq.num_rows == 0
    # annot-vs-annot compare folds both sides
    both = cql_spans(reader, '(A:"the") (B:"the") :: A.word = B.word')
    assert both.num_rows == base.num_rows


def test_captured_range_repetition_consistent_columns(reader):
    """A capture over a multi-count range (A:('x'){1,2}) uses ONE
    column shape (A_start/A_end) for every count — a mixed A_pos/
    A_start union would leave -1 sentinels masquerading as 'capture
    unset' on the multi-count hits (review finding, session 15)."""
    t = cql_spans(reader, 'A:("the"){1,2}')
    assert "A_start" in t.column_names and "A_end" in t.column_names
    assert "A_pos" not in t.column_names
    # every row carries a real captured range
    assert (t["A_start"].to_numpy() >= 0).all()
    assert (t["A_end"].to_numpy() > t["A_start"].to_numpy()).all()
    # the degenerate {1,1} keeps the constraint-friendly single
    # capture
    t1 = cql_spans(reader, 'A:("the"){1,1}')
    assert "A_pos" in t1.column_names


def test_mixed_sensitivity_flags_rejected(reader):
    """A (?-i) flag on one alternation branch must not silently force
    the other branches sensitive (TextPatternRegex binds flags per
    clause) — mixed flags are refused."""
    # ('(?-i)the' | 'of'): separate quoted terms in a group
    # alternation collapse into ONE position — mixed flags refused
    with pytest.raises(ValueError, match="mixed"):
        cql_spans(reader, '("(?-i)the" | "of")')
    # uniformly-flagged group alternations parse to ONE sensitive
    # position (execution over a sensitive index is covered by
    # test_searches_parity.test_simple's '(?-i)the'); a flag inside
    # one REGEX source ('(?-i)the|of') applies to the whole regex,
    # exactly like TextPatternRegex
    p = parse_cql('("(?-i)the" | "(?-i)of")')
    assert p.positions[0].sensitivity == "s"
    assert set((p.positions[0].pattern, *p.positions[0].alts)) == \
        {"the", "of"}


# ---- result-budget clamp (stoppedRetrieving semantics) --------------------


class TestSpanBudget:
    """cql_spans_budgeted bounds output-bound shapes (all-negative
    complements, anchorless windows, unbounded gaps) and flags the
    clamp — the engine-side maxHitsToProcess."""

    def test_exact_when_under_limit(self, reader):
        from blacklab_ray.query.cql import cql_spans_budgeted
        full = cql_spans(reader, '"the"')
        got, stopped = cql_spans_budgeted(reader, '"the"',
                                          full.num_rows + 10)
        assert not stopped
        assert _rows(got) == _rows(full)

    def test_all_negative_clamps(self, reader):
        from blacklab_ray.query.cql import cql_spans_budgeted
        q = '[word!="zzzznotaword"]'
        full = cql_spans(reader, q)
        assert full.num_rows > 20
        got, stopped = cql_spans_budgeted(reader, q, 20)
        assert stopped and 0 < got.num_rows <= 20
        # every clamped row is a REAL match
        assert set(_rows(got)) <= set(_rows(full))

    def test_anchorless_windows_clamp(self, reader):
        from blacklab_ray.query.cql import cql_spans_budgeted
        full = cql_spans(reader, '[]{1,2}')
        got, stopped = cql_spans_budgeted(reader, '[]{1,2}', 15)
        assert stopped and 0 < got.num_rows <= 15
        assert set(_rows(got)) <= set(_rows(full))

    def test_negative_unbounded_gap_clamps(self, reader):
        """The fuzz log's O(L^2) shape: all-negative + unbounded gap."""
        from blacklab_ray.query.cql import cql_spans_budgeted
        q = '[word!="qqq"] []{0,} [word!="rrr"]'
        full = cql_spans(reader, q)
        got, stopped = cql_spans_budgeted(reader, q, 25)
        assert stopped and 0 < got.num_rows <= 25
        assert set(_rows(got)) <= set(_rows(full))

    def test_budget_does_not_leak(self, reader):
        """After a budgeted call the plain path is uncapped again."""
        from blacklab_ray.query.cql import cql_spans_budgeted
        cql_spans_budgeted(reader, '[]{1,2}', 5)
        full = cql_spans(reader, '[]{1,2}')
        assert full.num_rows > 5
