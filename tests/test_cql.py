"""CQL subset parser + executor vs a loop-based scan oracle."""

import re

import numpy as np
import pytest

from blacklab_ray.query import IndexReader
from blacklab_ray.query.cql import FilterPlan, parse_cql, search_cql
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
    with pytest.raises(ValueError):
        parse_cql('[] "a"')
    with pytest.raises(ValueError):
        parse_cql('[lemma="x"]')
    with pytest.raises(ValueError):
        parse_cql('"a"{1,3}')


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
