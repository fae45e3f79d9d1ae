"""Span algebra tests: brute-force oracles over tiny span sets plus
sequence_spans vs a loop-based scan of the corpus."""

import numpy as np
import pytest

from blacklab_ray.query.spans import (
    expand_spans, sequence_spans, span_table, spans_containing,
    spans_edge, spans_not_containing, spans_not_within, spans_within,
    unique_spans,
)


def _rows(t):
    return sorted(zip(t["doc_id"].to_pylist(), t["start"].to_pylist(),
                      t["end"].to_pylist()))


def _brute_within(a_rows, b_rows):
    return sorted(x for x in a_rows
                  if any(bd == x[0] and bs <= x[1] and x[2] <= be
                         for bd, bs, be in b_rows))


def _brute_containing(a_rows, b_rows):
    return sorted(x for x in a_rows
                  if any(bd == x[0] and x[1] <= bs and be <= x[2]
                         for bd, bs, be in b_rows))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_within_containing_random(seed):
    rng = np.random.default_rng(seed)

    def rand_spans(n):
        d = rng.integers(0, 5, size=n)
        s = rng.integers(0, 40, size=n)
        ln = rng.integers(1, 8, size=n)
        return span_table(d, s, s + ln)

    a, b = rand_spans(60), rand_spans(25)
    ar, br = _rows(a), _rows(b)
    assert _rows(spans_within(a, b)) == _brute_within(ar, br)
    assert _rows(spans_containing(a, b)) == _brute_containing(ar, br)
    got_nw = _rows(spans_not_within(a, b))
    assert sorted(got_nw + _brute_within(ar, br)) == sorted(ar)
    got_nc = _rows(spans_not_containing(a, b))
    assert sorted(got_nc + _brute_containing(ar, br)) == sorted(ar)


def test_unique_edge_expand():
    t = span_table([1, 1, 1, 2], [3, 3, 5, 0], [6, 6, 8, 2])
    u = unique_spans(t)
    assert _rows(u) == [(1, 3, 6), (1, 5, 8), (2, 0, 2)]
    e = spans_edge(u)
    assert _rows(e) == [(1, 3, 3), (1, 5, 5), (2, 0, 0)]
    x = expand_spans(u, left=(1, 1), right=(2, 2),
                     doc_lens={1: 9, 2: 100})
    assert _rows(x) == [(1, 2, 8), (1, 4, 9), (2, 0, 4)]


def test_sequence_spans_vs_scan(small_index, small_oracle):
    from blacklab_ray.query import IndexReader
    reader = IndexReader(small_index)
    import collections
    follow = collections.Counter()
    for toks in small_oracle.docs.values():
        for x, y in zip(toks, toks[1:]):
            if x == "the":
                follow[y] += 1
    nxt = follow.most_common(1)[0][0]
    spans = sequence_spans(reader, ["the", nxt])
    exp = []
    for did, toks in small_oracle.docs.items():
        for i in range(len(toks) - 1):
            if toks[i] == "the" and toks[i + 1] == nxt:
                exp.append((did, i, i + 2))
    assert _rows(spans) == sorted(exp)
    # within: bigram spans inside 'the ... the' windows — cross-check with
    # a brute filter
    the_spans = sequence_spans(reader, ["the"])
    wide = expand_spans(the_spans, left=(0, 0), right=(3, 3))
    got = _rows(spans_within(spans, wide))
    exp_w = _brute_within(_rows(spans), _rows(wide))
    assert got == exp_w


def test_filter_ngrams(ray_session, small_index, small_oracle):
    """SpanQueryFilterNGrams vs a brute n-gram enumeration."""
    from blacklab_ray.query import IndexReader
    from blacklab_ray.query.spans import filter_ngrams, sequence_spans
    r = IndexReader(small_index)
    filt = sequence_spans(r, ["the"])
    got_w = sorted(zip(*[filter_ngrams(r, filt, "within", 1, 1)[c]
                         .to_pylist() for c in ("doc_id", "start",
                                                "end")]))
    # within a width-1 filter span, the only 1-gram is the span itself
    exp_w = sorted(zip(filt["doc_id"].to_pylist(),
                       filt["start"].to_pylist(),
                       filt["end"].to_pylist()))
    assert got_w == exp_w
    got_c = sorted(zip(*[filter_ngrams(r, filt, "containing", 2, 3)[c]
                         .to_pylist() for c in ("doc_id", "start",
                                                "end")]))
    exp_c = set()
    for did, fs, fe in exp_w:
        dl = len(small_oracle.docs[did])
        for L in (2, 3):
            for s2 in range(max(0, fe - L), fs + 1):
                e2 = s2 + L
                if e2 <= dl and s2 <= fs and e2 >= fe:
                    exp_c.add((did, s2, e2))
    assert got_c == sorted(exp_c)
    import pytest as _pt
    with _pt.raises(ValueError):
        filter_ngrams(r, filt, "overlap", 1, 2)
    with _pt.raises(ValueError):
        filter_ngrams(r, filt, "within", 2, 1)


def test_all_negative_query_chunked_universe(ray_session, pangram_index):
    """A purely negative CQL query must produce the identical result
    whether the doc universe is streamed in 1-doc chunks or loaded in
    one piece (VERDICT r2 #7 chunked-complement path)."""
    import numpy as np
    from blacklab_ray.query import IndexReader
    from blacklab_ray.query.spans import sequence_spans_multi

    r = IndexReader(pangram_index)
    whole = sequence_spans_multi(r, [["the"]], negates=[True])
    # force many tiny chunks through the public generator
    chunks = list(r.iter_doc_id_chunks(chunk_docs=1))
    assert len(chunks) >= 2
    parts = [sequence_spans_multi(r, [["the"]], negates=[True],
                                  _cand=c) for c in chunks]
    import pyarrow as pa
    from blacklab_ray.query.spans import unique_spans
    merged = unique_spans(pa.concat_tables(
        [p for p in parts if p.num_rows]))
    assert merged.equals(whole)
    # and the ids streamed equal the materialized universe
    streamed = np.sort(np.concatenate(chunks))
    assert np.array_equal(streamed, np.sort(r.all_doc_ids()))
