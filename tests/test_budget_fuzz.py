"""Budget-property fuzz: for random grammar queries,
cql_spans_budgeted must (a) equal cql_spans exactly when the budget
fits, (b) return a SUBSET of the true result within the limit when it
clamps, flagging stopped=True."""

import numpy as np
import pytest

from blacklab_ray.query import IndexReader
from blacklab_ray.query.cql import cql_spans, cql_spans_budgeted
from tests.test_cql_fuzz import _rand_query


@pytest.fixture(scope="module")
def reader(small_index):
    return IndexReader(small_index)


def _rows(t):
    return set(zip(t["doc_id"].to_pylist(), t["start"].to_pylist(),
                   t["end"].to_pylist()))


def test_budget_fuzz_subset_property(reader, small_oracle):
    rng = np.random.default_rng(1234)
    df = small_oracle.doc_freq()
    vocab = sorted(df, key=df.get, reverse=True)[:40]
    checked_exact = checked_clamped = 0
    for _ in range(60):
        q = _rand_query(rng, vocab)
        try:
            full = cql_spans(reader, q)
        except ValueError:
            continue
        want = _rows(full)
        # budget far above any intermediate: exact equality, no flag
        got, stopped = cql_spans_budgeted(reader, q, 10_000_000)
        assert not stopped, q
        assert _rows(got) == want, q
        checked_exact += 1
        if full.num_rows > 10:
            # tight budget: a SUBSET within the limit, flagged.
            # (The clamp may bind on an INNER output-bound operand —
            # e.g. an all-negative side of '&' — so fewer than `lim`
            # final rows is legal; stopped=True is the honest signal
            # that results may be incomplete.)
            lim = max(1, full.num_rows // 3)
            got, stopped = cql_spans_budgeted(reader, q, lim)
            assert stopped, q
            assert got.num_rows <= lim, q
            assert _rows(got) <= want, q
            checked_clamped += 1
    assert checked_exact >= 30 and checked_clamped >= 15, \
        (checked_exact, checked_clamped)
