"""Sequence packing (blacklab_ray/pipelines/packing.py): the
distributed two-pass prefix sum vs a DuckDB window-function oracle,
plus the edges the bucket math has to survive (sparse ids, empty docs,
single-bucket and many-bucket configurations)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from blacklab_ray.pipelines.packing import pack_sequences, token_counts

SEQ_LEN = 7


def _oracle(df: pd.DataFrame, seq_len: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", df)
    return con.sql(f"""
WITH t AS (SELECT doc_id,
                  length(regexp_extract_all(lower(strip_accents(text)),
                                            '[a-z0-9]+'))::BIGINT
                      AS n_tokens
           FROM documents),
c AS (SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0)::BIGINT AS start_pos
      FROM t)
SELECT doc_id, n_tokens, start_pos,
       (start_pos // {seq_len})::BIGINT AS first_seq,
       CASE WHEN n_tokens > 0
            THEN ((start_pos + n_tokens - 1) // {seq_len})::BIGINT
       END AS last_seq
FROM c ORDER BY doc_id
""").df()


def _corpus(rng: np.random.Generator, n: int, sparse: bool) -> pd.DataFrame:
    words = ["alpha", "beta", "gamma", "delta", "x1", "the", ""]
    ids = np.arange(n, dtype=np.int64)
    if sparse:
        ids = np.sort(rng.choice(10 * n, size=n, replace=False)
                      .astype(np.int64)) + 1_000_000
    texts = [" ".join(rng.choice(words, size=int(rng.integers(0, 9))))
             for _ in range(n)]
    return pd.DataFrame({"doc_id": ids, "text": texts})


@pytest.mark.parametrize("sparse,rows_per_bucket", [
    (False, 8),      # many buckets, dense ids
    (True, 8),       # many buckets, sparse non-zero-based ids
    (False, 10**9),  # single bucket (pure in-group cumsum)
])
def test_pack_sequences_oracle(ray_session, sparse, rows_per_bucket):
    df = _corpus(np.random.default_rng(5), 120, sparse)
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    got = pack_sequences(ds, SEQ_LEN, rows_per_bucket=rows_per_bucket) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    ora = _oracle(df, SEQ_LEN)
    pd.testing.assert_frame_equal(
        got[ora.columns].astype({"last_seq": "float64"}),
        ora.astype({"last_seq": "float64"}), check_dtype=False)


def test_pack_sequences_empty_docs_get_null_last_seq(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["one two three", "", "four"]})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    got = pack_sequences(ds, 2).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert got["start_pos"].tolist() == [0, 3, 3]
    assert got["first_seq"].tolist() == [0, 1, 1]
    assert got["last_seq"][0] == 1
    assert pd.isna(got["last_seq"][1])  # empty doc covers no sequence
    assert got["last_seq"][2] == 1


def test_token_counts_matches_analyzer(ray_session):
    from blacklab_ray.analysis.analyzers import tokenize_column
    texts = ["Hello, World! 42", "  ", "élan café", "a-b_c"]
    col = pa.array(texts)
    _, _, _, lens = tokenize_column(col)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": col}))
    got = token_counts(ds).to_pandas().sort_values("doc_id")
    assert got["n_tokens"].tolist() == list(lens)


def test_token_counts_null_text_is_zero(ray_session):
    """A NULL text row counts 0 tokens (matching tokenize_column) —
    an unfilled null became NaN in to_numpy and silently poisoned the
    prefix-sum cumsum (code-review finding)."""
    import pandas as pd

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["one two", None, "three"]})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    got = token_counts(ds).to_pandas().sort_values("doc_id")
    assert got["n_tokens"].tolist() == [2, 0, 1]
    packed = pack_sequences(ds, 2).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert packed["start_pos"].tolist() == [0, 2, 2]
