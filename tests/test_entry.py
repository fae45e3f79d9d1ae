"""Mini-driver: runs every queries() entry against its oracle_sql() via
DuckDB on the sf0.01 testdata — the same comparison the external driver
performs (row count + schema + order-insensitive values)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as m
    return m


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def _to_pandas(res):
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = np.round(df[c].astype(float), 9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def test_entry_smoke(entry_mod):
    res = _to_pandas(entry_mod.entry())
    assert len(res) >= 0
    assert "doc_id" in res.columns and "score" in res.columns


def test_oracle_keys_subset(entry_mod):
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o <= q, o - q


def test_driver_key_cap(entry_mod):
    """The round-2 driver recorded only the FIRST 50 exported keys
    (events_*/media_features silently dropped from CORRECTNESS_r02) —
    so the FIRST 50 dict positions are the driver-recorded contract.
    Keys past position 50 are deliberate in-repo extras: rotated-out
    or non-recorded operators that test_entry still replays against
    their oracles with the same rigor. Pin the split so a stray
    insertion can't silently push a recorded key past the cap."""
    q = list(entry_mod.queries())
    extras = q[50:]
    assert set(extras) == {"docs_by_lang", "docs_filter", "doc_stats",
                           "mixture_sample", "export_shards",
                           "ppl_buckets", "bpe_fertility",
                           "weighted_sample", "semdedup_pairs",
                           "asof_join", "range_join",
                           "hll_registers", "cm_topk",
                           "dsir_sample", "keyness_ll",
                           "colloc_assoc", "c4_stats",
                           "html_extract", "lsh_probe",
                           "exact_probe", "split_counts",
                           "pagerank_links", "hits_scores",
                           "host_stats", "latest_snapshot",
                           "doc_chunks", "substr_dup",
                           "snapshot_diff", "freq_list",
                           "unigram_fertility"}, extras
    assert "lm_perplexity" in q[:50]   # rotated INTO the recorded set
    o = entry_mod.oracle_sql()
    # extras stay oracled, except declared rows-only ops whose
    # semantics SQL can't express (BPE merge loop); those are
    # brute-reference-verified in their own test files instead
    rows_only = {"bpe_fertility", "unigram_fertility"}
    assert all(k in o for k in set(extras) - rows_only)


def _contract():
    """Import the driver contract WITHOUT Ray running (queries() and
    oracle_sql() only build closures/strings)."""
    import __ray_entry__ as m
    return m


_ORACLED = sorted(_contract().oracle_sql())
_ROWS_ONLY = sorted(set(_contract().queries()) - set(_ORACLED))


@pytest.mark.parametrize("name", _ORACLED)
def test_query_matches_oracle(entry_mod, con, name):
    ray_df = _norm(_to_pandas(entry_mod.queries()[name](SF_DIR)))
    sql_df = _norm(con.sql(entry_mod.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), (
        ray_df.columns, sql_df.columns)
    assert len(ray_df) == len(sql_df), (len(ray_df), len(sql_df))
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False,
                                  check_exact=False, atol=1e-9, rtol=1e-9)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(entry_mod, name):
    df = _to_pandas(entry_mod.queries()[name](SF_DIR))
    assert df is not None and len(df) >= 0


def test_simhash_deterministic(entry_mod):
    # simhash64 now rides the merged "fingerprints" key (50-key cap)
    a = _norm(_to_pandas(entry_mod.queries()["fingerprints"](SF_DIR)))
    b = _norm(_to_pandas(entry_mod.queries()["fingerprints"](SF_DIR)))
    assert "simhash" in a.columns and "fingerprint" in a.columns
    pd.testing.assert_frame_equal(a, b)
