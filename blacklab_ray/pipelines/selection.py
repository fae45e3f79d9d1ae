"""Data selection via importance resampling (DSIR) and keyness analysis.

Training-data selection operators the reference has no analogue for —
part of the large-scale-pipeline family (SURVEY.md LLM-ops table):

* **DSIR** (Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling", arXiv:2302.03169): estimate hashed-n-gram
  bag-of-words distributions for a small target set and the raw corpus,
  weight every raw doc by its log likelihood ratio, then Gumbel-top-k
  resample — docs that "look like" the target are kept with probability
  proportional to their importance weight.
* **Keyness** (log-likelihood keyword extraction, Dunning 1993 /
  Rayson & Garside 2000): rank terms by how significantly their
  frequency differs between a focus subcorpus and the rest — the
  corpus-linguistics companion to the reference's collocations surface
  (TermFrequencyList.java semantics give the raw counts; keyness is the
  contrastive statistic over two of them).

Scale shape (both): per-batch vectorized folds to type- or
bucket-sized partials, ONE small groupby-sum, driver math on the tiny
aggregate, then a second streaming pass with the model broadcast via
``ray.put`` — no corpus-sized shuffle anywhere. Hashes are md5 low-64
little-endian (== DuckDB ``md5_number_lower``), so every stage is
SQL-reproducible for the driver oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from blacklab_ray.analysis.analyzers import tokenize_column
from blacklab_ray.pipelines.hits import md5_low64

TWO64 = 18446744073709551616.0  # 2^64 as float, the md5-uniform scale


# ---------------------------------------------------------------------------
# hashed n-gram featurization (shared by distribution + weighting passes)
# ---------------------------------------------------------------------------

def _doc_gram_buckets(col: pa.Array | pa.ChunkedArray,
                      n_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """(row_idx, bucket) flat arrays of hashed unigram+bigram features.

    Bigrams are space-joined adjacent analyzed tokens within a row
    (one Arrow ``binary_join_element_wise`` kernel, masked at row
    boundaries). Bucket = ``md5_low64(gram) % n_buckets``; the md5
    loop runs once per DISTINCT gram of the batch (dictionary-encode
    first), not per occurrence.
    """
    parents, toks, _, _ = tokenize_column(col)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n = len(toks)
    if n == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    if n >= 2:
        joined = pc.binary_join_element_wise(
            toks.slice(0, n - 1), toks.slice(1, n), " ")
        same = parents[:-1] == parents[1:]
        bigrams = joined.filter(pa.array(same))
        big_parents = parents[:-1][same]
        grams = pa.concat_arrays([toks, bigrams.combine_chunks()
                                  if isinstance(bigrams, pa.ChunkedArray)
                                  else bigrams])
        gparents = np.concatenate([parents, big_parents])
    else:
        grams, gparents = toks, parents
    from blacklab_ray.util import md5_low64_batch
    d = pc.dictionary_encode(grams)
    uniq = (md5_low64_batch(d.dictionary)
            % n_buckets).astype(np.int64)
    buckets = uniq[d.indices.to_numpy(zero_copy_only=False)]
    return gparents.astype(np.int64), buckets


def dsir_bucket_counts(ds: ray.data.Dataset, target_col: str,
                       target_value, n_buckets: int = 1024,
                       text_col: str = "text") -> tuple[np.ndarray,
                                                        np.ndarray]:
    """One streaming pass → (target_counts, raw_counts), each a dense
    ``n_buckets`` int64 array. Per batch the fold is at most
    ``n_buckets`` rows (nonzero buckets only), so the groupby-sum
    shuffle moves bucket histograms, never grams."""

    def _partial(batch: pa.Table) -> pa.Table:
        gparents, buckets = _doc_gram_buckets(
            batch.column(text_col), n_buckets)
        if gparents.size == 0:
            return pa.schema([("bucket", pa.int64()),
                              ("cnt_target", pa.int64()),
                              ("cnt_raw", pa.int64())]).empty_table()
        is_target = pc.equal(batch.column(target_col),
                             target_value).to_numpy(zero_copy_only=False)
        on_target = is_target[gparents]
        cnt_raw = np.bincount(buckets, minlength=n_buckets)
        cnt_t = np.bincount(buckets[on_target], minlength=n_buckets)
        nz = np.flatnonzero(cnt_raw)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "cnt_target": pa.array(cnt_t[nz], pa.int64()),
                         "cnt_raw": pa.array(cnt_raw[nz], pa.int64())})

    rows = (ds.select_columns([text_col, target_col])
            .map_batches(_partial, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("cnt_target", alias_name="cnt_target"),
                       Sum("cnt_raw", alias_name="cnt_raw"))
            .take_all())  # ≤ n_buckets rows — model-sized, not corpus
    t = np.zeros(n_buckets, np.int64)
    r = np.zeros(n_buckets, np.int64)
    for row in rows:
        t[row["bucket"]] = row["cnt_target"]
        r[row["bucket"]] = row["cnt_raw"]
    return t, r


def dsir_log_ratio(target_counts: np.ndarray, raw_counts: np.ndarray,
                   alpha: float = 0.5) -> np.ndarray:
    """Per-bucket log importance ratio ln(p_target[b] / p_raw[b]) with
    add-``alpha`` smoothing. Written as ``ln(ratio_t) - ln(ratio_r)``
    with each ratio formed BEFORE the log — the exact expression the
    SQL oracle evaluates, so float64 results agree to the ulp."""
    b = float(target_counts.size)
    t_total = float(target_counts.sum())
    r_total = float(raw_counts.sum())
    return (np.log((target_counts + alpha) / (t_total + alpha * b))
            - np.log((raw_counts + alpha) / (r_total + alpha * b)))


def dsir_importance_weights(ds: ray.data.Dataset, target_col: str,
                            target_value, n_buckets: int = 1024,
                            alpha: float = 0.5, text_col: str = "text",
                            id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-doc DSIR log importance weight ``logw = Σ_grams lr[bucket]``.

    Two streaming passes: the bucket histogram (above), then a
    broadcast-model scoring pass — the log-ratio array (8 KiB at
    B=1024) ships once per actor via ``ray.put``, each batch is one
    hash + one ``bincount``. Returns (id, logw, n_grams)."""
    t, r = dsir_bucket_counts(ds, target_col, target_value,
                              n_buckets, text_col)
    lr_ref = ray.put(dsir_log_ratio(t, r, alpha))

    class _Score:
        def __init__(self):
            self._lr = ray.get(lr_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            gparents, buckets = _doc_gram_buckets(
                batch.column(text_col), n_buckets)
            n_rows = batch.num_rows
            logw = np.bincount(gparents, weights=self._lr[buckets],
                               minlength=n_rows)
            n_grams = np.bincount(gparents, minlength=n_rows)
            return pa.table({
                id_col: batch.column(id_col).cast(pa.int64()),
                "logw": pa.array(logw, pa.float64()),
                "n_grams": pa.array(n_grams, pa.int64()),
            })

    return ds.select_columns([id_col, text_col]).map_batches(
        _Score, batch_format="pyarrow", concurrency=(1, 8))


def dsir_select(ds: ray.data.Dataset, target_col: str, target_value,
                k: int, n_buckets: int = 1024, alpha: float = 0.5,
                seed: int = 13, method: str = "gumbel",
                text_col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """Select ``k`` docs by DSIR importance.

    ``method="gumbel"`` is the paper's sampling-without-replacement:
    key = logw + Gumbel noise, where the Gumbel uniform is the seeded
    md5 digest ``(md5_low64(f"{id}:{seed}")+1) / 2^64`` — deterministic,
    partition-order independent, and SQL-reproducible (the
    ``weighted_sample`` digest convention). ``method="topk"`` ranks by
    raw logw (the paper's "top-k heuristic" baseline).

    Scale shape: the per-batch fold keeps only its k best keys, so the
    driver merge sees ≤ k × blocks rows. Returns the k-row table
    (id, logw, key, rank) — result-sized."""
    weights = dsir_importance_weights(ds, target_col, target_value,
                                      n_buckets, alpha, text_col, id_col)

    def _key(ids: np.ndarray, logw: np.ndarray) -> np.ndarray:
        if method == "topk":
            return logw
        from blacklab_ray.util import md5_low64_keyed
        u = md5_low64_keyed(np.asarray(ids, np.int64),
                            seed).astype(np.float64)
        return logw + -np.log(-np.log((u + 1.0) / TWO64))

    def _partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        logw = batch.column("logw").to_numpy(zero_copy_only=False)
        # a doc with no features has no importance weight — defined out
        # of the sample (and out of the SQL oracle's gram join)
        feat = batch.column("n_grams").to_numpy(zero_copy_only=False) > 0
        ids, logw = ids[feat], logw[feat]
        key = _key(ids, logw) if ids.size else np.empty(0, np.float64)
        order = np.lexsort((ids, -key))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "logw": pa.array(logw[order], pa.float64()),
                         "key": pa.array(key[order], pa.float64())})

    rows = weights.map_batches(_partial,
                               batch_format="pyarrow").take_all()
    ids = np.array([row[id_col] for row in rows], np.int64)
    logw = np.array([row["logw"] for row in rows], np.float64)
    key = np.array([row["key"] for row in rows], np.float64)
    order = np.lexsort((ids, -key))[:k]
    return pa.table({
        id_col: pa.array(ids[order], pa.int64()),
        "logw": pa.array(logw[order], pa.float64()),
        "key": pa.array(key[order], pa.float64()),
        "rank": pa.array(np.arange(1, order.size + 1, dtype=np.int64),
                         pa.int64()),
    })


# ---------------------------------------------------------------------------
# keyness (log-likelihood keyword extraction)
# ---------------------------------------------------------------------------

def keyness(ds: ray.data.Dataset, group_col: str, focus_value,
            text_col: str = "text", top_k: int = 50,
            min_freq: int = 5) -> pa.Table:
    """Top-``top_k`` keywords of the focus subcorpus vs the rest, by
    Dunning log-likelihood G² = 2·(a·ln(a/E1) + b·ln(b/E2)) with
    E1 = n1·(a+b)/(n1+n2), E2 = n2·(a+b)/(n1+n2); zero cells contribute
    nothing (lim x→0 of x·ln x). ``direction`` is +1 when the term is
    focus-leaning (a·n2 ≥ b·n1, exact integer cross-multiply — no float
    boundary), −1 otherwise.

    Ranking sorts by G² ROUNDED to 6 decimals (term ascending as the
    tiebreak) so the selection boundary is float-order stable across
    engines — the convention every oracled float sort here uses.

    Scale shape: per-batch dictionary-encoded fold → one type-sized
    ``groupby(term).sum`` → vectorized G² inside a second map_batches
    whose output is a per-block top-k partial, so the driver merge is
    ≤ top_k × blocks rows.
    """
    def _partial(batch: pa.Table) -> pa.Table:
        parents, toks, _, _ = tokenize_column(batch.column(text_col))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        if len(toks) == 0:
            return pa.schema([("term", pa.string()),
                              ("f_focus", pa.int64()),
                              ("f_ref", pa.int64())]).empty_table()
        in_focus = pc.equal(batch.column(group_col),
                            focus_value).to_numpy(zero_copy_only=False)
        on_focus = in_focus[parents]
        d = pc.dictionary_encode(toks)
        codes = d.indices.to_numpy(zero_copy_only=False)
        n_terms = len(d.dictionary)
        nf = np.bincount(codes[on_focus], minlength=n_terms)
        nr = np.bincount(codes[~on_focus], minlength=n_terms)
        return pa.table({"term": d.dictionary,
                         "f_focus": pa.array(nf, pa.int64()),
                         "f_ref": pa.array(nr, pa.int64())})

    counts = (ds.select_columns([text_col, group_col])
              .map_batches(_partial, batch_format="pyarrow")
              .groupby("term")
              .aggregate(Sum("f_focus", alias_name="f_focus"),
                         Sum("f_ref", alias_name="f_ref"))
              .materialize())  # type-table-sized; consumed twice below
    totals = counts.aggregate(Sum("f_focus", alias_name="n1"),
                              Sum("f_ref", alias_name="n2"))
    n1, n2 = float(totals["n1"]), float(totals["n2"])

    def _ll_topk(batch: pa.Table) -> pa.Table:
        a = batch.column("f_focus").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        b = batch.column("f_ref").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        keep = (a + b) >= min_freq
        t = batch.filter(pa.array(keep))
        a, b = a[keep], b[keep]
        e1 = n1 * (a + b) / (n1 + n2)
        e2 = n2 * (a + b) / (n1 + n2)
        with np.errstate(divide="ignore", invalid="ignore"):
            ll = 2.0 * (np.where(a > 0, a * np.log(a / e1), 0.0)
                        + np.where(b > 0, b * np.log(b / e2), 0.0))
        ll = np.round(ll, 6)
        terms = np.asarray(t.column("term").to_pylist(), dtype=object)
        order = np.lexsort((terms, -ll))[:top_k]
        return pa.table({
            "term": pa.array(terms[order], pa.string()),
            "f_focus": pc.take(t.column("f_focus"),
                               pa.array(order)).cast(pa.int64()),
            "f_ref": pc.take(t.column("f_ref"),
                             pa.array(order)).cast(pa.int64()),
            "ll": pa.array(ll[order], pa.float64()),
        })

    rows = counts.map_batches(_ll_topk, batch_format="pyarrow") \
        .take_all()
    terms = np.asarray([row["term"] for row in rows], dtype=object)
    a = np.array([row["f_focus"] for row in rows], np.int64)
    b = np.array([row["f_ref"] for row in rows], np.int64)
    ll = np.array([row["ll"] for row in rows], np.float64)
    order = np.lexsort((terms, -ll))[:top_k]
    # exact integer cross-multiply on the k result rows (Python ints —
    # no int64 overflow at any corpus size; the table is result-sized)
    direction = [1 if int(a[i]) * int(n2) >= int(b[i]) * int(n1) else -1
                 for i in order]
    return pa.table({
        "term": pa.array(terms[order], pa.string()),
        "f_focus": pa.array(a[order], pa.int64()),
        "f_ref": pa.array(b[order], pa.int64()),
        "ll": pa.array(ll[order], pa.float64()),
        "direction": pa.array(direction, pa.int64()),
    })
