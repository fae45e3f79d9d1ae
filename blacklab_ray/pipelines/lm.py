"""Bigram language-model perplexity scoring (CCNet-style quality signal).

Training-data operator family (beyond the reference): score every
document by the perplexity of a corpus-trained bigram LM, the standard
web-corpus quality signal (CCNet, Wenzek et al. 2020 — there a KenLM
5-gram; here an add-k-smoothed bigram model whose counts we can build
exactly with one distributed shuffle and whose scores a DuckDB oracle
can reproduce bit-for-bit).

Model: p(w2 | w1) = (n(w1,w2) + 0.5) / (h(w1) + 0.5 * V) where
``n`` is the corpus bigram count, ``h(w1) = sum_w2 n(w1,w2)`` the
history count, and ``V`` the distinct-unigram vocabulary size.
Document score: ppl = exp(-mean(ln p)) over the doc's bigrams.

Scale design (100 TB):
- Counts: one part-hash shuffle keyed by ``hash64(w1) % parts`` with
  per-batch pre-aggregated partials (the combiner pattern). Keying on
  w1 alone means each part holds EVERYTHING about its histories, so
  h(w1) and the per-part vocab fall out of the same combine — no
  second shuffle. This is the repo's proven part-hash shape (one
  vectorized Arrow ``group_by`` per partition), not a string-keyed
  ``Dataset.groupby``.
- Scoring, ``method="broadcast"``: the counts table is ``ray.put``
  once and every scoring actor builds an int-packed lookup index in
  ``__init__`` (pc.index_in + sorted-key searchsorted — all C++).
  Right whenever the model fits a worker heap (bigram tables prune
  hard; CCNet ships a ~4 GB model for all of Common Crawl).
- Scoring, ``method="join"``: no broadcast — doc bigrams explode to
  (doc_id, w1, w2, m) partials co-partitioned with the model rows on
  the SAME ``hash64(w1) % parts`` key, each part joins locally, and
  per-doc partial log-sums reduce with a second part-hash keyed by
  doc_id. Nothing model-sized ever lands on one node.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from blacklab_ray.analysis.analyzers import tokenize_column
from blacklab_ray.stages.tokenize import hash64

_LM_PARTS = 64
_SMOOTH = 0.5

_LM_SCHEMA = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                        ("n", pa.int64()), ("h", pa.int64())])


def _part_of_terms(terms: pa.Array | pa.ChunkedArray,
                   parts: int) -> pa.Array:
    """hash64(term) % parts, hashing each UNIQUE term once."""
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    d = pc.dictionary_encode(terms)
    uniq = d.dictionary.to_pylist()
    per_uniq = np.array([hash64(t) % parts for t in uniq], np.int64)
    idx = d.indices.to_numpy(zero_copy_only=False)
    return pa.array(per_uniq[idx] if len(uniq) else
                    np.array([], np.int64), pa.int64())


def _codes(values: pa.Array | pa.ChunkedArray,
           value_set: pa.Array) -> np.ndarray:
    """index_in as an int64 numpy array with -1 for misses (index_in
    returns NULL for a miss, which to_numpy would float-NaN-poison)."""
    idx = pc.fill_null(pc.index_in(values, value_set=value_set), -1)
    return idx.to_numpy(zero_copy_only=False).astype(np.int64)


def _lookup_sorted(keys: np.ndarray, vals: np.ndarray,
                   probe: np.ndarray) -> np.ndarray:
    """vals[key == probe] with 0 for misses, over a sorted key array."""
    if len(keys) == 0 or len(probe) == 0:
        return np.zeros(len(probe), np.int64)
    pos = np.minimum(np.searchsorted(keys, probe), len(keys) - 1)
    return np.where(keys[pos] == probe, vals[pos], 0)


def _lookup_dense(vals: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """vals[codes] with 0 where codes == -1 (miss)."""
    if len(vals) == 0 or len(codes) == 0:
        return np.zeros(len(codes), np.int64)
    safe = np.where(codes < 0, 0, codes)
    return np.where(codes < 0, 0, vals[safe])


def _batch_bigrams(batch: pa.Table, text_col: str) -> tuple:
    """(bigram_parents, w1, w2, all_tokens) for one batch — adjacent
    token pairs within the same document, fully vectorized."""
    parents, toks, _, _ = tokenize_column(batch.column(text_col))
    if len(toks) < 2:
        empty = pa.array([], pa.string())
        return np.array([], np.int64), empty, empty, toks
    same = pa.array(parents[1:] == parents[:-1])
    w1 = toks.slice(0, len(toks) - 1).filter(same)
    w2 = toks.slice(1).filter(same)
    return parents[:-1][same.to_numpy(zero_copy_only=False)], w1, w2, toks


def _distinct_terms(ds: ray.data.Dataset, text_col: str,
                    parts: int) -> pa.Array:
    """Sorted distinct-term array (the LM's code space): per-batch
    ``pc.unique`` partials → part-hash distinct → driver sort. Every
    stage is type-table-sized."""

    def _partial(batch: pa.Table) -> pa.Table:
        _, toks, _, _ = tokenize_column(batch.column(text_col))
        uni = pc.unique(toks)
        return pa.table({"term": uni,
                         "part": _part_of_terms(uni, parts)})

    def _comb(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.schema([("term", pa.string())]).empty_table()
        return pa.table({"term": pc.unique(g["term"].combine_chunks())})

    out = ds.map_batches(_partial, batch_format="pyarrow") \
        .groupby("part").map_groups(_comb, batch_format="pyarrow")
    tbls = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return pa.array([], pa.string())
    col = pa.concat_tables(tbls)["term"]
    arr = pc.take(col, pc.sort_indices(col))
    if isinstance(arr, pa.ChunkedArray):
        arr = pa.concat_arrays(arr.chunks) if arr.num_chunks != 1 \
            else arr.chunk(0)
    return arr


def _hash_part(keys: np.ndarray, parts: int) -> np.ndarray:
    """Multiplicative part hash (plain ``% parts`` would collapse on
    the packed-key structure — same reasoning as exchange._part_of)."""
    h = keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(32)).astype(np.int64)) % parts


def train_bigram_lm(ds: ray.data.Dataset, text_col: str = "text",
                    parts: int = _LM_PARTS) -> ray.data.Dataset:
    """Exact corpus bigram counts as a Dataset with schema
    (w1, w2, n, h): bigram rows carry the pair count ``n`` and the
    history total ``h``; rows with w2 NULL enumerate the distinct
    unigram vocabulary (``vocab_size`` counts them).

    Two phases, so the corpus-sized stream never shuffles strings
    (the exchange rule — the one-phase string version measured 67 s
    vs 20 s at bench scale): (1) distinct-term vocab, type-sized,
    broadcast once; (2) per-batch ``index_in`` coding + packed
    ``c1 * V + c2`` int64 keys, np.unique partials, one int shuffle
    part-hashed by ``c1`` so each part still owns every history.
    Terms decode back to strings only in the reduce, over the
    distinct-bigram table. (Beyond ~3e9 distinct terms the packed key
    overflows int64 and the vocab broadcast stops fitting — that
    regime wants the index exchange's map-local-code shuffle.)"""
    terms = _distinct_terms(ds, text_col, parts)
    v = len(terms)
    vocab_rows = pa.table({
        "w1": terms, "w2": pa.nulls(v, pa.string()),
        "n": pa.array(np.zeros(v, np.int64), pa.int64()),
        "h": pa.array(np.zeros(v, np.int64), pa.int64())},
        schema=_LM_SCHEMA)
    if v == 0:
        return ray.data.from_arrow(_LM_SCHEMA.empty_table())
    if v >= (1 << 31):
        raise ValueError("packed-key space exceeds int64; use the "
                         "map-local-code exchange for this vocabulary")
    tref = ray.put(terms)

    def _partials(batch: pa.Table) -> pa.Table:
        vt = ray.get(tref)
        _, w1, w2, _ = _batch_bigrams(batch, text_col)
        c1 = pc.index_in(w1, value_set=vt) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        c2 = pc.index_in(w2, value_set=vt) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        keys, cnt = np.unique(c1 * v + c2, return_counts=True)
        return pa.table({
            "key": pa.array(keys, pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
            "part": pa.array(_hash_part(keys // v, parts), pa.int64())})

    def _combine(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _LM_SCHEMA.empty_table()
        vt = ray.get(tref)
        keys = g["key"].to_numpy(zero_copy_only=False)
        ns = g["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(keys)
        keys, ns = keys[order], ns[order]
        bounds = np.flatnonzero(np.diff(keys)) + 1
        starts = np.concatenate(([0], bounds))
        uk = keys[starts]
        un = np.add.reduceat(ns, starts)
        c1 = uk // v
        hb = np.flatnonzero(np.diff(c1)) + 1
        hstarts = np.concatenate(([0], hb))
        h_per_group = np.add.reduceat(un, hstarts)
        h = np.repeat(h_per_group,
                      np.diff(np.concatenate((hstarts, [uk.size]))))
        return pa.table({
            "w1": vt.take(pa.array(c1, pa.int64())),
            "w2": vt.take(pa.array(uk % v, pa.int64())),
            "n": pa.array(un, pa.int64()),
            "h": pa.array(h, pa.int64())}, schema=_LM_SCHEMA)

    counts = ds.map_batches(_partials, batch_format="pyarrow") \
        .groupby("part").map_groups(_combine, batch_format="pyarrow")
    return counts.union(ray.data.from_arrow(vocab_rows))


def vocab_size(lm: ray.data.Dataset) -> int:
    """Distinct-unigram count V (parts hold disjoint terms: a plain
    count of the vocab rows is exact)."""

    def _c(t: pa.Table) -> pa.Table:
        nulls = int(pc.sum(pc.is_null(t["w2"]).cast(pa.int64()))
                    .as_py() or 0)
        return pa.table({"c": pa.array([nulls], pa.int64())})

    out = lm.map_batches(_c, batch_format="pyarrow").sum("c")
    return int(out or 0)


def _build_lm_index(lm: pa.Table) -> tuple:
    """(hist_terms, h, w2_terms, keys, n): the ready-made scorer index
    — built ONCE on the driver and ray.put whole, so each scoring
    actor deserializes (plasma-zero-copy numpy) instead of re-running
    the unique/index_in/argsort pass over the bigram table (3.2 s per
    actor at bench scale)."""
    hist_terms = pc.unique(lm["w1"].combine_chunks())
    c1 = _codes(lm["w1"], hist_terms)
    h = np.zeros(len(hist_terms), np.int64)
    h[c1] = lm["h"].to_numpy(zero_copy_only=False)
    w2_terms = pc.unique(lm["w2"].combine_chunks())
    c2 = _codes(lm["w2"], w2_terms)
    packed = c1 * (len(w2_terms) + 1) + c2
    order = np.argsort(packed)
    return (hist_terms, h, w2_terms, packed[order],
            lm["n"].to_numpy(zero_copy_only=False)[order])


class _BroadcastScorer:
    """map_batches class: scores batches against a broadcast LM index
    (prebuilt by ``_build_lm_index``); per batch the lookups are two
    hash probes and one searchsorted — no Python per-row work."""

    def __init__(self, index_ref, v: int, text_col: str, id_col: str):
        idx = index_ref if isinstance(index_ref, tuple) \
            else ray.get(index_ref)
        self._text, self._id, self._v = text_col, id_col, v
        (self._hist_terms, self._h, self._w2_terms,
         self._keys, self._n) = idx

    def _logp(self, w1: pa.Array, w2: pa.Array) -> np.ndarray:
        c1 = _codes(w1, self._hist_terms)
        c2 = _codes(w2, self._w2_terms)
        h = _lookup_dense(self._h, c1)
        packed = np.where((c1 < 0) | (c2 < 0), np.int64(-1),
                          c1 * (len(self._w2_terms) + 1) + c2)
        n = _lookup_sorted(self._keys, self._n, packed)
        return np.log((n + _SMOOTH) / (h + _SMOOTH * self._v))

    def __call__(self, batch: pa.Table) -> pa.Table:
        parents, w1, w2, _ = _batch_bigrams(batch, self._text)
        n_docs = batch.num_rows
        nb = np.bincount(parents, minlength=n_docs)
        lp = np.zeros(n_docs, np.float64)
        if len(w1):
            lp = np.bincount(parents, minlength=n_docs,
                             weights=self._logp(w1, w2))
        keep = nb > 0
        ppl = np.round(np.exp(-lp[keep] / np.maximum(nb[keep], 1)), 4)
        return pa.table({
            self._id: batch.column(self._id).filter(pa.array(keep))
            .cast(pa.int64()),
            "n_bigrams": pa.array(nb[keep], pa.int64()),
            "ppl": pa.array(ppl, pa.float64()),
        })


def _lm_to_table(lm: ray.data.Dataset | pa.Table) -> pa.Table:
    if isinstance(lm, pa.Table):
        return lm
    tbls = [t for t in ray.get(lm.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tbls).combine_chunks() if tbls \
        else _LM_SCHEMA.empty_table()


def score_perplexity(ds: ray.data.Dataset,
                     lm: ray.data.Dataset | pa.Table, *,
                     v: int | None = None,
                     method: str = "broadcast",
                     text_col: str = "text", id_col: str = "doc_id",
                     parts: int = _LM_PARTS) -> ray.data.Dataset:
    """Per-doc (doc_id, n_bigrams, ppl); docs with no bigram are
    dropped (their perplexity is undefined). ``method="broadcast"``
    ships the model once; ``method="join"`` never materializes it
    (co-partitioned local joins — the larger-than-heap model path)."""
    if method == "broadcast":
        tbl = _lm_to_table(lm)
        if v is None:
            v = int(pc.sum(pc.is_null(tbl["w2"]).cast(pa.int64()))
                    .as_py() or 0)
        ref = ray.put(_build_lm_index(
            tbl.filter(pc.is_valid(tbl["w2"]))))
        return ds.map_batches(
            _BroadcastScorer,
            fn_constructor_args=(ref, v, text_col, id_col),
            batch_format="pyarrow", concurrency=(1, 8))
    if method != "join":
        raise ValueError(f"unknown method {method!r}")
    if not isinstance(lm, ray.data.Dataset):
        lm = ray.data.from_arrow(lm)
    if v is None:
        v = vocab_size(lm)
    return _score_join(ds, lm, v, text_col, id_col, parts)


def _score_join(ds, lm, v, text_col, id_col, parts):
    """Co-partitioned scoring: union(model rows, doc-bigram partials)
    partitioned by hash64(w1) % parts, joined locally per part, then
    per-doc partial log-sums reduced by a doc_id part-hash."""

    def _doc_partials(batch: pa.Table) -> pa.Table:
        parents, w1, w2, _ = _batch_bigrams(batch, text_col)
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t = pa.table({"doc_id": pa.array(ids[parents], pa.int64()),
                      "w1": w1, "w2": w2})
        agg = t.group_by(["doc_id", "w1", "w2"]) \
            .aggregate([([], "count_all")])
        return pa.table({
            "doc_id": agg["doc_id"], "w1": agg["w1"], "w2": agg["w2"],
            "n": agg["count_all"].cast(pa.int64()),
            "h": pa.nulls(agg.num_rows, pa.int64()),
            "part": _part_of_terms(agg["w1"], parts)})

    def _model_rows(batch: pa.Table) -> pa.Table:
        big = batch.filter(pc.is_valid(batch["w2"]))
        return pa.table({
            "doc_id": pa.nulls(big.num_rows, pa.int64()),
            "w1": big["w1"], "w2": big["w2"], "n": big["n"],
            "h": big["h"],
            "part": _part_of_terms(big["w1"], parts)})

    docs = ds.map_batches(_doc_partials, batch_format="pyarrow")
    model = lm.map_batches(_model_rows, batch_format="pyarrow")

    def _join_part(g: pa.Table) -> pa.Table:
        schema = pa.schema([("doc_id", pa.int64()),
                            ("lp", pa.float64()), ("nb", pa.int64())])
        is_doc = pc.is_valid(g["doc_id"])
        drows = g.filter(is_doc)
        if drows.num_rows == 0:
            return schema.empty_table()
        mrows = g.filter(pc.invert(is_doc))
        hist_terms = pc.unique(mrows["w1"].combine_chunks())
        w2_terms = pc.unique(mrows["w2"].combine_chunks())
        mc1 = _codes(mrows["w1"], hist_terms)
        mc2 = _codes(mrows["w2"], w2_terms)
        hvals = np.zeros(len(hist_terms), np.int64)
        hvals[mc1] = mrows["h"].to_numpy(zero_copy_only=False)
        keys = mc1 * (len(w2_terms) + 1) + mc2
        order = np.argsort(keys)
        keys = keys[order]
        nvals = mrows["n"].to_numpy(zero_copy_only=False)[order]
        c1 = _codes(drows["w1"], hist_terms)
        c2 = _codes(drows["w2"], w2_terms)
        h = _lookup_dense(hvals, c1)
        packed = np.where((c1 < 0) | (c2 < 0), np.int64(-1),
                          c1 * (len(w2_terms) + 1) + c2)
        n = _lookup_sorted(keys, nvals, packed)
        m = drows["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        lp = m * np.log((n + _SMOOTH) / (h + _SMOOTH * v))
        out = pa.table({"doc_id": drows["doc_id"],
                        "lp": pa.array(lp, pa.float64()),
                        "nb": pa.array(m.astype(np.int64), pa.int64())})
        agg = out.group_by("doc_id").aggregate(
            [("lp", "sum"), ("nb", "sum")])
        return pa.table({"doc_id": agg["doc_id"], "lp": agg["lp_sum"],
                         "nb": agg["nb_sum"]}, schema=schema)

    partials = docs.union(model).groupby("part").map_groups(
        _join_part, batch_format="pyarrow")

    def _with_docpart(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "dpart", pa.array(ids % parts, pa.int64()))

    def _finalize(g: pa.Table) -> pa.Table:
        schema = pa.schema([("doc_id", pa.int64()),
                            ("n_bigrams", pa.int64()),
                            ("ppl", pa.float64())])
        if g.num_rows == 0:
            return schema.empty_table()
        agg = g.select(["doc_id", "lp", "nb"]).group_by("doc_id") \
            .aggregate([("lp", "sum"), ("nb", "sum")])
        lp = agg["lp_sum"].to_numpy(zero_copy_only=False)
        nb = agg["nb_sum"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": agg["doc_id"].cast(pa.int64()),
            "n_bigrams": pa.array(nb, pa.int64()),
            "ppl": pa.array(np.round(np.exp(-lp / nb), 4),
                            pa.float64())}, schema=schema)

    return partials.map_batches(_with_docpart, batch_format="pyarrow") \
        .groupby("dpart").map_groups(_finalize, batch_format="pyarrow")


def perplexity_buckets(ds: ray.data.Dataset, *,
                       text_col: str = "text", id_col: str = "doc_id",
                       method: str = "broadcast",
                       parts: int = _LM_PARTS,
                       qs: tuple = (1 / 3, 2 / 3)
                       ) -> ray.data.Dataset:
    """CCNet head/middle/tail perplexity buckets.

    Scores the corpus (``lm_perplexity``), then cuts at the exact
    ``qs`` quantiles of the 4-decimal score (CCNet §4.3 cuts at
    thirds; a typical filter keeps head+middle). The quantiles run on
    the distinct-value histogram of ``round(ppl * 1e4)`` — exact,
    never corpus-sized on the driver, matching DuckDB
    ``quantile_disc``. Output adds a ``bucket`` column; ties at a cut
    go to the lower bucket on both engines (<=)."""
    from blacklab_ray.pipelines.docsops import exact_quantiles
    scored = lm_perplexity(ds, text_col=text_col, id_col=id_col,
                           method=method, parts=parts)

    def _key(batch: pa.Table) -> pa.Table:
        pk = np.round(batch["ppl"].to_numpy(zero_copy_only=False)
                      * 10000.0).astype(np.int64)
        return batch.append_column("pk", pa.array(pk, pa.int64()))

    keyed = scored.map_batches(_key, batch_format="pyarrow") \
        .materialize()     # two consumers: quantiles + assignment
    cuts = exact_quantiles(keyed, "pk", list(qs))
    q1, q2 = cuts[qs[0]], cuts[qs[1]]

    def _assign(batch: pa.Table) -> pa.Table:
        pk = batch["pk"].to_numpy(zero_copy_only=False)
        bucket = np.where(pk <= q1, "head",
                          np.where(pk <= q2, "middle", "tail"))
        return batch.drop_columns(["pk"]).append_column(
            "bucket", pa.array(bucket, pa.string()))

    if q1 is None:          # empty corpus
        return keyed.drop_columns(["pk"]).map_batches(
            lambda t: t.append_column(
                "bucket", pa.nulls(t.num_rows, pa.string())),
            batch_format="pyarrow")
    return keyed.map_batches(_assign, batch_format="pyarrow")


def lm_perplexity(ds: ray.data.Dataset, *, text_col: str = "text",
                  id_col: str = "doc_id", method: str = "broadcast",
                  parts: int = _LM_PARTS) -> ray.data.Dataset:
    """Self-scored corpus perplexity: train the bigram LM on ``ds``
    and score every document with it (the CCNet quality-signal shape,
    with the corpus itself standing in for the reference LM corpus)."""
    lm = train_bigram_lm(ds, text_col, parts)
    if method == "broadcast":
        tbl = _lm_to_table(lm)
        v = int(pc.sum(pc.is_null(tbl["w2"]).cast(pa.int64())).as_py()
                or 0)
        return score_perplexity(ds, tbl, v=v, method="broadcast",
                                text_col=text_col, id_col=id_col)
    lm = lm.materialize()
    return score_perplexity(ds, lm, method="join", text_col=text_col,
                            id_col=id_col, parts=parts)
