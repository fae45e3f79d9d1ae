"""Doc-level result-set operators (DocResults analogues).

BlackLab's DocResults supports group/sort/window/filter/sample over the
per-document result set (search/results/DocResults.java:254-473).
Grouping and sorting were already expressed directly as Dataset
groupby/sort; these add the remaining two as named operators:

- ``docs_window``: pagination window [first, first+number) over a
  sorted doc set (DocResults.window:398). Windows are pagination-sized;
  the sort is the distributed step, the slice is driver-side.
- ``sample_docs``: deterministic seeded sampling by doc id
  (DocResults.sample:473 / SampleParameters.java:9) using the md5-low64
  predicate — partition-order independent and SQL-reproducible (same
  scheme as hit sampling).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def docs_window(ds: ray.data.Dataset, sort_cols: list[str],
                descending: list[bool], first: int,
                number: int) -> pa.Table:
    """Rows [first, first+number) of the doc set sorted by sort_cols."""
    out = ds.sort(sort_cols, descending=descending).limit(first + number)
    tbl = pa.Table.from_pylist(out.take_all())
    return tbl.slice(first, number)


def sample_docs(ds: ray.data.Dataset, frac: float, seed: int = 29,
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Keep a doc iff md5_low64(f"{id}:{seed}") mod 2^20 < frac*2^20."""
    from blacklab_ray.pipelines.hits import md5_low64
    # round, don't truncate: DuckDB's CAST(frac * 1048576 AS BIGINT)
    # rounds half-away-from-zero, so int() truncation puts a boundary
    # doc on the wrong side of the oracle (ADVICE r2 #4)
    thresh = int(round(frac * (1 << 20)))

    def _filt(batch: pa.Table) -> pa.Table:
        from blacklab_ray.util import md5_low64_keyed
        # NO int cast: string ids hash as their literal text (the
        # pre-batch f"{id}:{seed}" behavior; an int cast would crash
        # on string ids and change '007' -> '7')
        hv = md5_low64_keyed(batch.column(id_col), seed) % (1 << 20)
        return batch.filter(pa.array(hv < thresh))

    return ds.map_batches(_filt, batch_format="pyarrow")


def sample_stratified(ds: ray.data.Dataset, group_col: str,
                      n_per_group: int | dict, seed: int = 29,
                      id_col: str = "doc_id") -> ray.data.Dataset:
    """Deterministic stratified sample: the ``n_per_group`` rows of
    each group with the smallest md5(f"{id}:{seed}") digest, plus
    their in-group rank ``rn`` (1-based).

    The per-group equivalent of ``sample_docs`` — a training-data
    pipeline staple (balance languages/sources before mixing). Digest
    ordering makes the pick partition-order independent and
    SQL-reproducible (DuckDB: ``row_number() OVER (PARTITION BY g
    ORDER BY md5(id::VARCHAR || ':seed'))``).

    Scale shape: a per-batch partial top-n combiner runs BEFORE the
    groupby, so the shuffle moves at most n × groups × blocks rows,
    never the corpus; the final per-group top-n then sees only those
    survivors. Group values must be non-null (matches the documents
    schema; DuckDB would put NULLs in their own partition).

    ``n_per_group`` may be a dict {group value: quota} for per-group
    VARIABLE quotas (the mixture-resampling shape,
    :func:`mixture_sample`); unlisted groups get quota 0. The dict is
    group-count-sized — closure-broadcast, never shuffled.
    """
    import hashlib

    import numpy as np

    quota = (None if not isinstance(n_per_group, dict)
             else dict(n_per_group))

    out_schema = pa.schema([
        (group_col, pa.string()), (id_col, pa.int64()),
        ("_k", pa.string())])

    def _topn(groups: np.ndarray, ids: np.ndarray, keys: np.ndarray):
        """Rows of the n smallest (key, id) per group run."""
        order = np.lexsort((ids, keys, groups))
        groups, ids, keys = groups[order], ids[order], keys[order]
        first = np.empty(groups.size, bool)
        first[:1] = True
        first[1:] = groups[1:] != groups[:-1]
        starts = np.flatnonzero(first)
        run_id = np.cumsum(first) - 1
        pos = np.arange(groups.size) - starts[run_id]
        if quota is None:
            m = pos < n_per_group
        else:
            lim = np.array([quota.get(g, 0)
                            for g in groups[starts]], dtype=np.int64)
            m = pos < lim[run_id]
        return groups[m], ids[m], keys[m], pos[m]

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        groups = np.asarray(batch.column(group_col).to_pylist(),
                            dtype=object)
        keys = np.asarray(
            [hashlib.md5(f"{i}:{seed}".encode()).hexdigest()
             for i in ids], dtype=object)
        g, i, k, _ = _topn(groups, ids, keys)
        return pa.table({group_col: pa.array(list(g), pa.string()),
                         id_col: pa.array(i, pa.int64()),
                         "_k": pa.array(list(k), pa.string())})

    def _final(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.schema([
                (group_col, pa.string()), (id_col, pa.int64()),
                ("rn", pa.int64())]).empty_table()
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        groups = np.asarray(group.column(group_col).to_pylist(),
                            dtype=object)
        keys = np.asarray(group.column("_k").to_pylist(), dtype=object)
        g, i, _, pos = _topn(groups, ids, keys)
        return pa.table({group_col: pa.array(list(g), pa.string()),
                         id_col: pa.array(i, pa.int64()),
                         "rn": pa.array(pos + 1, pa.int64())})

    return ds.map_batches(_partial, batch_format="pyarrow") \
        .groupby(group_col).map_groups(_final, batch_format="pyarrow")


def mixture_sample(ds: ray.data.Dataset, group_col: str,
                   weights: dict[str, float], total: int,
                   seed: int = 29, id_col: str = "doc_id"
                   ) -> ray.data.Dataset:
    """Domain-mixture resampling: draw a deterministic sample whose
    group proportions match ``weights`` (a training-data staple —
    reweight sources/languages before mixing).

    Per-group quota ``k_g = min(n_g, round(w_g * total))`` — capped by
    what the group actually has, so undersized groups deliver all
    their docs rather than upsampling (duplication is a separate,
    explicit op). Quotas come from one group-count-sized
    ``groupby().count()``; the pick itself is
    :func:`sample_stratified`'s digest ranking (exact counts,
    partition-order independent, SQL-reproducible).
    """
    import math

    # count over the group column ALONE — a groupby on the full rows
    # would shuffle the text payload for a group-count-sized answer
    counts = {r[group_col]: r["count()"]
              for r in ds.select_columns([group_col])
              .groupby(group_col).count().take_all()}
    # floor(x+0.5), not round(): Python rounds halves to even while
    # DuckDB rounds half away from zero — for positive quotas these
    # agree only via the explicit form
    quota = {g: min(counts.get(g, 0), int(math.floor(w * total + 0.5)))
             for g, w in weights.items()}
    return sample_stratified(ds, group_col, quota, seed=seed,
                             id_col=id_col)


def weighted_sample(ds: ray.data.Dataset, weight_col: str, k: int,
                    id_col: str = "doc_id", seed: int = 7) -> pa.Table:
    """Deterministic weighted sample WITHOUT replacement — the
    Efraimidis-Spirakis A-Res scheme: priority ``ln(u) / w`` with a
    seeded md5-derived uniform ``u``; the k largest priorities win
    with inclusion probability proportional to weight. The importance
    -resampling shape (sample docs by quality score / length) the
    plain and stratified samplers can't express.

    Rows with weight <= 0 are never sampled (defined out). Digest
    ``u`` uses md5_low64(f"{id}:{seed}") — EXACTLY DuckDB's
    md5_number_lower, so the pick is SQL-reproducible and
    partition-order independent.

    Scale shape: per-batch top-k combiner, so the driver merge sees
    at most k × blocks rows, never the corpus. Returns the k-row
    table (doc_id, weight, rank) directly — it is result-sized."""
    from blacklab_ray.pipelines.hits import md5_low64

    def _pri(ids: np.ndarray, w: np.ndarray) -> np.ndarray:
        from blacklab_ray.util import md5_low64_keyed
        u = md5_low64_keyed(ids.astype(np.int64),
                            seed).astype(np.float64)
        return np.log((u + 1.0) / 18446744073709551616.0) / w

    def _partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        w = batch.column(weight_col).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        keep = w > 0
        ids, w = ids[keep], w[keep]
        pri = _pri(ids, w) if ids.size else np.array([], np.float64)
        order = np.lexsort((ids, -pri))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "weight": pa.array(w[order], pa.float64()),
                         "pri": pa.array(pri[order], pa.float64())})

    rows = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    ids = np.array([r[id_col] for r in rows], np.int64)
    w = np.array([r["weight"] for r in rows], np.float64)
    pri = np.array([r["pri"] for r in rows], np.float64)
    order = np.lexsort((ids, -pri))[:k]
    return pa.table({
        id_col: pa.array(ids[order], pa.int64()),
        "weight": pa.array(w[order], pa.float64()),
        "rank": pa.array(np.arange(1, order.size + 1, dtype=np.int64),
                         pa.int64()),
    })


def exact_quantiles(ds: ray.data.Dataset, col: str,
                    qs: list[float]) -> dict[float, int]:
    """EXACT quantiles of an integer column, distributed.

    Shape: per-batch ``np.unique`` partials → ``groupby(value).sum`` →
    driver-side cumsum over the DISTINCT-VALUE histogram. The shuffle
    and the driver table are distinct-value-sized, never corpus-sized
    — doc lengths have at most ~1e5 distinct values even at 100 TB, so
    this stays exact where a sketch (t-digest/KLL) would approximate.

    Semantics match DuckDB ``quantile_disc``: the sorted element at
    0-based index ``max(0, ceil(q*n) - 1)``.
    """
    import math

    import numpy as np

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema([(col, pa.int64()),
                              ("cnt", pa.int64())]).empty_table()
        vals, counts = np.unique(
            batch.column(col).cast(pa.int64())
            .to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({col: pa.array(vals, pa.int64()),
                         "cnt": pa.array(counts, pa.int64())})

    hist = ds.map_batches(_partial, batch_format="pyarrow") \
        .groupby(col).sum("cnt").take_all()
    vals = np.array([r[col] for r in hist], dtype=np.int64)
    cnts = np.array([r["sum(cnt)"] for r in hist], dtype=np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1]) if cum.size else 0
    out = {}
    for q in qs:
        if n == 0:
            out[q] = None
            continue
        rank = max(0, math.ceil(q * n) - 1) + 1  # 1-based target rank
        out[q] = int(vals[np.searchsorted(cum, rank)])
    return out


def assign_splits(ds: ray.data.Dataset,
                  splits: dict[str, float] | None = None,
                  seed: int = 13,
                  id_col: str = "doc_id") -> ray.data.Dataset:
    """Deterministic train/val/test assignment by doc id.

    ``bucket = md5_low64(f"{id}:{seed}") % 2^20`` lands each doc in the
    first split whose cumulative boundary (``int(round(cum * 2^20))`` —
    the CAST-AS-BIGINT convention every seeded sampler here uses)
    exceeds it. Partition-order independent, stable across runs and
    cluster sizes, SQL-reproducible via ``md5_number_lower`` — the
    membership a training pipeline must be able to recompute years
    later from the id alone. Weights must sum to 1 (±1e-9).
    """
    from blacklab_ray.pipelines.hits import md5_low64
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    names = list(splits)
    cum = np.cumsum([splits[n] for n in names])
    if abs(cum[-1] - 1.0) > 1e-9:
        raise ValueError(f"split weights sum to {cum[-1]}, expected 1")
    bounds = np.array([int(round(c * (1 << 20))) for c in cum[:-1]],
                      np.int64)

    def _assign(batch: pa.Table) -> pa.Table:
        from blacklab_ray.util import md5_low64_keyed
        # NO int cast (see sample_docs): ids keep their literal text
        buckets = (md5_low64_keyed(batch.column(id_col), seed)
                   % (1 << 20)).astype(np.int64)
        which = np.searchsorted(bounds, buckets, side="right")
        return batch.append_column(
            "split", pa.array([names[w] for w in which], pa.string()))

    return ds.map_batches(_assign, batch_format="pyarrow")


def chunk_documents(ds: ray.data.Dataset, chunk_tokens: int = 256,
                    overlap: int = 0, text_col: str = "text",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """Split long documents into overlapping word-window chunks — the
    standard preprocessing step ahead of embedding / RAG pipelines
    (each chunk small enough for an encoder, ``overlap`` words of
    context carried across boundaries).

    Windows start every ``chunk_tokens - overlap`` words; the final
    window keeps the remainder. Chunk text is the window's whitespace
    words joined by single spaces (whitespace-normalized — the exact
    ``array_to_string(regexp_split(...))`` SQL twin), so chunking is
    deterministic and oracle-checkable. Output: one row per chunk
    ``(id, chunk_id, n_tokens, text)``; empty docs yield no chunks.

    Scale shape: embarrassingly parallel ``map_batches``; per batch
    the loop is over WINDOW INDEX (bounded by the longest doc), each
    iteration one vectorized ``list_slice`` + ``binary_join`` over
    every doc — never a Python loop over rows."""
    import pyarrow.compute as pc

    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be > 0")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap
    SCHEMA = pa.schema([(id_col, pa.int64()),
                        ("chunk_id", pa.int64()),
                        ("n_tokens", pa.int64()),
                        ("text", pa.string())])

    def _chunks(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return SCHEMA.empty_table()
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # strip leading/trailing whitespace with the SAME regex class
        # the split uses (the DuckDB oracle's regexp_replace twin), so
        # padded text never yields empty edge tokens
        trimmed = pc.replace_substring_regex(
            pc.fill_null(col, ""), pattern=r"^\s+|\s+$", replacement="")
        words = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        # regexp split of '' yields one empty token; drop those rows'
        # chunks via the n_words > 0 masks below
        lens = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        first = pc.list_slice(words, 0, 1)
        empty = pc.equal(pc.binary_join(first, ""), "") \
            .to_numpy(zero_copy_only=False)
        n_words = np.where(empty & (lens == 1), 0, lens)
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        out = []
        w = 0
        while True:
            start = w * stride
            # a window past the first must contribute at least one NEW
            # word beyond the previous window's end (start + overlap);
            # otherwise it is wholly contained in the overlap
            has = (n_words > start + overlap) if w else (n_words > 0)
            if not has.any():
                break
            # slice/join ONLY the surviving rows: the tail windows of
            # one long doc must not re-join every short doc in the
            # batch each iteration
            idx = np.flatnonzero(has)
            sub = words.take(pa.array(idx))
            txt = pc.binary_join(
                pc.list_slice(sub, start, start + chunk_tokens), " ")
            out.append(pa.table({
                id_col: pa.array(ids[idx], pa.int64()),
                "chunk_id": pa.array(np.full(idx.size, w, np.int64)),
                "n_tokens": pa.array(
                    np.minimum(n_words[idx] - start, chunk_tokens),
                    pa.int64()),
                "text": txt,
            }))
            w += 1
        if not out:
            return SCHEMA.empty_table()
        return pa.concat_tables(out)

    return ds.map_batches(_chunks, batch_format="pyarrow")


def snapshot_diff(old_ds: ray.data.Dataset, new_ds: ray.data.Dataset,
                  id_col: str = "url", text_col: str = "text",
                  num_partitions: int = 32,
                  include_unchanged: bool = False) -> ray.data.Dataset:
    """Diff two corpus snapshots by content: per document key, one of
    ``added`` (only in new), ``removed`` (only in old), ``changed``
    (both, different content md5), or ``unchanged`` — the continuous-
    crawl ops step between ``latest_snapshot_keep_ids`` (within ONE
    snapshot) and incremental index update (which consumes the
    added/changed set). ``unchanged`` rows — normally the overwhelming
    bulk — are dropped unless ``include_unchanged``.

    Scale shape: each side folds to slim (key-hash part, key,
    content_md5, side) rows in one ``map_batches`` pass; ONE part-hash
    co-partitioned union shuffle brings a key's two sides together,
    and a vectorized per-partition sort + neighbor compare emits the
    statuses — no driver-side state, both inputs stream.
    """
    import hashlib

    from blacklab_ray.util import part_of
    P = num_partitions

    def _slim(side: str):
        def _f(batch: pa.Table) -> pa.Table:
            keys = batch.column(id_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            md5s = [hashlib.md5((t or "").encode()).hexdigest()
                    for t in texts]
            kh = np.array([int(hashlib.md5(str(k).encode())
                               .hexdigest()[:15], 16)
                           for k in keys], np.int64)
            return pa.table({
                "part": pa.array(part_of(kh, P), pa.int64()),
                id_col: pa.array([str(k) for k in keys], pa.string()),
                "content_md5": pa.array(md5s, pa.string()),
                "side": pa.array([side] * len(keys), pa.string()),
            })
        return _f

    both = old_ds.map_batches(_slim("old"), batch_format="pyarrow") \
        .union(new_ds.map_batches(_slim("new"), batch_format="pyarrow"))

    OUT = pa.schema([(id_col, pa.string()), ("status", pa.string())])

    def _diff(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if group.num_rows == 0 or "side" not in group.column_names:
            return OUT.empty_table()
        # fully vectorized neighbor compare: Arrow sort by key, then
        # dictionary codes (first-appearance order == sorted order, so
        # codes are nondecreasing) + reduceat per group. Keys are
        # unique PER SIDE (snapshots), so a both-sides group is
        # changed iff its two md5 codes differ
        st = group.sort_by([(id_col, "ascending")])
        kcodes = pc.dictionary_encode(
            st[id_col].combine_chunks()).indices.to_numpy(
            zero_copy_only=False)
        hcodes = pc.dictionary_encode(
            st["content_md5"].combine_chunks()).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        is_new = pc.equal(st["side"], "new").to_numpy(
            zero_copy_only=False).astype(np.int64)
        brk = np.ones(kcodes.size, dtype=bool)
        brk[1:] = kcodes[1:] != kcodes[:-1]
        starts = np.flatnonzero(brk)
        counts = np.diff(np.r_[starts, kcodes.size])
        n_new = np.add.reduceat(is_new, starts)
        n_old = counts - n_new
        hmax = np.maximum.reduceat(hcodes, starts)
        hmin = np.minimum.reduceat(hcodes, starts)
        status = np.where(
            n_old == 0, "added",
            np.where(n_new == 0, "removed",
                     np.where(hmax != hmin, "changed", "unchanged")))
        keys = st[id_col].combine_chunks().take(
            pa.array(starts, pa.int64()))
        if not include_unchanged:
            keep = status != "unchanged"
            keys = keys.take(pa.array(np.flatnonzero(keep),
                                      pa.int64()))
            status = status[keep]
        return pa.table({id_col: keys,
                         "status": pa.array(status.tolist(),
                                            pa.string())})

    return both.groupby("part").map_groups(_diff,
                                           batch_format="pyarrow")


def export_corpus(index_dir: str, out_dir: str) -> int:
    """ExportCorpus.java analogue: write each LIVE document's stored
    original (``store_text`` indexes) — or the space-joined forward-
    index token stream when no content store exists — to
    ``<out_dir>/<quoted pid>.txt``. Pids are generation-stripped
    (updated docs live under ``url@g<n>`` in fwd — the export file
    keeps the logical pid). Files are written by the workers from
    their own batches (never driver-materialized) via temp-file +
    atomic rename; complete files are skipped so a crashed export
    resumes without trusting partial writes. Returns the doc count
    written or skipped-as-done."""
    import os
    import re as _re

    from blacklab_ray.query import IndexReader
    rd = IndexReader(index_dir)
    fwd = rd.fwd_dataset()
    stored = "text" in fwd.schema.names
    cols = ["doc_id", "url"] + (
        ["text"] if stored else ["terms", "tfs", "pos", "doc_len"])
    tombs = np.asarray(sorted(rd.tombstones), dtype=np.int64)
    os.makedirs(out_dir, exist_ok=True)

    def _write(batch: pa.Table) -> pa.Table:
        from urllib.parse import quote

        from blacklab_ray.codec.vbyte import decode_position_lists
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if tombs.size:
            live = ~np.isin(ids, tombs)
            if not live.all():
                batch = batch.filter(pa.array(live))
        if batch.num_rows == 0:
            return pa.table({"n": pa.array([0], pa.int64())})
        urls = batch.column("url").to_pylist()
        if stored:
            texts = batch.column("text").to_pylist()
        else:
            # ONE segmented decode for the whole batch (the
            # FwdIndexKwic pattern), then per-doc joins
            lens = batch.column("doc_len").to_numpy(
                zero_copy_only=False).astype(np.int64)
            total = int(lens.sum())
            starts = np.zeros(lens.size, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            terms_l = batch.column("terms").to_pylist()
            tfs_l = batch.column("tfs").to_pylist()
            pos_l = batch.column("pos").to_pylist()
            blob = b"".join(b for row in pos_l for b in row)
            cnt = np.array([t for row in tfs_l for t in row],
                           dtype=np.int64)
            flat = np.empty(total, dtype=object)
            flat[:] = ""
            if cnt.size:
                allpos = decode_position_lists(blob, cnt)
                row_of_list = np.repeat(
                    np.arange(lens.size, dtype=np.int64),
                    [len(x) for x in tfs_l])
                row_of_pos = np.repeat(row_of_list, cnt)
                term_of_pos = np.repeat(np.array(
                    [t for row in terms_l for t in row],
                    dtype=object), cnt)
                flat[starts[row_of_pos] + allpos] = term_of_pos
            texts = [" ".join(flat[s:s + n])
                     for s, n in zip(starts.tolist(), lens.tolist())]
        n = 0
        for pid, text in zip(urls, texts):
            pid = _re.sub(r"@g\d+$", "", str(pid))
            path = os.path.join(out_dir, quote(pid, safe="") + ".txt")
            if not os.path.exists(path):
                tmp = path + f".tmp{os.getpid()}"
                with open(tmp, "w", encoding="utf-8") as f:
                    f.write(text or "")
                os.replace(tmp, path)
            n += 1
        return pa.table({"n": pa.array([n], pa.int64())})

    parts = ray.data.read_parquet(
        os.path.join(index_dir, "fwd"), columns=cols).map_batches(
        _write, batch_format="pyarrow").take_all()
    return int(sum(r["n"] for r in parts))
