"""Training-shard export: corpus → packed token-id sequences on disk.

The end-to-end "make training data" pipeline the packing map exists
for: build a frequency vocabulary, map every document to token ids,
concatenate the corpus in doc-id order into one token stream, cut the
stream into fixed-length sequences, and write them as one Parquet file
per shard of ``seqs_per_shard`` sequences.

Scale shape — the token payload crosses the exchange exactly ONCE:

  1. ``build_vocab``: term-frequency groupby (narrow), top-V sort-limit
     → a driver-sized (term, token_id) table, ``ray.put`` once.
  2. ``write_pack_map``: the narrow two-pass prefix sum
     (:mod:`packing`), but each id-bucket group WRITES its sorted
     (doc_id, start_pos) rows to its own Parquet file (atomic rename)
     and returns a manifest row — so pass 3 can find any doc's stream
     offset with a pruned range read instead of a corpus-wide join.
  3. payload pass: ``map_batches`` actors tokenize to ids, gather each
     batch's ``start_pos`` from the pack map (per-bucket file cache —
     parquet reads prune to the buckets the batch actually touches),
     and flat-map every doc into per-shard slices.
  4. ``groupby(shard)``: each shard group sorts its slices by stream
     offset, concatenates, reshapes into ``(seq_len,)`` rows, pads the
     ragged global tail with ``PAD_ID``, and writes
     ``shard-NNNNNN.parquet`` (atomic rename, skip-if-complete resume).

Nothing corpus-sized touches the driver; the only all-to-all over the
ids payload is the shard groupby that the output layout requires.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from blacklab_ray.analysis.analyzers import tokenize_column
from blacklab_ray.pipelines.packing import bucket_plan, token_counts

PAD_ID = 0
UNK_ID = 1
FIRST_TERM_ID = 2
# with eos=True, EOS takes id 2 and vocab terms start at 3
EOS_ID = 2


def build_vocab(ds: ray.data.Dataset, size: int = 65536,
                text_col: str = "text",
                first_id: int = FIRST_TERM_ID) -> pa.Table:
    """Top-``size-first_id`` terms by (collection_tf DESC, term ASC)
    with ids ``first_id..``; ids 0/1 are PAD/UNK (and 2 is EOS when
    the export reserves it). Deterministic: ties break
    lexicographically. The table is driver-sized (V rows).

    tf only — one ``value_counts`` per batch, and the reduce runs as
    the repo's proven part-hash shape (hash64(term) % P partition key,
    one vectorized arrow group_by per partition) instead of a
    string-keyed ``groupby("term").sum()``: Ray's hash-shuffle
    aggregate took 31 s on 4.3M partial rows at bench scale where this
    runs in ~3 s. Each part holds a DISJOINT term set, so per-part
    top-V truncation inside the combine is exact and replaces a full
    Ray sort (driver sees ≤ P×V rows, sorted locally)."""

    def _tf_partial(batch: pa.Table) -> pa.Table:
        _, toks, _, _ = tokenize_column(batch.column(text_col))
        return _tf_rows(toks)

    tf = ds.map_batches(_tf_partial, batch_format="pyarrow")
    return _vocab_from_tf(tf, size, first_id)


def _tf_rows(toks: pa.Array) -> pa.Table:
    """(term, tf, part) partial rows from a flat token array."""
    from blacklab_ray.util import hash64_batch
    vc = pc.value_counts(toks)
    terms = vc.field(0)
    part = (hash64_batch(terms) % _TF_PARTS).astype(np.int64)
    return pa.table({"term": terms,
                     "tf": vc.field(1).cast(pa.int64()),
                     "part": pa.array(part, pa.int64())})


_TF_PARTS = 64


def _vocab_from_tf(tf_ds: ray.data.Dataset, size: int,
                   first_id: int = FIRST_TERM_ID) -> pa.Table:
    """Reduce (term, tf, part) partials to the final vocab table."""
    v = size - first_id

    def _combine(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.schema([("term", pa.string()),
                              ("tf", pa.int64())]).empty_table()
        agg = g.select(["term", "tf"]).group_by("term") \
            .aggregate([("tf", "sum")])
        idx = pc.sort_indices(agg, sort_keys=[("tf_sum", "descending"),
                                              ("term", "ascending")])
        agg = agg.take(idx[:v])
        return pa.table({"term": agg["term"],
                         "tf": agg["tf_sum"].cast(pa.int64())})

    parts = tf_ds.groupby("part").map_groups(
        _combine, batch_format="pyarrow").take_all()
    parts.sort(key=lambda r: (-r["tf"], r["term"]))
    parts = parts[:v]
    return pa.table({
        "term": pa.array([r["term"] for r in parts], pa.string()),
        "token_id": pa.array(
            range(first_id, first_id + len(parts)), pa.int32()),
        "collection_tf": pa.array([r["tf"] for r in parts],
                                  pa.int64()),
    })


def write_pack_map(ds: ray.data.Dataset, map_dir: str,
                   text_col: str = "text", id_col: str = "doc_id",
                   rows_per_bucket: int = 4_000_000,
                   extra_per_doc: int = 0) -> dict:
    """Materialize the packing map as per-bucket SORTED Parquet files
    plus ``ranges.json`` (bucket → id range / base offset) so the
    payload pass can gather ``start_pos`` with pruned reads."""
    counts = token_counts(ds, text_col, id_col,
                          extra_per_doc=extra_per_doc).materialize()
    return _write_pack_map_from_counts(counts, map_dir, id_col,
                                       rows_per_bucket)


def _write_pack_map_from_counts(counts: ray.data.Dataset, map_dir: str,
                                id_col: str = "doc_id",
                                rows_per_bucket: int = 4_000_000
                                ) -> dict:
    os.makedirs(map_dir, exist_ok=True)
    plan = bucket_plan(counts, id_col, rows_per_bucket)
    if plan is None:
        with open(os.path.join(map_dir, "ranges.json"), "w") as f:
            json.dump({"buckets": [], "lo": 0, "width": 1,
                       "total_tokens": 0}, f)
        return {"buckets": 0, "total_tokens": 0}
    lo, width, base = plan.lo, plan.width, plan.base

    def _attach(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array((ids - lo) // width, pa.int64()))

    def _write_bucket(group: pa.Table) -> pa.Table:
        out_schema = pa.schema([("bucket", pa.int64()),
                                ("id_lo", pa.int64()),
                                ("id_hi", pa.int64()),
                                ("rows", pa.int64()),
                                ("tokens", pa.int64())])
        if group.num_rows == 0:
            return out_schema.empty_table()
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        tok = group.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, tok = ids[order], tok[order]
        b = int((ids[0] - lo) // width)
        start = np.empty(ids.size, dtype=np.int64)
        start[0] = base[b]
        np.cumsum(tok[:-1], out=start[1:])
        start[1:] += base[b]
        path = os.path.join(map_dir, f"bucket-{b:06d}.parquet")
        if not os.path.exists(path):  # resume: bucket content is
            # deterministic, an existing file is already correct
            pq.write_table(pa.table({
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(tok, pa.int64()),
                "start_pos": pa.array(start, pa.int64()),
            }), path + ".tmp")
            os.replace(path + ".tmp", path)
        return pa.table({
            "bucket": pa.array([b], pa.int64()),
            "id_lo": pa.array([int(ids[0])], pa.int64()),
            "id_hi": pa.array([int(ids[-1])], pa.int64()),
            "rows": pa.array([ids.size], pa.int64()),
            "tokens": pa.array([int(tok.sum())], pa.int64()),
        })

    manifest = counts.map_batches(_attach, batch_format="pyarrow") \
        .groupby("bucket").map_groups(_write_bucket,
                                      batch_format="pyarrow").take_all()
    manifest.sort(key=lambda r: r["bucket"])
    total = int(plan.base[-1])
    with open(os.path.join(map_dir, "ranges.json"), "w") as f:
        json.dump({"lo": int(lo), "width": int(width),
                   "total_tokens": total, "buckets": manifest}, f)
    return {"buckets": len(manifest), "total_tokens": total}


def read_packed(out_dir: str) -> ray.data.Dataset:
    """The exported shards back as a Dataset (seq_id, tokens, n_real,
    doc_ids) — the training-loop entry point; shard files are
    independent Parquet so the read parallelizes per shard."""
    import glob as _glob
    files = sorted(_glob.glob(os.path.join(out_dir, "shard-*.parquet")))
    return ray.data.read_parquet(files)


def iter_training_batches(out_dir: str, batch_size: int,
                          drop_last: bool = True,
                          shuffle_seed: int | None = None,
                          shuffle_buffer_seqs: int = 0):
    """Yield ``(tokens, n_real)`` numpy batches — tokens shaped
    ``(batch_size, seq_len)`` int32 — streaming shard by shard (one
    shard resident at a time; Ray's iter_batches handles prefetch and
    backpressure).

    ``shuffle_seed`` turns on the standard two-level training shuffle
    (seeded, BIT-reproducible): global SHARD-file order permutation
    plus a seeded reservoir of ``shuffle_buffer_seqs`` sequences
    (default 8 × batch_size). Never a full ``random_shuffle()`` —
    that is an all-to-all over the whole token payload; two-level
    gives training-grade decorrelation at zero shuffle cost (shard
    assembly already interleaved docs). The seeded path reads shards
    itself in the permuted order (Ray-task prefetch, depth 4) because
    ``iter_batches(local_shuffle_seed=...)`` is only reproducible
    under ``preserve_order``, which is off by default and a global
    context switch."""
    if shuffle_seed is not None:
        yield from _iter_shuffled(out_dir, batch_size, drop_last,
                                  shuffle_seed, shuffle_buffer_seqs)
        return
    ds = read_packed(out_dir)
    for b in ds.iter_batches(batch_size=batch_size,
                             batch_format="pyarrow",
                             drop_last=drop_last):
        yield _shard_matrix(b)


def _shard_matrix(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    toks = tbl.column("tokens")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.values.to_numpy(zero_copy_only=False)
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    seq_len = int(offs[1] - offs[0]) if len(offs) > 1 else 0
    n = tbl.num_rows
    mat = flat[offs[0]:offs[0] + n * seq_len].reshape(n, seq_len)
    return mat, tbl.column("n_real").to_numpy(zero_copy_only=False)


def _iter_shuffled(out_dir: str, batch_size: int, drop_last: bool,
                   seed: int, buffer_seqs: int):
    """Deterministic two-level shuffle: permuted shard order (raw Ray
    read tasks, prefetch depth 4 — sequential consumption is inherent
    to a training iterator, so the Dataset API buys nothing here) +
    a seeded swap-pop reservoir over sequences."""
    import glob as _glob
    files = sorted(_glob.glob(os.path.join(out_dir, "shard-*.parquet")))
    rng = np.random.default_rng(seed)
    files = [files[i] for i in rng.permutation(len(files))]
    # an explicit buffer size is honored exactly; the 8x floor is the
    # DEFAULT (buffer_seqs unset/0), not an override
    cap = buffer_seqs if buffer_seqs > 0 else 8 * batch_size

    read = ray.remote(num_cpus=0.5)(pq.read_table)
    refs = [read.remote(f) for f in files[:4]]
    buf: list[tuple[np.ndarray, int]] = []
    out_rows: list[tuple[np.ndarray, int]] = []

    def _emit_from(row):
        out_rows.append(row)

    def _pour(mat, n_real):
        # per-row copies: a VIEW would pin its whole shard's plasma
        # buffer for as long as the row sits in the reservoir — the
        # copy bounds resident memory at cap × seq_len × 4 bytes
        for i in range(mat.shape[0]):
            buf.append((mat[i].copy(), int(n_real[i])))
            if len(buf) > cap:
                j = int(rng.integers(len(buf)))
                buf[j], buf[-1] = buf[-1], buf[j]
                _emit_from(buf.pop())

    for fi, f in enumerate(files):
        tbl = ray.get(refs[fi])
        refs[fi] = None      # drop the ref: unpin the shard from the
        #                      object store once consumed
        if fi + 4 < len(files):
            refs.append(read.remote(files[fi + 4]))
        _pour(*_shard_matrix(tbl))
        while len(out_rows) >= batch_size:
            chunk = out_rows[:batch_size]
            del out_rows[:batch_size]
            yield (np.stack([r[0] for r in chunk]),
                   np.array([r[1] for r in chunk], np.int64))
    while buf:                               # drain the reservoir
        j = int(rng.integers(len(buf)))
        buf[j], buf[-1] = buf[-1], buf[j]
        _emit_from(buf.pop())
    while len(out_rows) >= batch_size:
        chunk = out_rows[:batch_size]
        del out_rows[:batch_size]
        yield (np.stack([r[0] for r in chunk]),
               np.array([r[1] for r in chunk], np.int64))
    if out_rows and not drop_last:
        yield (np.stack([r[0] for r in out_rows]),
               np.array([r[1] for r in out_rows], np.int64))


class _SliceEmitter:
    """Actor-pool payload stage: tokenize a batch to ids, gather
    stream offsets from the pack map (per-bucket file cache), emit one
    row per (doc × overlapped shard) carrying that doc's id slice."""

    def __init__(self, vocab_ref, map_dir: str, shard_tokens: int,
                 text_col: str, id_col: str, cache_buckets: int = 64,
                 first_id: int = FIRST_TERM_ID,
                 eos_id: int | None = None,
                 ids_col: str | None = None):
        self._ids_col = ids_col
        if ids_col is None:
            vocab = ray.get(vocab_ref) \
                if not isinstance(vocab_ref, pa.Table) else vocab_ref
            self._terms = vocab.column("term").combine_chunks()
        self._first_id = first_id
        self._eos = eos_id
        self._map_dir = map_dir
        with open(os.path.join(map_dir, "ranges.json")) as f:
            self._ranges = json.load(f)
        self._shard_tokens = shard_tokens
        self._text, self._id = text_col, id_col
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._cache_cap = cache_buckets

    def _bucket_table(self, b: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self._cache.get(b)
        if hit is not None:
            return hit
        t = pq.read_table(
            os.path.join(self._map_dir, f"bucket-{b:06d}.parquet"),
            columns=[self._id, "start_pos"])
        pair = (t.column(self._id).to_numpy(),
                t.column("start_pos").to_numpy())
        if len(self._cache) >= self._cache_cap:  # evict oldest insert
            self._cache.pop(next(iter(self._cache)))
        self._cache[b] = pair
        return pair

    def _starts_for(self, ids: np.ndarray) -> np.ndarray:
        lo, width = self._ranges["lo"], self._ranges["width"]
        buckets = (ids - lo) // width
        out = np.empty(ids.size, dtype=np.int64)
        for b in np.unique(buckets):
            m = buckets == b
            bid, bstart = self._bucket_table(int(b))
            idx = np.searchsorted(bid, ids[m])
            if idx.size and (int(idx.max()) >= bid.size
                             or not np.array_equal(bid[idx], ids[m])):
                raise ValueError(
                    f"pack map bucket {b} does not cover this batch's "
                    f"doc ids — stale _pack_map for a different "
                    f"corpus?")
            out[m] = bstart[idx]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self._id).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if self._ids_col is not None:
            # precomputed token ids (any upstream tokenizer — BPE,
            # external): the flat stream and per-doc lengths come
            # straight off the list column, zero re-tokenization
            lst = batch.column(self._ids_col)
            if isinstance(lst, pa.ChunkedArray):
                lst = lst.combine_chunks()
            offs = lst.offsets.to_numpy(zero_copy_only=False)
            tid_np = lst.values.to_numpy(zero_copy_only=False) \
                [offs[0]:offs[-1]].astype(np.int32, copy=False)
            lens = np.diff(offs).astype(np.int64)
        else:
            parents, toks, _, lens = tokenize_column(
                batch.column(self._text))
            # term → token id: one index_in probe over the token
            # stream; misses become UNK. (A dictionary_encode-then-
            # probe-uniques variant A/B'd SLOWER — 24.7-26.4 s vs
            # 23.7 s at bench scale; the encode costs more than the
            # saved probes.)
            tid = pc.add(
                pc.fill_null(pc.index_in(toks, value_set=self._terms),
                             UNK_ID - self._first_id),
                self._first_id).cast(pa.int32())
            tid_np = tid.to_numpy(zero_copy_only=False)
            lens = np.asarray(lens, dtype=np.int64)
        if self._eos is not None:
            # one EOS after every doc (empty docs included) — inserted
            # at each doc's end position in the flat stream
            tid_np = np.insert(tid_np, np.cumsum(lens),
                               np.int32(self._eos))
            lens = lens + 1
        doc_starts_local = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(lens, out=doc_starts_local[1:])
        starts = self._starts_for(ids)
        S = self._shard_tokens
        nz = np.flatnonzero(lens)
        if nz.size == 0:
            return pa.table({
                "shard": pa.array([], pa.int64()),
                "start_pos": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "ids": pa.array([], pa.list_(pa.int32())),
            })
        d_start, d_len = starts[nz], lens[nz].astype(np.int64)
        first_shard = d_start // S
        last_shard = (d_start + d_len - 1) // S
        # one output row per (doc × overlapped shard), fully vectorized:
        # rows come out in (doc order, shard ascending), so their flat
        # token ranges are adjacent and disjoint — the ids list column
        # is a zero-copy re-offsetting of the batch's flat id stream
        reps = (last_shard - first_shard + 1).astype(np.int64)
        n_rows = int(reps.sum())
        run_start = np.cumsum(reps) - reps
        pos_in_run = np.arange(n_rows, dtype=np.int64) \
            - np.repeat(run_start, reps)
        row_shard = np.repeat(first_shard, reps) + pos_in_run
        row_d_start = np.repeat(d_start, reps)
        row_d_end = np.repeat(d_start + d_len, reps)
        row_lo = np.maximum(row_d_start, row_shard * S)
        row_hi = np.minimum(row_d_end, (row_shard + 1) * S)
        row_flat_lo = np.repeat(doc_starts_local[nz], reps) \
            + (row_lo - row_d_start)
        offsets = np.empty(n_rows + 1, dtype=np.int64)
        offsets[:-1] = row_flat_lo
        offsets[-1] = row_flat_lo[-1] + (row_hi[-1] - row_lo[-1])
        ids_list = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int64()).cast(pa.int32()),
            pa.array(tid_np, pa.int32()))
        return pa.table({
            "shard": pa.array(row_shard, pa.int64()),
            "start_pos": pa.array(row_lo, pa.int64()),
            "doc_id": pa.array(np.repeat(ids[nz], reps), pa.int64()),
            "ids": ids_list,
        })


def export_packed_sequences(ds: ray.data.Dataset, out_dir: str,
                            seq_len: int = 1024,
                            seqs_per_shard: int = 1024,
                            vocab: pa.Table | None = None,
                            vocab_size: int = 65536,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            rows_per_bucket: int = 4_000_000,
                            concurrency: int | None = None,
                            eos: bool = False,
                            ids_col: str | None = None,
                            n_vocab: int | None = None) -> dict:
    """Run the full export; returns corpus-level stats plus the shard
    manifest (also written to ``out_dir/manifest.json``).

    ``eos=True`` inserts one EOS delimiter (id ``EOS_ID``) after every
    document — the standard boundary signal packed training data
    carries — and shifts vocab term ids to start at ``EOS_ID + 1``.
    EOS tokens occupy stream positions like any token (counted in the
    pack map), so packing stays a pure prefix sum.

    ``ids_col`` names a precomputed list<int32> token-id column (any
    upstream tokenizer — ``bpe.encode_ids``, an external model's):
    the export packs those ids verbatim (no word vocab is built;
    pass ``n_vocab`` so the manifest records the id space). Vocab,
    UNK and delimiter policy then belong to the upstream tokenizer,
    so ``vocab``/``eos`` are rejected in this mode."""
    os.makedirs(out_dir, exist_ok=True)
    if ids_col is not None and (vocab is not None or eos):
        raise ValueError("ids_col mode packs precomputed ids verbatim"
                         " — vocab/eos belong to the upstream"
                         " tokenizer")
    if ids_col is not None and (n_vocab is None or n_vocab <= 0):
        raise ValueError("ids_col mode requires n_vocab (the upstream"
                         " tokenizer's id-space size) so the manifest"
                         " records a usable vocab_size")
    first_id = EOS_ID + 1 if eos else FIRST_TERM_ID
    if vocab is not None and vocab.num_rows:
        # a caller-supplied vocab defines its OWN id base — derive it
        # so shard ids always agree with the vocab's token_id column
        first_id = int(vocab.column("token_id")[0].as_py())
        if eos and first_id <= EOS_ID:
            raise ValueError(
                f"eos=True reserves id {EOS_ID} but the supplied vocab "
                f"assigns term ids from {first_id}; build it with "
                f"first_id={EOS_ID + 1}")
    extra = 1 if eos else 0
    # params stamp: the skip-if-complete resume is only valid for the
    # SAME packing parameters — a re-run with different seq_len/eos/
    # vocab over an existing out_dir must fail loudly, not silently
    # mix stale shard bytes with a fresh manifest
    params = {"seq_len": seq_len, "seqs_per_shard": seqs_per_shard,
              "eos": eos, "first_id": first_id,
              "vocab_size": (int(n_vocab or 0) if ids_col is not None
                             else vocab_size if vocab is None
                             else int(vocab.num_rows) + first_id)}
    if ids_col is not None:
        params["ids_col"] = ids_col
    params_path = os.path.join(out_dir, "params.json")
    if os.path.exists(params_path):
        with open(params_path) as f:
            prior = json.load(f)
        if prior != params:
            raise ValueError(
                f"out_dir {out_dir} holds an export with different "
                f"parameters ({prior} != {params}); use a fresh "
                f"directory or delete the old output")
    else:
        with open(params_path + ".tmp", "w") as f:
            json.dump(params, f)
        os.replace(params_path + ".tmp", params_path)
    map_dir = os.path.join(out_dir, "_pack_map")
    if ids_col is not None:
        def _id_counts(batch: pa.Table) -> pa.Table:
            lst = batch.column(ids_col)
            if isinstance(lst, pa.ChunkedArray):
                lst = lst.combine_chunks()
            return pa.table({
                id_col: batch.column(id_col).cast(pa.int64()),
                "n_tokens": pc.list_value_length(lst)
                .cast(pa.int64())})

        counts = ds.map_batches(_id_counts,
                                batch_format="pyarrow").materialize()
        map_stats = _write_pack_map_from_counts(counts, map_dir,
                                                id_col, rows_per_bucket)
        vocab = pa.table({"term": pa.array([], pa.string()),
                          "token_id": pa.array([], pa.int32()),
                          "collection_tf": pa.array([], pa.int64())})
    elif vocab is None:
        # ONE fused tokenize serves both narrow consumers: per-doc
        # counts (kind 0) for the pack map and per-part term
        # frequencies (kind 1) for the vocab — halves the pre-payload
        # corpus scans
        def _fused(batch: pa.Table) -> pa.Table:
            _, toks, _, lens = tokenize_column(batch.column(text_col))
            tf = _tf_rows(toks)
            n0, n1 = batch.num_rows, tf.num_rows
            return pa.table({
                "kind": pa.array([0] * n0 + [1] * n1, pa.int64()),
                id_col: pa.concat_arrays([
                    batch.column(id_col).cast(pa.int64())
                    .combine_chunks(), pa.nulls(n1, pa.int64())]),
                "n_tokens": pa.concat_arrays([
                    pa.array(lens + extra, pa.int64()),
                    pa.nulls(n1, pa.int64())]),
                "term": pa.concat_arrays([
                    pa.nulls(n0, pa.string()),
                    tf.column("term").combine_chunks()]),
                "tf": pa.concat_arrays([
                    pa.nulls(n0, pa.int64()),
                    tf.column("tf").combine_chunks()]),
                "part": pa.concat_arrays([
                    pa.nulls(n0, pa.int64()),
                    tf.column("part").combine_chunks()]),
            })

        pre = ds.map_batches(_fused, batch_format="pyarrow") \
            .materialize()

        def _only(kind: int, cols: list[str]):
            return pre.map_batches(
                lambda t, k=kind, c=cols: t.filter(
                    pc.equal(t["kind"], k)).select(c),
                batch_format="pyarrow")

        vocab = _vocab_from_tf(_only(1, ["term", "tf", "part"]),
                               vocab_size, first_id)
        counts = _only(0, [id_col, "n_tokens"]).materialize()
        map_stats = _write_pack_map_from_counts(counts, map_dir,
                                                id_col, rows_per_bucket)
    else:
        map_stats = write_pack_map(ds, map_dir, text_col, id_col,
                                   rows_per_bucket, extra_per_doc=extra)
    vocab_ref = ray.put(vocab)
    total = map_stats["total_tokens"]
    S = seq_len * seqs_per_shard
    n_seqs = -(-total // seq_len) if total else 0
    n_shards = -(-total // S) if total else 0

    slices = ds.map_batches(
        _SliceEmitter,
        fn_constructor_args=(vocab_ref, map_dir, S, text_col, id_col,
                             64, first_id, EOS_ID if eos else None,
                             ids_col),
        batch_format="pyarrow",
        concurrency=concurrency or (1, 32))

    def _assemble(group: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            ("shard", pa.int64()), ("path", pa.string()),
            ("n_seqs", pa.int64()), ("n_real_tokens", pa.int64()),
            ("n_pad", pa.int64())])
        if group.num_rows == 0:
            return out_schema.empty_table()
        shard = int(group.column("shard")[0].as_py())
        starts = group.column("start_pos").to_numpy(zero_copy_only=False)
        order = np.argsort(starts, kind="stable")
        ids_col = group.column("ids")
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        # .values (not .flatten()) so offsets index correctly even if
        # the shuffle delivered a sliced array
        flat = ids_col.values.to_numpy(zero_copy_only=False)
        offs = ids_col.offsets.to_numpy(zero_copy_only=False)
        parts = [flat[offs[i]:offs[i + 1]] for i in order]
        stream = np.concatenate(parts) if parts else \
            np.empty(0, dtype=np.int32)
        n_real = stream.size
        n_seq_here = -(-n_real // seq_len)
        pad = n_seq_here * seq_len - n_real
        if pad:
            stream = np.concatenate(
                [stream, np.full(pad, PAD_ID, dtype=np.int32)])
        mat = stream.reshape(n_seq_here, seq_len)
        real = np.full(n_seq_here, seq_len, dtype=np.int32)
        if pad:
            real[-1] = seq_len - pad
        path = os.path.join(out_dir, f"shard-{shard:06d}.parquet")
        if not os.path.exists(path):  # resume contract
            seq_ids = shard * seqs_per_shard + np.arange(n_seq_here,
                                                         dtype=np.int64)
            # zero-copy list column: uniform offsets over the padded
            # stream (a .tolist() here pushed ~1M ints through Python
            # per shard)
            tok_col = pa.ListArray.from_arrays(
                pa.array(np.arange(n_seq_here + 1, dtype=np.int64)
                         * seq_len).cast(pa.int32()),
                pa.array(stream, pa.int32()))
            # provenance: which docs contributed tokens to each
            # sequence (attribution / opt-out lineage). Rows are
            # slice-sized; each covers local sequences
            # lo//L..(hi-1)//L — the same repeat expansion as the
            # slice emitter, then a stable per-seq grouping
            shard_lo = shard * seq_len * seqs_per_shard
            s_lo = starts[order] - shard_lo
            s_len = (offs[order + 1] - offs[order]).astype(np.int64)
            nz_r = np.flatnonzero(s_len)
            fs = s_lo[nz_r] // seq_len
            ls = (s_lo[nz_r] + s_len[nz_r] - 1) // seq_len
            reps = ls - fs + 1
            npairs = int(reps.sum())
            run0 = np.cumsum(reps) - reps
            p_seq = np.repeat(fs, reps) + (
                np.arange(npairs, dtype=np.int64) - np.repeat(run0, reps))
            p_doc = np.repeat(
                group.column("doc_id").to_numpy(
                    zero_copy_only=False)[order][nz_r], reps)
            sorder = np.argsort(p_seq, kind="stable")
            seq_counts = np.bincount(p_seq, minlength=n_seq_here)
            prov_offs = np.zeros(n_seq_here + 1, dtype=np.int64)
            np.cumsum(seq_counts, out=prov_offs[1:])
            prov_col = pa.ListArray.from_arrays(
                pa.array(prov_offs, pa.int64()).cast(pa.int32()),
                pa.array(p_doc[sorder], pa.int64()))
            tbl = pa.table({
                "seq_id": pa.array(seq_ids, pa.int64()),
                "tokens": tok_col,
                "n_real": pa.array(real, pa.int32()),
                "doc_ids": prov_col,
            })
            pq.write_table(tbl, path + ".tmp")
            os.replace(path + ".tmp", path)
        return pa.table({
            "shard": pa.array([shard], pa.int64()),
            "path": pa.array([path], pa.string()),
            "n_seqs": pa.array([n_seq_here], pa.int64()),
            "n_real_tokens": pa.array([int(n_real)], pa.int64()),
            "n_pad": pa.array([int(pad)], pa.int64()),
        })

    manifest = slices.groupby("shard").map_groups(
        _assemble, batch_format="pyarrow").take_all()
    manifest.sort(key=lambda r: r["shard"])
    stats = {
        "total_tokens": total,
        "seq_len": seq_len,
        "n_sequences": n_seqs,
        "n_shards": n_shards,
        "vocab_size": (int(n_vocab or 0) if ids_col is not None
                       else int(vocab.num_rows) + first_id),
        "eos": eos,
        "shards": manifest,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(stats, f)
    return stats
