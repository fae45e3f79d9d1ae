"""Explicit hash exchange for the postings shuffle (map/reduce on raw Ray).

The postings build needs a hash-partitioned exchange, not a sort:
``Dataset.groupby`` implements group-by via a global sort, which at bench
scale costs more than the rest of the stage combined and regresses with
added CPUs. This module is the one place we drop below the Dataset API
(per the Ray guidance: raw tasks only where the Dataset API can't express
the semantics efficiently) and implement the textbook two-phase shuffle:

- M map tasks: read a chunk of forward-index files, explode to posting
  partials, split by ``part = gkey % P`` and return P sub-tables
  (``num_returns=P`` — each object lands in the store once).
- P reduce tasks: concat their M sub-tables, group by gkey in numpy,
  pack segments (``build_segments``) and write their own Parquet files
  under ``postings/bucket=K/`` — the same layout the query side prunes.

Every reduce partition writes independently and records lineage, giving
true per-partition resume (north_rule checkpoint requirement): a re-run
skips reduce parts whose manifest entry is complete.

Determinism: map chunking is a pure function of the sorted file list;
reduce output depends only on the union of its rows (build_segments
sorts), so the index bytes are independent of scheduling order.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from blacklab_ray.index.postings import ExplodePostings, build_segments

FWD_COLUMNS = ["doc_id", "norm", "terms", "tfs", "pos"]


def _fwd_columns(annot_cols) -> list[str]:
    return ["doc_id", "norm", *annot_cols]


def _encode_terms_as_codes(tbl: pa.Table) -> tuple[pa.Table, pa.Table]:
    """Replace the term string column with map-local int32 codes.

    Term strings are ~30% of exchange bytes and the most expensive thing
    to gather/sort; at 10^12 docs you never shuffle strings. Returns
    (rows-with-term_code, dictionary-table(term) indexed by code).
    """
    d = pc.dictionary_encode(tbl.column("term").combine_chunks())
    codes = d.indices.cast(pa.int32())
    rows = tbl.drop_columns(["term"]).append_column("term_code", codes)
    vocab = pa.table({"term": d.dictionary})
    return rows, vocab


def _encode_terms_incremental(tbl: pa.Table, vocab_index: dict,
                              vocab_terms: list) -> pa.Table:
    """Per-batch term→code encoding against a growing map-local
    dictionary (first-occurrence order, same contract as
    _encode_terms_as_codes). Lets the fused map encode each batch as
    it streams instead of holding raw term strings for the whole
    chunk; the dict lookup touches only the batch's UNIQUE terms."""
    d = pc.dictionary_encode(tbl.column("term").combine_chunks())
    local = d.dictionary.to_pylist()
    remap = np.empty(len(local), np.int64)
    for i, t in enumerate(local):
        c = vocab_index.get(t)
        if c is None:
            c = len(vocab_terms)
            vocab_index[t] = c
            vocab_terms.append(t)
        remap[i] = c
    codes = remap[d.indices.to_numpy(zero_copy_only=False)] \
        .astype(np.int32)
    return tbl.drop_columns(["term"]).append_column(
        "term_code", pa.array(codes, pa.int32()))


def _part_of(gkey: np.ndarray, n_parts: int) -> np.ndarray:
    """Reduce-part assignment: multiplicative hash of gkey.

    NOT ``gkey % n_parts`` — gkey = bucket * n_salts + salt, and when
    n_parts is a multiple of n_salts that modulus collapses all salt-0
    (i.e. every non-hot term's) mass onto n_salts of the parts: one
    profiled reduce held 3.2M of 29M rows while its neighbor held ~none.
    """
    h = (gkey.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    return ((h >> np.uint64(32)).astype(np.int64)) % n_parts


def _split_by_part(tbl: pa.Table, n_parts: int, n_salts: int) -> list:
    gkey = tbl.column("gkey").to_numpy(zero_copy_only=False)
    part = _part_of(gkey, n_parts)
    order = np.argsort(part, kind="stable")
    sorted_tbl = tbl.take(pa.array(order))
    counts = np.bincount(part, minlength=n_parts)
    offsets = np.zeros(n_parts + 1, dtype=np.int64)
    offsets[1:] = np.cumsum(counts)
    return [sorted_tbl.slice(int(offsets[i]),
                             int(offsets[i + 1] - offsets[i]))
            for i in range(n_parts)]


def _set_single_threaded_arrow():
    from blacklab_ray.util import pin_worker_arrow_threads
    pin_worker_arrow_threads()


def _map_explode(paths: list[str], n_parts: int, num_buckets: int,
                 n_salts: int, hot_terms,
                 annot_cols=("terms", "tfs", "pos"),
                 mv_cols=None) -> list:
    """Returns n_parts part-tables + the map-local term dictionary as the
    final (index n_parts) return value."""
    _set_single_threaded_arrow()
    explode = ExplodePostings(num_buckets=num_buckets, n_salts=n_salts,
                              hot_terms=hot_terms, annot_cols=annot_cols,
                              mv_cols=mv_cols)
    outs = []
    cols = _fwd_columns(annot_cols) + list(mv_cols or ())
    for p in paths:
        tbl = pq.read_table(p, columns=cols, use_threads=False)
        outs.append(explode(tbl))
    merged = pa.concat_tables(outs) if outs else None
    if merged is None or merged.num_rows == 0:
        return [None] * (n_parts + 1)
    rows, vocab = _encode_terms_as_codes(merged.combine_chunks())
    return _split_by_part(rows, n_parts, n_salts) + [vocab]


def _reduce_build(part_id: int, out_dir: str, block_size: int,
                  max_seg_postings: int, n_salts: int, n_maps: int,
                  part_suffix: str, terms_parts_name: str, codec: str,
                  *objs) -> dict:
    _set_single_threaded_arrow()
    tables = list(objs[:n_maps])      # aligned with vocabs by map index
    vocabs = list(objs[n_maps:])
    live = [(i, t) for i, t in enumerate(tables)
            if t is not None and t.num_rows]
    if not live:
        return {"part": part_id, "segments": 0, "postings": 0}
    # global term codes: concat per-map vocabularies, dedupe once (C++),
    # then offset+remap each table's map-local codes
    vocab_sizes = [len(vocabs[i]["term"]) if vocabs[i] is not None else 0
                   for i in range(n_maps)]
    offsets = np.zeros(n_maps + 1, dtype=np.int64)
    offsets[1:] = np.cumsum(vocab_sizes)
    concat_vocab = pa.concat_tables(
        [v for v in vocabs if v is not None])["term"].combine_chunks()
    dvocab = pc.dictionary_encode(concat_vocab)
    concat_to_global = dvocab.indices.to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    global_vocab = dvocab.dictionary
    code_arrays = []
    for i, t in live:
        local = t.column("term_code").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        code_arrays.append(concat_to_global[local + offsets[i]])
    gcodes = np.concatenate(code_arrays)
    t = pa.concat_tables([t.drop_columns(["term_code"])
                          for _, t in live]).combine_chunks()
    gkey = t.column("gkey").to_numpy(zero_copy_only=False)
    order = np.argsort(gkey, kind="stable")
    t = t.take(pa.array(order))
    gcodes = gcodes[order]
    gkey = gkey[order]
    bounds = np.flatnonzero(np.diff(gkey)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [gkey.size]))
    seg_tables = []
    for s, e in zip(starts.tolist(), ends.tolist()):
        seg_tables.append(build_segments(
            t.slice(s, e - s), block_size, max_seg_postings, n_salts,
            codes=gcodes[s:e], vocab=global_vocab, codec=codec))
    segs = pa.concat_tables(seg_tables)
    # per-part term stats (term, df, ctf) — the terms side table is
    # finished on the driver from these, avoiding a whole extra
    # groupby pipeline over the postings afterwards
    stats = segs.select(["term", "df_seg", "ctf_seg"]).group_by("term") \
        .aggregate([("df_seg", "sum"), ("ctf_seg", "sum")])
    tdir = os.path.join(os.path.dirname(out_dir.rstrip("/")),
                        terms_parts_name)
    os.makedirs(tdir, exist_ok=True)
    tpath = os.path.join(tdir, f"part-{part_id:05d}{part_suffix}.parquet")
    pq.write_table(stats, tpath + ".tmp")
    os.replace(tpath + ".tmp", tpath)
    # one file per (bucket, reduce-part) under the hive layout the
    # query side prunes on
    buckets = segs.column("bucket").to_numpy(zero_copy_only=False)
    n_segments = 0
    for b in np.unique(buckets):
        sub = segs.filter(pa.compute.equal(segs["bucket"], int(b)))
        sub = sub.drop_columns(["bucket"])
        bdir = os.path.join(out_dir, f"bucket={int(b)}")
        os.makedirs(bdir, exist_ok=True)
        path = os.path.join(bdir,
                            f"part-{part_id:05d}{part_suffix}.parquet")
        pq.write_table(sub, path + ".tmp", row_group_size=1024)
        os.replace(path + ".tmp", path)
        n_segments += sub.num_rows
    return {"part": part_id, "segments": int(n_segments),
            "postings": int(t.num_rows)}


def _map_fused(paths: list[str], fwd_dir: str, chunk_id: int,
               n_parts: int, num_buckets: int, n_salts: int, hot_terms,
               extract_html: bool, trust_text: bool, id_column: str,
               paragraph_spans: bool, sentence_spans: bool,
               sensitive: bool, batch_size: int,
               analyzer: str = "standard",
               annotations: tuple = (),
               store_text: bool = False) -> list:
    """Fused single-pass map: pages chunk → extract → tokenize → write
    the fwd shard (atomic, deterministic name) → explode → split.

    One pass over the input: the forward-index write overlaps the
    exchange instead of being a separate stage with a disk round-trip
    between them (ROADMAP 'exchange streaming'). Returns the same
    (parts..., vocab) contract as _map_explode.

    Bounded buffering (ROADMAP 'fused backpressure'): the fwd shard
    streams through a ParquetWriter batch-by-batch and exploded
    partials are term-code-encoded against a growing map-local
    dictionary and part-split per batch — the only chunk-sized state
    is the int-encoded per-part accumulators (the inherent return
    value). Raw page text, fwd tables and string postings never pile
    up across the chunk, which is what lost fused the >1-wave regime
    in round 2 (staged 111 s vs fused 121-245 s at 1M docs under
    memory pressure)."""
    _set_single_threaded_arrow()
    from blacklab_ray.stages.extract import HtmlExtractor
    from blacklab_ray.stages.tokenize import TokenizeForwardIndex
    extractor = HtmlExtractor(trust_text=trust_text) if extract_html \
        else None
    # analyzer + annotations MUST be threaded through: dropping them
    # silently indexed custom-analyzer builds with the standard
    # analyzer and broke stage-3b annotation exchanges (ADVICE r2 #2)
    tok = TokenizeForwardIndex(id_column=id_column,
                               paragraph_spans=paragraph_spans,
                               sentence_spans=sentence_spans,
                               sensitive=sensitive,
                               analyzer=analyzer,
                               annotations=annotations,
                               store_text=store_text)
    explode = ExplodePostings(num_buckets=num_buckets, n_salts=n_salts,
                              hot_terms=hot_terms)
    writer = None
    fpath = os.path.join(fwd_dir, f"part-{chunk_id:05d}.parquet")
    vocab_index: dict = {}
    vocab_terms: list = []
    part_accum: list[list] = [[] for _ in range(n_parts)]
    for p in paths:
        pages = pq.read_table(p, use_threads=False)
        for lo in range(0, pages.num_rows, batch_size):
            batch = pages.slice(lo, batch_size)
            if extractor is not None:
                batch = extractor(batch)
            fwd = tok(batch)
            if writer is None:
                os.makedirs(fwd_dir, exist_ok=True)
                writer = pq.ParquetWriter(fpath + ".tmp", fwd.schema)
            writer.write_table(fwd)
            ex = explode(fwd)
            if ex.num_rows == 0:
                continue
            rows = _encode_terms_incremental(ex, vocab_index,
                                             vocab_terms)
            for part, piece in enumerate(
                    _split_by_part(rows, n_parts, n_salts)):
                if piece.num_rows:
                    part_accum[part].append(piece)
    if writer is not None:
        writer.close()
        os.replace(fpath + ".tmp", fpath)  # atomic resume contract
    if not vocab_terms:
        return [None] * (n_parts + 1)
    vocab = pa.table({"term": pa.array(vocab_terms, pa.string())})
    parts = [pa.concat_tables(ps).combine_chunks() if ps else None
             for ps in part_accum]
    return parts + [vocab]


def run_fused_build(page_paths: list[str], index_dir: str, *,
                    num_buckets: int, n_salts: int, hot_terms,
                    block_size: int, max_seg_postings: int,
                    extract_html: bool, trust_text: bool, id_column: str,
                    codec: str = "vbyte",
                    paragraph_spans: bool, sentence_spans: bool,
                    sensitive: bool, batch_size: int,
                    n_parts: int | None = None,
                    files_per_map: int | None = None,
                    analyzer: str = "standard",
                    annotations: tuple = (),
                    store_text: bool = False) -> dict:
    """Single-pass build: pages → (fwd shards + postings) in one wave of
    map tasks feeding the standard reduces. Returns per-part lineage."""
    files = sorted(page_paths)
    fwd_dir = os.path.join(index_dir, "fwd")
    out_dir = os.path.join(index_dir, "postings")
    if n_parts is None:
        n_parts = num_buckets
    n_parts = max(2, n_parts)
    if files_per_map is None and files:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        avg_sz = max(1, sum(os.path.getsize(f) for f in files)
                     // len(files))
        # pages carry html AND each map buffers its chunk's fwd +
        # exploded partials: small chunks balance the wave (large-map
        # stragglers measured 259s vs 121s on the 1M-doc corpus)
        by_mem = max(1, (64 << 20) // avg_sz)
        files_per_map = max(1, min(round(len(files) / ncpu) or 1,
                                   by_mem, 64))
    files_per_map = files_per_map or 4
    chunks = [files[i:i + files_per_map]
              for i in range(0, len(files), files_per_map)]
    map_task = ray.remote(num_returns=n_parts + 1)(_map_fused)
    reduce_task = ray.remote(_reduce_build)
    map_out = [map_task.remote(c, fwd_dir, ci, n_parts, num_buckets,
                               n_salts, hot_terms, extract_html,
                               trust_text, id_column, paragraph_spans,
                               sentence_spans, sensitive, batch_size,
                               analyzer, annotations, store_text)
               for ci, c in enumerate(chunks)]
    vocab_refs = [m[n_parts] for m in map_out]
    reduce_refs = []
    for p in range(n_parts):
        part_inputs = [m[p] for m in map_out]
        reduce_refs.append(reduce_task.remote(
            p, out_dir, block_size, max_seg_postings, n_salts,
            len(map_out), "", "terms_parts", codec,
            *part_inputs, *vocab_refs))
    results = ray.get(reduce_refs)
    return {str(r["part"]): {"complete": True,
                             "segments": r["segments"],
                             "postings": r["postings"]}
            for r in results}


def run_postings_exchange(fwd_dir: str, out_dir: str, *, num_buckets: int,
                          n_salts: int, hot_terms, block_size: int,
                          max_seg_postings: int,
                          codec: str = "vbyte",
                          n_parts: int | None = None,
                          files_per_map: int | None = None,
                          completed_parts: set[int] | None = None,
                          part_suffix: str = "",
                          annot_cols: tuple = ("terms", "tfs", "pos"),
                          terms_parts_name: str = "terms_parts",
                          mv_cols: tuple | None = None) -> dict:
    """Run the map/reduce postings exchange; returns per-part lineage.

    ``completed_parts`` (from the manifest) are skipped — their output
    files are already on disk (per-partition resume).

    ``files_per_map=None`` auto-sizes maps to ~one wave across the
    cluster's CPUs (fewer, bigger maps amortize per-batch overhead —
    measured 131.7s → 83.4s on a 550M-token exchange), capped so a map's
    input stays ≤ ~256 MB of fwd Parquet.
    """
    files = sorted(os.path.join(fwd_dir, f) for f in os.listdir(fwd_dir)
                   if f.endswith(".parquet"))
    if n_parts is None:
        n_parts = num_buckets
    n_parts = max(2, n_parts)  # num_returns semantics need >= 2
    completed = completed_parts or set()
    if files_per_map is None and files:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        avg_sz = max(1, sum(os.path.getsize(f) for f in files)
                     // len(files))
        by_mem = max(1, (256 << 20) // avg_sz)
        files_per_map = max(1, min(round(len(files) / ncpu) or 1,
                                   by_mem, 64))
    files_per_map = files_per_map or 4
    chunks = [files[i:i + files_per_map]
              for i in range(0, len(files), files_per_map)]

    map_task = ray.remote(num_returns=n_parts + 1)(_map_explode)
    reduce_task = ray.remote(_reduce_build)

    map_out = [map_task.remote(c, n_parts, num_buckets, n_salts,
                               hot_terms, annot_cols, mv_cols)
               for c in chunks]
    vocab_refs = [m[n_parts] for m in map_out]
    # transpose: refs per part (+ every map's term dictionary)
    reduce_refs = []
    for p in range(n_parts):
        if p in completed:
            continue
        part_inputs = [m[p] for m in map_out]
        reduce_refs.append(reduce_task.remote(
            p, out_dir, block_size, max_seg_postings, n_salts,
            len(map_out), part_suffix, terms_parts_name, codec,
            *part_inputs, *vocab_refs))
    results = ray.get(reduce_refs)
    return {str(r["part"]): {"complete": True,
                             "segments": r["segments"],
                             "postings": r["postings"]}
            for r in results}
