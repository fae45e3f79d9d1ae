"""Posting-list segment construction: explode + shuffle + block encode.

The central all-to-all of the engine (SURVEY §7 milestone 1): forward-index
rows (doc-major) are exploded to (term, doc) partials, shuffled on a salted
term hash, and each group is packed into compressed, block-skippable
posting segments — the direction-reversed analogue of BlackLab's codec,
which inverts term-major Lucene postings into a doc-major forward index
(engine/src/main/java/nl/inl/blacklab/codec/BlackLab40PostingsWriter.java:222-335).

Skew handling (north_rule): hot terms (stopword-class, detected or
declared) are salted across ``n_salts`` shuffle groups keyed by a hash of
doc_id, so no single groupby task receives a whole stopword posting list;
each (term, salt) group becomes an independent doc-ascending segment, and
segments longer than ``max_seg_postings`` are further split by doc range.
Query-time k-way merge across a term's segments restores the full list
(mirrors BlackLab's per-Lucene-segment design merged at search time,
search/results/HitsFromQuery.java:109-123).

Block layout per segment: fixed ``block_size`` postings per block with
``(last_doc, max_tf, min_norm)`` skip/upper-bound metadata — the block-max
data WAND needs: score(tf, norm) is increasing in tf and decreasing in
norm, so ``bound = idf * S(max_tf, min_norm)`` dominates every posting in
the block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from blacklab_ray.analysis.analyzers import STOPWORDS
from blacklab_ray.codec.vbyte import vbyte_encode
from blacklab_ray.stages.tokenize import hash64

BLOCK_SIZE = 128
DEFAULT_BUCKETS = 32
DEFAULT_SALTS = 8
MAX_SEG_POSTINGS = 1 << 20

BLOCK_STRUCT = pa.struct([
    ("last_doc", pa.int64()),
    ("max_tf", pa.int32()),
    ("min_norm", pa.int32()),
    ("n", pa.int32()),
    ("docs", pa.binary()),
    ("tfs", pa.binary()),
    ("norms", pa.binary()),
    ("pos", pa.binary()),
])

SEGMENT_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("bucket", pa.int32()),
    ("salt", pa.int32()),
    ("seg", pa.int32()),           # doc-range split index within (term,salt)
    ("df_seg", pa.int64()),
    ("ctf_seg", pa.int64()),
    ("first_doc", pa.int64()),
    ("last_doc", pa.int64()),
    ("blocks", pa.list_(BLOCK_STRUCT)),
])


def term_bucket_array(terms: pa.Array, num_buckets: int) -> np.ndarray:
    """Vectorized stable bucket per term (hash64 over batch-unique terms)."""
    from blacklab_ray.util import hash64_batch
    d = pc.dictionary_encode(terms)
    uniq_buckets = (hash64_batch(d.dictionary)
                    % num_buckets).astype(np.int64)
    return uniq_buckets[d.indices.to_numpy(zero_copy_only=False)]


def _plain(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def _merge_duplicate_doc_terms(tbl: pa.Table, codes: np.ndarray) -> pa.Table:
    """Collapse duplicate (term, doc) rows into one posting row
    (tf summed, position blobs decoded/merged/re-encoded).

    Only reachable on multivalue builds, and only does real work when a
    secondary value string collides with a token of the SAME document —
    the no-duplicate fast path is one lexsort + one boolean reduction.
    """
    from blacklab_ray.codec.vbyte import vbyte_decode, vbyte_encode
    doc = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((doc, codes))
    c = codes[order]
    d = doc[order]
    if c.size == 0:
        return tbl
    new_grp = np.empty(c.size, dtype=bool)
    new_grp[0] = True
    np.logical_or(c[1:] != c[:-1], d[1:] != d[:-1], out=new_grp[1:])
    if new_grp.all():
        return tbl
    starts = np.flatnonzero(new_grp)
    sizes = np.diff(np.append(starts, c.size))
    sorted_tbl = tbl.take(pa.array(order))
    tf = sorted_tbl.column("tf").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    tf_out = np.add.reduceat(tf, starts)
    base = sorted_tbl.take(pa.array(starts))
    posbin = sorted_tbl.column("posbin").combine_chunks()
    bufs = posbin.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int32)[
        posbin.offset: posbin.offset + len(posbin) + 1].astype(np.int64)
    data = bufs[2]
    merged: dict[int, bytes] = {}
    for gi in np.flatnonzero(sizes > 1).tolist():
        s, n = int(starts[gi]), int(sizes[gi])
        pos_all = np.sort(np.concatenate([
            np.cumsum(vbyte_decode(
                np.frombuffer(data, np.uint8,
                              count=int(off[j + 1] - off[j]),
                              offset=int(off[j]))))
            for j in range(s, s + n)]))
        deltas = np.empty(pos_all.size, dtype=np.int64)
        deltas[0] = pos_all[0]
        np.subtract(pos_all[1:], pos_all[:-1], out=deltas[1:])
        merged[gi] = vbyte_encode(deltas)
    base_posbin = base.column("posbin").to_pylist()
    for gi, blob in merged.items():
        base_posbin[gi] = blob
    return base.set_column(
        base.schema.get_field_index("tf"), "tf",
        pa.array(tf_out, pa.int32())
    ).set_column(
        base.schema.get_field_index("posbin"), "posbin",
        pa.array(base_posbin, pa.binary()))


class ExplodePostings:
    """``map_batches`` stage: forward-index rows → posting partial rows.

    Output: ``gkey:int64`` (bucket * n_salts + salt — the shuffle key),
    ``bucket, term, doc_id, tf, norm, posbin``.
    """

    def __init__(self, num_buckets: int = DEFAULT_BUCKETS,
                 n_salts: int = DEFAULT_SALTS,
                 hot_terms: tuple[str, ...] | None = None,
                 hot_df_frac: float = 0.05,
                 annot_cols: tuple[str, str, str] = ("terms", "tfs",
                                                    "pos"),
                 mv_cols: tuple[str, str, str] | None = None):
        self._buckets = num_buckets
        self._salts = n_salts
        self._cols = annot_cols
        # secondary multi-values folded into the SAME explode so a
        # synonym string equal to a real token of the same doc merges
        # into one (term, doc) posting row here — after the shuffle the
        # two could land in different salt groups (frequency-adaptive
        # salting is batch-local) and duplicate the doc across segments
        self._mv_cols = mv_cols
        self._hot = frozenset(STOPWORDS if hot_terms is None else hot_terms)
        # frequency-adaptive salting: any term matching > hot_df_frac of
        # this batch's docs is salted too. Correct under local decisions:
        # each (term, doc) pair is globally unique, so whatever rule its
        # batch applies, it lands in exactly one shuffle group and the
        # term's segments stay doc-disjoint. The static stopword list
        # alone missed the Zipf mid-head (profiled reduce skew: 3.5M-row
        # part vs 20k-row part on the synthetic corpus).
        self._hot_frac = hot_df_frac

    def __call__(self, batch: pa.Table) -> pa.Table:
        from blacklab_ray.util import pin_worker_arrow_threads
        pin_worker_arrow_threads()
        terms_col = batch.column(self._cols[0]).combine_chunks()
        flat_terms = pc.list_flatten(terms_col)
        parents = pc.list_parent_indices(terms_col).to_numpy(
            zero_copy_only=False)
        flat_tfs = pc.list_flatten(batch.column(self._cols[1]))
        flat_pos = pc.list_flatten(batch.column(self._cols[2]))
        mv = (self._mv_cols if self._mv_cols
              and self._mv_cols[0] in batch.column_names else None)
        if mv is not None:
            mv_col = batch.column(mv[0]).combine_chunks()
            mflat = pc.list_flatten(mv_col)
            if len(mflat):
                mparents = pc.list_parent_indices(mv_col).to_numpy(
                    zero_copy_only=False)
                flat_terms = pa.concat_arrays(
                    [_plain(flat_terms), _plain(mflat)])
                parents = np.concatenate([parents, mparents])
                flat_tfs = pa.concat_arrays(
                    [_plain(flat_tfs),
                     _plain(pc.list_flatten(
                         batch.column(mv[1]).combine_chunks()))])
                flat_pos = pa.concat_arrays(
                    [_plain(flat_pos),
                     _plain(pc.list_flatten(
                         batch.column(mv[2]).combine_chunks()))])
            else:
                mv = None
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        norms = batch.column("norm").to_numpy(zero_copy_only=False)
        doc_rep = doc_ids[parents]
        norm_rep = norms[parents]

        d = pc.dictionary_encode(flat_terms)
        uniq = d.dictionary.to_pylist()
        codes = d.indices.to_numpy(zero_copy_only=False)
        from blacklab_ray.util import hash64_batch
        uniq_buckets = (hash64_batch(d.dictionary)
                        % self._buckets).astype(np.int64)
        uniq_hot = np.array([t in self._hot for t in uniq], dtype=bool)
        if self._hot_frac and batch.num_rows:
            df_local = np.bincount(codes, minlength=len(uniq))
            uniq_hot |= df_local > max(64.0,
                                       self._hot_frac * batch.num_rows)
        bucket = uniq_buckets[codes]
        hot = uniq_hot[codes]
        salt = np.zeros(doc_rep.size, dtype=np.int64)
        if self._salts > 1:
            salt[hot] = (doc_rep[hot] * np.int64(2654435761)
                         & np.int64(0x7FFFFFFF)) % self._salts
        gkey = bucket * self._salts + salt
        # bucket/salt are NOT shipped through the shuffle — they are
        # recomputed from gkey in build_segments (shuffle bytes matter:
        # 5.7M rows/20k docs at bench scale)
        out = pa.table({
            "gkey": pa.array(gkey, pa.int64()),
            "term": flat_terms,
            "doc_id": pa.array(doc_rep, pa.int64()),
            "tf": flat_tfs,
            "norm": pa.array(norm_rep.astype(np.int32), pa.int32()),
            "posbin": flat_pos,
        })
        if mv is not None:
            out = _merge_duplicate_doc_terms(out, codes)
        return out


def build_segments(group: pa.Table, block_size: int = BLOCK_SIZE,
                   max_seg_postings: int = MAX_SEG_POSTINGS,
                   n_salts: int = DEFAULT_SALTS,
                   codes: np.ndarray | None = None,
                   vocab: pa.Array | None = None,
                   codec: str = "vbyte") -> pa.Table:
    """``map_groups`` body: one shuffle group (gkey) → segment rows.

    Sorts by (term, doc_id) — doc-ascending order is required for delta
    coding and WAND (the analogue of BlackLab's automatic sort/unique
    guards, search/lucene/SpanQuerySorted.java) — then packs each term's
    postings into blocks. When ``codes``/``vocab`` are given (the
    map/reduce exchange's string-free path) the ``term`` column is not
    required.

    ``codec`` selects the posting-block compression for the doc-delta
    and tf streams ("vbyte" | "pfor" — the codec slot; BASELINE
    north_star's "VByte/PForDelta-compressed blocks"). Position blobs
    stay VByte under either codec: they are sliced per POSTING by the
    tf-derived offsets, which needs a self-delimiting stream.
    """
    if group.num_rows == 0:
        return SEGMENT_SCHEMA.empty_table()
    if codes is None:
        d = pc.dictionary_encode(group.column("term").combine_chunks())
        codes = d.indices.to_numpy(zero_copy_only=False)
        vocab = d.dictionary
    codes = np.asarray(codes, dtype=np.int64)
    doc_ids = group.column("doc_id").to_numpy(zero_copy_only=False)
    tfs = group.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
    norms = group.column("norm").to_numpy(zero_copy_only=False)
    posbin = group.column("posbin").combine_chunks()
    # raw binary buffers for zero-copy posbin slicing (offset-adjusted)
    _bufs = posbin.buffers()
    pb_offsets = np.frombuffer(_bufs[1], dtype=np.int32)[
        posbin.offset: posbin.offset + len(posbin) + 1].astype(np.int64)
    pb_bytes = _bufs[2].to_pybytes() if _bufs[2] is not None else b""

    order = np.lexsort((doc_ids, codes))
    sc = codes[order]
    sd = doc_ids[order]
    stf = tfs[order]
    snorm = norms[order]
    gkey = int(group.column("gkey")[0].as_py())
    bucket, salt = divmod(gkey, n_salts)

    # contiguous posbin stream in sorted order (vectorized byte gather)
    src_starts = pb_offsets[:-1][order].astype(np.int64)
    lens = (pb_offsets[1:] - pb_offsets[:-1])[order].astype(np.int64)
    sorted_off = np.zeros(lens.size + 1, dtype=np.int64)
    sorted_off[1:] = np.cumsum(lens)
    total = int(sorted_off[-1])
    if total:
        seg_id = np.repeat(np.arange(lens.size), lens)
        src_idx = (src_starts[seg_id]
                   + np.arange(total) - sorted_off[seg_id])
        stream = np.frombuffer(pb_bytes, dtype=np.uint8)[src_idx].tobytes()
    else:
        stream = b""

    bounds = np.flatnonzero(np.diff(sc)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [sc.size]))

    # ---- segment ranges (term split by max_seg_postings) ---------------
    seg_lo, seg_hi, seg_term, seg_idx = [], [], [], []
    for s, e in zip(starts.tolist(), ends.tolist()):
        seg = 0
        for lo in range(s, e, max_seg_postings):
            seg_lo.append(lo)
            seg_hi.append(min(e, lo + max_seg_postings))
            seg_term.append(sc[s])
            seg_idx.append(seg)
            seg += 1
    seg_lo = np.array(seg_lo, dtype=np.int64)
    seg_hi = np.array(seg_hi, dtype=np.int64)
    n_segs = seg_lo.size

    # ---- block ranges within segments (all vectorized) -----------------
    seg_nblocks = (seg_hi - seg_lo + block_size - 1) // block_size
    blk_seg = np.repeat(np.arange(n_segs), seg_nblocks)
    blk_rank = np.arange(blk_seg.size) - np.repeat(
        np.cumsum(seg_nblocks) - seg_nblocks, seg_nblocks)
    blk_lo = seg_lo[blk_seg] + blk_rank * block_size
    blk_hi = np.minimum(seg_hi[blk_seg], blk_lo + block_size)
    n_blocks = blk_lo.size

    # ---- per-block metadata (reduceat over posting arrays) -------------
    blk_last = sd[blk_hi - 1]
    blk_maxtf = np.maximum.reduceat(stf, blk_lo)
    blk_minnorm = np.minimum.reduceat(snorm, blk_lo)
    blk_n = (blk_hi - blk_lo).astype(np.int32)

    # ---- one-shot encode of docs deltas + tfs, sliced per block --------
    deltas = np.empty(sd.size, dtype=np.int64)
    deltas[1:] = sd[1:] - sd[:-1]
    deltas[0] = sd[0]
    deltas[blk_lo] = sd[blk_lo]  # absolute first doc per block
    if codec == "pfor":
        from blacklab_ray.codec.pfor import encode_blocks
        doc_stream, d_offs = encode_blocks(
            deltas.astype(np.uint64), blk_lo, blk_hi)
        doc_lo_b, doc_hi_b = d_offs[:-1], d_offs[1:]
        tf_stream, t_offs = encode_blocks(
            stf.astype(np.uint64), blk_lo, blk_hi)
        tf_lo_b, tf_hi_b = t_offs[:-1], t_offs[1:]
    elif codec == "vbyte":
        doc_stream = vbyte_encode(deltas.astype(np.uint64))
        from blacklab_ray.stages.tokenize import _varint_byte_lens
        dlens = _varint_byte_lens(deltas)
        doc_off = np.zeros(sd.size + 1, dtype=np.int64)
        doc_off[1:] = np.cumsum(dlens)
        doc_lo_b, doc_hi_b = doc_off[blk_lo], doc_off[blk_hi]
        tf_stream = vbyte_encode(stf.astype(np.uint64))
        tlens = _varint_byte_lens(stf)
        tf_off = np.zeros(sd.size + 1, dtype=np.int64)
        tf_off[1:] = np.cumsum(tlens)
        tf_lo_b, tf_hi_b = tf_off[blk_lo], tf_off[blk_hi]
    else:
        raise ValueError("unknown posting codec: %r" % codec)
    norm_stream = snorm.astype(np.uint8).tobytes()

    def _bin_from_spans(stream_bytes: bytes, lo_b: np.ndarray,
                        hi_b: np.ndarray) -> pa.Array:
        """Binary array of byte spans — spans are contiguous per block
        but the array needs its own offsets buffer, so gather once."""
        lens_b = hi_b - lo_b
        offs = np.zeros(lens_b.size + 1, dtype=np.int64)
        offs[1:] = np.cumsum(lens_b)
        total_b = int(offs[-1])
        if total_b == len(stream_bytes) and (lo_b[:1] == 0).all() and \
                np.array_equal(offs[1:], hi_b):
            data = stream_bytes  # contiguous cover: zero-copy
        else:
            bi = np.repeat(np.arange(lens_b.size), lens_b)
            src = lo_b[bi] + np.arange(total_b) - offs[bi]
            data = np.frombuffer(stream_bytes, dtype=np.uint8)[src] \
                .tobytes()
        if offs[-1] < 2**31:
            return pa.Array.from_buffers(
                pa.binary(), lens_b.size,
                [None, pa.py_buffer(offs.astype(np.int32).tobytes()),
                 pa.py_buffer(data)])
        return pa.array([data[o:o2] for o, o2 in zip(offs[:-1], offs[1:])],
                        pa.binary())

    docs_arr = _bin_from_spans(doc_stream, doc_lo_b, doc_hi_b)
    tfs_arr = _bin_from_spans(tf_stream, tf_lo_b, tf_hi_b)
    norms_arr = _bin_from_spans(norm_stream, blk_lo, blk_hi)
    pos_arr = _bin_from_spans(stream, sorted_off[blk_lo],
                              sorted_off[blk_hi])

    block_struct = pa.StructArray.from_arrays(
        [pa.array(blk_last, pa.int64()),
         pa.array(blk_maxtf.astype(np.int32), pa.int32()),
         pa.array(blk_minnorm.astype(np.int32), pa.int32()),
         pa.array(blk_n, pa.int32()),
         docs_arr, tfs_arr, norms_arr, pos_arr],
        fields=list(BLOCK_STRUCT))
    seg_block_off = np.zeros(n_segs + 1, dtype=np.int32)
    seg_block_off[1:] = np.cumsum(seg_nblocks)
    blocks_list = pa.ListArray.from_arrays(
        pa.array(seg_block_off, pa.int32()), block_struct)

    ctf_cum = np.zeros(sd.size + 1, dtype=np.int64)
    ctf_cum[1:] = np.cumsum(stf)
    term_values = pc.take(vocab, pa.array(seg_term))
    return pa.Table.from_arrays([
        term_values.combine_chunks() if isinstance(term_values,
                                                   pa.ChunkedArray)
        else term_values,
        pa.array(np.full(n_segs, bucket, dtype=np.int32), pa.int32()),
        pa.array(np.full(n_segs, salt, dtype=np.int32), pa.int32()),
        pa.array(np.array(seg_idx, dtype=np.int32), pa.int32()),
        pa.array(seg_hi - seg_lo, pa.int64()),
        pa.array(ctf_cum[seg_hi] - ctf_cum[seg_lo], pa.int64()),
        pa.array(sd[seg_lo], pa.int64()),
        pa.array(sd[seg_hi - 1], pa.int64()),
        blocks_list,
    ], schema=SEGMENT_SCHEMA)
