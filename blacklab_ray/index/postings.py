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
from blacklab_ray.codec.vbyte import delta_encode, vbyte_encode
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
    d = pc.dictionary_encode(terms)
    uniq = d.dictionary.to_pylist()
    uniq_buckets = np.array([hash64(t) % num_buckets for t in uniq],
                            dtype=np.int64)
    return uniq_buckets[d.indices.to_numpy(zero_copy_only=False)]


class ExplodePostings:
    """``map_batches`` stage: forward-index rows → posting partial rows.

    Output: ``gkey:int64`` (bucket * n_salts + salt — the shuffle key),
    ``bucket, term, doc_id, tf, norm, posbin``.
    """

    def __init__(self, num_buckets: int = DEFAULT_BUCKETS,
                 n_salts: int = DEFAULT_SALTS,
                 hot_terms: tuple[str, ...] | None = None):
        self._buckets = num_buckets
        self._salts = n_salts
        self._hot = frozenset(STOPWORDS if hot_terms is None else hot_terms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms_col = batch.column("terms").combine_chunks()
        flat_terms = pc.list_flatten(terms_col)
        parents = pc.list_parent_indices(terms_col).to_numpy(
            zero_copy_only=False)
        flat_tfs = pc.list_flatten(batch.column("tfs"))
        flat_pos = pc.list_flatten(batch.column("pos"))
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        norms = batch.column("norm").to_numpy(zero_copy_only=False)
        doc_rep = doc_ids[parents]
        norm_rep = norms[parents]

        d = pc.dictionary_encode(flat_terms)
        uniq = d.dictionary.to_pylist()
        codes = d.indices.to_numpy(zero_copy_only=False)
        uniq_buckets = np.array([hash64(t) % self._buckets for t in uniq],
                                dtype=np.int64)
        uniq_hot = np.array([t in self._hot for t in uniq], dtype=bool)
        bucket = uniq_buckets[codes]
        hot = uniq_hot[codes]
        salt = np.zeros(doc_rep.size, dtype=np.int64)
        if self._salts > 1:
            salt[hot] = (doc_rep[hot] * np.int64(2654435761)
                         & np.int64(0x7FFFFFFF)) % self._salts
        gkey = bucket * self._salts + salt
        return pa.table({
            "gkey": pa.array(gkey, pa.int64()),
            "bucket": pa.array(bucket.astype(np.int32), pa.int32()),
            "salt": pa.array(salt.astype(np.int32), pa.int32()),
            "term": flat_terms,
            "doc_id": pa.array(doc_rep, pa.int64()),
            "tf": flat_tfs,
            "norm": pa.array(norm_rep.astype(np.int32), pa.int32()),
            "posbin": flat_pos,
        })


def _encode_segment(term: str, bucket: int, salt: int, seg: int,
                    doc_ids: np.ndarray, tfs: np.ndarray, norms: np.ndarray,
                    pos_data: bytes, pos_offsets: np.ndarray,
                    block_size: int) -> dict:
    """Pack one (term, salt, doc-range) segment into block structs."""
    n = doc_ids.size
    blocks = []
    for lo in range(0, n, block_size):
        hi = min(n, lo + block_size)
        blocks.append({
            "last_doc": int(doc_ids[hi - 1]),
            "max_tf": int(tfs[lo:hi].max()),
            "min_norm": int(norms[lo:hi].min()),
            "n": hi - lo,
            "docs": delta_encode(doc_ids[lo:hi]),
            "tfs": vbyte_encode(tfs[lo:hi].astype(np.uint64)),
            "norms": norms[lo:hi].astype(np.uint8).tobytes(),
            "pos": pos_data[pos_offsets[lo]:pos_offsets[hi]],
        })
    return {
        "term": term, "bucket": bucket, "salt": salt, "seg": seg,
        "df_seg": n, "ctf_seg": int(tfs.sum()),
        "first_doc": int(doc_ids[0]), "last_doc": int(doc_ids[-1]),
        "blocks": blocks,
    }


def build_segments(group: pa.Table, block_size: int = BLOCK_SIZE,
                   max_seg_postings: int = MAX_SEG_POSTINGS) -> pa.Table:
    """``map_groups`` body: one shuffle group (gkey) → segment rows.

    Sorts by (term, doc_id) — doc-ascending order is required for delta
    coding and WAND (the analogue of BlackLab's automatic sort/unique
    guards, search/lucene/SpanQuerySorted.java) — then packs each term's
    postings into blocks.
    """
    if group.num_rows == 0:
        return SEGMENT_SCHEMA.empty_table()
    d = pc.dictionary_encode(group.column("term").combine_chunks())
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = d.dictionary.to_pylist()
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
    bucket = int(group.column("bucket")[0].as_py())
    salt = int(group.column("salt")[0].as_py())

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
    rows = []
    for s, e in zip(starts, ends):
        term = uniq[sc[s]]
        seg = 0
        for lo in range(s, e, max_seg_postings):
            hi = min(e, lo + max_seg_postings)
            rows.append(_encode_segment(
                term, bucket, salt, seg,
                sd[lo:hi], stf[lo:hi], snorm[lo:hi],
                stream, sorted_off[lo:hi + 1], block_size))
            seg += 1
    return pa.Table.from_pylist(rows, schema=SEGMENT_SCHEMA)
