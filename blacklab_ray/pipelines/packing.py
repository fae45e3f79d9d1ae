"""Sequence packing for LLM training (concat-and-chunk).

Documents in ascending ``id_col`` order form one continuous token
stream; training sequence ``k`` covers stream positions
``[k*seq_len, (k+1)*seq_len)``. :func:`pack_sequences` emits, per
document, its start position in the stream and the first/last sequence
it lands in — GPT-style packing where documents may split across
sequence boundaries. (The reference has no such operator; this is part
of the training-data family layered on the same documents table.)

The distributed primitive underneath is a two-pass PREFIX SUM over an
id-range-bucketed key space:

  pass 0  ``map_batches`` → (doc_id, n_tokens)  — a 16-byte/doc
          projection, materialized once so both passes read it instead
          of re-tokenizing the corpus
  pass 1  per-batch partial sums per id-range bucket → a
          bucket-count-sized ``groupby().sum()`` → driver-side
          EXCLUSIVE scan over the ~n_buckets totals
  pass 2  ``groupby(bucket).map_groups`` — one vectorized segmented
          cumsum per bucket (sort by id inside the bucket, bounded
          width) plus the broadcast bucket base offset

Nothing corpus-sized touches the driver: the scan table is n_buckets
rows and the closure broadcast is n_buckets int64s. The only shuffle
is the bucket groupby over the narrow counts projection; bucket count
scales with the corpus (``n_docs / rows_per_bucket``) so no single
group outgrows a worker at 10^12 docs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min

from blacklab_ray.analysis.analyzers import TOKEN_RE, _normalize_array

# the analyzer's token definition, referenced (not re-encoded) so the
# counts can never silently desynchronize from tokenize_column
_TOKEN_RE = TOKEN_RE.pattern


def token_counts(ds: ray.data.Dataset, text_col: str = "text",
                 id_col: str = "doc_id",
                 extra_per_doc: int = 0) -> ray.data.Dataset:
    """(doc_id, n_tokens) projection using the standard analyzer's
    token definition — ``count_substring_regex`` over the normalized
    text is one RE2 kernel per batch and equals
    ``len(tokenize_column(...))`` per row (DuckDB:
    ``length(regexp_extract_all(lower(strip_accents(text)), '[a-z0-9]+'))``).
    ``extra_per_doc`` adds a constant per doc (the export's EOS
    delimiter occupies stream space like any token).
    """

    def _cnt(batch: pa.Table) -> pa.Table:
        norm = _normalize_array(batch.column(text_col))
        # fill_null: a NULL text row must count 0 tokens (matching
        # tokenize_column) — a null here becomes NaN in to_numpy and
        # silently poisons the downstream cumsum
        n = pc.fill_null(
            pc.count_substring_regex(norm, pattern=_TOKEN_RE), 0)
        if extra_per_doc:
            n = pc.add(n, extra_per_doc)
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            "n_tokens": n.cast(pa.int64()),
        })

    return ds.map_batches(_cnt, batch_format="pyarrow")


class BucketPlan:
    """The driver-held result of prefix-pass 1: id-range bucketing plus
    the exclusive scan of per-bucket token totals. ``base[b]`` = tokens
    in the stream before bucket ``b``; size is n_buckets+1 int64s."""

    def __init__(self, lo: int, width: int, n_buckets: int,
                 base: np.ndarray):
        self.lo, self.width, self.n_buckets = lo, width, n_buckets
        self.base = base

    def bucket_of(self, ids: np.ndarray) -> np.ndarray:
        return (ids - self.lo) // self.width


def bucket_plan(counts: ray.data.Dataset, id_col: str = "doc_id",
                rows_per_bucket: int = 4_000_000) -> BucketPlan | None:
    """Pass 1 of the distributed prefix sum over a (id, n_tokens)
    dataset; returns None for an empty corpus."""
    # one fused execution for min/max/count (each .aggregate/.count is
    # a separate dataset run — three runs cost ~3x the scheduling)
    bounds = counts.aggregate(Min(id_col), Max(id_col), Count())
    lo = bounds[f"min({id_col})"]
    hi = bounds[f"max({id_col})"]
    if lo is None:
        return None
    span = hi - lo + 1
    # bucket width from target rows per bucket, assuming ids are
    # roughly dense (the documents table's ids are); worst-case skew
    # only inflates one bucket's sort, never correctness
    n_buckets = max(1, min(span,
                           int(bounds["count()"]) // rows_per_bucket + 1))
    width = -(-span // n_buckets)

    def _partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        tok = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        b = (ids - lo) // width
        ub, inv = np.unique(b, return_inverse=True)
        sums = np.bincount(inv, weights=tok).astype(np.int64)
        return pa.table({"bucket": pa.array(ub, pa.int64()),
                         "tok": pa.array(sums, pa.int64())})

    totals = counts.map_batches(_partial, batch_format="pyarrow") \
        .groupby("bucket").sum("tok").take_all()
    base = np.zeros(n_buckets + 1, dtype=np.int64)
    for r in totals:
        base[r["bucket"] + 1] = r["sum(tok)"]
    np.cumsum(base, out=base)  # base[b] = tokens before bucket b
    return BucketPlan(lo, width, n_buckets, base)


def pack_sequences(ds: ray.data.Dataset, seq_len: int,
                   text_col: str = "text", id_col: str = "doc_id",
                   rows_per_bucket: int = 4_000_000
                   ) -> ray.data.Dataset:
    """Per-doc packing map: columns ``(doc_id, n_tokens, start_pos,
    first_seq, last_seq)`` where ``start_pos`` is the document's offset
    in the global token stream (docs concatenated in ascending id
    order), ``first_seq = start_pos // seq_len`` and ``last_seq``
    covers the doc's final token (NULL for empty docs).

    Equivalent SQL (the driver oracle):
    ``SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)``.
    """
    counts = token_counts(ds, text_col, id_col).materialize()
    plan = bucket_plan(counts, id_col, rows_per_bucket)
    if plan is None:  # empty corpus
        return counts.map_batches(
            lambda t: _OUT_SCHEMA.empty_table(), batch_format="pyarrow")
    lo, width, base = plan.lo, plan.width, plan.base

    def _attach_bucket(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array((ids - lo) // width, pa.int64()))

    def _per_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        tok = group.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, tok = ids[order], tok[order]
        bucket = int((ids[0] - lo) // width)
        start = np.empty(ids.size, dtype=np.int64)
        start[0] = base[bucket]
        np.cumsum(tok[:-1], out=start[1:])
        start[1:] += base[bucket]
        first = start // seq_len
        last_np = (start + np.maximum(tok, 1) - 1) // seq_len
        last = pc.if_else(pa.array(tok > 0),
                          pa.array(last_np, pa.int64()),
                          pa.nulls(ids.size, pa.int64()))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(tok, pa.int64()),
            "start_pos": pa.array(start, pa.int64()),
            "first_seq": pa.array(first, pa.int64()),
            "last_seq": last,
        })

    return counts.map_batches(_attach_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(_per_bucket, batch_format="pyarrow")


_OUT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
    ("start_pos", pa.int64()), ("first_seq", pa.int64()),
    ("last_seq", pa.int64()),
])
