"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's exact span dedup (SpansUnique,
engine/src/main/java/nl/inl/blacklab/search/lucene/SpansUnique.java:13 —
exact key dedup, the same hash-partition + per-group-first shape used
here), these add the near-dup family a 100 TB web-text pipeline needs:

- exact:   content hash → hash-partitioned groupby → keep min doc_id
- minhash: shingle → minhash signature → banded LSH buckets → candidate
           pairs → exact Jaccard verification
- simhash: 64-bit hyperplane-free charge/discharge fingerprint

All shuffles move only (hash, id) pairs, never document text.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min

from blacklab_ray.analysis.analyzers import tokenize_text


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


class ContentHash:
    """map_batches: add md5 hex of the (raw) text column."""

    def __init__(self, text_col: str = "text", out_col: str = "content_md5",
                 normalize: bool = False):
        self._text = text_col
        self._out = out_col
        self._normalize = normalize

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self._text).to_pylist()
        if self._normalize:
            texts = [" ".join(tokenize_text(t)) for t in texts]
        h = pa.array([_md5_hex(t) for t in texts], pa.string())
        return batch.append_column(self._out, h)


def exact_dedup_keep_ids(ds: ray.data.Dataset, id_col: str = "doc_id",
                         text_col: str = "text",
                         normalize: bool = False) -> ray.data.Dataset:
    """doc ids surviving exact dedup (min id per content hash).

    Shuffle key = content hash; only (hash, id) pairs move.
    """
    hashed = ds.map_batches(ContentHash(text_col, normalize=normalize),
                            batch_format="pyarrow") \
        .select_columns(["content_md5", id_col])
    kept = hashed.groupby("content_md5").aggregate(
        Min(id_col, alias_name=id_col))
    return kept.select_columns([id_col])


def fingerprints(ds: ray.data.Dataset, id_col: str = "doc_id",
                 text_col: str = "text",
                 normalize: bool = True) -> ray.data.Dataset:
    """Per-doc deterministic fingerprint (md5 of normalized token join)."""
    hashed = ds.map_batches(
        ContentHash(text_col, out_col="fingerprint", normalize=normalize),
        batch_format="pyarrow")
    return hashed.select_columns([id_col, "fingerprint"])


# ---- MinHash + LSH ---------------------------------------------------------

_MERSENNE = (1 << 61) - 1


class MinHashSignature:
    """map_batches actor: per-doc MinHash over token shingles.

    Permutations a*x+b mod p are fixed by ``seed`` (deterministic across
    runs/partitions). Shingles are ``shingle_k``-grams of normalized
    tokens hashed with blake2b (stable across processes, unlike
    ``hash()``).
    """

    def __init__(self, num_perm: int = 64, shingle_k: int = 3,
                 seed: int = 7, text_col: str = "text",
                 id_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        self._a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64) \
            .astype(np.uint64)
        self._b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64) \
            .astype(np.uint64)
        self._num = num_perm
        self._k = shingle_k
        self._text = text_col
        self._id = id_col

    def _shingle_hashes(self, toks: list[str]) -> np.ndarray:
        if len(toks) < self._k:
            toks = toks + ["_"] * (self._k - len(toks))
        grams = {" ".join(toks[i:i + self._k])
                 for i in range(len(toks) - self._k + 1)}
        return np.array(
            [int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8)
                            .digest(), "big") >> 3 for g in grams],
            dtype=np.uint64)

    def signature(self, toks: list[str]) -> np.ndarray:
        h = self._shingle_hashes(toks)
        # (num_perm, n_shingles) min over shingles — vectorized
        vals = (self._a[:, None] * h[None, :] + self._b[:, None]) \
            % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = []
        for t in batch.column(self._text).to_pylist():
            sigs.append(self.signature(tokenize_text(t)))
        sig_arr = pa.array([s.tolist() for s in sigs],
                           pa.list_(pa.uint64(), self._num))
        return pa.table({
            "doc_id": batch.column(self._id).cast(pa.int64()),
            "minhash": sig_arr,
        })


class ExplodeBands:
    """map_batches: signature → (band_id, band_hash, doc_id) rows."""

    def __init__(self, num_perm: int = 64, bands: int = 16):
        assert num_perm % bands == 0
        self._bands = bands
        self._rows = num_perm // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = np.array(batch.column("minhash").to_pylist(),
                        dtype=np.uint64)
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = sigs.shape[0]
        out_band, out_hash, out_doc = [], [], []
        for bi in range(self._bands):
            chunk = sigs[:, bi * self._rows:(bi + 1) * self._rows]
            bh = np.zeros(n, dtype=np.uint64)
            for c in range(self._rows):  # FNV-style fold, vectorized
                bh = (bh * np.uint64(1099511628211)) ^ chunk[:, c]
            out_band.append(np.full(n, bi, dtype=np.int32))
            out_hash.append((bh >> np.uint64(1)).astype(np.int64))
            out_doc.append(doc_ids)
        return pa.table({
            "band": pa.array(np.concatenate(out_band), pa.int32()),
            "band_hash": pa.array(np.concatenate(out_hash), pa.int64()),
            "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
        })


def _pairs_from_bucket(group: pa.Table, cap: int = 50) -> pa.Table:
    ids = np.unique(group.column("doc_id").to_numpy(zero_copy_only=False))
    if ids.size < 2:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    ids = ids[:cap]  # cap pathological buckets; logged by caller contract
    ii, jj = np.triu_indices(ids.size, k=1)
    return pa.table({"a": pa.array(ids[ii], pa.int64()),
                     "b": pa.array(ids[jj], pa.int64())})


def minhash_candidate_pairs(ds: ray.data.Dataset, num_perm: int = 64,
                            bands: int = 16, shingle_k: int = 3,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> ray.data.Dataset:
    """LSH candidate pairs (a < b), deduplicated across bands."""
    # instance UDFs → stateless tasks: state (perm tables) is tiny, and
    # task-based stages can't starve the downstream groupby of CPUs
    sigs = ds.map_batches(
        MinHashSignature(num_perm=num_perm, shingle_k=shingle_k,
                         text_col=text_col, id_col=id_col),
        batch_format="pyarrow")
    banded = sigs.map_batches(
        ExplodeBands(num_perm=num_perm, bands=bands),
        batch_format="pyarrow")
    pairs = banded.groupby(["band", "band_hash"]).map_groups(
        _pairs_from_bucket, batch_format="pyarrow")
    from ray.data.aggregate import Count
    distinct = pairs.groupby(["a", "b"]).aggregate(
        Count(alias_name="n_bands"))
    return distinct.select_columns(["a", "b"])


def verify_jaccard_pairs(ds: ray.data.Dataset, pairs: ray.data.Dataset,
                         threshold: float = 0.8, shingle_k: int = 3,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> pa.Table:
    """Exact shingle-Jaccard verification of candidate pairs.

    Candidate sets are assumed small relative to the corpus (LSH output);
    the needed docs' shingle sets are gathered via a broadcast id set.
    Returns a small Arrow table (a, b, jaccard).
    """
    import ray as _ray
    refs = pairs.to_arrow_refs()
    blocks = [_ray.get(r) for r in refs]
    # Ray's groupby can emit schema-less empty blocks — drop them before
    # concat (observed: "Schema at index N was different: <empty>")
    blocks = [b for b in blocks if b.num_rows and b.num_columns]
    pair_tbl = pa.concat_tables(blocks) if blocks else \
        pa.table({"a": pa.array([], pa.int64()),
                  "b": pa.array([], pa.int64())})
    if pair_tbl.num_rows == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    need = np.unique(np.concatenate([
        pair_tbl["a"].to_numpy(), pair_tbl["b"].to_numpy()]))
    need_ref = _ray.put(need.tolist())

    def gather(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        needed = _ray.get(need_ref)   # sorted int64 array (broadcast)
        mask = _pc.is_in(batch.column(id_col).cast(pa.int64()),
                         value_set=pa.array(needed, pa.int64()))
        sub = batch.filter(mask)
        return pa.table({
            "doc_id": sub.column(id_col).cast(pa.int64()),
            "text": sub.column(text_col),
        })

    docs = {}
    for b in ds.map_batches(gather, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for i, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            docs[i] = t

    def shingles(text: str) -> set:
        toks = tokenize_text(text)
        if len(toks) < shingle_k:
            toks = toks + ["_"] * (shingle_k - len(toks))
        return {" ".join(toks[i:i + shingle_k])
                for i in range(len(toks) - shingle_k + 1)}

    sh = {i: shingles(t) for i, t in docs.items()}
    out_a, out_b, out_j = [], [], []
    for a, b_ in zip(pair_tbl["a"].to_pylist(), pair_tbl["b"].to_pylist()):
        sa, sb = sh.get(a), sh.get(b_)
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out_a.append(a)
            out_b.append(b_)
            out_j.append(round(j, 6))
    return pa.table({"a": pa.array(out_a, pa.int64()),
                     "b": pa.array(out_b, pa.int64()),
                     "jaccard": pa.array(out_j, pa.float64())})


# ---- SimHash ---------------------------------------------------------------

class SimHash64:
    """map_batches actor: 64-bit SimHash of token unigrams."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self._text = text_col
        self._id = id_col
        self._bit_cols = np.arange(64, dtype=np.uint64)

    def simhash(self, toks: list[str]) -> int:
        if not toks:
            return 0
        hs = np.array(
            [int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8)
                            .digest(), "big") for t in toks],
            dtype=np.uint64)
        bits = ((hs[:, None] >> self._bit_cols[None, :])
                & np.uint64(1)).astype(np.int64)
        charge = (2 * bits - 1).sum(axis=0)
        return int(((charge > 0).astype(np.uint64)
                    << self._bit_cols).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = [self.simhash(tokenize_text(t))
                for t in batch.column(self._text).to_pylist()]
        return pa.table({
            "doc_id": batch.column(self._id).cast(pa.int64()),
            "simhash": pa.array([format(v, "016x") for v in vals],
                                pa.string()),
        })


def simhashes(ds: ray.data.Dataset, text_col: str = "text",
              id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(SimHash64(text_col=text_col, id_col=id_col),
                          batch_format="pyarrow")
