"""Approximate-nearest-neighbor search over an embedding column.

Training-data-pipeline operator (not in the reference — its nearest
analogue is the term-dictionary fuzzy/regex expansion, SpanFuzzyQuery):

- ``brute_topk``: exact cosine top-k — query matrix broadcast once via
  ``ray.put``, each batch does one float32 matmul and emits its local
  top-k; the driver merges (batch-count × k) small partials. This is the
  correctness baseline and is already the right shape at scale (no
  shuffle; compute ∝ corpus × queries).
- ``lsh_topk``: random-hyperplane LSH variant — only candidate buckets
  matching a query's signature are scored; trades recall for compute.
- ``cosine_dup_pairs``: embedding near-dup detection (pairs ≥ threshold)
  via the same broadcast-matmul pattern, blocked by batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(arr[0])
    return flat.reshape(-1, dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _md5_low64(s: str) -> int:
    """Low 8 bytes of md5, little-endian — EXACTLY DuckDB's
    md5_number_lower (the oracle-reproducibility primitive, same as
    pipelines/hits.py:md5_low64)."""
    import hashlib
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16],
                          "little")


def md5_planes(dim: int, n_planes: int,
               tag: str = "lshplane") -> np.ndarray:
    """SQL-reproducible LSH hyperplanes: component (d, p) is
    ``md5_low64(f"{tag}:{p}:{d}") / 2^63 - 1`` — uniform in [-1, 1).
    DuckDB replicates it bit-exactly as
    ``md5_number_lower('lshplane:'||p||':'||d)::DOUBLE
    / 9223372036854775808.0 - 1.0`` (dividing by a power of two is
    exact, so both sides round the integer identically). Returns
    (dim, n_planes)."""
    return np.array(
        [[(_md5_low64(f"{tag}:{p}:{d}") / 2.0 ** 63) - 1.0
          for p in range(n_planes)] for d in range(dim)],
        dtype=np.float64)


class BruteTopK:
    """Instance UDF: local cosine top-k against broadcast queries.

    Holds only an ObjectRef when pickled into tasks; the query matrix is
    fetched from the object store lazily on first call (broadcast-once,
    read-everywhere — never re-shipped per batch).
    """

    def __init__(self, queries_ref, k: int, vec_col: str = "embedding",
                 id_col: str = "vec_id", exclude_self: bool = True):
        self._ref = queries_ref  # {"ids": (m,), "mat": (m, d) normalized}
        self._qids = None
        self._qmat = None
        self._k = k
        self._vec = vec_col
        self._id = id_col
        self._exclude = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._qids is None:
            q = ray.get(self._ref)
            self._qids = q["ids"]
            self._qmat = q["mat"]
        mat = _normalize(_batch_matrix(batch, self._vec))
        ids = batch.column(self._id).to_numpy(zero_copy_only=False)
        sims = self._qmat @ mat.T  # (m, n)
        if self._exclude:
            same = self._qids[:, None] == ids[None, :]
            sims = np.where(same, -np.inf, sims)
        k = min(self._k, sims.shape[1])
        # per query: local top-k (unordered partial; merged by driver)
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[0]):
            cols = part[qi]
            out_q.append(np.full(k, self._qids[qi], dtype=np.int64))
            out_n.append(ids[cols])
            out_s.append(sims[qi, cols])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
            "cosine": pa.array(np.concatenate(out_s), pa.float64()),
        })


def brute_topk(ds: ray.data.Dataset, query_ids: np.ndarray,
               query_mat: np.ndarray, k: int = 5,
               vec_col: str = "embedding", id_col: str = "vec_id",
               exclude_self: bool = True) -> pa.Table:
    """Exact cosine top-k; returns (query_id, neighbor_id, cosine, rank)."""
    qref = ray.put({"ids": np.asarray(query_ids, dtype=np.int64),
                    "mat": _normalize(np.asarray(query_mat,
                                                 dtype=np.float64))})
    partials = ds.map_batches(
        BruteTopK(queries_ref=qref, k=k, vec_col=vec_col, id_col=id_col,
                  exclude_self=exclude_self),
        batch_format="pyarrow")
    merged = pa.concat_tables(
        [b for b in partials.iter_batches(batch_format="pyarrow")])
    qid = merged["query_id"].to_numpy()
    nid = merged["neighbor_id"].to_numpy()
    cos = merged["cosine"].to_numpy()
    out_rows = []
    for q in np.unique(qid):
        m = qid == q
        order = np.lexsort((nid[m], -cos[m]))[:k]
        for r, oi in enumerate(order, start=1):
            out_rows.append((int(q), int(nid[m][oi]),
                             float(cos[m][oi]), r))
    return pa.table({
        "query_id": pa.array([r[0] for r in out_rows], pa.int64()),
        "neighbor_id": pa.array([r[1] for r in out_rows], pa.int64()),
        "cosine": pa.array([r[2] for r in out_rows], pa.float64()),
        "rank": pa.array([r[3] for r in out_rows], pa.int64()),
    })


# ---- LSH-bucketed variant (the scale path) --------------------------------

class HyperplaneSigner:
    """map_batches actor: add an LSH bucket (sign pattern) per vector."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 11,
                 vec_col: str = "embedding",
                 planes: str | np.ndarray | None = None):
        if isinstance(planes, np.ndarray):
            self._planes = planes
        elif planes == "md5":
            # SQL-reproducible hyperplanes (oracle mode)
            self._planes = md5_planes(dim, n_planes)
        else:
            rng = np.random.default_rng(seed)
            self._planes = rng.standard_normal((dim, n_planes))
        self._vec = vec_col

    def bucket_of(self, mat: np.ndarray) -> np.ndarray:
        signs = (mat @ self._planes) >= 0
        return (signs @ (1 << np.arange(signs.shape[1]))).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_batch_matrix(batch, self._vec))
        return batch.append_column(
            "lsh_bucket", pa.array(self.bucket_of(mat), pa.int64()))


def lsh_topk(ds: ray.data.Dataset, query_ids: np.ndarray,
             query_mat: np.ndarray, k: int = 5, dim: int | None = None,
             n_planes: int = 8, vec_col: str = "embedding",
             id_col: str = "vec_id",
             planes: str | np.ndarray | None = None) -> pa.Table:
    """Approximate top-k: score only vectors sharing a query's bucket.
    ``planes="md5"`` uses the SQL-reproducible hyperplanes so a DuckDB
    oracle can replicate the bucketing exactly."""
    qmat = _normalize(np.asarray(query_mat, dtype=np.float64))
    dim = dim or qmat.shape[1]
    signer = HyperplaneSigner(dim, n_planes, planes=planes)
    qbuckets = signer.bucket_of(qmat)
    wanted = pa.array(sorted(set(qbuckets.tolist())), pa.int64())
    bucketed = ds.map_batches(
        HyperplaneSigner(dim, n_planes, vec_col=vec_col, planes=planes),
        batch_format="pyarrow")
    cand = bucketed.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["lsh_bucket"],
                                            value_set=wanted)),
        batch_format="pyarrow")
    return brute_topk(cand, query_ids, query_mat, k,
                      vec_col=vec_col, id_col=id_col)


# ---- embedding near-dup pairs ---------------------------------------------

_EMPTY_PAIRS = {"a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64())}


def _block_pair_table(ta: pa.Table, tb: pa.Table | None, threshold: float,
                      id_col: str, vec_col: str) -> pa.Table:
    """Thresholded cosine pairs between two id+vector blocks (or within
    one when ``tb is None``): one float64 matmul, upper triangle for the
    self case, (a < b) normalization for the cross case."""
    ids_a = ta.column(id_col).to_numpy(zero_copy_only=False)
    mat_a = _normalize(_batch_matrix(ta, vec_col))
    if tb is None:
        sims = mat_a @ mat_a.T
        rows, cols = np.nonzero(np.triu(sims >= threshold, k=1))
        a, b = ids_a[rows], ids_a[cols]
    else:
        ids_b = tb.column(id_col).to_numpy(zero_copy_only=False)
        mat_b = _normalize(_batch_matrix(tb, vec_col))
        sims = mat_a @ mat_b.T
        rows, cols = np.nonzero(sims >= threshold)
        a, b = ids_a[rows], ids_b[cols]
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    keep = lo < hi
    return pa.table({"a": pa.array(lo[keep], pa.int64()),
                     "b": pa.array(hi[keep], pa.int64()),
                     "cosine": pa.array(sims[rows, cols][keep],
                                        pa.float64())})


def cosine_dup_pairs(ds: ray.data.Dataset, threshold: float = 0.95,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id",
                     max_blocks: int = 32) -> pa.Table:
    """All pairs (a < b) with cosine ≥ threshold — EXACT, distributed.

    Block-pair join: the pruned (id, vector) dataset is split into B
    blocks held in the object store; B(B+1)/2 Ray tasks each matmul one
    block pair and emit only thresholded pairs. The driver handles block
    *refs* and the (small) pair results — never the corpus. Compute is
    inherently O(N²·d/cluster) for exact all-pairs; for approximate
    near-dup at 10^12 scale use ``cosine_dup_pairs_lsh`` (same output
    schema, banded-LSH recall)."""
    slim = ds.select_columns([id_col, vec_col]).materialize()
    refs = [r for r in slim.to_arrow_refs()]
    if len(refs) > max_blocks:
        slim = slim.repartition(max_blocks)
        refs = [r for r in slim.to_arrow_refs()]

    @ray.remote
    def _task(ta, tb, th, idc, vc):
        if ta.num_rows == 0 or (tb is not None and tb.num_rows == 0):
            return pa.table(_EMPTY_PAIRS)
        return _block_pair_table(ta, tb, th, idc, vc)

    futs = []
    for i in range(len(refs)):
        futs.append(_task.remote(refs[i], None, threshold, id_col, vec_col))
        for j in range(i + 1, len(refs)):
            futs.append(_task.remote(refs[i], refs[j], threshold,
                                     id_col, vec_col))
    parts = [t for t in ray.get(futs) if t.num_rows]
    if not parts:
        return pa.table(_EMPTY_PAIRS)
    tbl = pa.concat_tables(parts)
    return tbl.sort_by([("a", "ascending"), ("b", "ascending")])


class MultiTableSigner:
    """map_batches task: explode each vector into L LSH-table rows
    ``(tbl, lsh_bucket, id, vec…)`` — one sign-pattern bucket per table.
    Multiple independent tables are what gives banded-LSH its recall:
    P(miss) = (1 - p^k)^L for match prob p per plane."""

    def __init__(self, dim: int, n_planes: int = 10, n_tables: int = 8,
                 seed: int = 23, vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self._planes = rng.standard_normal((n_tables, dim, n_planes))
        self._vec = vec_col
        self._weights = (1 << np.arange(n_planes)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_batch_matrix(batch, self._vec))
        outs = []
        for t in range(self._planes.shape[0]):
            signs = (mat @ self._planes[t]) >= 0
            buckets = signs @ self._weights
            outs.append(batch.append_column(
                "tbl", pa.array(np.full(batch.num_rows, t), pa.int32()))
                .append_column("lsh_bucket",
                               pa.array(buckets, pa.int64())))
        return pa.concat_tables(outs)


def cosine_dup_pairs_lsh(ds: ray.data.Dataset, threshold: float = 0.95,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id", dim: int | None = None,
                         n_planes: int = 10, n_tables: int = 8,
                         bucket_cap: int = 2000,
                         num_partitions: int = 32) -> pa.Table:
    """Approximate near-dup pairs — the 10^12-scale path.

    Explode to L LSH tables → groupby (tbl, bucket) → exact cosine
    within each bucket → dedupe pairs across tables. Shuffle volume is
    L× the (id, vector) columns; compute is within-bucket only. Buckets
    over ``bucket_cap`` rows are truncated deterministically (sorted by
    id) — log-worthy skew, like the minhash bucket cap."""
    if dim is None:
        first = ds.take_batch(1, batch_format="pyarrow")
        dim = len(first[vec_col][0])
    slim = ds.select_columns([id_col, vec_col])
    exploded = slim.map_batches(
        MultiTableSigner(dim, n_planes=n_planes, n_tables=n_tables,
                         vec_col=vec_col),
        batch_format="pyarrow")

    def _bucket_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.table(_EMPTY_PAIRS)
        if group.num_rows > bucket_cap:
            import logging
            logging.getLogger("blacklab_ray.ann").warning(
                "cosine LSH bucket truncated: %d rows -> cap %d "
                "(tbl=%s bucket=%s); recall may drop for this bucket",
                group.num_rows, bucket_cap, group.column("tbl")[0],
                group.column("lsh_bucket")[0])
            group = group.sort_by(id_col).slice(0, bucket_cap)
        return _block_pair_table(group, None, threshold, id_col, vec_col)

    pairs = exploded.groupby(["tbl", "lsh_bucket"]).map_groups(
        _bucket_pairs, batch_format="pyarrow")
    from ray.data.aggregate import Min
    distinct = pairs.groupby(["a", "b"]).aggregate(
        Min("cosine", alias_name="cosine"))
    tbl = distinct.take_all()
    if not tbl:
        return pa.table(_EMPTY_PAIRS)
    out = pa.Table.from_pylist(tbl)
    return out.select(["a", "b", "cosine"]).sort_by(
        [("a", "ascending"), ("b", "ascending")])


# ---- IVF (inverted-file) variant — the coarse-quantizer scale path --------

def train_ivf_centroids(ds: ray.data.Dataset, n_cells: int = 16,
                        sample_frac: float | None = None, iters: int = 10,
                        seed: int = 13, max_train: int = 262_144,
                        vec_col: str = "embedding") -> np.ndarray:
    """Seeded Lloyd k-means over a BOUNDED sample of the corpus —
    driver-side on the sample, like any IVF coarse quantizer. Returns
    normalized centroids (n_cells, dim).

    ``sample_frac=None`` (default) sizes the sample to at most
    ``max_train`` vectors (256k) — never the whole corpus. The
    truncation is logged; pass an explicit frac to override."""
    if sample_frac is None:
        n = ds.count()
        sample_frac = min(1.0, max_train / max(n, 1))
        if sample_frac < 1.0:
            import logging
            logging.getLogger(__name__).info(
                "train_ivf_centroids: sampling %.4f of %d vectors "
                "(max_train=%d)", sample_frac, n, max_train)
    sample = ds if sample_frac >= 1.0 else ds.random_sample(sample_frac,
                                                            seed=seed)
    mat = _normalize(np.concatenate(
        [_batch_matrix(b, vec_col) for b in
         sample.iter_batches(batch_format="pyarrow")])[:max_train])
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(mat.shape[0], size=min(n_cells, mat.shape[0]),
                          replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            members = mat[assign == c]
            if members.size:
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def md5_seed_centroids(ds: ray.data.Dataset, n_cells: int = 8,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id") -> np.ndarray:
    """SQL-reproducible IVF "training": the centroids are the
    (normalized) embeddings of the ``n_cells`` vectors with the
    smallest ``md5_low64('ivfseed:' || vec_id)`` (ties by vec_id) —
    a deterministic hash-sample DuckDB replicates with
    ``row_number() OVER (ORDER BY md5_number_lower(...), vec_id)``.
    Cell index = rank in that order. Distributed: per-batch local
    top-n, then a tiny (n_cells-sized) driver merge."""

    def _local(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return pa.table({"key": pa.array([], pa.uint64()),
                             id_col: pa.array([], pa.int64()),
                             vec_col: batch.column(vec_col)})
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        from blacklab_ray.util import md5_low64_keyed
        keys = md5_low64_keyed("ivfseed", np.asarray(ids, np.int64))
        order = np.lexsort((ids, keys))[:n_cells]
        sub = batch.take(pa.array(order, pa.int64()))
        return pa.table({
            "key": pa.array(keys[order], pa.uint64()),
            id_col: sub.column(id_col).cast(pa.int64()),
            vec_col: sub.column(vec_col),
        })

    parts = [b for b in
             ds.map_batches(_local, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow") if b.num_rows]
    if not parts:
        raise ValueError("empty embedding dataset")
    merged = pa.concat_tables(parts).sort_by(
        [("key", "ascending"), (id_col, "ascending")]).slice(0, n_cells)
    return _normalize(_batch_matrix(merged, vec_col))


class IvfAssigner:
    """Instance UDF: add the nearest-centroid cell id per vector."""

    def __init__(self, centroids_ref, vec_col: str = "embedding"):
        self._ref = centroids_ref
        self._cent = None
        self._vec = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._cent is None:
            self._cent = ray.get(self._ref)
        mat = _normalize(_batch_matrix(batch, self._vec))
        cells = np.argmax(mat @ self._cent.T, axis=1)
        return batch.append_column("ivf_cell",
                                   pa.array(cells.astype(np.int64),
                                            pa.int64()))


def build_ivf_index(ds: ray.data.Dataset, out_dir: str,
                    n_cells: int = 16, seed: int = 13,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> np.ndarray:
    """Materialize the IVF index: vectors written as cell-partitioned
    Parquet (``out_dir/ivf_cell=K/``) plus the centroid matrix
    (``centroids.npy``). This is the scale path the inline ivf_topk
    docstring promises: the assignment pipeline runs ONCE, searches
    then read only their probed cells' partitions (predicate-pushdown
    on the hive key), and the per-cell layout is resumable output.
    Returns the trained centroids."""
    import os
    cent = train_ivf_centroids(ds, n_cells=n_cells, seed=seed,
                               vec_col=vec_col)
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "centroids.npy"), cent)
    assigned = ds.map_batches(IvfAssigner(ray.put(cent), vec_col),
                              batch_format="pyarrow")
    assigned.write_parquet(out_dir, partition_cols=["ivf_cell"])
    return cent


def ivf_topk_indexed(index_dir: str, query_ids: np.ndarray,
                     query_mat: np.ndarray, k: int = 5, nprobe: int = 4,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> pa.Table:
    """IVF search over a materialized index: reads ONLY the probed
    cells' partitions. Identical results to the inline ivf_topk given
    the same centroids (deterministic training)."""
    import os
    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    qmat = _normalize(np.asarray(query_mat, dtype=np.float64))
    qcells = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    probed = sorted(set(qcells.ravel().tolist()))
    cell_dirs = [os.path.join(index_dir, f"ivf_cell={c}")
                 for c in probed]
    paths = [os.path.join(d, f) for d in cell_dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not paths:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64()),
                         "rank": pa.array([], pa.int64())})
    cand = ray.data.read_parquet(paths)
    return brute_topk(cand, query_ids, qmat, k,
                      vec_col=vec_col, id_col=id_col)


def ivf_topk(ds: ray.data.Dataset, query_ids: np.ndarray,
             query_mat: np.ndarray, k: int = 5, n_cells: int = 16,
             nprobe: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id",
             centroids: str | np.ndarray = "kmeans") -> pa.Table:
    """IVF approximate top-k: score only vectors in each query's
    ``nprobe`` closest cells. At corpus scale the assignment is built
    once (a Dataset write partitioned by cell); here it is computed
    inline over the streamed batches. ``centroids="md5"`` uses the
    SQL-reproducible hash-seeded centroids (oracle mode)."""
    if isinstance(centroids, np.ndarray):
        cent = centroids
    elif centroids == "md5":
        cent = md5_seed_centroids(ds, n_cells=n_cells, vec_col=vec_col,
                                  id_col=id_col)
    else:
        cent = train_ivf_centroids(ds, n_cells=n_cells, vec_col=vec_col)
    cent_ref = ray.put(cent)
    qmat = _normalize(np.asarray(query_mat, dtype=np.float64))
    # stable sort: equal similarities keep ascending cell order,
    # matching the oracle's ORDER BY sim DESC, cell
    qcells = np.argsort(-(qmat @ cent.T), axis=1,
                        kind="stable")[:, :nprobe]
    probed = pa.array(sorted(set(qcells.ravel().tolist())), pa.int64())
    assigned = ds.map_batches(IvfAssigner(cent_ref, vec_col),
                              batch_format="pyarrow")
    cand = assigned.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["ivf_cell"],
                                            value_set=probed)),
        batch_format="pyarrow")
    return brute_topk(cand, query_ids, qmat, k,
                      vec_col=vec_col, id_col=id_col)


# ---- SemDeDup: cluster-scoped semantic near-dup (Abbas et al. 2023) -------

def _tiled_self_pairs(group: pa.Table, threshold: float, id_col: str,
                      vec_col: str, tile: int = 4096) -> pa.Table:
    """Thresholded cosine pairs WITHIN one table, tiled so memory is
    bounded by tile² floats regardless of group size (no truncation —
    unlike the LSH bucket cap, a k-means cell is the unit SemDeDup
    compares exhaustively)."""
    n = group.num_rows
    if n < 2:
        return pa.table(_EMPTY_PAIRS)
    if n <= tile:
        return _block_pair_table(group, None, threshold, id_col, vec_col)
    chunks = [group.slice(i, tile) for i in range(0, n, tile)]
    parts = []
    for i, ci in enumerate(chunks):
        parts.append(_block_pair_table(ci, None, threshold,
                                       id_col, vec_col))
        for cj in chunks[i + 1:]:
            parts.append(_block_pair_table(ci, cj, threshold,
                                           id_col, vec_col))
    parts = [p for p in parts if p.num_rows]
    return pa.concat_tables(parts) if parts else pa.table(_EMPTY_PAIRS)


def semantic_dup_pairs(ds: ray.data.Dataset, threshold: float = 0.93,
                       n_cells: int = 8, vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       centroids: str | np.ndarray = "md5",
                       tile: int = 4096) -> pa.Table:
    """SemDeDup candidate pairs: k-means-assign every vector to a cell,
    then exact thresholded cosine pairs ONLY within each cell.

    This is the published scale shape (SemDeDup, arXiv:2303.09540):
    at 10^12 docs the O(N²) exact all-pairs (``cosine_dup_pairs``) is
    impossible; clustering first makes compute O(Σ n_cell²) with
    n_cell ≈ N/C, and C is scaled with the corpus (the paper uses
    ~10^5 clusters) so each cell fits one task. Cross-cell near-dups
    are missed by design — the documented recall trade.

    ``centroids="md5"`` (default) uses the SQL-reproducible
    hash-seeded centroids so the driver oracle can replicate the
    assignment; ``"kmeans"`` uses seeded Lloyd training (better
    cells, not SQL-expressible); an ndarray is used as-is.

    Shuffle: one groupby on the int cell id over (id, vector) — the
    pruned columns only. Per-cell work is a tiled matmul (memory
    ≤ tile² floats). Output (a, b, cosine), a < b, sorted."""
    if isinstance(centroids, np.ndarray):
        cent = centroids
    elif centroids == "md5":
        cent = md5_seed_centroids(ds, n_cells=n_cells, vec_col=vec_col,
                                  id_col=id_col)
    else:
        cent = train_ivf_centroids(ds, n_cells=n_cells, vec_col=vec_col)
    slim = ds.select_columns([id_col, vec_col])
    assigned = slim.map_batches(IvfAssigner(ray.put(cent), vec_col),
                                batch_format="pyarrow")

    def _cell_pairs(group: pa.Table) -> pa.Table:
        return _tiled_self_pairs(group, threshold, id_col, vec_col,
                                 tile=tile)

    pairs = assigned.groupby("ivf_cell").map_groups(
        _cell_pairs, batch_format="pyarrow")
    parts = [b for b in pairs.iter_batches(batch_format="pyarrow")
             if b.num_rows]
    if not parts:
        return pa.table(_EMPTY_PAIRS)
    return pa.concat_tables(parts).select(["a", "b", "cosine"]).sort_by(
        [("a", "ascending"), ("b", "ascending")])


def semdedup_drop_ids(ds: ray.data.Dataset, threshold: float = 0.93,
                      n_cells: int = 8, vec_col: str = "embedding",
                      id_col: str = "vec_id",
                      centroids: str | np.ndarray = "md5",
                      keep: str = "min_id") -> pa.Table:
    """SemDeDup drop list: connected components over the cluster-scoped
    pairs, keep ONE vector per component, drop the rest.

    ``keep="min_id"`` keeps the smallest id (deterministic, the exact
    analogue of ``near_dedup_drop_ids``); ``keep="far_from_centroid"``
    keeps the component member with the LOWEST cosine to its cell
    centroid — the paper's variant (retain the least prototypical
    example, it carries the most information). Components never span
    cells (pairs are cell-scoped), so labels from the distributed
    ``duplicate_clusters`` are reused as-is. Returns (drop_id)."""
    from .dedup import duplicate_clusters
    if isinstance(centroids, np.ndarray):
        cent = centroids
    elif centroids == "md5":
        cent = md5_seed_centroids(ds, n_cells=n_cells, vec_col=vec_col,
                                  id_col=id_col)
    else:
        cent = train_ivf_centroids(ds, n_cells=n_cells, vec_col=vec_col)
    pairs = semantic_dup_pairs(ds, threshold=threshold, n_cells=n_cells,
                               vec_col=vec_col, id_col=id_col,
                               centroids=cent)
    if pairs.num_rows == 0:
        return pa.table({"drop_id": pa.array([], pa.int64())})
    # labels dataset is pair-sized (LSH-candidate scale), safe to gather
    labels = pa.Table.from_pylist(duplicate_clusters(pairs).take_all())
    doc_ids = labels.column("doc_id").to_numpy(zero_copy_only=False)
    clusters = labels.column("cluster_id").to_numpy(zero_copy_only=False)
    if keep == "min_id":
        # cluster_id IS the component's min doc_id (hash-to-min), so
        # the keeper of each component is doc_id == cluster_id
        drop = doc_ids[doc_ids != clusters]
    elif keep == "far_from_centroid":
        member_set = pa.array(doc_ids.tolist(), pa.int64())
        import pyarrow.compute as pc
        sub = (ds.select_columns([id_col, vec_col])
               .map_batches(lambda t: t.filter(
                   pc.is_in(t[id_col], value_set=member_set)),
                   batch_format="pyarrow")
               .take_all())
        tbl = pa.Table.from_pylist(sub)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        mat = _normalize(_batch_matrix(tbl, vec_col))
        cell = np.argmax(mat @ cent.T, axis=1)
        cent_sim = (mat * cent[cell]).sum(axis=1)
        sim_of = dict(zip(ids.tolist(), cent_sim.tolist()))
        order = np.lexsort((doc_ids,
                            np.array([sim_of[int(i)] for i in doc_ids]),
                            clusters))
        first_of_cluster = np.zeros(len(order), dtype=bool)
        sorted_clusters = clusters[order]
        first_of_cluster[0] = True
        first_of_cluster[1:] = sorted_clusters[1:] != sorted_clusters[:-1]
        drop = doc_ids[order][~first_of_cluster]
    else:
        raise ValueError(f"unknown keep policy: {keep}")
    return pa.table({"drop_id": pa.array(np.sort(drop), pa.int64())})
