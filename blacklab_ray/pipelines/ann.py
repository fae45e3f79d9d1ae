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
                 vec_col: str = "embedding"):
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
             id_col: str = "vec_id") -> pa.Table:
    """Approximate top-k: score only vectors sharing a query's bucket."""
    qmat = _normalize(np.asarray(query_mat, dtype=np.float64))
    dim = dim or qmat.shape[1]
    signer = HyperplaneSigner(dim, n_planes)
    qbuckets = signer.bucket_of(qmat)
    wanted = pa.array(sorted(set(qbuckets.tolist())), pa.int64())
    bucketed = ds.map_batches(
        HyperplaneSigner(dim, n_planes, vec_col=vec_col),
        batch_format="pyarrow")
    cand = bucketed.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["lsh_bucket"],
                                            value_set=wanted)),
        batch_format="pyarrow")
    return brute_topk(cand, query_ids, query_mat, k,
                      vec_col=vec_col, id_col=id_col)


# ---- embedding near-dup pairs ---------------------------------------------

def cosine_dup_pairs(ds: ray.data.Dataset, threshold: float = 0.95,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> pa.Table:
    """All pairs (a < b) with cosine ≥ threshold.

    Implementation: the full id+vector set is broadcast once (`ray.put`)
    and each batch compares its rows against the whole set — exact, no
    shuffle, O(N·batch) compute like the brute-force ANN baseline. For
    10^12-scale, swap the broadcast side for LSH buckets (lsh_topk's
    signer) — recorded as the scale path, same interface.
    """
    full = pa.concat_tables(
        [b for b in ds.select_columns([id_col, vec_col])
         .iter_batches(batch_format="pyarrow")])
    all_ids = full[id_col].to_numpy()
    all_mat = _normalize(_batch_matrix(full, vec_col))
    ref = ray.put({"ids": all_ids, "mat": all_mat})

    class _Pairs:
        def __init__(self):
            d = ray.get(ref)
            self.ids = d["ids"]
            self.mat = d["mat"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _normalize(_batch_matrix(batch, vec_col))
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            sims = mat @ self.mat.T
            rows, cols = np.nonzero(sims >= threshold)
            a = ids[rows]
            b = self.ids[cols]
            keep = a < b
            return pa.table({
                "a": pa.array(a[keep], pa.int64()),
                "b": pa.array(b[keep], pa.int64()),
                "cosine": pa.array(sims[rows, cols][keep], pa.float64()),
            })

    out = ds.map_batches(_Pairs, batch_format="pyarrow", concurrency=2)
    batches = [b for b in out.iter_batches(batch_format="pyarrow")]
    if not batches:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    tbl = pa.concat_tables(batches)
    if tbl.num_rows:
        tbl = tbl.sort_by([("a", "ascending"), ("b", "ascending")])
    return tbl


# ---- IVF (inverted-file) variant — the coarse-quantizer scale path --------

def train_ivf_centroids(ds: ray.data.Dataset, n_cells: int = 16,
                        sample_frac: float = 1.0, iters: int = 10,
                        seed: int = 13,
                        vec_col: str = "embedding") -> np.ndarray:
    """Seeded Lloyd k-means over a (sample of the) corpus — driver-side
    on the sample, like any IVF coarse quantizer. Returns normalized
    centroids (n_cells, dim)."""
    sample = ds if sample_frac >= 1.0 else ds.random_sample(sample_frac,
                                                            seed=seed)
    mat = _normalize(np.concatenate(
        [_batch_matrix(b, vec_col) for b in
         sample.iter_batches(batch_format="pyarrow")]))
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


def ivf_topk(ds: ray.data.Dataset, query_ids: np.ndarray,
             query_mat: np.ndarray, k: int = 5, n_cells: int = 16,
             nprobe: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id") -> pa.Table:
    """IVF approximate top-k: score only vectors in each query's
    ``nprobe`` closest cells. At corpus scale the assignment is built
    once (a Dataset write partitioned by cell); here it is computed
    inline over the streamed batches."""
    cent = train_ivf_centroids(ds, n_cells=n_cells, vec_col=vec_col)
    cent_ref = ray.put(cent)
    qmat = _normalize(np.asarray(query_mat, dtype=np.float64))
    qcells = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    probed = pa.array(sorted(set(qcells.ravel().tolist())), pa.int64())
    assigned = ds.map_batches(IvfAssigner(cent_ref, vec_col),
                              batch_format="pyarrow")
    cand = assigned.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["ivf_cell"],
                                            value_set=probed)),
        batch_format="pyarrow")
    return brute_topk(cand, query_ids, qmat, k,
                      vec_col=vec_col, id_col=id_col)
