"""SemDeDup (cluster-scoped semantic near-dup) vs brute references."""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
THRESH = 0.42  # the synthetic embeddings have no planted near-dups;
# 0.42 yields a healthy same-cell pair set with >1e-4 threshold margin
N_CELLS = 4


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data
    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_tbl():
    return pq.read_table(f"{SF}/embeddings.parquet")


def _norm_mat(tbl):
    arr = tbl.column("embedding").combine_chunks()
    dim = len(arr[0])
    m = arr.flatten().to_numpy(zero_copy_only=False).astype(
        np.float64).reshape(-1, dim)
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _brute_cell_pairs(tbl, cent, threshold):
    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
    mat = _norm_mat(tbl)
    cells = np.argmax(mat @ cent.T, axis=1)
    out = set()
    for c in np.unique(cells):
        sel = np.nonzero(cells == c)[0]
        sims = mat[sel] @ mat[sel].T
        r, k = np.nonzero(np.triu(sims >= threshold, k=1))
        for i, j in zip(sel[r], sel[k]):
            a, b = sorted((int(ids[i]), int(ids[j])))
            out.add((a, b))
    return out, dict(zip(ids.tolist(), cells.tolist()))


def test_semantic_pairs_match_brute_and_subset_exact(emb_ds, emb_tbl):
    from blacklab_ray.pipelines.ann import (cosine_dup_pairs,
                                            md5_seed_centroids,
                                            semantic_dup_pairs)
    cent = md5_seed_centroids(emb_ds, n_cells=N_CELLS)
    got = semantic_dup_pairs(emb_ds, threshold=THRESH, n_cells=N_CELLS)
    got_pairs = set(zip(got.column("a").to_pylist(),
                        got.column("b").to_pylist()))
    want, cell_of = _brute_cell_pairs(emb_tbl, cent, THRESH)
    assert got_pairs == want
    assert len(want) > 0, "fixture should produce some near-dups"
    # cluster-scoped pairs are a subset of the exact all-pairs set
    exact = cosine_dup_pairs(emb_ds, threshold=THRESH)
    exact_pairs = set(zip(exact.column("a").to_pylist(),
                          exact.column("b").to_pylist()))
    assert got_pairs <= exact_pairs
    # and every emitted pair is same-cell
    for a, b in got_pairs:
        assert cell_of[a] == cell_of[b]


def test_tiled_path_identical(emb_ds):
    from blacklab_ray.pipelines.ann import semantic_dup_pairs
    big = semantic_dup_pairs(emb_ds, threshold=THRESH, n_cells=N_CELLS)
    tiled = semantic_dup_pairs(emb_ds, threshold=THRESH, n_cells=N_CELLS,
                               tile=8)
    assert big.equals(tiled)


def _brute_components(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for n in parent:
        comps.setdefault(find(n), set()).add(n)
    return list(comps.values())


def test_drop_ids_min_id(emb_ds):
    from blacklab_ray.pipelines.ann import (semantic_dup_pairs,
                                            semdedup_drop_ids)
    pairs = semantic_dup_pairs(emb_ds, threshold=THRESH, n_cells=N_CELLS)
    comps = _brute_components(set(zip(pairs.column("a").to_pylist(),
                                      pairs.column("b").to_pylist())))
    want = sorted(n for c in comps for n in c if n != min(c))
    got = semdedup_drop_ids(emb_ds, threshold=THRESH, n_cells=N_CELLS,
                            keep="min_id")
    assert got.column("drop_id").to_pylist() == want


def test_drop_ids_far_from_centroid(emb_ds, emb_tbl):
    from blacklab_ray.pipelines.ann import (md5_seed_centroids,
                                            semantic_dup_pairs,
                                            semdedup_drop_ids)
    cent = md5_seed_centroids(emb_ds, n_cells=N_CELLS)
    pairs = semantic_dup_pairs(emb_ds, threshold=THRESH, n_cells=N_CELLS)
    comps = _brute_components(set(zip(pairs.column("a").to_pylist(),
                                      pairs.column("b").to_pylist())))
    ids = emb_tbl.column("vec_id").to_numpy(zero_copy_only=False)
    mat = _norm_mat(emb_tbl)
    cells = np.argmax(mat @ cent.T, axis=1)
    cent_sim = dict(zip(ids.tolist(),
                        (mat * cent[cells]).sum(axis=1).tolist()))
    want = set()
    for c in comps:
        keeper = min(c, key=lambda n: (cent_sim[n], n))
        want |= c - {keeper}
    got = semdedup_drop_ids(emb_ds, threshold=THRESH, n_cells=N_CELLS,
                            keep="far_from_centroid")
    assert set(got.column("drop_id").to_pylist()) == want
    # exactly one keeper per component survives
    assert len(got) == sum(len(c) - 1 for c in comps)


def test_planted_components(ray_session):
    """Deterministic planted dup groups: transitive chains collapse to
    one keeper per component under both keep policies."""
    import ray.data
    from blacklab_ray.pipelines.ann import (semantic_dup_pairs,
                                            semdedup_drop_ids)
    rng = np.random.default_rng(7)
    base = rng.standard_normal((20, 16))
    rows, ids = [], []
    vid = 0
    for g in range(20):
        # group of 1 + (g % 3) near-copies of the base vector
        for j in range(1 + g % 3):
            v = base[g] + 0.01 * j * rng.standard_normal(16)
            rows.append((v / np.linalg.norm(v)).tolist())
            ids.append(vid)
            vid += 1
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": r} for i, r in zip(ids, rows)])
    pairs = semantic_dup_pairs(ds, threshold=0.99, n_cells=4,
                               centroids="kmeans")
    comps = _brute_components(set(zip(pairs.column("a").to_pylist(),
                                      pairs.column("b").to_pylist())))
    assert any(len(c) == 3 for c in comps), "want a 3-member component"
    drop = semdedup_drop_ids(ds, threshold=0.99, n_cells=4,
                             centroids="kmeans", keep="min_id")
    want = sorted(n for c in comps for n in c if n != min(c))
    assert drop.column("drop_id").to_pylist() == want
