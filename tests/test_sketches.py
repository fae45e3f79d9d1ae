"""HLL / Count-Min sketches vs brute references and error bounds."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from blacklab_ray.pipelines.dedup import _md5_low64
from blacklab_ray.pipelines.sketches import (cm_estimate,
                                             count_min_sketch,
                                             hll_distinct,
                                             hll_estimate,
                                             hll_registers)


def _brute_registers(values, b):
    m = 1 << b
    reg = {}
    for v in set(values):
        h = _md5_low64(v)
        bucket = h % m
        w = h >> b
        rank = (64 - b) - w.bit_length() + 1 if w else (64 - b) + 1
        reg[bucket] = max(reg.get(bucket, 0), rank)
    return reg


def _ds(ray_session, values, npart=5):
    import ray.data
    return ray.data.from_pandas(
        pd.DataFrame({"v": values})).repartition(npart)


@pytest.mark.parametrize("b", [4, 8, 12])
def test_hll_registers_match_brute(ray_session, b):
    rng = np.random.default_rng(1)
    values = [f"tok{int(i)}" for i in rng.integers(0, 5000, 20_000)]
    got = hll_registers(_ds(ray_session, values), "v", b=b)
    gotd = dict(zip(got.column("bucket").to_pylist(),
                    got.column("max_rank").to_pylist()))
    assert gotd == _brute_registers(values, b)


def test_hll_estimate_within_bound(ray_session):
    b = 10  # rel err ~ 1.04/sqrt(1024) = 3.3%
    rng = np.random.default_rng(2)
    exact = 8000
    values = [f"u{i}" for i in range(exact)
              for _ in range(int(rng.integers(1, 4)))]
    est = hll_distinct(_ds(ray_session, values, npart=7), "v", b=b)
    assert abs(est - exact) / exact < 5 * 1.04 / np.sqrt(1 << b)


def test_hll_merge_property(ray_session):
    """Registers of the union == elementwise max of the halves."""
    a = [f"a{i}" for i in range(3000)]
    c = [f"c{i}" for i in range(3000)]
    ra = hll_registers(_ds(ray_session, a), "v", b=8)
    rc = hll_registers(_ds(ray_session, c), "v", b=8)
    ru = hll_registers(_ds(ray_session, a + c), "v", b=8)
    merged = {}
    for t in (ra, rc):
        for bk, r in zip(t.column("bucket").to_pylist(),
                         t.column("max_rank").to_pylist()):
            merged[bk] = max(merged.get(bk, 0), r)
    got = dict(zip(ru.column("bucket").to_pylist(),
                   ru.column("max_rank").to_pylist()))
    assert got == merged


def test_hll_tokenize_matches_split(ray_session):
    import ray.data
    docs = ["the quick fox", "the  slow fox", "", "lone"]
    ds = ray.data.from_pandas(pd.DataFrame({"text": docs}))
    got = hll_registers(ds, "text", b=6, tokenize=True)
    toks = [t for d in docs for t in d.split(" ") if t != ""]
    want = _brute_registers(toks, 6)
    gotd = dict(zip(got.column("bucket").to_pylist(),
                    got.column("max_rank").to_pylist()))
    assert gotd == want


def _zipf_corpus(rng, n=30_000, vocab=800):
    ranks = rng.zipf(1.3, n) % vocab
    return [f"w{int(r)}" for r in ranks]


def test_count_min_one_sided_and_exact_when_wide(ray_session):
    rng = np.random.default_rng(3)
    values = _zipf_corpus(rng)
    exact = pd.Series(values).value_counts()
    # narrow sketch: estimates never undercount
    sk = count_min_sketch(_ds(ray_session, values, npart=6), "v",
                          w=256, d=4)
    terms = list(exact.index[:50])
    est = cm_estimate(sk, terms, w=256, d=4)
    assert (est >= exact[terms].to_numpy()).all()
    # wide sketch: top terms estimate exactly (collision-free whp)
    skw = count_min_sketch(_ds(ray_session, values, npart=6), "v",
                           w=1 << 15, d=4)
    estw = cm_estimate(skw, terms, w=1 << 15, d=4)
    assert (estw == exact[terms].to_numpy()).all()


def test_count_min_partition_invariant(ray_session):
    rng = np.random.default_rng(4)
    values = _zipf_corpus(rng, n=5_000, vocab=200)
    s1 = count_min_sketch(_ds(ray_session, values, npart=2), "v",
                          w=128, d=3)
    s2 = count_min_sketch(_ds(ray_session, values, npart=9), "v",
                          w=128, d=3)
    assert s1.equals(s2)  # exact integer sums, order-independent


def test_cm_total_mass(ray_session):
    values = [f"x{i % 7}" for i in range(1000)]
    sk = count_min_sketch(_ds(ray_session, values), "v", w=64, d=2)
    df = sk.to_pandas()
    # every row of the sketch holds the full count mass
    assert (df.groupby("row")["cnt"].sum() == 1000).all()


# ---- quantile digest --------------------------------------------------------

def test_quantile_digest_rank_error(ray_session):
    """Rank error of every queried quantile stays within the ~n/k
    two-level compression bound on a skewed continuous column."""
    import ray.data

    from blacklab_ray.pipelines.sketches import approx_quantiles
    rng = np.random.default_rng(7)
    vals = rng.lognormal(3.0, 1.2, size=200_000)
    ds = ray.data.from_arrow(pa.table({
        "x": pa.array(vals, pa.float64())})).repartition(16)
    k = 256
    got = approx_quantiles(ds, "x", [0.01, 0.1, 0.5, 0.9, 0.99], k=k)
    s = np.sort(vals)
    n = s.size
    for q, v in got.items():
        rank = np.searchsorted(s, v)
        assert abs(rank - q * n) <= 2.5 * n / k, (q, rank, q * n)


def test_quantile_digest_exact_when_small(ray_session):
    """Fewer distinct points than k → the digest is exact."""
    import ray.data

    from blacklab_ray.pipelines.sketches import approx_quantiles
    vals = np.arange(100, dtype=np.float64)
    ds = ray.data.from_arrow(pa.table({
        "x": pa.array(vals, pa.float64())})).repartition(4)
    got = approx_quantiles(ds, "x", [0.0, 0.5, 1.0], k=256)
    assert got[0.0] == 0.0
    assert got[0.5] in (49.0, 50.0)
    assert got[1.0] == 99.0


def test_quantile_digest_edges(ray_session):
    import ray.data

    from blacklab_ray.pipelines.sketches import (approx_quantiles,
                                                 quantile_digest)
    empty = ray.data.from_arrow(pa.table({
        "x": pa.array([], pa.float64())}))
    assert approx_quantiles(empty, "x", [0.5]) == {0.5: None}
    const = ray.data.from_arrow(pa.table({
        "x": pa.array([3.5] * 1000, pa.float64())})).repartition(3)
    assert approx_quantiles(const, "x", [0.1, 0.9]) \
        == {0.1: 3.5, 0.9: 3.5}
    # NaNs are ignored, not propagated
    withnan = ray.data.from_arrow(pa.table({
        "x": pa.array([1.0, float("nan"), 2.0, 3.0], pa.float64())}))
    d = quantile_digest(withnan, "x", k=8)
    assert float(pa.compute.sum(d["weight"]).as_py()) == 3.0


def test_quantile_digest_deterministic(ray_session):
    import ray.data

    from blacklab_ray.pipelines.sketches import quantile_digest
    rng = np.random.default_rng(11)
    vals = rng.normal(size=50_000)
    ds = ray.data.from_arrow(pa.table({
        "x": pa.array(vals, pa.float64())})).repartition(8)
    a = quantile_digest(ds, "x", k=64).to_pydict()
    b = quantile_digest(ds, "x", k=64).to_pydict()
    assert a == b
