"""asof_join / interval_join vs brute-force references."""

import numpy as np
import pandas as pd
import pytest


def _mk(ray_session, rows):
    import ray.data
    return ray.data.from_pandas(pd.DataFrame(rows))


@pytest.fixture(scope="module")
def corpora():
    rng = np.random.default_rng(11)
    n_l, n_r, n_keys = 600, 400, 12
    left = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_l).astype(np.int64),
        "ts": rng.integers(0, 10_000, n_l).astype(np.int64),
        "lv": rng.standard_normal(n_l),
        "lid": np.arange(n_l, dtype=np.int64),
    })
    right = pd.DataFrame({
        "rk": rng.integers(0, n_keys + 3, n_r).astype(np.int64),
        "rts": rng.integers(0, 10_000, n_r).astype(np.int64),
        "rv": rng.standard_normal(n_r),
        "rid": np.arange(n_r, dtype=np.int64),
    })
    # plant exact-ts ties: several right rows at the same (key, ts)
    for i in range(20):
        right.loc[i, "rk"] = np.int64(i % 4)
        right.loc[i, "rts"] = np.int64(1000 + 100 * (i % 5))
    return left, right


def _brute_asof(left, right, direction="backward", allow_exact=True,
                tolerance=None, how="left"):
    out = []
    for _, l in left.iterrows():
        cand = right[right["rk"] == l["k"]]
        if direction == "backward":
            cand = (cand[cand["rts"] <= l["ts"]] if allow_exact
                    else cand[cand["rts"] < l["ts"]])
            if tolerance is not None:
                cand = cand[l["ts"] - cand["rts"] <= tolerance]
            cand = cand.sort_values(["rts", "rid"])
        else:
            cand = (cand[cand["rts"] >= l["ts"]] if allow_exact
                    else cand[cand["rts"] > l["ts"]])
            if tolerance is not None:
                cand = cand[cand["rts"] - l["ts"] <= tolerance]
            cand = cand.sort_values(["rts", "rid"],
                                    ascending=[False, True])
        if len(cand):
            m = cand.iloc[-1]
            out.append((l["lid"], l["lv"], m["rid"], m["rv"]))
        elif how == "left":
            out.append((l["lid"], l["lv"], None, None))
    df = pd.DataFrame(out, columns=["lid", "lv", "rid", "rv"])
    return df.sort_values("lid").reset_index(drop=True)


def _got_asof(ray_session, left, right, **kw):
    from blacklab_ray.pipelines.joins import asof_join
    got = asof_join(_mk(ray_session, left), _mk(ray_session, right),
                    left_key="k", right_key="rk",
                    left_ts="ts", right_ts="rts",
                    left_cols=["lid", "lv"], right_cols=["rid", "rv"],
                    right_tie_col="rid", num_partitions=7, **kw)
    df = got.to_pandas().sort_values("lid").reset_index(drop=True)
    return df[["lid", "lv", "rid", "rv"]]


def _assert_same(got, want):
    assert len(got) == len(want)
    cast = {c: "float64" for c in ["lid", "lv", "rid", "rv"]}
    pd.testing.assert_frame_equal(got.astype(cast), want.astype(cast),
                                  check_exact=False, rtol=1e-12)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("allow_exact", [True, False])
def test_asof_matches_brute(ray_session, corpora, direction,
                            allow_exact):
    left, right = corpora
    got = _got_asof(ray_session, left, right, direction=direction,
                    allow_exact=allow_exact)
    want = _brute_asof(left, right, direction=direction,
                       allow_exact=allow_exact)
    _assert_same(got, want)


def test_asof_tolerance_and_inner(ray_session, corpora):
    left, right = corpora
    got = _got_asof(ray_session, left, right, tolerance_us=500,
                    how="inner")
    want = _brute_asof(left, right, tolerance=500, how="inner")
    _assert_same(got, want)
    assert len(got) < len(left)  # tolerance actually dropped rows


def test_asof_tie_break_is_max_tie(ray_session, corpora):
    """At equal (key, right_ts) the greatest right_tie_col wins."""
    left = pd.DataFrame({"k": [0], "ts": [2000],
                         "lv": [0.0], "lid": [0]})
    right = pd.DataFrame({
        "rk": np.int64([0, 0, 0]), "rts": np.int64([1500, 1500, 900]),
        "rv": [1.0, 2.0, 3.0], "rid": np.int64([5, 9, 7])})
    got = _got_asof(ray_session, left, right)
    assert got["rid"].iloc[0] == 9 and got["rv"].iloc[0] == 2.0


def _brute_interval(probe, intervals):
    out = set()
    for _, p in probe.iterrows():
        for _, iv in intervals.iterrows():
            if (p["k"] == iv["ik"] and iv["s"] <= p["ts"] < iv["e"]):
                out.add((int(p["pid"]), int(iv["iid"])))
    return out


@pytest.mark.parametrize("bucket", [1, 250, 100_000])
def test_interval_join_matches_brute(ray_session, bucket):
    rng = np.random.default_rng(5)
    n_p, n_i, n_keys = 400, 150, 8
    probe = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_p).astype(np.int64),
        "ts": rng.integers(0, 5_000, n_p).astype(np.int64),
        "pid": np.arange(n_p, dtype=np.int64),
    })
    s = rng.integers(0, 5_000, n_i).astype(np.int64)
    intervals = pd.DataFrame({
        "ik": rng.integers(0, n_keys + 2, n_i).astype(np.int64),
        "s": s,
        "e": s + rng.integers(1, 800, n_i).astype(np.int64),
        "iid": np.arange(n_i, dtype=np.int64),
    })
    from blacklab_ray.pipelines.joins import interval_join
    got = interval_join(
        _mk(ray_session, probe), _mk(ray_session, intervals),
        probe_key="k", interval_key="ik", ts_col="ts",
        start_col="s", end_col="e",
        probe_cols=["pid"], interval_cols=["iid"],
        bucket_s=bucket, num_partitions=9)
    # bucket_s is in SECONDS against integer "timestamps" here — the
    # int64 path treats values as already-us, so scale: pass ints as us
    df = got.to_pandas()
    pairs = set(zip(df["pid"].astype(int), df["iid"].astype(int)))
    want = _brute_interval(probe, intervals)
    assert pairs == want
    assert len(want) > 0


def test_interval_join_boundaries(ray_session):
    """Half-open [s, e): ts == s matches, ts == e does not; bucket
    edges don't drop or duplicate pairs."""
    probe = pd.DataFrame({
        "k": np.int64([1, 1, 1, 1]),
        "ts": np.int64([10_000_000, 19_999_999, 20_000_000, 9_999_999]),
        "pid": np.int64([0, 1, 2, 3])})
    intervals = pd.DataFrame({
        "ik": np.int64([1]), "s": np.int64([10_000_000]),
        "e": np.int64([20_000_000]), "iid": np.int64([0])})
    from blacklab_ray.pipelines.joins import interval_join
    got = interval_join(
        _mk(ray_session, probe), _mk(ray_session, intervals),
        probe_key="k", interval_key="ik", ts_col="ts",
        start_col="s", end_col="e",
        probe_cols=["pid"], interval_cols=["iid"],
        bucket_s=10, num_partitions=4)  # 10s = 10_000_000 us buckets
    df = got.to_pandas()
    pairs = sorted(zip(df["pid"].astype(int), df["iid"].astype(int)))
    assert pairs == [(0, 0), (1, 0)]


def test_asof_timestamp_columns(ray_session):
    """Real timestamp[us] columns flow through and return typed
    payloads (the events/orders driver shape)."""
    import ray.data
    from blacklab_ray.pipelines.joins import asof_join
    ev = ray.data.read_parquet(
        "/root/testdata/sf0.001/events.parquet")
    od = ray.data.read_parquet(
        "/root/testdata/sf0.001/orders.parquet")
    got = asof_join(ev, od, left_key="user_id", right_key="o_custkey",
                    left_ts="ts", right_ts="o_orderdate",
                    left_cols=["event_id"],
                    right_cols=["o_orderkey", "o_totalprice"],
                    right_tie_col="o_orderkey",
                    num_partitions=8).to_pandas()
    assert len(got) == ev.count()
    # every 2024 event matches SOME pre-2002 order (backward as-of)
    assert got["o_orderkey"].notna().all()
    # per user the match is the latest order date, max orderkey on tie
    odf = od.to_pandas()
    last = (odf.sort_values(["o_orderdate", "o_orderkey"])
            .groupby("o_custkey").last())
    ev_df = ev.to_pandas()[["event_id", "user_id"]]
    m = got.merge(ev_df, on="event_id")
    want = last.loc[m["user_id"]]["o_orderkey"].to_numpy()
    assert (m["o_orderkey"].to_numpy() == want).all()


def test_interval_join_wide_fanout(ray_session):
    """Intervals hundreds of buckets long (bucket_s=1 over a 5000 s
    span): replication fan-out + exactly-once emission still match the
    brute set."""
    rng = np.random.default_rng(13)
    n_p, n_i, n_keys = 300, 80, 5
    probe = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_p).astype(np.int64),
        "ts": rng.integers(0, 5_000_000_000, n_p).astype(np.int64),
        "pid": np.arange(n_p, dtype=np.int64),
    })
    s = rng.integers(0, 4_500_000_000, n_i).astype(np.int64)
    intervals = pd.DataFrame({
        "ik": rng.integers(0, n_keys, n_i).astype(np.int64),
        "s": s,
        "e": s + rng.integers(1_000_000, 800_000_000, n_i)
                    .astype(np.int64),
        "iid": np.arange(n_i, dtype=np.int64),
    })
    from blacklab_ray.pipelines.joins import interval_join
    got = interval_join(
        _mk(ray_session, probe), _mk(ray_session, intervals),
        probe_key="k", interval_key="ik", ts_col="ts",
        start_col="s", end_col="e",
        probe_cols=["pid"], interval_cols=["iid"],
        bucket_s=1, num_partitions=11)
    df = got.to_pandas()
    # exactly-once: no duplicate (pid, iid) rows
    assert not df.duplicated(["pid", "iid"]).any()
    pairs = set(zip(df["pid"].astype(int), df["iid"].astype(int)))
    want = _brute_interval(probe, intervals)
    assert pairs == want
    assert len(want) > 100


# ---- semi_join_ids ----------------------------------------------------------


def test_semi_join_ids_matches_isin(ray_session):
    """Co-partitioned semi/anti-join == pandas isin on a mixed-type
    table (nulls, strings, floats), both directions."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from blacklab_ray.pipelines.joins import semi_join_ids

    rng = np.random.default_rng(7)
    n = 500
    ids = rng.permutation(n).astype(np.int64) + 1000
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(
            [None if i % 17 == 0 else f"doc {i}" for i in range(n)],
            pa.string()),
        "score": pa.array(rng.random(n), pa.float64()),
    })
    ds = ray.data.from_arrow(tbl).repartition(5)
    pick = np.sort(rng.choice(ids, size=200, replace=False))
    # id set includes some ids absent from the corpus
    id_tbl = pa.table({"doc_id": pa.array(
        np.concatenate([pick, [10, 11]]), pa.int64())})
    ids_ds = ray.data.from_arrow(id_tbl).repartition(3)

    pdf = tbl.to_pandas()
    for keep in (True, False):
        got = semi_join_ids(ds, ids_ds, "doc_id", keep=keep,
                            num_partitions=7).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        mask = pdf["doc_id"].isin(pick)
        want = pdf[mask if keep else ~mask] \
            .sort_values("doc_id").reset_index(drop=True)
        assert got.equals(want)


def test_semi_join_ids_no_driver_gather(ray_session, monkeypatch):
    """The semi-join path never collects rows or ids to the driver
    (spy: to_pandas/take_all poisoned during execution)."""
    import pyarrow as pa
    import ray.data

    from blacklab_ray.pipelines.joins import semi_join_ids

    tbl = pa.table({"doc_id": pa.array(range(50), pa.int64()),
                    "text": [f"t{i}" for i in range(50)]})
    ds = ray.data.from_arrow(tbl).repartition(3)
    ids_ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(0, 50, 2), pa.int64())}))

    def _boom(self, *a, **k):
        raise AssertionError("driver-side materialization")

    out = semi_join_ids(ds, ids_ds, "doc_id", num_partitions=4)
    monkeypatch.setattr(ray.data.Dataset, "to_pandas", _boom)
    monkeypatch.setattr(ray.data.Dataset, "take_all", _boom)
    got = pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow")))
    assert sorted(got["doc_id"].to_pylist()) == list(range(0, 50, 2))
