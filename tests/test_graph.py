"""PageRank (pipelines/graph.py) vs an independent dense numpy
reference, plus the extract_links → pagerank plumbing."""

import numpy as np
import pyarrow as pa
import pytest


def _numpy_pagerank(edges, n_iter, d=0.85):
    """Dense reference: same semantics (dangling mass dropped)."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[idx[s]] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        new = np.full(n, (1 - d) / n)
        for s, t in edges:
            new[idx[t]] += d * rank[idx[s]] / outdeg[idx[s]]
        rank = new
    return dict(zip(nodes, rank))


def _rand_edges(n_nodes=60, n_edges=300, seed=3):
    rng = np.random.default_rng(seed)
    # leave some nodes dangling (never a src) and some multi-edges
    e = [(int(rng.integers(0, n_nodes // 2)),
          int(rng.integers(0, n_nodes)))
         for _ in range(n_edges)]
    e += e[:10]  # explicit multi-edges
    return e


@pytest.mark.parametrize("n_iter", [1, 3])
def test_pagerank_matches_dense_reference(ray_session, n_iter):
    import ray.data

    from blacklab_ray.pipelines.graph import pagerank
    edges = _rand_edges()
    want = _numpy_pagerank(edges, n_iter)
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([s for s, _ in edges], pa.int64()),
        "dst": pa.array([t for _, t in edges], pa.int64()),
    })).repartition(8)
    got = pagerank(ds, n_iter=n_iter).to_pandas()
    assert len(got) == len(want)
    for _, row in got.iterrows():
        assert row["rank"] == pytest.approx(want[row["node"]], abs=1e-12)


def test_pagerank_star_graph(ray_session):
    """Hub-and-spoke sanity: the hub collects all spoke mass."""
    import ray.data

    from blacklab_ray.pipelines.graph import pagerank
    edges = [(i, 0) for i in range(1, 11)]
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([s for s, _ in edges], pa.int64()),
        "dst": pa.array([t for _, t in edges], pa.int64()),
    }))
    got = pagerank(ds, n_iter=1).to_pandas().set_index("node")["rank"]
    n = 11
    assert got[0] == pytest.approx(0.15 / n + 0.85 * 10 * (1 / n))
    for i in range(1, 11):
        assert got[i] == pytest.approx(0.15 / n)


def test_extract_links_scoping(ray_session):
    """Only content-area hrefs become edges; chrome links don't."""
    import ray.data

    from blacklab_ray.stages.htmltext import extract_links
    page = ("<html><body><nav><a href='/chrome'>menu</a></nav>"
            "<p><a href='https://a.example/x'>one</a> and "
            "<a href='https://b.example/y'>two</a></p>"
            "<script>var u='<a href=\"/no\">'</script></body></html>")
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "html": pa.array([page]),
    }))
    t = ds and extract_links(ds).to_pandas().sort_values("link_pos")
    assert list(t["href"]) == ["https://a.example/x",
                               "https://b.example/y"]
    assert list(t["src"]) == [7, 7]


def test_extract_links_anchor_text(ray_session):
    import ray.data

    from blacklab_ray.stages.htmltext import extract_links
    page = ("<p><a href='/a'>first  link</a>"
            "<a href='/b'><b>bold</b> text</a>"
            "<a name='no-href'>skip</a>"
            "<a href='/c'>dangling")  # EOF inside an open anchor
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "html": pa.array([page]),
    }))
    t = extract_links(ds).to_pandas().sort_values("link_pos")
    assert list(t["href"]) == ["/a", "/b", "/c"]
    assert list(t["anchor"]) == ["first link", "bold text", "dangling"]


def test_pagerank_redistribute_dangling(ray_session):
    """With uniform dangling redistribution ranks sum to exactly 1;
    values match a dense reference with the same completion."""
    import ray.data

    from blacklab_ray.pipelines.graph import pagerank
    edges = _rand_edges(seed=11)
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n, d = len(nodes), 0.85
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[idx[s]] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(3):
        dangling = rank[outdeg == 0].sum()
        new = np.full(n, (1 - d) / n + d * dangling / n)
        for s, t in edges:
            new[idx[t]] += d * rank[idx[s]] / outdeg[idx[s]]
        rank = new
    want = dict(zip(nodes, rank))
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([s for s, _ in edges], pa.int64()),
        "dst": pa.array([t for _, t in edges], pa.int64()),
    })).repartition(6)
    got = pagerank(ds, n_iter=3, redistribute_dangling=True).to_pandas()
    assert got["rank"].sum() == pytest.approx(1.0, abs=1e-9)
    for _, row in got.iterrows():
        assert row["rank"] == pytest.approx(want[row["node"]], abs=1e-12)


def _numpy_hits(edges, n_iter):
    """Dense reference with the same semantics: h0=1, per iteration
    a = L2-normalized in-sum of h, then h = L2-normalized out-sum
    of a; multi-edges count per occurrence."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    h = np.ones(n)
    a = np.ones(n)
    for _ in range(n_iter):
        a = np.zeros(n)
        for s, t in edges:
            a[idx[t]] += h[idx[s]]
        nr = np.linalg.norm(a)
        a = a / nr if nr > 0 else a
        h = np.zeros(n)
        for s, t in edges:
            h[idx[s]] += a[idx[t]]
        nr = np.linalg.norm(h)
        h = h / nr if nr > 0 else h
    return {nd: (a[idx[nd]], h[idx[nd]]) for nd in nodes}


@pytest.mark.parametrize("n_iter", [1, 3])
def test_hits_matches_dense_reference(ray_session, n_iter):
    import ray.data

    from blacklab_ray.pipelines.graph import hits
    edges = _rand_edges(seed=11)
    want = _numpy_hits(edges, n_iter)
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([s for s, _ in edges], pa.int64()),
        "dst": pa.array([t for _, t in edges], pa.int64()),
    })).repartition(8)
    got = hits(ds, n_iter=n_iter).to_pandas()
    assert len(got) == len(want)
    for _, row in got.iterrows():
        wa, wh = want[row["node"]]
        assert row["authority"] == pytest.approx(wa, abs=1e-12)
        assert row["hub"] == pytest.approx(wh, abs=1e-12)


def test_hits_star_graph(ray_session):
    """Spokes → hub: the hub is the only authority, every spoke an
    equal hub; the center has hub score 0 (no out-edges)."""
    import ray.data

    from blacklab_ray.pipelines.graph import hits
    edges = [(i, 0) for i in range(1, 6)]
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([s for s, _ in edges], pa.int64()),
        "dst": pa.array([t for _, t in edges], pa.int64()),
    }))
    got = hits(ds, n_iter=2).to_pandas().set_index("node")
    assert got.loc[0, "authority"] == pytest.approx(1.0)
    assert got.loc[0, "hub"] == pytest.approx(0.0)
    for i in range(1, 6):
        assert got.loc[i, "authority"] == pytest.approx(0.0)
        assert got.loc[i, "hub"] == pytest.approx(1 / np.sqrt(5))


def test_hits_empty_edges(ray_session):
    import ray.data

    from blacklab_ray.pipelines.graph import hits
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([], pa.int64()),
        "dst": pa.array([], pa.int64())}))
    assert hits(ds).count() == 0


def test_anchor_texts(ray_session):
    """Per-target anchor profiles: counts, distinct-cap, empty-anchor
    handling, multi-block determinism."""
    import ray.data

    from blacklab_ray.pipelines.graph import anchor_texts
    rows = []
    for i in range(40):
        rows.append({"src": i, "href": "https://hub.example/",
                     "anchor": f"hub {i % 3}"})
    rows.append({"src": 99, "href": "https://solo.example/",
                 "anchor": ""})
    rows.append({"src": 98, "href": "https://solo.example/",
                 "anchor": "only label"})
    ds = ray.data.from_items(rows).repartition(7)
    got = anchor_texts(ds, max_per_target=2).to_pandas() \
        .set_index("target")
    assert got.loc["https://hub.example/", "n_links"] == 40
    assert got.loc["https://hub.example/", "n_anchors"] == 40
    # 3 distinct anchors, capped to the lexicographically-first 2
    assert got.loc["https://hub.example/", "anchors"] \
        == "hub 0 | hub 1"
    assert got.loc["https://solo.example/", "n_links"] == 2
    assert got.loc["https://solo.example/", "n_anchors"] == 1
    assert got.loc["https://solo.example/", "anchors"] == "only label"
    # deterministic across a different partitioning
    again = anchor_texts(ds.repartition(2), max_per_target=2) \
        .to_pandas().set_index("target")
    assert got.sort_index().equals(again.sort_index())


def test_anchor_texts_from_extraction(ray_session):
    """extract_links → anchor_texts plumbing over real markup."""
    import ray.data

    from blacklab_ray.pipelines.graph import anchor_texts
    from blacklab_ray.stages.htmltext import extract_links
    html = ('<html><body><p><a href="/t">Visit Target</a> and '
            '<a href="/t">visit target again</a>'
            '<a href="/u"></a></p></body></html>')
    ds = ray.data.from_items([{"doc_id": 1, "html": html}])
    links = extract_links(ds)
    got = anchor_texts(links).to_pandas().set_index("target")
    assert got.loc["/t", "n_links"] == 2
    assert "Visit Target" in got.loc["/t", "anchors"]
    assert got.loc["/u", "n_anchors"] == 0


def test_pagerank_cli_string_columns(ray_session, tmp_path):
    """CLI pagerank over STRING src/dst columns (url edges) — the
    hash-per-column path (review fix: missing numpy import crashed
    every string-column run)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from blacklab_ray.cli import main
    edges = pa.table({
        "src": pa.array(["http://a.com/x", "http://b.com/y",
                         "http://c.com/z"], pa.string()),
        "dst": pa.array(["http://b.com/y", "http://c.com/z",
                         "http://a.com/x"], pa.string()),
    })
    src = tmp_path / "edges.parquet"
    pq.write_table(edges, str(src))
    out = tmp_path / "pr"
    rc = main(["pagerank", "--input", str(src), "--out", str(out),
               "--iters", "2"])
    assert rc == 0
    got = pq.read_table(str(out))
    assert got.num_rows == 3
    assert abs(sum(got["rank"].to_pylist()) - 1.0) < 1e-6
