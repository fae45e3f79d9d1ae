"""DSIR importance resampling + keyness + collocation measures vs
brute references."""

import math

import numpy as np
import pandas as pd
import pytest

from blacklab_ray.pipelines.hits import md5_low64
from blacklab_ray.pipelines.selection import (
    dsir_bucket_counts, dsir_importance_weights, dsir_log_ratio,
    dsir_select, keyness,
)

TWO64 = 18446744073709551616.0


def _toks(text):
    import re
    import unicodedata
    s = unicodedata.normalize("NFKD", text.lower())
    s = "".join(c for c in s if not unicodedata.combining(c))
    return re.findall(r"[a-z0-9]+", s)


def _grams(text):
    t = _toks(text)
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _corpus():
    rng = np.random.default_rng(42)
    wiki = ["article encyclopedia reference citation neutral",
            "article history citation source encyclopedia"]
    web = ["click here buy now free offer",
           "subscribe newsletter win prize click"]
    rows = []
    for i in range(120):
        kind = "wiki" if i % 3 == 0 else "web"
        base = wiki if kind == "wiki" else web
        words = []
        for _ in range(4):
            words.append(base[int(rng.integers(0, len(base)))])
        rows.append({"doc_id": i, "src": kind, "text": " ".join(words)})
    return pd.DataFrame(rows)


def _ds(ray_session, df, npart=5):
    import ray.data
    return ray.data.from_pandas(df).repartition(npart)


def test_dsir_bucket_counts_match_brute(ray_session):
    df = _corpus()
    B = 64
    t, r = dsir_bucket_counts(_ds(ray_session, df), "src", "wiki",
                              n_buckets=B)
    bt = np.zeros(B, np.int64)
    br = np.zeros(B, np.int64)
    for _, row in df.iterrows():
        for g in _grams(row["text"]):
            b = md5_low64(g) % B
            br[b] += 1
            if row["src"] == "wiki":
                bt[b] += 1
    assert np.array_equal(t, bt)
    assert np.array_equal(r, br)


def test_dsir_weights_match_brute_and_partition_invariant(ray_session):
    df = _corpus()
    B = 64
    t, r = dsir_bucket_counts(_ds(ray_session, df), "src", "wiki",
                              n_buckets=B)
    lr = dsir_log_ratio(t, r)
    brute = {}
    for _, row in df.iterrows():
        brute[row["doc_id"]] = sum(
            lr[md5_low64(g) % B] for g in _grams(row["text"]))
    for npart in (1, 7):
        got = dsir_importance_weights(
            _ds(ray_session, df, npart), "src", "wiki",
            n_buckets=B).to_pandas()
        assert len(got) == len(df)
        for _, row in got.iterrows():
            assert math.isclose(row["logw"], brute[row["doc_id"]],
                                rel_tol=1e-9, abs_tol=1e-9)


def test_dsir_select_prefers_targetlike_docs(ray_session):
    df = _corpus()
    sel = dsir_select(_ds(ray_session, df), "src", "wiki", k=30,
                      n_buckets=256, method="topk")
    picked = set(sel.column("doc_id").to_pylist())
    kinds = df.set_index("doc_id")["src"]
    n_wiki = sum(1 for i in picked if kinds[i] == "wiki")
    # wiki docs are 1/3 of the corpus but should dominate the pick
    assert n_wiki >= 25
    # ranked by descending logw
    logw = sel.column("logw").to_pylist()
    assert logw == sorted(logw, reverse=True)


def test_dsir_select_gumbel_deterministic(ray_session):
    df = _corpus()
    a = dsir_select(_ds(ray_session, df, 3), "src", "wiki", k=20,
                    n_buckets=128, seed=13)
    b = dsir_select(_ds(ray_session, df, 9), "src", "wiki", k=20,
                    n_buckets=128, seed=13)
    assert a.column("doc_id").to_pylist() == b.column("doc_id").to_pylist()
    # the gumbel key is the documented md5 digest
    lw = dict(zip(a.column("doc_id").to_pylist(),
                  a.column("logw").to_pylist()))
    for i, key in zip(a.column("doc_id").to_pylist(),
                      a.column("key").to_pylist()):
        u = (np.float64(np.uint64(md5_low64(f"{i}:13"))) + 1.0) / TWO64
        assert math.isclose(key, lw[i] + -math.log(-math.log(u)),
                            rel_tol=1e-12)
    # a different seed picks a different sample
    c = dsir_select(_ds(ray_session, df, 3), "src", "wiki", k=20,
                    n_buckets=128, seed=14)
    assert c.column("doc_id").to_pylist() != a.column("doc_id").to_pylist()


def _brute_keyness(df, min_freq=5):
    from collections import Counter
    cf, cr = Counter(), Counter()
    for _, row in df.iterrows():
        (cf if row["src"] == "wiki" else cr).update(_toks(row["text"]))
    n1, n2 = sum(cf.values()), sum(cr.values())
    out = {}
    for term in set(cf) | set(cr):
        a, b = cf[term], cr[term]
        if a + b < min_freq:
            continue
        e1 = n1 * (a + b) / (n1 + n2)
        e2 = n2 * (a + b) / (n1 + n2)
        ll = 2 * ((a * math.log(a / e1) if a else 0.0)
                  + (b * math.log(b / e2) if b else 0.0))
        out[term] = (round(ll, 6), a, b,
                     1 if a * n2 >= b * n1 else -1)
    return out, n1, n2


def test_keyness_matches_brute(ray_session):
    df = _corpus()
    got = keyness(_ds(ray_session, df), "src", "wiki", top_k=10)
    brute, _, _ = _brute_keyness(df)
    expect = sorted(brute.items(), key=lambda kv: (-kv[1][0], kv[0]))[:10]
    assert got.num_rows == 10
    for i, (term, (ll, a, b, sign)) in enumerate(expect):
        assert got.column("term")[i].as_py() == term
        assert got.column("ll")[i].as_py() == pytest.approx(ll, abs=1e-6)
        assert got.column("f_focus")[i].as_py() == a
        assert got.column("f_ref")[i].as_py() == b
        assert got.column("direction")[i].as_py() == sign
    # the focus-distinctive vocabulary should lead and lean positive
    top_terms = got.column("term").to_pylist()
    assert "encyclopedia" in top_terms or "citation" in top_terms
    lead = got.column("direction").to_pylist()[0]
    assert lead in (1, -1)


def test_keyness_min_freq_filters(ray_session):
    df = pd.DataFrame({
        "doc_id": range(4),
        "src": ["wiki", "wiki", "web", "web"],
        "text": ["rare alpha alpha alpha", "alpha alpha beta",
                 "beta beta beta", "beta gamma"],
    })
    got = keyness(_ds(ray_session, df, 2), "src", "wiki",
                  top_k=10, min_freq=5)
    terms = got.column("term").to_pylist()
    assert "rare" not in terms and "gamma" not in terms
    assert set(terms) == {"alpha", "beta"}


def test_collocation_measures_match_brute(ray_session):
    from blacklab_ray.pipelines.hits import collocation_measures
    df = _corpus()
    node, window = "citation", 2
    got = collocation_measures(_ds(ray_session, df), node,
                               window=window, top_k=5)
    # brute windowed co-occurrence + corpus frequencies
    from collections import Counter
    co, freq = Counter(), Counter()
    for _, row in df.iterrows():
        t = _toks(row["text"])
        freq.update(t)
        hits = [i for i, w in enumerate(t) if w == node]
        for h in hits:
            for j in range(max(0, h - window),
                           min(len(t), h + window + 1)):
                if j != h and t[j] != node:
                    co[t[j]] += 1
    n_total = sum(freq.values())
    expect = sorted(co.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got.num_rows == 5
    for i, (ct, n_xy) in enumerate(expect):
        assert got.column("context_term")[i].as_py() == ct
        assert got.column("n")[i].as_py() == n_xy
        assert got.column("f_coll")[i].as_py() == freq[ct]
        pmi = math.log2(n_xy * n_total / (freq[node] * freq[ct]))
        logdice = 14 + math.log2(2 * n_xy / (freq[node] + freq[ct]))
        tsc = (n_xy - freq[node] * freq[ct] / n_total) / math.sqrt(n_xy)
        assert got.column("pmi")[i].as_py() == pytest.approx(pmi)
        assert got.column("logdice")[i].as_py() == pytest.approx(logdice)
        assert got.column("t_score")[i].as_py() == pytest.approx(tsc)
