"""Hashed-n-gram linear classifier: gradient correctness, planted
separability, determinism, and the scoring/filter stages."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from blacklab_ray.pipelines.classifier import (
    _GradStage, _batch_csr, _forward, quality_filter_by_model,
    score_documents, train_linear_classifier)

DIM = 64
A_WORDS = ["alpha", "amber", "acorn", "apex", "atlas"]
B_WORDS = ["bravo", "birch", "bison", "blaze", "brook"]
C_WORDS = ["cedar", "comet", "coral", "crest", "cliff"]
NOISE = ["the", "of", "and", "to", "in"]


def _mk_docs(rng, words, n, label, start_id):
    rows = []
    for i in range(n):
        toks = list(rng.choice(words, 12)) + list(rng.choice(NOISE, 4))
        rng.shuffle(toks)
        rows.append({"doc_id": start_id + i, "text": " ".join(toks),
                     "label": label})
    return rows


@pytest.fixture(scope="module")
def planted():
    rng = np.random.default_rng(3)
    rows = (_mk_docs(rng, A_WORDS, 120, "good", 0)
            + _mk_docs(rng, B_WORDS, 120, "bad", 1000))
    rng.shuffle(rows)
    return rows[:200], rows[200:]  # train, holdout


def test_gradient_matches_numeric():
    """Analytic block gradient == finite differences of the local
    loss — run directly, no Ray round trip."""
    rng = np.random.default_rng(0)
    texts = ["alpha amber the", "bravo of bravo", "acorn atlas",
             "blaze brook in the"]
    labels = ["g", "b", "g", "b"]
    batch = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                      "text": texts, "label": labels})
    W = rng.standard_normal((2, DIM + 1)) * 0.1
    stage = _GradStage(W.copy(), ["b", "g"], DIM, (1, 2), "text",
                       "label", "doc_id")
    out = stage(batch)
    G = np.zeros_like(W)
    jj = np.asarray(out["g_idx"][0].as_py(), np.int64)
    gv = np.asarray(out["g_val"][0].as_py())
    np.add.at(G[:, :-1], (jj % 2, jj // 2), gv)
    G[:, -1] += np.asarray(out["g_bias"][0].as_py())

    def loss(Wx):
        ptr, idx, val = _batch_csr(texts, DIM, (1, 2), {})
        p = _forward(Wx, ptr, idx, val, 4)
        y = np.array([1, 0, 1, 0])
        return -float(np.log(p[np.arange(4), y]).sum())

    eps = 1e-6
    for (k, j) in [(0, G[0, :-1].argmax()), (1, G[1, :-1].argmin()),
                   (0, DIM), (1, DIM)]:
        Wp, Wm = W.copy(), W.copy()
        Wp[k, j] += eps
        Wm[k, j] -= eps
        num = (loss(Wp) - loss(Wm)) / (2 * eps)
        assert abs(num - G[k, j]) < 1e-5, (k, j, num, G[k, j])


def _train(ray_session, rows, **kw):
    import ray.data
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(4)
    kw.setdefault("dim", DIM)
    kw.setdefault("epochs", 25)
    kw.setdefault("lr", 4.0)
    return train_linear_classifier(ds, "text", "label", "doc_id",
                                   **kw)


@pytest.fixture(scope="module")
def planted_model(ray_session, planted):
    return _train(ray_session, planted[0])


def test_planted_two_class(ray_session, planted, planted_model):
    import ray.data
    train, hold = planted
    model = planted_model
    # loss decreases and ends well below ln(2)
    assert model.train_loss[-1] < model.train_loss[0]
    assert model.train_loss[-1] < 0.3
    assert all(b <= a + 1e-9 for a, b in
               zip(model.train_loss, model.train_loss[1:]))
    scored = score_documents(
        ray.data.from_pandas(pd.DataFrame(hold)), model).to_pandas()
    acc = (scored["pred_label"] == scored["label"]).mean()
    assert acc >= 0.95, acc
    # probabilities are a distribution
    s = scored["p_good"] + scored["p_bad"]
    assert np.allclose(s, 1.0)


def test_deterministic_retrain(ray_session, planted):
    train, _ = planted
    m1 = _train(ray_session, train, epochs=5)
    m2 = _train(ray_session, train, epochs=5)
    assert m1.classes == m2.classes
    assert np.array_equal(m1.weights, m2.weights)  # bit-identical


def test_multiclass(ray_session):
    rng = np.random.default_rng(9)
    rows = (_mk_docs(rng, A_WORDS, 60, "a", 0)
            + _mk_docs(rng, B_WORDS, 60, "b", 500)
            + _mk_docs(rng, C_WORDS, 60, "c", 900))
    model = _train(ray_session, rows, epochs=30)
    assert model.classes == ["a", "b", "c"]
    import ray.data
    scored = score_documents(
        ray.data.from_pandas(pd.DataFrame(rows)), model).to_pandas()
    assert (scored["pred_label"] == scored["label"]).mean() >= 0.95


def test_score_matches_local_forward(ray_session, planted):
    import ray.data
    train, hold = planted
    model = _train(ray_session, train, epochs=3)
    scored = score_documents(
        ray.data.from_pandas(pd.DataFrame(hold)), model).to_pandas()
    texts = [r["text"] for r in hold]
    ptr, idx, val = _batch_csr(texts, model.dim, model.ngrams, {})
    p = _forward(model.weights, ptr, idx, val, len(texts))
    got = scored.sort_values("doc_id")
    want_order = np.argsort([r["doc_id"] for r in hold])
    for k, c in enumerate(model.classes):
        assert np.allclose(got[f"p_{c}"].to_numpy(),
                           p[want_order, k])


def test_quality_filter(ray_session, planted, planted_model):
    import ray.data
    train, hold = planted
    model = planted_model
    hold_ds = ray.data.from_pandas(pd.DataFrame(hold))
    kept = quality_filter_by_model(
        hold_ds, model, keep_class="good",
        min_prob=0.6).to_pandas()
    assert 0 < len(kept) < len(hold)
    assert (kept["p_good"] >= 0.6).all()
    assert (kept["label"] == "good").mean() >= 0.95
    # the filter is exactly "scored rows above the cut"
    scored = score_documents(hold_ds, model).to_pandas()
    want = set(scored[scored["p_good"] >= 0.6]["doc_id"])
    assert set(kept["doc_id"]) == want


def test_save_load_roundtrip(ray_session, planted, planted_model, tmp_path):
    import ray.data
    from blacklab_ray.pipelines.classifier import load_model, save_model
    _, hold = planted
    p = str(tmp_path / "m.npz")
    save_model(planted_model, p)
    m2 = load_model(p)
    assert m2.classes == planted_model.classes
    assert m2.dim == planted_model.dim
    assert m2.ngrams == planted_model.ngrams
    assert np.array_equal(m2.weights, planted_model.weights)
    hold_ds = ray.data.from_pandas(pd.DataFrame(hold))
    a = score_documents(hold_ds, planted_model).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = score_documents(hold_ds, m2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_curate_model_filter_stage(ray_session, planted, planted_model):
    """curate(model_filter=...) keeps exactly the ids the classifier
    passes, composed with the rest of the recipe disabled."""
    import ray.data
    from blacklab_ray.pipelines.curate import curate
    _, hold = planted
    ds = ray.data.from_pandas(pd.DataFrame(
        [{"doc_id": r["doc_id"], "text": r["text"]} for r in hold]))
    permissive = {"min_tokens": 1, "min_mean_token_len": 0.0,
                  "max_mean_token_len": 100.0,
                  "min_alpha_word_ratio": 0.0,
                  "max_dup_line_frac": 1.0,
                  "max_top_bigram_frac": 1.0}
    out = curate(ds, languages=None, quality_thresholds=permissive,
                 scrub_pii=False, normalize=False,
                 model_filter=planted_model, model_keep_class="good",
                 model_min_prob=0.6).to_pandas()
    scored = score_documents(ds, planted_model).to_pandas()
    want = set(scored[scored["p_good"] >= 0.6]["doc_id"])
    assert set(out["doc_id"]) == want
    assert 0 < len(out) < len(hold)


def test_score_empty_blocks_keep_schema(ray_session, planted,
                                        planted_model):
    """An upstream filter that empties some blocks must not crash the
    scorer chain: _ScoreStage emits schema-consistent empty tables
    (p_<class>/pred_label present), so downstream filters still key on
    those columns (code-review r4 finding)."""
    import pyarrow.compute as pc
    import ray.data
    ds = ray.data.from_pandas(pd.DataFrame(planted[0])).repartition(8)
    # empty MOST blocks before scoring
    ds = ds.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], 3)),
        batch_format="pyarrow")
    kept = quality_filter_by_model(
        ds, planted_model, keep_class="good", min_prob=0.0)
    out = kept.to_pandas()
    assert set(out["doc_id"]) <= {0, 1, 2}
    assert "pred_label" in out.columns


def test_save_load_suffix_normalized(ray_session, planted_model,
                                     tmp_path):
    """save_model without .npz still round-trips (numpy appends the
    suffix; load_model falls back to path + '.npz')."""
    from blacklab_ray.pipelines.classifier import load_model, save_model
    p = str(tmp_path / "model")          # no suffix
    save_model(planted_model, p)
    m = load_model(p)                    # loads model.npz via fallback
    assert m.classes == planted_model.classes
    assert (m.weights == planted_model.weights).all()
