"""Trainable hashed-n-gram linear classifier (fastText / CCNet-style
quality filter).

The published training-data pattern (CCNet, GPT-3's WebText quality
classifier, LLaMA's wiki-reference filter): train a cheap linear model
over hashed bag-of-n-grams features on a labeled seed set, then score
the whole corpus and keep/weight documents by the predicted
probability. This module provides the two halves Ray-Data-first:

- ``train_linear_classifier``: full-batch softmax regression by
  gradient descent. Each epoch is ONE streaming pass —
  ``map_batches`` computes a SPARSE per-block gradient against the
  broadcast weights (``ray.put`` once per epoch, read per task), the
  driver accumulates partials in a deterministic order (sorted by each
  block's min row key) so retrains are bit-identical regardless of
  block arrival. Full-batch GD is the deterministic correctness path;
  at 10^12 docs you would switch the same stages to mini-batch SGD
  against a parameter-server actor (same featurizer, same gradient
  kernel) and trade determinism for wall-clock.
- ``score_documents``: an actor-pool ``map_batches`` stage holding the
  trained weights (loaded once per actor from the object store), which
  appends per-class probabilities and the argmax label. This is the
  100-TB half: pure streaming, no shuffle, weights shipped once per
  actor.

Features are crc32-hashed word uni+bigrams (stable across processes,
C-speed, the fastText trick) bucketed mod ``dim``, tf-normalized per
document. Per-actor token→bucket memoization makes repeated tokens
(the common case in web text) a dict hit, not a re-hash.
"""

from __future__ import annotations

import os
import re
import zlib
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


@dataclass
class LinearModel:
    """Trained softmax-regression model: ``weights`` is
    (n_classes, dim + 1) with the bias in the last column."""
    classes: list
    dim: int
    ngrams: tuple
    weights: np.ndarray
    train_loss: list = field(default_factory=list)


def _bucket(tok: str, dim: int, memo: dict) -> int:
    b = memo.get(tok)
    if b is None:
        b = zlib.crc32(tok.encode("utf-8")) % dim
        memo[tok] = b
    return b


def _doc_features(text: str, dim: int, ngrams: tuple,
                  memo: dict) -> tuple[np.ndarray, np.ndarray]:
    """Sparse tf-normalized features of one document: (idx, val)."""
    toks = _TOKEN_RE.findall(text.lower())
    buckets = []
    if 1 in ngrams:
        buckets.extend(_bucket(t, dim, memo) for t in toks)
    if 2 in ngrams:
        buckets.extend(_bucket(a + " " + b, dim, memo)
                       for a, b in zip(toks, toks[1:]))
    if not buckets:
        return (np.empty(0, np.int64), np.empty(0, np.float64))
    idx, cnt = np.unique(np.asarray(buckets, np.int64),
                         return_counts=True)
    return idx, cnt / len(buckets)


def _batch_csr(texts: list[str], dim: int, ngrams: tuple,
               memo: dict):
    """Batch features as CSR-ish arrays (indptr, idx, val)."""
    idxs, vals, ptr = [], [], [0]
    for t in texts:
        i, v = _doc_features(t if t is not None else "", dim,
                             ngrams, memo)
        idxs.append(i)
        vals.append(v)
        ptr.append(ptr[-1] + i.size)
    return (np.asarray(ptr, np.int64),
            np.concatenate(idxs) if idxs else np.empty(0, np.int64),
            np.concatenate(vals) if vals else np.empty(0, np.float64))


def _forward(W: np.ndarray, ptr, idx, val, n_docs: int) -> np.ndarray:
    """Softmax probabilities (n_docs, K) from sparse features."""
    K = W.shape[0]
    z = np.tile(W[:, -1], (n_docs, 1))            # bias
    if idx.size:
        contrib = W[:, idx] * val                 # (K, nnz)
        # segment-sum nnz → docs, vectorized per class
        seg = np.repeat(np.arange(n_docs), np.diff(ptr))
        for k in range(K):
            z[:, k] += np.bincount(seg, weights=contrib[k],
                                   minlength=n_docs)
    z -= z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


class _GradStage:
    """Per-block sparse gradient + loss against broadcast weights."""

    def __init__(self, w_ref, classes, dim, ngrams, text_col,
                 label_col, key_col):
        self.W = ray.get(w_ref) if isinstance(
            w_ref, ray.ObjectRef) else w_ref
        self.cls_of = {c: i for i, c in enumerate(classes)}
        self.dim, self.ngrams = dim, ngrams
        self.text_col, self.label_col = text_col, label_col
        self.key_col = key_col
        self.memo: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out_schema = pa.schema([
            ("block_key", pa.int64()), ("n", pa.int64()),
            ("loss", pa.float64()),
            ("g_idx", pa.list_(pa.int64())),
            ("g_val", pa.list_(pa.float64())),
            ("g_bias", pa.list_(pa.float64()))])
        if n == 0:
            return out_schema.empty_table()
        texts = batch.column(self.text_col).to_pylist()
        y = np.asarray([self.cls_of[c] for c in
                        batch.column(self.label_col).to_pylist()])
        keys = batch.column(self.key_col).to_numpy(
            zero_copy_only=False)
        ptr, idx, val = _batch_csr(texts, self.dim, self.ngrams,
                                   self.memo)
        K = self.W.shape[0]
        p = _forward(self.W, ptr, idx, val, n)
        loss = -float(np.log(np.clip(p[np.arange(n), y],
                                     1e-12, None)).sum())
        err = p                                    # (n, K)
        err[np.arange(n), y] -= 1.0
        # dL/dW[k, j] = sum_docs err[d, k] * x[d, j] — sparse by j
        seg = np.repeat(np.arange(n), np.diff(ptr))
        g_flat = err[seg] * val[:, None]           # (nnz, K)
        # collapse duplicate buckets within the block
        uidx, inv = np.unique(idx, return_inverse=True)
        g = np.zeros((uidx.size, K))
        np.add.at(g, inv, g_flat)
        # flatten to one (class-major) sparse vector: j*K + k
        jj = np.repeat(uidx, K) * K + np.tile(np.arange(K),
                                              uidx.size)
        return pa.table({
            "block_key": pa.array([int(keys.min())], pa.int64()),
            "n": pa.array([n], pa.int64()),
            "loss": pa.array([loss], pa.float64()),
            "g_idx": pa.array([jj.tolist()]),
            "g_val": pa.array([g.reshape(-1).tolist()]),
            "g_bias": pa.array([err.sum(axis=0).tolist()]),
        }).cast(out_schema)


def train_linear_classifier(ds: ray.data.Dataset, text_col: str,
                            label_col: str, key_col: str,
                            dim: int = 1 << 16,
                            ngrams: tuple = (1, 2),
                            epochs: int = 20, lr: float = 2.0,
                            l2: float = 1e-6) -> LinearModel:
    """Full-batch softmax regression over hashed n-gram features.

    ``key_col`` must be a per-row int column (doc id); each block's
    min key orders the partial-gradient accumulation so training is
    deterministic whatever the block arrival order. One streaming
    pass per epoch; weights broadcast once per epoch via ``ray.put``.

    NOT SQL-expressible (iterative optimization) — covered by
    tests/test_classifier.py against numeric gradients and planted
    corpora, not a driver oracle."""
    classes = sorted(
        r[label_col] for r in
        ds.groupby(label_col).count().take_all())
    K = len(classes)
    if K < 2:
        raise ValueError("need at least two classes")
    W = np.zeros((K, dim + 1))
    total_n = None
    losses = []
    slim = ds.select_columns([key_col, text_col, label_col])
    for _ in range(epochs):
        w_ref = ray.put(W)
        parts = slim.map_batches(
            _GradStage, fn_constructor_args=(
                w_ref, classes, dim, ngrams, text_col, label_col,
                key_col),
            concurrency=(1, 8), batch_format="pyarrow").take_all()
        parts.sort(key=lambda r: r["block_key"])
        if total_n is None:
            total_n = sum(r["n"] for r in parts)
        G = np.zeros_like(W)
        loss = 0.0
        for r in parts:
            loss += r["loss"]
            jj = np.asarray(r["g_idx"], np.int64)
            gv = np.asarray(r["g_val"])
            np.add.at(G[:, :-1], (jj % K, jj // K), gv)
            G[:, -1] += np.asarray(r["g_bias"])
        loss = loss / total_n + 0.5 * l2 * float((W * W).sum())
        losses.append(loss)
        W = W - lr * (G / total_n + l2 * W)
    return LinearModel(classes=classes, dim=dim, ngrams=ngrams,
                       weights=W, train_loss=losses)


class _ScoreStage:
    """Actor-pool scorer: weights fetched once per actor."""

    def __init__(self, w_ref, classes, dim, ngrams, text_col):
        self.W = ray.get(w_ref) if isinstance(
            w_ref, ray.ObjectRef) else w_ref
        self.classes = classes
        self.dim, self.ngrams = dim, ngrams
        self.text_col = text_col
        self.memo: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            # schema-consistent empty output: downstream filters key on
            # p_<class>/pred_label and must not see a narrower block
            out = batch
            for c in self.classes:
                out = out.append_column(
                    f"p_{c}", pa.array([], pa.float64()))
            return out.append_column("pred_label",
                                     pa.array([], pa.string()))
        texts = batch.column(self.text_col).to_pylist()
        ptr, idx, val = _batch_csr(texts, self.dim, self.ngrams,
                                   self.memo)
        p = _forward(self.W, ptr, idx, val, n)
        out = batch
        for k, c in enumerate(self.classes):
            out = out.append_column(f"p_{c}",
                                    pa.array(p[:, k], pa.float64()))
        pred = [self.classes[i] for i in p.argmax(axis=1)]
        return out.append_column("pred_label", pa.array(pred))


def score_documents(ds: ray.data.Dataset, model: LinearModel,
                    text_col: str = "text",
                    concurrency=(1, 8)) -> ray.data.Dataset:
    """Append per-class probabilities (``p_<class>``) and the argmax
    ``pred_label`` — the streaming corpus-scoring half. Weights ship
    to each actor once (object store), never per batch."""
    w_ref = ray.put(model.weights)
    return ds.map_batches(
        _ScoreStage,
        fn_constructor_args=(w_ref, model.classes, model.dim,
                             model.ngrams, text_col),
        concurrency=concurrency, batch_format="pyarrow")


def save_model(model: LinearModel, path: str) -> None:
    """Persist a trained model (npz: weights + metadata).

    ``np.savez_compressed`` appends ``.npz`` when the suffix is
    missing; normalize here so the path callers recorded (e.g. the
    clf-train CLI's printed ``out``) is the file that exists."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez_compressed(
        path, weights=model.weights,
        classes=np.array([str(c) for c in model.classes],
                         dtype=object),
        dim=model.dim, ngrams=np.array(model.ngrams, np.int64),
        train_loss=np.array(model.train_loss))


def load_model(path: str) -> LinearModel:
    if not os.path.exists(path) and not path.endswith(".npz") \
            and os.path.exists(path + ".npz"):
        path = path + ".npz"
    z = np.load(path, allow_pickle=True)
    return LinearModel(
        classes=[str(c) for c in z["classes"].tolist()],
        dim=int(z["dim"]), ngrams=tuple(int(n) for n in z["ngrams"]),
        weights=z["weights"],
        train_loss=[float(x) for x in z["train_loss"]])


def quality_filter_by_model(ds: ray.data.Dataset, model: LinearModel,
                            keep_class, min_prob: float = 0.5,
                            text_col: str = "text") -> ray.data.Dataset:
    """CCNet-style model filter: keep rows the classifier assigns to
    ``keep_class`` with probability >= ``min_prob``."""
    import pyarrow.compute as pc
    scored = score_documents(ds, model, text_col=text_col)
    col = f"p_{keep_class}"

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column(col), min_prob))

    return scored.map_batches(_f, batch_format="pyarrow")
