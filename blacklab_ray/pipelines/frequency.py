"""Corpus frequency analytics as Ray Data groupby pipelines.

The Ray-native replacement for BlackLab's FrequencyTool (tools/src/main/
java/nl/inl/blacklab/tools/frequency/FrequencyTool.java:55,170-245), which
hand-rolls per-chunk HashMap partial aggregates + sorted-chunk spills +
k-way merge. Here the same computation is: batch-local partial counts
inside ``map_batches`` (the combiner — keeps shuffle bytes ≈ distinct
keys, not token count) followed by a small ``groupby().sum()``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from blacklab_ray.analysis.analyzers import tokenize_column


class TokenCountPartial:
    """map_batches combiner: batch → (term[, group], partial df/tf)."""

    def __init__(self, group_col: str | None = None,
                 text_col: str = "text"):
        self._group = group_col
        self._text = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        parents, toks, _, _ = tokenize_column(batch.column(self._text))
        if self._group is None:
            # (term) partials: tf = occurrences, df = distinct docs
            tbl = pa.table({"term": toks,
                            "doc": pa.array(parents, pa.int64())})
            gb = tbl.group_by(["term", "doc"]).aggregate([("doc", "count")])
            per_doc = gb.group_by("term").aggregate(
                [("doc_count", "sum"), ("doc", "count")])
            return pa.table({
                "term": per_doc["term"],
                "tf": per_doc["doc_count_sum"].cast(pa.int64()),
                "df": per_doc["doc_count"].cast(pa.int64()),
            })
        group_vals = pc.take(batch.column(self._group), pa.array(parents))
        tbl = pa.table({"term": toks, "grp": group_vals})
        gb = tbl.group_by(["term", "grp"]).aggregate([([], "count_all")])
        return pa.table({
            "term": gb["term"], "grp": gb["grp"],
            "tf": gb["count_all"].cast(pa.int64()),
        })


def term_frequencies(ds: ray.data.Dataset,
                     text_col: str = "text") -> ray.data.Dataset:
    """term → (doc_freq, collection_tf) over a corpus Dataset.

    BlackLabIndex.termFrequencies analogue (search/BlackLabIndex.java:212)
    computed straight from text (no index needed).
    """
    partial = ds.map_batches(TokenCountPartial(text_col=text_col),
                             batch_format="pyarrow")
    return partial.groupby("term").aggregate(
        Sum("df", alias_name="doc_freq"),
        Sum("tf", alias_name="collection_tf"))


def freq_by(ds: ray.data.Dataset, group_col: str,
            text_col: str = "text") -> ray.data.Dataset:
    """token × metadata frequency list (FrequencyTool's core output)."""
    partial = ds.map_batches(
        TokenCountPartial(group_col=group_col, text_col=text_col),
        batch_format="pyarrow")
    out = partial.groupby(["term", "grp"]).aggregate(
        Sum("tf", alias_name="tf"))
    return out.map_batches(
        lambda t: t.rename_columns(
            ["term", group_col, "tf"]), batch_format="pyarrow")


class DocStats:
    """map_batches: per-doc token counts (doc table without an index)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self._text = text_col
        self._id = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        _, _, _, lens = tokenize_column(batch.column(self._text))
        return pa.table({
            "doc_id": batch.column(self._id).cast(pa.int64()),
            "doc_len": pa.array(lens, pa.int64()),
        })


def doc_stats(ds: ray.data.Dataset, text_col: str = "text",
              id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(DocStats(text_col, id_col),
                          batch_format="pyarrow")


def corpus_stats(ds: ray.data.Dataset, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    """(total_docs, total_tokens, avg_doc_len) — small driver result."""
    agg = doc_stats(ds, text_col, id_col).aggregate(
        Count(alias_name="total_docs"),
        Sum("doc_len", alias_name="total_tokens"))
    total_docs = int(agg["total_docs"])
    total_tokens = int(agg["total_tokens"] or 0)
    return pa.table({
        "total_docs": pa.array([total_docs], pa.int64()),
        "total_tokens": pa.array([total_tokens], pa.int64()),
        "avg_doc_len": pa.array(
            [round(total_tokens / max(total_docs, 1), 6)], pa.float64()),
    })
