"""Text-analysis operators: quality scoring, language ID, token counts.

Training-data-pipeline operators over a documents table. All are
single-pass ``map_batches`` with batch-local partials ahead of any
groupby (the combiner pattern), vectorized where the kernel allows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Mean, Sum

from blacklab_ray.analysis.analyzers import (
    STOPWORD_SET, tokenize_column,
)

# minimal stopword profiles for the language-ID heuristic
_LANG_PROFILES = {
    "en": {"the", "of", "and", "to", "a", "in", "is", "it", "you", "that"},
    "nl": {"de", "het", "een", "en", "van", "ik", "te", "dat", "die", "in"},
    "de": {"der", "die", "das", "und", "ist", "ich", "nicht", "ein", "zu"},
    "fr": {"le", "la", "les", "et", "un", "une", "des", "est", "je", "que"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "de"},
}


class QualityStats:
    """map_batches: per-doc quality features (vectorized counters)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self._text = text_col
        self._id = id_col
        self._stop = STOPWORD_SET

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self._text)
        parents, toks, _, lens = tokenize_column(text)
        n_docs = batch.num_rows
        # stopword tokens per doc
        stop_mask = pc.is_in(
            toks, value_set=pa.array(sorted(self._stop))) \
            .to_numpy(zero_copy_only=False)
        stop_per_doc = np.bincount(parents[stop_mask], minlength=n_docs)
        # mean token length per doc
        tok_lens = pc.utf8_length(toks).to_numpy(zero_copy_only=False)
        sum_len = np.bincount(parents, weights=tok_lens, minlength=n_docs)
        safe = np.maximum(lens, 1)
        # character-class ratios on the raw text
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        alpha = np.array(
            [sum(c.isalpha() or c.isspace() for c in t)
             for t in text.to_pylist()], dtype=np.float64)
        return pa.table({
            "doc_id": batch.column(self._id).cast(pa.int64()),
            "token_count": pa.array(lens, pa.int64()),
            "stopword_ratio": pa.array(stop_per_doc / safe, pa.float64()),
            "mean_token_len": pa.array(sum_len / safe, pa.float64()),
            "alpha_ratio": pa.array(
                np.divide(alpha, np.maximum(n_chars, 1)), pa.float64()),
        })


def quality_scores(ds: ray.data.Dataset, text_col: str = "text",
                   id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(QualityStats(text_col, id_col),
                          batch_format="pyarrow")


def quality_by(ds: ray.data.Dataset, group_col: str,
               text_col: str = "text",
               id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-group quality aggregates (n_docs, avg token count/ratios)."""

    class _WithGroup(QualityStats):
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = super().__call__(batch)
            return out.append_column("grp", batch.column(group_col))

    scored = ds.map_batches(_WithGroup(text_col, id_col),
                            batch_format="pyarrow")
    out = scored.groupby("grp").aggregate(
        Count(alias_name="n_docs"),
        Mean("token_count", alias_name="avg_tokens"),
        Mean("stopword_ratio", alias_name="avg_stopword_ratio"),
        Mean("alpha_ratio", alias_name="avg_alpha_ratio"))
    return out.map_batches(
        lambda t: t.rename_columns(
            [group_col, "n_docs", "avg_tokens", "avg_stopword_ratio",
             "avg_alpha_ratio"]),
        batch_format="pyarrow")


class LangId:
    """map_batches actor: n-gram/stopword-profile language heuristic."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self._text = text_col
        self._id = id_col
        self._profiles = {k: frozenset(v)
                          for k, v in _LANG_PROFILES.items()}

    def classify(self, toks: list[str]) -> str:
        if not toks:
            return "und"
        scores = {lang: sum(t in prof for t in toks)
                  for lang, prof in self._profiles.items()}
        best = max(sorted(scores), key=lambda k: scores[k])
        return best if scores[best] > 0 else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        parents, toks, _, lens = tokenize_column(batch.column(self._text))
        toks_list = toks.to_pylist()
        starts = np.zeros(lens.size, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        preds = [self.classify(
            toks_list[int(s):int(s + l)])
            for s, l in zip(starts, lens)]
        return pa.table({
            "doc_id": batch.column(self._id).cast(pa.int64()),
            "lang_pred": pa.array(preds, pa.string()),
        })


def lang_id(ds: ray.data.Dataset, text_col: str = "text",
            id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(LangId, fn_constructor_kwargs={
        "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=2)


# GPT-2-style pretokenizer shape, restricted to RE2-portable ASCII
# classes (no lookahead, no \p{} — the SAME pattern string runs in
# Arrow's count_substring_regex AND DuckDB's regexp_extract_all, so
# the operator is exactly SQL-oracleable): a token is an optional
# leading space + a letter run / digit run / punctuation run, or a
# whitespace run.
BPE_SPLIT_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n]+|[ \t\n]+"


def bpe_token_counts(col: pa.Array | pa.ChunkedArray,
                     pattern: str = BPE_SPLIT_RE) -> pa.Array:
    """Per-row BPE-ish token counts — one vectorized RE2 kernel."""
    return pc.count_substring_regex(col, pattern)


def token_counts_by(ds: ray.data.Dataset, group_col: str,
                    text_col: str = "text",
                    id_col: str = "doc_id",
                    bpe: bool = False) -> ray.data.Dataset:
    """Per-group doc + token counts (partial-agg then tiny groupby).

    ``bpe=True`` adds ``total_bpe_tokens``: the BPE-ish pretokenizer
    match count (BPE_SPLIT_RE) — the "how many LLM tokens is this
    corpus" estimator a training-data pipeline sizes batches with."""

    class _P:
        def __call__(self, batch: pa.Table) -> pa.Table:
            _, _, _, lens = tokenize_column(batch.column(text_col))
            cols = {
                "grp": batch.column(group_col),
                "doc_len": pa.array(lens, pa.int64()),
            }
            if bpe:
                cols["bpe_len"] = bpe_token_counts(
                    batch.column(text_col)).cast(pa.int64())
            return pa.table(cols)

    partial = ds.map_batches(_P(), batch_format="pyarrow")
    aggs = [Count(alias_name="n_docs"),
            Sum("doc_len", alias_name="total_tokens")]
    names = [group_col, "n_docs", "total_tokens"]
    if bpe:
        aggs.append(Sum("bpe_len", alias_name="total_bpe_tokens"))
        names.append("total_bpe_tokens")
    out = partial.groupby("grp").aggregate(*aggs)
    return out.map_batches(
        lambda t: t.rename_columns(names), batch_format="pyarrow")
