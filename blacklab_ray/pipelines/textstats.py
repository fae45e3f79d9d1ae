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

    def __call__(self, batch: pa.Table, tokens=None) -> pa.Table:
        text = batch.column(self._text)
        parents, toks, _, lens = tokens or tokenize_column(text)
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
        # character-class ratios on the raw text — ONE RE2 kernel per
        # batch (the same class the DuckDB oracle strips on); the old
        # per-character Python loop is the hot-path shape that dies at
        # corpus scale
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        alpha = pc.count_substring_regex(
            text, pattern=r"[a-zA-Z \t\n]").to_numpy(
            zero_copy_only=False).astype(np.float64)
        # Gopher's actual rule is WORD-level (fraction of words with an
        # alphabetic char); the analyzer folds accents, so this is
        # language-neutral where the char-level ASCII ratio is not
        word_alpha = pc.match_substring_regex(toks, pattern="[a-z]") \
            .to_numpy(zero_copy_only=False)
        alpha_words = np.bincount(parents[word_alpha], minlength=n_docs)
        return pa.table({
            self._id: batch.column(self._id).cast(pa.int64()),
            "token_count": pa.array(lens, pa.int64()),
            "stopword_ratio": pa.array(stop_per_doc / safe, pa.float64()),
            "mean_token_len": pa.array(sum_len / safe, pa.float64()),
            "alpha_ratio": pa.array(
                np.divide(alpha, np.maximum(n_chars, 1)), pa.float64()),
            "alpha_word_ratio": pa.array(alpha_words / safe,
                                         pa.float64()),
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
        """Vectorized: one ``is_in`` + ``bincount`` per profile builds
        the (docs x langs) score matrix; argmax over langs sorted
        ascending implements the score-DESC-then-lang tie-break (the
        same ORDER BY the SQL oracle uses). The per-doc Python
        ``classify`` loop this replaces is kept for single-doc use."""
        parents, toks, _, lens = tokenize_column(batch.column(self._text))
        n_docs = batch.num_rows
        langs = sorted(self._profiles)
        scores = np.zeros((n_docs, len(langs)), dtype=np.int64)
        for j, lang in enumerate(langs):
            mask = pc.is_in(
                toks, value_set=pa.array(sorted(self._profiles[lang]))) \
                .to_numpy(zero_copy_only=False)
            scores[:, j] = np.bincount(parents[mask], minlength=n_docs)
        best = np.argmax(scores, axis=1)  # first max = smallest lang
        best_score = scores[np.arange(n_docs), best]
        lang_arr = np.array(langs, dtype=object)
        preds = np.where(best_score > 0, lang_arr[best], "und")
        return pa.table({
            self._id: batch.column(self._id).cast(pa.int64()),
            "lang_pred": pa.array(list(preds), pa.string()),
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


# ---- Gopher-style repetition signals ---------------------------------------


class RepetitionStats:
    """map_batches: per-doc repetition signals (the Gopher paper's
    repetition-removal family — Rae et al. 2021 §A1.1), all vectorized
    across the batch:

    - ``dup_line_frac``: fraction of non-empty lines whose exact text
      occurs more than once in the document;
    - ``top_bigram_frac``: fraction of tokens covered by the most
      frequent token bigram (count*2 / tokens);
    - ``max_token_run``: longest run of one repeated token.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self._text = text_col
        self._id = id_col

    @staticmethod
    def _group_sizes(primary: np.ndarray, secondary: np.ndarray
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Sizes of (primary, secondary) groups via ONE lexsort —
        returns (group_primary, group_size, size_of_own_group per
        original row)."""
        order = np.lexsort((secondary, primary))
        p, s = primary[order], secondary[order]
        new = np.empty(p.size, dtype=bool)
        new[:1] = True
        np.not_equal(p[1:], p[:-1], out=new[1:])
        if s.size:
            new[1:] |= s[1:] != s[:-1]
        gid = np.cumsum(new) - 1
        sizes = np.bincount(gid)
        per_row_sorted = sizes[gid]
        per_row = np.empty(p.size, dtype=np.int64)
        per_row[order] = per_row_sorted
        starts = np.flatnonzero(new)
        return p[starts], sizes, per_row

    def __call__(self, batch: pa.Table, tokens=None) -> pa.Table:
        text = batch.column(self._text)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_docs = batch.num_rows
        parents, toks, _, lens = tokens or tokenize_column(text)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        codes = pc.dictionary_encode(toks).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        safe = np.maximum(lens, 1).astype(np.float64)

        # longest same-token run per doc
        max_run = np.zeros(n_docs, dtype=np.int64)
        if codes.size:
            brk = np.flatnonzero(
                (codes[1:] != codes[:-1]) | (parents[1:] != parents[:-1]))
            starts = np.concatenate(([0], brk + 1))
            ends = np.concatenate((brk + 1, [codes.size]))
            np.maximum.at(max_run, parents[starts], ends - starts)

        # most frequent bigram per doc
        top_bi = np.zeros(n_docs, dtype=np.int64)
        if codes.size > 1:
            same = parents[1:] == parents[:-1]
            bd = parents[:-1][same]
            b1, b2 = codes[:-1][same], codes[1:][same]
            if bd.size:
                # group by (doc, bigram): two-level lexsort
                order = np.lexsort((b2, b1, bd))
                d, x, y = bd[order], b1[order], b2[order]
                new = np.empty(d.size, dtype=bool)
                new[:1] = True
                new[1:] = (d[1:] != d[:-1]) | (x[1:] != x[:-1]) \
                    | (y[1:] != y[:-1])
                gid = np.cumsum(new) - 1
                sizes = np.bincount(gid)
                gstart = np.flatnonzero(new)
                np.maximum.at(top_bi, d[gstart], sizes)

        # duplicate-line occurrences per doc
        lines = pc.split_pattern(text, pattern="\n")
        flat = pc.list_flatten(lines)
        lparents = pc.list_parent_indices(lines).to_numpy(
            zero_copy_only=False)
        nonempty = pc.not_equal(pc.utf8_trim_whitespace(flat), "")
        nmask = nonempty.to_numpy(zero_copy_only=False)
        flat = flat.filter(nonempty)
        lparents = lparents[nmask]
        n_lines = np.bincount(lparents, minlength=n_docs)
        dup_lines = np.zeros(n_docs, dtype=np.int64)
        if len(flat):
            lcodes = pc.dictionary_encode(
                flat.combine_chunks() if isinstance(flat, pa.ChunkedArray)
                else flat).indices.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            _, _, own = self._group_sizes(lparents, lcodes)
            np.add.at(dup_lines, lparents[own > 1], 1)

        return pa.table({
            self._id: batch.column(self._id).cast(pa.int64()),
            "dup_line_frac": pa.array(
                dup_lines / np.maximum(n_lines, 1), pa.float64()),
            "top_bigram_frac": pa.array(
                np.minimum(top_bi * 2 / safe, 1.0), pa.float64()),
            "max_token_run": pa.array(max_run, pa.int64()),
        })


def repetition_scores(ds: ray.data.Dataset, text_col: str = "text",
                      id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(RepetitionStats(text_col, id_col),
                          batch_format="pyarrow")


# Published Gopher-rule thresholds (Rae et al. 2021 table A1) that are
# computable from this module's signals; callers can override any.
GOPHER_THRESHOLDS = {
    "min_tokens": 50,
    "max_tokens": 100_000,
    "min_mean_token_len": 3.0,
    "max_mean_token_len": 10.0,
    "min_stopword_ratio": 0.0,   # Gopher: >= 2 stopwords; ratio form
    # Gopher's published rule is WORD-level: >= 80% of words contain an
    # alphabetic character. The char-level ASCII ratio stays available
    # as an opt-in (min_alpha_ratio) but defaults OFF — it wrongly
    # penalizes numeric/accented text in the non-English languages the
    # lang-ID stage explicitly supports.
    "min_alpha_word_ratio": 0.8,
    "min_alpha_ratio": 0.0,
    "max_dup_line_frac": 0.30,
    "max_top_bigram_frac": 0.18,
}


def quality_filter(ds: ray.data.Dataset, text_col: str = "text",
                   id_col: str = "doc_id",
                   thresholds: dict | None = None) -> ray.data.Dataset:
    """Gopher-style keep/drop decision per doc: QualityStats +
    RepetitionStats signals against the published thresholds. Returns
    (id, keep, and every signal) so the caller can audit the decision.

    One fused map_batches pass — both stat classes run on the same
    batch, so the text is tokenized/scanned once per stage but never
    shuffled."""
    th = dict(GOPHER_THRESHOLDS)
    th.update(thresholds or {})
    q = QualityStats(text_col, id_col)
    r = RepetitionStats(text_col, id_col)

    def _score(batch: pa.Table) -> pa.Table:
        # tokenize ONCE, share across both stat classes
        tk = tokenize_column(batch.column(text_col))
        qt, rt = q(batch, tokens=tk), r(batch, tokens=tk)
        keep = (
            (qt["token_count"].to_numpy(zero_copy_only=False)
             >= th["min_tokens"])
            & (qt["token_count"].to_numpy(zero_copy_only=False)
               <= th["max_tokens"])
            & (qt["mean_token_len"].to_numpy(zero_copy_only=False)
               >= th["min_mean_token_len"])
            & (qt["mean_token_len"].to_numpy(zero_copy_only=False)
               <= th["max_mean_token_len"])
            & (qt["stopword_ratio"].to_numpy(zero_copy_only=False)
               >= th["min_stopword_ratio"])
            & (qt["alpha_ratio"].to_numpy(zero_copy_only=False)
               >= th["min_alpha_ratio"])
            & (qt["alpha_word_ratio"].to_numpy(zero_copy_only=False)
               >= th["min_alpha_word_ratio"])
            & (rt["dup_line_frac"].to_numpy(zero_copy_only=False)
               <= th["max_dup_line_frac"])
            & (rt["top_bigram_frac"].to_numpy(zero_copy_only=False)
               <= th["max_top_bigram_frac"])
        )
        out = qt
        for name in ("dup_line_frac", "top_bigram_frac",
                     "max_token_run"):
            out = out.append_column(name, rt[name])
        return out.append_column("keep", pa.array(keep))

    return ds.map_batches(_score, batch_format="pyarrow")
