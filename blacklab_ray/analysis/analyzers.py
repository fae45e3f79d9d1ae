"""Tokenization + sensitivity normalization (vectorized over Arrow).

Reference semantics (reimplemented, not ported):
- BlackLab's standard analyzer tokenizes and, for the insensitive (`@i`)
  sensitivity, lowercases and strips accents
  (engine/src/main/java/nl/inl/blacklab/analysis/BLStandardAnalyzer.java:20-43,
  DesensitizeFilter.java:33-47, RemoveAllAccentsFilter.java:20).
- Token values are clamped to a max length
  (engine/src/main/java/nl/inl/blacklab/index/annotated/AnnotationWriter.java:29-30).

Our normalization pipeline (must stay in lock-step with the DuckDB oracle
SQL in __ray_entry__.py: ``regexp_extract_all(lower(strip_accents(text)),
'[a-z0-9]+')``):

    normalize(text) = drop_combining_marks(NFD(lower(text)))
                      minus U+00AD/U+2003, Ł→L
    tokens = re.findall('[a-z0-9]+', normalize(text))

The Arrow path dictionary-encodes before normalizing so the Python
unicodedata call runs once per *unique* string, and token splitting uses
``pyarrow.compute`` kernels (no per-row Python in the hot path).
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = re.compile(r"[a-z0-9]+")
MAX_TOKEN_LEN = 1000  # parity with AnnotationWriter's clamp

# Fixed stopword list (used by quality scoring and hot-term salting
# defaults; the synthetic corpus puts these at the Zipf head).
STOPWORDS = (
    "the of and to a in is it you that he was for on are as with his they i "
    "at be this have from or one had by word"
).split()
STOPWORD_SET = frozenset(STOPWORDS)


_NONASCII_RE = re.compile(r"[^\x00-\x7f]+")


# StringUtil.stripAccents parity (StringUtil.java:30,85-105): NFD +
# drop combining marks, the soft hyphen U+00AD removed entirely
# (Lucene's tokenizer treats it as a format char, so 'foo\u00adbar'
# is ONE token in both systems), and the non-decomposable L-stroke
# mapped to L/l. TEXT-level vs TERM-level treatment of the em space
# U+2003 differs: pre-tokenization it must stay a SEPARATOR (mapped
# to ' ' — deleting it would merge adjacent words into one token,
# diverging from the reference tokenizer and the DuckDB oracle),
# while the reference's per-term desensitize
# (PATT_DIACRITICAL_MARKS, TestCollators) REMOVES it — see
# desensitize_term below.
_STRIP_MAP = {"\u0141": "L", "\u0142": "l", "\u2003": " "}


def _strip_segment(m: "re.Match[str]") -> str:
    out = []
    for ch in unicodedata.normalize("NFD", m.group()):
        if unicodedata.combining(ch) or ch == "\u00ad":
            continue
        out.append(_STRIP_MAP.get(ch, ch))
    return "".join(out)


def strip_accents(s: str) -> str:
    """NFD-decompose and drop combining marks; soft hyphen removed,
    em space kept as a separator, L-stroke folded.

    Only non-ASCII runs are processed (NFD is identity on ASCII and
    combining marks are never ASCII, so segment-wise normalization equals
    whole-string normalization) — ~10x faster on mostly-ASCII web text.
    """
    if s.isascii():
        return s
    return _NONASCII_RE.sub(_strip_segment, s)


def desensitize_term(s: str) -> str:
    """TERM-level insensitive fold — StringUtil.desensitize exactly
    (stripAccents + lowercase, with U+2003 REMOVED like U+00AD per
    PATT_DIACRITICAL_MARKS; TestCollators: em-space-wrapped 'test'
    desensitizes to 'test'). Used for collation keys; identical to
    ``normalize_text`` on anything the tokenizer can emit (tokens
    never contain separators)."""
    if "\u2003" in s:
        s = s.replace("\u2003", "")
    return normalize_text(s)


def normalize_text(s: str) -> str:
    """Insensitive-sensitivity normalization: lowercase + accent strip."""
    return strip_accents(s.lower())


def tokenize_text(s: str) -> list[str]:
    """Reference tokenizer for one string (tests / tiny fixtures)."""
    return [t[:MAX_TOKEN_LEN] for t in TOKEN_RE.findall(normalize_text(s))]


def _normalize_array(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized normalize over a string column.

    Fast path: ``pc.utf8_lower``; accent stripping runs in Python but only
    over the batch's *unique* values via dictionary encoding, and is skipped
    entirely for pure-ASCII batches.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lowered = pc.utf8_lower(col)
    # cheap ASCII check: if the binary length equals the codepoint length
    # for every row, there is nothing to strip.
    if pc.all(
        pc.equal(pc.binary_length(lowered), pc.utf8_length(lowered))
    ).as_py():
        return lowered
    dict_arr = pc.dictionary_encode(lowered)
    uniques = dict_arr.dictionary.to_pylist()
    fixed = pa.array([strip_accents(u) if u is not None else None
                      for u in uniques], type=pa.string())
    return pc.take(fixed, dict_arr.indices)


def tokenize_column_whitespace(col: pa.Array | pa.ChunkedArray) -> tuple[
        np.ndarray, pa.Array, np.ndarray, np.ndarray]:
    """Whitespace analyzer (BLWhitespaceAnalyzer.java:18): split on
    whitespace runs only — case, accents and punctuation preserved.
    Same return contract as tokenize_column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    token_lists = pc.split_pattern_regex(col, pattern=r"\s+")
    flat = pc.list_flatten(token_lists)
    parents = pc.list_parent_indices(token_lists).to_numpy(
        zero_copy_only=False)
    nonempty = pc.not_equal(flat, "")
    mask = nonempty.to_numpy(zero_copy_only=False)
    flat = flat.filter(nonempty)
    parents = parents[mask]
    n_rows = len(col)
    doc_lens = np.bincount(parents, minlength=n_rows).astype(np.int64)
    starts = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(doc_lens[:-1], out=starts[1:])
    positions = np.arange(parents.size, dtype=np.int64) - starts[parents]
    if len(flat) and pc.max(pc.utf8_length(flat)).as_py() > MAX_TOKEN_LEN:
        flat = pc.utf8_slice_codeunits(flat, 0, MAX_TOKEN_LEN)
    return parents, flat, positions, doc_lens


def tokenize_column_nontokenizing(col: pa.Array | pa.ChunkedArray
                                  ) -> tuple[np.ndarray, pa.Array,
                                             np.ndarray, np.ndarray]:
    """Non-tokenizing analyzer (BLNonTokenizingAnalyzer.java:11 — the
    UNTOKENIZED metadata field type): each value is ONE token, as-is
    (empty/null values yield zero tokens)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n_rows = len(col)
    valid = pc.and_(col.is_valid(), pc.not_equal(
        pc.fill_null(col, ""), "")).to_numpy(zero_copy_only=False)
    parents = np.flatnonzero(valid)
    flat = col.filter(pa.array(valid))
    if len(flat) and pc.max(pc.utf8_length(flat)).as_py() > MAX_TOKEN_LEN:
        flat = pc.utf8_slice_codeunits(flat, 0, MAX_TOKEN_LEN)
    doc_lens = valid.astype(np.int64)
    positions = np.zeros(parents.size, dtype=np.int64)
    return parents, flat, positions, doc_lens


# ---- Dutch analyzer family (BLDutchAnalyzer.java:19,
# BLDutchTokenizer.java:15, BLDutchTokenFilter.java:17) -------------------
#
# Tokenizer: a token char is any letter/digit PLUS the exception set
# ' - . ( ) [ ] (zo'n, ex-man, a.u.b., bel(len), [pre]cursor); all
# other chars split. Filter: periods/parens/brackets are removed
# inside tokens, ONE leading and trailing apostrophe strips, and
# tokens left without any letter/digit drop. The analyzer then
# desensitizes (lowercase + accent strip) for the @i route.

_DUTCH_SPLIT = r"[^\p{L}\p{N}'\-.()\[\]]+"
_DUTCH_REMOVE = r"[.()\[\]]|^'|'$"      # BLDutchTokenFilter.REMOVE_PATTERN
_DUTCH_KEEP = r"[\p{L}\p{N}]"           # ANY_LETTER_PATTERN


def tokenize_text_dutch(s: str) -> list[str]:
    """Scalar reference path for the Dutch analyzer (tests/oracles)."""
    out = []
    for t in re.split(r"[^\w'\-.()\[\]]+", s.replace("_", " ")):
        t = re.sub(r"[.()\[\]]|^'|'$", "", t)
        if re.search(r"[^\W_]", t):
            out.append(normalize_text(t)[:MAX_TOKEN_LEN])
    return out


def tokenize_column_dutch(col: pa.Array | pa.ChunkedArray) -> tuple[
        np.ndarray, pa.Array, np.ndarray, np.ndarray]:
    """Vectorized Dutch analyzer; same return contract as
    tokenize_column. Underscores are separators (\\w includes them in
    the scalar path; here they split like the reference's
    non-exception punctuation)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.replace_substring(col, "_", " ")
    token_lists = pc.split_pattern_regex(col, pattern=_DUTCH_SPLIT)
    flat = pc.list_flatten(token_lists)
    parents = pc.list_parent_indices(token_lists).to_numpy(
        zero_copy_only=False)
    # token filter: remove . ( ) [ ] and one leading/trailing '
    flat = pc.replace_substring_regex(flat, pattern=_DUTCH_REMOVE,
                                      replacement="")
    keep = pc.match_substring_regex(flat, _DUTCH_KEEP)
    mask = keep.to_numpy(zero_copy_only=False)
    flat = _normalize_array(flat.filter(keep))
    parents = parents[mask]
    n_rows = len(col)
    doc_lens = np.bincount(parents, minlength=n_rows).astype(np.int64)
    starts = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(doc_lens[:-1], out=starts[1:])
    positions = np.arange(parents.size, dtype=np.int64) - starts[parents]
    if len(flat) and pc.max(pc.utf8_length(flat)).as_py() > MAX_TOKEN_LEN:
        flat = pc.utf8_slice_codeunits(flat, 0, MAX_TOKEN_LEN)
    return parents, flat, positions, doc_lens


# Analyzer registry (BLStandardAnalyzer / BLWhitespaceAnalyzer /
# BLNonTokenizingAnalyzer / BLDutchAnalyzer family + the per-language
# slot, SURVEY §2.3). Each entry is a tokenize_column-contract
# callable. Oracle SQL parity holds for "standard" (the indexing
# default); the variants serve metadata fields and custom formats.
ANALYZERS = {
    "standard": None,   # filled below (tokenize_column defined later)
    "whitespace": tokenize_column_whitespace,
    "nontokenizing": tokenize_column_nontokenizing,
    "dutch": tokenize_column_dutch,
}


def register_analyzer(name: str, fn) -> None:
    """User-extension slot: a tokenize_column-contract callable."""
    ANALYZERS[name] = fn


def get_analyzer(name: str):
    if name not in ANALYZERS:
        raise ValueError(
            f"unknown analyzer {name!r}; registered: "
            f"{sorted(ANALYZERS)}")
    return ANALYZERS[name]


def tokenize_text_sensitive(s: str) -> list[str]:
    """Case-SENSITIVE tokenizer (the `@s` sensitivity,
    MatchSensitivity.java:12-17): accent-stripped but case-preserving,
    split on the case-insensitive class so token boundaries — and hence
    positions — align with the insensitive annotation (a char is in
    [A-Za-z0-9] iff its lowercase is in [a-z0-9])."""
    return [t[:MAX_TOKEN_LEN]
            for t in re.findall(r"[A-Za-z0-9]+", strip_accents(s))]


def tokenize_column_sensitive(col: pa.Array | pa.ChunkedArray) -> tuple[
        np.ndarray, pa.Array, np.ndarray, np.ndarray]:
    """Vectorized sensitive-variant tokenizer; same return contract as
    tokenize_column. Positions align 1:1 with the insensitive stream."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # accent-strip without lowering (Python only over unique values)
    if pc.all(pc.equal(pc.binary_length(col),
                       pc.utf8_length(col))).as_py():
        norm = col
    else:
        dict_arr = pc.dictionary_encode(col)
        uniques = dict_arr.dictionary.to_pylist()
        fixed = pa.array([strip_accents(u) if u is not None else None
                          for u in uniques], type=pa.string())
        norm = pc.take(fixed, dict_arr.indices)
    token_lists = pc.split_pattern_regex(norm, pattern="[^A-Za-z0-9]+")
    flat = pc.list_flatten(token_lists)
    parents = pc.list_parent_indices(token_lists).to_numpy(
        zero_copy_only=False)
    nonempty = pc.not_equal(flat, "")
    mask = nonempty.to_numpy(zero_copy_only=False)
    flat = flat.filter(nonempty)
    parents = parents[mask]
    n_rows = len(norm)
    doc_lens = np.bincount(parents, minlength=n_rows).astype(np.int64)
    starts = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(doc_lens[:-1], out=starts[1:])
    positions = np.arange(parents.size, dtype=np.int64) - starts[parents]
    if len(flat) and pc.max(pc.utf8_length(flat)).as_py() > MAX_TOKEN_LEN:
        flat = pc.utf8_slice_codeunits(flat, 0, MAX_TOKEN_LEN)
    return parents, flat, positions, doc_lens


def tokenize_column(col: pa.Array | pa.ChunkedArray) -> tuple[
        np.ndarray, pa.Array, np.ndarray, np.ndarray]:
    """Tokenize a string column into flat (row_idx, token, position) arrays.

    Returns ``(row_indices, tokens, positions, doc_lens)`` where the first
    three are parallel flat arrays over all tokens of the batch and
    ``doc_lens[i]`` is the token count of row ``i``. Fully vectorized:
    split via ``pc.split_pattern_regex`` then flatten; empty tokens from
    leading/trailing separators are masked out before positions are
    assigned, matching ``re.findall`` semantics.
    """
    norm = _normalize_array(col)
    token_lists = pc.split_pattern_regex(norm, pattern="[^a-z0-9]+")
    flat = pc.list_flatten(token_lists)
    parents = pc.list_parent_indices(token_lists).to_numpy(
        zero_copy_only=False)
    nonempty = pc.not_equal(flat, "")
    mask = nonempty.to_numpy(zero_copy_only=False)
    flat = flat.filter(nonempty)
    parents = parents[mask]
    n_rows = len(norm)
    doc_lens = np.bincount(parents, minlength=n_rows).astype(np.int64)
    # positions: 0..len-1 within each row (parents are nondecreasing)
    starts = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(doc_lens[:-1], out=starts[1:])
    positions = np.arange(parents.size, dtype=np.int64) - starts[parents]
    # clamp pathological token lengths (parity with the reference clamp)
    if len(flat) and pc.max(pc.utf8_length(flat)).as_py() > MAX_TOKEN_LEN:
        flat = pc.utf8_slice_codeunits(flat, 0, MAX_TOKEN_LEN)
    return parents, flat, positions, doc_lens


ANALYZERS["standard"] = tokenize_column
