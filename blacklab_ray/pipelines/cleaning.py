"""Corpus-cleaning operators: PII scrubbing, benchmark decontamination,
paragraph-level dedup.

The cleaning stages a web-scale training-data pipeline runs between
crawling and tokenization. No reference analogue (BlackLab stops at
indexing); the shapes follow the published pipeline literature
(CCNet / Gopher / RefinedWeb-style cleaning):

- ``pii_scrub``: single-pass vectorized RE2 redaction — embarrassingly
  parallel, nothing shuffles.
- ``decontaminate``: the benchmark side is SMALL by construction (an
  eval set, thousands of docs), so it is collected once, ``ray.put``
  once, and read once per actor — a broadcast semi-join, never a
  corpus-wide shuffle.
- ``paragraph_dup_stats``: explode → count → co-partitioned join-back.
  Both shuffles are keyed by a content hash (uniform), and the
  join-back uses ONE vectorized UDF call per hash partition — the same
  proven shape as ``dedup.verify_jaccard_pairs`` (a Python call per
  group is the per-group pattern that dies at scale, and Ray 2.49's
  ``Dataset.join`` chokes on schema-less empty aggregate blocks).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from blacklab_ray.analysis.analyzers import tokenize_column

# RE2 patterns shared VERBATIM with the DuckDB oracles (both engines
# are RE2, so count/replace semantics match bit-for-bit).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE_RE = r"\+\d[\d\- ]{5,}\d"

# replacement order matters: emails first (their digits must not feed
# the phone pattern), then IPs (dots exclude them from the phone
# class), then phones.
_PII_RULES = (
    (PII_EMAIL_RE, "<EMAIL>", "n_emails"),
    (PII_IP_RE, "<IP>", "n_ips"),
    (PII_PHONE_RE, "<PHONE>", "n_phones"),
)


def pii_scrub(ds: ray.data.Dataset, text_col: str = "text",
              id_col: str = "doc_id",
              keep_text: bool = False,
              keep_cols: tuple = ()) -> ray.data.Dataset:
    """Redact emails / IPv4 addresses / phone numbers.

    Per doc: match counts per category plus the md5 of the scrubbed
    text (the compact equality witness — drivers hash cell values, and
    the full scrubbed body would dominate the result). Pass
    ``keep_text=True`` to keep the scrubbed body itself (the
    production shape: write it back out).

    Single ``map_batches`` pass, all counting/replacing in Arrow RE2
    kernels; only the md5 digests are scalar (md5 IS the identity
    spec, as in ``dedup.ContentHash``).
    """

    def _scrub(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")
        cols: dict[str, pa.Array] = {
            id_col: batch.column(id_col).cast(pa.int64()),
        }
        # counts run SEQUENTIALLY on the progressively scrubbed text so
        # they equal the redactions actually applied (an email whose
        # digits also look phone-shaped counts once, as <EMAIL>)
        scrubbed = text
        for pattern, token, count_name in _PII_RULES:
            cols[count_name] = pc.count_substring_regex(
                scrubbed, pattern=pattern).cast(pa.int64())
            scrubbed = pc.replace_substring_regex(
                scrubbed, pattern=pattern, replacement=token)
        cols["scrubbed_md5"] = pa.array(
            [hashlib.md5(t.encode()).hexdigest()
             for t in scrubbed.to_pylist()], pa.string())
        if keep_text:
            cols["scrubbed_text"] = scrubbed
        for c in keep_cols:  # pass-through metadata (e.g. lang_pred)
            cols[c] = batch.column(c)
        return pa.table(cols)

    return ds.map_batches(_scrub, batch_format="pyarrow")


def _nfc_array(col: pa.Array) -> pa.Array:
    """NFC-normalize a string array. pyarrow's ``utf8_normalize``
    returns DECOMPOSED output for every form in this build (utf8proc
    option bug — verified: form="NFC" turns U+00E9 into e + U+0301),
    so composition runs through ``unicodedata`` instead — but only
    when the batch contains non-ASCII bytes (``binary_length !=
    utf8_length``); pure-ASCII web text never leaves Arrow."""
    import unicodedata
    non_ascii = pc.fill_null(
        pc.not_equal(pc.binary_length(col), pc.utf8_length(col)), False)
    if not pc.any(non_ascii).as_py():
        return col
    # only the non-ASCII rows leave Arrow (a whole-column to_pylist
    # here made every mixed batch pay a full Python round-trip); the
    # fixed strings scatter back through one if_else kernel
    idx = np.flatnonzero(non_ascii.to_numpy(zero_copy_only=False))
    sub = col.take(pa.array(idx)).to_pylist()
    fixed = [v if unicodedata.is_normalized("NFC", v)
             else unicodedata.normalize("NFC", v) for v in sub]
    repl = [None] * len(col)
    for i, v in zip(idx, fixed):
        repl[int(i)] = v
    return pc.if_else(non_ascii, pa.array(repl, pa.string()), col)


# normalize_text's rule chain, applied in order. Each entry is
# (RE2 pattern, replacement); shared verbatim with the DuckDB oracle
# (both engines are RE2). Order matters: horizontal collapse first so
# the newline-trim pattern only ever sees single spaces.
NORM_RULES = (
    # C0/C1 control chars except \t \n \r (mojibake / binary bleed)
    (r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", ""),
    # runs of spaces/tabs -> one space
    (r"[ \t]+", " "),
    # spaces hugging a newline
    (r" *\n *", "\n"),
    # 3+ blank-line runs -> one blank line (paragraph-preserving)
    (r"\n{3,}", "\n\n"),
    # leading/trailing whitespace
    (r"^\s+|\s+$", ""),
)


def normalize_column(col: pa.Array) -> pa.Array:
    """The normalize_text rule chain over a bare (null-free) string
    array — shared with :func:`curate.curate`'s in-place stage."""
    out = _nfc_array(col)
    for pattern, repl in NORM_RULES:
        out = pc.replace_substring_regex(
            out, pattern=pattern, replacement=repl)
    return out


def normalize_text(ds: ray.data.Dataset, text_col: str = "text",
                   id_col: str = "doc_id",
                   keep_text: bool = False) -> ray.data.Dataset:
    """Unicode + whitespace normalization (the CCNet/ftfy-style step a
    web pipeline runs before tokenization): NFC-normalize, strip
    control characters, collapse whitespace runs while PRESERVING
    paragraph breaks, and trim.

    Per doc: char counts before/after, a changed flag, and the md5 of
    the normalized text (compact equality witness, as in
    :func:`pii_scrub`); ``keep_text=True`` keeps the body.

    Single ``map_batches`` pass: NFC via :func:`_nfc_array` (matches
    DuckDB's ``nfc_normalize``; Python only touches non-ASCII rows)
    plus one RE2 ``replace_substring_regex`` per rule — nothing
    shuffles.
    """

    def _norm(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")
        out = normalize_column(text)
        cols = {
            id_col: batch.column(id_col).cast(pa.int64()),
            "n_chars_before": pc.utf8_length(text).cast(pa.int64()),
            "n_chars_after": pc.utf8_length(out).cast(pa.int64()),
            "changed": pc.not_equal(out, text),
            "norm_md5": pa.array(
                [hashlib.md5(t.encode()).hexdigest()
                 for t in out.to_pylist()], pa.string()),
        }
        if keep_text:
            cols["norm_text"] = out
        return pa.table(cols)

    return ds.map_batches(_norm, batch_format="pyarrow")


def _ngram_strings(col: pa.Array | pa.ChunkedArray, n: int
                   ) -> tuple[np.ndarray, pa.Array]:
    """(doc_row_index, gram_string) for every token n-gram, vectorized:
    tokenize once, join n shifted views of the flat token array, mask
    grams that straddle a document boundary."""
    parents, flat, _, _ = tokenize_column(col)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    total = len(flat)
    if total < n:
        return (np.empty(0, dtype=np.int64),
                pa.array([], pa.string()))
    width = total - n + 1
    views = [flat.slice(i, width) for i in range(n)]
    grams = pc.binary_join_element_wise(*views, " ")
    same_doc = parents[:width] == parents[n - 1:]
    return parents[:width][same_doc], grams.filter(pa.array(same_doc))


class _BenchmarkGramHits:
    """map_batches actor: count n-gram occurrences hitting the
    broadcast benchmark gram set. The set is ``ray.get`` once per
    actor (``__init__``), never re-shipped per batch."""

    def __init__(self, gram_ref, n: int, text_col: str, id_col: str):
        self._grams: pa.Array = ray.get(gram_ref)
        self._n = n
        self._text = text_col
        self._id = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self._id).cast(pa.int64())
        gparents, grams = _ngram_strings(batch.column(self._text),
                                         self._n)
        hits = np.zeros(batch.num_rows, dtype=np.int64)
        if len(grams) and len(self._grams):
            mask = pc.is_in(grams, value_set=self._grams) \
                .to_numpy(zero_copy_only=False)
            np.add.at(hits, gparents[mask], 1)
        return pa.table({
            self._id: ids,
            "n_gram_hits": pa.array(hits, pa.int64()),
            "contaminated": pa.array(hits > 0),
        })


def benchmark_grams(benchmark_ds: ray.data.Dataset, n: int = 3,
                    text_col: str = "text") -> pa.Array:
    """Distinct n-gram strings of the benchmark set, as one Arrow
    array on the driver. The benchmark side of decontamination is
    small by definition (an eval set); per-batch dedup happens in the
    tasks, only distinct grams come back."""

    def _grams(batch: pa.Table) -> pa.Table:
        _, grams = _ngram_strings(batch.column(text_col), n)
        return pa.table({"gram": grams.unique()})

    parts = [b["gram"] for b in benchmark_ds
             .map_batches(_grams, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow") if b.num_rows]
    if not parts:
        return pa.array([], pa.string())
    return pa.concat_arrays(
        [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
         for p in parts]).unique()


def decontaminate(corpus_ds: ray.data.Dataset,
                  benchmark_ds: ray.data.Dataset, n: int = 3,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> ray.data.Dataset:
    """Benchmark decontamination: per corpus doc, how many of its
    token n-gram occurrences appear verbatim in the benchmark set
    (the train/test-overlap check every published pipeline runs
    before training).

    Broadcast semi-join: benchmark grams are gathered once and
    ``ray.put`` once; each corpus batch probes them with one
    vectorized ``is_in``. No corpus-side shuffle at all.
    """
    gram_ref = ray.put(benchmark_grams(benchmark_ds, n, text_col))
    return corpus_ds.map_batches(
        _BenchmarkGramHits, batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_args=(gram_ref, n, text_col, id_col))


# ---- paragraph-level dedup --------------------------------------------------


def explode_paragraphs(ds: ray.data.Dataset, text_col: str = "text",
                       id_col: str = "doc_id",
                       sep: str = "\n\n") -> ray.data.Dataset:
    """(doc_id, para_md5, part) per non-empty trimmed paragraph.

    Paragraph identity travels as md5 (16 bytes hex) — the paragraph
    body itself never shuffles. ``part`` is derived from the md5 so
    the count and join-back stages are co-partitioned for free.
    """

    def _split(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.int64())
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        paras = pc.split_pattern(pc.fill_null(text, ""), pattern=sep)
        flat = pc.list_flatten(paras)
        parents = pc.list_parent_indices(paras) \
            .to_numpy(zero_copy_only=False)
        flat = pc.utf8_trim(flat, " ")
        nonempty = pc.not_equal(flat, "")
        mask = nonempty.to_numpy(zero_copy_only=False)
        flat = flat.filter(nonempty)
        parents = parents[mask]
        md5s, parts = [], []
        for t in flat.to_pylist():
            h = hashlib.md5(t.encode()).hexdigest()
            md5s.append(h)
            parts.append(int(h[:8], 16))
        return pa.table({
            id_col: ids.take(pa.array(parents)),
            "para_md5": pa.array(md5s, pa.string()),
            "part": pa.array(parts, pa.int64()),
        })

    return ds.map_batches(_split, batch_format="pyarrow")


def paragraph_dup_stats(ds: ray.data.Dataset, text_col: str = "text",
                        id_col: str = "doc_id", sep: str = "\n\n",
                        num_partitions: int = 32) -> ray.data.Dataset:
    """Per doc: total paragraphs and how many of them are duplicates
    (their exact trimmed text occurs >1 time across the whole corpus,
    counting every occurrence).

    Shape: explode → ``groupby(para hash).count`` (uniform content-hash
    key) → ONE co-partitioned union ``map_groups`` to attach counts
    back to occurrences (vectorized searchsorted inside the partition,
    P Python calls total) → per-doc ``Sum`` rollup.
    """
    P = num_partitions
    raw = explode_paragraphs(ds, text_col, id_col, sep)

    def _occ_part(batch: pa.Table) -> pa.Table:
        part = batch.column("part").to_numpy(zero_copy_only=False) % P
        return pa.table({
            "part": pa.array(part, pa.int64()),
            "para_md5": batch.column("para_md5"),
            id_col: batch.column(id_col).cast(pa.int64()),
            # -1 tags an OCCURRENCE row in the union (count rows carry
            # the real count; synthetic ids here are non-negative)
            "n": pa.array(np.full(batch.num_rows, -1, np.int64)),
        })

    # consumed twice (count + union): materialize the hash stream once
    occ = raw.map_batches(_occ_part, batch_format="pyarrow").materialize()

    counts = occ.groupby("para_md5").aggregate(Count(alias_name="cnt"))

    def _count_rows(batch: pa.Table) -> pa.Table:
        md5 = batch.column("para_md5")
        if isinstance(md5, pa.ChunkedArray):
            md5 = md5.combine_chunks()
        part = np.array([int(h[:8], 16) for h in md5.to_pylist()],
                        dtype=np.int64) % P
        return pa.table({
            "part": pa.array(part, pa.int64()),
            "para_md5": md5,
            id_col: pa.array(np.full(len(md5), -1, np.int64)),
            "n": batch.column("cnt").cast(pa.int64()),
        })

    count_rows = counts.map_batches(_count_rows, batch_format="pyarrow")

    OUT_SCHEMA = pa.schema([(id_col, pa.int64()),
                            ("n_paragraphs", pa.int64()),
                            ("n_dup_paragraphs", pa.int64())])

    def _attach(group: pa.Table) -> pa.Table:
        # guard the schema-less empty blocks Ray 2.49 aggregates emit
        if group.num_rows == 0 or "n" not in group.column_names:
            return OUT_SCHEMA.empty_table()
        # count rows carry n >= 1; occurrence rows are tagged n == -1
        is_count = (group.column("n").to_numpy(zero_copy_only=False) >= 0)
        md5 = group.column("para_md5").to_numpy(zero_copy_only=False)
        cnt_md5 = md5[is_count]
        cnt_n = group.column("n").to_numpy(
            zero_copy_only=False)[is_count]
        order = np.argsort(cnt_md5)
        cnt_md5, cnt_n = cnt_md5[order], cnt_n[order]
        occ_md5 = md5[~is_count]
        occ_doc = group.column(id_col).to_numpy(
            zero_copy_only=False)[~is_count]
        if not occ_md5.size:
            return OUT_SCHEMA.empty_table()
        idx = np.searchsorted(cnt_md5, occ_md5)
        n_occ = cnt_n[idx]  # every occurrence's para has a count row
        docs, inv = np.unique(occ_doc, return_inverse=True)
        n_paras = np.bincount(inv, minlength=docs.size)
        n_dups = np.bincount(inv, weights=(n_occ > 1).astype(np.int64),
                             minlength=docs.size).astype(np.int64)
        return pa.table({
            id_col: pa.array(docs, pa.int64()),
            "n_paragraphs": pa.array(n_paras, pa.int64()),
            "n_dup_paragraphs": pa.array(n_dups, pa.int64()),
        })

    partials = occ.union(count_rows).groupby("part").map_groups(
        _attach, batch_format="pyarrow")
    return partials.groupby(id_col).aggregate(
        Sum("n_paragraphs", alias_name="n_paragraphs"),
        Sum("n_dup_paragraphs", alias_name="n_dup_paragraphs"))


# ---- Bloom-filter scale path for decontamination ----------------------------


class BloomFilter:
    """Fixed-size vectorized Bloom filter over uint64 keys — the
    broadcast-side representation when the benchmark gram set is too
    big to ship exactly (the string set grows with the benchmark; the
    filter is a constant ``m_bits/8`` bytes at a chosen FP rate).

    k hash probes are derived from one 64-bit key by
    double hashing: h_i = h1 + i*h2 (Kirsch-Mitzenmacher), all numpy.
    """

    def __init__(self, m_bits: int, k: int = 7):
        # power-of-two bit count -> mask instead of modulo
        m = 1
        while m < m_bits:
            m <<= 1
        self._mask = np.uint64(m - 1)
        self._k = k
        self._bits = np.zeros(m // 64 + 1, dtype=np.uint64)

    @staticmethod
    def for_capacity(n: int, fp_rate: float = 0.01) -> "BloomFilter":
        """Size for ``n`` keys at ``fp_rate`` (standard m/n formula)."""
        import math
        n = max(n, 1)
        # floor at 4 KiB: below that the filter saturates on even tiny
        # key sets and the FP guarantee is meaningless
        m = max(int(-n * math.log(fp_rate) / (math.log(2) ** 2)) + 1,
                32 * 1024)
        k = max(1, min(16, round(m / n * math.log(2))))
        return BloomFilter(m, k)

    @staticmethod
    def _h2(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h1 = keys * np.uint64(0x9E3779B97F4A7C15)
        h1 ^= h1 >> np.uint64(29)
        h2 = keys * np.uint64(0xC2B2AE3D27D4EB4F)
        h2 ^= h2 >> np.uint64(31)
        return h1, h2 | np.uint64(1)

    def add(self, keys: np.ndarray) -> None:
        keys = keys.astype(np.uint64, copy=False)
        h1, h2 = self._h2(keys)
        for i in range(self._k):
            pos = (h1 + np.uint64(i) * h2) & self._mask
            np.bitwise_or.at(self._bits, pos >> np.uint64(6),
                             np.uint64(1) << (pos & np.uint64(63)))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = keys.astype(np.uint64, copy=False)
        h1, h2 = self._h2(keys)
        out = np.ones(keys.size, dtype=bool)
        for i in range(self._k):
            pos = (h1 + np.uint64(i) * h2) & self._mask
            bit = (self._bits[pos >> np.uint64(6)]
                   >> (pos & np.uint64(63))) & np.uint64(1)
            out &= bit.astype(bool)
        return out

    @property
    def nbytes(self) -> int:
        return int(self._bits.nbytes)


def _gram_hashes(grams: pa.Array) -> np.ndarray:
    """uint64 content hashes of gram strings (md5 low 64 — the house
    content-identity digest). Dictionary-encodes first so the scalar
    md5 loop runs once per DISTINCT gram, not per occurrence."""
    if isinstance(grams, pa.ChunkedArray):
        grams = grams.combine_chunks()
    from blacklab_ray.util import md5_high64be_batch
    d = pc.dictionary_encode(grams)
    uniq = md5_high64be_batch(d.dictionary)
    if not uniq.size:
        return np.empty(0, dtype=np.uint64)
    return uniq[d.indices.to_numpy(zero_copy_only=False)]


class _BenchmarkGramHitsBloom:
    """map_batches actor: Bloom-filter membership probe — constant-size
    broadcast regardless of benchmark gram count. FP rate makes
    ``n_gram_hits`` a slight OVERcount; ``contaminated`` errs toward
    flagging (the safe direction for decontamination)."""

    def __init__(self, bloom_ref, n: int, text_col: str, id_col: str):
        self._bloom: BloomFilter = ray.get(bloom_ref)
        self._n = n
        self._text = text_col
        self._id = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self._id).cast(pa.int64())
        gparents, grams = _ngram_strings(batch.column(self._text),
                                         self._n)
        hits = np.zeros(batch.num_rows, dtype=np.int64)
        if len(grams):
            mask = self._bloom.contains(_gram_hashes(grams))
            np.add.at(hits, gparents[mask], 1)
        return pa.table({
            self._id: ids,
            "n_gram_hits": pa.array(hits, pa.int64()),
            "contaminated": pa.array(hits > 0),
        })


def decontaminate_bloom(corpus_ds: ray.data.Dataset,
                        benchmark_ds: ray.data.Dataset, n: int = 3,
                        fp_rate: float = 0.01,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> ray.data.Dataset:
    """Scale path of :func:`decontaminate`: the benchmark grams feed a
    fixed-size Bloom filter (``-n ln p / ln²2`` bits ≈ 1.2 GB per 10⁹
    grams at 1% FP) instead of an exact string set, so the broadcast
    stays bounded no matter how large the eval suite grows. Flags are
    conservative (no false negatives; FP-rate false positives)."""
    grams = benchmark_grams(benchmark_ds, n, text_col)
    bloom = BloomFilter.for_capacity(len(grams), fp_rate)
    if len(grams):
        bloom.add(_gram_hashes(grams))
    bloom_ref = ray.put(bloom)
    return corpus_ds.map_batches(
        _BenchmarkGramHitsBloom, batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_args=(bloom_ref, n, text_col, id_col))


# ---- C4 cleaning rules (Raffel et al. 2020) ---------------------------------

# phrases whose presence removes a LINE (C4 §2.2: "terms of use",
# "privacy policy", "cookie policy", "uses cookies", "javascript")
C4_LINE_PHRASES = ("javascript", "terms of use", "privacy policy",
                   "cookie policy", "uses cookies")
# a line is kept only if its trimmed text ends in terminal punctuation
C4_TERMINAL_RE = r'[.!?"]$'
C4_MIN_WORDS = 5
C4_MIN_SENTENCES = 3


def c4_rules(ds: ray.data.Dataset, text_col: str = "text",
             id_col: str = "doc_id",
             keep_text: bool = False,
             keep_cols: tuple = ()) -> ray.data.Dataset:
    """C4-style page cleaning (Raffel et al. 2020, §2.2 heuristics).

    Line level (a line = ``\\n``-separated, space-trimmed):
      - keep only lines ending in terminal punctuation (``. ! ? "``),
      - with at least :data:`C4_MIN_WORDS` whitespace words,
      - not containing (case-insensitive) any :data:`C4_LINE_PHRASES`.
    Page level, over the KEPT text:
      - drop pages containing ``lorem ipsum`` (case-insensitive) or a
        curly brace ``{`` anywhere in the ORIGINAL text,
      - drop pages with fewer than :data:`C4_MIN_SENTENCES` sentences
        (sentence count = ``[.!?]`` occurrences in the kept text — a
        documented simplification of C4's sentence splitter).

    The paper's "bad words" list and langdetect gates are separate
    operators here (``quality_filter`` / ``lang_id``); span-level
    dedup is :func:`dedup.duplicate_spans`.

    Returns per doc: line counts, sentence count, the page-level
    ``kept`` verdict and the md5 of the cleaned text (compact equality
    witness, as in :func:`pii_scrub`); ``keep_text=True`` adds the
    cleaned body itself. One vectorized ``map_batches`` pass — line
    splitting, trimming, word counts, phrase tests and the per-doc
    re-join all run as Arrow RE2 / list kernels; only the md5 digests
    are per-doc Python. Embarrassingly parallel: nothing shuffles.
    """

    def _clean(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.int64())
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")
        n_docs = len(text)

        lines = pc.split_pattern(text, pattern="\n")
        flat = pc.utf8_trim(pc.list_flatten(lines), " ")
        parents = pc.list_parent_indices(lines) \
            .to_numpy(zero_copy_only=False)

        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        keep = np.array(
            pc.match_substring_regex(flat, C4_TERMINAL_RE)
            .to_numpy(zero_copy_only=False))
        keep &= (pc.count_substring_regex(flat, r"\S+")
                 .to_numpy(zero_copy_only=False) >= C4_MIN_WORDS)
        low = pc.utf8_lower(flat)
        for phrase in C4_LINE_PHRASES:
            keep &= ~pc.match_substring(low, phrase) \
                .to_numpy(zero_copy_only=False)
        keep &= nonempty

        n_lines = np.bincount(parents[nonempty], minlength=n_docs)
        n_kept = np.bincount(parents[keep], minlength=n_docs)

        # rebuild a list<string> of kept lines per doc (offsets from the
        # kept-per-doc counts; order is preserved) and join with \n
        kept_flat = flat.filter(pa.array(keep))
        offsets = np.zeros(n_docs + 1, dtype=np.int32)
        np.cumsum(n_kept, out=offsets[1:])
        kept_lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), kept_flat)
        clean = pc.binary_join(kept_lists, "\n")

        n_sent = pc.count_substring_regex(clean, r"[.!?]") \
            .to_numpy(zero_copy_only=False)
        low_text = pc.utf8_lower(text)
        page_ok = ~pc.match_substring(low_text, "lorem ipsum") \
            .to_numpy(zero_copy_only=False)
        page_ok &= ~pc.match_substring(text, "{") \
            .to_numpy(zero_copy_only=False)
        page_ok &= n_sent >= C4_MIN_SENTENCES

        md5s = [hashlib.md5(t.encode()).hexdigest()
                for t in clean.to_pylist()]
        cols = {
            id_col: ids,
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_kept_lines": pa.array(n_kept, pa.int64()),
            "n_sentences": pa.array(n_sent.astype(np.int64), pa.int64()),
            "kept": pa.array(page_ok),
            "clean_md5": pa.array(md5s, pa.string()),
        }
        if keep_text:
            cols["clean_text"] = clean
        for c in keep_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return ds.map_batches(_clean, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# URL / domain curation (crawl front end)
# ---------------------------------------------------------------------------

def extract_host_expr(col: pa.Array | pa.ChunkedArray):
    """Vectorized host extraction: drop fragment/query/scheme, take up
    to the first '/', lowercase, strip a leading 'www.' — THE
    ``dedup.split_host_path_expr`` host step (one shared kernel chain,
    not a copy), so the SQL twin is
    ``regexp_replace(lower(regexp_replace(u,'/.*$','')),'^www\\.','')``
    after the same fragment/query/scheme strips."""
    from blacklab_ray.pipelines.dedup import split_host_path_expr
    return split_host_path_expr(col)[0]


def url_filter(ds: ray.data.Dataset,
               blocked_hosts: tuple[str, ...] = (),
               blocked_patterns: tuple[str, ...] = (),
               url_col: str = "url") -> ray.data.Dataset:
    """Drop rows whose url's host is blocklisted or whose url matches
    a blocked RE2 pattern — the UT1/C4-style crawl blocklist step.

    The host list ships ONCE per actor via ``ray.put`` (real
    blocklists are 10^6 domains — never per batch); patterns compile
    into one alternation evaluated by an Arrow RE2 kernel per batch."""
    hosts_ref = ray.put(pa.array(sorted({h.lower().removeprefix("www.")
                                         for h in blocked_hosts}),
                                 pa.string()))
    alternation = "|".join(f"(?:{p})" for p in blocked_patterns)

    class _Filter:
        def __init__(self):
            self._hosts = ray.get(hosts_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            keep = np.ones(batch.num_rows, bool)
            urls = batch.column(url_col)
            if len(self._hosts):
                host = extract_host_expr(urls)
                # fill_null(False): a null url is not blocklisted
                keep &= np.logical_not(
                    pc.fill_null(pc.is_in(host, value_set=self._hosts),
                                 False).to_numpy(zero_copy_only=False))
            if alternation:
                keep &= np.logical_not(
                    pc.fill_null(
                        pc.match_substring_regex(urls, alternation),
                        False).to_numpy(zero_copy_only=False))
            return batch.filter(pa.array(keep))

    return ds.map_batches(_Filter, batch_format="pyarrow",
                          concurrency=(1, 8))


def host_stats(ds: ray.data.Dataset, url_col: str = "url",
               chars_col: str | None = None) -> ray.data.Dataset:
    """Per-host corpus profile (host, n_docs, total_chars) — the
    CCNet/C4-style domain accounting a crawl pipeline uses to spot
    over-represented or junk hosts before curation.

    Scale shape: per-batch vectorized fold to one row per DISTINCT
    host of the batch (the combiner), then one groupby-sum over the
    host-table-sized partials — no url ever shuffles."""

    def _partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"host": pa.array([], pa.string()),
                          "n_docs": pa.array([], pa.int64()),
                          "total_chars": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        # null urls fold into an '' host bucket rather than poisoning
        # the object-array sort with None
        host = pc.fill_null(
            extract_host_expr(batch.column(url_col)), "")
        chars = (pc.fill_null(batch.column(chars_col), 0)
                 .cast(pa.int64()).to_numpy(zero_copy_only=False)
                 if chars_col else np.zeros(batch.num_rows, np.int64))
        h = np.asarray(host.to_pylist(), dtype=object)
        order = np.argsort(h, kind="stable")
        h, chars = h[order], chars[order]
        heads = np.ones(h.size, bool)
        heads[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(heads)
        ends = np.append(starts[1:], h.size)
        return pa.table({
            "host": pa.array(h[starts], pa.string()),
            "n_docs": pa.array(ends - starts, pa.int64()),
            "total_chars": pa.array(
                np.add.reduceat(chars, starts) if h.size
                else np.empty(0, np.int64), pa.int64()),
        })

    return (ds.select_columns([url_col] + ([chars_col] if chars_col
                                           else []))
            .map_batches(_partial, batch_format="pyarrow")
            .groupby("host")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("total_chars", alias_name="total_chars")))
