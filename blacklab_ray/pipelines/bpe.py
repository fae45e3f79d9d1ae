"""BPE tokenizer training and encoding over the corpus.

Training-data operator family (beyond the reference): learn a
byte-pair-encoding subword vocabulary from the corpus and encode
documents with it (Sennrich et al. 2016; the GPT-2/HuggingFace
trainer shape).

Scale design (100 TB): BPE training needs only the WORD-FREQUENCY
table, never the corpus — so the distributed stage is ONE part-hash
word count (the repo's proven shape: per-batch ``value_counts``
partials, ``hash64(term) % P`` partition key, one vectorized Arrow
``group_by`` per partition), and the merge loop runs on the driver
over word TYPES with incremental pair-count updates — exactly how
real trainers work (HF ``tokenizers`` counts words in parallel, then
merges over the type table in memory; the type table is ~1e6 rows
where the corpus is 1e12). Encoding is an actor-pool ``map_batches``
stage that encodes each batch's UNIQUE words once through an
LRU-style per-actor cache (tokenizers' word cache), then fans results
back out with dictionary indices.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from blacklab_ray.analysis.analyzers import tokenize_column
from blacklab_ray.stages.tokenize import hash64

_WC_PARTS = 64
EOW = "</w>"     # end-of-word marker symbol (Sennrich-style)


def word_counts(ds: ray.data.Dataset, text_col: str = "text",
                parts: int = _WC_PARTS) -> pa.Table:
    """Exact (term, n) word-frequency table, driver-materialized
    (type-table-sized — the input to BPE training)."""

    def _partial(batch: pa.Table) -> pa.Table:
        _, toks, _, _ = tokenize_column(batch.column(text_col))
        vc = pc.value_counts(toks)
        terms = vc.field(0)
        # value_counts terms are already distinct — hash them directly
        from blacklab_ray.util import hash64_batch
        part = (hash64_batch(terms) % parts).astype(np.int64)
        return pa.table({"term": terms,
                         "n": vc.field(1).cast(pa.int64()),
                         "part": pa.array(part, pa.int64())})

    def _combine(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.schema([("term", pa.string()),
                              ("n", pa.int64())]).empty_table()
        agg = g.select(["term", "n"]).group_by("term") \
            .aggregate([("n", "sum")])
        return pa.table({"term": agg["term"],
                         "n": agg["n_sum"].cast(pa.int64())})

    out = ds.map_batches(_partial, batch_format="pyarrow") \
        .groupby("part").map_groups(_combine, batch_format="pyarrow")
    tbls = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tbls).combine_chunks() if tbls else \
        pa.schema([("term", pa.string()),
                   ("n", pa.int64())]).empty_table()


def train_bpe(counts: pa.Table, num_merges: int) -> list[tuple[str, str]]:
    """The classic BPE merge loop over the word-type table.

    Each word is a symbol sequence (chars + ``EOW``); repeatedly merge
    the most frequent adjacent pair, counts weighted by word
    frequency. Deterministic: ties break on the lexicographically
    smallest pair (HF breaks on insertion order — an arbitrary choice;
    ours is reproducible across partitionings by construction).
    Incremental maintenance: a pair → word-id index so each merge
    touches only words containing the pair, and a lazy-invalidated
    max-heap over (count, pair) so picking the best pair is O(log P),
    not an O(P) scan per merge (the trainer-grade complexity)."""
    import heapq

    words = [list(t) + [EOW] for t in counts["term"].to_pylist()]
    freq = counts["n"].to_numpy(zero_copy_only=False).tolist()
    pair_counts: dict[tuple, int] = {}
    pair_words: dict[tuple, set] = {}

    def _add(w_id: int, sign: int, touched: set):
        syms, f = words[w_id], freq[w_id] * sign
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            pair_counts[p] = pair_counts.get(p, 0) + f
            touched.add(p)
            if sign > 0:
                pair_words.setdefault(p, set()).add(w_id)

    init_touched: set = set()
    for w_id in range(len(words)):
        _add(w_id, +1, init_touched)
    heap = [(-n, p) for p, n in pair_counts.items() if n > 0]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges and heap:
        negn, best = heapq.heappop(heap)
        if pair_counts.get(best, 0) != -negn:
            continue                      # stale heap entry
        merges.append(best)
        joined = best[0] + best[1]
        touched: set = set()
        for w_id in list(pair_words.get(best, ())):
            syms = words[w_id]
            _add(w_id, -1, touched)
            i, out = 0, []
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w_id] = out
            _add(w_id, +1, touched)
        pair_words.pop(best, None)        # fully consumed
        for p in touched:
            n = pair_counts.get(p, 0)
            if n > 0:
                heapq.heappush(heap, (-n, p))
            else:
                pair_counts.pop(p, None)
                pair_words.pop(p, None)
    return merges


def train_bpe_from_corpus(ds: ray.data.Dataset, num_merges: int,
                          text_col: str = "text",
                          parts: int = _WC_PARTS
                          ) -> list[tuple[str, str]]:
    return train_bpe(word_counts(ds, text_col, parts), num_merges)


def encode_word(word: str, ranks: dict[tuple, int]) -> list[str]:
    """GPT-2-style greedy encode: repeatedly apply the LOWEST-RANK
    (earliest-learned) applicable merge."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncoder:
    """map_batches actor: per-doc subword stats under a learned BPE.

    Encodes each batch's UNIQUE words once (bounded per-actor cache),
    fans per-word subword counts back out via dictionary indices, and
    emits (doc_id, n_words, n_subwords, compression) — the fertility
    signal tokenizer evaluations report."""

    def __init__(self, merges_ref, text_col: str = "text",
                 id_col: str = "doc_id", cache_cap: int = 1 << 20):
        merges = merges_ref if isinstance(merges_ref, list) \
            else ray.get(merges_ref)
        self._ranks = {tuple(p): i for i, p in enumerate(merges)}
        self._text, self._id = text_col, id_col
        self._cache: dict[str, int] = {}
        self._cap = cache_cap

    def _n_subwords(self, word: str) -> int:
        n = self._cache.get(word)
        if n is None:
            n = len(encode_word(word, self._ranks))
            if len(self._cache) >= self._cap:
                self._cache.clear()    # simple epoch cache, bounded
            self._cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        parents, toks, _, lens = tokenize_column(
            batch.column(self._text))
        d = pc.dictionary_encode(toks.combine_chunks()
                                 if isinstance(toks, pa.ChunkedArray)
                                 else toks)
        per_uniq = np.array([self._n_subwords(w)
                             for w in d.dictionary.to_pylist()],
                            np.int64)
        idx = d.indices.to_numpy(zero_copy_only=False)
        sub = np.bincount(parents,
                          weights=per_uniq[idx] if len(idx) else None,
                          minlength=batch.num_rows).astype(np.int64)
        words = np.asarray(lens, np.int64)
        comp = np.round(sub / np.maximum(words, 1), 4)
        return pa.table({
            self._id: batch.column(self._id).cast(pa.int64()),
            "n_words": pa.array(words, pa.int64()),
            "n_subwords": pa.array(sub, pa.int64()),
            "compression": pa.array(comp, pa.float64()),
        })


def bpe_stats(ds: ray.data.Dataset, merges: list[tuple[str, str]],
              text_col: str = "text", id_col: str = "doc_id"
              ) -> ray.data.Dataset:
    """Per-doc subword fertility under ``merges`` (actor pool; the
    merge table ships once via ray.put)."""
    ref = ray.put(merges)
    return ds.map_batches(
        BpeEncoder, fn_constructor_args=(ref, text_col, id_col),
        batch_format="pyarrow", concurrency=(1, 8))


def bpe_vocab(merges: list[tuple[str, str]],
              counts: pa.Table, first_id: int = 2) -> pa.Table:
    """(subword, token_id) table: base symbols (the corpus's distinct
    characters + EOW, sorted) then merge products in merge order —
    deterministic given (counts, merges). Ids 0/1 stay PAD/UNK, same
    convention as export.build_vocab."""
    chars: set = set()
    for t in counts["term"].to_pylist():
        chars.update(t)
    symbols = sorted(chars) + [EOW] + [a + b for a, b in merges]
    seen, ordered = set(), []
    for s in symbols:
        if s not in seen:
            seen.add(s)
            ordered.append(s)
    return pa.table({
        "subword": pa.array(ordered, pa.string()),
        "token_id": pa.array(
            range(first_id, first_id + len(ordered)), pa.int32()),
    })


class BpeIdEncoder:
    """map_batches actor: append a ``token_ids`` (list<int32>) column —
    each doc's BPE subword-id sequence.

    Per batch: encode UNIQUE words once (cache), then a vectorized
    flat gather fans per-word id arrays out across the token stream
    (np.repeat offset arithmetic — no per-token Python)."""

    def __init__(self, merges_ref, vocab_ref, text_col: str = "text",
                 unk_id: int = 1, cache_cap: int = 1 << 20):
        merges = merges_ref if isinstance(merges_ref, list) \
            else ray.get(merges_ref)
        vocab = vocab_ref if isinstance(vocab_ref, pa.Table) \
            else ray.get(vocab_ref)
        self._ranks = {tuple(p): i for i, p in enumerate(merges)}
        self._ids = {s: int(i) for s, i in
                     zip(vocab["subword"].to_pylist(),
                         vocab["token_id"].to_pylist())}
        self._unk = unk_id
        self._text = text_col
        self._cache: dict[str, np.ndarray] = {}
        self._cap = cache_cap

    def _word_ids(self, word: str) -> np.ndarray:
        ids = self._cache.get(word)
        if ids is None:
            ids = np.array([self._ids.get(s, self._unk) for s in
                            encode_word(word, self._ranks)], np.int32)
            if len(self._cache) >= self._cap:
                self._cache.clear()
            self._cache[word] = ids
        return ids

    def __call__(self, batch: pa.Table) -> pa.Table:
        parents, toks, _, _ = tokenize_column(batch.column(self._text))
        n_docs = batch.num_rows
        d = pc.dictionary_encode(toks.combine_chunks()
                                 if isinstance(toks, pa.ChunkedArray)
                                 else toks)
        uniq_arrays = [self._word_ids(w)
                       for w in d.dictionary.to_pylist()]
        if uniq_arrays:
            ua = np.concatenate(uniq_arrays)
            ulen = np.array([a.size for a in uniq_arrays], np.int64)
            uoffs = np.zeros(ulen.size, np.int64)
            np.cumsum(ulen[:-1], out=uoffs[1:])
            idx = d.indices.to_numpy(zero_copy_only=False)
            tlen = ulen[idx]
            total = int(tlen.sum())
            run0 = np.cumsum(tlen) - tlen
            flat = ua[np.repeat(uoffs[idx], tlen)
                      + (np.arange(total, dtype=np.int64)
                         - np.repeat(run0, tlen))]
            per_doc = np.bincount(parents, weights=tlen,
                                  minlength=n_docs).astype(np.int64)
        else:
            flat = np.array([], np.int32)
            per_doc = np.zeros(n_docs, np.int64)
        offs = np.zeros(n_docs + 1, np.int64)
        np.cumsum(per_doc, out=offs[1:])
        col = pa.ListArray.from_arrays(
            pa.array(offs, pa.int64()).cast(pa.int32()),
            pa.array(flat, pa.int32()))
        return batch.append_column("token_ids", col)


def encode_ids(ds: ray.data.Dataset, merges: list[tuple[str, str]],
               vocab: pa.Table, text_col: str = "text"
               ) -> ray.data.Dataset:
    """Append the per-doc BPE id sequence (feeds
    ``export.export_packed_sequences(ids_col="token_ids")``)."""
    mref, vref = ray.put(merges), ray.put(vocab)
    return ds.map_batches(
        BpeIdEncoder, fn_constructor_args=(mref, vref, text_col),
        batch_format="pyarrow", concurrency=(1, 8))


def export_bpe_shards(ds: ray.data.Dataset, out_dir: str,
                      num_merges: int = 8192, seq_len: int = 1024,
                      seqs_per_shard: int = 1024,
                      text_col: str = "text",
                      id_col: str = "doc_id", **export_kwargs) -> dict:
    """Corpus → BPE-packed training shards, plus the tokenizer
    artifacts a consumer needs to decode them (``bpe_vocab.parquet``
    and ``bpe_merges.json`` in ``out_dir``).

    The encoded stream is materialized between encode and export —
    the export makes two passes (counts, payload) and re-encoding the
    corpus per pass is the worse trade. Only (id, token_ids) is
    materialized (ids are ~4 bytes/token, smaller than the text they
    replace — keeping the text column would more than double the
    pinned footprint); blocks spill."""
    import json
    import os

    import pyarrow.parquet as pq

    from blacklab_ray.pipelines.export import export_packed_sequences
    wc = word_counts(ds, text_col)
    merges = train_bpe(wc, num_merges)
    vocab = bpe_vocab(merges, wc)
    enc = encode_ids(ds, merges, vocab, text_col) \
        .select_columns([id_col, "token_ids"]).materialize()
    stats = export_packed_sequences(
        enc, out_dir, seq_len=seq_len, seqs_per_shard=seqs_per_shard,
        ids_col="token_ids", n_vocab=int(vocab.num_rows) + 2,
        text_col=text_col, id_col=id_col, **export_kwargs)
    pq.write_table(vocab, os.path.join(out_dir, "bpe_vocab.parquet"))
    with open(os.path.join(out_dir, "bpe_merges.json"), "w") as f:
        json.dump([list(m) for m in merges], f)
    stats["n_merges"] = len(merges)
    return stats
