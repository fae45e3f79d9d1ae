"""Query-time federation over several index directories.

The Lucene ``MultiReader`` analogue (BlackLab opens one index; Lucene
composes segments/readers — org.apache.lucene.index.MultiReader):
search N independently built indexes as ONE corpus without the
physical re-exchange of ``index.merge.merge_indexes``. BM25 stats are
EXACT GLOBAL stats — doc_freq / collection_tf sum across sub-indexes
and avgdl recomputes from combined totals — so scores are identical
to searching the physically merged index (tested against
merge_indexes output in tests/test_joins.py's merge suite shape).

Why this exists at 100 TB: a fleet builds per-shard-range indexes in
parallel (resumable, independently); federation serves queries across
all of them immediately, while physical merges (which rewrite
postings) run as background compaction. This is exactly Lucene's
segment model one level up.

Doc-id model: ids are hash64(url) — GLOBAL by construction — so no
docBase offsetting is needed (the one thing Lucene's MultiReader has
to do). The caveat is also Lucene's: sub-indexes sharing a url (the
same doc indexed twice) yield duplicate postings; dedup across
sub-indexes is the build pipeline's job (``latest_snapshot_keep_ids``
/ ``url_dedup_keep_ids``), not the reader's.

Scale shape: everything delegates to the sub-readers' pruned gathers
and bucket-pruned segment reads; the only federation-side work is
summing small per-term stat rows and merge-sorting segment lists.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from blacklab_ray.query.reader import IndexReader, Segment


def compact_federation(index_dirs: list[str],
                       max_indexes: int = 4,
                       params=None) -> list[str]:
    """Size-tiered PHYSICAL compaction of a federation — the Lucene
    merge-policy analogue one level up: while ``MultiIndexReader``
    serves queries over N per-shard-range indexes immediately (the
    measured ~2% overhead), this merges the SMALLEST sub-indexes
    pairwise (``index.update.merge_indexes`` — fwd shards hard-linked,
    postings re-exchanged as one generation) until at most
    ``max_indexes`` remain, and returns the new dir list. Merging
    smallest-first minimizes bytes rewritten per round, exactly like
    size-tiered segment merge policies. The merged-into dirs stay
    valid the whole time — a serving federation can re-open on the
    returned spec whenever convenient."""
    import os

    from blacklab_ray.index.update import merge_indexes

    def _size(d: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(d):
            total += sum(os.path.getsize(os.path.join(root, f))
                         for f in files)
        return total

    dirs = list(index_dirs)
    if max_indexes < 1:
        raise ValueError("max_indexes must be >= 1")
    while len(dirs) > max_indexes:
        dirs.sort(key=_size)
        small, nxt = dirs[0], dirs[1]
        # merge the smallest INTO the second-smallest (dst survives)
        merge_indexes(nxt, small, params=params)
        dirs = [d for d in dirs if d != small]
    return dirs


def open_reader(spec: str | list[str]):
    """THE index-opening convention: one dir → ``IndexReader``;
    a list or comma-separated dirs → federated ``MultiIndexReader``.
    Shared by the CLI, the HTTP server, and the query-actor pool."""
    dirs = ([d for d in spec.split(",") if d]
            if isinstance(spec, str) else list(spec))
    if not dirs:
        raise ValueError(f"empty index spec {spec!r}")
    if len(dirs) > 1:
        return MultiIndexReader(dirs)
    return IndexReader(dirs[0])


class MultiIndexReader(IndexReader):
    """Read-only federated view over ``IndexReader``s.

    Inherits every pure-logic method (term_stats via the merged terms
    table, sorted_terms/term_sort_ranks collation, cache plumbing) and
    overrides the I/O surface to fan out to the sub-readers. Mutating
    APIs (index.update) are NOT supported on the federated view —
    update the owning sub-index.
    """

    def __init__(self, index_dirs: list[str]):
        if not index_dirs:
            raise ValueError("MultiIndexReader needs >= 1 index dir")
        self.subs = [IndexReader(d) for d in index_dirs]
        self.index_dirs = list(index_dirs)
        # synthesized combined meta (exact global BM25 stats)
        n_docs = sum(s.n_docs for s in self.subs)
        total_tokens = sum(
            int(s.meta.get("total_tokens",
                           round(s.avgdl * s.n_docs)))
            for s in self.subs)
        self.meta = {
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "avg_doc_len": (total_tokens / n_docs) if n_docs else 0.0,
            "params": dict(self.subs[0].meta.get("params", {})),
            "federated": [s.index_dir for s in self.subs],
        }
        self.n_docs = n_docs
        self.avgdl = self.meta["avg_doc_len"]
        # service-tier bucket sharding keys on ONE index's layout;
        # federate behind the replicated service, not the sharded one
        self.num_buckets = self.subs[0].num_buckets
        self.codec = self.subs[0].codec
        self.index_dir = self.subs[0].index_dir  # server fwd fallback
        tombs: set[int] = set()
        for s in self.subs:
            tombs |= set(s.tombstones)
        self.tombstones = frozenset(tombs)
        self._tomb_arr = np.array(sorted(tombs), dtype=np.int64)
        self._terms_tbl = None

    def fwd_dataset(self):
        """Union Parquet dataset over every sub-index's forward index
        (serving-tier doc reads see the whole federation)."""
        import pyarrow.dataset as pa_ds
        return pa_ds.dataset([s.fwd_dataset() for s in self.subs])

    # ---- side tables ----------------------------------------------------

    def _require_annotation(self, annot: str) -> None:
        """Fail fast with a per-sub message when an annotation is not
        carried by EVERY sub-index — a federated query over a partial
        annotation would silently miss the lacking subs' docs."""
        if annot in ("i", None, "word"):
            return
        lacking = [s.index_dir for s in self.subs
                   if annot not in s.annotations()]
        if lacking:
            raise FileNotFoundError(
                f"annotation {annot!r} is not universal across the "
                f"federation — missing from: {lacking}")

    def terms_table_for(self, annot: str) -> pa.Table:
        """Merged term dictionary: one row per term with SUMMED
        doc_freq / collection_tf (exact global stats)."""
        if not hasattr(self, "_merged_terms"):
            self._merged_terms: dict[str, pa.Table] = {}
        if annot not in self._merged_terms:
            self._require_annotation(annot)
            parts = [s.terms_table_for(annot) for s in self.subs]
            cols = ["term", "doc_freq", "collection_tf"]
            cat = pa.concat_tables([p.select(cols) for p in parts])
            grouped = pa.TableGroupBy(cat, "term").aggregate(
                [("doc_freq", "sum"), ("collection_tf", "sum")])
            merged = pa.table({
                "term": grouped["term"],
                "doc_freq": grouped["doc_freq_sum"].cast(pa.int64()),
                "collection_tf":
                    grouped["collection_tf_sum"].cast(pa.int64()),
            }).sort_by([("term", "ascending")])
            self._merged_terms[annot] = merged
        return self._merged_terms[annot]

    @property
    def terms_table(self) -> pa.Table:
        return self.terms_table_for("i")

    @property
    def terms_table_sensitive(self) -> pa.Table:
        return self.terms_table_for("s")

    def annotations(self) -> list[str]:
        """INTERSECTION across sub-indexes: only annotations every sub
        carries are queryable over the federation (a union would
        advertise routes that crash — or silently miss docs — for
        subs lacking the annotation)."""
        out = self.subs[0].annotations()
        for s in self.subs[1:]:
            have = set(s.annotations())
            out = [a for a in out if a in have]
        return out

    # ---- postings -------------------------------------------------------

    def segments(self, terms: list[str],
                 sensitivity: str = "i") -> dict[str, list[Segment]]:
        """Concatenated per-term segment lists across sub-indexes,
        (first_doc, last_doc)-sorted — the same overlapping-segment
        shape incremental adds already produce within one index, so
        every DAAT/WAND iterator handles it unchanged."""
        out: dict[str, list[Segment]] = {t: [] for t in terms}
        for s in self.subs:
            for t, segs in s.segments(terms, sensitivity).items():
                out[t].extend(segs)
        for t in out:
            out[t].sort(key=lambda sg: (sg.first_doc, sg.last_doc))
        return out

    # ---- per-doc gathers (loop the subs' pruned fwd reads; cached at
    # the federation level with the base class's bounded-cache
    # discipline, so repeated serving queries don't re-scan Parquet) --------

    def doc_lens(self, doc_ids: np.ndarray) -> np.ndarray:
        return self._gather_int(doc_ids, "doc_len", np.int64,
                                "_doclen_cache", self._DOCLEN_CACHE_MAX)

    def norms_for(self, doc_ids: np.ndarray) -> np.ndarray:
        return self._gather_int(doc_ids, "norm", np.uint8,
                                "_norm_cache", self._NORM_CACHE_MAX)

    def _gather_int(self, doc_ids: np.ndarray, col: str, dtype,
                    cache_attr: str, cache_max: int) -> np.ndarray:
        import pyarrow.compute as pc
        doc_ids = np.asarray(doc_ids, dtype=np.int64)
        if not hasattr(self, cache_attr):
            setattr(self, cache_attr, {})
        cache: dict[int, int] = getattr(self, cache_attr)
        # evict BEFORE computing `missing` (the norms_for rationale)
        if len(cache) > cache_max:
            cache.clear()
        missing = {int(d) for d in np.unique(doc_ids)
                   if int(d) not in cache}
        for s in self.subs:
            if not missing:
                break
            tbl = s.fwd_dataset().to_table(
                columns=["doc_id", col],
                filter=pc.field("doc_id").isin(sorted(missing)))
            for d, v in zip(tbl["doc_id"].to_numpy(),
                            tbl[col].to_numpy()):
                cache[int(d)] = int(v)
                missing.discard(int(d))
        return np.array([cache[int(d)] for d in doc_ids], dtype=dtype)

    def urls(self, doc_ids: np.ndarray) -> list:
        doc_ids = np.asarray(doc_ids, dtype=np.int64)
        out: list = [None] * doc_ids.size
        todo = np.arange(doc_ids.size)
        for s in self.subs:
            if not todo.size:
                break
            got = s.urls(doc_ids[todo])
            still = []
            for j, u in zip(todo.tolist(), got):
                if u is None:
                    still.append(j)
                else:
                    out[j] = u
            todo = np.array(still, dtype=np.int64)
        return out

    def tokens_at(self, doc_ids: np.ndarray, positions: np.ndarray,
                  annotation: str | None = None) -> list:
        self._require_annotation(annotation)
        doc_ids = np.asarray(doc_ids, dtype=np.int64)
        positions = np.asarray(positions, dtype=np.int64)
        out: list = [None] * doc_ids.size
        todo = np.arange(doc_ids.size)
        for s in self.subs:
            if not todo.size:
                break
            got = s.tokens_at(doc_ids[todo], positions[todo],
                              annotation)
            still = []
            for j, tok in zip(todo.tolist(), got):
                if tok is None:
                    still.append(j)
                else:
                    out[j] = tok
            todo = np.array(still, dtype=np.int64)
        return out

    def iter_doc_id_chunks(self, chunk_docs: int = 1 << 20):
        """Chained sub-iterators (each yielded chunk is sorted; global
        cross-chunk order is not required — same contract as the
        single-index streamer)."""
        for s in self.subs:
            yield from s.iter_doc_id_chunks(chunk_docs)

    # ---- structural spans -------------------------------------------------

    def paragraph_spans(self) -> pa.Table:
        return self._concat_spans("paragraph_spans")

    def sentence_spans(self) -> pa.Table:
        return self._concat_spans("sentence_spans")

    def tag_spans(self, name: str, attrs=None) -> pa.Table:
        parts = [s.tag_spans(name, attrs) for s in self.subs]
        return pa.concat_tables(parts).sort_by(
            [("doc_id", "ascending"), ("start", "ascending"),
             ("end", "ascending")])

    def _concat_spans(self, meth: str) -> pa.Table:
        parts = [getattr(s, meth)() for s in self.subs]
        return pa.concat_tables(parts).sort_by(
            [("doc_id", "ascending"), ("start", "ascending"),
             ("end", "ascending")])

    # ---- caches ------------------------------------------------------------

    def cache_info(self) -> dict:
        out = IndexReader.cache_info(self)   # federation-level gathers
        for s in self.subs:
            for k, v in s.cache_info().items():
                out[k] = out.get(k, 0) + v
        return out

    def clear_caches(self) -> None:
        IndexReader.clear_caches(self)
        for s in self.subs:
            s.clear_caches()
        if hasattr(self, "_merged_terms"):
            self._merged_terms.clear()
