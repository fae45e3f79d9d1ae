"""Index reader: lazy access to postings segments + side tables.

The query-side state holder (SURVEY §2.11 "query-engine state"): loads
``meta.json`` and the terms-stats table once, resolves a query term to its
bucket partition, and reads only that partition's Parquet (predicate
pushdown on ``term``) — the analogue of BlackLab's mmap'd terms/forward
index singletons (forwardindex/TermsReaderAbstract.java:18) but backed by
partitioned Parquet instead of custom files.

Decoded segments are returned as numpy arrays; per-segment block decoding
stays lazy for WAND (block-at-a-time skipping).
"""

from __future__ import annotations

import json
import os
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pa_ds
import pyarrow.parquet as pq

from blacklab_ray.codec.vbyte import (
    decode_position_lists, delta_decode, vbyte_decode,
)
from blacklab_ray.stages.tokenize import hash64


# observability: block-decode counters (asserted by the phrase-skipping
# tests; negligible overhead — two dict increments per decode)
DECODE_STATS = {"blocks_decoded": 0, "full_segments": 0}


def reset_decode_stats() -> dict:
    DECODE_STATS["blocks_decoded"] = 0
    DECODE_STATS["full_segments"] = 0
    return DECODE_STATS


class Segment:
    """One (term, salt, seg) posting segment; lazy block decode.

    Backed by ZERO-COPY views into the fetched Arrow blocks column:
    block metadata are numpy slices of shared arrays and blob access is
    memoryview slicing of the shared binary buffers — no per-row
    ``to_pylist`` dict materialization (which dominated cold segment
    reads: 11 s of a 60-query profiled run)."""

    __slots__ = ("term", "df_seg", "ctf_seg", "first_doc", "last_doc",
                 "n_blocks", "last_docs", "max_tfs", "min_norms", "ns",
                 "_bins", "_lo", "_decoded", "codec")

    def __init__(self, term, df_seg, ctf_seg, first_doc, last_doc,
                 lo, hi, meta, bins, codec="vbyte"):
        self.codec = codec
        self.term = term
        self.df_seg = df_seg
        self.ctf_seg = ctf_seg
        self.first_doc = first_doc
        self.last_doc = last_doc
        self._lo = lo
        self.n_blocks = hi - lo
        self.last_docs = meta["last_doc"][lo:hi]
        self.max_tfs = meta["max_tf"][lo:hi]
        self.min_norms = meta["min_norm"][lo:hi]
        self.ns = meta["n"][lo:hi]
        self._bins = bins
        self._decoded = None

    @classmethod
    def from_table(cls, tbl: pa.Table,
                   codec: str = "vbyte") -> list["Segment"]:
        """Build segments for every row of a fetched postings table."""
        if tbl.num_rows == 0:
            return []
        blocks_col = tbl.column("blocks").combine_chunks()
        lens = pc.list_value_length(blocks_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        offs = np.zeros(lens.size + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        flat = blocks_col.flatten()
        meta = {f: flat.field(f).to_numpy(zero_copy_only=False)
                .astype(np.int64)
                for f in ("last_doc", "max_tf", "min_norm", "n")}
        bins = {}
        for f in ("docs", "tfs", "norms", "pos"):
            arr = flat.field(f)
            bufs = arr.buffers()
            o = np.frombuffer(bufs[1], np.int32)[
                arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
            mv = memoryview(bufs[2]) if bufs[2] is not None \
                else memoryview(b"")
            bins[f] = (o, mv)
        terms = tbl["term"].to_pylist()
        df = tbl["df_seg"].to_numpy()
        ctf = tbl["ctf_seg"].to_numpy()
        fd = tbl["first_doc"].to_numpy()
        ld = tbl["last_doc"].to_numpy()
        return [cls(terms[i], int(df[i]), int(ctf[i]), int(fd[i]),
                    int(ld[i]), int(offs[i]), int(offs[i + 1]),
                    meta, bins, codec)
                for i in range(tbl.num_rows)]

    def _blob(self, field: str, i: int) -> memoryview:
        o, mv = self._bins[field]
        j = self._lo + i
        return mv[o[j]:o[j + 1]]

    def _blob_span(self, field: str) -> memoryview:
        """All blocks' blobs in one contiguous slice (blocks of one
        segment are adjacent in the fetched buffer)."""
        o, mv = self._bins[field]
        return mv[o[self._lo]:o[self._lo + self.n_blocks]]

    def _span_offsets(self, field: str) -> np.ndarray:
        """Per-block byte offsets WITHIN the blob span (pfor blocks are
        not self-delimiting; the reader always has these)."""
        o, _mv = self._bins[field]
        sl = o[self._lo:self._lo + self.n_blocks + 1]
        return sl - sl[0]

    @property
    def blocks(self) -> list[dict]:
        """Back-compat materialization (tests / diagnostics only — NOT
        on the query hot path)."""
        return [{"last_doc": int(self.last_docs[i]),
                 "max_tf": int(self.max_tfs[i]),
                 "min_norm": int(self.min_norms[i]),
                 "n": int(self.ns[i]),
                 "docs": bytes(self._blob("docs", i)),
                 "tfs": bytes(self._blob("tfs", i)),
                 "norms": bytes(self._blob("norms", i)),
                 "pos": bytes(self._blob("pos", i))}
                for i in range(self.n_blocks)]

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(doc_ids, tfs, norms) for the whole segment.

        One VByte pass over the contiguous blob span (VByte is
        self-delimiting), then a segmented cumsum restores the
        per-block absolute doc ids — ~100× fewer numpy-call overheads
        than per-block decoding for long posting lists.
        """
        if self._decoded is not None:
            return self._decoded
        if not self.n_blocks:
            e = np.empty(0, dtype=np.int64)
            return e, e.copy(), np.empty(0, dtype=np.uint8)
        DECODE_STATS["blocks_decoded"] += self.n_blocks
        DECODE_STATS["full_segments"] += 1
        counts = self.ns
        if self.codec == "pfor":
            from blacklab_ray.codec.pfor import decode_span
            deltas = decode_span(
                self._blob_span("docs"), self._span_offsets("docs"),
                counts).astype(np.int64)
        else:
            deltas = vbyte_decode(self._blob_span("docs")).astype(np.int64)
        # segmented cumsum: each block's first delta is its absolute doc
        csum = np.cumsum(deltas)
        starts = np.zeros(counts.size, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        base = csum[starts] - deltas[starts]
        docs = csum - np.repeat(base, counts)
        if self.codec == "pfor":
            from blacklab_ray.codec.pfor import decode_span
            tfs = decode_span(
                self._blob_span("tfs"), self._span_offsets("tfs"),
                counts).astype(np.int64)
        else:
            tfs = vbyte_decode(self._blob_span("tfs")).astype(np.int64)
        norms = np.frombuffer(self._blob_span("norms"), dtype=np.uint8)
        self._decoded = (docs, tfs, norms)
        return self._decoded

    def decode_block(self, i: int):
        DECODE_STATS["blocks_decoded"] += 1
        n = int(self.ns[i])
        db = self._blob("docs", i)
        tb = self._blob("tfs", i)
        if self.codec == "pfor":
            from blacklab_ray.codec.pfor import decode_span
            one = np.array([n], dtype=np.int64)
            docs = np.cumsum(decode_span(
                db, np.array([0, len(db)]), one).astype(np.int64))
            tfs = decode_span(
                tb, np.array([0, len(tb)]), one).astype(np.int64)
        else:
            # fused decode: docs deltas + tfs in ONE varint pass
            # (per-call numpy overhead halves; streams are separated
            # by count)
            vals = vbyte_decode(bytes(db) + bytes(tb)).astype(np.int64)
            docs = np.cumsum(vals[:n])
            tfs = vals[n:]
        norms = np.frombuffer(self._blob("norms", i), dtype=np.uint8)
        return docs, tfs, norms

    def block_last_docs(self) -> np.ndarray:
        """last_doc per block — the skip list for candidate pruning."""
        return self.last_docs

    def decode_block_positions(self, i: int, tfs: np.ndarray) -> np.ndarray:
        """Concatenated absolute positions for block i (aligned by tfs)."""
        return decode_position_lists(self._blob("pos", i), tfs)

    def decode_all_positions(self, tfs: np.ndarray) -> np.ndarray:
        """Concatenated absolute positions for the WHOLE segment in one
        VByte pass (the positions counterpart of decode_all: the full
        blob span is the concatenation of per-doc delta lists, so one
        decode_position_lists call with all tfs restores it)."""
        return decode_position_lists(self._blob_span("pos"), tfs)


class IndexReader:
    """Driver/actor-side handle on an index directory."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.n_docs = self.meta["n_docs"]
        self.avgdl = self.meta["avg_doc_len"]
        self.num_buckets = self.meta["params"]["num_buckets"]
        self.codec = self.meta["params"].get("codec", "vbyte")
        self._terms_tbl: pa.Table | None = None
        # tombstoned doc ids from incremental deletes (updates.json);
        # stats keep counting them until compaction (Lucene-like)
        self.tombstones: frozenset[int] = frozenset()
        self._tomb_arr = np.empty(0, dtype=np.int64)
        upd_path = os.path.join(index_dir, "updates.json")
        if os.path.exists(upd_path):
            with open(upd_path) as f:
                tombs = json.load(f).get("tombstones", [])
            self.tombstones = frozenset(tombs)
            self._tomb_arr = np.array(sorted(tombs), dtype=np.int64)

    def fwd_dataset(self) -> "pa_ds.Dataset":
        """The forward-index Parquet dataset — THE handle for doc-table
        reads (serving-tier doc info/snippets/fields); goes through a
        method so the federated MultiIndexReader can substitute a
        union over its sub-indexes. A zero-doc index (created empty,
        filled later) has no fwd files yet — return a schema'd empty
        dataset so pushdown gathers see the canonical columns instead
        of failing on a schema-less dir."""
        d = pa_ds.dataset(os.path.join(self.index_dir, "fwd"),
                          format="parquet")
        if "doc_id" not in d.schema.names:
            cols = {
                "doc_id": pa.array([], pa.int64()),
                "url": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "doc_len": pa.array([], pa.int64()),
                "norm": pa.array([], pa.int64()),
                "terms": pa.array([], pa.list_(pa.string())),
                "tfs": pa.array([], pa.list_(pa.int64())),
                "pos": pa.array([], pa.list_(pa.binary())),
            }
            # the index's CONFIGURED extra columns must exist too, or
            # metadata sorts / annotation gathers on the empty index
            # error instead of returning cleanly empty results
            p = self.meta.get("params") or {}
            for a in (p.get("annotations") or ()):
                cols[f"terms_{a}"] = pa.array([], pa.list_(pa.string()))
                cols[f"tfs_{a}"] = pa.array([], pa.list_(pa.int64()))
                cols[f"pos_{a}"] = pa.array([], pa.list_(pa.binary()))
            for item in (p.get("metadata_fields") or ()):
                nm, ty = item[0], item[1]
                if nm not in cols:
                    cols[nm] = pa.array(
                        [], pa.float64() if ty == "numeric"
                        else pa.string())
            if p.get("store_text"):
                cols["text"] = pa.array([], pa.string())
            return pa_ds.dataset(pa.table(cols))
        return d

    def mask_tombstones(self, doc_ids: np.ndarray) -> np.ndarray:
        """Boolean mask of NON-deleted docs (vectorized)."""
        if not self.tombstones.__len__():
            return np.ones(doc_ids.size, dtype=bool)
        return ~np.isin(doc_ids, self._tomb_arr, assume_unique=False)

    # ---- side tables ----------------------------------------------------

    @property
    def terms_table(self) -> pa.Table:
        if self._terms_tbl is None:
            self._terms_tbl = pq.read_table(
                os.path.join(self.index_dir, "terms"))
        return self._terms_tbl

    @property
    def terms_table_sensitive(self) -> pa.Table:
        """Terms table of the `@s` annotation (terms_s/)."""
        return self.terms_table_for("s")

    def terms_table_for(self, annot: str) -> pa.Table:
        """Terms table of an annotation: "i" (default word@i), "s"
        (case-sensitive word@s), or a parallel annotation name like
        "lemma" (the contents%lemma field routing,
        AnnotatedFieldNameUtil.java:47)."""
        if annot == "i":
            return self.terms_table
        if not hasattr(self, "_terms_tbls"):
            self._terms_tbls: dict[str, pa.Table] = {}
        if annot not in self._terms_tbls:
            p = os.path.join(self.index_dir, f"terms_{annot}")
            if not os.path.isdir(p):
                hint = ("BuildParams.sensitive=True" if annot == "s"
                        else f"BuildParams.annotations=({annot!r},)")
                raise FileNotFoundError(
                    f"index has no {annot!r} annotation (build with "
                    f"{hint})")
            self._terms_tbls[annot] = pq.read_table(p)
        return self._terms_tbls[annot]

    def sorted_terms(self, annot: str = "i") -> list[str]:
        """Term dictionary in COLLATED order (the Terms.java:69-95 /
        TermsIntegrated.java:145-215 sort orders): the "i" route uses
        the insensitive fold (ties broken by the full key), any other
        route the full three-level collation — so "Cafe"/"café"/"cafe"
        list together instead of scattering by codepoint."""
        from blacklab_ray.analysis.collate import sort_terms
        terms = self.terms_table_for(annot)["term"].to_pylist()
        return sort_terms(terms, sensitive=(annot != "i"))

    def term_sort_ranks(self, annot: str = "i") -> np.ndarray:
        """Sort position per terms-table row (Terms.idToSortPosition):
        insensitive ranks are SHARED by fold-equal terms, sensitive
        ranks are unique. Cached per annotation route."""
        from blacklab_ray.analysis.collate import term_sort_ranks
        if not hasattr(self, "_sort_ranks"):
            self._sort_ranks: dict[str, np.ndarray] = {}
        if annot not in self._sort_ranks:
            terms = self.terms_table_for(annot)["term"].to_pylist()
            self._sort_ranks[annot] = term_sort_ranks(
                terms, sensitive=(annot != "i"))
        return self._sort_ranks[annot]

    def annotations(self) -> list[str]:
        """Annotation names this index carries (always includes 'i')."""
        out = ["i"]
        for d in sorted(os.listdir(self.index_dir)):
            if d.startswith("terms_") \
                    and not d.startswith("terms_parts") \
                    and os.path.isdir(os.path.join(self.index_dir, d)):
                out.append(d[len("terms_"):])
        return out

    def term_stats(self, terms: list[str],
                   sensitivity: str = "i") -> dict[str, tuple[int, int]]:
        """term → (doc_freq, collection_tf); absent terms omitted.
        ``sensitivity`` is the annotation route: "i" (default), "s",
        or a parallel annotation name (lemma/pos)."""
        if not terms:
            return {}
        tbl = self.terms_table_for(sensitivity)
        mask = pc.is_in(tbl["term"],
                        value_set=pa.array(terms, pa.string()))
        sub = tbl.filter(mask)
        return {t.as_py(): (df.as_py(), ctf.as_py())
                for t, df, ctf in zip(sub["term"], sub["doc_freq"],
                                      sub["collection_tf"])}

    _DOCLEN_CACHE_MAX = 1 << 22   # ~4M cached (doc_id, doc_len) pairs

    def doc_lens(self, doc_ids: np.ndarray) -> np.ndarray:
        """Token length per doc — a doc_id-pruned GATHER over the fwd
        dataset with a bounded cache, exactly the ``norms_for`` shape
        (VERDICT r3 #2: the old ``_load_docs`` pulled doc_id+url+
        doc_len for the WHOLE corpus into the query actor whenever a
        negated-position CQL query or unquantized phrase scoring asked
        for a handful of candidate lengths)."""
        doc_ids = np.asarray(doc_ids, dtype=np.int64)
        if not hasattr(self, "_doclen_cache"):
            self._doclen_cache: dict[int, int] = {}
        # evict BEFORE computing `missing` (same rationale as norms_for)
        if len(self._doclen_cache) > self._DOCLEN_CACHE_MAX:
            self._doclen_cache.clear()
        missing = [int(d) for d in np.unique(doc_ids)
                   if int(d) not in self._doclen_cache]
        if missing:
            ds = self.fwd_dataset()
            tbl = ds.to_table(columns=["doc_id", "doc_len"],
                              filter=pc.field("doc_id").isin(missing))
            for d, n in zip(tbl["doc_id"].to_numpy(),
                            tbl["doc_len"].to_numpy()):
                self._doclen_cache[int(d)] = int(n)
        return np.array([self._doclen_cache[int(d)] for d in doc_ids],
                        dtype=np.int64)

    _NORM_CACHE_MAX = 1 << 22   # ~4M cached (doc_id, norm) pairs

    def norms_for(self, doc_ids: np.ndarray) -> np.ndarray:
        """SmallFloat norm byte per doc — a doc_id-pruned GATHER over
        the fwd dataset, not a full doc-table load (VERDICT r1 #7: at
        10^12 docs `_load_docs` is a query-actor OOM; the quantized
        scoring paths only ever need norms for candidate docs)."""
        doc_ids = np.asarray(doc_ids, dtype=np.int64)
        if not hasattr(self, "_norm_cache"):
            self._norm_cache: dict[int, int] = {}
        # evict BEFORE computing `missing`: clearing after would wipe
        # cached entries the current call still relies on and the final
        # lookup would KeyError once the cache fills (ADVICE r2 #3)
        if len(self._norm_cache) > self._NORM_CACHE_MAX:
            self._norm_cache.clear()
        missing = [int(d) for d in np.unique(doc_ids)
                   if int(d) not in self._norm_cache]
        if missing:
            ds = self.fwd_dataset()
            tbl = ds.to_table(columns=["doc_id", "norm"],
                              filter=pc.field("doc_id").isin(missing))
            for d, n in zip(tbl["doc_id"].to_numpy(),
                            tbl["norm"].to_numpy()):
                self._norm_cache[int(d)] = int(n)
        return np.array([self._norm_cache[int(d)] for d in doc_ids],
                        dtype=np.uint8)

    def all_doc_ids(self) -> np.ndarray:
        """Sorted live doc ids — the complement universe for NOT queries
        (the reference's SpansNot needs the doc-length table the same
        way, search/lucene/SpansNot.java:19). Reads ONLY the int64 id
        column (via the chunked streamer — no url/doc_len load); at
        10^12-doc scale prefer ``iter_doc_id_chunks`` directly."""
        chunks = list(self.iter_doc_id_chunks())
        if not chunks:
            return np.empty(0, np.int64)
        return np.sort(np.concatenate(chunks))

    def iter_doc_id_chunks(self, chunk_docs: int = 1 << 20):
        """Stream sorted live doc-id chunks WITHOUT materializing the
        doc table (VERDICT r2 #7: `_load_docs` holds doc_id+url+doc_len
        for the whole corpus in the query actor — a purely negative
        query at 10^12 docs OOMs there). Reads only the int64 id column
        per fwd row group; each yielded chunk is sorted (global
        cross-chunk order is not needed: complement evaluation is
        per-doc and results are re-sorted by unique_spans)."""
        ds = self.fwd_dataset()
        buf: list[np.ndarray] = []
        n = 0
        for batch in ds.to_batches(columns=["doc_id"],
                                   batch_size=chunk_docs):
            if batch.num_rows == 0:
                continue
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            buf.append(ids)
            n += ids.size
            if n >= chunk_docs:
                out = np.sort(np.concatenate(buf))
                yield out[self.mask_tombstones(out)]
                buf, n = [], 0
        if buf:
            out = np.sort(np.concatenate(buf))
            yield out[self.mask_tombstones(out)]

    def urls(self, doc_ids: np.ndarray) -> list[str]:
        """Resolve urls for (top-k-sized) doc id sets via a doc_id-pruned
        gather — never materializes the full url column (VERDICT r1 #7)."""
        doc_ids = np.asarray(doc_ids, dtype=np.int64)
        ds = self.fwd_dataset()
        need = [int(x) for x in np.unique(doc_ids)]
        tbl = ds.to_table(columns=["doc_id", "url"],
                          filter=pc.field("doc_id").isin(need))
        lookup = dict(zip(tbl["doc_id"].to_numpy(),
                          tbl["url"].to_pylist()))
        # .get: a doc_id absent from fwd (stale candidate after a
        # compaction race) yields a placeholder, not a crash
        return [lookup.get(int(d)) for d in doc_ids]

    def paragraph_spans(self) -> "pa.Table":
        """Structural paragraph spans (doc_id, start, end) from the
        forward index (requires BuildParams.paragraph_spans=True) — the
        tags-span source (SpanQueryTags analogue) for tagless webtext."""
        return self._block_spans("para_lens", "_para_spans")

    def sentence_spans(self) -> "pa.Table":
        """Structural sentence spans (requires
        BuildParams.sentence_spans=True) — the `<s/>` tag source."""
        return self._block_spans("sent_lens", "_sent_spans")

    def tag_spans(self, name: str,
                  attrs: dict[str, str] | None = None) -> "pa.Table":
        """Structural spans of tag ``name`` filtered by attribute
        values (SpanQueryTags.java:31 with @attr__value filtering,
        AnnotatedFieldNameUtil.java:93-106). Requires the corpus to
        carry a standoff ``tags`` column
        (list<struct<name,start,end,attrs>>; attrs is a
        'k=v;k2=v2' string)."""
        from blacklab_ray.query.spans import span_table
        if getattr(self, "_tag_spans_tbl", None) is None:
            try:
                tbl = pq.read_table(os.path.join(self.index_dir, "fwd"),
                                    columns=["doc_id", "tag_spans"])
            except Exception as e:
                raise FileNotFoundError(
                    "index has no structural tag spans (input needs a "
                    "'tags' standoff column)") from e
            col = tbl["tag_spans"].combine_chunks()
            flat = col.flatten()
            parents = pc.list_parent_indices(col).to_numpy(
                zero_copy_only=False)
            self._tag_spans_tbl = {
                "doc_id": tbl["doc_id"].to_numpy()[parents],
                "name": flat.field("name").to_pylist(),
                "start": flat.field("start").to_numpy(
                    zero_copy_only=False).astype(np.int64),
                "end": flat.field("end").to_numpy(
                    zero_copy_only=False).astype(np.int64),
                "attrs": flat.field("attrs").to_pylist(),
            }
        t = self._tag_spans_tbl
        keep = np.array([n == name for n in t["name"]], dtype=bool)
        if attrs:
            def _match(s: str) -> bool:
                if not s:
                    return False
                d = dict(kv.split("=", 1) for kv in s.split(";") if kv)
                return all(d.get(k) == v for k, v in attrs.items())
            keep &= np.array([_match(s) for s in t["attrs"]], dtype=bool)
        return span_table(t["doc_id"][keep], t["start"][keep],
                          t["end"][keep])

    def _block_spans(self, col: str, cache_attr: str) -> "pa.Table":
        if getattr(self, cache_attr, None) is not None:
            return getattr(self, cache_attr)
        from blacklab_ray.query.spans import span_table
        tbl = pq.read_table(os.path.join(self.index_dir, "fwd"),
                            columns=["doc_id", col])
        lens_col = tbl[col].combine_chunks()
        flat = pc.list_flatten(lens_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        parents = pc.list_parent_indices(lens_col).to_numpy(
            zero_copy_only=False)
        doc_ids = tbl["doc_id"].to_numpy()[parents]
        # segmented cumsum: token offsets restart at each doc's run
        ends_global = np.cumsum(flat)
        first = np.ones(parents.size, dtype=bool)
        first[1:] = parents[1:] != parents[:-1]
        run_starts = np.flatnonzero(first)
        run_base = ends_global[run_starts] - flat[run_starts]
        run_id = np.cumsum(first) - 1
        ends = ends_global - run_base[run_id]
        starts = ends - flat
        keep = flat > 0
        out = span_table(doc_ids[keep], starts[keep], ends[keep])
        setattr(self, cache_attr, out)
        return out

    _TOK_CACHE_MAX = 1 << 16   # ~65k cached per-doc position maps

    def tokens_at(self, doc_ids: np.ndarray,
                  positions: np.ndarray,
                  annotation: str | None = None) -> list[str | None]:
        """Token string at each (doc_id, position) pair — the forward-
        index lookup global constraints post-filter with
        (SpansConstrained.java:15 compares captured groups' token values
        via ForwardIndexAccessor). ``annotation`` selects a parallel
        annotation's token stream (``A.lemma`` constraints —
        MatchFilterTokenAnnotation semantics); None/'word' reads the
        word annotation. Reads only the needed docs' fwd rows
        (predicate-pushdown gather; at cluster scale this is a gather
        join against the fwd dataset keyed by doc_id)."""
        from blacklab_ray.codec.vbyte import decode_position_lists
        doc_ids = np.asarray(doc_ids, dtype=np.int64)
        positions = np.asarray(positions, dtype=np.int64)
        need = np.unique(doc_ids)
        annot = None if annotation in (None, "word") else annotation
        suffix = "" if annot is None else f"_{annot}"
        if not hasattr(self, "_fwd_tok_cache"):
            self._fwd_tok_cache: dict[tuple, dict[int, str]] = {}
        # bounded like the norm cache: whole-dict reset before the
        # `missing` computation keeps long-lived readers from growing
        # without limit (ADVICE r2 #5)
        if len(self._fwd_tok_cache) > self._TOK_CACHE_MAX:
            self._fwd_tok_cache.clear()
        missing = [int(d) for d in need
                   if (annot, int(d)) not in self._fwd_tok_cache]
        if missing:
            ds = self.fwd_dataset()
            cols = ["doc_id", f"terms{suffix}", f"tfs{suffix}",
                    f"pos{suffix}"]
            if annot is not None and \
                    f"terms{suffix}" not in ds.schema.names:
                raise FileNotFoundError(
                    f"index has no {annot!r} annotation (fwd columns: "
                    f"{[c for c in ds.schema.names]})")
            tbl = ds.to_table(columns=cols,
                              filter=pc.field("doc_id").isin(missing))
            for row in tbl.to_pylist():
                posmap: dict[int, str] = {}
                for term, tf, blob in zip(row[f"terms{suffix}"],
                                          row[f"tfs{suffix}"],
                                          row[f"pos{suffix}"]):
                    ps = decode_position_lists(
                        blob, np.array([tf], dtype=np.int64))
                    for p in ps.tolist():
                        posmap[int(p)] = term
                self._fwd_tok_cache[(annot, int(row["doc_id"]))] = posmap
        return [self._fwd_tok_cache.get((annot, int(d)), {}).get(int(p))
                for d, p in zip(doc_ids, positions)]

    # ---- cache introspection (BLS /cache-info and /cache-clear
    # analogues, RequestHandlerCacheInfo.java / ClearCache.java — here
    # scoped to the reader-level gather caches; the serving-tier result
    # caches live in query/cache.py and report through the service) ----

    _CACHE_ATTRS = ("_doclen_cache", "_norm_cache", "_fwd_tok_cache",
                    "_seg_cache")

    def cache_info(self) -> dict:
        """Entry counts per reader-level cache (0 when never touched)."""
        return {a.strip("_"): len(getattr(self, a, {}) or {})
                for a in self._CACHE_ATTRS}

    def clear_caches(self) -> None:
        for a in self._CACHE_ATTRS:
            c = getattr(self, a, None)
            if c:
                c.clear()

    # ---- postings -------------------------------------------------------

    _SEG_CACHE_MAX = 4096  # cached terms (BlackLab mmap-everything analogue)

    def segments(self, terms: list[str],
                 sensitivity: str = "i") -> dict[str, list[Segment]]:
        """Read posting segments for the given terms (bucket-pruned read,
        per-term LRU cache — hot/stopword lists are read from Parquet
        once per reader, like the reference's mmap'd postings).
        ``sensitivity`` routes to postings/ (`@i`) or postings_s/
        (`@s`) — the per-annotation posting partitions."""
        if not hasattr(self, "_seg_cache"):
            self._seg_cache: dict[tuple[str, str], list[Segment]] = {}
        missing = [t for t in set(terms)
                   if (sensitivity, t) not in self._seg_cache]
        by_bucket: dict[int, list[str]] = {}
        for t in missing:
            by_bucket.setdefault(hash64(t) % self.num_buckets, []).append(t)
        sub = "postings" if sensitivity == "i" \
            else f"postings_{sensitivity}"
        post_root = os.path.join(self.index_dir, sub)
        fetched: dict[str, list[Segment]] = {t: [] for t in missing}
        for bucket, bterms in sorted(by_bucket.items()):
            path = os.path.join(post_root, f"bucket={bucket}")
            if not os.path.isdir(path):
                continue
            ds = pa_ds.dataset(path, format="parquet")
            tbl = ds.to_table(filter=pc.field("term").isin(bterms))
            for seg in Segment.from_table(tbl, codec=self.codec):
                fetched[seg.term].append(seg)
        for t, segs in fetched.items():
            segs.sort(key=lambda s: (s.first_doc, s.last_doc))
            if len(self._seg_cache) >= self._SEG_CACHE_MAX:
                self._seg_cache.pop(next(iter(self._seg_cache)))
            self._seg_cache[(sensitivity, t)] = segs
        return {t: self._seg_cache.get((sensitivity, t), [])
                for t in terms}
