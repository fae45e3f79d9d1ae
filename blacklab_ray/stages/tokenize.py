"""Tokenize stage: pages → per-doc term vectors (the forward index rows).

Ray-native analogue of BlackLab's per-document AnnotationWriter buffers +
forward index (engine/src/main/java/nl/inl/blacklab/index/annotated/
AnnotationWriter.java:41-57, forwardindex/AnnotationForwardIndex.java:12):
for each document we emit ONE row carrying the doc-level metadata plus its
aggregated term vector — ``terms:list<string>`` (unique terms, first-seen
order not required; grouped), ``tfs:list<int32>``, and
``pos:list<binary>`` (per-term delta+VByte position blobs). This row set
is simultaneously:

- the **forward index** artifact (doc → token info; powers KWIC,
  collocations, phrase verification),
- the **doc table** source (doc_id, url, lang, doc_len, norm),
- the pre-aggregated, batch-local **combiner** ahead of the postings
  shuffle (SURVEY §7: shuffle bytes ≈ postings size, not token count).

Everything is numpy/Arrow vectorized; the per-batch Python work is O(1)
calls, not O(rows).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from blacklab_ray.analysis.analyzers import tokenize_column
from blacklab_ray.codec.smallfloat import encode_lengths
from blacklab_ray.codec.vbyte import encode_position_lists


def hash64(s: str) -> int:
    """Stable 63-bit id from a string (doc_id = hash64(url)).

    Deterministic across runs/partitionings — the property BlackLab's
    pid-field lookup provides (docId independent of ingest order is what
    makes retries value-identical; SURVEY §4 stragglers row).
    """
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                          "big") & 0x7FFF_FFFF_FFFF_FFFF


def _varint_byte_lens(values: np.ndarray) -> np.ndarray:
    """Byte length each value takes under VByte (vectorized bit length)."""
    v = np.asarray(values, dtype=np.uint64)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = tmp >= (np.uint64(1) << np.uint64(shift))
        nbits[mask] += shift
        tmp[mask] >>= np.uint64(shift)
    nbits += 1
    return (nbits + 6) // 7


class TokenizeForwardIndex:
    """``map_batches`` actor: pages batch → forward-index rows.

    Input batch columns: ``text`` (+ ``url``/``doc_id``, optional
    ``warc_ts``/``lang``). Output: one row per doc with
    ``doc_id,url,lang,doc_len,norm,terms,tfs,pos``.
    """

    def __init__(self, id_column: str = "url",
                 paragraph_spans: bool = False,
                 sentence_spans: bool = False,
                 sensitive: bool = False,
                 analyzer: str = "standard",
                 annotations: tuple[str, ...] = (),
                 multivalue_column: str | None = None,
                 metadata_cols: tuple[str, ...] = (),
                 store_text: bool = False):
        from blacklab_ray.analysis.analyzers import get_analyzer
        self._id_column = id_column
        self._para = paragraph_spans
        self._sent = sentence_spans
        self._sensitive = sensitive
        self._analyzer = analyzer
        self._tokenize = get_analyzer(analyzer)
        # SECONDARY values at existing token positions (the reference's
        # position-increment-0 multi-value annotations: synonyms and
        # stemmed forms indexed at the same position, with the primary
        # value flagged in the payload and stored in the forward index —
        # AnnotationWriter.java:44-47, AddIsPrimaryValueToPayloadFilter
        # .java:28). Input: a list<struct<pos:int32,value:string>>
        # column; output: parallel terms_mv/tfs_mv/pos_mv fwd columns.
        # The fwd terms column stays PRIMARY-only (display/KWIC), while
        # the postings exchange folds the mv vector into the main
        # annotation's postings so queries match secondaries too.
        self._multivalue = multivalue_column
        # typed metadata fields (FieldType.java:5-7): named input
        # columns carried verbatim into the fwd rows; their declared
        # types live in meta.json and drive filter_docs_meta semantics
        self._metadata_cols = tuple(metadata_cols)
        # content-store analogue (ContentStore.java semantics one column
        # over): carry the (post-extraction) original text into fwd so
        # serving can return the stored original
        self._store_text = bool(store_text)
        # extra PARALLEL annotations (lemma/pos — the reference's
        # multi-annotation data model, AnnotatedField.java:14): each
        # name is a list<string> input column whose element i is the
        # annotation value of token i; alignment with the analyzer's
        # tokenization of `text` is the contract (checked per doc).
        self._annotations = tuple(annotations)

    def _paragraph_lens(self, text_col: pa.Array | pa.ChunkedArray,
                        n_docs: int,
                        pattern: str | None = None) -> pa.ListArray:
        """Token count per separator-delimited block, as list<int32> per
        doc.

        Extracted text uses one '\\n' between blocks (extract.py), and
        '\\n' is a token separator, so per-block token counts tile the
        doc's token stream exactly — the structural spans BlackLab gets
        from inline tags (SpanQueryTags), recovered here for tagless
        webtext. With a regex ``pattern``, blocks split on separator
        RUNS instead (sentence spans: '[.!?\\n]+' — all non-alnum, so
        still token separators and the tiling holds)."""
        if pattern is not None:
            paras = pc.split_pattern_regex(text_col, pattern=pattern)
        else:
            paras = pc.split_pattern(text_col, "\n")
        flat = pc.list_flatten(paras)
        para_parents = pc.list_parent_indices(paras).to_numpy(
            zero_copy_only=False)
        _, _, _, para_lens = tokenize_column(flat)
        counts = np.bincount(para_parents, minlength=n_docs)
        offsets = np.zeros(n_docs + 1, dtype=np.int32)
        offsets[1:] = np.cumsum(counts)
        return pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(para_lens, pa.int32()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from blacklab_ray.util import pin_worker_arrow_threads
        pin_worker_arrow_threads()
        parents, tokens, positions, doc_lens = self._tokenize(
            batch.column("text"))
        n_docs = batch.num_rows
        vec = self._term_vector(parents, tokens, positions, n_docs)

        # ---- doc-level columns
        if self._id_column == "doc_id" and "doc_id" in batch.column_names:
            doc_ids = batch.column("doc_id").cast(pa.int64())
            urls = (batch.column("url") if "url" in batch.column_names
                    else pa.array([str(i) for i in doc_ids.to_pylist()]))
        else:
            from blacklab_ray.util import hash64_batch
            doc_ids = pa.array(
                hash64_batch(batch.column("url")).view(np.int64),
                pa.int64())
            urls = batch.column("url")
        norm = encode_lengths(doc_lens)
        cols = {
            "doc_id": doc_ids,
            "url": urls,
            "lang": (batch.column("lang") if "lang" in batch.column_names
                     else pa.nulls(n_docs, pa.string())),
            "doc_len": pa.array(doc_lens, pa.int64()),
            "norm": pa.array(norm.astype(np.int32), pa.int32()),
            "terms": vec[0],
            "tfs": vec[1],
            "pos": vec[2],
        }
        if self._sensitive:
            # parallel case-SENSITIVE annotation (`word@s`,
            # MatchSensitivity.java:12-17) — same docs, own term vector
            from blacklab_ray.analysis.analyzers import (
                tokenize_column_sensitive,
            )
            sp, st, spos, _ = tokenize_column_sensitive(
                batch.column("text"))
            svec = self._term_vector(sp, st, spos, n_docs)
            cols["terms_s"] = svec[0]
            cols["tfs_s"] = svec[1]
            cols["pos_s"] = svec[2]
        for name in self._annotations:
            ann_col = batch.column(name).combine_chunks() \
                if isinstance(batch.column(name), pa.ChunkedArray) \
                else batch.column(name)
            flat = pc.list_flatten(ann_col)
            ap = pc.list_parent_indices(ann_col).to_numpy(
                zero_copy_only=False)
            alens = np.bincount(ap, minlength=n_docs).astype(np.int64)
            if not np.array_equal(alens, doc_lens):
                bad = int(np.flatnonzero(alens != doc_lens)[0])
                raise ValueError(
                    f"annotation {name!r} misaligned with tokenization "
                    f"at batch row {bad}: {int(alens[bad])} values vs "
                    f"{int(doc_lens[bad])} tokens")
            starts_a = np.zeros(n_docs, dtype=np.int64)
            np.cumsum(alens[:-1], out=starts_a[1:])
            apos = np.arange(ap.size, dtype=np.int64) - starts_a[ap]
            avec = self._term_vector(ap, flat, apos, n_docs)
            cols[f"terms_{name}"] = avec[0]
            cols[f"tfs_{name}"] = avec[1]
            cols[f"pos_{name}"] = avec[2]
        def _mv_vector(col_name: str):
            mv_col = batch.column(col_name).combine_chunks() \
                if isinstance(batch.column(col_name), pa.ChunkedArray) \
                else batch.column(col_name)
            mp = pc.list_parent_indices(mv_col).to_numpy(
                zero_copy_only=False)
            flat_mv = pc.list_flatten(mv_col)
            # secondary values are searchable through the ANALYZED
            # (insensitive) route like primaries ('The|DOH|ZZZ' —
            # TestIndex.java:118-121: query 'zzz' matches), so fold
            # them the same way
            from blacklab_ray.analysis.analyzers import \
                _normalize_array
            mv_vals = _normalize_array(flat_mv.field("value"))
            mv_pos = flat_mv.field("pos").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            # positions must exist in the doc (increment-0 attaches to a
            # real token position)
            if mv_pos.size and (mv_pos < 0).any():
                raise ValueError("negative multivalue position")
            bad = mv_pos >= doc_lens[mp]
            if bad.any():
                i = int(np.flatnonzero(bad)[0])
                raise ValueError(
                    f"multivalue position {int(mv_pos[i])} >= doc_len "
                    f"{int(doc_lens[mp[i]])} at batch row {int(mp[i])}")
            return self._term_vector(mp, mv_vals, mv_pos, n_docs,
                                     sort_positions=True)

        if self._multivalue and self._multivalue in batch.column_names:
            mvec = _mv_vector(self._multivalue)
            cols["terms_mv"] = mvec[0]
            cols["tfs_mv"] = mvec[1]
            cols["pos_mv"] = mvec[2]
        # NON-main-annotation multi-values (AnnotationWriter.java:
        # 246-343 indexes increment-0 secondaries on ANY annotation —
        # naf.blf.yaml's word_or_lemma): a `multi_<name>` input column
        # (list<struct<pos,value>>) rides the fwd rows as parallel
        # terms_mv_<name>/... vectors; the per-annotation postings
        # exchange folds them into that annotation's postings while
        # the primary terms_<name> stays the forward-index value.
        for name in self._annotations:
            mv_name = f"multi_{name}"
            if mv_name in batch.column_names:
                mvec = _mv_vector(mv_name)
                cols[f"terms_mv_{name}"] = mvec[0]
                cols[f"tfs_mv_{name}"] = mvec[1]
                cols[f"pos_mv_{name}"] = mvec[2]
        if "punct" in batch.column_names:
            # inter-token separators (punct-before-each-word, len
            # n_tokens+1) ride the forward index for faithful KWIC
            # rendering — fwd-only, never posted
            cols["punct"] = batch.column("punct")
        if "tags" in batch.column_names:
            # standoff structural spans with attributes (the reference
            # indexes these as starttag tokens + @attr__value tokens at
            # the same position, AnnotatedFieldNameUtil.java:93-106;
            # here they ride the forward index as a typed list column)
            cols["tag_spans"] = batch.column("tags")
        if self._para:
            cols["para_lens"] = self._paragraph_lens(
                batch.column("text"), n_docs)
        if self._sent:
            cols["sent_lens"] = self._paragraph_lens(
                batch.column("text"), n_docs, pattern="[.!?\n]+")
        if "warc_ts" in batch.column_names:
            cols["warc_ts"] = batch.column("warc_ts")
        for name in self._metadata_cols:
            if name in cols:
                continue   # built-ins (lang/url/...) already carried
            if name not in batch.column_names:
                raise KeyError(f"metadata field {name!r} not in input "
                               f"columns {batch.column_names}")
            cols[name] = batch.column(name)
        if self._store_text:
            cols["text"] = batch.column("text")
        return pa.table(cols)

    def _term_vector(self, parents, tokens, positions, n_docs,
                     sort_positions: bool = False):
        """Flat token stream → per-doc (terms, tfs, pos-blob) list
        columns (the grouped forward-index representation).

        ``sort_positions`` adds position as the innermost sort key —
        needed when the input triples are not already position-ascending
        per doc (standoff multi-values); the main token stream is
        scan-ordered so the extra key would be a no-op there."""
        # ---- group (doc, term) pairs: dictionary-encode tokens, then sort
        # by (doc, lexicographic term rank). Ranks — not raw dictionary
        # codes — make the per-doc term vector order independent of batch
        # composition (the determinism invariant: identical fwd bytes at
        # any batch size / parallelism).
        dict_arr = pc.dictionary_encode(tokens)
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        rank_of = np.empty(len(dict_arr.dictionary), dtype=np.int64)
        rank_of[pc.sort_indices(dict_arr.dictionary).to_numpy(
            zero_copy_only=False)] = np.arange(len(dict_arr.dictionary))
        codes = rank_of[codes]
        sorted_dict = pc.take(dict_arr.dictionary,
                              pc.sort_indices(dict_arr.dictionary))
        if sort_positions:
            order = np.lexsort((positions, codes, parents))
        else:
            order = np.lexsort((codes, parents))  # doc, then term rank
        sp = parents[order]
        sc = codes[order]
        spos = positions[order]
        if sp.size:
            new_group = np.empty(sp.size, dtype=bool)
            new_group[0] = True
            np.logical_or(sp[1:] != sp[:-1], sc[1:] != sc[:-1],
                          out=new_group[1:])
            group_starts = np.flatnonzero(new_group)
            tfs = np.diff(np.append(group_starts, sp.size)).astype(np.int64)
        else:
            group_starts = np.empty(0, dtype=np.int64)
            tfs = np.empty(0, dtype=np.int64)

        # ---- per-(doc,term) position blobs, one vectorized encode + slice
        stream = encode_position_lists(spos, tfs) if sp.size else b""
        # byte length per delta value, summed per group -> blob offsets
        if sp.size:
            deltas = np.empty(spos.size, dtype=np.int64)
            np.subtract(spos[1:], spos[:-1], out=deltas[1:])
            deltas[0] = spos[0]
            deltas[group_starts] = spos[group_starts]
            vlens = _varint_byte_lens(deltas)
            grp_bytes = np.add.reduceat(vlens, group_starts)
        else:
            grp_bytes = np.empty(0, dtype=np.int64)
        blob_offsets = np.zeros(grp_bytes.size + 1, dtype=np.int32)
        blob_offsets[1:] = np.cumsum(grp_bytes)
        pos_values = pa.Array.from_buffers(
            pa.binary(), grp_bytes.size,
            [None, pa.py_buffer(blob_offsets.tobytes()),
             pa.py_buffer(stream)])

        # ---- per-doc list offsets over the (doc,term) groups
        groups_per_doc = np.bincount(sp[group_starts], minlength=n_docs) \
            if sp.size else np.zeros(n_docs, dtype=np.int64)
        doc_offsets = np.zeros(n_docs + 1, dtype=np.int32)
        doc_offsets[1:] = np.cumsum(groups_per_doc)
        off_arr = pa.array(doc_offsets, pa.int32())

        term_values = pc.take(sorted_dict, pa.array(sc[group_starts]))
        terms_list = pa.ListArray.from_arrays(off_arr,
                                              term_values.combine_chunks()
                                              if isinstance(term_values,
                                                            pa.ChunkedArray)
                                              else term_values)
        tfs_list = pa.ListArray.from_arrays(off_arr,
                                            pa.array(tfs, pa.int32()))
        pos_list = pa.ListArray.from_arrays(off_arr, pos_values)
        return terms_list, tfs_list, pos_list
