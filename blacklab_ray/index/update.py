"""Incremental index maintenance: append / delete / update documents.

Parity with BlackLab's Indexer.index()/update()/delete-by-pid lifecycle
(engine/src/main/java/nl/inl/blacklab/index/Indexer.java:159-219,
IndexerImpl.delete): new documents become *additional* posting segments —
exactly how Lucene adds segments without touching existing ones — and the
query side's per-term k-way segment merge (reader.segments) absorbs them
with no code change. Deletes are tombstones (doc_id set) filtered at
scoring time; a later compaction (round 2) can fold them in. Corpus
statistics keep counting tombstoned docs until compaction, matching
Lucene's deleted-docs-until-merge behavior.

Updates re-add a url under a new generation-salted doc_id
(hash64(f"{url}@g{gen}")) and tombstone the previous id, so the
content-addressed id scheme stays deterministic.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from blacklab_ray.index.build import BuildParams, _fresh_dir
from blacklab_ray.index.exchange import run_postings_exchange
from blacklab_ray.index.idspace import (
    AUTO_RESOLVE_MIN_DOCS as _AUTO_RESOLVE_MIN_DOCS,
)
from blacklab_ray.stages.extract import HtmlExtractor
from blacklab_ray.stages.tokenize import TokenizeForwardIndex, hash64


def _corpus_n_docs(index_dir: str) -> int:
    """Current corpus size from meta.json (drives the "auto" threshold
    for incremental doc-id collision resolution)."""
    p = os.path.join(index_dir, "meta.json")
    if os.path.exists(p):
        with open(p) as f:
            return int(json.load(f).get("n_docs") or 0)
    return 0


def _load_updates(index_dir: str) -> dict:
    p = os.path.join(index_dir, "updates.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"generation": 0, "tombstones": []}


def _save_updates(index_dir: str, upd: dict) -> None:
    p = os.path.join(index_dir, "updates.json")
    with open(p + ".tmp", "w") as f:
        json.dump(upd, f)
    os.replace(p + ".tmp", p)


def _inherit_layout(index_dir: str, params: BuildParams) -> BuildParams:
    """Override layout-affecting params from the index's recorded build
    params (meta.json['params']). An update run with caller defaults must
    not write segments under a different num_buckets/n_salts modulus than
    the base index — the reader prunes by meta.json's layout and would
    silently miss them."""
    meta_p = os.path.join(index_dir, "meta.json")
    if os.path.exists(meta_p):
        with open(meta_p) as f:
            rec = json.load(f).get("params") or {}
        for k in ("num_buckets", "n_salts", "block_size",
                  "max_seg_postings", "paragraph_spans",
                  "sentence_spans", "id_column", "codec",
                  "exchange", "sensitive", "analyzer", "store_text"):
            if k in rec:
                setattr(params, k, rec[k])
        if "annotations" in rec:
            params.annotations = tuple(rec["annotations"] or ())
        if "hot_terms" in rec:
            params.hot_terms = (tuple(rec["hot_terms"])
                                if rec["hot_terms"] else None)
        if "metadata_fields" in rec:
            # typed metadata columns must keep flowing into the fwd
            # rows on append, or the delta files drop the columns and
            # the fwd dataset schema splits
            params.metadata_fields = tuple(
                tuple(x) for x in (rec["metadata_fields"] or ()))
    return params


def _ensure_terms_parts(index_dir: str) -> None:
    """Backfill terms_parts/ from the existing postings when absent.

    The exchange='sort' build path writes no terms_parts; without this,
    _refresh_terms_and_meta after an add would overwrite the global terms
    table with delta-only stats (base-corpus terms would vanish)."""
    tdir = os.path.join(index_dir, "terms_parts")
    if os.path.isdir(tdir) and any(f.endswith(".parquet")
                                   for f in os.listdir(tdir)):
        return
    post_dir = os.path.join(index_dir, "postings")
    import pyarrow.dataset as pads
    dset = pads.dataset(post_dir, partitioning="hive")
    if "term" in dset.schema.names:
        tbl = dset.to_table(columns=["term", "df_seg", "ctf_seg"])
        stats = tbl.group_by("term").aggregate(
            [("df_seg", "sum"), ("ctf_seg", "sum")])
    else:
        # zero-doc base (index created empty): no postings yet —
        # backfill a schema'd empty part so delta stats can merge
        stats = pa.table({
            "term": pa.array([], pa.string()),
            "df_seg_sum": pa.array([], pa.int64()),
            "ctf_seg_sum": pa.array([], pa.int64()),
        })
    os.makedirs(tdir, exist_ok=True)
    out = os.path.join(tdir, "part-backfill.parquet")
    pq.write_table(stats, out + ".tmp")
    os.replace(out + ".tmp", out)


def _refresh_terms_table(index_dir: str, parts_name: str,
                         out_name: str) -> "object":
    import pyarrow as pa
    parts = pq.read_table(os.path.join(index_dir, parts_name))
    gb = parts.group_by("term").aggregate(
        [("df_seg_sum", "sum"), ("ctf_seg_sum", "sum")])
    stats = pa.table({
        "term": gb["term"],
        "doc_freq": gb["df_seg_sum_sum"].cast(pa.int64()),
        "collection_tf": gb["ctf_seg_sum_sum"].cast(pa.int64()),
    })
    terms_dir = os.path.join(index_dir, out_name)
    _fresh_dir(terms_dir)
    pq.write_table(stats, os.path.join(terms_dir, "terms.parquet"))
    return stats


def _refresh_terms_and_meta(index_dir: str) -> None:
    """Recompute terms table(s) + meta from all exchange part stats."""
    import pyarrow as pa
    stats = _refresh_terms_table(index_dir, "terms_parts", "terms")
    for d in sorted(os.listdir(index_dir)):
        if d.startswith("terms_parts_") and \
                os.path.isdir(os.path.join(index_dir, d)):
            annot = d[len("terms_parts_"):]
            _refresh_terms_table(index_dir, d, f"terms_{annot}")
    fwd_dir = os.path.join(index_dir, "fwd")
    n_docs = sum(pq.read_metadata(os.path.join(fwd_dir, f)).num_rows
                 for f in os.listdir(fwd_dir) if f.endswith(".parquet"))
    total_tokens = int(pa.compute.sum(stats["collection_tf"]).as_py() or 0)
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    meta.update(n_docs=n_docs, total_tokens=total_tokens,
                avg_doc_len=total_tokens / max(n_docs, 1))
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)


def add_documents(index_dir: str, source, params: BuildParams | None = None,
                  generation: int | None = None) -> dict:
    """Append documents to an existing index (new segments, no rewrite).

    ``source``: path(s) to pages Parquet or a Dataset (same schema as the
    original build). Returns the update record.
    """
    params = _inherit_layout(index_dir, params or BuildParams())
    upd = _load_updates(index_dir)
    gen = generation if generation is not None else upd["generation"] + 1
    fwd_dir = os.path.join(index_dir, "fwd")
    post_dir = os.path.join(index_dir, "postings")

    if isinstance(source, str):
        source = [source]
    if isinstance(source, list):
        paths = []
        for p in source:
            if os.path.isdir(p):
                paths += [os.path.join(p, f) for f in sorted(os.listdir(p))
                          if f.endswith(".parquet")]
            else:
                paths.append(p)
        ds = ray.data.read_parquet(paths)
    else:
        ds = source

    t0 = time.perf_counter()
    before = set(os.listdir(fwd_dir))
    if params.extract_html:
        ds = ds.map_batches(HtmlExtractor(trust_text=params.trust_text),
                            batch_format="pyarrow",
                            batch_size=params.batch_size)
    ds = ds.map_batches(TokenizeForwardIndex(
        id_column=params.id_column,
        paragraph_spans=params.paragraph_spans,
        sentence_spans=params.sentence_spans,
        sensitive=params.sensitive,
        analyzer=params.analyzer,
        annotations=tuple(params.annotations),
        metadata_cols=tuple(n for n, _t in params.metadata_fields),
        store_text=params.store_text),
                        batch_format="pyarrow",
                        batch_size=params.batch_size)
    ds.write_parquet(fwd_dir)  # appends new uuid-named files
    new_files = sorted(set(os.listdir(fwd_dir)) - before)
    return _index_new_fwd_files(index_dir, params, upd, gen, new_files,
                                op="add", t0=t0)


def _index_new_fwd_files(index_dir: str, params: BuildParams, upd: dict,
                         gen: int, new_files: list[str], op: str,
                         t0: float) -> dict:
    """Shared tail of add/merge: id resolution + generation-suffixed
    postings exchange over already-written fwd delta files + terms/meta
    refresh + update log."""
    fwd_dir = os.path.join(index_dir, "fwd")
    post_dir = os.path.join(index_dir, "postings")

    # 63-bit id-collision resolution for the delta (idspace.py):
    # incumbents keep their ids, colliding new urls rehash. Must run
    # BEFORE the hard links below — the rewrite replaces directory
    # entries, and the exchange must read the resolved ids.
    if getattr(params, "resolve_doc_ids", "auto") is True or (
            getattr(params, "resolve_doc_ids", "auto") == "auto"
            and _corpus_n_docs(index_dir) >= _AUTO_RESOLVE_MIN_DOCS):
        from blacklab_ray.index.idspace import resolve_added_doc_ids
        resolve_added_doc_ids(index_dir, fwd_dir, new_files)

    # exchange over only the new fwd files; part files are suffixed by
    # generation so they never collide with existing segment files
    _ensure_terms_parts(index_dir)
    tmp_fwd = os.path.join(index_dir, f"_delta_fwd_g{gen}")
    _fresh_dir(tmp_fwd)
    for f in new_files:
        os.link(os.path.join(fwd_dir, f), os.path.join(tmp_fwd, f))
    info = run_postings_exchange(
        tmp_fwd, post_dir,
        num_buckets=params.num_buckets, n_salts=params.n_salts,
        hot_terms=params.hot_terms, block_size=params.block_size,
        max_seg_postings=params.max_seg_postings,
        codec=params.codec,
        part_suffix=f"-g{gen}")
    extra_annots = (["s"] if params.sensitive else []) \
        + list(params.annotations)
    for annot in extra_annots:
        run_postings_exchange(
            tmp_fwd, os.path.join(index_dir, f"postings_{annot}"),
            num_buckets=params.num_buckets, n_salts=params.n_salts,
            hot_terms=params.hot_terms, block_size=params.block_size,
            max_seg_postings=params.max_seg_postings,
            codec=params.codec,
            part_suffix=f"-g{gen}",
            annot_cols=(f"terms_{annot}", f"tfs_{annot}",
                        f"pos_{annot}"),
            terms_parts_name=f"terms_parts_{annot}")
    import shutil
    shutil.rmtree(tmp_fwd)
    _refresh_terms_and_meta(index_dir)

    upd["generation"] = gen
    upd.setdefault("log", []).append({
        "gen": gen, "op": op, "fwd_files": len(new_files),
        "postings": sum(v["postings"] for v in info.values()),
        "seconds": round(time.perf_counter() - t0, 3),
    })
    _save_updates(index_dir, upd)
    return upd["log"][-1]


def merge_indexes(dst_index: str, src_index: str,
                  params: BuildParams | None = None) -> dict:
    """Merge a separately built index into ``dst_index`` — the Lucene
    ``IndexWriter.addIndexes`` analogue (BlackLab's multi-indexer runs
    share one IndexWriter, IndexerImpl.java:582; independent builds
    merge via Lucene's addIndexes).

    Reuses the source's FORWARD shards verbatim (hard links when the
    source has no tombstones; otherwise a filtered rewrite drops its
    deleted docs) — no re-extraction or re-tokenization, the expensive
    analysis half of a build. Postings are re-exchanged into the
    destination's bucket/salt layout as one new generation, so the
    merged index is indistinguishable from one built over the union
    (and compacts like any generation). Id collisions across corpora
    resolve exactly like an add (idspace.py).

    Requires compatible analysis AND fwd-schema params (analyzer /
    sensitivity / annotations / metadata_fields / span stores /
    id_column) — checked against both metas; a mismatch would split the
    fwd dataset schema (see _inherit_layout's warning).

    Edge semantics:
    - src id_remap.json entries for surviving docs are imported into
      the destination's remap (dst entries win on url conflict), so
      delete/update-by-url keeps addressing collision-remapped merged
      docs correctly.
    - a live src doc whose id is tombstoned in dst (dst deleted that
      url, src re-indexed it) is RESURRECTED under the
      generation-salted url ``<url>@g{gen}`` — the update_documents
      re-add convention — instead of being silently hidden by the dst
      tombstone.
    - a crashed merge leaves ``merge-g{gen}-*`` partials; re-running
      the merge removes them first (the generation only advances on
      success), so the operation is retry-idempotent.
    """
    params = _inherit_layout(dst_index, params or BuildParams())
    with open(os.path.join(src_index, "meta.json")) as f:
        src_params = json.load(f).get("params") or {}

    def _norm(v):
        return tuple(tuple(x) if isinstance(x, list) else x for x in v) \
            if isinstance(v, (list, tuple)) else v
    for k in ("analyzer", "sensitive", "annotations", "metadata_fields",
              "paragraph_spans", "sentence_spans", "id_column",
              "multivalue_column", "store_text"):
        if k in src_params and _norm(getattr(params, k)) \
                != _norm(src_params[k]):
            raise ValueError(
                f"merge_indexes: incompatible {k!r}: dst="
                f"{getattr(params, k)!r} src={src_params[k]!r}")

    from blacklab_ray.index.idspace import load_remap, save_remap
    from blacklab_ray.stages.tokenize import hash64
    upd = _load_updates(dst_index)
    gen = upd["generation"] + 1
    src_upd = _load_updates(src_index)
    dead = set(src_upd.get("tombstones") or [])
    dst_tombs = set(upd.get("tombstones") or [])
    src_fwd = os.path.join(src_index, "fwd")
    dst_fwd = os.path.join(dst_index, "fwd")
    t0 = time.perf_counter()
    # retry-idempotence: drop partials from a crashed attempt at this
    # generation (the generation counter only advances on success)
    for f in os.listdir(dst_fwd):
        if f.startswith(f"merge-g{gen}-"):
            os.unlink(os.path.join(dst_fwd, f))
    new_files = []
    for f in sorted(os.listdir(src_fwd)):
        if not f.endswith(".parquet"):
            continue
        out = f"merge-g{gen}-{f}"
        if dead or dst_tombs:
            import pyarrow.compute as pc
            t = pq.read_table(os.path.join(src_fwd, f))
            if dead:
                t = t.filter(pc.invert(pc.is_in(
                    t["doc_id"], value_set=pa.array(sorted(dead),
                                                    pa.int64()))))
            if t.num_rows == 0:
                continue
            if dst_tombs:
                ids = t["doc_id"].to_numpy(zero_copy_only=False)
                hit = [i for i, d in enumerate(ids.tolist())
                       if d in dst_tombs]
                if hit:
                    # resurrect under the generation-salted url — the
                    # dst tombstone must keep hiding dst's OWN deleted
                    # fwd rows, so the merged doc needs a fresh id
                    urls = t["url"].to_pylist()
                    new_ids = ids.copy()
                    for i in hit:
                        urls[i] = f"{urls[i]}@g{gen}"
                        new_ids[i] = hash64(urls[i])
                    t = t.set_column(
                        t.schema.get_field_index("doc_id"), "doc_id",
                        pa.array(new_ids, pa.int64()))
                    t = t.set_column(
                        t.schema.get_field_index("url"), "url",
                        pa.array(urls, pa.string()))
            pq.write_table(t, os.path.join(dst_fwd, out + ".tmp"))
            os.replace(os.path.join(dst_fwd, out + ".tmp"),
                       os.path.join(dst_fwd, out))
        else:
            os.link(os.path.join(src_fwd, f),
                    os.path.join(dst_fwd, out))
        new_files.append(out)
    # import the source's collision remap for surviving docs so
    # url→id lookups (delete/update by url) keep working; dst entries
    # win on conflict (incumbent rule), resurrected docs are reached
    # via the salted-generation probe instead. Must happen BEFORE the
    # exchange so resolve_added_doc_ids composes (it loads/updates/
    # saves the same remap).
    src_remap = load_remap(src_index)
    if src_remap:
        dst_remap = load_remap(dst_index)
        changed = False
        for u, x in src_remap.items():
            if x not in dead and x not in dst_tombs \
                    and u not in dst_remap:
                dst_remap[u] = x
                changed = True
        if changed:
            save_remap(dst_index, dst_remap)
    return _index_new_fwd_files(dst_index, params, upd, gen, new_files,
                                op="merge", t0=t0)


def delete_documents(index_dir: str, doc_ids=None, urls=None) -> dict:
    """Tombstone documents by doc_id or url (BlackLab delete-by-pid).

    Deleting by url also tombstones every generation-salted re-add of
    that url ('<url>@g{g}'): update_documents re-adds content under
    salted ids, and delete-by-pid semantics must remove the live
    generation too, not just the original."""
    from blacklab_ray.index.idspace import doc_id_for_url, load_remap
    upd = _load_updates(index_dir)
    remap = load_remap(index_dir)
    ids = set(int(i) for i in (doc_ids or []))
    meta_p = os.path.join(index_dir, "meta.json")
    id_column = "url"
    if urls and os.path.exists(meta_p):
        with open(meta_p) as f:
            id_column = (json.load(f).get("params") or {}) \
                .get("id_column", "url")
    if urls and id_column != "url":
        # user-supplied id space: the hash64(url) convention does not
        # apply — resolve urls THROUGH the index (one url-filtered
        # pushdown gather over the fwd doc table, never a full scan)
        import pyarrow.compute as pc
        import pyarrow.dataset as pa_ds
        fwd = pa_ds.dataset(os.path.join(index_dir, "fwd"),
                            format="parquet")
        salted = [f"{u}@g{g}" for u in urls
                  for g in range(1, upd.get("generation", 0) + 1)]
        tbl = fwd.to_table(
            columns=["doc_id"],
            filter=pc.field("url").isin(list(urls) + salted))
        ids.update(int(x) for x in tbl["doc_id"].to_pylist())
    else:
        for u in (urls or []):
            # collision-resolved ids (idspace.py) take precedence over
            # the plain hash — delete-by-pid must hit the id actually
            # indexed
            ids.add(doc_id_for_url(u, remap))
            for g in range(1, upd.get("generation", 0) + 1):
                ids.add(doc_id_for_url(f"{u}@g{g}", remap))
    upd["tombstones"] = sorted(set(upd["tombstones"]) | ids)
    _save_updates(index_dir, upd)
    return {"op": "delete", "n_tombstones": len(upd["tombstones"])}


def update_documents(index_dir: str, pages_table,
                     params: BuildParams | None = None) -> dict:
    """Replace documents by url: tombstone the current ids, re-add the
    new contents under generation-salted doc_ids."""
    import pyarrow as pa
    params = params or BuildParams()
    upd = _load_updates(index_dir)
    gen = upd["generation"] + 1
    from blacklab_ray.index.idspace import doc_id_for_url, load_remap
    remap = load_remap(index_dir)
    urls = pages_table["url"].to_pylist()
    # tombstone every previous generation of these urls
    olds = [doc_id_for_url(u, remap) for u in urls]
    for g in range(1, gen):
        olds += [doc_id_for_url(f"{u}@g{g}", remap) for u in urls]
    delete_documents(index_dir, doc_ids=olds)
    salted = pages_table.set_column(
        pages_table.schema.get_field_index("url"), "url",
        pa.array([f"{u}@g{gen}" for u in urls], pa.string()))
    ds = ray.data.from_arrow(salted)
    return add_documents(index_dir, ds, params, generation=gen)


def _segment_posting_rows(row: dict, gkey: int,
                          tomb_arr=None, codec: str = "vbyte") -> "object":
    """One segment row → (gkey, doc_id, tf, norm, posbin) posting rows,
    optionally dropping tombstoned docs — the decode half of a segment
    merge (inverse of build_segments). ``codec`` must match the codec
    the blocks were written with (meta.json params)."""
    import numpy as np
    import pyarrow as pa

    from blacklab_ray.codec.vbyte import (
        decode_position_lists, delta_decode, vbyte_decode,
    )
    from blacklab_ray.stages.tokenize import _varint_byte_lens
    docs_l, tfs_l, norms_l, blobs = [], [], [], []
    for blk in row["blocks"]:
        if codec == "pfor":
            from blacklab_ray.codec.pfor import decode_span
            one_n = np.array([blk["n"]], dtype=np.int64)
            d = np.cumsum(decode_span(
                blk["docs"], np.array([0, len(blk["docs"])]),
                one_n).astype(np.int64))
            tf = decode_span(
                blk["tfs"], np.array([0, len(blk["tfs"])]),
                one_n).astype(np.int64)
        else:
            d = delta_decode(blk["docs"])
            tf = vbyte_decode(blk["tfs"]).astype(np.int64)
        nm = np.frombuffer(blk["norms"], dtype=np.uint8)
        pos = decode_position_lists(blk["pos"], tf)
        # per-posting byte spans inside the block's pos blob
        gstarts = np.zeros(tf.size, dtype=np.int64)
        np.cumsum(tf[:-1], out=gstarts[1:])
        deltas = np.empty(pos.size, dtype=np.int64)
        if pos.size:
            deltas[1:] = pos[1:] - pos[:-1]
            deltas[gstarts] = pos[gstarts]
        vlens = _varint_byte_lens(deltas) if pos.size else \
            np.empty(0, np.int64)
        per_post = np.add.reduceat(vlens, gstarts) if tf.size else \
            np.empty(0, np.int64)
        offs = np.zeros(tf.size + 1, dtype=np.int64)
        np.cumsum(per_post, out=offs[1:])
        blob = blk["pos"]
        keep = np.ones(d.size, dtype=bool) if tomb_arr is None else \
            ~np.isin(d, tomb_arr)
        for j in np.flatnonzero(keep).tolist():
            blobs.append(blob[offs[j]:offs[j + 1]])
        docs_l.append(d[keep])
        tfs_l.append(tf[keep])
        norms_l.append(nm[keep])
    docs = np.concatenate(docs_l) if docs_l else np.empty(0, np.int64)
    return pa.table({
        "gkey": pa.array(np.full(docs.size, gkey), pa.int64()),
        "term": pa.array([row["term"]] * docs.size, pa.string()),
        "doc_id": pa.array(docs, pa.int64()),
        "tf": pa.array(np.concatenate(tfs_l) if tfs_l
                       else np.empty(0, np.int64), pa.int64()),
        "norm": pa.array((np.concatenate(norms_l) if norms_l
                          else np.empty(0, np.uint8)).astype(np.int32),
                         pa.int32()),
        "posbin": pa.array(blobs, pa.binary()),
    })


def compact_generations(index_dir: str,
                        max_files_per_bucket: int = 4) -> dict:
    """Size-tiered generation merge (the Lucene tiered-merge analogue,
    vs compact_index's full rebuild): buckets whose part-file count
    exceeds the tier threshold — or that may contain tombstoned docs —
    are re-packed in parallel Ray tasks (decode → drop tombstones →
    build_segments per salt group). Cold buckets are NOT touched.
    Folds tombstones in and re-derives terms/meta afterwards."""
    import numpy as np
    import pyarrow as pa

    from blacklab_ray.index.postings import build_segments
    params = _inherit_layout(index_dir, BuildParams())
    upd = _load_updates(index_dir)
    tombs = np.array(sorted(upd.get("tombstones", [])), dtype=np.int64)
    t0 = time.perf_counter()

    @ray.remote
    def merge_bucket(bucket_dir: str, bucket: int, n_salts: int,
                     block_size: int, max_seg: int, tomb,
                     codec: str) -> int:
        import pyarrow.parquet as _pq
        files = sorted(os.path.join(bucket_dir, f)
                       for f in os.listdir(bucket_dir)
                       if f.endswith(".parquet"))
        segs = pa.concat_tables([_pq.read_table(f) for f in files])
        out_parts = []
        for salt in sorted(set(segs["salt"].to_pylist())):
            sub = segs.filter(pa.compute.equal(segs["salt"], salt))
            gkey = bucket * n_salts + salt
            rows = pa.concat_tables(
                [_segment_posting_rows(r, gkey,
                                       tomb if tomb.size else None,
                                       codec=codec)
                 for r in sub.to_pylist()])
            if rows.num_rows:
                out_parts.append(build_segments(
                    rows, block_size, max_seg, n_salts, codec=codec))
        out = pa.concat_tables(out_parts) if out_parts else None
        tier_path = os.path.join(bucket_dir, "part-tier0.parquet")
        if out is not None and out.num_rows:
            _pq.write_table(out.drop_columns(["bucket"]),
                            tier_path + ".tmp", row_group_size=1024)
            os.replace(tier_path + ".tmp", tier_path)
        for f in files:
            if f != tier_path:
                os.remove(f)
        return out.num_rows if out is not None else 0

    merged = {}
    # ALL postings partitions: base, sensitive (postings_s) AND every
    # parallel-annotation partition (postings_lemma, ...) — otherwise
    # tombstoned docs stay matchable via [lemma="..."] after the
    # tombstone list is cleared below (ADVICE r2 #1)
    all_postings = sorted(
        d for d in os.listdir(index_dir)
        if (d == "postings" or d.startswith("postings_"))
        and os.path.isdir(os.path.join(index_dir, d)))
    for sub in all_postings:
        root = os.path.join(index_dir, sub)
        if not os.path.isdir(root):
            continue
        tasks = {}
        for bdir in sorted(os.listdir(root)):
            if not bdir.startswith("bucket="):
                continue
            bucket = int(bdir.split("=")[1])
            full = os.path.join(root, bdir)
            n_files = sum(f.endswith(".parquet")
                          for f in os.listdir(full))
            if n_files <= max_files_per_bucket and tombs.size == 0:
                continue
            tasks[f"{sub}/{bdir}"] = merge_bucket.remote(
                full, bucket, params.n_salts, params.block_size,
                params.max_seg_postings, tombs, params.codec)
        for k, r in zip(tasks, ray.get(list(tasks.values()))):
            merged[k] = r

    if tombs.size:
        # fold tombstones out of the forward index too, then re-derive
        # stats from the re-packed postings
        tomb_pa = pa.array(tombs, pa.int64())
        fwd_dir = os.path.join(index_dir, "fwd")
        ds = ray.data.read_parquet(fwd_dir)
        ds = ds.map_batches(
            lambda t: t.filter(pa.compute.invert(pa.compute.is_in(
                t["doc_id"], value_set=tomb_pa))),
            batch_format="pyarrow")
        new_fwd = os.path.join(index_dir, "fwd_compacted")
        _fresh_dir(new_fwd)
        ds.write_parquet(new_fwd)
        import shutil
        shutil.rmtree(fwd_dir)
        os.replace(new_fwd, fwd_dir)
        # regenerate per-part stats from the compacted postings — for
        # EVERY postings partition incl. annotations (ADVICE r2 #1)
        for sub in all_postings:
            parts_name = ("terms_parts" if sub == "postings"
                          else "terms_parts_" + sub[len("postings_"):])
            pdir = os.path.join(index_dir, parts_name)
            if os.path.isdir(pdir):
                import shutil as _sh
                _sh.rmtree(pdir)
        _ensure_terms_parts(index_dir)
        for sub in all_postings:
            if sub == "postings":
                continue
            _ensure_terms_parts_for(
                index_dir, sub,
                "terms_parts_" + sub[len("postings_"):])
        _refresh_terms_and_meta(index_dir)
        upd["tombstones"] = []
    rec = {"op": "compact_tier", "buckets_merged": len(merged),
           "seconds": round(time.perf_counter() - t0, 3)}
    upd.setdefault("log", []).append(rec)
    _save_updates(index_dir, upd)
    return rec


def _ensure_terms_parts_for(index_dir: str, postings_name: str,
                            parts_name: str) -> None:
    import pyarrow.dataset as pads
    dset = pads.dataset(os.path.join(index_dir, postings_name),
                        partitioning="hive")
    tbl = dset.to_table(columns=["term", "df_seg", "ctf_seg"])
    stats = tbl.group_by("term").aggregate(
        [("df_seg", "sum"), ("ctf_seg", "sum")])
    tdir = os.path.join(index_dir, parts_name)
    os.makedirs(tdir, exist_ok=True)
    out = os.path.join(tdir, "part-backfill.parquet")
    pq.write_table(stats, out + ".tmp")
    os.replace(out + ".tmp", out)


def compact_index(index_dir: str, params: BuildParams | None = None) -> dict:
    """Fold tombstones in and merge generation segments (the Lucene
    merge/expunge-deletes analogue): filter deleted docs out of the
    forward index, rebuild the postings exchange from the surviving
    rows, and reset the tombstone list. Statistics become exact again.
    """
    import pyarrow as pa

    params = _inherit_layout(index_dir, params or BuildParams())
    upd = _load_updates(index_dir)
    tombs = set(upd.get("tombstones", []))
    fwd_dir = os.path.join(index_dir, "fwd")
    post_dir = os.path.join(index_dir, "postings")
    t0 = time.perf_counter()

    if tombs:
        tomb_arr = pa.array(sorted(tombs), pa.int64())
        ds = ray.data.read_parquet(fwd_dir)
        ds = ds.map_batches(
            lambda t: t.filter(pa.compute.invert(pa.compute.is_in(
                t["doc_id"], value_set=tomb_arr))),
            batch_format="pyarrow")
        new_fwd = os.path.join(index_dir, "fwd_compacted")
        _fresh_dir(new_fwd)
        ds.write_parquet(new_fwd)
        import shutil
        shutil.rmtree(fwd_dir)
        os.replace(new_fwd, fwd_dir)

    _fresh_dir(post_dir)
    _fresh_dir(os.path.join(index_dir, "terms_parts"))
    run_postings_exchange(
        fwd_dir, post_dir,
        num_buckets=params.num_buckets, n_salts=params.n_salts,
        hot_terms=params.hot_terms, block_size=params.block_size,
        max_seg_postings=params.max_seg_postings,
        codec=params.codec)
    for annot in (["s"] if params.sensitive else []) \
            + list(params.annotations):
        _fresh_dir(os.path.join(index_dir, f"postings_{annot}"))
        _fresh_dir(os.path.join(index_dir, f"terms_parts_{annot}"))
        run_postings_exchange(
            fwd_dir, os.path.join(index_dir, f"postings_{annot}"),
            num_buckets=params.num_buckets, n_salts=params.n_salts,
            hot_terms=params.hot_terms, block_size=params.block_size,
            max_seg_postings=params.max_seg_postings,
            codec=params.codec,
            annot_cols=(f"terms_{annot}", f"tfs_{annot}",
                        f"pos_{annot}"),
            terms_parts_name=f"terms_parts_{annot}")
    _refresh_terms_and_meta(index_dir)
    upd["tombstones"] = []
    upd.setdefault("log", []).append({
        "gen": upd["generation"], "op": "compact",
        "removed": len(tombs),
        "seconds": round(time.perf_counter() - t0, 3)})
    _save_updates(index_dir, upd)
    return upd["log"][-1]


def sync_snapshot(index_dir: str, new_source,
                  params: BuildParams | None = None,
                  old_source=None) -> dict:
    """Bring an index built from snapshot A in line with snapshot B:
    diff the snapshots by content (``docsops.snapshot_diff``), then
    delete removed docs, ``update_documents`` changed ones, and
    ``add_documents`` new ones — the maintenance loop a continuous
    crawl runs per capture. Snapshots are ``url``-keyed with a
    ``text`` column (the index update lifecycle is url-addressed).

    ``old_source`` defaults to the index's OWN content store (a
    ``store_text`` build: fwd ``url``/``text``, tombstoned docs
    excluded) — pass the old snapshot explicitly for store-less
    indexes. Caveat: docs previously replaced via update_documents
    live under generation-salted urls and will re-diff as
    removed+added; compaction normalizes them away.

    Scale shape: the diff is the two-snapshot shuffle of slim hash
    rows (the content-store old side STREAMS through a pruned
    read + vectorized tombstone mask, never a driver load); the new
    snapshot is scanned ONCE to collect the churn rows, and only the
    DIFF SET (added/changed/removed keys and their new rows) is
    driver-materialized — sized to the day\'s churn, not the corpus.
    Bulk re-syncs (diff comparable to corpus size) should rebuild.
    """
    from blacklab_ray.pipelines.docsops import snapshot_diff
    params = _inherit_layout(index_dir, params or BuildParams())
    new_ds = (ray.data.read_parquet(new_source)
              if isinstance(new_source, str) else new_source)
    if old_source is None:
        import pyarrow.dataset as pa_ds
        fwd_dir = os.path.join(index_dir, "fwd")
        if "text" not in pa_ds.dataset(fwd_dir,
                                       format="parquet").schema.names:
            raise ValueError(
                "sync_snapshot without old_source needs a store_text "
                "index (the content store IS the old snapshot); pass "
                "old_source for store-less indexes")
        upd0 = _load_updates(index_dir)
        tomb_arr = pa.array(sorted(upd0.get("tombstones") or []),
                            pa.int64())

        def _live(t: pa.Table) -> pa.Table:
            if len(tomb_arr):
                t = t.filter(pa.compute.invert(pa.compute.is_in(
                    t["doc_id"], value_set=tomb_arr)))
            return t.select(["url", "text"])

        old_ds = ray.data.read_parquet(
            fwd_dir, columns=["doc_id", "url", "text"]) \
            .map_batches(_live, batch_format="pyarrow")
    else:
        old_ds = (ray.data.read_parquet(old_source)
                  if isinstance(old_source, str) else old_source)

    diff = snapshot_diff(old_ds, new_ds).to_pandas()
    removed = diff.loc[diff.status == "removed", "url"].tolist()
    changed = set(diff.loc[diff.status == "changed", "url"])
    added = set(diff.loc[diff.status == "added", "url"])
    out = {"op": "sync", "removed": len(removed),
           "changed": len(changed), "added": len(added)}
    if removed:
        delete_documents(index_dir, urls=removed)

    if changed or added:
        # ONE scan of the new snapshot collects every churn row
        # (diff-sized result; the broadcast key set is churn-sized)
        churn_ref = ray.put(changed | added)

        def _keep_churn(t: pa.Table) -> pa.Table:
            want = ray.get(churn_ref)
            return t.filter(pa.array(
                [str(u) in want for u in t["url"].to_pylist()]))

        churn = pa.Table.from_pandas(
            new_ds.map_batches(_keep_churn, batch_format="pyarrow")
            .to_pandas(), preserve_index=False)
        urls = churn["url"].to_pylist()
        # an added url whose plain id is TOMBSTONED (deleted or
        # previously updated) must re-enter under a fresh generation
        # salt, exactly like update_documents — a plain add would be
        # masked by its own tombstone
        from blacklab_ray.index.idspace import doc_id_for_url, \
            load_remap
        upd2 = _load_updates(index_dir)
        tombs2 = set(upd2.get("tombstones") or [])
        remap = load_remap(index_dir)
        resurrect = {u for u in added
                     if doc_id_for_url(str(u), remap) in tombs2}
        fresh_mask = [str(u) in (added - resurrect) for u in urls]
        upd_mask = [str(u) in changed or str(u) in resurrect
                    for u in urls]
        if any(fresh_mask):
            add_documents(index_dir,
                          ray.data.from_arrow(
                              churn.filter(pa.array(fresh_mask))),
                          params)
        if any(upd_mask):
            update_documents(index_dir,
                             churn.filter(pa.array(upd_mask)), params)
        out["resurrected"] = len(resurrect)
    return out
