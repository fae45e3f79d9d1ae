"""Index build orchestration: pages Parquet → on-disk corpus index.

The Ray-Data-native equivalent of BlackLab's IndexTool lifecycle
(tools/src/main/java/nl/inl/blacklab/tools/IndexTool.java:44 →
IndexerImpl.index → Lucene+forward-index+metadata, SURVEY §3.1), rebuilt
as staged Dataset pipelines with a manifest for resume:

  index_dir/
    manifest.json   build lineage: per-stage inputs fingerprint, params,
                    row counts, timings, per-bucket posting lineage
    fwd/            forward index (per-doc term vectors) — BlackLab's
                    AnnotationForwardIndex analogue
    docs/           doc table (doc_id, url, lang, doc_len, norm[, warc_ts])
                    — the '#lengthTokens' DocValues + pid mapping analogue
    postings/       bucket=K/ partitioned posting segments (BlackLab's
                    Lucene postings analogue, block-compressed)
    terms/          term stats (term, doc_freq, collection_tf) — the terms
                    file + BlackLabIndex.termFrequencies analogue
    meta.json       corpus stats (n_docs, total_tokens, avg_doc_len) —
                    the indexmetadata analogue

Stages are skipped on resume when their recorded input fingerprint and
params match (per-stage checkpointing; the postings stage additionally
supports ``bucket_shards`` > 1, splitting the shuffle into independently
checkpointed bucket-range sub-jobs for per-partition resume at scale).

No ``ray.init`` here — the caller owns the session.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from blacklab_ray.index.postings import (
    BLOCK_SIZE, DEFAULT_BUCKETS, DEFAULT_SALTS, MAX_SEG_POSTINGS,
    ExplodePostings, build_segments,
)
from blacklab_ray.stages.extract import HtmlExtractor
from blacklab_ray.stages.tokenize import TokenizeForwardIndex

DOC_COLUMNS = ["doc_id", "url", "lang", "doc_len", "norm"]


@dataclass
class BuildParams:
    num_buckets: int = DEFAULT_BUCKETS
    n_salts: int = DEFAULT_SALTS
    block_size: int = BLOCK_SIZE
    max_seg_postings: int = MAX_SEG_POSTINGS
    codec: str = "vbyte"             # posting-block codec: vbyte | pfor
    #                                  (north_star "VByte/PForDelta");
    #                                  pfor needs block_size <= 255
    id_column: str = "url"          # "url" → doc_id = hash64(url); or "doc_id"
    extract_html: bool = False       # run HtmlExtractor (html → text)
    trust_text: bool = True          # keep an existing text column as-is
    hot_terms: tuple[str, ...] | None = None   # None → stopword default
    tokenize_concurrency: Any = None  # actor pool size; None → tasks default
    batch_size: int = 1024
    bucket_shards: int = 1           # sort-exchange checkpoint granularity
    exchange: str = "mapreduce"      # postings shuffle: mapreduce | sort
    paragraph_spans: bool = False    # store per-doc paragraph token counts
    sentence_spans: bool = False     # store per-doc sentence token counts
    files_per_map: int | None = None  # exchange map chunking (None: auto
    #                                   by cluster size — set explicitly
    #                                   for cross-cluster-size identical
    #                                   jobs, e.g. scaling measurements)
    fwd_rows_per_file: int | None = None  # pin fwd shard size so the
    #                                   fwd file count (and hence the
    #                                   exchange map fan-in) does not
    #                                   vary with cluster size
    verify_doc_ids: bool = False     # post-fwd hash-collision audit
    resolve_doc_ids: Any = "auto"    # 63-bit id-collision RESOLUTION
    #                                  (idspace.py): True | False |
    #                                  "auto" (run when n_docs >=
    #                                  idspace.AUTO_RESOLVE_MIN_DOCS —
    #                                  the scale where the birthday
    #                                  bound makes collisions real);
    #                                  staged exchanges only (the fused
    #                                  single pass writes postings
    #                                  before detection can see the
    #                                  global id set — use verify there)
    analyzer: str = "standard"       # analyzer registry key (contents)
    annotations: tuple[str, ...] = ()  # extra parallel annotations
    #                                    (lemma/pos): input list<string>
    #                                    columns aligned by token
    sensitive: bool = False          # also index the @s (case-sensitive)
    #                                  annotation: postings_s/ + terms_s/
    metadata_fields: tuple = ()      # ((name, type), ...) typed metadata
    #                                  declarations (FieldType.java:5-7:
    #                                  tokenized | numeric | untokenized);
    #                                  the named input columns are carried
    #                                  into fwd and typed in meta.json
    store_text: bool = False         # content-store analogue: carry the
    #                                  original text column into fwd so
    #                                  serving can return the stored
    #                                  original (doc contents, BLS
    #                                  usecontent=orig concordances)
    #                                  instead of reconstructing from
    #                                  tokens. Off by default: at corpus
    #                                  scale it doubles fwd bytes
    multivalue_column: str | None = None  # standoff secondary values
    #                                  (list<struct<pos,value>>): indexed
    #                                  into the main annotation's
    #                                  postings at the same positions
    #                                  (position-increment 0); fwd keeps
    #                                  the primary value only

    def fingerprint(self) -> dict:
        d = dict(self.__dict__)
        d["hot_terms"] = sorted(self.hot_terms) if self.hot_terms else None
        d["annotations"] = list(self.annotations)
        d["metadata_fields"] = [list(x) for x in self.metadata_fields]
        d.pop("tokenize_concurrency")
        return d


def _source_fingerprint(paths: list[str]) -> str:
    h = hashlib.sha256()
    for p in sorted(paths):
        h.update(p.encode())
        st = os.stat(p)
        h.update(str(st.st_size).encode())
    return h.hexdigest()[:16]


class Manifest:
    """Per-stage build lineage, JSON-persisted, drives resume."""

    def __init__(self, index_dir: str):
        self.path = os.path.join(index_dir, "manifest.json")
        self.data: dict = {"stages": {}}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.data = json.load(f)

    def stage_complete(self, name: str, fingerprint: str,
                       params: dict) -> bool:
        st = self.data["stages"].get(name)
        return bool(st and st.get("complete")
                    and st.get("fingerprint") == fingerprint
                    and st.get("params") == params)

    def record(self, name: str, fingerprint: str, params: dict,
               **info) -> None:
        self.data["stages"][name] = {
            "complete": True, "fingerprint": fingerprint,
            "params": params, **info,
        }
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1, default=str)
        os.replace(tmp, self.path)


def _fresh_dir(path: str) -> None:
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)


def check_doc_id_collisions(fwd_dir: str) -> int:
    """Count doc_id hash collisions in the forward index.

    doc_id = 63-bit blake2b(url); at ~10^12 docs the birthday bound
    yields real collisions that would silently merge distinct documents.
    This audit is one groupby over the int64 id column (shuffle of ids
    only, not payloads); run it at build time via
    ``BuildParams.verify_doc_ids`` or standalone. At extreme scale the
    durable fix is a 128-bit id; this detects when that day has come.
    """
    dup = (ray.data.read_parquet(fwd_dir, columns=["doc_id"])
           .groupby("doc_id").count()
           .map_batches(
               lambda t: t.filter(pa.compute.greater(t["count()"], 1)),
               batch_format="pyarrow"))
    return int(dup.count())


def build_index(source: str | list[str] | ray.data.Dataset, index_dir: str,
                params: BuildParams | None = None,
                resume: bool = True) -> dict:
    """Build (or resume building) the index; returns the manifest dict."""
    params = params or BuildParams()
    os.makedirs(index_dir, exist_ok=True)
    if params.codec not in ("vbyte", "pfor"):
        raise ValueError("unknown posting codec: %r" % params.codec)
    if params.codec == "pfor" and params.block_size > 255:
        raise ValueError("codec='pfor' needs block_size <= 255 "
                         "(exception positions/counts are uint8)")
    if params.multivalue_column and params.exchange != "mapreduce":
        # fused/sort paths don't fold terms_mv into the main postings;
        # refusing beats silently dropping secondary values (the same
        # failure mode as the fused-analyzer gap fixed for ADVICE r2 #2)
        raise ValueError(
            "multivalue_column requires exchange='mapreduce'")
    if params.metadata_fields:
        bad = [t for _n, t in params.metadata_fields
               if t not in ("tokenized", "numeric", "untokenized")]
        if bad:
            raise ValueError(f"unknown metadata field types: {bad}")
        if params.exchange == "fused":
            raise ValueError(
                "metadata_fields requires exchange='mapreduce' or "
                "'sort' (the fused map does not carry extra columns)")
    if isinstance(source, str):
        source = [source]
    if isinstance(source, list):
        paths: list[str] = []
        for p in source:
            if os.path.isdir(p):
                paths += [os.path.join(p, f) for f in sorted(os.listdir(p))
                          if f.endswith(".parquet")]
            else:
                paths.append(p)
        src_fp = _source_fingerprint(paths)

        def read_pages():
            cols = ["url", "html", "lang"] if params.extract_html else None
            return ray.data.read_parquet(paths, columns=cols)
    else:
        ds_in = source
        # In-memory Dataset sources are never resumable: id()-style
        # fingerprints are reused across processes and content hashing
        # would require executing the pipeline. A fresh uuid guarantees
        # no spurious stage-skip against a previous build's lineage.
        import uuid
        src_fp = "dataset:" + uuid.uuid4().hex

        def read_pages():
            return ds_in

    man = Manifest(index_dir)
    pfp = params.fingerprint()
    fwd_dir = os.path.join(index_dir, "fwd")
    post_dir = os.path.join(index_dir, "postings")
    terms_dir = os.path.join(index_dir, "terms")

    # ---- stage 1: extract + tokenize → forward index --------------------
    # (skipped for exchange="fused": the fused maps write fwd shards
    # while exploding postings — one pass over the input)
    if params.exchange != "fused" and \
            not (resume and man.stage_complete("fwd", src_fp, pfp)):
        t0 = time.perf_counter()
        ds = read_pages()
        # Instance UDFs run as elastic tasks by default; pass
        # tokenize_concurrency to pin an actor pool instead (worth it when
        # per-actor setup is heavy). Chained actor pools on small CPU
        # budgets can starve downstream stages — tasks cannot.
        if params.extract_html:
            if params.tokenize_concurrency is not None:
                ds = ds.map_batches(
                    HtmlExtractor,
                    fn_constructor_kwargs={"trust_text": params.trust_text},
                    batch_format="pyarrow", batch_size=params.batch_size,
                    concurrency=params.tokenize_concurrency)
            else:
                ds = ds.map_batches(
                    HtmlExtractor(trust_text=params.trust_text),
                    batch_format="pyarrow", batch_size=params.batch_size)
        tok_kwargs = {"id_column": params.id_column,
                      "paragraph_spans": params.paragraph_spans,
                      "sentence_spans": params.sentence_spans,
                      "sensitive": params.sensitive,
                      "analyzer": params.analyzer,
                      "annotations": tuple(params.annotations),
                      "multivalue_column": params.multivalue_column,
                      "metadata_cols": tuple(
                          n for n, _t in params.metadata_fields),
                      "store_text": params.store_text}
        if params.tokenize_concurrency is not None:
            ds = ds.map_batches(
                TokenizeForwardIndex,
                fn_constructor_kwargs=tok_kwargs,
                batch_format="pyarrow", batch_size=params.batch_size,
                concurrency=params.tokenize_concurrency)
        else:
            ds = ds.map_batches(
                TokenizeForwardIndex(**tok_kwargs),
                batch_format="pyarrow", batch_size=params.batch_size)
        _fresh_dir(fwd_dir)
        if params.fwd_rows_per_file:
            ds.write_parquet(fwd_dir,
                             min_rows_per_file=params.fwd_rows_per_file,
                             max_rows_per_file=params.fwd_rows_per_file)
        else:
            ds.write_parquet(fwd_dir)
        if params.verify_doc_ids:
            n_dup = check_doc_id_collisions(fwd_dir)
            if n_dup:
                raise RuntimeError(
                    f"{n_dup} doc_id hash collisions in {fwd_dir}; "
                    "distinct urls map to one 63-bit id — use a wider id")
        dt = time.perf_counter() - t0
        man.record("fwd", src_fp, pfp, seconds=round(dt, 3))

    # ---- stage 1b: doc-id collision resolution (idspace.py) -------------
    # Runs between fwd and every consumer of doc ids (meta/exchange) so
    # postings are built over the resolved id space.
    if params.exchange != "fused" and \
            not (resume and man.stage_complete("doc_ids", src_fp, pfp)):
        from blacklab_ray.index.idspace import (
            AUTO_RESOLVE_MIN_DOCS, resolve_index_doc_ids,
        )
        do = params.resolve_doc_ids
        if do == "auto":
            n_fwd = sum(
                pq.read_metadata(os.path.join(fwd_dir, f)).num_rows
                for f in os.listdir(fwd_dir) if f.endswith(".parquet"))
            do = n_fwd >= AUTO_RESOLVE_MIN_DOCS
        if do:
            t0 = time.perf_counter()
            info = resolve_index_doc_ids(index_dir, fwd_dir)
            man.record("doc_ids", src_fp, pfp,
                       seconds=round(time.perf_counter() - t0, 3), **info)
        else:
            man.record("doc_ids", src_fp, pfp, skipped=True)

    # ---- stage 2: corpus meta (sort path: one aggregate pass over fwd;
    # mapreduce path: derived driver-side after the exchange) ------------
    # The doc table is NOT rewritten — it IS the fwd Parquet read with
    # column pruning (doc_id, url, lang, doc_len, norm); a separate copy
    # would cost one more pipeline execution per build for no new bytes.
    if params.exchange == "sort" and \
            not (resume and man.stage_complete("meta", src_fp, pfp)):
        t0 = time.perf_counter()
        from ray.data.aggregate import Count, Sum
        agg = ray.data.read_parquet(fwd_dir, columns=["doc_len"]) \
            .aggregate(Count(alias_name="n_docs"),
                       Sum("doc_len", alias_name="total_tokens"))
        n_docs = int(agg["n_docs"])
        total_tokens = int(agg["total_tokens"] or 0)
        meta = {
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "avg_doc_len": total_tokens / max(n_docs, 1),
            "metadata_fields": {n: t for n, t in params.metadata_fields},
            "params": pfp,
        }
        with open(os.path.join(index_dir, "meta.json"), "w") as f:
            json.dump(meta, f, indent=1)
        dt = time.perf_counter() - t0
        man.record("meta", src_fp, pfp, seconds=round(dt, 3),
                   n_docs=n_docs, total_tokens=total_tokens,
                   docs_per_sec=round(n_docs / max(dt, 1e-9), 1))

    # ---- stage 3: postings shuffle --------------------------------------
    shards_done = man.data["stages"].get("postings_shards", {}) \
        if resume else {}
    if not (isinstance(shards_done, dict)
            and shards_done.get("fingerprint") == src_fp
            and shards_done.get("params") == pfp):
        shards_done = {}  # stale lineage (inputs/params changed)
    if not (resume and man.stage_complete("postings", src_fp, pfp)):
        t0 = time.perf_counter()
        shard_info = dict(shards_done.get("shards", {}))
        if params.exchange == "fused":
            from blacklab_ray.index.exchange import run_fused_build
            if not isinstance(source, list):
                raise ValueError(
                    "exchange='fused' needs file paths (its maps chunk "
                    "the input files); pass paths or use 'mapreduce'")
            _fresh_dir(fwd_dir)
            _fresh_dir(post_dir)
            _fresh_dir(os.path.join(index_dir, "terms_parts"))
            parts = run_fused_build(
                paths, index_dir,
                num_buckets=params.num_buckets, n_salts=params.n_salts,
                hot_terms=params.hot_terms, block_size=params.block_size,
                max_seg_postings=params.max_seg_postings,
                codec=params.codec,
                extract_html=params.extract_html,
                trust_text=params.trust_text,
                id_column=params.id_column,
                paragraph_spans=params.paragraph_spans,
                sentence_spans=params.sentence_spans,
                sensitive=params.sensitive,
                batch_size=params.batch_size,
                files_per_map=params.files_per_map,
                analyzer=params.analyzer,
                annotations=tuple(params.annotations),
                store_text=params.store_text)
            if params.verify_doc_ids:
                n_dup = check_doc_id_collisions(fwd_dir)
                if n_dup:
                    raise RuntimeError(
                        f"{n_dup} doc_id hash collisions in {fwd_dir}")
            dt = time.perf_counter() - t0
            man.record("fwd", src_fp, pfp, seconds=round(dt, 3),
                       fused=True)
            man.record("postings_shards", src_fp, pfp, shards=parts)
            man.record("postings", src_fp, pfp, seconds=round(dt, 3),
                       exchange="fused", parts=len(parts))
            shards_done = {}
            # the sensitive annotation still exchanges from the
            # written fwd shards (stage 3b below)
        elif params.exchange == "mapreduce":
            from blacklab_ray.index.exchange import run_postings_exchange
            completed = {int(k) for k, v in shard_info.items()
                         if v.get("complete")}
            if not completed:
                _fresh_dir(post_dir)
                _fresh_dir(os.path.join(index_dir, "terms_parts"))
            new_parts = run_postings_exchange(
                fwd_dir, post_dir,
                num_buckets=params.num_buckets, n_salts=params.n_salts,
                hot_terms=params.hot_terms, block_size=params.block_size,
                max_seg_postings=params.max_seg_postings,
                codec=params.codec,
                completed_parts=completed,
                files_per_map=params.files_per_map,
                mv_cols=(("terms_mv", "tfs_mv", "pos_mv")
                         if params.multivalue_column else None))
            shard_info.update(new_parts)
            man.record("postings_shards", src_fp, pfp, shards=shard_info)
            dt = time.perf_counter() - t0
            man.record("postings", src_fp, pfp, seconds=round(dt, 3),
                       exchange="mapreduce", parts=len(shard_info))
            shards_done = {}
        else:
            _build_postings_sort(params, man, src_fp, pfp, fwd_dir,
                                 post_dir, shard_info, t0)

    # ---- stage 3b: additional annotation postings (`word@s` + any
    # parallel annotations like lemma/pos) — reads the written fwd ----
    extra_annots = (["s"] if params.sensitive else []) \
        + list(params.annotations)
    fwd_schema_names: set = set()
    if extra_annots:
        fwd_files = [f for f in os.listdir(fwd_dir)
                     if f.endswith(".parquet")]
        if fwd_files:
            fwd_schema_names = set(pq.read_schema(
                os.path.join(fwd_dir, fwd_files[0])).names)
    for annot in extra_annots:
        stage = f"postings_{annot}"
        if resume and man.stage_complete(stage, src_fp, pfp):
            continue
        t0 = time.perf_counter()
        from blacklab_ray.index.exchange import run_postings_exchange
        post_a = os.path.join(index_dir, f"postings_{annot}")
        _fresh_dir(post_a)
        _fresh_dir(os.path.join(index_dir, f"terms_parts_{annot}"))
        # non-main multi-values (AnnotationWriter.java:246-343): when
        # the tokenize stage emitted increment-0 secondaries for this
        # annotation, fold them into ITS postings — searchable like
        # primaries, while the fwd terms_<annot> stays primary-only
        mv = (f"terms_mv_{annot}", f"tfs_mv_{annot}",
              f"pos_mv_{annot}")
        run_postings_exchange(
            fwd_dir, post_a,
            num_buckets=params.num_buckets, n_salts=params.n_salts,
            hot_terms=params.hot_terms, block_size=params.block_size,
            max_seg_postings=params.max_seg_postings,
            codec=params.codec,
            annot_cols=(f"terms_{annot}", f"tfs_{annot}",
                        f"pos_{annot}"),
            terms_parts_name=f"terms_parts_{annot}",
            mv_cols=(mv if mv[0] in fwd_schema_names else None))
        man.record(stage, src_fp, pfp,
                   seconds=round(time.perf_counter() - t0, 3))

    # ---- stage 4: term stats (+ meta on the mapreduce path) -------------
    terms_parts_dir = os.path.join(index_dir, "terms_parts")
    if not (resume and man.stage_complete("terms", src_fp, pfp)):
        t0 = time.perf_counter()
        done = False
        if params.exchange in ("mapreduce", "fused") \
                and os.path.isdir(terms_parts_dir):
            # finish from the exchange's per-part stats: driver-side,
            # vocab-sized — no extra pipeline over the postings
            parts = pq.read_table(terms_parts_dir)
            if "term" not in parts.column_names:
                # zero-doc corpus: the exchange wrote schema-less
                # empty parts — an empty index is valid (created
                # empty, filled by add_documents later)
                stats_tbl = pa.table({
                    "term": pa.array([], pa.string()),
                    "doc_freq": pa.array([], pa.int64()),
                    "collection_tf": pa.array([], pa.int64()),
                })
            else:
                gb = parts.group_by("term").aggregate(
                    [("df_seg_sum", "sum"), ("ctf_seg_sum", "sum")])
                stats_tbl = pa.table({
                    "term": gb["term"],
                    "doc_freq": gb["df_seg_sum_sum"].cast(pa.int64()),
                    "collection_tf":
                        gb["ctf_seg_sum_sum"].cast(pa.int64()),
                })
            _fresh_dir(terms_dir)
            pq.write_table(stats_tbl,
                           os.path.join(terms_dir, "terms.parquet"))
            done = True
        if not done:
            from ray.data.aggregate import Sum
            stats = ray.data.read_parquet(
                post_dir, columns=["term", "df_seg", "ctf_seg"]) \
                .groupby("term") \
                .aggregate(Sum("df_seg", alias_name="doc_freq"),
                           Sum("ctf_seg", alias_name="collection_tf"))
            _fresh_dir(terms_dir)
            stats.write_parquet(terms_dir)
        dt = time.perf_counter() - t0
        man.record("terms", src_fp, pfp, seconds=round(dt, 3))

    for annot in extra_annots:
        stage = f"terms_{annot}"
        if resume and man.stage_complete(stage, src_fp, pfp):
            continue
        t0 = time.perf_counter()
        parts = pq.read_table(
            os.path.join(index_dir, f"terms_parts_{annot}"))
        gb = parts.group_by("term").aggregate(
            [("df_seg_sum", "sum"), ("ctf_seg_sum", "sum")])
        stats_tbl = pa.table({
            "term": gb["term"],
            "doc_freq": gb["df_seg_sum_sum"].cast(pa.int64()),
            "collection_tf": gb["ctf_seg_sum_sum"].cast(pa.int64()),
        })
        tdir = os.path.join(index_dir, f"terms_{annot}")
        _fresh_dir(tdir)
        pq.write_table(stats_tbl, os.path.join(tdir, "terms.parquet"))
        man.record(stage, src_fp, pfp,
                   seconds=round(time.perf_counter() - t0, 3))

    if params.exchange in ("mapreduce", "fused") and \
            not (resume and man.stage_complete("meta", src_fp, pfp)):
        t0 = time.perf_counter()
        n_docs = sum(pq.read_metadata(os.path.join(fwd_dir, f)).num_rows
                     for f in os.listdir(fwd_dir)
                     if f.endswith(".parquet"))
        if params.multivalue_column:
            # ctf now counts secondary values too; the corpus token
            # count is token POSITIONS (IndexMetadata.addToTokenCount
            # semantics) = sum of doc lengths
            lens = pq.read_table(fwd_dir, columns=["doc_len"])
            total_tokens = int(pa.compute.sum(
                lens["doc_len"]).as_py() or 0)
        else:
            terms_tbl = pq.read_table(terms_dir,
                                      columns=["collection_tf"])
            total_tokens = int(pa.compute.sum(
                terms_tbl["collection_tf"]).as_py() or 0)
        meta = {
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "avg_doc_len": total_tokens / max(n_docs, 1),
            "metadata_fields": {n: t for n, t in params.metadata_fields},
            "params": pfp,
        }
        with open(os.path.join(index_dir, "meta.json"), "w") as f:
            json.dump(meta, f, indent=1)
        man.record("meta", src_fp, pfp,
                   seconds=round(time.perf_counter() - t0, 3),
                   n_docs=n_docs, total_tokens=total_tokens)

    return man.data


def _build_postings_sort(params, man, src_fp, pfp, fwd_dir, post_dir,
                         shard_info, t0):
    """Dataset-API sort-exchange path (groupby().map_groups), kept for
    cross-checking the map/reduce exchange and for environments where
    raw-task scheduling is undesirable."""
    n_shards = max(1, params.bucket_shards)
    if not shard_info:
        _fresh_dir(post_dir)
    for shard in range(n_shards):
        key = str(shard)
        if shard_info.get(key, {}).get("complete"):
            continue
        ts = time.perf_counter()
        fwd = ray.data.read_parquet(
            fwd_dir, columns=["doc_id", "norm", "terms", "tfs", "pos"])
        exploded = fwd.map_batches(
            ExplodePostings(num_buckets=params.num_buckets,
                            n_salts=params.n_salts,
                            hot_terms=params.hot_terms),
            batch_format="pyarrow")
        if n_shards > 1:
            # bucket = gkey // n_salts; shard owns a bucket range
            lo = shard * params.num_buckets // n_shards
            hi = (shard + 1) * params.num_buckets // n_shards
            lo_g, hi_g = lo * params.n_salts, hi * params.n_salts
            exploded = exploded.map_batches(
                lambda t, lo_g=lo_g, hi_g=hi_g: t.filter(
                    (pa.compute.field("gkey") >= lo_g)
                    & (pa.compute.field("gkey") < hi_g)),
                batch_format="pyarrow")
        segs = exploded.groupby("gkey").map_groups(
            lambda g: build_segments(
                g, params.block_size, params.max_seg_postings,
                params.n_salts, codec=params.codec),
            batch_format="pyarrow")
        segs.write_parquet(post_dir, partition_cols=["bucket"])
        shard_info[key] = {"complete": True,
                           "seconds": round(time.perf_counter() - ts, 3)}
        man.record("postings_shards", src_fp, pfp, shards=shard_info)
    dt = time.perf_counter() - t0
    man.record("postings", src_fp, pfp, seconds=round(dt, 3),
               exchange="sort")
