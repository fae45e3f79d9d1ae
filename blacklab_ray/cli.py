"""Command-line entry points (IndexTool / FrequencyTool analogues).

Mirrors the reference's CLI surface (tools/src/main/java/nl/inl/blacklab/
tools/IndexTool.java:44 — {create|add|delete} index input format — and
FrequencyTool.java:55) as subcommands over the Ray engine:

    python -m blacklab_ray.cli build  --input DIR --index DIR
                                      [--extract-html] [--format FMT]
    python -m blacklab_ray.cli search --index DIR --terms a,b --mode or -k 10
    python -m blacklab_ray.cli phrase --index DIR --terms a,b -k 10
    python -m blacklab_ray.cli freq   --input DIR --group-by lang --out DIR
    python -m blacklab_ray.cli gen    --out DIR --docs 10000

Owns its Ray session (guarded init), unlike the library code.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_build(args) -> int:
    _ray_session()
    from blacklab_ray.index import BuildParams, build_index
    source = args.input
    id_column = args.id_column
    if getattr(args, "format_file", None):
        # user-supplied .blf.yaml: register it and read through it
        from blacklab_ray.formats import register_yaml_format
        args.format = register_yaml_format(args.format_file)
    if args.format not in ("webtext-html", "webtext-text"):
        # non-parquet formats read through the registry into the
        # canonical pages schema (url becomes the pid)
        from blacklab_ray.formats import read_pages
        source = read_pages(args.format, args.input)
        id_column = "url"
    annots = tuple(a for a in (args.annotations or "").split(",") if a)
    man = build_index(
        source, args.index,
        BuildParams(num_buckets=args.buckets, n_salts=args.salts,
                    extract_html=args.extract_html,
                    trust_text=not args.extract_html,
                    id_column=id_column,
                    sensitive=args.sensitive,
                    annotations=annots,
                    analyzer=args.analyzer,
                    store_text=args.store_text),
        resume=not args.no_resume)
    print(json.dumps({k: {kk: vv for kk, vv in v.items()
                          if kk in ("seconds", "n_docs", "total_tokens")}
                      for k, v in man["stages"].items()}, indent=1))
    return 0


def _open_reader(index_arg: str):
    from blacklab_ray.query import open_reader
    return open_reader(index_arg)


def cmd_search(args) -> int:
    from blacklab_ray.query import search
    reader = _open_reader(args.index)
    res = search(reader, args.terms.split(","), k=args.k, mode=args.mode,
                 algo=args.algo, resolve_urls=True)
    if getattr(args, "out", None):
        # CSV export of results (WriteCsv analogue,
        # wslib/.../server/lib/WriteCsv.java)
        from pyarrow import csv as pa_csv
        pa_csv.write_csv(res, args.out)
        print(json.dumps({"written": args.out, "rows": res.num_rows}))
    else:
        for row in res.to_pylist():
            print(json.dumps(row))
    return 0


def cmd_phrase(args) -> int:
    from blacklab_ray.query import phrase_search
    reader = _open_reader(args.index)
    res = phrase_search(reader, args.terms.split(","), k=args.k,
                        resolve_urls=True)
    for row in res.to_pylist():
        print(json.dumps(row))
    return 0


def cmd_mlt(args) -> int:
    """More-like-this: top-k docs similar to a seed doc (by --doc-id
    or --url; url resolves THROUGH THE INDEX — a url-filtered fwd
    gather — so user-supplied id columns and collision-remapped ids
    resolve correctly, unlike re-deriving hash64(url))."""
    from blacklab_ray.query.mlt import more_like_this
    reader = _open_reader(args.index)
    doc_id = args.doc_id
    if doc_id is None:
        if not args.url:
            raise SystemExit("mlt needs --doc-id or --url")
        from blacklab_ray.server import _doc_by_pid
        doc_id, _dl = _doc_by_pid(reader, args.url)
    res = more_like_this(reader, doc_id, k=args.k,
                         max_terms=args.max_terms,
                         resolve_urls=True)
    for row in res.to_pylist():
        print(json.dumps(row))
    return 0


def cmd_cql(args) -> int:
    from blacklab_ray.query.cql import search_cql
    reader = _open_reader(args.index)
    res = search_cql(reader, args.query, k=args.k, resolve_urls=True)
    for row in res.to_pylist():
        print(json.dumps(row))
    return 0


def cmd_querytool(args) -> int:
    """QueryTool analogue: interactive console, or -f batch file with
    per-query timing output (QueryTool.java:451-460)."""
    from blacklab_ray.querytool import run_querytool
    commands = None
    if args.file:
        with open(args.file) as f:
            commands = f.readlines()
    return run_querytool(args.index, commands=commands,
                         batch=args.file is not None)


def cmd_freq(args) -> int:
    ray = _ray_session()
    import ray.data

    from blacklab_ray.pipelines import frequency
    ds = ray.data.read_parquet(args.input)
    if args.group_by:
        out = frequency.freq_by(ds, args.group_by, text_col=args.text_col)
    else:
        out = frequency.term_frequencies(ds, text_col=args.text_col)
    if args.out:
        # FreqListOutputTsv analogue: csv or json lines, optionally
        # gzip-compressed partitioned output
        fmt = getattr(args, "fmt", "csv")
        open_args = {"compression": "gzip"} if args.gzip else {}
        if fmt == "json":
            out.write_json(args.out, arrow_open_stream_args=open_args)
        else:
            out.write_csv(args.out, arrow_open_stream_args=open_args)
        print(f"wrote {args.out} ({fmt}{', gzip' if args.gzip else ''})")
    else:
        for row in out.limit(args.limit).take_all():
            print(json.dumps(row))
    return 0


def cmd_export_corpus(args) -> int:
    """ExportCorpus analogue: dump every live doc's stored original
    (or reconstructed token stream) to one file per pid."""
    _ray_session()
    from blacklab_ray.pipelines.docsops import export_corpus
    n = export_corpus(args.index, args.out)
    print(f"exported {n} documents to {args.out}")
    return 0


def cmd_freq_lists(args) -> int:
    """FrequencyTool analogue: config-driven frequency lists over a
    BUILT index (tools/frequency/FrequencyTool.java usage:
    FrequencyTool [--json] [--gzip] INDEX CONFIG [OUTPUT_DIR])."""
    _ray_session()
    import yaml

    from blacklab_ray.pipelines.frequency import frequency_lists
    with open(args.config, encoding="utf-8") as f:
        cfg = yaml.safe_load(f) or {}
    paths = frequency_lists(args.index, cfg, args.out,
                            fmt="json" if args.json else "tsv",
                            gzip_out=args.gzip)
    for pth in paths:
        print(f"wrote {pth}")
    return 0


def cmd_kwic(args) -> int:
    """Keyword-in-context from an index's forward index (Kwics.java)."""
    _ray_session()
    from blacklab_ray.pipelines import hits
    res = hits.kwic_from_forward_index(args.index, args.term,
                                       context=args.context,
                                       limit=args.k)
    import pyarrow as pa
    t = res if isinstance(res, pa.Table) else \
        pa.Table.from_pylist(res.take_all())
    if args.out:
        from pyarrow import csv as pa_csv
        pa_csv.write_csv(t, args.out)
        print(json.dumps({"written": args.out, "rows": t.num_rows}))
    else:
        for row in t.to_pylist():
            print(json.dumps(row))
    return 0


def cmd_serve(args) -> int:
    """BLS-style HTTP server over one or more built indexes
    (``--corpus name=/path/to/index``, repeatable); ``--data-dir``
    enables index management (create/delete) and auto-registers the
    indexes already under it."""
    _ray_session()
    from blacklab_ray.server import serve
    dirs = {}
    for spec in args.corpus or []:
        name, _, path = spec.partition("=")
        if not path:
            name, path = "default", spec
        dirs[name] = path
    if not dirs and not args.data_dir:
        raise SystemExit("serve needs --corpus and/or --data-dir")
    auth_method = "none"
    if args.auth_fixed_user:
        auth_method = "debug-fixed"
    elif args.auth_header:
        auth_method = "http-header"
    httpd, _ = serve(dirs, host=args.host, port=args.port,
                     data_dir=args.data_dir,
                     auth_method=auth_method,
                     auth_header=args.auth_header or "X-BlackLabUser",
                     auth_fixed_user=args.auth_fixed_user,
                     admin_users=tuple(args.admin_user or ()))
    print(json.dumps({"serving": sorted(dirs),
                      "port": httpd.server_address[1]}))
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def cmd_gen(args) -> int:
    from blacklab_ray.sources.synth import write_pages_corpus
    paths = write_pages_corpus(args.out, args.docs, n_shards=args.shards)
    print(json.dumps({"files": len(paths), "docs": args.docs}))
    return 0


def cmd_sync(args) -> int:
    """Sync an index to a new corpus snapshot: diff by content, then
    delete removed / update changed / add new documents."""
    _ray_session()
    from blacklab_ray.index.update import sync_snapshot
    rec = sync_snapshot(args.index, args.new, old_source=args.old)
    print(json.dumps(rec))
    return 0


def cmd_diff(args) -> int:
    """Content diff between two corpus snapshots (added/removed/
    changed per doc key) to partitioned parquet — the crawl-ops step
    feeding incremental index updates."""
    _ray_session()
    import ray.data

    from blacklab_ray.pipelines.docsops import snapshot_diff
    out = snapshot_diff(ray.data.read_parquet(args.old),
                        ray.data.read_parquet(args.new),
                        id_col=args.id_col, text_col=args.text_col,
                        include_unchanged=args.include_unchanged)
    out.write_parquet(args.out)
    print(json.dumps({"op": "diff", "out": args.out}))
    return 0


def cmd_clean(args) -> int:
    """Corpus-cleaning pass over a documents parquet dir: streaming in,
    partitioned parquet out (write_parquet shards per block — a failed
    run re-lists the output and the lazy pipeline re-streams; never one
    giant file)."""
    _ray_session()
    import ray.data

    from blacklab_ray.pipelines import cleaning, textstats
    ds = ray.data.read_parquet(args.input)
    if args.op == "pii":
        out = cleaning.pii_scrub(ds, text_col=args.text_col,
                                 id_col=args.id_col,
                                 keep_text=args.keep_text)
    elif args.op == "quality":
        out = textstats.quality_filter(ds, text_col=args.text_col,
                                       id_col=args.id_col)
        if args.keep_only:
            import pyarrow.compute as _pc
            out = out.map_batches(
                lambda t: t.filter(_pc.equal(t["keep"], True)),
                batch_format="pyarrow")
    elif args.op == "paragraph-dedup":
        out = cleaning.paragraph_dup_stats(ds, text_col=args.text_col,
                                           id_col=args.id_col)
    elif args.op == "c4":
        import pyarrow.compute as _pc
        out = cleaning.c4_rules(ds, text_col=args.text_col,
                                id_col=args.id_col,
                                keep_text=args.keep_text)
        if args.keep_only:
            out = out.map_batches(
                lambda t: t.filter(_pc.equal(t["kept"], True)),
                batch_format="pyarrow")
    elif args.op == "html":
        from blacklab_ray.stages.htmltext import extract_html_text
        out = extract_html_text(ds, html_col=args.html_col,
                                id_col=args.id_col,
                                keep_text=args.keep_text)
    elif args.op == "links":
        from blacklab_ray.stages.htmltext import extract_links
        out = extract_links(ds, html_col=args.html_col,
                            id_col=args.id_col)
    elif args.op == "chunk":
        from blacklab_ray.pipelines.docsops import chunk_documents
        out = chunk_documents(ds, chunk_tokens=args.chunk_tokens,
                              overlap=args.overlap,
                              text_col=args.text_col,
                              id_col=args.id_col)
    elif args.op == "substr-dedup":
        # ExactSubstr cut (Lee et al. 2022): find every duplicated
        # W-token span, then cut the marked spans from the text
        from blacklab_ray.pipelines.dedup import (
            cut_dup_spans, substr_dup_spans,
        )
        spans = substr_dup_spans(ds, window=args.window,
                                 text_col=args.text_col,
                                 id_col=args.id_col,
                                 keep_first=args.keep_first)
        out = cut_dup_spans(ds, spans, text_col=args.text_col,
                            id_col=args.id_col)
    else:  # decontaminate
        import pyarrow.compute as _pc
        if not args.benchmark:
            print("error: --benchmark is required for "
                  "--op decontaminate", file=sys.stderr)
            return 2
        bench = ray.data.read_parquet(args.benchmark)
        fn = (cleaning.decontaminate_bloom if args.bloom
              else cleaning.decontaminate)
        out = fn(ds, bench, n=args.ngram, text_col=args.text_col,
                 id_col=args.id_col)
        if args.keep_only:
            out = out.map_batches(
                lambda t: t.filter(
                    _pc.equal(t["contaminated"], False)),
                batch_format="pyarrow")
    out.write_parquet(args.out)
    import ray
    print(json.dumps({"op": args.op, "out": args.out}))
    ray.shutdown()
    return 0


def cmd_merge(args) -> int:
    """Merge a separately built index into another (addIndexes
    analogue): source forward shards are reused, postings re-exchange
    into the destination layout as one new generation."""
    _ray_session()
    import ray

    from blacklab_ray.index.update import compact_index, merge_indexes
    rec = merge_indexes(args.dst, args.src)
    if args.compact:
        compact_index(args.dst)
    print(json.dumps(rec))
    ray.shutdown()
    return 0


def cmd_compact_federation(args) -> int:
    """Size-tiered physical compaction of a federation: merge the
    smallest sub-indexes pairwise until at most --max-indexes remain
    (the serving federation re-opens on the printed spec)."""
    _ray_session()
    import ray

    from blacklab_ray.query.multireader import compact_federation
    dirs = [d for d in args.index.split(",") if d]
    kept = compact_federation(dirs, max_indexes=args.max_indexes)
    print(json.dumps({"spec": ",".join(kept), "n_indexes": len(kept)}))
    ray.shutdown()
    return 0


def cmd_pagerank(args) -> int:
    """PageRank over an edge parquet. String src/dst columns (urls)
    are hashed to int64 node ids via hash64 after canonicalization;
    int columns pass through. Writes (node, rank) parquet."""
    _ray_session()
    import pyarrow as pa
    import ray
    import ray.data

    from blacklab_ray.pipelines.graph import pagerank
    ds = ray.data.read_parquet(args.input,
                               columns=[args.src_col, args.dst_col])
    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))

    def _is_str(t) -> bool:
        return pa.types.is_string(t) or pa.types.is_large_string(t)
    # decide per COLUMN, not from src alone — mixed tables (pre-hashed
    # int src joined to raw string hrefs) hash only the string side
    if _is_str(types[args.src_col]) or _is_str(types[args.dst_col]):
        from blacklab_ray.pipelines.dedup import canonicalize_url_expr
        from blacklab_ray.stages.tokenize import hash64

        def _hash_cols(batch: pa.Table) -> pa.Table:
            out = {}
            for name, cname in (("src", args.src_col),
                                ("dst", args.dst_col)):
                col = batch.column(cname)
                if _is_str(col.type):
                    import numpy as np

                    from blacklab_ray.util import hash64_batch
                    canon = canonicalize_url_expr(col)
                    out[name] = pa.array(
                        hash64_batch(canon).view(np.int64), pa.int64())
                else:
                    out[name] = col.cast(pa.int64())
            return pa.table(out)

        ds = ds.map_batches(_hash_cols, batch_format="pyarrow")
        src_col = dst_col = None
    else:
        src_col, dst_col = args.src_col, args.dst_col
    algo = getattr(args, "algo", "pagerank")
    if algo == "hits":
        from blacklab_ray.pipelines.graph import hits
        out = hits(ds, n_iter=args.iters,
                   src_col=src_col or "src", dst_col=dst_col or "dst")
    else:
        out = pagerank(ds, n_iter=args.iters, damping=args.damping,
                       src_col=src_col or "src",
                       dst_col=dst_col or "dst")
    out.write_parquet(args.out)
    print(json.dumps({"op": algo, "iters": args.iters,
                      "nodes": out.count(), "out": args.out}))
    ray.shutdown()
    return 0


def cmd_anchors(args) -> int:
    """Per-target anchor-text profiles from a link parquet."""
    _ray_session()
    import ray
    import ray.data

    from blacklab_ray.pipelines.graph import anchor_texts
    ds = ray.data.read_parquet(args.input)
    out = anchor_texts(ds, target_col=args.target_col,
                       anchor_col=args.anchor_col,
                       max_per_target=args.max_per_target)
    out.write_parquet(args.out)
    print(json.dumps({"op": "anchors", "targets": out.count(),
                      "out": args.out}))
    ray.shutdown()
    return 0


def cmd_split(args) -> int:
    """Assign deterministic train/val/test splits and write the corpus
    partitioned by split (resumable downstream readers select a split
    by directory)."""
    _ray_session()
    import ray
    import ray.data

    from blacklab_ray.pipelines.docsops import assign_splits
    weights = {}
    for part in args.weights.split(","):
        name, w = part.split("=")
        weights[name] = float(w)
    ds = ray.data.read_parquet(args.input)
    out = assign_splits(ds, weights, seed=args.seed, id_col=args.id_col)
    out.write_parquet(args.out, partition_cols=["split"])
    print(json.dumps({"op": "split", "weights": weights,
                      "seed": args.seed, "out": args.out}))
    ray.shutdown()
    return 0


def _csv(s: str) -> tuple:
    return tuple(x for x in s.split(",") if x)


def cmd_export(args) -> int:
    """Corpus → packed training shards (optionally curated first).
    Resumable: completed shard files are skipped on re-run."""
    _ray_session()
    import ray
    import ray.data

    ds = ray.data.read_parquet(args.input)
    if args.tokenizer == "bpe":
        from blacklab_ray.pipelines.bpe import export_bpe_shards
        if args.eos:
            raise SystemExit("--eos is a word-tokenizer option; with "
                             "--tokenizer bpe delimiters belong to "
                             "the BPE id space (not yet supported)")
        if args.vocab_size != 65536:
            raise SystemExit("--vocab-size has no effect with "
                             "--tokenizer bpe; size the vocabulary "
                             "with --merges")
        if args.curate:
            from blacklab_ray.pipelines.curate import curate
            ds = curate(ds, text_col=args.text_col, id_col=args.id_col,
                        languages=tuple(args.languages.split(","))
                        if args.languages else None,
                        near_dup=args.near_dup,
                        blocked_hosts=_csv(args.block_hosts),
                        blocked_patterns=_csv(args.block_patterns)) \
                .materialize()
        stats = export_bpe_shards(
            ds, args.out, num_merges=args.merges,
            seq_len=args.seq_len, seqs_per_shard=args.seqs_per_shard,
            text_col=args.text_col, id_col=args.id_col)
    elif args.curate:
        from blacklab_ray.pipelines.curate import curate_and_export
        stats = curate_and_export(
            ds, args.out, seq_len=args.seq_len,
            seqs_per_shard=args.seqs_per_shard,
            vocab_size=args.vocab_size, eos=args.eos,
            text_col=args.text_col, id_col=args.id_col,
            languages=tuple(args.languages.split(","))
            if args.languages else None,
            near_dup=args.near_dup,
            blocked_hosts=_csv(args.block_hosts),
            blocked_patterns=_csv(args.block_patterns))
    else:
        from blacklab_ray.pipelines.export import export_packed_sequences
        stats = export_packed_sequences(
            ds, args.out, seq_len=args.seq_len,
            seqs_per_shard=args.seqs_per_shard,
            vocab_size=args.vocab_size, eos=args.eos,
            text_col=args.text_col, id_col=args.id_col)
    print(json.dumps({k: v for k, v in stats.items() if k != "shards"}
                     | {"n_shard_files": len(stats["shards"])}))
    ray.shutdown()
    return 0


def cmd_score(args) -> int:
    """Per-doc quality signals → parquet (streamed write_parquet —
    the sink IS the consumer, nothing corpus-sized materializes)."""
    import os
    if os.path.isdir(args.out) and os.listdir(args.out):
        raise SystemExit(f"--out {args.out} is not empty; a re-run "
                         "would mix stale score files with new ones "
                         "(write_parquet appends uniquely-named "
                         "files) — use a fresh directory")
    _ray_session()
    import ray
    import ray.data

    ds = ray.data.read_parquet(args.input)
    if args.op in ("ppl", "ppl-buckets"):
        from blacklab_ray.pipelines.lm import (
            lm_perplexity, perplexity_buckets,
        )
        fn = lm_perplexity if args.op == "ppl" else perplexity_buckets
        out = fn(ds, text_col=args.text_col, id_col=args.id_col)
    elif args.op == "clf":
        if not args.model:
            raise SystemExit("--op clf requires --model (a model "
                             "file written by clf-train)")
        from blacklab_ray.pipelines.classifier import (
            load_model, score_documents,
        )
        out = score_documents(ds, load_model(args.model),
                              text_col=args.text_col)
    elif args.op == "quality":
        from blacklab_ray.pipelines.textstats import quality_scores
        out = quality_scores(ds, args.text_col, args.id_col)
    else:
        from blacklab_ray.pipelines.textstats import lang_id
        out = lang_id(ds, args.text_col, args.id_col)
    out.write_parquet(args.out)
    # row count from the written files' parquet metadata — a .count()
    # on `out` would re-run the whole scoring pipeline
    n = ray.data.read_parquet(args.out).count()
    print(json.dumps({"op": args.op, "out": args.out, "rows": n}))
    ray.shutdown()
    return 0


def cmd_clf_train(args) -> int:
    """Train the hashed-n-gram quality classifier on a labeled
    parquet table and persist the model file."""
    _ray_session()
    import ray
    import ray.data

    from blacklab_ray.pipelines.classifier import (
        save_model, train_linear_classifier,
    )
    ds = ray.data.read_parquet(args.input)
    model = train_linear_classifier(
        ds, args.text_col, args.label_col, args.id_col,
        dim=args.dim, epochs=args.epochs, lr=args.lr)
    save_model(model, args.out)
    print(json.dumps({
        "out": args.out, "classes": [str(c) for c in model.classes],
        "epochs": args.epochs,
        "final_loss": round(model.train_loss[-1], 6)}))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="blacklab_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--buckets", type=int, default=32)
    b.add_argument("--salts", type=int, default=8)
    b.add_argument("--extract-html", action="store_true")
    b.add_argument("--format", default="webtext-text",
                   help="input format (see blacklab_ray.formats)")
    b.add_argument("--format-file", default=None,
                   help="path to a user .blf.yaml format config "
                        "(registered and used for this build)")
    b.add_argument("--sensitive", action="store_true",
                   help="also index the case-sensitive @s annotation")
    b.add_argument("--annotations", default="",
                   help="comma-separated parallel annotation columns")
    b.add_argument("--analyzer", default="standard",
                   help="analyzer registry key")
    b.add_argument("--id-column", default="url")
    b.add_argument("--store-text", action="store_true",
                   help="carry the original text into the index "
                        "(content store: original doc contents and "
                        "usecontent=orig concordances)")
    b.add_argument("--no-resume", action="store_true")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search")
    s.add_argument("--index", required=True,
                   help="index dir, or comma-separated dirs for "
                        "federated search (query-time merge)")
    s.add_argument("--terms", required=True)
    s.add_argument("--mode", default="or", choices=["or", "and"])
    s.add_argument("--algo", default="wand", choices=["wand", "taat"])
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--out", default=None, help="write results CSV")
    s.set_defaults(fn=cmd_search)

    ph = sub.add_parser("phrase")
    ph.add_argument("--index", required=True,
                    help="index dir, or comma-separated dirs "
                         "(federated)")
    ph.add_argument("--terms", required=True)
    ph.add_argument("-k", type=int, default=10)
    ph.set_defaults(fn=cmd_phrase)

    cq = sub.add_parser("cql")
    cq.add_argument("--index", required=True)
    cq.add_argument("--query", required=True)
    cq.add_argument("-k", type=int, default=10)
    cq.set_defaults(fn=cmd_cql)

    qt = sub.add_parser(
        "querytool",
        help="interactive/batch query console (QueryTool analogue)")
    qt.add_argument("--index", required=True)
    qt.add_argument("-f", "--file", default=None,
                    help="batch mode: read commands from file, print "
                         "per-query timing + hit counts")
    qt.set_defaults(fn=cmd_querytool)

    f = sub.add_parser("freq")
    f.add_argument("--input", required=True)
    f.add_argument("--group-by", default=None)
    f.add_argument("--text-col", default="text")
    f.add_argument("--out", default=None)
    f.add_argument("--limit", type=int, default=50)
    f.add_argument("--fmt", default="csv", choices=["csv", "json"])
    f.add_argument("--gzip", action="store_true")
    ec = sub.add_parser("export-corpus")
    ec.add_argument("index")
    ec.add_argument("out")
    ec.set_defaults(fn=cmd_export_corpus)
    fl = sub.add_parser("freq-lists")
    fl.add_argument("index")
    fl.add_argument("config")
    fl.add_argument("out", nargs="?", default=".")
    fl.add_argument("--json", action="store_true")
    fl.add_argument("--gzip", action="store_true")
    fl.set_defaults(fn=cmd_freq_lists)
    kw = sub.add_parser("kwic")
    kw.add_argument("--index", required=True)
    kw.add_argument("--term", required=True)
    kw.add_argument("--context", type=int, default=2)
    kw.add_argument("-k", type=int, default=20)
    kw.add_argument("--out", default=None)
    f.set_defaults(fn=cmd_freq)
    kw.set_defaults(fn=cmd_kwic)

    sv = sub.add_parser("serve")
    sv.add_argument("--corpus", action="append", default=None,
                    help="name=/path/to/index (repeatable)")
    sv.add_argument("--data-dir", default=None,
                    help="writable index root: enables POST/DELETE "
                         "/corpora/<name> and auto-registers its "
                         "existing indexes")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8080)
    sv.add_argument("--auth-header", default=None,
                    help="enable header auth: trusted reverse-proxy "
                         "header carrying the user id (HttpHeader"
                         "AuthMethod analogue), e.g. X-BlackLabUser")
    sv.add_argument("--auth-fixed-user", default=None,
                    help="debug auth: every request is this user "
                         "(AuthDebugFixed analogue)")
    sv.add_argument("--admin-user", action="append", default=None,
                    help="user allowed server-global operations "
                         "(cache-clear) when auth is enabled; "
                         "repeatable")
    sv.set_defaults(fn=cmd_serve)

    sy = sub.add_parser("sync")
    sy.add_argument("--index", required=True)
    sy.add_argument("--new", required=True,
                    help="new snapshot parquet dir")
    sy.add_argument("--old", default=None,
                    help="old snapshot parquet dir (defaults to the "
                         "index's content store — store_text builds)")
    sy.set_defaults(fn=cmd_sync)

    df = sub.add_parser("diff")
    df.add_argument("--old", required=True,
                    help="old snapshot parquet dir")
    df.add_argument("--new", required=True,
                    help="new snapshot parquet dir")
    df.add_argument("--out", required=True)
    df.add_argument("--id-col", default="url")
    df.add_argument("--text-col", default="text")
    df.add_argument("--include-unchanged", action="store_true")
    df.set_defaults(fn=cmd_diff)

    cl = sub.add_parser("clean")
    cl.add_argument("--input", required=True)
    cl.add_argument("--out", required=True)
    cl.add_argument("--op", required=True,
                    choices=("pii", "quality", "paragraph-dedup",
                             "chunk", "substr-dedup", "decontaminate",
                             "c4", "html", "links"))
    cl.add_argument("--text-col", default="text")
    cl.add_argument("--html-col", default="html")
    cl.add_argument("--id-col", default="doc_id")
    cl.add_argument("--keep-text", action="store_true")
    cl.add_argument("--chunk-tokens", type=int, default=256)
    cl.add_argument("--overlap", type=int, default=0)
    cl.add_argument("--window", type=int, default=32,
                    help="duplicate-substring window in tokens "
                         "(substr-dedup)")
    cl.add_argument("--keep-first", action="store_true",
                    help="substr-dedup: keep each duplicated run's "
                         "first occurrence (cut only later copies)")
    cl.add_argument("--keep-only", action="store_true",
                    help="emit only rows that pass (quality) or are "
                         "uncontaminated (decontaminate)")
    cl.add_argument("--benchmark",
                    help="benchmark parquet dir (decontaminate)")
    cl.add_argument("--ngram", type=int, default=3)
    cl.add_argument("--bloom", action="store_true",
                    help="Bloom-filter broadcast (decontaminate at "
                         "large benchmark sizes)")
    cl.set_defaults(fn=cmd_clean)

    mg = sub.add_parser("merge")
    mg.add_argument("--dst", required=True,
                    help="destination index dir (gains a generation)")
    mg.add_argument("--src", required=True,
                    help="source index dir (left untouched)")
    mg.add_argument("--compact", action="store_true",
                    help="fold the merged generation in afterwards")
    mg.set_defaults(fn=cmd_merge)

    cf = sub.add_parser("compact-federation")
    cf.add_argument("--index", required=True,
                    help="comma-separated federation dirs")
    cf.add_argument("--max-indexes", type=int, default=4)
    cf.set_defaults(fn=cmd_compact_federation)

    ml = sub.add_parser("mlt")
    ml.add_argument("--index", required=True,
                    help="index dir, or comma-separated dirs "
                         "(federated)")
    ml.add_argument("--doc-id", type=int, default=None)
    ml.add_argument("--url", default=None)
    ml.add_argument("-k", type=int, default=10)
    ml.add_argument("--max-terms", type=int, default=25)
    ml.set_defaults(fn=cmd_mlt)

    pr = sub.add_parser("pagerank")
    pr.add_argument("--input", required=True,
                    help="edge parquet (int64 or url-string columns)")
    pr.add_argument("--out", required=True)
    pr.add_argument("--src-col", default="src")
    pr.add_argument("--dst-col", default="dst")
    pr.add_argument("--iters", type=int, default=3)
    pr.add_argument("--damping", type=float, default=0.85)
    pr.add_argument("--algo", choices=("pagerank", "hits"),
                    default="pagerank",
                    help="hits writes (node, authority, hub) instead")
    pr.set_defaults(fn=cmd_pagerank)

    at = sub.add_parser("anchors")
    at.add_argument("--input", required=True,
                    help="link parquet (href + anchor columns, e.g. "
                         "from extract_links)")
    at.add_argument("--out", required=True)
    at.add_argument("--target-col", default="href")
    at.add_argument("--anchor-col", default="anchor")
    at.add_argument("--max-per-target", type=int, default=20)
    at.set_defaults(fn=cmd_anchors)

    sp = sub.add_parser("split")
    sp.add_argument("--input", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--weights", default="train=0.9,val=0.05,test=0.05")
    sp.add_argument("--seed", type=int, default=13)
    sp.add_argument("--id-col", default="doc_id")
    sp.set_defaults(fn=cmd_split)

    ex = sub.add_parser("export")
    ex.add_argument("--input", required=True)
    ex.add_argument("--out", required=True)
    ex.add_argument("--seq-len", type=int, default=1024)
    ex.add_argument("--seqs-per-shard", type=int, default=1024)
    ex.add_argument("--vocab-size", type=int, default=65536)
    ex.add_argument("--text-col", default="text")
    ex.add_argument("--id-col", default="doc_id")
    ex.add_argument("--curate", action="store_true",
                    help="run the curation recipe before packing")
    ex.add_argument("--languages", default="",
                    help="comma list for --curate (default: keep all)")
    ex.add_argument("--near-dup", action="store_true")
    ex.add_argument("--block-hosts", default="",
                    help="comma list of blocked hosts for --curate "
                         "(UT1/C4-style url blocklist, stage -2)")
    ex.add_argument("--block-patterns", default="",
                    help="comma list of blocked url RE2 patterns "
                         "for --curate")
    ex.add_argument("--eos", action="store_true",
                    help="insert an EOS delimiter after every doc")
    ex.add_argument("--tokenizer", default="word",
                    choices=["word", "bpe"],
                    help="word = top-V whole-word vocab; bpe = train "
                         "a BPE on the corpus and pack subword ids "
                         "(writes bpe_vocab.parquet + bpe_merges.json)")
    ex.add_argument("--merges", type=int, default=8192,
                    help="BPE merge count (--tokenizer bpe)")
    ex.set_defaults(fn=cmd_export)

    sc = sub.add_parser("score")
    sc.add_argument("--input", required=True)
    sc.add_argument("--out", required=True,
                    help="output parquet dir (streamed write)")
    sc.add_argument("--op", default="ppl",
                    choices=["ppl", "ppl-buckets", "quality",
                             "langid", "clf"])
    sc.add_argument("--text-col", default="text")
    sc.add_argument("--id-col", default="doc_id")
    sc.add_argument("--model", default=None,
                    help="model file for --op clf (from clf-train)")
    sc.set_defaults(fn=cmd_score)

    ct = sub.add_parser("clf-train")
    ct.add_argument("--input", required=True)
    ct.add_argument("--out", required=True,
                    help="model file (.npz)")
    ct.add_argument("--text-col", default="text")
    ct.add_argument("--label-col", required=True)
    ct.add_argument("--id-col", default="doc_id")
    ct.add_argument("--dim", type=int, default=1 << 16)
    ct.add_argument("--epochs", type=int, default=20)
    ct.add_argument("--lr", type=float, default=2.0)
    ct.set_defaults(fn=cmd_clf_train)

    g = sub.add_parser("gen")
    g.add_argument("--out", required=True)
    g.add_argument("--docs", type=int, default=10_000)
    g.add_argument("--shards", type=int, default=8)
    g.set_defaults(fn=cmd_gen)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
