"""BlackLab-Server-style HTTP surface (request handlers + DataStream).

The reference's main entry point is BLS: RequestHandler subclasses
dispatch on URL (server/.../requesthandlers/RequestHandler.java,
RequestHandlerHits.java), responses serialize through DataStream to
JSON or XML (server/.../datastream/) and grouped results export as CSV
(wslib/.../WriteCsv.java). Here the same surface is a set of PURE
handler functions over an ``IndexReader`` returning the BLS response
shapes (summary + hits + docInfos / hitGroups / docs — shapes mirrored
from test/data/saved-responses/), plus:

- ``to_xml``: DataStream-XML-convention serializer (lists render as
  repeated singular elements, ``docInfos`` keys become ``pid``
  attributes),
- ``groups_csv``: CSV of grouped results,
- ``BlsApp``: a WSGI app routing ``/corpora/<name>/hits|docs|...``
  with ``outputformat=json|xml|csv``,
- ``serve``: a localhost wsgiref server (the CLI's ``serve`` command).

Handlers hold no state; the reader actor/cache layers (query/service.py,
query/cache.py) remain the scale path — this module is the wire
protocol in front of them.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any
from xml.sax.saxutils import escape, quoteattr

import numpy as np

# ---------------------------------------------------------------------------
# parameter parsing
# ---------------------------------------------------------------------------

def _contextql_to_cql(reader, q: str) -> tuple:
    """SRU ContextQL pattern → ``(CQL pattern | None, filter
    expression | None)`` (``pattlang=contextql``; BlsUtils.parsePatt
    routing, WebserviceParamsImpl.java:151). The FULL contextql.jj
    grammar: recursive boolean trees, parens, ``[index relation]
    term`` clauses routed to annotations (contents patterns) or
    metadata fields (filter clauses, CompleteQuery analogue),
    wildcards, quoted phrases."""
    from blacklab_ray.query.contextql import contextql_to_patterns
    annots = {"word"} | {a for a in reader.annotations()
                         if a not in ("i", "s")}
    return contextql_to_patterns(q, annotations=annots)


def _fill_gaps(template: str, tsv: str) -> str:
    """``pattgapdata``: fill ``@@`` gaps in a CorpusQL template with
    the columns of each TSV row and OR the filled patterns together
    (GapFiller.java:89-109 — one TextPattern per value row, quotes
    escaped, missing columns empty)."""
    parts = template.split("@@")
    filled = []
    for line in tsv.split("\n"):
        row = line.split("\t")
        if not any(c.strip() for c in row):
            continue
        buf = [parts[0]]
        for i in range(len(parts) - 1):
            val = row[i] if i < len(row) else ""
            buf.append(val.replace('"', '\\"'))
            buf.append(parts[i + 1])
        filled.append("(" + "".join(buf) + ")")
    if not filled:
        raise ValueError("pattgapdata contains no value rows")
    return " | ".join(filled)


def _normalize_params(reader, params: dict) -> dict:
    """BLS search-parameter pre-processing (the remaining
    BlackLabServerParams.java NAMES): ``pattlang``/``pattgapdata``
    rewrite the pattern, ``docpid`` becomes a pid filter clause (404
    when unknown, BlsUtils.getDocIdFromPid), ``filterlang`` is
    validated. The execution/debug params ``usecache``,
    ``waitfortotal`` and ``fimatch`` are accepted without effect:
    handlers recompute every request (so usecache=no is the only
    behavior), totals are always exact (waitfortotal=yes semantics),
    and there is no NFA forward-index threshold to tune."""
    patt = params.get("patt")
    if patt:
        lang = params.get("pattlang", "corpusql")
        if lang == "contextql":
            cql, flt = _contextql_to_cql(reader, patt)
            if cql is None:
                # pure-metadata ContextQL: a docs query, no pattern
                params.pop("patt", None)
                patt = None
            else:
                params["patt"] = patt = cql
            if flt:
                f = params.get("filter")
                params["filter"] = f"({flt}) AND ({f})" if f else flt
        elif lang not in ("corpusql", "default"):
            raise ValueError(f"unsupported pattlang {lang!r}")
        gap = params.get("pattgapdata")
        if gap and lang != "contextql" and "@@" in patt:
            params["patt"] = _fill_gaps(patt, gap)
    if params.get("filterlang", "luceneql") != "luceneql":
        raise ValueError(
            f"unsupported filterlang {params['filterlang']!r}")
    docpid = params.get("docpid")
    if docpid:
        if _pid_doc_ids(reader, str(docpid)).size == 0:
            raise KeyError(
                f"document with pid {docpid!r} not found")
        clause = f'pid:"{docpid}"'
        f = params.get("filter")
        # parenthesize: the filter grammar gives AND precedence over
        # OR, so an unwrapped 'pid AND a OR b' would leak docs
        params["filter"] = f"{clause} AND ({f})" if f else clause
    return params


def _pid_doc_ids_many(reader, pids: list) -> np.ndarray:
    """doc ids for a list of pids (urls): cache misses resolve in ONE
    pruned ``url.isin`` pushdown scan, cached per reader lifetime
    (readers are reopened on every index mutation, which drops the
    cache) — the docpid 404 check and the pid-filter resolution share
    one scan per request, and N pid clauses in one filter cost one
    scan, not N."""
    cache = getattr(reader, "_pid_ids_cache", None)
    if cache is None:
        cache = reader._pid_ids_cache = {}
    missing = [p for p in pids if p not in cache]
    if missing:
        import pyarrow.compute as pc
        if len(cache) >= 4096:      # bound per-reader memory
            cache.clear()
        tbl = reader.fwd_dataset().to_table(
            columns=["doc_id", "url"],
            filter=pc.field("url").isin(missing))
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        urls = tbl["url"].to_pylist()
        for p in missing:
            cache[p] = np.empty(0, np.int64)
        by_pid: dict = {}
        for u, d in zip(urls, ids):
            by_pid.setdefault(u, []).append(int(d))
        for u, ds in by_pid.items():
            cache[u] = np.unique(np.asarray(ds, np.int64))
    sets = [cache[p] for p in pids]
    if not sets:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(sets))


def _pid_doc_ids(reader, pid: str) -> np.ndarray:
    return _pid_doc_ids_many(reader, [pid])


def _allowed_ids(reader, filter_expr: str | None):
    """Doc ids matching the BLS ``filter`` parameter — the Lucene-ish
    expression language (field:value / quoted phrases / [lo TO hi]
    ranges / wildcards, AND/OR/NOT, parens; LuceneUtil.
    parseLuceneQuery analogue). ``pid:`` clauses resolve by url
    lookup (cached per reader, shared with the docpid 404 check);
    tokenized ``field:value`` is an analyzed-token match."""
    if not filter_expr:
        return None
    from blacklab_ray.query.metafilter import (eval_filter_expr,
                                               parse_filter_expr)
    tree = parse_filter_expr(filter_expr)
    return eval_filter_expr(
        reader, tree,
        pid_resolver=lambda ps: _pid_doc_ids_many(reader, ps))


# ---------------------------------------------------------------------------
# handlers
# ---------------------------------------------------------------------------

def _context(reader, doc_ids, starts, ends, n_ctx: int,
             annots: tuple[str, ...] = ()):
    """left/match/right word lists per hit via forward-index gathers
    (Kwics/Contexts semantics) — one batched tokens_at per annotation.
    ``annots`` adds parallel annotations (lemma/pos/…) to each region
    dict — BLS lists all annotations by default; here the word-only
    default keeps the gather minimal and ``listvalues=`` opts in."""
    doc_lens = reader.doc_lens(doc_ids)
    regions: list[list[int]] = []
    flat_docs: list[int] = []
    flat_pos: list[int] = []
    for d, s, e, dl in zip(doc_ids, starts, ends, doc_lens):
        lo = max(0, int(s) - n_ctx)
        hi = min(int(dl), int(e) + n_ctx)
        span = list(range(lo, int(s))), list(range(int(s), int(e))), \
            list(range(int(e), hi))
        regions.append([len(span[0]), len(span[1]), len(span[2])])
        for part in span:
            flat_docs += [int(d)] * len(part)
            flat_pos += part
    fd = np.array(flat_docs, dtype=np.int64)
    fp = np.array(flat_pos, dtype=np.int64)
    streams = {"word": reader.tokens_at(fd, fp)}
    for a in annots:
        streams[a] = reader.tokens_at(fd, fp, annotation=a)
    out = []
    i = 0
    for nl, nm, nr in regions:
        L, M, R = {}, {}, {}
        for name, toks in streams.items():
            L[name] = toks[i:i + nl]
            M[name] = toks[i + nl:i + nl + nm]
            R[name] = toks[i + nl + nm:i + nl + nm + nr]
        i += nl + nm + nr
        out.append((L, M, R))
    return out


def _doc_meta_values(reader, doc_ids, params: dict | None = None
                     ) -> dict:
    """doc_id → {field: [values]} for docInfo metadata blocks
    (ResultDocInfo.getDocInfo: every metadata field by default,
    restricted by ``listmetadatavalues``; null values omitted).
    One pruned gather for the whole (window-sized) doc set."""
    fields = sorted(_field_types(reader))
    if params and params.get("listmetadatavalues"):
        want = {f for f in params["listmetadatavalues"].split(",")
                if f}
        fields = [f for f in fields if f in want]
    uniq = np.unique(np.asarray(doc_ids, np.int64))
    if not fields or uniq.size == 0:
        return {}
    import pyarrow.compute as pc
    tbl = reader.fwd_dataset().to_table(
        columns=["doc_id", *fields],
        filter=pc.field("doc_id").isin(uniq.tolist()))
    out: dict[int, dict] = {}
    ids = tbl["doc_id"].to_pylist()
    cols = {f: tbl[f].to_pylist() for f in fields}
    for i, did in enumerate(ids):
        m = {}
        for f in fields:
            v = cols[f][i]
            if v is None:
                continue
            m[f] = [str(v)]
        out[int(did)] = m
    return out


def _doc_infos(reader, doc_ids, params: dict | None = None) -> dict:
    urls = reader.urls(doc_ids)
    lens = reader.doc_lens(doc_ids)
    meta = _doc_meta_values(reader, doc_ids, params)
    return {str(u): {"pid": [str(u)],
                     **meta.get(int(did), {}),
                     "lengthInTokens": int(n),
                     "mayView": True}
            for u, did, n in zip(urls, doc_ids, lens)}


def _resolved_maxcount(params: dict) -> int:
    """The effective COUNT cap — the engine budget. BLS keeps
    counting past maxretrieve up to maxcount, so the engine may only
    stop enumerating at maxcount (a tighter engine clamp would
    under-report numberOfHits for results between the two caps);
    -1 = unlimited (no engine budget, the reference's behavior with
    counting uncapped)."""
    return int(params.get("maxcount", 10_000_000))


def _spans_table_for(reader, patt: str,
                     filter_expr: str | None,
                     max_spans: int | None = None):
    """Filtered + (doc,start)-sorted span table, capture columns
    included. With ``max_spans`` the ENGINE stops enumerating
    output-bound shapes at the cap (cql_spans_budgeted) — the
    stopped flag is surfaced through ``_apply_maxretrieve`` (pass
    ``engine_stopped``)."""
    from blacklab_ray.query.cql import cql_spans, cql_spans_budgeted
    if max_spans is not None and max_spans >= 0:
        spans, engine_stopped = cql_spans_budgeted(
            reader, patt, max_spans)
    else:
        spans, engine_stopped = cql_spans(reader, patt), False
    d = spans["doc_id"].to_numpy()
    allowed = _allowed_ids(reader, filter_expr)
    keep = None
    if allowed is not None:
        keep = np.isin(d, allowed)
        d = d[keep]
    s = spans["start"].to_numpy()
    if keep is not None:
        s = s[keep]
    order = np.lexsort((s, d))
    import pyarrow as pa
    cols = {}
    for c in spans.column_names:
        arr = spans[c].to_numpy()
        if keep is not None:
            arr = arr[keep]
        cols[c] = pa.array(arr[order])
    return pa.table(cols), engine_stopped


def _spans_for(reader, patt: str, filter_expr: str | None):
    t, _ = _spans_table_for(reader, patt, filter_expr)
    return (t["doc_id"].to_numpy(), t["start"].to_numpy(),
            t["end"].to_numpy())


def _apply_maxretrieve(spans_tbl, params: dict):
    """BLS maxretrieve/maxcount clamps (SearchSettings /
    MaxStats): hits beyond maxretrieve are not retrieved (they can't
    be sorted/grouped/rendered), counting continues to maxcount.
    Returns (clamped table, counted total, stoppedRetrieving,
    stoppedCounting). Defaults mirror BlackLabServerParams.java:
    113-114 (1M retrieve / 10M count); -1 = unlimited."""
    maxretrieve = int(params.get("maxretrieve", 1_000_000))
    maxcount = int(params.get("maxcount", 10_000_000))
    # BLS never processes more hits than it counts: an explicit
    # maxcount below maxretrieve lowers the retrieval cap too,
    # keeping numberOfHitsRetrieved <= numberOfHits
    if 0 <= maxcount and (maxretrieve < 0 or maxcount < maxretrieve):
        maxretrieve = maxcount
    n_all = spans_tbl.num_rows
    # engine-side budget clamp (cql_spans_budgeted): retrieval AND
    # counting already stopped inside the plan — the true total is
    # unknown beyond the retrieved prefix
    engine_stopped = bool(params.get("_engine_stopped"))
    stopped_retr = (0 <= maxretrieve < n_all) or engine_stopped
    stopped_count = (0 <= maxcount < n_all) or engine_stopped
    if stopped_retr:
        spans_tbl = spans_tbl.slice(0, maxretrieve)
    counted = min(n_all, maxcount) if maxcount >= 0 else n_all
    return spans_tbl, counted, stopped_retr, stopped_count


def _clamp_summary(summary: dict, counted: int | None,
                   stopped_retr: bool, stopped_count: bool) -> None:
    """counted=None: set only the stopped flags (the result set was
    re-filtered/sampled after retrieval, so the rendered count
    stands)."""
    if not (stopped_retr or stopped_count):
        return
    if counted is not None:
        summary["numberOfHits"] = counted
    summary["stoppedRetrievingHits"] = stopped_retr
    summary["stoppedCountingHits"] = stopped_count


def handle_hits(reader, params: dict) -> dict:
    """GET /corpora/<c>/hits — RequestHandlerHits analogue.
    ``facets=field:<f>`` adds per-facet distinct-doc counts;
    ``sort=<crit>`` orders hits by a HitProperty before windowing
    (criteria shared with ``group=``: ``hit:word:i`` matched text,
    ``field:<meta>``, ``wordleft:/wordright:`` context word,
    ``capture:...:<NAME>``; a ``-`` prefix sorts descending —
    HitProperty.deserialize's reverse convention). String keys
    compare by the engine's collation (the hits_ctx_sorted order),
    with (doc, start) as the stable tiebreak."""
    patt = params.get("patt", "")
    spans_tbl, engine_stopped = _spans_table_for(
        reader, patt, params.get("filter"),
        max_spans=_resolved_maxcount(params))
    params = dict(params, _engine_stopped=engine_stopped)
    spans_tbl, counted, stopped_retr, stopped_count = \
        _apply_maxretrieve(spans_tbl, params)
    if params.get("hitfiltercrit"):
        # BLS hitfiltercrit/hitfilterval (HitsFiltered.java:13): keep
        # hits whose property value equals the given value — criteria
        # shared with group=/sort=
        import pyarrow as pa
        keys, _prop = _group_keys(reader, spans_tbl,
                                  params["hitfiltercrit"],
                                  n_ctx=int(params.get(
                                      "wordsaroundhit", 5)))
        want = params.get("hitfilterval", "")
        # typed bool: an EMPTY comprehension otherwise infers null
        # type and Arrow rejects it as a filter mask
        spans_tbl = spans_tbl.filter(
            pa.array([k == want for k in keys], pa.bool_()))
    if params.get("sample") or params.get("samplenum"):
        # BLS sample/samplenum/sampleseed: the engine's deterministic
        # seeded hash sampling (md5_low64(doc:pos:seed), partition-
        # order independent — HashSampleHits semantics). samplenum
        # keeps the first n of the seed-shuffled order (hash asc).
        import pyarrow as pa

        from blacklab_ray.pipelines.hits import md5_low64
        seed = int(params.get("sampleseed", 17))
        d0 = spans_tbl["doc_id"].to_numpy()
        s0 = spans_tbl["start"].to_numpy()
        from blacklab_ray.util import md5_low64_keyed
        hv = (md5_low64_keyed(d0.astype(np.int64),
                              s0.astype(np.int64), seed)
              % (1 << 20)).astype(np.int64)
        if params.get("sample"):
            frac = float(params["sample"]) / 100.0  # BLS: percentage
            thresh = int(round(frac * (1 << 20)))
            idx = np.flatnonzero(hv < thresh)
        else:
            n = int(params["samplenum"])
            idx = np.sort(np.argsort(hv, kind="stable")[:n])
        spans_tbl = spans_tbl.take(pa.array(idx, pa.int64()))
    if params.get("sort"):
        crit = params["sort"]
        desc = crit.startswith("-")
        keys, _prop = _group_keys(reader, spans_tbl,
                                  crit.lstrip("-"),
                                  n_ctx=int(params.get(
                                      "wordsaroundhit", 5)))
        from blacklab_ray.analysis.collate import key_for_context
        if _is_numeric_crit(crit.lstrip("-")):
            ck: list = [int(k) for k in keys]
        else:
            ck = [key_for_context(k, sensitive=False) for k in keys]
        order = sorted(range(len(ck)),
                       key=lambda i: ck[i], reverse=desc)
        import pyarrow as pa
        spans_tbl = spans_tbl.take(pa.array(order, pa.int64()))
    d = spans_tbl["doc_id"].to_numpy()
    s = spans_tbl["start"].to_numpy()
    e = spans_tbl["end"].to_numpy()
    if params.get("calc") == "colloc":
        # BLS /hits?calc=colloc (RequestHandlerHits.java's colloc
        # branch → TermFrequencyList.collocations): frequencies of the
        # context words around the hits, the hit tokens themselves
        # excluded (Contexts.java:166 semantics) — computed over the
        # filtered/sampled span set so hitfiltercrit/sample compose.
        # Context width defaults to 10: the reference's saved colloc
        # responses reproduce EXACTLY at wordsaroundhit=10.
        # ``annotation=`` collocates a parallel annotation's tokens
        # (lemma/pos) instead of the word form
        n_ctx = int(params.get("wordsaroundhit", 10))
        # '' and 'word' both mean the word form (a blank param must
        # not leak into tokens_at as a bogus annotation route)
        annot = params.get("annotation") or None
        if annot == "word":
            annot = None
        if annot is not None and \
                annot not in _annotation_names(reader):
            raise KeyError(f"unknown annotation {annot!r}")
        return {"tokenFrequencies": _colloc_counts(
            reader, d, s, e, n_ctx, annotation=annot)}
    resp = _render_hits(reader, params, d, s, e, spans_tbl=spans_tbl)
    refiltered = bool(params.get("hitfiltercrit")
                      or params.get("sample")
                      or params.get("samplenum"))
    _clamp_summary(resp["summary"], None if refiltered else counted,
                   stopped_retr, stopped_count)
    if params.get("includetokencount") in ("true", "yes", "1", True):
        # RequestHandlerHits.java:76 tokensInMatchingDocuments: total
        # tokens across the docs the hits fall in (opt-in: it costs a
        # doc_len gather over every matched doc). Computed from the
        # PROCESSED hit set — the reference does the same
        # (ResultHits.java:346 builds perDocResults from the
        # retrieval-clamped Hits object)
        ud = np.unique(d)
        resp["summary"]["tokensInMatchingDocuments"] = (
            int(reader.doc_lens(ud).sum()) if ud.size else 0)
    if params.get("facets"):
        resp["facets"] = _facets(reader, d, params["facets"])
    return resp


def _capture_groups(spans_tbl, first: int, number: int,
                    omit_empty: bool) -> list | None:
    """Per-hit ``captureGroups`` lists for the response window —
    BLS's hit shape (DStream.java:329: [{name, start, end}, ...]),
    null/unmatched groups skipped, zero-length ones skipped under
    ``omitemptycapture``. Returns None when the pattern has no
    capture columns (the entry is omitted, like BLS without
    capturedGroups)."""
    caps: list[tuple[str, str]] = []   # (group name, kind)
    for c in spans_tbl.column_names:
        if c.endswith("_pos"):
            caps.append((c[:-4], "pos"))
        elif c.endswith("_start"):
            caps.append((c[:-6], "span"))
    if not caps:
        return None
    win = spans_tbl.slice(first, number)
    out: list[list[dict]] = [[] for _ in range(win.num_rows)]
    for name, kind in caps:
        if kind == "pos":
            st = win[f"{name}_pos"].to_numpy()
            en = st + 1
        else:
            st = win[f"{name}_start"].to_numpy()
            en = win[f"{name}_end"].to_numpy()
        for i in range(win.num_rows):
            a, b = int(st[i]), int(en[i])
            if a < 0 or (omit_empty and a >= b):
                continue
            out[i].append({"name": name, "start": a, "end": b})
    return out


def _stored_texts(reader, doc_ids: np.ndarray) -> dict:
    """doc_id → stored original text (content-store column), pruned
    isin gather; {} when the index was built without store_text."""
    import pyarrow.compute as pc
    ds = reader.fwd_dataset()
    if "text" not in ds.schema.names:
        return {}
    uniq = np.unique(doc_ids)
    tbl = ds.to_table(columns=["doc_id", "text"],
                      filter=pc.field("doc_id").isin(uniq.tolist()))
    return dict(zip(tbl["doc_id"].to_pylist(),
                    tbl["text"].to_pylist()))


def _orig_concordances(reader, wd, ws, we, n_ctx: int):
    """Per-hit (left, match, right) RAW TEXT fragments cut from the
    stored original by token char offsets — BLS's
    ConcordanceType.CONTENT_STORE (usecontent=orig). Returns None when
    the index has no content-store column, or per-hit None when the
    offset tokenizer doesn't align with the indexed positions (custom
    analyzers) — callers fall back to forward-index rendering."""
    from blacklab_ray.analysis.analyzers import strip_accents
    from blacklab_ray.stages.offsets import token_offsets
    texts = _stored_texts(reader, wd)
    if not texts:
        return None
    offcache: dict[int, list] = {}
    out = []
    for did, a, b in zip(wd.tolist(), ws.tolist(), we.tolist()):
        txt = texts.get(int(did))
        if txt is None:
            out.append(None)
            continue
        # token_offsets indexes into the accent-stripped DISPLAY text
        # (NFKD can change string length: 'ﬁ' → 'fi'), so slice that
        # same string — identity on ASCII corpora
        txt = strip_accents(txt)
        offs = offcache.get(int(did))
        if offs is None:
            offs = offcache[int(did)] = token_offsets(txt)
        if b > len(offs) or a < 0 or a >= b:
            out.append(None)     # offset/position misalignment
            continue
        lo = max(0, a - n_ctx)
        hi = min(len(offs), b + n_ctx)
        left = txt[offs[lo][0]:offs[a][0]] if a > lo else ""
        match = txt[offs[a][0]:offs[b - 1][1]]
        right = txt[offs[b - 1][1]:offs[hi - 1][1]] if hi > b else ""
        out.append((left, match, right))
    return out


def _render_hits(reader, params: dict, d, s, e,
                 spans_tbl=None) -> dict:
    """Window + context + docInfos for a span set (the hits response
    body, shared by /hits and the viewgroup view)."""
    first = int(params.get("first", 0))
    number = int(params.get("number", 50))
    n_ctx = int(params.get("wordsaroundhit", 1))
    total = int(d.size)
    n_docs = int(np.unique(d).size)
    wd, ws, we = d[first:first + number], s[first:first + number], \
        e[first:first + number]
    annots: tuple[str, ...] = ()
    if params.get("listvalues"):
        have = set(_annotation_names(reader))
        want = [a for a in params["listvalues"].split(",")
                if a and a != "word"]
        missing = [a for a in want if a not in have]
        if missing:
            raise KeyError(f"unknown annotation(s) in listvalues: "
                           f"{missing}")
        annots = tuple(want)
    ctx = _context(reader, wd, ws, we, n_ctx, annots=annots)
    urls = reader.urls(wd)
    hits = [{"docPid": str(u), "start": int(a), "end": int(b),
             "left": L, "match": M, "right": R}
            for u, a, b, (L, M, R) in zip(urls, ws, we, ctx)]
    if params.get("usecontent") == "orig":
        # BLS usecontent=orig: concordances cut from the stored
        # original (content store) instead of forward-index tokens;
        # hits whose doc/analyzer can't be offset-aligned keep the
        # fwd rendering
        orig = _orig_concordances(reader, wd, ws, we, n_ctx)
        if orig is not None:
            for h, frag in zip(hits, orig):
                if frag is not None:
                    h["left"], h["match"], h["right"] = frag
    if spans_tbl is not None:
        # BLS spells it "omitemptycaptures"; the singular is kept for
        # backward compatibility with earlier clients of this server
        groups = _capture_groups(
            spans_tbl, first, number,
            omit_empty=params.get(
                "omitemptycaptures",
                params.get("omitemptycapture", ""))
            in ("true", "yes", "1", True))
        if groups is not None:
            for h, g in zip(hits, groups):
                h["captureGroups"] = g
    return {
        "summary": _summary(params, first, number, len(hits), total,
                            n_docs),
        "hits": hits,
        "docInfos": _doc_infos(reader, np.unique(wd), params),
    }


def _doc_field_lookup(reader, doc_ids: np.ndarray,
                      fieldname: str) -> dict:
    """doc_id → metadata value, hit-doc-pruned gather ('pid' = url)."""
    if fieldname == "pid":
        uniq = np.unique(doc_ids)
        return dict(zip(uniq.tolist(), reader.urls(uniq)))

    import pyarrow.compute as pc
    uniq = np.unique(doc_ids)
    tbl = reader.fwd_dataset().to_table(
        columns=["doc_id", fieldname],
        filter=pc.field("doc_id").isin(uniq.tolist()))
    return dict(zip(tbl["doc_id"].to_pylist(),
                    tbl[fieldname].to_pylist()))


def _subcorpus_size(reader, filter_expr: str | None) -> dict:
    """{documents, tokens} of the filter-defined subcorpus — the
    reference's WebserviceParamsImpl.subcorpus() (the metadata filter
    only, or all live docs) sized via DocResults.subcorpusSize()
    (ResultHitsGrouped.java:96, ResultDocsGrouped.java:75). With no
    filter and no tombstones this is the O(1) index metadata; else a
    pruned (doc_id, doc_len) gather."""
    allowed = _allowed_ids(reader, filter_expr)
    if allowed is None and not reader.tombstones:
        return {"documents": int(reader.n_docs),
                "tokens": int(reader.meta["total_tokens"])}
    if allowed is None:
        allowed = reader.all_doc_ids()
    else:
        allowed = allowed[reader.mask_tombstones(allowed)]
    if allowed.size == 0:
        return {"documents": 0, "tokens": 0}
    return {"documents": int(allowed.size),
            "tokens": int(reader.doc_lens(allowed).sum())}


def _meta_subcorpus_sizes(reader, fields: list[str],
                          filter_expr: str | None,
                          transforms: list | None = None) -> dict:
    """metadata-value tuple → {documents, tokens} over the
    filter-defined subcorpus: the per-group CorpusSize of
    WebserviceOperations.findSubcorpusSize (the reference runs one
    Lucene count query PER GROUP; one pruned (fields…, doc_len) scan
    aggregated per value covers every group at once). ``transforms``
    maps each field's raw value to its group key (decade binning)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    tfs = transforms or [str] * len(fields)
    # one scan per (fields, filter) per reader lifetime — the reader
    # is reopened on every index mutation, which drops the cache
    cache_key = (tuple(fields),
                 tuple(getattr(tf, "__name__", "?") for tf in tfs),
                 filter_expr)
    cache = getattr(reader, "_subcorpus_cache", None)
    if cache is None:
        cache = reader._subcorpus_cache = {}
    hit = cache.get(cache_key)
    if hit is not None:
        return hit
    allowed = _allowed_ids(reader, filter_expr)
    flt = (pc.field("doc_id").isin(allowed.tolist())
           if allowed is not None else None)
    phys = ["url" if f == "pid" else f for f in fields]
    uphys = list(dict.fromkeys(phys))
    tbl = reader.fwd_dataset().to_table(
        columns=["doc_id", *uphys, "doc_len"], filter=flt)
    live = reader.mask_tombstones(tbl["doc_id"].to_numpy())
    if not live.all():
        tbl = tbl.filter(pa.array(live))
    # vectorized per-value aggregation; transforms (decade binning)
    # then collapse the distinct-value-sized result in Python
    agg = tbl.group_by(uphys).aggregate([("doc_len", "sum"),
                                         ("doc_id", "count")])
    cols = [agg[f].to_pylist() for f in phys]
    sums = agg["doc_len_sum"].to_pylist()
    cnts = agg["doc_id_count"].to_pylist()
    out: dict[tuple, dict] = {}
    for i in range(agg.num_rows):
        key = tuple(tf(c[i]) for tf, c in zip(tfs, cols))
        g = out.setdefault(key, {"documents": 0, "tokens": 0})
        g["documents"] += int(cnts[i])
        g["tokens"] += int(sums[i])
    if len(cache) >= 32:      # bound per-reader memory
        cache.pop(next(iter(cache)))
    cache[cache_key] = out
    return out


def _decade_key(v) -> str:
    """PropertyValueDecade display: year floored to its decade,
    'Y-(Y+9)'; unparseable → 'unknown'
    (DocPropertyDecade.java:36-44, PropertyValueDecade.java:23-28)."""
    try:
        y = int(str(v))
    except (TypeError, ValueError):
        return "unknown"
    y -= y % 10
    return f"{y}-{y + 9}"


def _group_ident_key(k, numeric: bool):
    """Sort key for a group identity string. Numeric identities
    (docid/hitposition/fieldlen groups, decade ranges, typed numeric
    metadata) order by leading number — '10' after '2', '200-209'
    before '1990-1999' — with unparseable values ('unknown') last,
    matching the doc-sort convention (PropertyValueDecade compares by
    decade int). Collated identities get a sensitive secondary key so
    case-folded-equal groups order deterministically (the
    collate.sort_terms convention)."""
    k = str(k)
    if numeric:
        try:
            return (0, float(k), "")
        except (TypeError, ValueError):
            m = re.match(r"-?\d+", k)
            if m:
                return (0, float(m.group()), k)
            return (1, 0.0, k)
    from blacklab_ray.analysis.collate import key_for_context
    return (key_for_context(k, sensitive=False), k)


def _order_groups(items: list, sort_spec: str | None,
                  numeric: bool = False) -> list:
    """Order (identity, group) pairs. Default: size desc, identity
    asc (the view every grouped test pins). ``sort=`` accepts the
    GroupProperty criteria ``size`` / ``identity`` (HitGroupProperty
    Size/Identity), ``-`` prefix for descending. The identity
    tie-break under size sorts stays ASCENDING in both directions, so
    sort=-size is the same view the no-sort default pins."""
    def ident(kv):
        return _group_ident_key(kv[0], numeric)
    if not sort_spec:
        return sorted(items, key=lambda kv: (-kv[1]["size"], ident(kv)))
    desc = sort_spec.startswith("-")
    c = sort_spec.lstrip("-")
    if c == "size":
        sign = -1 if desc else 1
        return sorted(items,
                      key=lambda kv: (sign * kv[1]["size"], ident(kv)))
    if c == "identity":
        return sorted(items, key=ident, reverse=desc)
    raise ValueError(f"unknown group sort criterion {sort_spec!r}")


def _is_numeric_crit(crit: str) -> bool:
    """Criteria whose keys are integers — sorted numerically, not by
    string collation ('10' < '2' lexicographically)."""
    return crit in ("hitposition", "docid") or crit == "fieldlen" \
        or crit.startswith("fieldlen:")


def _group_keys(reader, spans_tbl, crit: str, n_ctx: int = 5):
    """Per-hit group key under a HitProperty criterion; returns
    (keys, property-name). Comma-separated criteria compose
    (HitPropertyMultiple: PropertySerializeUtil.splitMultiple on ','),
    with component identities joined by ' / '
    (PropertyValueMultiple.toString). ``n_ctx`` bounds the left:/
    right: full-context criteria (the reference's context-size
    setting, default 5)."""
    if "," in crit:
        parts = [c for c in crit.split(",") if c]
        if len(parts) > 1:
            sub = [_group_keys(reader, spans_tbl, c, n_ctx=n_ctx)
                   for c in parts]
            keys = [" / ".join(ks) for ks in zip(*(k for k, _n in sub))]
            return keys, ",".join(n for _k, n in sub)
        crit = parts[0]
    d = spans_tbl["doc_id"].to_numpy()
    s = spans_tbl["start"].to_numpy()
    e = spans_tbl["end"].to_numpy()
    if crit.startswith("field:"):
        fieldname = crit.split(":", 1)[1]
        lookup = _doc_field_lookup(reader, d, fieldname)
        return [str(lookup.get(int(x))) for x in d], f"doc:{fieldname}"
    if crit.startswith("decade:"):
        # HitPropertyDocumentDecade: the metadata year floored to
        # its decade
        fieldname = crit.split(":", 1)[1]
        lookup = _doc_field_lookup(reader, d, fieldname)
        return [_decade_key(lookup.get(int(x))) for x in d], crit
    if crit == "docid":
        # HitPropertyDocumentId: the index-internal doc id
        return [str(int(x)) for x in d], "docid"
    if crit == "doc":
        # HitPropertyDoc: the document itself (pid identity)
        uniq = np.unique(d)
        lk = dict(zip(uniq.tolist(), reader.urls(uniq)))
        return [str(lk.get(int(x))) for x in d], "doc"
    if crit == "hitposition":
        return [str(int(x)) for x in s], "hitposition"
    if crit == "fieldlen" or crit.startswith("fieldlen:"):
        # HitPropertyDocumentStoredField's length sibling
        # (DocPropertyAnnotatedFieldLength): the doc's token length
        lens = reader.doc_lens(d)
        return [str(int(x)) for x in lens], crit
    if crit.startswith(("left:", "right:")):
        # HitPropertyLeftContext / RightContext: the FULL context
        # window (n_ctx words), left compared/displayed nearest-word-
        # first (HitPropertyLeftContext.java:63-66 reverses the array)
        if crit.startswith("left:"):
            lens_ctx = np.minimum(n_ctx, s).astype(np.int64)
            base = s - 1
            sign = -1
        else:
            dl = reader.doc_lens(d)
            lens_ctx = np.minimum(n_ctx, np.maximum(dl - e, 0)) \
                .astype(np.int64)
            base = e
            sign = 1
        csum = np.cumsum(lens_ctx) if lens_ctx.size else \
            np.zeros(0, np.int64)
        tot = int(csum[-1]) if lens_ctx.size else 0
        flat_docs = np.repeat(d, lens_ctx)
        local = (np.arange(tot, dtype=np.int64)
                 - np.repeat(csum - lens_ctx, lens_ctx))
        flat_pos = np.repeat(base, lens_ctx) + sign * local
        toks = reader.tokens_at(flat_docs, flat_pos)
        keys = [" ".join(filter(None, toks[a:b]))
                for a, b in zip((csum - lens_ctx).tolist(),
                                csum.tolist())]
        return keys, crit
    if crit.startswith(("wordright:", "wordleft:")):
        # group by the context word adjacent to the hit; a hit at the
        # doc edge groups under the empty key (BLS does the same)
        right = crit.startswith("wordright:")
        pos = e.copy() if right else s - 1
        lens = reader.doc_lens(d)
        ok = (pos < lens) if right else (pos >= 0)
        toks = reader.tokens_at(d[ok], pos[ok])
        keys = [""] * int(d.size)
        for i, t in zip(np.flatnonzero(ok), toks):
            keys[int(i)] = t or ""
        return keys, crit
    if crit.startswith("capture:"):
        cap = crit.rsplit(":", 1)[-1]
        if f"{cap}_pos" in spans_tbl.column_names:
            cpos = spans_tbl[f"{cap}_pos"].to_numpy()
            ok = cpos >= 0
            toks = reader.tokens_at(d[ok], cpos[ok])
            keys = [""] * int(d.size)
            for i, t in zip(np.flatnonzero(ok), toks):
                keys[int(i)] = t or ""
            return keys, crit
        if f"{cap}_start" in spans_tbl.column_names:
            # multi-token group capture: identity is the captured
            # sub-span's full text (same ragged batched gather as the
            # hit:word identity below)
            cs = spans_tbl[f"{cap}_start"].to_numpy()
            ce = spans_tbl[f"{cap}_end"].to_numpy()
            lens = np.maximum(ce - cs, 0).astype(np.int64)
            csum = np.cumsum(lens) if lens.size else \
                np.zeros(0, np.int64)
            tot = int(csum[-1]) if lens.size else 0
            flat_docs = np.repeat(d, lens)
            flat_pos = (np.repeat(cs, lens)
                        + np.arange(tot, dtype=np.int64)
                        - np.repeat(csum - lens, lens))
            toks = reader.tokens_at(flat_docs, flat_pos)
            keys = [" ".join(filter(None, toks[a:b]))
                    for a, b in zip((csum - lens).tolist(),
                                    csum.tolist())]
            return keys, crit
        raise KeyError(f"no capture group {cap!r} in pattern")
    if crit.startswith("context:"):
        # HitPropertyContextWords ('context:word:s:L1-1;H1-2'):
        # arbitrary context-word specs — L = left of hit
        # (nearest-first), H = hit words (1-based), R = right of
        # hit, E = hit words from the end; a descending range
        # (H2-1) reverses; out-of-range slots serialize as '~'
        # (PropertyValueContext.serializeTerm(NO_TERM))
        cparts = crit.split(":", 3)
        if len(cparts) != 4:
            raise KeyError(
                f"context criterion needs annotation:sensitivity:"
                f"spec, got {crit!r}")
        _, annot, sens, spec = cparts
        annotation = _crit_annotation(annot, sens)
        keys = _context_words_keys(reader, d, s, e, spec, annotation)
        return keys, crit
    if not crit.startswith("hit:"):
        # HitProperty.deserialize rejects unknown criteria; a silent
        # hit-text fallback would mask caller typos ('filed:lang')
        raise KeyError(f"unknown hit property criterion {crit!r}")
    # hit:<annot>:<sens> — group by the FULL matched text of the
    # given annotation/sensitivity (BLS groups multi-token hits by
    # all tokens s..e-1, not the first word — ADVICE r3;
    # TestHitProperties.testHitPropHitText groups 'the' vs 'The'
    # under hit:word:s): one batched tokens_at over ragged positions
    hparts = crit.split(":")
    annot = hparts[1] if len(hparts) > 1 and hparts[1] else "word"
    sens = hparts[2] if len(hparts) > 2 and hparts[2] else "i"
    annotation = _crit_annotation(annot, sens)
    lens = (e - s).astype(np.int64)
    csum = np.cumsum(lens) if lens.size else np.zeros(0, np.int64)
    flat_docs = np.repeat(d, lens)
    flat_pos = (np.repeat(s, lens)
                + np.arange(int(csum[-1]) if lens.size else 0,
                            dtype=np.int64)
                - np.repeat(csum - lens, lens))
    toks = reader.tokens_at(flat_docs, flat_pos,
                            annotation=annotation)
    keys = [" ".join(filter(None, toks[a:b]))
            for a, b in zip((csum - lens).tolist(), csum.tolist())]
    return keys, f"hit:{annot}:{sens}"


def _crit_annotation(annot: str, sens: str):
    """Criterion annotation route: word:i → the insensitive stream
    (None = fwd default), word:s → the @s annotation, parallel
    annotations by name (their single stored stream)."""
    if annot == "word":
        return "s" if sens == "s" else None
    return annot


_CTX_SPEC_RE = re.compile(r"^([LHRE])(\d+)(?:-(\d+))?$", re.I)

# Index.PATT_INDEXID (server/.../index/Index.java:351,
# TestBlsUtils.testIsValidIndexName): optional userid prefix
# ('user@example.com:') then the short name. re.ASCII matches Java's
# ASCII-default \w — unicode \w would silently widen the accepted
# surface past the reference's.
_INDEXID_RE = re.compile(
    r"^(?:([\w\-.!$&'()*+,;=@]+):)?([\w\-.]+)$", re.ASCII)


def serialize_term(t: "str | None") -> str:
    """PropertyValueContext.serializeTerm (TestHitProperties.
    testTermSerialization): NO_TERM → '~'; all-tilde terms gain one
    more tilde; everything else verbatim."""
    if t is None:
        return "~"
    if t and set(t) == {"~"}:
        return t + "~"
    return t


def _context_words_keys(reader, d, s, e, spec: str,
                        annotation) -> list[str]:
    n = int(d.size)
    doc_lens = reader.doc_lens(d) if n else np.zeros(0, np.int64)
    slots: list[list] = [[] for _ in range(n)]
    for part in spec.split(";"):
        m = _CTX_SPEC_RE.match(part.strip())
        if m is None:
            raise KeyError(f"bad context-words spec part {part!r}")
        side = m.group(1).upper()
        a = int(m.group(2))
        b = int(m.group(3)) if m.group(3) else a
        step = 1 if b >= a else -1
        for k in range(a, b + step, step):
            if side == "L":
                pos = s - k                  # nearest-first
                ok = pos >= 0
            elif side == "H":
                pos = s + (k - 1)
                ok = pos < e
            elif side == "E":
                pos = e - k
                ok = pos >= s
            else:                            # R
                pos = e + (k - 1)
                ok = pos < doc_lens
            valid = np.flatnonzero(ok)
            toks = reader.tokens_at(d[valid], pos[valid],
                                    annotation=annotation) \
                if valid.size else []
            col = [None] * n
            for i, t in zip(valid, toks):
                col[int(i)] = t
            for i in range(n):
                slots[i].append(col[i])
    return [" ".join(serialize_term(t) for t in row)
            for row in slots]


def _facets(reader, doc_ids: np.ndarray, spec: str) -> dict:
    """BLS facets block: per facet field, distinct-doc counts per
    value (``facets=field:pid`` → {"pid": [{"value","size"},...]}),
    size-desc then value-asc."""
    out = {}
    for part in spec.split(","):
        part = part.strip()
        if not part.startswith("field:"):
            raise ValueError(f"unsupported facet {part!r}")
        fieldname = part.split(":", 1)[1]
        lookup = _doc_field_lookup(reader, doc_ids, fieldname)
        counts: dict[str, int] = {}
        for did in np.unique(doc_ids):
            v = str(lookup.get(int(did)))
            counts[v] = counts.get(v, 0) + 1
        key = fieldname.removeprefix("meta_")
        out[key] = [{"value": v, "size": n} for v, n in
                    sorted(counts.items(), key=lambda kv: (-kv[1],
                                                           kv[0]))]
    return out


def handle_hits_grouped(reader, params: dict) -> dict:
    """GET /hits?group= — HitGroups analogue. Supported group
    criteria: ``hit:word:i`` (matched text), ``field:<meta>``,
    ``decade:<meta>``, ``wordright:word:i`` / ``wordleft:word:i``
    (adjacent context word), ``left:word:i`` / ``right:word:i``
    (full context window, left nearest-word-first), ``doc`` /
    ``docid`` / ``hitposition`` / ``fieldlen``, and
    ``capture:word:i:<NAME>`` (captured token's word).

    ``viewgroup=<identity-suffix>`` returns the HITS of one group
    (RequestHandlerHits' group-contents view) instead of the group
    list."""
    patt = params.get("patt", "")
    crit = params["group"]
    first = int(params.get("first", 0))
    number = int(params.get("number", 50))
    spans_tbl, engine_stopped = _spans_table_for(
        reader, patt, params.get("filter"),
        max_spans=_resolved_maxcount(params))
    params = dict(params, _engine_stopped=engine_stopped)
    spans_tbl, counted, stopped_retr, stopped_count = \
        _apply_maxretrieve(spans_tbl, params)
    d = spans_tbl["doc_id"].to_numpy()
    total = int(d.size)
    keys, prop = _group_keys(reader, spans_tbl, crit,
                             n_ctx=int(params.get("wordsaroundhit",
                                                  5)))
    if params.get("viewgroup") is not None:
        want = params["viewgroup"]
        want = want.split(":", 1)[1] if want.startswith("str:") else want
        sel = np.array([k == want for k in keys], dtype=bool)
        import pyarrow as pa
        sub = spans_tbl.take(pa.array(np.flatnonzero(sel)))
        vg = _render_hits(reader, params, d[sel],
                          spans_tbl["start"].to_numpy()[sel],
                          spans_tbl["end"].to_numpy()[sel],
                          spans_tbl=sub)
        # the group was built from the clamped retrieval — surface
        # the stopped* flags (counts stay the group's own)
        _clamp_summary(vg["summary"], None, stopped_retr,
                       stopped_count)
        return vg
    # metadata criteria components drive per-group subcorpusSize
    # (ResultHitGroup.java:55 computes the size of the subcorpus
    # matching the group's doc-property values; frontends use it for
    # relative frequencies)
    crit_parts = [c for c in crit.split(",") if c] or [crit]
    meta_comps = [(c.split(":", 1)[1],
                   _decade_key if c.startswith("decade:") else str)
                  for c in crit_parts
                  if c.startswith(("field:", "decade:"))]
    meta_fields = [f for f, _tf in meta_comps]
    meta_keys = None
    if meta_comps:
        lookups = [(_doc_field_lookup(reader, d, f), tf)
                   for f, tf in meta_comps]
        meta_keys = [tuple(tf(lk.get(int(x))) for lk, tf in lookups)
                     for x in d]
    include_contents = params.get("includegroupcontents") in \
        ("true", "yes", "1", True)
    groups: dict[str, dict] = {}
    for i, (k, doc) in enumerate(zip(keys, d)):
        g = groups.setdefault(k, {"size": 0, "docs": set()})
        g["size"] += 1
        g["docs"].add(int(doc))
        if include_contents:
            g.setdefault("idx", []).append(i)
        if meta_keys is not None and "meta" not in g:
            g["meta"] = meta_keys[i]
    numeric_ident = (len(crit_parts) == 1
                     and (_is_numeric_crit(crit_parts[0])
                          or crit_parts[0].startswith("decade:")))
    ordered = _order_groups(list(groups.items()), params.get("sort"),
                            numeric=numeric_ident)
    window = ordered[first:first + number]
    sizes = (_meta_subcorpus_sizes(reader, meta_fields,
                                   params.get("filter"),
                                   transforms=[tf for _f, tf
                                               in meta_comps])
             if meta_comps else None)

    def _contents_for(win) -> tuple[dict, dict]:
        # includegroupcontents=yes (RequestHandlerHitsGrouped.java:
        # 61-66): every windowed group's hits rendered through ONE
        # batched context/url/docInfo gather, then split per group
        import pyarrow as pa
        idxs: list[int] = []
        bounds = []
        for k, g in win:
            bounds.append((k, len(idxs), len(idxs) + len(g["idx"])))
            idxs.extend(g["idx"])
        sub = spans_tbl.take(pa.array(idxs, pa.int64()))
        d_ = sub["doc_id"].to_numpy()
        s_ = sub["start"].to_numpy()
        e_ = sub["end"].to_numpy()
        ctx = _context(reader, d_, s_, e_,
                       int(params.get("wordsaroundhit", 1)))
        urls = reader.urls(d_)
        hits = [{"docPid": str(u), "start": int(a), "end": int(b),
                 "left": L, "match": M, "right": R}
                for u, a, b, (L, M, R) in zip(urls, s_, e_, ctx)]
        per_group = {k: hits[lo:hi] for k, lo, hi in bounds}
        return per_group, _doc_infos(reader, np.unique(d_), params)

    if include_contents:
        group_hits, content_infos = _contents_for(window)
    else:
        group_hits, content_infos = {}, {}
    resp = {
        "summary": {
            **_summary(params, first, number, len(window), total,
                       int(np.unique(d).size)),
            "numberOfGroups": len(groups),
            "largestGroupSize": max(
                (g["size"] for _k, g in ordered), default=0),
            # ResultHitsGrouped.java:96/126: grouped summaries always
            # carry the filter-subcorpus size
            "subcorpusSize": _subcorpus_size(reader,
                                             params.get("filter")),
        },
        "hitGroups": [{
            "identity": (
                f"cws:{prop.split(':')[1]}:{prop.split(':')[2]}:{k}"
                if prop.startswith(("hit:", "context:"))
                else f"cws:word:i:{k}" if prop.startswith("capture:")
                else f"cwo:word:i:{k}" if prop.startswith("wordright:")
                else f"cwb:word:i:{k}" if prop.startswith("wordleft:")
                else f"{prop}:{k}"),
            "identityDisplay": k,
            "size": g["size"],
            "properties": [{"name": prop, "value": k}],
            "numberOfDocs": len(g["docs"]),
            **({"subcorpusSize": sizes.get(
                g["meta"], {"documents": 0, "tokens": 0})}
               if sizes is not None else {}),
            **({"listOfHits": group_hits[k]}
               if include_contents else {}),
        } for k, g in window],
    }
    if include_contents:
        resp["docInfos"] = content_infos
    # grouping never re-filters the retrieved set, so the counted
    # total applies (matches the ungrouped /hits summary)
    _clamp_summary(resp["summary"], counted, stopped_retr,
                   stopped_count)
    return resp


def handle_docs(reader, params: dict) -> dict:
    """GET /corpora/<c>/docs — doc results (with or without patt).
    ``sort=`` orders docs by a DocProperty before windowing
    (DocProperty.deserialize analogues: ``field:<meta>``, ``numhits``,
    ``pid``, ``docid``, ``fieldlen``, ``decade:<meta>``; a ``-``
    prefix sorts descending). String fields compare
    by the engine's collation; doc_id is the stable tiebreak."""
    first = int(params.get("first", 0))
    number = int(params.get("number", 50))
    patt = params.get("patt")
    if patt:
        d, s, e = _spans_for(reader, patt, params.get("filter"))
        uniq, counts = np.unique(d, return_counts=True)
    else:
        allowed = _allowed_ids(reader, params.get("filter"))
        uniq = (allowed if allowed is not None
                else reader.all_doc_ids())
        counts = np.zeros(uniq.size, dtype=np.int64)
    if params.get("sort"):
        crit = params["sort"]
        desc = crit.startswith("-")
        c = crit.lstrip("-")
        if c == "numhits":
            keys = [int(x) for x in counts]
        elif c == "pid":
            keys = [str(u) for u in reader.urls(uniq)]
        elif c == "docid":
            keys = [int(x) for x in uniq]
        elif c == "fieldlen" or c.startswith("fieldlen:"):
            # DocPropertyAnnotatedFieldLength: doc length in tokens
            keys = [int(x) for x in reader.doc_lens(uniq)]
        elif c.startswith("decade:"):
            fieldname = c.split(":", 1)[1]
            lookup = _doc_field_lookup(reader, uniq, fieldname)

            def _dec(v):
                try:
                    y = int(str(v))
                except (TypeError, ValueError):
                    # DocPropertyDecade UNKNOWN_VALUE sorts last
                    return 10_000_000
                return y - y % 10
            keys = [_dec(lookup.get(int(x))) for x in uniq]
        elif c.startswith("field:"):
            fieldname = c.split(":", 1)[1]
            lookup = _doc_field_lookup(reader, uniq, fieldname)
            keys = [lookup.get(int(x)) for x in uniq]
        else:
            raise KeyError(f"unknown doc sort criterion {crit!r}")
        if any(isinstance(k, str) for k in keys):
            from blacklab_ray.analysis.collate import key_for_context
            keys = [key_for_context("" if k is None else str(k),
                                    sensitive=False) for k in keys]
        else:
            keys = [float("-inf") if k is None else k for k in keys]
        order = sorted(range(len(keys)),
                       key=lambda i: keys[i], reverse=desc)
        uniq = uniq[np.array(order, np.int64)] if len(order) else uniq
        counts = counts[np.array(order, np.int64)] \
            if len(order) else counts
    total = int(uniq.size)
    wd = uniq[first:first + number]
    wc = counts[first:first + number]
    urls = reader.urls(wd)
    lens = reader.doc_lens(wd)
    meta = _doc_meta_values(reader, wd, params)
    resp = {
        "summary": _summary(params, first, number, int(wd.size), total,
                            total),
        "docs": [{
            "docPid": str(u),
            "numberOfHits": int(c),
            "docInfo": {"pid": [str(u)],
                        **meta.get(int(did), {}),
                        "lengthInTokens": int(n),
                        "mayView": True},
        } for u, did, c, n in zip(urls, wd, wc, lens)],
    }
    if params.get("includetokencount") in ("true", "yes", "1", True):
        # RequestHandlerDocs.java:57 tokensInMatchingDocuments over
        # the FULL doc result set (not just the window)
        resp["summary"]["tokensInMatchingDocuments"] = (
            int(reader.doc_lens(uniq).sum()) if uniq.size else 0)
    if params.get("facets"):
        resp["facets"] = _facets(reader, uniq, params["facets"])
    return resp


def _annotated_field_block(reader) -> dict:
    """The IndexMetadata ``annotatedFields.contents`` block
    (RequestHandlerIndexMetadata → MetadataFields/AnnotatedFields;
    shape pinned by the reference's saved
    indices/expected-index-metadata.json): mainAnnotation, display
    order, and per-annotation sensitivity / forward-index /
    isInternal flags. ``starttag`` and ``punct`` appear only when the
    index actually carries tag spans / punctuation, like the
    reference's internal annotations."""
    bp = reader.meta.get("params", {}) or {}
    word_sens = ("SENSITIVE_AND_INSENSITIVE" if bp.get("sensitive")
                 else "ONLY_INSENSITIVE")
    annots = {"word": {"hasForwardIndex": True,
                       "sensitivity": word_sens,
                       "isInternal": False}}
    order = ["word"]
    for a in bp.get("annotations", []) or []:
        annots[a] = {"hasForwardIndex": True,
                     "sensitivity": "ONLY_INSENSITIVE",
                     "isInternal": False}
        order.append(a)
    try:
        fwd_cols = set(reader.fwd_dataset().schema.names)
    except Exception:
        fwd_cols = set()
    if "tag_spans" in fwd_cols:
        annots["starttag"] = {"hasForwardIndex": False,
                              "sensitivity": "ONLY_SENSITIVE",
                              "isInternal": True}
        order.append("starttag")
    if "punct" in fwd_cols:
        annots["punct"] = {"hasForwardIndex": True,
                           "sensitivity": "ONLY_INSENSITIVE",
                           "isInternal": True}
        order.append("punct")
    return {"contents": {
        "fieldName": "contents",
        "isAnnotatedField": True,
        "hasContentStore": bool(bp.get("store_text")),
        "hasXmlTags": "tag_spans" in fwd_cols,
        "mainAnnotation": "word",
        "displayOrder": order,
        "annotations": annots,
    }}


def _version_info(reader) -> dict:
    """IndexMetadata ``versionInfo`` from the build lineage: the
    manifest's mtime approximates timeCreated (it is finalized when
    the build completes), meta.json's timeModified (rewritten by
    incremental updates)."""
    import datetime

    idx_dir = getattr(reader, "index_dir", "")

    def _stamp(fn: str) -> str:
        # no index_dir (e.g. a federated MultiIndexReader): report
        # empty stamps rather than resolving against the process cwd
        if not idx_dir:
            return ""
        p = os.path.join(idx_dir, fn)
        if not os.path.exists(p):
            return ""
        return datetime.datetime.fromtimestamp(
            os.path.getmtime(p)).strftime("%Y-%m-%d %H:%M:%S")

    return {"indexFormat": "blacklab-ray-1",
            "timeCreated": _stamp("manifest.json"),
            "timeModified": _stamp("meta.json")}


def handle_info(reader, name: str = "index") -> dict:
    """GET /corpora/<c> — RequestHandlerIndexMetadata analogue
    (shape: the reference's saved
    indices/expected-index-metadata.json)."""
    bp = reader.meta.get("params", {}) or {}
    return {
        "indexName": name,
        "displayName": name,
        "description": "",
        "tokenCount": int(reader.meta["total_tokens"]),
        "documentCount": int(reader.n_docs),
        "status": "available",
        "contentViewable": True,
        "textDirection": "ltr",
        "documentFormat": "webtext",
        "versionInfo": _version_info(reader),
        "fieldInfo": {"pidField": bp.get("id_column") or "url",
                      "titleField": "", "authorField": "",
                      "dateField": ""},
        "annotatedFields": _annotated_field_block(reader),
        "metadataFields": {f: {"fieldName": f,
                               "isAnnotatedField": False,
                               "type": t} for f, t in sorted(
            _field_types(reader).items())},
    }


def _field_types(reader) -> dict:
    from blacklab_ray.query.metafilter import metadata_field_types
    return metadata_field_types(reader)


def _doc_by_pid(reader, pid: str) -> tuple[int, int]:
    """(doc_id, doc_len) for a pid (=url) — a url-filtered pushdown
    gather over the fwd dataset, never a full scan."""

    import pyarrow.compute as pc
    ds = reader.fwd_dataset()
    tbl = ds.to_table(columns=["doc_id", "doc_len"],
                      filter=pc.field("url") == pid)
    if tbl.num_rows == 0:
        raise KeyError(f"document {pid!r} not found")
    return int(tbl["doc_id"][0].as_py()), int(tbl["doc_len"][0].as_py())


def handle_doc_info(reader, pid: str) -> dict:
    """GET /corpora/<c>/docs/<pid> — single-doc metadata
    (RequestHandlerDocInfo.java shape): pid + stored metadata fields
    (fwd ``meta_*``/declared columns, each a value list) +
    lengthInTokens."""

    import pyarrow.compute as pc
    did, dl = _doc_by_pid(reader, pid)
    info: dict = {"pid": [pid]}
    meta_fields = set(_field_types(reader))
    ds = reader.fwd_dataset()
    cols = [c for c in ds.schema.names
            if c in meta_fields or c.startswith("meta_")]
    if cols:
        tbl = ds.to_table(columns=cols,
                          filter=pc.field("doc_id") == did)
        if tbl.num_rows:
            for c in cols:
                v = tbl[c][0].as_py()
                if v is not None:
                    info[c.removeprefix("meta_")] = [str(v)]
    info["lengthInTokens"] = dl
    info["mayView"] = True
    return {"docPid": pid, "docInfo": info}


def _annotation_names(reader) -> list[str]:
    return list((reader.meta.get("params") or {})
                .get("annotations") or [])


def _token_arrays(reader, did: int, lo: int, hi: int) -> dict:
    """word + every parallel annotation for positions [lo, hi)."""
    pos = np.arange(lo, hi, dtype=np.int64)
    dids = np.full(pos.size, did, dtype=np.int64)
    out = {"word": ["" if t is None else t
                    for t in reader.tokens_at(dids, pos)]}
    for a in _annotation_names(reader):
        out[a] = ["" if t is None else t
                  for t in reader.tokens_at(dids, pos, annotation=a)]
    return out


def handle_doc_snippet(reader, pid: str, params: dict) -> dict:
    """GET /corpora/<c>/docs/<pid>/snippet — RequestHandlerDocSnippet:
    ``hitstart/hitend + wordsaroundhit`` → left/match/right arrays, or
    ``wordstart/wordend`` → one flat ``snippet`` block. Both include
    every parallel annotation (lemma/pos/…), like the reference."""
    did, dl = _doc_by_pid(reader, pid)
    if "wordstart" in params or "wordend" in params:
        lo = max(0, int(params.get("wordstart", 0)))
        hi = min(dl, int(params.get("wordend", dl)))
        if lo >= hi:
            raise ValueError(f"empty word window [{lo},{hi})")
        return {"snippet": _token_arrays(reader, did, lo, hi)}
    hitstart = int(params.get("hitstart", 0))
    hitend = int(params.get("hitend", hitstart + 1))
    n_ctx = int(params.get("wordsaroundhit", 5))
    if not (0 <= hitstart < hitend <= dl):
        raise ValueError(f"hit window [{hitstart},{hitend}) outside "
                         f"document (0..{dl})")
    if params.get("usecontent") == "orig":
        # content-store snippet: raw-text fragments cut by char
        # offsets (RequestHandlerDocSnippet's ConcordanceType.
        # CONTENT_STORE branch); falls through to token arrays when
        # the index stores no original or offsets misalign
        wd = np.array([did], np.int64)
        frags = _orig_concordances(reader, wd,
                                   np.array([hitstart], np.int64),
                                   np.array([hitend], np.int64), n_ctx)
        if frags and frags[0] is not None:
            L, M, R = frags[0]
            return {"docPid": pid, "start": hitstart, "end": hitend,
                    "left": L, "match": M, "right": R}
    lo = max(0, hitstart - n_ctx)
    hi = min(dl, hitend + n_ctx)
    arrays = _token_arrays(reader, did, lo, hi)

    def window(a: int, b: int) -> dict:
        return {k: v[a:b] for k, v in arrays.items()}

    return {
        "docPid": pid,
        "start": hitstart,
        "end": hitend,
        "left": window(0, hitstart - lo),
        "match": window(hitstart - lo, hitend - lo),
        "right": window(hitend - lo, hi - lo),
    }


def handle_doc_contents(reader, pid: str,
                        params: dict | None = None) -> str:
    """GET /corpora/<c>/docs/<pid>/contents — the STORED ORIGINAL when
    the index was built with ``store_text`` (the content-store
    analogue, matching RequestHandlerDocContents.java), else the
    document rendered from the FORWARD INDEX (tokens joined
    punct-aware when the corpus stores punctuation) — the documented
    deviation for indexes without a content store. ``patt=`` wraps
    the pattern's hits in this doc in ``<hl>`` markers
    (RequestHandlerDocContents' highlighting), stored-original builds
    only; the highlighted variant returns the accent-stripped DISPLAY
    text (char offsets index into it). NOTE the pattern evaluates
    corpus-wide and is then filtered to this doc — the engine has no
    single-doc query scope; route repeated contents+patt traffic
    through the caching query-actor pool."""

    import pyarrow.compute as pc
    did, dl = _doc_by_pid(reader, pid)
    stored = _stored_texts(reader, np.array([did], np.int64))
    if stored:
        txt = stored[did]
        patt = (params or {}).get("patt")
        if patt:
            from blacklab_ray.stages.offsets import highlight
            d, s, e = _spans_for(reader, patt, None)
            mine = d == did
            spans = list(zip(s[mine].tolist(), e[mine].tolist()))
            if spans:
                txt = highlight(txt, spans)
        return txt
    pos = np.arange(dl, dtype=np.int64)
    toks = reader.tokens_at(np.full(dl, did, dtype=np.int64), pos)
    words = ["" if t is None else t for t in toks]
    ds = reader.fwd_dataset()
    punct = None
    if "punct" in ds.schema.names:
        tbl = ds.to_table(columns=["punct"],
                          filter=pc.field("doc_id") == did)
        if tbl.num_rows:
            punct = tbl["punct"][0].as_py()
    if punct is None:
        return " ".join(words)
    parts = []
    for q, w in enumerate(words):
        if q > 0:
            parts.append(punct[q] if q < len(punct) else " ")
        parts.append(w)
    return "".join(parts)


def handle_colloc(reader, params: dict) -> dict:
    """GET /hits?calc=colloc — collocation token frequencies around
    the pattern's hits (RequestHandlerHits' colloc branch). Context
    width defaults to 10: the reference's saved colloc responses
    reproduce EXACTLY at wordsaroundhit=10 (verified token-for-token
    on the VOICE corpus). Thin wrapper over ``handle_hits``'s colloc
    branch so hitfiltercrit/sample/sort params compose identically
    whether callers hit this entry point or the router."""
    p = dict(params)
    p["calc"] = "colloc"
    return handle_hits(reader, p)


def _colloc_counts(reader, d, s, e, n_ctx: int,
                   annotation: str | None = None) -> dict:
    """Context-word frequency dict for a span set — one flat
    vectorized position expansion + one batched token gather (never a
    per-hit Python loop). ``annotation`` routes the gather to a
    parallel annotation's forward index."""
    lens = reader.doc_lens(d)
    lo = np.maximum(s - n_ctx, 0)
    hi = np.minimum(e + n_ctx, lens)
    n_left = (s - lo).astype(np.int64)
    n_right = (hi - e).astype(np.int64)
    n_all = n_left + n_right
    tot = int(n_all.sum())
    if tot == 0:
        return {}
    flat_d = np.repeat(d, n_all)
    # left window positions lo..s-1 then right e..hi-1, per hit
    csum = np.cumsum(n_all)
    base = np.arange(tot, dtype=np.int64) - np.repeat(csum - n_all,
                                                      n_all)
    left_part = base < np.repeat(n_left, n_all)
    flat_p = np.where(
        left_part,
        np.repeat(lo, n_all) + base,
        np.repeat(e, n_all) + base - np.repeat(n_left, n_all))
    toks = reader.tokens_at(flat_d, flat_p, annotation=annotation)
    from collections import Counter
    c = Counter(t for t in toks if t)
    ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    return dict(ordered)


def handle_termfreq(reader, params: dict) -> dict:
    """GET /corpora/<c>/termfreq — most frequent terms of an
    annotation (RequestHandlerTermFreq.java: ``annotation``,
    ``number``, optional comma-separated ``terms`` restriction)."""
    annot = params.get("annotation", "word")
    number = int(params.get("number", 20))
    route = "i" if annot == "word" else annot
    tbl = reader.terms_table_for(route)
    terms = tbl["term"].to_pylist()
    ctf = tbl["collection_tf"].to_numpy(zero_copy_only=False)
    if params.get("terms"):
        want = set(params["terms"].split(","))
        keep = [i for i, t in enumerate(terms) if t in want]
        terms = [terms[i] for i in keep]
        ctf = ctf[keep]
    order = sorted(range(len(terms)), key=lambda i: (-int(ctf[i]),
                                                     terms[i]))
    window = order[:number]
    return {"termFreq": {terms[i]: int(ctf[i]) for i in window}}


def handle_autocomplete(reader, fieldname: str, params: dict) -> list:
    """GET /corpora/<c>/autocomplete/<field>?term=prefix — matching
    terms, BLS-style bare list (RequestHandlerAutocomplete.java).
    Annotated fields (word/lemma/pos/...) complete from the terms
    dictionary; metadata fields from their distinct values."""
    prefix = params.get("term", "")
    number = int(params.get("number", 20))
    route = "i" if fieldname == "word" else fieldname
    try:
        tbl = reader.terms_table_for(route)
        terms = tbl["term"].to_pylist()
    except (KeyError, FileNotFoundError):
        # metadata field: distinct values from a pruned column read
        import os

        import pyarrow.compute as pc
        ds = reader.fwd_dataset()
        if fieldname not in ds.schema.names:
            raise KeyError(f"unknown field {fieldname!r}") from None
        col = ds.to_table(columns=[fieldname])[fieldname].combine_chunks()
        if _field_types(reader).get(fieldname) == "tokenized":
            # TOKENIZED metadata completes from its ANALYZED terms
            # (BLS autocompletes over the Lucene terms of the field,
            # which are word-level for tokenized fields)
            from blacklab_ray.query.metafilter import _analyze_tokens
            toks = pc.list_flatten(_analyze_tokens(pc.unique(col)))
            terms = [t for t in pc.unique(toks).to_pylist() if t]
        else:
            terms = [str(v) for v in pc.unique(col).to_pylist()
                     if v is not None]
    out = sorted(t for t in terms if t.startswith(prefix))
    return out[:number]


def handle_docs_grouped(reader, params: dict) -> dict:
    """GET /docs?group=field:<meta> — RequestHandlerDocsGrouped
    analogue: document groups by a metadata field, sized in docs and
    tokens (DocGroups). With ``patt``, only documents matching the
    pattern are grouped and per-group hit counts are included. The
    scale path for corpus-wide grouping is pipelines/docsops.py; this
    endpoint serves the interactive window."""

    import pyarrow.compute as pc
    crit = params["group"]
    if not crit.startswith(("field:", "decade:")):
        raise ValueError(
            "docs grouping supports field:<metadata> / decade:<meta>")
    decade = crit.startswith("decade:")
    fieldname = crit.split(":", 1)[1]

    def _gkey(v) -> str:
        return _decade_key(v) if decade else str(v)
    first = int(params.get("first", 0))
    number = int(params.get("number", 50))
    patt = params.get("patt")
    ds = reader.fwd_dataset()
    if fieldname not in ds.schema.names:
        raise KeyError(f"unknown metadata field {fieldname!r}")
    if patt:
        d, s, e = _spans_for(reader, patt, params.get("filter"))
        uniq, hitc = np.unique(d, return_counts=True)
        tbl = ds.to_table(columns=["doc_id", fieldname, "doc_len"],
                          filter=pc.field("doc_id").isin(uniq.tolist()))
        hits_by_doc = dict(zip(uniq.tolist(), hitc.tolist()))
    else:
        allowed = _allowed_ids(reader, params.get("filter"))
        flt = (pc.field("doc_id").isin(allowed.tolist())
               if allowed is not None else None)
        tbl = ds.to_table(columns=["doc_id", fieldname, "doc_len"],
                          filter=flt)
        hits_by_doc = {}
    if params.get("viewgroup") is not None:
        # group-contents view: the docs of ONE group
        # (RequestHandlerDocsGrouped's viewgroup branch)
        want = params["viewgroup"]
        want = want.split(":", 1)[1] if want.startswith("str:") \
            else want
        sel = [(did, int(dl))
               for did, val, dl in zip(tbl["doc_id"].to_pylist(),
                                       tbl[fieldname].to_pylist(),
                                       tbl["doc_len"].to_pylist())
               if _gkey(val) == want]
        win = sel[first:first + number]
        wd = np.array([did for did, _dl in win], np.int64)
        urls = reader.urls(wd) if win else []
        return {
            "summary": _summary(params, first, number, len(win),
                                len(sel), len(sel)),
            "docs": [{
                "docPid": str(u),
                "numberOfHits": int(hits_by_doc.get(int(did), 0)),
                "docInfo": {"pid": [str(u)], "lengthInTokens": dl,
                            "mayView": True},
            } for u, (did, dl) in zip(urls, win)],
        }
    groups: dict[str, dict] = {}
    for did, val, dl in zip(tbl["doc_id"].to_pylist(),
                            tbl[fieldname].to_pylist(),
                            tbl["doc_len"].to_pylist()):
        g = groups.setdefault(_gkey(val), {"size": 0, "tokens": 0,
                                           "hits": 0})
        g["size"] += 1
        g["tokens"] += int(dl)
        g["hits"] += hits_by_doc.get(did, 0)
    import pyarrow as pa
    ftype = tbl.schema.field(fieldname).type
    numeric_ident = decade or pa.types.is_integer(ftype) \
        or pa.types.is_floating(ftype)
    ordered = _order_groups(list(groups.items()), params.get("sort"),
                            numeric=numeric_ident)
    window = ordered[first:first + number]
    total_docs = int(tbl.num_rows)
    # with a pattern, each group's size/numberOfTokens cover only the
    # MATCHING docs — per-group subcorpusSize gives the full-corpus
    # group size (ResultDocsGrouped.java:95–99, pattern branch only:
    # without one the group already IS the subcorpus group)
    sizes = (_meta_subcorpus_sizes(reader, [fieldname],
                                   params.get("filter"),
                                   transforms=[_gkey])
             if patt else None)
    prop_name = crit if decade else f"field:{fieldname}"
    return {
        "summary": {
            **_summary(params, first, number, len(window), total_docs,
                       total_docs),
            "numberOfGroups": len(groups),
            "largestGroupSize": max(
                (g["size"] for _k, g in ordered), default=0),
            "subcorpusSize": _subcorpus_size(reader,
                                             params.get("filter")),
        },
        "docGroups": [{
            "identity": f"{fieldname}:{k}",
            "identityDisplay": k,
            "size": g["size"],
            "numberOfTokens": g["tokens"],
            **({"numberOfHits": g["hits"]} if patt else {}),
            **({"subcorpusSize": sizes.get(
                (k,), {"documents": 0, "tokens": 0})}
               if sizes is not None else {}),
            "properties": [{"name": prop_name, "value": k}],
        } for k, g in window],
    }


def handle_explain(reader, params: dict) -> dict:
    """GET /corpora/<c>/explain?patt= — RequestHandlerExplain
    analogue: the parsed plan and the optimizer's rewrite of it
    (query/rewrite.py's canonical plan strings)."""
    from blacklab_ray.query.cql import parse_cql
    from blacklab_ray.query.rewrite import plan_str, rewrite
    plan = parse_cql(params["patt"])
    return {"explain": {
        "originalQuery": plan_str(plan),
        "rewrittenQuery": plan_str(rewrite(plan)),
    }}


def handle_fieldinfo(reader, fieldname: str, params: dict) -> dict:
    """GET /corpora/<c>/fields/<name> — RequestHandlerFieldInfo
    analogue. ``contents`` (the annotated field) reports its
    annotations + sensitivities; a metadata field reports its type and
    a top-values distribution (``fieldValues`` capped at ``number``,
    ``valueListComplete`` says whether the cap truncated)."""
    bp = reader.meta.get("params", {})
    if fieldname in ("contents", "word"):
        annots = {"word": {
            "sensitivity": ("SENSITIVE_AND_INSENSITIVE"
                            if bp.get("sensitive")
                            else "ONLY_INSENSITIVE"),
            "isInternal": False}}
        for a in bp.get("annotations", []) or []:
            annots[a] = {"sensitivity": "ONLY_INSENSITIVE",
                         "isInternal": False}
        # ?listvalues=annot,annot — attach each listed annotation's
        # term dictionary (RequestHandlerFieldInfo listValuesFor),
        # capped at ``number`` with valueListComplete
        number = int(params.get("number", 500))
        for a in [v for v in params.get("listvalues", "").split(",")
                  if v]:
            if a not in annots:
                continue
            route = "i" if a == "word" else a
            vals = sorted(
                reader.terms_table_for(route)["term"].to_pylist())
            annots[a]["values"] = vals[:number]
            annots[a]["valueListComplete"] = len(vals) <= number
        return {"fieldName": "contents", "isAnnotatedField": True,
                "mainAnnotation": "word", "annotations": annots}

    import pyarrow.compute as pc
    types = _field_types(reader)
    if fieldname not in types:
        raise KeyError(f"unknown field {fieldname!r}")
    number = int(params.get("number", 50))
    ds = reader.fwd_dataset()
    col = ds.to_table(columns=[fieldname])[fieldname].combine_chunks()
    vc = pc.value_counts(col)
    pairs = sorted(((str(x["values"]), int(x["counts"]))
                    for x in vc.to_pylist()
                    if x["values"] is not None),
                   key=lambda p: (-p[1], p[0]))
    return {"fieldName": fieldname, "isAnnotatedField": False,
            "type": types[fieldname],
            "fieldValues": dict(pairs[:number]),
            "valueListComplete": len(pairs) <= number}


def handle_server_info(readers: dict,
                       can_create_index: bool = False,
                       user_id: str | None = None) -> dict:
    """GET / — RequestHandlerServerInfo analogue: the corpora this
    server exposes plus the user block (shape: the reference's saved
    info/Server info page.json). With an authenticated ``user_id``
    (AuthManager → AuthMethod.determineCurrentUser analogue) the
    block reports loggedIn=true + id, and the caller passes only the
    corpora this user may see."""
    user: dict = {"loggedIn": user_id is not None,
                  "canCreateIndex": bool(can_create_index)}
    if user_id is not None:
        user["id"] = user_id
    return {"blacklabVersion": "blacklab-ray",
            "indices": {name: {
                "displayName": name,
                "status": "available",
                "documentFormat": "webtext",
                "tokenCount": int(r.meta["total_tokens"]),
            } for name, r in sorted(readers.items())},
            "user": user}


def handle_index_status(reader, name: str) -> dict:
    """GET /corpora/<c>/status — RequestHandlerIndexStatus analogue,
    plus this engine's incremental-update state (generation +
    tombstone count from updates.json)."""
    gen, n_tomb = 0, len(reader.tombstones)
    # federated readers report the max sub-index generation
    for sub in getattr(reader, "subs", [reader]):
        upd_p = os.path.join(sub.index_dir, "updates.json")
        if os.path.exists(upd_p):
            with open(upd_p) as f:
                upd = json.load(f)
            gen = max(gen, int(upd.get("generation", 0)))
    return {"indexName": name, "status": "available",
            "documentCount": int(reader.n_docs),
            "tokenCount": int(reader.meta["total_tokens"]),
            "generation": gen, "tombstones": n_tomb}


def handle_cache_info(readers: dict) -> dict:
    """GET /cache-info — RequestHandlerCacheInfo analogue over the
    reader-level gather caches (serving-tier result caches report
    through query/service.py)."""
    return {"cacheStatus": {name: r.cache_info()
                            for name, r in sorted(readers.items())}}


def handle_cache_clear(readers: dict) -> dict:
    """POST /cache-clear — RequestHandlerClearCache analogue."""
    for r in readers.values():
        r.clear_caches()
    return {"status": {"code": "SUCCESS",
                       "message": "Cache cleared succesfully."}}


def handle_input_formats() -> dict:
    """GET /input-formats — RequestHandlerListInputFormats analogue
    over the formats registry."""
    from blacklab_ray.formats import formats
    return {"supportedInputFormats": {
        name: {"displayName": name, "configurationBased": True}
        for name in formats()}}


def _csv_summary_rows(w, resp: dict, n_cols: int) -> None:
    """WriteCsv.addSummaryCsvCommon analogue: summary rows appended
    after the data, padded to the column count."""
    sm = resp.get("summary", {})
    for key in ("numberOfHits", "numberOfDocs"):
        if key in sm:
            row = [f"summary.{key}", sm[key]]
            w.writerow(row + [""] * max(0, n_cols - len(row)))
    sz = sm.get("subcorpusSize")
    if sz:
        for part in ("documents", "tokens"):
            row = [f"summary.subcorpusSize.{part}", sz[part]]
            w.writerow(row + [""] * max(0, n_cols - len(row)))


def hits_csv(resp: dict, sepline: bool = False,
             summary: bool = False) -> str:
    """CSV of a hits response (WriteCsv.hitsResponse shape: context +
    pid columns). ``sepline`` prepends the Excel ``sep=,`` declaration
    (csvsepline=yes); ``summary`` appends summary rows
    (csvsummary=yes)."""
    import csv
    import io
    buf = io.StringIO()
    if sepline:
        buf.write("sep=,\r\n")
    w = csv.writer(buf)
    w.writerow(["docPid", "start", "end", "left_context", "match",
                "right_context"])

    def _ctx(v) -> str:
        # usecontent=orig contexts are raw strings; fwd contexts are
        # {annotation: [tokens]} dicts
        return v if isinstance(v, str) else " ".join(v["word"])

    for h in resp.get("hits", []):
        w.writerow([h["docPid"], h["start"], h["end"],
                    _ctx(h["left"]), _ctx(h["match"]),
                    _ctx(h["right"])])
    if summary:
        _csv_summary_rows(w, resp, 6)
    return buf.getvalue()


def docs_csv(resp: dict, sepline: bool = False,
             summary: bool = False) -> str:
    """CSV of a docs response (WriteCsv.docsResponse shape)."""
    import csv
    import io
    buf = io.StringIO()
    if sepline:
        buf.write("sep=,\r\n")
    w = csv.writer(buf)
    w.writerow(["docPid", "numberOfHits", "lengthInTokens"])
    for d in resp.get("docs", []):
        w.writerow([d["docPid"], d["numberOfHits"],
                    d["docInfo"]["lengthInTokens"]])
    if summary:
        _csv_summary_rows(w, resp, 3)
    return buf.getvalue()


def _summary(params, first, number, actual, total, n_docs) -> dict:
    return {
        "searchParam": {k: str(v) for k, v in sorted(params.items())},
        "windowFirstResult": first,
        "requestedWindowSize": number,
        "actualWindowSize": actual,
        "windowHasPrevious": first > 0,
        "windowHasNext": first + actual < total,
        "stillCounting": False,
        "numberOfHits": total,
        "numberOfHitsRetrieved": total,
        "stoppedCountingHits": False,
        "stoppedRetrievingHits": False,
        "numberOfDocs": n_docs,
        "numberOfDocsRetrieved": n_docs,
        "docFields": {"pidField": "url"},
    }


# ---------------------------------------------------------------------------
# DataStream serializers
# ---------------------------------------------------------------------------

_SINGULAR = {"hits": "hit", "docs": "doc", "hitGroups": "hitGroup",
             "docGroups": "docGroup", "properties": "property",
             "left": "w", "match": "w", "right": "w", "word": "w",
             "terms": "term", "captureGroups": "group"}


def to_xml(obj: Any, root: str = "blacklabResponse") -> str:
    """DataStream-XML conventions: dict → child elements, list under
    key K → repeated singular elements, ``docInfos`` → ``<docInfo
    pid="...">`` (server/.../datastream/DataStreamXml.java shape)."""
    out = [f"<{root}>"]
    _xml_value(obj, root, out)
    out.append(f"</{root}>")
    return "".join(out)


def _xml_value(v: Any, key: str, out: list) -> None:
    if isinstance(v, dict):
        if key == "docInfos":
            for pid, info in v.items():
                out.append(f"<docInfo pid={quoteattr(str(pid))}>")
                _xml_value(info, "docInfo", out)
                out.append("</docInfo>")
            return
        if key in ("termFreq", "fieldValues", "tokenFrequencies"):
            # arbitrary term/value strings can't be element names —
            # <term text="...">freq</term>, the DataStream map shape
            child = "value" if key == "fieldValues" else "term"
            for term, freq in v.items():
                out.append(f"<{child} text={quoteattr(str(term))}>"
                           f"{int(freq)}</{child}>")
            return
        for k, sub in v.items():
            if k == "users[]":
                # the sharing response's JSON key is not a valid XML
                # element name — <users><user>…</user></users>
                out.append("<users>")
                for u in sub:
                    out.append(f"<user>{escape(str(u))}</user>")
                out.append("</users>")
                continue
            if isinstance(sub, list):
                out.append(f"<{k}>")
                child = _SINGULAR.get(k, "item")
                for el in sub:
                    out.append(f"<{child}>")
                    _xml_value(el, child, out)
                    out.append(f"</{child}>")
                out.append(f"</{k}>")
            else:
                out.append(f"<{k}>")
                _xml_value(sub, k, out)
                out.append(f"</{k}>")
    elif isinstance(v, list):
        child = _SINGULAR.get(key, "item")
        for el in v:
            out.append(f"<{child}>")
            _xml_value(el, child, out)
            out.append(f"</{child}>")
    elif isinstance(v, bool):
        out.append("true" if v else "false")
    elif v is None:
        pass
    else:
        out.append(escape(str(v)))


def groups_csv(resp: dict, sepline: bool = False,
               summary: bool = False) -> str:
    """CSV export of grouped results (WriteCsv.hitsGroupsResponse
    shape: identity, size, numberOfDocs)."""
    import csv
    import io
    buf = io.StringIO()
    if sepline:
        buf.write("sep=,\r\n")
    w = csv.writer(buf)
    if "docGroups" in resp:
        w.writerow(["identity", "size", "numberOfTokens"])
        for g in resp["docGroups"]:
            w.writerow([g["identityDisplay"], g["size"],
                        g["numberOfTokens"]])
    else:
        w.writerow(["identity", "size", "numberOfDocs"])
        for g in resp.get("hitGroups", []):
            w.writerow([g["identityDisplay"], g["size"],
                        g["numberOfDocs"]])
    if summary:
        _csv_summary_rows(w, resp, 3)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# WSGI app + server
# ---------------------------------------------------------------------------

class BlsApp:
    """WSGI app over the handlers above (BLS URL scheme):

    - ``/`` server info; ``/input-formats``; ``/cache-info``;
      ``/cache-clear`` (POST)
    - ``/corpora/<name>`` info, ``/status``, ``/explain``,
      ``/fields/<f>``, ``/termfreq``, ``/autocomplete/<f>``
    - ``/corpora/<name>/hits`` (+ ``group=``), ``/docs``
      (+ ``group=``), ``/docs/<pid>`` (+ ``/snippet``,
      ``/contents``)
    - mutations (AddToIndex analogue): ``POST /corpora/<name>/docs``
      with a JSON array of page objects appends via
      ``update.add_documents``; ``DELETE /corpora/<name>/docs/<pid>``
      tombstones by pid. The corpus reader is reopened after either.
    - index management (RequestHandlerCreateIndex/DeleteIndex
      analogues, ``data_dir`` required): ``POST /corpora/<name>``
      creates an empty index under the server's data dir (filled via
      POST docs later); ``DELETE /corpora/<name>`` removes a
      data-dir-owned index from disk and the registry.

    ``outputformat`` json (default) | xml | csv (hits/docs/grouped).
    """

    def __init__(self, readers: dict, index_dirs: dict | None = None,
                 data_dir: str | None = None,
                 auth_method: str = "none",
                 auth_header: str = "X-BlackLabUser",
                 auth_fixed_user: str | None = None,
                 admin_users: tuple = ()):
        self._readers = readers
        self._dirs = dict(index_dirs or {})
        self._data_dir = data_dir
        # pluggable user resolution (wslib auth package analogue —
        # AuthManager picks an AuthMethod from server config):
        #   "none"        AuthMethod "anonymous": no user, and — like
        #                 a reference deployment without auth — no
        #                 ACL enforcement (backward compatible);
        #   "http-header" HttpHeaderAuthMethod: the user id is read
        #                 from a trusted reverse-proxy header
        #                 (``auth_header``);
        #   "debug-fixed" AuthDebugFixed: every request is
        #                 ``auth_fixed_user`` (development).
        if auth_method not in ("none", "http-header", "debug-fixed"):
            raise ValueError(f"unknown auth_method {auth_method!r}")
        if auth_method == "debug-fixed" and not auth_fixed_user:
            raise ValueError("auth_method='debug-fixed' needs "
                             "auth_fixed_user")
        self._auth_method = auth_method
        self._auth_env_key = "HTTP_" + auth_header.upper() \
            .replace("-", "_")
        self._auth_fixed_user = auth_fixed_user
        # server-global operations (cache-clear) are gated to these
        # users when auth is enabled — the reference restricts
        # RequestHandlerClearCache to debug mode; any logged-in user
        # flushing shared caches would be a trivial cache-thrash DoS
        self._admin_users = frozenset(admin_users)
        # (handler, method, status) → [count, seconds]
        self._metrics: dict[tuple, list] = {}

    # -- auth / ACL (wslib auth + Index.userMayRead analogues) ---------

    def _resolve_user(self, environ) -> str | None:
        if self._auth_method == "debug-fixed":
            return self._auth_fixed_user
        if self._auth_method == "http-header":
            u = (environ.get(self._auth_env_key) or "").strip()
            return u or None
        return None

    @staticmethod
    def _corpus_owner(name: str) -> str | None:
        """The userid prefix of a user-scoped index id
        ('user@example.com:name' — Index.PATT_INDEXID), else None."""
        m = _INDEXID_RE.fullmatch(name)
        return m.group(1) if m else None

    def _shared_users(self, name: str) -> list:
        d = self._dirs.get(name)
        if not d or "," in d:
            return []
        fp = os.path.join(d, ".shareWithUsers")
        if not os.path.exists(fp):
            return []
        with open(fp) as f:
            return [ln.strip() for ln in f if ln.strip()]

    def _check_access(self, name: str, user: str | None,
                      write: bool = False) -> None:
        """Private-corpus ACL (Index.userMayRead/userMayAddData):
        a user-scoped corpus is readable by its owner and the users
        it is shared with, writable by the owner only. Public corpora
        are open. With auth_method='none' there is no user concept
        and no enforcement (the pre-auth behavior)."""
        if self._auth_method == "none":
            return
        if write and user is None:
            # with auth enabled every mutation needs a logged-in user
            raise PermissionError("mutations require a logged-in user")
        owner = self._corpus_owner(name)
        if owner is None or user == owner:
            return
        if not write and user is not None and \
                user in self._shared_users(name):
            return
        raise PermissionError(
            f"not authorized to {'modify' if write else 'access'} "
            f"corpus {name!r}")

    def _visible_readers(self, user: str | None) -> dict:
        if self._auth_method == "none":
            return self._readers
        out = {}
        for name, r in self._readers.items():
            try:
                self._check_access(name, user)
            except PermissionError:
                continue
            out[name] = r
        return out

    def __call__(self, environ, start_response):
        import time
        from urllib.parse import parse_qsl
        path = environ.get("PATH_INFO", "")
        method = environ.get("REQUEST_METHOD", "GET").upper()
        qsl = parse_qsl(environ.get("QUERY_STRING", ""))
        params = dict(qsl)
        # repeated users[] params arrive as a list (the sharing
        # endpoint's getParameterValues analogue)
        multi = [v for k, v in qsl if k == "users[]"]
        if multi:
            params["users[]"] = multi
        body_in = b""
        try:
            n = int(environ.get("CONTENT_LENGTH") or 0)
        except ValueError:
            n = 0
        if n and "wsgi.input" in environ:
            body_in = environ["wsgi.input"].read(n)
        t0 = time.perf_counter()
        user = self._resolve_user(environ)
        try:
            body, ctype = self._route(path, params, method, body_in,
                                      user=user)
            status = "200 OK"
        except PermissionError as e:
            # the reference's NOT_AUTHORIZED error shape
            body = json.dumps({"error": {"code": "NOT_AUTHORIZED",
                                         "message": str(e)}})
            ctype, status = "application/json", "403 Forbidden"
        except KeyError as e:
            body = json.dumps({"error": {"code": "NOT_FOUND",
                                         "message": str(e)}})
            ctype, status = "application/json", "404 Not Found"
        except ValueError as e:
            body = json.dumps({"error": {"code": "BAD_REQUEST",
                                         "message": str(e)}})
            ctype, status = "application/json", "400 Bad Request"
        except Exception as e:   # noqa: BLE001 — wire boundary
            body = json.dumps({"error": {
                "code": "INTERNAL_ERROR", "message": str(e)}})
            ctype, status = "application/json", "500 Internal Server Error"
        self._record_metrics(path, method, status,
                             time.perf_counter() - t0)
        data = body.encode("utf-8")
        start_response(status, [("Content-Type", ctype),
                                ("Content-Length", str(len(data)))])
        return [data]

    # -- instrumentation (PrometheusMetricsProvider /
    # RequestInstrumentationProvider analogue) -------------------------

    # handlers that may appear as metric labels — a CLOSED set, so
    # scanner paths can't grow the metrics dict or inject characters
    # into the exposition format
    _KNOWN_OPS = frozenset({
        "hits", "docs", "termfreq", "autocomplete", "fields",
        "status", "explain", "sharing",
    })
    _KNOWN_TOP = frozenset({"input-formats", "cache-info",
                            "cache-clear"})

    @staticmethod
    def _handler_label(path: str, method: str) -> str:
        """Classify the request like the reference's per-handler
        request metrics: the handler name, not the raw path (no
        per-corpus/per-pid label explosion; unknown paths all map
        to 'other')."""
        parts = [p for p in path.split("/") if p]
        if not parts:
            return "server-info"
        if parts[0] != "corpora":
            return parts[0] if parts[0] in BlsApp._KNOWN_TOP \
                else "other"
        if len(parts) < 3:
            return "corpus-info"
        if parts[2] == "docs" and len(parts) > 3:
            tail = parts[-1]
            return {"snippet": "doc-snippet",
                    "contents": "doc-contents"}.get(tail, "doc-info")
        return parts[2] if parts[2] in BlsApp._KNOWN_OPS else "other"

    def _record_metrics(self, path: str, method: str, status: str,
                        seconds: float) -> None:
        if path.rstrip("/") == "/metrics":
            return
        try:
            label = self._handler_label(path, method)
        except Exception:   # noqa: BLE001 — metrics must never
            label = "other"  # break the response path
        if method not in ("GET", "POST", "PUT", "DELETE", "HEAD"):
            method = "other"
        key = (label, method, status.split()[0])
        m = self._metrics.setdefault(key, [0, 0.0])
        m[0] += 1
        m[1] += seconds

    def _metrics_text(self) -> str:
        """Prometheus text exposition of request counters/durations
        plus per-corpus index gauges — the reference's
        instrumentation module surface (PrometheusMetricsProvider
        serves /metrics), without external deps."""
        out = [
            "# HELP blacklab_requests_total Requests by handler/"
            "method/status",
            "# TYPE blacklab_requests_total counter",
        ]
        for (h, meth, st), (n, _s) in sorted(self._metrics.items()):
            out.append(
                f'blacklab_requests_total{{handler="{h}",'
                f'method="{meth}",status="{st}"}} {n}')
        out += [
            "# HELP blacklab_request_seconds_total Wall time by "
            "handler",
            "# TYPE blacklab_request_seconds_total counter",
        ]
        agg: dict[str, float] = {}
        for (h, _meth, _st), (_n, s) in self._metrics.items():
            agg[h] = agg.get(h, 0.0) + s
        for h, s in sorted(agg.items()):
            out.append(
                f'blacklab_request_seconds_total{{handler="{h}"}} '
                f'{s:.6f}')
        out += [
            "# HELP blacklab_index_documents Documents per corpus",
            "# TYPE blacklab_index_documents gauge",
            "# HELP blacklab_index_tokens Tokens per corpus",
            "# TYPE blacklab_index_tokens gauge",
        ]
        for name, rd in sorted(self._readers.items()):
            out.append(f'blacklab_index_documents{{corpus="{name}"}} '
                       f'{int(rd.n_docs)}')
            out.append(f'blacklab_index_tokens{{corpus="{name}"}} '
                       f'{int(rd.meta["total_tokens"])}')
        return "\n".join(out) + "\n"

    def _sharing(self, name: str, method: str, params: dict,
                 body_in: bytes) -> dict:
        """GET/POST /corpora/<name>/sharing — RequestHandlerSharing:
        the user ids a corpus is shared with, persisted like the
        reference's .shareWithUsers file (one id per line) inside the
        index dir. POST takes repeated ``users[]`` params (query
        string or form body); an empty list un-shares."""
        if name not in self._readers:
            raise KeyError(f"corpus {name!r} not found")
        d = self._dirs.get(name)
        if d is None or "," in d:
            raise ValueError(f"corpus {name!r} has no single writable "
                             f"index dir (read-only or federated)")
        fp = os.path.join(d, ".shareWithUsers")
        if method == "POST":
            users = params.get("users[]", [])
            if isinstance(users, str):
                users = [users]
            if body_in:
                from urllib.parse import parse_qsl
                users = users + [
                    v for k, v in parse_qsl(
                        body_in.decode("utf-8", "replace"))
                    if k == "users[]"]
            users = [u.strip() for u in users if u.strip()]
            bad = [u for u in users if re.search(r"[\r\n]", u)]
            if bad:
                # the store is one id per line — embedded newlines
                # would fabricate extra user ids on read-back
                raise ValueError(f"invalid user id(s): {bad!r}")
            with open(fp, "w") as f:
                f.write("".join(u + "\n" for u in users))
            return {"status": {
                "code": "SUCCESS",
                "message": "Index shared with specified user(s)."}}
        users = []
        if os.path.exists(fp):
            with open(fp) as f:
                users = [ln.strip() for ln in f if ln.strip()]
        return {"users[]": users}

    def _reopen(self, name: str):
        self._readers[name] = _open_index(self._dirs[name])
        return self._readers[name]

    def _mutate(self, name: str, method: str, parts: list,
                body_in: bytes, params: dict | None = None) -> dict:
        params = params or {}
        if name not in self._dirs:
            raise ValueError(f"corpus {name!r} is read-only "
                             "(no index dir registered)")
        from blacklab_ray.query import MultiIndexReader
        if isinstance(self._readers.get(name), MultiIndexReader):
            raise ValueError(f"corpus {name!r} is federated "
                             "(read-only); update the owning "
                             "sub-index instead")
        if method == "POST" and len(parts) == 3:
            import pyarrow as pa

            import ray.data

            from blacklab_ray.index.update import add_documents
            fmt = params.get("format")
            if fmt:
                # file upload in a registered input format (BLS
                # AddToIndex uploads documents in the corpus format):
                # the raw body is ONE file, read through the registry
                import tempfile

                from blacklab_ray.formats import read_pages
                if not body_in:
                    raise ValueError("file upload needs a body")
                suffix = params.get("filename", "upload.dat")
                with tempfile.NamedTemporaryFile(
                        suffix="-" + os.path.basename(suffix),
                        delete=False) as f:
                    f.write(body_in)
                    tmp = f.name
                try:
                    ds = read_pages(fmt, tmp)
                    rec = add_documents(self._dirs[name], ds)
                finally:
                    os.unlink(tmp)
                self._reopen(name)
                return {"status": {"code": "SUCCESS"}, "added": rec}
            pages = json.loads(body_in.decode("utf-8"))
            if not isinstance(pages, list) or not pages:
                raise ValueError("POST body must be a non-empty JSON "
                                 "array of page objects")
            tbl = pa.Table.from_pylist(pages)
            rec = add_documents(self._dirs[name],
                                ray.data.from_arrow(tbl))
            self._reopen(name)
            return {"status": {"code": "SUCCESS"}, "added": rec}
        if method == "DELETE" and len(parts) == 4:
            from blacklab_ray.index.update import delete_documents
            # resolve the pid against the index (works for both
            # hash-derived and user-supplied doc ids) and tombstone by
            # BOTH id and url — the url form also covers
            # generation-salted re-adds in hash-id indexes
            did, _dl = _doc_by_pid(self._readers[name], parts[3])
            rec = delete_documents(self._dirs[name], doc_ids=[did],
                                   urls=[parts[3]])
            self._reopen(name)
            return {"status": {"code": "SUCCESS"}, **rec}
        raise KeyError(f"unsupported mutation {method} on "
                       f"{'/'.join(parts)}")

    def _create_index(self, name: str, params: dict) -> dict:
        """POST /corpora/<name> — create an empty index under the
        server's data dir (RequestHandlerCreateIndex analogue; BLS
        user indexes start empty and are filled via add-to-index)."""
        import re as _re

        import pyarrow as pa

        import ray.data

        from blacklab_ray.index import BuildParams, build_index
        from blacklab_ray.query import IndexReader
        if not self._data_dir:
            raise ValueError("index creation needs a server data_dir")
        m = _INDEXID_RE.fullmatch(name)
        if m is None:
            raise ValueError(f"invalid index name {name!r}")
        user, short = m.group(1), m.group(2)
        if set(short) <= {"."} or (user and set(user) <= {"."}):
            # the reference pattern technically admits '..' — never
            # let a name or user component be all dots
            raise ValueError(f"invalid index name {name!r}")
        if user:
            # user-scoped private index (Index.PATT_INDEXID's
            # 'user@example.com:name' form): the FULL id quotes into
            # ONE flat directory name — the quoted ':' (%3A) cannot
            # appear in a plain index name ('%' is outside [\w\-.]),
            # so user-scoped dirs can never collide with plain dirs
            # ('alice' vs 'alice:sub'), and the flat layout lets the
            # serve() data-dir scan rediscover them after a restart
            from urllib.parse import quote
            idx = os.path.join(self._data_dir, quote(name, safe=""))
        else:
            idx = os.path.join(self._data_dir, name)
        if name in self._readers or os.path.exists(idx):
            raise ValueError(f"corpus {name!r} already exists")
        os.makedirs(os.path.dirname(idx), exist_ok=True)
        empty = pa.table({"url": pa.array([], pa.string()),
                          "text": pa.array([], pa.string())})
        try:
            build_index(ray.data.from_arrow(empty), idx,
                        BuildParams(
                            num_buckets=int(params.get("buckets", 4)),
                            n_salts=int(params.get("salts", 1)),
                            store_text=params.get("storetext", "")
                            in ("true", "yes", "1")))
        except BaseException:
            # a partial dir would wedge the name ('already exists' on
            # every retry with nothing registered to DELETE)
            import shutil
            shutil.rmtree(idx, ignore_errors=True)
            raise
        self._dirs[name] = idx
        self._readers[name] = IndexReader(idx)
        return {"status": {"code": "SUCCESS"}, "indexName": name}

    def _delete_index(self, name: str) -> dict:
        """DELETE /corpora/<name> — remove a data-dir-owned index
        (RequestHandlerDeleteIndex analogue); registered indexes
        outside the data dir are protected."""
        import shutil
        if name not in self._readers:
            raise KeyError(f"unknown corpus {name!r}")
        d = self._dirs.get(name)
        root = os.path.realpath(self._data_dir) if self._data_dir \
            else None
        if not d or root is None or not \
                os.path.realpath(d).startswith(root + os.sep):
            raise ValueError(f"corpus {name!r} is not a data-dir "
                             "index; refusing to delete")
        shutil.rmtree(d)
        del self._dirs[name]
        del self._readers[name]
        return {"status": {"code": "SUCCESS"}, "deleted": name}

    def _route(self, path: str, params: dict, method: str = "GET",
               body_in: bytes = b"",
               user: str | None = None) -> tuple[str, str]:
        from urllib.parse import unquote
        parts = [unquote(p) for p in path.split("/") if p]
        fmt = params.get("outputformat", "json")

        def emit(resp):
            if fmt == "xml":
                wrapped = ({"terms": resp} if isinstance(resp, list)
                           else resp)
                return to_xml(wrapped), "application/xml"
            if fmt == "csv":
                sepline = params.get("csvsepline") in ("true", "yes",
                                                       "1")
                summary = params.get("csvsummary") in ("true", "yes",
                                                       "1")
                kw = {"sepline": sepline, "summary": summary}
                if "hitGroups" in resp or "docGroups" in resp:
                    return groups_csv(resp, **kw), "text/csv"
                if "hits" in resp:
                    return hits_csv(resp, **kw), "text/csv"
                if "docs" in resp:
                    return docs_csv(resp, **kw), "text/csv"
            return json.dumps(resp, indent=1), "application/json"

        if not parts:
            return emit(handle_server_info(
                self._visible_readers(user),
                can_create_index=bool(self._data_dir),
                user_id=user))
        if parts == ["metrics"]:
            return self._metrics_text(), "text/plain; version=0.0.4"
        if parts[0] == "input-formats":
            if method in ("POST", "DELETE") and \
                    self._auth_method != "none" and user is None:
                # format registration is server-global state: with
                # auth enabled it needs a logged-in user
                raise PermissionError(
                    "mutations require a logged-in user")
            if method == "POST":
                # AddFormat analogue (RequestHandlerAddFormat.java):
                # body is the .blf.yaml text; ?name= overrides.
                # allow_path=False: the body must never be
                # interpretable as a server-side file path
                from blacklab_ray.formats import register_yaml_format
                if not body_in:
                    raise ValueError("POST /input-formats needs the "
                                     ".blf.yaml text as the body")
                reg = register_yaml_format(body_in.decode("utf-8"),
                                           name=params.get("name"),
                                           allow_path=False)
                return emit({"status": {"code": "SUCCESS"},
                             "formatName": reg})
            if method == "DELETE" and len(parts) == 2:
                # DeleteFormat analogue — USER formats only
                # (deleting a built-in would degrade the whole
                # server until restart)
                from blacklab_ray.formats import (
                    _FORMATS, USER_FORMATS,
                )
                if parts[1] not in USER_FORMATS:
                    raise KeyError(f"unknown user format "
                                   f"{parts[1]!r}")
                del _FORMATS[parts[1]]
                USER_FORMATS.discard(parts[1])
                return emit({"status": {"code": "SUCCESS"},
                             "deleted": parts[1]})
            return emit(handle_input_formats())
        if parts[0] == "cache-info":
            # per-corpus cache entries leak private corpus names —
            # list only what this user may see
            return emit(handle_cache_info(self._visible_readers(user)))
        if parts[0] == "cache-clear":
            if method != "POST":
                raise ValueError("cache-clear requires POST")
            if self._auth_method != "none" and \
                    user not in self._admin_users:
                # server-global flush: admin-only under auth (the
                # reference gates ClearCache behind debug mode)
                raise PermissionError(
                    "cache-clear requires an admin user")
            return emit(handle_cache_clear(self._visible_readers(user)))
        if parts[0] != "corpora":
            raise KeyError(f"unknown path {path!r}")
        if len(parts) < 2:
            raise KeyError("no corpus named")
        name = parts[1]
        # ACL first: reads need read access, every mutation (index
        # create/delete, doc add/delete, sharing change) needs WRITE
        # access — owner-only on user-scoped corpora
        self._check_access(name, user,
                           write=(method in ("POST", "DELETE")))
        if len(parts) == 2 and method == "POST":
            if self._auth_method != "none" and \
                    self._corpus_owner(name) is None and \
                    user is not None:
                # a logged-in user creates PRIVATE corpora under
                # their own id (IndexManager.createIndex: non-admin
                # users may only create user-scoped indexes)
                raise PermissionError(
                    f"logged-in users must create user-scoped "
                    f"corpora ('{user}:{name}')")
            return emit(self._create_index(name, params))
        if len(parts) == 2 and method == "DELETE":
            return emit(self._delete_index(name))
        reader = self._readers[name]
        op = parts[2] if len(parts) > 2 else None
        # pids are urls and may contain slashes (the server decodes
        # %2F before PATH_INFO splits) — take everything after /docs/
        # VERBATIM from the decoded path (part-splitting would eat the
        # empty segment in '//'), minus a trailing snippet/contents
        # sub-operation
        sub = None
        if op == "docs" and len(parts) > 3:
            raw = unquote(path)
            pid = raw[raw.index("/docs/") + len("/docs/"):]
            for s in ("snippet", "contents"):
                if pid.endswith("/" + s):
                    sub = s
                    pid = pid[:-(len(s) + 1)]
                    break
            parts = parts[:3] + [pid]
        if op == "sharing":
            return emit(self._sharing(name, method, params, body_in))
        if method in ("POST", "DELETE"):
            if op != "docs":
                raise KeyError(f"unsupported {method} on {path!r}")
            return emit(self._mutate(name, method, parts, body_in,
                                     params))
        _normalize_params(reader, params)
        if op is None:
            resp: Any = handle_info(reader, name)
        elif op == "status":
            resp = handle_index_status(reader, name)
        elif op == "explain":
            resp = handle_explain(reader, params)
        elif op == "fields" and len(parts) == 4:
            resp = handle_fieldinfo(reader, parts[3], params)
        elif op == "hits" and params.get("calc") == "colloc":
            resp = handle_colloc(reader, params)
        elif op == "hits" and "group" in params:
            resp = handle_hits_grouped(reader, params)
        elif op == "hits":
            resp = handle_hits(reader, params)
        elif op == "docs" and len(parts) == 3 and "group" in params:
            resp = handle_docs_grouped(reader, params)
        elif op == "docs" and len(parts) == 3:
            resp = handle_docs(reader, params)
        elif op == "docs" and len(parts) == 4 and sub is None:
            resp = handle_doc_info(reader, parts[3])
        elif op == "docs" and len(parts) == 4 and sub == "snippet":
            resp = handle_doc_snippet(reader, parts[3], params)
        elif op == "docs" and len(parts) == 4 and sub == "contents":
            # contents is raw text, never DataStream-wrapped
            return handle_doc_contents(reader, parts[3], params), \
                "text/plain; charset=utf-8"
        elif op == "termfreq":
            resp = handle_termfreq(reader, params)
        elif op == "autocomplete" and len(parts) == 4:
            resp = handle_autocomplete(reader, parts[3], params)
        else:
            raise KeyError(f"unknown operation {op!r}")
        return emit(resp)


def _open_index(spec: str):
    """Comma-separated dirs serve a read-only federated corpus (HTTP
    mutations reject them — updates belong to the owning sub-index)."""
    from blacklab_ray.query import open_reader
    return open_reader(spec)


def serve(index_dirs: dict, host: str = "127.0.0.1",
          port: int = 8080, data_dir: str | None = None,
          auth_method: str = "none",
          auth_header: str = "X-BlackLabUser",
          auth_fixed_user: str | None = None,
          admin_users: tuple = ()):
    """Blocking localhost server: ``index_dirs`` maps corpus name →
    index dir. ``data_dir`` enables index management (POST/DELETE
    /corpora/<name>) and auto-registers every existing index dir
    under it. Returns (httpd, app) when ``port=0`` picks a free port
    (tests); call ``httpd.serve_forever()``."""
    from wsgiref.simple_server import make_server

    index_dirs = dict(index_dirs)
    if data_dir and os.path.isdir(data_dir):
        from urllib.parse import unquote
        for dirname in sorted(os.listdir(data_dir)):
            d = os.path.join(data_dir, dirname)
            # user-scoped indexes store under the QUOTED full id
            # ('user%40example.com%3Amine') — unquote back to the
            # registry name so they survive restarts
            name = unquote(dirname) if "%" in dirname else dirname
            if name not in index_dirs and \
                    os.path.exists(os.path.join(d, "meta.json")):
                index_dirs[name] = d
    readers = {name: _open_index(d) for name, d in index_dirs.items()}
    app = BlsApp(readers, index_dirs, data_dir=data_dir,
                 auth_method=auth_method, auth_header=auth_header,
                 auth_fixed_user=auth_fixed_user,
                 admin_users=admin_users)
    httpd = make_server(host, port, app)
    return httpd, app
