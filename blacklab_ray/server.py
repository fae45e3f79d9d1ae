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
import re
from typing import Any
from xml.sax.saxutils import escape, quoteattr

import numpy as np

# ---------------------------------------------------------------------------
# parameter parsing
# ---------------------------------------------------------------------------

_RANGE_RE = re.compile(r"^\[(\S+)\s+TO\s+(\S+)\]$")


def parse_filter(expr: str) -> list[tuple]:
    """Lucene-ish metadata filter subset (BLS ``filter`` param):
    ``field:value``, ``field:[lo TO hi]``, joined by ``AND``."""
    conds: list[tuple] = []
    for part in re.split(r"\s+AND\s+", expr.strip()):
        if not part:
            continue
        field, _, value = part.partition(":")
        if not _:
            raise ValueError(f"bad filter clause {part!r}")
        m = _RANGE_RE.match(value)
        if m:
            lo, hi = m.group(1), m.group(2)
            conds.append((field, "range",
                          (float(lo) if "." in lo else int(lo),
                           float(hi) if "." in hi else int(hi))))
        else:
            conds.append((field, "=", value.strip('"')))
    return conds


def _allowed_ids(reader, filter_expr: str | None):
    if not filter_expr:
        return None
    from blacklab_ray.query.metafilter import (filter_docs_meta,
                                               metadata_field_types)
    conds = parse_filter(filter_expr)
    # BLS `field:value` on a TOKENIZED field is an analyzed-token
    # match, not exact equality (ADVICE r3: "=" would FieldTypeError)
    types = metadata_field_types(reader)
    conds = [(f, "contains", v)
             if op == "=" and types.get(f) == "tokenized"
             else (f, op, v)
             for f, op, v in conds]
    return filter_docs_meta(reader, conds)


# ---------------------------------------------------------------------------
# handlers
# ---------------------------------------------------------------------------

def _context(reader, doc_ids, starts, ends, n_ctx: int):
    """left/match/right word lists per hit via forward-index gathers
    (Kwics/Contexts semantics) — one batched tokens_at per region."""
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
    words = reader.tokens_at(np.array(flat_docs, dtype=np.int64),
                             np.array(flat_pos, dtype=np.int64))
    out = []
    i = 0
    for nl, nm, nr in regions:
        left = words[i:i + nl]
        match = words[i + nl:i + nl + nm]
        right = words[i + nl + nm:i + nl + nm + nr]
        i += nl + nm + nr
        out.append(({"word": left}, {"word": match}, {"word": right}))
    return out


def _doc_infos(reader, doc_ids) -> dict:
    urls = reader.urls(doc_ids)
    lens = reader.doc_lens(doc_ids)
    return {str(u): {"pid": [str(u)],
                     "lengthInTokens": int(n),
                     "mayView": True}
            for u, n in zip(urls, lens)}


def _spans_for(reader, patt: str, filter_expr: str | None):
    from blacklab_ray.query.cql import cql_spans
    spans = cql_spans(reader, patt)
    d = spans["doc_id"].to_numpy()
    s = spans["start"].to_numpy()
    e = spans["end"].to_numpy()
    allowed = _allowed_ids(reader, filter_expr)
    if allowed is not None:
        keep = np.isin(d, allowed)
        d, s, e = d[keep], s[keep], e[keep]
    order = np.lexsort((s, d))
    return d[order], s[order], e[order]


def handle_hits(reader, params: dict) -> dict:
    """GET /corpora/<c>/hits — RequestHandlerHits analogue."""
    patt = params.get("patt", "")
    first = int(params.get("first", 0))
    number = int(params.get("number", 50))
    n_ctx = int(params.get("wordsaroundhit", 1))
    d, s, e = _spans_for(reader, patt, params.get("filter"))
    total = int(d.size)
    n_docs = int(np.unique(d).size)
    wd, ws, we = d[first:first + number], s[first:first + number], \
        e[first:first + number]
    ctx = _context(reader, wd, ws, we, n_ctx)
    urls = reader.urls(wd)
    hits = [{"docPid": str(u), "start": int(a), "end": int(b),
             "left": L, "match": M, "right": R}
            for u, a, b, (L, M, R) in zip(urls, ws, we, ctx)]
    return {
        "summary": _summary(params, first, number, len(hits), total,
                            n_docs),
        "hits": hits,
        "docInfos": _doc_infos(reader, np.unique(wd)),
    }


def handle_hits_grouped(reader, params: dict) -> dict:
    """GET /hits?group= — HitGroups analogue. Supported group criteria:
    ``hit:word:i`` (matched text) and ``field:<meta>``."""
    patt = params.get("patt", "")
    crit = params["group"]
    first = int(params.get("first", 0))
    number = int(params.get("number", 50))
    d, s, e = _spans_for(reader, patt, params.get("filter"))
    total = int(d.size)
    if crit.startswith("field:"):
        fieldname = crit.split(":", 1)[1]
        import os

        import pyarrow.parquet as pq
        tbl = pq.read_table(os.path.join(reader.index_dir, "fwd"),
                            columns=["doc_id", fieldname])
        lookup = dict(zip(tbl["doc_id"].to_pylist(),
                          tbl[fieldname].to_pylist()))
        keys = [str(lookup.get(int(x))) for x in d]
        prop = f"doc:{fieldname}"
    else:
        # group identity is the FULL matched text (BLS groups
        # multi-token hits by all tokens s..e-1, not the first word —
        # ADVICE r3): one batched tokens_at over the ragged positions
        lens = (e - s).astype(np.int64)
        csum = np.cumsum(lens)
        flat_docs = np.repeat(d, lens)
        flat_pos = np.repeat(s, lens) \
            + np.arange(int(csum[-1]), dtype=np.int64) \
            - np.repeat(csum - lens, lens)
        toks = reader.tokens_at(flat_docs, flat_pos)
        keys = [" ".join(filter(None, toks[a:b]))
                for a, b in zip((csum - lens).tolist(), csum.tolist())]
        prop = "hit:word:i"
    groups: dict[str, dict] = {}
    for k, doc in zip(keys, d):
        g = groups.setdefault(k, {"size": 0, "docs": set()})
        g["size"] += 1
        g["docs"].add(int(doc))
    ordered = sorted(groups.items(), key=lambda kv: (-kv[1]["size"],
                                                     kv[0]))
    window = ordered[first:first + number]
    return {
        "summary": {
            **_summary(params, first, number, len(window), total,
                       int(np.unique(d).size)),
            "numberOfGroups": len(groups),
            "largestGroupSize": (ordered[0][1]["size"] if ordered
                                 else 0),
        },
        "hitGroups": [{
            "identity": f"cws:word:i:{k}" if prop == "hit:word:i"
                        else f"{prop}:{k}",
            "identityDisplay": k,
            "size": g["size"],
            "properties": [{"name": prop, "value": k}],
            "numberOfDocs": len(g["docs"]),
        } for k, g in window],
    }


def handle_docs(reader, params: dict) -> dict:
    """GET /corpora/<c>/docs — doc results (with or without patt)."""
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
    total = int(uniq.size)
    wd = uniq[first:first + number]
    wc = counts[first:first + number]
    urls = reader.urls(wd)
    lens = reader.doc_lens(wd)
    return {
        "summary": _summary(params, first, number, int(wd.size), total,
                            total),
        "docs": [{
            "docPid": str(u),
            "numberOfHits": int(c),
            "docInfo": {"pid": [str(u)], "lengthInTokens": int(n),
                        "mayView": True},
        } for u, c, n in zip(urls, wc, lens)],
    }


def handle_info(reader, name: str = "index") -> dict:
    """GET /corpora/<c> — index metadata summary."""
    return {
        "indexName": name,
        "tokenCount": int(reader.meta["total_tokens"]),
        "documentCount": int(reader.n_docs),
        "status": "available",
        "documentFormat": "webtext",
        "fieldInfo": {"pidField": "url"},
        "metadataFields": {f: {"type": t} for f, t in sorted(
            _field_types(reader).items())},
    }


def _field_types(reader) -> dict:
    from blacklab_ray.query.metafilter import metadata_field_types
    return metadata_field_types(reader)


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
             "left": "w", "match": "w", "right": "w", "word": "w"}


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
        for k, sub in v.items():
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


def groups_csv(resp: dict) -> str:
    """CSV export of grouped results (WriteCsv.hitsGroupsResponse
    shape: identity, size, numberOfDocs)."""
    import csv
    import io
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(["identity", "size", "numberOfDocs"])
    for g in resp.get("hitGroups", []):
        w.writerow([g["identityDisplay"], g["size"],
                    g["numberOfDocs"]])
    return buf.getvalue()


# ---------------------------------------------------------------------------
# WSGI app + server
# ---------------------------------------------------------------------------

class BlsApp:
    """WSGI app: ``/corpora/<name>`` info, ``/corpora/<name>/hits``
    (+ ``group=``), ``/corpora/<name>/docs``; ``outputformat``
    json (default) | xml | csv (grouped only)."""

    def __init__(self, readers: dict):
        self._readers = readers

    def __call__(self, environ, start_response):
        from urllib.parse import parse_qsl
        path = environ.get("PATH_INFO", "")
        params = dict(parse_qsl(environ.get("QUERY_STRING", "")))
        try:
            body, ctype = self._route(path, params)
            status = "200 OK"
        except KeyError as e:
            body = json.dumps({"error": {"code": "NOT_FOUND",
                                         "message": str(e)}})
            ctype, status = "application/json", "404 Not Found"
        except Exception as e:   # noqa: BLE001 — wire boundary
            body = json.dumps({"error": {
                "code": "INTERNAL_ERROR", "message": str(e)}})
            ctype, status = "application/json", "500 Internal Server Error"
        data = body.encode("utf-8")
        start_response(status, [("Content-Type", ctype),
                                ("Content-Length", str(len(data)))])
        return [data]

    def _route(self, path: str, params: dict) -> tuple[str, str]:
        parts = [p for p in path.split("/") if p]
        if not parts or parts[0] != "corpora":
            raise KeyError(f"unknown path {path!r}")
        if len(parts) < 2:
            raise KeyError("no corpus named")
        reader = self._readers[parts[1]]
        op = parts[2] if len(parts) > 2 else None
        fmt = params.get("outputformat", "json")
        if op is None:
            resp = handle_info(reader, parts[1])
        elif op == "hits" and "group" in params:
            resp = handle_hits_grouped(reader, params)
        elif op == "hits":
            resp = handle_hits(reader, params)
        elif op == "docs":
            resp = handle_docs(reader, params)
        else:
            raise KeyError(f"unknown operation {op!r}")
        if fmt == "xml":
            return to_xml(resp), "application/xml"
        if fmt == "csv":
            return groups_csv(resp), "text/csv"
        return json.dumps(resp, indent=1), "application/json"


def serve(index_dirs: dict, host: str = "127.0.0.1",
          port: int = 8080):
    """Blocking localhost server: ``index_dirs`` maps corpus name →
    index dir. Returns (httpd, app) when ``port=0`` picks a free port
    (tests); call ``httpd.serve_forever()``."""
    from wsgiref.simple_server import make_server

    from blacklab_ray.query import IndexReader
    readers = {name: IndexReader(d) for name, d in index_dirs.items()}
    app = BlsApp(readers)
    httpd = make_server(host, port, app)
    return httpd, app
