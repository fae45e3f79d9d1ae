"""WARC (Web ARChive, ISO 28500) reader — the Common-Crawl container.

The north-rule input is Common-Crawl-style web pages; CC distributes
them as WARC files (raw crawl: ``*.warc.gz``) and WET files (extracted
text: ``*.warc.wet.gz`` — same container, ``conversion`` records).
This reader parses WARC/1.0 / WARC/1.1 into the engine's canonical
pages schema ``(url, warc_ts, html, text, lang)`` so a CC shard feeds
``build_index`` / ``curate`` directly.

Container handling:
- plain and gzip files, INCLUDING the CC convention of one gzip
  member per record (member-by-member ``zlib.decompressobj`` so a
  truncated tail member keeps the good members before it);
- ``response`` / ``resource`` records → payload into the ``html``
  binary column (HTTP response headers stripped per the spec's
  ``application/http`` content type); extraction/decoding happens
  downstream (BuildParams.extract_html → stages.htmltext), keeping
  the reader IO-bound;
- ``conversion`` records (WET) → payload decoded into ``text``;
- ``warcinfo`` / ``request`` / ``metadata`` records are skipped.

Scale shape: one WARC file per read task (CC shards are ~1 GB — the
standard distribution unit), one linear pass per file, no re-scans;
``ray.data.read_binary_files`` streams file blocks through the object
store with ordinary backpressure. No reference analogue (BlackLab
ingests per-document files; the web-scale container is this repo's
concern).
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pyarrow as pa
import ray.data

_PAYLOAD_TYPES = ("response", "resource")


def _parse_warc_date(s: str) -> int | None:
    """WARC-Date (ISO 8601, e.g. 2017-10-17T05:02:51Z) → epoch us."""
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        # exact us math: float-seconds would round 2024-era epochs
        return (int(dt.replace(microsecond=0).timestamp())
                * 1_000_000 + dt.microsecond)
    except ValueError:
        return None


def _strip_http_headers(payload: bytes) -> bytes:
    """Drop the HTTP response head from an application/http payload."""
    if payload[:5] in (b"HTTP/", b"http/"):
        cut = payload.find(b"\r\n\r\n")
        if cut >= 0:
            return payload[cut + 4:]
    return payload


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """One linear pass over a WARC byte stream → record dicts with
    ``type``, ``url``, ``ts_us``, ``content_type``, ``payload``.

    Handles gzip (multi-member — the per-record CC layout — and
    whole-file) transparently. Malformed trailing garbage ends the
    iteration instead of raising: a truncated tail record (killed
    crawler) must not poison the 1 GB of good records before it.
    """
    if data[:2] == b"\x1f\x8b":
        # member-by-member decompress (zlib.decompressobj, wbits=31 =
        # gzip framing) so a truncated final gzip member (the
        # killed-crawler case in the per-record CC layout) or trailing
        # garbage yields the bytes decompressed so far instead of
        # raising EOFError — gzip.GzipFile buffers whole members and
        # raises before returning ANY of a truncated stream
        chunks = []
        buf = data
        while buf[:2] == b"\x1f\x8b":
            d = zlib.decompressobj(wbits=31)
            try:
                chunks.append(d.decompress(buf))
            except zlib.error:
                break  # corrupt member: keep what earlier members gave
            if not d.eof:
                break  # truncated member (partial bytes already kept)
            buf = d.unused_data
        data = b"".join(chunks)
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            return  # trailing garbage / truncation
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().decode("ascii", "replace").lower()] \
                    = v.strip().decode("utf-8", "replace")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = head_end + 4
        if body_start + length > n:
            return  # truncated record
        yield {
            "type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri"),
            "ts_us": _parse_warc_date(headers.get("warc-date", "")),
            "content_type": headers.get("content-type", ""),
            "payload": data[body_start:body_start + length],
        }
        pos = body_start + length


def warc_records_to_pages(path: str, data: bytes,
                          types: tuple[str, ...] = _PAYLOAD_TYPES,
                          text_records: bool = True) -> pa.Table:
    """One WARC file → pages-schema rows (records without a target
    URI — warcinfo etc. — are skipped)."""
    urls, stamps, htmls, texts = [], [], [], []
    for rec in iter_warc_records(data):
        if not rec["url"]:
            continue
        if rec["type"] in types:
            urls.append(rec["url"])
            stamps.append(rec["ts_us"])
            htmls.append(_strip_http_headers(rec["payload"]))
            texts.append(None)
        elif text_records and rec["type"] == "conversion":
            urls.append(rec["url"])
            stamps.append(rec["ts_us"])
            htmls.append(None)
            texts.append(rec["payload"].decode("utf-8", "replace"))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(stamps, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.nulls(len(urls), pa.string()),
    })


def read_warc(paths, types: tuple[str, ...] = _PAYLOAD_TYPES,
              text_records: bool = True, **opts) -> ray.data.Dataset:
    """WARC/WET file(s) → pages Dataset. ``types`` selects which
    payload record types land in ``html`` (default response+resource);
    ``text_records`` keeps WET ``conversion`` records as ``text``."""
    ds = ray.data.read_binary_files(paths, include_paths=True, **opts)

    def _expand(batch: pa.Table) -> pa.Table:
        parts = [warc_records_to_pages(p, b, types, text_records)
                 for p, b in zip(batch.column("path").to_pylist(),
                                 batch.column("bytes").to_pylist())]
        parts = [t for t in parts if t.num_rows]
        if not parts:
            return warc_records_to_pages("", b"")
        return pa.concat_tables(parts)

    return ds.map_batches(_expand, batch_format="pyarrow")


def encode_warc_record(rec_type: str, url: str | None, ts_us: int | None,
                       payload: bytes,
                       http_headers: bool = False) -> bytes:
    """One WARC record (the writer half of the round trip; CC itself
    writes these). Emits the ISO-28500 mandatory headers
    (WARC-Record-ID — a deterministic content-derived urn:uuid —
    and Content-Type); whole-second timestamps produce a WARC/1.0
    record, sub-second ones the WARC/1.1 fractional form (1.0 mandates
    second precision, so the version advertises what the date uses)."""
    import hashlib
    import uuid

    if http_headers:
        payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                   b"\r\n" + payload)
    frac = ts_us is not None and ts_us % 1_000_000 != 0
    heads = [b"WARC/1.1" if frac else b"WARC/1.0",
             b"WARC-Type: " + rec_type.encode()]
    rid = uuid.UUID(bytes=hashlib.md5(
        rec_type.encode() + b"\x00" + (url or "").encode()
        + b"\x00" + str(ts_us).encode() + b"\x00" + payload).digest())
    heads.append(b"WARC-Record-ID: <urn:uuid:" + str(rid).encode()
                 + b">")
    if url:
        heads.append(b"WARC-Target-URI: " + url.encode())
    if ts_us is not None:
        dt = datetime.fromtimestamp(ts_us // 1_000_000,
                                    tz=timezone.utc) \
            .replace(microsecond=ts_us % 1_000_000)
        stamp = (dt.strftime("%Y-%m-%dT%H:%M:%S.%fZ") if frac
                 else dt.strftime("%Y-%m-%dT%H:%M:%SZ"))
        heads.append(b"WARC-Date: " + stamp.encode())
    heads.append(b"Content-Type: "
                 + (b"application/http;msgtype=response"
                    if http_headers else b"text/plain"))
    heads.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(heads) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def write_warc(path: str, records: list[tuple[str, str | None,
                                              int | None, bytes]],
               gzip_members: bool = False,
               http_headers: bool = True) -> None:
    """Write (type, url, ts_us, payload) records as a WARC file;
    ``gzip_members=True`` uses the CC one-gzip-member-per-record
    layout."""
    with open(path, "wb") as f:
        for rec_type, url, ts_us, payload in records:
            raw = encode_warc_record(
                rec_type, url, ts_us, payload,
                http_headers=http_headers and rec_type == "response")
            f.write(gzip.compress(raw) if gzip_members else raw)


def write_warc_dataset(ds: ray.data.Dataset, out_dir: str,
                       gzip_members: bool = True) -> list[str]:
    """Export a pages Dataset back to WARC shards (the curate → crawl
    round trip: html rows become ``response`` records with a synthetic
    HTTP head, text-only rows become WET-style ``conversion``
    records).

    One WARC file per input block, written inside ``map_batches`` with
    atomic tmp+rename; the filename is the md5 of the block's urls AND
    payload bytes, so a re-run over identical content skips finished
    shards (the repo's resumable-output convention) while changed
    content under the same urls writes a NEW shard rather than
    silently keeping the stale one. Returns the shard paths (sorted).
    """
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def _write(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        urls = batch.column("url").to_pylist()
        stamps = (batch.column("warc_ts")
                  .cast(pa.timestamp("us")).cast(pa.int64())
                  .to_pylist() if "warc_ts" in batch.column_names
                  else [None] * len(urls))
        htmls = (batch.column("html").to_pylist()
                 if "html" in batch.column_names
                 else [None] * len(urls))
        texts = (batch.column("text").to_pylist()
                 if "text" in batch.column_names
                 else [None] * len(urls))
        recs = []
        digest = hashlib.md5()
        for u, ts, h, t in zip(urls, stamps, htmls, texts):
            if h is not None:
                recs.append(("response", u, ts, bytes(h)))
            elif t is not None:
                recs.append(("conversion", u, ts, t.encode()))
            else:
                continue
            digest.update(u.encode() if u else b"")
            digest.update(b"\x00")
            digest.update(recs[-1][3])
            digest.update(b"\x00")
        path = os.path.join(
            out_dir, f"part-{digest.hexdigest()}.warc"
            + (".gz" if gzip_members else ""))
        if not os.path.exists(path):
            tmp = path + ".tmp"
            write_warc(tmp, recs, gzip_members=gzip_members)
            os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "n": pa.array([batch.num_rows], pa.int64())})

    out = ds.map_batches(_write, batch_format="pyarrow") \
        .to_pandas()
    return sorted(set(out["path"]))
