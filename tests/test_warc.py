"""WARC container reader: spec parsing, CC gzip-member layout, and the
end-to-end WARC → extract → index path with the north-rule invariant
(byte-identical extracted text per url)."""

import gzip

import pyarrow as pa
import pytest

from blacklab_ray.sources.warc import (
    encode_warc_record,
    iter_warc_records,
    read_warc,
    warc_records_to_pages,
    write_warc,
)

TS = 1704067200_000_000  # 2024-01-01T00:00:00Z


def _sample_records():
    return [
        ("warcinfo", None, TS, b"software: test\r\n"),
        ("request", "https://a.example/", TS, b"GET / HTTP/1.1\r\n"),
        ("response", "https://a.example/", TS,
         b"<html><body><p>hello world</p></body></html>"),
        ("response", "https://b.example/x", TS + 5_000_000,
         b"<html><body><p>second doc</p></body></html>"),
        ("conversion", "https://c.example/wet", TS,
         "extracted text body\nline two".encode()),
    ]


def test_iter_warc_records_plain(tmp_path):
    p = str(tmp_path / "f.warc")
    write_warc(p, _sample_records())
    with open(p, "rb") as f:
        recs = list(iter_warc_records(f.read()))
    assert [r["type"] for r in recs] == [
        "warcinfo", "request", "response", "response", "conversion"]
    # response payload carries the synthetic HTTP head (stripped later)
    assert recs[2]["payload"].startswith(b"HTTP/1.1 200 OK")
    assert recs[2]["url"] == "https://a.example/"
    assert recs[2]["ts_us"] == TS
    assert recs[3]["ts_us"] == TS + 5_000_000


def test_gzip_member_layout_roundtrip(tmp_path):
    """The CC one-gzip-member-per-record layout parses identically to
    the plain stream."""
    plain, gz = str(tmp_path / "a.warc"), str(tmp_path / "a.warc.gz")
    write_warc(plain, _sample_records())
    write_warc(gz, _sample_records(), gzip_members=True)
    with open(plain, "rb") as f:
        a = list(iter_warc_records(f.read()))
    with open(gz, "rb") as f:
        b = list(iter_warc_records(f.read()))
    assert a == b
    # and the whole-file-gzip variant too
    with open(plain, "rb") as f:
        c = list(iter_warc_records(gzip.compress(f.read())))
    assert a == c


def test_truncated_tail_tolerated(tmp_path):
    """A truncated final record (killed crawler) yields the complete
    records before it instead of raising."""
    data = b"".join(
        encode_warc_record(t, u, ts, p, http_headers=(t == "response"))
        for t, u, ts, p in _sample_records())
    recs = list(iter_warc_records(data[:len(data) - 30]))
    assert len(recs) == 4  # the 5th record's payload is cut short


def test_truncated_gzip_tail_tolerated(tmp_path):
    """A truncated final GZIP MEMBER (the per-record CC layout cut
    mid-member by a killed crawler) yields the complete members
    before it instead of raising EOFError."""
    members = [gzip.compress(encode_warc_record(
        t, u, ts, p, http_headers=(t == "response")))
        for t, u, ts, p in _sample_records()]
    data = b"".join(members[:-1]) + members[-1][:10]  # cut mid-member
    recs = list(iter_warc_records(data))
    assert [r["type"] for r in recs] == [
        "warcinfo", "request", "response", "response"]
    # garbage tail (not even a gzip header) after good members
    recs2 = list(iter_warc_records(b"".join(members) + b"\x1fgarbage"))
    assert len(recs2) >= 4


def test_mandatory_headers_and_fractional_dates():
    """Records carry ISO-28500 WARC-Record-ID + Content-Type; a
    sub-second timestamp round-trips exactly (WARC/1.1 fractional
    form), a whole-second one stays WARC/1.0."""
    frac_ts = TS + 123_456
    raw = encode_warc_record("response", "https://a.example/",
                             frac_ts, b"<html/>", http_headers=True)
    assert raw.startswith(b"WARC/1.1")
    assert b"WARC-Record-ID: <urn:uuid:" in raw
    assert b"Content-Type: application/http;msgtype=response" in raw
    assert b".123456Z" in raw
    (rec,) = iter_warc_records(raw)
    assert rec["ts_us"] == frac_ts
    whole = encode_warc_record("conversion", "https://c.example/",
                               TS, b"text")
    assert whole.startswith(b"WARC/1.0")
    assert b"Content-Type: text/plain" in whole
    (rec2,) = iter_warc_records(whole)
    assert rec2["ts_us"] == TS
    # record ids are deterministic and distinct per content
    assert encode_warc_record("response", "u", TS, b"x") \
        == encode_warc_record("response", "u", TS, b"x")
    id_of = lambda r: r.split(b"urn:uuid:")[1][:36]  # noqa: E731
    assert id_of(encode_warc_record("response", "u", TS, b"x")) \
        != id_of(encode_warc_record("response", "u", TS, b"y"))


def test_pages_table_shape():
    data = b"".join(
        encode_warc_record(t, u, ts, p, http_headers=(t == "response"))
        for t, u, ts, p in _sample_records())
    t = warc_records_to_pages("f.warc", data)
    assert t.column_names == ["url", "warc_ts", "html", "text", "lang"]
    assert t.num_rows == 3  # 2 responses + 1 conversion
    # HTTP head stripped from html payloads
    assert t["html"][0].as_py().startswith(b"<html>")
    assert t["text"][0].as_py() is None
    # conversion record → text, no html
    assert t["html"][2].as_py() is None
    assert t["text"][2].as_py() == "extracted text body\nline two"
    assert t["warc_ts"][0].value == TS


def test_read_warc_dataset(ray_session, tmp_path):
    p = str(tmp_path / "f.warc.gz")
    write_warc(p, _sample_records(), gzip_members=True)
    got = read_warc(p).to_pandas().sort_values("url")
    assert list(got["url"]) == ["https://a.example/",
                                "https://b.example/x",
                                "https://c.example/wet"]


def test_format_registry(ray_session, tmp_path):
    from blacklab_ray.formats import read_pages
    p = str(tmp_path / "f.warc")
    write_warc(p, _sample_records())
    warc = read_pages("warc", p).to_pandas()
    assert len(warc) == 3
    wet = read_pages("wet", p).to_pandas()
    assert list(wet["url"]) == ["https://c.example/wet"]


def test_warc_to_index_byte_identical_extraction(ray_session, tmp_path):
    """The north-rule invariant through the WARC path: pages written
    into WARC responses, read back, html-extracted at build time —
    extracted text byte-identical per url to the direct-parquet path,
    and the index searchable."""
    import numpy as np
    import pyarrow.parquet as pq

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader, search_taat
    from blacklab_ray.sources.synth import generate_pages
    from blacklab_ray.stages.tokenize import hash64

    pages = generate_pages(25)
    warc_path = str(tmp_path / "crawl.warc.gz")
    write_warc(warc_path,
               [("response", u, ts.value, h) for u, ts, h in
                zip(pages["url"].to_pylist(), pages["warc_ts"],
                    pages["html"].to_pylist())],
               gzip_members=True)

    got = read_warc(warc_path).to_pandas().set_index("url")
    for u, h in zip(pages["url"].to_pylist(),
                    pages["html"].to_pylist()):
        assert bytes(got.loc[u, "html"]) == h  # payload byte-identical

    idx = str(tmp_path / "idx")
    build_index(read_warc(warc_path), idx,
                BuildParams(num_buckets=2, n_salts=1,
                            extract_html=True, trust_text=False))
    reader = IndexReader(idx)
    assert reader.n_docs == 25
    # extracted text byte-identical per url (synth's expected_text is
    # what the direct parquet path indexes)
    from blacklab_ray.testoracle import CorpusOracle
    oracle = CorpusOracle.from_pages(pages)
    res = search_taat(reader, ["the"], k=10)
    exp = oracle.topk(["the"], 10)
    assert res["doc_id"].to_pylist() == [d for d, _ in exp]
    for g, (_, s) in zip(res["score"].to_pylist(), exp):
        assert abs(g - s) < 1e-9


def test_write_warc_dataset_roundtrip(ray_session, tmp_path):
    """pages → WARC shards → pages round trip, with skip-if-exists
    resumability (re-run writes nothing new)."""
    import os

    import ray.data

    from blacklab_ray.sources.synth import generate_pages
    from blacklab_ray.sources.warc import write_warc_dataset

    pages = generate_pages(30)
    ds = ray.data.from_arrow(pages).repartition(4)
    out = str(tmp_path / "shards")
    paths = write_warc_dataset(ds, out)
    assert len(paths) >= 1 and all(p.endswith(".warc.gz")
                                   for p in paths)
    mtimes = {p: os.path.getmtime(p) for p in paths}
    # resumable: identical content skips finished shards
    paths2 = write_warc_dataset(ray.data.from_arrow(pages)
                                .repartition(4), out)
    assert sorted(paths2) == sorted(paths)
    assert all(os.path.getmtime(p) == mtimes[p] for p in paths)

    got = read_warc(paths).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    want = pages.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(want["url"])
    for g, w in zip(got["html"], want["html"]):
        assert bytes(g) == bytes(w)
    assert list(got["warc_ts"]) == list(want["warc_ts"])


def test_write_warc_dataset_content_keyed_resume(ray_session, tmp_path):
    """Changed content under the SAME urls writes a new shard instead
    of silently keeping the stale one (the skip key hashes payloads,
    not just urls)."""
    import ray.data
    from blacklab_ray.sources.warc import write_warc_dataset

    def _pages(body: bytes) -> pa.Table:
        return pa.table({
            "url": pa.array(["https://r.example/a",
                             "https://r.example/b"], pa.string()),
            "warc_ts": pa.array([TS, TS], pa.timestamp("us")),
            "html": pa.array([body, body], pa.binary()),
            "text": pa.array([None, None], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
        })

    out = str(tmp_path / "rs")
    p1 = write_warc_dataset(ray.data.from_arrow(_pages(b"<p>v1</p>")),
                            out)
    p2 = write_warc_dataset(ray.data.from_arrow(_pages(b"<p>v2</p>")),
                            out)
    assert set(p1) != set(p2)
    got = read_warc(p2).to_pandas()
    assert all(bytes(h) == b"<p>v2</p>" for h in got["html"])


def test_write_warc_dataset_wet_rows(ray_session, tmp_path):
    """Text-only rows export as conversion records and read back as
    text."""
    import ray.data
    from blacklab_ray.sources.warc import write_warc_dataset
    t = pa.table({
        "url": pa.array(["https://t.example/a"], pa.string()),
        "warc_ts": pa.array([TS], pa.timestamp("us")),
        "html": pa.array([None], pa.binary()),
        "text": pa.array(["plain body"], pa.string()),
        "lang": pa.array(["en"], pa.string()),
    })
    paths = write_warc_dataset(ray.data.from_arrow(t),
                               str(tmp_path / "w"))
    got = read_warc(paths).to_pandas()
    assert got.loc[0, "text"] == "plain body"
    assert got.loc[0, "html"] is None
