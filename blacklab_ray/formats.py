"""Input-format registry (DocumentFormats analogue).

BlackLab resolves a format id to a DocIndexer via a registry
(engine/src/main/java/nl/inl/blacklab/index/DocumentFormats.java:19);
here a format name resolves to a reader producing the canonical pages
schema ``(url, warc_ts, html, text, lang)`` as a ``ray.data.Dataset``:

- ``webtext-html``  — pages Parquet carrying raw ``html``; text is
  extracted by the build's HtmlExtractor stage (DocIndexerXPath
  analogue, the round-1 format).
- ``webtext-text``  — pages Parquet with a trusted ``text`` column.
- ``plaintext``     — one document per file
  (DocIndexerPlainText.java:27): url = file path, text = file body.
- ``tabular-tsv`` / ``tabular-csv`` — word-per-line token streams
  (DocIndexerTabular.java:37) with explicit ``(url, pos, word[, lang])``
  columns; rows group by url, sort by pos, and join into the document
  text. The one wide step shuffles on ``hash(url) % 32`` (docs stay
  whole) and assembles every document in the partition with ONE
  vectorized UDF call (ListArray offsets + binary_join) — not one
  Python call per document.
- ``sketch-wpl``    — Sketch Engine word-per-line with inline/glue
  tags and <doc> metadata (sketch-wpl.blf.yaml); pure per-file parse,
  no shuffle (docs never span files).

``register_format`` is the user-extension slot (SURVEY §2.12).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray.data

PAGES_SCHEMA_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]

_FORMATS: dict[str, Callable[..., ray.data.Dataset]] = {}


def register_format(name: str,
                    reader: Callable[..., ray.data.Dataset]) -> None:
    """Register a format reader: fn(paths, **opts) -> pages Dataset."""
    _FORMATS[name] = reader


# The reference's registry ids (DocumentFormats.java registrations +
# shipped .blf.yaml names) that don't share this engine's canonical
# name — a reference user's ``--format tei-p5`` etc. must keep working.
# An explicit ``register_format`` under the alias name wins.
FORMAT_ALIASES: dict[str, str] = {
    "txt": "plaintext",
    "csv": "tabular-csv",
    "tsv": "tabular-tsv",
    "tsv-frog": "tabular-tsv",
    "tei-p5": "tei",
    "tei-p5-legacy": "tei",
    "tei-p4-legacy": "tei",
    "cmdi": "xml",
}


# names registered through register_yaml_format — the only formats
# the HTTP DeleteFormat endpoint may remove (built-ins are protected)
USER_FORMATS: set[str] = set()


def register_yaml_format(src: str, name: str | None = None,
                         allow_path: bool = True) -> str:
    """Register a BlackLab ``.blf.yaml`` config (file path or YAML
    text) as a named format — the AddFormat analogue
    (InputFormatReader.java): a reference user's own format file
    reads their corpus through the config-driven XML engine. Returns
    the registered name. ``allow_path=False`` for untrusted sources
    (HTTP bodies). A name that collides with a BUILT-IN format or
    alias is rejected; re-registering a user format replaces it."""
    from blacklab_ray.stages.blfyaml import load_blf_yaml
    from blacklab_ray.stages.xmlconfig import read_xml_config
    cfg = load_blf_yaml(src, name=name, allow_path=allow_path)
    if cfg.name not in USER_FORMATS and \
            (cfg.name in _FORMATS or cfg.name in FORMAT_ALIASES):
        raise ValueError(f"format name {cfg.name!r} collides with a "
                         "built-in format")

    def _reader(paths, **opts):
        return read_xml_config(paths, cfg, **opts)

    register_format(cfg.name, _reader)
    USER_FORMATS.add(cfg.name)
    return cfg.name


def resolve_format(name: str) -> str:
    """Canonical format id for ``name`` (aliases resolve unless the
    user registered a reader under the alias itself)."""
    if name in _FORMATS:
        return name
    return FORMAT_ALIASES.get(name, name)


def formats() -> list[str]:
    return sorted(set(_FORMATS) | set(FORMAT_ALIASES))


def read_pages(fmt: str, paths, **opts) -> ray.data.Dataset:
    fmt = resolve_format(fmt)
    if fmt not in _FORMATS:
        raise ValueError(
            f"unknown input format {fmt!r}; registered: {formats()}")
    return _FORMATS[fmt](paths, **opts)


# ---------------------------------------------------------------------------
# built-in formats
# ---------------------------------------------------------------------------

def _read_webtext(paths, **opts) -> ray.data.Dataset:
    return ray.data.read_parquet(paths, **opts)


def _read_plaintext(paths, encoding: str = "utf-8",
                    **opts) -> ray.data.Dataset:
    """One doc per file: url = path, text = decoded body."""
    ds = ray.data.read_binary_files(paths, include_paths=True, **opts)

    def to_pages(batch: pa.Table) -> pa.Table:
        bodies = batch.column("bytes").to_pylist()
        texts = [b.decode(encoding, errors="replace") for b in bodies]
        n = batch.num_rows
        return pa.table({
            "url": batch.column("path").cast(pa.string()),
            "warc_ts": pa.nulls(n, pa.timestamp("us")),
            "html": pa.array(bodies, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.nulls(n, pa.string()),
        })

    return ds.map_batches(to_pages, batch_format="pyarrow")


def _read_tabular(paths, delimiter: str = "\t",
                  num_partitions: int = 32,
                  **opts) -> ray.data.Dataset:
    """Word-per-line rows (url, pos, word[, lang]) → one page per url.

    ``num_partitions``: part-hash shuffle width for doc assembly —
    size to a few x cluster cores at scale (each partition is one
    task's working set)."""
    from pyarrow import csv as pa_csv
    ds = ray.data.read_csv(
        paths,
        parse_options=pa_csv.ParseOptions(delimiter=delimiter),
        **opts)

    P = num_partitions

    def _part(t: pa.Table) -> pa.Table:
        """Partition key from batch-unique url hashes (docs stay whole;
        one vectorized UDF call per PARTITION, not per url — the
        per-doc map_groups shape pays one Python call per document)."""
        if t.num_rows == 0:
            return t
        import pyarrow.compute as pc
        from blacklab_ray.stages.tokenize import hash64
        from blacklab_ray.util import hash64_batch
        d = pc.dictionary_encode(t.column("url").combine_chunks())
        uniq_part = (hash64_batch(d.dictionary) % P).astype(np.int64)
        part = uniq_part[d.indices.to_numpy(zero_copy_only=False)]
        return t.append_column("part", pa.array(part, pa.int64()))

    def pages_from_part(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        base = pa.schema([
            ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()), ("text", pa.string()),
            ("lang", pa.string())])
        if g.num_rows == 0 or "url" not in g.column_names:
            return base.empty_table()
        urls = np.asarray(g.column("url").to_pylist(), dtype=object)
        pos = g.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, urls))
        t = g.take(pa.array(order))
        urls = urls[order]
        n = urls.size
        new = np.ones(n, dtype=bool)
        new[1:] = urls[1:] != urls[:-1]
        starts = np.flatnonzero(new)
        offs = np.append(starts, n).astype(np.int32)
        words = pc.cast(t.column("word").combine_chunks(), pa.string())
        texts = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offs, pa.int32()), words),
            " ")
        starts_pa = pa.array(starts, pa.int64())
        cols = {
            "url": t.column("url").take(starts_pa),
            "warc_ts": pa.nulls(starts.size, pa.timestamp("us")),
            "html": pc.cast(texts, pa.binary()),
            "text": texts,
            "lang": (t.column("lang").take(starts_pa)
                     if "lang" in t.column_names
                     else pa.nulls(starts.size, pa.string())),
        }
        # extra columns (lemma, pos tags, …) become token-aligned
        # list<string> annotation columns — the word-per-line formats'
        # parallel annotations (tsv-frog's word/lemma/pos triples,
        # DocIndexerTabular.java:37)
        for c in t.column_names:
            if c in ("url", "pos", "word", "lang", "part"):
                continue
            cols[c] = pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()),
                pc.cast(t.column(c).combine_chunks(), pa.string()))
        return pa.table(cols)

    return ds.map_batches(_part, batch_format="pyarrow") \
        .groupby("part").map_groups(pages_from_part,
                                    batch_format="pyarrow")


def _read_sketch_wpl(paths, encoding: str = "utf-8",
                     meta_fields: tuple = ("id", "lang"),
                     **opts) -> ray.data.Dataset:
    """Sketch Engine WPL (sketch-wpl.blf.yaml; DocIndexerTabular with
    inlineTags+glueTags): word-per-line ``word TAB pos TAB lemma``
    rows, ``<doc attr="...">`` document boundaries (declared attrs →
    metadata), other inline tags → standoff spans, ``<g/>`` glue tags
    → empty punct between the adjacent tokens (punct-before-each-word
    convention, n_tokens+1). Parsing is a pure per-file map_batches
    task; one file may hold many docs."""
    import re as _re

    from blacklab_ray.stages.xmlconfig import TAG_SPANS_TYPE
    ds = ray.data.read_binary_files(paths, include_paths=True, **opts)
    attr_re = _re.compile(r'([\w:-]+)\s*=\s*"([^"]*)"')

    def to_pages(batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {
            "url": [], "text": [], "lang": [],
            "lemma": [], "pos": [], "tags": [], "punct": []}
        meta: dict[str, list] = {m: [] for m in meta_fields}

        def flush(doc):
            if doc is None or not doc["words"]:
                return
            rows["url"].append(doc["attrs"].get("id") or doc["fallback"])
            rows["text"].append(" ".join(doc["words"]))
            rows["lang"].append(doc["attrs"].get("lang"))
            rows["lemma"].append(doc["lemma"])
            rows["pos"].append(doc["pos"])
            # close any unclosed inline tags at doc end
            for name, start, attrs in doc["open"]:
                if len(doc["words"]) > start:
                    doc["spans"].append(
                        {"name": name, "start": start,
                         "end": len(doc["words"]), "attrs": attrs})
            rows["tags"].append(doc["spans"])
            doc["punct"].append("")          # trailing slot
            rows["punct"].append(doc["punct"])
            for m in meta_fields:
                meta[m].append(doc["attrs"].get(m, ""))

        for path, body in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            doc = None
            n_docs = 0
            for line in body.decode(encoding,
                                    errors="replace").splitlines():
                line = line.strip()
                if not line:
                    continue
                if line.startswith("<"):
                    if line.startswith("<doc"):
                        flush(doc)
                        doc = {"attrs": dict(attr_re.findall(line)),
                               "fallback": f"{path}#{n_docs}",
                               "words": [], "lemma": [], "pos": [],
                               "spans": [], "open": [], "punct": [],
                               "glue": False}
                        n_docs += 1
                    elif line.startswith("</doc"):
                        flush(doc)
                        doc = None
                    elif doc is not None and _re.match(
                            r"<g\s*/\s*>", line):
                        # any self-closing tag named g is glue —
                        # "<g />" included (ADVICE r3)
                        doc["glue"] = True
                    elif doc is not None and line.startswith("</"):
                        name = line[2:].strip("> ")
                        for i in range(len(doc["open"]) - 1, -1, -1):
                            if doc["open"][i][0] == name:
                                nm, start, attrs = doc["open"].pop(i)
                                if len(doc["words"]) > start:
                                    doc["spans"].append(
                                        {"name": nm, "start": start,
                                         "end": len(doc["words"]),
                                         "attrs": attrs})
                                break
                    elif doc is not None:
                        name = line[1:].split(">")[0].split()[0] \
                            .strip("/")
                        attrs = ";".join(
                            f"{k}={v}" for k, v in
                            sorted(attr_re.findall(line)))
                        if not line.endswith("/>"):
                            doc["open"].append(
                                (name, len(doc["words"]), attrs))
                    continue
                if doc is None:
                    continue
                parts = line.split("\t")
                doc["punct"].append(
                    "" if (doc["glue"] or not doc["words"]) else " ")
                doc["glue"] = False
                doc["words"].append(parts[0])
                doc["pos"].append(parts[1] if len(parts) > 1 else "_")
                doc["lemma"].append(parts[2] if len(parts) > 2 else "_")
            flush(doc)
        n = len(rows["url"])
        cols = {
            "url": pa.array(rows["url"], pa.string()),
            "warc_ts": pa.nulls(n, pa.timestamp("us")),
            "html": pa.array([t.encode() for t in rows["text"]],
                             pa.binary()),
            "text": pa.array(rows["text"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
            "lemma": pa.array(rows["lemma"], pa.list_(pa.string())),
            "pos": pa.array(rows["pos"], pa.list_(pa.string())),
            "tags": pa.array(rows["tags"], TAG_SPANS_TYPE),
            "punct": pa.array(rows["punct"], pa.list_(pa.string())),
        }
        for m in meta_fields:
            if m != "lang":
                cols[f"meta_{m}"] = pa.array(meta[m], pa.string())
        return pa.table(cols)

    return ds.map_batches(to_pages, batch_format="pyarrow")


def _read_xml(paths, document_tag: str | None = None,
              text_tags: tuple[str, ...] | None = None,
              encoding: str = "utf-8", **opts) -> ray.data.Dataset:
    """Config-driven XML extraction (the DocIndexerXPath shape,
    indexers/config/DocIndexerXPath.java:53, simplified to ElementTree
    instead of full XPath): one document per file, or one per
    ``document_tag`` element (the documentPath config); text is the
    concatenated text of ``text_tags`` elements (valuePath), or the
    whole document's text when unset. Parsing runs inside map_batches
    tasks — one parser per batch, never on the driver."""
    import xml.etree.ElementTree as ET
    ds = ray.data.read_binary_files(paths, include_paths=True, **opts)

    def _text_of(el) -> str:
        if not text_tags:
            return " ".join(s.strip() for s in el.itertext() if s.strip())
        parts = []
        for tag in text_tags:
            for sub in el.iter(tag):
                parts.append(" ".join(s.strip() for s in sub.itertext()
                                      if s.strip()))
        return "\n".join(p for p in parts if p)

    def to_pages(batch: pa.Table) -> pa.Table:
        urls, texts, payloads = [], [], []
        for path, body in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            root = ET.fromstring(body.decode(encoding,
                                             errors="replace"))
            if document_tag:
                for i, el in enumerate(root.iter(document_tag)):
                    urls.append(f"{path}#{i}")
                    texts.append(_text_of(el))
                    payloads.append(ET.tostring(el))
            else:
                urls.append(path)
                texts.append(_text_of(root))
                payloads.append(body)
        n = len(urls)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.nulls(n, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.nulls(n, pa.string()),
        })

    return ds.map_batches(to_pages, batch_format="pyarrow")


register_format("webtext-html", _read_webtext)
register_format("webtext-text", _read_webtext)
register_format("plaintext", _read_plaintext)
register_format("tabular-tsv", _read_tabular)
register_format("tabular-csv",
                lambda paths, **o: _read_tabular(paths, delimiter=",",
                                                 **o))
def _read_chat(paths, encoding: str | None = None,
               **opts) -> ray.data.Dataset:
    """CHAT transcription files (DocIndexerChat.java:44): one doc per
    file with header metadata, cleaned utterances, and <u speaker=…/>
    standoff spans per utterance (stages/chat.py)."""
    from blacklab_ray.sources.files import decode_bytes
    from blacklab_ray.stages.chat import TAG_TYPE, chat_to_page
    ds = ray.data.read_binary_files(paths, include_paths=True, **opts)

    def to_pages(batch: pa.Table) -> pa.Table:
        rows = [chat_to_page(p, decode_bytes(b, encoding))
                for p, b in zip(batch.column("path").to_pylist(),
                                batch.column("bytes").to_pylist())]
        return pa.table({
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.nulls(len(rows), pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "tags": pa.array([r["tags"] for r in rows], TAG_TYPE),
        })

    return ds.map_batches(to_pages, batch_format="pyarrow")


register_format("xml", _read_xml)
register_format("chat", _read_chat)
register_format("sketch-wpl", _read_sketch_wpl)


def _read_warc(paths, **opts) -> ray.data.Dataset:
    from blacklab_ray.sources.warc import read_warc
    return read_warc(paths, **opts)


register_format("warc", _read_warc)      # raw crawl: html payloads
register_format("wet",                   # extracted text only
                lambda paths, **o: _read_warc(
                    paths, types=(), text_records=True, **o))
register_format("tei",
                lambda paths, **o: _read_xml(
                    paths, document_tag="TEI",
                    text_tags=("p",), **o))   # block-per-<p>, like
#                                               the webtext extractor


def _register_xml_configs() -> None:
    """Config-driven XML formats (DocIndexerXPath analogue): the
    shipped .blf.yaml shapes — TEI-with-<w>, FoLiA, Alto, PageXML,
    NAF — each compiling to a map_batches extraction
    (stages/xmlconfig.py)."""
    from blacklab_ray.stages.xmlconfig import (BUILTIN_CONFIGS,
                                               read_xml_config)
    for cname, cfg in BUILTIN_CONFIGS.items():
        register_format(
            cname,
            lambda paths, _cfg=cfg, **o: read_xml_config(paths, _cfg,
                                                         **o))


_register_xml_configs()
