"""File walking: archives (zip / tar.gz) + charset detection.

The reference's FileProcessor walks directories, descends into zip and
tar.gz archives, and sniffs charsets (BOM first, then heuristics) before
dispatching each file to a DocIndexer (util/FileProcessor.java:31;
IndexerImpl.java:63-96). Ray-native shape:

- ``read_files``: ``ray.data.read_binary_files`` over the listed paths;
  archive members are EXPANDED INSIDE map_batches tasks (flat_map shape
  — one archive row fans out to one row per member), so archive bytes
  never transit the driver and big archives parallelize per archive.
- ``detect_charset`` / ``decode_bytes``: BOM detection (UTF-8/16/32)
  with UTF-8-then-Latin-1 fallback — the same precedence the reference
  gets from BOM + universalchardet, minus the statistical detector
  (not available in this environment; documented).

Member naming: ``<archive path>!<member name>`` (the reference's
pathInsideArchive convention).
"""

from __future__ import annotations

import io
import os
import tarfile
import zipfile

import pyarrow as pa
import ray.data

_ARCHIVE_EXTS = (".zip", ".tar", ".tar.gz", ".tgz", ".tar.bz2")

# BOM-stripping codec names: 'utf-16'/'utf-32' consume the BOM on
# decode (the -le/-be variants would keep it as a ﻿ prefix)
_BOMS = [
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe\x00\x00", "utf-32"),
    (b"\x00\x00\xfe\xff", "utf-32"),
    (b"\xff\xfe", "utf-16"),
    (b"\xfe\xff", "utf-16"),
]


def is_archive(path: str) -> bool:
    low = path.lower()
    return any(low.endswith(e) for e in _ARCHIVE_EXTS)


def detect_charset(data: bytes, default: str = "utf-8") -> str:
    """BOM first (IndexerImpl.java:63-71 precedence), else try the
    default (utf-8), else latin-1 (which never fails)."""
    for bom, enc in _BOMS:
        if data.startswith(bom):
            return enc
    try:
        data.decode(default)
        return default
    except UnicodeDecodeError:
        return "latin-1"


def decode_bytes(data: bytes, encoding: str | None = None) -> str:
    enc = encoding or detect_charset(data)
    return data.decode(enc, errors="replace")


def expand_archive(path: str, data: bytes,
                   suffixes: tuple[str, ...] | None = None) -> list:
    """Archive bytes → [(member_path, member_bytes), ...]; non-archives
    pass through as themselves."""
    if not is_archive(path):
        return [(path, data)]
    out = []
    low = path.lower()
    if low.endswith(".zip"):
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            for info in zf.infolist():
                if info.is_dir():
                    continue
                if suffixes and not info.filename.lower().endswith(
                        tuple(suffixes)):
                    continue
                out.append((f"{path}!{info.filename}",
                            zf.read(info)))
    else:
        with tarfile.open(fileobj=io.BytesIO(data)) as tf:
            for member in tf.getmembers():
                if not member.isfile():
                    continue
                if suffixes and not member.name.lower().endswith(
                        tuple(suffixes)):
                    continue
                f = tf.extractfile(member)
                if f is not None:
                    out.append((f"{path}!{member.name}", f.read()))
    return sorted(out)


def read_files(paths, suffixes: tuple[str, ...] | None = None,
               decode: bool = True,
               encoding: str | None = None, **opts) -> ray.data.Dataset:
    """Walk files + archives → Dataset(path, bytes[, text]).

    ``suffixes`` filters archive MEMBERS (e.g. ('.txt', '.xml'));
    ``decode=True`` adds a charset-detected ``text`` column.
    """
    ds = ray.data.read_binary_files(paths, include_paths=True, **opts)

    def _expand(batch: pa.Table) -> pa.Table:
        out_paths: list[str] = []
        out_bytes: list[bytes] = []
        for p, b in zip(batch.column("path").to_pylist(),
                        batch.column("bytes").to_pylist()):
            for mp, mb in expand_archive(p, b, suffixes):
                out_paths.append(mp)
                out_bytes.append(mb)
        cols = {
            "path": pa.array(out_paths, pa.string()),
            "bytes": pa.array(out_bytes, pa.binary()),
        }
        if decode:
            cols["text"] = pa.array(
                [decode_bytes(b, encoding) for b in out_bytes],
                pa.string())
        return pa.table(cols)

    return ds.map_batches(_expand, batch_format="pyarrow")


def walk_paths(root: str, suffixes: tuple[str, ...] | None = None
               ) -> list[str]:
    """Deterministic recursive listing (sorted) of files under root,
    optionally filtered by suffix; archives are included as themselves
    (their members expand at read time)."""
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames.sort()
        for f in sorted(filenames):
            p = os.path.join(dirpath, f)
            if suffixes and not (f.lower().endswith(tuple(suffixes))
                                 or is_archive(f)):
                continue
            out.append(p)
    return out
