"""CHAT format parsing + archive walking / charset detection."""

import io
import tarfile
import zipfile

import pytest

CHAT_SAMPLE = """@UTF8
@Begin
@Languages:\tnld
@Participants:\tCHI Target_Child, MOT Mother
@Age of CHI:\t3;6.14
*CHI:\thello world
*MOT:\twhat did you <say there> [x 2] today ?
%mor:\tpro|what v|do&PAST pro|you
*CHI:\tthis line continues
\tonto the next one (.) yes
@End
"""


def test_parse_chat_metadata():
    from blacklab_ray.stages.chat import parse_chat
    p = parse_chat(CHAT_SAMPLE)
    assert p["metadata"]["languages"] == "nld"
    assert p["metadata"]["age_of_chi"] == "3;6.14"
    assert p["metadata"]["age_of_chi_months"] == 42
    assert "begin" in p["metadata"]["markers"]


def test_parse_chat_utterances_and_tiers():
    from blacklab_ray.stages.chat import parse_chat
    p = parse_chat(CHAT_SAMPLE)
    utts = p["utterances"]
    assert [u["speaker"] for u in utts] == ["CHI", "MOT", "CHI"]
    assert utts[0]["text"] == "hello world"
    # scoped [x 2] keeps the <...> content; pause (.) dropped
    assert utts[1]["text"] == "what did you say there today ?"
    assert utts[1]["tiers"]["mor"].startswith("pro|what")
    # tab continuation joined
    assert utts[2]["text"] == "this line continues onto the next one yes"


def test_age_to_months_variants():
    from blacklab_ray.stages.chat import age_to_months
    assert age_to_months("3;6.14") == 42
    assert age_to_months("2") == 24
    assert age_to_months("1;11") == 23
    assert age_to_months("abc") is None


def test_chat_to_page_spans_align():
    from blacklab_ray.analysis.analyzers import tokenize_text
    from blacklab_ray.stages.chat import chat_to_page
    row = chat_to_page("f.cha", CHAT_SAMPLE)
    toks = tokenize_text(row["text"])
    # spans tile the token stream
    assert row["tags"][0]["start"] == 0
    assert row["tags"][-1]["end"] == len(toks)
    assert "speaker=CHI" in row["tags"][0]["attrs"]


def test_chat_format_index_and_query(ray_session, tmp_path):
    import pyarrow as pa  # noqa: F401
    from blacklab_ray.formats import read_pages
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader, search_taat
    d = tmp_path / "chat"
    d.mkdir()
    (d / "one.cha").write_text(CHAT_SAMPLE)
    ds = read_pages("chat", [str(d / "one.cha")])
    idx = str(tmp_path / "idx")
    build_index(ds, idx, BuildParams(num_buckets=2, n_salts=1))
    r = IndexReader(idx)
    t = search_taat(r, ["hello"], k=10)
    assert t.num_rows == 1
    # utterance spans queryable with attribute filter
    u = r.tag_spans("u", {"speaker": "MOT"})
    assert u.num_rows == 1


# ---- archives + charset ---------------------------------------------------

def test_detect_charset_boms():
    from blacklab_ray.sources.files import decode_bytes, detect_charset
    assert detect_charset(b"\xef\xbb\xbfhi") == "utf-8-sig"
    assert detect_charset("\u2603".encode("utf-16")) == "utf-16"
    assert detect_charset("héllo".encode("utf-8")) == "utf-8"
    assert detect_charset("héllo".encode("latin-1")) == "latin-1"
    assert decode_bytes("héllo".encode("latin-1")) == "héllo"
    assert decode_bytes("☃".encode("utf-16")) == "☃"


def test_expand_zip_and_tar(tmp_path):
    from blacklab_ray.sources.files import expand_archive
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("a.txt", "alpha")
        zf.writestr("sub/b.txt", "beta")
        zf.writestr("skip.bin", "nope")
    members = expand_archive("x.zip", zbuf.getvalue(),
                             suffixes=(".txt",))
    assert [(m, b.decode()) for m, b in members] == [
        ("x.zip!a.txt", "alpha"), ("x.zip!sub/b.txt", "beta")]
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w:gz") as tf:
        data = b"gamma"
        info = tarfile.TarInfo("c.txt")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    members = expand_archive("y.tar.gz", tbuf.getvalue())
    assert members == [("y.tar.gz!c.txt", b"gamma")]
    # non-archives pass through
    assert expand_archive("plain.txt", b"zz") == [("plain.txt", b"zz")]


def test_read_files_dataset(ray_session, tmp_path):
    from blacklab_ray.sources.files import read_files, walk_paths
    d = tmp_path / "in"
    d.mkdir()
    (d / "doc1.txt").write_text("one")
    with zipfile.ZipFile(d / "arch.zip", "w") as zf:
        zf.writestr("doc2.txt", "two")
        zf.writestr("doc3.txt", "thrée".encode("latin-1"))
    paths = walk_paths(str(d), suffixes=(".txt",))
    assert len(paths) == 2   # the .txt + the archive
    rows = {r["path"]: r for r in
            read_files(paths, suffixes=(".txt",)).take_all()}
    assert len(rows) == 3
    assert rows[str(d / "doc1.txt")]["text"] == "one"
    assert rows[f"{d}/arch.zip!doc3.txt"]["text"] == "thrée"
