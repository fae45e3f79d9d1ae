"""Input-format registry: plaintext + tabular readers produce the
canonical pages schema and index identically to equivalent text."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from blacklab_ray.formats import formats, read_pages, register_format


TEXTS = {
    "docs/a.txt": "the quick brown fox jumps over the lazy dog",
    "docs/b.txt": "pack my box with five dozen liquor jugs",
    "docs/c.txt": "the five boxing wizards jump quickly",
}


@pytest.fixture()
def plaintext_dir(tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    for name, text in TEXTS.items():
        (tmp_path / name).write_text(text)
    return str(d)


def test_registry_lists_builtins():
    assert {"webtext-html", "webtext-text", "plaintext",
            "tabular-tsv", "tabular-csv"} <= set(formats())
    with pytest.raises(ValueError, match="unknown input format"):
        read_pages("no-such-format", [])


def test_plaintext_reader(ray_session, plaintext_dir):
    ds = read_pages("plaintext", plaintext_dir)
    rows = {os.path.basename(r["url"]): r for r in ds.take_all()}
    assert set(rows) == {"a.txt", "b.txt", "c.txt"}
    assert rows["a.txt"]["text"] == TEXTS["docs/a.txt"]
    assert rows["b.txt"]["html"] == TEXTS["docs/b.txt"].encode()


def test_tabular_reader_matches_plaintext_index(ray_session, tmp_path,
                                                plaintext_dir):
    """A word-per-line TSV of the same corpus indexes to identical
    term statistics (DocIndexerTabular vs DocIndexerPlainText parity)."""
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader, search_taat

    # build from plaintext
    idx_p = str(tmp_path / "idx_p")
    build_index(read_pages("plaintext", plaintext_dir), idx_p,
                BuildParams(num_buckets=2, n_salts=1))

    # the same docs as (url, pos, word) TSV — urls must match the
    # plaintext paths so doc ids coincide
    lines = ["url\tpos\tword"]
    for name, text in TEXTS.items():
        url = os.path.join(str(tmp_path), name)
        for i, w in enumerate(text.split()):
            lines.append(f"{url}\t{i}\t{w}")
    tsv = tmp_path / "corpus.tsv"
    tsv.write_text("\n".join(lines) + "\n")
    idx_t = str(tmp_path / "idx_t")
    build_index(read_pages("tabular-tsv", str(tsv)), idx_t,
                BuildParams(num_buckets=2, n_salts=1))

    rp, rt = IndexReader(idx_p), IndexReader(idx_t)
    tp = rp.terms_table.sort_by("term").to_pylist()
    tt = rt.terms_table.sort_by("term").to_pylist()
    assert tp == tt
    a = search_taat(rp, ["the", "five"], k=10)
    b = search_taat(rt, ["the", "five"], k=10)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()


def test_tabular_csv_and_custom_format(ray_session, tmp_path):
    csv = tmp_path / "c.csv"
    csv.write_text("url,pos,word\nd1,0,hello\nd1,1,world\nd2,0,bye\n")
    ds = read_pages("tabular-csv", str(csv))
    rows = {r["url"]: r["text"] for r in ds.take_all()}
    assert rows == {"d1": "hello world", "d2": "bye"}
    # extension slot: registering a custom format makes it resolvable
    register_format("null-format", lambda paths, **o: None)
    assert "null-format" in formats()
