"""QueryTool console analogue (tools/.../QueryTool.java) — session
commands, views, paging and the batch-mode output format."""
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def qt_index(ray_session, tmp_path_factory):
    from blacklab_ray.index import BuildParams, build_index
    root = tmp_path_factory.mktemp("qt")
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "url": ["d0", "d1", "d2"],
        "text": ["the quick fox jumps over the dog",
                 "a quick dog runs", "slow snail sleeps"],
        "lang": ["en", "en", "fr"],
    })
    src = root / "pages.parquet"
    pq.write_table(tbl, str(src))
    idx = str(root / "idx")
    build_index(str(src), idx,
                BuildParams(num_buckets=4, n_salts=2,
                            id_column="doc_id"))
    return idx


@pytest.fixture(scope="module")
def qt(qt_index):
    from blacklab_ray.query import IndexReader
    from blacklab_ray.querytool import QueryToolSession
    return QueryToolSession(IndexReader(qt_index))


def test_query_and_kwic_lines(qt):
    lines, was_query = qt.execute('"quick"')
    assert was_query
    assert lines[-1].startswith("2 hits in 2 documents")
    assert any("[quick]" in ln and ln.startswith("[d0]")
               for ln in lines)


def test_paging(qt):
    qt.execute('"the"')
    qt.execute("pagesize 1")
    first, _ = qt.execute("page 1")
    second, _ = qt.execute("next")
    assert first[0] != second[0]
    assert first[-1].endswith("(showing 1-1)")
    back, _ = qt.execute("prev")
    assert back[0] == first[0]


def test_group_and_enter_group(qt):
    qt.execute('[word="quick|slow"]')
    lines, _ = qt.execute("group word")
    assert any(ln.startswith("1. quick (2)") for ln in lines)
    lines, _ = qt.execute("group 1")
    assert lines[0] == "Viewing group: quick"
    assert lines[-1].startswith("2 hits")


def test_docs_view_and_sort(qt):
    qt.execute("pagesize 20")
    qt.execute('"the"')
    lines, _ = qt.execute("docs")
    assert lines[0] == "d0: 2 hits"
    qt.execute('"quick"')
    lines, _ = qt.execute("sort right")
    # right contexts: d1 'dog runs', d0 'fox jumps...' -> d1 first
    assert lines[0].startswith("[d1]")


def test_colloc_view(qt):
    qt.execute('"quick"')
    lines, _ = qt.execute("colloc")
    assert any(ln.startswith("the: 2") for ln in lines)


def test_filter_doc_snippet_struct(qt):
    qt.execute("filter lang:fr")
    lines, _ = qt.execute('"slow"')
    assert lines[-1].startswith("1 hits in 1 documents")
    qt.execute("filter")
    lines, _ = qt.execute("doc 2")
    assert lines[0].startswith("doc 2 (pid d2)")
    qt.execute('"fox"')
    lines, _ = qt.execute("snippet 1")
    assert "[fox]" in lines[0] and "the quick" in lines[0]
    lines, _ = qt.execute("struct")
    assert lines[1] == "documents: 3"
    lines, _ = qt.execute("sensitive on")
    assert "not supported" in lines[0]
    lines, _ = qt.execute("help")
    assert lines[0] == "Commands:"


def test_batch_mode_output(qt_index):
    from blacklab_ray.querytool import run_querytool
    out: list[str] = []
    cmds = ["# a comment", "pagesize 5", '"quick"',
            'context 2 && "the"', "exit", '"never-reached"']
    rc = run_querytool(qt_index, commands=cmds, out=out.append,
                       batch=True)
    assert rc == 0
    assert out[0] == "@pagesize 5"
    ms, n, echo = out[1].split("\t")
    assert float(ms) >= 0 and n == "2" and echo == '"quick"'
    ms, n, echo = out[2].split("\t")
    assert n == "2" and echo == 'context 2 && "the"'
    assert len(out) == 3  # comment silent, exit stops the session


def test_cli_batch_file(qt_index, tmp_path):
    import subprocess
    import sys
    f = tmp_path / "cmds.txt"
    f.write_text('"quick"\n"the"\n')
    r = subprocess.run(
        [sys.executable, "-m", "blacklab_ray.cli", "querytool",
         "--index", qt_index, "-f", str(f)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    rows = [ln for ln in r.stdout.splitlines() if "\t" in ln]
    assert len(rows) == 2
    assert rows[0].split("\t")[1] == "2"
    assert rows[1].split("\t")[1] == "2"


def test_group_after_sort_uses_fresh_keys(qt):
    """Review finding: sorting reorders the span table, so stale
    per-hit group keys must be invalidated — 'group N' after a sort
    must not mix groups."""
    qt.execute("pagesize 20")
    qt.execute('[word="quick|slow"]')
    qt.execute("group word")
    qt.execute("sort left")          # invalidates the grouping
    lines, _ = qt.execute("group 1")
    assert lines[0] == "Group number out of range."
    lines, _ = qt.execute("group word")
    lines, _ = qt.execute("group 1")
    assert lines[0] == "Viewing group: quick"
    # every hit in the entered group really is 'quick'
    assert all("[quick]" in ln for ln in lines[1:-1])
