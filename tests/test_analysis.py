import numpy as np
import pyarrow as pa

from blacklab_ray.analysis import (
    normalize_text, tokenize_column, tokenize_text,
)


def test_normalization_cases():
    # lowercase + accent strip (reference semantics: DesensitizeFilter)
    assert normalize_text("Thé") == "the"
    assert normalize_text("naïve") == "naive"
    assert normalize_text("FOX") == "fox"
    assert normalize_text("Ångström") == "angstrom"


def test_tokenize_scalar():
    assert tokenize_text("The quick  Brown FOX!") == [
        "the", "quick", "brown", "fox"]
    assert tokenize_text("a.b,c") == ["a", "b", "c"]
    assert tokenize_text("") == []
    assert tokenize_text("   ") == []
    assert tokenize_text("x2 3y") == ["x2", "3y"]


def test_tokenize_column_matches_scalar():
    texts = ["The quick  Brown FOX!", "Thé naïve, fox2 ", "", "a",
             "  ", "ångström Ångström", "x" * 2000, "end."]
    parents, toks, positions, lens = tokenize_column(pa.array(texts))
    ref = [tokenize_text(t) for t in texts]
    assert toks.to_pylist() == [t for r in ref for t in r]
    assert lens.tolist() == [len(r) for r in ref]
    assert positions.tolist() == [i for r in ref for i in range(len(r))]
    assert parents.tolist() == [i for i, r in enumerate(ref)
                                for _ in r]


def test_token_length_clamp():
    long = "x" * 5000
    assert tokenize_text(long) == ["x" * 1000]
    _, toks, _, _ = tokenize_column(pa.array([long]))
    assert toks.to_pylist() == ["x" * 1000]


def test_analyzer_registry():
    import numpy as np
    import pyarrow as pa

    from blacklab_ray.analysis.analyzers import (
        get_analyzer, register_analyzer,
    )
    col = pa.array(["Don't STOP", "  a\tb ", "", None], pa.string())
    p, t, pos, lens = get_analyzer("whitespace")(col)
    assert t.to_pylist() == ["Don't", "STOP", "a", "b"]
    assert lens.tolist() == [2, 2, 0, 0]
    p, t, pos, lens = get_analyzer("nontokenizing")(col)
    assert t.to_pylist() == ["Don't STOP", "  a\tb "]
    assert lens.tolist() == [1, 1, 0, 0]
    assert pos.tolist() == [0, 0]
    std = get_analyzer("standard")
    _, t, _, _ = std(pa.array(["Don't STOP"]))
    assert t.to_pylist() == ["don", "t", "stop"]
    import pytest as _pt
    with _pt.raises(ValueError, match="unknown analyzer"):
        get_analyzer("nope")
    register_analyzer("custom", std)
    assert get_analyzer("custom") is std


def test_whitespace_analyzer_build(ray_session, tmp_path):
    """An index built with the whitespace analyzer preserves case and
    punctuation as token content."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader, search_taat
    pages = pa.table({
        "url": pa.array(["u1", "u2"], pa.string()),
        "warc_ts": pa.array([0, 0], pa.timestamp("us")),
        "html": pa.array([b"", b""], pa.binary()),
        "text": pa.array(["Don't STOP now", "don't stop Now"],
                         pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
    })
    src = tmp_path / "p"
    src.mkdir()
    pq.write_table(pages, str(src / "x.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx,
                BuildParams(num_buckets=2, n_salts=1,
                            analyzer="whitespace"))
    r = IndexReader(idx)
    terms = set(r.terms_table["term"].to_pylist())
    assert {"Don't", "don't", "STOP", "stop", "Now", "now"} <= terms
    from blacklab_ray.stages.tokenize import hash64
    res = search_taat(r, ["Don't"], k=5)
    assert res["doc_id"].to_pylist() == [hash64("u1")]


def test_linked_metadata_join(ray_session):
    import pyarrow as pa
    import ray.data

    from blacklab_ray.stages.linked import join_linked_metadata
    pages = pa.table({
        "url": pa.array(["a", "b", "c"], pa.string()),
        "text": pa.array(["x", "y", "z"], pa.string()),
    })
    side = pa.table({
        "url": pa.array(["b", "a"], pa.string()),
        "collection": pa.array(["news", "web"], pa.string()),
    })
    out = join_linked_metadata(ray.data.from_arrow(pages), side) \
        .take_all()
    assert [r["url"] for r in out] == ["a", "b", "c"]   # order kept
    assert [r["collection"] for r in out] == ["web", "news", None]
    import pytest as _pt
    dup = pa.table({"url": pa.array(["a", "a"]),
                    "collection": pa.array(["1", "2"])})
    with _pt.raises(ValueError, match="duplicate"):
        join_linked_metadata(ray.data.from_arrow(pages), dup)


class TestDutchAnalyzer:
    """Mirrors the reference's TestBLDutchTokenizer/TokenFilter cases
    (BLDutchTokenizer.java:15, BLDutchTokenFilter.java:17), plus the
    desensitize step of BLDutchAnalyzer.java:19."""

    CASES = [
        ("hond, a.u.b. bél(len)! [pre]cursor zo'n 'Hij zij' ex-man -",
         ["hond", "aub", "bellen", "precursor", "zo'n", "hij", "zij",
          "ex-man"]),
        ("''quote'' 'n beetje", ["'quote'", "n", "beetje"]),
        ("multi- én 100%", ["multi-", "en", "100"]),
        ("", []),
        ("...', -", []),                  # no letters/digits → dropped
    ]

    def test_scalar_matches_reference_cases(self):
        from blacklab_ray.analysis.analyzers import tokenize_text_dutch
        for s, exp in self.CASES:
            assert tokenize_text_dutch(s) == exp, s

    def test_vectorized_matches_scalar(self):
        import pyarrow as pa

        from blacklab_ray.analysis.analyzers import (
            tokenize_column_dutch, tokenize_text_dutch)
        texts = [s for s, _ in self.CASES] + \
            ["zo'n 's-Gravenhage, (pre)cursor a.u.b."]
        parents, flat, pos, lens = tokenize_column_dutch(
            pa.array(texts, pa.string()))
        toks = flat.to_pylist()
        off = 0
        for i, t in enumerate(texts):
            exp = tokenize_text_dutch(t)
            assert toks[off:off + len(exp)] == exp, t
            assert lens[i] == len(exp)
            off += len(exp)
        assert pos.tolist() == [p for n in lens
                                for p in range(n)]

    def test_registered_and_buildable(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blacklab_ray.analysis.analyzers import get_analyzer
        from blacklab_ray.index import BuildParams, build_index
        from blacklab_ray.query import IndexReader
        from blacklab_ray.query.cql import cql_spans
        assert get_analyzer("dutch") is not None
        pages = pa.table({
            "url": pa.array(["d0"], pa.string()),
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([b""], pa.binary()),
            "text": pa.array(["Bel(len) a.u.b. zo'n ex-man!"],
                             pa.string()),
            "lang": pa.array(["nl"], pa.string()),
        })
        src = tmp_path / "p"
        src.mkdir()
        pq.write_table(pages, str(src / "x.parquet"))
        idx = str(tmp_path / "idx")
        build_index(str(src), idx,
                    BuildParams(num_buckets=2, n_salts=1,
                                analyzer="dutch"))
        r = IndexReader(idx)
        assert cql_spans(r, '"bellen"').num_rows == 1
        assert cql_spans(r, '"aub" "zo\'n"').num_rows == 1
        assert cql_spans(r, '"ex-man"').num_rows == 1
