"""Typed metadata fields (TOKENIZED/NUMERIC/UNTOKENIZED) and the typed
doc-filter path (FieldType.java:5-7, SpanQueryFiltered semantics)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _corpus():
    return pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "url": ["u0", "u1", "u2", "u3"],
        "text": ["alpha beta", "alpha gamma delta", "beta", "alpha"],
        "lang": ["en", "en", "fr", "en"],
        "title": ["The Quick Fox", "Ein schneller Fuchs",
                  "Le renard rapide", "Fox again"],
        "year": pa.array([1999, 2005, 2005, 2021], pa.int64()),
    })


@pytest.fixture(scope="module")
def meta_index(ray_session, tmp_path_factory):
    from blacklab_ray.index import BuildParams, build_index
    root = tmp_path_factory.mktemp("meta")
    src = root / "pages.parquet"
    pq.write_table(_corpus(), str(src))
    idx = str(root / "idx")
    build_index(str(src), idx,
                BuildParams(num_buckets=4, n_salts=2,
                            id_column="doc_id",
                            metadata_fields=(("title", "tokenized"),
                                             ("year", "numeric"))))
    return idx


@pytest.fixture(scope="module")
def meta_reader(meta_index):
    from blacklab_ray.query import IndexReader
    return IndexReader(meta_index)


def test_declared_types_in_meta(meta_reader):
    from blacklab_ray.query.metafilter import metadata_field_types
    t = metadata_field_types(meta_reader)
    assert t["title"] == "tokenized"
    assert t["year"] == "numeric"
    assert t["lang"] == "untokenized"
    assert t["doc_len"] == "numeric"


def test_numeric_range(meta_reader):
    from blacklab_ray.query.metafilter import filter_docs_meta
    ids = filter_docs_meta(meta_reader, [("year", "range", (2000, 2010))])
    assert ids.tolist() == [1, 2]
    ids = filter_docs_meta(meta_reader, [("year", "=", 2021)])
    assert ids.tolist() == [3]


def test_untokenized_exact(meta_reader):
    from blacklab_ray.query.metafilter import filter_docs_meta
    ids = filter_docs_meta(meta_reader, [("lang", "=", "en")])
    assert ids.tolist() == [0, 1, 3]
    ids = filter_docs_meta(meta_reader, [("lang", "in", ["fr", "de"])])
    assert ids.tolist() == [2]


def test_tokenized_contains_analyzed(meta_reader):
    from blacklab_ray.query.metafilter import filter_docs_meta
    # analyzed: lowercase — 'Fox'/'fox' both match token 'fox'
    ids = filter_docs_meta(meta_reader, [("title", "contains", "fox")])
    assert ids.tolist() == [0, 3]
    # any-of across docs
    ids = filter_docs_meta(meta_reader,
                           [("title", "in", ["renard", "fuchs"])])
    assert ids.tolist() == [1, 2]


def test_conjunction_mixed_types(meta_reader):
    from blacklab_ray.query.metafilter import filter_docs_meta
    ids = filter_docs_meta(meta_reader, [
        ("lang", "=", "en"),
        ("year", "range", (1990, 2010)),
        ("title", "contains", "fox"),
    ])
    assert ids.tolist() == [0]


def test_doc_len_builtin_numeric(meta_reader):
    from blacklab_ray.query.metafilter import filter_docs_meta
    ids = filter_docs_meta(meta_reader, [("doc_len", "range", (2, 3))])
    assert ids.tolist() == [0, 1]


def test_wrong_op_for_type_raises(meta_reader):
    from blacklab_ray.query.metafilter import (
        FieldTypeError, filter_docs_meta,
    )
    with pytest.raises(FieldTypeError):
        filter_docs_meta(meta_reader, [("year", "contains", "200")])
    with pytest.raises(FieldTypeError):
        filter_docs_meta(meta_reader, [("title", "range", (0, 1))])
    with pytest.raises(FieldTypeError):
        filter_docs_meta(meta_reader, [("title", "=", "The Quick Fox")])
    with pytest.raises(KeyError):
        filter_docs_meta(meta_reader, [("nope", "=", 1)])


def test_filtered_search_via_typed_filter(meta_reader):
    from blacklab_ray.query.engine import search_filtered
    from blacklab_ray.query.metafilter import filter_docs_meta
    allowed = filter_docs_meta(meta_reader, [("year", "range",
                                              (1990, 2010))])
    t = search_filtered(meta_reader, ["alpha"], allowed, k=10)
    assert sorted(t["doc_id"].to_pylist()) == [0, 1]


def test_bad_type_declaration_raises():
    from blacklab_ray.index import BuildParams, build_index
    with pytest.raises(ValueError, match="unknown metadata field types"):
        build_index("/nonexistent", "/tmp/never2",
                    BuildParams(metadata_fields=(("x", "integer"),)))


def test_filter_expr_boolean_tree(meta_reader):
    """Lucene-QL filter expressions (LuceneUtil.parseLuceneQuery
    analogue): AND/OR/NOT, parens, precedence NOT > AND > OR."""
    from blacklab_ray.query.metafilter import (eval_filter_expr,
                                               parse_filter_expr)

    def ids(expr):
        return eval_filter_expr(
            meta_reader, parse_filter_expr(expr)).tolist()

    assert ids("lang:en AND year:2005") == [1]
    assert ids("lang:fr OR year:2021") == [2, 3]
    assert ids("lang:en AND NOT year:2005") == [0, 3]
    assert ids("NOT lang:en") == [2]
    assert ids("(lang:fr OR year:1999) AND year:[1990 TO 2010]") \
        == [0, 2]
    assert ids("lang:en && !year:2021") == [0, 1]
    assert ids("lang:en OR lang:fr AND year:2005") == [0, 1, 2, 3]


def test_filter_expr_wildcards_and_phrase(meta_reader):
    from blacklab_ray.query.metafilter import (eval_filter_expr,
                                               parse_filter_expr)

    def ids(expr):
        return eval_filter_expr(
            meta_reader, parse_filter_expr(expr)).tolist()

    # untokenized wildcard: full raw value, case-sensitive
    assert ids("url:u*") == [0, 1, 2, 3]
    assert ids("url:u?") == [0, 1, 2, 3]
    assert ids("url:v*") == []
    # tokenized wildcard: any analyzed (lowercased) token
    assert ids("title:Fu*") == [1]
    assert ids("title:f?x") == [0, 3]
    # tokenized quoted phrase: analyzed-token adjacency
    assert ids('title:"quick fox"') == [0]
    assert ids('title:"fox quick"') == []
    assert ids('title:"the quick fox"') == [0]


def test_filter_expr_errors(meta_reader):
    from blacklab_ray.query.metafilter import (FieldTypeError,
                                               eval_filter_expr,
                                               parse_filter_expr)
    with pytest.raises(ValueError, match="missing AND/OR"):
        parse_filter_expr("lang:en year:2005")
    with pytest.raises(ValueError, match="unbalanced"):
        parse_filter_expr("(lang:en OR lang:fr")
    with pytest.raises(KeyError, match="unknown metadata field"):
        eval_filter_expr(meta_reader, parse_filter_expr("nope:x"))
    with pytest.raises(FieldTypeError, match="non-numeric"):
        eval_filter_expr(meta_reader, parse_filter_expr("year:abc"))


def test_filter_expr_analyzed_query_terms(meta_reader):
    """Lucene's parser analyzes query terms: capitalized/accented
    terms and punctuated phrases match the analyzed tokens."""
    from blacklab_ray.query.metafilter import (eval_filter_expr,
                                               parse_filter_expr)

    def ids(expr):
        return eval_filter_expr(
            meta_reader, parse_filter_expr(expr)).tolist()

    assert ids("title:Fox") == ids("title:fox") == [0, 3]
    assert ids('title:"Quick FOX"') == [0]
    # a single term that analyzes to several tokens is an adjacency
    # match
    assert ids("title:quick-fox") == [0]
    # string TermRangeQuery on an untokenized field
    assert ids("url:[u0 TO u1]") == [0, 1]
    assert ids("lang:[en TO eo]") == [0, 1, 3]


def test_filter_expr_typed_errors(meta_reader):
    from blacklab_ray.query.metafilter import (FieldTypeError,
                                               eval_filter_expr,
                                               parse_filter_expr)
    for expr in ("year:[a TO b]", 'year:"abc"'):
        with pytest.raises(FieldTypeError, match="year"):
            eval_filter_expr(meta_reader, parse_filter_expr(expr))


def test_filter_expr_single_scan_tree(meta_reader, monkeypatch):
    """OR/NOT trees evaluate in ONE pruned scan (per-batch boolean
    masks), not one scan per leaf plus set algebra."""
    import blacklab_ray.query.metafilter as mf
    calls = []
    real = mf.pa_ds.dataset

    def spy(*a, **k):
        calls.append(a)
        return real(*a, **k)
    monkeypatch.setattr(mf.pa_ds, "dataset", spy)
    ids = mf.eval_filter_expr(
        meta_reader, mf.parse_filter_expr(
            "(lang:en OR title:fox) AND NOT year:2021"))
    assert ids.tolist() == [0, 1]
    assert len(calls) == 1, f"expected 1 scan, saw {len(calls)}"
    # tombstone masking still applies on the NOT path
    ids = mf.eval_filter_expr(
        meta_reader, mf.parse_filter_expr("NOT lang:xx"))
    assert ids.tolist() == [0, 1, 2, 3]
