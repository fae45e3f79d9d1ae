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
