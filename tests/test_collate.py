"""Collated term ordering tests, mirroring the reference's TestTerms
(insensitive/sensitive sort orders; Terms.java:69-95,
TermsIntegrated.java:145-215)."""
import numpy as np
import pyarrow as pa

from blacklab_ray.analysis.collate import (collation_key,
                                           collation_key_column,
                                           key_for_context, sort_terms,
                                           term_sort_ranks)

# deliberately scattered by codepoint: uppercase, accents, non-ASCII
TERMS = ["zee", "Aap", "aap", "noot", "mies", "cafe", "café", "Cafe",
         "CAFE", "éclair", "eclair", "Able", "über", "uber"]


def test_insensitive_order_groups_fold_equal_terms():
    out = sort_terms(TERMS, sensitive=False)
    # primary (fold) order is alphabetic regardless of case/accents
    folded = [collation_key(t, sensitive=False) for t in out]
    assert folded == sorted(folded)
    # all café variants adjacent; "Aap"/"aap" adjacent; über next to uber
    pos = {t: i for i, t in enumerate(out)}
    cafes = sorted(pos[t] for t in ("cafe", "café", "Cafe", "CAFE"))
    assert cafes == list(range(cafes[0], cafes[0] + 4))
    assert abs(pos["Aap"] - pos["aap"]) == 1
    assert abs(pos["über"] - pos["uber"]) == 1
    # a codepoint sort would put "CAFE" before "aap" and "über" last —
    # the collation must not
    assert pos["CAFE"] > pos["aap"]
    assert out[-1] == "zee"


def test_sensitive_order_levels():
    # same primary → secondary (accents) then tertiary (case) decide
    out = sort_terms(["café", "cafe", "Cafe", "CAFE"], sensitive=True)
    assert out[0] in ("cafe", "CAFE", "Cafe")   # unaccented first
    assert out[-1] == "café"                     # accented last
    keys = [collation_key(t, sensitive=True) for t in out]
    assert keys == sorted(keys)
    assert len(set(keys)) == 4                   # sensitive keys unique


def test_insensitive_ranks_shared():
    ranks = term_sort_ranks(TERMS, sensitive=False)
    by_term = dict(zip(TERMS, ranks))
    # fold-equal terms SHARE a rank (termsEqual INSENSITIVE contract)
    assert by_term["cafe"] == by_term["café"] == by_term["Cafe"] \
        == by_term["CAFE"]
    assert by_term["Aap"] == by_term["aap"]
    assert by_term["aap"] < by_term["cafe"] < by_term["zee"]
    # sensitive ranks are unique
    sranks = term_sort_ranks(TERMS, sensitive=True)
    assert len(set(sranks.tolist())) == len(TERMS)


def test_context_key_equals_wordwise_rank_comparison():
    ctxs = ["aap noot", "aap", "aapje", "café zee", "cafe zee", ""]
    keys = {c: key_for_context(c) for c in ctxs}
    # empty < prefix < longer-first-word (the rank-array comparison)
    assert keys[""] < keys["aap"] < keys["aap noot"]
    assert keys["aap noot"] < keys["aapje"]      # 'aap'<'aapje' wordwise
    assert keys["cafe zee"] < keys["café zee"]   # accent at level 2
    col = collation_key_column(pa.array(ctxs, pa.string()), context=True)
    assert col.to_pylist() == [keys[c].hex() for c in ctxs]


def test_reader_sorted_terms_and_ranks(small_index):
    from blacklab_ray.query import IndexReader
    r = IndexReader(small_index)
    st = r.sorted_terms("i")
    assert len(st) == r.terms_table.num_rows
    ks = [collation_key(t, sensitive=False) for t in st]
    assert ks == sorted(ks)
    ranks = r.term_sort_ranks("i")
    assert ranks.size == r.terms_table.num_rows
    # ranks reproduce the collated order of the terms table
    terms = r.terms_table["term"].to_pylist()
    order = np.argsort(ranks, kind="stable")
    primaries = [collation_key(terms[i], sensitive=False) for i in order]
    assert primaries == sorted(primaries)


def test_value_sort_v2_reference_list():
    """TestValueSort.testValueSortV2 (wslib): the default V2
    insensitive collator's exact order — punctuation before digits
    before letters, ' ' < '-' < '_', ICU punct order ('?' < '.'
    < '('), case ties lowercase-first."""
    from blacklab_ray.analysis.collate import sort_terms
    lst = ["a-", "-b", "a", "AA-", "aa", "AA", "cool_stuff",
           "cool stuff", "cool-stuff", "help?", "help.", "help",
           "(h)elp", ".", "a-", "b", "tes(t)ed", "test", "tested",
           ""]
    assert sort_terms(lst, sensitive=False) == [
        "", "-b", ".", "(h)elp", "a", "a-", "a-", "aa", "AA", "AA-",
        "b", "cool stuff", "cool-stuff", "cool_stuff", "help",
        "help?", "help.", "tes(t)ed", "test", "tested"]


def test_collators_ignorable_chars():
    """TestCollators (engine): the insensitive fold REMOVES soft
    hyphen (U+00AD) and em space (U+2003) but keeps ' ', tab, LF, CR
    as real characters (StringUtil.PATT_DIACRITICAL_MARKS)."""
    from blacklab_ray.analysis.analyzers import (desensitize_term,
                                                 tokenize_text)
    from blacklab_ray.analysis.collate import collation_key
    for c in ("­", " "):
        assert desensitize_term(f"{c}te{c}st{c}") == "test"
        assert collation_key(f"{c}te{c}st{c}", sensitive=False) == \
            collation_key("test", sensitive=False)
    for c in (" ", "\t", "\n", "\r"):
        assert desensitize_term(f"{c}te{c}st{c}") != "test"
        assert collation_key(f"te{c}st", sensitive=False) != \
            collation_key("test", sensitive=False)
    # TEXT-level: the em space is a token SEPARATOR (deleting it
    # pre-tokenization would merge adjacent words — the reference
    # strips per token, after its tokenizer already split); the soft
    # hyphen is a format char in the tokenizer too (one token)
    assert tokenize_text("foo bar") == ["foo", "bar"]
    assert tokenize_text("foo­bar") == ["foobar"]


def test_strip_accents_l_stroke():
    """StringUtil.convertRemainingAccentCharacters: Ł/ł →  L/l."""
    from blacklab_ray.analysis.analyzers import normalize_text
    assert normalize_text("Łódź") == "lodz"


def test_strip_accents_reference_case():
    """TestStringUtil.testRemoveAccents: 'Hé, jij!' → 'He, jij!'."""
    from blacklab_ray.analysis.analyzers import strip_accents
    assert strip_accents("Hé, jij!") == "He, jij!"


def test_value_sort_v1_reference_list():
    """TestValueSort.testValueSortV1: the legacy dash/space-ignoring
    PRIMARY order, ties input-stable."""
    from blacklab_ray.analysis.collate import sort_terms_v1
    lst = ["a-", "-b", "a", "AA-", "aa", "AA", "cool_stuff",
           "cool stuff", "cool-stuff", "help?", "help.", "help",
           "(h)elp", ".", "a-", "b", "tes(t)ed", "test", "tested",
           ""]
    assert sort_terms_v1(lst) == [
        "", ".", "(h)elp", "a-", "a", "a-", "AA-", "aa", "AA", "-b",
        "b", "cool_stuff", "cool stuff", "cool-stuff", "help",
        "help?", "help.", "tes(t)ed", "test", "tested"]
