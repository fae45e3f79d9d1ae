"""TestSearches.java replicated line-by-line.

The reference's core behavioral suite (core/src/test/java/nl/inl/
blacklab/search/TestSearches.java) runs ~39 searches over the fixed
4-doc TestIndex corpus (testutil/TestIndex.java:117-170: pangram /
word-list / Star Wars / Shakespeare, doc lengths 9/12/6/10, word+
lemma+pos annotations, <s>/<entity> tags, a multi-value first token
The|DOH|ZZZ, title metadata) and asserts exact concordance lists
("left [match] right", one word of context, forward-index text).

This module rebuilds that corpus through our build pipeline
(annotations, tags, multivalue column, sensitive variant, typed
metadata) and pins every expected list from the Java file verbatim.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from blacklab_ray.stages.xmlconfig import TAG_SPANS_TYPE

MULTI_TYPE = pa.list_(pa.struct([("pos", pa.int32()),
                                 ("value", pa.string())]))


def _testindex_table() -> pa.Table:
    """TestIndex.TEST_DATA re-expressed as a pages-schema table."""
    words = [
        "The quick brown fox jumps over the lazy dog",
        "noot mier aap mier mier mier noot noot aap aap aap aap",
        "May the Force be with you",
        "To find or not to find That is the question",
    ]
    lemma = [
        "the quick brown fox jump over the lazy dog".split(),
        "noot mier aap mier mier mier noot noot aap aap aap aap".split(),
        "may the force be with you".split(),
        "to find or be to find that be the question".split(),
    ]
    pos = [
        "art adj adj nou vrb pre art adj nou".split(),
        [""] * 12,                  # doc 1 has no p annotations
        "vrb art nou vrb pre pro".split(),
        "pre vrb con adv pre vrb pro vrb art nou".split(),
    ]
    tags = [
        [{"name": "s", "start": 0, "end": 9, "attrs": ""},
         {"name": "entity", "start": 0, "end": 4, "attrs": ""},
         {"name": "entity", "start": 6, "end": 9, "attrs": ""}],
        [],
        [{"name": "s", "start": 0, "end": 6, "attrs": ""},
         {"name": "entity", "start": 1, "end": 3, "attrs": ""}],
        [{"name": "s", "start": 0, "end": 6, "attrs": ""},
         {"name": "s", "start": 6, "end": 10, "attrs": ""}],
    ]
    multi = [
        # token 0 of doc 0 is The|DOH|ZZZ: secondary values at pos 0
        [{"pos": 0, "value": "DOH"}, {"pos": 0, "value": "ZZZ"}],
        [], [], [],
    ]
    titles = ["Pangram", "Learning words", "Star Wars",
              "Bastardized Shakespeare"]
    return pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "url": ["0", "1", "2", "3"],       # pids
        "warc_ts": pa.array([0] * 4, pa.timestamp("us")),
        "html": pa.array([w.encode() for w in words], pa.binary()),
        "text": words,
        "lang": ["en"] * 4,
        "title": titles,
        "lemma": pa.array(lemma, pa.list_(pa.string())),
        "pos": pa.array(pos, pa.list_(pa.string())),
        "tags": pa.array(tags, TAG_SPANS_TYPE),
        "multi": pa.array(multi, MULTI_TYPE),
    })


@pytest.fixture(scope="module")
def ti_reader(ray_session, tmp_path_factory):
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader
    root = tmp_path_factory.mktemp("testindex4")
    src = root / "pages.parquet"
    pq.write_table(_testindex_table(), str(src))
    idx = str(root / "idx")
    build_index(str(src), idx, BuildParams(
        num_buckets=4, n_salts=2, block_size=16,
        id_column="doc_id", sensitive=True,
        annotations=("lemma", "pos"),
        metadata_fields=(("title", "tokenized"),),
        multivalue_column="multi"))
    return IndexReader(idx)


def find_conc(reader, q: str, doc_ids=None) -> list[str]:
    """TestIndex.findConc analogue: CQL → concordances with ONE word
    of context, rendered from the sensitive (original-case) forward
    index, hits in (doc, start, end) order."""
    from blacklab_ray.query.cql import cql_spans
    t = cql_spans(reader, q)
    if doc_ids is not None:
        keep = np.isin(t["doc_id"].to_numpy(), np.asarray(doc_ids))
        t = t.filter(pa.array(keep))
    if t.num_rows == 0:
        return []
    d = t["doc_id"].to_numpy()
    s = t["start"].to_numpy()
    e = t["end"].to_numpy()
    order = np.lexsort((e, s, d))
    d, s, e = d[order], s[order], e[order]
    lens = {int(i): int(n) for i, n in zip(
        *_doc_len_pairs(reader, np.unique(d)))}

    def tok(doc, pos):
        return reader.tokens_at(np.array([doc], dtype=np.int64),
                                np.array([pos], dtype=np.int64),
                                annotation="s")[0]

    out = []
    for di, si, ei in zip(d, s, e):
        parts = []
        if si > 0:
            parts.append(tok(di, si - 1))
        parts.append("[" + " ".join(
            tok(di, p) for p in range(si, ei)) + "]")
        if ei < lens[int(di)]:
            parts.append(tok(di, ei))
        out.append(" ".join(parts))
    return out


def _doc_len_pairs(reader, ids):
    return ids, reader.doc_lens(ids.astype(np.int64))


# ---------------------------------------------------------------------------
# the TestSearches methods, expected lists verbatim
# ---------------------------------------------------------------------------

def test_simple(ti_reader):
    assert find_conc(ti_reader, " 'the' ") == [
        "[The] quick", "over [the] lazy", "May [the] Force",
        "is [the] question"]
    # (?-i) forces case-sensitive: "The" no longer matches
    assert find_conc(ti_reader, " '(?-i)the' ") == [
        "over [the] lazy", "May [the] Force", "is [the] question"]
    assert find_conc(ti_reader, " [pos='nou'] ") == [
        "brown [fox] jumps", "lazy [dog]", "the [Force] be",
        "the [question]"]


def test_simple_doc_filter(ti_reader):
    assert find_conc(ti_reader, " 'the' ", doc_ids=[2]) == [
        "May [the] Force"]


def test_simple_title_filter(ti_reader):
    from blacklab_ray.query.metafilter import filter_docs_meta
    ids = filter_docs_meta(ti_reader, [("title", "contains", "star")])
    assert find_conc(ti_reader, " 'the' ", doc_ids=ids) == [
        "May [the] Force"]


def test_filtered_query(ti_reader):
    from blacklab_ray.query.cql import cql_spans
    fox_docs = np.unique(
        cql_spans(ti_reader, "'fox'")["doc_id"].to_numpy())
    assert find_conc(ti_reader, " 'the' ", doc_ids=fox_docs) == [
        "[The] quick", "over [the] lazy"]


def test_sequences(ti_reader):
    expected = ["quick [brown fox] jumps", "the [lazy dog]"]
    assert find_conc(ti_reader, " [pos='adj'] [pos='nou'] ") == expected
    assert find_conc(ti_reader,
                     " _FI1([pos='adj'], [pos='nou']) ") == expected
    assert find_conc(ti_reader,
                     " _FI2([pos='adj'], [pos='nou']) ") == expected


def test_more_sequences_fi_match(ti_reader):
    assert len(find_conc(ti_reader, " [] [] ")) == 33
    assert len(find_conc(ti_reader, " _FI1([], []) ")) == 33
    assert len(find_conc(ti_reader, " _FI2([], []) ")) == 33


def test_match_all(ti_reader):
    assert find_conc(ti_reader, " [pos='nou'] [] ") == [
        "brown [fox jumps] over", "the [Force be] with"]
    assert find_conc(ti_reader, " [] [pos='nou'] ") == [
        "quick [brown fox] jumps", "the [lazy dog]",
        "May [the Force] be", "is [the question]"]


def test_optional1(ti_reader):
    assert find_conc(ti_reader, " []? [pos='pro'] ") == [
        "be [with you]", "with [you]", "to [find That] is",
        "find [That] is"]


def test_optional2(ti_reader):
    assert find_conc(ti_reader, " [pos='pro'] []? ") == [
        "with [you]", "find [That] is", "find [That is] the"]


def test_optional3(ti_reader):
    assert find_conc(ti_reader, " 'with|find'? [pos='pro']? ") == [
        "be [with] you", "be [with you]", "with [you]",
        "To [find] or", "to [find] That", "to [find That] is",
        "find [That] is"]


def test_repetition(ti_reader):
    assert find_conc(ti_reader, " [pos='adj']{2} ") == [
        "The [quick brown] fox"]
    assert find_conc(ti_reader, " [pos='adj']{1,} ") == [
        "The [quick] brown", "The [quick brown] fox",
        "quick [brown] fox", "the [lazy] dog"]


def test_repetition_no_results(ti_reader):
    assert find_conc(ti_reader, "[pos='PD.*']+ '(?i)getal'") == []


def test_string_regexes(ti_reader):
    assert find_conc(ti_reader, " 'b.*' ") == [
        "quick [brown] fox", "Force [be] with"]
    assert find_conc(ti_reader, " 'fo[xr].*' ") == [
        "brown [fox] jumps", "the [Force] be"]


def test_uniq(ti_reader):
    assert find_conc(ti_reader,
                     "[word = 'jumps' | lemma = 'jump']") == [
        "fox [jumps] over"]


def test_or(ti_reader):
    assert find_conc(ti_reader,
                     "[word = 'jumps' | lemma = 'over']") == [
        "fox [jumps] over", "jumps [over] the"]


def test_and(ti_reader):
    assert find_conc(ti_reader,
                     "[pos = 'adj' & lemma = '.*u.*']") == [
        "The [quick] brown"]


def test_tags(ti_reader):
    assert find_conc(ti_reader, " 'b.*' within <entity/> ") == [
        "quick [brown] fox"]
    assert find_conc(ti_reader, " <entity/> containing 'b.*' ") == [
        "[The quick brown fox] jumps"]
    assert find_conc(ti_reader, " <s> 'the' ") == ["[The] quick"]
    assert find_conc(ti_reader, " 'dog' </s> ") == ["lazy [dog]"]


def test_nfa4(ti_reader):
    assert find_conc(ti_reader, " 'May' '.*e'+ 'with' ") == [
        "[May the Force be with] you"]


def test_only_repetition(ti_reader):
    assert find_conc(ti_reader, "[lemma='.*he']{0,10}") == [
        "[The] quick", "over [the] lazy", "May [the] Force",
        "is [the] question"]


# ---------------------------------------------------------------------------
# constraint batch
# ---------------------------------------------------------------------------

AAP3 = ["noot [mier aap mier] mier", "noot [aap aap aap] aap",
        "aap [aap aap aap]"]


def test_constraint_simple0(ti_reader):
    assert find_conc(ti_reader, "a:'Force' :: a.word = 'Force'") == [
        "the [Force] be"]


def test_constraint_simple1(ti_reader):
    assert find_conc(ti_reader,
                     "a:[] 'aap' b:[] :: a.word = b.word") == AAP3


def test_constraint_simple2(ti_reader):
    assert find_conc(ti_reader,
                     "a:[] 'aap' b:[] :: a.word = b.lemma") == AAP3


def test_constraint_simple3(ti_reader):
    assert find_conc(
        ti_reader, "a:[] 'aap' 'mier' b:[] :: a.word = b.word") == [
        "noot [mier aap mier mier] mier"]


def test_constraint_simple4(ti_reader):
    assert find_conc(
        ti_reader,
        "a:[] ([]{1,5} containing 'brown') b:[] :: a.lemma = b.lemma"
        ) == ["[The quick brown fox jumps over the] lazy"]


def test_constraint_simple4a(ti_reader):
    assert find_conc(
        ti_reader, "a:[] ([]{1,5} containing 'brown') b:[]") == [
        "[The quick brown fox] jumps",
        "[The quick brown fox jumps] over",
        "[The quick brown fox jumps over] the",
        "[The quick brown fox jumps over the] lazy",
        "The [quick brown fox] jumps",
        "The [quick brown fox jumps] over",
        "The [quick brown fox jumps over] the",
        "The [quick brown fox jumps over the] lazy",
        "The [quick brown fox jumps over the lazy] dog"]


def test_ngram_containing_with_adjustment(ti_reader):
    assert find_conc(ti_reader, "[] ([]{1,5} containing 'brown')") == [
        "[The quick brown] fox",
        "[The quick brown fox] jumps",
        "[The quick brown fox jumps] over",
        "[The quick brown fox jumps over] the",
        "The [quick brown] fox",
        "The [quick brown fox] jumps",
        "The [quick brown fox jumps] over",
        "The [quick brown fox jumps over] the",
        "The [quick brown fox jumps over the] lazy"]


def test_expand_twice(ti_reader):
    assert find_conc(ti_reader,
                     "'The' []{1,2} 'fox' []{1, 2} 'over' ") == [
        "[The quick brown fox jumps over] the"]


def test_constraint_or1(ti_reader):
    assert find_conc(
        ti_reader,
        "a:[] 'aap' b:[] :: a.word = b.lemma | a.word = b.pos") == AAP3


def test_constraint_or2(ti_reader):
    assert find_conc(
        ti_reader,
        "a:[] 'aap' b:[] :: a.word = b.lemma | a.lemma = b.word") \
        == AAP3


def test_constraint_and1(ti_reader):
    assert find_conc(
        ti_reader,
        "a:[] 'aap' b:[] :: a.word = b.lemma & a.word = b.pos") == []


def test_constraint_and2(ti_reader):
    assert find_conc(
        ti_reader,
        "a:[] 'aap' b:[] :: a.word = b.lemma & a.word != b.pos") \
        == AAP3


def test_constraint_and3(ti_reader):
    assert find_conc(
        ti_reader,
        "a:[] 'aap' b:[] :: a.word = b.lemma & a.pos = b.pos") == AAP3


def test_constraint_implication1(ti_reader):
    assert find_conc(
        ti_reader,
        "(c:'noot')? a:[] 'aap' b:[] :: c -> (a.word = b.word)") == [
        "[noot mier aap mier] mier",
        "noot [mier aap mier] mier",
        "noot [noot aap aap] aap",
        "noot [noot aap aap aap] aap",
        "noot [aap aap aap] aap",
        "aap [aap aap aap]"]


def test_constraint_implication2(ti_reader):
    assert find_conc(
        ti_reader,
        "(c:'NOTININDEX')? a:[] 'aap' b:[] :: c -> a.word = b.word"
        ) == ["noot [mier aap mier] mier", "noot [noot aap aap] aap",
              "noot [aap aap aap] aap", "aap [aap aap aap]"]


# ---------------------------------------------------------------------------
# sort / filter / capture-group / doc-results batch
# ---------------------------------------------------------------------------

IMPL_Q = "(c:'NOTININDEX')? a:[] 'aap' b:[] :: c -> a.word = b.word"


def _sorted_concs(reader, q, reverse=False):
    """findConc under HitPropertyMultiple(hit text, left context),
    both INSENSITIVE — via the server's criterion-key machinery."""
    from blacklab_ray.query.cql import cql_spans
    from blacklab_ray.server import _group_keys
    t = cql_spans(reader, q)
    keys, _name = _group_keys(reader, t, "hit:word:i,left:word:i")
    concs = find_conc(reader, q)
    # find_conc sorts by (doc,start,end); align keys the same way
    d = t["doc_id"].to_numpy()
    s = t["start"].to_numpy()
    e = t["end"].to_numpy()
    order = np.lexsort((e, s, d))
    keys = [keys[i] for i in order]
    return [c for _k, c in sorted(zip(keys, concs),
                                  key=lambda kc: kc[0],
                                  reverse=reverse)]


def test_sort(ti_reader):
    assert _sorted_concs(ti_reader, IMPL_Q) == [
        "aap [aap aap aap]",
        "noot [aap aap aap] aap",
        "noot [mier aap mier] mier",
        "noot [noot aap aap] aap"]


def test_sort_reverse(ti_reader):
    assert _sorted_concs(ti_reader, IMPL_Q, reverse=True) == [
        "noot [noot aap aap] aap",
        "noot [mier aap mier] mier",
        "noot [aap aap aap] aap",
        "aap [aap aap aap]"]


def _hit_text_filtered(reader, q, value):
    """findConc filtered to hits whose INSENSITIVE hit text equals
    ``value`` (HitPropertyHitText + PropertyValueContextWords)."""
    from blacklab_ray.query.cql import cql_spans
    from blacklab_ray.server import _group_keys
    t = cql_spans(reader, q)
    keys, _name = _group_keys(reader, t, "hit:word:i")
    d = t["doc_id"].to_numpy()
    s = t["start"].to_numpy()
    e = t["end"].to_numpy()
    order = np.lexsort((e, s, d))
    concs = find_conc(reader, q)
    return sorted({c for i, c in zip(order, concs)
                   if keys[order[np.where(order == i)[0][0]]] is not
                   None and keys[i] == value})


def test_filter(ti_reader):
    from blacklab_ray.query.cql import cql_spans
    from blacklab_ray.server import _group_keys
    t = cql_spans(ti_reader, IMPL_Q)
    keys, _ = _group_keys(ti_reader, t, "hit:word:i")
    d = t["doc_id"].to_numpy()
    s = t["start"].to_numpy()
    e = t["end"].to_numpy()
    order = np.lexsort((e, s, d))
    concs = find_conc(ti_reader, IMPL_Q)
    got = [c for i, c in enumerate(concs)
           if keys[order[i]] == "noot aap aap"]
    assert got == ["noot [noot aap aap] aap"]


def test_ngrams_not_containing(ti_reader):
    q = "'noot'+ [word != 'noot']+ group:('aap')+"
    from blacklab_ray.query.cql import cql_spans
    from blacklab_ray.server import _group_keys
    t = cql_spans(ti_reader, q)
    keys, _ = _group_keys(ti_reader, t, "hit:word:i")
    d = t["doc_id"].to_numpy()
    s = t["start"].to_numpy()
    e = t["end"].to_numpy()
    order = np.lexsort((e, s, d))
    concs = find_conc(ti_reader, q)
    got = sorted({c for i, c in enumerate(concs)
                  if keys[order[i]] == "noot aap aap"})
    assert got == ["noot [noot aap aap] aap"]


def test_capture_groups(ti_reader):
    from blacklab_ray.query.cql import cql_spans
    t = cql_spans(ti_reader, "A:'aap'")
    assert t.num_rows == 5
    assert "A_pos" in t.column_names
    d = t["doc_id"].to_numpy()
    s = t["start"].to_numpy()
    order = np.lexsort((t["end"].to_numpy(), s, d))
    # first hit (doc 1 pos 2): capture at [2,3)
    assert int(t["A_pos"].to_numpy()[order[0]]) == 2
    assert int(s[order[0]]) == 2


def test_doc_results(ti_reader):
    # 4 docs with their pids and titles (queryDocuments MatchAll)
    ids = ti_reader.all_doc_ids()
    assert len(ids) == 4
    assert set(ti_reader.urls(ids)) == {"0", "1", "2", "3"}
    from blacklab_ray.server import _doc_field_lookup
    lk = _doc_field_lookup(ti_reader, np.asarray(ids), "title")
    assert set(lk.values()) == {"Pangram", "Learning words",
                                "Star Wars",
                                "Bastardized Shakespeare"}


# ---------------------------------------------------------------------------
# the REAL testformat.blf.yaml over TestIndex.TEST_DATA
# ---------------------------------------------------------------------------

# TestIndex.java:117-170's four XML documents (test fixture data)
TEST_DATA = [
    "<doc pid='0' title='Pangram'><s><entity>"
    "<w l='the'   p='art'>The|DOH|ZZZ</w> "
    "<w l='quick' p='adj'>quick</w> "
    "<w l='brown' p='adj'>brown</w> "
    "<w l='fox'   p='nou'>fox</w></entity> "
    "<w l='jump'  p='vrb' >jumps</w> "
    "<w l='over'  p='pre' >over</w> "
    "<entity><w l='the'   p='art' >the</w> "
    "<w l='lazy'  p='adj'>lazy</w> "
    "<w l='dog'   p='nou'>dog</w></entity>.</s></doc>",
    "<doc pid='1' title='Learning words'> <w l='noot'>noot</w> "
    "<w l='mier'>mier</w> <w l='aap'>aap</w> <w l='mier'>mier</w> "
    "<w l='mier'>mier</w> <w l='mier'>mier</w> <w l='noot'>noot</w> "
    "<w l='noot'>noot</w> <w l='aap'>aap</w> <w l='aap'>aap</w> "
    "<w l='aap'>aap</w> <w l='aap'>aap</w> </doc>",
    "<doc pid='2' title='Star Wars'> <s><w l='may' p='vrb'>May</w> "
    "<entity><w l='the' p='art'>the</w> "
    "<w l='force' p='nou'>Force</w></entity> "
    "<w l='be' p='vrb'>be</w> <w l='with' p='pre'>with</w> "
    "<w l='you' p='pro'>you</w>.</s></doc>",
    "<doc pid='3' title='Bastardized Shakespeare'> "
    "<s><w l='to' p='pre'>To</w> <w l='find' p='vrb'>find</w> "
    "<w l='or' p='con'>or</w> <w l='be' p='adv'>not</w> "
    "<w l='to' p='pre'>to</w> <w l='find' p='vrb'>find</w>.</s>"
    "<s><w l='that' p='pro'>That</w> <w l='be' p='vrb'>is</w> "
    "<w l='the' p='art'>the</w> "
    "<w l='question' p='nou'>question</w>.</s></doc>",
]

REF_TESTFORMAT = ("/root/reference/core/src/main/resources/formats/"
                  "testformat.blf.yaml")


def test_real_testformat_config_extracts_testindex(ray_session,
                                                   tmp_path):
    """The REAL testformat.blf.yaml (the TestIndex format: word
    process split on '|' with multipleValues, punctPath, s/entity
    inline tags, pid/title metadata) over TestIndex.TEST_DATA
    reproduces the corpus the parity fixture hand-builds — and a
    built index answers a TestSearches query identically."""
    import os
    if not os.path.exists(REF_TESTFORMAT):
        pytest.skip("reference formats dir not present")
    from blacklab_ray.formats import read_pages, register_yaml_format
    with open(REF_TESTFORMAT) as f:
        name = register_yaml_format(f.read(), name="testformat-real")
    src = tmp_path / "docs.xml"
    src.write_text("<docs>%s</docs>" % "".join(TEST_DATA))
    rows = sorted(read_pages(name, str(src)).take_all(),
                  key=lambda r: r["url"])
    assert [r["url"] for r in rows] == ["0", "1", "2", "3"]
    ref = _testindex_table().to_pylist()
    for got, exp in zip(rows, ref):
        assert got["text"].split() == exp["text"].split(), got["url"]
        assert got["lemma"] == exp["lemma"]
        assert got["pos"] == exp["pos"]
        assert sorted((t["name"], t["start"], t["end"])
                      for t in got["tags"]) == \
            sorted((t["name"], t["start"], t["end"])
                   for t in exp["tags"])
        assert got["multi"] == exp["multi"]
        assert got["meta_title"] == exp["title"]
    # punctPath: the trailing '.' lands as punct, not a token
    assert rows[0]["punct"][-1] == "."

    # build through the config output and run a TestSearches query
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.query import IndexReader
    idx = str(tmp_path / "idx")
    build_index(read_pages(name, str(src)), idx, BuildParams(
        num_buckets=2, n_salts=1, sensitive=True,
        annotations=("lemma", "pos"),
        metadata_fields=(("meta_title", "tokenized"),),
        multivalue_column="multi"))
    rd = IndexReader(idx)
    got = find_conc(rd, " [pos='adj'] [pos='nou'] ")
    assert got == ["quick [brown fox] jumps", "the [lazy dog]"]
    # the multi-value token: 'zzz' searches hit position 0 of doc 0
    from blacklab_ray.query.cql import cql_spans
    t = cql_spans(rd, "'zzz'")
    docs = rd.urls(t["doc_id"].to_numpy())
    assert list(docs) == ["0"] and t["start"].to_pylist() == [0]


# ---------------------------------------------------------------------------
# TestHitProperties.java: grouping criteria + term serialization
# ---------------------------------------------------------------------------

def _group_sizes(reader, q, crit):
    from collections import Counter
    from blacklab_ray.query.cql import cql_spans
    from blacklab_ray.server import _group_keys
    t = cql_spans(reader, q)
    keys, _name = _group_keys(reader, t, crit)
    return Counter(keys)


def test_hit_prop_hit_text_sensitive(ti_reader):
    """testHitPropHitText: SENSITIVE hit-text grouping separates
    'the' (3) from 'The' (1)."""
    g = _group_sizes(ti_reader, " 'the' ", "hit:word:s")
    assert g["the"] == 3
    assert g["The"] == 1


def test_hit_prop_context_words(ti_reader):
    """testHitPropContextWords: spec L1-1;H1-2 over 'the' yields four
    singleton groups; out-of-range slots serialize as '~'."""
    g = _group_sizes(ti_reader, " 'the' ",
                     "context:word:s:L1-1;H1-2")
    assert len(g) == 4
    assert g["~ The ~"] == 1
    assert g["over the ~"] == 1
    assert g["May the ~"] == 1
    assert g["is the ~"] == 1


def test_hit_prop_context_words_reverse(ti_reader):
    """testHitPropContextWordsReverse: descending hit range H2-1
    reverses the hit words."""
    g = _group_sizes(ti_reader, " 'the' 'lazy' ",
                     "context:word:s:L1;H2-1;R1")
    assert dict(g) == {"over lazy the dog": 1}


def test_term_serialization():
    """testTermSerialization: all-tilde terms escape by doubling,
    NO_TERM serializes as '~'."""
    from blacklab_ray.server import serialize_term
    assert serialize_term("aap") == "aap"
    assert serialize_term("~") == "~~"
    assert serialize_term("~~") == "~~~"
    assert serialize_term("") == ""
    assert serialize_term(None) == "~"


def test_hit_prop_annotation_route(ti_reader):
    """hit:<annot>: grouping by a parallel annotation (lemma)."""
    g = _group_sizes(ti_reader, " [pos='nou'] ", "hit:lemma:i")
    assert dict(g) == {"fox": 1, "dog": 1, "force": 1, "question": 1}


# ---------------------------------------------------------------------------
# FrequencyTool (config-driven frequency lists over the built index)
# ---------------------------------------------------------------------------

def test_frequency_lists_tool(ti_reader, tmp_path):
    """FrequencyTool README's config shape over the TestIndex corpus:
    per-list TSVs of annotation-tuple x metadata counts, checked
    against exact hand counts from the fixture."""
    from collections import Counter
    from blacklab_ray.pipelines.frequency import (frequency_list,
                                                  frequency_lists)
    idx = ti_reader.index_dir
    # word frequencies over the entire corpus
    t = frequency_list(idx, ["word"]).to_pandas()
    got = dict(zip(t["word"], t["frequency"]))
    exp = Counter()
    for row in _testindex_table().to_pylist():
        for w in row["text"].split():
            exp[w.lower()] += 1          # analyzed (insensitive) fold
    assert got == dict(exp)

    # lemma+pos per title (annotations x metadataFields)
    t2 = frequency_list(idx, ["lemma", "pos"],
                        ["title"]).to_pandas()
    exp2 = Counter()
    for row in _testindex_table().to_pylist():
        for lem, pos in zip(row["lemma"], row["pos"]):
            exp2[(lem, pos, row["title"])] += 1
    got2 = {(r["lemma"], r["pos"], r["title"]): r["frequency"]
            for _i, r in t2.iterrows()}
    assert got2 == dict(exp2)

    # the tool entry point: one report file per configured list
    cfg = {"annotatedField": "contents", "frequencyLists": [
        {"annotations": ["word"]},
        {"annotations": ["lemma"], "metadataFields": ["title"],
         "name": "lemma-by-title"},
    ]}
    out = str(tmp_path / "reports")
    paths = frequency_lists(idx, cfg, out)
    import os
    assert sorted(os.path.basename(p) for p in paths) == \
        ["lemma-by-title.tsv", "word.tsv"]
    lines = open(paths[0]).read().strip().split("\n")
    assert len(lines) == len(exp)        # word.tsv rows = vocab size
    first = lines[0].split("\t")
    assert len(first) == 2 and first[1].isdigit()


def test_export_corpus(ti_reader, tmp_path):
    """ExportCorpus.java analogue: one file per live pid; without a
    content store the forward-index token stream reconstructs."""
    from blacklab_ray.pipelines.docsops import export_corpus
    out = str(tmp_path / "export")
    n = export_corpus(ti_reader.index_dir, out)
    assert n == 4
    import os
    files = sorted(os.listdir(out))
    assert files == ["0.txt", "1.txt", "2.txt", "3.txt"]
    # analyzed stream round-trips (fwd holds the insensitive fold)
    body = open(os.path.join(out, "2.txt")).read()
    assert body == "may the force be with you"


def test_search_hit_groups(ti_reader):
    """TestSearchHitGroups: every token ([] any-token query) grouped
    by SENSITIVE hit text and sorted by identity — 25 groups, 'aap'
    (5) first, 'be' (1) second."""
    from blacklab_ray.analysis.collate import collation_key
    g = _group_sizes(ti_reader, "[]", "hit:word:s")
    assert len(g) == 25
    ordered = sorted(g, key=lambda k: collation_key(k,
                                                    sensitive=True))
    assert ordered[0] == "aap" and g["aap"] == 5
    assert ordered[1] == "be" and g["be"] == 1


def test_hit_prop_context_words_from_end(ti_reader):
    """The E side counts hit words from the END (E1 = last hit
    word): 'the lazy' hits keyed by E1;L1."""
    g = _group_sizes(ti_reader, " 'the' 'lazy' ",
                     "context:word:s:E1;L1")
    assert dict(g) == {"lazy over": 1}


def test_sort_param_accepts_new_criteria(ti_reader):
    """sort= shares the criterion machinery: sorting hits by
    sensitive hit text through the HTTP handler."""
    from blacklab_ray.server import BlsApp
    import json as _json
    app = BlsApp({"ti": ti_reader})

    def call(qs):
        def sr(status, headers):
            pass
        env = {"PATH_INFO": "/corpora/ti/hits", "QUERY_STRING": qs,
               "REQUEST_METHOD": "GET"}
        return _json.loads(b"".join(app(env, sr)).decode())
    r = call("patt=%22the%22&sort=hit:word:s")
    words = [h["match"]["word"][0] for h in r["hits"]]
    assert words == sorted(words, key=str.lower)
    r2 = call("patt=%22the%22&sort=context:word:s:L1-1")
    assert len(r2["hits"]) == 4
