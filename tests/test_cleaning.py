"""Corpus-cleaning operators: PII scrub, benchmark decontamination,
paragraph-level dedup (blacklab_ray/pipelines/cleaning.py).

Expected values are hand-computed; a DuckDB cross-check at sf0.01 runs
through the driver contract (test_entry.py: pii_scrub / decontaminate /
paragraph_dedup keys)."""

import hashlib

import pyarrow as pa
import pytest
import ray.data

from blacklab_ray.pipelines import cleaning


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    docs = pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "text": pa.array([
            "hello world contact me at bob.smith+x@mail.example.org now",
            "server at 10.0.42.7 and 192.168.1.1 called +1-555-0134",
            "plain text no pii here at all",
            "alpha beta gamma delta epsilon zeta",
            "alpha beta gamma delta epsilon zeta",  # exact dup of 3
            "mail a@b.co or c@d.org phone +31 20 123 4567 ip 8.8.8.8",
        ]),
    })
    return ray.data.from_arrow(docs).repartition(3)


def test_pii_scrub_counts_and_redaction(docs_ds):
    t = cleaning.pii_scrub(docs_ds, keep_text=True).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert t["n_emails"].tolist() == [1, 0, 0, 0, 0, 2]
    assert t["n_ips"].tolist() == [0, 2, 0, 0, 0, 1]
    assert t["n_phones"].tolist() == [0, 1, 0, 0, 0, 1]
    assert t.loc[0, "scrubbed_text"] == \
        "hello world contact me at <EMAIL> now"
    assert t.loc[1, "scrubbed_text"] == \
        "server at <IP> and <IP> called <PHONE>"
    assert t.loc[5, "scrubbed_text"] == \
        "mail <EMAIL> or <EMAIL> phone <PHONE> ip <IP>"
    # md5 is of the scrubbed body
    assert t.loc[2, "scrubbed_md5"] == hashlib.md5(
        b"plain text no pii here at all").hexdigest()
    # identical docs scrub to identical digests
    assert t.loc[3, "scrubbed_md5"] == t.loc[4, "scrubbed_md5"]


def test_pii_scrub_email_digits_not_counted_as_phone(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["write to user12345678@example.com today"]),
    }))
    t = cleaning.pii_scrub(ds).to_pandas()
    assert t["n_emails"].tolist() == [1]
    assert t["n_phones"].tolist() == [0]
    assert t["n_ips"].tolist() == [0]


def test_decontaminate_broadcast_semi_join(docs_ds, ray_session):
    bench = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([100], pa.int64()),
        "text": pa.array(["alpha beta gamma question answer"]),
    }))
    d = cleaning.decontaminate(docs_ds, bench, n=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # docs 3 and 4 contain the benchmark 3-gram "alpha beta gamma"
    assert d["n_gram_hits"].tolist() == [0, 0, 0, 1, 1, 0]
    assert d["contaminated"].tolist() == [
        False, False, False, True, True, False]


def test_decontaminate_counts_occurrences(ray_session):
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["a b c x a b c y a b"]),  # "a b c" twice
    }))
    bench = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["a b c"]),
    }))
    d = cleaning.decontaminate(corpus, bench, n=3).to_pandas()
    assert d["n_gram_hits"].tolist() == [2]


def test_decontaminate_empty_benchmark(docs_ds, ray_session):
    bench = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    d = cleaning.decontaminate(docs_ds, bench, n=3).to_pandas()
    assert not d["contaminated"].any()


def test_paragraph_dup_stats_cross_doc(ray_session):
    pdocs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "first para\n\nshared para\n\nunique one",
            "shared para\n\nanother thing",
            # blank paragraph is dropped; trailing spaces trimmed
            "totally different\n\n  \n\nshared para ",
        ]),
    })
    ds = ray.data.from_arrow(pdocs).repartition(2)
    p = cleaning.paragraph_dup_stats(ds, num_partitions=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert p["n_paragraphs"].tolist() == [3, 2, 2]
    assert p["n_dup_paragraphs"].tolist() == [1, 1, 1]


def test_paragraph_dup_stats_within_doc(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["x y\n\nx y\n\nz"]),
    }))
    p = cleaning.paragraph_dup_stats(ds, num_partitions=4).to_pandas()
    assert p["n_paragraphs"].tolist() == [3]
    assert p["n_dup_paragraphs"].tolist() == [2]


def test_explode_paragraphs_identity(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["  padded para \n\nsecond"]),
    }))
    t = cleaning.explode_paragraphs(ds).to_pandas()
    assert t["para_md5"].tolist() == [
        hashlib.md5(b"padded para").hexdigest(),
        hashlib.md5(b"second").hexdigest(),
    ]


def test_bloom_filter_membership():
    import numpy as np

    from blacklab_ray.pipelines.cleaning import BloomFilter
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**63, size=5000).astype(np.uint64)
    other = rng.integers(0, 2**63, size=5000).astype(np.uint64)
    other = other[~np.isin(other, keys)]
    b = BloomFilter.for_capacity(keys.size, fp_rate=0.01)
    b.add(keys)
    # no false negatives
    assert b.contains(keys).all()
    # false-positive rate near spec (generous bound)
    fp = b.contains(other).mean()
    assert fp < 0.03, fp
    # fixed size: ~1.2 bytes/key at 1%
    assert b.nbytes < 64 * 1024


def test_decontaminate_bloom_matches_exact(docs_ds, ray_session):
    from blacklab_ray.pipelines import cleaning
    bench = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([100], pa.int64()),
        "text": pa.array(["alpha beta gamma question answer"]),
    }))
    exact = cleaning.decontaminate(docs_ds, bench, n=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    bloom = cleaning.decontaminate_bloom(docs_ds, bench, n=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # tiny gram set -> no false positives; results identical
    assert exact["n_gram_hits"].tolist() == \
        bloom["n_gram_hits"].tolist()
    assert exact["contaminated"].tolist() == \
        bloom["contaminated"].tolist()


def test_pii_scrub_null_text(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a@b.co", None]),
    }))
    t = cleaning.pii_scrub(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert t["n_emails"].tolist() == [1, 0]
    assert t.loc[1, "scrubbed_md5"] == hashlib.md5(b"").hexdigest()


def test_pii_scrub_sequential_counts(ray_session):
    """An email whose local part is phone-shaped counts ONCE (as the
    email that was actually redacted), not as email + phone."""
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["dial +15551234567@relay.example.com now"]),
    }))
    t = cleaning.pii_scrub(ds, keep_text=True).to_pandas()
    assert t["n_emails"].tolist() == [1]
    assert t["n_phones"].tolist() == [0]
    assert t.loc[0, "scrubbed_text"] == "dial <EMAIL> now"


def test_normalize_text_rules(ray_session):
    """NFC composition, control strip, paragraph-preserving whitespace
    collapse, trim — each rule exercised; oracle parity runs through
    the driver contract (normalize_text key) and a DuckDB check in
    test_entry.py."""
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "café  au   lait\t\tok",      # NFD e + U+0301
            "  lead\n\n\n\n\nmid  \n  tail  ",  # blank runs + pads
            "ctrl\x00\x01here\x7f.",            # control chars
            None,
            "clean text",
        ]),
    })).repartition(2)
    t = cleaning.normalize_text(ds, keep_text=True).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert t.loc[0, "norm_text"] == "café au lait ok"  # composed
    assert t.loc[0, "n_chars_before"] == 20
    assert t.loc[0, "n_chars_after"] == 15
    # paragraph break survives, pads and blank runs collapse
    assert t.loc[1, "norm_text"] == "lead\n\nmid\ntail"
    assert t.loc[2, "norm_text"] == "ctrlhere."
    assert t.loc[3, "norm_text"] == ""
    assert not t.loc[3, "changed"]   # null -> '' counts as unchanged? no:
    # null fills to '' BEFORE the compare, so changed is False
    assert t.loc[4, "norm_text"] == "clean text"
    assert not t.loc[4, "changed"]
    assert t["changed"].tolist() == [True, True, True, False, False]
    import hashlib as _h
    assert t.loc[2, "norm_md5"] == _h.md5(b"ctrlhere.").hexdigest()


def test_normalize_text_ascii_stays_in_arrow(ray_session):
    """Pure-ASCII batches must not take the Python NFC path (scale
    guard): _nfc_array returns the input array object untouched."""
    col = pa.array(["plain ascii", "more ascii"])
    out = cleaning._nfc_array(col)
    assert out is col


# ---- C4 rules ---------------------------------------------------------------


def _c4(texts, **kw):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(2)
    return cleaning.c4_rules(ds, **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def test_c4_line_rules(ray_session):
    t = _c4([
        # kept: terminal punct + >=5 words; dropped: short / no punct /
        # javascript / policy phrase
        "This line has five good words.\n"
        "short.\n"
        "no terminal punctuation in this line\n"
        "please enable JavaScript to view this.\n"
        "read our Privacy Policy for details here.\n"
        "Second proper sentence with enough words!\n"
        'Quoted line also counts as terminal words."',
    ], keep_text=True)
    assert t.loc[0, "n_lines"] == 7
    assert t.loc[0, "n_kept_lines"] == 3
    assert t.loc[0, "clean_text"] == (
        "This line has five good words.\n"
        "Second proper sentence with enough words!\n"
        'Quoted line also counts as terminal words."')


def test_c4_page_rules(ray_session):
    good = ("One full sentence with enough words here.\n"
            "Two full sentences with enough words here!\n"
            "Three full sentences with enough words here?")
    t = _c4([
        good,                                   # kept
        good + "\nsee lorem ipsum dolor sit.",  # lorem ipsum -> dropped
        good.replace("Two", "Br{ace"),          # '{' -> dropped
        "Only one good sentence lives here.",   # <3 sentences -> dropped
        "",                                     # empty
    ])
    assert t["kept"].tolist() == [True, False, False, False, False]
    assert t.loc[0, "n_sentences"] == 3
    # empty doc: zero lines, md5 of the empty string
    assert t.loc[4, "n_lines"] == 0
    assert t.loc[4, "clean_md5"] == hashlib.md5(b"").hexdigest()


def test_c4_sentence_count_intra_line(ray_session):
    # several [.!?] inside one kept line all count as sentences
    t = _c4(["First part ends. second continues! third finishes? ok done."])
    assert t.loc[0, "n_kept_lines"] == 1
    assert t.loc[0, "n_sentences"] == 4
    assert bool(t.loc[0, "kept"])


def test_c4_trim_and_null(ray_session):
    t = _c4([None, "   Padded line with five words here.   "])
    assert t.loc[0, "n_lines"] == 0
    # trimmed before the terminal-punct test
    assert t.loc[1, "n_kept_lines"] == 1


# ---- URL / domain curation --------------------------------------------------

def test_url_filter_hosts_and_patterns(ray_session):
    import ray.data

    from blacklab_ray.pipelines.cleaning import url_filter
    rows = [
        {"doc_id": 1, "url": "https://WWW.Spam.Example/x"},
        {"doc_id": 2, "url": "http://good.example/page?q=1"},
        {"doc_id": 3, "url": "https://spam.example/other#f"},
        {"doc_id": 4, "url": "https://fine.example/casino/win"},
        {"doc_id": 5, "url": "https://fine.example/articles/1"},
    ]
    ds = ray.data.from_items(rows).repartition(3)
    kept = url_filter(ds, blocked_hosts=("spam.example",),
                      blocked_patterns=(r"/casino/",))
    got = sorted(kept.to_pandas()["doc_id"])
    # 1 and 3 blocked by host (www./case-insensitive), 4 by pattern
    assert got == [2, 5]


def test_url_filter_and_host_stats_null_urls(ray_session):
    """A null url must neither crash the blocklist filter (it is kept
    — not blocklisted) nor the host profile (it folds into the ''
    bucket)."""
    import pyarrow as pa
    import ray.data

    from blacklab_ray.pipelines.cleaning import host_stats, url_filter
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "url": pa.array(["https://spam.example/x", None,
                         "https://good.example/y"], pa.string()),
        "n_chars": pa.array([10, 20, 30], pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(2)
    kept = url_filter(ds, blocked_hosts=("spam.example",),
                      blocked_patterns=(r"/casino/",)).to_pandas()
    assert sorted(kept["doc_id"]) == [2, 3]
    hs = host_stats(ds, chars_col="n_chars").to_pandas() \
        .set_index("host")
    assert hs.loc["", "n_docs"] == 1 and hs.loc["", "total_chars"] == 20
    assert hs.loc["spam.example", "n_docs"] == 1


def test_host_stats_matches_brute(ray_session):
    import ray.data

    from blacklab_ray.pipelines.cleaning import host_stats
    rows = []
    for i in range(60):
        host = f"h{i % 7}.example"
        rows.append({"url": f"https://www.{host}/p/{i}?x=1",
                     "n_chars": 100 + i})
    ds = ray.data.from_items(rows).repartition(5)
    got = host_stats(ds, chars_col="n_chars").to_pandas() \
        .sort_values("host").reset_index(drop=True)
    import collections
    nd = collections.Counter()
    tc = collections.Counter()
    for i, r in enumerate(rows):
        h = f"h{i % 7}.example"
        nd[h] += 1
        tc[h] += r["n_chars"]
    assert len(got) == 7
    for _, row in got.iterrows():
        assert row["n_docs"] == nd[row["host"]]
        assert row["total_chars"] == tc[row["host"]]
