"""End-to-end curation composition (pipelines/curate.py)."""

import pyarrow as pa
import pytest
import ray.data

from blacklab_ray.pipelines.curate import curate

EN = ("the quick brown fox jumps over a lazy dog and then it runs "
      "back to the house because it is happy and you can see that "
      "this is a fine english sentence with plenty of stopwords in it")
NL = ("de snelle bruine vos springt over een luie hond en het is een "
      "mooie dag want ik ga naar het park en dat is leuk te zien van "
      "de morgen tot de avond en het wordt niet saai")


@pytest.fixture(scope="module")
def corpus(ray_session):
    docs = pa.table({
        "doc_id": pa.array(list(range(5)), pa.int64()),
        "text": pa.array([
            EN + " reach me at a.b@example.com please",   # 0: keep
            EN + " reach me at a.b@example.com please",   # 1: exact dup
            NL,                                           # 2: wrong lang
            "spam " * 60,                                 # 3: low quality
            EN + " another fine document here",           # 4: keep
        ]),
    })
    return ray.data.from_arrow(docs).repartition(2)


TH = {"min_tokens": 10, "max_top_bigram_frac": 0.5,
      "min_mean_token_len": 0.0, "min_alpha_ratio": 0.5}


def test_curate_full_recipe(corpus):
    out = curate(corpus, languages=("en",),
                 quality_thresholds=TH).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # dup doc 1 dropped (min id 0 survives), nl doc 2 dropped,
    # spam doc 3 dropped by the repetition rule
    assert out["doc_id"].tolist() == [0, 4]
    # PII scrubbed into the text column, counted
    assert "<EMAIL>" in out.loc[0, "text"]
    assert out.loc[0, "n_pii"] == 1
    assert out.loc[1, "n_pii"] == 0


def test_curate_keep_all_languages(corpus):
    out = curate(corpus, languages=None, quality_thresholds=TH,
                 scrub_pii=False).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # nl doc kept; spam still dropped; dup still dropped
    assert out["doc_id"].tolist() == [0, 2, 4]
    assert list(out.columns) == ["doc_id", "text", "lang_pred"]
    assert out["lang_pred"].tolist() == ["en", "nl", "en"]


def test_curate_ppl_filter(ray_session):
    """Stage 4b drops the tail tercile: with 9 docs (3 repeated
    sentence shapes x 3 + garbage) the garbage doc lands in the tail
    and the repeated shapes survive."""
    base = [EN + f" variant {i} of the sentence" for i in range(8)]
    docs = base + ["zq xv qj wk bn md plg vrt xx yy zz qq ww ee rr tt"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(docs))), pa.int64()),
        "text": pa.array(docs)})).repartition(2)
    out = curate(ds, languages=None, quality_thresholds=TH,
                 ppl_filter=("head", "middle"),
                 scrub_pii=False).to_pandas()
    kept = set(out["doc_id"])
    assert len(docs) - 1 not in kept     # garbage doc in the tail
    assert len(kept) >= 5                # head+middle survive


def test_curate_near_dup(ray_session):
    a = EN + " unique tail one two three"
    b = EN + " unique tail one two four"      # near-dup of a
    docs = pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": pa.array([a, b, NL.replace("de", "da") + " " + EN]),
    })
    ds = ray.data.from_arrow(docs).repartition(2)
    out = curate(ds, languages=None, quality_thresholds=TH,
                 near_dup=True, near_dup_threshold=0.7,
                 scrub_pii=False).to_pandas()
    ids = sorted(out["doc_id"].tolist())
    # 11 is the larger id of the verified near-dup pair -> dropped
    assert 10 in ids and 11 not in ids and 12 in ids


def test_curate_custom_id_column(ray_session):
    docs = pa.table({
        "page_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([EN, EN]),
    })
    out = curate(ray.data.from_arrow(docs).repartition(2),
                 id_col="page_id", languages=None,
                 quality_thresholds=TH, scrub_pii=False).to_pandas()
    assert out["page_id"].tolist() == [0]


def test_curate_normalize_unifies_dedup(ray_session):
    """Stage 0 canonicalizes text BEFORE the dedup hash: two docs
    differing only in whitespace/control noise dedup to one; with
    normalize=False both survive."""
    noisy = EN.replace(" quick ", "  quick\t ") + "\x00"
    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([EN, noisy]),
    })
    ds = ray.data.from_arrow(docs).repartition(2)
    out = curate(ds, quality_thresholds=TH, scrub_pii=False).to_pandas()
    assert out["doc_id"].tolist() == [0]
    out2 = curate(ds, normalize=False, quality_thresholds=TH,
                  scrub_pii=False).to_pandas()
    assert sorted(out2["doc_id"].tolist()) == [0, 1]


def test_curate_mixture_stage(ray_session):
    """Mixture resampling caps per-language doc counts by weight."""
    rows = []
    for i in range(12):
        rows.append({"doc_id": i, "text": EN + f" variant {i}"})
    for i in range(12, 18):
        rows.append({"doc_id": i, "text": NL + f" nummer {i}"})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = curate(ds, languages=None, quality_thresholds=TH,
                 scrub_pii=False,
                 mixture_weights={"en": 0.5, "nl": 0.5},
                 mixture_total=8).to_pandas()
    langs = out["lang_pred"].value_counts().to_dict()
    assert langs == {"en": 4, "nl": 4}


def test_curate_and_export_end_to_end(ray_session, tmp_path):
    """crawl -> curate -> packed shards on disk, one call."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    from blacklab_ray.pipelines.curate import curate_and_export

    docs = pa.table({
        "doc_id": pa.array(list(range(4)), pa.int64()),
        "text": pa.array([EN, EN, EN + " tail doc", "spam " * 60]),
    })
    ds = ray.data.from_arrow(docs).repartition(2)
    stats = curate_and_export(
        ds, str(tmp_path), seq_len=16, seqs_per_shard=2,
        vocab_size=40, quality_thresholds=TH, scrub_pii=False)
    assert stats["n_curated_docs"] == 2  # dup + spam dropped
    man = json.load(open(os.path.join(str(tmp_path), "manifest.json")))
    files = sorted(glob.glob(os.path.join(str(tmp_path),
                                          "shard-*.parquet")))
    assert len(files) == man["n_shards"] > 0
    total = sum(pq.read_metadata(f).num_rows for f in files)
    assert total == man["n_sequences"]
    assert man["total_tokens"] == stats["total_tokens"] > 0


def test_curate_url_blocklist(ray_session):
    """Stage -2: blocked hosts/patterns drop pages before anything
    else sees them — including the HTML extractor."""
    body = ("<p>" + EN + ".</p>"
            "<p>Another proper sentence with enough words!</p>"
            "<p>Third full sentence with enough words here?</p>")
    pages = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "url": pa.array([
            "https://good.example/a",
            "https://www.Spam.example/page",     # blocked host
            "https://good.example/casino/x",     # blocked pattern
            "https://fine.example/b",
        ]),
        # distinct bodies so exact dedup keeps all survivors
        "html": pa.array([
            "<html><body><p>variant %d here.</p>%s</body></html>"
            % (i, body) for i in range(4)]),
    })
    ds = ray.data.from_arrow(pages).repartition(2)
    out = curate(ds, blocked_hosts=("spam.example",),
                 blocked_patterns=(r"/casino/",),
                 from_html=True, languages=("en",),
                 quality_thresholds=TH, scrub_pii=False).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 3]


def test_curate_from_html_and_c4(ray_session):
    # crawl front end: raw pages in, curated text out. Page 0 survives
    # (3 proper sentences after line filtering); page 1 dies at the C4
    # page gate (lorem ipsum); page 2's only block is boilerplate.
    good_body = ("<p>" + EN + ".</p>"
                 "<p>Another proper sentence with enough words!</p>"
                 "<p>Third full sentence with enough words here?</p>")
    pages = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "html": pa.array([
            "<html><head><title>A</title><script>x()</script></head>"
            "<body><nav>menu</nav>" + good_body + "</body></html>",
            "<html><body>" + good_body +
            "<p>see lorem ipsum dolor sit amet today.</p></body></html>",
            "<html><body><footer>" + EN + ".</footer></body></html>",
        ]),
    })
    ds = ray.data.from_arrow(pages).repartition(2)
    out = curate(ds, from_html=True, c4=True, languages=("en",),
                 quality_thresholds=TH).to_pandas()
    assert out["doc_id"].tolist() == [0]
    t = out.loc[0, "text"]
    assert "menu" not in t and "x()" not in t
    assert t.startswith(EN + ".")
    assert "Third full sentence" in t


def test_curate_semi_join_path_matches_broadcast(corpus, monkeypatch):
    """Forcing every keep/drop filter onto the co-partitioned
    semi-join (BROADCAST_ID_LIMIT=0) changes nothing — the 10^12-doc
    path and the broadcast path are the same operator."""
    import blacklab_ray.pipelines.curate as cur

    kw = dict(languages=("en",), quality_thresholds=TH)
    base = curate(corpus, **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    monkeypatch.setattr(cur, "BROADCAST_ID_LIMIT", 0)
    out = curate(corpus, **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.equals(base)
    assert base["doc_id"].tolist() == [0, 4]


def test_curate_near_dup_semi_join_path(ray_session, monkeypatch):
    """near_dup drop ids flow through the anti-join path when forced
    past the broadcast limit, with identical survivors."""
    import blacklab_ray.pipelines.curate as cur

    base_doc = EN + " unique tail number {}"
    near = EN + " extra words appended here to make a near dup {}"
    docs = pa.table({
        "doc_id": pa.array(list(range(4)), pa.int64()),
        "text": pa.array([
            base_doc.format(1), near.format(1),
            near.format(1) + " x", base_doc.format(99) + " y z w",
        ]),
    })
    ds = ray.data.from_arrow(docs).repartition(2)
    kw = dict(languages=None, quality_thresholds=TH, scrub_pii=False,
              near_dup=True, near_dup_threshold=0.7)
    base = curate(ds, **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    monkeypatch.setattr(cur, "BROADCAST_ID_LIMIT", 0)
    out = curate(ds, **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.equals(base)
    assert len(base) < 4   # the near-dup stage actually dropped docs
