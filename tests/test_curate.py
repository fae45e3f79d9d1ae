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
    assert list(out.columns) == ["doc_id", "text"]


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
