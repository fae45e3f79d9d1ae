"""Gopher-style repetition signals + quality filter
(pipelines/textstats.py RepetitionStats / quality_filter)."""

import pyarrow as pa
import pytest
import ray.data

from blacklab_ray.pipelines import textstats


@pytest.fixture(scope="module")
def rep_ds(ray_session):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            # clean: no repeated lines, no dominant bigram, no runs
            "the quick brown fox jumps over a lazy dog near the river",
            # token run: 'spam' x5
            "intro spam spam spam spam spam outro words here",
            # duplicate lines: 'buy now' twice out of 3 lines
            "buy now\nunique line here\nbuy now",
            # dominant bigram 'click here' 4x in 10 tokens
            "click here click here click here click here wow now",
        ]),
    })
    return ray.data.from_arrow(docs).repartition(2)


def test_repetition_scores(rep_ds):
    t = textstats.repetition_scores(rep_ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert t["max_token_run"].tolist() == [1, 5, 1, 1]
    # doc 2: 2 of 3 lines are duplicated occurrences
    assert t["dup_line_frac"].round(6).tolist() == [0.0, 0.0,
                                                    round(2 / 3, 6), 0.0]
    # doc 3: bigram 'click here' occurs 4x over 10 tokens -> 0.8
    assert t.loc[3, "top_bigram_frac"] == pytest.approx(0.8)
    # doc 1: 'spam spam' occurs 4x over 9 tokens -> 8/9
    assert t.loc[1, "top_bigram_frac"] == pytest.approx(8 / 9)
    # doc 0 has 12 tokens, 'the' twice but no repeated bigram
    assert t.loc[0, "top_bigram_frac"] == pytest.approx(2 / 12)


def test_repetition_single_token_docs(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["word", ""]),
    }))
    t = textstats.repetition_scores(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert t["max_token_run"].tolist() == [1, 0]
    assert t["top_bigram_frac"].tolist() == [0.0, 0.0]
    assert t["dup_line_frac"].tolist() == [0.0, 0.0]


def test_quality_filter_keep_decision(ray_session):
    good = ("this is a perfectly reasonable document with the kind of "
            "sentence structure and stopword density that a quality "
            "filter should keep around for training ") * 3
    spam = "buy now " * 60
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([good, spam, "too short"]),
    }))
    t = textstats.quality_filter(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert bool(t.loc[0, "keep"]) is True
    # spam: top bigram 'buy now'/'now buy' dominates -> dropped
    assert bool(t.loc[1, "keep"]) is False
    # too short: token_count < 50 -> dropped
    assert bool(t.loc[2, "keep"]) is False
    # audit columns all present
    for c in ("token_count", "stopword_ratio", "mean_token_len",
              "alpha_ratio", "dup_line_frac", "top_bigram_frac",
              "max_token_run"):
        assert c in t.columns


def test_quality_filter_threshold_override(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["five small words of text"]),
    }))
    t = textstats.quality_filter(
        ds, thresholds={"min_tokens": 3, "min_alpha_ratio": 0.0,
                        "min_mean_token_len": 0.0,
                        # 5 tokens: any bigram is 2/5 of the doc
                        "max_top_bigram_frac": 1.0}).to_pandas()
    assert bool(t.loc[0, "keep"]) is True
