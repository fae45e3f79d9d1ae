"""Process-step chains, token offsets, punctuation capture, highlight."""

import pyarrow as pa
import pytest


def test_process_steps_vectorized(ray_session):
    import ray.data

    from blacklab_ray.stages.process import apply_process_steps
    tbl = pa.table({
        "title": pa.array(["  The Fox ", None, "x"], pa.string()),
        "date": pa.array(["2020/01/02", "1999/12/31", "2001/06/07"]),
        "pos": pa.array(["NOU-C(number=sg)", "VRB", "ADJ"], pa.string()),
    })
    steps = [
        ("title", "strip", {}),
        ("title", "default", {"value": "untitled"}),
        ("title", "lower", {}),
        ("date", "replace", {"pattern": "/", "replacement": "-"}),
        ("date", "split", {"separator": "-", "keep": 0}),
        ("pos", "replace", {"pattern": r"\(.*\)", "replacement": ""}),
        ("pos", "mapvalues", {"mapping": {"NOU-C": "noun",
                                          "VRB": "verb"},
                              "default": "other"}),
    ]
    out = apply_process_steps(ray.data.from_arrow(tbl), steps) \
        .take_all()
    assert [r["title"] for r in out] == ["the fox", "untitled", "x"]
    assert [r["date"] for r in out] == ["2020", "1999", "2001"]
    assert [r["pos"] for r in out] == ["noun", "verb", "other"]
    with pytest.raises(Exception):
        apply_process_steps(ray.data.from_arrow(tbl),
                            [("nope", "lower", {})]).take_all()


def test_token_offsets_and_punct():
    from blacklab_ray.analysis.analyzers import tokenize_text
    from blacklab_ray.stages.offsets import punct_between, token_offsets
    text = "The quick, brown fox! (It jumps.)"
    offs = token_offsets(text)
    toks = tokenize_text(text)
    assert len(offs) == len(toks)
    for (s, e), tok in zip(offs, toks):
        assert text[s:e].lower() == tok
    punct = punct_between(text)
    assert len(punct) == len(toks) + 1
    # punct + tokens tile the display text exactly
    rebuilt = "".join(p + text[s:e]
                      for p, (s, e) in zip(punct, offs)) + punct[-1]
    assert rebuilt == text


def test_token_offsets_stage(ray_session):
    import ray.data

    from blacklab_ray.stages.offsets import TokenOffsets
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["a b c", ""], pa.string())})
    out = ray.data.from_arrow(tbl).map_batches(
        TokenOffsets(punct=True), batch_format="pyarrow").take_all()
    assert [o["start"] for o in out[0]["offsets"]] == [0, 2, 4]
    assert out[0]["punct"] == ["", " ", " ", ""]
    assert out[1]["offsets"] == []


def test_highlight():
    from blacklab_ray.stages.offsets import highlight
    text = "the quick brown fox jumps"
    assert highlight(text, [(1, 3)]) == "the <hl>quick brown</hl> fox jumps"
    # overlapping spans merge; multiple spans; span at end
    assert highlight(text, [(0, 1), (3, 5), (4, 5)]) == \
        "<hl>the</hl> quick brown <hl>fox jumps</hl>"
    assert highlight("", [(0, 1)]) == ""
