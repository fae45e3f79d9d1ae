"""Golden-file comparison tests — the reference's saved-responses pattern
(test/data/saved-responses, SURVEY §5): committed expected outputs the
engine must reproduce exactly."""

import hashlib
import json
import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_extraction_matches_golden_hashes():
    from blacklab_ray.sources.synth import generate_pages
    from blacklab_ray.stages.extract import extract_text
    with open(os.path.join(GOLDEN, "extracted_sha256.json")) as f:
        expected = json.load(f)
    pages = generate_pages(200)
    got = {}
    for url, html in zip(pages["url"].to_pylist(),
                         pages["html"].to_pylist()):
        if url in expected:
            got[url] = hashlib.sha256(
                extract_text(html).encode()).hexdigest()
    assert got == expected


def test_topk_matches_golden(small_index):
    from blacklab_ray.query import IndexReader, search
    with open(os.path.join(GOLDEN, "topk.json")) as f:
        golden = json.load(f)
    reader = IndexReader(small_index)
    for q in golden:
        for algo in ("taat", "wand", "maxscore"):
            if q["mode"] == "and" and algo != "taat":
                continue
            res = search(reader, q["terms"], k=q["k"], mode=q["mode"],
                         algo=algo)
            got = [{"doc_id": d, "rank": r + 1}
                   for r, d in enumerate(res["doc_id"].to_pylist())]
            exp = [{"doc_id": e["doc_id"], "rank": e["rank"]}
                   for e in q["results"]]
            assert got == exp, (q["qid"], algo)
            for g, e in zip(res["score"].to_pylist(), q["results"]):
                assert abs(g - e["score"]) < 1e-6, (q["qid"], algo)
