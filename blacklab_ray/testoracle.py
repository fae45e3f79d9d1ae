"""Pure-Python single-process corpus oracle for golden comparisons.

Mirrors the reference's test strategy (SURVEY §5): BlackLab pins golden
responses against a live server (test/data/saved-responses) and exact
stats against a tiny hand-built corpus (TestIndex). Here the oracle is an
independent, loop-based implementation — no numpy scoring shortcuts, no
shared code with the engine's decode path beyond the tokenizer and the
SmallFloat quantizer (which ARE the spec) — so an engine bug can't cancel
itself out in the comparison.
"""

from __future__ import annotations

import collections
import math
from dataclasses import dataclass

import pyarrow as pa

from blacklab_ray.analysis.analyzers import tokenize_text
from blacklab_ray.codec.smallfloat import byte4_to_int, int_to_byte4
from blacklab_ray.query.bm25 import B, K1
from blacklab_ray.stages.tokenize import hash64


@dataclass
class CorpusOracle:
    docs: dict[int, list[str]]          # doc_id -> token stream
    urls: dict[int, str]

    @classmethod
    def from_pages(cls, pages: pa.Table,
                   id_column: str = "url") -> "CorpusOracle":
        docs, urls = {}, {}
        texts = pages["text"].to_pylist()
        if id_column == "doc_id":
            ids = pages["doc_id"].to_pylist()
            ulist = (pages["url"].to_pylist() if "url" in pages.column_names
                     else [str(i) for i in ids])
        else:
            ulist = pages["url"].to_pylist()
            ids = [hash64(u) for u in ulist]
        for did, url, text in zip(ids, ulist, texts):
            docs[did] = tokenize_text(text)
            urls[did] = url
        return cls(docs, urls)

    # ---- stats ----------------------------------------------------------

    @property
    def n_docs(self) -> int:
        return len(self.docs)

    @property
    def avgdl(self) -> float:
        return sum(len(t) for t in self.docs.values()) / max(len(self.docs),
                                                             1)

    def doc_freq(self) -> dict[str, int]:
        df: collections.Counter = collections.Counter()
        for toks in self.docs.values():
            df.update(set(toks))
        return dict(df)

    def collection_tf(self) -> dict[str, int]:
        ctf: collections.Counter = collections.Counter()
        for toks in self.docs.values():
            ctf.update(toks)
        return dict(ctf)

    # ---- BM25 top-k -----------------------------------------------------

    def topk(self, terms: list[str], k: int, mode: str = "or",
             quantize: bool = True) -> list[tuple[int, float]]:
        terms = list(dict.fromkeys(terms))
        df = self.doc_freq()
        n, avgdl = self.n_docs, self.avgdl
        out = []
        for did, toks in self.docs.items():
            cnt = collections.Counter(toks)
            present = [t for t in terms if cnt.get(t)]
            if not present:
                continue
            if mode == "and" and len(present) < len(terms):
                continue
            dl = byte4_to_int(int_to_byte4(len(toks))) if quantize \
                else len(toks)
            score = 0.0
            for t in present:
                tf = cnt[t]
                tidf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                score += tidf * tf / (tf + K1 * (1 - B + B * dl / avgdl))
            out.append((did, score))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]

    # ---- phrase ---------------------------------------------------------

    def phrase_docs(self, phrase: list[str]) -> dict[int, int]:
        out = {}
        n = len(phrase)
        for did, toks in self.docs.items():
            c = sum(1 for i in range(len(toks) - n + 1)
                    if toks[i:i + n] == phrase)
            if c:
                out[did] = c
        return out
