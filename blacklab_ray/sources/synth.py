"""Deterministic synthetic Common-Crawl-style web-page corpus.

Implements the FIXTURES.md §1 spec: Parquet pages with columns
``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)`` — the BASELINE.json ``input_hint`` schema. The ``text``
column is the byte-identical extraction oracle: ``extract(html) == text``
must hold per url (mirrors the reference's golden-response test pattern,
test/data/saved-responses, and TestIndex's fixed tiny corpus,
core/src/test/java/nl/inl/blacklab/testutil/TestIndex.java:117-170).

Zipf-skewed vocabulary with stopwords at the head creates the hot-term
posting skew the engine's salted shuffle must handle.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from blacklab_ray.analysis.analyzers import STOPWORDS

VOCAB_SIZE = 50_000
ZIPF_S = 1.07
SEED = 42

# ~1% of tokens get an accented/case variant to exercise normalization.
_VARIANTS = {
    "the": "Thé", "of": "Of", "and": "AND", "a": "á", "in": "ïn",
    "is": "Is", "to": "tô", "it": "ít",
}


def _vocab() -> list[str]:
    return STOPWORDS + [f"w{i:06d}" for i in range(VOCAB_SIZE - len(STOPWORDS))]


def _zipf_probs(n: int, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


# --- four-doc micro fixture (BlackLab TestIndex analogue) -------------------

PANGRAM4 = [
    ("u0", "the quick brown fox jumps over the lazy dog ."),
    ("u1", "noot mier aap mier mier mier noot noot aap aap aap aap"),
    ("u2", "may the force be with you ."),
    ("u3", "to find or not to find . that is the question ."),
]


def pangram4_table() -> pa.Table:
    """The 4-doc hand-checkable corpus as a pages-schema Arrow table."""
    urls = [u for u, _ in PANGRAM4]
    texts = [t for _, t in PANGRAM4]
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array([0] * 4, pa.timestamp("us")),
        "html": pa.array([t.encode() for t in texts], pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 4, pa.string()),
    })


# --- page HTML template -----------------------------------------------------

_BOILERPLATE = (
    '<div class="nav"><a href="/">home</a> <a href="/about">about</a></div>'
)
_FOOTER = '<div class="footer">copyright example site</div>'


def render_html(title: str, paragraphs: list[str]) -> bytes:
    body = "".join(f"<p>{p}</p>" for p in paragraphs)
    return (
        f"<html><head><title>{title}</title></head><body>"
        f"{_BOILERPLATE}{body}{_FOOTER}</body></html>"
    ).encode("utf-8")


def expected_text(title: str, paragraphs: list[str]) -> str:
    return "\n".join([title] + paragraphs)


def generate_pages(n_docs: int, seed: int = SEED,
                   doc_offset: int = 0) -> pa.Table:
    """Generate ``n_docs`` deterministic pages (rows doc_offset..+n_docs).

    ``doc_offset`` lets shards be generated independently and identically
    regardless of how many workers generate them (per-doc RNG streams).
    """
    vocab = np.array(_vocab())
    probs = _zipf_probs(len(vocab))
    urls, stamps, htmls, texts, langs = [], [], [], [], []
    for seq in range(doc_offset, doc_offset + n_docs):
        rng = np.random.default_rng((seed, seq))  # per-doc stream: shard-stable
        n_tok = int(np.clip(np.exp(rng.normal(np.log(400), 0.8)), 20, 5000))
        idx = rng.choice(len(vocab), size=n_tok, p=probs)
        toks = vocab[idx].tolist()
        # ~1% accent/case variants
        flips = rng.random(n_tok) < 0.01
        toks = [_VARIANTS.get(t, t.upper() if (f and t not in _VARIANTS) else t)
                if f else t for t, f in zip(toks, flips)]
        title = " ".join(toks[: min(8, n_tok)])
        body = toks[min(8, n_tok):]
        # paragraphs of 40-60 tokens
        paragraphs = []
        i = 0
        while i < len(body):
            step = 40 + int(rng.integers(0, 21))
            paragraphs.append(" ".join(body[i:i + step]))
            i += step
        site = int(rng.integers(0, 1000))
        urls.append(f"https://site{site:04d}.example/p{seq}")
        stamps.append(1704067200_000000 + seq * 1_000_000)  # 2024-01-01 + seq s
        htmls.append(render_html(title, paragraphs))
        texts.append(expected_text(title, paragraphs))
        langs.append("nl" if rng.random() < 0.05 else "en")
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(stamps, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def write_pages_corpus(out_dir: str, n_docs: int, n_shards: int = 4,
                       seed: int = SEED) -> list[str]:
    """Write a sharded pages corpus; one parquet file per shard. Idempotent."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    per = (n_docs + n_shards - 1) // n_shards
    for s in range(n_shards):
        lo = s * per
        hi = min(n_docs, lo + per)
        if lo >= hi:
            break
        path = os.path.join(out_dir, f"pages-{s:04d}.parquet")
        paths.append(path)
        if os.path.exists(path):
            continue
        tbl = generate_pages(hi - lo, seed=seed, doc_offset=lo)
        pq.write_table(tbl, path + ".tmp")
        os.replace(path + ".tmp", path)
    return paths
