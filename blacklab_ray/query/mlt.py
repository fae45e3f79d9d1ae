"""More-like-this: find documents similar to a seed document.

The Lucene MoreLikeThis analogue (not in BlackLab proper — Lucene's
queries module ships it and BLS users reach it through Solr/ES):
extract the seed doc's most distinctive terms by TF·IDF against the
corpus stats, then run the engine's BM25 OR query over them. Fully
deterministic: term selection ties break lexicographically, so the
result is reproducible and oracle-checkable against the pure-Python
corpus model.

Scale shape: ONE pruned fwd gather for the seed doc's (term, tf) rows
(doc_id-filtered read, never a corpus scan), one terms-table stat
lookup for its distinct terms, then a normal top-k search — the whole
operator costs one extra gather over a plain query. Works unchanged
over a federated ``MultiIndexReader`` (global df/n_docs are exact
there by construction).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def seed_terms(reader, doc_id: int, max_terms: int = 25,
               min_term_len: int = 2,
               stop_df_ratio: float = 0.5) -> list[str]:
    """The seed doc's top ``max_terms`` terms by TF·IDF.

    ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))`` (the engine's BM25
    idf); terms in more than ``stop_df_ratio`` of all docs are skipped
    (MLT's classic stopword guard — their idf is near zero anyway, and
    dropping them keeps the OR query short), as are terms shorter than
    ``min_term_len``. Ties break on (score desc, term asc)."""
    if not reader.mask_tombstones(np.array([int(doc_id)],
                                           np.int64))[0]:
        raise KeyError(f"doc {doc_id} is deleted")
    tbl = reader.fwd_dataset().to_table(
        columns=["doc_id", "terms", "tfs"],
        filter=pc.field("doc_id") == int(doc_id))
    if tbl.num_rows == 0:
        raise KeyError(f"doc {doc_id} not in index")
    terms = tbl["terms"][0].as_py()
    tfs = tbl["tfs"][0].as_py()
    stats = reader.term_stats(terms)
    n = reader.n_docs
    scored = []
    for t, tf in zip(terms, tfs):
        if len(t) < min_term_len:
            continue
        df, _ctf = stats.get(t, (0, 0))
        if df == 0 or df > stop_df_ratio * n:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        scored.append((-tf * idf, t))
    scored.sort()
    return [t for _s, t in scored[:max_terms]]


def more_like_this(reader, doc_id: int, k: int = 10,
                   max_terms: int = 25, exclude_self: bool = True,
                   algo: str = "auto",
                   resolve_urls: bool = False) -> pa.Table:
    """Top-``k`` docs most similar to ``doc_id``: BM25 OR over the
    seed's ``seed_terms``. ``exclude_self`` drops the seed from the
    results (it always scores at/near the top)."""
    from blacklab_ray.query.engine import search
    terms = seed_terms(reader, doc_id, max_terms=max_terms)
    if not terms:
        cols = {"doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
                "rank": pa.array([], pa.int64())}
        if resolve_urls:
            # keep the schema identical to the non-empty path
            cols["url"] = pa.array([], pa.string())
        return pa.table(cols)
    res = search(reader, terms, k=k + (1 if exclude_self else 0),
                 mode="or", algo=algo, resolve_urls=resolve_urls)
    if exclude_self:
        keep = pc.not_equal(res["doc_id"], pa.scalar(int(doc_id),
                                                     pa.int64()))
        res = res.filter(keep).slice(0, k)
        # re-rank after the drop
        res = res.set_column(
            res.schema.get_field_index("rank"), "rank",
            pa.array(np.arange(1, res.num_rows + 1), res["rank"].type))
    return res
