"""Doc-level result-set operators (DocResults analogues).

BlackLab's DocResults supports group/sort/window/filter/sample over the
per-document result set (search/results/DocResults.java:254-473).
Grouping and sorting were already expressed directly as Dataset
groupby/sort; these add the remaining two as named operators:

- ``docs_window``: pagination window [first, first+number) over a
  sorted doc set (DocResults.window:398). Windows are pagination-sized;
  the sort is the distributed step, the slice is driver-side.
- ``sample_docs``: deterministic seeded sampling by doc id
  (DocResults.sample:473 / SampleParameters.java:9) using the md5-low64
  predicate — partition-order independent and SQL-reproducible (same
  scheme as hit sampling).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def docs_window(ds: ray.data.Dataset, sort_cols: list[str],
                descending: list[bool], first: int,
                number: int) -> pa.Table:
    """Rows [first, first+number) of the doc set sorted by sort_cols."""
    out = ds.sort(sort_cols, descending=descending).limit(first + number)
    tbl = pa.Table.from_pylist(out.take_all())
    return tbl.slice(first, number)


def sample_docs(ds: ray.data.Dataset, frac: float, seed: int = 29,
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Keep a doc iff md5_low64(f"{id}:{seed}") mod 2^20 < frac*2^20."""
    from blacklab_ray.pipelines.hits import md5_low64
    # round, don't truncate: DuckDB's CAST(frac * 1048576 AS BIGINT)
    # rounds half-away-from-zero, so int() truncation puts a boundary
    # doc on the wrong side of the oracle (ADVICE r2 #4)
    thresh = int(round(frac * (1 << 20)))

    def _filt(batch: pa.Table) -> pa.Table:
        keep = [md5_low64(f"{d}:{seed}") % (1 << 20) < thresh
                for d in batch.column(id_col).to_pylist()]
        return batch.filter(pa.array(keep))

    return ds.map_batches(_filt, batch_format="pyarrow")
