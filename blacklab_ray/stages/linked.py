"""Linked-document metadata join (DocIndexerBase linked docs analogue).

The reference fetches a metadata document referenced by the content
document and attaches its fields (linkedFileDirs resolution,
engine/src/main/java/nl/inl/blacklab/index/IndexerImpl.java:566-579;
MetadataFetcher.java). The Ray-native shape is a broadcast small-side
hash join: the metadata table is ``ray.put`` ONCE and looked up inside
``map_batches`` — never re-shipped per batch, never shuffled (SURVEY
§2.8 "linked-document metadata join at index time").
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data


class LinkedMetadataJoin:
    """map_batches task: left-join broadcast metadata onto each batch."""

    def __init__(self, side_ref, on: str):
        self._ref = side_ref
        self._on = on
        self._side: pa.Table | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._side is None:
            self._side = ray.get(self._ref)
        # order-preserving left join: tag rows, hash-join, re-sort
        import numpy as np
        tagged = batch.append_column(
            "__row", pa.array(np.arange(batch.num_rows), pa.int64()))
        joined = tagged.join(self._side, keys=self._on,
                             join_type="left outer")
        joined = joined.sort_by("__row")
        return joined.drop_columns(["__row"])


def join_linked_metadata(ds: ray.data.Dataset, side: pa.Table,
                         on: str = "url") -> ray.data.Dataset:
    """Attach linked-document metadata columns to every page row.

    ``side`` must be small enough to broadcast (metadata tables are);
    duplicate join keys in ``side`` raise (one linked doc per page,
    the reference's resolution contract)."""
    import pyarrow.compute as pc
    n_uniq = pc.count_distinct(side[on]).as_py()
    if n_uniq != side.num_rows:
        raise ValueError(
            f"linked metadata has duplicate {on!r} keys "
            f"({side.num_rows - n_uniq} extra rows)")
    ref = ray.put(side)
    return ds.map_batches(LinkedMetadataJoin(ref, on),
                          batch_format="pyarrow")
