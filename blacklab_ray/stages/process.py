"""Config-driven value process steps (DocIndexerConfig analogue).

The reference applies declarative transform chains to extracted
annotation/metadata values — replace (regex), default, append, split,
strip, plus mapValues dict lookups
(engine/src/main/java/nl/inl/blacklab/indexers/config/
DocIndexerConfig.java:174-230, 283-360, opReplace :552). Here a step
chain is a list of ``(column, op, kwargs)`` applied as ONE vectorized
``map_batches`` stage (pyarrow.compute kernels throughout; mapvalues
uses dictionary-encoded lookup so the Python dict is consulted once per
unique value). This is also the convert/tag plugin slot of SURVEY §2.12:
any callable ``batch -> batch`` can be interposed the same way.

Supported ops:
  replace   kwargs: pattern, replacement       (regex, all occurrences)
  default   kwargs: value                      (fill nulls / empties)
  append    kwargs: value, separator=" "
  split     kwargs: separator, keep (int index or "all" -> list col)
  strip     kwargs: characters=None            (whitespace default)
  lower / upper
  mapvalues kwargs: mapping (dict), default=None (None -> keep as-is)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _apply_op(col: pa.ChunkedArray | pa.Array, op: str,
              kwargs: dict) -> pa.Array | pa.ChunkedArray:
    if op == "replace":
        return pc.replace_substring_regex(
            col, pattern=kwargs["pattern"],
            replacement=kwargs["replacement"])
    if op == "default":
        v = kwargs["value"]
        filled = pc.fill_null(col, v)
        return pc.if_else(pc.equal(filled, ""), v, filled)
    if op == "append":
        sep = kwargs.get("separator", " ")
        return pc.binary_join_element_wise(
            col.cast(pa.string()), pa.scalar(str(kwargs["value"])), sep)
    if op == "split":
        parts = pc.split_pattern(col, kwargs["separator"])
        keep = kwargs.get("keep", "all")
        if keep == "all":
            return parts
        return pc.list_element(parts, int(keep))
    if op == "strip":
        chars = kwargs.get("characters")
        if chars is None:
            return pc.utf8_trim_whitespace(col)
        return pc.utf8_trim(col, characters=chars)
    if op == "lower":
        return pc.utf8_lower(col)
    if op == "upper":
        return pc.utf8_upper(col)
    if op == "mapvalues":
        mapping = kwargs["mapping"]
        default = kwargs.get("default")
        d = pc.dictionary_encode(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray)
            else col)
        uniq = d.dictionary.to_pylist()
        mapped = pa.array(
            [mapping.get(u, u if default is None else default)
             if u is not None else None for u in uniq], pa.string())
        return pc.take(mapped, d.indices)
    raise ValueError(f"unknown process op {op!r}")


def process_batch(batch: pa.Table, steps: list[tuple]) -> pa.Table:
    """Apply a step chain to one Arrow batch (pure function)."""
    for column, op, kwargs in steps:
        if column not in batch.column_names:
            raise ValueError(f"process step references missing column "
                             f"{column!r}")
        idx = batch.schema.get_field_index(column)
        new = _apply_op(batch.column(column), op, dict(kwargs or {}))
        if isinstance(new, pa.ChunkedArray):
            new = new.combine_chunks()
        batch = batch.set_column(idx, column, new)
    return batch


def apply_process_steps(ds: ray.data.Dataset,
                        steps: list[tuple]) -> ray.data.Dataset:
    """One vectorized map_batches stage applying the whole chain."""
    return ds.map_batches(lambda b: process_batch(b, steps),
                          batch_format="pyarrow")
