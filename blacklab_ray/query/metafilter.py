"""Typed metadata fields + typed document filters.

The reference types every metadata field as TOKENIZED, NUMERIC or
UNTOKENIZED (indexmetadata/FieldType.java:5-7) and routes query
semantics by type: tokenized fields match analyzed terms, untokenized
fields match the exact stored string, numeric fields support
equality/range queries (Lucene NumericDocValues). Here the declared
types live in ``meta.json["metadata_fields"]`` (written by
``build_index`` from ``BuildParams.metadata_fields``) and
``filter_docs_meta`` evaluates a conjunction of typed conditions into a
doc-id array for ``search_filtered``'s broadcast semi-join
(SpanQueryFiltered.java:23).

Scale shape: one column-pruned Arrow dataset scan over ``fwd`` reading
only ``doc_id`` + the referenced fields; numeric and untokenized
equality/range predicates are pushed down to the Parquet reader
(row-group pruning), tokenized matches run as vectorized kernels per
batch. Nothing materializes beyond the matching doc ids.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pa_ds

# implicit built-in fields every index carries
_BUILTIN_TYPES = {
    "lang": "untokenized",
    "url": "untokenized",
    "doc_len": "numeric",
    "norm": "numeric",
}

_VALID_TYPES = ("tokenized", "numeric", "untokenized")


class FieldTypeError(ValueError):
    """Condition operator incompatible with the field's declared type."""


def metadata_field_types(reader) -> dict[str, str]:
    """Declared type per metadata field (built-ins + meta.json)."""
    out = dict(_BUILTIN_TYPES)
    out.update(reader.meta.get("metadata_fields", {}))
    return out


def _analyze_tokens(values: pa.Array) -> pa.Array:
    """list<string> of analyzed tokens per value (the standard
    analyzer's normalization: lowercase + accent strip + [a-z0-9]+)."""
    from blacklab_ray.analysis.analyzers import _normalize_array
    return pc.split_pattern_regex(_normalize_array(values),
                                  pattern="[^a-z0-9]+")


def _check(field: str, ftype: str, op: str) -> None:
    ok = {
        "tokenized": {"contains", "in"},
        "untokenized": {"=", "in"},
        "numeric": {"=", "in", "range"},
    }[ftype]
    if op not in ok:
        raise FieldTypeError(
            f"op {op!r} not valid for {ftype} field {field!r} "
            f"(allowed: {sorted(ok)})")


def filter_docs_meta(reader, conditions: list[tuple],
                     batch_size: int = 65536) -> np.ndarray:
    """Doc ids matching ALL typed conditions.

    Each condition is ``(field, op, value)``:

    - ``("=", v)`` — exact value (untokenized string / numeric)
    - ``("in", [v, ...])`` — any-of; for tokenized fields each v is an
      analyzed token
    - ``("contains", tok)`` — tokenized: analyzed token present
    - ``("range", (lo, hi))`` — numeric, inclusive both ends
    """
    types = metadata_field_types(reader)
    fields = []
    pushdown = None
    post: list[tuple] = []
    for field, op, value in conditions:
        ftype = types.get(field)
        if ftype is None:
            raise KeyError(f"unknown metadata field {field!r}; declared: "
                           f"{sorted(types)}")
        _check(field, ftype, op)
        fields.append(field)
        if ftype in ("numeric", "untokenized"):
            f = pc.field(field)
            if op == "=":
                expr = f == value
            elif op == "in":
                expr = f.isin(list(value))
            else:
                lo, hi = value
                expr = (f >= lo) & (f <= hi)
            pushdown = expr if pushdown is None else (pushdown & expr)
        else:
            toks = ([value] if op == "contains"
                    else [str(v) for v in value])
            post.append((field, toks))
    ds = pa_ds.dataset(os.path.join(reader.index_dir, "fwd"),
                       format="parquet")
    cols = ["doc_id"] + sorted({f for f, _ in post})
    out: list[np.ndarray] = []
    for batch in ds.to_batches(columns=cols, filter=pushdown,
                               batch_size=batch_size):
        if batch.num_rows == 0:
            continue
        tbl = pa.Table.from_batches([batch])
        mask = None
        for field, toks in post:
            analyzed = _analyze_tokens(tbl.column(field).combine_chunks())
            flat = pc.list_flatten(analyzed)
            parents = pc.list_parent_indices(analyzed).to_numpy(
                zero_copy_only=False)
            eq = pc.is_in(flat, value_set=pa.array(toks)).to_numpy(
                zero_copy_only=False)
            m = np.zeros(tbl.num_rows, dtype=bool)
            m[parents[eq]] = True
            mask = m if mask is None else (mask & m)
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        out.append(ids if mask is None else ids[mask])
    if not out:
        return np.empty(0, dtype=np.int64)
    ids = np.unique(np.concatenate(out))
    live = reader.mask_tombstones(ids)
    return ids[live]
