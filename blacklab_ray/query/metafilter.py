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
    analyzer's normalization: lowercase + accent strip + [a-z0-9]+).
    Edge separators are trimmed first so values with leading/trailing
    punctuation don't produce empty edge tokens (which would break
    phrase adjacency and in-set matching)."""
    from blacklab_ray.analysis.analyzers import _normalize_array
    norm = pc.replace_substring_regex(
        _normalize_array(values),
        pattern="^[^a-z0-9]+|[^a-z0-9]+$", replacement="")
    return pc.split_pattern_regex(norm, pattern="[^a-z0-9]+")


def _check(field: str, ftype: str, op: str) -> None:
    ok = {
        "tokenized": {"contains", "in", "wildcard", "phrase"},
        "untokenized": {"=", "in", "wildcard", "range"},
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
        if ftype in ("numeric", "untokenized") and op != "wildcard":
            f = pc.field(field)
            if op == "=":
                expr = f == value
            elif op == "in":
                expr = f.isin(list(value))
            else:
                lo, hi = value
                expr = (f >= lo) & (f <= hi)
            pushdown = expr if pushdown is None else (pushdown & expr)
        elif op == "wildcard":
            # Lucene WildcardQuery: full-value match on untokenized
            # fields (raw, case-sensitive), any-analyzed-token match
            # on tokenized (terms are lowercased by the analyzer)
            rx = _wildcard_rx(value.lower() if ftype == "tokenized"
                              else value)
            post.append((field, "tok_rx" if ftype == "tokenized"
                         else "raw_rx", f"^(?:{rx})$"))
        elif op == "phrase":
            post.append((field, "phrase", value))
        else:
            # analyze the QUERY side too (Lucene's parser analyzes
            # query terms): 'Fox' matches the lowercased token 'fox'
            raw = ([str(value)] if op == "contains"
                   else [str(v) for v in value])
            analyzed = _analyze_tokens(pa.array(raw)).to_pylist()
            toks = [t for sub in analyzed for t in sub if t]
            if op == "contains" and len(toks) > 1:
                # one term that analyzes to several tokens
                # ('dog-days') is an adjacency match, like Lucene's
                # analyzed phrase
                post.append((field, "phrase", " ".join(toks)))
            else:
                post.append((field, "tokens", toks))
    ds = pa_ds.dataset(os.path.join(reader.index_dir, "fwd"),
                       format="parquet")
    cols = ["doc_id"] + sorted({f for f, _k, _d in post})
    out: list[np.ndarray] = []
    for batch in ds.to_batches(columns=cols, filter=pushdown,
                               batch_size=batch_size):
        if batch.num_rows == 0:
            continue
        tbl = pa.Table.from_batches([batch])
        mask = None
        for field, kind, data in post:
            col = tbl.column(field).combine_chunks()
            if kind == "raw_rx":
                m = pc.match_substring_regex(
                    col, pattern=data).fill_null(False).to_numpy(
                    zero_copy_only=False)
            elif kind == "phrase":
                # analyzed-token adjacency: match the phrase inside
                # the space-joined analyzed token stream
                joined = pc.binary_join(_analyze_tokens(col), " ")
                toks = [t for t in _analyze_tokens(
                    pa.array([data]))[0].as_py() if t]
                if not toks:
                    m = np.zeros(tbl.num_rows, dtype=bool)
                else:
                    rx = r"(?:^| )" + r" ".join(
                        _re.escape(t) for t in toks) + r"(?: |$)"
                    m = pc.match_substring_regex(
                        joined,
                        pattern=rx).fill_null(False).to_numpy(
                        zero_copy_only=False)
            else:
                analyzed = _analyze_tokens(col)
                flat = pc.list_flatten(analyzed)
                parents = pc.list_parent_indices(analyzed).to_numpy(
                    zero_copy_only=False)
                if kind == "tok_rx":
                    eq = pc.match_substring_regex(
                        flat, pattern=data).fill_null(False).to_numpy(
                        zero_copy_only=False)
                else:
                    eq = pc.is_in(flat, value_set=pa.array(
                        data)).to_numpy(zero_copy_only=False)
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


# ---------------------------------------------------------------------------
# Lucene-ish filter EXPRESSIONS (BLS ``filterlang=luceneql``)
# ---------------------------------------------------------------------------
# The reference parses the ``filter`` parameter with Lucene's classic
# QueryParser (LuceneUtil.parseLuceneQuery, engine/src/main/java/nl/inl/
# util/LuceneUtil.java:56, leading wildcards allowed). The subset here:
# ``field:value`` / ``field:"quoted phrase"`` / ``field:[lo TO hi]``
# clauses combined with AND/OR/NOT (also &&, ||, !), parenthesized
# groups, and * / ? wildcards in values. Pure conjunctions evaluate in
# ONE pruned scan; OR/NOT combine doc-id sets.

import re as _re

_F_TOKEN_RE = _re.compile(r'''\s*(?:
      (?P<lp>\()
    | (?P<rp>\))
    | (?P<op_and>AND\b|&&)
    | (?P<op_or>OR\b|\|\|)
    | (?P<op_not>NOT\b|!)
    | (?P<clause>(?P<field>[\w.\-]+)\s*:\s*
        (?P<val>"[^"]*"|\[[^\]]*\]|[^\s()]+))
    )''', _re.VERBOSE)

_F_RANGE_RE = _re.compile(r"^\[(\S+)\s+TO\s+(\S+)\]$")


def parse_filter_expr(expr: str):
    """Parse a filter expression into a tree:
    ``("leaf", field, rawval)`` | ``("and"|"or", [nodes])`` |
    ``("not", node)``. Operator precedence NOT > AND > OR (Lucene
    classic). Bare terms without a field raise (no default field)."""
    toks: list[tuple] = []
    pos = 0
    while pos < len(expr):
        m = _F_TOKEN_RE.match(expr, pos)
        if not m or m.end() == pos:
            if expr[pos:].strip() == "":
                break
            raise ValueError(f"bad filter syntax at {expr[pos:]!r}")
        pos = m.end()
        if m.group("clause"):
            toks.append(("leaf", m.group("field"), m.group("val")))
        elif m.group("lp"):
            toks.append(("lp",))
        elif m.group("rp"):
            toks.append(("rp",))
        elif m.group("op_and"):
            toks.append(("and",))
        elif m.group("op_or"):
            toks.append(("or",))
        else:
            toks.append(("not",))
    if not toks:
        raise ValueError("empty filter expression")
    i = 0

    def peek():
        return toks[i][0] if i < len(toks) else None

    def or_expr():
        nodes = [and_expr()]
        while peek() == "or":
            nonlocal i
            i += 1
            nodes.append(and_expr())
        return nodes[0] if len(nodes) == 1 else ("or", nodes)

    def and_expr():
        nonlocal i
        nodes = [unary()]
        while True:
            if peek() == "and":
                i += 1
                nodes.append(unary())
            elif peek() in ("not", "leaf", "lp"):
                # juxtaposition: Lucene's default-OR is a common source
                # of silent surprises; require an explicit operator
                raise ValueError(
                    "missing AND/OR between filter clauses")
            else:
                break
        return nodes[0] if len(nodes) == 1 else ("and", nodes)

    def unary():
        nonlocal i
        k = peek()
        if k == "not":
            i += 1
            return ("not", unary())
        if k == "lp":
            i += 1
            e = or_expr()
            if peek() != "rp":
                raise ValueError("unbalanced '(' in filter")
            i += 1
            return e
        if k == "leaf":
            node = toks[i]
            i += 1
            return node
        raise ValueError("expected a filter clause")

    tree = or_expr()
    if i != len(toks):
        raise ValueError("trailing tokens in filter expression")
    return tree


def _wildcard_rx(value: str) -> str:
    return "".join(".*" if c == "*" else "." if c == "?"
                   else _re.escape(c) for c in value)


def _num(field: str, v: str):
    try:
        return float(v) if "." in v else int(v)
    except ValueError:
        raise FieldTypeError(
            f"non-numeric value {v!r} for numeric "
            f"field {field!r}") from None


def _leaf_cond(field: str, rawval: str, ftype: str) -> tuple:
    """Resolve a raw clause value to a typed (field, op, value) cond
    (Lucene semantics: quoted → phrase/exact term, [a TO b] → range
    — numeric, or a string TermRangeQuery on untokenized fields —
    * ? → WildcardQuery)."""
    m = _F_RANGE_RE.match(rawval)
    if m:
        lo, hi = m.group(1), m.group(2)
        if ftype == "untokenized":
            return (field, "range", (lo, hi))
        return (field, "range", (_num(field, lo), _num(field, hi)))
    if rawval.startswith('"'):
        v = rawval[1:-1]
        if ftype == "tokenized":
            return (field, "phrase", v)
        if ftype == "numeric":
            return (field, "=", _num(field, v))
        return (field, "=", v)
    if "*" in rawval or "?" in rawval:
        return (field, "wildcard", rawval)
    if ftype == "numeric":
        return (field, "=", _num(field, rawval))
    if ftype == "tokenized":
        return (field, "contains", rawval)
    return (field, "=", rawval)


def eval_filter_expr(reader, node, pid_resolver=None) -> np.ndarray:
    """Evaluate a parsed filter tree to a doc-id array. ``pid``
    leaves resolve via ``pid_resolver(pids: list) -> ids`` (url
    lookup — list-valued so N pid clauses in one conjunction batch
    into one scan). AND groups of plain leaves run as ONE
    ``filter_docs_meta`` scan; ``a AND NOT b`` subtracts without
    materializing the universe; a bare NOT complements against all
    live doc ids."""
    types = metadata_field_types(reader)

    def resolve(field, rawval):
        if field == "pid" and pid_resolver is not None:
            return None  # handled by caller
        ftype = types.get(field)
        if ftype is None:
            raise KeyError(
                f"unknown metadata field {field!r}; declared: "
                f"{sorted(types)}")
        return _leaf_cond(field, rawval, ftype)

    def ev(n) -> np.ndarray:
        kind = n[0]
        if kind == "leaf":
            _k, field, rawval = n
            if field == "pid" and pid_resolver is not None:
                return pid_resolver([rawval.strip('"')])
            return filter_docs_meta(reader, [resolve(field, rawval)])
        if kind == "not":
            return np.setdiff1d(reader.all_doc_ids(), ev(n[1]))
        children = n[1]
        if kind == "or":
            sets = [ev(c) for c in children]
            return np.unique(np.concatenate(sets)) if sets \
                else np.empty(0, np.int64)
        # and: one scan for the plain-leaf conjuncts, then intersect
        # subtree results and subtract NOT children
        leaf_conds, pids, subs, negs = [], [], [], []
        for c in children:
            if c[0] == "leaf" and c[1] == "pid" \
                    and pid_resolver is not None:
                pids.append(c[2].strip('"'))
            elif c[0] == "leaf":
                leaf_conds.append(resolve(c[1], c[2]))
            elif c[0] == "not":
                negs.append(c[1])
            else:
                subs.append(c)
        ids = None
        if leaf_conds:
            ids = filter_docs_meta(reader, leaf_conds)
        if pids:
            # multiple pid conds union (any-of), resolved in ONE
            # batched lookup, like the pre-tree _allowed_ids
            p = pid_resolver(pids)
            ids = p if ids is None else np.intersect1d(ids, p)
        for s in subs:
            e = ev(s)
            ids = e if ids is None else np.intersect1d(ids, e)
        if ids is None:
            ids = reader.all_doc_ids()
        for g in negs:
            ids = np.setdiff1d(ids, ev(g))
        return ids

    return ev(node)
