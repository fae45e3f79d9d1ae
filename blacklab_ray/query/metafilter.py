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


def _norm_cond(field: str, ftype: str, op: str, value):
    """Resolve one typed condition to ``(kind, data, pushdown_expr)``:
    ``kind`` selects the per-batch mask kernel, ``pushdown_expr`` is an
    EQUIVALENT Parquet pushdown expression when one exists (=/in/range
    on numeric/untokenized fields)."""
    _check(field, ftype, op)
    if ftype in ("numeric", "untokenized") and op != "wildcard":
        f = pc.field(field)
        if op == "=":
            return "=", value, f == value
        if op == "in":
            return "in", list(value), f.isin(list(value))
        lo, hi = value
        return "range", (lo, hi), (f >= lo) & (f <= hi)
    if op == "wildcard":
        # Lucene WildcardQuery: full-value match on untokenized
        # fields (raw, case-sensitive), any-analyzed-token match on
        # tokenized (terms are lowercased by the analyzer)
        rx = _wildcard_rx(value.lower() if ftype == "tokenized"
                          else value)
        kind = "tok_rx" if ftype == "tokenized" else "raw_rx"
        return kind, f"^(?:{rx})$", None
    if op == "phrase":
        return "phrase", value, None
    # tokenized contains / in: analyze the QUERY side too (Lucene's
    # parser analyzes query terms): 'Fox' matches the token 'fox'
    raw = ([str(value)] if op == "contains"
           else [str(v) for v in value])
    analyzed = _analyze_tokens(pa.array(raw)).to_pylist()
    toks = [t for sub in analyzed for t in sub if t]
    if op == "contains" and len(toks) > 1:
        # one term that analyzes to several tokens ('dog-days') is an
        # adjacency match, like Lucene's analyzed phrase
        return "phrase", " ".join(toks), None
    return "tokens", toks, None


def _cond_mask(tbl: pa.Table, field: str, kind: str,
               data) -> np.ndarray:
    """Vectorized boolean mask for one normalized condition over one
    scanned batch."""
    if kind == "pid_ids":
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        return np.isin(ids, data)
    col = tbl.column(field).combine_chunks()
    if kind == "=":
        m = pc.equal(col, data)
    elif kind == "in":
        m = pc.is_in(col, value_set=pa.array(data, col.type))
    elif kind == "range":
        lo, hi = data
        m = pc.and_(pc.greater_equal(col, lo), pc.less_equal(col, hi))
    elif kind == "raw_rx":
        m = pc.match_substring_regex(col, pattern=data)
    elif kind == "phrase":
        # analyzed-token adjacency: match the phrase inside the
        # space-joined analyzed token stream
        joined = pc.binary_join(_analyze_tokens(col), " ")
        toks = [t for t in _analyze_tokens(
            pa.array([data]))[0].as_py() if t]
        if not toks:
            return np.zeros(tbl.num_rows, dtype=bool)
        rx = r"(?:^| )" + r" ".join(
            _re.escape(t) for t in toks) + r"(?: |$)"
        m = pc.match_substring_regex(joined, pattern=rx)
    else:  # tok_rx / tokens: any analyzed token matches
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
                data, pa.string())).to_numpy(zero_copy_only=False)
        out = np.zeros(tbl.num_rows, dtype=bool)
        out[parents[eq]] = True
        return out
    return m.fill_null(False).to_numpy(zero_copy_only=False)


def _scan_ids(reader, cols: list, pushdown, eval_mask,
              batch_size: int = 65536) -> np.ndarray:
    """ONE pruned scan over the fwd dataset; ``eval_mask(tbl) ->
    bool mask | None`` selects rows per batch. Returns live doc ids."""
    ds = pa_ds.dataset(os.path.join(reader.index_dir, "fwd"),
                       format="parquet")
    out: list[np.ndarray] = []
    for batch in ds.to_batches(columns=cols, filter=pushdown,
                               batch_size=batch_size):
        if batch.num_rows == 0:
            continue
        tbl = pa.Table.from_batches([batch])
        mask = eval_mask(tbl)
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        out.append(ids if mask is None else ids[mask])
    if not out:
        return np.empty(0, dtype=np.int64)
    ids = np.unique(np.concatenate(out))
    live = reader.mask_tombstones(ids)
    return ids[live]


def filter_docs_meta(reader, conditions: list[tuple],
                     batch_size: int = 65536) -> np.ndarray:
    """Doc ids matching ALL typed conditions.

    Each condition is ``(field, op, value)``:

    - ``("=", v)`` — exact value (untokenized string / numeric)
    - ``("in", [v, ...])`` — any-of; for tokenized fields each v is an
      analyzed token
    - ``("contains", tok)`` — tokenized: analyzed token present
    - ``("range", (lo, hi))`` — inclusive both ends (numeric, or
      string TermRangeQuery on untokenized fields)
    - ``("wildcard", v)`` / ``("phrase", v)`` — Lucene wildcard /
      analyzed-phrase matches

    Pushdown-expressible conds prune at the Parquet reader; the rest
    evaluate as vectorized per-batch kernels. ONE scan total."""
    types = metadata_field_types(reader)
    pushdown = None
    post: list[tuple] = []
    for field, op, value in conditions:
        ftype = types.get(field)
        if ftype is None:
            raise KeyError(f"unknown metadata field {field!r}; declared: "
                           f"{sorted(types)}")
        kind, data, expr = _norm_cond(field, ftype, op, value)
        if expr is not None:
            pushdown = expr if pushdown is None else (pushdown & expr)
        else:
            post.append((field, kind, data))

    def eval_mask(tbl):
        mask = None
        for field, kind, data in post:
            m = _cond_mask(tbl, field, kind, data)
            mask = m if mask is None else (mask & m)
        return mask

    cols = ["doc_id"] + sorted({f for f, _k, _d in post})
    return _scan_ids(reader, cols, pushdown, eval_mask, batch_size)


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
    """Evaluate a parsed filter tree to a doc-id array in ONE pruned
    scan: every leaf becomes a vectorized per-batch mask and the tree
    combines masks row-wise (AND/OR/NOT are numpy boolean algebra —
    NOT never materializes the corpus universe, which matters at
    10^12 docs). A NECESSARY-condition Parquet expression derived
    from the tree (AND of whatever conjuncts are pushdown-expressible;
    OR only when every branch is) prunes row groups before the mask
    pass. ``pid`` leaves resolve via ``pid_resolver(pids: list) ->
    ids`` (url lookup, batched and cached by the caller)."""
    types = metadata_field_types(reader)

    # resolve leaves: ("mask", field, kind, data, pushdown|None)
    pid_vals: list[str] = []

    def compile_node(n):
        kind = n[0]
        if kind == "leaf":
            _k, field, rawval = n
            if field == "pid" and pid_resolver is not None:
                pid_vals.append(rawval.strip('"'))
                return ("pid", rawval.strip('"'))
            ftype = types.get(field)
            if ftype is None:
                raise KeyError(
                    f"unknown metadata field {field!r}; declared: "
                    f"{sorted(types)}")
            f, op, value = _leaf_cond(field, rawval, ftype)
            mkind, data, expr = _norm_cond(f, ftype, op, value)
            return ("mask", f, mkind, data, expr)
        if kind == "not":
            return ("not", compile_node(n[1]))
        return (kind, [compile_node(c) for c in n[1]])

    tree = compile_node(node)
    pid_ids = (pid_resolver(sorted(set(pid_vals)))
               if pid_vals else None)
    pid_set: dict = {}
    if pid_vals:
        # per-pid ids for leaf masks (resolver caches, so re-asking
        # per distinct pid costs no extra scan)
        for pv in set(pid_vals):
            pid_set[pv] = pid_resolver([pv])

    def necessary(n):
        """A Parquet expression IMPLIED by the subtree (or None)."""
        kind = n[0]
        if kind == "mask":
            return n[4]
        if kind == "pid":
            return pc.field("url") == n[1]
        if kind == "not":
            return None
        parts = [necessary(c) for c in n[1]]
        if kind == "and":
            parts = [e for e in parts if e is not None]
            if not parts:
                return None
            out = parts[0]
            for e in parts[1:]:
                out = out & e
            return out
        # or: only valid if EVERY branch has a necessary expr
        if any(e is None for e in parts):
            return None
        out = parts[0]
        for e in parts[1:]:
            out = out | e
        return out

    def fields_of(n, acc):
        kind = n[0]
        if kind == "mask":
            acc.add(n[1])
        elif kind in ("and", "or"):
            for c in n[1]:
                fields_of(c, acc)
        elif kind == "not":
            fields_of(n[1], acc)
        return acc

    def ev_mask(tbl, n):
        kind = n[0]
        if kind == "mask":
            return _cond_mask(tbl, n[1], n[2], n[3])
        if kind == "pid":
            ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
            return np.isin(ids, pid_set[n[1]])
        if kind == "not":
            return ~ev_mask(tbl, n[1])
        parts = [ev_mask(tbl, c) for c in n[1]]
        return (np.logical_and.reduce(parts) if kind == "and"
                else np.logical_or.reduce(parts))

    # pure-pid fast path: the resolver already did the pruned lookup
    if tree[0] == "pid":
        return pid_ids
    cols = ["doc_id"] + sorted(fields_of(tree, set()))
    return _scan_ids(reader, cols, necessary(tree),
                     lambda tbl: ev_mask(tbl, tree))
