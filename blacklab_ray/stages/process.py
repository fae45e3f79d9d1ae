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


# ---------------------------------------------------------------------------
# scalar step chains — the .blf.yaml `process:` blocks applied during
# config-driven extraction (DocIndexerConfig.processString /
# processStringMultipleValues, DocIndexerConfig.java:174-221,283-369)
# ---------------------------------------------------------------------------

import re as _re

_JAVA_GROUP_RE = _re.compile(r"\$(\d)")
_MAIN_POS_RE = _re.compile(r"^([^(]+)(\s*\(.*\))?$")
_FEATURE_RE = _re.compile(r"^[^(]+(\s*\((.*)\))?$")


def parse_part_of_speech(result: str, field: str = "_") -> str:
    """opParsePartOfSpeech (DocIndexerConfig.java:375-391,
    TestProcessingOperations.java): 'NOU-C(gender=f,number=pl)' with
    field '_' → 'NOU-C', field 'gender' → 'f', unknown field → ''."""
    result = result.strip()
    if field == "_":
        m = _MAIN_POS_RE.match(result)
        return m.group(1) if m else result
    m = _FEATURE_RE.match(result)
    feats = (m.group(2) or "") if m else result
    for feat in feats.split(","):
        kv = feat.split("=")
        if kv[0].strip() == field and len(kv) > 1:
            return kv[1].strip()
    return ""


def _concat_date(prm: dict, get_field) -> str:
    """opConcatDate (DocIndexerConfig.java:412-432): yyyymmdd from
    three metadata fields, month/day autofilled and clamped to the
    start or end of their valid range."""
    import calendar
    yf, mf, df = (prm.get("yearField"), prm.get("monthField"),
                  prm.get("dayField"))
    mode = str(prm.get("autofill", "")).lower()
    if not (yf and mf and df) or mode not in ("start", "end"):
        raise ValueError(
            "concatDate needs parameters yearField, monthField, "
            "dayField, and autofill ('start' or 'end')")
    start = mode == "start"

    def num(name):
        vals = get_field(name)
        try:
            return int(vals[0])
        except (ValueError, TypeError, IndexError):
            return None
    y, m, d = num(yf), num(mf), num(df)
    if y is None:
        return ""
    if m is None or m > 12 or m < 1:
        m = 1 if start else 12
    max_day = calendar.monthrange(y, m)[1]
    if d is None or d > max_day or d < 1:
        d = 1 if start else max_day
    return f"{y:04d}{m:02d}{d:02d}"


def apply_steps_value(value: str, steps, get_field=None) -> list[str]:
    """One extracted value through a config ``process:`` chain;
    returns the value list (``split`` can multiply values — the first
    is the primary). ``get_field(name) -> list[str]`` resolves
    metadata references (append/default ``field:``, concatDate)."""
    if get_field is None:
        def get_field(_name):
            return []
    vals = [value if value is not None else ""]
    for op, prm in steps:
        if op == "replace":
            find, repl = prm.get("find"), prm.get("replace")
            if find is None or repl is None:
                raise ValueError(
                    "replace needs parameters find and replace")
            rx = _re.compile(find)
            repl = _JAVA_GROUP_RE.sub(r"\\\1", repl)
            vals = [rx.sub(repl, v) for v in vals]
        elif op == "default":
            field = prm.get("field")
            sep = prm.get("separator", ";")
            dv = (sep.join(get_field(field)) if field
                  else prm.get("value"))
            if dv is not None:
                vals = [v if v else str(dv) for v in vals]
        elif op == "append":
            sep = prm.get("separator", " ")
            field = prm.get("field")
            av = (sep.join(get_field(field)) if field
                  else prm.get("value"))
            if av:
                vals = [(v + sep + str(av)) if v else str(av)
                        for v in vals]
        elif op == "split":
            sep = prm.get("separator", ";")
            keep = str(prm.get("keep", "-1")).lower()
            out: list[str] = []
            for v in vals:
                parts = _re.split(sep, v)
                if keep == "all":
                    out.extend(parts)
                elif keep == "both":
                    out.append(v)
                    out.extend(parts)
                else:
                    try:
                        i = int(keep)
                    except ValueError:
                        i = -1
                    if i < 0:
                        i = 0
                    out.append(parts[i] if i < len(parts) else "")
            vals = out
        elif op == "strip":
            chars = prm.get("chars", " ")
            vals = [v.strip(chars) for v in vals]
        elif op == "parsePos":
            field = prm.get("field", "_")
            vals = [parse_part_of_speech(v, field) for v in vals]
        elif op == "chatFormatAgeToMonths":
            from blacklab_ray.stages.chat import age_to_months
            vals = [str(age_to_months(v) or "") for v in vals]
        elif op == "concatDate":
            s = _concat_date(prm, get_field)
            if s:
                vals[0] = s
        elif op == "mapvalues":
            mapping = prm.get("mapping") or {}
            vals = [mapping.get(v, v) for v in vals]
        else:
            raise ValueError(f"unknown processing step method {op!r}")
    return vals
