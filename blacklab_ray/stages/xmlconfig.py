"""Config-driven XML extraction — the DocIndexerXPath analogue.

The reference's config-driven indexer (indexers/config/
DocIndexerXPath.java:53; config model ConfigInputFormat /
.blf.yaml files under core/src/main/resources/formats/) is driven by
a handful of paths: documentPath selects document roots, wordPath
selects token elements, valuePath extracts the word form, per-
annotation valuePaths extract lemma/pos/…, inline tags become
structural spans, and metadata paths fill document fields.

``XmlFormatConfig`` is that config object re-expressed for the
Ray-Data pipeline: an extraction config compiles to a pure
``map_batches`` function over batches of raw XML blobs producing the
canonical pages schema plus token-aligned annotation columns
(``list<string>``) and a standoff ``tags`` column — exactly the
input contract of TokenizeForwardIndex (stages/tokenize.py), so a
config-driven corpus builds with ``BuildParams(analyzer="whitespace",
annotations=(...))`` and queries with ``[lemma="…"]`` /
``within <s/>`` out of the box.

Path subset (vs full XPath; the DocIndexerSaxon analogue —
indexers/config/DocIndexerSaxon.java:30 pairs the same config model
with an XPath 3 engine): steps are matched by LOCAL NAME (TEI /
FoLiA / PageXML namespaces need no declaration), ``.//x`` and ``//x``
mean descendant, ``a/b`` child steps, ``*`` any element, ``..`` the
parent, ``@attr`` an attribute, ``a/@attr`` an attribute of a child,
``.`` the element's own text. Explicit axes are supported:
``child:: self:: parent:: ancestor[-or-self]:: descendant[-or-self]::
following-sibling:: preceding-sibling::`` (sibling/ancestor axes need
the parent map, available in all config extraction paths). Steps take
predicates: ``[@attr]``, ``[@attr='v']``, ``[not(@attr)]``,
``[child='v']``, positional ``[n]`` / ``[position()=n]`` (1-based),
``!= < > <= >=`` comparisons, ``and`` / ``or``, and string-function
calls — the shapes the shipped .blf.yaml files use (e.g.
``.//listBibl[@id='inlMetadata']``, ``../@type``) plus user-config
shapes. Value paths evaluate the XPath function subset concat,
substring(-before/-after), normalize-space, local-name, contains,
starts-with, ends-with, string-length, string, translate,
upper-case, lower-case, replace — nested calls allowed.
``|`` unions whole paths. ``metadata_foreach`` mirrors the config
model's forEachPath/namePath/valuePath dynamic metadata, with field
names DECLARED up front (``foreach_fields``) for a stable Arrow
schema — the reference imposes the same constraint on annotations
for the same reason (tei-p5.blf.yaml note). Anything fancier belongs
in a custom ``register_format`` reader.

Pre-tokenized formats pair with the whitespace analyzer (the
reference pairs them with BLWhitespaceAnalyzer for the same reason:
the token stream is the document's, not the tokenizer's).
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Mapping

import pyarrow as pa
import ray.data

__all__ = ["XmlFormatConfig", "extract_xml_config", "read_xml_config",
           "TAG_SPANS_TYPE", "BUILTIN_CONFIGS", "cmdi_config"]

TAG_SPANS_TYPE = pa.list_(pa.struct([
    ("name", pa.string()), ("start", pa.int32()),
    ("end", pa.int32()), ("attrs", pa.string())]))


@dataclass(frozen=True)
class XmlFormatConfig:
    """One .blf.yaml-shaped extraction config."""
    name: str
    document_path: str = "."        # element path selecting doc roots
    word_path: str | None = None    # token elements (pre-tokenized XML)
    word_value: str = "."           # word form relative to the token el
    annotations: Mapping[str, str] = field(default_factory=dict)
    inline_tags: tuple[str, ...] = ()   # element names → standoff spans
    metadata: Mapping[str, str] = field(default_factory=dict)
    doc_id_value: str | None = None     # pid path relative to doc root
    text_path: str | None = None        # non-tokenized text extraction
    # forEachPath/namePath/valuePath dynamic metadata (ConfigMetadata-
    # Block.java): tuples of (for_each_path, name_path, value_path);
    # discovered names land in meta_{name} for names in foreach_fields
    metadata_foreach: tuple = ()
    foreach_fields: tuple = ()      # declared dynamic field names
    # tokenIdPath + standoffAnnotations (ConfigStandoffAnnotations.java;
    # eaf/tcf.blf.yaml): token_id_path names each word element; each
    # standoff entry is (path, token_ref_path, {ann: value_path}) whose
    # refs (whitespace-separated id list, TCF @tokenIDs style) attach
    # values to the referenced token positions
    token_id_path: str | None = None
    standoff_annotations: tuple = ()
    # standoff SPAN annotations (ConfigStandoffAnnotations.java:21-36,
    # TestStandoffSpans.java; tei-standoff-spans.blf.yaml): entries
    # (path, span_start_path, span_end_path, end_inclusive,
    # span_name_path, {ann: value_path}). Start/end resolve through
    # the token-id map (word tokenIdPath AND inline-tag tokenIdPath
    # anchors); the span lands in the tags column with the
    # annotations as attributes. NOTE: with end_inclusive=False the
    # end ref's own position IS the exclusive end — the semantics
    # TestStandoffSpans.java:86 asserts as correct (the reference's
    # implementation has a known off-by-one there, annotated "FAILS,
    # actually 3, but that's wrong"; we implement the asserted
    # behavior).
    standoff_spans: tuple = ()
    # inline-tag local name → tokenIdPath: the tag registers a token
    # id for the CURRENT position when opened (anchor/@synch in
    # tei-standoff-spans.blf.yaml — a zero-length position marker
    # standoff spans can reference)
    inline_tag_id_paths: Mapping[str, str] = field(default_factory=dict)
    # captureValuePaths (ConfigAnnotation.java:55-56,
    # DocIndexerXPath.java:693-702): per word element, each capture
    # path evaluates to a string substituted for $1..$9 in the
    # annotation's valuePath BEFORE it is evaluated. Keyed by
    # annotation name; the main word annotation uses key "".
    annotation_captures: Mapping[str, tuple] = field(
        default_factory=dict)
    # config `process:` chains (DocIndexerConfig.processString /
    # processStringMultipleValues): key "" = the main word
    # annotation, annotation name for extras, "meta:<name>" for
    # metadata fields. Steps are (action, params) tuples evaluated
    # by stages.process.apply_steps_value.
    processes: Mapping[str, tuple] = field(default_factory=dict)
    # convert/tag plugin chain (DocIndexerConvertAndTag.java:35 —
    # a format's convertPlugin/tagPlugin keys): plugin NAMES from
    # stages/convert.py applied to each file's bytes before XML
    # parsing (convert first, then tag)
    convert_plugin: "str | None" = None
    tag_plugin: "str | None" = None
    # annotations declaring multipleValues: a process split on the
    # MAIN word annotation indexes values[1:] at the same token
    # position (position-increment 0, testformat.blf.yaml's
    # 'The|DOH|ZZZ'); the extraction output gains a `multi`
    # list<struct<pos,value>> column
    multivalue_annotations: frozenset = frozenset()
    # (parent_annot, foreach_path, name_path, value_path): per-word
    # dynamic subannotation fill — the value lands in the DECLARED
    # annotation named parent_<name> (folia:feat @subset/@class)
    subannotation_foreach: tuple = ()
    # punctPath analogue (tei-p5.blf.yaml: .//text()[not(ancestor::w)]
    # = all text nodes not inside a word element): True captures
    # inter-word XML text into a ``punct`` column, punct-before-each-
    # word convention (len = n_tokens + 1), matching
    # stages/offsets.punct_between
    capture_punct: bool = False


def _local(tag) -> str:
    """Local name of an ElementTree tag ('{ns}w' → 'w')."""
    if not isinstance(tag, str):
        return ""                       # comments / PIs
    return tag.rsplit("}", 1)[-1]


_STEP_RE = re.compile(
    r"^(?:([a-z-]+)::)?(\.\.|\*|[\w:-]+)((?:\[[^\]]*\])*)$")
_PRED_RE = re.compile(r"\[([^\]]*)\]")

_AXES = ("child", "self", "parent", "ancestor", "ancestor-or-self",
         "descendant", "descendant-or-self", "following-sibling",
         "preceding-sibling")


def _parse_step(step: str):
    """'axis::name[@a='v'][2]' → (axis|None, name, [predicate, ...])."""
    m = _STEP_RE.match(step)
    if m is None:
        raise ValueError(f"unsupported path step: {step!r}")
    axis = m.group(1)
    if axis is not None and axis not in _AXES:
        raise ValueError(f"unsupported axis: {axis!r}")
    name = m.group(2)
    if name not in ("..", "*") and ":" in name:
        # namespace-prefixed step ('folia:w'): match by LOCAL name —
        # element tags are compared via _local, and the shipped
        # configs' prefixes all resolve to the document's own default
        # namespace, so local-name matching is equivalent
        name = name.rsplit(":", 1)[-1]
    return axis, name, _PRED_RE.findall(m.group(3))


def _axis_candidates(el, axis: str | None, parents: dict | None):
    """Candidate elements of one axis step (document order; reversed
    for the preceding/ancestor axes, per XPath proximity order)."""
    if axis in (None, "child"):
        return list(el)
    if axis == "self":
        return [el]
    if axis == "parent":
        p = (parents or {}).get(el)
        return [] if p is None else [p]
    if axis in ("ancestor", "ancestor-or-self"):
        out = [el] if axis.endswith("-or-self") else []
        p = (parents or {}).get(el)
        while p is not None:
            out.append(p)
            p = (parents or {}).get(p)
        return out
    if axis == "descendant":
        return [x for x in el.iter() if x is not el]
    if axis == "descendant-or-self":
        return list(el.iter())
    # sibling axes
    p = (parents or {}).get(el)
    if p is None:
        return []
    kids = list(p)
    i = next(j for j, k in enumerate(kids) if k is el)
    return kids[i + 1:] if axis == "following-sibling" \
        else kids[i - 1::-1]


_CMP_RE = re.compile(r"^(.*?)\s*(!=|>=|<=|=|>|<)\s*(.*)$")


def _pred_ok(el, pred: str, pos: int,
             parents: dict | None = None) -> bool:
    """Evaluate one step predicate: position, existence, (in)equality
    and order comparisons, boolean and/or, not(), and string-function
    calls (contains/starts-with/... via the _eval_func subset)."""
    pred = pred.strip()
    if " or " in pred:
        return any(_pred_ok(el, p, pos, parents)
                   for p in pred.split(" or "))
    if " and " in pred:                         # [not(*) and text()]
        return all(_pred_ok(el, p, pos, parents)
                   for p in pred.split(" and "))
    if pred.isdigit():                          # [n] — 1-based position
        return pos == int(pred)
    neg = False
    if pred.startswith("not(") and pred.endswith(")"):
        neg, pred = True, pred[4:-1].strip()
    if pred == "*":                             # any element child
        return (len(el) > 0) != neg
    if pred == "text()":                        # non-empty text content
        return bool(_text_of(el)) != neg
    m = _CMP_RE.match(pred)
    if m is not None:
        lhs, op, rhs = m.group(1).strip(), m.group(2), m.group(3).strip()
        lv = str(pos) if lhs == "position()" else _value(el, lhs, parents)
        rv = str(pos) if rhs == "position()" else _value(el, rhs, parents)
        if op in ("=", "!="):
            ok = (lv == rv) if op == "=" else (lv != rv)
        else:
            try:
                ln, rn = float(lv), float(rv)
            except ValueError:
                return neg                       # non-numeric order cmp
            ok = {"<": ln < rn, ">": ln > rn,
                  "<=": ln <= rn, ">=": ln >= rn}[op]
        return ok != neg
    if pred.startswith("@"):
        ok = _attr_get(el, pred[1:]) is not None
    elif _FUNC_RE.match(pred):                  # [contains(@a,'x')] etc.
        ok = bool(_value(el, pred, parents))
    else:                                       # [child] existence
        ok = any(_local(c.tag) == pred for c in el)
    return ok != neg


_EXPR_TOPLEVEL_RE = re.compile(
    r"\s(\+|-|\*|div|mod|or|and)\s|[<>]|!=|="
    r"|\b(count|sum|number|boolean|position|last|floor|"
    r"ceiling|round|matches)\(")


def _outside_brackets(s: str) -> str:
    """The expression with bracketed predicates and quoted literals
    removed — operator sniffing must not fire on predicate contents
    (the subset evaluates those itself)."""
    out: list[str] = []
    depth = 0
    quote: str | None = None
    for ch in s:
        if quote:
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            continue
        if ch == "[":
            depth += 1
            continue
        if ch == "]":
            depth -= 1
            continue
        if depth == 0:
            out.append(ch)
    return "".join(out)


def _needs_full_engine(path: str) -> bool:
    """True when the expression uses operators/functions outside the
    subset — those must not be misread as odd attribute/element names
    (e.g. '@a + 1' is an arithmetic expression, not an attribute
    called 'a + 1')."""
    return _EXPR_TOPLEVEL_RE.search(_outside_brackets(path)) is not None


def _full_engine_nodes(el, path: str, parents: dict | None):
    """Route one expression through the grammar-based engine
    (stages/xpath.py), keeping only element nodes (the callers walk
    elements; attribute/text values resolve through _value)."""
    from blacklab_ray.stages import xpath
    out = xpath.evaluate_nodes(path, el, parents)
    return [n for n in out
            if not isinstance(n, (xpath.AttrNode, xpath.TextNode))]


def _iter_path(el, path: str, parents: dict | None = None):
    """Elements matching a path relative to ``el``. The tuned subset
    handles every shipped format's shapes; anything it cannot parse
    (arbitrary user-config XPath — the DocIndexerSaxon surface)
    delegates to the grammar-based engine in stages/xpath.py."""
    if _needs_full_engine(path):
        yield from _full_engine_nodes(el, path, parents)
        return
    try:
        results = []
        for alt in path.split("|"):
            results.extend(_iter_one_path(el, alt.strip(), parents))
    except ValueError:
        results = _full_engine_nodes(el, path, parents)
    yield from results


def _iter_one_path(el, path: str, parents: dict | None):
    if path in (".", ""):
        yield el
        return
    if path.startswith(".//"):
        descend, path = True, path[3:]
    elif path.startswith("//"):
        descend, path = True, path[2:]
    else:
        descend = False
        path = path[2:] if path.startswith("./") else path
    steps = [_parse_step(s) for s in path.split("/")]
    if descend:
        (_axis, first, preds), rest = steps[0], steps[1:]
        pos = 0
        for sub in el.iter():
            if sub is not el and (first == "*"
                                  or _local(sub.tag) == first):
                pos += 1
                if all(_pred_ok(sub, p, pos, parents) for p in preds):
                    yield from _walk_steps_from(sub, rest, parents)
    else:
        yield from _walk_steps_from(el, steps, parents)


def _walk_steps_from(el, steps, parents: dict | None = None):
    if not steps:
        yield el
        return
    (axis, first, preds), rest = steps[0], steps[1:]
    if first == "..":
        parent = (parents or {}).get(el)
        if parent is not None:
            yield from _walk_steps_from(parent, rest, parents)
        return
    pos = 0
    for cand in _axis_candidates(el, axis, parents):
        if first == "*" or _local(cand.tag) == first:
            pos += 1
            if all(_pred_ok(cand, p, pos, parents) for p in preds):
                yield from _walk_steps_from(cand, rest, parents)


def _text_of(el) -> str:
    return " ".join(s.strip() for s in el.itertext() if s.strip())


def _attr_get(el, name: str) -> str | None:
    """Attribute lookup tolerant of namespace prefixes: configs write
    ``@xml:id`` but ElementTree stores the key as
    ``{http://...}id`` — fall back to matching on the LOCAL attribute
    name (after ':' or '}') when the literal key is absent."""
    v = el.get(name)
    if v is not None:
        return v
    local = name.rsplit(":", 1)[-1]
    for k, v in el.attrib.items():
        if k.rsplit("}", 1)[-1] == local:
            return v
    return None


_FUNC_RE = re.compile(
    r"^(concat|substring-before|substring-after|substring|"
    r"normalize-space|local-name|contains|starts-with|ends-with|"
    r"string-length|string|translate|upper-case|lower-case|"
    r"replace)\((.*)\)$", re.S)


def _split_args(s: str) -> list[str]:
    """Split a function argument list on top-level commas (respecting
    quotes and nested parens)."""
    out, depth, start = [], 0, 0
    quote: str | None = None
    for i, ch in enumerate(s):
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    tail = s[start:]
    if tail.strip() or out:
        out.append(tail)
    return [a.strip() for a in out]


def _eval_func(el, name: str, argstr: str, parents) -> str:
    """XPath function subset for USER configs (VERDICT r3 #9;
    DocIndexerSaxon.java:30 value-path shapes): concat, substring
    (XPath 1-based), substring-before/-after, normalize-space,
    local-name, contains, starts-with, ends-with, string-length,
    string, translate, upper-case, lower-case, replace (XPath 2
    regex). Boolean functions return "true"/"" (XPath string-value of
    a boolean; predicates test non-emptiness). Arguments may be quoted
    literals, numbers, paths, or nested calls."""
    args = _split_args(argstr)

    def ev(a: str) -> str:
        return _value(el, a, parents)

    if name == "concat":
        return "".join(ev(a) for a in args)
    if name == "normalize-space":
        s = ev(args[0]) if args and args[0] else _text_of(el)
        return " ".join(s.split())
    if name == "string":
        return ev(args[0]) if args and args[0] else _text_of(el)
    if name == "contains":
        return "true" if ev(args[1]) in ev(args[0]) else ""
    if name == "starts-with":
        return "true" if ev(args[0]).startswith(ev(args[1])) else ""
    if name == "ends-with":
        return "true" if ev(args[0]).endswith(ev(args[1])) else ""
    if name == "string-length":
        s = ev(args[0]) if args and args[0] else _text_of(el)
        return str(len(s))
    if name == "upper-case":
        return ev(args[0]).upper()
    if name == "lower-case":
        return ev(args[0]).lower()
    if name == "translate":
        src, frm, to = ev(args[0]), ev(args[1]), ev(args[2])
        tbl = {ord(f): (to[i] if i < len(to) else None)
               for i, f in enumerate(frm)}
        return src.translate(tbl)
    if name == "substring-before":
        s, sep = ev(args[0]), ev(args[1])
        i = s.find(sep)
        return s[:i] if i >= 0 else ""
    if name == "substring-after":
        s, sep = ev(args[0]), ev(args[1])
        i = s.find(sep)
        return s[i + len(sep):] if i >= 0 else ""
    if name == "replace":
        return re.sub(ev(args[1]), ev(args[2]), ev(args[0]))
    if name == "local-name":
        if not args or not args[0]:
            return _local(el.tag)
        for sub in _iter_path(el, args[0], parents):
            return _local(sub.tag)
        return ""
    # substring(s, start[, len]) — XPath semantics: 1-based start
    s = ev(args[0]) if args else ""
    try:
        start = int(float(ev(args[1]))) if len(args) > 1 else 1
    except ValueError:
        return ""
    lo = max(0, start - 1)
    if len(args) > 2:
        try:
            length = int(float(ev(args[2])))
        except ValueError:
            return ""
        hi = max(lo, start - 1 + length)
        return s[lo:hi]
    return s[lo:]


def _value(el, path: str, parents: dict | None = None) -> str:
    """Resolve a value path: '.', '@attr', 'a/b', 'a/@attr', './/a',
    '../@attr' (parent axis needs ``parents``), quoted literals,
    numbers, and the concat/substring/normalize-space/local-name
    function subset (nested calls allowed). Expressions outside the
    subset (arithmetic, comparisons, count()/sum()/... — arbitrary
    user-config XPath) evaluate through stages/xpath.py."""
    path = path.strip().replace("attribute::", "@")
    if _needs_full_engine(path):
        from blacklab_ray.stages import xpath
        return xpath.evaluate_string(path, el, parents)
    try:
        return _value_subset(el, path, parents)
    except ValueError:
        from blacklab_ray.stages import xpath
        return xpath.evaluate_string(path, el, parents)


def _value_list(el, path: str, parents: dict | None = None) -> list:
    """ALL string values of a valuePath — the ``multipleValues: true``
    contract (DocIndexerConfig indexes every node the path matches;
    naf.blf.yaml's word_or_lemma ``.//text()|./@lemma`` yields the
    word form AND the lemma). Evaluated through the full engine so
    unions/text()/attribute node-sets enumerate in document order;
    non-node-set results collapse to their one string value."""
    from blacklab_ray.stages import xpath
    path = path.strip().replace("attribute::", "@")
    try:
        v = xpath.evaluate(path, el, parents)
    except Exception:
        return [_value(el, path, parents)]
    if isinstance(v, list):
        return [xpath.string_value(n) for n in v]
    return [xpath._to_string(v)]


def _value_subset(el, path: str, parents: dict | None = None) -> str:
    if path in (".", "text()"):
        return _text_of(el)
    if path == "local-name()":      # cmdi.blf.yaml namePath
        return _local(el.tag)
    if len(path) >= 2 and path[0] == path[-1] and path[0] in "'\"":
        return path[1:-1]           # quoted literal (function args)
    if re.fullmatch(r"-?\d+(\.\d+)?", path):
        return path                 # numeric literal (function args)
    m = _FUNC_RE.match(path)
    if m is not None:
        return _eval_func(el, m.group(1), m.group(2), parents)
    if "@" in path and "|" in _outside_brackets(path):
        # attribute unions ('@lemma | sib::join[...]/@lemma', the
        # nodups.blf.yaml shape) need XPath document-order union
        # semantics — out of subset
        raise ValueError("attribute union path")
    if path.startswith("@"):
        return _attr_get(el, path[1:]) or ""
    if "/@" in path:
        sub_path, attr = path.rsplit("/@", 1)
        for sub in _iter_path(el, sub_path, parents):
            return _attr_get(sub, attr) or ""
        return ""
    for sub in _iter_path(el, path, parents):
        return _text_of(sub)
    return ""


def _extract_doc(doc_el, cfg: XmlFormatConfig,
                 parents: dict | None = None):
    """One document element → (text, {ann: values}, tag_spans, meta)."""
    meta = {k: _value(doc_el, p, parents)
            for k, p in cfg.metadata.items()}
    # forEachPath/namePath/valuePath dynamic metadata: names resolved
    # per matched element (e.g. interpGrp/interp with namePath
    # ../@type); only DECLARED names become columns
    declared = set(cfg.foreach_fields)
    for fe_path, name_path, value_path in cfg.metadata_foreach:
        for m_el in _iter_path(doc_el, fe_path, parents):
            name = _value(m_el, name_path, parents)
            if name in declared and name not in meta:
                meta[name] = _value(m_el, value_path, parents)

    def get_field(name):
        """Metadata accessor for process-step field references."""
        v = meta.get(name, "")
        return [v] if v else []

    if cfg.processes:
        from blacklab_ray.stages.process import apply_steps_value
        for k in list(meta):
            msteps = cfg.processes.get(f"meta:{k}")
            if msteps:
                vals = apply_steps_value(meta[k], msteps, get_field)
                meta[k] = vals[0] if vals else ""
    if cfg.word_path is None:
        if cfg.text_path:
            parts = [_text_of(s) for s in _iter_path(doc_el,
                                                     cfg.text_path,
                                                     parents)]
            text = "\n".join(p for p in parts if p)
        else:
            text = _text_of(doc_el)
        return text, {}, [], meta, [], {}

    # full-path word selection (EAF's tier-predicated word path needs
    # more than a last-step match); the tree walk below preserves
    # document order and inline-tag nesting
    word_ids = {id(e) for e in _iter_path(doc_el, cfg.word_path,
                                          parents)}
    inline = set(cfg.inline_tags)
    words: list[str] = []
    anns: dict[str, list[str]] = {a: [] for a in cfg.annotations}
    for _, _, st_anns in cfg.standoff_annotations:
        for a in st_anns:
            anns.setdefault(a, [])
    spans: list[dict] = []
    tok_pos: dict[str, int] = {}    # token id → position (tokenIdPath)
    punct: list[str] = []           # punct BEFORE each word + trailing
    pbuf: list[str] = []

    def note_text(s):
        if s and s.strip():
            pbuf.append(s.strip())

    def subst_captures(el, aname: str, path: str) -> str:
        """$1..$9 substitution from the annotation's
        captureValuePaths, evaluated against the word element
        (DocIndexerXPath.java:693-702)."""
        caps = cfg.annotation_captures.get(aname)
        if not caps or "$" not in path:
            return path
        for i, cp in enumerate(caps, 1):
            path = path.replace(f"${i}", _value(el, cp, parents))
        return path

    multivals: list[dict] = []      # (pos, value) increment-0 extras
    # non-main annotations declaring multipleValues collect their
    # secondaries here (one list per annotation name)
    ann_multivals: dict[str, list] = {
        a: [] for a in cfg.multivalue_annotations if a}

    def walk(el):
        if id(el) in word_ids:
            w = _value(el, subst_captures(el, "", cfg.word_value),
                       parents)
            wsteps = cfg.processes.get("") if cfg.processes else None
            extra_word_vals: tuple = ()
            if wsteps:
                from blacklab_ray.stages.process import \
                    apply_steps_value
                vals = apply_steps_value(w, wsteps, get_field)
                w = vals[0] if vals else ""
                if "" in cfg.multivalue_annotations and len(vals) > 1:
                    # secondary values index at the SAME position
                    # (AnnotationWriter increment-0)
                    extra_word_vals = tuple(vals[1:])
            if cfg.token_id_path:
                tid = _value(el, cfg.token_id_path, parents)
                if tid:
                    tok_pos[tid] = len(words)
            if cfg.capture_punct:
                punct.append(" ".join(pbuf))
                pbuf.clear()
            # keep whitespace-analyzer alignment: a form may not
            # contain token separators
            words.append("_".join(w.split()) or "_")
            for ev in extra_word_vals:
                multivals.append({"pos": len(words) - 1,
                                  "value": "_".join(ev.split())})
            for a, p in cfg.annotations.items():
                # p None: declared subannotation with no valuePath —
                # filled by subannotation_foreach below or left ""
                multi = a in ann_multivals
                if multi and p:
                    # multipleValues: EVERY node the path matches is a
                    # value at this position (AnnotationWriter
                    # increment-0 secondaries on any annotation)
                    raw_vals = _value_list(
                        el, subst_captures(el, a, p), parents)
                else:
                    raw_vals = [_value(el, subst_captures(el, a, p),
                                       parents) if p else ""]
                asteps = (cfg.processes.get(a)
                          if cfg.processes else None)
                if asteps:
                    from blacklab_ray.stages.process import \
                        apply_steps_value
                    stepped: list = []
                    for rv in raw_vals:
                        stepped.extend(
                            apply_steps_value(rv, asteps, get_field))
                    raw_vals = stepped or [""]
                elif not raw_vals:
                    raw_vals = [""]
                v = raw_vals[0]
                # empty stays empty ("" = no value, the reference's
                # convention for e.g. a missing @lemma); only internal
                # whitespace is escaped (token alignment)
                anns[a].append("_".join(v.split()))
                if multi:
                    for ev in raw_vals[1:]:
                        ev = "_".join(ev.split())
                        if ev:
                            ann_multivals[a].append(
                                {"pos": len(words) - 1, "value": ev})
            for parent, fe_path, name_path, value_path in \
                    cfg.subannotation_foreach:
                for m_el in _iter_path(el, fe_path, parents):
                    nm = _value(m_el, name_path, parents)
                    key = f"{parent}_{nm}"
                    if key in anns:    # only DECLARED names
                        v = _value(m_el, value_path, parents)
                        anns[key][-1] = "_".join(v.split())
            return
        opened = None
        if _local(el.tag) in inline:
            idp = cfg.inline_tag_id_paths.get(_local(el.tag))
            if idp:
                # position-marker tag (anchor/@synch): its id refers
                # to the position of the NEXT token
                tid = _value(el, idp, parents)
                if tid:
                    tok_pos[tid] = len(words)
            opened = {"name": _local(el.tag), "start": len(words),
                      "attrs": ";".join(
                          f"{_local(k)}={v}"
                          for k, v in sorted(el.attrib.items()))}
        if cfg.capture_punct:
            note_text(el.text)
        for child in el:
            walk(child)
            if cfg.capture_punct:
                note_text(child.tail)
        if opened is not None:
            opened["end"] = len(words)
            if opened["end"] > opened["start"]:
                spans.append(opened)

    walk(doc_el)
    if cfg.capture_punct:
        punct.append(" ".join(pbuf))    # trailing text
        pbuf.clear()
        anns["punct"] = punct
    # standoff SPAN annotations → tag spans, start/end resolved
    # through the token-id map (words and anchors both register ids)
    for sp_path, p_start, p_end, inclusive, name_path, sp_anns in \
            cfg.standoff_spans:
        for sp_el in _iter_path(doc_el, sp_path, parents):
            s = tok_pos.get(_value(sp_el, p_start, parents))
            e = tok_pos.get(_value(sp_el, p_end, parents))
            if s is None or e is None:
                continue                # unresolvable ref: skip span
            if inclusive:
                e += 1                  # end ref = LAST token inside
            nm = (_value(sp_el, name_path, parents)
                  if name_path else "") or "span"
            if e > s:
                spans.append({
                    "name": nm, "start": s, "end": e,
                    "attrs": ";".join(
                        f"{a}={_value(sp_el, vp, parents)}"
                        for a, vp in sorted(sp_anns.items()))})
    # standoff annotations attach by token reference after the walk
    for st_path, ref_path, st_anns in cfg.standoff_annotations:
        filled = {a: ["_"] * len(words) for a in st_anns}
        for el in _iter_path(doc_el, st_path, parents):
            refs = (_value(el, ref_path, parents) or "").split()
            for a, vp in st_anns.items():
                v = "_".join(_value(el, vp, parents).split()) or "_"
                for ref in refs:
                    pos = tok_pos.get(ref)
                    if pos is not None:
                        filled[a][pos] = v
        for a in st_anns:
            anns[a] = filled[a]
    return " ".join(words), anns, spans, meta, multivals, ann_multivals


def extract_xml_config(cfg: XmlFormatConfig, encoding: str = "utf-8"):
    """Compile a config to a batch extraction fn:
    (path, bytes) batch → pages batch (+ annotations/tags/meta)."""
    import xml.etree.ElementTree as ET

    def to_pages(batch: pa.Table) -> pa.Table:
        urls, texts, payloads = [], [], []
        ann_names = list(cfg.annotations) + [
            a for _, _, st in cfg.standoff_annotations for a in st] + (
            ["punct"] if cfg.capture_punct else [])
        ann_cols: dict[str, list] = {a: [] for a in ann_names}
        tag_col: list = []
        multi_col: list = []
        ann_multi_cols: dict[str, list] = {
            a: [] for a in cfg.multivalue_annotations if a}
        meta_cols: dict[str, list] = {
            m: [] for m in list(cfg.metadata) + list(cfg.foreach_fields)}
        langs: list = []
        needs_parents = any(
            ".." in p or "ancestor" in p or "sibling" in p
            or "parent::" in p for p in
            list(cfg.metadata.values()) + [cfg.word_value]
            + [p for p in cfg.annotations.values() if p]
            + [v for fe in cfg.metadata_foreach for v in fe]
            + [p for sf in cfg.subannotation_foreach for p in sf[1:]]
            + [p for st in cfg.standoff_annotations
               for p in (st[0], st[1], *st[2].values())]
            + [p for sp in cfg.standoff_spans
               for p in (sp[0], sp[1], sp[2], sp[4] or "",
                         *sp[5].values())]
            + [p for caps in cfg.annotation_captures.values()
               for p in caps])
        convert = tag = None
        if cfg.convert_plugin:
            from blacklab_ray.stages.convert import get_convert_plugin
            convert = get_convert_plugin(cfg.convert_plugin).fn
        if cfg.tag_plugin:
            from blacklab_ray.stages.convert import get_tag_plugin
            tag = get_tag_plugin(cfg.tag_plugin)
        for path, body in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            # DocIndexerConvertAndTag chain: convert, then tag, then
            # the ordinary config-driven extraction
            if convert is not None:
                body = convert(body)
            if tag is not None:
                body = tag(body)
            root = ET.fromstring(body.decode(encoding,
                                             errors="replace"))
            # one O(n) pass builds the ``..`` axis; skipped when no
            # configured path uses it
            parents = ({c: p for p in root.iter() for c in p}
                       if needs_parents else None)
            if cfg.document_path in (".", ""):
                doc_els = [root]
            else:
                doc_els = list(_iter_path(root, cfg.document_path,
                                          parents))
                first_step = _parse_step(
                    cfg.document_path.removeprefix(".//")
                    .removeprefix("//").lstrip("./").split("/")[0])[1]
                if not doc_els and _local(root.tag) == first_step:
                    # the file's root element IS the document tag
                    doc_els = [root]
            for i, el in enumerate(doc_els):
                (text, anns, spans, meta, mvals,
                 ann_mvals) = _extract_doc(el, cfg, parents)
                pid = (_value(el, cfg.doc_id_value, parents)
                       if cfg.doc_id_value else "") or f"{path}#{i}"
                urls.append(pid)
                texts.append(text)
                payloads.append(ET.tostring(el))
                for a in ann_cols:
                    ann_cols[a].append(anns.get(a, []))
                tag_col.append(spans)
                multi_col.append(mvals)
                for a in ann_multi_cols:
                    ann_multi_cols[a].append(ann_mvals.get(a, []))
                for m in meta_cols:
                    meta_cols[m].append(meta.get(m, ""))
                langs.append(meta.get("lang") or None)
        n = len(urls)
        cols = {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.nulls(n, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
        for a, vals in ann_cols.items():
            cols[a] = pa.array(vals, pa.list_(pa.string()))
        if cfg.word_path is not None:
            cols["tags"] = pa.array(
                [[{"name": s["name"], "start": s["start"],
                   "end": s["end"], "attrs": s["attrs"]} for s in row]
                 for row in tag_col], TAG_SPANS_TYPE)
        if "" in cfg.multivalue_annotations:
            # increment-0 secondary values of the MAIN annotation
            # (BuildParams multivalue_column="multi" indexes them);
            # non-main multipleValues emit multi_<name> columns below
            cols["multi"] = pa.array(multi_col, pa.list_(pa.struct([
                ("pos", pa.int32()), ("value", pa.string())])))
        for a, vals in ann_multi_cols.items():
            # per-annotation increment-0 secondaries: indexed into
            # postings_<a> by the build (fwd keeps the primary)
            cols[f"multi_{a}"] = pa.array(vals, pa.list_(pa.struct([
                ("pos", pa.int32()), ("value", pa.string())])))
        for m, vals in meta_cols.items():
            if m != "lang":
                cols[f"meta_{m}"] = pa.array(vals, pa.string())
        return pa.table(cols)

    return to_pages


def read_xml_config(paths, cfg: XmlFormatConfig,
                    encoding: str = "utf-8", **opts) -> ray.data.Dataset:
    """Config-driven XML corpus reader: one doc per documentPath
    element; parsing runs inside map_batches tasks."""
    ds = ray.data.read_binary_files(paths, include_paths=True, **opts)
    return ds.map_batches(extract_xml_config(cfg, encoding),
                          batch_format="pyarrow")


# ---------------------------------------------------------------------------
# built-in configs — the shipped .blf.yaml analogues
# (core/src/main/resources/formats/*.blf.yaml)
# ---------------------------------------------------------------------------

TEI_P5_ANNOTATED = XmlFormatConfig(
    name="tei-p5-annotated",        # tei-p5.blf.yaml with <w> tokens
    document_path=".//TEI",
    word_path=".//w",
    word_value=".",
    annotations={"lemma": "@lemma", "pos": "@type"},
    inline_tags=("s", "p"),
    metadata={"title": ".//title", "lang": ".//language"},
    doc_id_value=".//idno",
)

FOLIA = XmlFormatConfig(
    name="folia",                   # folia.blf.yaml
    document_path=".",
    word_path=".//w",
    word_value="t",
    annotations={"lemma": "lemma/@class", "pos": "pos/@class"},
    inline_tags=("s", "p"),
    metadata={},
)

ALTO = XmlFormatConfig(
    name="alto",                    # legacy DocIndexerAlto
    document_path=".",
    word_path=".//String",
    word_value="@CONTENT",
    inline_tags=("TextLine", "TextBlock"),
    metadata={"filename": ".//fileName"},
)

PAGEXML = XmlFormatConfig(
    name="pagexml",                 # legacy DocIndexerPageXml
    document_path=".",
    word_path=".//Word",
    word_value="TextEquiv/Unicode",
    inline_tags=("TextLine", "TextRegion"),
)

NAF = XmlFormatConfig(
    name="naf",                     # naf.blf.yaml
    document_path=".",
    word_path=".//wf",
    word_value=".",
    inline_tags=(),
    metadata={"title": ".//fileDesc/@title"},
)

TEI_P5_INL = XmlFormatConfig(
    name="tei-p5-inl",              # tei-p5.blf.yaml incl. its
    document_path="//TEI",          # inlMetadata forEach block
    word_path=".//w",
    word_value=".",
    annotations={"lemma": "@lemma", "pos": "@type"},
    inline_tags=("s", "p"),
    metadata={"title": ".//title", "lang": ".//language"},
    doc_id_value=".//idno",
    # forEachPath: bibl/interpGrp/interp under
    # listBibl[@id='inlMetadata']; namePath ../@type; valuePath .
    metadata_foreach=((
        ".//listBibl[@id='inlMetadata']/bibl/interpGrp/interp",
        "../@type", "."),),
    foreach_fields=("author", "witnessYear_from"),
)

EAF = XmlFormatConfig(
    name="eaf",                     # eaf.blf.yaml: tier-predicated
    document_path=".",              # words + standoff lemma/pos tiers
    word_path=".//TIER[@LINGUISTIC_TYPE_REF='Words']/ANNOTATION"
              "/ALIGNABLE_ANNOTATION",
    word_value="ANNOTATION_VALUE",
    token_id_path="@ANNOTATION_ID",
    standoff_annotations=(
        (".//TIER[@LINGUISTIC_TYPE_REF='Lemma']/ANNOTATION"
         "/REF_ANNOTATION", "@ANNOTATION_REF",
         {"lemma": "ANNOTATION_VALUE"}),
        (".//TIER[@LINGUISTIC_TYPE_REF='PoS']/ANNOTATION"
         "/REF_ANNOTATION", "@ANNOTATION_REF",
         {"pos": "ANNOTATION_VALUE"}),
    ),
)

TCF = XmlFormatConfig(
    name="tcf",                     # tcf.blf.yaml: @tokenIDs-list
    document_path=".",              # standoff lemmas/POStags
    word_path=".//tokens/token",
    word_value=".",
    token_id_path="@ID",
    standoff_annotations=(
        (".//lemmas/lemma", "@tokenIDs", {"lemma": "."}),
        (".//POStags/tag", "@tokenIDs", {"pos": "."}),
    ),
)

def cmdi_config(fields: tuple) -> XmlFormatConfig:
    """cmdi.blf.yaml (type: metadata, store: false): capture every
    leaf element with text as a metadata field — forEachPath
    ``.//*[not(*) and text()]``, namePath ``local-name()``. CMDI is a
    metadata-ONLY format: extract it with word_path=None and feed the
    resulting table to ``stages.linked.join_linked_metadata`` keyed on
    the self-link id. Field names must be declared (``fields``) for a
    stable Arrow schema, as everywhere in this config model."""
    return XmlFormatConfig(
        name="cmdi",
        document_path=".//Components",
        metadata_foreach=((".//*[not(*) and text()]",
                           "local-name()", "."),),
        foreach_fields=tuple(fields),
    )


BUILTIN_CONFIGS = {c.name: c for c in
                   (TEI_P5_ANNOTATED, FOLIA, ALTO, PAGEXML, NAF,
                    TEI_P5_INL, EAF, TCF)}
