"""Load BlackLab ``.blf.yaml`` input-format configs.

The reference's user-supplied format descriptors (InputFormatReader /
ConfigInputFormat, engine/src/main/java/nl/inl/blacklab/indexers/
config/InputFormatReader.java; the shipped files live under
core/src/main/resources/formats/*.blf.yaml) map onto this engine's
``XmlFormatConfig``: documentPath, the first annotatedField's
containerPath/wordPath/punctPath/tokenIdPath, its annotations (first
annotation is the main word form), inlineTags, standoffAnnotations,
and metadata blocks (static fields and forEachPath/namePath/valuePath
dynamic blocks).  A user who wrote a ``.blf.yaml`` for BlackLab can
hand the same file to ``formats.register_yaml_format`` (or the
server's ``POST /input-formats`` — the AddFormat analogue) and read
their corpus through it.

Scope: ``fileType: xml`` (the default when documentPath is present).
Tabular and plain-text configs error with a pointer at the native
``tabular-*`` / ``plaintext`` readers, which cover those shapes.
"""

from __future__ import annotations

import os
import re

from blacklab_ray.stages.xmlconfig import XmlFormatConfig

__all__ = ["load_blf_yaml"]


def _norm_doc_path(p: str | None) -> str:
    """documentPath: '//TEI' → './/TEI', '/TEI' → './/TEI' (the path
    engine evaluates relative to the parsed root, and a descendant
    search from the root also matches the root element itself via the
    engine's self-inclusive document scan), '/' or '.' → '.'."""
    if not p or p in (".", "/"):
        return "."
    if p.startswith("//"):
        return "." + p
    if p.startswith("/"):
        return ".//" + p.lstrip("/")
    return p


def _join(base: str | None, rel: str | None) -> str | None:
    """Compose a containerPath-relative path onto its container."""
    if rel is None:
        return None
    if not base or base == ".":
        return rel
    if rel.startswith(".//"):
        return base + "//" + rel[3:]
    if rel.startswith("./"):
        return base + "/" + rel[2:]
    if rel.startswith("//"):
        return base + rel
    if rel == ".":
        return base
    return base + "/" + rel


def _tag_local(path: str) -> str:
    """Inline-tag path → element local name ('.//tei:p[...]' → 'p')."""
    last = path.rstrip("/").rsplit("/", 1)[-1]
    last = re.sub(r"\[[^\]]*\]", "", last)
    if "::" in last:
        last = last.rsplit("::", 1)[-1]
    return last.rsplit(":", 1)[-1]


def load_blf_yaml(src: str, name: str | None = None,
                  allow_path: bool = True) -> XmlFormatConfig:
    """Parse a ``.blf.yaml`` file path or YAML text into an
    ``XmlFormatConfig``.  ``name`` overrides the config's registry
    name (defaults to the file stem or the YAML ``name:``).
    ``allow_path=False`` treats ``src`` as YAML text ONLY — required
    when ``src`` comes from an untrusted source (the HTTP AddFormat
    body must never be interpretable as a server-side file path)."""
    import yaml

    text = src
    looks_like_path = "\n" not in src and (
        src.endswith((".yaml", ".yml")) or os.path.sep in src)
    if allow_path and looks_like_path:
        if not os.path.exists(src):
            raise FileNotFoundError(f"format config file not found: "
                                    f"{src!r}")
        with open(src, encoding="utf-8") as f:
            text = f.read()
        if name is None:
            base = os.path.basename(src)
            name = base.split(".blf.yaml")[0].split(".yaml")[0]
    # duplicate mapping keys are configuration errors, not
    # last-wins (InputFormatReader rejects them; TestYaml.java
    # expects a message containing "Duplicate")
    class _NoDupLoader(yaml.SafeLoader):
        pass

    def _mapping_nodup(loader, node, deep=False):
        seen = set()
        for k_node, _v in node.value:
            k = loader.construct_object(k_node, deep=deep)
            try:
                dup = k in seen
            except TypeError:       # unhashable key: let yaml handle
                continue
            if dup:
                raise ValueError(
                    f"Duplicate key {k!r} in .blf.yaml mapping")
            seen.add(k)
        return yaml.SafeLoader.construct_mapping(loader, node, deep)

    _NoDupLoader.add_constructor(
        yaml.resolver.BaseResolver.DEFAULT_MAPPING_TAG, _mapping_nodup)
    cfg = yaml.load(text, Loader=_NoDupLoader) or {}
    if not isinstance(cfg, dict):
        raise ValueError("blf.yaml must be a mapping at top level")
    ftype = cfg.get("fileType", "xml" if "documentPath" in cfg
                    else None)
    if ftype in ("tabular", "csv", "tsv"):
        raise ValueError(
            "tabular .blf.yaml configs map to the native "
            "'tabular-csv'/'tabular-tsv'/'sketch-wpl' readers "
            "(blacklab_ray.formats)")
    if ftype in ("text", "txt"):
        raise ValueError(
            "plain-text .blf.yaml configs map to the native "
            "'plaintext' reader (blacklab_ray.formats)")
    if ftype == "chat":
        raise ValueError(
            "CHAT .blf.yaml configs map to the native 'chat' reader "
            "(blacklab_ray.stages.chat)")
    if ftype != "xml":
        raise ValueError(f"unsupported fileType {ftype!r}")
    name = name or cfg.get("name") or "user-xml"

    fields = cfg.get("annotatedFields") or {}
    word_path = None
    word_value = "."
    extra: dict[str, str] = {}
    inline: tuple = ()
    inline_ids: dict[str, str] = {}
    standoff: list = []
    spanoff: list = []
    captures: dict[str, tuple] = {}
    processes: dict[str, tuple] = {}
    multi_names: list[str] = []

    def _steps(node: dict) -> tuple:
        """`process:` actions + trailing mapValues → step tuples."""
        steps = []
        for st in (node.get("process") or []):
            prm = {k: v for k, v in st.items() if k != "action"}
            steps.append((st["action"], prm))
        if node.get("mapValues"):
            steps.append(("mapvalues",
                          {"mapping": dict(node["mapValues"])}))
        return tuple(steps)
    subfe: list = []
    fld: dict = {}
    if fields:
        # the first annotated field (conventionally 'contents')
        fld = fields[next(iter(fields))]
        container = fld.get("containerPath")
        word_path = _join(container, fld.get("wordPath"))
        annots = fld.get("annotations") or []
        if not annots:
            raise ValueError("annotatedField needs an annotations "
                             "list")
        word_value = annots[0].get("valuePath", ".")
        if annots[0].get("captureValuePaths"):
            captures[""] = tuple(annots[0]["captureValuePaths"])
        if _steps(annots[0]):
            processes[""] = _steps(annots[0])
        if annots[0].get("multipleValues"):
            multi_names.append("")
        for a in annots[1:]:
            if a.get("captureValuePaths"):
                captures[a["name"]] = tuple(a["captureValuePaths"])
            if _steps(a):
                processes[a["name"]] = _steps(a)
            if a.get("multipleValues"):
                # non-main multi-values: extraction emits a
                # multi_<name> secondaries column and the build
                # folds it into that annotation's postings
                # (AnnotationWriter.java:246-343 increment-0 —
                # naf.blf.yaml's word_or_lemma)
                multi_names.append(a["name"])
            if "forEachPath" in a:
                raise ValueError(
                    "forEachPath is not allowed inside annotations "
                    "(the reference forbids it too: the annotation "
                    "set must be static)")
            # basePath: subsequent XPaths are relative to it
            # (ConfigAnnotation.java:42)
            base = a.get("basePath")
            extra[a["name"]] = _join(base, a.get("valuePath", "."))
            # subannotations index as separate annotations named
            # parent_sub (AnnotatedFieldNameUtil.java:32-35); declared
            # names without a valuePath are filled by a forEachPath
            # entry per word (folia.blf.yaml's folia:feat) or stay ""
            for s in (a.get("subannotations") or []):
                if "forEachPath" in s:
                    subfe.append((a["name"],
                                  _join(base, s["forEachPath"]),
                                  s.get("namePath", "local-name()"),
                                  s.get("valuePath", ".")))
                elif "valuePath" in s:
                    extra[f'{a["name"]}_{s["name"]}'] = \
                        _join(base, s["valuePath"])
                else:
                    extra[f'{a["name"]}_{s["name"]}'] = None
        inline_names: list[str] = []
        for t in (fld.get("inlineTags") or []):
            nm = _tag_local(t["path"] if isinstance(t, dict)
                            else str(t))
            inline_names.append(nm)
            # tokenIdPath on an inline tag: position-marker (anchor)
            # ids standoff spans can reference
            if isinstance(t, dict) and (t.get("tokenIdPath")
                                        or t.get("tokenPositionIdPath")):
                inline_ids[nm] = (t.get("tokenIdPath")
                                  or t["tokenPositionIdPath"])
        inline = tuple(inline_names)
        for s in (fld.get("standoffAnnotations") or []):
            vals = {a["name"]: a.get("valuePath", ".")
                    for a in (s.get("annotations") or [])}
            if s.get("spanEndPath"):
                # span-style standoff (ConfigStandoffAnnotations
                # spanStartPath/spanEndPath) → a queryable tag span
                spanoff.append((
                    s["path"], s["spanStartPath"], s["spanEndPath"],
                    bool(s.get("spanEndIsInclusive", True)),
                    s.get("spanNamePath"), vals))
            else:
                standoff.append((
                    s["path"],
                    s.get("tokenRefPath")
                    or s.get("refTokenPositionIdPath") or ".", vals))
    elif not cfg.get("metadata"):
        # metadata-only configs (cmdi.blf.yaml: linked-document
        # metadata) are valid; a config with NEITHER is empty
        raise ValueError("blf.yaml needs an annotatedFields block "
                         "or a metadata block")

    meta: dict[str, str] = {}
    foreach: list[tuple] = []
    blocks = cfg.get("metadata") or []
    if isinstance(blocks, dict):
        blocks = [blocks]
    declared: list[str] = []
    for blk in blocks:
        base = blk.get("containerPath")
        for f in (blk.get("fields") or []):
            if "forEachPath" in f:
                foreach.append((_join(base, f["forEachPath"]),
                                f.get("namePath", "local-name()"),
                                f.get("valuePath", ".")))
            elif "name" in f:
                meta[f["name"]] = _join(base, f.get("valuePath", "."))
                declared.append(f["name"])
                if _steps(f):
                    processes[f"meta:{f['name']}"] = _steps(f)

    doc_id_value = None
    pid = cfg.get("pidField") or cfg.get("corpusConfig", {}) \
        .get("specialFields", {}).get("pidField")
    if not pid and "pid" in meta:
        # BLS convention: a metadata field literally named 'pid' is
        # the persistent id (testformat.blf.yaml declares one without
        # a pidField entry)
        pid = "pid"
    if pid and pid in meta:
        doc_id_value = meta[pid]

    return XmlFormatConfig(
        name=name,
        document_path=_norm_doc_path(cfg.get("documentPath")),
        word_path=word_path,
        word_value=word_value,
        annotations=extra,
        inline_tags=inline,
        metadata=meta,
        doc_id_value=doc_id_value,
        metadata_foreach=tuple(foreach),
        foreach_fields=tuple(cfg.get("foreachFields", ())),
        token_id_path=(fld.get("tokenIdPath")
                       or fld.get("tokenPositionIdPath")),
        standoff_annotations=tuple(standoff),
        standoff_spans=tuple(spanoff),
        inline_tag_id_paths=inline_ids,
        annotation_captures=captures,
        processes=processes,
        multivalue_annotations=frozenset(multi_names),
        subannotation_foreach=tuple(subfe),
        capture_punct=bool(fld.get("punctPath")),
        convert_plugin=cfg.get("convertPlugin"),
        tag_plugin=cfg.get("tagPlugin"),
    )
