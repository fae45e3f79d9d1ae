"""Corpus frequency analytics as Ray Data groupby pipelines.

The Ray-native replacement for BlackLab's FrequencyTool (tools/src/main/
java/nl/inl/blacklab/tools/frequency/FrequencyTool.java:55,170-245), which
hand-rolls per-chunk HashMap partial aggregates + sorted-chunk spills +
k-way merge. Here the same computation is: batch-local partial counts
inside ``map_batches`` (the combiner — keeps shuffle bytes ≈ distinct
keys, not token count) followed by a small ``groupby().sum()``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from blacklab_ray.analysis.analyzers import tokenize_column


class TokenCountPartial:
    """map_batches combiner: batch → (term[, group], partial df/tf)."""

    def __init__(self, group_col: str | None = None,
                 text_col: str = "text"):
        self._group = group_col
        self._text = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        parents, toks, _, _ = tokenize_column(batch.column(self._text))
        if self._group is None:
            # (term) partials: tf = occurrences, df = distinct docs
            tbl = pa.table({"term": toks,
                            "doc": pa.array(parents, pa.int64())})
            gb = tbl.group_by(["term", "doc"]).aggregate([("doc", "count")])
            per_doc = gb.group_by("term").aggregate(
                [("doc_count", "sum"), ("doc", "count")])
            return pa.table({
                "term": per_doc["term"],
                "tf": per_doc["doc_count_sum"].cast(pa.int64()),
                "df": per_doc["doc_count"].cast(pa.int64()),
            })
        group_vals = pc.take(batch.column(self._group), pa.array(parents))
        tbl = pa.table({"term": toks, "grp": group_vals})
        gb = tbl.group_by(["term", "grp"]).aggregate([([], "count_all")])
        return pa.table({
            "term": gb["term"], "grp": gb["grp"],
            "tf": gb["count_all"].cast(pa.int64()),
        })


def term_frequencies(ds: ray.data.Dataset,
                     text_col: str = "text") -> ray.data.Dataset:
    """term → (doc_freq, collection_tf) over a corpus Dataset.

    BlackLabIndex.termFrequencies analogue (search/BlackLabIndex.java:212)
    computed straight from text (no index needed).
    """
    partial = ds.map_batches(TokenCountPartial(text_col=text_col),
                             batch_format="pyarrow")
    return partial.groupby("term").aggregate(
        Sum("df", alias_name="doc_freq"),
        Sum("tf", alias_name="collection_tf"))


def freq_by(ds: ray.data.Dataset, group_col: str,
            text_col: str = "text") -> ray.data.Dataset:
    """token × metadata frequency list (FrequencyTool's core output)."""
    partial = ds.map_batches(
        TokenCountPartial(group_col=group_col, text_col=text_col),
        batch_format="pyarrow")
    out = partial.groupby(["term", "grp"]).aggregate(
        Sum("tf", alias_name="tf"))
    return out.map_batches(
        lambda t: t.rename_columns(
            ["term", group_col, "tf"]), batch_format="pyarrow")


class DocStats:
    """map_batches: per-doc token counts (doc table without an index)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self._text = text_col
        self._id = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        _, _, _, lens = tokenize_column(batch.column(self._text))
        return pa.table({
            "doc_id": batch.column(self._id).cast(pa.int64()),
            "doc_len": pa.array(lens, pa.int64()),
        })


def doc_stats(ds: ray.data.Dataset, text_col: str = "text",
              id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(DocStats(text_col, id_col),
                          batch_format="pyarrow")


def corpus_stats(ds: ray.data.Dataset, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    """(total_docs, total_tokens, avg_doc_len) — small driver result."""
    agg = doc_stats(ds, text_col, id_col).aggregate(
        Count(alias_name="total_docs"),
        Sum("doc_len", alias_name="total_tokens"))
    total_docs = int(agg["total_docs"])
    total_tokens = int(agg["total_tokens"] or 0)
    return pa.table({
        "total_docs": pa.array([total_docs], pa.int64()),
        "total_tokens": pa.array([total_tokens], pa.int64()),
        "avg_doc_len": pa.array(
            [round(total_tokens / max(total_docs, 1), 6)], pa.float64()),
    })


# ---------------------------------------------------------------------------
# FrequencyTool over a BUILT index: config-driven frequency lists
# (tools/frequency/FrequencyTool.java + ConfigFreqList.java + README:
# YAML `frequencyLists` of annotations x metadataFields, one TSV/JSON
# report per list)
# ---------------------------------------------------------------------------


class _FwdFreqPartial:
    """map_batches combiner over fwd shards: ONE segmented decode of
    every position blob per annotation (the hits.py FwdIndexKwic
    pattern — never a per-term Python decode call), key each LIVE
    token position by (annotation values..., metadata values...),
    fold to per-batch partial counts. Shuffle bytes ≈ distinct keys
    per batch, never token count. Tombstoned docs are excluded
    (deleted and superseded generations must not inflate counts)."""

    def __init__(self, annotations: list[str], meta_fields: list[str],
                 tombstones):
        import numpy as np
        self._annots = list(annotations)
        self._meta = list(meta_fields)
        self._tombs = np.asarray(sorted(tombstones), dtype=np.int64)

    def _empty(self) -> pa.Table:
        cols = {a: pa.array([], pa.string())
                for a in self._annots + self._meta}
        cols["frequency"] = pa.array([], pa.int64())
        return pa.table(cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        from blacklab_ray.codec.vbyte import decode_position_lists
        if batch.num_rows and self._tombs.size:
            ids = batch.column("doc_id").to_numpy(
                zero_copy_only=False)
            live = ~np.isin(ids, self._tombs)
            if not live.all():
                batch = batch.filter(pa.array(live))
        if batch.num_rows == 0:
            return self._empty()
        lens = batch.column("doc_len").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        total = int(lens.sum())
        if total == 0:
            return self._empty()
        starts = np.zeros(lens.size, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        cols: dict[str, object] = {}
        for a in self._annots:
            suffix = "" if a == "word" else f"_{a}"
            terms_l = batch.column(f"terms{suffix}").to_pylist()
            tfs_l = batch.column(f"tfs{suffix}").to_pylist()
            pos_l = batch.column(f"pos{suffix}").to_pylist()
            blob = b"".join(b for row in pos_l for b in row)
            cnt = np.array([t for row in tfs_l for t in row],
                           dtype=np.int64)
            flat = np.empty(total, dtype=object)
            if cnt.size:
                allpos = decode_position_lists(blob, cnt)
                row_of_list = np.repeat(
                    np.arange(lens.size, dtype=np.int64),
                    [len(x) for x in tfs_l])
                row_of_pos = np.repeat(row_of_list, cnt)
                term_of_pos = np.repeat(np.array(
                    [t for row in terms_l for t in row],
                    dtype=object), cnt)
                flat[starts[row_of_pos] + allpos] = term_of_pos
            cols[a] = flat
        for m in self._meta:
            vals = batch.column(m).to_pylist()
            cols[m] = np.repeat(np.array(vals, dtype=object), lens)
        df = pd.DataFrame(cols)
        out = (df.groupby(list(df.columns), dropna=False,
                          observed=True)
               .size().reset_index(name="frequency"))
        return pa.Table.from_pandas(out, preserve_index=False)


def frequency_list(index_dir: str, annotations: list[str],
                   meta_fields: list[str] | None = None
                   ) -> ray.data.Dataset:
    """ONE frequency list over a built index: per-token tuples of the
    given annotation streams x the docs' metadata fields → summed
    counts (CalcTokenFrequencies.java's loop over doc forward
    indexes, as a partial-fold + one composite-key groupby).
    Tombstoned (deleted / superseded-generation) docs are excluded."""
    import os

    from blacklab_ray.query import IndexReader
    meta_fields = list(meta_fields or [])
    tombs = IndexReader(index_dir).tombstones
    cols = ["doc_id", "doc_len"] + meta_fields
    for a in annotations:
        suffix = "" if a == "word" else f"_{a}"
        cols += [f"terms{suffix}", f"tfs{suffix}", f"pos{suffix}"]
    ds = ray.data.read_parquet(os.path.join(index_dir, "fwd"),
                               columns=sorted(set(cols)))
    partial = ds.map_batches(
        _FwdFreqPartial(annotations, meta_fields, tombs),
        batch_format="pyarrow")
    keys = list(annotations) + meta_fields
    return partial.groupby(keys).aggregate(
        Sum("frequency", alias_name="frequency"))


_TSV_BAD = str.maketrans({"\t": " ", "\n": " ", "\r": " "})


def frequency_lists(index_dir: str, config: dict, out_dir: str,
                    fmt: str = "tsv", gzip_out: bool = False) -> list:
    """FrequencyTool.main analogue: run every ``frequencyLists`` spec
    from a config mapping (the reference's YAML shape:
    ``annotatedField`` + list of {name?, annotations,
    metadataFields?}) and write one report file per list (TSV
    annotation-cols, meta-cols, frequency — or JSON records), sorted
    by key for deterministic output. Returns the written paths.
    Report names sanitize into filenames; duplicate names are a
    config error (the second list would silently overwrite the
    first's report)."""
    import gzip as _gzip
    import json as _json
    import os
    from urllib.parse import quote
    written = []
    specs = config.get("frequencyLists") or []
    if not specs:
        raise ValueError("config has no frequencyLists")
    seen: set[str] = set()
    for spec in specs:
        annots = list(spec.get("annotations") or [])
        if not annots:
            raise ValueError("frequency list needs annotations")
        metas = list(spec.get("metadataFields") or [])
        name = spec.get("name") or "-".join(annots + metas)
        if name in seen:
            raise ValueError(f"duplicate frequency-list name {name!r}")
        seen.add(name)
        df = (frequency_list(index_dir, annots, metas).to_pandas()
              .sort_values(annots + metas).reset_index(drop=True))
        ext = "json" if fmt == "json" else "tsv"
        path = os.path.join(out_dir, quote(name, safe="") + f".{ext}"
                            + (".gz" if gzip_out else ""))
        os.makedirs(out_dir, exist_ok=True)
        opener = (lambda p: _gzip.open(p, "wt", encoding="utf-8")) \
            if gzip_out else (lambda p: open(p, "w", encoding="utf-8"))
        key_cols = annots + metas

        def _cell(v):
            return "" if v is None else str(v).translate(_TSV_BAD)
        with opener(path) as f:
            if fmt == "json":
                _json.dump(df.to_dict(orient="records"), f,
                           default=str)
            else:
                key_arrays = [df[c].tolist() for c in key_cols]
                freqs = df["frequency"].tolist()
                for i in range(len(df)):
                    f.write("\t".join(
                        [_cell(arr[i]) for arr in key_arrays]
                        + [str(int(freqs[i]))]) + "\n")
        written.append(path)
    return written
