"""63-bit doc-id space management: collision detection + resolution.

The engine keys documents by ``doc_id = 63-bit blake2b(url)`` so ids are
stable across runs, retries and partitionings (the property BlackLab
gets from its pid metadata field — DocIndexerAbstract's persistent
identifier handling; Lucene's per-segment int docIds are remapped on
merge instead, IndexerImpl.java:184-188 notes the rollback caveat).
Hashed ids keep the engine int64-native (every packed ``(doc<<32)|pos``
join and numpy kernel depends on that) — but at the north-rule's 10^12
documents the birthday bound makes 63-bit collisions a certainty
(E[colliding pairs] = n^2 / 2^64 ≈ 5.4e4 at n = 1e12), and a collision
silently merges two distinct documents into one posting stream.

This module resolves the colliding TAIL deterministically instead of
widening every id to 128 bits:

- **detect**: one groupby over the fwd ``doc_id`` column (an ids-only
  shuffle — 8 bytes/row, no urls, no payloads), then a column-pruned
  ``isin`` gather of ``(doc_id, url)`` for just the duplicated ids.
- **resolve**: per colliding id the lexicographically-smallest url
  keeps it; every other url ``u`` moves to ``hash(salted(u, k))`` for
  the smallest salt level ``k ≥ 1`` whose id is globally unused.
  Iterated to a fixed point (secondary collisions have probability
  ~n/2^63 per candidate). Deterministic given the corpus url set.
- **apply**: only fwd files whose row-group doc_id [min,max] statistics
  can contain an affected id are rewritten (atomic tmp+rename), in
  parallel Ray tasks. The url→id remap is persisted to
  ``id_remap.json`` and consulted by every url→id lookup
  (delete/update by url), so resolved ids survive restarts.

Incremental adds use the same machinery with an *incumbent* rule:
documents already in the index always keep their ids (their postings
are built); only the newly-added urls rehash.

Cost model: detection is an ids-only shuffle, so it is scheduled by
doc count — ``"auto"`` runs it when the corpus is large enough for the
expected collision count to be non-negligible (n ≥ 1e8 →
E[pairs] ≥ 5e-4), i.e. exactly when the risk exists. Below that the
build pays nothing; ``resolve_doc_ids=True`` forces it for tests.
"""

from __future__ import annotations

import json
import logging
import os
from collections.abc import Callable, Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from blacklab_ray.stages.tokenize import hash64

logger = logging.getLogger("blacklab_ray.idspace")

REMAP_FILE = "id_remap.json"

# "auto" detection threshold: n^2/2^64 >= 5e-4 expected colliding pairs
AUTO_RESOLVE_MIN_DOCS = 100_000_000


def salted_url(url: str, level: int) -> str:
    """Deterministic rehash key for salt level ``level`` >= 1.

    The prefix can never be produced by a real url (it contains \\x01),
    so salted ids never alias the unsalted id-space by construction.
    """
    return f"\x01{level}\x01{url}"


def load_remap(index_dir: str) -> dict[str, int]:
    path = os.path.join(index_dir, REMAP_FILE)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return {u: int(i) for u, i in json.load(f).items()}


def save_remap(index_dir: str, remap: dict[str, int]) -> None:
    path = os.path.join(index_dir, REMAP_FILE)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(remap, f, indent=0, sort_keys=True)
    os.replace(tmp, path)


def doc_id_for_url(url: str, remap: dict[str, int] | None = None,
                   index_dir: str | None = None) -> int:
    """The authoritative url→doc_id mapping: remap first, hash second."""
    if remap is None:
        remap = load_remap(index_dir) if index_dir else {}
    got = remap.get(url)
    return got if got is not None else hash64(url)


# ---------------------------------------------------------------------------
# detection


def duplicated_doc_ids(fwd_dir: str) -> list[int]:
    """Ids appearing on more than one fwd row (ids-only shuffle)."""
    dup = (ray.data.read_parquet(fwd_dir, columns=["doc_id"])
           .groupby("doc_id").count()
           .map_batches(
               lambda t: t.filter(pc.greater(t["count()"], 1))
                          .select(["doc_id"]),
               batch_format="pyarrow"))
    # collision sets are result-sized (E ~ 5e4 at 1e12 docs)
    return [r["doc_id"] for r in dup.take_all()]


def _scan_pairs_for_ids(fwd_dir: str, ids: Iterable[int]) -> pa.Table:
    """Column-pruned (doc_id, url) gather for just the given ids."""
    want = pa.array(sorted(set(int(i) for i in ids)), pa.int64())
    if len(want) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "url": pa.array([], pa.string())})
    ds = (ray.data.read_parquet(fwd_dir, columns=["doc_id", "url"])
          .map_batches(
              lambda t, w=want: t.filter(pc.is_in(t["doc_id"], w)),
              batch_format="pyarrow"))
    rows = ds.take_all()
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "url": pa.array([r["url"] for r in rows], pa.string()),
    })


def find_collision_groups(fwd_dir: str) -> dict[int, list[str]]:
    """``{doc_id: sorted distinct urls}`` for ids shared by >= 2 urls.

    Rows duplicating the SAME url under one id are input duplicates,
    not hash collisions — the indexer treats them as one document
    identity (exact dedup is a separate operator); they are excluded.
    """
    dup_ids = duplicated_doc_ids(fwd_dir)
    if not dup_ids:
        return {}
    pairs = _scan_pairs_for_ids(fwd_dir, dup_ids)
    groups: dict[int, set[str]] = {}
    for did, url in zip(pairs["doc_id"].to_pylist(),
                        pairs["url"].to_pylist()):
        groups.setdefault(did, set()).add(url)
    return {did: sorted(us) for did, us in groups.items() if len(us) > 1}


def ids_in_use(fwd_dir: str, candidates: set[int]) -> set[int]:
    """Which candidate ids already exist in the fwd doc_id column."""
    if not candidates:
        return set()
    t = _scan_pairs_for_ids(fwd_dir, candidates)
    return set(t["doc_id"].to_pylist())


# ---------------------------------------------------------------------------
# resolution (pure, deterministic — unit-tested with injected weak hashes)


def resolve_collisions(groups: dict[int, list[str]],
                       is_used: Callable[[set[int]], set[int]],
                       hash_fn: Callable[[str], int] = hash64,
                       incumbents: set[str] | frozenset[str] = frozenset(),
                       ) -> dict[str, int]:
    """Assign fresh ids to the colliding tail; return ``{url: new_id}``.

    ``is_used(cands)`` answers which candidate ids are already occupied
    corpus-wide (one pruned scan per fixed-point round; expected 1).
    ``incumbents``: urls that must keep their current id (incremental
    adds — their postings are already built). Exactly one url per group
    keeps the id: the incumbent if present, else the lexicographically
    smallest (ties broken the same way every run — determinism is the
    contract that makes retries value-identical).
    """
    remap: dict[str, int] = {}
    taken: set[int] = set(groups)
    pending: list[str] = []
    for base_id in sorted(groups):
        urls = sorted(groups[base_id])
        inc = [u for u in urls if u in incumbents]
        if len(inc) > 1:
            raise ValueError(
                f"doc_id {base_id}: multiple incumbent urls {inc} share "
                "one id — the existing index is already collided; "
                "rebuild with resolution enabled")
        keeper = inc[0] if inc else urls[0]
        pending.extend(u for u in urls if u != keeper)
    level = {u: 1 for u in pending}
    while pending:
        if any(level[u] > 64 for u in pending):
            # 64 salted probes all colliding means the hash space is
            # effectively exhausted (impossible at 63 bits; reachable
            # only with the weak test hashes) — fail loudly, never spin
            raise RuntimeError("id-space exhausted resolving collisions")
        cand = {u: hash_fn(salted_url(u, level[u])) for u in pending}
        occupied = is_used(set(cand.values()) - taken)
        nxt = []
        for u in sorted(pending):
            c = cand[u]
            if c in taken or c in occupied:
                level[u] += 1
                nxt.append(u)
            else:
                remap[u] = c
                taken.add(c)
        pending = nxt
    return remap


# ---------------------------------------------------------------------------
# application


@ray.remote
def _rewrite_file(path: str, remap_ref, old_id_list: list[int]) -> int:
    """Rewrite one fwd file's doc_id column per the remap; returns the
    number of rows changed. Skips (0) when row-group statistics prove
    no affected id can be present."""
    remap: dict[str, int] = remap_ref
    old_ids = np.sort(np.asarray(old_id_list, dtype=np.int64))
    pf = pq.ParquetFile(path)
    maybe = False
    for rg in range(pf.metadata.num_row_groups):
        col = pf.metadata.row_group(rg).column(0)
        st = col.statistics
        if st is None or not st.has_min_max or \
                col.path_in_schema != "doc_id":
            maybe = True
            break
        i = np.searchsorted(old_ids, st.min)
        if i < old_ids.size and old_ids[i] <= st.max:
            maybe = True
            break
    if not maybe:
        return 0
    t = pq.read_table(path)
    urls = t["url"]
    mask = pc.is_in(urls, pa.array(list(remap), pa.string()))
    n_hit = int(pc.sum(mask).as_py() or 0)
    if not n_hit:
        return 0
    new_ids = pa.array(
        [remap.get(u, i) for u, i in zip(urls.to_pylist(),
                                         t["doc_id"].to_pylist())],
        pa.int64())
    t = t.set_column(t.schema.get_field_index("doc_id"), "doc_id", new_ids)
    tmp = path + ".remap.tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return n_hit


def apply_remap_to_fwd(fwd_dir: str, remap: dict[str, int],
                       old_ids: Iterable[int],
                       files: list[str] | None = None) -> int:
    """Rewrite affected fwd files in place; returns rows changed.

    ``old_ids``: the collided ids being vacated (drives the row-group
    statistics pruning; the actual row match is by url). ``files``:
    restrict to these basenames (incremental adds rewrite only the new
    shard files). Unaffected files are only footer-read.
    """
    if not remap:
        return 0
    names = files if files is not None else sorted(os.listdir(fwd_dir))
    paths = [os.path.join(fwd_dir, f) for f in names
             if f.endswith(".parquet")]
    ref = ray.put(remap)
    olds = [int(i) for i in old_ids]
    return sum(ray.get([_rewrite_file.remote(p, ref, olds)
                        for p in paths]))


# ---------------------------------------------------------------------------
# orchestration


def resolve_index_doc_ids(index_dir: str, fwd_dir: str | None = None,
                          hash_fn: Callable[[str], int] = hash64) -> dict:
    """Full-build resolution: detect, resolve, rewrite, persist.

    Returns ``{"n_collision_groups": int, "n_remapped": int,
    "rows_rewritten": int}``. Idempotent: re-running on a resolved fwd
    finds nothing.
    """
    fwd_dir = fwd_dir or os.path.join(index_dir, "fwd")
    groups = find_collision_groups(fwd_dir)
    if not groups:
        return {"n_collision_groups": 0, "n_remapped": 0,
                "rows_rewritten": 0}
    remap = resolve_collisions(
        groups, is_used=lambda c: ids_in_use(fwd_dir, c), hash_fn=hash_fn)
    n_rows = apply_remap_to_fwd(fwd_dir, remap, old_ids=groups)
    merged = load_remap(index_dir)
    merged.update(remap)
    save_remap(index_dir, merged)
    logger.warning(
        "doc-id resolution: %d collision groups, %d urls re-idd, "
        "%d fwd rows rewritten (remap persisted to %s)",
        len(groups), len(remap), n_rows, REMAP_FILE)
    return {"n_collision_groups": len(groups), "n_remapped": len(remap),
            "rows_rewritten": n_rows}


def resolve_added_doc_ids(index_dir: str, fwd_dir: str,
                          new_files: list[str],
                          hash_fn: Callable[[str], int] = hash64) -> dict:
    """Incremental-add resolution over just the new fwd shard files.

    Incumbent documents (already indexed) keep their ids; colliding
    newly-added urls rehash. Must run BEFORE the delta exchange links
    the new files (the rewrite replaces directory entries).
    """
    new_paths = [os.path.join(fwd_dir, f) for f in new_files
                 if f.endswith(".parquet")]
    if not new_paths:
        return {"n_collision_groups": 0, "n_remapped": 0,
                "rows_rewritten": 0}
    # (doc_id, url) of the new shard only — delta-sized, not corpus-sized
    new_pairs = pa.concat_tables(
        [pq.read_table(p, columns=["doc_id", "url"]) for p in new_paths])
    new_ids = set(new_pairs["doc_id"].to_pylist())
    # which of those ids already live in the corpus (pruned isin scan of
    # the WHOLE fwd dir — includes the new files, catching new-vs-new
    # collisions in the same pass)
    all_pairs = _scan_pairs_for_ids(fwd_dir, new_ids)
    new_urls = set(new_pairs["url"].to_pylist())
    groups: dict[int, set[str]] = {}
    for did, url in zip(all_pairs["doc_id"].to_pylist(),
                        all_pairs["url"].to_pylist()):
        groups.setdefault(did, set()).add(url)
    groups = {d: sorted(us) for d, us in groups.items() if len(us) > 1}
    if not groups:
        return {"n_collision_groups": 0, "n_remapped": 0,
                "rows_rewritten": 0}
    incumbents = {u for us in groups.values() for u in us
                  if u not in new_urls}
    remap = resolve_collisions(
        groups, is_used=lambda c: ids_in_use(fwd_dir, c),
        hash_fn=hash_fn, incumbents=incumbents)
    # a new url colliding with an incumbent url AND also being an exact
    # re-add of it (same url string) is generation handling, not a
    # collision — resolve_collisions never remaps the incumbent, and a
    # same-url new row keeps the same id by definition.
    n_rows = apply_remap_to_fwd(fwd_dir, remap, old_ids=groups,
                                files=new_files)
    merged = load_remap(index_dir)
    merged.update(remap)
    save_remap(index_dir, merged)
    logger.warning(
        "incremental doc-id resolution: %d groups, %d new urls re-idd, "
        "%d rows rewritten", len(groups), len(remap), n_rows)
    return {"n_collision_groups": len(groups), "n_remapped": len(remap),
            "rows_rewritten": n_rows}
