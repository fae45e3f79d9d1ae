"""Link-graph operators: distributed PageRank over an edge list.

The web-pipeline companion to ``stages/htmltext.extract_links`` — once
a crawl is an (src, dst) edge table, rank is the standard quality /
crawl-priority signal (Page et al. 1999). No reference analogue
(BlackLab has no graph surface); the scale shape is classic BSP
PageRank on raw Ray tasks — the same escape hatch as
``dedup.duplicate_clusters``, because an iterate-to-fixpoint graph
algorithm is the one shape the Dataset API can't express without
re-planning a full shuffle every round (a first Dataset-based version
of this loop measured ~18 s/iteration of scheduling overhead on an
876-node graph; the task loop runs the same 3 iterations in < 1 s).

Partitioning assumption (documented per the custom-operator contract):
edges are hash-sharded ONCE by ``hash(src) % P`` into object-store
shards; node/rank shards use the SAME hash, so rank(src) lookups are
shard-local (an edge's src rank always lives in its own part). Each
iteration runs P contribution tasks (local searchsorted rank lookup,
per-dst pre-sum — a combiner before the exchange — then
``num_returns=P`` routing by ``hash(dst)``) and P apply tasks (align
incoming sums to the shard's node list, ``rank' = (1-d)/N + d·sum``).
Shuffled bytes per iteration ≈ distinct (shard, dst) pairs × 16 B —
never corpus-sized, no driver traffic.

Semantics (shared verbatim with the SQL oracle):
``rank_0 = 1/N``;
``rank_{i+1}(n) = (1-d)/N + d * Σ_{(s→n)} rank_i(s)/outdeg(s)``.
Multi-edges count once per occurrence; dangling-node mass is DROPPED
by default (ranks then sum to < 1 — the common "weighted PageRank over
the link graph" simplification); ``redistribute_dangling=True``
spreads it uniformly (the textbook stochastic completion).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from blacklab_ray.util import part_of


def _part_of(keys: np.ndarray, P: int) -> np.ndarray:
    return part_of(keys, P)


def _route(P: int, keys: np.ndarray, *payloads: np.ndarray):
    """Sort rows by destination part → P tuples of routed columns."""
    part = _part_of(keys, P)
    order = np.argsort(part, kind="stable")
    part = part[order]
    bounds = np.searchsorted(part, np.arange(P + 1))
    cols = [keys[order]] + [pl[order] for pl in payloads]
    return [tuple(c[bounds[p]:bounds[p + 1]] for c in cols)
            for p in range(P)]


def _graph_make_tasks(src_col: str, dst_col: str):
    """Remote task definitions shared by PageRank and HITS (module-
    level factory — pickled once). One BSP machine: hash-sharded
    edges, shard-local score lookups, per-target pre-summed
    contributions routed by hash(target), per-node apply. PageRank
    uses the out-degree weighting (``use_inv=True``) and the
    ``base + extra + d*sums`` apply; HITS passes ``use_inv=False``
    and ``base=0, d=1, extra=0`` (plain sums) — one implementation,
    so a fix in the route/pre-sum machinery reaches both."""
    import ray

    @ray.remote
    def _split(block: pa.Table, P: int, by_dst: bool = False):
        """One edge block → P (key, other) pieces routed by the
        hashed side (src by default; dst when ``by_dst``)."""
        if block.num_rows == 0 or src_col not in block.column_names \
                or dst_col not in block.column_names:
            e = np.empty(0, np.int64)
            return [(e, e)] * P
        s = block.column(src_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t = block.column(dst_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return _route(P, t, s) if by_dst else _route(P, s, t)

    @ray.remote
    def _build_shard(*pieces):
        """One part's edge pieces → (key_sorted, other, inv_outdeg,
        distinct key set). All edges of a key land in one shard, so
        the key side's degree is local; ``inv`` is 1/outdeg per edge
        (PageRank's weighting — HITS ignores it)."""
        key = np.concatenate([p[0] for p in pieces]) \
            if pieces else np.empty(0, np.int64)
        oth = np.concatenate([p[1] for p in pieces]) \
            if pieces else np.empty(0, np.int64)
        order = np.argsort(key, kind="stable")
        key, oth = key[order], oth[order]
        ukey, counts = np.unique(key, return_counts=True)
        inv = np.zeros(key.size, np.float64)
        if key.size:
            inv = 1.0 / np.repeat(counts.astype(np.float64), counts)
        return key, oth, inv, ukey

    @ray.remote
    def _node_pieces(block: pa.Table, P: int):
        """Distinct src∪dst of one block routed by node hash."""
        if block.num_rows == 0 or src_col not in block.column_names \
                or dst_col not in block.column_names:
            return [(np.empty(0, np.int64),)] * P
        s = block.column(src_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t = block.column(dst_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return _route(P, np.unique(np.concatenate([s, t])))

    @ray.remote
    def _build_nodes(*pieces):
        vs = [p[0] for p in pieces if p[0].size]
        return (np.unique(np.concatenate(vs)) if vs
                else np.empty(0, np.int64))

    @ray.remote
    def _contribs(shard, nodes, score, P: int, use_inv: bool = True):
        """One part: per-target pre-summed contributions routed by
        hash(target). Deterministic order (key-sorted edges, then
        target-sorted within the pre-sum). ``use_inv`` applies the
        1/outdeg PageRank weighting; HITS sums raw scores."""
        key, oth, inv, _ = shard
        if key.size == 0:
            e = np.empty(0, np.int64)
            f = np.empty(0, np.float64)
            return [(e, f)] * P
        contrib = score[np.searchsorted(nodes, key)]
        if use_inv:
            contrib = contrib * inv
        order = np.argsort(oth, kind="stable")
        oth, contrib = oth[order], contrib[order]
        heads = np.ones(oth.size, bool)
        heads[1:] = oth[1:] != oth[:-1]
        idx = np.cumsum(heads) - 1
        uoth = oth[heads]
        sums = np.zeros(uoth.size, np.float64)
        np.add.at(sums, idx, contrib)
        return _route(P, uoth, sums)

    @ray.remote
    def _dangling_mass(shard, nodes, rank):
        """Σ rank over this part's dangling nodes (no out-edges)."""
        ukey = shard[3]
        if nodes.size == 0:
            return 0.0
        has_out = np.zeros(nodes.size, bool)
        if ukey.size:
            has_out[np.searchsorted(nodes, ukey)] = True
        return float(rank[~has_out].sum())

    @ray.remote
    def _apply(nodes, base: float, d: float, extra: float,
               *msg_pieces):
        """One part: score' per local node from incoming per-part
        sums (accumulated in sorted piece order — deterministic).
        PageRank: ``base=(1-d)/N``, ``extra`` = redistributed
        dangling mass per node; HITS: base=0, d=1, extra=0."""
        sums = np.zeros(nodes.size, np.float64)
        for mn, ms in msg_pieces:
            if mn.size:
                pos = np.searchsorted(nodes, mn)
                np.add.at(sums, pos, ms)
        return base + extra + d * sums

    return (_split, _build_shard, _node_pieces, _build_nodes,
            _contribs, _dangling_mass, _apply)


def pagerank(edges: ray.data.Dataset | pa.Table, n_iter: int = 3,
             damping: float = 0.85, src_col: str = "src",
             dst_col: str = "dst",
             redistribute_dangling: bool = False,
             num_partitions: int | None = None) -> ray.data.Dataset:
    """(node, rank) after ``n_iter`` synchronous iterations.

    ``redistribute_dangling=True`` spreads each iteration's dangling
    rank mass uniformly (ranks then sum to exactly 1 — the textbook
    stochastic-matrix completion); the per-iteration cost is one extra
    P-way scalar reduction on the driver."""
    import ray

    if isinstance(edges, pa.Table):
        edges = ray.data.from_arrow(edges)
    edges = edges.materialize()
    if num_partitions is None:
        cpus = max(2, int(ray.cluster_resources().get("CPU", 8)))
        num_partitions = min(max(2, edges.count() // 500_000 + 1),
                             min(64, cpus))
    P = max(2, num_partitions)
    d = float(damping)
    (_split, _build_shard, _node_pieces, _build_nodes, _contribs,
     _dangling_mass, _apply) = _graph_make_tasks(src_col, dst_col)

    @ray.remote
    def _emit(nodes, rank) -> pa.Table:
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "rank": pa.array(rank, pa.float64())})

    blocks = edges.to_arrow_refs()
    esplits = [_split.options(num_returns=P).remote(b, P)
               for b in blocks]
    shards = [_build_shard.remote(*[s[p] for s in esplits])
              for p in range(P)]
    nsplits = [_node_pieces.options(num_returns=P).remote(b, P)
               for b in blocks]
    nodes = [_build_nodes.remote(*[s[p] for s in nsplits])
             for p in range(P)]
    n_nodes = int(sum(ray.get(
        [ray.remote(lambda n: n.size).remote(nd) for nd in nodes])))
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank": pa.array([], pa.float64())}))
    base = (1.0 - d) / n_nodes

    init = ray.remote(
        lambda nd, n: np.full(nd.size, 1.0 / n, np.float64))
    ranks = [init.remote(nodes[p], n_nodes) for p in range(P)]

    for _ in range(n_iter):
        msgs = [_contribs.options(num_returns=P).remote(
            shards[p], nodes[p], ranks[p], P) for p in range(P)]
        extra = 0.0
        if redistribute_dangling:
            extra = d * sum(ray.get(
                [_dangling_mass.remote(shards[p], nodes[p], ranks[p])
                 for p in range(P)])) / n_nodes
        ranks = [_apply.remote(nodes[q], base, d, extra,
                               *[msgs[p][q] for p in range(P)])
                 for q in range(P)]

    return ray.data.from_arrow_refs(
        [_emit.remote(nodes[p], ranks[p]) for p in range(P)])


# ---------------------------------------------------------------------------
# HITS (Kleinberg 1999): hubs & authorities
# ---------------------------------------------------------------------------

def _hits_extra_tasks():
    """HITS-only task definitions — the shared BSP machinery (split/
    shard/contribs/apply) comes from :func:`_graph_make_tasks`; HITS
    adds only the L2-normalization pair and its emit."""
    import ray

    @ray.remote
    def _sumsq(score) -> float:
        return float((score * score).sum())

    @ray.remote
    def _scale(score, norm: float):
        return score / norm if norm > 0 else score

    @ray.remote
    def _emit(nodes, auth, hub) -> pa.Table:
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "authority": pa.array(auth, pa.float64()),
                         "hub": pa.array(hub, pa.float64())})

    return _sumsq, _scale, _emit


def hits(edges: ray.data.Dataset | pa.Table, n_iter: int = 2,
         src_col: str = "src", dst_col: str = "dst",
         num_partitions: int | None = None) -> ray.data.Dataset:
    """(node, authority, hub) after ``n_iter`` HITS iterations.

    Semantics (shared verbatim with the SQL oracle): ``h_0 = 1`` for
    every node; each iteration computes
    ``a_i(n) = Σ_{(s→n)} h_{i-1}(s)`` then L2-normalizes ``a_i``, then
    ``h_i(n) = Σ_{(n→t)} a_i(t)`` then L2-normalizes ``h_i``.
    Multi-edges count per occurrence. Nodes with no in-edges get
    authority 0 (resp. hubs 0 without out-edges).

    Scale shape: identical to :func:`pagerank` — per-iteration shuffle
    is distinct (shard, target) pre-sums × 16 B; the L2 norm is a
    P-way scalar reduce on the driver."""
    import ray

    if isinstance(edges, pa.Table):
        edges = ray.data.from_arrow(edges)
    edges = edges.materialize()
    if num_partitions is None:
        cpus = max(2, int(ray.cluster_resources().get("CPU", 8)))
        num_partitions = min(max(2, edges.count() // 500_000 + 1),
                             min(64, cpus))
    P = max(2, num_partitions)
    (_split, _build_shard, _node_pieces, _build_nodes, _contribs,
     _dangling_mass, _apply) = _graph_make_tasks(src_col, dst_col)
    _sumsq, _scale, _emit = _hits_extra_tasks()

    blocks = edges.to_arrow_refs()
    fwd_sp = [_split.options(num_returns=P).remote(b, P, False)
              for b in blocks]
    rev_sp = [_split.options(num_returns=P).remote(b, P, True)
              for b in blocks]
    fwd = [_build_shard.remote(*[s[p] for s in fwd_sp])
           for p in range(P)]
    rev = [_build_shard.remote(*[s[p] for s in rev_sp])
           for p in range(P)]
    nsplits = [_node_pieces.options(num_returns=P).remote(b, P)
               for b in blocks]
    nodes = [_build_nodes.remote(*[s[p] for s in nsplits])
             for p in range(P)]
    sizes = ray.get([ray.remote(lambda n: n.size).remote(nd)
                     for nd in nodes])
    if sum(sizes) == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "authority": pa.array([], pa.float64()),
            "hub": pa.array([], pa.float64())}))

    ones = ray.remote(lambda nd: np.ones(nd.size, np.float64))
    hub = [ones.remote(nodes[p]) for p in range(P)]
    auth = hub

    def _half(shards, score):
        """One half-iteration: exchange + apply + global L2 scale.
        HITS sums RAW scores (use_inv=False) with the identity apply
        (base=0, d=1, extra=0)."""
        msgs = [_contribs.options(num_returns=P).remote(
            shards[p], nodes[p], score[p], P, False)
            for p in range(P)]
        out = [_apply.remote(nodes[q], 0.0, 1.0, 0.0,
                             *[msgs[p][q] for p in range(P)])
               for q in range(P)]
        norm = float(np.sqrt(sum(ray.get(
            [_sumsq.remote(s) for s in out]))))
        return [_scale.remote(s, norm) for s in out]

    for _ in range(n_iter):
        auth = _half(fwd, hub)   # a(n) = Σ h(s) over s→n
        hub = _half(rev, auth)   # h(n) = Σ a(t) over n→t

    return ray.data.from_arrow_refs(
        [_emit.remote(nodes[p], auth[p], hub[p]) for p in range(P)])


# ---------------------------------------------------------------------------
# anchor-text aggregation
# ---------------------------------------------------------------------------

def anchor_texts(links: ray.data.Dataset, target_col: str = "href",
                 anchor_col: str = "anchor", max_per_target: int = 20,
                 num_partitions: int = 32) -> ray.data.Dataset:
    """Per-target anchor-text profile: (target, n_links, n_anchors,
    anchors) where ``anchors`` is the lexicographically-first
    ``max_per_target`` DISTINCT non-empty anchor strings joined by
    ``" | "`` — the classic target-side relevance/label signal a web
    corpus derives from its link graph (anchor text describes the
    TARGET; e.g. TF-IDF over anchors ≈ a free query log).

    Scale shape: one part-hash shuffle on ``hash(target) % P``, one
    UDF call per partition (not per target — run boundaries come from
    one lexsort; the inner loop is the per-target STRING work itself,
    dedup+cap, which no Arrow kernel expresses); per-target output is
    capped and deterministic, so a hub page with 10^9 in-links costs
    its partition one sort, not an unbounded string blob."""
    import pyarrow.compute as pc

    from blacklab_ray.pipelines.hits import md5_low64
    P = num_partitions
    SCHEMA = pa.schema([("target", pa.string()),
                        ("n_links", pa.int64()),
                        ("n_anchors", pa.int64()),
                        ("anchors", pa.string())])

    def _tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or target_col not in t.column_names:
            return pa.schema([("part", pa.int64()),
                              ("target", pa.string()),
                              ("anchor", pa.string())]).empty_table()
        from blacklab_ray.util import md5_low64_batch
        tgt = t.column(target_col).cast(pa.string())
        key = md5_low64_batch(tgt).view(np.int64)  # md5 is unsigned
        return pa.table({
            "part": pa.array(_part_of(key, P), pa.int64()),
            "target": tgt,
            "anchor": t.column(anchor_col).cast(pa.string())
            if anchor_col in t.column_names
            else pa.nulls(t.num_rows, pa.string()),
        })

    def _fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "target" not in g.column_names:
            return SCHEMA.empty_table()
        tgt = np.asarray(g.column("target").to_pylist(), dtype=object)
        anc = np.asarray(
            g.column("anchor").fill_null("").to_pylist(), dtype=object)
        order = np.lexsort((anc, tgt))
        tgt, anc = tgt[order], anc[order]
        heads = np.ones(tgt.size, bool)
        heads[1:] = tgt[1:] != tgt[:-1]
        starts = np.flatnonzero(heads)
        ends = np.append(starts[1:], tgt.size)
        out_t, out_n, out_na, out_a = [], [], [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            texts = [a for a in anc[s:e] if a]
            uniq = sorted(set(texts))
            out_t.append(tgt[s])
            out_n.append(e - s)
            out_na.append(len(texts))
            out_a.append(" | ".join(uniq[:max_per_target]))
        return pa.table({
            "target": pa.array(out_t, pa.string()),
            "n_links": pa.array(out_n, pa.int64()),
            "n_anchors": pa.array(out_na, pa.int64()),
            "anchors": pa.array(out_a, pa.string())})

    return links.map_batches(_tag, batch_format="pyarrow") \
        .groupby("part").map_groups(_fold, batch_format="pyarrow")
