"""Replicated query-actor serving (BlackLab Server's executor analogue).

BlackLab serves searches from a thread pool over shared mmap'd index
state (search/BlackLabEngine.java:73,105 + BlsCache); the Ray-native
equivalent is a pool of query actors, each holding an IndexReader (terms
stats + doc table loaded once per actor, postings read lazily with
bucket pruning), with queries distributed round-robin. Throughput scales
with actors; per-query latency is the engine's.
"""

from __future__ import annotations

import time

import ray


class QueryWorker:
    """One replica: holds reader state + a description-keyed result
    cache (each replica warms independently, like each BLS node's
    BlsCache)."""

    def __init__(self, index_dir: str, cache_entries: int = 256,
                 shared_cache: list | None = None):
        from blacklab_ray.query import open_reader
        from blacklab_ray.query.cache import SearchCache
        from blacklab_ray.util import pin_worker_arrow_threads
        pin_worker_arrow_threads()
        # comma-separated dirs -> federated MultiIndexReader replica
        self.reader = open_reader(index_dir)
        self.cache = SearchCache(max_entries=cache_entries)
        # optional L2: key-hash-sharded SharedCacheShard actor handles
        self._shared = list(shared_cache or [])
        self.shared_hits = 0
        _ = self.reader.terms_table  # warm the dictionary once per actor

    def _cached(self, key: str, fn):
        """L1 local LRU → L2 shared tier (on miss, one round trip) →
        compute; computed values populate L2 fire-and-forget so cold
        queries never block on the shared actor."""
        from blacklab_ray.query.cache import cache_shard_of
        if not self._shared:
            return self.cache.get_or_run(key, fn)
        shard = self._shared[cache_shard_of(key, len(self._shared))]

        def l2_or_run():
            val = ray.get(shard.get.remote(key))
            if val is not None:
                self.shared_hits += 1
                return val
            val = fn()
            shard.put.remote(key, val)
            return val

        return self.cache.get_or_run(key, l2_or_run)

    def search(self, terms, k=10, mode="or", algo="auto"):
        from blacklab_ray.query import search
        from blacklab_ray.query.cache import describe
        t0 = time.perf_counter()
        key = describe("search", terms=terms, k=k, mode=mode, algo=algo)
        rows = self._cached(
            key, lambda: search(self.reader, terms, k=k, mode=mode,
                                algo=algo).to_pylist())
        return {"rows": rows, "seconds": time.perf_counter() - t0}

    def phrase(self, terms, k=10):
        from blacklab_ray.query import phrase_search
        from blacklab_ray.query.cache import describe
        t0 = time.perf_counter()
        key = describe("phrase", terms=terms, k=k)
        rows = self._cached(
            key, lambda: phrase_search(self.reader, terms,
                                       k=k).to_pylist())
        return {"rows": rows, "seconds": time.perf_counter() - t0}

    def cache_stats(self):
        out = self.cache.stats()
        out["shared_hits"] = self.shared_hits
        return out


class ShardWorker:
    """One term-bucket shard of the index (ROADMAP 7 / VERDICT r1 #10).

    Holds reader state for a SUBSET of posting buckets, so per-actor
    memory (terms table slice, segment LRU) scales with 1/n_shards of
    the index instead of the whole of it — the whole-index-replica
    design's memory ceiling. Every term lives in exactly one bucket
    (bucket = hash64(term) % num_buckets), so a term's full posting
    list is shard-local and partial scores are exact.
    """

    def __init__(self, index_dir: str, buckets: list[int],
                 cache_terms: int = 4096):
        from blacklab_ray.query import IndexReader
        from blacklab_ray.util import pin_worker_arrow_threads
        pin_worker_arrow_threads()
        self.reader = IndexReader(index_dir)
        self._buckets = frozenset(buckets)
        # keep only this shard's vocabulary slice in memory
        import numpy as np
        import pyarrow as pa

        from blacklab_ray.stages.tokenize import hash64
        tbl = self.reader.terms_table
        nb = self.reader.num_buckets
        from blacklab_ray.util import hash64_batch
        mask = np.isin((hash64_batch(tbl["term"]) % nb).astype(np.int64),
                       np.fromiter(self._buckets, np.int64))
        self.reader._terms_tbl = tbl.filter(pa.array(mask))
        self._partial_cache: dict = {}
        self._cache_max = cache_terms

    def term_partials(self, terms: list[str], quantize: bool = True):
        """Per-term (doc_ids, scores) for this shard's terms — the
        scatter half of scatter-gather. Cached per term (a term-level
        memo outlives any single query's description)."""
        import numpy as np

        from blacklab_ray.query.bm25 import idf
        from blacklab_ray.query.engine import _term_arrays
        out = {}
        stats = self.reader.term_stats(terms)
        segs = self.reader.segments([t for t in terms if t in stats])
        for t in terms:
            if t not in stats:
                continue
            key = (t, quantize)
            if key not in self._partial_cache:
                t_idf = float(idf(stats[t][0], self.reader.n_docs))
                d, s, _ = _term_arrays(self.reader, segs[t], t_idf,
                                       quantize)
                if len(self._partial_cache) >= self._cache_max:
                    self._partial_cache.pop(
                        next(iter(self._partial_cache)))
                self._partial_cache[key] = (d, s)
            out[t] = self._partial_cache[key]
        return out


class ShardedQueryService:
    """Scatter-gather serving over term-bucket shards.

    Query path: terms route to their buckets' shards (one round-trip
    per involved shard, in parallel), each returns exact per-term
    (doc, score) partials, and the driver sums + top-ks — identical
    math to search_taat, distributed by term. Unlike whole-index
    replicas, adding shards DIVIDES per-actor memory instead of
    copying it."""

    def __init__(self, index_dir: str, n_shards: int = 4,
                 num_cpus_per_actor: float = 1):
        import json
        import os
        with open(os.path.join(index_dir, "meta.json")) as f:
            nb = json.load(f)["params"]["num_buckets"]
        self.num_buckets = nb
        actor_cls = ray.remote(num_cpus=num_cpus_per_actor)(ShardWorker)
        self._shard_of_bucket = {b: b % n_shards for b in range(nb)}
        self._actors = []
        for s in range(n_shards):
            buckets = [b for b in range(nb) if b % n_shards == s]
            self._actors.append(actor_cls.remote(index_dir, buckets))

    def _scatter(self, terms: list[str], quantize: bool) -> list:
        from blacklab_ray.stages.tokenize import hash64
        by_shard: dict[int, list[str]] = {}
        for t in terms:
            s = self._shard_of_bucket[hash64(t) % self.num_buckets]
            by_shard.setdefault(s, []).append(t)
        return [self._actors[s].term_partials.remote(ts, quantize)
                for s, ts in by_shard.items()]

    def _gather(self, terms: list[str], refs: list, k: int,
                mode: str, t0: float) -> dict:
        import numpy as np
        partials: dict[str, tuple] = {}
        for r in ray.get(refs):
            partials.update(r)
        present = [t for t in terms if t in partials]
        if not present or (mode == "and" and len(present) < len(terms)):
            return {"rows": [], "seconds": time.perf_counter() - t0}
        docs = np.concatenate([partials[t][0] for t in present])
        scores = np.concatenate([partials[t][1] for t in present])
        uniq, inv = np.unique(docs, return_inverse=True)
        sums = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(sums, inv, scores)
        if mode == "and":
            counts = np.bincount(inv, minlength=uniq.size)
            keep = counts == len(present)
            uniq, sums = uniq[keep], sums[keep]
        order = np.lexsort((uniq, -sums))[:k]
        rows = [{"doc_id": int(d), "score": float(s), "rank": i + 1}
                for i, (d, s) in enumerate(zip(uniq[order], sums[order]))]
        return {"rows": rows, "seconds": time.perf_counter() - t0}

    def search(self, terms: list[str], k: int = 10,
               mode: str = "or", quantize: bool = True) -> dict:
        t0 = time.perf_counter()
        terms = list(dict.fromkeys(terms))
        refs = self._scatter(terms, quantize)
        return self._gather(terms, refs, k, mode, t0)

    def search_many(self, queries: list[dict]) -> list[dict]:
        """Batch path: ALL scatter calls are issued before any gather,
        so shard work pipelines across queries instead of serializing
        on per-query round trips."""
        t0 = time.perf_counter()
        prep = []
        for q in queries:
            terms = list(dict.fromkeys(q["terms"]))
            prep.append((q, terms, self._scatter(terms, True)))
        return [self._gather(terms, refs, q.get("k", 10),
                             q.get("mode", "or"), t0)
                for q, terms, refs in prep]

    def shutdown(self):
        for a in self._actors:
            ray.kill(a)
        self._actors = []


class QueryService:
    """Driver-side handle on a pool of query actors.

    ``shared_cache_shards > 0`` adds the pool-shared L2 result-cache
    tier (ROADMAP r3: per-actor memos don't help a skewed workload
    whose hot query lands on every replica — the shared tier computes
    it once pool-wide)."""

    def __init__(self, index_dir: str, n_actors: int = 4,
                 num_cpus_per_actor: float = 1,
                 shared_cache_shards: int = 0,
                 shared_cache_entries: int = 4096):
        from blacklab_ray.query.cache import SharedCacheShard
        self._cache_actors = []
        if shared_cache_shards:
            shard_cls = ray.remote(num_cpus=0.1)(SharedCacheShard)
            self._cache_actors = [
                shard_cls.remote(max_entries=shared_cache_entries)
                for _ in range(shared_cache_shards)]
        actor_cls = ray.remote(num_cpus=num_cpus_per_actor)(QueryWorker)
        self._actors = [
            actor_cls.remote(index_dir,
                             shared_cache=self._cache_actors or None)
            for _ in range(n_actors)]
        self._rr = 0

    def submit(self, terms, k=10, mode="or", algo="auto",
               routing: str = "roundrobin"):
        """``routing="affinity"`` hashes the (sorted, deduped) term set
        to a fixed replica, so a repeated query always lands where its
        segments and result cache are already warm — the standard
        cache-affinity tradeoff vs round-robin's perfect load spread
        (a hot query can skew one replica; the shared L2 tier covers
        that case)."""
        if routing == "affinity":
            from blacklab_ray.stages.tokenize import hash64
            key = hash64("\x00".join(sorted(set(terms))))
            a = self._actors[key % len(self._actors)]
        else:
            a = self._actors[self._rr % len(self._actors)]
            self._rr += 1
        return a.search.remote(terms, k=k, mode=mode, algo=algo)

    def search_many(self, queries: list[dict],
                    routing: str = "roundrobin") -> list[dict]:
        """Run a query batch across the pool; returns results in order."""
        refs = [self.submit(q["terms"], k=q.get("k", 10),
                            mode=q.get("mode", "or"),
                            algo=q.get("algo", "auto"), routing=routing)
                for q in queries]
        return ray.get(refs)

    def shutdown(self):
        for a in self._actors + self._cache_actors:
            ray.kill(a)
        self._actors = []
        self._cache_actors = []
