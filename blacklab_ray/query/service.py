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

    def __init__(self, index_dir: str, cache_entries: int = 256):
        from blacklab_ray.query import IndexReader
        from blacklab_ray.query.cache import SearchCache
        from blacklab_ray.util import pin_worker_arrow_threads
        pin_worker_arrow_threads()
        self.reader = IndexReader(index_dir)
        self.cache = SearchCache(max_entries=cache_entries)
        _ = self.reader.terms_table  # warm the dictionary once per actor

    def search(self, terms, k=10, mode="or", algo="auto"):
        from blacklab_ray.query import search
        from blacklab_ray.query.cache import describe
        t0 = time.perf_counter()
        key = describe("search", terms=terms, k=k, mode=mode, algo=algo)
        rows = self.cache.get_or_run(
            key, lambda: search(self.reader, terms, k=k, mode=mode,
                                algo=algo).to_pylist())
        return {"rows": rows, "seconds": time.perf_counter() - t0}

    def phrase(self, terms, k=10):
        from blacklab_ray.query import phrase_search
        from blacklab_ray.query.cache import describe
        t0 = time.perf_counter()
        key = describe("phrase", terms=terms, k=k)
        rows = self.cache.get_or_run(
            key, lambda: phrase_search(self.reader, terms,
                                       k=k).to_pylist())
        return {"rows": rows, "seconds": time.perf_counter() - t0}

    def cache_stats(self):
        return self.cache.stats()


class QueryService:
    """Driver-side handle on a pool of query actors."""

    def __init__(self, index_dir: str, n_actors: int = 4,
                 num_cpus_per_actor: float = 1):
        actor_cls = ray.remote(num_cpus=num_cpus_per_actor)(QueryWorker)
        self._actors = [actor_cls.remote(index_dir)
                        for _ in range(n_actors)]
        self._rr = 0

    def submit(self, terms, k=10, mode="or", algo="auto"):
        a = self._actors[self._rr % len(self._actors)]
        self._rr += 1
        return a.search.remote(terms, k=k, mode=mode, algo=algo)

    def search_many(self, queries: list[dict]) -> list[dict]:
        """Run a query batch across the pool; returns results in order."""
        refs = [self.submit(q["terms"], k=q.get("k", 10),
                            mode=q.get("mode", "or"),
                            algo=q.get("algo", "auto"))
                for q in queries]
        return ray.get(refs)

    def shutdown(self):
        for a in self._actors:
            ray.kill(a)
        self._actors = []
