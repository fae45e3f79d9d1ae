"""Search-description result cache (BlsCache analogue).

BlackLab Server caches results keyed by the search's *description* — the
canonical string of the operation tree (wslib/src/main/java/nl/inl/
blacklab/server/search/BlsCache.java:104-120); repeated identical
searches return the cached result and popular searches stay warm via
LRU. Here the description is the canonical repr of (operation, args)
built by ``describe``; values are small Arrow tables (top-k results),
so an entry cap — not byte accounting — bounds memory (the reference's
heap-watermark eviction maps to Ray's object-store spill for big
intermediates, which never live in this cache).

The base cache is driver/actor-local: each query actor holds one
(replicas warm independently), exactly like each BLS node's cache.
``SharedCacheShard`` adds an OPTIONAL shared tier for skewed query
workloads: key-hash-sharded cache actors consulted on local miss, so a
query popular across the whole pool is computed once cluster-wide
instead of once per replica (the reference's single-JVM BlsCache gets
this for free; a replica pool needs an explicit shared tier).
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import Any, Callable


def describe(op: str, **kwargs) -> str:
    """Canonical search description: operation + sorted kwargs. Lists
    are normalized to tuples so equal queries collide."""
    parts = [op]
    for k in sorted(kwargs):
        v = kwargs[k]
        if isinstance(v, (list, tuple)):
            v = tuple(v)
        parts.append(f"{k}={v!r}")
    return ";".join(parts)


class SearchCache:
    """LRU memo of search results keyed by description."""

    def __init__(self, max_entries: int = 256):
        self._max = max_entries
        self._d: OrderedDict[str, Any] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get_or_run(self, key: str, fn: Callable[[], Any]) -> Any:
        if key in self._d:
            self._d.move_to_end(key)
            self.hits += 1
            return self._d[key]
        self.misses += 1
        val = fn()
        self._d[key] = val
        if len(self._d) > self._max:
            self._d.popitem(last=False)
        return val

    def invalidate(self) -> None:
        """Drop everything (index updated — the BlsCache clear-on-
        index-change behavior)."""
        self._d.clear()

    def stats(self) -> dict:
        return {"entries": len(self._d), "hits": self.hits,
                "misses": self.misses}


def cache_shard_of(key: str, n_shards: int) -> int:
    """Stable key→shard routing (md5-based, process-independent —
    Python's hash() is seed-randomized across workers)."""
    return int.from_bytes(hashlib.md5(key.encode()).digest()[:4],
                          "little") % n_shards


class SharedCacheShard:
    """One shard of the pool-shared result-cache tier.

    Held as a Ray actor (wrapped by the service); values are small
    top-k result lists, entry-capped LRU like SearchCache. Sharding by
    key hash keeps any one actor from becoming the pool's hot spot;
    readers call ``get`` on local miss (one sub-ms round trip) and
    populate with a fire-and-forget ``put`` so the shared tier is
    never on the critical path of a cold query."""

    def __init__(self, max_entries: int = 4096):
        self._c = SearchCache(max_entries=max_entries)

    def get(self, key: str):
        if key in self._c._d:
            self._c._d.move_to_end(key)
            self._c.hits += 1
            return self._c._d[key]
        self._c.misses += 1
        return None

    def put(self, key: str, val: Any) -> None:
        self._c._d[key] = val
        if len(self._c._d) > self._c._max:
            self._c._d.popitem(last=False)

    def invalidate(self) -> None:
        self._c.invalidate()

    def stats(self) -> dict:
        return self._c.stats()
