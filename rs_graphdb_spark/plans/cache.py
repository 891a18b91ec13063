"""Keyed query-result cache with TTL + size cap.

Reference: query-fingerprint result cache (`/root/reference/src/cache/
query_cache.rs:13-230`) and the LRU cache manager with invalidation hooks
(`src/cache/manager.rs:12-345`).

Spark mapping (SURVEY.md §4.1): executor-side data caching is
`df.persist()` — what this class adds is the reference's *result-reuse*
layer: fingerprint → persisted DataFrame, TTL expiry, LRU size cap, and
table-based invalidation (mutating a table evicts every cached result
derived from it). Opt-in per query, like the reference
(`src/query.rs:653-702`).
"""

from __future__ import annotations

import time
from collections import OrderedDict
from collections.abc import Callable

from pyspark.sql import DataFrame


class QueryCache:
    def __init__(self, max_entries: int = 64, ttl_seconds: float = 300.0):
        self.max_entries = max_entries
        self.ttl = ttl_seconds
        self._entries: OrderedDict[str, tuple[DataFrame, float, frozenset]] = (
            OrderedDict()
        )
        self.hits = 0
        self.misses = 0

    def get_or_compute(
        self,
        fingerprint: str,
        compute: Callable[[], DataFrame],
        tables: tuple[str, ...] = (),
    ) -> DataFrame:
        """Return the cached (persisted) DataFrame for ``fingerprint``,
        else compute, persist, and remember it. ``tables``: source-table
        names used for invalidation."""
        now = time.monotonic()
        hit = self._entries.get(fingerprint)
        if hit is not None:
            df, born, _ = hit
            if now - born <= self.ttl:
                self._entries.move_to_end(fingerprint)
                self.hits += 1
                return df
            self._evict(fingerprint)
        self.misses += 1
        df = compute().persist()
        self._entries[fingerprint] = (df, now, frozenset(tables))
        while len(self._entries) > self.max_entries:
            self._evict(next(iter(self._entries)))
        return df

    def invalidate_table(self, table: str) -> int:
        """Evict every result derived from ``table`` (the reference's
        write-hook invalidation, `src/cache/manager.rs:200-345`)."""
        victims = [k for k, (_, _, t) in self._entries.items() if table in t]
        for k in victims:
            self._evict(k)
        return len(victims)

    def clear(self) -> None:
        for k in list(self._entries):
            self._evict(k)

    def cleanup(self) -> int:
        """Evict TTL-expired entries; returns how many were removed (the
        reference's `POST /cache/cleanup`, `src/server.rs:110`)."""
        now = time.monotonic()
        victims = [k for k, (_, born, _) in self._entries.items()
                   if now - born > self.ttl]
        for k in victims:
            self._evict(k)
        return len(victims)

    def _evict(self, key: str) -> None:
        df, _, _ = self._entries.pop(key)
        df.unpersist()

    def stats(self) -> dict:
        return {
            "entries": len(self._entries),
            "hits": self.hits,
            "misses": self.misses,
        }
