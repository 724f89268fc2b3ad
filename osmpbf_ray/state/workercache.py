"""Per-worker-process single-slot cache for task-based stages.

Elastic tasks (no actor pool) still want once-per-worker setup — a
spatial index, a broadcast payload table — without paying it per batch.
The cache is bounded at ONE entry so long-lived Ray workers never
accumulate stale state across jobs (the cached copy outlives the
driver's object ref).
"""

from __future__ import annotations

_CACHE: dict = {}


def cached(key, build):
    """Return ``build()`` memoized per worker process under ``key``;
    a new key evicts the previous entry."""
    if _CACHE.get("key") != key:
        _CACHE.clear()
        _CACHE["key"] = key
        _CACHE["value"] = build()
    return _CACHE["value"]
