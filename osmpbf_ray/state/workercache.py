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


def task_stage(cls, key_extra: tuple, **ctor):
    """Wrap a callable stage CLASS as a plain function for elastic-task
    ``map_batches``, building the instance once per worker process via
    :func:`cached`. Use when per-instance setup is cheap (a broadcast
    ``ray.get``, a few constants): an actor pool would pay seconds of
    spin-up per pipeline for state that costs microseconds to rebuild,
    and tasks scale to free CPUs instead of the pool's fixed cap. Keep
    actor pools for stages whose setup is genuinely expensive."""
    key = (cls.__name__, *key_extra)

    def fn(batch):
        return cached(key, lambda: cls(**ctor))(batch)

    fn.__name__ = cls.__name__
    return fn
