"""Per-worker-process bounded cache for task-based stages.

Elastic tasks (no actor pool) still want once-per-worker setup — a
spatial index, a broadcast payload table — without paying it per batch.
The cache holds a FEW entries (FIFO-bounded) so (a) two stages of the
SAME pipeline interleaving on one worker (Ray's streaming executor does
this — e.g. ivf_topk's assign → probe) don't evict each other per
batch, and (b) long-lived Ray workers still can't accumulate unbounded
stale state across jobs (each cached copy outlives the driver's object
ref).
"""

from __future__ import annotations

_CACHE: dict = {}
_MAX_ENTRIES = 8


def cached(key, build):
    """Return ``build()`` memoized per worker process under ``key``;
    oldest entries evict FIFO beyond the bound."""
    if key not in _CACHE:
        while len(_CACHE) >= _MAX_ENTRIES:
            _CACHE.pop(next(iter(_CACHE)))
        _CACHE[key] = build()
    return _CACHE[key]


def task_stage(cls, key_extra: tuple, **ctor):
    """Wrap a callable stage CLASS as a plain function for elastic-task
    ``map_batches``, building the instance once per worker process via
    :func:`cached`. Use when per-instance setup is cheap (a broadcast
    ``ray.get``, a few constants): an actor pool would pay seconds of
    spin-up per pipeline for state that costs microseconds to rebuild,
    and tasks scale to free CPUs instead of the pool's fixed cap. Keep
    actor pools for stages whose setup is genuinely expensive.

    The cache key covers the constructor kwargs too (by ``repr``, which
    is stable within a session for ObjectRefs/actor handles), so two
    wrappings of the same class with different config can never serve
    each other's instance; ``key_extra`` remains for values whose repr
    is unstable or oversized."""
    key = (cls.__name__, *key_extra,
           tuple(sorted((k, repr(v)) for k, v in ctor.items())))

    def fn(batch):
        return cached(key, lambda: cls(**ctor))(batch)

    fn.__name__ = cls.__name__
    return fn
