"""Approximate aggregation sketches: HyperLogLog distinct count.

Engine-new (SURVEY.md §2.6: the reference has only user folds and
min/max; no sketches). The 100-TB motivation: exact COUNT(DISTINCT)
shuffles every distinct key (the engine's ``distinct_count`` query moves
one row per key), while an HLL sketch is a FIXED 2^p-byte register array
that merges associatively — the whole reduction is
``map_batches(partial sketch) → tiny driver/tree merge``, no shuffle at
all. Standard HLL per Flajolet et al. 2007 with the usual small-range
(linear counting) correction; hashes are splitmix64 — deterministic
across processes, like every other hash in the engine.

Relative error ≈ 1.04 / sqrt(2^p): p=12 → ~1.6% typical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osmpbf_ray.stages.text import splitmix64


def _hash_u64(col: np.ndarray) -> np.ndarray:
    a = np.asarray(col)
    if a.dtype.kind in "iu":
        return splitmix64(a.astype(np.int64).view(np.uint64))
    import pandas as pd

    return splitmix64(
        pd.util.hash_array(a.astype(object), categorize=False).astype(np.uint64)
    )


def hll_partial(values: np.ndarray, p: int = 12) -> np.ndarray:
    """One batch → 2^p uint8 registers (max leading-zero rank per bucket)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash_u64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rank = position of the first 1-bit in `rest` (1-based), capped
    rank = np.ones(len(h), dtype=np.uint8)
    probe = np.uint64(1) << np.uint64(63)
    bit = rest & probe
    remaining = bit == 0
    while remaining.any() and rank.max() < 64 - p + 1:
        rank[remaining] += 1
        rest = rest << np.uint64(1)
        remaining = remaining & ((rest & probe) == 0)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Registers → cardinality estimate (bias-corrected harmonic mean)."""
    m = len(regs)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(2.0 ** (-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:  # small-range: linear counting
        return m * float(np.log(m / zeros))
    return float(est)


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Distributed approximate COUNT(DISTINCT): per-batch register
    sketches (map-side), one tiny driver merge of 2^p-byte arrays —
    the par_map_reduce contract (reference src/reader.rs:119-142) with
    a mergeable sketch as the fold state."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        regs = hll_partial(vals, p)
        return pa.table({"regs": pa.array([regs.tobytes()], type=pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    regs = np.zeros(1 << p, dtype=np.uint8)
    for t in ray.get(parts.to_arrow_refs()):
        for blob in t.column("regs").to_pylist():
            regs = hll_merge(regs, np.frombuffer(blob, dtype=np.uint8))
    return hll_estimate(regs)
