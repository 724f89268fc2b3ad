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
    """Registers → cardinality estimate (bias-corrected harmonic mean).

    The harmonic denominator ``sum(2^-reg)`` is computed EXACTLY as the
    integer ``sum(2^(64-reg)) / 2^64`` (every term is a power of two, so
    the whole sum fits a Python int) — float-summation order can round
    differently, and the DuckDB oracle reproduces the integer form
    bit-for-bit (the oracle scales by 2^53, which is the same value:
    rescaling by a power of two is exact in IEEE double). Scaling by
    2^64 keeps the shift non-negative for ANY rank (rank reaches
    64-p+1, which exceeds 53 for the small-p sketches)."""
    m = len(regs)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    counts = np.bincount(regs)
    denom_int = sum(int(c) << (64 - r) for r, c in enumerate(counts) if c)
    est = alpha * m * m / (float(denom_int) / 2.0**64)
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:  # small-range: linear counting
        return m * float(np.log(m / zeros))
    return float(est)


def hll_registers(ds, col: str, p: int = 12) -> np.ndarray:
    """Distributed HLL sketch build: per-batch register partials
    (map-side), one tiny driver merge of 2^p-byte arrays — the
    par_map_reduce contract (reference src/reader.rs:119-142) with a
    mergeable sketch as the fold state. Returns the merged registers."""
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
    return regs


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Distributed approximate COUNT(DISTINCT) over the merged sketch."""
    return hll_estimate(hll_registers(ds, col, p))


# --- Bloom filter (join pre-filtering) ---------------------------------------


def bloom_build(values: np.ndarray, n_bits_pow: int = 20, k: int = 4) -> np.ndarray:
    """Bloom filter over a key set: 2^n_bits_pow bits, k probes.

    The 100-TB use: build from the SMALL join side, broadcast the fixed
    2^(n_bits_pow-3)-byte array via ``ray.put``, and drop most non-
    matching big-side rows BEFORE a shuffle join pays to move them.
    False-positive rate ≈ (1 − e^(−k·n/m))^k — at 1M keys in 2^23 bits
    with k=4 that is ~2.4%. No false negatives.
    """
    m = 1 << n_bits_pow
    bits = np.zeros(m >> 3, dtype=np.uint8)
    if len(values) == 0:
        return bits
    h = _hash_u64(values)
    mask = np.uint64(m - 1)
    for i in range(k):
        idx = ((h >> np.uint64(8 * i)) & mask).astype(np.int64)
        np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
    return bits


def bloom_contains(bits: np.ndarray, values: np.ndarray, k: int = 4) -> np.ndarray:
    """Vectorized membership probe: True = maybe present, False = absent."""
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    m = np.uint64(len(bits) << 3)
    h = _hash_u64(values)
    mask = m - np.uint64(1)
    out = np.ones(len(values), dtype=bool)
    for i in range(k):
        idx = ((h >> np.uint64(8 * i)) & mask).astype(np.int64)
        out &= (bits[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
    return out


def bloom_from_ds(ds, key_col: str, n_bits_pow: int = 20, k: int = 4) -> np.ndarray:
    """Distributed Bloom build: per-block partial filters OR-merged on
    the driver (a mergeable sketch, the same partial+final shape as
    ``hll_registers``) — the small-side keyset never materializes
    anywhere, only fixed 2^(n_bits_pow-3)-byte partials move. Identical
    bits to ``bloom_build`` over the collected keys (OR of per-block
    builds sets exactly the same indexes)."""
    from osmpbf_ray.functions.mapreduce import par_map_reduce

    def fold(batch: pa.Table) -> np.ndarray:
        vals = batch.column(key_col).drop_null().to_numpy(zero_copy_only=False)
        return bloom_build(vals, n_bits_pow, k)

    return par_map_reduce(
        ds, fold,
        lambda: np.zeros((1 << n_bits_pow) >> 3, dtype=np.uint8),
        np.bitwise_or,
    )


def bloom_semi_join(ds, key_col: str, small_keys: np.ndarray,
                    n_bits_pow: int = 20, exact: bool = True):
    """Semi-join with a broadcast Bloom pre-filter.

    The bloom pass drops ~all non-matching rows map-side; ``exact=True``
    adds an ``is_in`` refine against the true key set (still broadcast)
    so the result is exact — use ``exact=False`` when a downstream join
    will re-check the key anyway and the small side is too big to ship
    as a sorted array but fits as a filter.
    """
    import pyarrow.compute as pc
    import ray

    keys = np.unique(np.asarray(small_keys))
    bits_ref = ray.put(bloom_build(keys, n_bits_pow))
    keys_ref = ray.put(keys) if exact else None

    def filt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        vals = batch.column(key_col).to_numpy(zero_copy_only=False)
        maybe = bloom_contains(ray.get(bits_ref), vals)
        out = batch.filter(pa.array(maybe))
        if exact and out.num_rows:
            wanted = pa.array(ray.get(keys_ref))
            out = out.filter(pc.is_in(out[key_col], value_set=wanted))
        return out

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


# --- deterministic hash-threshold sampling -----------------------------------


def hash_sample(ds, key_col: str, rate: float):
    """Deterministic sample: keep a row iff ``splitmix64(key) < rate·2^64``.

    Unlike reservoir/random sampling this is reproducible under ANY
    partitioning or execution order (the keep decision is a pure
    function of the key), keeps all rows of a key together, and needs
    no coordination — the right shape for sampling a 100 TB table.
    """
    threshold = np.uint64(int(rate * float(2**64))) if rate < 1.0 else np.uint64(2**64 - 1)

    def filt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        h = _hash_u64(batch.column(key_col).to_numpy(zero_copy_only=False))
        return batch.filter(pa.array(h < threshold))

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
