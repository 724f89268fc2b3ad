"""Distributed EXACT order statistics (quantiles) without a global sort.

``exact_quantiles`` selects the k-th smallest values for a set of
quantile fractions using streaming histogram passes — the classic
select-by-counting shape:

1. pass A: per-batch (count, min, max) partials, tree-reduced via
   ``par_map_reduce`` (one tiny row per block streams to the driver).
2. pass B: per-batch fixed-grid histograms, combined in TWO levels
   (per-batch partial rows → a distributed sum over groups of rows →
   the driver folds the few survivors), so driver memory stays
   O(n_bins) at any block count.
3. the cumulative histogram locates each target rank's bin; only rows
   falling in NEEDED bins are fetched (a map-side filter — no shuffle)
   and the exact k-th is selected locally. A bin holding more than
   ``max_collect`` rows is refined with another histogram pass
   restricted to that bin (geometric width shrink ⇒ terminates); a bin
   whose float range is exhausted holds at most a couple of distinct
   values, resolved exactly by a unique+count pass.

Exactness does NOT rely on float bin edges being exact: every pass
(histogram, collect, refine) restricts membership with the SAME bin
index formula ``clip(floor((v-lo)/width))`` — weakly monotone in ``v``
(subtraction, positive division, floor and clip all preserve order), so
bins partition values order-consistently even when edge arithmetic
rounds, and within-bin ranks are exact by construction.

Rank definition: ``k = floor(q · (n-1))`` zero-based — SQL
``ORDER BY v LIMIT 1 OFFSET k`` ("lower" interpolation), so results are
actual elements of the column and exactly reproducible in DuckDB.

At 100 TB: every pass is a streaming ``map_batches`` over the single
projected column (no shuffle, no driver materialization of data rows);
the driver holds one histogram and one needed-bin subset, both bounded
by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from osmpbf_ray.functions.mapreduce import par_map_reduce

# a restriction level: values kept iff clip(floor((v-lo)/width)) == b
Level = tuple[float, float, int, int]  # (lo, width, n_bins, b)


def _bin_idx(v: np.ndarray, lo: float, width: float, n_bins: int) -> np.ndarray:
    return np.clip(((v - lo) / width).astype(np.int64), 0, n_bins - 1)


def _restrict(v: np.ndarray, levels: tuple[Level, ...]) -> np.ndarray:
    for lo, width, n_bins, b in levels:
        v = v[_bin_idx(v, lo, width, n_bins) == b]
    return v


def _minmax_count(ds, col: str):
    def fold(batch: pa.Table):
        v = batch.column(col).drop_null().to_numpy(zero_copy_only=False)
        if len(v) == 0:
            return (0, np.inf, -np.inf)
        return (len(v), float(v.min()), float(v.max()))

    return par_map_reduce(
        ds, fold, lambda: (0, np.inf, -np.inf),
        lambda a, b: (a[0] + b[0], min(a[1], b[1]), max(a[2], b[2])),
    )


def _histogram(ds, col: str, levels: tuple[Level, ...], lo: float,
               width: float, n_bins: int) -> np.ndarray:
    def part(batch: pa.Table) -> pa.Table:
        v = _restrict(batch.column(col).drop_null().to_numpy(zero_copy_only=False),
                      levels)
        h = np.bincount(_bin_idx(v, lo, width, n_bins),
                        minlength=n_bins).astype(np.int64)
        return pa.table({"h": pa.array([h], type=pa.list_(pa.int64()))})

    partials = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)

    # level-1 combine runs distributed: sum each block's partial rows to
    # one row, so the driver folds O(#final blocks) rows, not O(#batches)
    def combine(batch: pa.Table) -> pa.Table:
        m = np.stack(list(batch.column("h").to_numpy(zero_copy_only=False)))
        return pa.table({"h": pa.array([m.sum(axis=0)], type=pa.list_(pa.int64()))})

    combined = partials.map_batches(combine, batch_format="pyarrow",
                                    batch_size=1024)
    return par_map_reduce(
        combined,
        lambda b: np.stack(
            list(b.column("h").to_numpy(zero_copy_only=False))).sum(axis=0),
        lambda: np.zeros(n_bins, dtype=np.int64),
        lambda a, b: a + b,
    )


def _collect(ds, col: str, levels: tuple[Level, ...]) -> np.ndarray:
    """Map-side bin filter + driver concat — called only on bins the
    histogram proved small."""
    import ray

    def filt(batch: pa.Table) -> pa.Table:
        v = _restrict(batch.column(col).drop_null().to_numpy(zero_copy_only=False),
                      levels)
        return pa.table({col: v})

    tbls = ray.get(
        ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
        .to_arrow_refs()
    )
    parts = [t.column(col).to_numpy() for t in tbls if t.num_rows]
    return np.concatenate(parts) if parts else np.empty(0, dtype=np.float64)


def _unique_counts(ds, col: str, levels: tuple[Level, ...]) -> tuple[np.ndarray, np.ndarray]:
    """(sorted unique values, counts) of the restricted set — for bins
    whose float range is exhausted (a couple of distinct values at most,
    but ANY duplicate-pile resolves exactly in one pass)."""
    def fold(batch: pa.Table):
        v = _restrict(batch.column(col).drop_null().to_numpy(zero_copy_only=False),
                      levels)
        u, c = np.unique(v, return_counts=True)
        return dict(zip(u.tolist(), c.tolist()))

    def merge(a: dict, b: dict) -> dict:
        for k, v in b.items():
            a[k] = a.get(k, 0) + v
        return a

    acc = par_map_reduce(ds, fold, dict, merge)
    u = np.array(sorted(acc), dtype=np.float64)
    return u, np.array([acc[x] for x in u], dtype=np.int64)


def _minmax_restricted(ds, col: str, levels: tuple[Level, ...]) -> tuple[float, float]:
    def fold(batch: pa.Table):
        v = _restrict(batch.column(col).drop_null().to_numpy(zero_copy_only=False),
                      levels)
        if len(v) == 0:
            return (np.inf, -np.inf)
        return (float(v.min()), float(v.max()))

    return par_map_reduce(
        ds, fold, lambda: (np.inf, -np.inf),
        lambda a, b: (min(a[0], b[0]), max(a[1], b[1])),
    )


def _select_kth(ds, col: str, ks: list[int], levels: tuple[Level, ...],
                lo: float, hi: float, n_bins: int, max_collect: int,
                offset: int) -> dict[int, float]:
    """Exact k-th smallest (0-based) for every k in ``ks`` among the
    values passing ``levels``; ``offset`` ranks lie below this set."""
    width = (hi - lo) / n_bins
    # no float progress (width 0, non-finite, or below one ulp of lo):
    # the remaining pile spans at most a couple of representable values
    if not (width > 0) or not np.isfinite(width) or lo + width <= lo:
        u, c = _unique_counts(ds, col, levels)
        cum = np.cumsum(c)
        return {k: float(u[np.searchsorted(cum, k - offset, side="right")])
                for k in ks}
    hist = _histogram(ds, col, levels, lo, width, n_bins)
    cum = np.cumsum(hist)
    out: dict[int, float] = {}
    by_bin: dict[int, list[int]] = {}
    for k in ks:
        b = int(np.searchsorted(cum, k - offset, side="right"))
        by_bin.setdefault(b, []).append(k)
    for b, bks in by_bin.items():
        below = offset + (int(cum[b - 1]) if b > 0 else 0)
        sub = levels + ((lo, width, n_bins, b),)
        if int(hist[b]) <= max_collect:
            vals = np.sort(_collect(ds, col, sub))
            for k in bks:
                out[k] = float(vals[k - below])
        else:
            blo, bhi = lo + width * b, lo + width * (b + 1)
            if int(hist[b]) == int(hist.sum()):
                # the grid learned nothing (the whole restricted set sits
                # in one bin — e.g. >max_collect copies of 0.0, whose
                # edge never exhausts since ulp(0) is subnormal): re-grid
                # to the pile's TRUE value range. One extra pass, and the
                # next level provably discriminates (min lands in bin 0,
                # max in the last bin) or resolves outright.
                m_lo, m_hi = _minmax_restricted(ds, col, sub)
                if m_lo == m_hi:
                    for k in bks:
                        out[k] = m_lo
                    continue
                blo, bhi = m_lo, m_hi
            out.update(_select_kth(ds, col, bks, sub, blo, bhi, n_bins,
                                   max_collect, offset=below))
    return out


def grouped_quantiles(ds, key_col: str, col: str, qs: list[float],
                      n_parts: int | None = None) -> "object":
    """Per-group exact quantiles (the p99-per-key class) →
    Dataset(key_col, q, value): for each group, the element at
    zero-based rank ``floor(q·(cnt_g − 1))`` of the group's sorted
    ``col``. Hash-partition by key (same-key rows co-locate, fan-out
    sized from the input), then ONE lexsort + segment gather per
    partition — no per-group Python, no global sort; per-partition
    memory is rows/n_parts at any scale.
    """
    from osmpbf_ray.functions.partitioning import add_hash_pkey, sized_fanout

    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError("qs must be fractions in [0, 1]")
    if n_parts is None:
        n_parts = sized_fanout(ds)
    qarr = np.array([float(q) for q in qs], dtype=np.float64)

    def add_pkey(batch: pa.Table) -> pa.Table:
        return add_hash_pkey(batch, key_col, n_parts)

    def part_quantiles(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__pkey"])
        if t.column(col).null_count:
            # match exact_quantiles (which drop_null()s every pass) and
            # SQL percentile semantics: nulls neither rank nor count
            t = t.filter(pc.is_valid(t.column(col)))
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        if len(k) == 0:
            return pa.table({key_col: t.column(key_col),
                             "q": pa.array([], pa.float64()),
                             "value": pa.array([], pa.float64())})
        order = np.lexsort((v, k))
        ks, vs = k[order], v[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        lens = np.diff(np.r_[starts, len(ks)])
        # rank index per (group, q): starts + floor(q·(len−1)), gathered
        # for all qs at once
        idx = (starts[:, None] +
               np.floor(qarr[None, :] * (lens[:, None] - 1)).astype(np.int64))
        return pa.table({
            key_col: pa.array(np.repeat(ks[starts], len(qarr)),
                              type=t.schema.field(key_col).type),
            "q": np.tile(qarr, len(starts)),
            "value": vs[idx].ravel(),
        })

    return (
        ds.select_columns([key_col, col])
        .map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__pkey")
        .map_groups(part_quantiles, batch_format="pyarrow")
    )


def exact_quantiles(ds, col: str, qs: list[float], n_bins: int = 4096,
                    max_collect: int = 1 << 20,
                    materialize: bool = True) -> pa.Table:
    """Exact quantiles of ``ds[col]`` → ``pa.Table(q, value)``.

    ``value`` is the element at zero-based rank ``floor(q·(n-1))`` in
    sorted order — bit-equal to SQL ``ORDER BY col LIMIT 1 OFFSET k``.

    ``materialize=True`` (default) pins the projected column in the
    object store so the 3+ passes share one scan — right whenever the
    column fits cluster memory + spill. At extreme scale pass
    ``materialize=False`` to re-scan the source per pass instead
    (column-pruned parquet re-reads are often cheaper than spilling a
    one-column copy of the corpus).
    """
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        # q > 1 would crash deep in _select_kth (IndexError past the top
        # bin) and q < 0 would silently return a wrong value via a
        # negative rank — validate at the argument, like approx_quantiles
        raise ValueError("qs must be fractions in [0, 1]")
    ds = ds.select_columns([col])
    if materialize:
        ds = ds.materialize()
    n, lo, hi = _minmax_count(ds, col)
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    ks = sorted({int(np.floor(q * (n - 1))) for q in qs})
    if lo == hi:
        kth = {k: lo for k in ks}
    else:
        kth = _select_kth(ds, col, ks, (), lo, hi, n_bins, max_collect, offset=0)
    return pa.table({
        "q": pa.array([float(q) for q in qs], pa.float64()),
        "value": pa.array([kth[int(np.floor(q * (n - 1)))] for q in qs],
                          pa.float64()),
    })


# --- one-pass mergeable approximate quantiles --------------------------------


def _summary_compress(vals: np.ndarray, wts: np.ndarray, k: int
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Compress a weighted value multiset to ≤ k equi-weight buckets,
    each represented by its max value — the classic equi-depth summary.
    Input need not be sorted; output is sorted. Querying rank r on the
    result errs by at most total_weight / k (one bucket)."""
    order = np.argsort(vals, kind="stable")
    v, w = vals[order], wts[order]
    if len(v) <= k:
        return v, w
    cum = np.cumsum(w)
    total = cum[-1]
    # bucket upper edges at total·(i+1)/k; searchsorted('left') on the
    # cumulative weights finds each edge's covering point
    edges = np.searchsorted(cum, total * (np.arange(1, k + 1) / k), side="left")
    edges = np.unique(np.minimum(edges, len(v) - 1))
    bw = np.diff(np.r_[0, cum[edges]])
    return v[edges], bw


def approx_quantiles(ds, col: str, qs: list[float], k: int = 1024):
    """ONE-PASS mergeable approximate quantiles — the streaming-scale
    counterpart of :func:`exact_quantiles` (which re-scans per histogram
    refinement). Each batch compresses to a ≤ k-point equi-depth summary
    (value, weight); summaries union and compress once more on the
    driver (k points × #batches is tiny). Rank error is bounded by one
    bucket per compression level: ≤ n/k + n/k = 2n/k over the two
    levels. The union-then-compress merge is ORDER-INVARIANT (a sorted
    multiset union), so results don't depend on block arrival order —
    but unlike everything in :mod:`exact_quantiles` the VALUES are
    approximate, so there is no SQL oracle; the error bound is asserted
    in pytest instead. NULLs are dropped (SQL quantile semantics)."""
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError("qs must be fractions in [0, 1]")
    if k < 2:
        raise ValueError("k must be >= 2")

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).drop_null().to_numpy(
            zero_copy_only=False).astype(np.float64)
        if len(v) == 0:
            return pa.table({"v": pa.array([], pa.float64()),
                             "w": pa.array([], pa.int64())})
        cv, cw = _summary_compress(v, np.ones(len(v), np.int64), k)
        return pa.table({"v": pa.array(cv), "w": pa.array(cw.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    tbls = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return pa.table({"q": pa.array(qs, pa.float64()),
                         "value": pa.array([None] * len(qs), pa.float64())})
    allp = pa.concat_tables(tbls, promote_options="default")
    v, w = _summary_compress(allp.column("v").to_numpy(),
                             allp.column("w").to_numpy().astype(np.int64), k)
    cum = np.cumsum(w)
    n = cum[-1]
    out = []
    for q in qs:
        r = q * (n - 1) + 1  # 1-based target rank
        out.append(v[min(int(np.searchsorted(cum, r, side="left")), len(v) - 1)])
    return pa.table({"q": pa.array(qs, pa.float64()),
                     "value": pa.array(out, pa.float64())})
