"""Grouped ranking: top-k rows per group (the windowed
``row_number() OVER (PARTITION BY g ORDER BY v) <= k`` class).

Scale shape: hash-partition rows by group key (same-key rows co-locate;
input-sized fan-out bounds per-partition memory), then ONE vectorized
lexsort + segment-arange per partition — no per-group Python, no global
sort. The shuffle moves each row once; a global ``ds.sort`` would move
every row through an all-to-all range exchange AND serialize the final
limit. At 100 TB the per-partition reduce sees rows/n_parts rows.

A per-batch combiner (keep each batch's local top-k per group before
the shuffle) is available via ``precombine=True`` — correct because a
group's global top-k is a subset of the union of its per-batch top-k —
and cuts shuffle bytes on heavy-tailed groups.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osmpbf_ray.functions.joins import splitmix_u64
from osmpbf_ray.functions.partitioning import add_hash_pkey, sized_fanout


def _order_key(col: pa.ChunkedArray, ascending: bool) -> np.ndarray:
    if getattr(col, "null_count", 0):
        # NaT views as INT64_MIN (whose negation overflows back to
        # itself, ranking NULL dates FIRST under DESC where SQL puts
        # them LAST) and float nulls become NaN tie-run splitters —
        # reject loudly like null partition keys
        raise ValueError(
            "null values in the order column are unsupported — fill or "
            "filter them first (SQL ranks NULLS LAST; this engine asks "
            "you to make that explicit)")
    a = col.to_numpy(zero_copy_only=False)
    if a.dtype.kind == "M":
        a = a.astype("datetime64[us]").view(np.int64)
    if not ascending:
        if a.dtype.kind in "OUS":  # kind is case-sensitive: 'u' is unsigned
            raise ValueError(
                "descending order on string columns is unsupported — "
                "rank on a numeric/datetime column or use ascending=True"
            )
        if a.dtype.kind == "f":
            a = -a.astype(np.float64)
        elif a.dtype.kind == "u":
            # unsigned can exceed int64 (e.g. splitmix hashes): reflect
            # instead of negating, which would overflow
            a = np.iinfo(np.uint64).max - a.astype(np.uint64)
        else:
            a = -a.astype(np.int64)
    return a


def _topk_table(t: pa.Table, group_col: str, order_col: str, k: int,
                ascending: bool, tiebreak: str | None,
                with_rank: bool, mode: str = "row_number") -> pa.Table:
    """Vectorized per-slice top-k: one lexsort, one segment arange.

    ``mode`` picks the SQL ranking function: ``row_number`` (unique
    ranks; pass ``tiebreak`` for determinism), ``rank`` (ties share the
    row_number of their first row; gaps after) or ``dense_rank`` (ties
    share consecutive ranks; no gaps). With ``rank``/``dense_rank`` the
    KEPT SET is deterministic even without a tiebreak — ties on the
    order value are kept or dropped together, exactly like SQL
    ``QUALIFY rank() ... <= k``."""
    g = t.column(group_col).to_numpy(zero_copy_only=False)
    v = _order_key(t.column(order_col), ascending)
    keys = [v, g]
    if tiebreak is not None:
        keys.insert(0, t.column(tiebreak).to_numpy(zero_copy_only=False))
    order = np.lexsort(keys)  # primary = g, then v, then tiebreak
    gs = g[order]
    n = len(gs)
    starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
    lens = np.diff(np.r_[starts, n])
    # row_number within group: position - segment start
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
    if mode == "row_number":
        rank = pos + 1
    else:
        vs = v[order]
        # start of each tie run (segment starts always begin a run)
        newval = np.r_[True, (gs[1:] != gs[:-1]) | (vs[1:] != vs[:-1])]
        if mode == "rank":
            run_first = np.maximum.accumulate(
                np.where(newval, np.arange(n, dtype=np.int64), -1))
            rank = pos[run_first] + 1
        elif mode == "dense_rank":
            c = np.cumsum(newval)
            rank = c - np.repeat(c[starts], lens) + 1
        else:
            raise ValueError(f"unknown rank mode {mode!r}")
    keep = rank <= k
    out = t.take(pa.array(order[keep]))
    if with_rank:
        out = out.append_column("rank", pa.array(rank[keep]))
    return out


def grouped_topk(ds, group_col: str, order_col: str, k: int,
                 ascending: bool = False, tiebreak: str | None = None,
                 n_parts: int | None = None, precombine: bool = False,
                 with_rank: bool = True, mode: str = "row_number"):
    """Top-k rows per group, ranked by ``order_col`` (desc by default)
    with deterministic ``tiebreak`` ordering; emits a 1-based ``rank``
    column matching SQL ``row_number()`` / ``rank()`` / ``dense_rank()``
    per ``mode``. The per-batch combiner stays correct for every mode:
    a row's LOCAL rank never exceeds its global rank (fewer competitors
    per batch), so local ``rank <= k`` keeps a superset of the global
    top-k."""
    if n_parts is None:
        n_parts = sized_fanout(ds)

    def combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        return _topk_table(batch, group_col, order_col, k, ascending,
                           tiebreak, with_rank=False, mode=mode)

    def add_gkey(batch: pa.Table) -> pa.Table:
        return add_hash_pkey(batch, group_col, n_parts, out_col="__gkey")

    def final(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            sch = part.drop_columns(["__gkey"]).schema
            if with_rank:
                sch = sch.append(pa.field("rank", pa.int64()))
            return sch.empty_table()
        return _topk_table(part.drop_columns(["__gkey"]), group_col,
                           order_col, k, ascending, tiebreak, with_rank,
                           mode=mode)

    if precombine:
        ds = ds.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
    return (
        ds.map_batches(add_gkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gkey")
        .map_groups(final, batch_format="pyarrow")
    )


def grouped_ntile(ds, group_col: str, order_col: str, n: int,
                  tiebreak: str | None = None, ascending: bool = True,
                  n_parts: int | None = None, out_col: str = "tile"):
    """SQL ``NTILE(n) OVER (PARTITION BY g ORDER BY v)``: every row gets
    an equal-frequency bucket 1..n within its group (the first
    ``len %% n`` buckets take one extra row, SQL's remainder rule) — the
    quantile-binning op of feature pipelines. Same shape as
    :func:`grouped_topk`: hash-partition by group, one lexsort + a
    vectorized remainder-split bucket formula per partition. Pass a
    unique ``tiebreak`` for a deterministic assignment (ties on
    ``order_col`` alone make NTILE's split row-order-dependent, in SQL
    too)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if n_parts is None:
        n_parts = sized_fanout(ds)

    def add_gkey(batch: pa.Table) -> pa.Table:
        return add_hash_pkey(batch, group_col, n_parts, out_col="__gkey")

    def assign(part: pa.Table) -> pa.Table:
        t = part.drop_columns(["__gkey"])
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        v = _order_key(t.column(order_col), ascending)
        keys = [v, g]
        if tiebreak is not None:
            keys.insert(0, t.column(tiebreak).to_numpy(zero_copy_only=False))
        order = np.lexsort(keys)
        t = t.take(pa.array(order))
        gs = g[order]
        m = len(gs)
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        lens = np.diff(np.r_[starts, m])
        pos = np.arange(m, dtype=np.int64) - np.repeat(starts, lens)
        L = np.repeat(lens, lens)  # group size per row
        q, r = L // n, L % n  # base bucket size, #buckets with an extra row
        big = (q + 1) * r  # rows covered by the oversized buckets
        in_big = pos < big
        # q == 0 needs no special case: r = L so every pos is in_big and
        # pos // 1 + 1 = pos + 1 (one row per bucket); the small-branch
        # divisor q only divides where pos >= big, which implies q >= 1
        tile = np.where(in_big, pos // (q + 1),
                        r + (pos - big) // np.maximum(q, 1)) + 1
        return t.append_column(out_col, pa.array(tile.astype(np.int64)))

    return (
        ds.map_batches(add_gkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gkey")
        .map_groups(assign, batch_format="pyarrow")
    )


def stratified_sample(ds, group_col: str, k: int, id_col: str,
                      n_parts: int | None = None):
    """Deterministic k-per-group sample (the per-domain-cap op of corpus
    curation): rank rows within each group by ``splitmix64(id)`` and
    keep the first ``k``. Partition- and rerun-invariant — membership
    depends only on ids, never on block layout — and exactly
    reproducible in SQL via the splitmix64 CTE. Built on
    :func:`grouped_topk`, so it inherits the per-batch combiner and
    hash-partitioned reduce."""

    def add_h(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("__h", pa.array([], type=pa.uint64()))
        h = splitmix_u64(batch.column(id_col).to_numpy(zero_copy_only=False))
        return batch.append_column("__h", pa.array(h))

    hashed = ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True)
    top = grouped_topk(hashed, group_col, "__h", k, ascending=True,
                       tiebreak=id_col, n_parts=n_parts, precombine=True)
    return top.map_batches(lambda b: b.drop_columns(["__h"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def grouped_percent_rank(ds, group_col: str, order_col: str,
                         ascending: bool = True, n_parts: int | None = None,
                         out_pr: str = "pr", out_cd: str = "cd"):
    """SQL ``percent_rank()`` and ``cume_dist()`` OVER (PARTITION BY g
    ORDER BY v) — every row annotated with its relative rank
    ``(rank-1)/(n-1)`` (0 for single-row groups) and cumulative
    distribution ``rows_with_v<=mine / n``. Ties share a rank exactly as
    SQL's (rank counts rows strictly ahead; cume_dist counts through the
    end of the tie run).

    Same scale shape as :func:`grouped_topk`: one hash exchange, one
    lexsort + tie-run segment arithmetic per partition. Both outputs are
    IEEE divisions of exact integers, so they are bit-identical to any
    SQL engine computing the same definition."""
    if n_parts is None:
        n_parts = sized_fanout(ds)

    def add_gkey(batch: pa.Table) -> pa.Table:
        return add_hash_pkey(batch, group_col, n_parts, out_col="__gkey")

    def final(part: pa.Table) -> pa.Table:
        t = part.drop_columns(["__gkey"])
        if t.num_rows == 0:
            return (t.append_column(out_pr, pa.array([], pa.float64()))
                     .append_column(out_cd, pa.array([], pa.float64())))
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        if g.dtype.kind in "OUS":
            _, g = np.unique(g.astype(str), return_inverse=True)
        v = _order_key(t.column(order_col), ascending)
        order = np.lexsort([v, g])
        t = t.take(pa.array(order))
        gs, vs = g[order], v[order]
        m = len(gs)
        gchange = np.r_[True, gs[1:] != gs[:-1]]
        starts = np.flatnonzero(gchange)
        lens = np.diff(np.r_[starts, m])
        seg_start = np.repeat(starts, lens)
        pos = np.arange(m, dtype=np.int64) - seg_start
        L = np.repeat(lens, lens)
        # tie runs: a new run at each group change or value change
        runstart = gchange | np.r_[True, vs[1:] != vs[:-1]]
        run_first = np.maximum.accumulate(
            np.where(runstart, np.arange(m), 0))
        rank = run_first - seg_start + 1  # SQL rank() with ties
        ridx = np.flatnonzero(runstart)
        rlen = np.diff(np.r_[ridx, m])
        run_end_pos = (run_first + np.repeat(rlen, rlen)) - seg_start
        pr = np.where(L > 1, (rank - 1) / np.maximum(L - 1, 1), 0.0)
        cd = run_end_pos / L
        return (t.append_column(out_pr, pa.array(pr))
                 .append_column(out_cd, pa.array(cd)))

    return (
        ds.map_batches(add_gkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gkey")
        .map_groups(final, batch_format="pyarrow")
    )
