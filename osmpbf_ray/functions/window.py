"""Offset window functions: per-key LAG over an explicit sort order.

The SQL class ``lag(col) OVER (PARTITION BY key ORDER BY order_cols)``.
Scale shape — identical to the temporal joins' contract
(functions/temporal.py): hash-partition rows by key (same-key rows
co-locate, fan-out sized from the input so per-partition memory is
bounded), then ONE vectorized lexsort per partition + a shifted take
with per-key-segment validity. No global sort: a key's window never
spans partitions, so the all-to-all range exchange a ``ds.sort`` would
pay is avoided and each partition reduces independently.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from osmpbf_ray.functions.partitioning import add_hash_pkey, sized_fanout


def _sort_key(col: pa.ChunkedArray) -> np.ndarray:
    if getattr(col, "null_count", 0):
        # NaT views as INT64_MIN and float nulls become NaN — both
        # silently misorder windows; reject like null partition keys
        raise ValueError(
            "null values in a sort/order column are unsupported — "
            "fill or filter them first")
    a = col.to_numpy(zero_copy_only=False)
    if a.dtype.kind == "M":
        a = a.astype("datetime64[us]").view(np.int64)
    return a


def rolling_sum(ds, key_col: str, order_cols: list[str], value_col: str,
                window: int, out_col: str = "rolling_sum",
                n_parts: int | None = None):
    """Bounded rolling aggregate — SQL ``SUM(v) OVER (PARTITION BY key
    ORDER BY order_cols ROWS BETWEEN window-1 PRECEDING AND CURRENT
    ROW)``. Same partitioning contract as :func:`partitioned_lag`; per
    partition the windowed sum is one segment-local cumulative sum plus
    one shifted difference — O(rows), fully vectorized, independent of
    ``window``. Exact for integer-valued inputs (pure adds/subtracts in
    float64); float inputs may differ from a reduce-tree engine by
    summation order, as with any streaming cumsum.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if n_parts is None:
        n_parts = sized_fanout(ds)

    def add_pkey(batch: pa.Table) -> pa.Table:
        return add_hash_pkey(batch, key_col, n_parts)

    def roll_part(part: pa.Table) -> pa.Table:
        t = part.drop_columns(["__pkey"])
        if t.num_rows == 0:
            return t.append_column(out_col, pa.nulls(0, pa.float64()))
        if t.column(value_col).null_count:
            # one NaN in the partition-wide cumsum would silently poison
            # every later row's rolling sum (NaN-NaN stays NaN) — reject
            # loudly like null order/partition keys; fill or filter first
            raise ValueError(
                f"null values in value column {value_col!r} are "
                "unsupported — fill or filter them first")
        keys = [_sort_key(t.column(c)) for c in reversed(order_cols)]
        keys.append(_sort_key(t.column(key_col)))
        order = np.lexsort(keys)
        t = t.take(pa.array(order))
        g = t.column(key_col).to_numpy(zero_copy_only=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        if np.isnan(v).any():
            # a VALID float NaN (not an Arrow null — the guard above)
            # would poison the same partition-wide cumsum silently
            raise ValueError(
                f"NaN values in value column {value_col!r} are "
                "unsupported — fill or filter them first")
        n = len(g)
        first = np.r_[True, g[1:] != g[:-1]]
        starts = np.flatnonzero(first)
        lens = np.diff(np.r_[starts, n])
        cs = np.cumsum(v)
        seg_base = np.repeat(np.r_[0.0, cs[starts[1:] - 1]] if len(starts) > 1
                             else np.zeros(1), lens)
        local = cs - seg_base  # segment-local inclusive cumsum
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        prev = np.arange(n, dtype=np.int64) - window
        in_window = pos >= window
        older = np.where(in_window, local[np.clip(prev, 0, n - 1)], 0.0)
        return t.append_column(out_col, pa.array(local - older))

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__pkey")
        .map_groups(roll_part, batch_format="pyarrow")
    )


def resample_gapfill(ds, key_col: str, ts_col: str, bucket_us: int,
                     n_parts: int | None = None, out_col: str = "n",
                     max_expansion: int = 1 << 27):
    """Per-key time resample WITH gap filling: Dataset(key, bucket, n)
    counting rows per ``bucket_us``-wide time bucket, EMITTING ZERO ROWS
    for every missing bucket between each key's first and last event —
    the resample/densify op of feature pipelines (models want regular
    series, not sparse ones).

    Shape: per-batch (key, bucket) count partials (one row per distinct
    cell per batch), hash-partitioned by key, then one vectorized
    segmented-arange expansion per partition — no per-key Python, no
    generate_series join. Gap-filling EXPANDS data: each partition
    raises if it would emit more than ``max_expansion`` rows (a key
    spanning years at millisecond buckets is almost always a bug, and
    an explicit error beats an OOM; widen the bucket or raise the cap).
    """
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    if n_parts is None:
        n_parts = sized_fanout(ds)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key_col: pa.array([], batch.schema.field(key_col).type),
                             "bucket": pa.array([], pa.int64()),
                             "pn": pa.array([], pa.int64())})
        if batch.column(ts_col).null_count:
            # NaT views as INT64_MIN → a bucket of -2.5e9 poisons the
            # key's whole range; reject loudly like null partition keys
            raise ValueError(
                f"null values in timestamp column {ts_col!r} are "
                "unsupported — fill or filter them first")
        ts = _sort_key(batch.column(ts_col))
        b = np.floor_divide(ts, bucket_us)
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((b, k))
        ks, bs = k[order], b[order]
        first = np.r_[True, (ks[1:] != ks[:-1]) | (bs[1:] != bs[:-1])]
        starts = np.flatnonzero(first)
        counts = np.diff(np.r_[starts, len(ks)])
        return pa.table({key_col: pa.array(ks[starts]),
                         "bucket": pa.array(bs[starts]),
                         "pn": pa.array(counts.astype(np.int64))})

    def expand(part: pa.Table) -> pa.Table:
        t = part.drop_columns(["__pkey"])
        if t.num_rows == 0:
            return pa.table({key_col: t.column(key_col),
                             "bucket": pa.array([], pa.int64()),
                             out_col: pa.array([], pa.int64())})
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        pn = t.column("pn").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, k))
        ks, bs, pns = k[order], b[order], pn[order]
        seg = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        ends = np.r_[seg[1:], len(ks)]
        bmin, bmax = bs[seg], bs[ends - 1]
        lens = bmax - bmin + 1  # full bucket range per key
        total = int(lens.sum())
        if total > max_expansion:
            raise ValueError(
                f"gap-fill would emit {total} rows in one partition "
                f"(> max_expansion={max_expansion}); widen bucket_us or "
                "raise the cap")
        offs = np.r_[0, np.cumsum(lens)[:-1]]
        # segmented arange: full bucket sequence for every key
        row_seg = np.repeat(np.arange(len(seg)), lens)
        full_b = (np.arange(total, dtype=np.int64) - offs[row_seg]
                  + bmin[row_seg])
        full_k = ks[seg][row_seg]
        n = np.zeros(total, dtype=np.int64)
        # merge duplicate (key,bucket) partials into the dense grid
        src_seg = np.repeat(np.arange(len(seg)), ends - seg)
        idx = offs[src_seg] + (bs - bmin[src_seg])
        np.add.at(n, idx, pns)
        return pa.table({key_col: pa.array(full_k),
                         "bucket": pa.array(full_b),
                         out_col: pa.array(n)})

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(lambda bt: add_hash_pkey(bt, key_col, n_parts),
                     batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__pkey")
        .map_groups(expand, batch_format="pyarrow")
    )


def partitioned_lag(ds, key_col: str, order_cols: list[str],
                    lag_cols: list[str], n_parts: int | None = None,
                    suffix: str = "_lag"):
    """Append ``<col><suffix>`` columns holding the PREVIOUS row's value
    per ``key_col`` partition in ``order_cols`` order (typed null for
    each key's first row). Output row order is per-partition sorted —
    window semantics don't define a global output order.
    """
    if n_parts is None:
        n_parts = sized_fanout(ds)

    def add_pkey(batch: pa.Table) -> pa.Table:
        return add_hash_pkey(batch, key_col, n_parts)

    def lag_part(part: pa.Table) -> pa.Table:
        t = part.drop_columns(["__pkey"])
        if t.num_rows == 0:
            out = t
            for c in lag_cols:
                out = out.append_column(c + suffix, pa.nulls(0, t.schema.field(c).type))
            return out
        keys = [_sort_key(t.column(c)) for c in reversed(order_cols)]
        keys.append(_sort_key(t.column(key_col)))
        order = np.lexsort(keys)  # primary = key_col, then order_cols
        out = t.take(pa.array(order))
        g = out.column(key_col).to_numpy(zero_copy_only=False)
        first = np.r_[True, g[1:] != g[:-1]]
        prev = np.arange(len(g), dtype=np.int64) - 1
        # per-segment validity: a key's first row has no predecessor
        idx = pa.array(np.where(first, -1, prev), type=pa.int64())
        idx = pc.if_else(pc.equal(idx, -1), pa.nulls(len(g), pa.int64()), idx)
        for c in lag_cols:
            out = out.append_column(c + suffix, out.column(c).take(idx))
        return out

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__pkey")
        .map_groups(lag_part, batch_format="pyarrow")
    )
