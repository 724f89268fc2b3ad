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
        keys = [_sort_key(t.column(c)) for c in reversed(order_cols)]
        keys.append(_sort_key(t.column(key_col)))
        order = np.lexsort(keys)
        t = t.take(pa.array(order))
        g = t.column(key_col).to_numpy(zero_copy_only=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
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
