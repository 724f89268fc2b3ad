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

from osmpbf_ray.functions.joins import splitmix_u64
from osmpbf_ray.functions.partitioning import sized_fanout


def _sort_key(col: pa.ChunkedArray) -> np.ndarray:
    a = col.to_numpy(zero_copy_only=False)
    if a.dtype.kind == "M":
        a = a.astype("datetime64[us]").view(np.int64)
    return a


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
        if batch.num_rows == 0:
            return batch.append_column("__pkey", pa.array([], type=pa.int64()))
        h = splitmix_u64(batch.column(key_col).to_numpy(zero_copy_only=False))
        return batch.append_column(
            "__pkey", pa.array((h % np.uint64(n_parts)).view(np.int64)))

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
