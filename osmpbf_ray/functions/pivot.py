"""Pivot (long → wide) aggregation: ``SUM(value) FILTER (pivot = v)``
per key, one output column per pivot-domain value.

Scale shape: the pivot DOMAIN must be known and small (that is what
makes pivot an operator rather than a dynamic schema change — pass it
explicitly); the KEY space may be huge. Each batch pre-aggregates to
one row per distinct key (a flat ``bincount`` over key×domain cells, so
a hot key contributes ≤1 row per batch regardless of its row count —
the same combiner contract as tile_stats partials), then the partials
hash-partition by key and each partition folds with one bincount per
domain column. Nothing wide ever shuffles: the exchange moves
``#distinct-keys-per-batch × (1 + |domain|)`` numbers.

Sums are exact for integer-valued measures; float measures follow
streaming-cumsum ordering like every distributed SUM.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from osmpbf_ray.functions.partitioning import add_hash_pkey, sized_fanout


def pivot_sum(ds, key_col: str, pivot_col: str, value_col: str,
              pivot_values: list, col_names: list[str] | None = None,
              n_parts: int | None = None):
    """Dataset(key_col, <col per pivot value>): sum of ``value_col``
    where ``pivot_col`` equals each domain value (0 when a key has no
    rows for a value — SQL ``SUM(CASE WHEN ... ELSE 0 END)``). Rows with
    a pivot value outside the domain are ignored."""
    P = len(pivot_values)
    if P == 0:
        raise ValueError("pivot_values must be non-empty")
    if col_names is None:
        col_names = [f"{value_col}_{v}" for v in pivot_values]
    if len(col_names) != P:
        raise ValueError("col_names must match pivot_values")
    if n_parts is None:
        n_parts = sized_fanout(ds)
    domain_arr = pa.array(pivot_values)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], batch.schema.field(key_col).type),
                          **{c: pa.array([], pa.float64()) for c in col_names}})
        if batch.num_rows == 0:
            return empty
        if batch.column(key_col).null_count:
            raise ValueError(
                f"null values in pivot key {key_col!r} are unsupported — "
                "fill or filter the key column first")
        # vectorized domain lookup (C kernel); null → -1 → dropped
        pidx = pc.fill_null(
            pc.index_in(batch.column(pivot_col), value_set=domain_arr), -1
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        # SQL SUM skips NULL inputs; a NaN weight would poison its
        # key's sum permanently
        m = (pidx >= 0) & pc.is_valid(
            batch.column(value_col)).to_numpy(zero_copy_only=False)
        if not m.any():
            return empty
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)[m]
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)[m].astype(np.float64)
        ku, inv = np.unique(keys, return_inverse=True)
        flat = inv * P + pidx[m]
        sums = np.bincount(flat, weights=vals, minlength=len(ku) * P)
        sums = sums.reshape(len(ku), P)
        cols = {key_col: pa.array(ku)}
        for j, c in enumerate(col_names):
            cols[c] = pa.array(sums[:, j])
        return pa.table(cols)

    def fold(part: pa.Table) -> pa.Table:
        t = part.drop_columns(["__pkey"])
        if t.num_rows == 0:
            return t
        ku, inv = np.unique(t.column(key_col).to_numpy(zero_copy_only=False),
                            return_inverse=True)
        cols = {key_col: pa.array(ku)}
        for c in col_names:
            w = t.column(c).to_numpy(zero_copy_only=False)
            cols[c] = pa.array(np.bincount(inv, weights=w, minlength=len(ku)))
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(lambda b: add_hash_pkey(b, key_col, n_parts),
                     batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__pkey")
        .map_groups(fold, batch_format="pyarrow")
    )
