"""Temporal joins: as-of (latest-at-or-before) and bounded range joins.

The reference engine has no temporal operators (SURVEY.md §2.10 — its
surface ends at fold aggregation); these are the training-pipeline
shapes a feature store needs: "join each event to the latest order the
same user placed at or before the event" (as-of) and "join each event
to every order the user placed in the trailing window" (range).

Ray-Data-first design — the same co-partition contract as
``functions.joins.partitioned_hash_join``: both sides bucket on
``hash(key) % n_buckets`` (fan-out sized from the input, see
``functions.partitioning``), ride ONE unified Arrow schema through the
union shuffle (the other side's columns as typed nulls), and each
bucket reduces independently inside ``map_groups``:

* as-of: one lexsort of the bucket's union by ``(key, ts, side,
  tiebreak)`` with right rows ordered BEFORE left rows at equal ts,
  then a running ``np.maximum.accumulate`` over right-row indices with
  per-key-segment validity — each left row's match is the latest right
  row at-or-before it, fully vectorized, no per-key Python loop.
* range: right side sorted by ``(key, ts)`` once per bucket; per key
  segment two ``np.searchsorted`` calls bound every left row's match
  window and one ``repeat``/``arange`` expansion emits the pairs. The
  segment loop is bounded because the fan-out grows with the input
  (rows-per-bucket, hence keys-per-bucket, stays ~constant).

Ties: among right rows sharing the greatest ``right_on`` the as-of join
picks the greatest ``tiebreak`` — the deterministic rule a SQL
``row_number() OVER (ORDER BY ts DESC, tiebreak DESC) = 1`` computes,
which is what the DuckDB oracles assert hash-for-hash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from osmpbf_ray.functions.joins import add_bucket_column
from osmpbf_ray.functions.partitioning import sized_fanout


def _as_i64(col: pa.ChunkedArray) -> np.ndarray:
    """Numeric view of a key/timestamp column (timestamps → int64 us).

    Integer columns with nulls must NOT round-trip through float64
    (``to_numpy`` NaN coercion loses exactness above 2^53): the unified
    shuffle schema makes every ts/tiebreak column nullable (the other
    side's rows are typed nulls), so fill nulls at the Arrow layer —
    the filled zeros land only on the other side's rows, which every
    consumer discards via ``np.where``/side masks.
    """
    if pa.types.is_integer(col.type):
        return pc.fill_null(col, 0).to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False
        )
    a = col.to_numpy(zero_copy_only=False)
    if a.dtype.kind == "M":
        return a.astype("datetime64[us]").view(np.int64)
    return a.astype(np.int64, copy=False)


def _unified(left_schema: pa.Schema, right_schema: pa.Schema,
             rcols: list[str]) -> tuple[pa.Schema, dict]:
    """One shuffle schema: bucket + side + left cols + right cols (typed
    nulls on the absent side); right columns renamed on clash."""
    lcols = list(left_schema.names)
    rename = {c: (c + "_r" if c in lcols else c) for c in rcols}
    fields = [pa.field("bucket", pa.int64()), pa.field("__side", pa.int8())]
    fields += [left_schema.field(c) for c in lcols]
    fields += [right_schema.field(c).with_name(rename[c]) for c in rcols]
    return pa.schema(fields), rename


def _tag(batch: pa.Table, side: int, unified: pa.Schema, colmap: dict) -> pa.Table:
    n = batch.num_rows
    cols = []
    for f in unified:
        if f.name == "__side":
            cols.append(pa.array(np.full(n, side, dtype=np.int8)))
            continue
        # 'bucket' is appended by add_bucket_column, not part of either
        # input schema — pass it through so the co-partition shuffle is
        # real (nulling it would collapse groupby into one reducer)
        src = "bucket" if f.name == "bucket" else colmap.get(f.name)
        if src in batch.schema.names:
            col = batch.column(src)
            cols.append(col if col.type == f.type else col.cast(f.type))
        else:
            cols.append(pa.nulls(n, type=f.type))
    return pa.Table.from_arrays(cols, schema=unified)


def _seg_starts(sorted_keys: np.ndarray) -> np.ndarray:
    """Per-row index of the first row of this key's segment."""
    n = len(sorted_keys)
    is_new = np.r_[True, sorted_keys[1:] != sorted_keys[:-1]]
    return np.maximum.accumulate(np.where(is_new, np.arange(n), 0))


def asof_join(
    left_ds,
    right_ds,
    key: str,
    left_on: str,
    right_on: str,
    right_cols: list[str],
    tiebreak: str | None = None,
    n_buckets: int | None = None,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """For each left row, the right row (same ``key``) with the greatest
    ``right_on`` <= ``left_on`` — left-join semantics (no match → typed
    nulls). ``tiebreak`` (a numeric right column, e.g. the right table's
    primary key) makes the pick deterministic when ``right_on`` ties;
    it must be one of ``right_cols`` or ``right_on``.
    """
    lschema = left_schema if left_schema is not None else left_ds.schema().base_schema
    rschema = right_schema if right_schema is not None else right_ds.schema().base_schema
    rout = [right_on] + [c for c in right_cols if c != right_on]
    unified, rename = _unified(lschema, rschema, rout)
    lcols = list(lschema.names)
    out_schema = pa.schema(
        [lschema.field(c) for c in lcols]
        + [rschema.field(c).with_name(rename[c]) for c in rout]
    )
    if n_buckets is None:
        n_buckets = max(sized_fanout(left_ds), sized_fanout(right_ds))

    lmap = {c: c for c in lcols}
    rmap = {rename[c]: c for c in rout}
    rmap[key] = key
    tagged_l = left_ds.map_batches(
        lambda b: _tag(add_bucket_column(b, key, n_buckets), 1, unified, lmap),
        batch_format="pyarrow",
    )
    tagged_r = right_ds.map_batches(
        lambda b: _tag(add_bucket_column(b, key, n_buckets), 0, unified, rmap),
        batch_format="pyarrow",
    )
    tb_col = rename.get(tiebreak, tiebreak) if tiebreak else None

    def asof_bucket(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        keys = _as_i64(g.column(key))
        is_right = side == 0
        # left rows carry left_on, right rows carry right_on — one ts
        # axis (each side's values are garbage on the other side's rows
        # — typed nulls — and np.where discards them)
        ts = np.where(is_right, _as_i64(g.column(rename[right_on])),
                      _as_i64(g.column(left_on)))
        tb = _as_i64(g.column(tb_col)) if tb_col else np.zeros(len(side), dtype=np.int64)
        tb = np.where(is_right, tb, 0)
        # right-before-left at equal (key, ts) ⇒ inclusive <=; among
        # equal right ts the running max lands on the greatest tiebreak
        order = np.lexsort((tb, side, ts, keys))
        g = g.take(pa.array(order))
        is_right = is_right[order]
        mark = np.where(is_right, np.arange(len(order)), -1)
        best = np.maximum.accumulate(mark)
        seg_start = _seg_starts(keys[order])
        is_left = ~is_right
        valid = is_left & (best >= seg_start)
        left_rows = g.filter(pa.array(is_left))
        # null index → null output row (arrow take semantics) for how=left
        idx = pa.array(best[is_left], mask=~valid[is_left])
        cols = [left_rows.column(c) for c in lcols]
        cols += [g.column(rename[c]).take(idx) for c in rout]
        return pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols],
            schema=out_schema,
        )

    return tagged_l.union(tagged_r).groupby("bucket").map_groups(
        asof_bucket, batch_format="pyarrow"
    )


def range_join(
    left_ds,
    right_ds,
    key: str,
    left_on: str,
    right_on: str,
    right_cols: list[str],
    lower: int,
    upper: int,
    n_buckets: int | None = None,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Inner join on ``key`` where ``right_on`` falls in
    ``[left_on + lower, left_on + upper]`` (bounds in the column's native
    integer unit — microseconds for timestamps). The bounded window is
    what keeps this scale-safe: each left row's matches sit in one
    contiguous slice of the right side's (key, ts) sort order.
    """
    if lower > upper:
        raise ValueError(f"range_join requires lower <= upper (got {lower} > {upper})")
    lschema = left_schema if left_schema is not None else left_ds.schema().base_schema
    rschema = right_schema if right_schema is not None else right_ds.schema().base_schema
    rout = [right_on] + [c for c in right_cols if c != right_on]
    unified, rename = _unified(lschema, rschema, rout)
    lcols = list(lschema.names)
    out_schema = pa.schema(
        [lschema.field(c) for c in lcols]
        + [rschema.field(c).with_name(rename[c]) for c in rout]
    )
    if n_buckets is None:
        n_buckets = max(sized_fanout(left_ds), sized_fanout(right_ds))

    lmap = {c: c for c in lcols}
    rmap = {rename[c]: c for c in rout}
    rmap[key] = key
    tagged_l = left_ds.map_batches(
        lambda b: _tag(add_bucket_column(b, key, n_buckets), 1, unified, lmap),
        batch_format="pyarrow",
    )
    tagged_r = right_ds.map_batches(
        lambda b: _tag(add_bucket_column(b, key, n_buckets), 0, unified, rmap),
        batch_format="pyarrow",
    )

    def range_bucket(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        left = g.filter(pa.array(side == 1))
        right = g.filter(pa.array(side == 0))
        lk, lt = _as_i64(left.column(key)), _as_i64(left.column(left_on))
        rk, rt = _as_i64(right.column(key)), _as_i64(right.column(rename[right_on]))
        rorder = np.lexsort((rt, rk))
        rk, rt = rk[rorder], rt[rorder]
        lorder = np.lexsort((lt, lk))
        lk, lt = lk[lorder], lt[lorder]
        li_all, ri_all = [], []
        if len(lk) == 0 or len(rk) == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=f.type) for f in out_schema], schema=out_schema
            )
        # loop over left KEY SEGMENTS (bounded: fan-out grows with input
        # so keys-per-bucket stays ~constant); vectorized inside
        lseg = np.flatnonzero(np.r_[True, lk[1:] != lk[:-1]])
        rseg_keys = rk[np.flatnonzero(np.r_[True, rk[1:] != rk[:-1]])] if len(rk) else rk
        rseg_lo = np.searchsorted(rk, rseg_keys, side="left")
        rseg_hi = np.searchsorted(rk, rseg_keys, side="right")
        rseg_of = {int(k): (int(a), int(b)) for k, a, b in zip(rseg_keys, rseg_lo, rseg_hi)}
        for s, e in zip(lseg, np.r_[lseg[1:], len(lk)]):
            seg = rseg_of.get(int(lk[s]))
            if seg is None:
                continue
            a, b = seg
            lo = np.searchsorted(rt[a:b], lt[s:e] + lower, side="left") + a
            hi = np.searchsorted(rt[a:b], lt[s:e] + upper, side="right") + a
            cnt = hi - lo
            if cnt.sum() == 0:
                continue
            li_all.append(np.repeat(np.arange(s, e), cnt))
            # per-left-row contiguous right slices, expanded in one shot
            ri_all.append(
                np.repeat(lo - np.r_[0, np.cumsum(cnt)[:-1]], cnt) + np.arange(int(cnt.sum()))
            )
        if not li_all:
            return pa.Table.from_arrays(
                [pa.array([], type=f.type) for f in out_schema], schema=out_schema
            )
        li = np.concatenate(li_all)
        ri = np.concatenate(ri_all)
        left_sorted = left.take(pa.array(lorder))
        right_sorted = right.take(pa.array(rorder))
        cols = [left_sorted.column(c).take(pa.array(li)) for c in lcols]
        cols += [right_sorted.column(rename[c]).take(pa.array(ri)) for c in rout]
        return pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols],
            schema=out_schema,
        )

    return tagged_l.union(tagged_r).groupby("bucket").map_groups(
        range_bucket, batch_format="pyarrow"
    )
