"""Distributed grouped aggregates beyond plain folds: ordered string
concatenation, mode (most-frequent value), fixed-bin histograms, exact
integer co-moments (the distributed building blocks of corr/cov), and
grouped bounding boxes.

Shared scale shape (same contract as ranking/window/quantile):

* a MAP-SIDE PARTIAL shrinks each batch to one row per distinct
  (group[, value/bin]) before anything moves — the shuffle carries
  aggregate state, never raw rows;
* the exchange is ONE hash-partitioned reduce (``add_hash_pkey`` +
  ``groupby('__gkey').map_groups``) or a tiny ``groupby().aggregate``
  when the final state is mergeable by plain sums/min/max;
* every finalizer is vectorized (lexsort + segment boundaries, arrow
  ``binary_join``, ``np.add.at``) — no Python loop over rows.

The reference engine stops at fold aggregations (par_map_reduce,
src/lib.rs); these extend the same partial+final contract to the
grouped aggregates a relational/training-data pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum

from osmpbf_ray.functions.partitioning import add_hash_pkey, sized_fanout


def _np(col: pa.ChunkedArray) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False)


def _value_codes(v: np.ndarray) -> np.ndarray:
    """Order-preserving integer codes for a tie-break/order column:
    numeric dtypes order natively; string/object order lexicographically
    (matching SQL ``ORDER BY v``)."""
    if v.dtype.kind in "OUS":
        _, codes = np.unique(v.astype(str), return_inverse=True)
        return codes.astype(np.int64)
    return v


def grouped_string_agg(ds, group_col: str, value_col: str,
                       order_cols: list[str], sep: str = ",",
                       out_col: str = "agg", n_parts: int | None = None):
    """SQL ``string_agg(value, sep ORDER BY order_cols) GROUP BY group``:
    one deterministic concatenated string per group.

    Hash-partitioned by group; inside each partition ONE lexsort by
    (group, *order_cols) finds group segments, and the concatenation is
    a single zero-copy arrow kernel: a ListArray view over the sorted
    value column (segment offsets only) fed to ``pc.binary_join``.
    NULL values are skipped (SQL semantics); NULL group/order values
    raise like every other partition/order key in the engine. Pass
    ``order_cols`` that are unique per group for a deterministic result
    (same requirement SQL has)."""
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    if n_parts is None:
        n_parts = sized_fanout(ds)
    keep = [group_col, value_col, *order_cols]

    def add_gkey(batch: pa.Table) -> pa.Table:
        batch = batch.select(keep)
        if batch.column(value_col).null_count:
            batch = batch.filter(pc.is_valid(batch.column(value_col)))
        return add_hash_pkey(batch, group_col, n_parts, out_col="__gkey")

    out_schema = pa.schema([
        pa.field(group_col, pa.int64()), pa.field(out_col, pa.string())])

    def final(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        g = _np(part.column(group_col)).astype(np.int64)
        keys = []
        for oc in reversed(order_cols):
            col = part.column(oc)
            if col.null_count:
                raise ValueError(
                    f"null values in order column {oc!r} are unsupported")
            keys.append(_value_codes(_np(col)))
        keys.append(g)
        order = np.lexsort(keys)
        gs = g[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        offsets = np.r_[starts, len(gs)].astype(np.int32)
        vals = part.column(value_col).combine_chunks().take(pa.array(order))
        lists = pa.ListArray.from_arrays(pa.array(offsets), vals)
        return pa.table({group_col: pa.array(gs[starts]),
                         out_col: pc.binary_join(lists, sep)})

    return (
        ds.map_batches(add_gkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gkey")
        .map_groups(final, batch_format="pyarrow")
    )


def grouped_mode(ds, group_col: str, value_col: str,
                 n_parts: int | None = None, out_col: str = "mode"):
    """Most-frequent value per group with SQL-deterministic tie-break
    (highest count, then smallest value — ``ORDER BY n DESC, v`` row 1).

    Map-side partial: each batch collapses to distinct (group, value)
    pair counts (arrow hash aggregation), so the shuffle carries at most
    |distinct pairs| rows per batch. Final: sum the partial counts per
    pair, then one lexsort + segment-head take picks each group's mode.
    The partial is exactly the combiner a 100 TB run needs when values
    are low-cardinality (event types, languages, labels)."""
    if n_parts is None:
        n_parts = sized_fanout(ds)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, value_col])
        if t.column(value_col).null_count:
            # SQL's mode-over-nulls tie order (NULLS LAST) can't be
            # reproduced by the string-code tie-break here — reject
            # loudly like the engine's other null-sensitive keys
            raise ValueError(
                f"null values in mode value column {value_col!r} are "
                "unsupported — fill or filter them first")
        gb = t.group_by([group_col, value_col]).aggregate([([], "count_all")])
        gb = gb.rename_columns([group_col, value_col, "__pn"])
        return add_hash_pkey(gb, group_col, n_parts, out_col="__gkey")

    def final(part: pa.Table) -> pa.Table:
        t = part.drop_columns(["__gkey"])
        if t.num_rows == 0:
            return t.rename_columns(
                [group_col, out_col, "n"]).cast(pa.schema([
                    pa.field(group_col, pa.int64()),
                    pa.field(out_col, t.schema.field(value_col).type),
                    pa.field("n", pa.int64())]))
        gb = t.group_by([group_col, value_col]).aggregate([("__pn", "sum")])
        g = _np(gb.column(group_col)).astype(np.int64)
        n = _np(gb.column("__pn_sum")).astype(np.int64)
        vcodes = _value_codes(_np(gb.column(value_col)))
        order = np.lexsort([vcodes, -n, g])
        gs = g[order]
        heads = order[np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])]
        take = pa.array(heads)
        return pa.table({
            group_col: pa.array(g[heads]),
            out_col: gb.column(value_col).combine_chunks().take(take),
            "n": pa.array(n[heads]),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gkey")
        .map_groups(final, batch_format="pyarrow")
    )


def fixed_histogram(ds, col: str, lo: int, width: int, n_bins: int,
                    out_bin: str = "bucket", out_n: str = "n"):
    """Fixed-bin integer histogram: ``bucket = (x - lo) // width`` for
    x in ``[lo, lo + width * n_bins)``; out-of-range rows are dropped
    (define the edges to cover the domain when none should be).

    Each batch collapses to ≤ ``n_bins`` partial rows via one
    ``np.bincount`` — the only exchange is a groupby over the bin ids,
    i.e. O(n_bins) rows regardless of input size. Integer input keeps
    the bucket formula exact (no float edge rounding); convert money to
    cents first."""
    if width <= 0 or n_bins <= 0:
        raise ValueError("width and n_bins must be positive")
    hi = lo + width * n_bins

    def partial(batch: pa.Table) -> pa.Table:
        x = _np(batch.column(col)).astype(np.int64)
        x = x[(x >= lo) & (x < hi)]
        counts = np.bincount((x - lo) // width, minlength=n_bins)
        nz = np.flatnonzero(counts)
        return pa.table({out_bin: pa.array(nz.astype(np.int64)),
                         out_n: pa.array(counts[nz].astype(np.int64))})

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(out_bin)
        .aggregate(Sum(out_n, alias_name=out_n))
    )


_MOMENT_COLS = ["n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]


def _moment_sum(t: pa.Table, group_col: str) -> pa.Table:
    """Shared combiner step: given a table whose ``_MOMENT_COLS`` are
    already per-row or per-partial values, sum them per group."""
    g = _np(t.column(group_col))
    uniq, inv = np.unique(g, return_inverse=True)
    # explicit type: np.unique of an empty object (string-key) array
    # would otherwise infer a null-typed column and break the exchange
    cols = {group_col: pa.array(uniq, type=t.schema.field(group_col).type)}
    for name in _MOMENT_COLS:
        acc = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(acc, inv, _np(t.column(name)).astype(np.int64))
        cols[name] = pa.array(acc)
    return pa.table(cols)


def grouped_comoments(ds, group_col: str, x_col: str, y_col: str,
                      n_parts: int | None = None):
    """Exact integer co-moments per group — (n, Σx, Σy, Σx², Σy², Σxy)
    — the mergeable sufficient statistics of corr/cov/variance/OLS.

    Keeping the moments INTEGER (caller scales inputs, e.g. cents /
    basis points) makes the distributed sum order-independent and
    bit-reproducible — a float corr() accumulated across shuffled blocks
    is not. Per-batch partial via segment ``np.add.at``; the exchange
    carries one row per (batch, group) into a hash-partitioned
    segment-sum final (Ray's sort-based ``groupby().aggregate`` pays
    per-distinct-key cost that collapses at 10^5+ groups). Caller owns
    overflow headroom: max|x|²·rows must stay below 2⁶³."""
    if n_parts is None:
        n_parts = sized_fanout(ds)

    def partial(batch: pa.Table) -> pa.Table:
        x = _np(batch.column(x_col)).astype(np.int64)
        y = _np(batch.column(y_col)).astype(np.int64)
        t = pa.table({
            group_col: batch.column(group_col),
            "n": pa.array(np.ones(len(x), np.int64)),
            "sum_x": pa.array(x), "sum_y": pa.array(y),
            "sum_xx": pa.array(x * x), "sum_yy": pa.array(y * y),
            "sum_xy": pa.array(x * y),
        })
        return add_hash_pkey(_moment_sum(t, group_col), group_col,
                             n_parts, out_col="__gkey")

    def final(part: pa.Table) -> pa.Table:
        t = part.drop_columns(["__gkey"])
        if t.num_rows == 0:
            return t
        return _moment_sum(t, group_col)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gkey")
        .map_groups(final, batch_format="pyarrow")
    )


_BBOX_COLS = ["min_lat", "max_lat", "min_lon", "max_lon", "n_pts"]


def _bbox_reduce(t: pa.Table, group_col: str) -> pa.Table:
    """Segment min/max/sum over already-partial bbox columns — used as
    both the map-side combiner and the per-partition final (bbox state
    is idempotently mergeable)."""
    g = _np(t.column(group_col)).astype(np.int64)
    order = np.argsort(g, kind="stable")
    gs = g[order]
    starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
    ends = np.r_[starts[1:], len(gs)]
    take = lambda c: _np(t.column(c)).astype(np.int64)[order]
    return pa.table({
        group_col: pa.array(gs[starts]),
        "min_lat": pa.array(np.minimum.reduceat(take("min_lat"), starts)),
        "max_lat": pa.array(np.maximum.reduceat(take("max_lat"), starts)),
        "min_lon": pa.array(np.minimum.reduceat(take("min_lon"), starts)),
        "max_lon": pa.array(np.maximum.reduceat(take("max_lon"), starts)),
        "n_pts": pa.array(np.add.reduceat(take("n_pts"), starts)),
    })


def grouped_bbox(ds, group_col: str, lat_col: str, lon_col: str,
                 n_parts: int | None = None):
    """Per-group integer bounding box + point count (the per-way bbox /
    per-tile extent op of a geospatial pipeline). Map-side segment
    min/max partials collapse each batch to one row per group, then ONE
    hash-partitioned segment-reduce merges partials — raw coordinates
    never shuffle, and no per-distinct-key orchestration (group counts
    here are input-sized: one bbox per way)."""
    if n_parts is None:
        n_parts = sized_fanout(ds)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            group_col: batch.column(group_col),
            "min_lat": batch.column(lat_col),
            "max_lat": batch.column(lat_col),
            "min_lon": batch.column(lon_col),
            "max_lon": batch.column(lon_col),
            "n_pts": pa.array(np.ones(batch.num_rows, np.int64)),
        })
        return add_hash_pkey(_bbox_reduce(t, group_col), group_col,
                             n_parts, out_col="__gkey")

    def final(part: pa.Table) -> pa.Table:
        t = part.drop_columns(["__gkey"])
        if t.num_rows == 0:
            return t
        return _bbox_reduce(t, group_col)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gkey")
        .map_groups(final, batch_format="pyarrow")
    )
