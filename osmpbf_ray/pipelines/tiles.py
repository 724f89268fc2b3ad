"""Raster↔vector tile assignment + skew-aware tile statistics.

Engine-new operators (SURVEY.md §2.12). Tile assignment is a stateless
per-batch map (pure arithmetic); tile statistics are the canonical
partial+final aggregation: counts are combined INSIDE each batch first
(one output row per distinct tile per batch), so the shuffle moves
#distinct-tiles rows instead of #input rows — the same contract as the
reference's par_map_reduce partials (/root/reference/src/reader.rs:119-142).

Skew: dense urban cells are heavy-tailed. The partial-aggregate shape is
itself the skew fix for counts/sums (a hot tile contributes ≤1 row per
batch regardless of its row count). For non-combinable per-tile work
(``map_groups``), ``salted_groupby_count`` demonstrates explicit salting:
hot keys split across ``n_salt`` sub-keys, aggregated twice.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from osmpbf_ray.stages import spatial


def assign_tiles(batch: pa.Table, z: int, lat_col="lat", lon_col="lon") -> pa.Table:
    """map_batches fn: add tile_z/tile_x/tile_y/tile (packed) columns."""
    lat = batch.column(lat_col).to_numpy()
    lon = batch.column(lon_col).to_numpy()
    x, y = spatial.lonlat_to_tile(lat, lon, z)
    return (
        batch.append_column("tile_z", pa.array(np.full(len(x), z, dtype=np.int32)))
        .append_column("tile_x", pa.array(x))
        .append_column("tile_y", pa.array(y))
        .append_column("tile", pa.array(spatial.pack_cell(z, x, y)))
    )


def partial_tile_counts(batch: pa.Table, tile_col: str = "tile") -> pa.Table:
    """Combiner: one (tile, partial_count) row per distinct tile per batch."""
    tiles = batch.column(tile_col).to_numpy()
    uniq, counts = np.unique(tiles, return_counts=True)
    return pa.table({tile_col: uniq, "partial_count": counts.astype(np.int64)})


def tile_stats(points_ds, z: int, lat_col="lat", lon_col="lon", final: str = "shuffle"):
    """Dataset of (tile, tile_z, tile_x, tile_y, n) — rows per tile.

    Pipeline: assign → per-batch combine → small final sum. The final
    combine sees only pre-aggregated partials (≤ one row per distinct
    tile per block). ``final="shuffle"`` runs it as a distributed
    groupby (scale path for huge key spaces); ``final="driver"`` folds
    the tiny partials on the driver — the reference's par_map_reduce
    final-reduce shape (/root/reference/src/reader.rs:135-141), right
    whenever #distinct tiles is small (any z ≤ ~10), and avoids an
    all-to-all shuffle whose fixed cost dwarfs the data;
    ``final="partitioned"`` is the middle path — distributed like
    "shuffle" but hash-partitioned to 64 groups with one vectorized
    bincount each, dodging Ray's ~ms-per-distinct-key aggregate cost at
    large z.
    """
    from ray.data.aggregate import Sum

    assigned = points_ds.map_batches(
        lambda b: assign_tiles(b, z, lat_col, lon_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    partials = assigned.map_batches(
        partial_tile_counts, batch_format="pyarrow", zero_copy_batch=True
    )
    if final == "driver":
        import pandas as pd
        import ray.data as rd

        batches = list(partials.iter_batches(batch_format="pandas"))
        acc = (
            pd.concat(batches, ignore_index=True)
            if batches
            else pd.DataFrame()  # a fully-empty join yields NO batches at all
        )
        if len(acc) == 0:
            acc = pd.DataFrame({"tile": pd.Series(dtype="int64"), "n": pd.Series(dtype="int64")})
        else:
            acc = acc.groupby("tile", as_index=False)["partial_count"].sum().rename(
                columns={"partial_count": "n"}
            )
        agg = rd.from_pandas(acc)
    elif final == "shuffle":
        agg = partials.groupby("tile").aggregate(Sum("partial_count", alias_name="n"))
    elif final == "partitioned":
        # hash-partition + one vectorized bincount per group —
        # distributed like "shuffle" but without Ray's per-key
        # aggregate cost (~ms per distinct tile)
        from osmpbf_ray.functions.partitioning import add_hash_pkey

        def add_pkey(batch: pa.Table) -> pa.Table:
            return add_hash_pkey(batch, "tile", 64)

        def sum_tiles(g: pa.Table) -> pa.Table:
            if g.num_rows == 0:
                return pa.table({"tile": pa.array([], type=pa.int64()),
                                 "n": pa.array([], type=pa.int64())})
            uniq, inv = np.unique(g.column("tile").to_numpy(), return_inverse=True)
            n = np.bincount(inv, weights=g.column("partial_count").to_numpy())
            return pa.table({"tile": uniq, "n": n.astype(np.int64)})

        agg = (
            partials.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("__pkey")
            .map_groups(sum_tiles, batch_format="pyarrow")
        )
    else:
        raise ValueError(f"unknown final mode {final!r}: "
                         "expected 'shuffle', 'driver' or 'partitioned'")

    def unpack(batch: pa.Table) -> pa.Table:
        zz, x, y = spatial.unpack_cell(batch.column("tile").to_numpy())
        return (
            batch.append_column("tile_z", pa.array(zz.astype(np.int32)))
            .append_column("tile_x", pa.array(x))
            .append_column("tile_y", pa.array(y))
        )

    return agg.map_batches(unpack, batch_format="pyarrow")


def salted_groupby_count(ds, key_col: str, n_salt: int = 8):
    """Two-phase salted aggregation for skewed keys.

    Phase 1 groups by (key, salt) — a hot key's rows split across
    ``n_salt`` reducers; phase 2 merges the per-salt partials. Use this
    shape whenever per-group work can't be pre-combined per batch.
    """
    from ray.data.aggregate import Count, Sum

    def add_salt(batch: pa.Table) -> pa.Table:
        # deterministic salt from a secondary hash so reruns agree
        k = batch.column(key_col).to_numpy().astype(np.uint64)
        salt = ((k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) % np.uint64(n_salt)
        return batch.append_column("_salt", pa.array(salt.astype(np.int64)))

    phase1 = (
        ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, "_salt"])
        .aggregate(Count(alias_name="partial_n"))
    )
    return phase1.groupby(key_col).aggregate(Sum("partial_n", alias_name="n"))


def top_k_tiles(points_ds, z: int, k: int):
    """Top-k densest tiles: aggregate first (small), then sort+limit."""
    stats = tile_stats(points_ds, z)
    return stats.sort(["n", "tile"], descending=[True, False]).limit(k)


def tile_rollup(points_ds, base_z: int, parent_zs: list[int],
                lat_col="lat", lon_col="lon", materialize: bool = True) -> dict:
    """Multi-resolution tile counts: {z: Dataset(tile, tile_z, tile_x,
    tile_y, n)} for ``base_z`` and every coarser ``parent_zs`` level.

    Aggregation-tree shape with ONE exchange for the whole tree: each
    batch emits per-level partial counts (base-level unique+count, then
    each parent level rolled up from the base partials in-memory — the
    slippy x/y floor composition makes parent-of-assignment identical
    to direct coarse assignment, so the rollup is exact), keyed by the
    tile's COARSEST-level ancestor. Every level of a subtree therefore
    co-locates in one group and the whole tree sums in a single
    ``groupby`` — vs one all-to-all per level (3 exchanges measured
    ~8 s on a 4k-tile table; exchange fixed cost, not data).

    Packed cell ids carry their zoom (spatial.pack_cell), so one
    unique/bincount per group aggregates all levels at once.

    The combined result (Σ_z ≤ 4^z rows — metadata-sized for z ≤ ~12)
    is materialized by default so the per-level views share one
    execution instead of re-running the scan per consumer (lazy
    Datasets re-execute their whole DAG per consumer). Pass
    ``materialize=False`` for very deep base zooms and consume levels
    once each.

    Parallelism bound: groups = #distinct coarsest-level cells
    (4^min(parent_zs)). For deep trees partition at an intermediate
    level and cascade calls.
    """
    zs = sorted({base_z, *parent_zs}, reverse=True)
    if zs[0] != base_z:
        raise ValueError("parent_zs must all be coarser (<=) than base_z")
    coarsest = zs[-1]

    def level_partials(batch: pa.Table) -> pa.Table:
        empty = pa.table({"tile": pa.array([], type=pa.int64()),
                          "partial_count": pa.array([], type=pa.int64()),
                          "__pkey": pa.array([], type=pa.int64())})
        if batch.num_rows == 0:
            return empty
        lat = batch.column(lat_col).to_numpy()
        lon = batch.column(lon_col).to_numpy()
        base, counts = np.unique(spatial.lonlat_to_cell(lat, lon, base_z),
                                 return_counts=True)
        counts = counts.astype(np.int64)
        tiles, ns = [base], [counts]
        for z in zs[1:]:
            parents = spatial.cell_parent(base, z)
            u, inv = np.unique(parents, return_inverse=True)
            tiles.append(u)
            ns.append(np.bincount(inv, weights=counts).astype(np.int64))
        tile = np.concatenate(tiles)
        return pa.table({
            "tile": tile,
            "partial_count": np.concatenate(ns),
            "__pkey": spatial.cell_parent(tile, coarsest),
        })

    def sum_subtree(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"tile": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        uniq, inv = np.unique(g.column("tile").to_numpy(), return_inverse=True)
        n = np.bincount(inv, weights=g.column("partial_count").to_numpy())
        return pa.table({"tile": uniq, "n": n.astype(np.int64)})

    def unpack(batch: pa.Table) -> pa.Table:
        zz, x, y = spatial.unpack_cell(batch.column("tile").to_numpy())
        return (
            batch.append_column("tile_z", pa.array(zz.astype(np.int32)))
            .append_column("tile_x", pa.array(x))
            .append_column("tile_y", pa.array(y))
        )

    combined = (
        points_ds.map_batches(level_partials, batch_format="pyarrow",
                              zero_copy_batch=True)
        .groupby("__pkey")
        .map_groups(sum_subtree, batch_format="pyarrow")
        .map_batches(unpack, batch_format="pyarrow")
    )
    if materialize:
        combined = combined.materialize()

    def pick(z: int):
        def f(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch.column("tile_z"), z))
        return f

    return {z: combined.map_batches(pick(z), batch_format="pyarrow") for z in zs}
