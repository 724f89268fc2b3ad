"""Spatial join: points (images) × polygons via cell-cover pruning + PIP refine.

Generalizes the reference's only join — the id-range-pruned two-pass
ways→nodes semi-join (/root/reference/src/indexed.rs:264-330) — to space:
the polygon side's cell cover plays the role of the blob id-range zone map
(cheap superset test), ray-casting point-in-polygon plays the role of the
exact binary search (indexed.rs:314).

Scale shape: the polygon side is the SMALL side (10^4–10^6 polygons) and
is broadcast once via ``ray.put``; the image side (10^12 rows) streams
through a stateless-per-batch actor pool that builds the cell→polygon
index once per actor in ``__init__``. No shuffle at all — the join is
map-side, which is the only shape that works when the big side is 100 TB.
For polygon sets too big to broadcast, pre-partition both sides by
``cell_parent(cell, coarse_z)`` and run this join per partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from osmpbf_ray.stages import spatial
from osmpbf_ray.stages.ann import round_half_away as ann_round_half_away


def polygon_arrays(polygons: pa.Table) -> list[dict]:
    """Extract rings into numpy form once (driver-side, small)."""
    out = []
    rings = polygons.column("ring").to_pylist()
    ids = polygons.column("poly_id").to_pylist()
    for pid, ring in zip(ids, rings):
        out.append(
            {
                "poly_id": pid,
                "ring_lat": np.array([p["lat"] for p in ring]),
                "ring_lon": np.array([p["lon"] for p in ring]),
            }
        )
    return out


class PolygonIndex:
    """cell → candidate polygon ids, built once (actor ``__init__``)."""

    def __init__(self, polys: list[dict], z: int):
        self.z = z
        self.polys = polys
        self.cover: dict[int, list[int]] = {}
        for i, p in enumerate(polys):
            for c in spatial.ring_cell_cover(p["ring_lat"], p["ring_lon"], z):
                self.cover.setdefault(int(c), []).append(i)

    def join_batch(self, lat: np.ndarray, lon: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Return (point_idx, poly_id) pairs for containment matches."""
        cells = spatial.lonlat_to_cell(lat, lon, self.z)
        # group points by candidate polygon: poly -> point indices
        cand: dict[int, list[int]] = {}
        # vectorize the cell→poly lookup by grouping equal cells first
        order = np.argsort(cells, kind="stable")
        sorted_cells = cells[order]
        bounds = np.flatnonzero(np.diff(sorted_cells)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(cells)]])
        for s, e in zip(starts, ends):
            plist = self.cover.get(int(sorted_cells[s]))
            if not plist:
                continue
            pts = order[s:e]
            for pi in plist:
                cand.setdefault(pi, []).append(pts)
        out_pts, out_polys = [], []
        for pi, chunks in cand.items():
            pts = np.concatenate(chunks)
            p = self.polys[pi]
            inside = spatial.points_in_ring(lat[pts], lon[pts], p["ring_lat"], p["ring_lon"])
            hit = pts[inside]
            if len(hit):
                out_pts.append(hit)
                out_polys.append(np.full(len(hit), p["poly_id"], dtype=np.int64))
        if not out_pts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(out_pts), np.concatenate(out_polys)


class SpatialJoinStage:
    """Actor-pool map_batches stage: emit one row per (point, polygon) hit.

    ``polys_ref`` is ``ray.put(polygon_arrays(tbl))`` — fetched from the
    local object store once per actor, NOT per batch.
    """

    def __init__(self, polys_ref, z: int = 12, id_col: str = "image_id"):
        self.index = PolygonIndex(ray.get(polys_ref), z)
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        pts, polys = self.index.join_batch(lat, lon)
        taken = batch.take(pa.array(pts))
        return taken.append_column("poly_id", pa.array(polys, type=pa.int64()))


# per-worker-process index cache for the task-based join path: tasks
# are elastic (no pool sizing), yet the index still builds once per
# worker. Shared bounded implementation — state/workercache.py (this
# module used to carry a verbatim single-slot copy).
from osmpbf_ray.state.workercache import cached as _cached_index  # noqa: E402


def spatial_join(
    points_ds,
    polygons: pa.Table,
    z: int = 12,
    id_col: str = "image_id",
    concurrency: int | tuple | None = None,
):
    """points × polygons containment join (Dataset → Dataset).

    ``concurrency=None`` (default) runs as elastic tasks with a
    per-worker-process index cache — scales with whatever CPUs are free
    and can't deadlock against other pools. Pass an int/tuple to pin an
    actor pool instead (useful when index build is expensive enough to
    amortize strictly once per actor).
    """
    polys_ref = ray.put(polygon_arrays(polygons))
    if concurrency is not None:
        return points_ds.map_batches(
            SpatialJoinStage,
            fn_constructor_kwargs={"polys_ref": polys_ref, "z": z, "id_col": id_col},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
            max_restarts=0,
        )

    def join_task(batch: pa.Table) -> pa.Table:
        index = _cached_index((polys_ref.hex(), z), lambda: PolygonIndex(ray.get(polys_ref), z))
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        pts, polys = index.join_batch(lat, lon)
        taken = batch.take(pa.array(pts))
        return taken.append_column("poly_id", pa.array(polys, type=pa.int64()))

    return points_ds.map_batches(join_task, batch_format="pyarrow", zero_copy_batch=True)


def spatial_join_partitioned(points_ds, polygons_ds, z: int = 12,
                             id_col: str = "image_id",
                             n_parts: int | None = None):
    """points × polygons when the polygon side is TOO BIG to broadcast.

    Two co-partitioned phases, IDS-ONLY through the wide shuffle (the
    LSH pair shape — round 2 replicated each polygon's full ring into
    every covered coarse cell, the widest column times the fan-out):

    * phase 1 (candidates): polygons explode to ``(cell, poly_id)`` at
      the join cell level — 16 bytes per cover cell; points map to
      their single cell. Both sides co-locate on ``hash(cell) %
      n_parts`` and each cell's polys × points cross product emits
      candidate ``(point, poly_id)`` rows. A point lies in exactly one
      cell and cover cells are distinct, so a pair arises at most once
      — no dedup pass.
    * phase 2 (refine): candidates co-locate with their polygon's RING
      on ``hash(poly_id) % n_parts`` — the ring ships ONCE per polygon,
      never per pair — and a vectorized ray-cast PIP keeps true matches.

    Same candidate set and matches as the broadcast ``spatial_join``
    (equality-tested). Partitioning assumption: one polygon's candidates
    fit a partition — salt poly_id like the hash join if a single
    polygon dominates. Output rows: (id, lat, lon, poly_id).
    """
    from osmpbf_ray.functions.partitioning import sized_fanout

    if n_parts is None:
        n_parts = max(sized_fanout(points_ds), sized_fanout(polygons_ds))
    pkey_of = lambda a: (a.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                         % np.uint64(n_parts)).astype(np.int64)

    cand_schema = pa.schema([
        ("pkey", pa.int64()), ("__side", pa.int8()), ("cell", pa.int64()),
        ("poly_id", pa.int64()), (id_col, pa.string()),
        ("lat", pa.float64()), ("lon", pa.float64()),
    ])

    def poly_cover_rows(batch: pa.Table) -> pa.Table:
        cells, pids = [], []
        ids = batch.column("poly_id").to_pylist()
        rings = batch.column("ring").to_pylist()
        for pid, ring in zip(ids, rings):
            rlat = np.asarray([p["lat"] for p in ring])
            rlon = np.asarray([p["lon"] for p in ring])
            for c in spatial.ring_cell_cover(rlat, rlon, z):
                cells.append(int(c))
                pids.append(pid)
        cells_a = np.asarray(cells, dtype=np.int64)
        n = len(cells)
        return pa.Table.from_arrays(
            [pa.array(pkey_of(cells_a)), pa.array(np.ones(n, dtype=np.int8)),
             pa.array(cells_a), pa.array(np.asarray(pids, dtype=np.int64)),
             pa.nulls(n, pa.string()), pa.nulls(n, pa.float64()), pa.nulls(n, pa.float64())],
            schema=cand_schema,
        )

    def point_rows(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        cells = spatial.lonlat_to_cell(lat, lon, z).astype(np.int64)
        n = batch.num_rows
        return pa.Table.from_arrays(
            [pa.array(pkey_of(cells)), pa.array(np.zeros(n, dtype=np.int8)),
             pa.array(cells), pa.nulls(n, pa.int64()),
             batch.column(id_col).cast(pa.string()),
             batch.column("lat").cast(pa.float64()), batch.column("lon").cast(pa.float64())],
            schema=cand_schema,
        )

    polys = polygons_ds.map_batches(poly_cover_rows, batch_format="pyarrow", zero_copy_batch=True)
    pts = points_ds.map_batches(point_rows, batch_format="pyarrow", zero_copy_batch=True)

    pair_schema = pa.schema([
        (id_col, pa.string()), ("lat", pa.float64()),
        ("lon", pa.float64()), ("poly_id", pa.int64()),
    ])

    def candidates_group(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        cells = g.column("cell").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, cells))
        cells_s, side_s = cells[order], side[order]
        bounds = np.flatnonzero(np.diff(cells_s)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(cells_s)]])
        take_pt, rep_poly = [], []
        pids = g.column("poly_id").to_numpy(zero_copy_only=False)
        for s, e in zip(starts, ends):
            seg = order[s:e]
            pt_rows = seg[side_s[s:e] == 0]
            po_rows = seg[side_s[s:e] == 1]
            if len(pt_rows) == 0 or len(po_rows) == 0:
                continue
            take_pt.append(np.repeat(pt_rows, len(po_rows)))
            rep_poly.append(np.tile(pids[po_rows], len(pt_rows)))
        if not take_pt:
            return pair_schema.empty_table()
        idx = np.concatenate(take_pt)
        sel = g.select([id_col, "lat", "lon"]).take(pa.array(idx))
        return sel.append_column(
            "poly_id", pa.array(np.concatenate(rep_poly).astype(np.int64))
        ).cast(pair_schema)

    candidates = polys.union(pts).groupby("pkey").map_groups(
        candidates_group, batch_format="pyarrow"
    )

    refine_schema = pa.schema([
        ("pkey", pa.int64()), ("__side", pa.int8()), ("poly_id", pa.int64()),
        (id_col, pa.string()), ("lat", pa.float64()), ("lon", pa.float64()),
        ("ring_lat", pa.list_(pa.float64())), ("ring_lon", pa.list_(pa.float64())),
    ])

    def ring_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("poly_id").to_pylist()
        rings = batch.column("ring").to_pylist()
        rlat = [[p["lat"] for p in ring] for ring in rings]
        rlon = [[p["lon"] for p in ring] for ring in rings]
        pid = np.asarray(ids, dtype=np.int64)
        n = len(ids)
        return pa.Table.from_arrays(
            [pa.array(pkey_of(pid)), pa.array(np.ones(n, dtype=np.int8)), pa.array(pid),
             pa.nulls(n, pa.string()), pa.nulls(n, pa.float64()), pa.nulls(n, pa.float64()),
             pa.array(rlat, type=pa.list_(pa.float64())), pa.array(rlon, type=pa.list_(pa.float64()))],
            schema=refine_schema,
        )

    def cand_rows(batch: pa.Table) -> pa.Table:
        pid = batch.column("poly_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch.num_rows
        return pa.Table.from_arrays(
            [pa.array(pkey_of(pid)), pa.array(np.zeros(n, dtype=np.int8)),
             batch.column("poly_id"), batch.column(id_col),
             batch.column("lat"), batch.column("lon"),
             pa.nulls(n, pa.list_(pa.float64())), pa.nulls(n, pa.list_(pa.float64()))],
            schema=refine_schema,
        )

    rings = polygons_ds.map_batches(ring_rows, batch_format="pyarrow", zero_copy_batch=True)
    cands = candidates.map_batches(cand_rows, batch_format="pyarrow", zero_copy_batch=True)

    def refine_group(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        pids = g.column("poly_id").to_numpy(zero_copy_only=False)
        poly_rows = np.flatnonzero(side == 1)
        ring_of = {}
        rl = g.column("ring_lat")
        rn = g.column("ring_lon")
        for i in poly_rows:
            ring_of[int(pids[i])] = (
                np.asarray(rl[int(i)].as_py(), dtype=np.float64),
                np.asarray(rn[int(i)].as_py(), dtype=np.float64),
            )
        cand_rows_idx = np.flatnonzero(side == 0)
        if len(cand_rows_idx) == 0 or not ring_of:
            return pair_schema.empty_table()
        lat = g.column("lat").to_numpy(zero_copy_only=False)[cand_rows_idx]
        lon = g.column("lon").to_numpy(zero_copy_only=False)[cand_rows_idx]
        cpid = pids[cand_rows_idx]
        order = np.argsort(cpid, kind="stable")
        bounds = np.flatnonzero(np.diff(cpid[order])) + 1
        keep = []
        for seg in np.split(order, bounds):
            ring = ring_of.get(int(cpid[seg[0]]))
            if ring is None:
                continue
            inside = spatial.points_in_ring(lat[seg], lon[seg], ring[0], ring[1])
            keep.append(seg[inside])
        if not keep:
            return pair_schema.empty_table()
        idx = cand_rows_idx[np.concatenate(keep)]
        return g.select([id_col, "lat", "lon", "poly_id"]).take(pa.array(idx)).cast(pair_schema)

    return rings.union(cands).groupby("pkey").map_groups(
        refine_group, batch_format="pyarrow"
    )


class KnnStage:
    """Actor-pool stage: k nearest reference points for each batch row.

    The reference-point index (CellPointIndex) is built once per actor
    from a broadcast array; per row we do a k-ring candidate lookup +
    exact refine — the engine's H3-kRing-expansion kNN.

    ``metric``: ``"haversine"`` (default; meters, numpy trig — not
    SQL-reproducible bit-for-bit) or ``"planar_deg"`` (rounded-to-9
    planar degree distance with neighbor-id tie-break — the SAME
    composite ``knn_join_exact`` ranks on, so when the ring expansion
    covers the true top-k the k-ring path is bit-equal to the exact
    baseline and shares its SQL oracle).
    """

    def __init__(self, ref_points_ref, k: int = 5, z: int = 9,
                 metric: str = "haversine"):
        if metric not in ("haversine", "planar_deg"):
            raise ValueError(f"unknown metric {metric!r}")
        ids, lat, lon = ray.get(ref_points_ref)
        self.index = spatial.CellPointIndex(ids, lat, lon, z=z)
        self.k = k
        self.metric = metric

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        n, k = len(lat), self.k
        nn_ids = np.full((n, k), -1, dtype=np.int64)
        nn_d = np.full((n, k), np.inf)
        if n == 0:  # Ray Data passes empty batches to UDFs; np.split of an
            # empty order array would yield one empty group below
            return batch.append_column(
                "nn_ids", pa.array([], type=pa.list_(pa.int64()))
            ).append_column("nn_dist_m", pa.array([], type=pa.list_(pa.float64())))
        # vectorize by query cell: all points in one cell share the same
        # k-ring candidate set, so ring expansion + the distance matrix +
        # the top-k run once per distinct cell, not once per row
        cells = spatial.lonlat_to_cell(lat, lon, self.index.z)
        order = np.argsort(cells, kind="stable")
        bounds = np.flatnonzero(np.diff(cells[order])) + 1
        for grp in np.split(order, bounds):
            qcell = int(cells[grp[0]])
            if self.metric == "haversine":
                # EXACT like the planar branch: expand until the group's
                # worst k-th candidate distance is certified
                # (ring_bound_m) closer than any unexplored cell
                want = min(k, len(self.index.ids))
                r, d = 1, None
                while True:
                    cand = self.index._points_in_cells(spatial.k_ring(qcell, r))
                    bound = self.index.ring_bound_m(qcell, r)
                    grid_done = bound == float("inf")
                    if len(cand) >= want or grid_done:
                        if len(cand):
                            d = spatial.haversine_m(
                                lat[grp][:, None], lon[grp][:, None],
                                self.index.lat[cand][None, :],
                                self.index.lon[cand][None, :],
                            )
                            kk = min(k, len(cand))
                            worst_kth = np.partition(d, kk - 1, axis=1)[:, kk - 1].max()
                            if grid_done or worst_kth <= bound:
                                break
                        elif grid_done:
                            break
                    r *= 2
                if len(cand) == 0:
                    continue
                top = np.argsort(d, axis=1, kind="stable")
            else:
                # planar_deg: wrapped-lon planar metric, rounded, id
                # tie-break (the oracle composite) — EXACT: rings keep
                # expanding until the group's worst k-th candidate
                # distance is certified (ring_bound_deg) closer than any
                # unexplored cell could be
                r, d = 1, None
                while True:
                    cand = self.index._points_in_cells(spatial.k_ring(qcell, r))
                    bound = self.index.ring_bound_deg(qcell, r)
                    grid_done = bound == float("inf")
                    if len(cand) >= min(k, len(self.index.ids)) or grid_done:
                        if len(cand):
                            dlat = lat[grp][:, None] - self.index.lat[cand][None, :]
                            dlon = np.abs(lon[grp][:, None] - self.index.lon[cand][None, :])
                            dlon = np.minimum(dlon, 360.0 - dlon)
                            d = ann_round_half_away(np.sqrt(dlat * dlat + dlon * dlon), 9)
                            kk = min(k, len(cand))
                            worst_kth = np.partition(d, kk - 1, axis=1)[:, kk - 1].max()
                            # 1e-6 slack absorbs the 1e-9 rounding of d
                            # (the bound itself is raw geometry)
                            if grid_done or worst_kth <= bound - 1e-6:
                                break
                        elif grid_done:
                            break  # whole grid searched, no refs at all
                    r *= 2
                if len(cand) == 0:
                    continue
                top = np.lexsort(
                    (np.broadcast_to(self.index.ids[cand], d.shape), d), axis=1
                )
            kk = min(k, len(cand))
            top = top[:, :kk]
            nn_ids[grp[:, None], np.arange(kk)[None, :]] = self.index.ids[cand][top]
            nn_d[grp[:, None], np.arange(kk)[None, :]] = np.take_along_axis(d, top, axis=1)
        return batch.append_column(
            "nn_ids", pa.array(list(nn_ids), type=pa.list_(pa.int64()))
        ).append_column("nn_dist_m", pa.array(list(nn_d), type=pa.list_(pa.float64())))


def knn_join(points_ds, ref_ids, ref_lat, ref_lon, k: int = 5, z: int = 9,
             concurrency=None, metric: str = "haversine"):
    """``concurrency=None`` (default) runs as elastic tasks with the
    CellPointIndex cached once per worker process (same rationale as
    :func:`spatial_join`); pass an int/tuple to pin an actor pool when
    the reference set is large enough that a strictly-once-per-actor
    build matters."""
    ref = ray.put((np.asarray(ref_ids), np.asarray(ref_lat), np.asarray(ref_lon)))
    if concurrency is not None:
        return points_ds.map_batches(
            KnnStage,
            fn_constructor_kwargs={"ref_points_ref": ref, "k": k, "z": z,
                                   "metric": metric},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
            max_restarts=0,
        )

    def knn_task(batch: pa.Table) -> pa.Table:
        stage = _cached_index(
            ("knn_stage", ref.hex(), k, z, metric),
            lambda: KnnStage(ref_points_ref=ref, k=k, z=z, metric=metric))
        return stage(batch)

    return points_ds.map_batches(knn_task, batch_format="pyarrow",
                                 zero_copy_batch=True)


def explode_knn(ds, id_col: str = "c_custkey"):
    """(id, nn_ids list, nn_dist list) → one row per (id, rank, nn_id) —
    the same exploded shape ``knn_join_exact`` emits, so the k-ring path
    can be compared row-for-row against the exact baseline / SQL oracle.
    Unfilled slots (nn_id == -1, no candidates) are dropped."""

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty = pa.table({
            id_col: pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64()),
            "nn_id": pa.array([], type=pa.int64()),
            "dist_deg": pa.array([], type=pa.float64()),
        })
        if n == 0:
            return empty
        ids = batch.column(id_col).to_numpy()
        nn = batch.column("nn_ids").combine_chunks()
        dist = batch.column("nn_dist_m").combine_chunks()
        lens = np.diff(nn.offsets.to_numpy(zero_copy_only=False))
        flat_nn = nn.flatten().to_numpy(zero_copy_only=False)
        flat_d = dist.flatten().to_numpy(zero_copy_only=False)
        ranks = np.concatenate([np.arange(1, ln + 1, dtype=np.int64) for ln in lens]) \
            if n else np.empty(0, dtype=np.int64)
        rep = np.repeat(ids, lens)
        keep = flat_nn != -1
        if not keep.any():
            return empty
        return pa.table({
            id_col: rep[keep],
            "rank": ranks[keep],
            "nn_id": flat_nn[keep],
            "dist_deg": flat_d[keep],
        })

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def knn_join_exact(points_ds, ref_ids, ref_lat, ref_lon, k: int = 3,
                   id_col: str = "c_custkey"):
    """Exact kNN against a SMALL broadcast reference set, exploded to one
    row per (point, rank, neighbor).

    Oracle-reproducible by construction: planar-degree distance
    ``sqrt(dlat² + dlon²)`` uses only IEEE-exact arithmetic (no trig), is
    rounded half-away to 9 digits, and ties break on neighbor id — the
    same ordering key a SQL ``row_number() OVER (ORDER BY dist, id)``
    computes. The k-ring ``knn_join`` above is the scale path (indexed
    candidates); this is the exact baseline it is tested against.
    """
    from osmpbf_ray.stages.ann import round_half_away

    ref = ray.put((np.asarray(ref_ids, dtype=np.int64),
                   np.asarray(ref_lat, dtype=np.float64),
                   np.asarray(ref_lon, dtype=np.float64)))

    def knn_task(batch: pa.Table) -> pa.Table:
        rids, rlat, rlon = _cached_index(("knn_exact", ref.hex()), lambda: ray.get(ref))
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        n = len(lat)
        kk = min(k, len(rids))
        if n == 0 or kk == 0:
            return pa.table({
                id_col: pa.array([], type=batch.schema.field(id_col).type),
                "rank": pa.array([], type=pa.int64()),
                "nn_id": pa.array([], type=pa.int64()),
                "dist_deg": pa.array([], type=pa.float64()),
            })
        d = round_half_away(
            np.sqrt((lat[:, None] - rlat[None, :]) ** 2 + (lon[:, None] - rlon[None, :]) ** 2), 9
        )
        # rank by (dist, neighbor id): argsort the composite via lexsort per row
        order = np.lexsort((np.broadcast_to(rids, d.shape), d), axis=1)[:, :kk]
        ids = batch.column(id_col).to_numpy()
        return pa.table({
            id_col: np.repeat(ids, kk),
            "rank": np.tile(np.arange(1, kk + 1, dtype=np.int64), n),
            "nn_id": rids[order].ravel(),
            "dist_deg": np.take_along_axis(d, order, axis=1).ravel(),
        })

    return points_ds.map_batches(knn_task, batch_format="pyarrow", zero_copy_batch=True)
