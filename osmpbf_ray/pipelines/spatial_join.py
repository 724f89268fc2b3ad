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


# per-worker-process index cache for the task-based join path: tasks are
# elastic (no pool sizing), yet the index still builds once per worker.
# Bounded at ONE entry so long-lived workers never accumulate stale
# indexes across jobs (the cached copy outlives the driver's ref).
_TASK_INDEX_CACHE: dict = {}


def _cached_index(key, build):
    if _TASK_INDEX_CACHE.get("key") != key:
        _TASK_INDEX_CACHE.clear()
        _TASK_INDEX_CACHE["key"] = key
        _TASK_INDEX_CACHE["value"] = build()
    return _TASK_INDEX_CACHE["value"]


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
        )

    def join_task(batch: pa.Table) -> pa.Table:
        index = _cached_index((polys_ref.hex(), z), lambda: PolygonIndex(ray.get(polys_ref), z))
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        pts, polys = index.join_batch(lat, lon)
        taken = batch.take(pa.array(pts))
        return taken.append_column("poly_id", pa.array(polys, type=pa.int64()))

    return points_ds.map_batches(join_task, batch_format="pyarrow", zero_copy_batch=True)


def spatial_join_partitioned(points_ds, polygons_ds, coarse_z: int = 6,
                             z: int = 12, id_col: str = "image_id"):
    """points × polygons when the polygon side is TOO BIG to broadcast.

    The documented fallback of ``spatial_join``: pick ONE partitioning
    key — the coarse cell — and co-locate both sides on it. Each polygon
    replicates to every coarse cell its bbox covers (bounded fan-out:
    cover size at z=6 is small for real footprints); each point lands in
    exactly one coarse cell, so matches are never duplicated. Within a
    co-located group a local cell-cover index + ray-cast refine runs
    exactly like the broadcast path. Output rows: (id, lat, lon, poly_id).
    """

    def poly_cover_rows(batch: pa.Table) -> pa.Table:
        rows = {"ccell": [], "poly_id": [], "ring_lat": [], "ring_lon": []}
        ids = batch.column("poly_id").to_pylist()
        rings = batch.column("ring").to_pylist()
        for pid, ring in zip(ids, rings):
            rlat = [p["lat"] for p in ring]
            rlon = [p["lon"] for p in ring]
            for c in spatial.ring_cell_cover(np.asarray(rlat), np.asarray(rlon), coarse_z):
                rows["ccell"].append(int(c))
                rows["poly_id"].append(pid)
                rows["ring_lat"].append(rlat)
                rows["ring_lon"].append(rlon)
        return pa.table(
            {
                "ccell": pa.array(rows["ccell"], type=pa.int64()),
                "poly_id": pa.array(rows["poly_id"], type=pa.int64()),
                "ring_lat": pa.array(rows["ring_lat"], type=pa.list_(pa.float64())),
                "ring_lon": pa.array(rows["ring_lon"], type=pa.list_(pa.float64())),
                "__side": pa.array([1] * len(rows["ccell"]), type=pa.int8()),
                id_col: pa.array([None] * len(rows["ccell"]), type=pa.string()),
                "lat": pa.array([None] * len(rows["ccell"]), type=pa.float64()),
                "lon": pa.array([None] * len(rows["ccell"]), type=pa.float64()),
            }
        )

    def point_rows(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        ccell = spatial.lonlat_to_cell(lat, lon, coarse_z)
        n = batch.num_rows
        return pa.table(
            {
                "ccell": pa.array(ccell, type=pa.int64()),
                "poly_id": pa.array([None] * n, type=pa.int64()),
                "ring_lat": pa.array([None] * n, type=pa.list_(pa.float64())),
                "ring_lon": pa.array([None] * n, type=pa.list_(pa.float64())),
                "__side": pa.array(np.zeros(n, dtype=np.int8)),
                id_col: batch.column(id_col).cast(pa.string()),
                "lat": batch.column("lat"),
                "lon": batch.column("lon"),
            }
        )

    polys = polygons_ds.map_batches(poly_cover_rows, batch_format="pyarrow", zero_copy_batch=True)
    pts = points_ds.map_batches(point_rows, batch_format="pyarrow", zero_copy_batch=True)

    import pandas as pd

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({id_col: pd.Series(dtype="object"),
                              "lat": pd.Series(dtype="float64"),
                              "lon": pd.Series(dtype="float64"),
                              "poly_id": pd.Series(dtype="int64")})
        p = g[g["__side"] == 1]
        q = g[g["__side"] == 0]
        if not len(p) or not len(q):
            return empty
        polys_local = [
            {"poly_id": int(r.poly_id),
             "ring_lat": np.asarray(list(r.ring_lat)),
             "ring_lon": np.asarray(list(r.ring_lon))}
            for r in p.drop_duplicates("poly_id").itertuples()
        ]
        index = PolygonIndex(polys_local, z)
        lat = q["lat"].to_numpy()
        lon = q["lon"].to_numpy()
        pts_idx, poly_ids = index.join_batch(lat, lon)
        if not len(pts_idx):
            return empty
        sel = q.iloc[pts_idx]
        return pd.DataFrame({id_col: sel[id_col].to_numpy(),
                             "lat": sel["lat"].to_numpy(),
                             "lon": sel["lon"].to_numpy(),
                             "poly_id": poly_ids})

    return polys.union(pts).groupby("ccell").map_groups(join_group, batch_format="pandas")


class KnnStage:
    """Actor-pool stage: k nearest reference points for each batch row.

    The reference-point index (CellPointIndex) is built once per actor
    from a broadcast array; per row we do a k-ring candidate lookup +
    exact haversine refine — the engine's H3-kRing-expansion kNN.
    """

    def __init__(self, ref_points_ref, k: int = 5, z: int = 9):
        ids, lat, lon = ray.get(ref_points_ref)
        self.index = spatial.CellPointIndex(ids, lat, lon, z=z)
        self.k = k

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
            cand = self.index.ring_candidates(int(cells[grp[0]]), k)
            if len(cand) == 0:
                continue
            d = spatial.haversine_m(
                lat[grp][:, None], lon[grp][:, None],
                self.index.lat[cand][None, :], self.index.lon[cand][None, :],
            )
            kk = min(k, len(cand))
            top = np.argsort(d, axis=1, kind="stable")[:, :kk]
            nn_ids[grp[:, None], np.arange(kk)[None, :]] = self.index.ids[cand][top]
            nn_d[grp[:, None], np.arange(kk)[None, :]] = np.take_along_axis(d, top, axis=1)
        return batch.append_column(
            "nn_ids", pa.array(list(nn_ids), type=pa.list_(pa.int64()))
        ).append_column("nn_dist_m", pa.array(list(nn_d), type=pa.list_(pa.float64())))


def knn_join(points_ds, ref_ids, ref_lat, ref_lon, k: int = 5, z: int = 9, concurrency=(1, 4)):
    ref = ray.put((np.asarray(ref_ids), np.asarray(ref_lat), np.asarray(ref_lon)))
    return points_ds.map_batches(
        KnnStage,
        fn_constructor_kwargs={"ref_points_ref": ref, "k": k, "z": z},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


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
