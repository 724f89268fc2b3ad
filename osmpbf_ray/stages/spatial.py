"""Spatial core: hierarchical cell index, point-in-polygon, kNN, tiling.

Engine-new operators (SURVEY.md §2.12) — the reference has no spatial ops;
its one join is the id-range-pruned ways→nodes semi-join
(/root/reference/src/indexed.rs:264-330). This module generalizes that
"prune by cheap index, refine exactly" pattern to space:

* cell index  — Web-Mercator quad cells (slippy z/x/y packed into one
  int64), the engine's H3/S2 stand-in. Purely arithmetic, vectorized,
  and expressible in ANSI SQL so the DuckDB oracle can reproduce it.
* cell cover  — bbox cover of a polygon at a zoom = candidate pruning
  (the analog of the reference's blob id-range zone maps,
  /root/reference/src/indexed.rs:57-106).
* PIP refine  — vectorized ray-casting point-in-polygon.
* kNN         — k-ring expansion around a query cell, refined by exact
  distance (brute force fallback for the oracle).

All kernels are numpy over Arrow columns; no Python-per-row loops.
"""

from __future__ import annotations

import numpy as np

# cell packing: cell = (z << 58) | (x << 29) | y ; z <= 28 fits in int64
_Z_SHIFT = 58
_X_SHIFT = 29
_XY_MASK = (1 << 29) - 1

# Web-Mercator clamp (same as slippy-map tiles)
MAX_LAT = 85.05112878


def lonlat_to_tile(lat: np.ndarray, lon: np.ndarray, z: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized slippy-map tile math.

    Uses the ``ln(tan(pi/4 + lat_rad/2))`` form verbatim so the DuckDB
    oracle (``ln``/``tan``/``pi`` only — no asinh in DuckDB 1.0) evaluates
    the bit-identical float64 expression. See ``tile_sql_exprs`` below.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    n = float(1 << z)
    x = np.floor((lon + 180.0) / 360.0 * n)
    lat_c = np.clip(lat, -MAX_LAT, MAX_LAT)
    y = np.floor((1.0 - np.log(np.tan(np.pi / 4.0 + lat_c * np.pi / 360.0)) / np.pi) / 2.0 * n)
    x = np.clip(x, 0, n - 1).astype(np.int64)
    y = np.clip(y, 0, n - 1).astype(np.int64)
    return x, y


def tile_sql_exprs(lat_col: str, lon_col: str, z: int) -> tuple[str, str]:
    """DuckDB SQL expressions computing exactly ``lonlat_to_tile``.

    Returns (x_expr, y_expr). Must stay formula-identical to the numpy
    path — the correctness oracle hashes these values.
    """
    n = float(1 << z)
    x = (
        f"CAST(least(greatest(floor(({lon_col} + 180.0) / 360.0 * {n}), 0), {n} - 1) AS BIGINT)"
    )
    lat_c = f"least(greatest({lat_col}, {-MAX_LAT}), {MAX_LAT})"
    y = (
        f"CAST(least(greatest(floor((1.0 - ln(tan(pi() / 4.0 + ({lat_c}) * pi() / 360.0))"
        f" / pi()) / 2.0 * {n}), 0), {n} - 1) AS BIGINT)"
    )
    return x, y


def pack_cell(z: int | np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Pack (z, x, y) into one int64 cell id (the engine's spatial key)."""
    z_arr = np.asarray(z, dtype=np.int64)
    return (z_arr << _Z_SHIFT) | (np.asarray(x, dtype=np.int64) << _X_SHIFT) | np.asarray(
        y, dtype=np.int64
    )


def unpack_cell(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    return cell >> _Z_SHIFT, (cell >> _X_SHIFT) & _XY_MASK, cell & _XY_MASK


def cell_sql_expr(lat_col: str, lon_col: str, z: int) -> str:
    """SQL expression for the packed cell id (matches pack_cell∘lonlat_to_tile)."""
    x, y = tile_sql_exprs(lat_col, lon_col, z)
    return f"({z} * {1 << _Z_SHIFT} + ({x}) * {1 << _X_SHIFT} + ({y}))"


def lonlat_to_cell(lat: np.ndarray, lon: np.ndarray, z: int) -> np.ndarray:
    x, y = lonlat_to_tile(lat, lon, z)
    return pack_cell(z, x, y)


def cell_parent(cell: np.ndarray, parent_z: int) -> np.ndarray:
    """Coarsen cells to an ancestor zoom (hierarchy walk, like H3 parent)."""
    z, x, y = unpack_cell(cell)
    shift = z - parent_z
    if np.any(shift < 0):
        raise ValueError("parent_z must be <= cell zoom")
    return pack_cell(parent_z, x >> shift, y >> shift)


def k_ring(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k of ``cell`` at the same zoom.

    x wraps around the antimeridian; y is clamped at the poles. This is
    the engine's analog of H3's kRing, used for kNN candidate expansion.
    """
    z, x, y = unpack_cell(np.asarray([cell]))
    z, x, y = int(z[0]), int(x[0]), int(y[0])
    n = 1 << z
    dxs, dys = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    xs = (x + dxs.ravel()) % n
    ys = y + dys.ravel()
    ok = (ys >= 0) & (ys < n)
    return np.unique(pack_cell(z, xs[ok], ys[ok]))


def tile_bounds(z: int, x: int, y: int) -> tuple[float, float, float, float]:
    """(lat_min, lat_max, lon_min, lon_max) of a tile (inverse mercator)."""
    n = float(1 << z)
    lon_min = x / n * 360.0 - 180.0
    lon_max = (x + 1) / n * 360.0 - 180.0

    def lat_of(yy: float) -> float:
        return float(np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * yy / n)))))

    return lat_of(y + 1), lat_of(y), lon_min, lon_max


# --- point-in-polygon -------------------------------------------------------


def points_in_ring(lat: np.ndarray, lon: np.ndarray, ring_lat: np.ndarray, ring_lon: np.ndarray) -> np.ndarray:
    """Vectorized ray-casting containment test.

    ``ring_*`` is a closed ring (first == last vertex, mirroring the
    reference's closed way refs [105,106,108,105],
    /root/reference/tests/read.rs:160). Points exactly on an edge may go
    either way (standard even-odd rule); fixtures avoid degenerate points.
    Cost O(#points × #vertices) per call — callers prune candidates by
    cell cover first.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    ry = np.asarray(ring_lat, dtype=np.float64)
    rx = np.asarray(ring_lon, dtype=np.float64)
    inside = np.zeros(lat.shape, dtype=bool)
    # iterate edges (few), vectorize over points (many)
    for i in range(len(ry) - 1):
        y1, x1, y2, x2 = ry[i], rx[i], ry[i + 1], rx[i + 1]
        if y1 == y2:
            continue
        cross = (lat >= min(y1, y2)) & (lat < max(y1, y2))
        if not cross.any():
            continue
        x_at = x1 + (lat - y1) * (x2 - x1) / (y2 - y1)
        inside ^= cross & (lon < x_at)
    return inside


def ring_bbox(ring_lat: np.ndarray, ring_lon: np.ndarray) -> tuple[float, float, float, float]:
    return (
        float(np.min(ring_lat)),
        float(np.max(ring_lat)),
        float(np.min(ring_lon)),
        float(np.max(ring_lon)),
    )


def ring_cell_cover(ring_lat: np.ndarray, ring_lon: np.ndarray, z: int) -> np.ndarray:
    """Candidate cells for a polygon: all tiles intersecting its bbox.

    This is the pruning index (coarse superset); exact membership is
    decided by ``points_in_ring``. The analog of the reference's lazily
    built blob id-range index (/root/reference/src/indexed.rs:175-222).
    """
    lat_min, lat_max, lon_min, lon_max = ring_bbox(ring_lat, ring_lon)
    x0, y0 = lonlat_to_tile(np.asarray([lat_max]), np.asarray([lon_min]), z)
    x1, y1 = lonlat_to_tile(np.asarray([lat_min]), np.asarray([lon_max]), z)
    xs = np.arange(int(x0[0]), int(x1[0]) + 1)
    ys = np.arange(int(y0[0]), int(y1[0]) + 1)
    gx, gy = np.meshgrid(xs, ys)
    return pack_cell(z, gx.ravel(), gy.ravel())


# --- kNN --------------------------------------------------------------------


def haversine_m(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in meters (vectorized, broadcasting)."""
    r = 6371000.0
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dp / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    return 2.0 * r * np.arcsin(np.sqrt(a))


class CellPointIndex:
    """In-memory cell → points index for k-ring kNN lookup.

    Built once (per actor, in ``__init__`` of the stage that uses it) from
    a small-to-medium point set broadcast via ``ray.put``; queried per
    batch. The scale path: index only the small side (reference points /
    polygon anchors), stream the big side through ``map_batches``.
    """

    def __init__(self, ids: np.ndarray, lat: np.ndarray, lon: np.ndarray, z: int = 12):
        self.z = z
        self.ids = np.asarray(ids, dtype=np.int64)
        self.lat = np.asarray(lat, dtype=np.float64)
        self.lon = np.asarray(lon, dtype=np.float64)
        cells = lonlat_to_cell(self.lat, self.lon, z)
        order = np.argsort(cells, kind="stable")
        self._cells_sorted = cells[order]
        self._order = order

    def _points_in_cells(self, cells: np.ndarray) -> np.ndarray:
        """Indices (into ids) of points lying in any of ``cells``."""
        lo = np.searchsorted(self._cells_sorted, cells, side="left")
        hi = np.searchsorted(self._cells_sorted, cells, side="right")
        out = [self._order[a:b] for a, b in zip(lo, hi) if b > a]
        return np.concatenate(out) if out else np.empty(0, dtype=np.int64)

    def ring_bound_deg(self, qcell: int, r: int) -> float:
        """Conservative lower bound on the wrapped planar-degree distance
        from ANY point inside ``qcell`` to ANY point in a cell OUTSIDE
        Chebyshev ring ``r`` — the certificate that makes k-ring kNN
        exact: once the k-th candidate's distance is <= this bound, no
        unexplored cell can hold a closer point. Returns ``inf`` when
        ring ``r`` already covers the whole (wrapped-x, pole-clamped-y)
        grid.

        x is uniform in degrees (360/2^z per cell); y tiles are Mercator,
        so the latitude bound multiplies ``r`` by the MINIMUM tile height
        in the band the ring spans.
        """
        z, x, y = unpack_cell(np.asarray([qcell]))
        z, y = int(z[0]), int(y[0])
        n = 1 << z
        covered_x = (2 * r + 1) >= n
        covered_y = (y - r) < 0 and (y + r) > n - 1
        if covered_x and covered_y:
            return float("inf")
        bx = r * (360.0 / n) if not covered_x else float("inf")
        if covered_y:
            by = float("inf")
        else:
            ys = np.arange(max(0, y - r - 1), min(n, y + r + 2) + 1, dtype=np.float64)
            lat_tops = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * ys / n))))
            by = r * float(np.min(-np.diff(lat_tops)))
        return min(bx, by)

    def ring_bound_m(self, qcell: int, r: int) -> float:
        """Conservative lower bound on the HAVERSINE distance (meters)
        from any point inside ``qcell`` to any point outside Chebyshev
        ring ``r`` — the meters twin of :meth:`ring_bound_deg`, making
        the haversine k-ring search exact.

        A point outside ring r is ≥ r+1 tiles away in x OR in y.
        * y case: latitude separation ≥ the r full tile heights strictly
          between, ≥ r × the band's minimum tile height; meters via arc
          length (d ≥ R·Δφ is exact on a sphere).
        * x case: the point's y-tile is then WITHIN ring r, so its
          latitude lies in the ring's band and cos(lat) ≥ the band-edge
          cosine; d ≥ 2R·asin(cos_band·sin(Δλ/2)) from the haversine
          formula with sin²(Δφ/2) ≥ 0. Edge tiles clamp poleward points
          (their true |lat| reaches 90°), so a band touching tile 0 or
          n−1 degrades the x bound to 0 and the y bound governs.
        """
        zs, _xs, ys_ = unpack_cell(np.asarray([qcell]))
        z, y = int(zs[0]), int(ys_[0])
        n = 1 << z
        earth_r = 6371000.0
        covered_x = (2 * r + 1) >= n
        covered_y = (y - r) < 0 and (y + r) > n - 1
        if covered_x and covered_y:
            return float("inf")
        if covered_y:
            by = float("inf")
        else:
            ys = np.arange(max(0, y - r - 1), min(n, y + r + 2) + 1, dtype=np.float64)
            lat_tops = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * ys / n))))
            by = earth_r * np.radians(r * float(np.min(-np.diff(lat_tops))))
        if covered_x:
            bx = float("inf")
        else:
            ylo, yhi = max(0, y - r), min(n - 1, y + r)
            if ylo == 0 or yhi == n - 1:
                bx = 0.0  # pole-clamped edge tiles: cos(lat) can be 0
            else:
                band = np.array([ylo, yhi + 1], dtype=np.float64)
                lats = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * band / n))))
                cosb = float(np.min(np.cos(np.radians(lats))))
                dlam = min(r * (2.0 * np.pi / n), np.pi)
                bx = 2.0 * earth_r * np.arcsin(max(cosb, 0.0) * np.sin(dlam / 2.0))
        return min(bx, by)

    def ring_candidates(self, qcell: int, k: int, max_ring: int = 64) -> np.ndarray:
        """Candidate indices for a query cell: expand k-rings until >= k
        found, then one guard ring. NOT an exactness certificate (a point
        two rings out can still be nearer, e.g. across a cell corner or
        where Mercator rows shrink) — exact search uses
        :meth:`knn` / the certified loops in ``pipelines/spatial_join``,
        which expand until the k-th distance beats
        :meth:`ring_bound_m` / :meth:`ring_bound_deg`."""
        ring = 1
        cand = self._points_in_cells(k_ring(qcell, ring))
        while len(cand) < k and ring < max_ring:
            ring *= 2
            cand = self._points_in_cells(k_ring(qcell, ring))
        return self._points_in_cells(k_ring(qcell, min(ring + 1, max_ring)))

    def knn(self, qlat: float, qlon: float, k: int) -> tuple[np.ndarray, np.ndarray]:
        """ids and distances (meters) of the k nearest indexed points —
        EXACT: rings expand until the k-th candidate distance is
        certified (:meth:`ring_bound_m`) closer than any unexplored
        cell could be."""
        qcell = int(lonlat_to_cell(np.asarray([qlat]), np.asarray([qlon]), self.z)[0])
        want = min(k, len(self.ids))
        if want == 0:
            return np.empty(0, dtype=np.int64), np.empty(0)
        r = 1
        while True:
            cand = self._points_in_cells(k_ring(qcell, r))
            bound = self.ring_bound_m(qcell, r)
            if len(cand) >= want:
                d = haversine_m(qlat, qlon, self.lat[cand], self.lon[cand])
                if bound == float("inf") or \
                        float(np.partition(d, want - 1)[want - 1]) <= bound:
                    break
            elif bound == float("inf"):
                d = haversine_m(qlat, qlon, self.lat[cand], self.lon[cand])
                break
            r *= 2
        top = np.argsort(d, kind="stable")[:k]
        sel = cand[top]
        return self.ids[sel], d[top]
