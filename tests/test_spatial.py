"""Spatial core unit tests (no Ray needed)."""

import numpy as np

from osmpbf_ray.stages import spatial


def test_tile_roundtrip_bounds():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-80, 80, 500)
    lon = rng.uniform(-179, 179, 500)
    x, y = spatial.lonlat_to_tile(lat, lon, 10)
    for i in range(0, 500, 50):
        la0, la1, lo0, lo1 = spatial.tile_bounds(10, int(x[i]), int(y[i]))
        assert lo0 <= lon[i] < lo1
        assert la0 <= lat[i] <= la1


def test_pack_unpack():
    rng = np.random.default_rng(8)
    z = 15
    x = rng.integers(0, 1 << z, 100)
    y = rng.integers(0, 1 << z, 100)
    cell = spatial.pack_cell(z, x, y)
    z2, x2, y2 = spatial.unpack_cell(cell)
    assert (z2 == z).all() and (x2 == x).all() and (y2 == y).all()


def test_cell_parent():
    cell = spatial.lonlat_to_cell(np.array([52.52]), np.array([13.40]), 14)
    parent = spatial.cell_parent(cell, 10)
    direct = spatial.lonlat_to_cell(np.array([52.52]), np.array([13.40]), 10)
    assert parent[0] == direct[0]


def test_k_ring_counts_and_wrap():
    z = 5
    n = 1 << z
    center = spatial.pack_cell(z, np.array([3]), np.array([3]))[0]
    assert len(spatial.k_ring(int(center), 1)) == 9
    assert len(spatial.k_ring(int(center), 2)) == 25
    # antimeridian wrap: x=0, k=1 wraps to x=n-1
    edge = spatial.pack_cell(z, np.array([0]), np.array([3]))[0]
    ring = spatial.k_ring(int(edge), 1)
    _, xs, _ = spatial.unpack_cell(ring)
    assert (n - 1) in xs.tolist()
    # pole clamp: y=0, k=1 loses the off-grid row
    pole = spatial.pack_cell(z, np.array([3]), np.array([0]))[0]
    assert len(spatial.k_ring(int(pole), 1)) == 6


def test_points_in_ring_triangle():
    ring_lat = np.array([0.0, 0.0, 1.0, 0.0])
    ring_lon = np.array([0.0, 1.0, 0.5, 0.0])
    lat = np.array([0.25, 0.9, 0.5, -0.1])
    lon = np.array([0.5, 0.9, 0.5, 0.5])
    assert spatial.points_in_ring(lat, lon, ring_lat, ring_lon).tolist() == [
        True,
        False,
        True,
        False,
    ]


def test_ring_cell_cover_superset():
    ring_lat = np.array([50.0, 50.0, 50.3, 50.0])
    ring_lon = np.array([10.0, 10.4, 10.2, 10.0])
    z = 10
    cover = set(spatial.ring_cell_cover(ring_lat, ring_lon, z).tolist())
    # every point inside the ring must map to a covered cell
    rng = np.random.default_rng(9)
    lat = rng.uniform(50.0, 50.3, 200)
    lon = rng.uniform(10.0, 10.4, 200)
    inside = spatial.points_in_ring(lat, lon, ring_lat, ring_lon)
    cells = spatial.lonlat_to_cell(lat[inside], lon[inside], z)
    assert set(cells.tolist()) <= cover


def test_knn_matches_brute_force():
    rng = np.random.default_rng(10)
    lat = rng.uniform(-60, 60, 2000)
    lon = rng.uniform(-170, 170, 2000)
    idx = spatial.CellPointIndex(np.arange(2000), lat, lon, z=7)
    for qlat, qlon in [(0.0, 0.0), (52.5, 13.4), (-45.0, 170.0)]:
        ids, d = idx.knn(qlat, qlon, 10)
        bf = spatial.haversine_m(qlat, qlon, lat, lon)
        expect = np.sort(bf)[:10]
        assert np.allclose(np.sort(d), expect)
