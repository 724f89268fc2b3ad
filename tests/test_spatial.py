"""Spatial core unit tests (no Ray needed)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

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
        # the IDS too, not just distances (an index-vs-id mixup would
        # return right distances with wrong identities)
        assert set(ids) == set(np.argsort(bf)[:10])


def test_knn_haversine_adversarial_corner_cases():
    """Hardcoded configurations where the OLD >=k-plus-one-guard-ring
    heuristic provably returned the WRONG nearest neighbor (found by
    search: ring-1 candidate farther than a ring-3+ point) — the
    certified ring_bound_m expansion must return the true one."""
    cases = [
        # (z, qlat, qlon, ref_lats, ref_lons, true_nearest_m)
        (4, 20.969938366436864, 20.49624573735531,
         [-19.790467379479104, 58.63061682878783],
         [4.489301800600117, 37.74993645066161], 4410742.461121538),
        (4, -48.95009715785012, -34.46790099986461,
         [-24.548704272442556, -74.67653679099526],
         [-65.47274426745125, -35.03589407910903], 2860774.727295141),
    ]
    for z, ql, qo, lats, lons, true_d in cases:
        idx = spatial.CellPointIndex(np.arange(2, dtype=np.int64),
                                     np.array(lats), np.array(lons), z=z)
        _, d = idx.knn(ql, qo, k=1)
        assert np.allclose(d, [true_d], rtol=0, atol=1e-6)


def test_knn_haversine_certified_exact_vs_brute_force():
    """The haversine k-ring search must equal brute force EXACTLY —
    including near cell corners and at high latitude where Mercator
    rows shrink."""
    rng = np.random.default_rng(97)
    # clustered refs (force early >=k rings) + sparse far refs that can
    # still be nearer across corners / shrunken rows
    lat = np.concatenate([rng.uniform(55, 84, 150), rng.uniform(-84, 84, 50)])
    lon = np.concatenate([rng.uniform(-30, 30, 150), rng.uniform(-179, 179, 50)])
    ids = np.arange(len(lat), dtype=np.int64)
    idx = spatial.CellPointIndex(ids, lat, lon, z=6)
    qlat = rng.uniform(55, 84.9, 120)
    qlon = rng.uniform(-35, 35, 120)
    for ql, qo in zip(qlat, qlon):
        got_ids, got_d = idx.knn(float(ql), float(qo), k=3)
        bf = spatial.haversine_m(float(ql), float(qo), lat, lon)
        exp_d = np.sort(bf)[:3]
        assert np.allclose(np.sort(got_d), exp_d, rtol=0, atol=1e-9), (
            ql, qo, got_d, exp_d)
        assert set(got_ids) == set(np.argsort(bf)[:3])


def test_knn_stage_haversine_matches_brute_force():
    import ray as _ray

    from osmpbf_ray.pipelines import spatial_join as sj

    rng = np.random.default_rng(11)
    rlat = rng.uniform(60, 84, 60)
    rlon = rng.uniform(-20, 20, 60)
    rids = np.arange(60, dtype=np.int64)
    pts = pa.table({"lat": rng.uniform(60, 84, 40), "lon": rng.uniform(-25, 25, 40)})
    out = sj.knn_join(rd.from_arrow(pts), rids, rlat, rlon, k=2, z=6,
                      metric="haversine").to_pandas()
    for _, row in out.iterrows():
        bf = spatial.haversine_m(row["lat"], row["lon"], rlat, rlon)
        assert np.allclose(sorted(row["nn_dist_m"]), np.sort(bf)[:2], atol=1e-9)
        assert set(row["nn_ids"]) == set(rids[np.argsort(bf)[:2]])
