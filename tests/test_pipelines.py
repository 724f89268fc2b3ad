"""Spatial-join / kNN / tiling / manifest pipeline tests, each checked
against an independent numpy oracle."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmpbf_ray.pipelines import flagship, spatial_join, tiles
from osmpbf_ray.sources import fixtures
from osmpbf_ray.stages import spatial
from osmpbf_ray.state import manifest as mf


def _pip_oracle(images: pa.Table, polygons: pa.Table) -> set[tuple[str, int]]:
    pairs = set()
    lat = images.column("lat").to_numpy()
    lon = images.column("lon").to_numpy()
    ids = images.column("image_id").to_pylist()
    for p in spatial_join.polygon_arrays(polygons):
        inside = spatial.points_in_ring(lat, lon, p["ring_lat"], p["ring_lon"])
        for i in np.flatnonzero(inside):
            pairs.add((ids[i], p["poly_id"]))
    return pairs


def test_spatial_join_matches_oracle():
    images = fixtures.make_images(300)
    polygons = fixtures.make_polygons(20)
    out = spatial_join.spatial_join(
        rd.from_arrow(images), polygons, z=12, concurrency=2
    ).to_pandas()
    got = set(zip(out["image_id"], out["poly_id"]))
    expect = _pip_oracle(images, polygons)
    assert got == expect
    assert len(out) == len(expect)  # each containment pair exactly once
    assert len(expect) > 0  # fixture guarantees urban polygons catch skewed points


def test_spatial_join_various_zooms():
    """Join result must be zoom-invariant (zoom only changes pruning)."""
    images = fixtures.make_images(150)
    polygons = fixtures.make_polygons(10)
    a = spatial_join.spatial_join(rd.from_arrow(images), polygons, z=8, concurrency=2).to_pandas()
    b = spatial_join.spatial_join(rd.from_arrow(images), polygons, z=14, concurrency=2).to_pandas()
    assert set(zip(a["image_id"], a["poly_id"])) == set(zip(b["image_id"], b["poly_id"]))


def test_knn_stage_matches_brute_force():
    images = fixtures.make_images(100)
    rng = np.random.default_rng(5)
    ref_lat = rng.uniform(-60, 70, 500)
    ref_lon = rng.uniform(-179, 179, 500)
    out = spatial_join.knn_join(
        rd.from_arrow(images), np.arange(500), ref_lat, ref_lon, k=3, z=7, concurrency=2
    ).to_pandas()
    assert len(out) == 100
    by_id = {r.image_id: r for r in out.itertuples()}
    lat = images.column("lat").to_numpy()
    lon = images.column("lon").to_numpy()
    ids = images.column("image_id").to_pylist()
    for i in range(0, 100, 17):
        d = spatial.haversine_m(lat[i], lon[i], ref_lat, ref_lon)
        expect = np.sort(d)[:3]
        got = np.array(by_id[ids[i]].nn_dist_m)
        assert np.allclose(np.sort(got), expect)


def test_tile_stats_matches_numpy():
    images = fixtures.make_images(400)
    stats = tiles.tile_stats(rd.from_arrow(images), z=6).to_pandas()
    lat = images.column("lat").to_numpy()
    lon = images.column("lon").to_numpy()
    cells = spatial.lonlat_to_cell(lat, lon, 6)
    uniq, counts = np.unique(cells, return_counts=True)
    got = dict(zip(stats["tile"], stats["n"]))
    assert got == dict(zip(uniq.tolist(), counts.tolist()))
    assert stats["n"].sum() == 400
    # unpacked tile coords agree with packing
    z, x, y = spatial.unpack_cell(stats["tile"].to_numpy())
    assert (stats["tile_x"].to_numpy() == x).all()
    assert (stats["tile_y"].to_numpy() == y).all()


def test_salted_groupby_matches_plain():
    images = fixtures.make_images(300)

    def add_cell(b):
        cells = spatial.lonlat_to_cell(
            b.column("lat").to_numpy(), b.column("lon").to_numpy(), 5
        )
        return b.append_column("cell", pa.array(cells))

    ds = rd.from_arrow(images).map_batches(add_cell, batch_format="pyarrow")
    salted = tiles.salted_groupby_count(ds, "cell", n_salt=4).to_pandas()
    lat = images.column("lat").to_numpy()
    lon = images.column("lon").to_numpy()
    uniq, counts = np.unique(spatial.lonlat_to_cell(lat, lon, 5), return_counts=True)
    assert dict(zip(salted["cell"], salted["n"])) == dict(zip(uniq.tolist(), counts.tolist()))


def test_tile_rollup_matches_direct_assignment():
    """The single-exchange subtree rollup equals assigning points
    directly at each zoom, materialized and lazy."""
    images = fixtures.make_images(500)
    lat = images.column("lat").to_numpy()
    lon = images.column("lon").to_numpy()
    for materialize in (True, False):
        levels = tiles.tile_rollup(rd.from_arrow(images), base_z=6,
                                   parent_zs=[4, 2], materialize=materialize)
        assert sorted(levels) == [2, 4, 6]
        for z, ds in levels.items():
            stats = ds.to_pandas()
            uniq, counts = np.unique(
                spatial.lonlat_to_cell(lat, lon, z), return_counts=True)
            assert dict(zip(stats["tile"], stats["n"])) == dict(
                zip(uniq.tolist(), counts.tolist()))
            assert stats["n"].sum() == 500
            zz, x, y = spatial.unpack_cell(stats["tile"].to_numpy())
            assert (zz == z).all()
            assert (stats["tile_x"].to_numpy() == x).all()
            assert (stats["tile_y"].to_numpy() == y).all()


def test_top_k_tiles():
    images = fixtures.make_images(300)
    top = tiles.top_k_tiles(rd.from_arrow(images), z=6, k=3).to_pandas()
    assert len(top) == 3
    assert top["n"].is_monotonic_decreasing
    # exact oracle: THE top-3 cells by count, not just any 3 descending
    from osmpbf_ray.stages import spatial as sp
    cells = sp.lonlat_to_cell(images["lat"].to_numpy(),
                              images["lon"].to_numpy(), 6)
    uniq, counts = np.unique(cells, return_counts=True)
    exp = sorted(counts, reverse=True)[:3]
    assert top["n"].tolist() == exp


def test_spatial_join_partitioned_matches_broadcast():
    """The huge-polygon-set path (ids-only candidate shuffle + ring-once
    refine) returns exactly the broadcast join's matches — and ring
    coordinates never enter the candidate exchange."""
    images = fixtures.make_images(300)
    polygons = fixtures.make_polygons(15)
    bcast = spatial_join.spatial_join(rd.from_arrow(images), polygons, z=12).to_pandas()
    part = spatial_join.spatial_join_partitioned(
        rd.from_arrow(images), rd.from_arrow(polygons), z=12
    ).to_pandas()
    assert set(zip(part["image_id"], part["poly_id"])) == set(
        zip(bcast["image_id"], bcast["poly_id"])
    )
    assert len(part) == len(bcast)  # no duplicated matches


def test_flagship_end_to_end():
    images = fixtures.make_images(200)
    polygons = fixtures.make_polygons(12)
    res = flagship.run_flagship(
        rd.from_arrow(images), polygons, z_join=12, z_tile=6,
        decoder_concurrency=2, join_concurrency=2,
    )
    joined = res["joined"].to_pandas()
    stats = res["tile_stats"].to_pandas()
    assert stats["n"].sum() == 200
    assert set(zip(joined["image_id"], joined["poly_id"])) == _pip_oracle(images, polygons)
    # decode invariants survived the pipeline
    assert not joined["decode_error"].any()
    assert (joined["phash"] == joined["phash_decoded"]).all()
    # north-rule per-row invariant: caption BYTE-equality through
    # decode → join (input_hint: "caption equality"); pixels never leave
    # the UDF, so the pixel side is phash equality above + the codec
    # PSNR ≥ 40 dB bound in test_image.py
    captions_in = dict(
        zip(images.column("image_id").to_pylist(), images.column("caption").to_pylist())
    )
    assert all(captions_in[i] == c for i, c in zip(joined["image_id"], joined["caption"]))


def test_manifest_resume(tmp_path):
    blocks = fixtures.make_delta_blocks(n_blocks=4, nodes_per_block=100)
    man = mf.Manifest(tmp_path / "out")
    calls = []

    def produce(pid, spec):
        calls.append(pid)
        return blocks.slice(spec, 1)

    parts = {f"b{i}": i for i in range(4)}
    mf.run_resumable(man, parts, produce)
    assert sorted(calls) == ["b0", "b1", "b2", "b3"]
    # resume: nothing re-produced
    calls.clear()
    mf.run_resumable(man, parts, produce)
    assert calls == []
    back = mf.read_output(tmp_path / "out")
    assert back.num_rows == 4
    rec = man.completed()["b2"]
    # (the old form `A and B or True` was a tautology)
    assert rec["row_count"] == 1
    assert rec.get("lineage") is not None
    assert set(man.completed()) == {"b0", "b1", "b2", "b3"}


def test_manifest_atomic_on_failure(tmp_path):
    man = mf.Manifest(tmp_path / "out")
    blocks = fixtures.make_delta_blocks(n_blocks=2, nodes_per_block=10)

    calls = {"n": 0}

    def flaky(pid, spec):
        calls["n"] += 1
        if pid == "b1" and calls["n"] <= 2:
            raise RuntimeError("simulated task death")
        return blocks.slice(spec, 1)

    import pytest

    with pytest.raises(RuntimeError):
        mf.run_resumable(man, {"b0": 0, "b1": 1}, flaky)
    assert set(man.completed()) == {"b0"}
    # no half-written partition dirs
    assert not list((tmp_path / "out").glob(".tmp-*"))
    # rerun completes only the missing one
    mf.run_resumable(man, {"b0": 0, "b1": 1}, flaky)
    assert set(man.completed()) == {"b0", "b1"}
    assert mf.read_output(tmp_path / "out").num_rows == 2


def test_write_flagship_resumable(tmp_path):
    """Distributed per-fragment resumable write: rerun recomputes only
    missing partitions; resumed output equals a fresh run."""
    import pyarrow.parquet as pq
    import shutil

    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    images = fixtures.make_images(160)
    for f in range(4):
        pq.write_table(images.slice(f * 40, 40), in_dir / f"frag-{f}.parquet")
    polygons = fixtures.make_polygons(10)

    res1 = flagship.write_flagship_resumable(str(in_dir), polygons, str(out_dir))
    assert res1["written"] == 4 and res1["skipped"] == 0
    full = mf.read_output(out_dir)

    # crash simulation: drop one partition dir — its _COMMIT.json marker
    # goes with it (data + manifest record live and die together)
    shutil.rmtree(out_dir / "part=frag-2")

    res2 = flagship.write_flagship_resumable(str(in_dir), polygons, str(out_dir))
    assert res2["written"] == 1 and res2["skipped"] == 3
    resumed = mf.read_output(out_dir)
    assert resumed.num_rows == full.num_rows
    a = sorted(zip(resumed.column("image_id").to_pylist(), resumed.column("poly_id").to_pylist()))
    b = sorted(zip(full.column("image_id").to_pylist(), full.column("poly_id").to_pylist()))
    assert a == b


def test_write_flagship_builds_index_once_per_worker(tmp_path):
    """The per-fragment writer must NOT rebuild the polygon index per
    fragment: across many fragments on a small CPU pool the number of
    index builds is bounded by the worker count, not the fragment
    count (the single-slot worker cache amortizes setup)."""
    import pyarrow.parquet as pq

    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    images = fixtures.make_images(240)
    n_frag = 12
    for f in range(n_frag):
        pq.write_table(images.slice(f * 20, 20), in_dir / f"frag-{f:02d}.parquet")
    polygons = fixtures.make_polygons(10)
    res = flagship.write_flagship_resumable(str(in_dir), polygons, str(out_dir))
    assert res["written"] == n_frag
    # the pytest session runs 4 CPUs -> at most a handful of worker
    # processes; well under one build per fragment
    assert 0 < res["index_builds"] < n_frag, res


def test_knn_planar_kring_exact_vs_brute_force():
    """planar_deg k-ring kNN is EXACT (certified ring coverage incl.
    antimeridian wrap): ids and distances equal the wrapped-planar
    brute force for every point, including points near lon=±180."""
    from osmpbf_ray.stages.ann import round_half_away

    rng = np.random.default_rng(11)
    n_ref = 40
    ref_lat = rng.uniform(-60, 60, n_ref)
    ref_lon = rng.uniform(-179.9, 179.9, n_ref)
    # query points clustered at the antimeridian + uniform spread
    qlat = np.concatenate([rng.uniform(-50, 50, 20), rng.uniform(-60, 60, 40)])
    qlon = np.concatenate([rng.choice([-179.5, 179.5], 20), rng.uniform(-180, 180, 40)])
    pts = pa.table({"image_id": np.arange(len(qlat)), "lat": qlat, "lon": qlon})
    out = spatial_join.explode_knn(
        spatial_join.knn_join(
            rd.from_arrow(pts), np.arange(n_ref), ref_lat, ref_lon,
            k=3, z=5, concurrency=2, metric="planar_deg",
        ),
        id_col="image_id",
    ).to_pandas().sort_values(["image_id", "rank"]).reset_index(drop=True)
    dlat = qlat[:, None] - ref_lat[None, :]
    dlon = np.abs(qlon[:, None] - ref_lon[None, :])
    dlon = np.minimum(dlon, 360.0 - dlon)
    d = round_half_away(np.sqrt(dlat**2 + dlon**2), 9)
    order = np.lexsort((np.broadcast_to(np.arange(n_ref), d.shape), d), axis=1)[:, :3]
    assert (out["nn_id"].to_numpy() == order.ravel()).all()
    assert (out["dist_deg"].to_numpy() == np.take_along_axis(d, order, axis=1).ravel()).all()


def test_knn_planar_fewer_refs_than_k():
    """k > #refs: the grid is exhausted and every ref is returned."""
    pts = pa.table({"image_id": np.array([0, 1]), "lat": np.array([0.0, 45.0]),
                    "lon": np.array([0.0, 170.0])})
    out = spatial_join.explode_knn(
        spatial_join.knn_join(
            rd.from_arrow(pts), np.array([7, 9]), np.array([10.0, -30.0]),
            np.array([-20.0, 100.0]), k=5, z=6, concurrency=2, metric="planar_deg",
        ),
        id_col="image_id",
    ).to_pandas()
    assert len(out) == 4  # 2 points × 2 refs
    assert set(out["nn_id"]) == {7, 9}


def test_table_checksum_sees_long_list_middles():
    """str() of a >1000-element numpy array elides its middle, so two
    long-list cells differing only there used to hash EQUAL — the
    resume-equality checksum must see full list contents."""
    import numpy as np
    import pyarrow as pa

    from osmpbf_ray.state.manifest import table_checksum

    a = pa.table({"x": [np.arange(2000)]})
    mid = np.arange(2000)
    mid[1000] = 77
    b = pa.table({"x": [mid]})
    assert table_checksum(a) != table_checksum(b)
    assert table_checksum(a) == table_checksum(pa.table({"x": [np.arange(2000)]}))
