"""Flagship pipeline: image table → decode → cell encode → spatial join →
tile assignment → per-tile stats (+ optional resumable write).

This is the engine's headline (BASELINE.json "metric": spatial-join +
tile-assignment throughput). Stage shapes:

  read (streaming, column-pruned)
    → ImageDecoder actor pool        (CPU decode, per-row invariants)
    → spatial_join actor pool        (broadcast polygon cell-cover index,
                                      map-side join — no shuffle)
    → assign_tiles map               (stateless arithmetic)
    → partial_tile_counts + groupby  (pre-aggregated shuffle: rows moved
                                      = #distinct tiles per batch)

Nothing materializes the full dataset; the only all-to-all is over tile
partials. At 100 TB the image table streams block-by-block with
backpressure while the polygon side stays a one-time ``ray.put``.
"""

from __future__ import annotations

import pyarrow as pa

from osmpbf_ray.pipelines import tiles as tiles_mod
from osmpbf_ray.pipelines.spatial_join import spatial_join
from osmpbf_ray.stages.image import ImageDecoder
from osmpbf_ray.state.workercache import cached


def run_flagship(
    images_ds,
    polygons: pa.Table,
    z_join: int = 12,
    z_tile: int = 8,
    decode: bool = True,
    decoder_concurrency: int | tuple = (1, 4),
    join_concurrency: int | tuple | None = (1, 4),
):
    """Returns {"joined": Dataset, "tile_stats": Dataset}.

    ``joined`` streams (image, poly_id) containment rows; ``tile_stats``
    is the per-tile aggregate over ALL images (not only joined ones),
    mirroring "raster↔vector tile assignment" over the full input.
    """
    ds = images_ds
    if decode:
        ds = ds.map_batches(
            ImageDecoder,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=64,  # decoded-pixel batches are wide; keep them small
            concurrency=decoder_concurrency,
            max_restarts=0,
        )
    joined = spatial_join(ds, polygons, z=z_join, concurrency=join_concurrency)
    # tile assignment needs only lat/lon, which the INPUT already has —
    # feeding it the decoded stream would re-run the whole ImageDecoder
    # pass when both outputs are consumed (lazy plans re-execute per
    # consumer); ImageDecoder only appends columns, so stats from the
    # raw input are identical
    stats = tiles_mod.tile_stats(images_ds, z_tile)
    return {"joined": joined, "tile_stats": stats}


def write_flagship_resumable(
    input_dir: str,
    polygons: pa.Table,
    out_dir: str,
    z_join: int = 12,
    z_tile: int = 8,
) -> dict:
    """Distributed resumable flagship run: one output partition per input
    parquet fragment, skipping partitions already in the manifest.

    Partition ids are deterministic functions of the INPUT layout (the
    fragment file name), never of scheduling order, so a crashed run
    resumes by recomputing exactly the missing fragments (north rule:
    per-partition checkpoints with lineage + metrics; the reference's
    osmosis replication watermark generalized to fragments,
    /root/reference/src/block.rs:61-85). Requires ``out_dir`` on storage
    visible to all workers (shared fs / object store in a real cluster).
    """
    import os

    import ray
    import ray.data as rd

    from osmpbf_ray.pipelines.spatial_join import PolygonIndex, polygon_arrays
    from osmpbf_ray.state.manifest import Manifest, write_partition

    frags = sorted(
        os.path.join(input_dir, f)
        for f in os.listdir(input_dir)
        if f.endswith(".parquet")
    )
    manifest = Manifest(out_dir)
    done = set(manifest.completed())
    todo = [f for f in frags if os.path.splitext(os.path.basename(f))[0] not in done]
    polys_ref = ray.put(polygon_arrays(polygons))

    def process(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        # once PER WORKER PROCESS, not per fragment: tasks are elastic
        # (batch_size=1 keeps per-fragment resumability/parallelism), so
        # the polygon index / decoder / manifest ride the same
        # single-slot worker cache the task-based spatial join uses.
        # built_here makes the amortization OBSERVABLE: the summary row
        # records whether this call paid the build, so the driver can
        # assert #builds ≤ #workers < #fragments.
        built_here: list[int] = []

        def build():
            built_here.append(1)
            return (PolygonIndex(ray.get(polys_ref), z_join), ImageDecoder(),
                    Manifest(out_dir))

        index, decoder, mf = cached(
            ("flagship_write", out_dir, z_join, polys_ref), build)
        out_rows = []
        for path in batch.column("path").to_pylist():
            pid = os.path.splitext(os.path.basename(path))[0]
            tbl = decoder(pq.read_table(path))
            pts, polys = index.join_batch(
                tbl.column("lat").to_numpy(), tbl.column("lon").to_numpy()
            )
            joined = tbl.take(pa.array(pts)).append_column(
                "poly_id", pa.array(polys, type=pa.int64())
            )
            joined = tiles_mod.assign_tiles(joined, z_tile)
            write_partition(
                mf,
                pid,
                joined,
                lineage={"input": path},
                metrics={"input_rows": tbl.num_rows, "joined_rows": joined.num_rows},
            )
            out_rows.append({"partition_id": pid, "rows": joined.num_rows,
                             "index_built": bool(built_here)})
            built_here.clear()
        return pa.Table.from_pylist(
            out_rows,
            schema=pa.schema([("partition_id", pa.string()), ("rows", pa.int64()),
                              ("index_built", pa.bool_())]),
        )

    written = 0
    index_builds = 0
    if todo:
        paths_ds = rd.from_arrow(pa.table({"path": todo}))
        res = paths_ds.map_batches(
            process, batch_format="pyarrow", batch_size=1
        ).to_pandas()
        written = len(res)
        index_builds = int(res["index_built"].sum())
    return {"written": written, "skipped": len(done), "out_dir": out_dir,
            "index_builds": index_builds}
