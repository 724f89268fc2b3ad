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
        )
    joined = spatial_join(ds, polygons, z=z_join, concurrency=join_concurrency)
    stats = tiles_mod.tile_stats(ds, z_tile)
    return {"joined": joined, "tile_stats": stats}
