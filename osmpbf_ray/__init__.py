"""osmpbf_ray — a Ray-Data-native geospatial spatial-join + tiling engine.

A from-scratch engine with the query/data-processing capabilities of the
reference reader library (b-r-u/osmpbf, see /root/reference): blob-parallel
decode of delta-coded columnar blocks, string-table tag resolution, exact
nano-degree coordinate semantics, element iteration, parallel map-reduce and
the indexed ways→nodes semi-join — all re-expressed as ``ray.data.Dataset``
pipelines over zero-copy Arrow batches — plus the engine-new spatial core
(hierarchical cell index, point-in-polygon, kNN, raster↔vector tile
assignment), an image+caption table with phash dedup, and large-scale
training-data ops (dedup families, ANN, text analysis).

Nothing here calls ``ray.init()`` — the caller (driver / bench / test
fixture) owns the Ray session.
"""

__version__ = "0.1.0"

from osmpbf_ray import schema  # noqa: F401
