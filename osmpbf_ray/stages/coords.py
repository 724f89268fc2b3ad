"""Coordinate / timestamp scaling as pyarrow.compute expressions.

Mirrors the reference's accessor-layer conversions exactly
(/root/reference/src/elements.rs:84-111, src/dense.rs:36-63):
storage is scaled int64 nanodegrees; ``degree = nano * 1e-9`` (float),
``decimicro = nano / 100`` (exact integer division — tests assert exact
ints, tests/read.rs:111-126), ``timestamp_ms = ts * date_granularity``
(src/elements.rs:584-590).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

NANO_PER_DEGREE = 1_000_000_000
NANO_PER_DECIMICRO = 100


def nano_to_degree(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    return pc.multiply(pc.cast(col, pa.float64()), pa.scalar(1e-9))


def nano_to_decimicro(col):
    """Exact integer decimicro-degrees (nano / 100, truncating like Rust i64 div)."""
    return pc.divide(col, pa.scalar(NANO_PER_DECIMICRO, type=pa.int64()))


def stored_to_nano(stored, granularity: int = 100, offset: int = 0):
    """nano = offset + granularity * stored (src/elements.rs:89-91)."""
    return pc.add(
        pa.scalar(offset, type=pa.int64()),
        pc.multiply(pa.scalar(granularity, type=pa.int64()), pc.cast(stored, pa.int64())),
    )


def timestamp_to_ms(ts, date_granularity: int = 1000):
    return pc.multiply(pc.cast(ts, pa.int64()), pa.scalar(date_granularity, type=pa.int64()))


def with_degree_columns(batch: pa.Table, nano_lat="nano_lat", nano_lon="nano_lon") -> pa.Table:
    """map_batches fn: (re)derive lat/lon float columns from nano ints."""
    batch = batch.set_column(
        batch.schema.get_field_index("lat"), "lat", nano_to_degree(batch[nano_lat])
    )
    return batch.set_column(
        batch.schema.get_field_index("lon"), "lon", nano_to_degree(batch[nano_lon])
    )
