"""Input-sized fan-out for hash-partitioned reduce stages.

Every ``groupby(pkey).map_groups`` reduce in the engine co-locates work
onto ``hash(key) % n_parts`` partitions and vectorizes inside (Ray pays
~2 ms of orchestration per group, so the partitions must stay FEW and
BIG). A constant fan-out, however, means per-group memory GROWS with the
input — 1/64th of 100 TB does not fit a reducer. ``sized_fanout`` keeps
the fewest-groups property at small scale (floor) while bounding rows
per group at any input size (rows / target), which is the documented
partitioning contract for exact_dedup, the LSH pair stages and the
partitioned hash join.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

# top-level, not inside partition_hash: the hash runs on WORKERS, where
# a runtime `from osmpbf_ray...` import fails when the driver's cwd
# can't import the package (pickle-by-value ships module globals, not
# runtime imports). joins.py imports partitioning lazily, so no cycle.
from osmpbf_ray.functions.joins import hash_key_u64, splitmix_u64  # noqa: F401

DEFAULT_TARGET_ROWS = 500_000
DEFAULT_FLOOR = 64
DEFAULT_CAP = 1 << 16

# splitmix64 partition hash for any key dtype (uint64 out) — shared
# with every bucketed exchange. String/object keys go crc32-per-distinct
# (process-stable); NaN float keys raise (an int64 key column that
# picked up nulls round-trips through float64 NaN, whose int cast is
# undefined, and NaN != NaN would split the partition into singletons).
partition_hash = hash_key_u64


def add_hash_pkey(batch: pa.Table, key_col: str, n_parts: int,
                  out_col: str = "__pkey") -> pa.Table:
    """Append ``hash(key) % n_parts`` — the shared map-side step of every
    hash-partitioned reduce (grouped top-k / lag / rolling / grouped
    quantiles / partitioned tile final). Rejects NULL keys explicitly:
    the segment reduces downstream compare adjacent keys, and NaN != NaN
    would silently split the NULL partition into singletons."""
    if batch.num_rows == 0:
        return batch.append_column(out_col, pa.array([], type=pa.int64()))
    col = batch.column(key_col)
    if col.null_count:
        raise ValueError(
            f"null values in partition key {key_col!r} are unsupported — "
            "fill or filter the key column first"
        )
    h = partition_hash(col.to_numpy(zero_copy_only=False))
    return batch.append_column(
        out_col, pa.array((h % np.uint64(n_parts)).view(np.int64)))


def sized_fanout(
    ds_or_rows,
    target_rows: int = DEFAULT_TARGET_ROWS,
    floor: int = DEFAULT_FLOOR,
    cap: int = DEFAULT_CAP,
) -> int:
    """Hash-partition count: ``ceil(rows / target_rows)`` in [floor, cap].

    Accepts a row count or a Dataset. For a Dataset the count comes from
    PLAN METADATA ONLY (``_meta_count`` — available for file reads and
    row-preserving ops) and NEVER triggers execution; when the plan can't
    say (post-``map_batches``), returns ``floor`` — callers that know the
    upstream row count should pass it explicitly.
    """
    if ds_or_rows is None:
        return floor
    if isinstance(ds_or_rows, (int, np.integer)):
        rows = int(ds_or_rows)
    else:
        try:
            rows = ds_or_rows._meta_count()
        except Exception:
            rows = None
        if rows is None:
            return floor
    return max(floor, min(cap, math.ceil(max(rows, 1) / target_rows)))
