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

DEFAULT_TARGET_ROWS = 500_000
DEFAULT_FLOOR = 64
DEFAULT_CAP = 1 << 16


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
