"""Tag-column kernels: vectorized predicates over list<struct<key,value>>.

The reference resolves tags lazily through the block string table and the
canonical predicate in every example is the tuple-equality test
``tags().any(|(k,v)| k=="building" && v=="yes")``
(/root/reference/examples/indexed.rs:19-22, tests/read.rs:304). Here the
tags column is already resolved (TAGS_TYPE) and the predicate is a single
flatten + compare + bincount — no Python per row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _as_single_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def tags_contain(tags_col, key: str, value: str | None = None) -> np.ndarray:
    """Boolean mask: row's tags contain ``key`` (and ``value`` if given)."""
    arr = _as_single_array(tags_col)
    n = len(arr)
    parents = pc.list_parent_indices(arr).to_numpy(zero_copy_only=False)
    flat = arr.flatten()
    hit = pc.equal(pc.struct_field(flat, "key"), pa.scalar(key))
    if value is not None:
        hit = pc.and_(hit, pc.equal(pc.struct_field(flat, "value"), pa.scalar(value)))
    hit_np = pc.fill_null(hit, False).to_numpy(zero_copy_only=False).astype(bool)
    counts = np.bincount(parents[hit_np], minlength=n) if len(parents) else np.zeros(n, dtype=np.int64)
    return counts > 0


def filter_by_tag(batch: pa.Table, key: str, value: str | None = None, tags_col: str = "tags") -> pa.Table:
    """map_batches-ready: keep rows whose tags contain (key[, value])."""
    return batch.filter(pa.array(tags_contain(batch[tags_col], key, value)))


def tag_value(tags_col, key: str) -> list[str | None]:
    """First value for ``key`` per row (None when absent)."""
    arr = _as_single_array(tags_col)
    n = len(arr)
    parents = pc.list_parent_indices(arr).to_numpy(zero_copy_only=False)
    flat = arr.flatten()
    keys = pc.struct_field(flat, "key").to_pylist()
    vals = pc.struct_field(flat, "value").to_pylist()
    out: list[str | None] = [None] * n
    for p, k, v in zip(parents, keys, vals):
        if k == key and out[p] is None:
            out[p] = v
    return out
