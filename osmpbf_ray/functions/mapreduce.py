"""Parallel map-reduce and sequential scan — the reference's dataflow drivers.

``par_map_reduce`` re-expresses the flagship entry point
(/root/reference/src/reader.rs:119-142): rayon's blob-parallel
map→fold→tree-reduce becomes Ray Data's partial+final aggregation —
a per-batch fold inside ``map_batches`` (runs on every block in parallel,
this is the partial/combiner) followed by a tiny driver-side reduce over
one row per block. Identity/merge contracts are identical to the
reference's ``identity()`` / ``reduce_op``.

``for_each`` is the sequential scan (/root/reference/src/reader.rs:67-83):
an order-preserving driver-side ``iter_batches`` loop.
"""

from __future__ import annotations

import pickle
from collections.abc import Callable
from typing import Any, TypeVar

import pyarrow as pa

T = TypeVar("T")


def par_map_reduce(
    ds,
    batch_fold: Callable[[pa.Table], T],
    identity: Callable[[], T],
    reduce_op: Callable[[T, T], T],
) -> T:
    """Per-batch partial fold + final reduce (reader.rs:119-142 contract).

    ``batch_fold`` maps one Arrow batch to a partial value T (the analog
    of ``elements.map(map_op).fold(identity, reduce_op)`` over one blob);
    partials are pickled into a one-row-per-batch dataset and tree-reduced
    on the driver (the partials stream is tiny: one row per block).
    """

    def partial(batch: pa.Table) -> pa.Table:
        value = batch_fold(batch)
        return pa.table({"partial": pa.array([pickle.dumps(value)], type=pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    acc = identity()
    for b in partials.iter_batches(batch_format="pyarrow", batch_size=1024):
        for blob in b.column("partial"):
            acc = reduce_op(acc, pickle.loads(blob.as_py()))
    return acc


def count_elements(ds) -> int:
    """The reference's canonical use (src/lib.rs:47-57): total element count."""
    return par_map_reduce(ds, lambda b: b.num_rows, lambda: 0, lambda a, b: a + b)


def for_each(ds, fn: Callable[[dict[str, Any]], None]) -> None:
    """Sequential per-row callback, order-preserving (reader.rs:67-83).

    Driver-side — use only for small datasets / tests; hot paths belong in
    ``map_batches``.
    """
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        for row in batch.to_pylist():
            fn(row)
