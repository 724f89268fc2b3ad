"""Distributed key set operations — SQL ``INTERSECT`` / ``EXCEPT`` /
``UNION`` (distinct) over a key column of two datasets.

Scale shape: each side collapses map-side to its batch-distinct keys
tagged with a side bit (1 = left, 2 = right), the tagged streams union,
and ONE hash-partitioned reduce ORs the tags per key — intersect keeps
tag 3, except keeps tag 1, union-distinct keeps all. No broadcast, no
sort, no driver state: both sides may be arbitrarily large, and the
exchange carries only distinct (key, tag) rows per batch. This is the
partitioned complement of ``joins.broadcast_semi_join`` /
``anti_join``'s size-gated small-side paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from osmpbf_ray.functions.partitioning import add_hash_pkey, sized_fanout

_OPS = {"intersect": 3, "except": 1, "union": 0}


def key_set_op(left_ds, right_ds, key: str, op: str,
               right_key: str | None = None, n_parts: int | None = None):
    """Distinct ``key`` values in ``left`` {∩, ∖, ∪} ``right``.

    ``op``: ``"intersect"`` (keys present in BOTH), ``"except"`` (keys in
    left only), ``"union"`` (keys in either, distinct). The output column
    is always named ``key`` (the left name), matching SQL set-op column
    naming."""
    if op not in _OPS:
        raise ValueError(f"op must be one of {sorted(_OPS)}, got {op!r}")
    rk = right_key or key
    if n_parts is None:
        n_parts = max(sized_fanout(left_ds), sized_fanout(right_ds))

    def tag(col_name: str, bit: int):
        def partial(batch: pa.Table) -> pa.Table:
            # arrow-native unique keeps the key TYPE on empty batches
            # (np.unique of an empty object array would infer a
            # null-typed column and break the union's schema)
            k = pc.unique(batch.column(col_name).combine_chunks())
            t = pa.table({key: k,
                          "__tag": pa.array(np.full(len(k), bit, np.int64))})
            return add_hash_pkey(t, key, n_parts, out_col="__gkey")
        return partial

    tagged = (
        left_ds.map_batches(tag(key, 1), batch_format="pyarrow",
                            zero_copy_batch=True)
        .union(right_ds.map_batches(tag(rk, 2), batch_format="pyarrow",
                                    zero_copy_batch=True))
    )
    want = _OPS[op]

    def final(part: pa.Table) -> pa.Table:
        k = part.column(key).to_numpy(zero_copy_only=False)
        t = part.column("__tag").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(k, return_inverse=True)
        acc = np.zeros(len(uniq), dtype=np.int64)
        np.bitwise_or.at(acc, inv, t)
        keep = np.ones(len(uniq), bool) if want == 0 else acc == want
        return pa.table({key: pa.array(uniq[keep],
                                       type=part.schema.field(key).type)})

    return (
        tagged.groupby("__gkey").map_groups(final, batch_format="pyarrow")
    )
