"""Fragment zone maps: metadata-only id-range pruning for scans and
semi-joins.

The engine analog of the reference's lazily-built blob index
(/root/reference/src/indexed.rs:145-222) and its range-intersection
pruning predicates ``nodes_available`` / ``node_range_included``
(/root/reference/src/indexed.rs:26-28,57-106): per-fragment min/max key
stats decide which fragments can possibly contain requested keys, and
only those are read. Parquet already persists row-group statistics, so
building the index costs one footer read per file — no data IO, exactly
like the reference's header-only scan (src/blob.rs:402-428).

At 100 TB this is the difference between a semi-join that rescans the
whole table and one that touches only the fragments whose key range
intersects the (broadcast) key set — the reference's two-pass
read_ways_and_deps shape (src/indexed.rs:264-330) at fragment
granularity.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq


def fragment_stats(path: str, key_col: str) -> list[dict]:
    """Per-file (fragment) min/max of ``key_col`` from parquet footers.

    Metadata-only: reads statistics, never data pages. Files without
    stats get an unbounded range (never pruned) — the reference's
    ``id_ranges: None`` "not yet known" state (indexed.rs:160).
    """
    out = []
    files = (
        sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        )
        if os.path.isdir(path)
        else [path]
    )
    for f in files:
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.to_arrow_schema().get_field_index(key_col)
        lo, hi, have = None, None, True
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                have = False
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append(
            {
                "path": f,
                "min": lo if have else None,
                "max": hi if have else None,
                "rows": meta.num_rows,
            }
        )
    return out


def prune_fragments(stats: list[dict], keys: np.ndarray) -> tuple[list[str], list[str]]:
    """(kept_paths, skipped_paths): keep a fragment iff some key falls in
    its [min, max] range (range_included, indexed.rs:26-28)."""
    keys = np.unique(np.asarray(keys))
    kept, skipped = [], []
    for s in stats:
        if s["min"] is None or len(keys) == 0:
            (kept if s["min"] is None else skipped).append(s["path"])
            continue
        i = np.searchsorted(keys, s["min"])
        if i < len(keys) and keys[i] <= s["max"]:
            kept.append(s["path"])
        else:
            skipped.append(s["path"])
    return kept, skipped


def pruned_semi_join(path: str, key_col: str, keys: np.ndarray, columns=None):
    """Zone-map-pruned broadcast semi-join against a parquet directory.

    Returns (dataset, n_fragments_kept, n_fragments_skipped). The kept
    fragments stream through the usual broadcast ``is_in`` filter; the
    skipped ones are never opened.
    """
    import ray
    import ray.data as rd

    from osmpbf_ray.functions.joins import broadcast_semi_join

    stats = fragment_stats(path, key_col)
    kept, skipped = prune_fragments(stats, keys)
    if not kept:
        if not skipped:  # no fragments at all — nothing to type from
            return rd.from_items([]), 0, 0
        # typed empty dataset: schema comes from the (pruned) fragments
        # themselves, so downstream select_columns/union/schema() behave
        # exactly as on the non-empty path (from_items([]) is
        # schema-less and breaks those)
        import pyarrow as pa

        sch = pq.read_schema(skipped[0]).remove_metadata()
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
        return rd.from_arrow(sch.empty_table()), 0, len(skipped)
    ds = rd.read_parquet(kept, columns=columns)
    keys_ref = ray.put(np.asarray(keys))
    return broadcast_semi_join(ds, key_col, keys_ref), len(kept), len(skipped)
