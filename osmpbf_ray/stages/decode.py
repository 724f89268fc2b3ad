"""Block decode stage: delta-coded blocks → canonical node rows.

The engine analog of the reference's per-blob decode pipeline
(/root/reference/src/reader.rs:119-142): each input row is one
self-contained block (BLOCKS_SCHEMA) carrying delta-coded parallel arrays,
a local string table and codec params — exactly a PBF PrimitiveBlock with
DenseNodes (/root/reference/src/proto/osmformat.proto:197-219).

Where the reference walks stateful iterators with running sums
(/root/reference/src/dense.rs:141-176, 299-302), this stage is a single
vectorized ``np.cumsum`` per array — the whole DenseNodeIter/DenseNodeInfoIter
pair becomes a handful of numpy lines. Deltas reset per block, so there is
no cross-batch state and the stage is a plain stateless ``map_batches`` fn.

Coordinate semantics are exact integer math (tests assert nano values):
``nano = offset + granularity * cumsum(delta)`` (src/elements.rs:89-91),
``degree = nano * 1e-9``, ``decimicro = nano / 100``.

Blob-type dispatch mirrors ``Blob::decode`` (src/blob.rs:85-106): "dense"
blocks decode, "header"/"unknown" rows are skipped (never an error —
src/blob.rs:27-29) and counted in the per-batch metrics column protocol.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osmpbf_ray import schema


def _decode_tags(
    kv: np.ndarray, stringtable: list[bytes], n_nodes: int
) -> tuple[np.ndarray, list[tuple[str, str]]]:
    """Walk the flattened ``((k v)* 0)*`` array (src/dense.rs:153-163).

    Returns (tag_counts per node, flat list of (key, value) pairs).
    Invalid string-table indices are skipped silently, matching
    ``get_stringtable_key_value`` (src/block.rs:438-456).
    """
    if len(kv) == 0:
        return np.zeros(n_nodes, dtype=np.int64), []
    delim = np.flatnonzero(kv == 0)
    # span length per node = distance between delimiters minus 1
    starts = np.concatenate([[0], delim[:-1] + 1])
    span = delim - starts
    counts = span // 2
    pairs = kv[kv != 0].reshape(-1, 2)
    nstr = len(stringtable)
    valid = (pairs[:, 0] < nstr) & (pairs[:, 1] < nstr) & (pairs >= 0).all(axis=1)
    if not valid.all():
        # adjust per-node counts for dropped invalid pairs
        node_of_pair = np.repeat(np.arange(n_nodes), counts)
        drop_per_node = np.bincount(node_of_pair[~valid], minlength=n_nodes)
        counts = counts - drop_per_node
        pairs = pairs[valid]
    flat = [
        (stringtable[k].decode("utf-8", "replace"), stringtable[v].decode("utf-8", "replace"))
        for k, v in pairs
    ]
    return counts, flat


def decode_blocks(batch: pa.Table) -> pa.Table:
    """map_batches fn: BLOCKS_SCHEMA rows in → NODES_SCHEMA rows out."""
    out_tables = []
    kinds = batch.column("kind").to_pylist()
    for i in range(batch.num_rows):
        if kinds[i] != "dense":
            continue  # header/unknown passthrough-skip (blob.rs:95)
        row = {name: batch.column(name)[i] for name in batch.column_names}
        id_delta = np.asarray(row["id_delta"].as_py(), dtype=np.int64)
        n = len(id_delta)
        if n == 0:
            continue
        gran = np.int64(row["granularity"].as_py() or 100)
        lat_off = np.int64(row["lat_offset"].as_py() or 0)
        lon_off = np.int64(row["lon_offset"].as_py() or 0)
        dgran = np.int64(row["date_granularity"].as_py() or 1000)

        ids = np.cumsum(id_delta)
        nano_lat = lat_off + gran * np.cumsum(np.asarray(row["lat_delta"].as_py(), dtype=np.int64))
        nano_lon = lon_off + gran * np.cumsum(np.asarray(row["lon_delta"].as_py(), dtype=np.int64))

        st = [bytes(b) for b in row["stringtable"].as_py() or []]
        kv = np.asarray(row["keys_vals"].as_py() or [], dtype=np.int64)
        tag_counts, flat_tags = _decode_tags(kv, st, n)

        tag_offsets = np.concatenate([[0], np.cumsum(tag_counts)]).astype(np.int32)
        tags_arr = pa.ListArray.from_arrays(
            pa.array(tag_offsets),
            pa.StructArray.from_arrays(
                [
                    pa.array([k for k, _ in flat_tags], type=pa.string()),
                    pa.array([v for _, v in flat_tags], type=pa.string()),
                ],
                names=["key", "value"],
            ),
        )

        # DenseInfo (src/dense.rs:244-316): delta-coded, visible defaults true
        version = np.asarray(row["version"].as_py() or [], dtype=np.int32)
        ts_delta = np.asarray(row["timestamp_delta"].as_py() or [], dtype=np.int64)
        cs_delta = np.asarray(row["changeset_delta"].as_py() or [], dtype=np.int64)
        uid_delta = np.asarray(row["uid_delta"].as_py() or [], dtype=np.int64)
        us_delta = np.asarray(row["user_sid_delta"].as_py() or [], dtype=np.int64)
        visible = row["visible"].as_py() or []
        has_info = len(version) == n
        if has_info:
            ts_ms = np.cumsum(ts_delta) * dgran
            changeset = np.cumsum(cs_delta)
            uid = np.cumsum(uid_delta).astype(np.int32)
            user_sid = np.cumsum(us_delta).astype(np.int64)
            users = [
                st[s].decode("utf-8", "replace") if 0 <= s < len(st) else ""
                for s in user_sid
            ]
            vis = visible if len(visible) == n else [True] * n
            info_arr = pa.StructArray.from_arrays(
                [
                    pa.array(version, type=pa.int32()),
                    pa.array(ts_ms, type=pa.int64()),
                    pa.array(changeset, type=pa.int64()),
                    pa.array(uid, type=pa.int32()),
                    pa.array(users, type=pa.string()),
                    pa.array(vis, type=pa.bool_()),
                ],
                names=["version", "timestamp_ms", "changeset", "uid", "user", "visible"],
            )
        else:
            info_arr = pa.array([None] * n, type=schema.INFO_STRUCT)

        out_tables.append(
            pa.Table.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(nano_lat * 1e-9, type=pa.float64()),
                    pa.array(nano_lon * 1e-9, type=pa.float64()),
                    pa.array(nano_lat, type=pa.int64()),
                    pa.array(nano_lon, type=pa.int64()),
                    tags_arr,
                    info_arr,
                ],
                schema=schema.NODES_SCHEMA,
            )
        )
    if not out_tables:
        return schema.NODES_SCHEMA.empty_table()
    return pa.concat_tables(out_tables)


def decode_blocks_ds(blocks_ds):
    """Dataset → Dataset convenience: one zero-copy Arrow map_batches."""
    return blocks_ds.map_batches(decode_blocks, batch_format="pyarrow", zero_copy_batch=True)
