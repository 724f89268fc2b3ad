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
    """map_batches fn: BLOCKS_SCHEMA rows in → NODES_SCHEMA rows out.

    Two node encodings decode to identical logical rows (the reference's
    encoding-invariance contract, tests/read.rs:15-31):

    * ``kind="dense"`` — DenseNodes: delta-coded arrays, cumsum decode
      (src/dense.rs:86-183); DenseInfo deltas likewise.
    * ``kind="nodes"`` — plain Node messages mapped columnar: the same
      columns carry ABSOLUTE values (no cumsum; src/elements.rs:31-131),
      info fields absolute too.
    """
    out_tables = []
    kinds = batch.column("kind").to_pylist()
    # flatten every list column ONCE per batch (zero-copy into numpy);
    # per-block work below is numpy slices + cumsum — the round-1 version
    # materialized each 8k-element list through .as_py() per block
    flat = {
        name: _list_column(batch, name)
        for name in ("id_delta", "lat_delta", "lon_delta", "keys_vals", "version",
                     "timestamp_delta", "changeset_delta", "uid_delta",
                     "user_sid_delta", "visible")
    }

    def _seg(name: str, i: int, dtype=np.int64) -> np.ndarray:
        vals, offs = flat[name]
        return vals[offs[i] : offs[i + 1]].astype(dtype, copy=False)

    import pyarrow.compute as _pc

    sc = {}
    for name, default in (("granularity", 100), ("lat_offset", 0),
                          ("lon_offset", 0), ("date_granularity", 1000)):
        sc[name] = _pc.fill_null(batch.column(name), default).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
    sts = batch.column("stringtable").to_pylist()
    for i in range(batch.num_rows):
        kind = kinds[i]
        if kind not in ("dense", "nodes"):
            continue  # header/unknown passthrough-skip (blob.rs:95)
        is_dense = kind == "dense"
        id_delta = _seg("id_delta", i)
        n = len(id_delta)
        if n == 0:
            continue
        gran = sc["granularity"][i]
        lat_off = sc["lat_offset"][i]
        lon_off = sc["lon_offset"][i]
        dgran = sc["date_granularity"][i]

        _acc = np.cumsum if is_dense else np.asarray
        ids = _acc(id_delta)
        nano_lat = lat_off + gran * _acc(_seg("lat_delta", i))
        nano_lon = lon_off + gran * _acc(_seg("lon_delta", i))

        st = [bytes(b) for b in sts[i] or []]
        kv = _seg("keys_vals", i)
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
        version = _seg("version", i, np.int32)
        visible = _seg("visible", i, bool)
        has_info = len(version) == n
        if has_info:
            ts_ms = _acc(_seg("timestamp_delta", i)) * dgran
            changeset = _acc(_seg("changeset_delta", i))
            uid = _acc(_seg("uid_delta", i)).astype(np.int32)
            user_sid = _acc(_seg("user_sid_delta", i)).astype(np.int64)
            # resolve only DISTINCT sids through the string table (users
            # repeat heavily in real files)
            uniq, inv = np.unique(user_sid, return_inverse=True)
            names = [
                st[s].decode("utf-8", "replace") if 0 <= s < len(st) else ""
                for s in uniq
            ]
            users = [names[j] for j in inv]
            vis = visible if len(visible) == n else np.ones(n, dtype=bool)
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


def segmented_cumsum(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-segment running sum over a flattened list column.

    The vectorized form of the reference's per-element delta iterators
    (running sums resetting at each element: WayRefIter
    src/elements.rs:335-343, RelMemberIter 487-500): one global cumsum,
    then subtract each segment's incoming prefix.
    """
    if len(flat) == 0:
        return flat.astype(np.int64)
    total = np.cumsum(flat, dtype=np.int64)
    lens = np.diff(offsets)
    starts = offsets[:-1]
    base = np.where(starts > 0, total[starts - 1], 0)
    return total - np.repeat(base, lens)


def _list_column(batch: pa.Table, name: str) -> tuple[np.ndarray, np.ndarray]:
    """(flat_values, offsets) of a list column, combined across chunks."""
    arr = batch.column(name).combine_chunks()
    return (
        arr.flatten().to_numpy(zero_copy_only=False),
        arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64),
    )


def _parallel_tags(batch: pa.Table) -> pa.ListArray:
    """keys[]/vals[] parallel index arrays → tags list<struct> through the
    per-row string table (src/elements.rs:515-538); invalid indices are
    skipped like get_stringtable_key_value (src/block.rs:438-456)."""
    keys_flat, offs = _list_column(batch, "keys")
    vals_flat, _ = _list_column(batch, "vals")
    tables = batch.column("stringtable").to_pylist()
    lens = np.diff(offs)
    row_of = np.repeat(np.arange(batch.num_rows), lens)
    out_keys, out_vals, counts = [], [], np.zeros(batch.num_rows, dtype=np.int64)
    for p, (k, v) in enumerate(zip(keys_flat, vals_flat)):
        st = tables[row_of[p]]
        if 0 <= k < len(st) and 0 <= v < len(st):
            out_keys.append(bytes(st[k]).decode("utf-8", "replace"))
            out_vals.append(bytes(st[v]).decode("utf-8", "replace"))
            counts[row_of[p]] += 1
    return pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)),
        pa.StructArray.from_arrays(
            [pa.array(out_keys, type=pa.string()), pa.array(out_vals, type=pa.string())],
            names=["key", "value"],
        ),
    )


def _resolved_info(batch: pa.Table) -> pa.Array:
    """RAW_INFO_STRUCT column → INFO_STRUCT: timestamp scales by the
    block's date_granularity (src/elements.rs:611-614: milliseconds =
    timestamp * date_granularity) and user_sid resolves through the
    per-row string table; rows without Info stay null (the reference's
    ``Option<Info>``, elements.rs:200-206)."""
    import pyarrow.compute as pc

    info = batch.column("info")
    if isinstance(info, pa.ChunkedArray):
        info = info.combine_chunks()
    if info.null_count == batch.num_rows:
        return pa.nulls(batch.num_rows, type=schema.INFO_STRUCT)
    dg = pc.fill_null(batch.column("date_granularity"), 1000).cast(pa.int64()).combine_chunks()
    ts_ms = pc.multiply_checked(info.field("timestamp"), dg)
    if isinstance(ts_ms, pa.ChunkedArray):
        ts_ms = ts_ms.combine_chunks()
    present = pc.is_valid(info)
    sids = info.field("user_sid").to_pylist()
    tables = batch.column("stringtable").to_pylist()
    users = [
        (bytes(tables[i][s]).decode("utf-8", "replace") if 0 <= s < len(tables[i]) else "")
        if s is not None
        else None
        for i, s in enumerate(sids)
    ]
    return pa.StructArray.from_arrays(
        [
            info.field("version"),
            ts_ms,
            info.field("changeset"),
            info.field("uid"),
            pa.array(users, type=pa.string()),
            pc.fill_null(info.field("visible"), True),
        ],
        names=["version", "timestamp_ms", "changeset", "uid", "user", "visible"],
        mask=pc.invert(present),
    )


def decode_way_blocks(batch: pa.Table) -> pa.Table:
    """WAY_BLOCKS_SCHEMA rows → WAYS_SCHEMA rows (vectorized).

    Delta-decodes refs (WayRefIter src/elements.rs:335-343) and the
    optional LocationsOnWays lat/lon pairs (src/elements.rs:404-416,
    empty when the feature is absent — tests/read.rs:189) with one
    segmented cumsum each; resolves parallel key/val tag indices.
    """
    refs_flat, refs_offs = _list_column(batch, "refs_delta")
    refs = segmented_cumsum(refs_flat, refs_offs)
    refs_arr = pa.ListArray.from_arrays(
        pa.array(refs_offs.astype(np.int32)), pa.array(refs, type=pa.int64())
    )
    gran = batch.column("granularity").to_numpy(zero_copy_only=False).astype(np.int64)
    lat_off = batch.column("lat_offset").to_numpy(zero_copy_only=False)
    lon_off = batch.column("lon_offset").to_numpy(zero_copy_only=False)
    lat_flat, loc_offs = _list_column(batch, "lat_delta")
    lon_flat, _ = _list_column(batch, "lon_delta")
    lens = np.diff(loc_offs)
    if lat_flat.size:
        row_of = np.repeat(np.arange(batch.num_rows), lens)
        nano_lat = lat_off[row_of] + gran[row_of] * segmented_cumsum(lat_flat, loc_offs)
        nano_lon = lon_off[row_of] + gran[row_of] * segmented_cumsum(lon_flat, loc_offs)
    else:
        nano_lat = nano_lon = np.empty(0, dtype=np.int64)
    locs_struct = pa.StructArray.from_arrays(
        [pa.array(nano_lat, type=pa.int64()), pa.array(nano_lon, type=pa.int64())],
        names=["nano_lat", "nano_lon"],
    )
    locs_arr = pa.ListArray.from_arrays(
        pa.array(loc_offs.astype(np.int32)),
        locs_struct,
        mask=pa.array(lens == 0),  # absent feature → null, not empty list
    )
    return pa.Table.from_arrays(
        [
            batch.column("id"),
            refs_arr,
            _parallel_tags(batch),
            _resolved_info(batch),
            locs_arr,
        ],
        schema=schema.WAYS_SCHEMA,
    )


def decode_relation_blocks(batch: pa.Table) -> pa.Table:
    """REL_BLOCKS_SCHEMA rows → RELATIONS_SCHEMA rows (vectorized).

    Member ids are delta-decoded (RelMemberIter src/elements.rs:487-500);
    roles resolve through the string table; the member type enum passes
    through (src/elements.rs:433-441)."""
    mem_flat, mem_offs = _list_column(batch, "memids_delta")
    memids = segmented_cumsum(mem_flat, mem_offs)
    roles_flat, _ = _list_column(batch, "roles_sid")
    types_flat, _ = _list_column(batch, "types")
    tables = batch.column("stringtable").to_pylist()
    lens = np.diff(mem_offs)
    row_of = np.repeat(np.arange(batch.num_rows), lens)
    roles = [
        bytes(tables[r][s]).decode("utf-8", "replace")
        if 0 <= s < len(tables[r])
        else ""
        for r, s in zip(row_of, roles_flat)
    ]
    members = pa.ListArray.from_arrays(
        pa.array(mem_offs.astype(np.int32)),
        pa.StructArray.from_arrays(
            [
                pa.array(roles, type=pa.string()),
                pa.array(memids, type=pa.int64()),
                pa.array(types_flat.astype(np.int8), type=pa.int8()),
            ],
            names=["role", "member_id", "member_type"],
        ),
    )
    return pa.Table.from_arrays(
        [
            batch.column("id"),
            members,
            _parallel_tags(batch),
            _resolved_info(batch),
        ],
        schema=schema.RELATIONS_SCHEMA,
    )


def header_meta(blocks: pa.Table) -> dict | None:
    """Dataset-level metadata from the header block, or None if absent.

    The engine analog of the reference's HeaderBlock accessors
    (/root/reference/src/block.rs:21-85): bbox converted nanodegrees →
    degrees (×1e-9, block.rs:21-28), required/optional feature SETS
    (order-insensitive, tests/read.rs:80-102), and the osmosis
    replication watermark that seeds the resumable-checkpoint manifest
    (SURVEY.md §4). A metadata read touches only the tiny header row —
    the map-level analog of the reference's header-only blob scan
    (src/blob.rs:402-428), no payload decode.
    """
    kinds = blocks.column("kind").to_pylist()
    for i, kind in enumerate(kinds):
        if kind != "header":
            continue
        h = blocks.column("header")[i].as_py()
        if h is None:
            return None
        bbox = None
        if h["bbox_left"] is not None:
            bbox = {
                "left": h["bbox_left"] * 1e-9,
                "right": h["bbox_right"] * 1e-9,
                "top": h["bbox_top"] * 1e-9,
                "bottom": h["bbox_bottom"] * 1e-9,
            }
        return {
            "bbox": bbox,
            "required_features": frozenset(h["required_features"] or []),
            "optional_features": frozenset(h["optional_features"] or []),
            "writingprogram": h["writingprogram"],
            "source": h["source"],
            "replication": {
                "timestamp": h["osmosis_replication_timestamp"],
                "sequence_number": h["osmosis_replication_sequence_number"],
                "base_url": h["osmosis_replication_base_url"],
            },
        }
    return None
