"""Real ``.osm.pbf`` ingestion: framed-blob source → Ray Data datasets.

The container format (reference: /root/reference/src/blob.rs:189-230):

    [4-byte big-endian header size][BlobHeader][Blob] ...

``scan_blobs`` is the driver-side header-only pass — it reads each
BlobHeader and seeks past the payload (the engine twin of
``next_header_skip_blob``, src/blob.rs:402-428), yielding
``(offset, datasize, type)`` descriptors. Those descriptors become the
unit of parallelism: one Ray Data row per blob, fetched + decompressed +
parsed inside ``map_batches`` tasks (the reference parallelizes at
exactly this boundary, src/reader.rs:119-142 / README.md:90-93).

Blob payloads decode per src/blob.rs:455-469: ``raw`` bytes or
``zlib_data`` (bounded at 32 MiB, src/blob.rs:18); other compression
variants raise, unknown blob *types* are skipped silently
(src/blob.rs:27-29). PrimitiveBlock parsing emits rows in the engine's
existing block schemas (BLOCKS_SCHEMA / WAY_BLOCKS_SCHEMA /
REL_BLOCKS_SCHEMA) so the tested vectorized decode kernels
(stages/decode.py) do all delta/tag/coordinate work unchanged.

Scale notes: the descriptor list is tiny (one row per ~8k-element blob,
so ~16k rows per 100 GB input) and streams through ``from_items``;
payload bytes are read per task directly from shared storage — no
driver-side data IO after the header scan. Multi-file planets: pass a
LIST of paths to any ``read_pbf_*`` — blobs across files form one
descriptor stream.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from osmpbf_ray import schema
from osmpbf_ray.sources import pbwire as w

MAX_HEADER_SIZE = 64 * 1024  # src/blob.rs:15
MAX_BLOB_MESSAGE_SIZE = 32 * 1024 * 1024  # src/blob.rs:18

# --- framed-blob scan (driver side, header-only) -----------------------------


def scan_blobs(path: str) -> list[dict]:
    """Header-only scan: one descriptor per blob, no payload decode."""
    import os

    out = []
    with open(path, "rb") as f:
        file_size = os.fstat(f.fileno()).st_size
        while True:
            head = f.read(4)
            if len(head) == 0:
                return out
            if len(head) < 4:
                raise ValueError("truncated blob header size")
            (hsize,) = struct.unpack(">I", head)
            if hsize > MAX_HEADER_SIZE:
                raise ValueError(f"blob header exceeds {MAX_HEADER_SIZE} bytes")
            header = f.read(hsize)
            if len(header) < hsize:
                raise ValueError("truncated BlobHeader")
            btype, datasize, indexdata = _parse_blob_header(header)
            offset = f.tell()
            # seeking past EOF succeeds silently, so a truncated final
            # payload must be caught against the real file size here
            if offset + datasize > file_size:
                raise ValueError(
                    f"truncated blob payload at offset {offset}: "
                    f"needs {datasize} bytes, file has {file_size - offset}"
                )
            out.append({"path": path, "offset": offset, "datasize": datasize,
                        "type": btype, "indexdata": indexdata})
            f.seek(datasize, 1)


def _parse_blob_header(buf) -> tuple[str, int, "bytes | None"]:
    # indexdata (fileformat.proto:65, field 2) is an opaque app-defined
    # payload the reference's BlobHeader carries; pass it through
    # verbatim (None when absent) rather than dropping it
    btype, datasize, indexdata = "", None, None
    for field, wire, val in w.iter_fields(buf):
        if field == 1 and wire == w.WIRE_LEN:
            btype = bytes(val).decode("utf-8")
        elif field == 2 and wire == w.WIRE_LEN:
            indexdata = bytes(val)
        elif field == 3 and wire == w.WIRE_VARINT:
            datasize = val
    if datasize is None:
        raise ValueError("BlobHeader missing required datasize")
    return btype, datasize, indexdata


def decode_blob(buf, copy: bool = True):
    """Blob message → uncompressed payload (src/blob.rs:455-469).

    ``copy=False`` returns raw (uncompressed) payloads as a memoryview
    into ``buf`` — the zero-copy path the mmap reader uses (zlib blobs
    always materialize, as in the reference's decompression)."""
    raw = None
    raw_size = None
    for field, wire, val in w.iter_fields(buf):
        if field == 1 and wire == w.WIRE_LEN:  # raw
            raw = bytes(val) if copy else val
        elif field == 2 and wire == w.WIRE_VARINT:
            raw_size = val
        elif field == 3 and wire == w.WIRE_LEN:  # zlib_data
            if raw_size is not None and raw_size > MAX_BLOB_MESSAGE_SIZE:
                raise ValueError("blob exceeds max uncompressed size")
            # bound decompression WHILE streaming (the reference wraps the
            # decoder in .take(MAX), src/blob.rs:464): a crafted blob with
            # an absent/understated raw_size must not expand unbounded in
            # memory before a post-hoc length check
            dec = zlib.decompressobj()
            raw = dec.decompress(bytes(val), MAX_BLOB_MESSAGE_SIZE + 1)
            if len(raw) > MAX_BLOB_MESSAGE_SIZE or dec.unconsumed_tail:
                raise ValueError("blob exceeds max uncompressed size")
        elif field == 4 and wire == w.WIRE_LEN:  # lzma_data
            # stdlib decode for the proto's lzma variant
            # (fileformat.proto:41-44; the reference ERRORS on these,
            # src/blob.rs:463-465 — the engine goes further). Same
            # streaming expansion bound as the zlib branch.
            import lzma

            dec = lzma.LZMADecompressor()
            raw = dec.decompress(bytes(val), MAX_BLOB_MESSAGE_SIZE + 1)
            # eof is required: a TRUNCATED stream ends with
            # needs_input=True and would otherwise pass as a silently
            # partial payload
            if len(raw) > MAX_BLOB_MESSAGE_SIZE or not dec.eof:
                raise ValueError("truncated or oversized lzma blob payload")
        elif field == 5 and wire == w.WIRE_LEN:  # OBSOLETE_bzip2_data
            import bz2

            dec = bz2.BZ2Decompressor()
            raw = dec.decompress(bytes(val), MAX_BLOB_MESSAGE_SIZE + 1)
            if len(raw) > MAX_BLOB_MESSAGE_SIZE or not dec.eof:
                raise ValueError("truncated or oversized bzip2 blob payload")
        elif field in (6, 7) and wire == w.WIRE_LEN:
            raise ValueError("unsupported blob compression (lz4/zstd)")
    if raw is None:
        raise ValueError("empty Blob")
    if len(raw) > MAX_BLOB_MESSAGE_SIZE:
        raise ValueError("blob exceeds max uncompressed size")
    return raw


def _read_payload(path: str, offset: int, datasize: int) -> bytes:
    with open(path, "rb") as f:
        f.seek(offset)
        return decode_blob(f.read(datasize))


# --- HeaderBlock --------------------------------------------------------------


def parse_header_block(buf) -> dict:
    """HeaderBlock → dict in the engine's BLOCKS_SCHEMA ``header`` shape
    (bbox stays nanodegrees; header_meta converts, src/block.rs:21-28)."""
    out = {
        "bbox_left": None, "bbox_right": None, "bbox_top": None, "bbox_bottom": None,
        "required_features": [], "optional_features": [],
        "writingprogram": None, "source": None,
        "osmosis_replication_timestamp": None,
        "osmosis_replication_sequence_number": None,
        "osmosis_replication_base_url": None,
    }
    for field, wire, val in w.iter_fields(buf):
        if field == 1 and wire == w.WIRE_LEN:
            for f2, w2, v2 in w.iter_fields(val):
                if w2 != w.WIRE_VARINT:
                    continue
                name = {1: "bbox_left", 2: "bbox_right", 3: "bbox_top", 4: "bbox_bottom"}.get(f2)
                if name:
                    out[name] = int(w.zigzag_decode(np.array([v2], dtype=np.uint64))[0])
        elif field == 4 and wire == w.WIRE_LEN:
            out["required_features"].append(bytes(val).decode("utf-8"))
        elif field == 5 and wire == w.WIRE_LEN:
            out["optional_features"].append(bytes(val).decode("utf-8"))
        elif field == 16 and wire == w.WIRE_LEN:
            out["writingprogram"] = bytes(val).decode("utf-8")
        elif field == 17 and wire == w.WIRE_LEN:
            out["source"] = bytes(val).decode("utf-8")
        elif field == 32 and wire == w.WIRE_VARINT:
            out["osmosis_replication_timestamp"] = val
        elif field == 33 and wire == w.WIRE_VARINT:
            out["osmosis_replication_sequence_number"] = val
        elif field == 34 and wire == w.WIRE_LEN:
            out["osmosis_replication_base_url"] = bytes(val).decode("utf-8")
    return out


def read_pbf_header(path) -> dict | None:
    """Driver-side metadata read: first OSMHeader blob only, converted
    like stages.decode.header_meta (degrees, frozenset features).
    ``path`` may be a list (multi-file contract): the first file's
    header governs, matching how the files would be concatenated."""
    if not isinstance(path, (str, bytes)):
        path = list(path)[0]
    for d in scan_blobs(path):
        if d["type"] != "OSMHeader":
            continue
        h = parse_header_block(_read_payload(path, d["offset"], d["datasize"]))
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
            "required_features": frozenset(h["required_features"]),
            "optional_features": frozenset(h["optional_features"]),
            "writingprogram": h["writingprogram"],
            "source": h["source"],
            "replication": {
                "timestamp": h["osmosis_replication_timestamp"],
                "sequence_number": h["osmosis_replication_sequence_number"],
                "base_url": h["osmosis_replication_base_url"],
            },
        }
    return None


# --- PrimitiveBlock parsing ---------------------------------------------------


def _parse_stringtable(buf) -> list[bytes]:
    return [bytes(v) for f, ww, v in w.iter_fields(buf) if f == 1 and ww == w.WIRE_LEN]


def _packed_svals(val) -> np.ndarray:
    return w.zigzag_decode(w.decode_varints(bytes(val)))


def _packed_uvals(val) -> np.ndarray:
    return w.decode_varints(bytes(val))


def _parse_dense_info(buf) -> dict:
    out = {"version": [], "timestamp_delta": [], "changeset_delta": [],
           "uid_delta": [], "user_sid_delta": [], "visible": []}
    for f, ww, v in w.iter_fields(buf):
        if ww != w.WIRE_LEN:
            continue
        if f == 1:
            # proto int32, plain varint: negatives are 64-bit two's complement
            out["version"] = _packed_uvals(v).view(np.int64).astype(np.int32)
        elif f == 2:
            out["timestamp_delta"] = _packed_svals(v)
        elif f == 3:
            out["changeset_delta"] = _packed_svals(v)
        elif f == 4:
            out["uid_delta"] = _packed_svals(v).astype(np.int32)
        elif f == 5:
            out["user_sid_delta"] = _packed_svals(v).astype(np.int32)
        elif f == 6:
            out["visible"] = _packed_uvals(v).astype(bool)
    return out


def _parse_dense(buf) -> dict:
    out = {"id_delta": np.empty(0, np.int64), "lat_delta": np.empty(0, np.int64),
           "lon_delta": np.empty(0, np.int64), "keys_vals": np.empty(0, np.int32),
           "denseinfo": None}
    for f, ww, v in w.iter_fields(buf):
        if ww != w.WIRE_LEN:
            continue
        if f == 1:
            out["id_delta"] = _packed_svals(v)
        elif f == 5:
            out["denseinfo"] = _parse_dense_info(v)
        elif f == 8:
            out["lat_delta"] = _packed_svals(v)
        elif f == 9:
            out["lon_delta"] = _packed_svals(v)
        elif f == 10:
            # int32 (not sint) per osmformat.proto:218 — plain varints
            out["keys_vals"] = _packed_uvals(v).view(np.int64).astype(np.int32)
    return out


def _plain_int(v: int) -> int:
    """Plain (non-zigzag) varint for proto int32/int64: negatives are
    64-bit two's complement on the wire."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _parse_info(buf) -> dict:
    out = {"version": -1, "timestamp": 0, "changeset": 0, "uid": 0,
           "user_sid": 0, "visible": True}
    for f, ww, v in w.iter_fields(buf):
        if ww != w.WIRE_VARINT:
            continue
        if f == 1:
            out["version"] = _plain_int(v)
        elif f == 2:
            out["timestamp"] = _plain_int(v)  # proto int64: two's complement
        elif f == 3:
            out["changeset"] = _plain_int(v)
        elif f == 4:
            out["uid"] = _plain_int(v)  # proto int32
        elif f == 5:
            out["user_sid"] = v
        elif f == 6:
            out["visible"] = bool(v)
    return out


def _sint_scalar(v: int) -> int:
    return int(w.zigzag_decode(np.array([v], dtype=np.uint64))[0])


def _parse_node(buf) -> dict:
    """Plain (non-dense) Node message (osmformat.proto:184-195)."""
    out = {"id": 0, "lat": 0, "lon": 0, "keys": np.empty(0, np.int32),
           "vals": np.empty(0, np.int32), "info": None}
    for f, ww, v in w.iter_fields(buf):
        if f == 1 and ww == w.WIRE_VARINT:
            out["id"] = _sint_scalar(v)
        elif f == 2 and ww == w.WIRE_LEN:
            out["keys"] = _packed_uvals(v).astype(np.int32)
        elif f == 3 and ww == w.WIRE_LEN:
            out["vals"] = _packed_uvals(v).astype(np.int32)
        elif f == 4 and ww == w.WIRE_LEN:
            out["info"] = _parse_info(v)
        elif f == 8 and ww == w.WIRE_VARINT:
            out["lat"] = _sint_scalar(v)
        elif f == 9 and ww == w.WIRE_VARINT:
            out["lon"] = _sint_scalar(v)
    return out


def _parse_way(buf) -> dict:
    out = {"id": 0, "keys": np.empty(0, np.int32), "vals": np.empty(0, np.int32),
           "refs_delta": np.empty(0, np.int64), "lat_delta": np.empty(0, np.int64),
           "lon_delta": np.empty(0, np.int64), "info": None}
    for f, ww, v in w.iter_fields(buf):
        if f == 1 and ww == w.WIRE_VARINT:
            out["id"] = _plain_int(v)  # proto int64, plain varint
        elif f == 2 and ww == w.WIRE_LEN:
            out["keys"] = _packed_uvals(v).astype(np.int32)
        elif f == 3 and ww == w.WIRE_LEN:
            out["vals"] = _packed_uvals(v).astype(np.int32)
        elif f == 4 and ww == w.WIRE_LEN:
            # Info on ways (osmformat.proto:229; reference exposes it per
            # element, /root/reference/src/elements.rs:200-206)
            out["info"] = _parse_info(v)
        elif f == 8 and ww == w.WIRE_LEN:
            out["refs_delta"] = _packed_svals(v)
        elif f == 9 and ww == w.WIRE_LEN:
            out["lat_delta"] = _packed_svals(v)
        elif f == 10 and ww == w.WIRE_LEN:
            out["lon_delta"] = _packed_svals(v)
    return out


def _parse_relation(buf) -> dict:
    out = {"id": 0, "keys": np.empty(0, np.int32), "vals": np.empty(0, np.int32),
           "roles_sid": np.empty(0, np.int32), "memids_delta": np.empty(0, np.int64),
           "types": np.empty(0, np.int8), "info": None}
    for f, ww, v in w.iter_fields(buf):
        if f == 1 and ww == w.WIRE_VARINT:
            out["id"] = _plain_int(v)  # proto int64, plain varint
        elif f == 2 and ww == w.WIRE_LEN:
            out["keys"] = _packed_uvals(v).astype(np.int32)
        elif f == 3 and ww == w.WIRE_LEN:
            out["vals"] = _packed_uvals(v).astype(np.int32)
        elif f == 4 and ww == w.WIRE_LEN:
            # Info on relations (osmformat.proto:248, elements.rs:303-309)
            out["info"] = _parse_info(v)
        elif f == 8 and ww == w.WIRE_LEN:
            out["roles_sid"] = _packed_uvals(v).view(np.int64).astype(np.int32)
        elif f == 9 and ww == w.WIRE_LEN:
            out["memids_delta"] = _packed_svals(v)
        elif f == 10 and ww == w.WIRE_LEN:
            out["types"] = _packed_uvals(v).astype(np.int8)
    return out


def parse_primitive_block(buf) -> dict:
    """PrimitiveBlock → {stringtable, codec params, groups} (osmformat.proto:104-126)."""
    out = {"stringtable": [], "granularity": 100, "lat_offset": 0,
           "lon_offset": 0, "date_granularity": 1000, "groups": []}
    for f, ww, v in w.iter_fields(buf):
        if f == 1 and ww == w.WIRE_LEN:
            out["stringtable"] = _parse_stringtable(v)
        elif f == 2 and ww == w.WIRE_LEN:
            group = {"dense": None, "nodes": [], "ways": [], "relations": []}
            for f2, w2, v2 in w.iter_fields(v):
                if w2 != w.WIRE_LEN:
                    continue
                if f2 == 1:
                    group["nodes"].append(_parse_node(v2))
                elif f2 == 2:
                    group["dense"] = _parse_dense(v2)
                elif f2 == 3:
                    group["ways"].append(_parse_way(v2))
                elif f2 == 4:
                    group["relations"].append(_parse_relation(v2))
                # f2 == 5 (changesets): unused, skipped
            out["groups"].append(group)
        elif f == 17 and ww == w.WIRE_VARINT:
            out["granularity"] = v
        elif f == 18 and ww == w.WIRE_VARINT:
            out["date_granularity"] = v
        elif f == 19 and ww == w.WIRE_VARINT:
            out["lat_offset"] = _plain_int(v)  # proto int64, plain varint
        elif f == 20 and ww == w.WIRE_VARINT:
            out["lon_offset"] = _plain_int(v)
    return out


# --- PrimitiveBlock → engine block rows --------------------------------------

_EMPTY_DENSE = {
    "id_delta": [], "lat_delta": [], "lon_delta": [], "keys_vals": [],
    "version": [], "timestamp_delta": [], "changeset_delta": [],
    "uid_delta": [], "user_sid_delta": [], "visible": [],
}


def _block_row_common(block_id: int, pb: dict) -> dict:
    return {
        "block_id": block_id,
        "stringtable": pb["stringtable"],
        "granularity": pb["granularity"],
        "lat_offset": pb["lat_offset"],
        "lon_offset": pb["lon_offset"],
        "date_granularity": pb["date_granularity"],
        "header": None,
    }


def node_block_rows(block_id: int, pb: dict) -> list[dict]:
    """Node-bearing groups → BLOCKS_SCHEMA rows.

    Dense groups map 1:1 (deltas preserved). Plain-Node groups become
    ``kind="nodes"`` rows carrying ABSOLUTE values in the same columns
    (the decode kernel skips the cumsum for that kind) with per-node
    keys/vals flattened into the dense 0-delimited layout — the two
    encodings are interchangeable views of the same logical content
    (reference asserts this: /root/reference/tests/read.rs:15-31).
    """
    rows = []
    for g in pb["groups"]:
        if g["dense"] is not None:
            d = g["dense"]
            di = g["dense"]["denseinfo"] or _EMPTY_DENSE
            row = _block_row_common(block_id, pb)
            row.update(
                kind="dense",
                id_delta=np.asarray(d["id_delta"], dtype=np.int64),
                lat_delta=np.asarray(d["lat_delta"], dtype=np.int64),
                lon_delta=np.asarray(d["lon_delta"], dtype=np.int64),
                keys_vals=np.asarray(d["keys_vals"], dtype=np.int32),
                version=np.asarray(di["version"], dtype=np.int32),
                timestamp_delta=np.asarray(di["timestamp_delta"], dtype=np.int64),
                changeset_delta=np.asarray(di["changeset_delta"], dtype=np.int64),
                uid_delta=np.asarray(di["uid_delta"], dtype=np.int32),
                user_sid_delta=np.asarray(di["user_sid_delta"], dtype=np.int32),
                visible=np.asarray(di["visible"], dtype=bool),
            )
            rows.append(row)
        if g["nodes"]:
            kv = []
            for nd in g["nodes"]:
                kv.extend(int(x) for pair in zip(nd["keys"], nd["vals"]) for x in pair)
                kv.append(0)
            infos = [nd["info"] for nd in g["nodes"]]
            # Info is OPTIONAL PER NODE in plain groups — a single
            # info-less node must not drop the whole group's metadata;
            # missing entries take the proto defaults (osmformat.proto
            # Info: version -1, visible true, numerics 0)
            has_info = any(i is not None for i in infos)
            if has_info:
                infos = [i if i is not None else
                         {"version": -1, "timestamp": 0, "changeset": 0,
                          "uid": 0, "user_sid": 0, "visible": True}
                         for i in infos]
            row = _block_row_common(block_id, pb)
            row.update(
                kind="nodes",
                id_delta=np.array([nd["id"] for nd in g["nodes"]], dtype=np.int64),
                lat_delta=np.array([nd["lat"] for nd in g["nodes"]], dtype=np.int64),
                lon_delta=np.array([nd["lon"] for nd in g["nodes"]], dtype=np.int64),
                keys_vals=np.asarray(kv, dtype=np.int32),
                version=np.array([i["version"] for i in infos], dtype=np.int32) if has_info else [],
                timestamp_delta=np.array([i["timestamp"] for i in infos], dtype=np.int64) if has_info else [],
                changeset_delta=np.array([i["changeset"] for i in infos], dtype=np.int64) if has_info else [],
                uid_delta=np.array([i["uid"] for i in infos], dtype=np.int32) if has_info else [],
                user_sid_delta=np.array([i["user_sid"] for i in infos], dtype=np.int32) if has_info else [],
                visible=np.array([i["visible"] for i in infos], dtype=bool) if has_info else [],
            )
            rows.append(row)
    return rows


def way_block_rows(block_id: int, pb: dict) -> list[dict]:
    rows = []
    for g in pb["groups"]:
        for wy in g["ways"]:
            rows.append(
                {
                    "block_id": block_id,
                    "id": wy["id"],
                    "refs_delta": wy["refs_delta"],
                    "keys": wy["keys"],
                    "vals": wy["vals"],
                    "lat_delta": wy["lat_delta"],
                    "lon_delta": wy["lon_delta"],
                    "stringtable": pb["stringtable"],
                    "granularity": pb["granularity"],
                    "lat_offset": pb["lat_offset"],
                    "lon_offset": pb["lon_offset"],
                    "date_granularity": pb["date_granularity"],
                    "info": wy["info"],
                }
            )
    return rows


def relation_block_rows(block_id: int, pb: dict) -> list[dict]:
    rows = []
    for g in pb["groups"]:
        for rel in g["relations"]:
            rows.append(
                {
                    "block_id": block_id,
                    "id": rel["id"],
                    "roles_sid": rel["roles_sid"],
                    "memids_delta": rel["memids_delta"],
                    "types": rel["types"],
                    "keys": rel["keys"],
                    "vals": rel["vals"],
                    "stringtable": pb["stringtable"],
                    "date_granularity": pb["date_granularity"],
                    "info": rel["info"],
                }
            )
    return rows


# --- Ray Data readers ---------------------------------------------------------


def _data_descriptors(path) -> list[dict]:
    """``path`` may be one file or a list (multi-file planets: one
    descriptor stream, blobs stay the unit of parallelism)."""
    paths = [path] if isinstance(path, (str, bytes)) else list(path)
    out = []
    for p in paths:
        # indexdata is dropped from the DECODE descriptor stream: an
        # all-absent column would infer Arrow `null` type per block and
        # diverge from blocks that carry bytes (read_pbf_raw keeps it,
        # explicitly typed)
        out.extend({k: d[k] for k in ("path", "offset", "datasize", "type")}
                   for d in scan_blobs(p) if d["type"] == "OSMData")
    return out
    # unknown blob types skipped here = src/blob.rs:27-29 semantics


def _descriptor_ds(path, override_num_blocks: int | None = None):
    import ray.data as rd

    items = _data_descriptors(path)
    if not items:
        items = []
    return rd.from_items(items, override_num_blocks=override_num_blocks)


def _fetch_parse(batch: pa.Table, row_fn, out_schema: pa.Schema,
                 on_error: str = "raise") -> pa.Table:
    """Fetch + decompress + parse each blob of the batch.

    ``on_error="skip"`` turns a malformed blob into a skipped blob (the
    engine's error-channel policy — per SURVEY §4 the task survives and
    Ray's retry covers transient IO; the reference instead latches the
    first error and stops, src/blob.rs:266-269). A warning with the blob
    offset is printed so skips are observable in task logs.
    """
    paths = batch.column("path").to_pylist()
    offsets = batch.column("offset").to_pylist()
    sizes = batch.column("datasize").to_pylist()
    import lzma

    rows = []
    for p, off, sz in zip(paths, offsets, sizes):
        try:
            pb = parse_primitive_block(_read_payload(p, off, sz))
        # OSError covers bz2's malformed-stream errors — every codec
        # decode_blob supports must be skippable, not just zlib
        except (ValueError, zlib.error, lzma.LZMAError, OSError) as exc:
            if on_error != "skip":
                raise
            print(f"osmpbf_ray: skipping malformed blob at {p}:{off}: {exc}")
            continue
        rows.extend(row_fn(off, pb))
    if not rows:
        return out_schema.empty_table()
    return pa.Table.from_pylist(rows, schema=out_schema)


def read_pbf_blocks(path, override_num_blocks: int | None = None,
                    on_error: str = "raise"):
    """path (or list of paths) → Dataset[BLOCKS_SCHEMA] (node-bearing
    groups only).

    ``block_id`` is the blob's byte offset — the reference's ByteOffset
    lineage key (src/blob.rs:57) for free. ``on_error="skip"`` routes
    malformed blobs to the error channel instead of failing the task."""
    return _descriptor_ds(path, override_num_blocks).map_batches(
        lambda b: _fetch_parse(b, node_block_rows, schema.BLOCKS_SCHEMA, on_error),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def read_pbf_way_blocks(path, override_num_blocks: int | None = None,
                        on_error: str = "raise"):
    return _descriptor_ds(path, override_num_blocks).map_batches(
        lambda b: _fetch_parse(b, way_block_rows, schema.WAY_BLOCKS_SCHEMA, on_error),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def read_pbf_relation_blocks(path, override_num_blocks: int | None = None,
                             on_error: str = "raise"):
    return _descriptor_ds(path, override_num_blocks).map_batches(
        lambda b: _fetch_parse(b, relation_block_rows, schema.REL_BLOCKS_SCHEMA, on_error),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def read_pbf_raw(path: str, decompress: bool = True,
                 override_num_blocks: int | None = None):
    """Raw escape hatch: undecoded blob payloads as a Dataset.

    The engine twin of the reference's public blob-level surface
    (``BlobReader`` yielding raw ``Blob``s + ``raw_tags`` /
    ``raw_stringtable``, src/elements.rs:543-564): rows are
    ``(offset, type, datasize, data)`` where ``data`` is the blob payload
    (decompressed by default; ``decompress=False`` ships the wire bytes
    untouched). Block-level raw access — string-table indices, undecoded
    delta arrays — is the BLOCKS_SCHEMA itself (``read_pbf_blocks``),
    which keeps those columns exactly as stored.
    """
    import ray.data as rd

    # path may be one file or a list — same contract as every other
    # read_pbf_* (multi-file planets form one descriptor stream)
    paths = [path] if isinstance(path, (str, bytes)) else list(path)
    items = [d for p in paths for d in scan_blobs(p)]

    def fetch(batch: pa.Table) -> pa.Table:
        data = []
        for p, off, sz in zip(batch.column("path").to_pylist(),
                              batch.column("offset").to_pylist(),
                              batch.column("datasize").to_pylist()):
            if decompress:
                data.append(_read_payload(p, off, sz))
            else:
                with open(p, "rb") as f:
                    f.seek(off)
                    data.append(f.read(sz))
        # indexdata passthrough (fileformat.proto:63-67 parity): cast
        # pins binary even when a block's values are all absent (which
        # from_items would otherwise infer as `null` type)
        return pa.table(
            {
                "offset": batch.column("offset"),
                "type": batch.column("type"),
                "datasize": batch.column("datasize"),
                "indexdata": batch.column("indexdata").cast(pa.binary()),
                "data": pa.array(data, type=pa.binary()),
            }
        )

    return rd.from_items(items, override_num_blocks=override_num_blocks).map_batches(
        fetch, batch_format="pyarrow", zero_copy_batch=True
    )


def read_pbf_nodes(path, **kwargs):
    """path → canonical NODES_SCHEMA Dataset (ElementReader equivalent)."""
    from osmpbf_ray.stages import decode

    return decode.decode_blocks_ds(read_pbf_blocks(path, **kwargs))


def read_pbf_ways(path, **kwargs):
    from osmpbf_ray.stages import decode

    return read_pbf_way_blocks(path, **kwargs).map_batches(
        decode.decode_way_blocks, batch_format="pyarrow", zero_copy_batch=True
    )


def read_pbf_relations(path, **kwargs):
    from osmpbf_ray.stages import decode

    return read_pbf_relation_blocks(path, **kwargs).map_batches(
        decode.decode_relation_blocks, batch_format="pyarrow", zero_copy_batch=True
    )


# --- writer (engine-new sink; the reference never writes, SURVEY §2.1) --------


def _blob_frame(btype: str, payload: bytes, compress: str,
                indexdata: bytes | None = None) -> bytes:
    if compress == "zlib":
        blob = w.field_varint(2, len(payload)) + w.field_len(3, zlib.compress(payload))
    elif compress == "raw":
        blob = w.field_len(1, payload) + w.field_varint(2, len(payload))
    elif compress == "lzma":
        import lzma

        blob = w.field_varint(2, len(payload)) + w.field_len(4, lzma.compress(payload))
    elif compress == "bzip2":
        import bz2

        blob = w.field_varint(2, len(payload)) + w.field_len(5, bz2.compress(payload))
    else:
        raise ValueError(f"unsupported compression {compress!r}")
    header = w.field_len(1, btype.encode())
    if indexdata is not None:
        # optional opaque BlobHeader.indexdata (fileformat.proto:65)
        header += w.field_len(2, indexdata)
    header += w.field_varint(3, len(blob))
    return struct.pack(">I", len(header)) + header + blob


def _encode_header_block(header: dict) -> bytes:
    out = b""
    if header.get("bbox_left") is not None:
        bbox = b"".join(
            w.encode_varint((f << 3) | w.WIRE_VARINT)
            + w.encode_varint(int(w.zigzag_encode(np.array([header[k]], dtype=np.int64))[0]))
            for f, k in [(1, "bbox_left"), (2, "bbox_right"), (3, "bbox_top"), (4, "bbox_bottom")]
        )
        out += w.field_len(1, bbox)
    for feat in header.get("required_features", []) or []:
        out += w.field_len(4, feat.encode())
    for feat in header.get("optional_features", []) or []:
        out += w.field_len(5, feat.encode())
    if header.get("writingprogram"):
        out += w.field_len(16, header["writingprogram"].encode())
    if header.get("source"):
        out += w.field_len(17, header["source"].encode())
    for f, k in [(32, "osmosis_replication_timestamp"),
                 (33, "osmosis_replication_sequence_number")]:
        if header.get(k) is not None:
            out += w.field_varint(f, header[k])
    if header.get("osmosis_replication_base_url"):
        out += w.field_len(34, header["osmosis_replication_base_url"].encode())
    return out


class StringTableBuilder:
    """Index 0 reserved blank (osmformat.proto:129-137)."""

    def __init__(self):
        self.strings: list[bytes] = [b""]
        self.index: dict[bytes, int] = {}

    def add(self, s) -> int:
        b = s if isinstance(s, bytes) else str(s).encode("utf-8")
        i = self.index.get(b)
        if i is None:
            i = self.index[b] = len(self.strings)
            self.strings.append(b)
        return i

    def encode(self) -> bytes:
        return b"".join(w.field_len(1, s) for s in self.strings)


def _encode_dense_info(infos: list[dict], date_granularity: int = 1000) -> bytes:
    version = np.array([i["version"] for i in infos], dtype=np.int64).view(np.uint64)
    ts = np.array([i["timestamp_ms"] // date_granularity for i in infos], dtype=np.int64)
    cs = np.array([i["changeset"] for i in infos], dtype=np.int64)
    uid = np.array([i["uid"] for i in infos], dtype=np.int64)
    usid = np.array([i["user_sid"] for i in infos], dtype=np.int64)
    vis = np.array([1 if i["visible"] else 0 for i in infos], dtype=np.uint64)
    out = w.field_packed_uvarints(1, version)
    out += w.field_packed_svarints(2, np.diff(ts, prepend=0))
    out += w.field_packed_svarints(3, np.diff(cs, prepend=0))
    out += w.field_packed_svarints(4, np.diff(uid, prepend=0))
    out += w.field_packed_svarints(5, np.diff(usid, prepend=0))
    out += w.field_len(6, w.encode_varints(vis))
    return out


def _node_rows_to_group(nodes: list[dict], st: StringTableBuilder, dense: bool,
                        granularity: int, lat_offset: int = 0, lon_offset: int = 0,
                        date_granularity: int = 1000) -> bytes:
    """Canonical node dicts → one PrimitiveGroup (dense or plain).

    Stored units invert the reader's ``nano = offset + granularity *
    stored`` (src/elements.rs:89-91), so offset-bearing files roundtrip
    coordinates exactly."""
    for nd in nodes:
        nd["_kv"] = [(st.add(t["key"]), st.add(t["value"])) for t in (nd.get("tags") or [])]
        info = nd.get("info")
        if info is not None:
            nd["_info"] = dict(info)
            nd["_info"]["user_sid"] = st.add(info.get("user") or "")
    stored_lat = np.array([(nd["nano_lat"] - lat_offset) // granularity for nd in nodes], dtype=np.int64)
    stored_lon = np.array([(nd["nano_lon"] - lon_offset) // granularity for nd in nodes], dtype=np.int64)
    ids = np.array([nd["id"] for nd in nodes], dtype=np.int64)
    if dense:
        kv = []
        for nd in nodes:
            kv.extend(x for pair in nd["_kv"] for x in pair)
            kv.append(0)
        body = w.field_packed_svarints(1, np.diff(ids, prepend=0))
        infos = [nd.get("_info") for nd in nodes]
        if all(i is not None for i in infos):
            body += w.field_len(5, _encode_dense_info(infos, date_granularity))
        body += w.field_packed_svarints(8, np.diff(stored_lat, prepend=0))
        body += w.field_packed_svarints(9, np.diff(stored_lon, prepend=0))
        if any(nd["_kv"] for nd in nodes):
            body += w.field_packed_uvarints(10, np.asarray(kv, dtype=np.uint64))
        return w.field_len(2, body)
    group = b""
    for i, nd in enumerate(nodes):
        msg = w.field_varint(1, int(w.zigzag_encode(ids[i : i + 1])[0]))
        if nd["_kv"]:
            msg += w.field_packed_uvarints(2, np.array([k for k, _ in nd["_kv"]], dtype=np.uint64))
            msg += w.field_packed_uvarints(3, np.array([v for _, v in nd["_kv"]], dtype=np.uint64))
        info = nd.get("_info")
        if info is not None:
            msg += w.field_len(4, _encode_info(info))
        msg += w.field_varint(8, int(w.zigzag_encode(stored_lat[i : i + 1])[0]))
        msg += w.field_varint(9, int(w.zigzag_encode(stored_lon[i : i + 1])[0]))
        group += w.field_len(1, msg)
    return group


_U64 = 0xFFFFFFFFFFFFFFFF  # plain-varint two's complement for proto int32/int64


def _encode_info(info: dict, date_granularity: int = 1000) -> bytes:
    out = w.field_varint(1, info.get("version", -1) & _U64)
    out += w.field_varint(2, (info.get("timestamp_ms", 0) // date_granularity) & _U64)
    out += w.field_varint(3, info.get("changeset", 0) & _U64)
    out += w.field_varint(4, info.get("uid", 0) & _U64)
    out += w.field_varint(5, info.get("user_sid", 0))
    out += w.field_varint(6, 1 if info.get("visible", True) else 0)
    return out


def _element_info_field(el: dict, st: StringTableBuilder, date_granularity: int) -> bytes:
    """Optional Info (field 4) for ways/relations — user interns into the
    block string table like node info does."""
    info = el.get("info")
    if info is None:
        return b""
    enc = dict(info)
    enc["user_sid"] = st.add(info.get("user") or "")
    return w.field_len(4, _encode_info(enc, date_granularity))


def _tags_fields(tags, st: StringTableBuilder) -> bytes:
    if not tags:
        return b""
    keys = np.array([st.add(t["key"]) for t in tags], dtype=np.uint64)
    vals = np.array([st.add(t["value"]) for t in tags], dtype=np.uint64)
    return w.field_packed_uvarints(2, keys) + w.field_packed_uvarints(3, vals)


def _way_to_msg(way: dict, st: StringTableBuilder, granularity: int,
                lat_offset: int = 0, lon_offset: int = 0,
                date_granularity: int = 1000) -> bytes:
    msg = w.field_varint(1, way["id"] & _U64)
    msg += _tags_fields(way.get("tags"), st)
    msg += _element_info_field(way, st, date_granularity)
    refs = np.asarray(way["refs"], dtype=np.int64)
    msg += w.field_packed_svarints(8, np.diff(refs, prepend=0))
    locs = way.get("locations")
    if locs:
        lat = np.array([(p["nano_lat"] - lat_offset) // granularity for p in locs], dtype=np.int64)
        lon = np.array([(p["nano_lon"] - lon_offset) // granularity for p in locs], dtype=np.int64)
        msg += w.field_packed_svarints(9, np.diff(lat, prepend=0))
        msg += w.field_packed_svarints(10, np.diff(lon, prepend=0))
    return w.field_len(3, msg)


def _relation_to_msg(rel: dict, st: StringTableBuilder,
                     date_granularity: int = 1000) -> bytes:
    msg = w.field_varint(1, rel["id"] & _U64)
    msg += _tags_fields(rel.get("tags"), st)
    msg += _element_info_field(rel, st, date_granularity)
    members = rel.get("members") or []
    if members:
        roles = np.array([st.add(m["role"]) for m in members], dtype=np.uint64)
        memids = np.array([m["member_id"] for m in members], dtype=np.int64)
        types = np.array([m["member_type"] for m in members], dtype=np.uint64)
        msg += w.field_len(8, w.encode_varints(roles))
        msg += w.field_packed_svarints(9, np.diff(memids, prepend=0))
        msg += w.field_len(10, w.encode_varints(types))
    return w.field_len(4, msg)


def write_pbf(
    path: str,
    nodes: pa.Table | None = None,
    ways: pa.Table | None = None,
    relations: pa.Table | None = None,
    *,
    compress: str = "zlib",
    dense: bool = True,
    granularity: int = 100,
    lat_offset: int = 0,
    lon_offset: int = 0,
    date_granularity: int = 1000,
    nodes_per_block: int = 8000,
    header: dict | None = None,
) -> int:
    """Canonical element tables → a framed ``.osm.pbf`` file.

    Engine-new sink (the reference is read-only). ``dense=False`` emits
    plain Node messages, ``compress="raw"`` skips zlib — together they
    produce the reference's three-encoding conformance matrix
    (tests/read.rs:15-31). All four PrimitiveBlock codec params
    (granularity / lat_offset / lon_offset / date_granularity,
    osmformat.proto:108-116) are honored and emitted when non-default.
    Returns the number of blobs written.
    """
    blobs = 0
    with open(path, "wb") as f:
        hdr = dict(header or {})
        feats = list(hdr.get("required_features") or ["OsmSchema-V0.6"])
        if dense and "DenseNodes" not in feats:
            feats.append("DenseNodes")
        hdr["required_features"] = feats
        hdr.setdefault("writingprogram", "osmpbf_ray")
        f.write(_blob_frame("OSMHeader", _encode_header_block(hdr), compress))
        blobs += 1

        def emit_block(groups_fn, rows):
            nonlocal blobs
            st = StringTableBuilder()
            body = groups_fn(rows, st)  # PrimitiveGroup contents
            block = w.field_len(1, st.encode()) + w.field_len(2, body)
            if granularity != 100:
                block += w.field_varint(17, granularity)
            if date_granularity != 1000:
                block += w.field_varint(18, date_granularity)
            if lat_offset:
                block += w.field_varint(19, lat_offset & _U64)
            if lon_offset:
                block += w.field_varint(20, lon_offset & _U64)
            f.write(_blob_frame("OSMData", block, compress))
            blobs += 1

        if nodes is not None and nodes.num_rows:
            rows = nodes.to_pylist()
            for i in range(0, len(rows), nodes_per_block):
                emit_block(
                    lambda rs, st: _node_rows_to_group(
                        rs, st, dense, granularity, lat_offset, lon_offset, date_granularity
                    ),
                    rows[i : i + nodes_per_block],
                )
        if ways is not None and ways.num_rows:
            rows = ways.to_pylist()
            for i in range(0, len(rows), nodes_per_block):
                emit_block(
                    lambda rs, st: b"".join(
                        _way_to_msg(r, st, granularity, lat_offset, lon_offset, date_granularity)
                        for r in rs
                    ),
                    rows[i : i + nodes_per_block],
                )
        if relations is not None and relations.num_rows:
            rows = relations.to_pylist()
            for i in range(0, len(rows), nodes_per_block):
                emit_block(
                    lambda rs, st: b"".join(_relation_to_msg(r, st, date_granularity) for r in rs),
                    rows[i : i + nodes_per_block],
                )
    return blobs


def write_pbf_partitioned(nodes_ds, out_dir: str, *, compress: str = "zlib",
                          dense: bool = True) -> dict:
    """Resumable distributed PBF sink: one ``.osm.pbf`` per input block,
    committed atomically with per-partition lineage + metrics.

    Partition ids are ``<min_id>-<max_id>`` of the block's node ids — a
    deterministic function of the DATA, never of scheduling order — so a
    rerun over the same (deterministically partitioned) dataset skips
    completed partitions (the engine's write-layer contract, SURVEY §4;
    same commit-marker protocol as state/manifest.py: data + _COMMIT.json
    become visible in one directory rename). Never one giant file.
    """
    import json
    import uuid

    from pathlib import Path

    from osmpbf_ray.state.manifest import Manifest, table_checksum

    Manifest(out_dir)  # creates the directory

    def write_block(batch: pa.Table) -> pa.Table:
        result = {"partition_id": [], "rows": [], "skipped": []}
        if batch.num_rows:
            ids = batch.column("id").to_numpy()
            pid = f"{int(ids.min())}-{int(ids.max())}"
            out = Path(out_dir)
            final = out / f"part={pid}"
            if (final / "_COMMIT.json").exists():
                result["partition_id"].append(pid)
                result["rows"].append(0)
                result["skipped"].append(True)
            else:
                tmp = out / f".tmp-{pid}-{uuid.uuid4().hex[:8]}"
                tmp.mkdir(parents=True)
                try:
                    nblobs = write_pbf(str(tmp / "data.osm.pbf"), nodes=batch,
                                       compress=compress, dense=dense)
                    rec = {
                        "partition_id": pid,
                        "lineage": {"id_range": [int(ids.min()), int(ids.max())]},
                        "row_count": batch.num_rows,
                        "checksum": table_checksum(batch.select(["id"])),
                        "metrics": {"blobs": nblobs},
                    }
                    (tmp / "_COMMIT.json").write_text(json.dumps(rec) + "\n")
                    if final.exists():
                        import shutil

                        shutil.rmtree(final)
                    import os as _os

                    _os.rename(tmp, final)
                except BaseException:
                    import shutil

                    shutil.rmtree(tmp, ignore_errors=True)
                    raise
                result["partition_id"].append(pid)
                result["rows"].append(batch.num_rows)
                result["skipped"].append(False)
        return pa.table(
            {
                "partition_id": pa.array(result["partition_id"], type=pa.string()),
                "rows": pa.array(result["rows"], type=pa.int64()),
                "skipped": pa.array(result["skipped"], type=pa.bool_()),
            }
        )

    res = nodes_ds.map_batches(write_block, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return {
        "written": int((~res["skipped"]).sum()),
        "skipped": int(res["skipped"].sum()),
        "out_dir": out_dir,
    }


def read_pbf_partitioned_nodes(out_dir: str):
    """Read back every committed partition written by
    ``write_pbf_partitioned`` as one nodes Dataset."""
    from osmpbf_ray.state.manifest import Manifest

    paths = [
        str(Manifest(out_dir).out_dir / f"part={pid}" / "data.osm.pbf")
        for pid in sorted(Manifest(out_dir).completed())
    ]
    if not paths:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    return read_pbf_nodes(paths)


def mmap_blob_reader(path: str):
    """Zero-copy sequential blob iterator over a memory-mapped file —
    the engine twin of MmapBlobReader (/root/reference/src/mmap_blob.rs:
    123-242): yields ``(descriptor, payload)`` where raw payloads are
    memoryview SLICES of the mapping (no copy; zlib blobs decompress, as
    in the reference). Driver-side sequential use; within Ray the
    zero-copy analog is the object store + ``zero_copy_batch=True``.
    """
    import mmap as _mmap

    with open(path, "rb") as f:
        mm = _mmap.mmap(f.fileno(), 0, access=_mmap.ACCESS_READ)
    view = memoryview(mm)
    try:
        pos, end = 0, len(view)
        while pos < end:
            # same truncation guards as scan_blobs: a short header read
            # must raise the documented ValueError (not struct.error),
            # and a payload slice past EOF must not silently shorten
            if pos + 4 > end:
                raise ValueError("truncated blob header size")
            (hsize,) = struct.unpack(">I", view[pos : pos + 4])
            if hsize > MAX_HEADER_SIZE:
                raise ValueError(f"blob header exceeds {MAX_HEADER_SIZE} bytes")
            if pos + 4 + hsize > end:
                raise ValueError("truncated BlobHeader")
            btype, datasize, indexdata = _parse_blob_header(
                view[pos + 4 : pos + 4 + hsize])
            off = pos + 4 + hsize
            if off + datasize > end:
                raise ValueError(
                    f"truncated blob payload at offset {off}: "
                    f"needs {datasize} bytes, file has {end - off}")
            # raw payloads stay memoryview slices of the mapping —
            # consume within the loop (the mapping is unmapped after it)
            payload = decode_blob(view[off : off + datasize], copy=False)
            yield (
                {"path": path, "offset": off, "datasize": datasize,
                 "type": btype, "indexdata": indexdata},
                payload,
            )
            del payload
            pos = off + datasize
    finally:
        view.release()
        try:
            mm.close()
        except BufferError:
            pass  # consumer kept a payload slice alive; GC unmaps later
