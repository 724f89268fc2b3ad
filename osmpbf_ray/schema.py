"""Canonical Arrow schemas for the engine (SURVEY.md §1.2).

The reference's data hierarchy (Blob → PrimitiveBlock → element arrays,
/root/reference/src/proto/osmformat.proto:104-262) maps onto fixed Arrow
schemas: one logical table per element kind, plus the image+caption table
from BASELINE.json:input_hint and the polygon table for the spatial join.

Coordinate semantics follow the reference exactly
(/root/reference/src/elements.rs:84-111): storage is scaled integers,
``nano = offset + granularity * stored``; degrees are a derived float
(``nano * 1e-9``) and decimicro-degrees are ``nano / 100`` (integer).
"""

from __future__ import annotations

import pyarrow as pa

# --- element metadata struct (reference Info / DenseInfo,
#     /root/reference/src/elements.rs:568-626, src/dense.rs:187-316) ---
INFO_STRUCT = pa.struct(
    [
        ("version", pa.int32()),
        ("timestamp_ms", pa.int64()),
        ("changeset", pa.int64()),
        ("uid", pa.int32()),
        ("user", pa.string()),
        ("visible", pa.bool_()),  # default true when absent (elements.rs:616-619)
    ]
)

# Undecoded per-element Info as parsed off the wire (osmformat.proto:152-162):
# user is still a string-table index (user_sid) and timestamp is still in
# date_granularity units — the decode stage resolves both into INFO_STRUCT.
RAW_INFO_STRUCT = pa.struct(
    [
        ("version", pa.int32()),
        ("timestamp", pa.int64()),
        ("changeset", pa.int64()),
        ("uid", pa.int32()),
        ("user_sid", pa.int32()),
        ("visible", pa.bool_()),
    ]
)

# Tags: the reference stores string-table indices (osmformat.proto:129-137);
# we store resolved key/value pairs. list<struct> rather than map<> because
# pandas/duckdb round-trips of map columns are lossy.
TAGS_TYPE = pa.list_(pa.struct([("key", pa.string()), ("value", pa.string())]))

NODES_SCHEMA = pa.schema(
    [
        ("id", pa.int64()),
        ("lat", pa.float64()),
        ("lon", pa.float64()),
        ("nano_lat", pa.int64()),
        ("nano_lon", pa.int64()),
        ("tags", TAGS_TYPE),
        ("info", INFO_STRUCT),
    ]
)

WAYS_SCHEMA = pa.schema(
    [
        ("id", pa.int64()),
        ("refs", pa.list_(pa.int64())),  # order is semantic: [105,106,108,105]
        ("tags", TAGS_TYPE),
        ("info", INFO_STRUCT),
        # LocationsOnWays (osmformat.proto:235-239); null when feature absent
        (
            "locations",
            pa.list_(pa.struct([("nano_lat", pa.int64()), ("nano_lon", pa.int64())])),
        ),
    ]
)

# member_type enum (reference RelationMemberType, osmformat.proto:246-250)
MEMBER_NODE, MEMBER_WAY, MEMBER_RELATION = 0, 1, 2

RELATIONS_SCHEMA = pa.schema(
    [
        ("id", pa.int64()),
        (
            "members",
            pa.list_(
                pa.struct(
                    [
                        ("role", pa.string()),
                        ("member_id", pa.int64()),
                        ("member_type", pa.int8()),
                    ]
                )
            ),
        ),
        ("tags", TAGS_TYPE),
        ("info", INFO_STRUCT),
    ]
)

# --- delta-coded block table: the engine analog of a PBF PrimitiveBlock
#     with DenseNodes (osmformat.proto:197-219). One row = one block;
#     the decode stage cumsum-reconstructs ids/coords per block
#     (reference decoder: /root/reference/src/dense.rs:86-183). ---
BLOCKS_SCHEMA = pa.schema(
    [
        ("block_id", pa.int64()),
        ("kind", pa.string()),  # "header" | "dense" | "unknown" (blob type dispatch)
        ("id_delta", pa.list_(pa.int64())),
        ("lat_delta", pa.list_(pa.int64())),
        ("lon_delta", pa.list_(pa.int64())),
        ("keys_vals", pa.list_(pa.int32())),  # flattened ((k v)* 0)* indices
        ("stringtable", pa.list_(pa.binary())),  # index 0 reserved blank
        ("granularity", pa.int32()),  # default 100 nanodegrees
        ("lat_offset", pa.int64()),
        ("lon_offset", pa.int64()),
        ("date_granularity", pa.int32()),  # default 1000 ms
        # DenseInfo columns (delta-coded like the reference src/dense.rs:299-302)
        ("version", pa.list_(pa.int32())),
        ("timestamp_delta", pa.list_(pa.int64())),
        ("changeset_delta", pa.list_(pa.int64())),
        ("uid_delta", pa.list_(pa.int32())),
        ("user_sid_delta", pa.list_(pa.int32())),
        ("visible", pa.list_(pa.bool_())),
        # HeaderBlock metadata (reference src/block.rs:21-85); populated
        # only on kind="header" rows, null elsewhere. Bbox is nanodegrees
        # (degree = value * 1e-9, src/block.rs:21-28); feature lists are
        # order-insensitive sets (tests/read.rs:80-102); replication
        # state is the engine's resumable-watermark hook (block.rs:61-85)
        (
            "header",
            pa.struct(
                [
                    ("bbox_left", pa.int64()),
                    ("bbox_right", pa.int64()),
                    ("bbox_top", pa.int64()),
                    ("bbox_bottom", pa.int64()),
                    ("required_features", pa.list_(pa.string())),
                    ("optional_features", pa.list_(pa.string())),
                    ("writingprogram", pa.string()),
                    ("source", pa.string()),
                    ("osmosis_replication_timestamp", pa.int64()),
                    ("osmosis_replication_sequence_number", pa.int64()),
                    ("osmosis_replication_base_url", pa.string()),
                ]
            ),
        ),
    ]
)

HEADER_STRUCT = BLOCKS_SCHEMA.field("header").type

# --- way / relation blocks: per-message elements with packed delta
#     arrays (reference src/proto/osmformat.proto:222-262). One row = one
#     element; refs / member ids are delta-coded within the row exactly
#     like the reference's stateful iterators decode them
#     (WayRefIter src/elements.rs:335-343, RelMemberIter 487-500,
#     WayNodeLocationsIter 404-416). keys/vals are parallel string-table
#     index arrays (src/elements.rs:515-538). ---
WAY_BLOCKS_SCHEMA = pa.schema(
    [
        ("block_id", pa.int64()),
        ("id", pa.int64()),
        ("refs_delta", pa.list_(pa.int64())),
        ("keys", pa.list_(pa.int32())),
        ("vals", pa.list_(pa.int32())),
        # LocationsOnWays (optional feature): delta-coded stored units
        ("lat_delta", pa.list_(pa.int64())),
        ("lon_delta", pa.list_(pa.int64())),
        ("stringtable", pa.list_(pa.binary())),
        ("granularity", pa.int32()),
        ("lat_offset", pa.int64()),
        ("lon_offset", pa.int64()),
        ("date_granularity", pa.int32()),
        ("info", RAW_INFO_STRUCT),  # null when the file carries no way Info
    ]
)

REL_BLOCKS_SCHEMA = pa.schema(
    [
        ("block_id", pa.int64()),
        ("id", pa.int64()),
        ("roles_sid", pa.list_(pa.int32())),
        ("memids_delta", pa.list_(pa.int64())),
        ("types", pa.list_(pa.int8())),  # 0=node 1=way 2=relation
        ("keys", pa.list_(pa.int32())),
        ("vals", pa.list_(pa.int32())),
        ("stringtable", pa.list_(pa.binary())),
        ("date_granularity", pa.int32()),
        ("info", RAW_INFO_STRUCT),
    ]
)

# --- image + caption table (BASELINE.json:input_hint, exact shape) ---
IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),  # "png" (lossless) | "jpeg" (lossy)
        ("caption", pa.string()),
        ("phash", pa.int64()),
        # derived join columns
        ("lat", pa.float64()),
        ("lon", pa.float64()),
    ]
)

AUDIO_SCHEMA = pa.schema(
    [
        ("audio_id", pa.int64()),
        ("pcm", pa.binary()),  # opaque payload: little-endian 16-bit PCM
        ("codec", pa.string()),  # "pcm_s16le" | (stubbed: "mp3"/"ogg"/...)
        ("sr", pa.int64()),  # sample rate, Hz
        ("n_samples", pa.int64()),
    ]
)

VIDEO_SCHEMA = pa.schema(
    [
        ("video_id", pa.int64()),
        ("frames", pa.binary()),  # opaque payload: n_frames raw gray8 frames
        ("codec", pa.string()),  # "rawvideo_gray8" | (stubbed: "h264"/...)
        ("n_frames", pa.int64()),
        ("h", pa.int64()),
        ("w", pa.int64()),
        ("fps", pa.int64()),
    ]
)

POLYGONS_SCHEMA = pa.schema(
    [
        ("poly_id", pa.int64()),
        # closed ring, first == last (like way 107's refs [105,106,108,105])
        ("ring", pa.list_(pa.struct([("lat", pa.float64()), ("lon", pa.float64())]))),
        ("tags", TAGS_TYPE),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
