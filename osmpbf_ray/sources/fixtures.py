"""Deterministic fixture generators (FIXTURES.md; seed fixed, no wall-clock).

Four families:
* golden 5-element world — the reference's canonical test fixture
  (/root/reference/tests/test.osm:1-18, asserted in tests/read.rs:105-204):
  3 nodes + 1 way + 1 relation with exact nano-degree coordinates.
* delta-coded block table — engine analog of PBF PrimitiveBlocks with
  DenseNodes (delta arrays + string table + codec params,
  /root/reference/src/proto/osmformat.proto:197-219) for the cumsum
  decode stage.
* image + caption table — BASELINE.json:input_hint shape, with synthetic
  PNG (lossless) / lossy bytes, computed phash, injected near-duplicates,
  and skewed lat/lon (~80% of rows in a few dense "urban" cells).
* polygon table — closed rings for the spatial join, a known subset
  tagged ("building","yes") mirroring the reference's semi-join filter
  (/root/reference/examples/indexed.rs:19-22).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osmpbf_ray import schema
from osmpbf_ray.stages import image as img

SEED = 42

# --- golden world (exact values from /root/reference/tests/read.rs) --------

GOLDEN_NODE_IDS = [105, 106, 108]
GOLDEN_NANO_LAT = [52122403100, 52119923500, 52119899100]
GOLDEN_NANO_LON = [11628401700, 11625644600, 11631019200]
GOLDEN_WAY_REFS = [105, 106, 108, 105]  # order is semantic


def _info(version=1, uid=17, user="testuser", visible=True, timestamp_ms=0, changeset=0):
    return {
        "version": version,
        "timestamp_ms": timestamp_ms,
        "changeset": changeset,
        "uid": uid,
        "user": user,
        "visible": visible,
    }


def _tags(d: dict[str, str]):
    return [{"key": k, "value": v} for k, v in d.items()]


def golden_nodes() -> pa.Table:
    return pa.Table.from_pylist(
        [
            {
                "id": i,
                "lat": nla * 1e-9,
                "lon": nlo * 1e-9,
                "nano_lat": nla,
                "nano_lon": nlo,
                "tags": [],
                "info": _info(),
            }
            for i, nla, nlo in zip(GOLDEN_NODE_IDS, GOLDEN_NANO_LAT, GOLDEN_NANO_LON)
        ],
        schema=schema.NODES_SCHEMA,
    )


def golden_ways(with_locations: bool = False) -> pa.Table:
    locations = None
    if with_locations:  # LocationsOnWays variant (tests/read.rs:343-420)
        by_id = dict(zip(GOLDEN_NODE_IDS, zip(GOLDEN_NANO_LAT, GOLDEN_NANO_LON)))
        locations = [
            {"nano_lat": by_id[r][0], "nano_lon": by_id[r][1]} for r in GOLDEN_WAY_REFS
        ]
    return pa.Table.from_pylist(
        [
            {
                "id": 107,
                "refs": GOLDEN_WAY_REFS,
                "tags": _tags({"building": "yes", "name": "triangle"}),
                "info": _info(),
                "locations": locations,
            }
        ],
        schema=schema.WAYS_SCHEMA,
    )


def golden_relations() -> pa.Table:
    return pa.Table.from_pylist(
        [
            {
                "id": 120,
                "members": [
                    {
                        "role": "test_role",
                        "member_id": 107,
                        "member_type": schema.MEMBER_WAY,
                    }
                ],
                "tags": _tags({"rel_key": "rel_value"}),
                "info": _info(),
            }
        ],
        schema=schema.RELATIONS_SCHEMA,
    )


def history_nodes() -> pa.Table:
    """2 nodes, first deleted — the deleted_nodes.osh.pbf analog
    (tests/read.rs:322-340)."""
    rows = [
        {
            "id": 1,
            "lat": 0.0,
            "lon": 0.0,
            "nano_lat": 0,
            "nano_lon": 0,
            "tags": [],
            "info": _info(visible=False),
        },
        {
            "id": 1,
            "lat": 1e-7,
            "lon": 1e-7,
            "nano_lat": 100,
            "nano_lon": 100,
            "tags": [],
            "info": _info(version=2, visible=True),
        },
    ]
    return pa.Table.from_pylist(rows, schema=schema.NODES_SCHEMA)


# --- delta-coded block table ------------------------------------------------

_VOCAB = [b"", b"building", b"yes", b"highway", b"residential", b"name",
          b"amenity", b"cafe", b"shop", b"bakery"]  # index 0 reserved blank


def make_delta_blocks(
    n_blocks: int = 8,
    nodes_per_block: int = 8000,
    seed: int = SEED,
    tagged_frac: float = 0.1,
    with_unknown: bool = True,
    with_header: bool = False,
) -> pa.Table:
    """Delta-coded blocks whose cumsum decode yields a deterministic world.

    Ids are strictly increasing across blocks (the Sort.Type_then_ID
    convention the reference exploits for id-range pruning,
    /root/reference/README.md:105-109); deltas reset per block exactly as
    in the reference (each PrimitiveBlock is self-contained).
    """
    rng = np.random.default_rng(seed)
    rows = []
    if with_header:
        # HeaderBlock analog (reference src/block.rs:21-85): bbox in
        # nanodegrees, feature strings, replication watermark
        rows.append(
            {
                "block_id": -1,
                "kind": "header",
                "id_delta": [], "lat_delta": [], "lon_delta": [], "keys_vals": [],
                "stringtable": [], "granularity": 100, "lat_offset": 0,
                "lon_offset": 0, "date_granularity": 1000, "version": [],
                "timestamp_delta": [], "changeset_delta": [], "uid_delta": [],
                "user_sid_delta": [], "visible": [],
                "header": {
                    "bbox_left": -10_000_000_000,
                    "bbox_right": 20_000_000_000,
                    "bbox_top": 60_000_000_000,
                    "bbox_bottom": 40_000_000_000,
                    "required_features": ["OsmSchema-V0.6", "DenseNodes"],
                    "optional_features": ["Sort.Type_then_ID"],
                    "writingprogram": "osmpbf_ray-fixture",
                    "source": "synthetic",
                    "osmosis_replication_timestamp": 1_700_000_000,
                    "osmosis_replication_sequence_number": 273,
                    "osmosis_replication_base_url": "https://example.org/replication",
                },
            }
        )
    next_id = 1
    for b in range(n_blocks):
        n = nodes_per_block
        ids = next_id + np.sort(rng.choice(np.arange(n * 4), size=n, replace=False))
        next_id = int(ids[-1]) + 1
        # coords in a bbox, stored units (granularity 100 => nano = 100*v)
        lat_s = rng.integers(400_000_000, 600_000_000, n)  # 40..60 deg
        lon_s = rng.integers(-100_000_000, 200_000_000, n)  # -10..20 deg
        tagged = rng.random(n) < tagged_frac
        kv = []
        for t in tagged:
            if t:
                k = int(rng.integers(1, len(_VOCAB) - 1, endpoint=False))
                # pair keys with the following vocab entry as value
                v = k + 1 if k + 1 < len(_VOCAB) else 1
                kv.extend([k, v])
            kv.append(0)  # node delimiter
        ts = rng.integers(1_500_000, 1_700_000, n)  # seconds-scale, date_granularity=1000
        rows.append(
            {
                "block_id": b,
                "kind": "dense",
                "id_delta": np.diff(ids, prepend=0).tolist(),
                "lat_delta": np.diff(lat_s, prepend=0).tolist(),
                "lon_delta": np.diff(lon_s, prepend=0).tolist(),
                "keys_vals": kv,
                "stringtable": list(_VOCAB),
                "granularity": 100,
                "lat_offset": 0,
                "lon_offset": 0,
                "date_granularity": 1000,
                "version": [1] * n,
                "timestamp_delta": np.diff(ts, prepend=0).tolist(),
                "changeset_delta": [1] + [0] * (n - 1),
                "uid_delta": [17] + [0] * (n - 1),
                "user_sid_delta": [0] * n,
                "visible": [True] * n,
            }
        )
    if with_unknown:
        # unknown blob types must be skipped, not fail (blob.rs:27-29)
        rows.append(
            {
                "block_id": n_blocks,
                "kind": "unknown",
                "id_delta": [],
                "lat_delta": [],
                "lon_delta": [],
                "keys_vals": [],
                "stringtable": [],
                "granularity": 100,
                "lat_offset": 0,
                "lon_offset": 0,
                "date_granularity": 1000,
                "version": [],
                "timestamp_delta": [],
                "changeset_delta": [],
                "uid_delta": [],
                "user_sid_delta": [],
                "visible": [],
            }
        )
    return pa.Table.from_pylist(rows, schema=schema.BLOCKS_SCHEMA)


_WAY_VOCAB = [b"", b"building", b"yes", b"name", b"triangle", b"test_role", b"highway", b"primary"]


def make_way_blocks(n_random: int = 20, seed: int = SEED, with_locations: bool = False) -> pa.Table:
    """Delta-coded way rows; row 0 is the golden way 107 whose decoded
    refs must be exactly [105, 106, 108, 105] with tags building=yes,
    name=triangle (reference tests/read.rs:160-168)."""
    rng = np.random.default_rng(seed + 7)
    # locations of refs [105, 106, 108, 105] = the golden NODE coords
    # (reference tests/read.rs:371-390 asserts exactly these values for
    # way 107's LocationsOnWays — lon 11628401700 etc., not ad-hoc ones)
    _by_id = dict(zip(GOLDEN_NODE_IDS, zip(GOLDEN_NANO_LAT, GOLDEN_NANO_LON)))
    golden_nano = [_by_id[i] for i in GOLDEN_WAY_REFS]
    rows = [
        {
            "block_id": 0,
            "id": 107,
            "refs_delta": [105, 1, 2, -3],  # decodes to [105,106,108,105]
            "keys": [1, 3],
            "vals": [2, 4],
            "lat_delta": _deltas([la for la, _ in golden_nano]) if with_locations else [],
            "lon_delta": _deltas([lo for _, lo in golden_nano]) if with_locations else [],
            "stringtable": list(_WAY_VOCAB),
            "granularity": 1,
            "lat_offset": 0,
            "lon_offset": 0,
        }
    ]
    next_ref = 1000
    for i in range(n_random):
        nref = int(rng.integers(2, 8))
        refs = next_ref + np.sort(rng.choice(np.arange(nref * 3), nref, replace=False))
        next_ref = int(refs[-1]) + 1
        rows.append(
            {
                "block_id": 1 + i // 8,
                "id": 200 + i,
                "refs_delta": _deltas(refs.tolist()),
                "keys": [6],
                "vals": [7],
                "lat_delta": [],
                "lon_delta": [],
                "stringtable": list(_WAY_VOCAB),
                "granularity": 100,
                "lat_offset": 0,
                "lon_offset": 0,
            }
        )
    return pa.Table.from_pylist(rows, schema=schema.WAY_BLOCKS_SCHEMA)


def make_relation_blocks(n_random: int = 10, seed: int = SEED) -> pa.Table:
    """Delta-coded relations; row 0 is the golden relation referencing
    way 107 with role test_role (reference tests/read.rs:231-247)."""
    rng = np.random.default_rng(seed + 11)
    rows = [
        {
            "block_id": 0,
            "id": 110,
            "roles_sid": [5],
            "memids_delta": [107],
            "types": [schema.MEMBER_WAY],
            "keys": [],
            "vals": [],
            "stringtable": list(_WAY_VOCAB),
        }
    ]
    for i in range(n_random):
        nm = int(rng.integers(1, 5))
        memids = rng.integers(1, 500, nm).tolist()
        rows.append(
            {
                "block_id": 1,
                "id": 300 + i,
                "roles_sid": [5] * nm,
                "memids_delta": _deltas(memids),
                "types": rng.integers(0, 3, nm).astype("int8").tolist(),
                "keys": [1],
                "vals": [2],
                "stringtable": list(_WAY_VOCAB),
            }
        )
    return pa.Table.from_pylist(rows, schema=schema.REL_BLOCKS_SCHEMA)


def _deltas(values: list[int]) -> list[int]:
    return np.diff(np.asarray(values, dtype=np.int64), prepend=0).tolist()


# --- image + caption table --------------------------------------------------

# dense "urban" anchor cells for skew (FIXTURES.md §3)
_URBAN = [(52.52, 13.40), (48.85, 2.35), (40.71, -74.00), (35.68, 139.69)]


def _synth_pixels(rng: np.random.Generator, h: int, w: int, i: int) -> np.ndarray:
    """Seeded RGB gradient + noise — structured enough for phash stability."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = (
        (xx * (1 + i % 5) * 255 // max(w, 1) // 5)[:, :, None]
        + (yy * (1 + i % 3) * 255 // max(h, 1) // 3)[:, :, None] * np.array([1, 2, 3])
    )
    noise = rng.integers(0, 24, (h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def make_images(
    n: int = 200, seed: int = SEED, dup_frac: float = 0.01, skew_frac: float = 0.8
) -> pa.Table:
    """Image+caption table per BASELINE.json:input_hint.

    ~``dup_frac`` of rows are near-duplicates (same pixels re-encoded
    lossily → same/near phash) for dedup tests; ~``skew_frac`` of rows
    cluster in a few dense urban cells to exercise skew salting.
    """
    rng = np.random.default_rng(seed)
    sizes = np.array([16, 32, 64])
    rows = []
    for i in range(n):
        dup_of = None
        if i > 0 and rng.random() < dup_frac:
            dup_of = int(rng.integers(0, i))
        if dup_of is not None:
            src = rows[dup_of]
            h, w = src["h"], src["w"]
            px = src["_px"]
            fmt = "jpeg"  # re-encoded duplicate
        else:
            h = int(sizes[rng.integers(0, 3)])
            w = int(sizes[rng.integers(0, 3)])
            px = _synth_pixels(rng, h, w, i)
            fmt = "png" if rng.random() < 0.5 else "jpeg"
        data = img.encode_png(px) if fmt == "png" else img.encode_lossy(px, 0.6)
        decoded = px if fmt == "png" else img.decode_lossy(data)
        ph = img.phash64(decoded)
        if rng.random() < skew_frac:
            alat, alon = _URBAN[int(rng.integers(0, len(_URBAN)))]
            lat = alat + float(rng.normal(0, 0.02))
            lon = alon + float(rng.normal(0, 0.02))
        else:
            lat = float(rng.uniform(-60, 70))
            lon = float(rng.uniform(-179, 179))
        rows.append(
            {
                "image_id": f"img{i:012d}",
                "bytes": data,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": f"synthetic scene {i} near ({lat:.3f},{lon:.3f})",
                "phash": ph,
                "lat": lat,
                "lon": lon,
                "_px": px,
            }
        )
    for r in rows:
        r.pop("_px")
    return pa.Table.from_pylist(rows, schema=schema.IMAGES_SCHEMA)


# --- polygon table ----------------------------------------------------------


def make_polygons(n: int = 30, seed: int = SEED) -> pa.Table:
    """Closed rings: small triangles/quads near urban anchors + a few
    large polygons covering dense cells. A known subset carries
    ("building","yes") for the filter+join golden."""
    rng = np.random.default_rng(seed + 1)
    rows = []
    for i in range(n):
        if i < len(_URBAN):  # large polygons over each urban anchor
            alat, alon = _URBAN[i]
            r = 0.08
        else:
            alat = float(rng.uniform(-55, 65))
            alon = float(rng.uniform(-170, 170))
            r = float(rng.uniform(0.01, 0.05))
        nv = int(rng.integers(3, 6))
        angles = np.sort(rng.uniform(0, 2 * np.pi, nv))
        ring = [
            {"lat": alat + r * float(np.sin(a)), "lon": alon + r * float(np.cos(a))}
            for a in angles
        ]
        ring.append(ring[0])  # close the ring
        tags = (
            [{"key": "building", "value": "yes"}]
            if i % 3 == 0
            else [{"key": "landuse", "value": "park"}]
        )
        rows.append({"poly_id": i, "ring": ring, "tags": tags})
    return pa.Table.from_pylist(rows, schema=schema.POLYGONS_SCHEMA)


# --- audio table ------------------------------------------------------------


def make_audio(n: int = 64, n_samples: int = 2048, sr: int = 16000,
               codec: str = "pcm_s16le") -> pa.Table:
    """Audio table: opaque little-endian int16 PCM payload + typed
    metadata, per the multimodal-column contract (schema.AUDIO_SCHEMA).

    Sample j of clip i is ``splitmix64(i * 2^32 + j) % 2^16 - 32768`` —
    deterministic under any partitioning AND integer-exactly
    reproducible in DuckDB via the shared splitmix64 CTE, so per-window
    features computed from the DECODED BYTES can be hash-compared
    against an oracle that re-derives the samples from first principles
    (queries.q_audio_features)."""
    from osmpbf_ray.stages.text import splitmix64

    ids = np.arange(n, dtype=np.uint64)
    keys = (ids[:, None] << np.uint64(32)) + np.arange(n_samples, dtype=np.uint64)[None, :]
    samples = (splitmix64(keys) & np.uint64(0xFFFF)).astype(np.int64) - 32768
    if codec == "mulaw_u8":
        # the SAME splitmix samples, G.711-companded — the compressed-
        # codec twin of the PCM table (1 byte/sample on the wire)
        from osmpbf_ray.stages.audio import mulaw_encode

        pcm = mulaw_encode(samples.astype(np.int16)).tobytes()
        step = n_samples
    elif codec == "pcm_s16le":
        pcm = samples.astype("<i2").tobytes()
        step = 2 * n_samples
    else:
        raise ValueError(f"unsupported fixture codec {codec!r}")
    return pa.table(
        {
            "audio_id": ids.astype(np.int64),
            "pcm": pa.array([pcm[i * step:(i + 1) * step] for i in range(n)],
                            type=pa.binary()),
            "codec": pa.array([codec] * n),
            "sr": pa.array([sr] * n, type=pa.int64()),
            "n_samples": pa.array([n_samples] * n, type=pa.int64()),
        },
        schema=schema.AUDIO_SCHEMA,
    )


# --- video table ------------------------------------------------------------


def make_video(n: int = 48, n_frames: int = 16, h: int = 16, w: int = 16,
               codec: str = "rawvideo_gray8") -> pa.Table:
    """Video table: opaque raw-gray8 frame payload + typed metadata
    (schema.VIDEO_SCHEMA). Pixel p of frame f of clip i is
    ``splitmix64((i*64 + f)*4096 + p) % 256`` — deterministic under any
    partitioning AND integer-exactly reproducible in DuckDB, so
    per-frame features computed from the DECODED BYTES hash-compare
    against a first-principles oracle (queries.q_video_frame_stats).
    Requires n_frames <= 64 and h*w <= 4096 (key-packing bounds)."""
    from osmpbf_ray.stages.text import splitmix64

    assert n_frames <= 64 and h * w <= 4096
    ids = np.arange(n, dtype=np.uint64)
    keys = ((ids[:, None] * np.uint64(64)
             + np.arange(n_frames, dtype=np.uint64)[None, :])[:, :, None]
            * np.uint64(4096)
            + np.arange(h * w, dtype=np.uint64)[None, None, :])
    px = (splitmix64(keys) % np.uint64(256)).astype(np.uint8)
    flat = px.reshape(n, -1)
    if codec == "rawvideo_gray8":
        payloads = [flat[i].tobytes() for i in range(n)]
    elif codec == "zraw_gray8":
        from osmpbf_ray.stages.video import encode_zraw

        payloads = [encode_zraw(flat[i]) for i in range(n)]
    elif codec == "ldcv1":
        from osmpbf_ray.stages.video import encode_ldcv

        payloads = [encode_ldcv(px[i], h, w) for i in range(n)]
    else:
        raise ValueError(f"unsupported fixture codec {codec!r}")
    return pa.table(
        {
            "video_id": ids.astype(np.int64),
            "frames": pa.array(payloads, type=pa.binary()),
            "codec": pa.array([codec] * n),
            "n_frames": pa.array([n_frames] * n, type=pa.int64()),
            "h": pa.array([h] * n, type=pa.int64()),
            "w": pa.array([w] * n, type=pa.int64()),
            "fps": pa.array([8] * n, type=pa.int64()),
        },
        schema=schema.VIDEO_SCHEMA,
    )
