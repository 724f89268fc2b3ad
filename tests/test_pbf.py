"""Real .osm.pbf container conformance: write → scan → decompress →
parse → decode through Ray Data, matching the reference's golden-world
assertions (/root/reference/tests/read.rs:105-204, 270-292) and its
encoding-invariance matrix (tests/read.rs:15-31: zlib+dense, raw+dense,
raw+plain-nodes must yield identical logical content)."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from osmpbf_ray import schema
from osmpbf_ray.sources import fixtures, pbf
from osmpbf_ray.sources import pbwire as w
from osmpbf_ray.stages import decode


# --- wire codec -------------------------------------------------------------


def test_varint_roundtrip():
    rng = np.random.default_rng(0)
    vals = np.concatenate(
        [
            rng.integers(0, 2**63, 1000, dtype=np.int64).view(np.uint64),
            np.array([0, 1, 127, 128, 16383, 16384, 2**64 - 1], dtype=np.uint64),
        ]
    )
    assert (w.decode_varints(w.encode_varints(vals)) == vals).all()


def test_zigzag_roundtrip():
    s = np.array([0, -1, 1, -2, 2, 2**62, -(2**62)], dtype=np.int64)
    assert (w.zigzag_decode(w.zigzag_encode(s)) == s).all()


def test_truncated_varint_raises():
    with pytest.raises(ValueError):
        w.decode_varints(b"\x80\x80")  # continuation bit never clears


# --- golden world, all encodings --------------------------------------------


def _write_golden(tmp_path, compress, dense):
    path = str(tmp_path / f"golden_{compress}_{dense}.osm.pbf")
    pbf.write_pbf(
        path,
        nodes=fixtures.golden_nodes(),
        ways=fixtures.golden_ways(),
        relations=fixtures.golden_relations(),
        compress=compress,
        dense=dense,
        header={
            "bbox_left": -10_000_000_000,
            "bbox_right": 20_000_000_000,
            "bbox_top": 60_000_000_000,
            "bbox_bottom": 40_000_000_000,
            "osmosis_replication_sequence_number": 273,
        },
    )
    return path


@pytest.mark.parametrize("compress,dense", [("zlib", True), ("raw", True), ("raw", False), ("zlib", False)])
def test_golden_world_roundtrip(tmp_path, compress, dense):
    """Same logical content whatever the encoding (tests/read.rs:15-31)."""
    path = _write_golden(tmp_path, compress, dense)
    nodes = pbf.read_pbf_nodes(path).to_pandas().sort_values("id")
    assert nodes["id"].tolist() == [105, 106, 108]
    assert nodes["nano_lat"].tolist() == fixtures.GOLDEN_NANO_LAT
    assert nodes["nano_lon"].tolist() == fixtures.GOLDEN_NANO_LON
    # degree precision 1e-6 like tests/read.rs:75-77; nano exact above
    assert abs(nodes["lat"].iloc[0] - 52.1224031) < 1e-6
    info = nodes["info"].iloc[0]
    assert info["user"] == "testuser" and info["visible"] and info["version"] == 1

    ways = pbf.read_pbf_ways(path).to_pandas()
    assert ways["id"].tolist() == [107]
    assert list(ways["refs"].iloc[0]) == [105, 106, 108, 105]  # order semantic
    tags = {t["key"]: t["value"] for t in ways["tags"].iloc[0]}
    assert tags == {"building": "yes", "name": "triangle"}

    rels = pbf.read_pbf_relations(path).to_pandas()
    m = rels["members"].iloc[0][0]
    assert m["role"] == "test_role" and m["member_id"] == 107 and m["member_type"] == schema.MEMBER_WAY


def test_header_metadata(tmp_path):
    path = _write_golden(tmp_path, "zlib", True)
    hdr = pbf.read_pbf_header(path)
    assert abs(hdr["bbox"]["left"] + 10.0) < 1e-12
    assert abs(hdr["bbox"]["top"] - 60.0) < 1e-12
    assert "OsmSchema-V0.6" in hdr["required_features"]
    assert "DenseNodes" in hdr["required_features"]
    assert hdr["replication"]["sequence_number"] == 273
    assert hdr["writingprogram"] == "osmpbf_ray"


def test_count_five_elements_via_pbf(tmp_path):
    """5 elements total, sequential == parallel (tests/read.rs:270-292)."""
    path = _write_golden(tmp_path, "zlib", True)
    n = (
        pbf.read_pbf_nodes(path).count()
        + pbf.read_pbf_ways(path).count()
        + pbf.read_pbf_relations(path).count()
    )
    assert n == 5


def test_scan_blobs_offsets(tmp_path):
    """Header-only scan: types and seekable offsets (blob.rs:402-428)."""
    path = _write_golden(tmp_path, "raw", True)
    descs = pbf.scan_blobs(path)
    assert descs[0]["type"] == "OSMHeader"
    assert all(d["type"] == "OSMData" for d in descs[1:])
    # random access: decode the LAST data blob directly from its offset
    d = descs[-1]
    block = pbf.parse_primitive_block(pbf._read_payload(path, d["offset"], d["datasize"]))
    assert block["groups"]


def test_unknown_blob_type_skipped(tmp_path):
    """Unknown blob types are skipped, never an error (blob.rs:27-29)."""
    path = _write_golden(tmp_path, "zlib", True)
    with open(path, "ab") as f:
        f.write(pbf._blob_frame("SomeFutureType", b"\x0a\x00", "raw"))
    descs = pbf.scan_blobs(path)
    assert descs[-1]["type"] == "SomeFutureType"
    assert pbf.read_pbf_nodes(path).count() == 3  # unchanged


def test_unsupported_compression_raises():
    blob = w.field_len(6, b"xxxx")  # lz4_data (no stdlib decoder)
    with pytest.raises(ValueError, match="unsupported blob compression"):
        pbf.decode_blob(blob)


def test_lzma_bzip2_blob_roundtrip(tmp_path):
    """lzma and bzip2 blob codecs (fileformat.proto:41-49) decode
    natively via the stdlib — the reference errors on both
    (src/blob.rs:463-465); the engine reads them. Framed write →
    element read roundtrip per codec, plus the expansion bound."""
    import lzma

    for codec in ("lzma", "bzip2"):
        path = str(tmp_path / f"g_{codec}.osm.pbf")
        pbf.write_pbf(path, nodes=fixtures.golden_nodes(), compress=codec)
        nodes = pbf.read_pbf_nodes(path)
        assert nodes.count() == 3
        ids = sorted(r["id"] for r in nodes.take_all())
        assert ids == sorted(n["id"] for n in fixtures.golden_nodes().to_pylist())
    # a blob whose decompressed size exceeds the 32 MiB bound must raise
    big = lzma.compress(b"\x00" * (pbf.MAX_BLOB_MESSAGE_SIZE + 1))
    with pytest.raises(ValueError, match="oversized lzma"):
        pbf.decode_blob(w.field_len(4, big))


def test_locations_on_ways_roundtrip(tmp_path):
    path = str(tmp_path / "locs.osm.pbf")
    pbf.write_pbf(
        path,
        ways=fixtures.golden_ways(with_locations=True),
        header={"optional_features": ["LocationsOnWays"]},
    )
    assert "LocationsOnWays" in pbf.read_pbf_header(path)["optional_features"]
    ways = pbf.read_pbf_ways(path).to_pandas()
    locs = ways["locations"].iloc[0]
    ref_order = [0, 1, 2, 0]  # refs [105, 106, 108, 105]
    assert [l["nano_lat"] for l in locs] == [
        fixtures.GOLDEN_NANO_LAT[i] for i in ref_order]
    # lons too: reference tests/read.rs:371-390 asserts BOTH axes
    assert [l["nano_lon"] for l in locs] == [
        fixtures.GOLDEN_NANO_LON[i] for i in ref_order]


def test_history_visible_roundtrip(tmp_path):
    """deleted_nodes.osh.pbf analog: visible false survives the container
    (tests/read.rs:322-340). Plain encoding — dense delta ids assume
    distinct elements; history files carry versions of the same id."""
    path = str(tmp_path / "hist.osm.pbf")
    pbf.write_pbf(path, nodes=fixtures.history_nodes(), dense=False,
                  header={"required_features": ["OsmSchema-V0.6", "HistoricalInformation"]})
    nodes = pbf.read_pbf_nodes(path).to_pandas().sort_values("nano_lat")
    assert [i["visible"] for i in nodes["info"]] == [False, True]
    assert [i["version"] for i in nodes["info"]] == [1, 2]


def test_larger_world_parallel_decode(tmp_path):
    """Multi-blob file through the Ray path; ids/coords exact."""
    n = 30_000
    ids = np.arange(1, n + 1, dtype=np.int64) * 7
    nano_lat = ((ids * 37) % 120_000_000_000) - 60_000_000_000
    nano_lat -= nano_lat % 100  # granularity-100 exact
    nano_lon = ((ids * 91) % 360_000_000_000) - 180_000_000_000
    nano_lon -= nano_lon % 100
    nodes = pa.table(
        {
            "id": ids,
            "lat": nano_lat * 1e-9,
            "lon": nano_lon * 1e-9,
            "nano_lat": nano_lat,
            "nano_lon": nano_lon,
            "tags": pa.array([[]] * n, type=schema.NODES_SCHEMA.field("tags").type),
            "info": pa.nulls(n, type=schema.INFO_STRUCT),
        },
        schema=schema.NODES_SCHEMA,
    )
    path = str(tmp_path / "big.osm.pbf")
    nblobs = pbf.write_pbf(path, nodes=nodes, nodes_per_block=4096)
    assert nblobs == 1 + (n + 4095) // 4096
    out = pa.concat_tables(ray.get(pbf.read_pbf_nodes(path).to_arrow_refs())).sort_by("id")
    assert out.num_rows == n
    assert (out.column("id").to_numpy() == ids).all()
    assert (out.column("nano_lat").to_numpy() == nano_lat).all()
    assert (out.column("nano_lon").to_numpy() == nano_lon).all()


def _sorted_world(tmp_path, n=20_000, per_block=2048):
    """Sort.Type_then_ID-style world: ids increase across blocks, so the
    id-range zone map prunes effectively (reference README.md:105-109)."""
    ids = np.arange(1, n + 1, dtype=np.int64) * 5
    nano = (ids % 1_000_000) * 100
    nodes = pa.table(
        {
            "id": ids,
            "lat": nano * 1e-9,
            "lon": nano * 1e-9,
            "nano_lat": nano,
            "nano_lon": nano,
            "tags": pa.array([[]] * n, type=schema.NODES_SCHEMA.field("tags").type),
            "info": pa.nulls(n, type=schema.INFO_STRUCT),
        },
        schema=schema.NODES_SCHEMA,
    )
    path = str(tmp_path / "sorted.osm.pbf")
    pbf.write_pbf(path, nodes=nodes, nodes_per_block=per_block)
    return path, ids


def test_pbf_index_pruned_scan(tmp_path):
    """Pruned read == full-scan filter, while actually skipping blobs
    (IndexedReader semantics, indexed.rs:264-330)."""
    from osmpbf_ray.sources.pbf_index import PbfIndex

    path, ids = _sorted_world(tmp_path)
    idx = PbfIndex(path)
    ranges = idx.id_ranges()
    assert ranges.num_rows == len(idx.data_blobs)
    keys = np.array([5, 10240 * 5, 19999 * 5, 123])  # 123 matches nothing
    surviving = idx.prune_offsets(keys)
    assert 0 < len(surviving) < len(idx.data_blobs)  # real pruning
    got = sorted(idx.read_nodes_pruned(keys).to_pandas()["id"])
    assert got == sorted(set(keys.tolist()) & set(ids.tolist()))


def test_pbf_index_blob_from_offset(tmp_path):
    from osmpbf_ray.sources.pbf_index import PbfIndex

    path, ids = _sorted_world(tmp_path, n=5000, per_block=1024)
    idx = PbfIndex(path)
    d = idx.data_blobs[2]  # third node blob → ids 2048*5+5 ...
    tbl = idx.blob_from_offset(d["offset"])
    assert tbl.num_rows == 1024
    assert tbl.column("id").to_pylist()[0] == ids[2048]
    import pytest as _pytest

    with _pytest.raises(KeyError):
        idx.blob_from_offset(12345678)


def test_pbf_index_ways_and_deps_golden(tmp_path):
    """The reference's exact golden: building=yes → 1 way + 3 nodes
    (tests/read.rs:295-319), over a real container via the index."""
    from osmpbf_ray.sources.pbf_index import PbfIndex
    from osmpbf_ray.stages.tags import filter_by_tag

    path = str(tmp_path / "golden.osm.pbf")
    pbf.write_pbf(
        path,
        nodes=fixtures.golden_nodes(),
        ways=fixtures.golden_ways(),
        relations=fixtures.golden_relations(),
    )
    idx = PbfIndex(path)
    ways_ds, deps = idx.ways_and_deps(lambda b: filter_by_tag(b, "building", "yes"))
    assert ways_ds.to_pandas()["id"].tolist() == [107]
    assert sorted(deps.to_pandas()["id"]) == [105, 106, 108]


def test_read_pbf_raw_escape_hatch(tmp_path):
    """Blob-level raw surface (raw_tags/raw_stringtable analog,
    elements.rs:543-564): payloads come back undecoded but parseable."""
    path = _write_golden(tmp_path, "zlib", True)
    raw = pbf.read_pbf_raw(path).to_pandas().sort_values("offset")
    assert raw["type"].tolist()[0] == "OSMHeader"
    # decompressed payloads parse as PrimitiveBlocks with raw string tables
    block = pbf.parse_primitive_block(raw[raw["type"] == "OSMData"]["data"].iloc[0])
    assert b"" in block["stringtable"]  # index 0 reserved blank
    # wire-level variant: bytes identical to the on-disk blob payload
    wire = pbf.read_pbf_raw(path, decompress=False).to_pandas().sort_values("offset")
    d = pbf.scan_blobs(path)[0]
    with open(path, "rb") as f:
        f.seek(d["offset"])
        expect = f.read(d["datasize"])
    assert bytes(wire["data"].iloc[0]) == expect


def test_write_pbf_partitioned_resumable(tmp_path):
    """Distributed PBF sink: one file per block with atomic commit
    markers; rerun skips completed partitions; dropped partition gets
    recomputed; readback equals the input."""
    import shutil

    path, ids = _sorted_world(tmp_path, n=8000, per_block=2048)
    nodes = pbf.read_pbf_nodes(path)  # 4 blocks of 2048
    out_dir = str(tmp_path / "sink")
    res1 = pbf.write_pbf_partitioned(nodes, out_dir)
    assert res1["written"] >= 2 and res1["skipped"] == 0
    back = pbf.read_pbf_partitioned_nodes(out_dir).to_pandas()
    assert sorted(back["id"]) == sorted(ids.tolist())

    # crash simulation: drop one partition (data + marker die together)
    victim = sorted((tmp_path / "sink").glob("part=*"))[1]
    shutil.rmtree(victim)
    res2 = pbf.write_pbf_partitioned(pbf.read_pbf_nodes(path), out_dir)
    assert res2["written"] == 1 and res2["skipped"] == res1["written"] - 1
    back2 = pbf.read_pbf_partitioned_nodes(out_dir).to_pandas()
    assert sorted(back2["id"]) == sorted(ids.tolist())


def test_read_pbf_multi_file(tmp_path):
    # build two separate files and read them as one descriptor stream
    import os

    os.makedirs(tmp_path / "m", exist_ok=True)
    paths, all_ids = [], []
    for k in range(2):
        ids = (np.arange(1, 1001, dtype=np.int64) + k * 100_000) * 2
        nano = (ids % 1_000_000) * 100
        nodes = pa.table(
            {
                "id": ids, "lat": nano * 1e-9, "lon": nano * 1e-9,
                "nano_lat": nano, "nano_lon": nano,
                "tags": pa.array([[]] * len(ids), type=schema.NODES_SCHEMA.field("tags").type),
                "info": pa.nulls(len(ids), type=schema.INFO_STRUCT),
            },
            schema=schema.NODES_SCHEMA,
        )
        p = str(tmp_path / "m" / f"f{k}.osm.pbf")
        pbf.write_pbf(p, nodes=nodes)
        paths.append(p)
        all_ids.extend(ids.tolist())
    ds = pbf.read_pbf_nodes(paths)
    assert sorted(ds.to_pandas()["id"]) == sorted(all_ids)


def test_on_error_skip_malformed_blob(tmp_path):
    """Error channel: a corrupted blob is skipped (with on_error="skip"),
    the rest decode; default strict mode raises."""
    path, ids = _sorted_world(tmp_path, n=4096, per_block=1024)
    descs = pbf.scan_blobs(path)
    victim = [d for d in descs if d["type"] == "OSMData"][1]
    with open(path, "r+b") as f:
        f.seek(victim["offset"] + 4)
        f.write(b"\xff" * 8)  # corrupt the zlib stream
    import pytest as _pytest

    with _pytest.raises(Exception):
        pbf.read_pbf_nodes(path).count()
    got = pbf.read_pbf_nodes(path, on_error="skip").to_pandas()
    assert len(got) == 4096 - 1024
    assert set(got["id"]) == set(ids.tolist()) - set(ids[1024:2048].tolist())


def test_mmap_blob_reader_zero_copy(tmp_path):
    """MmapBlobReader twin: raw payloads are memoryview slices (no copy);
    sequential iteration yields every blob in order."""
    path = _write_golden(tmp_path, "raw", True)
    seen = []
    for desc, payload in pbf.mmap_blob_reader(path):
        seen.append(desc["type"])
        if desc["type"] == "OSMData":
            assert isinstance(payload, memoryview)  # zero-copy slice
            block = pbf.parse_primitive_block(payload)
            assert block["stringtable"] is not None
    assert seen[0] == "OSMHeader" and len(seen) == len(pbf.scan_blobs(path))
    # zlib variant: payloads decompress (materialized, like the reference)
    zpath = _write_golden(tmp_path, "zlib", True)
    data = [p for d, p in pbf.mmap_blob_reader(zpath) if d["type"] == "OSMData"]
    assert all(isinstance(p, bytes) for p in data)


def test_pbf_blocks_lineage_is_byte_offset(tmp_path):
    path = _write_golden(tmp_path, "zlib", True)
    blocks = pbf.read_pbf_blocks(path).to_pandas()
    descs = {d["offset"] for d in pbf.scan_blobs(path)}
    assert set(blocks["block_id"]) <= descs  # ByteOffset lineage (blob.rs:57)


# --- round 3: Way/Relation Info, codec params, wire bounds -------------------


def test_way_relation_info_roundtrip(tmp_path):
    """Info on ways/relations survives write→read (elements.rs:200-206,
    303-309) — version/timestamp/changeset/uid/user/visible all exact."""
    path = _write_golden(tmp_path, "zlib", True)
    ways = pbf.read_pbf_ways(path).to_pandas()
    wi = ways["info"].iloc[0]
    assert wi is not None
    assert wi["version"] == 1 and wi["visible"] is True
    assert wi["user"] == "testuser"
    assert wi["timestamp_ms"] == 0 and wi["uid"] == 17
    rels = pbf.read_pbf_relations(path).to_pandas()
    ri = rels["info"].iloc[0]
    assert ri is not None and ri["user"] == "testuser" and ri["version"] == 1


def test_way_info_absent_stays_null(tmp_path):
    """A file without way Info decodes to null info (Option<Info> None)."""
    path = str(tmp_path / "noinfo.osm.pbf")
    ways = fixtures.golden_ways().set_column(
        fixtures.golden_ways().schema.get_field_index("info"),
        "info",
        pa.nulls(1, type=schema.INFO_STRUCT),
    )
    pbf.write_pbf(path, ways=ways)
    got = pbf.read_pbf_ways(path).to_pandas()
    assert got["info"].iloc[0] is None


def test_way_history_visibility(tmp_path):
    """History files mark deleted WAYS too: visible=false on way Info
    survives the container (the reference reads Info on every element)."""
    path = str(tmp_path / "wayhist.osm.pbf")
    rows = [
        {"id": 9, "refs": [1, 2], "tags": [], "locations": None,
         "info": fixtures._info(version=1, visible=False)},
        {"id": 9, "refs": [1, 2, 3], "tags": [], "locations": None,
         "info": fixtures._info(version=2, visible=True)},
    ]
    pbf.write_pbf(path, ways=pa.Table.from_pylist(rows, schema=schema.WAYS_SCHEMA),
                  header={"required_features": ["OsmSchema-V0.6", "HistoricalInformation"]})
    got = pbf.read_pbf_ways(path).to_pandas()
    by_ver = {i["version"]: i["visible"] for i in got["info"]}
    assert by_ver == {1: False, 2: True}


def test_codec_params_roundtrip(tmp_path):
    """granularity + lat/lon offsets + date_granularity all non-default:
    nano coordinates and timestamps survive write→read EXACTLY
    (osmformat.proto:108-116 default handling)."""
    path = str(tmp_path / "offsets.osm.pbf")
    gran, lat_off, lon_off, dgran = 1000, 5_000, -7_000, 2000
    # nano values chosen ≡ offset (mod granularity) so encoding is exact
    rows = [
        {"id": 1, "lat": 0.0, "lon": 0.0, "nano_lat": lat_off + 12_000,
         "nano_lon": lon_off - 34_000, "tags": [],
         "info": fixtures._info(timestamp_ms=1_234_568_000)},
        {"id": 2, "lat": 0.0, "lon": 0.0, "nano_lat": lat_off - 8_000,
         "nano_lon": lon_off + 91_000, "tags": [],
         "info": fixtures._info(timestamp_ms=-44_000)},  # pre-1970
    ]
    nodes = pa.Table.from_pylist(rows, schema=schema.NODES_SCHEMA)
    pbf.write_pbf(path, nodes=nodes, granularity=gran, lat_offset=lat_off,
                  lon_offset=lon_off, date_granularity=dgran)
    got = pbf.read_pbf_nodes(path).to_pandas().sort_values("id")
    assert got["nano_lat"].tolist() == [lat_off + 12_000, lat_off - 8_000]
    assert got["nano_lon"].tolist() == [lon_off - 34_000, lon_off + 91_000]
    assert [i["timestamp_ms"] for i in got["info"]] == [1_234_568_000, -44_000]
    # ways with LocationsOnWays honor the offsets too
    wpath = str(tmp_path / "offsets_ways.osm.pbf")
    wrows = [{"id": 7, "refs": [1, 2], "tags": [], "info": None,
              "locations": [{"nano_lat": lat_off + 12_000, "nano_lon": lon_off - 34_000},
                            {"nano_lat": lat_off - 8_000, "nano_lon": lon_off + 91_000}]}]
    pbf.write_pbf(wpath, ways=pa.Table.from_pylist(wrows, schema=schema.WAYS_SCHEMA),
                  granularity=gran, lat_offset=lat_off, lon_offset=lon_off)
    wgot = pbf.read_pbf_ways(wpath).to_pandas()
    assert [l["nano_lat"] for l in wgot["locations"].iloc[0]] == [lat_off + 12_000, lat_off - 8_000]


def test_negative_int64_ids_roundtrip(tmp_path):
    """proto int64 negatives are 10-byte two's-complement varints: way and
    relation ids (and info timestamp/changeset) decode via _plain_int."""
    path = str(tmp_path / "neg.osm.pbf")
    wrows = [{"id": -42, "refs": [1, 2], "tags": [],
              "info": fixtures._info(changeset=-3), "locations": None}]
    rrows = [{"id": -99, "members": [{"role": "r", "member_id": 1,
                                      "member_type": schema.MEMBER_NODE}],
              "tags": [], "info": None}]
    pbf.write_pbf(path,
                  ways=pa.Table.from_pylist(wrows, schema=schema.WAYS_SCHEMA),
                  relations=pa.Table.from_pylist(rrows, schema=schema.RELATIONS_SCHEMA))
    ways = pbf.read_pbf_ways(path).to_pandas()
    assert ways["id"].tolist() == [-42]
    assert ways["info"].iloc[0]["changeset"] == -3
    rels = pbf.read_pbf_relations(path).to_pandas()
    assert rels["id"].tolist() == [-99]


def test_truncated_final_blob_raises(tmp_path):
    """A truncated final payload fails the SCAN (not silently later):
    offset+datasize is validated against the file size."""
    path = _write_golden(tmp_path, "zlib", True)
    size = len(open(path, "rb").read())
    with open(path, "r+b") as f:
        f.truncate(size - 10)
    with pytest.raises(ValueError, match="truncated blob payload"):
        pbf.scan_blobs(path)


def test_zlib_decompression_bounded():
    """A zlib bomb with an ABSENT raw_size must not expand unbounded in
    memory: decompression is capped while streaming (blob.rs:464)."""
    import zlib as _z

    bomb = _z.compress(b"\x00" * (40 * 1024 * 1024))  # 40 MiB > 32 MiB cap
    blob = w.field_len(3, bomb)  # no raw_size field at all
    with pytest.raises(ValueError, match="max uncompressed size"):
        pbf.decode_blob(blob)


def test_prune_offsets_exact_above_2_53(tmp_path):
    """Zone-map pruning stays EXACT for ids above 2^53 even when node-free
    blobs make min/max nullable (no float64 NaN coercion)."""
    from osmpbf_ray.sources.pbf_index import PbfIndex

    path = _write_golden(tmp_path, "zlib", True)
    idx = PbfIndex(path)
    big = (1 << 60) + 1  # not representable in float64
    idx._ranges = pa.table({
        "offset": pa.array([10, 20, 30], type=pa.int64()),
        "min_id": pa.array([big, None, 5], type=pa.int64()),
        "max_id": pa.array([big, None, 9], type=pa.int64()),
        "n_nodes": pa.array([1, 0, 3], type=pa.int64()),
    })
    # float64(big) == float64(big+1): a NaN/float path would FALSELY prune
    assert idx.prune_offsets(np.array([big])) == [10]
    assert idx.prune_offsets(np.array([big + 1])) == []
    assert idx.prune_offsets(np.array([7])) == [30]
    assert idx.prune_offsets(np.array([], dtype=np.int64)) == []


def test_blobheader_indexdata_passthrough(tmp_path):
    """BlobHeader.indexdata (fileformat.proto:63-67) survives the framed
    write → header scan → raw read path: scan_blobs surfaces the bytes
    verbatim (None when absent), and read_pbf_raw carries them as an
    explicitly binary-typed column even when every row is absent."""
    path = _write_golden(tmp_path, "zlib", True)
    with open(path, "ab") as f:
        f.write(pbf._blob_frame("SomeIndexedType", b"\x0a\x00", "raw",
                                indexdata=b"\x01\x02tile"))
    descs = pbf.scan_blobs(path)
    assert all("indexdata" in d for d in descs)
    assert descs[-1]["indexdata"] == b"\x01\x02tile"
    assert all(d["indexdata"] is None for d in descs[:-1])

    raw = pbf.read_pbf_raw(path, decompress=False).take_batch(
        100, batch_format="pyarrow")
    assert raw.schema.field("indexdata").type == pa.binary()
    vals = raw.column("indexdata").to_pylist()
    assert b"\x01\x02tile" in vals and vals.count(None) == len(vals) - 1


def test_plain_nodes_mixed_optional_info(tmp_path):
    """Info is optional PER NODE in plain (non-dense) groups: one
    info-less node must not drop metadata for the whole group — missing
    entries take the proto defaults (version -1, visible true)."""
    nodes = fixtures.golden_nodes()
    # null out the middle node's info struct
    info = nodes.column("info").to_pylist()
    info[1] = None
    nodes = nodes.set_column(nodes.schema.get_field_index("info"), "info",
                             pa.array(info, type=nodes.schema.field("info").type))
    path = str(tmp_path / "mixed_info.osm.pbf")
    pbf.write_pbf(path, nodes=nodes, dense=False)
    out = pbf.read_pbf_nodes(path).to_pandas().sort_values("id")
    infos = list(out["info"])
    assert infos[0] is not None and infos[0]["version"] == 1
    assert infos[2] is not None and infos[2]["version"] == 1
    assert infos[1] is not None and infos[1]["version"] == -1  # proto default
    assert bool(infos[1]["visible"]) is True


def test_truncated_lzma_blob_raises_and_skips(tmp_path):
    """A truncated lzma payload must raise (not silently return a
    partial block), and on_error='skip' must survive it."""
    import lzma
    import struct as _struct

    src = str(tmp_path / "ok.osm.pbf")
    pbf.write_pbf(src, nodes=fixtures.golden_nodes(), compress="lzma")
    raw = open(src, "rb").read()
    # find the OSMData blob and truncate its lzma stream mid-way by
    # rewriting the file with a shortened payload
    descs = pbf.scan_blobs(src)
    d = [x for x in descs if x["type"] == "OSMData"][0]
    blob = raw[d["offset"]: d["offset"] + d["datasize"]]
    # an INTACT protobuf field carrying a TRUNCATED lzma stream: the
    # decompressor ends with needs_input=True, eof=False — must raise,
    # not return a silently partial payload
    payload = lzma.compress(pbf.decode_blob(blob))
    with pytest.raises(ValueError, match="truncated or oversized lzma"):
        pbf.decode_blob(w.field_len(4, payload[:-8]))
    # skip path: a malformed blob in the batch is dropped, not fatal
    bad = str(tmp_path / "bad.osm.pbf")
    with open(bad, "wb") as f:
        f.write(pbf._blob_frame("OSMData", pbf.decode_blob(blob), "lzma"))
    bd = pbf.scan_blobs(bad)[0]
    batch = pa.table({"path": [bad], "offset": [bd["offset"]],
                      "datasize": [bd["datasize"] - 8]})
    out = pbf._fetch_parse(batch, lambda off, pb: [], pbf.schema.BLOCKS_SCHEMA,
                           on_error="skip")
    assert out.num_rows == 0


def test_mmap_reader_truncated_file(tmp_path):
    path = str(tmp_path / "t.osm.pbf")
    pbf.write_pbf(path, nodes=fixtures.golden_nodes())
    data = open(path, "rb").read()
    cut = str(tmp_path / "cut.osm.pbf")
    open(cut, "wb").write(data[:-10])  # chop the final payload
    with pytest.raises(ValueError, match="truncated"):
        list(pbf.mmap_blob_reader(cut))


def test_read_pbf_raw_accepts_path_list(tmp_path):
    a, b = str(tmp_path / "a.osm.pbf"), str(tmp_path / "b.osm.pbf")
    pbf.write_pbf(a, nodes=fixtures.golden_nodes())
    pbf.write_pbf(b, nodes=fixtures.golden_nodes())
    one = pbf.read_pbf_raw(a).count()
    both = pbf.read_pbf_raw([a, b]).count()
    assert both == 2 * one
    assert pbf.read_pbf_header([a, b]) is not None
