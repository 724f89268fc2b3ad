"""Decode-stage conformance: golden values, cumsum decode, format
invariance, unknown-block skip (reference tests/read.rs semantics)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from osmpbf_ray import schema
from osmpbf_ray.sources import fixtures
from osmpbf_ray.stages import coords, decode
from osmpbf_ray.stages.tags import tags_contain


def test_golden_world_values():
    nodes = fixtures.golden_nodes()
    assert nodes.column("id").to_pylist() == [105, 106, 108]
    assert nodes.column("nano_lat").to_pylist() == fixtures.GOLDEN_NANO_LAT
    # degree within 1e-6 (tests/read.rs:75-77)
    lats = nodes.column("lat").to_pylist()
    assert abs(lats[0] - 52.12240315616) < 1e-6
    # decimicro exact ints (tests/read.rs:111-126)
    dm = coords.nano_to_decimicro(nodes["nano_lat"]).to_pylist()
    assert dm == [521224031, 521199235, 521198991]
    ways = fixtures.golden_ways()
    assert ways.column("refs").to_pylist() == [[105, 106, 108, 105]]
    rels = fixtures.golden_relations()
    m = rels.column("members").to_pylist()[0]
    assert m == [{"role": "test_role", "member_id": 107, "member_type": schema.MEMBER_WAY}]


def test_locations_on_ways_variant():
    ways = fixtures.golden_ways(with_locations=True)
    locs = ways.column("locations").to_pylist()[0]
    assert [loc["nano_lat"] for loc in locs] == [
        52122403100,
        52119923500,
        52119899100,
        52122403100,
    ]
    # base variant has no locations (tests/read.rs:189)
    assert fixtures.golden_ways().column("locations").to_pylist() == [None]


def test_history_visible_flags():
    nodes = fixtures.history_nodes()
    vis = pc.struct_field(nodes["info"], "visible").to_pylist()
    assert vis == [False, True]


def test_delta_decode_correctness():
    blocks = fixtures.make_delta_blocks(n_blocks=3, nodes_per_block=500)
    out = decode.decode_blocks(blocks)
    # expected via independent per-block cumsum
    exp_ids, exp_nano_lat = [], []
    for row in blocks.to_pylist():
        if row["kind"] != "dense":
            continue
        exp_ids.extend(np.cumsum(row["id_delta"]).tolist())
        exp_nano_lat.extend(
            (row["lat_offset"] + row["granularity"] * np.cumsum(row["lat_delta"])).tolist()
        )
    assert out.column("id").to_pylist() == exp_ids
    assert out.column("nano_lat").to_pylist() == exp_nano_lat
    # ids strictly increasing (Sort.Type_then_ID convention)
    ids = np.array(exp_ids)
    assert (np.diff(ids) > 0).all()
    # degree = nano * 1e-9
    assert np.allclose(
        out.column("lat").to_numpy(), np.array(exp_nano_lat) * 1e-9
    )


def test_unknown_blocks_skipped_not_failed():
    blocks = fixtures.make_delta_blocks(n_blocks=2, nodes_per_block=100, with_unknown=True)
    assert blocks.num_rows == 3
    out = decode.decode_blocks(blocks)
    assert out.num_rows == 200


def test_tag_decode_and_predicate():
    blocks = fixtures.make_delta_blocks(n_blocks=2, nodes_per_block=400)
    out = decode.decode_blocks(blocks)
    mask = tags_contain(out["tags"], "building", "yes")
    # independently: walk keys_vals
    expected = 0
    for row in blocks.to_pylist():
        if row["kind"] != "dense":
            continue
        kv = row["keys_vals"]
        st = row["stringtable"]
        i = 0
        while i < len(kv):
            found = False
            while kv[i] != 0:
                if st[kv[i]] == b"building" and st[kv[i + 1]] == b"yes":
                    found = True
                i += 2
            i += 1
            expected += found
    assert int(mask.sum()) == expected
    assert expected > 0


def test_info_decode():
    blocks = fixtures.make_delta_blocks(n_blocks=1, nodes_per_block=50)
    out = decode.decode_blocks(blocks)
    info = out.column("info")
    assert pc.struct_field(info, "visible").to_pylist() == [True] * 50
    assert pc.struct_field(info, "uid").to_pylist() == [17] * 50
    users = pc.struct_field(info, "user").to_pylist()
    assert users == [""] * 50  # user_sid 0 → blank entry
    ts = np.array(pc.struct_field(info, "timestamp_ms").to_pylist())
    row = blocks.to_pylist()[0]
    assert (ts == np.cumsum(row["timestamp_delta"]) * row["date_granularity"]).all()


def test_format_invariance_fragments(ray_session):
    """Same rows whether the block table arrives as 1 fragment or many
    (the engine analog of zlib-vs-raw encoding invariance,
    tests/read.rs:15-31)."""
    blocks = fixtures.make_delta_blocks(n_blocks=4, nodes_per_block=200)
    one = decode.decode_blocks_ds(rd.from_arrow(blocks))
    many = decode.decode_blocks_ds(
        rd.from_arrow_refs(
            [__import__("ray").put(blocks.slice(i, 1)) for i in range(blocks.num_rows)]
        )
    )
    a = one.sort("id").to_pandas()
    b = many.sort("id").to_pandas()
    assert a["id"].tolist() == b["id"].tolist()
    assert a["nano_lat"].tolist() == b["nano_lat"].tolist()
    assert len(a) == 800


def test_header_metadata():
    """HeaderBlock parity (block.rs:21-85, tests/read.rs:80-102)."""
    blocks = fixtures.make_delta_blocks(n_blocks=2, nodes_per_block=50, with_header=True)
    meta = decode.header_meta(blocks)
    assert meta is not None
    # bbox nanodegrees -> degrees (block.rs:21-28)
    assert abs(meta["bbox"]["left"] - (-10.0)) < 1e-12
    assert abs(meta["bbox"]["top"] - 60.0) < 1e-12
    # feature comparison is order-insensitive (tests/read.rs:80-102)
    assert meta["required_features"] == {"DenseNodes", "OsmSchema-V0.6"}
    assert meta["optional_features"] == {"Sort.Type_then_ID"}
    assert meta["replication"]["sequence_number"] == 273
    # header rows must not leak into the element stream (blob.rs:95)
    decoded = decode.decode_blocks(blocks)
    assert decoded.num_rows == 100
    # blocks without a header row report None
    assert decode.header_meta(fixtures.make_delta_blocks(n_blocks=1, nodes_per_block=5)) is None


def test_way_blocks_delta_decode():
    """WayRefIter parity: delta refs decode to the golden ordered list
    (elements.rs:335-343; tests/read.rs:160-168)."""
    ways = decode.decode_way_blocks(fixtures.make_way_blocks(n_random=20))
    golden = ways.filter(pc.equal(ways["id"], 107))
    assert golden.column("refs").to_pylist() == [[105, 106, 108, 105]]
    tags = golden.column("tags").to_pylist()[0]
    assert {(t["key"], t["value"]) for t in tags} == {("building", "yes"), ("name", "triangle")}
    assert golden.column("locations").to_pylist() == [None]  # feature absent
    # random rows: refs strictly match an independent per-row cumsum
    blocks = fixtures.make_way_blocks(n_random=20)
    for row, refs in zip(blocks.to_pylist(), ways.column("refs").to_pylist()):
        assert np.cumsum(row["refs_delta"]).tolist() == refs


def test_way_blocks_locations_on_ways():
    """LocationsOnWays parity (elements.rs:404-416, tests/read.rs:343-420)."""
    ways = decode.decode_way_blocks(fixtures.make_way_blocks(n_random=0, with_locations=True))
    locs = ways.column("locations").to_pylist()[0]
    assert [loc["nano_lat"] for loc in locs] == [
        52122403100, 52119923500, 52119899100, 52122403100,
    ]


def test_relation_blocks_delta_decode():
    """RelMemberIter parity (elements.rs:487-500; tests/read.rs:231-247)."""
    rels = decode.decode_relation_blocks(fixtures.make_relation_blocks(n_random=10))
    golden = rels.filter(pc.equal(rels["id"], 110))
    m = golden.column("members").to_pylist()[0]
    assert m == [{"role": "test_role", "member_id": 107, "member_type": schema.MEMBER_WAY}]
    blocks = fixtures.make_relation_blocks(n_random=10)
    for row, members in zip(blocks.to_pylist(), rels.column("members").to_pylist()):
        assert np.cumsum(row["memids_delta"]).tolist() == [mm["member_id"] for mm in members]


def test_decode_runs_in_ray_pipeline():
    """Way/relation decode as zero-copy map_batches stages."""
    ways = rd.from_arrow(fixtures.make_way_blocks(50)).map_batches(
        decode.decode_way_blocks, batch_format="pyarrow", zero_copy_batch=True
    )
    assert ways.count() == 51
    rels = rd.from_arrow(fixtures.make_relation_blocks(9)).map_batches(
        decode.decode_relation_blocks, batch_format="pyarrow", zero_copy_batch=True
    )
    assert rels.count() == 10


def test_format_invariance(tmp_path):
    """Engine analog of the reference's encoding invariance (same logical
    content in 3 physical encodings decodes identically, tests/read.rs:15-31):
    same rows whether the block table is 1 parquet fragment or many, and
    whether strings are dictionary-encoded or plain."""
    import pyarrow.parquet as pq

    blocks = fixtures.make_delta_blocks(n_blocks=4, nodes_per_block=300)
    one = tmp_path / "one"; many = tmp_path / "many"; dictenc = tmp_path / "dict"
    one.mkdir(); many.mkdir(); dictenc.mkdir()
    pq.write_table(blocks, one / "all.parquet")
    for i in range(4):
        pq.write_table(blocks.slice(i, 1), many / f"b{i}.parquet")
    pq.write_table(blocks, dictenc / "all.parquet", use_dictionary=True)

    def decoded_rows(path):
        ds = decode.decode_blocks_ds(rd.read_parquet(str(path)))
        df = ds.to_pandas().sort_values("id").reset_index(drop=True)
        return df[["id", "nano_lat", "nano_lon"]]

    a, b, c = decoded_rows(one), decoded_rows(many), decoded_rows(dictenc)
    assert a.equals(b) and a.equals(c) and len(a) == 1200
