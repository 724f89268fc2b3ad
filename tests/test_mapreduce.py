"""par_map_reduce / for_each / semi-join conformance (reference
src/reader.rs + src/indexed.rs semantics on the golden world)."""

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from osmpbf_ray.functions import joins, mapreduce
from osmpbf_ray.sources import fixtures
from osmpbf_ray.stages.tags import filter_by_tag


def _golden_union_ds():
    """All 5 golden elements as one dataset with a kind column."""
    nodes = fixtures.golden_nodes().select(["id"]).append_column(
        "kind", pa.array(["node"] * 3)
    )
    ways = fixtures.golden_ways().select(["id"]).append_column("kind", pa.array(["way"]))
    rels = fixtures.golden_relations().select(["id"]).append_column(
        "kind", pa.array(["relation"])
    )
    return rd.from_arrow(pa.concat_tables([nodes, ways, rels]))


def test_count_five_elements():
    ds = _golden_union_ds()
    assert mapreduce.count_elements(ds) == 5


def test_par_map_reduce_tallies():
    """Per-kind tallies like examples/count.rs:15-23."""
    ds = _golden_union_ds()

    def fold(batch):
        kinds = batch.column("kind").to_pylist()
        return (
            kinds.count("node"),
            kinds.count("way"),
            kinds.count("relation"),
        )

    total = mapreduce.par_map_reduce(
        ds,
        fold,
        lambda: (0, 0, 0),
        lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2]),
    )
    assert total == (3, 1, 1)


def test_sequential_equals_parallel():
    """tests/read.rs:270-292: same count via sequential scan and par reduce."""
    ds = _golden_union_ds()
    seen = []
    mapreduce.for_each(ds, lambda row: seen.append(row["id"]))
    # WHICH ids, not just how many (105/106/108 nodes + way 107 + rel 109)
    assert sorted(seen) == [105, 106, 107, 108, 120]
    assert mapreduce.count_elements(ds) == len(seen)


def test_ways_and_deps_golden():
    """Semi-join golden: building=yes → 1 way + 3 distinct nodes
    (tests/read.rs:295-319)."""
    ways = rd.from_arrow(fixtures.golden_ways())
    nodes = rd.from_arrow(fixtures.golden_nodes())
    ways_ds, deps = joins.ways_and_deps(
        ways, nodes, lambda b: filter_by_tag(b, "building", "yes")
    )
    assert ways_ds.count() == 1
    assert ways_ds.to_pandas()["id"].tolist() == [107]
    dep_ids = sorted(deps.to_pandas()["id"].tolist())
    assert dep_ids == [105, 106, 108]


def test_ways_and_deps_no_match():
    ways = rd.from_arrow(fixtures.golden_ways())
    nodes = rd.from_arrow(fixtures.golden_nodes())
    ways_ds, deps = joins.ways_and_deps(
        ways, nodes, lambda b: filter_by_tag(b, "building", "no_such")
    )
    assert ways_ds.count() == 0
    assert deps.count() == 0


def test_broadcast_semi_join():
    nodes = rd.from_arrow(fixtures.golden_nodes())
    keys_ref = ray.put(np.array([106, 108, 999]))
    out = joins.broadcast_semi_join(nodes, "id", keys_ref)
    assert sorted(out.to_pandas()["id"].tolist()) == [106, 108]


def test_partitioned_hash_join():
    rng = np.random.default_rng(11)
    left = pa.table({"k": rng.integers(0, 50, 200), "a": np.arange(200)})
    right = pa.table({"k": np.arange(50), "b": np.arange(50) * 10})
    out = joins.partitioned_hash_join(
        rd.from_arrow(left), rd.from_arrow(right), "k", n_buckets=8
    ).to_pandas()
    import pandas as pd

    expect = left.to_pandas().merge(right.to_pandas(), on="k")
    assert len(out) == len(expect)
    got = out.sort_values(["k", "a"]).reset_index(drop=True)[["k", "a", "b"]]
    exp = expect.sort_values(["k", "a"]).reset_index(drop=True)[["k", "a", "b"]]
    pd.testing.assert_frame_equal(got, exp)


def test_partitioned_hash_join_salted_skew():
    """Salting hot keys yields the identical join result while spreading
    a hot key's rows across sub-buckets (no reducer sees the whole key)."""
    import pandas as pd

    rng = np.random.default_rng(13)
    keys = np.concatenate([np.full(3000, 7), rng.integers(0, 50, 500)])  # key 7 is hot
    left = pa.table({"k": keys, "a": np.arange(len(keys))})
    right = pa.table({"k": np.arange(50), "b": np.arange(50) * 10})
    plain = joins.partitioned_hash_join(
        rd.from_arrow(left), rd.from_arrow(right), "k", n_buckets=8
    ).to_pandas()
    salted = joins.partitioned_hash_join(
        rd.from_arrow(left), rd.from_arrow(right), "k", n_buckets=8,
        hot_keys=np.array([7]), n_salt=4,
    ).to_pandas()
    cols = ["k", "a", "b"]
    pd.testing.assert_frame_equal(
        plain[cols].sort_values(["k", "a"]).reset_index(drop=True),
        salted[cols].sort_values(["k", "a"]).reset_index(drop=True),
    )


def test_resolve_way_locations_golden():
    """Way 107's refs [105,106,108,105] resolve to the golden node
    coords in ORDER (the id-based FK join, elements.rs:194-199)."""
    ways = rd.from_arrow(fixtures.golden_ways())
    nodes = rd.from_arrow(
        fixtures.golden_nodes().select(["id", "nano_lat", "nano_lon"])
    )
    out = joins.resolve_way_locations(ways, nodes, n_buckets=4).to_pandas()
    out = out.sort_values("pos")
    assert out["way_id"].tolist() == [107] * 4
    assert out["id"].tolist() == [105, 106, 108, 105]
    by_id = dict(zip(fixtures.GOLDEN_NODE_IDS, fixtures.GOLDEN_NANO_LAT))
    assert out["nano_lat"].tolist() == [by_id[i] for i in [105, 106, 108, 105]]


def test_broadcast_lookup_join():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    big = rd.from_arrow(pa.table({"k": np.arange(1000) % 7, "v": np.arange(1000)}))
    small = pa.table({"k": np.array([0, 2, 4], dtype=np.int64), "name": ["a", "b", "c"]})
    out = joins.broadcast_lookup_join(big, small, key="k").to_pandas()
    assert len(out) == sum((np.arange(1000) % 7 == x).sum() for x in (0, 2, 4))
    assert set(out.columns) == {"k", "v", "name"}
    assert (out[out.k == 2]["name"] == "b").all()


def test_partitioned_hash_join_outer_variants():
    """left/right/outer semantics match pandas merge, Arrow end-to-end,
    including NESTED payload columns (acero rejects list non-key fields;
    the index-join + take path does not)."""
    import pandas as pd

    left = pa.table({"k": [1, 2, 3, 3], "a": [10, 20, 30, 31],
                     "tags": pa.array([[1], [2, 2], [3], []], type=pa.list_(pa.int64()))})
    right = pa.table({"k": [2, 3, 4], "b": ["x", "y", "z"]})
    lp, rp = left.to_pandas(), right.to_pandas()
    for how, pd_how in [("inner", "inner"), ("left", "left"),
                        ("right", "right"), ("outer", "outer")]:
        ds = joins.partitioned_hash_join(
            rd.from_arrow(left), rd.from_arrow(right), "k", n_buckets=4, how=how
        )
        # consume as Arrow: pandas' tensor-extension cast chokes on the
        # ragged list column, which is exactly what this test exercises
        tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        out = pa.concat_tables(tbls).to_pylist()
        exp = lp.merge(rp, on="k", how=pd_how)
        assert len(out) == len(exp), how
        key_fn = lambda r: (r["k"] if r["k"] is not None else 10**9,
                            r["a"] if r["a"] is not None else 10**9)
        got = sorted(out, key=key_fn)
        es = sorted(
            (
                {"k": None if pd.isna(r.k) else int(r.k),
                 "a": None if pd.isna(r.a) else int(r.a),
                 "b": None if pd.isna(r.b) else r.b,
                 "tags": None if not isinstance(r.tags, (list, np.ndarray)) else list(r.tags)}
                for r in exp.itertuples()
            ),
            key=key_fn,
        )
        for g, e in zip(got, es):
            assert (g["k"], g["a"], g["b"], g["tags"]) == (e["k"], e["a"], e["b"], e["tags"]), how


def test_salting_rejected_for_right_outer():
    left = rd.from_arrow(pa.table({"k": [1], "a": [1]}))
    right = rd.from_arrow(pa.table({"k": [2], "b": [2]}))
    import pytest as _pytest

    for how in ("right", "outer"):
        with _pytest.raises(ValueError, match="salting requires"):
            joins.partitioned_hash_join(left, right, "k", how=how,
                                        hot_keys=np.array([1]))


def test_sized_fanout_grows_with_input():
    from osmpbf_ray.functions.partitioning import sized_fanout

    assert sized_fanout(1_000) == 64  # floor
    assert sized_fanout(64 * 500_000) == 64
    assert sized_fanout(640 * 500_000) == 640  # grows with rows
    assert sized_fanout(10**12) == 1 << 16  # cap
    # Dataset with plan metadata: fan-out scales without executing
    big = rd.range(200).map_batches(lambda b: b)  # row count unknown post-map
    assert sized_fanout(big) == 64
    meta = rd.from_arrow(pa.table({"x": np.arange(1000)}))
    assert sized_fanout(meta, target_rows=100) == 64  # floor dominates
    assert sized_fanout(meta, target_rows=10, floor=8) == 100
