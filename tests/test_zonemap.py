"""Zone-map pruning conformance: metadata-only fragment skip must not
change semi-join results (reference indexed.rs:26-106 semantics)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from osmpbf_ray.state import zonemap


@pytest.fixture()
def sorted_fragments(tmp_path):
    """8 fragments with contiguous disjoint id ranges (Sort.Type_then_ID)."""
    d = tmp_path / "nodes"
    d.mkdir()
    rng = np.random.default_rng(3)
    for f in range(8):
        ids = np.arange(f * 1000, f * 1000 + 500)
        tbl = pa.table({"id": ids, "val": rng.standard_normal(len(ids))})
        pq.write_table(tbl, d / f"part-{f:03d}.parquet")
    return str(d)


def test_fragment_stats_metadata_only(sorted_fragments):
    stats = zonemap.fragment_stats(sorted_fragments, "id")
    assert len(stats) == 8
    assert stats[0]["min"] == 0 and stats[0]["max"] == 499
    assert stats[7]["min"] == 7000 and stats[7]["max"] == 7499


def test_prune_keeps_only_intersecting(sorted_fragments):
    stats = zonemap.fragment_stats(sorted_fragments, "id")
    kept, skipped = zonemap.prune_fragments(stats, np.array([150, 3100, 3105]))
    assert len(kept) == 2 and len(skipped) == 6
    # a key in the gap between fragments (500..999) prunes everything
    kept, skipped = zonemap.prune_fragments(stats, np.array([750]))
    assert kept == [] and len(skipped) == 8


def test_pruned_semi_join_matches_full_scan(sorted_fragments):
    import ray.data as rd

    keys = np.array([10, 11, 1250, 5003, 7499])
    ds, n_kept, n_skipped = zonemap.pruned_semi_join(sorted_fragments, "id", keys)
    got = sorted(ds.to_pandas()["id"].tolist())
    full = rd.read_parquet(sorted_fragments).to_pandas()
    expect = sorted(full[full["id"].isin(keys)]["id"].tolist())
    assert got == expect == [10, 11, 1250, 5003, 7499]
    assert n_kept == 4 and n_skipped == 4  # fragments 0,1,5,7 only


def test_pruned_semi_join_empty_keys(sorted_fragments):
    ds, n_kept, n_skipped = zonemap.pruned_semi_join(
        sorted_fragments, "id", np.empty(0, dtype=np.int64)
    )
    assert n_kept == 0 and n_skipped == 8 and ds.count() == 0
