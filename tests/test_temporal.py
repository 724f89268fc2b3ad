"""Temporal joins: as-of + bounded range vs brute force."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from osmpbf_ray.functions import temporal


def _mk(ids, keys, ts, extra=None, extra_name="val"):
    cols = {"id": pa.array(ids, type=pa.int64()),
            "k": pa.array(keys, type=pa.int64()),
            "t": pa.array(ts, type=pa.int64())}
    if extra is not None:
        cols[extra_name] = pa.array(extra, type=pa.int64())
    return pa.table(cols)


LS = pa.schema([("id", pa.int64()), ("k", pa.int64()), ("t", pa.int64())])
RS = pa.schema([("rid", pa.int64()), ("k", pa.int64()), ("rt", pa.int64())])


def _right(rids, keys, ts):
    return pa.table({"rid": pa.array(rids, type=pa.int64()),
                     "k": pa.array(keys, type=pa.int64()),
                     "rt": pa.array(ts, type=pa.int64())})


def test_asof_join_matches_brute_force():
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    lk = rng.integers(0, 12, n_l)
    lt = rng.integers(0, 1000, n_l)
    rk = rng.integers(0, 12, n_r)
    rt = rng.integers(0, 1000, n_r)
    left = _mk(np.arange(n_l), lk, lt)
    right = _right(np.arange(n_r), rk, rt)
    out = temporal.asof_join(
        rd.from_arrow(left), rd.from_arrow(right),
        key="k", left_on="t", right_on="rt", right_cols=["rid"],
        tiebreak="rid", left_schema=LS, right_schema=RS, n_buckets=4,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    assert len(out) == n_l
    for i in range(n_l):
        mask = (rk == lk[i]) & (rt <= lt[i])
        row = out.iloc[i]
        if not mask.any():
            assert row["rt"] is None or np.isnan(row["rt"])
        else:
            # greatest rt; ties → greatest rid
            best_t = rt[mask].max()
            best_rid = np.arange(n_r)[mask & (rt == best_t)].max()
            assert row["rt"] == best_t and row["rid"] == best_rid


def test_asof_join_tiebreak_and_no_match():
    left = _mk([1, 2], [5, 6], [100, 100])
    # key 5: two right rows at the same ts → greatest rid wins; key 6: none
    right = _right([10, 11], [5, 5], [90, 90])
    out = temporal.asof_join(
        rd.from_arrow(left), rd.from_arrow(right),
        key="k", left_on="t", right_on="rt", right_cols=["rid"],
        tiebreak="rid", left_schema=LS, right_schema=RS, n_buckets=2,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    assert out.iloc[0]["rid"] == 11
    assert np.isnan(out.iloc[1]["rid"])
    # inclusive <=: a right row AT the left ts matches
    right_eq = _right([7], [5], [100])
    out2 = temporal.asof_join(
        rd.from_arrow(left), rd.from_arrow(right_eq),
        key="k", left_on="t", right_on="rt", right_cols=["rid"],
        tiebreak="rid", left_schema=LS, right_schema=RS, n_buckets=2,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    assert out2.iloc[0]["rid"] == 7


def test_range_join_matches_brute_force():
    rng = np.random.default_rng(8)
    n_l, n_r = 300, 300
    lk = rng.integers(0, 10, n_l)
    lt = rng.integers(0, 500, n_l)
    rk = rng.integers(0, 10, n_r)
    rt = rng.integers(0, 500, n_r)
    lo, hi = -40, 15
    out = temporal.range_join(
        rd.from_arrow(_mk(np.arange(n_l), lk, lt)),
        rd.from_arrow(_right(np.arange(n_r), rk, rt)),
        key="k", left_on="t", right_on="rt", right_cols=["rid"],
        lower=lo, upper=hi, left_schema=LS, right_schema=RS, n_buckets=4,
    ).to_pandas()
    got = set(zip(out["id"], out["rid"]))
    expect = {
        (i, j)
        for i in range(n_l)
        for j in np.flatnonzero((rk == lk[i]) & (rt >= lt[i] + lo) & (rt <= lt[i] + hi))
    }
    assert got == expect
    # each matching pair exactly ONCE — a bucketing regression that
    # re-emits per bucket would be invisible to the set compare
    assert len(out) == len(expect)


def test_tag_preserves_bucket_column():
    """The co-partition contract is real only if the 'bucket' column
    added by add_bucket_column passes through _tag — nulling it would
    collapse groupby('bucket') into ONE reducer (correct output, no
    parallelism, unbounded per-group memory)."""
    from osmpbf_ray.functions.joins import add_bucket_column

    left = _mk(list(range(64)), list(range(64)), [0] * 64)
    unified, rename = temporal._unified(LS, RS, ["rt", "rid"])
    tagged = temporal._tag(
        add_bucket_column(left, "k", 8), 1, unified, {c: c for c in LS.names}
    )
    buckets = tagged.column("bucket")
    assert buckets.null_count == 0
    assert len(set(buckets.to_pylist())) > 1  # multi-valued, not constant


def test_as_i64_exact_above_2_53():
    """Nullable int64 must not round-trip through float64: values above
    2^53 would silently lose low bits (the unified shuffle schema makes
    every ts column nullable)."""
    big = (1 << 60) + 1  # not representable in float64
    col = pa.chunked_array([pa.array([big, None, big + 2], type=pa.int64())])
    out = temporal._as_i64(col)
    assert out[0] == big and out[2] == big + 2


def test_asof_join_exact_keys_above_2_53():
    """End-to-end: as-of ts above 2^53 must join exactly (off-by-one
    timestamps distinguish matches only if no float coercion happens)."""
    base = 1 << 60
    left = _mk([1, 2], [5, 5], [base + 2, base + 1])
    right = _right([10, 11], [5, 5], [base + 2, base + 1])
    out = temporal.asof_join(
        rd.from_arrow(left), rd.from_arrow(right),
        key="k", left_on="t", right_on="rt", right_cols=["rid"],
        tiebreak="rid", left_schema=LS, right_schema=RS, n_buckets=2,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    # left t=base+2 → right rt=base+2 (rid 10); left t=base+1 → rid 11
    assert out.iloc[0]["rid"] == 10 and out.iloc[0]["rt"] == base + 2
    assert out.iloc[1]["rid"] == 11 and out.iloc[1]["rt"] == base + 1


def test_range_join_empty_and_bounds():
    left = _mk([1], [5], [100])
    empty_right = _right([], [], [])
    out = temporal.range_join(
        rd.from_arrow(left), rd.from_arrow(empty_right),
        key="k", left_on="t", right_on="rt", right_cols=["rid"],
        lower=-10, upper=10, left_schema=LS, right_schema=RS, n_buckets=2,
    )
    assert out.count() == 0
    with pytest.raises(ValueError, match="lower <= upper"):
        temporal.range_join(
            rd.from_arrow(left), rd.from_arrow(empty_right),
            key="k", left_on="t", right_on="rt", right_cols=["rid"],
            lower=10, upper=-10, left_schema=LS, right_schema=RS,
        )
