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
