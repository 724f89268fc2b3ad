"""Grouped-aggregate operator tests (functions/aggregates.py):
string_agg, mode, fixed histogram, integer co-moments, grouped bbox."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from osmpbf_ray.functions.aggregates import (
    fixed_histogram,
    grouped_bbox,
    grouped_comoments,
    grouped_mode,
    grouped_string_agg,
)


def _rand_table(n=2000, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table({
        "g": rng.integers(0, 40, n),
        "v": rng.integers(0, 8, n),
        "name": pa.array([f"s{i:04d}" for i in rng.integers(0, 500, n)]),
        "ord": np.arange(n, dtype=np.int64),
        "x": rng.integers(-100, 100, n),
        "y": rng.integers(0, 50, n),
    })


def test_string_agg_matches_pandas_ordered():
    t = _rand_table()
    out = grouped_string_agg(rd.from_arrow(t), "g", "name",
                             order_cols=["ord"], sep="|",
                             out_col="names").to_pandas()
    df = t.to_pandas().sort_values(["g", "ord"])
    exp = df.groupby("g")["name"].agg("|".join)
    got = out.set_index("g")["names"]
    assert got.sort_index().equals(exp.sort_index())


def test_string_agg_skips_null_values():
    t = pa.table({"g": [1, 1, 1, 2], "ord": [0, 1, 2, 0],
                  "name": pa.array(["a", None, "b", None])})
    out = grouped_string_agg(rd.from_arrow(t), "g", "name",
                             order_cols=["ord"], out_col="names").to_pandas()
    got = dict(zip(out["g"], out["names"]))
    # NULL values drop (SQL string_agg); an all-null group emits nothing
    assert got == {1: "a,b"}


def test_string_agg_null_order_raises():
    t = pa.table({"g": [1, 1], "ord": pa.array([0, None], pa.int64()),
                  "name": ["a", "b"]})
    ds = grouped_string_agg(rd.from_arrow(t), "g", "name", order_cols=["ord"])
    with pytest.raises(Exception, match="null"):
        ds.materialize()


def test_grouped_mode_matches_sql_tiebreak():
    t = _rand_table(seed=13)
    out = grouped_mode(rd.from_arrow(t), "g", "v").to_pandas()
    df = t.to_pandas()
    c = df.groupby(["g", "v"]).size().reset_index(name="n")
    # SQL rule: per group ORDER BY n DESC, v ASC LIMIT 1
    c = c.sort_values(["g", "n", "v"], ascending=[True, False, True])
    exp = c.groupby("g").head(1).set_index("g")
    got = out.set_index("g").sort_index()
    assert (got["mode"] == exp["v"].sort_index()).all()
    assert (got["n"] == exp["n"].sort_index()).all()


def test_grouped_mode_string_values():
    t = pa.table({"g": [1, 1, 1, 1, 2, 2],
                  "v": ["b", "a", "a", "b", "z", "z"]})
    out = grouped_mode(rd.from_arrow(t), "g", "v").to_pandas()
    got = out.set_index("g")
    # tie in group 1 (a=2, b=2) → lexicographically smallest wins
    assert got.loc[1, "mode"] == "a" and got.loc[1, "n"] == 2
    assert got.loc[2, "mode"] == "z" and got.loc[2, "n"] == 2


def test_fixed_histogram_matches_numpy_and_drops_out_of_range():
    rng = np.random.default_rng(3)
    x = rng.integers(-50, 1050, 5000)
    ds = rd.from_arrow(pa.table({"x": x}))
    out = fixed_histogram(ds, "x", lo=0, width=100, n_bins=10).to_pandas()
    inr = x[(x >= 0) & (x < 1000)]
    exp = np.bincount(inr // 100, minlength=10)
    got = np.zeros(10, dtype=np.int64)
    got[out["bucket"].to_numpy()] = out["n"].to_numpy()
    assert (got == exp).all()
    assert got.sum() == len(inr)  # out-of-range rows dropped, not clamped


def test_grouped_comoments_exact_integers():
    t = _rand_table(seed=29)
    out = grouped_comoments(rd.from_arrow(t), "g", "x", "y").to_pandas()
    df = t.to_pandas()
    exp = df.groupby("g").apply(
        lambda d: pd.Series({
            "n": len(d), "sum_x": d.x.sum(), "sum_y": d.y.sum(),
            "sum_xx": (d.x * d.x).sum(), "sum_yy": (d.y * d.y).sum(),
            "sum_xy": (d.x * d.y).sum()}),
        include_groups=False).astype(np.int64)
    got = out.set_index("g").sort_index()
    assert got[exp.columns].equals(exp.sort_index())
    # the moments reconstruct numpy's corr to float precision
    r = {}
    for g, m in got.iterrows():
        cov = m.sum_xy / m.n - (m.sum_x / m.n) * (m.sum_y / m.n)
        vx = m.sum_xx / m.n - (m.sum_x / m.n) ** 2
        vy = m.sum_yy / m.n - (m.sum_y / m.n) ** 2
        r[g] = cov / np.sqrt(vx * vy)
    for g, d in df.groupby("g"):
        assert abs(r[g] - np.corrcoef(d.x, d.y)[0, 1]) < 1e-9


def test_grouped_bbox_matches_pandas():
    t = _rand_table(seed=41)
    ds = rd.from_arrow(pa.table({
        "w": t.column("g"), "lat": t.column("x"), "lon": t.column("y")}))
    out = grouped_bbox(ds, "w", "lat", "lon").to_pandas()
    df = t.to_pandas()
    exp = df.groupby("g").agg(min_lat=("x", "min"), max_lat=("x", "max"),
                              min_lon=("y", "min"), max_lon=("y", "max"),
                              n_pts=("x", "size"))
    got = out.set_index("w").sort_index()
    assert (got == exp.sort_index()).all().all()
