"""Anti-join, offset window (lag), exact-quantile operator tests."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from osmpbf_ray.functions import window
from osmpbf_ray.functions.joins import anti_join, partitioned_anti_join
from osmpbf_ray.functions.quantile import exact_quantiles, grouped_quantiles


def _anti_fixture():
    rng = np.random.default_rng(11)
    left = pa.table({
        "k": rng.integers(0, 400, 1000),
        "payload": np.arange(1000, dtype=np.int64),
    })
    right = pa.table({"rk": rng.integers(0, 300, 2000)})
    expect = set(left.column("k").to_numpy()) - set(right.column("rk").to_numpy())
    return left, right, expect


def test_anti_join_broadcast_and_partitioned_identical():
    left, right, expect = _anti_fixture()
    outs = []
    for bb in (64 << 20, 0):  # broadcast path, then forced-distributed
        out = anti_join(rd.from_arrow(left), rd.from_arrow(right),
                        key="k", right_key="rk", broadcast_bytes=bb).to_pandas()
        assert set(out["k"]) == expect
        outs.append(out.sort_values(["k", "payload"]).reset_index(drop=True))
    assert outs[0].equals(outs[1])
    # row multiplicity preserved: every qualifying left row comes through
    k = left.column("k").to_numpy()
    assert len(outs[0]) == int(np.isin(k, np.array(sorted(expect))).sum())


def test_anti_join_null_left_keys_kept():
    # SQL NOT EXISTS with an equality correlate: NULL never matches,
    # so null-key left rows qualify — on BOTH paths
    left = pa.table({"k": pa.array([1, None, 2, None], type=pa.int64()),
                     "payload": pa.array([0, 1, 2, 3], type=pa.int64())})
    right = pa.table({"rk": pa.array([1, 3], type=pa.int64())})
    for bb in (64 << 20, 0):
        out = anti_join(rd.from_arrow(left), rd.from_arrow(right),
                        key="k", right_key="rk", broadcast_bytes=bb).to_pandas()
        assert sorted(out["payload"]) == [1, 2, 3]


def test_partitioned_anti_join_empty_right():
    left, _, _ = _anti_fixture()
    right = pa.table({"rk": pa.array([], type=pa.int64())})
    out = partitioned_anti_join(rd.from_arrow(left), rd.from_arrow(right),
                                key="k", right_key="rk").to_pandas()
    assert len(out) == left.num_rows


def test_partitioned_lag_matches_pandas():
    rng = np.random.default_rng(5)
    n = 4000
    t = pa.table({
        "key": rng.integers(0, 150, n),
        "ts": rng.integers(0, 10**6, n),
        "v": rng.normal(size=n),
        "id": np.arange(n, dtype=np.int64),
    })
    out = window.partitioned_lag(rd.from_arrow(t), "key", ["ts", "id"],
                                 lag_cols=["v", "id"]).to_pandas()
    df = t.to_pandas().sort_values(["key", "ts", "id"])
    g = df.groupby("key")
    df["v_lag"], df["id_lag"] = g["v"].shift(1), g["id"].shift(1)
    merged = out.set_index("id").sort_index()
    expd = df.set_index("id").sort_index()
    assert len(merged) == n
    assert np.allclose(merged["v_lag"], expd["v_lag"], equal_nan=True)
    a, b = merged["id_lag"].fillna(-1), expd["id_lag"].fillna(-1)
    assert (a.to_numpy() == b.to_numpy()).all()
    # exactly one null lag per key (its first row)
    assert merged["id_lag"].isna().sum() == df["key"].nunique()


def test_grouped_ntile_matches_sql_rule():
    """NTILE remainder rule: first len%n buckets take one extra row;
    n > group size gives buckets 1..len; string group keys."""
    from osmpbf_ray.functions.ranking import grouped_ntile

    rng = np.random.default_rng(53)
    sizes = {"a": 10, "b": 7, "c": 3, "d": 1}
    gs, vs = [], []
    for gname, sz in sizes.items():
        gs += [gname] * sz
        vs += list(rng.permutation(sz * 3)[:sz])
    t = pa.table({"g": pa.array(gs), "v": np.array(vs, dtype=np.int64),
                  "id": np.arange(len(gs), dtype=np.int64)})
    out = grouped_ntile(rd.from_arrow(t), "g", "v", n=4,
                        tiebreak="id").to_pandas()
    df = t.to_pandas()
    for gname, grp in df.groupby("g"):
        sub = out[out.g == gname].merge(grp, on=["g", "id"])
        # every fixture row must survive: deriving L from the merge
        # would shrink the oracle to fit dropped/mis-keyed rows
        assert len(sub) == sizes[gname]
        sub = sub.sort_values(["v_x", "id"])
        L = len(sub)
        q, r = L // 4, L % 4
        expect = []
        for b in range(1, 5):
            expect += [b] * ((q + 1) if b <= r else q)
        if q == 0:
            expect = list(range(1, L + 1))
        assert sub["tile"].tolist() == expect[:L], gname
    assert len(out) == len(df)


def test_pivot_sum_matches_pandas():
    from osmpbf_ray.functions.pivot import pivot_sum

    rng = np.random.default_rng(19)
    n = 5000
    t = pa.table({
        "k": rng.integers(0, 300, n),
        "p": pa.array(rng.choice(["x", "y", "z", "other"], n)),  # 'other' ∉ domain
        "v": rng.integers(0, 100, n).astype(np.float64),
    })
    out = pivot_sum(rd.from_arrow(t), "k", "p", "v", ["x", "y", "z"]).to_pandas()
    df = t.to_pandas()
    df = df[df["p"] != "other"]
    exp = df.pivot_table(index="k", columns="p", values="v",
                         aggfunc="sum", fill_value=0.0)
    keys_with_rows = set(df["k"])
    assert set(out["k"]) == keys_with_rows
    got = out.set_index("k").sort_index()
    for p in ("x", "y", "z"):
        e = exp[p].reindex(got.index, fill_value=0.0)
        assert (got[f"v_{p}"].to_numpy() == e.to_numpy()).all(), p
    # empty domain rejected; mismatched names rejected
    import pytest
    with pytest.raises(ValueError):
        pivot_sum(rd.from_arrow(t), "k", "p", "v", [])
    with pytest.raises(ValueError):
        pivot_sum(rd.from_arrow(t), "k", "p", "v", ["x"], col_names=["a", "b"])


def test_grouped_topk_rank_modes_match_pandas():
    """rank/dense_rank tie semantics vs pandas, with heavy ties; the
    kept SET is deterministic with no tiebreak; precombine agrees."""
    from osmpbf_ray.functions import ranking

    rng = np.random.default_rng(13)
    n = 4000
    t = pa.table({
        "g": rng.integers(0, 60, n),
        "v": rng.integers(0, 12, n),  # heavy ties
        "id": np.arange(n, dtype=np.int64),
    })
    df = t.to_pandas()
    for mode, method, k in (("rank", "min", 2), ("dense_rank", "dense", 2)):
        exp = df.copy()
        exp["rank"] = (exp.groupby("g")["v"]
                       .rank(method=method, ascending=False).astype(np.int64))
        exp = exp[exp["rank"] <= k]
        for precombine in (False, True):
            # repartition so the precombine path really sees PARTIAL
            # batches (local rank < global rank interplay)
            out = ranking.grouped_topk(rd.from_arrow(t).repartition(13),
                                       "g", "v", k=k,
                                       mode=mode, precombine=precombine
                                       ).to_pandas()
            assert set(zip(out["g"], out["id"])) == set(zip(exp["g"], exp["id"])), mode
            got = out.set_index("id")["rank"].sort_index()
            want = exp.set_index("id")["rank"].sort_index()
            assert (got.to_numpy() == want.to_numpy()).all(), mode


def test_rolling_sum_matches_pandas():
    rng = np.random.default_rng(31)
    n = 3000
    t = pa.table({
        "key": rng.integers(0, 80, n),
        "ord": rng.permutation(n).astype(np.int64),  # unique order
        "v": rng.integers(0, 500, n).astype(np.float64),
    })
    out = window.rolling_sum(rd.from_arrow(t), "key", ["ord"], "v",
                             window=4, out_col="r").to_pandas()
    df = t.to_pandas().sort_values(["key", "ord"])
    df["r"] = (df.groupby("key")["v"]
               .rolling(4, min_periods=1).sum().reset_index(level=0, drop=True))
    m = out.set_index(["key", "ord"]).sort_index()
    e = df.set_index(["key", "ord"]).sort_index()
    assert len(m) == n
    assert (m["r"].to_numpy() == e["r"].to_numpy()).all()


def test_stratified_sample_deterministic_and_capped():
    from osmpbf_ray.functions.ranking import stratified_sample

    rng = np.random.default_rng(41)
    n = 2000
    t = pa.table({
        "domain": pa.array([f"d{int(x)}" for x in rng.integers(0, 12, n)]),
        "id": rng.permutation(10 * n)[:n].astype(np.int64),
    })
    outs = []
    for ds in (rd.from_arrow(t), rd.from_arrow(t).repartition(7)):
        out = stratified_sample(ds, "domain", k=9, id_col="id").to_pandas()
        # per-group cap, 1-based contiguous ranks
        sizes = t.to_pandas().groupby("domain").size()
        got = out.groupby("domain").size()
        for d, s in sizes.items():
            assert got[d] == min(9, s)
        assert out.groupby("domain")["rank"].min().eq(1).all()
        outs.append(set(zip(out["domain"], out["id"])))
    assert outs[0] == outs[1]  # block-layout invariant


def test_exact_quantiles_matches_numpy_sorted():
    rng = np.random.default_rng(9)
    # heavy duplicates + skew to stress bin boundaries
    v = np.round(np.r_[rng.lognormal(3, 1, 7000), rng.integers(0, 5, 3000)], 2)
    ds = rd.from_arrow(pa.table({"x": v}))
    qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
    sv = np.sort(v)
    expect = [sv[int(np.floor(q * (len(v) - 1)))] for q in qs]
    got = exact_quantiles(ds, "x", qs, n_bins=64).to_pandas()
    assert list(got["q"]) == qs
    assert got["value"].tolist() == expect


def test_exact_quantiles_unmaterialized_matches():
    rng = np.random.default_rng(47)
    v = rng.normal(size=2000)
    ds = rd.from_arrow(pa.table({"x": v}))
    a = exact_quantiles(ds, "x", [0.25, 0.75], n_bins=32).to_pandas()
    b = exact_quantiles(ds, "x", [0.25, 0.75], n_bins=32,
                        materialize=False).to_pandas()
    assert a["value"].tolist() == b["value"].tolist()


def test_exact_quantiles_refinement_path():
    # max_collect=1 forces recursive bin refinement on nearly every rank
    rng = np.random.default_rng(2)
    v = rng.normal(size=3000)
    ds = rd.from_arrow(pa.table({"x": v}))
    qs = [0.1, 0.5, 0.9]
    sv = np.sort(v)
    expect = [sv[int(np.floor(q * (len(v) - 1)))] for q in qs]
    got = exact_quantiles(ds, "x", qs, n_bins=8, max_collect=1).to_pandas()
    assert got["value"].tolist() == expect


def test_grouped_quantiles_matches_brute_force():
    rng = np.random.default_rng(17)
    n = 6000
    t = pa.table({"g": rng.integers(0, 120, n),
                  "v": np.round(rng.normal(size=n), 3)})
    qs = [0.0, 0.5, 0.9, 1.0]
    out = grouped_quantiles(rd.from_arrow(t), "g", "v", qs).to_pandas()
    df = t.to_pandas()
    got = {(r.g, r.q): r.value for r in out.itertuples()}
    for g, grp in df.groupby("g"):
        sv = np.sort(grp["v"].to_numpy())
        for q in qs:
            assert got[(g, q)] == sv[int(np.floor(q * (len(sv) - 1)))], (g, q)
    assert len(out) == df["g"].nunique() * len(qs)


def test_exact_quantiles_zero_pile_regrids_fast():
    # >max_collect copies of 0.0 + an outlier: the 0-edge never exhausts
    # (ulp(0) is subnormal), so without the re-grid fast path this took
    # ~hundreds of full passes; with it, the pile resolves via one
    # min/max pass per no-progress level
    v = np.r_[np.zeros(500), np.array([1e300])]
    ds = rd.from_arrow(pa.table({"x": v}))
    got = exact_quantiles(ds, "x", [0.5, 1.0], n_bins=8, max_collect=10).to_pandas()
    assert got["value"].tolist() == [0.0, 1e300]


def test_resample_gapfill_matches_brute_force():
    from osmpbf_ray.functions.window import resample_gapfill

    rng = np.random.default_rng(29)
    n = 3000
    t = pa.table({
        "k": rng.integers(0, 40, n),
        "ts": rng.integers(0, 10**6, n) * np.int64(1000),  # sparse µs
    })
    out = resample_gapfill(rd.from_arrow(t), "k", "ts",
                           bucket_us=50_000_000).to_pandas()
    df = t.to_pandas()
    df["b"] = df["ts"] // 50_000_000
    for k, grp in df.groupby("k"):
        got = out[out.k == k].set_index("bucket")["n"].sort_index()
        present = grp.groupby("b").size()
        full = np.arange(present.index.min(), present.index.max() + 1)
        assert (got.index.to_numpy() == full).all(), k  # dense, no gaps
        exp = present.reindex(full, fill_value=0)
        assert (got.to_numpy() == exp.to_numpy()).all(), k
    assert out["n"].sum() == n
    # expansion cap fires instead of OOM
    import pytest
    wide = pa.table({"k": np.zeros(2, dtype=np.int64),
                     "ts": np.array([0, 10**15], dtype=np.int64)})
    with pytest.raises(Exception, match="max_expansion"):
        resample_gapfill(rd.from_arrow(wide), "k", "ts", bucket_us=1000,
                         max_expansion=10**6).to_pandas()


def test_null_partition_keys_raise():
    import pytest

    from osmpbf_ray.functions import window as w

    t = pa.table({"k": pa.array([1, None, 2], type=pa.int64()),
                  "o": pa.array([1, 2, 3], type=pa.int64()),
                  "v": pa.array([1.0, 2.0, 3.0])})
    with pytest.raises(Exception, match="null"):
        w.rolling_sum(rd.from_arrow(t), "k", ["o"], "v", window=2).to_pandas()


def test_null_order_values_and_timestamps_raise():
    import pytest

    from osmpbf_ray.functions import ranking
    from osmpbf_ray.functions.window import resample_gapfill

    t = pa.table({"g": pa.array([1, 1, 2], type=pa.int64()),
                  "v": pa.array([1.0, None, 2.0]),
                  "id": pa.array([0, 1, 2], type=pa.int64())})
    with pytest.raises(Exception, match="null"):
        ranking.grouped_topk(rd.from_arrow(t), "g", "v", k=1,
                             tiebreak="id").to_pandas()
    ev = pa.table({"k": pa.array([1, 1], type=pa.int64()),
                   "ts": pa.array([1000, None], type=pa.int64())})
    with pytest.raises(Exception, match="null"):
        resample_gapfill(rd.from_arrow(ev), "k", "ts",
                         bucket_us=100).to_pandas()


def test_pivot_sum_skips_null_values():
    from osmpbf_ray.functions.pivot import pivot_sum

    t = pa.table({"k": pa.array([7, 7, 8], type=pa.int64()),
                  "p": pa.array(["x", "x", "x"]),
                  "v": pa.array([5.0, None, 2.0])})
    out = pivot_sum(rd.from_arrow(t), "k", "p", "v", ["x"]).to_pandas()
    got = out.set_index("k")["v_x"]
    assert got[7] == 5.0 and got[8] == 2.0  # SQL SUM skips NULL inputs


def test_grouped_topk_string_desc_raises():
    import pytest

    from osmpbf_ray.functions import ranking

    t = pa.table({"g": pa.array([1, 1], type=pa.int64()),
                  "v": pa.array(["a", "b"])})
    with pytest.raises(Exception, match="descending"):
        ranking.grouped_topk(rd.from_arrow(t), "g", "v", k=1).to_pandas()


def test_tile_stats_partitioned_matches_shuffle():
    from osmpbf_ray.pipelines import tiles
    from osmpbf_ray.sources import fixtures

    import pytest

    images = fixtures.make_images(300)
    a = tiles.tile_stats(rd.from_arrow(images), z=6, final="shuffle").to_pandas()
    b = tiles.tile_stats(rd.from_arrow(images), z=6, final="partitioned").to_pandas()
    assert dict(zip(a["tile"], a["n"])) == dict(zip(b["tile"], b["n"]))
    with pytest.raises(ValueError, match="final"):
        tiles.tile_stats(rd.from_arrow(images), z=6, final="shufle")


def test_exact_quantiles_degenerate():
    # all-equal column: exhausted-range fast path
    ds = rd.from_arrow(pa.table({"x": np.full(500, 3.25)}))
    got = exact_quantiles(ds, "x", [0.1, 0.9]).to_pandas()
    assert got["value"].tolist() == [3.25, 3.25]
    # empty column
    empty = rd.from_arrow(pa.table({"x": pa.array([], type=pa.float64())}))
    assert exact_quantiles(empty, "x", [0.5]).num_rows == 0
    # one massive duplicate pile + a tail, tiny max_collect: the
    # unique+count terminal path must fire and stay exact
    v = np.r_[np.full(2000, 7.0), np.array([1.0, 9.0])]
    ds2 = rd.from_arrow(pa.table({"x": v}))
    sv = np.sort(v)
    qs = [0.0, 0.5, 1.0]
    got = exact_quantiles(ds2, "x", qs, n_bins=4, max_collect=10).to_pandas()
    assert got["value"].tolist() == [sv[int(np.floor(q * (len(v) - 1)))] for q in qs]


def test_approx_quantiles_rank_error_bound():
    """One-pass sketch: the returned value's TRUE rank must be within
    the documented 2n/k bound of the target rank, for skewed and
    uniform data; result is block-order invariant."""
    from osmpbf_ray.functions.quantile import approx_quantiles

    rng = np.random.default_rng(31)
    k = 512
    for data in (rng.standard_normal(20000) * 100,
                 rng.pareto(2.0, 20000),
                 np.repeat(rng.integers(0, 5, 200), 100).astype(float)):
        n = len(data)
        ds = rd.from_arrow(pa.table({"x": data})).repartition(13)
        out = approx_quantiles(ds, "x", [0.01, 0.25, 0.5, 0.75, 0.99],
                               k=k).to_pandas()
        s = np.sort(data)
        for q, v in zip(out["q"], out["value"]):
            target = q * (n - 1)
            lo = np.searchsorted(s, v, side="left")
            hi = np.searchsorted(s, v, side="right") - 1
            # a tie run spans ranks [lo, hi]; a target inside it is exact
            if lo <= target <= hi:
                rank_err = 0.0
            else:
                rank_err = min(abs(lo - target), abs(hi - target))
            assert rank_err <= 2 * n / k + 1, (q, v, rank_err)


def test_approx_quantiles_nulls_and_empty():
    from osmpbf_ray.functions.quantile import approx_quantiles

    t = pa.table({"x": pa.array([None, 1.0, None, 3.0], pa.float64())})
    out = approx_quantiles(rd.from_arrow(t), "x", [0.0, 1.0], k=16).to_pandas()
    assert out["value"].tolist() == [1.0, 3.0]
    e = pa.table({"x": pa.array([], pa.float64())})
    out = approx_quantiles(rd.from_arrow(e), "x", [0.5], k=16).to_pandas()
    assert out["value"].isna().all()


def test_normalize_text_batch_matches_duckdb():
    import duckdb

    from osmpbf_ray.stages.text import normalize_text_batch

    texts = ["Héllo,  World! 42", "a-b_c  d", "", "ALL CAPS 9", "  x  "]
    t = pa.table({"text": texts})
    got = normalize_text_batch(t).column("norm").to_pylist()
    exp = [r[0] for r in duckdb.sql(
        "SELECT trim(regexp_replace(regexp_replace(lower(s), '[^a-z0-9 ]+', "
        "' ', 'g'), ' +', ' ', 'g')) FROM (SELECT unnest($texts) AS s)",
        params={"texts": texts}).fetchall()]
    assert got == exp


def test_partitioned_joins_string_keys():
    """String keys must survive the distributed (bucketed) paths, not
    just the broadcast ones — the splitmix bucket hash routes strings
    through the crc32-per-distinct path."""
    from osmpbf_ray.functions.joins import anti_join, partitioned_hash_join

    left = pa.table({"user": ["a", "b", "c", "d"], "v": [1, 2, 3, 4]})
    right = pa.table({"user": ["b", "d", "e"]})
    out = anti_join(rd.from_arrow(left), rd.from_arrow(right), key="user",
                    broadcast_bytes=0).to_pandas()  # force distributed
    assert sorted(out["user"]) == ["a", "c"]
    small = pa.table({"user": ["a", "c"], "tag": [9, 8]})
    j = partitioned_hash_join(rd.from_arrow(left), rd.from_arrow(small),
                              key="user").to_pandas()
    assert sorted(zip(j["user"], j["tag"])) == [("a", 9), ("c", 8)]


def test_broadcast_lookup_join_list_payload():
    """List-typed non-key columns must pass through the broadcast join
    (acero rejects them; the index-take shape does not)."""
    from osmpbf_ray.functions.joins import broadcast_lookup_join

    left = pa.table({"id": [1, 2, 3, 2], "refs": [[1, 2], [3], [4, 5, 6], [7]]})
    small = pa.table({"id": [2, 3, 9], "name": ["b", "c", "z"]})
    out = broadcast_lookup_join(rd.from_arrow(left), small,
                                key="id", how="inner").to_pandas()
    assert sorted(out["name"]) == ["b", "b", "c"]
    out2 = broadcast_lookup_join(rd.from_arrow(left), small,
                                 key="id", how="left").to_pandas()
    assert len(out2) == 4 and out2["name"].isna().sum() == 1


def test_rolling_sum_rejects_valid_nan():
    from osmpbf_ray.functions import window as W

    t = pa.table({"g": [1, 1, 1], "o": [1, 2, 3],
                  "x": np.array([1.0, np.nan, 2.0])})
    with pytest.raises(Exception, match="NaN"):
        W.rolling_sum(rd.from_arrow(t), "g", ["o"], "x", window=2).materialize()


def test_exact_quantiles_validates_qs():
    from osmpbf_ray.functions.quantile import exact_quantiles, grouped_quantiles

    ds = rd.from_arrow(pa.table({"x": np.arange(100, dtype=np.float64)}))
    with pytest.raises(ValueError, match="fractions"):
        exact_quantiles(ds, "x", [99])
    with pytest.raises(ValueError, match="fractions"):
        exact_quantiles(ds, "x", [-0.1])
    gds = rd.from_arrow(pa.table({"g": [1] * 10, "x": np.arange(10.0)}))
    with pytest.raises(ValueError, match="fractions"):
        grouped_quantiles(gds, "g", "x", [1.5])
