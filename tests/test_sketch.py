"""HyperLogLog sketch: accuracy bounds, merge associativity, determinism."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmpbf_ray.stages import sketch


def test_hll_accuracy_int_keys():
    rng = np.random.default_rng(5)
    for pool in (100, 5_000, 50_000):
        vals = rng.choice(np.arange(pool) + 1_000_000, size=pool * 3, replace=True)
        true_n = len(np.unique(vals))  # sampling with replacement ≠ full pool
        regs = sketch.hll_partial(vals, p=12)
        est = sketch.hll_estimate(regs)
        assert abs(est / true_n - 1) < 0.05, (true_n, est)  # ~3σ at p=12


def test_hll_merge_equals_union():
    rng = np.random.default_rng(6)
    a = rng.integers(0, 10_000, 20_000)
    b = rng.integers(5_000, 15_000, 20_000)
    merged = sketch.hll_merge(sketch.hll_partial(a), sketch.hll_partial(b))
    whole = sketch.hll_partial(np.concatenate([a, b]))
    assert (merged == whole).all()  # register-wise max == sketch of union


def test_hll_string_keys_deterministic():
    vals = np.array([f"doc-{i%500}" for i in range(5000)], dtype=object)
    r1 = sketch.hll_partial(vals)
    r2 = sketch.hll_partial(vals)
    assert (r1 == r2).all()
    est = sketch.hll_estimate(r1)
    assert abs(est / 500 - 1) < 0.1


def test_bloom_no_false_negatives_and_low_fp():
    rng = np.random.default_rng(8)
    keys = rng.choice(1_000_000, 20_000, replace=False)
    bits = sketch.bloom_build(keys, n_bits_pow=20)
    assert sketch.bloom_contains(bits, keys).all()  # no false negatives
    others = np.setdiff1d(rng.choice(10_000_000, 50_000, replace=False), keys)
    fp = sketch.bloom_contains(bits, others).mean()
    assert fp < 0.05, fp


def test_bloom_semi_join_exact():
    rng = np.random.default_rng(9)
    big = pa.table({"k": rng.integers(0, 10_000, 50_000), "v": np.arange(50_000)})
    keys = np.arange(0, 10_000, 7)
    out = sketch.bloom_semi_join(rd.from_arrow(big), "k", keys).to_pandas()
    expect = big.to_pandas()[big.to_pandas()["k"].isin(keys)]
    assert len(out) == len(expect)
    assert set(out["v"]) == set(expect["v"])


def test_hash_sample_deterministic_and_key_coherent():
    rng = np.random.default_rng(10)
    tbl = pa.table({"k": rng.integers(0, 5_000, 40_000), "v": np.arange(40_000)})
    s1 = sketch.hash_sample(rd.from_arrow(tbl), "k", 0.2).to_pandas()
    s2 = sketch.hash_sample(rd.from_arrow(tbl).repartition(7), "k", 0.2).to_pandas()
    assert sorted(s1["v"]) == sorted(s2["v"])  # partition-invariant
    # all-or-nothing per key
    kept = set(s1["k"])
    full = tbl.to_pandas()
    assert len(s1) == full["k"].isin(kept).sum()
    # rate in a loose band (binomial over ~5000 distinct keys)
    frac = len(kept) / full["k"].nunique()
    assert 0.15 < frac < 0.25, frac


def test_approx_distinct_dataset():
    n, true_n = 60_000, 7_000
    rng = np.random.default_rng(7)
    ds = rd.from_arrow(pa.table({"k": rng.integers(0, true_n, n)}))
    est = sketch.approx_distinct(ds, "k", p=12)
    exact = true_n  # dense draw of 60k over 7k keys covers all with P≈1
    assert abs(est / exact - 1) < 0.05


def test_bloom_from_ds_equals_driver_build():
    """Distributed Bloom build (per-block partials OR-merged) sets
    exactly the same bits as a driver-side build over the same keys."""
    import ray.data as rd

    rng = np.random.default_rng(4)
    keys = rng.integers(0, 1 << 40, size=5000)
    tbl = pa.table({"k": keys})
    bits_dist = sketch.bloom_from_ds(
        rd.from_arrow(tbl).repartition(8), "k", n_bits_pow=18)
    bits_drv = sketch.bloom_build(keys, n_bits_pow=18)
    assert np.array_equal(bits_dist, bits_drv)
    assert sketch.bloom_contains(bits_dist, keys).all()
