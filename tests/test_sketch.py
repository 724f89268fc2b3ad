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


def test_approx_distinct_dataset():
    n, true_n = 60_000, 7_000
    rng = np.random.default_rng(7)
    ds = rd.from_arrow(pa.table({"k": rng.integers(0, true_n, n)}))
    est = sketch.approx_distinct(ds, "k", p=12)
    exact = true_n  # dense draw of 60k over 7k keys covers all with P≈1
    assert abs(est / exact - 1) < 0.05
