"""Key set-op (intersect/except/union) and percent_rank/cume_dist tests."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from osmpbf_ray.functions.ranking import grouped_percent_rank
from osmpbf_ray.functions.setops import key_set_op


def _sides(seed=17):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 500, 800)
    b = rng.integers(250, 750, 800)
    return a, b


def test_key_set_ops_match_python_sets():
    a, b = _sides()
    la = rd.from_arrow(pa.table({"k": a}))
    lb = rd.from_arrow(pa.table({"kk": b}))
    sa, sb = set(a.tolist()), set(b.tolist())
    rows_i = [r["k"] for r in key_set_op(la, lb, "k", "intersect",
                                         right_key="kk").take_all()]
    rows_e = [r["k"] for r in key_set_op(la, lb, "k", "except",
                                         right_key="kk").take_all()]
    rows_u = [r["k"] for r in key_set_op(la, lb, "k", "union",
                                         right_key="kk").take_all()]
    assert set(rows_i) == sa & sb
    assert set(rows_e) == sa - sb
    assert set(rows_u) == sa | sb
    # SQL set ops return DISTINCT rows — duplicates would be invisible
    # to the set compares above
    for rows in (rows_i, rows_e, rows_u):
        assert len(rows) == len(set(rows))


def test_key_set_op_string_keys_and_output_distinct():
    la = rd.from_arrow(pa.table({"k": ["a", "a", "b", "c", "c"]}))
    lb = rd.from_arrow(pa.table({"k": ["b", "b", "d"]}))
    out = key_set_op(la, lb, "k", "union").take_all()
    ks = [r["k"] for r in out]
    assert sorted(ks) == ["a", "b", "c", "d"]  # distinct, right-only included


def test_key_set_op_bad_op_raises():
    la = rd.from_arrow(pa.table({"k": [1]}))
    with pytest.raises(ValueError, match="op must be"):
        key_set_op(la, la, "k", "minus")


def test_percent_rank_matches_pandas_with_ties():
    rng = np.random.default_rng(23)
    t = pa.table({"g": rng.integers(0, 30, 1500),
                  "v": rng.integers(0, 6, 1500),
                  "id": np.arange(1500, dtype=np.int64)})
    out = (grouped_percent_rank(rd.from_arrow(t), "g", "v")
           .to_pandas().set_index("id").sort_index())
    df = t.to_pandas()
    # pandas: rank(method='min') == SQL rank(); cume_dist == rank(method='max')/n
    gr = df.groupby("g")["v"]
    n = gr.transform("size")
    rank = gr.rank(method="min")
    exp_pr = np.where(n > 1, (rank - 1) / np.maximum(n - 1, 1), 0.0)
    exp_cd = (gr.rank(method="max") / n).to_numpy()
    got = out.loc[df["id"], ["pr", "cd"]].to_numpy()
    assert np.array_equal(got[:, 0], exp_pr)
    assert np.array_equal(got[:, 1], exp_cd)


def test_percent_rank_single_row_groups_zero():
    t = pa.table({"g": [1, 2, 3], "v": [9, 9, 9]})
    out = grouped_percent_rank(rd.from_arrow(t), "g", "v").to_pandas()
    assert (out["pr"] == 0.0).all()
    assert (out["cd"] == 1.0).all()


def test_key_set_op_empty_batches_keep_string_schema():
    """An upstream filter that empties some batches must not flip the
    key column to a null-typed Arrow array (schema-consistency across
    blocks — the empty-np.unique-on-object pitfall)."""
    la = rd.from_arrow(pa.table({"k": ["a", "zz", "b", "zz"]})).map_batches(
        lambda b: b.filter(pa.compute.equal(b.column("k"), "zz")),
        batch_format="pyarrow").repartition(4)
    lb = rd.from_arrow(pa.table({"k": ["zz", "q"]}))
    out = key_set_op(la, lb, "k", "intersect").take_all()
    assert [r["k"] for r in out] == ["zz"]


def test_grouped_mode_null_values_raise():
    import pytest as _pytest

    from osmpbf_ray.functions.aggregates import grouped_mode

    t = pa.table({"g": [1, 1], "v": pa.array(["a", None])})
    with _pytest.raises(Exception, match="null"):
        grouped_mode(rd.from_arrow(t), "g", "v").materialize()
