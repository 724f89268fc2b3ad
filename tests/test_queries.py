"""Query-registry conformance: every oracle-backed entry in
osmpbf_ray.pipelines.queries must match its DuckDB oracle exactly
(row count + columns + order-insensitive values) at sf0.001 — the same
comparison the external driver runs at sf0.01."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from osmpbf_ray.pipelines import queries as q

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _to_df(res) -> pd.DataFrame:
    return res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)


@pytest.mark.parametrize("name", sorted(q.oracle_sql()))
def test_query_matches_oracle(name, con):
    got = _to_df(q.queries()[name](SF))
    exp = con.execute(q.oracle_sql()[name]).df()
    # a query whose oracle returns 0 rows at this scale factor would
    # pass every comparison below VACUOUSLY — the fixtures guarantee
    # every registered query produces rows at sf0.001
    assert len(exp) > 0, f"{name}: oracle empty at sf0.001 — toothless compare"
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    cols = sorted(exp.columns)
    assert sorted(got.columns) == cols
    g = got[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    x = exp[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    for c in cols:
        gv, xv = g[c].to_numpy(), x[c].to_numpy()
        if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(xv.dtype, np.floating):
            assert np.allclose(
                gv.astype(float), xv.astype(float), rtol=0, atol=0, equal_nan=True
            ), f"{name}.{c} float mismatch"
        else:
            assert (gv == xv).all(), f"{name}.{c} value mismatch"


# genuinely non-SQL-expressible results (approximate values): the
# driver records the weaker rows-only check for these; everything else
# MUST carry an oracle
ROWS_ONLY = {"approx_quantiles_price"}


def test_registry_oracle_parity():
    """Every registry query carries a DuckDB oracle and vice versa —
    a new queries() entry can't silently ship unoracled (the documented
    ROWS_ONLY set is the only exception)."""
    assert set(q.queries()) - ROWS_ONLY == set(q.oracle_sql())


@pytest.mark.parametrize(
    "name,min_rows",
    [("ivf_knn", 1), ("image_resize", 1), ("knn_join_geo_kring", 1),
     ("flagship", 0), ("approx_quantiles_price", 5)],
)
def test_rows_only_queries_run(name, min_rows):
    got = _to_df(q.queries()[name](SF))
    assert len(got) >= min_rows
    assert len(got.columns) > 0


def test_splitmix64_sql_bit_exact(con):
    """The DuckDB splitmix64 CTE (32-bit-decomposed wrapping multiplies)
    is bit-identical to the numpy kernel across the u64 domain edges."""
    import pyarrow as pa

    from osmpbf_ray.stages.text import splitmix64

    keys = np.concatenate(
        [np.arange(0, 500), np.array([2**62, 2**63 - 1, 123456789012345, 2**53 + 1])]
    ).astype(np.int64)
    con.register("smtest", pa.table({"k": keys}))
    sql = q._splitmix64_cte("k", "k", "smtest") + " SELECT k, h FROM smh ORDER BY k"
    got = con.execute(sql).df()["h"].to_numpy().astype(np.uint64)
    exp = splitmix64(np.sort(keys).view(np.uint64))
    assert (got == exp).all()


def test_shipping_priority_partitioned_path_identical(con):
    """Size gate: forcing the qualifying-order table above the broadcast
    bound (broadcast_bytes=0) must route through the distributed
    partitioned_hash_join date-attach and produce identical rows."""
    a = _to_df(q.q_shipping_priority(SF))
    b = _to_df(q.q_shipping_priority(SF, broadcast_bytes=0))
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
    assert len(a) > 0


def test_grouped_topk_matches_pandas_and_paths():
    """grouped_topk == pandas groupby-head brute force; precombine on/off
    and ascending variants agree."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from osmpbf_ray.functions import ranking

    rng = np.random.default_rng(3)
    n = 5000
    t = pa.table({
        "g": rng.integers(0, 200, n),
        "v": rng.integers(0, 1000, n),
        "id": np.arange(n, dtype=np.int64),
    })
    for precombine in (False, True):
        out = ranking.grouped_topk(rd.from_arrow(t), "g", "v", k=3,
                                   tiebreak="id", precombine=precombine
                                   ).to_pandas().sort_values(["g", "rank"])
        df = t.to_pandas().sort_values(["v", "id"], ascending=[False, True])
        exp = df.groupby("g").head(3)
        got = set(zip(out["g"], out["id"]))
        assert got == set(zip(exp["g"], exp["id"]))
        assert out.groupby("g")["rank"].min().eq(1).all()
        assert out.groupby("g")["rank"].max().le(3).all()
    asc = ranking.grouped_topk(rd.from_arrow(t), "g", "v", k=1,
                               ascending=True, tiebreak="id").to_pandas()
    exp_min = t.to_pandas().sort_values(["v", "id"]).groupby("g").head(1)
    assert set(zip(asc["g"], asc["id"])) == set(zip(exp_min["g"], exp_min["id"]))


def test_local_supplier_revenue_bloom_path_identical(monkeypatch):
    """Size gate: forcing the customer keyset above the driver-read
    bound must route orders through the distributed-Bloom semi-filter +
    second partitioned join and produce identical revenue rows."""
    a = _to_df(q.q_local_supplier_revenue(SF))
    monkeypatch.setattr(q, "_CUST_KEYSET_MAX_ROWS", 0)
    b = _to_df(q.q_local_supplier_revenue(SF))
    key = ["n_name"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
    assert len(a) > 0
