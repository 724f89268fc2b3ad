"""Similarity search over an embedding column: brute-force cosine top-k
baseline + IVF (coarse-quantizer) scale path.

Shape for 100 TB: the query matrix is SMALL and broadcast once
(``ray.put``); the embedding table STREAMS through ``map_batches``. Each
batch computes a (batch × queries) matmul and emits only its local top-k
per query (partial), so the final reduce sees #batches × k rows, not the
table. That is the same partial+final contract as the reference's
par_map_reduce (/root/reference/src/reader.rs:119-142).

All stages run as ELASTIC TASKS with once-per-worker cached state
(``_task_stage``): their setup is microseconds, so an actor pool would
pay seconds of spin-up for nothing. The ``concurrency`` parameters are
retained for API compatibility and ignored.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from osmpbf_ray.functions.blocks import arrow_clean
# module-top import: the wrapper runs inside WORKER-executed task
# bodies, where runtime `from osmpbf_ray...` imports fail under
# pickle-by-value when the driver cwd can't import the package
from osmpbf_ray.state.workercache import task_stage as _task_stage


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def round_half_away(arr: np.ndarray, d: int) -> np.ndarray:
    """DuckDB-compatible rounding (half away from zero); shared by the
    partial AND final ranking so engine order == oracle order on ties."""
    s = 10.0 ** d
    return np.sign(arr) * np.floor(np.abs(arr) * s + 0.5) / s


def vecs_to_numpy(col, dtype=np.float64) -> np.ndarray:
    """Zero-copy-ish (n, d) matrix from an Arrow list/fixed_size_list
    column: flatten once + reshape, never ``to_pylist`` (the old per-batch
    Python materialization dominated the ANN stage cost)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    if n == 0:
        return flat.reshape(0, 0).astype(dtype)
    if pa.types.is_fixed_size_list(arr.type):
        d = arr.type.list_size
    else:
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(offs)
        if lens.min() != lens.max():
            raise ValueError("ragged embedding column — expected fixed dimension")
        d = int(lens[0])
    m = flat.reshape(n, d)
    return m if m.dtype == dtype else m.astype(dtype)


class BruteForceTopK:
    """Per-batch partial top-k against a broadcast query matrix.

    Ranks on ROUNDED cosine with id tie-break (ties at a batch's k
    boundary would otherwise select different rows than the oracle's
    ``ORDER BY round(sim, 9) DESC, vec_id``)."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        qids, qvecs = ray.get(queries_ref)
        self.qids = np.asarray(qids)
        self.q = _unit(np.asarray(qvecs, dtype=np.float64))
        self.k, self.id_col, self.vec_col = k, id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        if len(ids) == 0:
            return pa.table(
                {"query_id": pa.array([], type=pa.int64()),
                 self.id_col: pa.array([], type=pa.int64()),
                 "cosine": pa.array([], type=pa.float64())}
            )
        vecs = _unit(vecs_to_numpy(batch.column(self.vec_col)))
        sim = round_half_away(vecs @ self.q.T, 9)  # (batch, nq)
        k = min(self.k, len(ids))
        out_q, out_id, out_sim = [], [], []
        for qi in range(sim.shape[1]):
            order = np.lexsort((ids, -sim[:, qi]))[:k]
            out_q.append(np.full(k, self.qids[qi]))
            out_id.append(ids[order])
            out_sim.append(sim[order, qi])
        return pa.table(
            {
                "query_id": np.concatenate(out_q),
                self.id_col: np.concatenate(out_id),
                "cosine": np.concatenate(out_sim),
            }
        )


def brute_force_topk(ds, query_ids, query_vecs, k=10, id_col="vec_id",
                     vec_col="embedding", concurrency=(1, 4)):
    """Global top-k per query: streamed partials + tiny per-query final
    reduce (groupby over ≤ #batches×k rows)."""
    ref = ray.put((np.asarray(query_ids), np.asarray(query_vecs, dtype=np.float64)))
    partials = ds.map_batches(
        _task_stage(BruteForceTopK, (ref.hex(), k, id_col, vec_col),
                    queries_ref=ref, k=k, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def final(g: pd.DataFrame):
        return arrow_clean(
            g.sort_values(["cosine", id_col], ascending=[False, True], kind="stable").head(k)
        )

    return partials.groupby("query_id").map_groups(final, batch_format="pandas")


# --- IVF: coarse k-means quantizer + probed search --------------------------


def train_centroids(sample: np.ndarray, n_centroids: int, iters: int = 10,
                    seed: int = 13) -> np.ndarray:
    """Mini k-means on a driver-side sample (Lloyd, deterministic seed)."""
    rng = np.random.default_rng(seed)
    sample = _unit(np.asarray(sample, dtype=np.float64))
    cent = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(iters):
        assign = (sample @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _unit(cent)
    return cent


class IvfAssignStage:
    def __init__(self, centroids_ref, vec_col: str):
        self.cent = ray.get(centroids_ref)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("ivf_list", pa.array([], type=pa.int64()))
        vecs = _unit(vecs_to_numpy(batch.column(self.vec_col)))
        assign = (vecs @ self.cent.T).argmax(axis=1).astype(np.int64)
        return batch.append_column("ivf_list", pa.array(assign))


@ray.remote(num_cpus=0)
class ScanCounter:
    """Zero-CPU counter actor: the probe stage reports every row it
    actually scanned, making IO pruning TESTABLE (rows_scanned < table
    rows whenever ``n_probe < n_centroids`` on the clustered layout)."""

    def __init__(self):
        self.n = 0

    def add(self, n: int) -> None:
        self.n += int(n)

    def get(self) -> int:
        return self.n


class ProbedTopK:
    """Per-batch per-list partial top-k: rows carry an ``ivf_list``
    column; only lists some query probes contribute FLOPs. Ranks on
    ROUNDED cosine with id tie-break — the same composite
    BruteForceTopK uses, so full-probe IVF (n_probe == n_centroids) is
    bit-equal to brute force and shares its SQL oracle."""

    def __init__(self, probe_ref, k: int, id_col: str, vec_col: str,
                 counter=None):
        self.qids, self.q, self.probe_map = ray.get(probe_ref)
        self.k, self.id_col, self.vec_col = k, id_col, vec_col
        self.counter = counter

    def _empty(self) -> pa.Table:
        return pa.table(
            {"query_id": pa.array([], type=pa.int64()),
             self.id_col: pa.array([], type=pa.int64()),
             "cosine": pa.array([], type=pa.float64())}
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        if self.counter is not None:
            self.counter.add.remote(len(ids))
        if len(ids) == 0:
            return self._empty()
        lists_col = batch.column("ivf_list")
        if not pa.types.is_integer(lists_col.type):
            # hive partition values come back as strings from the
            # clustered-layout read
            lists_col = pc.cast(lists_col, pa.int64())
        lists = lists_col.to_numpy()
        vecs = _unit(vecs_to_numpy(batch.column(self.vec_col)))
        out_q, out_id, out_sim = [], [], []
        for li in np.unique(lists):
            qrows = self.probe_map.get(int(li))
            if not qrows:
                continue
            rows = np.flatnonzero(lists == li)
            sim = round_half_away(vecs[rows] @ self.q[qrows].T, 9)
            kk = min(self.k, len(rows))
            rid = ids[rows]
            for j, qi in enumerate(qrows):
                top = np.lexsort((rid, -sim[:, j]))[:kk]
                out_q.append(np.full(kk, self.qids[qi]))
                out_id.append(rid[top])
                out_sim.append(sim[top, j])
        if not out_q:
            return self._empty()
        return pa.table(
            {
                "query_id": np.concatenate(out_q),
                self.id_col: np.concatenate(out_id),
                "cosine": np.concatenate(out_sim),
            }
        )


def _probe_plan(cent: np.ndarray, query_ids, query_vecs, n_probe: int):
    """(unit queries, probed-list -> query rows map) for a centroid set."""
    q = _unit(np.asarray(query_vecs, dtype=np.float64))
    n_probe = min(n_probe, len(cent))
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    probe_map: dict[int, list[int]] = {}
    for qi, lists in enumerate(probes):
        for li in lists:
            probe_map.setdefault(int(li), []).append(qi)
    return q, probe_map


def _topk_final(partials, k: int, id_col: str):
    def final(g: pd.DataFrame):
        return arrow_clean(
            g.sort_values(["cosine", id_col], ascending=[False, True],
                          kind="stable").head(k)
        )

    return partials.groupby("query_id").map_groups(final, batch_format="pandas")


def _train_from_ds(ds, vec_col: str, n_centroids: int, sample_size: int,
                   seed: int) -> np.ndarray:
    sample_rows = ds.select_columns([vec_col]).take(sample_size)
    sample = np.array([r[vec_col] for r in sample_rows], dtype=np.float64)
    return train_centroids(sample, n_centroids, seed=seed)


def ivf_build(ds, index_dir: str, n_centroids: int = 16,
              vec_col: str = "embedding", sample_size: int = 2048,
              concurrency=(1, 4), seed: int = 13) -> np.ndarray:
    """Build the LIST-CLUSTERED IVF layout: one assign pass over the
    table, then a hive-partitioned parquet write
    (``<index_dir>/lists/ivf_list=<i>/...``) plus a centroids sidecar.
    :func:`ivf_search` then reads ONLY probed partitions — ``n_probe``
    prunes the SCAN (IO), not just per-batch FLOPs. One shuffle-free
    write buys every subsequent search a pruned read; at 100 TB this is
    the difference between touching n_probe/n_centroids of the bytes
    and streaming all of them."""
    lists_dir = os.path.join(index_dir, "lists")
    if os.path.isdir(lists_dir) and os.listdir(lists_dir):
        # write_parquet APPENDS part files — a dirty dir would
        # double-count rows on read
        raise FileExistsError(f"IVF lists dir {lists_dir!r} is not empty")
    os.makedirs(index_dir, exist_ok=True)
    cent = _train_from_ds(ds, vec_col, n_centroids, sample_size, seed)
    cent_ref = ray.put(cent)
    assigned = ds.map_batches(
        _task_stage(IvfAssignStage, (cent_ref.hex(), vec_col),
                    centroids_ref=cent_ref, vec_col=vec_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    assigned.write_parquet(lists_dir, partition_cols=["ivf_list"])
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    return cent


def ivf_search(index_dir: str, query_ids, query_vecs, k: int = 10,
               n_probe: int = 4, id_col: str = "vec_id",
               vec_col: str = "embedding", concurrency=(1, 4),
               scan_counter=None):
    """Probed search over an :func:`ivf_build` layout. Non-probed
    partitions are pruned at FILE level (``PathPartitionFilter`` on the
    hive path) — their parquet bytes are never opened. Pass a
    :class:`ScanCounter` handle as ``scan_counter`` to measure rows
    actually scanned."""
    import ray.data as rd
    from ray.data.datasource.partitioning import (Partitioning,
                                                  PathPartitionFilter)

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    q, probe_map = _probe_plan(cent, query_ids, query_vecs, n_probe)
    probed = frozenset(probe_map)
    ds = rd.read_parquet(
        os.path.join(index_dir, "lists"),
        columns=[id_col, vec_col, "ivf_list"],
        partitioning=Partitioning("hive"),
        partition_filter=PathPartitionFilter.of(
            lambda kv: int(kv["ivf_list"]) in probed, style="hive"),
    )
    probe_ref = ray.put((np.asarray(query_ids), q, probe_map))
    partials = ds.map_batches(
        _task_stage(ProbedTopK,
                    (probe_ref.hex(), k, id_col, vec_col, str(scan_counter)),
                    probe_ref=probe_ref, k=k, id_col=id_col,
                    vec_col=vec_col, counter=scan_counter),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _topk_final(partials, k, id_col)


def ivf_topk(ds, query_ids, query_vecs, k=10, n_centroids=16, n_probe=4,
             id_col="vec_id", vec_col="embedding", sample_size=2048,
             concurrency=(1, 4), seed=13, scan_counter=None):
    """ONE-SHOT IVF search: assign rows to coarse lists in-stream and
    search only the ``n_probe`` lists nearest each query. Every block
    still streams through the probe stage (non-probed lists save FLOPs,
    not IO) — right when the table is searched once and an index write
    wouldn't amortize. For repeated or IO-pruned search, use
    :func:`ivf_build` + :func:`ivf_search` (list-clustered layout; the
    read skips non-probed partitions entirely). Approximate (recall < 1
    when the true neighbor's list isn't probed); with ``n_probe ==
    n_centroids`` the result is bit-equal to ``brute_force_topk`` (same
    rounded-cosine + id-tie-break ranking) — which is how the SQL
    oracle checks it."""
    cent = _train_from_ds(ds, vec_col, n_centroids, sample_size, seed)
    cent_ref = ray.put(cent)

    assigned = ds.map_batches(
        _task_stage(IvfAssignStage, (cent_ref.hex(), vec_col),
                    centroids_ref=cent_ref, vec_col=vec_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    q, probe_map = _probe_plan(cent, query_ids, query_vecs, n_probe)
    probe_ref = ray.put((np.asarray(query_ids), q, probe_map))
    partials = assigned.map_batches(
        _task_stage(ProbedTopK,
                    (probe_ref.hex(), k, id_col, vec_col, str(scan_counter)),
                    probe_ref=probe_ref, k=k, id_col=id_col,
                    vec_col=vec_col, counter=scan_counter),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _topk_final(partials, k, id_col)
