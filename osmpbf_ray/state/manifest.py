"""Resumable partitioned output: per-partition manifest with lineage + metrics.

The reference has no sinks; its only incremental hook is the osmosis
replication sequence number carried in HeaderBlock
(/root/reference/src/block.rs:61-85), which external pipelines use as a
resume watermark. The engine makes that a first-class write layer
(north rule: "resumable from per-partition checkpoints with lineage +
metrics"):

* output = one directory per named partition (input shard / key range),
  written ATOMICALLY: parquet goes to ``<part>.tmp-<nonce>`` and the dir
  is renamed into place only when complete — a crashed run leaves no
  half-visible partition.
* manifest = one ``_COMMIT.json`` per partition directory
  ``{partition_id, lineage, row_count, checksum, metrics}``, made
  visible by the same atomic rename as the data; a rerun calls
  ``completed()`` (a glob over commit markers) and skips finished
  partitions.
* checksum = order-insensitive xor-of-row-hashes so resumed and fresh
  runs can be compared regardless of block ordering.

At 100 TB this is what makes a 10-hour job restartable: partition ids are
deterministic functions of the INPUT layout (fragment ranges), never of
scheduling order.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq


def table_checksum(tbl: pa.Table) -> int:
    """Order-insensitive 64-bit content checksum (xor of row hashes)."""
    import numpy as np
    import pandas as pd

    if tbl.num_rows == 0:
        return 0
    df = tbl.to_pandas()
    # str() of a >1000-element numpy array ELIDES the middle
    # ('[0 1 ... 999]'), so two long-list cells differing only there
    # would hash equal — serialize list cells fully instead
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: repr(v.tolist()) if isinstance(v, np.ndarray)
                else repr(v.as_py()) if hasattr(v, "as_py") else str(v))
    h = pd.util.hash_pandas_object(df.astype(str), index=False).to_numpy().astype(np.uint64)
    return int(np.bitwise_xor.reduce(h))


class Manifest:
    """Per-partition commit markers: ``part=<id>/_COMMIT.json``.

    The marker is written INSIDE the partition's temp dir before the
    atomic directory rename, so partition data and its manifest record
    become visible in one filesystem operation. No shared append-only
    file: concurrent writers never touch the same path, which stays
    correct on NFS-like shared stores where O_APPEND interleaving is not
    atomic (a round-1 defect — a torn append could corrupt resume).
    """

    def __init__(self, out_dir: str | Path):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)

    def _commit_path(self, partition_id: str) -> Path:
        return self.out_dir / f"part={partition_id}" / "_COMMIT.json"

    def completed(self) -> dict[str, dict]:
        done: dict[str, dict] = {}
        for commit in self.out_dir.glob("part=*/_COMMIT.json"):
            rec = json.loads(commit.read_text())
            done[rec["partition_id"]] = rec
        return done

    def mark(self, partition_id: str, **meta: Any) -> None:
        """Commit a partition whose directory already exists (prefer
        ``write_partition``, which commits atomically with the data)."""
        rec = {"partition_id": partition_id, **meta}
        path = self._commit_path(partition_id)
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(f".tmp-{uuid.uuid4().hex[:8]}")
        tmp.write_text(json.dumps(rec) + "\n")
        os.replace(tmp, path)


def write_partition(
    manifest: Manifest,
    partition_id: str,
    table: pa.Table,
    lineage: dict | list | str | None = None,
    metrics: dict | None = None,
) -> Path:
    """Atomically write one partition (data + commit record in a single
    dir rename). Idempotent: an already-completed partition is returned
    untouched."""
    final = manifest.out_dir / f"part={partition_id}"
    if (final / "_COMMIT.json").exists():
        return final
    tmp = manifest.out_dir / f".tmp-{partition_id}-{uuid.uuid4().hex[:8]}"
    tmp.mkdir(parents=True)
    try:
        pq.write_table(table, tmp / "data.parquet")
        rec = {
            "partition_id": partition_id,
            "lineage": lineage,
            "row_count": table.num_rows,
            "checksum": table_checksum(table),
            "metrics": metrics or {},
        }
        (tmp / "_COMMIT.json").write_text(json.dumps(rec) + "\n")
        if final.exists():  # stale dir from a crashed run that never committed
            import shutil

            shutil.rmtree(final)
        os.rename(tmp, final)
    except BaseException:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return final


def run_resumable(
    manifest: Manifest,
    partitions: dict[str, Any],
    produce,
) -> dict[str, Path]:
    """Run ``produce(partition_id, spec) -> pa.Table`` for every partition
    not yet manifested; return paths for all (old + new)."""
    done = manifest.completed()
    out: dict[str, Path] = {}
    for pid, spec in partitions.items():
        if pid in done:
            out[pid] = manifest.out_dir / f"part={pid}"
            continue
        tbl = produce(pid, spec)
        # lineage is ALWAYS recorded (north rule: per-partition lineage):
        # JSON-native specs verbatim, anything else via repr
        lineage = spec if isinstance(spec, (str, list, dict)) else {"spec": repr(spec)}
        out[pid] = write_partition(manifest, pid, tbl, lineage=lineage)
    return out


def read_output(out_dir: str | Path) -> pa.Table:
    """Read back all manifested partitions as one table."""
    manifest = Manifest(out_dir)
    parts = []
    for pid in manifest.completed():
        p = Path(out_dir) / f"part={pid}" / "data.parquet"
        parts.append(pq.read_table(p))
    if not parts:
        raise FileNotFoundError(f"no completed partitions under {out_dir}")
    return pa.concat_tables(parts, promote_options="default")
