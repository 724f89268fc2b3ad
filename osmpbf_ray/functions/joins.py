"""Join toolkit: broadcast semi-join, ways→deps, partitioned hash join.

The reference's only join is ``IndexedReader::read_ways_and_deps``
(/root/reference/src/indexed.rs:264-330): pass 1 filters ways and collects
referenced node ids into a driver-side set; pass 2 rescans only blobs
whose node id-range intersects the set. Ray-Data-first re-expression:

* small key set  → ``ray.put`` broadcast once, ``pc.is_in`` filter inside
  ``map_batches`` on every node block (no shuffle at all). Fragment-level
  zone-map pruning comes free from parquet statistics at read time.
* large key sets → explicit partitioned hash join: bucket both sides by
  ``hash(key) % B``, co-group, join per bucket — documented partitioning
  assumption: both sides bucketed on the same key with the same B.

At 100 TB the broadcast path is the right default whenever the filtered
side fits driver memory (the common case: predicates are selective); the
bucketed path is the fallback and is also what the spatial join uses
(bucket = cell).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


# per-worker-process cache of the most recent broadcast key set (bounded
# at ONE entry, like _BCAST_CACHE below): tasks are elastic — no actor
# pool to spin up (a pool paid ~2-4 s of worker startup PER semi-join
# call, the dominant cost of every broadcast-filter stage at sf0.1) —
# yet the unique+Arrow conversion still runs once per worker, not per batch
_SEMI_CACHE: dict = {}


def broadcast_semi_join(ds, key_col: str, keys_ref) -> "ray.data.Dataset":
    """Keep rows whose ``key_col`` ∈ broadcast key set.

    ``keys_ref`` is an ``ray.ObjectRef`` from ``ray.put(np.ndarray)`` —
    shipped to each worker once via Ray's object store (zero
    re-serialization per batch), the scale-correct analog of the
    reference's BTreeSet binary-search membership test (indexed.rs:314,320).
    """

    def filt(batch: pa.Table) -> pa.Table:
        hexkey = keys_ref.hex()
        if _SEMI_CACHE.get("key") != hexkey:
            _SEMI_CACHE.clear()
            _SEMI_CACHE["key"] = hexkey
            _SEMI_CACHE["keys"] = pa.array(np.unique(np.asarray(ray.get(keys_ref))))
        return batch.filter(pc.is_in(batch[key_col], value_set=_SEMI_CACHE["keys"]))

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def broadcast_anti_join(ds, key_col: str, keys_ref) -> "ray.data.Dataset":
    """Drop rows whose ``key_col`` ∈ broadcast key set (NOT EXISTS).

    Map-side, shuffle-free mirror of ``broadcast_semi_join``. NULL keys
    are KEPT (SQL ``NOT EXISTS`` with an equality correlate: NULL never
    matches, so the outer row qualifies).
    """

    def filt(batch: pa.Table) -> pa.Table:
        hexkey = keys_ref.hex()
        if _SEMI_CACHE.get("key") != hexkey:
            _SEMI_CACHE.clear()
            _SEMI_CACHE["key"] = hexkey
            _SEMI_CACHE["keys"] = pa.array(np.unique(np.asarray(ray.get(keys_ref))))
        mask = pc.invert(pc.is_in(batch[key_col], value_set=_SEMI_CACHE["keys"]))
        return batch.filter(pc.fill_null(mask, True))

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def partitioned_anti_join(left_ds, right_ds, key: str, right_key: str | None = None,
                          n_buckets: int | None = None,
                          left_schema: pa.Schema | None = None):
    """Anti-join with BOTH sides large: co-bucket by ``hash(key) % B``,
    per bucket keep left rows whose key has no match in the right keys.

    The right side is projected to its KEY COLUMN ONLY before the
    shuffle (an anti-join never reads right payload), so the exchange
    moves |left| + |right-keys| rows once. Same partitioning contract
    as ``partitioned_hash_join``: both sides bucketed by the same
    splitmix hash, each bucket reduces independently — per-bucket
    memory is rows/B at any input size.
    """
    from osmpbf_ray.functions.partitioning import sized_fanout

    rkey = right_key or key
    if n_buckets is None:
        n_buckets = max(sized_fanout(left_ds), sized_fanout(right_ds))
    lschema = left_schema if left_schema is not None else as_arrow_schema(left_ds.schema())
    lcols = list(lschema.names)
    unified = pa.schema(
        [pa.field("bucket", pa.int64()), pa.field("__side", pa.int8())]
        + [lschema.field(c) for c in lcols]
    )

    def tag_left(b: pa.Table) -> pa.Table:
        b = add_bucket_column(b, key, n_buckets)
        cols = [b.column("bucket"),
                pa.array(np.zeros(b.num_rows, dtype=np.int8))]
        for c in lcols:
            col = b.column(c)
            f = unified.field(c)
            cols.append(col if col.type == f.type else col.cast(f.type))
        return pa.Table.from_arrays(cols, schema=unified)

    def tag_right(b: pa.Table) -> pa.Table:
        kcol = b.column(rkey).drop_null()
        kt = pa.table({key: kcol.cast(lschema.field(key).type)})
        kt = add_bucket_column(kt, key, n_buckets)
        n = kt.num_rows
        cols = [kt.column("bucket"), pa.array(np.ones(n, dtype=np.int8))]
        for c in lcols:
            cols.append(kt.column(key) if c == key
                        else pa.nulls(n, type=unified.field(c).type))
        return pa.Table.from_arrays(cols, schema=unified)

    tagged_l = left_ds.map_batches(tag_left, batch_format="pyarrow")
    tagged_r = right_ds.select_columns([rkey]).map_batches(
        tag_right, batch_format="pyarrow")

    def anti_bucket(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        left = g.filter(pa.array(side == 0))
        rkeys = g.filter(pa.array(side == 1)).column(key)
        out = left.drop_columns(["bucket", "__side"])
        if len(rkeys) == 0:
            return out
        mask = pc.invert(pc.is_in(out[key], value_set=rkeys.combine_chunks()))
        return out.filter(pc.fill_null(mask, True))

    return tagged_l.union(tagged_r).groupby("bucket").map_groups(
        anti_bucket, batch_format="pyarrow"
    )


def anti_join(left_ds, right_ds, key: str, right_key: str | None = None,
              broadcast_bytes: int | None = 64 << 20):
    """NOT-EXISTS join, size-gated like the LSH verify head
    (stages/dedup.py:candidate_semi_join):

    * right side provably ≤ ``broadcast_bytes``: per-batch unique keys
      collect on the driver and broadcast once via ``ray.put``; the
      left side filters map-side with zero shuffle. The gate reads PLAN
      METADATA ONLY (``_meta_count`` × 8 B/key — available for file
      reads and row-preserving ops, never triggers execution;
      ``size_bytes()`` would EXECUTE a lazy upstream just to decide).
    * larger or unknown size: fully distributed
      ``partitioned_anti_join`` — the right keys co-partition with the
      left rows, nothing materializes on the driver.
    """
    rkey = right_key or key
    try:
        right_rows = right_ds._meta_count()
    except Exception:
        right_rows = None
    if (broadcast_bytes is not None and right_rows is not None
            and right_rows * 8 <= broadcast_bytes):
        def keys_partial(batch: pa.Table) -> pa.Table:
            u = np.unique(batch.column(rkey).drop_null().to_numpy(zero_copy_only=False))
            return pa.table({"k": u})

        key_tbls = ray.get(
            right_ds.select_columns([rkey])
            .map_batches(keys_partial, batch_format="pyarrow", zero_copy_batch=True)
            .to_arrow_refs()
        )
        parts = [t.column("k").to_numpy() for t in key_tbls if t.num_rows]
        keys = np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.int64)
        return broadcast_anti_join(left_ds, key, ray.put(keys))
    return partitioned_anti_join(left_ds, right_ds, key, right_key=rkey)


def ways_and_deps(ways_ds, nodes_ds, way_predicate_batch_fn):
    """``read_ways_and_deps`` equivalent (indexed.rs:264-330).

    Pass 1: filter ways with the vectorized batch predicate; the matched
    ways stay a DATASET (never pulled to the driver). Only the per-batch
    UNIQUE flattened ``refs`` — the semi-join key set, the analog of the
    reference's driver BTreeSet (indexed.rs:271) — come back, combined in
    one batched ``ray.get``. Pass 2: broadcast the id set and semi-join
    nodes. Returns (matching_ways: Dataset, dep_nodes: Dataset).
    """
    matched = ways_ds.map_batches(
        way_predicate_batch_fn, batch_format="pyarrow", zero_copy_batch=True
    )
    # matched stays LAZY: the key-set pass below executes the filter once,
    # and callers that never consume the ways dataset (the common
    # deps-only case) pay nothing for it. Callers consuming both outputs
    # repeatedly should .materialize() the returned ways themselves.

    def refs_partial(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(batch.column("refs").combine_chunks())
        return pa.table({"id": np.unique(flat.to_numpy(zero_copy_only=False))})

    key_tbls = ray.get(
        matched.select_columns(["refs"])
        .map_batches(refs_partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_arrow_refs()
    )
    parts = [t.column("id").to_numpy() for t in key_tbls if t.num_rows]
    key_set = np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.int64)
    keys_ref = ray.put(key_set)
    deps = broadcast_semi_join(nodes_ds, "id", keys_ref)
    return matched, deps


# per-worker-process cache for the most recent broadcast join table —
# bounded at ONE entry (a long-lived worker would otherwise accumulate a
# copy per distinct broadcast across jobs, outliving the driver's ref)
_BCAST_CACHE: dict = {}


def broadcast_lookup_join(ds, small: pa.Table, key: str, how: str = "inner"):
    """Map-side join against a broadcast small table (no shuffle).

    The 100 TB shape for selective joins: the big side streams through
    ``map_batches`` while the small side ships once via ``ray.put`` and
    is joined per batch with the Arrow (acero) hash join — no pandas
    round-trip. Partitioning assumption: ``small`` fits in each worker's
    heap — use ``partitioned_hash_join`` otherwise.
    """
    import ray

    ref = ray.put(small)
    join_type = {"inner": "inner", "left": "left outer"}.get(how, how)

    def join_batch(batch: pa.Table) -> pa.Table:
        hexkey = ref.hex()
        if _BCAST_CACHE.get("key") != hexkey:
            small_tbl = ray.get(ref)
            _BCAST_CACHE.clear()
            _BCAST_CACHE["key"] = hexkey
            _BCAST_CACHE["tbl"] = small_tbl
            # key + row-index projection for the acero match: acero
            # rejects list/struct NON-KEY columns (ways.refs/tags,
            # relation members), so match on indices and `take` the
            # payloads — same shape partitioned_hash_join uses
            _BCAST_CACHE["keys"] = pa.table({
                key: small_tbl.column(key),
                "__ri": pa.array(np.arange(small_tbl.num_rows, dtype=np.int64)),
            })
        small_tbl = _BCAST_CACHE["tbl"]
        bkeys = pa.table({
            key: batch.column(key),
            "__li": pa.array(np.arange(batch.num_rows, dtype=np.int64)),
        })
        m = bkeys.join(_BCAST_CACHE["keys"], keys=key, join_type=join_type)
        li = m.column("__li").combine_chunks()
        ri = m.column("__ri").combine_chunks()
        out = batch.take(li)
        for name in small_tbl.column_names:
            if name != key:
                out = out.append_column(name, small_tbl.column(name).take(ri))
        return out

    return ds.map_batches(join_batch, batch_format="pyarrow", zero_copy_batch=True)


def resolve_way_locations(ways_ds, nodes_ds, n_buckets: int | None = None):
    """ways × nodes on ``refs`` — the geometry-resolution join.

    The reference models this as the id-based FK ways→nodes
    (/root/reference/src/elements.rs:194-199 + README.md:105-109: a full
    resolve "may require a whole-file scan" — here it is one explicit
    partitioned hash join). Shape: explode each way's ordered refs to
    (way_id, pos, ref) rows — ref ORDER is semantic — then hash-join
    against the node table on the node id; both sides bucket by the
    same key so each bucket joins independently. Output is the exploded
    flat form (way_id, pos, node id, nano coords): downstream tiling
    consumes it directly, and re-nesting to LocationsOnWays lists is one
    local groupby away.
    """

    def explode(batch: pa.Table) -> pa.Table:
        refs = batch.column("refs").combine_chunks()
        flat = refs.flatten().to_numpy(zero_copy_only=False)
        offs = refs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offs)
        row_of = np.repeat(np.arange(batch.num_rows), lens)
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(offs[:-1], lens)
        ids = batch.column("id").to_numpy()
        return pa.table(
            {"way_id": ids[row_of], "pos": pos, "id": pa.array(flat, type=pa.int64())}
        )

    exploded = ways_ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    return partitioned_hash_join(exploded, nodes_ds, key="id", n_buckets=n_buckets)


def as_arrow_schema(ds_schema) -> pa.Schema:
    """Dataset schema → pa.Schema (pandas-backed upstreams map numpy dtypes)."""
    base = ds_schema.base_schema
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, typ in zip(ds_schema.names, base.types):
        if isinstance(typ, pa.DataType):
            fields.append(pa.field(name, typ))
        else:
            try:
                fields.append(pa.field(name, pa.from_numpy_dtype(typ)))
            except pa.ArrowNotImplementedError:
                fields.append(pa.field(name, pa.string()))
    return pa.schema(fields)


def splitmix_u64(x) -> np.ndarray:
    z = np.asarray(x, dtype=np.int64).view(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hash_key_u64(a) -> np.ndarray:
    """splitmix64 key hash for ANY key dtype (uint64 out) — the single
    hashing convention every partitioned exchange uses. String/object
    keys go through crc32 per DISTINCT value (process-stable, unlike
    Python's salted ``hash()``); NaN float keys raise (their int cast is
    undefined and NaN != NaN would split a key)."""
    a = np.asarray(a)
    if a.dtype.kind in "OUS":
        import zlib

        uniq, inv = np.unique(a.astype(str), return_inverse=True)
        h = np.array([zlib.crc32(s.encode()) for s in uniq], dtype=np.int64)
        return splitmix_u64(h[inv])
    if a.dtype.kind == "f" and np.isnan(a).any():
        raise ValueError(
            "null/NaN keys are unsupported — fill or filter the key column first"
        )
    return splitmix_u64(a)


def add_bucket_column(batch: pa.Table, key_col: str, n_buckets: int, out_col: str = "bucket") -> pa.Table:
    """Deterministic hash bucket for the partitioned join (splitmix64;
    string keys via the crc32-per-distinct path). NULL keys go to
    bucket 0: SQL join semantics say they never MATCH anything, so any
    deterministic placement is correct — the per-bucket reducers handle
    them (anti-join keeps them, equi-joins drop them)."""
    col = batch[key_col]
    a = col.to_numpy(zero_copy_only=False)
    if getattr(col, "null_count", 0):
        valid = pc.is_valid(col.combine_chunks()).to_numpy(zero_copy_only=False)
        z = np.zeros(len(a), dtype=np.uint64)
        if valid.any():
            z[valid] = hash_key_u64(a[valid])
    else:
        z = hash_key_u64(a)
    return batch.append_column(out_col, pa.array((z % np.uint64(n_buckets)).astype(np.int64)))


def partitioned_hash_join(
    left_ds,
    right_ds,
    key: str,
    n_buckets: int | None = None,
    how: str = "inner",
    suffix: str = "_r",
    hot_keys: "np.ndarray | None" = None,
    n_salt: int = 8,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Explicit partitioned hash join (both sides large), Arrow end-to-end.

    Partitioning assumption: both sides are bucketed by the SAME
    ``hash(key) % n_buckets``; each bucket's pair joins independently
    inside ``map_groups``. ``n_buckets=None`` sizes the fan-out from the
    inputs (rows / target, floor 64 — see functions.partitioning) so
    per-bucket memory stays bounded at any input size.

    Per bucket the match is an acero hash join of the two KEY+ROW-INDEX
    projections, then a ``take`` of each side's payload by the matched
    indices (null index → null row for outer joins). This supports
    arbitrary payload types — acero rejects list/struct NON-KEY columns,
    but a take does not — and never round-trips through pandas (the old
    pandas ``merge`` NaN-upcast + dtype-repair machinery is gone).

    Skew: pass ``hot_keys`` (e.g. the top keys from a count sample) to
    SALT them — a hot key's LEFT rows spread across ``n_salt``
    sub-buckets (salt = row position hash) while its RIGHT rows
    REPLICATE into all ``n_salt`` sub-buckets, so no single reducer
    receives the whole hot key. Join results are identical; only the
    placement changes. Salting is only valid for inner/left joins: a
    replicated unmatched RIGHT row would be emitted once per sub-bucket
    under right/outer semantics, so those raise.
    """
    import ray

    from osmpbf_ray.functions.partitioning import sized_fanout

    join_type = {
        "inner": "inner",
        "left": "left outer",
        "right": "right outer",
        "outer": "full outer",
    }[how]
    hot_ref = None
    if hot_keys is not None and len(hot_keys):
        if how not in ("inner", "left"):
            raise ValueError(
                f"hot_keys salting requires how='inner'/'left' (got {how!r}): "
                "replicated right-side hot rows would duplicate unmatched-right output"
            )
        hot_ref = ray.put(np.unique(np.asarray(hot_keys)))
    if n_buckets is None:
        n_buckets = max(sized_fanout(left_ds), sized_fanout(right_ds))

    def bucket_left(b: pa.Table) -> pa.Table:
        b = add_bucket_column(b, key, n_buckets)
        if hot_ref is None or b.num_rows == 0:
            return b
        k = b[key].to_numpy(zero_copy_only=False)
        hot = np.isin(k, ray.get(hot_ref))
        # spread a hot key's rows over n_salt sub-buckets; any
        # near-uniform assignment is correct (the right side replicates
        # into every sub-bucket), so a key-hash + row-position hash
        # suffices (hash_key_u64 keeps this valid for string keys)
        salt = (splitmix_u64(hash_key_u64(k).view(np.int64)
                             + np.arange(len(k), dtype=np.int64))
                % np.uint64(n_salt)).astype(np.int64)
        bucket = b["bucket"].to_numpy() * np.int64(n_salt) + np.where(hot, salt, 0)
        return b.set_column(b.schema.get_field_index("bucket"), "bucket", pa.array(bucket))

    def bucket_right(b: pa.Table) -> pa.Table:
        b = add_bucket_column(b, key, n_buckets)
        if hot_ref is None or b.num_rows == 0:
            return b
        k = b[key].to_numpy(zero_copy_only=False)
        hot = np.isin(k, ray.get(hot_ref))
        base = b["bucket"].to_numpy() * np.int64(n_salt)
        cold = b.filter(pa.array(~hot)).set_column(
            b.schema.get_field_index("bucket"), "bucket",
            pa.array(base[~hot]),
        )
        if not hot.any():
            return cold
        hot_tbl = b.filter(pa.array(hot))
        parts = [cold]
        for s in range(n_salt):  # replicate hot right rows across salts
            parts.append(
                hot_tbl.set_column(
                    hot_tbl.schema.get_field_index("bucket"), "bucket",
                    pa.array(base[hot] + s),
                )
            )
        return pa.concat_tables(parts)

    # ds.schema() on a LAZY input executes its plan up to the first block
    # — through an upstream shuffle that means (almost) the whole plan,
    # run AGAIN when the join consumes it. Callers chaining joins should
    # pass the known schemas to keep each input single-execution.
    lschema = left_schema if left_schema is not None else as_arrow_schema(left_ds.schema())
    rschema = right_schema if right_schema is not None else as_arrow_schema(right_ds.schema())
    lcols, rcols = list(lschema.names), list(rschema.names)
    rename = {c: (c + suffix if c in lcols else c) for c in rcols if c != key}
    rcols_out = [rename[c] for c in rcols if c != key]
    # ONE schema for both sides through the shuffle: the other side's
    # columns ride as typed nulls (validity-bitmap-only — cheap), so the
    # union and the sort shuffle stay Arrow-native end to end
    unified = pa.schema(
        [pa.field("bucket", pa.int64()), pa.field("__side", pa.int8())]
        + [lschema.field(c) for c in lcols]
        + [rschema.field(c).with_name(rename[c]) for c in rcols if c != key]
    )
    out_schema = pa.schema(
        [lschema.field(c) for c in lcols]
        + [rschema.field(c).with_name(rename[c]) for c in rcols if c != key]
    )

    def align(b: pa.Table, side: int, colmap: dict) -> pa.Table:
        n = b.num_rows
        cols = []
        for f in unified:
            if f.name == "__side":
                cols.append(pa.array(np.full(n, side, dtype=np.int8)))
            elif f.name == "bucket" or colmap.get(f.name) in b.schema.names:
                src = f.name if f.name == "bucket" else colmap[f.name]
                col = b.column(src)
                cols.append(col if col.type == f.type else col.cast(f.type))
            else:
                cols.append(pa.nulls(n, type=f.type))
        return pa.Table.from_arrays(cols, schema=unified)

    lmap = {c: c for c in lcols}
    rmap = {rename[c]: c for c in rcols if c != key}
    rmap[key] = key
    tagged_l = left_ds.map_batches(
        lambda b: align(bucket_left(b), 0, lmap), batch_format="pyarrow"
    )
    tagged_r = right_ds.map_batches(
        lambda b: align(bucket_right(b), 1, rmap), batch_format="pyarrow"
    )

    def join_bucket(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        left = g.filter(pa.array(side == 0))
        right = g.filter(pa.array(side == 1))
        # match on key + row index only; payload moves via take afterwards
        m = pa.table(
            {"__k": left.column(key), "__li": np.arange(left.num_rows, dtype=np.int64)}
        ).join(
            pa.table(
                {"__k": right.column(key), "__ri": np.arange(right.num_rows, dtype=np.int64)}
            ),
            keys="__k",
            join_type=join_type,
        )
        li, ri = m.column("__li"), m.column("__ri")
        cols = []
        for c in lcols:
            col = left.column(c).take(li)
            if c == key and how in ("right", "outer"):
                col = pc.coalesce(col, right.column(key).take(ri))
            cols.append(col)
        for c in rcols_out:
            cols.append(right.column(c).take(ri))
        return pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols],
            schema=out_schema,
        )

    return tagged_l.union(tagged_r).groupby("bucket").map_groups(
        join_bucket, batch_format="pyarrow"
    )
