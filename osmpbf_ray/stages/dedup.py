"""Deduplication families: exact, MinHash+LSH, SimHash, n-gram Jaccard,
phash Hamming banding, embedding-cosine near-dup.

Engine-new (SURVEY.md §2.7 notes the reference has none; the north rule
requires phash dedup on the image table). The common scale shape is
TWO-PHASE LSH:

  phase 1 (candidates): per-batch signature (vectorized) → explode to
    (band, key, id) rows — IDS ONLY, never documents or signatures —
    → groupby(band key) → all-pairs inside (tiny) buckets → pair dedup
  phase 2 (verify): broadcast-semi-join the CANDIDATE ids back against
    the source table, recompute/fetch only their payloads (bounded by
    the true near-dup count), verify exactly, filter by threshold.

so the wide shuffle moves ~16 bytes per (doc, band) and the expensive
payloads touch only candidates. All hashes are deterministic across
processes (crc32/splitmix — no PYTHONHASHSEED dependence).

Recall design (the round-1 holes, VERDICT "What's wrong" 3/4):
* SimHash banding uses ``n_bands = max_dist + 1`` so the pigeonhole
  guarantee covers the requested distance exactly (any two hashes within
  Hamming ``max_dist`` share at least one of ``max_dist + 1`` bit-bands).
* embedding LSH uses banded multi-table hyperplanes (OR over
  ``n_bands`` bands of ``bits_per_band`` sign bits — the MinHash-style
  S-curve); at cosine 0.9 with 16×8 the miss probability is < 0.005,
  vs ~92% for the old single 16-plane table.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from osmpbf_ray.functions.blocks import arrow_clean
from osmpbf_ray.functions.joins import splitmix_u64
from osmpbf_ray.stages.ann import vecs_to_numpy
from osmpbf_ray.stages.image import hamming64
from osmpbf_ray.stages.text import (batch_rolling_fingerprints,
                                    splitmix64, token_hashes)

# --- exact dedup ------------------------------------------------------------


def md5_hex(texts) -> list[str]:
    """md5 of utf-8 text — value-identical to DuckDB's md5() for oracle checks."""
    import hashlib

    return [hashlib.md5(str(t).encode("utf-8")).hexdigest() for t in texts]


def add_md5_column(batch: pa.Table, text_col: str = "text", out_col: str = "text_md5") -> pa.Table:
    return batch.append_column(out_col, pa.array(md5_hex(batch.column(text_col).to_pylist())))


def _fanout_for(ds, multiplier: int = 1) -> int:
    """Input-sized fan-out: plan-metadata row count × a known expansion
    factor (e.g. LSH band explosion), floor 64 when the plan can't say."""
    from osmpbf_ray.functions.partitioning import sized_fanout

    try:
        rows = ds._meta_count()
    except Exception:
        rows = None
    return sized_fanout(None if rows is None else rows * multiplier)


def exact_dedup(ds, key_col: str, order_col: str, n_parts: int | None = None):
    """Keep the first row (min order_col) per key — hash-partitioned.

    Shuffles on ``hash(key) % n_parts`` (duplicates co-locate because
    they share the key), then one vectorized sort + ``drop_duplicates``
    per partition. Keying the groupby on the content hash itself would
    pay per-group Python orchestration for every DISTINCT key — at
    dedup scale that is nearly every row. ``n_parts=None`` sizes the
    fan-out from the input so per-partition memory stays bounded.
    """
    if n_parts is None:
        n_parts = _fanout_for(ds)

    def add_pkey(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("__pkey", pa.array([], type=pa.int64()))
        k = _key_u64(batch.column(key_col).to_numpy(zero_copy_only=False))
        return batch.append_column(
            "__pkey", pa.array((splitmix64(k) % np.uint64(n_parts)).view(np.int64))
        )

    def first_per_key(g: pa.Table) -> pa.Table:
        # Arrow sort (handles string keys natively) + one vectorized
        # first-occurrence mask — no pandas round-trip
        srt = g.sort_by([(key_col, "ascending"), (order_col, "ascending")])
        if srt.num_rows == 0:
            return srt.drop_columns(["__pkey"])
        k = srt.column(key_col).combine_chunks()
        neq = pc.not_equal(k.slice(1), k.slice(0, len(k) - 1)).to_numpy(
            zero_copy_only=False)
        mask = np.r_[True, neq.astype(bool)]
        return srt.filter(pa.array(mask)).drop_columns(["__pkey"])

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__pkey")
        .map_groups(first_per_key, batch_format="pyarrow")
    )


# --- shingles + MinHash -----------------------------------------------------


def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """uint64 hashes of the k-char shingle set (vectorized per doc).
    Always returns at least one hash (crc fallback for short docs)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(data) < k:
        return splitmix64(np.array([zlib.crc32(text.encode())], dtype=np.uint64))
    base = np.uint64(1099511628211)
    powers = base ** np.arange(k, dtype=np.uint64)
    strided = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    return np.unique(splitmix64((strided * powers).sum(axis=1, dtype=np.uint64)))


_MINHASH_SEEDS = splitmix64(np.arange(1, 129, dtype=np.uint64))


def minhash_signature(shingles: np.ndarray, n_perm: int = 64) -> np.ndarray:
    """n_perm minimum values under xor-permutations of the shingle hashes."""
    if len(shingles) == 0:
        return np.zeros(n_perm, dtype=np.uint64)
    seeds = _MINHASH_SEEDS[:n_perm]
    return (shingles[None, :] ^ seeds[:, None]).min(axis=1)


def minhash_signatures(texts, k: int = 5, n_perm: int = 64) -> np.ndarray:
    """(n_docs, n_perm) signature matrix, vectorized across the batch:
    shingling is ONE sliding-window pass over the batch's concatenated
    UTF-8 buffer (the fingerprint kernel with keep_mod=1 — bit-equal to
    per-doc ``char_shingle_hashes``), then one segmented
    ``minimum.reduceat`` per permutation. Accepts an Arrow string
    column (zero-copy) or any list of values."""
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array([str(t) for t in texts], type=pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    if n == 0:
        return np.empty((0, n_perm), dtype=np.uint64)
    # memory bound: the flat shingle array is ~8 B per text byte and
    # each permutation pass allocates a same-sized temp — chunk doc
    # ranges so a default-size Ray text block never holds a GB-scale
    # intermediate (signatures are per-doc, so chunking is exact)
    _CHUNK_BYTES = 8 << 20
    if n > 1 and texts.nbytes > _CHUNK_BYTES:
        n_chunks = -(-texts.nbytes // _CHUNK_BYTES)
        step = -(-n // n_chunks)
        return np.vstack([
            minhash_signatures(texts.slice(s, min(step, n - s)), k, n_perm)
            for s in range(0, n, step)])
    par, flat = batch_rolling_fingerprints(texts, window=k, keep_mod=1,
                                           base=_SHINGLE_BASE)
    # every doc emits >= 1 hash (crc fallback), so reduceat offsets are
    # strictly increasing and cover all docs
    lens = np.bincount(par, minlength=n)
    offs = np.r_[0, np.cumsum(lens)[:-1]]
    seeds = _MINHASH_SEEDS[:n_perm]
    sigs = np.empty((n, n_perm), dtype=np.uint64)
    for p in range(n_perm):
        sigs[:, p] = np.minimum.reduceat(flat ^ seeds[p], offs)
    return sigs


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


_SHINGLE_BASE = 1099511628211  # FNV prime, char_shingle_hashes' base


def batch_jaccard(texts_a, texts_b, k: int = 5) -> np.ndarray:
    """Pairwise k-char-shingle Jaccard for ALIGNED text columns —
    bit-equal to ``jaccard(char_shingle_hashes(a), char_shingle_hashes
    (b))`` per row, but batch-vectorized: both sides shingle through
    ONE sliding-window pass each (text.batch_rolling_fingerprints with
    keep_mod=1 keeps every hash, uniqued per doc), then a single
    lexsort finds cross-side duplicates per pair (each side is unique,
    so an adjacent equal (pair, hash) run means both sides hold it)."""
    pa_idx, ha = batch_rolling_fingerprints(texts_a, window=k, keep_mod=1,
                                            base=_SHINGLE_BASE)
    pb_idx, hb = batch_rolling_fingerprints(texts_b, window=k, keep_mod=1,
                                            base=_SHINGLE_BASE)
    n = max(len(texts_a), len(texts_b))
    sizes_a = np.bincount(pa_idx, minlength=n)
    sizes_b = np.bincount(pb_idx, minlength=n)
    allp = np.concatenate([pa_idx, pb_idx])
    allh = np.concatenate([ha, hb])
    order = np.lexsort((allh, allp))
    p2, h2 = allp[order], allh[order]
    dup = (p2[1:] == p2[:-1]) & (h2[1:] == h2[:-1])
    inter = np.bincount(p2[1:][dup], minlength=n)
    union = sizes_a + sizes_b - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


def _band_hashes(sigs: np.ndarray, n_bands: int) -> np.ndarray:
    """(n, n_bands) int64 band keys combining ALL slots of each band."""
    n, n_perm = sigs.shape
    chunks = sigs.reshape(n, n_bands, n_perm // n_bands)
    h = np.full((n, n_bands), 0x9E3779B97F4A7C15, dtype=np.uint64)
    for j in range(chunks.shape[2]):
        h = splitmix64(h ^ chunks[:, :, j])
    return h.view(np.int64)


class MinHashStage:
    """Stage: text → exploded (doc id, band, band_hash) rows — ids only.

    ``n_bands`` rows of ~16 payload bytes per document enter the shuffle;
    signatures and text never do (round 1 shipped the full 64-slot
    signature with every band row — 16× amplification of the widest
    column)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 k: int = 5, n_perm: int = 64, n_bands: int = 16):
        assert n_perm % n_bands == 0
        self.id_col, self.text_col = id_col, text_col
        self.k, self.n_perm, self.n_bands = k, n_perm, n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col)
        sigs = minhash_signatures(texts, self.k, self.n_perm)
        bh = _band_hashes(sigs, self.n_bands) if len(texts) else np.empty((0, self.n_bands), np.int64)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                self.id_col: np.repeat(ids, self.n_bands),
                "band": np.tile(np.arange(self.n_bands, dtype=np.int64), len(texts)),
                "band_hash": bh.ravel(),
            }
        )


def _key_u64(col: np.ndarray) -> np.ndarray:
    """uint64 hash of a key column; string ids (e.g. image_id) hash via
    pandas' process-stable hash_array (no PYTHONHASHSEED dependence)."""
    a = np.asarray(col)
    if a.dtype.kind in "iu":
        return a.astype(np.int64).view(np.uint64)
    return pd.util.hash_array(a.astype(object), categorize=False).astype(np.uint64)


def _combine_keys(*cols: np.ndarray) -> np.ndarray:
    """Fold several key columns into one uint64 bucket key."""
    h = np.full(len(cols[0]), 0x9E3779B97F4A7C15, dtype=np.uint64)
    for c in cols:
        h = splitmix64(h ^ _key_u64(c))
    return h


def _bucketed_pairs(exploded, key_cols: list[str], id_col: str,
                    pair_fn, empty_fn, extra_cols: tuple = (), n_parts: int | None = None):
    """Per-bucket pair expansion with ONE Ray group per HASH PARTITION.

    A ``map_groups`` per LSH bucket is Python-call-bound (most buckets
    are singletons — that is the point of LSH — and sf0.1 produces tens
    of thousands of them: ~21 s of pure orchestration). Instead buckets
    co-locate via ``pkey = bucket_key % n_parts`` — the documented
    partitioning assumption: all rows of one bucket share a pkey — and
    each partition expands its buckets in a numpy segment loop that
    skips singletons for free. ``pair_fn(ids, extras) -> DataFrame``
    runs only on buckets with ≥ 2 rows. ``n_parts=None`` sizes the
    fan-out from the exploded input (floor 64).
    """
    if n_parts is None:
        n_parts = _fanout_for(exploded)

    def add_pkey(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("bkey", pa.array([], type=pa.int64())).append_column(
                "pkey", pa.array([], type=pa.int64()))
        k = _combine_keys(*[batch.column(c).to_numpy() for c in key_cols])
        return batch.append_column("bkey", pa.array(k.view(np.int64))).append_column(
            "pkey", pa.array((k % np.uint64(n_parts)).view(np.int64)))

    keyed = exploded.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bkey", id_col], kind="stable")
        bk = g["bkey"].to_numpy()
        ids = g[id_col].to_numpy()
        extras = {c: g[c].to_numpy() for c in extra_cols}
        bounds = np.flatnonzero(np.diff(bk)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(bk)]])
        frames = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            frames.append(pair_fn(ids[s:e], {c: v[s:e] for c, v in extras.items()}))
        frames = [f for f in frames if len(f)]
        out = pd.concat(frames, ignore_index=True) if frames else empty_fn()
        return arrow_clean(out)

    return keyed.groupby("pkey").map_groups(expand, batch_format="pandas")


def _candidate_pair_fn(ids: np.ndarray, extras: dict) -> pd.DataFrame:
    ids = np.unique(ids)
    if len(ids) < 2:
        return _candidate_pairs_empty()
    iu = np.triu_indices(len(ids), 1)
    return pd.DataFrame({"id_a": ids[iu[0]], "id_b": ids[iu[1]]})


def _candidate_pairs_empty() -> pd.DataFrame:
    return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                         "id_b": pd.Series(dtype="int64")})


def _dedup_pairs(pairs_ds, cols: list[str] | None = None, n_parts: int | None = None):
    """Distinct pair rows — the same pair can surface from several bands.

    Hash-partitioned like ``_bucketed_pairs`` (a groupby keyed directly
    on the ~10⁵ distinct pairs spends ~20 s in per-group orchestration;
    64 partition groups + a vectorized ``drop_duplicates`` spend ~2 s).
    """
    cols = cols or ["id_a", "id_b"]
    if n_parts is None:
        n_parts = _fanout_for(pairs_ds)

    def add_ppkey(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("ppkey", pa.array([], type=pa.int64()))
        k = _combine_keys(batch.column("id_a").to_numpy(), batch.column("id_b").to_numpy())
        return batch.append_column("ppkey", pa.array((k % np.uint64(n_parts)).view(np.int64)))

    def distinct(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.select(cols)
        arrs = [g.column(c).to_numpy(zero_copy_only=False) for c in cols]
        order = np.lexsort(arrs[::-1])
        sorted_arrs = [a[order] for a in arrs]
        changed = np.zeros(len(order), dtype=bool)
        changed[0] = True
        for a in sorted_arrs:
            changed[1:] |= a[1:] != a[:-1]
        return pa.table({c: a[changed] for c, a in zip(cols, sorted_arrs)})

    return (
        pairs_ds.map_batches(add_ppkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ppkey")
        .map_groups(distinct, batch_format="pyarrow")
    )


def _collect_ids(pairs_ds) -> np.ndarray:
    """Candidate-pair ids (SMALL by LSH design — bounded by true
    near-dups + band collisions)."""
    import ray

    tbls = [t for t in ray.get(pairs_ds.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return np.empty(0, dtype=np.int64)
    t = pa.concat_tables(tbls, promote_options="default")
    return np.unique(np.concatenate([t.column("id_a").to_numpy(), t.column("id_b").to_numpy()]))


def _candidate_fetch(source_ds, id_col: str, pairs_ds, cols: list[str],
                     broadcast_bytes: int | None = None):
    """``candidate_semi_join`` plus the EXACT distinct-candidate count
    when the broadcast path runs (the id set is on the driver anyway) —
    callers use it for exact payload-size gates. Distributed path
    returns ``(ds, None)``."""
    import ray

    from osmpbf_ray.functions.joins import broadcast_semi_join

    if broadcast_bytes is None:
        broadcast_bytes = _BROADCAST_PAYLOAD_BYTES
    try:
        pair_bytes = pairs_ds.size_bytes()
    except Exception:
        pair_bytes = None
    if pair_bytes is not None and pair_bytes <= broadcast_bytes:
        cand_ids = _collect_ids(pairs_ds)
        if len(cand_ids) == 0:
            return None, 0
        return (broadcast_semi_join(source_ds.select_columns(cols), id_col,
                                    ray.put(cand_ids)), len(cand_ids))
    return (candidate_semi_join(source_ds, id_col, pairs_ds, cols,
                                broadcast_bytes=broadcast_bytes), None)


def candidate_semi_join(source_ds, id_col: str, pairs_ds, cols: list[str],
                        broadcast_bytes: int | None = None):
    """Rows of ``source_ds[cols]`` whose id appears in any candidate
    pair — the head of every LSH verify phase, size-gated by the
    MEASURED pair-table size (``pairs_ds`` arrives materialized, so
    ``size_bytes`` is exact):

    * pairs ≤ ``broadcast_bytes`` (default 64 MiB): unique ids collect
      on the driver (ids ONLY — two int64 columns, strictly smaller
      than the pair table) and broadcast once via ``ray.put``; each
      worker filters map-side. The common case: LSH candidates are
      bounded by true near-dups + band collisions.
    * larger: FULLY DISTRIBUTED — per-batch unique ids → hash-
      partitioned global distinct → partitioned hash semi-join against
      the source. Nothing ever materializes on the driver, so a
      dup-heavy 100 TB corpus (where the candidate bound is the output
      size) streams through co-partitioned exchanges.

    Returns ``None`` when the candidate set is provably empty (broadcast
    path only — the distributed path just flows empty tables through).
    """
    import ray

    from osmpbf_ray.functions.joins import broadcast_semi_join, partitioned_hash_join

    if broadcast_bytes is None:
        broadcast_bytes = _BROADCAST_PAYLOAD_BYTES
    try:
        pair_bytes = pairs_ds.size_bytes()
    except Exception:
        pair_bytes = None
    source = source_ds.select_columns(cols)
    if pair_bytes is not None and pair_bytes <= broadcast_bytes:
        cand_ids = _collect_ids(pairs_ds)
        if len(cand_ids) == 0:
            return None
        return broadcast_semi_join(source, id_col, ray.put(cand_ids))

    def batch_ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], type=pa.int64())})
        u = np.unique(np.concatenate([batch.column("id_a").to_numpy(),
                                      batch.column("id_b").to_numpy()]))
        return pa.table({id_col: u})

    ids_ds = pairs_ds.map_batches(batch_ids, batch_format="pyarrow",
                                  zero_copy_batch=True)
    n_parts = _fanout_for(pairs_ds)

    def add_ipkey(batch: pa.Table) -> pa.Table:
        k = splitmix_u64(batch.column(id_col).to_numpy())
        return batch.append_column(
            "ipkey", pa.array((k % np.uint64(n_parts)).view(np.int64)))

    def distinct(g: pa.Table) -> pa.Table:
        return pa.table({id_col: np.unique(
            g.column(id_col).to_numpy(zero_copy_only=False))})

    distinct_ids = (
        ids_ds.map_batches(add_ipkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ipkey")
        .map_groups(distinct, batch_format="pyarrow")
    )
    return partitioned_hash_join(
        source, distinct_ids, key=id_col, how="inner",
        right_schema=pa.schema([(id_col, pa.int64())]),
    )


def minhash_candidate_pairs(ds, id_col="doc_id", text_col="text",
                            k=5, n_perm=64, n_bands=16, threshold=0.7,
                            concurrency=None, broadcast_bytes=None):
    """MinHash+LSH near-dup: pairs with estimated Jaccard ≥ threshold.

    Phase 1: banded LSH on ids only. Phase 2: recompute full signatures
    for the CANDIDATE docs alone (broadcast semi-join on the source) and
    verify by signature agreement — the signatures reach the pair table
    through DISTRIBUTED hash joins on id_a/id_b, never through a
    driver-materialized payload dict (round 2 shipped one; on a
    dup-heavy corpus the candidate bound IS the output size).
    """
    import ray.data as rd

    exploded = ds.map_batches(
        MinHashStage(id_col=id_col, text_col=text_col, k=k, n_perm=n_perm, n_bands=n_bands),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64()),
                      "est_jaccard": pa.array([], type=pa.float64())})
    pairs = _dedup_pairs(
        _bucketed_pairs(exploded, ["band", "band_hash"], id_col,
                        _candidate_pair_fn, _candidate_pairs_empty,
                        n_parts=_fanout_for(ds, n_bands))
    ).materialize()  # consumed by the size gate AND the verify stage
    cand_docs, n_cand = _candidate_fetch(ds, id_col, pairs,
                                         [id_col, text_col],
                                         broadcast_bytes=broadcast_bytes)
    if cand_docs is None:
        return rd.from_arrow(empty)

    def sig_rows(batch: pa.Table) -> pa.Table:
        sigs = minhash_signatures(batch.column(text_col), k, n_perm)
        return pa.table({id_col: batch.column(id_col),
                         "sig": pa.array([s.tobytes() for s in sigs], type=pa.binary())})

    # the signature stream stays LAZY: its size gate is ARITHMETIC
    # (≤ 2 candidate ids per pair, n_perm u64 words + id + offsets per
    # row) — no materialize-to-measure, no object-store pin. Small
    # payloads broadcast (to_arrow_refs executes the ≤64 MiB plan once);
    # large payloads flow through _pair_payload_join's single-join
    # shape, which consumes the payload exactly once.
    sig_ds = cand_docs.map_batches(
        sig_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    # exact candidate count when the pair table was broadcast-small
    # (the common LSH case); ≤ 2 per pair otherwise. A dup-heavy corpus
    # has far fewer DISTINCT candidates than 2×pairs — the loose bound
    # alone would misroute a 16 MB payload into the distributed path.
    if n_cand is None:
        n_cand = 2 * pairs.count()
    sig_bound = n_cand * (n_perm * 8 + 16)
    sig_schema = pa.schema([pa.field(id_col, pa.int64()),
                            pa.field("sig", pa.binary())])

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        sa = np.frombuffer(b"".join(batch.column("sig_a").to_pylist()),
                           dtype=np.uint64).reshape(-1, n_perm)
        sb = np.frombuffer(b"".join(batch.column("sig_b").to_pylist()),
                           dtype=np.uint64).reshape(-1, n_perm)
        est = (sa == sb).mean(axis=1)
        out = batch.select(["id_a", "id_b"]).append_column(
            "est_jaccard", pa.array(est, type=pa.float64())
        )
        return out.filter(pa.array(est >= threshold))

    return _pair_payload_join(
        pairs, sig_ds, id_col, "sig", payload_bytes=sig_bound,
        payload_schema=sig_schema,
    ).map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


_BROADCAST_PAYLOAD_BYTES = 64 << 20  # 64 MiB: comfortably object-store-shippable


def _pair_payload_join(pairs_ds, payload_ds, id_col: str, payload_col: str,
                       payload_bytes: int | None = None,
                       payload_schema: pa.Schema | None = None):
    """Attach a per-id payload column onto a pair table as
    ``<payload>_a`` / ``<payload>_b``.

    Two shapes, picked by MEASURED payload size (``payload_ds`` arrives
    materialized from the verify phases, so ``size_bytes`` is exact):

    * small payload (≤ 64 MiB): broadcast the payload BLOCK REFS — the
      driver never holds the rows, each worker fetches the blocks once
      from the object store (per-worker cache) and attaches both sides
      in one shuffle-free ``map_batches`` pass. Two partitioned
      exchanges for a 2.5 MB signature table were pure orchestration
      (7 s for 93k pairs at sf0.1).
    * large payload: two distributed hash joins co-partitioned by the
      pair ids — the scale-safe shape (no driver dict, no broadcast of
      candidate payloads; on a dup-heavy corpus the candidate bound is
      the output size).
    """
    import ray

    from osmpbf_ray.functions.joins import partitioned_hash_join
    from osmpbf_ray.state.workercache import cached

    if payload_bytes is None:
        # callers with a LAZY payload must pass an arithmetic bound —
        # size_bytes() on a lazy plan EXECUTES it
        try:
            payload_bytes = payload_ds.size_bytes()
        except Exception:
            payload_bytes = None
    if payload_bytes is not None and payload_bytes <= _BROADCAST_PAYLOAD_BYTES:
        refs = payload_ds.to_arrow_refs()
        pschema = (payload_schema if payload_schema is not None
                   else payload_ds.schema().base_schema)
        pt = pschema.field(1).type

        def build_lookup():
            # empty blocks can carry divergent (null-typed / metadata-
            # bearing) schemas — they contribute nothing, drop them
            tabs = [t.replace_schema_metadata(None) for t in
                    (ray.get(r) for r in refs) if t.num_rows]
            if not tabs:
                return np.empty(0, dtype=np.int64), pa.array([], type=pt)
            tbl = pa.concat_tables(tabs).combine_chunks().sort_by(id_col)
            return tbl.column(id_col).to_numpy(zero_copy_only=False), tbl.column(payload_col)

        cache_key = ("pair_payload", tuple(r.hex() for r in refs[:4]), len(refs))

        def attach(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"id_a": batch.column("id_a"), "id_b": batch.column("id_b"),
                                 f"{payload_col}_a": pa.array([], type=pt),
                                 f"{payload_col}_b": pa.array([], type=pt)})
            ids, vals = cached(cache_key, build_lookup)
            out = {"id_a": batch.column("id_a"), "id_b": batch.column("id_b")}
            for side in ("a", "b"):
                want = batch.column(f"id_{side}").to_numpy(zero_copy_only=False)
                pos = np.searchsorted(ids, want)
                if not np.array_equal(ids[np.minimum(pos, len(ids) - 1)], want):
                    raise ValueError("pair id missing from candidate payload table")
                out[f"{payload_col}_{side}"] = vals.take(pa.array(pos))
            return pa.table(out)

        return pairs_ds.select_columns(["id_a", "id_b"]).map_batches(
            attach, batch_format="pyarrow", zero_copy_batch=True
        )

    # LARGE payload: the payload pipeline is consumed EXACTLY ONCE and
    # can stay fully lazy — no object-store pin of the signature/vector
    # table (and no double execution of the candidate semi-join feeding
    # it). Shape: explode each pair into two (id_a, id_b, side, id)
    # rows, ONE distributed hash join attaches the payload by id, then
    # one hash partition on the pair key reassembles the two sides into
    # <payload>_a / <payload>_b columns. Exchange volume matches the
    # old two-join shape (the second join also moved pair rows with one
    # payload already attached); executions of the payload side drop
    # from 2 to 1.
    from osmpbf_ray.functions.partitioning import add_hash_pkey

    # groupby.map_groups upstream leaves pairs in ~n_parts TINY blocks;
    # per-block task orchestration then dominates the exchanges
    # (measured 0.7 s → 5.9 s for 93k pairs at 128 blocks). Coalesce to
    # row-sized blocks first — a cheap split/merge pass, no shuffle.
    try:
        rows = pairs_ds._meta_count()
    except Exception:
        rows = None
    n_buckets = None
    if rows is not None:
        pairs_ds = pairs_ds.repartition(int(np.clip(-(-rows // 250_000), 8, 512)))
        # tiny pair sets don't need 64 reduce groups per exchange — the
        # orchestration would dwarf the data; floor at 4, grow with rows
        n_buckets = int(np.clip(-(-rows // 125_000), 4, 1 << 16))

    # explicit schemas keep each exchange single-execution: schema()
    # on the lazy payload would otherwise run its whole upstream plan
    pschema = (payload_schema if payload_schema is not None
               else payload_ds.schema().base_schema)
    idt, pt = pschema.field(0).type, pschema.field(1).type
    pairs_ds = pairs_ds.select_columns(["id_a", "id_b"])

    def explode(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").combine_chunks()
        b = batch.column("id_b").combine_chunks()
        n = batch.num_rows
        return pa.table({
            "id_a": pa.concat_arrays([a, a]),
            "id_b": pa.concat_arrays([b, b]),
            "side": pa.array(np.r_[np.zeros(n, np.int8), np.ones(n, np.int8)]),
            "id": pa.concat_arrays([a, b]),
        })

    exploded_schema = pa.schema([
        pa.field("id_a", idt), pa.field("id_b", idt),
        pa.field("side", pa.int8()), pa.field("id", idt)])
    exploded = pairs_ds.map_batches(explode, batch_format="pyarrow",
                                    zero_copy_batch=True)
    payload_kv = payload_ds.map_batches(
        lambda b: b.rename_columns(["id", payload_col]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    kv_schema = pa.schema([pa.field("id", idt), pa.field(payload_col, pt)])
    attached = partitioned_hash_join(
        exploded, payload_kv, key="id", left_schema=exploded_schema,
        right_schema=kv_schema, n_buckets=n_buckets,
    )
    n_parts = n_buckets or 64

    def add_pairkey(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch.column("id_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        combo = (splitmix64(a) * np.uint64(0x9E3779B97F4A7C15)
                 + splitmix64(b)).view(np.int64)
        return add_hash_pkey(batch.append_column("__pairkey", pa.array(combo)),
                             "__pairkey", n_parts)

    def reassemble(part: pa.Table) -> pa.Table:
        t = part.drop_columns(["__pairkey", "__pkey"])
        empty = pa.table({"id_a": pa.array([], idt), "id_b": pa.array([], idt),
                          f"{payload_col}_a": pa.array([], pt),
                          f"{payload_col}_b": pa.array([], pt)})
        if t.num_rows == 0:
            return empty
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        s = t.column("side").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, b, a))
        a2, b2, s2 = a[order], b[order], s[order]
        if len(a2) % 2:
            raise ValueError("pair id missing from candidate payload table")
        even = np.arange(0, len(a2), 2)
        if not (np.array_equal(a2[even], a2[even + 1])
                and np.array_equal(b2[even], b2[even + 1])
                and (s2[even] == 0).all() and (s2[even + 1] == 1).all()):
            raise ValueError("pair id missing from candidate payload table")
        pay = t.column(payload_col).take(pa.array(order))
        if isinstance(pay, pa.ChunkedArray):
            pay = pay.combine_chunks()
        return pa.table({
            "id_a": pa.array(a2[even]), "id_b": pa.array(b2[even]),
            f"{payload_col}_a": pay.take(pa.array(even)),
            f"{payload_col}_b": pay.take(pa.array(even + 1)),
        })

    return (
        attached.map_batches(add_pairkey, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("__pkey")
        .map_groups(reassemble, batch_format="pyarrow")
    )


# --- SimHash ----------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over word-token hashes (sign of bit-weight sums)."""
    return int(simhash64_batch([text])[0])


_SIMHASH_TOK_CHUNK = 1 << 17  # 128k tokens → ≤64 MiB (total, 64) int64 expansion


def simhash64_batch(texts: list) -> np.ndarray:
    """Vectorized SimHash across a batch: one flat token-hash array, one
    (total, 64) bit expansion, per-doc segmented ``add.reduceat`` for the
    bit-weight sums — no per-doc Python hashing loop. Documents are
    processed in token-bounded chunks: the bit expansion costs ~512 B
    per token, so an unchunked 128 MiB text block (~20M tokens) would
    allocate ~10 GiB (the same bound every other wide kernel here
    carries — minhash_signatures, phash64_batch)."""
    th = [token_hashes(str(t)) for t in texts]
    out = np.zeros(len(texts), dtype=np.int64)
    nonempty = [i for i, h in enumerate(th) if len(h)]
    if not nonempty:
        return out
    shifts = np.arange(64, dtype=np.uint64)[None, :]
    start = 0
    while start < len(nonempty):
        end, tok = start, 0
        while end < len(nonempty) and (tok == 0
                                       or tok + len(th[nonempty[end]]) <= _SIMHASH_TOK_CHUNK):
            tok += len(th[nonempty[end]])
            end += 1
        docs = nonempty[start:end]
        lens = np.array([len(th[i]) for i in docs], dtype=np.int64)
        flat = np.concatenate([th[i] for i in docs])
        bits = ((flat[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
        weights = 2 * np.add.reduceat(bits, offs, axis=0) - lens[:, None]
        vals = ((weights > 0).astype(np.uint64) << shifts).sum(
            axis=1, dtype=np.uint64
        )
        out[docs] = vals.view(np.int64)
        start = end
    return out


class SimHashStage:
    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["simhash"] = simhash64_batch(list(batch[self.text_col]))
        return batch


# --- Hamming banding (shared by simhash + phash near-dup) -------------------


def _band_layout(n_bands: int) -> list[tuple[int, int]]:
    """(shift, width) per band, covering all 64 bits with near-equal widths."""
    base, rem = divmod(64, n_bands)
    out, shift = [], 0
    for i in range(n_bands):
        width = base + (1 if i < rem else 0)
        out.append((shift, width))
        shift += width
    return out


def hamming_near_dup_pairs(ds, hash_col: str, id_col: str, max_dist: int = 8,
                           n_bands: int | None = None):
    """Near-dup pairs among 64-bit hashes via band-exact LSH + Hamming verify.

    GUARANTEED recall for distances ≤ ``max_dist``: the hash splits into
    ``n_bands = max_dist + 1`` bit-bands (default), so by pigeonhole two
    hashes within ``max_dist`` differing bits agree exactly on at least
    one band and land in the same bucket. (Round 1 used 4 fixed bands
    with max_dist=16 — distances 4–16 were silently missed.)
    """
    if n_bands is None:
        n_bands = max_dist + 1
    layout = _band_layout(n_bands)

    def explode(batch: pa.Table) -> pa.Table:
        h = batch.column(hash_col).to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        parts = []
        for b, (shift, width) in enumerate(layout):
            mask = np.uint64((1 << width) - 1)
            val = ((h >> np.uint64(shift)) & mask).view(np.int64)
            parts.append(pa.table({
                id_col: batch.column(id_col),
                "band": pa.array(np.full(len(h), b, dtype=np.int64)),
                "band_val": pa.array(val),
                hash_col: batch.column(hash_col),
            }))
        return pa.concat_tables(parts) if parts else pa.table(
            {id_col: batch.column(id_col), "band": pa.array([], type=pa.int64()),
             "band_val": pa.array([], type=pa.int64()), hash_col: batch.column(hash_col)})

    exploded = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def hamming_empty() -> pd.DataFrame:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                             "id_b": pd.Series(dtype="int64"),
                             "hamming": pd.Series(dtype="int64")})

    def hamming_pair_fn(ids: np.ndarray, extras: dict) -> pd.DataFrame:
        ids, first = np.unique(ids, return_index=True)
        if len(ids) < 2:
            return hamming_empty()
        hs = extras[hash_col][first].astype(np.int64)
        out_a, out_b, dist = [], [], []
        for i in range(len(ids) - 1):
            d = hamming64(np.full(len(ids) - i - 1, hs[i]), hs[i + 1 :])
            hit = np.flatnonzero(d <= max_dist)
            for j in hit:
                out_a.append(ids[i])
                out_b.append(ids[i + 1 + j])
                dist.append(int(d[j]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": dist})

    pairs = _bucketed_pairs(exploded, ["band", "band_val"], id_col,
                            hamming_pair_fn, hamming_empty, extra_cols=(hash_col,),
                            n_parts=_fanout_for(ds, n_bands))
    # hamming is a pure function of the pair, identical across bands —
    # distinct over all three columns is a C-path aggregate
    return _dedup_pairs(pairs, ["id_a", "id_b", "hamming"])


def phash_exact_dedup(images_ds):
    """Exact image dedup on phash: keep min image_id per hash (north rule)."""
    return exact_dedup(images_ds, "phash", "image_id")


# --- n-gram Jaccard verify --------------------------------------------------


def ngram_jaccard_pairs(ds, pairs_ds, id_col="doc_id", text_col="text", k=5,
                        threshold=0.5, broadcast_bytes=None):
    """Exact n-gram Jaccard verify for candidate pairs.

    Fetches ONLY the candidate docs' texts (size-gated semi-join on the
    candidate id set — see ``candidate_semi_join``), then attaches them
    to the pair table through distributed hash joins on id_a/id_b — no
    driver-side text dict at any corpus or candidate size."""
    empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64()),
                      "jaccard": pa.array([], type=pa.float64())})
    pairs_ds = pairs_ds.materialize()  # size gate + verify both consume it
    cand_docs = candidate_semi_join(ds, id_col, pairs_ds, [id_col, text_col],
                                    broadcast_bytes=broadcast_bytes)
    if cand_docs is None:
        import ray.data as rd

        return rd.from_arrow(empty)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        # batch-vectorized shingle+intersect (bit-equal to the per-row
        # jaccard(char_shingle_hashes(...)) kernel)
        jac = batch_jaccard(batch.column("text_a"), batch.column("text_b"), k)
        out = batch.select(["id_a", "id_b"]).append_column(
            "jaccard", pa.array(jac, type=pa.float64())
        )
        return out.filter(pa.array(jac >= threshold))

    return _pair_payload_join(pairs_ds, cand_docs, id_col, "text").map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True
    )


# --- embedding cosine near-dup ---------------------------------------------


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


class HyperplaneBandStage:
    """vec → exploded (id, band, key) rows: sign bits of ``bits_per_band``
    hyperplanes per band, ``n_bands`` bands (multi-table OR — the
    S-curve that the round-1 single 16-plane table lacked)."""

    def __init__(self, planes_ref, id_col: str, vec_col: str,
                 n_bands: int, bits_per_band: int):
        import ray

        self.planes = ray.get(planes_ref)
        self.id_col, self.vec_col = id_col, vec_col
        self.n_bands, self.bits = n_bands, bits_per_band

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({self.id_col: pa.array([], type=pa.int64()),
                             "band": pa.array([], type=pa.int64()),
                             "band_key": pa.array([], type=pa.int64())})
        vecs = vecs_to_numpy(batch.column(self.vec_col))
        bits = (vecs @ self.planes.T) > 0  # (n, n_bands*bits)
        bits = bits.reshape(n, self.n_bands, self.bits)
        keys = (bits * (1 << np.arange(self.bits, dtype=np.int64))).sum(axis=2)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            self.id_col: np.repeat(ids, self.n_bands),
            "band": np.tile(np.arange(self.n_bands, dtype=np.int64), n),
            "band_key": keys.astype(np.int64).ravel(),
        })


def embedding_near_dup_pairs(ds, id_col="vec_id", vec_col="embedding",
                             threshold=0.9, n_bands=64, bits_per_band=16,
                             seed=7, concurrency=None, broadcast_bytes=None):
    """Near-dup by cosine ≥ threshold: banded hyperplane LSH candidates
    (ids only through the shuffle) + exact cosine verify on candidates.

    Output: (id_a, id_b, cosine) with cosine rounded half-away to 9
    digits. Band sizing: RANDOM (unrelated) vectors collide on a 16-bit
    band at ~2⁻¹⁶, so n·(n−1)/2 · bands/65536 junk candidates — tiny.
    Recall at cosine 0.9 is 1 − (1 − 0.856¹⁶)⁶⁴ ≈ 0.996; planted dups
    at ≥ 0.98 are missed with probability < 1e-11. (8-bit bands — the
    first attempt — collide at 1/256 and drown the verify stage in
    false candidates once n reaches a few thousand.)
    """
    import ray
    import ray.data as rd

    from osmpbf_ray.stages.ann import round_half_away

    first = ds.take(1)
    empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64()),
                      "cosine": pa.array([], type=pa.float64())})
    if not first:
        return rd.from_arrow(empty)
    dim = len(first[0][vec_col])
    planes_ref = ray.put(hyperplanes(dim, n_bands * bits_per_band, seed))

    exploded = ds.map_batches(
        HyperplaneBandStage(planes_ref, id_col, vec_col, n_bands, bits_per_band),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = _dedup_pairs(
        _bucketed_pairs(exploded, ["band", "band_key"], id_col,
                        _candidate_pair_fn, _candidate_pairs_empty,
                        n_parts=_fanout_for(ds, n_bands))
    ).materialize()  # consumed by the size gate AND the verify stage
    cand_vec_ds, n_cand = _candidate_fetch(ds, id_col, pairs,
                                           [id_col, vec_col],
                                           broadcast_bytes=broadcast_bytes)
    if cand_vec_ds is None:
        return rd.from_arrow(empty)

    def unit_rows(batch: pa.Table) -> pa.Table:
        """Unit vectors as fixed-width float64 binary — the payload the
        distributed verify joins onto the pair table (no driver matrix)."""
        mat = vecs_to_numpy(batch.column(vec_col)).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        return pa.table({id_col: batch.column(id_col),
                         "unit": pa.array([u.tobytes() for u in unit], type=pa.binary())})

    # lazy + arithmetic size gate, same reasoning as the minhash verify:
    # no materialize-to-measure, payload consumed once in the large path
    unit_ds = cand_vec_ds.map_batches(
        unit_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    if n_cand is None:
        n_cand = 2 * pairs.count()
    unit_bound = n_cand * (dim * 8 + 16)
    unit_schema = pa.schema([pa.field(id_col, pa.int64()),
                             pa.field("unit", pa.binary())])

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        ua = np.frombuffer(b"".join(batch.column("unit_a").to_pylist()),
                           dtype=np.float64).reshape(batch.num_rows, -1)
        ub = np.frombuffer(b"".join(batch.column("unit_b").to_pylist()),
                           dtype=np.float64).reshape(batch.num_rows, -1)
        cos = round_half_away(np.einsum("ij,ij->i", ua, ub), 9)
        out = batch.select(["id_a", "id_b"]).append_column(
            "cosine", pa.array(cos, type=pa.float64())
        )
        return out.filter(pa.array(cos >= threshold))

    return _pair_payload_join(
        pairs, unit_ds, id_col, "unit", payload_bytes=unit_bound,
        payload_schema=unit_schema,
    ).map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)
