"""Deduplication families: exact, MinHash+LSH, SimHash, n-gram Jaccard,
phash Hamming banding, embedding-cosine near-dup.

Engine-new (SURVEY.md §2.7 notes the reference has none; the north rule
requires phash dedup on the image table). The common scale shape:

  per-batch signature (vectorized)  →  explode to (band, value) rows
  →  groupby(band key)              →  per-group verify (tiny groups)

so the shuffle moves signature rows, never documents, and the quadratic
verify happens only inside LSH buckets. All hashes are deterministic
across processes (crc32/splitmix — no PYTHONHASHSEED dependence).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from osmpbf_ray.stages.image import hamming64
from osmpbf_ray.stages.text import splitmix64, token_hashes

# --- exact dedup ------------------------------------------------------------


def md5_hex(texts) -> list[str]:
    """md5 of utf-8 text — value-identical to DuckDB's md5() for oracle checks."""
    import hashlib

    return [hashlib.md5(str(t).encode("utf-8")).hexdigest() for t in texts]


def add_md5_column(batch: pa.Table, text_col: str = "text", out_col: str = "text_md5") -> pa.Table:
    return batch.append_column(out_col, pa.array(md5_hex(batch.column(text_col).to_pylist())))


def exact_dedup(ds, key_col: str, order_col: str):
    """Keep the first row (min order_col) per key — hash-partitioned.

    ``groupby(key).map_groups(head(1))`` after an in-group sort; the
    shuffle key is the content hash so duplicates co-locate.
    """

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_col, kind="stable").head(1)

    return ds.groupby(key_col).map_groups(first, batch_format="pandas")


# --- shingles + MinHash -----------------------------------------------------


def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """uint64 hashes of the k-char shingle set (vectorized per doc)."""
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


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


class MinHashStage:
    """Actor stage: text → minhash signature + LSH band keys, exploded.

    Emits ``n_bands`` rows per document: (band, band_hash, doc id).
    Bands of ``rows_per_band`` signature slots each; two docs share a
    band key iff that band's slots all agree — the standard LSH S-curve.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 k: int = 5, n_perm: int = 64, n_bands: int = 16):
        assert n_perm % n_bands == 0
        self.id_col, self.text_col = id_col, text_col
        self.k, self.n_perm, self.n_bands = k, n_perm, n_bands
        self.rows_per_band = n_perm // n_bands

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        sigs = np.empty((n, self.n_perm), dtype=np.uint64)
        for i, text in enumerate(batch[self.text_col]):
            sigs[i] = minhash_signature(char_shingle_hashes(str(text), self.k), self.n_perm)
        chunks = sigs.reshape(n, self.n_bands, self.rows_per_band)
        second = chunks[:, :, 1] if self.rows_per_band > 1 else chunks[:, :, 0]
        bh = splitmix64(chunks[:, :, 0] ^ splitmix64(second)).astype(np.int64)
        # one materialized signature list per doc, band rows share it by
        # reference (the old per-band tolist() dominated the stage cost)
        sig_lists = sigs.astype(np.int64).tolist()
        return pd.DataFrame(
            {
                self.id_col: np.repeat(batch[self.id_col].to_numpy(), self.n_bands),
                "band": np.tile(np.arange(self.n_bands), n),
                "band_hash": bh.ravel(),
                "sig": [sig_lists[i] for i in np.repeat(np.arange(n), self.n_bands)],
            }
        )


def minhash_candidate_pairs(ds, id_col="doc_id", text_col="text",
                            k=5, n_perm=64, n_bands=16, threshold=0.7, concurrency=(1, 4)):
    """MinHash+LSH near-dup: candidate pairs with estimated Jaccard ≥ threshold.

    ``groupby(band, band_hash)`` co-locates collisions; pairs verified by
    signature agreement inside each (tiny) bucket; de-duplicated across
    bands by a final groupby on the pair key.
    """
    exploded = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, k=k, n_perm=n_perm, n_bands=n_bands
        ),
        batch_format="pandas",
        concurrency=concurrency,
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"), "est_jaccard": pd.Series(dtype="float64")})
        g = g.sort_values(id_col, kind="stable")
        ids = g[id_col].to_numpy()
        sigs = np.array(g["sig"].tolist(), dtype=np.int64)
        out_a, out_b, est = [], [], []
        for i in range(len(ids)):
            agree = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            hit = np.flatnonzero(agree >= threshold)
            for j in hit:
                out_a.append(ids[i])
                out_b.append(ids[i + 1 + j])
                est.append(float(agree[j]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "est_jaccard": est})

    pairs = exploded.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # same pair can surface from several bands — keep one
    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["id_a", "id_b"]).map_groups(dedup_pairs, batch_format="pandas")


# --- SimHash ----------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over word-token hashes (sign of bit-weight sums)."""
    th = token_hashes(text)
    if len(th) == 0:
        return 0
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    weights = (2 * bits - 1).sum(axis=0)
    val = np.uint64(0)
    for i in range(64):
        if weights[i] > 0:
            val |= np.uint64(1) << np.uint64(i)
    return int(val.astype(np.int64))


class SimHashStage:
    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["simhash"] = [simhash64(str(t)) for t in batch[self.text_col]]
        return batch


# --- Hamming banding (shared by simhash + phash near-dup) -------------------


def hamming_near_dup_pairs(ds, hash_col: str, id_col: str, max_dist: int = 8,
                           n_bands: int = 4):
    """Near-dup pairs among 64-bit hashes via band-exact LSH + Hamming verify.

    Split each hash into ``n_bands`` equal bit-bands; two hashes within
    Hamming distance < 64/n_bands·? share at least one exact band by
    pigeonhole when max_dist < n_bands. groupby(band, value) then verify.
    """
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)

    def explode(batch: pa.Table) -> pa.Table:
        h = batch.column(hash_col).to_numpy().astype(np.uint64)
        ids = batch.column(id_col)
        out_ids, out_band, out_val, out_hash = [], [], [], []
        for b in range(n_bands):
            val = ((h >> np.uint64(b * width)) & mask).astype(np.int64)
            out_ids.append(ids)
            out_band.append(pa.array(np.full(len(h), b, dtype=np.int64)))
            out_val.append(pa.array(val))
            out_hash.append(batch.column(hash_col))
        return pa.table(
            {
                id_col: pa.concat_arrays([pa.array(c.to_pylist()) for c in out_ids]),
                "band": pa.concat_arrays(out_band),
                "band_val": pa.concat_arrays(out_val),
                hash_col: pa.concat_arrays([pa.array(c.to_pylist()) for c in out_hash]),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"), "hamming": pd.Series(dtype="int64")})
        g = g.sort_values(id_col, kind="stable").drop_duplicates(id_col)
        ids = g[id_col].to_numpy()
        hs = g[hash_col].to_numpy().astype(np.int64)
        out_a, out_b, dist = [], [], []
        for i in range(len(ids) - 1):
            d = hamming64(np.full(len(ids) - i - 1, hs[i]), hs[i + 1 :])
            hit = np.flatnonzero(d <= max_dist)
            for j in hit:
                out_a.append(ids[i])
                out_b.append(ids[i + 1 + j])
                dist.append(int(d[j]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": dist})

    pairs = exploded.groupby(["band", "band_val"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def phash_exact_dedup(images_ds):
    """Exact image dedup on phash: keep min image_id per hash (north rule)."""
    return exact_dedup(images_ds, "phash", "image_id")


# --- n-gram Jaccard verify --------------------------------------------------


def ngram_jaccard_pairs(ds, pairs_ds, id_col="doc_id", text_col="text", k=5,
                        threshold=0.5):
    """Exact n-gram Jaccard for candidate pairs (small candidate set:
    texts fetched via driver-side broadcast dict)."""
    import ray

    texts = {}
    for b in ds.select_columns([id_col, text_col]).iter_batches(batch_format="pyarrow"):
        texts.update(zip(b.column(id_col).to_pylist(), b.column(text_col).to_pylist()))
    ref = ray.put(texts)

    class Verify:
        def __init__(self):
            self.texts = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            jac = [
                jaccard(
                    char_shingle_hashes(str(self.texts.get(a, "")), k),
                    char_shingle_hashes(str(self.texts.get(b, "")), k),
                )
                for a, b in zip(batch["id_a"], batch["id_b"])
            ]
            batch["jaccard"] = jac
            return batch[batch["jaccard"] >= threshold]

    return pairs_ds.map_batches(Verify, batch_format="pandas", concurrency=(1, 2))


# --- embedding cosine near-dup ---------------------------------------------


def embedding_near_dup_pairs(ds, id_col="vec_id", vec_col="embedding",
                             threshold=0.95, n_planes=16, seed=7, concurrency=(1, 4)):
    """Near-dup by cosine ≥ threshold: random-hyperplane LSH buckets +
    exact cosine verify within buckets."""
    import ray

    def make_planes(dim):
        rng = np.random.default_rng(seed)
        return rng.standard_normal((n_planes, dim))

    first = ds.take(1)[0]
    planes_ref = ray.put(make_planes(len(first[vec_col])))

    class Bucket:
        def __init__(self):
            self.planes = ray.get(planes_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vecs = np.array(batch[vec_col].tolist(), dtype=np.float64)
            bits = (vecs @ self.planes.T) > 0
            key = (bits * (1 << np.arange(n_planes))).sum(axis=1)
            out = batch[[id_col]].copy()
            out["bucket"] = key.astype(np.int64)
            out["vec"] = [v.tolist() for v in vecs]
            return out

    bucketed = ds.map_batches(Bucket, batch_format="pandas", concurrency=concurrency)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"), "cosine": pd.Series(dtype="float64")})
        g = g.sort_values(id_col, kind="stable")
        ids = g[id_col].to_numpy()
        vecs = np.array(g["vec"].tolist())
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        sim = unit @ unit.T
        iu = np.triu_indices(len(ids), 1)
        hit = sim[iu] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[iu[0][hit]],
                "id_b": ids[iu[1][hit]],
                "cosine": sim[iu][hit],
            }
        )

    return bucketed.groupby("bucket").map_groups(verify, batch_format="pandas")
