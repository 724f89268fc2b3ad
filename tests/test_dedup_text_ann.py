"""Dedup families, text analysis, and ANN — each vs an independent oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from osmpbf_ray.sources import fixtures
from osmpbf_ray.stages import ann, dedup, text


def _docs_table(n=60, dup_pairs=5, seed=3):
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "osprey", "granite", "meadow",
             "the", "and", "of", "to", "river", "stone", "cloud"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(20, 60)))
        for _ in range(n - dup_pairs)
    ]
    # near-duplicates: copy with one word changed
    for i in range(dup_pairs):
        base = texts[i]
        texts.append(base + " extra")
    return pa.table({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})


def test_exact_dedup():
    tbl = pa.table(
        {"doc_id": [3, 1, 2, 4], "text": ["x", "x", "y", "z"]}
    )
    ds = rd.from_arrow(tbl).map_batches(dedup.add_md5_column, batch_format="pyarrow")
    out = dedup.exact_dedup(ds, "text_md5", "doc_id").to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 4]  # keeps min doc_id for dup group


def test_md5_matches_duckdb():
    import duckdb

    texts = ["hello", "wörld", ""]
    ours = dedup.md5_hex(texts)
    theirs = [duckdb.sql(f"select md5('{t}')").fetchone()[0] for t in texts]
    assert ours == theirs


def test_minhash_lsh_finds_near_dups():
    tbl = _docs_table(n=60, dup_pairs=5)
    ds = rd.from_arrow(tbl)
    pairs = dedup.minhash_candidate_pairs(
        ds, threshold=0.6, concurrency=2
    ).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    # the 5 injected near-dup pairs must all be found
    n = tbl.num_rows
    for i in range(5):
        assert (i, n - 5 + i) in got, (i, n - 5 + i, got)
    # est_jaccard must TRACK the true n-gram jaccard, not merely clear
    # the engine's own threshold (a self-referential check would pass
    # with an estimator stuck at 1.0)
    ta = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    for _, r in pairs.iterrows():
        assert r["est_jaccard"] >= 0.6
        true_j = float(dedup.batch_jaccard(pa.array([ta[r["id_a"]]]),
                                           pa.array([ta[r["id_b"]]]))[0])
        assert abs(r["est_jaccard"] - true_j) <= 0.2, (r["id_a"], r["id_b"], true_j)


def test_simhash_near_dup():
    tbl = _docs_table(n=40, dup_pairs=3)
    ds = rd.from_arrow(tbl).map_batches(
        dedup.SimHashStage, batch_format="pandas", concurrency=2
    )
    pairs = dedup.hamming_near_dup_pairs(ds, "simhash", "doc_id", max_dist=6).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    n = tbl.num_rows
    found = sum((i, n - 3 + i) in got for i in range(3))
    assert found >= 2  # simhash is approximate; most injected dups surface


def test_phash_dedup_banding():
    images = fixtures.make_images(150, dup_frac=0.08)
    ds = rd.from_arrow(images).select_columns(["image_id", "phash"])
    pairs = dedup.hamming_near_dup_pairs(ds, "phash", "image_id", max_dist=4).to_pandas()
    # oracle: all-pairs hamming over the 150 hashes
    ph = images.column("phash").to_numpy()
    ids = images.column("image_id").to_pylist()
    expect = set()
    for i in range(len(ph)):
        d = dedup.hamming64(np.full(len(ph) - i - 1, ph[i]), ph[i + 1 :])
        for j in np.flatnonzero(d <= 4):
            expect.add((ids[i], ids[i + 1 + j]))
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    # default banding is max_dist+1 bands: pigeonhole GUARANTEES recall
    # for every pair within max_dist, so the result is exactly the
    # brute-force all-pairs set (round 1 only guaranteed dist <= 3)
    assert got == expect


def test_phash_exact_dedup():
    images = fixtures.make_images(150, dup_frac=0.08)
    out = dedup.phash_exact_dedup(rd.from_arrow(images)).to_pandas()
    ph = images.to_pandas()
    expect = ph.sort_values("image_id").groupby("phash").head(1)
    assert sorted(out["image_id"]) == sorted(expect["image_id"])
    assert len(out) < 150 or ph["phash"].nunique() == 150


def test_embedding_near_dup():
    rng = np.random.default_rng(6)
    vecs = rng.standard_normal((50, 16))
    vecs[40] = vecs[10] + rng.standard_normal(16) * 0.01  # near-dup pair
    tbl = pa.table(
        {"vec_id": np.arange(50, dtype=np.int64), "embedding": [v.tolist() for v in vecs]}
    )
    pairs = dedup.embedding_near_dup_pairs(
        rd.from_arrow(tbl), threshold=0.95, concurrency=2
    ).to_pandas()
    assert (10, 40) in set(zip(pairs["id_a"], pairs["id_b"]))
    for _, r in pairs.iterrows():
        a, b = vecs[int(r["id_a"])], vecs[int(r["id_b"])]
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos >= 0.95


def test_simhash_full_recall_envelope():
    """Pigeonhole-complete banding: the engine pair set equals brute-force
    all-pairs at the requested max_dist (the round-1 config silently
    missed distances 4-16)."""
    tbl = _docs_table(n=50, dup_pairs=4, seed=11)
    hashes = np.array([dedup.simhash64(t) for t in tbl.column("text").to_pylist()])
    ds = rd.from_arrow(
        pa.table({"doc_id": tbl.column("doc_id"), "simhash": hashes})
    )
    for max_dist in (6, 16):
        pairs = dedup.hamming_near_dup_pairs(ds, "simhash", "doc_id", max_dist=max_dist).to_pandas()
        got = set(zip(pairs["id_a"], pairs["id_b"]))
        expect = set()
        for i in range(len(hashes)):
            d = dedup.hamming64(np.full(len(hashes) - i - 1, hashes[i]), hashes[i + 1 :])
            for j in np.flatnonzero(d <= max_dist):
                expect.add((i, i + 1 + j))
        assert got == expect, f"max_dist={max_dist}"


def test_embedding_near_dup_banded_recall():
    """Banded hyperplane LSH finds ALL planted high-cosine pairs (the
    round-1 single-table config had ~8% recall and returned 0 rows)."""
    rng = np.random.default_rng(21)
    base = rng.standard_normal((120, 32))
    vecs = np.vstack([base, base[:20] + rng.standard_normal((20, 32)) * 0.02])
    tbl = pa.table(
        {"vec_id": np.arange(len(vecs), dtype=np.int64),
         "embedding": [v.tolist() for v in vecs]}
    )
    pairs = dedup.embedding_near_dup_pairs(
        rd.from_arrow(tbl), threshold=0.95
    ).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    for i in range(20):
        cos = float(unit[i] @ unit[120 + i])
        if cos >= 0.95:
            assert (i, 120 + i) in got, (i, cos)
    # precision: every reported pair truly clears the threshold
    for _, r in pairs.iterrows():
        assert float(unit[int(r["id_a"])] @ unit[int(r["id_b"])]) >= 0.95 - 1e-9


def test_minhash_two_phase_no_signature_shuffle():
    """The exploded stage ships only (id, band, band_hash) — signatures
    never enter the shuffle (round 1 duplicated the 64-slot signature
    into all 16 band rows)."""
    stage = dedup.MinHashStage()
    out = stage(pa.table({"doc_id": np.array([1, 2], dtype=np.int64),
                          "text": ["alpha beta gamma", "alpha beta gamma"]}))
    assert set(out.column_names) == {"doc_id", "band", "band_hash"}
    assert out.num_rows == 2 * 16
    # identical docs agree on every band
    df = out.to_pandas().pivot(index="band", columns="doc_id", values="band_hash")
    assert (df[1] == df[2]).all()


def test_vectorized_minhash_matches_per_doc():
    texts = ["the quick brown fox", "jumps over the lazy dog", "x"]
    mat = dedup.minhash_signatures(texts, k=5, n_perm=64)
    for i, t in enumerate(texts):
        ref = dedup.minhash_signature(dedup.char_shingle_hashes(t, 5), 64)
        assert (mat[i] == ref).all()


def test_text_stages():
    tbl = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the cat and the dog went to the river",
                "der Hund ist nicht auf der Straße und das ist gut",
                "????",
                "El perro y el gato en la casa es que por",
            ],
        }
    )
    ds = rd.from_arrow(tbl)
    lang = ds.map_batches(text.LangIdStage, batch_format="pyarrow", concurrency=2).to_pandas()
    by_id = dict(zip(lang["doc_id"], lang["lang_pred"]))
    assert by_id[1] == "en" and by_id[2] == "de" and by_id[3] == "und" and by_id[4] == "es"

    q = ds.map_batches(text.QualityStage, batch_format="pyarrow", concurrency=2).to_pandas()
    row = q[q["doc_id"] == 1].iloc[0]
    assert row["q_n_words"] == 9
    assert row["q_stop_ratio"] > 0.3
    row3 = q[q["doc_id"] == 3].iloc[0]
    assert row3["q_punct_ratio"] == 1.0

    t = ds.map_batches(text.TokenCountStage, batch_format="pyarrow", concurrency=2).to_pandas()
    assert t[t["doc_id"] == 1]["n_ws_tokens"].iloc[0] == 9
    assert (t["n_bpe_tokens"] >= t["n_ws_tokens"] - 1).all()

    f = ds.map_batches(text.FingerprintStage, batch_format="pyarrow", concurrency=2).to_pandas()
    # deterministic + identical docs share fingerprints
    f2 = ds.map_batches(text.FingerprintStage, batch_format="pyarrow", concurrency=2).to_pandas()
    fa = [list(v) for v in f.sort_values("doc_id")["fingerprint"]]
    fb = [list(v) for v in f2.sort_values("doc_id")["fingerprint"]]
    assert fa == fb


def test_brute_force_topk_matches_numpy():
    rng = np.random.default_rng(8)
    vecs = rng.standard_normal((200, 12))
    tbl = pa.table(
        {"vec_id": np.arange(200, dtype=np.int64), "embedding": [v.tolist() for v in vecs]}
    )
    qv = rng.standard_normal((3, 12))
    out = ann.brute_force_topk(
        rd.from_arrow(tbl), np.arange(3), qv, k=7, concurrency=2
    ).to_pandas()
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qunit = qv / np.linalg.norm(qv, axis=1, keepdims=True)
    sim = unit @ qunit.T
    for q in range(3):
        expect = set(np.argsort(-sim[:, q], kind="stable")[:7].tolist())
        got = set(out[out["query_id"] == q]["vec_id"].tolist())
        assert got == expect


def test_ivf_topk_recall():
    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((400, 12))
    tbl = pa.table(
        {"vec_id": np.arange(400, dtype=np.int64), "embedding": [v.tolist() for v in vecs]}
    )
    qv = rng.standard_normal((4, 12))
    out = ann.ivf_topk(
        rd.from_arrow(tbl), np.arange(4), qv, k=5, n_centroids=8, n_probe=4,
        sample_size=400, concurrency=2,
    ).to_pandas()
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qunit = qv / np.linalg.norm(qv, axis=1, keepdims=True)
    sim = unit @ qunit.T
    recalls = []
    for q in range(4):
        expect = set(np.argsort(-sim[:, q], kind="stable")[:5].tolist())
        got = set(out[out["query_id"] == q]["vec_id"].tolist())
        recalls.append(len(got & expect) / 5)
    assert np.mean(recalls) >= 0.6  # probing half the lists: decent recall


def test_candidate_semi_join_paths_identical():
    """The LSH verify head's size gate: broadcast (<=64 MiB) and fully
    distributed (forced via broadcast_bytes=0) candidate fetches must
    produce byte-identical verified pairs."""
    docs = _docs_table(n=120, dup_pairs=20)
    ds = rd.from_arrow(docs)

    def key(df):
        return sorted(zip(df["id_a"], df["id_b"], df["est_jaccard"]))

    a = dedup.minhash_candidate_pairs(ds, threshold=0.7).to_pandas()
    b = dedup.minhash_candidate_pairs(ds, threshold=0.7, broadcast_bytes=0).to_pandas()
    assert len(a) > 0
    assert key(a) == key(b)

    pairs = dedup.minhash_candidate_pairs(ds, threshold=0.7)
    ja = dedup.ngram_jaccard_pairs(rd.from_arrow(docs), pairs).to_pandas()
    jb = dedup.ngram_jaccard_pairs(rd.from_arrow(docs), pairs,
                                   broadcast_bytes=0).to_pandas()
    assert sorted(zip(ja["id_a"], ja["id_b"], ja["jaccard"])) == \
        sorted(zip(jb["id_a"], jb["id_b"], jb["jaccard"]))


def test_embedding_near_dup_distributed_head_identical():
    """Forced-distributed candidate fetch (broadcast_bytes=0) must equal
    the broadcast path for the embedding LSH verify too."""
    rng = np.random.default_rng(22)
    base = rng.standard_normal((80, 16))
    vecs = np.vstack([base, base[:15] + rng.standard_normal((15, 16)) * 0.02])
    tbl = pa.table(
        {"vec_id": np.arange(len(vecs), dtype=np.int64),
         "embedding": [v.tolist() for v in vecs]}
    )
    a = dedup.embedding_near_dup_pairs(rd.from_arrow(tbl), threshold=0.9).to_pandas()
    b = dedup.embedding_near_dup_pairs(rd.from_arrow(tbl), threshold=0.9,
                                       broadcast_bytes=0).to_pandas()
    assert len(a) > 0
    assert sorted(zip(a["id_a"], a["id_b"], a["cosine"])) == \
        sorted(zip(b["id_a"], b["id_b"], b["cosine"]))


def test_ivf_clustered_layout_prunes_scan(tmp_path):
    """The list-clustered layout must make n_probe prune the SCAN:
    (a) full probe over the written partitions is bit-equal to brute
    force; (b) with n_probe < n_centroids the probe stage sees FEWER
    rows than the table holds (counted by a ScanCounter actor — the
    non-probed hive partitions are filtered out at file level and never
    read)."""
    import ray

    rng = np.random.default_rng(11)
    n = 600
    vecs = rng.standard_normal((n, 12))
    tbl = pa.table(
        {"vec_id": np.arange(n, dtype=np.int64),
         "embedding": [v.tolist() for v in vecs]}
    )
    qv = rng.standard_normal((3, 12))
    index_dir = str(tmp_path / "ivf")
    ann.ivf_build(rd.from_arrow(tbl), index_dir, n_centroids=8,
                  sample_size=n, concurrency=2)
    # every list got its own hive partition directory
    import os
    parts = sorted(os.listdir(os.path.join(index_dir, "lists")))
    assert all(p.startswith("ivf_list=") for p in parts) and len(parts) >= 2

    # (a) full probe == brute force, bit-equal
    full = ann.ivf_search(index_dir, np.arange(3), qv, k=5, n_probe=8,
                          concurrency=2).to_pandas()
    bf = ann.brute_force_topk(rd.from_arrow(tbl), np.arange(3), qv, k=5,
                              concurrency=2).to_pandas()
    key = lambda df: sorted(zip(df["query_id"], df["vec_id"], df["cosine"]))
    assert key(full) == key(bf)

    # (b) pruned probe scans strictly fewer rows than the table
    counter = ann.ScanCounter.remote()
    pruned = ann.ivf_search(index_dir, np.arange(3), qv, k=5, n_probe=2,
                            concurrency=2, scan_counter=counter).to_pandas()
    assert len(pruned) > 0
    # the stage's add.remote() calls are fire-and-forget from elastic
    # task workers — poll until the count settles (two consecutive
    # equal non-zero reads) before asserting, or a late delivery makes
    # this flaky under load
    import time

    scanned, prev = ray.get(counter.get.remote()), -1
    deadline = time.time() + 10
    while (scanned == 0 or scanned != prev) and time.time() < deadline:
        time.sleep(0.2)
        prev, scanned = scanned, ray.get(counter.get.remote())
    assert 0 < scanned < n, f"expected a pruned scan, saw {scanned}/{n} rows"

    # a second build into the same dir must refuse (append would
    # double-count on read)
    try:
        ann.ivf_build(rd.from_arrow(tbl), index_dir, n_centroids=8,
                      sample_size=n, concurrency=2)
        raise AssertionError("expected FileExistsError on dirty lists dir")
    except FileExistsError:
        pass


def test_pair_payload_join_lazy_path_identical(monkeypatch):
    """The large-payload shape (explode pairs → ONE lazy payload join →
    pair-key reassembly) must produce byte-identical verified pairs to
    the broadcast shape — forced by zeroing the broadcast gate."""
    docs = _docs_table(n=150, dup_pairs=25)
    ds = rd.from_arrow(docs)

    def key(df):
        return sorted(zip(df["id_a"], df["id_b"], df["est_jaccard"]))

    a = dedup.minhash_candidate_pairs(ds, threshold=0.5).to_pandas()
    monkeypatch.setattr(dedup, "_BROADCAST_PAYLOAD_BYTES", 0)
    b = dedup.minhash_candidate_pairs(ds, threshold=0.5).to_pandas()
    assert len(a) > 0
    assert key(a) == key(b)

    # embedding verify head through the same forced path
    rng = np.random.default_rng(21)
    vecs = rng.standard_normal((80, 8))
    vecs[40:50] = vecs[:10] + rng.standard_normal((10, 8)) * 0.01
    tbl = pa.table({"vec_id": np.arange(80, dtype=np.int64),
                    "embedding": [v.tolist() for v in vecs]})
    monkeypatch.undo()
    ea = dedup.embedding_near_dup_pairs(rd.from_arrow(tbl),
                                        threshold=0.9).to_pandas()
    monkeypatch.setattr(dedup, "_BROADCAST_PAYLOAD_BYTES", 0)
    eb = dedup.embedding_near_dup_pairs(rd.from_arrow(tbl),
                                        threshold=0.9).to_pandas()
    assert len(ea) > 0
    assert sorted(zip(ea["id_a"], ea["id_b"], ea["cosine"])) == \
        sorted(zip(eb["id_a"], eb["id_b"], eb["cosine"]))


def test_batch_jaccard_bit_equal_to_per_row():
    """The batch shingle+intersect kernel must reproduce the per-row
    jaccard(char_shingle_hashes) values exactly, including sub-k docs
    (crc fallback) and identical-set pairs (jaccard 1.0)."""
    rng = np.random.default_rng(13)
    words = ["alpha", "beta", "gamma", "x", "stone", "the quick brown"]
    ta, tb = [], []
    for _ in range(200):
        ka, kb = rng.integers(0, 25), rng.integers(0, 25)
        ta.append(" ".join(rng.choice(words, ka)) if ka else
                  rng.choice(["", "ab", "abcd"]))
        tb.append(" ".join(rng.choice(words, kb)) if kb else
                  rng.choice(["", "ab", "abcd"]))
    ta[0] = tb[0] = "identical document text here"  # jaccard exactly 1.0
    got = dedup.batch_jaccard(pa.array(ta), pa.array(tb), 5)
    want = np.array([
        dedup.jaccard(dedup.char_shingle_hashes(a, 5),
                      dedup.char_shingle_hashes(b, 5))
        for a, b in zip(ta, tb)])
    assert np.array_equal(got, want)
    assert got[0] == 1.0
