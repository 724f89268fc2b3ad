"""Image codec + phash tests (per-row invariant from BASELINE.json:input_hint:
decoded-pixel allclose — exact for png, PSNR >= 40 dB for lossy — and
caption byte-equality through the pipeline)."""

import numpy as np
import pytest

from osmpbf_ray.sources import fixtures
from osmpbf_ray.stages import image as img


def test_png_roundtrip_exact():
    rng = np.random.default_rng(1)
    for h, w in [(16, 16), (33, 47), (64, 16)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (img.decode_png(img.encode_png(px)) == px).all()


def test_png_filters_decode():
    # synthesize a PNG using each filter type manually and check decode
    import struct
    import zlib

    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    # encode with per-row filter types 0..4
    stride = 12
    rows = []
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(5):
        ftype = r % 5
        line = px[r].reshape(-1).astype(np.int32)
        if ftype == 0:
            enc = line
        elif ftype == 1:
            left = np.concatenate([[0, 0, 0], line[:-3]])
            enc = (line - left) & 0xFF
        elif ftype == 2:
            enc = (line - prev) & 0xFF
        elif ftype == 3:
            left = np.concatenate([[0, 0, 0], line[:-3]])
            enc = (line - (left + prev) // 2) & 0xFF
        else:
            left = np.concatenate([[0, 0, 0], line[:-3]])
            upleft = np.concatenate([[0, 0, 0], prev[:-3]])
            p = left + prev - upleft
            pa_, pb_, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa_ <= pb_) & (pa_ <= pc_), left, np.where(pb_ <= pc_, prev, upleft)
            )
            enc = (line - pred) & 0xFF
        rows.append(bytes([ftype]) + enc.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + img._chunk(b"IHDR", ihdr)
        + img._chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + img._chunk(b"IEND", b"")
    )
    assert (img.decode_png(data) == px).all()


def test_lossy_psnr_invariant():
    rng = np.random.default_rng(3)
    for _ in range(5):
        px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        rec = img.decode_lossy(img.encode_lossy(px, 1.0))
        assert img.psnr(px, rec) >= 40.0


def test_decode_image_dispatch_and_errors():
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    assert (img.decode_image(img.encode_png(px), "png") == px).all()
    with pytest.raises(ValueError):
        img.decode_image(b"garbage", "png")
    with pytest.raises(ValueError):
        img.decode_image(b"garbage", "gif")


def test_resize_area():
    rng = np.random.default_rng(9)
    # exact mean on an integer-divisible downsample
    px = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    small = img.resize_area(px, 16, 16)
    expect = np.round(
        px.astype(np.float64).reshape(16, 4, 16, 4, 3).mean(axis=(1, 3))
    ).astype(np.uint8)
    assert (small == expect).all()
    # constant image stays constant at any scale (up + down)
    flat = np.full((10, 7, 3), 123, dtype=np.uint8)
    for shape in [(3, 3), (32, 32), (5, 20)]:
        assert (img.resize_area(flat, *shape) == 123).all()


def test_image_resize_stage():
    import ray.data as rd

    from osmpbf_ray.sources import fixtures
    from osmpbf_ray.stages.image import ImageResizeStage

    images = fixtures.make_images(40)
    out = (
        rd.from_arrow(images)
        .map_batches(
            ImageResizeStage,
            fn_constructor_kwargs={"out_h": 16, "out_w": 16},
            batch_format="pyarrow",
            batch_size=16,
            concurrency=2,
        )
        .to_pandas()
    )
    assert len(out) == 40 and not out["decode_error"].any()
    # thumbnails are valid PNGs of the requested size
    px = img.decode_png(out["thumb_bytes"].iloc[0])
    assert px.shape == (16, 16, 3)
    # box-filter mass conservation: fixture dims (16/32/64) all divide
    # 16, so the float thumbnail mean equals the source mean exactly
    # (the image_resize oracle's invariant)
    assert (out["mass_resid"] == 0.0).all()


def test_resize_area_float_mass_conservation():
    rng = np.random.default_rng(11)
    for h, w in [(16, 64), (32, 32), (64, 16)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        thumb = img.resize_area_float(px, 16, 16)
        assert abs(thumb.mean() - px.astype(np.float64).mean()) < 1e-9
    # non-divisible dims: residual is real but small (weighted-bin drift)
    px = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    thumb = img.resize_area_float(px, 16, 16)
    assert abs(thumb.mean() - px.astype(np.float64).mean()) < 8.0


def test_phash_properties():
    rng = np.random.default_rng(4)
    a = fixtures._synth_pixels(rng, 64, 64, 1)
    b = fixtures._synth_pixels(rng, 64, 64, 7)
    ha = img.phash64(a)
    # lossy re-encode is a near-duplicate: small hamming distance
    a2 = img.decode_lossy(img.encode_lossy(a, 0.6))
    assert img.hamming64(np.array([ha]), np.array([img.phash64(a2)]))[0] <= 4
    # different structure: large distance
    assert img.hamming64(np.array([ha]), np.array([img.phash64(b)]))[0] > 8


def test_fixture_images_invariants():
    tbl = fixtures.make_images(50)
    assert tbl.num_rows == 50
    rows = tbl.to_pylist()
    for r in rows:
        px = img.decode_image(r["bytes"], r["fmt"])
        assert px.shape == (r["h"], r["w"], 3)
        assert img.phash64(px) == r["phash"]
        assert r["caption"].startswith("synthetic scene ")
    # deterministic across calls
    tbl2 = fixtures.make_images(50)
    assert tbl.equals(tbl2)
