"""Multimodal video column: raw-frame decode, per-frame features,
frame sampling."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from osmpbf_ray.sources import fixtures
from osmpbf_ray.stages import video
from osmpbf_ray.stages.text import splitmix64


def _expected_pixels(n, nf, h, w):
    ids = np.arange(n, dtype=np.uint64)
    keys = ((ids[:, None] * np.uint64(64)
             + np.arange(nf, dtype=np.uint64)[None, :])[:, :, None]
            * np.uint64(4096)
            + np.arange(h * w, dtype=np.uint64)[None, None, :])
    return (splitmix64(keys) % np.uint64(256)).astype(np.int64)


def test_decode_frames_roundtrip():
    t = fixtures.make_video(6, 4, 8, 8)
    got = video.decode_frames(t.column("frames"), 4, 8, 8)
    assert (got.astype(np.int64) == _expected_pixels(6, 4, 8, 8)).all()


def test_decode_frames_sliced_and_ragged():
    t = fixtures.make_video(6, 4, 8, 8)
    got = video.decode_frames(t.slice(2, 3).column("frames"), 4, 8, 8)
    assert (got.astype(np.int64) == _expected_pixels(6, 4, 8, 8)[2:5]).all()
    with pytest.raises(ValueError, match="ragged or mis-sized"):
        video.decode_frames(pa.chunked_array([pa.array([b"\x00", b"\x00\x00"])]), 1, 1, 1)


def test_compressed_codec_is_stubbed():
    with pytest.raises(NotImplementedError, match="h264"):
        video.decode_compressed(b"\x00", "h264")


def test_frame_stats_match_numpy():
    n, nf, h, w = 5, 6, 8, 8
    out = video.VideoFrameStats()(fixtures.make_video(n, nf, h, w)).to_pandas()
    px = _expected_pixels(n, nf, h, w)
    assert len(out) == n * nf
    for _, r in out.iterrows():
        i, f = int(r.video_id), int(r.frame)
        assert r.px_sum == px[i, f].sum()
        expect_motion = 0 if f == 0 else np.abs(px[i, f] - px[i, f - 1]).sum()
        assert r.motion == expect_motion


def test_frame_sample_keeps_every_kth():
    n, nf, h, w, k = 4, 8, 8, 8, 3
    sampled = video.FrameSampleStage(every_k=k)(fixtures.make_video(n, nf, h, w))
    kept = (nf + k - 1) // k
    assert sampled.column("n_frames")[0].as_py() == kept
    got = video.decode_frames(sampled.column("frames"), kept, h, w)
    assert (got.astype(np.int64) == _expected_pixels(n, nf, h, w)[:, ::k, :]).all()


def test_frame_sample_invalid_k():
    with pytest.raises(ValueError, match="every_k"):
        video.FrameSampleStage(every_k=0)


def test_stats_empty_batch_schema():
    out = video.VideoFrameStats()(fixtures.make_video(2, 4, 8, 8).slice(0, 0))
    assert out.num_rows == 0
    assert out.schema.names == ["video_id", "frame", "px_sum", "motion"]


def test_video_dataset_composition():
    """frame_sample → frame_stats composes through the Dataset API and
    the sampled motion equals |kept - previous kept| of the original."""
    n, nf, h, w, k = 8, 8, 8, 8, 2
    ds = rd.from_arrow(fixtures.make_video(n, nf, h, w))
    out = video.frame_stats(video.frame_sample(ds, every_k=k, concurrency=2),
                            concurrency=2).to_pandas()
    px = _expected_pixels(n, nf, h, w)[:, ::k, :]
    assert len(out) == n * px.shape[1]
    for _, r in out.iterrows():
        i, f = int(r.video_id), int(r.frame)
        assert r.px_sum == px[i, f].sum()
        expect = 0 if f == 0 else np.abs(px[i, f] - px[i, f - 1]).sum()
        assert r.motion == expect


def test_zraw_codec_lossless_roundtrip():
    flat = _expected_pixels(4, 8, 8, 8).reshape(4, -1)
    for i in range(4):
        enc = video.encode_zraw(flat[i])
        dec = video.decode_compressed(enc, video.ZRAW_CODEC)
        assert np.array_equal(dec, flat[i])
    with pytest.raises(NotImplementedError):
        video.decode_compressed(b"\x00", "h264")


def test_ldcv_codec_psnr_bound():
    """The engine's lossy intra-frame DCT codec must satisfy the north
    rule's decoded-pixel invariant: PSNR >= 40 dB per clip at default
    quality, with a real compression win over raw."""
    from osmpbf_ray.stages.image import psnr

    px = _expected_pixels(3, 8, 16, 16)  # (n, nf, h*w)
    for i in range(3):
        enc = video.encode_ldcv(px[i], 16, 16)
        dec = video.decode_compressed(enc, video.LDCV_CODEC)
        assert dec.shape == (8, 256)
        p = psnr(px[i].reshape(8, 16, 16), dec.reshape(8, 16, 16))
        assert p >= 40.0, f"clip {i} PSNR {p}"


def test_frame_stats_on_compressed_codecs():
    """frame_stats and frame_sample compose over compressed payloads:
    zraw results equal the raw-codec results bit-for-bit; the sampled
    output payload is rewritten as raw."""
    raw = fixtures.make_video(6, 8, 8, 8)
    zr = fixtures.make_video(6, 8, 8, 8, codec="zraw_gray8")
    a = video.VideoFrameStats()(raw)
    b = video.VideoFrameStats()(zr)
    assert a.equals(b)
    sampled = video.FrameSampleStage(every_k=2)(zr)
    assert sampled.column("codec")[0].as_py() == video.RAW_CODEC
    c = video.VideoFrameStats()(sampled)
    assert c.num_rows == 6 * 4
