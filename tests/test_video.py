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
