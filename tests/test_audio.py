"""Multimodal audio column: PCM decode + windowed feature stage."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from osmpbf_ray.sources import fixtures
from osmpbf_ray.stages import audio
from osmpbf_ray.stages.text import splitmix64


def _expected_samples(n, n_samples):
    keys = (np.arange(n, dtype=np.uint64)[:, None] << np.uint64(32)) + np.arange(
        n_samples, dtype=np.uint64
    )[None, :]
    return (splitmix64(keys) & np.uint64(0xFFFF)).astype(np.int64) - 32768


def test_decode_pcm16_bytes_roundtrip():
    t = fixtures.make_audio(8, 128)
    got = audio.decode_pcm16(t.column("pcm"), 128)
    assert (got.astype(np.int64) == _expected_samples(8, 128)).all()


def test_decode_pcm16_sliced_array():
    """Arrow slices carry a nonzero array offset — the raw-buffer read
    must honor it."""
    t = fixtures.make_audio(8, 128)
    got = audio.decode_pcm16(t.slice(3, 4).column("pcm"), 128)
    assert (got.astype(np.int64) == _expected_samples(8, 128)[3:7]).all()


def test_decode_pcm16_ragged_raises():
    bad = pa.chunked_array([pa.array([b"\x00\x00", b"\x00\x00\x00\x00"])])
    with pytest.raises(ValueError, match="ragged or mis-sized"):
        audio.decode_pcm16(bad, 1)


def test_compressed_codec_is_stubbed():
    with pytest.raises(NotImplementedError, match="mp3"):
        audio.decode_compressed(b"\xff\xfb", "mp3")


def test_features_match_numpy_reference():
    """Stage output equals an independent per-window numpy computation."""
    n, n_samples, w = 6, 256, 64
    t = fixtures.make_audio(n, n_samples)
    out = audio.AudioFeatures(window=w)(t).to_pandas()
    s = _expected_samples(n, n_samples)
    assert len(out) == n * (n_samples // w)
    for _, row in out.iterrows():
        seg = s[int(row.audio_id), int(row.window) * w:(int(row.window) + 1) * w]
        assert row.sumsq == (seg * seg).sum()
        assert row.n_cross == int(((seg[:-1] * seg[1:]) < 0).sum())
        assert row.rms == pytest.approx(np.sqrt((seg * seg).sum() / w), abs=1e-8)


def test_features_empty_batch_schema():
    out = audio.AudioFeatures(window=16)(fixtures.make_audio(2, 64).slice(0, 0))
    assert out.num_rows == 0
    assert out.schema.names == ["audio_id", "window", "sumsq", "n_cross", "rms"]


def test_features_window_must_divide():
    with pytest.raises(ValueError, match="divide"):
        audio.AudioFeatures(window=100)(fixtures.make_audio(2, 64))


def test_audio_features_dataset_path():
    ds = rd.from_arrow(fixtures.make_audio(16, 256))
    out = audio.audio_features(ds, window=64, concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 16 * 4
    assert out.groupby("audio_id").size().eq(4).all()
