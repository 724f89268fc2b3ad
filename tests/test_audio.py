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


def test_mulaw_matches_audioop_reference():
    """The G.711 encode/decode must be byte-identical to CPython's
    audioop implementation across the FULL int16 range (the industry
    reference for this codec)."""
    audioop = pytest.importorskip("audioop")

    x = np.arange(-32768, 32768, dtype=np.int16)
    enc = audio.mulaw_encode(x)
    ref = np.frombuffer(audioop.lin2ulaw(x.tobytes(), 2), dtype=np.uint8)
    assert np.array_equal(enc, ref)
    dec = audio.mulaw_decode(np.arange(256, dtype=np.uint8))
    dref = np.frombuffer(
        audioop.ulaw2lin(bytes(np.arange(256, dtype=np.uint8)), 2),
        dtype=np.int16)
    assert np.array_equal(dec, dref)


def test_mulaw_roundtrip_and_decode_compressed():
    """encode→decode is idempotent on decoded values (a µ-law code maps
    to one quantized sample), decode_compressed dispatches the codec,
    and unknown codecs still raise the declared stub error."""
    rng = np.random.default_rng(6)
    x = rng.integers(-32768, 32768, size=4096).astype(np.int16)
    enc = audio.mulaw_encode(x)
    dec = audio.decode_compressed(enc.tobytes(), audio.MULAW_CODEC)
    assert dec.dtype == np.int16 and len(dec) == len(x)
    # companding is a quantizer: re-encoding the decoded signal is a fixpoint
    assert np.array_equal(audio.mulaw_encode(dec), enc)
    # quantization error bounded by the largest segment step (~1/8 magnitude)
    assert np.abs(dec.astype(np.int32) - x.astype(np.int32)).max() <= 1024
    with pytest.raises(NotImplementedError):
        audio.decode_compressed(b"\x00", "mp3")


def test_audio_features_mulaw_pipeline():
    """The windowed feature stage decodes µ-law payloads transparently
    (codec column dispatch): features equal the PCM pipeline run on the
    companded samples."""
    tbl = fixtures.make_audio(6, 1024, codec="mulaw_u8")
    out = audio.AudioFeatures(window=256)(tbl)
    # independent recompute: expected samples → encode∘decode → features
    exp = _expected_samples(6, 1024).astype(np.int16)
    comp = audio.mulaw_decode(audio.mulaw_encode(exp)).astype(np.int64)
    wins = comp.reshape(6, 4, 256)
    sumsq = (wins * wins).sum(axis=2).ravel()
    assert np.array_equal(out.column("sumsq").to_numpy(), sumsq)
