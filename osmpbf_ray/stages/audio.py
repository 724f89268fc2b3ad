"""Multimodal audio column: opaque PCM ``binary`` payload + typed
metadata (sample rate, length), processed by vectorized frame-window
feature stages.

Mirrors the image layer's design (stages/image.py): the payload is an
opaque binary column in the Dataset; decode + feature extraction run as
``map_batches`` stages whose per-batch math is numpy-vectorized across
ALL windows of ALL clips at once. At 100 TB the audio table streams
block-by-block; nothing here materializes more than one batch.

The synthetic clips (sources/fixtures.make_audio) carry splitmix64-
derived int16 samples, so per-window features (sum-of-squares, zero
crossings, RMS) are integer-exactly recomputable in DuckDB from first
principles — the engine decodes the ACTUAL bytes while the oracle
re-derives the samples, making the compare a real decode check.

Compressed payloads: ``mulaw_u8`` (ITU-T G.711 µ-law, 8 bits/sample) is
decoded NATIVELY — the companding is pure integer arithmetic, so the
decode is bit-exact and the DuckDB oracle reproduces encode∘decode from
first principles (queries.q_audio_features_mulaw). Perceptual codecs
(mp3/ogg/flac) need external libraries this environment doesn't ship;
for those ``decode_compressed`` remains the clearly-marked stub
boundary — the Ray-side plumbing (schema, batching, actor signature,
output layout) is identical either way.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osmpbf_ray.stages.ann import round_half_away
from osmpbf_ray.state.workercache import task_stage

PCM_CODEC = "pcm_s16le"
MULAW_CODEC = "mulaw_u8"

_MULAW_BIAS = 0x84  # 132, at 16-bit scale; 33 at the CCITT 14-bit scale
_MULAW_SEG_ENDS = np.array([0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF,
                            0x1FFF], dtype=np.int32)


def mulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 PCM → 8-bit G.711 µ-law codes.

    Vectorized CCITT reference algorithm (14-bit arithmetic-shifted
    input, clip 8159, bias 33, segment search, 4-bit mantissa, ones'
    complement) — verified byte-identical to CPython's ``audioop``
    ``lin2ulaw`` across the full int16 range."""
    x14 = np.asarray(samples).astype(np.int32) >> 2
    mask = np.where(x14 < 0, 0x7F, 0xFF)
    mag = np.where(x14 < 0, -x14, x14)
    mag = np.minimum(mag, 8159) + 33
    seg = (mag[..., None] > _MULAW_SEG_ENDS).sum(axis=-1)
    uval = np.where(seg >= 8, 0x7F, (seg << 4) | ((mag >> (seg + 1)) & 0x0F))
    return (uval ^ mask).astype(np.uint8)


# 256-entry exact decode table (decode is a pure function of the byte;
# the standard ulaw2linear16 expansion, byte-identical to audioop)
def _mulaw_table() -> np.ndarray:
    u = ~np.arange(256, dtype=np.int32) & 0xFF
    t = (((u & 0x0F) << 3) + _MULAW_BIAS) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, _MULAW_BIAS - t, t - _MULAW_BIAS).astype(np.int16)


_MULAW_LUT = _mulaw_table()


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """8-bit µ-law codes → int16 samples (exact 256-entry LUT)."""
    return _MULAW_LUT[np.asarray(codes, dtype=np.uint8)]


def decode_compressed(data: bytes, codec: str) -> np.ndarray:
    """Compressed clip bytes → int16 sample array. ``mulaw_u8`` decodes
    natively (G.711, bit-exact); perceptual codecs (mp3/ogg/flac) need
    external decoder libraries this environment doesn't ship and raise —
    swap the fallthrough for a real decoder in production."""
    if codec == MULAW_CODEC:
        return mulaw_decode(np.frombuffer(data, dtype=np.uint8))
    raise NotImplementedError(
        f"compressed audio codec {codec!r} requires an external decoder; "
        f"only {PCM_CODEC} and {MULAW_CODEC} are decoded natively"
    )


def decode_pcm16(batch_pcm: pa.ChunkedArray | pa.Array, n_samples: int) -> np.ndarray:
    """(n_rows, n_samples) int16 matrix from a binary column of
    little-endian 16-bit PCM clips of uniform length.

    One ``frombuffer`` over the binary column's contiguous Arrow data
    buffer (zero-copy), then a reshape — no per-row Python loop. Ragged
    inputs raise (callers window per-clip lengths upstream)."""
    arr = batch_pcm.combine_chunks() if isinstance(batch_pcm, pa.ChunkedArray) else batch_pcm
    n = len(arr)
    if n == 0:
        return np.empty((0, n_samples), dtype=np.int16)
    # BinaryArray exposes no .offsets accessor — read the raw offsets
    # buffer (int32, honoring the array's slice offset)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                         count=n + 1, offset=arr.offset * 4).astype(np.int64)
    lens = np.diff(offs)
    if lens.min() != lens.max() or int(lens[0]) != 2 * n_samples:
        raise ValueError("ragged or mis-sized PCM payloads — expected "
                         f"{2 * n_samples} bytes per clip")
    buf = np.frombuffer(arr.buffers()[2], dtype=np.int16,
                        count=n * n_samples, offset=int(offs[0]))
    return buf.reshape(n, n_samples)


def decode_mulaw_batch(batch_col: pa.ChunkedArray | pa.Array,
                       n_samples: int) -> np.ndarray:
    """(n_rows, n_samples) int16 matrix from a binary column of µ-law
    clips (1 byte/sample): one zero-copy ``frombuffer`` over the
    contiguous Arrow data buffer + one LUT gather."""
    arr = (batch_col.combine_chunks()
           if isinstance(batch_col, pa.ChunkedArray) else batch_col)
    n = len(arr)
    if n == 0:
        return np.empty((0, n_samples), dtype=np.int16)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                         count=n + 1, offset=arr.offset * 4).astype(np.int64)
    lens = np.diff(offs)
    if lens.min() != lens.max() or int(lens[0]) != n_samples:
        raise ValueError("ragged or mis-sized mulaw payloads — expected "
                         f"{n_samples} bytes per clip")
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8,
                        count=n * n_samples, offset=int(offs[0]))
    return _MULAW_LUT[buf].reshape(n, n_samples)


def decode_clips(batch: pa.Table, pcm_col: str, n_samples: int) -> np.ndarray:
    """Codec-dispatched batch decode (uniform codec per batch, like the
    other per-batch metadata): raw PCM and µ-law decode natively;
    anything else routes through ``decode_compressed`` (stub boundary)."""
    codec = PCM_CODEC
    if "codec" in batch.schema.names and batch.num_rows:
        codec = batch.column("codec")[0].as_py()
    if codec == PCM_CODEC:
        return decode_pcm16(batch.column(pcm_col), n_samples)
    if codec == MULAW_CODEC:
        return decode_mulaw_batch(batch.column(pcm_col), n_samples)
    return np.stack([decode_compressed(v, codec)
                     for v in batch.column(pcm_col).to_pylist()])


class AudioFeatures:
    """Actor-pool stage: per-window audio features over a PCM column.

    Emits one row per (clip, window): integer-exact sum-of-squares and
    zero-crossing count plus the rounded RMS. The window math runs as
    ONE reshape + reduction over the whole batch ((rows × windows × W)
    tensor), not per clip. ``window`` (W) must divide ``n_samples``.
    """

    def __init__(self, window: int, id_col: str = "audio_id",
                 pcm_col: str = "pcm"):
        self.w = int(window)
        self.id_col = id_col
        self.pcm_col = pcm_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({
            self.id_col: pa.array([], type=pa.int64()),
            "window": pa.array([], type=pa.int64()),
            "sumsq": pa.array([], type=pa.int64()),
            "n_cross": pa.array([], type=pa.int64()),
            "rms": pa.array([], type=pa.float64()),
        })
        if batch.num_rows == 0:
            return empty
        ids = batch.column(self.id_col).to_numpy()
        n_samples = int(batch.column("n_samples")[0].as_py())
        if n_samples % self.w:
            raise ValueError("window must divide n_samples")
        s = decode_clips(batch, self.pcm_col, n_samples).astype(np.int64)
        nw = n_samples // self.w
        wins = s.reshape(len(ids), nw, self.w)
        sumsq = (wins * wins).sum(axis=2)  # ≤ 2^30 × W, exact in int64
        # zero crossing: strict sign change between consecutive samples
        # WITHIN a window (no cross-window pairs; the SQL twin partitions
        # its lag() by (audio_id, window) to match)
        cross = ((wins[:, :, :-1] * wins[:, :, 1:]) < 0).sum(axis=2)
        rms = round_half_away(np.sqrt(sumsq / self.w), 9)
        return pa.table({
            self.id_col: np.repeat(ids, nw),
            "window": np.tile(np.arange(nw, dtype=np.int64), len(ids)),
            "sumsq": sumsq.ravel(),
            "n_cross": cross.ravel().astype(np.int64),
            "rms": rms.ravel(),
        })


def audio_features(ds, window: int, concurrency=None, batch_size: int = 64,
                   id_col: str = "audio_id", pcm_col: str = "pcm"):
    """Windowed feature extraction over an audio Dataset. Small
    ``batch_size`` by default — binary payloads are wide, so concurrent
    batches must fit the worker heap (the multimodal sizing rule).
    ``concurrency=None`` (default) runs as elastic tasks with a
    per-worker cached stage (the constructor is a few constants; an
    actor pool's spin-up dominated the kernel); pass an int/tuple to
    pin an actor pool when payload width × free CPUs would exceed the
    node's heap and the pool size is the memory bound."""
    if concurrency is not None:
        return ds.map_batches(
            AudioFeatures,
            fn_constructor_kwargs=dict(window=window, id_col=id_col,
                                       pcm_col=pcm_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=concurrency,
            max_restarts=0,
        )
    return ds.map_batches(
        task_stage(AudioFeatures, (), window=window, id_col=id_col,
                   pcm_col=pcm_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
