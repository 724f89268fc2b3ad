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

Real-world compressed codecs (mp3/ogg/flac) need external libraries this
environment doesn't ship; ``decode_compressed`` is the clearly-marked
stub boundary — the Ray-side plumbing (schema, batching, actor
signature, output layout) is real and tested either way.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osmpbf_ray.stages.ann import round_half_away

PCM_CODEC = "pcm_s16le"


def decode_compressed(data: bytes, codec: str) -> np.ndarray:  # pragma: no cover
    """STUB: compressed-audio decode (mp3/ogg/flac) requires external
    codec libraries not present in this environment. The surrounding
    pipeline (binary column in, int16 sample array out) is the real,
    tested contract; swap this body for a real decoder in production."""
    raise NotImplementedError(
        f"compressed audio codec {codec!r} requires an external decoder; "
        f"only {PCM_CODEC} is decoded natively"
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
        s = decode_pcm16(batch.column(self.pcm_col), n_samples).astype(np.int64)
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


def audio_features(ds, window: int, concurrency=(1, 4), batch_size: int = 64,
                   id_col: str = "audio_id", pcm_col: str = "pcm"):
    """Windowed feature extraction over an audio Dataset. Small
    ``batch_size`` by default — binary payloads are wide, so batch ×
    concurrency must fit a worker heap (the multimodal sizing rule)."""
    return ds.map_batches(
        AudioFeatures,
        fn_constructor_kwargs=dict(window=window, id_col=id_col, pcm_col=pcm_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        max_restarts=0,  # pool replaces dead actors; in-place restart is unreliable with object-store ctor args
    )
