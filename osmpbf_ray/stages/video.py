"""Multimodal video column: opaque raw-frame ``binary`` payload + typed
metadata, processed by vectorized frame-sample / per-frame-feature
stages (the brief's decode / feature-extract / frame-sample trio for
video, mirroring stages/audio.py and stages/image.py).

Payload layout: ``frames`` holds ``n_frames`` grayscale uint8 frames of
``h × w`` pixels, concatenated row-major — the decode is ONE
``frombuffer`` over the binary column's contiguous Arrow data buffer
plus a reshape, no per-row Python. The synthetic clips
(sources/fixtures.make_video) derive every pixel from splitmix64, so
per-frame aggregates (pixel sum, motion energy vs the previous frame)
are integer-exactly recomputable in DuckDB from first principles — the
engine computes them from the DECODED BYTES, making the oracle compare
a real decode check.

Real-world compressed codecs (h264/vp9/av1) need external libraries
this environment doesn't ship; ``decode_compressed`` is the
clearly-marked stub boundary — the Ray-side plumbing (schema, batch
sizing, output layout) is real and tested either way.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from osmpbf_ray.state.workercache import task_stage

# hoisted: these run inside Ray workers (runtime osmpbf_ray imports in
# worker-executed bodies fail when the driver cwd can't import the
# package — pickle-by-value does not cover runtime imports)
from osmpbf_ray.stages.image import _D8, _QBASE, _blockify

RAW_CODEC = "rawvideo_gray8"
ZRAW_CODEC = "zraw_gray8"   # lossless: zlib over the raw frame bytes
LDCV_CODEC = "ldcv1"        # lossy: per-frame 8x8 DCT quantization (intra)

_LDCV_MAGIC = b"LDV1"


def encode_zraw(frames: np.ndarray) -> bytes:
    """Lossless intra clip codec: zlib over the concatenated gray8
    frames (the PNG-style deflate path, minus filtering)."""
    return zlib.compress(np.ascontiguousarray(frames, dtype=np.uint8)
                         .tobytes(), 6)


def encode_ldcv(frames: np.ndarray, h: int, w: int,
                quality: float = 1.0) -> bytes:
    """Lossy INTRA-FRAME clip codec: every frame independently 8x8
    blockwise-DCT quantized (the engine's image codec — stages/image.py
    LDC — applied per gray frame; no inter-frame prediction). Decode
    error is bounded by the quantization ramp: PSNR ≥ 40 dB at
    quality 1.0 (verified in pytest), satisfying the north rule's
    lossy-pixel invariant."""
    t = np.asarray(frames, dtype=np.uint8).reshape(-1, h, w)
    q = _QBASE * quality
    coefs = []
    for f in t:  # per frame: _blockify pads ragged edges per frame
        blocks, hb, wb = _blockify(f.astype(np.float64) - 128.0)
        coefs.append(np.round((_D8 @ blocks @ _D8.T) / q).astype(np.int16))
    payload = zlib.compress(np.stack(coefs).tobytes(), 6)
    return (_LDCV_MAGIC + struct.pack(">HHHf", len(t), h, w, quality)
            + payload)


def decode_ldcv(data: bytes) -> np.ndarray:
    """(n_frames, h*w) uint8 from an ldcv1 payload — one zlib
    decompress + one stacked inverse-DCT matmul pair for ALL frames."""
    if data[:4] != _LDCV_MAGIC:
        raise ValueError("not an LDV1 payload")
    nf, h, w, quality = struct.unpack(">HHHf", data[4:14])
    hb, wb = (h + 7) // 8, (w + 7) // 8
    coefs = np.frombuffer(zlib.decompress(data[14:]), dtype=np.int16)
    coefs = coefs.reshape(nf, hb, wb, 8, 8)
    q = _QBASE * quality
    rec = np.matmul(np.matmul(_D8.T, coefs.astype(np.float64) * q), _D8)
    full = rec.transpose(0, 1, 3, 2, 4).reshape(nf, hb * 8, wb * 8) + 128.0
    out = np.clip(np.round(full[:, :h, :w]), 0, 255).astype(np.uint8)
    return np.ascontiguousarray(out).reshape(nf, h * w)


def decode_compressed(data: bytes, codec: str) -> np.ndarray:
    """Compressed clip bytes → (n_frames, h*w)-shaped uint8 samples.
    ``zraw_gray8`` (lossless deflate) and ``ldcv1`` (the engine's lossy
    intra-frame DCT codec) decode natively; hardware codecs (h264/vp9/
    av1) require external libraries this environment doesn't ship and
    raise — swap the fallthrough for a real decoder in production."""
    if codec == ZRAW_CODEC:
        return np.frombuffer(zlib.decompress(data), dtype=np.uint8)
    if codec == LDCV_CODEC:
        return decode_ldcv(data)
    raise NotImplementedError(
        f"compressed video codec {codec!r} requires an external decoder; "
        f"only {RAW_CODEC}, {ZRAW_CODEC} and {LDCV_CODEC} are decoded natively"
    )


def decode_frames(batch_col: pa.ChunkedArray | pa.Array, n_frames: int,
                  h: int, w: int) -> np.ndarray:
    """(n_rows, n_frames, h*w) uint8 tensor from a binary column of
    uniform raw-gray clips — one zero-copy ``frombuffer`` + reshape."""
    arr = batch_col.combine_chunks() if isinstance(batch_col, pa.ChunkedArray) else batch_col
    n = len(arr)
    if n == 0:
        return np.empty((0, n_frames, h * w), dtype=np.uint8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                         count=n + 1, offset=arr.offset * 4).astype(np.int64)
    lens = np.diff(offs)
    clip_bytes = n_frames * h * w
    if lens.min() != lens.max() or int(lens[0]) != clip_bytes:
        raise ValueError(f"ragged or mis-sized clips — expected {clip_bytes} bytes")
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8,
                        count=n * clip_bytes, offset=int(offs[0]))
    return buf.reshape(n, n_frames, h * w)


def _meta(batch: pa.Table) -> tuple[int, int, int]:
    return (int(batch.column("n_frames")[0].as_py()),
            int(batch.column("h")[0].as_py()),
            int(batch.column("w")[0].as_py()))


def decode_frames_any(batch: pa.Table, frames_col: str, n_frames: int,
                      h: int, w: int) -> np.ndarray:
    """Codec-dispatched batch decode (uniform codec per batch, like the
    other metadata columns): raw frames take the zero-copy frombuffer
    path; zraw/ldcv payloads decompress per clip (inherent to deflate)
    with the frame math still batched."""
    codec = RAW_CODEC
    if "codec" in batch.schema.names and batch.num_rows:
        codec = batch.column("codec")[0].as_py()
    if codec == RAW_CODEC:
        return decode_frames(batch.column(frames_col), n_frames, h, w)
    vals = batch.column(frames_col).to_pylist()
    if not vals:
        return np.empty((0, n_frames, h * w), dtype=np.uint8)
    return np.stack([decode_compressed(v, codec).reshape(n_frames, h * w)
                     for v in vals])


class VideoFrameStats:
    """Actor-pool stage: per-(clip, frame) integer features — pixel sum
    and motion energy (sum |frame - previous frame|; frame 0 → 0).
    One reshape + reduction over the whole batch tensor."""

    def __init__(self, id_col: str = "video_id", frames_col: str = "frames"):
        self.id_col, self.frames_col = id_col, frames_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({
            self.id_col: pa.array([], type=pa.int64()),
            "frame": pa.array([], type=pa.int64()),
            "px_sum": pa.array([], type=pa.int64()),
            "motion": pa.array([], type=pa.int64()),
        })
        if batch.num_rows == 0:
            return empty
        nf, h, w = _meta(batch)
        ids = batch.column(self.id_col).to_numpy()
        t = decode_frames_any(batch, self.frames_col, nf, h, w).astype(np.int64)
        px_sum = t.sum(axis=2)
        motion = np.zeros_like(px_sum)
        motion[:, 1:] = np.abs(t[:, 1:] - t[:, :-1]).sum(axis=2)
        return pa.table({
            self.id_col: np.repeat(ids, nf),
            "frame": np.tile(np.arange(nf, dtype=np.int64), len(ids)),
            "px_sum": px_sum.ravel(),
            "motion": motion.ravel(),
        })


class FrameSampleStage:
    """Actor-pool stage: keep every k-th frame (the frame-sample op) —
    rewrites the binary payload + ``n_frames`` metadata, preserving the
    opaque-column contract so downstream stages compose unchanged."""

    def __init__(self, every_k: int, id_col: str = "video_id",
                 frames_col: str = "frames"):
        if every_k < 1:
            raise ValueError("every_k must be >= 1")
        self.k, self.id_col, self.frames_col = int(every_k), id_col, frames_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        nf, h, w = _meta(batch)
        t = decode_frames_any(batch, self.frames_col, nf, h, w)
        kept = t[:, ::self.k, :]
        n_kept = kept.shape[1]
        flat = np.ascontiguousarray(kept).reshape(len(t), -1)
        clip_bytes = n_kept * h * w
        payload = pa.array(
            [flat[i].tobytes() for i in range(len(t))], type=pa.binary()
        ) if clip_bytes else pa.array([b""] * len(t), type=pa.binary())
        i = batch.schema.get_field_index(self.frames_col)
        out = batch.set_column(i, self.frames_col, payload)
        j = out.schema.get_field_index("n_frames")
        out = out.set_column(
            j, "n_frames", pa.array(np.full(len(t), n_kept, dtype=np.int64))
        )
        # the rewritten payload is RAW regardless of the input codec
        if "codec" in out.schema.names:
            out = out.set_column(
                out.schema.get_field_index("codec"), "codec",
                pa.array([RAW_CODEC] * len(t), type=pa.string()))
        # `fps` stays the SOURCE capture rate; time-based math on the
        # sampled clip (duration, timestamps) must use effective_fps =
        # fps / every_k — without it n_frames/fps is wrong by k×
        if "fps" in out.schema.names:
            eff = pc.divide(pc.cast(out.column("fps"), pa.float64()),
                            float(self.k))
            if "effective_fps" in out.schema.names:
                out = out.set_column(
                    out.schema.get_field_index("effective_fps"),
                    "effective_fps", eff)
            else:
                out = out.append_column("effective_fps", eff)
        return out


def frame_stats(ds, concurrency=None, batch_size: int = 32,
                id_col: str = "video_id"):
    """Per-frame features over a video Dataset — small batches: raw
    frames are the widest payload in the engine (multimodal sizing
    rule: concurrent batches must fit the worker heap).
    ``concurrency=None`` (default) = elastic tasks with a per-worker
    cached stage; pass an int/tuple to pin an actor pool when the pool
    size is the memory bound (frame width × free CPUs > node heap)."""
    if concurrency is not None:
        return ds.map_batches(
            VideoFrameStats,
            fn_constructor_kwargs=dict(id_col=id_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=concurrency,
            max_restarts=0,
        )
    return ds.map_batches(
        task_stage(VideoFrameStats, (), id_col=id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


def frame_sample(ds, every_k: int, concurrency=None, batch_size: int = 32,
                 id_col: str = "video_id"):
    """Every-k frame sampling; same concurrency contract as
    :func:`frame_stats` (tasks by default, pool on request)."""
    if every_k < 1:  # validate eagerly — task workers would raise late
        raise ValueError("every_k must be >= 1")
    if concurrency is not None:
        return ds.map_batches(
            FrameSampleStage,
            fn_constructor_kwargs=dict(every_k=every_k, id_col=id_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=concurrency,
            max_restarts=0,
        )
    return ds.map_batches(
        task_stage(FrameSampleStage, (), every_k=every_k, id_col=id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
