"""Image column stages: codecs, perceptual hash, decoder actor pool.

The engine treats images as an opaque ``bytes:binary`` column with typed
metadata (w, h, fmt) per BASELINE.json:input_hint; decoded pixels exist
only inside a batch UDF, never dataset-wide. The decode step parallels the
reference's per-blob zlib decompression (/root/reference/src/blob.rs:455-469)
— CPU-bound work that justifies per-block parallelism — and enforces the
same bounded-decode discipline (reference caps messages at 32 MiB,
src/blob.rs:18; we cap decoded pixel buffers).

Codecs (no PIL/cv2 in this environment):
* ``png``  — a real PNG subset codec implemented on stdlib zlib+struct
  (8-bit RGB, all five scanline filters on decode, filter 0 on encode).
  Lossless: decode(encode(x)) == x exactly.
* ``jpeg`` — STUB STAND-IN: the container has no JPEG library, so "jpeg"
  bytes are produced by a deterministic blockwise-DCT quantization codec
  ("LDC1") with JPEG-like loss characteristics (lossy, PSNR >= 40 dB at
  the default quality). The Ray-side plumbing (schema, batch sizes, actor
  signature, PSNR invariant) is real and tested; swap ``encode_lossy`` /
  ``decode_lossy`` for a real JPEG codec when one is available.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAX_DECODED_BYTES = 32 * 1024 * 1024  # mirror reference blob bound (blob.rs:18)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 → PNG bytes (color type 2, filter 0)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, c = rgb.shape
    assert c == 3
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), rgb.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters 0-4. raw: (h, 1+stride) uint8."""
    ftypes = raw[:, 0]
    if not ftypes.any():  # all filter 0 (what encode_png emits): pure slice
        return np.ascontiguousarray(raw[:, 1:])
    if (ftypes <= 2).all() and not (ftypes == 1).any():
        # only None/Up rows: Up is a per-column modular running sum, and
        # uint8 cumsum wraps exactly like the byte arithmetic PNG specifies
        return np.cumsum(raw[:, 1:], axis=0, dtype=np.uint8) if (
            ftypes[1:] == 2
        ).all() and ftypes[0] == 0 else _unfilter_slow(raw, h, stride, bpp)
    return _unfilter_slow(raw, h, stride, bpp)


def _unfilter_slow(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """General per-row unfilter, vectorized within each row.

    Sub is a per-channel modular prefix sum (one uint8 cumsum — the
    wraparound IS the byte arithmetic PNG specifies); Up is one add;
    Average/Paeth have a true left-to-right dependency, so they scan
    per PIXEL with bpp-wide vector ops (w iterations, not w·bpp —
    round 1 looped every byte in Python)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    w = stride // bpp
    zero_prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ftype = int(raw[r, 0])
        line = raw[r, 1:]
        prev = out[r - 1] if r > 0 else zero_prev
        if ftype == 0:
            out[r] = line
        elif ftype == 1:  # Sub
            out[r] = np.cumsum(line.reshape(w, bpp), axis=0, dtype=np.uint8).reshape(-1)
        elif ftype == 2:  # Up — uint8 add wraps mod 256
            out[r] = line + prev
        elif ftype in (3, 4):  # Average / Paeth
            lp = line.reshape(w, bpp).astype(np.int16)
            pv = prev.reshape(w, bpp).astype(np.int16)
            cur = np.zeros((w, bpp), dtype=np.int16)
            a = np.zeros(bpp, dtype=np.int16)
            if ftype == 3:
                for x in range(w):
                    a = (lp[x] + ((a + pv[x]) >> 1)) & 0xFF
                    cur[x] = a
            else:
                c = np.zeros(bpp, dtype=np.int16)
                for x in range(w):
                    b = pv[x]
                    p = a + b - c
                    pa_, pb_, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where(
                        (pa_ <= pb_) & (pa_ <= pc_), a, np.where(pb_ <= pc_, b, c)
                    )
                    a = (lp[x] + pred) & 0xFF
                    cur[x] = a
                    c = b
            out[r] = cur.astype(np.uint8).reshape(-1)
        else:
            raise ValueError(f"bad PNG filter {ftype}")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes → (h, w, 3) uint8. Supports 8-bit RGB, no interlace."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    h = bitdepth = ctype = 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if bitdepth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if h * w * 3 > MAX_DECODED_BYTES:
        raise ValueError("decoded image exceeds bound")
    stride = w * 3
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + stride)
    return _unfilter(raw, h, stride, bpp=3).reshape(h, w, 3)


# --- deterministic lossy codec (JPEG stand-in; see module docstring) -------

_LDC_MAGIC = b"LDC1"


def _dct_mat(n: int = 8) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_D8 = _dct_mat(8)
# JPEG-flavored quantization ramp: heavier on high frequencies
_QBASE = 1.0 + 0.45 * (np.arange(8)[:, None] + np.arange(8)[None, :]).astype(np.float64)


def _blockify(ch: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = ch.shape
    ph, pw = (-h) % 8, (-w) % 8
    ch = np.pad(ch, ((0, ph), (0, pw)), mode="edge")
    hb, wb = ch.shape[0] // 8, ch.shape[1] // 8
    return ch.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3), hb, wb


def encode_lossy(rgb: np.ndarray, quality: float = 1.0) -> bytes:
    """Deterministic blockwise-DCT quantization codec (JPEG stand-in)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    planes = []
    q = _QBASE * quality
    for c in range(3):
        blocks, hb, wb = _blockify(rgb[:, :, c].astype(np.float64) - 128.0)
        coef = _D8 @ blocks @ _D8.T
        planes.append(np.round(coef / q).astype(np.int16))
    payload = zlib.compress(np.concatenate([p.ravel() for p in planes]).tobytes(), 6)
    return _LDC_MAGIC + struct.pack(">HHf", h, w, quality) + payload


def decode_lossy(data: bytes) -> np.ndarray:
    if data[:4] != _LDC_MAGIC:
        raise ValueError("not an LDC1 payload")
    h, w, quality = struct.unpack(">HHf", data[4:12])
    if h * w * 3 > MAX_DECODED_BYTES:
        raise ValueError("decoded image exceeds bound")
    hb, wb = (h + 7) // 8, (w + 7) // 8
    coefs = np.frombuffer(zlib.decompress(data[12:]), dtype=np.int16).reshape(3, hb, wb, 8, 8)
    q = _QBASE * quality
    # all three channels in one broadcasted matmul pair
    rec = np.matmul(np.matmul(_D8.T, coefs.astype(np.float64) * q), _D8)
    full = rec.transpose(0, 1, 3, 2, 4).reshape(3, hb * 8, wb * 8) + 128.0
    out = np.clip(np.round(full[:, :h, :w]), 0, 255).astype(np.uint8)
    return np.ascontiguousarray(out.transpose(1, 2, 0))


def parse_lossy_header(data: bytes) -> tuple[int, int, float]:
    if data[:4] != _LDC_MAGIC:
        raise ValueError("not an LDC1 payload")
    h, w, quality = struct.unpack(">HHf", data[4:12])
    if h * w * 3 > MAX_DECODED_BYTES:
        raise ValueError("decoded image exceeds bound")
    return h, w, quality


def decode_lossy_batch(datas: list[bytes]) -> list[np.ndarray]:
    """Batched LDC1 decode: zlib per payload (inherent), but ONE pair of
    stacked 8x8 matmuls per (h, w, quality) group instead of per image —
    small images make per-call numpy overhead the dominant cost of the
    per-image path (~225 µs vs ~90 µs of actual zlib+math)."""
    groups: dict[tuple, list[int]] = {}
    coefs: list[np.ndarray] = []
    for i, data in enumerate(datas):
        h, w, quality = parse_lossy_header(data)
        hb, wb = (h + 7) // 8, (w + 7) // 8
        coefs.append(
            np.frombuffer(zlib.decompress(data[12:]), dtype=np.int16).reshape(3, hb, wb, 8, 8)
        )
        groups.setdefault((h, w, quality), []).append(i)
    out: list[np.ndarray | None] = [None] * len(datas)
    # chunk each shape group: a full 4096-image stack would allocate
    # ~400 MB of float64 intermediates per task — at 16+ concurrent
    # tasks that saturates memory bandwidth and was measured ~3× slower
    # than per-image decode; ≤128 images keeps the working set ~12 MB
    # (cache-resident) while still amortizing the per-call overhead
    chunk = 128
    for (h, w, quality), idxs in groups.items():
        hb, wb = (h + 7) // 8, (w + 7) // 8
        q = _QBASE * quality
        for s in range(0, len(idxs), chunk):
            part = idxs[s : s + chunk]
            stack = np.stack([coefs[i] for i in part])  # (n, 3, hb, wb, 8, 8)
            rec = np.matmul(np.matmul(_D8.T, stack.astype(np.float64) * q), _D8)
            full = rec.transpose(0, 1, 2, 4, 3, 5).reshape(len(part), 3, hb * 8, wb * 8) + 128.0
            px = np.clip(np.round(full[:, :, :h, :w]), 0, 255).astype(np.uint8)
            px = np.ascontiguousarray(px.transpose(0, 2, 3, 1))  # (n, h, w, 3)
            for j, i in enumerate(part):
                out[i] = px[j]
    return out  # type: ignore[return-value]


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return decode_lossy(data)
    raise ValueError(f"unknown image format {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


# --- perceptual hash --------------------------------------------------------

_D32 = _dct_mat(32)


def _to_gray32(rgb: np.ndarray) -> np.ndarray:
    """Grayscale + area-resample to 32x32 (reduceat block means)."""
    gray = rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    # upsample small images so every 32-bin has >= 1 source pixel
    if gray.shape[0] < 32:
        gray = np.repeat(gray, -(-32 // gray.shape[0]), axis=0)
    if gray.shape[1] < 32:
        gray = np.repeat(gray, -(-32 // gray.shape[1]), axis=1)
    h, w = gray.shape
    rbins = (np.arange(32) * h) // 32
    cbins = (np.arange(32) * w) // 32
    rows = np.add.reduceat(gray, rbins, axis=0)
    cells = np.add.reduceat(rows, cbins, axis=1)
    rcnt = np.diff(np.append(rbins, h))[:, None]
    ccnt = np.diff(np.append(cbins, w))[None, :]
    return cells / (rcnt * ccnt)


def phash64(rgb: np.ndarray) -> int:
    """64-bit DCT perceptual hash (signed int64, two's complement)."""
    g = _to_gray32(rgb)
    coef = (_D32 @ g @ _D32.T)[:8, :8].copy()
    flat = coef.ravel()
    med = np.median(flat[1:])  # exclude DC
    bits = (flat > med).astype(np.uint64)
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    return int(val.astype(np.int64))


def _gray32_batch(imgs: np.ndarray) -> np.ndarray:
    """(n, h, w, 3) uint8 → (n, 32, 32) float64, same math as _to_gray32."""
    gray = imgs.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    if gray.shape[1] < 32:
        gray = np.repeat(gray, -(-32 // gray.shape[1]), axis=1)
    if gray.shape[2] < 32:
        gray = np.repeat(gray, -(-32 // gray.shape[2]), axis=2)
    _, h, w = gray.shape
    rbins = (np.arange(32) * h) // 32
    cbins = (np.arange(32) * w) // 32
    rows = np.add.reduceat(gray, rbins, axis=1)
    cells = np.add.reduceat(rows, cbins, axis=2)
    rcnt = np.diff(np.append(rbins, h))[None, :, None]
    ccnt = np.diff(np.append(cbins, w))[None, None, :]
    return cells / (rcnt * ccnt)


def phash64_batch(images: list[np.ndarray]) -> np.ndarray:
    """Vectorized phash64 over a list of (h, w, 3) images.

    Groups by shape and runs the gray/resize/DCT/median pipeline as one
    batched tensor op per group — bit-identical to per-image ``phash64``
    (same float64 operations in the same order per slice).
    """
    out = np.empty(len(images), dtype=np.int64)
    by_shape: dict[tuple, list[int]] = {}
    for i, im in enumerate(images):
        by_shape.setdefault(im.shape, []).append(i)
    weights = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))
    chunk = 256  # bound the float64 working set (cache/bandwidth)
    for idxs in by_shape.values():
        for s in range(0, len(idxs), chunk):
            part = idxs[s : s + chunk]
            g = _gray32_batch(np.stack([images[i] for i in part]))
            coef = np.matmul(np.matmul(_D32, g), _D32.T)[:, :8, :8]
            flat = coef.reshape(len(part), 64)
            med = np.median(flat[:, 1:], axis=1)
            bits = (flat > med[:, None]).astype(np.uint64)
            out[part] = (bits * weights).sum(axis=1).astype(np.int64)
    return out


_POPCOUNT_TABLE = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of XOR between int64 hash arrays."""
    x = (np.asarray(a, dtype=np.int64) ^ np.asarray(b, dtype=np.int64)).astype(np.uint64)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(8):
        cnt += _POPCOUNT_TABLE[(x & np.uint64(0xFF)).astype(np.intp)]
        x = x >> np.uint64(8)
    return cnt


def resize_area_float(rgb: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-average resize of (h, w, 3) uint8 → (out_h, out_w, 3) float64
    (pre-quantization).

    Same reduceat binning as the phash gray path, applied per channel —
    pure numpy, no imaging library. Upsampling repeats source pixels so
    every output bin has ≥ 1 source pixel (nearest-neighbor growth).

    Invariant used by the ``image_resize`` oracle: when the source dims
    are multiples of the output dims (uniform bins, no upsampling) the
    float thumbnail's mean equals the source mean to ~1e-13 relative —
    area averaging conserves total mass."""
    img = rgb.astype(np.float64)
    if img.shape[0] < out_h:
        img = np.repeat(img, -(-out_h // img.shape[0]), axis=0)
    if img.shape[1] < out_w:
        img = np.repeat(img, -(-out_w // img.shape[1]), axis=1)
    h, w = img.shape[:2]
    rbins = (np.arange(out_h) * h) // out_h
    cbins = (np.arange(out_w) * w) // out_w
    rows = np.add.reduceat(img, rbins, axis=0)
    cells = np.add.reduceat(rows, cbins, axis=1)
    rcnt = np.diff(np.append(rbins, h))[:, None, None]
    ccnt = np.diff(np.append(cbins, w))[None, :, None]
    return cells / (rcnt * ccnt)


def resize_area(rgb: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-average resize of (h, w, 3) uint8 → (out_h, out_w, 3) uint8."""
    return np.clip(np.round(resize_area_float(rgb, out_h, out_w)), 0, 255).astype(np.uint8)


class ImageResizeStage:
    """Actor-pool stage: decode → area-resize → re-encode as PNG.

    The multimodal "resize" transform over the opaque bytes column:
    pixels exist only inside the batch UDF; output rows carry the
    re-encoded thumbnail bytes plus the new dimensions. Decode errors
    flow to the error channel like ImageDecoder."""

    def __init__(self, out_h: int = 32, out_w: int = 32):
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, batch):
        import pyarrow as pa

        blobs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        out_bytes: list[bytes | None] = []
        errors = np.zeros(len(blobs), dtype=bool)
        resid = np.zeros(len(blobs), dtype=np.float64)
        for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
            try:
                px = decode_image(blob, fmt)
                thumb_f = resize_area_float(px, self.out_h, self.out_w)
                # mass-conservation residual: 0.0 (to 6 digits) whenever
                # source dims divide the output dims — the oracle's probe
                # for a broken box filter (wrong weights, off-by-one bins)
                resid[i] = round(float(thumb_f.mean()) - float(px.astype(np.float64).mean()), 6)
                out_bytes.append(encode_png(np.clip(np.round(thumb_f), 0, 255).astype(np.uint8)))
            except (ValueError, zlib.error):
                out_bytes.append(None)
                errors[i] = True
        out = batch.drop_columns(["bytes"])
        out = out.append_column("thumb_bytes", pa.array(out_bytes, type=pa.binary()))
        out = out.append_column("thumb_w", pa.array(np.full(len(blobs), self.out_w, dtype=np.int32)))
        out = out.append_column("thumb_h", pa.array(np.full(len(blobs), self.out_h, dtype=np.int32)))
        out = out.append_column("mass_resid", pa.array(resid, type=pa.float64()))
        out = out.append_column("decode_error", pa.array(errors, type=pa.bool_()))
        return out


class ImageDecoder:
    """Actor-pool stage: decode image bytes, emit pixel stats + fresh phash.

    Use as ``ds.map_batches(ImageDecoder, batch_format="pyarrow",
    batch_size=64, concurrency=N, num_cpus=1)`` — setup once per actor in
    ``__init__`` (here: nothing heavy, but this is where a real JPEG
    library context / model would load), work per batch in ``__call__``.
    Batch size stays small because decoded megapixel batches are wide.
    """

    def __init__(self, compute_phash: bool = True):
        self.compute_phash = compute_phash

    def __call__(self, batch):
        import pyarrow as pa

        blobs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        means = np.full(len(blobs), np.nan)
        phashes = np.zeros(len(blobs), dtype=np.int64)
        decode_errors = np.zeros(len(blobs), dtype=bool)
        decoded: list[np.ndarray | None] = [None] * len(blobs)
        # lossy payloads decode in shape-grouped batches (one stacked DCT
        # per group); PNGs decode per image (per-image zlib + unfilter)
        lossy_idx = [i for i, f in enumerate(fmts) if f == "jpeg"]
        for i in lossy_idx:
            try:
                parse_lossy_header(blobs[i])
            except (ValueError, zlib.error, struct.error):
                decode_errors[i] = True
        valid_lossy = [i for i in lossy_idx if not decode_errors[i]]
        try:
            for i, px in zip(valid_lossy, decode_lossy_batch([blobs[i] for i in valid_lossy])):
                decoded[i] = px
        except (ValueError, zlib.error):
            # a malformed payload slipped past the header check — fall
            # back to per-image so only the bad rows become error rows
            for i in valid_lossy:
                try:
                    decoded[i] = decode_lossy(blobs[i])
                except (ValueError, zlib.error):
                    decode_errors[i] = True
        for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
            if fmt == "jpeg":
                continue
            try:
                decoded[i] = decode_image(blob, fmt)
            except (ValueError, zlib.error):
                # error-channel row, not a task failure (reference skips
                # unknown blob types rather than erroring, blob.rs:27-29)
                decode_errors[i] = True
        ok_idx = [i for i, px in enumerate(decoded) if px is not None]
        ok_px = [decoded[i] for i in ok_idx]
        if ok_idx:
            # means batched per shape group, chunked to bound the
            # float64 reduction working set
            by_shape: dict[tuple, list[int]] = {}
            for j, px in enumerate(ok_px):
                by_shape.setdefault(px.shape, []).append(j)
            m = np.empty(len(ok_px))
            for idxs in by_shape.values():
                for s in range(0, len(idxs), 256):
                    part = idxs[s : s + 256]
                    m[part] = np.stack([ok_px[j] for j in part]).mean(axis=(1, 2, 3))
            means[ok_idx] = m
        if self.compute_phash and ok_idx:
            # batched by shape: one tensor DCT per size group instead of
            # a Python-loop hash per image
            phashes[ok_idx] = phash64_batch(ok_px)
        out = batch.drop_columns(["bytes"])
        out = out.append_column("pixel_mean", pa.array(means, type=pa.float64()))
        out = out.append_column("phash_decoded", pa.array(phashes, type=pa.int64()))
        out = out.append_column("decode_error", pa.array(decode_errors, type=pa.bool_()))
        return out
