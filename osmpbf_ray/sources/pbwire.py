"""Minimal protobuf wire-format codec (proto2 subset) for OSM PBF.

Implements exactly the encoding the OSM PBF container needs — varint,
zigzag sint, length-delimited fields, packed repeated scalars — from the
public protobuf wire-format specification. No generated code, no protoc:
the message shapes are tiny and fixed (see the reference proto files
/root/reference/src/proto/fileformat.proto and osmformat.proto), so a
hand-rolled codec with numpy-vectorized packed-array paths is both
simpler and faster than reflection-based parsing.

The hot path is packed sint64 arrays (DenseNodes ids/lats/lons, way
refs): ``decode_varints`` decodes an entire packed buffer in a handful
of numpy passes (find terminal bytes, segment, shift-accumulate), the
vectorized analog of the reference's per-value varint loop.
"""

from __future__ import annotations

import numpy as np

_CONT = 0x80
_MASK7 = np.uint64(0x7F)


# --- varint arrays (vectorized) ---------------------------------------------


def decode_varints(buf: bytes) -> np.ndarray:
    """Decode every varint in ``buf`` (a packed field payload) → uint64[].

    Vectorized: terminal bytes are those with the continuation bit clear;
    each value is the 7-bit-group sum of its byte run (little-endian
    groups). Runs longer than 10 bytes are invalid protobuf and raise.
    """
    if not buf:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    term = (b & _CONT) == 0
    if not term[-1]:
        raise ValueError("truncated varint in packed field")
    # value index for each byte: 0-based run id
    run = np.zeros(len(b), dtype=np.int64)
    run[1:] = np.cumsum(term[:-1])
    n = run[-1] + 1
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = np.flatnonzero(term)[:-1] + 1
    pos = np.arange(len(b), dtype=np.int64) - starts[run]
    if pos.max() >= 10:
        raise ValueError("varint longer than 10 bytes")
    vals = np.zeros(n, dtype=np.uint64)
    contrib = (b.astype(np.uint64) & _MASK7) << (np.uint64(7) * pos.astype(np.uint64))
    np.add.at(vals, run, contrib)
    return vals


def encode_varints(values: np.ndarray) -> bytes:
    """Encode uint64[] → concatenated varint bytes (vectorized scatter)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if len(v) == 0:
        return b""
    # bytes needed per value: ceil(bitlen/7), min 1
    nbits = np.zeros(len(v), dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp != 0
        if not nz.any():
            break
        nbits[nz] += 7
        tmp >>= np.uint64(7)
    nbytes = np.maximum(nbits // 7, 1)
    offs = np.concatenate([[0], np.cumsum(nbytes)])
    out = np.zeros(offs[-1], dtype=np.uint8)
    for j in range(10):
        sel = nbytes > j
        if not sel.any():
            break
        byte = ((v[sel] >> np.uint64(7 * j)) & _MASK7).astype(np.uint8)
        cont = (nbytes[sel] - 1 > j).astype(np.uint8) * _CONT
        out[offs[:-1][sel] + j] = byte | cont
    return out.tobytes()


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)) ^ (~(u & np.uint64(1)) + np.uint64(1))).view(np.int64)


def zigzag_encode(s: np.ndarray) -> np.ndarray:
    s = np.ascontiguousarray(s, dtype=np.int64)
    return ((s << np.int64(1)) ^ (s >> np.int64(63))).view(np.uint64)


def decode_varint_at(buf, pos: int) -> tuple[int, int]:
    """Single varint at ``pos`` → (value, next_pos). Scalar path for
    field tags and message framing (few per message)."""
    result = 0
    shift = 0
    while True:
        byte = buf[pos]
        result |= (byte & 0x7F) << shift
        pos += 1
        if not byte & _CONT:
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint longer than 10 bytes")


def encode_varint(value: int) -> bytes:
    out = bytearray()
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            out.append(byte | _CONT)
        else:
            out.append(byte)
            return bytes(out)


# --- message field iteration -------------------------------------------------

WIRE_VARINT = 0
WIRE_I64 = 1
WIRE_LEN = 2
WIRE_I32 = 5


def iter_fields(buf):
    """Yield (field_number, wire_type, value) for each field in ``buf``.

    value is an int for WIRE_VARINT, a memoryview for WIRE_LEN; fixed
    32/64-bit fields (unused by OSM PBF) are skipped structurally.
    """
    view = memoryview(buf)
    pos, end = 0, len(view)
    while pos < end:
        tag, pos = decode_varint_at(view, pos)
        field, wire = tag >> 3, tag & 7
        if wire == WIRE_VARINT:
            val, pos = decode_varint_at(view, pos)
            yield field, wire, val
        elif wire == WIRE_LEN:
            ln, pos = decode_varint_at(view, pos)
            if pos + ln > end:
                raise ValueError("length-delimited field overruns buffer")
            yield field, wire, view[pos : pos + ln]
            pos += ln
        elif wire == WIRE_I64:
            yield field, wire, view[pos : pos + 8]
            pos += 8
        elif wire == WIRE_I32:
            yield field, wire, view[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")


# --- field emit helpers (writer) ---------------------------------------------


def field_len(field: int, payload: bytes) -> bytes:
    return encode_varint((field << 3) | WIRE_LEN) + encode_varint(len(payload)) + payload


def field_varint(field: int, value: int) -> bytes:
    return encode_varint((field << 3) | WIRE_VARINT) + encode_varint(value)


def field_packed_uvarints(field: int, values: np.ndarray) -> bytes:
    return field_len(field, encode_varints(np.asarray(values, dtype=np.uint64)))


def field_packed_svarints(field: int, values: np.ndarray) -> bytes:
    return field_len(field, encode_varints(zigzag_encode(np.asarray(values, dtype=np.int64))))
