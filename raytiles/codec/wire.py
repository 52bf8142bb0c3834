"""Protobuf wire-format primitives, from scratch (no protobuf dependency).

Implements exactly the subset of the protobuf wire format needed by the
Mapbox Vector Tile 2.1 schema, mirroring the reference's hand-written
wire code (reference: lib/Geography/VectorTile/Protobuf/Internal/
Vector_tile/*.hs; the reference likewise hand-rolls its schema,
README.md:134-152).

Hot paths (packed uint32 arrays: Feature.tags / Feature.geometry) are
vectorized with numpy — a packed varint run is decoded in a handful of
array ops rather than a per-byte Python loop.

Wire types used by vector_tile.proto:
  0 = varint, 1 = 64-bit (double), 2 = length-delimited, 5 = 32-bit (float)
"""

from __future__ import annotations

import numpy as np

VARINT = 0
I64 = 1
LEN = 2
I32 = 5

_U64_7F = np.uint64(0x7F)
_SHIFTS = np.arange(10, dtype=np.uint64) * np.uint64(7)


class WireError(ValueError):
    """Malformed wire data."""


# ---------------------------------------------------------------------------
# varint: scalar
# ---------------------------------------------------------------------------

# single-byte varints (the overwhelmingly common case for field
# lengths and small ids) precomputed once
_VARINT1 = [bytes([i]) for i in range(128)]


def uvarint_encode(value: int) -> bytes:
    """Encode one unsigned varint (value must be 0 <= v < 2**64)."""
    if 0 <= value < 128:
        return _VARINT1[value]
    if value < 0:
        raise WireError(f"uvarint_encode: negative value {value}")
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def uvarint_decode(buf, pos: int) -> tuple[int, int]:
    """Decode one unsigned varint at ``pos``; returns (value, new_pos)."""
    result = 0
    shift = 0
    n = len(buf)
    while True:
        if pos >= n:
            raise WireError("uvarint_decode: truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result & 0xFFFFFFFFFFFFFFFF, pos
        shift += 7
        if shift >= 70:
            raise WireError("uvarint_decode: varint too long")


# ---------------------------------------------------------------------------
# varint: vectorized packed runs
# ---------------------------------------------------------------------------

def uvarint_encode_array(values: np.ndarray) -> bytes:
    """Vectorized encode of an array of unsigned varints (uint64 domain).

    ~10 numpy passes (one per possible byte position), no Python loop
    over values.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    if v.size < 24:
        # small-run fast path: per-call numpy overhead dominates for
        # the tiny arrays the per-feature generic encoder emits
        out = bytearray()
        for value in v.tolist():
            while True:
                b = value & 0x7F
                value >>= 7
                if value:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    break
        return bytes(out)
    nbytes = np.ones(v.shape, dtype=np.int64)
    for k in range(1, 10):
        nbytes += v >= np.uint64(1) << np.uint64(7 * k)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for i in range(10):
        mask = nbytes > i
        if not mask.any():
            break
        chunk = (v[mask] >> np.uint64(7 * i)) & _U64_7F
        cont = (nbytes[mask] - 1 > i).astype(np.uint8) << 7
        out[starts[mask] + i] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def uvarint_decode_list(buf) -> list:
    """Decode a packed varint run to a plain Python list — the
    small-geometry fast path (list arithmetic beats numpy below ~100
    values; see geometry.parse_commands_list)."""
    out = []
    result = 0
    shift = 0
    if type(buf) is not bytes:  # bytes slices arrive copy-free
        buf = bytes(buf)
    for byte in buf:
        result |= (byte & 0x7F) << shift
        if byte & 0x80:
            shift += 7
            if shift >= 70:
                raise WireError("uvarint_decode_list: varint too long")
        else:
            out.append(result & 0xFFFFFFFFFFFFFFFF)
            result = 0
            shift = 0
    if shift:
        raise WireError("uvarint_decode_list: truncated varint run")
    return out


def uvarint_decode_array(buf) -> np.ndarray:
    """Vectorized decode of a packed run of unsigned varints.

    ``buf`` is the exact byte range of the packed field (bytes /
    memoryview / ndarray of uint8). Returns uint64 array.
    """
    if not isinstance(buf, np.ndarray) and len(buf) < 96:
        # small-run fast path: numpy call overhead dominates below
        # ~100 bytes; a plain Python loop wins there
        out = []
        result = 0
        shift = 0
        for byte in bytes(buf):
            result |= (byte & 0x7F) << shift
            if byte & 0x80:
                shift += 7
                if shift >= 70:
                    raise WireError("uvarint_decode_array: varint too long")
            else:
                out.append(result & 0xFFFFFFFFFFFFFFFF)
                result = 0
                shift = 0
        if shift:
            raise WireError("uvarint_decode_array: truncated varint run")
        return np.array(out, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    if not is_last[-1]:
        raise WireError("uvarint_decode_array: truncated varint run")
    # start of each varint = position after each terminator (plus position 0)
    term = np.flatnonzero(is_last)
    starts = np.empty(term.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = term[:-1] + 1
    # byte offset of each byte within its varint
    gid = np.zeros(b.size, dtype=np.int64)
    gid[1:] = np.cumsum(is_last[:-1])
    offsets = np.arange(b.size, dtype=np.int64) - starts[gid]
    if offsets.max() >= 10:
        raise WireError("uvarint_decode_array: varint too long")
    vals = (b.astype(np.uint64) & _U64_7F) << (offsets.astype(np.uint64) * np.uint64(7))
    return np.bitwise_or.reduceat(vals, starts)


# ---------------------------------------------------------------------------
# two's-complement int64 <-> uint64 (for proto "int64" fields)
# ---------------------------------------------------------------------------

def int64_to_u64(v: int) -> int:
    return v & 0xFFFFFFFFFFFFFFFF


def u64_to_int64(v: int) -> int:
    return v - 0x10000000000000000 if v >= 0x8000000000000000 else v


# ---------------------------------------------------------------------------
# field scanning (decode side)
# ---------------------------------------------------------------------------

def scan_fields(buf, start: int = 0, end: int | None = None):
    """Yield (field_no, wire_type, value) over a message's byte range.

    value is: int for VARINT; (start, end) byte range into ``buf`` for
    LEN; raw 4/8 little-endian byte slice offsets for I32/I64 as
    (start, end). Unknown fields are yielded too (caller discards),
    matching the reference's discardUnknown behavior (Tile.hs:50-51).
    """
    pos = start
    n = len(buf) if end is None else end
    while pos < n:
        key, pos = uvarint_decode(buf, pos)
        field_no = key >> 3
        wtype = key & 7
        if wtype == VARINT:
            val, pos = uvarint_decode(buf, pos)
            yield field_no, wtype, val
        elif wtype == LEN:
            ln, pos = uvarint_decode(buf, pos)
            if pos + ln > n:
                raise WireError("scan_fields: truncated LEN field")
            yield field_no, wtype, (pos, pos + ln)
            pos += ln
        elif wtype == I32:
            if pos + 4 > n:
                raise WireError("scan_fields: truncated I32 field")
            yield field_no, wtype, (pos, pos + 4)
            pos += 4
        elif wtype == I64:
            if pos + 8 > n:
                raise WireError("scan_fields: truncated I64 field")
            yield field_no, wtype, (pos, pos + 8)
            pos += 8
        else:
            raise WireError(f"scan_fields: unsupported wire type {wtype}")


# ---------------------------------------------------------------------------
# message building (encode side)
# ---------------------------------------------------------------------------

_TAG_CACHE: dict = {}


def tag(field_no: int, wtype: int) -> bytes:
    """Field tag bytes, memoized — the same handful of tags is emitted
    once per feature/value on the encode hot path."""
    key = (field_no << 3) | wtype
    b = _TAG_CACHE.get(key)
    if b is None:
        b = uvarint_encode(key)
        _TAG_CACHE[key] = b
    return b


def put_varint_field(out: list, field_no: int, value: int) -> None:
    out.append(tag(field_no, VARINT))
    out.append(uvarint_encode(value))


def put_len_field(out: list, field_no: int, payload: bytes) -> None:
    out.append(tag(field_no, LEN))
    out.append(uvarint_encode(len(payload)))
    out.append(payload)


def put_packed_field(out: list, field_no: int, values: np.ndarray) -> None:
    """Packed repeated varint field; omitted entirely when empty
    (matching protobuf packed semantics — an empty packed field writes
    no tag; cf. reference wirePutPacked, Feature.hs:40)."""
    if len(values) == 0:
        return
    payload = uvarint_encode_array(values)
    put_len_field(out, field_no, payload)


def put_float_field(out: list, field_no: int, value: float) -> None:
    out.append(tag(field_no, I32))
    out.append(np.float32(value).tobytes())


def put_double_field(out: list, field_no: int, value: float) -> None:
    out.append(tag(field_no, I64))
    out.append(np.float64(value).tobytes())
