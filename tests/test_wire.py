"""Wire-format primitives: varint scalar/vectorized roundtrips, field
scanning, against hand-built byte strings and seeded random arrays."""

import numpy as np
import pytest

from raytiles.codec import wire


def test_uvarint_scalar_golden():
    assert wire.uvarint_encode(0) == b"\x00"
    assert wire.uvarint_encode(1) == b"\x01"
    assert wire.uvarint_encode(127) == b"\x7f"
    assert wire.uvarint_encode(128) == b"\x80\x01"
    assert wire.uvarint_encode(300) == b"\xac\x02"
    assert wire.uvarint_encode(2 ** 64 - 1) == b"\xff" * 9 + b"\x01"


def test_uvarint_scalar_roundtrip():
    for v in [0, 1, 127, 128, 300, 16383, 16384, 2**32 - 1, 2**63, 2**64 - 1]:
        buf = wire.uvarint_encode(v)
        got, pos = wire.uvarint_decode(buf, 0)
        assert got == v and pos == len(buf)


def test_uvarint_array_roundtrip_random():
    rng = np.random.default_rng(42)
    for _ in range(5):
        vals = rng.integers(0, 2 ** 63, size=1000, dtype=np.uint64)
        vals[::7] = rng.integers(0, 128, size=vals[::7].size, dtype=np.uint64)
        buf = wire.uvarint_encode_array(vals)
        got = wire.uvarint_decode_array(buf)
        assert np.array_equal(got, vals)


def test_uvarint_array_matches_scalar():
    vals = np.array([0, 1, 127, 128, 300, 2**35, 2**64 - 1], dtype=np.uint64)
    expect = b"".join(wire.uvarint_encode(int(v)) for v in vals)
    assert wire.uvarint_encode_array(vals) == expect
    assert np.array_equal(wire.uvarint_decode_array(expect), vals)


def test_uvarint_array_empty():
    assert wire.uvarint_encode_array(np.empty(0, np.uint64)) == b""
    assert wire.uvarint_decode_array(b"").size == 0


def test_uvarint_truncated():
    with pytest.raises(wire.WireError):
        wire.uvarint_decode(b"\x80", 0)
    with pytest.raises(wire.WireError):
        wire.uvarint_decode_array(b"\x01\x80")


def test_scan_fields_onepoint_layer():
    # the real onepoint.mvt top level: field 3 LEN of 24 bytes
    buf = bytes.fromhex("1a180a084f6e65506f696e74120718012203090a0a28802078 01".replace(" ", ""))
    fields = list(wire.scan_fields(buf))
    assert fields[0][0] == 3 and fields[0][1] == wire.LEN
    s, e = fields[0][2]
    inner = list(wire.scan_fields(buf, s, e))
    # name(1), features(2), extent(5), version(15)
    assert [f[0] for f in inner] == [1, 2, 5, 15]
    ns, ne = inner[0][2]
    assert buf[ns:ne] == b"OnePoint"
    assert inner[2][2] == 4096
    assert inner[3][2] == 1


def test_int64_twos_complement():
    assert wire.int64_to_u64(-1) == 2 ** 64 - 1
    assert wire.u64_to_int64(2 ** 64 - 1) == -1
    assert wire.u64_to_int64(wire.int64_to_u64(-(2 ** 63))) == -(2 ** 63)
