"""Batched whole-layer decode (codec/fastdecode.py) vs the exact
per-feature path: identical tiles on every fixture, identical error
channel on malformed input, identical output on random valid tiles.

The batched path is size-dispatched (decode.LAYER_BATCH_BYTES); these
tests force it on/off explicitly so both paths are exercised
regardless of fixture size."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from raytiles.codec import decode as D
from raytiles.codec import wire
from raytiles.codec.encode import encode_tile
from raytiles.codec.model import tiles_equal
from tests.conftest import fixture_bytes

SETTINGS = settings(max_examples=25, deadline=None,
                    suppress_health_check=[HealthCheck.too_slow])


def _both_paths(raw: bytes):
    """(batched_result, exact_result) as decode_tile_safe pairs."""
    old = D.LAYER_BATCH_BYTES
    try:
        D.LAYER_BATCH_BYTES = 0
        batched = D.decode_tile_safe(raw)
        D.LAYER_BATCH_BYTES = 1 << 60
        exact = D.decode_tile_safe(raw)
    finally:
        D.LAYER_BATCH_BYTES = old
    return batched, exact


@pytest.mark.parametrize(
    "name", ["onepoint", "linestring", "polygon", "roads", "clearlake"])
def test_batched_matches_exact_on_fixtures(name):
    raw = fixture_bytes(name + ".mvt")
    (tb, eb), (tx, ex) = _both_paths(raw)
    assert eb is None and ex is None
    assert tiles_equal(tb, tx)
    assert encode_tile(tb) == encode_tile(tx)


def _tile_of_layer(layer_payload: bytes) -> bytes:
    outer: list = []
    wire.put_len_field(outer, 3, layer_payload)
    return b"".join(outer)


def _layer(feature_payloads, keys=(b"k",), values=None, name=b"t") -> bytes:
    inner: list = []
    wire.put_len_field(inner, 1, name)
    for f in feature_payloads:
        wire.put_len_field(inner, 2, f)
    for k in keys:
        wire.put_len_field(inner, 3, k)
    for v in values or []:
        wire.put_len_field(inner, 4, v)
    wire.put_varint_field(inner, 5, 4096)
    wire.put_varint_field(inner, 15, 2)
    return b"".join(inner)


def _feat(geom_type: int, geom_words, tags=(), unpacked_geom=False) -> bytes:
    feat: list = []
    wire.put_varint_field(feat, 1, 7)
    if tags:
        wire.put_packed_field(feat, 2, np.asarray(tags, dtype=np.uint32))
    wire.put_varint_field(feat, 3, geom_type)
    if unpacked_geom:
        for w in geom_words:
            wire.put_varint_field(feat, 4, int(w))
    elif len(geom_words):
        wire.put_packed_field(feat, 4, np.asarray(geom_words, dtype=np.uint64))
    return b"".join(feat)


MALFORMED = {
    # cmd integer 3 is illegal
    "bad_command": _feat(1, [(1 << 3) | 3, 2, 2]),
    # point feature with two commands
    "point_two_cmds": _feat(1, [(1 << 3) | 1, 2, 2, (1 << 3) | 1, 2, 2]),
    # ClosePath with count 2
    "closepath_count": _feat(3, [(1 << 3) | 1, 2, 2, (1 << 3) | 2, 2, 2,
                                 (2 << 3) | 7]),
    # linestring with odd command count
    "ls_parity": _feat(2, [(1 << 3) | 1, 2, 2]),
    # linestring MoveTo with zero pairs
    "ls_empty_moveto": _feat(2, [(0 << 3) | 1, (1 << 3) | 2, 2, 2]),
    # polygon sequence missing ClosePath
    "pg_parity": _feat(3, [(1 << 3) | 1, 2, 2, (1 << 3) | 2, 2, 2]),
    # tag key index beyond the dictionary
    "tag_oor": _feat(1, [(1 << 3) | 1, 2, 2], tags=[5, 0]),
    # geometry type UNKNOWN
    "unknown_type": _feat(0, [(1 << 3) | 1, 2, 2]),
    # empty geometry on a point feature
    "no_points": _feat(1, []),
}


@pytest.mark.parametrize("case", sorted(MALFORMED))
def test_batched_error_channel_matches_exact(case):
    vals: list = []
    wire.put_len_field(vals, 1, b"v")  # one string Value
    raw = _tile_of_layer(_layer([MALFORMED[case]], values=[b"".join(vals)]))
    batched, exact = _both_paths(raw)
    assert batched == exact
    assert exact[0] is None and exact[1]  # every case errors on the exact path


def test_batched_handles_multi_span_and_unpacked_geometry():
    # multi-span packed geometry concatenates; unpacked varint geometry
    # falls back to the exact path — both must equal the exact result
    feat: list = []
    wire.put_varint_field(feat, 1, 1)
    wire.put_varint_field(feat, 3, 2)
    wire.put_packed_field(feat, 4, np.asarray([(1 << 3) | 1, 2, 2], dtype=np.uint64))
    wire.put_packed_field(feat, 4, np.asarray([(2 << 3) | 2, 2, 2, 2, 2],
                                              dtype=np.uint64))
    multi = b"".join(feat)
    unpacked = _feat(2, [(1 << 3) | 1, 2, 2, (1 << 3) | 2, 2, 2],
                     unpacked_geom=True)
    vals: list = []
    wire.put_len_field(vals, 1, b"v")
    raw = _tile_of_layer(_layer([multi, unpacked], values=[b"".join(vals)]))
    batched, exact = _both_paths(raw)
    assert exact[1] is None
    assert tiles_equal(batched[0], exact[0])
    assert encode_tile(batched[0]) == encode_tile(exact[0])


def test_batched_clamps_overlong_counts_like_exact():
    # header claims 4 pairs, stream carries 3 values -> clamp + odd drop
    cases = [
        _feat(1, [(4 << 3) | 1, 2, 2, 2]),
        _feat(2, [(1 << 3) | 1, 2, 2, (4 << 3) | 2, 2, 2, 2]),
        _feat(3, [(1 << 3) | 1, 2, 2, (4 << 3) | 2, 2, 2, 2]),
    ]
    vals: list = []
    wire.put_len_field(vals, 1, b"v")
    for f in cases:
        raw = _tile_of_layer(_layer([f], values=[b"".join(vals)]))
        batched, exact = _both_paths(raw)
        assert batched[1] == exact[1]
        if exact[0] is not None:
            assert tiles_equal(batched[0], exact[0])


from tests.test_codec_property import tile_strategy  # noqa: E402


@given(tile_strategy())
@SETTINGS
def test_batched_matches_exact_on_random_tiles(tile):
    raw = encode_tile(tile)
    (tb, eb), (tx, ex) = _both_paths(raw)
    assert eb is None and ex is None
    assert tiles_equal(tb, tx)
    assert encode_tile(tb) == encode_tile(tx)
