"""Geometry codec golden tests — the reference's own vectors verbatim
(/root/reference/test/Test.hs:51-64, 156-198)."""

import numpy as np
import pytest

from raytiles.codec import geometry as g


def np2(pairs):
    return np.array(pairs, dtype=np.int64).reshape(-1, 2)


def test_zigzag_iso():
    # Test.hs:156-158 incl. int32 extremes
    vs = np.array([0, -1, 1, -2, 2, -3, 3, 2147483647, -2147483648], dtype=np.int64)
    assert np.array_equal(g.unzig(g.zig(vs)), vs)


def test_zigzag_golden():
    assert g.zig(np.array([0, -1, 1, -2, 2])).tolist() == [0, 1, 2, 3, 4]
    assert g.unzig(np.array([0, 1, 2, 3, 4])).tolist() == [0, -1, 1, -2, 2]


def test_command_parsing():
    # Test.hs:160-164
    parsed = g.parse_commands(np.array([9, 4, 4, 18, 6, 4, 5, 4, 15], dtype=np.uint32))
    assert [(c, n) for c, n, _ in parsed] == [(g.MOVE_TO, 1), (g.LINE_TO, 2), (g.CLOSE_PATH, 1)]
    assert g._pairs(parsed[0][2]).tolist() == [[2, 2]]
    assert g._pairs(parsed[1][2]).tolist() == [[3, 2], [-3, 2]]


def test_point_iso():
    # Test.hs:170-173
    cs = np.array([25, 4, 4, 6, 6, 3, 3], dtype=np.uint32)
    pts = g.decode_points(cs)
    assert pts.tolist() == [[2, 2], [5, 5], [3, 3]]
    assert g.encode_points(pts).tolist() == cs.tolist()


def test_linestring_iso():
    # Test.hs:175-178 — two linestrings, cursor threads across
    cs = np.array([9, 4, 4, 18, 6, 4, 5, 4, 9, 4, 4, 18, 6, 4, 5, 4], dtype=np.uint32)
    lines = g.decode_linestrings(cs)
    assert len(lines) == 2
    assert g.encode_linestrings(lines).tolist() == cs.tolist()


def test_polygon_iso_two_solid():
    cs = np.array([9, 4, 4, 18, 6, 4, 5, 4, 15, 9, 4, 4, 18, 6, 4, 5, 4, 15], dtype=np.uint32)
    polys = g.decode_polygons(cs)
    assert len(polys) == 2 and all(len(p) == 1 for p in polys)
    assert g.encode_polygons(polys).tolist() == cs.tolist()


def test_polygon_iso_one_holed():
    cs = np.array([9, 4, 4, 26, 6, 0, 0, 6, 5, 0, 15, 9, 2, 3, 26, 0, 2, 2, 0, 0, 1, 15],
                  dtype=np.uint32)
    polys = g.decode_polygons(cs)
    assert len(polys) == 1 and len(polys[0]) == 2  # exterior + 1 hole
    assert g.encode_polygons(polys).tolist() == cs.tolist()


def test_polygon_iso_holed_then_solid():
    cs = np.array([9, 4, 4, 26, 6, 0, 0, 6, 5, 0, 15,
                   9, 2, 3, 26, 0, 2, 2, 0, 0, 1, 15,
                   9, 4, 4, 26, 6, 0, 0, 6, 5, 0, 15], dtype=np.uint32)
    polys = g.decode_polygons(cs)
    assert [len(p) for p in polys] == [2, 1]
    assert g.encode_polygons(polys).tolist() == cs.tolist()


def test_rings_decoded_closed():
    cs = np.array([9, 4, 4, 18, 6, 4, 5, 4, 15], dtype=np.uint32)
    ring = g.decode_polygons(cs)[0][0]
    assert ring[0].tolist() == ring[-1].tolist()  # Test.hs:57


def test_surveyor_unit_square():
    # Test.hs:51-54: y-down unit square, CW in screen coords
    ring = np2([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)])
    assert g.polygon_area([ring]) == 1
    assert g.surveyor(ring) > 0
    assert g.surveyor(ring[::-1]) < 0


def test_surveyor_batch_matches_scalar():
    rng = np.random.default_rng(7)
    rings = []
    for n in (4, 5, 8, 120):
        open_r = rng.integers(-500, 500, size=(n, 2)).astype(np.int64)
        rings.append(np.concatenate([open_r, open_r[:1]], axis=0))
    flat = np.concatenate(rings, axis=0)
    offs = np.cumsum([0] + [r.shape[0] for r in rings]).astype(np.int64)
    batch = g.surveyor_batch(flat, offs)
    scalar = np.array([g.surveyor(r) for r in rings])
    assert np.allclose(batch, scalar)


def test_invalid_commands():
    with pytest.raises(g.GeometryError):
        g.parse_commands(np.array([3], dtype=np.uint32))  # cmd 3 illegal
    with pytest.raises(g.GeometryError):
        g.parse_commands(np.array([23], dtype=np.uint32))  # ClosePath count 2
    with pytest.raises(g.GeometryError):
        g.decode_points(np.array([9, 4, 4, 18, 6, 4], dtype=np.uint32))  # extra cmd
    with pytest.raises(g.GeometryError):
        g.decode_linestrings(np.array([18, 4, 4], dtype=np.uint32))  # LineTo first
