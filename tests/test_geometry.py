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


def test_small_path_matches_vectorized_on_random_streams():
    """The pure-Python small-geometry decoders (list input) must agree
    with the numpy decoders (array input) on random VALID command
    streams — same geometry, same error behavior."""
    import numpy as np
    from raytiles.codec.geometry import (decode_linestrings, decode_points,
                                         decode_polygons, encode_linestrings,
                                         encode_points, encode_polygons)
    rng = np.random.default_rng(99)
    for trial in range(40):
        # random geometry -> encode -> decode via both input types
        kind = trial % 3
        if kind == 0:
            pts = rng.integers(-5000, 5000, size=(rng.integers(1, 9), 2))
            cmds = encode_points(pts.astype(np.int64))
            a = decode_points(cmds)
            b = decode_points([int(v) for v in cmds])
            assert np.array_equal(a, b)
        elif kind == 1:
            lines = [np.cumsum(rng.integers(-300, 300, size=(rng.integers(2, 7), 2)), axis=0)
                     for _ in range(rng.integers(1, 4))]
            cmds = encode_linestrings([l.astype(np.int64) for l in lines])
            a = decode_linestrings(cmds)
            b = decode_linestrings([int(v) for v in cmds])
            assert len(a) == len(b)
            for x, y in zip(a, b):
                assert np.array_equal(x, y)
        else:
            ring = np.array([[0, 0], [40, 0], [40, 40], [0, 40], [0, 0]]) \
                + rng.integers(-2000, 2000, size=(1, 2))
            cmds = encode_polygons([[ring.astype(np.int64)]])
            a = decode_polygons(cmds)
            b = decode_polygons([int(v) for v in cmds])
            assert len(a) == len(b)
            for pa_, pb_ in zip(a, b):
                for ra, rb in zip(pa_, pb_):
                    assert np.array_equal(ra, rb)
    # error parity: empty stream + invalid command integer
    import pytest as _pytest
    from raytiles.codec.geometry import GeometryError
    for bad in ([], [3]):  # empty; command id 3 is invalid
        for as_list in (True, False):
            cmds = bad if as_list else np.array(bad, dtype=np.uint32)
            with _pytest.raises(GeometryError):
                decode_points(cmds)


def test_small_path_overlong_varint_truncates_like_vectorized():
    """An over-long varint (value >= 2^32, legal protobuf wire data)
    must truncate to uint32 identically on both decode paths — the
    vectorized path casts to uint32 up front; the list path masks in
    parse_commands_list/_unzig_py (Word32 semantics, Internal.hs:226)."""
    from raytiles.codec.geometry import decode_points, decode_polygons
    # MoveTo count 2: params [2^32 (->0), 2^32+2 (->2->unzig 1), 3, 2^33+4 (->4)]
    raw = [17, 2**32, 2**32 + 2, 3, 2**33 + 4]
    arr = np.array(raw, dtype=np.uint64).astype(np.uint32)
    a = decode_points(arr)
    b = decode_points(raw)
    assert np.array_equal(a, b)
    assert b.tolist() == [[0, 1], [-2, 3]]
    # over-long header too: 2^32+9 truncates to 9 (MoveTo count 1)
    a2 = decode_points(np.array([2**32 + 9, 4, 4], dtype=np.uint64).astype(np.uint32))
    b2 = decode_points([2**32 + 9, 4, 4])
    assert np.array_equal(a2, b2)
    # polygon error path must raise GeometryError (not OverflowError)
    # when the stream contains over-long words
    with pytest.raises(g.GeometryError):
        decode_polygons([2**32 + 9, 4, 4])


def test_batched_encoders_match_per_feature():
    """The whole-layer batch kernels (encode_*_batch) must produce the
    exact word streams of the per-feature encoders, feature by feature,
    across empty/degenerate shapes."""
    rng = np.random.default_rng(42)

    def rand_pts(n):
        return rng.integers(-5000, 5000, size=(n, 2))

    pts_feats = [rand_pts(int(k)) for k in rng.integers(0, 9, size=50)]
    words, sizes = g.encode_points_batch(pts_feats)
    ref = [g.encode_points(f) for f in pts_feats]
    assert np.array_equal(words, np.concatenate(ref))
    assert sizes.tolist() == [r.size for r in ref]

    ls_feats = [[rand_pts(int(rng.integers(2, 8)))
                 for _ in range(int(rng.integers(0, 5)))] for _ in range(50)]
    words, sizes = g.encode_linestrings_batch(ls_feats)
    ref = [g.encode_linestrings(f) for f in ls_feats]
    assert np.array_equal(words, np.concatenate(ref))
    assert sizes.tolist() == [r.size for r in ref]

    def ring(n):
        r = rand_pts(n)
        return np.vstack([r, r[:1]])

    pg_feats = [[[ring(int(rng.integers(3, 8)))
                  for _ in range(int(rng.integers(1, 3)))]
                 for _ in range(int(rng.integers(0, 4)))] for _ in range(50)]
    words, sizes = g.encode_polygons_batch(pg_feats)
    ref = [g.encode_polygons(f) for f in pg_feats]
    assert np.array_equal(words, np.concatenate(ref))
    assert sizes.tolist() == [r.size for r in ref]


def test_encode_layer_batched_path_matches_small_path():
    """encode_tile must emit identical bytes whether a layer's feature
    section goes through the batched whole-layer path or the
    per-feature path (BATCH_MIN_FEATURES forced to extremes)."""
    import glob

    import raytiles.codec.encode as E
    from raytiles.codec.decode import decode_tile
    from raytiles.codec.encode import encode_tile

    for fx in sorted(glob.glob("/root/reference/test/**/*.mvt", recursive=True)):
        t = decode_tile(open(fx, "rb").read())
        orig = E.BATCH_MIN_FEATURES
        try:
            E.BATCH_MIN_FEATURES = 0
            b_batched = encode_tile(t)
            E.BATCH_MIN_FEATURES = 10 ** 9
            b_small = encode_tile(t)
        finally:
            E.BATCH_MIN_FEATURES = orig
        assert b_batched == b_small, fx
        assert encode_tile(decode_tile(b_batched)) == b_batched, fx
