"""MVT geometry-command codec, vectorized with numpy.

Reimplements (from scratch, against the published MVT 2.1 spec and the
reference's observable semantics) the geometry layer of the reference:

- zigzag encode/decode with the reference's exact 32-bit truncation on
  decode (reference: lib/Geography/VectorTile/Internal.hs:221-229)
- command integers (cmd = n & 7, count = n >> 3; MoveTo=1, LineTo=2,
  ClosePath=7) (Internal.hs:233-246)
- delta <-> absolute coordinates as prefix scans (Internal.hs:349-364)
- per-geometry-type command-stream state machines (Internal.hs:153-213):
  * Point:       exactly one MoveTo
  * LineString:  (MoveTo(1+) LineTo(1+))+ — extra MoveTo points beyond
                 the first are silently dropped (Internal.hs:170)
  * Polygon:     (MoveTo(1+) LineTo(2+) ClosePath)+ — decoded rings are
                 stored closed (head appended, Internal.hs:198); hole
                 attachment: after an exterior, following rings with
                 area <= 0 are its holes (Internal.hs:202-206)
- shoelace ("surveyor") area, positive = exterior under y-down
  (lib/Geography/VectorTile/Geometry.hs:76-81)

Geometry containers (engine-side):
- points geometry:      int64 ndarray of shape (n, 2)
- linestring geometry:  list of int64 ndarrays (each (n, 2), n >= 2)
- polygon geometry:     list of rings-lists: each polygon is a list of
  closed rings [(exterior, hole, hole, ...)], every ring an (n, 2)
  int64 ndarray with ring[0] == ring[-1]
"""

from __future__ import annotations

import numpy as np

MOVE_TO = 1
LINE_TO = 2
CLOSE_PATH = 7

GEOM_UNKNOWN = 0
GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3


class GeometryError(ValueError):
    """Invalid command stream (the reference's `Left` channel)."""


# ---------------------------------------------------------------------------
# zigzag
# ---------------------------------------------------------------------------

def zig(values: np.ndarray) -> np.ndarray:
    """Z-encode int64 -> uint32 (reference zig, Internal.hs:221-223:
    64-bit zigzag truncated to Word32)."""
    v = np.asarray(values, dtype=np.int64)
    z = (v << np.int64(1)) ^ (v >> np.int64(63))
    return z.astype(np.uint64).astype(np.uint32)


def unzig(values: np.ndarray) -> np.ndarray:
    """Decode zigzag uint32 -> int64 through an int32 truncation,
    replicating the reference's `fromIntegral (... :: Int32)`
    (Internal.hs:226-229)."""
    n = np.asarray(values, dtype=np.uint32)
    un = (n >> np.uint32(1)) ^ (-(n & np.uint32(1)).astype(np.int64)).astype(np.uint64).astype(np.uint32)
    return un.astype(np.int32).astype(np.int64)


# ---------------------------------------------------------------------------
# command integers
# ---------------------------------------------------------------------------

def parse_commands(cmds: np.ndarray) -> list[tuple[int, int, np.ndarray]]:
    """Split a feature's flat uint32 command array into
    [(cmd_id, count, UNZIGGED int64 params)] (reference `commands`,
    Internal.hs:251-264). The whole array is unzigged in ONE
    vectorized pass up front (headers get meaningless values, never
    read); an odd trailing parameter is dropped at pairing time, as in
    the reference's pairsWith (Util.hs:29-31)."""
    cmds = np.asarray(cmds, dtype=np.uint32)
    unz = unzig(cmds)  # one numpy pass per feature
    out = []
    pos = 0
    n = cmds.size
    while pos < n:
        header = int(cmds[pos])
        cmd = header & 7
        count = header >> 3
        pos += 1
        if cmd == MOVE_TO or cmd == LINE_TO:
            params = unz[pos:pos + 2 * count]
            pos += 2 * count
            out.append((cmd, count, params))
        elif cmd == CLOSE_PATH:
            if count != 1:
                raise GeometryError(f"ClosePath was given a parameter count: {count}")
            out.append((CLOSE_PATH, 1, unz[0:0]))
        else:
            raise GeometryError(f"Invalid command integer {cmd} found in: {header:X}")
    return out


def _pairs(params: np.ndarray) -> np.ndarray:
    """Pair pre-unzigged params into (n, 2) int64 deltas; odd trailing
    value dropped (Util.hs:29-31)."""
    d = params
    if d.size % 2:
        d = d[:-1]
    return d.reshape(-1, 2)


def command_header(cmd: int, count: int) -> int:
    return (cmd & 7) | (count << 3)


def _unzig_py(u: int) -> int:
    """Scalar unzig with the reference's int32 truncation — the
    small-geometry fast path twin of ``unzig``. The input is masked to
    32 bits FIRST: the vectorized path casts the command stream to
    uint32 up front, so an over-long varint (e.g. 2^32 encoding 0,
    valid wire data) must truncate identically here (Word32 semantics,
    Internal.hs:226-229)."""
    u &= 0xFFFFFFFF
    v = ((u >> 1) ^ (-(u & 1) & 0xFFFFFFFF)) & 0xFFFFFFFF
    return v - 0x100000000 if v >= 0x80000000 else v


def parse_commands_list(cmds: list) -> list[tuple[int, int, list]]:
    """``parse_commands`` twin over plain Python ints — identical
    validation and error messages, list params. For the small
    geometries that dominate real tiles (a handful of command words),
    list arithmetic beats numpy's fixed per-call costs by ~5x."""
    out = []
    pos = 0
    n = len(cmds)
    while pos < n:
        # uint32 truncation as in the vectorized path's asarray(uint32)
        header = cmds[pos] & 0xFFFFFFFF
        cmd = header & 7
        count = header >> 3
        pos += 1
        if cmd == MOVE_TO or cmd == LINE_TO:
            out.append((cmd, count,
                        [_unzig_py(u) for u in cmds[pos:pos + 2 * count]]))
            pos += 2 * count
        elif cmd == CLOSE_PATH:
            if count != 1:
                raise GeometryError(f"ClosePath was given a parameter count: {count}")
            out.append((CLOSE_PATH, 1, []))
        else:
            raise GeometryError(f"Invalid command integer {cmd} found in: {header:X}")
    return out


def _shoelace_py(ring: list) -> float:
    """Scalar shoelace over a CLOSED ring of (x, y) tuples — same
    wraparound formula as ``surveyor``."""
    m = len(ring) - 1  # drop closing point
    s = 0
    for i in range(m):
        s += ring[i][0] * (ring[(i + 1) % m][1] - ring[(i - 1) % m][1])
    return s / 2.0


# ---------------------------------------------------------------------------
# decode: commands -> absolute geometry
# ---------------------------------------------------------------------------

def decode_points(cmds: np.ndarray) -> np.ndarray:
    """Exactly one MoveTo (Internal.hs:153-156). A lone MoveTo with
    zero pairs is legal and yields an empty point vector; the
    "No points given!" error is reserved for an EMPTY command list
    (Internal.hs:154-156 pattern order)."""
    if type(cmds) is list:  # small-geometry fast path (pure Python)
        # the dominant shape — ONE well-formed MoveTo whose params
        # exactly fill the stream — decodes inline (no command tuples,
        # no parse call); every other shape (empty, short/odd params,
        # extra trailing words, non-MoveTo) falls through to the
        # general path so error order and messages stay reference-
        # exact (parse_commands_list owns them)
        if cmds:
            header = cmds[0] & 0xFFFFFFFF
            count = header >> 3
            if header & 7 == MOVE_TO and count and len(cmds) == 1 + 2 * count:
                out = np.empty((count, 2), dtype=np.int64)
                x = y = 0
                j = 1
                for i in range(count):
                    u = cmds[j] & 0xFFFFFFFF
                    v = ((u >> 1) ^ (-(u & 1) & 0xFFFFFFFF)) & 0xFFFFFFFF
                    x += v - 0x100000000 if v >= 0x80000000 else v
                    u = cmds[j + 1] & 0xFFFFFFFF
                    v = ((u >> 1) ^ (-(u & 1) & 0xFFFFFFFF)) & 0xFFFFFFFF
                    y += v - 0x100000000 if v >= 0x80000000 else v
                    out[i, 0] = x
                    out[i, 1] = y
                    j += 2
                return out
        parsed = parse_commands_list(cmds)
        if not parsed:
            raise GeometryError("No points given!")
        if len(parsed) != 1 or parsed[0][0] != MOVE_TO:
            raise GeometryError("Invalid command found in Point feature")
        p = parsed[0][2]
        if len(p) % 2:
            p = p[:-1]
        if not p:
            return np.empty((0, 2), dtype=np.int64)
        x = y = 0
        m = len(p) // 2
        out = np.empty((m, 2), dtype=np.int64)
        for i in range(m):
            x += p[2 * i]
            y += p[2 * i + 1]
            out[i, 0] = x
            out[i, 1] = y
        return out
    parsed = parse_commands(cmds)
    if not parsed:
        raise GeometryError("No points given!")
    if len(parsed) != 1 or parsed[0][0] != MOVE_TO:
        raise GeometryError("Invalid command found in Point feature")
    deltas = _pairs(parsed[0][2])
    if deltas.shape[0] == 0:
        return np.empty((0, 2), dtype=np.int64)
    return np.cumsum(deltas, axis=0)


def decode_linestrings(cmds: np.ndarray) -> list[np.ndarray]:
    """Pairs of MoveTo(take head only) + LineTo(n>=1); cursor threads
    across linestrings within the feature (Internal.hs:165-174)."""
    if type(cmds) is list:  # small-geometry fast path (pure Python)
        # dominant shape: ONE [MoveTo(c0) LineTo(c1)] pair whose
        # params exactly fill the stream — decode inline (no command
        # tuples, no per-point tuple list); anomalies fall through so
        # error order/messages stay with the general path
        if cmds:
            h0 = cmds[0] & 0xFFFFFFFF
            c0 = h0 >> 3
            i1 = 1 + 2 * c0
            if h0 & 7 == MOVE_TO and c0 and i1 < len(cmds):
                h1 = cmds[i1] & 0xFFFFFFFF
                c1 = h1 >> 3
                if h1 & 7 == LINE_TO and c1 and len(cmds) == i1 + 1 + 2 * c1:
                    u = cmds[1] & 0xFFFFFFFF
                    v = ((u >> 1) ^ (-(u & 1) & 0xFFFFFFFF)) & 0xFFFFFFFF
                    x = v - 0x100000000 if v >= 0x80000000 else v
                    u = cmds[2] & 0xFFFFFFFF
                    v = ((u >> 1) ^ (-(u & 1) & 0xFFFFFFFF)) & 0xFFFFFFFF
                    y = v - 0x100000000 if v >= 0x80000000 else v
                    seg = np.empty((1 + c1, 2), dtype=np.int64)
                    seg[0, 0] = x
                    seg[0, 1] = y
                    j = i1 + 1
                    for i in range(1, 1 + c1):
                        u = cmds[j] & 0xFFFFFFFF
                        v = ((u >> 1) ^ (-(u & 1) & 0xFFFFFFFF)) & 0xFFFFFFFF
                        x += v - 0x100000000 if v >= 0x80000000 else v
                        u = cmds[j + 1] & 0xFFFFFFFF
                        v = ((u >> 1) ^ (-(u & 1) & 0xFFFFFFFF)) & 0xFFFFFFFF
                        y += v - 0x100000000 if v >= 0x80000000 else v
                        seg[i, 0] = x
                        seg[i, 1] = y
                        j += 2
                    return [seg]
        parsed = parse_commands_list(cmds)
        if len(parsed) % 2:
            raise GeometryError("LineString decode: Invalid command sequence given.")
        out = []
        x = y = 0
        for i in range(0, len(parsed), 2):
            mcmd, _, mp = parsed[i]
            lcmd, _, lp = parsed[i + 1]
            if mcmd != MOVE_TO or lcmd != LINE_TO:
                raise GeometryError("LineString decode: Invalid command sequence given.")
            if len(mp) % 2:
                mp = mp[:-1]
            if len(lp) % 2:
                lp = lp[:-1]
            if not mp:
                raise GeometryError("LineString decode: empty MoveTo")
            # only the FIRST MoveTo point is used (Internal.hs:170);
            # dropped pairs do not advance the cursor
            x += mp[0]
            y += mp[1]
            seg = [(x, y)]
            for j in range(0, len(lp), 2):
                x += lp[j]
                y += lp[j + 1]
                seg.append((x, y))
            out.append(np.array(seg, dtype=np.int64))
        return out
    parsed = parse_commands(cmds)
    if len(parsed) % 2:
        raise GeometryError("LineString decode: Invalid command sequence given.")
    segments = []  # per-segment delta arrays
    for i in range(0, len(parsed), 2):
        mcmd, _, mparams = parsed[i]
        lcmd, _, lparams = parsed[i + 1]
        if mcmd != MOVE_TO or lcmd != LINE_TO:
            raise GeometryError("LineString decode: Invalid command sequence given.")
        mp = _pairs(mparams)
        lp = _pairs(lparams)
        if mp.shape[0] == 0:
            raise GeometryError("LineString decode: empty MoveTo")
        # only the FIRST MoveTo point is used (Internal.hs:170)
        segments.append(np.concatenate([mp[:1], lp], axis=0))
    if not segments:
        return []
    lengths = [s.shape[0] for s in segments]
    absolute = np.cumsum(np.concatenate(segments, axis=0), axis=0)
    out = []
    start = 0
    for ln in lengths:
        out.append(absolute[start:start + ln])
        start += ln
    return out


def decode_polygons(cmds: np.ndarray) -> list[list[np.ndarray]]:
    """Rings = MoveTo(head) + LineTo(>=1) + ClosePath; decoded rings are
    closed by appending the first point (Internal.hs:198). Hole
    grouping: first ring of a run is the exterior; subsequent rings
    with area <= 0 attach to it as holes until a ring with area > 0
    starts the next polygon (Internal.hs:202-206).

    Returns a list of polygons; each polygon is [exterior, hole, ...],
    all rings closed.
    """
    if type(cmds) is list:  # small-geometry fast path (pure Python)
        # dominant shape: ONE [MoveTo(c0) LineTo(c1) ClosePath] ring
        # with exact param fill — a single ring is always its own
        # polygon group (the hole rule only inspects rings AFTER the
        # first), so no shoelace needed; anomalies fall through
        if cmds:
            h0 = cmds[0] & 0xFFFFFFFF
            c0 = h0 >> 3
            i1 = 1 + 2 * c0
            if h0 & 7 == MOVE_TO and c0 and i1 < len(cmds):
                h1 = cmds[i1] & 0xFFFFFFFF
                c1 = h1 >> 3
                i2 = i1 + 1 + 2 * c1
                if (h1 & 7 == LINE_TO and c1 and i2 == len(cmds) - 1
                        and cmds[i2] & 0xFFFFFFFF == 15):
                    u = cmds[1] & 0xFFFFFFFF
                    v = ((u >> 1) ^ (-(u & 1) & 0xFFFFFFFF)) & 0xFFFFFFFF
                    x = v - 0x100000000 if v >= 0x80000000 else v
                    u = cmds[2] & 0xFFFFFFFF
                    v = ((u >> 1) ^ (-(u & 1) & 0xFFFFFFFF)) & 0xFFFFFFFF
                    y = v - 0x100000000 if v >= 0x80000000 else v
                    ring = np.empty((c1 + 2, 2), dtype=np.int64)
                    ring[0, 0] = x
                    ring[0, 1] = y
                    j = i1 + 1
                    for i in range(1, 1 + c1):
                        u = cmds[j] & 0xFFFFFFFF
                        v = ((u >> 1) ^ (-(u & 1) & 0xFFFFFFFF)) & 0xFFFFFFFF
                        x += v - 0x100000000 if v >= 0x80000000 else v
                        u = cmds[j + 1] & 0xFFFFFFFF
                        v = ((u >> 1) ^ (-(u & 1) & 0xFFFFFFFF)) & 0xFFFFFFFF
                        y += v - 0x100000000 if v >= 0x80000000 else v
                        ring[i, 0] = x
                        ring[i, 1] = y
                        j += 2
                    ring[c1 + 1] = ring[0]  # stored closed
                    return [[ring]]
        parsed = parse_commands_list(cmds)
        if len(parsed) % 3:
            raise GeometryError(
                "Polygon decode: Invalid command sequence given: "
                f"{np.asarray([c & 0xFFFFFFFF for c in cmds], dtype=np.uint32)!r}")
        rings = []
        x = y = 0
        for i in range(0, len(parsed), 3):
            mcmd, _, mp = parsed[i]
            lcmd, _, lp = parsed[i + 1]
            ccmd = parsed[i + 2][0]
            if mcmd != MOVE_TO or lcmd != LINE_TO or ccmd != CLOSE_PATH:
                raise GeometryError(
                    "Polygon decode: Invalid command sequence given: "
                    f"{np.asarray([c & 0xFFFFFFFF for c in cmds], dtype=np.uint32)!r}")
            if len(mp) % 2:
                mp = mp[:-1]
            if len(lp) % 2:
                lp = lp[:-1]
            if not mp:
                raise GeometryError("Polygon decode: empty MoveTo")
            x += mp[0]
            y += mp[1]
            ring = [(x, y)]
            for j in range(0, len(lp), 2):
                x += lp[j]
                y += lp[j + 1]
                ring.append((x, y))
            ring.append(ring[0])  # stored closed (Internal.hs:198)
            rings.append(ring)
        if not rings:
            return []
        areas = [_shoelace_py(r) for r in rings]
        polys: list[list[np.ndarray]] = []
        i = 0
        n = len(rings)
        while i < n:
            group = [np.array(rings[i], dtype=np.int64)]
            i += 1
            while i < n and areas[i] <= 0:
                group.append(np.array(rings[i], dtype=np.int64))
                i += 1
            polys.append(group)
        return polys
    parsed = parse_commands(cmds)
    if len(parsed) % 3:
        raise GeometryError(f"Polygon decode: Invalid command sequence given: {cmds!r}")
    ring_deltas = []
    for i in range(0, len(parsed), 3):
        mcmd, _, mparams = parsed[i]
        lcmd, _, lparams = parsed[i + 1]
        ccmd = parsed[i + 2][0]
        if mcmd != MOVE_TO or lcmd != LINE_TO or ccmd != CLOSE_PATH:
            raise GeometryError(f"Polygon decode: Invalid command sequence given: {cmds!r}")
        mp = _pairs(mparams)
        lp = _pairs(lparams)
        if mp.shape[0] == 0:
            raise GeometryError("Polygon decode: empty MoveTo")
        ring_deltas.append(np.concatenate([mp[:1], lp], axis=0))
    if not ring_deltas:
        return []
    lengths = [r.shape[0] for r in ring_deltas]
    absolute = np.cumsum(np.concatenate(ring_deltas, axis=0), axis=0)
    rings = []
    start = 0
    for ln in lengths:
        open_ring = absolute[start:start + ln]
        rings.append(np.concatenate([open_ring, open_ring[:1]], axis=0))
        start += ln
    # hole attachment by run-grouping on the shoelace sign
    areas = [surveyor(r) for r in rings]
    polys: list[list[np.ndarray]] = []
    i = 0
    n = len(rings)
    while i < n:
        group = [rings[i]]
        i += 1
        while i < n and areas[i] <= 0:
            group.append(rings[i])
            i += 1
        polys.append(group)
    return polys


# ---------------------------------------------------------------------------
# encode: absolute geometry -> commands
# ---------------------------------------------------------------------------

def encode_points(points: np.ndarray) -> np.ndarray:
    """Single MoveTo of running diffs (Internal.hs:159)."""
    pts = np.asarray(points, dtype=np.int64).reshape(-1, 2)
    deltas = np.diff(pts, axis=0, prepend=np.zeros((1, 2), dtype=np.int64))
    n = pts.shape[0]
    out = np.empty(1 + 2 * n, dtype=np.uint32)
    out[0] = command_header(MOVE_TO, n)
    out[1:] = zig(deltas.ravel())
    return out


def encode_linestrings(lines: list[np.ndarray]) -> np.ndarray:
    """Per linestring: MoveTo[first-diff], LineTo[rest]; cursor carries
    over (Internal.hs:176-179). The cursor carry means the delta of
    each segment's first point equals the global first difference, so
    the whole feature is diffed + zigzagged in ONE vectorized pass and
    only headers are interleaved per segment."""
    if not lines:
        return np.empty(0, dtype=np.uint32)
    if len(lines) >= 8:
        # many segments: the batched twin interleaves every header in
        # one vectorized scatter instead of a per-segment loop
        return encode_linestrings_batch([lines])[0]
    counts = [np.asarray(l).shape[0] for l in lines]
    allpts = np.concatenate([np.asarray(l, dtype=np.int64).reshape(-1, 2) for l in lines])
    deltas = np.diff(allpts, axis=0, prepend=np.zeros((1, 2), dtype=np.int64))
    z = zig(deltas.ravel())
    total = sum(2 + 2 * n for n in counts)
    out = np.empty(total, dtype=np.uint32)
    pos = 0
    zpos = 0
    for n in counts:
        out[pos] = command_header(MOVE_TO, 1)
        out[pos + 1:pos + 3] = z[zpos:zpos + 2]
        out[pos + 3] = command_header(LINE_TO, n - 1)
        out[pos + 4:pos + 2 + 2 * n] = z[zpos + 2:zpos + 2 * n]
        pos += 2 + 2 * n
        zpos += 2 * n
    return out


def encode_polygons(polys: list[list[np.ndarray]]) -> np.ndarray:
    """Per ring (exterior then its holes, Internal.hs:208-213): drop the
    closing point, MoveTo head, LineTo rest, ClosePath; cursor carries
    across rings and polygons — so one global diff + zig pass over the
    stripped rings, headers interleaved per ring."""
    if sum(len(rings) for rings in polys) >= 8:
        # many rings: one vectorized header scatter beats the loop
        return encode_polygons_batch([polys])[0]
    stripped = [np.asarray(r, dtype=np.int64).reshape(-1, 2)[:-1]
                for rings in polys for r in rings]
    if not stripped:
        return np.empty(0, dtype=np.uint32)
    counts = [r.shape[0] for r in stripped]
    allpts = np.concatenate(stripped)
    deltas = np.diff(allpts, axis=0, prepend=np.zeros((1, 2), dtype=np.int64))
    z = zig(deltas.ravel())
    total = sum(3 + 2 * n for n in counts)
    out = np.empty(total, dtype=np.uint32)
    pos = 0
    zpos = 0
    for n in counts:
        out[pos] = command_header(MOVE_TO, 1)
        out[pos + 1:pos + 3] = z[zpos:zpos + 2]
        out[pos + 3] = command_header(LINE_TO, n - 1)
        out[pos + 4:pos + 2 + 2 * n] = z[zpos + 2:zpos + 2 * n]
        out[pos + 2 + 2 * n] = command_header(CLOSE_PATH, 1)
        pos += 3 + 2 * n
        zpos += 2 * n
    return out


# ---------------------------------------------------------------------------
# batched encode: whole-layer command-word construction
#
# The per-feature encoders above pay fixed numpy costs (diff/concat/
# empty) PER FEATURE; a dense layer (roads.mvt: ~450 features) spends
# more time in that machinery than in the arithmetic. These twins
# build the command words for EVERY feature of a geometry group in
# one vectorized pass and return (flat_words, per_feature_word_counts)
# so encode_layer can varint-encode the whole layer at once. Byte
# parity with the per-feature encoders is asserted by a property test
# (tests/test_geometry.py) and the 45-fixture encode fixpoint.
# ---------------------------------------------------------------------------

def _reset_deltas(pts: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Per-feature cursor-reset deltas: delta[i] = pts[i] - pts[i-1],
    except at each feature's first point where the cursor restarts at
    (0,0) so the delta is the absolute coordinate (Internal.hs:349)."""
    deltas = pts.copy()
    if pts.shape[0] > 1:
        deltas[1:] -= pts[:-1]
    s = starts[(starts > 0) & (starts < pts.shape[0])]
    deltas[s] = pts[s]
    return deltas


def _scatter_params(out: np.ndarray, seg_woff: np.ndarray,
                    seg_counts: np.ndarray, z: np.ndarray) -> None:
    """Scatter zigzagged params into ``out``: segment (line/ring) words
    are [MoveTo hdr, z0, z1, LineTo hdr, z2, ...], so param k of a
    segment lands at seg_woff + 1 + k + (k >= 2)."""
    if z.size == 0:
        return
    pair_off = np.cumsum(seg_counts) - seg_counts
    k = np.arange(z.size, dtype=np.int64) - np.repeat(2 * pair_off, 2 * seg_counts)
    out[np.repeat(seg_woff + 1, 2 * seg_counts) + k + (k >= 2)] = z


def encode_points_batch(geoms: list) -> tuple[np.ndarray, np.ndarray]:
    """Batched twin of encode_points over a list of (n, 2) arrays."""
    m = len(geoms)
    arrs = [np.asarray(g, dtype=np.int64).reshape(-1, 2) for g in geoms]
    counts = np.fromiter((a.shape[0] for a in arrs), np.int64, count=m)
    sizes = 1 + 2 * counts
    if m == 0:
        return np.empty(0, np.uint32), sizes
    pts = np.concatenate(arrs) if m > 1 else arrs[0]
    pstart = np.cumsum(counts) - counts
    z = zig(_reset_deltas(pts, pstart).ravel())
    woff = np.cumsum(sizes) - sizes
    out = np.empty(int(sizes.sum()), np.uint32)
    out[woff] = (counts << 3) | MOVE_TO
    if z.size:
        k = np.arange(z.size, dtype=np.int64) - np.repeat(2 * pstart, 2 * counts)
        out[np.repeat(woff + 1, 2 * counts) + k] = z
    return out, sizes


def encode_linestrings_batch(geoms: list) -> tuple[np.ndarray, np.ndarray]:
    """Batched twin of encode_linestrings over a list of features,
    each a list of (n, 2) line arrays. Cursor carries across lines
    within a feature and resets between features."""
    m = len(geoms)
    lines: list[np.ndarray] = []
    nlines = np.empty(m, dtype=np.int64)
    for i, feat in enumerate(geoms):
        nlines[i] = len(feat)
        for l in feat:
            lines.append(np.asarray(l, dtype=np.int64).reshape(-1, 2))
    if not lines:
        return np.empty(0, np.uint32), np.zeros(m, np.int64)
    lcounts = np.fromiter((l.shape[0] for l in lines), np.int64, count=len(lines))
    lsizes = 2 + 2 * lcounts
    lb = np.cumsum(nlines) - nlines  # first-line index per feature
    size_cum = np.concatenate([[0], np.cumsum(lsizes)])
    sizes = size_cum[lb + nlines] - size_cum[lb]
    pts = np.concatenate(lines) if len(lines) > 1 else lines[0]
    lpstart = np.cumsum(lcounts) - lcounts
    feat_start_pts = lpstart[lb[nlines > 0]]  # first point of each nonempty feature
    z = zig(_reset_deltas(pts, feat_start_pts).ravel())
    lwoff = size_cum[:-1]
    out = np.empty(int(size_cum[-1]), np.uint32)
    out[lwoff] = command_header(MOVE_TO, 1)
    out[lwoff + 3] = ((lcounts - 1) << 3) | LINE_TO
    _scatter_params(out, lwoff, lcounts, z)
    return out, sizes


def encode_polygons_batch(geoms: list) -> tuple[np.ndarray, np.ndarray]:
    """Batched twin of encode_polygons over a list of features, each a
    list of polygons (each a list of closed rings). Rings drop their
    closing point; cursor carries across rings and polygons within a
    feature and resets between features."""
    m = len(geoms)
    rings: list[np.ndarray] = []
    nrings = np.empty(m, dtype=np.int64)
    for i, feat in enumerate(geoms):
        c = 0
        for poly in feat:
            for r in poly:
                rings.append(np.asarray(r, dtype=np.int64).reshape(-1, 2)[:-1])
                c += 1
        nrings[i] = c
    if not rings:
        return np.empty(0, np.uint32), np.zeros(m, np.int64)
    rcounts = np.fromiter((r.shape[0] for r in rings), np.int64, count=len(rings))
    rsizes = 3 + 2 * rcounts
    rb = np.cumsum(nrings) - nrings
    size_cum = np.concatenate([[0], np.cumsum(rsizes)])
    sizes = size_cum[rb + nrings] - size_cum[rb]
    pts = np.concatenate(rings) if len(rings) > 1 else rings[0]
    rpstart = np.cumsum(rcounts) - rcounts
    feat_start_pts = rpstart[rb[nrings > 0]]
    z = zig(_reset_deltas(pts, feat_start_pts).ravel())
    rwoff = size_cum[:-1]
    out = np.empty(int(size_cum[-1]), np.uint32)
    out[rwoff] = command_header(MOVE_TO, 1)
    out[rwoff + 3] = ((rcounts - 1) << 3) | LINE_TO
    out[rwoff + 2 + 2 * rcounts] = command_header(CLOSE_PATH, 1)
    _scatter_params(out, rwoff, rcounts, z)
    return out, sizes


# ---------------------------------------------------------------------------
# area
# ---------------------------------------------------------------------------

def surveyor(ring: np.ndarray) -> float:
    """Shoelace over a CLOSED ring (closing point excluded from the
    scan), reference formula exactly (Geometry.hs:76-81): positive =>
    exterior, negative => interior, y-down origin top-left.

    Written as two wraparound dot products (no np.roll allocations):
    sum x_i*(y_{i+1} - y_{i-1}) = (x.y_next) - (x.y_prev)."""
    v = np.asarray(ring, dtype=np.int64).reshape(-1, 2)[:-1]
    x = v[:, 0]
    y = v[:, 1]
    s1 = int(np.dot(x[:-1], y[1:])) + int(x[-1]) * int(y[0])
    s2 = int(np.dot(x[1:], y[:-1])) + int(x[0]) * int(y[-1])
    return (s1 - s2) / 2.0


def polygon_area(rings: list[np.ndarray]) -> float:
    """Exterior + hole areas (holes negative) — reference `area`
    (Geometry.hs:68-69)."""
    return float(sum(surveyor(r) for r in rings))


def surveyor_batch(flat_xy: np.ndarray, ring_offsets: np.ndarray) -> np.ndarray:
    """Vectorized shoelace over many closed rings at once.

    flat_xy: (N, 2) concatenated ring coordinates (closed rings);
    ring_offsets: int64 array of ring start offsets, with a final
    sentinel N. Returns per-ring signed areas (float64).
    """
    x = flat_xy[:, 0].astype(np.int64)
    y = flat_xy[:, 1].astype(np.int64)
    starts = ring_offsets[:-1]
    ends = ring_offsets[1:] - 1  # exclude closing point
    # per-element next/prev indices within each ring's open span
    n = x.size
    idx = np.arange(n, dtype=np.int64)
    ring_id = np.repeat(np.arange(starts.size), ring_offsets[1:] - ring_offsets[:-1])
    open_mask = idx < ends[ring_id]  # drop each ring's closing point
    oi = idx[open_mask]
    rid = ring_id[open_mask]
    nxt = oi + 1
    at_end = nxt == ends[rid]
    nxt = np.where(at_end, starts[rid], nxt)
    prv = oi - 1
    at_start = oi == starts[rid]
    prv = np.where(at_start, ends[rid] - 1, prv)
    contrib = x[oi] * (y[nxt] - y[prv])
    sums = np.zeros(starts.size, dtype=np.int64)
    np.add.at(sums, rid, contrib)
    return sums / 2.0
