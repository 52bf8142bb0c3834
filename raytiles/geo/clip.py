"""Rectangle clipping kernels for tile-boundary geometry processing.

``clip_segments``: Liang-Barsky parametric segment clipping, fully
vectorized over (segment, rect) pairs — the kernel behind cross-tile
line tiling (each polyline segment is replicated to the tiles it may
touch and clipped to each tile's extent+buffer rect; empty clips
vanish, so an over-approximate cover is exact after the clip).

``clip_ring``: Sutherland-Hodgman polygon clipping against an axis-
aligned rect — one vectorized pass per rect edge (inside masks +
batch intersection solve + order-preserving assembly), no per-vertex
Python in the loop body.

The reference codec encodes whatever geometry it is given; clipping is
an engine-side operator, so semantics are pinned by property tests.
"""

from __future__ import annotations

import numpy as np


def clip_segments(x0, y0, x1, y1, xmin, ymin, xmax, ymax):
    """Clip segments (x0,y0)-(x1,y1) to per-segment rects (all args
    float64 arrays of equal length; rects may differ per segment).
    Returns (keep, cx0, cy0, cx1, cy1): keep=False where the segment
    misses its rect; c* are the clipped endpoints elsewhere."""
    x0 = np.asarray(x0, np.float64)
    y0 = np.asarray(y0, np.float64)
    x1 = np.asarray(x1, np.float64)
    y1 = np.asarray(y1, np.float64)
    dx = x1 - x0
    dy = y1 - y0
    t0 = np.zeros(len(x0))
    t1 = np.ones(len(x0))
    reject = np.zeros(len(x0), dtype=bool)
    for p, q in ((-dx, x0 - xmin), (dx, xmax - x0),
                 (-dy, y0 - ymin), (dy, ymax - y0)):
        with np.errstate(divide="ignore", invalid="ignore"):
            r = q / p
        reject |= (p == 0) & (q < 0)
        ent = p < 0
        t0 = np.where(ent, np.maximum(t0, r), t0)
        t1 = np.where(p > 0, np.minimum(t1, r), t1)
    keep = ~reject & (t0 <= t1)
    cx0 = x0 + t0 * dx
    cy0 = y0 + t0 * dy
    cx1 = x0 + t1 * dx
    cy1 = y0 + t1 * dy
    return keep, cx0, cy0, cx1, cy1


def clip_rings(x: np.ndarray, y: np.ndarray, offsets: np.ndarray,
               xmin: np.ndarray, ymin: np.ndarray,
               xmax: np.ndarray, ymax: np.ndarray
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched Sutherland-Hodgman: clip R open rings at once, each to
    its OWN axis-aligned rect. ``x``/``y`` are the concatenated ring
    vertices (float64), ``offsets`` the int64 ring-start offsets with a
    final sentinel (len R+1); the rect bounds are per-ring arrays of
    len R. Returns (cx, cy, coffsets) in the same ragged layout —
    rings may come back empty (zero-length span).

    Same per-edge emission scheme as ``clip_ring`` (intersection in
    slot 0, inside end-vertex in slot 1, stable sort by slot), but the
    wraparound "next vertex" and the clip bound are resolved through a
    per-vertex ring-id index, so ALL rings and rect edges of a pass are
    one numpy expression — no per-pair Python loop. Cost O(total
    vertices) per pass, 4 passes."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    offsets = np.asarray(offsets, np.int64)
    nrings = len(offsets) - 1
    bounds = (np.asarray(xmin, np.float64), np.asarray(xmax, np.float64),
              np.asarray(ymin, np.float64), np.asarray(ymax, np.float64))
    for axis, bsel, keep_ge in ((0, 0, True), (0, 1, False),
                                (1, 2, True), (1, 3, False)):
        n = len(x)
        if n == 0:
            break
        counts = offsets[1:] - offsets[:-1]
        rid = np.repeat(np.arange(nrings, dtype=np.int64), counts)
        # wraparound next index within each ring
        nxt = np.arange(1, n + 1, dtype=np.int64)
        ends = offsets[1:] - 1
        live = ends[counts > 0]
        nxt[live] = offsets[:-1][counts > 0]
        v = x if axis == 0 else y
        bound_v = bounds[bsel][rid]
        inside = v >= bound_v if keep_ge else v <= bound_v
        cross = inside != inside[nxt]
        ci = np.flatnonzero(cross)
        if len(ci):
            va, vb = v[ci], v[nxt[ci]]
            t = (bounds[bsel][rid[ci]] - va) / (vb - va)
            if axis == 0:
                ix = bounds[bsel][rid[ci]]
                iy = y[ci] + t * (y[nxt[ci]] - y[ci])
            else:
                ix = x[ci] + t * (x[nxt[ci]] - x[ci])
                iy = bounds[bsel][rid[ci]]
        else:
            ix = iy = np.empty(0)
        keep_v = inside[nxt]
        ki = np.flatnonzero(keep_v)
        pos = np.concatenate([ci * 2, ki * 2 + 1])
        px = np.concatenate([ix, x[nxt[ki]]])
        py = np.concatenate([iy, y[nxt[ki]]])
        prid = np.concatenate([rid[ci], rid[ki]])
        order = np.argsort(pos, kind="stable")  # pos is edge-major, so
        x, y = px[order], py[order]             # ring grouping survives
        new_counts = np.bincount(prid, minlength=nrings).astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(new_counts)])
    return x, y, offsets


def clip_ring(x: np.ndarray, y: np.ndarray,
              xmin: float, ymin: float, xmax: float, ymax: float
              ) -> tuple[np.ndarray, np.ndarray]:
    """Sutherland-Hodgman: clip one polygon ring to an axis-aligned
    rect. Four passes (one per rect edge); each pass is vectorized —
    inside masks, one batched intersection solve for the crossing
    edges, and a lexsort assembly that preserves ring order. Returns
    the clipped ring (possibly empty)."""
    for axis, bound, keep_ge in ((0, xmin, True), (0, xmax, False),
                                 (1, ymin, True), (1, ymax, False)):
        n = len(x)
        if n == 0:
            break
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        v = x if axis == 0 else y
        inside = v >= bound if keep_ge else v <= bound
        nxt = np.roll(np.arange(n), -1)
        cross = inside != inside[nxt]
        # intersection of edge i -> nxt[i] with the clip line
        ci = np.flatnonzero(cross)
        if len(ci):
            va, vb = v[ci], v[nxt][ci]
            t = (bound - va) / (vb - va)
            ix = x[ci] + t * (x[nxt][ci] - x[ci])
            iy = y[ci] + t * (y[nxt][ci] - y[ci])
            if axis == 0:
                ix = np.full(len(ci), bound)
            else:
                iy = np.full(len(ci), bound)
        else:
            ix = iy = np.empty(0)
        # emit order per edge i: intersection (slot 0), then the edge's
        # END vertex if inside (slot 1)
        keep_v = inside[nxt]
        pos = np.concatenate([ci * 2, np.flatnonzero(keep_v) * 2 + 1])
        px = np.concatenate([ix, x[nxt][keep_v]])
        py = np.concatenate([iy, y[nxt][keep_v]])
        order = np.argsort(pos, kind="stable")
        x, y = px[order], py[order]
    return np.asarray(x, np.float64), np.asarray(y, np.float64)
