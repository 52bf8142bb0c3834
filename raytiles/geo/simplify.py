"""Douglas-Peucker polyline simplification over ragged tile-local
coordinate runs — the standard pre-encode reduction every production
vector-tile pipeline applies at low zooms (the reference encodes
whatever it is given; simplification is an engine-side operator, so
semantics are pinned by property tests, not a reference file).

Deterministic: the split point is the FIRST index attaining the max
deviation (np.argmax tie rule), so output is a pure function of input.
"""

from __future__ import annotations

import numpy as np


def dp_keep_mask(x: np.ndarray, y: np.ndarray, tol: float) -> np.ndarray:
    """Boolean keep-mask for one polyline: classic iterative
    Douglas-Peucker with an explicit stack; the per-segment deviation
    scan is vectorized (one cross-product slice per split). Endpoints
    are always kept."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    if n <= 2:
        return keep
    xf = x.astype(np.float64)
    yf = y.astype(np.float64)
    t2 = tol * tol
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        xs = xf[i + 1:j]
        ys = yf[i + 1:j]
        dx = xf[j] - xf[i]
        dy = yf[j] - yf[i]
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:
            d2 = (xs - xf[i]) ** 2 + (ys - yf[i]) ** 2
        else:
            cross = (xs - xf[i]) * dy - (ys - yf[i]) * dx
            d2 = cross * cross / seg2
        k = int(np.argmax(d2))
        if d2[k] > t2:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def simplify_ragged(offsets: np.ndarray, x: np.ndarray, y: np.ndarray,
                    tol: float) -> np.ndarray:
    """Keep-mask over a ragged batch of runs (offsets[i]:offsets[i+1]
    slices x/y). Each run keeps its endpoints, so a valid (>=2 point)
    linestring stays valid. The per-run loop is bounded by the batch's
    feature count; all inner work is vectorized."""
    keep = np.ones(len(x), dtype=bool)
    for r in range(len(offsets) - 1):
        s, e = int(offsets[r]), int(offsets[r + 1])
        if e - s > 2:
            keep[s:e] = dp_keep_mask(x[s:e], y[s:e], tol)
    return keep
