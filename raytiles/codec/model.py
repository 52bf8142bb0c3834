"""High-level tile model — the engine's analogue of the reference's
user-facing types (reference: lib/Geography/VectorTile/VectorTile.hs).

`Val` mirrors the 7-variant MVT metadata sum type (VectorTile.hs:143-144)
as a (tag, value) tuple so the exact wire variant survives roundtrip
(I64 5 != W64 5 != S64 5):

    ("St", bytes) | ("Fl", float) | ("Do", float) | ("I64", int)
    | ("W64", int) | ("S64", int) | ("B", bool)

Geometry containers (see codec.geometry):
    points:      (n, 2) int64 ndarray
    linestrings: list of (n, 2) int64 ndarrays
    polygons:    list of [closed exterior ring, closed hole, ...] lists
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np

DEFAULT_EXTENT = 4096  # VectorTile.hs:78

ST, FL, DO, I64V, W64V, S64V, BV = "St", "Fl", "Do", "I64", "W64", "S64", "B"
VAL_TAGS = (ST, FL, DO, I64V, W64V, S64V, BV)

Val = tuple  # (tag, value)


@dataclass(slots=True)
class Feature:
    """One feature (VectorTile.hs:123-125). ``geometry`` container type
    is implied by which Layer vector holds the feature."""
    fid: int = 0
    metadata: dict = field(default_factory=dict)  # bytes -> Val, insertion-ordered
    geometry: Any = None


@dataclass(slots=True)
class Layer:
    """A named layer with features split by geometry type
    (VectorTile.hs:73-79)."""
    name: bytes = b""
    version: int = 1
    extent: int = DEFAULT_EXTENT
    points: list = field(default_factory=list)
    linestrings: list = field(default_factory=list)
    polygons: list = field(default_factory=list)


@dataclass(slots=True)
class VectorTile:
    """layers: bytes name -> Layer (VectorTile.hs:62); duplicate wire
    names collapse keep-last (Internal.hs:99)."""
    layers: dict = field(default_factory=dict)


# ---------------------------------------------------------------------------
# structural equality (numpy-aware) — used by conformance tests
# ---------------------------------------------------------------------------

def _geom_equal(a, b) -> bool:
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        return isinstance(a, np.ndarray) and isinstance(b, np.ndarray) \
            and a.shape == b.shape and bool(np.array_equal(a, b))
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_geom_equal(x, y) for x, y in zip(a, b))
    return a == b


def features_equal(a: Feature, b: Feature) -> bool:
    return a.fid == b.fid and a.metadata == b.metadata and _geom_equal(a.geometry, b.geometry)


def layers_equal(a: Layer, b: Layer) -> bool:
    if (a.name, a.version, a.extent) != (b.name, b.version, b.extent):
        return False
    for fa, fb in ((a.points, b.points), (a.linestrings, b.linestrings), (a.polygons, b.polygons)):
        if len(fa) != len(fb) or not all(features_equal(x, y) for x, y in zip(fa, fb)):
            return False
    return True


def tiles_equal(a: VectorTile, b: VectorTile) -> bool:
    if set(a.layers) != set(b.layers):
        return False
    return all(layers_equal(a.layers[k], b.layers[k]) for k in a.layers)
