"""Shared integer-mix helpers for bounded-bucket shuffle keys.

The repo's shuffle discipline (CLAUDE.md): never groupby a
high-cardinality key — group by a splitmix-mixed hash bucket with a
bounded domain and vectorize within the group. This module is the one
place that mixing lives so every operator derives buckets the same way
(never Python hash(), which is salted per process).
"""

from __future__ import annotations

import numpy as np


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (public domain constant set) — avalanche a
    uint64 key array; vectorized, wrap-around arithmetic."""
    x = np.asarray(x).astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def bucket_of(x, n_buckets: int) -> np.ndarray:
    """Bounded shuffle-bucket ids (int64 in [0, n_buckets)) for an
    integer key array."""
    return (splitmix64(x) % np.uint64(n_buckets)).astype(np.int64)


def pair_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Order-sensitive uint64 key for an id pair (a, b)."""
    return (np.asarray(a).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + np.asarray(b).astype(np.uint64))
