"""Shared integer-mix helpers for bounded-bucket shuffle keys.

The repo's shuffle discipline (CLAUDE.md): never groupby a
high-cardinality key — group by a splitmix-mixed hash bucket with a
bounded domain and vectorize within the group. This module is the one
place that mixing lives so every operator derives buckets the same way
(never Python hash(), which is salted per process).
"""

from __future__ import annotations

import os

import numpy as np
import ray


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


def derive_buckets(path: str, floor: int = 256, cap: int = 1 << 20,
                   target_bytes: int = 32 << 20) -> int:
    """Bounded-bucket count derived from INPUT SIZE — the flagship
    read_webpages pattern (pipeline/flagship.py:44-75) applied to every
    bucketed ``groupby("bucket").map_groups`` op: a FIXED bucket count
    means per-group block size grows linearly with input (256 buckets
    over 10^12 rows = ~4B rows in one group block), so instead the
    count scales so each bucket sees ~``target_bytes`` of compressed
    input (~3x that in heap once decoded).

    - ``floor`` keeps the historical bounded-domain layout at test
      scale (sf0.001-0.1 inputs are far below floor*target_bytes, so
      derived == floor == the old fixed default and RESULTS at small
      sf are a pure re-layout, i.e. unchanged).
    - ``cap`` bounds the group-key domain (groups are cheap — the sort
      shuffle's cost rides block counts, not key cardinality — but a
      runaway domain adds per-group dispatch overhead).
    - Derived from DATA size, not cluster size, on purpose: the same
      dataset gets the same layout at N and 4N nodes (cpu-scaled
      counts made the 4N leg pay a wider shuffle for nothing — the
      measured flagship lesson).
    """
    forced = os.environ.get("RAYTILES_FORCE_BUCKETS")
    if forced:  # test hook: layout-invariance runs force a weird count
        return int(forced)
    total = 0
    if os.path.isdir(path):
        with os.scandir(path) as it:
            total = sum(e.stat().st_size for e in it if e.is_file())
    elif os.path.isfile(path):
        total = os.path.getsize(path)
    return int(min(cap, max(floor, total // target_bytes)))


def resolve_buckets(n_buckets, path: str, floor: int) -> int:
    """Bucket-count resolution for every bucketed op: an explicit
    ``n_buckets`` wins; ``None`` derives from the op's input-table size
    (``derive_buckets``), with ``floor`` = the op's historical fixed
    default so small-scale layouts (and RESULTS_SHA) are unchanged.
    Driver-side only — runs at op construction, never on workers."""
    if n_buckets is not None:
        return int(n_buckets)
    return derive_buckets(path, floor=floor)


def pair_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Order-sensitive uint64 key for an id pair (a, b)."""
    return (np.asarray(a).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + np.asarray(b).astype(np.uint64))


# ---------------------------------------------------------------------------
# CRC32C (Castagnoli, reflected poly 0x82F63B78) — the TFRecord
# framing checksum. No crc32c in the stdlib (zlib.crc32 is the
# IEEE/PNG polynomial), so this is a from-scratch numpy kernel.
# ---------------------------------------------------------------------------

_CRC32C_TABLE: "np.ndarray | None" = None


def _crc32c_table() -> np.ndarray:
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        t = np.arange(256, dtype=np.uint32)
        for _ in range(8):
            t = np.where(t & np.uint32(1),
                         np.uint32(0x82F63B78) ^ (t >> np.uint32(1)),
                         t >> np.uint32(1))
        _CRC32C_TABLE = t
    return _CRC32C_TABLE


def crc32c_batch(buf: np.ndarray, offsets: np.ndarray,
                 lengths: np.ndarray) -> np.ndarray:
    """CRC32C of N variable-length byte slices of one uint8 buffer,
    computed in LOCKSTEP: the per-byte CRC recurrence is sequential in
    the byte POSITION, so the loop runs over positions and each step
    updates every record still longer than j as one vectorized table
    gather. Records are processed length-sorted so the active set is
    always a contiguous prefix — total work is sum(lengths) table
    lookups, all numpy, no per-byte Python loop (the fastdecode
    cursor-lockstep pattern applied to a checksum)."""
    table = _crc32c_table()
    lengths = np.asarray(lengths, dtype=np.int64)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(lengths)
    out = np.empty(n, np.uint32)
    if n == 0:
        return out
    order = np.argsort(-lengths, kind="stable")
    off = offsets[order]
    ln = lengths[order]
    neg_ln = -ln  # ascending, for the active-prefix searchsorted
    crc = np.full(n, 0xFFFFFFFF, np.uint32)
    for j in range(int(ln[0])):
        k = int(np.searchsorted(neg_ln, -(j + 1), side="right"))
        b = buf[off[:k] + j].astype(np.uint32)
        c = crc[:k]
        crc[:k] = table[(c ^ b) & np.uint32(0xFF)] ^ (c >> np.uint32(8))
    out[order] = crc ^ np.uint32(0xFFFFFFFF)
    return out


def crc32c_masked(crc: np.ndarray) -> np.ndarray:
    """TFRecord's masked CRC: rot-right-15 then += magic (mod 2^32)."""
    crc = np.asarray(crc, dtype=np.uint32)
    rot = (crc >> np.uint32(15)) | (crc << np.uint32(17))
    return (rot + np.uint32(0xA282EAD8)).astype(np.uint32)


_REF_CACHE: dict = {}


def cached_ref(ref):
    """ray.get(ref) once per worker process — the make_assign_fn
    worker-cache idiom (pipeline/stages.py:130) as a shared utility:
    broadcast state rides plain TASK functions without actor-pool CPU
    slots (which can starve hash-join aggregator actors on small
    clusters). Bounded: at most 4 cached refs per worker, cleared
    wholesale beyond that."""
    key = ref.hex()
    if key not in _REF_CACHE:
        if len(_REF_CACHE) >= 4:
            _REF_CACHE.clear()
        _REF_CACHE[key] = ray.get(ref)
    return _REF_CACHE[key]
