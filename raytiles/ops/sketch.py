"""Mergeable-sketch operators: HyperLogLog approximate count-distinct.

The sketch family demonstrates the third custom-operator shape from
the build brief (alongside the as-of/range joins and windowed
aggregates): per-batch partial state that is ASSOCIATIVE and
COMMUTATIVE under merge (here: elementwise register max), so the
all-to-all exchange moves at most ``groups x m`` register rows per
batch no matter the input cardinality, and any re-grouping of batches
yields bit-identical registers.

Algorithm: HyperLogLog (Flajolet, Fusy, Gandouet, Meunier 2007) with
the standard small-range correction, on a splitmix64 hash — fully
deterministic, so tests can pin exact outputs, not just error bounds.
No SQL oracle (approximate by design); the pytest oracle checks the
estimate against the exact distinct count within the 1.04/sqrt(m)
error regime and the merge-invariance property.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..util import splitmix64


def approx_distinct_users(sf_dir: str, p: int = 12,
                          n_buckets: int = 64) -> ray.data.Dataset:
    """Approximate count(DISTINCT user_id) per event_type via HLL with
    m = 2**p registers.

    Partial (per batch): hash user_ids, split each hash into a
    register index (top p bits) and a rank (leading-zero count of the
    remaining 64-p bits, +1), and collapse to the per-(event_type,
    register) max — one argsort + maximum.reduceat, no Python loop.
    Shuffle: registers hash-partition into a bounded bucket key; the
    per-bucket merge is the same max-reduce (register max is
    associative+commutative, so partial order never matters).
    Finalize: ONE bounded groupby over event_type computes the HLL
    estimate from its <= m register rows (absent registers count as
    rank 0 in the harmonic sum)."""
    m = 1 << p
    low_bits = 64 - p
    low_mask = np.uint64((1 << low_bits) - 1)

    def _max_per_key(key: np.ndarray, rank: np.ndarray):
        order = np.argsort(key, kind="stable")
        k, r = key[order], rank[order]
        starts = np.flatnonzero(
            np.concatenate(([True], k[1:] != k[:-1]))) if len(k) else \
            np.empty(0, np.int64)
        if len(k) == 0:
            return k, r
        return k[starts], np.maximum.reduceat(r, starts)

    def partial(b: pa.Table) -> pa.Table:
        et = np.asarray(b["event_type"])
        codes, inv = np.unique(et, return_inverse=True)
        h = splitmix64(b["user_id"].to_numpy())
        idx = (h >> np.uint64(low_bits)).astype(np.int64)
        v = (h & low_mask).astype(np.float64)   # < 2^52: float64-exact
        _, ex = np.frexp(v)
        rank = np.where(v > 0, low_bits - (ex - 1), low_bits + 1) \
            .astype(np.int64)
        key = inv.astype(np.int64) * m + idx
        ku, mx = _max_per_key(key, rank)
        return pa.table({
            "event_type": pa.array(codes[ku // m]),
            "reg": ku % m,
            "rank": mx,
            "bucket": (ku % m) % n_buckets})

    def merge(g: pa.Table) -> pa.Table:
        et = np.asarray(g["event_type"])
        codes, inv = np.unique(et, return_inverse=True)
        key = inv.astype(np.int64) * m + g["reg"].to_numpy()
        ku, mx = _max_per_key(key, g["rank"].to_numpy())
        return pa.table({"event_type": pa.array(codes[ku // m]),
                         "reg": ku % m, "rank": mx})

    def estimate(g: pa.Table) -> pa.Table:
        ranks = g["rank"].to_numpy()
        zeros = m - len(ranks)
        s = float(np.sum(np.ldexp(1.0, -ranks))) + zeros
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / s
        if e <= 2.5 * m and zeros > 0:
            e = m * np.log(m / zeros)   # small-range (linear counting)
        return pa.table({
            "event_type": pa.array([g["event_type"][0].as_py()]),
            "n_users_est": np.array([int(round(e))], dtype=np.int64)})

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").map_groups(merge, batch_format="pyarrow") \
        .groupby("event_type").map_groups(estimate, batch_format="pyarrow")
