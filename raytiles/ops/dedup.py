"""Deduplication operators: exact (hash + keep-first), MinHash-LSH
band buckets + candidate pairs, SimHash, and n-gram Jaccard
verification — the dedup toolbox of a pretraining-data pipeline.

Scale shape (100 TB): exact dedup shuffles one md5 per doc (not the
text); MinHash emits (doc, band, hash) rows — b*doc rows of 24 bytes —
and candidate pairs come from a groupby on (band, band_hash) whose
groups are tiny unless data is pathologically duplicated; Jaccard
verification joins only the candidate pairs back to shingle sets.

Hashing is md5-derived everywhere (first 16 hex chars as uint64) so
the DuckDB oracle can reproduce it exactly:
    h(s)      = ('0x' || substr(md5(s), 1, 16))::UBIGINT
    h_i(s)    = xor(h(s), SEED_CONSTS[i])   # per-permutation variant
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray
import ray.data

from .text import TOKEN_RE

# fixed xor constants deriving the i-th minhash permutation from one md5
# (seeded rng, frozen at build time — reproduced literally in oracle SQL)
SEED_CONSTS = np.random.default_rng(1234).integers(
    0, 2 ** 63, size=8, dtype=np.uint64).tolist()
N_HASHES = 8
N_BANDS = 4  # rows per band = 2
SHINGLE_W = 3


def _md5_u64(strings) -> np.ndarray:
    return np.fromiter(
        (int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16) for s in strings),
        dtype=np.uint64, count=len(strings))


def _docs(sf_dir: str, columns) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """One surviving row per distinct text: (h, doc_id=min, n_dups).
    hash in map_batches (shuffle moves 16-byte keys, not documents),
    then groupby(h) keep-first."""
    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype(np.int64),
            "h": [hashlib.md5(t.encode("utf-8")).hexdigest() for t in b["text"]],
        })

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"h": [g["h"].iloc[0]],
                             "doc_id": [np.int64(g["doc_id"].min())],
                             "n_dups": [np.int64(len(g))]})

    return _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(add_hash, batch_format="pandas") \
        .groupby("h").map_groups(keep_first, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingles(text: str) -> list[str]:
    import re
    toks = re.findall(TOKEN_RE, text)
    if len(toks) < SHINGLE_W:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i:i + SHINGLE_W]) for i in range(len(toks) - SHINGLE_W + 1)]


class MinHasher:
    """doc -> N_BANDS rows (doc_id, band_id, band_hash). Base md5 per
    distinct shingle, permutations via xor constants, band hash = md5
    of the band's minhash values joined with '_'."""

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        rows_doc, rows_band, rows_hash = [], [], []
        consts = np.array(SEED_CONSTS, dtype=np.uint64)
        rpb = N_HASHES // N_BANDS
        for doc_id, text in zip(b["doc_id"], b["text"]):
            sh = _shingles(text)
            if not sh:
                continue
            base = _md5_u64(sh)  # (n_shingles,)
            # (n_hashes,) minhash signature
            sig = np.bitwise_xor(base[:, None], consts[None, :]).min(axis=0)
            for band in range(N_BANDS):
                part = sig[band * rpb:(band + 1) * rpb]
                key = "_".join(str(int(v)) for v in part)
                rows_doc.append(int(doc_id))
                rows_band.append(band)
                rows_hash.append(int(hashlib.md5(key.encode()).hexdigest()[:16], 16))
        return pd.DataFrame({"doc_id": np.array(rows_doc, np.int64),
                             "band_id": np.array(rows_band, np.int64),
                             "band_hash": np.array(rows_hash, np.uint64).astype(np.int64)})


def minhash_bands(sf_dir: str) -> ray.data.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        MinHasher, batch_format="pandas", concurrency=(1, 8))


def minhash_pairs(sf_dir: str) -> ray.data.Dataset:
    """Distinct candidate near-dup pairs (doc_a < doc_b) sharing any
    LSH band bucket."""
    bands = minhash_bands(sf_dir)

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(np.unique(g["doc_id"].to_numpy()))
        if ids.size < 2:
            return pd.DataFrame({"doc_a": np.empty(0, np.int64),
                                 "doc_b": np.empty(0, np.int64)})
        ia, ib = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        pairs_in_bucket, batch_format="pandas")
    # distinct pairs (a pair can collide in several bands)
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


# ---------------------------------------------------------------------------
# n-gram Jaccard verification of candidate pairs
# ---------------------------------------------------------------------------

def jaccard_verify(sf_dir: str, threshold: float = 0.7) -> ray.data.Dataset:
    """MinHash candidates -> exact shingle-set Jaccard (broadcast the
    shingle sets of candidate docs only — the candidate universe is
    tiny relative to the corpus)."""
    pairs_df = minhash_pairs(sf_dir).to_pandas()
    cand_ids = np.unique(np.concatenate([pairs_df["doc_a"].to_numpy(),
                                         pairs_df["doc_b"].to_numpy()])) \
        if len(pairs_df) else np.empty(0, np.int64)
    cand_set = set(cand_ids.tolist())

    def shingle_sets(b: pd.DataFrame) -> pd.DataFrame:
        m = b["doc_id"].isin(cand_set)
        sub = b[m]
        return pd.DataFrame({
            "doc_id": sub["doc_id"].astype(np.int64),
            "sh": [list(set(_shingles(t))) for t in sub["text"]],
        })

    sets_df = _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(shingle_sets, batch_format="pandas").to_pandas()
    lookup = {int(r.doc_id): set(r.sh) for r in sets_df.itertuples()}
    out_a, out_b, out_j = [], [], []
    for r in pairs_df.itertuples():
        sa, sb = lookup.get(int(r.doc_a), set()), lookup.get(int(r.doc_b), set())
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out_a.append(int(r.doc_a))
            out_b.append(int(r.doc_b))
            # floor-quantize: bit-identical to the SQL oracle's floor()
            out_j.append(np.floor(j * 1e6) / 1e6)
    return ray.data.from_pandas(pd.DataFrame({
        "doc_a": np.array(out_a, np.int64), "doc_b": np.array(out_b, np.int64),
        "jaccard": np.array(out_j, np.float64)}))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(sf_dir: str) -> ray.data.Dataset:
    """64-bit SimHash over token md5 hashes, emitted as two int32-range
    halves (simhash_hi, simhash_lo) to stay BIGINT-safe for the SQL
    oracle. Bit b set iff 2*count_ones(b) >= n_tokens."""
    import re
    tok_re = re.compile(TOKEN_RE)

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        hi = np.zeros(n, dtype=np.int64)
        lo = np.zeros(n, dtype=np.int64)
        for i, text in enumerate(b["text"]):
            toks = tok_re.findall(text)
            if not toks:
                continue
            h = _md5_u64(toks)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).sum(axis=0)
            vote = (2 * bits >= len(toks)).astype(np.uint64)
            word = np.uint64(0)
            for bpos in range(64):
                word |= vote[bpos] << np.uint64(bpos)
            hi[i] = np.int64(word >> np.uint64(32))
            lo[i] = np.int64(word & np.uint64(0xFFFFFFFF))
        return pd.DataFrame({"doc_id": b["doc_id"].astype(np.int64),
                             "simhash_hi": hi, "simhash_lo": lo})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pandas")
