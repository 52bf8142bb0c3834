"""Similarity search over the embeddings table (list<float> column).

- brute-force cosine top-k: the baseline — query matrix broadcast via
  ray.put, per-batch numpy matmul, per-batch top-k partials, tiny
  final merge (scales: the full matrix never materializes, each batch
  contributes at most q*k candidate rows to the merge);
- LSH-bucketed near-duplicate pairs: seeded random hyperplanes ->
  bucket signature -> groupby(bucket) -> within-bucket pairwise cosine
  (the scale path: candidate generation is a single shuffle of
  (bucket, id, vec) rows, quadratic work only within buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


def _emb(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def _stack(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def knn_bruteforce(sf_dir: str, k: int = 10, n_queries: int = 8) -> ray.data.Dataset:
    """Top-k cosine neighbors of the first ``n_queries`` vec_ids
    against the whole table. Output (query_id, neighbor_id, rank),
    rank 1-based by (sim desc, neighbor_id asc); self excluded."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    qtab = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        filter=pc.field("vec_id") < n_queries, columns=["vec_id", "embedding"])
    q_ids = qtab["vec_id"].to_numpy()
    q = _stack(qtab["embedding"].to_pylist())
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    q_ref = ray.put((q_ids, qn))

    class BatchTopK:
        def __init__(self, ref, k):
            self.q_ids, self.qn = ray.get(ref)
            self.k = k

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            v = _stack(b["embedding"])
            vn = v / np.linalg.norm(v, axis=1, keepdims=True)
            sims = vn @ self.qn.T  # (batch, q)
            ids = b["vec_id"].to_numpy()
            out = []
            kk = min(self.k + 1, ids.size)  # +1 to survive self-exclusion
            for j, qid in enumerate(self.q_ids):
                s = sims[:, j]
                top = np.argpartition(-s, kk - 1)[:kk]
                out.append(pd.DataFrame({"query_id": np.int64(qid),
                                         "neighbor_id": ids[top].astype(np.int64),
                                         "sim": s[top]}))
            return pd.concat(out, ignore_index=True)

    partials = _emb(sf_dir).map_batches(
        BatchTopK, batch_format="pandas", batch_size=8192, concurrency=(1, 8),
        fn_constructor_kwargs={"ref": q_ref, "k": k})

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["neighbor_id"] != g["query_id"]]
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        return pd.DataFrame({"query_id": g["query_id"].astype(np.int64),
                             "neighbor_id": g["neighbor_id"].astype(np.int64),
                             "rank": np.arange(1, len(g) + 1, dtype=np.int64)})

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def knn_ivf(sf_dir: str, k: int = 10, n_queries: int = 8,
            n_lists: int = 16, nprobe: int = 4) -> ray.data.Dataset:
    """IVF approximate top-k: the scale path for similarity search.

    Coarse quantizer: n_lists deterministic centroids (evenly spaced
    vec_ids — no training step, fully reproducible), broadcast via
    ray.put. Each vector is assigned to its nearest centroid inside
    map_batches; each query probes its nprobe nearest lists and scans
    ONLY those vectors (per-batch masked matmul + top-k partials, tiny
    final merge). At 10^12 scale the probed fraction (nprobe/n_lists)
    is the work reduction; recall is checked against brute force in
    tests. Output shape matches knn_bruteforce (query_id, neighbor_id,
    rank); approximate by construction -> rows-only in the gate."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    full = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
    n_total = full.num_rows
    step = max(1, n_total // n_lists)
    centroid_ids = set(range(0, step * n_lists, step))
    ctab = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        filter=pc.field("vec_id").isin(list(centroid_ids)),
        columns=["vec_id", "embedding"])
    corder = np.argsort(ctab["vec_id"].to_numpy())
    cvecs = _stack(ctab["embedding"].to_pylist())[corder]
    cn = cvecs / np.linalg.norm(cvecs, axis=1, keepdims=True)

    qtab = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        filter=pc.field("vec_id") < n_queries, columns=["vec_id", "embedding"])
    q_ids = qtab["vec_id"].to_numpy()
    q = _stack(qtab["embedding"].to_pylist())
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    # probed list sets per query (ties broken by list index via argsort)
    probe_sims = qn @ cn.T
    probed = np.argsort(-probe_sims, axis=1, kind="stable")[:, :nprobe]
    state_ref = ray.put((q_ids, qn, cn, probed))

    class IvfTopK:
        def __init__(self, ref, k):
            self.q_ids, self.qn, self.cn, self.probed = ray.get(ref)
            self.k = k

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            v = _stack(b["embedding"])
            vn = v / np.linalg.norm(v, axis=1, keepdims=True)
            lists = np.argmax(vn @ self.cn.T, axis=1)
            ids = b["vec_id"].to_numpy()
            out = []
            for j, qid in enumerate(self.q_ids):
                mask = np.isin(lists, self.probed[j])
                if not mask.any():
                    continue
                s = vn[mask] @ self.qn[j]
                cand = ids[mask]
                kk = min(self.k + 1, cand.size)
                top = np.argpartition(-s, kk - 1)[:kk]
                out.append(pd.DataFrame({"query_id": np.int64(qid),
                                         "neighbor_id": cand[top].astype(np.int64),
                                         "sim": s[top]}))
            if not out:
                return pd.DataFrame({"query_id": np.empty(0, np.int64),
                                     "neighbor_id": np.empty(0, np.int64),
                                     "sim": np.empty(0, np.float64)})
            return pd.concat(out, ignore_index=True)

    partials = _emb(sf_dir).map_batches(
        IvfTopK, batch_format="pandas", batch_size=8192, concurrency=(1, 8),
        fn_constructor_kwargs={"ref": state_ref, "k": k})

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["neighbor_id"] != g["query_id"]]
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        return pd.DataFrame({"query_id": g["query_id"].astype(np.int64),
                             "neighbor_id": g["neighbor_id"].astype(np.int64),
                             "rank": np.arange(1, len(g) + 1, dtype=np.int64)})

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


LSH_BITS = 12


def _hyperplanes(dim: int, bits: int = LSH_BITS) -> np.ndarray:
    return np.random.default_rng(999).normal(size=(bits, dim))


def lsh_neardup_pairs(sf_dir: str, threshold: float = 0.90) -> ray.data.Dataset:
    """Embedding near-dup pairs (cosine >= threshold) found via
    hyperplane-LSH bucketing. Approximate by construction (same-bucket
    candidates only) — verified against brute force on a subset in
    tests, no SQL oracle."""
    import pyarrow.parquet as pq
    dim = len(pq.read_table(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding"]).slice(0, 1)["embedding"][0])
    planes_ref = ray.put(_hyperplanes(dim))

    class Bucketize:
        def __init__(self, ref):
            self.planes = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            v = _stack(b["embedding"])
            vn = v / np.linalg.norm(v, axis=1, keepdims=True)
            bits = (vn @ self.planes.T) > 0  # (n, bits)
            bucket = np.zeros(len(b), dtype=np.int64)
            for i in range(self.planes.shape[0]):
                bucket |= bits[:, i].astype(np.int64) << i
            return pd.DataFrame({"bucket": bucket,
                                 "vec_id": b["vec_id"].astype(np.int64),
                                 "embedding": b["embedding"]})

    bucketed = _emb(sf_dir).map_batches(Bucketize, batch_format="pandas",
                                        concurrency=(1, 8),
                                        fn_constructor_kwargs={"ref": planes_ref})

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"vec_a": np.empty(0, np.int64),
                                 "vec_b": np.empty(0, np.int64),
                                 "sim": np.empty(0, np.float64)})
        order = np.argsort(g["vec_id"].to_numpy())
        ids = g["vec_id"].to_numpy()[order]
        v = _stack(g["embedding"])[order]
        vn = v / np.linalg.norm(v, axis=1, keepdims=True)
        sims = vn @ vn.T
        ia, ib = np.triu_indices(ids.size, k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame({"vec_a": ids[ia[keep]].astype(np.int64),
                             "vec_b": ids[ib[keep]].astype(np.int64),
                             "sim": np.round(sims[ia[keep], ib[keep]], 6)})

    return bucketed.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pandas")
