"""Distributed linear algebra over the embeddings table: PCA via
one-pass covariance accumulation.

Shape (the mergeable-partial discipline): each batch emits ONE row
carrying (count, packed sum vector, packed X^T X upper triangle) —
for d = 64 that is ~17 KB per BLOCK regardless of row count, so the
driver-side merge touches num_blocks tiny rows, never the data. The
eigendecomposition of the d x d covariance runs on the driver (d is
a model constant, not data-scaled), components are broadcast via
ray.put, and the projection is a second shuffle-free streamed pass.

Sign convention: each principal component is canonicalized so its
largest-|coefficient| entry is positive (eigenvector sign is
arbitrary; the pytest oracle applies the same rule).

No reference counterpart (the reference is a tile codec); this is the
100 TB curation-family operator for embedding whitening / dimension
reduction ahead of ANN / clustering (ops/similarity.py, ops/cluster.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .similarity import _cached_stage, _emb, _stack


def _cov_partials(ds: ray.data.Dataset) -> ray.data.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        v = _stack(t["embedding"])
        n = len(v)
        s = v.sum(axis=0)
        g = v.T @ v  # (d, d)
        iu = np.triu_indices(v.shape[1])
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "vsum": pa.array([s.tobytes()], pa.binary()),
            "gram": pa.array([g[iu].tobytes()], pa.binary())})
    return ds.map_batches(fn, batch_format="pyarrow")


def pca_components(sf_dir: str, n_components: int = 8
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean, components (k, d), explained_variance (k,)) from one
    streamed pass; driver work is O(d^2) merge + O(d^3) eigh."""
    parts = _cov_partials(_emb(sf_dir)).to_pandas()
    n = int(parts["n"].sum())
    s = np.sum([np.frombuffer(b, np.float64) for b in parts["vsum"]],
               axis=0)
    d = len(s)
    iu = np.triu_indices(d)
    gu = np.sum([np.frombuffer(b, np.float64) for b in parts["gram"]],
                axis=0)
    gram = np.zeros((d, d))
    gram[iu] = gu
    gram = gram + np.triu(gram, 1).T
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    w, vec = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:n_components]
    comps = vec[:, order].T
    # canonical sign: largest-|coeff| entry positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, w[order]


def pca_project(sf_dir: str, n_components: int = 8) -> ray.data.Dataset:
    """(vec_id, pc0..pc{k-1}): embeddings projected onto the top-k
    principal components (second streamed pass, shuffle-free)."""
    mean, comps, _ = pca_components(sf_dir, n_components)
    ref = ray.put((mean, comps))

    def factory():
        m, c = ray.get(ref)

        def fn(t: pa.Table) -> pa.Table:
            v = _stack(t["embedding"])
            p = (v - m) @ c.T
            cols = {"vec_id": pa.array(
                t["vec_id"].to_numpy().astype(np.int64))}
            for i in range(p.shape[1]):
                cols[f"pc{i}"] = pa.array(p[:, i])
            return pa.table(cols)
        return fn

    return _emb(sf_dir).map_batches(
        _cached_stage(("pca_project", ref.hex(), n_components), factory),
        batch_format="pyarrow")
