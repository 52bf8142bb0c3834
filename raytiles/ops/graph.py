"""Iterative graph processing over the location co-occurrence graph:
distributed PageRank with a BOUNDED node domain (grid cells — <=
2^(2r+1) at resolution r) and an arbitrarily large edge set.

Scale shape (the kmeans/PCA broadcast-model pattern): the rank vector
is a model-sized constant (bounded by the cell grid, NOT by the
corpus), so each power iteration is ONE streaming pass over the edge
dataset — per-batch partial contribution sums against the broadcast
rank vector, tiny bounded partial rows back to the driver fold. The
edge dataset materializes once (it is the pre-aggregated co-mention
partial table — a reduction of the corpus, not the corpus) and is
re-scanned per iteration, exactly how an N-iteration algorithm should
touch 100 TB of source text: never; only its bounded derivative.

Determinism: the driver fold lexsorts partial rows by (cell, value)
before the per-cell reduceat sum, so the floating-point summation
order is reproducible across runs and block layouts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _fold(parts: list, n_ids: int, id_of: dict) -> np.ndarray:
    """Deterministic fold of (cell, value) partial tables."""
    cells = np.concatenate([p[0] for p in parts])
    vals = np.concatenate([p[1] for p in parts])
    idx = np.fromiter((id_of[c] for c in cells), np.int64, len(cells))
    order = np.lexsort((vals, idx))
    idx, vals = idx[order], vals[order]
    out = np.zeros(n_ids, np.float64)
    if len(idx):
        new = np.empty(len(idx), dtype=bool)
        new[0] = True
        new[1:] = idx[1:] != idx[:-1]
        st = np.flatnonzero(new)
        out[idx[st]] = np.add.reduceat(vals, st)
    return out


def cell_pagerank(webpages_path: str, res: int = 5,
                  damping: float = 0.85,
                  n_iters: int = 10) -> ray.data.Dataset:
    """PageRank over cells: nodes are res-``res`` grid cells, an
    undirected edge of weight w joins two cells co-mentioned by w
    docs (ops/spatial.comention_edges). Every node has degree >= 1 by
    construction (nodes ARE the edge endpoints; cells never
    co-mentioned aren't part of the graph), so there is no dangling
    mass and the rank sum converges to 1. Output (cell, rank) with rank floor-quantized to micro-units for
    stable downstream hashing; rows-only in the gate (iterative — no
    SQL twin), pinned by a single-process power-iteration pytest."""
    from .spatial import comention_edges

    edges = comention_edges(webpages_path, res=res).materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        a = b["cell_a"].to_numpy()
        c = b["cell_b"].to_numpy()
        w = b["n_docs"].to_numpy().astype(np.float64)
        cells = np.concatenate([a, c])
        ws = np.concatenate([w, w])
        order = np.argsort(cells, kind="stable")
        cells, ws = cells[order], ws[order]
        new = np.empty(len(cells), dtype=bool)
        if len(cells):
            new[0] = True
            new[1:] = cells[1:] != cells[:-1]
            st = np.flatnonzero(new)
            return pa.table({"cell": cells[st],
                             "w": np.add.reduceat(ws, st)})
        return pa.table({"cell": np.empty(0, np.int64),
                         "w": np.empty(0, np.float64)})

    deg_parts = [(t["cell"].to_numpy(), t["w"].to_numpy())
                 for t in edges.map_batches(
                     deg_partial, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow")]
    all_cells = np.unique(np.concatenate(
        [p[0] for p in deg_parts])) if deg_parts else np.empty(0, np.int64)
    n = len(all_cells)
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "cell": np.empty(0, np.int64),
            "rank_micro": np.empty(0, np.int64)}))
    id_of = {int(c): i for i, c in enumerate(all_cells)}
    deg = _fold(deg_parts, n, id_of)

    ranks = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        state = ray.put((all_cells, ranks / deg))

        def contrib(b: pa.Table, _ref=state) -> pa.Table:
            cells_v, share = ray.get(_ref)
            a = b["cell_a"].to_numpy()
            c = b["cell_b"].to_numpy()
            w = b["n_docs"].to_numpy().astype(np.float64)
            ia = np.searchsorted(cells_v, a)
            ic = np.searchsorted(cells_v, c)
            # undirected: each endpoint sends rank/deg * w to the other
            dst = np.concatenate([c, a])
            val = np.concatenate([share[ia] * w, share[ic] * w])
            order = np.argsort(dst, kind="stable")
            dst, val = dst[order], val[order]
            new = np.empty(len(dst), dtype=bool)
            new[0] = True
            new[1:] = dst[1:] != dst[:-1]
            st = np.flatnonzero(new)
            return pa.table({"cell": dst[st],
                             "v": np.add.reduceat(val, st)})

        parts = [(t["cell"].to_numpy(), t["v"].to_numpy())
                 for t in edges.map_batches(contrib, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow")]
        inflow = _fold(parts, n, id_of)
        ranks = (1.0 - damping) / n + damping * inflow

    return ray.data.from_arrow(pa.table({
        "cell": all_cells.astype(np.int64),
        "rank_micro": np.floor(ranks * 1e9).astype(np.int64)}))
