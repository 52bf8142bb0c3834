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
    out = np.zeros(n_ids, vals.dtype)  # int partials stay int (exact)
    if len(idx):
        new = np.empty(len(idx), dtype=bool)
        new[0] = True
        new[1:] = idx[1:] != idx[:-1]
        st = np.flatnonzero(new)
        out[idx[st]] = np.add.reduceat(vals, st)
    return out


def cell_triangles(webpages_path: str, res: int = 5) -> ray.data.Dataset:
    """Triangle counting over the co-mention cell graph — the
    edge-iterator algorithm with a BROADCAST forward-adjacency CSR.

    For each edge (a, b) with a < b, the triangles it closes are the
    common members of N+(a) and N+(b), where N+(v) = neighbors of v
    greater than v (forward adjacency). Intersecting FORWARD lists
    counts each triangle {a < b < c} exactly once, anchored at its
    smallest-vertex edge.

    Scale shape: like cell_pagerank, the graph is the BOUNDED
    pre-aggregated co-mention edge table (a reduction of the corpus,
    not the corpus), so the CSR is model-sized and ships once via
    ray.put; the count pass is one shuffle-free map over edge batches.
    Per batch, both sides' (edge, candidate-c) pair sets expand as
    ragged arrays and intersect via ONE np.isin over composite keys +
    bincount — work is sum-of-degrees over the batch's edges (the
    textbook edge-iterator bound), no per-row Python. For graphs whose
    edge set exceeds broadcast budget, the standard fallback is vertex
    partitioning; documented, not needed at the bounded cell domain.

    Output: (cell_a, cell_b, n_tri) for every edge on >= 1 triangle —
    exact integers, SQL-twin-checkable (three-way self-join)."""
    from .spatial import comention_edges

    edges = comention_edges(webpages_path, res=res).materialize()

    # driver fold of the bounded edge set -> forward-adjacency CSR
    parts = [(t["cell_a"].to_numpy(), t["cell_b"].to_numpy())
             for t in edges.iter_batches(batch_format="pyarrow")]
    empty = pa.table({"cell_a": np.empty(0, np.int64),
                      "cell_b": np.empty(0, np.int64),
                      "n_tri": np.empty(0, np.int64)})
    if not parts:
        return ray.data.from_arrow(empty)
    ea = np.concatenate([p[0] for p in parts])
    eb = np.concatenate([p[1] for p in parts])
    nodes = np.unique(np.concatenate([ea, eb]))
    n = len(nodes)
    ia = np.searchsorted(nodes, ea)
    ib = np.searchsorted(nodes, eb)
    order = np.lexsort((ib, ia))
    ia, ib = ia[order], ib[order]          # forward lists, sorted
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, ia + 1, 1)
    np.cumsum(indptr, out=indptr)
    csr_ref = ray.put((nodes, indptr, ib))

    def count(b: pa.Table, _ref=csr_ref) -> pa.Table:
        nodes_v, ptr, adj = ray.get(_ref)
        a = np.searchsorted(nodes_v, b["cell_a"].to_numpy())
        c = np.searchsorted(nodes_v, b["cell_b"].to_numpy())
        da = ptr[a + 1] - ptr[a]
        db = ptr[c + 1] - ptr[c]
        ne = len(a)
        # ragged (edge, candidate) expansion for both endpoints
        def expand(starts, lens):
            tot = int(lens.sum())
            eid = np.repeat(np.arange(ne), lens)
            idx = (np.arange(tot, dtype=np.int64)
                   - np.repeat(np.cumsum(lens) - lens, lens)
                   + np.repeat(starts, lens))
            return eid, adj[idx]
        eid_a, ca = expand(ptr[a], da)
        eid_b, cb = expand(ptr[c], db)
        # composite key (edge, candidate): both sides' lists are
        # sorted and duplicate-free per edge
        ka = eid_a * np.int64(n) + ca
        kb = eid_b * np.int64(n) + cb
        hit = np.isin(ka, kb, assume_unique=True)
        n_tri = np.bincount(eid_a[hit], minlength=ne).astype(np.int64)
        keep = n_tri > 0
        return pa.table({
            "cell_a": b["cell_a"].to_numpy()[keep],
            "cell_b": b["cell_b"].to_numpy()[keep],
            "n_tri": n_tri[keep]})

    return edges.map_batches(count, batch_format="pyarrow")


def cell_pagerank(webpages_path: str, res: int = 5,
                  damping: float = 0.85,
                  n_iters: int = 10) -> ray.data.Dataset:
    """PageRank over cells: nodes are res-``res`` grid cells, an
    undirected edge of weight w joins two cells co-mentioned by w
    docs (ops/spatial.comention_edges). Every node has degree >= 1 by
    construction (nodes ARE the edge endpoints; cells never
    co-mentioned aren't part of the graph), so there is no dangling
    mass and the rank sum converges to 1.

    EXACT-TWIN iteration (r4): the rank state is INT64 nano-units and
    every edge contribution floors to INT64 pico-units BEFORE any sum,
    so each power iteration is an order-free integer matrix-vector
    product and the DuckDB twin (pagerank_sql — the iteration UNROLLED
    as one CTE per step) reproduces rank_micro bit-exactly. The
    quantization error per step is < 1e-12 per edge — far below the
    power-iteration convergence tolerance — and buys full driver-hash
    verifiability for an iterative algorithm."""
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
    deg = _fold(deg_parts, n, id_of)  # int-valued weights: exact
    degf = deg.astype(np.float64)

    rq = np.full(n, int(np.floor(1e9 / n)), np.int64)
    for _ in range(n_iters):
        share = (rq.astype(np.float64) / 1e9) / degf
        state = ray.put((all_cells, share))

        def contrib(b: pa.Table, _ref=state) -> pa.Table:
            cells_v, share_v = ray.get(_ref)
            a = b["cell_a"].to_numpy()
            c = b["cell_b"].to_numpy()
            w = b["n_docs"].to_numpy().astype(np.float64)
            ia = np.searchsorted(cells_v, a)
            ic = np.searchsorted(cells_v, c)
            # undirected: each endpoint sends rank/deg * w to the
            # other — floored to INT64 pico-units PER EDGE so every
            # downstream sum is order-free exact (the twin floors the
            # identical double expression)
            dst = np.concatenate([c, a])
            val = np.concatenate([
                np.floor(share_v[ia] * w * 1e12),
                np.floor(share_v[ic] * w * 1e12)]).astype(np.int64)
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
        rq = np.floor(((1.0 - damping) / n
                       + damping * (inflow.astype(np.float64) / 1e12))
                      * 1e9).astype(np.int64)

    return ray.data.from_arrow(pa.table({
        "cell": all_cells.astype(np.int64),
        "rank_micro": rq}))
