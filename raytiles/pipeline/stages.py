"""Ray Data stages for the tiling pipeline.

Stage graph (flagship, see pipeline.flagship):

  read_parquet(webpages, max(64, 4*cpus) blocks)  [columns pruned; block
                                                count scales with cluster]
    -> map_batches(parse, arrow)               [tasks; regex over the raw
                                                UTF-8 buffer, per-process cache]
    -> map_batches(assign, arrow)              [tasks; broadcast R-tree via
                                                ray.put, cached per process]
    -> map_batches(pack_tile_partials, arrow)  [per-batch partial aggregate,
                                                fat rows chunked at 512]
    -> groupby(tile-hash bucket).map_groups    [the ONE shuffle, bounded
       (merge_tile_partials)                    1024-key domain]
    -> map_batches(FastPointEncoder, arrow)    [vectorized encoder; tasks by
                                                default, actor pool opt-in]
    -> write_parquet / collect

The pack->groupby->merge split is the salted-two-phase aggregate of
SURVEY §4.2: per-batch packing collapses mention rows to one compact
row per (tile, batch) BEFORE the shuffle, the tile-hash bucket spreads
dense cities across reducers tile-by-tile, and the 512-feature row cap
keeps any single reducer block's payload bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..geo import tilemath as tm
from ..geo.rtree import PackedRTree

RTREE_BASE_ZOOM = 6  # the broadcast R-tree indexes tile boundaries at this zoom


def build_base_rtree(base_zoom: int = RTREE_BASE_ZOOM) -> tuple[PackedRTree, np.ndarray, np.ndarray]:
    """R-tree over ALL tile boundaries at base_zoom (built once on the
    driver, ray.put, read in every assigner's __init__)."""
    n = 1 << base_zoom
    tx, ty = np.meshgrid(np.arange(n), np.arange(n))
    tx, ty = tx.ravel(), ty.ravel()
    boxes = tm.tile_bounds(base_zoom, tx, ty)
    return PackedRTree(boxes), tx.astype(np.int32), ty.astype(np.int32)


class TileAssigner:
    """Stateful assignment stage: holds the broadcast R-tree of
    base-zoom tile boundaries (loaded once per actor in __init__) and
    assigns each mention to its XYZ tile + tile-local coords + the
    cell-index hierarchy res 0-9.

    The R-tree prunes candidate base tiles (vectorized containment);
    exact assignment is the floor arithmetic of tilemath (boundary
    points land in exactly one tile), then refined base->target zoom.
    """

    def __init__(self, zoom: int, rtree_ref=None, extent: int = tm.DEFAULT_EXTENT,
                 with_cells: bool = True) -> None:
        self.zoom = zoom
        self.extent = extent
        self.with_cells = with_cells  # cell_r0..r9 cost 10 int64 cols; skip when unused
        if rtree_ref is not None:
            import ray
            self.rtree, self.base_tx, self.base_ty = ray.get(rtree_ref)
        else:
            self.rtree, self.base_tx, self.base_ty = build_base_rtree()

    def _assign(self, lon: np.ndarray, lat: np.ndarray):
        # coarse: R-tree candidates at base zoom; exact: floor math
        bx, by = tm.lonlat_to_tile(lon, lat, RTREE_BASE_ZOOM)
        pi, bi = self.rtree.query_points(lon, lat)
        ok = (self.base_tx[bi] == bx[pi]) & (self.base_ty[bi] == by[pi])
        # every point must have its floor-tile among the R-tree hits
        covered = np.zeros(lon.size, dtype=bool)
        covered[pi[ok]] = True
        if not covered.all():
            missing = int((~covered).sum())
            raise AssertionError(f"R-tree missed {missing} points vs floor assignment")
        x, y = tm.lonlat_to_tile(lon, lat, self.zoom)
        lx, ly = tm.lonlat_to_local(lon, lat, self.zoom, x, y, self.extent)
        return x, y, lx, ly

    def __call__(self, batch):
        """pa.Table (preferred: the url column passes through without
        ever materializing Python strings) or pd.DataFrame; output
        type matches input."""
        is_arrow = isinstance(batch, pa.Table)
        lon = batch["lon"].to_numpy()
        lat = batch["lat"].to_numpy()
        x, y, lx, ly = self._assign(lon, lat)
        if is_arrow:
            cols = {
                "url": batch["url"],
                "mention_idx": pa.array(
                    batch["mention_idx"].to_numpy().astype(np.int32), pa.int32()),
                "lon": pa.array(lon, pa.float64()),
                "lat": pa.array(lat, pa.float64()),
            }
            if self.with_cells:
                for r in range(10):
                    cols[f"cell_r{r}"] = pa.array(tm.cell_id(lon, lat, r), pa.int64())
            cols["z"] = pa.array(np.full(lon.size, self.zoom, np.int32), pa.int32())
            cols["x"] = pa.array(x, pa.int32())
            cols["y"] = pa.array(y, pa.int32())
            cols["local_x"] = pa.array(lx, pa.int32())
            cols["local_y"] = pa.array(ly, pa.int32())
            return pa.table(cols)
        out = pd.DataFrame({
            "url": batch["url"].to_numpy(),
            "mention_idx": batch["mention_idx"].to_numpy().astype(np.int32),
            "lon": lon, "lat": lat,
        })
        if self.with_cells:
            for r in range(10):
                out[f"cell_r{r}"] = tm.cell_id(lon, lat, r)
        out["z"] = np.int32(self.zoom)
        out["x"] = x
        out["y"] = y
        out["local_x"] = lx
        out["local_y"] = ly
        return out


_ASSIGNER_CACHE: dict = {}


def make_assign_fn(zoom: int, rtree_ref, extent: int = tm.DEFAULT_EXTENT,
                   with_cells: bool = True):
    """Task-based assignment: the broadcast R-tree (ray.put once on
    the driver) is ray.get + built ONCE PER WORKER PROCESS via a
    module-level cache, then every task on that worker reuses it —
    the broadcast-small-side pattern without actor-pool spin-up.

    The cache holds ONE entry (replaced when the key — which embeds
    the per-execution broadcast ObjectRef — changes): per-execution
    refs must not accumulate entries that pin stale R-trees in the
    object store for the worker's lifetime."""
    key = (zoom, extent, with_cells, rtree_ref.hex() if rtree_ref is not None else None)

    def assign_batch(batch: pd.DataFrame) -> pd.DataFrame:
        entry = _ASSIGNER_CACHE.get("assign")
        if entry is None or entry[0] != key:
            entry = (key, TileAssigner(zoom, rtree_ref, extent, with_cells))
            _ASSIGNER_CACHE["assign"] = entry
        return entry[1](batch)

    return assign_batch


# ---------------------------------------------------------------------------
# two-phase tile aggregation
# ---------------------------------------------------------------------------

COARSE_SHIFT = 4   # coarse cells (kept for the checkpointed job's layout)
N_MERGE_BUCKETS = 1024  # phase-2 shuffle key domain (bounded group count).
                        # Finer domains were measured and DON'T help: the
                        # merge straggler is the single hottest city tile
                        # (one tile must encode in one task), and 4x more
                        # buckets just adds 3k extra map_groups calls


def tile_bucket(z: np.ndarray, x: np.ndarray, y: np.ndarray,
                n_buckets: int = N_MERGE_BUCKETS) -> np.ndarray:
    """Deterministic bucket of a TILE (splitmix-style integer mix —
    never Python hash()). Groupby on this key gives a BOUNDED number
    of shuffle groups regardless of tile count (constant per-group
    scheduling overhead), and hashing at tile granularity is the skew
    salt: a dense city spreads across buckets tile-by-tile instead of
    landing one mega-group on a single reducer (bucketing by 16x16
    coarse cell measured a 2.4s straggler task at sfbig; by tile the
    bucket loads are near-uniform)."""
    k = ((z.astype(np.int64) << np.int64(52))
         | (x.astype(np.int64) << np.int64(26)) | y.astype(np.int64)).astype(np.uint64)
    k = (k ^ (k >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    k ^= k >> np.uint64(33)
    return (k % np.uint64(n_buckets)).astype(np.int64)


coarse_bucket = tile_bucket  # back-compat alias


_PARTIAL_SCHEMA = pa.schema([
    ("bucket", pa.int64()),
    ("z", pa.int32()), ("cx", pa.int32()), ("cy", pa.int32()),
    ("x", pa.list_(pa.int32())), ("y", pa.list_(pa.int32())),
    ("urls", pa.list_(pa.string())),
    ("mention_idx", pa.list_(pa.int32())),
    ("local_x", pa.list_(pa.int32())),
    ("local_y", pa.list_(pa.int32())),
])


def _list_col(values, offsets, typ) -> pa.ListArray:
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                    pa.array(values, typ))


def pack_tile_partials(batch: pa.Table) -> pa.Table:
    """Phase 1 (no shuffle): collapse mention rows to one packed row
    per TILE per batch — list columns of the payload. The later
    shuffle then moves one compact row per (tile, input block) instead
    of individual mention rows; grouping key is the bounded tile-hash
    bucket (see tile_bucket)."""
    if batch.num_rows == 0:
        return _PARTIAL_SCHEMA.empty_table()
    z = batch["z"].to_numpy()
    x = batch["x"].to_numpy()
    y = batch["y"].to_numpy()
    order = np.lexsort((y, x, z))
    z, x, y = z[order], x[order], y[order]
    key_change = np.empty(len(z), dtype=bool)
    key_change[0] = True
    key_change[1:] = (z[1:] != z[:-1]) | (x[1:] != x[:-1]) | (y[1:] != y[:-1])
    starts = np.flatnonzero(key_change)
    # chunk fat tiles: cap each packed row at MAX_PACK features so the
    # sort's range-partitioned blocks carry bounded payload per row
    # (a mega-tile otherwise lands one fat row on one reducer block —
    # the straggler the salted-two-phase design exists to kill; the
    # merge step accepts any number of partial rows per tile)
    MAX_PACK = 512
    run_ends = np.concatenate([starts[1:], [len(z)]])
    run_lens = run_ends - starts
    fat = np.flatnonzero(run_lens > MAX_PACK)
    if fat.size:
        extra = []
        for i in fat:
            extra.append(np.arange(starts[i] + MAX_PACK, run_ends[i], MAX_PACK))
        starts = np.sort(np.concatenate([starts] + extra))
    offsets = np.concatenate([starts, [len(z)]]).astype(np.int32)
    urls = batch["urls" if "urls" in batch.column_names else "url"] \
        .combine_chunks().take(pa.array(order))
    return pa.table({
        "bucket": pa.array(tile_bucket(z[starts], x[starts], y[starts]), pa.int64()),
        "z": pa.array(z[starts], pa.int32()),
        "cx": pa.array(x[starts] >> COARSE_SHIFT, pa.int32()),
        "cy": pa.array(y[starts] >> COARSE_SHIFT, pa.int32()),
        "x": _list_col(x, offsets, pa.int32()),
        "y": _list_col(y, offsets, pa.int32()),
        "urls": pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), urls),
        "mention_idx": _list_col(
            batch["mention_idx"].to_numpy()[order], offsets, pa.int32()),
        "local_x": _list_col(batch["local_x"].to_numpy()[order], offsets, pa.int32()),
        "local_y": _list_col(batch["local_y"].to_numpy()[order], offsets, pa.int32()),
    })


def merge_tile_partials(group: pa.Table) -> pa.Table:
    """Phase 2 (after the shuffle): flatten partial rows and re-split
    into one packed row PER TILE, features sorted (url, mention_idx).
    The multi-key sort runs Arrow-native (pc.sort_indices on the
    flattened table) so url strings never materialize as Python
    objects — the string column moves zero-copy from flatten to take
    to the output list array.

    Runs per BLOCK, not per bucket group (map_batches(batch_size=None)
    after the shuffle): correctness needs only that all partials of a
    tile share a block, which both shuffle paths guarantee — the sort
    never splits equal keys across partition boundaries (Ray's own
    map_groups applies per-block group boundaries on that same
    invariant) and hash partitioning is a pure function of the key.
    Tiles are disjoint across buckets, so merging a multi-bucket block
    in one vectorized pass is equivalent to per-group calls without
    the ~0.2-0.5ms-per-group map_groups overhead x 1024 groups."""
    n_per_row = pc.list_value_length(group["x"]).to_numpy()
    flat = pa.table({
        "z": pa.array(np.repeat(group["z"].to_numpy(), n_per_row), pa.int32()),
        "x": pc.list_flatten(group["x"]),
        "y": pc.list_flatten(group["y"]),
        "urls": pc.list_flatten(group["urls"]),
        "mention_idx": pc.list_flatten(group["mention_idx"]),
        "local_x": pc.list_flatten(group["local_x"]),
        "local_y": pc.list_flatten(group["local_y"]),
    })
    order = pc.sort_indices(flat, sort_keys=[
        ("z", "ascending"), ("x", "ascending"), ("y", "ascending"),
        ("urls", "ascending"), ("mention_idx", "ascending")])
    t = flat.take(order)
    z = t["z"].to_numpy()
    x = t["x"].to_numpy()
    y = t["y"].to_numpy()
    key_change = np.empty(len(x), dtype=bool)
    key_change[0] = True
    key_change[1:] = (z[1:] != z[:-1]) | (x[1:] != x[:-1]) | (y[1:] != y[:-1])
    starts = np.flatnonzero(key_change)
    offsets = pa.array(np.concatenate([starts, [len(x)]]).astype(np.int32), pa.int32())
    return pa.table({
        "z": pa.array(z[starts], pa.int32()),
        "x": pa.array(x[starts], pa.int32()),
        "y": pa.array(y[starts], pa.int32()),
        "urls": pa.ListArray.from_arrays(offsets, t["urls"].combine_chunks()),
        "mention_idx": pa.ListArray.from_arrays(offsets, t["mention_idx"].combine_chunks()),
        "local_x": pa.ListArray.from_arrays(offsets, t["local_x"].combine_chunks()),
        "local_y": pa.ListArray.from_arrays(offsets, t["local_y"].combine_chunks()),
    })
