"""Ray Data stages for the tiling pipeline.

Stage graph (flagship, see pipeline.flagship):

  read_parquet(webpages)                       [columns pruned]
    -> map_batches(GeoParser, pandas)          [stateless-ish actor pool]
    -> map_batches(TileAssigner, pandas)       [actor pool; broadcast R-tree]
    -> map_batches(pack_tile_partials, arrow)  [per-batch partial aggregate]
    -> groupby(z,x,y).map_groups(merge)        [the ONE shuffle]
    -> map_batches(MvtEncoder, arrow)          [stateful encoder actor pool]
    -> write_parquet / collect

The pack->groupby->merge split is the salted-two-phase aggregate of
SURVEY §4.2: per-batch packing collapses mention rows to one compact
row per (tile, batch) BEFORE the shuffle, so the all-to-all exchange
moves packed coordinate arrays, not individual mention rows, and a
mega-tile's data arrives as a handful of partial rows that merge
cheaply.
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

    def __init__(self, zoom: int, rtree_ref=None, extent: int = tm.DEFAULT_EXTENT) -> None:
        self.zoom = zoom
        self.extent = extent
        if rtree_ref is not None:
            import ray
            self.rtree, self.base_tx, self.base_ty = ray.get(rtree_ref)
        else:
            self.rtree, self.base_tx, self.base_ty = build_base_rtree()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        lon = batch["lon"].to_numpy()
        lat = batch["lat"].to_numpy()
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
        out = pd.DataFrame({
            "url": batch["url"].to_numpy(),
            "mention_idx": batch["mention_idx"].to_numpy().astype(np.int32),
            "lon": lon, "lat": lat,
        })
        for r in range(10):
            out[f"cell_r{r}"] = tm.cell_id(lon, lat, r)
        out["z"] = np.int32(self.zoom)
        out["x"] = x
        out["y"] = y
        out["local_x"] = lx
        out["local_y"] = ly
        return out


# ---------------------------------------------------------------------------
# two-phase tile aggregation
# ---------------------------------------------------------------------------

_PARTIAL_SCHEMA = pa.schema([
    ("z", pa.int32()), ("x", pa.int32()), ("y", pa.int32()),
    ("urls", pa.list_(pa.string())),
    ("mention_idx", pa.list_(pa.int32())),
    ("local_x", pa.list_(pa.int32())),
    ("local_y", pa.list_(pa.int32())),
])


def pack_tile_partials(batch: pa.Table) -> pa.Table:
    """Phase 1 (no shuffle): collapse mention rows to one packed row
    per tile PER BATCH — list columns of the per-tile payload."""
    if batch.num_rows == 0:
        return _PARTIAL_SCHEMA.empty_table()
    idx = pc.sort_indices(batch, sort_keys=[("z", "ascending"), ("x", "ascending"),
                                            ("y", "ascending")])
    t = batch.take(idx)
    z = t["z"].to_numpy()
    x = t["x"].to_numpy()
    y = t["y"].to_numpy()
    key_change = np.empty(len(z), dtype=bool)
    key_change[0] = True
    key_change[1:] = (z[1:] != z[:-1]) | (x[1:] != x[:-1]) | (y[1:] != y[:-1])
    starts = np.flatnonzero(key_change)
    offsets = np.concatenate([starts, [len(z)]]).astype(np.int32)

    def as_list(col_name, typ):
        vals = t[col_name].combine_chunks()
        return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals.cast(typ))

    return pa.table({
        "z": pa.array(z[starts], pa.int32()),
        "x": pa.array(x[starts], pa.int32()),
        "y": pa.array(y[starts], pa.int32()),
        "urls": as_list("url", pa.string()),
        "mention_idx": as_list("mention_idx", pa.int32()),
        "local_x": as_list("local_x", pa.int32()),
        "local_y": as_list("local_y", pa.int32()),
    })


def merge_tile_partials(group: pa.Table) -> pa.Table:
    """Phase 2 (after the groupby(z,x,y) shuffle): concatenate the
    packed partial payloads of one tile into a single row, features
    sorted by (url, mention_idx) for deterministic output."""
    urls = pc.list_flatten(group["urls"]).to_pandas().to_numpy()
    midx = pc.list_flatten(group["mention_idx"]).to_numpy()
    lx = pc.list_flatten(group["local_x"]).to_numpy()
    ly = pc.list_flatten(group["local_y"]).to_numpy()
    order = np.lexsort((midx, urls))
    n = len(order)
    offsets = pa.array(np.array([0, n], dtype=np.int32), pa.int32())
    return pa.table({
        "z": group["z"][:1], "x": group["x"][:1], "y": group["y"][:1],
        "urls": pa.ListArray.from_arrays(offsets, pa.array(urls[order], pa.string())),
        "mention_idx": pa.ListArray.from_arrays(offsets, pa.array(midx[order], pa.int32())),
        "local_x": pa.ListArray.from_arrays(offsets, pa.array(lx[order], pa.int32())),
        "local_y": pa.ListArray.from_arrays(offsets, pa.array(ly[order], pa.int32())),
    })
