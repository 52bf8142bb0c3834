"""Flagship end-to-end pipeline: webpages parquet -> encoded MVT tiles.

Ray-Data-native composition (see stages.py for the stage graph). The
caller owns the Ray session (never ray.init here — driver contract).
"""

from __future__ import annotations

import pandas as pd
import ray
import ray.data

from ..geo.parse import GeoParser
from .encode_stage import MvtEncoder
from .stages import TileAssigner, build_base_rtree, merge_tile_partials, pack_tile_partials

DEFAULT_ZOOM = 12


def _pool_size(concurrency, frac: float = 0.33):
    """Default actor-pool size: an autoscaling (1, ~cpus*frac) range so
    three pools + read/write stages share the node without starving
    each other (see ray_guide 'Stateful stages')."""
    if concurrency is not None:
        return concurrency
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return (1, max(2, int(cpus * frac)))


def read_webpages(path: str, columns=("url", "text")) -> ray.data.Dataset:
    """Prune at the read: the flagship needs only url + text (html and
    lang stay in storage)."""
    return ray.data.read_parquet(path, columns=list(columns))


def geoparse(ds: ray.data.Dataset, *, concurrency=None, batch_size: int = 4096) -> ray.data.Dataset:
    """documents -> exploded mention rows (url, mention_idx, lon, lat).
    Actor pool so the master regex compiles once per actor."""
    return ds.map_batches(GeoParser, batch_format="pandas",
                          batch_size=batch_size, concurrency=_pool_size(concurrency))


def assign(ds: ray.data.Dataset, zoom: int = DEFAULT_ZOOM, *,
           concurrency=None, batch_size: int = 8192) -> ray.data.Dataset:
    """mention rows -> tile/cell assignments. The base-zoom R-tree is
    built once on the driver and broadcast via ray.put (read in each
    actor's __init__, not re-shipped per batch)."""
    rtree_ref = ray.put(build_base_rtree())
    return ds.map_batches(TileAssigner, batch_format="pandas",
                          batch_size=batch_size, concurrency=_pool_size(concurrency),
                          fn_constructor_kwargs={"zoom": zoom, "rtree_ref": rtree_ref})


def aggregate_tiles(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Two-phase tile aggregation: per-batch partial pack (no shuffle)
    then ONE groupby(z,x,y) shuffle over the packed partials."""
    packed = ds.map_batches(pack_tile_partials, batch_format="pyarrow")
    return packed.groupby(["z", "x", "y"]).map_groups(
        merge_tile_partials, batch_format="pyarrow")


def encode_tiles(ds: ray.data.Dataset, *, concurrency=None,
                 batch_size: int = 64, extent: int = 4096) -> ray.data.Dataset:
    """Packed tile rows -> {z,x,y,mvt,...} via the encoder actor pool."""
    return ds.map_batches(MvtEncoder, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=_pool_size(concurrency),
                          fn_constructor_kwargs={"extent": extent})


def tiles_pipeline(webpages_path: str, zoom: int = DEFAULT_ZOOM, *,
                   parse_concurrency=None, encode_concurrency=None) -> ray.data.Dataset:
    """Full pipeline, lazy — consume with write_parquet / iter_batches."""
    ds = read_webpages(webpages_path)
    ds = geoparse(ds, concurrency=parse_concurrency)
    ds = assign(ds, zoom)
    ds = aggregate_tiles(ds)
    return encode_tiles(ds, concurrency=encode_concurrency)


def assignments_pipeline(webpages_path: str, zoom: int = DEFAULT_ZOOM) -> ray.data.Dataset:
    """read -> geoparse -> assign (no aggregation): the join-output /
    tile-assignment rows the rule requires matching exactly."""
    ds = read_webpages(webpages_path)
    ds = geoparse(ds)
    return assign(ds, zoom)
