"""Trajectory tiles: per (tile, url) linestrings through the GENERIC
MVT encoder — the distributed exercise of the LineString command path
(MoveTo/LineTo with cursor carry, codec.geometry.encode_linestrings).

A document mentioning several places draws a polyline through them
(mention_idx order). Features: one LINESTRING per url with >= 2
mentions in the tile, metadata {url: St, n_points: I64}; urls with a
single mention in the tile are skipped (MVT linestrings need >= 2
points). Reuses the flagship's packed aggregation (same shuffle), so
the only new stage is the per-tile feature build + generic encode.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..codec.encode import encode_tile
from ..codec.model import I64V, ST, Feature, Layer, VectorTile
from .flagship import aggregate_tiles, assign, geoparse, read_webpages

LAYER = b"trajectories"


def encode_trajectories(batch: pa.Table) -> pa.Table:
    out = {"z": [], "x": [], "y": [], "mvt": [], "n_lines": []}
    for i in range(batch.num_rows):
        urls = batch["urls"][i].as_py()
        midx = batch["mention_idx"][i].values.to_numpy()
        lx = batch["local_x"][i].values.to_numpy()
        ly = batch["local_y"][i].values.to_numpy()
        # rows are sorted (url, mention_idx) by the merge step
        feats = []
        j = 0
        n = len(urls)
        fid = 0
        while j < n:
            k = j
            while k < n and urls[k] == urls[j]:
                k += 1
            if k - j >= 2:
                pts = np.stack([lx[j:k], ly[j:k]], axis=1).astype(np.int64)
                feats.append(Feature(
                    fid=fid,
                    metadata={b"url": (ST, urls[j].encode("utf-8")),
                              b"n_points": (I64V, int(k - j))},
                    geometry=[pts]))
                fid += 1
            j = k
        if not feats:
            continue
        layer = Layer(name=LAYER, version=2, extent=4096, linestrings=feats)
        out["z"].append(batch["z"][i].as_py())
        out["x"].append(batch["x"][i].as_py())
        out["y"].append(batch["y"][i].as_py())
        out["mvt"].append(encode_tile(VectorTile({LAYER: layer})))
        out["n_lines"].append(len(feats))
    return pa.table({
        "z": pa.array(out["z"], pa.int32()), "x": pa.array(out["x"], pa.int32()),
        "y": pa.array(out["y"], pa.int32()),
        "mvt": pa.array(out["mvt"], pa.binary()),
        "n_lines": pa.array(out["n_lines"], pa.int64()),
    })


def trajectories_pipeline(webpages_path: str, zoom: int = 6) -> ray.data.Dataset:
    """Low zoom (z=6 tile ~ 600 km) so multi-mention documents usually
    land their mentions in one tile."""
    ds = read_webpages(webpages_path)
    ds = geoparse(ds)
    ds = assign(ds, zoom, with_cells=False)
    merged = aggregate_tiles(ds)
    return merged.map_batches(encode_trajectories, batch_format="pyarrow",
                              batch_size=1024)
