"""MVT encoder actor-pool stage: packed tile rows -> encoded tiles.

A callable class for ``map_batches(MvtEncoder, batch_format="pyarrow",
concurrency=N)`` — per-actor state (reused scratch buffers, layer
template) set up once in __init__, per-batch work vectorized per tile
(the per-tile command/varint assembly is numpy; the Python loop is
over tiles in the batch, each of which is an independent MVT message
by construction — no cross-tile state exists in the codec, mirroring
the reference's per-tile purity, SURVEY §3.2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..codec.encode import encode_tile
from ..codec.fastpoint import encode_point_tiles
from ..codec.model import I64V, ST, Feature, Layer, VectorTile

LAYER_NAME = b"mentions"


class MvtEncoder:
    """Packed tile rows {z,x,y, urls:list<str>, mention_idx:list<i32>,
    local_x:list<i32>, local_y:list<i32>} -> {z,x,y,mvt:binary,
    n_features:int64,n_layers:int32}."""

    def __init__(self, extent: int = 4096, layer_version: int = 2) -> None:
        self.extent = extent
        self.version = layer_version

    def encode_one(self, urls, midx, lx, ly) -> bytes:
        feats = []
        for i in range(len(urls)):
            feats.append(Feature(
                fid=i,
                metadata={b"url": (ST, urls[i]),
                          b"mention_idx": (I64V, int(midx[i]))},
                geometry=np.array([[lx[i], ly[i]]], dtype=np.int64),
            ))
        layer = Layer(name=LAYER_NAME, version=self.version,
                      extent=self.extent, points=feats)
        return encode_tile(VectorTile({LAYER_NAME: layer}))

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        mvts = []
        n_features = np.empty(n, dtype=np.int64)
        urls_col = batch["urls"]
        midx_col = batch["mention_idx"]
        lx_col = batch["local_x"]
        ly_col = batch["local_y"]
        for i in range(n):
            urls = [u.encode("utf-8") for u in urls_col[i].as_py()]
            midx = midx_col[i].values.to_numpy()
            lx = lx_col[i].values.to_numpy()
            ly = ly_col[i].values.to_numpy()
            mvts.append(self.encode_one(urls, midx, lx, ly))
            n_features[i] = len(urls)
        return pa.table({
            "z": batch["z"], "x": batch["x"], "y": batch["y"],
            "mvt": pa.array(mvts, pa.binary()),
            "n_features": pa.array(n_features, pa.int64()),
            "n_layers": pa.array(np.ones(n, dtype=np.int32), pa.int32()),
        })


class FastPointEncoder:
    """Batch-vectorized encoder for the flagship's point layers: ONE
    numpy pass encodes every tile in the batch (codec.fastpoint),
    byte-identical to MvtEncoder. Stateful actor per ray_guide: setup
    (constants, buffers) once per actor."""

    def __init__(self, extent: int = 4096, layer_version: int = 2) -> None:
        self.extent = extent
        self.version = layer_version

    def __call__(self, batch: pa.Table) -> pa.Table:
        # NOTE: no lazy raytiles imports here — this body runs on ray
        # workers where only the pickled-by-value module graph exists
        n = batch.num_rows
        if n == 0:
            return pa.table({"z": pa.array([], pa.int32()), "x": pa.array([], pa.int32()),
                             "y": pa.array([], pa.int32()), "mvt": pa.array([], pa.binary()),
                             "n_features": pa.array([], pa.int64()),
                             "n_layers": pa.array([], pa.int32())})
        lengths = pc.list_value_length(batch["urls"]).to_numpy().astype(np.int64)
        tile_offsets = np.concatenate([[0], np.cumsum(lengths)])
        urls = pc.list_flatten(batch["urls"])  # stays Arrow: zero Python strings
        midx = pc.list_flatten(batch["mention_idx"]).to_numpy()
        lx = pc.list_flatten(batch["local_x"]).to_numpy()
        ly = pc.list_flatten(batch["local_y"]).to_numpy()
        mvts = encode_point_tiles(tile_offsets, urls, midx, lx, ly,
                                  extent=self.extent, version=self.version)
        return pa.table({
            "z": batch["z"], "x": batch["x"], "y": batch["y"],
            "mvt": pa.array(mvts, pa.binary()),
            "n_features": pa.array(lengths, pa.int64()),
            "n_layers": pa.array(np.ones(n, dtype=np.int32), pa.int32()),
        })
