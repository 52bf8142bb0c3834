"""MVT <-> Arrow feature tables (the columnar data model of
SURVEY §1.2 / FIXTURES B3).

``tiles_to_feature_table`` explodes a batch of encoded tiles into one
Arrow row PER FEATURE:

    z:int32, x:int32, y:int32, layer:string, feature_id:uint64,
    geom_type:uint8 (1=point 2=linestring 3=polygon),
    geometry: list<list<struct<x:int32, y:int32>>>   (parts/rings),
    meta: map<string, struct<string_v:string, float_v:float,
          double_v:double, int_v:int64, uint_v:uint64, sint_v:int64,
          bool_v:bool>>

The 7-field struct mirrors Tile.Value exactly so the wire variant
survives columnar roundtrip (I64 5 != W64 5 != S64 5 — SURVEY §1.2).
Polygon rings are flattened in wire order (exterior, its holes, next
exterior, ...) — hole grouping is recomputable from the shoelace sign.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .decode import decode_tile_safe
from .model import BV, DO, FL, I64V, S64V, ST, W64V

VALUE_STRUCT = pa.struct([
    ("string_v", pa.string()), ("float_v", pa.float32()),
    ("double_v", pa.float64()), ("int_v", pa.int64()),
    ("uint_v", pa.uint64()), ("sint_v", pa.int64()), ("bool_v", pa.bool_()),
])
META_TYPE = pa.map_(pa.string(), VALUE_STRUCT)
GEOM_TYPE = pa.list_(pa.list_(pa.struct([("x", pa.int32()), ("y", pa.int32())])))

FEATURE_SCHEMA = pa.schema([
    ("z", pa.int32()), ("x", pa.int32()), ("y", pa.int32()),
    ("layer", pa.string()), ("layer_version", pa.int32()),
    ("layer_extent", pa.int32()), ("feature_id", pa.uint64()),
    ("geom_type", pa.uint8()), ("geometry", GEOM_TYPE),
    ("meta", META_TYPE), ("error", pa.string()),
])

_TAG_FIELD = {ST: "string_v", FL: "float_v", DO: "double_v", I64V: "int_v",
              W64V: "uint_v", S64V: "sint_v", BV: "bool_v"}


def _val_struct(val) -> dict:
    tag, v = val
    out = {f: None for f in ("string_v", "float_v", "double_v", "int_v",
                             "uint_v", "sint_v", "bool_v")}
    out[_TAG_FIELD[tag]] = v.decode("utf-8", errors="replace") if tag == ST else v
    return out


def _meta_items(meta: dict) -> list:
    return [(k.decode("utf-8", errors="replace"), _val_struct(v))
            for k, v in meta.items()]


_I32_MIN, _I32_MAX = -(2 ** 31), 2 ** 31 - 1


def _i32_checked(part) -> list:
    """One geometry part -> struct rows, raising ValueError when a
    cumsum'd coordinate exceeds int32 (legal on the wire as int32
    deltas, unrepresentable in the int32 columnar schema — caught
    per tile and turned into an error row)."""
    a = np.asarray(part)
    if a.size and (a.min() < _I32_MIN or a.max() > _I32_MAX):
        raise ValueError("accumulated coordinate beyond int32 range")
    return [{"x": int(px), "y": int(py)} for px, py in part]


def _parts(geom, geom_type: int) -> list:
    if geom_type == 1:  # points: one part holding all points
        return [_i32_checked(geom)]
    if geom_type == 2:  # linestrings: one part per segment
        return [_i32_checked(seg) for seg in geom]
    # polygons: rings flattened in wire order
    return [_i32_checked(ring) for rings in geom for ring in rings]


def tiles_to_feature_table(batch: pa.Table) -> pa.Table:
    """{z,x,y,mvt} rows -> per-feature rows (FEATURE_SCHEMA). Decode
    failures become one row with error set (row-level error channel,
    never an exception kill)."""
    rows = {name: [] for name in FEATURE_SCHEMA.names}

    def emit(z, x, y, layer, fid, gtype, geometry, meta, error,
             lversion=2, lextent=4096):
        rows["z"].append(z)
        rows["x"].append(x)
        rows["y"].append(y)
        rows["layer"].append(layer)
        rows["layer_version"].append(lversion)
        rows["layer_extent"].append(lextent)
        rows["feature_id"].append(fid)
        rows["geom_type"].append(gtype)
        rows["geometry"].append(geometry)
        rows["meta"].append(meta)
        rows["error"].append(error)

    for i in range(batch.num_rows):
        z = batch["z"][i].as_py()
        x = batch["x"][i].as_py()
        y = batch["y"][i].as_py()
        tile, err = decode_tile_safe(batch["mvt"][i].as_py())
        if tile is None:
            emit(z, x, y, None, 0, 0, [], [], err)
            continue
        mark = len(rows["z"])  # rollback point for per-tile isolation
        try:
            for name in sorted(tile.layers):
                layer = tile.layers[name]
                lname = name.decode("utf-8", errors="replace")
                for gtype, feats in ((1, layer.points), (2, layer.linestrings),
                                     (3, layer.polygons)):
                    for f in feats:
                        emit(z, x, y, lname, f.fid, gtype,
                             _parts(f.geometry, gtype), _meta_items(f.metadata),
                             None, layer.version, layer.extent)
        except (OverflowError, ValueError, pa.ArrowInvalid) as e:
            # e.g. cumsum'd coordinates beyond int32 — a legally
            # decodable tile the int32 columnar schema can't hold.
            # Row-level error channel: one error row, batch survives.
            for col in rows.values():
                del col[mark:]
            emit(z, x, y, None, 0, 0, [], [], f"{type(e).__name__}: {e}")

    return pa.table({
        "z": pa.array(rows["z"], pa.int32()),
        "x": pa.array(rows["x"], pa.int32()),
        "y": pa.array(rows["y"], pa.int32()),
        "layer": pa.array(rows["layer"], pa.string()),
        "layer_version": pa.array(rows["layer_version"], pa.int32()),
        "layer_extent": pa.array(rows["layer_extent"], pa.int32()),
        "feature_id": pa.array(rows["feature_id"], pa.uint64()),
        "geom_type": pa.array(rows["geom_type"], pa.uint8()),
        "geometry": pa.array(rows["geometry"], GEOM_TYPE),
        "meta": pa.array(rows["meta"], META_TYPE),
        "error": pa.array(rows["error"], pa.string()),
    })


def feature_table_to_tiles(table: pa.Table) -> pa.Table:
    """Inverse: per-feature rows -> encoded {z,x,y,mvt} (generic
    encoder; polygon hole re-grouping by shoelace sign)."""
    from .encode import encode_tile
    from .geometry import surveyor
    from .model import Feature, Layer, VectorTile

    df = table.to_pandas()
    out = {"z": [], "x": [], "y": [], "mvt": []}
    for (z, x, y), sub in df.groupby(["z", "x", "y"], sort=True):
        layers: dict = {}
        for _, r in sub.iterrows():
            if r["layer"] is None:
                continue
            name = r["layer"].encode("utf-8")
            layer = layers.setdefault(name, Layer(
                name=name, version=int(r["layer_version"]),
                extent=int(r["layer_extent"])))
            meta = {}
            for k, v in (r["meta"] or []):
                for tag, field in _TAG_FIELD.items():
                    if v[field] is not None:
                        val = v[field]
                        if tag == ST:
                            val = val.encode("utf-8")
                        elif tag == FL:
                            val = float(val)
                        meta[k.encode("utf-8")] = (tag, val)
                        break
            parts = [np.array([[p["x"], p["y"]] for p in part], dtype=np.int64)
                     for part in r["geometry"]]
            gt = int(r["geom_type"])
            if gt == 1:
                feat = Feature(int(r["feature_id"]), meta, parts[0])
                layer.points.append(feat)
            elif gt == 2:
                layer.linestrings.append(Feature(int(r["feature_id"]), meta, parts))
            else:
                polys: list = []
                for ring in parts:
                    if surveyor(ring) > 0 or not polys:
                        polys.append([ring])
                    else:
                        polys[-1].append(ring)
                layer.polygons.append(Feature(int(r["feature_id"]), meta, polys))
        out["z"].append(z)
        out["x"].append(x)
        out["y"].append(y)
        out["mvt"].append(encode_tile(VectorTile(layers)))
    return pa.table({
        "z": pa.array(out["z"], pa.int32()), "x": pa.array(out["x"], pa.int32()),
        "y": pa.array(out["y"], pa.int32()),
        "mvt": pa.array(out["mvt"], pa.binary()),
    })
