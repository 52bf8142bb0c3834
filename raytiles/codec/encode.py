"""High-level VectorTile -> MVT bytes.

From-scratch reimplementation of the reference encode path (`untile`,
lib/Geography/VectorTile.hs:74-75; `toProtobuf` instances +
`totalMeta`/`unfeats`, lib/Geography/VectorTile/Internal.hs:101-143,
321-344), emitting the exact wire layout of the reference's generated
writers:

- Layer field emission order: name(tag 10), features(18), keys(26),
  values(34), extent(40), version(120 LAST) — Layer.hs:51-55.
- Feature field order: id(8, ALWAYS written, even 0 — Internal.hs:339),
  tags(18, packed, omitted when empty), type(24), geometry(34, packed)
  — Feature.hs:37-40.
- Value field tags: string 10, float 21, double 25, int 32, uint 40,
  sint 48 (zigzag64), bool 56 — Value.hs:53-57.
- Tile: repeated field 3 (tag 26) of Layer messages — Tile.hs:56.
- Feature order within a layer: points, then linestrings, then
  polygons (Internal.hs:123-125).

Determinism choices where the reference is HashMap-ordered (arbitrary):
- layers are emitted sorted by name (reference: HashMap.elems order,
  Internal.hs:101-102);
- key/value dictionaries are built in first-appearance order over the
  features (reference: HashSet order, Internal.hs:321-329).
Both are deterministic supersets: the reference's own conformance test
is the decode->encode fixpoint, not raw-byte equality (Test.hs:93-96).
"""

from __future__ import annotations

import numpy as np

from . import wire
from .fastpoint import _varint_lengths
from .geometry import (
    GEOM_LINESTRING, GEOM_POINT, GEOM_POLYGON,
    encode_linestrings, encode_linestrings_batch, encode_points,
    encode_points_batch, encode_polygons, encode_polygons_batch,
)
from .model import BV, DO, FL, I64V, S64V, ST, W64V, Feature, Layer, VectorTile


def _encode_value(val) -> bytes:
    tag, v = val
    out: list[bytes] = []
    if tag == ST:
        wire.put_len_field(out, 1, v if isinstance(v, bytes) else str(v).encode("utf-8"))
    elif tag == FL:
        wire.put_float_field(out, 2, v)
    elif tag == DO:
        wire.put_double_field(out, 3, v)
    elif tag == I64V:
        wire.put_varint_field(out, 4, wire.int64_to_u64(int(v)))
    elif tag == W64V:
        wire.put_varint_field(out, 5, int(v))
    elif tag == S64V:
        n = int(v)
        wire.put_varint_field(out, 6, ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF)
    elif tag == BV:
        wire.put_varint_field(out, 7, 1 if v else 0)
    else:
        raise ValueError(f"unknown Val tag: {tag!r}")
    return b"".join(out)


def _geometry_commands(geom_type: int, geometry) -> np.ndarray:
    if geom_type == GEOM_POINT:
        return encode_points(geometry)
    if geom_type == GEOM_LINESTRING:
        return encode_linestrings(geometry)
    if geom_type == GEOM_POLYGON:
        return encode_polygons(geometry)
    raise ValueError(f"unknown geom type {geom_type}")


def _encode_feature(feature: Feature, geom_type: int,
                    key_index: dict, val_index: dict,
                    geom_payload: bytes) -> bytes:
    """`unfeats` (Internal.hs:332-344). ``geom_payload`` is the
    feature's pre-encoded packed geometry bytes (whole-layer batched
    varint encode — see encode_layer)."""
    out: list[bytes] = []
    wire.put_varint_field(out, 1, int(feature.fid))  # id always written
    if feature.metadata:
        tags = np.empty(2 * len(feature.metadata), dtype=np.uint32)
        for i, (k, v) in enumerate(feature.metadata.items()):
            tags[2 * i] = key_index[k]
            tags[2 * i + 1] = val_index[v]
        wire.put_packed_field(out, 2, tags)
    wire.put_varint_field(out, 3, geom_type)
    if geom_payload:  # packed field omitted entirely when empty
        wire.put_len_field(out, 4, geom_payload)
    return b"".join(out)


def total_meta(layer: Layer) -> tuple[list, list]:
    """Distinct keys / distinct values across all features of a layer,
    first-appearance order (reference `totalMeta`, Internal.hs:321-329,
    with a fixed deterministic order instead of HashSet order)."""
    keys: dict = {}
    vals: dict = {}
    for group in (layer.points, layer.linestrings, layer.polygons):
        for f in group:
            md = f.metadata
            if md:
                keys.update(dict.fromkeys(md))
                vals.update(dict.fromkeys(md.values()))
    return list(keys), list(vals)


# Below this many features the per-feature scalar encoder wins: the
# batched path's fixed numpy costs (~12 array ops) exceed the saved
# per-feature overhead (measured on the reference fixtures).
BATCH_MIN_FEATURES = 8

_GT_BYTES = {GEOM_POINT: b"\x18\x01", GEOM_LINESTRING: b"\x18\x02",
             GEOM_POLYGON: b"\x18\x03"}


def _encode_features_small(out: list, feats: list, key_index: dict,
                           val_index: dict) -> None:
    """Per-feature encode path for sparse layers (and the byte-parity
    reference for the batched path's property test)."""
    geom_arrays = [_geometry_commands(gt, f.geometry) for f, gt in feats]
    total_words = sum(g.size for g in geom_arrays)
    if geom_arrays and 0 < total_words < 48:
        # tiny layer: the batched machinery's numpy fixed costs lose
        # to the scalar encoder below ~48 command words
        geom_payloads = [wire.uvarint_encode_array(g) for g in geom_arrays]
    elif geom_arrays and total_words:
        sizes = np.fromiter((g.size for g in geom_arrays), np.int64,
                            count=len(geom_arrays))
        allg = np.concatenate(geom_arrays).astype(np.uint64)
        flat = wire.uvarint_encode_array(allg)
        byte_lens = np.ones(allg.size, dtype=np.int64)
        for k in range(1, 5):  # u32 commands: <= 5 varint bytes
            byte_lens += allg >= np.uint64(1) << np.uint64(7 * k)
        cum = np.zeros(allg.size + 1, dtype=np.int64)
        np.cumsum(byte_lens, out=cum[1:])
        bounds = np.zeros(len(feats) + 1, dtype=np.int64)
        np.cumsum(sizes, out=bounds[1:])
        geom_payloads = [flat[cum[bounds[i]]:cum[bounds[i + 1]]]
                         for i in range(len(feats))]
    else:
        geom_payloads = [b""] * len(feats)
    for (f, gt), gb in zip(feats, geom_payloads):
        wire.put_len_field(out, 2, _encode_feature(f, gt, key_index, val_index, gb))


def _encode_features_batched(out: list, feats: list, key_index: dict,
                             val_index: dict, group_counts: tuple) -> None:
    """Whole-layer feature encode: every numeric section (geometry
    command words, tag words, fids, all length prefixes) is varint-
    encoded in ONE vectorized pass over the layer and byte-sliced back
    per feature; the only remaining per-feature work is tag-index
    lookup (dict metadata is inherently per-row) and slice assembly.
    Byte-identical to _encode_features_small (property test +
    45-fixture encode fixpoint)."""
    n = len(feats)
    n_pts, n_ls, n_pg = group_counts
    pw, ps = encode_points_batch([f.geometry for f, _ in feats[:n_pts]])
    lw, ls = encode_linestrings_batch(
        [f.geometry for f, _ in feats[n_pts:n_pts + n_ls]])
    gw, gs = encode_polygons_batch([f.geometry for f, _ in feats[n_pts + n_ls:]])
    allg = np.concatenate([pw, lw, gw]).astype(np.uint64)
    sizes = np.concatenate([ps, ls, gs])

    # geometry bytes: one varint pass, feature bounds via byte cumsum
    geom_b = wire.uvarint_encode_array(allg)
    byte_lens = np.ones(allg.size, dtype=np.int64)
    for k in range(1, 5):  # u32 commands: <= 5 varint bytes
        byte_lens += allg >= np.uint64(1) << np.uint64(7 * k)
    gcum = np.zeros(allg.size + 1, dtype=np.int64)
    np.cumsum(byte_lens, out=gcum[1:])
    wbounds = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sizes, out=wbounds[1:])
    geom_lo = gcum[wbounds[:-1]]
    geom_hi = gcum[wbounds[1:]]
    len_geom = geom_hi - geom_lo

    # tag words: flat across the layer, one varint pass
    ntags = np.empty(n, dtype=np.int64)
    tag_flat: list[int] = []
    ext = tag_flat.extend
    for i, (f, _) in enumerate(feats):
        md = f.metadata
        ntags[i] = 2 * len(md)
        for k, v in md.items():
            ext((key_index[k], val_index[v]))
    tags_arr = np.asarray(tag_flat, dtype=np.uint64)
    tags_b = wire.uvarint_encode_array(tags_arr)
    tcum = np.zeros(tags_arr.size + 1, dtype=np.int64)
    np.cumsum(_varint_lengths(tags_arr), out=tcum[1:])
    tbounds = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(ntags, out=tbounds[1:])
    tags_lo = tcum[tbounds[:-1]]
    tags_hi = tcum[tbounds[1:]]
    len_tags = tags_hi - tags_lo

    # fids + the three length-prefix varint streams
    fids = np.fromiter((int(f.fid) for f, _ in feats), np.uint64, count=n)
    fid_b = wire.uvarint_encode_array(fids)
    fid_cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(_varint_lengths(fids), out=fid_cum[1:])
    tl_b = wire.uvarint_encode_array(len_tags.astype(np.uint64))
    tl_lens = _varint_lengths(len_tags.astype(np.uint64))
    tl_cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tl_lens, out=tl_cum[1:])
    gl_b = wire.uvarint_encode_array(len_geom.astype(np.uint64))
    gl_lens = _varint_lengths(len_geom.astype(np.uint64))
    gl_cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(gl_lens, out=gl_cum[1:])

    # feature message: 08 <fid> [12 <len> <tags>] 18 <gt> [22 <len> <geom>]
    msg_len = (1 + np.diff(fid_cum) + 2
               + np.where(ntags > 0, 1 + tl_lens + len_tags, 0)
               + np.where(len_geom > 0, 1 + gl_lens + len_geom, 0))
    ml_b = wire.uvarint_encode_array(msg_len.astype(np.uint64))
    ml_cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(_varint_lengths(msg_len.astype(np.uint64)), out=ml_cum[1:])

    gtb = ([_GT_BYTES[GEOM_POINT]] * n_pts
           + [_GT_BYTES[GEOM_LINESTRING]] * n_ls
           + [_GT_BYTES[GEOM_POLYGON]] * n_pg)
    app = out.append
    for i in range(n):
        app(b"\x12")
        app(ml_b[ml_cum[i]:ml_cum[i + 1]])
        app(b"\x08")
        app(fid_b[fid_cum[i]:fid_cum[i + 1]])
        if ntags[i]:
            app(b"\x12")
            app(tl_b[tl_cum[i]:tl_cum[i + 1]])
            app(tags_b[tags_lo[i]:tags_hi[i]])
        app(gtb[i])
        if len_geom[i]:
            app(b"\x22")
            app(gl_b[gl_cum[i]:gl_cum[i + 1]])
            app(geom_b[geom_lo[i]:geom_hi[i]])


def encode_layer(layer: Layer) -> bytes:
    """`toProtobuf @Layer` (Internal.hs:114-125)."""
    keys, vals = total_meta(layer)
    key_index = {k: i for i, k in enumerate(keys)}
    val_index = {v: i for i, v in enumerate(vals)}
    out: list[bytes] = []
    wire.put_len_field(out, 1, layer.name)
    feats: list[tuple[Feature, int]] = []
    for group, gt in ((layer.points, GEOM_POINT),
                      (layer.linestrings, GEOM_LINESTRING),
                      (layer.polygons, GEOM_POLYGON)):
        feats.extend((f, gt) for f in group)
    if len(feats) >= BATCH_MIN_FEATURES:
        _encode_features_batched(
            out, feats, key_index, val_index,
            (len(layer.points), len(layer.linestrings), len(layer.polygons)))
    else:
        _encode_features_small(out, feats, key_index, val_index)
    for k in keys:
        wire.put_len_field(out, 3, k)
    for v in vals:
        wire.put_len_field(out, 4, _encode_value(v))
    wire.put_varint_field(out, 5, int(layer.extent))  # always written (Internal.hs:124)
    wire.put_varint_field(out, 15, int(layer.version))  # version last (Layer.hs:55)
    return b"".join(out)


def encode_tile(tile: VectorTile) -> bytes:
    """`untile` (lib/Geography/VectorTile.hs:74-75); layers sorted by
    name for determinism."""
    out: list[bytes] = []
    for name in sorted(tile.layers):
        wire.put_len_field(out, 3, encode_layer(tile.layers[name]))
    return b"".join(out)
