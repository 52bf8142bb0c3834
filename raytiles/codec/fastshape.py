"""Vectorized columnar MVT encoders for polygon (heat) and linestring
(trajectory) layers — the fastpoint approach (whole-batch wire
assembly with ragged-scatter index arithmetic, fastpoint.py) extended
to ragged geometry streams and parametric value variants.

Byte-for-byte identical to the generic encoder (codec.encode) for the
shapes they cover, asserted by tests against encode_tile:

- heat:         polygons, one constant-size square ring per hot grid
                cell, metadata {count: I64, density: Do}
- trajectories: linestrings (MoveTo + LineTo run per feature),
                metadata {url: St, n_points: I64}

Wire layout follows the reference (Layer.hs:51-55, Feature.hs:37-40,
Value.hs:53-57; id always written, Internal.hs:339).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import wire
from .fastpoint import (_ragged_target_idx, _scatter_varints, _varint_lengths,
                        _zig32)


def _per_tile_value_dicts(tile_of: np.ndarray, inter_code: np.ndarray,
                          T: int, per_feat: int):
    """Per-tile value dictionaries in first-appearance order over the
    interleaved metadata-value stream (fastpoint's factorization):

    inter_code: (per_feat * n,) global value-identity codes in feature
    order (feature i contributes its per_feat values consecutively).
    Returns (vidx (per occurrence), uniq_rows (stream indices of each
    tile's dictionary entries, tile-major appearance order),
    vals_tile (tile id per unique), vcount (uniques per tile))."""
    n_stream = inter_code.size
    inter_tile = np.repeat(tile_of, per_feat)
    K = int(inter_code.max()) + 1 if n_stream else 1
    pair = inter_tile * K + inter_code
    uniq_pair, first_idx, inverse = np.unique(
        pair, return_index=True, return_inverse=True)
    u_tile = uniq_pair // K
    ord_fa = np.lexsort((first_idx, u_tile))  # tile-major, appearance order
    counts_per_tile = np.bincount(u_tile, minlength=T)
    tile_starts_u = np.concatenate([[0], np.cumsum(counts_per_tile)])[:-1]
    rank_within = np.empty(uniq_pair.size, dtype=np.int64)
    rank_within[ord_fa] = (np.arange(uniq_pair.size, dtype=np.int64)
                           - np.repeat(tile_starts_u, counts_per_tile))
    vidx = rank_within[inverse]
    uniq_rows = first_idx[ord_fa]
    return vidx, uniq_rows, u_tile[ord_fa], counts_per_tile


def _encode_layer_tiles(tile_offsets: np.ndarray,
                        geom_type: int,
                        geom_vals: np.ndarray,
                        geom_offsets: np.ndarray,
                        tags_vals: np.ndarray,
                        vals_tile_counts: np.ndarray,
                        val_inner_bytes: np.ndarray,
                        val_inner_lens: np.ndarray,
                        name: bytes,
                        keys: list[bytes],
                        extent: int,
                        version: int) -> list[bytes]:
    """Assemble T tiles of one layer in a single numpy pass.

    tile_offsets: (T+1,) feature spans; geom_vals: flat uint64 command
    words for all features; geom_offsets: (n+1,) per-feature spans into
    geom_vals; tags_vals: (n, 2k) interleaved tag varints; per-tile
    value dictionaries are described by vals_tile_counts (uniques per
    tile, tile order) with their INNER message bytes concatenated in
    val_inner_bytes (uint8) / val_inner_lens.
    """
    n = int(tile_offsets[-1])
    T = tile_offsets.size - 1
    nfeat = np.diff(tile_offsets)
    if n == 0:
        return [b""] * T

    # ---- per-feature wire lengths ----
    starts = tile_offsets[:-1]
    fid = np.arange(n, dtype=np.int64) - np.repeat(starts, nfeat)
    fid_u = fid.astype(np.uint64)
    len_fid = _varint_lengths(fid_u)

    tags_flat = tags_vals.ravel()
    width = tags_vals.shape[1]
    len_tags_each = _varint_lengths(tags_flat).reshape(n, width)
    len_tags = len_tags_each.sum(axis=1)
    len_tags_len = _varint_lengths(len_tags.astype(np.uint64))

    len_geom_words = _varint_lengths(geom_vals)
    word_cum = np.concatenate([[0], np.cumsum(len_geom_words)])
    len_geom = word_cum[geom_offsets[1:]] - word_cum[geom_offsets[:-1]]
    len_geom_len = _varint_lengths(len_geom.astype(np.uint64))

    # feature message: 08 <fid> 12 <len> <tags> 18 <gtype> 22 <len> <geom>
    msg_len = 1 + len_fid + 1 + len_tags_len + len_tags + 2 + 1 + len_geom_len + len_geom
    len_msg_len = _varint_lengths(msg_len.astype(np.uint64))
    feat_total = 1 + len_msg_len + msg_len

    # ---- value section lengths ----
    inner_len_len = _varint_lengths(val_inner_lens.astype(np.uint64))
    val_total = 1 + inner_len_len + val_inner_lens  # 22 <len> <inner>

    # ---- per-tile layout ----
    feat_cum = np.concatenate([[0], np.cumsum(feat_total)])
    tile_feat_len = feat_cum[tile_offsets[1:]] - feat_cum[tile_offsets[:-1]]
    vcount = vals_tile_counts
    val_cum = np.concatenate([[0], np.cumsum(val_total)])
    v_off = np.concatenate([[0], np.cumsum(vcount)])
    tile_val_len = val_cum[v_off[1:]] - val_cum[v_off[:-1]]

    keys_bytes = b"".join(
        wire.tag(3, wire.LEN) + wire.uvarint_encode(len(k)) + k for k in keys)
    name_bytes = wire.tag(1, wire.LEN) + wire.uvarint_encode(len(name)) + name
    tail_bytes = (wire.tag(5, wire.VARINT) + wire.uvarint_encode(extent)
                  + wire.tag(15, wire.VARINT) + wire.uvarint_encode(version))
    fixed_len = len(name_bytes) + len(keys_bytes) + len(tail_bytes)

    layer_len = fixed_len + tile_feat_len + tile_val_len
    layer_len_len = _varint_lengths(layer_len.astype(np.uint64))
    tile_total = np.where(nfeat > 0, 1 + layer_len_len + layer_len, 0)
    tile_starts_b = np.cumsum(tile_total) - tile_total
    buf = np.empty(int(tile_total.sum()), dtype=np.uint8)

    tile_content = tile_starts_b + 1 + layer_len_len + len(name_bytes)
    tile_vals_origin = tile_content + tile_feat_len + len(keys_bytes)

    # ---- features ----
    rel_feat = feat_cum[:-1] - np.repeat(feat_cum[tile_offsets[:-1]], nfeat)
    p = np.repeat(tile_content, nfeat) + rel_feat
    buf[p] = 0x12
    msg_len_bytes = np.frombuffer(
        wire.uvarint_encode_array(msg_len.astype(np.uint64)), np.uint8)
    _scatter_varints(buf, p + 1, msg_len_bytes, len_msg_len)
    q = p + 1 + len_msg_len
    buf[q] = 0x08
    fid_bytes = np.frombuffer(wire.uvarint_encode_array(fid_u), np.uint8)
    _scatter_varints(buf, q + 1, fid_bytes, len_fid)
    r = q + 1 + len_fid
    buf[r] = 0x12
    tl_bytes = np.frombuffer(
        wire.uvarint_encode_array(len_tags.astype(np.uint64)), np.uint8)
    _scatter_varints(buf, r + 1, tl_bytes, len_tags_len)
    tp = r + 1 + len_tags_len
    tags_bytes = np.frombuffer(wire.uvarint_encode_array(tags_flat), np.uint8)
    tag_off = np.zeros((n, width), dtype=np.int64)
    tag_off[:, 1:] = np.cumsum(len_tags_each, axis=1)[:, :-1]
    _scatter_varints(buf, (tp[:, None] + tag_off).ravel(), tags_bytes,
                     len_tags_each.ravel())
    sbase = tp + len_tags
    buf[sbase] = 0x18
    buf[sbase + 1] = geom_type
    buf[sbase + 2] = 0x22
    gl_bytes = np.frombuffer(
        wire.uvarint_encode_array(len_geom.astype(np.uint64)), np.uint8)
    _scatter_varints(buf, sbase + 3, gl_bytes, len_geom_len)
    gp = sbase + 3 + len_geom_len
    geom_bytes = np.frombuffer(wire.uvarint_encode_array(geom_vals), np.uint8)
    # scatter each feature's geometry byte run to its absolute start
    geom_byte_starts = word_cum[geom_offsets[:-1]]
    buf[_ragged_target_idx(gp, len_geom)] = geom_bytes[
        _ragged_target_idx(geom_byte_starts, len_geom)]

    # ---- values ----
    nu = val_inner_lens.size
    if nu:
        rel_val = val_cum[:-1] - np.repeat(val_cum[v_off[:-1]], vcount)
        vp = np.repeat(tile_vals_origin, vcount) + rel_val
        buf[vp] = 0x22
        il_bytes = np.frombuffer(
            wire.uvarint_encode_array(val_inner_lens.astype(np.uint64)), np.uint8)
        _scatter_varints(buf, vp + 1, il_bytes, inner_len_len)
        ip = vp + 1 + inner_len_len
        buf[_ragged_target_idx(ip, val_inner_lens)] = val_inner_bytes

    # ---- fixed sections + headers per nonempty tile ----
    tnz = np.flatnonzero(nfeat > 0)
    hp = tile_starts_b[tnz]
    buf[hp] = 0x1A
    ll_bytes = np.frombuffer(
        wire.uvarint_encode_array(layer_len[tnz].astype(np.uint64)), np.uint8)
    _scatter_varints(buf, hp + 1, ll_bytes, layer_len_len[tnz])
    for sect, origin in ((name_bytes, hp + 1 + layer_len_len[tnz]),
                         (keys_bytes, tile_content[tnz] + tile_feat_len[tnz]),
                         (tail_bytes, tile_vals_origin[tnz] + tile_val_len[tnz])):
        arr = np.frombuffer(sect, np.uint8)
        buf[(origin[:, None] + np.arange(len(sect))[None, :]).ravel()] = \
            np.tile(arr, tnz.size)

    flat = buf.tobytes()
    ends = tile_starts_b + tile_total
    return [flat[tile_starts_b[t]:ends[t]] if nfeat[t] else b"" for t in range(T)]


# ---------------------------------------------------------------------------
# heat layer: constant-size square polygons per hot raster cell
# ---------------------------------------------------------------------------

def encode_heat_tiles(tile_offsets: np.ndarray,
                      gx: np.ndarray, gy: np.ndarray,
                      counts: np.ndarray, densities: np.ndarray,
                      cell: int, extent: int = 4096,
                      version: int = 2) -> list[bytes]:
    """Encode T heat tiles at once: feature i is a closed CW square
    ring at grid cell (gx, gy) * cell with metadata {count: I64,
    density: Do}. Byte-identical to the generic encoder on
    Layer(polygons=[...]) in cell order."""
    n = int(tile_offsets[-1])
    T = tile_offsets.size - 1
    if n == 0:
        return [b""] * T
    tile_of = np.repeat(np.arange(T), np.diff(tile_offsets))

    # geometry: MoveTo(1) zig(x0) zig(y0); LineTo(3) fixed square run;
    # ClosePath. 11 words per feature.
    zc = int(_zig32(np.array([cell]))[0])
    znc = int(_zig32(np.array([-cell]))[0])
    geom = np.empty((n, 11), dtype=np.uint64)
    geom[:, 0] = 9
    geom[:, 1] = _zig32(gx.astype(np.int64) * cell)
    geom[:, 2] = _zig32(gy.astype(np.int64) * cell)
    geom[:, 3] = (3 << 3) | 2  # LineTo(3)
    geom[:, 4] = zc   # +cell, 0
    geom[:, 5] = 0
    geom[:, 6] = 0    # 0, +cell
    geom[:, 7] = zc
    geom[:, 8] = znc  # -cell, 0
    geom[:, 9] = 0
    geom[:, 10] = 15  # ClosePath
    geom_offsets = np.arange(n + 1, dtype=np.int64) * 11

    # value identity codes: even = count, odd = density
    cnt_codes, _ = pd.factorize(counts, sort=False)
    den_codes, _ = pd.factorize(densities, sort=False)
    inter = np.empty(2 * n, dtype=np.int64)
    inter[0::2] = 2 * cnt_codes.astype(np.int64)
    inter[1::2] = 2 * den_codes.astype(np.int64) + 1
    vidx, uniq_rows, _, vcount = _per_tile_value_dicts(tile_of, inter, T, 2)

    tags = np.empty((n, 4), dtype=np.uint64)
    tags[:, 0] = 0
    tags[:, 1] = vidx[0::2].astype(np.uint64)
    tags[:, 2] = 1
    tags[:, 3] = vidx[1::2].astype(np.uint64)

    # inner value messages in dictionary order
    is_cnt = uniq_rows % 2 == 0
    feat_of_row = uniq_rows // 2
    nu = uniq_rows.size
    inner_lens = np.empty(nu, dtype=np.int64)
    u_counts = counts[feat_of_row[is_cnt]].astype(np.uint64)
    cnt_vlen = _varint_lengths(u_counts)
    inner_lens[is_cnt] = 1 + cnt_vlen          # 0x20 <varint>
    inner_lens[~is_cnt] = 9                    # 0x19 <8-byte double>
    inner_starts = np.cumsum(inner_lens) - inner_lens
    inner = np.zeros(int(inner_lens.sum()), dtype=np.uint8)
    cs = inner_starts[is_cnt]
    inner[cs] = 0x20
    cnt_bytes = np.frombuffer(wire.uvarint_encode_array(u_counts), np.uint8)
    _scatter_varints(inner, cs + 1, cnt_bytes, cnt_vlen)
    ds_ = inner_starts[~is_cnt]
    inner[ds_] = 0x19
    den_payload = densities[feat_of_row[~is_cnt]].astype("<f8").view(np.uint8)
    inner[(ds_[:, None] + np.arange(1, 9)[None, :]).ravel()] = den_payload

    return _encode_layer_tiles(tile_offsets, 3, geom.ravel(), geom_offsets,
                               tags, vcount, inner, inner_lens,
                               b"heat", [b"count", b"density"], extent, version)


# ---------------------------------------------------------------------------
# trajectory layer: one variable-length linestring per url run
# ---------------------------------------------------------------------------

def encode_trajectory_tiles(tile_offsets: np.ndarray,
                            urls: np.ndarray,
                            run_offsets: np.ndarray,
                            lx: np.ndarray, ly: np.ndarray,
                            extent: int = 4096,
                            version: int = 2) -> list[bytes]:
    """Encode T trajectory tiles at once.

    tile_offsets: (T+1,) FEATURE spans per tile; run_offsets: (n+1,)
    point spans per feature into lx/ly (each run >= 2 points); urls:
    one utf-8 bytes object per feature. Metadata {url: St,
    n_points: I64}; geometry MoveTo(1) + LineTo(m-1) with per-feature
    cursor reset. Byte-identical to the generic encoder."""
    n = run_offsets.size - 1
    T = tile_offsets.size - 1
    if n == 0:
        return [b""] * T
    tile_of = np.repeat(np.arange(T), np.diff(tile_offsets))
    m = np.diff(run_offsets)  # points per feature

    # geometry stream: 3 + 1 + 2*(m-1) words per feature
    glen = 4 + 2 * (m - 1)
    geom_offsets = np.concatenate([[0], np.cumsum(glen)])
    geom = np.zeros(int(geom_offsets[-1]), dtype=np.uint64)
    gs = geom_offsets[:-1]
    geom[gs] = 9  # MoveTo(1)
    geom[gs + 1] = _zig32(lx[run_offsets[:-1]].astype(np.int64))
    geom[gs + 2] = _zig32(ly[run_offsets[:-1]].astype(np.int64))
    geom[gs + 3] = ((m - 1).astype(np.uint64) << np.uint64(3)) | np.uint64(2)
    # deltas for the non-first points of each run
    pt_feat = np.repeat(np.arange(n), m)
    not_first = np.ones(lx.size, dtype=bool)
    not_first[run_offsets[:-1]] = False
    dx = np.zeros(lx.size, dtype=np.int64)
    dy = np.zeros(ly.size, dtype=np.int64)
    dx[1:] = lx[1:].astype(np.int64) - lx[:-1].astype(np.int64)
    dy[1:] = ly[1:].astype(np.int64) - ly[:-1].astype(np.int64)
    sel = np.flatnonzero(not_first)
    # destination: feature geom start + 4 + 2*(rank within run - 1)
    rank = np.arange(lx.size, dtype=np.int64) - np.repeat(run_offsets[:-1], m)
    dst = gs[pt_feat[sel]] + 4 + 2 * (rank[sel] - 1)
    geom[dst] = _zig32(dx[sel])
    geom[dst + 1] = _zig32(dy[sel])

    # value identity: even = url, odd = n_points
    url_codes, url_uniques = pd.factorize(pd.Series(urls), sort=False)
    m_codes, _ = pd.factorize(m, sort=False)
    inter = np.empty(2 * n, dtype=np.int64)
    inter[0::2] = 2 * url_codes.astype(np.int64)
    inter[1::2] = 2 * m_codes.astype(np.int64) + 1
    vidx, uniq_rows, _, vcount = _per_tile_value_dicts(tile_of, inter, T, 2)

    tags = np.empty((n, 4), dtype=np.uint64)
    tags[:, 0] = 0
    tags[:, 1] = vidx[0::2].astype(np.uint64)
    tags[:, 2] = 1
    tags[:, 3] = vidx[1::2].astype(np.uint64)

    is_url = uniq_rows % 2 == 0
    feat_of_row = uniq_rows // 2
    nu = uniq_rows.size
    url_payload = pd.Series(url_uniques).str.encode("utf-8").to_numpy() \
        if len(url_uniques) and isinstance(url_uniques[0], str) else np.asarray(url_uniques)
    u_url_bytes = url_payload[url_codes[feat_of_row[is_url]]]
    u_url_lens = np.fromiter((len(b) for b in u_url_bytes), np.int64,
                             count=len(u_url_bytes))
    u_url_len_lens = _varint_lengths(u_url_lens.astype(np.uint64))
    u_m = m[feat_of_row[~is_url]].astype(np.uint64)
    m_vlen = _varint_lengths(u_m)
    inner_lens = np.empty(nu, dtype=np.int64)
    inner_lens[is_url] = 1 + u_url_len_lens + u_url_lens  # 0x0A <len> <bytes>
    inner_lens[~is_url] = 1 + m_vlen                      # 0x20 <varint>
    inner_starts = np.cumsum(inner_lens) - inner_lens
    inner = np.zeros(int(inner_lens.sum()), dtype=np.uint8)
    us = inner_starts[is_url]
    inner[us] = 0x0A
    ul_bytes = np.frombuffer(
        wire.uvarint_encode_array(u_url_lens.astype(np.uint64)), np.uint8)
    _scatter_varints(inner, us + 1, ul_bytes, u_url_len_lens)
    if u_url_bytes.size:
        inner[_ragged_target_idx(us + 1 + u_url_len_lens, u_url_lens)] = \
            np.frombuffer(b"".join(u_url_bytes.tolist()), np.uint8)
    ms = inner_starts[~is_url]
    inner[ms] = 0x20
    m_bytes = np.frombuffer(wire.uvarint_encode_array(u_m), np.uint8)
    _scatter_varints(inner, ms + 1, m_bytes, m_vlen)

    return _encode_layer_tiles(tile_offsets, 2, geom, geom_offsets,
                               tags, vcount, inner, inner_lens,
                               b"trajectories", [b"url", b"n_points"],
                               extent, version)


# ---------------------------------------------------------------------------
# hull layer: one variable-length single-ring polygon per host
# ---------------------------------------------------------------------------

def encode_hull_tiles(tile_offsets: np.ndarray,
                      hosts: np.ndarray,
                      n_mentions: np.ndarray,
                      ring_offsets: np.ndarray,
                      lx: np.ndarray, ly: np.ndarray,
                      extent: int = 4096,
                      version: int = 2) -> list[bytes]:
    """Encode T hull-polygon tiles at once (the polytiles face batched
    — generalizing the trajectory kernel to polygons).

    tile_offsets: (T+1,) FEATURE spans per tile; ring_offsets: (n+1,)
    point spans per feature into lx/ly (each span one CLOSED exterior
    ring as handed to the generic encoder); hosts: one utf-8 bytes (or
    str) per feature; metadata {host: St, n_mentions: I64}. Geometry
    follows codec.geometry.encode_polygons exactly: drop the closing
    point, MoveTo head, LineTo rest, ClosePath — byte-identical to the
    generic encoder (asserted by tests/test_citytiles.py)."""
    n = ring_offsets.size - 1
    T = tile_offsets.size - 1
    if n == 0:
        return [b""] * T
    tile_of = np.repeat(np.arange(T), np.diff(tile_offsets))
    m_in = np.diff(ring_offsets)
    # strip each ring's closing point (generic-encoder parity)
    keep = np.ones(lx.size, dtype=bool)
    keep[ring_offsets[1:] - 1] = False
    lx = lx[keep].astype(np.int64)
    ly = ly[keep].astype(np.int64)
    m = m_in - 1  # stripped points per ring
    roff = np.concatenate([[0], np.cumsum(m)])

    # geometry stream: MoveTo(1) z z | LineTo(m-1) deltas | ClosePath
    glen = 3 + 2 * m
    geom_offsets = np.concatenate([[0], np.cumsum(glen)])
    geom = np.zeros(int(geom_offsets[-1]), dtype=np.uint64)
    gs = geom_offsets[:-1]
    geom[gs] = 9  # MoveTo(1)
    geom[gs + 1] = _zig32(lx[roff[:-1]])
    geom[gs + 2] = _zig32(ly[roff[:-1]])
    geom[gs + 3] = ((m - 1).astype(np.uint64) << np.uint64(3)) | np.uint64(2)
    geom[geom_offsets[1:] - 1] = 15  # ClosePath(1)
    pt_feat = np.repeat(np.arange(n), m)
    not_first = np.ones(lx.size, dtype=bool)
    not_first[roff[:-1]] = False
    dx = np.zeros(lx.size, dtype=np.int64)
    dy = np.zeros(ly.size, dtype=np.int64)
    dx[1:] = lx[1:] - lx[:-1]
    dy[1:] = ly[1:] - ly[:-1]
    sel = np.flatnonzero(not_first)
    rank = np.arange(lx.size, dtype=np.int64) - np.repeat(roff[:-1], m)
    dst = gs[pt_feat[sel]] + 4 + 2 * (rank[sel] - 1)
    geom[dst] = _zig32(dx[sel])
    geom[dst + 1] = _zig32(dy[sel])

    # value identity: even = host, odd = n_mentions
    host_codes, host_uniques = pd.factorize(pd.Series(hosts), sort=False)
    nm_codes, _ = pd.factorize(n_mentions, sort=False)
    inter = np.empty(2 * n, dtype=np.int64)
    inter[0::2] = 2 * host_codes.astype(np.int64)
    inter[1::2] = 2 * nm_codes.astype(np.int64) + 1
    vidx, uniq_rows, _, vcount = _per_tile_value_dicts(tile_of, inter, T, 2)

    tags = np.empty((n, 4), dtype=np.uint64)
    tags[:, 0] = 0
    tags[:, 1] = vidx[0::2].astype(np.uint64)
    tags[:, 2] = 1
    tags[:, 3] = vidx[1::2].astype(np.uint64)

    is_host = uniq_rows % 2 == 0
    feat_of_row = uniq_rows // 2
    nu = uniq_rows.size
    host_payload = pd.Series(host_uniques).str.encode("utf-8").to_numpy() \
        if len(host_uniques) and isinstance(host_uniques[0], str) \
        else np.asarray(host_uniques)
    u_host_bytes = host_payload[host_codes[feat_of_row[is_host]]]
    u_host_lens = np.fromiter((len(b) for b in u_host_bytes), np.int64,
                              count=len(u_host_bytes))
    u_host_len_lens = _varint_lengths(u_host_lens.astype(np.uint64))
    u_nm = n_mentions[feat_of_row[~is_host]].astype(np.uint64)
    nm_vlen = _varint_lengths(u_nm)
    inner_lens = np.empty(nu, dtype=np.int64)
    inner_lens[is_host] = 1 + u_host_len_lens + u_host_lens  # 0x0A <len> <b>
    inner_lens[~is_host] = 1 + nm_vlen                       # 0x20 <varint>
    inner_starts = np.cumsum(inner_lens) - inner_lens
    inner = np.zeros(int(inner_lens.sum()), dtype=np.uint8)
    hs = inner_starts[is_host]
    inner[hs] = 0x0A
    hl_bytes = np.frombuffer(
        wire.uvarint_encode_array(u_host_lens.astype(np.uint64)), np.uint8)
    _scatter_varints(inner, hs + 1, hl_bytes, u_host_len_lens)
    if u_host_bytes.size:
        inner[_ragged_target_idx(hs + 1 + u_host_len_lens, u_host_lens)] = \
            np.frombuffer(b"".join(u_host_bytes.tolist()), np.uint8)
    ns_ = inner_starts[~is_host]
    inner[ns_] = 0x20
    nm_bytes = np.frombuffer(wire.uvarint_encode_array(u_nm), np.uint8)
    _scatter_varints(inner, ns_ + 1, nm_bytes, nm_vlen)

    return _encode_layer_tiles(tile_offsets, 3, geom, geom_offsets,
                               tags, vcount, inner, inner_lens,
                               b"hulls", [b"host", b"n_mentions"],
                               extent, version)
