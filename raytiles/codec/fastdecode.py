"""Batched whole-layer MVT decode.

The per-feature decode path (decode._decode_layer_exact) pays numpy's
fixed per-call costs once per FEATURE (varint run decode, unzig,
cumsum, shoelace) — on a dense tile like the reference's roads.mvt
(~450 features/decode) those calls dominate wall time. This module
decodes a whole layer's geometry in ONE batch:

  1. one gather of every feature's geometry byte-spans,
  2. one vectorized varint decode over the concatenated bytes,
  3. one unzig pass over all command words,
  4. a cheap Python walk over command HEADERS only (~3 words/ring),
  5. one global cumsum with per-feature cursor resets,
  6. one batched ring closure + one surveyor_batch for hole signs.

Error-path contract: this decoder NEVER raises user-facing errors.
Any deviation from the happy path (truncated varint run, over-long
varint, invalid command integer, bad command sequence, unknown geom
type, tag index out of range, unpacked geometry encoding, ...) raises
the private ``FallbackDecode`` and the caller re-runs the exact
per-feature path, which reproduces the reference's error message and
error ORDER byte-for-byte (decode errors kill the whole tile, so the
retry costs nothing on the happy path).

Semantics replicated (reference lib/Geography/VectorTile/Internal.hs):
- 32-bit truncation of command words (Internal.hs:226-229)
- MoveTo/LineTo param clamping + odd-trailing-pair drop (Util.hs:29-31)
- LineString: only the FIRST MoveTo pair advances the cursor
  (Internal.hs:170)
- Polygon rings stored closed (Internal.hs:198); hole attachment by
  shoelace-sign runs (Internal.hs:202-206)
- cursor threads across segments/rings within a feature, resets
  between features
"""

from __future__ import annotations

import numpy as np

from . import wire
from .geometry import (
    CLOSE_PATH, GEOM_LINESTRING, GEOM_POINT, GEOM_POLYGON, LINE_TO, MOVE_TO,
    surveyor_batch, unzig,
)
from .model import DEFAULT_EXTENT, Feature, Layer


class FallbackDecode(Exception):
    """Batched decode hit an anomaly — re-run the exact path."""


def _scan_features(buf, spans):
    """Per-feature field scan WITHOUT decoding geometry or tag
    varints: returns [(fid, [(ts, te), ...], geom_type,
    [(gs, ge), ...])] in stream order — tag and geometry payloads stay
    as byte spans for the single whole-layer varint pass. Unpacked
    (non-LEN) geometry or tag encoding -> FallbackDecode (rare on real
    data; the exact path handles it)."""
    out = []
    uvarint = wire.uvarint_decode
    for start, end in spans:
        fid = 0
        geom_type = None
        tspans: list = []
        gspans: list = []
        pos = start
        while pos < end:
            key = buf[pos]
            pos += 1
            if key & 0x80:
                key, pos = uvarint(buf, pos - 1)
            fno = key >> 3
            wtype = key & 7
            if wtype == wire.VARINT:
                val = buf[pos]
                pos += 1
                if val & 0x80:
                    val, pos = uvarint(buf, pos - 1)
                if fno == 1:
                    fid = val
                elif fno == 2:
                    raise FallbackDecode("unpacked tags")
                elif fno == 3:
                    geom_type = val
                elif fno == 4:
                    raise FallbackDecode("unpacked geometry")
            elif wtype == wire.LEN:
                ln = buf[pos]
                pos += 1
                if ln & 0x80:
                    ln, pos = uvarint(buf, pos - 1)
                s, e = pos, pos + ln
                if e > end:
                    raise FallbackDecode("truncated LEN")
                pos = e
                if fno == 2:
                    tspans.append((s, e))
                elif fno == 4:
                    gspans.append((s, e))
            elif wtype == wire.I32:
                pos += 4
                if pos > end:
                    raise FallbackDecode("truncated I32")
            elif wtype == wire.I64:
                pos += 8
                if pos > end:
                    raise FallbackDecode("truncated I64")
            else:
                raise FallbackDecode(f"wire type {wtype}")
        if geom_type not in (GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON):
            raise FallbackDecode("geom type")
        out.append((fid, tspans, geom_type, gspans))
    return out


def _batch_varint_spans(b8, starts, ends, span_owner, n_owners):
    """Gather byte spans and decode ALL their varints in one
    vectorized pass. Returns (words_u64, owner_word_offsets) where
    owner_word_offsets[i]:owner_word_offsets[i+1] is owner i's word
    range (spans of one owner concatenate in span order)."""
    if not starts:
        return (np.empty(0, np.uint64), np.zeros(n_owners + 1, np.int64))
    starts = np.asarray(starts, np.int64)
    ends = np.asarray(ends, np.int64)
    span_owner = np.asarray(span_owner, np.int64)
    lens = ends - starts
    off = np.empty(lens.size + 1, np.int64)
    off[0] = 0
    np.cumsum(lens, out=off[1:])
    idx = (np.arange(off[-1], dtype=np.int64)
           - np.repeat(off[:-1], lens) + np.repeat(starts, lens))
    g = b8[idx]
    is_last = (g & 0x80) == 0
    nonempty = off[1:] > off[:-1]
    if nonempty.any() and not is_last[off[1:][nonempty] - 1].all():
        # a span ends mid-varint: the exact path raises the
        # size-dispatched truncated-run WireError
        raise FallbackDecode("truncated varint run")
    term = np.flatnonzero(is_last)
    if term.size == 0:
        raise FallbackDecode("no varint terminators")
    word_starts = np.empty(term.size, np.int64)
    word_starts[0] = 0
    word_starts[1:] = term[:-1] + 1
    gid = np.zeros(g.size, np.int64)
    np.cumsum(is_last[:-1], out=gid[1:])
    offsets = np.arange(g.size, dtype=np.int64) - word_starts[gid]
    if offsets.max() >= 10:
        raise FallbackDecode("varint too long")
    vals = ((g.astype(np.uint64) & np.uint64(0x7F))
            << (offsets.astype(np.uint64) * np.uint64(7)))
    words = np.bitwise_or.reduceat(vals, word_starts)
    # words per span -> words per owner (owner order == span order)
    tcum = np.zeros(g.size + 1, np.int64)
    np.cumsum(is_last, out=tcum[1:])
    span_words = tcum[off[1:]] - tcum[off[:-1]]
    owner_words = np.zeros(n_owners, np.int64)
    np.add.at(owner_words, span_owner, span_words)
    ooff = np.empty(n_owners + 1, np.int64)
    ooff[0] = 0
    np.cumsum(owner_words, out=ooff[1:])
    return words, ooff


def decode_layer_batched(buf, start: int, end: int,
                         decode_value, get_meta) -> Layer:
    """Decode one Layer message with batched geometry. Raises
    FallbackDecode on any anomaly; the caller must then re-run the
    exact per-feature path (decode._decode_layer_exact)."""
    version = 1
    name = b""
    extent = None
    keys: list[bytes] = []
    value_spans: list = []
    feature_spans: list = []
    pos = start
    uvarint = wire.uvarint_decode
    try:
        while pos < end:
            key = buf[pos]
            pos += 1
            if key & 0x80:
                key, pos = uvarint(buf, pos - 1)
            fno = key >> 3
            wtype = key & 7
            if wtype == wire.LEN:
                ln = buf[pos]
                pos += 1
                if ln & 0x80:
                    ln, pos = uvarint(buf, pos - 1)
                span = (pos, pos + ln)
                if span[1] > end:
                    raise FallbackDecode("truncated LEN")
                pos = span[1]
                if fno == 2:
                    feature_spans.append(span)
                elif fno == 1:
                    name = bytes(buf[span[0]:span[1]])
                elif fno == 3:
                    keys.append(bytes(buf[span[0]:span[1]]))
                elif fno == 4:
                    value_spans.append(span)
            elif wtype == wire.VARINT:
                val = buf[pos]
                pos += 1
                if val & 0x80:
                    val, pos = uvarint(buf, pos - 1)
                if fno == 15:
                    version = val
                elif fno == 5:
                    extent = val
            elif wtype == wire.I32:
                pos += 4
                if pos > end:
                    raise FallbackDecode("truncated I32")
            elif wtype == wire.I64:
                pos += 8
                if pos > end:
                    raise FallbackDecode("truncated I64")
            else:
                raise FallbackDecode(f"wire type {wtype}")
        if not feature_spans:
            raise FallbackDecode("empty layer")
        values = [decode_value(buf, s, e) for s, e in value_spans]
        feats = _scan_features(buf, feature_spans)
    except FallbackDecode:
        raise
    except Exception as e:  # noqa: BLE001 — exact path re-raises precisely
        raise FallbackDecode(str(e)) from e

    # ONE vectorized varint pass over every feature's geometry AND tag
    # spans: owners 0..nf-1 are per-feature geometry (spans concatenate
    # in stream order), owners nf..2nf-1 are per-feature tags
    nf = len(feats)
    starts: list = []
    ends: list = []
    owner: list = []
    for i, (_, _, _, gspans) in enumerate(feats):
        for s, e in gspans:
            starts.append(s)
            ends.append(e)
            owner.append(i)
    for i, (_, tspans, _, _) in enumerate(feats):
        for s, e in tspans:
            starts.append(s)
            ends.append(e)
            owner.append(nf + i)
    b8 = np.frombuffer(buf, dtype=np.uint8)
    allwords, ooff = _batch_varint_spans(b8, starts, ends, owner, 2 * nf)
    gsplit = int(ooff[nf])
    words = allwords[:gsplit].astype(np.uint32)
    foff = ooff[:nf + 1]
    tag_list = allwords[gsplit:].tolist()
    tag_off = (ooff[nf:] - gsplit).tolist()
    unz = unzig(words)
    wl = words.tolist()

    # --- command-header walk: collect kept-param chunks in stream order
    chunk_start: list[int] = []   # global word index of chunk's first param
    chunk_len: list[int] = []     # words kept from that chunk (even)
    feat_pairs = np.zeros(nf, np.int64)  # delta pairs per feature
    seg_lens: list = [None] * nf  # per LS feature: pairs per segment
    ring_lens: list = [None] * nf  # per PG feature: pairs per ring
    for f, (_, _, gtype, _) in enumerate(feats):
        a, b = int(foff[f]), int(foff[f + 1])
        if gtype == GEOM_POINT:
            if a == b:
                raise FallbackDecode("no points")
            h = wl[a]
            cmd = h & 7
            cnt = h >> 3
            if cmd != MOVE_TO or a + 1 + 2 * cnt < b:
                raise FallbackDecode("point commands")
            npairs = min(2 * cnt, b - a - 1) // 2
            if npairs:
                chunk_start.append(a + 1)
                chunk_len.append(2 * npairs)
            feat_pairs[f] = npairs
            continue
        lens: list[int] = []
        p = a
        k = 0
        total = 0
        if gtype == GEOM_LINESTRING:
            while p < b:
                h = wl[p]
                cmd = h & 7
                cnt = h >> 3
                p += 1
                if k % 2 == 0:
                    if cmd != MOVE_TO or min(2 * cnt, b - p) < 2:
                        raise FallbackDecode("ls moveto")
                    chunk_start.append(p)
                    chunk_len.append(2)
                else:
                    if cmd != LINE_TO:
                        raise FallbackDecode("ls lineto")
                    lp = min(2 * cnt, b - p) // 2
                    if lp:
                        chunk_start.append(p)
                        chunk_len.append(2 * lp)
                    lens.append(1 + lp)
                    total += 1 + lp
                p += 2 * cnt
                k += 1
            if k % 2:
                raise FallbackDecode("ls parity")
            seg_lens[f] = lens
        else:  # GEOM_POLYGON
            while p < b:
                h = wl[p]
                cmd = h & 7
                cnt = h >> 3
                p += 1
                r = k % 3
                if r == 0:
                    if cmd != MOVE_TO or min(2 * cnt, b - p) < 2:
                        raise FallbackDecode("pg moveto")
                    chunk_start.append(p)
                    chunk_len.append(2)
                    p += 2 * cnt
                elif r == 1:
                    if cmd != LINE_TO:
                        raise FallbackDecode("pg lineto")
                    lp = min(2 * cnt, b - p) // 2
                    if lp:
                        chunk_start.append(p)
                        chunk_len.append(2 * lp)
                    lens.append(1 + lp)
                    total += 1 + lp
                    p += 2 * cnt
                else:
                    if cmd != CLOSE_PATH or cnt != 1:
                        raise FallbackDecode("pg closepath")
                k += 1
            if k % 3:
                raise FallbackDecode("pg parity")
            ring_lens[f] = lens
        feat_pairs[f] = total

    # --- one gather + one cumsum with per-feature cursor resets
    if chunk_start:
        cst = np.asarray(chunk_start, np.int64)
        cln = np.asarray(chunk_len, np.int64)
        coff = np.empty(cln.size + 1, np.int64)
        coff[0] = 0
        np.cumsum(cln, out=coff[1:])
        gidx = (np.arange(coff[-1], dtype=np.int64)
                - np.repeat(coff[:-1], cln) + np.repeat(cst, cln))
        deltas = unz[gidx].reshape(-1, 2)
    else:
        deltas = np.empty((0, 2), np.int64)
    cs = np.cumsum(deltas, axis=0)
    poff = np.empty(nf + 1, np.int64)
    poff[0] = 0
    np.cumsum(feat_pairs, out=poff[1:])
    base = np.zeros((nf, 2), np.int64)
    hasbase = poff[:-1] > 0
    base[hasbase] = cs[poff[:-1][hasbase] - 1]
    absolute = cs - np.repeat(base, feat_pairs, axis=0)

    # --- batched ring closure + hole signs for all polygon features
    all_ring_lens: list[int] = []
    ring_feat_count = np.zeros(nf, np.int64)
    for f, rl in enumerate(ring_lens):
        if rl is not None:
            all_ring_lens.extend(rl)
            ring_feat_count[f] = len(rl)
    if all_ring_lens:
        rl_arr = np.asarray(all_ring_lens, np.int64)
        # ring start offsets in PAIR space: each polygon feature's pair
        # range [poff[f], poff[f+1]) is contiguous and its rings pack
        # within it in order -> start = feature base + intra-feature
        # cumsum of preceding ring lengths
        pg_feats = np.flatnonzero(ring_feat_count)
        counts = ring_feat_count[pg_feats]
        rid_feat = np.repeat(np.arange(pg_feats.size), counts)
        gcum = np.empty(rl_arr.size, np.int64)
        gcum[0] = 0
        np.cumsum(rl_arr[:-1], out=gcum[1:])
        feat_first = np.zeros(pg_feats.size, np.int64)
        np.cumsum(counts[:-1], out=feat_first[1:])
        inner = gcum - gcum[feat_first][rid_feat]
        ring_starts = poff[:-1][pg_feats][rid_feat] + inner
        closed = rl_arr + 1
        closed_off = np.empty(rl_arr.size + 1, np.int64)
        closed_off[0] = 0
        np.cumsum(closed, out=closed_off[1:])
        pos_in = (np.arange(closed_off[-1], dtype=np.int64)
                  - np.repeat(closed_off[:-1], closed))
        src = np.where(pos_in == np.repeat(rl_arr, closed),
                       np.repeat(ring_starts, closed),
                       np.repeat(ring_starts, closed) + pos_in)
        closed_pts = absolute[src]
        areas = surveyor_batch(closed_pts, closed_off)
    else:
        closed_pts = np.empty((0, 2), np.int64)
        closed_off = np.zeros(1, np.int64)
        areas = np.empty(0, np.float64)

    # --- assemble Features in stream order
    layer = Layer(name=name, version=version,
                  extent=DEFAULT_EXTENT if extent is None else extent)
    ring_cursor = 0
    try:
        for f, (fid, _, gtype, _) in enumerate(feats):
            meta = get_meta(keys, values, tag_list[tag_off[f]:tag_off[f + 1]])
            a, b = int(poff[f]), int(poff[f + 1])
            if gtype == GEOM_POINT:
                layer.points.append(Feature(fid, meta, absolute[a:b]))
            elif gtype == GEOM_LINESTRING:
                segs = []
                p = a
                for ln in seg_lens[f]:
                    segs.append(absolute[p:p + ln])
                    p += ln
                layer.linestrings.append(Feature(fid, meta, segs))
            else:
                rl = ring_lens[f]
                polys: list[list[np.ndarray]] = []
                for _ in rl:
                    s, e = int(closed_off[ring_cursor]), int(closed_off[ring_cursor + 1])
                    ring = closed_pts[s:e]
                    if polys and areas[ring_cursor] <= 0:
                        polys[-1].append(ring)
                    else:
                        polys.append([ring])
                    ring_cursor += 1
                layer.polygons.append(Feature(fid, meta, polys))
    except FallbackDecode:
        raise
    except Exception as e:  # noqa: BLE001 — e.g. tag index out of range
        raise FallbackDecode(str(e)) from e
    return layer
