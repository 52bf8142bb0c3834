"""REAL PNG codec (pure numpy + stdlib zlib) + distributed decode
stage — the second real image format next to ops/image.py's BMP.

Profile: 8-bit RGB (color type 2), no interlace — the synthetic
corpus' own profile — with ALL FIVE scanline filters implemented on
both sides (the encoder cycles filters row-by-row precisely so the
decoder's Sub/Up/Average/Paeth paths are exercised by real data, not
just the trivial None). CRC32 of every chunk is verified; any
malformed payload raises ValueError and the actor stage contains it
row-level (ok=false), mirroring the codec's error-channel discipline
(reference Either-semantics, Internal.hs) — a bad image never poisons
a batch.

Filter math (PNG spec 4.5.2-4.5.4): encode is fully vectorized (the
predictor reads the ORIGINAL image, no sequential dependency);
decode unfilters None/Up vectorized, Sub via per-channel uint8
cumsum, and Average/Paeth by a bounded per-byte scan (the only
sequential recurrences in the format)."""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (len(data).to_bytes(4, "big") + typ + data
            + zlib.crc32(typ + data).to_bytes(4, "big"))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (spec 4.5.4) over int16 inputs."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a,
                   np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(img: np.ndarray) -> bytes:
    """8-bit RGB PNG, filter type cycling (row % 5) so every filter
    path exists on the wire; deterministic zlib (level 6)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_png: RGB only")
    bpp = 3
    raw = bytearray()
    zero = np.zeros((1, w, bpp), np.uint8)
    prior = np.concatenate([zero, img[:-1]], axis=0)  # row above, 0 for row 0
    left = np.concatenate([np.zeros((h, 1, bpp), np.uint8),
                           img[:, :-1]], axis=1)
    upleft = np.concatenate([np.zeros((h, 1, bpp), np.uint8),
                             prior[:, :-1]], axis=1)
    for y in range(h):
        f = y % 5
        row = img[y]
        if f == 0:
            filt = row
        elif f == 1:                      # Sub
            filt = row - left[y]
        elif f == 2:                      # Up
            filt = row - prior[y]
        elif f == 3:                      # Average
            filt = row - ((left[y].astype(np.uint16)
                           + prior[y].astype(np.uint16)) // 2) \
                .astype(np.uint8)
        else:                             # Paeth
            filt = row - _paeth(left[y], prior[y], upleft[y])
        raw.append(f)
        raw.extend(filt.astype(np.uint8).tobytes())
    ihdr = (int(w).to_bytes(4, "big") + int(h).to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """Parse + CRC-verify chunks, inflate, unfilter. Raises ValueError
    on anything outside the supported profile or any corruption."""
    if not isinstance(payload, (bytes, bytearray)) \
            or payload[:8] != _SIG:
        raise ValueError("decode_png: bad signature")
    pos = 8
    w = h = -1
    idat = bytearray()
    seen_end = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("decode_png: truncated chunk header")
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        if len(data) != ln or pos + 12 + ln > len(payload):
            raise ValueError("decode_png: truncated chunk")
        crc = int.from_bytes(payload[pos + 8 + ln:pos + 12 + ln], "big")
        if zlib.crc32(typ + data) != crc:
            raise ValueError("decode_png: CRC mismatch")
        pos += 12 + ln
        if typ == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, ctype, comp, filt, inter = data[8:13]
            if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError("decode_png: unsupported profile")
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            seen_end = True
            break
        # ancillary chunks skipped
    if w <= 0 or h <= 0 or not seen_end or not idat:
        raise ValueError("decode_png: missing IHDR/IDAT/IEND")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"decode_png: inflate failed: {e}") from e
    stride = 1 + w * 3
    if len(raw) != stride * h:
        raise ValueError("decode_png: scanline size mismatch")
    sl = np.frombuffer(raw, np.uint8).reshape(h, stride)
    ftypes = sl[:, 0]
    if (ftypes > 4).any():
        raise ValueError("decode_png: bad filter type")
    rows = sl[:, 1:].reshape(h, w, 3)
    out = np.empty((h, w, 3), np.uint8)
    zero_row = np.zeros((w, 3), np.uint8)
    for y in range(h):
        f = ftypes[y]
        r = rows[y]
        prior = out[y - 1] if y else zero_row
        if f == 0:
            out[y] = r
        elif f == 1:      # Sub: per-channel cumsum mod 256
            out[y] = np.cumsum(r.astype(np.uint64), axis=0) \
                .astype(np.uint8)
        elif f == 2:      # Up
            out[y] = r + prior
        else:             # Average / Paeth: sequential in x
            row = np.zeros((w, 3), np.uint8)
            for xx in range(w):
                lft = row[xx - 1] if xx else np.zeros(3, np.uint8)
                if f == 3:
                    pred = ((lft.astype(np.uint16)
                             + prior[xx].astype(np.uint16)) // 2) \
                        .astype(np.uint8)
                else:
                    ul = prior[xx - 1] if xx else np.zeros(3, np.uint8)
                    pred = _paeth(lft, prior[xx], ul)
                row[xx] = r[xx] + pred
            out[y] = row
    return out


def png_media_path(sf_dir: str) -> str:
    """Materialize (once) the synthetic PNG corpus — same deterministic
    images as the BMP corpus (ops/image.synth_image), PNG-encoded."""
    from ..pipeline.synth import SF_ROWS, SYNTH_ROOT
    from .image import synth_image
    sf = os.path.basename(os.path.normpath(sf_dir))
    n = max(200, (SF_ROWS.get(sf) or 500) // 100)
    out_dir = os.path.join(SYNTH_ROOT, sf)
    path = os.path.join(out_dir, "media_png.parquet")
    done = os.path.join(out_dir, ".media_png_done")
    tag = f"png-v1:{n}"
    if not (os.path.exists(done) and open(done).read().strip() == tag):
        os.makedirs(out_dir, exist_ok=True)
        import pyarrow.parquet as pq
        ids = np.arange(n, dtype=np.int64)
        blobs = [encode_png(synth_image(int(i))) for i in ids]
        pq.write_table(
            pa.table({"img_id": pa.array(ids),
                      "png": pa.array(blobs, pa.binary())}),
            path, row_group_size=max(64, n // 64))
        with open(done, "w") as fh:
            fh.write(tag)
    return path


class PngStats:
    """Actor-pool decode stage: PNG bytes -> dims + exact integer
    channel sums; malformed payloads contained row-level."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = np.zeros(n, np.int64)
        h = np.zeros(n, np.int64)
        sums = np.zeros((n, 3), np.int64)
        ok = np.zeros(n, bool)
        for i, blob in enumerate(batch["png"]):
            try:
                img = decode_png(blob.as_py())
            except ValueError:
                continue
            ok[i] = True
            h[i], w[i] = img.shape[:2]
            sums[i] = img.reshape(-1, 3).sum(0, dtype=np.int64)
        npx = np.maximum(w * h, 1)
        return pa.table({
            "img_id": batch["img_id"],
            "width": pa.array(w), "height": pa.array(h),
            "mean_r_milli": pa.array(sums[:, 0] * 1000 // npx),
            "mean_g_milli": pa.array(sums[:, 1] * 1000 // npx),
            "mean_b_milli": pa.array(sums[:, 2] * 1000 // npx),
            "ok": pa.array(ok)})


def media_png_decode(sf_dir: str, *, concurrency=(1, 4)) -> ray.data.Dataset:
    """Distributed REAL PNG decode: synthetic corpus -> actor pool ->
    per-image dims + exact channel statistics (identical output
    contract to the BMP stage, pinned equal by pytest)."""
    ds = ray.data.read_parquet(png_media_path(sf_dir))
    return ds.map_batches(PngStats, batch_format="pyarrow",
                          concurrency=concurrency)
