"""REAL image decode for the multimodal family.

The media stubs (ops/media.py) stand in for codec-library decodes the
container can't run — but BMP (Windows bitmap, BI_RGB uncompressed)
is just a 54-byte header plus raw padded pixel rows, decodable with
numpy alone. This module implements the full encode/decode pair and a
distributed decode->stats stage over a deterministic synthetic BMP
corpus, so ONE leg of the multimodal plumbing is real end-to-end:
actual bytes -> actual pixels -> exact verifiable statistics.

Scale shape: decode is a per-row kernel inside an actor-pool
map_batches with small batches (fat binary rows — the media.py memory
discipline); per-image channel sums are exact integers, so the output
hash is stable and the pytest ground truth is bit-exact.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa
import ray
import ray.data

_HDR = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB BMP bytes (bottom-up
    rows, BGR order, rows padded to 4 bytes — the standard layout)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row = w * 3
    pad = (-row) % 4
    stride = row + pad
    body = np.zeros((h, stride), np.uint8)
    body[:, :row] = img[::-1, :, ::-1].reshape(h, row)
    size = _HDR + stride * h
    head = (b"BM" + struct.pack("<IHHI", size, 0, 0, _HDR)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                          stride * h, 2835, 2835, 0, 0))
    return head + body.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB. Supports the layout
    encode_bmp writes (24bpp BI_RGB, positive height = bottom-up);
    anything else raises ValueError (row-level containment is the
    caller's job, as in arrowio)."""
    if len(payload) < _HDR or payload[:2] != b"BM":
        raise ValueError("not a BMP")
    offset, = struct.unpack_from("<I", payload, 10)
    hsize, w, h, planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14)
    if hsize < 40 or bpp != 24 or comp != 0 or h <= 0 or w <= 0:
        raise ValueError("unsupported BMP variant")
    row = w * 3
    stride = row + ((-row) % 4)
    need = offset + stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP")
    body = np.frombuffer(payload, np.uint8, stride * h, offset)
    return body.reshape(h, stride)[:, :row] \
        .reshape(h, w, 3)[::-1, :, ::-1]


def synth_image(img_id: int) -> np.ndarray:
    """Deterministic test image: dims and a channel-separable gradient
    + modular texture derived from img_id alone."""
    w = 16 + (img_id * 7) % 48
    h = 16 + (img_id * 5) % 40
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 3 + img_id) % 256
    g = (yy * 7 + img_id * 11) % 256
    b = (xx * yy + img_id * 29) % 256
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def bmp_media_path(sf_dir: str) -> str:
    """Materialize (once) the synthetic BMP corpus for a testdata
    scale dir: parquet of (img_id, bmp binary), size scaled to the
    tier's webpages rowcount. Cached under the synth root like
    webpages_path."""
    from ..pipeline.synth import SF_ROWS, SYNTH_ROOT
    sf = os.path.basename(os.path.normpath(sf_dir))
    n = max(200, (SF_ROWS.get(sf) or 500) // 100)
    out_dir = os.path.join(SYNTH_ROOT, sf)
    path = os.path.join(out_dir, "media.parquet")
    done = os.path.join(out_dir, ".media_done")
    tag = f"bmp-v1:{n}"
    if not (os.path.exists(done) and open(done).read().strip() == tag):
        os.makedirs(out_dir, exist_ok=True)
        import pyarrow.parquet as pq
        ids = np.arange(n, dtype=np.int64)
        blobs = [encode_bmp(synth_image(int(i))) for i in ids]
        pq.write_table(
            pa.table({"img_id": pa.array(ids),
                      "bmp": pa.array(blobs, pa.binary())}),
            path, row_group_size=max(64, n // 64))
        with open(done, "w") as fh:
            fh.write(tag)
    return path


class BmpStats:
    """Actor-pool decode stage: BMP bytes -> exact per-channel integer
    sums and milli-means. Malformed payloads yield ok=false zero rows
    (row-level containment), never a poisoned batch."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = np.zeros(n, np.int64)
        h = np.zeros(n, np.int64)
        sums = np.zeros((n, 3), np.int64)
        ok = np.zeros(n, bool)
        for i, blob in enumerate(batch["bmp"]):
            try:
                img = decode_bmp(blob.as_py())
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


def media_decode(sf_dir: str, *, concurrency=(1, 4)) -> ray.data.Dataset:
    """Distributed REAL image decode: synthetic BMP corpus -> actor
    pool -> per-image dims + exact channel statistics."""
    ds = ray.data.read_parquet(bmp_media_path(sf_dir))
    return ds.map_batches(BmpStats, batch_format="pyarrow",
                          batch_size=256, concurrency=concurrency)

class BmpThumbnail:
    """Actor-pool REAL resize: decode BMP -> integer area-pool to fit
    (target x target) preserving aspect -> re-encode BMP. Output rows
    carry valid BMP bytes (decodable downstream), old/new dims, ok
    flag; fat rows shrink on the way out — the memory-profile shape a
    production thumbnail pass has."""

    def __init__(self, target: int = 32) -> None:
        self.target = target

    def resize_one(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        fy = -(-h // self.target)
        fx = -(-w // self.target)
        ny, nx = -(-h // fy), -(-w // fx)
        py, px = ny * fy - h, nx * fx - w
        if py or px:
            img = np.pad(img, ((0, py), (0, px), (0, 0)), mode="edge")
        return img.reshape(ny, fy, nx, fx, 3).mean(axis=(1, 3)) \
            .astype(np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ow = np.zeros(n, np.int64)
        oh = np.zeros(n, np.int64)
        nw = np.zeros(n, np.int64)
        nh = np.zeros(n, np.int64)
        ok = np.zeros(n, bool)
        blobs: list = [b""] * n
        for i, blob in enumerate(batch["bmp"]):
            try:
                img = decode_bmp(blob.as_py())
            except ValueError:
                continue
            ok[i] = True
            oh[i], ow[i] = img.shape[:2]
            thumb = self.resize_one(img)
            nh[i], nw[i] = thumb.shape[:2]
            blobs[i] = encode_bmp(thumb)
        return pa.table({
            "img_id": batch["img_id"],
            "width": pa.array(ow), "height": pa.array(oh),
            "thumb_w": pa.array(nw), "thumb_h": pa.array(nh),
            "thumb_bmp": pa.array(blobs, pa.binary()),
            "ok": pa.array(ok)})


def media_thumbnails(sf_dir: str, *, target: int = 32,
                     concurrency=(1, 4)) -> ray.data.Dataset:
    """Distributed real thumbnailing: BMP in, smaller BMP out."""
    ds = ray.data.read_parquet(bmp_media_path(sf_dir))
    return ds.map_batches(BmpThumbnail, batch_format="pyarrow",
                          batch_size=256, concurrency=concurrency,
                          fn_constructor_kwargs={"target": target})
