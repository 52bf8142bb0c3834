"""REAL video-frame sampling for the multimodal family.

ops/media.py's FrameSampleStub treated the payload as fixed-size fake
frames; this module replaces that leg with an honest pipeline over a
real (if minimal) container: RVC1 — a length-prefixed sequence of
REAL BMP frames (magic + frame count + fps + u32-length-prefixed
frames). Parsing walks actual offsets from the wire; sampled frames
run through the real BMP decoder (ops/image.decode_bmp), so the
standard video-pretraining pass — container parse -> uniform temporal
sample -> per-frame decode/feature — is real bytes end to end.

Scale shape (the media discipline): fat binary rows ride an actor
pool with SMALL batches; each input row flat-maps to k sampled-frame
rows; malformed containers/frames are contained row-level (ok=false),
never poisoning a batch. Per-frame channel sums are exact integers so
outputs hash stably and the pytest ground truth is bit-exact.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .image import decode_bmp, encode_bmp, synth_image

_MAGIC = b"RVC1"


def encode_rvc(frames: list, fps_milli: int = 12000) -> bytes:
    """frames: list of (h, w, 3) uint8 arrays -> container bytes:
    magic | u16 n_frames | u32 fps_milli | (u32 len | BMP bytes)*."""
    blobs = [encode_bmp(f) for f in frames]
    head = _MAGIC + struct.pack("<HI", len(blobs), fps_milli)
    return head + b"".join(struct.pack("<I", len(b)) + b for b in blobs)


def parse_rvc(payload: bytes):
    """container bytes -> (fps_milli, [(offset, length), ...]) without
    touching frame bodies (the sampler decodes only SELECTED frames —
    the point of length-prefixed layout). Raises ValueError on any
    malformed framing."""
    if len(payload) < 10 or payload[:4] != _MAGIC:
        raise ValueError("not an RVC1 container")
    n, fps_milli = struct.unpack_from("<HI", payload, 4)
    spans = []
    pos = 10
    for _ in range(n):
        if pos + 4 > len(payload):
            raise ValueError("truncated frame header")
        ln, = struct.unpack_from("<I", payload, pos)
        pos += 4
        if pos + ln > len(payload):
            raise ValueError("truncated frame body")
        spans.append((pos, ln))
        pos += ln
    if pos != len(payload):
        raise ValueError("trailing bytes after last frame")
    return fps_milli, spans


def sample_indices(n_frames: int, k: int) -> np.ndarray:
    """Uniform temporal sampling: k indices over [0, n_frames), always
    including the first and last frame when k >= 2; fewer frames than
    k -> every frame once."""
    if n_frames <= k:
        return np.arange(n_frames, dtype=np.int64)
    if k == 1:
        return np.zeros(1, dtype=np.int64)
    return (np.arange(k, dtype=np.int64) * (n_frames - 1)) // (k - 1)


def synth_video(vid_id: int) -> list:
    """Deterministic multi-frame clip: 3-10 frames of the synth_image
    gradient with per-frame temporal motion (row roll by frame index),
    dims fixed within a clip (like a real video)."""
    n = 3 + (vid_id * 3) % 8
    base = synth_image(vid_id)
    return [np.roll(base, shift=t * 2, axis=0) for t in range(n)]


def video_media_path(sf_dir: str) -> str:
    """Materialize (once) the synthetic RVC video corpus for a scale
    dir: parquet of (vid_id, rvc binary), cached under the synth root
    like bmp_media_path."""
    from ..pipeline.synth import SF_ROWS, SYNTH_ROOT
    sf = os.path.basename(os.path.normpath(sf_dir))
    n = max(100, (SF_ROWS.get(sf) or 500) // 200)
    out_dir = os.path.join(SYNTH_ROOT, sf)
    path = os.path.join(out_dir, "video.parquet")
    done = os.path.join(out_dir, ".video_done")
    tag = f"rvc-v1:{n}"
    if not (os.path.exists(done) and open(done).read().strip() == tag):
        os.makedirs(out_dir, exist_ok=True)
        import pyarrow.parquet as pq
        ids = np.arange(n, dtype=np.int64)
        blobs = [encode_rvc(synth_video(int(i)), fps_milli=8000 + int(i) % 5 * 2000)
                 for i in ids]
        pq.write_table(
            pa.table({"vid_id": pa.array(ids),
                      "rvc": pa.array(blobs, pa.binary())}),
            path, row_group_size=max(32, n // 32))
        with open(done, "w") as fh:
            fh.write(tag)
    return path


class VideoFrameSampler:
    """Actor-pool stage: RVC container rows -> k uniformly-sampled
    decoded-frame rows each. Only the sampled frames' byte spans are
    decoded (container parse never touches unsampled bodies).
    Malformed containers yield ONE ok=false row; malformed individual
    frames yield ok=false rows for just those frames."""

    def __init__(self, k: int = 4) -> None:
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids, fidx, ts_milli = [], [], []
        w, h, sums, ok = [], [], [], []

        def emit(vid, j, t, wi, hi, s, o):
            vids.append(vid)
            fidx.append(j)
            ts_milli.append(t)
            w.append(wi)
            h.append(hi)
            sums.append(s)
            ok.append(o)

        ids = batch["vid_id"].to_numpy()
        for i, blob in enumerate(batch["rvc"]):
            payload = blob.as_py()
            vid = int(ids[i])
            try:
                fps_milli, spans = parse_rvc(payload)
            except ValueError:
                emit(vid, -1, -1, 0, 0, (0, 0, 0), False)
                continue
            for j in sample_indices(len(spans), self.k):
                off, ln = spans[j]
                t = int(j) * 1_000_000 // max(fps_milli, 1)  # ms into clip
                try:
                    img = decode_bmp(payload[off:off + ln])
                except ValueError:
                    emit(vid, int(j), t, 0, 0, (0, 0, 0), False)
                    continue
                s = img.reshape(-1, 3).sum(0, dtype=np.int64)
                emit(vid, int(j), t, img.shape[1], img.shape[0],
                     (int(s[0]), int(s[1]), int(s[2])), True)
        sums = np.asarray(sums, dtype=np.int64).reshape(-1, 3)
        return pa.table({
            "vid_id": pa.array(vids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int64()),
            "t_milli": pa.array(ts_milli, pa.int64()),
            "width": pa.array(w, pa.int64()),
            "height": pa.array(h, pa.int64()),
            "sum_r": pa.array(sums[:, 0]),
            "sum_g": pa.array(sums[:, 1]),
            "sum_b": pa.array(sums[:, 2]),
            "ok": pa.array(ok, pa.bool_())})


def video_frames(sf_dir: str, k: int = 4, *,
                 concurrency=(1, 4)) -> ray.data.Dataset:
    """Distributed REAL frame sampling: RVC corpus -> actor pool ->
    k decoded frames per clip with exact channel sums. Small batches:
    fat binary rows (the media memory discipline)."""
    ds = ray.data.read_parquet(video_media_path(sf_dir))
    return ds.map_batches(VideoFrameSampler, batch_format="pyarrow",
                          batch_size=32, concurrency=concurrency,
                          fn_constructor_kwargs={"k": k})


def video_meta(sf_dir: str) -> ray.data.Dataset:
    """Container-level metadata WITHOUT decoding any frame: n_frames,
    fps, total bytes, mean frame bytes — the manifest pass a video
    corpus runs before sampling."""
    def fn(b: pa.Table) -> pa.Table:
        ids = b["vid_id"].to_numpy()
        n = b.num_rows
        nf = np.zeros(n, np.int64)
        fps = np.zeros(n, np.int64)
        tot = np.zeros(n, np.int64)
        ok = np.zeros(n, bool)
        for i, blob in enumerate(b["rvc"]):
            payload = blob.as_py()
            tot[i] = len(payload)
            try:
                fps_milli, spans = parse_rvc(payload)
            except ValueError:
                continue
            ok[i] = True
            nf[i] = len(spans)
            fps[i] = fps_milli
        return pa.table({
            "vid_id": pa.array(ids.astype(np.int64)),
            "n_frames": pa.array(nf), "fps_milli": pa.array(fps),
            "total_bytes": pa.array(tot),
            "frame_bytes_mean": pa.array(
                np.where(nf > 0, (tot - 10 - 4 * nf) // np.maximum(nf, 1), 0)),
            "ok": pa.array(ok)})

    ds = ray.data.read_parquet(video_media_path(sf_dir))
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=64)
