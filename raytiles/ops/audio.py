"""REAL audio decode for the multimodal family — the WAV/PCM sibling
of ops/image.py: a RIFF WAVE file with 16-bit PCM is a 44-byte header
plus raw little-endian samples, decodable with numpy alone. Encode /
decode pair, a deterministic synthetic tone corpus, and a distributed
decode->stats stage whose outputs are exact integers (sum of squares,
zero crossings), so the gate hash is stable and the pytest ground
truth is bit-exact.

Scale shape mirrors the image leg: actor-pool map_batches with small
batches over fat binary rows; malformed payloads yield ok=false rows.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa
import ray
import ray.data


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples -> canonical 44-byte-header PCM WAV."""
    assert samples.dtype == np.int16
    data = samples.tobytes()
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                    rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, int16 mono samples). Walks RIFF
    chunks (fmt may be followed by LIST etc. before data); anything
    but 16-bit mono PCM raises ValueError."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    rate = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size, = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            fmt, ch, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, body)
            if fmt != 1 or ch != 1 or bits != 16:
                raise ValueError("unsupported WAV variant")
        elif cid == b"data":
            if rate is None:
                raise ValueError("data before fmt")
            if body + size > len(payload):
                raise ValueError("truncated WAV")
            return rate, np.frombuffer(payload, np.int16,
                                       size // 2, body)
        pos = body + size + (size & 1)
    raise ValueError("no data chunk")


def synth_tone(clip_id: int) -> tuple[int, np.ndarray]:
    """Deterministic test clip: a quantized sine at a clip-derived
    frequency + a small id-seeded square ripple, 0.05-0.3 s."""
    rate = 8000
    n = 400 + (clip_id * 37) % 2000
    freq = 100.0 + (clip_id * 13) % 900
    t = np.arange(n, dtype=np.float64)
    wave = 0.6 * np.sin(2 * np.pi * freq * t / rate)
    ripple = 0.1 * np.sign(np.sin(2 * np.pi * (freq / 3.0) * t / rate))
    return rate, np.clip((wave + ripple) * 32767, -32768, 32767) \
        .astype(np.int16)


def wav_media_path(sf_dir: str) -> str:
    """Materialize (once) the synthetic WAV corpus, cached under the
    synth root like bmp_media_path."""
    from ..pipeline.synth import SF_ROWS, SYNTH_ROOT
    sf = os.path.basename(os.path.normpath(sf_dir))
    n = max(200, (SF_ROWS.get(sf) or 500) // 100)
    out_dir = os.path.join(SYNTH_ROOT, sf)
    path = os.path.join(out_dir, "audio.parquet")
    done = os.path.join(out_dir, ".audio_done")
    tag = f"wav-v1:{n}"
    if not (os.path.exists(done) and open(done).read().strip() == tag):
        os.makedirs(out_dir, exist_ok=True)
        import pyarrow.parquet as pq
        ids = np.arange(n, dtype=np.int64)
        blobs = []
        for i in ids:
            rate, samples = synth_tone(int(i))
            blobs.append(encode_wav(samples, rate))
        pq.write_table(
            pa.table({"clip_id": pa.array(ids),
                      "wav": pa.array(blobs, pa.binary())}),
            path, row_group_size=max(64, n // 64))
        with open(done, "w") as fh:
            fh.write(tag)
    return path


class WavStats:
    """Actor-pool decode stage: WAV bytes -> exact integer acoustic
    stats (energy = sum of squared samples, zero-crossing count,
    peak) — the feature-extraction pass of an audio pipeline with a
    hash-stable integer output. Malformed payloads -> ok=false."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        rate = np.zeros(n, np.int64)
        ns = np.zeros(n, np.int64)
        energy = np.zeros(n, np.int64)
        zc = np.zeros(n, np.int64)
        peak = np.zeros(n, np.int64)
        ok = np.zeros(n, bool)
        for i, blob in enumerate(batch["wav"]):
            try:
                r, s = decode_wav(blob.as_py())
            except ValueError:
                continue
            ok[i] = True
            rate[i], ns[i] = r, len(s)
            x = s.astype(np.int64)
            energy[i] = int((x * x).sum())
            zc[i] = int(((s[1:] < 0) != (s[:-1] < 0)).sum())
            peak[i] = int(np.abs(x).max()) if len(x) else 0
        return pa.table({
            "clip_id": batch["clip_id"],
            "sample_rate": pa.array(rate), "n_samples": pa.array(ns),
            "energy": pa.array(energy), "zero_crossings": pa.array(zc),
            "peak": pa.array(peak), "ok": pa.array(ok)})


def audio_decode(sf_dir: str, *, concurrency=(1, 4)) -> ray.data.Dataset:
    """Distributed REAL audio decode: synthetic WAV corpus -> actor
    pool -> exact integer acoustic statistics."""
    ds = ray.data.read_parquet(wav_media_path(sf_dir))
    return ds.map_batches(WavStats, batch_format="pyarrow",
                          batch_size=256, concurrency=concurrency)
