"""Multimodal-column plumbing: opaque binary payloads (the webpages
``html`` column stands in for image/audio bytes) flowing through
actor-pool map_batches stages.

Real decode libraries (PIL / ffmpeg / torchaudio) are not in this
container, so the decode kernel is STUBBED — ``DecodeStub`` produces a
deterministic fake feature vector (byte-value histogram) and fake
dimensions derived from the payload length, while everything Ray-side
(binary-column schema, batch sizing for fat rows, actor signature,
output layout) is real and tested. Swap ``DecodeStub.decode_one`` for
a real decoder on a cluster with the libs installed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

FAKE_W_MOD = 640
FAKE_H_MOD = 480


def media_meta(webpages_path: str) -> ray.data.Dataset:
    """url, n_bytes, fake_width, fake_height — metadata extraction
    over the binary column (vectorized; SQL twin uses octet_length).
    Small batch_size: binary rows are fat (ray_guide 'Memory-aware')."""
    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = pc.binary_length(batch["html"]).cast(pa.int64())
        nn = n.to_numpy()
        return pa.table({
            "url": batch["url"],
            "n_bytes": n,
            "fake_width": pa.array(nn % FAKE_W_MOD, pa.int64()),
            "fake_height": pa.array(nn % FAKE_H_MOD, pa.int64()),
        })

    ds = ray.data.read_parquet(webpages_path, columns=["url", "html"])
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=1024)


class DecodeStub:
    """STUB image/audio decode: per-payload byte histogram (8 bins,
    float32) as the 'feature vector'. Deterministic; replace
    ``decode_one`` with a real decoder when the codec libs exist."""

    N_BINS = 8

    def __init__(self) -> None:
        # model-load stand-in: done once per actor, not per batch
        self.edges = np.linspace(0, 256, self.N_BINS + 1)

    def decode_one(self, payload: bytes) -> np.ndarray:
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist, _ = np.histogram(arr, bins=self.edges)
        total = max(1, arr.size)
        return (hist / total).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self.decode_one(m.as_py()) for m in batch["html"]]
        return pa.table({
            "url": batch["url"],
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32(), self.N_BINS)),
        })


def media_features(webpages_path: str, *, concurrency=(1, 4)) -> ray.data.Dataset:
    """Binary payloads -> fixed-size feature vectors via the decode
    actor pool (the real multimodal pattern: small batches, fixed
    list<float> output schema)."""
    ds = ray.data.read_parquet(webpages_path, columns=["url", "html"])
    return ds.map_batches(DecodeStub, batch_format="pyarrow",
                          batch_size=512, concurrency=concurrency)
