"""Text-analysis operators over the documents table: token counting,
quality scoring, language-ID heuristic, md5 fingerprint, and a
rolling-hash (Karp-Rabin) winnowing fingerprint.

Each operator is a vectorized map_batches stage; the regex grammar is
ASCII-only so Python `re` and DuckDB's RE2 agree token-for-token (the
SQL twins live in __ray_entry__.oracle_sql)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

TOKEN_RE = r"[0-9A-Za-z_]+"
STOP_RE = r"\b(?:the|a|of|and|to)\b"
LANG_MARKERS = {
    "en": r"\b(?:the|a|to|is|in)\b",
    "de": r"\b(?:der|die|das|und|ist)\b",
    "fr": r"\b(?:le|la|les|et|est)\b",
}


def _docs(sf_dir: str, columns) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def token_counts(sf_dir: str) -> ray.data.Dataset:
    """doc_id, n_tokens, n_chars. SQL twin: array_length(
    regexp_extract_all(text, TOKEN_RE)), length(text). Arrow-native:
    RE2 kernels over the zero-copy batch — the same engine the DuckDB
    oracle uses, no pandas conversion."""
    def fn(b: pa.Table) -> pa.Table:
        text = b["text"]
        return pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "n_tokens": pc.cast(pc.count_substring_regex(text, TOKEN_RE), pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        })
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def quality_scores(sf_dir: str) -> ray.data.Dataset:
    """doc_id, n_tokens, stop_ratio, avg_token_len, score — simple
    deterministic quality heuristics (length / stopword-density /
    word-shape), the standard pretraining-corpus filters."""
    def fn(b: pa.Table) -> pa.Table:
        text = b["text"]
        n_tok = pc.count_substring_regex(text, TOKEN_RE).to_numpy().astype(np.int64)
        n_stop = pc.count_substring_regex(text, STOP_RE).to_numpy().astype(np.int64)
        tok_chars = pc.utf8_length(
            pc.replace_substring_regex(text, "[^0-9A-Za-z_]", "")
        ).to_numpy().astype(np.int64)
        denom = np.maximum(n_tok, 1)

        def q6(x):  # floor-quantize: bit-identical in numpy and DuckDB
            return np.floor(x * 1e6) / 1e6

        stop_ratio = q6(n_stop / denom)
        avg_len = q6(tok_chars / denom)
        score = q6(0.5 * np.minimum(n_tok / 50.0, 1.0)
                   + 0.3 * stop_ratio
                   + 0.2 * np.minimum(avg_len / 8.0, 1.0))
        return pa.table({"doc_id": pc.cast(b["doc_id"], pa.int64()),
                         "n_tokens": pa.array(n_tok, pa.int64()),
                         "stop_ratio": pa.array(stop_ratio, pa.float64()),
                         "avg_token_len": pa.array(avg_len, pa.float64()),
                         "score": pa.array(score, pa.float64())})
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """doc_id, lang_pred via marker-word counts with a fixed priority
    tie-break (en >= de >= fr, all-zero -> 'und'); deterministic and
    SQL-expressible."""
    def fn(b: pa.Table) -> pa.Table:
        t = pc.utf8_lower(b["text"])
        en = pc.count_substring_regex(t, LANG_MARKERS["en"]).to_numpy()
        de = pc.count_substring_regex(t, LANG_MARKERS["de"]).to_numpy()
        fr = pc.count_substring_regex(t, LANG_MARKERS["fr"]).to_numpy()
        pred = np.where((en >= de) & (en >= fr) & (en > 0), "en",
                        np.where((de >= fr) & (de > 0), "de",
                                 np.where(fr > 0, "fr", "und")))
        return pa.table({"doc_id": pc.cast(b["doc_id"], pa.int64()),
                         "lang_pred": pa.array(pred.tolist(), pa.string())})
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def doc_md5(sf_dir: str) -> ray.data.Dataset:
    """doc_id, h (md5 hex of text) — the exact-dedup content key.
    SQL twin: md5(text)."""
    import hashlib

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype(np.int64),
            "h": [hashlib.md5(t.encode("utf-8")).hexdigest() for t in b["text"]],
        })
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# Karp-Rabin winnowing fingerprint (no SQL twin — verified by a
# single-process oracle in tests)
# ---------------------------------------------------------------------------

KR_BASE = np.uint64(1000003)
KR_K = 16  # char k-grams


def _rolling_hashes(text: bytes) -> np.ndarray:
    """uint64 wraparound polynomial hashes of all K-grams, vectorized:
    K shifted adds instead of a per-gram loop."""
    b = np.frombuffer(text, dtype=np.uint8).astype(np.uint64)
    n = b.size
    if n < KR_K:
        return np.empty(0, np.uint64)
    m = n - KR_K + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(KR_K):
        h = h * KR_BASE + b[j:j + m]
    return h


class WinnowFingerprint:
    """doc_id -> min-hash fingerprint + winnowed sketch size (window
    w): the classic winnowing document fingerprint."""

    def __init__(self, window: int = 8) -> None:
        self.window = window

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        fps = np.zeros(len(b), dtype=np.uint64)
        sketch = np.zeros(len(b), dtype=np.int64)
        for i, t in enumerate(b["text"]):
            h = _rolling_hashes(t.encode("utf-8"))
            if h.size == 0:
                continue
            fps[i] = h.min()
            if h.size >= self.window:
                win = np.lib.stride_tricks.sliding_window_view(h, self.window)
                mins = win.min(axis=1)
                sketch[i] = np.unique(mins).size
            else:
                sketch[i] = 1
        return pd.DataFrame({"doc_id": b["doc_id"].astype(np.int64),
                             "fingerprint": fps.astype(np.int64),  # two's-complement view
                             "sketch_size": sketch})


_WINNOW = WinnowFingerprint()  # stateless bar the window constant


def winnow_fingerprints(sf_dir: str) -> ray.data.Dataset:
    # task-based: actor pools cost ~2s spin-up per execution and the
    # stage state is one integer
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _WINNOW, batch_format="pandas")
