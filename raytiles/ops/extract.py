"""HTML -> text extraction with per-row validation.

The rule's per-row invariant (BASELINE.json input_hint): the engine's
extracted text must be byte-identical per url to the authoritative
``text`` column. The stage extracts from ``html`` (stripping the
deterministic <html><body>...</body></html> wrapper the corpus uses)
and validates byte equality against ``text`` in the same pass, so any
extraction drift surfaces as valid=false rows, never silently.

On a real crawl the strip step becomes a full HTML parser; the
validation contract (compare against the reference text column,
output the md5 for cheap downstream equality joins) stays the same.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray
import ray.data

PREFIX = b"<html><body>"
SUFFIX = b"</body></html>"


def extract_batch(batch: pd.DataFrame) -> pd.DataFrame:
    texts = []
    valid = np.zeros(len(batch), dtype=bool)
    ref = batch["text"].to_numpy()
    for i, payload in enumerate(batch["html"]):
        body = payload
        if body.startswith(PREFIX) and body.endswith(SUFFIX):
            body = body[len(PREFIX):len(body) - len(SUFFIX)]
        extracted = body.decode("utf-8", errors="replace")
        texts.append(extracted)
        valid[i] = extracted == ref[i]
    return pd.DataFrame({
        "url": batch["url"].to_numpy(),
        "text_md5": [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        "valid": valid,
    })


def extract_text(webpages_path: str) -> ray.data.Dataset:
    """url, text_md5, n_chars, valid — extraction + validation over
    the html binary column (columns pruned to url/html/text)."""
    ds = ray.data.read_parquet(webpages_path, columns=["url", "html", "text"])
    return ds.map_batches(extract_batch, batch_format="pandas", batch_size=2048)
