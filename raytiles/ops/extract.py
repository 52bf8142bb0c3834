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


def redact_locations(webpages_path: str) -> ray.data.Dataset:
    """Location-PII scrub: every coordinate mention (the geoparse
    grammar, geo/parse.py MASTER_RE) is replaced with '[LOC]' — the
    corpus-sanitization pass a training-data pipeline runs before
    export. Deliberately broader than geoparse itself: anything that
    LOOKS like a coordinate is scrubbed, including mentions geoparse
    would drop as out-of-range (redaction errs conservative).

    Stateless vectorized map: two RE2 kernels (count + replace) over
    the zero-copy Arrow batch — the same engine DuckDB's regexp_replace
    (flag 'g') and regexp_extract_all use, so the twin is exact."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..geo.parse import MASTER_RE

    def fn(b: pa.Table) -> pa.Table:
        return pa.table({
            "url": b["url"],
            "clean_text": pc.replace_substring_regex(
                b["text"], MASTER_RE, "[LOC]"),
            "n_redacted": pc.cast(
                pc.count_substring_regex(b["text"], MASTER_RE), pa.int64())})

    ds = ray.data.read_parquet(webpages_path, columns=["url", "text"])
    return ds.map_batches(fn, batch_format="pyarrow")
