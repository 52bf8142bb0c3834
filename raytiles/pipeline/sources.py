"""Sources beyond Parquet.

``read_mvt_dir``: the inverse of sinks.write_mvt_files — ingest a
standard XYZ tile-server directory (``<root>/<z>/<x>/<y>.mvt``) as a
Dataset, decoding and validating every tile. This is the reference's
native input shape (it only ever consumes raw ``.mvt`` bytes read from
files, test/Test.hs:24-28), lifted to a distributed source:
``ray.data.read_binary_files`` shards the file listing across tasks,
so a planet-scale tileset (hundreds of millions of files) streams
without any driver-side listing bottleneck beyond the metadata fetch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..codec.decode import decode_tile_safe


def read_mvt_dir(root: str) -> ray.data.Dataset:
    """Read every ``<root>/<z>/<x>/<y>.mvt`` into rows (z, x, y,
    n_bytes, n_layers, n_features, ok). Tiles that fail to decode
    yield ok=False with zeroed counts instead of poisoning the batch
    (row-level error containment, same contract as arrowio)."""
    ds = ray.data.read_binary_files(root, include_paths=True,
                                    file_extensions=["mvt"])

    def parse(b: pa.Table) -> pa.Table:
        paths = b["path"].to_pylist()
        blobs = b["bytes"]
        n = len(paths)
        z = np.zeros(n, np.int64)
        x = np.zeros(n, np.int64)
        y = np.zeros(n, np.int64)
        n_bytes = np.zeros(n, np.int64)
        n_layers = np.zeros(n, np.int64)
        n_feats = np.zeros(n, np.int64)
        ok = np.zeros(n, bool)
        for i, p in enumerate(paths):
            parts = p.split("/")
            try:
                y[i] = int(parts[-1].rsplit(".", 1)[0])
                x[i] = int(parts[-2])
                z[i] = int(parts[-3])
            except (ValueError, IndexError):
                y[i] = x[i] = z[i] = -1
            data = blobs[i].as_py()
            n_bytes[i] = len(data)
            tile, err = decode_tile_safe(data)
            if tile is not None:
                ok[i] = True
                n_layers[i] = len(tile.layers)
                n_feats[i] = sum(
                    len(l.points) + len(l.linestrings) + len(l.polygons)
                    for l in tile.layers.values())
        return pa.table({
            "z": z, "x": x, "y": y, "n_bytes": n_bytes,
            "n_layers": n_layers, "n_features": n_feats,
            "ok": pa.array(ok)})

    return ds.map_batches(parse, batch_format="pyarrow")


def read_webpages_jsonl(root: str, columns=("url", "text")) -> ray.data.Dataset:
    """JSONL webpages source: newline-delimited JSON shards with the
    same logical schema as the parquet table (url, warc_ts, html-b64,
    text, lang) — the interchange format crawls actually arrive in.
    ray.data.read_json streams shard-per-task like read_parquet;
    column pruning happens in a projection pass right after the read
    (JSON has no column pushdown — documented storage-format cost vs
    parquet, not an engine limitation). Binary html travels base64
    (JSON has no bytes type) and is decoded only when requested."""
    import base64

    ds = ray.data.read_json(root)
    want = list(columns)

    def project(t: pa.Table) -> pa.Table:
        cols = {}
        for c in want:
            if c == "html" and t.schema.field(c).type == pa.string():
                cols[c] = pa.array(
                    [base64.b64decode(s) for s in t[c].to_pylist()],
                    pa.binary())
            elif c == "warc_ts" and pa.types.is_string(t[c].type):
                import pyarrow.compute as pc
                cols[c] = pc.strptime(t[c], format="%Y-%m-%d %H:%M:%S",
                                      unit="us")
            else:
                cols[c] = t[c]
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def write_webpages_jsonl(ds: ray.data.Dataset, root: str) -> None:
    """Inverse sink (one .jsonl file per block; base64 for binary)."""
    import base64
    import json as _json
    import os

    os.makedirs(root, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        import hashlib
        rows = []
        names = t.column_names
        for i in range(t.num_rows):
            row = {}
            for c in names:
                v = t[c][i].as_py()
                if isinstance(v, bytes):
                    v = base64.b64encode(v).decode("ascii")
                elif hasattr(v, "isoformat"):
                    v = v.strftime("%Y-%m-%d %H:%M:%S")
                row[c] = v
            rows.append(_json.dumps(row, sort_keys=True))
        payload = ("\n".join(rows) + "\n").encode()
        name = hashlib.md5(payload).hexdigest()[:16]
        with open(os.path.join(root, f"part-{name}.jsonl"), "wb") as fh:
            fh.write(payload)
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    ds.map_batches(dump, batch_format="pyarrow").materialize()


def read_webpages_csv(root: str, columns=("url", "text")) -> ray.data.Dataset:
    """CSV webpages source (url, text, lang — the text-only exchange
    subset; CSV has no binary type, so html stays parquet/JSONL-only).
    ray.data.read_csv streams shard-per-task over pyarrow's C++ CSV
    reader; quoting round-trips embedded commas/quotes/newlines. As
    with JSONL, projection happens right after the read (no column
    pushdown in the format itself)."""
    ds = ray.data.read_csv(root)
    want = list(columns)

    def project(t: pa.Table) -> pa.Table:
        return t.select(want)

    return ds.map_batches(project, batch_format="pyarrow")


def write_webpages_csv(ds: ray.data.Dataset, root: str) -> None:
    """Inverse sink: one .csv shard per block via pyarrow's C++ CSV
    writer (vectorized — no per-row Python), resumable-layout like the
    parquet and .mvt sinks (one file per block, re-runs overwrite)."""
    import os

    import pyarrow.csv as pacsv

    os.makedirs(root, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        import hashlib
        tag = hashlib.md5(
            f"{t.num_rows}:{t['url'][0].as_py() if t.num_rows else ''}"
            .encode()).hexdigest()[:12]
        pacsv.write_csv(t, os.path.join(root, f"shard-{tag}.csv"))
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    for _ in ds.map_batches(dump, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        pass
