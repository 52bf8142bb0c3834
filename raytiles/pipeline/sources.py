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


def read_webpages_jsonl(root: str, columns=("url", "text"),
                        gz: bool = False) -> ray.data.Dataset:
    """JSONL webpages source: newline-delimited JSON shards with the
    same logical schema as the parquet table (url, warc_ts, html-b64,
    text, lang) — the interchange format crawls actually arrive in.
    ray.data.read_json streams shard-per-task like read_parquet;
    column pruning happens in a projection pass right after the read
    (JSON has no column pushdown — documented storage-format cost vs
    parquet, not an engine limitation). Binary html travels base64
    (JSON has no bytes type) and is decoded only when requested.

    ``gz=True`` reads ``.jsonl.gz`` shards (the compressed form
    crawl dumps actually ship in — e.g. WET/WAT-style gzip members):
    decompression happens inside each read task's input stream, so
    compressed bytes are what cross storage and the wire."""
    import base64

    if gz:
        ds = ray.data.read_json(
            root, arrow_open_stream_args={"compression": "gzip"},
            file_extensions=["gz"])
    else:
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


def write_webpages_jsonl(ds: ray.data.Dataset, root: str,
                         gz: bool = False) -> None:
    """Inverse sink (one .jsonl[.gz] file per block; base64 for
    binary). ``gz=True`` writes gzip members (deterministic: mtime=0,
    no filename in the header) — the crawl-dump exchange form."""
    import base64
    import json as _json
    import os

    os.makedirs(root, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        import gzip
        import hashlib
        import io
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
        if gz:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as zf:
                zf.write(payload)
            payload = buf.getvalue()
        ext = "jsonl.gz" if gz else "jsonl"
        with open(os.path.join(root, f"part-{name}.{ext}"), "wb") as fh:
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


def write_webpages_warc(ds: ray.data.Dataset, root: str) -> None:
    """WARC/1.0 sink — the Common-Crawl container format (ISO 28500):
    one ``.warc`` shard per block, one ``response`` record per page.
    The payload is an HTTP/1.1 response carrying the raw html bytes;
    url / warc_ts / lang ride the standard ``WARC-Target-URI`` /
    ``WARC-Date`` / ``WARC-Identified-Content-Language`` headers (the
    last is the header Common Crawl itself uses for detected
    language). Text is NOT stored: the crawl-native contract is that
    extracted text is derived from html downstream (ops/extract), so
    a WARC roundtrip re-derives it bit-exactly via the corpus's
    extraction invariant.

    Record assembly is bytes-concat per row (bounded by payload
    size); the sink writes one file per block — the same resumable
    one-file-per-shard layout as the parquet / .mvt / CSV sinks."""
    import hashlib
    import os

    os.makedirs(root, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        parts = []
        urls = t["url"].to_pylist()
        langs = (t["lang"].to_pylist() if "lang" in t.column_names
                 else [""] * t.num_rows)
        ts = t["warc_ts"].to_pylist() if "warc_ts" in t.column_names \
            else [None] * t.num_rows
        htmls = t["html"].to_pylist()
        for url, lang, when, html in zip(urls, langs, ts, htmls):
            http = (b"HTTP/1.1 200 OK\r\n"
                    b"Content-Type: text/html; charset=utf-8\r\n"
                    b"Content-Length: " + str(len(html)).encode()
                    + b"\r\n\r\n" + html)
            date = (when.strftime("%Y-%m-%dT%H:%M:%SZ")
                    if when is not None else "1970-01-01T00:00:00Z")
            rid = hashlib.md5(url.encode()).hexdigest()
            header = (f"WARC/1.0\r\n"
                      f"WARC-Type: response\r\n"
                      f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
                      f"WARC-Date: {date}\r\n"
                      f"WARC-Target-URI: {url}\r\n"
                      f"WARC-Identified-Content-Language: {lang}\r\n"
                      f"Content-Type: application/http; msgtype=response\r\n"
                      f"Content-Length: {len(http)}\r\n\r\n").encode()
            parts.append(header + http + b"\r\n\r\n")
        payload = b"".join(parts)
        name = hashlib.md5(payload).hexdigest()[:16]
        with open(os.path.join(root, f"part-{name}.warc"), "wb") as fh:
            fh.write(payload)
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    ds.map_batches(dump, batch_format="pyarrow").materialize()


def read_webpages_warc(root: str) -> ray.data.Dataset:
    """WARC/1.0 webpages source: ``read_binary_files`` shards .warc
    files across tasks (one file = one sequential record scan — WARC
    is a sequential container by construction, so the parallel unit is
    the shard, exactly how Common Crawl's 100k-file crawls are
    processed); each ``response`` record yields (url, warc_ts, html,
    text, lang) with ``text`` re-derived from the html payload via the
    corpus extraction rule (ops/extract strip contract), giving the
    same logical schema as the parquet table."""
    from ..ops.extract import PREFIX, SUFFIX

    ds = ray.data.read_binary_files(root, file_extensions=["warc"])

    def parse(b: pa.Table) -> pa.Table:
        import datetime as _dt
        urls, tss, htmls, texts, langs = [], [], [], [], []
        for blob in b["bytes"]:
            data = blob.as_py()
            pos = 0
            while pos < len(data):
                head_end = data.find(b"\r\n\r\n", pos)
                if head_end < 0:
                    break
                head = data[pos:head_end].decode("utf-8", "replace")
                fields = {}
                for line in head.split("\r\n")[1:]:
                    k, _, v = line.partition(": ")
                    fields[k.lower()] = v
                clen = int(fields.get("content-length", "0"))
                payload = data[head_end + 4:head_end + 4 + clen]
                pos = head_end + 4 + clen + 4  # skip record separator
                if fields.get("warc-type") != "response":
                    continue
                body_at = payload.find(b"\r\n\r\n")
                html = payload[body_at + 4:] if body_at >= 0 else b""
                body = html
                if body.startswith(PREFIX) and body.endswith(SUFFIX):
                    body = body[len(PREFIX):len(body) - len(SUFFIX)]
                urls.append(fields.get("warc-target-uri", ""))
                tss.append(_dt.datetime.strptime(
                    fields.get("warc-date", "1970-01-01T00:00:00Z"),
                    "%Y-%m-%dT%H:%M:%SZ"))
                htmls.append(html)
                texts.append(body.decode("utf-8", "replace"))
                langs.append(
                    fields.get("warc-identified-content-language", ""))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string())})

    return ds.map_batches(parse, batch_format="pyarrow")


def write_webpages_ipc(ds: ray.data.Dataset, root: str) -> None:
    """Arrow IPC (Feather V2) sink: one ``.arrow`` file per block via
    ``pa.ipc.new_file`` — the full-fidelity zero-copy interchange
    format (binary/timestamp columns survive unencoded, unlike
    JSONL's base64 or CSV's text subset). Vectorized end-to-end: the
    block IS the record batch; nothing is serialized per row."""
    import hashlib
    import os

    os.makedirs(root, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        sink = pa.BufferOutputStream()
        with pa.ipc.new_file(sink, t.schema) as w:
            w.write_table(t)
        buf = sink.getvalue()
        name = hashlib.md5(buf).hexdigest()[:16]
        with open(os.path.join(root, f"part-{name}.arrow"), "wb") as fh:
            fh.write(buf)
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    ds.map_batches(dump, batch_format="pyarrow").materialize()


def read_webpages_ipc(root: str, columns=None) -> ray.data.Dataset:
    """Arrow IPC source: ``read_binary_files`` shards ``.arrow`` files
    across tasks; each file memory-maps conceptually as one
    ``pa.ipc.open_file`` (zero-copy column access, real column
    pruning — IPC files carry a schema and per-column buffers, so
    unlike JSONL/CSV the projection never touches dropped columns)."""
    ds = ray.data.read_binary_files(root, file_extensions=["arrow"])
    want = list(columns) if columns is not None else None

    def parse(b: pa.Table) -> pa.Table:
        tables = []
        for blob in b["bytes"]:
            rd = pa.ipc.open_file(pa.BufferReader(blob.as_py()))
            t = rd.read_all()
            tables.append(t.select(want) if want is not None else t)
        return pa.concat_tables(tables)

    return ds.map_batches(parse, batch_format="pyarrow")


def write_webpages_orc(ds: ray.data.Dataset, root: str) -> None:
    """ORC sink: one ``.orc`` file per block via ``pyarrow.orc`` —
    the columnar warehouse format Hive/Spark lakes standardize on
    (stripes + per-column statistics; full-fidelity types like IPC).
    The block IS the stripe source; nothing serializes per row."""
    import hashlib
    import os

    from pyarrow import orc

    os.makedirs(root, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        sink = pa.BufferOutputStream()
        orc.write_table(t, sink)
        buf = sink.getvalue()
        name = hashlib.md5(buf).hexdigest()[:16]
        with open(os.path.join(root, f"part-{name}.orc"), "wb") as fh:
            fh.write(buf)
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    ds.map_batches(dump, batch_format="pyarrow").materialize()


def read_webpages_orc(root: str, columns=None) -> ray.data.Dataset:
    """ORC source: ``read_binary_files`` shards ``.orc`` files across
    tasks; each parses via ``pyarrow.orc.ORCFile`` with REAL column
    pruning (ORC stripes carry per-column streams, so the projection
    never decodes dropped columns)."""
    from pyarrow import orc

    ds = ray.data.read_binary_files(root, file_extensions=["orc"])
    want = list(columns) if columns is not None else None

    def parse(b: pa.Table) -> pa.Table:
        tables = []
        for blob in b["bytes"]:
            f = orc.ORCFile(pa.BufferReader(blob.as_py()))
            tables.append(f.read(columns=want))
        return pa.concat_tables(tables)

    return ds.map_batches(parse, batch_format="pyarrow")


def write_webpages_hive(ds: ray.data.Dataset, root: str,
                        partition_col: str = "lang") -> None:
    """Hive-partitioned parquet sink: ``<root>/<col>=<value>/*.parquet``
    — the warehouse layout that makes partition PRUNING a filesystem
    operation. Ray's write_parquet fans rows into one directory per
    partition value; at 100 TB this is also the resumable-output
    shape (a failed run re-lists finished partition dirs and skips)."""
    ds.write_parquet(root, partition_cols=[partition_col])


def read_webpages_hive(root: str, lang: str | None = None,
                       columns=("url", "text")) -> ray.data.Dataset:
    """Hive-partitioned source with PATH-LEVEL partition pruning: when
    ``lang`` is given, only ``<root>/lang=<lang>/`` is listed and read
    — bytes from every other partition never leave storage (the
    predicate-to-directory translation a lakehouse query planner
    performs). The partition column is not stored in the files; it is
    re-attached as a constant when requested."""
    import pyarrow.compute as pc

    want = [c for c in columns if c != "lang"]
    if lang is not None:
        ds = ray.data.read_parquet(f"{root}/lang={lang}", columns=want)
        if "lang" in columns:
            const = lang

            def attach(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "lang", pa.array([const] * t.num_rows, pa.string()))

            ds = ds.map_batches(attach, batch_format="pyarrow")
        return ds
    # full-table read: hive discovery re-materializes the column
    return ray.data.read_parquet(root, columns=list(columns))
