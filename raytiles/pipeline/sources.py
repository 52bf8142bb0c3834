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


def _write_shard(root: str, stem: str, ext: str, payload: bytes) -> None:
    """Write one content-addressed shard file, collision-safe.

    Shards are named by a content hash (deterministic across runs), but
    two byte-identical blocks must still land as TWO files or read-back
    loses row multiplicity. ``open('xb')`` (O_EXCL, atomic across Ray
    worker processes) detects the collision and disambiguates with a
    ``-<n>`` suffix. Sinks therefore expect a fresh target directory —
    resuming into a half-written dir is the checkpoint layer's job."""
    import os
    path = os.path.join(root, f"{stem}.{ext}")
    n = 0
    while True:
        try:
            with open(path, "xb") as fh:
                fh.write(payload)
            return
        except FileExistsError:
            n += 1
            path = os.path.join(root, f"{stem}-{n}.{ext}")


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
        _write_shard(root, f"part-{name}", ext, payload)
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
        _write_shard(root, f"part-{name}", "warc", payload)
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
        _write_shard(root, f"part-{name}", "arrow", buf)
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
        _write_shard(root, f"part-{name}", "orc", buf)
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


# ---------------------------------------------------------------------------
# TFRecord source/sink — the TensorFlow training-data container
# (public spec: 8-byte LE length + masked CRC32C of the length bytes +
# payload + masked CRC32C of the payload; payload = tf.train.Example).
# ---------------------------------------------------------------------------

def _pb_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _pb_example(fields: list[tuple[bytes, bytes]]) -> bytes:
    """Serialize a tf.train.Example proto from scratch (no protobuf
    lib, same policy as codec/wire.py): Example.features(1) ->
    Features.feature(1) map entries -> Feature.bytes_list(1) ->
    BytesList.value(1). All fields length-delimited (wire type 2)."""
    entries = bytearray()
    for key, val in fields:
        blist = b"\x0a" + _pb_varint(len(val)) + val
        feat = b"\x0a" + _pb_varint(len(blist)) + blist
        entry = (b"\x0a" + _pb_varint(len(key)) + key
                 + b"\x12" + _pb_varint(len(feat)) + feat)
        entries += b"\x0a" + _pb_varint(len(entry)) + entry
    return b"\x0a" + _pb_varint(len(entries)) + bytes(entries)


def _pb_read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _pb_example_fields(data: bytes) -> dict[str, bytes]:
    """Inverse of _pb_example for the bytes_list-only Examples this
    sink writes (unknown field numbers / wire types are skipped, like
    the MVT decoder's unknown-tag policy)."""
    out: dict[str, bytes] = {}

    def walk_msg(buf: bytes):
        pos = 0
        while pos < len(buf):
            tag, pos = _pb_read_varint(buf, pos)
            wt = tag & 7
            if wt == 2:
                ln, pos = _pb_read_varint(buf, pos)
                yield tag >> 3, buf[pos:pos + ln]
                pos += ln
            elif wt == 0:
                _, pos = _pb_read_varint(buf, pos)
            elif wt == 5:
                pos += 4
            elif wt == 1:
                pos += 8
            else:
                raise ValueError(f"tfrecord: bad wire type {wt}")

    for fno, features in walk_msg(data):
        if fno != 1:
            continue
        for eno, entry in walk_msg(features):
            if eno != 1:
                continue
            key = val = None
            for kno, payload in walk_msg(entry):
                if kno == 1:
                    key = payload
                elif kno == 2:  # Feature -> bytes_list -> value
                    for bno, blist in walk_msg(payload):
                        if bno == 1:
                            for vno, v in walk_msg(blist):
                                if vno == 1:
                                    val = v
            if key is not None and val is not None:
                out[key.decode()] = val
    return out


def write_webpages_tfrecord(ds: ray.data.Dataset, root: str) -> None:
    """TFRecord sink: one ``.tfrecord`` shard per block, one
    tf.train.Example per page with bytes features ``url`` and ``text``
    — the standard text-corpus layout for TF input pipelines. Record
    framing CRC32Cs (both of them, per record) are computed by the
    lockstep-vectorized kernel in raytiles.util — no per-byte Python
    loop even though every record is checksummed twice."""
    import hashlib
    import os
    import struct

    from ..util import crc32c_batch, crc32c_masked

    os.makedirs(root, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        payloads = [
            _pb_example([(b"url", u.encode()), (b"text", x.encode())])
            for u, x in zip(t["url"].to_pylist(), t["text"].to_pylist())]
        n = len(payloads)
        lens = np.array([len(p) for p in payloads], np.int64)
        buf = np.frombuffer(b"".join(payloads), np.uint8)
        offs = np.concatenate([[0], np.cumsum(lens[:-1])]) if n else \
            np.zeros(0, np.int64)
        data_crc = crc32c_masked(crc32c_batch(buf, offs, lens))
        len_bytes = lens.astype("<u8").view(np.uint8).reshape(n, 8) if n \
            else np.zeros((0, 8), np.uint8)
        len_crc = crc32c_masked(crc32c_batch(
            len_bytes.reshape(-1), np.arange(n, dtype=np.int64) * 8,
            np.full(n, 8, np.int64)))
        parts = []
        for i, p in enumerate(payloads):
            parts.append(struct.pack("<Q", lens[i])
                         + struct.pack("<I", int(len_crc[i]))
                         + p + struct.pack("<I", int(data_crc[i])))
        payload = b"".join(parts)
        name = hashlib.md5(payload).hexdigest()[:16]
        _write_shard(root, f"part-{name}", "tfrecord", payload)
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    ds.map_batches(dump, batch_format="pyarrow").materialize()


def read_webpages_tfrecord(root: str) -> ray.data.Dataset:
    """TFRecord source: shard = parallel unit (read_binary_files), the
    framing walk is sequential per shard by construction. BOTH masked
    CRC32Cs of every record are verified (vectorized) — a corrupt
    shard fails loudly instead of yielding garbage Examples."""
    import struct

    from ..util import crc32c_batch, crc32c_masked

    ds = ray.data.read_binary_files(root, file_extensions=["tfrecord"])

    def parse(b: pa.Table) -> pa.Table:
        urls, texts = [], []
        for blob in b["bytes"]:
            data = blob.as_py()
            pos = 0
            offs, lens, want_len_crc, want_data_crc = [], [], [], []
            while pos < len(data):
                (ln,) = struct.unpack_from("<Q", data, pos)
                (lcrc,) = struct.unpack_from("<I", data, pos + 8)
                offs.append(pos + 12)
                lens.append(ln)
                want_len_crc.append(lcrc)
                (dcrc,) = struct.unpack_from("<I", data, pos + 12 + ln)
                want_data_crc.append(dcrc)
                pos += 16 + ln
            n = len(lens)
            buf = np.frombuffer(data, np.uint8)
            lens_a = np.array(lens, np.int64)
            offs_a = np.array(offs, np.int64)
            got_data = crc32c_masked(crc32c_batch(buf, offs_a, lens_a))
            len_bytes = lens_a.astype("<u8").view(np.uint8).reshape(n, 8) \
                if n else np.zeros((0, 8), np.uint8)
            got_len = crc32c_masked(crc32c_batch(
                len_bytes.reshape(-1), np.arange(n, dtype=np.int64) * 8,
                np.full(n, 8, np.int64)))
            if not (np.array_equal(got_data,
                                   np.array(want_data_crc, np.uint32))
                    and np.array_equal(got_len,
                                       np.array(want_len_crc, np.uint32))):
                raise ValueError("tfrecord: CRC32C mismatch")
            for o, ln in zip(offs, lens):
                f = _pb_example_fields(bytes(data[o:o + ln]))
                urls.append(f.get("url", b"").decode())
                texts.append(f.get("text", b"").decode())
        return pa.table({"url": pa.array(urls, pa.string()),
                         "text": pa.array(texts, pa.string())})

    return ds.map_batches(parse, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# WebDataset source/sink — tar shards of {key}.{ext} member files, the
# standard multimodal training-corpus layout (one sample = adjacent
# members sharing a key stem).
# ---------------------------------------------------------------------------

def write_webpages_wds(ds: ray.data.Dataset, root: str) -> None:
    """WebDataset sink: one ``.tar`` shard per block; each page
    becomes two adjacent members ``<md5(url)>.url`` / ``<...>.txt``.
    Member metadata is pinned (mtime/uid/gid = 0) so shard bytes are
    deterministic for a given block content."""
    import hashlib
    import io
    import os
    import tarfile

    os.makedirs(root, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        bio = io.BytesIO()
        with tarfile.open(fileobj=bio, mode="w") as tf:
            for url, text in zip(t["url"].to_pylist(),
                                 t["text"].to_pylist()):
                key = hashlib.md5(url.encode()).hexdigest()
                for ext, data in (("url", url.encode()),
                                  ("txt", text.encode())):
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(data)
                    info.mtime = 0
                    tf.addfile(info, io.BytesIO(data))
        payload = bio.getvalue()
        name = hashlib.md5(payload).hexdigest()[:16]
        _write_shard(root, f"part-{name}", "tar", payload)
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    ds.map_batches(dump, batch_format="pyarrow").materialize()


def read_webpages_wds(root: str) -> ray.data.Dataset:
    """WebDataset source: shard-parallel tar scan; members are grouped
    into samples by key stem (adjacency not required on read — a
    permuted tar still parses), yielding the (url, text) schema."""
    import io
    import tarfile

    ds = ray.data.read_binary_files(root, file_extensions=["tar"])

    def parse(b: pa.Table) -> pa.Table:
        urls, texts = [], []
        for blob in b["bytes"]:
            samples: dict[str, dict[str, bytes]] = {}
            order: list[str] = []
            with tarfile.open(fileobj=io.BytesIO(blob.as_py())) as tf:
                for m in tf.getmembers():
                    if not m.isfile():
                        continue
                    key, _, ext = m.name.rpartition(".")
                    if key not in samples:
                        samples[key] = {}
                        order.append(key)
                    samples[key][ext] = tf.extractfile(m).read()
            for key in order:
                s = samples[key]
                urls.append(s.get("url", b"").decode())
                texts.append(s.get("txt", b"").decode())
        return pa.table({"url": pa.array(urls, pa.string()),
                         "text": pa.array(texts, pa.string())})

    return ds.map_batches(parse, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# NPZ source/sink — numpy-native embedding shards (the artifact format
# training jobs checkpoint feature matrices in: one .npz per shard
# holding the id vector + the float32 matrix).
# ---------------------------------------------------------------------------

def write_embeddings_npz(ds: ray.data.Dataset, root: str) -> None:
    """NPZ sink: one ``part-<md5>.npz`` per block with ``vec_id``
    (int64), ``mat`` (float32, rows aligned to vec_id) and ``label``
    (int32). Uncompressed (np.savez) — the matrix bytes are already
    dense, and shard read parallelism matters more than ~0% zip gain."""
    import hashlib
    import io
    import os

    os.makedirs(root, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float32)
        label = t["label"].to_numpy(zero_copy_only=False).astype(np.int32)
        bio = io.BytesIO()
        np.savez(bio, vec_id=ids, mat=mat, label=label)
        payload = bio.getvalue()
        name = hashlib.md5(payload).hexdigest()[:16]
        _write_shard(root, f"part-{name}", "npz", payload)
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    ds.map_batches(dump, batch_format="pyarrow").materialize()


def read_embeddings_npz(root: str) -> ray.data.Dataset:
    """NPZ source: shard-parallel np.load (allow_pickle=False — object
    arrays in a data shard are a malformed input, not a feature),
    re-emitting the (vec_id, embedding list<float>, label) schema."""
    import io

    ds = ray.data.read_binary_files(root, file_extensions=["npz"])

    def parse(b: pa.Table) -> pa.Table:
        ids_all, emb_all, lab_all = [], [], []
        for blob in b["bytes"]:
            z = np.load(io.BytesIO(blob.as_py()), allow_pickle=False)
            ids_all.append(z["vec_id"].astype(np.int64))
            emb_all.append(z["mat"].astype(np.float32))
            lab_all.append(z["label"].astype(np.int32))
        ids = np.concatenate(ids_all) if ids_all else np.zeros(0, np.int64)
        lab = np.concatenate(lab_all) if lab_all else np.zeros(0, np.int32)
        mat = np.concatenate(emb_all) if emb_all else \
            np.zeros((0, 0), np.float32)
        flat = pa.array(mat.reshape(-1), pa.float32())
        emb = pa.FixedSizeListArray.from_arrays(flat, mat.shape[1]) \
            if mat.size else pa.array([], pa.list_(pa.float32()))
        return pa.table({"vec_id": pa.array(ids),
                         "embedding": emb.cast(pa.list_(pa.float32())),
                         "label": pa.array(lab)})

    return ds.map_batches(parse, batch_format="pyarrow")
