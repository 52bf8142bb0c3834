"""Deterministic Common-Crawl-style webpages table (the engine input
shape mandated by BASELINE.json `input_hint`):

    url:     string        "https://site{i % 1000}.example/page/{i}"
    warc_ts: timestamp[us]
    html:    binary        b"<html><body>" + text + b"</body></html>"
    text:    string        filler + 0-4 geo mentions (byte-stable per url)
    lang:    string        en 90%, de/fr split the rest

Seeded (seed=42) and fully vectorized; ~30% of rows embed 1-4 geo
mentions in the three grammars of raytiles.geo.parse, with coordinates
drawn 80% from ~20 fixed city centers (deliberate mega-tile skew) and
20% uniform. Remaining rows carry decoy numerals (prices, versions,
dates) that must NOT geoparse.

The table is written once per scale tier to
/tmp/raytiles_synth/<sf>/webpages.parquet and reused; generation is a
pure function of (n_rows, seed), so the per-row text is byte-identical
across runs (the per-row invariant the rule requires).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
SYNTH_ROOT = "/tmp/raytiles_synth"

# ~20 fixed "city" centers (lat, lon) — public well-known coordinates,
# chosen to force hot tiles at z>=10
CITIES = np.array([
    (37.7749, -122.4194), (40.7128, -74.0060), (51.5074, -0.1278),
    (48.8566, 2.3522), (35.6762, 139.6503), (52.5200, 13.4050),
    (55.7558, 37.6173), (39.9042, 116.4074), (19.4326, -99.1332),
    (-23.5505, -46.6333), (28.6139, 77.2090), (1.3521, 103.8198),
    (-33.8688, 151.2093), (30.0444, 31.2357), (41.8781, -87.6298),
    (34.0522, -118.2437), (43.6532, -79.3832), (-34.6037, -58.3816),
    (59.3293, 18.0686), (25.2048, 55.2708),
], dtype=np.float64)

_FILLER_WORDS = np.array(
    "the a web page content about travel report city data history "
    "culture news article review guide local market street food".split())

_DECOYS = np.array([
    "price $12.99 only", "version 3.25 released", "updated 12.05.2024",
    "rated 4.5 of 5", "ISBN 978.0306", "error code 404.31",
])

SF_ROWS = {"sf0.001": 500, "sf0.01": 60_000, "sf0.1": 600_000,
           "sfbig": 1_800_000,    # scaling-bench tier
           "sfbig3": 5_400_000,   # large scaling tier (chunked generation)
           "sfbig6": 10_800_000,  # large scaling tier
           "sfbig12": 21_600_000}  # 2-cluster-size criterion tier: big
                                   # enough that fixed pipeline-fill
                                   # cost is <5% of the small-cluster T

GEN_CHUNK = 1_800_000  # generate deterministically in chunks (seed 42+i)


def _format4(v: np.ndarray) -> np.ndarray:
    """Vectorized '%.4f' via char-level assembly (np.char is slow but
    this runs once per tier and is cached on disk)."""
    return np.char.mod("%.4f", np.round(v, 4))


def generate_webpages(n_rows: int, seed: int = SEED, idx_offset: int = 0) -> pa.Table:
    rng = np.random.default_rng(seed)
    idx = np.arange(idx_offset, idx_offset + n_rows)

    url = np.char.add(
        np.char.add("https://site", (idx % 1000).astype("U4")),
        np.char.add(".example/page/", idx.astype("U12")))

    warc_ts = (np.int64(1704067200_000_000) + idx.astype(np.int64) * 1_000_000)  # 2024-01-01 + i sec

    lang = rng.choice(np.array(["en", "de", "fr"]), size=n_rows, p=[0.9, 0.05, 0.05])

    # mention counts: 70% zero, else 1-4
    has_geo = rng.random(n_rows) < 0.30
    n_mentions = np.where(has_geo, rng.integers(1, 5, size=n_rows), 0)

    total_mentions = int(n_mentions.sum())
    # coordinates: 80% city-clustered (normal jitter sigma 0.05 deg), 20% uniform
    clustered = rng.random(total_mentions) < 0.80
    city_idx = rng.integers(0, len(CITIES), size=total_mentions)
    lat = np.where(clustered,
                   CITIES[city_idx, 0] + rng.normal(0, 0.05, total_mentions),
                   rng.uniform(-85.0, 85.0, total_mentions))
    lon = np.where(clustered,
                   CITIES[city_idx, 1] + rng.normal(0, 0.05, total_mentions),
                   rng.uniform(-180.0, 179.999, total_mentions))
    lat = np.clip(lat, -85.05, 85.05)
    lon = np.clip(lon, -180.0, 179.9999)

    fmt_choice = rng.integers(0, 3, size=total_mentions)
    lat_s = _format4(lat)
    lon_s = _format4(lon)
    alat_s = _format4(np.abs(lat))
    alon_s = _format4(np.abs(lon))
    ns = np.where(lat >= 0, "N", "S")
    ew = np.where(lon >= 0, "E", "W")

    m1 = np.char.add(np.char.add(np.char.add("located at ", lat_s), ", "), lon_s)
    m2 = np.char.add(np.char.add(np.char.add("(lat ", lat_s), ", lon "), np.char.add(lon_s, ")"))
    m3 = np.char.add(np.char.add(np.char.add(alat_s, ns), " "), np.char.add(alon_s, ew))
    mention_strs = np.where(fmt_choice == 0, m1, np.where(fmt_choice == 1, m2, m3))

    # filler: 6 seeded words + a decoy fragment per row
    words = rng.choice(_FILLER_WORDS, size=(n_rows, 6))
    filler = words[:, 0]
    for k in range(1, 6):
        filler = np.char.add(np.char.add(filler, " "), words[:, k])
    decoy = rng.choice(_DECOYS, size=n_rows)
    base = np.char.add(np.char.add(filler, " "), decoy)

    # assemble text: base + " " + mention + " " + word ... per slot
    text = base
    offsets = np.concatenate([[0], np.cumsum(n_mentions)])
    glue = rng.choice(_FILLER_WORDS, size=(n_rows, 4))
    for slot in range(4):
        take = n_mentions > slot
        mention_slot = np.full(n_rows, "", dtype=mention_strs.dtype if total_mentions else "U1")
        if total_mentions:
            mention_slot[take] = mention_strs[offsets[:-1][take] + slot]
        seg = np.where(take,
                       np.char.add(np.char.add(" ", mention_slot),
                                   np.char.add(" ", glue[:, slot])),
                       "")
        text = np.char.add(text, seg)

    html = np.char.add(np.char.add("<html><body>", text), "</body></html>")

    return pa.table({
        "url": pa.array(url.tolist(), type=pa.string()),
        "warc_ts": pa.array(warc_ts, type=pa.timestamp("us")),
        "html": pa.array([s.encode() for s in html.tolist()], type=pa.binary()),
        "text": pa.array(text.tolist(), type=pa.string()),
        "lang": pa.array(lang.tolist(), type=pa.string()),
    })


N_SHARDS = 64   # sharded so read_parquet parallelizes across tasks
ROW_GROUP = 16384  # small row groups let Ray split a file into >1 read task
_LAYOUT_VERSION = "v2-shards64-rg16384"


def webpages_path(sf_dir: str) -> str:
    """Materialize (once) and return the webpages parquet path for a
    testdata scale dir like /root/testdata/sf0.01. Output is a
    DIRECTORY of N_SHARDS files with small row groups: Ray fuses
    read->parse->assign->pack into ONE task chain whose parallelism
    equals the read-task count, so 16 fat single-row-group files cap
    the whole map phase at 16 concurrent tasks — the round-1 scaling
    bottleneck (speedup 8->32 cpus plateaued near 2x). 64 files x
    16k-row groups give the scheduler >=2 tasks per core at 32 cpus."""
    sf = os.path.basename(os.path.normpath(sf_dir))
    n_rows = SF_ROWS.get(sf)
    if n_rows is None:  # derive from the tier's documents rowcount
        n_rows = 500
    out_dir = os.path.join(SYNTH_ROOT, sf)
    path = os.path.join(out_dir, "webpages.parquet")
    done = os.path.join(out_dir, ".done")
    stale = True
    if os.path.exists(done):
        with open(done) as fh:
            stale = fh.read().strip() != _LAYOUT_VERSION
    if stale:
        os.makedirs(out_dir, exist_ok=True)
        import shutil
        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        # generate in chunks (np.char unicode arrays are memory-hungry
        # at >2M rows); each chunk is a pure function of (rows, seed)
        shard_no = 0
        remaining = n_rows
        chunk_seed = SEED
        while remaining > 0:
            rows = min(remaining, GEN_CHUNK)
            table = generate_webpages(rows, seed=chunk_seed,
                                      idx_offset=n_rows - remaining)
            per = max(1, -(-rows // N_SHARDS))
            for i in range(N_SHARDS):
                part = table.slice(i * per, per)
                if part.num_rows:
                    pq.write_table(part, os.path.join(tmp, f"part-{shard_no:03d}.parquet"),
                                   row_group_size=ROW_GROUP)
                    shard_no += 1
            remaining -= rows
            chunk_seed += 1
            del table
        if os.path.isfile(path):  # migrate from old single-file layout
            os.remove(path)
        shutil.rmtree(path, ignore_errors=True)
        os.replace(tmp, path)  # atomic publish
        with open(done, "w") as fh:
            fh.write(_LAYOUT_VERSION)
    return path
