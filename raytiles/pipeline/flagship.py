"""Flagship end-to-end pipeline: webpages parquet -> encoded MVT tiles.

Ray-Data-native composition (see stages.py for the stage graph). The
caller owns the Ray session (never ray.init here — driver contract).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..geo import tilemath as tm
from ..geo.parse import GeoParser
from ..util import bucket_of
from .encode_stage import FastPointEncoder, MvtEncoder
from .stages import (TileAssigner, build_base_rtree, make_assign_fn,
                     merge_tile_partials, pack_tile_partials)

DEFAULT_ZOOM = 12


def _pool_size(concurrency, frac: float = 0.33):
    """Default actor-pool size: autoscaling (cpus//8, ~cpus*frac).
    The floor scales with the cluster so pools ramp immediately at
    high parallelism, while the SUM of floors across the pipeline's
    three pools stays under the CPU count (fixed equal pools deadlock
    a small cluster: 3 pools x 2 actors > 4 CPUs leaves a stage with
    no actor)."""
    if concurrency is not None:
        return concurrency
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return (max(1, cpus // 8), max(2, int(cpus * frac)))


TARGET_BLOCK_BYTES = 96 << 20  # input bytes per read task (pre-explode)


def read_webpages(path: str, columns=("url", "text"),
                  num_blocks: int | None = None) -> ray.data.Dataset:
    """Prune at the read: the flagship needs only url + text (html and
    lang stay in storage).

    ``num_blocks`` caps the read task count — and with it the fused
    read->parse->assign->pack chain's OUTPUT block count, which is the
    width of the downstream sort shuffle. The sort's all-to-all cost
    grows ~QUADRATICALLY in that width (M mapper blocks x R reducers
    object transfers; measured on the same 5.4M-doc input at 16 cpus:
    32 blocks -> 0.49s shuffle, 64 -> 1.33s, 128 -> 3.73s), so the
    default derives the count from the INPUT SIZE (bounded ~96MB of
    input per block), not from the cluster: the same dataset gets the
    same layout at every cluster size (cpu-scaled counts made the 4N
    leg pay 16x the shuffle objects of the N leg), and block size
    stays bounded as data grows. Floor 64 keeps map-phase granularity
    (>=2 tasks/cpu up to 32 cpus); cap 512 bounds the M x R explosion
    on huge single-shuffle inputs — beyond that, shard the job (the
    checkpointed tile_job runs shard-sized shuffles for exactly this
    reason)."""
    if num_blocks is None:
        total = 0
        if os.path.isdir(path):
            with os.scandir(path) as it:
                total = sum(e.stat().st_size for e in it if e.is_file())
        elif os.path.isfile(path):
            total = os.path.getsize(path)
        num_blocks = min(512, max(64, total // TARGET_BLOCK_BYTES))
    return ray.data.read_parquet(path, columns=list(columns),
                                 override_num_blocks=num_blocks)


def geoparse(ds: ray.data.Dataset, *, concurrency=None, batch_size: int = 4096) -> ray.data.Dataset:
    """documents -> exploded mention rows (url, mention_idx, lon, lat).
    Task-based (regex compiled once per worker process), Arrow
    end-to-end: the candidate prefilter runs pc.match_substring_regex
    on the zero-copy batch, and the master regex runs over the
    filtered column's raw UTF-8 buffer (GeoParser.parse_arrow) — no
    Python string ever materializes for text, cutting allocator and
    cache pressure that compounds at high worker counts."""
    import pyarrow as pa
    import pyarrow.compute as pc
    parser = GeoParser()
    EMPTY = pa.schema([("url", pa.string()), ("mention_idx", pa.int32()),
                       ("lon", pa.float64()), ("lat", pa.float64())])

    def parse_batch(batch: pa.Table) -> pa.Table:
        mask = pc.match_substring_regex(batch["text"], parser.prefilter)
        sub = batch.filter(mask)
        if sub.num_rows == 0:
            return EMPTY.empty_table()
        row_pos, mention_idx, lat, lon = parser.parse_arrow(sub["text"])
        return pa.table({
            "url": sub["url"].take(pa.array(row_pos)),
            "mention_idx": pa.array(mention_idx, pa.int32()),
            "lon": pa.array(lon, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
        })

    return ds.map_batches(parse_batch, batch_format="pyarrow", batch_size=batch_size)


def assign(ds: ray.data.Dataset, zoom: int = DEFAULT_ZOOM, *,
           concurrency=None, batch_size: int = 8192,
           with_cells: bool = True) -> ray.data.Dataset:
    """mention rows -> tile/cell assignments. The base-zoom R-tree is
    built once on the driver and broadcast via ray.put; each worker
    process ray.gets and caches it on first use (stages.make_assign_fn),
    never re-shipped per batch."""
    rtree_ref = ray.put(build_base_rtree())
    return ds.map_batches(make_assign_fn(zoom, rtree_ref, with_cells=with_cells),
                          batch_format="pyarrow", batch_size=batch_size)


def aggregate_tiles(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Two-phase tile aggregation: per-batch partial pack into per-tile
    rows capped at 512 features (no shuffle), then ONE shuffle keyed by
    bucket = splitmix(z,x,y) % 1024 (bounded key domain; city skew
    spreads across buckets tile-by-tile), then a whole-block merge that
    re-splits into per-tile packed rows with pure offset arithmetic.

    The merge is map_batches(batch_size=None) over the shuffle's output
    blocks, NOT groupby().map_groups(): the merge only needs all
    partials of a tile co-located in one block (which the shuffle
    guarantees — see merge_tile_partials), so per-group slicing +
    format conversion x 1024 groups is pure overhead.

    GRAFT_AGG_SHUFFLE selects the exchange: "sort" (default; Ray's
    sample + range-partition sort) or "hash" (hash-partition
    repartition — streams through aggregator actors without the sort's
    sample barrier, at the cost of actor-pool spin-up)."""
    packed = ds.map_batches(pack_tile_partials, batch_format="pyarrow")
    if os.environ.get("GRAFT_AGG_SHUFFLE", "sort") == "hash":
        # NOTE: Datasets snapshot DataContext at creation — the caller
        # must set shuffle_strategy=HASH_SHUFFLE before building the
        # pipeline (tiles_pipeline does this when the env knob is set)
        shuffled = packed.repartition(
            num_blocks=_shuffle_width(), keys=["bucket"])
    else:
        # explicit range boundaries over the KNOWN bucket domain
        # [0, N_MERGE_BUCKETS): skips the sort's sample stage (a
        # barrier + one extra pass over every block's key column) —
        # bucket ids are already a uniform hash, so uniform boundaries
        # equal what sampling would estimate
        from .stages import N_MERGE_BUCKETS
        n_out = _shuffle_width()
        step = N_MERGE_BUCKETS / n_out
        bounds = [int(step * i) for i in range(1, n_out)]
        shuffled = packed.sort("bucket", boundaries=bounds)
    return shuffled.map_batches(merge_tile_partials, batch_size=None,
                                zero_copy_batch=True, batch_format="pyarrow")


def _shuffle_width() -> int:
    """Reducer count for the tile exchange. Floor 64 keeps the SAME
    layout at every cluster size up to 64 cpus (a cpu-scaled count
    gives the 4N leg a different shuffle than the N leg — measured as
    a direct efficiency hit), rising to one reducer per CPU on bigger
    clusters; capped at the bucket domain (reducers receive whole
    buckets, so more reducers than buckets is useless)."""
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    from .stages import N_MERGE_BUCKETS
    return min(N_MERGE_BUCKETS, max(64, cpus))


def encode_tiles(ds: ray.data.Dataset, *, concurrency=None,
                 batch_size: int = 4096, extent: int = 4096) -> ray.data.Dataset:
    """Packed tile rows -> {z,x,y,mvt,...} via the vectorized encoder.

    ``batch_size=4096`` (~55k features/call at sfbig12) beats both
    whole-block batches and the nested-task fanout, MEASURED
    (sfbig12/16cpu, interleaved A/B): 4096-inline 20.2s e2e vs
    whole-block+fanout 24.7s. Chunked calls keep the kernel's working
    set L3-sized, and the fanout's object-store round trips cost more
    than the straggler they spread: the fat reducer block's inline
    encode is only ~1.2s (and the hottest single tile ~0.5s), while
    fanout doubled the reduce operator's CPU time (59.5s vs 27.3s
    parent-side) and blocked the parent in ray.get for half its wall
    time. Sub-tile fanout stays available via GRAFT_ENCODE_CHUNK for
    genuinely mega single tiles (>=2x ENCODE_CHUNK_FEATURES).

    Default is task-based (encoder instance cached per worker process):
    on this single-node setup an actor pool costs ~2s spin-up per
    execution (measured: a NOOP 28-actor pool = 1.7-2.1s) while the
    encoder's per-actor state is just reusable buffers. Pass
    ``concurrency=N`` to run the same class as a bounded actor pool —
    the right choice when per-actor state is expensive (big models) or
    memory must be capped per node."""
    chunk = int(os.environ.get("GRAFT_ENCODE_CHUNK", "0")) or None
    kwargs = {"extent": extent}
    if chunk is not None:
        kwargs["chunk_features"] = chunk  # <=0 disables the fanout path
    if concurrency is not None:
        return ds.map_batches(FastPointEncoder, batch_format="pyarrow",
                              batch_size=batch_size, concurrency=concurrency,
                              fn_constructor_kwargs=kwargs)
    encoder = FastPointEncoder(**kwargs)

    def encode_batch(batch):
        return encoder(batch)

    return ds.map_batches(encode_batch, batch_format="pyarrow", batch_size=batch_size)


def tiles_pipeline(webpages_path: str, zoom: int = DEFAULT_ZOOM, *,
                   parse_concurrency=None, encode_concurrency=None) -> ray.data.Dataset:
    """Full pipeline, lazy — consume with write_parquet / iter_batches."""
    if os.environ.get("GRAFT_AGG_SHUFFLE") == "hash":
        from ray.data.context import DataContext, ShuffleStrategy
        DataContext.get_current().shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ds = read_webpages(webpages_path)
    ds = geoparse(ds, concurrency=parse_concurrency)
    ds = assign(ds, zoom, with_cells=False)  # cells unused downstream
    ds = aggregate_tiles(ds)
    return encode_tiles(ds, concurrency=encode_concurrency)


def cell_counts_pipeline(webpages_path: str, res: int = 5,
                         n_buckets: int = 1024) -> ray.data.Dataset:
    """Per-cell mention + distinct-doc counts, DISTRIBUTED (round 1
    aggregated on the driver — the one gate operator that wasn't):
    the per-batch partial collapses to one row per (cell, url, batch),
    then ONE bounded-bucket groupby counts vectorized within buckets.
    Distinct-url counting is exact because a cell's rows all land in
    the same bucket (bucket is a pure function of the cell id)."""
    def partial(b: pa.Table) -> pa.Table:
        cell = tm.cell_id(b["lon"].to_numpy(), b["lat"].to_numpy(), res)
        t = pa.table({"cell_r5": cell, "url": b["url"]})
        part = pa.TableGroupBy(t, ["cell_r5", "url"]).aggregate(
            [([], "count_all")])
        part = part.rename_columns(["cell_r5", "url", "n"])
        bucket = bucket_of(part["cell_r5"].to_numpy(), n_buckets)
        return part.set_column(2, "n", pc.cast(part["n"], pa.int64())) \
            .append_column("bucket", pa.array(bucket))

    def merge(g: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(g.select(["cell_r5", "url", "n"]),
                              "cell_r5").aggregate(
            [("n", "sum"), ("url", "count_distinct")])
        out = out.rename_columns(["cell_r5", "n_mentions", "n_docs"])
        return pa.table({"cell_r5": pc.cast(out["cell_r5"], pa.int64()),
                         "n_mentions": pc.cast(out["n_mentions"], pa.int64()),
                         "n_docs": pc.cast(out["n_docs"], pa.int64())})

    ds = geoparse(read_webpages(webpages_path))
    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").map_groups(merge, batch_format="pyarrow")


def assignments_pipeline(webpages_path: str, zoom: int = DEFAULT_ZOOM) -> ray.data.Dataset:
    """read -> geoparse -> assign (no aggregation): the join-output /
    tile-assignment rows the rule requires matching exactly."""
    ds = read_webpages(webpages_path)
    ds = geoparse(ds)
    return assign(ds, zoom)


def pyramid_mvt_pipeline(webpages_path: str, base_zoom: int = DEFAULT_ZOOM,
                         levels: int = 3) -> ray.data.Dataset:
    """Multi-zoom MVT pyramid from ONE assignment pass (the
    tippecanoe-style zoom build): every mention is replicated to
    ``levels`` zoom levels with pure integer-shift coordinate
    transforms, then the ordinary pack -> one bounded shuffle ->
    merge -> encode chain emits real MVT tiles for every level.

    Exactness: local-at-parent = ((x & (2^d - 1)) * extent + local)
    >> d, and floor(floor(G) / 2^d) == floor(G / 2^d) (nested-floor
    identity), so level d tiles are BYTE-IDENTICAL to running the
    flagship directly at base_zoom - d — pinned by test. Fan-out is
    the bounded factor ``levels``; everything downstream reuses the
    flagship's shuffle discipline unchanged."""
    ds = geoparse(read_webpages(webpages_path))
    ds = assign(ds, base_zoom, with_cells=False)

    def replicate(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy().astype(np.int64)
        y = b["y"].to_numpy().astype(np.int64)
        lx = b["local_x"].to_numpy().astype(np.int64)
        ly = b["local_y"].to_numpy().astype(np.int64)
        parts = []
        for d in range(levels):
            m = (1 << d) - 1
            parts.append(pa.table({
                "url": b["url"],
                "mention_idx": b["mention_idx"],
                "z": pa.array(np.full(len(x), base_zoom - d, np.int32)),
                "x": pa.array((x >> d).astype(np.int32)),
                "y": pa.array((y >> d).astype(np.int32)),
                "local_x": pa.array(
                    (((x & m) * 4096 + lx) >> d).astype(np.int32)),
                "local_y": pa.array(
                    (((y & m) * 4096 + ly) >> d).astype(np.int32))}))
        return pa.concat_tables(parts)

    rep = ds.map_batches(replicate, batch_format="pyarrow")
    return encode_tiles(aggregate_tiles(rep))


def iceberg_cells_pipeline(webpages_path: str, res: int = 5,
                           ppm_threshold: int = 5000) -> "pd.DataFrame":
    """Iceberg query over the r-grid: cells holding MORE than
    `ppm_threshold` parts-per-million of ALL mentions (default 0.5%) —
    the hotspot-share report that needs a GLOBAL total before any
    group can be admitted. Classic because naive SQL needs a
    subquery/cross-join; here the bounded per-cell count table (the
    cell_counts pipeline — distributed, exact-distinct) folds to the
    total and the share filter on the driver at O(cells), not O(rows).
    Shares are reported as exact integer ppm (n * 1e6 // total) — no
    float rounding to negotiate with the twin."""
    cells = cell_counts_pipeline(webpages_path, res).to_pandas()
    total = int(cells["n_mentions"].sum())
    ppm = cells["n_mentions"].to_numpy().astype(np.int64) \
        * np.int64(1_000_000) // total
    keep = ppm > ppm_threshold
    out = cells.loc[keep].copy()
    out["share_ppm"] = ppm[keep]
    out = out.sort_values("cell_r5").reset_index(drop=True)
    return out[["cell_r5", "n_mentions", "n_docs", "share_ppm"]]
