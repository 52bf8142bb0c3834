"""Worker-shippability regression: every stage callable must
cloudpickle-deserialize in a process that CANNOT import raytiles from
disk (ray workers when the driver runs outside the repo). Catches the
lazy-relative-import class of bug (an inner `from ..x import y`
executing on the worker) that shows up as a silent pipeline hang."""

import subprocess
import sys
import tempfile

LOADER = """
import sys
assert not any('repo' in p for p in sys.path), sys.path
from ray import cloudpickle
import pyarrow as pa, pandas as pd, numpy as np
fn = cloudpickle.loads(open(sys.argv[1], 'rb').read())
kind = sys.argv[2]
if kind == 'encode':
    batch = pa.table({
        'z': pa.array([12], pa.int32()), 'x': pa.array([655], pa.int32()),
        'y': pa.array([1583], pa.int32()),
        'urls': pa.array([['https://a/1', 'https://b/2']], pa.list_(pa.string())),
        'mention_idx': pa.array([[0, 1]], pa.list_(pa.int32())),
        'local_x': pa.array([[100, 4095]], pa.list_(pa.int32())),
        'local_y': pa.array([[0, 2048]], pa.list_(pa.int32())),
    })
    out = fn(batch)
    assert out.num_rows == 1 and len(out['mvt'][0].as_py()) > 10
elif kind == 'parse':
    out = fn(pd.DataFrame({'url': ['u'], 'text': ['located at 1.0000, 2.0000']}))
    assert len(out) == 1
elif kind == 'decode':
    raw = open('/root/reference/test/onepoint.mvt', 'rb').read()
    tile, err = fn(raw)
    assert err is None and len(tile.layers) == 1
elif kind == 'pack':
    batch = pa.table({
        'url': pa.array(['a', 'b']), 'mention_idx': pa.array([0, 0], pa.int32()),
        'z': pa.array([12, 12], pa.int32()), 'x': pa.array([1, 1], pa.int32()),
        'y': pa.array([2, 2], pa.int32()),
        'local_x': pa.array([5, 6], pa.int32()), 'local_y': pa.array([7, 8], pa.int32()),
    })
    out = fn(batch)
    assert out.num_rows == 1
print('OK')
"""


def _roundtrip_in_clean_process(obj, kind: str) -> None:
    from ray import cloudpickle
    with tempfile.NamedTemporaryFile(suffix=".bin") as fh:
        fh.write(cloudpickle.dumps(obj))
        fh.flush()
        res = subprocess.run([sys.executable, "-c", LOADER, fh.name, kind],
                             capture_output=True, text=True, cwd="/tmp")
        assert res.returncode == 0 and "OK" in res.stdout, \
            f"{kind}: {res.stderr[-800:]}"


def test_encoder_ships_by_value():
    from raytiles.pipeline.encode_stage import FastPointEncoder
    enc = FastPointEncoder()

    def encode_batch(b):
        return enc(b)

    _roundtrip_in_clean_process(encode_batch, "encode")


def test_parser_ships_by_value():
    from raytiles.geo.parse import GeoParser
    parser = GeoParser()

    def parse_batch(b):
        return parser(b)

    _roundtrip_in_clean_process(parse_batch, "parse")


def test_pack_and_merge_ship_by_value():
    from raytiles.pipeline.stages import merge_tile_partials, pack_tile_partials
    _roundtrip_in_clean_process(pack_tile_partials, "pack")
    # merge needs the packed schema; deserialization alone proves
    # shippability (invocation is covered by the pipeline tests)
    from ray import cloudpickle
    code = ("import sys; assert not any('repo' in p for p in sys.path); "
            "from ray import cloudpickle; "
            "cloudpickle.loads(open(sys.argv[1],'rb').read()); print('OK')")
    with tempfile.NamedTemporaryFile(suffix=".bin") as fh:
        fh.write(cloudpickle.dumps(merge_tile_partials))
        fh.flush()
        res = subprocess.run([sys.executable, "-c", code, fh.name],
                             capture_output=True, text=True, cwd="/tmp")
        assert res.returncode == 0 and "OK" in res.stdout, res.stderr[-500:]


def test_trajectory_and_raster_fns_ship_by_value():
    from ray import cloudpickle
    import subprocess as sp
    from raytiles.pipeline.trajectories import encode_trajectories
    from raytiles.ops.extract import extract_batch
    for fn in (encode_trajectories, extract_batch):
        blob = cloudpickle.dumps(fn)
        code = ("import sys; assert not any('repo' in p for p in sys.path); "
                "from ray import cloudpickle; "
                "cloudpickle.loads(open(sys.argv[1],'rb').read()); print('OK')")
        with tempfile.NamedTemporaryFile(suffix=".bin") as fh:
            fh.write(blob)
            fh.flush()
            res = sp.run([sys.executable, "-c", code, fh.name],
                         capture_output=True, text=True, cwd="/tmp")
            assert res.returncode == 0 and "OK" in res.stdout, res.stderr[-500:]


def test_decode_ships_by_value():
    """codec.decode must ship to workers: a module-level
    struct.Struct (unpicklable) once broke every decode-using stage
    while the library itself imported fine locally."""
    from raytiles.codec.decode import decode_tile_safe
    _roundtrip_in_clean_process(decode_tile_safe, "decode")


def test_no_uint64_output_columns_in_stages():
    """Convention guard (CLAUDE.md): stages must not emit pa.uint64()
    columns — values >= 2^63 can silently round through float64 in
    Ray's streamed output path. The codec's arrowio feature table is
    exempt: its uint64 fields mirror the MVT spec's Word64 id/uint
    types (VectorTile.hs:123, Value.hs:53-57) and never ride a
    shuffle."""
    import pathlib
    root = pathlib.Path(__file__).resolve().parent.parent / "raytiles"
    offenders = []
    for sub in ("ops", "pipeline", "geo"):
        for p in sorted((root / sub).glob("*.py")):
            for i, line in enumerate(p.read_text().splitlines(), 1):
                code = line.split("#", 1)[0]
                if "pa.uint64()" in code:
                    offenders.append(f"{p.name}:{i}")
    assert not offenders, offenders


def test_derive_buckets_scaling(tmp_path):
    """Bucket-count derivation: floor at small inputs (historical
    layouts unchanged), linear in input bytes past the floor, capped,
    explicit override wins, env hook forces."""
    import os

    from raytiles.util import derive_buckets, resolve_buckets

    f = tmp_path / "t.parquet"
    f.write_bytes(b"x" * 1024)  # 1 KiB input
    assert derive_buckets(str(f), floor=256) == 256   # below floor
    # linear region: 100 buckets' worth of bytes at a tiny target
    assert derive_buckets(str(f), floor=4, target_bytes=8) == 128
    assert derive_buckets(str(f), floor=4, cap=64, target_bytes=8) == 64
    # directory form sums member files
    d = tmp_path / "dir.parquet"
    d.mkdir()
    (d / "a").write_bytes(b"x" * 512)
    (d / "b").write_bytes(b"x" * 512)
    assert derive_buckets(str(d), floor=4, target_bytes=8) == 128
    # resolve: explicit beats derivation
    assert resolve_buckets(17, str(f), 256) == 17
    assert resolve_buckets(None, str(f), 256) == 256
    # env hook (the layout-invariance gate run)
    os.environ["RAYTILES_FORCE_BUCKETS"] = "33"
    try:
        assert derive_buckets(str(f), floor=256) == 33
    finally:
        del os.environ["RAYTILES_FORCE_BUCKETS"]
