"""TFRecord + WebDataset containers: CRC32C kernel ground truth,
framing roundtrips, corruption detection, proto encode/decode."""

import io
import struct
import tarfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE

pytestmark = pytest.mark.usefixtures("ray_session")


def _crc32c_ref(bs: bytes) -> int:
    c = 0xFFFFFFFF
    for byte in bs:
        c ^= byte
        for _ in range(8):
            c = (0x82F63B78 ^ (c >> 1)) if c & 1 else c >> 1
    return c ^ 0xFFFFFFFF


def test_crc32c_batch_against_bitwise_reference():
    from raytiles.util import crc32c_batch
    rng = np.random.default_rng(7)
    chunks = [bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
              for n in (0, 1, 9, 100, 1000, 31)]
    buf = np.frombuffer(b"".join(chunks), np.uint8)
    lens = np.array([len(c) for c in chunks], np.int64)
    offs = np.concatenate([[0], np.cumsum(lens[:-1])])
    got = crc32c_batch(buf, offs, lens)
    for c, g in zip(chunks, got):
        assert int(g) == _crc32c_ref(c)
    # standard check value
    assert crc32c_batch(np.frombuffer(b"123456789", np.uint8),
                        np.array([0]), np.array([9]))[0] == 0xE3069283


def test_pb_example_roundtrip():
    from raytiles.pipeline.sources import _pb_example, _pb_example_fields
    fields = [(b"url", b"http://x/y?z=1"), (b"text", "héllo wörld".encode())]
    blob = _pb_example(fields)
    got = _pb_example_fields(blob)
    assert got == {"url": b"http://x/y?z=1", "text": "héllo wörld".encode()}


def test_tfrecord_roundtrip_and_crc_guard(tmp_path):
    import ray.data as rd

    from raytiles.pipeline.sources import (read_webpages_tfrecord,
                                           write_webpages_tfrecord)
    from raytiles.pipeline.synth import webpages_path
    wp = webpages_path(SF_SMOKE)
    root = str(tmp_path / "tfrec")
    write_webpages_tfrecord(rd.read_parquet(wp, columns=["url", "text"]),
                            root)
    got = read_webpages_tfrecord(root).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    want = pq.read_table(wp, columns=["url", "text"]).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert got.equals(want)

    # flip one payload byte in one shard -> the read must fail loudly
    import glob
    import os
    shard = sorted(glob.glob(os.path.join(root, "*.tfrecord")))[0]
    data = bytearray(open(shard, "rb").read())
    (ln,) = struct.unpack_from("<Q", data, 0)
    data[12 + ln // 2] ^= 0xFF
    open(shard, "wb").write(bytes(data))
    with pytest.raises(Exception, match="CRC32C|RayTaskError"):
        read_webpages_tfrecord(root).materialize()


def test_wds_roundtrip_and_member_layout(tmp_path):
    import ray.data as rd

    from raytiles.pipeline.sources import (read_webpages_wds,
                                           write_webpages_wds)
    from raytiles.pipeline.synth import webpages_path
    wp = webpages_path(SF_SMOKE)
    root = str(tmp_path / "wds")
    write_webpages_wds(rd.read_parquet(wp, columns=["url", "text"]), root)
    got = read_webpages_wds(root).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    want = pq.read_table(wp, columns=["url", "text"]).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert got.equals(want)

    # shard layout: adjacent .url/.txt members per key, pinned metadata
    import glob
    import os
    shard = sorted(glob.glob(os.path.join(root, "*.tar")))[0]
    with tarfile.open(shard) as tf:
        members = tf.getmembers()
    assert len(members) % 2 == 0
    for a, b in zip(members[0::2], members[1::2]):
        assert a.name.rsplit(".", 1)[0] == b.name.rsplit(".", 1)[0]
        assert {a.name.rsplit(".", 1)[1], b.name.rsplit(".", 1)[1]} == \
            {"url", "txt"}
        assert a.mtime == 0 and a.uid == 0 and a.gid == 0


def test_npz_roundtrip_preserves_vectors(tmp_path):
    import ray.data as rd

    from raytiles.pipeline.sources import (read_embeddings_npz,
                                           write_embeddings_npz)
    root = str(tmp_path / "npz")
    src = f"{SF_SMOKE}/embeddings.parquet"
    write_embeddings_npz(
        rd.read_parquet(src, columns=["vec_id", "embedding", "label"]),
        root)
    got = read_embeddings_npz(root).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    want = pq.read_table(src).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert np.array_equal(got["vec_id"], want["vec_id"])
    assert np.array_equal(got["label"], want["label"])
    gm = np.stack(got["embedding"].to_numpy())
    wm = np.stack(want["embedding"].to_numpy()).astype(np.float32)
    assert np.array_equal(gm, wm)  # float32 roundtrip is bit-exact
