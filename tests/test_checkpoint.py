"""Checkpoint/resume: per-partition manifests, atomic publish, and
resume skipping completed partitions."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from raytiles.pipeline import checkpoint as cp

pytestmark = pytest.mark.usefixtures("ray_session")


def make_double_transform():
    # a closure, so cloudpickle ships it by value to ray workers
    def double_transform(t: pa.Table) -> pa.Table:
        return t.append_column("double", pa.array(
            (t["value"].to_numpy() * 2).astype(np.int64), pa.int64()))
    return double_transform


def _make_ds(ray, n=1000):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "key": pa.array(np.arange(n) % 17, pa.int64()),
        "value": pa.array(np.arange(n), pa.int64()),
    }))


def test_run_and_resume(ray_session, tmp_path):
    root = str(tmp_path / "ckpt")
    ds = _make_ds(ray_session)
    summary = cp.run_partitioned(ds, make_double_transform(), root, num_partitions=8)
    assert summary["computed"] == 8 and summary["skipped"] == 0
    assert summary["rows_out"] == 1000
    # manifests carry lineage + metrics
    recs = cp.finished_partitions(root)
    assert len(recs) == 8
    rec = next(iter(recs.values()))
    assert rec["status"] == "done" and rec["input_fingerprint"]
    assert rec["rows_in"] >= 0 and "wall_sec" in rec and rec["bytes_out"] > 0
    # full output readable and correct
    out = cp.read_output(root).to_pandas().sort_values("value").reset_index(drop=True)
    assert (out["double"] == out["value"] * 2).all()

    # resume: everything skipped, nothing recomputed
    summary2 = cp.run_partitioned(ds, make_double_transform(), root, num_partitions=8)
    assert summary2["skipped"] == 8 and summary2["computed"] == 0
    assert summary2["rows_out"] == 1000


def test_partial_failure_resume(ray_session, tmp_path):
    """Simulate a killed job: drop 3 manifest records (as if those
    partitions never finished) — resume recomputes exactly those."""
    root = str(tmp_path / "ckpt")
    ds = _make_ds(ray_session)
    cp.run_partitioned(ds, make_double_transform(), root, num_partitions=8)
    for pid in (1, 4, 6):
        os.remove(os.path.join(root, "manifest", f"{pid}.json"))
    summary = cp.run_partitioned(ds, make_double_transform(), root, num_partitions=8)
    assert summary["skipped"] == 5 and summary["computed"] == 3
    out = cp.read_output(root).to_pandas()
    assert len(out) == 1000 and (out["double"] == out["value"] * 2).all()


def test_manifest_atomicity_no_tmp_leftovers(ray_session, tmp_path):
    root = str(tmp_path / "ckpt")
    cp.run_partitioned(_make_ds(ray_session), make_double_transform(), root, num_partitions=4)
    for dirpath, _, files in os.walk(root):
        for f in files:
            assert not f.endswith(".tmp"), os.path.join(dirpath, f)


def test_resume_detects_changed_input(ray_session, tmp_path):
    """A manifest record is only trusted when the partition's input
    fingerprint still matches: changing the input data forces a
    recompute instead of silently keeping stale output (ADVICE r1)."""
    import ray.data
    root = str(tmp_path / "ckpt")
    ds = _make_ds(ray_session)
    cp.run_partitioned(ds, make_double_transform(), root, num_partitions=4)
    # same shape, different values -> every fingerprint differs
    ds2 = ray.data.from_arrow(pa.table({
        "key": pa.array(np.arange(1000) % 17, pa.int64()),
        "value": pa.array(np.arange(1000) + 5, pa.int64()),
    }))
    summary = cp.run_partitioned(ds2, make_double_transform(), root, num_partitions=4)
    assert summary["computed"] == 4 and summary["skipped"] == 0
    out = cp.read_output(root).to_pandas()
    assert (out["double"] == out["value"] * 2).all()
    assert out["value"].min() == 5  # fresh data, not the stale run


def test_resume_invalidates_on_partition_count_change(ray_session, tmp_path):
    """num_partitions changed -> pid-indexed outputs are meaningless:
    the whole checkpoint root is invalidated and recomputed (no stale
    partition dirs mixing into read_output)."""
    root = str(tmp_path / "ckpt")
    ds = _make_ds(ray_session)
    cp.run_partitioned(ds, make_double_transform(), root, num_partitions=8)
    summary = cp.run_partitioned(ds, make_double_transform(), root, num_partitions=4)
    assert summary["computed"] == 4 and summary["skipped"] == 0
    # old partition=4..7 dirs are gone
    dirs = [d for d in os.listdir(root) if d.startswith("partition=")]
    assert sorted(dirs) == [f"partition={i}" for i in range(4)]
    out = cp.read_output(root).to_pandas()
    assert len(out) == 1000 and (out["double"] == out["value"] * 2).all()
