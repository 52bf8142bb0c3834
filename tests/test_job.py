"""Resumable job: end-to-end equivalence with the streaming flagship,
and kill/resume semantics at the bucket level."""

import os

import numpy as np
import pytest

from raytiles.pipeline import checkpoint as cp

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def wp_path():
    from raytiles.pipeline.synth import webpages_path
    return webpages_path("/root/testdata/sf0.001")


def test_job_matches_streaming_flagship(ray_session, wp_path, tmp_path):
    from raytiles.pipeline.flagship import tiles_pipeline
    from raytiles.pipeline.job import run_job
    root = str(tmp_path / "job")
    summary = run_job(wp_path, root, 12, n_buckets=16)
    assert summary["computed"] == 16
    got = cp.read_output(os.path.join(root, "stage_b")).to_pandas() \
        .sort_values(["z", "x", "y"]).reset_index(drop=True)
    want = tiles_pipeline(wp_path, 12).to_pandas() \
        .sort_values(["z", "x", "y"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert np.array_equal(got["x"].to_numpy(), want["x"].to_numpy())
    assert np.array_equal(got["n_features"].to_numpy(), want["n_features"].to_numpy())
    # byte-identical MVTs between the streaming and checkpointed paths
    assert (got["mvt"] == want["mvt"]).all()


def test_job_resume_skips_buckets(ray_session, wp_path, tmp_path):
    from raytiles.pipeline.job import run_job
    root = str(tmp_path / "job")
    run_job(wp_path, root, 12, n_buckets=16)
    os.remove(os.path.join(root, "stage_b", "manifest", "3.json"))
    os.remove(os.path.join(root, "stage_b", "manifest", "7.json"))
    summary = run_job(wp_path, root, 12, n_buckets=16)
    assert summary["skipped"] == 14 and summary["computed"] == 2
