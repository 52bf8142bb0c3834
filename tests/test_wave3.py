"""Wave three (KMV sketch, Zipf slope, TTR, bearing sectors):
single-process oracles for the invariants SQL twins can't pin."""

import hashlib
import re

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE

pytestmark = pytest.mark.usefixtures("ray_session")


def test_kmv_distinct_matches_brute_force():
    from raytiles.ops.sketch import kmv_distinct
    df = kmv_distinct(SF_SMOKE).to_pandas().set_index("source")
    docs = pq.read_table(f"{SF_SMOKE}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    tok = re.compile(r"[0-9A-Za-z_]+")
    k = 16
    for source, grp in docs.groupby("source"):
        toks = set()
        for t in grp["text"]:
            toks.update(tok.findall(t))
        hs = sorted(int.from_bytes(hashlib.md5(s.encode()).digest()[:8],
                                   "big") for s in toks)
        if len(hs) < k:
            assert source not in df.index
            continue
        frac = hs[k - 1] / 2.0 ** 64
        assert df.loc[source, "kth_frac"] == pytest.approx(frac, abs=1e-9)
        est = df.loc[source, "est_distinct"]
        # KMV with k=16 on ~31 distinct: crude but must be in the
        # right ballpark (within 4x)
        assert len(toks) / 4 <= est <= len(toks) * 4


def test_zipf_slope_negative_and_bounded():
    from raytiles.ops.text import zipf_slope
    df = zipf_slope(SF_SMOKE).to_pandas()
    assert len(df) > 0
    # rank-frequency slope of any real (even synthetic) text is
    # negative and sane
    assert (df["slope"] < 0).all()
    assert (df["slope"] > -5).all()
    assert (df["n_top"] >= 1).all()


def test_type_token_ratio_brute_force():
    from raytiles.ops.text import type_token_ratio
    df = type_token_ratio(SF_SMOKE).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF_SMOKE}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    tok = re.compile(r"[0-9A-Za-z_]+")
    assert len(df) == len(docs)
    for _, row in docs.head(50).iterrows():
        toks = tok.findall(row["text"])
        r = df.loc[row["doc_id"]]
        assert r["n_tokens"] == len(toks)
        assert r["n_types"] == len(set(toks))


def test_segment_bearings_totals_match_leg_count():
    from raytiles.ops.spatial import segment_bearings, trajectory_lengths
    from raytiles.pipeline.synth import webpages_path
    wp = webpages_path(SF_SMOKE)
    bear = segment_bearings(wp).to_pandas()
    legs = trajectory_lengths(wp).to_pandas()
    assert int(bear["n_legs"].sum()) == int(legs["n_legs"].sum())
    assert set(bear["sector"]) <= set(range(8))


def test_nb_lang_classify_beats_majority_baseline():
    from raytiles.ops.cluster import nb_lang_classify
    df = nb_lang_classify(SF_SMOKE).to_pandas()
    docs = pq.read_table(f"{SF_SMOKE}/documents.parquet",
                         columns=["lang"]).to_pandas()
    assert len(df) == len(docs)
    majority = docs["lang"].value_counts(normalize=True).iloc[0]
    acc = df["is_correct"].mean()
    assert acc > majority, (acc, majority)
    # predictions only over true classes
    assert set(df["pred_lang"]) <= set(docs["lang"])


def test_events_ewma_matches_pandas_recurrence():
    from raytiles.ops.relational import (EWMA_WEIGHTS, EWMA_WINDOW,
                                         events_ewma)
    df = events_ewma(SF_SMOKE).to_pandas()
    ev = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    assert len(df) == len(ev)
    ev["ts_us"] = ev["ts"].astype("int64")
    ev["vm"] = np.floor(ev["value"].to_numpy() * 1e6).astype(np.int64)
    ev = ev.sort_values(["user_id", "ts_us", "event_id"])
    got = df.set_index("event_id")["ewma"]
    # brute-force the FIR window for a sample of users
    for uid, g in list(ev.groupby("user_id"))[:5]:
        vm = g["vm"].to_numpy().astype(np.float64)
        for i in range(len(g)):
            num = den = 0.0
            for k in range(min(i + 1, EWMA_WINDOW)):
                num += EWMA_WEIGHTS[k] * vm[i - k]
                den += EWMA_WEIGHTS[k]
            want = num / den / 1e6
            eid = g["event_id"].iloc[i]
            assert got[eid] == pytest.approx(want, abs=1e-6)
