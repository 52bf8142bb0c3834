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


def test_kmeans_exact_matches_integer_lloyd():
    from raytiles.ops.cluster import kmeans_exact
    got = kmeans_exact(SF_SMOKE).to_pandas().sort_values("vec_id") \
        .reset_index(drop=True)
    emb = pq.read_table(f"{SF_SMOKE}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    xq = np.floor(np.stack(emb["embedding"].to_numpy())
                  .astype(np.float64) * 1e6).astype(np.int64)
    k, iters = 16, 5
    cq = xq[:k].copy()  # rows already sorted by vec_id
    cids = np.arange(k, dtype=np.int64)

    def assign(x, c):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return np.argmin(d2, axis=1)

    for _ in range(iters):
        a = assign(xq, cq)
        keep, new = [], []
        for i, c in enumerate(cids):
            m = a == i
            if not m.any():
                continue
            keep.append(c)
            new.append(np.floor(xq[m].sum(axis=0).astype(np.float64)
                                / int(m.sum())).astype(np.int64))
        cids = np.array(keep, np.int64)
        cq = np.stack(new)
    final = cids[assign(xq, cq)]
    assert np.array_equal(got["cluster"].to_numpy(), final)
    assert got["cluster"].nunique() >= 2


def test_bm25_search_matches_rank_bm25_formula():
    from raytiles.ops.text import (BM25_B, BM25_K1, BM25_QUERY,
                                   bm25_search)
    got = bm25_search(SF_SMOKE).to_pandas()
    docs = pq.read_table(f"{SF_SMOKE}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    tok = re.compile(r"[0-9A-Za-z_]+")
    toks = {int(r.doc_id): tok.findall(r.text) for r in docs.itertuples()}
    N = len(docs)
    tot = sum(len(v) for v in toks.values())
    avgdl = tot / N
    df = {q: sum(1 for v in toks.values() if q in v) for q in BM25_QUERY}
    idf = {q: np.log((N - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
           for q in BM25_QUERY}
    scores = {}
    for d, v in toks.items():
        s = 0
        for q in BM25_QUERY:
            tf = v.count(q)
            if tf == 0:
                continue
            ratio = (tf * (BM25_K1 + 1.0)) \
                / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (len(v) / avgdl)))
            s += int(np.floor(idf[q] * ratio * 1e6))
        if s:
            scores[d] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(zip(got["doc_id"], got["score_micro"])) == \
        [(d, s) for d, s in want]


def test_hybrid_search_is_rrf_of_both_legs():
    from raytiles.ops.similarity import hybrid_search, knn_bruteforce
    from raytiles.ops.text import bm25_search
    got = hybrid_search(SF_SMOKE).to_pandas()
    lex = bm25_search(SF_SMOKE, k=50).to_pandas() \
        .sort_values(["score_micro", "doc_id"], ascending=[False, True])
    vec = knn_bruteforce(SF_SMOKE, k=50, n_queries=1).to_pandas()
    contrib = {}
    for r, d in enumerate(lex["doc_id"], start=1):
        contrib[int(d)] = contrib.get(int(d), 0) + int(np.floor(1e9 / (60 + r)))
    for row in vec.itertuples():
        d = int(row.neighbor_id)
        contrib[d] = contrib.get(d, 0) + int(np.floor(1e9 / (60 + row.rank)))
    want = sorted(contrib.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(zip(got["doc_id"], got["rrf_micro"])) == want


def test_events_debounce_matches_sequential_chain():
    from raytiles.ops.relational import events_debounce
    gap_us = 86400 * 1_000_000
    got = events_debounce(SF_SMOKE).to_pandas()
    ev = pq.read_table(f"{SF_SMOKE}/events.parquet",
                       columns=["event_id", "ts", "user_id"]).to_pandas()
    ev["ts_us"] = ev["ts"].astype("int64")
    ev = ev.sort_values(["user_id", "ts_us", "event_id"])
    want = set()
    for uid, g in ev.groupby("user_id"):
        last = None
        for r in g.itertuples():
            if last is None or r.ts_us - last >= gap_us:
                want.add(int(r.event_id))
                last = r.ts_us
    assert set(got["event_id"]) == want
    # kept events per user are >= gap apart
    for uid, g in got.sort_values(["user_id", "ts_us"]).groupby("user_id"):
        d = np.diff(g["ts_us"].to_numpy())
        assert (d >= gap_us).all()


def test_events_cusum_matches_sequential_recurrence():
    from raytiles.ops.relational import events_cusum
    drift, thresh = 80_000_000, 150_000_000
    got = events_cusum(SF_SMOKE).to_pandas()
    ev = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    ev["ts_us"] = ev["ts"].astype("int64")
    ev["vm"] = np.floor(ev["value"].to_numpy() * 1e6).astype(np.int64)
    ev = ev.sort_values(["user_id", "ts_us", "event_id"])
    want = {}
    for uid, g in ev.groupby("user_id"):
        s = 0
        for r in g.itertuples():
            s = max(0, s + int(r.vm) - drift)
            if s > thresh:
                want[int(r.event_id)] = s
                s = 0
    got_map = dict(zip(got["event_id"].astype(int),
                       got["s_micro"].astype(int)))
    assert got_map == want


def test_type_affinity_matches_pandas_baskets():
    from raytiles.ops.relational import type_affinity
    got = type_affinity(SF_SMOKE).to_pandas()
    ev = pq.read_table(f"{SF_SMOKE}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    d = ev.drop_duplicates()
    n_users = ev["user_id"].nunique()
    singles = d.groupby("event_type").size().to_dict()
    from itertools import combinations
    pair_counts = {}
    for _, g in d.groupby("user_id"):
        for a, b in combinations(sorted(g["event_type"]), 2):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
    assert len(got) == len(pair_counts)
    for r in got.itertuples():
        assert pair_counts[(r.a, r.b)] == r.n_ab
        assert singles[r.a] == r.n_a and singles[r.b] == r.n_b
        want = round((r.n_ab * n_users) / (r.n_a * r.n_b), 6)
        assert abs(r.lift - want) < 1e-9
