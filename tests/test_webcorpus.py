"""Web-corpus curation ops: single-process pandas/regex oracles at
sf0.001 (the SQL twins get full value verification from
scripts/check_correctness.py + the driver gate at sf0.01)."""

import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs():
    return pq.read_table(f"{SF_SMOKE}/documents.parquet").to_pandas()


def test_host_stats_matches_pandas():
    from raytiles.ops.webcorpus import host_stats
    from raytiles.pipeline.synth import webpages_path
    wp = webpages_path(SF_SMOKE)
    df = host_stats(wp).to_pandas().sort_values("host").reset_index(drop=True)
    pages = pq.read_table(wp).to_pandas()
    pages["host"] = pages["url"].str.extract(r"^https?://([^/]+)/")[0]
    want = pages.groupby("host").agg(
        n_docs=("url", "size"),
        total_chars=("text", lambda s: s.str.len().sum()),
        n_en=("lang", lambda s: int((s == "en").sum()))).reset_index() \
        .sort_values("host").reset_index(drop=True)
    assert np.array_equal(df["host"].to_numpy(), want["host"].to_numpy())
    for c in ("n_docs", "total_chars", "n_en"):
        assert np.array_equal(df[c].to_numpy(), want[c].to_numpy()), c


def test_anti_join_matches_pandas():
    from raytiles.ops.webcorpus import customers_without_big_orders
    thr = 300000.0  # default: 3 live rows and 147 exclusions at sf0.001
    df = customers_without_big_orders(SF_SMOKE, threshold=thr).to_pandas() \
        .sort_values("c_custkey").reset_index(drop=True)
    cust = pq.read_table(f"{SF_SMOKE}/customer.parquet").to_pandas()
    orders = pq.read_table(f"{SF_SMOKE}/orders.parquet").to_pandas()
    big = set(orders.loc[orders["o_totalprice"] > thr, "o_custkey"])
    want = cust[~cust["c_custkey"].isin(big)].sort_values("c_custkey")
    assert 0 < len(want) < len(cust)  # live rows AND live exclusions
    assert np.array_equal(df["c_custkey"].to_numpy(),
                          want["c_custkey"].to_numpy())
    assert np.allclose(df["c_acctbal"].to_numpy(),
                       want["c_acctbal"].to_numpy())


def test_decontaminate_matches_pure_python():
    from raytiles.ops.text import TOKEN_RE
    from raytiles.ops.webcorpus import NGRAM, decontaminate
    mod = 7  # denser benchmark at 50-doc scale
    df = decontaminate(SF_SMOKE, mod=mod).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    docs = _docs()
    tok = re.compile(TOKEN_RE)

    def grams(text):
        t = tok.findall(text)
        return {" ".join(t[i:i + NGRAM]) for i in range(len(t) - NGRAM + 1)}

    bench = set()
    for _, r in docs[docs["doc_id"] % mod == 0].iterrows():
        bench |= grams(r["text"])
    want = {}
    for _, r in docs[docs["doc_id"] % mod != 0].iterrows():
        n = len(grams(r["text"]) & bench)
        if n:
            want[r["doc_id"]] = n
    assert dict(zip(df["doc_id"], df["n_hits"])) == want
    assert len(want) > 0  # the oracle sees live contamination


def test_doc_repetition_matches_pure_python():
    from raytiles.ops.text import TOKEN_RE
    from raytiles.ops.webcorpus import doc_repetition
    df = doc_repetition(SF_SMOKE).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    docs = _docs().sort_values("doc_id").reset_index(drop=True)
    tok = re.compile(TOKEN_RE)
    toks = [tok.findall(t) for t in docs["text"]]
    nt = np.array([len(t) for t in toks], dtype=np.int64)
    nd = np.array([len(set(t)) for t in toks], dtype=np.int64)
    keep = nt > 0
    assert np.array_equal(df["doc_id"].to_numpy(),
                          docs["doc_id"].to_numpy()[keep])
    assert np.array_equal(df["n_tokens"].to_numpy(), nt[keep])
    assert np.array_equal(df["n_distinct"].to_numpy(), nd[keep])
    want = np.floor((1.0 - nd[keep] / nt[keep]) * 1e6) / 1e6
    assert np.array_equal(df["dup_ratio"].to_numpy(), want)


def test_median_filter_threshold_rule():
    from raytiles.ops.text import TOKEN_RE, median_length_filter
    df = median_length_filter(SF_SMOKE).to_pandas()
    docs = _docs()
    nt = docs["text"].str.count(TOKEN_RE).to_numpy()
    cnt = np.sort(nt)
    med = cnt[int(np.ceil(0.5 * len(cnt))) - 1]  # min v with cum >= ceil(n/2)
    want = docs.loc[nt >= med, "doc_id"]
    assert set(df["doc_id"]) == set(want)
    assert 0 < len(df) < len(docs)


def test_doc_tfidf_single_process_oracle():
    import re

    from raytiles.ops.text import TOKEN_RE, doc_tfidf_top, vocab_topk
    df = doc_tfidf_top(SF_SMOKE, vocab_k=20).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    docs = _docs()
    vocab = vocab_topk(SF_SMOKE, k=20).to_pandas()
    idf = {t: np.log(len(docs) / d)
           for t, d in zip(vocab["token"], vocab["df"])}
    tok = re.compile(TOKEN_RE)
    for i in np.random.default_rng(1).integers(0, len(docs), 15):
        toks = tok.findall(docs["text"].iloc[i])
        scores = {}
        for t in toks:
            if t in idf:
                scores[t] = scores.get(t, 0) + 1
        if not scores:
            continue
        best = min(((-n * idf[t], t) for t, n in scores.items()))
        row = df[df.doc_id == docs["doc_id"].iloc[i]].iloc[0]
        assert row["token"] == best[1]
        assert row["tfidf"] == np.floor(-best[0] * 1e6) / 1e6


def test_inverted_index_single_process_oracle():
    import re

    from raytiles.ops.text import TOKEN_RE, inverted_index
    k = 4  # small cap so truncation is exercised at sf0.001
    df = inverted_index(SF_SMOKE, k=k).to_pandas()
    docs = _docs()
    tok = re.compile(TOKEN_RE)
    post = {}
    for _, r in docs.iterrows():
        for t in set(tok.findall(r["text"])):
            post.setdefault(t, []).append(r["doc_id"])
    want = {t: (len(ids), ",".join(map(str, sorted(ids)[:k])))
            for t, ids in post.items()}
    got = {t: (d, p) for t, d, p in zip(df["token"], df["df"], df["postings"])}
    assert got == want
    assert any(d > k for d, _ in want.values())  # cap actually bites


def test_bpe_token_counts_python_re_oracle():
    import re

    from raytiles.ops.text import BPE_RE, bpe_token_counts
    df = bpe_token_counts(SF_SMOKE).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    docs = _docs().sort_values("doc_id").reset_index(drop=True)
    # Python re lacks \p{..}; spot-check with the ASCII equivalent on
    # texts that are pure ASCII (the synth corpus is)
    pat = re.compile(BPE_RE.replace(r"\p{L}", "a-zA-Z")
                     .replace(r"\p{N}", "0-9")
                     .replace(r"[\p{L}]", "[a-zA-Z]")
                     .replace(r"[\p{N}]", "[0-9]")
                     .replace(r"[^\s\p{L}\p{N}]", "[^\\sa-zA-Z0-9]"))
    for i in range(0, len(docs), 97):
        t = docs["text"].iloc[i]
        assert t.isascii()
        assert df["n_bpe_tokens"].iloc[i] == len(pat.findall(t))
        assert df["n_ws_tokens"].iloc[i] == len(t.split())


def test_doc_rank_is_global_row_number():
    from raytiles.ops.text import doc_rank
    df = doc_rank(SF_SMOKE).to_pandas().sort_values("rank") \
        .reset_index(drop=True)
    docs = _docs()
    want = docs.assign(n_chars=docs["text"].str.len()) \
        .sort_values(["n_chars", "doc_id"], ascending=[False, True]) \
        .reset_index(drop=True)
    assert len(df) == len(want)
    assert df["rank"].tolist() == list(range(1, len(want) + 1))
    assert df["doc_id"].tolist() == want["doc_id"].tolist()
    assert df["n_chars"].tolist() == want["n_chars"].tolist()


def test_boilerplate_ngrams_single_process_oracle():
    import re

    from raytiles.ops.webcorpus import NGRAM, boilerplate_ngrams
    df = boilerplate_ngrams(SF_SMOKE).to_pandas().set_index("doc_id")
    docs = _docs()
    split = re.compile(r"[^0-9A-Za-z_]+")
    gram_docs: dict[str, set] = {}
    per_doc: dict[int, set] = {}
    for _, r in docs.iterrows():
        t = [x for x in split.split(r["text"]) if x]
        gs = {" ".join(t[i:i + NGRAM]) for i in range(len(t) - NGRAM + 1)}
        if gs:
            per_doc[r["doc_id"]] = gs
            for g in gs:
                gram_docs.setdefault(g, set()).add(r["doc_id"])
    assert set(df.index) == set(per_doc)
    heavy = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    assert heavy  # the synth filler repeats across docs -> live signal
    for did in list(per_doc)[::97]:
        gs = per_doc[did]
        nb = len(gs & heavy)
        assert df.loc[did, "n_grams"] == len(gs)
        assert df.loc[did, "n_boiler"] == nb
        assert df.loc[did, "boiler_ratio"] == np.floor(
            nb / len(gs) * 1e6) / 1e6


def test_train_split_deterministic_and_exhaustive():
    """Split is a pure function of doc_id (md5 slot), covers every doc
    exactly once, and matches a direct per-doc recompute."""
    import hashlib

    import pyarrow.parquet as pq

    from raytiles.ops.webcorpus import train_split
    got = train_split(SF_SMOKE).to_pandas()
    docs = pq.read_table(f"{SF_SMOKE}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"]).to_pandas()
    slot = docs["doc_id"].map(
        lambda i: int.from_bytes(
            hashlib.md5(str(i).encode()).digest()[:8], "big") % 100)
    split = np.where(slot < 10, "test", np.where(slot < 15, "val", "train"))
    want = docs.assign(split=split).groupby(
        ["source", "split"], as_index=False).agg(
        n_docs=("doc_id", "size"), sum_chars=("n_chars", "sum"))
    key = ["source", "split"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w)
    assert (g["n_docs"].to_numpy() == w["n_docs"].to_numpy()).all()
    assert (g["sum_chars"].to_numpy() == w["sum_chars"].to_numpy()).all()
    assert int(g["n_docs"].sum()) == len(docs)  # every doc exactly once
    # rerun -> identical assignment (stability is the point)
    again = train_split(SF_SMOKE).to_pandas().sort_values(key).reset_index(drop=True)
    assert again.equals(g)
