"""General relational operators, Ray-Data-first.

These demonstrate the engine's wide-operation patterns at 100 TB scale
(SURVEY §2.2 "Aggregations"/"Joins"):

- partial (combiner) aggregation inside map_batches BEFORE the groupby
  shuffle, so the all-to-all exchange moves one row per (key, batch)
  instead of one per input row;
- broadcast hash joins: the small side is ray.put once and looked up
  per batch — never a shuffle join for dimension tables;
- top-k as aggregate + sort + limit on the already-tiny result.

Float determinism note: partial sums are accumulated with numpy
float64 and finalized in a single groupby; the DuckDB oracle computes
the same double sums — equal up to float addition order, so oracle
comparisons round where documented.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Sum


def _p(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


def _fq(x, k: int) -> np.ndarray:
    """Round half-away-from-zero to k decimals — DuckDB round()
    semantics. pandas .round() is half-even, a latent tie-case parity
    break vs the SQL oracles; floor-quantize is no fix for SUMS (it
    amplifies addition-order ulp noise at every 10^-k boundary), so
    the engine mirrors DuckDB's rounding rule explicitly instead."""
    q = 10.0 ** k
    v = np.asarray(x, dtype=np.float64) * q
    return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)) / q


def pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-shaped pricing summary over lineitem (filter on
    l_shipdate, groupby returnflag+linestatus, sums/avgs/count) with a
    per-batch partial aggregate before the shuffle."""
    cutoff = np.datetime64("1998-09-02T00:00:00")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["l_shipdate"] <= cutoff]
        if b.empty:
            return pd.DataFrame({"l_returnflag": [], "l_linestatus": [],
                                 "s_qty": [], "s_base": [], "s_disc": [],
                                 "s_charge": [], "s_discount": [], "n": []})
        b = b.assign(disc_price=b["l_extendedprice"] * (1 - b["l_discount"]))
        b = b.assign(charge=b["disc_price"] * (1 + b["l_tax"]))
        return b.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            s_qty=("l_quantity", "sum"), s_base=("l_extendedprice", "sum"),
            s_disc=("disc_price", "sum"), s_charge=("charge", "sum"),
            s_discount=("l_discount", "sum"), n=("l_quantity", "size"))

    ds = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"])
    partials = ds.map_batches(partial, batch_format="pandas")
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("s_qty", alias_name="sum_qty"),
        Sum("s_base", alias_name="sum_base_price"),
        Sum("s_disc", alias_name="sum_disc_price"),
        Sum("s_charge", alias_name="sum_charge"),
        Sum("s_discount", alias_name="sum_discount"),
        Sum("n", alias_name="count_order"),
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["count_order"].astype(np.float64)
        out = pd.DataFrame({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "sum_qty": _fq(batch["sum_qty"], 4),
            "sum_base_price": _fq(batch["sum_base_price"], 2),
            "sum_disc_price": _fq(batch["sum_disc_price"], 2),
            "sum_charge": _fq(batch["sum_charge"], 2),
            "avg_qty": _fq(batch["sum_qty"] / n, 6),
            "avg_price": _fq(batch["sum_base_price"] / n, 6),
            "avg_disc": _fq(batch["sum_discount"] / n, 6),
            "count_order": batch["count_order"].astype(np.int64),
        })
        return out.sort_values(["l_returnflag", "l_linestatus"])

    return agg.map_batches(finalize, batch_format="pandas")


def top_customers(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Revenue per customer: orders x customer x nation with BOTH
    dimension tables broadcast (ray.put) into the orders scan; partial
    per-batch sums -> one small groupby -> top-k."""
    import pyarrow.parquet as pq
    cust = pq.read_table(_p(sf_dir, "customer"),
                         columns=["c_custkey", "c_name", "c_nationkey"]).to_pandas()
    nat = pq.read_table(_p(sf_dir, "nation"),
                        columns=["n_nationkey", "n_name"]).to_pandas()
    dim = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    dim_ref = ray.put(dim[["c_custkey", "c_name", "n_name"]])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("o_custkey", as_index=False).agg(
            revenue=("o_totalprice", "sum"), n_orders=("o_orderkey", "count"))

    orders = ray.data.read_parquet(_p(sf_dir, "orders"),
                                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    agg = orders.map_batches(partial, batch_format="pandas") \
        .groupby("o_custkey").aggregate(
            Sum("revenue", alias_name="revenue"),
            Sum("n_orders", alias_name="n_orders"))

    class JoinDims:
        def __init__(self, ref):
            self.dim = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            j = batch.merge(self.dim, left_on="o_custkey", right_on="c_custkey")
            return pd.DataFrame({
                "c_custkey": j["o_custkey"].astype(np.int64),
                "c_name": j["c_name"], "n_name": j["n_name"],
                "revenue": _fq(j["revenue"], 2),
                "n_orders": j["n_orders"].astype(np.int64)})

    joined = agg.map_batches(JoinDims, batch_format="pandas", concurrency=2,
                             fn_constructor_kwargs={"ref": dim_ref})
    top = joined.sort(["revenue", "c_custkey"], descending=[True, False]).limit(k)
    return top


def events_hourly(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1-hour window per event_type: count + value sum/min/max
    (partial per batch, final groupby over (event_type, window))."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.copy()
        b["window_start"] = b["ts"].dt.floor("h")
        return b.groupby(["event_type", "window_start"], as_index=False).agg(
            n=("event_id", "count"), s_value=("value", "sum"),
            mn=("value", "min"), mx=("value", "max"))

    ds = ray.data.read_parquet(_p(sf_dir, "events"),
                               columns=["event_id", "ts", "event_type", "value"])
    agg = ds.map_batches(partial, batch_format="pandas") \
        .groupby(["event_type", "window_start"]).aggregate(
            Sum("n", alias_name="n_events"),
            Sum("s_value", alias_name="sum_value"),
        )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": batch["event_type"],
            # string timestamps: oracle-comparison-safe across ns/us units
            "window_start": batch["window_start"].dt.strftime("%Y-%m-%d %H:%M:%S"),
            "n_events": batch["n_events"].astype(np.int64),
            "sum_value": _fq(batch["sum_value"], 6),
        })

    return agg.map_batches(finalize, batch_format="pandas")


def events_sliding(sf_dir: str, window_min: int = 60, step_min: int = 15) -> ray.data.Dataset:
    """Sliding window (60 min window, 15 min step) per event_type:
    each event contributes to window_min/step_min windows — the
    explode-then-groupby formulation (no ordering requirement, pure
    partial aggregation before the shuffle)."""
    k = window_min // step_min
    step = np.timedelta64(step_min, "m")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        base = batch["ts"].dt.floor(f"{step_min}min")
        frames = []
        for i in range(k):
            w = base - step * i
            frames.append(pd.DataFrame({"event_type": batch["event_type"],
                                        "window_start": w,
                                        "value": batch["value"]}))
        ex = pd.concat(frames, ignore_index=True)
        return ex.groupby(["event_type", "window_start"], as_index=False).agg(
            n=("value", "size"), s_value=("value", "sum"))

    ds = ray.data.read_parquet(_p(sf_dir, "events"),
                               columns=["ts", "event_type", "value"])
    agg = ds.map_batches(partial, batch_format="pandas") \
        .groupby(["event_type", "window_start"]).aggregate(
            Sum("n", alias_name="n_events"),
            Sum("s_value", alias_name="sum_value"))

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": batch["event_type"],
            "window_start": batch["window_start"].dt.strftime("%Y-%m-%d %H:%M:%S"),
            "n_events": batch["n_events"].astype(np.int64),
            "sum_value": _fq(batch["sum_value"], 6),
        })

    return agg.map_batches(finalize, batch_format="pandas")


def events_sessions(sf_dir: str, gap_min: int = 30,
                    n_buckets: int = 256) -> ray.data.Dataset:
    """Gap-based sessionization per user (session breaks when the gap
    to the previous event exceeds gap_min), bucketed: users hash into
    a BOUNDED 256-bucket key (never groupby(user_id) — one Python
    map_groups call per user is the per-group scheduling anti-pattern
    at 10^9 users), and one vectorized sort+diff pass sessionizes ALL
    users in a bucket together. Order within equal ts is pinned by
    event_id so the oracle matches deterministically."""
    from ..util import bucket_of
    gap = np.timedelta64(gap_min, "m")

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["bucket"] = bucket_of(b["user_id"].to_numpy(), n_buckets)
        return b

    def sessionize_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        new_user = np.empty(len(g), dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        brk = new_user | (np.diff(ts, prepend=ts[:1]) > gap)
        sid = np.cumsum(brk)
        out = g.groupby(sid).agg(
            user_id=("user_id", "first"), session_start=("ts", "min"),
            n_events=("event_id", "size"), sum_value=("value", "sum"))
        return pd.DataFrame({
            "user_id": out["user_id"].astype(np.int64),
            "session_start": out["session_start"].dt.strftime("%Y-%m-%d %H:%M:%S"),
            "n_events": out["n_events"].astype(np.int64),
            "sum_value": _fq(out["sum_value"], 6),
        })

    ds = ray.data.read_parquet(_p(sf_dir, "events"),
                               columns=["event_id", "ts", "user_id", "value"])
    return ds.map_batches(add_bucket, batch_format="pandas") \
        .groupby("bucket").map_groups(sessionize_bucket, batch_format="pandas")
