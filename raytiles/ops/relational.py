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
    _EMPTY_PARTIAL = pa.schema([
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("s_qty", pa.float64()), ("s_base", pa.float64()),
        ("s_disc", pa.float64()), ("s_charge", pa.float64()),
        ("s_discount", pa.float64()), ("n", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        """Arrow-native combiner: pc kernels + one C++ hash aggregate
        per batch — the string key columns never round-trip through
        pandas object arrays."""
        import pyarrow.compute as pc
        b = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        if b.num_rows == 0:
            return _EMPTY_PARTIAL.empty_table()
        disc_price = pc.multiply(
            b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        charge = pc.multiply(disc_price, pc.add(1.0, b["l_tax"]))
        t = pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "s_qty": b["l_quantity"], "s_base": b["l_extendedprice"],
            "s_disc": disc_price, "s_charge": charge,
            "s_discount": b["l_discount"]})
        g = pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [("s_qty", "sum"), ("s_base", "sum"), ("s_disc", "sum"),
             ("s_charge", "sum"), ("s_discount", "sum"), ("s_qty", "count")])
        return g.rename_columns(["l_returnflag", "l_linestatus", "s_qty",
                                 "s_base", "s_disc", "s_charge",
                                 "s_discount", "n"])

    ds = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"])
    partials = ds.map_batches(partial, batch_format="pyarrow")
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

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch, "o_custkey").aggregate(
            [("o_totalprice", "sum"), ("o_orderkey", "count")])
        return g.rename_columns(["o_custkey", "revenue", "n_orders"])

    orders = ray.data.read_parquet(_p(sf_dir, "orders"),
                                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    agg = orders.map_batches(partial, batch_format="pyarrow") \
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
    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = pa.table({"event_type": batch["event_type"],
                      "window_start": pc.floor_temporal(batch["ts"], unit="hour"),
                      "value": batch["value"]})
        g = pa.TableGroupBy(t, ["event_type", "window_start"]).aggregate(
            [("value", "count"), ("value", "sum")])
        return g.rename_columns(["event_type", "window_start", "n", "s_value"])

    ds = ray.data.read_parquet(_p(sf_dir, "events"),
                               columns=["ts", "event_type", "value"])
    agg = ds.map_batches(partial, batch_format="pyarrow") \
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
    step_us = step_min * 60_000_000

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        base = pc.floor_temporal(batch["ts"], multiple=step_min, unit="minute")
        parts = [pa.table({"event_type": batch["event_type"],
                           "window_start": pc.subtract(
                               base, pa.scalar(step_us * i, pa.duration("us"))),
                           "value": batch["value"]}) for i in range(k)]
        ex = pa.concat_tables(parts)
        g = pa.TableGroupBy(ex, ["event_type", "window_start"]).aggregate(
            [("value", "count"), ("value", "sum")])
        return g.rename_columns(["event_type", "window_start", "n", "s_value"])

    ds = ray.data.read_parquet(_p(sf_dir, "events"),
                               columns=["ts", "event_type", "value"])
    agg = ds.map_batches(partial, batch_format="pyarrow") \
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

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "bucket", pa.array(bucket_of(b["user_id"].to_numpy(), n_buckets)))

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
    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(sessionize_bucket, batch_format="pandas")


def events_asof(sf_dir: str, left_type: str = "purchase",
                right_type: str = "click",
                n_buckets: int = 256) -> ray.data.Dataset:
    """As-of join, an operator Ray Data has no primitive for: each
    ``left_type`` event is joined to the latest ``right_type`` event
    of the SAME user strictly earlier in ``(ts, event_id)`` order
    (the event_id tiebreak pins equal timestamps deterministically —
    same contract as the oracle's ROWS ... 1 PRECEDING window).

    Composition, per the custom-operator ladder (SURVEY §2.2): a
    column-pruned read, a bounded user-hash bucket key (never a
    groupby on raw user_id), then ONE shuffle and a whole-bucket
    vectorized pass: lexsort by (user, ts, event_id), mark right-type
    rows with their own position, and a segment-reset running maximum
    (one np.maximum.accumulate over bucket-offset keys) yields every
    left row's predecessor without any per-user loop. Timestamps
    travel as epoch microseconds (int64) so engine and oracle hash
    identically."""
    from ..util import bucket_of

    def add_bucket(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = b.filter(pc.is_in(b["event_type"],
                              value_set=pa.array([left_type, right_type])))
        return b.append_column(
            "bucket", pa.array(bucket_of(b["user_id"].to_numpy(), n_buckets)))

    def asof_bucket(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        is_right = np.asarray(g["event_type"]) == right_type
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid, is_right = uid[order], ts[order], eid[order], is_right[order]
        n = len(uid)
        if n == 0:
            return pa.table({"event_id": np.empty(0, np.int64),
                             "user_id": np.empty(0, np.int64),
                             "ts_us": np.empty(0, np.int64),
                             "prior_event_id": np.empty(0, np.int64),
                             "prior_ts_us": np.empty(0, np.int64),
                             "gap_us": np.empty(0, np.int64)})
        seg = np.cumsum(np.concatenate(([0], uid[1:] != uid[:-1])))
        # right rows carry their own position + 1; the running max of
        # seg*(n+1) + that never crosses a user boundary undetected
        # because seg is the high digit
        r = np.where(is_right, np.arange(1, n + 1), 0)
        run = np.maximum.accumulate(seg * (n + 1) + r)
        prior_pos = run % (n + 1) - 1           # -1: none yet
        prior_seg = run // (n + 1)
        ok = (~is_right) & (prior_pos >= 0) & (prior_seg == seg)
        li = np.flatnonzero(ok)
        pi = prior_pos[li]
        return pa.table({
            "event_id": eid[li].astype(np.int64),
            "user_id": uid[li].astype(np.int64),
            "ts_us": ts[li],
            "prior_event_id": eid[pi].astype(np.int64),
            "prior_ts_us": ts[pi],
            "gap_us": ts[li] - ts[pi]})

    ds = ray.data.read_parquet(_p(sf_dir, "events"),
                               columns=["event_id", "ts", "user_id", "event_type"])
    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(asof_bucket, batch_format="pyarrow")


def order_revenue(sf_dir: str, status: str = "O",
                  n_buckets: int = 256) -> ray.data.Dataset:
    """Distributed BIG x BIG equi-join: per-order lineitem revenue
    joined to open orders. Neither side broadcasts — lineitem first
    collapses to exact per-order partials (per-batch Arrow hash
    aggregate, then ONE bounded-bucket groupby on splitmix(orderkey)
    — never a raw groupby on the high-cardinality key), and the
    result hash-joins the status-filtered orders side with Ray Data's
    partitioned join (explicit bounded num_partitions, same sizing
    rule as the dedup joins).

    Revenue is rounded half-away-from-zero to 2 decimals (_fq): the
    per-order addend count is tiny (<= ~13 lineitems) so engine and
    oracle sums agree far beyond 2 decimals regardless of addition
    order. o_orderdate travels as epoch microseconds (int64) so the
    hashes match exactly."""
    from .dedup import _join_partitions
    from ..util import bucket_of

    def li_partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        t = pa.table({"l_orderkey": b["l_orderkey"], "rev": rev})
        g = pa.TableGroupBy(t, "l_orderkey").aggregate(
            [("rev", "sum"), ("rev", "count")])
        g = g.rename_columns(["l_orderkey", "rev", "n"])
        return g.append_column(
            "bucket", pa.array(bucket_of(g["l_orderkey"].to_numpy(), n_buckets)))

    def li_merge(g: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(g.select(["l_orderkey", "rev", "n"]), "l_orderkey") \
            .aggregate([("rev", "sum"), ("n", "sum")])
        t = t.rename_columns(["l_orderkey", "rev", "n_items"])
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev": t["rev"],
                         "n_items": pa.compute.cast(t["n_items"], pa.int64())})

    def ord_filter(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = b.filter(pc.equal(b["o_orderstatus"], status))
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"],
            "orderdate_us": pc.cast(
                pc.cast(b["o_orderdate"], pa.timestamp("us")), pa.int64())})

    li = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"]) \
        .map_batches(li_partial, batch_format="pyarrow") \
        .groupby("bucket").map_groups(li_merge, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"]) \
        .map_batches(ord_filter, batch_format="pyarrow")

    n_part = _join_partitions()
    # map_groups emits schema-less blocks for empty reducer partitions
    # and the hash join rejects them; a cheap repartition merges them
    li = li.repartition(n_part)
    j = li.join(orders, "inner", n_part,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": b["l_orderkey"].astype(np.int64),
            "o_custkey": b["o_custkey"].astype(np.int64),
            "orderdate_us": b["orderdate_us"].astype(np.int64),
            "revenue": _fq(b["rev"], 2),
            "n_items": b["n_items"].astype(np.int64)})

    return j.map_batches(finalize, batch_format="pandas")


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_features(sf_dir: str, n_buckets: int = 256) -> ray.data.Dataset:
    """Per-user feature vector (pivot / one-hot aggregation — the
    feature-engineering step before model training): one row per user
    with a count column per event type plus the value sum.

    Per-batch partial: ONE Arrow hash-aggregate per batch keyed by
    user with a pre-pivoted count column per type (boolean masks cast
    to int — no per-type pass over the batch), so the shuffle moves
    one 7-column row per (user, batch). Final: bounded-bucket groupby
    on splitmix(user_id), vectorized sum-merge per user."""
    from ..util import bucket_of
    import pyarrow.compute as pc

    cols = [f"n_{t}" for t in EVENT_TYPES]

    def partial(b: pa.Table) -> pa.Table:
        t = {"user_id": b["user_id"], "value": b["value"]}
        for name in EVENT_TYPES:
            t[f"n_{name}"] = pc.cast(
                pc.equal(b["event_type"], name), pa.int64())
        g = pa.TableGroupBy(pa.table(t), "user_id").aggregate(
            [(c, "sum") for c in cols] + [("value", "sum")])
        g = g.rename_columns(["user_id"] + cols + ["sum_value"])
        return g.append_column(
            "bucket", pa.array(bucket_of(g["user_id"].to_numpy(), n_buckets)))

    def merge(g: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(
            g.select(["user_id"] + cols + ["sum_value"]), "user_id") \
            .aggregate([(c, "sum") for c in cols] + [("sum_value", "sum")])
        t = t.rename_columns(["user_id"] + cols + ["sum_value"])
        out = {"user_id": t["user_id"]}
        for c in cols:
            out[c] = pc.cast(t[c], pa.int64())
        out["sum_value"] = pa.array(_fq(t["sum_value"].to_numpy(), 6))
        return pa.table(out)

    ds = ray.data.read_parquet(_p(sf_dir, "events"),
                               columns=["user_id", "event_type", "value"])
    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").map_groups(merge, batch_format="pyarrow")


def funnel_conversion(sf_dir: str, n_buckets: int = 256) -> ray.data.Dataset:
    """Funnel / sequence-match: for every user with a signup, the
    first purchase STRICTLY after their first signup (user_id,
    signup_us, conv_us [-1 if none], converted) — the ordered-event
    conversion operator windows can't express without a join.

    Read prunes to the two funnel event types (row filter pushed to
    the parquet scan); rows shuffle once on a bounded splitmix(user)
    bucket; the per-bucket finalizer is one lexsort + segment
    minimum.reduceat over masked timestamps — no per-user loop."""
    import pyarrow.compute as pc

    from ..util import bucket_of

    def tag(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "ts_us": pc.cast(b["ts"], pa.int64()),
            "is_purchase": pc.equal(b["event_type"], "purchase"),
            "bucket": pa.array(bucket_of(b["user_id"].to_numpy(), n_buckets))})

    _EMPTY = pa.schema([("user_id", pa.int64()), ("signup_us", pa.int64()),
                        ("conv_us", pa.int64()), ("converted", pa.bool_())])

    def final(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        isp = g["is_purchase"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, uid))
        uid, ts, isp = uid[order], ts[order], isp[order]
        n = len(uid)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        big = np.iinfo(np.int64).max
        # first signup ts per user (inf-masked purchases)
        s_ts = np.where(isp, big, ts)
        signup = np.minimum.reduceat(s_ts, starts)
        has_signup = signup != big
        # first purchase strictly after the user's first signup
        p_ts = np.where(isp & (ts > signup[seg]), ts, big)
        conv = np.minimum.reduceat(p_ts, starts)
        keep = has_signup
        if not keep.any():
            return _EMPTY.empty_table()
        converted = conv[keep] != big
        return pa.table({
            "user_id": uid[starts][keep],
            "signup_us": signup[keep],
            "conv_us": np.where(converted, conv[keep], -1),
            "converted": converted})

    ds = ray.data.read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "ts", "event_type"],
        filter=(pa.compute.field("event_type") == "signup")
        | (pa.compute.field("event_type") == "purchase"))
    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(final, batch_format="pyarrow")
