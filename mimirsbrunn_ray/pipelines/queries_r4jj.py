"""Round-4 batch JJ: the returns-discount link, customer value
trajectories, and props coverage — the return-discount gap (do
returned lines carry deeper discounts — discount-chasing
behavior showing up as returns), the first-to-last order value
trajectory (per repeat customer, does their basket grow or
shrink between their first and latest order), and the props-k
null share per type (which streams actually carry the k payload
— the instrumentation coverage map).

Exactness discipline: discount sums fold in exact basis points;
first/last orders resolve by exact (date, key) ordering; null
shares are exact counts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.functions.jsonx import extract_int_key
from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _round_half_away,
)
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_RDG_COLS = ["n_returned", "n_kept", "ret_mean_bp_x1e3",
             "kept_mean_bp_x1e3", "gap_bp_x1e3"]


def q_return_discount_gap(sf_dir):
    """Discount-chasing returns: mean discount basis points on
    returned lines (l_returnflag = 'R') versus kept lines, and
    the gap — if returns run hotter on discount, promo traffic
    is churn wearing a coupon.  Basis points fold as exact
    integer sums."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_discount"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_returnflag", "l_discount"))
        if b.num_rows == 0:
            return pa.table({
                "r": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
            })
        rf = np.asarray(
            b["l_returnflag"].to_numpy(zero_copy_only=False))
        d = b["l_discount"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        bp = np.where(d >= 0, np.floor(d * 10000 + 0.5),
                      np.ceil(d * 10000 - 0.5)).astype(np.int64)
        df = pd.DataFrame({
            "r": (rf == "R").astype(np.int64),
            "n": 1, "s": bp,
        })
        agg = df.groupby("r").sum().reset_index()
        for c in ["r", "n", "s"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["r"]).aggregate(
            [("n", "sum"), ("s", "sum")])
        return g.rename_columns(["r", "n", "s"])

    cc = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "r" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _RDG_COLS})
    d = {int(r["r"]): (int(r["n"]), int(r["s"]))
         for _, r in cc.iterrows()}
    if 1 not in d or 0 not in d or d[1][0] == 0 or d[0][0] == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _RDG_COLS})
    rn, rs = d[1]
    kn, ks = d[0]
    rm = rs / rn
    km = ks / kn
    return pa.table({
        "n_returned": pa.array([rn], pa.int64()),
        "n_kept": pa.array([kn], pa.int64()),
        "ret_mean_bp_x1e3": pa.array(
            [_round_half_away(rm * 1e3)], pa.int64()),
        "kept_mean_bp_x1e3": pa.array(
            [_round_half_away(km * 1e3)], pa.int64()),
        "gap_bp_x1e3": pa.array(
            [_round_half_away((rm - km) * 1e3)], pa.int64()),
    })


RDG_SQL = """
WITH rb AS MATERIALIZED (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(l_discount * 10000, 0) AS BIGINT))
              AS BIGINT) AS s
  FROM lineitem
  WHERE l_returnflag IS NOT NULL AND l_discount IS NOT NULL
  GROUP BY 1
), wide AS MATERIALIZED (
  SELECT
    MAX(CASE WHEN r = 1 THEN n END) AS rn,
    MAX(CASE WHEN r = 1 THEN s END) AS rs,
    MAX(CASE WHEN r = 0 THEN n END) AS kn,
    MAX(CASE WHEN r = 0 THEN s END) AS ks
  FROM rb
)
SELECT CAST(rn AS BIGINT) AS n_returned,
       CAST(kn AS BIGINT) AS n_kept,
       CAST(ROUND(CAST(rs AS DOUBLE) / rn * 1000, 0)
            AS BIGINT) AS ret_mean_bp_x1e3,
       CAST(ROUND(CAST(ks AS DOUBLE) / kn * 1000, 0)
            AS BIGINT) AS kept_mean_bp_x1e3,
       CAST(ROUND((CAST(rs AS DOUBLE) / rn
                   - CAST(ks AS DOUBLE) / kn) * 1000, 0)
            AS BIGINT) AS gap_bp_x1e3
FROM wide
WHERE rn > 0 AND kn > 0
"""

_FLT_COLS = ["n_customers", "median_ratio_x1e3",
             "growing_ppm", "mean_log_ratio_x1e6"]


def q_first_last_order_value_ratio(sf_dir):
    """Does the relationship deepen?  Per customer with 2+
    orders: the ratio of their LAST order's value to their FIRST
    (both resolved by exact (date, key) ordering) — the median
    trajectory, the share growing, and the mean log-ratio.
    Customers resolve whole in hash buckets."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderkey",
                       "o_orderdate", "o_totalprice"))
        if b.num_rows == 0:
            return pa.table({
                "ck": pa.array([], pa.int64()),
                "ok": pa.array([], pa.int64()),
                "us": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "_dedup_bucket": pa.array([], pa.int32()),
            })
        tp = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(tp >= 0, np.floor(tp * 100 + 0.5),
                         np.ceil(tp * 100 - 0.5)).astype(
            np.int64)
        t = pa.table({
            "ck": b["o_custkey"].cast(pa.int64()),
            "ok": b["o_orderkey"].cast(pa.int64()),
            "us": b["o_orderdate"].cast(
                pa.timestamp("us")).cast(pa.int64()),
            "cents": pa.array(cents),
        })
        return add_bucket(t, "ck", 64)

    def ratios(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "ratio": pd.Series([], dtype=np.float64),
        })
        if len(g) == 0:
            return empty
        out = []
        for ck, sub in g.groupby("ck"):
            if len(sub) < 2:
                continue
            sub = sub.sort_values(["us", "ok"])
            first = int(sub.iloc[0]["cents"])
            last = int(sub.iloc[-1]["cents"])
            if first <= 0 or last <= 0:
                continue
            out.append(last / first)
        return pd.DataFrame(
            {"ratio": np.array(out, dtype=np.float64)})

    rr = (
        orders.map_batches(project, batch_format="pyarrow",
                           batch_size=None)
        .groupby(_BUCKET)
        .map_groups(ratios, batch_format="pandas")
        .to_pandas()
    )
    if "ratio" not in rr.columns or len(rr) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _FLT_COLS})
    v = rr["ratio"].to_numpy(np.float64)
    return pa.table({
        "n_customers": pa.array([len(v)], pa.int64()),
        "median_ratio_x1e3": pa.array(
            [_round_half_away(float(np.percentile(v, 50))
                              * 1e3)], pa.int64()),
        "growing_ppm": pa.array(
            [_round_half_away(int((v > 1.0).sum()) / len(v)
                              * 1e6)], pa.int64()),
        "mean_log_ratio_x1e6": pa.array(
            [_round_half_away(float(np.log(v).mean()) * 1e6)],
            pa.int64()),
    })


FLT_SQL = """
WITH oc AS MATERIALIZED (
  SELECT o_custkey AS ck, o_orderkey AS ok,
         EPOCH_US(o_orderdate) AS us,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL
    AND o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
), fl AS MATERIALIZED (
  SELECT ck,
         MAX(CASE WHEN rk_a = 1 THEN cents END) AS first,
         MAX(CASE WHEN rk_d = 1 THEN cents END) AS last,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT ck, cents,
               ROW_NUMBER() OVER (PARTITION BY ck
                                  ORDER BY us, ok) AS rk_a,
               ROW_NUMBER() OVER (PARTITION BY ck
                                  ORDER BY us DESC, ok DESC)
                 AS rk_d
        FROM oc)
  GROUP BY 1
), rr AS MATERIALIZED (
  SELECT CAST(last AS DOUBLE) / first AS ratio
  FROM fl
  WHERE n >= 2 AND first > 0 AND last > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(ROUND(QUANTILE_CONT(ratio, 0.5) * 1000, 0)
            AS BIGINT) AS median_ratio_x1e3,
       CAST(ROUND(CAST(SUM(CASE WHEN ratio > 1.0 THEN 1
                                ELSE 0 END) AS DOUBLE)
            / COUNT(*) * 1000000, 0) AS BIGINT)
         AS growing_ppm,
       CAST(ROUND(AVG(LN(ratio)) * 1000000, 0) AS BIGINT)
         AS mean_log_ratio_x1e6
FROM rr HAVING COUNT(*) > 0
"""

_PKN_COLS = ["event_type", "n_events", "k_present_ppm"]


def q_props_k_null_share(sf_dir):
    """The instrumentation coverage map: per event type, the
    share of events whose props payload actually carries a
    parseable integer k — the streams below 100% are the ones
    whose downstream k-features silently drop rows.  Presence
    counts fold exactly."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["event_type"]))
        if b.num_rows == 0:
            return pa.table({
                "et": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "ok": pa.array([], pa.int64()),
            })
        k = extract_int_key(b["props"], "k")
        present = pc.is_valid(k).to_numpy(
            zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({
            "et": np.asarray(
                b["event_type"].to_numpy(zero_copy_only=False)),
            "n": 1, "ok": present,
        })
        agg = df.groupby("et").sum().reset_index()
        for c in ["n", "ok"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["et"]).aggregate(
            [("n", "sum"), ("ok", "sum")])
        return g.rename_columns(["et", "n", "ok"])

    cc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "et" not in cc.columns or len(cc) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
            "k_present_ppm": pa.array([], pa.int64()),
        })
    cc = cc.sort_values("et")
    return pa.table({
        "event_type": pa.array(cc["et"], pa.string()),
        "n_events": pa.array(
            cc["n"].to_numpy(np.int64), pa.int64()),
        "k_present_ppm": pa.array(
            [_round_half_away(o / n * 1e6)
             for o, n in zip(cc["ok"], cc["n"])], pa.int64()),
    })


PKN_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(ROUND(CAST(SUM(CASE WHEN TRY_CAST(
                json_extract_string(props, '$.k') AS BIGINT)
                IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*) * 1000000, 0) AS BIGINT)
         AS k_present_ppm
FROM events
WHERE event_type IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


def register_r4jj(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "return_discount_gap": q_return_discount_gap,
            "first_last_order_value_ratio":
                q_first_last_order_value_ratio,
            "props_k_null_share": q_props_k_null_share,
        }
    )
    oracles.update(
        {
            "return_discount_gap": RDG_SQL,
            "first_last_order_value_ratio": FLT_SQL,
            "props_k_null_share": PKN_SQL,
        }
    )
