"""Round-4 batch HJ: non-buyer economics, behavioral dwell, and
cross-border fulfillment — the buyer vs non-buyer balance gap
(do customers who never order differ financially from those who
do, with a Welch t on exact cents), the mode-dwell median (how
long a user STAYS in one event-type mode, in wall-clock seconds
per type — the time-domain companion to run-length counts), and
the cross-border order share (orders whose suppliers span two or
more nations — every one pays international coordination cost).

Exactness discipline: balances and durations are exact
integer cents/microseconds with mirrored Welch and interpolated
medians; cross-border counts are pure integer distinct-nation
tallies via a broadcast supplier dim."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import _round_half_away
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_NBG_COLS = ["n_heavy", "n_light", "mean_heavy_cents_x1e3",
             "mean_light_cents_x1e3", "welch_t_x1e3"]


def q_nonbuyer_balance_gap(sf_dir):
    """Does wealth separate heavy from light buyers?  Mean account
    balance (exact cents) of customers with an order count
    STRICTLY ABOVE the across-customer median versus the rest,
    plus the Welch t — a significant gap means engagement is
    financially selective.  Per-customer order counts fold in one
    distinct pass; moments fold exactly per group."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_acctbal"]).to_pandas()
    if "c_custkey" not in cust.columns or len(cust) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _NBG_COLS})
    cust = cust.dropna(subset=["c_custkey", "c_acctbal"])
    bal = cust["c_acctbal"].to_numpy(np.float64)
    cents = np.where(
        bal >= 0, np.floor(bal * 100.0 + 0.5),
        np.ceil(bal * 100.0 - 0.5)).astype(np.int64)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_custkey"]))
        g = b.group_by(["o_custkey"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["o_custkey", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["o_custkey"]).aggregate([("n", "sum")])
        return g.rename_columns(["o_custkey", "n"])

    buyers_df = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
    ).to_pandas()
    counts = (dict(zip(buyers_df["o_custkey"].astype(np.int64),
                       buyers_df["n"].astype(np.int64)))
              if "o_custkey" in buyers_df.columns else {})
    n_orders = cust["c_custkey"].astype(np.int64).map(
        counts).fillna(0).to_numpy(np.int64)
    med = float(np.median(n_orders))
    is_buyer = n_orders > med
    b_c = cents[is_buyer].astype(np.float64)
    n_c = cents[~is_buyer].astype(np.float64)
    if len(b_c) < 2 or len(n_c) < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _NBG_COLS})
    mb, mn_ = b_c.mean(), n_c.mean()
    vb = ((b_c - mb) ** 2).sum() / (len(b_c) - 1)
    vn = ((n_c - mn_) ** 2).sum() / (len(n_c) - 1)
    se = np.sqrt(vb / len(b_c) + vn / len(n_c))
    if se == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _NBG_COLS})
    t = (mb - mn_) / se
    return pa.table({
        "n_heavy": pa.array([len(b_c)], pa.int64()),
        "n_light": pa.array([len(n_c)], pa.int64()),
        "mean_heavy_cents_x1e3": pa.array(
            [_round_half_away(mb * 1e3)], pa.int64()),
        "mean_light_cents_x1e3": pa.array(
            [_round_half_away(mn_ * 1e3)], pa.int64()),
        "welch_t_x1e3": pa.array(
            [_round_half_away(float(t) * 1e3)], pa.int64()),
    })


NBG_SQL = """
WITH oc AS MATERIALIZED (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_custkey IS NOT NULL
  GROUP BY 1
), cb0 AS MATERIALIZED (
  SELECT c.c_custkey,
         CAST(CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT)
              AS DOUBLE) AS cents,
         CAST(COALESCE(oc.n, 0) AS BIGINT) AS n_orders
  FROM customer c
  LEFT JOIN oc ON oc.o_custkey = c.c_custkey
  WHERE c.c_custkey IS NOT NULL AND c.c_acctbal IS NOT NULL
), med AS MATERIALIZED (
  SELECT MEDIAN(CAST(n_orders AS DOUBLE)) AS m FROM cb0
), cb AS MATERIALIZED (
  SELECT c_custkey, cents,
         CASE WHEN CAST(cb0.n_orders AS DOUBLE) > med.m
              THEN 1 ELSE 0 END AS buyer
  FROM cb0 CROSS JOIN med
), g AS MATERIALIZED (
  SELECT buyer,
         CAST(COUNT(*) AS BIGINT) AS n,
         AVG(cents) AS mu
  FROM cb GROUP BY 1
), v AS MATERIALIZED (
  SELECT cb.buyer,
         SUM((cb.cents - g.mu) * (cb.cents - g.mu))
           / (ANY_VALUE(g.n) - 1) AS var,
         ANY_VALUE(g.n) AS n, ANY_VALUE(g.mu) AS mu
  FROM cb JOIN g USING (buyer)
  GROUP BY cb.buyer
), wide AS (
  SELECT
    MAX(CASE WHEN buyer = 1 THEN n END) AS nb,
    MAX(CASE WHEN buyer = 1 THEN mu END) AS mb,
    MAX(CASE WHEN buyer = 1 THEN var END) AS vb,
    MAX(CASE WHEN buyer = 0 THEN n END) AS nn,
    MAX(CASE WHEN buyer = 0 THEN mu END) AS mn_,
    MAX(CASE WHEN buyer = 0 THEN var END) AS vn
  FROM v
)
SELECT CAST(nb AS BIGINT) AS n_heavy,
       CAST(nn AS BIGINT) AS n_light,
       CAST(ROUND(mb * 1000, 0) AS BIGINT)
         AS mean_heavy_cents_x1e3,
       CAST(ROUND(mn_ * 1000, 0) AS BIGINT)
         AS mean_light_cents_x1e3,
       CAST(ROUND((mb - mn_) / SQRT(vb / nb + vn / nn) * 1000,
            0) AS BIGINT) AS welch_t_x1e3
FROM wide
WHERE nb >= 2 AND nn >= 2
  AND SQRT(vb / nb + vn / nn) <> 0
"""

_MDM_COLS = ["event_type", "n_runs", "median_dwell_sec_x1e3"]


def q_mode_dwell_median(sf_dir):
    """Behavioral dwell in wall-clock time: segment each user's
    (ts, event_id)-ordered stream into maximal same-type runs and
    take the median DURATION (last minus first event, seconds) of
    runs with 2+ events, per type — the time users actually stay
    in a mode, which run LENGTH counts cannot give when event
    rates differ.  Runs resolve in user-disjoint shards;
    durations are exact microseconds with interpolated medians."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts", "event_id", "event_type"))
        t = pa.table({
            "user_id": b["user_id"],
            "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_id": b["event_id"],
            "event_type": b["event_type"],
        })
        return add_bucket(t, "user_id", 64)

    def runs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "event_type": pd.Series([], dtype=object),
            "dur": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        us = g["us"].to_numpy(np.int64)
        brk = np.ones(len(g), dtype=bool)
        brk[1:] = (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(g)) - 1
        dur = us[ends] - us[starts]
        keep = ends > starts  # runs with 2+ events
        return pd.DataFrame({
            "event_type": et[starts][keep],
            "dur": dur[keep].astype(np.int64),
        })

    rr = (
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(runs, batch_format="pandas")
        .to_pandas()
    )
    if "event_type" not in rr.columns or len(rr) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "n_runs": pa.array([], pa.int64()),
            "median_dwell_sec_x1e3": pa.array([], pa.int64()),
        })
    out = {c: [] for c in _MDM_COLS}
    for et, g in rr.groupby("event_type", sort=True):
        v = g["dur"].to_numpy(np.int64)
        out["event_type"].append(et)
        out["n_runs"].append(len(v))
        out["median_dwell_sec_x1e3"].append(
            _round_half_away(
                float(np.percentile(v, 50)) / 1e6 * 1e3))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_runs": pa.array(out["n_runs"], pa.int64()),
        "median_dwell_sec_x1e3": pa.array(
            out["median_dwell_sec_x1e3"], pa.int64()),
    })


MDM_SQL = """
WITH e AS MATERIALIZED (
  SELECT user_id, event_type, EPOCH_US(ts) AS us, event_id
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL
), m AS MATERIALIZED (
  SELECT user_id, event_type, us, event_id,
         CASE WHEN LAG(user_id) OVER w IS NULL
                OR LAG(user_id) OVER w <> user_id
                OR LAG(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (ORDER BY user_id, us, event_id)
), r AS MATERIALIZED (
  SELECT event_type, us,
         SUM(brk) OVER (ORDER BY user_id, us, event_id
                        ROWS UNBOUNDED PRECEDING) AS rid
  FROM m
), rl AS MATERIALIZED (
  SELECT rid, ANY_VALUE(event_type) AS event_type,
         MAX(us) - MIN(us) AS dur,
         CAST(COUNT(*) AS BIGINT) AS len
  FROM r GROUP BY rid
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(ROUND(MEDIAN(CAST(dur AS DOUBLE)) / 1000000.0
            * 1000, 0) AS BIGINT) AS median_dwell_sec_x1e3
FROM rl WHERE len >= 2
GROUP BY event_type ORDER BY event_type
"""

_CBO_COLS = ["n_orders", "n_cross_border", "cross_ppm",
             "max_nations_per_order"]


def q_cross_border_order_share(sf_dir):
    """International coordination exposure: orders whose suppliers
    sit in two or more NATIONS (supplier dim broadcast onto the
    order's distinct supplier set) — each such order pays
    cross-border latency, customs and currency risk that
    same-nation fan-out does not.  Distinct (order, nation) pairs
    fold exactly."""
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    if "s_suppkey" not in supp.columns:
        supp = pd.DataFrame({"s_suppkey": [], "s_nationkey": []})
    nk_map = dict(zip(supp["s_suppkey"].astype(np.int64),
                      supp["s_nationkey"].astype(np.int64)))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_orderkey", "l_suppkey"))
        if b.num_rows == 0:
            return pa.table({
                "okey": pa.array([], pa.int64()),
                "nk": pa.array([], pa.int64()),
            })
        sk = pd.Series(
            b["l_suppkey"].to_numpy(zero_copy_only=False))
        nk = sk.map(nk_map)
        keep = nk.notna().to_numpy()
        t = pa.table({
            "okey": pa.array(
                b["l_orderkey"].to_numpy(
                    zero_copy_only=False)[keep].astype(np.int64)),
            "nk": pa.array(nk.to_numpy()[keep].astype(np.int64)),
        })
        return t.group_by(["okey", "nk"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["okey", "nk"]).group_by(
            ["okey", "nk"]).aggregate([])

    onk = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["okey"],
    ).to_pandas()
    if "okey" not in onk.columns or len(onk) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _CBO_COLS})
    per_order = onk.groupby("okey").size()
    n = len(per_order)
    cross = int((per_order >= 2).sum())
    return pa.table({
        "n_orders": pa.array([n], pa.int64()),
        "n_cross_border": pa.array([cross], pa.int64()),
        "cross_ppm": pa.array(
            [_round_half_away(cross / n * 1e6)], pa.int64()),
        "max_nations_per_order": pa.array(
            [int(per_order.max())], pa.int64()),
    })


CBO_SQL = """
WITH onk AS MATERIALIZED (
  SELECT DISTINCT l.l_orderkey, s.s_nationkey
  FROM lineitem l JOIN supplier s
    ON s.s_suppkey = l.l_suppkey
  WHERE l.l_orderkey IS NOT NULL AND l.l_suppkey IS NOT NULL
), per_order AS MATERIALIZED (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS k
  FROM onk GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cross_border,
       CAST(ROUND(CAST(SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*) * 1000000, 0)
            AS BIGINT) AS cross_ppm,
       CAST(MAX(k) AS BIGINT) AS max_nations_per_order
FROM per_order HAVING COUNT(*) > 0
"""


def register_r4hj(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "buyer_intensity_balance_gap": q_nonbuyer_balance_gap,
            "mode_dwell_median": q_mode_dwell_median,
            "cross_border_order_share": q_cross_border_order_share,
        }
    )
    oracles.update(
        {
            "buyer_intensity_balance_gap": NBG_SQL,
            "mode_dwell_median": MDM_SQL,
            "cross_border_order_share": CBO_SQL,
        }
    )
