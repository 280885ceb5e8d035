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
    # scale shape: per-customer order counts reduce in the cluster and
    # attach to the streaming customer table; the median resolves from
    # the bounded order-count histogram, and the two-group Welch moments
    # fold in two passes — neither fact table lands whole on the driver.
    from mimirsbrunn_ray.stages.broadcast import attach_table, keyed_counts
    from mimirsbrunn_ray.stages.exactrank import (
        percentile_from_counts, value_counts)

    oc = keyed_counts(sf_dir, "orders", "o_custkey")

    def cust_proj(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b["c_custkey"]),
                             pc.is_valid(b["c_acctbal"])))
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        cents = np.where(
            bal >= 0, np.floor(bal * 100.0 + 0.5),
            np.ceil(bal * 100.0 - 0.5)).astype(np.int64)
        return pa.table({
            "ck": b["c_custkey"].cast(pa.int64()),
            "cents": pa.array(cents),
        })

    cust_ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).map_batches(cust_proj, batch_format="pyarrow", batch_size=None)
    cust_ds = attach_table(cust_ds, "ck", oc, "o_custkey", ["n"],
                           how="left").map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("n"), "n",
            pc.fill_null(b["n"], 0).cast(pa.int64())),
        batch_format="pyarrow", batch_size=None).materialize()
    hist = value_counts(cust_ds, "n")
    if len(hist) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _NBG_COLS})
    med = percentile_from_counts(
        hist.index.to_numpy(np.int64), hist.to_numpy(np.int64), 50)

    def sums1(b: pa.Table) -> pa.Table:
        nn = b["n"].to_numpy(zero_copy_only=False)
        cents = b["cents"].to_numpy(zero_copy_only=False)
        buyer = nn > med
        return pa.table({
            "nb": pa.array([np.int64(buyer.sum())]),
            "sb": pa.array([np.int64(cents[buyer].sum())]),
            "nl": pa.array([np.int64((~buyer).sum())]),
            "sl": pa.array([np.int64(cents[~buyer].sum())]),
        })

    p1 = cust_ds.map_batches(
        sums1, batch_format="pyarrow", batch_size=None).to_pandas()
    n_b, n_l = int(p1["nb"].sum()), int(p1["nl"].sum())
    if n_b < 2 or n_l < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _NBG_COLS})
    mb = float(p1["sb"].sum()) / n_b
    mn_ = float(p1["sl"].sum()) / n_l

    def sums2(b: pa.Table) -> pa.Table:
        nn = b["n"].to_numpy(zero_copy_only=False)
        cents = b["cents"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        buyer = nn > med
        db = cents[buyer] - mb
        dl = cents[~buyer] - mn_
        return pa.table({
            "ssb": pa.array([float((db * db).sum())]),
            "ssl": pa.array([float((dl * dl).sum())]),
        })

    p2 = cust_ds.map_batches(
        sums2, batch_format="pyarrow", batch_size=None).to_pandas()
    vb = float(p2["ssb"].sum()) / (n_b - 1)
    vn = float(p2["ssl"].sum()) / (n_l - 1)
    se = np.sqrt(vb / n_b + vn / n_l)
    if se == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _NBG_COLS})
    t = (mb - mn_) / se
    return pa.table({
        "n_heavy": pa.array([n_b], pa.int64()),
        "n_light": pa.array([n_l], pa.int64()),
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
    # the supplier nation attaches via budget-gated broadcast / join
    # (stages/broadcast.py) — the dim never lands whole on the driver
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey"])
    li = li.map_batches(
        lambda b: _valid(b, ("l_orderkey", "l_suppkey")),
        batch_format="pyarrow", batch_size=None)
    li = attach_dim(li, "l_suppkey", sf_dir, "supplier", "s_suppkey",
                    ["s_nationkey"], how="inner")

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "okey": pa.array([], pa.int64()),
                "nk": pa.array([], pa.int64()),
            })
        t = pa.table({
            "okey": b["l_orderkey"].cast(pa.int64()),
            "nk": b["s_nationkey"].cast(pa.int64()),
        })
        return t.group_by(["okey", "nk"]).aggregate([])

    def shard_cross(df: pd.DataFrame) -> pd.DataFrame:
        # one shard = complete (okey, *) groups: the per-order distinct
        # nation count folds here; the driver sees 2 sums per shard
        if len(df) == 0 or "okey" not in df.columns:
            return pd.DataFrame({"n": pd.Series([], dtype=np.int64),
                                 "x": pd.Series([], dtype=np.int64),
                                 "mx": pd.Series([], dtype=np.int64)})
        per = df.drop_duplicates(["okey", "nk"]).groupby("okey").size()
        return pd.DataFrame({"n": [np.int64(len(per))],
                             "x": [np.int64((per >= 2).sum())],
                             "mx": [np.int64(per.max())]})

    from mimirsbrunn_ray.stages.broadcast import sharded_reduce

    parts = sharded_reduce(
        li.map_batches(part, batch_format="pyarrow", batch_size=None),
        ["okey"], shard_cross, num_shards=8).to_pandas()
    if "n" not in parts.columns or parts["n"].sum() == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _CBO_COLS})
    n = int(parts["n"].sum())
    cross = int(parts["x"].sum())
    return pa.table({
        "n_orders": pa.array([n], pa.int64()),
        "n_cross_border": pa.array([cross], pa.int64()),
        "cross_ppm": pa.array(
            [_round_half_away(cross / n * 1e6)], pa.int64()),
        "max_nations_per_order": pa.array(
            [int(parts["mx"].max())], pa.int64()),
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
