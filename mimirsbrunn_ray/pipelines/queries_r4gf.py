"""Round-4 batch GF: basket composition, current-value context, and
cron detection — mean within-basket brand entropy per customer
market segment (are a segment's orders single-brand or mixed? two
broadcast dimension attaches + per-order entropy, no wide
shuffle), the percentile rank of each type's LAST observed day
among its whole daily history (the "is today weird" number, exact
integer rank), and a cron-spike audit (share of each type's events
landing in minute 0 of the hour versus the uniform 1/60 — the
scheduled-job fingerprint).

Exactness discipline: per-order brand counts are exact integers
with one mirrored log2 fold per order and an exact-rational final
mean; percentile ranks and minute-0 shares are pure integer
counts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _round_half_away,
    _type_cell_counts,
)
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_MIN_US = 60_000_000


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_BBE_COLS = ["segment", "n_orders", "sum_h_x1e6",
             "mean_h_x1e6"]


def q_basket_brand_entropy_by_segment(sf_dir):
    """Mean within-basket brand entropy per customer market
    segment: each order's lineitems map to part brands (broadcast
    part dim), the order's brand-count entropy folds per order in
    order-disjoint shards, the order's segment attaches via a
    broadcast customer+orders path, and segments average — low
    entropy = single-brand shoppers, high = mixed baskets; the
    assortment census behind cross-sell planning."""
    # every hop attaches via budget-gated broadcast / join
    # (stages/broadcast.py): brand onto lineitem, segment onto orders,
    # then the per-order entropies join the order-segment dim with a
    # distributed hash join — no fact table lands on the driver.
    from mimirsbrunn_ray.stages.broadcast import attach_dim, attach_ds

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    li = li.map_batches(
        lambda b: _valid(b, ("l_orderkey", "l_partkey")),
        batch_format="pyarrow", batch_size=None)
    li = attach_dim(li, "l_partkey", sf_dir, "part", "p_partkey",
                    ["p_brand"], how="inner", out_names=["brand"])

    oseg_ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    oseg_ds = oseg_ds.map_batches(
        lambda b: _valid(b, ("o_orderkey", "o_custkey")),
        batch_format="pyarrow", batch_size=None)
    oseg_ds = attach_dim(oseg_ds, "o_custkey", sf_dir, "customer",
                         "c_custkey", ["c_mktsegment"], how="inner",
                         out_names=["segment"])
    oseg_ds = oseg_ds.map_batches(
        lambda b: pa.table({"o_orderkey": b["o_orderkey"],
                            "segment": b["segment"].cast(pa.string())}),
        batch_format="pyarrow", batch_size=None)

    def project(b: pa.Table) -> pa.Table:
        t = pa.table({
            "l_orderkey": b["l_orderkey"],
            "brand": b["brand"].cast(pa.string()),
        })
        return add_bucket(t, "l_orderkey", 64)

    def order_entropy(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "l_orderkey": pd.Series([], dtype=np.int64),
            "h": pd.Series([], dtype=np.float64),
        })
        if len(g) == 0:
            return empty
        bc = g.groupby(["l_orderkey", "brand"]).size()
        bc = bc.reset_index(name="n")
        bc = bc.sort_values(["l_orderkey", "brand"],
                            ignore_index=True)
        ok = bc["l_orderkey"].to_numpy(np.int64)
        n = bc["n"].to_numpy(np.int64).astype(np.float64)
        brk = np.ones(len(bc), dtype=bool)
        brk[1:] = ok[1:] != ok[:-1]
        starts = np.flatnonzero(brk)
        tots = np.add.reduceat(n, starts)
        lens = np.diff(np.append(starts, len(bc)))
        p = n / np.repeat(tots, lens)
        terms = -(p * np.log2(p))
        h = np.add.reduceat(terms, starts)
        return pd.DataFrame({"l_orderkey": ok[starts], "h": h})

    oh = (li.map_batches(project, batch_format="pyarrow",
                         batch_size=None)
          .groupby(_BUCKET)
          .map_groups(order_entropy, batch_format="pandas"))
    oh = attach_ds(oh, "l_orderkey", oseg_ds, "o_orderkey",
                   ["segment"], how="inner")

    def seg_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "segment": pa.array([], pa.string()),
                "n_orders": pa.array([], pa.int64()),
                "sum_h": pa.array([], pa.float64()),
            })
        df = pd.DataFrame({"segment": b["segment"].to_pandas(),
                           "h": b["h"].to_numpy(
                               zero_copy_only=False)})
        agg = df.groupby("segment", sort=False).agg(
            n_orders=("h", "size"), sum_h=("h", "sum")
        ).reset_index()
        agg["n_orders"] = agg["n_orders"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["segment"]).aggregate(
            [("n_orders", "sum"), ("sum_h", "sum")])
        return g.rename_columns(["segment", "n_orders", "sum_h"])

    res = tree_merge(
        oh.map_batches(seg_part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "segment" not in res.columns or len(res) == 0:
        return pa.table({
            "segment": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _BBE_COLS[1:]},
        })
    res = res.sort_values("segment", ignore_index=True)
    return pa.table({
        "segment": pa.array(res["segment"], pa.string()),
        "n_orders": pa.array(res["n_orders"].to_numpy(np.int64)),
        "sum_h_x1e6": pa.array(
            [_round_half_away(v * 1e6) for v in res["sum_h"]],
            pa.int64()),
        "mean_h_x1e6": pa.array(
            [_round_half_away(s / n * 1e6) for s, n in
             zip(res["sum_h"], res["n_orders"].astype(np.int64))],
            pa.int64()),
    })


BBE_SQL = """
WITH bc AS MATERIALIZED (
  SELECT l.l_orderkey, p.p_brand,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_orderkey IS NOT NULL AND l.l_partkey IS NOT NULL
  GROUP BY 1, 2
), oh AS MATERIALIZED (
  SELECT bc.l_orderkey,
         -SUM(CAST(bc.n AS DOUBLE) / ot.t
              * LOG2(CAST(bc.n AS DOUBLE) / ot.t)) AS h
  FROM bc JOIN (SELECT l_orderkey,
                       CAST(SUM(n) AS BIGINT) AS t
                FROM bc GROUP BY 1) ot USING (l_orderkey)
  GROUP BY 1
), seg AS MATERIALIZED (
  SELECT oh.l_orderkey, c.c_mktsegment AS segment, oh.h
  FROM oh
  JOIN orders o ON o.o_orderkey = oh.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(SUM(h) * 1000000, 0) AS BIGINT) AS sum_h_x1e6,
       CAST(ROUND(SUM(h) / COUNT(*) * 1000000, 0) AS BIGINT)
         AS mean_h_x1e6
FROM seg GROUP BY 1 ORDER BY segment
"""

_LDP_COLS = ["event_type", "n_days", "last_day", "last_count",
             "n_below", "pct_ppm"]


def q_last_day_percentile_rank(sf_dir):
    """Context for the most recent observation: per event type, the
    last observed day's count and its exact percentile among the
    type's FULL daily history on the dense day grid (percentile =
    days strictly below / (n_days - 1)) — the "is today unusual"
    number on an exact integer rank, no quantile convention.  One
    distributed count pass."""
    cc = _type_cell_counts(sf_dir, "day", _DAY_US, None)
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _LDP_COLS[1:]},
        })
    dmin = int(cc["day"].min())
    dmax = int(cc["day"].max())
    n_days = dmax - dmin + 1
    out = {c: [] for c in _LDP_COLS}
    for et, g in cc.groupby("event_type", sort=True):
        v = np.zeros(n_days, dtype=np.int64)
        v[g["day"].to_numpy(np.int64) - dmin] = g["c"].to_numpy(
            np.int64)
        if n_days < 2:
            continue
        last = int(v[-1])
        below = int((v[:-1] < last).sum())
        out["event_type"].append(et)
        out["n_days"].append(n_days)
        out["last_day"].append(dmax)
        out["last_count"].append(last)
        out["n_below"].append(below)
        out["pct_ppm"].append(
            _round_half_away(below / (n_days - 1) * 1e6))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        **{c: pa.array(out[c], pa.int64())
           for c in _LDP_COLS[1:]},
    })


LDP_SQL = f"""
WITH dc AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT MIN(day) AS dmin, MAX(day) AS dmax,
         MAX(day) - MIN(day) + 1 AS n_days
  FROM dc
), grid AS MATERIALIZED (
  SELECT t.event_type, s.dmin + r.k AS day,
         COALESCE(dc.c, 0) AS c, s.dmax, s.n_days
  FROM (SELECT DISTINCT event_type FROM dc) t
  CROSS JOIN span s
  JOIN range(0, 100000) r(k) ON s.dmin + r.k <= s.dmax
  LEFT JOIN dc ON dc.event_type = t.event_type
              AND dc.day = s.dmin + r.k
), lastv AS MATERIALIZED (
  SELECT event_type, c AS last_count, dmax, n_days
  FROM grid WHERE day = dmax
)
SELECT g.event_type,
       CAST(ANY_VALUE(l.n_days) AS BIGINT) AS n_days,
       CAST(ANY_VALUE(l.dmax) AS BIGINT) AS last_day,
       CAST(ANY_VALUE(l.last_count) AS BIGINT) AS last_count,
       CAST(SUM(CASE WHEN g.day < l.dmax
                      AND g.c < l.last_count
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
       CAST(ROUND(CAST(SUM(CASE WHEN g.day < l.dmax
                                 AND g.c < l.last_count
                                THEN 1 ELSE 0 END) AS DOUBLE)
            / (ANY_VALUE(l.n_days) - 1) * 1000000, 0) AS BIGINT)
         AS pct_ppm
FROM grid g JOIN lastv l USING (event_type)
GROUP BY g.event_type
HAVING ANY_VALUE(l.n_days) >= 2
ORDER BY g.event_type
"""

_CRON_COLS = ["event_type", "n_events", "n_minute0",
              "share_ppm", "lift_ppm"]


def q_cron_spike_audit(sf_dir):
    """Cron-job fingerprint: per event type, the share of events
    landing in minute 0 of their hour versus the uniform 1/60 —
    lift far above 1,000,000 ppm means a scheduler, not humans, is
    generating the stream (the single most common hidden
    periodicity in ops data).  Pure integer counts, one distributed
    pass."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        mn = pc.divide(us, _MIN_US)
        moh = pc.subtract(
            mn, pc.multiply(pc.divide(mn, 60),
                            pa.scalar(60, pa.int64())))
        t = pa.table({
            "event_type": b["event_type"],
            "n": pa.array(np.ones(b.num_rows, np.int64)),
            "m0": pc.cast(pc.equal(moh, 0), pa.int64()),
        })
        g = t.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("m0", "sum")])
        return g.rename_columns(["event_type", "n", "m0"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("m0", "sum")])
        return g.rename_columns(["event_type", "n", "m0"])

    cc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64())
               for c in _CRON_COLS[1:]},
        })
    cc = cc.sort_values("event_type", ignore_index=True)
    n = cc["n"].to_numpy(np.int64)
    m0 = cc["m0"].to_numpy(np.int64)
    keep = n > 0
    share = [
        _round_half_away(a / b * 1e6)
        for a, b in zip(m0[keep], n[keep])
    ]
    lift = [
        _round_half_away(a / b * 60.0 * 1e6)
        for a, b in zip(m0[keep], n[keep])
    ]
    return pa.table({
        "event_type": pa.array(
            cc["event_type"].to_numpy()[keep], pa.string()),
        "n_events": pa.array(n[keep]),
        "n_minute0": pa.array(m0[keep]),
        "share_ppm": pa.array(share, pa.int64()),
        "lift_ppm": pa.array(lift, pa.int64()),
    })


CRON_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN (EPOCH_US(ts) // {_MIN_US}) % 60 = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS m0
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
)
SELECT event_type,
       n AS n_events,
       m0 AS n_minute0,
       CAST(ROUND(CAST(m0 AS DOUBLE) / n * 1000000, 0) AS BIGINT)
         AS share_ppm,
       CAST(ROUND(CAST(m0 AS DOUBLE) / n * 60.0 * 1000000, 0)
            AS BIGINT) AS lift_ppm
FROM e WHERE n > 0 ORDER BY event_type
"""


def register_r4gf(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "basket_brand_entropy_by_segment":
                q_basket_brand_entropy_by_segment,
            "last_day_percentile_rank": q_last_day_percentile_rank,
            "cron_spike_audit": q_cron_spike_audit,
        }
    )
    oracles.update(
        {
            "basket_brand_entropy_by_segment": BBE_SQL,
            "last_day_percentile_rank": LDP_SQL,
            "cron_spike_audit": CRON_SQL,
        }
    )
