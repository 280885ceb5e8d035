"""Round-4 batch IX: the acquisition curve, monetization depth,
and brand concentration — new customers by first-order year
(when was today's customer base actually acquired?), the
value-per-event monthly series with slope (is each interaction
worth more over time, or is volume masking dilution?), and the
brand revenue HHI (how concentrated revenue is across brands,
plus the top brand's share).

Exactness discipline: first-order years are exact minima;
monthly value and event counts fold as exact integers with the
slope mirrored; brand cents fold exactly through the broadcast
part → brand map."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _round_half_away,
)
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_ABY_COLS = ["first_year", "n_new_customers", "share_ppm",
             "cum_share_ppm"]


def q_acquisition_by_year(sf_dir):
    """When was the base built?  Customers bucketed by the year
    of their FIRST order, with per-year and cumulative shares —
    a base acquired mostly in early years that stopped growing
    is a retention business wearing an acquisition costume.
    Per-customer first years fold exactly as minima."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderdate"))
        if b.num_rows == 0:
            return pa.table({
                "ck": pa.array([], pa.int64()),
                "yr": pa.array([], pa.int64()),
            })
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        yr = d.dt.year.to_numpy(np.int64)
        t = pa.table({
            "ck": b["o_custkey"].cast(pa.int64()),
            "yr": pa.array(yr),
        })
        g = t.group_by(["ck"]).aggregate([("yr", "min")])
        return g.rename_columns(["ck", "yr"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["ck"]).aggregate([("yr", "min")])
        return g.rename_columns(["ck", "yr"])

    fy = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["ck"],
    ).to_pandas()
    if "ck" not in fy.columns or len(fy) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ABY_COLS})
    hist = fy.groupby("yr").size().sort_index()
    tot = int(hist.sum())
    rows = []
    cum = 0
    for yr, n in hist.items():
        cum += int(n)
        rows.append((int(yr), int(n),
                     _round_half_away(int(n) / tot * 1e6),
                     _round_half_away(cum / tot * 1e6)))
    return pa.table({
        "first_year": pa.array(
            [r[0] for r in rows], pa.int64()),
        "n_new_customers": pa.array(
            [r[1] for r in rows], pa.int64()),
        "share_ppm": pa.array([r[2] for r in rows], pa.int64()),
        "cum_share_ppm": pa.array(
            [r[3] for r in rows], pa.int64()),
    })


ABY_SQL = """
WITH fy AS MATERIALIZED (
  SELECT o_custkey AS ck,
         CAST(MIN(YEAR(o_orderdate)) AS BIGINT) AS yr
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
  GROUP BY 1
), hist AS MATERIALIZED (
  SELECT yr, CAST(COUNT(*) AS BIGINT) AS n
  FROM fy GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS t FROM hist
)
SELECT h.yr AS first_year, h.n AS n_new_customers,
       CAST(ROUND(CAST(h.n AS DOUBLE) / tot.t * 1000000, 0)
            AS BIGINT) AS share_ppm,
       CAST(ROUND(CAST(SUM(h.n) OVER (ORDER BY h.yr
                       ROWS UNBOUNDED PRECEDING) AS DOUBLE)
            / tot.t * 1000000, 0) AS BIGINT) AS cum_share_ppm
FROM hist h CROSS JOIN tot
ORDER BY h.yr
"""

_VPE_COLS = ["n_days", "slope_mills_per_day_x1e6",
             "first_vpe_x1e3", "last_vpe_x1e3"]


def q_value_per_event_daily(sf_dir):
    """Is each interaction worth more?  Mean value per event by
    DAY and the OLS slope across days — volume growth with
    falling value-per-event is dilution, not monetization.
    Daily mill sums and counts fold exactly; only the final
    means divide."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("ts", "value"))
        if b.num_rows == 0:
            return pa.table({
                "mon": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
            })
        us = b["ts"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        mon = (us // 86_400_000_000).astype(np.int64)
        v = b["value"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        mills = np.where(v >= 0, np.floor(v * 1000 + 0.5),
                         np.ceil(v * 1000 - 0.5)).astype(
            np.int64)
        df = pd.DataFrame({"mon": mon, "n": 1, "s": mills})
        agg = df.groupby("mon").sum().reset_index()
        for c in ["mon", "n", "s"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["mon"]).aggregate(
            [("n", "sum"), ("s", "sum")])
        return g.rename_columns(["mon", "n", "s"])

    mm = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "mon" not in mm.columns or len(mm) < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _VPE_COLS})
    mm = mm.sort_values("mon")
    x = mm["mon"].to_numpy(np.int64).astype(np.float64)
    y = (mm["s"].to_numpy(np.int64).astype(np.float64)
         / mm["n"].to_numpy(np.int64))
    n = len(x)
    sx, sy = x.sum(), y.sum()
    sxx = (x * x).sum()
    sxy = (x * y).sum()
    den = n * sxx - sx * sx
    if den == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _VPE_COLS})
    slope = (n * sxy - sx * sy) / den
    return pa.table({
        "n_days": pa.array([n], pa.int64()),
        "slope_mills_per_day_x1e6": pa.array(
            [_round_half_away(slope * 1e6)], pa.int64()),
        "first_vpe_x1e3": pa.array(
            [_round_half_away(float(y[0]) * 1e3)], pa.int64()),
        "last_vpe_x1e3": pa.array(
            [_round_half_away(float(y[-1]) * 1e3)], pa.int64()),
    })


VPE_SQL = """
WITH mm AS MATERIALIZED (
  SELECT EPOCH_US(ts) // 86400000000 AS mon,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(value * 1000, 0) AS BIGINT))
              AS BIGINT) AS s
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1
), pts AS MATERIALIZED (
  SELECT mon, CAST(s AS DOUBLE) / n AS y FROM mm
), st AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(mon AS DOUBLE)) AS sx, SUM(y) AS sy,
         SUM(CAST(mon AS DOUBLE) * mon) AS sxx,
         SUM(CAST(mon AS DOUBLE) * y) AS sxy,
         MIN(mon) AS m0, MAX(mon) AS m1
  FROM pts
)
SELECT st.n AS n_days,
       CAST(ROUND((st.n * st.sxy - st.sx * st.sy)
            / (st.n * st.sxx - st.sx * st.sx) * 1000000, 0)
            AS BIGINT) AS slope_mills_per_day_x1e6,
       CAST(ROUND((SELECT y FROM pts WHERE mon = st.m0)
            * 1000, 0) AS BIGINT) AS first_vpe_x1e3,
       CAST(ROUND((SELECT y FROM pts WHERE mon = st.m1)
            * 1000, 0) AS BIGINT) AS last_vpe_x1e3
FROM st
WHERE st.n >= 2 AND st.n * st.sxx - st.sx * st.sx <> 0
"""

_BRH_COLS = ["n_brands", "hhi_ppm", "top_brand",
             "top_share_ppm"]


def q_brand_revenue_hhi(sf_dir):
    """One brand to rule them all?  The HHI of revenue across
    brands (sum of squared revenue shares) and the single top
    brand with its share — the portfolio-risk number for the
    whole catalog.  Line revenue folds per brand through the
    broadcast part → brand map; shares mirror in double."""
    # the brand attaches via budget-gated broadcast / join
    # (stages/broadcast.py) — the part dim never lands whole on the
    # driver
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"])
    li = li.map_batches(
        lambda b: _valid(b, ("l_partkey", "l_extendedprice",
                             "l_discount")),
        batch_format="pyarrow", batch_size=None)
    li = attach_dim(li, "l_partkey", sf_dir, "part", "p_partkey",
                    ["p_brand"], how="inner", out_names=["brand"])

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "brand": pa.array([], pa.string()),
                "cents": pa.array([], pa.int64()),
            })
        rev = (b["l_extendedprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
            * (1.0 - b["l_discount"].cast(pa.float64()).to_numpy(
                zero_copy_only=False)))
        cents = np.where(rev >= 0, np.floor(rev * 100 + 0.5),
                         np.ceil(rev * 100 - 0.5)).astype(
            np.int64)
        df = pd.DataFrame({"brand": b["brand"].to_pandas(),
                           "cents": cents})
        agg = df.groupby("brand")["cents"].sum().reset_index()
        agg["cents"] = agg["cents"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["brand"]).aggregate([("cents", "sum")])
        return g.rename_columns(["brand", "cents"])

    bc = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "brand" not in bc.columns or len(bc) == 0:
        return pa.table({
            "n_brands": pa.array([], pa.int64()),
            "hhi_ppm": pa.array([], pa.int64()),
            "top_brand": pa.array([], pa.string()),
            "top_share_ppm": pa.array([], pa.int64()),
        })
    tot = int(bc["cents"].sum())
    if tot == 0:
        return pa.table({
            "n_brands": pa.array([], pa.int64()),
            "hhi_ppm": pa.array([], pa.int64()),
            "top_brand": pa.array([], pa.string()),
            "top_share_ppm": pa.array([], pa.int64()),
        })
    sh = bc["cents"].to_numpy(np.int64).astype(np.float64) / tot
    hhi = float((sh * sh).sum())
    top = bc.sort_values(["cents", "brand"],
                         ascending=[False, True]).iloc[0]
    return pa.table({
        "n_brands": pa.array([len(bc)], pa.int64()),
        "hhi_ppm": pa.array(
            [_round_half_away(hhi * 1e6)], pa.int64()),
        "top_brand": pa.array([top["brand"]], pa.string()),
        "top_share_ppm": pa.array(
            [_round_half_away(int(top["cents"]) / tot * 1e6)],
            pa.int64()),
    })


BRH_SQL = """
WITH bc AS MATERIALIZED (
  SELECT p.p_brand AS brand,
         CAST(SUM(CAST(ROUND(l.l_extendedprice
                             * (1 - l.l_discount) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_extendedprice IS NOT NULL
    AND l.l_discount IS NOT NULL AND p.p_brand IS NOT NULL
  GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(cents) AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM bc
), top AS MATERIALIZED (
  SELECT brand, cents FROM bc
  ORDER BY cents DESC, brand ASC LIMIT 1
)
SELECT tot.k AS n_brands,
       CAST(ROUND((SELECT SUM((CAST(cents AS DOUBLE) / tot.t)
                              * (CAST(cents AS DOUBLE)
                                 / tot.t)) FROM bc)
            * 1000000, 0) AS BIGINT) AS hhi_ppm,
       top.brand AS top_brand,
       CAST(ROUND(CAST(top.cents AS DOUBLE) / tot.t
            * 1000000, 0) AS BIGINT) AS top_share_ppm
FROM tot CROSS JOIN top
WHERE tot.t > 0
"""


def register_r4ix(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "acquisition_by_year": q_acquisition_by_year,
            "value_per_event_daily": q_value_per_event_daily,
            "brand_revenue_hhi": q_brand_revenue_hhi,
        }
    )
    oracles.update(
        {
            "acquisition_by_year": ABY_SQL,
            "value_per_event_daily": VPE_SQL,
            "brand_revenue_hhi": BRH_SQL,
        }
    )
