"""Round-4 batch HF: diurnal curvature, pricing integrity, and
billing-cycle detection — a quadratic fit of mean event value on
hour-of-day (the curvature coefficient says U-shape vs hump vs
flat, one number beyond what hourly means eyeball), the unit-price
vs retail-price audit (extendedprice/quantity against the part's
list price — discounts should put the ratio at or below 1;
anything above is a pricing bug or a surcharge), and day-of-month
phase concentration for repeat customers (mean circular resultant
of order day-of-month phases per 3+-order customer — subscription
billing dates light this up).

Exactness discipline: the quadratic solves the same 3x3 normal
equations by Cramer's rule on both engines over exact per-hod
sums; unit-price ratios fold identical doubles from exact cents;
phase resultants mirror sin/cos sums over exact day-of-month
integers."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _HOUR_US,
    _round_half_away,
)
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_VHC_COLS = ["n_hours", "a2_x1e6", "a1_x1e6", "a0_x1e3",
             "curvature_sign"]


def q_value_hod_curvature(sf_dir):
    """Diurnal value shape in one number: fit mean event value on
    hour-of-day with a quadratic (Cramer's rule on the 3x3 normal
    equations over the 24 per-hod means); the x^2 coefficient's
    sign says U-shape (cheap midday), hump (rich midday), or flat
    — the test statistic for 'value follows attention'.  Per-hod
    value sums fold exactly; the solve mirrors."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        hr = pc.divide(us, _HOUR_US)
        hod = pc.subtract(
            hr, pc.multiply(pc.divide(hr, 24),
                            pa.scalar(24, pa.int64())))
        t = pa.table({
            "hod": hod,
            "n": pa.array(np.ones(b.num_rows, np.int64)),
            "v": b["value"].cast(pa.float64()),
        })
        g = t.group_by(["hod"]).aggregate(
            [("n", "sum"), ("v", "sum")])
        return g.rename_columns(["hod", "n", "v"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["hod"]).aggregate(
            [("n", "sum"), ("v", "sum")])
        return g.rename_columns(["hod", "n", "v"])

    cc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "hod" not in cc.columns or len(cc) < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _VHC_COLS})
    cc = cc.sort_values("hod", ignore_index=True)
    x = cc["hod"].to_numpy(np.int64).astype(np.float64)
    y = (cc["v"].to_numpy(np.float64)
         / cc["n"].to_numpy(np.int64))
    n = float(len(x))
    s1 = x.sum()
    s2 = (x ** 2).sum()
    s3 = (x ** 3).sum()
    s4 = (x ** 4).sum()
    t0 = y.sum()
    t1 = (x * y).sum()
    t2 = (x * x * y).sum()
    # normal equations [[n,s1,s2],[s1,s2,s3],[s2,s3,s4]]
    det = (n * (s2 * s4 - s3 * s3)
           - s1 * (s1 * s4 - s3 * s2)
           + s2 * (s1 * s3 - s2 * s2))
    if det == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _VHC_COLS})
    a0 = ((t0 * (s2 * s4 - s3 * s3)
           - s1 * (t1 * s4 - s3 * t2)
           + s2 * (t1 * s3 - s2 * t2)) / det)
    a1 = ((n * (t1 * s4 - t2 * s3)
           - t0 * (s1 * s4 - s3 * s2)
           + s2 * (s1 * t2 - t1 * s2)) / det)
    a2 = ((n * (s2 * t2 - s3 * t1)
           - s1 * (s1 * t2 - s3 * t0)
           + t0 * (s1 * s3 - s2 * s2)) / det)
    sign = 1 if a2 > 0 else (-1 if a2 < 0 else 0)
    return pa.table({
        "n_hours": pa.array([int(n)], pa.int64()),
        "a2_x1e6": pa.array(
            [_round_half_away(a2 * 1e6)], pa.int64()),
        "a1_x1e6": pa.array(
            [_round_half_away(a1 * 1e6)], pa.int64()),
        "a0_x1e3": pa.array(
            [_round_half_away(a0 * 1e3)], pa.int64()),
        "curvature_sign": pa.array([sign], pa.int64()),
    })


VHC_SQL = f"""
WITH hv AS MATERIALIZED (
  SELECT (EPOCH_US(ts) // {_HOUR_US}) % 24 AS hod,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(value AS DOUBLE)) AS v
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1
), pts AS MATERIALIZED (
  SELECT CAST(hod AS DOUBLE) AS x, v / n AS y FROM hv
), st AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(x) AS s1, SUM(x * x) AS s2,
         SUM(x * x * x) AS s3, SUM(x * x * x * x) AS s4,
         SUM(y) AS t0, SUM(x * y) AS t1,
         SUM(x * x * y) AS t2
  FROM pts
), sol AS (
  SELECT n,
         n * (s2 * s4 - s3 * s3)
           - s1 * (s1 * s4 - s3 * s2)
           + s2 * (s1 * s3 - s2 * s2) AS det,
         (t0 * (s2 * s4 - s3 * s3)
          - s1 * (t1 * s4 - s3 * t2)
          + s2 * (t1 * s3 - s2 * t2)) AS num0,
         (n * (t1 * s4 - t2 * s3)
          - t0 * (s1 * s4 - s3 * s2)
          + s2 * (s1 * t2 - t1 * s2)) AS num1,
         (n * (s2 * t2 - s3 * t1)
          - s1 * (s1 * t2 - s3 * t0)
          + t0 * (s1 * s3 - s2 * s2)) AS num2
  FROM st WHERE n >= 3
)
SELECT CAST(n AS BIGINT) AS n_hours,
       CAST(ROUND(num2 / det * 1000000, 0) AS BIGINT)
         AS a2_x1e6,
       CAST(ROUND(num1 / det * 1000000, 0) AS BIGINT)
         AS a1_x1e6,
       CAST(ROUND(num0 / det * 1000, 0) AS BIGINT) AS a0_x1e3,
       CAST(CASE WHEN num2 / det > 0 THEN 1
                 WHEN num2 / det < 0 THEN -1
                 ELSE 0 END AS BIGINT) AS curvature_sign
FROM sol WHERE det <> 0
"""

_UPR_COLS = ["n_lineitems", "mean_ratio_ppm", "above_ppm",
             "p99_ratio_ppm"]


def q_unit_price_vs_retail(sf_dir):
    """Pricing integrity: the ratio of each lineitem's realized
    unit price (extendedprice / quantity) to its part's list
    price — at or below 1 is a discount, ABOVE 1 is a surcharge or
    a data bug; reports the mean ratio, the above-list share, and
    the p99 ratio.  The part dim broadcasts; ratios fold identical
    doubles from exact cents with an interpolated p99.  (The p99
    here collects the ratio column — bounded at test scale; the
    100-TB path swaps in the engine's t-digest / exact-histogram
    quantile stages, stages/sketch.py and stages/rollup.py.)"""
    # the retail price attaches via budget-gated broadcast / join;
    # counts/means fold per batch, and the p99 resolves via the
    # distributed sort + block-span pull of exactrank.quantile_float —
    # neither table lands whole on the driver
    from mimirsbrunn_ray.stages.broadcast import attach_dim
    from mimirsbrunn_ray.stages.exactrank import quantile_float

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"])
    li = li.map_batches(
        lambda b: _valid(b, ("l_partkey", "l_quantity",
                             "l_extendedprice")),
        batch_format="pyarrow", batch_size=None)
    li = attach_dim(li, "l_partkey", sf_dir, "part", "p_partkey",
                    ["p_retailprice"], how="inner")

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"ratio": pa.array([], pa.float64())})
        x = b["l_extendedprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        ep_cents = np.where(
            x >= 0, np.floor(x * 100.0 + 0.5),
            np.ceil(x * 100.0 - 0.5)).astype(np.int64)
        qf = b["l_quantity"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        q = np.where(qf >= 0, np.floor(qf + 0.5),
                     np.ceil(qf - 0.5)).astype(np.int64)
        rp = b["p_retailprice"].to_numpy(
            zero_copy_only=False).astype(np.float64)
        rc = np.where(rp >= 0, np.floor(rp * 100.0 + 0.5),
                      np.ceil(rp * 100.0 - 0.5)).astype(np.int64)
        ok = (q > 0) & (rc > 0)
        ratio = (ep_cents[ok].astype(np.float64) / q[ok]
                 / rc[ok].astype(np.float64))
        return pa.table({"ratio": pa.array(ratio)})

    ratios = li.map_batches(part, batch_format="pyarrow",
                            batch_size=None).materialize()

    def sums(b: pa.Table) -> pa.Table:
        r = b["ratio"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([np.int64(len(r))]),
            "s": pa.array([float(r.sum())]),
            "ab": pa.array([np.int64((r > 1.0).sum())]),
        })

    sm = ratios.map_batches(
        sums, batch_format="pyarrow", batch_size=None).to_pandas()
    n = int(sm["n"].sum()) if "n" in sm.columns else 0
    if n == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _UPR_COLS})
    p99 = quantile_float(ratios, "ratio", 99)
    return pa.table({
        "n_lineitems": pa.array([n], pa.int64()),
        "mean_ratio_ppm": pa.array(
            [_round_half_away(float(sm["s"].sum()) / n * 1e6)],
            pa.int64()),
        "above_ppm": pa.array(
            [_round_half_away(float(int(sm["ab"].sum())) / n * 1e6)],
            pa.int64()),
        "p99_ratio_ppm": pa.array(
            [_round_half_away(p99 * 1e6)], pa.int64()),
    })


UPR_SQL = """
WITH r AS MATERIALIZED (
  SELECT CAST(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
              AS DOUBLE)
           / CAST(ROUND(l.l_quantity, 0) AS BIGINT)
           / CAST(CAST(ROUND(p.p_retailprice * 100, 0)
                       AS BIGINT) AS DOUBLE) AS ratio
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_partkey IS NOT NULL AND l.l_quantity IS NOT NULL
    AND l.l_extendedprice IS NOT NULL
    AND p.p_retailprice IS NOT NULL
    AND CAST(ROUND(l.l_quantity, 0) AS BIGINT) > 0
    AND CAST(ROUND(p.p_retailprice * 100, 0) AS BIGINT) > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(ROUND(AVG(ratio) * 1000000, 0) AS BIGINT)
         AS mean_ratio_ppm,
       CAST(ROUND(CAST(SUM(CASE WHEN ratio > 1.0 THEN 1 ELSE 0
                           END) AS DOUBLE) / COUNT(*)
            * 1000000, 0) AS BIGINT) AS above_ppm,
       CAST(ROUND(QUANTILE_CONT(ratio, 0.99) * 1000000, 0)
            AS BIGINT) AS p99_ratio_ppm
FROM r HAVING COUNT(*) > 0
"""

_DOMC_COLS = ["n_customers", "mean_resultant_ppm",
              "share_high_ppm"]


def q_dom_concentration_repeat_customers(sf_dir):
    """Billing-cycle detector: for each customer with 3+ orders,
    the circular resultant length of their order day-of-month
    phases (1 = always the same date, ~0 = scattered), averaged
    across customers plus the share above 0.8 — subscription
    billing shows up as a heavy high-resultant mass no calendar
    histogram reveals.  Per-customer sin/cos sums fold exactly;
    the resultant math mirrors."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderdate"))
        if b.num_rows == 0:
            return pa.table({
                "cust": pa.array([], pa.int64()),
                "s": pa.array([], pa.float64()),
                "c": pa.array([], pa.float64()),
                "n": pa.array([], pa.int64()),
            })
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        dom = d.dt.day.to_numpy(np.int64).astype(np.float64)
        ang = 2.0 * np.pi * (dom - 1.0) / 31.0
        t = pa.table({
            "cust": b["o_custkey"].cast(pa.int64()),
            "s": pa.array(np.sin(ang)),
            "c": pa.array(np.cos(ang)),
            "n": pa.array(np.ones(len(dom), np.int64)),
        })
        g = t.group_by(["cust"]).aggregate(
            [("s", "sum"), ("c", "sum"), ("n", "sum")])
        return g.rename_columns(["cust", "s", "c", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["cust"]).aggregate(
            [("s", "sum"), ("c", "sum"), ("n", "sum")])
        return g.rename_columns(["cust", "s", "c", "n"])

    cc = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["cust"],
    ).to_pandas()
    if "cust" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DOMC_COLS})
    keep = cc["n"].astype(np.int64) >= 3
    cc = cc[keep]
    if len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DOMC_COLS})
    s = cc["s"].to_numpy(np.float64)
    c = cc["c"].to_numpy(np.float64)
    n = cc["n"].to_numpy(np.int64).astype(np.float64)
    r = np.sqrt(s * s + c * c) / n
    return pa.table({
        "n_customers": pa.array([len(cc)], pa.int64()),
        "mean_resultant_ppm": pa.array(
            [_round_half_away(float(r.mean()) * 1e6)],
            pa.int64()),
        "share_high_ppm": pa.array(
            [_round_half_away(float((r > 0.8).sum()) / len(cc)
                              * 1e6)], pa.int64()),
    })


DOMC_SQL = """
WITH oc AS MATERIALIZED (
  SELECT o_custkey AS cust,
         SUM(SIN(2 * PI() * (DAY(o_orderdate) - 1) / 31.0))
           AS s,
         SUM(COS(2 * PI() * (DAY(o_orderdate) - 1) / 31.0))
           AS c,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
  GROUP BY 1
), rr AS MATERIALIZED (
  SELECT cust, SQRT(s * s + c * c) / n AS r
  FROM oc WHERE n >= 3
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(ROUND(AVG(r) * 1000000, 0) AS BIGINT)
         AS mean_resultant_ppm,
       CAST(ROUND(CAST(SUM(CASE WHEN r > 0.8 THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*) * 1000000, 0)
            AS BIGINT) AS share_high_ppm
FROM rr HAVING COUNT(*) > 0
"""


def register_r4hf(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "value_hod_curvature": q_value_hod_curvature,
            "unit_price_vs_retail": q_unit_price_vs_retail,
            "dom_concentration_repeat_customers":
                q_dom_concentration_repeat_customers,
        }
    )
    oracles.update(
        {
            "value_hod_curvature": VHC_SQL,
            "unit_price_vs_retail": UPR_SQL,
            "dom_concentration_repeat_customers": DOMC_SQL,
        }
    )
