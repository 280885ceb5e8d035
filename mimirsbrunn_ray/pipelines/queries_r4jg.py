"""Round-4 batch JG: presence density, deal-size coupling, and
order-of-magnitude mix — the user day-coverage distribution
(active days over lifespan: how densely each user actually
inhabits their own tenure), the quantity × discount mutual
information (does deal size buy a better rate, measured in bits
over the exact joint grid), and the value magnitude mix (orders
bucketed by the decimal magnitude of their total — the
two-orders-of-magnitude spread hiding inside one 'average order
value').

Exactness discipline: coverage ratios are exact integer ratios
with interpolated quantiles mirrored; MI builds from the exact
(quantity, discount-bp) joint counts; magnitude buckets are
exact integer digit counts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _round_half_away,
)
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_UDC_COLS = ["n_users", "median_coverage_ppm",
             "p90_coverage_ppm", "full_coverage_ppm"]


def q_user_day_coverage(sf_dir):
    """How densely do users inhabit their own tenure?  For
    users whose lifespan is 7+ days: active days divided by
    lifespan days; the median and p90 of that coverage, and the
    share at 100% (active every single day they've existed).
    Per-user (first, last, active) fold exactly."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({
            "u": b["user_id"].cast(pa.int64()),
            "day": pc.divide(us, _DAY_US),
        })
        return t.group_by(["u", "day"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["u", "day"]).group_by(
            ["u", "day"]).aggregate([])

    ud = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["u"],
    ).to_pandas()
    if "u" not in ud.columns or len(ud) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _UDC_COLS})
    agg = ud.groupby("u").agg(
        d0=("day", "min"), d1=("day", "max"),
        act=("day", "count")).reset_index()
    life = (agg["d1"] - agg["d0"] + 1).to_numpy(np.int64)
    act = agg["act"].to_numpy(np.int64)
    keep = life >= 7
    life, act = life[keep], act[keep]
    if len(life) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _UDC_COLS})
    cov = act.astype(np.float64) / life
    return pa.table({
        "n_users": pa.array([len(life)], pa.int64()),
        "median_coverage_ppm": pa.array(
            [_round_half_away(float(np.percentile(cov, 50))
                              * 1e6)], pa.int64()),
        "p90_coverage_ppm": pa.array(
            [_round_half_away(float(np.percentile(cov, 90))
                              * 1e6)], pa.int64()),
        "full_coverage_ppm": pa.array(
            [_round_half_away(int((act == life).sum())
                              / len(life) * 1e6)], pa.int64()),
    })


UDC_SQL = f"""
WITH ud AS MATERIALIZED (
  SELECT DISTINCT user_id AS u, EPOCH_US(ts) // {_DAY_US}
           AS day
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
), pu AS MATERIALIZED (
  SELECT u, MAX(day) - MIN(day) + 1 AS life,
         CAST(COUNT(*) AS BIGINT) AS act
  FROM ud GROUP BY 1
  HAVING MAX(day) - MIN(day) + 1 >= 7
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(ROUND(QUANTILE_CONT(CAST(act AS DOUBLE) / life,
            0.5) * 1000000, 0) AS BIGINT)
         AS median_coverage_ppm,
       CAST(ROUND(QUANTILE_CONT(CAST(act AS DOUBLE) / life,
            0.9) * 1000000, 0) AS BIGINT)
         AS p90_coverage_ppm,
       CAST(ROUND(CAST(SUM(CASE WHEN act = life THEN 1 ELSE 0
                           END) AS DOUBLE) / COUNT(*)
            * 1000000, 0) AS BIGINT) AS full_coverage_ppm
FROM pu HAVING COUNT(*) > 0
"""

_QDM_COLS = ["n_lines", "n_qty_levels", "n_discount_levels",
             "mi_ppm"]


def q_qty_discount_mi(sf_dir):
    """Does deal size buy a better rate?  Mutual information
    (log2) between line quantity and discount basis points over
    the exact joint grid — zero bits means discounts are handed
    out independent of volume and the 'bulk deal' is folklore.
    Joint counts fold exactly; the plug-in formula mirrors."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_discount"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_quantity", "l_discount"))
        if b.num_rows == 0:
            return pa.table({
                "q": pa.array([], pa.int64()),
                "d": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        qf = b["l_quantity"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        q = np.where(qf >= 0, np.floor(qf + 0.5),
                     np.ceil(qf - 0.5)).astype(np.int64)
        dc = b["l_discount"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        d = np.where(dc >= 0, np.floor(dc * 10000 + 0.5),
                     np.ceil(dc * 10000 - 0.5)).astype(np.int64)
        df = pd.DataFrame({"q": q, "d": d, "n": 1})
        agg = df.groupby(["q", "d"]).sum().reset_index()
        for c in ["q", "d", "n"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["q", "d"]).aggregate([("n", "sum")])
        return g.rename_columns(["q", "d", "n"])

    jc = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "q" not in jc.columns or len(jc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _QDM_COLS})
    jc = jc.sort_values(["q", "d"]).reset_index(drop=True)
    n = float(jc["n"].sum())
    pq = jc.groupby("q")["n"].sum() / n
    pd_ = jc.groupby("d")["n"].sum() / n
    mi = 0.0
    for _, r in jc.iterrows():
        pxy = r["n"] / n
        mi += pxy * np.log2(
            pxy / (float(pq[r["q"]]) * float(pd_[r["d"]])))
    return pa.table({
        "n_lines": pa.array([int(n)], pa.int64()),
        "n_qty_levels": pa.array([len(pq)], pa.int64()),
        "n_discount_levels": pa.array([len(pd_)], pa.int64()),
        "mi_ppm": pa.array(
            [_round_half_away(mi * 1e6)], pa.int64()),
    })


QDM_SQL = """
WITH jc AS MATERIALIZED (
  SELECT CAST(ROUND(l_quantity, 0) AS BIGINT) AS q,
         CAST(ROUND(l_discount * 10000, 0) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
  GROUP BY 1, 2
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS n FROM jc
), mq AS MATERIALIZED (
  SELECT q, CAST(SUM(n) AS BIGINT) AS nq FROM jc GROUP BY 1
), md AS MATERIALIZED (
  SELECT d, CAST(SUM(n) AS BIGINT) AS ndd FROM jc GROUP BY 1
), mi AS MATERIALIZED (
  SELECT SUM((CAST(jc.n AS DOUBLE) / tot.n)
             * LOG2((CAST(jc.n AS DOUBLE) / tot.n)
                    / ((CAST(mq.nq AS DOUBLE) / tot.n)
                       * (CAST(md.ndd AS DOUBLE) / tot.n))))
           AS v
  FROM jc JOIN mq USING (q) JOIN md USING (d)
  CROSS JOIN tot
)
SELECT tot.n AS n_lines,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM mq)
         AS n_qty_levels,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM md)
         AS n_discount_levels,
       CAST(ROUND(mi.v * 1000000, 0) AS BIGINT) AS mi_ppm
FROM tot CROSS JOIN mi
WHERE tot.n > 0
"""

_VMM_COLS = ["magnitude", "n_orders", "share_ppm",
             "revenue_share_ppm"]


def q_value_magnitude_mix(sf_dir):
    """The spread inside the average: orders bucketed by the
    decimal magnitude of their total cents (number of digits) —
    count share versus revenue share per magnitude shows how
    many orders of magnitude one 'AOV' metric is papering over.
    Digit counts are exact integer arithmetic."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_totalprice"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_totalprice"]))
        if b.num_rows == 0:
            return pa.table({
                "mag": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        tp = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(tp >= 0, np.floor(tp * 100 + 0.5),
                         np.ceil(tp * 100 - 0.5)).astype(
            np.int64)
        keep = cents > 0
        cents = cents[keep]
        mag = np.char.str_len(
            cents.astype(np.str_)).astype(np.int64)
        df = pd.DataFrame({"mag": mag, "n": 1, "cents": cents})
        agg = df.groupby("mag").sum().reset_index()
        for c in ["mag", "n", "cents"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["mag"]).aggregate(
            [("n", "sum"), ("cents", "sum")])
        return g.rename_columns(["mag", "n", "cents"])

    cc = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None), comb).to_pandas()
    if "mag" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _VMM_COLS})
    tot_n = int(cc["n"].sum())
    tot_c = int(cc["cents"].sum())
    if tot_n == 0 or tot_c == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _VMM_COLS})
    cc = cc.sort_values("mag")
    return pa.table({
        "magnitude": pa.array(
            cc["mag"].to_numpy(np.int64), pa.int64()),
        "n_orders": pa.array(
            cc["n"].to_numpy(np.int64), pa.int64()),
        "share_ppm": pa.array(
            [_round_half_away(n / tot_n * 1e6)
             for n in cc["n"]], pa.int64()),
        "revenue_share_ppm": pa.array(
            [_round_half_away(c / tot_c * 1e6)
             for c in cc["cents"]], pa.int64()),
    })


VMM_SQL = """
WITH oc AS MATERIALIZED (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders WHERE o_totalprice IS NOT NULL
), mg AS MATERIALIZED (
  SELECT CAST(LENGTH(CAST(cents AS VARCHAR)) AS BIGINT)
           AS mag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM oc WHERE cents > 0
  GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS tn,
         CAST(SUM(cents) AS BIGINT) AS tc
  FROM mg
)
SELECT mg.mag AS magnitude, mg.n AS n_orders,
       CAST(ROUND(CAST(mg.n AS DOUBLE) / tot.tn * 1000000, 0)
            AS BIGINT) AS share_ppm,
       CAST(ROUND(CAST(mg.cents AS DOUBLE) / tot.tc
            * 1000000, 0) AS BIGINT) AS revenue_share_ppm
FROM mg CROSS JOIN tot
WHERE tot.tn > 0 AND tot.tc > 0
ORDER BY mg.mag
"""


def register_r4jg(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "user_day_coverage": q_user_day_coverage,
            "qty_discount_mi": q_qty_discount_mi,
            "value_magnitude_mix": q_value_magnitude_mix,
        }
    )
    oracles.update(
        {
            "user_day_coverage": UDC_SQL,
            "qty_discount_mi": QDM_SQL,
            "value_magnitude_mix": VMM_SQL,
        }
    )
