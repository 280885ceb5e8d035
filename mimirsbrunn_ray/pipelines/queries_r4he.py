"""Round-4 batch HE: market reach, cross-stream coupling, and bulk
pricing — supplier market reach (distinct customer nations each
supplier's lineitems ultimately serve, with revenue-weighted reach
entropy; the two-hop lineitem->order->customer join), the daily
activity-revenue coupling (Pearson between window-aligned daily
event counts and order counts — do the two streams breathe
together?), and the bulk discount curve (mean discount by quantity
level plus its OLS slope — is there an actual volume-pricing
policy?).

Exactness discipline: reach sets and revenue cents fold exactly
through broadcast dimension maps; the coupling and slope fold
identical centered sums over exact integer dailies; entropy
mirrors per supplier."""

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
from mimirsbrunn_ray.pipelines.queries_r4gz import _pearson
from mimirsbrunn_ray.stages.rollup import tree_merge

_REACH_TOP = 10


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_SMR_COLS = ["suppkey", "n_nations", "revenue_cents",
             "reach_entropy_x1e6"]


def q_supplier_market_reach(sf_dir):
    """Top-10 suppliers by market reach: distinct customer NATIONS
    their lineitems ultimately serve (two dimension hops:
    lineitem -> order -> customer -> nation), with revenue-weighted
    reach entropy (high entropy = genuinely diversified, low =
    nominally global but really one market) — ranked by nation
    count then entropy.  Both dims broadcast; per-(supplier,
    nation) cents fold exactly."""
    # both dimension hops attach via budget-gated broadcast / join
    # (stages/broadcast.py) — neither orders nor customer lands on the
    # driver; the (supplier, nation) grain is the only driver pull
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])
    li = li.map_batches(
        lambda b: _valid(b, ("l_orderkey", "l_suppkey",
                             "l_extendedprice", "l_discount")),
        batch_format="pyarrow", batch_size=None)
    li = attach_dim(li, "l_orderkey", sf_dir, "orders", "o_orderkey",
                    ["o_custkey"], how="inner")
    li = attach_dim(li, "o_custkey", sf_dir, "customer", "c_custkey",
                    ["c_nationkey"], how="inner")

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "sk": pa.array([], pa.int64()),
                "nk": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        rev = (b["l_extendedprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
            * (1.0 - b["l_discount"].cast(pa.float64()).to_numpy(
                zero_copy_only=False)))
        cents = np.where(
            rev >= 0, np.floor(rev * 100.0 + 0.5),
            np.ceil(rev * 100.0 - 0.5)).astype(np.int64)
        t = pa.table({
            "sk": pa.array(
                b["l_suppkey"].to_numpy(
                    zero_copy_only=False).astype(np.int64)),
            "nk": pa.array(
                b["c_nationkey"].to_numpy(
                    zero_copy_only=False).astype(np.int64)),
            "cents": pa.array(cents),
        })
        g = t.group_by(["sk", "nk"]).aggregate([("cents", "sum")])
        return g.rename_columns(["sk", "nk", "cents"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["sk", "nk"]).aggregate([("cents", "sum")])
        return g.rename_columns(["sk", "nk", "cents"])

    sn = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["sk"],
    ).to_pandas()
    if "sk" not in sn.columns or len(sn) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SMR_COLS})
    out = {c: [] for c in _SMR_COLS}
    for sk, g in sn.groupby("sk", sort=True):
        cents = g["cents"].to_numpy(np.int64)
        tot = int(cents.sum())
        if tot <= 0:
            continue
        p = cents.astype(np.float64) / tot
        p = p[p > 0]
        h = float(-(p * np.log2(p)).sum())
        out["suppkey"].append(int(sk))
        out["n_nations"].append(len(g))
        out["revenue_cents"].append(tot)
        out["reach_entropy_x1e6"].append(
            _round_half_away(h * 1e6))
    df = pd.DataFrame(out).sort_values(
        ["n_nations", "reach_entropy_x1e6", "suppkey"],
        ascending=[False, False, True],
        ignore_index=True).head(_REACH_TOP)
    return pa.table(
        {c: pa.array(df[c].to_numpy(np.int64))
         for c in _SMR_COLS})


SMR_SQL = f"""
WITH sn AS MATERIALIZED (
  SELECT l.l_suppkey AS sk, c.c_nationkey AS nk,
         CAST(SUM(CAST(ROUND(l.l_extendedprice
                             * (1 - l.l_discount) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE l.l_suppkey IS NOT NULL
    AND l.l_extendedprice IS NOT NULL
    AND l.l_discount IS NOT NULL
  GROUP BY 1, 2
), pr AS MATERIALIZED (
  SELECT sk, nk, cents,
         CAST(cents AS DOUBLE)
           / SUM(cents) OVER (PARTITION BY sk) AS p,
         SUM(cents) OVER (PARTITION BY sk) AS tot
  FROM sn
), agg AS (
  SELECT sk,
         CAST(COUNT(*) AS BIGINT) AS n_nations,
         CAST(ANY_VALUE(tot) AS BIGINT) AS revenue_cents,
         CAST(ROUND(-SUM(CASE WHEN p > 0 THEN p * LOG2(p)
                              ELSE 0 END) * 1000000, 0)
              AS BIGINT) AS reach_entropy_x1e6
  FROM pr
  GROUP BY sk
  HAVING ANY_VALUE(tot) > 0
)
SELECT CAST(sk AS BIGINT) AS suppkey,
       n_nations, revenue_cents, reach_entropy_x1e6
FROM agg
ORDER BY n_nations DESC, reach_entropy_x1e6 DESC, suppkey
LIMIT {_REACH_TOP}
"""

_ARC_COLS = ["n_days", "r_x1e6", "mean_events_x1e3",
             "mean_orders_x1e3"]


def q_activity_revenue_coupling(sf_dir):
    """Do the two streams breathe together?  Pearson correlation
    between window-aligned daily EVENT counts and daily ORDER
    counts (day k of each table's own span, as in the aligned-ARPU
    query) — coupling near zero means the clickstream is not the
    demand stream's shadow and each needs its own capacity model.
    Daily counts fold exactly; the alignment is integer offset
    math."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts"])

    def e_part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({"d": pc.divide(us, _DAY_US)})
        g = t.group_by(["d"]).aggregate([([], "count_all")])
        return g.rename_columns(["d", "n"])

    def d_comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["d"]).aggregate([("n", "sum")])
        return g.rename_columns(["d", "n"])

    ed = tree_merge(
        ev.map_batches(e_part, batch_format="pyarrow",
                       batch_size=None),
        d_comb,
    ).to_pandas()

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate"])

    def o_part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_orderdate"]))
        us = b["o_orderdate"].cast(pa.timestamp("us")).cast(
            pa.int64())
        t = pa.table({"d": pc.divide(us, _DAY_US)})
        g = t.group_by(["d"]).aggregate([([], "count_all")])
        return g.rename_columns(["d", "n"])

    od = tree_merge(
        orders.map_batches(o_part, batch_format="pyarrow",
                           batch_size=None),
        d_comb,
    ).to_pandas()
    if ("d" not in ed.columns or len(ed) == 0
            or "d" not in od.columns or len(od) == 0):
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ARC_COLS})
    e_map = dict(zip(ed["d"].astype(np.int64),
                     ed["n"].astype(np.int64)))
    o_map = dict(zip(od["d"].astype(np.int64),
                     od["n"].astype(np.int64)))
    e0 = min(e_map)
    o0 = min(o_map)
    xs, ys = [], []
    k = 0
    while True:
        if e0 + k not in e_map or o0 + k not in o_map:
            if e0 + k > max(e_map) or o0 + k > max(o_map):
                break
            k += 1
            continue
        xs.append(e_map[e0 + k])
        ys.append(o_map[o0 + k])
        k += 1
    if len(xs) < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ARC_COLS})
    x = np.array(xs, dtype=np.float64)
    y = np.array(ys, dtype=np.float64)
    r = _pearson(x, y)
    if r is None:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ARC_COLS})
    return pa.table({
        "n_days": pa.array([len(xs)], pa.int64()),
        "r_x1e6": pa.array(
            [_round_half_away(r * 1e6)], pa.int64()),
        "mean_events_x1e3": pa.array(
            [_round_half_away(float(x.mean()) * 1e3)],
            pa.int64()),
        "mean_orders_x1e3": pa.array(
            [_round_half_away(float(y.mean()) * 1e3)],
            pa.int64()),
    })


ARC_SQL = f"""
WITH ed AS MATERIALIZED (
  SELECT EPOCH_US(ts) // {_DAY_US} AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), od AS MATERIALIZED (
  SELECT EPOCH_US(o_orderdate) // {_DAY_US} AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
), e0 AS MATERIALIZED (SELECT MIN(d) AS d0 FROM ed),
o0 AS MATERIALIZED (SELECT MIN(d) AS d0 FROM od),
joined AS MATERIALIZED (
  SELECT CAST(ed.n AS DOUBLE) AS x, CAST(od.n AS DOUBLE) AS y
  FROM ed CROSS JOIN e0 CROSS JOIN o0
  JOIN od ON od.d = o0.d0 + (ed.d - e0.d0)
), mu AS MATERIALIZED (
  SELECT AVG(x) AS mx, AVG(y) AS my,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM joined
), mom AS (
  SELECT SUM((j.x - mu.mx) * (j.y - mu.my)) AS sxy,
         SUM((j.x - mu.mx) * (j.x - mu.mx)) AS sxx,
         SUM((j.y - mu.my) * (j.y - mu.my)) AS syy
  FROM joined j CROSS JOIN mu
)
SELECT mu.n AS n_days,
       CAST(ROUND(mom.sxy / SQRT(mom.sxx * mom.syy) * 1000000,
            0) AS BIGINT) AS r_x1e6,
       CAST(ROUND(mu.mx * 1000, 0) AS BIGINT)
         AS mean_events_x1e3,
       CAST(ROUND(mu.my * 1000, 0) AS BIGINT)
         AS mean_orders_x1e3
FROM mu CROSS JOIN mom
WHERE mu.n >= 3 AND mom.sxx * mom.syy > 0
"""

_BDC2_COLS = ["n_qty_levels", "slope_bp_per_unit_x1e6",
              "min_qty_mean_bp_x1e3", "max_qty_mean_bp_x1e3"]


def q_bulk_discount_curve(sf_dir):
    """Volume-pricing policy check: the mean discount (basis
    points) at each integer quantity level and the OLS slope of
    those means against quantity — a positive slope is a real bulk
    discount ladder; a flat one means 'bulk discounts' here are
    folklore.  Per-level sums fold exactly; the slope folds the
    identical centered form over the level means."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_discount"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_quantity", "l_discount"))
        if b.num_rows == 0:
            return pa.table({
                "q": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "bp": pa.array([], pa.int64()),
            })
        x = b["l_quantity"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        q = np.where(x >= 0, np.floor(x + 0.5),
                     np.ceil(x - 0.5)).astype(np.int64)
        d = b["l_discount"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        bp = np.where(d >= 0, np.floor(d * 1e4 + 0.5),
                      np.ceil(d * 1e4 - 0.5)).astype(np.int64)
        t = pa.table({
            "q": pa.array(q),
            "n": pa.array(np.ones(len(q), np.int64)),
            "bp": pa.array(bp),
        })
        g = t.group_by(["q"]).aggregate(
            [("n", "sum"), ("bp", "sum")])
        return g.rename_columns(["q", "n", "bp"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["q"]).aggregate(
            [("n", "sum"), ("bp", "sum")])
        return g.rename_columns(["q", "n", "bp"])

    cc = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "q" not in cc.columns or len(cc) < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BDC2_COLS})
    cc = cc.sort_values("q", ignore_index=True)
    q = cc["q"].to_numpy(np.int64).astype(np.float64)
    mean_bp = (cc["bp"].to_numpy(np.int64).astype(np.float64)
               / cc["n"].to_numpy(np.int64))
    n = len(q)
    sx, sy = q.sum(), mean_bp.sum()
    sxx = (q * q).sum()
    sxy = (q * mean_bp).sum()
    den = n * sxx - sx * sx
    if den == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BDC2_COLS})
    slope = (n * sxy - sx * sy) / den
    return pa.table({
        "n_qty_levels": pa.array([n], pa.int64()),
        "slope_bp_per_unit_x1e6": pa.array(
            [_round_half_away(slope * 1e6)], pa.int64()),
        "min_qty_mean_bp_x1e3": pa.array(
            [_round_half_away(float(mean_bp[0]) * 1e3)],
            pa.int64()),
        "max_qty_mean_bp_x1e3": pa.array(
            [_round_half_away(float(mean_bp[-1]) * 1e3)],
            pa.int64()),
    })


BDC2_SQL = """
WITH lv AS MATERIALIZED (
  SELECT CAST(ROUND(l_quantity, 0) AS BIGINT) AS q,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(l_discount * 10000, 0) AS BIGINT))
              AS BIGINT) AS bp
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
  GROUP BY 1
), mb AS MATERIALIZED (
  SELECT q, CAST(bp AS DOUBLE) / n AS mean_bp FROM lv
), st AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(q AS DOUBLE)) AS sx,
         SUM(mean_bp) AS sy,
         SUM(CAST(q AS DOUBLE) * q) AS sxx,
         SUM(CAST(q AS DOUBLE) * mean_bp) AS sxy
  FROM mb
), ends AS MATERIALIZED (
  SELECT (SELECT mean_bp FROM mb ORDER BY q LIMIT 1) AS lo,
         (SELECT mean_bp FROM mb ORDER BY q DESC LIMIT 1) AS hi
)
SELECT st.n AS n_qty_levels,
       CAST(ROUND((st.n * st.sxy - st.sx * st.sy)
            / (st.n * st.sxx - st.sx * st.sx) * 1000000, 0)
            AS BIGINT) AS slope_bp_per_unit_x1e6,
       CAST(ROUND(ends.lo * 1000, 0) AS BIGINT)
         AS min_qty_mean_bp_x1e3,
       CAST(ROUND(ends.hi * 1000, 0) AS BIGINT)
         AS max_qty_mean_bp_x1e3
FROM st CROSS JOIN ends
WHERE st.n >= 3 AND st.n * st.sxx - st.sx * st.sx <> 0
"""


def register_r4he(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "supplier_market_reach": q_supplier_market_reach,
            "activity_revenue_coupling":
                q_activity_revenue_coupling,
            "bulk_discount_curve": q_bulk_discount_curve,
        }
    )
    oracles.update(
        {
            "supplier_market_reach": SMR_SQL,
            "activity_revenue_coupling": ARC_SQL,
            "bulk_discount_curve": BDC2_SQL,
        }
    )
