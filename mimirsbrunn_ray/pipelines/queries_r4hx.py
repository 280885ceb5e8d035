"""Round-4 batch HX: personal load balance, urgency timing, and
catalog concentration drift — the mean within-user activity Gini
(how unevenly each user spreads their OWN events across their
active days — binge users vs steady users, invisible to
cross-user concentration), the urgent-weekend lift (is 1-URGENT
over-represented among weekend orders — urgency as a weekend
phenomenon), and the part-revenue HHI trend (monthly revenue
concentration across parts plus slope — is the catalog's head
eating its tail over time?).

Exactness discipline: per-user and per-month Ginis/HHIs use
tie-invariant exact-integer formulas (products below 2^53 are
exact doubles); lifts are exact count ratios; slopes mirror."""

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
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_WUG_COLS = ["n_users", "mean_gini_ppm", "p90_gini_ppm"]


def q_within_user_gini_mean(sf_dir):
    """Binge vs steady: for each user with 3+ active days, the
    Gini of their daily event counts over their OWN active days —
    the mean and p90 across users; high within-user Gini users
    binge (retention math differs) even when total volume looks
    identical.  Users resolve in disjoint shards with exact
    integer Ginis."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({
            "user_id": b["user_id"].cast(pa.int64()),
            "day": pc.divide(us, _DAY_US),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["user_id", "day"]).aggregate(
            [("n", "sum")])
        g = g.rename_columns(["user_id", "day", "n"])
        return add_bucket(g, "user_id", 64)

    def ginis(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "gini": pd.Series([], dtype=np.float64),
        })
        if len(g) == 0:
            return empty
        # combine duplicate (user, day) rows across batches first
        g = g.groupby(["user_id", "day"])["n"].sum().reset_index()
        rows = []
        for uid, sub in g.groupby("user_id"):
            v = np.sort(sub["n"].to_numpy(np.int64),
                        kind="mergesort").astype(np.float64)
            nd = len(v)
            s = v.sum()
            if nd < 3 or s == 0:
                continue
            i = np.arange(1, nd + 1, dtype=np.float64)
            rows.append(
                float(((2 * i - nd - 1) * v).sum()) / (nd * s))
        return pd.DataFrame(
            {"gini": np.array(rows, dtype=np.float64)})

    gg = (
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(ginis, batch_format="pandas")
        .to_pandas()
    )
    if "gini" not in gg.columns or len(gg) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _WUG_COLS})
    v = gg["gini"].to_numpy(np.float64)
    return pa.table({
        "n_users": pa.array([len(v)], pa.int64()),
        "mean_gini_ppm": pa.array(
            [_round_half_away(float(v.mean()) * 1e6)],
            pa.int64()),
        "p90_gini_ppm": pa.array(
            [_round_half_away(float(np.percentile(v, 90))
                              * 1e6)], pa.int64()),
    })


WUG_SQL = f"""
WITH ud AS MATERIALIZED (
  SELECT user_id, EPOCH_US(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), rk AS MATERIALIZED (
  SELECT user_id, n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY n) AS i,
         COUNT(*) OVER (PARTITION BY user_id) AS nd,
         SUM(n) OVER (PARTITION BY user_id) AS s
  FROM ud
), gu AS MATERIALIZED (
  SELECT user_id,
         SUM((2 * i - nd - 1) * n)
           / (ANY_VALUE(nd) * CAST(ANY_VALUE(s) AS DOUBLE))
           AS gini
  FROM rk
  WHERE nd >= 3 AND s <> 0
  GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(ROUND(AVG(gini) * 1000000, 0) AS BIGINT)
         AS mean_gini_ppm,
       CAST(ROUND(QUANTILE_CONT(gini, 0.9) * 1000000, 0)
            AS BIGINT) AS p90_gini_ppm
FROM gu HAVING COUNT(*) > 0
"""

_UWL_COLS = ["n_weekend", "n_weekday", "urgent_we_ppm",
             "urgent_wd_ppm", "lift_ppm"]


def q_urgent_weekend_lift(sf_dir):
    """Is urgency a weekend phenomenon?  The share of 1-URGENT
    orders among weekend versus weekday orders, and the lift —
    weekend urgency pressure means weekend capacity needs
    expedite lanes, not just bodies.  Pure integer counts."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_orderpriority"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_orderdate", "o_orderpriority"))
        if b.num_rows == 0:
            return pa.table({
                "we": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "u": pa.array([], pa.int64()),
            })
        us = b["o_orderdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        we = ((us // _DAY_US + 4) % 7 >= 5).astype(np.int64)
        urg = (np.asarray(b["o_orderpriority"].to_numpy(
            zero_copy_only=False)) == "1-URGENT").astype(
            np.int64)
        df = pd.DataFrame({"we": we, "n": 1, "u": urg})
        agg = df.groupby("we").agg(
            n=("n", "sum"), u=("u", "sum")).reset_index()
        for c in ["we", "n", "u"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["we"]).aggregate(
            [("n", "sum"), ("u", "sum")])
        return g.rename_columns(["we", "n", "u"])

    cc = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
    ).to_pandas()
    if "we" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _UWL_COLS})
    d = {int(r["we"]): (int(r["n"]), int(r["u"]))
         for _, r in cc.iterrows()}
    if 1 not in d or 0 not in d or d[1][0] == 0 or d[0][0] == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _UWL_COLS})
    n1, u1 = d[1]
    n0, u0 = d[0]
    p1 = u1 / n1
    p0 = u0 / n0
    if p0 == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _UWL_COLS})
    return pa.table({
        "n_weekend": pa.array([n1], pa.int64()),
        "n_weekday": pa.array([n0], pa.int64()),
        "urgent_we_ppm": pa.array(
            [_round_half_away(p1 * 1e6)], pa.int64()),
        "urgent_wd_ppm": pa.array(
            [_round_half_away(p0 * 1e6)], pa.int64()),
        "lift_ppm": pa.array(
            [_round_half_away(p1 / p0 * 1e6)], pa.int64()),
    })


UWL_SQL = f"""
WITH o AS MATERIALIZED (
  SELECT CASE WHEN ((EPOCH_US(o_orderdate) // {_DAY_US}) + 4)
                   % 7 >= 5
              THEN 1 ELSE 0 END AS we,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
         END AS u
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
), agg AS MATERIALIZED (
  SELECT we, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(u) AS BIGINT) AS u
  FROM o GROUP BY 1
), wide AS (
  SELECT
    MAX(CASE WHEN we = 1 THEN n END) AS n1,
    MAX(CASE WHEN we = 1 THEN u END) AS u1,
    MAX(CASE WHEN we = 0 THEN n END) AS n0,
    MAX(CASE WHEN we = 0 THEN u END) AS u0
  FROM agg
)
SELECT CAST(n1 AS BIGINT) AS n_weekend,
       CAST(n0 AS BIGINT) AS n_weekday,
       CAST(ROUND(CAST(u1 AS DOUBLE) / n1 * 1000000, 0)
            AS BIGINT) AS urgent_we_ppm,
       CAST(ROUND(CAST(u0 AS DOUBLE) / n0 * 1000000, 0)
            AS BIGINT) AS urgent_wd_ppm,
       CAST(ROUND((CAST(u1 AS DOUBLE) / n1)
            / (CAST(u0 AS DOUBLE) / n0) * 1000000, 0)
            AS BIGINT) AS lift_ppm
FROM wide
WHERE n1 > 0 AND n0 > 0 AND u0 > 0
"""

_PHT_COLS = ["n_months", "slope_ppm_per_month_x1e3",
             "first_hhi_ppm", "last_hhi_ppm"]


def q_part_hhi_trend(sf_dir):
    """Is the catalog's head eating its tail?  The monthly HHI of
    revenue across parts (sum of squared revenue shares, exact
    cents) and its OLS slope — rising part-level concentration
    means the long tail is dying and assortment breadth is
    cosmetic.  Per-(part, month) cents fold exactly; HHIs and the
    slope mirror."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_partkey", "l_shipdate",
                       "l_extendedprice", "l_discount"))
        if b.num_rows == 0:
            return pa.table({
                "pk": pa.array([], pa.int64()),
                "mon": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        d = b["l_shipdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(np.int64)
        rev = (b["l_extendedprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
            * (1.0 - b["l_discount"].cast(pa.float64()).to_numpy(
                zero_copy_only=False)))
        cents = np.where(
            rev >= 0, np.floor(rev * 100.0 + 0.5),
            np.ceil(rev * 100.0 - 0.5)).astype(np.int64)
        t = pa.table({
            "pk": b["l_partkey"].cast(pa.int64()),
            "mon": pa.array(mon),
            "cents": pa.array(cents),
        })
        g = t.group_by(["pk", "mon"]).aggregate(
            [("cents", "sum")])
        return g.rename_columns(["pk", "mon", "cents"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["pk", "mon"]).aggregate(
            [("cents", "sum")])
        return g.rename_columns(["pk", "mon", "cents"])

    pm = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["mon"],
    ).to_pandas()
    if "mon" not in pm.columns or len(pm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PHT_COLS})
    hhis = {}
    for mon, g in pm.groupby("mon"):
        cents = g["cents"].to_numpy(np.int64).astype(np.float64)
        tot = cents.sum()
        if tot == 0:
            continue
        sh = cents / tot
        hhis[int(mon)] = _round_half_away(
            float((sh * sh).sum()) * 1e6)
    if len(hhis) < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PHT_COLS})
    mons = np.array(sorted(hhis), dtype=np.float64)
    y = np.array([hhis[int(m)] for m in mons],
                 dtype=np.float64)
    n = len(mons)
    sx, sy = mons.sum(), y.sum()
    sxx = (mons * mons).sum()
    sxy = (mons * y).sum()
    den = n * sxx - sx * sx
    if den == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PHT_COLS})
    slope = (n * sxy - sx * sy) / den
    return pa.table({
        "n_months": pa.array([n], pa.int64()),
        "slope_ppm_per_month_x1e3": pa.array(
            [_round_half_away(slope * 1e3)], pa.int64()),
        "first_hhi_ppm": pa.array([int(y[0])], pa.int64()),
        "last_hhi_ppm": pa.array([int(y[-1])], pa.int64()),
    })


PHT_SQL = """
WITH pm AS MATERIALIZED (
  SELECT l_partkey AS pk,
         YEAR(l_shipdate) * 12 + MONTH(l_shipdate) - 1 AS mon,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                             * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_shipdate IS NOT NULL
    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
  GROUP BY 1, 2
), tot AS MATERIALIZED (
  SELECT mon, CAST(SUM(cents) AS BIGINT) AS t
  FROM pm GROUP BY 1
), hhi AS MATERIALIZED (
  SELECT pm.mon,
         CAST(ROUND(SUM((CAST(pm.cents AS DOUBLE) / tot.t)
                        * (CAST(pm.cents AS DOUBLE) / tot.t))
              * 1000000, 0) AS BIGINT) AS h
  FROM pm JOIN tot USING (mon)
  WHERE tot.t <> 0
  GROUP BY pm.mon
), st AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(mon AS DOUBLE)) AS sx,
         SUM(CAST(h AS DOUBLE)) AS sy,
         SUM(CAST(mon AS DOUBLE) * mon) AS sxx,
         SUM(CAST(mon AS DOUBLE) * h) AS sxy,
         MIN(mon) AS m0, MAX(mon) AS m1
  FROM hhi
)
SELECT st.n AS n_months,
       CAST(ROUND((st.n * st.sxy - st.sx * st.sy)
            / (st.n * st.sxx - st.sx * st.sx) * 1000, 0)
            AS BIGINT) AS slope_ppm_per_month_x1e3,
       (SELECT h FROM hhi WHERE mon = st.m0) AS first_hhi_ppm,
       (SELECT h FROM hhi WHERE mon = st.m1) AS last_hhi_ppm
FROM st
WHERE st.n >= 2 AND st.n * st.sxx - st.sx * st.sx <> 0
"""


def register_r4hx(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "within_user_gini_mean": q_within_user_gini_mean,
            "urgent_weekend_lift": q_urgent_weekend_lift,
            "part_hhi_trend": q_part_hhi_trend,
        }
    )
    oracles.update(
        {
            "within_user_gini_mean": WUG_SQL,
            "urgent_weekend_lift": UWL_SQL,
            "part_hhi_trend": PHT_SQL,
        }
    )
