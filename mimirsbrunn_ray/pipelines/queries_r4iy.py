"""Round-4 batch IY: supplier quality spread, activity scaling
law, and brand price positioning — the supplier return-rate
spread (across suppliers with enough volume, how wide the
return-share distribution runs — one bad supplier or a bad
process?), the DAU-volume scaling law (the log-log slope of
daily events on daily active users: superlinear means each
marginal user adds more than one user's worth of load), and the
brand price-positioning spread (the range and quartiles of
brand median prices — how separated the price ladder really
is).

Exactness discipline: return counts fold exactly with shares
snapped after division; the log-log regression mirrors LN on
exact integer counts; brand medians interpolate identically
over exact cents."""

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

_MIN_LINES = 100


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_SRS_COLS = ["n_suppliers", "min_ppm", "q1_ppm", "median_ppm",
             "q3_ppm", "max_ppm"]


def q_supplier_return_rate_spread(sf_dir):
    """One bad supplier or a bad process?  Across suppliers with
    100+ lines, the distribution of their return share
    (l_returnflag = 'R'): min, quartiles, max — a tight band
    says returns are systemic, a long right tail names the
    culprits.  Per-supplier counts fold exactly; quartiles
    interpolate identically over the snapped shares."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_returnflag"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_suppkey", "l_returnflag"))
        if b.num_rows == 0:
            return pa.table({
                "sk": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "r": pa.array([], pa.int64()),
            })
        rf = np.asarray(
            b["l_returnflag"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "sk": b["l_suppkey"].cast(pa.int64()).to_numpy(
                zero_copy_only=False),
            "n": 1,
            "r": (rf == "R").astype(np.int64),
        })
        agg = df.groupby("sk").sum().reset_index()
        for c in ["sk", "n", "r"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["sk"]).aggregate(
            [("n", "sum"), ("r", "sum")])
        return g.rename_columns(["sk", "n", "r"])

    per = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "sk" not in per.columns or len(per) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SRS_COLS})
    per = per[per["n"] >= _MIN_LINES]
    if len(per) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SRS_COLS})
    share = np.array(
        [_round_half_away(r / n * 1e6)
         for r, n in zip(per["r"], per["n"])],
        np.int64).astype(np.float64)
    return pa.table({
        "n_suppliers": pa.array([len(per)], pa.int64()),
        "min_ppm": pa.array([int(share.min())], pa.int64()),
        "q1_ppm": pa.array(
            [_round_half_away(float(np.percentile(share, 25)))],
            pa.int64()),
        "median_ppm": pa.array(
            [_round_half_away(float(np.percentile(share, 50)))],
            pa.int64()),
        "q3_ppm": pa.array(
            [_round_half_away(float(np.percentile(share, 75)))],
            pa.int64()),
        "max_ppm": pa.array([int(share.max())], pa.int64()),
    })


SRS_SQL = f"""
WITH per AS MATERIALIZED (
  SELECT l_suppkey AS sk, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
                  END) AS BIGINT) AS r
  FROM lineitem
  WHERE l_suppkey IS NOT NULL AND l_returnflag IS NOT NULL
  GROUP BY 1
  HAVING COUNT(*) >= {_MIN_LINES}
), sh AS MATERIALIZED (
  SELECT CAST(ROUND(CAST(r AS DOUBLE) / n * 1000000, 0)
              AS BIGINT) AS share
  FROM per
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(MIN(share) AS BIGINT) AS min_ppm,
       CAST(ROUND(QUANTILE_CONT(CAST(share AS DOUBLE), 0.25),
            0) AS BIGINT) AS q1_ppm,
       CAST(ROUND(QUANTILE_CONT(CAST(share AS DOUBLE), 0.50),
            0) AS BIGINT) AS median_ppm,
       CAST(ROUND(QUANTILE_CONT(CAST(share AS DOUBLE), 0.75),
            0) AS BIGINT) AS q3_ppm,
       CAST(MAX(share) AS BIGINT) AS max_ppm
FROM sh HAVING COUNT(*) > 0
"""

_DVS_COLS = ["n_days", "loglog_slope_x1e6", "mean_epu_x1e3"]


def q_dau_volume_scaling(sf_dir):
    """Does each marginal user add more than one user's load?
    The log-log OLS slope of daily event counts on daily active
    users — slope > 1 is superlinear crowding, < 1 is
    saturation; plus the mean events per user-day.  Daily
    (events, DAU) pairs fold exactly; LN mirrors on the exact
    integers."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({
            "day": pc.divide(us, _DAY_US),
            "u": b["user_id"].cast(pa.int64()),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["day", "u"]).aggregate([("n", "sum")])
        return g.rename_columns(["day", "u", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["day", "u"]).aggregate([("n", "sum")])
        return g.rename_columns(["day", "u", "n"])

    du = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["day"],
    ).to_pandas()
    if "day" not in du.columns or len(du) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DVS_COLS})
    daily = du.groupby("day").agg(
        dau=("u", "count"), ev=("n", "sum")).reset_index()
    daily = daily[(daily["dau"] > 0) & (daily["ev"] > 0)]
    if len(daily) < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DVS_COLS})
    x = np.log(daily["dau"].to_numpy(np.int64).astype(
        np.float64))
    y = np.log(daily["ev"].to_numpy(np.int64).astype(
        np.float64))
    n = float(len(x))
    sx, sy = x.sum(), y.sum()
    sxx = (x * x).sum()
    sxy = (x * y).sum()
    den = n * sxx - sx * sx
    if den == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DVS_COLS})
    slope = (n * sxy - sx * sy) / den
    epu = (float(daily["ev"].sum())
           / float(daily["dau"].sum()))
    return pa.table({
        "n_days": pa.array([int(n)], pa.int64()),
        "loglog_slope_x1e6": pa.array(
            [_round_half_away(slope * 1e6)], pa.int64()),
        "mean_epu_x1e3": pa.array(
            [_round_half_away(epu * 1e3)], pa.int64()),
    })


DVS_SQL = f"""
WITH du AS MATERIALIZED (
  SELECT EPOCH_US(ts) // {_DAY_US} AS day, user_id AS u,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), daily AS MATERIALIZED (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau,
         CAST(SUM(n) AS BIGINT) AS ev
  FROM du GROUP BY 1
), pts AS MATERIALIZED (
  SELECT LN(CAST(dau AS DOUBLE)) AS x,
         LN(CAST(ev AS DOUBLE)) AS y, dau, ev
  FROM daily WHERE dau > 0 AND ev > 0
), st AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy,
         CAST(SUM(ev) AS BIGINT) AS tev,
         CAST(SUM(dau) AS BIGINT) AS tdau
  FROM pts
)
SELECT n AS n_days,
       CAST(ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx)
            * 1000000, 0) AS BIGINT) AS loglog_slope_x1e6,
       CAST(ROUND(CAST(tev AS DOUBLE) / tdau * 1000, 0)
            AS BIGINT) AS mean_epu_x1e3
FROM st
WHERE n >= 3 AND n * sxx - sx * sx <> 0
"""

_BPP_COLS = ["n_brands", "min_median_cents",
             "max_median_cents", "spread_cents",
             "iqr_of_medians_cents"]


def q_brand_price_positioning(sf_dir):
    """Is the price ladder real?  Each brand's MEDIAN retail
    price, then across brands: the lowest and highest brand
    median, their spread, and the IQR of brand medians — tightly
    clustered medians mean brand tiers are marketing, not
    pricing.  Brand medians interpolate identically over exact
    cents histograms."""
    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_brand", "p_retailprice"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("p_brand", "p_retailprice"))
        if b.num_rows == 0:
            return pa.table({
                "brand": pa.array([], pa.string()),
                "cents": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        rp = b["p_retailprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(rp >= 0, np.floor(rp * 100 + 0.5),
                         np.ceil(rp * 100 - 0.5)).astype(
            np.int64)
        t = pa.table({
            "brand": b["p_brand"].cast(pa.string()),
            "cents": pa.array(cents),
            "n": pa.array(np.ones(len(cents), np.int64)),
        })
        g = t.group_by(["brand", "cents"]).aggregate(
            [("n", "sum")])
        return g.rename_columns(["brand", "cents", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["brand", "cents"]).aggregate(
            [("n", "sum")])
        return g.rename_columns(["brand", "cents", "n"])

    hist = tree_merge(
        parts.map_batches(part, batch_format="pyarrow",
                          batch_size=None), comb).to_pandas()
    if "brand" not in hist.columns or len(hist) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BPP_COLS})
    medians = []
    for brand, g in hist.groupby("brand"):
        v = np.repeat(g["cents"].to_numpy(np.int64),
                      g["n"].to_numpy(np.int64)).astype(
            np.float64)
        medians.append(_round_half_away(
            float(np.percentile(v, 50))))
    med = np.array(medians, np.int64).astype(np.float64)
    if len(med) < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BPP_COLS})
    q1 = float(np.percentile(med, 25))
    q3 = float(np.percentile(med, 75))
    return pa.table({
        "n_brands": pa.array([len(med)], pa.int64()),
        "min_median_cents": pa.array(
            [int(med.min())], pa.int64()),
        "max_median_cents": pa.array(
            [int(med.max())], pa.int64()),
        "spread_cents": pa.array(
            [int(med.max() - med.min())], pa.int64()),
        "iqr_of_medians_cents": pa.array(
            [_round_half_away(q3 - q1)], pa.int64()),
    })


BPP_SQL = """
WITH bm AS MATERIALIZED (
  SELECT p_brand AS brand,
         CAST(ROUND(QUANTILE_CONT(
             CAST(ROUND(p_retailprice * 100, 0) AS BIGINT),
             0.5), 0) AS BIGINT) AS med
  FROM part
  WHERE p_brand IS NOT NULL AND p_retailprice IS NOT NULL
  GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_brands,
       CAST(MIN(med) AS BIGINT) AS min_median_cents,
       CAST(MAX(med) AS BIGINT) AS max_median_cents,
       CAST(MAX(med) - MIN(med) AS BIGINT) AS spread_cents,
       CAST(ROUND(QUANTILE_CONT(CAST(med AS DOUBLE), 0.75)
            - QUANTILE_CONT(CAST(med AS DOUBLE), 0.25), 0)
            AS BIGINT) AS iqr_of_medians_cents
FROM bm HAVING COUNT(*) >= 2
"""


def register_r4iy(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "supplier_return_rate_spread":
                q_supplier_return_rate_spread,
            "dau_volume_scaling": q_dau_volume_scaling,
            "brand_price_positioning":
                q_brand_price_positioning,
        }
    )
    oracles.update(
        {
            "supplier_return_rate_spread": SRS_SQL,
            "dau_volume_scaling": DVS_SQL,
            "brand_price_positioning": BPP_SQL,
        }
    )
