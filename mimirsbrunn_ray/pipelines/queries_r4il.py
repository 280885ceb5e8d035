"""Round-4 batch IL: the honeymoon effect, size-demand
economics, and same-day doubling — the honeymoon intensity ratio
(each user's events-per-day in their first week versus the rest
of their life: does engagement decay from day one?), the
size-demand slope (do physically bigger parts sell fewer units —
the logistics tax on demand), and the same-day multi-order
census (customers placing 2+ orders on one calendar day — split
shipments, failed carts, or genuine whales?).

Exactness discipline: day-window counts are exact integers with
the 7-day boundary an integer comparison; the size/quantity OLS
folds exact integer sums; same-day counts are exact distinct
aggregations."""

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


_HIR_COLS = ["n_users", "median_ratio_x1e3",
             "mean_ratio_x1e3", "n_decaying"]


def q_honeymoon_intensity_ratio(sf_dir):
    """Does engagement decay from day one?  For each user whose
    life spans 14+ days: events per day in days 0–6 after their
    first event versus events per day in the remainder; the
    median and mean of that ratio and how many users run above
    1 (honeymoon then fade).  Users resolve whole in hash
    buckets; the day-7 boundary is an exact integer test."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({
            "u": b["user_id"].cast(pa.int64()),
            "day": pc.divide(us, _DAY_US),
        })
        return add_bucket(t, "u", 64)

    def ratios(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "ratio": pd.Series([], dtype=np.float64),
        })
        if len(g) == 0:
            return empty
        out = []
        for u, sub in g.groupby("u"):
            d = sub["day"].to_numpy(np.int64)
            d0 = int(d.min())
            life = int(d.max()) - d0 + 1
            if life < 14:
                continue
            n1 = int((d - d0 < 7).sum())
            n2 = len(d) - n1
            if n2 == 0:
                continue
            r1 = n1 / 7.0
            r2 = n2 / (life - 7.0)
            out.append(r1 / r2)
        return pd.DataFrame(
            {"ratio": np.array(out, dtype=np.float64)})

    rr = (
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(ratios, batch_format="pandas")
        .to_pandas()
    )
    if "ratio" not in rr.columns or len(rr) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _HIR_COLS})
    v = rr["ratio"].to_numpy(np.float64)
    return pa.table({
        "n_users": pa.array([len(v)], pa.int64()),
        "median_ratio_x1e3": pa.array(
            [_round_half_away(float(np.percentile(v, 50))
                              * 1e3)], pa.int64()),
        "mean_ratio_x1e3": pa.array(
            [_round_half_away(float(v.mean()) * 1e3)],
            pa.int64()),
        "n_decaying": pa.array(
            [int((v > 1.0).sum())], pa.int64()),
    })


HIR_SQL = f"""
WITH ud AS MATERIALIZED (
  SELECT user_id AS u, EPOCH_US(ts) // {_DAY_US} AS day
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
), pu AS MATERIALIZED (
  SELECT u, MIN(day) AS d0,
         MAX(day) - MIN(day) + 1 AS life,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ud GROUP BY u
), fw AS MATERIALIZED (
  SELECT ud.u, CAST(COUNT(*) AS BIGINT) AS n1
  FROM ud JOIN (SELECT u, MIN(day) AS d0 FROM ud GROUP BY 1)
       m ON m.u = ud.u
  WHERE ud.day - m.d0 < 7
  GROUP BY ud.u
), rr AS MATERIALIZED (
  SELECT pu.u,
         (CAST(fw.n1 AS DOUBLE) / 7.0)
           / (CAST(pu.n - fw.n1 AS DOUBLE) / (pu.life - 7.0))
           AS ratio
  FROM pu JOIN fw USING (u)
  WHERE pu.life >= 14 AND pu.n - fw.n1 > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(ROUND(QUANTILE_CONT(ratio, 0.5) * 1000, 0)
            AS BIGINT) AS median_ratio_x1e3,
       CAST(ROUND(AVG(ratio) * 1000, 0) AS BIGINT)
         AS mean_ratio_x1e3,
       CAST(SUM(CASE WHEN ratio > 1.0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_decaying
FROM rr HAVING COUNT(*) > 0
"""

_SDS_COLS = ["n_parts", "slope_qty_per_size_x1e6", "corr_ppm"]


def q_size_demand_slope(sf_dir):
    """The logistics tax on demand: OLS slope and correlation of
    total units sold per part on the part's physical size — a
    negative slope quantifies how much shelf-unfriendly SKUs
    underperform.  Per-part quantity sums fold exactly; the tiny
    part-size map broadcasts; moment sums are exact integers."""
    # the size attaches to the part-grain reduction via budget-gated
    # broadcast / join — the part dim never lands whole on the driver
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_partkey", "l_quantity"))
        if b.num_rows == 0:
            return pa.table({
                "pk": pa.array([], pa.int64()),
                "q": pa.array([], pa.int64()),
            })
        qf = b["l_quantity"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        q = np.where(qf >= 0, np.floor(qf + 0.5),
                     np.ceil(qf - 0.5)).astype(np.int64)
        t = pa.table({
            "pk": b["l_partkey"].cast(pa.int64()),
            "q": pa.array(q),
        })
        g = t.group_by(["pk"]).aggregate([("q", "sum")])
        return g.rename_columns(["pk", "q"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["pk"]).aggregate([("q", "sum")])
        return g.rename_columns(["pk", "q"])

    pq_ds = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb)
    pq_ds = attach_dim(pq_ds, "pk", sf_dir, "part", "p_partkey",
                       ["p_size"], how="inner")
    pq = pq_ds.to_pandas()
    if "pk" not in pq.columns or len(pq) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SDS_COLS})
    pq = pq.dropna(subset=["p_size"])
    if len(pq) < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SDS_COLS})
    x = pq["p_size"].to_numpy(np.int64).astype(np.float64)
    y = pq["q"].to_numpy(np.int64).astype(np.float64)
    n = float(len(x))
    sx, sy = x.sum(), y.sum()
    sxx = (x * x).sum()
    syy = (y * y).sum()
    sxy = (x * y).sum()
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    if denx <= 0 or deny <= 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SDS_COLS})
    cov = n * sxy - sx * sy
    return pa.table({
        "n_parts": pa.array([int(n)], pa.int64()),
        "slope_qty_per_size_x1e6": pa.array(
            [_round_half_away(cov / denx * 1e6)], pa.int64()),
        "corr_ppm": pa.array(
            [_round_half_away(cov / np.sqrt(denx * deny)
                              * 1e6)], pa.int64()),
    })


SDS_SQL = """
WITH pq AS MATERIALIZED (
  SELECT l.l_partkey AS pk,
         CAST(SUM(CAST(ROUND(l.l_quantity, 0) AS BIGINT))
              AS BIGINT) AS q
  FROM lineitem l
  WHERE l.l_partkey IS NOT NULL AND l.l_quantity IS NOT NULL
  GROUP BY 1
), xy AS MATERIALIZED (
  SELECT CAST(p.p_size AS BIGINT) AS x, pq.q AS y
  FROM pq JOIN part p ON p.p_partkey = pq.pk
  WHERE p.p_size IS NOT NULL
), mm AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM xy
)
SELECT n AS n_parts,
       CAST(ROUND((n * CAST(sxy AS DOUBLE) -
                   CAST(sx AS DOUBLE) * sy)
            / (n * CAST(sxx AS DOUBLE) -
               CAST(sx AS DOUBLE) * sx) * 1000000, 0)
            AS BIGINT) AS slope_qty_per_size_x1e6,
       CAST(ROUND((n * CAST(sxy AS DOUBLE) -
                   CAST(sx AS DOUBLE) * sy)
            / SQRT((n * CAST(sxx AS DOUBLE) -
                    CAST(sx AS DOUBLE) * sx)
                   * (n * CAST(syy AS DOUBLE) -
                      CAST(sy AS DOUBLE) * sy)) * 1000000, 0)
            AS BIGINT) AS corr_ppm
FROM mm
WHERE n >= 3
  AND n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx > 0
  AND n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy > 0
"""

_SDM_COLS = ["n_customers", "n_multi_day_customers",
             "multi_ppm", "max_orders_one_day",
             "n_multi_days"]


def q_same_day_multiorder_census(sf_dir):
    """Split shipments, failed carts, or whales?  Customers who
    placed 2+ orders on a single calendar day: how many ever did,
    the record orders-in-one-day, and how many (customer, day)
    pairs doubled up.  Per-(customer, day) counts fold
    exactly."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderdate"))
        us = b["o_orderdate"].cast(pa.timestamp("us")).cast(
            pa.int64())
        t = pa.table({
            "ck": b["o_custkey"].cast(pa.int64()),
            "day": pc.divide(us, _DAY_US),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["ck", "day"]).aggregate([("n", "sum")])
        return g.rename_columns(["ck", "day", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["ck", "day"]).aggregate([("n", "sum")])
        return g.rename_columns(["ck", "day", "n"])

    cd = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["ck"],
    ).to_pandas()
    if "ck" not in cd.columns or len(cd) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SDM_COLS})
    n_cust = int(cd["ck"].nunique())
    multi = cd[cd["n"] >= 2]
    n_multi_cust = int(multi["ck"].nunique())
    return pa.table({
        "n_customers": pa.array([n_cust], pa.int64()),
        "n_multi_day_customers": pa.array(
            [n_multi_cust], pa.int64()),
        "multi_ppm": pa.array(
            [_round_half_away(n_multi_cust / n_cust * 1e6)],
            pa.int64()),
        "max_orders_one_day": pa.array(
            [int(cd["n"].max())], pa.int64()),
        "n_multi_days": pa.array([len(multi)], pa.int64()),
    })


SDM_SQL = f"""
WITH cd AS MATERIALIZED (
  SELECT o_custkey AS ck,
         EPOCH_US(o_orderdate) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
  GROUP BY 1, 2
)
SELECT CAST(COUNT(DISTINCT ck) AS BIGINT) AS n_customers,
       CAST(COUNT(DISTINCT CASE WHEN n >= 2 THEN ck END)
            AS BIGINT) AS n_multi_day_customers,
       CAST(ROUND(CAST(COUNT(DISTINCT CASE WHEN n >= 2
                                       THEN ck END) AS DOUBLE)
            / COUNT(DISTINCT ck) * 1000000, 0) AS BIGINT)
         AS multi_ppm,
       CAST(MAX(n) AS BIGINT) AS max_orders_one_day,
       CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_multi_days
FROM cd HAVING COUNT(DISTINCT ck) > 0
"""


def register_r4il(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "honeymoon_intensity_ratio":
                q_honeymoon_intensity_ratio,
            "size_demand_slope": q_size_demand_slope,
            "same_day_multiorder_census":
                q_same_day_multiorder_census,
        }
    )
    oracles.update(
        {
            "honeymoon_intensity_ratio": HIR_SQL,
            "size_demand_slope": SDS_SQL,
            "same_day_multiorder_census": SDM_SQL,
        }
    )
