"""Round-4 batch HZ: robust trend, robust location, and robust
cadence — the Theil–Sen estimator over monthly order counts (the
median of all pairwise slopes: a trend line one crazy month
cannot bend), the Tukey trimean and midhinge of order value by
priority (quartile-anchored location statistics immune to the
whale tail), and the median-of-medians customer order gap (per
customer the median days between consecutive orders, then the
median across customers — the cadence of the TYPICAL customer,
not the cadence of the typical ORDER).

Exactness discipline: monthly counts and per-customer gap days
are exact integers; pairwise slopes, quartiles and medians use
the interpolated (linear) definition on BOTH sides
(np.percentile linear ↔ QUANTILE_CONT) with identical operand
order, snapped at coarse grain."""

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


_TSM_COLS = ["n_months", "n_pairs", "theil_sen_x1e3",
             "ols_slope_x1e3"]


def q_theil_sen_monthly_orders(sf_dir):
    """The trend one crazy month cannot bend: the Theil–Sen
    median of all pairwise slopes over monthly order counts,
    shown against the OLS slope — a wide gap between the two
    flags influential outlier months.  Monthly counts fold
    exactly; the pairwise-slope median mirrors as an interpolated
    quantile over the identical slope set."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_orderdate"]))
        if b.num_rows == 0:
            return pa.table({
                "mon": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(np.int64)
        t = pa.table({
            "mon": pa.array(mon),
            "n": pa.array(np.ones(len(mon), np.int64)),
        })
        g = t.group_by(["mon"]).aggregate([("n", "sum")])
        return g.rename_columns(["mon", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["mon"]).aggregate([("n", "sum")])
        return g.rename_columns(["mon", "n"])

    mc = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
    ).to_pandas()
    if "mon" not in mc.columns or len(mc) < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _TSM_COLS})
    mc = mc.sort_values("mon")
    x = mc["mon"].to_numpy(np.int64).astype(np.float64)
    y = mc["n"].to_numpy(np.int64).astype(np.float64)
    n = len(x)
    dx = x[None, :] - x[:, None]
    dy = y[None, :] - y[:, None]
    iu = np.triu_indices(n, k=1)
    slopes = dy[iu] / dx[iu]
    ts = float(np.percentile(slopes, 50))
    sx, sy = x.sum(), y.sum()
    sxx = (x * x).sum()
    sxy = (x * y).sum()
    den = n * sxx - sx * sx
    ols = (n * sxy - sx * sy) / den
    return pa.table({
        "n_months": pa.array([n], pa.int64()),
        "n_pairs": pa.array([len(slopes)], pa.int64()),
        "theil_sen_x1e3": pa.array(
            [_round_half_away(ts * 1e3)], pa.int64()),
        "ols_slope_x1e3": pa.array(
            [_round_half_away(ols * 1e3)], pa.int64()),
    })


TSM_SQL = """
WITH mc AS MATERIALIZED (
  SELECT YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS mon,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders
  WHERE o_orderdate IS NOT NULL
  GROUP BY 1
), pr AS MATERIALIZED (
  SELECT (CAST(b.n AS DOUBLE) - a.n)
           / (CAST(b.mon AS DOUBLE) - a.mon) AS slope
  FROM mc a JOIN mc b ON b.mon > a.mon
), st AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(mon AS DOUBLE)) AS sx,
         SUM(CAST(n AS DOUBLE)) AS sy,
         SUM(CAST(mon AS DOUBLE) * mon) AS sxx,
         SUM(CAST(mon AS DOUBLE) * n) AS sxy
  FROM mc
)
SELECT st.n AS n_months,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM pr) AS n_pairs,
       CAST(ROUND((SELECT QUANTILE_CONT(slope, 0.5) FROM pr)
            * 1000, 0) AS BIGINT) AS theil_sen_x1e3,
       CAST(ROUND((st.n * st.sxy - st.sx * st.sy)
            / (st.n * st.sxx - st.sx * st.sx) * 1000, 0)
            AS BIGINT) AS ols_slope_x1e3
FROM st
WHERE st.n >= 2 AND st.n * st.sxx - st.sx * st.sx <> 0
"""

_TVP_COLS = ["o_orderpriority", "n_orders", "trimean_cents",
             "midhinge_cents", "median_cents"]


def q_trimean_value_by_priority(sf_dir):
    """Quartile-anchored order value by priority: Tukey's trimean
    (Q1 + 2·Q2 + Q3)/4 and the midhinge (Q1 + Q3)/2 of
    total-price cents — location statistics the whale tail cannot
    drag, compared against the plain median.  Whole priority
    groups resolve in hash buckets with interpolated quartiles
    mirrored on both sides."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_orderpriority", "o_totalprice"))
        tp = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(
            tp >= 0, np.floor(tp * 100.0 + 0.5),
            np.ceil(tp * 100.0 - 0.5)).astype(np.int64)
        t = pa.table({
            "pr": b["o_orderpriority"].cast(pa.string()),
            "cents": pa.array(cents),
        })
        return add_bucket(t, "pr", 16)

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "o_orderpriority": pd.Series([], dtype=object),
            "n_orders": pd.Series([], dtype=np.int64),
            "trimean_cents": pd.Series([], dtype=np.int64),
            "midhinge_cents": pd.Series([], dtype=np.int64),
            "median_cents": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        rows = []
        for pr, sub in g.groupby("pr"):
            v = sub["cents"].to_numpy(np.int64).astype(
                np.float64)
            q1 = float(np.percentile(v, 25))
            q2 = float(np.percentile(v, 50))
            q3 = float(np.percentile(v, 75))
            rows.append({
                "o_orderpriority": pr,
                "n_orders": np.int64(len(v)),
                "trimean_cents": np.int64(_round_half_away(
                    (q1 + 2.0 * q2 + q3) / 4.0)),
                "midhinge_cents": np.int64(_round_half_away(
                    (q1 + q3) / 2.0)),
                "median_cents": np.int64(_round_half_away(q2)),
            })
        return pd.DataFrame(rows)

    out = (
        orders.map_batches(project, batch_format="pyarrow",
                           batch_size=None)
        .groupby(_BUCKET)
        .map_groups(stats, batch_format="pandas")
        .to_pandas()
    )
    if "o_orderpriority" not in out.columns or len(out) == 0:
        return pa.table({
            "o_orderpriority": pa.array([], pa.string()),
            "n_orders": pa.array([], pa.int64()),
            "trimean_cents": pa.array([], pa.int64()),
            "midhinge_cents": pa.array([], pa.int64()),
            "median_cents": pa.array([], pa.int64()),
        })
    out = out.sort_values("o_orderpriority")
    return pa.table({
        "o_orderpriority": pa.array(
            out["o_orderpriority"], pa.string()),
        "n_orders": pa.array(out["n_orders"], pa.int64()),
        "trimean_cents": pa.array(
            out["trimean_cents"], pa.int64()),
        "midhinge_cents": pa.array(
            out["midhinge_cents"], pa.int64()),
        "median_cents": pa.array(
            out["median_cents"], pa.int64()),
    })


TVP_SQL = """
WITH oc AS MATERIALIZED (
  SELECT o_orderpriority,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderpriority IS NOT NULL
    AND o_totalprice IS NOT NULL
), q AS MATERIALIZED (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         QUANTILE_CONT(cents, 0.25) AS q1,
         QUANTILE_CONT(cents, 0.50) AS q2,
         QUANTILE_CONT(cents, 0.75) AS q3
  FROM oc GROUP BY 1
)
SELECT o_orderpriority, n_orders,
       CAST(ROUND((q1 + 2 * q2 + q3) / 4.0, 0) AS BIGINT)
         AS trimean_cents,
       CAST(ROUND((q1 + q3) / 2.0, 0) AS BIGINT)
         AS midhinge_cents,
       CAST(ROUND(q2, 0) AS BIGINT) AS median_cents
FROM q
ORDER BY o_orderpriority
"""

_CGM_COLS = ["n_customers", "mom_gap_days_x1e3",
             "p90_customer_median_x1e3"]


def q_customer_gap_median_of_medians(sf_dir):
    """The cadence of the TYPICAL customer: per customer with 3+
    orders, the median days between consecutive orders; then the
    median (and p90) of those per-customer medians — immune to
    the few hyperactive accounts that dominate any per-order gap
    statistic.  Customers resolve whole in hash buckets; gap days
    are exact integers, medians interpolated on both sides."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderdate"))
        us = b["o_orderdate"].cast(pa.timestamp("us")).cast(
            pa.int64())
        t = pa.table({
            "cust": b["o_custkey"].cast(pa.int64()),
            "day": pc.divide(us, _DAY_US),
        })
        return add_bucket(t, "cust", 64)

    def med(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "m": pd.Series([], dtype=np.float64),
        })
        if len(g) == 0:
            return empty
        rows = []
        for cust, sub in g.groupby("cust"):
            d = np.sort(sub["day"].to_numpy(np.int64))
            if len(d) < 3:
                continue
            gaps = np.diff(d).astype(np.float64)
            rows.append(float(np.percentile(gaps, 50)))
        return pd.DataFrame(
            {"m": np.array(rows, dtype=np.float64)})

    mm = (
        orders.map_batches(project, batch_format="pyarrow",
                           batch_size=None)
        .groupby(_BUCKET)
        .map_groups(med, batch_format="pandas")
        .to_pandas()
    )
    if "m" not in mm.columns or len(mm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _CGM_COLS})
    v = mm["m"].to_numpy(np.float64)
    return pa.table({
        "n_customers": pa.array([len(v)], pa.int64()),
        "mom_gap_days_x1e3": pa.array(
            [_round_half_away(float(np.percentile(v, 50))
                              * 1e3)], pa.int64()),
        "p90_customer_median_x1e3": pa.array(
            [_round_half_away(float(np.percentile(v, 90))
                              * 1e3)], pa.int64()),
    })


CGM_SQL = f"""
WITH od AS MATERIALIZED (
  SELECT o_custkey AS cust,
         EPOCH_US(o_orderdate) // {_DAY_US} AS day
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
), gp AS MATERIALIZED (
  SELECT cust,
         day - LAG(day) OVER (PARTITION BY cust ORDER BY day)
           AS gap,
         COUNT(*) OVER (PARTITION BY cust) AS n
  FROM od
), pm AS MATERIALIZED (
  SELECT cust, QUANTILE_CONT(CAST(gap AS DOUBLE), 0.5) AS m
  FROM gp
  WHERE gap IS NOT NULL AND n >= 3
  GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(ROUND(QUANTILE_CONT(m, 0.5) * 1000, 0) AS BIGINT)
         AS mom_gap_days_x1e3,
       CAST(ROUND(QUANTILE_CONT(m, 0.9) * 1000, 0) AS BIGINT)
         AS p90_customer_median_x1e3
FROM pm HAVING COUNT(*) > 0
"""


def register_r4hz(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "theil_sen_monthly_orders": q_theil_sen_monthly_orders,
            "trimean_value_by_priority":
                q_trimean_value_by_priority,
            "customer_gap_median_of_medians":
                q_customer_gap_median_of_medians,
        }
    )
    oracles.update(
        {
            "theil_sen_monthly_orders": TSM_SQL,
            "trimean_value_by_priority": TVP_SQL,
            "customer_gap_median_of_medians": CGM_SQL,
        }
    )
