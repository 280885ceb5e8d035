"""Round-4 batch BO: new-buyer share, split-half reliability, and
last-digit uniformity.

Exactness discipline: first-time-buyer attribution uses exact per-
customer minimum months inside customer-disjoint shards; split-half
correlation ships exact integer co-moment sums with one identical
double ratio; last-digit counts are pure modular arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# new vs returning buyer share per month
# ---------------------------------------------------------------------------


def q_new_buyer_share_monthly(sf_dir):
    """Per calendar month: distinct buyers and how many are FIRST-TIME
    (their earliest order month equals this month) — the
    acquisition-vs-retention mix. Distinct (customer, month) pairs and
    the per-customer cohort month resolve inside customer-disjoint
    shards; bounded monthly counts merge."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.is_valid(b["o_custkey"]), pc.is_valid(b["o_orderdate"])
            )
        )
        dt = b["o_orderdate"].cast(pa.timestamp("us"))
        yr = pc.year(dt).to_numpy(zero_copy_only=False).astype(np.int64)
        mo = pc.month(dt).to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "o_custkey": b["o_custkey"],
                "m": pa.array(yr * 12 + mo - 1),
            }
        )
        g = t.group_by(["o_custkey", "m"]).aggregate([([], "count_all")])
        g = g.select(["o_custkey", "m"])
        return add_bucket(g, "o_custkey", 64)

    proj = orders.map_batches(project, batch_format="pyarrow",
                              batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "month_idx": pd.Series([], dtype=np.int64),
                "n_buyers": pd.Series([], dtype=np.int64),
                "n_new": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.drop_duplicates(["o_custkey", "m"])
        first = g.groupby("o_custkey")["m"].transform("min")
        df = pd.DataFrame(
            {
                "m": g["m"].to_numpy(dtype=np.int64),
                "new": (g["m"].to_numpy() == first.to_numpy()).astype(
                    np.int64
                ),
            }
        )
        agg = df.groupby("m").agg(
            n_buyers=("new", "size"), n_new=("new", "sum")
        ).reset_index()
        agg.columns = ["month_idx", "n_buyers", "n_new"]
        for c in agg.columns:
            agg[c] = agg[c].astype(np.int64)
        return agg

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["month_idx"]).aggregate(
            [("n_buyers", "sum"), ("n_new", "sum")]
        )
        return g.rename_columns(["month_idx", "n_buyers", "n_new"])

    return tree_merge(partials, combine)


NEW_BUYER_SQL = """
WITH cm AS (
  SELECT DISTINCT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
              AS BIGINT) AS m
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
), f AS (
  SELECT o_custkey, MIN(m) AS first_m FROM cm GROUP BY 1
)
SELECT cm.m AS month_idx,
       CAST(COUNT(*) AS BIGINT) AS n_buyers,
       CAST(SUM(CASE WHEN cm.m = f.first_m THEN 1 ELSE 0 END)
            AS BIGINT) AS n_new
FROM cm JOIN f USING (o_custkey)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# split-half reliability of the hourly event series
# ---------------------------------------------------------------------------


def q_split_half_reliability(sf_dir):
    """Split-half reliability of the hourly load series: events split
    by event_id parity, the Pearson correlation between the two halves'
    zero-filled hourly counts — near 1 means the series reflects real
    traffic structure, near 0 means noise. Exact integer co-moment sums
    over the bounded grid; one identical double ratio x1e6."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["event_id"]), pc.is_valid(b["ts"]))
        )
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        hr = np.floor_divide(ts_us, _HOUR_US)
        par = (
            b["event_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            % 2
        )
        t = pa.table({"hr": pa.array(hr), "p": pa.array(par)})
        g = t.group_by(["hr", "p"]).aggregate([([], "count_all")])
        g = g.select(["hr", "p", "count_all"])
        return g.rename_columns(["hr", "p", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["hr", "p"]).aggregate([("n", "sum")])
        return g.rename_columns(["hr", "p", "n"])

    grid = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()

    if not len(grid):
        return pa.table(
            {
                "n_hours": pa.array([0], pa.int64()),
                "corr_x1e6": pa.array([None], pa.int64()),
            }
        )
    hours = np.sort(grid["hr"].unique()).astype(np.int64)
    series = {}
    for p in (0, 1):
        g = grid[grid["p"] == p]
        c = np.zeros(len(hours), dtype=np.int64)
        idx = np.searchsorted(hours, g["hr"].to_numpy(dtype=np.int64))
        c[idx] = g["n"].to_numpy(dtype=np.int64)
        series[p] = c
    a, b_ = series[0], series[1]
    n = len(hours)
    sx = int(a.sum())
    sy = int(b_.sum())
    sxx = int(np.dot(a, a))
    syy = int(np.dot(b_, b_))
    sxy = int(np.dot(a, b_))
    num = n * sxy - sx * sy
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    if d1 > 0 and d2 > 0:
        r = float(num) / (
            np.sqrt(np.float64(d1)) * np.sqrt(np.float64(d2))
        )
        rx = int(_round_half_away(np.array([r * 1e6]))[0])
    else:
        rx = None
    return pa.table(
        {
            "n_hours": pa.array([n], pa.int64()),
            "corr_x1e6": pa.array([rx], pa.int64()),
        }
    )


SPLIT_HALF_SQL = """
WITH grid AS MATERIALIZED (
  SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hr,
         event_id % 2 AS p, CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE event_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), hours AS (SELECT DISTINCT hr FROM grid),
dense AS (
  SELECT h.hr, pp.p, CAST(COALESCE(g.n, 0) AS BIGINT) AS n
  FROM hours h
  CROSS JOIN (SELECT unnest([0, 1]) AS p) pp
  LEFT JOIN grid g ON g.hr = h.hr AND g.p = pp.p
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN p = 0 THEN n ELSE 0 END) AS BIGINT) AS sx,
         CAST(SUM(CASE WHEN p = 1 THEN n ELSE 0 END) AS BIGINT) AS sy,
         CAST(SUM(CASE WHEN p = 0 THEN n * n ELSE 0 END) AS BIGINT)
           AS sxx,
         CAST(SUM(CASE WHEN p = 1 THEN n * n ELSE 0 END) AS BIGINT)
           AS syy
  FROM dense
), xy AS (
  SELECT CAST(SUM(a.n * b.n) AS BIGINT) AS sxy
  FROM dense a JOIN dense b ON a.hr = b.hr AND a.p = 0 AND b.p = 1
), hn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nh FROM hours)
SELECT hn.nh AS n_hours,
       CASE WHEN hn.nh * s.sxx - s.sx * s.sx > 0
             AND hn.nh * s.syy - s.sy * s.sy > 0
            THEN CAST(ROUND(
              CAST(hn.nh * xy.sxy - s.sx * s.sy AS DOUBLE)
              / (SQRT(CAST(hn.nh * s.sxx - s.sx * s.sx AS DOUBLE))
                 * SQRT(CAST(hn.nh * s.syy - s.sy * s.sy AS DOUBLE)))
              * 1000000, 0) AS BIGINT)
            ELSE NULL END AS corr_x1e6
FROM s, xy, hn
"""


# ---------------------------------------------------------------------------
# last-digit uniformity of cents values
# ---------------------------------------------------------------------------


def q_last_digit_uniformity(sf_dir):
    """Counts of the LAST cents digit (0-9) of event values — the
    uniformity audit that complements benford_first_digit (organic
    continuous values have uniform last digits; spikes betray
    truncation or fabrication). Pure modular arithmetic, one pass."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["value"]))
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        t = pa.table({"digit": pa.array(np.abs(x) % 10)})
        g = t.group_by(["digit"]).aggregate([([], "count_all")])
        g = g.select(["digit", "count_all"])
        return g.rename_columns(["digit", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["digit"]).aggregate([("n", "sum")])
        return g.rename_columns(["digit", "n"])

    return tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


LAST_DIGIT_SQL = """
SELECT CAST(ABS(CAST(ROUND(value * 100, 0) AS BIGINT)) % 10 AS BIGINT)
         AS digit,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events WHERE value IS NOT NULL
GROUP BY 1
"""


def register_r4bo(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "new_buyer_share_monthly": q_new_buyer_share_monthly,
            "split_half_reliability": q_split_half_reliability,
            "last_digit_uniformity": q_last_digit_uniformity,
        }
    )
    oracles.update(
        {
            "new_buyer_share_monthly": NEW_BUYER_SQL,
            "split_half_reliability": SPLIT_HALF_SQL,
            "last_digit_uniformity": LAST_DIGIT_SQL,
        }
    )
