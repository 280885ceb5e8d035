"""Round-4 batch BM: value-change momentum, pairwise type dominance,
and perennial parts.

Exactness discipline: momentum is the exact integer sum of products of
consecutive change SIGNS; dominance counts integer comparisons over
the zero-filled hourly grid; perennial parts use exact distinct-month
counting per (part, year).
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
# momentum vs mean-reversion: consecutive value-change sign products
# ---------------------------------------------------------------------------


def q_value_change_momentum(sf_dir):
    """Per event type: the exact integer sum of sign(d_i)*sign(d_{i+1})
    over consecutive value changes inside each user's stream (positive
    -> momentum, negative -> mean reversion; the nonparametric lag-1
    autocorrelation of directions). Signs are integers, so the sum is
    exact; one user hash-bucket shuffle with vectorized diffs."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET
    from mimirsbrunn_ray.stages.timeseries import (
        _project_series,
        _series_segments,
    )

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    )
    proj = _project_series(ev, "user_id", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_pairs": pd.Series([], dtype=np.int64),
                "sum_signprod": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "user_id", "ts", "event_id")
        x = _round_half_away(
            g["value"].to_numpy(dtype=np.float64) * 100.0
        )
        d = np.zeros(len(g), dtype=np.int64)
        d[1:] = np.sign(x[1:] - x[:-1])
        # a momentum pair needs rows i-1, i, i+1 in ONE user series
        valid = same.copy()
        valid[1:] &= same[:-1]
        idx = np.nonzero(valid)[0]
        idx = idx[idx >= 1]
        prod = d[idx] * d[idx - 1]
        return pd.DataFrame(
            {
                "n_pairs": pd.Series([len(idx)], dtype=np.int64),
                "sum_signprod": pd.Series(
                    [int(prod.sum())], dtype=np.int64
                ),
            }
        )

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
                for c in b.column_names
            }
        )

    return tree_merge(partials, combine)


MOMENTUM_SQL = """
WITH d0 AS (
  SELECT user_id, ts, event_id,
         SIGN(CAST(ROUND(value * 100, 0) AS BIGINT)
              - CAST(ROUND(LAG(value) OVER w * 100, 0) AS BIGINT))
           AS d
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT d,
         LAG(d) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS d_prev
  FROM d0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(d * d_prev) AS BIGINT) AS sum_signprod
FROM s WHERE d IS NOT NULL AND d_prev IS NOT NULL
"""


# ---------------------------------------------------------------------------
# pairwise type dominance over the hourly grid
# ---------------------------------------------------------------------------


def q_type_dominance_matrix(sf_dir):
    """For every ordered type pair: in how many hours of the
    zero-filled shared grid does A strictly out-count B — the pairwise
    dominance matrix (near n_hours/2 everywhere = interchangeable
    signals; lopsided = a stable hierarchy). One bounded (type, hour)
    pass; integer comparisons over the grid."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"]))
        )
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        hr = np.floor_divide(ts_us, _HOUR_US)
        t = pa.table({"event_type": b["event_type"], "hr": pa.array(hr)})
        g = t.group_by(["event_type", "hr"]).aggregate([([], "count_all")])
        g = g.select(["event_type", "hr", "count_all"])
        return g.rename_columns(["event_type", "hr", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "hr"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "hr", "n"])

    grid = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()

    rows = {"type_a": [], "type_b": [], "n_hours": [],
            "n_a_dominates": []}
    if len(grid):
        hours = np.sort(grid["hr"].unique()).astype(np.int64)
        types = sorted(grid["event_type"].unique())
        series = {}
        for et in types:
            g = grid[grid["event_type"] == et]
            c = np.zeros(len(hours), dtype=np.int64)
            idx = np.searchsorted(hours, g["hr"].to_numpy(dtype=np.int64))
            c[idx] = g["n"].to_numpy(dtype=np.int64)
            series[et] = c
        for ta in types:
            for tb in types:
                if ta == tb:
                    continue
                rows["type_a"].append(ta)
                rows["type_b"].append(tb)
                rows["n_hours"].append(len(hours))
                rows["n_a_dominates"].append(
                    int((series[ta] > series[tb]).sum())
                )
    return pa.table(
        {
            "type_a": pa.array(rows["type_a"], pa.string()),
            "type_b": pa.array(rows["type_b"], pa.string()),
            "n_hours": pa.array(rows["n_hours"], pa.int64()),
            "n_a_dominates": pa.array(rows["n_a_dominates"], pa.int64()),
        }
    )


DOMINANCE_SQL = """
WITH grid AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hr,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), hours AS (SELECT DISTINCT hr FROM grid),
types AS (SELECT DISTINCT event_type FROM grid),
dense AS (
  SELECT t.event_type, h.hr, CAST(COALESCE(g.n, 0) AS BIGINT) AS n
  FROM types t CROSS JOIN hours h
  LEFT JOIN grid g ON g.event_type = t.event_type AND g.hr = h.hr
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(CASE WHEN a.n > b.n THEN 1 ELSE 0 END) AS BIGINT)
         AS n_a_dominates
FROM dense a JOIN dense b
  ON a.hr = b.hr AND a.event_type <> b.event_type
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# perennial parts: active in all 12 months of a calendar year
# ---------------------------------------------------------------------------


def q_parts_full_year_coverage(sf_dir):
    """Per calendar year: how many parts shipped in at least SIX
    distinct months of that year — the steadily-moving assortment
    count (the synthetic corpus tops out below year-round coverage, so
    the bar sits at half-year; the test is exact distinct-month
    counting either way). Distinct (part, year, month) triples from
    key-disjoint part shards; a part's months stay local, so the
    coverage test resolves in-shard."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_shipdate"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.is_valid(b["l_partkey"]), pc.is_valid(b["l_shipdate"])
            )
        )
        dt = b["l_shipdate"].cast(pa.timestamp("us"))
        yr = pc.year(dt).to_numpy(zero_copy_only=False).astype(np.int64)
        mo = pc.month(dt).to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "l_partkey": b["l_partkey"],
                "yr": pa.array(yr),
                "mo": pa.array(mo),
            }
        )
        g = t.group_by(["l_partkey", "yr", "mo"]).aggregate(
            [([], "count_all")]
        )
        g = g.select(["l_partkey", "yr", "mo"])
        return add_bucket(g, "l_partkey", 64)

    proj = li.map_batches(project, batch_format="pyarrow",
                          batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "yr": pd.Series([], dtype=np.int64),
                "n_perennial": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.drop_duplicates(["l_partkey", "yr", "mo"])
        m = g.groupby(["l_partkey", "yr"]).size().reset_index()
        m.columns = ["l_partkey", "yr", "n_months"]
        full = m[m["n_months"] >= 6]
        agg = full.groupby("yr").size().reset_index()
        agg.columns = ["yr", "n_perennial"]
        agg["yr"] = agg["yr"].astype(np.int64)
        agg["n_perennial"] = agg["n_perennial"].astype(np.int64)
        return agg

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["yr"]).aggregate([("n_perennial", "sum")])
        return g.rename_columns(["yr", "n_perennial"])

    return tree_merge(partials, combine)


PERENNIAL_SQL = """
WITH pm AS (
  SELECT DISTINCT l_partkey,
         CAST(year(l_shipdate) AS BIGINT) AS yr,
         CAST(month(l_shipdate) AS BIGINT) AS mo
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_shipdate IS NOT NULL
), py AS (
  SELECT l_partkey, yr, CAST(COUNT(*) AS BIGINT) AS n_months
  FROM pm GROUP BY 1, 2
)
SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_perennial
FROM py WHERE n_months >= 6
GROUP BY 1
"""


def register_r4bm(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "value_change_momentum": q_value_change_momentum,
            "type_dominance_matrix": q_type_dominance_matrix,
            "parts_full_year_coverage": q_parts_full_year_coverage,
        }
    )
    oracles.update(
        {
            "value_change_momentum": MOMENTUM_SQL,
            "type_dominance_matrix": DOMINANCE_SQL,
            "parts_full_year_coverage": PERENNIAL_SQL,
        }
    )
