"""Round-4 batch AT: volatility screening against the population
median, a deterministic A/B split balance audit, and rank correlation
between hourly volume series.

Exactness discipline: variance comparisons are exact rational
cross-multiplications of integer moment pairs (no division); the A/B
split is user_id parity (reproducible in any engine); Spearman rank
sums are exact integers feeding one closed-form double ratio.
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
# volatile types: hourly-count variance above the population median
# ---------------------------------------------------------------------------


def q_volatile_types(sf_dir):
    """Event types whose hourly-count variance exceeds the MEDIAN
    type's — the 'aggregate of aggregates with a population-relative
    HAVING' shape (screening against a data-derived, not fixed,
    threshold). Variance per type is the exact integer moment pair
    (var_num = n*sumsq - sum^2, var_den = n^2) over its hourly counts;
    types compare by cross-multiplication (a_num*b_den vs b_num*a_den),
    the median is the lower-middle under that exact order, and the
    output keeps every type with variance STRICTLY above it. One
    decomposable (type, hour) count pass, bounded driver finish."""
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
    ).to_pandas()  # bounded: types x hours

    rows = {"event_type": [], "n_hours": [], "var_num": [],
            "var_den": []}
    stats = []
    if len(grid):
        for et, g in grid.groupby("event_type", sort=True):
            c = g["n"].to_numpy(dtype=np.int64)
            n = len(c)
            s = int(c.sum())
            ss = int(np.dot(c, c))
            stats.append((et, n, n * ss - s * s, n * n))
        # exact rational order by cross-multiplication
        import functools

        def cmp(a, b):
            lhs = a[2] * b[3]
            rhs = b[2] * a[3]
            return -1 if lhs < rhs else (1 if lhs > rhs else 0)

        ordered = sorted(stats, key=functools.cmp_to_key(cmp))
        med = ordered[(len(ordered) - 1) // 2]  # lower middle
        for et, n, num, den in stats:
            if num * med[3] > med[2] * den:  # strictly above the median
                rows["event_type"].append(et)
                rows["n_hours"].append(n)
                rows["var_num"].append(num)
                rows["var_den"].append(den)
    out = pd.DataFrame(rows).sort_values(
        "event_type", ignore_index=True
    ) if rows["event_type"] else pd.DataFrame(rows)
    return pa.table(
        {
            "event_type": pa.array(
                list(out.get("event_type", [])), pa.string()
            ),
            "n_hours": pa.array(
                np.asarray(out.get("n_hours", []), dtype=np.int64)
            ),
            "var_num": pa.array(
                np.asarray(out.get("var_num", []), dtype=np.int64)
            ),
            "var_den": pa.array(
                np.asarray(out.get("var_den", []), dtype=np.int64)
            ),
        }
    )


VOLATILE_SQL = """
WITH grid AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hr,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), m AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(COUNT(*) * SUM(n * n) - SUM(n) * SUM(n) AS BIGINT)
           AS var_num,
         CAST(COUNT(*) * COUNT(*) AS BIGINT) AS var_den
  FROM grid GROUP BY 1
), ranked AS (
  -- exact rational order: var_num/var_den via the double is unsafe, so
  -- rank by the pairwise cross-product count
  SELECT a.*,
         (SELECT COUNT(*) FROM m b
          WHERE b.var_num * a.var_den < a.var_num * b.var_den
             OR (b.var_num * a.var_den = a.var_num * b.var_den
                 AND b.event_type < a.event_type)) AS n_below,
         (SELECT COUNT(*) FROM m) AS n_all
  FROM m a
), med AS (
  SELECT var_num AS mnum, var_den AS mden
  FROM ranked WHERE n_below = (n_all - 1) // 2
)
SELECT r.event_type, r.n_hours, r.var_num, r.var_den
FROM ranked r, med
WHERE r.var_num * med.mden > med.mnum * r.var_den
"""


# ---------------------------------------------------------------------------
# deterministic A/B split balance audit
# ---------------------------------------------------------------------------


def q_ab_split_balance(sf_dir):
    """Balance audit of the deterministic user_id-parity A/B split: per
    arm, distinct users, events, purchases, and the exact cents value
    sum — the pre-experiment sanity check that the assignment didn't
    skew covariates. Combiner-first partials over one pass, per-user
    distinct from a user hash-bucket shuffle."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["event_type"]))
        )
        return add_bucket(b, "user_id", 64)

    proj = ev.map_batches(project, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "arm": pd.Series([], dtype=np.int64),
                "n_users": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64),
                "n_purchases": pd.Series([], dtype=np.int64),
                "value_x100": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        uid = g["user_id"].to_numpy(dtype=np.int64)
        arm = uid % 2
        x = _round_half_away(
            np.nan_to_num(
                g["value"].to_numpy(dtype=np.float64), nan=0.0
            )
            * 100.0
        )
        isp = (g["event_type"].to_numpy() == "purchase").astype(np.int64)
        df = pd.DataFrame(
            {"arm": arm, "uid": uid, "x": x, "p": isp}
        )
        agg = df.groupby("arm").agg(
            n_users=("uid", "nunique"),
            n_events=("uid", "size"),
            n_purchases=("p", "sum"),
            value_x100=("x", "sum"),
        ).reset_index()
        for c in agg.columns:
            agg[c] = agg[c].astype(np.int64)
        return agg

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["arm"]).aggregate(
            [("n_users", "sum"), ("n_events", "sum"),
             ("n_purchases", "sum"), ("value_x100", "sum")]
        )
        return g.rename_columns(
            ["arm", "n_users", "n_events", "n_purchases", "value_x100"]
        )

    return tree_merge(partials, combine)


AB_SPLIT_SQL = """
WITH e AS (
  SELECT user_id, user_id % 2 AS arm, event_type,
         CAST(ROUND(COALESCE(value, 0) * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
)
SELECT CAST(arm AS BIGINT) AS arm,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchases,
       CAST(SUM(x) AS BIGINT) AS value_x100
FROM e GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Spearman rank correlation between types' hourly volume series
# ---------------------------------------------------------------------------


def q_type_volume_rank_corr(sf_dir):
    """For every event-type pair: the Spearman rank correlation between
    their hourly volume series over the shared hour grid (absent hours
    count as 0) — 'which signals co-trend', robust to level differences.
    One decomposable (type, hour) pass; ranks come from 2x-scaled
    average tied ranks over the bounded grid, and the closed-form
    integer sums feed one identical double ratio per pair."""
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
    ).to_pandas()  # bounded: types x hours

    rows = {"type_a": [], "type_b": [], "n_hours": [],
            "spearman_x1e6": []}
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

        def ranks2(v):
            # 2x average tied ranks over the full grid
            order = np.argsort(v, kind="mergesort")
            sv = v[order]
            uniq, start = np.unique(sv, return_index=True)
            counts = np.diff(np.concatenate((start, [len(sv)])))
            cum_before = np.concatenate(([0], np.cumsum(counts)[:-1]))
            avg2_by_val = dict(
                zip(uniq, 2 * cum_before + counts + 1)
            )
            return np.array([avg2_by_val[x] for x in v], dtype=np.int64)

        r = {et: ranks2(series[et]) for et in types}
        n = len(hours)
        for i, ta in enumerate(types):
            for tb in types[i + 1:]:
                ra, rb = r[ta], r[tb]
                sx = int(ra.sum())
                sy = int(rb.sum())
                sxx = int(np.dot(ra, ra))
                syy = int(np.dot(rb, rb))
                sxy = int(np.dot(ra, rb))
                num = n * sxy - sx * sy
                d1 = n * sxx - sx * sx
                d2 = n * syy - sy * sy
                rows["type_a"].append(ta)
                rows["type_b"].append(tb)
                rows["n_hours"].append(n)
                if d1 > 0 and d2 > 0:
                    rho = float(num) / (
                        np.sqrt(np.float64(d1)) * np.sqrt(np.float64(d2))
                    )
                    rows["spearman_x1e6"].append(
                        int(_round_half_away(np.array([rho * 1e6]))[0])
                    )
                else:
                    rows["spearman_x1e6"].append(None)
    return pa.table(
        {
            "type_a": pa.array(rows["type_a"], pa.string()),
            "type_b": pa.array(rows["type_b"], pa.string()),
            "n_hours": pa.array(rows["n_hours"], pa.int64()),
            "spearman_x1e6": pa.array(rows["spearman_x1e6"], pa.int64()),
        }
    )


TYPE_RANK_CORR_SQL = """
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
), r AS (
  SELECT event_type, hr,
         2 * RANK() OVER (PARTITION BY event_type ORDER BY n)
           + COUNT(*) OVER (PARTITION BY event_type, n) - 1 AS rk
  FROM dense
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(a.rk) AS BIGINT) AS sx,
         CAST(SUM(b.rk) AS BIGINT) AS sy,
         CAST(SUM(a.rk * a.rk) AS BIGINT) AS sxx,
         CAST(SUM(b.rk * b.rk) AS BIGINT) AS syy,
         CAST(SUM(a.rk * b.rk) AS BIGINT) AS sxy
  FROM r a JOIN r b ON a.hr = b.hr AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_hours,
       CASE WHEN n_hours * sxx - sx * sx > 0
             AND n_hours * syy - sy * sy > 0
            THEN CAST(ROUND(
              CAST(n_hours * sxy - sx * sy AS DOUBLE)
              / (SQRT(CAST(n_hours * sxx - sx * sx AS DOUBLE))
                 * SQRT(CAST(n_hours * syy - sy * sy AS DOUBLE)))
              * 1000000, 0) AS BIGINT)
            ELSE NULL END AS spearman_x1e6
FROM pairs
"""


def register_r4at(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "volatile_types": q_volatile_types,
            "ab_split_balance": q_ab_split_balance,
            "type_volume_rank_corr": q_type_volume_rank_corr,
        }
    )
    oracles.update(
        {
            "volatile_types": VOLATILE_SQL,
            "ab_split_balance": AB_SPLIT_SQL,
            "type_volume_rank_corr": TYPE_RANK_CORR_SQL,
        }
    )
