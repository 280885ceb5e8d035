"""Round-4 batch EM: Geary's C spatial autocorrelation on the
circular hour-of-day graph, Cochran's Q test over the user x type
incidence matrix, and the Wald-Wolfowitz runs test about the median.

Exactness discipline: Geary's C on the 24-cycle reduces algebraically
to 276 * sum(edge diff^2) / sum((24x - S)^2) — a ratio of two exact
int64s (the mean term is cleared by scaling x24); Cochran's Q is
(k-1)(k*sumC2 - sumC^2) / (k*sumR - sumR2), all four moments exact
integers from one distinct-pair aggregation; the runs test's R, n1,
n2 are pure integer counts (median by the exact rank rule, ties
dropped per the classic definition) with the z-score algebra
mirrored expression-for-expression."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4eh import (
    _DENSE_GRID_SQL,
    _dense_hourly_matrix,
)
from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# Geary's C on the circular hour-of-day neighbor graph
# ---------------------------------------------------------------------------


def q_geary_c_hour(sf_dir):
    """Per event type: Geary's contiguity ratio C over the 24
    hour-of-day totals with circular adjacent-hour weights — the
    local-difference companion to the registry's Moran's I (C < 1
    means neighboring hours carry similar load). On the 24-cycle
    (N=24, W=48) the statistic reduces EXACTLY to
    276 * sum_edges (x_i - x_{i+1})^2 / sum((24*x_i - S)^2): one
    double division of two exact int64s, snapped x1e6."""
    types, mat, hmin = _dense_hourly_matrix(sf_dir)
    cols = ["event_type", "num_edges_sq", "den_sq", "geary_c_x1e6"]
    out = {c: [] for c in cols}
    if mat is not None:
        n = mat.shape[1]
        for i, t in enumerate(types):
            y = mat[i]
            hods = (hmin + np.arange(n)) % 24
            x = np.bincount(hods, weights=y.astype(np.float64),
                            minlength=24).astype(np.int64)
            s = int(x.sum())
            nxt = np.roll(x, -1)
            num = int(np.sum((x - nxt) ** 2))
            den = int(np.sum((24 * x - s) ** 2))
            c_val = (
                None
                if den == 0
                else _round_half_away(
                    276.0 * float(num) / float(den) * 1e6
                )
            )
            out["event_type"].append(t)
            out["num_edges_sq"].append(num)
            out["den_sq"].append(den)
            out["geary_c_x1e6"].append(c_val)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


GEARY_SQL = """
WITH hh AS MATERIALIZED (
  SELECT event_type,
         CAST((FLOOR(EPOCH_US(ts) / 3600000000) % 24) AS BIGINT) AS hod,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), types AS MATERIALIZED (SELECT DISTINCT event_type FROM hh),
grid AS MATERIALIZED (
  SELECT t.event_type, g.hod, COALESCE(hh.c, 0) AS x
  FROM types t
  CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS hod) g
  LEFT JOIN hh ON hh.event_type = t.event_type AND hh.hod = g.hod
), tot AS MATERIALIZED (
  SELECT event_type, CAST(SUM(x) AS BIGINT) AS s FROM grid GROUP BY 1
), num AS MATERIALIZED (
  SELECT a.event_type,
         CAST(SUM((a.x - b.x) * (a.x - b.x)) AS BIGINT) AS num
  FROM grid a
  JOIN grid b ON b.event_type = a.event_type
             AND b.hod = (a.hod + 1) % 24
  GROUP BY 1
), den AS MATERIALIZED (
  SELECT g.event_type,
         CAST(SUM((24 * g.x - t.s) * (24 * g.x - t.s)) AS BIGINT)
           AS den
  FROM grid g JOIN tot t ON t.event_type = g.event_type
  GROUP BY 1
)
SELECT n.event_type, n.num AS num_edges_sq, d.den AS den_sq,
       CASE WHEN d.den > 0 THEN
         CAST(ROUND(276.0 * CAST(n.num AS DOUBLE)
              / CAST(d.den AS DOUBLE) * 1000000.0, 0) AS BIGINT)
       END AS geary_c_x1e6
FROM num n JOIN den d ON d.event_type = n.event_type
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Cochran's Q over the user x event-type incidence matrix
# ---------------------------------------------------------------------------


def q_cochran_q_types(sf_dir):
    """Cochran's Q test: do the k event types have equal reach across
    users? Blocks = users, binary X_{u,t} = user u emitted type t at
    least once. Q = (k-1)(k*sumC2 - sumC^2)/(k*sumR - sumR2) with
    column totals C_t (users per type) and row totals R_u (types per
    user) — all four moments EXACT int64 from one distinct-pair
    aggregation (combiner-first (user, type) dedup, one user-grain
    fold), only the closing Q ratio snapped x1e6."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("user_id", "event_type"))
        g = b.group_by(["user_id", "event_type"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["user_id", "event_type", "c"])

    pairs = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["user_id", "event_type"])
        .aggregate([("c", "sum")])
        .rename_columns(["user_id", "event_type", "c"]),
    ).to_pandas()
    cols = ["k_types", "n_users", "sum_r", "sum_r2", "sum_c2",
            "q_x1e6"]
    if not len(pairs) or "user_id" not in pairs.columns:
        return pa.table({c: pa.array([], pa.int64()) for c in cols})
    pairs = pairs[["user_id", "event_type"]].drop_duplicates()
    k = int(pairs["event_type"].nunique())
    r_u = pairs.groupby("user_id").size().to_numpy(dtype=np.int64)
    c_t = pairs.groupby("event_type").size().to_numpy(dtype=np.int64)
    n_users = len(r_u)
    sum_r = int(r_u.sum())
    sum_r2 = int(np.sum(r_u**2))
    sum_c = int(c_t.sum())
    sum_c2 = int(np.sum(c_t**2))
    den = k * sum_r - sum_r2
    q = (
        None
        if den <= 0
        else _round_half_away(
            float(k - 1)
            * (float(k) * float(sum_c2) - float(sum_c) * float(sum_c))
            / float(den)
            * 1e6
        )
    )
    return pa.table(
        {
            "k_types": pa.array([k], pa.int64()),
            "n_users": pa.array([n_users], pa.int64()),
            "sum_r": pa.array([sum_r], pa.int64()),
            "sum_r2": pa.array([sum_r2], pa.int64()),
            "sum_c2": pa.array([sum_c2], pa.int64()),
            "q_x1e6": pa.array([q], pa.int64()),
        }
    )


COCHRAN_SQL = """
WITH p AS MATERIALIZED (
  SELECT DISTINCT user_id, event_type FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
), k AS MATERIALIZED (
  SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k FROM p
), r AS MATERIALIZED (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS r FROM p GROUP BY 1
), c AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c FROM p GROUP BY 1
), mom AS (
  SELECT (SELECT k FROM k) AS k,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(r.r) AS BIGINT) AS sum_r,
         CAST(SUM(r.r * r.r) AS BIGINT) AS sum_r2,
         (SELECT CAST(SUM(c.c) AS BIGINT) FROM c) AS sum_c,
         (SELECT CAST(SUM(c.c * c.c) AS BIGINT) FROM c) AS sum_c2
  FROM r
)
SELECT k AS k_types, n_users, sum_r, sum_r2, sum_c2,
       CASE WHEN k * sum_r - sum_r2 > 0 THEN
         CAST(ROUND(CAST(k - 1 AS DOUBLE)
              * (CAST(k AS DOUBLE) * CAST(sum_c2 AS DOUBLE)
                 - CAST(sum_c AS DOUBLE) * CAST(sum_c AS DOUBLE))
              / CAST(k * sum_r - sum_r2 AS DOUBLE)
              * 1000000.0, 0) AS BIGINT)
       END AS q_x1e6
FROM mom
"""


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test about the median
# ---------------------------------------------------------------------------


def q_median_runs_test(sf_dir):
    """Per event type: the Wald-Wolfowitz runs test about the median
    of the dense hourly count series — too FEW runs of above/below
    spells means level clustering (regime persistence), too many
    means oscillation. Median by the exact PERCENTILE_DISC rank rule;
    hours equal to the median drop (the classic convention); R, n1,
    n2 are exact integer counts over the time-ordered remainder, and
    the z-score z = (R - mu)/sigma closes in mirrored doubles
    (mu = 1 + 2*n1*n2/n, sigma^2 = 2*n1*n2*(2*n1*n2 - n) /
    (n^2*(n-1))), snapped x1e6."""
    types, mat, _hmin = _dense_hourly_matrix(sf_dir)
    cols = ["event_type", "n_above", "n_below", "n_runs", "z_x1e6"]
    out = {c: [] for c in cols}
    if mat is not None:
        n_all = mat.shape[1]
        for i, t in enumerate(types):
            y = mat[i]
            ys = np.sort(y)
            med = int(ys[(n_all + 1) // 2 - 1])  # ceil(n/2)-th smallest
            keep = y != med
            sgn = (y[keep] > med).astype(np.int64)
            n1 = int(sgn.sum())
            n2 = int(len(sgn) - n1)
            if n1 == 0 or n2 == 0:
                continue
            runs = 1 + int(np.sum(sgn[1:] != sgn[:-1]))
            n = n1 + n2
            mu = 1.0 + 2.0 * float(n1) * float(n2) / float(n)
            var = (
                2.0 * float(n1) * float(n2)
                * (2.0 * float(n1) * float(n2) - float(n))
                / (float(n) * float(n) * (float(n) - 1.0))
            )
            z = None
            if var > 0.0:
                z = _round_half_away(
                    (float(runs) - mu) / np.sqrt(var) * 1e6
                )
            out["event_type"].append(t)
            out["n_above"].append(n1)
            out["n_below"].append(n2)
            out["n_runs"].append(runs)
            out["z_x1e6"].append(z)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


MEDIAN_RUNS_SQL = (
    _DENSE_GRID_SQL
    + """
, med AS MATERIALIZED (
  SELECT event_type,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN c END) AS med
  FROM (
    SELECT event_type, c,
           CAST(ROW_NUMBER() OVER
                (PARTITION BY event_type ORDER BY c) AS BIGINT) AS rn,
           CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
    FROM dense
  ) GROUP BY 1
), f AS MATERIALIZED (
  SELECT d.event_type, d.h,
         CASE WHEN d.c > m.med THEN 1 ELSE 0 END AS sgn
  FROM dense d JOIN med m ON m.event_type = d.event_type
  WHERE d.c <> m.med
), runs AS MATERIALIZED (
  SELECT event_type,
         CAST(SUM(sgn) AS BIGINT) AS n1,
         CAST(SUM(1 - sgn) AS BIGINT) AS n2,
         CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND sgn <> prev
                           THEN 1 ELSE 0 END) AS BIGINT) AS r
  FROM (
    SELECT event_type, sgn,
           LAG(sgn) OVER (PARTITION BY event_type ORDER BY h) AS prev
    FROM f
  ) GROUP BY 1
)
SELECT event_type, n1 AS n_above, n2 AS n_below, r AS n_runs,
       CASE WHEN 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                    - CAST(n1 + n2 AS DOUBLE))
                 / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
                    * (CAST(n1 + n2 AS DOUBLE) - 1.0)) > 0.0 THEN
         CAST(ROUND((CAST(r AS DOUBLE)
              - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 / CAST(n1 + n2 AS DOUBLE)))
              / SQRT(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                    - CAST(n1 + n2 AS DOUBLE))
                 / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
                    * (CAST(n1 + n2 AS DOUBLE) - 1.0)))
              * 1000000.0, 0) AS BIGINT)
       END AS z_x1e6
FROM runs WHERE n1 > 0 AND n2 > 0
ORDER BY 1
"""
)


def register_r4em(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "geary_c_hour": q_geary_c_hour,
            "cochran_q_types": q_cochran_q_types,
            "median_runs_test": q_median_runs_test,
        }
    )
    oracles.update(
        {
            "geary_c_hour": GEARY_SQL,
            "cochran_q_types": COCHRAN_SQL,
            "median_runs_test": MEDIAN_RUNS_SQL,
        }
    )
