"""Round-4 batch FY: lead-lag structure, segmented trend, and
HAC-robust uncertainty — the best lag in -3..+3 hours maximizing
the Pearson cross-correlation for every ordered event-type pair
(who leads whom, and by how much), the best single-knot two-segment
linear fit of the daily count series (the minimal changepoint model
that reports slopes, not just a break day), and the Newey-West
(Bartlett, 5-lag) autocorrelation-robust variance of the daily mean
versus its naive iid variance — how much serial correlation
inflates the error bar every naive +/-1.96*sd/sqrt(n) ignores.

Exactness discipline: all three fold integer counts from identical
dense grids through mirrored double closed forms; lag and knot
argmaxes tie-break deterministically (smallest lag / earliest
knot); the overlap windows of each lag are the same row sets by
construction on both sides."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _HOUR_US,
    _round_half_away,
    _type_cell_counts,
)
from mimirsbrunn_ray.pipelines.queries_r4fl import (
    _dense_hour_counts,
)

_MAX_LAG = 3
_NW_LAGS = 5


_LAG_COLS = ["src_type", "dst_type", "best_lag", "r_x1e6",
             "n_overlap"]


def q_best_lag_type_pairs(sf_dir):
    """Lead-lag census: for every ordered event-type pair (A, B),
    the lag l in -3..+3 hours maximizing the Pearson correlation of
    A's hourly counts with B's counts l hours LATER (ties to the
    smallest lag) — positive best lag means A leads B.  Counts are
    one distributed pass; the 7-lag sweep per pair is vectorized
    driver math on the tiny dense grid."""
    g = _dense_hour_counts(sf_dir)
    if g is None:
        return pa.table({
            "src_type": pa.array([], pa.string()),
            "dst_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _LAG_COLS[2:]},
        })
    series = {}
    for et, sub in g.groupby("event_type", sort=True):
        series[et] = sub.sort_values("hour")["c"].to_numpy(
            np.float64)
    types = sorted(series)
    out = {c: [] for c in _LAG_COLS}
    for a in types:
        for b in types:
            if a == b:
                continue
            x_full = series[a]
            y_full = series[b]
            T = len(x_full)
            best = None
            for lag in range(-_MAX_LAG, _MAX_LAG + 1):
                if lag >= 0:
                    x = x_full[:T - lag] if lag else x_full
                    y = y_full[lag:]
                else:
                    x = x_full[-lag:]
                    y = y_full[:T + lag]
                n = len(x)
                if n < 3:
                    continue
                sx, sy = x.sum(), y.sum()
                sxx = (x * x).sum()
                syy = (y * y).sum()
                sxy = (x * y).sum()
                den = (n * sxx - sx * sx) * (n * syy - sy * sy)
                if den <= 0:
                    continue
                r = (n * sxy - sx * sy) / np.sqrt(den)
                if best is None or r > best[0]:
                    best = (r, lag, n)
            if best is None:
                continue
            out["src_type"].append(a)
            out["dst_type"].append(b)
            out["best_lag"].append(best[1])
            out["r_x1e6"].append(_round_half_away(best[0] * 1e6))
            out["n_overlap"].append(best[2])
    return pa.table({
        "src_type": pa.array(out["src_type"], pa.string()),
        "dst_type": pa.array(out["dst_type"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _LAG_COLS[2:]},
    })


BEST_LAG_SQL = f"""
WITH hc AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) // {_HOUR_US} AS hour,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT MIN(hour) AS hmin, MAX(hour) AS hmax FROM hc
), grid AS MATERIALIZED (
  SELECT t.event_type, s.hmin + r.k AS hour,
         CAST(COALESCE(hc.c, 0) AS DOUBLE) AS c
  FROM (SELECT DISTINCT event_type FROM hc) t
  CROSS JOIN span s
  JOIN range(0, 100000) r(k) ON s.hmin + r.k <= s.hmax
  LEFT JOIN hc ON hc.event_type = t.event_type
              AND hc.hour = s.hmin + r.k
), lag_corr AS MATERIALIZED (
  SELECT a.event_type AS src_type, b.event_type AS dst_type,
         CAST(l.k AS BIGINT) AS lag,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(a.c) AS sx, SUM(b.c) AS sy,
         SUM(a.c * a.c) AS sxx, SUM(b.c * b.c) AS syy,
         SUM(a.c * b.c) AS sxy
  FROM range(-{_MAX_LAG}, {_MAX_LAG + 1}) l(k)
  CROSS JOIN grid a
  JOIN grid b ON b.event_type <> a.event_type
             AND b.hour = a.hour + l.k
  GROUP BY 1, 2, 3
), rr AS MATERIALIZED (
  SELECT src_type, dst_type, lag, n,
         (n * sxy - sx * sy)
           / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r
  FROM lag_corr
  WHERE n >= 3
    AND (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
)
SELECT src_type, dst_type,
       lag AS best_lag,
       CAST(ROUND(r * 1000000, 0) AS BIGINT) AS r_x1e6,
       n AS n_overlap
FROM rr
QUALIFY ROW_NUMBER() OVER (PARTITION BY src_type, dst_type
                           ORDER BY r DESC, lag) = 1
ORDER BY src_type, dst_type
"""

_PW_COLS = ["knot_day", "n_days", "sse_x1e3", "slope1_x1e6",
            "slope2_x1e6"]


def q_piecewise_linear_knot_daily(sf_dir):
    """Best single-knot two-segment linear fit of the daily total
    count series (dense day grid): evaluate every knot k (each
    segment needs >= 2 days), pick the minimum total SSE (ties to
    the earliest knot), and report both segment slopes — the
    smallest model that says not just WHEN the trend broke but from
    WHAT slope to WHAT slope.  Counts fold in one distributed pass;
    the O(D) knot sweep uses the same centered-sum closed forms on
    both sides."""
    cc = _type_cell_counts(sf_dir, "day", _DAY_US, None)
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PW_COLS})
    dt = cc.groupby("day")["c"].sum()
    dmin, dmax = int(dt.index.min()), int(dt.index.max())
    days = np.arange(dmin, dmax + 1, dtype=np.int64)
    y = np.zeros(len(days), dtype=np.float64)
    y[dt.index.to_numpy(np.int64) - dmin] = dt.to_numpy(
        np.float64)
    D = len(days)
    if D < 4:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PW_COLS})
    x = np.arange(D, dtype=np.float64)

    def seg(xs, ys):
        n = len(xs)
        sx, sy = xs.sum(), ys.sum()
        sxx = (xs * xs).sum()
        sxy = (xs * ys).sum()
        syy = (ys * ys).sum()
        dxx = sxx - sx * sx / n
        dxy = sxy - sx * sy / n
        dyy = syy - sy * sy / n
        if dxx == 0:
            return dyy, 0.0
        return dyy - dxy * dxy / dxx, dxy / dxx

    best = None
    for k in range(2, D - 1):
        sse1, sl1 = seg(x[:k], y[:k])
        sse2, sl2 = seg(x[k:], y[k:])
        sse = sse1 + sse2
        if best is None or sse < best[0]:
            best = (sse, k, sl1, sl2)
    return pa.table({
        "knot_day": pa.array([dmin + best[1]], pa.int64()),
        "n_days": pa.array([D], pa.int64()),
        "sse_x1e3": pa.array(
            [_round_half_away(best[0] * 1e3)], pa.int64()),
        "slope1_x1e6": pa.array(
            [_round_half_away(best[2] * 1e6)], pa.int64()),
        "slope2_x1e6": pa.array(
            [_round_half_away(best[3] * 1e6)], pa.int64()),
    })


PIECEWISE_SQL = f"""
WITH dc AS MATERIALIZED (
  SELECT EPOCH_US(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1
), span AS MATERIALIZED (
  SELECT MIN(day) AS dmin, MAX(day) AS dmax,
         MAX(day) - MIN(day) + 1 AS d FROM dc
), grid AS MATERIALIZED (
  SELECT CAST(r.k AS DOUBLE) AS x,
         CAST(COALESCE(dc.c, 0) AS DOUBLE) AS y
  FROM span s
  JOIN range(0, 100000) r(k) ON r.k < s.d
  LEFT JOIN dc ON dc.day = s.dmin + r.k
), knots AS MATERIALIZED (
  SELECT CAST(r.k AS BIGINT) AS k FROM span s
  JOIN range(2, 100000) r(k) ON r.k <= s.d - 2
), segsum AS MATERIALIZED (
  SELECT kn.k,
         CAST(COUNT(*) FILTER (WHERE g.x < kn.k) AS BIGINT)
           AS n1,
         SUM(g.x) FILTER (WHERE g.x < kn.k) AS sx1,
         SUM(g.y) FILTER (WHERE g.x < kn.k) AS sy1,
         SUM(g.x * g.x) FILTER (WHERE g.x < kn.k) AS sxx1,
         SUM(g.x * g.y) FILTER (WHERE g.x < kn.k) AS sxy1,
         SUM(g.y * g.y) FILTER (WHERE g.x < kn.k) AS syy1,
         CAST(COUNT(*) FILTER (WHERE g.x >= kn.k) AS BIGINT)
           AS n2,
         SUM(g.x) FILTER (WHERE g.x >= kn.k) AS sx2,
         SUM(g.y) FILTER (WHERE g.x >= kn.k) AS sy2,
         SUM(g.x * g.x) FILTER (WHERE g.x >= kn.k) AS sxx2,
         SUM(g.x * g.y) FILTER (WHERE g.x >= kn.k) AS sxy2,
         SUM(g.y * g.y) FILTER (WHERE g.x >= kn.k) AS syy2
  FROM knots kn CROSS JOIN grid g
  GROUP BY 1
), fits AS MATERIALIZED (
  SELECT k,
         (syy1 - sy1 * sy1 / n1)
           - CASE WHEN sxx1 - sx1 * sx1 / n1 = 0 THEN 0
                  ELSE (sxy1 - sx1 * sy1 / n1)
                       * (sxy1 - sx1 * sy1 / n1)
                       / (sxx1 - sx1 * sx1 / n1) END
         + (syy2 - sy2 * sy2 / n2)
           - CASE WHEN sxx2 - sx2 * sx2 / n2 = 0 THEN 0
                  ELSE (sxy2 - sx2 * sy2 / n2)
                       * (sxy2 - sx2 * sy2 / n2)
                       / (sxx2 - sx2 * sx2 / n2) END AS sse,
         CASE WHEN sxx1 - sx1 * sx1 / n1 = 0 THEN 0
              ELSE (sxy1 - sx1 * sy1 / n1)
                   / (sxx1 - sx1 * sx1 / n1) END AS sl1,
         CASE WHEN sxx2 - sx2 * sx2 / n2 = 0 THEN 0
              ELSE (sxy2 - sx2 * sy2 / n2)
                   / (sxx2 - sx2 * sx2 / n2) END AS sl2
  FROM segsum WHERE n1 >= 2 AND n2 >= 2
)
SELECT CAST(span.dmin + f.k AS BIGINT) AS knot_day,
       CAST(span.d AS BIGINT) AS n_days,
       CAST(ROUND(f.sse * 1000, 0) AS BIGINT) AS sse_x1e3,
       CAST(ROUND(f.sl1 * 1000000, 0) AS BIGINT) AS slope1_x1e6,
       CAST(ROUND(f.sl2 * 1000000, 0) AS BIGINT) AS slope2_x1e6
FROM fits f CROSS JOIN span
WHERE span.d >= 4
QUALIFY ROW_NUMBER() OVER (ORDER BY f.sse, f.k) = 1
"""

_NW_COLS = ["n_days", "var_naive_x1e3", "var_nw_x1e3",
            "inflation_ppm"]


def q_newey_west_daily_var(sf_dir):
    """Newey-West (Bartlett kernel, 5 lags) autocorrelation-robust
    variance of the daily-mean event count versus the naive iid
    gamma_0 / D: Var_NW = (gamma_0 + 2 * sum_{l=1..5} (1 - l/6)
    gamma_l) / D — the inflation ratio says how badly serial
    correlation breaks every +/- 1.96 * sd/sqrt(n) error bar on
    daily KPIs.  Counts fold in one distributed pass; the
    autocovariance sums mirror on the identical dense grid."""
    cc = _type_cell_counts(sf_dir, "day", _DAY_US, None)
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _NW_COLS})
    dt = cc.groupby("day")["c"].sum()
    dmin, dmax = int(dt.index.min()), int(dt.index.max())
    D = dmax - dmin + 1
    y = np.zeros(D, dtype=np.float64)
    y[dt.index.to_numpy(np.int64) - dmin] = dt.to_numpy(
        np.float64)
    if D < _NW_LAGS + 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _NW_COLS})
    mu = y.mean()
    d = y - mu
    g0 = float((d * d).sum()) / D
    if g0 == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _NW_COLS})
    acc = g0
    for lag in range(1, _NW_LAGS + 1):
        gl = float((d[:-lag] * d[lag:]).sum()) / D
        acc += 2.0 * (1.0 - lag / (_NW_LAGS + 1.0)) * gl
    var_naive = g0 / D
    var_nw = acc / D
    return pa.table({
        "n_days": pa.array([D], pa.int64()),
        "var_naive_x1e3": pa.array(
            [_round_half_away(var_naive * 1e3)], pa.int64()),
        "var_nw_x1e3": pa.array(
            [_round_half_away(var_nw * 1e3)], pa.int64()),
        "inflation_ppm": pa.array(
            [_round_half_away(var_nw / var_naive * 1e6)],
            pa.int64()),
    })


NEWEY_WEST_SQL = f"""
WITH dc AS MATERIALIZED (
  SELECT EPOCH_US(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1
), span AS MATERIALIZED (
  SELECT MIN(day) AS dmin,
         MAX(day) - MIN(day) + 1 AS d FROM dc
), grid AS MATERIALIZED (
  SELECT CAST(r.k AS BIGINT) AS i,
         CAST(COALESCE(dc.c, 0) AS DOUBLE) AS y
  FROM span s
  JOIN range(0, 100000) r(k) ON r.k < s.d
  LEFT JOIN dc ON dc.day = s.dmin + r.k
), mu AS MATERIALIZED (
  SELECT AVG(y) AS m, CAST(COUNT(*) AS BIGINT) AS d FROM grid
), g0 AS MATERIALIZED (
  SELECT SUM((g.y - mu.m) * (g.y - mu.m)) / mu.d AS v
  FROM grid g CROSS JOIN mu GROUP BY mu.d
), gl AS MATERIALIZED (
  SELECT l.k AS lag,
         SUM((a.y - mu.m) * (b.y - mu.m)) / mu.d AS v
  FROM range(1, {_NW_LAGS + 1}) l(k)
  CROSS JOIN mu
  JOIN grid a ON TRUE
  JOIN grid b ON b.i = a.i + l.k
  GROUP BY 1, mu.d
), nw AS (
  SELECT g0.v
         + 2.0 * SUM((1.0 - CAST(gl.lag AS DOUBLE)
                      / {_NW_LAGS + 1}.0) * gl.v) AS acc
  FROM gl CROSS JOIN g0 GROUP BY g0.v
)
SELECT mu.d AS n_days,
       CAST(ROUND(g0.v / mu.d * 1000, 0) AS BIGINT)
         AS var_naive_x1e3,
       CAST(ROUND(nw.acc / mu.d * 1000, 0) AS BIGINT)
         AS var_nw_x1e3,
       CAST(ROUND((nw.acc / mu.d) / (g0.v / mu.d) * 1000000, 0)
            AS BIGINT) AS inflation_ppm
FROM mu CROSS JOIN g0 CROSS JOIN nw
WHERE mu.d >= {_NW_LAGS + 2} AND g0.v <> 0
"""


def register_r4fy(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "best_lag_type_pairs": q_best_lag_type_pairs,
            "piecewise_linear_knot_daily":
                q_piecewise_linear_knot_daily,
            "newey_west_daily_var": q_newey_west_daily_var,
        }
    )
    oracles.update(
        {
            "best_lag_type_pairs": BEST_LAG_SQL,
            "piecewise_linear_knot_daily": PIECEWISE_SQL,
            "newey_west_daily_var": NEWEY_WEST_SQL,
        }
    )
