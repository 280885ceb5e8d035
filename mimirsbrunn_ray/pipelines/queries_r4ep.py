"""Round-4 batch EP: fractal / self-similarity diagnostics of the
hourly count series — Higuchi fractal dimension, the variance-time
Hurst estimator, and the seasonal-naive tracking signal.

Exactness discipline: Higuchi's per-offset curve lengths are exact
integer |diff| sums normalized by one mirrored rational and snapped
x1e6 BEFORE the per-k integer fold; the log-log OLS closes are made
order-free by snapping ln-values x1e9 to integers and folding the
regression moments in 128-bit integer arithmetic; the variance-time
estimator's per-scale block-variance numerators are exact integers
(B*sum z^2 - (sum z)^2); the tracking signal is a pure integer ratio
sum(e) * T / sum|e|."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mimirsbrunn_ray.pipelines.queries_r4eh import (
    _DENSE_GRID_SQL,
    _dense_hourly_matrix,
)

_DAY_US = 86_400_000_000
_HIG_KMAX = 8
_VT_SCALES = [1, 2, 4, 8, 16]


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _intlog_ols_slope(xs9: list[int], ys9: list[int]):
    """OLS slope over points whose coordinates are x1e9-snapped ints:
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) with 128-bit-safe integer
    moments (the 1e18 scale cancels in the ratio)."""
    n = len(xs9)
    sx = sum(xs9)
    sy = sum(ys9)
    sxx = sum(x * x for x in xs9)
    sxy = sum(x * y for x, y in zip(xs9, ys9))
    den = n * sxx - sx * sx
    if den == 0:
        return None
    return float(n * sxy - sx * sy) / float(den)


# ---------------------------------------------------------------------------
# Higuchi fractal dimension
# ---------------------------------------------------------------------------


def q_higuchi_fd_hourly(sf_dir):
    """Per event type: the Higuchi fractal dimension of the dense
    hourly count series (k_max = 8) — FD near 1 means a smooth
    trend-dominated curve, near 2 a space-filling noisy one. Curve
    lengths per (k, offset m) are exact integer |lag-k diff| sums,
    normalized by the mirrored rational (n-1)/(n_k * k^2) and snapped
    x1e6 before the per-k integer fold; FD = -slope of ln L(k) on
    ln k, with both log coordinates snapped x1e9 so the closing OLS
    runs in exact integer moments."""
    types, mat, _hmin = _dense_hourly_matrix(sf_dir)
    cols = ["event_type", "t_len", "fd_x1e6"]
    out = {c: [] for c in cols}
    if mat is not None:
        n = mat.shape[1]
        for i, t in enumerate(types):
            y = mat[i]
            if n < _HIG_KMAX * 3:
                continue
            xs9, ys9 = [], []
            ok = True
            for k in range(1, _HIG_KMAX + 1):
                # lag-k |diffs| partition by offset m = pos mod k
                d = np.abs(y[k:] - y[:-k]).astype(np.int64)
                pos = np.arange(k, n)
                lsum_snap_total = 0
                for m in range(k):
                    sel = (pos % k) == ((m + k) % k)
                    lsum = int(d[sel].sum())
                    ndk = int(sel.sum())
                    if ndk == 0:
                        continue
                    lm = (
                        float(lsum)
                        * float(n - 1)
                        / (float(ndk) * float(k) * float(k))
                        * 1e6
                    )
                    lsum_snap_total += _round_half_away(lm)
                if lsum_snap_total <= 0:
                    ok = False
                    break
                lk = float(lsum_snap_total) / float(k)
                xs9.append(_round_half_away(np.log(float(k)) * 1e9))
                ys9.append(_round_half_away(np.log(lk) * 1e9))
            if not ok:
                continue  # mirrors the SQL HAVING count = kmax drop
            fd = None
            slope = _intlog_ols_slope(xs9, ys9)
            if slope is not None:
                fd = _round_half_away(-slope * 1e6)
            out["event_type"].append(t)
            out["t_len"].append(n)
            out["fd_x1e6"].append(fd)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


HIGUCHI_SQL = (
    _DENSE_GRID_SQL
    + f"""
, meta AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         MIN(h) AS hmin
  FROM dense GROUP BY 1
), ks AS (SELECT unnest(generate_series(1, {_HIG_KMAX})) AS k),
diffs AS MATERIALIZED (
  SELECT a.event_type, ks.k,
         ((a.h - m.hmin) % ks.k) AS moff,
         ABS(a.c - b.c) AS d
  FROM dense a
  JOIN ks ON TRUE
  JOIN meta m ON m.event_type = a.event_type
  JOIN dense b ON b.event_type = a.event_type AND b.h = a.h - ks.k
  WHERE a.h - m.hmin >= ks.k
), lm AS MATERIALIZED (
  SELECT d.event_type, d.k, d.moff,
         CAST(ROUND(CAST(SUM(d.d) AS DOUBLE)
              * CAST(MAX(m.n) - 1 AS DOUBLE)
              / (CAST(COUNT(*) AS DOUBLE) * CAST(d.k AS DOUBLE)
                 * CAST(d.k AS DOUBLE)) * 1000000.0, 0) AS BIGINT)
           AS lm_snap
  FROM diffs d JOIN meta m ON m.event_type = d.event_type
  WHERE m.n >= {_HIG_KMAX} * 3
  GROUP BY 1, 2, 3
), lk AS MATERIALIZED (
  SELECT event_type, k, CAST(SUM(lm_snap) AS BIGINT) AS lsum
  FROM lm GROUP BY 1, 2
), pts AS MATERIALIZED (
  SELECT event_type,
         CAST(ROUND(LN(CAST(k AS DOUBLE)) * 1000000000.0, 0)
              AS BIGINT) AS x9,
         CAST(ROUND(LN(CAST(lsum AS DOUBLE) / CAST(k AS DOUBLE))
              * 1000000000.0, 0) AS BIGINT) AS y9
  FROM lk WHERE lsum > 0
), mom AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS np,
         CAST(SUM(x9) AS BIGINT) AS sx,
         CAST(SUM(y9) AS BIGINT) AS sy,
         SUM(CAST(x9 AS HUGEINT) * x9) AS sxx,
         SUM(CAST(x9 AS HUGEINT) * y9) AS sxy
  FROM pts GROUP BY 1
  HAVING COUNT(*) = {_HIG_KMAX}
)
SELECT m.event_type, mt.n AS t_len,
       CASE WHEN m.np * m.sxx - CAST(m.sx AS HUGEINT) * m.sx <> 0 THEN
         CAST(ROUND(-(CAST(m.np * m.sxy
                      - CAST(m.sx AS HUGEINT) * m.sy AS DOUBLE)
              / CAST(m.np * m.sxx
                      - CAST(m.sx AS HUGEINT) * m.sx AS DOUBLE))
              * 1000000.0, 0) AS BIGINT)
       END AS fd_x1e6
FROM mom m JOIN meta mt ON mt.event_type = m.event_type
ORDER BY 1
"""
)


# ---------------------------------------------------------------------------
# Variance-time Hurst estimator
# ---------------------------------------------------------------------------


def q_variance_time_hurst(sf_dir):
    """Per event type: the variance-time (aggregated-variance) Hurst
    estimator — block-mean variance Var(m) over aggregation scales
    m in {1,2,4,8,16} hours scales as m^(2H-2); H > 0.5 flags
    long-range dependence in the load series. Per scale, the variance
    numerator B*sum(z^2) - (sum z)^2 is an EXACT integer over block
    sums z; ln Var coordinates snap x1e9 so the closing slope runs in
    128-bit integer OLS moments. H = 1 + slope/2, snapped x1e6."""
    types, mat, _hmin = _dense_hourly_matrix(sf_dir)
    cols = ["event_type", "t_len", "hurst_x1e6"]
    out = {c: [] for c in cols}
    if mat is not None:
        n = mat.shape[1]
        for i, t in enumerate(types):
            y = mat[i]
            if n < _VT_SCALES[-1] * 2:
                continue
            xs9, ys9 = [], []
            ok = True
            for m in _VT_SCALES:
                b_cnt = n // m
                z = y[: b_cnt * m].reshape(b_cnt, m).sum(axis=1)
                z = z.astype(np.int64)
                sz = int(z.sum())
                szz = int(np.sum(z * z))
                num = b_cnt * szz - sz * sz
                if num <= 0 or b_cnt < 2:
                    ok = False
                    break
                # Var of block MEANS = num / (B^2 * m^2)
                lnvar = np.log(
                    float(num)
                    / (float(b_cnt) * float(b_cnt) * float(m)
                       * float(m))
                )
                xs9.append(_round_half_away(np.log(float(m)) * 1e9))
                ys9.append(_round_half_away(lnvar * 1e9))
            if not ok:
                continue  # mirrors the SQL HAVING count = #scales drop
            h = None
            slope = _intlog_ols_slope(xs9, ys9)
            if slope is not None:
                h = _round_half_away((1.0 + slope / 2.0) * 1e6)
            out["event_type"].append(t)
            out["t_len"].append(n)
            out["hurst_x1e6"].append(h)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


_VT_SCALES_SQL = ", ".join(str(m) for m in _VT_SCALES)

VARIANCE_TIME_SQL = (
    _DENSE_GRID_SQL
    + f"""
, meta AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, MIN(h) AS hmin
  FROM dense GROUP BY 1
), scales AS (SELECT unnest([{_VT_SCALES_SQL}]) AS m),
blocks AS MATERIALIZED (
  SELECT d.event_type, s.m,
         (d.h - mt.hmin) // s.m AS blk,
         CAST(SUM(d.c) AS BIGINT) AS z
  FROM dense d
  JOIN meta mt ON mt.event_type = d.event_type
  JOIN scales s ON TRUE
  WHERE (d.h - mt.hmin) < (mt.n // s.m) * s.m
    AND mt.n >= {_VT_SCALES[-1]} * 2
  GROUP BY 1, 2, 3
), pervar AS MATERIALIZED (
  SELECT event_type, m,
         CAST(COUNT(*) AS BIGINT) AS b,
         CAST(COUNT(*) * SUM(z * z) - SUM(z) * SUM(z) AS BIGINT)
           AS num
  FROM blocks GROUP BY 1, 2
), pts AS MATERIALIZED (
  SELECT event_type,
         CAST(ROUND(LN(CAST(m AS DOUBLE)) * 1000000000.0, 0)
              AS BIGINT) AS x9,
         CAST(ROUND(LN(CAST(num AS DOUBLE)
              / (CAST(b AS DOUBLE) * CAST(b AS DOUBLE)
                 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)))
              * 1000000000.0, 0) AS BIGINT) AS y9
  FROM pervar WHERE num > 0 AND b >= 2
), mom AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS np,
         CAST(SUM(x9) AS BIGINT) AS sx,
         CAST(SUM(y9) AS BIGINT) AS sy,
         SUM(CAST(x9 AS HUGEINT) * x9) AS sxx,
         SUM(CAST(x9 AS HUGEINT) * y9) AS sxy
  FROM pts GROUP BY 1
  HAVING COUNT(*) = {len(_VT_SCALES)}
)
SELECT m.event_type, mt.n AS t_len,
       CASE WHEN m.np * m.sxx - CAST(m.sx AS HUGEINT) * m.sx <> 0 THEN
         CAST(ROUND((1.0 + (CAST(m.np * m.sxy
                      - CAST(m.sx AS HUGEINT) * m.sy AS DOUBLE)
              / CAST(m.np * m.sxx
                      - CAST(m.sx AS HUGEINT) * m.sx AS DOUBLE))
              / 2.0) * 1000000.0, 0) AS BIGINT)
       END AS hurst_x1e6
FROM mom m JOIN meta mt ON mt.event_type = m.event_type
ORDER BY 1
"""
)


# ---------------------------------------------------------------------------
# Seasonal-naive tracking signal
# ---------------------------------------------------------------------------


def q_tracking_signal_daily(sf_dir):
    """Per event type: the forecast tracking signal of the
    seasonal-naive day-ahead forecast (f_t = y_{t-7} over daily
    counts) — TS = cumulative error / MAD = sum(e) * T / sum|e|, the
    SPC-style drift monitor (|TS| > 4 flags persistent bias). A pure
    integer ratio: errors are exact count differences over the
    bounded daily grid; only the closing ratio snaps x1e6."""
    types, mat, _hmin = _dense_hourly_matrix(sf_dir)
    cols = ["event_type", "n_terms", "sum_e", "sum_abs_e", "ts_x1e6"]
    out = {c: [] for c in cols}
    if mat is not None:
        n = mat.shape[1]
        n_days = n // 24
        for i, t in enumerate(types):
            if n_days < 9:
                continue
            daily = (
                mat[i][: n_days * 24].reshape(n_days, 24).sum(axis=1)
            ).astype(np.int64)
            e = daily[7:] - daily[:-7]
            sum_e = int(e.sum())
            sum_abs = int(np.abs(e).sum())
            t_cnt = len(e)
            ts = (
                None
                if sum_abs == 0
                else _round_half_away(
                    float(sum_e) * float(t_cnt) / float(sum_abs) * 1e6
                )
            )
            out["event_type"].append(t)
            out["n_terms"].append(t_cnt)
            out["sum_e"].append(sum_e)
            out["sum_abs_e"].append(sum_abs)
            out["ts_x1e6"].append(ts)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


TRACKING_SQL = (
    _DENSE_GRID_SQL
    + """
, meta AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, MIN(h) AS hmin
  FROM dense GROUP BY 1
), daily AS MATERIALIZED (
  SELECT d.event_type, (d.h - m.hmin) // 24 AS day,
         CAST(SUM(d.c) AS BIGINT) AS y,
         MAX(m.n) // 24 AS n_days
  FROM dense d JOIN meta m ON m.event_type = d.event_type
  WHERE (d.h - m.hmin) < (m.n // 24) * 24
  GROUP BY 1, 2
), err AS MATERIALIZED (
  SELECT a.event_type, a.y - b.y AS e, a.n_days
  FROM daily a
  JOIN daily b ON b.event_type = a.event_type AND b.day = a.day - 7
), agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_terms,
         CAST(SUM(e) AS BIGINT) AS sum_e,
         CAST(SUM(ABS(e)) AS BIGINT) AS sum_abs_e,
         MAX(n_days) AS n_days
  FROM err GROUP BY 1
)
SELECT event_type, n_terms, sum_e, sum_abs_e,
       CASE WHEN sum_abs_e > 0 THEN
         CAST(ROUND(CAST(sum_e AS DOUBLE) * CAST(n_terms AS DOUBLE)
              / CAST(sum_abs_e AS DOUBLE) * 1000000.0, 0) AS BIGINT)
       END AS ts_x1e6
FROM agg WHERE n_days >= 9
ORDER BY 1
"""
)


def register_r4ep(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "higuchi_fd_hourly": q_higuchi_fd_hourly,
            "variance_time_hurst": q_variance_time_hurst,
            "tracking_signal_daily": q_tracking_signal_daily,
        }
    )
    oracles.update(
        {
            "higuchi_fd_hourly": HIGUCHI_SQL,
            "variance_time_hurst": VARIANCE_TIME_SQL,
            "tracking_signal_daily": TRACKING_SQL,
        }
    )
