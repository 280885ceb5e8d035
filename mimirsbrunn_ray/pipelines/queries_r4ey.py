"""Round-4 batch EY: burst/forecast/skew planning over the daily and
hourly count series — the Kadane max-burst window (largest contiguous
above-baseline count mass, solved with prefix sums + running minima,
no recursion), the Theta-method one-step forecast (the M3-winning
combination of a theta=2 SES line and the linear trend, run as an
exact integer recursion on the OLS-denominator grid), and a
salt-factor planner (given per-type event shares and a target
partition-load ceiling, the integer salt factor each hot key needs —
the planning face of stages/salt.py's salted aggregate).

Exactness discipline: Kadane runs on the n-scaled centered grid
(n*c_t - S, pure int64); the Theta SES state is an integer recursion
on the (2*D)-scaled grid SHIFTED nonnegative first (S(y+K) =
S(y)+K exactly under the alpha=1/2 floor recursion, and DuckDB's
`//` truncates toward zero while Python floors — identical only on
nonnegative operands, hence the shift); the salt factor is an
integer ceiling division. Only final report ratios snap."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mimirsbrunn_ray.pipelines.queries_r4dw import (
    _DAY_US,
    _HOUR_US,
    _bucket_counts,
)


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def q_max_burst_window_per_type(sf_dir):
    """Per event type: the maximum-sum contiguous window of CENTERED
    hourly counts (n*c_t - S grid: positive = above the type's mean
    rate) — Kadane's max subarray via prefix sums and the running
    minimum of earlier prefixes, so a plain window-function oracle
    mirrors it. Emits the best burst mass (scaled by n) and its ppm
    share of total scaled mass |grid|."""
    hourly = _bucket_counts(sf_dir, _HOUR_US)
    cols = ["event_type", "n_hours", "best_burst_scaled",
            "burst_share_ppm"]
    out = {c: [] for c in cols}
    if len(hourly) and "event_type" in hourly.columns:
        for et, g in hourly.sort_values(["event_type", "h"]).groupby(
            "event_type", sort=True
        ):
            c = g["c"].to_numpy(dtype=np.int64)
            n = len(c)
            s = int(c.sum())
            centered = n * c - s
            pref = np.concatenate(
                ([0], np.cumsum(centered))
            )  # P_0..P_n
            run_min = np.minimum.accumulate(pref[:-1])  # min P_{<i}
            best = int(np.max(pref[1:] - run_min))
            denom = int(np.sum(np.abs(centered)))
            share = (
                None if denom == 0
                else _round_half_away(float(best) / denom * 1e6)
            )
            out["event_type"].append(et)
            out["n_hours"].append(n)
            out["best_burst_scaled"].append(best)
            out["burst_share_ppm"].append(share)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


BURST_SQL = """
WITH hourly AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), stats AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s
  FROM hourly GROUP BY 1
), pref AS MATERIALIZED (
  SELECT h.event_type, st.n, h.h,
         SUM(st.n * h.c - st.s)
           OVER (PARTITION BY h.event_type ORDER BY h.h
                 ROWS UNBOUNDED PRECEDING) AS p,
         ABS(st.n * h.c - st.s) AS amag
  FROM hourly h JOIN stats st ON st.event_type = h.event_type
), kad AS MATERIALIZED (
  SELECT event_type, n, amag,
         p - COALESCE(MIN(p) OVER (PARTITION BY event_type
                      ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0) AS gain
  FROM pref
), agg AS (
  SELECT event_type,
         CAST(MAX(n) AS BIGINT) AS n_hours,
         CAST(MAX(gain) AS BIGINT) AS best_burst_scaled,
         CAST(SUM(amag) AS BIGINT) AS denom
  FROM kad GROUP BY 1
)
SELECT event_type, n_hours, best_burst_scaled,
       CASE WHEN denom > 0 THEN
         CAST(ROUND(CAST(best_burst_scaled AS DOUBLE)
              / CAST(denom AS DOUBLE) * 1000000, 0) AS BIGINT)
       END AS burst_share_ppm
FROM agg ORDER BY event_type
"""


def q_theta_method_forecast(sf_dir):
    """Per event type: the Theta-method one-step-ahead forecast of
    the daily count — fc = ((S_n - K) + a_num + b_num*(n+1)) /
    (2*D), where (a_num, b_num, D) are the exact integer OLS trend
    terms, S is the alpha=1/2 SES of the theta=2 line Y_t =
    2*D*x_t - a_num - b_num*t on the +K-shifted nonnegative grid,
    and the recursion S_t = (Y_t + S_{t-1}) // 2 is replayed
    bit-equal by a recursive SQL CTE."""
    daily = _bucket_counts(sf_dir, _DAY_US)
    cols = ["event_type", "n_days", "trend_next_x100",
            "theta_fc_x100"]
    out = {c: [] for c in cols}
    if len(daily) and "event_type" in daily.columns:
        for et, g in daily.sort_values(["event_type", "h"]).groupby(
            "event_type", sort=True
        ):
            x = g["c"].to_numpy(dtype=np.int64)
            n = len(x)
            if n < 3:
                continue
            t = np.arange(1, n + 1, dtype=np.int64)
            sx, sy = int(t.sum()), int(x.sum())
            sxx, sxy = int(np.sum(t * t)), int(np.sum(t * x))
            D = n * sxx - sx * sx
            if D == 0:
                continue
            b_num = n * sxy - sx * sy
            a_num = sy * sxx - sx * sxy
            y = [
                2 * D * int(x[i]) - a_num - b_num * (i + 1)
                for i in range(n)
            ]
            k = max(0, -min(y))
            s = y[0] + k
            for i in range(1, n):
                s = (y[i] + k + s) // 2
            s -= k
            trend_next = (a_num + b_num * (n + 1)) / D
            fc = (s + a_num + b_num * (n + 1)) / (2.0 * D)
            out["event_type"].append(et)
            out["n_days"].append(n)
            out["trend_next_x100"].append(
                _round_half_away(trend_next * 100.0)
            )
            out["theta_fc_x100"].append(
                _round_half_away(fc * 100.0)
            )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


THETA_SQL = f"""
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / {_DAY_US}) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), seq AS MATERIALIZED (
  SELECT event_type,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
              AS BIGINT) AS i, c
  FROM daily
), fit AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(i) AS BIGINT) AS sx,
         CAST(SUM(c) AS BIGINT) AS sy,
         CAST(SUM(i * i) AS BIGINT) AS sxx,
         CAST(SUM(i * c) AS BIGINT) AS sxy
  FROM seq GROUP BY 1 HAVING COUNT(*) >= 3
), terms AS MATERIALIZED (
  SELECT event_type, n,
         n * sxx - sx * sx AS dd,
         n * sxy - sx * sy AS b_num,
         sy * sxx - sx * sxy AS a_num
  FROM fit WHERE n * sxx - sx * sx <> 0
), ygrid AS MATERIALIZED (
  SELECT s.event_type, s.i,
         2 * t.dd * s.c - t.a_num - t.b_num * s.i AS y
  FROM seq s JOIN terms t ON t.event_type = s.event_type
), shift AS MATERIALIZED (
  SELECT event_type, GREATEST(0, -MIN(y)) AS k
  FROM ygrid GROUP BY 1
), rec AS (
  SELECT y.event_type, CAST(1 AS BIGINT) AS i,
         CAST(y.y + sh.k AS BIGINT) AS s
  FROM ygrid y JOIN shift sh ON sh.event_type = y.event_type
  WHERE y.i = 1
  UNION ALL
  SELECT r.event_type, y.i,
         CAST((y.y + sh.k + r.s) // 2 AS BIGINT)
  FROM rec r
  JOIN ygrid y ON y.event_type = r.event_type AND y.i = r.i + 1
  JOIN shift sh ON sh.event_type = r.event_type
)
SELECT r.event_type, t.n AS n_days,
       CAST(ROUND(CAST(t.a_num + t.b_num * (t.n + 1) AS DOUBLE)
            / CAST(t.dd AS DOUBLE) * 100, 0) AS BIGINT)
         AS trend_next_x100,
       CAST(ROUND(CAST((r.s - sh.k) + t.a_num + t.b_num * (t.n + 1)
            AS DOUBLE) / (2.0 * CAST(t.dd AS DOUBLE)) * 100, 0)
            AS BIGINT) AS theta_fc_x100
FROM rec r
JOIN terms t ON t.event_type = r.event_type
JOIN shift sh ON sh.event_type = r.event_type
WHERE r.i = t.n
ORDER BY r.event_type
"""

_SALT_P = 32  # planner's partition count
_SALT_TARGET_PPM = 1_250_000 // _SALT_P  # 1.25x average load ceiling


def q_salt_factor_planner(sf_dir):
    """Per event type: the integer salt factor the salted aggregate
    (stages/salt.py) needs so this key's per-partition load stays
    under 1.25x the average at P=32 partitions — salt =
    max(1, ceil(share * P / 1.25)) computed as one exact integer
    ceiling division over per-type counts."""
    hourly = _bucket_counts(sf_dir, _HOUR_US)
    cols = ["event_type", "n", "share_ppm", "salt_factor"]
    out = {c: [] for c in cols}
    if len(hourly) and "event_type" in hourly.columns:
        per = (
            hourly.groupby("event_type", sort=True)["c"]
            .sum()
            .astype(np.int64)
        )
        total = int(per.sum())
        for et, c in per.items():
            c = int(c)
            share = _round_half_away(float(c) / total * 1e6)
            # ceil(c * P * 1e6 / (1.25e6 * total)) =
            # ceil(c * P * 4 / (5 * total)), all positive ints
            num = c * _SALT_P * 4
            den = 5 * total
            salt = max(1, (num + den - 1) // den)
            out["event_type"].append(et)
            out["n"].append(c)
            out["share_ppm"].append(share)
            out["salt_factor"].append(salt)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


SALT_SQL = f"""
WITH per AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(c) AS BIGINT) AS total FROM per
)
SELECT p.event_type, p.c AS n,
       CAST(ROUND(CAST(p.c AS DOUBLE) / t.total * 1000000, 0)
            AS BIGINT) AS share_ppm,
       GREATEST(1, (p.c * {_SALT_P} * 4 + 5 * t.total - 1)
                   // (5 * t.total)) AS salt_factor
FROM per p, tot t ORDER BY p.event_type
"""


def register_r4ey(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "max_burst_window_per_type": q_max_burst_window_per_type,
            "theta_method_forecast": q_theta_method_forecast,
            "salt_factor_planner": q_salt_factor_planner,
        }
    )
    oracles.update(
        {
            "max_burst_window_per_type": BURST_SQL,
            "theta_method_forecast": THETA_SQL,
            "salt_factor_planner": SALT_SQL,
        }
    )
