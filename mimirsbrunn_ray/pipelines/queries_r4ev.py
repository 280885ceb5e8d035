"""Round-4 batch EV: three more series diagnostics over the exact
(event_type, bucket) count tables — Katz fractal dimension (the
waveform-complexity companion to Higuchi/DFA), the Bartels RANK
version of the von Neumann randomness test (robust to the count
spikes that break the plain ratio), and an EWMA control chart with
lambda = 0.2 (the SPC drift detector the p-chart misses: small
sustained shifts).

Exactness discipline: every statistic assembles from int64 sums of
the integer count series — Katz from (path length L, max deviation
d, n) with the logs applied to identical ints on both sides; Bartels
from DOUBLED average ranks (2R = 2*RANK + ties - 1, integer-exact
under ties) so numerator/denominator are pure int64; the EWMA
recursion runs x1e6 with floor-division (replayed bit-equal by a
recursive SQL CTE) and the out-of-control test is the SQUARED
comparison (Z - mu)^2 > sigma^2-term done in exact integer algebra
(HUGEINT in SQL, Python ints here) — no sqrt, no float compare."""

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


def q_katz_fd_hourly(sf_dir):
    """Per event type: Katz fractal dimension of the observed hourly
    count series — FD = log10(n-1) / (log10(n-1) + log10(d) -
    log10(L)) with L = total absolute path length and d = max
    deviation from the first point, both exact int64."""
    hourly = _bucket_counts(sf_dir, _HOUR_US)
    cols = ["event_type", "n_hours", "path_len", "max_dev",
            "katz_fd_x1e6"]
    out = {c: [] for c in cols}
    if len(hourly) and "event_type" in hourly.columns:
        for et, g in hourly.sort_values(["event_type", "h"]).groupby(
            "event_type", sort=True
        ):
            c = g["c"].to_numpy(dtype=np.int64)
            n = len(c)
            if n < 2:
                continue
            L = int(np.sum(np.abs(np.diff(c))))
            d = int(np.max(np.abs(c - c[0])))
            fd = None
            if L > 0 and d > 0:
                den = (
                    np.log10(float(n - 1)) + np.log10(float(d))
                    - np.log10(float(L))
                )
                if den != 0.0:
                    fd = _round_half_away(
                        np.log10(float(n - 1)) / den * 1e6
                    )
            out["event_type"].append(et)
            out["n_hours"].append(n)
            out["path_len"].append(L)
            out["max_dev"].append(d)
            out["katz_fd_x1e6"].append(fd)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


KATZ_SQL = """
WITH hourly AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), seq AS MATERIALIZED (
  SELECT event_type, c,
         c - LAG(c) OVER w AS diff,
         FIRST_VALUE(c) OVER w AS c0
  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY h)
), agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(COALESCE(SUM(ABS(diff)), 0) AS BIGINT) AS path_len,
         CAST(MAX(ABS(c - c0)) AS BIGINT) AS max_dev
  FROM seq GROUP BY 1 HAVING COUNT(*) >= 2
)
SELECT event_type, n_hours, path_len, max_dev,
       CASE WHEN path_len > 0 AND max_dev > 0
            AND LOG10(CAST(n_hours - 1 AS DOUBLE))
                + LOG10(CAST(max_dev AS DOUBLE))
                - LOG10(CAST(path_len AS DOUBLE)) <> 0
       THEN CAST(ROUND(LOG10(CAST(n_hours - 1 AS DOUBLE))
            / (LOG10(CAST(n_hours - 1 AS DOUBLE))
               + LOG10(CAST(max_dev AS DOUBLE))
               - LOG10(CAST(path_len AS DOUBLE))) * 1000000, 0)
            AS BIGINT)
       END AS katz_fd_x1e6
FROM agg ORDER BY event_type
"""


def q_bartels_rank_test(sf_dir):
    """Per event type: Bartels' rank version of the von Neumann
    ratio over the observed hourly counts — RVN on AVERAGE ranks.
    Doubled ranks (2R = 2*RANK + ties - 1) keep everything integer:
    num4 = sum (2R_i - 2R_{i+1})^2, den4 = sum (2R_i - (n+1))^2,
    statistic = num4/den4 (the /4 cancels), ~2 under randomness."""
    hourly = _bucket_counts(sf_dir, _HOUR_US)
    cols = ["event_type", "n_hours", "num4", "den4", "rvn_rank_x1e6"]
    out = {c: [] for c in cols}
    if len(hourly) and "event_type" in hourly.columns:
        for et, g in hourly.sort_values(["event_type", "h"]).groupby(
            "event_type", sort=True
        ):
            c = g["c"].to_numpy(dtype=np.int64)
            n = len(c)
            if n < 3:
                continue
            r2 = (
                pd.Series(c).rank(method="average").to_numpy() * 2.0
            ).astype(np.int64)
            num4 = int(np.sum(np.diff(r2) ** 2))
            den4 = int(np.sum((r2 - (n + 1)) ** 2))
            stat = (
                None if den4 == 0
                else _round_half_away(float(num4) / float(den4) * 1e6)
            )
            out["event_type"].append(et)
            out["n_hours"].append(n)
            out["num4"].append(num4)
            out["den4"].append(den4)
            out["rvn_rank_x1e6"].append(stat)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


BARTELS_SQL = """
WITH hourly AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), ranked AS MATERIALIZED (
  SELECT event_type, h,
         2 * RANK() OVER (PARTITION BY event_type ORDER BY c)
         + COUNT(*) OVER (PARTITION BY event_type, c) - 1 AS r2,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
           AS n
  FROM hourly
), seq AS MATERIALIZED (
  SELECT event_type, n, r2,
         r2 - LAG(r2) OVER (PARTITION BY event_type ORDER BY h)
           AS dr
  FROM ranked
), agg AS (
  SELECT event_type,
         CAST(MAX(n) AS BIGINT) AS n_hours,
         CAST(COALESCE(SUM(dr * dr), 0) AS BIGINT) AS num4,
         CAST(SUM((r2 - (n + 1)) * (r2 - (n + 1))) AS BIGINT)
           AS den4
  FROM seq GROUP BY 1 HAVING MAX(n) >= 3
)
SELECT event_type, n_hours, num4, den4,
       CASE WHEN den4 > 0 THEN
         CAST(ROUND(CAST(num4 AS DOUBLE) / CAST(den4 AS DOUBLE)
              * 1000000, 0) AS BIGINT)
       END AS rvn_rank_x1e6
FROM agg ORDER BY event_type
"""

_EWMA_L_PPM = 200_000  # lambda = 0.2 on the x1e6 grid


def q_ewma_chart_ooc(sf_dir):
    """Per event type: EWMA control chart over observed DAILY counts
    (lambda = 0.2, seed Z_1 = x_1): Z_t = (200000*x_t*1e6 +
    800000*Z_{t-1}) // 1e6 on the x1e6 grid. A day is out of control
    when (Z_t/1e6 - mu)^2 > 9*sigma^2*lambda/(2-lambda) — with
    lambda = 0.2 that term is EXACTLY sigma^2, so the test becomes
    (n*Z_t - 1e6*S1)^2 > 1e12 * n * (n*S2 - S1^2), pure integer
    algebra (Python bigints / SQL HUGEINT). Emits per-type n_days,
    n_ooc and the final EWMA level."""
    daily = _bucket_counts(sf_dir, _DAY_US)
    cols = ["event_type", "n_days", "n_ooc", "ewma_final_x1e6"]
    out = {c: [] for c in cols}
    if len(daily) and "event_type" in daily.columns:
        for et, g in daily.sort_values(["event_type", "h"]).groupby(
            "event_type", sort=True
        ):
            x = g["c"].to_numpy(dtype=np.int64)
            n = len(x)
            if n < 2:
                continue
            s1 = int(x.sum())
            s2 = int(np.sum(x * x))
            var_num = n * s2 - s1 * s1  # n^2 * sigma^2
            z = int(x[0]) * 1_000_000
            n_ooc = 0
            for t in range(1, n):
                z = (
                    _EWMA_L_PPM * int(x[t]) * 1_000_000
                    + (1_000_000 - _EWMA_L_PPM) * z
                ) // 1_000_000
                lhs = n * z - 1_000_000 * s1
                if lhs * lhs > 1_000_000_000_000 * n * var_num:
                    n_ooc += 1
            out["event_type"].append(et)
            out["n_days"].append(n)
            out["n_ooc"].append(n_ooc)
            out["ewma_final_x1e6"].append(z)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


EWMA_SQL = f"""
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
              AS BIGINT) AS i,
         c
  FROM daily
), stats AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM seq GROUP BY 1 HAVING COUNT(*) >= 2
), rec AS (
  SELECT s.event_type, CAST(1 AS BIGINT) AS i,
         CAST(q.c * 1000000 AS BIGINT) AS z,
         CAST(0 AS BIGINT) AS n_ooc
  FROM stats s JOIN seq q ON q.event_type = s.event_type AND q.i = 1
  UNION ALL
  SELECT r.event_type, q.i,
         CAST(({_EWMA_L_PPM} * q.c * 1000000
               + {1_000_000 - _EWMA_L_PPM} * r.z) // 1000000
              AS BIGINT),
         r.n_ooc + CASE WHEN
           CAST(s.n * (({_EWMA_L_PPM} * q.c * 1000000
                 + {1_000_000 - _EWMA_L_PPM} * r.z) // 1000000)
                - 1000000 * s.s1 AS HUGEINT)
           * CAST(s.n * (({_EWMA_L_PPM} * q.c * 1000000
                 + {1_000_000 - _EWMA_L_PPM} * r.z) // 1000000)
                - 1000000 * s.s1 AS HUGEINT)
           > CAST(1000000000000 AS HUGEINT) * s.n
             * (s.n * s.s2 - s.s1 * s.s1)
         THEN 1 ELSE 0 END
  FROM rec r
  JOIN seq q ON q.event_type = r.event_type AND q.i = r.i + 1
  JOIN stats s ON s.event_type = r.event_type
)
SELECT r.event_type, s.n AS n_days,
       CAST(r.n_ooc AS BIGINT) AS n_ooc,
       r.z AS ewma_final_x1e6
FROM rec r JOIN stats s
  ON s.event_type = r.event_type AND r.i = s.n
ORDER BY r.event_type
"""


def register_r4ev(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "katz_fd_hourly": q_katz_fd_hourly,
            "bartels_rank_test": q_bartels_rank_test,
            "ewma_chart_ooc": q_ewma_chart_ooc,
        }
    )
    oracles.update(
        {
            "katz_fd_hourly": KATZ_SQL,
            "bartels_rank_test": BARTELS_SQL,
            "ewma_chart_ooc": EWMA_SQL,
        }
    )
