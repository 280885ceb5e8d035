"""Round-4 batch EQ: detrended fluctuation analysis (DFA alpha), the
integrated autocorrelation time, and per-day hour-profile KL
divergence against the overall diurnal shape.

Exactness discipline: DFA's per-box linear-detrend residual sums fold
from exact integer moments of the n-scaled profile (P^2 sums in
int128; the fixed-x moments s(s-1)/2 and s(s^2-1)/12 are exact
integers), each box SSR snaps to an integer before the per-scale
fold, and the log-log slope runs in x1e9-snapped integer OLS moments;
the ACF time's per-lag correlations are exact integer ratios
(n-scaled residual products over the residual sum of squares) with a
sign-based integer stopping rule and an x1e9 pre-sum snap; the KL
terms snap x1e9 per (day, hour) cell before their order-free integer
sums."""

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
from mimirsbrunn_ray.pipelines.queries_r4ep import _intlog_ols_slope
from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000
_DFA_SCALES = [4, 8, 16, 32, 64]
_ACF_MAX_LAG = 168


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


# ---------------------------------------------------------------------------
# DFA alpha
# ---------------------------------------------------------------------------


def q_dfa_alpha_hourly(sf_dir):
    """Per event type: the DFA(1) scaling exponent alpha of the dense
    hourly count series over box sizes {4,8,16,32,64} — the
    detrended cousin of the variance-time Hurst estimator (alpha >
    0.5 flags long memory that survives local linear trends). The
    profile is the n-scaled exact-integer cumulative residual; per
    box, SSR = Syyc - Sxyc^2/Sxxc from exact integer moments, snapped
    to an integer before the per-scale mean; alpha is the
    integer-moment OLS slope of the x1e9-snapped (ln s, ln F) points,
    snapped x1e6."""
    types, mat, _hmin = _dense_hourly_matrix(sf_dir)
    cols = ["event_type", "t_len", "alpha_x1e6"]
    out = {c: [] for c in cols}
    if mat is not None:
        n = mat.shape[1]
        for i, t in enumerate(types):
            y = mat[i]
            if n < _DFA_SCALES[-1] * 2:
                continue
            s_tot = int(np.sum(y))
            e = [int(v) * n - s_tot for v in y]
            prof = []
            run = 0
            for v in e:
                run += v
                prof.append(run)
            xs9, ys9 = [], []
            ok = True
            for s in _DFA_SCALES:
                b_cnt = n // s
                sx_c = s * (s - 1) // 2
                sxx_c = s * (s * s - 1) // 12
                sf = float(s)
                total = 0
                for b in range(b_cnt):
                    seg = prof[b * s:(b + 1) * s]
                    sy = sum(seg)
                    syy = sum(p * p for p in seg)
                    sxy = sum(j * p for j, p in enumerate(seg))
                    syc = float(syy) - float(sy) * float(sy) / sf
                    sxyc = float(sxy) - float(sx_c) * float(sy) / sf
                    ssr = syc - (sxyc * sxyc) / float(sxx_c)
                    total += _round_half_away(ssr)
                if total <= 0 or b_cnt < 2:
                    ok = False
                    break
                xs9.append(_round_half_away(np.log(float(s)) * 1e9))
                ys9.append(
                    _round_half_away(
                        0.5 * np.log(float(total) / float(b_cnt)) * 1e9
                    )
                )
            if not ok:
                continue
            alpha = None
            slope = _intlog_ols_slope(xs9, ys9)
            if slope is not None:
                alpha = _round_half_away(slope * 1e6)
            out["event_type"].append(t)
            out["t_len"].append(n)
            out["alpha_x1e6"].append(alpha)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


_DFA_SCALES_SQL = ", ".join(str(s) for s in _DFA_SCALES)

DFA_SQL = (
    _DENSE_GRID_SQL
    + f"""
, meta AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, MIN(h) AS hmin,
         CAST(SUM(c) AS BIGINT) AS s_tot
  FROM dense GROUP BY 1
), prof AS MATERIALIZED (
  SELECT d.event_type, d.h - m.hmin AS pos, m.n,
         SUM(d.c * m.n - m.s_tot) OVER
           (PARTITION BY d.event_type ORDER BY d.h
            ROWS UNBOUNDED PRECEDING) AS p
  FROM dense d JOIN meta m ON m.event_type = d.event_type
  WHERE m.n >= {_DFA_SCALES[-1]} * 2
), scales AS (SELECT unnest([{_DFA_SCALES_SQL}]) AS s),
boxmom AS MATERIALIZED (
  SELECT pr.event_type, sc.s, pr.pos // sc.s AS blk,
         CAST(SUM(pr.p) AS BIGINT) AS sy,
         SUM(CAST(pr.p AS HUGEINT) * pr.p) AS syy,
         CAST(SUM((pr.pos % sc.s) * pr.p) AS BIGINT) AS sxy
  FROM prof pr
  JOIN scales sc ON TRUE
  WHERE pr.pos < (pr.n // sc.s) * sc.s
  GROUP BY 1, 2, 3
), ssr AS MATERIALIZED (
  SELECT event_type, s,
         CAST(ROUND(
           (CAST(syy AS DOUBLE)
            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
              / CAST(s AS DOUBLE))
           - (CAST(sxy AS DOUBLE)
              - CAST((s * (s - 1)) // 2 AS DOUBLE)
                * CAST(sy AS DOUBLE) / CAST(s AS DOUBLE))
             * (CAST(sxy AS DOUBLE)
              - CAST((s * (s - 1)) // 2 AS DOUBLE)
                * CAST(sy AS DOUBLE) / CAST(s AS DOUBLE))
             / CAST((s * (s * s - 1)) // 12 AS DOUBLE)
         , 0) AS HUGEINT) AS ssr_snap
  FROM boxmom
), perscale AS MATERIALIZED (
  SELECT event_type, s,
         SUM(ssr_snap) AS total, CAST(COUNT(*) AS BIGINT) AS b
  FROM ssr GROUP BY 1, 2
), pts AS MATERIALIZED (
  SELECT event_type,
         CAST(ROUND(LN(CAST(s AS DOUBLE)) * 1000000000.0, 0)
              AS BIGINT) AS x9,
         CAST(ROUND(0.5 * LN(CAST(total AS DOUBLE)
              / CAST(b AS DOUBLE)) * 1000000000.0, 0) AS BIGINT) AS y9
  FROM perscale WHERE total > 0 AND b >= 2
), mom AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS np,
         CAST(SUM(x9) AS BIGINT) AS sx,
         CAST(SUM(y9) AS BIGINT) AS sy,
         SUM(CAST(x9 AS HUGEINT) * x9) AS sxx,
         SUM(CAST(x9 AS HUGEINT) * y9) AS sxy
  FROM pts GROUP BY 1
  HAVING COUNT(*) = {len(_DFA_SCALES)}
)
SELECT m.event_type, mt.n AS t_len,
       CASE WHEN m.np * m.sxx - CAST(m.sx AS HUGEINT) * m.sx <> 0 THEN
         CAST(ROUND(CAST(m.np * m.sxy
                      - CAST(m.sx AS HUGEINT) * m.sy AS DOUBLE)
              / CAST(m.np * m.sxx
                      - CAST(m.sx AS HUGEINT) * m.sx AS DOUBLE)
              * 1000000.0, 0) AS BIGINT)
       END AS alpha_x1e6
FROM mom m JOIN meta mt ON mt.event_type = m.event_type
ORDER BY 1
"""
)


# ---------------------------------------------------------------------------
# Integrated autocorrelation time
# ---------------------------------------------------------------------------


def q_acf_integrated_time(sf_dir):
    """Per event type: the integrated autocorrelation time tau =
    1 + 2*sum(rho_k) of the dense hourly counts, summed up to the
    first non-positive autocorrelation (initial-positive-sequence
    window, capped at 168 lags) — the effective-sample-size deflator
    (ESS = n/tau). Each rho_k is an exact integer ratio (n-scaled
    residual lag products over the residual sum of squares); the
    stopping rule tests the INTEGER numerator's sign, and each rho
    snaps x1e9 before the integer fold, so tau mirrors exactly."""
    types, mat, _hmin = _dense_hourly_matrix(sf_dir)
    cols = ["event_type", "t_len", "n_lags", "tau_x1e6"]
    out = {c: [] for c in cols}
    if mat is not None:
        n = mat.shape[1]
        for i, t in enumerate(types):
            y = mat[i]
            if n < 3:
                continue
            s_tot = int(np.sum(y))
            e = y.astype(np.int64) * n - s_tot
            den = int(np.sum(e * e))
            if den <= 0:
                continue
            r9_sum = 0
            n_lags = 0
            for k in range(1, min(_ACF_MAX_LAG, n - 1) + 1):
                num = int(np.sum(e[k:] * e[:-k]))
                if num <= 0:
                    break
                r9_sum += _round_half_away(
                    float(num) / float(den) * 1e9
                )
                n_lags += 1
            tau = _round_half_away(
                (1.0 + 2.0 * float(r9_sum) / 1e9) * 1e6
            )
            out["event_type"].append(t)
            out["t_len"].append(n)
            out["n_lags"].append(n_lags)
            out["tau_x1e6"].append(tau)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


ACF_TAU_SQL = (
    _DENSE_GRID_SQL
    + f"""
, meta AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s_tot
  FROM dense GROUP BY 1
), e AS MATERIALIZED (
  SELECT d.event_type, d.h, d.c * m.n - m.s_tot AS e, m.n
  FROM dense d JOIN meta m ON m.event_type = d.event_type
  WHERE m.n >= 3
), den AS MATERIALIZED (
  SELECT event_type, CAST(SUM(e * e) AS BIGINT) AS den
  FROM e GROUP BY 1
), lagnum AS MATERIALIZED (
  SELECT a.event_type, a.h - b.h AS k,
         CAST(SUM(a.e * b.e) AS BIGINT) AS num
  FROM e a
  JOIN e b ON b.event_type = a.event_type
          AND a.h - b.h BETWEEN 1
          AND LEAST({_ACF_MAX_LAG}, a.n - 1)
  GROUP BY 1, 2
), stopk AS MATERIALIZED (
  SELECT l.event_type,
         COALESCE(MIN(CASE WHEN l.num <= 0 THEN l.k END),
                  {_ACF_MAX_LAG} + 1) AS kstop
  FROM lagnum l GROUP BY 1
), fold AS (
  SELECT l.event_type,
         CAST(COUNT(*) AS BIGINT) AS n_lags,
         CAST(SUM(CAST(ROUND(CAST(l.num AS DOUBLE)
              / CAST(d.den AS DOUBLE) * 1000000000, 0) AS BIGINT))
              AS BIGINT) AS r9_sum
  FROM lagnum l
  JOIN den d ON d.event_type = l.event_type
  JOIN stopk s ON s.event_type = l.event_type
  WHERE l.k < s.kstop AND d.den > 0
  GROUP BY 1
)
SELECT m.event_type, m.n AS t_len,
       COALESCE(f.n_lags, 0) AS n_lags,
       CAST(ROUND((1.0 + 2.0 * CAST(COALESCE(f.r9_sum, 0) AS DOUBLE)
            / 1e9) * 1000000.0, 0) AS BIGINT) AS tau_x1e6
FROM meta m
JOIN den d ON d.event_type = m.event_type
LEFT JOIN fold f ON f.event_type = m.event_type
WHERE m.n >= 3 AND d.den > 0
ORDER BY 1
"""
)


# ---------------------------------------------------------------------------
# Per-day hour-profile KL divergence vs the overall diurnal shape
# ---------------------------------------------------------------------------


def q_daily_profile_kl(sf_dir):
    """Per event type: how much each day's hour-of-day distribution
    diverges from the type's overall diurnal profile — mean and max
    daily KL(p_day || q_overall), the drift monitor that catches a
    day whose SHAPE (not volume) went anomalous. Cell terms
    (c_dk/c_d) * ln(c_dk*C / (c_d*C_k)) come from five exact integer
    counts and snap x1e9 per cell before the order-free integer
    per-day sums; the day-mean closes with one mirrored division."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"]))
        b = b.filter(m)
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        t = pa.table(
            {
                "event_type": b["event_type"],
                "day": pa.array((us // _DAY_US).astype(np.int64)),
                "hod": pa.array(((us // _HOUR_US) % 24).astype(np.int64)),
            }
        )
        g = t.group_by(["event_type", "day", "hod"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["event_type", "day", "hod", "c"])

    cells = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["event_type", "day", "hod"])
        .aggregate([("c", "sum")])
        .rename_columns(["event_type", "day", "hod", "c"]),
    ).to_pandas()
    cols = ["event_type", "n_days", "avg_kl_x1e9", "max_kl_x1e9"]
    out = {c: [] for c in cols}
    if len(cells) and "event_type" in cells.columns:
        cells = cells.groupby(
            ["event_type", "day", "hod"], as_index=False
        )["c"].sum()
        for t in sorted(cells["event_type"].unique()):
            sub = cells[cells["event_type"] == t]
            c_tot = int(sub["c"].sum())
            c_k = sub.groupby("hod")["c"].sum()
            c_d = sub.groupby("day")["c"].sum()
            kl_by_day = {}
            for _, row in sub.iterrows():
                cdk = int(row["c"])
                cd = int(c_d[row["day"]])
                ck = int(c_k[row["hod"]])
                term = (
                    float(cdk) / float(cd)
                    * np.log(
                        float(cdk) * float(c_tot)
                        / (float(cd) * float(ck))
                    )
                )
                kl_by_day[row["day"]] = kl_by_day.get(
                    row["day"], 0
                ) + _round_half_away(term * 1e9)
            kls = list(kl_by_day.values())
            d_cnt = len(kls)
            out["event_type"].append(t)
            out["n_days"].append(d_cnt)
            out["avg_kl_x1e9"].append(
                _round_half_away(float(sum(kls)) / float(d_cnt))
            )
            out["max_kl_x1e9"].append(int(max(kls)))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


DAILY_KL_SQL = """
WITH cells AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 86400000000) AS BIGINT) AS day,
         CAST((FLOOR(EPOCH_US(ts) / 3600000000) % 24) AS BIGINT)
           AS hod,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2, 3
), ct AS MATERIALIZED (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS c_tot
  FROM cells GROUP BY 1
), ck AS MATERIALIZED (
  SELECT event_type, hod, CAST(SUM(c) AS BIGINT) AS ck
  FROM cells GROUP BY 1, 2
), cd AS MATERIALIZED (
  SELECT event_type, day, CAST(SUM(c) AS BIGINT) AS cd
  FROM cells GROUP BY 1, 2
), terms AS MATERIALIZED (
  SELECT x.event_type, x.day,
         CAST(ROUND(CAST(x.c AS DOUBLE) / CAST(d.cd AS DOUBLE)
              * LN(CAST(x.c AS DOUBLE) * CAST(t.c_tot AS DOUBLE)
                   / (CAST(d.cd AS DOUBLE) * CAST(k.ck AS DOUBLE)))
              * 1000000000, 0) AS BIGINT) AS term9
  FROM cells x
  JOIN ct t ON t.event_type = x.event_type
  JOIN ck k ON k.event_type = x.event_type AND k.hod = x.hod
  JOIN cd d ON d.event_type = x.event_type AND d.day = x.day
), perday AS MATERIALIZED (
  SELECT event_type, day, CAST(SUM(term9) AS BIGINT) AS kl9
  FROM terms GROUP BY 1, 2
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(ROUND(CAST(SUM(kl9) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
            0) AS BIGINT) AS avg_kl_x1e9,
       CAST(MAX(kl9) AS BIGINT) AS max_kl_x1e9
FROM perday GROUP BY 1 ORDER BY 1
"""


def register_r4eq(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "dfa_alpha_hourly": q_dfa_alpha_hourly,
            "acf_integrated_time": q_acf_integrated_time,
            "daily_profile_kl": q_daily_profile_kl,
        }
    )
    oracles.update(
        {
            "dfa_alpha_hourly": DFA_SQL,
            "acf_integrated_time": ACF_TAU_SQL,
            "daily_profile_kl": DAILY_KL_SQL,
        }
    )
