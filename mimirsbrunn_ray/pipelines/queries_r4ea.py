"""Round-4 batch EA: Granger lag-1 causality F-tests between hourly
count series, matrix-profile-style daily-profile discords, and the
Ljung-Box portmanteau whiteness test over dense hourly counts.

Exactness discipline: every series is the dense 0-filled hourly (or
day x hour) count grid over the global observed span, so all raw
moment sums fold as exact int64; the OLS / autocorrelation algebra on
top runs in mirrored doubles with identical operation order on both
sides (x1e6 snap); discord distances are pure integer L2^2 so the
nearest-neighbor argmin compares exactly, ties broken by smaller day.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000


def _round_half_away(x: float):
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


def _hourly_counts(sf_dir) -> pd.DataFrame:
    """(event_type, h, c) exact hourly counts — per-batch partials,
    tree merge; the bounded types x hours grid the series tests run on."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        t = pa.table(
            {
                "event_type": b["event_type"],
                "h": pa.array((us // _HOUR_US).astype(np.int64)),
                "c": pa.array(np.ones(len(us), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "h"], ["c"])

    return tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "h"], ["c"]),
    ).to_pandas()


def _dense_grid(hourly: pd.DataFrame) -> tuple[list, np.ndarray, int]:
    """types (sorted), dense types x hours int64 count matrix over the
    global [min_h, max_h] span, and min_h."""
    types = sorted(hourly["event_type"].unique())
    hmin = int(hourly["h"].min())
    hmax = int(hourly["h"].max())
    width = hmax - hmin + 1
    mat = np.zeros((len(types), width), dtype=np.int64)
    tix = {t: i for i, t in enumerate(types)}
    rows = hourly["event_type"].map(tix).to_numpy()
    cols = (hourly["h"].to_numpy(dtype=np.int64) - hmin).astype(np.int64)
    mat[rows, cols] = hourly["c"].to_numpy(dtype=np.int64)
    return types, mat, hmin


# ---------------------------------------------------------------------------
# Granger lag-1 causality F between hourly count series
# ---------------------------------------------------------------------------


def q_granger_lag1_pairs(sf_dir):
    """Per ordered event-type pair (cause a -> effect b): the Granger
    lag-1 F-test over dense 0-filled hourly counts — does adding
    a_{t-1} to the autoregression b_t ~ b_{t-1} cut the residual sum
    of squares? F = (RSS_r - RSS_f)(T-3)/RSS_f, the load-propagation
    screen ('do error spikes predict next-hour click drops') run on
    every pair. Moment sums fold as exact int64; the closed-form
    two-regressor OLS runs in mirrored doubles, x1e6 snap, NULL when
    the normal equations are singular or the full model fits exactly."""
    hourly = _hourly_counts(sf_dir)
    cols = ["cause", "effect", "t_used", "f_x1e6"]
    if not len(hourly) or "event_type" not in hourly.columns:
        return pa.table(
            {
                "cause": pa.array([], pa.string()),
                "effect": pa.array([], pa.string()),
                "t_used": pa.array([], pa.int64()),
                "f_x1e6": pa.array([], pa.int64()),
            }
        )
    types, mat, _ = _dense_grid(hourly)
    out = {c: [] for c in cols}
    for ia, a in enumerate(types):
        for ib, b in enumerate(types):
            if ia == ib:
                continue
            y = mat[ib, 1:].astype(np.float64)
            x1 = mat[ib, :-1].astype(np.float64)
            x2 = mat[ia, :-1].astype(np.float64)
            t = len(y)
            if t < 4:
                continue
            tf = float(t)
            s11 = np.sum(x1 * x1) - np.sum(x1) ** 2 / tf
            s22 = np.sum(x2 * x2) - np.sum(x2) ** 2 / tf
            s12 = np.sum(x1 * x2) - np.sum(x1) * np.sum(x2) / tf
            s1y = np.sum(x1 * y) - np.sum(x1) * np.sum(y) / tf
            s2y = np.sum(x2 * y) - np.sum(x2) * np.sum(y) / tf
            syy = np.sum(y * y) - np.sum(y) ** 2 / tf
            det = s11 * s22 - s12 * s12
            f = None
            if det > 0.0 and s11 > 0.0:
                rss_r = syy - s1y * s1y / s11
                beta = (s1y * s22 - s2y * s12) / det
                gamma = (s2y * s11 - s1y * s12) / det
                rss_f = syy - beta * s1y - gamma * s2y
                if rss_f > 0.0:
                    f = (rss_r - rss_f) * (tf - 3.0) / rss_f
            out["cause"].append(a)
            out["effect"].append(b)
            out["t_used"].append(t)
            out["f_x1e6"].append(
                None if f is None else _round_half_away(f * 1e6)
            )
    return pa.table(
        {
            "cause": pa.array(out["cause"], pa.string()),
            "effect": pa.array(out["effect"], pa.string()),
            "t_used": pa.array(out["t_used"], pa.int64()),
            "f_x1e6": pa.array(out["f_x1e6"], pa.int64()),
        }
    )


GRANGER_SQL = """
WITH hh AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), bounds AS MATERIALIZED (
  SELECT MIN(h) AS mn, MAX(h) AS mx FROM hh
), grid AS MATERIALIZED (
  SELECT unnest(generate_series(mn, mx)) AS h FROM bounds
), types AS MATERIALIZED (
  SELECT DISTINCT event_type FROM hh
), dense AS MATERIALIZED (
  SELECT t.event_type, g.h, COALESCE(hh.c, 0) AS c
  FROM types t CROSS JOIN grid g
  LEFT JOIN hh ON hh.event_type = t.event_type AND hh.h = g.h
), lagged AS MATERIALIZED (
  SELECT event_type, h, CAST(c AS BIGINT) AS c,
         LAG(c) OVER (PARTITION BY event_type ORDER BY h) AS lc
  FROM dense
), m AS (
  SELECT a.event_type AS cause, b.event_type AS effect,
         CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(b.lc * b.lc) AS DOUBLE) AS x11,
         CAST(SUM(a.lc * a.lc) AS DOUBLE) AS x22,
         CAST(SUM(b.lc * a.lc) AS DOUBLE) AS x12,
         CAST(SUM(b.lc * b.c) AS DOUBLE) AS x1y,
         CAST(SUM(a.lc * b.c) AS DOUBLE) AS x2y,
         CAST(SUM(b.c * b.c) AS DOUBLE) AS yy,
         CAST(SUM(b.lc) AS DOUBLE) AS sx1,
         CAST(SUM(a.lc) AS DOUBLE) AS sx2,
         CAST(SUM(b.c) AS DOUBLE) AS sy
  FROM lagged b JOIN lagged a
    ON a.h = b.h AND a.event_type <> b.event_type
  WHERE b.lc IS NOT NULL AND a.lc IS NOT NULL
  GROUP BY 1, 2
), c AS (
  SELECT cause, effect, t,
         x11 - sx1 * sx1 / t AS s11,
         x22 - sx2 * sx2 / t AS s22,
         x12 - sx1 * sx2 / t AS s12,
         x1y - sx1 * sy / t AS s1y,
         x2y - sx2 * sy / t AS s2y,
         yy - sy * sy / t AS syy
  FROM m WHERE t >= 4
), f AS (
  SELECT cause, effect, t, s11, s1y, syy,
         s11 * s22 - s12 * s12 AS det,
         (s1y * s22 - s2y * s12) AS bnum,
         (s2y * s11 - s1y * s12) AS gnum,
         s1y AS s1y2, s2y AS s2y2
  FROM c
)
SELECT cause, effect, t AS t_used,
       CASE
         WHEN det <= 0.0 OR s11 <= 0.0 THEN NULL
         WHEN syy - (bnum / det) * s1y2 - (gnum / det) * s2y2 <= 0.0
           THEN NULL
         ELSE CAST(ROUND(
           ((syy - s1y * s1y / s11)
            - (syy - (bnum / det) * s1y2 - (gnum / det) * s2y2))
           * (t - 3.0)
           / (syy - (bnum / det) * s1y2 - (gnum / det) * s2y2)
           * 1000000, 0) AS BIGINT)
       END AS f_x1e6
FROM f ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# daily-profile discords: nearest-neighbor L2^2 between day profiles
# ---------------------------------------------------------------------------


def q_daily_profile_discords(sf_dir):
    """Per day in the global span: the matrix-profile-style discord
    score — the exact integer L2^2 distance from the day's dense
    24-hour count profile (all types pooled, missing hours = 0) to its
    nearest other day, plus that neighbor — the 'which day looked like
    nothing else' anomaly ranking. All distances are exact int64;
    argmin ties break to the smaller neighbor day."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        h = (us // _HOUR_US).astype(np.int64)
        t = pa.table(
            {
                "h": pa.array(h),
                "c": pa.array(np.ones(len(h), np.int64)),
            }
        )
        return _sum_by(t, ["h"], ["c"])

    hourly = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["h"], ["c"]),
    ).to_pandas()
    if not len(hourly) or "h" not in hourly.columns:
        return pa.table(
            {
                "day": pa.array([], pa.int64()),
                "nn_day": pa.array([], pa.int64()),
                "nn_dist2": pa.array([], pa.int64()),
            }
        )
    h = hourly["h"].to_numpy(dtype=np.int64)
    c = hourly["c"].to_numpy(dtype=np.int64)
    dmin, dmax = int(h.min() // 24), int(h.max() // 24)
    ndays = dmax - dmin + 1
    prof = np.zeros((ndays, 24), dtype=np.int64)
    prof[h // 24 - dmin, h % 24] = c
    if ndays < 2:
        return pa.table(
            {
                "day": pa.array([], pa.int64()),
                "nn_day": pa.array([], pa.int64()),
                "nn_dist2": pa.array([], pa.int64()),
            }
        )
    diff = prof[:, None, :] - prof[None, :, :]
    dist = np.sum(diff * diff, axis=2)
    np.fill_diagonal(dist, np.iinfo(np.int64).max)
    nn = np.argmin(dist, axis=1)  # first (smallest day) argmin on ties
    return pa.table(
        {
            "day": pa.array(np.arange(dmin, dmax + 1, dtype=np.int64)),
            "nn_day": pa.array((nn + dmin).astype(np.int64)),
            "nn_dist2": pa.array(dist[np.arange(ndays), nn].astype(np.int64)),
        }
    )


DISCORD_SQL = """
WITH hh AS MATERIALIZED (
  SELECT CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), bounds AS MATERIALIZED (
  SELECT MIN(h) // 24 AS dmn, MAX(h) // 24 AS dmx FROM hh
), days AS MATERIALIZED (
  SELECT unnest(generate_series(dmn, dmx)) AS day FROM bounds
), grid AS MATERIALIZED (
  SELECT d.day, x.hod FROM days d
  CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS hod) x
), dense AS MATERIALIZED (
  SELECT g.day, g.hod, COALESCE(hh.c, 0) AS c
  FROM grid g
  LEFT JOIN hh ON hh.h = g.day * 24 + g.hod
), pairs AS (
  SELECT a.day AS d1, b.day AS d2,
         CAST(SUM((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS dist2
  FROM dense a JOIN dense b
    ON a.hod = b.hod AND a.day <> b.day
  GROUP BY 1, 2
), ranked AS (
  SELECT d1, d2, dist2,
         ROW_NUMBER() OVER (PARTITION BY d1 ORDER BY dist2, d2) AS rn
  FROM pairs
)
SELECT d1 AS day, d2 AS nn_day, dist2 AS nn_dist2
FROM ranked WHERE rn = 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Ljung-Box portmanteau test at lag 24 over dense hourly counts
# ---------------------------------------------------------------------------


def q_ljung_box_hourly(sf_dir):
    """Per event type: the Ljung-Box Q(24) portmanteau statistic over
    the dense 0-filled hourly count series — T(T+2) sum_k rho_k^2 /
    (T-k) for k = 1..24 — the single-number 'is this series white
    noise' screen whose large values flag diurnal structure worth a
    seasonal model. Raw lag products fold from exact int64 counts; the
    autocorrelations and Q run in mirrored doubles, x1e6 snap."""
    hourly = _hourly_counts(sf_dir)
    cols = ["event_type", "t_len", "q24_x1e6"]
    if not len(hourly) or "event_type" not in hourly.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "t_len": pa.array([], pa.int64()),
                "q24_x1e6": pa.array([], pa.int64()),
            }
        )
    types, mat, _ = _dense_grid(hourly)
    out = {c: [] for c in cols}
    for i, et in enumerate(types):
        c = mat[i].astype(np.float64)
        t = len(c)
        if t < 26:
            continue
        mu = float(np.sum(mat[i])) / t
        d = c - mu
        denom = np.sum(d * d)
        if denom <= 0.0:
            out["event_type"].append(et)
            out["t_len"].append(t)
            out["q24_x1e6"].append(None)
            continue
        q = 0.0
        for k in range(1, 25):
            rho = np.sum(d[k:] * d[:-k]) / denom
            q += rho * rho / (t - k)
        q *= t * (t + 2.0)
        out["event_type"].append(et)
        out["t_len"].append(t)
        out["q24_x1e6"].append(_round_half_away(q * 1e6))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "t_len": pa.array(out["t_len"], pa.int64()),
            "q24_x1e6": pa.array(out["q24_x1e6"], pa.int64()),
        }
    )


LJUNG_BOX_SQL = """
WITH hh AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), bounds AS MATERIALIZED (
  SELECT MIN(h) AS mn, MAX(h) AS mx FROM hh
), grid AS MATERIALIZED (
  SELECT unnest(generate_series(mn, mx)) AS h FROM bounds
), types AS MATERIALIZED (
  SELECT DISTINCT event_type FROM hh
), dense AS MATERIALIZED (
  SELECT t.event_type, g.h, COALESCE(hh.c, 0) AS c
  FROM types t CROSS JOIN grid g
  LEFT JOIN hh ON hh.event_type = t.event_type AND hh.h = g.h
), stats AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(c) AS DOUBLE) / COUNT(*) AS mu
  FROM dense GROUP BY 1
), centered AS MATERIALIZED (
  SELECT d.event_type, d.h, d.c - s.mu AS d, s.t, s.mu
  FROM dense d JOIN stats s ON s.event_type = d.event_type
), denom AS MATERIALIZED (
  SELECT event_type, SUM(d * d) AS dd FROM centered GROUP BY 1
), lagprod AS (
  SELECT a.event_type, a.h - b.h AS k, a.d * b.d AS p
  FROM centered a JOIN centered b
    ON a.event_type = b.event_type
   AND a.h - b.h BETWEEN 1 AND 24
), rho AS (
  SELECT l.event_type, l.k, SUM(l.p) / MAX(dn.dd) AS rho,
         MAX(s.t) AS t
  FROM lagprod l
  JOIN denom dn ON dn.event_type = l.event_type
  JOIN stats s ON s.event_type = l.event_type
  WHERE dn.dd > 0.0
  GROUP BY 1, 2
)
SELECT r.event_type, CAST(MAX(r.t) AS BIGINT) AS t_len,
       CAST(ROUND(MAX(r.t) * (MAX(r.t) + 2.0)
            * SUM(r.rho * r.rho / (r.t - r.k)) * 1000000, 0) AS BIGINT)
         AS q24_x1e6
FROM rho r WHERE r.t >= 26 GROUP BY 1
UNION ALL
SELECT s.event_type, s.t AS t_len, NULL AS q24_x1e6
FROM stats s JOIN denom dn ON dn.event_type = s.event_type
WHERE s.t >= 26 AND dn.dd <= 0.0
ORDER BY 1
"""


def register_r4ea(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "granger_lag1_pairs": q_granger_lag1_pairs,
            "daily_profile_discords": q_daily_profile_discords,
            "ljung_box_hourly": q_ljung_box_hourly,
        }
    )
    oracles.update(
        {
            "granger_lag1_pairs": GRANGER_SQL,
            "daily_profile_discords": DISCORD_SQL,
            "ljung_box_hourly": LJUNG_BOX_SQL,
        }
    )
