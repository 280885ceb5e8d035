"""Round-4 batch EH: the unit-root / stationarity diagnostics family
over dense hourly count series — Dickey-Fuller t-statistic (closed-form
OLS), the KPSS level-stationarity statistic with Bartlett long-run
variance, and the Lo-MacKinlay variance-ratio test VR(4).

Exactness discipline: all three reduce to EXACT integer arithmetic up
to one closing double ratio. DF folds five int64 moment sums through
the mirrored 2-var OLS algebra; KPSS is algebraically rearranged so
that statistic = SQ*(L+1) / (n*W) where SQ (sum of squared scaled
partial sums) and W (Bartlett-weighted covariance fold) are exact
integers (HUGEINT on the SQL side, arbitrary-precision int on the
engine side); VR(q) likewise becomes B*T / (q*M*A) of exact integer
sums of squares. The Bartlett bandwidth is chosen by the INTEGER rule
100*L^4 <= 256*n (equivalent to L = floor(4*(n/100)^0.25)) so no
library pow() ulp can diverge."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

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


def _dense_hourly_matrix(sf_dir):
    """Exact (type x dense-hour) count matrix, pulled to the driver at
    its bounded grain (#types x time-span hours) — the PACF shape."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        t = pa.table(
            {
                "event_type": b["event_type"],
                "h": pa.array((us // _HOUR_US).astype(np.int64)),
            }
        )
        g = t.group_by(["event_type", "h"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "h", "c"])

    hourly = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["event_type", "h"])
        .aggregate([("c", "sum")])
        .rename_columns(["event_type", "h", "c"]),
    ).to_pandas()
    if not len(hourly) or "event_type" not in hourly.columns:
        return [], None, 0
    types = sorted(hourly["event_type"].unique())
    hmin = int(hourly["h"].min())
    n = int(hourly["h"].max()) - hmin + 1
    tix = {t: i for i, t in enumerate(types)}
    mat = np.zeros((len(types), n), dtype=np.int64)
    mat[
        hourly["event_type"].map(tix).to_numpy(),
        hourly["h"].to_numpy(dtype=np.int64) - hmin,
    ] = hourly["c"].to_numpy(dtype=np.int64)
    return types, mat, hmin


_DENSE_GRID_SQL = """
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
)
"""


# ---------------------------------------------------------------------------
# Dickey-Fuller t-statistic (no augmentation, with constant)
# ---------------------------------------------------------------------------


def q_dickey_fuller_hourly(sf_dir):
    """Per event type: the Dickey-Fuller unit-root t-statistic of the
    dense hourly count series — OLS of delta_y on (1, y_lag), t = beta
    / se(beta). Strongly negative t rejects a random-walk level (the
    series mean-reverts); t near 0 says shocks persist. The five
    moment sums (sx, sx2, sd, sd2, sxd) are exact int64; the OLS
    algebra (Sxx, Sxd, SSR, se) runs in mirrored doubles, so both
    sides agree bit-for-bit before the snap. Output beta x1e9 and t
    x1e6; NULL when the regressor variance or SSR degenerates."""
    types, mat, _hmin = _dense_hourly_matrix(sf_dir)
    cols = ["event_type", "t_len", "beta_x1e9", "df_t_x1e6"]
    out = {c: [] for c in cols}
    if mat is not None:
        n = mat.shape[1]
        for i, t in enumerate(types):
            y = mat[i]
            if n < 4:
                continue
            x = y[:-1]
            d = y[1:] - y[:-1]
            m = n - 1
            sx = int(np.sum(x))
            sx2 = int(np.sum(x * x))
            sd = int(np.sum(d))
            sd2 = int(np.sum(d * d))
            sxd = int(np.sum(x * d))
            mf = float(m)
            sxx = float(sx2) - float(sx) * float(sx) / mf
            sxd_c = float(sxd) - float(sx) * float(sd) / mf
            sdd = float(sd2) - float(sd) * float(sd) / mf
            beta = t_stat = None
            if sxx > 0.0 and m > 2:
                beta = sxd_c / sxx
                ssr = sdd - beta * sxd_c
                if ssr > 0.0:
                    se = np.sqrt((ssr / (mf - 2.0)) / sxx)
                    t_stat = beta / se
            out["event_type"].append(t)
            out["t_len"].append(n)
            out["beta_x1e9"].append(
                None if beta is None else _round_half_away(beta * 1e9)
            )
            out["df_t_x1e6"].append(
                None if t_stat is None else _round_half_away(t_stat * 1e6)
            )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


DF_SQL = (
    _DENSE_GRID_SQL
    + """
, lagd AS MATERIALIZED (
  SELECT event_type,
         LAG(c) OVER w AS x,
         c - LAG(c) OVER w AS d,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM dense WINDOW w AS (PARTITION BY event_type ORDER BY h)
), s AS (
  SELECT event_type, MAX(n) AS n,
         CAST(COUNT(x) AS BIGINT) AS m,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sx2,
         CAST(SUM(d) AS BIGINT) AS sd,
         CAST(SUM(d * d) AS BIGINT) AS sd2,
         CAST(SUM(x * d) AS BIGINT) AS sxd
  FROM lagd WHERE x IS NOT NULL GROUP BY 1
), alg AS (
  SELECT event_type, n, m,
         CAST(sx2 AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
             / CAST(m AS DOUBLE) AS sxx,
         CAST(sxd AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sd AS DOUBLE)
             / CAST(m AS DOUBLE) AS sxdc,
         CAST(sd2 AS DOUBLE)
           - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
             / CAST(m AS DOUBLE) AS sdd
  FROM s WHERE n >= 4
), fit AS (
  SELECT event_type, n, m, sxx, sxdc, sdd,
         CASE WHEN sxx > 0.0 AND m > 2 THEN sxdc / sxx END AS beta
  FROM alg
)
SELECT event_type, n AS t_len,
       CAST(ROUND(beta * 1000000000, 0) AS BIGINT) AS beta_x1e9,
       CASE WHEN beta IS NOT NULL
             AND sdd - beta * sxdc > 0.0 THEN
         CAST(ROUND(beta / SQRT(((sdd - beta * sxdc)
              / (CAST(m AS DOUBLE) - 2.0)) / sxx) * 1000000, 0)
              AS BIGINT)
       END AS df_t_x1e6
FROM fit ORDER BY 1
"""
)


# ---------------------------------------------------------------------------
# KPSS level-stationarity statistic, Bartlett long-run variance
# ---------------------------------------------------------------------------


def q_kpss_hourly(sf_dir):
    """Per event type: the KPSS level-stationarity statistic of the
    dense hourly counts — eta = (1/n^2) sum(S_t^2) / s^2_lrv with a
    Bartlett-kernel long-run variance at the standard bandwidth
    L = floor(4*(n/100)^(1/4)). Algebra: with e'_t = n*y_t - sum(y)
    (exact int), SQ = sum over t of (prefix-sum of e')^2 and
    W = (L+1)*g_0 + 2*sum_j (L+1-j)*g_j (g_j the exact int lag-j
    product sums), the statistic is EXACTLY SQ*(L+1) / (n*W) — one
    double division of two (possibly 128-bit) integers, so both sides
    agree bit-for-bit before the x1e9 snap. Bandwidth chosen by the
    integer rule 100*L^4 <= 256*n (no pow() ulp risk)."""
    types, mat, _hmin = _dense_hourly_matrix(sf_dir)
    cols = ["event_type", "t_len", "l_bw", "kpss_x1e9"]
    out = {c: [] for c in cols}
    if mat is not None:
        n = mat.shape[1]
        lbw = 0
        while 100 * (lbw + 1) ** 4 <= 256 * n:
            lbw += 1
        for i, t in enumerate(types):
            y = mat[i]
            if n < 2:
                continue
            sx = int(np.sum(y))
            e = [int(v) * n - sx for v in y]  # exact python ints
            sq = 0
            s_run = 0
            for v in e:
                s_run += v
                sq += s_run * s_run
            w_fold = 0
            for j in range(0, lbw + 1):
                gj = 0
                for tt in range(j, n):
                    gj += e[tt] * e[tt - j]
                w_fold += ((lbw + 1) if j == 0 else 2 * (lbw + 1 - j)) * gj
            kpss = None
            if w_fold > 0:
                kpss = float(sq * (lbw + 1)) / float(n * w_fold)
            out["event_type"].append(t)
            out["t_len"].append(n)
            out["l_bw"].append(lbw)
            out["kpss_x1e9"].append(
                None if kpss is None else _round_half_away(kpss * 1e9)
            )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


KPSS_SQL = (
    _DENSE_GRID_SQL
    + """
, meta AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS sx
  FROM dense GROUP BY 1
), bw AS MATERIALIZED (
  SELECT m.event_type, m.n, m.sx, MAX(l.l) AS lbw
  FROM meta m
  JOIN (SELECT unnest(generate_series(0, 50)) AS l) l
    ON 100 * l.l * l.l * l.l * l.l <= 256 * m.n
  GROUP BY 1, 2, 3
), e AS MATERIALIZED (
  SELECT d.event_type, d.h, d.c * b.n - b.sx AS e, b.n, b.lbw
  FROM dense d JOIN bw b ON b.event_type = d.event_type
), sq AS MATERIALIZED (
  SELECT event_type,
         SUM(CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS sq
  FROM (
    SELECT event_type,
           SUM(e) OVER (PARTITION BY event_type ORDER BY h) AS s
    FROM e
  ) GROUP BY 1
), w AS MATERIALIZED (
  SELECT a.event_type,
         SUM(CASE WHEN a.h - b.h = 0 THEN CAST(a.lbw + 1 AS HUGEINT)
                  ELSE CAST(2 * (a.lbw + 1 - (a.h - b.h)) AS HUGEINT)
             END * CAST(a.e AS HUGEINT) * CAST(b.e AS HUGEINT)) AS w
  FROM e a
  JOIN e b ON a.event_type = b.event_type
          AND a.h - b.h BETWEEN 0 AND a.lbw
  GROUP BY 1
)
SELECT bw.event_type, bw.n AS t_len, bw.lbw AS l_bw,
       CASE WHEN w.w > 0 THEN
         CAST(ROUND(CAST(sq.sq * CAST(bw.lbw + 1 AS HUGEINT) AS DOUBLE)
              / CAST(CAST(bw.n AS HUGEINT) * w.w AS DOUBLE)
              * 1000000000, 0) AS BIGINT)
       END AS kpss_x1e9
FROM bw
JOIN sq ON sq.event_type = bw.event_type
JOIN w ON w.event_type = bw.event_type
WHERE bw.n >= 2
ORDER BY 1
"""
)


# ---------------------------------------------------------------------------
# Lo-MacKinlay variance ratio VR(4)
# ---------------------------------------------------------------------------

_VR_Q = 4


def q_variance_ratio_hourly(sf_dir):
    """Per event type: the Lo-MacKinlay variance-ratio statistic
    VR(q=4) of the dense hourly count level — Var(q-hour change)/(q *
    Var(1-hour change)) with overlapping q-differences and drift
    mu = (y_last - y_first)/T. VR < 1 flags mean reversion, > 1
    momentum. Algebra: with A = sum(T*dy_t - D)^2 and
    B = sum(T*(y_t - y_{t-q}) - q*D)^2 (both exact integers, D the
    total change), VR = B*T / (q*M*A) exactly — one double division
    of two 128-bit-safe integers, snapped x1e6."""
    types, mat, _hmin = _dense_hourly_matrix(sf_dir)
    cols = ["event_type", "t_len", "n_q_terms", "vr_x1e6"]
    out = {c: [] for c in cols}
    if mat is not None:
        n = mat.shape[1]
        q = _VR_Q
        for i, t in enumerate(types):
            y = [int(v) for v in mat[i]]
            if n < q + 2:
                continue
            big_t = n - 1
            d_tot = y[-1] - y[0]
            a_sum = 0
            for tt in range(1, n):
                term = big_t * (y[tt] - y[tt - 1]) - d_tot
                a_sum += term * term
            m_terms = big_t - q + 1
            b_sum = 0
            for tt in range(q, n):
                term = big_t * (y[tt] - y[tt - q]) - q * d_tot
                b_sum += term * term
            vr = None
            if a_sum > 0:
                vr = float(b_sum * big_t) / float(q * m_terms * a_sum)
            out["event_type"].append(t)
            out["t_len"].append(n)
            out["n_q_terms"].append(m_terms)
            out["vr_x1e6"].append(
                None if vr is None else _round_half_away(vr * 1e6)
            )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


VR_SQL = (
    _DENSE_GRID_SQL
    + f"""
, meta AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) - 1 AS BIGINT) AS t
  FROM dense GROUP BY 1
), ends AS MATERIALIZED (
  SELECT d.event_type,
         MAX(CASE WHEN d.h = mh.mx THEN d.c END)
           - MAX(CASE WHEN d.h = mh.mn THEN d.c END) AS dtot
  FROM dense d
  JOIN (SELECT event_type, MIN(h) AS mn, MAX(h) AS mx
        FROM dense GROUP BY 1) mh
    ON mh.event_type = d.event_type
  GROUP BY 1
), lagd AS MATERIALIZED (
  SELECT event_type, h, c,
         LAG(c, 1) OVER w AS c1,
         LAG(c, {_VR_Q}) OVER w AS cq
  FROM dense WINDOW w AS (PARTITION BY event_type ORDER BY h)
), ab AS (
  SELECT l.event_type,
         SUM(CASE WHEN l.c1 IS NOT NULL THEN
           CAST(m.t * (l.c - l.c1) - e.dtot AS HUGEINT)
           * CAST(m.t * (l.c - l.c1) - e.dtot AS HUGEINT) END) AS a,
         SUM(CASE WHEN l.cq IS NOT NULL THEN
           CAST(m.t * (l.c - l.cq) - {_VR_Q} * e.dtot AS HUGEINT)
           * CAST(m.t * (l.c - l.cq) - {_VR_Q} * e.dtot AS HUGEINT)
           END) AS b,
         MAX(m.n) AS n, MAX(m.t) AS t
  FROM lagd l
  JOIN meta m ON m.event_type = l.event_type
  JOIN ends e ON e.event_type = l.event_type
  GROUP BY 1
)
SELECT event_type, n AS t_len,
       t - {_VR_Q} + 1 AS n_q_terms,
       CASE WHEN a > 0 THEN
         CAST(ROUND(CAST(b * CAST(t AS HUGEINT) AS DOUBLE)
              / CAST(CAST({_VR_Q} AS HUGEINT) * (t - {_VR_Q} + 1) * a
                     AS DOUBLE)
              * 1000000, 0) AS BIGINT)
       END AS vr_x1e6
FROM ab WHERE n >= {_VR_Q} + 2
ORDER BY 1
"""
)


def register_r4eh(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "dickey_fuller_hourly": q_dickey_fuller_hourly,
            "kpss_hourly": q_kpss_hourly,
            "variance_ratio_hourly": q_variance_ratio_hourly,
        }
    )
    oracles.update(
        {
            "dickey_fuller_hourly": DF_SQL,
            "kpss_hourly": KPSS_SQL,
            "variance_ratio_hourly": VR_SQL,
        }
    )
