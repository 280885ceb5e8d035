"""Round-4 batch EI: harmonic regression at the daily frequency
(amplitude + R^2 of the 24 h sinusoid), classical ratio-to-moving-
average seasonal indices, and a Little's-law audit (sampled
concurrency vs lambda*W) over sessionized events.

Exactness discipline: the trig basis is emitted as repr() literal
strings and parsed on BOTH sides (Python float() and the SQL parser
produce the identical double), every data-dependent basis term is
snapped x1e9 BEFORE its order-free integer sum, and the normal-
equation solve mirrors expression-for-expression; the CMA ratio is
one double division of exact integers (48*y / window-weight sum) with
the same pre-sum snap; Little's law reduces to exact integer
minute-mark counting per session (#multiples of 60s inside
[start, end)) so only the closing ratio is snapped."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.pipelines.queries_r4eh import _dense_hourly_matrix

_HOUR_US = 3_600_000_000
_MIN_US = 60_000_000
_SESSION_GAP_US = 1_800_000_000  # 30 min

# repr() literals: float(repr(x)) == x, and the SQL parser reads the
# same decimal string to the same IEEE double — no libm ulp risk.
_COS24 = [repr(math.cos(2.0 * math.pi * k / 24.0)) for k in range(24)]
_SIN24 = [repr(math.sin(2.0 * math.pi * k / 24.0)) for k in range(24)]
_BASIS_SQL = ", ".join(
    f"({k}, CAST({_COS24[k]} AS DOUBLE), CAST({_SIN24[k]} AS DOUBLE))"
    for k in range(24)
)


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


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
# Harmonic regression at the daily frequency
# ---------------------------------------------------------------------------


def q_harmonic24_fit(sf_dir):
    """Per event type: OLS fit of the dense hourly counts on
    (1, cos(2*pi*h/24), sin(2*pi*h/24)) — the parametric alternative
    to the registry's hour-of-day profile: beta_cos/beta_sin give the
    daily harmonic's amplitude sqrt(bc^2+bs^2) and R^2 its share of
    variance. Basis terms fold per hour-of-day (a 24-point grain) and
    every double term is snapped x1e9 before its integer sum, so the
    normal equations see bit-identical moments on both sides."""
    types, mat, hmin = _dense_hourly_matrix(sf_dir)
    cols = ["event_type", "t_len", "beta_cos_x1e6", "beta_sin_x1e6",
            "amp_x1e6", "r2_x1e6"]
    out = {c: [] for c in cols}
    if mat is not None:
        n = mat.shape[1]
        cosv = [float(s) for s in _COS24]
        sinv = [float(s) for s in _SIN24]
        for i, t in enumerate(types):
            y = mat[i]
            if n < 25:
                continue
            hods = (hmin + np.arange(n)) % 24
            sy = int(np.sum(y))
            syy = int(np.sum(y * y))
            # per-hod exact partials
            cnt_k = np.bincount(hods, minlength=24)
            s_k = np.bincount(hods, weights=y.astype(np.float64),
                              minlength=24).astype(np.int64)
            s_su = s_sv = s_suu = s_svv = s_suv = 0
            s_suy = s_svy = 0
            for k in range(24):
                ck = float(cnt_k[k])
                u, v = cosv[k], sinv[k]
                s_su += _round_half_away(ck * u * 1e9)
                s_sv += _round_half_away(ck * v * 1e9)
                s_suu += _round_half_away(ck * (u * u) * 1e9)
                s_svv += _round_half_away(ck * (v * v) * 1e9)
                s_suv += _round_half_away(ck * (u * v) * 1e9)
                s_suy += _round_half_away(float(s_k[k]) * u * 1e9)
                s_svy += _round_half_away(float(s_k[k]) * v * 1e9)
            nf = float(n)
            su, sv = s_su / 1e9, s_sv / 1e9
            suu, svv, suv = s_suu / 1e9, s_svv / 1e9, s_suv / 1e9
            suy, svy = s_suy / 1e9, s_svy / 1e9
            syf, syyf = float(sy), float(syy)
            a11 = suu - su * su / nf
            a12 = suv - su * sv / nf
            a22 = svv - sv * sv / nf
            b1 = suy - su * syf / nf
            b2 = svy - sv * syf / nf
            det = a11 * a22 - a12 * a12
            bc = bs = amp = r2 = None
            if det != 0.0:
                bc = (b1 * a22 - b2 * a12) / det
                bs = (a11 * b2 - a12 * b1) / det
                amp = math.sqrt(bc * bc + bs * bs)
                syyc = syyf - syf * syf / nf
                if syyc > 0.0:
                    r2 = (bc * b1 + bs * b2) / syyc
            out["event_type"].append(t)
            out["t_len"].append(n)
            out["beta_cos_x1e6"].append(
                None if bc is None else _round_half_away(bc * 1e6)
            )
            out["beta_sin_x1e6"].append(
                None if bs is None else _round_half_away(bs * 1e6)
            )
            out["amp_x1e6"].append(
                None if amp is None else _round_half_away(amp * 1e6)
            )
            out["r2_x1e6"].append(
                None if r2 is None else _round_half_away(r2 * 1e6)
            )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


HARMONIC_SQL = (
    _DENSE_GRID_SQL
    + f"""
, basis(hod, cosv, sinv) AS (VALUES {_BASIS_SQL})
, hod AS MATERIALIZED (
  SELECT d.event_type, d.h % 24 AS hod,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(d.c) AS BIGINT) AS s
  FROM dense d GROUP BY 1, 2
), gstat AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS sy,
         CAST(SUM(c * c) AS BIGINT) AS syy
  FROM dense GROUP BY 1
), snapped AS MATERIALIZED (
  SELECT h.event_type,
         SUM(CAST(ROUND(CAST(h.cnt AS DOUBLE) * b.cosv
             * 1000000000.0, 0) AS BIGINT)) AS s_su,
         SUM(CAST(ROUND(CAST(h.cnt AS DOUBLE) * b.sinv
             * 1000000000.0, 0) AS BIGINT)) AS s_sv,
         SUM(CAST(ROUND(CAST(h.cnt AS DOUBLE) * (b.cosv * b.cosv)
             * 1000000000.0, 0) AS BIGINT)) AS s_suu,
         SUM(CAST(ROUND(CAST(h.cnt AS DOUBLE) * (b.sinv * b.sinv)
             * 1000000000.0, 0) AS BIGINT)) AS s_svv,
         SUM(CAST(ROUND(CAST(h.cnt AS DOUBLE) * (b.cosv * b.sinv)
             * 1000000000.0, 0) AS BIGINT)) AS s_suv,
         SUM(CAST(ROUND(CAST(h.s AS DOUBLE) * b.cosv
             * 1000000000.0, 0) AS BIGINT)) AS s_suy,
         SUM(CAST(ROUND(CAST(h.s AS DOUBLE) * b.sinv
             * 1000000000.0, 0) AS BIGINT)) AS s_svy
  FROM hod h JOIN basis b ON b.hod = h.hod
  GROUP BY 1
), alg AS (
  SELECT g.event_type, g.n, g.sy, g.syy,
         CAST(s.s_suu AS DOUBLE) / 1e9
           - (CAST(s.s_su AS DOUBLE) / 1e9)
             * (CAST(s.s_su AS DOUBLE) / 1e9)
             / CAST(g.n AS DOUBLE) AS a11,
         CAST(s.s_suv AS DOUBLE) / 1e9
           - (CAST(s.s_su AS DOUBLE) / 1e9)
             * (CAST(s.s_sv AS DOUBLE) / 1e9)
             / CAST(g.n AS DOUBLE) AS a12,
         CAST(s.s_svv AS DOUBLE) / 1e9
           - (CAST(s.s_sv AS DOUBLE) / 1e9)
             * (CAST(s.s_sv AS DOUBLE) / 1e9)
             / CAST(g.n AS DOUBLE) AS a22,
         CAST(s.s_suy AS DOUBLE) / 1e9
           - (CAST(s.s_su AS DOUBLE) / 1e9) * CAST(g.sy AS DOUBLE)
             / CAST(g.n AS DOUBLE) AS b1,
         CAST(s.s_svy AS DOUBLE) / 1e9
           - (CAST(s.s_sv AS DOUBLE) / 1e9) * CAST(g.sy AS DOUBLE)
             / CAST(g.n AS DOUBLE) AS b2
  FROM gstat g JOIN snapped s ON s.event_type = g.event_type
  WHERE g.n >= 25
), fit AS (
  SELECT event_type, n, sy, syy, b1, b2,
         CASE WHEN a11 * a22 - a12 * a12 <> 0.0
              THEN (b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12)
         END AS bc,
         CASE WHEN a11 * a22 - a12 * a12 <> 0.0
              THEN (a11 * b2 - a12 * b1) / (a11 * a22 - a12 * a12)
         END AS bs
  FROM alg
)
SELECT event_type, n AS t_len,
       CAST(ROUND(bc * 1000000, 0) AS BIGINT) AS beta_cos_x1e6,
       CAST(ROUND(bs * 1000000, 0) AS BIGINT) AS beta_sin_x1e6,
       CAST(ROUND(SQRT(bc * bc + bs * bs) * 1000000, 0) AS BIGINT)
         AS amp_x1e6,
       CASE WHEN CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                   / CAST(n AS DOUBLE) > 0.0 THEN
         CAST(ROUND((bc * b1 + bs * b2)
              / (CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                   / CAST(n AS DOUBLE)) * 1000000, 0) AS BIGINT)
       END AS r2_x1e6
FROM fit ORDER BY 1
"""
)


# ---------------------------------------------------------------------------
# Ratio-to-centered-moving-average seasonal indices
# ---------------------------------------------------------------------------


def q_ratio_to_ma_indices(sf_dir):
    """Per (event_type, hour-of-day): the classical ratio-to-moving-
    average seasonal index — y_h divided by the centered 24-term MA
    (half-weight ends), averaged per hod, normalized so the 24
    indices mean to 1. The CMA ratio is EXACTLY 48*y_h / W_h with
    W_h = y_{h-12} + 2*sum_{j=-11..11} y_{h+j} + y_{h+12} an exact
    integer window fold; ratios snap x1e9 before per-hod integer
    sums, and normalization divides by the snapped per-hod means'
    integer total — every cross-row sum is an integer sum."""
    types, mat, hmin = _dense_hourly_matrix(sf_dir)
    cols = ["event_type", "hod", "n_used", "idx_x1e6"]
    out = {c: [] for c in cols}
    if mat is not None:
        n = mat.shape[1]
        for i, t in enumerate(types):
            y = mat[i].astype(np.int64)
            if n < 25:
                continue
            cs = np.concatenate(([0], np.cumsum(y)))
            # W_h for h in [12, n-13]
            hs = np.arange(12, n - 12)
            inner = cs[hs + 12] - cs[hs - 11]  # sum y[h-11..h+11]
            w = y[hs - 12] + 2 * inner + y[hs + 12]
            ok = w > 0
            hs, w = hs[ok], w[ok]
            if len(hs) == 0:
                continue
            r_snap = np.array(
                [
                    _round_half_away(48.0 * float(y[h]) / float(wv) * 1e9)
                    for h, wv in zip(hs, w)
                ],
                dtype=np.int64,
            )
            hods = (hmin + hs) % 24
            rk = np.bincount(hods, weights=r_snap.astype(np.float64),
                             minlength=24).astype(np.int64)
            nk = np.bincount(hods, minlength=24)
            present = nk > 0
            t_snap = 0
            for k in range(24):
                if present[k]:
                    t_snap += _round_half_away(float(rk[k]) / float(nk[k]))
            if t_snap <= 0:
                continue
            for k in range(24):
                if not present[k]:
                    continue
                idx = (
                    float(rk[k]) / float(nk[k]) * 24.0 / float(t_snap)
                    * 1e6
                )
                out["event_type"].append(t)
                out["hod"].append(k)
                out["n_used"].append(int(nk[k]))
                out["idx_x1e6"].append(_round_half_away(idx))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


RATIO_MA_SQL = (
    _DENSE_GRID_SQL
    + """
, w AS MATERIALIZED (
  SELECT event_type, h, c,
         LAG(c, 12) OVER win + 2 * SUM(c) OVER
           (PARTITION BY event_type ORDER BY h
            ROWS BETWEEN 11 PRECEDING AND 11 FOLLOWING)
           + LEAD(c, 12) OVER win AS wsum
  FROM dense WINDOW win AS (PARTITION BY event_type ORDER BY h)
), r AS MATERIALIZED (
  SELECT event_type, h % 24 AS hod,
         CAST(ROUND(48.0 * CAST(c AS DOUBLE) / CAST(wsum AS DOUBLE)
              * 1000000000, 0) AS BIGINT) AS rs
  FROM w WHERE wsum IS NOT NULL AND wsum > 0
), byk AS MATERIALIZED (
  SELECT event_type, hod, CAST(SUM(rs) AS BIGINT) AS rk,
         CAST(COUNT(*) AS BIGINT) AS nk
  FROM r GROUP BY 1, 2
), tot AS MATERIALIZED (
  SELECT event_type,
         CAST(SUM(CAST(ROUND(CAST(rk AS DOUBLE) / CAST(nk AS DOUBLE),
              0) AS BIGINT)) AS BIGINT) AS t
  FROM byk GROUP BY 1
)
SELECT b.event_type, b.hod, b.nk AS n_used,
       CAST(ROUND(CAST(b.rk AS DOUBLE) / CAST(b.nk AS DOUBLE) * 24.0
            / CAST(tt.t AS DOUBLE) * 1000000.0, 0) AS BIGINT)
         AS idx_x1e6
FROM byk b JOIN tot tt ON tt.event_type = b.event_type
WHERE tt.t > 0
ORDER BY 1, 2
"""
)


# ---------------------------------------------------------------------------
# Little's law audit: minute-sampled concurrency vs lambda * W
# ---------------------------------------------------------------------------


def q_littles_law_audit(sf_dir):
    """Global Little's-law audit over 30-min-gap sessions: the minute-
    mark-sampled average concurrency L equals arrival rate x mean
    session duration exactly in the fluid limit; the finite-sample
    ratio (marks_covered * 60s) / sum(durations) measures the
    discretization bias. Minute marks inside [start, end) count
    EXACTLY as floor((end-1)/60s) - floor((start-1)/60s), so
    everything is int64 until the one closing snapped ratio. One
    user-id hash-bucket shuffle; per-user sessionization vectorized."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("user_id", "ts"))
        t = pa.table(
            {
                "user_id": b["user_id"],
                "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": b["event_id"],
            }
        )
        return add_bucket(t, "user_id", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_sessions": pd.Series([], dtype=np.int64),
                "sum_dur_us": pd.Series([], dtype=np.int64),
                "marks_covered": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["user_id", "us", "event_id"], kind="mergesort",
            ignore_index=True,
        )
        uid = g["user_id"].to_numpy(dtype=np.int64)
        us = g["us"].to_numpy(dtype=np.int64)
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap = np.concatenate(([0], us[1:] - us[:-1]))
        new_sess = new_user | (gap > _SESSION_GAP_US)
        sid = np.cumsum(new_sess)
        df = pd.DataFrame({"sid": sid, "us": us})
        agg = df.groupby("sid")["us"].agg(["min", "max"])
        start = agg["min"].to_numpy(dtype=np.int64)
        end = agg["max"].to_numpy(dtype=np.int64)
        dur = end - start
        marks = (end - 1) // _MIN_US - (start - 1) // _MIN_US
        return pd.DataFrame(
            {
                "n_sessions": [np.int64(len(start))],
                "sum_dur_us": [np.int64(dur.sum())],
                "marks_covered": [np.int64(marks.sum())],
            }
        )

    parts = (
        ev.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts):
        n_s = dur = mk = 0
    else:
        n_s = int(parts["n_sessions"].sum())
        dur = int(parts["sum_dur_us"].sum())
        mk = int(parts["marks_covered"].sum())
    ratio = (
        None
        if dur <= 0
        else _round_half_away(float(mk) * 60000000.0 / float(dur) * 1e6)
    )
    return pa.table(
        {
            "n_sessions": pa.array([n_s], pa.int64()),
            "sum_dur_us": pa.array([dur], pa.int64()),
            "marks_covered": pa.array([mk], pa.int64()),
            "littles_ratio_x1e6": pa.array([ratio], pa.int64()),
        }
    )


LITTLES_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT user_id, EPOCH_US(ts) AS us, event_id
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), lagd AS MATERIALIZED (
  SELECT user_id, us,
         CASE WHEN us - LAG(us) OVER w > {_SESSION_GAP_US}
              OR LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), sess AS MATERIALIZED (
  SELECT user_id, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM lagd
), spans AS MATERIALIZED (
  SELECT user_id, sid, MIN(us) AS s, MAX(us) AS en
  FROM sess GROUP BY 1, 2
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
         CAST(SUM(en - s) AS BIGINT) AS sum_dur_us,
         CAST(SUM((en - 1) // 60000000 - (s - 1) // 60000000)
              AS BIGINT) AS marks_covered
  FROM spans
)
SELECT n_sessions, sum_dur_us, marks_covered,
       CASE WHEN sum_dur_us > 0 THEN
         CAST(ROUND(CAST(marks_covered AS DOUBLE) * 60000000.0
              / CAST(sum_dur_us AS DOUBLE) * 1000000.0, 0) AS BIGINT)
       END AS littles_ratio_x1e6
FROM agg
"""


def register_r4ei(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "harmonic24_fit": q_harmonic24_fit,
            "ratio_to_ma_indices": q_ratio_to_ma_indices,
            "littles_law_audit": q_littles_law_audit,
        }
    )
    oracles.update(
        {
            "harmonic24_fit": HARMONIC_SQL,
            "ratio_to_ma_indices": RATIO_MA_SQL,
            "littles_law_audit": LITTLES_SQL,
        }
    )
