"""Round-4 batch FC: sequential + multivariate monitoring — Wald's
SPRT on the daily purchase rate (the sequential test that decides
drift with bounded error long before a fixed-horizon test), a
systematic-sampling audit (every-k-th-by-event_id estimator vs the
full scan — the sampling design ops teams actually use on logs,
checked for the bias the rate_mean_pitfall family documents), and a
Mahalanobis outlier census over the hourly (count, value-sum) pairs
(the 2D generalization of the robust-z hour flags).

Exactness discipline: SPRT increments are integer multiples of the
x1e6-snapped log-likelihood constants, so the walk and its crossing
day are exact int64; systematic-sample sums/counts are exact with
only mean errors snapped; the Mahalanobis quadratic form is
assembled from exact int64 sufficient statistics with the single
chi-square constant applied identically on both sides."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4dw import (
    _DAY_US,
    _HOUR_US,
)
from mimirsbrunn_ray.stages.rollup import tree_merge

_P0_PPM = 180_000  # H0: purchase share 18%
_P1_PPM = 220_000  # H1: purchase share 22%
_SPRT_A_X1E6 = 2_944_439  # round(ln(19) * 1e6): alpha=beta=0.05


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _daily_purchase_counts(sf_dir) -> pd.DataFrame:
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b["ts"]),
                    pc.is_valid(b["event_type"]))
        b = b.filter(m)
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        d = (us.to_numpy(zero_copy_only=False)
             // _DAY_US).astype(np.int64)
        is_p = pc.equal(b["event_type"], "purchase").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        t = pa.table(
            {
                "d": pa.array(d),
                "n": pa.array(np.ones(len(d), np.int64)),
                "x": pa.array(is_p),
            }
        )
        g = t.group_by(["d"]).aggregate([("n", "sum"), ("x", "sum")])
        return g.rename_columns(["d", "n", "x"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["d"]).aggregate([("n", "sum"), ("x", "sum")])
        return g.rename_columns(["d", "n", "x"])

    from mimirsbrunn_ray.stages.broadcast import ensure_cols

    out = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow",
                       batch_size=None),
        combine,
    ).to_pandas()
    return ensure_cols(out, ["d", "n", "x"]).sort_values(
        "d", ignore_index=True)


def q_sprt_purchase_drift(sf_dir):
    """Wald SPRT over the day-ordered purchase share: LLR_t folds
    x_d * L1 + (n_d - x_d) * L0 where L1 = round(ln(p1/p0)*1e6) and
    L0 = round(ln((1-p1)/(1-p0))*1e6) — exact int64 walk. Decision =
    first day |LLR| crosses ln(19)*1e6 (alpha = beta = 0.05);
    reports the crossing day offset, decision and terminal LLR."""
    daily = _daily_purchase_counts(sf_dir)
    l1 = _round_half_away(np.log(_P1_PPM / _P0_PPM) * 1e6)
    l0 = _round_half_away(
        np.log((1e6 - _P1_PPM) / (1e6 - _P0_PPM)) * 1e6
    )
    llr = 0
    cross_i = None
    decision = "none"
    for i, (n, x) in enumerate(
        zip(daily["n"].astype(int), daily["x"].astype(int))
    ):
        llr += x * l1 + (n - x) * l0
        if cross_i is None and llr >= _SPRT_A_X1E6:
            cross_i, decision = i + 1, "reject_h0"
        elif cross_i is None and llr <= -_SPRT_A_X1E6:
            cross_i, decision = i + 1, "accept_h0"
    return pa.table(
        {
            "n_days": pa.array([len(daily)], pa.int64()),
            "first_cross_day": pa.array([cross_i], pa.int64()),
            "decision": pa.array([decision], pa.string()),
            "final_llr_x1e6": pa.array([llr], pa.int64()),
        }
    )


SPRT_SQL = f"""
WITH daily AS MATERIALIZED (
  SELECT CAST(FLOOR(EPOCH_US(ts) / {_DAY_US}) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                  END) AS BIGINT) AS x
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1
), consts AS (
  SELECT CAST(ROUND(LN({_P1_PPM} / {_P0_PPM}.0) * 1000000, 0)
              AS BIGINT) AS l1,
         CAST(ROUND(LN(({1_000_000 - _P1_PPM}.0)
              / ({1_000_000 - _P0_PPM}.0)) * 1000000, 0)
              AS BIGINT) AS l0
), walk AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY d) AS i,
         SUM(x * c.l1 + (n - x) * c.l0)
           OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS llr
  FROM daily, consts c
), crossing AS (
  SELECT MIN(i) AS ci FROM walk
  WHERE llr >= {_SPRT_A_X1E6} OR llr <= -{_SPRT_A_X1E6}
)
SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
       CAST(c.ci AS BIGINT) AS first_cross_day,
       CASE WHEN c.ci IS NULL THEN 'none'
            WHEN (SELECT llr FROM walk WHERE i = c.ci) > 0
              THEN 'reject_h0'
            ELSE 'accept_h0' END AS decision,
       CAST((SELECT llr FROM walk ORDER BY i DESC LIMIT 1)
            AS BIGINT) AS final_llr_x1e6
FROM crossing c
"""


def q_systematic_sampling_audit(sf_dir):
    """Systematic sampling audit: for k in (10, 100), the every-k-th
    row sample (event_id % k == 0) estimate of mean(value) vs the
    full-scan mean — exact integer sums/counts both, with the k-up-
    scaled sample total alongside so periodicity bias is visible as
    an integer discrepancy, not a rounding artifact."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )
    ks = np.array([10, 100], np.int64)

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b["event_id"]),
                    pc.is_valid(b["value"]))
        b = b.filter(m)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        vx = np.floor(
            b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        rows = {"k": [], "n": [], "s": [], "fn": [], "fs": []}
        for k in ks:
            sel = (eid % k) == 0
            rows["k"].append(int(k))
            rows["n"].append(int(sel.sum()))
            rows["s"].append(int(vx[sel].sum()))
            rows["fn"].append(len(vx))
            rows["fs"].append(int(vx.sum()))
        return pa.table(
            {c: pa.array(rows[c], pa.int64()) for c in rows}
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["k"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("fn", "sum"),
             ("fs", "sum")]
        )
        return g.rename_columns(["k", "n", "s", "fn", "fs"])

    out = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow",
                       batch_size=None),
        combine,
    ).to_pandas()
    from mimirsbrunn_ray.stages.broadcast import ensure_cols

    out = ensure_cols(out, ["k", "n", "s", "fn", "fs"]).sort_values(
        "k", ignore_index=True)
    est = [
        None if n == 0 else _round_half_away(float(s) / n)
        for s, n in zip(out["s"], out["n"])
    ]
    true = [
        None if n == 0 else _round_half_away(float(s) / n)
        for s, n in zip(out["fs"], out["fn"])
    ]
    err = [
        None if e is None or t is None else int(e - t)
        for e, t in zip(est, true)
    ]
    return pa.table(
        {
            "k": pa.array(out["k"].to_numpy(dtype=np.int64)),
            "n_sampled": pa.array(
                out["n"].to_numpy(dtype=np.int64)
            ),
            "est_mean_x100": pa.array(est, pa.int64()),
            "true_mean_x100": pa.array(true, pa.int64()),
            "err_x100": pa.array(err, pa.int64()),
        }
    )


SYSTEMATIC_SQL = """
WITH e AS MATERIALIZED (
  SELECT event_id, CAST(ROUND(value * 100, 0) AS BIGINT) AS vx
  FROM events WHERE event_id IS NOT NULL AND value IS NOT NULL
), ks AS (SELECT UNNEST([10, 100]) AS k),
per AS MATERIALIZED (
  SELECT ks.k,
         CAST(SUM(CASE WHEN e.event_id % ks.k = 0 THEN 1 ELSE 0
                  END) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN e.event_id % ks.k = 0 THEN e.vx ELSE 0
                  END) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS fn,
         CAST(SUM(e.vx) AS BIGINT) AS fs
  FROM e CROSS JOIN ks GROUP BY ks.k
)
SELECT CAST(k AS BIGINT) AS k, n AS n_sampled,
       CASE WHEN n > 0 THEN
         CAST(ROUND(CAST(s AS DOUBLE) / n, 0) AS BIGINT)
       END AS est_mean_x100,
       CASE WHEN fn > 0 THEN
         CAST(ROUND(CAST(fs AS DOUBLE) / fn, 0) AS BIGINT)
       END AS true_mean_x100,
       CASE WHEN n > 0 AND fn > 0 THEN
         CAST(ROUND(CAST(s AS DOUBLE) / n, 0) AS BIGINT)
         - CAST(ROUND(CAST(fs AS DOUBLE) / fn, 0) AS BIGINT)
       END AS err_x100
FROM per ORDER BY k
"""

_CHI2_2_99 = 9.21034  # chi-square(2df) 0.99 quantile


def q_mahalanobis_outlier_hours(sf_dir):
    """2D Mahalanobis outlier census over hourly (count, value-sum)
    points: hours whose squared Mahalanobis distance from the
    centroid exceeds the chi2(2, 0.99) bound. The quadratic form is
    assembled from exact int64 sufficient statistics (the n-scaled
    centered coordinates and the integer adjugate of the n-scaled
    covariance), so both sides compare the identical double against
    the single constant."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b["ts"]), pc.is_valid(b["value"]))
        b = b.filter(m)
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        h = (us.to_numpy(zero_copy_only=False)
             // _HOUR_US).astype(np.int64)
        vx = np.floor(
            b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "h": pa.array(h),
                "c": pa.array(np.ones(len(h), np.int64)),
                "s": pa.array(vx),
            }
        )
        g = t.group_by(["h"]).aggregate([("c", "sum"), ("s", "sum")])
        return g.rename_columns(["h", "c", "s"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["h"]).aggregate([("c", "sum"), ("s", "sum")])
        return g.rename_columns(["h", "c", "s"])

    pts = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow",
                       batch_size=None),
        combine,
    ).to_pandas()
    if len(pts) < 3:
        return pa.table(
            {
                "n_hours": pa.array([len(pts)], pa.int64()),
                "n_outliers": pa.array([0], pa.int64()),
                "outlier_ppm": pa.array([0], pa.int64()),
            }
        )
    x = pts["c"].to_numpy(dtype=np.int64)
    y = pts["s"].to_numpy(dtype=np.int64)
    n = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxx = int(np.sum(x * x))
    syy_i = int(np.sum(y.astype(object) * y.astype(object)))
    sxy = int(np.sum(x * y))
    # n^2-scaled covariance entries (exact ints; syy via bigints)
    a = n * sxx - sx * sx
    bq = n * sxy - sx * sy
    cq = n * syy_i - sy * sy
    det = a * cq - bq * bq  # python bigint
    if det <= 0:
        n_out = 0
    else:
        # centered coords scaled by n: u = n*x - sx, v = n*y - sy
        # md2 = (n-1)/n^2 * (cq*u^2 - 2*bq*u*v + a*v^2) / det
        u = (n * x - sx).astype(object)
        v = (n * y - sy).astype(object)
        qf = cq * u * u - 2 * bq * u * v + a * v * v
        thr = _CHI2_2_99 * float(det) * n * n / (n - 1)
        n_out = int(np.sum([float(q) > thr for q in qf]))
    ppm = _round_half_away(n_out / n * 1e6)
    return pa.table(
        {
            "n_hours": pa.array([n], pa.int64()),
            "n_outliers": pa.array([n_out], pa.int64()),
            "outlier_ppm": pa.array([ppm], pa.int64()),
        }
    )


MAHALANOBIS_SQL = f"""
WITH pts AS MATERIALIZED (
  SELECT CAST(FLOOR(EPOCH_US(ts) / {_HOUR_US}) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
              AS BIGINT) AS s
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1
), stats AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS sx,
         CAST(SUM(s) AS BIGINT) AS sy,
         CAST(SUM(c * c) AS BIGINT) AS sxx,
         SUM(CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS syy,
         CAST(SUM(c * s) AS BIGINT) AS sxy
  FROM pts
), terms AS MATERIALIZED (
  SELECT n, sx, sy,
         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS a,
         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS bq,
         CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS cq
  FROM stats
), flagged AS (
  SELECT t.n,
         CASE WHEN t.n >= 3
              AND t.a * t.cq - t.bq * t.bq > 0
              AND CAST(t.cq * (t.n * p.c - t.sx) * (t.n * p.c - t.sx)
                  - 2 * t.bq * (t.n * p.c - t.sx)
                        * (t.n * p.s - t.sy)
                  + t.a * (t.n * p.s - t.sy) * (t.n * p.s - t.sy)
                  AS DOUBLE)
                > {_CHI2_2_99} * CAST(t.a * t.cq - t.bq * t.bq
                                      AS DOUBLE)
                  * t.n * t.n / (t.n - 1)
         THEN 1 ELSE 0 END AS is_out
  FROM pts p, terms t
)
SELECT CAST(MAX(n) AS BIGINT) AS n_hours,
       CAST(SUM(is_out) AS BIGINT) AS n_outliers,
       CAST(ROUND(CAST(SUM(is_out) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) * 1000000, 0) AS BIGINT)
         AS outlier_ppm
FROM flagged
"""


def register_r4fc(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "sprt_purchase_drift": q_sprt_purchase_drift,
            "systematic_sampling_audit": q_systematic_sampling_audit,
            "mahalanobis_outlier_hours": q_mahalanobis_outlier_hours,
        }
    )
    oracles.update(
        {
            "sprt_purchase_drift": SPRT_SQL,
            "systematic_sampling_audit": SYSTEMATIC_SQL,
            "mahalanobis_outlier_hours": MAHALANOBIS_SQL,
        }
    )
