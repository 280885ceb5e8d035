"""Round-4 batch FU: renewal memory, coverage planning, and
variance-stabilized anomaly residuals — lag-1 autocorrelation of
inter-arrival gaps per event type (do long waits follow long
waits?), the coupon-collector expected event count to observe every
type at least once (inclusion-exclusion over the empirical type
shares — the coverage-planning number for sampling pipelines), and
Freeman-Tukey variance-stabilized Poisson residuals on the type x
hour-of-day grid (the residual scale on which Poisson cells are
comparable).

Exactness discipline: gap moments fold the identical centered
double sums over identically-ordered gap streams; the
coupon-collector sum enumerates the same 31 subsets with exact
integer share numerators; Freeman-Tukey residuals mirror
sqrt(x) + sqrt(x+1) - sqrt(4e+1) cell-by-cell on identical integer
grids."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _round_half_away,
    _type_cell_counts,
)
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

_HOUR_US = 3_600_000_000


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def q_gap_autocorr_lag1(sf_dir):
    """Lag-1 Pearson autocorrelation of each event type's
    inter-arrival gaps in (ts, event_id) order — positive r1 means
    long waits cluster (renewal memory beyond the marginal
    distribution the Weibull fit captures), ~0 means an
    approximately renewal process.  Types are hash-bucketed whole;
    the gap scan and centered moment sums are vectorized per
    group."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "event_id"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "ts", "event_id"))
        t = pa.table({
            "event_type": b["event_type"],
            "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_id": b["event_id"],
        })
        return add_bucket(t, "event_type", 8)

    def fit(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "event_type": pd.Series([], dtype=object),
            "n_gaps": pd.Series([], dtype=np.int64),
            "r1_x1e6": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        g = g.sort_values(["event_type", "us", "event_id"],
                          kind="mergesort", ignore_index=True)
        et = g["event_type"].to_numpy()
        us = g["us"].to_numpy(dtype=np.int64)
        out = {"event_type": [], "n_gaps": [], "r1_x1e6": []}
        brk = np.ones(len(g), dtype=bool)
        brk[1:] = et[1:] != et[:-1]
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(g))
        for s, e in zip(starts, ends):
            gaps = np.diff(us[s:e]).astype(np.float64)
            n = len(gaps)
            if n < 3:
                continue
            mu = gaps.mean()
            d = gaps - mu
            c0 = float((d * d).sum())
            if c0 == 0:
                continue
            r1 = float((d[:-1] * d[1:]).sum()) / c0
            out["event_type"].append(et[s])
            out["n_gaps"].append(n)
            out["r1_x1e6"].append(_round_half_away(r1 * 1e6))
        df = pd.DataFrame(out)
        for c in ["n_gaps", "r1_x1e6"]:
            df[c] = df[c].astype(np.int64)
        return df

    res = (
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(fit, batch_format="pandas")
        .to_pandas()
    )
    if "event_type" not in res.columns or len(res) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "n_gaps": pa.array([], pa.int64()),
            "r1_x1e6": pa.array([], pa.int64()),
        })
    res = res.sort_values("event_type", ignore_index=True)
    return pa.table({
        "event_type": pa.array(res["event_type"], pa.string()),
        "n_gaps": pa.array(res["n_gaps"].to_numpy(np.int64)),
        "r1_x1e6": pa.array(res["r1_x1e6"].to_numpy(np.int64)),
    })


GAP_AC_SQL = """
WITH e AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) AS us, event_id
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL
), gp AS MATERIALIZED (
  SELECT event_type,
         us - LAG(us) OVER (PARTITION BY event_type
                            ORDER BY us, event_id) AS gap,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY us, event_id) AS rn
  FROM e
), gg AS MATERIALIZED (
  SELECT event_type, CAST(gap AS DOUBLE) AS gap, rn
  FROM gp WHERE gap IS NOT NULL
), d AS MATERIALIZED (
  SELECT event_type, rn,
         gap - AVG(gap) OVER (PARTITION BY event_type) AS dv,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM gg
), mom AS (
  SELECT a.event_type, ANY_VALUE(a.n) AS n,
         SUM(a.dv * a.dv) AS c0,
         SUM(CASE WHEN b.dv IS NOT NULL
                  THEN a.dv * b.dv ELSE 0 END) AS c1
  FROM d a
  LEFT JOIN d b ON b.event_type = a.event_type
               AND b.rn = a.rn + 1
  GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_gaps,
       CAST(ROUND(c1 / c0 * 1000000, 0) AS BIGINT) AS r1_x1e6
FROM mom WHERE n >= 3 AND c0 <> 0
ORDER BY event_type
"""


def q_coupon_collector_types(sf_dir):
    """Coupon-collector coverage plan: given the empirical event-
    type shares p_i, the expected number of events one must stream
    before observing EVERY type at least once, by inclusion-
    exclusion E[T] = sum over nonempty subsets S of
    (-1)^(|S|+1) / P(S) — the sample-size answer to "how long until
    a validation draw covers all classes".  Type counts fold in one
    distributed pass; the 31-subset sum is mirrored driver math."""
    cc = _type_cell_counts(sf_dir, "cell", 1 << 62, None)
    cols = ["n_types", "n_events", "expected_x1e3"]
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in cols})
    byt = cc.groupby("event_type")["c"].sum().sort_index()
    counts = byt.to_numpy(np.int64)
    k = len(counts)
    tot = int(counts.sum())
    if tot == 0 or k == 0 or k > 20:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in cols})
    shares = counts.astype(np.float64) / tot
    exp = 0.0
    for mask in range(1, 1 << k):
        psum = 0.0
        bits = 0
        for i in range(k):
            if mask >> i & 1:
                psum += shares[i]
                bits += 1
        if psum == 0:
            continue
        exp += (1.0 if bits % 2 == 1 else -1.0) / psum
    return pa.table({
        "n_types": pa.array([k], pa.int64()),
        "n_events": pa.array([tot], pa.int64()),
        "expected_x1e3": pa.array(
            [_round_half_away(exp * 1e3)], pa.int64()),
    })


COUPON_SQL = """
WITH tc AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(c) AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM tc
), idx AS MATERIALIZED (
  SELECT event_type, c,
         ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS i
  FROM tc
), subsets AS MATERIALIZED (
  SELECT r.k AS mask,
         SUM(CAST(idx.c AS DOUBLE) / tot.t) AS psum,
         CAST(bit_count(CAST(r.k AS BIGINT)) AS BIGINT) AS bits
  FROM range(1, 1048576) r(k)
  CROSS JOIN tot
  JOIN idx ON ((r.k >> CAST(idx.i AS INTEGER)) & 1) = 1
  WHERE tot.k <= 20 AND r.k < (1 << CAST(tot.k AS INTEGER))
  GROUP BY 1
)
SELECT tot.k AS n_types,
       tot.t AS n_events,
       CAST(ROUND(SUM(CASE WHEN bits % 2 = 1 THEN 1.0
                           ELSE -1.0 END / psum) * 1000, 0)
            AS BIGINT) AS expected_x1e3
FROM subsets CROSS JOIN tot
WHERE psum > 0
GROUP BY tot.k, tot.t
HAVING tot.t > 0 AND tot.k <= 20
"""


def q_freeman_tukey_residual_hours(sf_dir):
    """Freeman-Tukey variance-stabilized Poisson residuals on the
    full event-type x hour-of-day grid: r = sqrt(x) + sqrt(x+1)
    - sqrt(4e + 1) against the type's uniform-across-24h
    expectation — on this scale Poisson cells of any magnitude are
    ~N(0,1) comparable, the honest alternative to raw-count z
    scores.  One distributed count pass; the grid math mirrors
    cell-by-cell."""
    cc = _type_cell_counts(sf_dir, "hod", _HOUR_US, 24)
    cols = ["event_type", "hod", "cnt", "ft_resid_x1e3"]
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in cols[1:]},
        })
    types = sorted(cc["event_type"].unique())
    grid = pd.MultiIndex.from_product(
        [types, range(24)], names=["event_type", "hod"]
    ).to_frame(index=False)
    g = grid.merge(cc, on=["event_type", "hod"], how="left")
    g["c"] = g["c"].fillna(0).astype(np.int64)
    tot = g.groupby("event_type")["c"].transform("sum").to_numpy(
        np.float64)
    x = g["c"].to_numpy(np.float64)
    e = tot / 24.0
    r = np.sqrt(x) + np.sqrt(x + 1.0) - np.sqrt(4.0 * e + 1.0)
    g = g.assign(
        ft=[_round_half_away(v * 1e3) for v in r]
    ).sort_values(["event_type", "hod"], ignore_index=True)
    return pa.table({
        "event_type": pa.array(g["event_type"], pa.string()),
        "hod": pa.array(g["hod"].to_numpy(np.int64)),
        "cnt": pa.array(g["c"].to_numpy(np.int64)),
        "ft_resid_x1e3": pa.array(g["ft"].to_numpy(np.int64)),
    })


FT_RESID_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT event_type,
         (EPOCH_US(ts) // {_HOUR_US}) % 24 AS hod,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), grid AS MATERIALIZED (
  SELECT t.event_type, h.hod, COALESCE(e.c, 0) AS c
  FROM (SELECT DISTINCT event_type FROM e) t
  CROSS JOIN (SELECT CAST(k AS BIGINT) AS hod
              FROM range(0, 24) r(k)) h
  LEFT JOIN e ON e.event_type = t.event_type AND e.hod = h.hod
), tt AS MATERIALIZED (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS tot
  FROM grid GROUP BY 1
)
SELECT g.event_type, g.hod, g.c AS cnt,
       CAST(ROUND((SQRT(CAST(g.c AS DOUBLE))
              + SQRT(CAST(g.c AS DOUBLE) + 1.0)
              - SQRT(4.0 * (CAST(tt.tot AS DOUBLE) / 24.0) + 1.0))
            * 1000, 0) AS BIGINT) AS ft_resid_x1e3
FROM grid g JOIN tt USING (event_type)
ORDER BY g.event_type, g.hod
"""


def register_r4fu(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "gap_autocorr_lag1": q_gap_autocorr_lag1,
            "coupon_collector_types": q_coupon_collector_types,
            "freeman_tukey_residual_hours":
                q_freeman_tukey_residual_hours,
        }
    )
    oracles.update(
        {
            "gap_autocorr_lag1": GAP_AC_SQL,
            "coupon_collector_types": COUPON_SQL,
            "freeman_tukey_residual_hours": FT_RESID_SQL,
        }
    )
