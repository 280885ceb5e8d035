"""Round-4 batch FX: backlog dynamics, overdispersion, and
concentration — a Lindley-recursion backlog audit per event type
(single-server queue at capacity = ceil(mean hourly load): how deep
and how long would a fixed-rate consumer fall behind this stream?),
the multinomial dispersion index of daily type mixes (are days
noisier than iid sampling explains — the burstiness test for
composition, not volume), and the Hoover + Rosenbluth concentration
panel of per-user event mass (the two standard indices Gini
doesn't subsume).

Exactness discipline: the Lindley recursion is PURE INTEGER (max,
add) evaluated in the same hour order by numpy scan and recursive
CTE; dispersion folds integer cells through the identical X^2
closed form; Hoover/Rosenbluth are exact count ratios (the
rank-weighted Rosenbluth sum is tie-invariant)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _HOUR_US,
    _round_half_away,
    _type_cell_counts,
)
from mimirsbrunn_ray.pipelines.queries_r4fl import (
    _dense_hour_counts,
)
from mimirsbrunn_ray.stages.rollup import tree_merge

_LINDLEY_COLS = ["event_type", "capacity", "max_backlog",
                 "final_backlog", "backlog_hours"]


def q_lindley_backlog_hourly(sf_dir):
    """Lindley backlog recursion per event type on the dense hourly
    grid: a consumer draining exactly capacity = ceil(total /
    n_hours) events per hour accumulates W_{h+1} = max(0, W_h +
    c_h - capacity) — the integer-exact answer to "if we provision
    for the MEAN rate, how deep and how long does the backlog get?"
    (the backpressure question behind every fixed-size ingest
    pool).  Counts fold in one distributed pass; the scan is
    integer on both engines."""
    g = _dense_hour_counts(sf_dir)
    if g is None:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64())
               for c in _LINDLEY_COLS[1:]},
        })
    out = {c: [] for c in _LINDLEY_COLS}
    for et, sub in g.groupby("event_type", sort=True):
        c = sub.sort_values("hour")["c"].to_numpy(np.int64)
        T = len(c)
        total = int(c.sum())
        if T == 0 or total == 0:
            continue
        cap = (total + T - 1) // T
        w = 0
        wmax = 0
        nz = 0
        for v in c:
            w = max(0, w + int(v) - cap)
            if w > 0:
                nz += 1
            if w > wmax:
                wmax = w
        out["event_type"].append(et)
        out["capacity"].append(cap)
        out["max_backlog"].append(wmax)
        out["final_backlog"].append(w)
        out["backlog_hours"].append(nz)
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        **{c: pa.array(out[c], pa.int64())
           for c in _LINDLEY_COLS[1:]},
    })


LINDLEY_SQL = f"""
WITH RECURSIVE hc AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) // {_HOUR_US} AS hour,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT MIN(hour) AS hmin, MAX(hour) AS hmax FROM hc
), grid AS MATERIALIZED (
  SELECT t.event_type, s.hmin + r.k AS hour,
         CAST(r.k + 1 AS BIGINT) AS rn,
         COALESCE(hc.c, 0) AS c
  FROM (SELECT DISTINCT event_type FROM hc) t
  CROSS JOIN span s
  JOIN range(0, 100000) r(k) ON s.hmin + r.k <= s.hmax
  LEFT JOIN hc ON hc.event_type = t.event_type
              AND hc.hour = s.hmin + r.k
), caps AS MATERIALIZED (
  SELECT event_type,
         CAST((SUM(c) + COUNT(*) - 1) // COUNT(*) AS BIGINT)
           AS cap,
         CAST(SUM(c) AS BIGINT) AS total
  FROM grid GROUP BY 1
), rec AS (
  SELECT g.event_type, g.rn,
         GREATEST(CAST(0 AS BIGINT), g.c - caps.cap) AS w,
         GREATEST(CAST(0 AS BIGINT), g.c - caps.cap) AS wmax,
         CASE WHEN g.c - caps.cap > 0 THEN 1 ELSE 0 END AS nz
  FROM grid g JOIN caps USING (event_type)
  WHERE g.rn = 1
  UNION ALL
  SELECT g.event_type, g.rn,
         GREATEST(CAST(0 AS BIGINT), rec.w + g.c - caps.cap),
         GREATEST(rec.wmax,
                  GREATEST(CAST(0 AS BIGINT),
                           rec.w + g.c - caps.cap)),
         rec.nz + CASE WHEN rec.w + g.c - caps.cap > 0
                       THEN 1 ELSE 0 END
  FROM grid g
  JOIN rec ON g.event_type = rec.event_type
          AND g.rn = rec.rn + 1
  JOIN caps ON caps.event_type = g.event_type
), fin AS (
  SELECT event_type, rn, w, wmax, nz,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY rn DESC) AS rr
  FROM rec
)
SELECT f.event_type,
       caps.cap AS capacity,
       CAST(f.wmax AS BIGINT) AS max_backlog,
       CAST(f.w AS BIGINT) AS final_backlog,
       CAST(f.nz AS BIGINT) AS backlog_hours
FROM fin f JOIN caps USING (event_type)
WHERE f.rr = 1 AND caps.total > 0
ORDER BY f.event_type
"""

_DISP_COLS = ["n_days", "n_types", "x2_x1e3", "dispersion_x1e3"]


def q_multinomial_dispersion_daily(sf_dir):
    """Multinomial dispersion index of the daily event-type mix:
    X^2 = sum over (day, type) of (c - e)^2 / e with e = day total
    x global type share, divided by its (D-1)(k-1) degrees of
    freedom — ~1 when each day draws its mix iid from the global
    composition, >1 when the COMPOSITION itself drifts day to day
    (volume-independent burstiness).  One distributed count pass;
    mirrored closed-form fold."""
    cc = _type_cell_counts(sf_dir, "day", _DAY_US, None)
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DISP_COLS})
    piv = cc.pivot_table(index="day", columns="event_type",
                         values="c", aggfunc="sum", fill_value=0)
    m = piv.to_numpy(np.float64)
    D, k = m.shape
    if D < 2 or k < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DISP_COLS})
    n_d = m.sum(axis=1)
    tot = m.sum()
    n_t = m.sum(axis=0)
    # same op order as the oracle: (n_d * n_t) / tot per cell
    e = n_d[:, None] * n_t[None, :] / tot
    mask = e > 0
    x2 = float(((m[mask] - e[mask]) ** 2 / e[mask]).sum())
    disp = x2 / ((D - 1) * (k - 1))
    return pa.table({
        "n_days": pa.array([D], pa.int64()),
        "n_types": pa.array([k], pa.int64()),
        "x2_x1e3": pa.array(
            [_round_half_away(x2 * 1e3)], pa.int64()),
        "dispersion_x1e3": pa.array(
            [_round_half_away(disp * 1e3)], pa.int64()),
    })


DISP_SQL = f"""
WITH dc AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), grid AS MATERIALIZED (
  SELECT d.day, t.event_type, COALESCE(dc.c, 0) AS c
  FROM (SELECT DISTINCT day FROM dc) d
  CROSS JOIN (SELECT DISTINCT event_type FROM dc) t
  LEFT JOIN dc USING (day, event_type)
), dims AS MATERIALIZED (
  SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS d,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k,
         CAST(SUM(c) AS BIGINT) AS tot
  FROM grid
), dt AS MATERIALIZED (
  SELECT day, CAST(SUM(c) AS BIGINT) AS n_d FROM grid GROUP BY 1
), tt AS MATERIALIZED (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_t
  FROM grid GROUP BY 1
), x2 AS (
  SELECT SUM(CASE WHEN dt.n_d * tt.n_t > 0 THEN
           (g.c - CAST(dt.n_d AS DOUBLE) * tt.n_t / dims.tot)
           * (g.c - CAST(dt.n_d AS DOUBLE) * tt.n_t / dims.tot)
           / (CAST(dt.n_d AS DOUBLE) * tt.n_t / dims.tot)
         ELSE 0 END) AS x2
  FROM grid g
  JOIN dt USING (day) JOIN tt USING (event_type)
  CROSS JOIN dims
)
SELECT dims.d AS n_days,
       dims.k AS n_types,
       CAST(ROUND(x2.x2 * 1000, 0) AS BIGINT) AS x2_x1e3,
       CAST(ROUND(x2.x2 / ((dims.d - 1) * (dims.k - 1)) * 1000,
            0) AS BIGINT) AS dispersion_x1e3
FROM x2 CROSS JOIN dims
WHERE dims.d >= 2 AND dims.k >= 2
"""

_CONC_COLS = ["n_users", "hoover_ppm", "rosenbluth_x1e6"]


def q_hoover_rosenbluth_users(sf_dir):
    """Concentration panel of per-user event mass: the Hoover
    (Robin Hood) index 0.5 * sum |p_i - 1/n| — the share of
    activity that would have to move between users to equalize —
    and the Rosenbluth index 1 / (2 * sum_i i * p_(i) - 1) over
    descending shares, which unlike HHI keys on RANKS and so sees
    the long tail.  Per-user counts fold in one distributed pass;
    both indices are exact count ratios."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["user_id"]))
        g = b.group_by(["user_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "c"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id"]).aggregate([("c", "sum")])
        return g.rename_columns(["user_id", "c"])

    uc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["user_id"],
    ).to_pandas()
    if "user_id" not in uc.columns or len(uc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _CONC_COLS})
    c = uc["c"].to_numpy(np.int64)
    n = len(c)
    tot = int(c.sum())
    if tot == 0:
        return pa.table(
            {c_: pa.array([], pa.int64()) for c_ in _CONC_COLS})
    p = c.astype(np.float64) / tot
    hoover = 0.5 * float(np.abs(p - 1.0 / n).sum())
    ps = np.sort(p)[::-1]
    ranks = np.arange(1, n + 1, dtype=np.float64)
    rb_den = 2.0 * float((ranks * ps).sum()) - 1.0
    if rb_den == 0:
        return pa.table(
            {c_: pa.array([], pa.int64()) for c_ in _CONC_COLS})
    rb = 1.0 / rb_den
    return pa.table({
        "n_users": pa.array([n], pa.int64()),
        "hoover_ppm": pa.array(
            [_round_half_away(hoover * 1e6)], pa.int64()),
        "rosenbluth_x1e6": pa.array(
            [_round_half_away(rb * 1e6)], pa.int64()),
    })


HOOVER_SQL = """
WITH uc AS MATERIALIZED (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE user_id IS NOT NULL
  GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(c) AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM uc
), rk AS MATERIALIZED (
  SELECT CAST(c AS DOUBLE) / tot.t AS p,
         ROW_NUMBER() OVER (ORDER BY c DESC, user_id) AS i,
         tot.n AS n
  FROM uc CROSS JOIN tot
)
SELECT tot.n AS n_users,
       CAST(ROUND(0.5 * SUM(ABS(rk.p - 1.0 / rk.n)) * 1000000,
            0) AS BIGINT) AS hoover_ppm,
       CAST(ROUND(1.0 / (2.0 * SUM(rk.i * rk.p) - 1.0)
            * 1000000, 0) AS BIGINT) AS rosenbluth_x1e6
FROM rk CROSS JOIN tot
GROUP BY tot.n, tot.t
HAVING tot.t > 0 AND 2.0 * SUM(rk.i * rk.p) - 1.0 <> 0
"""


def register_r4fx(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "lindley_backlog_hourly": q_lindley_backlog_hourly,
            "multinomial_dispersion_daily":
                q_multinomial_dispersion_daily,
            "hoover_rosenbluth_users": q_hoover_rosenbluth_users,
        }
    )
    oracles.update(
        {
            "lindley_backlog_hourly": LINDLEY_SQL,
            "multinomial_dispersion_daily": DISP_SQL,
            "hoover_rosenbluth_users": HOOVER_SQL,
        }
    )
