"""Round-4 batch EL: Wilder's RSI(14) as an exact integer recursion,
jackknife variance of the daily value/count ratio estimator, and
Sample Entropy (m=1) of the dense hourly count series.

Exactness discipline: RSI's Wilder smoothing runs as an integer floor
recursion (state x1e6, AG_t = (13*AG + 14*g)/14 floored) mirrored by
a recursive SQL CTE, so the terminal gain/loss states compare as
exact int64 and only the closing 100*AG/(AG+AL) is snapped; the
jackknife snaps each leave-one-day-out ratio x1e9 BEFORE the integer
moment sums (sum in int64, sum of squares in int128) so the variance
algebra sees identical inputs; SampEn's template-match counts A and B
are pure integers with the tolerance r derived from exact
PERCENTILE_DISC-rank quartiles, and the -ln(A/B) close is snapped
x1e6 (the registry's accepted ln discipline)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4eh import (
    _DENSE_GRID_SQL,
    _dense_hourly_matrix,
)
from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


# ---------------------------------------------------------------------------
# Wilder RSI(14) integer recursion
# ---------------------------------------------------------------------------


def q_rsi_wilder_hourly(sf_dir):
    """Per event type: Wilder's RSI(14) at the end of the dense
    hourly count series — the momentum oscillator, computed as an
    EXACT integer recursion: gains/losses scale x1e6, the seed is the
    floored 14-bar average, and each Wilder step is
    AG_t = (13*AG_{t-1} + g_t) // 14 (floor; all terms nonnegative).
    A recursive SQL CTE replays the identical recursion, so the
    terminal AG/AL states are bit-equal int64 and only the closing
    RSI = 100*AG/(AG+AL) ratio is snapped x1e6."""
    types, mat, _hmin = _dense_hourly_matrix(sf_dir)
    cols = ["event_type", "t_len", "ag_final", "al_final", "rsi_x1e6"]
    out = {c: [] for c in cols}
    if mat is not None:
        n = mat.shape[1]
        for i, t in enumerate(types):
            y = mat[i]
            if n < 16:
                continue
            d = y[1:] - y[:-1]
            g = np.maximum(d, 0).astype(np.int64) * 1_000_000
            ls = np.maximum(-d, 0).astype(np.int64) * 1_000_000
            ag = int(np.sum(g[:14])) // 14
            al = int(np.sum(ls[:14])) // 14
            for j in range(14, len(g)):
                ag = (13 * ag + int(g[j])) // 14
                al = (13 * al + int(ls[j])) // 14
            rsi = (
                None
                if ag + al == 0
                else _round_half_away(
                    100.0 * float(ag) / (float(ag) + float(al)) * 1e6
                )
            )
            out["event_type"].append(t)
            out["t_len"].append(n)
            out["ag_final"].append(ag)
            out["al_final"].append(al)
            out["rsi_x1e6"].append(rsi)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


RSI_SQL = (
    "WITH RECURSIVE "
    + _DENSE_GRID_SQL.strip()[4:]  # drop the leading "WITH"
    + """
, seq AS MATERIALIZED (
  SELECT event_type,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS i, c
  FROM dense WINDOW w AS (PARTITION BY event_type ORDER BY h)
), gl AS MATERIALIZED (
  SELECT event_type, i,
         GREATEST(c - LAG(c) OVER w2, 0) * 1000000 AS gs,
         GREATEST(LAG(c) OVER w2 - c, 0) * 1000000 AS ls
  FROM seq WINDOW w2 AS (PARTITION BY event_type ORDER BY i)
), nmax AS MATERIALIZED (
  SELECT event_type, MAX(i) AS n FROM seq GROUP BY 1 HAVING MAX(i) >= 16
), seed AS MATERIALIZED (
  SELECT g.event_type,
         CAST(SUM(g.gs) // 14 AS BIGINT) AS ag,
         CAST(SUM(g.ls) // 14 AS BIGINT) AS al
  FROM gl g JOIN nmax n ON n.event_type = g.event_type
  WHERE g.i BETWEEN 2 AND 15
  GROUP BY 1
), rec AS (
  SELECT event_type, CAST(15 AS BIGINT) AS i, ag, al FROM seed
  UNION ALL
  SELECT r.event_type, g.i,
         CAST((13 * r.ag + g.gs) // 14 AS BIGINT),
         CAST((13 * r.al + g.ls) // 14 AS BIGINT)
  FROM rec r
  JOIN gl g ON g.event_type = r.event_type AND g.i = r.i + 1
)
SELECT r.event_type, n.n AS t_len, r.ag AS ag_final, r.al AS al_final,
       CASE WHEN r.ag + r.al > 0 THEN
         CAST(ROUND(100.0 * CAST(r.ag AS DOUBLE)
              / (CAST(r.ag AS DOUBLE) + CAST(r.al AS DOUBLE))
              * 1000000.0, 0) AS BIGINT)
       END AS rsi_x1e6
FROM rec r JOIN nmax n ON n.event_type = r.event_type AND r.i = n.n
ORDER BY 1
"""
)


# ---------------------------------------------------------------------------
# Jackknife variance of the daily ratio estimator
# ---------------------------------------------------------------------------


def q_jackknife_ratio_variance(sf_dir):
    """Per event type: the delete-one-DAY jackknife variance of the
    ratio estimator R = (total value cents) / (total events) — the
    resampling method made exact: day totals (Y_d, N_d) are exact
    ints, each leave-one-out ratio snaps x1e9 to an integer r_d, and
    the variance folds from sum(r_d) (int64) and sum(r_d^2) (int128)
    so the classic (D-1)/D * (S2 - S1^2/D) algebra sees identical
    inputs on both sides. One bounded (type x day) grain."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    import pandas as pd
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"])),
            pc.is_valid(b["value"]),
        )
        b = b.filter(m)
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        v = b["value"].to_numpy(zero_copy_only=False)
        cents = np.where(
            v >= 0, np.floor(v * 100 + 0.5), np.ceil(v * 100 - 0.5)
        ).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "day": pa.array((us // _DAY_US).astype(np.int64)),
                "y": pa.array(cents),
                "one": pa.array(np.ones(len(cents), np.int64)),
            }
        )
        g = t.group_by(["event_type", "day"]).aggregate(
            [("y", "sum"), ("one", "sum")]
        )
        return g.rename_columns(["event_type", "day", "y", "n"])

    days = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["event_type", "day"])
        .aggregate([("y", "sum"), ("n", "sum")])
        .rename_columns(["event_type", "day", "y", "n"]),
    ).to_pandas()
    cols = ["event_type", "n_days", "ratio_x1e6", "jk_se_x1e9"]
    out = {c: [] for c in cols}
    if len(days) and "event_type" in days.columns:
        days = days.groupby(["event_type", "day"], as_index=False)[
            ["y", "n"]
        ].sum()
        for t in sorted(days["event_type"].unique()):
            sub = days[days["event_type"] == t]
            yv = sub["y"].to_numpy(dtype=np.int64)
            nv = sub["n"].to_numpy(dtype=np.int64)
            sy, sn = int(yv.sum()), int(nv.sum())
            keep = sn - nv > 0
            yv, nv = yv[keep], nv[keep]
            d_cnt = len(yv)
            if d_cnt < 2 or sn == 0:
                continue
            r = [
                _round_half_away(
                    float(sy - int(yy)) / float(sn - int(nn)) * 1e9
                )
                for yy, nn in zip(yv, nv)
            ]
            s1 = sum(r)
            s2 = sum(x * x for x in r)  # python int: 128-bit safe
            df = float(d_cnt)
            var = (
                (df - 1.0)
                / df
                * (float(s2) - float(s1) * float(s1) / df)
                / 1e18
            )
            se = None
            if var > 0.0:
                se = _round_half_away(np.sqrt(var) * 1e9)
            out["event_type"].append(t)
            out["n_days"].append(d_cnt)
            out["ratio_x1e6"].append(
                _round_half_away(float(sy) / float(sn) * 1e6)
            )
            out["jk_se_x1e9"].append(se)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


JACKKNIFE_SQL = """
WITH d AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 86400000000) AS BIGINT) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS y,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), tot AS MATERIALIZED (
  SELECT event_type, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(n) AS BIGINT) AS sn
  FROM d GROUP BY 1
), r AS MATERIALIZED (
  SELECT d.event_type,
         CAST(ROUND(CAST(t.sy - d.y AS DOUBLE)
              / CAST(t.sn - d.n AS DOUBLE) * 1000000000, 0) AS BIGINT)
           AS r
  FROM d JOIN tot t ON t.event_type = d.event_type
  WHERE t.sn - d.n > 0
), mom AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS dd,
         CAST(SUM(r) AS BIGINT) AS s1,
         SUM(CAST(r AS HUGEINT) * CAST(r AS HUGEINT)) AS s2
  FROM r GROUP BY 1
)
SELECT m.event_type, m.dd AS n_days,
       CAST(ROUND(CAST(t.sy AS DOUBLE) / CAST(t.sn AS DOUBLE)
            * 1000000, 0) AS BIGINT) AS ratio_x1e6,
       CASE WHEN (CAST(m.dd AS DOUBLE) - 1.0) / CAST(m.dd AS DOUBLE)
                 * (CAST(m.s2 AS DOUBLE)
                    - CAST(m.s1 AS DOUBLE) * CAST(m.s1 AS DOUBLE)
                      / CAST(m.dd AS DOUBLE)) / 1e18 > 0.0 THEN
         CAST(ROUND(SQRT((CAST(m.dd AS DOUBLE) - 1.0)
              / CAST(m.dd AS DOUBLE)
              * (CAST(m.s2 AS DOUBLE)
                 - CAST(m.s1 AS DOUBLE) * CAST(m.s1 AS DOUBLE)
                   / CAST(m.dd AS DOUBLE)) / 1e18) * 1000000000, 0)
              AS BIGINT)
       END AS jk_se_x1e9
FROM mom m JOIN tot t ON t.event_type = m.event_type
WHERE m.dd >= 2 AND t.sn > 0
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Sample Entropy (m = 1) of the dense hourly count series
# ---------------------------------------------------------------------------


def q_sample_entropy_hourly(sf_dir):
    """Per event type: Sample Entropy SampEn(m=1, r) of the dense
    hourly counts — the regularity measure: -ln(A/B) with B the
    count of value pairs within tolerance r and A the count whose
    successors also match. Tolerance r = max(1, IQR // 5) from exact
    PERCENTILE_DISC-rank quartiles of the integer series, so A and B
    are pure integer counts (vectorized pair sweep over the bounded
    time-span grain); the ln close is snapped x1e6."""
    types, mat, _hmin = _dense_hourly_matrix(sf_dir)
    cols = ["event_type", "t_len", "r_tol", "n_b", "n_a",
            "sampen_x1e6"]
    out = {c: [] for c in cols}
    if mat is not None:
        n = mat.shape[1]
        for i, t in enumerate(types):
            y = mat[i]
            if n < 3:
                continue
            ys = np.sort(y)
            q1 = int(ys[(n + 3) // 4 - 1])  # ceil(n/4)-th smallest
            q3 = int(ys[(3 * n + 3) // 4 - 1])  # ceil(3n/4)-th
            r = max(1, (q3 - q1) // 5)
            head = y[:-1]
            diff = np.abs(head[None, :] - head[:, None])
            iu = np.triu_indices(n - 1, 1)
            m1 = diff[iu] <= r
            b_cnt = int(np.sum(m1))
            nxt = y[1:]
            diff2 = np.abs(nxt[None, :] - nxt[:, None])
            a_cnt = int(np.sum(m1 & (diff2[iu] <= r)))
            se = None
            if a_cnt > 0 and b_cnt > 0:
                se = _round_half_away(
                    -np.log(float(a_cnt) / float(b_cnt)) * 1e6
                )
            out["event_type"].append(t)
            out["t_len"].append(n)
            out["r_tol"].append(r)
            out["n_b"].append(b_cnt)
            out["n_a"].append(a_cnt)
            out["sampen_x1e6"].append(se)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


SAMPEN_SQL = (
    _DENSE_GRID_SQL
    + """
, seq AS MATERIALIZED (
  SELECT event_type, h, c,
         LEAD(c) OVER (PARTITION BY event_type ORDER BY h) AS c_next,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM dense
), quart AS MATERIALIZED (
  SELECT event_type,
         MAX(CASE WHEN rn = (n + 3) // 4 THEN c END) AS q1,
         MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN c END) AS q3,
         MAX(n) AS n
  FROM (
    SELECT event_type, c, n,
           CAST(ROW_NUMBER() OVER
                (PARTITION BY event_type ORDER BY c) AS BIGINT) AS rn
    FROM seq
  ) GROUP BY 1
), tol AS MATERIALIZED (
  SELECT event_type, n, GREATEST(1, (q3 - q1) // 5) AS r
  FROM quart WHERE n >= 3
), pairs AS (
  SELECT a.event_type,
         CAST(SUM(CASE WHEN ABS(a.c - b.c) <= t.r THEN 1 ELSE 0 END)
              AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN ABS(a.c - b.c) <= t.r
                        AND ABS(a.c_next - b.c_next) <= t.r
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         MAX(t.n) AS n, MAX(t.r) AS r
  FROM seq a
  JOIN seq b ON a.event_type = b.event_type AND a.h < b.h
  JOIN tol t ON t.event_type = a.event_type
  WHERE a.c_next IS NOT NULL AND b.c_next IS NOT NULL
  GROUP BY 1
)
SELECT event_type, n AS t_len, CAST(r AS BIGINT) AS r_tol, n_b, n_a,
       CASE WHEN n_a > 0 AND n_b > 0 THEN
         CAST(ROUND(-LN(CAST(n_a AS DOUBLE) / CAST(n_b AS DOUBLE))
              * 1000000.0, 0) AS BIGINT)
       END AS sampen_x1e6
FROM pairs ORDER BY 1
"""
)


def register_r4el(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "rsi_wilder_hourly": q_rsi_wilder_hourly,
            "jackknife_ratio_variance": q_jackknife_ratio_variance,
            "sample_entropy_hourly": q_sample_entropy_hourly,
        }
    )
    oracles.update(
        {
            "rsi_wilder_hourly": RSI_SQL,
            "jackknife_ratio_variance": JACKKNIFE_SQL,
            "sample_entropy_hourly": SAMPEN_SQL,
        }
    )
