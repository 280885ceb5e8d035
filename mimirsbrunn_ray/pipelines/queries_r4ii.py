"""Round-4 batch II: variance homogeneity and momentum — the
Levene test of value spread weekend-vs-weekday (do weekends
change the VOLATILITY of event value, not just its level), the
Bartlett test of value variance across event types (built
entirely from exact integer moment sums — the
variance-pooling-legality check before any ANOVA), and the
longest DAU rise/fall streaks (how many consecutive days has
daily activity ever kept climbing — the momentum record, on the
dense zero-filled day grid).

Exactness discipline: group means come from exact mill sums;
Bartlett runs wholly on exact (n, Σv, Σv²); streaks are exact
integer comparisons on the dense grid; Levene's second pass
mirrors double ops."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _round_half_away,
)
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _mills(arr) -> np.ndarray:
    v = arr.cast(pa.float64()).to_numpy(zero_copy_only=False)
    return np.where(v >= 0, np.floor(v * 1000 + 0.5),
                    np.ceil(v * 1000 - 0.5)).astype(np.int64)


_LVW_COLS = ["n_weekend", "n_weekday", "levene_w_x1e3",
             "sd_ratio_x1e3"]


def q_levene_value_by_weekpart(sf_dir):
    """Do weekends change value VOLATILITY?  Levene's W
    (mean-centered) between weekend and weekday event values —
    significant W with a flat mean means the risk, not the
    level, moves on weekends; the sd ratio shows direction.
    Pass 1 folds exact mill sums for group means; pass 2 folds
    the absolute-deviation sums with those means broadcast."""
    path = f"{sf_dir}/events.parquet"
    ev = rd.read_parquet(path, columns=["ts", "value"])

    def pass1(b: pa.Table) -> pa.Table:
        b = _valid(b, ("ts", "value"))
        if b.num_rows == 0:
            return pa.table({
                "we": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "ss": pa.array([], pa.int64()),
            })
        us = b["ts"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        we = ((us // _DAY_US + 4) % 7 >= 5).astype(np.int64)
        v = _mills(b["value"])
        df = pd.DataFrame({"we": we, "n": 1, "s": v,
                           "ss": v * v})
        agg = df.groupby("we").sum().reset_index()
        for c in ["we", "n", "s", "ss"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb1(b: pa.Table) -> pa.Table:
        g = b.group_by(["we"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("ss", "sum")])
        return g.rename_columns(["we", "n", "s", "ss"])

    g1 = tree_merge(
        ev.map_batches(pass1, batch_format="pyarrow",
                       batch_size=None), comb1).to_pandas()
    if "we" not in g1.columns or len(g1) < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LVW_COLS})
    g1 = g1.set_index("we")
    if 0 not in g1.index or 1 not in g1.index:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LVW_COLS})
    means = {w: float(g1.loc[w, "s"]) / float(g1.loc[w, "n"])
             for w in (0, 1)}

    def pass2(b: pa.Table) -> pa.Table:
        b = _valid(b, ("ts", "value"))
        if b.num_rows == 0:
            return pa.table({
                "we": pa.array([], pa.int64()),
                "sz": pa.array([], pa.float64()),
                "szz": pa.array([], pa.float64()),
            })
        us = b["ts"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        we = ((us // _DAY_US + 4) % 7 >= 5).astype(np.int64)
        v = _mills(b["value"]).astype(np.float64)
        mu = np.where(we == 1, means[1], means[0])
        z = np.abs(v - mu)
        df = pd.DataFrame({"we": we, "sz": z, "szz": z * z})
        agg = df.groupby("we").sum().reset_index()
        agg["we"] = agg["we"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb2(b: pa.Table) -> pa.Table:
        g = b.group_by(["we"]).aggregate(
            [("sz", "sum"), ("szz", "sum")])
        return g.rename_columns(["we", "sz", "szz"])

    g2 = tree_merge(
        ev.map_batches(pass2, batch_format="pyarrow",
                       batch_size=None), comb2).to_pandas()
    if "we" not in g2.columns or len(g2) < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LVW_COLS})
    g2 = g2.set_index("we")
    n0, n1 = int(g1.loc[0, "n"]), int(g1.loc[1, "n"])
    N = n0 + n1
    if n0 < 2 or n1 < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LVW_COLS})
    zb = {w: float(g2.loc[w, "sz"]) / float(g1.loc[w, "n"])
          for w in (0, 1)}
    zbar = (float(g2.loc[0, "sz"]) + float(g2.loc[1, "sz"])) / N
    num = (n0 * (zb[0] - zbar) ** 2 + n1 * (zb[1] - zbar) ** 2)
    den = ((float(g2.loc[0, "szz"]) - n0 * zb[0] * zb[0])
           + (float(g2.loc[1, "szz"]) - n1 * zb[1] * zb[1]))
    if den <= 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LVW_COLS})
    w_stat = (N - 2) / 1.0 * num / den
    var0 = (float(g1.loc[0, "ss"]) / n0 - means[0] * means[0])
    var1 = (float(g1.loc[1, "ss"]) / n1 - means[1] * means[1])
    if var0 <= 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LVW_COLS})
    return pa.table({
        "n_weekend": pa.array([n1], pa.int64()),
        "n_weekday": pa.array([n0], pa.int64()),
        "levene_w_x1e3": pa.array(
            [_round_half_away(w_stat * 1e3)], pa.int64()),
        "sd_ratio_x1e3": pa.array(
            [_round_half_away(np.sqrt(var1 / var0) * 1e3)],
            pa.int64()),
    })


LVW_SQL = f"""
WITH v AS MATERIALIZED (
  SELECT CASE WHEN ((EPOCH_US(ts) // {_DAY_US}) + 4) % 7 >= 5
              THEN 1 ELSE 0 END AS we,
         CAST(ROUND(value * 1000, 0) AS BIGINT) AS m
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
), g1 AS MATERIALIZED (
  SELECT we, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(m) AS BIGINT) AS s,
         CAST(SUM(m * m) AS BIGINT) AS ss
  FROM v GROUP BY 1
), mu AS MATERIALIZED (
  SELECT we, CAST(s AS DOUBLE) / n AS mean FROM g1
), z AS MATERIALIZED (
  SELECT v.we, ABS(CAST(v.m AS DOUBLE) - mu.mean) AS z
  FROM v JOIN mu USING (we)
), g2 AS MATERIALIZED (
  SELECT we, SUM(z) AS sz, SUM(z * z) AS szz
  FROM z GROUP BY 1
), wide AS MATERIALIZED (
  SELECT
    (SELECT n FROM g1 WHERE we = 0) AS n0,
    (SELECT n FROM g1 WHERE we = 1) AS n1,
    (SELECT sz FROM g2 WHERE we = 0) AS sz0,
    (SELECT sz FROM g2 WHERE we = 1) AS sz1,
    (SELECT szz FROM g2 WHERE we = 0) AS szz0,
    (SELECT szz FROM g2 WHERE we = 1) AS szz1,
    (SELECT CAST(ss AS DOUBLE) / n
            - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)
     FROM g1 WHERE we = 0) AS var0,
    (SELECT CAST(ss AS DOUBLE) / n
            - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)
     FROM g1 WHERE we = 1) AS var1
), calc AS MATERIALIZED (
  SELECT n0, n1,
         sz0 / n0 AS zb0, sz1 / n1 AS zb1,
         (sz0 + sz1) / (n0 + n1) AS zbar,
         szz0 - n0 * (sz0 / n0) * (sz0 / n0) AS d0,
         szz1 - n1 * (sz1 / n1) * (sz1 / n1) AS d1,
         var0, var1
  FROM wide
)
SELECT CAST(n1 AS BIGINT) AS n_weekend,
       CAST(n0 AS BIGINT) AS n_weekday,
       CAST(ROUND((n0 + n1 - 2) / 1.0
            * (n0 * (zb0 - zbar) * (zb0 - zbar)
               + n1 * (zb1 - zbar) * (zb1 - zbar))
            / (d0 + d1) * 1000, 0) AS BIGINT)
         AS levene_w_x1e3,
       CAST(ROUND(SQRT(var1 / var0) * 1000, 0) AS BIGINT)
         AS sd_ratio_x1e3
FROM calc
WHERE n0 >= 2 AND n1 >= 2 AND d0 + d1 > 0 AND var0 > 0
"""

_BTL_COLS = ["n_types", "n_events", "bartlett_chi2_x1e3"]


def q_bartlett_value_by_type(sf_dir):
    """May variances pool?  Bartlett's chi-square across event
    types on value — computed ENTIRELY from exact integer
    (n, Σv, Σv²) per type (sample variances, the standard
    correction factor), so both engines see bit-identical
    inputs.  Reject before running any pooled-variance ANOVA."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "value"))
        if b.num_rows == 0:
            return pa.table({
                "et": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "ss": pa.array([], pa.int64()),
            })
        v = _mills(b["value"])
        df = pd.DataFrame({
            "et": np.asarray(
                b["event_type"].to_numpy(zero_copy_only=False)),
            "n": 1, "s": v, "ss": v * v,
        })
        agg = df.groupby("et").sum().reset_index()
        for c in ["n", "s", "ss"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["et"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("ss", "sum")])
        return g.rename_columns(["et", "n", "s", "ss"])

    gg = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "et" not in gg.columns or len(gg) < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BTL_COLS})
    gg = gg.sort_values("et")
    gg = gg[gg["n"] >= 2]
    k = len(gg)
    if k < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BTL_COLS})
    n = gg["n"].to_numpy(np.int64).astype(np.float64)
    s = gg["s"].to_numpy(np.int64).astype(np.float64)
    ss = gg["ss"].to_numpy(np.int64).astype(np.float64)
    var = (ss - s * s / n) / (n - 1.0)
    if (var <= 0).any():
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BTL_COLS})
    N = n.sum()
    sp2 = ((n - 1.0) * var).sum() / (N - k)
    chi2 = ((N - k) * np.log(sp2)
            - ((n - 1.0) * np.log(var)).sum())
    corr = 1.0 + (((1.0 / (n - 1.0)).sum() - 1.0 / (N - k))
                  / (3.0 * (k - 1.0)))
    stat = chi2 / corr
    return pa.table({
        "n_types": pa.array([k], pa.int64()),
        "n_events": pa.array([int(N)], pa.int64()),
        "bartlett_chi2_x1e3": pa.array(
            [_round_half_away(stat * 1e3)], pa.int64()),
    })


BTL_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type AS et,
         CAST(ROUND(value * 1000, 0) AS BIGINT) AS m
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), g AS MATERIALIZED (
  SELECT et, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(m) AS BIGINT) AS s,
         CAST(SUM(m * m) AS BIGINT) AS ss
  FROM v GROUP BY 1
  HAVING COUNT(*) >= 2
), vv AS MATERIALIZED (
  SELECT et, n,
         (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
           / (n - 1.0) AS var
  FROM g
), agg AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS bign,
         SUM((n - 1.0) * var) AS sw,
         SUM((n - 1.0) * LN(var)) AS slog,
         SUM(1.0 / (n - 1.0)) AS sinv,
         MIN(var) AS minvar
  FROM vv
)
SELECT k AS n_types, bign AS n_events,
       CAST(ROUND(((bign - k) * LN(sw / (bign - k)) - slog)
            / (1.0 + ((sinv - 1.0 / (bign - k))
                      / (3.0 * (k - 1.0)))) * 1000, 0)
            AS BIGINT) AS bartlett_chi2_x1e3
FROM agg
WHERE k >= 2 AND minvar > 0
"""

_DRS_COLS = ["n_days", "longest_rise", "longest_fall",
             "n_rise_days"]


def q_longest_dau_rise_streak(sf_dir):
    """The momentum record: on the dense zero-filled day grid,
    the longest run of strictly increasing daily event counts,
    the longest strictly decreasing run, and the total number of
    up-days — how long has growth ever sustained day over day.
    Daily counts fold exactly; streaks are integer
    comparisons."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table({
                "day": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        us = b["ts"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        day = (us // _DAY_US).astype(np.int64)
        t = pa.table({
            "day": pa.array(day),
            "n": pa.array(np.ones(len(day), np.int64)),
        })
        g = t.group_by(["day"]).aggregate([("n", "sum")])
        return g.rename_columns(["day", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["day"]).aggregate([("n", "sum")])
        return g.rename_columns(["day", "n"])

    dc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "day" not in dc.columns or len(dc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DRS_COLS})
    d0, d1 = int(dc["day"].min()), int(dc["day"].max())
    full = np.zeros(d1 - d0 + 1, np.int64)
    for _, r in dc.iterrows():
        full[int(r["day"]) - d0] = int(r["n"])
    if len(full) < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DRS_COLS})
    diff = np.diff(full)

    def longest(mask: np.ndarray) -> int:
        best = cur = 0
        for f in mask:
            cur = cur + 1 if f else 0
            best = max(best, cur)
        return best

    return pa.table({
        "n_days": pa.array([len(full)], pa.int64()),
        "longest_rise": pa.array(
            [longest(diff > 0)], pa.int64()),
        "longest_fall": pa.array(
            [longest(diff < 0)], pa.int64()),
        "n_rise_days": pa.array(
            [int((diff > 0).sum())], pa.int64()),
    })


DRS_SQL = f"""
WITH RECURSIVE dc AS MATERIALIZED (
  SELECT EPOCH_US(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1
), span AS MATERIALIZED (
  SELECT MIN(day) AS d0, MAX(day) AS d1 FROM dc
), days AS (
  SELECT d0 AS day FROM span WHERE d0 IS NOT NULL
  UNION ALL
  SELECT day + 1 FROM days
  WHERE day + 1 <= (SELECT d1 FROM span)
), fl AS MATERIALIZED (
  SELECT days.day, COALESCE(dc.n, 0) AS n
  FROM days LEFT JOIN dc USING (day)
), dd AS MATERIALIZED (
  SELECT day, n - LAG(n) OVER (ORDER BY day) AS d
  FROM fl
  QUALIFY d IS NOT NULL
), rz AS MATERIALIZED (
  SELECT day,
         CASE WHEN d > 0 THEN 1 ELSE 0 END AS up,
         CASE WHEN d < 0 THEN 1 ELSE 0 END AS dn,
         day - SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END)
               OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
           AS gu,
         day - SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END)
               OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
           AS gd
  FROM dd
), rises AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS len
  FROM rz WHERE up = 1 GROUP BY gu
), falls AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS len
  FROM rz WHERE dn = 1 GROUP BY gd
)
SELECT (SELECT CAST(d1 - d0 + 1 AS BIGINT) FROM span)
         AS n_days,
       COALESCE((SELECT CAST(MAX(len) AS BIGINT) FROM rises),
                0) AS longest_rise,
       COALESCE((SELECT CAST(MAX(len) AS BIGINT) FROM falls),
                0) AS longest_fall,
       (SELECT CAST(SUM(up) AS BIGINT) FROM rz)
         AS n_rise_days
FROM span
WHERE d1 - d0 + 1 >= 2
"""


def register_r4ii(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "levene_value_by_weekpart":
                q_levene_value_by_weekpart,
            "bartlett_value_by_type": q_bartlett_value_by_type,
            "longest_dau_rise_streak":
                q_longest_dau_rise_streak,
        }
    )
    oracles.update(
        {
            "levene_value_by_weekpart": LVW_SQL,
            "bartlett_value_by_type": BTL_SQL,
            "longest_dau_rise_streak": DRS_SQL,
        }
    )
