"""Round-4 batch FK: multiple-testing and robust-trend census —
Benjamini-Hochberg FDR selection of anomalous (type, hour-of-day)
cells under Poisson Chernoff tail p-values, the Siegel repeated-
median slope of each type's hourly count series (the
breakdown-point-0.5 robust trend), and day-over-day Kendall ranking
stability of the event-type leaderboard (exact discordant-pair
counts, integer math only).

Exactness discipline: the BH cutoff is applied by VALUE (p <=
p_(i_max)), never by rank, so equal p-values can't straddle the
boundary; Chernoff p = exp(x*ln(e/x) + x - e) uses the identical
elementary-function formula on both sides over a full type x 24-hour
grid; Siegel medians use interpolating (mean-of-two-middles)
medians on both sides; Kendall discordance is a pure integer sign
product over type pairs present on both days."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000
_BH_Q = 0.05


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _type_cell_counts(sf_dir, expr_col: str, divisor: int,
                      mod: int | None) -> pd.DataFrame:
    """Distributed (event_type, cell) counts where cell =
    (epoch_us // divisor) [% mod].  One partial-count pass, tree-
    merged; the result is #types x #cells small."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        cell = pc.divide(us, divisor)
        if mod is not None:
            cell = pc.subtract(
                cell, pc.multiply(pc.divide(cell, mod), mod))
        t = pa.table({"event_type": b["event_type"],
                      expr_col: cell})
        g = t.group_by(["event_type", expr_col]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", expr_col, "c"])

    def comb(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "event_type" not in b.column_names:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                expr_col: pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            })
        g = b.group_by(["event_type", expr_col]).aggregate(
            [("c", "sum")])
        return g.rename_columns(["event_type", expr_col, "c"])

    return tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()


def q_bh_fdr_hour_anomalies(sf_dir):
    """Benjamini-Hochberg selection (q = 0.05) of (event_type,
    hour-of-day) cells whose count is anomalously ABOVE the type's
    uniform-across-24h expectation, using the Poisson Chernoff upper
    tail p = exp(x*ln(e/x) + x - e) (p = 1 when x <= e).  The test
    family is the full type x 24 grid (absent cells count as x = 0),
    and inclusion is by p-value against the BH step-up cutoff value.
    Counts are one distributed pass; the 120-cell BH step is driver
    math."""
    cc = _type_cell_counts(sf_dir, "hod", _HOUR_US, 24)
    cols = ["event_type", "hod", "cnt", "p_ppm", "sig"]
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in cols[1:]},
        })
    types = sorted(cc["event_type"].unique())
    grid = pd.MultiIndex.from_product(
        [types, range(24)], names=["event_type", "hod"]
    ).to_frame(index=False)
    cc = grid.merge(cc, on=["event_type", "hod"], how="left")
    cc["c"] = cc["c"].fillna(0).astype(np.int64)
    tot = cc.groupby("event_type")["c"].transform("sum").to_numpy(
        dtype=np.float64)
    x = cc["c"].to_numpy(dtype=np.float64)
    e = tot / 24.0
    with np.errstate(divide="ignore", invalid="ignore"):
        p = np.where(
            (x > e) & (e > 0),
            np.exp(x * np.log(e / x) + x - e),
            1.0,
        )
    m = len(cc)
    order = np.argsort(p, kind="mergesort")
    ps = p[order]
    ranks = np.arange(1, m + 1, dtype=np.float64)
    ok = ps <= ranks * _BH_Q / m
    if ok.any():
        p_cut = ps[np.flatnonzero(ok).max()]
        sig = (p <= p_cut).astype(np.int64)
    else:
        sig = np.zeros(m, dtype=np.int64)
    cc = cc.assign(
        p_ppm=[_round_half_away(v * 1e6) for v in p], sig=sig
    ).sort_values(["event_type", "hod"], ignore_index=True)
    return pa.table({
        "event_type": pa.array(cc["event_type"], pa.string()),
        "hod": pa.array(cc["hod"].to_numpy(np.int64)),
        "cnt": pa.array(cc["c"].to_numpy(np.int64)),
        "p_ppm": pa.array(cc["p_ppm"].to_numpy(np.int64)),
        "sig": pa.array(cc["sig"].to_numpy(np.int64)),
    })


BH_SQL = f"""
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
), pv AS MATERIALIZED (
  SELECT event_type, hod, c,
         CASE WHEN CAST(c AS DOUBLE) > tot / 24.0 AND tot > 0
              THEN EXP(CAST(c AS DOUBLE)
                       * LN((tot / 24.0) / CAST(c AS DOUBLE))
                       + CAST(c AS DOUBLE) - tot / 24.0)
              ELSE 1.0 END AS p
  FROM (SELECT event_type, hod, c,
               CAST(SUM(c) OVER (PARTITION BY event_type) AS DOUBLE)
                 AS tot
        FROM grid)
), rk AS MATERIALIZED (
  SELECT event_type, hod, c, p,
         ROW_NUMBER() OVER (ORDER BY p, event_type, hod) AS rn,
         COUNT(*) OVER () AS m
  FROM pv
), cut AS MATERIALIZED (
  SELECT MAX(p) AS p_cut
  FROM rk WHERE p <= rn * {_BH_Q} / m
)
SELECT event_type,
       hod,
       c AS cnt,
       CAST(ROUND(p * 1000000, 0) AS BIGINT) AS p_ppm,
       CAST(CASE WHEN cut.p_cut IS NOT NULL AND p <= cut.p_cut
                 THEN 1 ELSE 0 END AS BIGINT) AS sig
FROM rk, cut
ORDER BY event_type, hod
"""


def q_siegel_slope_hourly(sf_dir):
    """Siegel repeated-median slope of each event type's hourly
    count series: for each hour i, the median over j != i of the
    pairwise slope (c_j - c_i)/(h_j - h_i); the type's slope is the
    median of those row medians — the classic 50%-breakdown robust
    trend.  Hourly counts are one distributed pass; types are
    bucketed whole and each type's O(n^2) slope matrix is a single
    vectorized outer difference."""
    cc = _type_cell_counts(sf_dir, "hour", _HOUR_US, None)
    cols = ["event_type", "n_hours", "slope_ppm"]
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "n_hours": pa.array([], pa.int64()),
            "slope_ppm": pa.array([], pa.int64()),
        })
    out = {"event_type": [], "n_hours": [], "slope_ppm": []}
    for et, g in cc.groupby("event_type", sort=True):
        g = g.sort_values("hour", ignore_index=True)
        h = g["hour"].to_numpy(dtype=np.float64)
        c = g["c"].to_numpy(dtype=np.float64)
        n = len(g)
        if n < 2:
            continue
        dh = h[None, :] - h[:, None]
        dc = c[None, :] - c[:, None]
        np.fill_diagonal(dh, np.nan)
        with np.errstate(invalid="ignore"):
            slopes = dc / dh
        row_med = np.nanmedian(slopes, axis=1)
        slope = float(np.median(row_med))
        out["event_type"].append(et)
        out["n_hours"].append(n)
        out["slope_ppm"].append(_round_half_away(slope * 1e6))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_hours": pa.array(out["n_hours"], pa.int64()),
        "slope_ppm": pa.array(out["slope_ppm"], pa.int64()),
    })


SIEGEL_SQL = f"""
WITH hc AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) // {_HOUR_US} AS hour,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), pair AS MATERIALIZED (
  SELECT a.event_type, a.hour AS hi,
         MEDIAN(CAST(b.c - a.c AS DOUBLE)
                / CAST(b.hour - a.hour AS DOUBLE)) AS med_i
  FROM hc a JOIN hc b
    ON a.event_type = b.event_type AND a.hour <> b.hour
  GROUP BY 1, 2
), rm AS MATERIALIZED (
  SELECT event_type, MEDIAN(med_i) AS slope,
         CAST(COUNT(*) AS BIGINT) AS n_hours
  FROM pair GROUP BY 1
)
SELECT event_type, n_hours,
       CAST(ROUND(slope * 1000000, 0) AS BIGINT) AS slope_ppm
FROM rm WHERE n_hours >= 2 ORDER BY event_type
"""


def q_kendall_rank_day_over_day(sf_dir):
    """Day-over-day stability of the event-type leaderboard: for
    each consecutive-day pair, over the event-type pairs present
    (count > 0) on BOTH days, the number of discordant pairs (the
    two types swap order between days), concordant pairs, and the
    discordant share in ppm — an integer-exact Kendall-distance
    census of ranking churn.  One distributed (day, type) count
    pass; the leaderboard comparison is tiny driver math."""
    cc = _type_cell_counts(sf_dir, "day", _DAY_US, None)
    cols = ["day", "n_pairs", "n_disc", "n_conc", "disc_ppm"]
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in cols})
    rows = {c: [] for c in cols}
    by_day = {
        int(d): dict(zip(g["event_type"],
                         g["c"].astype(np.int64)))
        for d, g in cc.groupby("day")
    }
    for d in sorted(by_day):
        if d + 1 not in by_day:
            continue
        a, b = by_day[d], by_day[d + 1]
        common = sorted(set(a) & set(b))
        n_pairs = n_disc = n_conc = 0
        for i in range(len(common)):
            for j in range(i + 1, len(common)):
                ta, tb = common[i], common[j]
                s = (a[ta] - a[tb]) * (b[ta] - b[tb])
                n_pairs += 1
                if s < 0:
                    n_disc += 1
                elif s > 0:
                    n_conc += 1
        if n_pairs == 0:
            continue
        rows["day"].append(d)
        rows["n_pairs"].append(n_pairs)
        rows["n_disc"].append(n_disc)
        rows["n_conc"].append(n_conc)
        rows["disc_ppm"].append(
            _round_half_away(n_disc / n_pairs * 1e6))
    return pa.table(
        {c: pa.array(rows[c], pa.int64()) for c in cols})


KENDALL_DOD_SQL = f"""
WITH dc AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), pp AS MATERIALIZED (
  SELECT a.day, a.event_type AS ta, b.event_type AS tb,
         a.c AS ca, b.c AS cb
  FROM dc a JOIN dc b
    ON a.day = b.day AND a.event_type < b.event_type
)
SELECT CAST(p1.day AS BIGINT) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN (p1.ca - p1.cb) * (p2.ca - p2.cb) < 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_disc,
       CAST(SUM(CASE WHEN (p1.ca - p1.cb) * (p2.ca - p2.cb) > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_conc,
       CAST(ROUND(CAST(SUM(CASE WHEN (p1.ca - p1.cb)
                                     * (p2.ca - p2.cb) < 0
                                THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*) * 1000000, 0) AS BIGINT) AS disc_ppm
FROM pp p1
JOIN pp p2 ON p2.day = p1.day + 1
          AND p2.ta = p1.ta AND p2.tb = p1.tb
GROUP BY 1 ORDER BY day
"""


def register_r4fk(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "bh_fdr_hour_anomalies": q_bh_fdr_hour_anomalies,
            "siegel_slope_hourly": q_siegel_slope_hourly,
            "kendall_rank_day_over_day": q_kendall_rank_day_over_day,
        }
    )
    oracles.update(
        {
            "bh_fdr_hour_anomalies": BH_SQL,
            "siegel_slope_hourly": SIEGEL_SQL,
            "kendall_rank_day_over_day": KENDALL_DOD_SQL,
        }
    )
