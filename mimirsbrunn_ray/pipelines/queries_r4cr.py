"""Round-4 batch CR: negative-binomial fit of per-user event counts,
Taylor's power-law (fluctuation scaling) slope over daily counts, and
the Wald-Wolfowitz up/down runs test for series randomness.

Exactness discipline: per-user counts / daily counts / run counts fold
exact int64 (user totals complete inside their hash bucket; the runs
scan rides the shared series-bucket idiom); final fits / slopes /
z-scores are single mirrored double expressions, x1e6 snap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge
from mimirsbrunn_ray.stages.timeseries import (
    _project_series,
    _round_half_away_x,
    _series_segments,
)

_DAY_US = 86_400_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


def _clean(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# negative-binomial method-of-moments fit of per-user event counts
# ---------------------------------------------------------------------------


def q_negbin_fit_user_counts(sf_dir):
    """One-row method-of-moments negative-binomial fit of per-user event
    counts — r = mean² / (var - mean) and p = mean / var, the
    overdispersed count model used when per-entity activity is burstier
    than Poisson (var > mean; the fit is NULL otherwise). Per-user
    totals are complete inside their hash bucket (one user-key
    shuffle); the second-level moments (n_users, sum c, sum c²) fold
    exact int64; r and p are mirrored doubles, x1e6 snap."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["user_id"]))
        t = pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "c": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        return add_bucket(_sum_by(t, ["user_id"], ["c"]), "user_id", 64)

    bucketed = ev.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_users": pd.Series([], dtype=np.int64),
                "s1": pd.Series([], dtype=np.int64),
                "s2": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        per = g.groupby("user_id", sort=False)["c"].sum().to_numpy(
            dtype=np.int64
        )
        return pd.DataFrame(
            {
                "n_users": [len(per)],
                "s1": [int(per.sum())],
                "s2": [int((per * per).sum())],
            }
        )

    parts = bucketed.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    ).to_pandas()

    if not len(parts) or "n_users" not in parts.columns:
        return pa.table(
            {
                "n_users": pa.array([0], pa.int64()),
                "r_x1e6": pa.array([None], pa.int64()),
                "p_x1e6": pa.array([None], pa.int64()),
            }
        )
    n = int(parts["n_users"].sum())
    s1 = int(parts["s1"].sum())
    s2 = int(parts["s2"].sum())
    if n < 2:
        r_val = p_val = None
    else:
        mean = float(s1) / n
        var = (float(s2) - float(s1) * s1 / n) / (n - 1)
        if var <= mean or mean == 0.0:
            r_val = p_val = None
        else:
            r_val = int(
                _round_half_away(np.array([mean * mean / (var - mean) * 1e6]))[0]
            )
            p_val = int(_round_half_away(np.array([mean / var * 1e6]))[0])
    return pa.table(
        {
            "n_users": pa.array([n], pa.int64()),
            "r_x1e6": pa.array([r_val], pa.int64()),
            "p_x1e6": pa.array([p_val], pa.int64()),
        }
    )


NEGBIN_SQL = """
WITH per AS MATERIALIZED (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
), a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM per
)
SELECT n AS n_users,
       CASE WHEN n < 2
              OR (s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)
                 <= CAST(s1 AS DOUBLE) / n
              OR CAST(s1 AS DOUBLE) / n = 0
            THEN NULL
            ELSE CAST(ROUND(
              (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
              / ((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)
                 - CAST(s1 AS DOUBLE) / n)
              * 1000000, 0) AS BIGINT) END AS r_x1e6,
       CASE WHEN n < 2
              OR (s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)
                 <= CAST(s1 AS DOUBLE) / n
              OR CAST(s1 AS DOUBLE) / n = 0
            THEN NULL
            ELSE CAST(ROUND(
              (CAST(s1 AS DOUBLE) / n)
              / ((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))
              * 1000000, 0) AS BIGINT) END AS p_x1e6
FROM a
"""


# ---------------------------------------------------------------------------
# Taylor's power law: log(var) vs log(mean) of daily counts across types
# ---------------------------------------------------------------------------


def q_taylor_law_daily_counts(sf_dir):
    """One-row fluctuation-scaling statistic: the least-squares slope of
    log(variance) on log(mean) of DAILY event counts, one point per
    event type — Taylor's power law (slope 1 = Poisson-like, 2 =
    synchronized bursts; empirical systems land in between). Daily
    counts per (type, day) fold exact int64 over the dense day span
    (gap days = 0 via exact span arithmetic); each type's (mean, var)
    comes from exact sums; the 5-point log-log regression is a mirrored
    double fold, x1e6 snap, NULL under 2 usable types."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        d = (us // _DAY_US).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "d": pa.array(d),
                "c": pa.array(np.ones(len(d), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "d"], ["c"])

    daily = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "d"], ["c"]),
    ).to_pandas()  # bounded: types x days

    if not len(daily) or "event_type" not in daily.columns:
        return pa.table(
            {
                "n_types": pa.array([0], pa.int64()),
                "slope_x1e6": pa.array([None], pa.int64()),
            }
        )
    pts = []
    for et, g in daily.sort_values(["event_type", "d"]).groupby(
        "event_type", sort=True
    ):
        c = g["c"].to_numpy(dtype=np.int64)
        nb = int(g["d"].max()) - int(g["d"].min()) + 1
        if nb < 2:
            continue
        sc = int(c.sum())
        sc2 = int((c * c).sum())
        mean = float(sc) / nb
        var = (float(sc2) - float(sc) * sc / nb) / (nb - 1)
        if mean <= 0.0 or var <= 0.0:
            continue
        pts.append((np.log(mean), np.log(var)))
    k = len(pts)
    if k < 2:
        return pa.table(
            {
                "n_types": pa.array([k], pa.int64()),
                "slope_x1e6": pa.array([None], pa.int64()),
            }
        )
    lx = np.array([p[0] for p in pts])
    ly = np.array([p[1] for p in pts])
    sxx = float(np.sum(lx * lx)) - float(np.sum(lx)) * np.sum(lx) / k
    sxy = float(np.sum(lx * ly)) - float(np.sum(lx)) * np.sum(ly) / k
    slope = (
        None
        if sxx == 0.0
        else int(_round_half_away(np.array([sxy / sxx * 1e6]))[0])
    )
    return pa.table(
        {
            "n_types": pa.array([k], pa.int64()),
            "slope_x1e6": pa.array([slope], pa.int64()),
        }
    )


TAYLOR_SQL = """
WITH c AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 86400000000) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), a AS MATERIALIZED (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS sc,
         CAST(SUM(c * c) AS BIGINT) AS sc2,
         CAST(MAX(d) - MIN(d) + 1 AS BIGINT) AS nb
  FROM c GROUP BY 1
), pts AS MATERIALIZED (
  SELECT LN(CAST(sc AS DOUBLE) / nb) AS lx,
         LN((sc2 - CAST(sc AS DOUBLE) * sc / nb) / (nb - 1)) AS ly
  FROM a
  WHERE nb >= 2 AND CAST(sc AS DOUBLE) / nb > 0
    AND (sc2 - CAST(sc AS DOUBLE) * sc / nb) / (nb - 1) > 0
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         SUM(lx) AS sx, SUM(ly) AS sy,
         SUM(lx * lx) AS sxx, SUM(lx * ly) AS sxy
  FROM pts
)
SELECT k AS n_types,
       CASE WHEN k < 2 OR sxx - sx * sx / k = 0 THEN NULL
            ELSE CAST(ROUND((sxy - sx * sy / k) / (sxx - sx * sx / k)
                 * 1000000, 0) AS BIGINT) END AS slope_x1e6
FROM s
"""


# ---------------------------------------------------------------------------
# Wald-Wolfowitz up/down runs test per event type
# ---------------------------------------------------------------------------


def q_updown_runs_test(sf_dir):
    """Per event type: the up/down runs test of series randomness — the
    ordered x100 value series maps to a sign sequence of its NONZERO
    adjacent differences; R = number of maximal same-direction runs,
    compared against the i.i.d. expectation E[R] = (2m - 1) / 3 and
    variance (16m - 29) / 90 (m = usable diffs) for the classic
    z-score (|z| > ~2 = trend or oscillation, not noise). One
    series-key hash shuffle; runs count exactly via vectorized sign
    compares; z is one mirrored double per type, x1e6 snap."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    proj = _project_series(ev, "event_type", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "m": pd.Series([], dtype=np.int64),
                "runs": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "event_type", "ts", "event_id")
        x = _round_half_away_x(g["value"].to_numpy(dtype=np.float64), 100.0)
        rows = {"event_type": [], "m": [], "runs": []}
        keys = g["event_type"].to_numpy()
        starts = np.flatnonzero(~same)
        bounds = np.append(starts, len(g))
        for i in range(len(starts)):
            lo, hi = bounds[i], bounds[i + 1]
            xs = x[lo:hi]
            dx = np.diff(xs)
            sgn = np.sign(dx)
            sgn = sgn[sgn != 0]  # ties drop (classic treatment)
            m = len(sgn)
            runs = 0 if m == 0 else 1 + int(np.sum(sgn[1:] != sgn[:-1]))
            rows["event_type"].append(keys[lo])
            rows["m"].append(m)
            rows["runs"].append(runs)
        return pd.DataFrame(rows).astype({"m": np.int64, "runs": np.int64})

    stats = (
        proj.groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )  # bounded: one row per type
    if not len(stats) or "event_type" not in stats.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "m": pa.array([], pa.int64()),
                "runs": pa.array([], pa.int64()),
                "z_x1e6": pa.array([], pa.int64()),
            }
        )
    stats = stats.sort_values("event_type", ignore_index=True)
    zs = []
    for i in range(len(stats)):
        m = int(stats["m"].iloc[i])
        r = int(stats["runs"].iloc[i])
        if m < 2 or 16 * m - 29 <= 0:
            zs.append(None)
            continue
        z = (r - (2.0 * m - 1) / 3) / np.sqrt((16.0 * m - 29) / 90)
        zs.append(int(_round_half_away(np.array([z * 1e6]))[0]))
    return pa.table(
        {
            "event_type": pa.array(stats["event_type"].tolist(), pa.string()),
            "m": pa.array(stats["m"].to_numpy(dtype=np.int64)),
            "runs": pa.array(stats["runs"].to_numpy(dtype=np.int64)),
            "z_x1e6": pa.array(zs, pa.int64()),
        }
    )


UPDOWN_RUNS_SQL = """
WITH v AS (
  SELECT event_type, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), d AS (
  SELECT event_type, ts, event_id,
         SIGN(x - LAG(x) OVER (PARTITION BY event_type
                               ORDER BY ts, event_id)) AS s
  FROM v
), nz AS (
  SELECT event_type, s,
         LAG(s) OVER (PARTITION BY event_type
                      ORDER BY ts, event_id) AS prev_s
  FROM d WHERE s IS NOT NULL AND s <> 0
), a AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(CASE WHEN prev_s IS NULL OR s <> prev_s THEN 1 ELSE 0 END)
              AS BIGINT) AS runs
  FROM nz GROUP BY 1
)
SELECT event_type, m, runs,
       CASE WHEN m < 2 OR 16 * m - 29 <= 0 THEN NULL
            ELSE CAST(ROUND(
              (runs - (2.0 * m - 1) / 3) / SQRT((16.0 * m - 29) / 90)
              * 1000000, 0) AS BIGINT) END AS z_x1e6
FROM a ORDER BY 1
"""


def register_r4cr(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "negbin_fit_user_counts": q_negbin_fit_user_counts,
            "taylor_law_daily_counts": q_taylor_law_daily_counts,
            "updown_runs_test": q_updown_runs_test,
        }
    )
    oracles.update(
        {
            "negbin_fit_user_counts": NEGBIN_SQL,
            "taylor_law_daily_counts": TAYLOR_SQL,
            "updown_runs_test": UPDOWN_RUNS_SQL,
        }
    )
