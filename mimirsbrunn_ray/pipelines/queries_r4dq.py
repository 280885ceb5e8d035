"""Round-4 batch DQ: nonparametric dependence and trend tests —
Blomqvist's beta on the lag-1 value pairs, the paired sign test between
day halves, and Page's L trend test for ordered hour effects.

Exactness discipline: medians select by integer cross-multiplication
over the x100 histogram; quadrant and sign counts are exact int64 over
compares of identical values; Page's ranks reuse the closed counting
formula over identical cell means; the final z-scores are mirrored
doubles with exact-integer moments, x1e6 snap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET
from mimirsbrunn_ray.stages.rollup import tree_merge
from mimirsbrunn_ray.stages.timeseries import (
    _project_series,
    _round_half_away_x,
    _series_segments,
)

_HOUR_US = 3_600_000_000
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
# Blomqvist's beta between consecutive values (lag-1 quadrant test)
# ---------------------------------------------------------------------------


def q_blomqvist_beta_lag1(sf_dir):
    """Per event type: Blomqvist's beta (the medial correlation) between
    consecutive ordered values — classify each (x_{t-1}, x_t) pair by
    which side of the TYPE MEDIAN each member falls (pairs touching the
    median drop), beta = (same-side - opposite-side) / total — the
    median-based dependence test that is immune to any monotone
    transformation and to outliers (the robust cousin of the lag-1
    autocorrelation). The median is PERCENTILE_DISC-selected by integer
    cross-multiplication; quadrant counts are exact int64; one mirrored
    ratio per type, x1e6 snap."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )

    def hpartial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "value"))
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "x": pa.array(x),
                "c": pa.array(np.ones(len(x), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "x"], ["c"])

    hist = tree_merge(
        ev.map_batches(hpartial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "x"], ["c"]),
    ).to_pandas()
    if not len(hist) or "event_type" not in hist.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_pairs": pa.array([], pa.int64()),
                "beta_x1e6": pa.array([], pa.int64()),
            }
        )
    med = {}
    for et, g in hist.sort_values(["event_type", "x"]).groupby(
        "event_type", sort=True
    ):
        xs = g["x"].to_numpy(dtype=np.int64)
        cs = g["c"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cs)
        n = int(cum[-1])
        med[et] = int(xs[int(np.argmax(2 * cum >= n))])

    proj = _project_series(ev, "event_type", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "same": pd.Series([], dtype=np.int64),
                "opp": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same_mask = _series_segments(g, "event_type", "ts", "event_id")
        x = _round_half_away_x(g["value"].to_numpy(dtype=np.float64), 100.0)
        et = g["event_type"].to_numpy()
        m = pd.Series(et).map(med).to_numpy(dtype=np.int64)
        s_now = np.sign(x - m)
        s_prev = np.zeros(len(g), dtype=np.int64)
        s_prev[1:] = s_now[:-1]
        valid = same_mask & (s_now != 0)
        valid[1:] &= s_prev[1:] != 0
        valid[0] = False
        conc = (s_now * s_prev > 0) & valid
        disc = (s_now * s_prev < 0) & valid
        d = pd.DataFrame(
            {
                "event_type": et,
                "same": conc.astype(np.int64),
                "opp": disc.astype(np.int64),
            }
        )
        a = d.groupby("event_type", sort=False)[["same", "opp"]].sum()
        return a.reset_index().astype({"same": np.int64, "opp": np.int64})

    agg = tree_merge(
        proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas"),
        lambda b: _sum_by(b, ["event_type"], ["same", "opp"]),
    ).to_pandas()
    if not len(agg) or "event_type" not in agg.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_pairs": pa.array([], pa.int64()),
                "beta_x1e6": pa.array([], pa.int64()),
            }
        )
    agg = agg.sort_values("event_type", ignore_index=True)
    same = agg["same"].to_numpy(dtype=np.int64)
    opp = agg["opp"].to_numpy(dtype=np.int64)
    tot = same + opp
    betas = [
        None
        if tot[i] == 0
        else int(
            _round_half_away(
                np.array([float(same[i] - opp[i]) / tot[i] * 1e6])
            )[0]
        )
        for i in range(len(agg))
    ]
    return pa.table(
        {
            "event_type": pa.array(agg["event_type"].tolist(), pa.string()),
            "n_pairs": pa.array(tot),
            "beta_x1e6": pa.array(betas, pa.int64()),
        }
    )


BLOMQVIST_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), med AS MATERIALIZED (
  SELECT event_type,
         CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY x) AS BIGINT)
           AS med
  FROM v GROUP BY 1
), lagd AS (
  SELECT v.event_type,
         SIGN(v.x - med.med) AS s_now,
         SIGN(LAG(v.x) OVER (PARTITION BY v.event_type
                             ORDER BY v.ts, v.event_id) - med.med) AS s_prev
  FROM v JOIN med ON med.event_type = v.event_type
), c AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN s_now * s_prev > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS same,
         CAST(SUM(CASE WHEN s_now * s_prev < 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS opp
  FROM lagd WHERE s_prev IS NOT NULL AND s_now <> 0 AND s_prev <> 0
  GROUP BY 1
)
SELECT event_type, same + opp AS n_pairs,
       CASE WHEN same + opp = 0 THEN NULL
            ELSE CAST(ROUND(CAST(same - opp AS DOUBLE) / (same + opp)
                 * 1000000, 0) AS BIGINT) END AS beta_x1e6
FROM c ORDER BY 1
"""


# ---------------------------------------------------------------------------
# paired sign test between day halves
# ---------------------------------------------------------------------------


def q_sign_test_day_halves(sf_dir):
    """Per event type: the paired SIGN TEST comparing each hour-of-day's
    mean value in the FIRST half of the observed days against the same
    hour in the SECOND half (24 natural pairs; ties drop) — the
    assumption-free "did the diurnal level shift" check, z = (2k - m) /
    sqrt(m) over exact sign counts. The half split is exact integer day
    arithmetic (day < midpoint day); hour means divide identical exact
    integers so the sign compares agree bit-for-bit."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def span_partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        if len(us) == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        d = us // _DAY_US
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "lo": pa.array([int(d.min())], pa.int64()),
                "hi": pa.array([int(d.max())], pa.int64()),
            }
        )

    span = tree_merge(
        ev.map_batches(span_partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["k"]).aggregate([("lo", "min"), ("hi", "max")])
        .select(["k", "lo_min", "hi_max"]).rename_columns(["k", "lo", "hi"]),
    ).to_pandas()
    if not len(span):
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "m_pairs": pa.array([], pa.int64()),
                "z_x1e6": pa.array([], pa.int64()),
            }
        )
    lo = int(span["lo"].iloc[0])
    hi = int(span["hi"].iloc[0])
    mid = lo + (hi - lo + 1) // 2  # first half: day < mid

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        d = (us // _DAY_US).astype(np.int64)
        h = ((us // _HOUR_US) % 24).astype(np.int64)
        half = (d >= mid).astype(np.int64)
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "half": pa.array(half),
                "h": pa.array(h),
                "s": pa.array(x),
                "c": pa.array(np.ones(len(x), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "half", "h"], ["s", "c"])

    cells = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "half", "h"], ["s", "c"]),
    ).to_pandas()  # bounded: types x 2 x 24
    if not len(cells) or "event_type" not in cells.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "m_pairs": pa.array([], pa.int64()),
                "z_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "m_pairs": [], "z_x1e6": []}
    for et, g in cells.sort_values(["event_type", "half", "h"]).groupby(
        "event_type", sort=True
    ):
        a = g[g["half"] == 0].set_index("h")
        b_ = g[g["half"] == 1].set_index("h")
        common = sorted(set(a.index) & set(b_.index))
        k = 0
        m = 0
        for h in common:
            ma = float(a.loc[h, "s"]) / int(a.loc[h, "c"])
            mb = float(b_.loc[h, "s"]) / int(b_.loc[h, "c"])
            if mb > ma:
                k += 1
                m += 1
            elif mb < ma:
                m += 1
        out["event_type"].append(et)
        out["m_pairs"].append(m)
        out["z_x1e6"].append(
            None
            if m == 0
            else int(
                _round_half_away(
                    np.array([(2.0 * k - m) / np.sqrt(float(m)) * 1e6])
                )[0]
            )
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "m_pairs": pa.array(out["m_pairs"], pa.int64()),
            "z_x1e6": pa.array(out["z_x1e6"], pa.int64()),
        }
    )


SIGN_TEST_SQL = """
WITH span AS MATERIALIZED (
  SELECT MIN(EPOCH_US(ts) // 86400000000) AS lo,
         MIN(EPOCH_US(ts) // 86400000000)
           + (MAX(EPOCH_US(ts) // 86400000000)
              - MIN(EPOCH_US(ts) // 86400000000) + 1) // 2 AS mid
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
), cell AS MATERIALIZED (
  SELECT event_type,
         CASE WHEN EPOCH_US(ts) // 86400000000 >= span.mid
              THEN 1 ELSE 0 END AS half,
         hour(ts) AS h,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events, span
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2, 3
), pairs AS (
  SELECT a.event_type,
         CAST(b.s AS DOUBLE) / b.c AS mb, CAST(a.s AS DOUBLE) / a.c AS ma
  FROM (SELECT * FROM cell WHERE half = 0) a
  JOIN (SELECT * FROM cell WHERE half = 1) b
    ON b.event_type = a.event_type AND b.h = a.h
), agg AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN mb > ma THEN 1 ELSE 0 END) AS BIGINT) AS k,
         CAST(SUM(CASE WHEN mb <> ma THEN 1 ELSE 0 END) AS BIGINT) AS m
  FROM pairs GROUP BY 1
)
SELECT event_type, m AS m_pairs,
       CASE WHEN m = 0 THEN NULL
            ELSE CAST(ROUND((2.0 * k - m) / SQRT(CAST(m AS DOUBLE))
                 * 1000000, 0) AS BIGINT) END AS z_x1e6
FROM agg ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Page's L trend test: ordered hour effect blocked by day-of-week
# ---------------------------------------------------------------------------


def q_page_trend_hour_by_dow(sf_dir):
    """Per event type: Page's L trend test — using the Friedman rank
    matrix (hours ranked within each dow block by mean value), L =
    sum_h (h + 1) * R_h tests the ORDERED alternative "values rise
    through the day", which Friedman's omnibus chi-square cannot see;
    z = (L - E[L]) / sd with the exact closed-form null moments E[L] =
    n k (k + 1)² / 4 and Var[L] = n k² (k + 1) (k² - 1) / 144. Cell
    means divide identical exact integers; rank averaging uses the same
    counting formula as the Friedman query; NULL unless the full
    24 x 7 grid is populated. x1e6 snap."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        h = ((us // _HOUR_US) % 24).astype(np.int64)
        d = ((np.floor_divide(us, _DAY_US) + 4) % 7).astype(np.int64)
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "h": pa.array(h),
                "d": pa.array(d),
                "s": pa.array(x),
                "c": pa.array(np.ones(len(x), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "h", "d"], ["s", "c"])

    cells = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "h", "d"], ["s", "c"]),
    ).to_pandas()
    if not len(cells) or "event_type" not in cells.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_cells": pa.array([], pa.int64()),
                "z_x1e6": pa.array([], pa.int64()),
            }
        )
    K, NBLK = 24, 7
    out = {"event_type": [], "n_cells": [], "z_x1e6": []}
    for et, g in cells.sort_values(["event_type", "d", "h"]).groupby(
        "event_type", sort=True
    ):
        out["event_type"].append(et)
        out["n_cells"].append(len(g))
        if len(g) != K * NBLK:
            out["z_x1e6"].append(None)
            continue
        m = g["s"].to_numpy(dtype=np.float64) / g["c"].to_numpy(dtype=np.int64)
        hcol = g["h"].to_numpy(dtype=np.int64)
        dcol = g["d"].to_numpy(dtype=np.int64)
        rsum = np.zeros(K, dtype=np.float64)
        for d in range(NBLK):
            sel = dcol == d
            mv = m[sel]
            hv = hcol[sel]
            below = (mv[:, None] > mv[None, :]).sum(axis=1)
            ties = (mv[:, None] == mv[None, :]).sum(axis=1)
            ranks = below + (ties + 1) / 2.0
            rsum[hv] += ranks
        L = float(np.sum((np.arange(K) + 1) * rsum))
        e_l = NBLK * K * (K + 1) * (K + 1) / 4.0
        var_l = NBLK * K * K * (K + 1) * (K * K - 1) / 144.0
        z = (L - e_l) / np.sqrt(var_l)
        out["z_x1e6"].append(int(_round_half_away(np.array([z * 1e6]))[0]))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_cells": pa.array(out["n_cells"], pa.int64()),
            "z_x1e6": pa.array(out["z_x1e6"], pa.int64()),
        }
    )


PAGE_SQL = """
WITH cell AS MATERIALIZED (
  SELECT event_type, hour(ts) AS h, dayofweek(ts) AS d,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2, 3
), m AS MATERIALIZED (
  SELECT event_type, h, d, CAST(s AS DOUBLE) / c AS x FROM cell
), r AS MATERIALIZED (
  SELECT a.event_type, a.h, a.d,
         SUM(CASE WHEN b.x < a.x THEN 1 ELSE 0 END)
           + (SUM(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) + 1) / 2.0 AS rank
  FROM m a JOIN m b ON b.event_type = a.event_type AND b.d = a.d
  GROUP BY 1, 2, 3
), nc AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cells FROM m GROUP BY 1
), l AS (
  SELECT event_type, SUM((h + 1) * rank) AS l FROM r GROUP BY 1
)
SELECT nc.event_type, nc.n_cells,
       CASE WHEN nc.n_cells <> 168 THEN NULL
            ELSE CAST(ROUND(
              (l.l - 7 * 24 * 25 * 25 / 4.0)
              / SQRT(7 * 24 * 24 * 25 * (24 * 24 - 1) / 144.0)
              * 1000000, 0) AS BIGINT) END AS z_x1e6
FROM nc JOIN l ON l.event_type = nc.event_type
ORDER BY 1
"""


def register_r4dq(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "blomqvist_beta_lag1": q_blomqvist_beta_lag1,
            "sign_test_day_halves": q_sign_test_day_halves,
            "page_trend_hour_by_dow": q_page_trend_hour_by_dow,
        }
    )
    oracles.update(
        {
            "blomqvist_beta_lag1": BLOMQVIST_SQL,
            "sign_test_day_halves": SIGN_TEST_SQL,
            "page_trend_hour_by_dow": PAGE_SQL,
        }
    )
