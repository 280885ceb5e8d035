"""Round-4 batch CZ: robust location/shape/influence diagnostics —
Huber one-step M-estimator via median/MAD clipping, Bowley quartile
skewness, and the maximum Cook's distance over the hourly-mean trend
fit.

Exactness discipline: medians/quartiles are PERCENTILE_DISC semantics
selected by exact integer cross-multiplication over the bounded
x100-value histogram (no float CDF); MAD and clip bounds stay integer;
clipped sums fold exact int64; the regression diagnostics divide
identical exact integers into mirrored doubles with argmax on the
SNAPPED statistic, min-hour tie-break.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _round_half_away_x(x: np.ndarray, scale: float) -> np.ndarray:
    y = x * scale
    return np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)).astype(
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


def _value_hist(sf_dir):
    """Exact (type, x100 value, count) histogram — the shared sufficient
    statistic for every order-statistics query here."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
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

    return tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "x"], ["c"]),
    ).to_pandas()  # bounded: types x distinct x100 values


def _disc_quantile(xs: np.ndarray, cs: np.ndarray, num: int, den: int) -> int:
    """PERCENTILE_DISC(num/den): smallest x with den*cdf >= num*n —
    exact integer cross-multiplication, no float CDF."""
    cum = np.cumsum(cs)
    n = int(cum[-1])
    idx = int(np.argmax(den * cum >= num * n))
    return int(xs[idx])


# ---------------------------------------------------------------------------
# Huber one-step M-estimator of location per type
# ---------------------------------------------------------------------------


def q_huber_location_value(sf_dir):
    """Per event type: the one-step Huber M-estimator of location — the
    mean of values CLIPPED to [median - 2 MAD, median + 2 MAD], the
    standard outlier-robust center that converges to the mean on clean
    data but ignores a contaminated tail. Median and MAD come from the
    exact x100 histogram via integer-cross-multiplied PERCENTILE_DISC
    selection; the clip bounds are exact integers so the clipped sum
    folds exact int64; only the final mean divides — mirrored double,
    x1e6 snap (original value units)."""
    hist = _value_hist(sf_dir)
    if not len(hist) or "event_type" not in hist.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "median_e2": pa.array([], pa.int64()),
                "mad_e2": pa.array([], pa.int64()),
                "huber_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {
        "event_type": [],
        "n": [],
        "median_e2": [],
        "mad_e2": [],
        "huber_x1e6": [],
    }
    for et, g in hist.sort_values(["event_type", "x"]).groupby(
        "event_type", sort=True
    ):
        xs = g["x"].to_numpy(dtype=np.int64)
        cs = g["c"].to_numpy(dtype=np.int64)
        n = int(cs.sum())
        med = _disc_quantile(xs, cs, 1, 2)
        # MAD histogram: |x - med| with counts re-aggregated
        dev = np.abs(xs - med)
        order = np.argsort(dev, kind="stable")
        dv = dev[order]
        dc = cs[order]
        # collapse equal deviations
        uniq, inv = np.unique(dv, return_inverse=True)
        agg = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(agg, inv, dc)
        mad = _disc_quantile(uniq, agg, 1, 2)
        lo, hi = med - 2 * mad, med + 2 * mad
        clipped = np.clip(xs, lo, hi)
        s = int(np.sum(clipped * cs))
        out["event_type"].append(et)
        out["n"].append(n)
        out["median_e2"].append(med)
        out["mad_e2"].append(mad)
        out["huber_x1e6"].append(
            int(
                _round_half_away(np.array([float(s) / (100.0 * n) * 1e6]))[0]
            )
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "median_e2": pa.array(out["median_e2"], pa.int64()),
            "mad_e2": pa.array(out["mad_e2"], pa.int64()),
            "huber_x1e6": pa.array(out["huber_x1e6"], pa.int64()),
        }
    )


HUBER_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), med AS MATERIALIZED (
  SELECT event_type,
         CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY x) AS BIGINT)
           AS med
  FROM v GROUP BY 1
), mad AS MATERIALIZED (
  SELECT v.event_type,
         CAST(PERCENTILE_DISC(0.5) WITHIN GROUP
              (ORDER BY ABS(v.x - med.med)) AS BIGINT) AS mad
  FROM v JOIN med ON med.event_type = v.event_type
  GROUP BY 1
)
SELECT v.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       med.med AS median_e2, mad.mad AS mad_e2,
       CAST(ROUND(CAST(SUM(CASE WHEN v.x < med.med - 2 * mad.mad
                                THEN med.med - 2 * mad.mad
                                WHEN v.x > med.med + 2 * mad.mad
                                THEN med.med + 2 * mad.mad
                                ELSE v.x END) AS DOUBLE)
                  / (100.0 * COUNT(*)) * 1000000, 0) AS BIGINT)
         AS huber_x1e6
FROM v
JOIN med ON med.event_type = v.event_type
JOIN mad ON mad.event_type = v.event_type
GROUP BY 1, 3, 4
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Bowley quartile skewness per type
# ---------------------------------------------------------------------------


def q_bowley_skewness_value(sf_dir):
    """Per event type: Bowley's quartile skewness (q3 + q1 - 2 med) /
    (q3 - q1) — the order-statistics skewness that ignores tails
    entirely (the robust companion to the moment-skewness query).
    Quartiles are PERCENTILE_DISC selections by exact integer
    cross-multiplication over the x100 histogram; the single final
    ratio divides two exact integers — mirrored double, x1e6 snap,
    NULL when the IQR collapses."""
    hist = _value_hist(sf_dir)
    if not len(hist) or "event_type" not in hist.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "q1_e2": pa.array([], pa.int64()),
                "q3_e2": pa.array([], pa.int64()),
                "bowley_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {
        "event_type": [],
        "n": [],
        "q1_e2": [],
        "q3_e2": [],
        "bowley_x1e6": [],
    }
    for et, g in hist.sort_values(["event_type", "x"]).groupby(
        "event_type", sort=True
    ):
        xs = g["x"].to_numpy(dtype=np.int64)
        cs = g["c"].to_numpy(dtype=np.int64)
        n = int(cs.sum())
        q1 = _disc_quantile(xs, cs, 1, 4)
        med = _disc_quantile(xs, cs, 1, 2)
        q3 = _disc_quantile(xs, cs, 3, 4)
        out["event_type"].append(et)
        out["n"].append(n)
        out["q1_e2"].append(q1)
        out["q3_e2"].append(q3)
        out["bowley_x1e6"].append(
            None
            if q3 == q1
            else int(
                _round_half_away(
                    np.array([(q3 + q1 - 2 * med) / float(q3 - q1) * 1e6])
                )[0]
            )
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "q1_e2": pa.array(out["q1_e2"], pa.int64()),
            "q3_e2": pa.array(out["q3_e2"], pa.int64()),
            "bowley_x1e6": pa.array(out["bowley_x1e6"], pa.int64()),
        }
    )


BOWLEY_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), q AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY x) AS BIGINT)
           AS q1,
         CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY x) AS BIGINT)
           AS med,
         CAST(PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY x) AS BIGINT)
           AS q3
  FROM v GROUP BY 1
)
SELECT event_type, n, q1 AS q1_e2, q3 AS q3_e2,
       CASE WHEN q3 = q1 THEN NULL
            ELSE CAST(ROUND((q3 + q1 - 2 * med)
                            / CAST(q3 - q1 AS DOUBLE) * 1000000, 0)
                 AS BIGINT) END AS bowley_x1e6
FROM q ORDER BY 1
"""


# ---------------------------------------------------------------------------
# maximum Cook's distance over the hourly-mean trend regression
# ---------------------------------------------------------------------------


def q_max_cooks_distance_hourly(sf_dir):
    """Per event type: the maximum Cook's distance over the simple
    linear regression of hourly mean value on the hour index — the
    influence diagnostic that names the single hour whose removal would
    most move the fitted trend (the hour to inspect before trusting any
    drift alert). Hourly means divide identical exact integers both
    sides; leverage h_ii, residuals, and D_i are mirrored doubles over
    the bounded hourly table; the winner is chosen on the SNAPPED x1e6
    D with a min-hour tie-break."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        h = ((us // _HOUR_US) * _HOUR_US).astype(np.int64)
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "h": pa.array(h),
                "s": pa.array(x),
                "c": pa.array(np.ones(len(x), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "h"], ["s", "c"])

    cells = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "h"], ["s", "c"]),
    ).to_pandas()  # bounded: types x hours

    if not len(cells) or "event_type" not in cells.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_hours": pa.array([], pa.int64()),
                "max_d_x1e6": pa.array([], pa.int64()),
                "at_hour_us": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "n_hours": [], "max_d_x1e6": [], "at_hour_us": []}
    for et, g in cells.sort_values(["event_type", "h"]).groupby(
        "event_type", sort=True
    ):
        g = g.sort_values("h", ignore_index=True)
        y = g["s"].to_numpy(dtype=np.float64) / g["c"].to_numpy(dtype=np.int64)
        n = len(y)
        out["event_type"].append(et)
        out["n_hours"].append(n)
        if n < 4:
            out["max_d_x1e6"].append(None)
            out["at_hour_us"].append(None)
            continue
        hidx = g["h"].to_numpy(dtype=np.int64) // _HOUR_US
        t = (hidx - hidx.min()).astype(np.float64)  # small-magnitude index
        tbar = float(np.sum(t)) / n
        ybar = float(np.sum(y)) / n
        sxx = float(np.sum((t - tbar) * (t - tbar)))
        if sxx == 0.0:
            out["max_d_x1e6"].append(None)
            out["at_hour_us"].append(None)
            continue
        b_slope = float(np.sum((t - tbar) * (y - ybar))) / sxx
        a = ybar - b_slope * tbar
        e = y - (a + b_slope * t)
        hii = 1.0 / n + (t - tbar) * (t - tbar) / sxx
        sse = float(np.sum(e * e))
        if n <= 2 or sse == 0.0:
            out["max_d_x1e6"].append(None)
            out["at_hour_us"].append(None)
            continue
        s2 = sse / (n - 2)
        d = (e * e) * hii / (2.0 * s2 * (1.0 - hii) * (1.0 - hii))
        snapped = _round_half_away(d * 1e6)
        best = int(snapped.max())
        at = int(g["h"].to_numpy(dtype=np.int64)[snapped == best].min())
        out["max_d_x1e6"].append(best)
        out["at_hour_us"].append(at)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_hours": pa.array(out["n_hours"], pa.int64()),
            "max_d_x1e6": pa.array(out["max_d_x1e6"], pa.int64()),
            "at_hour_us": pa.array(out["at_hour_us"], pa.int64()),
        }
    )


COOKS_SQL = """
WITH cell AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) * 3600000000 AS h,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), lo AS MATERIALIZED (
  SELECT event_type, MIN(h // 3600000000) AS h0 FROM cell GROUP BY 1
), m AS MATERIALIZED (
  SELECT cell.event_type, h,
         CAST(h // 3600000000 - lo.h0 AS DOUBLE) AS t,
         CAST(s AS DOUBLE) / c AS y
  FROM cell JOIN lo ON lo.event_type = cell.event_type
), f AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(t) / COUNT(*) AS tbar, SUM(y) / COUNT(*) AS ybar
  FROM m GROUP BY 1
), fit AS MATERIALIZED (
  SELECT m.event_type, f.n, f.tbar, f.ybar,
         SUM((m.t - f.tbar) * (m.t - f.tbar)) AS sxx,
         SUM((m.t - f.tbar) * (m.y - f.ybar)) AS sxy
  FROM m JOIN f ON f.event_type = m.event_type
  GROUP BY 1, 2, 3, 4
), resid AS MATERIALIZED (
  SELECT m.event_type, m.h, fit.n, fit.sxx,
         m.y - ((fit.ybar - fit.sxy / fit.sxx * fit.tbar)
                + fit.sxy / fit.sxx * m.t) AS e,
         1.0 / fit.n + (m.t - fit.tbar) * (m.t - fit.tbar) / fit.sxx AS hii
  FROM m JOIN fit ON fit.event_type = m.event_type
  WHERE fit.sxx <> 0
), sse AS MATERIALIZED (
  SELECT event_type, SUM(e * e) AS sse FROM resid GROUP BY 1
), d AS MATERIALIZED (
  SELECT r.event_type, r.h, r.n,
         CAST(ROUND((r.e * r.e) * r.hii
                    / (2.0 * (s.sse / (r.n - 2))
                       * (1.0 - r.hii) * (1.0 - r.hii))
              * 1000000, 0) AS BIGINT) AS d_x1e6
  FROM resid r JOIN sse s ON s.event_type = r.event_type
  WHERE r.n > 2 AND s.sse <> 0
), best AS (
  SELECT event_type, MAX(d_x1e6) AS max_d FROM d GROUP BY 1
), nh AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours FROM m GROUP BY 1
)
SELECT nh.event_type, nh.n_hours,
       CASE WHEN nh.n_hours < 4 THEN NULL ELSE best.max_d END AS max_d_x1e6,
       CASE WHEN nh.n_hours < 4 THEN NULL
            ELSE (SELECT MIN(d.h) FROM d
                  WHERE d.event_type = nh.event_type
                    AND d.d_x1e6 = best.max_d) END AS at_hour_us
FROM nh LEFT JOIN best ON best.event_type = nh.event_type
ORDER BY 1
"""


def register_r4cz(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "huber_location_value": q_huber_location_value,
            "bowley_skewness_value": q_bowley_skewness_value,
            "max_cooks_distance_hourly": q_max_cooks_distance_hourly,
        }
    )
    oracles.update(
        {
            "huber_location_value": HUBER_SQL,
            "bowley_skewness_value": BOWLEY_SQL,
            "max_cooks_distance_hourly": COOKS_SQL,
        }
    )
