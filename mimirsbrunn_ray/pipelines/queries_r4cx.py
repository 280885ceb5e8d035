"""Round-4 batch CX: Mantel-Haenszel stratified odds ratio,
Cochran-Armitage ordered trend test, and indirectly-standardized
purchase ratios (SMR) by day-of-week.

The confounder-aware association family: MH pools 2x2 tables across
hour strata so a diurnal confounder cannot fake a weekend effect;
Cochran-Armitage tests a MONOTONE dose-response across ordered hours;
SMR compares each weekday's purchase yield against what the global
hourly rates predict for its traffic mix. Exactness: every stratum
cell folds exact int64 in one combiner-first pass; the pooled
ratios / trend z / SMRs are mirrored double folds over bounded
(24-stratum) tables, x1e6 snap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

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


def _hour_cells(sf_dir):
    """Exact (hour, weekend, purchases, errors) cells over the
    purchase/error subpopulation — shared by MH and Cochran-Armitage."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts"))
        b = b.filter(
            pc.is_in(b["event_type"], value_set=pa.array(["purchase", "error"]))
        )
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        h = ((us // _HOUR_US) % 24).astype(np.int64)
        dow = (np.floor_divide(us, _DAY_US) + 4) % 7
        we = ((dow == 0) | (dow == 6)).astype(np.int64)
        pur = pc.equal(b["event_type"], "purchase").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        t = pa.table(
            {
                "h": pa.array(h),
                "we": pa.array(we),
                "pur": pa.array(pur),
                "err": pa.array(1 - pur),
            }
        )
        return _sum_by(t, ["h", "we"], ["pur", "err"])

    return tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["h", "we"], ["pur", "err"]),
    ).to_pandas()  # bounded: 24 x 2


# ---------------------------------------------------------------------------
# Mantel-Haenszel pooled odds ratio across hour strata
# ---------------------------------------------------------------------------


def q_mantel_haenszel_weekend_purchase(sf_dir):
    """One-row stratified association: the Mantel-Haenszel pooled odds
    ratio between WEEKEND exposure and purchase-vs-error outcome,
    stratified by hour-of-day — the confounder-adjusted version of the
    crude odds ratio (hour drives both traffic mix and conversion, so
    the crude OR is biased; MH pools per-stratum a*d/n over b*c/n).
    Per-stratum 2x2 cells fold exact int64; OR_MH and its log are
    mirrored double folds over the 24 strata, x1e6 snap, NULL when the
    denominator sum vanishes."""
    cells = _hour_cells(sf_dir)
    if not len(cells) or "h" not in cells.columns:
        return pa.table(
            {
                "n": pa.array([0], pa.int64()),
                "or_mh_x1e6": pa.array([None], pa.int64()),
                "log_or_mh_x1e6": pa.array([None], pa.int64()),
            }
        )
    num = 0.0
    den = 0.0
    n_tot = 0
    for h, g in cells.sort_values(["h", "we"]).groupby("h", sort=True):
        we = g[g["we"] == 1]
        wd = g[g["we"] == 0]
        a = int(we["pur"].sum())  # exposed + outcome
        b_ = int(we["err"].sum())  # exposed, no outcome
        c = int(wd["pur"].sum())
        d = int(wd["err"].sum())
        n_i = a + b_ + c + d
        n_tot += n_i
        if n_i == 0:
            continue
        num += float(a) * d / n_i
        den += float(b_) * c / n_i
    if den == 0.0 or num == 0.0:
        orv = logv = None
    else:
        orv = int(_round_half_away(np.array([num / den * 1e6]))[0])
        logv = int(_round_half_away(np.array([np.log(num / den) * 1e6]))[0])
    return pa.table(
        {
            "n": pa.array([n_tot], pa.int64()),
            "or_mh_x1e6": pa.array([orv], pa.int64()),
            "log_or_mh_x1e6": pa.array([logv], pa.int64()),
        }
    )


MH_SQL = """
WITH v AS (
  SELECT hour(ts) AS h,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pur
  FROM events
  WHERE event_type IN ('purchase', 'error') AND ts IS NOT NULL
), s AS MATERIALIZED (
  SELECT h,
         CAST(SUM(we * pur) AS BIGINT) AS a,
         CAST(SUM(we * (1 - pur)) AS BIGINT) AS b,
         CAST(SUM((1 - we) * pur) AS BIGINT) AS c,
         CAST(SUM((1 - we) * (1 - pur)) AS BIGINT) AS d
  FROM v GROUP BY 1
), agg AS (
  SELECT CAST(SUM(a + b + c + d) AS BIGINT) AS n,
         SUM(CASE WHEN a + b + c + d > 0
                  THEN CAST(a AS DOUBLE) * d / (a + b + c + d)
                  ELSE 0 END) AS num,
         SUM(CASE WHEN a + b + c + d > 0
                  THEN CAST(b AS DOUBLE) * c / (a + b + c + d)
                  ELSE 0 END) AS den
  FROM s
)
SELECT n,
       CASE WHEN den = 0 OR num = 0 THEN NULL
            ELSE CAST(ROUND(num / den * 1000000, 0) AS BIGINT) END
         AS or_mh_x1e6,
       CASE WHEN den = 0 OR num = 0 THEN NULL
            ELSE CAST(ROUND(LN(num / den) * 1000000, 0) AS BIGINT) END
         AS log_or_mh_x1e6
FROM agg
"""


# ---------------------------------------------------------------------------
# Cochran-Armitage trend test: purchase share across ordered hours
# ---------------------------------------------------------------------------


def q_cochran_armitage_hour_trend(sf_dir):
    """One-row ordered trend test: Cochran-Armitage z for a LINEAR trend
    in purchase share (vs error) across hour-of-day scores 0..23 — the
    test that distinguishes "conversion drifts monotonically through
    the day" from mere heterogeneity (which chi-square cannot). Strata
    cells fold exact int64; z = sum(s_i (a_i - n_i pbar)) /
    sqrt(pbar (1-pbar) (sum n_i s_i² - (sum n_i s_i)²/N)) is one
    mirrored double, x1e6 snap, NULL on degenerate shares."""
    cells = _hour_cells(sf_dir)
    if not len(cells) or "h" not in cells.columns:
        return pa.table(
            {
                "n": pa.array([0], pa.int64()),
                "z_x1e6": pa.array([None], pa.int64()),
            }
        )
    per_h = cells.groupby("h", sort=True)[["pur", "err"]].sum()
    s = per_h.index.to_numpy(dtype=np.int64)
    a = per_h["pur"].to_numpy(dtype=np.int64)
    n_i = a + per_h["err"].to_numpy(dtype=np.int64)
    n = int(n_i.sum())
    a_tot = int(a.sum())
    if n == 0 or a_tot == 0 or a_tot == n:
        z = None
    else:
        pbar = float(a_tot) / n
        num = float(np.sum(s * (a - n_i * pbar)))
        sns = int(np.sum(n_i * s))
        sns2 = int(np.sum(n_i * s * s))
        var = pbar * (1.0 - pbar) * (float(sns2) - float(sns) * sns / n)
        z = (
            None
            if var <= 0.0
            else int(
                _round_half_away(np.array([num / np.sqrt(var) * 1e6]))[0]
            )
        )
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "z_x1e6": pa.array([z], pa.int64()),
        }
    )


CA_TREND_SQL = """
WITH v AS (
  SELECT hour(ts) AS h,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pur
  FROM events
  WHERE event_type IN ('purchase', 'error') AND ts IS NOT NULL
), s AS MATERIALIZED (
  SELECT h, CAST(SUM(pur) AS BIGINT) AS a, CAST(COUNT(*) AS BIGINT) AS n_i
  FROM v GROUP BY 1
), t AS (
  SELECT CAST(SUM(n_i) AS BIGINT) AS n, CAST(SUM(a) AS BIGINT) AS a_tot,
         SUM(h * (a - n_i * (CAST((SELECT SUM(a) FROM s) AS DOUBLE)
                             / (SELECT SUM(n_i) FROM s)))) AS num,
         CAST(SUM(n_i * h) AS BIGINT) AS sns,
         CAST(SUM(n_i * h * h) AS BIGINT) AS sns2
  FROM s
)
SELECT n,
       CASE WHEN n = 0 OR a_tot = 0 OR a_tot = n
              OR (CAST(a_tot AS DOUBLE) / n)
                 * (1.0 - CAST(a_tot AS DOUBLE) / n)
                 * (sns2 - CAST(sns AS DOUBLE) * sns / n) <= 0
            THEN NULL
            ELSE CAST(ROUND(
              num / SQRT((CAST(a_tot AS DOUBLE) / n)
                         * (1.0 - CAST(a_tot AS DOUBLE) / n)
                         * (sns2 - CAST(sns AS DOUBLE) * sns / n))
              * 1000000, 0) AS BIGINT) END AS z_x1e6
FROM t
"""


# ---------------------------------------------------------------------------
# indirectly-standardized purchase ratio (SMR) per day-of-week
# ---------------------------------------------------------------------------


def q_smr_purchase_by_dow(sf_dir):
    """Per day-of-week: the indirectly-standardized purchase ratio SMR =
    observed purchases / expected purchases, where expected applies the
    GLOBAL per-hour purchase rate (over all events) to the weekday's
    hourly traffic mix — the standardization that separates "Tuesday
    converts worse" from "Tuesday's traffic just peaks in bad hours".
    (dow, hour) event counts and purchase counts fold exact int64; the
    global hourly rates divide exact integers; SMR is a mirrored double
    fold over 24 terms per dow, x1e6 snap."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        h = ((us // _HOUR_US) % 24).astype(np.int64)
        dow = ((np.floor_divide(us, _DAY_US) + 4) % 7).astype(np.int64)
        pur = pc.equal(b["event_type"], "purchase").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        t = pa.table(
            {
                "d": pa.array(dow),
                "h": pa.array(h),
                "n": pa.array(np.ones(len(h), np.int64)),
                "pur": pa.array(pur),
            }
        )
        return _sum_by(t, ["d", "h"], ["n", "pur"])

    cells = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["d", "h"], ["n", "pur"]),
    ).to_pandas()  # bounded: 7 x 24

    if not len(cells) or "d" not in cells.columns:
        return pa.table(
            {
                "dow": pa.array([], pa.int64()),
                "observed": pa.array([], pa.int64()),
                "smr_x1e6": pa.array([], pa.int64()),
            }
        )
    gh = cells.groupby("h", sort=True)[["n", "pur"]].sum()
    rate = {
        int(h): float(r["pur"]) / r["n"] for h, r in gh.iterrows() if r["n"] > 0
    }
    out = {"dow": [], "observed": [], "smr_x1e6": []}
    for d, g in cells.sort_values(["d", "h"]).groupby("d", sort=True):
        obs = int(g["pur"].sum())
        exp = 0.0
        for _, r in g.iterrows():
            exp += rate[int(r["h"])] * int(r["n"])
        out["dow"].append(int(d))
        out["observed"].append(obs)
        out["smr_x1e6"].append(
            None
            if exp == 0.0
            else int(_round_half_away(np.array([obs / exp * 1e6]))[0])
        )
    return pa.table(
        {
            "dow": pa.array(out["dow"], pa.int64()),
            "observed": pa.array(out["observed"], pa.int64()),
            "smr_x1e6": pa.array(out["smr_x1e6"], pa.int64()),
        }
    )


SMR_SQL = """
WITH cell AS MATERIALIZED (
  SELECT dayofweek(ts) AS d, hour(ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS pur
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), gh AS MATERIALIZED (
  SELECT h, CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(pur) AS BIGINT) AS pur
  FROM cell GROUP BY 1
), e AS (
  SELECT cell.d, CAST(SUM(cell.pur) AS BIGINT) AS observed,
         SUM(CAST(gh.pur AS DOUBLE) / gh.n * cell.n) AS expected
  FROM cell JOIN gh ON gh.h = cell.h
  WHERE gh.n > 0
  GROUP BY 1
)
SELECT CAST(d AS BIGINT) AS dow, observed,
       CASE WHEN expected = 0 THEN NULL
            ELSE CAST(ROUND(observed / expected * 1000000, 0) AS BIGINT)
       END AS smr_x1e6
FROM e ORDER BY 1
"""


def register_r4cx(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "mantel_haenszel_weekend_purchase": q_mantel_haenszel_weekend_purchase,
            "cochran_armitage_hour_trend": q_cochran_armitage_hour_trend,
            "smr_purchase_by_dow": q_smr_purchase_by_dow,
        }
    )
    oracles.update(
        {
            "mantel_haenszel_weekend_purchase": MH_SQL,
            "cochran_armitage_hour_trend": CA_TREND_SQL,
            "smr_purchase_by_dow": SMR_SQL,
        }
    )
