"""Round-4 batch CU: MDLP-style entropy-minimizing first split of the
value axis, the Friedman rank test of hour effects blocked by
day-of-week, and Tukey's studentized-range q across event types.

Exactness discipline: all sufficient statistics (dollar-grain value x
type contingencies, (dow, hour) cell means from exact integer sums,
per-type n/s1/s2) fold exact int64; argmin selection happens on the
SNAPPED x1e6 entropy with an integer cut tie-break so engine-level
float ulp differences cannot flip the winner; rank averaging uses the
closed counting formula (below-count + (ties + 1) / 2) evaluated on
IDENTICAL doubles both sides.
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


# ---------------------------------------------------------------------------
# MDLP first split: the value cut minimizing weighted label entropy
# ---------------------------------------------------------------------------


def q_mdlp_first_split_value(sf_dir):
    """One-row supervised-discretization statistic: the dollar-grain
    value cut that MINIMIZES the class-weighted entropy of the
    event-type label (Fayyad-Irani MDLP's first recursion step — the
    binning every decision-tree featurizer runs). The (value, type)
    contingency folds exact int64 (bounded: dollar grain x types); each
    candidate cut's weighted entropy is a mirrored double over per-type
    cumulative counts; the winner is chosen on the SNAPPED x1e6 entropy
    with a min-cut integer tie-break so a ulp difference cannot flip
    it."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "value"))
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 1.0
        )
        t = pa.table(
            {
                "x": pa.array(x),
                "t": b["event_type"],
                "c": pa.array(np.ones(len(x), np.int64)),
            }
        )
        return _sum_by(t, ["x", "t"], ["c"])

    cells = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["x", "t"], ["c"]),
    ).to_pandas()  # bounded: dollar values x types

    if not len(cells) or "x" not in cells.columns:
        return pa.table(
            {
                "n": pa.array([0], pa.int64()),
                "cut": pa.array([None], pa.int64()),
                "went_x1e6": pa.array([None], pa.int64()),
            }
        )
    xs = np.sort(cells["x"].unique())
    types = sorted(cells["t"].unique())
    n = int(cells["c"].sum())
    if len(xs) < 2:
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "cut": pa.array([None], pa.int64()),
                "went_x1e6": pa.array([None], pa.int64()),
            }
        )
    # dense (value, type) count matrix -> per-type cumulative over x
    xi = {int(v): i for i, v in enumerate(xs)}
    ti = {v: i for i, v in enumerate(types)}
    M = np.zeros((len(xs), len(types)), dtype=np.int64)
    for _, r in cells.iterrows():
        M[xi[int(r["x"])], ti[r["t"]]] += int(r["c"])
    cum = np.cumsum(M, axis=0)
    ct = cum[-1, :]  # per-type totals
    cuts = cum[:-1, :]  # exclude max x (right side must be non-empty)
    nl = cuts.sum(axis=1).astype(np.int64)
    nr = n - nl

    def ent(counts: np.ndarray, tot: np.ndarray) -> np.ndarray:
        # -sum_t (c/tot) * ln(c/tot), zero-count terms contribute 0
        p = counts.astype(np.float64) / tot[:, None]
        with np.errstate(divide="ignore", invalid="ignore"):
            term = np.where(counts > 0, p * np.log(p), 0.0)
        return -term.sum(axis=1)

    hl = ent(cuts, nl)
    hr = ent(ct[None, :] - cuts, nr)
    went = (nl.astype(np.float64) * hl + nr.astype(np.float64) * hr) / n
    snapped = _round_half_away(went * 1e6)
    best = int(snapped.min())
    cut = int(xs[:-1][snapped == best].min())
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "cut": pa.array([cut], pa.int64()),
            "went_x1e6": pa.array([best], pa.int64()),
        }
    )


MDLP_SQL = """
WITH v AS (
  SELECT CAST(ROUND(value, 0) AS BIGINT) AS x, event_type AS t
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), cell AS MATERIALIZED (
  SELECT x, t, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY 1, 2
), tot AS MATERIALIZED (
  SELECT t, CAST(SUM(c) AS BIGINT) AS ct FROM cell GROUP BY 1
), nn AS MATERIALIZED (
  SELECT CAST(SUM(c) AS BIGINT) AS n FROM cell
), cuts AS MATERIALIZED (
  SELECT DISTINCT x AS cut FROM cell
  WHERE x < (SELECT MAX(x) FROM cell)
), cum AS MATERIALIZED (
  SELECT cuts.cut, tot.t, tot.ct,
         CAST(COALESCE((SELECT SUM(c) FROM cell
                        WHERE cell.t = tot.t AND cell.x <= cuts.cut), 0)
              AS BIGINT) AS cl
  FROM cuts CROSS JOIN tot
), ln_ AS MATERIALIZED (
  SELECT cut, CAST(SUM(cl) AS BIGINT) AS nl FROM cum GROUP BY 1
), h AS (
  SELECT cum.cut, ln_.nl, nn.n,
         -SUM(CASE WHEN cum.cl > 0
                   THEN (CAST(cum.cl AS DOUBLE) / ln_.nl)
                        * LN(CAST(cum.cl AS DOUBLE) / ln_.nl)
                   ELSE 0 END) AS hleft,
         -SUM(CASE WHEN cum.ct - cum.cl > 0
                   THEN (CAST(cum.ct - cum.cl AS DOUBLE) / (nn.n - ln_.nl))
                        * LN(CAST(cum.ct - cum.cl AS DOUBLE)
                             / (nn.n - ln_.nl))
                   ELSE 0 END) AS hright
  FROM cum
  JOIN ln_ ON ln_.cut = cum.cut, nn
  GROUP BY 1, 2, 3
), w AS (
  SELECT cut, n,
         CAST(ROUND((CAST(nl AS DOUBLE) * hleft
                     + CAST(n - nl AS DOUBLE) * hright) / n
              * 1000000, 0) AS BIGINT) AS went_x1e6
  FROM h
)
SELECT n, CAST(MIN(cut) AS BIGINT) AS cut, went_x1e6
FROM w
WHERE went_x1e6 = (SELECT MIN(went_x1e6) FROM w)
GROUP BY 1, 3
"""


# ---------------------------------------------------------------------------
# Friedman rank test: hour-of-day effect blocked by day-of-week
# ---------------------------------------------------------------------------


def q_friedman_hour_by_dow(sf_dir):
    """Per event type: the Friedman rank test of an hour-of-day effect
    with day-of-week as the blocking factor — within each dow block the
    24 hourly mean values rank (average ranks on ties via the closed
    counting formula below-count + (ties + 1) / 2), and chi2_F =
    12 / (n k (k+1)) * sum_j R_j² - 3 n (k+1) tests whether some hours
    consistently run hotter across every weekday. Cell means divide
    identical exact integers on both sides; the test is NULL unless the
    full 24 x 7 grid is populated (unequal treatment sets break the
    statistic). x1e6 snap."""
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
    ).to_pandas()  # bounded: types x 24 x 7

    if not len(cells) or "event_type" not in cells.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_cells": pa.array([], pa.int64()),
                "chi2_x1e6": pa.array([], pa.int64()),
            }
        )
    K, NBLK = 24, 7
    out = {"event_type": [], "n_cells": [], "chi2_x1e6": []}
    for et, g in cells.sort_values(["event_type", "d", "h"]).groupby(
        "event_type", sort=True
    ):
        out["event_type"].append(et)
        out["n_cells"].append(len(g))
        if len(g) != K * NBLK:
            out["chi2_x1e6"].append(None)
            continue
        m = g["s"].to_numpy(dtype=np.float64) / g["c"].to_numpy(dtype=np.int64)
        hcol = g["h"].to_numpy(dtype=np.int64)
        dcol = g["d"].to_numpy(dtype=np.int64)
        rsum = np.zeros(K, dtype=np.float64)
        for d in range(NBLK):
            sel = dcol == d
            mv = m[sel]
            hv = hcol[sel]
            # average rank via counting: below + (ties + 1) / 2
            below = (mv[:, None] > mv[None, :]).sum(axis=1)
            ties = (mv[:, None] == mv[None, :]).sum(axis=1)  # incl self
            ranks = below + (ties + 1) / 2.0
            rsum[hv] += ranks
        chi2 = 12.0 / (NBLK * K * (K + 1)) * float(
            np.sum(rsum * rsum)
        ) - 3.0 * NBLK * (K + 1)
        out["chi2_x1e6"].append(
            int(_round_half_away(np.array([chi2 * 1e6]))[0])
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_cells": pa.array(out["n_cells"], pa.int64()),
            "chi2_x1e6": pa.array(out["chi2_x1e6"], pa.int64()),
        }
    )


FRIEDMAN_SQL = """
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
), rs AS (
  SELECT event_type, h, SUM(rank) AS rj FROM r GROUP BY 1, 2
), chi AS (
  SELECT event_type,
         12.0 / (7 * 24 * 25) * SUM(rj * rj) - 3.0 * 7 * 25 AS chi2
  FROM rs GROUP BY 1
)
SELECT nc.event_type, nc.n_cells,
       CASE WHEN nc.n_cells <> 168 THEN NULL
            ELSE CAST(ROUND(chi.chi2 * 1000000, 0) AS BIGINT) END
         AS chi2_x1e6
FROM nc JOIN chi ON chi.event_type = nc.event_type
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Tukey studentized-range q across event types
# ---------------------------------------------------------------------------


def q_tukey_q_types(sf_dir):
    """One-row post-hoc statistic: Tukey's studentized range q = (max
    group mean - min group mean) / sqrt(MSW / n_h) across event types on
    x100 values, with n_h the harmonic mean of group sizes — the HSD
    screen run after a significant ANOVA to ask whether the EXTREME
    pair differs. Group (n, s1, s2) fold exact int64; means, the
    within-group mean square and the harmonic size are mirrored
    doubles, x1e6 snap, NULL when MSW degenerates or k < 2."""
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
                "g": b["event_type"],
                "n": pa.array(np.ones(len(x), np.int64)),
                "s1": pa.array(x),
                "s2": pa.array(x * x),
            }
        )
        return _sum_by(t, ["g"], ["n", "s1", "s2"])

    grp = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["g"], ["n", "s1", "s2"]),
    ).to_pandas()

    if not len(grp) or "g" not in grp.columns or len(grp) < 2:
        return pa.table(
            {
                "k": pa.array([0 if not len(grp) else len(grp)], pa.int64()),
                "q_x1e6": pa.array([None], pa.int64()),
            }
        )
    k = len(grp)
    ng = grp["n"].to_numpy(dtype=np.int64)
    s1 = grp["s1"].to_numpy(dtype=np.int64)
    s2 = grp["s2"].to_numpy(dtype=np.int64)
    n = int(ng.sum())
    means = s1.astype(np.float64) / ng
    ssw = float(
        np.sum(s2.astype(np.float64) - s1.astype(np.float64) * s1 / ng)
    )
    if n <= k or ssw == 0.0:
        q = None
    else:
        msw = ssw / (n - k)
        nh = k / float(np.sum(1.0 / ng))
        q = (float(means.max()) - means.min()) / np.sqrt(msw / nh)
        q = int(_round_half_away(np.array([q * 1e6]))[0])
    return pa.table(
        {
            "k": pa.array([k], pa.int64()),
            "q_x1e6": pa.array([q], pa.int64()),
        }
    )


TUKEY_Q_SQL = """
WITH v AS (
  SELECT event_type AS g, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), a AS MATERIALIZED (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s1, CAST(SUM(x * x) AS BIGINT) AS s2
  FROM v GROUP BY 1
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS n,
         SUM(s2 - CAST(s1 AS DOUBLE) * s1 / n) AS ssw,
         MAX(CAST(s1 AS DOUBLE) / n) AS mmax,
         MIN(CAST(s1 AS DOUBLE) / n) AS mmin,
         SUM(1.0 / n) AS inv
  FROM a
)
SELECT k,
       CASE WHEN k < 2 OR n <= k OR ssw = 0 THEN NULL
            ELSE CAST(ROUND(
              (mmax - mmin)
              / SQRT((ssw / (n - k)) / (k / inv))
              * 1000000, 0) AS BIGINT) END AS q_x1e6
FROM t
"""


def register_r4cu(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "mdlp_first_split_value": q_mdlp_first_split_value,
            "friedman_hour_by_dow": q_friedman_hour_by_dow,
            "tukey_q_types": q_tukey_q_types,
        }
    )
    oracles.update(
        {
            "mdlp_first_split_value": MDLP_SQL,
            "friedman_hour_by_dow": FRIEDMAN_SQL,
            "tukey_q_types": TUKEY_Q_SQL,
        }
    )
