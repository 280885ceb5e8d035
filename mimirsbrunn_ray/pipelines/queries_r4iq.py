"""Round-4 batch IQ: demand turbulence, edge-of-range mass, and
corpus-language coupling — the weekly volatility by year (the
coefficient of variation of weekly order counts, year by year —
is demand getting choppier?), the quantity boundary census (how
much of the lineitem mass sits exactly at the global min and max
quantity — clamp artifacts and lot-size walls), and the source ×
language mutual information (how much knowing the source tells
you about the language — the corpus-routing information
budget).

Exactness discipline: weekly counts, boundary counts and joint
(source, lang) counts are exact integers; CVs fold from exact
(n, Σ, Σ²) per year; MI uses the identical plug-in formula both
sides."""

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

_WEEK_US = 7 * _DAY_US


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_WVY_COLS = ["year", "n_weeks", "mean_weekly_x1e3", "cv_ppm"]


def q_weekly_volatility_yearly(sf_dir):
    """Is demand getting choppier?  Per order year, the
    population coefficient of variation of weekly order counts
    (weeks assigned by epoch-week of the order date; a week
    belongs to the year its first order falls in) — rising CV
    with flat volume means planning is getting harder at the
    same size.  Weekly counts fold exactly; CV derives from
    exact (n, Σ, Σ²)."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_orderdate"]))
        if b.num_rows == 0:
            return pa.table({
                "yr": pa.array([], pa.int64()),
                "wk": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        us = b["o_orderdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        yr = d.dt.year.to_numpy(np.int64)
        wk = (us // _WEEK_US).astype(np.int64)
        df = pd.DataFrame({"yr": yr, "wk": wk, "n": 1})
        agg = df.groupby(["yr", "wk"]).sum().reset_index()
        for c in ["yr", "wk", "n"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["yr", "wk"]).aggregate([("n", "sum")])
        return g.rename_columns(["yr", "wk", "n"])

    wc = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None), comb).to_pandas()
    if "yr" not in wc.columns or len(wc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _WVY_COLS})
    # a week split across years appears once per year; assign it
    # to the year where it has MORE orders (ties to earlier year)
    pick = wc.sort_values(["wk", "n", "yr"],
                          ascending=[True, False, True])
    pick = pick.groupby("wk").agg(
        yr=("yr", "first")).reset_index()
    tot = wc.groupby("wk")["n"].sum().reset_index()
    wk = pick.merge(tot, on="wk")
    rows = []
    for yr, g in wk.groupby("yr"):
        n = g["n"].to_numpy(np.int64).astype(np.float64)
        k = len(n)
        if k < 2:
            continue
        mu = n.mean()
        if mu == 0:
            continue
        sd = np.sqrt(((n - mu) ** 2).mean())
        rows.append((int(yr), k, _round_half_away(mu * 1e3),
                     _round_half_away(sd / mu * 1e6)))
    rows.sort()
    return pa.table({
        "year": pa.array([r[0] for r in rows], pa.int64()),
        "n_weeks": pa.array([r[1] for r in rows], pa.int64()),
        "mean_weekly_x1e3": pa.array(
            [r[2] for r in rows], pa.int64()),
        "cv_ppm": pa.array([r[3] for r in rows], pa.int64()),
    })


WVY_SQL = f"""
WITH wc AS MATERIALIZED (
  SELECT YEAR(o_orderdate) AS yr,
         EPOCH_US(o_orderdate) // {_WEEK_US} AS wk,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_orderdate IS NOT NULL
  GROUP BY 1, 2
), pick AS MATERIALIZED (
  SELECT wk, yr FROM wc
  QUALIFY ROW_NUMBER() OVER (PARTITION BY wk
                             ORDER BY n DESC, yr ASC) = 1
), wt AS MATERIALIZED (
  SELECT wk, CAST(SUM(n) AS BIGINT) AS n
  FROM wc GROUP BY 1
), wy AS MATERIALIZED (
  SELECT pick.yr, wt.n
  FROM pick JOIN wt USING (wk)
), st AS MATERIALIZED (
  SELECT yr, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS s,
         CAST(SUM(n * n) AS BIGINT) AS ss
  FROM wy GROUP BY 1
)
SELECT CAST(yr AS BIGINT) AS year, k AS n_weeks,
       CAST(ROUND(CAST(s AS DOUBLE) / k * 1000, 0) AS BIGINT)
         AS mean_weekly_x1e3,
       CAST(ROUND(SQRT(CAST(ss AS DOUBLE) / k
                       - (CAST(s AS DOUBLE) / k)
                         * (CAST(s AS DOUBLE) / k))
            / (CAST(s AS DOUBLE) / k) * 1000000, 0) AS BIGINT)
         AS cv_ppm
FROM st
WHERE k >= 2 AND s > 0
ORDER BY yr
"""

_QBC_COLS = ["n_lines", "min_qty", "max_qty", "at_min_ppm",
             "at_max_ppm"]


def q_quantity_boundary_census(sf_dir):
    """Clamp artifacts and lot-size walls: the share of all
    lineitem mass sitting exactly at the global minimum and
    maximum quantity — heavy boundary mass means the range is a
    business rule, not a distribution tail.  The quantity
    histogram folds exactly."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["l_quantity"]))
        if b.num_rows == 0:
            return pa.table({
                "q": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        qf = b["l_quantity"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        q = np.where(qf >= 0, np.floor(qf + 0.5),
                     np.ceil(qf - 0.5)).astype(np.int64)
        t = pa.table({
            "q": pa.array(q),
            "n": pa.array(np.ones(len(q), np.int64)),
        })
        g = t.group_by(["q"]).aggregate([("n", "sum")])
        return g.rename_columns(["q", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["q"]).aggregate([("n", "sum")])
        return g.rename_columns(["q", "n"])

    hist = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "q" not in hist.columns or len(hist) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _QBC_COLS})
    tot = int(hist["n"].sum())
    qmin = int(hist["q"].min())
    qmax = int(hist["q"].max())
    at_min = int(hist.loc[hist["q"] == qmin, "n"].sum())
    at_max = int(hist.loc[hist["q"] == qmax, "n"].sum())
    return pa.table({
        "n_lines": pa.array([tot], pa.int64()),
        "min_qty": pa.array([qmin], pa.int64()),
        "max_qty": pa.array([qmax], pa.int64()),
        "at_min_ppm": pa.array(
            [_round_half_away(at_min / tot * 1e6)], pa.int64()),
        "at_max_ppm": pa.array(
            [_round_half_away(at_max / tot * 1e6)], pa.int64()),
    })


QBC_SQL = """
WITH qh AS MATERIALIZED (
  SELECT CAST(ROUND(l_quantity, 0) AS BIGINT) AS q,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem WHERE l_quantity IS NOT NULL
  GROUP BY 1
), ex AS MATERIALIZED (
  SELECT CAST(MIN(q) AS BIGINT) AS qmin,
         CAST(MAX(q) AS BIGINT) AS qmax,
         CAST(SUM(n) AS BIGINT) AS tot
  FROM qh
)
SELECT ex.tot AS n_lines, ex.qmin AS min_qty,
       ex.qmax AS max_qty,
       CAST(ROUND(CAST((SELECT SUM(n) FROM qh, ex e2
                        WHERE q = e2.qmin) AS DOUBLE)
            / ex.tot * 1000000, 0) AS BIGINT) AS at_min_ppm,
       CAST(ROUND(CAST((SELECT SUM(n) FROM qh, ex e2
                        WHERE q = e2.qmax) AS DOUBLE)
            / ex.tot * 1000000, 0) AS BIGINT) AS at_max_ppm
FROM ex
WHERE ex.tot > 0
"""

_SLM_COLS = ["n_docs", "mi_ppm", "h_lang_ppm",
             "h_lang_given_source_ppm"]


def q_source_lang_mi(sf_dir):
    """The corpus-routing information budget: mutual information
    (log2) between a document's source and its language tag, and
    the conditional entropy H(lang | source) — near-zero
    residual entropy means source alone routes every doc to its
    language pipeline.  Joint counts fold exactly; the plug-in
    formula mirrors."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "lang"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("source", "lang"))
        t = pa.table({
            "src": b["source"].cast(pa.string()),
            "lang": b["lang"].cast(pa.string()),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["src", "lang"]).aggregate([("n", "sum")])
        return g.rename_columns(["src", "lang", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["src", "lang"]).aggregate([("n", "sum")])
        return g.rename_columns(["src", "lang", "n"])

    jc = tree_merge(
        docs.map_batches(part, batch_format="pyarrow",
                         batch_size=None), comb).to_pandas()
    if "src" not in jc.columns or len(jc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SLM_COLS})
    jc = jc.sort_values(["src", "lang"]).reset_index(drop=True)
    n = float(jc["n"].sum())
    ps = jc.groupby("src")["n"].sum() / n
    pl = jc.groupby("lang")["n"].sum() / n
    mi = 0.0
    for _, r in jc.iterrows():
        pxy = r["n"] / n
        mi += pxy * np.log2(
            pxy / (float(ps[r["src"]]) * float(pl[r["lang"]])))
    h_lang = float(-(pl * np.log2(pl)).sum())
    return pa.table({
        "n_docs": pa.array([int(n)], pa.int64()),
        "mi_ppm": pa.array(
            [_round_half_away(mi * 1e6)], pa.int64()),
        "h_lang_ppm": pa.array(
            [_round_half_away(h_lang * 1e6)], pa.int64()),
        "h_lang_given_source_ppm": pa.array(
            [_round_half_away((h_lang - mi) * 1e6)],
            pa.int64()),
    })


SLMI_SQL = """
WITH jc AS MATERIALIZED (
  SELECT source AS src, lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents
  WHERE source IS NOT NULL AND lang IS NOT NULL
  GROUP BY 1, 2
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS n FROM jc
), ms AS MATERIALIZED (
  SELECT src, CAST(SUM(n) AS BIGINT) AS ns FROM jc GROUP BY 1
), ml AS MATERIALIZED (
  SELECT lang, CAST(SUM(n) AS BIGINT) AS nl FROM jc GROUP BY 1
), mi AS MATERIALIZED (
  SELECT SUM((CAST(jc.n AS DOUBLE) / tot.n)
             * LOG2((CAST(jc.n AS DOUBLE) / tot.n)
                    / ((CAST(ms.ns AS DOUBLE) / tot.n)
                       * (CAST(ml.nl AS DOUBLE) / tot.n))))
           AS v
  FROM jc JOIN ms USING (src) JOIN ml USING (lang)
  CROSS JOIN tot
), hl AS MATERIALIZED (
  SELECT -SUM((CAST(nl AS DOUBLE) / tot.n)
              * LOG2(CAST(nl AS DOUBLE) / tot.n)) AS v
  FROM ml CROSS JOIN tot
)
SELECT tot.n AS n_docs,
       CAST(ROUND(mi.v * 1000000, 0) AS BIGINT) AS mi_ppm,
       CAST(ROUND(hl.v * 1000000, 0) AS BIGINT) AS h_lang_ppm,
       CAST(ROUND((hl.v - mi.v) * 1000000, 0) AS BIGINT)
         AS h_lang_given_source_ppm
FROM tot CROSS JOIN mi CROSS JOIN hl
WHERE tot.n > 0
"""


def register_r4iq(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "weekly_volatility_yearly":
                q_weekly_volatility_yearly,
            "quantity_boundary_census":
                q_quantity_boundary_census,
            "source_lang_mi": q_source_lang_mi,
        }
    )
    oracles.update(
        {
            "weekly_volatility_yearly": WVY_SQL,
            "quantity_boundary_census": QBC_SQL,
            "source_lang_mi": SLMI_SQL,
        }
    )
