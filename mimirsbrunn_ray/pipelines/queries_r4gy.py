"""Round-4 batch GY: brand quality, power-law fit quality, and
pricing-grid structure — the top-10 worst brands by lineitem
return rate (the quality ranking hiding inside returnflag), a KS
goodness-of-fit for the per-source word-frequency power law (an
alpha estimate without a fit check is a number, not a model), and
the tax x discount grid census (how many of the possible pricing
combos actually occur, the top combo's share, and the
independence chi^2 — is the pricing engine two independent knobs
or one lookup table?).

Exactness discipline: return and combo counts are pure integers
(ranking snaps rates to ppm before the cut, ties to brand); the
power-law KS compares the empirical rank CDF against the fitted
zeta tail with identical double folds; the grid chi^2 uses the
same (n_d * n_t / N) cell expectation as the dispersion family."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4dd import (
    _word_counts_per_source,
)
from mimirsbrunn_ray.pipelines.queries_r4fk import _round_half_away
from mimirsbrunn_ray.stages.rollup import tree_merge

_RET_TOP = 10
_PL_KMAX = 20  # KS evaluated on frequency classes 1..20


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_RB_COLS = ["brand", "n_lineitems", "n_returned", "return_ppm"]


def q_return_rate_by_brand(sf_dir):
    """Top-10 worst brands by return rate (returnflag 'R' share of
    their lineitems, ppm-snapped before ranking, ties to the
    brand name) — the de-facto quality league table.  The part
    dim broadcasts; counts fold exactly."""
    # the brand attaches via budget-gated broadcast / join
    # (stages/broadcast.py) — the part dim never lands whole on the
    # driver
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_returnflag"])
    li = li.map_batches(
        lambda b: _valid(b, ("l_partkey", "l_returnflag")),
        batch_format="pyarrow", batch_size=None)
    li = attach_dim(li, "l_partkey", sf_dir, "part", "p_partkey",
                    ["p_brand"], how="inner", out_names=["brand"])

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "brand": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "r": pa.array([], pa.int64()),
            })
        ret = (np.asarray(b["l_returnflag"].to_numpy(
            zero_copy_only=False)) == "R")
        df = pd.DataFrame({
            "brand": b["brand"].to_pandas(),
            "n": np.ones(b.num_rows, np.int64),
            "r": ret.astype(np.int64),
        })
        agg = df.groupby("brand", sort=False).agg(
            n=("n", "sum"), r=("r", "sum")).reset_index()
        for c in ["n", "r"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["brand"]).aggregate(
            [("n", "sum"), ("r", "sum")])
        return g.rename_columns(["brand", "n", "r"])

    res = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "brand" not in res.columns or len(res) == 0:
        return pa.table({
            "brand": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _RB_COLS[1:]},
        })
    res["return_ppm"] = [
        _round_half_away(r / n * 1e6)
        for r, n in zip(res["r"].astype(np.int64),
                        res["n"].astype(np.int64))
    ]
    res = res.sort_values(["return_ppm", "brand"],
                          ascending=[False, True],
                          ignore_index=True).head(_RET_TOP)
    return pa.table({
        "brand": pa.array(res["brand"], pa.string()),
        "n_lineitems": pa.array(res["n"].to_numpy(np.int64)),
        "n_returned": pa.array(res["r"].to_numpy(np.int64)),
        "return_ppm": pa.array(
            res["return_ppm"].to_numpy(np.int64)),
    })


RET_BRAND_SQL = f"""
WITH br AS MATERIALIZED (
  SELECT p.p_brand AS brand,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0
                  END) AS BIGINT) AS r
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_partkey IS NOT NULL AND l.l_returnflag IS NOT NULL
  GROUP BY 1
), rk AS (
  SELECT brand, n, r,
         CAST(ROUND(CAST(r AS DOUBLE) / n * 1000000, 0)
              AS BIGINT) AS return_ppm
  FROM br WHERE n > 0
)
SELECT brand,
       n AS n_lineitems,
       r AS n_returned,
       return_ppm
FROM rk
ORDER BY return_ppm DESC, brand
LIMIT {_RET_TOP}
"""

_PLKS_COLS = ["source", "vocab", "alpha_x1e6", "ks_x1e6"]


def q_powerlaw_fit_ks(sf_dir):
    """Power-law fit QUALITY per source: with the discrete MLE
    alpha from the word-frequency spectrum (xmin = 1), the KS
    distance between the empirical distribution of frequency
    classes 1..20 and the normalized zeta weights k^-alpha over
    the same classes — a small alpha-KS pair is a model, a big KS
    next to any alpha is a caution label.  Spectrum counts fold
    exactly; alpha and the 20-term CDF comparison mirror."""
    wsc = _word_counts_per_source(sf_dir)
    if not len(wsc) or "source" not in wsc.columns:
        return pa.table({
            "source": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64())
               for c in _PLKS_COLS[1:]},
        })
    out = {c: [] for c in _PLKS_COLS}
    ks_grid = np.arange(1, _PL_KMAX + 1, dtype=np.float64)
    for src, g in wsc.groupby("source", sort=True):
        c = g["c"].to_numpy(np.int64)
        v = len(c)
        if v < 2:
            continue
        s = float(np.log(c.astype(np.float64) / 0.5).sum())
        if s == 0:
            continue
        alpha = 1.0 + v / s
        cls = np.minimum(c, _PL_KMAX)
        obs = np.bincount(cls, minlength=_PL_KMAX + 1)[1:]
        n_in = int(obs.sum())
        if n_in == 0:
            continue
        emp_cdf = np.cumsum(obs) / n_in
        w = ks_grid ** (-alpha)
        th_cdf = np.cumsum(w) / w.sum()
        ks = float(np.abs(emp_cdf - th_cdf).max())
        out["source"].append(src)
        out["vocab"].append(v)
        out["alpha_x1e6"].append(_round_half_away(alpha * 1e6))
        out["ks_x1e6"].append(_round_half_away(ks * 1e6))
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        **{c: pa.array(out[c], pa.int64())
           for c in _PLKS_COLS[1:]},
    })


PLKS_SQL = f"""
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), c AS MATERIALIZED (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM w GROUP BY 1, 2
), al AS MATERIALIZED (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS v,
         1.0 + COUNT(*) / SUM(LN(CAST(c AS DOUBLE) / 0.5))
           AS alpha
  FROM c GROUP BY 1
  HAVING COUNT(*) >= 2
     AND SUM(LN(CAST(c AS DOUBLE) / 0.5)) <> 0
), spec AS MATERIALIZED (
  SELECT source, LEAST(c, {_PL_KMAX}) AS k,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM c GROUP BY 1, 2
), grid AS MATERIALIZED (
  SELECT al.source, al.v, al.alpha, r.k,
         COALESCE(spec.o, 0) AS o
  FROM al CROSS JOIN range(1, {_PL_KMAX + 1}) r(k)
  LEFT JOIN spec ON spec.source = al.source AND spec.k = r.k
), cum AS MATERIALIZED (
  SELECT source, v, alpha, k,
         SUM(o) OVER (PARTITION BY source ORDER BY k
                      ROWS UNBOUNDED PRECEDING) AS co,
         SUM(o) OVER (PARTITION BY source) AS tot,
         SUM(POW(CAST(k AS DOUBLE), -alpha))
           OVER (PARTITION BY source ORDER BY k
                 ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(POW(CAST(k AS DOUBLE), -alpha))
           OVER (PARTITION BY source) AS tw
  FROM grid
)
SELECT source,
       CAST(ANY_VALUE(v) AS BIGINT) AS vocab,
       CAST(ROUND(ANY_VALUE(alpha) * 1000000, 0) AS BIGINT)
         AS alpha_x1e6,
       CAST(ROUND(MAX(ABS(CAST(co AS DOUBLE) / tot - cw / tw))
            * 1000000, 0) AS BIGINT) AS ks_x1e6
FROM cum
WHERE tot > 0
GROUP BY source
ORDER BY source
"""

_TDG_COLS = ["n_lineitems", "n_combos", "top_combo_ppm",
             "chi2_x1e3"]


def q_tax_discount_grid(sf_dir):
    """Pricing-engine structure: the (tax bp, discount bp) combo
    census — how many grid cells occur, the top combo's share, and
    the independence chi^2 between the two knobs (a huge chi^2
    means tax and discount are set by ONE rule, so modeling them
    as independent features double-counts) .  Basis-point combos
    fold exactly; the chi^2 mirrors the dispersion family's cell
    expectation."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_tax", "l_discount"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_tax", "l_discount"))
        if b.num_rows == 0:
            return pa.table({
                "tax": pa.array([], pa.int64()),
                "disc": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        tx = b["l_tax"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        dc = b["l_discount"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        txb = np.where(tx >= 0, np.floor(tx * 1e4 + 0.5),
                       np.ceil(tx * 1e4 - 0.5)).astype(np.int64)
        dcb = np.where(dc >= 0, np.floor(dc * 1e4 + 0.5),
                       np.ceil(dc * 1e4 - 0.5)).astype(np.int64)
        t = pa.table({
            "tax": pa.array(txb),
            "disc": pa.array(dcb),
            "n": pa.array(np.ones(len(txb), np.int64)),
        })
        g = t.group_by(["tax", "disc"]).aggregate([("n", "sum")])
        return g.rename_columns(["tax", "disc", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["tax", "disc"]).aggregate([("n", "sum")])
        return g.rename_columns(["tax", "disc", "n"])

    cc = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "tax" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _TDG_COLS})
    n = cc["n"].to_numpy(np.int64)
    total = int(n.sum())
    if total == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _TDG_COLS})
    tax_m = cc.groupby("tax")["n"].sum()
    disc_m = cc.groupby("disc")["n"].sum()
    chi2 = 0.0
    for _, row in cc.iterrows():
        e = (int(tax_m.loc[row["tax"]])
             * int(disc_m.loc[row["disc"]])) / total
        o = int(row["n"])
        chi2 += (o - e) ** 2 / e
    # absent cells contribute e (since o = 0): add sum(e_absent)
    # = total - sum(e_present)
    e_present = sum(
        (int(tax_m.loc[r["tax"]]) * int(disc_m.loc[r["disc"]]))
        / total for _, r in cc.iterrows())
    chi2 += total - e_present
    return pa.table({
        "n_lineitems": pa.array([total], pa.int64()),
        "n_combos": pa.array([len(cc)], pa.int64()),
        "top_combo_ppm": pa.array(
            [_round_half_away(int(n.max()) / total * 1e6)],
            pa.int64()),
        "chi2_x1e3": pa.array(
            [_round_half_away(chi2 * 1e3)], pa.int64()),
    })


TDG_SQL = """
WITH td AS MATERIALIZED (
  SELECT CAST(ROUND(l_tax * 10000, 0) AS BIGINT) AS tax,
         CAST(ROUND(l_discount * 10000, 0) AS BIGINT) AS disc,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem
  WHERE l_tax IS NOT NULL AND l_discount IS NOT NULL
  GROUP BY 1, 2
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS t FROM td
), tm AS MATERIALIZED (
  SELECT tax, CAST(SUM(n) AS BIGINT) AS nt FROM td GROUP BY 1
), dm AS MATERIALIZED (
  SELECT disc, CAST(SUM(n) AS BIGINT) AS nd FROM td GROUP BY 1
), present AS MATERIALIZED (
  SELECT SUM((td.n - CAST(tm.nt AS DOUBLE) * dm.nd / tot.t)
             * (td.n - CAST(tm.nt AS DOUBLE) * dm.nd / tot.t)
             / (CAST(tm.nt AS DOUBLE) * dm.nd / tot.t)) AS chi2p,
         SUM(CAST(tm.nt AS DOUBLE) * dm.nd / tot.t) AS ep
  FROM td JOIN tm USING (tax) JOIN dm USING (disc)
  CROSS JOIN tot
)
SELECT tot.t AS n_lineitems,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM td) AS n_combos,
       CAST(ROUND(CAST((SELECT MAX(n) FROM td) AS DOUBLE)
            / tot.t * 1000000, 0) AS BIGINT) AS top_combo_ppm,
       CAST(ROUND((present.chi2p + tot.t - present.ep) * 1000, 0)
            AS BIGINT) AS chi2_x1e3
FROM tot CROSS JOIN present
WHERE tot.t > 0
"""


def register_r4gy(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "return_rate_by_brand": q_return_rate_by_brand,
            "powerlaw_fit_ks": q_powerlaw_fit_ks,
            "tax_discount_grid": q_tax_discount_grid,
        }
    )
    oracles.update(
        {
            "return_rate_by_brand": RET_BRAND_SQL,
            "powerlaw_fit_ks": PLKS_SQL,
            "tax_discount_grid": TDG_SQL,
        }
    )
