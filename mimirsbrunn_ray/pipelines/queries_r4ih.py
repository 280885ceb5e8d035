"""Round-4 batch IH: distributional shape of money and demand —
the lognormal fit of order values (moment estimates of ln-value
and the implied-vs-actual mean ratio: how lognormal is revenue
really?), the Syntetos–Boylan demand quadrants (every part
classified smooth / intermittent / erratic / lumpy from EXACT
integer ADI and CV² threshold tests — the forecasting-method
router), and the bimodality coefficient of order value (is there
one typical order or two populations?).

Exactness discipline: the quadrant thresholds (ADI ≥ 1.32,
CV² ≥ 0.49) evaluate as exact cross-multiplied integer
comparisons — no float boundary can flip a part's class; log and
central moments mirror in double with coarse snaps."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _round_half_away,
)
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _cents_hist(sf_dir):
    """Distributed exact histogram of order total-price cents."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_totalprice"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_totalprice"]))
        if b.num_rows == 0:
            return pa.table({
                "cents": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        tp = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(tp >= 0, np.floor(tp * 100.0 + 0.5),
                         np.ceil(tp * 100.0 - 0.5)).astype(
            np.int64)
        t = pa.table({
            "cents": pa.array(cents),
            "n": pa.array(np.ones(len(cents), np.int64)),
        })
        g = t.group_by(["cents"]).aggregate([("n", "sum")])
        return g.rename_columns(["cents", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["cents"]).aggregate([("n", "sum")])
        return g.rename_columns(["cents", "n"])

    return tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["cents"],
    ).to_pandas()


_LNF_COLS = ["n_orders", "mu_x1e6", "sigma_x1e6",
             "implied_over_actual_ppm"]


def q_lognormal_fit_order_value(sf_dir):
    """How lognormal is revenue?  Moment estimates μ̂ = mean
    ln(cents), σ̂ = population sd of ln(cents), and the ratio of
    the implied lognormal mean exp(μ̂ + σ̂²/2) to the actual mean
    — 1.0 means the lognormal story holds; a big gap means the
    tail is heavier (or lighter) than lognormal.  The exact cents
    histogram folds first; logs run once per distinct value."""
    hist = _cents_hist(sf_dir)
    if "cents" not in hist.columns or len(hist) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LNF_COLS})
    hist = hist[hist["cents"] > 0].sort_values("cents")
    if len(hist) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LNF_COLS})
    c = hist["cents"].to_numpy(np.int64).astype(np.float64)
    w = hist["n"].to_numpy(np.int64).astype(np.float64)
    n = w.sum()
    lc = np.log(c)
    mu = float((w * lc).sum()) / n
    var = float((w * (lc - mu) * (lc - mu)).sum()) / n
    sigma = np.sqrt(var)
    actual = float((w * c).sum()) / n
    implied = np.exp(mu + var / 2.0)
    return pa.table({
        "n_orders": pa.array([int(n)], pa.int64()),
        "mu_x1e6": pa.array(
            [_round_half_away(mu * 1e6)], pa.int64()),
        "sigma_x1e6": pa.array(
            [_round_half_away(sigma * 1e6)], pa.int64()),
        "implied_over_actual_ppm": pa.array(
            [_round_half_away(implied / actual * 1e6)],
            pa.int64()),
    })


LNF_SQL = """
WITH oc AS MATERIALIZED (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders WHERE o_totalprice IS NOT NULL
), pos AS MATERIALIZED (
  SELECT cents, LN(CAST(cents AS DOUBLE)) AS lc
  FROM oc WHERE cents > 0
), mu AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(lc) AS mu,
         AVG(CAST(cents AS DOUBLE)) AS actual
  FROM pos
), vr AS MATERIALIZED (
  SELECT AVG((pos.lc - mu.mu) * (pos.lc - mu.mu)) AS var
  FROM pos CROSS JOIN mu
)
SELECT mu.n AS n_orders,
       CAST(ROUND(mu.mu * 1000000, 0) AS BIGINT) AS mu_x1e6,
       CAST(ROUND(SQRT(vr.var) * 1000000, 0) AS BIGINT)
         AS sigma_x1e6,
       CAST(ROUND(EXP(mu.mu + vr.var / 2.0) / mu.actual
            * 1000000, 0) AS BIGINT)
         AS implied_over_actual_ppm
FROM mu CROSS JOIN vr
WHERE mu.n > 0
"""

_SBQ_COLS = ["quadrant", "n_parts", "share_ppm"]


def q_syntetos_boylan_quadrants(sf_dir):
    """The forecasting-method router: each sold part classified
    by the Syntetos–Boylan cut — ADI (span months / months with
    demand) ≥ 1.32 splits intermittent from regular, CV² of
    nonzero monthly quantity ≥ 0.49 splits erratic from stable —
    into smooth / intermittent / erratic / lumpy.  BOTH
    thresholds evaluate as exact cross-multiplied integer tests,
    so no part's class rides on a float.  Per-(part, month)
    quantities fold exactly in disjoint shards."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_quantity"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_partkey", "l_shipdate", "l_quantity"))
        if b.num_rows == 0:
            return pa.table({
                "pk": pa.array([], pa.int64()),
                "mon": pa.array([], pa.int64()),
                "q": pa.array([], pa.int64()),
            })
        d = b["l_shipdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(
            np.int64)
        qf = b["l_quantity"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        q = np.where(qf >= 0, np.floor(qf + 0.5),
                     np.ceil(qf - 0.5)).astype(np.int64)
        t = pa.table({
            "pk": b["l_partkey"].cast(pa.int64()),
            "mon": pa.array(mon),
            "q": pa.array(q),
        })
        g = t.group_by(["pk", "mon"]).aggregate([("q", "sum")])
        return g.rename_columns(["pk", "mon", "q"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["pk", "mon"]).aggregate([("q", "sum")])
        return g.rename_columns(["pk", "mon", "q"])

    pm = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["pk"],
    ).to_pandas()
    if "pk" not in pm.columns or len(pm) == 0:
        return pa.table({
            "quadrant": pa.array([], pa.string()),
            "n_parts": pa.array([], pa.int64()),
            "share_ppm": pa.array([], pa.int64()),
        })
    pm = pm[pm["q"] > 0]
    if len(pm) == 0:
        return pa.table({
            "quadrant": pa.array([], pa.string()),
            "n_parts": pa.array([], pa.int64()),
            "share_ppm": pa.array([], pa.int64()),
        })
    span = int(pm["mon"].max() - pm["mon"].min() + 1)
    agg = pm.groupby("pk").agg(
        dm=("mon", "count"), s=("q", "sum"),
        ss=("q", lambda v: int((v.astype(np.int64) ** 2).sum()))
    ).reset_index()
    dm = agg["dm"].to_numpy(np.int64)
    s = agg["s"].to_numpy(np.int64)
    ss = agg["ss"].to_numpy(np.int64)
    # ADI >= 1.32  <=>  span * 100 >= dm * 132   (exact)
    inter = span * 100 >= dm * 132
    # CV^2 >= 0.49  <=>  100*(dm*ss - s^2) >= 49 * s^2  (exact)
    errat = 100 * (dm * ss - s * s) >= 49 * (s * s)
    quad = np.where(
        inter, np.where(errat, "lumpy", "intermittent"),
        np.where(errat, "erratic", "smooth"))
    tot = len(agg)
    rows = []
    for qd in sorted(set(quad)):
        nq = int((quad == qd).sum())
        rows.append((qd, nq, _round_half_away(nq / tot * 1e6)))
    return pa.table({
        "quadrant": pa.array([r[0] for r in rows], pa.string()),
        "n_parts": pa.array([r[1] for r in rows], pa.int64()),
        "share_ppm": pa.array([r[2] for r in rows], pa.int64()),
    })


SBQ_SQL = """
WITH pm AS MATERIALIZED (
  SELECT l_partkey AS pk,
         YEAR(l_shipdate) * 12 + MONTH(l_shipdate) - 1 AS mon,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT))
              AS BIGINT) AS q
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_shipdate IS NOT NULL
    AND l_quantity IS NOT NULL
  GROUP BY 1, 2
  HAVING SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) > 0
), span AS MATERIALIZED (
  SELECT MAX(mon) - MIN(mon) + 1 AS sp FROM pm
), pp AS MATERIALIZED (
  SELECT pk, CAST(COUNT(*) AS BIGINT) AS dm,
         CAST(SUM(q) AS BIGINT) AS s,
         CAST(SUM(q * q) AS BIGINT) AS ss
  FROM pm GROUP BY 1
), cl AS MATERIALIZED (
  SELECT pk,
         CASE WHEN span.sp * 100 >= dm * 132 THEN
           CASE WHEN 100 * (dm * ss - s * s) >= 49 * (s * s)
                THEN 'lumpy' ELSE 'intermittent' END
         ELSE
           CASE WHEN 100 * (dm * ss - s * s) >= 49 * (s * s)
                THEN 'erratic' ELSE 'smooth' END
         END AS quadrant
  FROM pp CROSS JOIN span
), tot AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS t FROM cl
)
SELECT cl.quadrant,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(ROUND(CAST(COUNT(*) AS DOUBLE)
            / ANY_VALUE(tot.t) * 1000000, 0) AS BIGINT)
         AS share_ppm
FROM cl CROSS JOIN tot
GROUP BY cl.quadrant
ORDER BY cl.quadrant
"""

_BMC_COLS = ["n_orders", "skew_x1e6", "kurtosis_x1e6",
             "bimodality_x1e6"]


def q_bimodality_order_value(sf_dir):
    """One typical order or two populations?  The bimodality
    coefficient (skew² + 1) / kurtosis over order total-price
    cents (population moments, kurtosis non-excess) — values
    past the uniform's 0.555 flag a two-humped revenue mix.
    Central moments compute two-pass from the exact cents
    histogram, mirrored."""
    hist = _cents_hist(sf_dir)
    if "cents" not in hist.columns or len(hist) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BMC_COLS})
    hist = hist.sort_values("cents")
    c = hist["cents"].to_numpy(np.int64).astype(np.float64)
    w = hist["n"].to_numpy(np.int64).astype(np.float64)
    n = w.sum()
    if n < 4:
        return pa.table(
            {c2: pa.array([], pa.int64()) for c2 in _BMC_COLS})
    mean = float((w * c).sum()) / n
    d = c - mean
    m2 = float((w * d * d).sum()) / n
    if m2 <= 0:
        return pa.table(
            {c2: pa.array([], pa.int64()) for c2 in _BMC_COLS})
    m3 = float((w * d * d * d).sum()) / n
    m4 = float((w * d * d * d * d).sum()) / n
    skew = m3 / m2 ** 1.5
    kurt = m4 / (m2 * m2)
    bc = (skew * skew + 1.0) / kurt
    return pa.table({
        "n_orders": pa.array([int(n)], pa.int64()),
        "skew_x1e6": pa.array(
            [_round_half_away(skew * 1e6)], pa.int64()),
        "kurtosis_x1e6": pa.array(
            [_round_half_away(kurt * 1e6)], pa.int64()),
        "bimodality_x1e6": pa.array(
            [_round_half_away(bc * 1e6)], pa.int64()),
    })


BMC_SQL = """
WITH oc AS MATERIALIZED (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders WHERE o_totalprice IS NOT NULL
), mu AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         AVG(CAST(cents AS DOUBLE)) AS mean
  FROM oc
), mo AS MATERIALIZED (
  SELECT AVG((cents - mu.mean) * (cents - mu.mean)) AS m2,
         AVG((cents - mu.mean) * (cents - mu.mean)
             * (cents - mu.mean)) AS m3,
         AVG((cents - mu.mean) * (cents - mu.mean)
             * (cents - mu.mean) * (cents - mu.mean)) AS m4
  FROM oc CROSS JOIN mu
)
SELECT mu.n AS n_orders,
       CAST(ROUND(mo.m3 / POWER(mo.m2, 1.5) * 1000000, 0)
            AS BIGINT) AS skew_x1e6,
       CAST(ROUND(mo.m4 / (mo.m2 * mo.m2) * 1000000, 0)
            AS BIGINT) AS kurtosis_x1e6,
       CAST(ROUND(((mo.m3 / POWER(mo.m2, 1.5))
                   * (mo.m3 / POWER(mo.m2, 1.5)) + 1.0)
            / (mo.m4 / (mo.m2 * mo.m2)) * 1000000, 0)
            AS BIGINT) AS bimodality_x1e6
FROM mu CROSS JOIN mo
WHERE mu.n >= 4 AND mo.m2 > 0
"""


def register_r4ih(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "lognormal_fit_order_value":
                q_lognormal_fit_order_value,
            "syntetos_boylan_quadrants":
                q_syntetos_boylan_quadrants,
            "bimodality_order_value": q_bimodality_order_value,
        }
    )
    oracles.update(
        {
            "lognormal_fit_order_value": LNF_SQL,
            "syntetos_boylan_quadrants": SBQ_SQL,
            "bimodality_order_value": BMC_SQL,
        }
    )
