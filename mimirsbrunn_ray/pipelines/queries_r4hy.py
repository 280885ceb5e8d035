"""Round-4 batch HY: basket depth hazard, categorical coupling,
and catalog shelf coverage — the line-continuation curve (the
probability an order that reached line k also has a line k+1 —
the hazard curve of basket building), the status × priority
Cramér's V (are fulfilment status and stated urgency coupled, or
does priority not actually move completion?), and the brand size
coverage census (per brand: does it stock every size in its span,
or are there holes on the shelf?).

Exactness discipline: continuation probabilities and coverage
ratios are exact integer-count ratios snapped at ppm; the
chi-square statistic behind Cramér's V is computed from exact
integer cell counts with the identical expected-count formula on
both sides."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import _round_half_away
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_LCC_COLS = ["k", "n_reached", "n_continued", "cont_ppm"]


def q_line_continuation_curve(sf_dir):
    """The basket-building hazard: for each line number k, the
    share of orders that reached line k AND also have a line k+1
    — a flat curve means baskets grow memorylessly, a cliff at k
    marks the UI or pricing point where shoppers stop adding.
    Per-order max line numbers fold exactly as a max."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_orderkey", "l_linenumber"))
        t = pa.table({
            "ok": b["l_orderkey"].cast(pa.int64()),
            "ln": b["l_linenumber"].cast(pa.int64()),
        })
        g = t.group_by(["ok"]).aggregate([("ln", "max")])
        return g.rename_columns(["ok", "mx"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["ok"]).aggregate([("mx", "max")])
        return g.rename_columns(["ok", "mx"])

    om = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["ok"],
    ).to_pandas()
    if "mx" not in om.columns or len(om) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LCC_COLS})
    mx = om["mx"].to_numpy(np.int64)
    kmax = int(mx.max())
    ks, reached, cont, ppm = [], [], [], []
    for k in range(1, kmax):
        r = int((mx >= k).sum())
        c = int((mx >= k + 1).sum())
        if r == 0:
            continue
        ks.append(k)
        reached.append(r)
        cont.append(c)
        ppm.append(_round_half_away(c / r * 1e6))
    return pa.table({
        "k": pa.array(ks, pa.int64()),
        "n_reached": pa.array(reached, pa.int64()),
        "n_continued": pa.array(cont, pa.int64()),
        "cont_ppm": pa.array(ppm, pa.int64()),
    })


LCC_SQL = """
WITH RECURSIVE om AS MATERIALIZED (
  SELECT l_orderkey AS ok,
         CAST(MAX(l_linenumber) AS BIGINT) AS mx
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
  GROUP BY 1
), mxv AS MATERIALIZED (
  SELECT CAST(MAX(mx) AS BIGINT) AS m FROM om
), ks AS (
  SELECT CAST(1 AS BIGINT) AS k FROM mxv WHERE m >= 2
  UNION ALL
  SELECT k + 1 FROM ks
  WHERE k + 1 < (SELECT m FROM mxv)
), cur AS MATERIALIZED (
  SELECT ks.k,
         CAST(SUM(CASE WHEN om.mx >= ks.k THEN 1 ELSE 0 END)
              AS BIGINT) AS n_reached,
         CAST(SUM(CASE WHEN om.mx >= ks.k + 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_continued
  FROM ks CROSS JOIN om
  GROUP BY 1
)
SELECT k, n_reached, n_continued,
       CAST(ROUND(CAST(n_continued AS DOUBLE) / n_reached
            * 1000000, 0) AS BIGINT) AS cont_ppm
FROM cur
WHERE n_reached > 0
ORDER BY k
"""

_SPC_COLS = ["n_orders", "n_status", "n_priority",
             "chi2_x1e3", "cramers_v_ppm"]


def q_status_priority_cramers_v(sf_dir):
    """Does stated urgency move completion?  Cramér's V over the
    o_orderstatus × o_orderpriority contingency table — near-zero
    means priority labels are decorative; the chi-square builds
    from exact integer cell counts with mirrored expected
    frequencies."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_orderstatus", "o_orderpriority"))
        t = pa.table({
            "st": b["o_orderstatus"].cast(pa.string()),
            "pr": b["o_orderpriority"].cast(pa.string()),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["st", "pr"]).aggregate([("n", "sum")])
        return g.rename_columns(["st", "pr", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["st", "pr"]).aggregate([("n", "sum")])
        return g.rename_columns(["st", "pr", "n"])

    cc = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
    ).to_pandas()
    if "st" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SPC_COLS})
    piv = cc.pivot_table(index="st", columns="pr", values="n",
                         aggfunc="sum", fill_value=0)
    m = piv.to_numpy(np.float64)
    n = m.sum()
    r, c = m.shape
    if n == 0 or r < 2 or c < 2:
        return pa.table(
            {c2: pa.array([], pa.int64()) for c2 in _SPC_COLS})
    row = m.sum(axis=1)
    col = m.sum(axis=0)
    exp = np.outer(row, col) / n
    chi2 = float(((m - exp) ** 2 / exp).sum())
    v = float(np.sqrt(chi2 / (n * min(r - 1, c - 1))))
    return pa.table({
        "n_orders": pa.array([int(n)], pa.int64()),
        "n_status": pa.array([r], pa.int64()),
        "n_priority": pa.array([c], pa.int64()),
        "chi2_x1e3": pa.array(
            [_round_half_away(chi2 * 1e3)], pa.int64()),
        "cramers_v_ppm": pa.array(
            [_round_half_away(v * 1e6)], pa.int64()),
    })


SPC_SQL = """
WITH cells AS MATERIALIZED (
  SELECT o_orderstatus AS st, o_orderpriority AS pr,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders
  WHERE o_orderstatus IS NOT NULL
    AND o_orderpriority IS NOT NULL
  GROUP BY 1, 2
), rows_ AS MATERIALIZED (
  SELECT st, CAST(SUM(n) AS BIGINT) AS rn FROM cells GROUP BY 1
), cols_ AS MATERIALIZED (
  SELECT pr, CAST(SUM(n) AS BIGINT) AS cn FROM cells GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS n,
         (SELECT COUNT(*) FROM rows_) AS r,
         (SELECT COUNT(*) FROM cols_) AS c
  FROM cells
), grid AS MATERIALIZED (
  SELECT rows_.st, cols_.pr,
         COALESCE(cells.n, 0) AS o,
         CAST(rows_.rn AS DOUBLE) * cols_.cn / tot.n AS e
  FROM rows_ CROSS JOIN cols_
  CROSS JOIN tot
  LEFT JOIN cells ON cells.st = rows_.st
                 AND cells.pr = cols_.pr
), chi AS MATERIALIZED (
  SELECT SUM((o - e) * (o - e) / e) AS chi2 FROM grid
  WHERE e > 0
)
SELECT tot.n AS n_orders,
       CAST(tot.r AS BIGINT) AS n_status,
       CAST(tot.c AS BIGINT) AS n_priority,
       CAST(ROUND(chi.chi2 * 1000, 0) AS BIGINT) AS chi2_x1e3,
       CAST(ROUND(SQRT(chi.chi2 / (tot.n *
            LEAST(tot.r - 1, tot.c - 1))) * 1000000, 0)
            AS BIGINT) AS cramers_v_ppm
FROM tot CROSS JOIN chi
WHERE tot.n > 0 AND tot.r >= 2 AND tot.c >= 2
"""

_BSC_COLS = ["n_brands", "n_full_coverage", "mean_coverage_ppm",
             "max_span"]


def q_brand_size_coverage(sf_dir):
    """Holes on the shelf: per brand, the distinct part sizes
    stocked versus the full integer span min..max of its sizes —
    coverage = distinct / (span + 1); a brand with span 40 but 12
    sizes has 29 holes a competitor can fill.  Per-brand
    (min, max, distinct) fold exactly."""
    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_brand", "p_size"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("p_brand", "p_size"))
        t = pa.table({
            "brand": b["p_brand"].cast(pa.string()),
            "size": b["p_size"].cast(pa.int64()),
        })
        return t.group_by(["brand", "size"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["brand", "size"]).group_by(
            ["brand", "size"]).aggregate([])

    bs = tree_merge(
        parts.map_batches(part, batch_format="pyarrow",
                          batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["brand"],
    ).to_pandas()
    if "brand" not in bs.columns or len(bs) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BSC_COLS})
    agg = bs.groupby("brand")["size"].agg(
        ["min", "max", "nunique"]).reset_index()
    span = (agg["max"] - agg["min"]).to_numpy(np.int64)
    dist = agg["nunique"].to_numpy(np.int64)
    cov = dist.astype(np.float64) / (span + 1)
    nb = len(agg)
    return pa.table({
        "n_brands": pa.array([nb], pa.int64()),
        "n_full_coverage": pa.array(
            [int((dist == span + 1).sum())], pa.int64()),
        "mean_coverage_ppm": pa.array(
            [_round_half_away(float(cov.mean()) * 1e6)],
            pa.int64()),
        "max_span": pa.array([int(span.max())], pa.int64()),
    })


BSC_SQL = """
WITH bs AS MATERIALIZED (
  SELECT DISTINCT p_brand AS brand,
         CAST(p_size AS BIGINT) AS size
  FROM part
  WHERE p_brand IS NOT NULL AND p_size IS NOT NULL
), agg AS MATERIALIZED (
  SELECT brand,
         MAX(size) - MIN(size) AS span,
         CAST(COUNT(*) AS BIGINT) AS dist
  FROM bs GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_brands,
       CAST(SUM(CASE WHEN dist = span + 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_full_coverage,
       CAST(ROUND(AVG(CAST(dist AS DOUBLE) / (span + 1))
            * 1000000, 0) AS BIGINT) AS mean_coverage_ppm,
       CAST(MAX(span) AS BIGINT) AS max_span
FROM agg HAVING COUNT(*) > 0
"""


def register_r4hy(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "line_continuation_curve": q_line_continuation_curve,
            "status_priority_cramers_v":
                q_status_priority_cramers_v,
            "brand_size_coverage": q_brand_size_coverage,
        }
    )
    oracles.update(
        {
            "line_continuation_curve": LCC_SQL,
            "status_priority_cramers_v": SPC_SQL,
            "brand_size_coverage": BSC_SQL,
        }
    )
