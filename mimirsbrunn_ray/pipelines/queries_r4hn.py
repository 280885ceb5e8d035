"""Round-4 batch HN: cross-stream causality, basket logistics, and
catalog breadth — a lag-1 Granger test from daily EVENT counts to
daily ORDER counts on window-aligned offsets (does yesterday's
clickstream predict today's demand beyond demand's own history?),
the basket-size vs ship-span correlation (do bigger orders take
longer END-TO-END, not just per line?), and distinct parts per
customer quantiles (how broad each customer shops — the
cross-sell headroom distribution).

Exactness discipline: daily counts, spans and distinct-part
counts fold as exact integers; the Granger F folds two mirrored
OLS residual sums; quantiles are interpolated on both engines."""

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
from mimirsbrunn_ray.pipelines.queries_r4gz import _pearson
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _daily_counts(ds, col):
    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[col]))
        us = b[col].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({"d": pc.divide(us, _DAY_US)})
        g = t.group_by(["d"]).aggregate([([], "count_all")])
        return g.rename_columns(["d", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["d"]).aggregate([("n", "sum")])
        return g.rename_columns(["d", "n"])

    return tree_merge(
        ds.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()


_CSG_COLS = ["n_steps", "rss_restricted_x1e3",
             "rss_full_x1e3", "granger_f_x1e3"]


def q_cross_stream_granger(sf_dir):
    """Does the clickstream lead demand?  On window-aligned daily
    offsets, regress order count o_t on o_{t-1} (restricted) and
    on (o_{t-1}, e_{t-1}) (full, adding yesterday's event count);
    the Granger F = (RSS_r - RSS_f)/(RSS_f/(n-3)) says whether
    events carry predictive information beyond demand's own
    memory — the one number deciding if the event pipeline belongs
    in the demand forecast.  Counts fold exactly; both OLS solves
    mirror via 2x2/3x3 normal equations."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts"])
    ed = _daily_counts(ev, "ts")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate"])
    od = _daily_counts(orders, "o_orderdate")
    if ("d" not in ed.columns or len(ed) == 0
            or "d" not in od.columns or len(od) == 0):
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _CSG_COLS})
    e_map = dict(zip(ed["d"].astype(np.int64),
                     ed["n"].astype(np.int64)))
    o_map = dict(zip(od["d"].astype(np.int64),
                     od["n"].astype(np.int64)))
    e0, o0 = min(e_map), min(o_map)
    rows = []
    for k in range(1, max(o_map) - o0 + 1):
        if (o0 + k in o_map and o0 + k - 1 in o_map
                and e0 + k - 1 in e_map):
            rows.append((o_map[o0 + k], o_map[o0 + k - 1],
                         e_map[e0 + k - 1]))
    n = len(rows)
    if n < 5:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _CSG_COLS})
    y = np.array([r[0] for r in rows], dtype=np.float64)
    x1 = np.array([r[1] for r in rows], dtype=np.float64)
    x2 = np.array([r[2] for r in rows], dtype=np.float64)

    def ols_rss(X: np.ndarray) -> float:
        # normal equations via least squares on small matrices
        XtX = X.T @ X
        Xty = X.T @ y
        beta = np.linalg.solve(XtX, Xty)
        resid = y - X @ beta
        return float((resid * resid).sum())

    ones = np.ones(n)
    try:
        rss_r = ols_rss(np.column_stack([ones, x1]))
        rss_f = ols_rss(np.column_stack([ones, x1, x2]))
    except np.linalg.LinAlgError:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _CSG_COLS})
    if rss_f == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _CSG_COLS})
    f = (rss_r - rss_f) / (rss_f / (n - 3))
    return pa.table({
        "n_steps": pa.array([n], pa.int64()),
        "rss_restricted_x1e3": pa.array(
            [_round_half_away(rss_r * 1e3)], pa.int64()),
        "rss_full_x1e3": pa.array(
            [_round_half_away(rss_f * 1e3)], pa.int64()),
        "granger_f_x1e3": pa.array(
            [_round_half_away(f * 1e3)], pa.int64()),
    })


CSG_SQL = f"""
WITH ed AS MATERIALIZED (
  SELECT EPOCH_US(ts) // {_DAY_US} AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), od AS MATERIALIZED (
  SELECT EPOCH_US(o_orderdate) // {_DAY_US} AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
), e0 AS MATERIALIZED (SELECT MIN(d) AS d0 FROM ed),
o0 AS MATERIALIZED (SELECT MIN(d) AS d0 FROM od),
tri AS MATERIALIZED (
  SELECT CAST(oc.n AS DOUBLE) AS y,
         CAST(op.n AS DOUBLE) AS x1,
         CAST(ep.n AS DOUBLE) AS x2
  FROM od oc
  CROSS JOIN o0 CROSS JOIN e0
  JOIN od op ON op.d = oc.d - 1
  JOIN ed ep ON ep.d = e0.d0 + (oc.d - 1 - o0.d0)
  WHERE oc.d > o0.d0
), st AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(x1) AS s1, SUM(x2) AS s2, SUM(y) AS sy,
         SUM(x1 * x1) AS s11, SUM(x1 * x2) AS s12,
         SUM(x2 * x2) AS s22,
         SUM(x1 * y) AS s1y, SUM(x2 * y) AS s2y,
         SUM(y * y) AS syy
  FROM tri
), rfit AS MATERIALIZED (
  -- restricted: y ~ 1 + x1
  SELECT n, syy, sy, s1y,
         (n * s1y - s1 * sy) / (n * s11 - s1 * s1) AS b1,
         (sy - (n * s1y - s1 * sy) / (n * s11 - s1 * s1) * s1)
           / n AS b0,
         s1, s11
  FROM st WHERE n * s11 - s1 * s1 <> 0
), rss_r AS MATERIALIZED (
  SELECT rfit.n,
         SUM((tri.y - rfit.b0 - rfit.b1 * tri.x1)
             * (tri.y - rfit.b0 - rfit.b1 * tri.x1)) AS rss
  FROM tri CROSS JOIN rfit GROUP BY rfit.n
), ffit AS MATERIALIZED (
  -- full: y ~ 1 + x1 + x2 via 3x3 Cramer
  SELECT st.n,
         st.n * (st.s11 * st.s22 - st.s12 * st.s12)
           - st.s1 * (st.s1 * st.s22 - st.s12 * st.s2)
           + st.s2 * (st.s1 * st.s12 - st.s11 * st.s2) AS det,
         (st.sy * (st.s11 * st.s22 - st.s12 * st.s12)
          - st.s1 * (st.s1y * st.s22 - st.s12 * st.s2y)
          + st.s2 * (st.s1y * st.s12 - st.s11 * st.s2y))
           AS num0,
         (st.n * (st.s1y * st.s22 - st.s12 * st.s2y)
          - st.sy * (st.s1 * st.s22 - st.s12 * st.s2)
          + st.s2 * (st.s1 * st.s2y - st.s1y * st.s2)) AS num1,
         (st.n * (st.s11 * st.s2y - st.s1y * st.s12)
          - st.s1 * (st.s1 * st.s2y - st.s1y * st.s2)
          + st.sy * (st.s1 * st.s12 - st.s11 * st.s2)) AS num2
  FROM st
), rss_f AS MATERIALIZED (
  SELECT ffit.n,
         SUM((tri.y - ffit.num0 / ffit.det
              - ffit.num1 / ffit.det * tri.x1
              - ffit.num2 / ffit.det * tri.x2)
             * (tri.y - ffit.num0 / ffit.det
                - ffit.num1 / ffit.det * tri.x1
                - ffit.num2 / ffit.det * tri.x2)) AS rss
  FROM tri CROSS JOIN ffit
  WHERE ffit.det <> 0
  GROUP BY ffit.n
)
SELECT CAST(rss_r.n AS BIGINT) AS n_steps,
       CAST(ROUND(rss_r.rss * 1000, 0) AS BIGINT)
         AS rss_restricted_x1e3,
       CAST(ROUND(rss_f.rss * 1000, 0) AS BIGINT)
         AS rss_full_x1e3,
       CAST(ROUND((rss_r.rss - rss_f.rss)
            / (rss_f.rss / (rss_r.n - 3)) * 1000, 0) AS BIGINT)
         AS granger_f_x1e3
FROM rss_r CROSS JOIN rss_f
WHERE rss_r.n >= 5 AND rss_f.rss <> 0
"""

_BSS_COLS = ["n_orders", "r_x1e6", "mean_lines_x1e3",
             "mean_span_x1e3"]


def q_basket_size_shipspan_corr(sf_dir):
    """Do big orders take longer end-to-end?  Pearson correlation
    across orders between lineitem count and ship SPAN (last minus
    first ship date, days) — span is the customer's completion
    wait, which per-line latency never shows.  Per-order (count,
    min, max) fold exactly; the correlation mirrors."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_orderkey", "l_shipdate"))
        if b.num_rows == 0:
            return pa.table({
                "okey": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "mn": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64()),
            })
        day = pc.divide(
            b["l_shipdate"].cast(pa.timestamp("us")).cast(
                pa.int64()), _DAY_US)
        t = pa.table({
            "okey": b["l_orderkey"].cast(pa.int64()),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
            "mn": day, "mx": day,
        })
        g = t.group_by(["okey"]).aggregate(
            [("n", "sum"), ("mn", "min"), ("mx", "max")])
        return g.rename_columns(["okey", "n", "mn", "mx"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["okey"]).aggregate(
            [("n", "sum"), ("mn", "min"), ("mx", "max")])
        return g.rename_columns(["okey", "n", "mn", "mx"])

    om = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["okey"],
    ).to_pandas()
    if "okey" not in om.columns or len(om) < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BSS_COLS})
    x = om["n"].to_numpy(np.int64).astype(np.float64)
    y = (om["mx"] - om["mn"]).to_numpy(np.int64).astype(
        np.float64)
    r = _pearson(x, y)
    if r is None:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BSS_COLS})
    return pa.table({
        "n_orders": pa.array([len(om)], pa.int64()),
        "r_x1e6": pa.array(
            [_round_half_away(r * 1e6)], pa.int64()),
        "mean_lines_x1e3": pa.array(
            [_round_half_away(float(x.mean()) * 1e3)],
            pa.int64()),
        "mean_span_x1e3": pa.array(
            [_round_half_away(float(y.mean()) * 1e3)],
            pa.int64()),
    })


BSS_SQL = f"""
WITH om AS MATERIALIZED (
  SELECT l_orderkey,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(MAX(EPOCH_US(l_shipdate) // {_DAY_US})
              - MIN(EPOCH_US(l_shipdate) // {_DAY_US})
              AS DOUBLE) AS span
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_shipdate IS NOT NULL
  GROUP BY 1
), mu AS MATERIALIZED (
  SELECT AVG(n) AS mx, AVG(span) AS my,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM om
), mom AS (
  SELECT SUM((om.n - mu.mx) * (om.span - mu.my)) AS sxy,
         SUM((om.n - mu.mx) * (om.n - mu.mx)) AS sxx,
         SUM((om.span - mu.my) * (om.span - mu.my)) AS syy
  FROM om CROSS JOIN mu
)
SELECT mu.cnt AS n_orders,
       CAST(ROUND(mom.sxy / SQRT(mom.sxx * mom.syy) * 1000000,
            0) AS BIGINT) AS r_x1e6,
       CAST(ROUND(mu.mx * 1000, 0) AS BIGINT)
         AS mean_lines_x1e3,
       CAST(ROUND(mu.my * 1000, 0) AS BIGINT)
         AS mean_span_x1e3
FROM mu CROSS JOIN mom
WHERE mu.cnt >= 3 AND mom.sxx * mom.syy > 0
"""

_PPC_COLS = ["n_customers", "p25", "p50_x1e3", "p75",
             "max_parts"]


def q_parts_per_customer_quantiles(sf_dir):
    """Cross-sell headroom: distinct parts each customer has ever
    bought — p25 / median / p75 / max across customers; a tight
    low distribution means wallets are narrow and recommendations
    have room, a wide one means breadth is already saturated.
    Distinct (customer, part) pairs fold exactly via the order
    bridge; quantiles are interpolated."""
    # scale shape: the orderkey->custkey bridge attaches via budget-
    # gated broadcast / join; distinct pairs dedup and per-customer
    # breadth counts in cust-disjoint shards, each emitting a bounded
    # (breadth, n_customers) histogram; quantiles interpolate from the
    # merged histogram. Orders never land whole on the driver.
    from mimirsbrunn_ray.stages.broadcast import attach_dim, sharded_reduce
    from mimirsbrunn_ray.stages.exactrank import percentile_from_counts

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    li = li.map_batches(
        lambda b: _valid(b, ("l_orderkey", "l_partkey")),
        batch_format="pyarrow", batch_size=None)
    li = attach_dim(li, "l_orderkey", sf_dir, "orders", "o_orderkey",
                    ["o_custkey"], how="inner")

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "cust": pa.array([], pa.int64()),
                "pk": pa.array([], pa.int64()),
            })
        t = pa.table({
            "cust": b["o_custkey"].cast(pa.int64()),
            "pk": b["l_partkey"].cast(pa.int64()),
        })
        return t.group_by(["cust", "pk"]).aggregate([])

    def shard_hist(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "cust" not in df.columns:
            return pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        cp = df.drop_duplicates(["cust", "pk"])
        k = cp.groupby("cust").size()
        h = k.value_counts().sort_index()
        return pd.DataFrame({"k": h.index.to_numpy(np.int64),
                             "n": h.to_numpy(np.int64)})

    hist = sharded_reduce(
        li.map_batches(part, batch_format="pyarrow", batch_size=None),
        ["cust"], shard_hist, num_shards=8).to_pandas()
    if "k" not in hist.columns or len(hist) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PPC_COLS})
    h = hist.groupby("k")["n"].sum().sort_index()
    vals = h.index.to_numpy(np.int64)
    cnts = h.to_numpy(np.int64)
    return pa.table({
        "n_customers": pa.array([int(cnts.sum())], pa.int64()),
        "p25": pa.array(
            [_round_half_away(percentile_from_counts(vals, cnts, 25))],
            pa.int64()),
        "p50_x1e3": pa.array(
            [_round_half_away(percentile_from_counts(vals, cnts, 50)
                              * 1e3)], pa.int64()),
        "p75": pa.array(
            [_round_half_away(percentile_from_counts(vals, cnts, 75))],
            pa.int64()),
        "max_parts": pa.array([int(vals.max())], pa.int64()),
    })


PPC_SQL = """
WITH cp AS MATERIALIZED (
  SELECT o.o_custkey AS cust,
         CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT) AS k
  FROM lineitem l JOIN orders o
    ON o.o_orderkey = l.l_orderkey
  WHERE l.l_orderkey IS NOT NULL AND l.l_partkey IS NOT NULL
    AND o.o_custkey IS NOT NULL
  GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(ROUND(QUANTILE_CONT(CAST(k AS DOUBLE), 0.25), 0)
            AS BIGINT) AS p25,
       CAST(ROUND(MEDIAN(CAST(k AS DOUBLE)) * 1000, 0)
            AS BIGINT) AS p50_x1e3,
       CAST(ROUND(QUANTILE_CONT(CAST(k AS DOUBLE), 0.75), 0)
            AS BIGINT) AS p75,
       CAST(MAX(k) AS BIGINT) AS max_parts
FROM cp HAVING COUNT(*) > 0
"""


def register_r4hn(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "cross_stream_granger": q_cross_stream_granger,
            "basket_size_shipspan_corr":
                q_basket_size_shipspan_corr,
            "parts_per_customer_quantiles":
                q_parts_per_customer_quantiles,
        }
    )
    oracles.update(
        {
            "cross_stream_granger": CSG_SQL,
            "basket_size_shipspan_corr": BSS_SQL,
            "parts_per_customer_quantiles": PPC_SQL,
        }
    )
