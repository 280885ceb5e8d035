"""Round-4 batch HS: first-impression destiny, weekend order
economics, and cross-table identity — the first-order vs
remaining-lifetime-value correlation (does the first purchase
predict everything after it?), the weekend vs weekday order-SIZE
gap (do weekend orders run bigger, with a Welch t on exact
cents), and user-customer rank agreement (Spearman between event
activity and order counts on the ids the two tables share — the
identity-bridge sanity check before any cross-table feature
join).

Exactness discipline: cents and counts fold exactly; first-order
selection uses the exact (date, orderkey) order; Spearman uses
the shared tie-safe average-rank rule; Welch mirrors the earlier
panels."""

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
from mimirsbrunn_ray.pipelines.queries_r4gz import (
    _avg_ranks,
    _pearson,
)
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_FOL_COLS = ["n_customers", "r_x1e6", "mean_first_cents",
             "mean_rest_cents"]


def q_first_order_ltv_corr(sf_dir):
    """Is the first purchase destiny?  Across customers with 2+
    orders, the correlation between the FIRST order's value
    (earliest (date, orderkey)) and the sum of everything after it
    — a high r justifies first-order-based LTV targeting; near
    zero means early signals are noise.  Customers resolve in
    disjoint shards with exact first-order selection."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderkey", "o_orderdate",
                       "o_totalprice"))
        if b.num_rows == 0:
            return pa.table({
                "cust": pa.array([], pa.int64()),
                "us": pa.array([], pa.int64()),
                "okey": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        x = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(
            x >= 0, np.floor(x * 100.0 + 0.5),
            np.ceil(x * 100.0 - 0.5)).astype(np.int64)
        t = pa.table({
            "cust": b["o_custkey"].cast(pa.int64()),
            "us": b["o_orderdate"].cast(
                pa.timestamp("us")).cast(pa.int64()),
            "okey": b["o_orderkey"].cast(pa.int64()),
            "cents": pa.array(cents),
        })
        return add_bucket(t, "cust", 64)

    def firsts(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "first": pd.Series([], dtype=np.int64),
            "rest": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        g = g.sort_values(["cust", "us", "okey"],
                          kind="mergesort", ignore_index=True)
        cust = g["cust"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        first = np.ones(len(g), dtype=bool)
        first[1:] = cust[1:] != cust[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(g))
        lens = ends - starts
        keep = lens >= 2
        f = cents[starts[keep]]
        totals = np.add.reduceat(cents, starts)[keep]
        return pd.DataFrame({
            "first": f.astype(np.int64),
            "rest": (totals - f).astype(np.int64),
        })

    fr = (
        orders.map_batches(project, batch_format="pyarrow",
                           batch_size=None)
        .groupby(_BUCKET)
        .map_groups(firsts, batch_format="pandas")
        .to_pandas()
    )
    if "first" not in fr.columns or len(fr) < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _FOL_COLS})
    x = fr["first"].to_numpy(np.int64).astype(np.float64)
    y = fr["rest"].to_numpy(np.int64).astype(np.float64)
    r = _pearson(x, y)
    if r is None:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _FOL_COLS})
    return pa.table({
        "n_customers": pa.array([len(fr)], pa.int64()),
        "r_x1e6": pa.array(
            [_round_half_away(r * 1e6)], pa.int64()),
        "mean_first_cents": pa.array(
            [_round_half_away(float(x.mean()))], pa.int64()),
        "mean_rest_cents": pa.array(
            [_round_half_away(float(y.mean()))], pa.int64()),
    })


FOL_SQL = """
WITH seq AS MATERIALIZED (
  SELECT o_custkey AS cust,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey)
           AS rn,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL
    AND o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
), fr AS MATERIALIZED (
  SELECT cust,
         CAST(SUM(CASE WHEN rn = 1 THEN cents END) AS DOUBLE)
           AS first_,
         CAST(SUM(CASE WHEN rn > 1 THEN cents ELSE 0 END)
              AS DOUBLE) AS rest
  FROM seq WHERE n >= 2
  GROUP BY 1
), mu AS MATERIALIZED (
  SELECT AVG(first_) AS mf, AVG(rest) AS mr,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM fr
), mom AS (
  SELECT SUM((fr.first_ - mu.mf) * (fr.rest - mu.mr)) AS sxy,
         SUM((fr.first_ - mu.mf) * (fr.first_ - mu.mf)) AS sxx,
         SUM((fr.rest - mu.mr) * (fr.rest - mu.mr)) AS syy
  FROM fr CROSS JOIN mu
)
SELECT mu.n AS n_customers,
       CAST(ROUND(mom.sxy / SQRT(mom.sxx * mom.syy) * 1000000,
            0) AS BIGINT) AS r_x1e6,
       CAST(ROUND(mu.mf, 0) AS BIGINT) AS mean_first_cents,
       CAST(ROUND(mu.mr, 0) AS BIGINT) AS mean_rest_cents
FROM mu CROSS JOIN mom
WHERE mu.n >= 3 AND mom.sxx * mom.syy > 0
"""

_WOG_COLS = ["n_weekend", "n_weekday", "mean_we_cents",
             "mean_wd_cents", "welch_t_x1e3"]


def q_weekend_order_size_gap(sf_dir):
    """Do weekend orders run bigger?  Mean order value (exact
    cents) placed on weekends (epoch dow >= 5) versus weekdays,
    with the Welch t — weekend traffic that converts at LARGER
    sizes changes how weekend capacity should be staffed.
    Two-pass group moments fold exactly."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_orderdate", "o_totalprice"))
        if b.num_rows == 0:
            return pa.table({
                "we": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        us = b["o_orderdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        day = us // _DAY_US
        we = ((day + 4) % 7 >= 5).astype(np.int64)
        x = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(
            x >= 0, np.floor(x * 100.0 + 0.5),
            np.ceil(x * 100.0 - 0.5)).astype(np.int64)
        return pa.table({
            "we": pa.array(we),
            "cents": pa.array(cents),
        })

    rows = orders.map_batches(part, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    if "we" not in rows.columns or len(rows) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _WOG_COLS})
    we = rows["we"].to_numpy(np.int64) == 1
    cents = rows["cents"].to_numpy(np.int64).astype(np.float64)
    a, b_ = cents[we], cents[~we]
    if len(a) < 2 or len(b_) < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _WOG_COLS})
    ma, mb = a.mean(), b_.mean()
    va = ((a - ma) ** 2).sum() / (len(a) - 1)
    vb = ((b_ - mb) ** 2).sum() / (len(b_) - 1)
    se = np.sqrt(va / len(a) + vb / len(b_))
    if se == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _WOG_COLS})
    t = (ma - mb) / se
    return pa.table({
        "n_weekend": pa.array([len(a)], pa.int64()),
        "n_weekday": pa.array([len(b_)], pa.int64()),
        "mean_we_cents": pa.array(
            [_round_half_away(ma)], pa.int64()),
        "mean_wd_cents": pa.array(
            [_round_half_away(mb)], pa.int64()),
        "welch_t_x1e3": pa.array(
            [_round_half_away(float(t) * 1e3)], pa.int64()),
    })


WOG_SQL = f"""
WITH o AS MATERIALIZED (
  SELECT CASE WHEN ((EPOCH_US(o_orderdate) // {_DAY_US}) + 4)
                   % 7 >= 5
              THEN 1 ELSE 0 END AS we,
         CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
              AS DOUBLE) AS cents
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
), g AS MATERIALIZED (
  SELECT we, CAST(COUNT(*) AS BIGINT) AS n, AVG(cents) AS mu
  FROM o GROUP BY 1
), v AS MATERIALIZED (
  SELECT o.we,
         SUM((o.cents - g.mu) * (o.cents - g.mu))
           / (ANY_VALUE(g.n) - 1) AS var,
         ANY_VALUE(g.n) AS n, ANY_VALUE(g.mu) AS mu
  FROM o JOIN g USING (we)
  GROUP BY o.we
), wide AS (
  SELECT
    MAX(CASE WHEN we = 1 THEN n END) AS na,
    MAX(CASE WHEN we = 1 THEN mu END) AS ma,
    MAX(CASE WHEN we = 1 THEN var END) AS va,
    MAX(CASE WHEN we = 0 THEN n END) AS nb,
    MAX(CASE WHEN we = 0 THEN mu END) AS mb,
    MAX(CASE WHEN we = 0 THEN var END) AS vb
  FROM v
)
SELECT CAST(na AS BIGINT) AS n_weekend,
       CAST(nb AS BIGINT) AS n_weekday,
       CAST(ROUND(ma, 0) AS BIGINT) AS mean_we_cents,
       CAST(ROUND(mb, 0) AS BIGINT) AS mean_wd_cents,
       CAST(ROUND((ma - mb) / SQRT(va / na + vb / nb) * 1000, 0)
            AS BIGINT) AS welch_t_x1e3
FROM wide
WHERE na >= 2 AND nb >= 2 AND SQRT(va / na + vb / nb) <> 0
"""

_UCR_COLS = ["n_shared_ids", "rho_x1e6"]


def q_user_customer_rank_agreement(sf_dir):
    """Identity-bridge sanity: on the ids that appear as BOTH an
    event user_id and an order custkey, the Spearman correlation
    (tie-safe average ranks) between event count and order count —
    near zero means the shared ids are a numbering coincidence and
    any cross-table feature join through them manufactures noise.
    Both count maps fold exactly."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id"])

    def e_part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["user_id"]))
        g = b.group_by(["user_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["id", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["id"]).aggregate([("n", "sum")])
        return g.rename_columns(["id", "n"])

    ec = tree_merge(
        ev.map_batches(e_part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])

    def o_part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_custkey"]))
        g = b.group_by(["o_custkey"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["id", "n"])

    oc = tree_merge(
        orders.map_batches(o_part, batch_format="pyarrow",
                           batch_size=None),
        comb,
    ).to_pandas()
    if ("id" not in ec.columns or len(ec) == 0
            or "id" not in oc.columns or len(oc) == 0):
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _UCR_COLS})
    e_map = dict(zip(ec["id"].astype(np.int64),
                     ec["n"].astype(np.int64)))
    o_map = dict(zip(oc["id"].astype(np.int64),
                     oc["n"].astype(np.int64)))
    shared = sorted(set(e_map) & set(o_map))
    if len(shared) < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _UCR_COLS})
    x = np.array([e_map[k] for k in shared], dtype=np.int64)
    y = np.array([o_map[k] for k in shared], dtype=np.int64)
    rho = _pearson(_avg_ranks(x), _avg_ranks(y))
    if rho is None:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _UCR_COLS})
    return pa.table({
        "n_shared_ids": pa.array([len(shared)], pa.int64()),
        "rho_x1e6": pa.array(
            [_round_half_away(rho * 1e6)], pa.int64()),
    })


UCR_SQL = """
WITH ec AS MATERIALIZED (
  SELECT user_id AS id, CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
), oc AS MATERIALIZED (
  SELECT o_custkey AS id, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
), shared AS MATERIALIZED (
  SELECT ec.id, ec.n AS x, oc.n AS y
  FROM ec JOIN oc USING (id)
), rk AS MATERIALIZED (
  SELECT id,
         (2.0 * RANK() OVER (ORDER BY x)
          + COUNT(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx,
         (2.0 * RANK() OVER (ORDER BY y)
          + COUNT(*) OVER (PARTITION BY y) - 1) / 2.0 AS ry
  FROM shared
), mu AS MATERIALIZED (
  SELECT AVG(rx) AS mx, AVG(ry) AS my,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM rk
), mom AS (
  SELECT SUM((rk.rx - mu.mx) * (rk.ry - mu.my)) AS sxy,
         SUM((rk.rx - mu.mx) * (rk.rx - mu.mx)) AS sxx,
         SUM((rk.ry - mu.my) * (rk.ry - mu.my)) AS syy
  FROM rk CROSS JOIN mu
)
SELECT mu.n AS n_shared_ids,
       CAST(ROUND(mom.sxy / SQRT(mom.sxx * mom.syy) * 1000000,
            0) AS BIGINT) AS rho_x1e6
FROM mu CROSS JOIN mom
WHERE mu.n >= 3 AND mom.sxx * mom.syy > 0
"""


def register_r4hs(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "first_order_ltv_corr": q_first_order_ltv_corr,
            "weekend_order_size_gap": q_weekend_order_size_gap,
            "user_customer_rank_agreement":
                q_user_customer_rank_agreement,
        }
    )
    oracles.update(
        {
            "first_order_ltv_corr": FOL_SQL,
            "weekend_order_size_gap": WOG_SQL,
            "user_customer_rank_agreement": UCR_SQL,
        }
    )
