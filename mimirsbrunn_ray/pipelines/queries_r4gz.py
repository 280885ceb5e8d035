"""Round-4 batch GZ: tenure effects, rank stability, and wealth
engagement — the correlation between a user's tenure (active-day
span) and their event-type diversity (do long-lived users broaden
or rut?), Spearman rank stability of supplier revenue between the
window's two halves (with exact average ranks — is the supplier
league table persistent or reshuffling noise?), and the
correlation between customer account balance and order count
(does wealth predict engagement here at all?).

Exactness discipline: all three fold exact integer inputs (days,
type counts, revenue cents, balances in cents, order counts)
through identical centered-sum correlation closed forms; Spearman
uses the tie-safe average-rank construction shared with the AUC
query."""

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


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _pearson(x: np.ndarray, y: np.ndarray):
    n = len(x)
    if n < 3:
        return None
    mx, my = x.mean(), y.mean()
    dx, dy = x - mx, y - my
    den = np.sqrt((dx * dx).sum() * (dy * dy).sum())
    if den == 0:
        return None
    return float((dx * dy).sum()) / float(den)


def _avg_ranks(v: np.ndarray) -> np.ndarray:
    order = np.argsort(v, kind="mergesort")
    s = v[order]
    uniq, first_idx, counts = np.unique(
        s, return_index=True, return_counts=True)
    ar = (2 * (first_idx + 1) + counts - 1) / 2.0
    rank_map = dict(zip(uniq.tolist(), ar.tolist()))
    return np.array([rank_map[t] for t in v.tolist()])


_TDC_COLS = ["n_users", "r_x1e6", "mean_span_x1e3",
             "mean_entropy_x1e3"]


def q_tenure_diversity_corr(sf_dir):
    """Do veterans broaden?  The Pearson correlation across users
    between tenure (days between first and last event) and
    behavioral diversity (distinct event types used) — positive
    means exposure accretes behaviors, ~0 means the repertoire is
    set on day one.  Per-user (span, distinct types) fold exactly
    in one user-sharded pass."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts", "event_type"))
        if b.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "mn": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64()),
            })
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        day = pc.divide(us, _DAY_US)
        t = pa.table({
            "user_id": b["user_id"].cast(pa.int64()),
            "event_type": b["event_type"],
            "mn": day,
            "mx": day,
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["user_id", "event_type"]).aggregate(
            [("mn", "min"), ("mx", "max"), ("n", "sum")])
        return g.rename_columns(
            ["user_id", "event_type", "mn", "mx", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id", "event_type"]).aggregate(
            [("mn", "min"), ("mx", "max"), ("n", "sum")])
        return g.rename_columns(
            ["user_id", "event_type", "mn", "mx", "n"])

    ut = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["user_id"],
    ).to_pandas()
    if "user_id" not in ut.columns or len(ut) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _TDC_COLS})
    ut = ut.sort_values(["user_id", "event_type"],
                        ignore_index=True)
    uid = ut["user_id"].to_numpy(np.int64)
    cnt = ut["n"].to_numpy(np.int64).astype(np.float64)
    first = np.ones(len(ut), dtype=bool)
    first[1:] = uid[1:] != uid[:-1]
    starts = np.flatnonzero(first)
    lens = np.diff(np.append(starts, len(ut)))
    totals = np.add.reduceat(cnt, starts)
    p = cnt / np.repeat(totals, lens)
    terms = -(p * np.log2(p))
    h = np.add.reduceat(terms, starts)
    per_user = ut.groupby("user_id").agg(
        mn=("mn", "min"), mx=("mx", "max")).reset_index()
    span = (per_user["mx"] - per_user["mn"]).to_numpy(
        np.int64).astype(np.float64)
    k = h
    r = _pearson(span, k)
    if r is None:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _TDC_COLS})
    return pa.table({
        "n_users": pa.array([len(per_user)], pa.int64()),
        "r_x1e6": pa.array(
            [_round_half_away(r * 1e6)], pa.int64()),
        "mean_span_x1e3": pa.array(
            [_round_half_away(float(span.mean()) * 1e3)],
            pa.int64()),
        "mean_entropy_x1e3": pa.array(
            [_round_half_away(float(k.mean()) * 1e3)],
            pa.int64()),
    })


TDC_SQL = f"""
WITH utc AS MATERIALIZED (
  SELECT user_id, event_type,
         MIN(EPOCH_US(ts) // {_DAY_US}) AS mn,
         MAX(EPOCH_US(ts) // {_DAY_US}) AS mx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
  GROUP BY 1, 2
), pr AS MATERIALIZED (
  SELECT user_id,
         CAST(n AS DOUBLE)
           / SUM(n) OVER (PARTITION BY user_id) AS p,
         mn, mx
  FROM utc
), u AS MATERIALIZED (
  SELECT user_id,
         CAST(MAX(mx) - MIN(mn) AS DOUBLE) AS span,
         -SUM(p * LOG2(p)) AS k
  FROM pr GROUP BY 1
), mu AS MATERIALIZED (
  SELECT AVG(span) AS ms, AVG(k) AS mk,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM u
), mom AS (
  SELECT SUM((u.span - mu.ms) * (u.k - mu.mk)) AS sxy,
         SUM((u.span - mu.ms) * (u.span - mu.ms)) AS sxx,
         SUM((u.k - mu.mk) * (u.k - mu.mk)) AS syy
  FROM u CROSS JOIN mu
)
SELECT mu.n AS n_users,
       CAST(ROUND(mom.sxy / SQRT(mom.sxx * mom.syy) * 1000000,
            0) AS BIGINT) AS r_x1e6,
       CAST(ROUND(mu.ms * 1000, 0) AS BIGINT) AS mean_span_x1e3,
       CAST(ROUND(mu.mk * 1000, 0) AS BIGINT)
         AS mean_entropy_x1e3
FROM mu CROSS JOIN mom
WHERE mu.n >= 3 AND mom.sxx * mom.syy > 0
"""

_SRS_COLS = ["n_suppliers", "rho_x1e6"]


def q_supplier_rank_stability(sf_dir):
    """Is the supplier league table real?  Spearman rank
    correlation (exact average ranks) between each supplier's
    revenue in the first versus second half of the ship-month
    span — rho near 1 means a persistent hierarchy worth acting
    on; near 0 means last half's 'top supplier' was noise.  Half
    revenues fold as exact cents; ranks use the tie-safe
    average-rank rule."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_suppkey", "l_shipdate",
                       "l_extendedprice", "l_discount"))
        if b.num_rows == 0:
            return pa.table({
                "sk": pa.array([], pa.int64()),
                "mon": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        d = b["l_shipdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(np.int64)
        rev = (b["l_extendedprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
            * (1.0 - b["l_discount"].cast(pa.float64()).to_numpy(
                zero_copy_only=False)))
        cents = np.where(
            rev >= 0, np.floor(rev * 100.0 + 0.5),
            np.ceil(rev * 100.0 - 0.5)).astype(np.int64)
        t = pa.table({
            "sk": b["l_suppkey"].cast(pa.int64()),
            "mon": pa.array(mon),
            "cents": pa.array(cents),
        })
        g = t.group_by(["sk", "mon"]).aggregate(
            [("cents", "sum")])
        return g.rename_columns(["sk", "mon", "cents"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["sk", "mon"]).aggregate(
            [("cents", "sum")])
        return g.rename_columns(["sk", "mon", "cents"])

    sm = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["sk"],
    ).to_pandas()
    if "sk" not in sm.columns or len(sm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SRS_COLS})
    mid = (int(sm["mon"].min()) + int(sm["mon"].max())) // 2
    sm["half"] = np.where(sm["mon"].to_numpy(np.int64) <= mid,
                          1, 2)
    piv = sm.pivot_table(index="sk", columns="half",
                         values="cents", aggfunc="sum",
                         fill_value=0)
    piv = piv.reindex(columns=[1, 2], fill_value=0)
    h1 = piv[1].to_numpy(np.int64)
    h2 = piv[2].to_numpy(np.int64)
    n = len(piv)
    if n < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SRS_COLS})
    r1 = _avg_ranks(h1)
    r2 = _avg_ranks(h2)
    rho = _pearson(r1, r2)
    if rho is None:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SRS_COLS})
    return pa.table({
        "n_suppliers": pa.array([n], pa.int64()),
        "rho_x1e6": pa.array(
            [_round_half_away(rho * 1e6)], pa.int64()),
    })


SRS_SQL = """
WITH lr AS MATERIALIZED (
  SELECT l_suppkey AS sk,
         YEAR(l_shipdate) * 12 + MONTH(l_shipdate) - 1 AS mon,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                             * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem
  WHERE l_suppkey IS NOT NULL AND l_shipdate IS NOT NULL
    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT (MIN(mon) + MAX(mon)) // 2 AS mid FROM lr
), halves AS MATERIALIZED (
  SELECT sk,
         CAST(SUM(CASE WHEN mon <= span.mid THEN cents ELSE 0
                  END) AS BIGINT) AS h1,
         CAST(SUM(CASE WHEN mon > span.mid THEN cents ELSE 0
                  END) AS BIGINT) AS h2
  FROM lr CROSS JOIN span GROUP BY 1
), rk AS MATERIALIZED (
  SELECT sk,
         (2.0 * RANK() OVER (ORDER BY h1)
          + COUNT(*) OVER (PARTITION BY h1) - 1) / 2.0 AS r1,
         (2.0 * RANK() OVER (ORDER BY h2)
          + COUNT(*) OVER (PARTITION BY h2) - 1) / 2.0 AS r2
  FROM halves
), mu AS MATERIALIZED (
  SELECT AVG(r1) AS m1, AVG(r2) AS m2,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM rk
), mom AS (
  SELECT SUM((rk.r1 - mu.m1) * (rk.r2 - mu.m2)) AS sxy,
         SUM((rk.r1 - mu.m1) * (rk.r1 - mu.m1)) AS sxx,
         SUM((rk.r2 - mu.m2) * (rk.r2 - mu.m2)) AS syy
  FROM rk CROSS JOIN mu
)
SELECT mu.n AS n_suppliers,
       CAST(ROUND(mom.sxy / SQRT(mom.sxx * mom.syy) * 1000000,
            0) AS BIGINT) AS rho_x1e6
FROM mu CROSS JOIN mom
WHERE mu.n >= 3 AND mom.sxx * mom.syy > 0
"""

_BOR_COLS = ["n_customers", "r_x1e6", "mean_orders_x1e3"]


def q_balance_order_rate_corr(sf_dir):
    """Does wealth predict engagement?  Pearson correlation across
    customers between account balance (exact cents) and order
    count — TPC-H generates balances independently, so a real
    correlation here flags data that was NOT generated the way
    its docs claim (the generative-assumption audit).  Per-
    customer counts fold exactly; the dim broadcasts."""
    # scale shape: per-customer order counts reduce in the cluster
    # (keyed_counts), attach to the streaming customer table, and the
    # Pearson moments fold in two passes — neither fact table lands
    # whole on the driver.
    from mimirsbrunn_ray.stages.broadcast import attach_table, keyed_counts

    oc = keyed_counts(sf_dir, "orders", "o_custkey")

    def cust_proj(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b["c_custkey"]),
                             pc.is_valid(b["c_acctbal"])))
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        cents = np.where(
            bal >= 0, np.floor(bal * 100.0 + 0.5),
            np.ceil(bal * 100.0 - 0.5)).astype(np.int64)
        return pa.table({
            "ck": b["c_custkey"].cast(pa.int64()),
            "cents": pa.array(cents),
        })

    cust_ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).map_batches(cust_proj, batch_format="pyarrow", batch_size=None)
    cust_ds = attach_table(cust_ds, "ck", oc, "o_custkey", ["n"],
                           how="left").materialize()

    def sums1(b: pa.Table) -> pa.Table:
        x = b["cents"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = pc.fill_null(b["n"], 0).to_numpy(
            zero_copy_only=False).astype(np.float64)
        return pa.table({"nn": pa.array([np.int64(len(x))]),
                         "sx": pa.array([float(x.sum())]),
                         "sy": pa.array([float(y.sum())])})

    p1 = cust_ds.map_batches(
        sums1, batch_format="pyarrow", batch_size=None).to_pandas()
    n_cust = int(p1["nn"].sum()) if "nn" in p1.columns else 0
    if n_cust < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BOR_COLS})
    mb = float(p1["sx"].sum()) / n_cust
    mo = float(p1["sy"].sum()) / n_cust

    def sums2(b: pa.Table) -> pa.Table:
        dx = b["cents"].to_numpy(zero_copy_only=False).astype(
            np.float64) - mb
        dy = pc.fill_null(b["n"], 0).to_numpy(
            zero_copy_only=False).astype(np.float64) - mo
        return pa.table({"sxy": pa.array([float((dx * dy).sum())]),
                         "sxx": pa.array([float((dx * dx).sum())]),
                         "syy": pa.array([float((dy * dy).sum())])})

    p2 = cust_ds.map_batches(
        sums2, batch_format="pyarrow", batch_size=None).to_pandas()
    sxx, syy = float(p2["sxx"].sum()), float(p2["syy"].sum())
    if sxx <= 0 or syy <= 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BOR_COLS})
    r = float(p2["sxy"].sum()) / np.sqrt(sxx * syy)
    return pa.table({
        "n_customers": pa.array([n_cust], pa.int64()),
        "r_x1e6": pa.array(
            [_round_half_away(r * 1e6)], pa.int64()),
        "mean_orders_x1e3": pa.array(
            [_round_half_away(mo * 1e3)], pa.int64()),
    })


BOR_SQL = """
WITH u AS MATERIALIZED (
  SELECT c.c_custkey,
         CAST(CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT)
              AS DOUBLE) AS bal,
         CAST(COALESCE(o.n, 0) AS DOUBLE) AS n_orders
  FROM customer c
  LEFT JOIN (SELECT o_custkey,
                    CAST(COUNT(*) AS BIGINT) AS n
             FROM orders WHERE o_custkey IS NOT NULL
             GROUP BY 1) o
    ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey IS NOT NULL AND c.c_acctbal IS NOT NULL
), mu AS MATERIALIZED (
  SELECT AVG(bal) AS mb, AVG(n_orders) AS mo,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM u
), mom AS (
  SELECT SUM((u.bal - mu.mb) * (u.n_orders - mu.mo)) AS sxy,
         SUM((u.bal - mu.mb) * (u.bal - mu.mb)) AS sxx,
         SUM((u.n_orders - mu.mo) * (u.n_orders - mu.mo)) AS syy
  FROM u CROSS JOIN mu
)
SELECT mu.n AS n_customers,
       CAST(ROUND(mom.sxy / SQRT(mom.sxx * mom.syy) * 1000000,
            0) AS BIGINT) AS r_x1e6,
       CAST(ROUND(mu.mo * 1000, 0) AS BIGINT)
         AS mean_orders_x1e3
FROM mu CROSS JOIN mom
WHERE mu.n >= 3 AND mom.sxx * mom.syy > 0
"""


def register_r4gz(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "tenure_diversity_corr": q_tenure_diversity_corr,
            "supplier_rank_stability": q_supplier_rank_stability,
            "balance_order_rate_corr": q_balance_order_rate_corr,
        }
    )
    oracles.update(
        {
            "tenure_diversity_corr": TDC_SQL,
            "supplier_rank_stability": SRS_SQL,
            "balance_order_rate_corr": BOR_SQL,
        }
    )
