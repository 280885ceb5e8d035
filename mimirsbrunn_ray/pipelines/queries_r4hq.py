"""Round-4 batch HQ: supplier loyalty, priority escalation, and
wealth-breadth coupling — customer-supplier loyalty (the share of
each multi-order customer's lineitems sourced from their MODAL
supplier, averaged — de-facto single-sourcing by habit), the
priority escalation trend (per-customer OLS slope of the priority
ordinal over their order sequence; negative means drifting toward
1-URGENT — squeaky-wheel inflation), and the balance-breadth
correlation (account balance vs distinct parts ever bought — does
wealth widen the basket?).

Exactness discipline: loyalty shares are exact integer ratios
with lexicographic modal tie-breaks; priority ordinals are exact
integer ranks with mirrored slopes and interpolated medians;
the breadth correlation folds the shared centered form over
exact cents and counts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import _round_half_away
from mimirsbrunn_ray.pipelines.queries_r4gz import _pearson
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_CSL_COLS = ["n_customers", "mean_loyalty_ppm",
             "share_exclusive_ppm"]


def q_customer_supplier_loyalty(sf_dir):
    """De-facto single sourcing: for each customer with lineitems
    from 2+ orders, the share of their lineitems supplied by their
    MODAL supplier (ties to the lowest suppkey), averaged across
    customers, plus the share of customers at 100% — habit
    concentrates supply chains without anyone deciding it.
    (customer, supplier) counts fold exactly via the order
    bridge."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"]).to_pandas()
    if "o_orderkey" not in orders.columns:
        orders = pd.DataFrame({"o_orderkey": [], "o_custkey": []})
    orders = orders.dropna(subset=["o_orderkey", "o_custkey"])
    cust_map = dict(zip(orders["o_orderkey"].astype(np.int64),
                        orders["o_custkey"].astype(np.int64)))
    ord_count = orders.groupby("o_custkey").size()

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_orderkey", "l_suppkey"))
        if b.num_rows == 0:
            return pa.table({
                "cust": pa.array([], pa.int64()),
                "sk": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        ok = pd.Series(
            b["l_orderkey"].to_numpy(zero_copy_only=False))
        cust = ok.map(cust_map)
        keep = cust.notna().to_numpy()
        t = pa.table({
            "cust": pa.array(
                cust.to_numpy()[keep].astype(np.int64)),
            "sk": pa.array(
                b["l_suppkey"].to_numpy(
                    zero_copy_only=False)[keep].astype(np.int64)),
            "n": pa.array(np.ones(int(keep.sum()), np.int64)),
        })
        g = t.group_by(["cust", "sk"]).aggregate([("n", "sum")])
        return g.rename_columns(["cust", "sk", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["cust", "sk"]).aggregate([("n", "sum")])
        return g.rename_columns(["cust", "sk", "n"])

    cs = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["cust"],
    ).to_pandas()
    if "cust" not in cs.columns or len(cs) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _CSL_COLS})
    multi = set(ord_count[ord_count >= 2].index.astype(np.int64))
    cs = cs[cs["cust"].astype(np.int64).isin(multi)]
    if len(cs) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _CSL_COLS})
    cs = cs.sort_values(["cust", "n", "sk"],
                        ascending=[True, False, True],
                        ignore_index=True)
    # modal row = first per cust in (n desc, sk asc) order
    first = ~cs["cust"].duplicated()
    modal_n = cs[first].set_index("cust")["n"]
    totals = cs.groupby("cust")["n"].sum()
    loyalty = (modal_n / totals).to_numpy(np.float64)
    n = len(loyalty)
    return pa.table({
        "n_customers": pa.array([n], pa.int64()),
        "mean_loyalty_ppm": pa.array(
            [_round_half_away(float(loyalty.mean()) * 1e6)],
            pa.int64()),
        "share_exclusive_ppm": pa.array(
            [_round_half_away(
                float((loyalty >= 1.0).sum()) / n * 1e6)],
            pa.int64()),
    })


CSL_SQL = """
WITH oc AS MATERIALIZED (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_ord
  FROM orders
  WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
  GROUP BY 1
), cs AS MATERIALIZED (
  SELECT o.o_custkey AS cust, l.l_suppkey AS sk,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem l JOIN orders o
    ON o.o_orderkey = l.l_orderkey
  JOIN oc ON oc.o_custkey = o.o_custkey
  WHERE l.l_suppkey IS NOT NULL AND oc.n_ord >= 2
  GROUP BY 1, 2
), tot AS MATERIALIZED (
  SELECT cust, CAST(SUM(n) AS BIGINT) AS t FROM cs GROUP BY 1
), modal AS MATERIALIZED (
  SELECT cust, n AS modal_n
  FROM cs
  QUALIFY ROW_NUMBER() OVER (PARTITION BY cust
                             ORDER BY n DESC, sk) = 1
), loyal AS (
  SELECT modal.cust,
         CAST(modal.modal_n AS DOUBLE) / tot.t AS share
  FROM modal JOIN tot USING (cust)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(ROUND(AVG(share) * 1000000, 0) AS BIGINT)
         AS mean_loyalty_ppm,
       CAST(ROUND(CAST(SUM(CASE WHEN share >= 1.0 THEN 1
                                ELSE 0 END) AS DOUBLE)
            / COUNT(*) * 1000000, 0) AS BIGINT)
         AS share_exclusive_ppm
FROM loyal HAVING COUNT(*) > 0
"""

_PET_COLS = ["n_customers", "median_slope_x1e6",
             "share_escalating_ppm"]


def q_priority_escalation_trend(sf_dir):
    """Squeaky-wheel inflation: per customer with 3+ orders, the
    OLS slope of the priority ordinal (the leading digit of
    o_orderpriority: 1-URGENT .. 5-LOW) over their order sequence
    — the median slope and the share with a NEGATIVE one (drifting
    urgent-ward); if most customers escalate, priority stops
    carrying information.  Ordinals are exact integers; slopes
    mirror with an interpolated median."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate",
                 "o_orderpriority"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderkey", "o_orderdate",
                       "o_orderpriority"))
        if b.num_rows == 0:
            return pa.table({
                "cust": pa.array([], pa.int64()),
                "us": pa.array([], pa.int64()),
                "okey": pa.array([], pa.int64()),
                "ordv": pa.array([], pa.int64()),
            })
        pr = b["o_orderpriority"].to_numpy(zero_copy_only=False)
        ordv = np.array([int(p[0]) for p in pr], dtype=np.int64)
        t = pa.table({
            "cust": b["o_custkey"].cast(pa.int64()),
            "us": b["o_orderdate"].cast(
                pa.timestamp("us")).cast(pa.int64()),
            "okey": b["o_orderkey"].cast(pa.int64()),
            "ordv": pa.array(ordv),
        })
        return add_bucket(t, "cust", 64)

    def slopes(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "slope": pd.Series([], dtype=np.float64),
        })
        if len(g) == 0:
            return empty
        g = g.sort_values(["cust", "us", "okey"],
                          kind="mergesort", ignore_index=True)
        cust = g["cust"].to_numpy(np.int64)
        ordv = g["ordv"].to_numpy(np.int64).astype(np.float64)
        first = np.ones(len(g), dtype=bool)
        first[1:] = cust[1:] != cust[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(g))
        rows = []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 3:
                continue
            xi = np.arange(1, n + 1, dtype=np.float64)
            yi = ordv[s:e]
            sx, sy = xi.sum(), yi.sum()
            sxx = (xi * xi).sum()
            sxy = (xi * yi).sum()
            den = n * sxx - sx * sx
            if den == 0:
                continue
            rows.append((n * sxy - sx * sy) / den)
        return pd.DataFrame(
            {"slope": np.array(rows, dtype=np.float64)})

    sl = (
        orders.map_batches(project, batch_format="pyarrow",
                           batch_size=None)
        .groupby(_BUCKET)
        .map_groups(slopes, batch_format="pandas")
        .to_pandas()
    )
    if "slope" not in sl.columns or len(sl) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PET_COLS})
    v = sl["slope"].to_numpy(np.float64)
    n = len(v)
    return pa.table({
        "n_customers": pa.array([n], pa.int64()),
        "median_slope_x1e6": pa.array(
            [_round_half_away(float(np.percentile(v, 50))
                              * 1e6)], pa.int64()),
        "share_escalating_ppm": pa.array(
            [_round_half_away(float((v < 0).sum()) / n * 1e6)],
            pa.int64()),
    })


PET_SQL = """
WITH seq AS MATERIALIZED (
  SELECT o_custkey AS cust,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
           AS xi,
         CAST(CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
              AS DOUBLE) AS yi
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL
    AND o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
), st AS MATERIALIZED (
  SELECT cust, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(xi) AS sx, SUM(yi) AS sy,
         SUM(xi * xi) AS sxx, SUM(xi * yi) AS sxy
  FROM seq GROUP BY 1
), sl AS MATERIALIZED (
  SELECT cust,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
  FROM st WHERE n >= 3 AND n * sxx - sx * sx <> 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(ROUND(MEDIAN(slope) * 1000000, 0) AS BIGINT)
         AS median_slope_x1e6,
       CAST(ROUND(CAST(SUM(CASE WHEN slope < 0 THEN 1 ELSE 0
                           END) AS DOUBLE) / COUNT(*)
            * 1000000, 0) AS BIGINT) AS share_escalating_ppm
FROM sl HAVING COUNT(*) > 0
"""

_BBC_COLS = ["n_customers", "r_x1e6", "mean_breadth_x1e3"]


def q_balance_breadth_corr(sf_dir):
    """Does wealth widen the basket?  Pearson correlation across
    customers between account balance (exact cents) and distinct
    parts ever bought — the breadth companion to the order-rate
    correlation; together they separate 'rich buy MORE' from
    'rich buy WIDER'.  Distinct (customer, part) pairs fold via
    the order bridge; the correlation mirrors."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_acctbal"]).to_pandas()
    if "c_custkey" not in cust.columns or len(cust) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BBC_COLS})
    cust = cust.dropna(subset=["c_custkey", "c_acctbal"])
    bal = cust["c_acctbal"].to_numpy(np.float64)
    cents = np.where(
        bal >= 0, np.floor(bal * 100.0 + 0.5),
        np.ceil(bal * 100.0 - 0.5)).astype(np.int64)
    bal_map = dict(zip(cust["c_custkey"].astype(np.int64),
                       cents))

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"]).to_pandas()
    if "o_orderkey" not in orders.columns:
        orders = pd.DataFrame({"o_orderkey": [], "o_custkey": []})
    orders = orders.dropna(subset=["o_orderkey", "o_custkey"])
    cust_map = dict(zip(orders["o_orderkey"].astype(np.int64),
                        orders["o_custkey"].astype(np.int64)))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_orderkey", "l_partkey"))
        if b.num_rows == 0:
            return pa.table({
                "cust": pa.array([], pa.int64()),
                "pk": pa.array([], pa.int64()),
            })
        ok = pd.Series(
            b["l_orderkey"].to_numpy(zero_copy_only=False))
        cc = ok.map(cust_map)
        keep = cc.notna().to_numpy()
        t = pa.table({
            "cust": pa.array(
                cc.to_numpy()[keep].astype(np.int64)),
            "pk": pa.array(
                b["l_partkey"].to_numpy(
                    zero_copy_only=False)[keep].astype(np.int64)),
        })
        return t.group_by(["cust", "pk"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["cust", "pk"]).group_by(
            ["cust", "pk"]).aggregate([])

    cp = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["cust"],
    ).to_pandas()
    breadth = (cp.groupby("cust").size()
               if "cust" in cp.columns else pd.Series(dtype=int))
    keys = sorted(bal_map)
    x = np.array([bal_map[k] for k in keys], dtype=np.float64)
    y = np.array([int(breadth.get(k, 0)) for k in keys],
                 dtype=np.float64)
    r = _pearson(x, y)
    if r is None:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BBC_COLS})
    return pa.table({
        "n_customers": pa.array([len(keys)], pa.int64()),
        "r_x1e6": pa.array(
            [_round_half_away(r * 1e6)], pa.int64()),
        "mean_breadth_x1e3": pa.array(
            [_round_half_away(float(y.mean()) * 1e3)],
            pa.int64()),
    })


BBC_SQL = """
WITH cp AS MATERIALIZED (
  SELECT o.o_custkey AS cust,
         CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT) AS k
  FROM lineitem l JOIN orders o
    ON o.o_orderkey = l.l_orderkey
  WHERE l.l_partkey IS NOT NULL AND o.o_custkey IS NOT NULL
  GROUP BY 1
), u AS MATERIALIZED (
  SELECT c.c_custkey,
         CAST(CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT)
              AS DOUBLE) AS bal,
         CAST(COALESCE(cp.k, 0) AS DOUBLE) AS breadth
  FROM customer c
  LEFT JOIN cp ON cp.cust = c.c_custkey
  WHERE c.c_custkey IS NOT NULL AND c.c_acctbal IS NOT NULL
), mu AS MATERIALIZED (
  SELECT AVG(bal) AS mb, AVG(breadth) AS mk,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM u
), mom AS (
  SELECT SUM((u.bal - mu.mb) * (u.breadth - mu.mk)) AS sxy,
         SUM((u.bal - mu.mb) * (u.bal - mu.mb)) AS sxx,
         SUM((u.breadth - mu.mk) * (u.breadth - mu.mk)) AS syy
  FROM u CROSS JOIN mu
)
SELECT mu.n AS n_customers,
       CAST(ROUND(mom.sxy / SQRT(mom.sxx * mom.syy) * 1000000,
            0) AS BIGINT) AS r_x1e6,
       CAST(ROUND(mu.mk * 1000, 0) AS BIGINT)
         AS mean_breadth_x1e3
FROM mu CROSS JOIN mom
WHERE mu.n >= 3 AND mom.sxx * mom.syy > 0
"""


def register_r4hq(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "customer_supplier_loyalty": q_customer_supplier_loyalty,
            "priority_escalation_trend": q_priority_escalation_trend,
            "balance_breadth_corr": q_balance_breadth_corr,
        }
    )
    oracles.update(
        {
            "customer_supplier_loyalty": CSL_SQL,
            "priority_escalation_trend": PET_SQL,
            "balance_breadth_corr": BBC_SQL,
        }
    )
