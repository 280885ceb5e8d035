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
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket


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
    import ray

    from mimirsbrunn_ray.stages.broadcast import (
        attach_dim, keyed_counts, probe, sharded_reduce)

    # orders never land on the driver: per-customer order counts reduce
    # in the cluster (keyed_counts), and the orderkey->custkey bridge
    # attaches to lineitem via budget-gated broadcast / join (attach_dim)
    oc = keyed_counts(
        sf_dir, "orders", "o_custkey", extra_cols=["o_orderkey"],
        dim_filter=lambda b: _valid(b, ("o_orderkey", "o_custkey")))
    if oc.num_rows == 0 or "o_custkey" not in oc.column_names:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _CSL_COLS})
    multi = oc.filter(pc.greater_equal(oc["n"], pa.scalar(2)))
    multi_ref = ray.put(np.sort(
        multi["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64),
        kind="stable"))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey"])
    li = li.map_batches(
        lambda b: _valid(b, ("l_orderkey", "l_suppkey")),
        batch_format="pyarrow", batch_size=None)
    li = attach_dim(li, "l_orderkey", sf_dir, "orders", "o_orderkey",
                    ["o_custkey"], how="inner")

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "cust": pa.array([], pa.int64()),
                "sk": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        t = pa.table({
            "cust": b["o_custkey"].cast(pa.int64()),
            "sk": b["l_suppkey"].cast(pa.int64()),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["cust", "sk"]).aggregate([("n", "sum")])
        return g.rename_columns(["cust", "sk", "n"])

    def shard_stats(df: pd.DataFrame) -> pd.DataFrame:
        # one shard = complete (cust, *) groups; the per-customer modal
        # pick runs here, distributed — the driver sees 3 sums per shard
        empty = pd.DataFrame({"n_cust": pd.Series([], dtype=np.int64),
                              "sum_loyalty": pd.Series([], dtype=np.float64),
                              "n_excl": pd.Series([], dtype=np.int64)})
        if len(df) == 0 or "cust" not in df.columns:
            return empty
        cs = df.groupby(["cust", "sk"], as_index=False)["n"].sum()
        mk = ray.get(multi_ref)
        keep, _ = probe(cs["cust"].to_numpy(np.int64), mk, {})
        cs = cs[keep]
        if len(cs) == 0:
            return empty
        cs = cs.sort_values(["cust", "n", "sk"],
                            ascending=[True, False, True],
                            ignore_index=True)
        first = ~cs["cust"].duplicated()
        modal_n = cs[first].set_index("cust")["n"]
        totals = cs.groupby("cust")["n"].sum()
        loyalty = (modal_n / totals).to_numpy(np.float64)
        return pd.DataFrame({
            "n_cust": [np.int64(len(loyalty))],
            "sum_loyalty": [float(loyalty.sum())],
            "n_excl": [np.int64((loyalty >= 1.0).sum())],
        })

    parts = sharded_reduce(
        li.map_batches(part, batch_format="pyarrow", batch_size=None),
        ["cust"], shard_stats, num_shards=8).to_pandas()
    if "n_cust" not in parts.columns or parts["n_cust"].sum() == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _CSL_COLS})
    n = int(parts["n_cust"].sum())
    return pa.table({
        "n_customers": pa.array([n], pa.int64()),
        "mean_loyalty_ppm": pa.array(
            [_round_half_away(
                float(parts["sum_loyalty"].sum()) / n * 1e6)],
            pa.int64()),
        "share_exclusive_ppm": pa.array(
            [_round_half_away(
                float(parts["n_excl"].sum()) / n * 1e6)],
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
    import ray

    from mimirsbrunn_ray.stages.broadcast import (
        attach_dim, attach_table, sharded_reduce)

    # distinct (customer, part) pairs fold distributed: lineitem gets its
    # custkey via the budget-gated order bridge, pairs dedup through a
    # cust-disjoint sharded combine, breadth counts per customer reduce in
    # the same shard pass; only the #customers-grain result reaches the
    # driver. The Pearson moments then stream over the customer table in
    # two passes (means, then centered sums) — no driver dict-builds.
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

    def shard_breadth(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "cust" not in df.columns:
            return pd.DataFrame({"cust": pd.Series([], dtype=np.int64),
                                 "k": pd.Series([], dtype=np.int64)})
        cp = df.drop_duplicates(["cust", "pk"])
        g = cp.groupby("cust", as_index=False).size()
        return pd.DataFrame({"cust": g["cust"].astype(np.int64),
                             "k": g["size"].astype(np.int64)})

    breadth = sharded_reduce(
        li.map_batches(part, batch_format="pyarrow", batch_size=None),
        ["cust"], shard_breadth, num_shards=8).to_pandas()
    if "cust" not in breadth.columns:
        breadth = pd.DataFrame({"cust": pd.Series([], dtype=np.int64),
                                "k": pd.Series([], dtype=np.int64)})
    breadth_tbl = pa.Table.from_pandas(breadth, preserve_index=False)

    def cust_valid(b: pa.Table) -> pa.Table:
        b = _valid(b, ("c_custkey", "c_acctbal"))
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64)
        cents = np.where(
            bal >= 0, np.floor(bal * 100.0 + 0.5),
            np.ceil(bal * 100.0 - 0.5)).astype(np.int64)
        return pa.table({
            "c_custkey": b["c_custkey"].cast(pa.int64()),
            "cents": pa.array(cents),
        })

    cust_ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).map_batches(cust_valid, batch_format="pyarrow", batch_size=None)
    cust_ds = attach_table(cust_ds, "c_custkey", breadth_tbl, "cust",
                           ["k"], how="left").materialize()

    def sums1(b: pa.Table) -> pa.Table:
        x = b["cents"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = pc.fill_null(b["k"], 0).to_numpy(
            zero_copy_only=False).astype(np.float64)
        return pa.table({
            "n": pa.array([np.int64(len(x))]),
            "sx": pa.array([float(x.sum())]),
            "sy": pa.array([float(y.sum())]),
        })

    p1 = cust_ds.map_batches(
        sums1, batch_format="pyarrow", batch_size=None).to_pandas()
    n = int(p1["n"].sum()) if "n" in p1.columns else 0
    if n == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BBC_COLS})
    mb, mk = float(p1["sx"].sum()) / n, float(p1["sy"].sum()) / n

    def sums2(b: pa.Table) -> pa.Table:
        x = b["cents"].to_numpy(zero_copy_only=False).astype(np.float64) - mb
        y = pc.fill_null(b["k"], 0).to_numpy(
            zero_copy_only=False).astype(np.float64) - mk
        return pa.table({
            "sxy": pa.array([float((x * y).sum())]),
            "sxx": pa.array([float((x * x).sum())]),
            "syy": pa.array([float((y * y).sum())]),
        })

    p2 = cust_ds.map_batches(
        sums2, batch_format="pyarrow", batch_size=None).to_pandas()
    sxy, sxx, syy = (float(p2["sxy"].sum()), float(p2["sxx"].sum()),
                     float(p2["syy"].sum()))
    if sxx <= 0 or syy <= 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BBC_COLS})
    r = sxy / np.sqrt(sxx * syy)
    return pa.table({
        "n_customers": pa.array([n], pa.int64()),
        "r_x1e6": pa.array(
            [_round_half_away(r * 1e6)], pa.int64()),
        "mean_breadth_x1e3": pa.array(
            [_round_half_away(mk * 1e3)], pa.int64()),
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
