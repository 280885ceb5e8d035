"""Round-4 batch HL: national champions, per-capita demand, and
month-boundary operations — the top supplier per nation by
discounted revenue (the grouped-argmax league table with exact
tie-breaks), orders per capita by customer nation (demand
intensity normalized by customer base — raw order totals just
rank population), and the month-start ship share (lineitems
shipped in the first three calendar days of each month — the
operational echo of month-end order batching clearing the queue).

Exactness discipline: revenues and counts fold exact cents and
integers; grouped argmax ties break by the snapped revenue then
supplier key; shares are exact ratios."""

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


_TSN_COLS = ["nationkey", "suppkey", "revenue_cents",
             "nation_share_ppm"]


def q_top_supplier_per_nation(sf_dir):
    """National champions: the top supplier per supplier-nation by
    discounted revenue (ties to the lowest suppkey) and that
    champion's share of the nation's supplier revenue — a high
    share marks single-champion nations whose supply risk the
    HHI-by-region view aggregates away.  The supplier dim
    broadcasts; per-(nation, supplier) cents fold exactly."""
    # the supplier nation attaches via budget-gated broadcast / join
    # (stages/broadcast.py) — the dim never lands whole on the driver
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"])
    li = li.map_batches(
        lambda b: _valid(b, ("l_suppkey", "l_extendedprice",
                             "l_discount")),
        batch_format="pyarrow", batch_size=None)
    li = attach_dim(li, "l_suppkey", sf_dir, "supplier", "s_suppkey",
                    ["s_nationkey"], how="inner")

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "nk": pa.array([], pa.int64()),
                "sk": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        rev = (b["l_extendedprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
            * (1.0 - b["l_discount"].cast(pa.float64()).to_numpy(
                zero_copy_only=False)))
        cents = np.where(
            rev >= 0, np.floor(rev * 100.0 + 0.5),
            np.ceil(rev * 100.0 - 0.5)).astype(np.int64)
        t = pa.table({
            "nk": pa.array(b["s_nationkey"].to_numpy(
                zero_copy_only=False).astype(np.int64)),
            "sk": pa.array(b["l_suppkey"].to_numpy(
                zero_copy_only=False).astype(np.int64)),
            "cents": pa.array(cents),
        })
        g = t.group_by(["nk", "sk"]).aggregate([("cents", "sum")])
        return g.rename_columns(["nk", "sk", "cents"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["nk", "sk"]).aggregate([("cents", "sum")])
        return g.rename_columns(["nk", "sk", "cents"])

    ns = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["nk"],
    ).to_pandas()
    if "nk" not in ns.columns or len(ns) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _TSN_COLS})
    out = {c: [] for c in _TSN_COLS}
    for nk, g in ns.groupby("nk", sort=True):
        g = g.sort_values(["cents", "sk"],
                          ascending=[False, True],
                          ignore_index=True)
        tot = int(g["cents"].sum())
        if tot == 0:
            continue
        out["nationkey"].append(int(nk))
        out["suppkey"].append(int(g["sk"].iloc[0]))
        out["revenue_cents"].append(int(g["cents"].iloc[0]))
        out["nation_share_ppm"].append(
            _round_half_away(int(g["cents"].iloc[0]) / tot * 1e6))
    return pa.table(
        {c: pa.array(out[c], pa.int64()) for c in _TSN_COLS})


TSN_SQL = """
WITH ns AS MATERIALIZED (
  SELECT s.s_nationkey AS nk, l.l_suppkey AS sk,
         CAST(SUM(CAST(ROUND(l.l_extendedprice
                             * (1 - l.l_discount) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l JOIN supplier s
    ON s.s_suppkey = l.l_suppkey
  WHERE l.l_extendedprice IS NOT NULL
    AND l.l_discount IS NOT NULL
  GROUP BY 1, 2
), tot AS MATERIALIZED (
  SELECT nk, CAST(SUM(cents) AS BIGINT) AS t
  FROM ns GROUP BY 1
), champ AS MATERIALIZED (
  SELECT nk, sk, cents
  FROM ns
  QUALIFY ROW_NUMBER() OVER (PARTITION BY nk
                             ORDER BY cents DESC, sk) = 1
)
SELECT CAST(champ.nk AS BIGINT) AS nationkey,
       CAST(champ.sk AS BIGINT) AS suppkey,
       champ.cents AS revenue_cents,
       CAST(ROUND(CAST(champ.cents AS DOUBLE) / tot.t
            * 1000000, 0) AS BIGINT) AS nation_share_ppm
FROM champ JOIN tot USING (nk)
WHERE tot.t <> 0
ORDER BY nationkey
"""

_OPC_COLS = ["nationkey", "n_customers", "n_orders",
             "orders_per_capita_x1e3"]


def q_orders_per_capita_nation(sf_dir):
    """Demand intensity by nation: orders per customer (per
    capita) — raw order totals rank customer-base size, this ranks
    how HARD each nation's customers buy, the number market-entry
    decisions actually need.  Both dims fold exactly."""
    # nation population reduces distributed; the customer nation
    # attaches to orders via budget-gated broadcast / join — the
    # customer dim never lands whole on the driver
    from mimirsbrunn_ray.stages.broadcast import attach_dim, keyed_counts

    pop_tbl = keyed_counts(
        sf_dir, "customer", "c_nationkey", extra_cols=["c_custkey"],
        dim_filter=lambda b: _valid(b, ("c_custkey", "c_nationkey")))
    if pop_tbl.num_rows == 0 or "c_nationkey" not in pop_tbl.column_names:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _OPC_COLS})
    pop = pd.Series(pop_tbl["n"].to_numpy(zero_copy_only=False),
                    index=pop_tbl["c_nationkey"].to_numpy(
                        zero_copy_only=False))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])
    orders = orders.map_batches(
        lambda b: b.filter(pc.is_valid(b["o_custkey"])),
        batch_format="pyarrow", batch_size=None)
    orders = attach_dim(orders, "o_custkey", sf_dir, "customer",
                        "c_custkey", ["c_nationkey"], how="inner")

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "nk": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        t = pa.table({
            "nk": b["c_nationkey"].cast(pa.int64()),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["nk"]).aggregate([("n", "sum")])
        return g.rename_columns(["nk", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["nk"]).aggregate([("n", "sum")])
        return g.rename_columns(["nk", "n"])

    oc = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
    ).to_pandas()
    counts = (dict(zip(oc["nk"].astype(np.int64),
                       oc["n"].astype(np.int64)))
              if "nk" in oc.columns else {})
    out = {c: [] for c in _OPC_COLS}
    for nk in sorted(pop.index.astype(np.int64)):
        n_cust = int(pop.loc[nk])
        n_ord = int(counts.get(int(nk), 0))
        if n_cust == 0:
            continue
        out["nationkey"].append(int(nk))
        out["n_customers"].append(n_cust)
        out["n_orders"].append(n_ord)
        out["orders_per_capita_x1e3"].append(
            _round_half_away(n_ord / n_cust * 1e3))
    return pa.table(
        {c: pa.array(out[c], pa.int64()) for c in _OPC_COLS})


OPC_SQL = """
WITH pop AS MATERIALIZED (
  SELECT c_nationkey AS nk,
         CAST(COUNT(*) AS BIGINT) AS n_cust
  FROM customer
  WHERE c_custkey IS NOT NULL AND c_nationkey IS NOT NULL
  GROUP BY 1
), oc AS MATERIALIZED (
  SELECT c.c_nationkey AS nk,
         CAST(COUNT(*) AS BIGINT) AS n_ord
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_custkey IS NOT NULL AND c.c_nationkey IS NOT NULL
  GROUP BY 1
)
SELECT CAST(pop.nk AS BIGINT) AS nationkey,
       pop.n_cust AS n_customers,
       CAST(COALESCE(oc.n_ord, 0) AS BIGINT) AS n_orders,
       CAST(ROUND(CAST(COALESCE(oc.n_ord, 0) AS DOUBLE)
            / pop.n_cust * 1000, 0) AS BIGINT)
         AS orders_per_capita_x1e3
FROM pop LEFT JOIN oc USING (nk)
WHERE pop.n_cust > 0
ORDER BY nationkey
"""

_MSS_COLS = ["mon", "n_shipped", "first3_shipped",
             "share_ppm"]


def q_month_start_ship_share(sf_dir):
    """Month-boundary operations: the share of each month's
    lineitems shipped in its FIRST three calendar days — the
    warehouse-side echo of month-end order batching; a spike here
    lagging the order-side month-end spike by days measures the
    queue's drain time.  Counts fold exactly."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_shipdate"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["l_shipdate"]))
        if b.num_rows == 0:
            return pa.table({
                "mon": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "f3": pa.array([], pa.int64()),
            })
        d = b["l_shipdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(np.int64)
        dom = d.dt.day.to_numpy(np.int64)
        t = pa.table({
            "mon": pa.array(mon),
            "n": pa.array(np.ones(len(mon), np.int64)),
            "f3": pa.array((dom <= 3).astype(np.int64)),
        })
        g = t.group_by(["mon"]).aggregate(
            [("n", "sum"), ("f3", "sum")])
        return g.rename_columns(["mon", "n", "f3"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["mon"]).aggregate(
            [("n", "sum"), ("f3", "sum")])
        return g.rename_columns(["mon", "n", "f3"])

    cc = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "mon" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _MSS_COLS})
    cc = cc.sort_values("mon", ignore_index=True)
    keep = cc["n"].astype(np.int64) > 0
    cc = cc[keep]
    ppm = [
        _round_half_away(f / n * 1e6)
        for f, n in zip(cc["f3"].astype(np.int64),
                        cc["n"].astype(np.int64))
    ]
    return pa.table({
        "mon": pa.array(cc["mon"].to_numpy(np.int64)),
        "n_shipped": pa.array(cc["n"].to_numpy(np.int64)),
        "first3_shipped": pa.array(cc["f3"].to_numpy(np.int64)),
        "share_ppm": pa.array(ppm, pa.int64()),
    })


MSS_SQL = """
WITH ms AS MATERIALIZED (
  SELECT YEAR(l_shipdate) * 12 + MONTH(l_shipdate) - 1 AS mon,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN DAY(l_shipdate) <= 3 THEN 1 ELSE 0
                  END) AS BIGINT) AS f3
  FROM lineitem WHERE l_shipdate IS NOT NULL
  GROUP BY 1
)
SELECT CAST(mon AS BIGINT) AS mon,
       n AS n_shipped,
       f3 AS first3_shipped,
       CAST(ROUND(CAST(f3 AS DOUBLE) / n * 1000000, 0)
            AS BIGINT) AS share_ppm
FROM ms WHERE n > 0 ORDER BY mon
"""


def register_r4hl(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "top_supplier_per_nation": q_top_supplier_per_nation,
            "orders_per_capita_nation": q_orders_per_capita_nation,
            "month_start_ship_share": q_month_start_ship_share,
        }
    )
    oracles.update(
        {
            "top_supplier_per_nation": TSN_SQL,
            "orders_per_capita_nation": OPC_SQL,
            "month_start_ship_share": MSS_SQL,
        }
    )
