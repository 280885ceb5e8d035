"""Round-4 batch JH: clamp floors, affordability stress, and
burst-buying records — the value floor census (how much of each
event stream sits exactly at the global minimum value — the
fingerprint of a pricing floor or a clamped sensor), the order
affordability census (orders whose total exceeds the customer's
account balance — exact integer comparison, the credit-exposure
headcount), and the monthly order-burst record (the most orders
any customer placed in one calendar month, plus how many
customer-months hit 5+).

Exactness discipline: floor membership and
order-exceeds-balance are exact integer comparisons; burst
counts fold exactly; only final shares divide."""

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


_VFC_COLS = ["event_type", "n_events", "floor_mills",
             "at_floor_ppm"]


def q_value_floor_census(sf_dir):
    """The clamp fingerprint: the global minimum event value
    (mills) and, per type, the share of events sitting EXACTLY
    on it — organic value distributions don't pile up on their
    minimum; floors and clamps do.  The (type, mills) histogram
    folds once; floor membership is exact."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "value"))
        if b.num_rows == 0:
            return pa.table({
                "et": pa.array([], pa.string()),
                "m": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        v = b["value"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        mills = np.where(v >= 0, np.floor(v * 1000 + 0.5),
                         np.ceil(v * 1000 - 0.5)).astype(
            np.int64)
        df = pd.DataFrame({
            "et": np.asarray(
                b["event_type"].to_numpy(zero_copy_only=False)),
            "m": mills, "n": 1,
        })
        agg = df.groupby(["et", "m"]).sum().reset_index()
        agg["m"] = agg["m"].astype(np.int64)
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["et", "m"]).aggregate([("n", "sum")])
        return g.rename_columns(["et", "m", "n"])

    hist = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "et" not in hist.columns or len(hist) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
            "floor_mills": pa.array([], pa.int64()),
            "at_floor_ppm": pa.array([], pa.int64()),
        })
    floor = int(hist["m"].min())
    rows = []
    for et, g in hist.groupby("et"):
        tot = int(g["n"].sum())
        at = int(g.loc[g["m"] == floor, "n"].sum())
        rows.append((et, tot, floor,
                     _round_half_away(at / tot * 1e6)))
    rows.sort()
    return pa.table({
        "event_type": pa.array(
            [r[0] for r in rows], pa.string()),
        "n_events": pa.array([r[1] for r in rows], pa.int64()),
        "floor_mills": pa.array(
            [r[2] for r in rows], pa.int64()),
        "at_floor_ppm": pa.array(
            [r[3] for r in rows], pa.int64()),
    })


VFC_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type AS et,
         CAST(ROUND(value * 1000, 0) AS BIGINT) AS m
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), fl AS MATERIALIZED (
  SELECT CAST(MIN(m) AS BIGINT) AS floor FROM v
)
SELECT v.et AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(ANY_VALUE(fl.floor) AS BIGINT) AS floor_mills,
       CAST(ROUND(CAST(SUM(CASE WHEN v.m = fl.floor THEN 1
                                ELSE 0 END) AS DOUBLE)
            / COUNT(*) * 1000000, 0) AS BIGINT)
         AS at_floor_ppm
FROM v CROSS JOIN fl
GROUP BY v.et
ORDER BY v.et
"""

_OAC_COLS = ["n_orders", "n_exceed", "exceed_ppm",
             "median_ratio_x1e3"]


def q_order_affordability_census(sf_dir):
    """Credit exposure, headcounted: orders whose total price
    exceeds the customer's account balance (exact cents
    comparison, positive balances only), and the median
    order-to-balance ratio — every exceeding order is credit the
    books quietly extend.  The tiny balance map broadcasts into
    an exact counting pass."""
    # scale shape: the balance attaches via budget-gated broadcast /
    # join, exceed counts fold as per-batch partials, and the ratio
    # median resolves via the distributed sort + block-span pull of
    # stages/exactrank.quantile_float — neither table lands whole on
    # the driver.
    from mimirsbrunn_ray.stages.broadcast import attach_dim
    from mimirsbrunn_ray.stages.exactrank import quantile_float

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"])
    orders = orders.map_batches(
        lambda b: _valid(b, ("o_custkey", "o_totalprice")),
        batch_format="pyarrow", batch_size=None)
    orders = attach_dim(orders, "o_custkey", sf_dir, "customer",
                        "c_custkey", ["c_acctbal"], how="inner")

    def to_ratio(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"ex": pa.array([], pa.int64()),
                             "ratio": pa.array([], pa.float64())})
        tp = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        oc = np.where(tp >= 0, np.floor(tp * 100 + 0.5),
                      np.ceil(tp * 100 - 0.5)).astype(np.int64)
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        bc = np.where(bal >= 0, np.floor(bal * 100 + 0.5),
                      np.ceil(bal * 100 - 0.5)).astype(np.int64)
        keep = bc > 0
        oc, bc = oc[keep], bc[keep]
        return pa.table({
            "ex": pa.array((oc > bc).astype(np.int64)),
            "ratio": pa.array(oc.astype(np.float64) / bc),
        })

    ratios = orders.map_batches(
        to_ratio, batch_format="pyarrow", batch_size=None).materialize()

    def cnt_part(b: pa.Table) -> pa.Table:
        return pa.table({
            "n": pa.array([np.int64(b.num_rows)]),
            "ex": pa.array([np.int64(
                pc.sum(b["ex"]).as_py() or 0)]),
        })

    cp = ratios.map_batches(
        cnt_part, batch_format="pyarrow", batch_size=None).to_pandas()
    n = int(cp["n"].sum()) if "n" in cp.columns else 0
    if n == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _OAC_COLS})
    ex = int(cp["ex"].sum())
    med = quantile_float(ratios, "ratio", 50)
    return pa.table({
        "n_orders": pa.array([n], pa.int64()),
        "n_exceed": pa.array([ex], pa.int64()),
        "exceed_ppm": pa.array(
            [_round_half_away(ex / n * 1e6)], pa.int64()),
        "median_ratio_x1e3": pa.array(
            [_round_half_away(med * 1e3)], pa.int64()),
    })


OAC_SQL = """
WITH ob AS MATERIALIZED (
  SELECT CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS oc,
         CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT) AS bc
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_totalprice IS NOT NULL AND c.c_acctbal IS NOT NULL
    AND CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT) > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN oc > bc THEN 1 ELSE 0 END)
            AS BIGINT) AS n_exceed,
       CAST(ROUND(CAST(SUM(CASE WHEN oc > bc THEN 1 ELSE 0
                           END) AS DOUBLE) / COUNT(*)
            * 1000000, 0) AS BIGINT) AS exceed_ppm,
       CAST(ROUND(QUANTILE_CONT(CAST(oc AS DOUBLE) / bc, 0.5)
            * 1000, 0) AS BIGINT) AS median_ratio_x1e3
FROM ob HAVING COUNT(*) > 0
"""

_MBR_COLS = ["max_orders_one_month", "n_custmonths_5plus",
             "n_custmonths", "heavy_ppm"]


def q_monthly_order_burst_record(sf_dir):
    """Burst buying: the record number of orders one customer
    placed in a single calendar month, and how many
    customer-months reached 5+ orders — procurement bots and
    resellers live in this tail.  Per-(customer, month) counts
    fold exactly."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderdate"))
        if b.num_rows == 0:
            return pa.table({
                "ck": pa.array([], pa.int64()),
                "mon": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(
            np.int64)
        df = pd.DataFrame({
            "ck": b["o_custkey"].cast(pa.int64()).to_numpy(
                zero_copy_only=False),
            "mon": mon, "n": 1,
        })
        agg = df.groupby(["ck", "mon"]).sum().reset_index()
        for c in ["ck", "mon", "n"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["ck", "mon"]).aggregate([("n", "sum")])
        return g.rename_columns(["ck", "mon", "n"])

    cm = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["ck"],
    ).to_pandas()
    if "ck" not in cm.columns or len(cm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _MBR_COLS})
    n = cm["n"].to_numpy(np.int64)
    tot = len(cm)
    heavy = int((n >= 5).sum())
    return pa.table({
        "max_orders_one_month": pa.array(
            [int(n.max())], pa.int64()),
        "n_custmonths_5plus": pa.array([heavy], pa.int64()),
        "n_custmonths": pa.array([tot], pa.int64()),
        "heavy_ppm": pa.array(
            [_round_half_away(heavy / tot * 1e6)], pa.int64()),
    })


MBR_SQL = """
WITH cm AS MATERIALIZED (
  SELECT o_custkey AS ck,
         YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1
           AS mon,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
  GROUP BY 1, 2
)
SELECT CAST(MAX(n) AS BIGINT) AS max_orders_one_month,
       CAST(SUM(CASE WHEN n >= 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_custmonths_5plus,
       CAST(COUNT(*) AS BIGINT) AS n_custmonths,
       CAST(ROUND(CAST(SUM(CASE WHEN n >= 5 THEN 1 ELSE 0
                           END) AS DOUBLE) / COUNT(*)
            * 1000000, 0) AS BIGINT) AS heavy_ppm
FROM cm HAVING COUNT(*) > 0
"""


def register_r4jh(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "value_floor_census": q_value_floor_census,
            "order_affordability_census":
                q_order_affordability_census,
            "monthly_order_burst_record":
                q_monthly_order_burst_record,
        }
    )
    oracles.update(
        {
            "value_floor_census": VFC_SQL,
            "order_affordability_census": OAC_SQL,
            "monthly_order_burst_record": MBR_SQL,
        }
    )
