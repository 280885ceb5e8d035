"""Round-4 batch IF: ledger reconciliation, regional treasury,
and sub-hour clock artifacts — the order-total reconciliation
audit (does o_totalprice equal the sum of its lines'
extendedprice·(1−discount)·(1+tax), and how big are the
residuals?), the supplier balance sheet by region (counts,
negative-balance share and mean balance through the
supplier→nation→region rollup), and the minute-of-hour
uniformity test (a chi-square over the 60 minute bins — batch
jobs and cron artifacts spike :00).

Exactness discipline: both ledger sides fold to exact cents
(per-line cents rounded once, summed as integers), residuals
compare as integers; balances are exact cents; minute bins are
exact counts with the mirrored chi-square."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _round_half_away,
)
from mimirsbrunn_ray.stages.rollup import tree_merge

_MIN_US = 60_000_000


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_TRA_COLS = ["n_orders", "n_exact", "exact_ppm",
             "mean_abs_resid_cents_x1e3",
             "max_abs_resid_cents"]


def q_totalprice_recon_audit(sf_dir):
    """Ledger reconciliation: per order, the difference between
    o_totalprice and the sum over its lines of
    extendedprice·(1−discount)·(1+tax) — exact-match rate, mean
    and max absolute residual in cents.  Line cents fold per
    order key in disjoint shards; the header side joins by hash
    and compares integers."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_tax"])

    def lpart(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_orderkey", "l_extendedprice",
                       "l_discount", "l_tax"))
        if b.num_rows == 0:
            return pa.table({
                "ok": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        amt = (b["l_extendedprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
            * (1.0 - b["l_discount"].cast(pa.float64()).to_numpy(
                zero_copy_only=False))
            * (1.0 + b["l_tax"].cast(pa.float64()).to_numpy(
                zero_copy_only=False)))
        cents = np.where(amt >= 0, np.floor(amt * 100.0 + 0.5),
                         np.ceil(amt * 100.0 - 0.5)).astype(
            np.int64)
        t = pa.table({
            "ok": b["l_orderkey"].cast(pa.int64()),
            "cents": pa.array(cents),
        })
        g = t.group_by(["ok"]).aggregate([("cents", "sum")])
        return g.rename_columns(["ok", "cents"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["ok"]).aggregate([("cents", "sum")])
        return g.rename_columns(["ok", "cents"])

    lsum = tree_merge(
        li.map_batches(lpart, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["ok"],
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice"])

    def opart(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_orderkey", "o_totalprice"))
        if b.num_rows == 0:
            return pa.table({
                "ok": pa.array([], pa.int64()),
                "hdr": pa.array([], pa.int64()),
            })
        tp = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        hdr = np.where(tp >= 0, np.floor(tp * 100.0 + 0.5),
                       np.ceil(tp * 100.0 - 0.5)).astype(
            np.int64)
        return pa.table({
            "ok": b["o_orderkey"].cast(pa.int64()),
            "hdr": pa.array(hdr),
        })

    hdr = orders.map_batches(opart, batch_format="pyarrow",
                             batch_size=None)
    lsum = lsum.materialize()
    hdr = hdr.materialize()
    if lsum.count() == 0 or hdr.count() == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _TRA_COLS})
    joined = _safe_join(
        hdr, lsum,
        on=("ok",),
        join_type="inner",
        num_partitions=16,
    )

    def stat(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "n": pa.array([], pa.int64()),
                "ex": pa.array([], pa.int64()),
                "sabs": pa.array([], pa.int64()),
                "mabs": pa.array([], pa.int64()),
            })
        resid = (b["hdr"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
            - b["cents"].cast(pa.int64()).to_numpy(
                zero_copy_only=False))
        ab = np.abs(resid)
        return pa.table({
            "n": pa.array([b.num_rows], pa.int64()),
            "ex": pa.array([int((ab == 0).sum())], pa.int64()),
            "sabs": pa.array([int(ab.sum())], pa.int64()),
            "mabs": pa.array([int(ab.max())], pa.int64()),
        })

    def scomb(b: pa.Table) -> pa.Table:
        return pa.table({
            "n": pa.array(
                [pc.sum(b["n"]).as_py() or 0], pa.int64()),
            "ex": pa.array(
                [pc.sum(b["ex"]).as_py() or 0], pa.int64()),
            "sabs": pa.array(
                [pc.sum(b["sabs"]).as_py() or 0], pa.int64()),
            "mabs": pa.array(
                [pc.max(b["mabs"]).as_py() or 0], pa.int64()),
        })

    st = tree_merge(
        joined.map_batches(stat, batch_format="pyarrow",
                           batch_size=None),
        scomb,
    ).to_pandas()
    if "n" not in st.columns or len(st) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _TRA_COLS})
    n = int(st["n"].sum())
    if n == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _TRA_COLS})
    ex = int(st["ex"].sum())
    sabs = int(st["sabs"].sum())
    mabs = int(st["mabs"].max())
    return pa.table({
        "n_orders": pa.array([n], pa.int64()),
        "n_exact": pa.array([ex], pa.int64()),
        "exact_ppm": pa.array(
            [_round_half_away(ex / n * 1e6)], pa.int64()),
        "mean_abs_resid_cents_x1e3": pa.array(
            [_round_half_away(sabs / n * 1e3)], pa.int64()),
        "max_abs_resid_cents": pa.array([mabs], pa.int64()),
    })


TRA_SQL = """
WITH ls AS MATERIALIZED (
  SELECT l_orderkey AS ok,
         CAST(SUM(CAST(ROUND(l_extendedprice
                             * (1 - l_discount)
                             * (1 + l_tax) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_discount IS NOT NULL AND l_tax IS NOT NULL
  GROUP BY 1
), j AS MATERIALIZED (
  SELECT ABS(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)
             - ls.cents) AS ab
  FROM orders o JOIN ls ON ls.ok = o.o_orderkey
  WHERE o.o_totalprice IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN ab = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact,
       CAST(ROUND(CAST(SUM(CASE WHEN ab = 0 THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*) * 1000000, 0)
            AS BIGINT) AS exact_ppm,
       CAST(ROUND(CAST(SUM(ab) AS DOUBLE) / COUNT(*) * 1000, 0)
            AS BIGINT) AS mean_abs_resid_cents_x1e3,
       CAST(MAX(ab) AS BIGINT) AS max_abs_resid_cents
FROM j HAVING COUNT(*) > 0
"""

_SBR_COLS = ["r_name", "n_suppliers", "neg_share_ppm",
             "mean_balance_cents"]


def q_supplier_balance_by_region(sf_dir):
    """Regional treasury: per region, supplier count, the share
    with negative account balance, and the mean balance — which
    region's supply base is financially stretched.  Suppliers
    aggregate distributed by nation key; the tiny
    nation → region map broadcasts."""
    nation = rd.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region = rd.read_parquet(
        f"{sf_dir}/region.parquet",
        columns=["r_regionkey", "r_name"]).to_pandas()
    if len(nation) == 0 or len(region) == 0:
        return pa.table({
            "r_name": pa.array([], pa.string()),
            "n_suppliers": pa.array([], pa.int64()),
            "neg_share_ppm": pa.array([], pa.int64()),
            "mean_balance_cents": pa.array([], pa.int64()),
        })
    n2r = dict(zip(nation["n_nationkey"].astype(np.int64),
                   nation["n_regionkey"].astype(np.int64)))

    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_nationkey", "s_acctbal"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("s_nationkey", "s_acctbal"))
        if b.num_rows == 0:
            return pa.table({
                "rk": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "neg": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        nk = b["s_nationkey"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        rk = np.array([n2r.get(k, -1) for k in nk], np.int64)
        bal = b["s_acctbal"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(bal >= 0, np.floor(bal * 100.0 + 0.5),
                         np.ceil(bal * 100.0 - 0.5)).astype(
            np.int64)
        keep = rk >= 0
        df = pd.DataFrame({
            "rk": rk[keep], "n": 1,
            "neg": (cents[keep] < 0).astype(np.int64),
            "cents": cents[keep],
        })
        agg = df.groupby("rk").agg(
            n=("n", "sum"), neg=("neg", "sum"),
            cents=("cents", "sum")).reset_index()
        for c in ["rk", "n", "neg", "cents"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["rk"]).aggregate(
            [("n", "sum"), ("neg", "sum"), ("cents", "sum")])
        return g.rename_columns(["rk", "n", "neg", "cents"])

    cc = tree_merge(
        supp.map_batches(part, batch_format="pyarrow",
                         batch_size=None),
        comb,
    ).to_pandas()
    if "rk" not in cc.columns or len(cc) == 0:
        return pa.table({
            "r_name": pa.array([], pa.string()),
            "n_suppliers": pa.array([], pa.int64()),
            "neg_share_ppm": pa.array([], pa.int64()),
            "mean_balance_cents": pa.array([], pa.int64()),
        })
    m = cc.merge(
        region.rename(columns={"r_regionkey": "rk"}), on="rk")
    m = m.sort_values("r_name")
    return pa.table({
        "r_name": pa.array(m["r_name"], pa.string()),
        "n_suppliers": pa.array(
            m["n"].to_numpy(np.int64), pa.int64()),
        "neg_share_ppm": pa.array(
            [_round_half_away(g / n * 1e6)
             for g, n in zip(m["neg"], m["n"])], pa.int64()),
        "mean_balance_cents": pa.array(
            [_round_half_away(c / n)
             for c, n in zip(m["cents"], m["n"])], pa.int64()),
    })


SBR_SQL = """
WITH sb AS MATERIALIZED (
  SELECT n.n_regionkey AS rk,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN CAST(ROUND(s.s_acctbal * 100, 0)
                             AS BIGINT) < 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS neg,
         CAST(SUM(CAST(ROUND(s.s_acctbal * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE s.s_acctbal IS NOT NULL
  GROUP BY 1
)
SELECT r.r_name,
       sb.n AS n_suppliers,
       CAST(ROUND(CAST(sb.neg AS DOUBLE) / sb.n * 1000000, 0)
            AS BIGINT) AS neg_share_ppm,
       CAST(ROUND(CAST(sb.cents AS DOUBLE) / sb.n, 0)
            AS BIGINT) AS mean_balance_cents
FROM sb JOIN region r ON r.r_regionkey = sb.rk
ORDER BY r.r_name
"""

_MOU_COLS = ["n_events", "chi2_x1e3", "max_minute",
             "max_share_ppm"]


def q_minute_of_hour_uniformity(sf_dir):
    """Cron-artifact detector: a chi-square of event counts over
    the 60 minute-of-hour bins against uniform — humans are flat
    across the hour, schedulers spike :00 and :30; also the
    hottest minute and its share.  Minute-bin counts fold
    exactly; the peak minute is tie-safe (smallest wins)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table({
                "m": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        us = b["ts"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        m = (us // _MIN_US) % 60
        t = pa.table({
            "m": pa.array(m.astype(np.int64)),
            "n": pa.array(np.ones(len(m), np.int64)),
        })
        g = t.group_by(["m"]).aggregate([("n", "sum")])
        return g.rename_columns(["m", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["m"]).aggregate([("n", "sum")])
        return g.rename_columns(["m", "n"])

    cc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "m" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _MOU_COLS})
    full = np.zeros(60, np.int64)
    for _, r in cc.iterrows():
        full[int(r["m"])] = int(r["n"])
    tot = int(full.sum())
    if tot == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _MOU_COLS})
    exp = tot / 60.0
    chi2 = float((((full - exp) ** 2) / exp).sum())
    mx = int(full.max())
    mmin = int(np.argmax(full))
    return pa.table({
        "n_events": pa.array([tot], pa.int64()),
        "chi2_x1e3": pa.array(
            [_round_half_away(chi2 * 1e3)], pa.int64()),
        "max_minute": pa.array([mmin], pa.int64()),
        "max_share_ppm": pa.array(
            [_round_half_away(mx / tot * 1e6)], pa.int64()),
    })


MOU_SQL = f"""
WITH RECURSIVE mc AS MATERIALIZED (
  SELECT (EPOCH_US(ts) // {_MIN_US}) % 60 AS m,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1
), mins AS (
  SELECT CAST(0 AS BIGINT) AS m
  UNION ALL
  SELECT m + 1 FROM mins WHERE m + 1 <= 59
), fl AS MATERIALIZED (
  SELECT mins.m, COALESCE(mc.n, 0) AS n
  FROM mins LEFT JOIN mc USING (m)
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS t FROM fl
), chi AS MATERIALIZED (
  SELECT SUM((n - tot.t / 60.0) * (n - tot.t / 60.0)
             / (tot.t / 60.0)) AS chi2
  FROM fl CROSS JOIN tot
), pk AS MATERIALIZED (
  SELECT m, n FROM fl
  ORDER BY n DESC, m ASC LIMIT 1
)
SELECT tot.t AS n_events,
       CAST(ROUND(chi.chi2 * 1000, 0) AS BIGINT) AS chi2_x1e3,
       pk.m AS max_minute,
       CAST(ROUND(CAST(pk.n AS DOUBLE) / tot.t * 1000000, 0)
            AS BIGINT) AS max_share_ppm
FROM tot CROSS JOIN chi CROSS JOIN pk
WHERE tot.t > 0
"""


def register_r4if(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "totalprice_recon_audit": q_totalprice_recon_audit,
            "supplier_balance_by_region":
                q_supplier_balance_by_region,
            "minute_of_hour_uniformity":
                q_minute_of_hour_uniformity,
        }
    )
    oracles.update(
        {
            "totalprice_recon_audit": TRA_SQL,
            "supplier_balance_by_region": SBR_SQL,
            "minute_of_hour_uniformity": MOU_SQL,
        }
    )
