"""Round-4 batch IW: the tax-rate menu, treasury vs throughput,
and the day's value rhythm — the tax-rate census (how many
distinct tax rates the ledger actually uses, and how dominant
the modal rate is — a wide menu is a compliance surface), the
supplier balance × volume correlation (do busy suppliers run
rich or stretched accounts?), and the daypart value mix (night /
morning / afternoon / evening shares of event count versus
value — when the money actually moves).

Exactness discipline: tax basis points, balance cents and line
counts are exact integers; the correlation folds exact moment
sums; daypart cuts are integer hour tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _HOUR_US,
    _round_half_away,
)
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_TRC_COLS = ["n_lines", "n_rates", "min_bp", "max_bp",
             "modal_bp", "modal_share_ppm"]


def q_tax_rate_census(sf_dir):
    """The compliance surface: distinct tax rates in use, their
    range, and the modal rate's share of all lines — every extra
    rate is a reconciliation rule somebody maintains.  The rate
    histogram folds exactly; the mode breaks ties on the
    smallest rate."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_tax"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["l_tax"]))
        if b.num_rows == 0:
            return pa.table({
                "bp": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        t = b["l_tax"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        bp = np.where(t >= 0, np.floor(t * 10000 + 0.5),
                      np.ceil(t * 10000 - 0.5)).astype(np.int64)
        tb = pa.table({
            "bp": pa.array(bp),
            "n": pa.array(np.ones(len(bp), np.int64)),
        })
        g = tb.group_by(["bp"]).aggregate([("n", "sum")])
        return g.rename_columns(["bp", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["bp"]).aggregate([("n", "sum")])
        return g.rename_columns(["bp", "n"])

    hist = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "bp" not in hist.columns or len(hist) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _TRC_COLS})
    tot = int(hist["n"].sum())
    modal = hist.sort_values(["n", "bp"],
                             ascending=[False, True]).iloc[0]
    return pa.table({
        "n_lines": pa.array([tot], pa.int64()),
        "n_rates": pa.array([len(hist)], pa.int64()),
        "min_bp": pa.array(
            [int(hist["bp"].min())], pa.int64()),
        "max_bp": pa.array(
            [int(hist["bp"].max())], pa.int64()),
        "modal_bp": pa.array([int(modal["bp"])], pa.int64()),
        "modal_share_ppm": pa.array(
            [_round_half_away(int(modal["n"]) / tot * 1e6)],
            pa.int64()),
    })


TRC_SQL = """
WITH th AS MATERIALIZED (
  SELECT CAST(ROUND(l_tax * 10000, 0) AS BIGINT) AS bp,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem WHERE l_tax IS NOT NULL
  GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(MIN(bp) AS BIGINT) AS mn,
         CAST(MAX(bp) AS BIGINT) AS mx
  FROM th
), modal AS MATERIALIZED (
  SELECT bp, n FROM th ORDER BY n DESC, bp ASC LIMIT 1
)
SELECT tot.t AS n_lines, tot.k AS n_rates,
       tot.mn AS min_bp, tot.mx AS max_bp,
       modal.bp AS modal_bp,
       CAST(ROUND(CAST(modal.n AS DOUBLE) / tot.t
            * 1000000, 0) AS BIGINT) AS modal_share_ppm
FROM tot CROSS JOIN modal
WHERE tot.t > 0
"""

_SBV_COLS = ["n_suppliers", "corr_ppm",
             "slope_cents_per_line_x1e3"]


def q_supplier_balance_volume_corr(sf_dir):
    """Do busy suppliers run rich accounts?  Pearson correlation
    and OLS slope of account balance (cents) on shipment volume
    (lines) across suppliers — negative means throughput drains
    working capital.  Per-supplier line counts fold exactly; the
    tiny supplier dim joins on the driver; moment sums are
    exact integers."""
    # the supplier dim streams; per-supplier volumes reduce in the
    # cluster and attach back (stages/broadcast.py); the moment sums are
    # exact int64 partials — nothing lands whole on the driver
    from mimirsbrunn_ray.stages.broadcast import attach_table

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["l_suppkey"]))
        t = pa.table({
            "sk": b["l_suppkey"].cast(pa.int64()),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["sk"]).aggregate([("n", "sum")])
        return g.rename_columns(["sk", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["sk"]).aggregate([("n", "sum")])
        return g.rename_columns(["sk", "n"])

    vol = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "sk" not in vol.columns:
        vol = pd.DataFrame({"sk": pd.Series([], dtype=np.int64),
                            "n": pd.Series([], dtype=np.int64)})
    vol_tbl = pa.Table.from_pandas(vol, preserve_index=False)

    def supp_proj(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b["s_suppkey"]),
                             pc.is_valid(b["s_acctbal"])))
        bal = b["s_acctbal"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        cents = np.where(bal >= 0, np.floor(bal * 100 + 0.5),
                         np.ceil(bal * 100 - 0.5)).astype(np.int64)
        return pa.table({
            "sk": b["s_suppkey"].cast(pa.int64()),
            "cents": pa.array(cents),
        })

    supp_ds = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_acctbal"],
    ).map_batches(supp_proj, batch_format="pyarrow", batch_size=None)
    supp_ds = attach_table(supp_ds, "sk", vol_tbl, "sk", ["n"],
                           how="left", out_names=["vol"])

    def mom_part(b: pa.Table) -> pa.Table:
        x = pc.fill_null(b["vol"], 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        y = b["cents"].to_numpy(zero_copy_only=False)
        return pa.table({
            "nn": pa.array([np.int64(len(x))]),
            "sx": pa.array([np.int64(x.sum())]),
            "sy": pa.array([np.int64(y.sum())]),
            "sxx": pa.array([np.int64((x * x).sum())]),
            "syy": pa.array([np.int64((y * y).sum())]),
            "sxy": pa.array([np.int64((x * y).sum())]),
        })

    mom = supp_ds.map_batches(
        mom_part, batch_format="pyarrow", batch_size=None).to_pandas()
    n = float(int(mom["nn"].sum())) if "nn" in mom.columns else 0.0
    if n < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SBV_COLS})
    sx, sy = float(mom["sx"].sum()), float(mom["sy"].sum())
    sxx = float(mom["sxx"].sum())
    syy = float(mom["syy"].sum())
    sxy = float(mom["sxy"].sum())
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    if denx <= 0 or deny <= 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SBV_COLS})
    cov = n * sxy - sx * sy
    return pa.table({
        "n_suppliers": pa.array([int(n)], pa.int64()),
        "corr_ppm": pa.array(
            [_round_half_away(cov / np.sqrt(denx * deny)
                              * 1e6)], pa.int64()),
        "slope_cents_per_line_x1e3": pa.array(
            [_round_half_away(cov / denx * 1e3)], pa.int64()),
    })


SBV_SQL = """
WITH vol AS MATERIALIZED (
  SELECT l_suppkey AS sk, CAST(COUNT(*) AS BIGINT) AS v
  FROM lineitem WHERE l_suppkey IS NOT NULL
  GROUP BY 1
), xy AS MATERIALIZED (
  SELECT COALESCE(vol.v, 0) AS x,
         CAST(ROUND(s.s_acctbal * 100, 0) AS BIGINT) AS y
  FROM supplier s LEFT JOIN vol ON vol.sk = s.s_suppkey
  WHERE s.s_suppkey IS NOT NULL AND s.s_acctbal IS NOT NULL
), mm AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM xy
)
SELECT n AS n_suppliers,
       CAST(ROUND((n * CAST(sxy AS DOUBLE) -
                   CAST(sx AS DOUBLE) * sy)
            / SQRT((n * CAST(sxx AS DOUBLE) -
                    CAST(sx AS DOUBLE) * sx)
                   * (n * CAST(syy AS DOUBLE) -
                      CAST(sy AS DOUBLE) * sy)) * 1000000, 0)
            AS BIGINT) AS corr_ppm,
       CAST(ROUND((n * CAST(sxy AS DOUBLE) -
                   CAST(sx AS DOUBLE) * sy)
            / (n * CAST(sxx AS DOUBLE) -
               CAST(sx AS DOUBLE) * sx) * 1000, 0) AS BIGINT)
         AS slope_cents_per_line_x1e3
FROM mm
WHERE n >= 3
  AND n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx > 0
  AND n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy > 0
"""

_DVM_COLS = ["daypart", "n_events", "count_share_ppm",
             "value_share_ppm"]


def q_daypart_value_mix(sf_dir):
    """When does the money move?  Events cut into four dayparts
    (night 0–5, morning 6–11, afternoon 12–17, evening 18–23 by
    hour of day), with each part's share of COUNT versus VALUE —
    a daypart that is 10% of events but 30% of value is where
    fraud review belongs.  Daypart sums fold exactly."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("ts", "value"))
        if b.num_rows == 0:
            return pa.table({
                "dp": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
            })
        us = b["ts"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        hod = (us // _HOUR_US) % 24
        dp = np.where(
            hod < 6, "a_night",
            np.where(hod < 12, "b_morning",
                     np.where(hod < 18, "c_afternoon",
                              "d_evening")))
        v = b["value"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        mills = np.where(v >= 0, np.floor(v * 1000 + 0.5),
                         np.ceil(v * 1000 - 0.5)).astype(
            np.int64)
        df = pd.DataFrame({"dp": dp, "n": 1, "s": mills})
        agg = df.groupby("dp").sum().reset_index()
        for c in ["n", "s"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["dp"]).aggregate(
            [("n", "sum"), ("s", "sum")])
        return g.rename_columns(["dp", "n", "s"])

    cc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "dp" not in cc.columns or len(cc) == 0:
        return pa.table({
            "daypart": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
            "count_share_ppm": pa.array([], pa.int64()),
            "value_share_ppm": pa.array([], pa.int64()),
        })
    tot_n = int(cc["n"].sum())
    tot_s = int(cc["s"].sum())
    if tot_n == 0 or tot_s == 0:
        return pa.table({
            "daypart": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
            "count_share_ppm": pa.array([], pa.int64()),
            "value_share_ppm": pa.array([], pa.int64()),
        })
    cc = cc.sort_values("dp")
    return pa.table({
        "daypart": pa.array(cc["dp"], pa.string()),
        "n_events": pa.array(
            cc["n"].to_numpy(np.int64), pa.int64()),
        "count_share_ppm": pa.array(
            [_round_half_away(n / tot_n * 1e6)
             for n in cc["n"]], pa.int64()),
        "value_share_ppm": pa.array(
            [_round_half_away(s / tot_s * 1e6)
             for s in cc["s"]], pa.int64()),
    })


DVM_SQL = f"""
WITH dv AS MATERIALIZED (
  SELECT CASE
           WHEN (EPOCH_US(ts) // {_HOUR_US}) % 24 < 6
             THEN 'a_night'
           WHEN (EPOCH_US(ts) // {_HOUR_US}) % 24 < 12
             THEN 'b_morning'
           WHEN (EPOCH_US(ts) // {_HOUR_US}) % 24 < 18
             THEN 'c_afternoon'
           ELSE 'd_evening' END AS dp,
         CAST(ROUND(value * 1000, 0) AS BIGINT) AS m
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
), cc AS MATERIALIZED (
  SELECT dp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(m) AS BIGINT) AS s
  FROM dv GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS tn,
         CAST(SUM(s) AS BIGINT) AS ts
  FROM cc
)
SELECT cc.dp AS daypart, cc.n AS n_events,
       CAST(ROUND(CAST(cc.n AS DOUBLE) / tot.tn * 1000000, 0)
            AS BIGINT) AS count_share_ppm,
       CAST(ROUND(CAST(cc.s AS DOUBLE) / tot.ts * 1000000, 0)
            AS BIGINT) AS value_share_ppm
FROM cc CROSS JOIN tot
WHERE tot.tn > 0 AND tot.ts <> 0
ORDER BY cc.dp
"""


def register_r4iw(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "tax_rate_census": q_tax_rate_census,
            "supplier_balance_volume_corr":
                q_supplier_balance_volume_corr,
            "daypart_value_mix": q_daypart_value_mix,
        }
    )
    oracles.update(
        {
            "tax_rate_census": TRC_SQL,
            "supplier_balance_volume_corr": SBV_SQL,
            "daypart_value_mix": DVM_SQL,
        }
    )
