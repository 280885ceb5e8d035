"""Round-4 batch IV: money and fulfilment state, basket position
economics, and segment wealth profiles — the order-status mix by
value tercile (do big orders close or linger — fulfilment state
as a function of money at stake), the quantity-by-line-number
profile (do baskets start big and trail off — the add-to-cart
decay curve), and the balance median/IQR by market segment (the
wealth distribution each segment actually holds, robust to the
whale tail).

Exactness discipline: value terciles are integer rank cuts with
deterministic tie-break; per-line-number quantity sums are
exact integers; medians and quartiles interpolate identically
on exact cents."""

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


_SVB_COLS = ["band", "o_orderstatus", "n_orders", "share_ppm"]


def q_order_status_by_value_band(sf_dir):
    """Does money at stake change fulfilment state?  Orders cut
    into value terciles (integer ranks over cents, ties by order
    key), then the status mix within each band — if the top
    tercile skews toward open status, the expensive orders are
    the slow ones.  The tercile cut and cell counts are exact."""
    from mimirsbrunn_ray.stages.rollup import tree_merge

    # scale shape: the tercile cut folds over a distributed
    # (cents, status) histogram — value-grain, a reduction — and only
    # the <=2 tie groups that STRADDLE a band boundary are re-read
    # (filtered, bounded by the tie-group size) to split them exactly
    # by the orderkey tie-break. Orders never land whole on the driver.
    def hist_part(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(b["o_orderkey"]),
                    pc.is_valid(b["o_totalprice"])),
            pc.is_valid(b["o_orderstatus"]))
        b = b.filter(m)
        if b.num_rows == 0:
            return pa.table({"cents": pa.array([], pa.int64()),
                             "st": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        tp = b["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = np.where(tp >= 0, np.floor(tp * 100 + 0.5),
                         np.ceil(tp * 100 - 0.5)).astype(np.int64)
        t = pa.table({"cents": pa.array(cents),
                      "st": b["o_orderstatus"],
                      "n": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["cents", "st"]).aggregate([("n", "sum")])
        return g.rename_columns(["cents", "st", "n"])

    def hist_comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["cents", "st"]).aggregate([("n", "sum")])
        return g.rename_columns(["cents", "st", "n"])

    orders_ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderstatus"])
    hist = tree_merge(
        orders_ds.map_batches(hist_part, batch_format="pyarrow",
                              batch_size=None),
        hist_comb).to_pandas()
    if "cents" not in hist.columns or len(hist) == 0:
        return pa.table({
            "band": pa.array([], pa.int64()),
            "o_orderstatus": pa.array([], pa.string()),
            "n_orders": pa.array([], pa.int64()),
            "share_ppm": pa.array([], pa.int64()),
        })
    hist = hist.sort_values(["cents", "st"], ignore_index=True)
    n = int(hist["n"].sum())
    gtot = hist.groupby("cents", sort=True)["n"].sum()
    gvals = gtot.index.to_numpy(np.int64)
    gcnt = gtot.to_numpy(np.int64)
    gend = np.cumsum(gcnt)          # 1-based end rank per cents group
    gstart = gend - gcnt            # 0-based start rank
    band_of = lambda rank0: (3 * rank0) // n
    cells: dict = {}

    def add_cell(band, st, cnt):
        if cnt > 0:
            cells[(band, st)] = cells.get((band, st), 0) + int(cnt)

    straddle = []
    for v, s0, e1 in zip(gvals, gstart, gend):
        b_lo, b_hi = band_of(int(s0)), band_of(int(e1) - 1)
        if b_lo == b_hi:
            sub = hist[hist["cents"] == v]
            for st, cnt in zip(sub["st"], sub["n"]):
                add_cell(b_lo, st, cnt)
        else:
            straddle.append((int(v), int(s0)))
    for v, s0 in straddle:
        def pull_group(b: pa.Table, _v=v) -> pa.Table:
            m = pc.and_(
                pc.and_(pc.is_valid(b["o_orderkey"]),
                        pc.is_valid(b["o_totalprice"])),
                pc.is_valid(b["o_orderstatus"]))
            b = b.filter(m)
            tp = b["o_totalprice"].to_numpy(zero_copy_only=False)
            cents = np.where(tp >= 0, np.floor(tp * 100 + 0.5),
                             np.ceil(tp * 100 - 0.5)).astype(np.int64)
            keep = cents == _v
            return pa.table({
                "ok": b["o_orderkey"].cast(pa.int64()).filter(pa.array(keep)),
                "st": b["o_orderstatus"].filter(pa.array(keep)),
            })

        grp = orders_ds.map_batches(
            pull_group, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        grp = grp.sort_values("ok", ignore_index=True)
        ranks0 = s0 + np.arange(len(grp), dtype=np.int64)
        bands = (3 * ranks0) // n
        for bnd, st in zip(bands, grp["st"]):
            add_cell(int(bnd), st, 1)

    cell = pd.DataFrame(
        [(b, st, c) for (b, st), c in cells.items()],
        columns=["band", "st", "n"]).sort_values(
            ["band", "st"], ignore_index=True)
    btot = cell.groupby("band")["n"].sum()
    return pa.table({
        "band": pa.array(
            cell["band"].to_numpy(np.int64), pa.int64()),
        "o_orderstatus": pa.array(cell["st"], pa.string()),
        "n_orders": pa.array(
            cell["n"].to_numpy(np.int64), pa.int64()),
        "share_ppm": pa.array(
            [_round_half_away(c / int(btot[b]) * 1e6)
             for b, c in zip(cell["band"], cell["n"])],
            pa.int64()),
    })


SVB_SQL = """
WITH oc AS MATERIALIZED (
  SELECT o_orderkey AS ok, o_orderstatus AS st,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL
    AND o_orderstatus IS NOT NULL
), rk AS MATERIALIZED (
  SELECT st,
         (3 * (ROW_NUMBER() OVER (ORDER BY cents, ok) - 1))
           // (SELECT COUNT(*) FROM oc) AS band
  FROM oc
), cell AS MATERIALIZED (
  SELECT band, st, CAST(COUNT(*) AS BIGINT) AS n
  FROM rk GROUP BY 1, 2
), bt AS MATERIALIZED (
  SELECT band, CAST(SUM(n) AS BIGINT) AS t
  FROM cell GROUP BY 1
)
SELECT CAST(cell.band AS BIGINT) AS band,
       cell.st AS o_orderstatus,
       cell.n AS n_orders,
       CAST(ROUND(CAST(cell.n AS DOUBLE) / bt.t * 1000000, 0)
            AS BIGINT) AS share_ppm
FROM cell JOIN bt USING (band)
ORDER BY cell.band, cell.st
"""

_QLN_COLS = ["l_linenumber", "n_lines", "mean_qty_x1e3"]


def q_quantity_by_linenumber(sf_dir):
    """The add-to-cart decay curve: mean quantity per line
    number (1..7) — if later lines carry smaller quantities, the
    basket's economics are front-loaded and line-count alone
    overstates depth.  Per-line-number quantity sums fold
    exactly."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_linenumber", "l_quantity"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_linenumber", "l_quantity"))
        if b.num_rows == 0:
            return pa.table({
                "ln": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
            })
        qf = b["l_quantity"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        q = np.where(qf >= 0, np.floor(qf + 0.5),
                     np.ceil(qf - 0.5)).astype(np.int64)
        df = pd.DataFrame({
            "ln": b["l_linenumber"].cast(pa.int64()).to_numpy(
                zero_copy_only=False),
            "n": 1, "s": q,
        })
        agg = df.groupby("ln").sum().reset_index()
        for c in ["ln", "n", "s"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["ln"]).aggregate(
            [("n", "sum"), ("s", "sum")])
        return g.rename_columns(["ln", "n", "s"])

    cc = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "ln" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _QLN_COLS})
    cc = cc.sort_values("ln")
    return pa.table({
        "l_linenumber": pa.array(
            cc["ln"].to_numpy(np.int64), pa.int64()),
        "n_lines": pa.array(
            cc["n"].to_numpy(np.int64), pa.int64()),
        "mean_qty_x1e3": pa.array(
            [_round_half_away(s / n * 1e3)
             for s, n in zip(cc["s"], cc["n"])], pa.int64()),
    })


QLN_SQL = """
WITH qc AS MATERIALIZED (
  SELECT CAST(l_linenumber AS BIGINT) AS ln,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT))
              AS BIGINT) AS s
  FROM lineitem
  WHERE l_linenumber IS NOT NULL AND l_quantity IS NOT NULL
  GROUP BY 1
)
SELECT ln AS l_linenumber, n AS n_lines,
       CAST(ROUND(CAST(s AS DOUBLE) / n * 1000, 0) AS BIGINT)
         AS mean_qty_x1e3
FROM qc
ORDER BY ln
"""

_MBS_COLS = ["c_mktsegment", "n_customers", "median_cents",
             "iqr_cents"]


def q_median_balance_by_segment(sf_dir):
    """Each segment's actual wealth profile: the median and
    interquartile range of account balance (cents) per market
    segment — robust numbers a single whale cannot bend, the
    honest basis for any credit policy per segment.  Quantiles
    interpolate identically over exact cents."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_mktsegment", "c_acctbal"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("c_mktsegment", "c_acctbal"))
        if b.num_rows == 0:
            return pa.table({
                "seg": pa.array([], pa.string()),
                "cents": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        bal = b["c_acctbal"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(bal >= 0, np.floor(bal * 100 + 0.5),
                         np.ceil(bal * 100 - 0.5)).astype(
            np.int64)
        t = pa.table({
            "seg": b["c_mktsegment"].cast(pa.string()),
            "cents": pa.array(cents),
            "n": pa.array(np.ones(len(cents), np.int64)),
        })
        g = t.group_by(["seg", "cents"]).aggregate([("n", "sum")])
        return g.rename_columns(["seg", "cents", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["seg", "cents"]).aggregate(
            [("n", "sum")])
        return g.rename_columns(["seg", "cents", "n"])

    hist = tree_merge(
        cust.map_batches(part, batch_format="pyarrow",
                         batch_size=None), comb).to_pandas()
    if "seg" not in hist.columns or len(hist) == 0:
        return pa.table({
            "c_mktsegment": pa.array([], pa.string()),
            "n_customers": pa.array([], pa.int64()),
            "median_cents": pa.array([], pa.int64()),
            "iqr_cents": pa.array([], pa.int64()),
        })
    rows = []
    for seg, g in hist.groupby("seg"):
        v = np.repeat(g["cents"].to_numpy(np.int64),
                      g["n"].to_numpy(np.int64)).astype(
            np.float64)
        q1 = float(np.percentile(v, 25))
        q2 = float(np.percentile(v, 50))
        q3 = float(np.percentile(v, 75))
        rows.append((seg, len(v), _round_half_away(q2),
                     _round_half_away(q3 - q1)))
    rows.sort()
    return pa.table({
        "c_mktsegment": pa.array(
            [r[0] for r in rows], pa.string()),
        "n_customers": pa.array(
            [r[1] for r in rows], pa.int64()),
        "median_cents": pa.array(
            [r[2] for r in rows], pa.int64()),
        "iqr_cents": pa.array(
            [r[3] for r in rows], pa.int64()),
    })


MBS_SQL = """
WITH cb AS MATERIALIZED (
  SELECT c_mktsegment AS seg,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer
  WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL
), q AS MATERIALIZED (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
         QUANTILE_CONT(cents, 0.25) AS q1,
         QUANTILE_CONT(cents, 0.50) AS q2,
         QUANTILE_CONT(cents, 0.75) AS q3
  FROM cb GROUP BY 1
)
SELECT seg AS c_mktsegment, n AS n_customers,
       CAST(ROUND(q2, 0) AS BIGINT) AS median_cents,
       CAST(ROUND(q3 - q1, 0) AS BIGINT) AS iqr_cents
FROM q
ORDER BY seg
"""


def register_r4iv(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "order_status_by_value_band":
                q_order_status_by_value_band,
            "quantity_by_linenumber": q_quantity_by_linenumber,
            "median_balance_by_segment":
                q_median_balance_by_segment,
        }
    )
    oracles.update(
        {
            "order_status_by_value_band": SVB_SQL,
            "quantity_by_linenumber": QLN_SQL,
            "median_balance_by_segment": MBS_SQL,
        }
    )
