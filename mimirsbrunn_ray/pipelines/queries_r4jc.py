"""Round-4 batch JC: rank stability over time, geographic
wealth inequality, and calendar-honest volume — the type
value-rank halves test (do event types keep their mean-value
ranking between the first and second half of the window — the
Spearman footrule on exactly computed ranks), the balance Gini
by nation (wealth inequality of the customer base, nation by
nation), and the orders-per-day monthly series (volume divided
by the actual days in each month — February stops looking like
a slump).

Exactness discipline: half-window cuts use the exact median
microsecond; ranks and footrule distances are integers; Ginis
use the exact rank formula; days-in-month come from the same
calendar on both sides."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _round_half_away,
)
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_TVH_COLS = ["n_types", "footrule", "max_footrule",
             "stability_ppm"]


def q_type_value_rank_halves(sf_dir):
    """Do the streams keep their pecking order?  Event types
    ranked by mean value in the first half of the time window
    (split at the midpoint between global min and max
    microsecond) and again in the second half; the Spearman
    footrule distance between the two rankings, its maximum
    possible value, and the stability 1 − d/d_max.  Mean values
    come from exact mill sums; ranks break ties
    lexicographically."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def span_part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table({
                "mn": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64()),
            })
        us = b["ts"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "mn": pa.array([int(us.min())], pa.int64()),
            "mx": pa.array([int(us.max())], pa.int64()),
        })

    def span_comb(b: pa.Table) -> pa.Table:
        return pa.table({
            "mn": pa.array(
                [pc.min(b["mn"]).as_py() or 0], pa.int64()),
            "mx": pa.array(
                [pc.max(b["mx"]).as_py() or 0], pa.int64()),
        })

    sp = tree_merge(
        ev.map_batches(span_part, batch_format="pyarrow",
                       batch_size=None), span_comb).to_pandas()
    if "mn" not in sp.columns or len(sp) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _TVH_COLS})
    mid = (int(sp["mn"].min()) + int(sp["mx"].max())) // 2

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "ts", "value"))
        if b.num_rows == 0:
            return pa.table({
                "et": pa.array([], pa.string()),
                "half": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
            })
        us = b["ts"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        half = (us > mid).astype(np.int64)
        v = b["value"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        mills = np.where(v >= 0, np.floor(v * 1000 + 0.5),
                         np.ceil(v * 1000 - 0.5)).astype(
            np.int64)
        df = pd.DataFrame({
            "et": np.asarray(
                b["event_type"].to_numpy(zero_copy_only=False)),
            "half": half, "n": 1, "s": mills,
        })
        agg = df.groupby(["et", "half"]).sum().reset_index()
        for c in ["half", "n", "s"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["et", "half"]).aggregate(
            [("n", "sum"), ("s", "sum")])
        return g.rename_columns(["et", "half", "n", "s"])

    cc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "et" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _TVH_COLS})
    piv = {}
    for (et, half), g in cc.groupby(["et", "half"]):
        n = int(g["n"].sum())
        s = int(g["s"].sum())
        if n > 0:
            piv.setdefault(et, {})[int(half)] = s / n
    types = sorted(et for et, d in piv.items()
                   if 0 in d and 1 in d)
    k = len(types)
    if k < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _TVH_COLS})

    def ranks(vals):
        order = sorted(range(k),
                       key=lambda i: (-vals[i], types[i]))
        r = [0] * k
        for pos, i in enumerate(order):
            r[i] = pos + 1
        return r

    r0 = ranks([piv[t][0] for t in types])
    r1 = ranks([piv[t][1] for t in types])
    foot = sum(abs(a - b) for a, b in zip(r0, r1))
    max_foot = (k * k) // 2
    return pa.table({
        "n_types": pa.array([k], pa.int64()),
        "footrule": pa.array([foot], pa.int64()),
        "max_footrule": pa.array([max_foot], pa.int64()),
        "stability_ppm": pa.array(
            [_round_half_away((1.0 - foot / max_foot) * 1e6)],
            pa.int64()),
    })


TVH_SQL = """
WITH sp AS MATERIALIZED (
  SELECT (CAST(MIN(EPOCH_US(ts)) AS BIGINT)
          + CAST(MAX(EPOCH_US(ts)) AS BIGINT)) // 2 AS mid
  FROM events WHERE ts IS NOT NULL
), hm AS MATERIALIZED (
  SELECT event_type AS et,
         CASE WHEN EPOCH_US(ts) > sp.mid THEN 1 ELSE 0 END
           AS half,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(value * 1000, 0) AS BIGINT))
              AS BIGINT) AS s
  FROM events CROSS JOIN sp
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL
  GROUP BY 1, 2
), mv AS MATERIALIZED (
  SELECT et, half, CAST(s AS DOUBLE) / n AS mean
  FROM hm WHERE n > 0
), ok AS MATERIALIZED (
  SELECT et FROM mv GROUP BY et
  HAVING COUNT(DISTINCT half) = 2
), rk AS MATERIALIZED (
  SELECT mv.et, mv.half,
         ROW_NUMBER() OVER (PARTITION BY mv.half
                            ORDER BY mv.mean DESC,
                                     mv.et ASC) AS r
  FROM mv JOIN ok USING (et)
), ft AS MATERIALIZED (
  SELECT CAST(SUM(ABS(a.r - b.r)) AS BIGINT) AS foot,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM rk a JOIN rk b ON a.et = b.et
  WHERE a.half = 0 AND b.half = 1
)
SELECT k AS n_types, foot AS footrule,
       CAST((k * k) // 2 AS BIGINT) AS max_footrule,
       CAST(ROUND((1.0 - CAST(foot AS DOUBLE)
                   / ((k * k) // 2)) * 1000000, 0) AS BIGINT)
         AS stability_ppm
FROM ft
WHERE k >= 2
"""

_BGN_COLS = ["n_name", "n_customers", "gini_ppm"]


def q_balance_gini_by_nation(sf_dir):
    """Wealth inequality by geography: the Gini coefficient of
    POSITIVE customer balances per nation (exact rank formula
    over cents) — nations whose customer wealth is one whale
    deep price risk differently than broad-based ones.  Whole
    nations resolve in hash buckets; the tiny name map joins
    last."""
    nation = rd.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name"]).to_pandas()
    if len(nation) == 0:
        return pa.table({
            "n_name": pa.array([], pa.string()),
            "n_customers": pa.array([], pa.int64()),
            "gini_ppm": pa.array([], pa.int64()),
        })
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_acctbal"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("c_nationkey", "c_acctbal"))
        if b.num_rows == 0:
            return pa.table({
                "nk": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "_dedup_bucket": pa.array([], pa.int32()),
            })
        bal = b["c_acctbal"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(bal >= 0, np.floor(bal * 100 + 0.5),
                         np.ceil(bal * 100 - 0.5)).astype(
            np.int64)
        keep = cents > 0
        t = pa.table({
            "nk": pa.array(
                b["c_nationkey"].cast(pa.int64()).to_numpy(
                    zero_copy_only=False)[keep]),
            "cents": pa.array(cents[keep]),
        })
        return add_bucket(t, "nk", 16)

    def ginis(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "nk": pd.Series([], dtype=np.int64),
            "n": pd.Series([], dtype=np.int64),
            "gini_ppm": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        rows = []
        for nk, sub in g.groupby("nk"):
            v = np.sort(sub["cents"].to_numpy(np.int64),
                        kind="mergesort").astype(np.float64)
            nd = len(v)
            s = v.sum()
            if nd < 2 or s == 0:
                continue
            i = np.arange(1, nd + 1, dtype=np.float64)
            gini = float(((2 * i - nd - 1) * v).sum()) / (
                nd * s)
            rows.append({
                "nk": np.int64(nk),
                "n": np.int64(nd),
                "gini_ppm": np.int64(
                    _round_half_away(gini * 1e6)),
            })
        return pd.DataFrame(rows)

    out = (
        cust.map_batches(project, batch_format="pyarrow",
                         batch_size=None)
        .groupby(_BUCKET)
        .map_groups(ginis, batch_format="pandas")
        .to_pandas()
    )
    if "nk" not in out.columns or len(out) == 0:
        return pa.table({
            "n_name": pa.array([], pa.string()),
            "n_customers": pa.array([], pa.int64()),
            "gini_ppm": pa.array([], pa.int64()),
        })
    m = out.merge(
        nation.rename(columns={"n_nationkey": "nk"}), on="nk")
    m = m.sort_values("n_name")
    return pa.table({
        "n_name": pa.array(m["n_name"], pa.string()),
        "n_customers": pa.array(
            m["n"].to_numpy(np.int64), pa.int64()),
        "gini_ppm": pa.array(
            m["gini_ppm"].to_numpy(np.int64), pa.int64()),
    })


BGN_SQL = """
WITH cb AS MATERIALIZED (
  SELECT c_nationkey AS nk,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer
  WHERE c_nationkey IS NOT NULL AND c_acctbal IS NOT NULL
    AND CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) > 0
), rk AS MATERIALIZED (
  SELECT nk, cents,
         ROW_NUMBER() OVER (PARTITION BY nk
                            ORDER BY cents) AS i,
         COUNT(*) OVER (PARTITION BY nk) AS nd,
         SUM(cents) OVER (PARTITION BY nk) AS s
  FROM cb
), gg AS MATERIALIZED (
  SELECT nk, CAST(ANY_VALUE(nd) AS BIGINT) AS n,
         CAST(ROUND(SUM((2 * i - nd - 1) * cents)
              / (ANY_VALUE(nd)
                 * CAST(ANY_VALUE(s) AS DOUBLE))
              * 1000000, 0) AS BIGINT) AS gini_ppm
  FROM rk
  WHERE nd >= 2 AND s <> 0
  GROUP BY nk
)
SELECT n.n_name, gg.n AS n_customers, gg.gini_ppm
FROM gg JOIN nation n ON n.n_nationkey = gg.nk
ORDER BY n.n_name
"""

_OPD_COLS = ["month", "n_orders", "days_in_month",
             "orders_per_day_x1e3"]


def q_orders_per_day_monthly(sf_dir):
    """Calendar-honest volume: orders divided by the ACTUAL days
    in each calendar month — February's 28 days stop reading as
    a demand slump and 31-day months stop reading as booms.
    Month counts fold exactly; days-in-month is shared calendar
    arithmetic."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_orderdate"]))
        if b.num_rows == 0:
            return pa.table({
                "mon": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(
            np.int64)
        t = pa.table({
            "mon": pa.array(mon),
            "n": pa.array(np.ones(len(mon), np.int64)),
        })
        g = t.group_by(["mon"]).aggregate([("n", "sum")])
        return g.rename_columns(["mon", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["mon"]).aggregate([("n", "sum")])
        return g.rename_columns(["mon", "n"])

    mc = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None), comb).to_pandas()
    if "mon" not in mc.columns or len(mc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _OPD_COLS})
    mc = mc.sort_values("mon")
    import calendar
    mons = mc["mon"].to_numpy(np.int64)
    n = mc["n"].to_numpy(np.int64)
    dim = np.array(
        [calendar.monthrange(int(m) // 12,
                             int(m) % 12 + 1)[1]
         for m in mons], np.int64)
    return pa.table({
        "month": pa.array(mons, pa.int64()),
        "n_orders": pa.array(n, pa.int64()),
        "days_in_month": pa.array(dim, pa.int64()),
        "orders_per_day_x1e3": pa.array(
            [_round_half_away(a / d * 1e3)
             for a, d in zip(n, dim)], pa.int64()),
    })


OPD_SQL = """
WITH mc AS MATERIALIZED (
  SELECT YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1
           AS mon,
         CAST(MAX(DAY(LAST_DAY(o_orderdate))) AS BIGINT)
           AS dim,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_orderdate IS NOT NULL
  GROUP BY 1
)
SELECT CAST(mon AS BIGINT) AS month, n AS n_orders,
       dim AS days_in_month,
       CAST(ROUND(CAST(n AS DOUBLE) / dim * 1000, 0)
            AS BIGINT) AS orders_per_day_x1e3
FROM mc
ORDER BY mon
"""


def register_r4jc(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "type_value_rank_halves": q_type_value_rank_halves,
            "balance_gini_by_nation": q_balance_gini_by_nation,
            "orders_per_day_monthly": q_orders_per_day_monthly,
        }
    )
    oracles.update(
        {
            "type_value_rank_halves": TVH_SQL,
            "balance_gini_by_nation": BGN_SQL,
            "orders_per_day_monthly": OPD_SQL,
        }
    )
