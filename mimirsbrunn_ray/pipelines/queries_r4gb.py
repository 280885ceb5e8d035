"""Round-4 batch GB: zero-inflation, weighted co-occurrence, and
calendar effects — a zero-inflated-Poisson moment fit of per-user
daily activity per event type (separates "more inactive users"
from "less active users", which a plain Poisson mean conflates),
Adamic-Adar-weighted part co-purchase pairs (co-occurrence in a
SMALL basket is evidence, in a huge one it is noise — the inverse-
log weighting raw support and lift both lack), and the month-end
revenue share (how much of each month's order value lands in its
last three calendar days — the fiscal-calendar pathology check).

Exactness discipline: ZIP moments fold exact integer (n, S, SS)
over the identical users x days cell universe; Adamic-Adar sums
are snapped to x1e6 BEFORE the top-20 rank so summation order
cannot flip the cut; month-end shares are exact integer cents with
both engines using the same civil-calendar last-day rule."""

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
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_AA_TOP = 20


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_ZIP_COLS = ["event_type", "n_cells", "mean_x1e6",
             "lambda_x1e6", "pi_ppm"]


def q_zip_fit_daily_counts(sf_dir):
    """Zero-inflated-Poisson moment fit of per-user daily counts
    per event type over the full users x calendar-days cell grid
    (absent cells are true zeros): lambda = (v + m^2 - m) / m and
    pi = 1 - m / lambda from the method of moments — pi is the
    structural-zero share (users/days that simply never engage),
    which the raw mean m hides.  Per-cell counts fold as exact
    int64 (S, SS) in one distributed pass."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts", "event_type"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({
            "event_type": b["event_type"],
            "user_id": b["user_id"],
            "day": pc.divide(us, _DAY_US),
        })
        g = t.group_by(["event_type", "user_id", "day"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            ["event_type", "user_id", "day", "c"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "user_id", "day"]).aggregate(
            [("c", "sum")])
        return g.rename_columns(
            ["event_type", "user_id", "day", "c"])

    cc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["event_type", "user_id"],
    ).to_pandas()
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _ZIP_COLS[1:]},
        })
    n_users = cc["user_id"].nunique()
    n_days = int(cc["day"].max() - cc["day"].min() + 1)
    n_cells = n_users * n_days
    out = {c: [] for c in _ZIP_COLS}
    for et, g in cc.groupby("event_type", sort=True):
        c = g["c"].to_numpy(np.int64)
        s = int(c.sum())
        ss = int((c * c).sum())
        if s == 0 or n_cells == 0:
            continue
        m = s / n_cells
        v = ss / n_cells - m * m
        lam = (v + m * m - m) / m
        if lam <= 0:
            continue
        pi = 1.0 - m / lam
        out["event_type"].append(et)
        out["n_cells"].append(n_cells)
        out["mean_x1e6"].append(_round_half_away(m * 1e6))
        out["lambda_x1e6"].append(_round_half_away(lam * 1e6))
        out["pi_ppm"].append(_round_half_away(pi * 1e6))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _ZIP_COLS[1:]},
    })


ZIP_SQL = f"""
WITH udc AS MATERIALIZED (
  SELECT event_type, user_id, EPOCH_US(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
  GROUP BY 1, 2, 3
), dims AS MATERIALIZED (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
         * (MAX(day) - MIN(day) + 1) AS n_cells
  FROM udc
), st AS MATERIALIZED (
  SELECT event_type,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS ss
  FROM udc GROUP BY 1
), fit AS (
  SELECT event_type, dims.n_cells,
         CAST(s AS DOUBLE) / dims.n_cells AS m,
         CAST(ss AS DOUBLE) / dims.n_cells
           - (CAST(s AS DOUBLE) / dims.n_cells)
             * (CAST(s AS DOUBLE) / dims.n_cells) AS v
  FROM st CROSS JOIN dims
  WHERE s > 0 AND dims.n_cells > 0
)
SELECT event_type,
       CAST(n_cells AS BIGINT) AS n_cells,
       CAST(ROUND(m * 1000000, 0) AS BIGINT) AS mean_x1e6,
       CAST(ROUND((v + m * m - m) / m * 1000000, 0) AS BIGINT)
         AS lambda_x1e6,
       CAST(ROUND((1.0 - m / ((v + m * m - m) / m)) * 1000000, 0)
            AS BIGINT) AS pi_ppm
FROM fit
WHERE (v + m * m - m) / m > 0
ORDER BY event_type
"""

_AA_COLS = ["p1", "p2", "n_baskets", "aa_x1e6"]


def q_aa_weighted_part_pairs(sf_dir):
    """Top-20 part co-purchase pairs by Adamic-Adar-style weight:
    each order containing both parts contributes 1 / ln(basket
    size) (distinct parts in the order), so co-occurrence inside a
    2-item basket outweighs co-occurrence inside a 30-item one —
    the rarity weighting that raw support and lift both lack.
    Per-order distinct part sets resolve in order-hash shards with
    vectorized pair emission; weights are snapped to x1e6 BEFORE
    the (aa, p1, p2) top-20 rank so fold order cannot flip the
    cut."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_orderkey", "l_partkey"))
        t = b.group_by(["l_orderkey", "l_partkey"]).aggregate([])
        return add_bucket(t, "l_orderkey", 64)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "p1": pd.Series([], dtype=np.int64),
            "p2": pd.Series([], dtype=np.int64),
            "n_baskets": pd.Series([], dtype=np.int64),
            "aa": pd.Series([], dtype=np.float64),
        })
        if len(g) == 0:
            return empty
        df = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        df = df.sort_values(["l_orderkey", "l_partkey"],
                            ignore_index=True)
        ok = df["l_orderkey"].to_numpy(np.int64)
        pk = df["l_partkey"].to_numpy(np.int64)
        brk = np.ones(len(df), dtype=bool)
        brk[1:] = ok[1:] != ok[:-1]
        starts = np.flatnonzero(brk)
        sizes = np.diff(np.append(starts, len(df)))
        outs = []
        for k in np.unique(sizes):
            if k < 2:
                continue
            sel = starts[sizes == k]
            mat = pk[sel[:, None] + np.arange(k)[None, :]]
            iu, ju = np.triu_indices(int(k), k=1)
            w = 1.0 / np.log(float(k))
            a = mat[:, iu].reshape(-1)
            b_ = mat[:, ju].reshape(-1)
            outs.append(pd.DataFrame(
                {"p1": a, "p2": b_,
                 "w": np.full(len(a), w)}))
        if not outs:
            return empty
        allp = pd.concat(outs, ignore_index=True)
        agg = allp.groupby(["p1", "p2"], sort=False).agg(
            n_baskets=("w", "size"), aa=("w", "sum")
        ).reset_index()
        agg["n_baskets"] = agg["n_baskets"].astype(np.int64)
        return agg

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["p1", "p2"]).aggregate(
            [("n_baskets", "sum"), ("aa", "sum")])
        return g.rename_columns(["p1", "p2", "n_baskets", "aa"])

    counted = tree_merge(
        li.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(pairs, batch_format="pandas"),
        comb,
        final_shards=8,
        shard_cols=["p1", "p2"],
    )

    def local_top(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "p1" not in b.column_names:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in _AA_COLS})
        df = b.select(["p1", "p2", "n_baskets", "aa"]).to_pandas()
        df["aa_x1e6"] = [
            _round_half_away(v * 1e6) for v in df["aa"]]
        df = df.sort_values(["aa_x1e6", "p1", "p2"],
                            ascending=[False, True, True],
                            ignore_index=True).head(_AA_TOP)
        return pa.table({
            "p1": pa.array(df["p1"].to_numpy(np.int64)),
            "p2": pa.array(df["p2"].to_numpy(np.int64)),
            "n_baskets": pa.array(
                df["n_baskets"].to_numpy(np.int64)),
            "aa_x1e6": pa.array(
                df["aa_x1e6"].to_numpy(np.int64)),
        })

    top = counted.map_batches(local_top, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    if "p1" not in top.columns or len(top) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _AA_COLS})
    top = top.sort_values(["aa_x1e6", "p1", "p2"],
                          ascending=[False, True, True],
                          ignore_index=True).head(_AA_TOP)
    return pa.table({
        "p1": pa.array(top["p1"].to_numpy(np.int64)),
        "p2": pa.array(top["p2"].to_numpy(np.int64)),
        "n_baskets": pa.array(
            top["n_baskets"].to_numpy(np.int64)),
        "aa_x1e6": pa.array(top["aa_x1e6"].to_numpy(np.int64)),
    })


AA_SQL = f"""
WITH dp AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
), bs AS MATERIALIZED (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS k
  FROM dp GROUP BY 1
), pr AS MATERIALIZED (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         CAST(COUNT(*) AS BIGINT) AS n_baskets,
         SUM(1.0 / LN(CAST(bs.k AS DOUBLE))) AS aa
  FROM dp a
  JOIN dp b ON a.l_orderkey = b.l_orderkey
           AND b.l_partkey > a.l_partkey
  JOIN bs ON bs.l_orderkey = a.l_orderkey
  GROUP BY 1, 2
)
SELECT CAST(p1 AS BIGINT) AS p1,
       CAST(p2 AS BIGINT) AS p2,
       n_baskets,
       CAST(ROUND(aa * 1000000, 0) AS BIGINT) AS aa_x1e6
FROM pr
ORDER BY CAST(ROUND(aa * 1000000, 0) AS BIGINT) DESC, p1, p2
LIMIT {_AA_TOP}
"""

_ME_COLS = ["mon", "total_cents", "last3_cents", "share_ppm"]


def q_month_end_revenue_share(sf_dir):
    """Month-end loading census: per calendar month, the share of
    total order value placed in the month's LAST THREE calendar
    days — the classic fiscal-deadline pathology (quota-driven
    spikes) that monthly totals hide.  Order cents fold as exact
    int64; both engines use the same civil-calendar last-day
    rule."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_orderdate", "o_totalprice"))
        if b.num_rows == 0:
            return pa.table({
                "mon": pa.array([], pa.int64()),
                "total": pa.array([], pa.int64()),
                "last3": pa.array([], pa.int64()),
            })
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(np.int64)
        dom = d.dt.day.to_numpy(np.int64)
        dim = d.dt.days_in_month.to_numpy(np.int64)
        cents = np.where(
            b["o_totalprice"].cast(pa.float64()).to_numpy(
                zero_copy_only=False) >= 0,
            np.floor(b["o_totalprice"].cast(pa.float64()).to_numpy(
                zero_copy_only=False) * 100.0 + 0.5),
            np.ceil(b["o_totalprice"].cast(pa.float64()).to_numpy(
                zero_copy_only=False) * 100.0 - 0.5),
        ).astype(np.int64)
        is_l3 = dom >= dim - 2
        t = pa.table({
            "mon": pa.array(mon),
            "total": pa.array(cents),
            "last3": pa.array(np.where(is_l3, cents, 0)),
        })
        g = t.group_by(["mon"]).aggregate(
            [("total", "sum"), ("last3", "sum")])
        return g.rename_columns(["mon", "total", "last3"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["mon"]).aggregate(
            [("total", "sum"), ("last3", "sum")])
        return g.rename_columns(["mon", "total", "last3"])

    cc = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
    ).to_pandas()
    if "mon" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ME_COLS})
    cc = cc.sort_values("mon", ignore_index=True)
    tot = cc["total"].to_numpy(np.int64)
    l3 = cc["last3"].to_numpy(np.int64)
    keep = tot != 0
    ppm = [
        _round_half_away(a / t * 1e6)
        for a, t in zip(l3[keep], tot[keep])
    ]
    return pa.table({
        "mon": pa.array(cc["mon"].to_numpy(np.int64)[keep]),
        "total_cents": pa.array(tot[keep]),
        "last3_cents": pa.array(l3[keep]),
        "share_ppm": pa.array(ppm, pa.int64()),
    })


MONTH_END_SQL = """
WITH o AS MATERIALIZED (
  SELECT YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS mon,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         CASE WHEN DAY(o_orderdate)
                   >= DAY(LAST_DAY(CAST(o_orderdate AS DATE))) - 2
              THEN 1 ELSE 0 END AS is_l3
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
)
SELECT CAST(mon AS BIGINT) AS mon,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN is_l3 = 1 THEN cents ELSE 0 END)
            AS BIGINT) AS last3_cents,
       CAST(ROUND(CAST(SUM(CASE WHEN is_l3 = 1 THEN cents
                                ELSE 0 END) AS DOUBLE)
            / SUM(cents) * 1000000, 0) AS BIGINT) AS share_ppm
FROM o GROUP BY 1
HAVING SUM(cents) <> 0
ORDER BY mon
"""


def register_r4gb(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "zip_fit_daily_counts": q_zip_fit_daily_counts,
            "aa_weighted_part_pairs": q_aa_weighted_part_pairs,
            "month_end_revenue_share": q_month_end_revenue_share,
        }
    )
    oracles.update(
        {
            "zip_fit_daily_counts": ZIP_SQL,
            "aa_weighted_part_pairs": AA_SQL,
            "month_end_revenue_share": MONTH_END_SQL,
        }
    )
