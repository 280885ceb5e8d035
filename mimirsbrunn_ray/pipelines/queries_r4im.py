"""Round-4 batch IM: joint extremes, promotion drift, and whale
accounting — the value × line-count tail dependence (do the
biggest orders also carry the most lines, measured as top-quartile
co-membership against the 25% independence baseline), the
discount-rate monthly trend (mean basis points given away per
ship month and its slope — is promotion pressure creeping?), and
the top-1% user value share (what fraction of all event value
the heaviest hundredth of users carries).

Exactness discipline: top-quartile and top-1% membership use
deterministic (value, key) rank cuts at integer k = n//4 and
n//100 — no float threshold; discount basis points fold as
exact integers."""

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


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_VLT_COLS = ["n_orders", "k", "n_both", "lambda_u_ppm",
             "lift_x1e3"]


def q_value_lines_tail_dependence(sf_dir):
    """Do the biggest orders carry the most lines?  Top-quartile
    co-membership: the k = n//4 orders with the highest total
    price (ties broken by order key) intersected with the k
    orders with the most lines (same tie rule) — λ_U = both/k,
    and the lift over the 25% independence baseline.  Line
    counts fold per order; the rank cuts are exact integer
    selections."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"])

    def lpart(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["l_orderkey"]))
        t = pa.table({
            "ok": b["l_orderkey"].cast(pa.int64()),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["ok"]).aggregate([("n", "sum")])
        return g.rename_columns(["ok", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["ok"]).aggregate([("n", "sum")])
        return g.rename_columns(["ok", "n"])

    lc = tree_merge(
        li.map_batches(lpart, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["ok"],
    )

    # scale shape: line counts stay a Dataset and join orders on the
    # orderkey (one exchange); the two exact top-quartile cuts resolve
    # via distributed value histograms + a bounded tie-group pull
    # (stages/exactrank.py); membership/intersection folds per batch.
    from mimirsbrunn_ray.context import pool_size
    from mimirsbrunn_ray.stages.exactrank import member_mask, topk_threshold

    def oproj(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b["o_orderkey"]),
                             pc.is_valid(b["o_totalprice"])))
        tp = b["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = np.where(tp >= 0, np.floor(tp * 100 + 0.5),
                         np.ceil(tp * 100 - 0.5)).astype(np.int64)
        return pa.table({
            "ok": b["o_orderkey"].cast(pa.int64()),
            "cents": pa.array(cents),
        })

    n_part = max(8, pool_size())
    orders_ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice"],
    ).map_batches(oproj, batch_format="pyarrow", batch_size=None)
    joined = _safe_join(
        orders_ds, lc,
        on=("ok",),
        join_type="inner",
        num_partitions=n_part,
    ).materialize()
    n = joined.count()
    k = n // 4
    if k == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _VLT_COLS})
    thr_v = topk_threshold(joined, "cents", "ok", k)
    thr_l = topk_threshold(joined, "n", "ok", k)

    def both_part(b: pa.Table) -> pa.Table:
        cents = b["cents"].to_numpy(zero_copy_only=False)
        lines = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = b["ok"].to_numpy(zero_copy_only=False)
        both = (member_mask(cents, ok, thr_v)
                & member_mask(lines, ok, thr_l))
        return pa.table({"both": pa.array([np.int64(both.sum())])})

    bp = joined.map_batches(
        both_part, batch_format="pyarrow", batch_size=None).to_pandas()
    both = int(bp["both"].sum()) if "both" in bp.columns else 0
    lam = both / k
    return pa.table({
        "n_orders": pa.array([n], pa.int64()),
        "k": pa.array([k], pa.int64()),
        "n_both": pa.array([both], pa.int64()),
        "lambda_u_ppm": pa.array(
            [_round_half_away(lam * 1e6)], pa.int64()),
        "lift_x1e3": pa.array(
            [_round_half_away(lam / (k / n) * 1e3)],
            pa.int64()),
    })


VLT_SQL = """
WITH lc AS MATERIALIZED (
  SELECT l_orderkey AS ok, CAST(COUNT(*) AS BIGINT) AS lines
  FROM lineitem WHERE l_orderkey IS NOT NULL
  GROUP BY 1
), base AS MATERIALIZED (
  SELECT o.o_orderkey AS ok,
         CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)
           AS cents,
         lc.lines
  FROM orders o JOIN lc ON lc.ok = o.o_orderkey
  WHERE o.o_totalprice IS NOT NULL
), nn AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) // 4 AS BIGINT) AS k
  FROM base
), topv AS MATERIALIZED (
  SELECT ok FROM base CROSS JOIN nn
  ORDER BY cents DESC, ok ASC LIMIT (
    SELECT GREATEST(k, 0) FROM nn)
), topl AS MATERIALIZED (
  SELECT ok FROM base CROSS JOIN nn
  ORDER BY lines DESC, ok ASC LIMIT (
    SELECT GREATEST(k, 0) FROM nn)
), bo AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS b
  FROM topv JOIN topl USING (ok)
)
SELECT nn.n AS n_orders, nn.k, bo.b AS n_both,
       CAST(ROUND(CAST(bo.b AS DOUBLE) / nn.k * 1000000, 0)
            AS BIGINT) AS lambda_u_ppm,
       CAST(ROUND((CAST(bo.b AS DOUBLE) / nn.k)
            / (CAST(nn.k AS DOUBLE) / nn.n) * 1000, 0)
            AS BIGINT) AS lift_x1e3
FROM nn CROSS JOIN bo
WHERE nn.k > 0
"""

_DMT_COLS = ["n_months", "slope_bp_per_month_x1e6",
             "first_mean_bp_x1e3", "last_mean_bp_x1e3"]


def q_discount_rate_monthly_trend(sf_dir):
    """Is promotion pressure creeping?  Mean discount basis
    points per ship month and the OLS slope across months — a
    positive slope is margin erosion hiding inside 'seasonal'
    promos.  Basis points fold as exact integer sums; only the
    monthly means divide."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_shipdate", "l_discount"))
        if b.num_rows == 0:
            return pa.table({
                "mon": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
            })
        d = b["l_shipdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(
            np.int64)
        dc = b["l_discount"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        bp = np.where(dc >= 0, np.floor(dc * 10000 + 0.5),
                      np.ceil(dc * 10000 - 0.5)).astype(
            np.int64)
        df = pd.DataFrame({"mon": mon, "n": 1, "s": bp})
        agg = df.groupby("mon").sum().reset_index()
        for c in ["mon", "n", "s"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["mon"]).aggregate(
            [("n", "sum"), ("s", "sum")])
        return g.rename_columns(["mon", "n", "s"])

    mm = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "mon" not in mm.columns or len(mm) < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DMT_COLS})
    mm = mm.sort_values("mon")
    x = mm["mon"].to_numpy(np.int64).astype(np.float64)
    y = (mm["s"].to_numpy(np.int64).astype(np.float64)
         / mm["n"].to_numpy(np.int64))
    n = len(x)
    sx, sy = x.sum(), y.sum()
    sxx = (x * x).sum()
    sxy = (x * y).sum()
    den = n * sxx - sx * sx
    if den == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DMT_COLS})
    slope = (n * sxy - sx * sy) / den
    return pa.table({
        "n_months": pa.array([n], pa.int64()),
        "slope_bp_per_month_x1e6": pa.array(
            [_round_half_away(slope * 1e6)], pa.int64()),
        "first_mean_bp_x1e3": pa.array(
            [_round_half_away(float(y[0]) * 1e3)], pa.int64()),
        "last_mean_bp_x1e3": pa.array(
            [_round_half_away(float(y[-1]) * 1e3)], pa.int64()),
    })


DMT_SQL = """
WITH mm AS MATERIALIZED (
  SELECT YEAR(l_shipdate) * 12 + MONTH(l_shipdate) - 1 AS mon,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(l_discount * 10000, 0) AS BIGINT))
              AS BIGINT) AS s
  FROM lineitem
  WHERE l_shipdate IS NOT NULL AND l_discount IS NOT NULL
  GROUP BY 1
), pts AS MATERIALIZED (
  SELECT mon, CAST(s AS DOUBLE) / n AS y FROM mm
), st AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(mon AS DOUBLE)) AS sx, SUM(y) AS sy,
         SUM(CAST(mon AS DOUBLE) * mon) AS sxx,
         SUM(CAST(mon AS DOUBLE) * y) AS sxy,
         MIN(mon) AS m0, MAX(mon) AS m1
  FROM pts
)
SELECT st.n AS n_months,
       CAST(ROUND((st.n * st.sxy - st.sx * st.sy)
            / (st.n * st.sxx - st.sx * st.sx) * 1000000, 0)
            AS BIGINT) AS slope_bp_per_month_x1e6,
       CAST(ROUND((SELECT y FROM pts WHERE mon = st.m0)
            * 1000, 0) AS BIGINT) AS first_mean_bp_x1e3,
       CAST(ROUND((SELECT y FROM pts WHERE mon = st.m1)
            * 1000, 0) AS BIGINT) AS last_mean_bp_x1e3
FROM st
WHERE st.n >= 2 AND st.n * st.sxx - st.sx * st.sx <> 0
"""

_VTU_COLS = ["n_users", "k", "top1pct_share_ppm",
             "top1pct_mean_over_rest_x1e3"]


def q_value_top1pct_users_share(sf_dir):
    """Whale accounting on the event ledger: the share of ALL
    event value carried by the top n//100 users by their own
    value sum (ties broken by user id) — plus how many times a
    whale's mean value-sum exceeds everyone else's.  Per-user
    mill sums fold exactly; the 1% cut is an integer rank."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "value"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "value"))
        if b.num_rows == 0:
            return pa.table({
                "u": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
            })
        v = b["value"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        mills = np.where(v >= 0, np.floor(v * 1000 + 0.5),
                         np.ceil(v * 1000 - 0.5)).astype(
            np.int64)
        t = pa.table({
            "u": b["user_id"].cast(pa.int64()),
            "s": pa.array(mills),
        })
        g = t.group_by(["u"]).aggregate([("s", "sum")])
        return g.rename_columns(["u", "s"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["u"]).aggregate([("s", "sum")])
        return g.rename_columns(["u", "s"])

    us = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["u"],
    ).to_pandas()
    if "u" not in us.columns or len(us) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _VTU_COLS})
    n = len(us)
    k = max(1, n // 100)
    u = us["u"].to_numpy(np.int64)
    s = us["s"].to_numpy(np.int64)
    top = np.lexsort((u, -s))[:k]
    stop = int(s[top].sum())
    tot = int(s.sum())
    if tot == 0 or (tot - stop) == 0 or (n - k) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _VTU_COLS})
    mean_top = stop / k
    mean_rest = (tot - stop) / (n - k)
    if mean_rest == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _VTU_COLS})
    return pa.table({
        "n_users": pa.array([n], pa.int64()),
        "k": pa.array([k], pa.int64()),
        "top1pct_share_ppm": pa.array(
            [_round_half_away(stop / tot * 1e6)], pa.int64()),
        "top1pct_mean_over_rest_x1e3": pa.array(
            [_round_half_away(mean_top / mean_rest * 1e3)],
            pa.int64()),
    })


VTU_SQL = """
WITH us AS MATERIALIZED (
  SELECT user_id AS u,
         CAST(SUM(CAST(ROUND(value * 1000, 0) AS BIGINT))
              AS BIGINT) AS s
  FROM events
  WHERE user_id IS NOT NULL AND value IS NOT NULL
  GROUP BY 1
), nn AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(GREATEST(COUNT(*) // 100, 1) AS BIGINT) AS k,
         CAST(SUM(s) AS BIGINT) AS tot
  FROM us
), top AS MATERIALIZED (
  SELECT CAST(SUM(s) AS BIGINT) AS stop
  FROM (SELECT s FROM us ORDER BY s DESC, u ASC
        LIMIT (SELECT GREATEST(k, 0) FROM nn))
)
SELECT nn.n AS n_users, nn.k,
       CAST(ROUND(CAST(top.stop AS DOUBLE) / nn.tot
            * 1000000, 0) AS BIGINT) AS top1pct_share_ppm,
       CAST(ROUND((CAST(top.stop AS DOUBLE) / nn.k)
            / (CAST(nn.tot - top.stop AS DOUBLE)
               / (nn.n - nn.k)) * 1000, 0) AS BIGINT)
         AS top1pct_mean_over_rest_x1e3
FROM nn CROSS JOIN top
WHERE nn.k > 0 AND nn.tot > 0 AND nn.tot - top.stop > 0
  AND nn.n - nn.k > 0
"""


def register_r4im(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "value_lines_tail_dependence":
                q_value_lines_tail_dependence,
            "discount_rate_monthly_trend":
                q_discount_rate_monthly_trend,
            "value_top1pct_users_share":
                q_value_top1pct_users_share,
        }
    )
    oracles.update(
        {
            "value_lines_tail_dependence": VLT_SQL,
            "discount_rate_monthly_trend": DMT_SQL,
            "value_top1pct_users_share": VTU_SQL,
        }
    )
