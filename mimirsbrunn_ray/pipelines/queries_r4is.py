"""Round-4 batch IS: pricing coherence inside the basket, skew
of the daily pulse, and within-segment concentration — the
intra-order discount range (do all lines of one order get the
same deal, and how wide is the spread when they don't), the
mean/median gap of daily counts per type (how much the mean
overstates a typical day — the burst-skew index), and the
top-decile order share by segment (what fraction of each
segment's orders its heaviest tenth of customers places).

Exactness discipline: discount ranges are exact basis-point
integers; daily counts are exact with interpolated medians
mirrored; the decile cut is an integer rank k = max(1, n//10)
with deterministic tie-break."""

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
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_IDR_COLS = ["n_multi_orders", "uniform_ppm",
             "mean_range_bp_x1e3", "max_range_bp"]


def q_intra_order_discount_range(sf_dir):
    """One deal per basket?  Among orders with 2+ lines: the
    share whose lines all carry the SAME discount, the mean
    max-minus-min spread in basis points, and the widest spread
    seen — incoherent per-line discounting breaks any
    order-level promo attribution.  Per-order (min, max, n) fold
    exactly."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_discount"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_orderkey", "l_discount"))
        if b.num_rows == 0:
            return pa.table({
                "ok": pa.array([], pa.int64()),
                "mn": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        d = b["l_discount"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        bp = np.where(d >= 0, np.floor(d * 10000 + 0.5),
                      np.ceil(d * 10000 - 0.5)).astype(np.int64)
        t = pa.table({
            "ok": b["l_orderkey"].cast(pa.int64()),
            "mn": pa.array(bp),
            "mx": pa.array(bp),
            "n": pa.array(np.ones(len(bp), np.int64)),
        })
        g = t.group_by(["ok"]).aggregate(
            [("mn", "min"), ("mx", "max"), ("n", "sum")])
        return g.rename_columns(["ok", "mn", "mx", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["ok"]).aggregate(
            [("mn", "min"), ("mx", "max"), ("n", "sum")])
        return g.rename_columns(["ok", "mn", "mx", "n"])

    def census(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "n": pa.array([], pa.int64()),
                "uni": pa.array([], pa.int64()),
                "sr": pa.array([], pa.int64()),
                "mr": pa.array([], pa.int64()),
            })
        multi = b.filter(pc.greater_equal(b["n"], 2))
        if multi.num_rows == 0:
            return pa.table({
                "n": pa.array([0], pa.int64()),
                "uni": pa.array([0], pa.int64()),
                "sr": pa.array([0], pa.int64()),
                "mr": pa.array([0], pa.int64()),
            })
        rng = (multi["mx"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
            - multi["mn"].cast(pa.int64()).to_numpy(
                zero_copy_only=False))
        return pa.table({
            "n": pa.array([multi.num_rows], pa.int64()),
            "uni": pa.array([int((rng == 0).sum())],
                            pa.int64()),
            "sr": pa.array([int(rng.sum())], pa.int64()),
            "mr": pa.array([int(rng.max())], pa.int64()),
        })

    def ccomb(b: pa.Table) -> pa.Table:
        return pa.table({
            "n": pa.array(
                [pc.sum(b["n"]).as_py() or 0], pa.int64()),
            "uni": pa.array(
                [pc.sum(b["uni"]).as_py() or 0], pa.int64()),
            "sr": pa.array(
                [pc.sum(b["sr"]).as_py() or 0], pa.int64()),
            "mr": pa.array(
                [pc.max(b["mr"]).as_py() or 0], pa.int64()),
        })

    per = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["ok"],
    )
    st = tree_merge(
        per.map_batches(census, batch_format="pyarrow",
                        batch_size=None),
        ccomb,
    ).to_pandas()
    if "n" not in st.columns or len(st) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _IDR_COLS})
    n = int(st["n"].sum())
    if n == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _IDR_COLS})
    uni = int(st["uni"].sum())
    sr = int(st["sr"].sum())
    mr = int(st["mr"].max())
    return pa.table({
        "n_multi_orders": pa.array([n], pa.int64()),
        "uniform_ppm": pa.array(
            [_round_half_away(uni / n * 1e6)], pa.int64()),
        "mean_range_bp_x1e3": pa.array(
            [_round_half_away(sr / n * 1e3)], pa.int64()),
        "max_range_bp": pa.array([mr], pa.int64()),
    })


IDR_SQL = """
WITH po AS MATERIALIZED (
  SELECT l_orderkey AS ok,
         CAST(MIN(CAST(ROUND(l_discount * 10000, 0) AS BIGINT))
              AS BIGINT) AS mn,
         CAST(MAX(CAST(ROUND(l_discount * 10000, 0) AS BIGINT))
              AS BIGINT) AS mx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_discount IS NOT NULL
  GROUP BY 1
), multi AS MATERIALIZED (
  SELECT mx - mn AS rng FROM po WHERE n >= 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_multi_orders,
       CAST(ROUND(CAST(SUM(CASE WHEN rng = 0 THEN 1 ELSE 0
                           END) AS DOUBLE) / COUNT(*)
            * 1000000, 0) AS BIGINT) AS uniform_ppm,
       CAST(ROUND(CAST(SUM(rng) AS DOUBLE) / COUNT(*)
            * 1000, 0) AS BIGINT) AS mean_range_bp_x1e3,
       CAST(MAX(rng) AS BIGINT) AS max_range_bp
FROM multi HAVING COUNT(*) > 0
"""

_MMG_COLS = ["event_type", "n_days", "mean_daily_x1e3",
             "median_daily_x1e3", "mean_over_median_x1e3"]


def q_mean_median_gap_by_type(sf_dir):
    """How much does the mean overstate a typical day?  Per
    event type, the mean and median of daily counts on the dense
    zero-filled day grid and their ratio — a ratio far above 1
    means the 'average day' is a burst artifact nobody actually
    experiences.  Daily counts fold exactly; the dense grid and
    interpolated medians mirror."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "ts"))
        if b.num_rows == 0:
            return pa.table({
                "et": pa.array([], pa.string()),
                "day": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        us = b["ts"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        day = (us // _DAY_US).astype(np.int64)
        df = pd.DataFrame({
            "et": np.asarray(
                b["event_type"].to_numpy(zero_copy_only=False)),
            "day": day, "n": 1,
        })
        agg = df.groupby(["et", "day"]).sum().reset_index()
        agg["day"] = agg["day"].astype(np.int64)
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["et", "day"]).aggregate([("n", "sum")])
        return g.rename_columns(["et", "day", "n"])

    dc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "et" not in dc.columns or len(dc) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "n_days": pa.array([], pa.int64()),
            "mean_daily_x1e3": pa.array([], pa.int64()),
            "median_daily_x1e3": pa.array([], pa.int64()),
            "mean_over_median_x1e3": pa.array([], pa.int64()),
        })
    d0, d1 = int(dc["day"].min()), int(dc["day"].max())
    n_days = d1 - d0 + 1
    rows = []
    for et, g in dc.groupby("et"):
        full = np.zeros(n_days, np.int64)
        for _, r in g.iterrows():
            full[int(r["day"]) - d0] = int(r["n"])
        mu = float(full.mean())
        med = float(np.percentile(full.astype(np.float64), 50))
        if med == 0:
            continue
        rows.append((et, n_days, _round_half_away(mu * 1e3),
                     _round_half_away(med * 1e3),
                     _round_half_away(mu / med * 1e3)))
    rows.sort()
    return pa.table({
        "event_type": pa.array(
            [r[0] for r in rows], pa.string()),
        "n_days": pa.array([r[1] for r in rows], pa.int64()),
        "mean_daily_x1e3": pa.array(
            [r[2] for r in rows], pa.int64()),
        "median_daily_x1e3": pa.array(
            [r[3] for r in rows], pa.int64()),
        "mean_over_median_x1e3": pa.array(
            [r[4] for r in rows], pa.int64()),
    })


MMG_SQL = f"""
WITH RECURSIVE dc AS MATERIALIZED (
  SELECT event_type AS et, EPOCH_US(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT MIN(day) AS d0, MAX(day) AS d1 FROM dc
), days AS (
  SELECT d0 AS day FROM span WHERE d0 IS NOT NULL
  UNION ALL
  SELECT day + 1 FROM days
  WHERE day + 1 <= (SELECT d1 FROM span)
), grid AS MATERIALIZED (
  SELECT t.et, d.day, COALESCE(dc.n, 0) AS n
  FROM (SELECT DISTINCT et FROM dc) t
  CROSS JOIN days d
  LEFT JOIN dc ON dc.et = t.et AND dc.day = d.day
), st AS MATERIALIZED (
  SELECT et, CAST(COUNT(*) AS BIGINT) AS nd,
         AVG(CAST(n AS DOUBLE)) AS mu,
         QUANTILE_CONT(CAST(n AS DOUBLE), 0.5) AS med
  FROM grid GROUP BY 1
)
SELECT et AS event_type, nd AS n_days,
       CAST(ROUND(mu * 1000, 0) AS BIGINT)
         AS mean_daily_x1e3,
       CAST(ROUND(med * 1000, 0) AS BIGINT)
         AS median_daily_x1e3,
       CAST(ROUND(mu / med * 1000, 0) AS BIGINT)
         AS mean_over_median_x1e3
FROM st
WHERE med <> 0
ORDER BY et
"""

_TDS_COLS = ["c_mktsegment", "n_customers", "k",
             "top_decile_order_share_ppm"]


def q_top_decile_order_share_by_segment(sf_dir):
    """Within-segment concentration: per market segment, the
    share of the segment's orders placed by its top tenth of
    customers (k = max(1, n//10), ties broken by custkey) —
    segments that look healthy in aggregate can be one whale
    deep.  Per-customer order counts fold exactly; the decile
    cut is an integer rank."""
    # the segment attaches to the per-customer counts via budget-gated
    # broadcast / join (stages/broadcast.py); the only driver pull is the
    # customer-grain reduction the decile walk needs
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_custkey"]))
        t = pa.table({
            "ck": b["o_custkey"].cast(pa.int64()),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["ck"]).aggregate([("n", "sum")])
        return g.rename_columns(["ck", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["ck"]).aggregate([("n", "sum")])
        return g.rename_columns(["ck", "n"])

    oc_ds = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None), comb)
    oc_ds = attach_dim(oc_ds, "ck", sf_dir, "customer", "c_custkey",
                       ["c_mktsegment"], how="inner",
                       out_names=["seg"])
    oc = oc_ds.to_pandas()
    if "ck" not in oc.columns or len(oc) == 0:
        return pa.table({
            "c_mktsegment": pa.array([], pa.string()),
            "n_customers": pa.array([], pa.int64()),
            "k": pa.array([], pa.int64()),
            "top_decile_order_share_ppm": pa.array(
                [], pa.int64()),
        })
    rows = []
    for seg, g in oc.groupby("seg"):
        n = len(g)
        k = max(1, n // 10)
        ck = g["ck"].to_numpy(np.int64)
        cnt = g["n"].to_numpy(np.int64)
        top = np.lexsort((ck, -cnt))[:k]
        tot = int(cnt.sum())
        if tot == 0:
            continue
        rows.append((seg, n, k, _round_half_away(
            int(cnt[top].sum()) / tot * 1e6)))
    rows.sort()
    return pa.table({
        "c_mktsegment": pa.array(
            [r[0] for r in rows], pa.string()),
        "n_customers": pa.array(
            [r[1] for r in rows], pa.int64()),
        "k": pa.array([r[2] for r in rows], pa.int64()),
        "top_decile_order_share_ppm": pa.array(
            [r[3] for r in rows], pa.int64()),
    })


TDS_SQL = """
WITH oc AS MATERIALIZED (
  SELECT o_custkey AS ck, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_custkey IS NOT NULL
  GROUP BY 1
), sc AS MATERIALIZED (
  SELECT c.c_mktsegment AS seg, oc.ck, oc.n
  FROM oc JOIN customer c ON c.c_custkey = oc.ck
  WHERE c.c_mktsegment IS NOT NULL
), nn AS MATERIALIZED (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(GREATEST(COUNT(*) // 10, 1) AS BIGINT) AS k,
         CAST(SUM(sc.n) AS BIGINT) AS tot
  FROM sc GROUP BY 1
), rk AS MATERIALIZED (
  SELECT seg, n,
         ROW_NUMBER() OVER (PARTITION BY seg
                            ORDER BY n DESC, ck ASC) AS r
  FROM sc
), top AS MATERIALIZED (
  SELECT rk.seg, CAST(SUM(rk.n) AS BIGINT) AS s
  FROM rk JOIN nn USING (seg)
  WHERE rk.r <= nn.k
  GROUP BY 1
)
SELECT nn.seg AS c_mktsegment, nn.n AS n_customers, nn.k,
       CAST(ROUND(CAST(top.s AS DOUBLE) / nn.tot
            * 1000000, 0) AS BIGINT)
         AS top_decile_order_share_ppm
FROM nn JOIN top USING (seg)
WHERE nn.tot > 0
ORDER BY nn.seg
"""


def register_r4is(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "intra_order_discount_range":
                q_intra_order_discount_range,
            "mean_median_gap_by_type":
                q_mean_median_gap_by_type,
            "top_decile_order_share_by_segment":
                q_top_decile_order_share_by_segment,
        }
    )
    oracles.update(
        {
            "intra_order_discount_range": IDR_SQL,
            "mean_median_gap_by_type": MMG_SQL,
            "top_decile_order_share_by_segment": TDS_SQL,
        }
    )
