"""Round-4 batch HM: lifecycle value, spend-drought coupling, and
cross-sectional demand — mean event value by within-user lifecycle
decile (exact integer rank rule (rank-1)*10 // n per user — do
users become more valuable as they age?), the correlation between
an order's value and the DAYS UNTIL the customer's next order (do
big purchases precede droughts — the stock-up effect), and the
price-popularity elasticity across parts (log total quantity on
log retail price — the cross-sectional demand curve).

Exactness discipline: decile assignment is pure integer rank
math; gaps are exact integer days; the correlations and the
log-log slope fold identical centered sums over exactly-derived
doubles."""

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
from mimirsbrunn_ray.pipelines.queries_r4gz import _pearson
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_VLD_COLS = ["decile", "n_events", "mean_value_x1e3"]


def q_value_by_lifecycle_decile(sf_dir):
    """Do users appreciate?  Mean event value by within-user
    lifecycle decile: each user's events rank by (ts, event_id)
    and map to decile (rank-1)*10 // n_user — a rising curve means
    tenure compounds into value and retention spend pays for
    itself; deciles are exact integer rank math so the curve is
    reproducible bit-for-bit.  Users resolve in disjoint shards;
    per-decile sums fold exactly."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts", "event_id", "value"))
        t = pa.table({
            "user_id": b["user_id"],
            "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_id": b["event_id"],
            "v": b["value"].cast(pa.float64()),
        })
        return add_bucket(t, "user_id", 64)

    def deciles(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "decile": pd.Series([], dtype=np.int64),
            "n": pd.Series([], dtype=np.int64),
            "s": pd.Series([], dtype=np.float64),
        })
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy()
        v = g["v"].to_numpy(np.float64)
        first = np.ones(len(g), dtype=bool)
        first[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, len(g)))
        rank = np.arange(len(g), dtype=np.int64) - np.repeat(
            starts, lens)
        n_user = np.repeat(lens, lens)
        dec = rank * 10 // n_user
        df = pd.DataFrame({"decile": dec, "v": v})
        agg = df.groupby("decile", sort=False).agg(
            n=("v", "size"), s=("v", "sum")).reset_index()
        agg["decile"] = agg["decile"].astype(np.int64)
        agg["n"] = agg["n"].astype(np.int64)
        return agg

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["decile"]).aggregate(
            [("n", "sum"), ("s", "sum")])
        return g.rename_columns(["decile", "n", "s"])

    cc = tree_merge(
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(deciles, batch_format="pandas"),
        comb,
    ).to_pandas()
    if "decile" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _VLD_COLS})
    cc = cc.sort_values("decile", ignore_index=True)
    return pa.table({
        "decile": pa.array(cc["decile"].to_numpy(np.int64)),
        "n_events": pa.array(cc["n"].to_numpy(np.int64)),
        "mean_value_x1e3": pa.array(
            [_round_half_away(s / n * 1e3)
             for s, n in zip(cc["s"], cc["n"].astype(np.int64))],
            pa.int64()),
    })


VLD_SQL = """
WITH e AS MATERIALIZED (
  SELECT user_id, CAST(value AS DOUBLE) AS v,
         (ROW_NUMBER() OVER (PARTITION BY user_id
                             ORDER BY EPOCH_US(ts), event_id)
          - 1) * 10
           // COUNT(*) OVER (PARTITION BY user_id) AS decile
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND value IS NOT NULL
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(ROUND(SUM(v) / COUNT(*) * 1000, 0) AS BIGINT)
         AS mean_value_x1e3
FROM e GROUP BY 1 ORDER BY decile
"""

_OVG_COLS = ["n_pairs", "r_x1e6", "mean_gap_days_x1e3"]


def q_order_value_gap_coupling(sf_dir):
    """The stock-up effect: across consecutive same-customer order
    pairs, the correlation between an order's value (cents) and
    the days until that customer's NEXT order — positive means big
    orders buy time (inventory effect) and naive churn alarms
    misfire on whales after a bulk buy.  Pairs resolve in
    customer-disjoint shards; the correlation folds the shared
    centered form."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderkey", "o_orderdate",
                       "o_totalprice"))
        if b.num_rows == 0:
            return pa.table({
                "cust": pa.array([], pa.int64()),
                "us": pa.array([], pa.int64()),
                "okey": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        x = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(
            x >= 0, np.floor(x * 100.0 + 0.5),
            np.ceil(x * 100.0 - 0.5)).astype(np.int64)
        t = pa.table({
            "cust": b["o_custkey"].cast(pa.int64()),
            "us": b["o_orderdate"].cast(
                pa.timestamp("us")).cast(pa.int64()),
            "okey": b["o_orderkey"].cast(pa.int64()),
            "cents": pa.array(cents),
        })
        return add_bucket(t, "cust", 64)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "x": pd.Series([], dtype=np.float64),
            "y": pd.Series([], dtype=np.float64),
        })
        if len(g) < 2:
            return empty
        g = g.sort_values(["cust", "us", "okey"],
                          kind="mergesort", ignore_index=True)
        cust = g["cust"].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        same = cust[1:] == cust[:-1]
        gap_days = ((us[1:] - us[:-1]) // _DAY_US)[same]
        val = cents[:-1][same]
        return pd.DataFrame({
            "x": val.astype(np.float64),
            "y": gap_days.astype(np.float64),
        })

    pr = (
        orders.map_batches(project, batch_format="pyarrow",
                           batch_size=None)
        .groupby(_BUCKET)
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if "x" not in pr.columns or len(pr) < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _OVG_COLS})
    x = pr["x"].to_numpy(np.float64)
    y = pr["y"].to_numpy(np.float64)
    r = _pearson(x, y)
    if r is None:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _OVG_COLS})
    return pa.table({
        "n_pairs": pa.array([len(pr)], pa.int64()),
        "r_x1e6": pa.array(
            [_round_half_away(r * 1e6)], pa.int64()),
        "mean_gap_days_x1e3": pa.array(
            [_round_half_away(float(y.mean()) * 1e3)],
            pa.int64()),
    })


OVG_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT o_custkey AS cust,
         EPOCH_US(o_orderdate) AS us, o_orderkey,
         CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
              AS DOUBLE) AS cents
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL
    AND o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
), pr AS MATERIALIZED (
  SELECT cents AS x,
         CAST((LEAD(us) OVER w - us) // {_DAY_US} AS DOUBLE)
           AS y,
         LEAD(cust) OVER w AS nc, cust
  FROM e WINDOW w AS (PARTITION BY cust ORDER BY us, o_orderkey)
), ok AS MATERIALIZED (
  SELECT x, y FROM pr WHERE y IS NOT NULL
), mu AS MATERIALIZED (
  SELECT AVG(x) AS mx, AVG(y) AS my,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ok
), mom AS (
  SELECT SUM((ok.x - mu.mx) * (ok.y - mu.my)) AS sxy,
         SUM((ok.x - mu.mx) * (ok.x - mu.mx)) AS sxx,
         SUM((ok.y - mu.my) * (ok.y - mu.my)) AS syy
  FROM ok CROSS JOIN mu
)
SELECT mu.n AS n_pairs,
       CAST(ROUND(mom.sxy / SQRT(mom.sxx * mom.syy) * 1000000,
            0) AS BIGINT) AS r_x1e6,
       CAST(ROUND(mu.my * 1000, 0) AS BIGINT)
         AS mean_gap_days_x1e3
FROM mu CROSS JOIN mom
WHERE mu.n >= 3 AND mom.sxx * mom.syy > 0
"""

_PPE_COLS = ["n_parts", "elasticity_x1e4", "r_x1e4"]


def q_price_popularity_elasticity(sf_dir):
    """Cross-sectional demand curve: the OLS slope of log total
    shipped quantity on log retail price across parts (the
    elasticity read), with the correlation alongside — near-zero
    slope means price does not sort demand in this catalog and
    price-based ranking features are noise.  Quantities fold
    exactly; the log-log fit mirrors."""
    # the retail price attaches to the part-grain reduction via
    # budget-gated broadcast / join — the part dim never lands whole on
    # the driver
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_partkey", "l_quantity"))
        if b.num_rows == 0:
            return pa.table({
                "pk": pa.array([], pa.int64()),
                "q": pa.array([], pa.int64()),
            })
        qf = b["l_quantity"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        q = np.where(qf >= 0, np.floor(qf + 0.5),
                     np.ceil(qf - 0.5)).astype(np.int64)
        t = pa.table({
            "pk": b["l_partkey"].cast(pa.int64()),
            "q": pa.array(q),
        })
        g = t.group_by(["pk"]).aggregate([("q", "sum")])
        return g.rename_columns(["pk", "q"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["pk"]).aggregate([("q", "sum")])
        return g.rename_columns(["pk", "q"])

    pq_ds = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["pk"],
    )
    pq_ds = attach_dim(pq_ds, "pk", sf_dir, "part", "p_partkey",
                       ["p_retailprice"], how="inner")
    pq = pq_ds.to_pandas()
    if "pk" not in pq.columns or len(pq) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PPE_COLS})
    rpv = pq["p_retailprice"].to_numpy(np.float64)
    pq["rp"] = np.where(
        rpv >= 0, np.floor(rpv * 100.0 + 0.5),
        np.ceil(rpv * 100.0 - 0.5)).astype(np.int64)
    pq = pq[(pq["q"].astype(np.int64) > 0)
            & (pq["rp"].astype(np.int64) > 0)]
    if len(pq) < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PPE_COLS})
    x = np.log(pq["rp"].to_numpy(np.int64).astype(np.float64))
    y = np.log(pq["q"].to_numpy(np.int64).astype(np.float64))
    n = len(x)
    sx, sy = x.sum(), y.sum()
    sxx = (x * x).sum()
    sxy = (x * y).sum()
    den = n * sxx - sx * sx
    if den == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PPE_COLS})
    slope = (n * sxy - sx * sy) / den
    r = _pearson(x, y)
    if r is None:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PPE_COLS})
    return pa.table({
        "n_parts": pa.array([n], pa.int64()),
        "elasticity_x1e4": pa.array(
            [_round_half_away(slope * 1e4)], pa.int64()),
        "r_x1e4": pa.array(
            [_round_half_away(r * 1e4)], pa.int64()),
    })


PPE_SQL = """
WITH pq AS MATERIALIZED (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT))
              AS BIGINT) AS q
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_quantity IS NOT NULL
  GROUP BY 1
), xy AS MATERIALIZED (
  SELECT LN(CAST(CAST(ROUND(p.p_retailprice * 100, 0)
                      AS BIGINT) AS DOUBLE)) AS x,
         LN(CAST(pq.q AS DOUBLE)) AS y
  FROM pq JOIN part p ON p.p_partkey = pq.pk
  WHERE p.p_retailprice IS NOT NULL
    AND pq.q > 0
    AND CAST(ROUND(p.p_retailprice * 100, 0) AS BIGINT) > 0
), st AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy,
         SUM(y * y) AS syy
  FROM xy
)
SELECT st.n AS n_parts,
       CAST(ROUND((st.n * st.sxy - st.sx * st.sy)
            / (st.n * st.sxx - st.sx * st.sx) * 10000, 0)
            AS BIGINT) AS elasticity_x1e4,
       CAST(ROUND((st.n * st.sxy - st.sx * st.sy)
            / SQRT((st.n * st.sxx - st.sx * st.sx)
                   * (st.n * st.syy - st.sy * st.sy))
            * 10000, 0) AS BIGINT) AS r_x1e4
FROM st
WHERE st.n >= 3 AND st.n * st.sxx - st.sx * st.sx <> 0
  AND (st.n * st.sxx - st.sx * st.sx)
      * (st.n * st.syy - st.sy * st.sy) > 0
"""


def register_r4hm(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "value_by_lifecycle_decile": q_value_by_lifecycle_decile,
            "order_value_gap_coupling": q_order_value_gap_coupling,
            "price_popularity_elasticity":
                q_price_popularity_elasticity,
        }
    )
    oracles.update(
        {
            "value_by_lifecycle_decile": VLD_SQL,
            "order_value_gap_coupling": OVG_SQL,
            "price_popularity_elasticity": PPE_SQL,
        }
    )
