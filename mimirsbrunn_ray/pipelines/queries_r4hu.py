"""Round-4 batch HU: always-on demand, dead inventory, and mix
volatility — the always-on customer census (customers ordering in
at least 80% of observed months — the annuity base revenue
planning can actually count on), the shelf-warmer census (catalog
parts with zero lineitems ever, and the list-price value parked
in them), and the share-volatility ranking (which event type's
share of the daily mix swings hardest — the type that breaks
composition-based alerting).

Exactness discipline: month coverage and zero-sale counts are
pure integers ((8*n+9)//10-style exact 80% threshold by
cross-multiplication: months_active * 10 >= n_months * 8); share
volatility uses two-pass centered moments over exact daily
shares with ranking on the snapped value."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _round_half_away,
    _type_cell_counts,
)
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_AOC_COLS = ["n_customers", "n_always_on", "always_on_ppm",
             "n_months"]


def q_always_on_customers(sf_dir):
    """The annuity base: customers with orders in at least 80% of
    the observed months (exact integer test months_active * 10 >=
    n_months * 8) — their count and share is the revenue floor
    that needs no acquisition spend to repeat.  Distinct
    (customer, month) pairs fold exactly."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderdate"))
        if b.num_rows == 0:
            return pa.table({
                "cust": pa.array([], pa.int64()),
                "mon": pa.array([], pa.int64()),
            })
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(np.int64)
        t = pa.table({
            "cust": b["o_custkey"].cast(pa.int64()),
            "mon": pa.array(mon),
        })
        return t.group_by(["cust", "mon"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["cust", "mon"]).group_by(
            ["cust", "mon"]).aggregate([])

    cm = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["cust"],
    ).to_pandas()
    if "cust" not in cm.columns or len(cm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _AOC_COLS})
    n_months = int(cm["mon"].max() - cm["mon"].min() + 1)
    active = cm.groupby("cust").size()
    n_cust = len(active)
    always = int((active.to_numpy(np.int64) * 10
                  >= n_months * 8).sum())
    return pa.table({
        "n_customers": pa.array([n_cust], pa.int64()),
        "n_always_on": pa.array([always], pa.int64()),
        "always_on_ppm": pa.array(
            [_round_half_away(always / n_cust * 1e6)],
            pa.int64()),
        "n_months": pa.array([n_months], pa.int64()),
    })


AOC_SQL = """
WITH cm AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS cust,
         YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS mon
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
), span AS MATERIALIZED (
  SELECT MAX(mon) - MIN(mon) + 1 AS n_months FROM cm
), per_cust AS MATERIALIZED (
  SELECT cust, CAST(COUNT(*) AS BIGINT) AS active FROM cm
  GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN active * 10 >= span.n_months * 8
                     THEN 1 ELSE 0 END) AS BIGINT)
         AS n_always_on,
       CAST(ROUND(CAST(SUM(CASE WHEN active * 10
                                     >= span.n_months * 8
                                THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*) * 1000000, 0) AS BIGINT)
         AS always_on_ppm,
       CAST(ANY_VALUE(span.n_months) AS BIGINT) AS n_months
FROM per_cust CROSS JOIN span
GROUP BY span.n_months
HAVING COUNT(*) > 0
"""

_SWC_COLS = ["n_parts", "n_never_sold", "never_sold_ppm",
             "idle_retail_cents"]


def q_shelf_warmer_census(sf_dir):
    """Dead inventory: catalog parts with ZERO lineitems ever, and
    the total list-price value parked in them — every shelf warmer
    costs catalog surface, photography, and index space while
    earning nothing.  The sold-part set folds as one distinct
    pass against the part dim."""
    # the part dim streams; the sold set reduces distributed and
    # broadcasts back (stages/broadcast.py) — neither table lands whole
    # on the driver
    import ray

    from mimirsbrunn_ray.stages.broadcast import probe

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["l_partkey"]))
        return b.select(["l_partkey"]).group_by(
            ["l_partkey"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["l_partkey"]).group_by(
            ["l_partkey"]).aggregate([])

    sold_df = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        distinct,
    ).to_pandas()
    sold_ref = ray.put(np.sort(
        sold_df["l_partkey"].to_numpy(np.int64)
        if "l_partkey" in sold_df.columns
        else np.array([], np.int64), kind="stable"))

    def census(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b["p_partkey"]),
                             pc.is_valid(b["p_retailprice"])))
        if b.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("n", "never", "idle")})
        rp = b["p_retailprice"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        cents = np.where(
            rp >= 0, np.floor(rp * 100.0 + 0.5),
            np.ceil(rp * 100.0 - 0.5)).astype(np.int64)
        pk = b["p_partkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        is_sold, _ = probe(pk, ray.get(sold_ref), {})
        return pa.table({
            "n": pa.array([np.int64(len(pk))]),
            "never": pa.array([np.int64((~is_sold).sum())]),
            "idle": pa.array([np.int64(cents[~is_sold].sum())]),
        })

    cen = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_retailprice"],
    ).map_batches(census, batch_format="pyarrow",
                  batch_size=None).to_pandas()
    n_parts = int(cen["n"].sum()) if "n" in cen.columns else 0
    if n_parts == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SWC_COLS})
    never = int(cen["never"].sum())
    idle = int(cen["idle"].sum())
    return pa.table({
        "n_parts": pa.array([n_parts], pa.int64()),
        "n_never_sold": pa.array([never], pa.int64()),
        "never_sold_ppm": pa.array(
            [_round_half_away(never / n_parts * 1e6)],
            pa.int64()),
        "idle_retail_cents": pa.array([idle], pa.int64()),
    })


SWC_SQL = """
WITH sold AS MATERIALIZED (
  SELECT DISTINCT l_partkey FROM lineitem
  WHERE l_partkey IS NOT NULL
), pp AS MATERIALIZED (
  SELECT p.p_partkey,
         CAST(ROUND(p.p_retailprice * 100, 0) AS BIGINT)
           AS cents,
         CASE WHEN sold.l_partkey IS NULL THEN 1 ELSE 0 END
           AS never
  FROM part p LEFT JOIN sold ON sold.l_partkey = p.p_partkey
  WHERE p.p_partkey IS NOT NULL AND p.p_retailprice IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(never) AS BIGINT) AS n_never_sold,
       CAST(ROUND(CAST(SUM(never) AS DOUBLE) / COUNT(*)
            * 1000000, 0) AS BIGINT) AS never_sold_ppm,
       CAST(SUM(CASE WHEN never = 1 THEN cents ELSE 0 END)
            AS BIGINT) AS idle_retail_cents
FROM pp HAVING COUNT(*) > 0
"""

_SVR_COLS = ["event_type", "mean_share_ppm", "sd_share_ppm"]


def q_share_volatility_ranking(sf_dir):
    """Which type breaks composition alerts?  Per event type, the
    mean and standard deviation (two-pass, population) of its
    DAILY share of the type mix — the type with the widest share
    swings triggers every mix-drift alarm first and deserves its
    own band.  Daily counts fold once; shares are exact ratios."""
    cc = _type_cell_counts(sf_dir, "day", _DAY_US, None)
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "mean_share_ppm": pa.array([], pa.int64()),
            "sd_share_ppm": pa.array([], pa.int64()),
        })
    piv = cc.pivot_table(index="day", columns="event_type",
                         values="c", aggfunc="sum", fill_value=0)
    m = piv.to_numpy(np.float64)
    day_tot = m.sum(axis=1)
    keep = day_tot > 0
    m = m[keep]
    day_tot = day_tot[keep]
    shares = m / day_tot[:, None]
    mu = shares.mean(axis=0)
    sd = np.sqrt(((shares - mu[None, :]) ** 2).mean(axis=0))
    types = list(piv.columns)
    order = sorted(range(len(types)), key=lambda i: types[i])
    return pa.table({
        "event_type": pa.array(
            [types[i] for i in order], pa.string()),
        "mean_share_ppm": pa.array(
            [_round_half_away(mu[i] * 1e6) for i in order],
            pa.int64()),
        "sd_share_ppm": pa.array(
            [_round_half_away(sd[i] * 1e6) for i in order],
            pa.int64()),
    })


SVR_SQL = f"""
WITH dc AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), grid AS MATERIALIZED (
  SELECT t.event_type, d.day, COALESCE(dc.c, 0) AS c
  FROM (SELECT DISTINCT event_type FROM dc) t
  CROSS JOIN (SELECT DISTINCT day FROM dc) d
  LEFT JOIN dc USING (event_type, day)
), dt AS MATERIALIZED (
  SELECT day, CAST(SUM(c) AS BIGINT) AS tot
  FROM grid GROUP BY 1
), sh AS MATERIALIZED (
  SELECT g.event_type, g.day,
         CAST(g.c AS DOUBLE) / dt.tot AS share
  FROM grid g JOIN dt USING (day)
  WHERE dt.tot > 0
), mu AS MATERIALIZED (
  SELECT event_type, AVG(share) AS m FROM sh GROUP BY 1
)
SELECT sh.event_type,
       CAST(ROUND(ANY_VALUE(mu.m) * 1000000, 0) AS BIGINT)
         AS mean_share_ppm,
       CAST(ROUND(SQRT(AVG((sh.share - mu.m)
                           * (sh.share - mu.m))) * 1000000, 0)
            AS BIGINT) AS sd_share_ppm
FROM sh JOIN mu USING (event_type)
GROUP BY sh.event_type
ORDER BY sh.event_type
"""


def register_r4hu(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "always_on_customers": q_always_on_customers,
            "shelf_warmer_census": q_shelf_warmer_census,
            "share_volatility_ranking": q_share_volatility_ranking,
        }
    )
    oracles.update(
        {
            "always_on_customers": AOC_SQL,
            "shelf_warmer_census": SWC_SQL,
            "share_volatility_ranking": SVR_SQL,
        }
    )
