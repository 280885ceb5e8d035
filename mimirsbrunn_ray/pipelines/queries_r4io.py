"""Round-4 batch IO: the second-touch clock, engagement breadth,
and basket-depth drift — the time-to-second-event distribution
(how fast do users come back for touch #2 — the earliest
retention signal there is), the type-breadth histogram (users by
how many distinct event types they use — the depth-of-adoption
ladder), and the lines-per-active-order yearly series (lines
shipped per distinct active order by ship year — are baskets
deepening or fragmenting?).

Exactness discipline: second-touch gaps are exact microsecond
differences with interpolated quantiles mirrored; breadth and
per-year counts are exact integers; shares snap at ppm."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _HOUR_US,
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


_TSE_COLS = ["n_users", "median_hours_x1e3", "p90_hours_x1e3",
             "within_24h_ppm"]


def q_time_to_second_event(sf_dir):
    """The earliest retention signal: for users with 2+ events,
    the gap between their first and second event — median, p90
    (hours) and the share who return within 24 hours.  The
    second-smallest timestamp per user resolves exactly in hash
    buckets; gaps are exact microsecond integers."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({
            "u": b["user_id"].cast(pa.int64()),
            "us": us,
        })
        return add_bucket(t, "u", 64)

    def second(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "gap": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        out = []
        for u, sub in g.groupby("u"):
            v = np.sort(sub["us"].to_numpy(np.int64))
            if len(v) < 2:
                continue
            out.append(int(v[1] - v[0]))
        return pd.DataFrame(
            {"gap": np.array(out, dtype=np.int64)})

    gg = (
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(second, batch_format="pandas")
        .to_pandas()
    )
    if "gap" not in gg.columns or len(gg) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _TSE_COLS})
    gap = gg["gap"].to_numpy(np.int64).astype(np.float64)
    hours = gap / _HOUR_US
    n = len(gap)
    return pa.table({
        "n_users": pa.array([n], pa.int64()),
        "median_hours_x1e3": pa.array(
            [_round_half_away(float(np.percentile(hours, 50))
                              * 1e3)], pa.int64()),
        "p90_hours_x1e3": pa.array(
            [_round_half_away(float(np.percentile(hours, 90))
                              * 1e3)], pa.int64()),
        "within_24h_ppm": pa.array(
            [_round_half_away(
                int((gap <= 24 * _HOUR_US).sum()) / n * 1e6)],
            pa.int64()),
    })


TSE_SQL = f"""
WITH ue AS MATERIALIZED (
  SELECT user_id AS u, EPOCH_US(ts) AS us,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY EPOCH_US(ts)) AS rk
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
), fs AS MATERIALIZED (
  SELECT u,
         MAX(CASE WHEN rk = 1 THEN us END) AS t1,
         MAX(CASE WHEN rk = 2 THEN us END) AS t2
  FROM ue WHERE rk <= 2 GROUP BY 1
), gp AS MATERIALIZED (
  SELECT CAST(t2 - t1 AS BIGINT) AS gap
  FROM fs WHERE t2 IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(ROUND(QUANTILE_CONT(CAST(gap AS DOUBLE)
            / {_HOUR_US}, 0.5) * 1000, 0) AS BIGINT)
         AS median_hours_x1e3,
       CAST(ROUND(QUANTILE_CONT(CAST(gap AS DOUBLE)
            / {_HOUR_US}, 0.9) * 1000, 0) AS BIGINT)
         AS p90_hours_x1e3,
       CAST(ROUND(CAST(SUM(CASE WHEN gap <= 24 * {_HOUR_US}
                                THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*) * 1000000, 0) AS BIGINT)
         AS within_24h_ppm
FROM gp HAVING COUNT(*) > 0
"""

_TBH_COLS = ["breadth", "n_users", "share_ppm",
             "cum_share_ppm"]


def q_type_breadth_histogram(sf_dir):
    """The depth-of-adoption ladder: users bucketed by how many
    DISTINCT (event type x day-of-week) cells they have ever
    touched (up to 35), with the share and cumulative share at
    each rung — low rungs are narrow habitual users, the top
    rung lives everywhere in the product week.  Distinct
    (user, type, dow) triples fold exactly."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        dow = (us // _DAY_US) % 7
        t = pa.table({
            "u": b["user_id"].cast(pa.int64()),
            "et": b["event_type"].cast(pa.string()),
            "dow": pa.array(dow.astype(np.int64)),
        })
        return t.group_by(["u", "et", "dow"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["u", "et", "dow"]).group_by(
            ["u", "et", "dow"]).aggregate([])

    ut = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["u"],
    ).to_pandas()
    if "u" not in ut.columns or len(ut) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _TBH_COLS})
    breadth = ut.groupby("u").size()
    hist = breadth.value_counts().sort_index()
    tot = int(hist.sum())
    rows = []
    cum = 0
    for br, cnt in hist.items():
        cum += int(cnt)
        rows.append((int(br), int(cnt),
                     _round_half_away(int(cnt) / tot * 1e6),
                     _round_half_away(cum / tot * 1e6)))
    return pa.table({
        "breadth": pa.array([r[0] for r in rows], pa.int64()),
        "n_users": pa.array([r[1] for r in rows], pa.int64()),
        "share_ppm": pa.array(
            [r[2] for r in rows], pa.int64()),
        "cum_share_ppm": pa.array(
            [r[3] for r in rows], pa.int64()),
    })


TBH_SQL = """
WITH ut AS MATERIALIZED (
  SELECT DISTINCT user_id AS u, event_type AS et,
         (EPOCH_US(ts) // 86400000000) % 7 AS dow
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    AND ts IS NOT NULL
), br AS MATERIALIZED (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS breadth
  FROM ut GROUP BY 1
), hist AS MATERIALIZED (
  SELECT breadth, CAST(COUNT(*) AS BIGINT) AS n
  FROM br GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS t FROM hist
)
SELECT h.breadth, h.n AS n_users,
       CAST(ROUND(CAST(h.n AS DOUBLE) / tot.t * 1000000, 0)
            AS BIGINT) AS share_ppm,
       CAST(ROUND(CAST(SUM(h.n) OVER (ORDER BY h.breadth
                       ROWS UNBOUNDED PRECEDING) AS DOUBLE)
            / tot.t * 1000000, 0) AS BIGINT) AS cum_share_ppm
FROM hist h CROSS JOIN tot
ORDER BY h.breadth
"""

_LPY_COLS = ["year", "n_lines", "n_active_orders",
             "lines_per_order_x1e3"]


def q_lines_per_order_yearly(sf_dir):
    """Deepening or fragmenting?  Per ship year: total lines
    shipped, distinct orders active that year, and lines per
    active order — basket depth without a header join, straight
    off the lineitem fact.  Line counts and distinct order keys
    fold exactly."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_orderkey", "l_shipdate"))
        if b.num_rows == 0:
            return pa.table({
                "yr": pa.array([], pa.int64()),
                "ok": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        d = b["l_shipdate"].cast(pa.timestamp("us")).to_pandas()
        yr = d.dt.year.to_numpy(np.int64)
        t = pa.table({
            "yr": pa.array(yr),
            "ok": b["l_orderkey"].cast(pa.int64()),
            "n": pa.array(np.ones(len(yr), np.int64)),
        })
        g = t.group_by(["yr", "ok"]).aggregate([("n", "sum")])
        return g.rename_columns(["yr", "ok", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["yr", "ok"]).aggregate([("n", "sum")])
        return g.rename_columns(["yr", "ok", "n"])

    yo = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["ok"],
    ).to_pandas()
    if "yr" not in yo.columns or len(yo) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LPY_COLS})
    agg = yo.groupby("yr").agg(
        n=("n", "sum"), orders=("ok", "count")).reset_index()
    agg = agg.sort_values("yr")
    return pa.table({
        "year": pa.array(
            agg["yr"].to_numpy(np.int64), pa.int64()),
        "n_lines": pa.array(
            agg["n"].to_numpy(np.int64), pa.int64()),
        "n_active_orders": pa.array(
            agg["orders"].to_numpy(np.int64), pa.int64()),
        "lines_per_order_x1e3": pa.array(
            [_round_half_away(n / o * 1e3)
             for n, o in zip(agg["n"], agg["orders"])],
            pa.int64()),
    })


LPY_SQL = """
WITH yo AS MATERIALIZED (
  SELECT YEAR(l_shipdate) AS yr, l_orderkey AS ok,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_shipdate IS NOT NULL
  GROUP BY 1, 2
)
SELECT CAST(yr AS BIGINT) AS year,
       CAST(SUM(n) AS BIGINT) AS n_lines,
       CAST(COUNT(*) AS BIGINT) AS n_active_orders,
       CAST(ROUND(CAST(SUM(n) AS DOUBLE) / COUNT(*) * 1000, 0)
            AS BIGINT) AS lines_per_order_x1e3
FROM yo
GROUP BY yr
ORDER BY yr
"""


def register_r4io(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "time_to_second_event": q_time_to_second_event,
            "type_breadth_histogram": q_type_breadth_histogram,
            "lines_per_order_yearly": q_lines_per_order_yearly,
        }
    )
    oracles.update(
        {
            "time_to_second_event": TSE_SQL,
            "type_breadth_histogram": TBH_SQL,
            "lines_per_order_yearly": LPY_SQL,
        }
    )
