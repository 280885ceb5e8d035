"""Round-4 batch HD: value stickiness, weekday queue costs, and
dark days — the lag-1 correlation of event VALUE between
consecutive events of the same user (is value a user-state
variable or per-event noise?), mean/median first-ship latency by
the order's day-of-week (the does-Friday-cost-you-days queue
audit), and the zero-activity day census (calendar days with no
events at all — each one either an outage or an ingestion hole,
never business as usual).

Exactness discipline: value pairs fold identical doubles over the
same (ts, event_id)-ordered adjacency; latencies are exact
integer days with interpolated medians; dark days are pure
integer set difference on the dense calendar."""

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


_UVS_COLS = ["n_pairs", "r_x1e6", "mean_value_x1e3"]


def q_user_value_stickiness(sf_dir):
    """Is event value a user-state variable?  The Pearson
    correlation between consecutive same-user event values (in
    (ts, event_id) order, pooled across users) — high r means
    value carries across a user's events and user-level features
    capture it; ~0 means value is per-event and needs event-level
    modeling.  Adjacent pairs resolve in user-disjoint shards;
    moments fold identically."""
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

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "x": pd.Series([], dtype=np.float64),
            "y": pd.Series([], dtype=np.float64),
        })
        if len(g) < 2:
            return empty
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy()
        v = g["v"].to_numpy(np.float64)
        same = uid[1:] == uid[:-1]
        return pd.DataFrame({"x": v[:-1][same],
                             "y": v[1:][same]})

    pr = (
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if "x" not in pr.columns or len(pr) < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _UVS_COLS})
    x = pr["x"].to_numpy(np.float64)
    y = pr["y"].to_numpy(np.float64)
    r = _pearson(x, y)
    if r is None:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _UVS_COLS})
    return pa.table({
        "n_pairs": pa.array([len(pr)], pa.int64()),
        "r_x1e6": pa.array(
            [_round_half_away(r * 1e6)], pa.int64()),
        "mean_value_x1e3": pa.array(
            [_round_half_away(float(x.mean()) * 1e3)],
            pa.int64()),
    })


UVS_SQL = """
WITH e AS MATERIALIZED (
  SELECT user_id, CAST(value AS DOUBLE) AS v,
         EPOCH_US(ts) AS us, event_id
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND value IS NOT NULL
), pr AS MATERIALIZED (
  SELECT LAG(v) OVER w AS x, v AS y,
         LAG(user_id) OVER w AS pu, user_id
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), ok AS MATERIALIZED (
  SELECT x, y FROM pr WHERE x IS NOT NULL
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
       CAST(ROUND(mu.mx * 1000, 0) AS BIGINT) AS mean_value_x1e3
FROM mu CROSS JOIN mom
WHERE mu.n >= 3 AND mom.sxx * mom.syy > 0
"""

_LBD_COLS = ["order_dow", "n_orders", "mean_lat_x1e3",
             "median_lat_x1e3"]


def q_latency_by_order_dow(sf_dir):
    """Queue-cost by weekday: mean and median first-ship latency
    (days) grouped by the ORDER's day-of-week (epoch convention,
    day 0 = Thursday) — a weekend hump quantifies exactly how many
    days a Friday order loses to the queue.  The order map
    broadcasts; latencies fold as exact integers with interpolated
    medians per weekday group."""
    # scale shape: per-order first-ship stays a Dataset, the order date
    # attaches via budget-gated broadcast / join, and weekday stats fold
    # over a distributed (dow, latency-days) histogram — 7 x small-int
    # cells. Orders never land whole on the driver.
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_orderkey", "l_shipdate"))
        t = pa.table({
            "okey": b["l_orderkey"].cast(pa.int64()),
            "ship": b["l_shipdate"].cast(
                pa.timestamp("us")).cast(pa.int64()),
        })
        g = t.group_by(["okey"]).aggregate([("ship", "min")])
        return g.rename_columns(["okey", "ship"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["okey"]).aggregate([("ship", "min")])
        return g.rename_columns(["okey", "ship"])

    fs = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["okey"],
    )
    fs = attach_dim(fs, "okey", sf_dir, "orders", "o_orderkey",
                    ["o_orderdate"], how="inner")

    def hist_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"dow": pa.array([], pa.int64()),
                             "lat": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        o_arr = b["o_orderdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        lat = (b["ship"].to_numpy(zero_copy_only=False)
               - o_arr) // _DAY_US
        dow = (o_arr // _DAY_US + 4) % 7
        t = pa.table({
            "dow": pa.array(dow.astype(np.int64)),
            "lat": pa.array(lat.astype(np.int64)),
            "n": pa.array(np.ones(len(lat), np.int64)),
        })
        g = t.group_by(["dow", "lat"]).aggregate([("n", "sum")])
        return g.rename_columns(["dow", "lat", "n"])

    def hist_comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["dow", "lat"]).aggregate([("n", "sum")])
        return g.rename_columns(["dow", "lat", "n"])

    hist = tree_merge(
        fs.map_batches(hist_part, batch_format="pyarrow",
                       batch_size=None),
        hist_comb).to_pandas()
    if "dow" not in hist.columns or len(hist) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LBD_COLS})
    hist = hist.sort_values(["dow", "lat"], ignore_index=True)
    out = {c: [] for c in _LBD_COLS}
    for d, g in hist.groupby("dow", sort=True):
        v = g["lat"].to_numpy(np.int64)
        c = g["n"].to_numpy(np.int64)
        cum = np.cumsum(c)
        ntot = int(cum[-1])
        pos = (ntot - 1) / 2.0
        i0, i1 = int(np.floor(pos)), int(np.ceil(pos))
        lo = float(v[np.searchsorted(cum, i0 + 1, side="left")])
        hi = float(v[np.searchsorted(cum, i1 + 1, side="left")])
        out["order_dow"].append(int(d))
        out["n_orders"].append(ntot)
        out["mean_lat_x1e3"].append(
            _round_half_away(float((v * c).sum()) / ntot * 1e3))
        out["median_lat_x1e3"].append(
            _round_half_away((lo + hi) / 2.0 * 1e3))
    return pa.table(
        {c: pa.array(out[c], pa.int64()) for c in _LBD_COLS})


LBD_SQL = f"""
WITH fs AS MATERIALIZED (
  SELECT o.o_orderkey,
         ((EPOCH_US(o.o_orderdate) // {_DAY_US}) + 4) % 7
           AS dow,
         CAST((MIN(EPOCH_US(l.l_shipdate))
               - EPOCH_US(o.o_orderdate)) // {_DAY_US}
              AS DOUBLE) AS lat
  FROM orders o JOIN lineitem l
    ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey IS NOT NULL AND o.o_orderdate IS NOT NULL
    AND l.l_shipdate IS NOT NULL
  GROUP BY 1, 2, EPOCH_US(o.o_orderdate)
)
SELECT CAST(dow AS BIGINT) AS order_dow,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(AVG(lat) * 1000, 0) AS BIGINT)
         AS mean_lat_x1e3,
       CAST(ROUND(MEDIAN(lat) * 1000, 0) AS BIGINT)
         AS median_lat_x1e3
FROM fs GROUP BY 1 ORDER BY order_dow
"""

_ZAD_COLS = ["n_span_days", "n_active_days", "n_dark_days",
             "max_dark_run"]


def q_zero_activity_days(sf_dir):
    """Dark-day census: calendar days inside the observed span
    with ZERO events — every one is an outage or an ingestion
    hole, and their count plus the longest consecutive run is the
    first thing to check before trusting any daily trend fit on
    this data.  Distinct active days fold exactly; the dense-span
    difference and run scan are pure integers."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({"day": pc.divide(us, _DAY_US)})
        return t.group_by(["day"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["day"]).group_by(["day"]).aggregate([])

    dd = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        distinct,
    ).to_pandas()
    if "day" not in dd.columns or len(dd) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ZAD_COLS})
    days = np.sort(dd["day"].to_numpy(np.int64))
    dmin, dmax = int(days.min()), int(days.max())
    span = dmax - dmin + 1
    active = np.zeros(span, dtype=bool)
    active[days - dmin] = True
    dark = ~active
    n_dark = int(dark.sum())
    if n_dark == 0:
        max_run = 0
    else:
        brk = np.ones(span, dtype=bool)
        brk[1:] = dark[1:] != dark[:-1]
        starts = np.flatnonzero(brk)
        lens = np.diff(np.append(starts, span))
        states = dark[starts]
        max_run = int(lens[states].max())
    return pa.table({
        "n_span_days": pa.array([span], pa.int64()),
        "n_active_days": pa.array([len(days)], pa.int64()),
        "n_dark_days": pa.array([n_dark], pa.int64()),
        "max_dark_run": pa.array([max_run], pa.int64()),
    })


ZAD_SQL = f"""
WITH ad AS MATERIALIZED (
  SELECT DISTINCT EPOCH_US(ts) // {_DAY_US} AS day
  FROM events WHERE ts IS NOT NULL
), span AS MATERIALIZED (
  SELECT MIN(day) AS dmin, MAX(day) AS dmax,
         MAX(day) - MIN(day) + 1 AS n_span,
         CAST(COUNT(*) AS BIGINT) AS n_active
  FROM ad
), grid AS MATERIALIZED (
  SELECT s.dmin + r.k AS day,
         CASE WHEN ad.day IS NULL THEN 1 ELSE 0 END AS dark
  FROM span s
  JOIN range(0, 100000) r(k) ON s.dmin + r.k <= s.dmax
  LEFT JOIN ad ON ad.day = s.dmin + r.k
), brks AS MATERIALIZED (
  SELECT day, dark,
         CASE WHEN dark <> COALESCE(LAG(dark)
                OVER (ORDER BY day), -1)
              THEN 1 ELSE 0 END AS brk
  FROM grid
), runs AS MATERIALIZED (
  SELECT day, dark,
         SUM(brk) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS rid
  FROM brks
), dr AS MATERIALIZED (
  SELECT rid, ANY_VALUE(dark) AS dark,
         CAST(COUNT(*) AS BIGINT) AS len
  FROM runs GROUP BY 1
)
SELECT CAST(span.n_span AS BIGINT) AS n_span_days,
       span.n_active AS n_active_days,
       CAST(span.n_span - span.n_active AS BIGINT)
         AS n_dark_days,
       CAST(COALESCE((SELECT MAX(len) FROM dr WHERE dark = 1),
                     0) AS BIGINT) AS max_dark_run
FROM span
"""


def register_r4hd(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "user_value_stickiness": q_user_value_stickiness,
            "latency_by_order_dow": q_latency_by_order_dow,
            "zero_activity_days": q_zero_activity_days,
        }
    )
    oracles.update(
        {
            "user_value_stickiness": UVS_SQL,
            "latency_by_order_dow": LBD_SQL,
            "zero_activity_days": ZAD_SQL,
        }
    )
