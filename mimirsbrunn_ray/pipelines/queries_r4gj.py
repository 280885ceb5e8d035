"""Round-4 batch GJ: self-excitation, habit strength, and service
drift — the aftershock share per event type (fraction of events
arriving within 60 s of the previous same-type event — the
threshold census of clustering that interarrival moments only
imply), the habitual-hour share per user (how much of a user's
activity falls in their own modal hour-of-day, averaged — the
behavioral regularity number), and the monthly ship-latency trend
(per-month median first-ship latency plus the OLS slope across
months — is fulfillment actually getting slower?).

Exactness discipline: aftershock and modal-hour counts are pure
integers (modal ties break to the earliest hour on both sides);
monthly medians use the interpolated convention on exact integer
day latencies and the trend folds the identical centered OLS
sums."""

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

_AFTER_US = 60_000_000  # 60 s aftershock window


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_AS_COLS = ["event_type", "n_gaps", "n_aftershocks",
            "share_ppm"]


def q_aftershock_share(sf_dir):
    """Afterschock census per event type: the share of inter-
    arrival gaps (in (ts, event_id) order) at or under 60 s — the
    direct clustering fraction that Fano factors and burstiness
    coefficients only summarize; near zero means a smooth stream,
    large means arrivals chain.  Types are hash-bucketed whole;
    the gap scan is one vectorized diff."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "event_id"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "ts", "event_id"))
        t = pa.table({
            "event_type": b["event_type"],
            "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_id": b["event_id"],
        })
        return add_bucket(t, "event_type", 8)

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "event_type": pd.Series([], dtype=object),
            "n_gaps": pd.Series([], dtype=np.int64),
            "n_after": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        g = g.sort_values(["event_type", "us", "event_id"],
                          kind="mergesort", ignore_index=True)
        et = g["event_type"].to_numpy()
        us = g["us"].to_numpy(dtype=np.int64)
        same = np.zeros(len(g), dtype=bool)
        same[1:] = et[1:] == et[:-1]
        gaps = np.where(same, us - np.concatenate(([0], us[:-1])),
                        -1)
        df = pd.DataFrame({
            "event_type": et[same],
            "n_gaps": np.ones(int(same.sum()), np.int64),
            "n_after": (gaps[same] <= _AFTER_US).astype(np.int64),
        })
        agg = df.groupby("event_type", sort=False).agg(
            n_gaps=("n_gaps", "sum"),
            n_after=("n_after", "sum")).reset_index()
        for c in ["n_gaps", "n_after"]:
            agg[c] = agg[c].astype(np.int64)
        return agg

    res = (
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(scan, batch_format="pandas")
        .to_pandas()
    )
    if "event_type" not in res.columns or len(res) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _AS_COLS[1:]},
        })
    res = res.sort_values("event_type", ignore_index=True)
    keep = res["n_gaps"].astype(np.int64) > 0
    res = res[keep]
    ppm = [
        _round_half_away(a / n * 1e6)
        for a, n in zip(res["n_after"].astype(np.int64),
                        res["n_gaps"].astype(np.int64))
    ]
    return pa.table({
        "event_type": pa.array(res["event_type"], pa.string()),
        "n_gaps": pa.array(res["n_gaps"].to_numpy(np.int64)),
        "n_aftershocks": pa.array(
            res["n_after"].to_numpy(np.int64)),
        "share_ppm": pa.array(ppm, pa.int64()),
    })


AFTERSHOCK_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) AS us, event_id
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL
), gp AS MATERIALIZED (
  SELECT event_type,
         us - LAG(us) OVER (PARTITION BY event_type
                            ORDER BY us, event_id) AS gap
  FROM e
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(SUM(CASE WHEN gap <= {_AFTER_US} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_aftershocks,
       CAST(ROUND(CAST(SUM(CASE WHEN gap <= {_AFTER_US}
                                THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*) * 1000000, 0) AS BIGINT) AS share_ppm
FROM gp WHERE gap IS NOT NULL
GROUP BY event_type
HAVING COUNT(*) > 0
ORDER BY event_type
"""

_HAB_COLS = ["n_users", "mean_share_ppm", "min_share_ppm",
             "max_share_ppm"]


def q_habitual_hour_share(sf_dir):
    """Habit-strength census: per user, the share of their events
    in their own MODAL hour-of-day (ties to the earliest hour),
    then the mean/min/max share across users — near 1/24 means no
    routine, large means strongly scheduled behavior.  Per-(user,
    hour) counts fold in one user-sharded pass; modal selection is
    exact integer."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        hr = pc.divide(us, _HOUR_US)
        hod = pc.subtract(
            hr, pc.multiply(pc.divide(hr, 24),
                            pa.scalar(24, pa.int64())))
        t = pa.table({"user_id": b["user_id"], "hod": hod})
        g = t.group_by(["user_id", "hod"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["user_id", "hod", "c"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id", "hod"]).aggregate(
            [("c", "sum")])
        return g.rename_columns(["user_id", "hod", "c"])

    uh = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["user_id"],
    ).to_pandas()
    if "user_id" not in uh.columns or len(uh) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _HAB_COLS})
    uh = uh.sort_values(["user_id", "hod"], ignore_index=True)
    uid = uh["user_id"].to_numpy(np.int64)
    c = uh["c"].to_numpy(np.int64)
    first = np.ones(len(uh), dtype=bool)
    first[1:] = uid[1:] != uid[:-1]
    starts = np.flatnonzero(first)
    totals = np.add.reduceat(c, starts)
    # modal count per user: max within run (ties: value identical)
    modal = np.maximum.reduceat(c, starts)
    share = modal / totals
    n = len(starts)
    return pa.table({
        "n_users": pa.array([n], pa.int64()),
        "mean_share_ppm": pa.array(
            [_round_half_away(float(share.mean()) * 1e6)],
            pa.int64()),
        "min_share_ppm": pa.array(
            [_round_half_away(float(share.min()) * 1e6)],
            pa.int64()),
        "max_share_ppm": pa.array(
            [_round_half_away(float(share.max()) * 1e6)],
            pa.int64()),
    })


HABIT_SQL = f"""
WITH uh AS MATERIALIZED (
  SELECT user_id,
         (EPOCH_US(ts) // {_HOUR_US}) % 24 AS hod,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), per_user AS MATERIALIZED (
  SELECT user_id,
         CAST(MAX(c) AS BIGINT) AS modal,
         CAST(SUM(c) AS BIGINT) AS total
  FROM uh GROUP BY 1
), shares AS (
  SELECT CAST(modal AS DOUBLE) / total AS share FROM per_user
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(ROUND(AVG(share) * 1000000, 0) AS BIGINT)
         AS mean_share_ppm,
       CAST(ROUND(MIN(share) * 1000000, 0) AS BIGINT)
         AS min_share_ppm,
       CAST(ROUND(MAX(share) * 1000000, 0) AS BIGINT)
         AS max_share_ppm
FROM shares HAVING COUNT(*) > 0
"""

_SLT_COLS = ["n_months", "slope_days_per_month_x1e6",
             "first_med_x1e3", "last_med_x1e3"]


def q_ship_latency_trend(sf_dir):
    """Service-drift check: per order-month, the median first-ship
    latency in days (interpolated median over exact integer day
    latencies), and the OLS slope of those medians against the
    month index — positive slope in days/month means fulfillment
    is genuinely slowing, not just noisier.  Per-order latencies
    resolve in one distributed pass."""
    # scale shape: per-order first-ship stays a Dataset; the order-date
    # attaches via budget-gated broadcast / join; the per-month median
    # folds over a distributed (month, latency-days) histogram — months x
    # small-int latencies, a bounded reduction. Orders never land whole
    # on the driver.
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
            return pa.table({"mon": pa.array([], pa.int64()),
                             "lat": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        od = b["o_orderdate"].cast(pa.timestamp("us"))
        mon = pc.add(
            pc.multiply(pc.year(od).cast(pa.int64()), pa.scalar(12)),
            pc.subtract(pc.month(od).cast(pa.int64()), pa.scalar(1)))
        lat = (b["ship"].to_numpy(zero_copy_only=False)
               - od.cast(pa.int64()).to_numpy(zero_copy_only=False)) \
            // _DAY_US
        t = pa.table({
            "mon": mon,
            "lat": pa.array(lat.astype(np.int64)),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["mon", "lat"]).aggregate([("n", "sum")])
        return g.rename_columns(["mon", "lat", "n"])

    def hist_comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["mon", "lat"]).aggregate([("n", "sum")])
        return g.rename_columns(["mon", "lat", "n"])

    hist = tree_merge(
        fs.map_batches(hist_part, batch_format="pyarrow",
                       batch_size=None),
        hist_comb).to_pandas()
    if "mon" not in hist.columns or len(hist) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SLT_COLS})
    hist = hist.sort_values(["mon", "lat"], ignore_index=True)

    def med_from_hist(sub: pd.DataFrame) -> float:
        v = sub["lat"].to_numpy(np.int64)
        c = sub["n"].to_numpy(np.int64)
        cum = np.cumsum(c)
        ntot = int(cum[-1])
        pos = (ntot - 1) / 2.0
        i0, i1 = int(np.floor(pos)), int(np.ceil(pos))
        lo = float(v[np.searchsorted(cum, i0 + 1, side="left")])
        hi = float(v[np.searchsorted(cum, i1 + 1, side="left")])
        return (lo + hi) / 2.0

    med = hist.groupby("mon", sort=True).apply(
        med_from_hist, include_groups=False)
    if len(med) < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SLT_COLS})
    x = med.index.to_numpy(np.float64)
    y = med.to_numpy(np.float64)
    n = len(x)
    sx, sy = x.sum(), y.sum()
    sxx = (x * x).sum()
    sxy = (x * y).sum()
    den = n * sxx - sx * sx
    if den == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SLT_COLS})
    slope = (n * sxy - sx * sy) / den
    return pa.table({
        "n_months": pa.array([n], pa.int64()),
        "slope_days_per_month_x1e6": pa.array(
            [_round_half_away(slope * 1e6)], pa.int64()),
        "first_med_x1e3": pa.array(
            [_round_half_away(float(y[0]) * 1e3)], pa.int64()),
        "last_med_x1e3": pa.array(
            [_round_half_away(float(y[-1]) * 1e3)], pa.int64()),
    })


SHIP_TREND_SQL = f"""
WITH fs AS MATERIALIZED (
  SELECT o.o_orderkey,
         YEAR(o.o_orderdate) * 12 + MONTH(o.o_orderdate) - 1
           AS mon,
         CAST((MIN(EPOCH_US(l.l_shipdate))
               - EPOCH_US(o.o_orderdate)) // {_DAY_US}
              AS DOUBLE) AS lat
  FROM orders o JOIN lineitem l
    ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey IS NOT NULL AND o.o_orderdate IS NOT NULL
    AND l.l_shipdate IS NOT NULL
  GROUP BY 1, 2, EPOCH_US(o.o_orderdate)
), med AS MATERIALIZED (
  SELECT mon, MEDIAN(lat) AS m FROM fs GROUP BY 1
), st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(mon AS DOUBLE)) AS sx,
         SUM(m) AS sy,
         SUM(CAST(mon AS DOUBLE) * mon) AS sxx,
         SUM(CAST(mon AS DOUBLE) * m) AS sxy,
         MIN(mon) AS mon0, MAX(mon) AS mon1
  FROM med
)
SELECT st.n AS n_months,
       CAST(ROUND((st.n * st.sxy - st.sx * st.sy)
            / (st.n * st.sxx - st.sx * st.sx) * 1000000, 0)
            AS BIGINT) AS slope_days_per_month_x1e6,
       CAST(ROUND((SELECT m FROM med WHERE mon = st.mon0)
            * 1000, 0) AS BIGINT) AS first_med_x1e3,
       CAST(ROUND((SELECT m FROM med WHERE mon = st.mon1)
            * 1000, 0) AS BIGINT) AS last_med_x1e3
FROM st
WHERE st.n >= 2 AND st.n * st.sxx - st.sx * st.sx <> 0
"""


def register_r4gj(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "aftershock_share": q_aftershock_share,
            "habitual_hour_share": q_habitual_hour_share,
            "ship_latency_trend": q_ship_latency_trend,
        }
    )
    oracles.update(
        {
            "aftershock_share": AFTERSHOCK_SQL,
            "habitual_hour_share": HABIT_SQL,
            "ship_latency_trend": SHIP_TREND_SQL,
        }
    )
