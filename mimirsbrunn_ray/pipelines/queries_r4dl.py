"""Round-4 batch DL: PromQL predict_linear over hourly means,
per-segment purchase acceleration (second difference of order gaps),
and the exploration-decay audit (type entropy, first vs second half of
each user's history).

Exactness discipline: hourly means / gap differences / half-split type
counts fold from exact int64 sufficient statistics (user histories are
complete inside their hash bucket; the half split is the exact integer
rank rule rn * 2 <= n); regression, means and entropies are mirrored
doubles, x1e6 snap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.join import broadcast_join, make_lookup_ref
from mimirsbrunn_ray.stages.rollup import tree_merge
from mimirsbrunn_ray.stages.timeseries import (
    _round_half_away_x,
    _series_segments,
)

_HOUR_US = 3_600_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


def _clean(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# PromQL predict_linear: extrapolate hourly means one hour ahead
# ---------------------------------------------------------------------------


def q_predict_linear_1h(sf_dir):
    """Per event type: PromQL's ``predict_linear(metric[all], 3600)`` —
    the least-squares line through the hourly mean series evaluated ONE
    HOUR past the last bucket, the primitive behind "disk full in N
    hours" alerts. Hourly means divide identical exact integers; the
    regression uses the per-type REBASED hour index (small-magnitude
    sums); slope, intercept and the extrapolated value are mirrored
    doubles, x1e6 snap, NULL under 3 buckets or zero time variance."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        h = ((us // _HOUR_US) * _HOUR_US).astype(np.int64)
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "h": pa.array(h),
                "s": pa.array(x),
                "c": pa.array(np.ones(len(x), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "h"], ["s", "c"])

    cells = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "h"], ["s", "c"]),
    ).to_pandas()
    if not len(cells) or "event_type" not in cells.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_hours": pa.array([], pa.int64()),
                "predicted_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "n_hours": [], "predicted_x1e6": []}
    for et, g in cells.sort_values(["event_type", "h"]).groupby(
        "event_type", sort=True
    ):
        g = g.sort_values("h", ignore_index=True)
        n = len(g)
        out["event_type"].append(et)
        out["n_hours"].append(n)
        if n < 3:
            out["predicted_x1e6"].append(None)
            continue
        hidx = g["h"].to_numpy(dtype=np.int64) // _HOUR_US
        t = (hidx - hidx.min()).astype(np.float64)
        y = g["s"].to_numpy(dtype=np.float64) / g["c"].to_numpy(dtype=np.int64)
        tbar = float(np.sum(t)) / n
        ybar = float(np.sum(y)) / n
        sxx = float(np.sum((t - tbar) * (t - tbar)))
        if sxx == 0.0:
            out["predicted_x1e6"].append(None)
            continue
        slope = float(np.sum((t - tbar) * (y - ybar))) / sxx
        t_pred = float(t.max()) + 1.0
        pred = (ybar - slope * tbar) + slope * t_pred
        # value back in ORIGINAL units (means were x100)
        out["predicted_x1e6"].append(
            int(_round_half_away(np.array([pred / 100.0 * 1e6]))[0])
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_hours": pa.array(out["n_hours"], pa.int64()),
            "predicted_x1e6": pa.array(out["predicted_x1e6"], pa.int64()),
        }
    )


PREDICT_LINEAR_SQL = """
WITH cell AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) AS hidx,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), lo AS MATERIALIZED (
  SELECT event_type, MIN(hidx) AS h0 FROM cell GROUP BY 1
), m AS MATERIALIZED (
  SELECT cell.event_type, CAST(cell.hidx - lo.h0 AS DOUBLE) AS t,
         CAST(cell.s AS DOUBLE) / cell.c AS y
  FROM cell JOIN lo ON lo.event_type = cell.event_type
), f AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(t) / COUNT(*) AS tbar, SUM(y) / COUNT(*) AS ybar,
         MAX(t) AS tmax
  FROM m GROUP BY 1
), fit AS (
  SELECT m.event_type, f.n, f.tbar, f.ybar, f.tmax,
         SUM((m.t - f.tbar) * (m.t - f.tbar)) AS sxx,
         SUM((m.t - f.tbar) * (m.y - f.ybar)) AS sxy
  FROM m JOIN f ON f.event_type = m.event_type
  GROUP BY 1, 2, 3, 4, 5
)
SELECT event_type, n AS n_hours,
       CASE WHEN n < 3 OR sxx = 0 THEN NULL
            ELSE CAST(ROUND(
              ((ybar - sxy / sxx * tbar) + sxy / sxx * (tmax + 1.0))
              / 100.0 * 1000000, 0) AS BIGINT) END AS predicted_x1e6
FROM fit ORDER BY 1
"""


# ---------------------------------------------------------------------------
# purchase acceleration per market segment
# ---------------------------------------------------------------------------


def q_purchase_acceleration_segment(sf_dir):
    """Per market segment: the mean SECOND difference of a customer's
    consecutive order gaps (hour grain) — negative = customers re-order
    faster and faster (engagement compounding), positive = they slow
    down (churn precursor); the acceleration companion to the gamma
    inter-purchase fit. Gap second-differences need two lags, masked to
    stay inside one customer's ordered history (complete per hash
    bucket); sums fold exact int64; segments attach via the broadcast
    dimension join; one mirrored mean per segment, x1e6 snap."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"],
    )

    def prep(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b["o_custkey"]), pc.is_valid(b["o_orderdate"]))
        return add_bucket(b.filter(m), "o_custkey", 64)

    bucketed = orders.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "o_custkey": pd.Series([], dtype=np.int64),
                "n_acc": pd.Series([], dtype=np.int64),
                "s_acc": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "o_custkey", "o_orderdate", "o_orderkey")
        ts_us = (
            g["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        n = len(g)
        dt = np.zeros(n, dtype=np.int64)
        dt[1:] = (ts_us[1:] - ts_us[:-1]) // _HOUR_US
        ok = np.zeros(n, dtype=bool)  # rows with TWO prior same-key gaps
        ok[2:] = same[2:] & same[1:-1]
        acc = np.zeros(n, dtype=np.int64)
        acc[2:] = dt[2:] - dt[1:-1]
        d = pd.DataFrame(
            {"o_custkey": g["o_custkey"].to_numpy()[ok], "acc": acc[ok]}
        )
        if not len(d):
            return empty
        a = d.groupby("o_custkey", sort=False)["acc"].agg(
            n_acc="size", s_acc="sum"
        )
        return a.reset_index().astype(
            {"o_custkey": np.int64, "n_acc": np.int64, "s_acc": np.int64}
        )

    per_cust = bucketed.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    from mimirsbrunn_ray.stages.join import lookup_ref_from_parquet

    # budget-gated: broadcast arrays under the byte budget, else the
    # distributed left-join fallback via dim_spec
    _dim = (f"{sf_dir}/customer.parquet", "c_custkey", "c_mktsegment")
    lookup = lookup_ref_from_parquet(*_dim)
    with_seg = broadcast_join(
        per_cust, lookup, "o_custkey", "c_mktsegment", default=None,
        dim_spec=_dim,
    ).map_batches(
        lambda b: b.filter(pc.is_valid(b["c_mktsegment"])),
        batch_format="pyarrow",
        batch_size=None,
    )
    agg = tree_merge(
        with_seg.map_batches(
            lambda b: _sum_by(
                b.select(["c_mktsegment", "n_acc", "s_acc"]),
                ["c_mktsegment"],
                ["n_acc", "s_acc"],
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        lambda b: _sum_by(b, ["c_mktsegment"], ["n_acc", "s_acc"]),
    ).to_pandas()
    if not len(agg) or "c_mktsegment" not in agg.columns:
        return pa.table(
            {
                "c_mktsegment": pa.array([], pa.string()),
                "n_acc": pa.array([], pa.int64()),
                "mean_acc_x1e6": pa.array([], pa.int64()),
            }
        )
    agg = agg.sort_values("c_mktsegment", ignore_index=True)
    vals = [
        None
        if int(agg["n_acc"].iloc[i]) == 0
        else int(
            _round_half_away(
                np.array(
                    [
                        float(agg["s_acc"].iloc[i])
                        / int(agg["n_acc"].iloc[i])
                        * 1e6
                    ]
                )
            )[0]
        )
        for i in range(len(agg))
    ]
    return pa.table(
        {
            "c_mktsegment": pa.array(agg["c_mktsegment"].tolist(), pa.string()),
            "n_acc": pa.array(agg["n_acc"].to_numpy(dtype=np.int64)),
            "mean_acc_x1e6": pa.array(vals, pa.int64()),
        }
    )


ACCELERATION_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderdate, o_orderkey FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
), g AS (
  SELECT o_custkey,
         (EPOCH_US(o_orderdate) - EPOCH_US(LAG(o_orderdate) OVER w))
           // 3600000000 AS dt,
         (EPOCH_US(LAG(o_orderdate) OVER w)
          - EPOCH_US(LAG(o_orderdate, 2) OVER w)) // 3600000000 AS dt_prev
  FROM o WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey)
), d AS (
  SELECT o_custkey, dt - dt_prev AS acc FROM g
  WHERE dt IS NOT NULL AND dt_prev IS NOT NULL
), a AS (
  SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_acc,
         CAST(SUM(d.acc) AS BIGINT) AS s_acc
  FROM d JOIN customer c ON c.c_custkey = d.o_custkey
  WHERE c.c_mktsegment IS NOT NULL
  GROUP BY 1
)
SELECT c_mktsegment, n_acc,
       CASE WHEN n_acc = 0 THEN NULL
            ELSE CAST(ROUND(CAST(s_acc AS DOUBLE) / n_acc * 1000000, 0)
                 AS BIGINT) END AS mean_acc_x1e6
FROM a ORDER BY 1
"""


# ---------------------------------------------------------------------------
# exploration decay: type entropy, first vs second half of user history
# ---------------------------------------------------------------------------


def q_exploration_decay_users(sf_dir):
    """One-row behavioral-drift statistic: the mean over users of
    (second-half type entropy - first-half type entropy), where each
    user's ordered event history splits at the exact integer rank rule
    rn * 2 <= n — negative = users explore types early then settle
    (the classic engagement funnel), positive = behavior diversifies.
    Per-(user, half, type) counts are complete inside the user's hash
    bucket; each user's two entropies fold from exact ints; the final
    mean is a mirrored double over per-user identical values, x1e6
    snap. Users with fewer than 4 events drop."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def prep(b: pa.Table) -> pa.Table:
        b = _clean(b, ("user_id", "ts", "event_id", "event_type"))
        t = pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "ts": b["ts"].cast(pa.timestamp("us")),
                "event_id": b["event_id"].cast(pa.int64()),
                "event_type": b["event_type"],
            }
        )
        return add_bucket(t, "user_id", 64)

    bucketed = ev.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_users": pd.Series([], dtype=np.int64),
                "s_delta": pd.Series([], dtype=np.float64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "user_id", "ts", "event_id")
        uid = g["user_id"].to_numpy()
        starts = np.flatnonzero(~same)
        bounds = np.append(starts, len(g))
        types = g["event_type"].to_numpy()
        n_users = 0
        s_delta = 0.0
        for i in range(len(starts)):
            lo, hi = bounds[i], bounds[i + 1]
            n = hi - lo
            if n < 4:
                continue
            half = n // 2  # rn * 2 <= n  ==  first floor(n/2) rows
            segs = []
            for a, b_ in ((lo, lo + half), (lo + half, hi)):
                vals, cnts = np.unique(types[a:b_], return_counts=True)
                m = b_ - a
                p = cnts.astype(np.float64) / m
                segs.append(-float(np.sum(p * np.log(p))))
            n_users += 1
            s_delta += segs[1] - segs[0]
        if n_users == 0:
            return empty
        return pd.DataFrame({"n_users": [n_users], "s_delta": [s_delta]})

    parts = bucketed.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    ).to_pandas()
    if not len(parts) or "n_users" not in parts.columns:
        return pa.table(
            {
                "n_users": pa.array([0], pa.int64()),
                "mean_delta_x1e6": pa.array([None], pa.int64()),
            }
        )
    n = int(parts["n_users"].sum())
    s = float(parts["s_delta"].sum())
    return pa.table(
        {
            "n_users": pa.array([n], pa.int64()),
            "mean_delta_x1e6": pa.array(
                [
                    None
                    if n == 0
                    else int(_round_half_away(np.array([s / n * 1e6]))[0])
                ],
                pa.int64(),
            ),
        }
    )


EXPLORATION_SQL = """
WITH r AS MATERIALIZED (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL
), halves AS MATERIALIZED (
  SELECT user_id, CASE WHEN rn * 2 <= n THEN 0 ELSE 1 END AS half,
         event_type, n
  FROM r WHERE n >= 4
), c AS MATERIALIZED (
  SELECT user_id, half, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM halves GROUP BY 1, 2, 3
), hm AS MATERIALIZED (
  SELECT user_id, half, CAST(SUM(c) AS BIGINT) AS m FROM c GROUP BY 1, 2
), ent AS MATERIALIZED (
  SELECT c.user_id, c.half,
         -SUM((CAST(c.c AS DOUBLE) / hm.m)
              * LN(CAST(c.c AS DOUBLE) / hm.m)) AS h
  FROM c JOIN hm ON hm.user_id = c.user_id AND hm.half = c.half
  GROUP BY 1, 2
), delta AS (
  SELECT a.user_id, b.h - a.h AS d
  FROM (SELECT * FROM ent WHERE half = 0) a
  JOIN (SELECT * FROM ent WHERE half = 1) b ON b.user_id = a.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CASE WHEN COUNT(*) = 0 THEN NULL
            ELSE CAST(ROUND(SUM(d) / COUNT(*) * 1000000, 0) AS BIGINT) END
         AS mean_delta_x1e6
FROM delta
"""


def register_r4dl(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "predict_linear_1h": q_predict_linear_1h,
            "purchase_acceleration_segment": q_purchase_acceleration_segment,
            "exploration_decay_users": q_exploration_decay_users,
        }
    )
    oracles.update(
        {
            "predict_linear_1h": PREDICT_LINEAR_SQL,
            "purchase_acceleration_segment": ACCELERATION_SQL,
            "exploration_decay_users": EXPLORATION_SQL,
        }
    )
