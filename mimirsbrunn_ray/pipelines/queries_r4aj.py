"""Round-4 batch AJ: sweep-line interval concurrency, circular
hour-of-day statistics, and churn by last touch.

Exactness discipline: concurrency is an integer sweep-line (+1/-1)
with RANGE-frame tie semantics (peer groups close before sampling),
decomposed hierarchically (per-hour max-prefix + exact integer carry);
circular means use trig constants generated ONCE in Python and inlined
into the SQL twin, so both engines share literally the same 24
integers; churn cutoffs are exact microsecond arithmetic.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000
_ACTIVE_US = 5 * 60_000_000  # each event holds a 5-minute activity window


# ---------------------------------------------------------------------------
# max concurrent activity windows per hour (sweep line)
# ---------------------------------------------------------------------------


def q_max_concurrency_hourly(sf_dir):
    """Max concurrent 5-minute activity windows per hour: every event
    opens [ts, ts+5m); the metric is the sweep-line running count
    sampled after each boundary-point peer group (the SQL RANGE-frame
    convention), maxed per hour of the boundary point — capacity
    planning's 'how many things were in flight'.

    Hierarchical scan, no global sort: boundary points aggregate per
    (t, delta) inside ONE hour-bucket shuffle; each hour group computes
    its net sum and max prefix locally (vectorized cumsum over its
    sorted peer groups); the driver then folds the exact integer carry
    across the bounded hours table — max_h = carry_h + maxprefix_h.
    """
    from mimirsbrunn_ray.stages.dedup import _BUCKET

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def points(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        t = np.concatenate([ts_us, ts_us + _ACTIVE_US])
        d = np.concatenate(
            [np.ones(len(ts_us), np.int64), -np.ones(len(ts_us), np.int64)]
        )
        tb = pa.table({"t": pa.array(t), "d": pa.array(d)})
        # pre-aggregate peer groups batch-locally
        g = tb.group_by(["t", "d"]).aggregate([("d", "sum")])
        g = g.select(["t", "d", "d_sum"]).rename_columns(
            ["t", "d", "delta"]
        )
        hr = pc.divide(g["t"], _HOUR_US)
        g = g.append_column("hr", hr)
        # reuse the engine's bucket column convention for the hour shuffle
        return g.append_column(
            _BUCKET, pc.cast(pc.bit_wise_and(g["hr"], 63), pa.int32())
        )

    pts = ev.map_batches(points, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "hr": pd.Series([], dtype=np.int64),
                "net": pd.Series([], dtype=np.int64),
                "maxprefix": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        # merge peer groups across batches, then per hour: sorted cumsum
        agg = g.groupby(["hr", "t", "d"], sort=True, as_index=False)[
            "delta"
        ].sum()
        rows = {"hr": [], "net": [], "maxprefix": []}
        for hr, h in agg.groupby("hr", sort=True):
            run = np.cumsum(h["delta"].to_numpy(dtype=np.int64))
            rows["hr"].append(int(hr))
            rows["net"].append(int(run[-1]))
            rows["maxprefix"].append(int(run.max()))
        return pd.DataFrame(
            {
                "hr": pd.Series(rows["hr"], dtype=np.int64),
                "net": pd.Series(rows["net"], dtype=np.int64),
                "maxprefix": pd.Series(rows["maxprefix"], dtype=np.int64),
            }
        )

    hours = (
        pts.groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )  # bounded: one row per hour
    if not len(hours):
        return pa.table(
            {
                "hr": pa.array([], pa.int64()),
                "max_concurrent": pa.array([], pa.int64()),
            }
        )
    hours = hours.sort_values("hr", ignore_index=True)
    net = hours["net"].to_numpy(dtype=np.int64)
    carry = np.concatenate(([0], np.cumsum(net)[:-1]))
    mx = carry + hours["maxprefix"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "hr": pa.array(hours["hr"].to_numpy(dtype=np.int64)),
            "max_concurrent": pa.array(mx),
        }
    )


CONCURRENCY_SQL = """
WITH pts AS (
  SELECT EPOCH_US(ts) AS t, CAST(1 AS BIGINT) AS d
  FROM events WHERE ts IS NOT NULL
  UNION ALL
  SELECT EPOCH_US(ts) + 300000000, CAST(-1 AS BIGINT)
  FROM events WHERE ts IS NOT NULL
), s AS (
  SELECT t, d, SUM(d) OVER (ORDER BY t, d) AS run
  FROM pts
)
SELECT CAST(t // 3600000000 AS BIGINT) AS hr,
       CAST(MAX(run) AS BIGINT) AS max_concurrent
FROM s GROUP BY 1
"""


# ---------------------------------------------------------------------------
# circular mean of hour-of-day per type
# ---------------------------------------------------------------------------

# trig constants generated ONCE and shared verbatim with the SQL twin:
# round(cos/sin(2*pi*h/24) * 1e6) for h = 0..23
_COS_X1E6 = [
    int(np.copysign(np.floor(abs(math.cos(2 * math.pi * h / 24)) * 1e6
                             + 0.5), math.cos(2 * math.pi * h / 24)))
    for h in range(24)
]
_SIN_X1E6 = [
    int(np.copysign(np.floor(abs(math.sin(2 * math.pi * h / 24)) * 1e6
                             + 0.5), math.sin(2 * math.pi * h / 24)))
    for h in range(24)
]


def q_circular_mean_hour(sf_dir):
    """Per event type, the circular first moment of hour-of-day — the
    exact integer sums of cos/sin(2*pi*hod/24) in fixed-point x1e6
    (mean direction = atan2(sin_sum, cos_sum), resultant length =
    sqrt(sin^2+cos^2)/n; both derivable from the emitted integers).
    Circular statistics are the correct average for wrap-around
    quantities (23h and 1h average to midnight, not noon). The 24 trig
    constants are generated once in Python and INLINED into the SQL
    twin, so no libm parity is assumed anywhere."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )
    cos_t = np.array(_COS_X1E6, dtype=np.int64)
    sin_t = np.array(_SIN_X1E6, dtype=np.int64)

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"]))
        )
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        hod = ((ts_us // _HOUR_US) % 24).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "c": pa.array(cos_t[hod]),
                "s": pa.array(sin_t[hod]),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [([], "count_all"), ("c", "sum"), ("s", "sum")]
        )
        g = g.select(["event_type", "count_all", "c_sum", "s_sum"])
        return g.rename_columns(
            ["event_type", "n", "sum_cos_x1e6", "sum_sin_x1e6"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("sum_cos_x1e6", "sum"),
             ("sum_sin_x1e6", "sum")]
        )
        return g.rename_columns(
            ["event_type", "n", "sum_cos_x1e6", "sum_sin_x1e6"]
        )

    return tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


_trig_values = ", ".join(
    f"({h}, {c}, {s})"
    for h, (c, s) in enumerate(zip(_COS_X1E6, _SIN_X1E6))
)
CIRCULAR_SQL = f"""
WITH trig(hod, c, s) AS (VALUES {_trig_values}),
v AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
)
SELECT v.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(t.c) AS BIGINT) AS sum_cos_x1e6,
       CAST(SUM(t.s) AS BIGINT) AS sum_sin_x1e6
FROM v JOIN trig t ON t.hod = v.hod
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# churned users by their last-touch event type
# ---------------------------------------------------------------------------

_CHURN_DAYS = 1  # the synthetic users are dense: last-event ages top out ~2d


def q_churned_users_by_last_type(sf_dir):
    """Users whose LAST event is more than `_CHURN_DAYS` days before the
    corpus's latest timestamp, counted by the type of that last event —
    'what were churned users doing last'. The corpus max ts is one
    distributed aggregate; last-touch per user is the same one-shuffle
    (ts, event_id)-argmax as latest_event_per_user; the churn cut and
    the per-type count run over bounded tables."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    max_ts = ev.max("ts")
    max_us = int(pd.Timestamp(max_ts).value // 1000)
    cutoff = max_us - _CHURN_DAYS * _DAY_US

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["user_id"]), pc.is_valid(b["ts"])
                ),
                pc.is_valid(b["event_type"]),
            )
        )
        return add_bucket(b, "user_id", 64)

    proj = ev.map_batches(project, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "last_type": pd.Series([], dtype=object),
                "n_churned": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort",
            ignore_index=True,
        )
        last = g.groupby("user_id", sort=False).last()
        ts_us = (
            last["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        )
        churned = last[ts_us < cutoff]
        if not len(churned):
            return empty
        agg = churned.groupby("event_type", sort=False).size()
        return pd.DataFrame(
            {
                "last_type": agg.index.to_numpy(),
                "n_churned": agg.to_numpy(dtype=np.int64),
            }
        )

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["last_type"]).aggregate([("n_churned", "sum")])
        return g.rename_columns(["last_type", "n_churned"])

    out = tree_merge(partials, combine).to_pandas()  # bounded: one/type
    # typed rebuild: an all-empty merge loses its block schema
    if "last_type" not in out.columns:
        out = pd.DataFrame({"last_type": [], "n_churned": []})
    return pa.table(
        {
            "last_type": pa.array(out["last_type"], pa.string()),
            "n_churned": pa.array(
                out["n_churned"].to_numpy(dtype=np.int64)
            ),
        }
    )


CHURN_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT user_id, ts, event_id, event_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
), mx AS (
  SELECT MAX(ts) AS m FROM e
), last AS (
  SELECT user_id, ts, event_type
  FROM e
  QUALIFY ROW_NUMBER()
    OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
)
SELECT l.event_type AS last_type,
       CAST(COUNT(*) AS BIGINT) AS n_churned
FROM last l, mx
WHERE EPOCH_US(l.ts) < EPOCH_US(mx.m) - {_CHURN_DAYS} * 86400000000
GROUP BY 1
"""


def register_r4aj(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "max_concurrency_hourly": q_max_concurrency_hourly,
            "circular_mean_hour": q_circular_mean_hour,
            "churned_users_by_last_type": q_churned_users_by_last_type,
        }
    )
    oracles.update(
        {
            "max_concurrency_hourly": CONCURRENCY_SQL,
            "circular_mean_hour": CIRCULAR_SQL,
            "churned_users_by_last_type": CHURN_SQL,
        }
    )
