"""Round-4 batch DH: nearest (bidirectional) as-of join, the TSDB chunk
compaction planner, and sessionization timeout sensitivity.

Engine-shape operators: NEAREST-asof resolves each probe's backward AND
forward candidate in one user-bucket pass (two searchsorted probes over
one sorted run) and picks the closer — the join flavor PromQL's
lookback cannot express;
the chunk planner turns per-day counts into exact chunk/fill
arithmetic; the timeout sweep computes session counts for three gap
thresholds from ONE ordered pass. Exactness: pure int64 timestamps,
counts and gaps; the only doubles are final fill/sensitivity ratios,
x1e6 snap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge
from mimirsbrunn_ray.stages.timeseries import _series_segments

_DAY_US = 86_400_000_000
_CHUNK_POINTS = 8192
_TIMEOUTS_MIN = (15, 30, 60)


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
# nearest as-of: each click's closest error by the same user
# ---------------------------------------------------------------------------


def q_asof_nearest_error_user(sf_dir):
    """For every click: the SIGNED microsecond offset to the user's
    NEAREST error event in either time direction (ties prefer the
    earlier/backward candidate) — the bidirectional as-of flavor that a
    lookback-only join cannot express. ONE user-key hash shuffle: each
    bucket sorts its errors once and resolves every click's backward AND
    forward candidate with two vectorized searchsorted probes (the
    point-in-window bucket shape, amortizing what two chained as-of
    joins would each pay). All comparisons are exact int64 microseconds;
    clicks with no error either side drop (inner semantics)."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    )

    def prep(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_id", "user_id", "event_type", "ts"))
        b = b.filter(
            pc.is_in(b["event_type"], value_set=pa.array(["click", "error"]))
        )
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        t = pa.table(
            {
                "event_id": b["event_id"].cast(pa.int64()),
                "user_id": b["user_id"].cast(pa.int64()),
                "t_us": pa.array(us),
                "is_click": pa.array(
                    pc.equal(b["event_type"], "click")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int8)
                ),
            }
        )
        return add_bucket(t, "user_id", 64)

    bucketed = ev.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_id": pd.Series([], dtype=np.int64),
                "dt_us": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        is_click = g["is_click"].to_numpy() == 1
        err = g[~is_click].sort_values(
            ["user_id", "t_us"], kind="mergesort", ignore_index=True
        )
        clk = g[is_click]
        if not len(err) or not len(clk):
            return empty
        # composite (user, rebased-ts) keys keep the probe inside one
        # user run; rebasing bounds the multiplier by the bucket's span
        c_user = clk["user_id"].to_numpy(dtype=np.int64)
        c_ts = clk["t_us"].to_numpy(dtype=np.int64)
        all_ts = g["t_us"].to_numpy(dtype=np.int64)
        base = int(all_ts.min())
        span = int(all_ts.max()) - base + 1
        u_max = int(g["user_id"].max())
        if u_max * span >= (1 << 62):  # chunk-by-user fallback bound
            raise RuntimeError(
                "asof_nearest: composite key overflow; shard the bucket"
            )
        mult = np.int64(span)
        e_key = err["user_id"].to_numpy(dtype=np.int64) * mult + (
            err["t_us"].to_numpy(dtype=np.int64) - base
        )
        c_key = c_user * mult + (c_ts - base)
        pos = np.searchsorted(e_key, c_key, side="right")
        e_user = err["user_id"].to_numpy(dtype=np.int64)
        e_ts = err["t_us"].to_numpy(dtype=np.int64)
        big = np.int64(1) << 62
        prev_ok = (pos > 0) & (e_user[np.maximum(pos - 1, 0)] == c_user)
        d_prev = np.where(
            prev_ok, c_ts - e_ts[np.maximum(pos - 1, 0)], big
        )
        next_ok = (pos < len(err)) & (
            e_user[np.minimum(pos, len(err) - 1)] == c_user
        )
        d_next = np.where(
            next_ok, e_ts[np.minimum(pos, len(err) - 1)] - c_ts, big
        )
        keep = prev_ok | next_ok
        use_prev = d_prev <= d_next  # tie -> backward
        dt = np.where(use_prev, -d_prev, d_next)
        return pd.DataFrame(
            {
                "event_id": clk["event_id"].to_numpy(dtype=np.int64)[keep],
                "dt_us": dt[keep],
            }
        )

    return bucketed.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )


ASOF_NEAREST_SQL = """
WITH u AS MATERIALIZED (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
  FROM events
  WHERE event_type IN ('click', 'error')
    AND event_id IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL
), flow AS (
  SELECT user_id, ts, event_id, is_click,
         MAX(CASE WHEN is_click = 0 THEN EPOCH_US(ts) END)
           OVER (PARTITION BY user_id ORDER BY ts, is_click, event_id
                 ROWS UNBOUNDED PRECEDING) AS prev_err,
         MIN(CASE WHEN is_click = 0 THEN EPOCH_US(ts) END)
           OVER (PARTITION BY user_id ORDER BY ts, is_click, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_err
  FROM u
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(CASE WHEN next_err IS NULL
                   OR (prev_err IS NOT NULL
                       AND EPOCH_US(ts) - prev_err <= next_err - EPOCH_US(ts))
                 THEN -(EPOCH_US(ts) - prev_err)
                 ELSE next_err - EPOCH_US(ts) END AS BIGINT) AS dt_us
FROM flow
WHERE is_click = 1 AND (prev_err IS NOT NULL OR next_err IS NOT NULL)
"""


# ---------------------------------------------------------------------------
# chunk compaction planner
# ---------------------------------------------------------------------------


def q_chunk_fill_ratios(sf_dir):
    """Per event type: the chunk plan a TSDB compactor would produce for
    (type, day) segments at 8192 points per chunk — total chunks =
    sum(ceil(day_count / 8192)), tail waste = chunk space unused by each
    day's last chunk, and the fill ratio points / (chunks * 8192) that
    decides whether day-segmentation is leaving too much space on the
    table. Day counts fold exact int64; chunk arithmetic is exact
    integer ceil-division; only the final fill ratio divides, x1e6
    snap."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        d = (us // _DAY_US).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "d": pa.array(d),
                "c": pa.array(np.ones(len(d), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "d"], ["c"])

    daily = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "d"], ["c"]),
    ).to_pandas()
    if not len(daily) or "event_type" not in daily.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_points": pa.array([], pa.int64()),
                "n_chunks": pa.array([], pa.int64()),
                "fill_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "n_points": [], "n_chunks": [], "fill_x1e6": []}
    for et, g in daily.sort_values(["event_type", "d"]).groupby(
        "event_type", sort=True
    ):
        c = g["c"].to_numpy(dtype=np.int64)
        points = int(c.sum())
        chunks = int(np.sum((c + _CHUNK_POINTS - 1) // _CHUNK_POINTS))
        out["event_type"].append(et)
        out["n_points"].append(points)
        out["n_chunks"].append(chunks)
        out["fill_x1e6"].append(
            None
            if chunks == 0
            else int(
                _round_half_away(
                    np.array(
                        [
                            float(points)
                            / (float(chunks) * _CHUNK_POINTS)
                            * 1e6
                        ]
                    )
                )[0]
            )
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_points": pa.array(out["n_points"], pa.int64()),
            "n_chunks": pa.array(out["n_chunks"], pa.int64()),
            "fill_x1e6": pa.array(out["fill_x1e6"], pa.int64()),
        }
    )


CHUNK_FILL_SQL = f"""
WITH daily AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 86400000000) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), a AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_points,
         CAST(SUM((c + {_CHUNK_POINTS} - 1) // {_CHUNK_POINTS}) AS BIGINT)
           AS n_chunks
  FROM daily GROUP BY 1
)
SELECT event_type, n_points, n_chunks,
       CASE WHEN n_chunks = 0 THEN NULL
            ELSE CAST(ROUND(CAST(n_points AS DOUBLE)
                   / (CAST(n_chunks AS DOUBLE) * {_CHUNK_POINTS})
                 * 1000000, 0) AS BIGINT) END AS fill_x1e6
FROM a ORDER BY 1
"""


# ---------------------------------------------------------------------------
# sessionization timeout sensitivity
# ---------------------------------------------------------------------------


def q_session_timeout_sensitivity(sf_dir):
    """For timeout thresholds 15 / 30 / 60 minutes: the total session
    count the sessionizer would produce (sessions = users + gaps above
    the threshold) — the parameter-sensitivity sweep run before
    committing a session definition (a steep count drop between two
    thresholds means the choice materially changes every downstream
    funnel metric). ONE ordered pass per user computes all gaps; the
    three threshold counts fold exact int64 from the same gap
    histogram-style partials; the ratio vs the 30-minute baseline is
    the only double, x1e6 snap."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])

    def prep(b: pa.Table) -> pa.Table:
        b = _clean(b, ("user_id", "ts"))
        t = pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "ts": b["ts"].cast(pa.timestamp("us")),
                "event_id": b["event_id"].cast(pa.int64()),
            }
        )
        return add_bucket(t, "user_id", 64)

    bucketed = ev.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_users": pd.Series([], dtype=np.int64),
                **{
                    f"gaps_{m}m": pd.Series([], dtype=np.int64)
                    for m in _TIMEOUTS_MIN
                },
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "user_id", "ts", "event_id")
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        dt = np.zeros(len(g), dtype=np.int64)
        dt[1:] = ts_us[1:] - ts_us[:-1]
        dt = np.where(same, dt, -1)  # series heads excluded
        row = {"n_users": [int((~same).sum())]}
        for m in _TIMEOUTS_MIN:
            row[f"gaps_{m}m"] = [int((dt > m * 60_000_000).sum())]
        return pd.DataFrame(row)

    parts = bucketed.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    ).to_pandas()
    if not len(parts) or "n_users" not in parts.columns:
        return pa.table(
            {
                "timeout_min": pa.array([], pa.int64()),
                "n_sessions": pa.array([], pa.int64()),
                "vs_30m_x1e6": pa.array([], pa.int64()),
            }
        )
    n_users = int(parts["n_users"].sum())
    counts = {
        m: n_users + int(parts[f"gaps_{m}m"].sum()) for m in _TIMEOUTS_MIN
    }
    base = counts[30]
    rows = {"timeout_min": [], "n_sessions": [], "vs_30m_x1e6": []}
    for m in _TIMEOUTS_MIN:
        rows["timeout_min"].append(m)
        rows["n_sessions"].append(counts[m])
        rows["vs_30m_x1e6"].append(
            None
            if base == 0
            else int(
                _round_half_away(
                    np.array([float(counts[m]) / base * 1e6])
                )[0]
            )
        )
    return pa.table(
        {
            "timeout_min": pa.array(rows["timeout_min"], pa.int64()),
            "n_sessions": pa.array(rows["n_sessions"], pa.int64()),
            "vs_30m_x1e6": pa.array(rows["vs_30m_x1e6"], pa.int64()),
        }
    )


SESSION_TIMEOUT_SQL = """
WITH g AS MATERIALIZED (
  SELECT user_id,
         EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS dt
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
), a AS MATERIALIZED (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         CAST(SUM(CASE WHEN dt > CAST(15 AS BIGINT) * 60000000 THEN 1 ELSE 0 END)
              AS BIGINT) AS g15,
         CAST(SUM(CASE WHEN dt > CAST(30 AS BIGINT) * 60000000 THEN 1 ELSE 0 END)
              AS BIGINT) AS g30,
         CAST(SUM(CASE WHEN dt > CAST(60 AS BIGINT) * 60000000 THEN 1 ELSE 0 END)
              AS BIGINT) AS g60
  FROM g
), rows_ AS (
  SELECT 15 AS timeout_min, n_users + g15 AS n_sessions,
         n_users + g30 AS base FROM a
  UNION ALL
  SELECT 30, n_users + g30, n_users + g30 FROM a
  UNION ALL
  SELECT 60, n_users + g60, n_users + g30 FROM a
)
SELECT CAST(timeout_min AS BIGINT) AS timeout_min,
       CAST(n_sessions AS BIGINT) AS n_sessions,
       CASE WHEN base = 0 THEN NULL
            ELSE CAST(ROUND(CAST(n_sessions AS DOUBLE) / base * 1000000, 0)
                 AS BIGINT) END AS vs_30m_x1e6
FROM rows_ ORDER BY 1
"""


def register_r4dh(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "asof_nearest_error_user": q_asof_nearest_error_user,
            "chunk_fill_ratios": q_chunk_fill_ratios,
            "session_timeout_sensitivity": q_session_timeout_sensitivity,
        }
    )
    oracles.update(
        {
            "asof_nearest_error_user": ASOF_NEAREST_SQL,
            "chunk_fill_ratios": CHUNK_FILL_SQL,
            "session_timeout_sensitivity": SESSION_TIMEOUT_SQL,
        }
    )
