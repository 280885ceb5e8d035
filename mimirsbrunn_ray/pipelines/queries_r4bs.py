"""Round-4 batch BS: midnight-spanning sessions, stale value repeats,
and nation balance deciles.

Exactness discipline: session boundaries are the repo-wide 30-minute
strict-gap islands and day membership is integer arithmetic; stale
repeats compare exact cents with LAG; deciles are exact
PERCENTILE_DISC cents per nation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_GAP_US = 30 * 60_000_000
_DAY_US = 86_400_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# sessions spanning a UTC midnight
# ---------------------------------------------------------------------------


def q_midnight_spanning_sessions(sf_dir):
    """How many sessions CROSS a UTC day boundary vs stay inside one
    day — the edge-case census that decides whether daily rollups can
    treat sessions as day-local (every spanning session is counted in
    two daily partitions by naive day-grouping). Islands resolve inside
    one user hash-bucket shuffle; day membership is integer division of
    the island's first/last timestamps."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
    from mimirsbrunn_ray.stages.timeseries import _series_segments

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["ts"]))
        )
        return add_bucket(b, "user_id", 64)

    proj = ev.map_batches(project, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_sessions": pd.Series([], dtype=np.int64),
                "n_spanning": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "user_id", "ts", "event_id")
        ts_us = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        gap = np.empty(len(g), dtype=np.int64)
        gap[0] = np.iinfo(np.int64).max
        if len(g) > 1:
            gap[1:] = ts_us[1:] - ts_us[:-1]
        new_s = (~same) | (gap > _GAP_US)
        sid = np.cumsum(new_s)
        df = pd.DataFrame({"sid": sid, "day": ts_us // _DAY_US})
        agg = df.groupby("sid")["day"].agg(["min", "max"])
        n = len(agg)
        spanning = int((agg["max"] > agg["min"]).sum())
        return pd.DataFrame(
            {
                "n_sessions": pd.Series([n], dtype=np.int64),
                "n_spanning": pd.Series([spanning], dtype=np.int64),
            }
        )

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
                for c in b.column_names
            }
        )

    return tree_merge(partials, combine)


MIDNIGHT_SQL = """
WITH e AS MATERIALIZED (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id,
         SUM(new_s) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS sid,
         CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
  FROM e
), per_session AS (
  SELECT user_id, sid,
         CAST(MIN(day) AS BIGINT) AS d0, CAST(MAX(day) AS BIGINT) AS d1
  FROM s GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN d1 > d0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_spanning
FROM per_session
"""


# ---------------------------------------------------------------------------
# stale value repeats
# ---------------------------------------------------------------------------


def q_stale_value_repeats(sf_dir):
    """Per event type: events whose cents value EXACTLY equals the same
    user's previous event value (any gap) — the stale-read audit (a
    sensor or cache replaying its last reading). One user hash-bucket
    shuffle; vectorized LAG equality."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET
    from mimirsbrunn_ray.stages.timeseries import (
        _project_series,
        _series_segments,
    )

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type", "value"],
    )
    # project keeps value via a custom projection pass
    from mimirsbrunn_ray.stages.dedup import add_bucket

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["user_id"]), pc.is_valid(b["ts"])
                ),
                pc.and_(
                    pc.is_valid(b["event_type"]), pc.is_valid(b["value"])
                ),
            )
        )
        return add_bucket(b, "user_id", 64)

    proj = ev.map_batches(project, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_events": pd.Series([], dtype=np.int64),
                "n_stale": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort",
            ignore_index=True,
        )
        x = _round_half_away(
            g["value"].to_numpy(dtype=np.float64) * 100.0
        )
        uid = g["user_id"].to_numpy()
        same_user = np.zeros(len(g), dtype=bool)
        if len(g) > 1:
            same_user[1:] = uid[1:] == uid[:-1]
        stale = np.zeros(len(g), dtype=bool)
        if len(g) > 1:
            stale[1:] = same_user[1:] & (x[1:] == x[:-1])
        df = pd.DataFrame(
            {
                "event_type": g["event_type"],
                "stale": stale.astype(np.int64),
            }
        )
        agg = df.groupby("event_type", sort=False).agg(
            n_events=("stale", "size"), n_stale=("stale", "sum")
        ).reset_index()
        agg["n_events"] = agg["n_events"].astype(np.int64)
        agg["n_stale"] = agg["n_stale"].astype(np.int64)
        return agg

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n_events", "sum"), ("n_stale", "sum")]
        )
        return g.rename_columns(["event_type", "n_events", "n_stale"])

    return tree_merge(partials, combine)


STALE_SQL = """
WITH s AS (
  SELECT event_type,
         CASE WHEN CAST(ROUND(value * 100, 0) AS BIGINT)
                   = CAST(ROUND(LAG(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       * 100, 0) AS BIGINT)
              THEN 1 ELSE 0 END AS stale
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL AND value IS NOT NULL
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(stale) AS BIGINT) AS n_stale
FROM s GROUP BY 1
"""


# ---------------------------------------------------------------------------
# account-balance deciles per nation
# ---------------------------------------------------------------------------


def q_nation_balance_deciles(sf_dir):
    """Per nation: the exact decile cents values of customer account
    balances — the geographic distribution-shift table (one nation's
    whole curve shifting flags systematic billing or currency issues).
    One bounded (nation, cents) histogram; the per-nation walk applies
    the PERCENTILE_DISC rank rule; the nation name attaches from the
    tiny dimension."""
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.is_valid(b["c_nationkey"]), pc.is_valid(b["c_acctbal"])
            )
        )
        x = _round_half_away(
            b["c_acctbal"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        t = pa.table(
            {
                "nk": b["c_nationkey"].cast(pa.int64()),
                "v": pa.array(x),
            }
        )
        g = t.group_by(["nk", "v"]).aggregate([([], "count_all")])
        g = g.select(["nk", "v", "count_all"])
        return g.rename_columns(["nk", "v", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["nk", "v"]).aggregate([("n", "sum")])
        return g.rename_columns(["nk", "v", "n"])

    hist = tree_merge(
        cust.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()

    name_of = dict(
        zip(
            nation["n_nationkey"].to_numpy(zero_copy_only=False),
            nation["n_name"].to_numpy(zero_copy_only=False),
        )
    )
    rows = {"n_name": [], "decile": [], "bal_at_decile_x100": []}
    if len(hist):
        for nk, g in hist.groupby("nk", sort=True):
            g = g.sort_values("v")
            v = g["v"].to_numpy(dtype=np.int64)
            cum = np.cumsum(g["n"].to_numpy(dtype=np.int64))
            total = int(cum[-1])
            for d in range(1, 10):
                rank = int(np.ceil(d / 10 * total - 1e-9))
                rows["n_name"].append(str(name_of.get(int(nk), "")))
                rows["decile"].append(d)
                rows["bal_at_decile_x100"].append(
                    int(v[np.searchsorted(cum, rank, "left")])
                )
    return pa.table(
        {
            "n_name": pa.array(rows["n_name"], pa.string()),
            "decile": pa.array(rows["decile"], pa.int64()),
            "bal_at_decile_x100": pa.array(
                rows["bal_at_decile_x100"], pa.int64()
            ),
        }
    )


NATION_DECILES_SQL = """
WITH v AS MATERIALIZED (
  SELECT c_nationkey, CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS x
  FROM customer
  WHERE c_nationkey IS NOT NULL AND c_acctbal IS NOT NULL
), q AS (
  SELECT c_nationkey,
         quantile_disc(x, [0.1, 0.2, 0.3, 0.4, 0.5,
                           0.6, 0.7, 0.8, 0.9]) AS qs
  FROM v GROUP BY 1
)
SELECT n.n_name, CAST(d.d AS BIGINT) AS decile,
       CAST(q.qs[d.d] AS BIGINT) AS bal_at_decile_x100
FROM q
JOIN nation n ON n.n_nationkey = q.c_nationkey,
     (SELECT unnest(generate_series(1, 9)) AS d) d
"""


def register_r4bs(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "midnight_spanning_sessions": q_midnight_spanning_sessions,
            "stale_value_repeats": q_stale_value_repeats,
            "nation_balance_deciles": q_nation_balance_deciles,
        }
    )
    oracles.update(
        {
            "midnight_spanning_sessions": MIDNIGHT_SQL,
            "stale_value_repeats": STALE_SQL,
            "nation_balance_deciles": NATION_DECILES_SQL,
        }
    )
