"""Round-4 batch BV: cold purchases, full-coverage users, and
synchronized minutes.

Exactness discipline: first-event attribution uses the composite
(ts, event_id) argmin; coverage compares exact distinct-type counts;
synchronization thresholds exact distinct-user counts per minute.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_MIN_US = 60_000_000


# ---------------------------------------------------------------------------
# cold purchases: purchases that are the user's FIRST event
# ---------------------------------------------------------------------------


def q_cold_purchases(sf_dir):
    """Purchases that are the user's very FIRST event (composite
    (ts, event_id) order) vs warmed-up purchases — the cold-start
    conversion count an attribution model must not credit to any
    touchpoint. One user hash-bucket shuffle; per-series head checks."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET
    from mimirsbrunn_ray.stages.timeseries import (
        _project_series,
        _series_segments,
    )

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    proj = _project_series(ev, "user_id", "ts", "event_id", "event_type", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_purchases": pd.Series([], dtype=np.int64),
                "n_cold": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "user_id", "ts", "event_id")
        et = g["event_type"].to_numpy()
        is_first = ~same  # first row of each user series
        isp = et == "purchase"
        return pd.DataFrame(
            {
                "n_purchases": pd.Series([int(isp.sum())],
                                         dtype=np.int64),
                "n_cold": pd.Series(
                    [int((isp & is_first).sum())], dtype=np.int64
                ),
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


COLD_SQL = """
WITH r AS (
  SELECT event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rk
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
)
SELECT CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchases,
       CAST(SUM(CASE WHEN event_type = 'purchase' AND rk = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_cold
FROM r
"""


# ---------------------------------------------------------------------------
# full-coverage users: active in EVERY observed event type
# ---------------------------------------------------------------------------


def q_full_coverage_users(sf_dir):
    """How many users touched EVERY observed event type — the
    full-funnel population (the INTERSECT of all per-type audiences,
    generalized past the two-type users_click_and_purchase). The
    global type census is one bounded aggregate; per-user distinct-type
    counts resolve in one hash-bucket shuffle."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    n_types = len(
        [t for t in (ev.unique("event_type") or []) if t is not None]
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["event_type"]))
        )
        g = b.group_by(["user_id", "event_type"]).aggregate(
            [([], "count_all")]
        )
        g = g.select(["user_id", "event_type"])
        return add_bucket(g, "user_id", 64)

    proj = ev.map_batches(project, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_users": pd.Series([], dtype=np.int64),
                "n_full_coverage": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.drop_duplicates(["user_id", "event_type"])
        per = g.groupby("user_id").size()
        return pd.DataFrame(
            {
                "n_users": pd.Series([len(per)], dtype=np.int64),
                "n_full_coverage": pd.Series(
                    [int((per == n_types).sum())], dtype=np.int64
                ),
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


FULL_COVERAGE_SQL = """
WITH t AS (
  SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
  FROM events WHERE event_type IS NOT NULL
), u AS (
  SELECT user_id,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nt
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN u.nt = t.n_types THEN 1 ELSE 0 END)
            AS BIGINT) AS n_full_coverage
FROM u CROSS JOIN t
"""


# ---------------------------------------------------------------------------
# synchronized minutes: many distinct users in one minute
# ---------------------------------------------------------------------------

_SYNC_MIN_USERS = 10


def q_synchronized_minutes(sf_dir):
    """Minutes where at least `_SYNC_MIN_USERS` DISTINCT users acted —
    the flash-crowd / coordinated-traffic detector (organic traffic
    spreads users across minutes; campaigns and bots synchronize).
    Distinct (minute, user) pairs from combiner partials sharded by
    minute; the threshold fold runs on the bounded per-minute counts."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["ts"]))
        )
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        t = pa.table(
            {
                "mn": pa.array(np.floor_divide(ts_us, _MIN_US)),
                "user_id": b["user_id"],
            }
        )
        g = t.group_by(["mn", "user_id"]).aggregate([([], "count_all")])
        return g.select(["mn", "user_id"])

    def dedup(b: pa.Table) -> pa.Table:
        g = b.group_by(["mn", "user_id"]).aggregate([([], "count_all")])
        return g.select(["mn", "user_id"])

    pairs = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        dedup,
        final_shards=8,
        shard_cols=["mn"],  # a minute's users stay in one shard
    )

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "mn" not in b.column_names:
            return pa.table(
                {
                    "n_minutes": pa.array([0], pa.int64()),
                    "n_synchronized": pa.array([0], pa.int64()),
                }
            )
        g = b.group_by(["mn"]).aggregate([([], "count_all")])
        g = g.select(["mn", "count_all"])
        n = g["count_all"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_minutes": pa.array([len(n)], pa.int64()),
                "n_synchronized": pa.array(
                    [int((n >= _SYNC_MIN_USERS).sum())], pa.int64()
                ),
            }
        )

    def fold_combine(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
                for c in b.column_names
            }
        )

    return tree_merge(
        pairs.map_batches(fold, batch_format="pyarrow", batch_size=None),
        fold_combine,
    )


SYNC_SQL = f"""
WITH p AS (
  SELECT DISTINCT CAST(FLOOR(epoch(ts) / 60) AS BIGINT) AS mn, user_id
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), m AS (
  SELECT mn, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM p GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_minutes,
       CAST(SUM(CASE WHEN n_users >= {_SYNC_MIN_USERS}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_synchronized
FROM m
"""


def register_r4bv(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "cold_purchases": q_cold_purchases,
            "full_coverage_users": q_full_coverage_users,
            "synchronized_minutes": q_synchronized_minutes,
        }
    )
    oracles.update(
        {
            "cold_purchases": COLD_SQL,
            "full_coverage_users": FULL_COVERAGE_SQL,
            "synchronized_minutes": SYNC_SQL,
        }
    )
