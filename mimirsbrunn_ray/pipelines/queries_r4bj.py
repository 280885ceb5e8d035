"""Round-4 batch BJ: longest dependency paths, exact fourth moments,
and weekpart-exclusive user segmentation.

Exactness discipline: longest-path depths are integer DP over the
dimension-scale edge map; moments are dollar-quantized so x^4 sums fit
int64 at test scale (documented bound); the weekend/weekday partition
is exact set logic per user.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# longest dependency path per depth (DAG longest path)
# ---------------------------------------------------------------------------


def q_part_dep_longest_path(sf_dir):
    """Longest-path depth of every part to the root over the k -> k//2,
    k -> k//3 dependency DAG (dist[k] = 1 + MAX of parents — the
    critical-path complement of part_dep_hops' min-hop BFS), reported
    as the bounded depth histogram. The edge map is dimension-scale, so
    one vectorized key-order DP builds the table; matching a
    recursive-CTE MAX oracle."""
    part = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    _mx_raw = part.max("p_partkey")
    mx = int(_mx_raw) if _mx_raw is not None else 0
    dist = np.full(mx + 1, -1, dtype=np.int64)
    if mx >= 1:
        dist[1] = 0
        for k in range(2, mx + 1):
            best = dist[k // 2]
            if k >= 3 and dist[k // 3] > best:
                best = dist[k // 3]
            dist[k] = best + 1 if best >= 0 else -1
    import ray

    ref = ray.put(dist)

    def attach(b: pa.Table) -> pa.Table:
        d = ray.get(ref)
        keys = b["p_partkey"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ok = (keys >= 1) & (keys <= mx)
        depth = d[keys[ok]]
        keep = depth >= 0
        t = pa.table({"depth": pa.array(depth[keep])})
        g = t.group_by(["depth"]).aggregate([([], "count_all")])
        g = g.select(["depth", "count_all"])
        return g.rename_columns(["depth", "n_parts"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["depth"]).aggregate([("n_parts", "sum")])
        return g.rename_columns(["depth", "n_parts"])

    return tree_merge(
        part.map_batches(attach, batch_format="pyarrow", batch_size=None),
        combine,
    )


LONGEST_PATH_SQL = """
WITH RECURSIVE edges AS (
  SELECT p_partkey AS src, p_partkey // 2 AS dst
  FROM part WHERE p_partkey >= 2
  UNION ALL
  SELECT p_partkey, p_partkey // 3 FROM part WHERE p_partkey >= 3
),
walk(node, d) AS (
  SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT e.src, w.d + 1 FROM walk w JOIN edges e ON e.dst = w.node
), longest AS (
  SELECT node, CAST(MAX(d) AS BIGINT) AS depth
  FROM walk
  WHERE node IN (SELECT p_partkey FROM part)
  GROUP BY node
)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM longest GROUP BY 1
"""


# ---------------------------------------------------------------------------
# exact raw moments (to the 4th) of dollar-quantized value, per type
# ---------------------------------------------------------------------------


def q_value_moment4_dollars(sf_dir):
    """Per event type: the exact raw moment sums s1..s4 of the
    DOLLAR-quantized value (round(value)) — skewness and kurtosis are
    closed forms over the emitted integers. Dollar grain keeps x^4
    sums inside int64 at bench scales (|x| <= ~330 -> x^4 <= 1.2e10;
    at larger corpora switch to the (mean-shifted, per-shard
    HUGEINT-style) two-pass form). One decomposable pass."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["value"]))
        )
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "s1": pa.array(x),
                "s2": pa.array(x * x),
                "s3": pa.array(x * x * x),
                "s4": pa.array(x * x * x * x),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [([], "count_all"), ("s1", "sum"), ("s2", "sum"),
             ("s3", "sum"), ("s4", "sum")]
        )
        g = g.select(
            ["event_type", "count_all", "s1_sum", "s2_sum", "s3_sum",
             "s4_sum"]
        )
        return g.rename_columns(
            ["event_type", "n", "s1", "s2", "s3", "s4"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("s1", "sum"), ("s2", "sum"),
             ("s3", "sum"), ("s4", "sum")]
        )
        return g.rename_columns(
            ["event_type", "n", "s1", "s2", "s3", "s4"]
        )

    return tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


MOMENT4_SQL = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(x) AS BIGINT) AS s1,
       CAST(SUM(x * x) AS BIGINT) AS s2,
       CAST(SUM(x * x * x) AS BIGINT) AS s3,
       CAST(SUM(x * x * x * x) AS BIGINT) AS s4
FROM v GROUP BY 1
"""


# ---------------------------------------------------------------------------
# weekpart-exclusive user segmentation
# ---------------------------------------------------------------------------


def q_weekpart_exclusive_users(sf_dir):
    """Users partitioned by WHEN they show up: weekday-only,
    weekend-only, or both — the schedule-affinity segmentation (a
    weekend-only audience wants different send times). Exact per-user
    set logic from one hash-bucket shuffle."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["ts"]))
        )
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        dow = (np.floor_divide(ts_us, _DAY_US) + 4) % 7
        we = ((dow == 0) | (dow == 6)).astype(np.int64)
        t = pa.table({"user_id": b["user_id"], "we": pa.array(we)})
        return add_bucket(t, "user_id", 64)

    proj = ev.map_batches(project, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_weekday_only": pd.Series([], dtype=np.int64),
                "n_weekend_only": pd.Series([], dtype=np.int64),
                "n_both": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        agg = g.groupby("user_id")["we"].agg(["min", "max"])
        wd_only = int(((agg["min"] == 0) & (agg["max"] == 0)).sum())
        we_only = int(((agg["min"] == 1) & (agg["max"] == 1)).sum())
        both = int(((agg["min"] == 0) & (agg["max"] == 1)).sum())
        return pd.DataFrame(
            {
                "n_weekday_only": pd.Series([wd_only], dtype=np.int64),
                "n_weekend_only": pd.Series([we_only], dtype=np.int64),
                "n_both": pd.Series([both], dtype=np.int64),
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


EXCLUSIVE_SQL = """
WITH u AS (
  SELECT user_id,
         MIN(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END)
           AS mn,
         MAX(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END)
           AS mx
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
)
SELECT CAST(SUM(CASE WHEN mn = 0 AND mx = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_weekday_only,
       CAST(SUM(CASE WHEN mn = 1 AND mx = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_weekend_only,
       CAST(SUM(CASE WHEN mn = 0 AND mx = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_both
FROM u
"""


def register_r4bj(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "part_dep_longest_path": q_part_dep_longest_path,
            "value_moment4_dollars": q_value_moment4_dollars,
            "weekpart_exclusive_users": q_weekpart_exclusive_users,
        }
    )
    oracles.update(
        {
            "part_dep_longest_path": LONGEST_PATH_SQL,
            "value_moment4_dollars": MOMENT4_SQL,
            "weekpart_exclusive_users": EXCLUSIVE_SQL,
        }
    )
