"""Round-4 batch BQ: regression-toward-the-mean correlation,
transition asymmetry, and the top-1% event value share.

Exactness discipline: panel correlation ships exact per-user count
co-moments with one identical double ratio; asymmetry rows are exact
directed-transition counts; the tail share is an exact descending
histogram walk with integer tie-group splitting.
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
# regression toward the mean: first-half vs second-half user activity
# ---------------------------------------------------------------------------


def q_user_rtm_correlation(sf_dir):
    """The panel correlation between each user's FIRST-half and
    SECOND-half event counts (split at the exact midpoint day) — low
    correlation means one-period leaderboards regress hard toward the
    mean and shouldn't drive decisions. Per-user count pairs from one
    hash-bucket shuffle; exact integer co-moments; one identical double
    ratio x1e6."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    mn_day = int(
        pd.Timestamp(ev.min("ts")).value // 1000 // _DAY_US
    )
    mx_day = int(
        pd.Timestamp(ev.max("ts")).value // 1000 // _DAY_US
    )
    mid = (mn_day + mx_day) // 2  # first half: day <= mid

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["ts"]))
        )
        day = (
            b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // _DAY_US
        )
        t = pa.table(
            {
                "user_id": b["user_id"],
                "first": pa.array((day <= mid).astype(np.int64)),
            }
        )
        return add_bucket(t, "user_id", 64)

    proj = ev.map_batches(project, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n": pd.Series([], dtype=np.int64),
                "sx": pd.Series([], dtype=np.int64),
                "sy": pd.Series([], dtype=np.int64),
                "sxx": pd.Series([], dtype=np.int64),
                "syy": pd.Series([], dtype=np.int64),
                "sxy": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        agg = g.groupby("user_id")["first"].agg(["sum", "size"])
        x = agg["sum"].to_numpy(dtype=np.int64)
        y = (agg["size"] - agg["sum"]).to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "n": pd.Series([len(x)], dtype=np.int64),
                "sx": pd.Series([int(x.sum())], dtype=np.int64),
                "sy": pd.Series([int(y.sum())], dtype=np.int64),
                "sxx": pd.Series([int(np.dot(x, x))], dtype=np.int64),
                "syy": pd.Series([int(np.dot(y, y))], dtype=np.int64),
                "sxy": pd.Series([int(np.dot(x, y))], dtype=np.int64),
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

    from mimirsbrunn_ray.stages.broadcast import scalar0

    m = tree_merge(partials, combine).to_pandas()
    n = int(scalar0(m, "n"))
    sx = int(scalar0(m, "sx"))
    sy = int(scalar0(m, "sy"))
    sxx = int(scalar0(m, "sxx"))
    syy = int(scalar0(m, "syy"))
    sxy = int(scalar0(m, "sxy"))
    num = n * sxy - sx * sy
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    if d1 > 0 and d2 > 0:
        r = float(num) / (
            np.sqrt(np.float64(d1)) * np.sqrt(np.float64(d2))
        )
        rx = int(_round_half_away(np.array([r * 1e6]))[0])
    else:
        rx = None
    return pa.table(
        {
            "n_users": pa.array([n], pa.int64()),
            "corr_x1e6": pa.array([rx], pa.int64()),
        }
    )


RTM_SQL = """
WITH span AS (
  SELECT (CAST(FLOOR(epoch(MIN(ts)) / 86400) AS BIGINT)
          + CAST(FLOOR(epoch(MAX(ts)) / 86400) AS BIGINT)) // 2 AS mid
  FROM events WHERE ts IS NOT NULL
), u AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN FLOOR(epoch(ts) / 86400) <= span.mid
                       THEN 1 ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN FLOOR(epoch(ts) / 86400) > span.mid
                       THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM events CROSS JOIN span
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM u
)
SELECT n AS n_users,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(ROUND(
              CAST(n * sxy - sx * sy AS DOUBLE)
              / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                 * SQRT(CAST(n * syy - sy * sy AS DOUBLE)))
              * 1000000, 0) AS BIGINT)
            ELSE NULL END AS corr_x1e6
FROM s
"""


# ---------------------------------------------------------------------------
# transition asymmetry: detailed-balance audit of the type chain
# ---------------------------------------------------------------------------


def q_transition_asymmetry(sf_dir):
    """For every unordered type pair: the directed transition counts
    n(a->b) and n(b->a) — the detailed-balance audit (symmetric counts
    mean reversible wandering; a one-way excess is a FLOW, e.g. view
    feeds purchase but never back). Same one-shuffle series pass as
    the Markov matrix; the pairing fold runs over the bounded
    matrix."""
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
                "f": pd.Series([], dtype=object),
                "t": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "user_id", "ts", "event_id")
        tt = g["event_type"].to_numpy()
        idx = np.nonzero(same)[0]
        if len(idx) == 0:
            return empty
        df = pd.DataFrame({"f": tt[idx - 1], "t": tt[idx]})
        agg = df.groupby(["f", "t"], sort=False, as_index=False).size()
        agg = agg.rename(columns={"size": "n"})
        agg["n"] = agg["n"].astype(np.int64)
        return agg

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["f", "t"]).aggregate([("n", "sum")])
        return g.rename_columns(["f", "t", "n"])

    m = tree_merge(partials, combine).to_pandas()

    rows = {"type_a": [], "type_b": [], "n_ab": [], "n_ba": []}
    if len(m):
        cnt = {(r["f"], r["t"]): int(r["n"]) for _, r in m.iterrows()}
        types = sorted(set(m["f"]) | set(m["t"]))
        for i, ta in enumerate(types):
            for tb in types[i + 1:]:
                ab = cnt.get((ta, tb), 0)
                ba = cnt.get((tb, ta), 0)
                if ab or ba:
                    rows["type_a"].append(ta)
                    rows["type_b"].append(tb)
                    rows["n_ab"].append(ab)
                    rows["n_ba"].append(ba)
    return pa.table(
        {
            "type_a": pa.array(rows["type_a"], pa.string()),
            "type_b": pa.array(rows["type_b"], pa.string()),
            "n_ab": pa.array(rows["n_ab"], pa.int64()),
            "n_ba": pa.array(rows["n_ba"], pa.int64()),
        }
    )


ASYMMETRY_SQL = """
WITH s AS MATERIALIZED (
  SELECT event_type AS f,
         LEAD(event_type)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
), c AS (
  SELECT f, t, CAST(COUNT(*) AS BIGINT) AS n
  FROM s WHERE t IS NOT NULL GROUP BY 1, 2
), pairs AS (
  SELECT LEAST(f, t) AS type_a, GREATEST(f, t) AS type_b,
         CAST(SUM(CASE WHEN f < t THEN n ELSE 0 END) AS BIGINT)
           AS n_ab,
         CAST(SUM(CASE WHEN f > t THEN n ELSE 0 END) AS BIGINT)
           AS n_ba
  FROM c WHERE f <> t
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_ab, n_ba
FROM pairs WHERE n_ab > 0 OR n_ba > 0
"""


# ---------------------------------------------------------------------------
# value share of the top 1% of events
# ---------------------------------------------------------------------------


def q_value_top1pct_share(sf_dir):
    """How much of total event value the TOP 1% of events carry — the
    event-grain tail-concentration twin of the user-grain Pareto
    point: k = ceil(n/100) largest cents values (ties split exactly by
    count in the descending histogram walk), their exact sum, and the
    grand total. One bounded histogram pass."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["value"]))
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        t = pa.table({"v": pa.array(x)})
        g = t.group_by(["v"]).aggregate([([], "count_all")])
        g = g.select(["v", "count_all"])
        return g.rename_columns(["v", "c"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["v"]).aggregate([("c", "sum")])
        return g.rename_columns(["v", "c"])

    hist = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()

    if not len(hist):
        return pa.table(
            {
                "n_events": pa.array([0], pa.int64()),
                "k_top": pa.array([0], pa.int64()),
                "top_sum_x100": pa.array([0], pa.int64()),
                "total_x100": pa.array([0], pa.int64()),
            }
        )
    hist = hist.sort_values("v", ascending=False)
    v = hist["v"].to_numpy(dtype=np.int64)
    c = hist["c"].to_numpy(dtype=np.int64)
    n = int(c.sum())
    total = int(np.dot(v, c))
    k = (n + 99) // 100  # ceil(n / 100)
    remaining = k
    top_sum = 0
    for vi, ci in zip(v, c):
        take = min(int(ci), remaining)
        top_sum += take * int(vi)
        remaining -= take
        if remaining == 0:
            break
    return pa.table(
        {
            "n_events": pa.array([n], pa.int64()),
            "k_top": pa.array([k], pa.int64()),
            "top_sum_x100": pa.array([top_sum], pa.int64()),
            "total_x100": pa.array([total], pa.int64()),
        }
    )


TOP1PCT_SQL = """
WITH v AS MATERIALIZED (
  SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL
), r AS (
  SELECT x,
         CAST(ROW_NUMBER() OVER (ORDER BY x DESC) AS BIGINT) AS rk,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(SUM(x) OVER () AS BIGINT) AS total
  FROM v
)
SELECT MAX(n) AS n_events,
       (MAX(n) + 99) // 100 AS k_top,
       CAST(SUM(CASE WHEN rk <= (n + 99) // 100 THEN x ELSE 0 END)
            AS BIGINT) AS top_sum_x100,
       MAX(total) AS total_x100
FROM r
"""


def register_r4bq(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "user_rtm_correlation": q_user_rtm_correlation,
            "transition_asymmetry": q_transition_asymmetry,
            "value_top1pct_share": q_value_top1pct_share,
        }
    )
    oracles.update(
        {
            "user_rtm_correlation": RTM_SQL,
            "transition_asymmetry": ASYMMETRY_SQL,
            "value_top1pct_share": TOP1PCT_SQL,
        }
    )
