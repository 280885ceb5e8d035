"""Round-4 batch EN: V-shape reversal pattern counts (the
MATCH_RECOGNIZE shape), SCD2-style point-in-time state snapshots
reconstructed from the props event stream, and Mood's squared-rank
scale test for weekday vs weekend value dispersion.

Exactness discipline: V-shape counting and depth are pure integer
comparisons over LAG/LEAD chains; the snapshot counts are exact
integers by construction (per-user last-write-wins then LOCF over the
bounded day grid — the engine expands spans with one np.repeat, never
a per-day Python loop); Mood's T statistic uses doubled midranks
(2R = 2*#less + #eq + 1, integral under ties) folded from the bounded
value histogram so T4 = sum (2R - N - 1)^2 is an exact int64, with
only the classical z approximation snapped."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.functions.jsonx import extract_int_key
from mimirsbrunn_ray.pipelines.queries_r4eh import (
    _DENSE_GRID_SQL,
    _dense_hourly_matrix,
)
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# V-shape reversals on the dense hourly series
# ---------------------------------------------------------------------------


def q_v_shape_reversals(sf_dir):
    """Per event type: strict depth-2 V-shape reversals in the dense
    hourly count series — hours h with c[h-2] > c[h-1] > c[h] <
    c[h+1] < c[h+2] (a sharp dip with two-sided strict recovery, the
    MATCH_RECOGNIZE pattern shape). Emits the count and the deepest
    V's depth min(c[h-2]-c[h], c[h+2]-c[h]) — all exact integer
    comparisons over LAG/LEAD chains."""
    types, mat, _hmin = _dense_hourly_matrix(sf_dir)
    cols = ["event_type", "n_v_shapes", "max_depth"]
    out = {c: [] for c in cols}
    if mat is not None:
        n = mat.shape[1]
        for i, t in enumerate(types):
            y = mat[i]
            if n < 5:
                continue
            c0 = y[2:-2]
            l1, l2 = y[1:-3], y[:-4]
            r1, r2 = y[3:-1], y[4:]
            is_v = (l2 > l1) & (l1 > c0) & (c0 < r1) & (r1 < r2)
            n_v = int(np.sum(is_v))
            depth = 0
            if n_v:
                depth = int(
                    np.max(
                        np.minimum(l2[is_v] - c0[is_v],
                                   r2[is_v] - c0[is_v])
                    )
                )
            out["event_type"].append(t)
            out["n_v_shapes"].append(n_v)
            out["max_depth"].append(depth)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


V_SHAPE_SQL = (
    _DENSE_GRID_SQL
    + """
, w AS MATERIALIZED (
  SELECT event_type, c,
         LAG(c, 2) OVER win AS l2, LAG(c, 1) OVER win AS l1,
         LEAD(c, 1) OVER win AS r1, LEAD(c, 2) OVER win AS r2,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM dense WINDOW win AS (PARTITION BY event_type ORDER BY h)
)
SELECT event_type,
       CAST(SUM(CASE WHEN l2 > l1 AND l1 > c AND c < r1 AND r1 < r2
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_v_shapes,
       CAST(COALESCE(MAX(CASE WHEN l2 > l1 AND l1 > c AND c < r1
                               AND r1 < r2
                              THEN LEAST(l2 - c, r2 - c) END), 0)
            AS BIGINT) AS max_depth
FROM w WHERE n >= 5
GROUP BY 1 ORDER BY 1
"""
)


# ---------------------------------------------------------------------------
# SCD2 point-in-time snapshots of the props "k" state per user
# ---------------------------------------------------------------------------


def q_scd2_snapshot_counts(sf_dir):
    """Point-in-time state reconstruction (the SCD2 / bitemporal
    read): each user's props "k" value is a slowly-changing attribute
    updated last-write-wins within a day ((ts, event_id) order) and
    carried forward (LOCF) across days; for every day in the span,
    count users per current k — the daily state census a warehouse
    dimension snapshot gives. One user-id hash-bucket shuffle;
    per-user day spans expand via np.repeat (bounded by the day-grid
    width), then one bounded (day x k) count merge. Exact integers
    throughout — no floats anywhere."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "props"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("user_id", "ts"))
        k = extract_int_key(b["props"], "k")
        t = pa.table(
            {
                "user_id": b["user_id"],
                "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": b["event_id"],
                "k": k,
            }
        ).filter(pc.is_valid(k))
        return add_bucket(t, "user_id", 64)

    projected = ev.map_batches(
        project, batch_format="pyarrow", batch_size=None
    ).materialize()
    # global day bounds over the SAME filtered rows
    bounds = projected.map_batches(
        lambda b: pa.table(
            {
                "mn": pa.array(
                    [int(pc.min(b["us"]).as_py() // _DAY_US)]
                    if len(b)
                    else [],
                    pa.int64(),
                ),
                "mx": pa.array(
                    [int(pc.max(b["us"]).as_py() // _DAY_US)]
                    if len(b)
                    else [],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).to_pandas()
    cols = ["day", "k", "n_users"]
    if not len(bounds):
        return pa.table({c: pa.array([], pa.int64()) for c in cols})
    gmin, gmax = int(bounds["mn"].min()), int(bounds["mx"].max())

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {c: pd.Series([], dtype=np.int64) for c in cols}
        )
        if len(g) == 0:
            return empty
        g = g.assign(day=g["us"].to_numpy(dtype=np.int64) // _DAY_US)
        g = g.sort_values(
            ["user_id", "day", "us", "event_id"],
            kind="mergesort",
            ignore_index=True,
        )
        last = g.groupby(["user_id", "day"], as_index=False).last()
        uid = last["user_id"].to_numpy(dtype=np.int64)
        day = last["day"].to_numpy(dtype=np.int64)
        kv = last["k"].to_numpy(dtype=np.int64)
        # span end: next day of same user, else gmax+1
        nxt = np.concatenate([day[1:], [0]])
        same = np.concatenate([uid[1:] == uid[:-1], [False]])
        end = np.where(same, nxt, gmax + 1)
        span = (end - day).astype(np.int64)
        # explode spans: one row per (day in [day, end), k)
        reps = np.repeat(np.arange(len(day)), span)
        offs = np.arange(len(reps)) - np.repeat(
            np.cumsum(span) - span, span
        )
        days_x = day[reps] + offs
        ks_x = kv[reps]
        df = pd.DataFrame({"day": days_x, "k": ks_x})
        cnt = df.groupby(["day", "k"]).size().reset_index(name="n_users")
        for c in cols:
            cnt[c] = cnt[c].astype(np.int64)
        return cnt

    parts = (
        projected.groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "day" not in parts.columns:
        return pa.table({c: pa.array([], pa.int64()) for c in cols})
    final = (
        parts.groupby(["day", "k"], as_index=False)["n_users"]
        .sum()
        .sort_values(["day", "k"], ignore_index=True)
    )
    return pa.table(
        {c: pa.array(final[c].to_numpy(dtype=np.int64)) for c in cols}
    )


SCD2_SQL = """
WITH v AS MATERIALIZED (
  SELECT user_id, EPOCH_US(ts) AS us, event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         CAST(FLOOR(EPOCH_US(ts) / 86400000000) AS BIGINT) AS day
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
), valid AS MATERIALIZED (
  SELECT * FROM v WHERE k IS NOT NULL
), perday AS MATERIALIZED (
  SELECT user_id, day, k FROM (
    SELECT user_id, day, k,
           ROW_NUMBER() OVER (PARTITION BY user_id, day
                              ORDER BY us DESC, event_id DESC) AS rn
    FROM valid
  ) WHERE rn = 1
), bounds AS MATERIALIZED (
  SELECT MIN(day) AS mn, MAX(day) AS mx FROM valid
), grid AS MATERIALIZED (
  SELECT u.user_id, g.day
  FROM (SELECT DISTINCT user_id FROM valid) u
  CROSS JOIN (SELECT unnest(generate_series(mn, mx)) AS day
              FROM bounds) g
), locf AS MATERIALIZED (
  SELECT g.user_id, g.day,
         LAST_VALUE(p.k IGNORE NULLS) OVER
           (PARTITION BY g.user_id ORDER BY g.day
            ROWS UNBOUNDED PRECEDING) AS state
  FROM grid g
  LEFT JOIN perday p ON p.user_id = g.user_id AND p.day = g.day
)
SELECT day, state AS k, CAST(COUNT(*) AS BIGINT) AS n_users
FROM locf WHERE state IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Mood's squared-rank scale test: weekday vs weekend value dispersion
# ---------------------------------------------------------------------------


def q_mood_scale_weekpart(sf_dir):
    """Per event type: Mood's squared-rank test for a SCALE
    difference between weekday and weekend values — T =
    sum_{weekday} (R_i - (N+1)/2)^2 over midranks of the pooled
    sample; large T means weekday values sit in the tails (higher
    dispersion). Doubled midranks (2R = 2*#less + #eq + 1) keep ties
    integral, so T4 = sum (2R - N - 1)^2 folds EXACTLY from the
    bounded (value x100, weekpart) histogram — no per-row ranking.
    The z close uses the classical no-tie moments (documented
    approximation), mirrored and snapped x1e6."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        dow = (us // _DAY_US + 4) % 7
        we = ((dow == 0) | (dow == 6)).astype(np.int64)
        v = b["value"].to_numpy(zero_copy_only=False)
        cents = np.where(
            v >= 0, np.floor(v * 100 + 0.5), np.ceil(v * 100 - 0.5)
        ).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "we": pa.array(we),
                "x": pa.array(cents),
            }
        )
        g = t.group_by(["event_type", "we", "x"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["event_type", "we", "x", "c"])

    hist = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["event_type", "we", "x"])
        .aggregate([("c", "sum")])
        .rename_columns(["event_type", "we", "x", "c"]),
    ).to_pandas()
    cols = ["event_type", "n_weekday", "n_weekend", "t4_stat",
            "z_x1e6"]
    out = {c: [] for c in cols}
    if len(hist) and "event_type" in hist.columns:
        hist = hist.groupby(
            ["event_type", "we", "x"], as_index=False
        )["c"].sum()
        for t in sorted(hist["event_type"].unique()):
            sub = hist[hist["event_type"] == t]
            pooled = (
                sub.groupby("x")["c"].sum().sort_index()
            )
            xs = pooled.index.to_numpy(dtype=np.int64)
            cnt = pooled.to_numpy(dtype=np.int64)
            n_tot = int(cnt.sum())
            less = np.concatenate(([0], np.cumsum(cnt)[:-1]))
            r2 = 2 * less + cnt + 1  # doubled midrank per value
            dev = r2 - (n_tot + 1)
            wd = sub[sub["we"] == 0].set_index("x")["c"]
            n1 = int(wd.sum()) if len(wd) else 0
            n2 = n_tot - n1
            if n1 == 0 or n2 == 0:
                continue
            wd_cnt = wd.reindex(xs, fill_value=0).to_numpy(
                dtype=np.int64
            )
            t4 = int(np.sum(wd_cnt * dev * dev))
            nf = float(n_tot)
            mu4 = float(n1) * (nf * nf - 1.0) / 3.0
            var4 = (
                float(n1) * float(n2) * (nf + 1.0)
                * (nf * nf - 4.0) / 11.25
            )
            z = None
            if var4 > 0.0:
                z = _round_half_away(
                    (float(t4) - mu4) / np.sqrt(var4) * 1e6
                )
            out["event_type"].append(t)
            out["n_weekday"].append(n1)
            out["n_weekend"].append(n2)
            out["t4_stat"].append(t4)
            out["z_x1e6"].append(z)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


MOOD_SCALE_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type,
         CASE WHEN (FLOOR(EPOCH_US(ts) / 86400000000) + 4) % 7
              IN (0, 6) THEN 1 ELSE 0 END AS we,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), h AS MATERIALIZED (
  SELECT event_type, x,
         CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1
  FROM v GROUP BY 1, 2
), ranked AS MATERIALIZED (
  SELECT event_type, x, c, c1,
         CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY x
              ROWS UNBOUNDED PRECEDING) - c AS BIGINT) AS less,
         CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM h
), mom AS (
  SELECT event_type, MAX(n) AS n,
         CAST(SUM(c1) AS BIGINT) AS n1,
         CAST(SUM(c1 * (2 * less + c + 1 - n - 1)
                  * (2 * less + c + 1 - n - 1)) AS BIGINT) AS t4
  FROM ranked GROUP BY 1
)
SELECT event_type, n1 AS n_weekday, n - n1 AS n_weekend,
       t4 AS t4_stat,
       CASE WHEN CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)
                 * (CAST(n AS DOUBLE) + 1.0)
                 * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 4.0)
                 / 11.25 > 0.0 THEN
         CAST(ROUND((CAST(t4 AS DOUBLE)
              - CAST(n1 AS DOUBLE)
                * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0) / 3.0)
              / SQRT(CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)
                 * (CAST(n AS DOUBLE) + 1.0)
                 * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 4.0)
                 / 11.25)
              * 1000000.0, 0) AS BIGINT)
       END AS z_x1e6
FROM mom WHERE n1 > 0 AND n - n1 > 0
ORDER BY 1
"""


def register_r4en(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "v_shape_reversals": q_v_shape_reversals,
            "scd2_snapshot_counts": q_scd2_snapshot_counts,
            "mood_scale_weekpart": q_mood_scale_weekpart,
        }
    )
    oracles.update(
        {
            "v_shape_reversals": V_SHAPE_SQL,
            "scd2_snapshot_counts": SCD2_SQL,
            "mood_scale_weekpart": MOOD_SCALE_SQL,
        }
    )
