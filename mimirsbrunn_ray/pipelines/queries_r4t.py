"""Round-4 batch T: windowed conversion funnel, id-vs-time inversion
audit, and D1/D7 cohort retention.

Exactness discipline: pure integer counts and epoch-microsecond
comparisons; retention membership tests are exact set probes over each
user's distinct active days (a user's days co-locate in one bucket).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.functions.timeutil import trunc_us, ts_array
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# windowed conversion: click -> purchase within 1 hour
# ---------------------------------------------------------------------------


def q_conversion_within_1h(sf_dir):
    """One-row funnel: users with >= 1 click, and how many of them made
    a purchase within ONE HOUR after some click — the time-boxed
    conversion rate (the unboxed variant is users_click_and_purchase).
    A user's clicks and purchases co-locate in one user-hash bucket;
    the within-window test is one searchsorted probe per click against
    the user's sorted purchase times. Output is a single exact row."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("user_id", "ts", "event_type"))
        b = b.filter(
            pc.is_in(b["event_type"], value_set=pa.array(
                ["click", "purchase"]))
        )
        t = pa.table(
            {
                "user_id": b["user_id"],
                "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_type": b["event_type"],
            }
        )
        return add_bucket(t, "user_id", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_clickers": pd.Series([], dtype=np.int64),
                "n_converted_1h": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        et = g["event_type"].to_numpy()
        user = g["user_id"].to_numpy(dtype=np.int64)
        us = g["us"].to_numpy(dtype=np.int64)
        is_cl = et == "click"
        is_pu = et == "purchase"
        cl_u, cl_t = user[is_cl], us[is_cl]
        if len(cl_u) == 0:
            return empty
        pu_u, pu_t = user[is_pu], us[is_pu]
        if len(pu_u) == 0:  # clicks but no purchases in this bucket
            return pd.DataFrame(
                {
                    "n_clickers": pd.Series(
                        [len(np.unique(cl_u))], dtype=np.int64
                    ),
                    "n_converted_1h": pd.Series([0], dtype=np.int64),
                }
            )
        # composite-key searchsorted (the rate-limiter idiom): dense-rank
        # users, key = rank * span + time offset; the first purchase with
        # key strictly greater than a click's key is the user's earliest
        # purchase AFTER that click (ties on ts excluded, matching b.ts >
        # a.ts)
        all_u = np.unique(np.concatenate([cl_u, pu_u]))
        cr = np.searchsorted(all_u, cl_u).astype(np.int64)
        prk = np.searchsorted(all_u, pu_u).astype(np.int64)
        base = int(us.min())
        span = int(us.max()) - base + 2
        order = np.lexsort((pu_t, prk))
        prk, pu_t = prk[order], pu_t[order]
        pk = prk * span + (pu_t - base)
        ck = cr * span + (cl_t - base)
        lo = np.searchsorted(pk, ck, side="right")
        inb = lo < len(pk)
        li = np.minimum(lo, len(pk) - 1)
        ok = inb & (prk[li] == cr) & (pu_t[li] <= cl_t + _HOUR_US)
        clickers = int(len(np.unique(cr)))
        converted = int(len(np.unique(cr[ok])))
        return pd.DataFrame(
            {
                "n_clickers": pd.Series([clickers], dtype=np.int64),
                "n_converted_1h": pd.Series([converted], dtype=np.int64),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_clickers": pa.array(
                    [pc.sum(b["n_clickers"]).as_py() or 0], pa.int64()
                ),
                "n_converted_1h": pa.array(
                    [pc.sum(b["n_converted_1h"]).as_py() or 0], pa.int64()
                ),
            }
        )

    tot = tree_merge(
        ev.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas"),
        combine,
    ).to_pandas()
    n_cl = int(tot["n_clickers"].sum()) if "n_clickers" in tot.columns else 0
    n_cv = (
        int(tot["n_converted_1h"].sum())
        if "n_converted_1h" in tot.columns else 0
    )
    return pa.table(
        {
            "n_clickers": pa.array([n_cl], pa.int64()),
            "n_converted_1h": pa.array([n_cv], pa.int64()),
        }
    )


CONVERSION_SQL = """
WITH c AS (
  SELECT DISTINCT user_id FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type = 'click'
), conv AS (
  SELECT DISTINCT a.user_id
  FROM events a JOIN events b
    ON a.user_id = b.user_id
   AND a.event_type = 'click' AND b.event_type = 'purchase'
   AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
  WHERE a.user_id IS NOT NULL AND a.ts IS NOT NULL AND b.ts IS NOT NULL
)
SELECT CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clickers,
       CAST((SELECT COUNT(*) FROM conv) AS BIGINT) AS n_converted_1h
"""


# ---------------------------------------------------------------------------
# id-vs-time inversion audit
# ---------------------------------------------------------------------------


def q_id_ts_inversions(sf_dir):
    """Data-quality sortedness audit: per event type, order rows by
    event_id (the ingest sequence) and count adjacent pairs whose
    timestamp goes BACKWARDS — the out-of-order-arrival signal that
    sizes watermark lateness budgets. One type-hash bucket shuffle;
    a type's rows sort by id inside its bucket."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "event_id", "ts"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "event_id", "ts"))
        t = pa.table(
            {
                "event_type": b["event_type"],
                "event_id": b["event_id"],
                "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            }
        )
        return add_bucket(t, "event_type", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_pairs": pd.Series([], dtype=np.int64),
                "n_inversions": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["event_type", "event_id"], kind="mergesort", ignore_index=True
        )
        k = g["event_type"].to_numpy()
        us = g["us"].to_numpy(dtype=np.int64)
        same = np.empty(len(g), dtype=bool)
        same[0] = False
        same[1:] = k[1:] == k[:-1]
        prev = np.concatenate(([np.int64(0)], us[:-1]))
        inv = same & (us < prev)
        t = pd.DataFrame(
            {"k": k, "p": same.astype(np.int64), "i": inv.astype(np.int64)}
        )
        agg = t.groupby("k", sort=False, as_index=False).agg(
            n_pairs=("p", "sum"), n_inversions=("i", "sum")
        )
        out = agg.rename(columns={"k": "event_type"})
        for c in ("n_pairs", "n_inversions"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        ev.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
    )


INVERSIONS_SQL = """
WITH v AS (
  SELECT event_type, event_id, ts FROM events
  WHERE event_type IS NOT NULL AND event_id IS NOT NULL AND ts IS NOT NULL
), l AS (
  SELECT event_type, ts,
         LAG(ts) OVER (PARTITION BY event_type ORDER BY event_id) AS pts
  FROM v
)
SELECT event_type,
       CAST(SUM(CASE WHEN pts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pairs,
       CAST(SUM(CASE WHEN ts < pts THEN 1 ELSE 0 END) AS BIGINT)
         AS n_inversions
FROM l GROUP BY 1
"""


# ---------------------------------------------------------------------------
# D1 / D7 cohort retention
# ---------------------------------------------------------------------------


def q_cohort_d1_d7_retention(sf_dir):
    """Per signup-day cohort (a user's first active day): cohort size,
    how many came back EXACTLY one day later (D1) and exactly seven
    days later (D7) — the standard product-retention readout. A user's
    distinct active days co-locate in one user-hash bucket, so first
    day and the two membership probes are bucket-local; per-cohort
    partials tree-merge into the days-bounded result."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("user_id", "ts"))
        us = (
            b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        t = pa.table(
            {
                "user_id": b["user_id"],
                "day": pa.array(trunc_us(us, "1d")),
            }
        )
        g = t.group_by(["user_id", "day"]).aggregate([])
        return add_bucket(g, "user_id", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "cohort_day": pd.Series([], dtype=np.int64),
                "n_users": pd.Series([], dtype=np.int64),
                "n_back_d1": pd.Series([], dtype=np.int64),
                "n_back_d7": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort", ignore_index=True
        )
        u = g["user_id"].to_numpy(dtype=np.int64)
        d = g["day"].to_numpy(dtype=np.int64)
        starts = np.flatnonzero(
            np.concatenate(([True], u[1:] != u[:-1]))
        )
        # vectorized membership probes via composite keys: rows are
        # sorted by (user, day), so rank*span + day_idx is ascending
        uniq = u[starts]
        ur = np.searchsorted(uniq, u).astype(np.int64)
        base = int(d.min()) if len(d) else 0
        di = (d - base) // _DAY_US
        span = int(di.max()) + 9 if len(di) else 9
        keys = ur * span + di
        f = d[starts]
        fur = ur[starts]
        fdi = di[starts]

        def _member(offset_days: int) -> np.ndarray:
            probe = fur * span + fdi + offset_days
            pos = np.searchsorted(keys, probe)
            inb = pos < len(keys)
            return inb & (keys[np.minimum(pos, len(keys) - 1)] == probe)

        t = pd.DataFrame(
            {
                "cohort_day": f,
                "one": np.ones(len(f), dtype=np.int64),
                "d1": _member(1).astype(np.int64),
                "d7": _member(7).astype(np.int64),
            }
        )
        agg = t.groupby("cohort_day", sort=False, as_index=False).agg(
            n_users=("one", "sum"),
            n_back_d1=("d1", "sum"),
            n_back_d7=("d7", "sum"),
        )
        for c in agg.columns:
            agg[c] = agg[c].astype(np.int64)
        return agg

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["cohort_day"]).aggregate(
            [("n_users", "sum"), ("n_back_d1", "sum"), ("n_back_d7", "sum")]
        )
        g = g.select(
            ["cohort_day", "n_users_sum", "n_back_d1_sum", "n_back_d7_sum"]
        )
        return g.rename_columns(
            ["cohort_day", "n_users", "n_back_d1", "n_back_d7"]
        )

    out = tree_merge(
        ev.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas"),
        combine,
    )

    def finish(b: pa.Table) -> pa.Table:
        d = b["cohort_day"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cohort_day": ts_array(d.astype(np.int64)),
                "n_users": b["n_users"].cast(pa.int64()),
                "n_back_d1": b["n_back_d1"].cast(pa.int64()),
                "n_back_d7": b["n_back_d7"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


RETENTION_D_SQL = """
WITH d AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), f AS (
  SELECT user_id, MIN(day) AS fd FROM d GROUP BY 1
)
SELECT f.fd AS cohort_day,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN EXISTS (
         SELECT 1 FROM d WHERE d.user_id = f.user_id
           AND d.day = f.fd + INTERVAL 1 DAY
       ) THEN 1 ELSE 0 END) AS BIGINT) AS n_back_d1,
       CAST(SUM(CASE WHEN EXISTS (
         SELECT 1 FROM d WHERE d.user_id = f.user_id
           AND d.day = f.fd + INTERVAL 7 DAY
       ) THEN 1 ELSE 0 END) AS BIGINT) AS n_back_d7
FROM f GROUP BY 1
"""


def register_r4t(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "conversion_within_1h": q_conversion_within_1h,
            "id_ts_inversions": q_id_ts_inversions,
            "cohort_d1_d7_retention": q_cohort_d1_d7_retention,
        }
    )
    oracles.update(
        {
            "conversion_within_1h": CONVERSION_SQL,
            "id_ts_inversions": INVERSIONS_SQL,
            "cohort_d1_d7_retention": RETENTION_D_SQL,
        }
    )
