"""Round-4 batch BG: assist-threshold curve, buyer month-over-month
retention, and activity-grid sparsity.

Exactness discipline: all three are pure integer counting — window
click counts at integer thresholds, distinct (customer, month) pair
joins, and distinct-count products.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# assist threshold curve: purchases with >= k prior-hour clicks
# ---------------------------------------------------------------------------

_ASSIST_KS = (1, 2, 3, 4, 5)


def q_assist_threshold_curve(sf_dir):
    """The assist-depth curve: for k = 1..5, how many purchases had at
    least k same-user clicks in the preceding hour — the threshold
    sweep behind assisted_purchase_rate's single cut (pick k where the
    curve elbows). One user hash-bucket shuffle; the same searchsorted
    window count serves every threshold."""
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
                "k": pd.Series([], dtype=np.int64),
                "n_purchases_ge_k": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, _ = _series_segments(g, "user_id", "ts", "event_id")
        counts = []
        for _, u in g.groupby("user_id", sort=False):
            et = u["event_type"].to_numpy()
            ts_us = u["ts"].to_numpy(
                dtype="datetime64[us]"
            ).astype(np.int64)
            cl = ts_us[et == "click"]
            pu = ts_us[et == "purchase"]
            if not len(pu):
                continue
            lo = np.searchsorted(cl, pu - _HOUR_US, side="left")
            hi = np.searchsorted(cl, pu, side="left")
            counts.append(hi - lo)
        if not counts:
            return empty
        kcnt = np.concatenate(counts)
        rows = {"k": [], "n_purchases_ge_k": []}
        for k in _ASSIST_KS:
            rows["k"].append(k)
            rows["n_purchases_ge_k"].append(int((kcnt >= k).sum()))
        return pd.DataFrame(
            {
                "k": pd.Series(rows["k"], dtype=np.int64),
                "n_purchases_ge_k": pd.Series(
                    rows["n_purchases_ge_k"], dtype=np.int64
                ),
            }
        )

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["k"]).aggregate([("n_purchases_ge_k", "sum")])
        return g.rename_columns(["k", "n_purchases_ge_k"])

    return tree_merge(partials, combine)


_assist_cols = ",\n       ".join(
    f"CAST(SUM(CASE WHEN n_clicks >= {k} THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS c{k}"
    for k in _ASSIST_KS
)
ASSIST_CURVE_SQL = f"""
WITH p AS MATERIALIZED (
  SELECT user_id, ts, event_id FROM events
  WHERE event_type = 'purchase'
    AND user_id IS NOT NULL AND ts IS NOT NULL
), c AS MATERIALIZED (
  SELECT user_id, ts FROM events
  WHERE event_type = 'click'
    AND user_id IS NOT NULL AND ts IS NOT NULL
), k AS (
  SELECT p.user_id, p.ts, p.event_id,
         CAST(COUNT(c.ts) AS BIGINT) AS n_clicks
  FROM p LEFT JOIN c
    ON c.user_id = p.user_id
   AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
  GROUP BY 1, 2, 3
), wide AS (
  SELECT {_assist_cols}
  FROM k
)
SELECT CAST(t.k AS BIGINT) AS k,
       CASE t.k
         {' '.join(f'WHEN {k} THEN wide.c{k}' for k in _ASSIST_KS)}
       END AS n_purchases_ge_k
FROM wide, (SELECT unnest(generate_series(1, 5)) AS k) t
"""


# ---------------------------------------------------------------------------
# buyer month-over-month retention
# ---------------------------------------------------------------------------


def q_buyer_month_retention(sf_dir):
    """Per calendar month: distinct buyers, and how many of them also
    bought in the NEXT month — the buyer retention series (the orders
    table's cohort signal). Distinct (customer, month) pairs from
    key-disjoint customer shards; each shard holds a customer's whole
    month set, so the month -> month+1 overlap resolves locally and the
    per-month counts merge bounded."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.is_valid(b["o_custkey"]), pc.is_valid(b["o_orderdate"])
            )
        )
        dt = b["o_orderdate"].cast(pa.timestamp("us"))
        yr = pc.year(dt).to_numpy(zero_copy_only=False).astype(np.int64)
        mo = pc.month(dt).to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "o_custkey": b["o_custkey"],
                "m": pa.array(yr * 12 + mo - 1),
            }
        )
        g = t.group_by(["o_custkey", "m"]).aggregate([([], "count_all")])
        g = g.select(["o_custkey", "m"])
        return add_bucket(g, "o_custkey", 64)

    proj = orders.map_batches(project, batch_format="pyarrow",
                              batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "month_idx": pd.Series([], dtype=np.int64),
                "n_buyers": pd.Series([], dtype=np.int64),
                "n_retained": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.drop_duplicates(["o_custkey", "m"])
        key = set(zip(g["o_custkey"], g["m"]))
        nxt = np.fromiter(
            ((ck, m + 1) in key for ck, m in zip(g["o_custkey"], g["m"])),
            dtype=bool, count=len(g),
        )
        df = pd.DataFrame(
            {"m": g["m"].to_numpy(dtype=np.int64),
             "r": nxt.astype(np.int64)}
        )
        agg = df.groupby("m").agg(
            n_buyers=("r", "size"), n_retained=("r", "sum")
        ).reset_index()
        agg.columns = ["month_idx", "n_buyers", "n_retained"]
        for c in agg.columns:
            agg[c] = agg[c].astype(np.int64)
        return agg

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["month_idx"]).aggregate(
            [("n_buyers", "sum"), ("n_retained", "sum")]
        )
        return g.rename_columns(["month_idx", "n_buyers", "n_retained"])

    return tree_merge(partials, combine)


BUYER_RETENTION_SQL = """
WITH cm AS (
  SELECT DISTINCT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
              AS BIGINT) AS m
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
)
SELECT a.m AS month_idx,
       CAST(COUNT(*) AS BIGINT) AS n_buyers,
       CAST(SUM(CASE WHEN b.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_retained
FROM cm a LEFT JOIN cm b
  ON b.o_custkey = a.o_custkey AND b.m = a.m + 1
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# activity-grid sparsity
# ---------------------------------------------------------------------------


def q_activity_grid_sparsity(sf_dir):
    """How sparse the (user, day) activity grid is: distinct active
    users, distinct active days, distinct active (user, day) cells —
    grid density = cells / (users * days), the zero-inflation signal a
    forecaster checks before choosing a model family. Combiner-first
    distinct counting across three grains."""
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
        t = pa.table(
            {
                "user_id": b["user_id"],
                "day": pa.array(np.floor_divide(ts_us, _DAY_US)),
            }
        )
        g = t.group_by(["user_id", "day"]).aggregate([([], "count_all")])
        g = g.select(["user_id", "day"])
        return add_bucket(g, "user_id", 64)

    proj = ev.map_batches(project, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_cells": pd.Series([], dtype=np.int64),
                "n_users": pd.Series([], dtype=np.int64),
                "day": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.drop_duplicates(["user_id", "day"])
        # users are bucket-local (key-disjoint); days are NOT — emit the
        # bucket's distinct days for a global dedup downstream
        days = g["day"].unique()
        return pd.DataFrame(
            {
                "n_cells": pd.Series(
                    [len(g)] + [0] * (len(days) - 1)
                    if len(days) else [len(g)],
                    dtype=np.int64,
                ),
                "n_users": pd.Series(
                    [g["user_id"].nunique()] + [0] * (len(days) - 1)
                    if len(days) else [g["user_id"].nunique()],
                    dtype=np.int64,
                ),
                "day": pd.Series(
                    days if len(days) else [-1], dtype=np.int64
                ),
            }
        )

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "day" not in b.column_names:
            return pa.table(
                {
                    "n_users": pa.array([0], pa.int64()),
                    "n_days": pa.array([0], pa.int64()),
                    "n_cells": pa.array([0], pa.int64()),
                }
            )
        days = b["day"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_users": pa.array(
                    [int(pc.sum(b["n_users"]).as_py() or 0)], pa.int64()
                ),
                "n_days": pa.array(
                    [len(np.unique(days[days >= 0]))], pa.int64()
                ),
                "n_cells": pa.array(
                    [int(pc.sum(b["n_cells"]).as_py() or 0)], pa.int64()
                ),
            }
        )

    # the day-dedup fold must see ALL bucket outputs at once (bounded:
    # buckets x distinct days) — one final single-block fold
    return tree_merge(
        partials,
        lambda b: b,  # pass-through at level 1 (already tiny)
    ).map_batches(fold, batch_format="pyarrow", batch_size=None)


SPARSITY_SQL = """
WITH p AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
)
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days,
       CAST(COUNT(*) AS BIGINT) AS n_cells
FROM p
"""


def register_r4bg(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "assist_threshold_curve": q_assist_threshold_curve,
            "buyer_month_retention": q_buyer_month_retention,
            "activity_grid_sparsity": q_activity_grid_sparsity,
        }
    )
    oracles.update(
        {
            "assist_threshold_curve": ASSIST_CURVE_SQL,
            "buyer_month_retention": BUYER_RETENTION_SQL,
            "activity_grid_sparsity": SPARSITY_SQL,
        }
    )
