"""Round-4 batch M: downsampling-distortion audit for the 1m tier,
Fano-factor burstiness, weekday/weekend contrast, consecutive-active-day
streaks, and exact per-value ranks.

Exactness discipline: x100 int64 quantization at the raw grain; bucket
means are snapped with the SAME two-step both sides (exact int sum ->
one float division -> ROUND half away from zero), so residuals are
exact integers; day/weekday indices are integer epoch-microsecond
arithmetic. All outputs are int64 or strings — nothing float-summed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.functions.timeutil import trunc_us
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge
from mimirsbrunn_ray.stages.timeseries import (
    _project_series,
    _round_half_away_x,
    _series_segments,
)

_DAY_US = 86_400_000_000


def _clean_events(b: pa.Table, cols: tuple[str, ...]) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# downsample-distortion audit: how much information the 1m tier loses
# ---------------------------------------------------------------------------


def q_downsample_error_1m(sf_dir):
    """Per event type, the exact L1 / L-infinity error introduced when
    the raw series is replaced by its 1m-tier bucket means (each mean
    snapped to x100 the way the tier publishes it) — the audit that
    tells a retention policy how lossy dropping raw for 1m actually is.

    Scale shape: ONE composite-key hash-bucket shuffle on (type, minute)
    co-locates each bucket's rows, so bucket means and residuals resolve
    locally; per-type partial (sum, max, counts) rows then tree-merge.
    The raw stream is scanned once and never joined against itself."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = _clean_events(b, ("event_type", "ts", "value"))
        ts_us = (
            b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64),
            100.0,
        )
        m = trunc_us(ts_us, "1m")
        key = pc.binary_join_element_wise(
            b["event_type"],
            pa.array(m.astype("U"), pa.string()),
            "|",
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "m": pa.array(m),
                "x": pa.array(x),
                "k": key,
            }
        )
        return add_bucket(t, "k", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_rows": pd.Series([], dtype=np.int64),
                "n_buckets": pd.Series([], dtype=np.int64),
                "sum_abs": pd.Series([], dtype=np.int64),
                "max_abs": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        grp = g.groupby(["event_type", "m"], sort=False)
        x = g["x"].to_numpy(dtype=np.int64)
        s = grp["x"].transform("sum").to_numpy(dtype=np.int64)
        n = grp["x"].transform("size").to_numpy(dtype=np.int64)
        mean_r = _round_half_away_x(s.astype(np.float64) / n, 1.0)
        resid = np.abs(x - mean_r)
        t = pd.DataFrame(
            {"event_type": g["event_type"].to_numpy(), "m": g["m"].to_numpy(),
             "r": resid}
        )
        agg = t.groupby("event_type", sort=False).agg(
            n_rows=("r", "size"),
            n_buckets=("m", "nunique"),
            sum_abs=("r", "sum"),
            max_abs=("r", "max"),
        ).reset_index()
        for c in ("n_rows", "n_buckets", "sum_abs", "max_abs"):
            agg[c] = agg[c].astype(np.int64)
        return agg

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n_rows", "sum"), ("n_buckets", "sum"),
             ("sum_abs", "sum"), ("max_abs", "max")]
        )
        g = g.select(
            ["event_type", "n_rows_sum", "n_buckets_sum",
             "sum_abs_sum", "max_abs_max"]
        )
        return g.rename_columns(
            ["event_type", "n_rows", "n_buckets", "sum_abs", "max_abs"]
        )

    out = tree_merge(
        ev.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas"),
        combine,
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "n_rows": b["n_rows"].cast(pa.int64()),
                "n_buckets": b["n_buckets"].cast(pa.int64()),
                "sum_abs_resid_x100": b["sum_abs"].cast(pa.int64()),
                "max_abs_resid_x100": b["max_abs"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


DOWNSAMPLE_ERR_SQL = """
WITH v AS (
  SELECT event_type, date_trunc('minute', ts) AS m,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), b AS (
  SELECT event_type, m, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s
  FROM v GROUP BY 1, 2
), r AS (
  SELECT v.event_type, v.m,
         ABS(v.x - CAST(ROUND(CAST(b.s AS DOUBLE) / b.n, 0) AS BIGINT))
           AS resid
  FROM v JOIN b USING (event_type, m)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT m) AS BIGINT) AS n_buckets,
       CAST(SUM(resid) AS BIGINT) AS sum_abs_resid_x100,
       CAST(MAX(resid) AS BIGINT) AS max_abs_resid_x100
FROM r GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Fano-factor burstiness over per-minute arrival counts
# ---------------------------------------------------------------------------


def q_fano_factor_1m(sf_dir):
    """Burstiness moments per event type over its OBSERVED per-minute
    arrival counts: n_minutes, sum of counts and sum of squared counts —
    the exact-integer sufficient statistics of the Fano factor
    (variance-to-mean ratio; 1 = Poisson, >1 = bursty). Two bounded
    combiner-first reductions: raw -> (type, minute) count tier ->
    per-type moment row; no shuffle touches raw rows."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean_events(b, ("event_type", "ts"))
        ts_us = (
            b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "m": pa.array(trunc_us(ts_us, "1m")),
            }
        )
        g = t.group_by(["event_type", "m"]).aggregate([([], "count_all")])
        return g.select(["event_type", "m", "count_all"]).rename_columns(
            ["event_type", "m", "c"]
        )

    def combine_tier(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "m"]).aggregate([("c", "sum")])
        return g.select(["event_type", "m", "c_sum"]).rename_columns(
            ["event_type", "m", "c"]
        )

    tier = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine_tier,
        final_shards=8,
        shard_cols=["event_type", "m"],
    )

    def moments(b: pa.Table) -> pa.Table:
        c = b["c"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "one": pa.array(np.ones(len(c), dtype=np.int64)),
                "c": pa.array(c),
                "c2": pa.array(c * c),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [("one", "sum"), ("c", "sum"), ("c2", "sum")]
        )
        g = g.select(["event_type", "one_sum", "c_sum", "c2_sum"])
        return g.rename_columns(["event_type", "n_minutes", "sum_c", "sum_c2"])

    def combine_m(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n_minutes", "sum"), ("sum_c", "sum"), ("sum_c2", "sum")]
        )
        g = g.select(
            ["event_type", "n_minutes_sum", "sum_c_sum", "sum_c2_sum"]
        )
        return g.rename_columns(["event_type", "n_minutes", "sum_c", "sum_c2"])

    out = tree_merge(
        tier.map_batches(moments, batch_format="pyarrow", batch_size=None),
        combine_m,
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "n_minutes": b["n_minutes"].cast(pa.int64()),
                "sum_c": b["sum_c"].cast(pa.int64()),
                "sum_c2": b["sum_c2"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


FANO_SQL = """
WITH t AS (
  SELECT event_type, date_trunc('minute', ts) AS m,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_minutes,
       CAST(SUM(c) AS BIGINT) AS sum_c,
       CAST(SUM(c * c) AS BIGINT) AS sum_c2
FROM t GROUP BY 1
"""


# ---------------------------------------------------------------------------
# weekday vs weekend contrast per event type
# ---------------------------------------------------------------------------


def q_weekday_weekend_contrast(sf_dir):
    """Per event type: sample count and exact x100 value sum split into
    weekday vs weekend (Sat/Sun, UTC) — the seasonality contrast a
    capacity planner reads first. Weekday is integer epoch arithmetic
    ((epoch_days + 4) % 7 with Sunday = 0, matching DuckDB's
    dayofweek), so the split is exact; one combiner-first pass, rows
    bounded by 2 x types."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean_events(b, ("event_type", "ts", "value"))
        ts_us = (
            b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64),
            100.0,
        )
        dow = (np.floor_divide(ts_us, _DAY_US) + 4) % 7  # Sunday = 0
        we = ((dow == 0) | (dow == 6)).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "we": pa.array(we),
                "one": pa.array(np.ones(len(x), dtype=np.int64)),
                "x": pa.array(x),
            }
        )
        g = t.group_by(["event_type", "we"]).aggregate(
            [("one", "sum"), ("x", "sum")]
        )
        g = g.select(["event_type", "we", "one_sum", "x_sum"])
        return g.rename_columns(["event_type", "we", "n", "s"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "we"]).aggregate(
            [("n", "sum"), ("s", "sum")]
        )
        g = g.select(["event_type", "we", "n_sum", "s_sum"])
        return g.rename_columns(["event_type", "we", "n", "s"])

    flat = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: 2 rows per event type
    if "event_type" not in flat.columns:  # fully-empty input short-circuit
        flat = pd.DataFrame({"event_type": [], "we": [], "n": [], "s": []})
    types = sorted(flat["event_type"].unique())
    rows = {"event_type": [], "n_weekday": [], "sum_weekday_x100": [],
            "n_weekend": [], "sum_weekend_x100": []}
    for t in types:
        sub = flat[flat["event_type"] == t]
        wd = sub[sub["we"] == 0]
        we = sub[sub["we"] == 1]
        rows["event_type"].append(t)
        rows["n_weekday"].append(int(wd["n"].sum()))
        rows["sum_weekday_x100"].append(int(wd["s"].sum()))
        rows["n_weekend"].append(int(we["n"].sum()))
        rows["sum_weekend_x100"].append(int(we["s"].sum()))
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "n_weekday": pa.array(rows["n_weekday"], pa.int64()),
            "sum_weekday_x100": pa.array(rows["sum_weekday_x100"], pa.int64()),
            "n_weekend": pa.array(rows["n_weekend"], pa.int64()),
            "sum_weekend_x100": pa.array(rows["sum_weekend_x100"], pa.int64()),
        }
    )


WEEKPART_SQL = """
WITH v AS (
  SELECT event_type, dayofweek(ts) AS dow,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
)
SELECT event_type,
       CAST(SUM(CASE WHEN dow NOT IN (0, 6) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_weekday,
       CAST(SUM(CASE WHEN dow NOT IN (0, 6) THEN x ELSE 0 END) AS BIGINT)
         AS sum_weekday_x100,
       CAST(SUM(CASE WHEN dow IN (0, 6) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_weekend,
       CAST(SUM(CASE WHEN dow IN (0, 6) THEN x ELSE 0 END) AS BIGINT)
         AS sum_weekend_x100
FROM v GROUP BY 1
"""


# ---------------------------------------------------------------------------
# consecutive-active-day streaks per user
# ---------------------------------------------------------------------------


def q_active_day_streaks(sf_dir):
    """Per user: number of distinct active days and the longest run of
    CONSECUTIVE active days — the retention streak metric. Gaps-and-
    islands on integer epoch-day indices: batch-local distinct
    (user, day), one user-hash bucket shuffle (a user's days co-locate),
    islands where the day delta != 1, run lengths from boundary
    differences; per-user results are final inside the bucket."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean_events(b, ("user_id", "ts"))
        ts_us = (
            b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        t = pa.table(
            {
                "user_id": b["user_id"],
                "day": pa.array(np.floor_divide(ts_us, _DAY_US)),
            }
        )
        g = t.group_by(["user_id", "day"]).aggregate([])
        return add_bucket(g, "user_id", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype=np.int64),
                "n_active_days": pd.Series([], dtype=np.int64),
                "longest_streak_days": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort", ignore_index=True
        )
        u = g["user_id"].to_numpy()
        d = g["day"].to_numpy(dtype=np.int64)
        new_run = np.empty(len(g), dtype=bool)
        new_run[0] = True
        new_run[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)
        rid = np.cumsum(new_run)
        runs = pd.DataFrame({"user_id": u, "rid": rid}).groupby(
            ["user_id", "rid"], sort=False, as_index=False
        ).size()
        agg = runs.groupby("user_id", sort=False, as_index=False).agg(
            n_active_days=("size", "sum"),
            longest_streak_days=("size", "max"),
        )
        for c in ("n_active_days", "longest_streak_days"):
            agg[c] = agg[c].astype(np.int64)
        return agg

    return (
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
    )


STREAK_DAYS_SQL = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(epoch(date_trunc('day', ts)) // 86400 AS BIGINT) AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), i AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
           AS anchor
  FROM d
), runs AS (
  SELECT user_id, anchor, COUNT(*) AS len FROM i GROUP BY 1, 2
)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(MAX(len) AS BIGINT) AS longest_streak_days
FROM runs GROUP BY 1
"""


# ---------------------------------------------------------------------------
# exact per-value ranks within each event type
# ---------------------------------------------------------------------------


def q_value_ranks_events(sf_dir):
    """Per event: how many same-type samples are strictly smaller
    (rank_strict = SQL RANK() - 1), how many tie its value, and the
    type's total count — the exact sufficient statistics of
    percent-rank / quantile normalization. One series hash-bucket
    shuffle; each type's values sort once per bucket and every row
    resolves by two searchsorted probes."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    proj = _project_series(ev, "event_type", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_id": pd.Series([], dtype=np.int64),
                "event_type": pd.Series([], dtype=object),
                "rank_strict": pd.Series([], dtype=np.int64),
                "n_ties": pd.Series([], dtype=np.int64),
                "n_type": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, _same = _series_segments(g, "event_type", "ts", "event_id")
        x = _round_half_away_x(g["value"].to_numpy(dtype=np.float64), 100.0)
        k = g["event_type"].to_numpy()
        # type-change boundaries over the (key, ts, id)-sorted frame
        starts = np.flatnonzero(
            np.concatenate(([True], k[1:] != k[:-1]))
        )
        ends = np.concatenate((starts[1:], [len(g)]))
        rank = np.empty(len(g), dtype=np.int64)
        ties = np.empty(len(g), dtype=np.int64)
        ntyp = np.empty(len(g), dtype=np.int64)
        for s, e in zip(starts, ends):  # bounded: distinct types per bucket
            xs = np.sort(x[s:e])
            lo = np.searchsorted(xs, x[s:e], side="left")
            hi = np.searchsorted(xs, x[s:e], side="right")
            rank[s:e] = lo
            ties[s:e] = hi - lo
            ntyp[s:e] = e - s
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(dtype=np.int64),
                "event_type": k,
                "rank_strict": rank,
                "n_ties": ties,
                "n_type": ntyp,
            }
        )

    return proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas")


VALUE_RANKS_SQL = """
WITH v AS (
  SELECT event_id, event_type,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
)
SELECT event_id, event_type,
       CAST(RANK() OVER (PARTITION BY event_type ORDER BY x) - 1 AS BIGINT)
         AS rank_strict,
       CAST(COUNT(*) OVER (PARTITION BY event_type, x) AS BIGINT) AS n_ties,
       CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_type
FROM v
"""


def register_r4m(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "downsample_error_1m": q_downsample_error_1m,
            "fano_factor_1m": q_fano_factor_1m,
            "weekday_weekend_contrast": q_weekday_weekend_contrast,
            "active_day_streaks": q_active_day_streaks,
            "value_ranks_events": q_value_ranks_events,
        }
    )
    oracles.update(
        {
            "downsample_error_1m": DOWNSAMPLE_ERR_SQL,
            "fano_factor_1m": FANO_SQL,
            "weekday_weekend_contrast": WEEKPART_SQL,
            "active_day_streaks": STREAK_DAYS_SQL,
            "value_ranks_events": VALUE_RANKS_SQL,
        }
    )
