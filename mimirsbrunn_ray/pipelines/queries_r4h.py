"""Round-4 batch H: RLE flat-segment stats (the Gorilla-adjacent
compressibility probe), sliding-window rate-limiter rejection audit,
Tukey-fence seasonal outliers from bounded histograms, and the
first-order event-type Markov transition matrix.

Exactness discipline: x100 per-term quantization; run/window counts are
exact integers; quantiles follow the repo's PERCENTILE_DISC rank rule
(smallest v with cumulative count >= ceil(q*n), stages/rollup.py:325);
probabilities by floor division ppm.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# ---------------------------------------------------------------------------
# value run lengths (RLE compressibility per series)
# ---------------------------------------------------------------------------


def q_value_run_lengths(sf_dir):
    """Flat-segment RLE statistics per event type — the probe a
    Gorilla-style XOR compressor uses to predict its ratio (identical
    consecutive x100 values encode in one bit): number of maximal equal
    runs, longest run, and runs-per-sample ppm (floor division). One
    series hash-bucket shuffle; runs never cross the shuffle because a
    series lives wholly inside its bucket (stages/timeseries shape)."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET
    from mimirsbrunn_ray.stages.timeseries import (
        _project_series,
        _round_half_away_x,
        _series_segments,
    )

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    proj = _project_series(ev, "event_type", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_samples": pd.Series([], dtype=np.int64),
                "n_runs": pd.Series([], dtype=np.int64),
                "max_run": pd.Series([], dtype=np.int64),
                "runs_ppm": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "event_type", "ts", "event_id")
        x = _round_half_away_x(g["value"].to_numpy(dtype=np.float64), 100.0)
        prev = np.concatenate(([np.int64(0)], x[:-1]))
        new_run = (~same) | (x != prev)
        rid = np.cumsum(new_run)
        k = g["event_type"].to_numpy()
        runs = pd.DataFrame({"k": k, "rid": rid}).groupby(
            ["k", "rid"], sort=False, as_index=False
        ).size()
        agg = runs.groupby("k", sort=False, as_index=False).agg(
            n_runs=("size", "size"), max_run=("size", "max"),
            n_samples=("size", "sum"),
        )
        agg["runs_ppm"] = (
            agg["n_runs"].to_numpy(dtype=np.int64) * 1_000_000
            // agg["n_samples"].to_numpy(dtype=np.int64)
        )
        out = agg.rename(columns={"k": "event_type"})[
            ["event_type", "n_samples", "n_runs", "max_run", "runs_ppm"]
        ]
        for c in ("n_samples", "n_runs", "max_run", "runs_ppm"):
            out[c] = out[c].astype(np.int64)
        return out

    return proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas")


RLE_SQL = """
WITH v AS (
  SELECT event_type, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), c AS (
  SELECT event_type, ts, event_id,
         CASE WHEN x = LAG(x) OVER w THEN 0 ELSE 1 END AS new_run
  FROM v WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), r AS (
  SELECT event_type,
         SUM(new_run) OVER (PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid
  FROM c
), runs AS (
  SELECT event_type, rid, COUNT(*) AS run_len
  FROM r GROUP BY 1, 2
)
SELECT event_type,
       CAST(SUM(run_len) AS BIGINT) AS n_samples,
       CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(MAX(run_len) AS BIGINT) AS max_run,
       CAST(COUNT(*) * 1000000 // SUM(run_len) AS BIGINT) AS runs_ppm
FROM runs GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# sliding-window rate limiter audit
# ---------------------------------------------------------------------------

_RL_WINDOW_US = 3_600_000_000  # 1 hour
_RL_LIMIT = 5


def q_rate_limit_rejections(sf_dir):
    """Sliding-window rate-limiter audit: an event is REJECTED when its
    user already has more than 5 events inside the trailing 1-hour
    window (RANGE frame semantics — every event with ts in
    [ts_i - 1h, ts_i] counts, including ts-peers). Per user the count is
    two searchsorted passes over the sorted ts array; one user
    hash-bucket shuffle; rejections reported per event_type."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
    from mimirsbrunn_ray.stages.rollup import tree_merge

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["ts"])),
                pc.is_valid(b["event_type"]),
            )
        )
        return add_bucket(b, "user_id", 64)

    proj = ev.map_batches(project, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_total": pd.Series([], dtype=np.int64),
                "n_rejected": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "ts"], kind="mergesort", ignore_index=True)
        u = g["user_id"].to_numpy(dtype=np.int64)
        tu = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        # composite-key searchsorted (the clicks_in_error_windows shape):
        # one vectorized pass for EVERY user — each user gets a disjoint
        # key band wide enough that the (ts - W) lower probe can't bleed
        # into the previous user's band
        rel = tu - tu.min()
        band = np.int64(rel.max()) + _RL_WINDOW_US + 2
        new_u = np.concatenate(([True], u[1:] != u[:-1]))
        urank = np.cumsum(new_u) - 1
        key = urank * band + rel
        cnt = np.searchsorted(key, key, side="right") - np.searchsorted(
            key, key - _RL_WINDOW_US, side="left"
        )
        rej = cnt > _RL_LIMIT
        out = pd.DataFrame(
            {"event_type": g["event_type"].to_numpy(), "rej": rej.astype(np.int64)}
        )
        agg = out.groupby("event_type", sort=False, as_index=False).agg(
            n_total=("rej", "size"), n_rejected=("rej", "sum")
        )
        for c in ("n_total", "n_rejected"):
            agg[c] = agg[c].astype(np.int64)
        return agg

    per_b = proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas")
    return tree_merge(
        per_b,
        lambda b: b.group_by(["event_type"])
        .aggregate([("n_total", "sum"), ("n_rejected", "sum")])
        .rename_columns(["event_type", "n_total", "n_rejected"]),
    )


RATELIMIT_SQL = f"""
WITH v AS (
  SELECT user_id, event_type, ts,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS cnt
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN cnt > {_RL_LIMIT} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rejected
FROM v GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Tukey-fence seasonal outliers per (type, hour-of-day)
# ---------------------------------------------------------------------------


def q_tukey_outliers_hourly(sf_dir):
    """Seasonal Tukey-fence outlier screen: per (event_type,
    hour-of-day) grain, Q1/Q3 by the PERCENTILE_DISC rank rule over a
    bounded (type, hod, x100) HISTOGRAM (the mad_outlier shape —
    cardinality bounded by types x 24 x distinct cents, never rows), and
    the outlier count with exact x4 integer fences (4v < 4*Q1 - 6*IQR or
    4v > 4*Q3 + 6*IQR, i.e. 1.5 IQR beyond the quartiles)."""
    from mimirsbrunn_ray.stages.rollup import tree_merge
    from mimirsbrunn_ray.stages.timeseries import _round_half_away_x

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"])),
                pc.is_valid(b["value"]),
            )
        )
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "hod": pc.hour(b["ts"]),
                "x": pa.array(x),
            }
        )
        return (
            t.group_by(["event_type", "hod", "x"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "hod", "x", "cnt"])
        )

    hist = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["event_type", "hod", "x"])
        .aggregate([("cnt", "sum")])
        .rename_columns(["event_type", "hod", "x", "cnt"]),
        final_shards=2,
        shard_cols=["event_type"],
    ).repartition(2)

    def per_grain(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "hod": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
                "q1_x100": pd.Series([], dtype=np.int64),
                "q3_x100": pd.Series([], dtype=np.int64),
                "n_outliers": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values("x", ignore_index=True)
        vals = g["x"].to_numpy(dtype=np.int64)
        cnt = g["cnt"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        # smallest v with cumulative count >= ceil(q*n)  (rollup.py:325)
        q1 = int(vals[np.searchsorted(cum, int(np.ceil(0.25 * n - 1e-9)))])
        q3 = int(vals[np.searchsorted(cum, int(np.ceil(0.75 * n - 1e-9)))])
        iqr = q3 - q1
        lo4, hi4 = 4 * q1 - 6 * iqr, 4 * q3 + 6 * iqr
        out_mask = (4 * vals < lo4) | (4 * vals > hi4)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "hod": np.array([g["hod"].iloc[0]], dtype=np.int64),
                "n": np.array([n], dtype=np.int64),
                "q1_x100": np.array([q1], dtype=np.int64),
                "q3_x100": np.array([q3], dtype=np.int64),
                "n_outliers": np.array([int(cnt[out_mask].sum())], dtype=np.int64),
            }
        )

    return hist.groupby(["event_type", "hod"]).map_groups(
        per_grain, batch_format="pandas"
    )


TUKEY_SQL = """
WITH v AS (
  SELECT event_type, hour(ts) AS hod,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), q AS (
  SELECT event_type, hod,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(quantile_disc(x, 0.25) AS BIGINT) AS q1_x100,
         CAST(quantile_disc(x, 0.75) AS BIGINT) AS q3_x100
  FROM v GROUP BY 1, 2
)
SELECT q.event_type, CAST(q.hod AS BIGINT) AS hod, q.n, q.q1_x100, q.q3_x100,
       CAST(SUM(CASE WHEN 4 * v.x < 4 * q.q1_x100 - 6 * (q.q3_x100 - q.q1_x100)
                       OR 4 * v.x > 4 * q.q3_x100 + 6 * (q.q3_x100 - q.q1_x100)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM v JOIN q ON v.event_type = q.event_type AND v.hod = q.hod
GROUP BY 1, 2, 3, 4, 5
"""


# ---------------------------------------------------------------------------
# first-order Markov transition matrix over event types
# ---------------------------------------------------------------------------


def q_event_type_markov(sf_dir):
    """First-order Markov transition matrix over event types: per user
    ordered by (ts, id), count (from_type -> to_type) transitions and
    the per-from-type probability in ppm (floor division). Output grain
    is bounded by #types^2; one user hash-bucket shuffle feeds exact
    per-bucket transition partials, tree-merged, then the row-normalize
    runs over the tiny matrix."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET
    from mimirsbrunn_ray.stages.rollup import tree_merge
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
                "from_type": pd.Series([], dtype=object),
                "to_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "user_id", "ts", "event_id")
        t = g["event_type"].to_numpy()
        frm = np.concatenate(([""], t[:-1]))[same]
        out = pd.DataFrame({"from_type": frm, "to_type": t[same]})
        if len(out) == 0:
            return empty
        agg = out.groupby(["from_type", "to_type"], sort=False, as_index=False).size()
        agg = agg.rename(columns={"size": "n"})
        agg["n"] = agg["n"].astype(np.int64)
        return agg

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )
    merged = tree_merge(
        partials,
        lambda b: b.group_by(["from_type", "to_type"])
        .aggregate([("n", "sum")])
        .rename_columns(["from_type", "to_type", "n"]),
    ).repartition(1)

    def normalize(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        tot = df.groupby("from_type")["n"].transform("sum").to_numpy(dtype=np.int64)
        df["p_ppm"] = df["n"].to_numpy(dtype=np.int64) * 1_000_000 // tot
        df["p_ppm"] = df["p_ppm"].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    return merged.map_batches(normalize, batch_format="pyarrow", batch_size=None)


MARKOV_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
), t AS (
  SELECT prev_type AS from_type, event_type AS to_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM s WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
         AS p_ppm
FROM t
"""


def register_r4h(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "value_run_lengths": q_value_run_lengths,
            "rate_limit_rejections": q_rate_limit_rejections,
            "tukey_outliers_hourly": q_tukey_outliers_hourly,
            "event_type_markov": q_event_type_markov,
        }
    )
    oracles.update(
        {
            "value_run_lengths": RLE_SQL,
            "rate_limit_rejections": RATELIMIT_SQL,
            "tukey_outliers_hourly": TUKEY_SQL,
            "event_type_markov": MARKOV_SQL,
        }
    )
