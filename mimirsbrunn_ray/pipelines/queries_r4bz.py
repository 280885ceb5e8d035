"""Round-4 batch BZ: Allan variance of the 1m tier, multi-window SLO
burn-rate alerting, and the daily rescaled-range (Hurst R/S numerator).

Exactness discipline: bucket means snap to x100 fixed point through the
identical exact-int-sum -> one double division -> ROUND half away from
zero both engines evaluate; everything downstream of the snap is pure
int64 (squared diffs, cross-multiplied burn comparisons, the n-scaled
cumulative-deviation range), so no float accumulation order can differ.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.functions.timeutil import trunc_us
from mimirsbrunn_ray.stages.rollup import tree_merge
from mimirsbrunn_ray.stages.timeseries import (
    _project_series,
    _round_half_away_x,
    _series_segments,
)

_MIN_US = 60_000_000
_HOUR_US = 3_600_000_000


def _clean(b: pa.Table, cols: tuple[str, ...]) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# Allan variance over adjacent 1m bucket means
# ---------------------------------------------------------------------------


def q_allan_variance_per_type(sf_dir):
    """Per event type: the Allan-variance sufficient statistics over its
    1-minute tier — count of ADJACENT minute pairs and the exact int64
    sum of squared successive bucket-mean differences (Allan variance =
    sum / (2 * n_pairs); the clock-stability statistic a metrics store
    computes over gauge series, here on the same 1m tier the rollup
    engine already maintains). Combiner-first (type, minute) partials,
    then a per-type ordered scan over its bounded minute series; pairs
    separated by a gap (missing minute) contribute nothing, so the
    statistic is gap-robust by construction."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts", "value"))
        ts_us = (
            b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64),
            100.0,
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "m": pa.array(trunc_us(ts_us, "1m")),
                "n": pa.array(np.ones(len(x), dtype=np.int64)),
                "s": pa.array(x),
            }
        )
        g = t.group_by(["event_type", "m"]).aggregate(
            [("n", "sum"), ("s", "sum")]
        )
        g = g.select(["event_type", "m", "n_sum", "s_sum"])
        return g.rename_columns(["event_type", "m", "n", "s"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "m"]).aggregate(
            [("n", "sum"), ("s", "sum")]
        )
        g = g.select(["event_type", "m", "n_sum", "s_sum"])
        return g.rename_columns(["event_type", "m", "n", "s"])

    tier = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["event_type", "m"],
    )

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_pairs": pd.Series([], dtype=np.int64),
                "sum_sq_diff": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values("m", kind="mergesort", ignore_index=True)
        n = g["n"].to_numpy(dtype=np.int64)
        s = g["s"].to_numpy(dtype=np.int64)
        mean = _round_half_away_x(s.astype(np.float64) / n, 1.0)
        m = g["m"].to_numpy(dtype=np.int64)
        adj = (m[1:] - m[:-1]) == _MIN_US
        d = mean[1:] - mean[:-1]
        npairs = int(adj.sum())
        if npairs == 0:
            return empty
        return pd.DataFrame(
            {
                "event_type": [g.iloc[0]["event_type"]],
                "n_pairs": np.array([npairs], dtype=np.int64),
                "sum_sq_diff": np.array(
                    [int((d[adj] * d[adj]).sum())], dtype=np.int64
                ),
            }
        )

    return tier.groupby("event_type").map_groups(
        per_type, batch_format="pandas"
    )


ALLAN_SQL = """
WITH t AS (
  SELECT event_type, date_trunc('minute', ts) AS m,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS s
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), mm AS (
  SELECT event_type, m,
         CAST(ROUND(CAST(s AS DOUBLE) / n, 0) AS BIGINT) AS mean_x100
  FROM t
), d AS (
  SELECT event_type, m, mean_x100,
         LAG(m) OVER (PARTITION BY event_type ORDER BY m) AS pm,
         LAG(mean_x100) OVER (PARTITION BY event_type ORDER BY m) AS pv
  FROM mm
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM((mean_x100 - pv) * (mean_x100 - pv)) AS BIGINT)
         AS sum_sq_diff
FROM d
WHERE pm IS NOT NULL AND m = pm + INTERVAL 1 MINUTE
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# multi-window SLO burn-rate alerting (Google SRE shape)
# ---------------------------------------------------------------------------


def q_slo_burn_multiwindow(sf_dir):
    """Hourly SLO burn-rate alert audit: per observed hour, error / total
    counts for the hour itself AND the trailing 6-hour window, plus the
    multi-window page condition (both windows burning > 6x a 0.1%% error
    SLO — the Google SRE workbook's paired long/short-window rule, which
    suppresses pages for short blips AND for long-recovered incidents).
    The burn comparison is cross-multiplied integers (err * 1000 >
    6 * tot), so no float ratio is compared. One combiner-first pass to
    the hour tier (bounded by the run's ingest window, the engine's
    documented tier model); the trailing window is a searchsorted prefix
    sum over that bounded tier."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts"))
        ts_us = (
            b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        err = pc.equal(b["event_type"], "error").cast(pa.int64())
        t = pa.table(
            {
                "h": pa.array(trunc_us(ts_us, "1h")),
                "tot": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "err": err,
            }
        )
        g = t.group_by(["h"]).aggregate([("tot", "sum"), ("err", "sum")])
        g = g.select(["h", "tot_sum", "err_sum"])
        return g.rename_columns(["h", "tot", "err"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["h"]).aggregate([("tot", "sum"), ("err", "sum")])
        g = g.select(["h", "tot_sum", "err_sum"])
        return g.rename_columns(["h", "tot", "err"])

    tier = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: one row per observed hour in the window

    if not len(tier) or "h" not in tier.columns:
        return pa.table(
            {
                "h": pa.array([], pa.timestamp("us")),
                "err_1h": pa.array([], pa.int64()),
                "tot_1h": pa.array([], pa.int64()),
                "err_6h": pa.array([], pa.int64()),
                "tot_6h": pa.array([], pa.int64()),
                "page_alert": pa.array([], pa.int64()),
            }
        )
    tier = tier.sort_values("h", ignore_index=True)
    h = tier["h"].to_numpy(dtype=np.int64)
    tot = tier["tot"].to_numpy(dtype=np.int64)
    err = tier["err"].to_numpy(dtype=np.int64)
    ctot = np.concatenate([[0], np.cumsum(tot)])
    cerr = np.concatenate([[0], np.cumsum(err)])
    # trailing window covers hours in (h - 6h, h]: first index with
    # bucket start > h - 6h
    lo = np.searchsorted(h, h - 5 * _HOUR_US, side="left")
    idx = np.arange(1, len(h) + 1)
    tot6 = ctot[idx] - ctot[lo]
    err6 = cerr[idx] - cerr[lo]
    page = ((err * 1000 > 6 * tot) & (err6 * 1000 > 6 * tot6)).astype(
        np.int64
    )
    return pa.table(
        {
            "h": pa.array(h, pa.timestamp("us")),
            "err_1h": pa.array(err),
            "tot_1h": pa.array(tot),
            "err_6h": pa.array(err6),
            "tot_6h": pa.array(tot6),
            "page_alert": pa.array(page),
        }
    )


SLO_BURN_SQL = """
WITH t AS (
  SELECT date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS tot,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS err
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
), w AS (
  SELECT h, err AS err_1h, tot AS tot_1h,
         CAST(SUM(err) OVER (ORDER BY h RANGE BETWEEN INTERVAL 5 HOUR
           PRECEDING AND CURRENT ROW) AS BIGINT) AS err_6h,
         CAST(SUM(tot) OVER (ORDER BY h RANGE BETWEEN INTERVAL 5 HOUR
           PRECEDING AND CURRENT ROW) AS BIGINT) AS tot_6h
  FROM t
)
SELECT h, err_1h, tot_1h, err_6h, tot_6h,
       CAST(CASE WHEN err_1h * 1000 > 6 * tot_1h
                  AND err_6h * 1000 > 6 * tot_6h
            THEN 1 ELSE 0 END AS BIGINT) AS page_alert
FROM w
"""


# ---------------------------------------------------------------------------
# daily rescaled range (Hurst R/S numerator, exact n-scaled form)
# ---------------------------------------------------------------------------


def q_rescaled_range_daily(sf_dir):
    """Per (event type, day): the rescaled-range numerator R of Hurst
    analysis over the (ts, id)-ordered x100 value series — computed in
    the EXACT n-scaled integer form r_times_n = max_k(n*S_k - k*S_n) -
    min_k(n*S_k - k*S_n), which equals n * (max - min cumulative
    deviation from the day mean) without ever forming the fractional
    mean. One series hash-bucket shuffle (the max_drawdown shape); each
    (type, day) segment resolves wholly inside its bucket."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    proj = _project_series(ev, "event_type", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "day": pd.Series([], dtype="datetime64[us]"),
                "n_samples": pd.Series([], dtype=np.int64),
                "r_times_n": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, _same = _series_segments(g, "event_type", "ts", "event_id")
        day = g["ts"].to_numpy().astype("datetime64[D]")
        x = _round_half_away_x(g["value"].to_numpy(dtype=np.float64), 100.0)
        t = pd.DataFrame(
            {"k": g["event_type"].to_numpy(), "day": day, "x": x}
        )
        grp = t.groupby(["k", "day"], sort=False)
        sk = grp["x"].cumsum().to_numpy(dtype=np.int64)
        pos = grp.cumcount().to_numpy(dtype=np.int64) + 1
        sn = grp["x"].transform("sum").to_numpy(dtype=np.int64)
        n = grp["x"].transform("size").to_numpy(dtype=np.int64)
        dk = n * sk - pos * sn
        t["dk"] = dk
        agg = t.groupby(["k", "day"], sort=False, as_index=False).agg(
            n_samples=("x", "size"),
            dmax=("dk", "max"),
            dmin=("dk", "min"),
        )
        out = pd.DataFrame(
            {
                "event_type": agg["k"],
                "day": agg["day"].astype("datetime64[us]"),
                "n_samples": agg["n_samples"].astype(np.int64),
                "r_times_n": (agg["dmax"] - agg["dmin"]).astype(np.int64),
            }
        )
        return out

    from mimirsbrunn_ray.stages.dedup import _BUCKET

    return proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas")


RS_SQL = """
WITH v AS (
  SELECT event_type, date_trunc('day', ts) AS d, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), w AS (
  SELECT event_type, d,
         CAST(SUM(x) OVER (PARTITION BY event_type, d ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sk,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type, d
           ORDER BY ts, event_id) AS BIGINT) AS k,
         CAST(SUM(x) OVER (PARTITION BY event_type, d) AS BIGINT) AS sn,
         CAST(COUNT(*) OVER (PARTITION BY event_type, d) AS BIGINT) AS n
  FROM v
)
SELECT event_type, d AS day,
       CAST(MAX(n) AS BIGINT) AS n_samples,
       CAST(MAX(n * sk - k * sn) - MIN(n * sk - k * sn) AS BIGINT)
         AS r_times_n
FROM w GROUP BY 1, 2
"""


def register_r4bz(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "allan_variance_per_type": q_allan_variance_per_type,
            "slo_burn_multiwindow": q_slo_burn_multiwindow,
            "rescaled_range_daily": q_rescaled_range_daily,
        }
    )
    oracles.update(
        {
            "allan_variance_per_type": ALLAN_SQL,
            "slo_burn_multiwindow": SLO_BURN_SQL,
            "rescaled_range_daily": RS_SQL,
        }
    )
