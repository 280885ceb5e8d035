"""Round-4 batch CN: PromQL-style subquery composition
(max_over_time of 5m averages per hour), Gorilla delta-of-delta
timestamp-compression bit audit, and counter resets() per type.

TSDB-flavored shapes tied to the north-star tiering engine: the
subquery is the two-level window composition continuous aggregates
exist to serve; the DoD bit audit measures exactly how compressible
each type's timestamp stream is under the Gorilla scheme the compress
stage uses (stages/compress.py); resets() is the counter-wraparound
primitive. Exactness: all folds are exact int64 (x100 sums, counts,
bit totals); the only doubles are per-bucket averages computed from
IDENTICAL exact integers on both sides, so the mirrored division is
bit-equal.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET
from mimirsbrunn_ray.stages.rollup import tree_merge
from mimirsbrunn_ray.stages.timeseries import (
    _project_series,
    _round_half_away_x,
    _series_segments,
)

_5M_US = 300_000_000
_HOUR_US = 3_600_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


def _clean(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# PromQL subquery: max_over_time(avg_over_time(value[5m])[1h])
# ---------------------------------------------------------------------------


def q_max_avg5m_hourly(sf_dir):
    """Per (event type, hour): the MAXIMUM of the 5-minute average
    values inside that hour — the PromQL subquery composition
    ``max_over_time(avg_over_time(metric[5m])[1h:5m])`` that continuous
    aggregates exist to serve (coarse tier folds of a finer tier's
    averages). The 5m tier folds exact (sum_x100, count) int64 partials
    in ONE combiner-first pass; the hour fold takes the max of the
    per-bucket double divisions — both sides divide the IDENTICAL exact
    integers, so the mirrored max is bit-equal. Output keeps the hour
    as int64 epoch-microseconds; the max average snaps x1e6 in original
    value units."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        b5 = (us // _5M_US) * _5M_US
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "b5": pa.array(b5),
                "s": pa.array(x),
                "cnt": pa.array(np.ones(len(x), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "b5"], ["s", "cnt"])

    fine = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "b5"], ["s", "cnt"]),
    )

    def to_hour_max(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy()
        cnt = b["cnt"].to_numpy()
        avg = s.astype(np.float64) / (100 * cnt)
        bh = (b["b5"].to_numpy() // _HOUR_US) * _HOUR_US
        t = pa.table(
            {
                "event_type": b["event_type"],
                "bucket_us": pa.array(bh),
                "mx": pa.array(avg),
            }
        )
        g = t.group_by(["event_type", "bucket_us"]).aggregate([("mx", "max")])
        return g.select(["event_type", "bucket_us", "mx_max"]).rename_columns(
            ["event_type", "bucket_us", "mx"]
        )

    # the 5m tier is bounded (types x 5m buckets) but still distributed:
    # per-block hour maxes tree-merge with a max combiner
    def mcombine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "bucket_us"]).aggregate([("mx", "max")])
        return g.select(["event_type", "bucket_us", "mx_max"]).rename_columns(
            ["event_type", "bucket_us", "mx"]
        )

    out = tree_merge(
        fine.map_batches(to_hour_max, batch_format="pyarrow", batch_size=None),
        mcombine,
    ).to_pandas()
    if not len(out) or "event_type" not in out.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "bucket_us": pa.array([], pa.int64()),
                "max_avg5m_x1e6": pa.array([], pa.int64()),
            }
        )
    out = out.sort_values(["event_type", "bucket_us"], ignore_index=True)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"].tolist(), pa.string()),
            "bucket_us": pa.array(out["bucket_us"].to_numpy(dtype=np.int64)),
            "max_avg5m_x1e6": pa.array(
                _round_half_away(out["mx"].to_numpy(dtype=np.float64) * 1e6)
            ),
        }
    )


MAX_AVG5M_SQL = """
WITH f AS (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 300000000) AS BIGINT) * 300000000 AS b5,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
)
SELECT event_type,
       CAST(FLOOR(b5 / 3600000000) AS BIGINT) * 3600000000 AS bucket_us,
       CAST(ROUND(MAX(CAST(s AS DOUBLE) / (100 * cnt)) * 1000000, 0)
            AS BIGINT) AS max_avg5m_x1e6
FROM f GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Gorilla delta-of-delta timestamp compression bit audit
# ---------------------------------------------------------------------------

# Facebook Gorilla paper (Pelkonen et al., VLDB 2015) timestamp buckets:
# dod == 0 -> 1 bit; [-63,64] -> 9; [-255,256] -> 12; [-2047,2048] -> 16;
# else 36 bits. We audit in SECONDS grain (the paper's grain).


def q_dod_compression_bits(sf_dir):
    """Per event type: exactly how many bits the Gorilla delta-of-delta
    scheme needs for the type's ordered SECOND-grain timestamp stream —
    the compressibility audit for the tiering engine's compress stage
    (stages/compress.py implements this scheme; this query measures the
    win on real data: bits_per_point ~ 1-2 means near-ideal regular
    spacing). First point costs 64 bits, second 64+14 (header delta),
    every later point the paper's bucket width of dod = (t_i - t_{i-1})
    - (t_{i-1} - t_{i-2}). One series-key hash shuffle; double-lag masks
    keep triples inside one series; all counts/bits exact int64."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "event_id"]
    ).map_batches(
        lambda b: b.append_column(
            "value", pa.array(np.zeros(b.num_rows, np.float64))
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    proj = _project_series(ev, "event_type", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "bits": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "event_type", "ts", "event_id")
        t_s = (
            g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 1_000_000
        )
        n = len(g)
        dt = np.zeros(n, dtype=np.int64)
        dt[1:] = t_s[1:] - t_s[:-1]
        same2 = np.zeros(n, dtype=bool)  # row has BOTH predecessors
        same2[1:] = same[1:] & same[:-1]
        dod = np.zeros(n, dtype=np.int64)
        dod[1:] = dt[1:] - dt[:-1]
        bits = np.where(
            dod == 0,
            1,
            np.where(
                (dod >= -63) & (dod <= 64),
                9,
                np.where(
                    (dod >= -255) & (dod <= 256),
                    12,
                    np.where((dod >= -2047) & (dod <= 2048), 16, 36),
                ),
            ),
        ).astype(np.int64)
        is_first = ~same  # series head: 64-bit header timestamp
        is_second = same & ~same2  # first delta: 14-bit field
        per_row = np.where(is_first, 64, np.where(is_second, 14, bits))
        out = pd.DataFrame({"event_type": g["event_type"], "b": per_row})
        a = out.groupby("event_type", sort=False)["b"].agg(
            n="size", bits="sum"
        )
        return a.reset_index().astype({"n": np.int64, "bits": np.int64})

    stats = (
        proj.groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )  # bounded: one row per type (each type lives in one bucket)
    if not len(stats) or "event_type" not in stats.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "bits": pa.array([], pa.int64()),
                "bits_per_point_x1e6": pa.array([], pa.int64()),
            }
        )
    stats = stats.sort_values("event_type", ignore_index=True)
    n = stats["n"].to_numpy(dtype=np.int64)
    bits = stats["bits"].to_numpy(dtype=np.int64)
    bpp = _round_half_away(bits.astype(np.float64) / n * 1e6)
    return pa.table(
        {
            "event_type": pa.array(stats["event_type"].tolist(), pa.string()),
            "n": pa.array(n),
            "bits": pa.array(bits),
            "bits_per_point_x1e6": pa.array(bpp),
        }
    )


DOD_BITS_SQL = """
WITH v AS (
  SELECT event_type, ts, event_id,
         CAST(FLOOR(EPOCH_US(ts) / 1000000) AS BIGINT) AS t_s
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
), lagd AS (
  SELECT event_type, t_s,
         t_s - LAG(t_s) OVER w AS dt,
         LAG(t_s) OVER w - LAG(t_s, 2) OVER w AS dt_prev
  FROM v WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), bitsed AS (
  SELECT event_type,
         CASE WHEN dt IS NULL THEN 64
              WHEN dt_prev IS NULL THEN 14
              WHEN dt - dt_prev = 0 THEN 1
              WHEN dt - dt_prev BETWEEN -63 AND 64 THEN 9
              WHEN dt - dt_prev BETWEEN -255 AND 256 THEN 12
              WHEN dt - dt_prev BETWEEN -2047 AND 2048 THEN 16
              ELSE 36 END AS b
  FROM lagd
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(b) AS BIGINT) AS bits,
       CAST(ROUND(CAST(SUM(b) AS DOUBLE) / COUNT(*) * 1000000, 0)
            AS BIGINT) AS bits_per_point_x1e6
FROM bitsed GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# PromQL resets(): counter decreases per type
# ---------------------------------------------------------------------------


def q_counter_resets_per_type(sf_dir):
    """Per event type: PromQL ``resets()`` — the number of times the
    ordered x100-quantized value series strictly DECREASES, i.e. the
    counter-wraparound/restart count that decides whether a series can
    be treated with counter semantics (resets ~ 0) or is a gauge. One
    series-key hash shuffle; the lag never crosses partitions because a
    type's series is contiguous in its bucket; exact int64 compares
    only."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    proj = _project_series(ev, "event_type", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "resets": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "event_type", "ts", "event_id")
        x = _round_half_away_x(g["value"].to_numpy(dtype=np.float64), 100.0)
        drop = np.zeros(len(g), dtype=np.int64)
        drop[1:] = (x[1:] < x[:-1]).astype(np.int64)
        drop = np.where(same, drop, 0)
        out = pd.DataFrame({"event_type": g["event_type"], "d": drop})
        a = out.groupby("event_type", sort=False)["d"].agg(
            n="size", resets="sum"
        )
        return a.reset_index().astype({"n": np.int64, "resets": np.int64})

    stats = (
        proj.groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(stats) or "event_type" not in stats.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "resets": pa.array([], pa.int64()),
            }
        )
    stats = stats.sort_values("event_type", ignore_index=True)
    return pa.table(
        {
            "event_type": pa.array(stats["event_type"].tolist(), pa.string()),
            "n": pa.array(stats["n"].to_numpy(dtype=np.int64)),
            "resets": pa.array(stats["resets"].to_numpy(dtype=np.int64)),
        }
    )


RESETS_SQL = """
WITH v AS (
  SELECT event_type, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), lagd AS (
  SELECT event_type,
         CASE WHEN x < LAG(x) OVER (PARTITION BY event_type
                                    ORDER BY ts, event_id)
              THEN 1 ELSE 0 END AS d
  FROM v
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(d) AS BIGINT) AS resets
FROM lagd GROUP BY 1 ORDER BY 1
"""


def register_r4cn(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "max_avg5m_hourly": q_max_avg5m_hourly,
            "dod_compression_bits": q_dod_compression_bits,
            "counter_resets_per_type": q_counter_resets_per_type,
        }
    )
    oracles.update(
        {
            "max_avg5m_hourly": MAX_AVG5M_SQL,
            "dod_compression_bits": DOD_BITS_SQL,
            "counter_resets_per_type": RESETS_SQL,
        }
    )
