"""Round-4 batch G: streaming/metrics-store operators — hysteresis alert
state machine, watermark-lateness audit over a deterministic arrival
permutation, PSI value-drift between time halves, and Theil-Sen robust
trend over hourly means.

Exactness discipline: x100 per-term quantization; state machines and
prefix maxima over exact int64 microseconds; single-expression float
terms snapped to int64 fixed point per BUCKET before any distributed
sum; sign-aware truncating integer division mirroring DuckDB's `//`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# ---------------------------------------------------------------------------
# hysteresis alert transitions
# ---------------------------------------------------------------------------

_ALERT_HI = 15000  # x100: fires at >= 150.00
_ALERT_LO = 7500   # x100: clears at <= 75.00


def q_alert_transitions(sf_dir):
    """Two-threshold hysteresis alerting per event type
    (stages/timeseries.alert_transitions): rising/falling transition
    counts + total LOCF time-in-alert, starting OFF."""
    from mimirsbrunn_ray.stages.timeseries import alert_transitions

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    return alert_transitions(
        ev, key="event_type", hi_x100=_ALERT_HI, lo_x100=_ALERT_LO
    )


ALERT_SQL = f"""
WITH v AS (
  SELECT event_type, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), m AS (
  SELECT *, CASE WHEN x >= {_ALERT_HI} THEN 1
                 WHEN x <= {_ALERT_LO} THEN 0 END AS marker
  FROM v
), s AS (
  SELECT event_type, ts, event_id,
         COALESCE(last_value(marker IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS state
  FROM m
), t AS (
  SELECT event_type, ts, state,
         COALESCE(LAG(state) OVER w, 0) AS prev_state,
         LAG(ts) OVER w AS prev_ts
  FROM s
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(CASE WHEN state = 1 AND prev_state = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_rising,
       CAST(SUM(CASE WHEN state = 0 AND prev_state = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_falling,
       CAST(COALESCE(SUM(CASE WHEN prev_state = 1
            THEN datediff('microsecond', prev_ts, ts) END), 0)
            AS BIGINT) AS alert_us
FROM t GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# watermark lateness audit
# ---------------------------------------------------------------------------

_LATENESS_US = 7 * 24 * 3600 * 1_000_000  # 7 days allowed lateness


def q_late_events_watermark(sf_dir):
    """Watermark-lateness audit (stages/timeseries.watermark_late):
    replay in deterministic arrival order (multiplicative-hash
    permutation of event_id), watermark = running max event ts; late
    when arriving > 7 days behind the watermark. Distributed as a
    two-pass range prefix-max — no global sort."""
    from mimirsbrunn_ray.stages.timeseries import watermark_late

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "event_id"]
    )
    return watermark_late(ev, key="event_type", lateness_us=_LATENESS_US)


WATERMARK_SQL = f"""
WITH v AS (
  SELECT event_type, ts,
         (event_id * 2654435761) % 4294967296 AS ak
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
), w AS (
  SELECT event_type,
         epoch_us(max(ts) OVER (ORDER BY ak
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
           - epoch_us(ts) AS late_us
  FROM v
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN late_us > {_LATENESS_US} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late,
       CAST(COALESCE(MAX(CASE WHEN late_us > {_LATENESS_US}
            THEN late_us END), 0) AS BIGINT) AS max_late_us
FROM w GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# PSI value drift between time halves
# ---------------------------------------------------------------------------


def q_psi_value_drift(sf_dir):
    """Population-stability-index drift per event type between the first
    and second half of the observed time range, over log2(x100) value
    buckets. Counts are exact integers (combiner-first partials); each
    bucket's PSI term is ONE identical float expression on both sides,
    snapped x1e9 per bucket BEFORE the (integer) sum, so the distributed
    total is bit-equal to the oracle's. Types appear when both halves
    share >= 1 bucket."""
    from mimirsbrunn_ray.stages.rollup import tree_merge
    from mimirsbrunn_ray.stages.timeseries import _round_half_away_x

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"])),
                pc.is_valid(b["value"]),
            )
        )
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        pos = x > 0
        return pa.table(
            {
                "event_type": b["event_type"].filter(pa.array(pos)),
                "tu": pc.cast(
                    pc.cast(b["ts"], pa.timestamp("us")), pa.int64()
                ).filter(pa.array(pos)),
                "bucket": pa.array(
                    np.floor(np.log2(x[pos].astype(np.float64))).astype(np.int64)
                ),
            }
        )

    proj = ev.map_batches(project, batch_format="pyarrow", batch_size=None)

    # global time midpoint (exact integer us) — tiny streaming aggregate
    from ray.data.aggregate import Max, Min

    mm = proj.aggregate(Min("tu"), Max("tu"))
    if mm is None or mm.get("min(tu)") is None:  # empty corpus
        # typed table, not an empty Dataset (which drops its schema)
        return pa.table(
            {
                "event_type": pa.array([], type=pa.string()),
                "n_first": pa.array([], type=pa.int64()),
                "n_second": pa.array([], type=pa.int64()),
                "n_buckets_common": pa.array([], type=pa.int64()),
                "psi_x1e6": pa.array([], type=pa.int64()),
            }
        )
    mid = (mm["min(tu)"] + mm["max(tu)"]) // 2

    def partial(b: pa.Table) -> pa.Table:
        half = pc.if_else(pc.less_equal(b["tu"], mid), 0, 1)
        t = pa.table(
            {"event_type": b["event_type"], "half": half, "bucket": b["bucket"]}
        )
        return (
            t.group_by(["event_type", "half", "bucket"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "half", "bucket", "cnt"])
        )

    counts = tree_merge(
        proj.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["event_type", "half", "bucket"])
        .aggregate([("cnt", "sum")])
        .rename_columns(["event_type", "half", "bucket", "cnt"]),
        final_shards=2,
        shard_cols=["event_type"],
    ).repartition(2)

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_first": pd.Series([], dtype=np.int64),
                "n_second": pd.Series([], dtype=np.int64),
                "n_buckets_common": pd.Series([], dtype=np.int64),
                "psi_x1e6": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        h0 = g[g["half"] == 0].set_index("bucket")["cnt"]
        h1 = g[g["half"] == 1].set_index("bucket")["cnt"]
        n1, n2 = int(h0.sum()), int(h1.sum())
        common = h0.index.intersection(h1.index)
        if n1 == 0 or n2 == 0 or len(common) == 0:
            return empty
        c1 = h0.loc[common].to_numpy(dtype=np.float64)
        c2 = h1.loc[common].to_numpy(dtype=np.float64)
        # identical float expression as the oracle, per bucket
        term = (c1 / n1 - c2 / n2) * np.log((c1 * n2) / (c2 * n1))
        term_x1e9 = _round_half_away_x(term, 1e9)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_first": np.array([n1], dtype=np.int64),
                "n_second": np.array([n2], dtype=np.int64),
                "n_buckets_common": np.array([len(common)], dtype=np.int64),
                "psi_x1e6": np.array(
                    [int(term_x1e9.sum()) // 1000], dtype=np.int64
                ),
            }
        )

    return counts.groupby("event_type").map_groups(
        per_type, batch_format="pandas"
    )


PSI_SQL = """
WITH v AS (
  SELECT event_type, epoch_us(ts) AS tu,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
    AND CAST(ROUND(value * 100, 0) AS BIGINT) > 0
), mid AS (
  SELECT (MIN(tu) + MAX(tu)) // 2 AS m FROM v
), c AS (
  SELECT event_type,
         CASE WHEN tu <= (SELECT m FROM mid) THEN 0 ELSE 1 END AS half,
         CAST(FLOOR(log2(x)) AS BIGINT) AS bucket,
         COUNT(*) AS cnt
  FROM v GROUP BY 1, 2, 3
), n AS (
  SELECT event_type,
         SUM(CASE WHEN half = 0 THEN cnt END) AS n1,
         SUM(CASE WHEN half = 1 THEN cnt END) AS n2
  FROM c GROUP BY 1
), p AS (
  SELECT a.event_type, a.cnt AS c1, b.cnt AS c2, n.n1, n.n2
  FROM c a
  JOIN c b ON a.event_type = b.event_type AND a.bucket = b.bucket
          AND a.half = 0 AND b.half = 1
  JOIN n ON n.event_type = a.event_type
)
SELECT event_type,
       CAST(MAX(n1) AS BIGINT) AS n_first,
       CAST(MAX(n2) AS BIGINT) AS n_second,
       CAST(COUNT(*) AS BIGINT) AS n_buckets_common,
       CAST(SUM(CAST(ROUND(
         (CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2)
         * ln((CAST(c1 AS DOUBLE) * n2) / (CAST(c2 AS DOUBLE) * n1))
         * 1000000000, 0) AS BIGINT)) // 1000 AS BIGINT) AS psi_x1e6
FROM p GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Theil-Sen robust trend per type over hourly means
# ---------------------------------------------------------------------------


def q_theilsen_trend(sf_dir):
    """Theil-Sen robust slope per event type over hourly mean values:
    hourly means as exact floor-divided x100 integers (combiner-first
    (type, hour) grain — bounded by #types x hours, NOT input rows), all
    O(hours^2) pairwise slopes per type as sign-aware truncating integer
    ppm-per-hour, median emitted x2 (always integer). The pair stage is
    bounded by the time range, so it runs inside one group per type."""
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
        hu = pc.divide(
            pc.cast(pc.floor_temporal(b["ts"], unit="hour"), pa.int64()),
            3_600_000_000,
        )
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table({"event_type": b["event_type"], "hu": hu, "x": pa.array(x)})
        g = (
            t.group_by(["event_type", "hu"])
            .aggregate([("x", "sum"), ([], "count_all")])
            .rename_columns(["event_type", "hu", "sx", "n"])
        )
        return g

    hourly = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["event_type", "hu"])
        .aggregate([("sx", "sum"), ("n", "sum")])
        .rename_columns(["event_type", "hu", "sx", "n"]),
        final_shards=2,
        shard_cols=["event_type"],
    ).repartition(2)

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_hours": pd.Series([], dtype=np.int64),
                "slope_med_x2ppm": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values("hu", ignore_index=True)
        hu = g["hu"].to_numpy(dtype=np.int64)
        mean = g["sx"].to_numpy(dtype=np.int64) // g["n"].to_numpy(dtype=np.int64)
        if len(hu) < 2:
            return empty
        i, j = np.triu_indices(len(hu), k=1)
        num = (mean[j] - mean[i]) * 1_000_000
        den = hu[j] - hu[i]
        # DuckDB's // truncates toward zero; numpy's floors — mirror trunc
        slope = np.sign(num) * (np.abs(num) // den)
        med2 = _round_half_away_x(np.array([np.median(slope)]), 2.0)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_hours": np.array([len(hu)], dtype=np.int64),
                "slope_med_x2ppm": med2,
            }
        )

    return hourly.groupby("event_type").map_groups(
        per_type, batch_format="pandas"
    )


THEILSEN_SQL = """
WITH h AS (
  SELECT event_type,
         epoch_us(date_trunc('hour', ts)) // 3600000000 AS hu,
         SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
           // COUNT(*) AS mean_x100
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), s AS (
  SELECT a.event_type,
         ((b.mean_x100 - a.mean_x100) * 1000000) // (b.hu - a.hu) AS slope
  FROM h a JOIN h b ON a.event_type = b.event_type AND b.hu > a.hu
)
SELECT s.event_type,
       CAST((SELECT COUNT(*) FROM h WHERE h.event_type = s.event_type)
            AS BIGINT) AS n_hours,
       CAST(ROUND(MEDIAN(slope) * 2, 0) AS BIGINT) AS slope_med_x2ppm
FROM s GROUP BY s.event_type
"""


def register_r4g(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "alert_transitions": q_alert_transitions,
            "late_events_watermark": q_late_events_watermark,
            "psi_value_drift": q_psi_value_drift,
            "theilsen_trend_per_type": q_theilsen_trend,
        }
    )
    oracles.update(
        {
            "alert_transitions": ALERT_SQL,
            "late_events_watermark": WATERMARK_SQL,
            "psi_value_drift": PSI_SQL,
            "theilsen_trend_per_type": THEILSEN_SQL,
        }
    )
