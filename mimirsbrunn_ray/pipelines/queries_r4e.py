"""Round-4 batch E: metrics-store ordered-series analytics (LOCF
time-weighted average, lag-k autocorrelation, cumulative-deviation
anomaly counts, coverage/SLA), distributed connected components over the
dependency edge set, and per-source Zipf slope.

Exactness discipline (SURVEY.md §6): every distributed SUM is over int64
fixed-point terms quantized BEFORE summation; ratios are either emitted
as separate integer numerator/denominator columns (TWA, SLA ppm via
floor division) or computed as ONE float expression from identical
integer moments on both sides and snapped x1e6 (ACF, Zipf slope).

Reference parity notes: the TWA/coverage/anomaly operators extend the
reference's per-run import counters (/root/reference/libs/mimir/src/
rubber.rs:413-452) to the gap-aware series reductions a metrics store
needs; connected components reuses the same distributed min-label
propagation that backs near-dup clustering (stages/neardup.py:299),
here oracled EXACTLY by a recursive-CTE reachability fixpoint.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# ---------------------------------------------------------------------------
# LOCF time-weighted average per user
# ---------------------------------------------------------------------------


def q_time_weighted_avg(sf_dir):
    """LOCF time-weighted average per user over its observed span —
    integer numerator/denominator columns, no float division
    (stages/timeseries.time_weighted_avg)."""
    from mimirsbrunn_ray.stages.timeseries import time_weighted_avg

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    )
    return time_weighted_avg(ev, key="user_id")


TWA_SQL = """
WITH d AS (
  SELECT user_id, ts, value,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nts
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(EPOCH_US(nts) - EPOCH_US(ts)) AS BIGINT) AS span_us,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)
                * (EPOCH_US(nts) - EPOCH_US(ts))) AS BIGINT) AS twa_num_x100
FROM d
WHERE nts IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# lag-k autocorrelation per event type
# ---------------------------------------------------------------------------


def q_acf_value_by_type(sf_dir):
    """Lag-1/2/3 autocorrelation of the x100 value series per event type
    (stages/timeseries.acf_lags: int64 moments, one snapped float)."""
    from mimirsbrunn_ray.stages.timeseries import acf_lags

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    return acf_lags(ev, key="event_type", lags=(1, 2, 3))


ACF_SQL = """
WITH b AS (
  SELECT event_type, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), pairs AS (
  SELECT event_type, l.lag, x AS xi,
         CASE l.lag WHEN 1 THEN LAG(x, 1) OVER w
                    WHEN 2 THEN LAG(x, 2) OVER w
                    ELSE LAG(x, 3) OVER w END AS xj
  FROM b CROSS JOIN (VALUES (1), (2), (3)) AS l(lag)
  WINDOW w AS (PARTITION BY event_type, l.lag ORDER BY ts, event_id)
), m AS (
  SELECT event_type, lag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(xi) AS DOUBLE) AS sx, CAST(SUM(xj) AS DOUBLE) AS sy,
         CAST(SUM(xi * xj) AS DOUBLE) AS sxy,
         CAST(SUM(xi * xi) AS DOUBLE) AS sxx,
         CAST(SUM(xj * xj) AS DOUBLE) AS syy
  FROM pairs WHERE xj IS NOT NULL
  GROUP BY 1, 2
)
SELECT event_type, CAST(lag AS BIGINT) AS lag,
       CAST(n AS BIGINT) AS n_pairs,
       CAST(ROUND((n * sxy - sx * sy)
                  / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy))
                  * 1000000, 0) AS BIGINT) AS acf_x1e6
FROM m
WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
"""


# ---------------------------------------------------------------------------
# cumulative-deviation anomaly counts per event type
# ---------------------------------------------------------------------------


def q_cumdev_anomalies(sf_dir):
    """Page-test-style anomaly counting: points whose integer cumulative
    deviation |n*S_i - i*S_n| strictly exceeds the series' exact
    PERCENTILE_DISC(0.95) of deviations
    (stages/timeseries.cumdev_anomalies)."""
    from mimirsbrunn_ray.stages.timeseries import cumdev_anomalies

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    return cumdev_anomalies(ev, key="event_type", q=0.95)


CUMDEV_SQL = """
WITH b AS (
  SELECT event_type, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), p AS (
  SELECT event_type,
         SUM(x) OVER (PARTITION BY event_type ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS s,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         SUM(x) OVER (PARTITION BY event_type) AS tot
  FROM b
), d AS (
  SELECT event_type, n, ABS(s * n - i * tot) AS ad FROM p
), q AS (
  SELECT event_type,
         PERCENTILE_DISC(0.95) WITHIN GROUP (ORDER BY ad) AS p95
  FROM d GROUP BY 1
)
SELECT d.event_type,
       CAST(MAX(d.n) AS BIGINT) AS n_points,
       CAST(SUM(CASE WHEN d.ad > q.p95 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_anomalies,
       CAST(MAX(d.ad) AS BIGINT) AS max_absdev
FROM d JOIN q USING (event_type)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# coverage / SLA per user
# ---------------------------------------------------------------------------

_SLA_STALENESS_US = 1_800_000_000  # 30 min


def q_coverage_sla(sf_dir):
    """Per-user uptime: covered time = SUM(min(gap, 30min)) over
    consecutive gaps; uptime_ppm by integer floor division
    (stages/timeseries.coverage_sla)."""
    from mimirsbrunn_ray.stages.timeseries import coverage_sla

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    )
    return coverage_sla(ev, key="user_id", staleness_us=_SLA_STALENESS_US)


SLA_SQL = f"""
WITH d AS (
  SELECT user_id,
         EPOCH_US(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - EPOCH_US(ts) AS dt
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), a AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(dt) AS BIGINT) AS span_us,
         CAST(SUM(LEAST(dt, {_SLA_STALENESS_US})) AS BIGINT) AS covered_us
  FROM d WHERE dt IS NOT NULL
  GROUP BY 1
)
SELECT user_id, n_gaps, span_us, covered_us,
       CAST(covered_us * 1000000 // span_us AS BIGINT) AS uptime_ppm
FROM a WHERE span_us > 0
"""


# ---------------------------------------------------------------------------
# connected components over the 17-block dependency edge set
# ---------------------------------------------------------------------------


def q_part_components(sf_dir):
    """Distributed connected components over a deterministic multi-
    component edge set (chain edges k—(k-1) within 17-key blocks plus
    reconvergent skip edges k—(k-4)), labeled by min-member via the same
    pointer-jumping label propagation that backs near-dup clustering
    (stages/neardup.py:299, O(log diameter) rounds, all state in
    Datasets). Self-pairs keep isolated nodes present. The oracle is a
    recursive-CTE reachability fixpoint — the algorithm-level check, not
    a closed-form shortcut."""
    from mimirsbrunn_ray.stages.neardup import minlabel_propagation

    part = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    _mx_raw = part.max("p_partkey")
    mx = int(_mx_raw) if _mx_raw is not None else 0
    nodes = np.arange(0, mx + 1, dtype=np.int64)  # keys are 0-based
    chain = nodes[nodes % 17 >= 1]
    skip = nodes[nodes % 17 >= 5]
    pairs = rd.from_arrow(
        pa.table(
            {
                "a": np.concatenate([chain, skip, nodes]),
                "b": np.concatenate([chain - 1, skip - 4, nodes]),
            }
        )
    )
    labels = minlabel_propagation(pairs, a_col="a", b_col="b")
    return labels.map_batches(
        lambda b: pa.table(
            {
                "node": b["doc_id"].cast(pa.int64()),
                "component": b["cluster"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )  # no output sort: the driver's compare canonicalizes row order


COMPONENTS_SQL = """
WITH RECURSIVE edges AS (
  SELECT p_partkey AS u, p_partkey - 1 AS v FROM part
  WHERE p_partkey % 17 >= 1
  UNION ALL
  SELECT p_partkey, p_partkey - 4 FROM part
  WHERE p_partkey % 17 >= 5
),
sym AS (
  SELECT u, v FROM edges UNION SELECT v, u FROM edges
),
reach(node, r) AS (
  SELECT p_partkey, p_partkey FROM part
  UNION
  SELECT reach.node, sym.v FROM reach JOIN sym ON sym.u = reach.r
)
SELECT node, CAST(MIN(r) AS BIGINT) AS component
FROM reach GROUP BY node ORDER BY node
"""


def register_r4e(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "time_weighted_avg_user": q_time_weighted_avg,
            "acf_value_by_type": q_acf_value_by_type,
            "cumdev_anomalies": q_cumdev_anomalies,
            "coverage_sla_user": q_coverage_sla,
            "part_components": q_part_components,
        }
    )
    oracles.update(
        {
            "time_weighted_avg_user": TWA_SQL,
            "acf_value_by_type": ACF_SQL,
            "cumdev_anomalies": CUMDEV_SQL,
            "coverage_sla_user": SLA_SQL,
            "part_components": COMPONENTS_SQL,
        }
    )
