"""Round-4 batch DW: von Neumann successive-difference ratio, the
closed-form one-sided CUSUM maximum, and the turning-points randomness
test — all over per-type hourly/daily event-count series.

Exactness discipline: hourly/daily counts fold as exact int64 partials
tree-merged on the (type, bucket) grain; successive differences,
cumulative sums, and running minima are pure integer arithmetic (the
CUSUM is scaled by n so the drift term n*x_i - sum stays integral);
only the closing ratios are mirrored doubles, x1e6 snap.
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


def _round_half_away(x: float):
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


def _bucket_counts(sf_dir, unit_us: int) -> pd.DataFrame:
    """Exact (event_type, bucket) count table — one column-pruned scan,
    per-batch partial counts, tree merge.  Bounded by types x buckets,
    not row count."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"]))
        b = b.filter(m)
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        h = (us // unit_us).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "h": pa.array(h),
                "c": pa.array(np.ones(len(h), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "h"], ["c"])

    return tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "h"], ["c"]),
    ).to_pandas()


# ---------------------------------------------------------------------------
# von Neumann successive-difference ratio of hourly counts
# ---------------------------------------------------------------------------


def q_von_neumann_ratio_hourly(sf_dir):
    """Per event type: the von Neumann ratio of the OBSERVED hourly
    count series — sum of squared successive differences over the sum
    of squared deviations (the classic trend detector: ~2 for a random
    series, well below 2 under positive serial correlation / trend).
    Both sums assemble from exact integers — the ratio is computed as
    (n * sum d^2) / (n * sum x^2 - (sum x)^2), every term int64 —
    then snapped as a mirrored double, x1e6; NULL on a constant
    series."""
    hourly = _bucket_counts(sf_dir, _HOUR_US)
    if not len(hourly) or "event_type" not in hourly.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_hours": pa.array([], pa.int64()),
                "sum_d2": pa.array([], pa.int64()),
                "rvn_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "n_hours": [], "sum_d2": [], "rvn_x1e6": []}
    for et, g in hourly.sort_values(["event_type", "h"]).groupby(
        "event_type", sort=True
    ):
        c = g["c"].to_numpy(dtype=np.int64)
        n = len(c)
        d = np.diff(c)
        sum_d2 = int(np.sum(d * d))
        s1 = int(c.sum())
        s2 = int(np.sum(c * c))
        den = n * s2 - s1 * s1
        rvn = None if den == 0 else float(n * sum_d2) / float(den)
        out["event_type"].append(et)
        out["n_hours"].append(n)
        out["sum_d2"].append(sum_d2)
        out["rvn_x1e6"].append(
            None if rvn is None else _round_half_away(rvn * 1e6)
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_hours": pa.array(out["n_hours"], pa.int64()),
            "sum_d2": pa.array(out["sum_d2"], pa.int64()),
            "rvn_x1e6": pa.array(out["rvn_x1e6"], pa.int64()),
        }
    )


VON_NEUMANN_SQL = """
WITH hourly AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), d AS (
  SELECT event_type, c,
         c - LAG(c) OVER (PARTITION BY event_type ORDER BY h) AS diff
  FROM hourly
), a AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COALESCE(SUM(diff * diff), 0) AS BIGINT) AS sum_d2,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM d GROUP BY 1
)
SELECT event_type, n AS n_hours, sum_d2,
       CASE WHEN n * s2 - s1 * s1 = 0 THEN NULL
            ELSE CAST(ROUND(CAST(n * sum_d2 AS DOUBLE)
                 / (n * s2 - s1 * s1) * 1000000, 0) AS BIGINT)
       END AS rvn_x1e6
FROM a ORDER BY 1
"""


# ---------------------------------------------------------------------------
# closed-form one-sided CUSUM maximum over hourly counts
# ---------------------------------------------------------------------------


def q_cusum_max_hourly(sf_dir):
    """Per event type: the maximum of the one-sided upper CUSUM chart
    over hourly counts, computed in closed form — with drift target the
    series mean, the recursive S_i = max(0, S_{i-1} + x_i - mean)
    equals CS_i - min(0, min_{j<=i} CS_j) for CS = cumsum(x - mean),
    so one cumulative sum plus one running minimum replaces the
    recursion (the trick that makes CUSUM a window expression instead
    of a sequential loop). Everything is scaled by n (e_i = n*x_i -
    sum) to stay exactly integral; the peak hour is the EARLIEST hour
    attaining the maximum."""
    hourly = _bucket_counts(sf_dir, _HOUR_US)
    if not len(hourly) or "event_type" not in hourly.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_hours": pa.array([], pa.int64()),
                "max_cusum_scaled": pa.array([], pa.int64()),
                "peak_hour": pa.array([], pa.int64()),
            }
        )
    out = {
        "event_type": [], "n_hours": [], "max_cusum_scaled": [],
        "peak_hour": [],
    }
    for et, g in hourly.sort_values(["event_type", "h"]).groupby(
        "event_type", sort=True
    ):
        c = g["c"].to_numpy(dtype=np.int64)
        h = g["h"].to_numpy(dtype=np.int64)
        n = len(c)
        s = int(c.sum())
        e = n * c - s
        cs = np.cumsum(e)
        run_min = np.minimum(np.minimum.accumulate(cs), 0)
        cusum = cs - run_min
        i = int(np.argmax(cusum))  # first index attaining the max
        out["event_type"].append(et)
        out["n_hours"].append(n)
        out["max_cusum_scaled"].append(int(cusum[i]))
        out["peak_hour"].append(int(h[i]))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_hours": pa.array(out["n_hours"], pa.int64()),
            "max_cusum_scaled": pa.array(out["max_cusum_scaled"], pa.int64()),
            "peak_hour": pa.array(out["peak_hour"], pa.int64()),
        }
    )


CUSUM_SQL = """
WITH hourly AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), tot AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s
  FROM hourly GROUP BY 1
), cs AS (
  SELECT h.event_type, h.h, t.n,
         SUM(t.n * h.c - t.s) OVER (
           PARTITION BY h.event_type ORDER BY h.h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
  FROM hourly h JOIN tot t USING (event_type)
), su AS (
  SELECT event_type, h, n,
         cs - LEAST(0, MIN(cs) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
  FROM cs
), r AS (
  SELECT event_type, h, n, s,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY s DESC, h ASC) AS rn
  FROM su
)
SELECT event_type, n AS n_hours,
       CAST(s AS BIGINT) AS max_cusum_scaled,
       CAST(h AS BIGINT) AS peak_hour
FROM r WHERE rn = 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# turning-points randomness test over daily counts
# ---------------------------------------------------------------------------


def q_turning_points_daily(sf_dir):
    """Per event type: the turning-points test over the daily count
    series — the count of strict local extrema (sign change between
    consecutive differences) against the 2(n-2)/3 expectation and
    (16n-29)/90 variance of a random sequence (too few turning points
    = trend/seasonality, too many = alternation). Turning points are
    exact integer comparisons; expectation and z-score are mirrored
    doubles, x1e6 snap, z NULL when the variance term is not positive
    (n < 3 gives no interior points)."""
    daily = _bucket_counts(sf_dir, _DAY_US)
    if not len(daily) or "event_type" not in daily.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_days": pa.array([], pa.int64()),
                "n_turning": pa.array([], pa.int64()),
                "expected_x1e6": pa.array([], pa.int64()),
                "z_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {
        "event_type": [], "n_days": [], "n_turning": [],
        "expected_x1e6": [], "z_x1e6": [],
    }
    for et, g in daily.sort_values(["event_type", "h"]).groupby(
        "event_type", sort=True
    ):
        c = g["c"].to_numpy(dtype=np.int64)
        n = len(c)
        if n >= 3:
            d1 = c[1:-1] - c[:-2]
            d2 = c[2:] - c[1:-1]
            t = int(np.sum((d1 * d2) < 0))
        else:
            t = 0
        exp = 2.0 * (n - 2) / 3.0 if n >= 2 else 0.0
        var = (16.0 * n - 29.0) / 90.0
        z = None if n < 3 or var <= 0.0 else (t - exp) / float(np.sqrt(var))
        out["event_type"].append(et)
        out["n_days"].append(n)
        out["n_turning"].append(t)
        out["expected_x1e6"].append(_round_half_away(exp * 1e6))
        out["z_x1e6"].append(None if z is None else _round_half_away(z * 1e6))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_days": pa.array(out["n_days"], pa.int64()),
            "n_turning": pa.array(out["n_turning"], pa.int64()),
            "expected_x1e6": pa.array(out["expected_x1e6"], pa.int64()),
            "z_x1e6": pa.array(out["z_x1e6"], pa.int64()),
        }
    )


TURNING_SQL = """
WITH daily AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 86400000000) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), w AS (
  SELECT event_type, c,
         c - LAG(c)  OVER (PARTITION BY event_type ORDER BY d) AS d1,
         LEAD(c) OVER (PARTITION BY event_type ORDER BY d) - c AS d2
  FROM daily
), a AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COALESCE(SUM(CASE WHEN d1 * d2 < 0 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS t
  FROM w GROUP BY 1
)
SELECT event_type, n AS n_days, t AS n_turning,
       CAST(ROUND(CASE WHEN n >= 2 THEN 2.0 * (n - 2) / 3.0 ELSE 0.0 END
            * 1000000, 0) AS BIGINT) AS expected_x1e6,
       CASE WHEN n < 3 OR (16.0 * n - 29.0) / 90.0 <= 0 THEN NULL
            ELSE CAST(ROUND((t - 2.0 * (n - 2) / 3.0)
                 / SQRT((16.0 * n - 29.0) / 90.0) * 1000000, 0) AS BIGINT)
       END AS z_x1e6
FROM a ORDER BY 1
"""


def register_r4dw(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "von_neumann_ratio_hourly": q_von_neumann_ratio_hourly,
            "cusum_max_hourly": q_cusum_max_hourly,
            "turning_points_daily": q_turning_points_daily,
        }
    )
    oracles.update(
        {
            "von_neumann_ratio_hourly": VON_NEUMANN_SQL,
            "cusum_max_hourly": CUSUM_SQL,
            "turning_points_daily": TURNING_SQL,
        }
    )
