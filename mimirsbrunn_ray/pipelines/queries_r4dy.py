"""Round-4 batch DY: Mann-Kendall monotone-trend test over daily
counts, Poincaré-plot SD1/SD2 short-vs-long-term interarrival
variability, and the Teager-Kaiser energy operator over hourly counts.

Exactness discipline: Mann-Kendall S and the x18 variance numerator
fold from exact integer pair signs and tie multiplicities (z is the
only mirrored double, x1e6 snap); Poincaré sums run over seconds as
mirrored doubles whose 1e-12 relative error sits far under the x1e6
snap grid; Teager-Kaiser psi values are pure int64 products of hourly
counts, so sum/max are exact and only the mean is a snapped ratio.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000


def _round_half_away(x: float):
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


def _bucket_counts(sf_dir, bucket_us: int) -> pd.DataFrame:
    """(event_type, b, c) exact counts at the given time-bucket grain —
    per-batch partials, sharded tree merge; the result is the small
    types x buckets grid every series test below runs on."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        t = pa.table(
            {
                "event_type": b["event_type"],
                "b": pa.array((us // bucket_us).astype(np.int64)),
                "c": pa.array(np.ones(len(us), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "b"], ["c"])

    return tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "b"], ["c"]),
    ).to_pandas()


# ---------------------------------------------------------------------------
# Mann-Kendall monotone trend test over daily counts
# ---------------------------------------------------------------------------


def q_mann_kendall_daily(sf_dir):
    """Per event type: the Mann-Kendall trend test over daily event
    counts — S = sum of sign(c_j - c_i) over day pairs i<j, the
    tie-corrected variance numerator var18 = n(n-1)(2n+5) -
    sum t(t-1)(2t+5) (Var(S) = var18/18), and the continuity-
    corrected z — the distribution-free 'is traffic drifting' test a
    capacity planner runs before fitting any trend line. S and var18
    fold exactly from integers; z is a mirrored double, x1e6 snap,
    NULL when var18 = 0."""
    daily = _bucket_counts(sf_dir, _DAY_US)
    cols = ["event_type", "n_days", "s", "var_s_x18", "z_x1e6"]
    if not len(daily) or "event_type" not in daily.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                **{c: pa.array([], pa.int64()) for c in cols[1:]},
            }
        )
    out = {c: [] for c in cols}
    for et, g in daily.groupby("event_type", sort=True):
        g = g.sort_values("b", ignore_index=True)
        c = g["c"].to_numpy(dtype=np.int64)
        n = len(c)
        diff = np.sign(c[None, :] - c[:, None])
        s = int(np.sum(np.triu(diff, k=1)))
        _, tcnt = np.unique(c, return_counts=True)
        t = tcnt.astype(np.int64)
        var18 = int(n * (n - 1) * (2 * n + 5)) - int(
            np.sum(t * (t - 1) * (2 * t + 5))
        )
        if var18 <= 0:
            z = None
        elif s > 0:
            z = _round_half_away((s - 1) / np.sqrt(var18 / 18.0) * 1e6)
        elif s < 0:
            z = _round_half_away((s + 1) / np.sqrt(var18 / 18.0) * 1e6)
        else:
            z = 0
        out["event_type"].append(et)
        out["n_days"].append(n)
        out["s"].append(s)
        out["var_s_x18"].append(var18)
        out["z_x1e6"].append(z)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


MANN_KENDALL_SQL = """
WITH d AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 86400000000) AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), s AS (
  SELECT a.event_type,
         CAST(SUM(CASE WHEN b.c > a.c THEN 1
                       WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM d a JOIN d b
    ON a.event_type = b.event_type AND b.day > a.day
  GROUP BY 1
), ties AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t
  FROM d GROUP BY event_type, c
), v AS (
  SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM d GROUP BY 1
), tc AS (
  SELECT event_type,
         CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS corr
  FROM ties GROUP BY 1
)
SELECT v.event_type, v.n AS n_days,
       COALESCE(s.s, 0) AS s,
       v.n * (v.n - 1) * (2 * v.n + 5) - tc.corr AS var_s_x18,
       CASE
         WHEN v.n * (v.n - 1) * (2 * v.n + 5) - tc.corr <= 0 THEN NULL
         WHEN COALESCE(s.s, 0) > 0 THEN CAST(ROUND(
           (COALESCE(s.s, 0) - 1)
           / SQRT((v.n * (v.n - 1) * (2 * v.n + 5) - tc.corr) / 18.0)
           * 1000000, 0) AS BIGINT)
         WHEN COALESCE(s.s, 0) < 0 THEN CAST(ROUND(
           (COALESCE(s.s, 0) + 1)
           / SQRT((v.n * (v.n - 1) * (2 * v.n + 5) - tc.corr) / 18.0)
           * 1000000, 0) AS BIGINT)
         ELSE 0
       END AS z_x1e6
FROM v
LEFT JOIN s ON s.event_type = v.event_type
JOIN tc ON tc.event_type = v.event_type
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Poincaré plot SD1/SD2 of consecutive interarrival pairs
# ---------------------------------------------------------------------------


def q_poincare_sd1_sd2(sf_dir):
    """Per event type: the Poincaré-plot descriptors of consecutive
    interarrival gaps in (ts, event_id) order — SD1 = sqrt(Var(g_{i+1}
    - g_i)/2) (short-term jitter) and SD2 = sqrt(Var(g_{i+1} + g_i)/2)
    (long-term drift), in seconds — the HRV-style regularity split
    that separates burst noise from slow load swings. One series
    hash-bucket shuffle; population-variance sums run in mirrored
    doubles over seconds (1e-12 relative error vs a 1e-6 snap grid)."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "event_id"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts"))
        t = pa.table(
            {
                "event_type": b["event_type"],
                "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": b["event_id"],
            }
        )
        return add_bucket(t, "event_type", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_pairs": pd.Series([], dtype=np.int64),
                "sd1_s_x1e6": pd.Series([], dtype=np.int64),
                "sd2_s_x1e6": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["event_type", "us", "event_id"], kind="mergesort",
            ignore_index=True,
        )
        k = g["event_type"].to_numpy()
        us = g["us"].to_numpy(dtype=np.int64)
        rows = {"event_type": [], "n_pairs": [], "sd1_s_x1e6": [],
                "sd2_s_x1e6": []}
        for t in pd.unique(k):
            m = k == t
            sec = us[m].astype(np.float64) / 1e6
            gap = sec[1:] - sec[:-1]
            if len(gap) < 2:
                continue
            a, b2 = gap[:-1], gap[1:]
            n = len(a)
            dm, dp = b2 - a, b2 + a
            vm = (np.sum(dm * dm) - np.sum(dm) ** 2 / n) / n
            vp = (np.sum(dp * dp) - np.sum(dp) ** 2 / n) / n
            rows["event_type"].append(t)
            rows["n_pairs"].append(n)
            rows["sd1_s_x1e6"].append(
                _round_half_away(np.sqrt(max(vm, 0.0) / 2.0) * 1e6)
            )
            rows["sd2_s_x1e6"].append(
                _round_half_away(np.sqrt(max(vp, 0.0) / 2.0) * 1e6)
            )
        out = pd.DataFrame(rows)
        for c in ("n_pairs", "sd1_s_x1e6", "sd2_s_x1e6"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        ev.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
    )


POINCARE_SQL = """
WITH v AS (
  SELECT event_type, ts, event_id FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
), g AS (
  SELECT event_type,
         (EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER w) / 1000000.0 AS gap,
         ROW_NUMBER() OVER w AS rn
  FROM v
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), p AS (
  SELECT event_type, gap AS b, LAG(gap) OVER
           (PARTITION BY event_type ORDER BY rn) AS a
  FROM g WHERE gap IS NOT NULL
), q AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         SUM((b - a) * (b - a)) AS smm, SUM(b - a) AS sm,
         SUM((b + a) * (b + a)) AS spp, SUM(b + a) AS sp
  FROM p WHERE a IS NOT NULL
  GROUP BY 1
)
SELECT event_type, n AS n_pairs,
       CAST(ROUND(SQRT(GREATEST((smm - sm * sm / n) / n, 0) / 2.0)
            * 1000000, 0) AS BIGINT) AS sd1_s_x1e6,
       CAST(ROUND(SQRT(GREATEST((spp - sp * sp / n) / n, 0) / 2.0)
            * 1000000, 0) AS BIGINT) AS sd2_s_x1e6
FROM q WHERE n >= 2 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Teager-Kaiser energy operator over hourly counts
# ---------------------------------------------------------------------------


def q_teager_energy_hourly(sf_dir):
    """Per event type: the Teager-Kaiser energy operator psi_i =
    c_i^2 - c_{i-1} * c_{i+1} over observed hourly counts in hour
    order — the instantaneous 'energy' that spikes on sharp amplitude
    or frequency changes and stays near zero on smooth ramps, i.e. a
    one-pass burst detector. All psi are exact int64 products; sum and
    max fold exactly; only the mean is a snapped ratio (x1e6)."""
    hourly = _bucket_counts(sf_dir, _HOUR_US)
    cols = ["event_type", "n_psi", "sum_psi", "max_psi", "mean_psi_x1e6"]
    if not len(hourly) or "event_type" not in hourly.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                **{c: pa.array([], pa.int64()) for c in cols[1:]},
            }
        )
    out = {c: [] for c in cols}
    for et, g in hourly.groupby("event_type", sort=True):
        g = g.sort_values("b", ignore_index=True)
        c = g["c"].to_numpy(dtype=np.int64)
        if len(c) < 3:
            continue
        psi = c[1:-1] * c[1:-1] - c[:-2] * c[2:]
        n = len(psi)
        s = int(np.sum(psi))
        out["event_type"].append(et)
        out["n_psi"].append(n)
        out["sum_psi"].append(s)
        out["max_psi"].append(int(np.max(psi)))
        out["mean_psi_x1e6"].append(_round_half_away(s / n * 1e6))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


TEAGER_SQL = """
WITH h AS (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), p AS (
  SELECT event_type, c,
         LAG(c) OVER w AS prev, LEAD(c) OVER w AS nxt
  FROM h
  WINDOW w AS (PARTITION BY event_type ORDER BY h)
), e AS (
  SELECT event_type, c * c - prev * nxt AS psi
  FROM p WHERE prev IS NOT NULL AND nxt IS NOT NULL
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_psi,
       CAST(SUM(psi) AS BIGINT) AS sum_psi,
       CAST(MAX(psi) AS BIGINT) AS max_psi,
       CAST(ROUND(CAST(SUM(psi) AS DOUBLE) / COUNT(*) * 1000000, 0)
            AS BIGINT) AS mean_psi_x1e6
FROM e GROUP BY 1 HAVING COUNT(*) >= 1 ORDER BY 1
"""


def register_r4dy(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "mann_kendall_daily": q_mann_kendall_daily,
            "poincare_sd1_sd2": q_poincare_sd1_sd2,
            "teager_energy_hourly": q_teager_energy_hourly,
        }
    )
    oracles.update(
        {
            "mann_kendall_daily": MANN_KENDALL_SQL,
            "poincare_sd1_sd2": POINCARE_SQL,
            "teager_energy_hourly": TEAGER_SQL,
        }
    )
