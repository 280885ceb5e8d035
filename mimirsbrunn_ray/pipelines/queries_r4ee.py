"""Round-4 batch EE: Cliff's delta ordinal effect size with exact
dominance counts, the Goh-Barabasi memory coefficient of consecutive
interarrivals, and a seasonal-naive vs naive forecast backtest.

Exactness discipline: Cliff's dominance triple (gt/lt/eq) folds from
exact integer rank algebra (2U = 2*lt + eq) plus an equality-histogram
join, so only delta is a snapped ratio; the memory coefficient is a
mirrored-double Pearson over consecutive gap pairs in seconds (error
~1e-13 vs the 1e-6 grid); backtest absolute-error sums are exact int64
over the dense hourly grid and the winner label compares exact sums."""

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


# ---------------------------------------------------------------------------
# Cliff's delta: weekday vs weekend values with exact dominance counts
# ---------------------------------------------------------------------------


def q_cliffs_delta_weekpart(sf_dir):
    """Per event type: Cliff's delta between weekday and weekend value
    samples (cents) with the full exact dominance decomposition —
    n_gt = #(weekday > weekend), n_lt, n_eq over all n*m cross pairs,
    delta = (n_gt - n_lt)/(n*m) — the ordinal effect size that reads
    directly as 'probability a weekday value beats a weekend value,
    minus the reverse'. Dominance counts are exact int64 (sorted
    searchsorted sweep, never materializing the n*m pairs); delta is
    the one snapped double. One event-type hash-bucket shuffle."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        dow = (us // _DAY_US + 4) % 7  # Sunday = 0
        we = ((dow == 0) | (dow == 6)).astype(np.int64)
        v = b["value"].to_numpy(zero_copy_only=False)
        cents = np.where(
            v >= 0, np.floor(v * 100 + 0.5), np.ceil(v * 100 - 0.5)
        ).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "we": pa.array(we),
                "x": pa.array(cents),
            }
        )
        return add_bucket(t, "event_type", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_gt": pd.Series([], dtype=np.int64),
                "n_lt": pd.Series([], dtype=np.int64),
                "n_eq": pd.Series([], dtype=np.int64),
                "delta_x1e6": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        rows = {"event_type": [], "n_gt": [], "n_lt": [], "n_eq": [],
                "delta_x1e6": []}
        for t, gg in g.groupby("event_type", sort=False):
            x = np.sort(gg.loc[gg["we"] == 0, "x"].to_numpy(dtype=np.int64))
            y = np.sort(gg.loc[gg["we"] == 1, "x"].to_numpy(dtype=np.int64))
            n, m = len(x), len(y)
            if n == 0 or m == 0:
                continue
            lo = np.searchsorted(y, x, side="left")
            hi = np.searchsorted(y, x, side="right")
            gt = int(np.sum(lo))
            eq = int(np.sum(hi - lo))
            lt = n * m - gt - eq
            delta = (float(gt) - float(lt)) / (float(n) * float(m))
            rows["event_type"].append(t)
            rows["n_gt"].append(gt)
            rows["n_lt"].append(lt)
            rows["n_eq"].append(eq)
            rows["delta_x1e6"].append(_round_half_away(delta * 1e6))
        out = pd.DataFrame(rows)
        for c in ("n_gt", "n_lt", "n_eq", "delta_x1e6"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        ev.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
    )


CLIFFS_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), r AS (
  SELECT event_type, we,
         RANK() OVER (PARTITION BY event_type ORDER BY x) AS rk,
         COUNT(*) OVER (PARTITION BY event_type, x) AS cx
  FROM v
), agg AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN we = 1 THEN 1 ELSE 0 END) AS BIGINT) AS m,
         CAST(SUM(CASE WHEN we = 1 THEN 2 * rk + cx - 1 ELSE 0 END)
              AS BIGINT) AS r2_we
  FROM r GROUP BY 1
), hx AS (
  SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS c
  FROM v WHERE we = 0 GROUP BY 1, 2
), hy AS (
  SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS c
  FROM v WHERE we = 1 GROUP BY 1, 2
), eqc AS (
  SELECT hx.event_type, CAST(SUM(hx.c * hy.c) AS BIGINT) AS eq
  FROM hx JOIN hy ON hx.event_type = hy.event_type AND hx.x = hy.x
  GROUP BY 1
), f AS (
  SELECT a.event_type, a.n, a.m,
         COALESCE(e.eq, 0) AS eq,
         -- 2*U_we = r2_we - m(m+1) counts 2*#(y>x) + #(y=x):
         -- lt = #(x<y) = (2U_we - eq) / 2
         (a.r2_we - a.m * (a.m + 1) - COALESCE(e.eq, 0)) // 2 AS lt
  FROM agg a LEFT JOIN eqc e ON e.event_type = a.event_type
  WHERE a.n > 0 AND a.m > 0
)
SELECT event_type,
       n * m - lt - eq AS n_gt,
       lt AS n_lt,
       eq AS n_eq,
       CAST(ROUND((CAST(n * m - lt - eq AS DOUBLE) - CAST(lt AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE)) * 1000000, 0)
            AS BIGINT) AS delta_x1e6
FROM f ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Goh-Barabasi memory coefficient of consecutive interarrival gaps
# ---------------------------------------------------------------------------


def q_interarrival_memory_coeff(sf_dir):
    """Per event type: the Goh-Barabasi memory coefficient M — the
    Pearson correlation between consecutive interarrival gaps (g_i,
    g_{i+1}) in (ts, event_id) order, in seconds — the companion to
    the burstiness parameter already in the registry: B captures the
    gap DISTRIBUTION's spread, M captures whether long gaps FOLLOW
    long gaps (correlated outages vs memoryless arrivals). Mirrored-
    double moment sums (~1e-13 error vs the 1e-6 snap grid); NULL
    when either marginal variance is degenerate."""
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
                "memory_x1e6": pd.Series([], dtype=np.int64),
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
        rows = {"event_type": [], "n_pairs": [], "memory_x1e6": []}
        for t in pd.unique(k):
            m = k == t
            sec = us[m].astype(np.float64) / 1e6
            gap = sec[1:] - sec[:-1]
            if len(gap) < 2:
                continue
            a, b2 = gap[:-1], gap[1:]
            n = len(a)
            nf = float(n)
            va = nf * np.sum(a * a) - np.sum(a) ** 2
            vb = nf * np.sum(b2 * b2) - np.sum(b2) ** 2
            cab = nf * np.sum(a * b2) - np.sum(a) * np.sum(b2)
            r = (
                None
                if va <= 0.0 or vb <= 0.0
                else cab / (np.sqrt(va) * np.sqrt(vb))
            )
            rows["event_type"].append(t)
            rows["n_pairs"].append(n)
            rows["memory_x1e6"].append(
                None if r is None else _round_half_away(r * 1e6)
            )
        out = pd.DataFrame(rows)
        out["n_pairs"] = out["n_pairs"].astype(np.int64)
        return out

    return (
        ev.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
    )


MEMORY_SQL = """
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
  SELECT event_type, gap AS b,
         LAG(gap) OVER (PARTITION BY event_type ORDER BY rn) AS a
  FROM g WHERE gap IS NOT NULL
), m AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(a * a) AS saa, SUM(a) AS sa,
         SUM(b * b) AS sbb, SUM(b) AS sb,
         SUM(a * b) AS sab
  FROM p WHERE a IS NOT NULL
  GROUP BY 1 HAVING COUNT(*) >= 1
)
SELECT event_type, n AS n_pairs,
       CASE WHEN n * saa - sa * sa <= 0.0 OR n * sbb - sb * sb <= 0.0
            THEN NULL
            ELSE CAST(ROUND(
              (n * sab - sa * sb)
              / (SQRT(n * saa - sa * sa) * SQRT(n * sbb - sb * sb))
              * 1000000, 0) AS BIGINT) END AS memory_x1e6
FROM m ORDER BY 1
"""


# ---------------------------------------------------------------------------
# seasonal-naive vs naive hourly forecast backtest
# ---------------------------------------------------------------------------


def q_seasonal_naive_backtest(sf_dir):
    """Per event type: the rolling backtest every forecasting effort
    must beat — over the dense 0-filled hourly series, compare the
    naive forecast c_{t-24} and the seasonal-naive forecast c_{t-168}
    at every hour t >= 168 of the span: exact absolute-error sums,
    snapped MAEs, and which baseline wins (ties -> 'tie'). A model
    that cannot beat the winning column here is not worth shipping.
    Error sums are exact int64; the winner label compares exact sums."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        t = pa.table(
            {
                "event_type": b["event_type"],
                "h": pa.array((us // _HOUR_US).astype(np.int64)),
                "c": pa.array(np.ones(len(us), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "h"], ["c"])

    hourly = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "h"], ["c"]),
    ).to_pandas()
    cols = ["event_type", "n_evals", "sae_naive24", "sae_seasonal168",
            "mae24_x1e6", "mae168_x1e6", "winner"]
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in cols[1:-1]},
            "winner": pa.array([], pa.string()),
        }
    )
    if not len(hourly) or "event_type" not in hourly.columns:
        return empty
    types = sorted(hourly["event_type"].unique())
    hmin = int(hourly["h"].min())
    width = int(hourly["h"].max()) - hmin + 1
    if width <= 168:
        return empty
    tix = {t: i for i, t in enumerate(types)}
    mat = np.zeros((len(types), width), dtype=np.int64)
    mat[
        hourly["event_type"].map(tix).to_numpy(),
        hourly["h"].to_numpy(dtype=np.int64) - hmin,
    ] = hourly["c"].to_numpy(dtype=np.int64)
    out = {c: [] for c in cols}
    for t in types:
        c = mat[tix[t]]
        y = c[168:]
        e24 = np.abs(y - c[144:-24])
        e168 = np.abs(y - c[:-168])
        n = len(y)
        s24, s168 = int(np.sum(e24)), int(np.sum(e168))
        out["event_type"].append(t)
        out["n_evals"].append(n)
        out["sae_naive24"].append(s24)
        out["sae_seasonal168"].append(s168)
        out["mae24_x1e6"].append(_round_half_away(s24 / n * 1e6))
        out["mae168_x1e6"].append(_round_half_away(s168 / n * 1e6))
        out["winner"].append(
            "tie" if s24 == s168
            else "naive24" if s24 < s168
            else "seasonal168"
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:-1]},
            "winner": pa.array(out["winner"], pa.string()),
        }
    )


BACKTEST_SQL = """
WITH hh AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), bounds AS MATERIALIZED (
  SELECT MIN(h) AS mn, MAX(h) - MIN(h) + 1 AS width FROM hh
), grid AS MATERIALIZED (
  SELECT unnest(generate_series(0, width - 1)) AS i FROM bounds
), types AS MATERIALIZED (
  SELECT DISTINCT event_type FROM hh
), dense AS MATERIALIZED (
  SELECT t.event_type, g.i, COALESCE(hh.c, 0) AS c
  FROM types t CROSS JOIN grid g
  CROSS JOIN bounds b
  LEFT JOIN hh ON hh.event_type = t.event_type AND hh.h = b.mn + g.i
), e AS (
  SELECT y.event_type,
         ABS(y.c - n24.c) AS e24,
         ABS(y.c - n168.c) AS e168
  FROM dense y
  JOIN dense n24 ON n24.event_type = y.event_type AND n24.i = y.i - 24
  JOIN dense n168 ON n168.event_type = y.event_type
                 AND n168.i = y.i - 168
  WHERE y.i >= 168
), agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(e24) AS BIGINT) AS s24,
         CAST(SUM(e168) AS BIGINT) AS s168
  FROM e GROUP BY 1
)
SELECT event_type, n AS n_evals,
       s24 AS sae_naive24, s168 AS sae_seasonal168,
       CAST(ROUND(CAST(s24 AS DOUBLE) / n * 1000000, 0) AS BIGINT)
         AS mae24_x1e6,
       CAST(ROUND(CAST(s168 AS DOUBLE) / n * 1000000, 0) AS BIGINT)
         AS mae168_x1e6,
       CASE WHEN s24 = s168 THEN 'tie'
            WHEN s24 < s168 THEN 'naive24'
            ELSE 'seasonal168' END AS winner
FROM agg ORDER BY 1
"""


def register_r4ee(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "cliffs_delta_weekpart": q_cliffs_delta_weekpart,
            "interarrival_memory_coeff": q_interarrival_memory_coeff,
            "seasonal_naive_backtest": q_seasonal_naive_backtest,
        }
    )
    oracles.update(
        {
            "cliffs_delta_weekpart": CLIFFS_SQL,
            "interarrival_memory_coeff": MEMORY_SQL,
            "seasonal_naive_backtest": BACKTEST_SQL,
        }
    )
