"""Round-4 batch CS: tier variance shrinkage (1m -> 1h downsampling
audit), the Pettitt rank change-point statistic over hourly means, and
the Goh-Barabási burstiness coefficient of interarrivals.

All three are tiering-engine diagnostics: variance shrinkage quantifies
what the 1h tier loses vs the 1m tier; Pettitt locates the most likely
mean shift a retention tier should snapshot around; burstiness says
whether gap-fill can assume near-regular spacing. Exactness: bucket
sums/counts and interarrival sums fold exact int64; per-bucket means
are doubles derived from IDENTICAL integers on both sides; final
statistics are mirrored doubles, x1e6 snap.
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

_MIN_US = 60_000_000
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


def _minute_cells(sf_dir):
    """Exact (type, minute, sum_x100, count) cells — the 1m tier's
    sufficient statistics, shared by the shrinkage audit."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        m = (us // _MIN_US).astype(np.int64)
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "m": pa.array(m),
                "s": pa.array(x),
                "c": pa.array(np.ones(len(x), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "m"], ["s", "c"])

    return tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "m"], ["s", "c"]),
    ).to_pandas()  # bounded: types x observed minutes


# ---------------------------------------------------------------------------
# variance shrinkage from the 1m tier to the 1h tier
# ---------------------------------------------------------------------------


def q_tier_variance_shrinkage(sf_dir):
    """Per event type: the ratio of the variance of HOURLY bucket means
    to the variance of MINUTE bucket means — the downsampling audit for
    the tier chain (ratio << 1 quantifies exactly how much signal
    dispersion the 1h tier smooths away vs the 1m tier; near 1 means
    the coarse tier is a faithful summary). The hour cells derive from
    the minute cells by EXACT re-aggregation of integer (sum, count)
    partials — the same invariant tier_parity_1h proves — so both
    grains' bucket means divide identical integers; the two variances
    and their ratio are mirrored doubles, x1e6 snap."""
    cells = _minute_cells(sf_dir)
    if not len(cells) or "event_type" not in cells.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "k_1m": pa.array([], pa.int64()),
                "k_1h": pa.array([], pa.int64()),
                "ratio_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "k_1m": [], "k_1h": [], "ratio_x1e6": []}
    per_hour_factor = _HOUR_US // _MIN_US

    def var_of_means(s: np.ndarray, c: np.ndarray):
        m = s.astype(np.float64) / c
        k = len(m)
        if k < 2:
            return None, k
        sm = float(np.sum(m))
        sm2 = float(np.sum(m * m))
        return (sm2 - sm * sm / k) / (k - 1), k

    for et, g in cells.sort_values(["event_type", "m"]).groupby(
        "event_type", sort=True
    ):
        s = g["s"].to_numpy(dtype=np.int64)
        c = g["c"].to_numpy(dtype=np.int64)
        v1m, k1m = var_of_means(s, c)
        hb = g["m"].to_numpy(dtype=np.int64) // per_hour_factor
        hg = pd.DataFrame({"h": hb, "s": s, "c": c}).groupby("h", sort=True)[
            ["s", "c"]
        ].sum()
        v1h, k1h = var_of_means(
            hg["s"].to_numpy(dtype=np.int64), hg["c"].to_numpy(dtype=np.int64)
        )
        out["event_type"].append(et)
        out["k_1m"].append(k1m)
        out["k_1h"].append(k1h)
        out["ratio_x1e6"].append(
            None
            if v1m in (None, 0.0) or v1h is None
            else int(_round_half_away(np.array([v1h / v1m * 1e6]))[0])
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "k_1m": pa.array(out["k_1m"], pa.int64()),
            "k_1h": pa.array(out["k_1h"], pa.int64()),
            "ratio_x1e6": pa.array(out["ratio_x1e6"], pa.int64()),
        }
    )


SHRINKAGE_SQL = """
WITH mc AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 60000000) AS BIGINT) AS m,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), m1 AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k,
         SUM(CAST(s AS DOUBLE) / c) AS sm,
         SUM((CAST(s AS DOUBLE) / c) * (CAST(s AS DOUBLE) / c)) AS sm2
  FROM mc GROUP BY 1
), hc AS (
  SELECT event_type, CAST(FLOOR(m / 60) AS BIGINT) AS h,
         CAST(SUM(s) AS BIGINT) AS s, CAST(SUM(c) AS BIGINT) AS c
  FROM mc GROUP BY 1, 2
), h1 AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k,
         SUM(CAST(s AS DOUBLE) / c) AS sm,
         SUM((CAST(s AS DOUBLE) / c) * (CAST(s AS DOUBLE) / c)) AS sm2
  FROM hc GROUP BY 1
)
SELECT m1.event_type, m1.k AS k_1m, h1.k AS k_1h,
       CASE WHEN m1.k < 2 OR h1.k < 2
              OR (m1.sm2 - m1.sm * m1.sm / m1.k) / (m1.k - 1) = 0
            THEN NULL
            ELSE CAST(ROUND(
              ((h1.sm2 - h1.sm * h1.sm / h1.k) / (h1.k - 1))
              / ((m1.sm2 - m1.sm * m1.sm / m1.k) / (m1.k - 1))
              * 1000000, 0) AS BIGINT) END AS ratio_x1e6
FROM m1 JOIN h1 ON h1.event_type = m1.event_type
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Pettitt change-point statistic over hourly means
# ---------------------------------------------------------------------------


def q_pettitt_change_point(sf_dir):
    """Per event type: the Pettitt rank change-point statistic over the
    HOURLY mean series — K = max_t |U_t| with U_t = sum_{i<=t}
    sum_{j>t} sign(xbar_i - xbar_j), the nonparametric locator of the
    single most likely mean shift (the hour a retention tier should
    snapshot around). Uses the antisymmetry identity U_t = cumulative
    sum of v_i = sum_j sign(x_i - x_j), so the fold is O(buckets²) on
    the BOUNDED hourly table, never the raw scan. Hourly means divide
    identical exact integers on both sides; K and its arg-hour are
    exact integers."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        h = ((us // _HOUR_US) * _HOUR_US).astype(np.int64)
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "h": pa.array(h),
                "s": pa.array(x),
                "c": pa.array(np.ones(len(x), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "h"], ["s", "c"])

    cells = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "h"], ["s", "c"]),
    ).to_pandas()  # bounded: types x hours

    if not len(cells) or "event_type" not in cells.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_hours": pa.array([], pa.int64()),
                "k_stat": pa.array([], pa.int64()),
                "t_hour_us": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "n_hours": [], "k_stat": [], "t_hour_us": []}
    for et, g in cells.sort_values(["event_type", "h"]).groupby(
        "event_type", sort=True
    ):
        g = g.sort_values("h", ignore_index=True)
        m = g["s"].to_numpy(dtype=np.float64) / g["c"].to_numpy(dtype=np.int64)
        n = len(m)
        out["event_type"].append(et)
        out["n_hours"].append(n)
        if n < 2:
            out["k_stat"].append(None)
            out["t_hour_us"].append(None)
            continue
        sgn = np.sign(m[:, None] - m[None, :]).astype(np.int64)
        v = sgn.sum(axis=1)
        u = np.cumsum(v)[:-1]  # U_t for t = 1..n-1
        k = int(np.max(np.abs(u)))
        t_idx = int(np.argmax(np.abs(u)))
        out["k_stat"].append(k)
        out["t_hour_us"].append(int(g["h"].iloc[t_idx]))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_hours": pa.array(out["n_hours"], pa.int64()),
            "k_stat": pa.array(out["k_stat"], pa.int64()),
            "t_hour_us": pa.array(out["t_hour_us"], pa.int64()),
        }
    )


PETTITT_SQL = """
WITH hc AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) * 3600000000 AS h,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), mm AS MATERIALIZED (
  SELECT event_type, h, CAST(s AS DOUBLE) / c AS x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM hc
), v AS MATERIALIZED (
  SELECT a.event_type, a.h, a.rn, a.n,
         CAST(SUM(SIGN(a.x - b.x)) AS BIGINT) AS v
  FROM mm a JOIN mm b ON b.event_type = a.event_type
  GROUP BY 1, 2, 3, 4
), u AS (
  SELECT event_type, h, n,
         CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY rn
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS u,
         rn
  FROM v
), k AS (
  SELECT event_type, MAX(n) AS n_hours, CAST(MAX(ABS(u)) AS BIGINT) AS k_stat
  FROM u WHERE rn < n GROUP BY 1
)
SELECT k.event_type, CAST(k.n_hours AS BIGINT) AS n_hours,
       CASE WHEN k.n_hours < 2 THEN NULL ELSE k.k_stat END AS k_stat,
       CASE WHEN k.n_hours < 2 THEN NULL
            ELSE (SELECT MIN(u.h) FROM u
                  WHERE u.event_type = k.event_type AND u.rn < u.n
                    AND ABS(u.u) = k.k_stat) END AS t_hour_us
FROM k ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Goh-Barabási burstiness of interarrival times per type
# ---------------------------------------------------------------------------


def q_burstiness_interarrival(sf_dir):
    """Per event type: the Goh-Barabási burstiness coefficient B =
    (sigma - mu) / (sigma + mu) of SECOND-grain interarrival times —
    the [-1, 1] normalization of interarrival dispersion (B = -1
    periodic, 0 Poisson, -> 1 extreme bursts) that tells the gap-fill
    stage whether LOCF over regular spacing is a safe assumption. One
    series-key hash shuffle; (n, sum dt, sum dt²) fold exact int64 at
    seconds grain; B is one mirrored double per type, x1e6 snap."""
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
                "s1": pd.Series([], dtype=np.int64),
                "s2": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "event_type", "ts", "event_id")
        t_s = (
            g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 1_000_000
        )
        dt = np.zeros(len(g), dtype=np.int64)
        dt[1:] = t_s[1:] - t_s[:-1]
        d = pd.DataFrame(
            {"event_type": g["event_type"].to_numpy()[same], "dt": dt[same]}
        )
        if not len(d):
            return empty
        a = d.groupby("event_type", sort=False)["dt"].agg(n="size", s1="sum")
        a["s2"] = d.assign(q=d["dt"] * d["dt"]).groupby(
            "event_type", sort=False
        )["q"].sum()
        return a.reset_index().astype(
            {"n": np.int64, "s1": np.int64, "s2": np.int64}
        )

    stats = (
        proj.groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(stats) or "event_type" not in stats.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_gaps": pa.array([], pa.int64()),
                "b_x1e6": pa.array([], pa.int64()),
            }
        )
    stats = stats.sort_values("event_type", ignore_index=True)
    bs = []
    for i in range(len(stats)):
        n = int(stats["n"].iloc[i])
        s1 = int(stats["s1"].iloc[i])
        s2 = int(stats["s2"].iloc[i])
        if n < 2:
            bs.append(None)
            continue
        mu = float(s1) / n
        var = (float(s2) - float(s1) * s1 / n) / (n - 1)
        sd = np.sqrt(var)
        if sd + mu == 0.0:
            bs.append(None)
            continue
        bs.append(
            int(_round_half_away(np.array([(sd - mu) / (sd + mu) * 1e6]))[0])
        )
    return pa.table(
        {
            "event_type": pa.array(stats["event_type"].tolist(), pa.string()),
            "n_gaps": pa.array(stats["n"].to_numpy(dtype=np.int64)),
            "b_x1e6": pa.array(bs, pa.int64()),
        }
    )


BURSTINESS_SQL = """
WITH v AS (
  SELECT event_type, ts, event_id,
         CAST(FLOOR(EPOCH_US(ts) / 1000000) AS BIGINT) AS t_s
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), g AS (
  SELECT event_type,
         t_s - LAG(t_s) OVER (PARTITION BY event_type
                              ORDER BY ts, event_id) AS dt
  FROM v
), a AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dt) AS BIGINT) AS s1,
         CAST(SUM(dt * dt) AS BIGINT) AS s2
  FROM g WHERE dt IS NOT NULL GROUP BY 1
)
SELECT event_type, n AS n_gaps,
       CASE WHEN n < 2
              OR SQRT((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))
                 + CAST(s1 AS DOUBLE) / n = 0
            THEN NULL
            ELSE CAST(ROUND(
              (SQRT((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))
               - CAST(s1 AS DOUBLE) / n)
              / (SQRT((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))
                 + CAST(s1 AS DOUBLE) / n)
              * 1000000, 0) AS BIGINT) END AS b_x1e6
FROM a ORDER BY 1
"""


def register_r4cs(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "tier_variance_shrinkage": q_tier_variance_shrinkage,
            "pettitt_change_point": q_pettitt_change_point,
            "burstiness_interarrival": q_burstiness_interarrival,
        }
    )
    oracles.update(
        {
            "tier_variance_shrinkage": SHRINKAGE_SQL,
            "pettitt_change_point": PETTITT_SQL,
            "burstiness_interarrival": BURSTINESS_SQL,
        }
    )
