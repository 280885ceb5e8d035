"""Round-4 batch DB: Cronbach's alpha over day-of-week "items", the
one-way intraclass correlation ICC(1,1) across users, and the
two-sample power calculation for detecting a 1% mean shift.

Reliability + experiment-design operators: alpha asks whether the seven
weekday diurnal profiles measure one underlying shape; ICC asks how
much of the value variance is BETWEEN users (the clustering that breaks
i.i.d. sampling assumptions); the power calc turns each type's variance
into the sample size an A/B test would need. Exactness: all folds are
exact int64 (hour x dow cell sums, per-user sufficient statistics
complete in their hash bucket); final expressions are mirrored doubles
with shared z-quantile literals, x1e6 snap.
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
_Z_ALPHA = 1.959963984540054  # two-sided 5%
_Z_POWER = 0.8416212335729143  # 80% power


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _round_half_away_x(x: np.ndarray, scale: float) -> np.ndarray:
    y = x * scale
    return np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)).astype(
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
# Cronbach's alpha: dow profiles as items, hours as cases
# ---------------------------------------------------------------------------


def q_cronbach_alpha_dow_items(sf_dir):
    """Per event type: Cronbach's alpha treating the 7 day-of-week
    hourly-mean profiles as items scored over the 24 hour "cases" —
    alpha = k/(k-1) * (1 - sum(item variances) / variance of the item
    SUM), the internal-consistency question "do all weekdays trace the
    same diurnal shape". Cell means divide identical exact integers
    (24 x 7 bounded); the variances are mirrored double folds; NULL
    unless the full grid is populated or if the total variance
    degenerates. x1e6 snap."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        h = ((us // _HOUR_US) % 24).astype(np.int64)
        d = ((np.floor_divide(us, _DAY_US) + 4) % 7).astype(np.int64)
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "h": pa.array(h),
                "d": pa.array(d),
                "s": pa.array(x),
                "c": pa.array(np.ones(len(x), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "h", "d"], ["s", "c"])

    cells = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "h", "d"], ["s", "c"]),
    ).to_pandas()  # bounded: types x 24 x 7

    if not len(cells) or "event_type" not in cells.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_cells": pa.array([], pa.int64()),
                "alpha_x1e6": pa.array([], pa.int64()),
            }
        )
    K = 7
    out = {"event_type": [], "n_cells": [], "alpha_x1e6": []}
    for et, g in cells.sort_values(["event_type", "d", "h"]).groupby(
        "event_type", sort=True
    ):
        out["event_type"].append(et)
        out["n_cells"].append(len(g))
        if len(g) != 24 * K:
            out["alpha_x1e6"].append(None)
            continue
        m = g["s"].to_numpy(dtype=np.float64) / g["c"].to_numpy(dtype=np.int64)
        M = np.zeros((24, K), dtype=np.float64)
        M[g["h"].to_numpy(dtype=np.int64), g["d"].to_numpy(dtype=np.int64)] = m

        def var24(v: np.ndarray) -> float:
            sm = float(np.sum(v))
            sm2 = float(np.sum(v * v))
            return (sm2 - sm * sm / 24) / 23

        item_vars = sum(var24(M[:, j]) for j in range(K))
        total_var = var24(M.sum(axis=1))
        if total_var == 0.0:
            out["alpha_x1e6"].append(None)
            continue
        alpha = K / (K - 1.0) * (1.0 - item_vars / total_var)
        out["alpha_x1e6"].append(
            int(_round_half_away(np.array([alpha * 1e6]))[0])
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_cells": pa.array(out["n_cells"], pa.int64()),
            "alpha_x1e6": pa.array(out["alpha_x1e6"], pa.int64()),
        }
    )


CRONBACH_SQL = """
WITH cell AS MATERIALIZED (
  SELECT event_type, hour(ts) AS h, dayofweek(ts) AS d,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2, 3
), m AS MATERIALIZED (
  SELECT event_type, h, d, CAST(s AS DOUBLE) / c AS y FROM cell
), nc AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cells FROM m GROUP BY 1
), iv AS (
  -- per-item (dow) variance over the 24 hour cases, then summed
  SELECT event_type, SUM(v) AS item_vars FROM (
    SELECT event_type, d,
           (SUM(y * y) - SUM(y) * SUM(y) / 24) / 23 AS v
    FROM m GROUP BY 1, 2
  ) GROUP BY 1
), rowsum AS (
  SELECT event_type, h, SUM(y) AS r FROM m GROUP BY 1, 2
), tv AS (
  SELECT event_type,
         (SUM(r * r) - SUM(r) * SUM(r) / 24) / 23 AS total_var
  FROM rowsum GROUP BY 1
)
SELECT nc.event_type, nc.n_cells,
       CASE WHEN nc.n_cells <> 168 OR tv.total_var = 0 THEN NULL
            ELSE CAST(ROUND(7 / 6.0 * (1.0 - iv.item_vars / tv.total_var)
                 * 1000000, 0) AS BIGINT) END AS alpha_x1e6
FROM nc
JOIN iv ON iv.event_type = nc.event_type
JOIN tv ON tv.event_type = nc.event_type
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# intraclass correlation ICC(1,1) across users
# ---------------------------------------------------------------------------


def q_icc_user_values(sf_dir):
    """One-row clustering diagnostic: the one-way intraclass correlation
    ICC(1,1) of x100 values grouped by user — (MSB - MSW) / (MSB +
    (k0 - 1) MSW) with the unbalanced-design k0 = (N - sum n_u²/N) /
    (k - 1) — the fraction of variance that lives BETWEEN users; high
    ICC means rows from one user are near-duplicates for sampling
    purposes and the effective sample size shrinks accordingly.
    Per-user (n, s1, s2) are complete inside their hash bucket and
    second-level sums fold exact int64; the ICC is one mirrored
    double, x1e6 snap."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _clean(b, ("user_id", "value"))
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "n": pa.array(np.ones(len(x), np.int64)),
                "s1": pa.array(x),
                "s2": pa.array(x * x),
            }
        )
        return add_bucket(
            _sum_by(t, ["user_id"], ["n", "s1", "s2"]), "user_id", 64
        )

    bucketed = ev.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "k": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
                "s1": pd.Series([], dtype=np.int64),
                "s2": pd.Series([], dtype=np.int64),
                "sn2": pd.Series([], dtype=np.int64),
                "ssb_num": pd.Series([], dtype=np.float64),
            }
        )
        if len(g) == 0:
            return empty
        per = g.groupby("user_id", sort=False)[["n", "s1", "s2"]].sum()
        nu = per["n"].to_numpy(dtype=np.int64)
        s1u = per["s1"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "k": [len(per)],
                "n": [int(nu.sum())],
                "s1": [int(s1u.sum())],
                "s2": [int(per["s2"].sum())],
                "sn2": [int((nu * nu).sum())],
                "ssb_num": [
                    float(np.sum(s1u.astype(np.float64) * s1u / nu))
                ],
            }
        )

    parts = bucketed.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    ).to_pandas()

    if not len(parts) or "k" not in parts.columns:
        return pa.table(
            {
                "k_users": pa.array([0], pa.int64()),
                "n": pa.array([0], pa.int64()),
                "icc_x1e6": pa.array([None], pa.int64()),
            }
        )
    k = int(parts["k"].sum())
    n = int(parts["n"].sum())
    s1 = int(parts["s1"].sum())
    s2 = int(parts["s2"].sum())
    sn2 = int(parts["sn2"].sum())
    ssb_raw = float(parts["ssb_num"].sum())
    if k < 2 or n <= k:
        icc = None
    else:
        ssb = ssb_raw - float(s1) * s1 / n
        sst = float(s2) - float(s1) * s1 / n
        ssw = sst - ssb
        msb = ssb / (k - 1)
        msw = ssw / (n - k)
        k0 = (n - float(sn2) / n) / (k - 1)
        den = msb + (k0 - 1.0) * msw
        icc = (
            None
            if den == 0.0
            else int(
                _round_half_away(np.array([(msb - msw) / den * 1e6]))[0]
            )
        )
    return pa.table(
        {
            "k_users": pa.array([k], pa.int64()),
            "n": pa.array([n], pa.int64()),
            "icc_x1e6": pa.array([icc], pa.int64()),
        }
    )


ICC_SQL = """
WITH v AS (
  SELECT user_id, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
), per AS MATERIALIZED (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s1, CAST(SUM(x * x) AS BIGINT) AS s2
  FROM v GROUP BY 1
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(s1) AS BIGINT) AS s1, CAST(SUM(s2) AS BIGINT) AS s2,
         CAST(SUM(n * n) AS BIGINT) AS sn2,
         SUM(CAST(s1 AS DOUBLE) * s1 / n) AS ssb_raw
  FROM per
), c AS (
  SELECT k, n,
         (ssb_raw - CAST(s1 AS DOUBLE) * s1 / n) / (k - 1) AS msb,
         ((s2 - CAST(s1 AS DOUBLE) * s1 / n)
          - (ssb_raw - CAST(s1 AS DOUBLE) * s1 / n)) / (n - k) AS msw,
         (n - CAST(sn2 AS DOUBLE) / n) / (k - 1) AS k0
  FROM t WHERE k >= 2 AND n > k
)
SELECT COALESCE(k, 0) AS k_users, COALESCE(n, 0) AS n,
       CASE WHEN k IS NULL OR msb + (k0 - 1.0) * msw = 0 THEN NULL
            ELSE CAST(ROUND((msb - msw) / (msb + (k0 - 1.0) * msw)
                 * 1000000, 0) AS BIGINT) END AS icc_x1e6
FROM (SELECT * FROM c UNION ALL
      SELECT NULL, NULL, NULL, NULL, NULL WHERE NOT EXISTS
        (SELECT 1 FROM c))
"""


# ---------------------------------------------------------------------------
# required two-sample size to detect a 1% mean shift
# ---------------------------------------------------------------------------


def q_required_n_1pct_shift(sf_dir):
    """Per event type: the per-arm sample size a two-sample z-test needs
    to detect a 1% shift of the mean at alpha = 5% (two-sided) with 80%
    power — n = 2 (z_a + z_b)² sigma² / delta², the experiment-design
    step that says whether an A/B test on this metric is even feasible.
    (n, s1, s2) fold exact int64; sigma², delta = 0.01 * mean and the
    ceiling are mirrored doubles with shared z literals; NULL on a zero
    mean or variance. Output is the integer ceiling per-arm size."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "value"))
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table(
            {
                "g": b["event_type"],
                "n": pa.array(np.ones(len(x), np.int64)),
                "s1": pa.array(x),
                "s2": pa.array(x * x),
            }
        )
        return _sum_by(t, ["g"], ["n", "s1", "s2"])

    grp = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["g"], ["n", "s1", "s2"]),
    ).to_pandas()

    if not len(grp) or "g" not in grp.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_obs": pa.array([], pa.int64()),
                "required_n": pa.array([], pa.int64()),
            }
        )
    grp = grp.sort_values("g", ignore_index=True)
    outs = {"event_type": [], "n_obs": [], "required_n": []}
    zsum2 = (_Z_ALPHA + _Z_POWER) * (_Z_ALPHA + _Z_POWER)
    for i in range(len(grp)):
        n = int(grp["n"].iloc[i])
        s1 = int(grp["s1"].iloc[i])
        s2 = int(grp["s2"].iloc[i])
        outs["event_type"].append(grp["g"].iloc[i])
        outs["n_obs"].append(n)
        if n < 2 or s1 == 0:
            outs["required_n"].append(None)
            continue
        var = (float(s2) - float(s1) * s1 / n) / (n - 1)
        mean = float(s1) / n
        delta = 0.01 * mean
        if var == 0.0 or delta == 0.0:
            outs["required_n"].append(None)
            continue
        raw = 2.0 * zsum2 * var / (delta * delta)
        outs["required_n"].append(int(np.ceil(raw)))
    return pa.table(
        {
            "event_type": pa.array(outs["event_type"], pa.string()),
            "n_obs": pa.array(outs["n_obs"], pa.int64()),
            "required_n": pa.array(outs["required_n"], pa.int64()),
        }
    )


REQUIRED_N_SQL = f"""
WITH v AS (
  SELECT event_type AS g, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), a AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s1, CAST(SUM(x * x) AS BIGINT) AS s2
  FROM v GROUP BY 1
)
SELECT g AS event_type, n AS n_obs,
       CASE WHEN n < 2 OR s1 = 0
              OR (s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) = 0
              OR 0.01 * (CAST(s1 AS DOUBLE) / n) = 0
            THEN NULL
            ELSE CAST(CEIL(
              2.0 * {(_Z_ALPHA + _Z_POWER) ** 2!r}
              * ((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))
              / ((0.01 * (CAST(s1 AS DOUBLE) / n))
                 * (0.01 * (CAST(s1 AS DOUBLE) / n)))) AS BIGINT) END
         AS required_n
FROM a ORDER BY 1
"""


def register_r4db(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "cronbach_alpha_dow_items": q_cronbach_alpha_dow_items,
            "icc_user_values": q_icc_user_values,
            "required_n_1pct_shift": q_required_n_1pct_shift,
        }
    )
    oracles.update(
        {
            "cronbach_alpha_dow_items": CRONBACH_SQL,
            "icc_user_values": ICC_SQL,
            "required_n_1pct_shift": REQUIRED_N_SQL,
        }
    )
