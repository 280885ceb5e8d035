"""Round-4 batch ED: Haar wavelet energy decomposition of hourly
counts, the Hodges-Lehmann weekday-weekend daily-total shift, and a
CUPED variance-reduction audit over per-user split-half counts.

Exactness discipline: Haar detail coefficients are signed integer
sums over dense 0-filled hourly counts, so per-scale energies fold as
exact int64; Hodges-Lehmann selects an ACTUAL pairwise difference of
integer daily totals at the PERCENTILE_DISC rank, so the shift is
exact; CUPED moments fold as exact int64 per-user counts and only
theta / rho^2 are mirrored doubles, x1e6 snap."""

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


def _hourly_counts(sf_dir) -> pd.DataFrame:
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

    return tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "h"], ["c"]),
    ).to_pandas()


# ---------------------------------------------------------------------------
# Haar wavelet per-scale detail energy over dense hourly counts
# ---------------------------------------------------------------------------


def q_haar_wavelet_energy(sf_dir):
    """Per event type and dyadic scale 2^k hours (k = 1..5): the Haar
    wavelet detail energy — sum over complete blocks of (first-half sum
    - second-half sum)^2 of the dense 0-filled hourly series — the
    multi-resolution burst spectrum that tells a downsampler which tier
    (2h / 4h / ... / 32h) still holds structure and which is safe to
    collapse. Signed integer block sums keep every energy exact int64."""
    hourly = _hourly_counts(sf_dir)
    cols = ["event_type", "scale_hours", "n_blocks", "energy"]
    if not len(hourly) or "event_type" not in hourly.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                **{c: pa.array([], pa.int64()) for c in cols[1:]},
            }
        )
    types = sorted(hourly["event_type"].unique())
    hmin = int(hourly["h"].min())
    hmax = int(hourly["h"].max())
    width = hmax - hmin + 1
    tix = {t: i for i, t in enumerate(types)}
    mat = np.zeros((len(types), width), dtype=np.int64)
    mat[
        hourly["event_type"].map(tix).to_numpy(),
        hourly["h"].to_numpy(dtype=np.int64) - hmin,
    ] = hourly["c"].to_numpy(dtype=np.int64)
    out = {c: [] for c in cols}
    for t in types:
        c = mat[tix[t]]
        for k in range(1, 6):
            size = 1 << k
            half = size >> 1
            nb = width // size
            if nb == 0:
                continue
            trimmed = c[: nb * size].reshape(nb, size)
            detail = (
                trimmed[:, :half].sum(axis=1) - trimmed[:, half:].sum(axis=1)
            )
            out["event_type"].append(t)
            out["scale_hours"].append(size)
            out["n_blocks"].append(nb)
            out["energy"].append(int(np.sum(detail * detail)))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


HAAR_SQL = """
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
), scales AS (
  SELECT * FROM (VALUES (2, 1), (4, 2), (8, 4), (16, 8), (32, 16))
    AS s(size, half)
), details AS (
  SELECT d.event_type, s.size,
         d.i // s.size AS blk,
         CAST(SUM(CASE WHEN (d.i // s.half) % 2 = 0 THEN d.c
                       ELSE -d.c END) AS BIGINT) AS detail
  FROM dense d
  CROSS JOIN scales s
  CROSS JOIN bounds b
  WHERE d.i < (b.width // s.size) * s.size
  GROUP BY 1, 2, 3
)
SELECT event_type, CAST(size AS BIGINT) AS scale_hours,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(detail * detail) AS BIGINT) AS energy
FROM details GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Hodges-Lehmann weekday-weekend shift of daily totals
# ---------------------------------------------------------------------------


def q_hodges_lehmann_daily_shift(sf_dir):
    """Per event type: the Hodges-Lehmann location shift between
    weekday and weekend daily event totals — the PERCENTILE_DISC median
    of all n*m pairwise differences (weekday - weekend), an ACTUAL
    integer difference, the robust 'how many more events does a
    weekday carry' estimator behind the Mann-Whitney test. Exact
    end to end (selection over exact integer pair differences)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        t = pa.table(
            {
                "event_type": b["event_type"],
                "day": pa.array((us // _DAY_US).astype(np.int64)),
                "c": pa.array(np.ones(len(us), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "day"], ["c"])

    daily = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "day"], ["c"]),
    ).to_pandas()
    cols = ["event_type", "n_pairs", "hl_shift"]
    if not len(daily) or "event_type" not in daily.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_pairs": pa.array([], pa.int64()),
                "hl_shift": pa.array([], pa.int64()),
            }
        )
    dow = (daily["day"] + 4) % 7  # Sunday = 0
    daily["we"] = ((dow == 0) | (dow == 6)).astype(np.int64)
    out = {c: [] for c in cols}
    for et, g in daily.groupby("event_type", sort=True):
        a = g.loc[g["we"] == 0, "c"].to_numpy(dtype=np.int64)
        b = g.loc[g["we"] == 1, "c"].to_numpy(dtype=np.int64)
        if len(a) == 0 or len(b) == 0:
            continue
        diffs = np.sort((a[:, None] - b[None, :]).ravel())
        nm = len(diffs)
        out["event_type"].append(et)
        out["n_pairs"].append(nm)
        # PERCENTILE_DISC(0.5): 1-based rank ceil(nm/2)
        out["hl_shift"].append(int(diffs[(nm + 1) // 2 - 1]))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_pairs": pa.array(out["n_pairs"], pa.int64()),
            "hl_shift": pa.array(out["hl_shift"], pa.int64()),
        }
    )


HL_SHIFT_SQL = """
WITH d AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 86400000000) AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), lab AS (
  SELECT event_type, c,
         CASE WHEN (day + 4) % 7 IN (0, 6) THEN 1 ELSE 0 END AS we
  FROM d
), pairs AS (
  SELECT a.event_type, a.c - b.c AS diff
  FROM lab a JOIN lab b
    ON a.event_type = b.event_type AND a.we = 0 AND b.we = 1
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(quantile_disc(diff, 0.5) AS BIGINT) AS hl_shift
FROM pairs GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# CUPED variance-reduction audit over split-half per-user counts
# ---------------------------------------------------------------------------


def q_cuped_variance_reduction(sf_dir):
    """Per event type: the CUPED audit — split the global day span at
    its midpoint, count each user's first-half (covariate x) and
    second-half (metric y) events of the type, and report theta =
    cov(x,y)/var(x) plus the variance-reduction factor rho^2 — how much
    an A/B experiment on this metric would shrink its confidence
    intervals by regressing out pre-period activity. Users with any
    event of the type participate (missing half = 0). Moment sums fold
    as exact int64; theta / rho^2 are mirrored doubles, x1e6 snap."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id", "ts"]
    )

    # pass 1: global day bounds (tiny aggregate)
    import pyarrow.parquet as _pq  # noqa: F401

    def day_bounds(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table(
                {"mn": pa.array([], pa.int64()), "mx": pa.array([], pa.int64())}
            )
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "mn": pa.array([int(pc.min(us).as_py() // _DAY_US)], pa.int64()),
                "mx": pa.array([int(pc.max(us).as_py() // _DAY_US)], pa.int64()),
            }
        )

    bounds = ev.map_batches(
        day_bounds, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if not len(bounds):
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_users": pa.array([], pa.int64()),
                "theta_x1e6": pa.array([], pa.int64()),
                "rho2_x1e6": pa.array([], pa.int64()),
            }
        )
    dmin, dmax = int(bounds["mn"].min()), int(bounds["mx"].max())
    mid = (dmin + dmax + 1) // 2

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "user_id", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        day = (us // _DAY_US).astype(np.int64)
        first = (day < mid).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "user_id": b["user_id"],
                "x": pa.array(first),
                "y": pa.array(1 - first),
            }
        )
        return _sum_by(t, ["event_type", "user_id"], ["x", "y"])

    per_user = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "user_id"], ["x", "y"]),
        final_shards=8,
        shard_cols=["event_type", "user_id"],
    )

    def moments(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                **{c: pa.array([], pa.int64())
                   for c in ("n", "sx", "sy", "sxx", "syy", "sxy")},
            }
        )
        if b.num_rows == 0 or "event_type" not in b.column_names:
            return empty
        x = b["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "n": pa.array(np.ones(len(x), np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxx": pa.array(x * x),
                "syy": pa.array(y * y),
                "sxy": pa.array(x * y),
            }
        )
        return _sum_by(t, ["event_type"], ["n", "sx", "sy", "sxx", "syy", "sxy"])

    agg = tree_merge(
        per_user.map_batches(moments, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(
            b, ["event_type"], ["n", "sx", "sy", "sxx", "syy", "sxy"]
        ),
    ).to_pandas()
    cols = ["event_type", "n_users", "theta_x1e6", "rho2_x1e6"]
    if not len(agg) or "event_type" not in agg.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                **{c: pa.array([], pa.int64()) for c in cols[1:]},
            }
        )
    agg = agg.sort_values("event_type", ignore_index=True)
    out = {c: [] for c in cols}
    for i in range(len(agg)):
        n = int(agg["n"].iloc[i])
        sx, sy = int(agg["sx"].iloc[i]), int(agg["sy"].iloc[i])
        sxx, syy = int(agg["sxx"].iloc[i]), int(agg["syy"].iloc[i])
        sxy = int(agg["sxy"].iloc[i])
        covn = n * sxy - sx * sy
        varxn = n * sxx - sx * sx
        varyn = n * syy - sy * sy
        theta = None if varxn <= 0 else float(covn) / float(varxn)
        rho2 = (
            None
            if varxn <= 0 or varyn <= 0
            else (float(covn) * float(covn))
            / (float(varxn) * float(varyn))
        )
        out["event_type"].append(agg["event_type"].iloc[i])
        out["n_users"].append(n)
        out["theta_x1e6"].append(
            None if theta is None else _round_half_away(theta * 1e6)
        )
        out["rho2_x1e6"].append(
            None if rho2 is None else _round_half_away(rho2 * 1e6)
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_users": pa.array(out["n_users"], pa.int64()),
            "theta_x1e6": pa.array(out["theta_x1e6"], pa.int64()),
            "rho2_x1e6": pa.array(out["rho2_x1e6"], pa.int64()),
        }
    )


CUPED_SQL = """
WITH bounds AS MATERIALIZED (
  SELECT (MIN(CAST(FLOOR(EPOCH_US(ts) / 86400000000) AS BIGINT))
          + MAX(CAST(FLOOR(EPOCH_US(ts) / 86400000000) AS BIGINT)) + 1)
         // 2 AS mid
  FROM events WHERE ts IS NOT NULL
), u AS MATERIALIZED (
  SELECT event_type, user_id,
         CAST(SUM(CASE WHEN CAST(FLOOR(EPOCH_US(ts) / 86400000000)
                             AS BIGINT) < b.mid
                       THEN 1 ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN CAST(FLOOR(EPOCH_US(ts) / 86400000000)
                             AS BIGINT) >= b.mid
                       THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM events, bounds b
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    AND ts IS NOT NULL
  GROUP BY 1, 2
), m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM u GROUP BY 1
)
SELECT event_type, n AS n_users,
       CASE WHEN n * sxx - sx * sx <= 0 THEN NULL
            ELSE CAST(ROUND(
              CAST(n * sxy - sx * sy AS DOUBLE)
              / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000, 0)
              AS BIGINT) END AS theta_x1e6,
       CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0
            THEN NULL
            ELSE CAST(ROUND(
              (CAST(n * sxy - sx * sy AS DOUBLE)
               * CAST(n * sxy - sx * sy AS DOUBLE))
              / (CAST(n * sxx - sx * sx AS DOUBLE)
                 * CAST(n * syy - sy * sy AS DOUBLE)) * 1000000, 0)
              AS BIGINT) END AS rho2_x1e6
FROM m ORDER BY 1
"""


def register_r4ed(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "haar_wavelet_energy": q_haar_wavelet_energy,
            "hodges_lehmann_daily_shift": q_hodges_lehmann_daily_shift,
            "cuped_variance_reduction": q_cuped_variance_reduction,
        }
    )
    oracles.update(
        {
            "haar_wavelet_energy": HAAR_SQL,
            "hodges_lehmann_daily_shift": HL_SHIFT_SQL,
            "cuped_variance_reduction": CUPED_SQL,
        }
    )
