"""Round-4 batch ID: behavioral monoculture, catalog naming
economics, and diurnal non-uniformity — the user type-loyalty
census (what share of each user's events is their single
favorite type, and how many users are >=50% monocultures), the
name-length × price correlation (do pricier parts get longer
names — the copywriting budget test), and the Rayleigh test per
event type (n·R̄² over hour-of-day angles: which streams are
truly diurnal versus flat).

Exactness discipline: loyalty shares are exact integer ratios;
the name/price correlation folds exact integer moment sums
(chars × cents); Rayleigh resultants build from exact 24-cell
hour-of-day counts with mirrored trigonometry."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _HOUR_US,
    _round_half_away,
    _type_cell_counts,
)
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_UTL_COLS = ["n_users", "n_monoculture", "monoculture_ppm",
             "mean_top_share_ppm"]


def q_user_type_loyalty(sf_dir):
    """Behavioral monoculture: per user, the share of their
    events taken by their single most-used event type; the count
    of users at or above 50% (exact cross-multiplied integer
    test 2·top ≥ total) and the mean top-share — high
    monoculture means per-type personalization is really
    per-user personalization.  (user, type) counts fold exactly
    in disjoint shards."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "event_type"))
        t = pa.table({
            "u": b["user_id"].cast(pa.int64()),
            "et": b["event_type"].cast(pa.string()),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["u", "et"]).aggregate([("n", "sum")])
        return g.rename_columns(["u", "et", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["u", "et"]).aggregate([("n", "sum")])
        return g.rename_columns(["u", "et", "n"])

    ut = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["u"],
    ).to_pandas()
    if "u" not in ut.columns or len(ut) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _UTL_COLS})
    agg = ut.groupby("u")["n"].agg(["max", "sum"]).reset_index()
    top = agg["max"].to_numpy(np.int64)
    tot = agg["sum"].to_numpy(np.int64)
    n_users = len(agg)
    mono = int((2 * top >= tot).sum())
    mean_share = float((top / tot).mean())
    return pa.table({
        "n_users": pa.array([n_users], pa.int64()),
        "n_monoculture": pa.array([mono], pa.int64()),
        "monoculture_ppm": pa.array(
            [_round_half_away(mono / n_users * 1e6)],
            pa.int64()),
        "mean_top_share_ppm": pa.array(
            [_round_half_away(mean_share * 1e6)], pa.int64()),
    })


UTL_SQL = """
WITH ut AS MATERIALIZED (
  SELECT user_id AS u, event_type AS et,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
), pu AS MATERIALIZED (
  SELECT u, CAST(MAX(n) AS BIGINT) AS top,
         CAST(SUM(n) AS BIGINT) AS tot
  FROM ut GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN 2 * top >= tot THEN 1 ELSE 0 END)
            AS BIGINT) AS n_monoculture,
       CAST(ROUND(CAST(SUM(CASE WHEN 2 * top >= tot THEN 1
                                ELSE 0 END) AS DOUBLE)
            / COUNT(*) * 1000000, 0) AS BIGINT)
         AS monoculture_ppm,
       CAST(ROUND(AVG(CAST(top AS DOUBLE) / tot) * 1000000, 0)
            AS BIGINT) AS mean_top_share_ppm
FROM pu HAVING COUNT(*) > 0
"""

_NLP_COLS = ["n_parts", "corr_ppm", "slope_cents_per_char_x1e3"]


def q_name_length_price_corr(sf_dir):
    """The copywriting budget test: Pearson correlation and OLS
    slope of retail price (cents) on part-name length (chars) —
    do pricier parts earn longer names?  Integer moment sums
    (n, Σx, Σy, Σx², Σy², Σxy) fold exactly and combine in
    mirrored double arithmetic."""
    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_name", "p_retailprice"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("p_name", "p_retailprice"))
        if b.num_rows == 0:
            return pa.table({
                "n": pa.array([], pa.int64()),
                "sx": pa.array([], pa.int64()),
                "sy": pa.array([], pa.int64()),
                "sxx": pa.array([], pa.int64()),
                "syy": pa.array([], pa.int64()),
                "sxy": pa.array([], pa.int64()),
            })
        x = pc.utf8_length(b["p_name"]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rp = b["p_retailprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        y = np.where(rp >= 0, np.floor(rp * 100.0 + 0.5),
                     np.ceil(rp * 100.0 - 0.5)).astype(np.int64)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "syy": pa.array([int((y * y).sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64()),
        })

    def comb(b: pa.Table) -> pa.Table:
        out = {}
        for c in ["n", "sx", "sy", "sxx", "syy", "sxy"]:
            out[c] = pa.array(
                [pc.sum(b[c]).as_py() or 0], pa.int64())
        return pa.table(out)

    mm = tree_merge(
        parts.map_batches(part, batch_format="pyarrow",
                          batch_size=None),
        comb,
    ).to_pandas()
    if "n" not in mm.columns or len(mm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _NLP_COLS})
    n = float(mm["n"].sum())
    if n < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _NLP_COLS})
    sx = float(mm["sx"].sum())
    sy = float(mm["sy"].sum())
    sxx = float(mm["sxx"].sum())
    syy = float(mm["syy"].sum())
    sxy = float(mm["sxy"].sum())
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    if denx <= 0 or deny <= 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _NLP_COLS})
    cov = n * sxy - sx * sy
    return pa.table({
        "n_parts": pa.array([int(n)], pa.int64()),
        "corr_ppm": pa.array(
            [_round_half_away(cov / np.sqrt(denx * deny)
                              * 1e6)], pa.int64()),
        "slope_cents_per_char_x1e3": pa.array(
            [_round_half_away(cov / denx * 1e3)], pa.int64()),
    })


NLP_SQL = """
WITH xy AS MATERIALIZED (
  SELECT CAST(LENGTH(p_name) AS BIGINT) AS x,
         CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS y
  FROM part
  WHERE p_name IS NOT NULL AND p_retailprice IS NOT NULL
), mm AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM xy
)
SELECT n AS n_parts,
       CAST(ROUND((n * CAST(sxy AS DOUBLE) -
                   CAST(sx AS DOUBLE) * sy)
            / SQRT((n * CAST(sxx AS DOUBLE) -
                    CAST(sx AS DOUBLE) * sx)
                   * (n * CAST(syy AS DOUBLE) -
                      CAST(sy AS DOUBLE) * sy)) * 1000000, 0)
            AS BIGINT) AS corr_ppm,
       CAST(ROUND((n * CAST(sxy AS DOUBLE) -
                   CAST(sx AS DOUBLE) * sy)
            / (n * CAST(sxx AS DOUBLE) -
               CAST(sx AS DOUBLE) * sx) * 1000, 0) AS BIGINT)
         AS slope_cents_per_char_x1e3
FROM mm
WHERE n >= 3
  AND n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx > 0
  AND n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy > 0
"""

_RAY_COLS = ["event_type", "n_events", "rbar_ppm",
             "rayleigh_z_x1e3"]


def q_rayleigh_test_by_type(sf_dir):
    """Which streams are truly diurnal?  Per event type, the
    Rayleigh statistic z = n·R̄² over hour-of-day angles
    θ = 2π·h/24 — z near 0 means the stream is flat around the
    clock, large z means a hard daily rhythm.  The 24-cell
    (type, hour-of-day) counts fold exactly; the resultant is
    mirrored trigonometry over those cells."""
    cc = _type_cell_counts(sf_dir, "hod", _HOUR_US, 24)
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
            "rbar_ppm": pa.array([], pa.int64()),
            "rayleigh_z_x1e3": pa.array([], pa.int64()),
        })
    ets, ns, rbars, zs = [], [], [], []
    for et, g in cc.groupby("event_type"):
        h = g["hod"].to_numpy(np.int64).astype(np.float64)
        n_h = g["c"].to_numpy(np.int64).astype(np.float64)
        n = n_h.sum()
        if n == 0:
            continue
        theta = 2.0 * np.pi * h / 24.0
        cs = float((n_h * np.cos(theta)).sum())
        sn = float((n_h * np.sin(theta)).sum())
        rbar = np.sqrt(cs * cs + sn * sn) / n
        ets.append(et)
        ns.append(int(n))
        rbars.append(_round_half_away(rbar * 1e6))
        zs.append(_round_half_away(n * rbar * rbar * 1e3))
    order = sorted(range(len(ets)), key=lambda i: ets[i])
    return pa.table({
        "event_type": pa.array(
            [ets[i] for i in order], pa.string()),
        "n_events": pa.array(
            [ns[i] for i in order], pa.int64()),
        "rbar_ppm": pa.array(
            [rbars[i] for i in order], pa.int64()),
        "rayleigh_z_x1e3": pa.array(
            [zs[i] for i in order], pa.int64()),
    })


RAY_SQL = f"""
WITH hc AS MATERIALIZED (
  SELECT event_type,
         (EPOCH_US(ts) // {_HOUR_US}) % 24 AS hod,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), res AS MATERIALIZED (
  SELECT event_type,
         CAST(SUM(c) AS BIGINT) AS n,
         SUM(c * COS(2 * PI() * hod / 24.0)) AS cs,
         SUM(c * SIN(2 * PI() * hod / 24.0)) AS sn
  FROM hc GROUP BY 1
)
SELECT event_type, n AS n_events,
       CAST(ROUND(SQRT(cs * cs + sn * sn) / n * 1000000, 0)
            AS BIGINT) AS rbar_ppm,
       CAST(ROUND(n * (SQRT(cs * cs + sn * sn) / n)
            * (SQRT(cs * cs + sn * sn) / n) * 1000, 0)
            AS BIGINT) AS rayleigh_z_x1e3
FROM res
WHERE n > 0
ORDER BY event_type
"""


def register_r4id(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "user_type_loyalty": q_user_type_loyalty,
            "name_length_price_corr": q_name_length_price_corr,
            "rayleigh_test_by_type": q_rayleigh_test_by_type,
        }
    )
    oracles.update(
        {
            "user_type_loyalty": UTL_SQL,
            "name_length_price_corr": NLP_SQL,
            "rayleigh_test_by_type": RAY_SQL,
        }
    )
