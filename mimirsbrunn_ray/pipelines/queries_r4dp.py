"""Round-4 batch DP: tier-policy economics — the price/volume revenue
bridge between two years, the retention-policy survival simulation
across the raw/1m/1h tiers, and the information loss (KL divergence) of
downsampling hours to day-uniform mass.

All three answer "what does the coarse tier cost / keep": the bridge
decomposes a revenue delta into price and volume effects; the retention
sim counts exactly what survives each tier's window; the KL measures
how much diurnal structure a day-grain tier destroys per type.
Exactness: cells fold exact int64; every logarithm's argument is a
ratio of exact integers; folds mirror token-for-token, x1e6 snap.
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
_BASE_YEAR = 1995
_CURR_YEAR = 1998
# retention windows (days) per tier, measured back from the corpus max ts
_RETENTION = (("raw", 7), ("1m", 30), ("1h", 365))


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
# price/volume revenue bridge between two years
# ---------------------------------------------------------------------------


def q_revenue_bridge_decomp(sf_dir):
    """One-row FP&A revenue bridge between 1995 and 1998 over the parts
    shipped in BOTH years: the revenue delta decomposed into PRICE
    effect sum((p1 - p0) q0), VOLUME effect sum(p0 (q1 - q0)) and the
    joint/mix remainder sum((p1 - p0)(q1 - q0)) — the exact additive
    bridge (the three effects reconstruct the delta to the last
    floating bit, which the output proves by carrying both sides).
    Per-(part, year) cents/quantity sums fold exact int64; unit prices
    divide identical integers; the bridge folds mirrored doubles, x100
    cents snap."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_quantity", "l_extendedprice"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(
            b, ("l_partkey", "l_shipdate", "l_quantity", "l_extendedprice")
        )
        yr = pc.year(b["l_shipdate"].cast(pa.timestamp("us"))).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        keep = (yr == _BASE_YEAR) | (yr == _CURR_YEAR)
        qty = _round_half_away_x(
            b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64),
            1.0,
        )
        cents = _round_half_away_x(
            b["l_extendedprice"].to_numpy(zero_copy_only=False).astype(
                np.float64
            ),
            100.0,
        )
        t = pa.table(
            {
                "p": b["l_partkey"].cast(pa.int64()),
                "yr": pa.array(yr),
                "q": pa.array(qty),
                "v": pa.array(cents),
            }
        ).filter(pa.array(keep))
        return _sum_by(t, ["p", "yr"], ["q", "v"])

    cells = tree_merge(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["p", "yr"], ["q", "v"]),
    ).to_pandas()
    empty = pa.table(
        {
            "n_parts": pa.array([0], pa.int64()),
            "delta_e2": pa.array([None], pa.int64()),
            "price_effect_e2": pa.array([None], pa.int64()),
            "volume_effect_e2": pa.array([None], pa.int64()),
            "mix_effect_e2": pa.array([None], pa.int64()),
        }
    )
    if not len(cells) or "p" not in cells.columns:
        return empty
    base = cells[(cells["yr"] == _BASE_YEAR) & (cells["q"] > 0)]
    curr = cells[(cells["yr"] == _CURR_YEAR) & (cells["q"] > 0)]
    m = base.merge(curr, on="p", suffixes=("0", "1"))
    if not len(m):
        return empty
    m = m.sort_values("p", ignore_index=True)
    q0 = m["q0"].to_numpy(dtype=np.int64).astype(np.float64)
    q1 = m["q1"].to_numpy(dtype=np.int64).astype(np.float64)
    p0 = m["v0"].to_numpy(dtype=np.float64) / m["q0"].to_numpy(dtype=np.int64)
    p1 = m["v1"].to_numpy(dtype=np.float64) / m["q1"].to_numpy(dtype=np.int64)
    price = float(np.sum((p1 - p0) * q0))
    volume = float(np.sum(p0 * (q1 - q0)))
    mix = float(np.sum((p1 - p0) * (q1 - q0)))
    delta = float(np.sum(p1 * q1)) - float(np.sum(p0 * q0))
    return pa.table(
        {
            "n_parts": pa.array([len(m)], pa.int64()),
            "delta_e2": pa.array(
                [int(_round_half_away(np.array([delta]))[0])], pa.int64()
            ),
            "price_effect_e2": pa.array(
                [int(_round_half_away(np.array([price]))[0])], pa.int64()
            ),
            "volume_effect_e2": pa.array(
                [int(_round_half_away(np.array([volume]))[0])], pa.int64()
            ),
            "mix_effect_e2": pa.array(
                [int(_round_half_away(np.array([mix]))[0])], pa.int64()
            ),
        }
    )


BRIDGE_SQL = f"""
WITH cell AS MATERIALIZED (
  SELECT l_partkey AS p, year(l_shipdate) AS yr,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS q,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
              AS BIGINT) AS v
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_shipdate IS NOT NULL
    AND l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    AND year(l_shipdate) IN ({_BASE_YEAR}, {_CURR_YEAR})
  GROUP BY 1, 2
), m AS MATERIALIZED (
  SELECT b.p,
         CAST(b.q AS DOUBLE) AS q0, CAST(c.q AS DOUBLE) AS q1,
         CAST(b.v AS DOUBLE) / b.q AS p0, CAST(c.v AS DOUBLE) / c.q AS p1
  FROM (SELECT * FROM cell WHERE yr = {_BASE_YEAR} AND q > 0) b
  JOIN (SELECT * FROM cell WHERE yr = {_CURR_YEAR} AND q > 0) c
    ON c.p = b.p
), a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         SUM(p1 * q1) - SUM(p0 * q0) AS delta,
         SUM((p1 - p0) * q0) AS price,
         SUM(p0 * (q1 - q0)) AS volume,
         SUM((p1 - p0) * (q1 - q0)) AS mix
  FROM m
)
SELECT n_parts,
       CASE WHEN n_parts = 0 THEN NULL
            ELSE CAST(ROUND(delta, 0) AS BIGINT) END AS delta_e2,
       CASE WHEN n_parts = 0 THEN NULL
            ELSE CAST(ROUND(price, 0) AS BIGINT) END AS price_effect_e2,
       CASE WHEN n_parts = 0 THEN NULL
            ELSE CAST(ROUND(volume, 0) AS BIGINT) END AS volume_effect_e2,
       CASE WHEN n_parts = 0 THEN NULL
            ELSE CAST(ROUND(mix, 0) AS BIGINT) END AS mix_effect_e2
FROM a
"""


# ---------------------------------------------------------------------------
# retention-policy survival simulation
# ---------------------------------------------------------------------------


def q_retention_policy_sim(sf_dir):
    """Per tier of the retention policy (raw keeps 7 days, 1m keeps 30,
    1h keeps 365, all measured back from the corpus max timestamp): the
    exact number of stored rows that survive — raw rows inside the
    window, distinct (type, minute) buckets inside theirs, distinct
    (type, hour) buckets inside theirs — the storage-bill simulation a
    tier-policy change runs before shipping. One combiner pass emits
    all three grains; everything exact int64."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def span_partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        if len(us) == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "mx": pa.array([int(us.max())], pa.int64()),
            }
        )

    span = tree_merge(
        ev.map_batches(span_partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["k"]).aggregate([("mx", "max")]).select(
            ["k", "mx_max"]
        ).rename_columns(["k", "mx"]),
    ).to_pandas()
    if not len(span):
        return pa.table(
            {
                "tier": pa.array([], pa.string()),
                "window_days": pa.array([], pa.int64()),
                "surviving_rows": pa.array([], pa.int64()),
            }
        )
    mx = int(span["mx"].iloc[0])
    cut = {name: mx - days * _DAY_US for name, days in _RETENTION}

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        raw = int((us > cut["raw"]).sum())
        keep_m = us > cut["1m"]
        keep_h = us > cut["1h"]
        et = b["event_type"].to_numpy(zero_copy_only=False)
        dm = pd.DataFrame(
            {"et": et[keep_m], "b": us[keep_m] // (60 * 1_000_000)}
        ).drop_duplicates()
        dh = pd.DataFrame(
            {"et": et[keep_h], "b": us[keep_h] // _HOUR_US}
        ).drop_duplicates()
        # emit raw count + distinct bucket partials tagged per grain
        tables = [
            pa.table(
                {
                    "grain": pa.array(["raw"], pa.string()),
                    "et": pa.array([""], pa.string()),
                    "b": pa.array([0], pa.int64()),
                    "c": pa.array([raw], pa.int64()),
                }
            )
        ]
        for grain, df in (("1m", dm), ("1h", dh)):
            tables.append(
                pa.table(
                    {
                        "grain": pa.array([grain] * len(df), pa.string()),
                        "et": pa.array(df["et"].tolist(), pa.string()),
                        "b": pa.array(df["b"].to_numpy(dtype=np.int64)),
                        "c": pa.array(np.zeros(len(df), np.int64)),
                    }
                )
            )
        return pa.concat_tables(tables)

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["grain", "et", "b"]).aggregate([("c", "sum")])
        return g.select(["grain", "et", "b", "c_sum"]).rename_columns(
            ["grain", "et", "b", "c"]
        )

    merged = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()
    rows = {"tier": [], "window_days": [], "surviving_rows": []}
    for name, days in _RETENTION:
        if name == "raw":
            n = int(merged[merged["grain"] == "raw"]["c"].sum())
        else:
            n = int((merged["grain"] == name).sum())
        rows["tier"].append(name)
        rows["window_days"].append(days)
        rows["surviving_rows"].append(n)
    return pa.table(
        {
            "tier": pa.array(rows["tier"], pa.string()),
            "window_days": pa.array(rows["window_days"], pa.int64()),
            "surviving_rows": pa.array(rows["surviving_rows"], pa.int64()),
        }
    )


RETENTION_SIM_SQL = """
WITH mx AS MATERIALIZED (
  SELECT MAX(EPOCH_US(ts)) AS mx FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
)
SELECT '1h' AS tier, CAST(365 AS BIGINT) AS window_days,
       CAST(COUNT(*) AS BIGINT) AS surviving_rows
FROM (SELECT DISTINCT event_type, EPOCH_US(ts) // 3600000000 AS b
      FROM events, mx
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
        AND EPOCH_US(ts) > mx.mx - CAST(365 AS BIGINT) * 86400000000)
UNION ALL
SELECT '1m', 30, CAST(COUNT(*) AS BIGINT)
FROM (SELECT DISTINCT event_type, EPOCH_US(ts) // 60000000 AS b
      FROM events, mx
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
        AND EPOCH_US(ts) > mx.mx - CAST(30 AS BIGINT) * 86400000000)
UNION ALL
SELECT 'raw', 7, CAST(COUNT(*) AS BIGINT)
FROM events, mx
WHERE event_type IS NOT NULL AND ts IS NOT NULL
  AND EPOCH_US(ts) > mx.mx - CAST(7 AS BIGINT) * 86400000000
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# information loss of day-grain downsampling (KL divergence)
# ---------------------------------------------------------------------------


def q_tier_info_loss_kl(sf_dir):
    """Per event type: the KL divergence (nats) between the true
    hour-level arrival distribution and the day-uniform reconstruction
    a day-grain tier implies (each day's mass spread evenly over its 24
    hours) — the information the 1d tier destroys; KL near 0 means the
    diurnal profile was flat and the coarse tier is lossless in
    practice. Folds exact (type, day, hour) counts; every log argument
    is the exact-integer ratio 24 c_dh / c_d; mirrored double fold,
    x1e6 snap."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        d = (us // _DAY_US).astype(np.int64)
        h = ((us // _HOUR_US) % 24).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "d": pa.array(d),
                "h": pa.array(h),
                "c": pa.array(np.ones(len(d), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "d", "h"], ["c"])

    cells = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "d", "h"], ["c"]),
    ).to_pandas()
    if not len(cells) or "event_type" not in cells.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "kl_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "n": [], "kl_x1e6": []}
    for et, g in cells.sort_values(["event_type", "d", "h"]).groupby(
        "event_type", sort=True
    ):
        c = g["c"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        day_tot = g.groupby("d")["c"].sum()
        cd = g["d"].map(day_tot).to_numpy(dtype=np.int64)
        kl = float(
            np.sum(
                (c.astype(np.float64) / n)
                * np.log(24.0 * c / cd)
            )
        )
        out["event_type"].append(et)
        out["n"].append(n)
        out["kl_x1e6"].append(int(_round_half_away(np.array([kl * 1e6]))[0]))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "kl_x1e6": pa.array(out["kl_x1e6"], pa.int64()),
        }
    )


TIER_KL_SQL = """
WITH cell AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 86400000000) AS BIGINT) AS d,
         hour(ts) AS h, CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2, 3
), dt AS MATERIALIZED (
  SELECT event_type, d, CAST(SUM(c) AS BIGINT) AS cd
  FROM cell GROUP BY 1, 2
), n AS MATERIALIZED (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM cell GROUP BY 1
)
SELECT cell.event_type, n.n,
       CAST(ROUND(SUM((CAST(cell.c AS DOUBLE) / n.n)
                      * LN(24.0 * cell.c / dt.cd)) * 1000000, 0)
            AS BIGINT) AS kl_x1e6
FROM cell
JOIN dt ON dt.event_type = cell.event_type AND dt.d = cell.d
JOIN n ON n.event_type = cell.event_type
GROUP BY 1, 2 ORDER BY 1
"""


def register_r4dp(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "revenue_bridge_decomp": q_revenue_bridge_decomp,
            "retention_policy_sim": q_retention_policy_sim,
            "tier_info_loss_kl": q_tier_info_loss_kl,
        }
    )
    oracles.update(
        {
            "revenue_bridge_decomp": BRIDGE_SQL,
            "retention_policy_sim": RETENTION_SIM_SQL,
            "tier_info_loss_kl": TIER_KL_SQL,
        }
    )
