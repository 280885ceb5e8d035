"""Round-4 batch DA: Moran's I spatial autocorrelation on the circular
24-hour lattice, the Greenwood spacings uniformity statistic, and exact
L-moments (L-scale, L-skewness) from the value histogram.

Exactness discipline: hourly means divide identical exact integers;
spacings fold exact int64 at seconds grain; the L-moment rank sums use
closed-form run arithmetic over the bounded histogram with Python
arbitrary-precision integers on the Ray side mirrored by HUGEINT sums
in DuckDB — both convert the SAME exact integer to double before the
single final division. x1e6 snaps throughout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge
from mimirsbrunn_ray.stages.timeseries import (
    _project_series,
    _round_half_away_x,
    _series_segments,
)

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


# ---------------------------------------------------------------------------
# Moran's I over the circular hour-of-day lattice
# ---------------------------------------------------------------------------


def q_moran_i_hour_circular(sf_dir):
    """Per event type: Moran's I spatial autocorrelation of hour-of-day
    mean values on the CIRCULAR 24-node lattice (each hour's neighbors
    are the adjacent hours, 23 wrapping to 0) — the lattice twin of
    lag-1 autocorrelation that asks whether adjacent hours resemble
    each other more than chance (positive I = smooth diurnal profile,
    negative = alternating). With two neighbors per node W = 2k; I =
    (k / W) * sum_i sum_j w_ij z_i z_j / sum z_i². Hour means divide
    identical exact integers; I is a mirrored double over the bounded
    24-cell profile, x1e6 snap, NULL when all hour means tie or hours
    are missing."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        h = ((us // _HOUR_US) % 24).astype(np.int64)
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
    ).to_pandas()  # bounded: types x 24

    if not len(cells) or "event_type" not in cells.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "k_hours": pa.array([], pa.int64()),
                "i_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "k_hours": [], "i_x1e6": []}
    for et, g in cells.sort_values(["event_type", "h"]).groupby(
        "event_type", sort=True
    ):
        out["event_type"].append(et)
        out["k_hours"].append(len(g))
        if len(g) != 24:
            out["i_x1e6"].append(None)
            continue
        g = g.sort_values("h", ignore_index=True)
        m = g["s"].to_numpy(dtype=np.float64) / g["c"].to_numpy(dtype=np.int64)
        zbar = float(np.sum(m)) / 24
        z = m - zbar
        den = float(np.sum(z * z))
        if den == 0.0:
            out["i_x1e6"].append(None)
            continue
        # circular neighbors: each ordered pair (i, i+1 mod 24) twice
        cross = float(np.sum(z * np.roll(z, -1)))
        i_stat = (24.0 / 48.0) * (2.0 * cross) / den
        out["i_x1e6"].append(
            int(_round_half_away(np.array([i_stat * 1e6]))[0])
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "k_hours": pa.array(out["k_hours"], pa.int64()),
            "i_x1e6": pa.array(out["i_x1e6"], pa.int64()),
        }
    )


MORAN_SQL = """
WITH cell AS MATERIALIZED (
  SELECT event_type, hour(ts) AS h,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), m AS MATERIALIZED (
  SELECT event_type, h, CAST(s AS DOUBLE) / c AS y FROM cell
), zb AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k, SUM(y) / 24 AS zbar
  FROM m GROUP BY 1
), z AS MATERIALIZED (
  SELECT m.event_type, m.h, m.y - zb.zbar AS z, zb.k
  FROM m JOIN zb ON zb.event_type = m.event_type
), agg AS (
  SELECT a.event_type, MAX(a.k) AS k,
         SUM(a.z * a.z) AS den,
         SUM(a.z * b.z) AS cross_sum
  FROM z a JOIN z b ON b.event_type = a.event_type
                   AND b.h = (a.h + 1) % 24
  GROUP BY 1
)
SELECT zb.event_type, zb.k AS k_hours,
       CASE WHEN zb.k <> 24 OR agg.den = 0 OR agg.den IS NULL THEN NULL
            ELSE CAST(ROUND((24.0 / 48.0) * (2.0 * agg.cross_sum) / agg.den
                 * 1000000, 0) AS BIGINT) END AS i_x1e6
FROM zb LEFT JOIN agg ON agg.event_type = zb.event_type
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Greenwood spacings statistic (arrival-time uniformity)
# ---------------------------------------------------------------------------


def q_greenwood_spacings(sf_dir):
    """Per event type: the Greenwood spacings statistic n * G with G =
    sum((d_i / T)²) over SECOND-grain gaps between consecutive ordered
    events (T = observed span) — the uniformity test on raw arrival
    TIMES that complements the binned minute/hour tests (n*G near 2 =
    Poisson-uniform, large = clumped spacings). One series-key hash
    shuffle; sum(d²) and T fold exact int64; the output n*G = n *
    sum(d²) / T² is one mirrored double per type, x1e6 snap."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    from mimirsbrunn_ray.stages.dedup import _BUCKET

    proj = _project_series(ev, "event_type", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_gaps": pd.Series([], dtype=np.int64),
                "sd2": pd.Series([], dtype=np.int64),
                "span_s": pd.Series([], dtype=np.int64),
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
            {
                "event_type": g["event_type"].to_numpy()[same],
                "dt": dt[same],
                "d2": (dt * dt)[same],
            }
        )
        if not len(d):
            return empty
        a = d.groupby("event_type", sort=False).agg(
            n_gaps=("dt", "size"), span_s=("dt", "sum"), sd2=("d2", "sum")
        )
        return a.reset_index().astype(
            {"n_gaps": np.int64, "span_s": np.int64, "sd2": np.int64}
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
                "ng_x1e6": pa.array([], pa.int64()),
            }
        )
    stats = stats.sort_values("event_type", ignore_index=True)
    vals = []
    for i in range(len(stats)):
        n = int(stats["n_gaps"].iloc[i])
        sd2 = int(stats["sd2"].iloc[i])
        span = int(stats["span_s"].iloc[i])
        vals.append(
            None
            if span == 0
            else int(
                _round_half_away(
                    np.array(
                        [n * (float(sd2) / (float(span) * span)) * 1e6]
                    )
                )[0]
            )
        )
    return pa.table(
        {
            "event_type": pa.array(stats["event_type"].tolist(), pa.string()),
            "n_gaps": pa.array(stats["n_gaps"].to_numpy(dtype=np.int64)),
            "ng_x1e6": pa.array(vals, pa.int64()),
        }
    )


GREENWOOD_SQL = """
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
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(dt) AS BIGINT) AS span_s,
         CAST(SUM(dt * dt) AS BIGINT) AS sd2
  FROM g WHERE dt IS NOT NULL GROUP BY 1
)
SELECT event_type, n_gaps,
       CASE WHEN span_s = 0 THEN NULL
            ELSE CAST(ROUND(n_gaps * (CAST(sd2 AS DOUBLE)
                                      / (CAST(span_s AS DOUBLE) * span_s))
                 * 1000000, 0) AS BIGINT) END AS ng_x1e6
FROM a ORDER BY 1
"""


# ---------------------------------------------------------------------------
# exact L-moments (L-scale, L-skewness) from the value histogram
# ---------------------------------------------------------------------------


def q_l_moments_value(sf_dir):
    """Per event type: the first three L-moments of the x100 value —
    L-scale λ2 and the bounded L-skewness ratio τ3 = λ3 / λ2, the
    order-statistics moments hydrology standardized on because they
    exist for heavy tails where classical skewness explodes.
    Probability-weighted moments b0, b1, b2 fold EXACTLY over the
    bounded histogram via closed-form rank-run sums (a value with
    count c occupying 0-based positions p..p+c-1 contributes
    c*p + c(c-1)/2 first-order and the telescoped k(k-1)/ sums second
    order) — Python big-ints on the Ray side, HUGEINT sums in DuckDB,
    both collapsing the SAME integer to double before the one final
    division. x1e6 snaps; τ3 NULL when λ2 = 0."""
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
                "event_type": b["event_type"],
                "x": pa.array(x),
                "c": pa.array(np.ones(len(x), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "x"], ["c"])

    hist = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "x"], ["c"]),
    ).to_pandas()  # bounded: types x distinct x100 values

    if not len(hist) or "event_type" not in hist.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "l1_x1e6": pa.array([], pa.int64()),
                "l2_x1e6": pa.array([], pa.int64()),
                "t3_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "n": [], "l1_x1e6": [], "l2_x1e6": [], "t3_x1e6": []}
    for et, g in hist.sort_values(["event_type", "x"]).groupby(
        "event_type", sort=True
    ):
        g = g.sort_values("x", ignore_index=True)
        xs = [int(v) for v in g["x"]]
        cs = [int(v) for v in g["c"]]
        n = sum(cs)
        out["event_type"].append(et)
        out["n"].append(n)
        if n < 3:
            out["l1_x1e6"].append(None)
            out["l2_x1e6"].append(None)
            out["t3_x1e6"].append(None)
            continue
        # exact PWM numerators with Python big ints
        s0 = 0
        s1 = 0
        s2 = 0
        p = 0  # 0-based start position of the run

        def f2(m: int) -> int:
            # sum_{k=0}^{m} k (k - 1) = (m + 1) m (m - 1) / 3
            return (m + 1) * m * (m - 1) // 3 if m >= 1 else 0

        for x_val, c in zip(xs, cs):
            s0 += x_val * c
            rank1 = c * p + c * (c - 1) // 2  # sum of (j-1) over the run
            s1 += x_val * rank1
            rank2 = f2(p + c - 1) - f2(p - 1)  # sum of (j-1)(j-2)
            s2 += x_val * rank2
            p += c
        b0 = float(s0) / n
        b1 = float(s1) / (n * (n - 1))
        b2 = float(s2) / (n * (n - 1) * (n - 2))
        l1 = b0
        l2 = 2.0 * b1 - b0
        l3 = 6.0 * b2 - 6.0 * b1 + b0
        out["l1_x1e6"].append(int(_round_half_away(np.array([l1 * 1e6]))[0]))
        out["l2_x1e6"].append(int(_round_half_away(np.array([l2 * 1e6]))[0]))
        out["t3_x1e6"].append(
            None
            if l2 == 0.0
            else int(_round_half_away(np.array([l3 / l2 * 1e6]))[0])
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "l1_x1e6": pa.array(out["l1_x1e6"], pa.int64()),
            "l2_x1e6": pa.array(out["l2_x1e6"], pa.int64()),
            "t3_x1e6": pa.array(out["t3_x1e6"], pa.int64()),
        }
    )


L_MOMENTS_SQL = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), h AS MATERIALIZED (
  SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS c
  FROM v GROUP BY 1, 2
), runs AS MATERIALIZED (
  SELECT event_type, x, c,
         CAST(COALESCE(SUM(c) OVER (PARTITION BY event_type ORDER BY x
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS BIGINT) AS p
  FROM h
), pw AS (
  SELECT event_type,
         CAST(SUM(c) AS BIGINT) AS n,
         SUM(CAST(x AS HUGEINT) * c) AS s0,
         SUM(CAST(x AS HUGEINT) * (c * p + c * (c - 1) // 2)) AS s1,
         SUM(CAST(x AS HUGEINT)
             * (CASE WHEN p + c - 1 >= 1
                     THEN (p + c) * (p + c - 1) * (p + c - 2) // 3
                     ELSE 0 END
                - CASE WHEN p - 1 >= 1
                       THEN p * (p - 1) * (p - 2) // 3
                       ELSE 0 END)) AS s2
  FROM runs GROUP BY 1
)
SELECT event_type, n,
       CASE WHEN n < 3 THEN NULL
            ELSE CAST(ROUND(CAST(s0 AS DOUBLE) / n * 1000000, 0) AS BIGINT)
       END AS l1_x1e6,
       CASE WHEN n < 3 THEN NULL
            ELSE CAST(ROUND(
              (2.0 * (CAST(s1 AS DOUBLE) / (n * (n - 1)))
               - CAST(s0 AS DOUBLE) / n) * 1000000, 0) AS BIGINT)
       END AS l2_x1e6,
       CASE WHEN n < 3
              OR 2.0 * (CAST(s1 AS DOUBLE) / (n * (n - 1)))
                 - CAST(s0 AS DOUBLE) / n = 0
            THEN NULL
            ELSE CAST(ROUND(
              (6.0 * (CAST(s2 AS DOUBLE) / (n * (n - 1) * (n - 2)))
               - 6.0 * (CAST(s1 AS DOUBLE) / (n * (n - 1)))
               + CAST(s0 AS DOUBLE) / n)
              / (2.0 * (CAST(s1 AS DOUBLE) / (n * (n - 1)))
                 - CAST(s0 AS DOUBLE) / n)
              * 1000000, 0) AS BIGINT) END AS t3_x1e6
FROM pw ORDER BY 1
"""


def register_r4da(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "moran_i_hour_circular": q_moran_i_hour_circular,
            "greenwood_spacings": q_greenwood_spacings,
            "l_moments_value": q_l_moments_value,
        }
    )
    oracles.update(
        {
            "moran_i_hour_circular": MORAN_SQL,
            "greenwood_spacings": GREENWOOD_SQL,
            "l_moments_value": L_MOMENTS_SQL,
        }
    )
