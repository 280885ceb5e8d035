"""Round-4 batch DU: first-passage time above the p90 level, the
generalized-Pareto (peaks-over-threshold) method-of-moments fit, and
the arithmetic-vs-harmonic rate averaging audit.

Exactness discipline: the p90 threshold selects by integer cross-
multiplication from the exact histogram; first-passage offsets are
exact microseconds found inside series buckets; excess moments fold
exact int64; fits and mean ratios are mirrored doubles, x1e6 snap.
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

_DAY_US = 86_400_000_000


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


def _p90_per_type(sf_dir) -> dict:
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
    ).to_pandas()
    out = {}
    if not len(hist) or "event_type" not in hist.columns:
        return out
    for et, g in hist.sort_values(["event_type", "x"]).groupby(
        "event_type", sort=True
    ):
        xs = g["x"].to_numpy(dtype=np.int64)
        cs = g["c"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cs)
        n = int(cum[-1])
        out[et] = int(xs[int(np.argmax(10 * cum >= 9 * n))])
    return out


# ---------------------------------------------------------------------------
# first-passage time above the p90 level
# ---------------------------------------------------------------------------


def q_first_passage_above_p90(sf_dir):
    """Per event type: the FIRST-PASSAGE time — microseconds from the
    series' first event to the first value strictly above the type's
    exact p90 — the "how long until the process first visits its upper
    decile" statistic that calibrates alert warm-up windows (a passage
    time near zero means the p90 is visited immediately and threshold
    alerts need damping). The p90 selects by integer cross-
    multiplication; per-bucket candidates reduce by exact (min first-ts,
    min crossing-ts) merges; pure int64 output."""
    p90 = _p90_per_type(sf_dir)
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    proj = _project_series(ev, "event_type", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "t0": pd.Series([], dtype=np.int64),
                "tc": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "event_type", "ts", "event_id")
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        x = _round_half_away_x(g["value"].to_numpy(dtype=np.float64), 100.0)
        et = g["event_type"].to_numpy()
        thr = pd.Series(et).map(p90).to_numpy(dtype=np.int64)
        over = x > thr
        big = np.int64(1) << 62
        rows = {"event_type": [], "t0": [], "tc": []}
        starts = np.flatnonzero(~same)
        bounds = np.append(starts, len(g))
        for i in range(len(starts)):
            lo, hi = bounds[i], bounds[i + 1]
            seg_over = over[lo:hi]
            first_cross = (
                int(ts_us[lo + int(np.argmax(seg_over))])
                if seg_over.any()
                else int(big)
            )
            rows["event_type"].append(et[lo])
            rows["t0"].append(int(ts_us[lo]))
            rows["tc"].append(first_cross)
        return pd.DataFrame(rows).astype({"t0": np.int64, "tc": np.int64})

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("t0", "min"), ("tc", "min")]
        )
        return g.select(["event_type", "t0_min", "tc_min"]).rename_columns(
            ["event_type", "t0", "tc"]
        )

    stats = tree_merge(
        proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas"),
        combine,
    ).to_pandas()
    if not len(stats) or "event_type" not in stats.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "p90_e2": pa.array([], pa.int64()),
                "passage_us": pa.array([], pa.int64()),
            }
        )
    stats = stats.sort_values("event_type", ignore_index=True)
    big = np.int64(1) << 62
    vals = []
    for i in range(len(stats)):
        tc = int(stats["tc"].iloc[i])
        vals.append(None if tc >= big else tc - int(stats["t0"].iloc[i]))
    return pa.table(
        {
            "event_type": pa.array(stats["event_type"].tolist(), pa.string()),
            "p90_e2": pa.array(
                [p90.get(e) for e in stats["event_type"]], pa.int64()
            ),
            "passage_us": pa.array(vals, pa.int64()),
        }
    )


FIRST_PASSAGE_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type, ts, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), p AS MATERIALIZED (
  SELECT event_type,
         CAST(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY x) AS BIGINT)
           AS p90
  FROM v GROUP BY 1
)
SELECT v.event_type, p.p90 AS p90_e2,
       CAST(MIN(CASE WHEN v.x > p.p90 THEN EPOCH_US(v.ts) END)
            - MIN(EPOCH_US(v.ts)) AS BIGINT) AS passage_us
FROM v JOIN p ON p.event_type = v.event_type
GROUP BY 1, 2 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# generalized-Pareto peaks-over-threshold fit of value excesses
# ---------------------------------------------------------------------------


def q_gpd_pot_fit_value(sf_dir):
    """Per event type: the peaks-over-threshold GPD method-of-moments
    fit of value excesses above the exact p90 — shape xi = (1 -
    mean²/var) / 2 and scale sigma = mean (mean²/var + 1) / 2, extreme-
    value theory's tail model for everything past the threshold (xi >
    0 = the heavy tail where p99.9 estimates from Gaussian math are
    fiction). The threshold selects by integer cross-multiplication;
    excess (n, s1, s2) fold exact int64; xi and sigma are mirrored
    doubles, x1e6 snap, NULL on degenerate variance."""
    p90 = _p90_per_type(sf_dir)
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    import ray as _ray

    p90_ref = _ray.put(p90)

    def partial(b: pa.Table) -> pa.Table:
        import ray as _r

        thr_map = _r.get(p90_ref)
        b = _clean(b, ("event_type", "value"))
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        et = b["event_type"].to_numpy(zero_copy_only=False)
        thr = pd.Series(et).map(thr_map).to_numpy(dtype=np.float64)
        exc = x - thr
        over = exc > 0
        e = exc[over].astype(np.int64)
        t = pa.table(
            {
                "event_type": pa.array(et[over]),
                "n": pa.array(np.ones(len(e), np.int64)),
                "s1": pa.array(e),
                "s2": pa.array(e * e),
            }
        )
        return _sum_by(t, ["event_type"], ["n", "s1", "s2"])

    agg = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type"], ["n", "s1", "s2"]),
    ).to_pandas()
    if not len(agg) or "event_type" not in agg.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_excess": pa.array([], pa.int64()),
                "xi_x1e6": pa.array([], pa.int64()),
                "sigma_x1e6": pa.array([], pa.int64()),
            }
        )
    agg = agg.sort_values("event_type", ignore_index=True)
    xis, sigs = [], []
    for i in range(len(agg)):
        n = int(agg["n"].iloc[i])
        s1 = int(agg["s1"].iloc[i])
        s2 = int(agg["s2"].iloc[i])
        if n < 2:
            xis.append(None)
            sigs.append(None)
            continue
        mean = float(s1) / n
        var = (float(s2) - float(s1) * s1 / n) / (n - 1)
        if var == 0.0 or mean == 0.0:
            xis.append(None)
            sigs.append(None)
            continue
        r = mean * mean / var
        xi = (1.0 - r) / 2.0
        sigma = mean * (r + 1.0) / 2.0
        xis.append(int(_round_half_away(np.array([xi * 1e6]))[0]))
        sigs.append(int(_round_half_away(np.array([sigma * 1e6]))[0]))
    return pa.table(
        {
            "event_type": pa.array(agg["event_type"].tolist(), pa.string()),
            "n_excess": pa.array(agg["n"].to_numpy(dtype=np.int64)),
            "xi_x1e6": pa.array(xis, pa.int64()),
            "sigma_x1e6": pa.array(sigs, pa.int64()),
        }
    )


GPD_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), p AS MATERIALIZED (
  SELECT event_type,
         CAST(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY x) AS BIGINT)
           AS p90
  FROM v GROUP BY 1
), e AS (
  SELECT v.event_type, v.x - p.p90 AS e
  FROM v JOIN p ON p.event_type = v.event_type
  WHERE v.x - p.p90 > 0
), a AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(e) AS BIGINT) AS s1, CAST(SUM(e * e) AS BIGINT) AS s2
  FROM e GROUP BY 1
)
SELECT event_type, n AS n_excess,
       CASE WHEN n < 2
              OR (s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) = 0
              OR CAST(s1 AS DOUBLE) / n = 0
            THEN NULL
            ELSE CAST(ROUND(
              (1.0 - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                     / ((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)))
              / 2.0 * 1000000, 0) AS BIGINT) END AS xi_x1e6,
       CASE WHEN n < 2
              OR (s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) = 0
              OR CAST(s1 AS DOUBLE) / n = 0
            THEN NULL
            ELSE CAST(ROUND(
              (CAST(s1 AS DOUBLE) / n)
              * ((CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                 / ((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) + 1.0)
              / 2.0 * 1000000, 0) AS BIGINT) END AS sigma_x1e6
FROM a ORDER BY 1
"""


# ---------------------------------------------------------------------------
# arithmetic vs harmonic daily-rate averaging audit
# ---------------------------------------------------------------------------


def q_rate_mean_pitfall_audit(sf_dir):
    """Per event type: the arithmetic and harmonic means of the OBSERVED
    daily event counts and their ratio — the rate-averaging pitfall
    audit (the harmonic mean is what "average rate experienced per
    event" actually is; a ratio well above 1 means naive averaging of
    daily rates overstates typical throughput). Daily counts fold exact
    int64; the harmonic fold sums 1/c per observed day (doubles over
    identical integers); ratio x1e6."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        d = (us // _DAY_US).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "d": pa.array(d),
                "c": pa.array(np.ones(len(d), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "d"], ["c"])

    daily = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "d"], ["c"]),
    ).to_pandas()
    if not len(daily) or "event_type" not in daily.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_days": pa.array([], pa.int64()),
                "amean_x1e6": pa.array([], pa.int64()),
                "hmean_x1e6": pa.array([], pa.int64()),
                "ratio_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {
        "event_type": [], "n_days": [], "amean_x1e6": [], "hmean_x1e6": [],
        "ratio_x1e6": [],
    }
    for et, g in daily.sort_values(["event_type", "d"]).groupby(
        "event_type", sort=True
    ):
        c = g["c"].to_numpy(dtype=np.int64)
        k = len(c)
        am = float(int(c.sum())) / k
        hm = k / float(np.sum(1.0 / c))
        out["event_type"].append(et)
        out["n_days"].append(k)
        out["amean_x1e6"].append(int(_round_half_away(np.array([am * 1e6]))[0]))
        out["hmean_x1e6"].append(int(_round_half_away(np.array([hm * 1e6]))[0]))
        out["ratio_x1e6"].append(
            None
            if hm == 0.0
            else int(_round_half_away(np.array([am / hm * 1e6]))[0])
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_days": pa.array(out["n_days"], pa.int64()),
            "amean_x1e6": pa.array(out["amean_x1e6"], pa.int64()),
            "hmean_x1e6": pa.array(out["hmean_x1e6"], pa.int64()),
            "ratio_x1e6": pa.array(out["ratio_x1e6"], pa.int64()),
        }
    )


RATE_MEAN_SQL = """
WITH daily AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 86400000000) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), a AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(c) AS BIGINT) AS s,
         SUM(1.0 / c) AS inv
  FROM daily GROUP BY 1
)
SELECT event_type, k AS n_days,
       CAST(ROUND(CAST(s AS DOUBLE) / k * 1000000, 0) AS BIGINT)
         AS amean_x1e6,
       CAST(ROUND(k / inv * 1000000, 0) AS BIGINT) AS hmean_x1e6,
       CASE WHEN k / inv = 0 THEN NULL
            ELSE CAST(ROUND((CAST(s AS DOUBLE) / k) / (k / inv)
                 * 1000000, 0) AS BIGINT) END AS ratio_x1e6
FROM a ORDER BY 1
"""


def register_r4du(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "first_passage_above_p90": q_first_passage_above_p90,
            "gpd_pot_fit_value": q_gpd_pot_fit_value,
            "rate_mean_pitfall_audit": q_rate_mean_pitfall_audit,
        }
    )
    oracles.update(
        {
            "first_passage_above_p90": FIRST_PASSAGE_SQL,
            "gpd_pot_fit_value": GPD_SQL,
            "rate_mean_pitfall_audit": RATE_MEAN_SQL,
        }
    )
