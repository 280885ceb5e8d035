"""Round-4 batch CL: Grubbs' extreme-outlier statistic, Cohen's d
weekend effect size, and Bhattacharyya hour-profile affinity between
event-type pairs.

Exactness discipline: sufficient statistics (counts, x100 sums, squared
sums, max cross-multiplied deviations, hour contingencies) fold as exact
int64 via combiner-first partials + tree_merge; each final float
expression is mirrored token-for-token against the DuckDB oracle and
snapped to fixed point.
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


def _clean_tv(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# Grubbs' test statistic (extreme studentized deviate) per event type
# ---------------------------------------------------------------------------


def q_grubbs_outlier_value(sf_dir):
    """Per event type: Grubbs' statistic G = max|x - mean| / sd of the
    x100-quantized value — the extreme-studentized-deviate screen for a
    single outlier (large G = the most extreme sample is improbably far
    out under normality). Two streaming passes: a types-bounded totals
    pass (n, s1, s2), then a max pass over the EXACT integer
    cross-multiplied deviation |x*n - s1| (no float mean ever feeds the
    max), tree-merged with a max combiner. The final expression divides
    once per type — mirrored double, x1e6 snap, NULL for degenerate
    variance."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def tpartial(b: pa.Table) -> pa.Table:
        b = _clean_tv(b, ("event_type", "value"))
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "one": pa.array(np.ones(len(x), np.int64)),
                "s1": pa.array(x),
                "s2": pa.array(x * x),
            }
        )
        return _sum_by(t, ["event_type"], ["one", "s1", "s2"]).rename_columns(
            ["event_type", "n", "s1", "s2"]
        )

    tot = tree_merge(
        ev.map_batches(tpartial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type"], ["n", "s1", "s2"]),
    ).to_pandas()  # bounded: one row per type
    if not len(tot) or "event_type" not in tot.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "g_x1e6": pa.array([], pa.int64()),
            }
        )
    n_map = dict(zip(tot["event_type"], tot["n"].astype(np.int64)))
    s_map = dict(zip(tot["event_type"], tot["s1"].astype(np.int64)))

    def mpartial(b: pa.Table) -> pa.Table:
        b = _clean_tv(b, ("event_type", "value"))
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        et = b["event_type"].to_pandas()
        nn = et.map(n_map).to_numpy(dtype=np.int64)
        ss = et.map(s_map).to_numpy(dtype=np.int64)
        dev = np.abs(x * nn - ss)
        t = pa.table({"event_type": b["event_type"], "maxdev": pa.array(dev)})
        g = t.group_by(["event_type"]).aggregate([("maxdev", "max")])
        return g.select(["event_type", "maxdev_max"]).rename_columns(
            ["event_type", "maxdev"]
        )

    def mcombine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate([("maxdev", "max")])
        return g.select(["event_type", "maxdev_max"]).rename_columns(
            ["event_type", "maxdev"]
        )

    mx = tree_merge(
        ev.map_batches(mpartial, batch_format="pyarrow", batch_size=None),
        mcombine,
    ).to_pandas()

    m = tot.merge(mx, on="event_type").sort_values(
        "event_type", ignore_index=True
    )
    out_g = []
    for i in range(len(m)):
        n = int(m["n"].iloc[i])
        s1 = int(m["s1"].iloc[i])
        s2 = int(m["s2"].iloc[i])
        md = int(m["maxdev"].iloc[i])
        if n < 2:
            out_g.append(None)
            continue
        var = (float(s2) - float(s1) * s1 / n) / (n - 1)
        if var == 0.0:
            out_g.append(None)
            continue
        g = (float(md) / n) / np.sqrt(var)
        out_g.append(int(_round_half_away(np.array([g * 1e6]))[0]))
    return pa.table(
        {
            "event_type": pa.array(m["event_type"].tolist(), pa.string()),
            "n": pa.array(m["n"].to_numpy(dtype=np.int64)),
            "g_x1e6": pa.array(out_g, pa.int64()),
        }
    )


GRUBBS_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), a AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s1, CAST(SUM(x * x) AS BIGINT) AS s2
  FROM v GROUP BY 1
), m AS (
  SELECT v.event_type, CAST(MAX(ABS(v.x * a.n - a.s1)) AS BIGINT) AS maxdev
  FROM v JOIN a ON a.event_type = v.event_type
  GROUP BY 1
)
SELECT a.event_type, a.n,
       CASE WHEN a.n < 2
              OR (a.s2 - CAST(a.s1 AS DOUBLE) * a.s1 / a.n) / (a.n - 1) = 0
            THEN NULL
            ELSE CAST(ROUND(
              (CAST(m.maxdev AS DOUBLE) / a.n)
              / SQRT((a.s2 - CAST(a.s1 AS DOUBLE) * a.s1 / a.n) / (a.n - 1))
              * 1000000, 0) AS BIGINT) END AS g_x1e6
FROM a JOIN m ON m.event_type = a.event_type
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Cohen's d: weekend vs weekday value effect size per event type
# ---------------------------------------------------------------------------


def q_cohens_d_weekend(sf_dir):
    """Per event type: Cohen's d standardized mean difference between
    WEEKEND and WEEKDAY values — d = (mean_we - mean_wd) / s_pooled with
    the classic pooled standard deviation. The effect-size companion to
    the Mann-Whitney rank test already in the registry: d says HOW LARGE
    the shift is in sd units, not just whether it exists. One
    combiner-first pass folds exact (n, s1, s2) per (type, weekpart) at
    x100 grain; d is one mirrored double per type, x1e6 snap, NULL when
    either side has < 2 samples or the pooled variance degenerates."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean_tv(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        dow = (np.floor_divide(us, _DAY_US) + 4) % 7
        we = ((dow == 0) | (dow == 6)).astype(np.int64)
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "we": pa.array(we),
                "one": pa.array(np.ones(len(x), np.int64)),
                "s1": pa.array(x),
                "s2": pa.array(x * x),
            }
        )
        return _sum_by(t, ["event_type", "we"], ["one", "s1", "s2"]).rename_columns(
            ["event_type", "we", "n", "s1", "s2"]
        )

    agg = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "we"], ["n", "s1", "s2"]),
    ).to_pandas()  # bounded: types x 2

    if not len(agg) or "event_type" not in agg.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_weekday": pa.array([], pa.int64()),
                "n_weekend": pa.array([], pa.int64()),
                "d_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "n_weekday": [], "n_weekend": [], "d_x1e6": []}
    for et, g in agg.sort_values("event_type").groupby("event_type", sort=True):
        wd = g[g["we"] == 0]
        we = g[g["we"] == 1]
        nw = int(wd["n"].iloc[0]) if len(wd) else 0
        ne = int(we["n"].iloc[0]) if len(we) else 0
        out["event_type"].append(et)
        out["n_weekday"].append(nw)
        out["n_weekend"].append(ne)
        if nw < 2 or ne < 2:
            out["d_x1e6"].append(None)
            continue
        s1w, s2w = int(wd["s1"].iloc[0]), int(wd["s2"].iloc[0])
        s1e, s2e = int(we["s1"].iloc[0]), int(we["s2"].iloc[0])
        ssw = float(s2w) - float(s1w) * s1w / nw
        sse = float(s2e) - float(s1e) * s1e / ne
        pooled = (ssw + sse) / (nw + ne - 2)
        if pooled == 0.0:
            out["d_x1e6"].append(None)
            continue
        d = (float(s1e) / ne - float(s1w) / nw) / np.sqrt(pooled)
        out["d_x1e6"].append(int(_round_half_away(np.array([d * 1e6]))[0]))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_weekday": pa.array(out["n_weekday"], pa.int64()),
            "n_weekend": pa.array(out["n_weekend"], pa.int64()),
            "d_x1e6": pa.array(out["d_x1e6"], pa.int64()),
        }
    )


COHENS_D_SQL = """
WITH v AS (
  SELECT event_type,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), a AS (
  SELECT event_type, we, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s1, CAST(SUM(x * x) AS BIGINT) AS s2
  FROM v GROUP BY 1, 2
), p AS (
  SELECT COALESCE(wd.event_type, we.event_type) AS event_type,
         wd.n AS nw, we.n AS ne,
         wd.s1 AS s1w, wd.s2 AS s2w, we.s1 AS s1e, we.s2 AS s2e
  FROM (SELECT * FROM a WHERE we = 0) wd
  FULL OUTER JOIN (SELECT * FROM a WHERE we = 1) we
    ON we.event_type = wd.event_type
)
SELECT event_type,
       CAST(COALESCE(nw, 0) AS BIGINT) AS n_weekday,
       CAST(COALESCE(ne, 0) AS BIGINT) AS n_weekend,
       CASE WHEN COALESCE(nw, 0) < 2 OR COALESCE(ne, 0) < 2
              OR ((s2w - CAST(s1w AS DOUBLE) * s1w / nw)
                  + (s2e - CAST(s1e AS DOUBLE) * s1e / ne))
                 / (nw + ne - 2) = 0
            THEN NULL
            ELSE CAST(ROUND(
              (CAST(s1e AS DOUBLE) / ne - CAST(s1w AS DOUBLE) / nw)
              / SQRT(((s2w - CAST(s1w AS DOUBLE) * s1w / nw)
                      + (s2e - CAST(s1e AS DOUBLE) * s1e / ne))
                     / (nw + ne - 2))
              * 1000000, 0) AS BIGINT) END AS d_x1e6
FROM p ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Bhattacharyya coefficient between type pairs' hour-of-day profiles
# ---------------------------------------------------------------------------


def q_bhattacharyya_hour_types(sf_dir):
    """For every event-type pair (t1 < t2): the Bhattacharyya
    coefficient BC = sum_h sqrt(p1_h * p2_h) between their hour-of-day
    distributions — 1 = identical diurnal profiles, 0 = disjoint. The
    affinity companion to the JS-divergence query (BC feeds the
    Hellinger distance sqrt(1 - BC) used in distribution-shift
    monitoring). Hour counts fold exact int64 (types x 24 bounded);
    each pair's BC is a 24-term mirrored double fold, x1e6 snap."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = _clean_tv(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        h = ((us // _HOUR_US) % 24).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "h": pa.array(h),
                "o": pa.array(np.ones(len(h), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "h"], ["o"])

    cont = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "h"], ["o"]),
    ).to_pandas()  # bounded: types x 24

    if not len(cont) or "event_type" not in cont.columns:
        return pa.table(
            {
                "t1": pa.array([], pa.string()),
                "t2": pa.array([], pa.string()),
                "bc_x1e6": pa.array([], pa.int64()),
            }
        )
    types = sorted(cont["event_type"].unique())
    n_map = cont.groupby("event_type")["o"].sum().to_dict()
    prof = {
        et: dict(
            zip(
                g["h"].to_numpy(dtype=np.int64),
                g["o"].to_numpy(dtype=np.int64),
            )
        )
        for et, g in cont.groupby("event_type")
    }
    out = {"t1": [], "t2": [], "bc_x1e6": []}
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            a, b_ = types[i], types[j]
            na, nb = int(n_map[a]), int(n_map[b_])
            bc = 0.0
            for h in sorted(set(prof[a]) & set(prof[b_])):
                bc += np.sqrt(
                    float(prof[a][h]) / na * prof[b_][h] / nb
                )
            out["t1"].append(a)
            out["t2"].append(b_)
            out["bc_x1e6"].append(
                int(_round_half_away(np.array([bc * 1e6]))[0])
            )
    return pa.table(
        {
            "t1": pa.array(out["t1"], pa.string()),
            "t2": pa.array(out["t2"], pa.string()),
            "bc_x1e6": pa.array(out["bc_x1e6"], pa.int64()),
        }
    )


BHATTACHARYYA_SQL = """
WITH c AS MATERIALIZED (
  SELECT event_type, hour(ts) AS h, CAST(COUNT(*) AS BIGINT) AS o
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), n AS MATERIALIZED (
  SELECT event_type, CAST(SUM(o) AS BIGINT) AS n FROM c GROUP BY 1
)
SELECT a.event_type AS t1, b.event_type AS t2,
       CAST(ROUND(SUM(SQRT(CAST(a.o AS DOUBLE) / na.n * b.o / nb.n))
                  * 1000000, 0) AS BIGINT) AS bc_x1e6
FROM c a
JOIN c b ON b.h = a.h AND a.event_type < b.event_type
JOIN n na ON na.event_type = a.event_type
JOIN n nb ON nb.event_type = b.event_type
GROUP BY 1, 2
ORDER BY 1, 2
"""


def register_r4cl(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "grubbs_outlier_value": q_grubbs_outlier_value,
            "cohens_d_weekend": q_cohens_d_weekend,
            "bhattacharyya_hour_types": q_bhattacharyya_hour_types,
        }
    )
    oracles.update(
        {
            "grubbs_outlier_value": GRUBBS_SQL,
            "cohens_d_weekend": COHENS_D_SQL,
            "bhattacharyya_hour_types": BHATTACHARYYA_SQL,
        }
    )
