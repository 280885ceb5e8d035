"""Round-4 batch HB: catalog quantization, bipartite structure,
and diurnal drift — the part-size histogram mode census (how many
local maxima the size distribution has; multiple peaks = the
catalog quantizes to preferred sizes), the bipartite degree
correlation between suppliers and the parts they serve (do heavy
suppliers carry popular parts, or fill the long tail?), and the
weekly drift of each type's circular hour-of-day centroid (does
the diurnal peak migrate across the window — the timezone-mix or
rollout-drift detector).

Exactness discipline: histogram modes are strict integer
comparisons on a dense size grid; degree correlations fold exact
integer degrees through the shared centered-sum form; circular
centroids mirror atan2 over identical per-week integer hour
histograms (drift reported in minutes x1e3)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _HOUR_US,
    _round_half_away,
)
from mimirsbrunn_ray.pipelines.queries_r4gz import _pearson
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_SHM_COLS = ["n_parts", "n_sizes", "n_modes", "top_size",
             "top_size_share_ppm"]


def q_size_histogram_modes(sf_dir):
    """Catalog quantization census: local maxima of the part-size
    histogram on the dense size grid (strictly greater than both
    neighbors; boundary bins compare one-sided) plus the modal
    size and its share — several peaks mean the catalog snaps to
    preferred sizes and 'size' behaves as a categorical, not a
    continuous feature.  Pure integer counts and comparisons."""
    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_size"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["p_size"]))
        t = pa.table({"size": b["p_size"].cast(pa.int64())})
        g = t.group_by(["size"]).aggregate([([], "count_all")])
        return g.rename_columns(["size", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["size"]).aggregate([("n", "sum")])
        return g.rename_columns(["size", "n"])

    cc = tree_merge(
        parts.map_batches(part, batch_format="pyarrow",
                          batch_size=None),
        comb,
    ).to_pandas()
    if "size" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SHM_COLS})
    smin = int(cc["size"].min())
    smax = int(cc["size"].max())
    grid = np.zeros(smax - smin + 1, dtype=np.int64)
    grid[cc["size"].to_numpy(np.int64) - smin] = cc["n"].to_numpy(
        np.int64)
    n_parts = int(grid.sum())
    g = grid
    left = np.concatenate(([np.int64(-1)], g[:-1]))
    right = np.concatenate((g[1:], [np.int64(-1)]))
    modes = (g > left) & (g > right) & (g > 0)
    top_idx = int(np.argmax(g))
    return pa.table({
        "n_parts": pa.array([n_parts], pa.int64()),
        "n_sizes": pa.array(
            [int((grid > 0).sum())], pa.int64()),
        "n_modes": pa.array([int(modes.sum())], pa.int64()),
        "top_size": pa.array([smin + top_idx], pa.int64()),
        "top_size_share_ppm": pa.array(
            [_round_half_away(int(g[top_idx]) / n_parts * 1e6)],
            pa.int64()),
    })


SHM_SQL = """
WITH c AS MATERIALIZED (
  SELECT CAST(p_size AS BIGINT) AS size,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM part WHERE p_size IS NOT NULL
  GROUP BY 1
), span AS MATERIALIZED (
  SELECT MIN(size) AS smin, MAX(size) AS smax,
         CAST(SUM(n) AS BIGINT) AS n_parts
  FROM c
), grid AS MATERIALIZED (
  SELECT s.smin + r.k AS size, COALESCE(c.n, 0) AS n
  FROM span s
  JOIN range(0, 100000) r(k) ON s.smin + r.k <= s.smax
  LEFT JOIN c ON c.size = s.smin + r.k
), nb AS MATERIALIZED (
  SELECT size, n,
         COALESCE(LAG(n) OVER (ORDER BY size), -1) AS ln,
         COALESCE(LEAD(n) OVER (ORDER BY size), -1) AS rn
  FROM grid
), tops AS MATERIALIZED (
  SELECT size AS top_size, n AS top_n
  FROM grid ORDER BY n DESC, size LIMIT 1
)
SELECT span.n_parts AS n_parts,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM grid WHERE n > 0)
         AS n_sizes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM nb
        WHERE n > ln AND n > rn AND n > 0) AS n_modes,
       CAST(tops.top_size AS BIGINT) AS top_size,
       CAST(ROUND(CAST(tops.top_n AS DOUBLE) / span.n_parts
            * 1000000, 0) AS BIGINT) AS top_size_share_ppm
FROM span CROSS JOIN tops
WHERE span.n_parts > 0
"""

_BDC_COLS = ["n_suppliers", "r_x1e6", "mean_supp_degree_x1e3",
             "mean_part_degree_x1e3"]


def q_bipartite_degree_corr(sf_dir):
    """Bipartite assortativity of the supplier-part service graph:
    across suppliers, the correlation between a supplier's own
    degree (distinct parts served) and the MEAN degree of those
    parts (distinct suppliers per part) — positive means hubs
    serve contested parts, negative means hubs own the exclusive
    tail.  Distinct edges fold exactly; degrees and the mean-of-
    neighbor-degrees attach via one small broadcast."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_partkey"])

    def edge_part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_suppkey", "l_partkey"))
        return b.select(["l_suppkey", "l_partkey"]).group_by(
            ["l_suppkey", "l_partkey"]).aggregate([])

    def edge_distinct(b: pa.Table) -> pa.Table:
        return b.select(["l_suppkey", "l_partkey"]).group_by(
            ["l_suppkey", "l_partkey"]).aggregate([])

    edges = tree_merge(
        li.map_batches(edge_part, batch_format="pyarrow",
                       batch_size=None),
        edge_distinct,
        final_shards=8,
        shard_cols=["l_suppkey", "l_partkey"],
    ).to_pandas()
    if "l_suppkey" not in edges.columns or len(edges) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BDC_COLS})
    sd = edges.groupby("l_suppkey").size()
    pd_ = edges.groupby("l_partkey").size()
    edges["pdeg"] = edges["l_partkey"].map(pd_)
    per_supp = edges.groupby("l_suppkey").agg(
        sdeg=("l_partkey", "size"),
        mpd=("pdeg", "mean")).reset_index()
    x = per_supp["sdeg"].to_numpy(np.int64).astype(np.float64)
    y = per_supp["mpd"].to_numpy(np.float64)
    r = _pearson(x, y)
    if r is None:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BDC_COLS})
    return pa.table({
        "n_suppliers": pa.array([len(per_supp)], pa.int64()),
        "r_x1e6": pa.array(
            [_round_half_away(r * 1e6)], pa.int64()),
        "mean_supp_degree_x1e3": pa.array(
            [_round_half_away(float(x.mean()) * 1e3)],
            pa.int64()),
        "mean_part_degree_x1e3": pa.array(
            [_round_half_away(float(y.mean()) * 1e3)],
            pa.int64()),
    })


BDC_SQL = """
WITH e AS MATERIALIZED (
  SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk
  FROM lineitem
  WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL
), pdeg AS MATERIALIZED (
  SELECT pk, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY 1
), per_supp AS MATERIALIZED (
  SELECT e.sk,
         CAST(COUNT(*) AS DOUBLE) AS sdeg,
         AVG(CAST(pdeg.d AS DOUBLE)) AS mpd
  FROM e JOIN pdeg USING (pk)
  GROUP BY 1
), mu AS MATERIALIZED (
  SELECT AVG(sdeg) AS ms, AVG(mpd) AS mp,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM per_supp
), mom AS (
  SELECT SUM((p.sdeg - mu.ms) * (p.mpd - mu.mp)) AS sxy,
         SUM((p.sdeg - mu.ms) * (p.sdeg - mu.ms)) AS sxx,
         SUM((p.mpd - mu.mp) * (p.mpd - mu.mp)) AS syy
  FROM per_supp p CROSS JOIN mu
)
SELECT mu.n AS n_suppliers,
       CAST(ROUND(mom.sxy / SQRT(mom.sxx * mom.syy) * 1000000,
            0) AS BIGINT) AS r_x1e6,
       CAST(ROUND(mu.ms * 1000, 0) AS BIGINT)
         AS mean_supp_degree_x1e3,
       CAST(ROUND(mu.mp * 1000, 0) AS BIGINT)
         AS mean_part_degree_x1e3
FROM mu CROSS JOIN mom
WHERE mu.n >= 3 AND mom.sxx * mom.syy > 0
"""

_HCD_COLS = ["event_type", "n_weeks", "max_drift_min_x1e3"]


def q_hod_centroid_drift_weekly(sf_dir):
    """Diurnal drift detector per event type: the circular mean
    hour-of-day per calendar week (atan2 of summed unit phasors
    over the week's hod histogram) and the maximum circular
    distance (in minutes) of any week's centroid from the FIRST
    week's — a migrating peak means the user-timezone mix or a
    rollout changed mid-window, which hour-of-day features then
    smear.  Weekly hod counts fold exactly; the phasor math
    mirrors."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        day = pc.divide(us, _DAY_US)
        week = pc.divide(pc.add(day, pa.scalar(4, pa.int64())),
                         pa.scalar(7, pa.int64()))
        hr = pc.divide(us, _HOUR_US)
        hod = pc.subtract(
            hr, pc.multiply(pc.divide(hr, 24),
                            pa.scalar(24, pa.int64())))
        t = pa.table({
            "event_type": b["event_type"],
            "week": week,
            "hod": hod,
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["event_type", "week", "hod"]).aggregate(
            [("n", "sum")])
        return g.rename_columns(["event_type", "week", "hod", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "week", "hod"]).aggregate(
            [("n", "sum")])
        return g.rename_columns(["event_type", "week", "hod", "n"])

    cc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "n_weeks": pa.array([], pa.int64()),
            "max_drift_min_x1e3": pa.array([], pa.int64()),
        })
    out = {c: [] for c in _HCD_COLS}
    for et, g in cc.groupby("event_type", sort=True):
        cents = {}
        for wk, gw in g.groupby("week"):
            hod = gw["hod"].to_numpy(np.int64).astype(np.float64)
            n = gw["n"].to_numpy(np.int64).astype(np.float64)
            ang = 2.0 * np.pi * hod / 24.0
            s = float((n * np.sin(ang)).sum())
            c = float((n * np.cos(ang)).sum())
            if s == 0 and c == 0:
                continue
            cents[int(wk)] = np.arctan2(s, c)
        weeks = sorted(cents)
        if len(weeks) < 2:
            continue
        base = cents[weeks[0]]
        max_drift = 0.0
        for wk in weeks[1:]:
            d = abs(cents[wk] - base)
            d = min(d, 2.0 * np.pi - d)
            max_drift = max(max_drift, d)
        drift_min = max_drift / (2.0 * np.pi) * 24.0 * 60.0
        out["event_type"].append(et)
        out["n_weeks"].append(len(weeks))
        out["max_drift_min_x1e3"].append(
            _round_half_away(drift_min * 1e3))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_weeks": pa.array(out["n_weeks"], pa.int64()),
        "max_drift_min_x1e3": pa.array(
            out["max_drift_min_x1e3"], pa.int64()),
    })


HCD_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT event_type,
         ((EPOCH_US(ts) // {_DAY_US}) + 4) // 7 AS week,
         (EPOCH_US(ts) // {_HOUR_US}) % 24 AS hod,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2, 3
), cents AS MATERIALIZED (
  SELECT event_type, week,
         ATAN2(SUM(n * SIN(2 * PI() * hod / 24.0)),
               SUM(n * COS(2 * PI() * hod / 24.0))) AS ang,
         SUM(n * SIN(2 * PI() * hod / 24.0)) AS sv,
         SUM(n * COS(2 * PI() * hod / 24.0)) AS cv
  FROM e GROUP BY 1, 2
), ok AS MATERIALIZED (
  SELECT event_type, week, ang FROM cents
  WHERE NOT (sv = 0 AND cv = 0)
), base AS MATERIALIZED (
  SELECT event_type, ang AS base_ang
  FROM ok
  QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                             ORDER BY week) = 1
), drift AS (
  SELECT ok.event_type,
         CAST(COUNT(*) AS BIGINT) AS n_weeks,
         MAX(CASE WHEN ok.ang = base.base_ang THEN 0.0
                  ELSE LEAST(ABS(ok.ang - base.base_ang),
                             2 * PI()
                             - ABS(ok.ang - base.base_ang))
             END) AS md
  FROM ok JOIN base USING (event_type)
  GROUP BY 1
)
SELECT event_type,
       n_weeks,
       CAST(ROUND(md / (2 * PI()) * 24.0 * 60.0 * 1000, 0)
            AS BIGINT) AS max_drift_min_x1e3
FROM drift
WHERE n_weeks >= 2
ORDER BY event_type
"""


def register_r4hb(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "size_histogram_modes": q_size_histogram_modes,
            "bipartite_degree_corr": q_bipartite_degree_corr,
            "hod_centroid_drift_weekly":
                q_hod_centroid_drift_weekly,
        }
    )
    oracles.update(
        {
            "size_histogram_modes": SHM_SQL,
            "bipartite_degree_corr": BDC_SQL,
            "hod_centroid_drift_weekly": HCD_SQL,
        }
    )
