"""Round-4 batch Z: distribution-comparison statistics and an iterative
trend smoother — two-sample Kolmogorov-Smirnov over every source pair,
a Mann-Whitney U rank test (weekend vs weekday), and integer Holt
linear-trend smoothing with a recursive-CTE oracle.

Exactness discipline: all three reduce to integer arithmetic. KS keeps
the unnormalized numerator max|c_a*n_b - c_b*n_a| (pure int64); the
Mann-Whitney U is carried as 2*U so tied-rank halves stay integral;
Holt runs in fixed-point cents with floor-division smoothing
(alpha = beta = 1/2), so the Ray recursion and the SQL recursive CTE
agree bit-for-bit.

Scale shapes: every operator is one decomposable histogram/rollup pass
(groupby partials + tree merge) whose merged table is bounded by
|domain| x |groups| — never by rows — followed by a driver finish over
that bounded table; the same discipline as
`stages/ordered.py:group_cume_dist` (see its caveat on wide domains).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# pairwise two-sample Kolmogorov-Smirnov over doc-length distributions
# ---------------------------------------------------------------------------


def q_ks_doc_len_matrix(sf_dir):
    """Exact two-sample KS statistic between the n_chars distributions
    of every source pair (a < b) — the drift test a corpus curator runs
    to ask "did source X's length profile diverge from source Y's?".

    KS depends only on the per-(source, length) VALUE HISTOGRAM, so one
    decomposable count pass tree-merges into a table bounded by
    sources x |length domain| (never rows); the driver then walks each
    pair's merged ECDF grid. The statistic is kept as the exact integer
    numerator max|c_a*n_b - c_b*n_a| over the union grid (KS = that
    / (n_a*n_b)), so the compare is integer-exact.
    """
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["source"]), pc.is_valid(b["n_chars"]))
        )
        g = b.group_by(["source", "n_chars"]).aggregate([([], "count_all")])
        g = g.select(["source", "n_chars", "count_all"])
        return g.rename_columns(["source", "v", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "v"]).aggregate([("n", "sum")])
        return g.rename_columns(["source", "v", "n"])

    hist = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: sources x distinct lengths

    out = {
        "source_a": [], "source_b": [], "n_a": [], "n_b": [], "ks_num": []
    }
    if len(hist):
        sources = sorted(hist["source"].unique())
        grid = np.sort(hist["v"].unique()).astype(np.int64)
        # per-source cumulative counts on the shared union grid
        cum = {}
        tot = {}
        for s in sources:
            h = hist[hist["source"] == s]
            c = np.zeros(len(grid), dtype=np.int64)
            idx = np.searchsorted(grid, h["v"].to_numpy(dtype=np.int64))
            c[idx] = h["n"].to_numpy(dtype=np.int64)
            cum[s] = np.cumsum(c)
            tot[s] = int(cum[s][-1])
        for i, sa in enumerate(sources):
            for sb in sources[i + 1:]:
                ks = int(
                    np.max(np.abs(cum[sa] * tot[sb] - cum[sb] * tot[sa]))
                )
                out["source_a"].append(sa)
                out["source_b"].append(sb)
                out["n_a"].append(tot[sa])
                out["n_b"].append(tot[sb])
                out["ks_num"].append(ks)
    return pa.table(
        {
            "source_a": pa.array(out["source_a"], pa.string()),
            "source_b": pa.array(out["source_b"], pa.string()),
            "n_a": pa.array(out["n_a"], pa.int64()),
            "n_b": pa.array(out["n_b"], pa.int64()),
            "ks_num": pa.array(out["ks_num"], pa.int64()),
        }
    )


KS_MATRIX_SQL = """
WITH h AS (
  SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents
  WHERE source IS NOT NULL AND n_chars IS NOT NULL
  GROUP BY 1, 2
), tot AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS nt FROM h GROUP BY 1
), vals AS (
  SELECT DISTINCT v FROM h
), grid AS (
  SELECT a.source AS sa, b.source AS sb, a.nt AS na, b.nt AS nb, v.v
  FROM tot a JOIN tot b ON a.source < b.source CROSS JOIN vals v
), cum AS (
  SELECT g.sa, g.sb, g.na, g.nb, g.v,
         SUM(COALESCE(ha.n, 0))
           OVER (PARTITION BY g.sa, g.sb ORDER BY g.v) AS ca,
         SUM(COALESCE(hb.n, 0))
           OVER (PARTITION BY g.sa, g.sb ORDER BY g.v) AS cb
  FROM grid g
  LEFT JOIN h ha ON ha.source = g.sa AND ha.v = g.v
  LEFT JOIN h hb ON hb.source = g.sb AND hb.v = g.v
)
SELECT sa AS source_a, sb AS source_b, na AS n_a, nb AS n_b,
       CAST(MAX(ABS(ca * nb - cb * na)) AS BIGINT) AS ks_num
FROM cum
GROUP BY 1, 2, 3, 4
"""


# ---------------------------------------------------------------------------
# Mann-Whitney U: weekend vs weekday event values, per type
# ---------------------------------------------------------------------------


def q_mannwhitney_weekend(sf_dir):
    """Per event type, the Mann-Whitney U rank-sum statistic comparing
    weekend vs weekday values (cents-quantized) — the nonparametric twin
    of weekday_weekend_contrast's mean gap: does the weekend VALUE
    DISTRIBUTION stochastically dominate the weekday one?

    Rank sums with average tied ranks depend only on the per-(type,
    value, weekpart) histogram: one decomposable count pass tree-merges
    into a table bounded by types x |cents domain|; the driver computes
    2*avg_rank(v) = 2*cum_before(v) + c(v) + 1 per distinct value and
    U2 = 2*R_weekend - n_we*(n_we+1) — all integers, so the compare is
    exact. Weekend = Sat/Sun UTC, the repo-wide (days+4)%7 convention.
    """
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["event_type"]), pc.is_valid(b["value"])
                ),
                pc.is_valid(b["ts"]),
            )
        )
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        dow = (np.floor_divide(ts_us, _DAY_US) + 4) % 7  # Sunday = 0
        we = ((dow == 0) | (dow == 6)).astype(np.int64)
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "x": pa.array(x),
                "we": pa.array(we),
            }
        )
        g = t.group_by(["event_type", "x", "we"]).aggregate(
            [([], "count_all")]
        )
        g = g.select(["event_type", "x", "we", "count_all"])
        return g.rename_columns(["event_type", "x", "we", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "x", "we"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "x", "we", "n"])

    hist = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: types x cents domain x 2

    rows = {"event_type": [], "n_weekday": [], "n_weekend": [],
            "u2_weekend": []}
    if len(hist):
        for et, g in hist.groupby("event_type", sort=True):
            p = (
                g.pivot_table(
                    index="x", columns="we", values="n",
                    aggfunc="sum", fill_value=0,
                )
                .reindex(columns=[0, 1], fill_value=0)
                .sort_index()
            )
            c_wd = p[0].to_numpy(dtype=np.int64)
            c_we = p[1].to_numpy(dtype=np.int64)
            c_all = c_wd + c_we
            cum_before = np.concatenate(
                ([0], np.cumsum(c_all)[:-1])
            ).astype(np.int64)
            # 2 * average rank of the tie group at each distinct value
            avg2 = 2 * cum_before + c_all + 1
            n_we = int(c_we.sum())
            r2_we = int(np.dot(c_we, avg2))
            rows["event_type"].append(et)
            rows["n_weekday"].append(int(c_wd.sum()))
            rows["n_weekend"].append(n_we)
            rows["u2_weekend"].append(r2_we - n_we * (n_we + 1))
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "n_weekday": pa.array(rows["n_weekday"], pa.int64()),
            "n_weekend": pa.array(rows["n_weekend"], pa.int64()),
            "u2_weekend": pa.array(rows["u2_weekend"], pa.int64()),
        }
    )


MANNWHITNEY_SQL = """
WITH v AS (
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
         CAST(SUM(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_weekday,
         CAST(SUM(CASE WHEN we = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_weekend,
         CAST(SUM(CASE WHEN we = 1 THEN 2 * rk + cx - 1 ELSE 0 END)
              AS BIGINT) AS r2_we
  FROM r GROUP BY 1
)
SELECT event_type, n_weekday, n_weekend,
       CAST(r2_we - n_weekend * (n_weekend + 1) AS BIGINT) AS u2_weekend
FROM agg
"""


# ---------------------------------------------------------------------------
# integer Holt linear-trend smoothing over hourly value sums
# ---------------------------------------------------------------------------


def q_holt_trend_hourly(sf_dir):
    """Holt's linear-trend double exponential smoother (alpha = beta =
    1/2) over each type's hourly value-sum series, in fixed-point cents
    with floor division — level l_i = floor((y_i + l + b) / 2), trend
    b_i = floor((l_i - l + b) / 2), seeded l_1 = y_1, b_1 = 0 over the
    OBSERVED buckets in hour order. Integer recursion means the Ray
    finish and the SQL recursive CTE agree exactly; the one-step-ahead
    forecast is l_N + b_N.

    Scale shape: the heavy pass is the hourly rollup (decomposable
    partials + tree merge, bounded by types x hours); the recursion
    itself runs over that bounded series — iterative state that SQL
    needs WITH RECURSIVE for, expressed here as a driver finish the
    same way stages/gapfill carries require sequential state.
    """
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["event_type"]), pc.is_valid(b["value"])
                ),
                pc.is_valid(b["ts"]),
            )
        )
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        hr = np.floor_divide(ts_us, _HOUR_US)
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "hr": pa.array(hr),
                "x": pa.array(x),
            }
        )
        g = t.group_by(["event_type", "hr"]).aggregate([("x", "sum")])
        g = g.select(["event_type", "hr", "x_sum"])
        return g.rename_columns(["event_type", "hr", "y"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "hr"]).aggregate([("y", "sum")])
        return g.rename_columns(["event_type", "hr", "y"])

    series = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: types x hour buckets

    rows = {"event_type": [], "n_buckets": [], "level_x100": [],
            "trend_x100": [], "forecast_x100": []}
    if len(series):
        for et, g in series.groupby("event_type", sort=True):
            y = g.sort_values("hr")["y"].to_numpy(dtype=np.int64)
            lvl = int(y[0])
            trd = 0
            for yi in y[1:]:
                nl = (int(yi) + lvl + trd) // 2
                trd = (nl - lvl + trd) // 2
                lvl = nl
            rows["event_type"].append(et)
            rows["n_buckets"].append(len(y))
            rows["level_x100"].append(lvl)
            rows["trend_x100"].append(trd)
            rows["forecast_x100"].append(lvl + trd)
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "n_buckets": pa.array(rows["n_buckets"], pa.int64()),
            "level_x100": pa.array(rows["level_x100"], pa.int64()),
            "trend_x100": pa.array(rows["trend_x100"], pa.int64()),
            "forecast_x100": pa.array(rows["forecast_x100"], pa.int64()),
        }
    )


HOLT_SQL = """
WITH RECURSIVE hourly AS (
  SELECT event_type,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hr,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), s AS (
  SELECT event_type,
         CAST(ROW_NUMBER()
              OVER (PARTITION BY event_type ORDER BY hr) AS BIGINT) AS i,
         y
  FROM hourly
), nmax AS (
  SELECT event_type, MAX(i) AS n FROM s GROUP BY 1
), rec AS (
  SELECT event_type, i, y AS l, CAST(0 AS BIGINT) AS b
  FROM s WHERE i = 1
  UNION ALL
  SELECT r.event_type, s.i,
         CAST(FLOOR((s.y + r.l + r.b) / 2.0) AS BIGINT) AS l,
         CAST(FLOOR((CAST(FLOOR((s.y + r.l + r.b) / 2.0) AS BIGINT)
                     - r.l + r.b) / 2.0) AS BIGINT) AS b
  FROM rec r JOIN s ON s.event_type = r.event_type AND s.i = r.i + 1
)
SELECT r.event_type, n.n AS n_buckets, r.l AS level_x100,
       r.b AS trend_x100, CAST(r.l + r.b AS BIGINT) AS forecast_x100
FROM rec r JOIN nmax n ON n.event_type = r.event_type AND r.i = n.n
"""


def register_r4z(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "ks_doc_len_matrix": q_ks_doc_len_matrix,
            "mannwhitney_weekend": q_mannwhitney_weekend,
            "holt_trend_hourly": q_holt_trend_hourly,
        }
    )
    oracles.update(
        {
            "ks_doc_len_matrix": KS_MATRIX_SQL,
            "mannwhitney_weekend": MANNWHITNEY_SQL,
            "holt_trend_hourly": HOLT_SQL,
        }
    )
