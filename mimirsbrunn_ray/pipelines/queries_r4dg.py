"""Round-4 batch DG: Hoeffding sample-complexity bound, the
order-statistic median confidence interval, and rank-biased overlap
(RBO) between each source's word ranking and the global ranking.

Exactness discipline: min/max/histograms fold exact int64; the median
CI selects ORDER STATISTICS at normal-approximation rank bounds
(mirrored rank formula, exact integer selection from the bounded
histogram — the interval endpoints are exact data values); RBO depth
overlaps are exact integer counts over deterministically tie-broken
top-10 lists; final weighted folds are mirrored doubles, x1e6 snap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_Z95 = 1.959963984540054
_HOEFF_DELTA_LN = 5.298317366548036  # ln(2 / 0.01)
_RBO_P = 0.9
_RBO_K = 10


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
# Hoeffding sample-complexity bound per type
# ---------------------------------------------------------------------------


def q_hoeffding_n_for_eps(sf_dir):
    """Per event type: the Hoeffding-inequality sample size n >=
    ln(2/delta) * (b - a)² / (2 eps²) needed to estimate the mean value
    within eps = 1% of the observed range at confidence 99% — the
    DISTRIBUTION-FREE budget (no variance assumption) that upper-bounds
    what any subsampling stage may get away with. Range (a, b) folds as
    exact x100 int64 min/max; the bound and its ceiling are mirrored
    doubles over identical integers."""
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
                "mn": pa.array(x),
                "mx": pa.array(x),
                "n": pa.array(np.ones(len(x), np.int64)),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [("mn", "min"), ("mx", "max"), ("n", "sum")]
        )
        return g.select(["event_type", "mn_min", "mx_max", "n_sum"]).rename_columns(
            ["event_type", "mn", "mx", "n"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("mn", "min"), ("mx", "max"), ("n", "sum")]
        )
        return g.select(["event_type", "mn_min", "mx_max", "n_sum"]).rename_columns(
            ["event_type", "mn", "mx", "n"]
        )

    agg = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()
    if not len(agg) or "event_type" not in agg.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "range_e2": pa.array([], pa.int64()),
                "required_n": pa.array([], pa.int64()),
            }
        )
    agg = agg.sort_values("event_type", ignore_index=True)
    ranges, reqs = [], []
    for i in range(len(agg)):
        r = int(agg["mx"].iloc[i]) - int(agg["mn"].iloc[i])
        ranges.append(r)
        if r == 0:
            reqs.append(None)
            continue
        eps = 0.01 * r
        reqs.append(
            int(
                np.ceil(
                    _HOEFF_DELTA_LN * (float(r) * r) / (2.0 * eps * eps)
                )
            )
        )
    return pa.table(
        {
            "event_type": pa.array(agg["event_type"].tolist(), pa.string()),
            "range_e2": pa.array(ranges, pa.int64()),
            "required_n": pa.array(reqs, pa.int64()),
        }
    )


HOEFFDING_SQL = f"""
WITH a AS (
  SELECT event_type,
         CAST(MIN(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS mn,
         CAST(MAX(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS mx
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
  GROUP BY 1
)
SELECT event_type, mx - mn AS range_e2,
       CASE WHEN mx - mn = 0 THEN NULL
            ELSE CAST(CEIL(
              {_HOEFF_DELTA_LN!r} * (CAST(mx - mn AS DOUBLE) * (mx - mn))
              / (2.0 * (0.01 * (mx - mn)) * (0.01 * (mx - mn))))
              AS BIGINT) END AS required_n
FROM a ORDER BY 1
"""


# ---------------------------------------------------------------------------
# order-statistic median confidence interval per type
# ---------------------------------------------------------------------------


def q_median_ci_value(sf_dir):
    """Per event type: the 95% distribution-free confidence interval for
    the MEDIAN via order statistics — ranks lo = floor((n - z sqrt(n)) /
    2) and hi = ceil(1 + (n + z sqrt(n)) / 2) (clamped to [1, n]), whose
    order-statistic VALUES are selected exactly from the x100 histogram
    by integer cumulative counts (the binomial-rank CI every robust
    dashboard should draw instead of a bare median). Rank formulas are
    mirrored doubles over identical integers; the value selection is
    pure int64."""
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
    if not len(hist) or "event_type" not in hist.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "lo_e2": pa.array([], pa.int64()),
                "hi_e2": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "n": [], "lo_e2": [], "hi_e2": []}
    for et, g in hist.sort_values(["event_type", "x"]).groupby(
        "event_type", sort=True
    ):
        xs = g["x"].to_numpy(dtype=np.int64)
        cs = g["c"].to_numpy(dtype=np.int64)
        n = int(cs.sum())
        out["event_type"].append(et)
        out["n"].append(n)
        if n < 2:
            out["lo_e2"].append(None)
            out["hi_e2"].append(None)
            continue
        lo_rk = int(np.floor((n - _Z95 * np.sqrt(n)) / 2.0))
        hi_rk = int(np.ceil(1.0 + (n + _Z95 * np.sqrt(n)) / 2.0))
        lo_rk = max(lo_rk, 1)
        hi_rk = min(hi_rk, n)
        cum = np.cumsum(cs)
        lo_val = int(xs[int(np.argmax(cum >= lo_rk))])
        hi_val = int(xs[int(np.argmax(cum >= hi_rk))])
        out["lo_e2"].append(lo_val)
        out["hi_e2"].append(hi_val)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "lo_e2": pa.array(out["lo_e2"], pa.int64()),
            "hi_e2": pa.array(out["hi_e2"], pa.int64()),
        }
    )


MEDIAN_CI_SQL = f"""
WITH v AS MATERIALIZED (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), n AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY 1
), rk AS MATERIALIZED (
  SELECT event_type, n,
         GREATEST(CAST(FLOOR((n - {_Z95!r} * SQRT(n)) / 2.0) AS BIGINT), 1)
           AS lo_rk,
         LEAST(CAST(CEIL(1.0 + (n + {_Z95!r} * SQRT(n)) / 2.0) AS BIGINT),
               n) AS hi_rk
  FROM n
), h AS MATERIALIZED (
  SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY 1, 2
), cum AS MATERIALIZED (
  SELECT event_type, x,
         SUM(c) OVER (PARTITION BY event_type ORDER BY x
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM h
)
SELECT rk.event_type, rk.n,
       CASE WHEN rk.n < 2 THEN NULL
            ELSE (SELECT MIN(cum.x) FROM cum
                  WHERE cum.event_type = rk.event_type
                    AND cum.cum >= rk.lo_rk) END AS lo_e2,
       CASE WHEN rk.n < 2 THEN NULL
            ELSE (SELECT MIN(cum.x) FROM cum
                  WHERE cum.event_type = rk.event_type
                    AND cum.cum >= rk.hi_rk) END AS hi_e2
FROM rk ORDER BY 1
"""


# ---------------------------------------------------------------------------
# rank-biased overlap: source word ranking vs global ranking
# ---------------------------------------------------------------------------


def q_rbo_source_vs_global(sf_dir):
    """Per source: the truncated rank-biased overlap (RBO, p = 0.9,
    depth 10) between the source's word-frequency ranking and the
    GLOBAL corpus ranking — the top-weighted list-similarity measure IR
    uses where Kendall treats all ranks equally (low RBO = the source's
    head vocabulary diverges from the corpus). Rankings are exact-count
    ordered with a word tie-break so both engines build identical
    lists; depth overlaps are exact integer counts; the weighted fold
    sum_(d=1..10) p^(d-1) ov_d / d (normalized by the same fold with
    ov_d = d) is a mirrored double, x1e6 snap."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b["source"]), pc.is_valid(b["text"]))
        b = b.filter(m)
        words = pc.split_pattern(b["text"], pattern=" ")
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        src = pa.array(
            np.repeat(b["source"].to_numpy(zero_copy_only=False), lens)
        )
        t = pa.table(
            {
                "source": src,
                "w": flat,
                "c": pa.array(
                    np.ones(int(lens.sum()) if len(lens) else 0, np.int64)
                ),
            }
        )
        return _sum_by(t, ["source", "w"], ["c"])

    wsc = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["source", "w"], ["c"]),
    ).to_pandas()
    if not len(wsc) or "source" not in wsc.columns:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "rbo_x1e6": pa.array([], pa.int64()),
            }
        )

    def topk(df: pd.DataFrame) -> list:
        df = df.sort_values(
            ["c", "w"], ascending=[False, True], ignore_index=True
        )
        return df["w"].head(_RBO_K).tolist()

    global_list = topk(
        wsc.groupby("w", as_index=False)["c"].sum()
    )
    norm = sum(
        _RBO_P ** (d - 1) for d in range(1, _RBO_K + 1)
    )  # fold with ov_d = d cancels the /d
    out = {"source": [], "rbo_x1e6": []}
    for src, g in wsc.sort_values(["source", "w"]).groupby("source", sort=True):
        sl = topk(g[["w", "c"]])
        acc = 0.0
        for d in range(1, _RBO_K + 1):
            ov = len(set(sl[:d]) & set(global_list[:d]))
            acc += _RBO_P ** (d - 1) * ov / d
        rbo = acc / norm
        out["source"].append(src)
        out["rbo_x1e6"].append(int(_round_half_away(np.array([rbo * 1e6]))[0]))
    return pa.table(
        {
            "source": pa.array(out["source"], pa.string()),
            "rbo_x1e6": pa.array(out["rbo_x1e6"], pa.int64()),
        }
    )


RBO_SQL = f"""
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), c AS MATERIALIZED (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1, 2
), sl AS MATERIALIZED (
  SELECT source, w,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY c DESC, w) AS r
  FROM c QUALIFY r <= {_RBO_K}
), gl AS MATERIALIZED (
  SELECT w, ROW_NUMBER() OVER (ORDER BY SUM(c) DESC, w) AS r
  FROM c GROUP BY w QUALIFY r <= {_RBO_K}
), depths AS (SELECT unnest(range(1, {_RBO_K} + 1)) AS d
), ov AS MATERIALIZED (
  SELECT sl.source, depths.d,
         CAST(COUNT(gl.w) AS BIGINT) AS ov
  FROM depths
  CROSS JOIN sl
  LEFT JOIN gl ON gl.w = sl.w AND gl.r <= depths.d
  WHERE sl.r <= depths.d
  GROUP BY 1, 2
), acc AS (
  SELECT source,
         SUM(POWER({_RBO_P!r}, d - 1) * ov / d) AS acc
  FROM ov GROUP BY 1
), norm AS (
  SELECT SUM(POWER({_RBO_P!r}, d - 1)) AS norm FROM depths
)
SELECT acc.source,
       CAST(ROUND(acc.acc / norm.norm * 1000000, 0) AS BIGINT) AS rbo_x1e6
FROM acc, norm ORDER BY 1
"""


def register_r4dg(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "hoeffding_n_for_eps": q_hoeffding_n_for_eps,
            "median_ci_value": q_median_ci_value,
            "rbo_source_vs_global": q_rbo_source_vs_global,
        }
    )
    oracles.update(
        {
            "hoeffding_n_for_eps": HOEFFDING_SQL,
            "median_ci_value": MEDIAN_CI_SQL,
            "rbo_source_vs_global": RBO_SQL,
        }
    )
