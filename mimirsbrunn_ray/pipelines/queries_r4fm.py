"""Round-4 batch FM: lexical-law triple, Weibull hazard fit, and
compositional distance — Herdan's C / Guiraud's R / Sichel's S per
source (the three classic vocabulary-richness laws beyond TTR),
a Weibull shape/scale fit of per-type inter-arrival gaps by median-
rank regression (is the arrival process bursty (k<1), memoryless
(k~1) or regular (k>1)?), and integer-exact Bray-Curtis
dissimilarity between every source pair's word-count profile.

Exactness discipline: richness inputs (N, V, V2) fold exact int64
with mirrored double laws; Weibull rank regression is tie-safe
(tied gaps share x, so the OLS sums are invariant to rank order
within ties) with the identical ln/ln(-ln) expression on both
sides; Bray-Curtis numerator and denominator are pure integers via
the shared-vocab + one-sided-mass decomposition, ppm at the end."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4dd import (
    _word_counts_per_source,
)
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


_LEX_COLS = ["source", "n_tokens", "vocab", "dis_legomena",
             "herdan_x1e6", "guiraud_x1e6", "sichel_ppm"]


def q_lexical_richness_laws(sf_dir):
    """Per source, the three sample-size-robust vocabulary-richness
    laws: Herdan's C = ln V / ln N, Guiraud's R = V / sqrt(N), and
    Sichel's S = V2 / V (share of words appearing exactly twice).
    Word counts fold exact int64 through one distributed pass; the
    per-source laws are mirrored double math over (N, V, V2)."""
    wsc = _word_counts_per_source(sf_dir)
    if not len(wsc) or "source" not in wsc.columns:
        return pa.table({
            "source": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _LEX_COLS[1:]},
        })
    out = {c: [] for c in _LEX_COLS}
    for src, g in wsc.groupby("source", sort=True):
        c = g["c"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        v = len(c)
        v2 = int((c == 2).sum())
        if n < 2 or v < 1:
            continue
        out["source"].append(src)
        out["n_tokens"].append(n)
        out["vocab"].append(v)
        out["dis_legomena"].append(v2)
        out["herdan_x1e6"].append(
            _round_half_away(np.log(v) / np.log(n) * 1e6))
        out["guiraud_x1e6"].append(
            _round_half_away(v / np.sqrt(n) * 1e6))
        out["sichel_ppm"].append(_round_half_away(v2 / v * 1e6))
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _LEX_COLS[1:]},
    })


LEXLAW_SQL = """
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), c AS MATERIALIZED (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM w GROUP BY 1, 2
), a AS MATERIALIZED (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS v,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS v2
  FROM c GROUP BY 1
)
SELECT source,
       n AS n_tokens,
       v AS vocab,
       v2 AS dis_legomena,
       CAST(ROUND(LN(CAST(v AS DOUBLE)) / LN(CAST(n AS DOUBLE))
            * 1000000, 0) AS BIGINT) AS herdan_x1e6,
       CAST(ROUND(CAST(v AS DOUBLE) / SQRT(CAST(n AS DOUBLE))
            * 1000000, 0) AS BIGINT) AS guiraud_x1e6,
       CAST(ROUND(CAST(v2 AS DOUBLE) / v * 1000000, 0) AS BIGINT)
         AS sichel_ppm
FROM a
WHERE n >= 2 AND v >= 1
ORDER BY source
"""


def q_weibull_fit_interarrival(sf_dir):
    """Weibull (shape k, scale lambda-seconds) fit of each event
    type's positive inter-arrival gaps by median-rank regression:
    sort gaps, F_i = (i - 0.5)/n, regress ln(-ln(1 - F_i)) on
    ln(gap_sec); the slope is k and lambda = exp(mean_x -
    mean_y / k).  k < 1 flags bursty arrivals, k = 1 memoryless,
    k > 1 regular — the renewal-process census per stream.  Types
    are hash-bucketed whole; the gap scan and OLS sums are
    vectorized per group."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "event_id"])

    def project(b: pa.Table) -> pa.Table:
        m = None
        for c in ("event_type", "ts", "event_id"):
            v = pc.is_valid(b[c])
            m = v if m is None else pc.and_(m, v)
        b = b.filter(m)
        t = pa.table({
            "event_type": b["event_type"],
            "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_id": b["event_id"],
        })
        return add_bucket(t, "event_type", 8)

    def fit(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "event_type": pd.Series([], dtype=object),
            "n_gaps": pd.Series([], dtype=np.int64),
            "shape_x1e6": pd.Series([], dtype=np.int64),
            "scale_x1e6": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        g = g.sort_values(["event_type", "us", "event_id"],
                          kind="mergesort", ignore_index=True)
        et = g["event_type"].to_numpy()
        us = g["us"].to_numpy(dtype=np.int64)
        out = {"event_type": [], "n_gaps": [], "shape_x1e6": [],
               "scale_x1e6": []}
        brk = np.ones(len(g), dtype=bool)
        brk[1:] = et[1:] != et[:-1]
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(g))
        for s, e in zip(starts, ends):
            gaps = np.diff(us[s:e])
            gaps = gaps[gaps > 0]
            n = len(gaps)
            if n < 2:
                continue
            gs = np.sort(gaps).astype(np.float64)
            x = np.log(gs / 1e6)
            i = np.arange(1, n + 1, dtype=np.float64)
            f = (i - 0.5) / n
            y = np.log(-np.log(1.0 - f))
            sx, sy = x.sum(), y.sum()
            sxx, sxy = (x * x).sum(), (x * y).sum()
            den = n * sxx - sx * sx
            if den == 0:
                continue
            k = (n * sxy - sx * sy) / den
            if k == 0:
                continue
            lam = np.exp(sx / n - (sy / n) / k)
            out["event_type"].append(et[s])
            out["n_gaps"].append(n)
            out["shape_x1e6"].append(_round_half_away(k * 1e6))
            out["scale_x1e6"].append(_round_half_away(lam * 1e6))
        df = pd.DataFrame(out)
        for c in ["n_gaps", "shape_x1e6", "scale_x1e6"]:
            df[c] = df[c].astype(np.int64)
        return df

    res = (
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(fit, batch_format="pandas")
        .to_pandas()
    )
    if "event_type" not in res.columns or len(res) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "n_gaps": pa.array([], pa.int64()),
            "shape_x1e6": pa.array([], pa.int64()),
            "scale_x1e6": pa.array([], pa.int64()),
        })
    res = res.sort_values("event_type", ignore_index=True)
    return pa.table({
        "event_type": pa.array(res["event_type"], pa.string()),
        "n_gaps": pa.array(res["n_gaps"].to_numpy(np.int64)),
        "shape_x1e6": pa.array(
            res["shape_x1e6"].to_numpy(np.int64)),
        "scale_x1e6": pa.array(
            res["scale_x1e6"].to_numpy(np.int64)),
    })


WEIBULL_SQL = """
WITH e AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) AS us, event_id
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL
), gp AS MATERIALIZED (
  SELECT event_type,
         us - LAG(us) OVER (PARTITION BY event_type
                            ORDER BY us, event_id) AS gap
  FROM e
), gg AS MATERIALIZED (
  SELECT event_type, gap FROM gp
  WHERE gap IS NOT NULL AND gap > 0
), rk AS MATERIALIZED (
  SELECT event_type,
         LN(CAST(gap AS DOUBLE) / 1000000.0) AS x,
         LN(-LN(1.0 - (CAST(ROW_NUMBER() OVER
               (PARTITION BY event_type ORDER BY gap) AS DOUBLE)
               - 0.5)
             / COUNT(*) OVER (PARTITION BY event_type))) AS y
  FROM gg
), s AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM rk GROUP BY 1
), f AS (
  SELECT event_type, n,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS k,
         sx, sy
  FROM s
  WHERE n >= 2 AND n * sxx - sx * sx <> 0
)
SELECT event_type,
       n AS n_gaps,
       CAST(ROUND(k * 1000000, 0) AS BIGINT) AS shape_x1e6,
       CAST(ROUND(EXP(sx / n - (sy / n) / k) * 1000000, 0)
            AS BIGINT) AS scale_x1e6
FROM f WHERE k <> 0 ORDER BY event_type
"""


def q_bray_curtis_sources(sf_dir):
    """Integer-exact Bray-Curtis dissimilarity between every source
    pair's word-count profile: BC = sum_w |a_w - b_w| / (N_a + N_b),
    decomposed as shared-vocab |a-b| plus each side's exclusive
    mass — all int64 until the final ppm.  The compositional
    distance matrix behind corpus-mix monitoring.  One distributed
    word-count pass; the 190-pair sweep is vectorized driver math
    on the bounded sources x vocab table."""
    wsc = _word_counts_per_source(sf_dir)
    cols = ["s1", "s2", "n1", "n2", "bc_ppm"]
    if not len(wsc) or "source" not in wsc.columns:
        return pa.table({
            "s1": pa.array([], pa.string()),
            "s2": pa.array([], pa.string()),
            "n1": pa.array([], pa.int64()),
            "n2": pa.array([], pa.int64()),
            "bc_ppm": pa.array([], pa.int64()),
        })
    mat = wsc.pivot_table(index="w", columns="source", values="c",
                          aggfunc="sum", fill_value=0)
    sources = sorted(mat.columns)
    m = mat[sources].to_numpy(dtype=np.int64)
    totals = m.sum(axis=0)
    out = {c: [] for c in cols}
    for i in range(len(sources)):
        for j in range(i + 1, len(sources)):
            num = int(np.abs(m[:, i] - m[:, j]).sum())
            den = int(totals[i] + totals[j])
            if den == 0:
                continue
            out["s1"].append(sources[i])
            out["s2"].append(sources[j])
            out["n1"].append(int(totals[i]))
            out["n2"].append(int(totals[j]))
            out["bc_ppm"].append(_round_half_away(num / den * 1e6))
    return pa.table({
        "s1": pa.array(out["s1"], pa.string()),
        "s2": pa.array(out["s2"], pa.string()),
        "n1": pa.array(out["n1"], pa.int64()),
        "n2": pa.array(out["n2"], pa.int64()),
        "bc_ppm": pa.array(out["bc_ppm"], pa.int64()),
    })


BRAY_CURTIS_SQL = """
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), c AS MATERIALIZED (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM w GROUP BY 1, 2
), tot AS MATERIALIZED (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1
), shared AS MATERIALIZED (
  SELECT a.source AS s1, b.source AS s2,
         CAST(SUM(ABS(a.c - b.c)) AS BIGINT) AS d_shared,
         CAST(SUM(a.c) AS BIGINT) AS a_shared,
         CAST(SUM(b.c) AS BIGINT) AS b_shared
  FROM c a JOIN c b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.s1, p.s2, p.n1, p.n2,
       CAST(ROUND(CAST(COALESCE(sh.d_shared, 0)
              + (p.n1 - COALESCE(sh.a_shared, 0))
              + (p.n2 - COALESCE(sh.b_shared, 0)) AS DOUBLE)
            / (p.n1 + p.n2) * 1000000, 0) AS BIGINT) AS bc_ppm
FROM (SELECT ta.source AS s1, tb.source AS s2,
             ta.n AS n1, tb.n AS n2
      FROM tot ta JOIN tot tb ON ta.source < tb.source) p
LEFT JOIN shared sh ON sh.s1 = p.s1 AND sh.s2 = p.s2
WHERE p.n1 + p.n2 > 0
ORDER BY p.s1, p.s2
"""


def register_r4fm(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "lexical_richness_laws": q_lexical_richness_laws,
            "weibull_fit_interarrival": q_weibull_fit_interarrival,
            "bray_curtis_sources": q_bray_curtis_sources,
        }
    )
    oracles.update(
        {
            "lexical_richness_laws": LEXLAW_SQL,
            "weibull_fit_interarrival": WEIBULL_SQL,
            "bray_curtis_sources": BRAY_CURTIS_SQL,
        }
    )
