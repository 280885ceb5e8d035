"""Round-4 batch HA: morphological fingerprints, assortment
specialization, and burst economics — the word-length histogram
chi^2 of each source against the pooled corpus (the cheapest
language/formatting fingerprint there is), brand type-
specialization entropy (does a brand span the catalog or own one
niche?), and value-in-bursts (mean event value during each type's
top-decile-count hours versus calm hours — do busy periods carry
richer or poorer events?).

Exactness discipline: word-length and type counts are pure
integers with mirrored chi^2 / entropy folds; burst thresholds
are exact order statistics at integer rank (9n+9)//10 and the
value means fold identical doubles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _HOUR_US,
    _round_half_away,
)
from mimirsbrunn_ray.stages.rollup import tree_merge

_WL_MAX = 15  # word-length classes 1..14 and 15+


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_WLC_COLS = ["source", "n_words", "chi2_x1e3"]


def q_wordlen_profile_chi2(sf_dir):
    """Morphological fingerprint per source: chi^2 of its word-
    length histogram (classes 1..14 and 15+) against the pooled
    corpus profile — the cheapest detector of a source whose
    tokenization, language, or formatting differs from the rest.
    Length counts fold exactly; expectations use the same
    (n_source * p_corpus) cells on both sides."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("source", "text"))
        if b.num_rows == 0:
            return pa.table({
                "source": pa.array([], pa.string()),
                "wl": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        src = b["source"].to_numpy(zero_copy_only=False)
        words = pc.split_pattern(b["text"], pattern=" ")
        lens = pc.list_value_length(words).to_numpy(
            zero_copy_only=False)
        flat_len = pc.utf8_length(
            pc.list_flatten(words)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        wl = np.minimum(flat_len, _WL_MAX)
        t = pa.table({
            "source": pa.array(np.repeat(src, lens)),
            "wl": pa.array(wl),
            "n": pa.array(np.ones(len(wl), np.int64)),
        })
        g = t.group_by(["source", "wl"]).aggregate([("n", "sum")])
        return g.rename_columns(["source", "wl", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "wl"]).aggregate([("n", "sum")])
        return g.rename_columns(["source", "wl", "n"])

    cc = tree_merge(
        docs.map_batches(part, batch_format="pyarrow",
                         batch_size=None),
        comb,
    ).to_pandas()
    if "source" not in cc.columns or len(cc) == 0:
        return pa.table({
            "source": pa.array([], pa.string()),
            "n_words": pa.array([], pa.int64()),
            "chi2_x1e3": pa.array([], pa.int64()),
        })
    corpus = cc.groupby("wl")["n"].sum()
    n_all = int(corpus.sum())
    if n_all == 0:
        return pa.table({
            "source": pa.array([], pa.string()),
            "n_words": pa.array([], pa.int64()),
            "chi2_x1e3": pa.array([], pa.int64()),
        })
    p_corpus = corpus / n_all
    out = {"source": [], "n_words": [], "chi2_x1e3": []}
    for src, g in cc.groupby("source", sort=True):
        obs = dict(zip(g["wl"].astype(np.int64),
                       g["n"].astype(np.int64)))
        n_src = int(g["n"].sum())
        if n_src == 0:
            continue
        chi2 = 0.0
        for wl_cls in sorted(p_corpus.index):
            e = n_src * float(p_corpus.loc[wl_cls])
            o = obs.get(int(wl_cls), 0)
            if e > 0:
                chi2 += (o - e) ** 2 / e
        out["source"].append(src)
        out["n_words"].append(n_src)
        out["chi2_x1e3"].append(_round_half_away(chi2 * 1e3))
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        "n_words": pa.array(out["n_words"], pa.int64()),
        "chi2_x1e3": pa.array(out["chi2_x1e3"], pa.int64()),
    })


WLC_SQL = f"""
WITH w AS (
  SELECT source,
         LEAST(LENGTH(unnest(string_split(text, ' '))),
               {_WL_MAX}) AS wl
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), c AS MATERIALIZED (
  SELECT source, wl, CAST(COUNT(*) AS BIGINT) AS n
  FROM w GROUP BY 1, 2
), corp AS MATERIALIZED (
  SELECT wl, CAST(SUM(n) AS BIGINT) AS cn FROM c GROUP BY 1
), gl AS MATERIALIZED (
  SELECT CAST(SUM(cn) AS BIGINT) AS n_all FROM corp
), st AS MATERIALIZED (
  SELECT source, CAST(SUM(n) AS BIGINT) AS n_src
  FROM c GROUP BY 1
), cells AS MATERIALIZED (
  SELECT st.source, st.n_src, corp.wl,
         COALESCE(c.n, 0) AS o,
         st.n_src * (CAST(corp.cn AS DOUBLE) / gl.n_all) AS e
  FROM st CROSS JOIN corp CROSS JOIN gl
  LEFT JOIN c ON c.source = st.source AND c.wl = corp.wl
)
SELECT source,
       CAST(ANY_VALUE(n_src) AS BIGINT) AS n_words,
       CAST(ROUND(SUM(CASE WHEN e > 0
                           THEN (o - e) * (o - e) / e
                           ELSE 0 END) * 1000, 0) AS BIGINT)
         AS chi2_x1e3
FROM cells
WHERE n_src > 0
GROUP BY source
ORDER BY source
"""

_BTS_COLS = ["brand", "n_parts", "n_types", "entropy_x1e6"]


def q_brand_type_specialization(sf_dir):
    """Assortment positioning per brand: the entropy of its parts'
    type distribution and the distinct type count — near-zero
    entropy is a niche brand (one type owns it), high entropy a
    generalist; the difference decides whether brand is a usable
    proxy feature for type.  Counts fold exactly with one mirrored
    entropy fold per brand."""
    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_brand", "p_type"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("p_brand", "p_type"))
        g = b.group_by(["p_brand", "p_type"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["brand", "ptype", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["brand", "ptype"]).aggregate(
            [("n", "sum")])
        return g.rename_columns(["brand", "ptype", "n"])

    cc = tree_merge(
        parts.map_batches(part, batch_format="pyarrow",
                          batch_size=None),
        comb,
    ).to_pandas()
    if "brand" not in cc.columns or len(cc) == 0:
        return pa.table({
            "brand": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _BTS_COLS[1:]},
        })
    out = {c: [] for c in _BTS_COLS}
    for brand, g in cc.groupby("brand", sort=True):
        n = g["n"].to_numpy(np.int64).astype(np.float64)
        tot = n.sum()
        if tot == 0:
            continue
        p = n / tot
        h = float(-(p * np.log2(p)).sum())
        out["brand"].append(brand)
        out["n_parts"].append(int(tot))
        out["n_types"].append(len(g))
        out["entropy_x1e6"].append(_round_half_away(h * 1e6))
    return pa.table({
        "brand": pa.array(out["brand"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _BTS_COLS[1:]},
    })


BTS_SQL = """
WITH c AS MATERIALIZED (
  SELECT p_brand AS brand, p_type AS ptype,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM part
  WHERE p_brand IS NOT NULL AND p_type IS NOT NULL
  GROUP BY 1, 2
), pr AS MATERIALIZED (
  SELECT brand, ptype,
         CAST(n AS DOUBLE)
           / SUM(n) OVER (PARTITION BY brand) AS p,
         n
  FROM c
)
SELECT brand,
       CAST(SUM(n) AS BIGINT) AS n_parts,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(ROUND(-SUM(p * LOG2(p)) * 1000000, 0) AS BIGINT)
         AS entropy_x1e6
FROM pr GROUP BY brand
HAVING SUM(n) > 0
ORDER BY brand
"""

_VIB_COLS = ["event_type", "n_burst_hours", "mean_value_burst_x1e3",
             "mean_value_calm_x1e3", "lift_ppm"]


def q_value_in_bursts(sf_dir):
    """Burst economics per event type: mean event VALUE during the
    type's top-decile-count hours (threshold = exact order
    statistic at rank (9n+9)//10 of hourly counts, burst = count
    strictly above) versus calm hours — busy periods that carry
    poorer events mean volume spikes are low-quality traffic, not
    demand.  Hourly count/value partials fold exactly; means
    mirror."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({
            "event_type": b["event_type"],
            "hour": pc.divide(us, _HOUR_US),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
            "v": b["value"].cast(pa.float64()),
        })
        g = t.group_by(["event_type", "hour"]).aggregate(
            [("n", "sum"), ("v", "sum")])
        return g.rename_columns(["event_type", "hour", "n", "v"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "hour"]).aggregate(
            [("n", "sum"), ("v", "sum")])
        return g.rename_columns(["event_type", "hour", "n", "v"])

    cc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _VIB_COLS[1:]},
        })
    out = {c: [] for c in _VIB_COLS}
    for et, g in cc.groupby("event_type", sort=True):
        n = g["n"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.float64)
        T = len(g)
        if T < 2:
            continue
        rank = (9 * T + 9) // 10
        thr = int(np.sort(n, kind="mergesort")[rank - 1])
        burst = n > thr
        if not burst.any() or burst.all():
            continue
        mb = float(v[burst].sum()) / float(n[burst].sum())
        mc = float(v[~burst].sum()) / float(n[~burst].sum())
        if mc == 0:
            continue
        out["event_type"].append(et)
        out["n_burst_hours"].append(int(burst.sum()))
        out["mean_value_burst_x1e3"].append(
            _round_half_away(mb * 1e3))
        out["mean_value_calm_x1e3"].append(
            _round_half_away(mc * 1e3))
        out["lift_ppm"].append(_round_half_away(mb / mc * 1e6))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _VIB_COLS[1:]},
    })


VIB_SQL = f"""
WITH hc AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) // {_HOUR_US} AS hour,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(value AS DOUBLE)) AS v
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL
  GROUP BY 1, 2
), thr AS MATERIALIZED (
  SELECT event_type, n AS threshold, t AS n_hours
  FROM (SELECT event_type, n,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY n, hour) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS t
        FROM hc)
  WHERE rn = (9 * t + 9) // 10
), agg AS (
  SELECT hc.event_type,
         CAST(SUM(CASE WHEN hc.n > thr.threshold THEN 1 ELSE 0
                  END) AS BIGINT) AS nb_hours,
         SUM(CASE WHEN hc.n > thr.threshold THEN hc.v
                  ELSE 0 END) AS vb,
         CAST(SUM(CASE WHEN hc.n > thr.threshold THEN hc.n
                       ELSE 0 END) AS BIGINT) AS nb,
         SUM(CASE WHEN hc.n <= thr.threshold THEN hc.v
                  ELSE 0 END) AS vc,
         CAST(SUM(CASE WHEN hc.n <= thr.threshold THEN hc.n
                       ELSE 0 END) AS BIGINT) AS nc,
         CAST(ANY_VALUE(thr.n_hours) AS BIGINT) AS t
  FROM hc JOIN thr USING (event_type)
  GROUP BY 1
)
SELECT event_type,
       nb_hours AS n_burst_hours,
       CAST(ROUND(vb / nb * 1000, 0) AS BIGINT)
         AS mean_value_burst_x1e3,
       CAST(ROUND(vc / nc * 1000, 0) AS BIGINT)
         AS mean_value_calm_x1e3,
       CAST(ROUND((vb / nb) / (vc / nc) * 1000000, 0) AS BIGINT)
         AS lift_ppm
FROM agg
WHERE t >= 2 AND nb > 0 AND nc > 0 AND nb_hours > 0
  AND nb_hours < t AND vc / nc <> 0
ORDER BY event_type
"""


def register_r4ha(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "wordlen_profile_chi2": q_wordlen_profile_chi2,
            "brand_type_specialization":
                q_brand_type_specialization,
            "value_in_bursts": q_value_in_bursts,
        }
    )
    oracles.update(
        {
            "wordlen_profile_chi2": WLC_SQL,
            "brand_type_specialization": BTS_SQL,
            "value_in_bursts": VIB_SQL,
        }
    )
