"""Round-4 batch DC: corpus-linguistics operators over the tokenized
documents — log-likelihood keyness (source keywords), Juilland's D
lexical dispersion, and Burrows' Delta stylometric distance between
sources.

All three consume ONE shared exact (source, word, count) contingency
(combiner-first fold over whitespace tokens, bounded: sources x vocab).
Exactness discipline: counts exact int64; keyness ranks select on the
SNAPPED x1e6 G² with a word tie-break so a ulp cannot reorder; the
dispersion / Delta folds are mirrored doubles, x1e6 snap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_TOPK_KEYWORDS = 5
_TOP_WORDS = 10


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


def _word_source_counts(sf_dir) -> pd.DataFrame:
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

    return tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["source", "w"], ["c"]),
    ).to_pandas()  # bounded: sources x vocab


_WSC_SQL = """
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
"""


# ---------------------------------------------------------------------------
# log-likelihood (G²) keyness: top keywords per source
# ---------------------------------------------------------------------------


def q_keyness_g2_sources(sf_dir):
    """Per source: the top-5 KEYWORDS by log-likelihood keyness — for
    each (source, word) the 2x2 G² comparing the word's rate inside the
    source against the rest of the corpus (Rayson & Garside's corpus-
    comparison statistic; the keyword-extraction alternative to TF-IDF
    that has a significance scale). Cells fold exact int64; G² sums the
    four o*ln(o/e) terms as a mirrored double; ranking happens on the
    SNAPPED x1e6 value with a word tie-break (ROW_NUMBER mirror), so
    both engines pick identical keywords."""
    wsc = _word_source_counts(sf_dir)
    if not len(wsc) or "source" not in wsc.columns:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "w": pa.array([], pa.string()),
                "rk": pa.array([], pa.int64()),
                "g2_x1e6": pa.array([], pa.int64()),
            }
        )
    tot_s = wsc.groupby("source")["c"].sum()
    tot_w = wsc.groupby("w")["c"].sum()
    n = int(wsc["c"].sum())
    rows = {"source": [], "w": [], "g2": []}
    for _, r in wsc.iterrows():
        a = int(r["c"])  # word in source
        b_ = int(tot_w[r["w"]]) - a  # word elsewhere
        c = int(tot_s[r["source"]]) - a  # other words in source
        d = n - a - b_ - c
        n1 = a + c
        n2 = b_ + d
        e1 = float(n1) * (a + b_) / n
        e2 = float(n2) * (a + b_) / n
        g2 = 0.0
        if a > 0 and e1 > 0:
            g2 += a * np.log(a / e1)
        if b_ > 0 and e2 > 0:
            g2 += b_ * np.log(b_ / e2)
        # complements keep the full 2x2 (word-absent cells)
        e3 = float(n1) * (c + d) / n
        e4 = float(n2) * (c + d) / n
        if c > 0 and e3 > 0:
            g2 += c * np.log(c / e3)
        if d > 0 and e4 > 0:
            g2 += d * np.log(d / e4)
        rows["source"].append(r["source"])
        rows["w"].append(r["w"])
        rows["g2"].append(2.0 * g2)
    df = pd.DataFrame(rows)
    df["g2_x1e6"] = _round_half_away(df["g2"].to_numpy() * 1e6)
    df = df.sort_values(
        ["source", "g2_x1e6", "w"], ascending=[True, False, True],
        ignore_index=True,
    )
    df["rk"] = df.groupby("source").cumcount() + 1
    df = df[df["rk"] <= _TOPK_KEYWORDS]
    return pa.table(
        {
            "source": pa.array(df["source"].tolist(), pa.string()),
            "w": pa.array(df["w"].tolist(), pa.string()),
            "rk": pa.array(df["rk"].to_numpy(dtype=np.int64)),
            "g2_x1e6": pa.array(df["g2_x1e6"].to_numpy(dtype=np.int64)),
        }
    )


KEYNESS_SQL = f"""
WITH w AS ({_WSC_SQL}
), c AS MATERIALIZED (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1, 2
), ts AS MATERIALIZED (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n1 FROM c GROUP BY 1
), tw AS MATERIALIZED (
  SELECT w, CAST(SUM(c) AS BIGINT) AS cw FROM c GROUP BY 1
), nn AS MATERIALIZED (
  SELECT CAST(SUM(c) AS BIGINT) AS n FROM c
), g AS MATERIALIZED (
  SELECT c.source, c.w,
         CAST(ROUND(2.0 * (
           CASE WHEN c.c > 0 THEN c.c * LN(c.c / (CAST(ts.n1 AS DOUBLE)
                * (c.c + (tw.cw - c.c)) / nn.n)) ELSE 0 END
           + CASE WHEN tw.cw - c.c > 0
                  THEN (tw.cw - c.c) * LN((tw.cw - c.c)
                       / (CAST(nn.n - ts.n1 AS DOUBLE)
                          * (c.c + (tw.cw - c.c)) / nn.n)) ELSE 0 END
           + CASE WHEN ts.n1 - c.c > 0
                  THEN (ts.n1 - c.c) * LN((ts.n1 - c.c)
                       / (CAST(ts.n1 AS DOUBLE)
                          * ((ts.n1 - c.c) + (nn.n - ts.n1 - tw.cw + c.c))
                          / nn.n)) ELSE 0 END
           + CASE WHEN nn.n - ts.n1 - tw.cw + c.c > 0
                  THEN (nn.n - ts.n1 - tw.cw + c.c)
                       * LN((nn.n - ts.n1 - tw.cw + c.c)
                            / (CAST(nn.n - ts.n1 AS DOUBLE)
                               * ((ts.n1 - c.c)
                                  + (nn.n - ts.n1 - tw.cw + c.c)) / nn.n))
                  ELSE 0 END
         ) * 1000000, 0) AS BIGINT) AS g2_x1e6
  FROM c
  JOIN ts ON ts.source = c.source
  JOIN tw ON tw.w = c.w, nn
), rk AS (
  SELECT source, w, g2_x1e6,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY g2_x1e6 DESC, w) AS rk
  FROM g
)
SELECT source, w, CAST(rk AS BIGINT) AS rk, g2_x1e6
FROM rk WHERE rk <= {_TOPK_KEYWORDS}
ORDER BY 1, 3
"""


# ---------------------------------------------------------------------------
# Juilland's D lexical dispersion of the top words
# ---------------------------------------------------------------------------


def q_juilland_d_top_words(sf_dir):
    """For the top-10 corpus words (by exact count, word tie-break):
    Juilland's dispersion D = 1 - CV / sqrt(k - 1) over the word's
    RELATIVE frequencies across the k source subcorpora — D near 1 =
    the word spreads evenly (function word), near 0 = it clumps in one
    source (topic word). The classic dispersion measure every frequency
    dictionary applies before trusting a raw count. Counts fold exact
    int64; the per-source relative frequencies divide exact integers;
    CV and D are mirrored doubles, x1e6 snap."""
    wsc = _word_source_counts(sf_dir)
    if not len(wsc) or "source" not in wsc.columns:
        return pa.table(
            {
                "w": pa.array([], pa.string()),
                "total": pa.array([], pa.int64()),
                "d_x1e6": pa.array([], pa.int64()),
            }
        )
    tot_w = (
        wsc.groupby("w")["c"]
        .sum()
        .reset_index()
        .sort_values(["c", "w"], ascending=[False, True], ignore_index=True)
    )
    top = tot_w.head(_TOP_WORDS)
    tot_s = wsc.groupby("source")["c"].sum()
    sources = sorted(tot_s.index)
    k = len(sources)
    out = {"w": [], "total": [], "d_x1e6": []}
    for _, r in top.iterrows():
        w = r["w"]
        sub = wsc[wsc["w"] == w].set_index("source")["c"]
        f = np.array(
            [float(sub.get(s, 0)) / tot_s[s] for s in sources],
            dtype=np.float64,
        )
        mean = float(np.sum(f)) / k
        out["w"].append(w)
        out["total"].append(int(r["c"]))
        if k < 2 or mean == 0.0:
            out["d_x1e6"].append(None)
            continue
        var = (float(np.sum(f * f)) - float(np.sum(f)) * np.sum(f) / k) / k
        cv = np.sqrt(var) / mean
        d = 1.0 - cv / np.sqrt(k - 1.0)
        out["d_x1e6"].append(int(_round_half_away(np.array([d * 1e6]))[0]))
    return pa.table(
        {
            "w": pa.array(out["w"], pa.string()),
            "total": pa.array(out["total"], pa.int64()),
            "d_x1e6": pa.array(out["d_x1e6"], pa.int64()),
        }
    )


JUILLAND_SQL = f"""
WITH w AS ({_WSC_SQL}
), c AS MATERIALIZED (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1, 2
), ts AS MATERIALIZED (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1
), top AS MATERIALIZED (
  SELECT w, CAST(SUM(c) AS BIGINT) AS total
  FROM c GROUP BY 1
  ORDER BY total DESC, w LIMIT {_TOP_WORDS}
), k AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS k FROM ts
), f AS MATERIALIZED (
  SELECT top.w, top.total, ts.source,
         CAST(COALESCE(c.c, 0) AS DOUBLE) / ts.n AS f
  FROM top CROSS JOIN ts
  LEFT JOIN c ON c.w = top.w AND c.source = ts.source
), a AS (
  SELECT w, total, SUM(f) AS sf, SUM(f * f) AS sf2,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM f GROUP BY 1, 2
)
SELECT w, total,
       CASE WHEN k < 2 OR sf / k = 0 THEN NULL
            ELSE CAST(ROUND(
              (1.0 - (SQRT((sf2 - sf * sf / k) / k) / (sf / k))
                     / SQRT(k - 1.0))
              * 1000000, 0) AS BIGINT) END AS d_x1e6
FROM a ORDER BY total DESC, w
"""


# ---------------------------------------------------------------------------
# Burrows' Delta stylometric distance between sources
# ---------------------------------------------------------------------------


def q_burrows_delta_sources(sf_dir):
    """For every source pair (s1 < s2): Burrows' Delta over the top-10
    corpus words — the mean absolute difference of the sources'
    z-scored relative word frequencies, stylometry's standard
    authorship distance (low Delta = same generating style; the
    source-level signal for provenance clustering). Counts fold exact
    int64; relative frequencies divide exact integers; the per-word
    mean/sd across sources and the pairwise fold are mirrored doubles,
    x1e6 snap, words with zero cross-source sd drop from the mean."""
    wsc = _word_source_counts(sf_dir)
    if not len(wsc) or "source" not in wsc.columns:
        return pa.table(
            {
                "s1": pa.array([], pa.string()),
                "s2": pa.array([], pa.string()),
                "delta_x1e6": pa.array([], pa.int64()),
            }
        )
    tot_w = (
        wsc.groupby("w")["c"]
        .sum()
        .reset_index()
        .sort_values(["c", "w"], ascending=[False, True], ignore_index=True)
    )
    top_words = tot_w.head(_TOP_WORDS)["w"].tolist()
    tot_s = wsc.groupby("source")["c"].sum()
    sources = sorted(tot_s.index)
    k = len(sources)
    F = np.zeros((len(top_words), k), dtype=np.float64)
    sub = wsc.set_index(["w", "source"])["c"]
    for i, w in enumerate(top_words):
        for j, s in enumerate(sources):
            F[i, j] = float(sub.get((w, s), 0)) / tot_s[s]
    mean = F.sum(axis=1) / k
    var = (np.sum(F * F, axis=1) - F.sum(axis=1) * F.sum(axis=1) / k) / k
    sd = np.sqrt(var)
    usable = sd > 0.0
    out = {"s1": [], "s2": [], "delta_x1e6": []}
    if not usable.any():
        # no word varies across sources -> no z-space (SQL join is empty)
        return pa.table(
            {
                "s1": pa.array([], pa.string()),
                "s2": pa.array([], pa.string()),
                "delta_x1e6": pa.array([], pa.int64()),
            }
        )
    for i in range(k):
        for j in range(i + 1, k):
            za = (F[usable, i] - mean[usable]) / sd[usable]
            zb = (F[usable, j] - mean[usable]) / sd[usable]
            delta = float(np.sum(np.abs(za - zb))) / int(usable.sum())
            out["s1"].append(sources[i])
            out["s2"].append(sources[j])
            out["delta_x1e6"].append(
                int(_round_half_away(np.array([delta * 1e6]))[0])
            )
    return pa.table(
        {
            "s1": pa.array(out["s1"], pa.string()),
            "s2": pa.array(out["s2"], pa.string()),
            "delta_x1e6": pa.array(out["delta_x1e6"], pa.int64()),
        }
    )


BURROWS_SQL = f"""
WITH w AS ({_WSC_SQL}
), c AS MATERIALIZED (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1, 2
), ts AS MATERIALIZED (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1
), top AS MATERIALIZED (
  SELECT w, CAST(SUM(c) AS BIGINT) AS total
  FROM c GROUP BY 1 ORDER BY total DESC, w LIMIT {_TOP_WORDS}
), f AS MATERIALIZED (
  SELECT top.w, ts.source,
         CAST(COALESCE(c.c, 0) AS DOUBLE) / ts.n AS f
  FROM top CROSS JOIN ts
  LEFT JOIN c ON c.w = top.w AND c.source = ts.source
), stats AS MATERIALIZED (
  SELECT w, SUM(f) / COUNT(*) AS mean,
         SQRT((SUM(f * f) - SUM(f) * SUM(f) / COUNT(*)) / COUNT(*)) AS sd
  FROM f GROUP BY 1
), z AS MATERIALIZED (
  SELECT f.w, f.source, (f.f - stats.mean) / stats.sd AS z
  FROM f JOIN stats ON stats.w = f.w
  WHERE stats.sd > 0
)
SELECT a.source AS s1, b.source AS s2,
       CAST(ROUND(SUM(ABS(a.z - b.z)) / COUNT(*) * 1000000, 0) AS BIGINT)
         AS delta_x1e6
FROM z a JOIN z b ON b.w = a.w AND a.source < b.source
GROUP BY 1, 2 ORDER BY 1, 2
"""


def register_r4dc(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "keyness_g2_sources": q_keyness_g2_sources,
            "juilland_d_top_words": q_juilland_d_top_words,
            "burrows_delta_sources": q_burrows_delta_sources,
        }
    )
    oracles.update(
        {
            "keyness_g2_sources": KEYNESS_SQL,
            "juilland_d_top_words": JUILLAND_SQL,
            "burrows_delta_sources": BURROWS_SQL,
        }
    )
