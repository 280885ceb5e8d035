"""Round-4 batch FS: incidence-based richness, corpus dispersion,
and interaction testing — Chao2 per source (unseen-vocabulary bound
from document incidence rather than token abundance, the estimator
of choice when sampling is by document), Gries' DP dispersion of the
top-20 corpus words (is a word's mass spread like the corpus or
clumped in few sources?), and Tukey's one-degree-of-freedom
non-additivity test on the day x hour-of-day count table (do day
and hour effects interact multiplicatively?).

Exactness discipline: Chao2's (V, q1, q2, T) are exact int64 with
the bias-corrected mirrored double law; DP is exact rational count
ratios folded through the same 20-term abs sum; Tukey's test folds
mirrored double row/column/grand means over the identical dense
grid, snapped at x1e3."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4dd import (
    _word_counts_per_source,
)
from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _HOUR_US,
    _round_half_away,
)
from mimirsbrunn_ray.stages.rollup import tree_merge

_DP_TOP = 20
_DAY_US = 86_400_000_000


_CHAO2_COLS = ["source", "n_docs", "vocab", "q1", "q2",
               "chao2_x1e6"]


def q_chao2_incidence_vocab(sf_dir):
    """Chao2 incidence-based richness per source: with q1/q2 the
    words present in exactly one/two DOCUMENTS and T the source's
    document count, Chao2 = V + ((T-1)/T) * q1*(q1-1)/(2*(q2+1))
    (bias-corrected) — the unseen-vocabulary bound under
    document-level sampling, complementing abundance-based Chao1.
    Distinct (source, word, doc) incidences fold in one distributed
    pass; the law is one mirrored double expression."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["source", "doc_id", "text"])

    def part(b: pa.Table) -> pa.Table:
        m = None
        for c in ("source", "doc_id", "text"):
            v = pc.is_valid(b[c])
            m = v if m is None else pc.and_(m, v)
        b = b.filter(m)
        words = pc.split_pattern(b["text"], pattern=" ")
        lens = pc.list_value_length(words).to_numpy(
            zero_copy_only=False)
        flat = pc.list_flatten(words)
        src = pa.array(np.repeat(
            b["source"].to_numpy(zero_copy_only=False), lens))
        did = pa.array(np.repeat(
            b["doc_id"].to_numpy(zero_copy_only=False), lens))
        t = pa.table({"source": src, "w": flat, "doc_id": did})
        return t.group_by(["source", "w", "doc_id"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["source", "w", "doc_id"]).group_by(
            ["source", "w", "doc_id"]).aggregate([])

    inc = tree_merge(
        docs.map_batches(part, batch_format="pyarrow",
                         batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["source", "w"],
    )

    def spectrum(b: pa.Table) -> pa.Table:
        cols = ["source", "w", "df"]
        if b.num_rows == 0 or "source" not in b.column_names:
            return pa.table({
                "source": pa.array([], pa.string()),
                "w": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
            })
        g = b.group_by(["source", "w"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(cols)

    def spec_comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "w"]).aggregate([("df", "sum")])
        return g.rename_columns(["source", "w", "df"])

    wdf = tree_merge(
        inc.map_batches(spectrum, batch_format="pyarrow",
                        batch_size=None),
        spec_comb,
    ).to_pandas()

    # per-source doc counts (docs with usable text)
    def dc_part(b: pa.Table) -> pa.Table:
        m = None
        for c in ("source", "doc_id", "text"):
            v = pc.is_valid(b[c])
            m = v if m is None else pc.and_(m, v)
        b = b.filter(m)
        g = b.select(["source", "doc_id"]).group_by(
            ["source", "doc_id"]).aggregate([])
        return g

    def dc_distinct(b: pa.Table) -> pa.Table:
        return b.select(["source", "doc_id"]).group_by(
            ["source", "doc_id"]).aggregate([])

    dd = tree_merge(
        docs.map_batches(dc_part, batch_format="pyarrow",
                         batch_size=None),
        dc_distinct,
        final_shards=8,
        shard_cols=["source", "doc_id"],
    ).to_pandas()
    if ("source" not in wdf.columns or len(wdf) == 0
            or "source" not in dd.columns):
        return pa.table({
            "source": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64())
               for c in _CHAO2_COLS[1:]},
        })
    tcount = dd.groupby("source").size()
    out = {c: [] for c in _CHAO2_COLS}
    for src, g in wdf.groupby("source", sort=True):
        df = g["df"].to_numpy(np.int64)
        v = len(df)
        q1 = int((df == 1).sum())
        q2 = int((df == 2).sum())
        t = int(tcount.get(src, 0))
        if t < 1:
            continue
        chao2 = v + (t - 1) / t * q1 * (q1 - 1) / (2.0 * (q2 + 1))
        out["source"].append(src)
        out["n_docs"].append(t)
        out["vocab"].append(v)
        out["q1"].append(q1)
        out["q2"].append(q2)
        out["chao2_x1e6"].append(_round_half_away(chao2 * 1e6))
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        **{c: pa.array(out[c], pa.int64())
           for c in _CHAO2_COLS[1:]},
    })


CHAO2_SQL = """
WITH inc AS MATERIALIZED (
  SELECT DISTINCT source, doc_id,
         unnest(string_split(text, ' ')) AS w
  FROM documents
  WHERE source IS NOT NULL AND doc_id IS NOT NULL
    AND text IS NOT NULL
), wdf AS MATERIALIZED (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS df
  FROM inc GROUP BY 1, 2
), tc AS MATERIALIZED (
  SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS t
  FROM documents
  WHERE source IS NOT NULL AND doc_id IS NOT NULL
    AND text IS NOT NULL
  GROUP BY 1
), sp AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS v,
         CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS q1,
         CAST(SUM(CASE WHEN df = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS q2
  FROM wdf GROUP BY 1
)
SELECT sp.source,
       tc.t AS n_docs,
       sp.v AS vocab,
       sp.q1, sp.q2,
       CAST(ROUND((sp.v
              + CAST(tc.t - 1 AS DOUBLE) / tc.t
                * sp.q1 * (sp.q1 - 1) / (2.0 * (sp.q2 + 1)))
            * 1000000, 0) AS BIGINT) AS chao2_x1e6
FROM sp JOIN tc USING (source)
WHERE tc.t >= 1
ORDER BY source
"""


def q_gries_dp_dispersion(sf_dir):
    """Gries' DP (deviation of proportions) for the top-20 corpus
    words by total count (ties to the lexicographically first):
    DP = 0.5 * sum_i |v_i - s_i| over sources, where v_i is the
    word's share of its own mass in source i and s_i the source's
    share of all tokens — 0 means the word tracks the corpus mix,
    near 1 means it clumps in one source.  The modern replacement
    for Juilland's D.  One distributed word-count pass; the DP sum
    is exact rational ratios folded identically on both sides."""
    wsc = _word_counts_per_source(sf_dir)
    cols = ["w", "total", "dp_ppm"]
    if not len(wsc) or "source" not in wsc.columns:
        return pa.table({
            "w": pa.array([], pa.string()),
            "total": pa.array([], pa.int64()),
            "dp_ppm": pa.array([], pa.int64()),
        })
    tot_by_src = wsc.groupby("source")["c"].sum()
    n_all = int(tot_by_src.sum())
    if n_all == 0:
        return pa.table({
            "w": pa.array([], pa.string()),
            "total": pa.array([], pa.int64()),
            "dp_ppm": pa.array([], pa.int64()),
        })
    s_share = tot_by_src / n_all
    wt = wsc.groupby("w")["c"].sum().reset_index()
    wt = wt.sort_values(["c", "w"], ascending=[False, True],
                        ignore_index=True).head(_DP_TOP)
    piv = wsc[wsc["w"].isin(wt["w"])].pivot_table(
        index="w", columns="source", values="c", aggfunc="sum",
        fill_value=0)
    piv = piv.reindex(columns=s_share.index, fill_value=0)
    out = {c: [] for c in cols}
    for _, row in wt.iterrows():
        w = row["w"]
        total = int(row["c"])
        v = piv.loc[w].to_numpy(np.float64) / total
        dp = 0.5 * float(
            np.abs(v - s_share.to_numpy(np.float64)).sum())
        out["w"].append(w)
        out["total"].append(total)
        out["dp_ppm"].append(_round_half_away(dp * 1e6))
    return pa.table({
        "w": pa.array(out["w"], pa.string()),
        "total": pa.array(out["total"], pa.int64()),
        "dp_ppm": pa.array(out["dp_ppm"], pa.int64()),
    })


GRIES_DP_SQL = f"""
WITH wrd AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), c AS MATERIALIZED (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM wrd GROUP BY 1, 2
), stot AS MATERIALIZED (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1
), gl AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS n_all FROM stot
), top AS MATERIALIZED (
  SELECT w, CAST(SUM(c) AS BIGINT) AS total
  FROM c GROUP BY 1
  ORDER BY total DESC, w LIMIT {_DP_TOP}
), grid AS MATERIALIZED (
  SELECT t.w, t.total, s.source, s.n,
         COALESCE(c.c, 0) AS cw
  FROM top t CROSS JOIN stot s
  LEFT JOIN c ON c.w = t.w AND c.source = s.source
)
SELECT w,
       ANY_VALUE(total) AS total,
       CAST(ROUND(0.5 * SUM(ABS(
              CAST(cw AS DOUBLE) / total
              - CAST(n AS DOUBLE) / gl.n_all))
            * 1000000, 0) AS BIGINT) AS dp_ppm
FROM grid CROSS JOIN gl
GROUP BY w ORDER BY total DESC, w
"""


def q_tukey_nonadditivity_dayhour(sf_dir):
    """Tukey's one-degree-of-freedom non-additivity test on the
    day x hour-of-day event-count table (dense over observed days,
    all 24 hours): decomposes the residual from the additive model
    y_ij = m + a_i + b_j into the single multiplicative direction
    a_i*b_j and reports its SS and F statistic — significant F
    means the diurnal shape scales with daily volume rather than
    adding to it (log the counts before modeling).  Counts are one
    distributed pass; the sums are mirrored double math over the
    identical grid."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        day = pc.divide(us, _DAY_US)
        hr = pc.divide(us, _HOUR_US)
        hod = pc.subtract(hr, pc.multiply(pc.divide(hr, 24),
                                          pa.scalar(24, pa.int64())))
        t = pa.table({"day": day, "hod": hod})
        g = t.group_by(["day", "hod"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["day", "hod", "c"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["day", "hod"]).aggregate([("c", "sum")])
        return g.rename_columns(["day", "hod", "c"])

    cc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    cols = ["n_days", "ss_nonadd_x1e3", "ss_resid_x1e3", "f_x1e3"]
    if "day" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in cols})
    days = sorted(cc["day"].astype(np.int64).unique())
    grid = pd.MultiIndex.from_product(
        [days, range(24)], names=["day", "hod"]
    ).to_frame(index=False)
    g = grid.merge(cc, on=["day", "hod"], how="left")
    g["c"] = g["c"].fillna(0).astype(np.int64)
    piv = g.pivot_table(index="day", columns="hod", values="c",
                        aggfunc="sum", fill_value=0)
    y = piv.to_numpy(np.float64)
    R, C = y.shape
    if R < 3 or C < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in cols})
    m = y.mean()
    a = y.mean(axis=1) - m
    b_ = y.mean(axis=0) - m
    resid = y - m - a[:, None] - b_[None, :]
    denom = float((a * a).sum()) * float((b_ * b_).sum())
    if denom == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in cols})
    num = float((y * a[:, None] * b_[None, :]).sum())
    ss_nonadd = num * num / denom
    ss_resid = float((resid * resid).sum())
    df = (R - 1) * (C - 1) - 1
    if df <= 0 or ss_resid - ss_nonadd <= 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in cols})
    f = ss_nonadd / ((ss_resid - ss_nonadd) / df)
    return pa.table({
        "n_days": pa.array([R], pa.int64()),
        "ss_nonadd_x1e3": pa.array(
            [_round_half_away(ss_nonadd * 1e3)], pa.int64()),
        "ss_resid_x1e3": pa.array(
            [_round_half_away(ss_resid * 1e3)], pa.int64()),
        "f_x1e3": pa.array(
            [_round_half_away(f * 1e3)], pa.int64()),
    })


TUKEY_NONADD_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT EPOCH_US(ts) // {_DAY_US} AS day,
         (EPOCH_US(ts) // {_HOUR_US}) % 24 AS hod,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1, 2
), grid AS MATERIALIZED (
  SELECT d.day, h.hod,
         CAST(COALESCE(e.c, 0) AS DOUBLE) AS y
  FROM (SELECT DISTINCT day FROM e) d
  CROSS JOIN (SELECT CAST(k AS BIGINT) AS hod
              FROM range(0, 24) r(k)) h
  LEFT JOIN e ON e.day = d.day AND e.hod = h.hod
), dims AS MATERIALIZED (
  SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS r,
         24 AS c, AVG(y) AS m
  FROM grid
), ra AS MATERIALIZED (
  SELECT day, AVG(y) - dims.m AS a FROM grid CROSS JOIN dims
  GROUP BY day, dims.m
), cb AS MATERIALIZED (
  SELECT hod, AVG(y) - dims.m AS b FROM grid CROSS JOIN dims
  GROUP BY hod, dims.m
), parts AS MATERIALIZED (
  SELECT SUM(g.y * ra.a * cb.b) AS num,
         SUM((g.y - dims.m - ra.a - cb.b)
             * (g.y - dims.m - ra.a - cb.b)) AS ss_resid
  FROM grid g
  JOIN ra USING (day) JOIN cb USING (hod) CROSS JOIN dims
), sq AS MATERIALIZED (
  SELECT (SELECT SUM(a * a) FROM ra) AS saa,
         (SELECT SUM(b * b) FROM cb) AS sbb
), fin AS (
  SELECT dims.r, parts.num * parts.num / (sq.saa * sq.sbb)
           AS ss_nonadd,
         parts.ss_resid,
         (dims.r - 1) * (dims.c - 1) - 1 AS df
  FROM parts CROSS JOIN sq CROSS JOIN dims
  WHERE sq.saa * sq.sbb <> 0
)
SELECT CAST(r AS BIGINT) AS n_days,
       CAST(ROUND(ss_nonadd * 1000, 0) AS BIGINT)
         AS ss_nonadd_x1e3,
       CAST(ROUND(ss_resid * 1000, 0) AS BIGINT)
         AS ss_resid_x1e3,
       CAST(ROUND(ss_nonadd / ((ss_resid - ss_nonadd) / df)
            * 1000, 0) AS BIGINT) AS f_x1e3
FROM fin
WHERE r >= 3 AND df > 0 AND ss_resid - ss_nonadd > 0
"""


def register_r4fs(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "chao2_incidence_vocab": q_chao2_incidence_vocab,
            "gries_dp_dispersion": q_gries_dp_dispersion,
            "tukey_nonadditivity_dayhour":
                q_tukey_nonadditivity_dayhour,
        }
    )
    oracles.update(
        {
            "chao2_incidence_vocab": CHAO2_SQL,
            "gries_dp_dispersion": GRIES_DP_SQL,
            "tukey_nonadditivity_dayhour": TUKEY_NONADD_SQL,
        }
    )
