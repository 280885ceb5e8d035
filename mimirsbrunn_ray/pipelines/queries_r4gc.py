"""Round-4 batch GC: word-level sequence memory, embedding-space
separability, and skew-aware outliers — the word-bigram conditional
entropy H(W_t | W_{t-1}) per source (how predictable each source's
text is one word ahead; templated sources score near zero), a
nearest-centroid classifier confusion census over the embedding
labels (the zero-training separability baseline every fancier
probe must beat), and a double-MAD outlier census of order values
(separate left/right MAD scales, the robust rule that a symmetric
MAD gets wrong on skewed money distributions).

Exactness discipline: bigram counts fold exact int64 with one
mirrored log2 per distinct bigram; centroid dot products fold
identical double sums from identical float32 inputs (assignment
ties break to the lowest label on both sides); double-MAD
thresholds derive from interpolated medians of exact cent values
with the same strict comparisons."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import _round_half_away
from mimirsbrunn_ray.stages.rollup import tree_merge

_EMB_DIM = 64


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_BIG_COLS = ["source", "n_bigrams", "h_cond_x1e6", "h_uni_x1e6"]


def q_word_bigram_cond_entropy(sf_dir):
    """Per source, the conditional entropy H(W_t | W_{t-1}) of
    consecutive word pairs WITHIN each document (no cross-document
    bigrams), next to the unigram entropy over the same positions
    — the gap is what one word of context buys; near-zero
    conditional entropy flags templated/boilerplate sources.
    Bigram counts fold exact int64 in one distributed pass."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("source", "text"))
        empty = pa.table({
            "source": pa.array([], pa.string()),
            "w1": pa.array([], pa.string()),
            "w2": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        })
        if b.num_rows == 0:
            return empty
        src = b["source"].to_numpy(zero_copy_only=False)
        words = pc.split_pattern(b["text"], pattern=" ")
        lens = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(words).to_numpy(
            zero_copy_only=False)
        total = int(lens.sum())
        if total == 0:
            return empty
        # vectorized within-doc bigram mask: keep every position
        # except each document's last word
        pos = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
        keep = pos < np.repeat(lens, lens) - 1
        idx = np.flatnonzero(keep)
        t = pa.table({
            "source": pa.array(np.repeat(src, lens)[idx]),
            "w1": pa.array(flat[idx]),
            "w2": pa.array(flat[idx + 1]),
        })
        g = t.group_by(["source", "w1", "w2"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["source", "w1", "w2", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "w1", "w2"]).aggregate(
            [("n", "sum")])
        return g.rename_columns(["source", "w1", "w2", "n"])

    bg = tree_merge(
        docs.map_batches(part, batch_format="pyarrow",
                         batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["source", "w1"],
    ).to_pandas()
    if "source" not in bg.columns or len(bg) == 0:
        return pa.table({
            "source": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _BIG_COLS[1:]},
        })
    out = {c: [] for c in _BIG_COLS}
    for src, g in bg.groupby("source", sort=True):
        n = g["n"].to_numpy(np.int64)
        tot = int(n.sum())
        if tot == 0:
            continue

        def h_of(counts: np.ndarray) -> float:
            p = counts[counts > 0].astype(np.float64) / tot
            return float(-(p * np.log2(p)).sum())

        h2 = h_of(n)
        pre = g.groupby("w1")["n"].sum().to_numpy(np.int64)
        h1pre = h_of(pre)
        suf = g.groupby("w2")["n"].sum().to_numpy(np.int64)
        h1suf = h_of(suf)
        out["source"].append(src)
        out["n_bigrams"].append(tot)
        out["h_cond_x1e6"].append(
            _round_half_away((h2 - h1pre) * 1e6))
        out["h_uni_x1e6"].append(_round_half_away(h1suf * 1e6))
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _BIG_COLS[1:]},
    })


BIGRAM_H_SQL = """
WITH d AS MATERIALIZED (
  SELECT source, string_split(text, ' ') AS ws
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), pos AS MATERIALIZED (
  SELECT source, ws[CAST(r.k AS INTEGER)] AS w1,
         ws[CAST(r.k + 1 AS INTEGER)] AS w2
  FROM d JOIN range(1, 100000) r(k)
    ON r.k <= len(ws) - 1
), bg AS MATERIALIZED (
  SELECT source, w1, w2, CAST(COUNT(*) AS BIGINT) AS n
  FROM pos GROUP BY 1, 2, 3
), tot AS MATERIALIZED (
  SELECT source, CAST(SUM(n) AS BIGINT) AS t FROM bg GROUP BY 1
), h2 AS (
  SELECT bg.source,
         -SUM(CAST(bg.n AS DOUBLE) / tot.t
              * LOG2(CAST(bg.n AS DOUBLE) / tot.t)) AS h
  FROM bg JOIN tot USING (source) GROUP BY 1
), h1pre AS (
  SELECT source, -SUM(CAST(s AS DOUBLE) / t
                      * LOG2(CAST(s AS DOUBLE) / t)) AS h
  FROM (SELECT bg.source, bg.w1, SUM(bg.n) AS s,
               ANY_VALUE(tot.t) AS t
        FROM bg JOIN tot USING (source) GROUP BY 1, 2)
  GROUP BY 1
), h1suf AS (
  SELECT source, -SUM(CAST(s AS DOUBLE) / t
                      * LOG2(CAST(s AS DOUBLE) / t)) AS h
  FROM (SELECT bg.source, bg.w2, SUM(bg.n) AS s,
               ANY_VALUE(tot.t) AS t
        FROM bg JOIN tot USING (source) GROUP BY 1, 2)
  GROUP BY 1
)
SELECT tot.source,
       tot.t AS n_bigrams,
       CAST(ROUND((h2.h - h1pre.h) * 1000000, 0) AS BIGINT)
         AS h_cond_x1e6,
       CAST(ROUND(h1suf.h * 1000000, 0) AS BIGINT) AS h_uni_x1e6
FROM tot
JOIN h2 USING (source)
JOIN h1pre USING (source)
JOIN h1suf USING (source)
WHERE tot.t > 0
ORDER BY tot.source
"""

_CENT_COLS = ["label", "n_vecs", "n_correct", "accuracy_ppm"]


def q_centroid_classifier_confusion(sf_dir):
    """Nearest-centroid (by dot product against mean vectors)
    classification census over the embedding labels: per true
    label, how many vectors land on their own centroid — the
    zero-training separability baseline for the embedding space
    (ties break to the lowest label).  Centroid sums fold in one
    distributed pass; assignment is one matmul per batch against
    the broadcast centroid matrix."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["label", "embedding"])

    def cpart(b: pa.Table) -> pa.Table:
        b = _valid(b, ("label", "embedding"))
        if b.num_rows == 0:
            return pa.table({
                "label": pa.array([], pa.int64()),
                "i": pa.array([], pa.int64()),
                "s": pa.array([], pa.float64()),
                "n": pa.array([], pa.int64()),
            })
        lab = b["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        x = b["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64).reshape(
            len(lab), -1)
        d = x.shape[1]
        rows = {"label": [], "i": [], "s": [], "n": []}
        for lv in np.unique(lab):
            xs = x[lab == lv]
            rows["label"].extend([int(lv)] * d)
            rows["i"].extend(range(d))
            rows["s"].extend(xs.sum(axis=0).tolist())
            rows["n"].extend([len(xs)] * d)
        return pa.table({
            "label": pa.array(rows["label"], pa.int64()),
            "i": pa.array(rows["i"], pa.int64()),
            "s": pa.array(rows["s"], pa.float64()),
            "n": pa.array(rows["n"], pa.int64()),
        })

    def ccomb(b: pa.Table) -> pa.Table:
        g = b.group_by(["label", "i"]).aggregate(
            [("s", "sum"), ("n", "sum")])
        return g.rename_columns(["label", "i", "s", "n"])

    emb = emb.materialize()
    cm = tree_merge(
        emb.map_batches(cpart, batch_format="pyarrow",
                        batch_size=None),
        ccomb,
    ).to_pandas()
    if "label" not in cm.columns or len(cm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _CENT_COLS})
    # n summed over batches PER CELL i; divide per cell
    labels = sorted(cm["label"].unique())
    d = int(cm["i"].max()) + 1
    cent = np.zeros((len(labels), d))
    for li, lv in enumerate(labels):
        g = cm[cm["label"] == lv].sort_values("i")
        cent[li] = (g["s"].to_numpy(np.float64)
                    / g["n"].to_numpy(np.float64))
    lab_arr = np.array(labels, dtype=np.int64)

    def assign(b: pa.Table) -> pa.Table:
        cols = ["label", "n_vecs", "n_correct"]
        if b.num_rows == 0 or "label" not in b.column_names:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in cols})
        lab = b["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        x = b["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64).reshape(
            len(lab), -1)
        scores = x @ cent.T
        best = lab_arr[np.argmax(scores, axis=1)]
        df = pd.DataFrame({"label": lab,
                           "ok": (best == lab).astype(np.int64)})
        agg = df.groupby("label", sort=False).agg(
            n_vecs=("ok", "size"), n_correct=("ok", "sum")
        ).reset_index()
        for c in ["label", "n_vecs", "n_correct"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def acomb(b: pa.Table) -> pa.Table:
        g = b.group_by(["label"]).aggregate(
            [("n_vecs", "sum"), ("n_correct", "sum")])
        return g.rename_columns(["label", "n_vecs", "n_correct"])

    res = tree_merge(
        emb.map_batches(assign, batch_format="pyarrow",
                        batch_size=None),
        acomb,
    ).to_pandas()
    if "label" not in res.columns or len(res) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _CENT_COLS})
    res = res.sort_values("label", ignore_index=True)
    ppm = [
        _round_half_away(c / n * 1e6)
        for c, n in zip(res["n_correct"].astype(np.int64),
                        res["n_vecs"].astype(np.int64))
    ]
    return pa.table({
        "label": pa.array(res["label"].to_numpy(np.int64)),
        "n_vecs": pa.array(res["n_vecs"].to_numpy(np.int64)),
        "n_correct": pa.array(
            res["n_correct"].to_numpy(np.int64)),
        "accuracy_ppm": pa.array(ppm, pa.int64()),
    })


CENTROID_SQL = f"""
WITH v AS MATERIALIZED (
  SELECT label, vec_id, r.k AS i,
         CAST(embedding[CAST(r.k AS INTEGER)] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(1, {_EMB_DIM + 1}) r(k)
  WHERE label IS NOT NULL AND embedding IS NOT NULL
), cent AS MATERIALIZED (
  SELECT label AS clabel, i, AVG(x) AS c
  FROM v GROUP BY 1, 2
), dots AS MATERIALIZED (
  SELECT v.vec_id, v.label, cent.clabel,
         SUM(v.x * cent.c) AS dot
  FROM v JOIN cent ON cent.i = v.i
  GROUP BY 1, 2, 3
), best AS MATERIALIZED (
  SELECT vec_id, label, clabel AS pred
  FROM dots
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                             ORDER BY dot DESC, clabel) = 1
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       CAST(ROUND(CAST(SUM(CASE WHEN pred = label THEN 1
                                ELSE 0 END) AS DOUBLE)
            / COUNT(*) * 1000000, 0) AS BIGINT) AS accuracy_ppm
FROM best GROUP BY 1 ORDER BY label
"""

_DMAD_COLS = ["n_orders", "med_cents", "mad_left_cents_x1e3",
              "mad_right_cents_x1e3", "n_low", "n_high"]


def q_double_mad_price_outliers(sf_dir):
    """Double-MAD outlier census of order values: split at the
    median, compute a SEPARATE median absolute deviation on each
    side, and count orders beyond 3 left-MADs below / 3 right-MADs
    above — the robust rule for skewed money distributions, where
    one symmetric MAD either drowns the left tail or floods the
    right.  Cents fold exactly; medians are the interpolated
    convention on both engines."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_totalprice"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_totalprice"]))
        x = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(
            x >= 0, np.floor(x * 100.0 + 0.5),
            np.ceil(x * 100.0 - 0.5)).astype(np.int64)
        return pa.table({"cents": pa.array(cents)})

    cents_df = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        lambda b: b,
    ).to_pandas()
    if "cents" not in cents_df.columns or len(cents_df) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DMAD_COLS})
    c = cents_df["cents"].to_numpy(np.int64).astype(np.float64)
    n = len(c)
    med = float(np.median(c))
    left = c[c <= med]
    right = c[c >= med]
    mad_l = float(np.median(np.abs(left - med)))
    mad_r = float(np.median(np.abs(right - med)))
    if mad_l == 0 or mad_r == 0:
        return pa.table(
            {c_: pa.array([], pa.int64()) for c_ in _DMAD_COLS})
    n_low = int((c < med - 3.0 * mad_l).sum())
    n_high = int((c > med + 3.0 * mad_r).sum())
    return pa.table({
        "n_orders": pa.array([n], pa.int64()),
        "med_cents": pa.array(
            [_round_half_away(med)], pa.int64()),
        "mad_left_cents_x1e3": pa.array(
            [_round_half_away(mad_l * 1e3)], pa.int64()),
        "mad_right_cents_x1e3": pa.array(
            [_round_half_away(mad_r * 1e3)], pa.int64()),
        "n_low": pa.array([n_low], pa.int64()),
        "n_high": pa.array([n_high], pa.int64()),
    })


DMAD_SQL = """
WITH o AS MATERIALIZED (
  SELECT CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
              AS DOUBLE) AS c
  FROM orders WHERE o_totalprice IS NOT NULL
), m AS MATERIALIZED (
  SELECT MEDIAN(c) AS med, CAST(COUNT(*) AS BIGINT) AS n FROM o
), ml AS MATERIALIZED (
  SELECT MEDIAN(ABS(o.c - m.med)) AS mad_l
  FROM o CROSS JOIN m WHERE o.c <= m.med
), mr AS MATERIALIZED (
  SELECT MEDIAN(ABS(o.c - m.med)) AS mad_r
  FROM o CROSS JOIN m WHERE o.c >= m.med
)
SELECT m.n AS n_orders,
       CAST(ROUND(m.med, 0) AS BIGINT) AS med_cents,
       CAST(ROUND(ml.mad_l * 1000, 0) AS BIGINT)
         AS mad_left_cents_x1e3,
       CAST(ROUND(mr.mad_r * 1000, 0) AS BIGINT)
         AS mad_right_cents_x1e3,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM o CROSS JOIN m mm
        CROSS JOIN ml mll
        WHERE o.c < mm.med - 3.0 * mll.mad_l) AS n_low,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM o CROSS JOIN m mm
        CROSS JOIN mr mrr
        WHERE o.c > mm.med + 3.0 * mrr.mad_r) AS n_high
FROM m CROSS JOIN ml CROSS JOIN mr
WHERE ml.mad_l <> 0 AND mr.mad_r <> 0
"""


def register_r4gc(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "word_bigram_cond_entropy": q_word_bigram_cond_entropy,
            "centroid_classifier_confusion":
                q_centroid_classifier_confusion,
            "double_mad_price_outliers":
                q_double_mad_price_outliers,
        }
    )
    oracles.update(
        {
            "word_bigram_cond_entropy": BIGRAM_H_SQL,
            "centroid_classifier_confusion": CENTROID_SQL,
            "double_mad_price_outliers": DMAD_SQL,
        }
    )
