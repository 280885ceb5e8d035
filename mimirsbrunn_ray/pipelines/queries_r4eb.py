"""Round-4 batch EB: Syntetos-Boylan demand classification per part,
Zipf's law of abbreviation (frequency vs word length correlation), and
the TwoNN intrinsic-dimension estimator over the embedding table.

Exactness discipline: demand ADI/CV^2 classify by integer cross-
multiplication (span*100 vs 132*(n-1); 100*(n*ss2 - s1^2) vs 49*s1^2)
over cents-quantized day sums, so the quadrant label is exact and only
the two reported ratios are snapped doubles; the abbreviation
correlation folds ln-frequency as x1e3 per-term snapped integers (the
queries_r4i discipline) with HUGEINT-exact variance numerators; TwoNN
squared distances are exact int64 over x1e6 embedding codes (the
reciprocal_nn_pairs discipline), so both neighbor VALUES are engine-
independent and only the closing log-sum estimator is mirrored."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000


def _round_half_away(x):
    if isinstance(x, np.ndarray):
        return np.where(
            x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
        ).astype(np.int64)
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


# ---------------------------------------------------------------------------
# Syntetos-Boylan demand classification per part
# ---------------------------------------------------------------------------


def q_demand_classification_parts(sf_dir):
    """Per part with >= 2 demand days: the Syntetos-Boylan demand
    quadrant — ADI (average inter-demand interval, span/(n-1) days over
    distinct ship days) and CV^2 (population squared coefficient of
    variation of cents-quantized daily quantity sums) cut at the
    classical 1.32 / 0.49 thresholds into smooth / intermittent /
    erratic / lumpy — the forecastability triage a replenishment
    planner runs before picking a model per SKU. Both threshold
    comparisons are exact integer cross-multiplications; the reported
    ADI and CV^2 are snapped doubles. One partkey hash-bucket shuffle."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_shipdate", "l_quantity"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("l_partkey", "l_shipdate", "l_quantity"))
        us = b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        cents = np.where(
            q >= 0, np.floor(q * 100 + 0.5), np.ceil(q * 100 - 0.5)
        ).astype(np.int64)
        t = pa.table(
            {
                "l_partkey": b["l_partkey"],
                "day": pa.array((us // _DAY_US).astype(np.int64)),
                "s": pa.array(cents),
            }
        )
        t = _sum_by(t, ["l_partkey", "day"], ["s"])
        return add_bucket(t, "l_partkey", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "l_partkey": pd.Series([], dtype=np.int64),
                "n_days": pd.Series([], dtype=np.int64),
                "adi_x1e6": pd.Series([], dtype=np.int64),
                "cv2_x1e6": pd.Series([], dtype=np.int64),
                "demand_class": pd.Series([], dtype=object),
            }
        )
        if len(g) == 0:
            return empty
        # partial day-sums may repeat per (part, day) across input
        # blocks: finish the fold inside the bucket first
        g = g.groupby(["l_partkey", "day"], as_index=False)["s"].sum()
        rows = {"l_partkey": [], "n_days": [], "adi_x1e6": [],
                "cv2_x1e6": [], "demand_class": []}
        for pk, gg in g.groupby("l_partkey", sort=False):
            s = gg["s"].to_numpy(dtype=np.int64)
            days = gg["day"].to_numpy(dtype=np.int64)
            n = len(s)
            if n < 2:
                continue
            span = int(days.max() - days.min())
            s1 = int(np.sum(s))
            ss2 = int(np.sum(s * s))
            a = n * ss2 - s1 * s1
            adi_ge = span * 100 >= 132 * (n - 1)
            cv2_ge = a * 100 >= 49 * s1 * s1
            cls = (
                "lumpy" if adi_ge and cv2_ge
                else "intermittent" if adi_ge
                else "erratic" if cv2_ge
                else "smooth"
            )
            rows["l_partkey"].append(int(pk))
            rows["n_days"].append(n)
            rows["adi_x1e6"].append(
                _round_half_away(span / (n - 1.0) * 1e6)
            )
            rows["cv2_x1e6"].append(
                _round_half_away(float(a) / float(s1 * s1) * 1e6)
            )
            rows["demand_class"].append(cls)
        out = pd.DataFrame(rows)
        for c in ("l_partkey", "n_days", "adi_x1e6", "cv2_x1e6"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        li.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
    )


DEMAND_CLASS_SQL = """
WITH d AS (
  SELECT l_partkey,
         CAST(FLOOR(EPOCH_US(l_shipdate) / 86400000000) AS BIGINT) AS day,
         CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
           AS s
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_shipdate IS NOT NULL
    AND l_quantity IS NOT NULL
  GROUP BY 1, 2
), a AS (
  SELECT l_partkey,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MAX(day) - MIN(day) AS BIGINT) AS span,
         CAST(SUM(s) AS BIGINT) AS s1,
         CAST(SUM(s * s) AS BIGINT) AS ss2
  FROM d GROUP BY 1 HAVING COUNT(*) >= 2
)
SELECT l_partkey, n AS n_days,
       CAST(ROUND(span / (n - 1.0) * 1000000, 0) AS BIGINT) AS adi_x1e6,
       CAST(ROUND(CAST(n * ss2 - s1 * s1 AS DOUBLE)
            / CAST(s1 * s1 AS DOUBLE) * 1000000, 0) AS BIGINT)
         AS cv2_x1e6,
       CASE
         WHEN span * 100 >= 132 * (n - 1)
              AND (n * ss2 - s1 * s1) * 100 >= 49 * s1 * s1 THEN 'lumpy'
         WHEN span * 100 >= 132 * (n - 1) THEN 'intermittent'
         WHEN (n * ss2 - s1 * s1) * 100 >= 49 * s1 * s1 THEN 'erratic'
         ELSE 'smooth'
       END AS demand_class
FROM a ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Zipf's law of abbreviation: ln(frequency) vs word length correlation
# ---------------------------------------------------------------------------


def q_zipf_abbreviation_corr(sf_dir):
    """Per source: the Pearson correlation between x1e3-snapped
    ln(word frequency) and word character length over the vocabulary —
    Zipf's law of abbreviation predicts it negative (frequent words are
    short), and a corpus where it is not is a tokenizer-hostile outlier.
    Per-term snapped integer logs make every moment sum fold exactly
    (HUGEINT variance numerators); the closing r is the one mirrored
    double, x1e6 snap, NULL for degenerate variance."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def grams(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("source", "text"))
        words = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        src = pa.array(
            np.repeat(b["source"].to_numpy(zero_copy_only=False), n_per)
        )
        t = pa.table({"source": src, "w": flat})
        g = t.group_by(["source", "w"]).aggregate([([], "count_all")])
        g = g.select(["source", "w", "count_all"])
        return g.rename_columns(["source", "w", "c"])

    vocab = tree_merge(
        docs.map_batches(grams, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["source", "w"], ["c"]),
        final_shards=8,
        shard_cols=["source", "w"],
    )

    def moments(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                **{c: pa.array([], pa.int64())
                   for c in ("n", "sx", "sy", "sxx", "syy", "sxy")},
            }
        )
        if b.num_rows == 0 or "source" not in b.column_names:
            return empty
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        x = _round_half_away(np.log(c) * 1e3)
        y = pc.utf8_length(b["w"]).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        t = pa.table(
            {
                "source": b["source"],
                "n": pa.array(np.ones(len(x), np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxx": pa.array(x * x),
                "syy": pa.array(y * y),
                "sxy": pa.array(x * y),
            }
        )
        return _sum_by(t, ["source"], ["n", "sx", "sy", "sxx", "syy", "sxy"])

    agg = tree_merge(
        vocab.map_batches(moments, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(
            b, ["source"], ["n", "sx", "sy", "sxx", "syy", "sxy"]
        ),
    ).to_pandas()
    cols = ["source", "n_vocab", "r_x1e6"]
    if not len(agg) or "source" not in agg.columns:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_vocab": pa.array([], pa.int64()),
                "r_x1e6": pa.array([], pa.int64()),
            }
        )
    agg = agg.sort_values("source", ignore_index=True)
    out = {c: [] for c in cols}
    for i in range(len(agg)):
        n = int(agg["n"].iloc[i])
        sx, sy = int(agg["sx"].iloc[i]), int(agg["sy"].iloc[i])
        sxx, syy = int(agg["sxx"].iloc[i]), int(agg["syy"].iloc[i])
        sxy = int(agg["sxy"].iloc[i])
        numer = n * sxy - sx * sy          # exact Python ints
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        r = (
            None
            if varx <= 0 or vary <= 0
            else float(numer)
            / (np.sqrt(float(varx)) * np.sqrt(float(vary)))
        )
        out["source"].append(agg["source"].iloc[i])
        out["n_vocab"].append(n)
        out["r_x1e6"].append(
            None if r is None else _round_half_away(r * 1e6)
        )
    return pa.table(
        {
            "source": pa.array(out["source"], pa.string()),
            "n_vocab": pa.array(out["n_vocab"], pa.int64()),
            "r_x1e6": pa.array(out["r_x1e6"], pa.int64()),
        }
    )


ZIPF_ABBREV_SQL = """
WITH w AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS w
  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
), c AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM w GROUP BY 1, 2
), xy AS (
  SELECT source,
         CAST(ROUND(LN(CAST(c AS DOUBLE)) * 1000, 0) AS BIGINT) AS x,
         CAST(LENGTH(w) AS BIGINT) AS y
  FROM c
), m AS (
  SELECT source,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx,
         CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(x * x) AS HUGEINT) AS sxx,
         CAST(SUM(y * y) AS HUGEINT) AS syy,
         CAST(SUM(x * y) AS HUGEINT) AS sxy
  FROM xy GROUP BY 1
)
SELECT source, CAST(n AS BIGINT) AS n_vocab,
       CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0
            THEN NULL
            ELSE CAST(ROUND(
              CAST(n * sxy - sx * sy AS DOUBLE)
              / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                 * SQRT(CAST(n * syy - sy * sy AS DOUBLE)))
              * 1000000, 0) AS BIGINT) END AS r_x1e6
FROM m ORDER BY 1
"""


# ---------------------------------------------------------------------------
# TwoNN intrinsic-dimension estimator per embedding label
# ---------------------------------------------------------------------------


def q_twonn_intrinsic_dim(sf_dir):
    """Per embedding label with >= 3 vectors: the TwoNN intrinsic-
    dimension estimate (Facco et al. 2017) — d_hat = 2*n / sum
    ln(r2^2/r1^2) over each point's two nearest same-label neighbors —
    the manifold-dimension probe that tells an ANN-index planner
    whether 64 ambient dims hide a 10-dim manifold. Squared distances
    are exact int64 over x1e6 codes (ip(a,a)+ip(b,b)-2ip(a,b)), points
    with r1 = 0 (exact duplicates) are excluded, and only the closing
    log-sum is a mirrored double, x1e6 snap."""
    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    )
    from mimirsbrunn_ray.stages.broadcast import ensure_cols

    all_tbl = ensure_cols(
        emb.to_pandas(), ["vec_id", "embedding", "label"]).sort_values(
        "vec_id", ignore_index=True)
    if not len(all_tbl):
        return pa.table(
            {
                "label": pa.array([], pa.int64()),
                "n_used": pa.array([], pa.int64()),
                "sum_lnmu2_x1e6": pa.array([], pa.int64()),
                "dhat_x1e6": pa.array([], pa.int64()),
            }
        )
    ids = all_tbl["vec_id"].to_numpy(dtype=np.int64)
    labels = all_tbl["label"].to_numpy(dtype=np.int64)
    mat = _round_half_away(
        np.stack(all_tbl["embedding"].to_numpy()).astype(np.float64) * 1e6
    ).astype(np.float64)
    sq = np.sum(mat * mat, axis=1)  # exact ints in float64 (< 2^53)
    import ray

    ref = ray.put((ids, labels, mat, sq))

    def two_nn(b: pa.Table) -> pa.Table:
        ids_, labels_, mat_, sq_ = ray.get(ref)
        empty = pa.table(
            {
                "label": pa.array([], pa.int64()),
                "lnmu2_x1e9": pa.array([], pa.int64()),
                "used": pa.array([], pa.int64()),
            }
        )
        b = b.filter(pc.is_valid(b["vec_id"]))
        if b.num_rows == 0:
            return empty
        col = b["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        dim = mat_.shape[1]
        q = _round_half_away(flat.reshape(len(b), dim) * 1e6).astype(
            np.float64
        )
        vid = b["vec_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        lab = b["label"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        # exact int64-valued squared distances in float64
        d2 = sq_[None, :] - 2.0 * (q @ mat_.T) + np.sum(q * q, axis=1)[:, None]
        other = labels_[None, :] != lab[:, None]
        d2 = np.where(other, np.inf, d2)
        d2[np.arange(len(q)), np.searchsorted(ids_, vid)] = np.inf
        part = np.partition(d2, 1, axis=1)[:, :2]
        r1, r2 = part[:, 0], part[:, 1]
        ok = np.isfinite(r2) & (r1 > 0)
        lnmu2 = np.where(ok, np.log(np.where(ok, r2, 1.0) / np.where(ok, r1, 1.0)), 0.0)
        return pa.table(
            {
                "label": pa.array(lab),
                "lnmu2_x1e9": pa.array(_round_half_away(lnmu2 * 1e9)),
                "used": pa.array(ok.astype(np.int64)),
            }
        )

    per = tree_merge(
        emb.map_batches(two_nn, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["label"], ["lnmu2_x1e9", "used"]),
    ).to_pandas()
    if not len(per) or "label" not in per.columns:
        return pa.table(
            {
                "label": pa.array([], pa.int64()),
                "n_used": pa.array([], pa.int64()),
                "sum_lnmu2_x1e6": pa.array([], pa.int64()),
                "dhat_x1e6": pa.array([], pa.int64()),
            }
        )
    lab_counts = all_tbl["label"].astype("int64").value_counts()
    multi = set(lab_counts[lab_counts >= 2].index.astype(int))
    per = per[per["label"].astype(int).isin(multi)]
    per = per.sort_values("label", ignore_index=True)
    out = {"label": [], "n_used": [], "sum_lnmu2_x1e6": [], "dhat_x1e6": []}
    for i in range(len(per)):
        n = int(per["used"].iloc[i])
        s_x1e9 = int(per["lnmu2_x1e9"].iloc[i])
        s = s_x1e9 / 1e9
        out["label"].append(int(per["label"].iloc[i]))
        out["n_used"].append(n)
        out["sum_lnmu2_x1e6"].append(_round_half_away(s * 1e6))
        out["dhat_x1e6"].append(
            None if s <= 0.0 or n == 0
            else _round_half_away(2.0 * n / s * 1e6)
        )
    return pa.table(
        {
            "label": pa.array(out["label"], pa.int64()),
            "n_used": pa.array(out["n_used"], pa.int64()),
            "sum_lnmu2_x1e6": pa.array(out["sum_lnmu2_x1e6"], pa.int64()),
            "dhat_x1e6": pa.array(out["dhat_x1e6"], pa.int64()),
        }
    )


TWONN_SQL = """
WITH q AS MATERIALIZED (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding,
                        x -> ROUND(CAST(x AS DOUBLE) * 1000000, 0)) AS c
  FROM embeddings WHERE vec_id IS NOT NULL
), d AS MATERIALIZED (
  SELECT a.vec_id AS va, a.label,
         CAST(list_inner_product(a.c, a.c)
              + list_inner_product(b.c, b.c)
              - 2 * list_inner_product(a.c, b.c) AS BIGINT) AS d2
  FROM q a JOIN q b
    ON a.label = b.label AND a.vec_id <> b.vec_id
), nn AS (
  SELECT va, label, d2,
         ROW_NUMBER() OVER (PARTITION BY va ORDER BY d2) AS rn
  FROM d
), two AS (
  SELECT va, label,
         MIN(CASE WHEN rn = 1 THEN d2 END) AS r1,
         MIN(CASE WHEN rn = 2 THEN d2 END) AS r2
  FROM nn WHERE rn <= 2 GROUP BY 1, 2
), pt AS (
  SELECT label,
         CASE WHEN r2 IS NOT NULL AND r1 > 0 THEN 1 ELSE 0 END AS used,
         CASE WHEN r2 IS NOT NULL AND r1 > 0
              THEN CAST(ROUND(LN(CAST(r2 AS DOUBLE) / CAST(r1 AS DOUBLE))
                   * 1000000000, 0) AS BIGINT)
              ELSE 0 END AS lnmu2_x1e9
  FROM two
), agg AS (
  SELECT label, CAST(SUM(used) AS BIGINT) AS n_used,
         CAST(SUM(lnmu2_x1e9) AS BIGINT) AS s12
  FROM pt GROUP BY 1
)
SELECT label, n_used,
       CAST(ROUND(s12 / 1000000000.0 * 1000000, 0) AS BIGINT)
         AS sum_lnmu2_x1e6,
       CASE WHEN n_used = 0 OR s12 <= 0 THEN NULL
            ELSE CAST(ROUND(2.0 * n_used / (s12 / 1000000000.0)
                 * 1000000, 0) AS BIGINT) END AS dhat_x1e6
FROM agg ORDER BY 1
"""


def register_r4eb(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "demand_classification_parts": q_demand_classification_parts,
            "zipf_abbreviation_corr": q_zipf_abbreviation_corr,
            "twonn_intrinsic_dim": q_twonn_intrinsic_dim,
        }
    )
    oracles.update(
        {
            "demand_classification_parts": DEMAND_CLASS_SQL,
            "zipf_abbreviation_corr": ZIPF_ABBREV_SQL,
            "twonn_intrinsic_dim": TWONN_SQL,
        }
    )
