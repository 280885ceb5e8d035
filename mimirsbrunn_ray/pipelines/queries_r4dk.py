"""Round-4 batch DK: embedding-space geometry diagnostics —
participation ratio (effective dimensionality), anisotropy (expected
random-pair cosine), and per-label quantiles of the cosine to the
global centroid.

All three consume the embeddings table as zero-copy Arrow list columns
flattened to (row, dim) float64 — float32 -> float64 casts are exact,
so each row's norm/contribution is an identical double on both
engines. Cross-row sums differ only in association order (~1e-16
relative, far inside the snaps); the quantile query snaps each cosine
to x1e6 int BEFORE the PERCENTILE_DISC selection so the order
statistic itself is chosen over identical integers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


def _mat(b: pa.Table, col: str = "embedding") -> np.ndarray:
    """Flatten a list<float> column to a dense (rows, dim) float64
    matrix — the list_flatten().to_numpy().reshape idiom."""
    arr = b[col].combine_chunks()
    dim = len(arr[0]) if len(arr) else 0
    flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False).astype(
        np.float64
    )
    return flat.reshape(-1, dim) if dim else flat.reshape(0, 0)


# ---------------------------------------------------------------------------
# participation ratio (effective dimensionality)
# ---------------------------------------------------------------------------


def q_embedding_participation_ratio(sf_dir):
    """One-row effective-dimensionality diagnostic: the participation
    ratio PR = (sum of per-dimension variances)² / (sum of squared
    per-dimension variances) of the embedding matrix — the axis-aligned
    spectrum summary (PR near the full dim = isotropic use of the
    space, PR << dim = the embedding collapsed onto a few coordinates;
    the cheap screen before paying for a PCA). Per-dim (sum, sum of
    squares) fold as doubles from exact float32 -> float64 casts; PR is
    one mirrored expression, x1e6 snap."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["embedding"]))
        m = _mat(b)
        if m.size == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "s1": pa.array([], pa.float64()),
                    "s2": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
                "n": pa.array(np.full(m.shape[1], m.shape[0], np.int64)),
                "s1": pa.array(m.sum(axis=0)),
                "s2": pa.array((m * m).sum(axis=0)),
            }
        )

    agg = tree_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["dim"], ["n", "s1", "s2"]),
    ).to_pandas()
    if not len(agg) or "dim" not in agg.columns or int(agg["n"].max()) < 2:
        return pa.table(
            {
                "n": pa.array([0], pa.int64()),
                "dim": pa.array([0], pa.int64()),
                "pr_x1e6": pa.array([None], pa.int64()),
            }
        )
    agg = agg.sort_values("dim", ignore_index=True)
    n = int(agg["n"].iloc[0])
    s1 = agg["s1"].to_numpy(dtype=np.float64)
    s2 = agg["s2"].to_numpy(dtype=np.float64)
    var = (s2 - s1 * s1 / n) / (n - 1)
    tot = float(np.sum(var))
    tot2 = float(np.sum(var * var))
    pr = (
        None
        if tot2 == 0.0
        else int(_round_half_away(np.array([tot * tot / tot2 * 1e6]))[0])
    )
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "dim": pa.array([len(agg)], pa.int64()),
            "pr_x1e6": pa.array([pr], pa.int64()),
        }
    )


PR_SQL = """
WITH p AS (
  SELECT vec_id, embedding,
         unnest(range(1, CAST(len(embedding) + 1 AS BIGINT))) AS dim
  FROM embeddings WHERE embedding IS NOT NULL
), f AS MATERIALIZED (
  SELECT vec_id, dim,
         CAST(embedding[CAST(dim AS INT)] AS DOUBLE) AS v
  FROM p
), pd AS MATERIALIZED (
  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS s1,
         SUM(v * v) AS s2
  FROM f GROUP BY 1
), var AS (
  SELECT dim, (s2 - s1 * s1 / n) / (n - 1) AS var, n FROM pd WHERE n >= 2
), a AS (
  SELECT MAX(n) AS n, CAST(COUNT(*) AS BIGINT) AS dim,
         SUM(var) AS tot, SUM(var * var) AS tot2
  FROM var
)
SELECT CAST(COALESCE(n, 0) AS BIGINT) AS n, COALESCE(dim, 0) AS dim,
       CASE WHEN tot2 = 0 OR tot2 IS NULL THEN NULL
            ELSE CAST(ROUND(tot * tot / tot2 * 1000000, 0) AS BIGINT) END
         AS pr_x1e6
FROM a
"""


# ---------------------------------------------------------------------------
# anisotropy: expected cosine between random vector pairs
# ---------------------------------------------------------------------------


def q_embedding_anisotropy(sf_dir):
    """One-row anisotropy diagnostic: the MEAN PAIRWISE COSINE over all
    vector pairs, computed without any pair enumeration via the
    identity mean = (||sum of unit vectors||² - n) / (n (n - 1)) — the
    Ethayarajh-style cone test (mean cosine near 0 = directions spread;
    large = embeddings crowd a narrow cone and cosine similarities are
    inflated corpus-wide). Each row's unit vector divides identical
    doubles; the per-dim sums fold once; one mirrored final expression,
    x1e6 snap."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["embedding"]))
        m = _mat(b)
        if m.size == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "su": pa.array([], pa.float64()),
                }
            )
        norms = np.sqrt((m * m).sum(axis=1))
        keep = norms > 0.0
        u = m[keep] / norms[keep][:, None]
        return pa.table(
            {
                "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
                "n": pa.array(
                    np.full(m.shape[1], int(keep.sum()), np.int64)
                ),
                "su": pa.array(u.sum(axis=0)),
            }
        )

    agg = tree_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["dim"], ["n", "su"]),
    ).to_pandas()
    if not len(agg) or "dim" not in agg.columns or int(agg["n"].max()) < 2:
        return pa.table(
            {
                "n": pa.array([0], pa.int64()),
                "mean_cos_x1e6": pa.array([None], pa.int64()),
            }
        )
    n = int(agg["n"].iloc[0])
    su = agg["su"].to_numpy(dtype=np.float64)
    norm2 = float(np.sum(su * su))
    mean_cos = (norm2 - n) / (float(n) * (n - 1))
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "mean_cos_x1e6": pa.array(
                [int(_round_half_away(np.array([mean_cos * 1e6]))[0])],
                pa.int64(),
            ),
        }
    )


ANISOTROPY_SQL = """
WITH p AS (
  SELECT vec_id, embedding,
         unnest(range(1, CAST(len(embedding) + 1 AS BIGINT))) AS dim
  FROM embeddings WHERE embedding IS NOT NULL
), f AS MATERIALIZED (
  SELECT vec_id, dim,
         CAST(embedding[CAST(dim AS INT)] AS DOUBLE) AS v
  FROM p
), nrm AS MATERIALIZED (
  SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM f GROUP BY 1
), u AS MATERIALIZED (
  SELECT f.vec_id, f.dim, f.v / nrm.nrm AS u
  FROM f JOIN nrm ON nrm.vec_id = f.vec_id
  WHERE nrm.nrm > 0
), su AS MATERIALIZED (
  SELECT dim, SUM(u) AS su FROM u GROUP BY 1
), cnt AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nrm WHERE nrm > 0
)
SELECT cnt.n,
       CASE WHEN cnt.n < 2 THEN NULL
            ELSE CAST(ROUND(
              ((SELECT SUM(su * su) FROM su) - cnt.n)
              / (CAST(cnt.n AS DOUBLE) * (cnt.n - 1)) * 1000000, 0)
              AS BIGINT) END AS mean_cos_x1e6
FROM cnt
"""


# ---------------------------------------------------------------------------
# per-label quantiles of cosine to the global centroid
# ---------------------------------------------------------------------------


def q_centroid_cosine_quantiles(sf_dir):
    """Per label: the p10 / p50 / p90 of each vector's cosine to the
    GLOBAL embedding centroid — the compactness profile that flags
    labels living far from the corpus center (candidate distribution
    shift) or labels tighter than the rest (near-duplicate clusters).
    The centroid folds once per dim; every cosine then SNAPS to an
    x1e6 int64 BEFORE the PERCENTILE_DISC selection, so the order
    statistics are chosen over identical integers on both engines."""
    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )

    def cpartial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["embedding"]))
        m = _mat(b)
        if m.size == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "s": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
                "s": pa.array(m.sum(axis=0)),
            }
        )

    cent = tree_merge(
        ds.map_batches(cpartial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["dim"], ["s"]),
    ).to_pandas()
    if not len(cent) or "dim" not in cent.columns:
        return pa.table(
            {
                "label": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "p10_x1e6": pa.array([], pa.int64()),
                "p50_x1e6": pa.array([], pa.int64()),
                "p90_x1e6": pa.array([], pa.int64()),
            }
        )
    c = cent.sort_values("dim")["s"].to_numpy(dtype=np.float64)
    import ray as _ray

    c_ref = _ray.put(c)

    def snap_cos(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["embedding"]), pc.is_valid(b["label"]))
        )
        m = _mat(b)
        if m.size == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "cos_x1e6": pa.array([], pa.int64()),
                }
            )
        cv = _ray.get(c_ref)
        cn = np.sqrt(float(np.sum(cv * cv)))
        dots = m @ cv
        norms = np.sqrt((m * m).sum(axis=1))
        ok = (norms > 0.0) & (cn > 0.0)
        cosv = np.where(ok, dots / (norms * cn), np.nan)
        keep = ~np.isnan(cosv)
        return pa.table(
            {
                "label": b["label"].cast(pa.int64()).to_numpy()[keep],
                "cos_x1e6": pa.array(_round_half_away(cosv[keep] * 1e6)),
            }
        )

    snapped = ds.map_batches(snap_cos, batch_format="pyarrow", batch_size=None)

    def hist_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "label": b["label"],
                "x": b["cos_x1e6"],
                "c": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        return _sum_by(t, ["label", "x"], ["c"])

    hist = tree_merge(
        snapped.map_batches(hist_partial, batch_format="pyarrow",
                            batch_size=None),
        lambda b: _sum_by(b, ["label", "x"], ["c"]),
    ).to_pandas()
    if not len(hist) or "label" not in hist.columns:
        return pa.table(
            {
                "label": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "p10_x1e6": pa.array([], pa.int64()),
                "p50_x1e6": pa.array([], pa.int64()),
                "p90_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"label": [], "n": [], "p10_x1e6": [], "p50_x1e6": [], "p90_x1e6": []}
    for lab, g in hist.sort_values(["label", "x"]).groupby("label", sort=True):
        xs = g["x"].to_numpy(dtype=np.int64)
        cs = g["c"].to_numpy(dtype=np.int64)
        n = int(cs.sum())
        cum = np.cumsum(cs)

        def disc(num, den):
            return int(xs[int(np.argmax(den * cum >= num * n))])

        out["label"].append(int(lab))
        out["n"].append(n)
        out["p10_x1e6"].append(disc(1, 10))
        out["p50_x1e6"].append(disc(1, 2))
        out["p90_x1e6"].append(disc(9, 10))
    return pa.table(
        {
            "label": pa.array(out["label"], pa.int64()),
            "n": pa.array(out["n"], pa.int64()),
            "p10_x1e6": pa.array(out["p10_x1e6"], pa.int64()),
            "p50_x1e6": pa.array(out["p50_x1e6"], pa.int64()),
            "p90_x1e6": pa.array(out["p90_x1e6"], pa.int64()),
        }
    )


CENTROID_COS_SQL = """
WITH p AS (
  SELECT vec_id, label, embedding,
         unnest(range(1, CAST(len(embedding) + 1 AS BIGINT))) AS dim
  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL
), f AS MATERIALIZED (
  SELECT vec_id, label, dim,
         CAST(embedding[CAST(dim AS INT)] AS DOUBLE) AS v
  FROM p
), cent AS MATERIALIZED (
  SELECT dim, SUM(v) AS c FROM f GROUP BY 1
), cn AS MATERIALIZED (
  SELECT SQRT(SUM(c * c)) AS cn FROM cent
), per AS MATERIALIZED (
  SELECT f.vec_id, ANY_VALUE(f.label) AS label,
         SUM(f.v * cent.c) AS dot,
         SQRT(SUM(f.v * f.v)) AS nrm
  FROM f JOIN cent ON cent.dim = f.dim
  GROUP BY 1
), snapped AS MATERIALIZED (
  SELECT label,
         CAST(ROUND(dot / (nrm * cn.cn) * 1000000, 0) AS BIGINT)
           AS cos_x1e6
  FROM per, cn
  WHERE nrm > 0 AND cn.cn > 0
)
SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(PERCENTILE_DISC(0.1) WITHIN GROUP (ORDER BY cos_x1e6)
            AS BIGINT) AS p10_x1e6,
       CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY cos_x1e6)
            AS BIGINT) AS p50_x1e6,
       CAST(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY cos_x1e6)
            AS BIGINT) AS p90_x1e6
FROM snapped GROUP BY 1 ORDER BY 1
"""


def register_r4dk(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "embedding_participation_ratio": q_embedding_participation_ratio,
            "embedding_anisotropy": q_embedding_anisotropy,
            "centroid_cosine_quantiles": q_centroid_cosine_quantiles,
        }
    )
    oracles.update(
        {
            "embedding_participation_ratio": PR_SQL,
            "embedding_anisotropy": ANISOTROPY_SQL,
            "centroid_cosine_quantiles": CENTROID_COS_SQL,
        }
    )
