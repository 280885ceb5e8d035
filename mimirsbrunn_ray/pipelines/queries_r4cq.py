"""Round-4 batch CQ: source-pair unigram cosine similarity, Gumbel
(extreme-value) method-of-moments fit of daily maxima, and the partial
correlation of quantity and price controlling for discount.

Exactness discipline: word counts / daily maxima / cross-products fold
as exact int64 (or mirrored per-term doubles where squares exceed
int64); final cosines / fits / correlations are single mirrored double
expressions, x1e6 snap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000


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
# cosine similarity between source unigram count profiles
# ---------------------------------------------------------------------------


def q_source_unigram_cosine(sf_dir):
    """For every source pair (s1 < s2): the cosine similarity between
    their word-count profiles — the sparse-vector corpus-similarity
    matrix behind source-level dedup triage (near-1 cosine = one source
    is a re-crawl/mirror of the other). Word counts fold exact int64
    via one combiner-first pass over whitespace tokens; norms and dot
    products are per-term double folds over the bounded (sources x
    vocab) table with the shared-word inner join mirrored in SQL, x1e6
    snap."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("source", "text"))
        words = pc.split_pattern(b["text"], pattern=" ")
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        src = pa.chunked_array(
            [
                pa.array(
                    np.repeat(b["source"].to_numpy(zero_copy_only=False), lens)
                )
            ]
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

    prof = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["source", "w"], ["c"]),
    ).to_pandas()  # bounded: sources x vocab

    if not len(prof) or "source" not in prof.columns:
        return pa.table(
            {
                "s1": pa.array([], pa.string()),
                "s2": pa.array([], pa.string()),
                "cos_x1e6": pa.array([], pa.int64()),
            }
        )
    sources = sorted(prof["source"].unique())
    vecs = {
        s: dict(zip(g["w"], g["c"].astype(np.int64)))
        for s, g in prof.groupby("source")
    }
    norms = {
        s: float(
            np.sqrt(
                float(np.sum(np.array(list(v.values()), dtype=np.float64) ** 2))
            )
        )
        for s, v in vecs.items()
    }
    out = {"s1": [], "s2": [], "cos_x1e6": []}
    for i in range(len(sources)):
        for j in range(i + 1, len(sources)):
            a, b_ = sources[i], sources[j]
            va, vb = vecs[a], vecs[b_]
            if len(vb) < len(va):
                small, big = vb, va
            else:
                small, big = va, vb
            dot = 0.0
            for w in sorted(small):
                if w in big:
                    dot += float(small[w]) * big[w]
            den = norms[a] * norms[b_]
            out["s1"].append(a)
            out["s2"].append(b_)
            out["cos_x1e6"].append(
                None
                if den == 0.0
                else int(_round_half_away(np.array([dot / den * 1e6]))[0])
            )
    return pa.table(
        {
            "s1": pa.array(out["s1"], pa.string()),
            "s2": pa.array(out["s2"], pa.string()),
            "cos_x1e6": pa.array(out["cos_x1e6"], pa.int64()),
        }
    )


SOURCE_COSINE_SQL = """
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), c AS MATERIALIZED (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1, 2
), nrm AS MATERIALIZED (
  SELECT source, SQRT(SUM(CAST(c AS DOUBLE) * CAST(c AS DOUBLE))) AS nrm
  FROM c GROUP BY 1
), dots AS (
  SELECT a.source AS s1, b.source AS s2,
         SUM(CAST(a.c AS DOUBLE) * b.c) AS dot
  FROM c a JOIN c b ON b.w = a.w AND a.source < b.source
  GROUP BY 1, 2
), pairs AS (
  SELECT na.source AS s1, nb.source AS s2, na.nrm * nb.nrm AS den
  FROM nrm na JOIN nrm nb ON na.source < nb.source
)
SELECT p.s1, p.s2,
       CASE WHEN p.den = 0 THEN NULL
            ELSE CAST(ROUND(COALESCE(d.dot, 0) / p.den * 1000000, 0)
                 AS BIGINT) END AS cos_x1e6
FROM pairs p
LEFT JOIN dots d ON d.s1 = p.s1 AND d.s2 = p.s2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Gumbel method-of-moments fit of daily maximum value per type
# ---------------------------------------------------------------------------

_EULER_GAMMA = 0.5772156649015329


def q_gumbel_fit_daily_max(sf_dir):
    """Per event type: method-of-moments Gumbel fit of the DAILY MAXIMUM
    x100 value — extreme-value theory's block-maxima model (scale beta =
    sqrt(6 * var) / pi, location mu = mean - gamma * beta) used to set
    alert thresholds with a principled return period. Daily maxima fold
    exact int64 (max combiner over (type, day) cells); their (n, s1,
    s2) moments fold exactly too because maxima ARE x100 integers; beta
    and mu are mirrored doubles per type, x1e6 snap, NULL below 2
    days."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        d = (us // _DAY_US).astype(np.int64)
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "d": pa.array(d),
                "mx": pa.array(x),
            }
        )
        g = t.group_by(["event_type", "d"]).aggregate([("mx", "max")])
        return g.select(["event_type", "d", "mx_max"]).rename_columns(
            ["event_type", "d", "mx"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "d"]).aggregate([("mx", "max")])
        return g.select(["event_type", "d", "mx_max"]).rename_columns(
            ["event_type", "d", "mx"]
        )

    daily = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: types x days

    if not len(daily) or "event_type" not in daily.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_days": pa.array([], pa.int64()),
                "beta_x1e6": pa.array([], pa.int64()),
                "mu_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "n_days": [], "beta_x1e6": [], "mu_x1e6": []}
    for et, g in daily.sort_values(["event_type", "d"]).groupby(
        "event_type", sort=True
    ):
        mx = g["mx"].to_numpy(dtype=np.int64)
        n = len(mx)
        out["event_type"].append(et)
        out["n_days"].append(n)
        if n < 2:
            out["beta_x1e6"].append(None)
            out["mu_x1e6"].append(None)
            continue
        s1 = int(mx.sum())
        s2 = int((mx * mx).sum())
        mean = float(s1) / n
        var = (float(s2) - float(s1) * s1 / n) / (n - 1)
        beta = np.sqrt(6.0 * var) / np.pi
        mu = mean - _EULER_GAMMA * beta
        out["beta_x1e6"].append(
            int(_round_half_away(np.array([beta * 1e6]))[0])
        )
        out["mu_x1e6"].append(int(_round_half_away(np.array([mu * 1e6]))[0]))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_days": pa.array(out["n_days"], pa.int64()),
            "beta_x1e6": pa.array(out["beta_x1e6"], pa.int64()),
            "mu_x1e6": pa.array(out["mu_x1e6"], pa.int64()),
        }
    )


GUMBEL_SQL = f"""
WITH dm AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 86400000000) AS BIGINT) AS d,
         CAST(MAX(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS mx
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), a AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(mx) AS BIGINT) AS s1,
         CAST(SUM(mx * mx) AS BIGINT) AS s2
  FROM dm GROUP BY 1
)
SELECT event_type, n AS n_days,
       CASE WHEN n < 2 THEN NULL
            ELSE CAST(ROUND(
              SQRT(6.0 * ((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)))
              / PI() * 1000000, 0) AS BIGINT) END AS beta_x1e6,
       CASE WHEN n < 2 THEN NULL
            ELSE CAST(ROUND(
              (CAST(s1 AS DOUBLE) / n
               - {_EULER_GAMMA!r}
                 * (SQRT(6.0 * ((s2 - CAST(s1 AS DOUBLE) * s1 / n)
                                / (n - 1))) / PI()))
              * 1000000, 0) AS BIGINT) END AS mu_x1e6
FROM a ORDER BY 1
"""


# ---------------------------------------------------------------------------
# partial correlation: quantity vs extended price, controlling discount
# ---------------------------------------------------------------------------


def q_partial_corr_qty_price(sf_dir):
    """One-row multivariate statistic over lineitem: the PARTIAL Pearson
    correlation between quantity and extended price CONTROLLING for
    discount — r_xy.z = (r_xy - r_xz * r_yz) / sqrt((1 - r_xz²)(1 -
    r_yz²)), the screen that separates a direct qty-price relationship
    from one induced by the shared discount driver. Sufficient
    cross-products fold in one combiner-first pass (integer-grain qty /
    cents price / x100 discount; squares and cross-terms that could
    exceed int64 fold as mirrored per-term doubles); the three pairwise
    correlations and the partial are mirrored doubles, x1e6 snap."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("l_quantity", "l_extendedprice", "l_discount"))
        x = _round_half_away_x(
            b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64),
            1.0,
        )
        y = _round_half_away_x(
            b["l_extendedprice"]
            .to_numpy(zero_copy_only=False)
            .astype(np.float64),
            100.0,
        )
        z = _round_half_away_x(
            b["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64),
            100.0,
        )
        xf, yf, zf = (
            x.astype(np.float64),
            y.astype(np.float64),
            z.astype(np.float64),
        )
        t = pa.table(
            {
                "k": pa.array(np.zeros(len(x), np.int64)),
                "n": pa.array(np.ones(len(x), np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sz": pa.array(z),
                "sxx": pa.array(x * x),
                "szz": pa.array(z * z),
                "sxy": pa.array(xf * yf),
                "sxz": pa.array(x * z),
                "syz": pa.array(yf * zf),
                "syy": pa.array(yf * yf),
            }
        )
        return _sum_by(
            t,
            ["k"],
            ["n", "sx", "sy", "sz", "sxx", "szz", "sxy", "sxz", "syz", "syy"],
        )

    a = tree_merge(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(
            b,
            ["k"],
            ["n", "sx", "sy", "sz", "sxx", "szz", "sxy", "sxz", "syz", "syy"],
        ),
    ).to_pandas()

    if not len(a) or "n" not in a.columns or int(a["n"].iloc[0]) < 3:
        return pa.table(
            {
                "n": pa.array([0], pa.int64()),
                "r_xy_x1e6": pa.array([None], pa.int64()),
                "r_partial_x1e6": pa.array([None], pa.int64()),
            }
        )
    n = float(a["n"].iloc[0])
    sx, sy, sz = float(a["sx"].iloc[0]), float(a["sy"].iloc[0]), float(a["sz"].iloc[0])
    sxx, syy, szz = (
        float(a["sxx"].iloc[0]),
        float(a["syy"].iloc[0]),
        float(a["szz"].iloc[0]),
    )
    sxy, sxz, syz = (
        float(a["sxy"].iloc[0]),
        float(a["sxz"].iloc[0]),
        float(a["syz"].iloc[0]),
    )

    def corr(spq, sp, sq, spp, sqq):
        num = spq - sp * sq / n
        den = np.sqrt((spp - sp * sp / n) * (sqq - sq * sq / n))
        return None if den == 0.0 else num / den

    rxy = corr(sxy, sx, sy, sxx, syy)
    rxz = corr(sxz, sx, sz, sxx, szz)
    ryz = corr(syz, sy, sz, syy, szz)
    if rxy is None or rxz is None or ryz is None:
        rp = None
    else:
        d = np.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
        rp = None if d == 0.0 else (rxy - rxz * ryz) / d
    return pa.table(
        {
            "n": pa.array([int(a["n"].iloc[0])], pa.int64()),
            "r_xy_x1e6": pa.array(
                [
                    None
                    if rxy is None
                    else int(_round_half_away(np.array([rxy * 1e6]))[0])
                ],
                pa.int64(),
            ),
            "r_partial_x1e6": pa.array(
                [
                    None
                    if rp is None
                    else int(_round_half_away(np.array([rp * 1e6]))[0])
                ],
                pa.int64(),
            ),
        }
    )


PARTIAL_CORR_SQL = """
WITH v AS (
  SELECT CAST(ROUND(l_quantity, 0) AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS y,
         CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS z
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_discount IS NOT NULL
), a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(z) AS BIGINT) AS sz,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(z * z) AS BIGINT) AS szz,
         SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS sxy,
         CAST(SUM(x * z) AS BIGINT) AS sxz,
         SUM(CAST(y AS DOUBLE) * CAST(z AS DOUBLE)) AS syz,
         SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS syy
  FROM v
), r AS (
  SELECT n,
         (sxy - CAST(sx AS DOUBLE) * sy / n)
           / SQRT((sxx - CAST(sx AS DOUBLE) * sx / n)
                  * (syy - CAST(sy AS DOUBLE) * sy / n)) AS rxy,
         (sxz - CAST(sx AS DOUBLE) * sz / n)
           / SQRT((sxx - CAST(sx AS DOUBLE) * sx / n)
                  * (szz - CAST(sz AS DOUBLE) * sz / n)) AS rxz,
         (syz - CAST(sy AS DOUBLE) * sz / n)
           / SQRT((syy - CAST(sy AS DOUBLE) * sy / n)
                  * (szz - CAST(sz AS DOUBLE) * sz / n)) AS ryz
  FROM a WHERE n >= 3
)
SELECT n,
       CAST(ROUND(rxy * 1000000, 0) AS BIGINT) AS r_xy_x1e6,
       CASE WHEN SQRT((1.0 - rxz * rxz) * (1.0 - ryz * ryz)) = 0 THEN NULL
            ELSE CAST(ROUND((rxy - rxz * ryz)
                   / SQRT((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
                 * 1000000, 0) AS BIGINT) END AS r_partial_x1e6
FROM r
"""


def register_r4cq(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "source_unigram_cosine": q_source_unigram_cosine,
            "gumbel_fit_daily_max": q_gumbel_fit_daily_max,
            "partial_corr_qty_price": q_partial_corr_qty_price,
        }
    )
    oracles.update(
        {
            "source_unigram_cosine": SOURCE_COSINE_SQL,
            "gumbel_fit_daily_max": GUMBEL_SQL,
            "partial_corr_qty_price": PARTIAL_CORR_SQL,
        }
    )
