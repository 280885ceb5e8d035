"""Round-4 batch DD: vocabulary-richness and linguistics-law operators —
rarefaction (expected vocabulary at a fixed token budget), Yule's K
characteristic, and the Menzerath-Altmann doc-length vs word-length
regression.

Exactness discipline: the frequency spectrum folds exact int64; Yule's
K is INTEGER-exact end-to-end except one final division; rarefaction
evaluates the hypergeometric inclusion probability via lgamma on both
engines (term-level ulp differences are ~1e-10 relative, far inside
the x1e6 snap); the Menzerath slope folds per-doc ratios of exact
integers through mirrored double sums.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_RAREFY_M = 500  # token budget for the rarefaction curve point


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


def _word_counts_per_source(sf_dir) -> pd.DataFrame:
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


# ---------------------------------------------------------------------------
# rarefaction: expected distinct vocabulary in an m-token sample
# ---------------------------------------------------------------------------


def q_rarefaction_expected_vocab(sf_dir):
    """Per source: the rarefaction point E[S_m] — the EXPECTED number of
    distinct words in a uniform random m-token subsample (m = 500) —
    E[S_m] = sum_w (1 - C(n - c_w, m) / C(n, m)), ecology's
    sample-size-fair richness comparison (raw distinct counts are
    incomparable across sources of different size; rarefied ones are).
    Word counts fold exact int64; the hypergeometric term evaluates via
    lgamma on BOTH engines (mirrored expression; lgamma ulp noise is
    ~1e-10 relative, far inside the snap); sources with n < m emit
    NULL. x1e6 snap."""
    wsc = _word_counts_per_source(sf_dir)
    if not len(wsc) or "source" not in wsc.columns:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
                "es_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"source": [], "n_tokens": [], "es_x1e6": []}
    m = _RAREFY_M
    for src, g in wsc.sort_values(["source", "w"]).groupby("source", sort=True):
        c = g["c"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        out["source"].append(src)
        out["n_tokens"].append(n)
        if n < m:
            out["es_x1e6"].append(None)
            continue
        es = 0.0
        for cw in c:
            cw = int(cw)
            if n - cw < m:
                es += 1.0  # the word is guaranteed present
                continue
            lr = (
                math.lgamma(n - cw + 1)
                - math.lgamma(n - cw - m + 1)
                + math.lgamma(n - m + 1)
                - math.lgamma(n + 1)
            )
            es += 1.0 - math.exp(lr)
        out["es_x1e6"].append(int(_round_half_away(np.array([es * 1e6]))[0]))
    return pa.table(
        {
            "source": pa.array(out["source"], pa.string()),
            "n_tokens": pa.array(out["n_tokens"], pa.int64()),
            "es_x1e6": pa.array(out["es_x1e6"], pa.int64()),
        }
    )


RAREFACTION_SQL = f"""
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), c AS MATERIALIZED (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1, 2
), n AS MATERIALIZED (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1
), es AS (
  SELECT c.source,
         SUM(CASE WHEN n.n - c.c < {_RAREFY_M} THEN 1.0
                  ELSE 1.0 - EXP(
                    LGAMMA(CAST(n.n - c.c + 1 AS DOUBLE))
                    - LGAMMA(CAST(n.n - c.c - {_RAREFY_M} + 1 AS DOUBLE))
                    + LGAMMA(CAST(n.n - {_RAREFY_M} + 1 AS DOUBLE))
                    - LGAMMA(CAST(n.n + 1 AS DOUBLE)))
             END) AS es
  FROM c JOIN n ON n.source = c.source
  GROUP BY 1
)
SELECT n.source, n.n AS n_tokens,
       CASE WHEN n.n < {_RAREFY_M} THEN NULL
            ELSE CAST(ROUND(es.es * 1000000, 0) AS BIGINT) END AS es_x1e6
FROM n JOIN es ON es.source = n.source
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Yule's K characteristic per source
# ---------------------------------------------------------------------------


def q_yule_k_per_source(sf_dir):
    """Per source: Yule's K characteristic K = 10^4 * (sum_w c_w² - N) /
    N² — the repeat-rate vocabulary-richness constant that, unlike raw
    TTR, is (asymptotically) sample-size invariant; high K = repetitive
    templated text. INTEGER-exact end-to-end: word counts, sum of
    squares and N fold as int64 and only the single final division is a
    mirrored double, x1e6 snap."""
    wsc = _word_counts_per_source(sf_dir)
    if not len(wsc) or "source" not in wsc.columns:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
                "k_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"source": [], "n_tokens": [], "k_x1e6": []}
    for src, g in wsc.sort_values(["source", "w"]).groupby("source", sort=True):
        c = g["c"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        s2 = int((c * c).sum())
        out["source"].append(src)
        out["n_tokens"].append(n)
        out["k_x1e6"].append(
            None
            if n == 0
            else int(
                _round_half_away(
                    np.array(
                        [10000.0 * (s2 - n) / (float(n) * n) * 1e6]
                    )
                )[0]
            )
        )
    return pa.table(
        {
            "source": pa.array(out["source"], pa.string()),
            "n_tokens": pa.array(out["n_tokens"], pa.int64()),
            "k_x1e6": pa.array(out["k_x1e6"], pa.int64()),
        }
    )


YULE_K_SQL = """
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), c AS MATERIALIZED (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1, 2
), a AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM c GROUP BY 1
)
SELECT source, n AS n_tokens,
       CASE WHEN n = 0 THEN NULL
            ELSE CAST(ROUND(10000.0 * (s2 - n) / (CAST(n AS DOUBLE) * n)
                 * 1000000, 0) AS BIGINT) END AS k_x1e6
FROM a ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Menzerath-Altmann: mean word length vs document length regression
# ---------------------------------------------------------------------------


def q_menzerath_doclen_wordlen(sf_dir):
    """One-row linguistics-law check: the least-squares slope (and
    Pearson r) of mean word length (chars/word) on log document length
    (ln words) across documents — Menzerath-Altmann predicts a NEGATIVE
    slope ("the longer the construct, the shorter its parts"); a flat
    or positive slope flags synthetic/templated text. Per-doc (words,
    chars) are exact integers so each doc contributes identical doubles
    on both sides; the regression folds mirrored double sums, x1e6
    snap."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        words = pc.split_pattern(b["text"], pattern=" ")
        nw = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        total_chars = pc.utf8_length(b["text"]).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        # chars in words = total - (nw - 1) separators, for nw >= 1
        keep = nw >= 1
        nw = nw[keep]
        wc = total_chars[keep] - (nw - 1)
        x = np.log(nw.astype(np.float64))
        y = wc.astype(np.float64) / nw
        t = pa.table(
            {
                "k": pa.array(np.zeros(len(nw), np.int64)),
                "n": pa.array(np.ones(len(nw), np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxx": pa.array(x * x),
                "sxy": pa.array(x * y),
                "syy": pa.array(y * y),
            }
        )
        return _sum_by(t, ["k"], ["n", "sx", "sy", "sxx", "sxy", "syy"])

    a = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["k"], ["n", "sx", "sy", "sxx", "sxy", "syy"]),
    ).to_pandas()

    if not len(a) or "n" not in a.columns or int(a["n"].iloc[0]) < 3:
        return pa.table(
            {
                "n_docs": pa.array([0], pa.int64()),
                "slope_x1e6": pa.array([None], pa.int64()),
                "r_x1e6": pa.array([None], pa.int64()),
            }
        )
    n = int(a["n"].iloc[0])
    sx, sy = float(a["sx"].iloc[0]), float(a["sy"].iloc[0])
    sxx, sxy, syy = (
        float(a["sxx"].iloc[0]),
        float(a["sxy"].iloc[0]),
        float(a["syy"].iloc[0]),
    )
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    cov = sxy - sx * sy / n
    slope = (
        None
        if vx == 0.0
        else int(_round_half_away(np.array([cov / vx * 1e6]))[0])
    )
    r = (
        None
        if vx == 0.0 or vy == 0.0
        else int(
            _round_half_away(np.array([cov / np.sqrt(vx * vy) * 1e6]))[0]
        )
    )
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "slope_x1e6": pa.array([slope], pa.int64()),
            "r_x1e6": pa.array([r], pa.int64()),
        }
    )


MENZERATH_SQL = """
WITH d AS (
  SELECT LN(CAST(length(string_split(text, ' ')) AS DOUBLE)) AS x,
         CAST(length(text) - (length(string_split(text, ' ')) - 1)
              AS DOUBLE) / length(string_split(text, ' ')) AS y
  FROM documents
  WHERE text IS NOT NULL AND length(string_split(text, ' ')) >= 1
), a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx,
         SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM d
)
SELECT n AS n_docs,
       CASE WHEN n < 3 OR sxx - sx * sx / n = 0 THEN NULL
            ELSE CAST(ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n)
                 * 1000000, 0) AS BIGINT) END AS slope_x1e6,
       CASE WHEN n < 3 OR sxx - sx * sx / n = 0
              OR syy - sy * sy / n = 0 THEN NULL
            ELSE CAST(ROUND((sxy - sx * sy / n)
                   / SQRT((sxx - sx * sx / n) * (syy - sy * sy / n))
                 * 1000000, 0) AS BIGINT) END AS r_x1e6
FROM a
"""


def register_r4dd(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "rarefaction_expected_vocab": q_rarefaction_expected_vocab,
            "yule_k_per_source": q_yule_k_per_source,
            "menzerath_doclen_wordlen": q_menzerath_doclen_wordlen,
        }
    )
    oracles.update(
        {
            "rarefaction_expected_vocab": RAREFACTION_SQL,
            "yule_k_per_source": YULE_K_SQL,
            "menzerath_doclen_wordlen": MENZERATH_SQL,
        }
    )
