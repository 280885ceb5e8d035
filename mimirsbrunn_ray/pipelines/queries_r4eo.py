"""Round-4 batch EO: RAKE keyword extraction (degree/frequency scores
over stopword-delimited phrases), the Renyi entropy spectrum (orders
0, 2, infinity) per source, and a discrete Bass diffusion-model fit
of user adoption.

Exactness discipline: RAKE degree and frequency are exact integer
folds over (source, word) — phrase segmentation is a vectorized
stopword-boundary cumsum, never a per-token Python loop — and the
deg/freq score is one double division of identical ints on both
sides (ties broken by word); Renyi entropies reduce to logs of four
exact integers (V, T, sum c^2, c_max) under the registry's accepted
ln discipline; the Bass fit folds nine exact integer moments (N^4
sums in int128) through the mirrored 3x3 Cramer expansion."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000

# fixed literal stopword list (the engine's public "en" function words)
_RAKE_STOP = sorted(
    {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that"}
)
_RAKE_STOP_SQL = ", ".join(f"'{w}'" for w in _RAKE_STOP)
_RAKE_TOP = 10


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# RAKE keywords
# ---------------------------------------------------------------------------


def q_rake_keywords_top(sf_dir):
    """Per source: the top-10 RAKE keywords — split each document
    into phrases at stopword boundaries, score every word by
    degree/frequency where degree sums the lengths of the phrases
    each occurrence sits in (RAKE, Rose et al. 2010). Phrase ids come
    from a vectorized per-doc stopword cumsum, phrase lengths from
    one np.unique, so the per-batch pass is loop-free; (source, word)
    (degree, freq) partials are exact ints tree-merged before a
    bounded per-source top-k. Ranking is by the identical deg/freq
    double on both sides, ties by word."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    stop = set(_RAKE_STOP)

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("source", "text"))
        words = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        src = np.repeat(b["source"].to_numpy(zero_copy_only=False), n_per)
        doc_ix = np.repeat(np.arange(len(n_per)), n_per)
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        keep = flat != ""
        src, doc_ix, flat = src[keep], doc_ix[keep], flat[keep]
        if len(flat) == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "word": pa.array([], pa.string()),
                    "deg": pa.array([], pa.int64()),
                    "freq": pa.array([], pa.int64()),
                }
            )
        is_stop = np.isin(flat, list(stop))
        # per-doc running stopword count = phrase id for non-stop tokens
        cum = np.cumsum(is_stop.astype(np.int64))
        # reset at doc starts: subtract the cumsum value at doc start
        first = np.concatenate(
            ([True], doc_ix[1:] != doc_ix[:-1])
        )
        start_cum = np.where(first, cum - is_stop.astype(np.int64), 0)
        base = np.maximum.accumulate(
            np.where(first, start_cum, 0)
            + np.where(first, doc_ix * 0, 0)
        )
        # base holds, per position, the cum value just before its doc
        phrase = cum - is_stop.astype(np.int64) - base
        tok = ~is_stop
        if not np.any(tok):
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "word": pa.array([], pa.string()),
                    "deg": pa.array([], pa.int64()),
                    "freq": pa.array([], pa.int64()),
                }
            )
        d_i, p_i, w_i, s_i = (
            doc_ix[tok],
            phrase[tok],
            flat[tok],
            src[tok],
        )
        key = d_i.astype(np.int64) * 1_000_000 + p_i
        _, inv, cnt = np.unique(
            key, return_inverse=True, return_counts=True
        )
        deg_occ = cnt[inv].astype(np.int64)
        t = pa.table(
            {
                "source": pa.array(s_i),
                "word": pa.array(w_i),
                "deg": pa.array(deg_occ),
                "freq": pa.array(np.ones(len(w_i), np.int64)),
            }
        )
        g = t.group_by(["source", "word"]).aggregate(
            [("deg", "sum"), ("freq", "sum")]
        )
        return g.rename_columns(["source", "word", "deg", "freq"])

    counts = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["source", "word"])
        .aggregate([("deg", "sum"), ("freq", "sum")])
        .rename_columns(["source", "word", "deg", "freq"]),
        final_shards=4,
        shard_cols=["source"],
    )

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "source": pd.Series([], dtype=object),
                "word": pd.Series([], dtype=object),
                "deg": pd.Series([], dtype=np.int64),
                "freq": pd.Series([], dtype=np.int64),
                "score_x1e6": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.groupby(["source", "word"], as_index=False)[
            ["deg", "freq"]
        ].sum()
        g["score"] = g["deg"].astype(np.float64) / g["freq"].astype(
            np.float64
        )
        g = g.sort_values(
            ["source", "score", "word"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        g = g.groupby("source", as_index=False).head(_RAKE_TOP)
        g["score_x1e6"] = np.array(
            [_round_half_away(s * 1e6) for s in g["score"]],
            dtype=np.int64,
        )
        out = g[["source", "word", "deg", "freq", "score_x1e6"]].copy()
        for c in ("deg", "freq", "score_x1e6"):
            out[c] = out[c].astype(np.int64)
        return out.reset_index(drop=True)

    return counts.groupby("source").map_groups(
        per_source, batch_format="pandas"
    )


RAKE_SQL = f"""
WITH toks AS MATERIALIZED (
  SELECT source, doc_id,
         unnest(string_split(lower(text), ' ')) AS word,
         generate_subscripts(string_split(lower(text), ' '), 1) AS pos
  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
), nz AS MATERIALIZED (
  SELECT source, doc_id, word, pos,
         CASE WHEN word IN ({_RAKE_STOP_SQL}) THEN 1 ELSE 0 END
           AS is_stop
  FROM toks WHERE word <> ''
), ph AS MATERIALIZED (
  SELECT source, doc_id, word, is_stop,
         SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) - is_stop
           AS phrase
  FROM nz
), plen AS MATERIALIZED (
  SELECT doc_id, phrase, CAST(COUNT(*) AS BIGINT) AS plen
  FROM ph WHERE is_stop = 0 GROUP BY 1, 2
), occ AS MATERIALIZED (
  SELECT p.source, p.word, l.plen
  FROM ph p JOIN plen l ON l.doc_id = p.doc_id AND l.phrase = p.phrase
  WHERE p.is_stop = 0
), agg AS MATERIALIZED (
  SELECT source, word,
         CAST(SUM(plen) AS BIGINT) AS deg,
         CAST(COUNT(*) AS BIGINT) AS freq
  FROM occ GROUP BY 1, 2
), ranked AS (
  SELECT source, word, deg, freq,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE) DESC,
                    word ASC
         ) AS rn
  FROM agg
)
SELECT source, word, deg, freq,
       CAST(ROUND(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE)
            * 1000000.0, 0) AS BIGINT) AS score_x1e6
FROM ranked WHERE rn <= {_RAKE_TOP}
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Renyi entropy spectrum per source
# ---------------------------------------------------------------------------


def q_renyi_entropy_spectrum(sf_dir):
    """Per source: the Renyi entropy spectrum of the word
    distribution at orders 0, 2 and infinity — H0 = ln(vocab)
    (richness), H2 = 2 ln T - ln sum(c^2) (collision entropy, the
    log-inverse Simpson), Hinf = ln T - ln c_max (min-entropy). The
    four moments are exact int64 from combiner-first word counts;
    each entropy is a log expression of those ints snapped x1e6 (the
    registry's accepted ln discipline). H0 >= H2 >= Hinf always —
    the spectrum's spread measures heavy-tailedness."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("source", "text"))
        words = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        src = np.repeat(b["source"].to_numpy(zero_copy_only=False), n_per)
        flat = pc.list_flatten(words)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "source": pa.array(src[keep]),
                "word": flat.filter(pa.array(keep)),
            }
        )
        g = t.group_by(["source", "word"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "word", "cnt"])

    counts = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["source", "word"])
        .aggregate([("cnt", "sum")])
        .rename_columns(["source", "word", "cnt"]),
        final_shards=4,
        shard_cols=["source"],
    )

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["source", "vocab", "total", "sum_c2", "c_max",
                "h0_x1e6", "h2_x1e6", "hinf_x1e6"]
        empty = pd.DataFrame(
            {
                "source": pd.Series([], dtype=object),
                **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
            }
        )
        if len(g) == 0:
            return empty
        g = g.groupby(["source", "word"], as_index=False)["cnt"].sum()
        rows = {c: [] for c in cols}
        for src, gg in g.groupby("source", sort=False):
            c = gg["cnt"].to_numpy(dtype=np.int64)
            v = len(c)
            t = int(c.sum())
            s2 = int(np.sum(c * c))
            cm = int(c.max())
            rows["source"].append(src)
            rows["vocab"].append(v)
            rows["total"].append(t)
            rows["sum_c2"].append(s2)
            rows["c_max"].append(cm)
            rows["h0_x1e6"].append(
                _round_half_away(np.log(float(v)) * 1e6)
            )
            rows["h2_x1e6"].append(
                _round_half_away(
                    (2.0 * np.log(float(t)) - np.log(float(s2))) * 1e6
                )
            )
            rows["hinf_x1e6"].append(
                _round_half_away(
                    (np.log(float(t)) - np.log(float(cm))) * 1e6
                )
            )
        out = pd.DataFrame(rows)
        for c2 in cols[1:]:
            out[c2] = out[c2].astype(np.int64)
        return out

    return counts.groupby("source").map_groups(
        per_source, batch_format="pandas"
    )


RENYI_SQL = """
WITH w AS MATERIALIZED (
  SELECT source, unnest(string_split(lower(text), ' ')) AS word
  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
), c AS MATERIALIZED (
  SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM w WHERE word <> '' GROUP BY 1, 2
), agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(SUM(cnt) AS BIGINT) AS total,
         CAST(SUM(cnt * cnt) AS BIGINT) AS sum_c2,
         CAST(MAX(cnt) AS BIGINT) AS c_max
  FROM c GROUP BY 1
)
SELECT source, vocab, total, sum_c2, c_max,
       CAST(ROUND(LN(CAST(vocab AS DOUBLE)) * 1000000.0, 0) AS BIGINT)
         AS h0_x1e6,
       CAST(ROUND((2.0 * LN(CAST(total AS DOUBLE))
            - LN(CAST(sum_c2 AS DOUBLE))) * 1000000.0, 0) AS BIGINT)
         AS h2_x1e6,
       CAST(ROUND((LN(CAST(total AS DOUBLE))
            - LN(CAST(c_max AS DOUBLE))) * 1000000.0, 0) AS BIGINT)
         AS hinf_x1e6
FROM agg ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Discrete Bass diffusion fit of user adoption
# ---------------------------------------------------------------------------


def q_bass_diffusion_fit(sf_dir):
    """Discrete Bass diffusion fit of user adoption: with n_t = new
    users on day t and N = cumulative adopters before t, OLS of
    n_t = a + b*N + c*N^2 (Bass 1969's discrete form; a = p*m,
    b = q - p, c = -q/m). The nine regression moments are exact
    integers (N^4 sums held in int128); the 3x3 Cramer solve and the
    market-size root m = (-b - sqrt(b^2 - 4ac)) / (2c) mirror
    expression-for-expression. First-adoption days reduce
    distributed (per-user min), the day grid is bounded."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("user_id", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        t = pa.table(
            {
                "user_id": b["user_id"],
                "day": pa.array((us // _DAY_US).astype(np.int64)),
            }
        )
        g = t.group_by(["user_id"]).aggregate([("day", "min")])
        return g.rename_columns(["user_id", "day"])

    firsts = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["user_id"])
        .aggregate([("day", "min")])
        .rename_columns(["user_id", "day"]),
    ).to_pandas()
    cols = ["t_len", "n_users", "a_x1e6", "b_x1e9", "c_x1e12",
            "m_est"]
    if not len(firsts) or "user_id" not in firsts.columns:
        return pa.table({c: pa.array([], pa.int64()) for c in cols})
    firsts = firsts.groupby("user_id", as_index=False)["day"].min()
    days = firsts["day"].to_numpy(dtype=np.int64)
    gmin, gmax = int(days.min()), int(days.max())
    width = gmax - gmin + 1
    n_t = np.bincount(days - gmin, minlength=width).astype(np.int64)
    cum_before = np.concatenate(([0], np.cumsum(n_t)[:-1]))
    t_len = width
    x1 = [int(v) for v in cum_before]
    y = [int(v) for v in n_t]
    s1 = sum(x1)
    s2 = sum(v * v for v in x1)
    s11 = s2
    s12 = sum(v**3 for v in x1)
    s22 = sum(v**4 for v in x1)
    sy = sum(y)
    s1y = sum(a * b for a, b in zip(x1, y))
    s2y = sum(a * a * b for a, b in zip(x1, y))
    tf = float(t_len)
    f1, f2, f11, f12, f22 = (
        float(s1), float(s2), float(s11), float(s12), float(s22),
    )
    fy, f1y, f2y = float(sy), float(s1y), float(s2y)
    det = (
        tf * (f11 * f22 - f12 * f12)
        - f1 * (f1 * f22 - f12 * f2)
        + f2 * (f1 * f12 - f11 * f2)
    )
    a_v = b_v = c_v = m_v = None
    if det != 0.0:
        det_a = (
            fy * (f11 * f22 - f12 * f12)
            - f1 * (f1y * f22 - f12 * f2y)
            + f2 * (f1y * f12 - f11 * f2y)
        )
        det_b = (
            tf * (f1y * f22 - f12 * f2y)
            - fy * (f1 * f22 - f12 * f2)
            + f2 * (f1 * f2y - f1y * f2)
        )
        det_c = (
            tf * (f11 * f2y - f1y * f12)
            - f1 * (f1 * f2y - f1y * f2)
            + fy * (f1 * f12 - f11 * f2)
        )
        a_v = det_a / det
        b_v = det_b / det
        c_v = det_c / det
        disc = b_v * b_v - 4.0 * a_v * c_v
        if c_v != 0.0 and disc >= 0.0:
            m_v = (-b_v - np.sqrt(disc)) / (2.0 * c_v)
    return pa.table(
        {
            "t_len": pa.array([t_len], pa.int64()),
            "n_users": pa.array([int(sy)], pa.int64()),
            "a_x1e6": pa.array(
                [None if a_v is None else _round_half_away(a_v * 1e6)],
                pa.int64(),
            ),
            "b_x1e9": pa.array(
                [None if b_v is None else _round_half_away(b_v * 1e9)],
                pa.int64(),
            ),
            "c_x1e12": pa.array(
                [None if c_v is None else _round_half_away(c_v * 1e12)],
                pa.int64(),
            ),
            "m_est": pa.array(
                [None if m_v is None else _round_half_away(m_v)],
                pa.int64(),
            ),
        }
    )


BASS_SQL = """
WITH f AS MATERIALIZED (
  SELECT user_id,
         CAST(MIN(FLOOR(EPOCH_US(ts) / 86400000000)) AS BIGINT) AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
), bounds AS MATERIALIZED (
  SELECT MIN(day) AS mn, MAX(day) AS mx FROM f
), grid AS MATERIALIZED (
  SELECT unnest(generate_series(mn, mx)) AS day FROM bounds
), nt AS MATERIALIZED (
  SELECT g.day, CAST(COALESCE(c.c, 0) AS BIGINT) AS y
  FROM grid g
  LEFT JOIN (SELECT day, COUNT(*) AS c FROM f GROUP BY 1) c
    ON c.day = g.day
), xx AS MATERIALIZED (
  SELECT day, y,
         CAST(SUM(y) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) - y
              AS BIGINT) AS x
  FROM nt
), mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(x) AS BIGINT) AS s1,
         CAST(SUM(x * x) AS BIGINT) AS s2,
         SUM(CAST(x AS HUGEINT) * x * x) AS s12,
         SUM(CAST(x AS HUGEINT) * x * x * x) AS s22,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS s1y,
         SUM(CAST(x AS HUGEINT) * x * y) AS s2y
  FROM xx
), alg AS (
  SELECT t, sy,
         CAST(t AS DOUBLE) AS tf,
         CAST(s1 AS DOUBLE) AS f1, CAST(s2 AS DOUBLE) AS f2,
         CAST(s2 AS DOUBLE) AS f11, CAST(s12 AS DOUBLE) AS f12,
         CAST(s22 AS DOUBLE) AS f22,
         CAST(sy AS DOUBLE) AS fy, CAST(s1y AS DOUBLE) AS f1y,
         CAST(s2y AS DOUBLE) AS f2y
  FROM mom
), dets AS (
  SELECT t, sy,
         tf * (f11 * f22 - f12 * f12)
           - f1 * (f1 * f22 - f12 * f2)
           + f2 * (f1 * f12 - f11 * f2) AS det,
         fy * (f11 * f22 - f12 * f12)
           - f1 * (f1y * f22 - f12 * f2y)
           + f2 * (f1y * f12 - f11 * f2y) AS det_a,
         tf * (f1y * f22 - f12 * f2y)
           - fy * (f1 * f22 - f12 * f2)
           + f2 * (f1 * f2y - f1y * f2) AS det_b,
         tf * (f11 * f2y - f1y * f12)
           - f1 * (f1 * f2y - f1y * f2)
           + fy * (f1 * f12 - f11 * f2) AS det_c
  FROM alg
), coef AS (
  SELECT t, sy,
         CASE WHEN det <> 0.0 THEN det_a / det END AS a,
         CASE WHEN det <> 0.0 THEN det_b / det END AS b,
         CASE WHEN det <> 0.0 THEN det_c / det END AS c
  FROM dets
)
SELECT t AS t_len, sy AS n_users,
       CAST(ROUND(a * 1000000.0, 0) AS BIGINT) AS a_x1e6,
       CAST(ROUND(b * 1000000000.0, 0) AS BIGINT) AS b_x1e9,
       CAST(ROUND(c * 1000000000000.0, 0) AS BIGINT) AS c_x1e12,
       CASE WHEN c IS NOT NULL AND c <> 0.0
             AND b * b - 4.0 * a * c >= 0.0 THEN
         CAST(ROUND((-b - SQRT(b * b - 4.0 * a * c)) / (2.0 * c), 0)
              AS BIGINT)
       END AS m_est
FROM coef
"""


def register_r4eo(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "rake_keywords_top": q_rake_keywords_top,
            "renyi_entropy_spectrum": q_renyi_entropy_spectrum,
            "bass_diffusion_fit": q_bass_diffusion_fit,
        }
    )
    oracles.update(
        {
            "rake_keywords_top": RAKE_SQL,
            "renyi_entropy_spectrum": RENYI_SQL,
            "bass_diffusion_fit": BASS_SQL,
        }
    )
