"""Round-4 batch I: stopword-profile language ID, strictly-increasing
monotone streaks, dominant seasonality period by lagged autocorrelation
argmax, and Benford first-digit law conformance.

Exactness discipline: all counts/islands from exact integers; per-lag /
per-digit float terms are ONE identical expression on both sides from
exact int64 operands (hard-coded literal double constants where a
library function could differ by an ulp), snapped to fixed point per
term BEFORE any sum or argmax.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# ---------------------------------------------------------------------------
# stopword-profile language ID
# ---------------------------------------------------------------------------

# fixed marker profiles (alphabetical lang order = argmax tie-break order)
_LID_PROFILES = [
    ("de", ("der", "die", "das", "und")),
    ("en", ("the", "a", "of", "and")),
    ("es", ("el", "los", "las", "y")),
    ("fr", ("le", "la", "les", "et")),
]


def q_lang_id_docs(sf_dir):
    """Deterministic stopword-profile language ID: per document, count
    lowercase whitespace tokens hitting each language's fixed 4-marker
    list; predict the lexicographically-smallest language among the
    maxima, or 'und' when nothing hits. Zero shuffles — every document
    is wholly inside its batch, so the whole operator is ONE map_batches
    over (doc_id, text) with broadcast-size marker sets."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    langs = [l for l, _ in _LID_PROFILES]
    sets = [pa.array(list(words)) for _, words in _LID_PROFILES]

    def batch(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["doc_id"]))
        text = pc.if_else(
            pc.is_valid(b["text"]), b["text"], pa.scalar("", pa.string())
        )
        words = pc.split_pattern(pc.utf8_lower(text), " ")
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        seg = np.repeat(np.arange(len(b)), n_per)
        hits = np.zeros((len(b), len(langs)), dtype=np.int64)
        for j, s in enumerate(sets):
            m = pc.is_in(flat, value_set=s).to_numpy(zero_copy_only=False)
            if m.any():
                np.add.at(hits[:, j], seg[m], 1)
        best = np.argmax(hits, axis=1)  # first max = alphabetical tie-break
        n_hits = hits[np.arange(len(b)), best]
        pred = np.where(
            n_hits == 0, "und", np.array(langs, dtype=object)[best]
        )
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "pred_lang": pa.array(pred.astype(object)),
                "n_hits": pa.array(n_hits),
            }
        )

    return docs.map_batches(batch, batch_format="pyarrow", batch_size=None)


def _in_list(col: str, words) -> str:
    return ", ".join(f"'{w}'" for w in words)


LANGID_SQL = f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(lower(coalesce(text, '')), ' ')) AS word
  FROM documents WHERE doc_id IS NOT NULL
), h AS (
  SELECT d.doc_id,
         COALESCE(SUM(CASE WHEN w.word IN ({_in_list('de', _LID_PROFILES[0][1])}) THEN 1 ELSE 0 END), 0) AS de,
         COALESCE(SUM(CASE WHEN w.word IN ({_in_list('en', _LID_PROFILES[1][1])}) THEN 1 ELSE 0 END), 0) AS en,
         COALESCE(SUM(CASE WHEN w.word IN ({_in_list('es', _LID_PROFILES[2][1])}) THEN 1 ELSE 0 END), 0) AS es,
         COALESCE(SUM(CASE WHEN w.word IN ({_in_list('fr', _LID_PROFILES[3][1])}) THEN 1 ELSE 0 END), 0) AS fr
  FROM (SELECT doc_id FROM documents WHERE doc_id IS NOT NULL) d
  LEFT JOIN w ON w.doc_id = d.doc_id
  GROUP BY d.doc_id
)
SELECT doc_id,
       CASE WHEN de + en + es + fr = 0 THEN 'und'
            WHEN de >= en AND de >= es AND de >= fr THEN 'de'
            WHEN en >= es AND en >= fr THEN 'en'
            WHEN es >= fr THEN 'es'
            ELSE 'fr' END AS pred_lang,
       CAST(CASE WHEN de + en + es + fr = 0 THEN 0
            ELSE greatest(de, en, es, fr) END AS BIGINT) AS n_hits
FROM h
"""


# ---------------------------------------------------------------------------
# strictly-increasing monotone streaks
# ---------------------------------------------------------------------------


def q_monotone_streaks(sf_dir):
    """Longest strictly-increasing consecutive streak per event type
    (x100 values, (ts, id) order) and the number of maximal increasing
    streaks of length >= 3 — the monotone-run cousin of the RLE islands:
    a new island starts at a series start or wherever the x100 delta is
    <= 0. One series hash-bucket shuffle, one cumsum."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET
    from mimirsbrunn_ray.stages.timeseries import (
        _project_series,
        _round_half_away_x,
        _series_segments,
    )

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    proj = _project_series(ev, "event_type", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_samples": pd.Series([], dtype=np.int64),
                "longest_streak": pd.Series([], dtype=np.int64),
                "n_streaks_ge3": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "event_type", "ts", "event_id")
        x = _round_half_away_x(g["value"].to_numpy(dtype=np.float64), 100.0)
        prev = np.concatenate(([np.int64(0)], x[:-1]))
        new_run = (~same) | (x <= prev)
        rid = np.cumsum(new_run)
        runs = pd.DataFrame(
            {"k": g["event_type"].to_numpy(), "rid": rid}
        ).groupby(["k", "rid"], sort=False, as_index=False).size()
        runs["ge3"] = (runs["size"] >= 3).astype(np.int64)
        agg = runs.groupby("k", sort=False, as_index=False).agg(
            n_samples=("size", "sum"),
            longest_streak=("size", "max"),
            n_streaks_ge3=("ge3", "sum"),
        )
        out = agg.rename(columns={"k": "event_type"})
        for c in ("n_samples", "longest_streak", "n_streaks_ge3"):
            out[c] = out[c].astype(np.int64)
        return out

    return proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas")


STREAKS_SQL = """
WITH v AS (
  SELECT event_type, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), c AS (
  SELECT event_type, ts, event_id,
         CASE WHEN x > LAG(x) OVER w THEN 0 ELSE 1 END AS new_run
  FROM v WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), r AS (
  SELECT event_type,
         SUM(new_run) OVER (PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid
  FROM c
), runs AS (
  SELECT event_type, rid, COUNT(*) AS len FROM r GROUP BY 1, 2
)
SELECT event_type,
       CAST(SUM(len) AS BIGINT) AS n_samples,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(SUM(CASE WHEN len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_streaks_ge3
FROM runs GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# dominant seasonality period by lagged-autocorrelation argmax
# ---------------------------------------------------------------------------

_MAX_LAG = 24


def q_dominant_period(sf_dir):
    """Dominant period per event type: over the hourly mean_x100 series
    (floor-divided integers on the bounded (type, hour) grain), compute
    the lag-L Pearson correlation for L in 1..24 from six exact int64
    moment sums over the lag-matched PRESENT-hour pairs, snap each to
    x1e6, and report the argmax lag (ties -> smallest lag). Lags with
    zero variance on either side are skipped; types with no valid lag
    are dropped."""
    from mimirsbrunn_ray.stages.rollup import tree_merge
    from mimirsbrunn_ray.stages.timeseries import _round_half_away_x

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"])),
                pc.is_valid(b["value"]),
            )
        )
        hu = pc.divide(
            pc.cast(
                pc.cast(pc.floor_temporal(b["ts"], unit="hour"),
                        pa.timestamp("us")),
                pa.int64(),
            ),
            3_600_000_000,
        )
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table({"event_type": b["event_type"], "hu": hu, "x": pa.array(x)})
        return (
            t.group_by(["event_type", "hu"])
            .aggregate([("x", "sum"), ([], "count_all")])
            .rename_columns(["event_type", "hu", "sx", "n"])
        )

    hourly = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["event_type", "hu"])
        .aggregate([("sx", "sum"), ("n", "sum")])
        .rename_columns(["event_type", "hu", "sx", "n"]),
        final_shards=2,
        shard_cols=["event_type"],
    ).repartition(2)

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "best_lag": pd.Series([], dtype=np.int64),
                "corr_x1e6": pd.Series([], dtype=np.int64),
                "n_pairs": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values("hu", ignore_index=True)
        hu = g["hu"].to_numpy(dtype=np.int64)
        m = g["sx"].to_numpy(dtype=np.int64) // g["n"].to_numpy(dtype=np.int64)
        best = None
        for lag in range(1, _MAX_LAG + 1):
            idx = np.searchsorted(hu, hu + lag)
            ok = (idx < len(hu))
            ok[ok] = hu[idx[ok]] == hu[ok.nonzero()[0]] + lag
            if not ok.any():
                continue
            a = m[ok]
            bb = m[idx[ok]]
            n = int(ok.sum())
            sx, sy = int(a.sum()), int(bb.sum())
            sxx = int((a * a).sum())
            syy = int((bb * bb).sum())
            sxy = int((a * bb).sum())
            varx = n * sxx - sx * sx
            vary = n * syy - sy * sy
            if varx <= 0 or vary <= 0:
                continue
            # identical float expression as the oracle
            corr = float(n * sxy - sx * sy) / np.sqrt(
                float(varx) * float(vary)
            )
            c6 = int(_round_half_away_x(np.array([corr]), 1e6)[0])
            if best is None or c6 > best[1]:
                best = (lag, c6, n)
        if best is None:
            return empty
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "best_lag": np.array([best[0]], dtype=np.int64),
                "corr_x1e6": np.array([best[1]], dtype=np.int64),
                "n_pairs": np.array([best[2]], dtype=np.int64),
            }
        )

    return hourly.groupby("event_type").map_groups(
        per_type, batch_format="pandas"
    )


PERIOD_SQL = f"""
WITH h AS (
  SELECT event_type,
         epoch_us(date_trunc('hour', ts)) // 3600000000 AS hu,
         SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) // COUNT(*) AS m
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), lag_corr AS (
  SELECT a.event_type, l.lag,
         COUNT(*) AS n,
         SUM(a.m) AS sx, SUM(b.m) AS sy,
         SUM(a.m * a.m) AS sxx, SUM(b.m * b.m) AS syy,
         SUM(a.m * b.m) AS sxy
  FROM h a
  JOIN generate_series(1, {_MAX_LAG}) AS l(lag) ON TRUE
  JOIN h b ON b.event_type = a.event_type AND b.hu = a.hu + l.lag
  GROUP BY 1, 2
), scored AS (
  SELECT event_type, lag, n,
         CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                  * CAST(n * syy - sy * sy AS DOUBLE)) * 1000000, 0)
           AS BIGINT) AS c6
  FROM lag_corr
  WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
             ORDER BY c6 DESC, lag ASC) AS rk
  FROM scored
)
SELECT event_type,
       CAST(lag AS BIGINT) AS best_lag,
       c6 AS corr_x1e6,
       CAST(n AS BIGINT) AS n_pairs
FROM ranked WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# Benford first-digit conformance
# ---------------------------------------------------------------------------

# log10(1 + 1/d) for d = 1..9, written as literal doubles so both engine
# and oracle parse the SAME constants (no library-log ulp divergence)
_BENFORD_P = [
    0.3010299956639812, 0.17609125905568124, 0.12493873660829993,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514,
]


def q_benford_first_digit(sf_dir):
    """Benford's-law conformance per event type: first significant digit
    of the positive x100 value, counted exactly on the bounded
    (type, x100) histogram grain (digits derived from DISTINCT values,
    never rows), plus the chi-square statistic vs the Benford expectation
    — per-digit float terms from literal-double constants snapped x1e6
    before the integer sum, replicated on each digit row."""
    from mimirsbrunn_ray.stages.rollup import tree_merge
    from mimirsbrunn_ray.stages.timeseries import _round_half_away_x

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["value"]))
        )
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        pos = x > 0
        t = pa.table(
            {
                "event_type": b["event_type"].filter(pa.array(pos)),
                "x": pa.array(x[pos]),
            }
        )
        return (
            t.group_by(["event_type", "x"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "x", "cnt"])
        )

    hist = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["event_type", "x"])
        .aggregate([("cnt", "sum")])
        .rename_columns(["event_type", "x", "cnt"]),
        final_shards=2,
        shard_cols=["event_type"],
    ).repartition(2)

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "digit": pd.Series([], dtype=np.int64),
                "n_obs": pd.Series([], dtype=np.int64),
                "chi2_x1e6": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        x = g["x"].to_numpy(dtype=np.int64)
        cnt = g["cnt"].to_numpy(dtype=np.int64)
        d = x.copy()
        while (d >= 10).any():
            d = np.where(d >= 10, d // 10, d)
        obs = np.zeros(9, dtype=np.int64)
        np.add.at(obs, d - 1, cnt)
        n = int(obs.sum())
        p = np.array(_BENFORD_P)
        # identical float expression as the oracle, per digit
        term = (obs.astype(np.float64) - n * p) ** 2 / (n * p)
        term_x1e6 = _round_half_away_x(term, 1e6)
        chi2 = int(term_x1e6.sum())
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]] * 9,
                "digit": np.arange(1, 10, dtype=np.int64),
                "n_obs": obs,
                "chi2_x1e6": np.full(9, chi2, dtype=np.int64),
            }
        )

    return hist.groupby("event_type").map_groups(
        per_type, batch_format="pandas"
    )


_BENFORD_VALUES = ", ".join(
    f"({d}, CAST({p!r} AS DOUBLE))" for d, p in zip(range(1, 10), _BENFORD_P)
)

BENFORD_SQL = f"""
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
    AND CAST(ROUND(value * 100, 0) AS BIGINT) > 0
), dg AS (
  SELECT event_type,
         CAST(substr(CAST(x AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         COUNT(*) AS cnt
  FROM v GROUP BY 1, 2
), bf(digit, p) AS (VALUES {_BENFORD_VALUES}),
tot AS (
  SELECT event_type, SUM(cnt) AS n FROM dg GROUP BY 1
), terms AS (
  SELECT t.event_type, bf.digit,
         CAST(COALESCE(dg.cnt, 0) AS BIGINT) AS n_obs,
         CAST(ROUND(
           (CAST(COALESCE(dg.cnt, 0) AS DOUBLE) - t.n * bf.p)
           * (CAST(COALESCE(dg.cnt, 0) AS DOUBLE) - t.n * bf.p)
           / (t.n * bf.p) * 1000000, 0) AS BIGINT) AS term
  FROM tot t
  JOIN bf ON TRUE
  LEFT JOIN dg ON dg.event_type = t.event_type AND dg.digit = bf.digit
)
SELECT event_type, digit, n_obs,
       CAST(SUM(term) OVER (PARTITION BY event_type) AS BIGINT) AS chi2_x1e6
FROM terms
"""


def register_r4i(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "lang_id_docs": q_lang_id_docs,
            "monotone_streaks": q_monotone_streaks,
            "dominant_period": q_dominant_period,
            "benford_first_digit": q_benford_first_digit,
        }
    )
    oracles.update(
        {
            "lang_id_docs": LANGID_SQL,
            "monotone_streaks": STREAKS_SQL,
            "dominant_period": PERIOD_SQL,
            "benford_first_digit": BENFORD_SQL,
        }
    )
