"""Round-4 batch GA: variogram structure, language-model drift,
and quantile forecast loss — the empirical semivariogram of hourly
counts per type at lags 1..6 (the geostatistics view of temporal
structure: where does gamma(l) flatten = how far memory reaches),
the cross-entropy / KL of each source's unigram distribution
against the pooled corpus (which sources a corpus-level LM
misprices, in bits/token), and the pinball loss of the seasonal-
naive 24h-lag forecast at q = 0.1 / 0.5 / 0.9 (the asymmetric loss
that scores under- vs over-forecasting separately).

Exactness discipline: variogram and pinball fold integer counts
from identical dense grids through mirrored double sums; cross-
entropy uses exact count ratios (every source word exists in the
pooled corpus, so no smoothing is needed) with one log2 per
distinct word."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mimirsbrunn_ray.pipelines.queries_r4dd import (
    _word_counts_per_source,
)
from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _HOUR_US,
    _round_half_away,
)
from mimirsbrunn_ray.pipelines.queries_r4fl import (
    _dense_hour_counts,
)

_VARIO_LAGS = 6
_PINBALL_QS = (0.1, 0.5, 0.9)


_VARIO_COLS = ["event_type", "lag", "n_pairs", "gamma_x1e3"]


def q_variogram_hourly(sf_dir):
    """Empirical semivariogram per event type on the dense hourly
    grid: gamma(l) = mean((y_{t+l} - y_t)^2) / 2 for lags 1..6 —
    the lag where gamma flattens to the sill is the practical
    memory range of the series, read directly without fitting an
    AR model.  Counts are one distributed pass; the lag sweep is
    vectorized driver math."""
    g = _dense_hour_counts(sf_dir)
    if g is None:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64())
               for c in _VARIO_COLS[1:]},
        })
    out = {c: [] for c in _VARIO_COLS}
    for et, sub in g.groupby("event_type", sort=True):
        y = sub.sort_values("hour")["c"].to_numpy(np.float64)
        T = len(y)
        for lag in range(1, _VARIO_LAGS + 1):
            if T <= lag:
                continue
            d = y[lag:] - y[:-lag]
            gamma = float((d * d).sum()) / (2.0 * (T - lag))
            out["event_type"].append(et)
            out["lag"].append(lag)
            out["n_pairs"].append(T - lag)
            out["gamma_x1e3"].append(
                _round_half_away(gamma * 1e3))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        **{c: pa.array(out[c], pa.int64())
           for c in _VARIO_COLS[1:]},
    })


VARIO_SQL = f"""
WITH hc AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) // {_HOUR_US} AS hour,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT MIN(hour) AS hmin, MAX(hour) AS hmax FROM hc
), grid AS MATERIALIZED (
  SELECT t.event_type, s.hmin + r.k AS hour,
         CAST(COALESCE(hc.c, 0) AS DOUBLE) AS c
  FROM (SELECT DISTINCT event_type FROM hc) t
  CROSS JOIN span s
  JOIN range(0, 100000) r(k) ON s.hmin + r.k <= s.hmax
  LEFT JOIN hc ON hc.event_type = t.event_type
              AND hc.hour = s.hmin + r.k
)
SELECT a.event_type,
       CAST(l.k AS BIGINT) AS lag,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(ROUND(SUM((b.c - a.c) * (b.c - a.c))
            / (2.0 * COUNT(*)) * 1000, 0) AS BIGINT)
         AS gamma_x1e3
FROM range(1, {_VARIO_LAGS + 1}) l(k)
CROSS JOIN grid a
JOIN grid b ON b.event_type = a.event_type
           AND b.hour = a.hour + l.k
GROUP BY 1, 2
ORDER BY a.event_type, lag
"""

_XENT_COLS = ["source", "n_tokens", "h_self_x1e6",
              "h_cross_x1e6", "kl_x1e6"]


def q_source_corpus_cross_entropy(sf_dir):
    """Per source, the self-entropy H(p_src), the cross-entropy
    H(p_src, p_corpus) = -sum_w p_src(w) log2 p_corpus(w), and
    their gap KL(p_src || p_corpus) in bits/token — exactly the
    extra bits a corpus-level unigram model pays on that source's
    text, the LM-drift ranking of sources.  Every source word
    exists in the pooled corpus, so no smoothing convention can
    diverge.  One distributed word-count pass."""
    wsc = _word_counts_per_source(sf_dir)
    if not len(wsc) or "source" not in wsc.columns:
        return pa.table({
            "source": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64())
               for c in _XENT_COLS[1:]},
        })
    corpus = wsc.groupby("w")["c"].sum()
    n_all = int(corpus.sum())
    if n_all == 0:
        return pa.table({
            "source": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64())
               for c in _XENT_COLS[1:]},
        })
    out = {c: [] for c in _XENT_COLS}
    for src, g in wsc.groupby("source", sort=True):
        c = g["c"].to_numpy(np.int64).astype(np.float64)
        n = int(c.sum())
        if n == 0:
            continue
        p = c / n
        q = corpus.loc[g["w"]].to_numpy(np.int64).astype(
            np.float64) / n_all
        h_self = float(-(p * np.log2(p)).sum())
        h_cross = float(-(p * np.log2(q)).sum())
        out["source"].append(src)
        out["n_tokens"].append(n)
        out["h_self_x1e6"].append(
            _round_half_away(h_self * 1e6))
        out["h_cross_x1e6"].append(
            _round_half_away(h_cross * 1e6))
        out["kl_x1e6"].append(
            _round_half_away((h_cross - h_self) * 1e6))
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        **{c: pa.array(out[c], pa.int64())
           for c in _XENT_COLS[1:]},
    })


XENT_SQL = """
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), c AS MATERIALIZED (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM w GROUP BY 1, 2
), corp AS MATERIALIZED (
  SELECT w, CAST(SUM(c) AS BIGINT) AS cw FROM c GROUP BY 1
), gl AS MATERIALIZED (
  SELECT CAST(SUM(cw) AS BIGINT) AS n_all FROM corp
), st AS MATERIALIZED (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1
)
SELECT c.source,
       ANY_VALUE(st.n) AS n_tokens,
       CAST(ROUND(-SUM(CAST(c.c AS DOUBLE) / st.n
              * LOG2(CAST(c.c AS DOUBLE) / st.n)) * 1000000, 0)
            AS BIGINT) AS h_self_x1e6,
       CAST(ROUND(-SUM(CAST(c.c AS DOUBLE) / st.n
              * LOG2(CAST(corp.cw AS DOUBLE) / gl.n_all))
            * 1000000, 0) AS BIGINT) AS h_cross_x1e6,
       CAST(ROUND((-SUM(CAST(c.c AS DOUBLE) / st.n
              * LOG2(CAST(corp.cw AS DOUBLE) / gl.n_all))
              - (-SUM(CAST(c.c AS DOUBLE) / st.n
                 * LOG2(CAST(c.c AS DOUBLE) / st.n))))
            * 1000000, 0) AS BIGINT) AS kl_x1e6
FROM c
JOIN corp USING (w)
JOIN st ON st.source = c.source
CROSS JOIN gl
WHERE st.n > 0
GROUP BY c.source
ORDER BY c.source
"""

_PIN_COLS = ["event_type", "q_pct", "n_forecasts",
             "pinball_x1e3"]


def q_pinball_loss_forecast(sf_dir):
    """Pinball (quantile) loss of the seasonal-naive forecast
    y_hat_t = y_{t-24} on the dense hourly grid, at q = 0.1, 0.5
    and 0.9: L_q = mean(q * max(y - y_hat, 0) + (1 - q) *
    max(y_hat - y, 0)) — q = 0.5 is half the MAE, while the 0.1/0.9
    asymmetry says whether the naive model errs by over- or
    under-shooting, per event type.  Counts are one distributed
    pass; the loss folds mirrored doubles."""
    g = _dense_hour_counts(sf_dir)
    if g is None:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _PIN_COLS[1:]},
        })
    out = {c: [] for c in _PIN_COLS}
    for et, sub in g.groupby("event_type", sort=True):
        y = sub.sort_values("hour")["c"].to_numpy(np.float64)
        T = len(y)
        if T <= 24:
            continue
        actual = y[24:]
        pred = y[:-24]
        over = np.maximum(actual - pred, 0.0)
        under = np.maximum(pred - actual, 0.0)
        n = T - 24
        for q in _PINBALL_QS:
            loss = float((q * over + (1.0 - q) * under).sum()) / n
            out["event_type"].append(et)
            out["q_pct"].append(int(round(q * 100)))
            out["n_forecasts"].append(n)
            out["pinball_x1e3"].append(
                _round_half_away(loss * 1e3))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        **{c: pa.array(out[c], pa.int64())
           for c in _PIN_COLS[1:]},
    })


PINBALL_SQL = f"""
WITH hc AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) // {_HOUR_US} AS hour,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT MIN(hour) AS hmin, MAX(hour) AS hmax FROM hc
), grid AS MATERIALIZED (
  SELECT t.event_type, s.hmin + r.k AS hour,
         CAST(COALESCE(hc.c, 0) AS DOUBLE) AS c
  FROM (SELECT DISTINCT event_type FROM hc) t
  CROSS JOIN span s
  JOIN range(0, 100000) r(k) ON s.hmin + r.k <= s.hmax
  LEFT JOIN hc ON hc.event_type = t.event_type
              AND hc.hour = s.hmin + r.k
), qs AS (
  SELECT * FROM (VALUES (0.1), (0.5), (0.9)) v(q)
)
SELECT a.event_type,
       CAST(ROUND(qs.q * 100, 0) AS BIGINT) AS q_pct,
       CAST(COUNT(*) AS BIGINT) AS n_forecasts,
       CAST(ROUND(SUM(qs.q * GREATEST(a.c - b.c, 0.0)
                      + (1.0 - qs.q)
                        * GREATEST(b.c - a.c, 0.0))
            / COUNT(*) * 1000, 0) AS BIGINT) AS pinball_x1e3
FROM grid a
JOIN grid b ON b.event_type = a.event_type
           AND b.hour = a.hour - 24
CROSS JOIN qs
GROUP BY 1, 2
ORDER BY a.event_type, q_pct
"""


def register_r4ga(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "variogram_hourly": q_variogram_hourly,
            "source_corpus_cross_entropy":
                q_source_corpus_cross_entropy,
            "pinball_loss_forecast": q_pinball_loss_forecast,
        }
    )
    oracles.update(
        {
            "variogram_hourly": VARIO_SQL,
            "source_corpus_cross_entropy": XENT_SQL,
            "pinball_loss_forecast": PINBALL_SQL,
        }
    )
