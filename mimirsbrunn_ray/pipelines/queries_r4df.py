"""Round-4 batch DF: symbolic and spectral series representations —
SAX daily words over hourly means, the tsfresh c3 nonlinearity
statistic, and spectral flatness of the diurnal profile.

Exactness discipline: hourly/daily means divide identical exact int64
sums; SAX symbols come from threshold compares on those identical
doubles (fixed Gaussian breakpoints as shared literals) so the emitted
strings are byte-equal; c3 folds exact int64 triple products at dollar
grain; the DFT power fold uses COS/SIN on identical inputs (ulp noise
far inside the snap). x1e6 snaps on the float outputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET
from mimirsbrunn_ray.stages.rollup import tree_merge
from mimirsbrunn_ray.stages.timeseries import (
    _project_series,
    _round_half_away_x,
    _series_segments,
)

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000
# SAX breakpoints for a 4-symbol alphabet (standard normal terciles)
_SAX_B1 = -0.6744897501960817
_SAX_B2 = 0.0
_SAX_B3 = 0.6744897501960817


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
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


def _hour_cells(sf_dir, with_day: bool):
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        cols = {
            "event_type": b["event_type"],
            "h": pa.array(((us // _HOUR_US) % 24).astype(np.int64)),
            "s": pa.array(x),
            "c": pa.array(np.ones(len(x), np.int64)),
        }
        keys = ["event_type", "h"]
        if with_day:
            cols["d"] = pa.array((us // _DAY_US).astype(np.int64))
            keys = ["event_type", "d", "h"]
        return _sum_by(pa.table(cols), keys, ["s", "c"])

    keys = ["event_type", "d", "h"] if with_day else ["event_type", "h"]
    return tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, keys, ["s", "c"]),
    ).to_pandas()


# ---------------------------------------------------------------------------
# SAX daily words over hourly means
# ---------------------------------------------------------------------------


def q_sax_daily_words(sf_dir):
    """Per (event type, day): the 24-hour SAX word — hourly means
    z-normalized against the TYPE's own overall mean/sd and discretized
    into the 4-symbol alphabet a..d at the standard Gaussian
    breakpoints (missing hours emit '_') — the symbolic series
    representation behind motif mining and symbolic anomaly grep.
    Hourly means and the normalization constants divide identical exact
    integers, so the per-hour z-scores are IDENTICAL doubles on both
    sides and the emitted words are byte-equal; days with a degenerate
    type sd emit NULL."""
    cells = _hour_cells(sf_dir, with_day=True)
    if not len(cells) or "event_type" not in cells.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "d": pa.array([], pa.int64()),
                "word": pa.array([], pa.string()),
            }
        )
    out = {"event_type": [], "d": [], "word": []}
    for et, g in cells.sort_values(["event_type", "d", "h"]).groupby(
        "event_type", sort=True
    ):
        s_tot = int(g["s"].sum())
        c_tot = int(g["c"].sum())
        mu = float(s_tot) / c_tot
        # population sd of hourly means over ALL the type's (d, h) cells
        m_all = g["s"].to_numpy(dtype=np.float64) / g["c"].to_numpy(
            dtype=np.int64
        )
        k = len(m_all)
        var = (float(np.sum(m_all * m_all)) - float(np.sum(m_all))
               * np.sum(m_all) / k) / k
        sd = np.sqrt(var)
        for d, gd in g.groupby("d", sort=True):
            if sd == 0.0:
                out["event_type"].append(et)
                out["d"].append(int(d))
                out["word"].append(None)
                continue
            sym = np.full(24, "_", dtype=object)
            hs = gd["h"].to_numpy(dtype=np.int64)
            ms = gd["s"].to_numpy(dtype=np.float64) / gd["c"].to_numpy(
                dtype=np.int64
            )
            z = (ms - mu) / sd
            lab = np.where(
                z < _SAX_B1, "a",
                np.where(z < _SAX_B2, "b", np.where(z < _SAX_B3, "c", "d")),
            )
            sym[hs] = lab
            out["event_type"].append(et)
            out["d"].append(int(d))
            out["word"].append("".join(sym.tolist()))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "d": pa.array(out["d"], pa.int64()),
            "word": pa.array(out["word"], pa.string()),
        }
    )


SAX_SQL = f"""
WITH cell AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 86400000000) AS BIGINT) AS d,
         hour(ts) AS h,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2, 3
), norm AS MATERIALIZED (
  SELECT event_type,
         CAST(SUM(s) AS DOUBLE) / SUM(c) AS mu,
         SQRT((SUM((CAST(s AS DOUBLE) / c) * (CAST(s AS DOUBLE) / c))
               - SUM(CAST(s AS DOUBLE) / c) * SUM(CAST(s AS DOUBLE) / c)
                 / COUNT(*)) / COUNT(*)) AS sd
  FROM cell GROUP BY 1
), sym AS (
  SELECT cell.event_type, cell.d, cell.h,
         CASE WHEN (CAST(cell.s AS DOUBLE) / cell.c - norm.mu) / norm.sd
                   < {_SAX_B1!r} THEN 'a'
              WHEN (CAST(cell.s AS DOUBLE) / cell.c - norm.mu) / norm.sd
                   < {_SAX_B2!r} THEN 'b'
              WHEN (CAST(cell.s AS DOUBLE) / cell.c - norm.mu) / norm.sd
                   < {_SAX_B3!r} THEN 'c'
              ELSE 'd' END AS sym
  FROM cell JOIN norm ON norm.event_type = cell.event_type
  WHERE norm.sd <> 0
), grid AS (
  SELECT td.event_type, td.d, gh.h, COALESCE(sym.sym, '_') AS sym
  FROM (SELECT DISTINCT event_type, d FROM cell) td
  CROSS JOIN (SELECT unnest(range(0, 24)) AS h) gh
  LEFT JOIN sym ON sym.event_type = td.event_type AND sym.d = td.d
               AND sym.h = gh.h
), words AS (
  SELECT event_type, d, string_agg(sym, '' ORDER BY h) AS word
  FROM grid GROUP BY 1, 2
), degen AS (
  SELECT DISTINCT event_type FROM norm WHERE sd = 0
)
SELECT c.event_type, c.d,
       CASE WHEN dg.event_type IS NOT NULL THEN NULL ELSE w.word END AS word
FROM (SELECT DISTINCT event_type, d FROM cell) c
LEFT JOIN words w ON w.event_type = c.event_type AND w.d = c.d
LEFT JOIN degen dg ON dg.event_type = c.event_type
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# tsfresh c3 nonlinearity statistic
# ---------------------------------------------------------------------------


def q_c3_nonlinearity(sf_dir):
    """Per event type: the tsfresh c3(1) nonlinearity statistic — the
    mean of x_t * x_{t+1} * x_{t+2} over the ordered DOLLAR-grain value
    series (a third-order moment that vanishes for linear Gaussian
    processes; large |c3| flags multiplicative/threshold dynamics that
    linear forecasters will miss). Dollar grain keeps every triple
    product inside int64; the double-lag mask keeps triples inside one
    series; one series-key hash shuffle; the single mean division is a
    mirrored double, x1e6 snap."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    proj = _project_series(ev, "event_type", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_triples": pd.Series([], dtype=np.int64),
                "s": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "event_type", "ts", "event_id")
        x = _round_half_away_x(g["value"].to_numpy(dtype=np.float64), 1.0)
        n = len(g)
        ok = np.zeros(n, dtype=bool)  # row t+2 with both predecessors
        ok[2:] = same[2:] & same[1:-1]
        prod = np.zeros(n, dtype=np.int64)
        prod[2:] = x[2:] * x[1:-1] * x[:-2]
        d = pd.DataFrame(
            {"event_type": g["event_type"].to_numpy()[ok], "p": prod[ok]}
        )
        if not len(d):
            return empty
        a = d.groupby("event_type", sort=False)["p"].agg(
            n_triples="size", s="sum"
        )
        return a.reset_index().astype({"n_triples": np.int64, "s": np.int64})

    stats = (
        proj.groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(stats) or "event_type" not in stats.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_triples": pa.array([], pa.int64()),
                "c3_x1e6": pa.array([], pa.int64()),
            }
        )
    stats = stats.sort_values("event_type", ignore_index=True)
    vals = [
        int(
            _round_half_away(
                np.array(
                    [
                        float(stats["s"].iloc[i])
                        / stats["n_triples"].iloc[i]
                        * 1e6
                    ]
                )
            )[0]
        )
        if stats["n_triples"].iloc[i] > 0
        else None
        for i in range(len(stats))
    ]
    return pa.table(
        {
            "event_type": pa.array(stats["event_type"].tolist(), pa.string()),
            "n_triples": pa.array(
                stats["n_triples"].to_numpy(dtype=np.int64)
            ),
            "c3_x1e6": pa.array(vals, pa.int64()),
        }
    )


C3_SQL = """
WITH v AS (
  SELECT event_type, ts, event_id, CAST(ROUND(value, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), lagd AS (
  SELECT event_type,
         x * LAG(x, 1) OVER w * LAG(x, 2) OVER w AS p
  FROM v WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), a AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_triples,
         CAST(SUM(p) AS BIGINT) AS s
  FROM lagd WHERE p IS NOT NULL GROUP BY 1
)
SELECT event_type, n_triples,
       CASE WHEN n_triples = 0 THEN NULL
            ELSE CAST(ROUND(CAST(s AS DOUBLE) / n_triples * 1000000, 0)
                 AS BIGINT) END AS c3_x1e6
FROM a ORDER BY 1
"""


# ---------------------------------------------------------------------------
# spectral flatness of the 24-hour diurnal profile
# ---------------------------------------------------------------------------


def q_spectral_flatness_24(sf_dir):
    """Per event type: the spectral flatness (Wiener entropy) of the
    24-point diurnal mean profile — geometric over arithmetic mean of
    the DFT power at frequencies k = 1..11 (flatness near 1 = white/flat
    profile, near 0 = one dominant periodicity; the scalar that says
    whether hour-of-day modeling is worth its cost). Hour means divide
    identical exact integers; the DFT fold mirrors COS/SIN expressions
    term-for-term (ulp noise well inside the snap); NULL unless all 24
    hours are populated and every power is positive. x1e6 snap."""
    cells = _hour_cells(sf_dir, with_day=False)
    if not len(cells) or "event_type" not in cells.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "flatness_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "flatness_x1e6": []}
    for et, g in cells.sort_values(["event_type", "h"]).groupby(
        "event_type", sort=True
    ):
        out["event_type"].append(et)
        if len(g) != 24:
            out["flatness_x1e6"].append(None)
            continue
        g = g.sort_values("h", ignore_index=True)
        m = g["s"].to_numpy(dtype=np.float64) / g["c"].to_numpy(dtype=np.int64)
        h = np.arange(24, dtype=np.float64)
        powers = []
        for k in range(1, 12):
            ang = 2.0 * np.pi * k * h / 24.0
            re = float(np.sum(m * np.cos(ang)))
            im = float(np.sum(m * np.sin(ang)))
            powers.append(re * re + im * im)
        p = np.array(powers)
        if np.any(p <= 0.0):
            out["flatness_x1e6"].append(None)
            continue
        flat = float(np.exp(np.sum(np.log(p)) / 11.0) / (np.sum(p) / 11.0))
        out["flatness_x1e6"].append(
            int(_round_half_away(np.array([flat * 1e6]))[0])
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "flatness_x1e6": pa.array(out["flatness_x1e6"], pa.int64()),
        }
    )


FLATNESS_SQL = """
WITH cell AS MATERIALIZED (
  SELECT event_type, hour(ts) AS h,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), m AS MATERIALIZED (
  SELECT event_type, h, CAST(s AS DOUBLE) / c AS y FROM cell
), nh AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k FROM m GROUP BY 1
), dft AS MATERIALIZED (
  SELECT m.event_type, ks.k,
         SUM(m.y * COS(2.0 * PI() * ks.k * m.h / 24.0)) AS re,
         SUM(m.y * SIN(2.0 * PI() * ks.k * m.h / 24.0)) AS im
  FROM m CROSS JOIN (SELECT unnest(range(1, 12)) AS k) ks
  GROUP BY 1, 2
), p AS MATERIALIZED (
  SELECT event_type, re * re + im * im AS p FROM dft
), agg AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN p <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad,
         SUM(LN(CASE WHEN p > 0 THEN p ELSE 1 END)) AS slog,
         SUM(p) AS sp
  FROM p GROUP BY 1
)
SELECT nh.event_type,
       CASE WHEN nh.k <> 24 OR agg.bad > 0 THEN NULL
            ELSE CAST(ROUND(EXP(agg.slog / 11.0) / (agg.sp / 11.0)
                 * 1000000, 0) AS BIGINT) END AS flatness_x1e6
FROM nh LEFT JOIN agg ON agg.event_type = nh.event_type
ORDER BY 1
"""


def register_r4df(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "sax_daily_words": q_sax_daily_words,
            "c3_nonlinearity": q_c3_nonlinearity,
            "spectral_flatness_24": q_spectral_flatness_24,
        }
    )
    oracles.update(
        {
            "sax_daily_words": SAX_SQL,
            "c3_nonlinearity": C3_SQL,
            "spectral_flatness_24": FLATNESS_SQL,
        }
    )
