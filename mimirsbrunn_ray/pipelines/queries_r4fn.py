"""Round-4 batch FN: frame bit-packing, streaming changepoint, and
compositional drift — FOR/bit-packing frame cost of each type's
minute-gap stream (128-gap frames at the frame-max bit width, the
FastPFOR-style layout), the Page-Hinkley statistic over hourly
counts (the classic streaming mean-shift detector with its running
mean), and Aitchison CLR drift of the daily type composition
(log-ratio geometry, Laplace +1 smoothed).

Exactness discipline: frame widths are bit_length(max gap) matched
in SQL by LENGTH(BIN(...)) and all byte math is integer; Page-
Hinkley folds mirrored double running means/cumsums and snaps at
x1e3 (well above windowed-sum association noise); CLR uses the
identical ln(c+1) smoothing and per-day centering on both sides."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mimirsbrunn_ray.pipelines.queries_r4fj import (
    _distinct_type_minutes,
)
from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _HOUR_US,
    _round_half_away,
    _type_cell_counts,
)
from mimirsbrunn_ray.pipelines.queries_r4fl import (
    _dense_hour_counts,
)
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

_FRAME = 128
_FRAME_HDR_BITS = 8


_BP_COLS = ["event_type", "n_gaps", "n_frames", "total_bits",
            "bits_per_gap_ppm"]


def q_bitpack_frame_bits(sf_dir):
    """FOR/bit-packing cost census per event type: split the sorted
    minute-gap stream into 128-gap frames, pack each frame at the
    bit width of its largest gap (8-bit width header per frame) —
    the frame-of-reference layout columnar stores and FastPFOR use.
    Reports frames, total bits and bits/gap; contrast with the
    Rice plan to see where outlier gaps blow up a whole frame.
    One distinct shuffle; types are bucketed whole and the frame
    scan is a reduceat over the gap array."""
    tm = _distinct_type_minutes(sf_dir)

    def project(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "event_type" not in b.column_names:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "minute": pa.array([], pa.int64()),
                _BUCKET: pa.array([], pa.int64()),
            })
        return add_bucket(b.select(["event_type", "minute"]),
                          "event_type", 8)

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "event_type": pd.Series([], dtype=object),
            "n_gaps": pd.Series([], dtype=np.int64),
            "n_frames": pd.Series([], dtype=np.int64),
            "total_bits": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        g = g.sort_values(["event_type", "minute"],
                          kind="mergesort", ignore_index=True)
        et = g["event_type"].to_numpy()
        m = g["minute"].to_numpy(dtype=np.int64)
        out = {"event_type": [], "n_gaps": [], "n_frames": [],
               "total_bits": []}
        brk = np.ones(len(g), dtype=bool)
        brk[1:] = et[1:] != et[:-1]
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(g))
        for s, e in zip(starts, ends):
            gaps = np.diff(m[s:e])
            n = len(gaps)
            if n == 0:
                continue
            fidx = np.arange(n) // _FRAME
            nf = int(fidx[-1]) + 1
            fstarts = np.arange(nf) * _FRAME
            fmax = np.maximum.reduceat(gaps, fstarts)
            fcnt = np.diff(np.append(fstarts, n))
            widths = np.array(
                [int(v).bit_length() for v in fmax], np.int64)
            bits = int((fcnt * widths).sum()) \
                + nf * _FRAME_HDR_BITS
            out["event_type"].append(et[s])
            out["n_gaps"].append(n)
            out["n_frames"].append(nf)
            out["total_bits"].append(bits)
        df = pd.DataFrame(out)
        for c in ["n_gaps", "n_frames", "total_bits"]:
            df[c] = df[c].astype(np.int64)
        return df

    res = (
        tm.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(pack, batch_format="pandas")
        .to_pandas()
    )
    if "event_type" not in res.columns or len(res) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _BP_COLS[1:]},
        })
    res = res.sort_values("event_type", ignore_index=True)
    ppm = [
        _round_half_away(b / n * 1e6)
        for b, n in zip(res["total_bits"].astype(np.int64),
                        res["n_gaps"].astype(np.int64))
    ]
    return pa.table({
        "event_type": pa.array(res["event_type"], pa.string()),
        "n_gaps": pa.array(res["n_gaps"].to_numpy(np.int64)),
        "n_frames": pa.array(res["n_frames"].to_numpy(np.int64)),
        "total_bits": pa.array(
            res["total_bits"].to_numpy(np.int64)),
        "bits_per_gap_ppm": pa.array(ppm, pa.int64()),
    })


BITPACK_SQL = f"""
WITH dm AS MATERIALIZED (
  SELECT DISTINCT event_type, EPOCH_US(ts) // 60000000 AS m
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
), gp AS MATERIALIZED (
  SELECT event_type,
         m - LAG(m) OVER (PARTITION BY event_type ORDER BY m)
           AS gap,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY m)
           AS rn
  FROM dm
), gg AS MATERIALIZED (
  SELECT event_type, gap, (rn - 2) // {_FRAME} AS frame
  FROM gp WHERE gap IS NOT NULL
), fr AS MATERIALIZED (
  SELECT event_type, frame,
         CAST(COUNT(*) AS BIGINT) AS n_in_frame,
         CAST(MAX(gap) AS BIGINT) AS max_gap
  FROM gg GROUP BY 1, 2
), fb AS (
  SELECT event_type, n_in_frame,
         CASE WHEN max_gap = 0 THEN 0
              ELSE LENGTH(BIN(max_gap)) END AS width
  FROM fr
)
SELECT event_type,
       CAST(SUM(n_in_frame) AS BIGINT) AS n_gaps,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(n_in_frame * width)
            + COUNT(*) * {_FRAME_HDR_BITS} AS BIGINT)
         AS total_bits,
       CAST(ROUND(CAST(SUM(n_in_frame * width)
                       + COUNT(*) * {_FRAME_HDR_BITS} AS DOUBLE)
            / SUM(n_in_frame) * 1000000, 0) AS BIGINT)
         AS bits_per_gap_ppm
FROM fb GROUP BY event_type ORDER BY event_type
"""


def q_page_hinkley_hourly(sf_dir):
    """Page-Hinkley mean-INCREASE statistic per event type over the
    dense hourly count grid: m_t = sum_{i<=t}(x_i - mu_i) with mu_i
    the running mean of x_1..x_i, PH = max_t (m_t - min_{s<=t} m_s)
    and the hour where that max is first attained — the canonical
    streaming changepoint detector (zero allowance delta).  Counts
    are one distributed pass; the sequential scan runs on the tiny
    grid."""
    g = _dense_hour_counts(sf_dir)
    cols = ["event_type", "n_hours", "ph_x1e3", "argmax_hour"]
    if g is None:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in cols[1:]},
        })
    out = {c: [] for c in cols}
    for et, sub in g.groupby("event_type", sort=True):
        sub = sub.sort_values("hour")
        c = sub["c"].to_numpy(np.float64)
        h = sub["hour"].to_numpy(np.int64)
        T = len(c)
        if T == 0:
            continue
        mu = np.cumsum(c) / np.arange(1, T + 1)
        m = np.cumsum(c - mu)
        runmin = np.minimum.accumulate(m)
        ph = m - runmin
        i = int(np.argmax(ph))  # first max
        out["event_type"].append(et)
        out["n_hours"].append(T)
        out["ph_x1e3"].append(_round_half_away(ph[i] * 1e3))
        out["argmax_hour"].append(int(h[i]))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
    })


PAGE_HINKLEY_SQL = f"""
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
), mseq AS MATERIALIZED (
  SELECT event_type, hour,
         SUM(c - mu) OVER (PARTITION BY event_type ORDER BY hour
                           ROWS UNBOUNDED PRECEDING) AS m,
         COUNT(*) OVER (PARTITION BY event_type) AS n_hours
  FROM (SELECT event_type, hour, c,
               AVG(c) OVER (PARTITION BY event_type ORDER BY hour
                            ROWS UNBOUNDED PRECEDING) AS mu
        FROM grid)
), ph AS MATERIALIZED (
  SELECT event_type, hour, n_hours,
         m - MIN(m) OVER (PARTITION BY event_type ORDER BY hour
                          ROWS UNBOUNDED PRECEDING) AS s
  FROM mseq
), mx AS MATERIALIZED (
  SELECT event_type, MAX(s) AS smax,
         CAST(ANY_VALUE(n_hours) AS BIGINT) AS n_hours
  FROM ph GROUP BY 1
)
SELECT ph.event_type,
       ANY_VALUE(mx.n_hours) AS n_hours,
       CAST(ROUND(ANY_VALUE(mx.smax) * 1000, 0) AS BIGINT)
         AS ph_x1e3,
       CAST(MIN(ph.hour) AS BIGINT) AS argmax_hour
FROM ph JOIN mx USING (event_type)
WHERE ph.s = mx.smax
GROUP BY ph.event_type ORDER BY ph.event_type
"""


def q_clr_day_drift(sf_dir):
    """Aitchison centered-log-ratio drift of the daily event-type
    composition: per day, clr_i = ln(c_i + 1) - mean_j ln(c_j + 1)
    over the global type set (Laplace +1 admits zeros); the drift
    between consecutive days is the Euclidean norm of the CLR
    difference — the scale-free compositional change measure (raw
    share deltas are distorted by the simplex geometry).  One
    distributed (day, type) count pass; the drift scan is tiny
    driver math."""
    cc = _type_cell_counts(sf_dir, "day", _DAY_US, None)
    cols = ["day", "n_types", "drift_x1e6"]
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in cols})
    types = sorted(cc["event_type"].unique())
    days = sorted(cc["day"].astype(np.int64).unique())
    grid = pd.MultiIndex.from_product(
        [days, types], names=["day", "event_type"]
    ).to_frame(index=False)
    g = grid.merge(cc, on=["day", "event_type"], how="left")
    g["c"] = g["c"].fillna(0).astype(np.int64)
    piv = g.pivot_table(index="day", columns="event_type",
                        values="c", aggfunc="sum", fill_value=0)
    m = np.log(piv.to_numpy(np.float64) + 1.0)
    clr = m - m.mean(axis=1, keepdims=True)
    rows = {c: [] for c in cols}
    day_idx = list(piv.index)
    for i in range(len(day_idx) - 1):
        if day_idx[i + 1] != day_idx[i] + 1:
            continue
        d = clr[i + 1] - clr[i]
        rows["day"].append(int(day_idx[i]))
        rows["n_types"].append(len(types))
        rows["drift_x1e6"].append(
            _round_half_away(float(np.sqrt((d * d).sum())) * 1e6))
    return pa.table(
        {c: pa.array(rows[c], pa.int64()) for c in cols})


CLR_DRIFT_SQL = f"""
WITH dc AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), grid AS MATERIALIZED (
  SELECT t.event_type, d.day, COALESCE(dc.c, 0) AS c
  FROM (SELECT DISTINCT event_type FROM dc) t
  CROSS JOIN (SELECT DISTINCT day FROM dc) d
  LEFT JOIN dc ON dc.event_type = t.event_type
              AND dc.day = d.day
), clr AS MATERIALIZED (
  SELECT event_type, day,
         LN(CAST(c AS DOUBLE) + 1.0)
           - AVG(LN(CAST(c AS DOUBLE) + 1.0))
               OVER (PARTITION BY day) AS v,
         COUNT(*) OVER (PARTITION BY day) AS n_types
  FROM grid
)
SELECT CAST(a.day AS BIGINT) AS day,
       CAST(ANY_VALUE(a.n_types) AS BIGINT) AS n_types,
       CAST(ROUND(SQRT(SUM((b.v - a.v) * (b.v - a.v)))
            * 1000000, 0) AS BIGINT) AS drift_x1e6
FROM clr a
JOIN clr b ON b.event_type = a.event_type
          AND b.day = a.day + 1
GROUP BY a.day ORDER BY day
"""


def register_r4fn(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "bitpack_frame_bits": q_bitpack_frame_bits,
            "page_hinkley_hourly": q_page_hinkley_hourly,
            "clr_day_drift": q_clr_day_drift,
        }
    )
    oracles.update(
        {
            "bitpack_frame_bits": BITPACK_SQL,
            "page_hinkley_hourly": PAGE_HINKLEY_SQL,
            "clr_day_drift": CLR_DRIFT_SQL,
        }
    )
