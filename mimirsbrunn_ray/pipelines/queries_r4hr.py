"""Round-4 batch HR: signed-value hygiene, wake-up rhythms, and
length drift — the negative-value share per event type (refunds
and corrections hiding inside 'value'; any nonzero share makes
plain sums lie), the daily first-activity hour profile (when each
user's day STARTS — the wake-up histogram plus circular mean,
sharper than raw hour-of-day which mixes whole sessions), and
doc-length drift between each source's doc_id halves (median
length h1 vs h2 — are later ingests systematically longer — the
final member of the ingestion-drift trilogy after vocabulary and
language mix).

Exactness discipline: counts and value sums fold exactly (sums
snapped x1e3); first-activity extraction is an exact per-(user,
day) min; medians are interpolated on both engines."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _HOUR_US,
    _round_half_away,
)
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_NVS_COLS = ["event_type", "n_events", "n_negative",
             "negative_ppm", "neg_sum_x1e3"]


def q_negative_value_share(sf_dir):
    """Signed-value hygiene per event type: the count and share of
    STRICTLY negative values plus their summed magnitude — any
    nonzero share means 'value' mixes refunds/corrections with
    revenue and every plain SUM over it silently nets the two.
    Counts and sums fold exactly."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "value"))
        v = b["value"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        neg = v < 0
        t = pa.table({
            "event_type": b["event_type"],
            "n": pa.array(np.ones(len(v), np.int64)),
            "nn": pa.array(neg.astype(np.int64)),
            "ns": pa.array(np.where(neg, v, 0.0)),
        })
        g = t.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("nn", "sum"), ("ns", "sum")])
        return g.rename_columns(["event_type", "n", "nn", "ns"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("nn", "sum"), ("ns", "sum")])
        return g.rename_columns(["event_type", "n", "nn", "ns"])

    cc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _NVS_COLS[1:]},
        })
    cc = cc.sort_values("event_type", ignore_index=True)
    keep = cc["n"].astype(np.int64) > 0
    cc = cc[keep]
    return pa.table({
        "event_type": pa.array(cc["event_type"], pa.string()),
        "n_events": pa.array(cc["n"].to_numpy(np.int64)),
        "n_negative": pa.array(cc["nn"].to_numpy(np.int64)),
        "negative_ppm": pa.array(
            [_round_half_away(nn / n * 1e6)
             for nn, n in zip(cc["nn"].astype(np.int64),
                              cc["n"].astype(np.int64))],
            pa.int64()),
        "neg_sum_x1e3": pa.array(
            [_round_half_away(s * 1e3) for s in cc["ns"]],
            pa.int64()),
    })


NVS_SQL = """
WITH e AS MATERIALIZED (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN CAST(value AS DOUBLE) < 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS nn,
         SUM(CASE WHEN CAST(value AS DOUBLE) < 0
                  THEN CAST(value AS DOUBLE) ELSE 0 END) AS ns
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
  GROUP BY 1
)
SELECT event_type,
       n AS n_events,
       nn AS n_negative,
       CAST(ROUND(CAST(nn AS DOUBLE) / n * 1000000, 0)
            AS BIGINT) AS negative_ppm,
       CAST(ROUND(ns * 1000, 0) AS BIGINT) AS neg_sum_x1e3
FROM e WHERE n > 0 ORDER BY event_type
"""

_DFA_COLS = ["hod", "n_user_days", "share_ppm"]


def q_daily_first_activity_hour(sf_dir):
    """Wake-up histogram: the hour-of-day of each user's FIRST
    event of each calendar day, across all (user, day) pairs — the
    day-START rhythm that raw hour-of-day histograms smear by
    counting whole sessions.  Per-(user, day) minima fold exactly;
    the 24-bin census is pure integers."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({
            "user_id": b["user_id"].cast(pa.int64()),
            "day": pc.divide(us, _DAY_US),
            "us": us,
        })
        g = t.group_by(["user_id", "day"]).aggregate(
            [("us", "min")])
        return g.rename_columns(["user_id", "day", "us"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id", "day"]).aggregate(
            [("us", "min")])
        return g.rename_columns(["user_id", "day", "us"])

    ud = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["user_id"],
    ).to_pandas()
    if "us" not in ud.columns or len(ud) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DFA_COLS})
    us = ud["us"].to_numpy(np.int64)
    hod = (us // _HOUR_US) % 24
    counts = np.bincount(hod, minlength=24).astype(np.int64)
    total = int(counts.sum())
    hods = np.flatnonzero(counts > 0)
    return pa.table({
        "hod": pa.array(hods.astype(np.int64)),
        "n_user_days": pa.array(counts[hods]),
        "share_ppm": pa.array(
            [_round_half_away(int(c) / total * 1e6)
             for c in counts[hods]], pa.int64()),
    })


DFA_SQL = f"""
WITH fd AS MATERIALIZED (
  SELECT user_id, EPOCH_US(ts) // {_DAY_US} AS day,
         MIN(EPOCH_US(ts)) AS us
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), h AS MATERIALIZED (
  SELECT (us // {_HOUR_US}) % 24 AS hod,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM fd GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS t FROM h
)
SELECT CAST(h.hod AS BIGINT) AS hod,
       h.n AS n_user_days,
       CAST(ROUND(CAST(h.n AS DOUBLE) / tot.t * 1000000, 0)
            AS BIGINT) AS share_ppm
FROM h CROSS JOIN tot
WHERE h.n > 0
ORDER BY hod
"""

_DLD_COLS = ["source", "n_h1", "n_h2", "med_len_h1_x1e3",
             "med_len_h2_x1e3", "ratio_ppm"]


def q_doclen_drift_halves(sf_dir):
    """Length drift per source: the median n_chars of documents in
    the lower versus upper doc_id half (split at the median
    distinct doc_id, as in the vocabulary and language drift
    forensics) — later ingests running systematically longer or
    shorter skews every per-source length normalization computed
    once and cached.  Medians are interpolated; the split is exact
    rank math."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["source", "doc_id", "n_chars"])

    meta = docs.map_batches(
        lambda b: _valid(
            b, ("source", "doc_id", "n_chars")).select(
            ["source", "doc_id"]).group_by(
            ["source", "doc_id"]).aggregate([]),
        batch_format="pyarrow", batch_size=None).to_pandas()
    if "source" not in meta.columns or len(meta) == 0:
        return pa.table({
            "source": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _DLD_COLS[1:]},
        })
    meta = meta.drop_duplicates()
    med_map = {}
    for src, g in meta.groupby("source"):
        ids = np.sort(g["doc_id"].to_numpy(np.int64),
                      kind="mergesort")
        med_map[src] = int(ids[(len(ids) - 1) // 2])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("source", "doc_id", "n_chars"))
        if b.num_rows == 0:
            return pa.table({
                "source": pa.array([], pa.string()),
                "half": pa.array([], pa.int64()),
                "len": pa.array([], pa.int64()),
            })
        src = b["source"].to_numpy(zero_copy_only=False)
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        meds = np.array([med_map.get(s, 0) for s in src],
                        dtype=np.int64)
        half = (did > meds).astype(np.int64) + 1
        return pa.table({
            "source": b["source"],
            "half": pa.array(half),
            "len": b["n_chars"].cast(pa.int64()),
        })

    hl = docs.map_batches(part, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if "source" not in hl.columns or len(hl) == 0:
        return pa.table({
            "source": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _DLD_COLS[1:]},
        })
    out = {c: [] for c in _DLD_COLS}
    for src, g in hl.groupby("source", sort=True):
        h1 = g[g["half"] == 1]["len"].to_numpy(np.int64)
        h2 = g[g["half"] == 2]["len"].to_numpy(np.int64)
        if len(h1) == 0 or len(h2) == 0:
            continue
        m1 = float(np.percentile(h1, 50))
        m2 = float(np.percentile(h2, 50))
        if m1 == 0:
            continue
        out["source"].append(src)
        out["n_h1"].append(len(h1))
        out["n_h2"].append(len(h2))
        out["med_len_h1_x1e3"].append(
            _round_half_away(m1 * 1e3))
        out["med_len_h2_x1e3"].append(
            _round_half_away(m2 * 1e3))
        out["ratio_ppm"].append(
            _round_half_away(m2 / m1 * 1e6))
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _DLD_COLS[1:]},
    })


DLD_SQL = """
WITH ids AS MATERIALIZED (
  SELECT DISTINCT source, doc_id FROM documents
  WHERE source IS NOT NULL AND doc_id IS NOT NULL
    AND n_chars IS NOT NULL
), med AS MATERIALIZED (
  SELECT source, doc_id AS med
  FROM (SELECT source, doc_id,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM ids)
  WHERE rn = (n + 1) // 2
), hl AS MATERIALIZED (
  SELECT d.source,
         CASE WHEN d.doc_id > med.med THEN 2 ELSE 1 END AS half,
         CAST(d.n_chars AS DOUBLE) AS len
  FROM documents d JOIN med ON med.source = d.source
  WHERE d.source IS NOT NULL AND d.doc_id IS NOT NULL
    AND d.n_chars IS NOT NULL
), agg AS (
  SELECT source,
         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN half = 2 THEN 1 ELSE 0 END)
              AS BIGINT) AS n2,
         MEDIAN(CASE WHEN half = 1 THEN len END) AS m1,
         MEDIAN(CASE WHEN half = 2 THEN len END) AS m2
  FROM hl GROUP BY 1
)
SELECT source,
       n1 AS n_h1,
       n2 AS n_h2,
       CAST(ROUND(m1 * 1000, 0) AS BIGINT) AS med_len_h1_x1e3,
       CAST(ROUND(m2 * 1000, 0) AS BIGINT) AS med_len_h2_x1e3,
       CAST(ROUND(m2 / m1 * 1000000, 0) AS BIGINT) AS ratio_ppm
FROM agg
WHERE n1 > 0 AND n2 > 0 AND m1 <> 0
ORDER BY source
"""


def register_r4hr(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "negative_value_share": q_negative_value_share,
            "daily_first_activity_hour": q_daily_first_activity_hour,
            "doclen_drift_halves": q_doclen_drift_halves,
        }
    )
    oracles.update(
        {
            "negative_value_share": NVS_SQL,
            "daily_first_activity_hour": DFA_SQL,
            "doclen_drift_halves": DLD_SQL,
        }
    )
