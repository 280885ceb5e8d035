"""Round-4 batch GL: transition timing, bloom-filter ground truth,
and seasonality-adjusted anomalies — the median transition time
for every (from, to) event-type pair in per-user streams (the
timing layer the Markov transition MATRIX drops), a MEASURED
bloom-filter false-positive rate (build the actual bitmap with
deterministic double hashing over distinct orderkeys, probe 10,000
known-absent keys, compare to the (1 - e^{-kn/m})^k theory), and
day-of-week-adjusted anomaly days (each day's z-score against its
OWN weekday's mean/sd — Mondays compare to Mondays, so weekend
dips stop masquerading as anomalies).

Exactness discipline: transition gaps are integer microseconds
with interpolated medians on both sides; bloom bit positions are
pure integer hashes (h1 = key*2654435761 mod m, h2 =
key*2246822519 mod m) and hit counts are exact; z-scores fold the
identical population-moment closed form per weekday."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _round_half_away,
)
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_BLOOM_M = 1 << 18
_BLOOM_A = 2_654_435_761
_BLOOM_B = 2_246_822_519
_BLOOM_PROBES = 10_000


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_TT_COLS = ["from_type", "to_type", "n_transitions",
            "median_gap_ms_x1e3"]


def q_transition_time_medians(sf_dir):
    """Median transition time per (from, to) event-type pair over
    consecutive events within each user's (ts, event_id)-ordered
    stream — the Markov matrix says WHERE streams go, this says
    HOW FAST, and asymmetries (click->error fast, error->click
    slow) expose retry loops.  Gaps fold as exact integer
    microseconds in user-disjoint shards; the per-pair median is
    the interpolated convention."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts", "event_id", "event_type"))
        t = pa.table({
            "user_id": b["user_id"],
            "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_id": b["event_id"],
            "event_type": b["event_type"],
        })
        return add_bucket(t, "user_id", 64)

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "from_type": pd.Series([], dtype=object),
            "to_type": pd.Series([], dtype=object),
            "gap": pd.Series([], dtype=np.int64),
        })
        if len(g) < 2:
            return empty
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy()
        us = g["us"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        return pd.DataFrame({
            "from_type": et[:-1][same],
            "to_type": et[1:][same],
            "gap": (us[1:] - us[:-1])[same],
        })

    pairs = (
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(gaps, batch_format="pandas")
        .to_pandas()
    )
    if "from_type" not in pairs.columns or len(pairs) == 0:
        return pa.table({
            "from_type": pa.array([], pa.string()),
            "to_type": pa.array([], pa.string()),
            "n_transitions": pa.array([], pa.int64()),
            "median_gap_ms_x1e3": pa.array([], pa.int64()),
        })
    agg = pairs.groupby(["from_type", "to_type"]).agg(
        n=("gap", "size"),
        med=("gap", "median")).reset_index()
    agg = agg.sort_values(["from_type", "to_type"],
                          ignore_index=True)
    return pa.table({
        "from_type": pa.array(agg["from_type"], pa.string()),
        "to_type": pa.array(agg["to_type"], pa.string()),
        "n_transitions": pa.array(agg["n"].to_numpy(np.int64)),
        "median_gap_ms_x1e3": pa.array(
            [_round_half_away(v / 1e3 * 1e3) for v in agg["med"]],
            pa.int64()),
    })


TRANSITION_SQL = """
WITH e AS MATERIALIZED (
  SELECT user_id, event_type, EPOCH_US(ts) AS us, event_id
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL
), tr AS MATERIALIZED (
  SELECT LAG(event_type) OVER w AS from_type,
         event_type AS to_type,
         us - LAG(us) OVER w AS gap
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
)
SELECT from_type, to_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions,
       CAST(ROUND(MEDIAN(CAST(gap AS DOUBLE)) / 1000.0 * 1000,
            0) AS BIGINT) AS median_gap_ms_x1e3
FROM tr WHERE from_type IS NOT NULL
GROUP BY 1, 2 ORDER BY from_type, to_type
"""

_BLOOM_COLS = ["n_keys", "m_bits", "bits_set", "n_probes",
               "false_pos", "measured_fpp_ppm", "theory_fpp_ppm"]


def q_bloom_measured_fpp(sf_dir):
    """Ground-truth bloom-filter audit: insert every distinct
    lineitem orderkey into an m = 2^18-bit filter with the
    deterministic double hash (key * 2654435761 mod m, key *
    2246822519 mod m), probe the 10,000 keys just above the max
    (guaranteed absent), and report the measured false-positive
    rate against (1 - e^{-kn/m})^k — the gap is what theory hides
    about hash clustering on real key distributions.  Distinct
    keys and bit positions fold distributed; probing is one
    vectorized membership check."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"])

    def keys_part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["l_orderkey"]))
        g = b.select(["l_orderkey"]).group_by(
            ["l_orderkey"]).aggregate([])
        return g

    def keys_distinct(b: pa.Table) -> pa.Table:
        return b.select(["l_orderkey"]).group_by(
            ["l_orderkey"]).aggregate([])

    kd = tree_merge(
        li.map_batches(keys_part, batch_format="pyarrow",
                       batch_size=None),
        keys_distinct,
        final_shards=8,
        shard_cols=["l_orderkey"],
    ).to_pandas()
    if "l_orderkey" not in kd.columns or len(kd) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BLOOM_COLS})
    keys = kd["l_orderkey"].to_numpy(np.int64)
    n = len(keys)
    h1 = (keys * _BLOOM_A) % _BLOOM_M
    h2 = (keys * _BLOOM_B) % _BLOOM_M
    bits = np.zeros(_BLOOM_M, dtype=bool)
    bits[h1] = True
    bits[h2] = True
    bits_set = int(bits.sum())
    kmax = int(keys.max())
    probes = np.arange(kmax + 1, kmax + 1 + _BLOOM_PROBES,
                       dtype=np.int64)
    p1 = (probes * _BLOOM_A) % _BLOOM_M
    p2 = (probes * _BLOOM_B) % _BLOOM_M
    fp = int((bits[p1] & bits[p2]).sum())
    theory = (1.0 - np.exp(-2.0 * n / _BLOOM_M)) ** 2
    return pa.table({
        "n_keys": pa.array([n], pa.int64()),
        "m_bits": pa.array([_BLOOM_M], pa.int64()),
        "bits_set": pa.array([bits_set], pa.int64()),
        "n_probes": pa.array([_BLOOM_PROBES], pa.int64()),
        "false_pos": pa.array([fp], pa.int64()),
        "measured_fpp_ppm": pa.array(
            [_round_half_away(fp / _BLOOM_PROBES * 1e6)],
            pa.int64()),
        "theory_fpp_ppm": pa.array(
            [_round_half_away(float(theory) * 1e6)], pa.int64()),
    })


BLOOM_SQL = f"""
WITH dk AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS key FROM lineitem
  WHERE l_orderkey IS NOT NULL
), nfo AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MAX(key) AS BIGINT) AS kmax
  FROM dk
), setbits AS MATERIALIZED (
  SELECT DISTINCT bit FROM (
    SELECT (key * {_BLOOM_A}) % {_BLOOM_M} AS bit FROM dk
    UNION ALL
    SELECT (key * {_BLOOM_B}) % {_BLOOM_M} FROM dk
  )
), probes AS MATERIALIZED (
  SELECT nfo.kmax + 1 + r.k AS p
  FROM range(0, {_BLOOM_PROBES}) r(k) CROSS JOIN nfo
), hits AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS fp
  FROM probes
  WHERE EXISTS (SELECT 1 FROM setbits
                WHERE bit = (p * {_BLOOM_A}) % {_BLOOM_M})
    AND EXISTS (SELECT 1 FROM setbits
                WHERE bit = (p * {_BLOOM_B}) % {_BLOOM_M})
)
SELECT nfo.n AS n_keys,
       CAST({_BLOOM_M} AS BIGINT) AS m_bits,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM setbits)
         AS bits_set,
       CAST({_BLOOM_PROBES} AS BIGINT) AS n_probes,
       hits.fp AS false_pos,
       CAST(ROUND(CAST(hits.fp AS DOUBLE) / {_BLOOM_PROBES}
            * 1000000, 0) AS BIGINT) AS measured_fpp_ppm,
       CAST(ROUND(POW(1.0 - EXP(-2.0 * nfo.n / {_BLOOM_M}), 2)
            * 1000000, 0) AS BIGINT) AS theory_fpp_ppm
FROM nfo CROSS JOIN hits
WHERE nfo.n > 0
"""

_DOWA_COLS = ["day", "dow", "cnt", "z_x1e3", "flagged"]


def q_dow_adjusted_anomaly_days(sf_dir):
    """Day-of-week-adjusted anomaly scan: each calendar day's
    total event count scored against the population mean/sd of ITS
    OWN weekday (Mondays vs Mondays) — the adjustment that stops
    ordinary weekend dips from drowning real anomalies; days with
    |z| > 2 are flagged.  Daily counts fold in one distributed
    pass; the per-weekday moments are mirrored closed forms."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({"day": pc.divide(us, _DAY_US)})
        g = t.group_by(["day"]).aggregate([([], "count_all")])
        return g.rename_columns(["day", "c"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["day"]).aggregate([("c", "sum")])
        return g.rename_columns(["day", "c"])

    dc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "day" not in dc.columns or len(dc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DOWA_COLS})
    dc = dc.sort_values("day", ignore_index=True)
    day = dc["day"].to_numpy(np.int64)
    c = dc["c"].to_numpy(np.int64).astype(np.float64)
    dow = (day + 4) % 7
    out = {k: [] for k in _DOWA_COLS}
    for d in range(7):
        m = dow == d
        if m.sum() < 2:
            continue
        mu = c[m].mean()
        sd = np.sqrt(((c[m] - mu) ** 2).mean())
        if sd == 0:
            continue
        z = (c[m] - mu) / sd
        for dd, cc_, zz in zip(day[m], c[m], z):
            out["day"].append(int(dd))
            out["dow"].append(d)
            out["cnt"].append(int(cc_))
            out["z_x1e3"].append(_round_half_away(zz * 1e3))
            out["flagged"].append(int(abs(zz) > 2.0))
    order = np.argsort(out["day"], kind="mergesort")
    return pa.table({
        k: pa.array([out[k][i] for i in order], pa.int64())
        for k in _DOWA_COLS})


DOWA_SQL = f"""
WITH dc AS MATERIALIZED (
  SELECT EPOCH_US(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1
), dd AS MATERIALIZED (
  SELECT day, c, (day + 4) % 7 AS dow FROM dc
), mu_t AS MATERIALIZED (
  SELECT dow, AVG(CAST(c AS DOUBLE)) AS mu,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM dd GROUP BY 1
), sd_t AS MATERIALIZED (
  SELECT dd.dow,
         SQRT(AVG((CAST(dd.c AS DOUBLE) - mu_t.mu)
                  * (CAST(dd.c AS DOUBLE) - mu_t.mu))) AS sd
  FROM dd JOIN mu_t USING (dow)
  GROUP BY 1
)
SELECT CAST(dd.day AS BIGINT) AS day,
       CAST(dd.dow AS BIGINT) AS dow,
       dd.c AS cnt,
       CAST(ROUND((CAST(dd.c AS DOUBLE) - mu_t.mu) / sd_t.sd
            * 1000, 0) AS BIGINT) AS z_x1e3,
       CAST(CASE WHEN ABS((CAST(dd.c AS DOUBLE) - mu_t.mu)
                          / sd_t.sd) > 2.0
                 THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM dd
JOIN mu_t USING (dow)
JOIN sd_t USING (dow)
WHERE mu_t.n >= 2 AND sd_t.sd <> 0
ORDER BY day
"""


def register_r4gl(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "transition_time_medians": q_transition_time_medians,
            "bloom_measured_fpp": q_bloom_measured_fpp,
            "dow_adjusted_anomaly_days":
                q_dow_adjusted_anomaly_days,
        }
    )
    oracles.update(
        {
            "transition_time_medians": TRANSITION_SQL,
            "bloom_measured_fpp": BLOOM_SQL,
            "dow_adjusted_anomaly_days": DOWA_SQL,
        }
    )
