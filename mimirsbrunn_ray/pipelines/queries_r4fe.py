"""Round-4 batch FE: three tier-chain invariants, the audits that
gate the raw -> 1m -> 1h -> 1d continuous-aggregate path itself —
(1) rollup COMMUTATIVITY: re-aggregating the 1m tier to 1h must
reproduce the direct raw -> 1h rollup bit-for-bit (count/sum/min/
max are associative, so any divergence is an engine bug; the audit
computes BOTH paths independently and emits per-(type, hour)
matched flags), (2) the late-data invalidation surface: how many 1m
buckets per type still sit inside the allowed-lateness horizon of
the corpus watermark (max ts - 15 min) — the slices a straggler
would force the tier chain to recompute, and (3) varint
delta-encoding byte cost of the timestamp column at raw / 1m / 1h
granularity per type — the storage-planning numbers behind the
tier layout (LEB128 bytes = ceil(bits/7) of each sorted delta).

Exactness discipline: both rollup paths fold exact int64
count/sum(x100)/min/max partials; lateness is integer microsecond
arithmetic; varint byte counts use bits = FLOOR(LOG2(v)) + 1 on
exact ints (log2 of an exact power of two is exact in both
engines) with v = 0 -> 1 byte."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_MIN_US = 60_000_000
_HOUR_US = 3_600_000_000
_LATENESS_US = 900_000_000  # 15 min


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _rollup(sf_dir, unit_us: int) -> pd.DataFrame:
    """Exact (event_type, bucket) count/sum/min/max directly from
    raw events — one streaming pass, tree-merged."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        bk = (us.to_numpy(zero_copy_only=False)
              // unit_us).astype(np.int64)
        vx = np.floor(
            b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "bk": pa.array(bk),
                "c": pa.array(np.ones(len(bk), np.int64)),
                "s": pa.array(vx),
                "lo": pa.array(vx),
                "hi": pa.array(vx),
            }
        )
        g = t.group_by(["event_type", "bk"]).aggregate(
            [("c", "sum"), ("s", "sum"), ("lo", "min"),
             ("hi", "max")]
        )
        return g.rename_columns(
            ["event_type", "bk", "c", "s", "lo", "hi"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "bk"]).aggregate(
            [("c", "sum"), ("s", "sum"), ("lo", "min"),
             ("hi", "max")]
        )
        return g.rename_columns(
            ["event_type", "bk", "c", "s", "lo", "hi"]
        )

    from mimirsbrunn_ray.stages.broadcast import ensure_cols

    return ensure_cols(
        tree_merge(
            ev.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
            combine,
            final_shards=8,
            shard_cols=["event_type", "bk"],
        ).to_pandas(),
        ["event_type", "bk", "c", "s", "lo", "hi"],
    )


def q_tier_rollup_commutativity(sf_dir):
    """raw->1h vs (raw->1m)->1h per (event_type, hour): both paths
    computed INDEPENDENTLY (two scans), then compared column by
    column — matched must be 1 everywhere or the tier chain's
    associativity contract is broken."""
    direct = _rollup(sf_dir, _HOUR_US)
    m1 = _rollup(sf_dir, _MIN_US)
    if len(m1):
        m1["bk"] = (m1["bk"] * _MIN_US) // _HOUR_US
        via = m1.groupby(["event_type", "bk"], sort=True).agg(
            c=("c", "sum"), s=("s", "sum"), lo=("lo", "min"),
            hi=("hi", "max"),
        ).reset_index()
    else:
        via = m1
    d = direct.set_index(["event_type", "bk"]).sort_index()
    v = via.set_index(["event_type", "bk"]).sort_index()
    assert len(d) == len(v)
    matched = (
        (d["c"] == v["c"]) & (d["s"] == v["s"])
        & (d["lo"] == v["lo"]) & (d["hi"] == v["hi"])
    ).astype(np.int64)
    out = d.reset_index()
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "h": pa.array(out["bk"].to_numpy(dtype=np.int64)),
            "n": pa.array(out["c"].to_numpy(dtype=np.int64)),
            "sum_x100": pa.array(out["s"].to_numpy(dtype=np.int64)),
            "min_x100": pa.array(
                out["lo"].to_numpy(dtype=np.int64)
            ),
            "max_x100": pa.array(
                out["hi"].to_numpy(dtype=np.int64)
            ),
            "matched": pa.array(matched.to_numpy(dtype=np.int64)),
        }
    )


COMMUT_SQL = f"""
WITH raw1h AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / {_HOUR_US}) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS sum_x100,
         CAST(MIN(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS min_x100,
         CAST(MAX(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS max_x100
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL
  GROUP BY 1, 2
), m1 AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / {_MIN_US}) AS BIGINT) AS mb,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS s,
         CAST(MIN(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS lo,
         CAST(MAX(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS hi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL
  GROUP BY 1, 2
), via1m AS MATERIALIZED (
  SELECT event_type,
         CAST((mb * {_MIN_US}) // {_HOUR_US} AS BIGINT) AS h,
         CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(s) AS BIGINT) AS sum_x100,
         CAST(MIN(lo) AS BIGINT) AS min_x100,
         CAST(MAX(hi) AS BIGINT) AS max_x100
  FROM m1 GROUP BY 1, 2
)
SELECT r.event_type, r.h, r.n, r.sum_x100, r.min_x100, r.max_x100,
       CASE WHEN v.n = r.n AND v.sum_x100 = r.sum_x100
            AND v.min_x100 = r.min_x100 AND v.max_x100 = r.max_x100
       THEN 1 ELSE 0 END AS matched
FROM raw1h r JOIN via1m v
  ON v.event_type = r.event_type AND v.h = r.h
ORDER BY r.event_type, r.h
"""


def q_late_open_buckets(sf_dir):
    """Per event type: 1m buckets that still intersect the
    allowed-lateness horizon [watermark - 15 min, watermark] where
    watermark = global max event time — the tier slices a straggler
    could still invalidate, plus the rows inside the horizon. One
    scan for the watermark folds with the bucket partials."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        usv = us.to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "mb": pa.array((usv // _MIN_US).astype(np.int64)),
                "c": pa.array(np.ones(len(usv), np.int64)),
                "mx": pa.array(usv),
            }
        )
        g = t.group_by(["event_type", "mb"]).aggregate(
            [("c", "sum"), ("mx", "max")]
        )
        return g.rename_columns(["event_type", "mb", "c", "mx"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "mb"]).aggregate(
            [("c", "sum"), ("mx", "max")]
        )
        return g.rename_columns(["event_type", "mb", "c", "mx"])

    per = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow",
                       batch_size=None),
        combine,
    ).to_pandas()
    if len(per) == 0:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "open_buckets": pa.array([], pa.int64()),
                "open_rows": pa.array([], pa.int64()),
            }
        )
    wm = int(per["mx"].max())
    horizon = wm - _LATENESS_US
    # a 1m bucket [mb*60s, (mb+1)*60s) is open iff its end > horizon
    per["open"] = ((per["mb"] + 1) * _MIN_US > horizon).astype(
        np.int64
    )
    agg = per.groupby("event_type", sort=True).apply(
        lambda g: pd.Series(
            {
                "open_buckets": int(g["open"].sum()),
                "open_rows": int(g.loc[g["open"] == 1, "c"].sum()),
            }
        ),
        include_groups=False,
    ).reset_index()
    return pa.table(
        {
            "event_type": pa.array(agg["event_type"], pa.string()),
            "open_buckets": pa.array(
                agg["open_buckets"].to_numpy(dtype=np.int64)
            ),
            "open_rows": pa.array(
                agg["open_rows"].to_numpy(dtype=np.int64)
            ),
        }
    )


LATE_OPEN_SQL = f"""
WITH per AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / {_MIN_US}) AS BIGINT) AS mb,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), wm AS MATERIALIZED (
  SELECT MAX(EPOCH_US(ts)) AS w FROM events WHERE ts IS NOT NULL
)
SELECT event_type,
       CAST(SUM(CASE WHEN (mb + 1) * {_MIN_US} > w.w
                - {_LATENESS_US} THEN 1 ELSE 0 END) AS BIGINT)
         AS open_buckets,
       CAST(SUM(CASE WHEN (mb + 1) * {_MIN_US} > w.w
                - {_LATENESS_US} THEN c ELSE 0 END) AS BIGINT)
         AS open_rows
FROM per, wm w GROUP BY event_type ORDER BY event_type
"""


def q_varint_delta_bytes_by_tier(sf_dir):
    """Per (event_type, tier in raw/1m/1h): the LEB128 byte cost of
    delta-encoding the SORTED timestamp column at that granularity
    (distinct bucket starts for 1m/1h) — bytes(v) = ceil(bits/7),
    bits = floor(log2(v)) + 1, v = 0 -> 1 byte. The concrete
    storage-planning numbers behind the tier layout. Deltas within
    each type are computed from the exact distinct-bucket tables
    (dimension-scale after the fold), raw deltas from the per-type
    sorted microsecond column (bounded: the per-type stream fits
    the driver at audit granularity because it is the distinct-ts
    table, same bound as the hourly census family)."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table(
            {"event_type": b["event_type"], "us": us}
        )
        g = t.group_by(["event_type", "us"]).aggregate(
            [([], "count_all")]
        )
        return g.select(["event_type", "us"])

    def dedup(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "us"]).aggregate(
            [([], "count_all")]
        )
        return g.select(["event_type", "us"])

    ts = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow",
                       batch_size=None),
        dedup,
        final_shards=8,
        shard_cols=["event_type", "us"],
    ).to_pandas()

    def varint_bytes(vals: np.ndarray) -> int:
        if len(vals) == 0:
            return 0
        v = np.sort(np.unique(vals))
        d = np.diff(v)
        d = d[d > 0]
        nz = d.astype(np.float64)
        bits = np.floor(np.log2(nz)).astype(np.int64) + 1
        by = np.maximum(1, (bits + 6) // 7)
        # first value charged its own full varint
        f = int(v[0])
        fb = 1 if f <= 0 else int(
            max(1, (int(np.floor(np.log2(f))) + 1 + 6) // 7)
        )
        # zero deltas (duplicates removed by unique) cost nothing
        return int(by.sum()) + fb

    cols = ["event_type", "tier", "n_points", "varint_bytes"]
    out = {c: [] for c in cols}
    if len(ts):
        for et, g in ts.groupby("event_type", sort=True):
            us = g["us"].to_numpy(dtype=np.int64)
            for tier, unit in (("raw", 1), ("1m", _MIN_US),
                               ("1h", _HOUR_US)):
                vals = np.unique(us // unit * unit)
                out["event_type"].append(et)
                out["tier"].append(tier)
                out["n_points"].append(len(vals))
                out["varint_bytes"].append(varint_bytes(vals))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "tier": pa.array(out["tier"], pa.string()),
            "n_points": pa.array(out["n_points"], pa.int64()),
            "varint_bytes": pa.array(out["varint_bytes"],
                                     pa.int64()),
        }
    )


VARINT_SQL = f"""
WITH tiers AS (
  SELECT UNNEST(['raw', '1m', '1h']) AS tier,
         UNNEST([1, {_MIN_US}, {_HOUR_US}]) AS unit
), pts AS MATERIALIZED (
  SELECT t.tier, e.event_type,
         (EPOCH_US(e.ts) // t.unit) * t.unit AS v
  FROM events e CROSS JOIN tiers t
  WHERE e.event_type IS NOT NULL AND e.ts IS NOT NULL
  GROUP BY 1, 2, 3
), seq AS MATERIALIZED (
  SELECT tier, event_type, v,
         v - LAG(v) OVER (PARTITION BY tier, event_type ORDER BY v)
           AS d,
         ROW_NUMBER() OVER (PARTITION BY tier, event_type
                            ORDER BY v) AS rn
  FROM pts
), costs AS (
  SELECT tier, event_type,
         CASE
           WHEN rn = 1 THEN
             CASE WHEN v <= 0 THEN 1
                  ELSE GREATEST(1, (CAST(FLOOR(LOG2(
                       CAST(v AS DOUBLE))) AS BIGINT) + 1 + 6) // 7)
             END
           WHEN d > 0 THEN
             GREATEST(1, (CAST(FLOOR(LOG2(
                  CAST(d AS DOUBLE))) AS BIGINT) + 1 + 6) // 7)
           ELSE 0 END AS by
  FROM seq
)
SELECT event_type, tier,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(by) AS BIGINT) AS varint_bytes
FROM costs GROUP BY 1, 2 ORDER BY event_type, tier
"""


def register_r4fe(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "tier_rollup_commutativity": q_tier_rollup_commutativity,
            "late_open_buckets": q_late_open_buckets,
            "varint_delta_bytes_by_tier":
                q_varint_delta_bytes_by_tier,
        }
    )
    oracles.update(
        {
            "tier_rollup_commutativity": COMMUT_SQL,
            "late_open_buckets": LATE_OPEN_SQL,
            "varint_delta_bytes_by_tier": VARINT_SQL,
        }
    )
