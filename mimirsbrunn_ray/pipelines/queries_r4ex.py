"""Round-4 batch EX: three tier-engine operators on the events
stream — OHLC candles (the first/last-aware downsample the
sum/min/max rollup tiers can't answer), the watermark
allowed-lateness tradeoff curve (what fraction of events a streaming
ingest would drop at each lateness bound, with arrival order =
event_id), and per-type 8-bit quantization error (the lossy-tier
compression loss model, companion to dod/xor bit counts and the KL
info-loss audit).

Exactness discipline: OHLC open/close pick winners by the total
(ts, event_id) order through associative partials (sort + first/last
per group, re-sorted at every combine level), values snap x100 once
at read; the watermark running max folds per-arrival-bucket maxima
with a driver-side prefix carry (boundary-carry, the gap-fill
discipline) so the inclusive prefix max is exact; quantization runs
on the x100 integer grid with the 255-step dequant error exact int64
(the .5-tie analysis: 2*q*range = 255*(2k+1) has no integer
solution, so the single ROUND per side sees no half case)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000
_LATENESS_US = [0, 60_000_000, 300_000_000, 900_000_000]
_ARRIVAL_BUCKET = 50_000  # event_id range per watermark carry bucket


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_OHLC_COLS = [
    "event_type", "h", "ots", "oid", "open_x100", "cts", "cid",
    "close_x100", "high_x100", "low_x100", "n",
]


def _ohlc_fold(df: pd.DataFrame) -> pd.DataFrame:
    """Associative combine of OHLC partial rows: re-pick open by
    smallest (ots, oid), close by largest (cts, cid), extremes by
    min/max, counts by sum."""
    opens = (
        df.sort_values(["event_type", "h", "ots", "oid"],
                       kind="mergesort")
        .groupby(["event_type", "h"], sort=False)
        .agg(ots=("ots", "first"), oid=("oid", "first"),
             open_x100=("open_x100", "first"))
    )
    closes = (
        df.sort_values(["event_type", "h", "cts", "cid"],
                       kind="mergesort")
        .groupby(["event_type", "h"], sort=False)
        .agg(cts=("cts", "last"), cid=("cid", "last"),
             close_x100=("close_x100", "last"))
    )
    ext = df.groupby(["event_type", "h"], sort=False).agg(
        high_x100=("high_x100", "max"), low_x100=("low_x100", "min"),
        n=("n", "sum"),
    )
    out = opens.join(closes).join(ext).reset_index()
    return out[_OHLC_COLS]


def q_ohlc_candles_hourly(sf_dir):
    """Per (event_type, hour): open/high/low/close of value (x100)
    with open = value at the smallest (ts, event_id) and close at
    the largest — the M4/candle downsample. One streaming pass of
    associative per-batch partials, tree-merged; the winner-carrying
    partial rows are what make first/last decomposable."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "ts", "event_id", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        us = us.to_numpy(zero_copy_only=False)
        vx = np.floor(
            b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(
                    zero_copy_only=False
                ),
                "h": us // _HOUR_US,
                "ots": us, "oid": b["event_id"].to_numpy(
                    zero_copy_only=False
                ).astype(np.int64),
                "open_x100": vx,
            }
        )
        df["cts"] = df["ots"]
        df["cid"] = df["oid"]
        df["close_x100"] = vx
        df["high_x100"] = vx
        df["low_x100"] = vx
        df["n"] = np.int64(1)
        if len(df) == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    **{
                        c: pa.array([], pa.int64())
                        for c in _OHLC_COLS[1:]
                    },
                }
            )
        return pa.Table.from_pandas(
            _ohlc_fold(df), preserve_index=False
        )

    def combine(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        if len(df) == 0:
            return b
        return pa.Table.from_pandas(
            _ohlc_fold(df), preserve_index=False
        )

    out = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow",
                       batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["event_type", "h"],
    ).to_pandas()
    if len(out) == 0:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "h": pa.array([], pa.int64()),
                "open_x100": pa.array([], pa.int64()),
                "high_x100": pa.array([], pa.int64()),
                "low_x100": pa.array([], pa.int64()),
                "close_x100": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
    out = out.sort_values(["event_type", "h"], ignore_index=True)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "h": pa.array(out["h"].to_numpy(dtype=np.int64)),
            "open_x100": pa.array(
                out["open_x100"].to_numpy(dtype=np.int64)
            ),
            "high_x100": pa.array(
                out["high_x100"].to_numpy(dtype=np.int64)
            ),
            "low_x100": pa.array(
                out["low_x100"].to_numpy(dtype=np.int64)
            ),
            "close_x100": pa.array(
                out["close_x100"].to_numpy(dtype=np.int64)
            ),
            "n": pa.array(out["n"].to_numpy(dtype=np.int64)),
        }
    )


OHLC_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / {_HOUR_US}) AS BIGINT) AS h,
         EPOCH_US(ts) AS us, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS vx
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND value IS NOT NULL
), w AS MATERIALIZED (
  SELECT event_type, h,
         FIRST_VALUE(vx) OVER win AS open_x100,
         LAST_VALUE(vx) OVER win AS close_x100,
         MAX(vx) OVER win AS high_x100,
         MIN(vx) OVER win AS low_x100,
         COUNT(*) OVER win AS n
  FROM e WINDOW win AS (
    PARTITION BY event_type, h ORDER BY us, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
  )
)
SELECT DISTINCT event_type, h, open_x100, high_x100, low_x100,
       close_x100, CAST(n AS BIGINT) AS n
FROM w ORDER BY event_type, h
"""


def q_watermark_lateness_tradeoff(sf_dir):
    """For allowed lateness L in {0, 1m, 5m, 15m}: how many events a
    streaming ingest (arrival order = event_id, watermark = running
    INCLUSIVE max event time) would reject because ts < watermark -
    L. Distributed as per-arrival-bucket maxima + a driver prefix
    carry (buckets are event_id ranges, so the carry-in of bucket k
    is the max over buckets < k), then one bucket-grouped pass
    computes in-bucket running maxima with the carry."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
    )

    def bmax(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_id", "ts"))
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        us = us.to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "bk": pa.array(
                    (eid // _ARRIVAL_BUCKET).astype(np.int64)
                ),
                "mx": pa.array(us),
            }
        )
        g = t.group_by(["bk"]).aggregate([("mx", "max")])
        return g.rename_columns(["bk", "mx"])

    def bcomb(b: pa.Table) -> pa.Table:
        g = b.group_by(["bk"]).aggregate([("mx", "max")])
        return g.rename_columns(["bk", "mx"])

    bmaxes = tree_merge(
        ev.map_batches(bmax, batch_format="pyarrow",
                       batch_size=None),
        bcomb,
    ).to_pandas()
    empty = pa.table(
        {
            "lateness_us": pa.array(_LATENESS_US, pa.int64()),
            "n_events": pa.array([0] * len(_LATENESS_US), pa.int64()),
            "n_dropped": pa.array([0] * len(_LATENESS_US),
                                  pa.int64()),
            "dropped_ppm": pa.array([0] * len(_LATENESS_US),
                                    pa.int64()),
        }
    )
    if len(bmaxes) == 0:
        return empty
    bmaxes = bmaxes.sort_values("bk", ignore_index=True)
    bks = bmaxes["bk"].to_numpy(dtype=np.int64)
    mx = bmaxes["mx"].to_numpy(dtype=np.int64)
    carry_vals = np.concatenate(
        ([np.iinfo(np.int64).min],
         np.maximum.accumulate(mx)[:-1])
    )
    carry = dict(zip(bks.tolist(), carry_vals.tolist()))
    lat = np.array(_LATENESS_US, np.int64)

    def add_bk(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_id", "ts"))
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        us = us.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bk": pa.array(
                    (eid // _ARRIVAL_BUCKET).astype(np.int64)
                ),
                "event_id": pa.array(eid.astype(np.int64)),
                "us": pa.array(us),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "lateness_us": pd.Series([], dtype=np.int64),
                    "n_events": pd.Series([], dtype=np.int64),
                    "n_dropped": pd.Series([], dtype=np.int64),
                }
            )
        g = g.sort_values("event_id", kind="mergesort",
                          ignore_index=True)
        us = g["us"].to_numpy(dtype=np.int64)
        cin = carry[int(g["bk"].iloc[0])]
        wm = np.maximum.accumulate(
            np.maximum(us, cin)
        )  # inclusive running max with carry-in
        dropped = (us[None, :] < wm[None, :] - lat[:, None]).sum(
            axis=1
        )
        return pd.DataFrame(
            {
                "lateness_us": lat,
                "n_events": np.full(len(lat), len(us), np.int64),
                "n_dropped": dropped.astype(np.int64),
            }
        )

    parts = (
        ev.map_batches(add_bk, batch_format="pyarrow",
                       batch_size=None)
        .groupby("bk")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        return empty
    agg = parts.groupby("lateness_us", sort=True).sum().reset_index()
    n = agg["n_events"].to_numpy(dtype=np.int64)
    d = agg["n_dropped"].to_numpy(dtype=np.int64)
    ppm = np.array(
        [
            _round_half_away(float(di) / float(ni) * 1e6)
            if ni else 0
            for di, ni in zip(d, n)
        ],
        np.int64,
    )
    return pa.table(
        {
            "lateness_us": pa.array(
                agg["lateness_us"].to_numpy(dtype=np.int64)
            ),
            "n_events": pa.array(n),
            "n_dropped": pa.array(d),
            "dropped_ppm": pa.array(ppm),
        }
    )


WATERMARK_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT event_id, EPOCH_US(ts) AS us
  FROM events WHERE event_id IS NOT NULL AND ts IS NOT NULL
), wm AS MATERIALIZED (
  SELECT us,
         MAX(us) OVER (ORDER BY event_id
                       ROWS UNBOUNDED PRECEDING) AS w
  FROM e
), lat AS (
  SELECT UNNEST([{", ".join(str(v) for v in _LATENESS_US)}])
    AS lateness_us
)
SELECT l.lateness_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN wm.us < wm.w - l.lateness_us
                THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(ROUND(CAST(SUM(CASE WHEN wm.us < wm.w - l.lateness_us
                THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) * 1000000, 0) AS BIGINT)
         AS dropped_ppm
FROM wm CROSS JOIN lat l
GROUP BY l.lateness_us ORDER BY l.lateness_us
"""


def q_value_quantization_error(sf_dir):
    """Per event type: the error of 8-bit min/max quantization of
    value — the lossy cold-tier model. Pass 1 folds exact x100
    min/max; pass 2 quantizes q = round((v-min)*255/range),
    dequantizes vd = round(min + q*range/255) and folds exact
    integer |vd - v| sums/maxima. Constant series quantize
    losslessly (range 0 -> q=0, vd=min)."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def vx_of(b: pa.Table) -> np.ndarray:
        return np.floor(
            b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)

    def mm_partial(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "value"))
        t = pa.table(
            {"event_type": b["event_type"],
             "lo": pa.array(vx_of(b)), "hi": pa.array(vx_of(b))}
        )
        g = t.group_by(["event_type"]).aggregate(
            [("lo", "min"), ("hi", "max")]
        )
        return g.rename_columns(["event_type", "lo", "hi"])

    def mm_comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("lo", "min"), ("hi", "max")]
        )
        return g.rename_columns(["event_type", "lo", "hi"])

    mm = tree_merge(
        ev.map_batches(mm_partial, batch_format="pyarrow",
                       batch_size=None),
        mm_comb,
    ).to_pandas()
    if len(mm) == 0:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "max_abs_err_x100": pa.array([], pa.int64()),
                "mean_abs_err_x100": pa.array([], pa.int64()),
            }
        )
    types = mm["event_type"].tolist()
    lo = dict(zip(types, mm["lo"].astype(np.int64)))
    hi = dict(zip(types, mm["hi"].astype(np.int64)))

    def err_partial(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "value"))
        et = pd.Series(b["event_type"].to_numpy(zero_copy_only=False))
        vx = vx_of(b)
        lo_a = et.map(lo).to_numpy(dtype=np.int64)
        rng = et.map(hi).to_numpy(dtype=np.int64) - lo_a
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.where(
                rng > 0,
                np.floor(
                    (vx - lo_a).astype(np.float64) * 255.0
                    / np.where(rng > 0, rng, 1).astype(np.float64)
                    + 0.5
                ),
                0.0,
            ).astype(np.int64)
            vd = np.where(
                rng > 0,
                lo_a
                + np.floor(
                    q.astype(np.float64)
                    * np.where(rng > 0, rng, 1).astype(np.float64)
                    / 255.0
                    + 0.5
                ).astype(np.int64),
                lo_a,
            )
        err = np.abs(vd - vx)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "n": pa.array(np.ones(len(err), np.int64)),
                "serr": pa.array(err),
                "merr": pa.array(err),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("serr", "sum"), ("merr", "max")]
        )
        return g.rename_columns(["event_type", "n", "serr", "merr"])

    def err_comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("serr", "sum"), ("merr", "max")]
        )
        return g.rename_columns(["event_type", "n", "serr", "merr"])

    out = tree_merge(
        ev.map_batches(err_partial, batch_format="pyarrow",
                       batch_size=None),
        err_comb,
    ).to_pandas()
    out = out.sort_values("event_type", ignore_index=True)
    mean = np.array(
        [
            _round_half_away(float(s) / float(n)) if n else 0
            for s, n in zip(out["serr"], out["n"])
        ],
        np.int64,
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"].to_numpy(dtype=np.int64)),
            "max_abs_err_x100": pa.array(
                out["merr"].to_numpy(dtype=np.int64)
            ),
            "mean_abs_err_x100": pa.array(mean),
        }
    )


QUANT_SQL = """
WITH e AS MATERIALIZED (
  SELECT event_type,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS vx
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), mm AS MATERIALIZED (
  SELECT event_type, MIN(vx) AS lo, MAX(vx) AS hi
  FROM e GROUP BY 1
), q AS MATERIALIZED (
  SELECT e.event_type,
         CASE WHEN mm.hi > mm.lo THEN
           ABS(mm.lo + CAST(ROUND(
             CAST(ROUND(CAST(e.vx - mm.lo AS DOUBLE) * 255.0
                  / CAST(mm.hi - mm.lo AS DOUBLE), 0) AS DOUBLE)
             * CAST(mm.hi - mm.lo AS DOUBLE) / 255.0, 0) AS BIGINT)
             - e.vx)
         ELSE 0 END AS err
  FROM e JOIN mm ON mm.event_type = e.event_type
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(err) AS BIGINT) AS max_abs_err_x100,
       CAST(ROUND(CAST(SUM(err) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE), 0) AS BIGINT)
         AS mean_abs_err_x100
FROM q GROUP BY event_type ORDER BY event_type
"""


def register_r4ex(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "ohlc_candles_hourly": q_ohlc_candles_hourly,
            "watermark_lateness_tradeoff":
                q_watermark_lateness_tradeoff,
            "value_quantization_error": q_value_quantization_error,
        }
    )
    oracles.update(
        {
            "ohlc_candles_hourly": OHLC_SQL,
            "watermark_lateness_tradeoff": WATERMARK_SQL,
            "value_quantization_error": QUANT_SQL,
        }
    )
