"""Round-4 batch GS: dormancy depth, micro-bursts, and pricing
residuals — the customer dormancy distribution (months since each
customer's last order at the window end, in CRM buckets 0 / 1 / 2
/ 3-5 / 6-11 / 12+ — the winback targeting histogram), the
maximum events-per-SECOND per type (the rate-limiter sizing number
hourly aggregates hide by 3600x), and the top-10 mispriced parts
by absolute residual from the retail-price-on-size OLS line
(residuals snapped to cents before ranking, ties to the lowest
partkey).

Exactness discipline: dormancy months and burst counts are pure
integers; the price regression folds identical centered OLS sums
over exact (size, cents) pairs and ranks on the snapped
residual."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import _round_half_away
from mimirsbrunn_ray.stages.rollup import tree_merge

_MISPRICE_TOP = 10
_DORM_BUCKETS = ("0", "1", "2", "3-5", "6-11", "12+")


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_DORM_COLS = ["bucket", "n_customers", "share_ppm"]


def q_dormancy_distribution(sf_dir):
    """Winback targeting histogram: months between each customer's
    LAST order and the global latest order month, bucketed 0 / 1 /
    2 / 3-5 / 6-11 / 12+ — the distribution that prices a
    reactivation campaign (12+ is usually dead; 3-5 is the money
    bucket).  Per-customer max month folds in one distributed
    pass; bucket math is pure integer."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderdate"))
        if b.num_rows == 0:
            return pa.table({
                "cust": pa.array([], pa.int64()),
                "mon": pa.array([], pa.int64()),
            })
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(np.int64)
        t = pa.table({
            "cust": b["o_custkey"].cast(pa.int64()),
            "mon": pa.array(mon),
        })
        g = t.group_by(["cust"]).aggregate([("mon", "max")])
        return g.rename_columns(["cust", "mon"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["cust"]).aggregate([("mon", "max")])
        return g.rename_columns(["cust", "mon"])

    cm = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["cust"],
    ).to_pandas()
    if "cust" not in cm.columns or len(cm) == 0:
        return pa.table({
            "bucket": pa.array([], pa.string()),
            "n_customers": pa.array([], pa.int64()),
            "share_ppm": pa.array([], pa.int64()),
        })
    last = cm["mon"].to_numpy(np.int64)
    gmax = int(last.max())
    dorm = gmax - last
    bucket = np.select(
        [dorm == 0, dorm == 1, dorm == 2, dorm <= 5, dorm <= 11],
        [_DORM_BUCKETS[0], _DORM_BUCKETS[1], _DORM_BUCKETS[2],
         _DORM_BUCKETS[3], _DORM_BUCKETS[4]],
        default=_DORM_BUCKETS[5])
    n = len(cm)
    df = pd.DataFrame({"bucket": bucket})
    agg = df.groupby("bucket").size().reset_index(name="c")
    agg = agg.sort_values("bucket", ignore_index=True)
    return pa.table({
        "bucket": pa.array(agg["bucket"], pa.string()),
        "n_customers": pa.array(agg["c"].to_numpy(np.int64)),
        "share_ppm": pa.array(
            [_round_half_away(v / n * 1e6)
             for v in agg["c"].astype(np.int64)], pa.int64()),
    })


DORMANCY_SQL = """
WITH cm AS MATERIALIZED (
  SELECT o_custkey,
         MAX(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1)
           AS mon
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
  GROUP BY 1
), gm AS MATERIALIZED (
  SELECT MAX(mon) AS gmax, CAST(COUNT(*) AS BIGINT) AS n
  FROM cm
), bk AS (
  SELECT CASE WHEN gm.gmax - cm.mon = 0 THEN '0'
              WHEN gm.gmax - cm.mon = 1 THEN '1'
              WHEN gm.gmax - cm.mon = 2 THEN '2'
              WHEN gm.gmax - cm.mon <= 5 THEN '3-5'
              WHEN gm.gmax - cm.mon <= 11 THEN '6-11'
              ELSE '12+' END AS bucket,
         gm.n
  FROM cm CROSS JOIN gm
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(ROUND(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(n)
            * 1000000, 0) AS BIGINT) AS share_ppm
FROM bk GROUP BY bucket ORDER BY bucket
"""

_BURST_COLS = ["event_type", "max_per_sec", "burst_sec",
               "mean_per_sec_x1e6"]


def q_max_events_per_second(sf_dir):
    """Rate-limiter sizing per event type: the maximum number of
    events in any one SECOND (and which second), next to the mean
    rate — hourly dashboards divide this peak by 3600, which is
    why rate limiters sized off them fall over.  Per-(type,
    second) counts fold in one distributed pass; the argmax ties
    to the earliest second."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({
            "event_type": b["event_type"],
            "sec": pc.divide(us, 1_000_000),
        })
        g = t.group_by(["event_type", "sec"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "sec", "c"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "sec"]).aggregate(
            [("c", "sum")])
        return g.rename_columns(["event_type", "sec", "c"])

    cc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["event_type", "sec"],
    ).to_pandas()
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64())
               for c in _BURST_COLS[1:]},
        })
    out = {c: [] for c in _BURST_COLS}
    for et, g in cc.groupby("event_type", sort=True):
        c = g["c"].to_numpy(np.int64)
        sec = g["sec"].to_numpy(np.int64)
        total = int(c.sum())
        span = int(sec.max() - sec.min() + 1)
        cmax = int(c.max())
        burst_sec = int(sec[c == cmax].min())
        out["event_type"].append(et)
        out["max_per_sec"].append(cmax)
        out["burst_sec"].append(burst_sec)
        out["mean_per_sec_x1e6"].append(
            _round_half_away(total / span * 1e6))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        **{c: pa.array(out[c], pa.int64())
           for c in _BURST_COLS[1:]},
    })


BURST_SQL = """
WITH sc AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) // 1000000 AS sec,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), st AS MATERIALIZED (
  SELECT event_type,
         CAST(MAX(c) AS BIGINT) AS cmax,
         CAST(SUM(c) AS BIGINT) AS total,
         MAX(sec) - MIN(sec) + 1 AS span
  FROM sc GROUP BY 1
)
SELECT st.event_type,
       st.cmax AS max_per_sec,
       CAST(MIN(sc.sec) AS BIGINT) AS burst_sec,
       CAST(ROUND(CAST(ANY_VALUE(st.total) AS DOUBLE)
            / ANY_VALUE(st.span) * 1000000, 0) AS BIGINT)
         AS mean_per_sec_x1e6
FROM st JOIN sc ON sc.event_type = st.event_type
               AND sc.c = st.cmax
GROUP BY st.event_type, st.cmax
ORDER BY st.event_type
"""

_MIS_COLS = ["partkey", "size", "price_cents", "fitted_cents",
             "residual_cents"]


def q_mispriced_parts_topk(sf_dir):
    """Pricing outliers: fit retail price (cents) on size by OLS
    across all parts, rank by |residual| snapped to whole cents
    (ties to the lowest partkey), and report the top 10 with their
    fitted and residual values — the parts whose price the size
    ladder does not explain.  The regression folds exact integer
    (size, cents) sums; residual ranking is on snapped integers."""
    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_size", "p_retailprice"])

    def proj(b: pa.Table) -> pa.Table:
        b = _valid(b, ("p_partkey", "p_size", "p_retailprice"))
        if b.num_rows == 0:
            return pa.table({
                "pk": pa.array([], pa.int64()),
                "size": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        x = b["p_retailprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(
            x >= 0, np.floor(x * 100.0 + 0.5),
            np.ceil(x * 100.0 - 0.5)).astype(np.int64)
        return pa.table({
            "pk": b["p_partkey"].cast(pa.int64()),
            "size": b["p_size"].cast(pa.int64()),
            "cents": pa.array(cents),
        })

    tbl = parts.map_batches(proj, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    if "pk" not in tbl.columns or len(tbl) < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _MIS_COLS})
    xs = tbl["size"].to_numpy(np.int64).astype(np.float64)
    ys = tbl["cents"].to_numpy(np.int64).astype(np.float64)
    n = len(xs)
    sx, sy = xs.sum(), ys.sum()
    sxx = (xs * xs).sum()
    sxy = (xs * ys).sum()
    den = n * sxx - sx * sx
    if den == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _MIS_COLS})
    slope = (n * sxy - sx * sy) / den
    intercept = (sy - slope * sx) / n
    fitted = intercept + slope * xs
    resid = ys - fitted
    resid_snap = np.array(
        [_round_half_away(v) for v in resid], np.int64)
    fitted_snap = np.array(
        [_round_half_away(v) for v in fitted], np.int64)
    df = pd.DataFrame({
        "partkey": tbl["pk"].to_numpy(np.int64),
        "size": tbl["size"].to_numpy(np.int64),
        "price_cents": tbl["cents"].to_numpy(np.int64),
        "fitted_cents": fitted_snap,
        "residual_cents": resid_snap,
        "absr": np.abs(resid_snap),
    }).sort_values(["absr", "partkey"],
                   ascending=[False, True],
                   ignore_index=True).head(_MISPRICE_TOP)
    return pa.table(
        {c: pa.array(df[c].to_numpy(np.int64))
         for c in _MIS_COLS})


MISPRICE_SQL = f"""
WITH p AS MATERIALIZED (
  SELECT p_partkey AS pk,
         CAST(p_size AS BIGINT) AS size,
         CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS cents
  FROM part
  WHERE p_partkey IS NOT NULL AND p_size IS NOT NULL
    AND p_retailprice IS NOT NULL
), st AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(size AS DOUBLE)) AS sx,
         SUM(CAST(cents AS DOUBLE)) AS sy,
         SUM(CAST(size AS DOUBLE) * size) AS sxx,
         SUM(CAST(size AS DOUBLE) * cents) AS sxy
  FROM p
), fit AS MATERIALIZED (
  SELECT n,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
           / n AS icept
  FROM st WHERE n >= 3 AND n * sxx - sx * sx <> 0
), resid AS (
  SELECT p.pk, p.size, p.cents,
         CAST(ROUND(fit.icept + fit.slope * p.size, 0)
              AS BIGINT) AS fitted_cents,
         CAST(ROUND(p.cents
                    - (fit.icept + fit.slope * p.size), 0)
              AS BIGINT) AS residual_cents
  FROM p CROSS JOIN fit
)
SELECT CAST(pk AS BIGINT) AS partkey,
       size,
       cents AS price_cents,
       fitted_cents,
       residual_cents
FROM resid
ORDER BY ABS(residual_cents) DESC, pk
LIMIT {_MISPRICE_TOP}
"""


def register_r4gs(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "dormancy_distribution": q_dormancy_distribution,
            "max_events_per_second": q_max_events_per_second,
            "mispriced_parts_topk": q_mispriced_parts_topk,
        }
    )
    oracles.update(
        {
            "dormancy_distribution": DORMANCY_SQL,
            "max_events_per_second": BURST_SQL,
            "mispriced_parts_topk": MISPRICE_SQL,
        }
    )
