"""Round-4 batch AG: cross-table as-of join, top-k hourly anomalies vs
the hour-of-week baseline, and revenue-weighted discount per brand.

Exactness discipline: as-of latencies are exact microsecond integers;
anomaly scores are integer cross-multiplications against the baseline
(no division); the weighted discount ships as an exact integer
numerator/denominator pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# cross-table as-of: purchase events to the user's latest prior order
# ---------------------------------------------------------------------------


def q_last_order_before_purchase(sf_dir):
    """For every purchase EVENT, the user's most recent ORDER at or
    before it (as-of across TABLES: the events stream joined to the
    orders fact on user key + time), summarized as exact match count
    and min/max/sum purchase-to-order latency in microseconds — the
    'did an order precede this purchase signal' attribution check.
    Rides asof_join_bucketed (J5's distributed both-sides variant):
    one hash-bucket shuffle, per-bucket composite-key searchsorted,
    nothing driver-sized until the bounded counter merge."""
    from mimirsbrunn_ray.stages.window import asof_join_bucketed

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    ).filter(lambda r: r["event_type"] == "purchase")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.is_valid(b["o_custkey"]), pc.is_valid(b["o_orderdate"])
            )
        ).rename_columns(["user_id", "o_orderdate"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    joined = asof_join_bucketed(
        ev, orders, key="user_id", ts_col="ts",
        right_ts_col="o_orderdate", out_col="last_order_ts", inner=True,
    )

    def partial(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ot = (
            b["last_order_ts"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        lat = ts - ot
        if len(lat) == 0:
            return pa.table(
                {
                    "n_matched": pa.array([0], pa.int64()),
                    "sum_latency_us": pa.array([0], pa.int64()),
                    "min_latency_us": pa.array([None], pa.int64()),
                    "max_latency_us": pa.array([None], pa.int64()),
                }
            )
        return pa.table(
            {
                "n_matched": pa.array([len(lat)], pa.int64()),
                "sum_latency_us": pa.array([int(lat.sum())], pa.int64()),
                "min_latency_us": pa.array([int(lat.min())], pa.int64()),
                "max_latency_us": pa.array([int(lat.max())], pa.int64()),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_matched": pa.array(
                    [pc.sum(b["n_matched"]).as_py() or 0], pa.int64()
                ),
                "sum_latency_us": pa.array(
                    [pc.sum(b["sum_latency_us"]).as_py() or 0], pa.int64()
                ),
                "min_latency_us": pa.array(
                    [pc.min(b["min_latency_us"]).as_py()], pa.int64()
                ),
                "max_latency_us": pa.array(
                    [pc.max(b["max_latency_us"]).as_py()], pa.int64()
                ),
            }
        )

    return tree_merge(
        joined.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        combine,
    )


LAST_ORDER_SQL = """
WITH j AS (
  SELECT EPOCH_US(p.ts) - EPOCH_US(o.o_orderdate) AS lat
  FROM (SELECT user_id, ts FROM events
        WHERE event_type = 'purchase'
          AND user_id IS NOT NULL AND ts IS NOT NULL) p
  ASOF JOIN (SELECT o_custkey, o_orderdate FROM orders
             WHERE o_custkey IS NOT NULL
               AND o_orderdate IS NOT NULL) o
    ON p.user_id = o.o_custkey AND o.o_orderdate <= p.ts
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_matched,
       CAST(SUM(lat) AS BIGINT) AS sum_latency_us,
       CAST(MIN(lat) AS BIGINT) AS min_latency_us,
       CAST(MAX(lat) AS BIGINT) AS max_latency_us
FROM j
"""


# ---------------------------------------------------------------------------
# top-k anomalous hours vs the hour-of-week baseline
# ---------------------------------------------------------------------------

_ANOM_TOPK = 10


def q_anomalous_hours_top10(sf_dir):
    """The `_ANOM_TOPK` most anomalous (event_type, absolute hour)
    cells: hours whose event count deviates most from their
    hour-of-week baseline (the mean count over all occurrences of that
    type's (dow, hod) slot). The score is the exact integer
    cross-multiplication |n*slot_cnt - slot_total| — n deviating from
    slot_total/slot_cnt scaled by slot_cnt — so ranking needs no
    division; ties break on (event_type, hr). One decomposable hourly
    count pass (bounded by types x hours); the slot baseline and top-k
    run over that bounded table."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"]))
        )
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        hr = np.floor_divide(ts_us, _HOUR_US)
        t = pa.table({"event_type": b["event_type"], "hr": pa.array(hr)})
        g = t.group_by(["event_type", "hr"]).aggregate([([], "count_all")])
        g = g.select(["event_type", "hr", "count_all"])
        return g.rename_columns(["event_type", "hr", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "hr"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "hr", "n"])

    hourly = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: types x hours

    cols = {"event_type": [], "hr": [], "n": [], "slot_total": [],
            "slot_cnt": [], "score": []}
    if len(hourly):
        hr = hourly["hr"].to_numpy(dtype=np.int64)
        # hour-of-week slot: (day+4)%7 the repo-wide dow convention
        dow = ((hr // 24) + 4) % 7
        hod = hr % 24
        hourly = hourly.assign(slot=dow * 24 + hod)
        g = hourly.groupby(["event_type", "slot"])["n"].agg(
            ["sum", "count"]
        )
        hourly = hourly.join(
            g.rename(columns={"sum": "slot_total", "count": "slot_cnt"}),
            on=["event_type", "slot"],
        )
        n = hourly["n"].to_numpy(dtype=np.int64)
        st = hourly["slot_total"].to_numpy(dtype=np.int64)
        sc = hourly["slot_cnt"].to_numpy(dtype=np.int64)
        hourly["score"] = np.abs(n * sc - st)
        top = hourly.sort_values(
            ["score", "event_type", "hr"],
            ascending=[False, True, True], ignore_index=True,
        ).head(_ANOM_TOPK)
        cols = {
            "event_type": top["event_type"].tolist(),
            "hr": top["hr"].to_numpy(dtype=np.int64),
            "n": top["n"].to_numpy(dtype=np.int64),
            "slot_total": top["slot_total"].to_numpy(dtype=np.int64),
            "slot_cnt": top["slot_cnt"].to_numpy(dtype=np.int64),
            "score": top["score"].to_numpy(dtype=np.int64),
        }
    return pa.table(
        {
            "event_type": pa.array(cols["event_type"], pa.string()),
            "hr": pa.array(cols["hr"], pa.int64()),
            "n": pa.array(cols["n"], pa.int64()),
            "slot_total": pa.array(cols["slot_total"], pa.int64()),
            "slot_cnt": pa.array(cols["slot_cnt"], pa.int64()),
            "score": pa.array(cols["score"], pa.int64()),
        }
    )


ANOMALOUS_SQL = f"""
WITH hourly AS (
  SELECT event_type,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hr,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), slotted AS (
  SELECT event_type, hr, n,
         dayofweek(to_timestamp(hr * 3600)) * 24 + (hr % 24) AS slot
  FROM hourly
), base AS (
  SELECT event_type, hr, n,
         CAST(SUM(n) OVER (PARTITION BY event_type, slot) AS BIGINT)
           AS slot_total,
         CAST(COUNT(*) OVER (PARTITION BY event_type, slot) AS BIGINT)
           AS slot_cnt
  FROM slotted
)
SELECT event_type, hr, n, slot_total, slot_cnt,
       CAST(ABS(n * slot_cnt - slot_total) AS BIGINT) AS score
FROM base
ORDER BY score DESC, event_type, hr
LIMIT {_ANOM_TOPK}
"""


# ---------------------------------------------------------------------------
# revenue-weighted average discount per brand
# ---------------------------------------------------------------------------


def q_brand_weighted_discount(sf_dir):
    """Per part brand: the revenue-WEIGHTED average discount, shipped as
    the exact integer pair (sum of extendedprice_x100 * discount_bp,
    sum of extendedprice_x100) — weighted mean = num/den/10000. The
    part dimension broadcasts (J1: partkey -> brand built all-Arrow);
    the lineitem pass emits decomposable integer partials."""
    from mimirsbrunn_ray.pipelines.queries import BROADCAST_BYTE_BUDGET
    from mimirsbrunn_ray.stages.join import (
        broadcast_join,
        make_lookup_ref_arrays,
    )

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )
    if part.nbytes > BROADCAST_BYTE_BUDGET:  # pragma: no cover - scale path
        raise NotImplementedError(
            "distributed-dim fallback: Dataset.join lineitem to part on "
            "partkey (orders_per_nation's else-branch shape)"
        )
    lookup = make_lookup_ref_arrays(
        part["p_partkey"].to_numpy(zero_copy_only=False),
        part["p_brand"].to_numpy(zero_copy_only=False),
    )
    joined = broadcast_join(
        li, lookup, key_col="l_partkey", out_col="p_brand",
        out_type=pa.string(),
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["p_brand"]),
                    pc.is_valid(b["l_extendedprice"]),
                ),
                pc.is_valid(b["l_discount"]),
            )
        )
        px = _round_half_away(
            b["l_extendedprice"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        disc = _round_half_away(
            b["l_discount"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 10_000.0
        )
        t = pa.table(
            {
                "p_brand": b["p_brand"],
                "wd": pa.array(px * disc),
                "w": pa.array(px),
            }
        )
        g = t.group_by(["p_brand"]).aggregate(
            [([], "count_all"), ("wd", "sum"), ("w", "sum")]
        )
        g = g.select(["p_brand", "count_all", "wd_sum", "w_sum"])
        return g.rename_columns(
            ["p_brand", "n_items", "disc_num", "disc_den_x100"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["p_brand"]).aggregate(
            [("n_items", "sum"), ("disc_num", "sum"),
             ("disc_den_x100", "sum")]
        )
        return g.rename_columns(
            ["p_brand", "n_items", "disc_num", "disc_den_x100"]
        )

    return tree_merge(
        joined.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        combine,
    )


BRAND_DISCOUNT_SQL = """
WITH v AS (
  SELECT p.p_brand,
         CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT) AS px,
         CAST(ROUND(l.l_discount * 10000, 0) AS BIGINT) AS bp
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_extendedprice IS NOT NULL AND l.l_discount IS NOT NULL
)
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(px * bp) AS BIGINT) AS disc_num,
       CAST(SUM(px) AS BIGINT) AS disc_den_x100
FROM v GROUP BY 1
"""


def register_r4ag(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "last_order_before_purchase": q_last_order_before_purchase,
            "anomalous_hours_top10": q_anomalous_hours_top10,
            "brand_weighted_discount": q_brand_weighted_discount,
        }
    )
    oracles.update(
        {
            "last_order_before_purchase": LAST_ORDER_SQL,
            "anomalous_hours_top10": ANOMALOUS_SQL,
            "brand_weighted_discount": BRAND_DISCOUNT_SQL,
        }
    )
