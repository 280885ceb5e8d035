"""Round-4 batch AN: banded latency CDF per priority, per-order brand
diversity quantiles, and argmax-then-detail retrieval (the busiest
minute's type breakdown).

Exactness discipline: band membership is integer day arithmetic;
brand-diversity quantiles use the repo-wide PERCENTILE_DISC rank rule
over exact distinct counts; the busiest-minute argmax breaks ties on
the earliest minute in both engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

from mimirsbrunn_ray.stages.rollup import tree_merge

_MIN_US = 60_000_000
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# ship-latency CDF bands per order priority
# ---------------------------------------------------------------------------

_LAT_BANDS = (1, 3, 7, 14)  # days


def q_ship_latency_cdf_bands(sf_dir):
    """Per order priority: how many lineitems shipped within 1/3/7/14
    days of the order date — the banded CDF a fulfillment SLA dashboard
    plots (the quantile twin is ship_latency_quantiles). One big-big
    hash join orders |x| lineitem on the order key, then decomposable
    conditional counts; latency is exact whole-day floor division."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["o_orderkey"]),
                    pc.is_valid(b["o_orderdate"]),
                ),
                pc.is_valid(b["o_orderpriority"]),
            )
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).repartition(4)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.is_valid(b["l_orderkey"]), pc.is_valid(b["l_shipdate"])
            )
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).repartition(4)
    joined = _safe_join(
        li, orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        join_type="inner",
        num_partitions=4,
    )

    def partial(b: pa.Table) -> pa.Table:
        ship = (
            b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        odate = (
            b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        lat_days = (ship - odate) // _DAY_US
        cols = {"o_orderpriority": b["o_orderpriority"]}
        cols["n"] = pa.array(np.ones(len(lat_days), np.int64))
        for d in _LAT_BANDS:
            cols[f"n_le_{d}d"] = pa.array(
                (lat_days <= d).astype(np.int64)
            )
        t = pa.table(cols)
        aggs = [("n", "sum")] + [(f"n_le_{d}d", "sum") for d in _LAT_BANDS]
        g = t.group_by(["o_orderpriority"]).aggregate(aggs)
        names = ["o_orderpriority", "n"] + [
            f"n_le_{d}d" for d in _LAT_BANDS
        ]
        g = g.select(
            ["o_orderpriority", "n_sum"]
            + [f"n_le_{d}d_sum" for d in _LAT_BANDS]
        )
        return g.rename_columns(names)

    def combine(b: pa.Table) -> pa.Table:
        aggs = [("n", "sum")] + [(f"n_le_{d}d", "sum") for d in _LAT_BANDS]
        g = b.group_by(["o_orderpriority"]).aggregate(aggs)
        names = ["o_orderpriority", "n"] + [
            f"n_le_{d}d" for d in _LAT_BANDS
        ]
        g = g.select(
            ["o_orderpriority", "n_sum"]
            + [f"n_le_{d}d_sum" for d in _LAT_BANDS]
        )
        return g.rename_columns(names)

    return tree_merge(
        joined.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        combine,
    )


_band_cols = ",\n       ".join(
    f"CAST(SUM(CASE WHEN lat <= {d} THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS n_le_{d}d"
    for d in _LAT_BANDS
)
LATENCY_BANDS_SQL = f"""
WITH j AS (
  SELECT o.o_orderpriority,
         (EPOCH_US(l.l_shipdate) - EPOCH_US(o.o_orderdate))
           // 86400000000 AS lat
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
    AND o.o_orderpriority IS NOT NULL
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       {_band_cols}
FROM j GROUP BY 1
"""


# ---------------------------------------------------------------------------
# brand diversity per order: distinct brands quantiles
# ---------------------------------------------------------------------------


def q_brands_per_order_quantiles(sf_dir):
    """Exact p50/p90/max of DISTINCT part brands per order — basket
    diversity. The part dimension broadcasts (J1); per-order distinct
    brand counts come from combiner-first (order, brand) dedup partials
    sharded by order key; the final quantiles ride the small-domain
    histogram rule (the count of brands per order is tiny)."""
    from mimirsbrunn_ray.pipelines.queries import BROADCAST_BYTE_BUDGET
    from mimirsbrunn_ray.stages.join import (
        broadcast_join,
        make_lookup_ref_arrays,
    )

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    if part.nbytes > BROADCAST_BYTE_BUDGET:  # pragma: no cover - scale path
        raise NotImplementedError(
            "distributed-dim fallback: Dataset.join lineitem to part"
        )
    lookup = make_lookup_ref_arrays(
        part["p_partkey"].to_numpy(zero_copy_only=False),
        part["p_brand"].to_numpy(zero_copy_only=False),
    )
    joined = broadcast_join(
        li, lookup, key_col="l_partkey", out_col="p_brand",
        out_type=pa.string(),
    )

    def pair_partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["l_orderkey"]), pc.is_valid(b["p_brand"]))
        )
        g = b.group_by(["l_orderkey", "p_brand"]).aggregate(
            [([], "count_all")]
        )
        return g.select(["l_orderkey", "p_brand"])

    def pair_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_orderkey", "p_brand"]).aggregate(
            [([], "count_all")]
        )
        return g.select(["l_orderkey", "p_brand"])

    pairs = tree_merge(
        joined.map_batches(pair_partial, batch_format="pyarrow",
                           batch_size=None),
        pair_combine,
        final_shards=8,
        shard_cols=["l_orderkey"],  # order's brands stay in one shard
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "l_orderkey" not in b.column_names:
            return pa.table(
                {"v": pa.array([], pa.int64()),
                 "c": pa.array([], pa.int64())}
            )
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        _, per_order = np.unique(ok, return_counts=True)
        lvl, c = np.unique(per_order, return_counts=True)
        return pa.table(
            {
                "v": pa.array(lvl.astype(np.int64)),
                "c": pa.array(c.astype(np.int64)),
            }
        )

    def hist_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["v"]).aggregate([("c", "sum")])
        return g.rename_columns(["v", "c"])

    hist = tree_merge(
        pairs.map_batches(hist_partial, batch_format="pyarrow",
                          batch_size=None),
        hist_combine,
    ).to_pandas()  # bounded: distinct diversity levels

    out = {"n_orders": [0], "p50": [None], "p90": [None], "max": [None]}
    if len(hist) and hist["c"].sum() > 0:
        hist = hist.sort_values("v")
        v = hist["v"].to_numpy(dtype=np.int64)
        cum = np.cumsum(hist["c"].to_numpy(dtype=np.int64))
        total = int(cum[-1])
        out["n_orders"] = [total]
        for q, col in ((0.5, "p50"), (0.9, "p90")):
            rank = int(np.ceil(q * total - 1e-9))
            out[col] = [int(v[np.searchsorted(cum, rank, "left")])]
        out["max"] = [int(v[-1])]
    return pa.table(
        {
            "n_orders": pa.array(out["n_orders"], pa.int64()),
            "p50": pa.array(out["p50"], pa.int64()),
            "p90": pa.array(out["p90"], pa.int64()),
            "max": pa.array(out["max"], pa.int64()),
        }
    )


BRANDS_PER_ORDER_SQL = """
WITH d AS (
  SELECT l.l_orderkey,
         CAST(COUNT(DISTINCT p.p_brand) AS BIGINT) AS nb
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_orderkey IS NOT NULL
  GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(quantile_disc(nb, 0.5) AS BIGINT) AS p50,
       CAST(quantile_disc(nb, 0.9) AS BIGINT) AS p90,
       CAST(MAX(nb) AS BIGINT) AS max
FROM d
"""


# ---------------------------------------------------------------------------
# argmax-then-detail: the busiest minute's type breakdown
# ---------------------------------------------------------------------------


def q_busiest_minute_breakdown(sf_dir):
    """The single busiest minute (most events; ties -> earliest) and its
    per-type breakdown — argmax retrieval followed by detail expansion,
    the drill-down a dashboard runs on a spike. One decomposable
    (minute, type) count pass (bounded by minutes x types); both the
    argmax and the breakdown read that table."""
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
        mn = np.floor_divide(ts_us, _MIN_US)
        t = pa.table({"event_type": b["event_type"], "mn": pa.array(mn)})
        g = t.group_by(["mn", "event_type"]).aggregate([([], "count_all")])
        g = g.select(["mn", "event_type", "count_all"])
        return g.rename_columns(["mn", "event_type", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["mn", "event_type"]).aggregate([("n", "sum")])
        return g.rename_columns(["mn", "event_type", "n"])

    grid = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: minutes x types

    if not len(grid):
        return pa.table(
            {
                "minute": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "minute_total": pa.array([], pa.int64()),
            }
        )
    totals = grid.groupby("mn")["n"].sum()
    best = totals[totals == totals.max()].index.min()  # earliest tie
    det = grid[grid["mn"] == best].sort_values(
        "event_type", ignore_index=True
    )
    total = int(totals[best])
    return pa.table(
        {
            "minute": pa.array(det["mn"].to_numpy(dtype=np.int64)),
            "event_type": pa.array(det["event_type"], pa.string()),
            "n": pa.array(det["n"].to_numpy(dtype=np.int64)),
            "minute_total": pa.array(
                np.full(len(det), total, dtype=np.int64)
            ),
        }
    )


BUSIEST_MINUTE_SQL = """
WITH g AS MATERIALIZED (
  SELECT CAST(FLOOR(epoch(ts) / 60) AS BIGINT) AS minute,
         event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), t AS (
  SELECT minute, CAST(SUM(n) AS BIGINT) AS total
  FROM g GROUP BY 1
), best AS (
  SELECT minute, total FROM t
  ORDER BY total DESC, minute LIMIT 1
)
SELECT g.minute, g.event_type, g.n, best.total AS minute_total
FROM g JOIN best USING (minute)
"""


def register_r4an(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "ship_latency_cdf_bands": q_ship_latency_cdf_bands,
            "brands_per_order_quantiles": q_brands_per_order_quantiles,
            "busiest_minute_breakdown": q_busiest_minute_breakdown,
        }
    )
    oracles.update(
        {
            "ship_latency_cdf_bands": LATENCY_BANDS_SQL,
            "brands_per_order_quantiles": BRANDS_PER_ORDER_SQL,
            "busiest_minute_breakdown": BUSIEST_MINUTE_SQL,
        }
    )
