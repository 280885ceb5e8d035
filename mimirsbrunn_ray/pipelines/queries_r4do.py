"""Round-4 batch DO: operational engine audits — right-to-be-forgotten
cascade sizing, the event-id sequence gap detector, and the LSM
write-amplification model over observed ingest volumes.

The operator trio behind three runbooks: how much a GDPR forget-set
actually touches (per table, BEFORE running the delete), whether the
ingest id sequence has holes (lost-write detector), and what a
size-tiered LSM would pay to absorb each type's daily volume.
Exactness: pure int64 counts/ids; the only doubles are final mirrored
ratios / logarithms with shared literals, x1e6 snap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.join import bloom_semi_join
from mimirsbrunn_ray.stages.rollup import tree_merge

_FORGET_MOD = 1000
_FORGET_RESIDUE = 7
_LSM_FANOUT = 10.0
_LSM_MEMTABLE = 8192
_DAY_US = 86_400_000_000


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


# ---------------------------------------------------------------------------
# right-to-be-forgotten cascade sizing
# ---------------------------------------------------------------------------


def q_forget_cascade_sizes(sf_dir):
    """For the deterministic forget-set {customers with custkey % 1000 =
    7}: how many rows each table of the cascade would delete — customer
    rows directly, orders by key match, lineitem through the
    orders->lineitem edge — the O(delta) sizing pass run BEFORE the
    actual retraction (whose algebra retractable_rollup_audit proves).
    The customer and orders filters are one vectorized modulo mask; the
    lineitem leg is the bloom-pruned EXACT semi-join against the
    forget-set's orderkeys, so nothing customer-sized ships to the
    driver. Pure int64 counts."""
    rows = {"tbl": [], "n_delete": []}

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(
        lambda b: b.filter(
            pa.array(
                b["c_custkey"].cast(pa.int64()).to_numpy() % _FORGET_MOD
                == _FORGET_RESIDUE
            )
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    rows["tbl"].append("customer")
    rows["n_delete"].append(cust.count())

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda b: _clean(b, ("o_orderkey", "o_custkey")).filter(
            pa.array(
                _clean(b, ("o_orderkey", "o_custkey"))["o_custkey"]
                .cast(pa.int64())
                .to_numpy()
                % _FORGET_MOD
                == _FORGET_RESIDUE
            )
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    rows["tbl"].append("orders")
    rows["n_delete"].append(orders.count())

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
    li_del = bloom_semi_join(
        li, orders.select_columns(["o_orderkey"]), "l_orderkey", "o_orderkey"
    )
    rows["tbl"].append("lineitem")
    rows["n_delete"].append(li_del.count())

    return pa.table(
        {
            "tbl": pa.array(rows["tbl"], pa.string()),
            "n_delete": pa.array(rows["n_delete"], pa.int64()),
        }
    )


FORGET_SQL = f"""
SELECT 'customer' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_delete
FROM customer WHERE c_custkey % {_FORGET_MOD} = {_FORGET_RESIDUE}
UNION ALL
SELECT 'lineitem', CAST(COUNT(*) AS BIGINT)
FROM lineitem l
WHERE l.l_orderkey IS NOT NULL AND EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_orderkey = l.l_orderkey
    AND o.o_custkey % {_FORGET_MOD} = {_FORGET_RESIDUE})
UNION ALL
SELECT 'orders', CAST(COUNT(*) AS BIGINT)
FROM orders
WHERE o_orderkey IS NOT NULL
  AND o_custkey % {_FORGET_MOD} = {_FORGET_RESIDUE}
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# event-id sequence gap detector
# ---------------------------------------------------------------------------


def q_event_id_gaps(sf_dir):
    """One-row lost-write detector over the event-id sequence: observed
    id span vs distinct ids — missing = span - distinct (holes mean an
    ingest batch died after claiming its id range), duplicates = rows -
    distinct (replayed writes the dedup stage must absorb). Distinct
    ids fold exactly via batch-local dedup partials + one keyed merge;
    everything int64."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["event_id"]))
        v = np.unique(b["event_id"].cast(pa.int64()).to_numpy())
        return pa.table(
            {
                "event_id": pa.array(v),
                "rows": pa.array(
                    np.where(
                        np.arange(len(v)) == 0, b.num_rows, 0
                    ).astype(np.int64)
                ),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_id"]).aggregate([("rows", "sum")])
        return g.select(["event_id", "rows_sum"]).rename_columns(
            ["event_id", "rows"]
        )

    merged = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )

    def reduce_partial(b: pa.Table) -> pa.Table:
        v = b["event_id"].to_numpy()
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "distinct_ids": pa.array([len(v)], pa.int64()),
                "mn": pa.array(
                    [int(v.min()) if len(v) else (1 << 62)], pa.int64()
                ),
                "mx": pa.array([int(v.max()) if len(v) else -1], pa.int64()),
                "rows": pa.array([int(b["rows"].to_numpy().sum())], pa.int64()),
            }
        )

    def reduce_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["k"]).aggregate(
            [("distinct_ids", "sum"), ("mn", "min"), ("mx", "max"),
             ("rows", "sum")]
        )
        return g.select(
            ["k", "distinct_ids_sum", "mn_min", "mx_max", "rows_sum"]
        ).rename_columns(["k", "distinct_ids", "mn", "mx", "rows"])

    agg = tree_merge(
        merged.map_batches(
            reduce_partial, batch_format="pyarrow", batch_size=None
        ),
        reduce_combine,
    ).to_pandas()
    if not len(agg) or int(agg["distinct_ids"].sum()) == 0:
        return pa.table(
            {
                "n_rows": pa.array([0], pa.int64()),
                "distinct_ids": pa.array([0], pa.int64()),
                "span": pa.array([0], pa.int64()),
                "missing": pa.array([0], pa.int64()),
                "duplicates": pa.array([0], pa.int64()),
            }
        )
    distinct = int(agg["distinct_ids"].sum())
    mn = int(agg["mn"].min())
    mx = int(agg["mx"].max())
    n_rows = int(agg["rows"].sum())
    span = mx - mn + 1
    return pa.table(
        {
            "n_rows": pa.array([n_rows], pa.int64()),
            "distinct_ids": pa.array([distinct], pa.int64()),
            "span": pa.array([span], pa.int64()),
            "missing": pa.array([span - distinct], pa.int64()),
            "duplicates": pa.array([n_rows - distinct], pa.int64()),
        }
    )


ID_GAPS_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS distinct_ids,
       CAST(MAX(event_id) - MIN(event_id) + 1 AS BIGINT) AS span,
       CAST(MAX(event_id) - MIN(event_id) + 1
            - COUNT(DISTINCT event_id) AS BIGINT) AS missing,
       CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) AS duplicates
FROM events WHERE event_id IS NOT NULL
"""


# ---------------------------------------------------------------------------
# LSM write-amplification model over observed daily volume
# ---------------------------------------------------------------------------


def q_lsm_write_amp_model(sf_dir):
    """Per event type: the size-tiered LSM cost model for absorbing the
    type's observed MEAN daily point volume — levels = ceil(log_fanout
    (daily / memtable)) at fanout 10 / memtable 8192, and the write
    amplification ~ 1 + levels (each point rewrites once per level) —
    the ingest-cost planning that decides memtable sizing per tier.
    Daily counts fold exact int64; the log/ceil expression mirrors with
    shared literals (LN ulp noise cannot cross a ceil boundary except
    at exact powers, where both engines compute the identical double).
    """
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        d = (us // _DAY_US).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "d": pa.array(d),
                "c": pa.array(np.ones(len(d), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "d"], ["c"])

    daily = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "d"], ["c"]),
    ).to_pandas()
    if not len(daily) or "event_type" not in daily.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "mean_daily_x1e6": pa.array([], pa.int64()),
                "levels": pa.array([], pa.int64()),
                "write_amp": pa.array([], pa.int64()),
            }
        )
    out = {
        "event_type": [], "mean_daily_x1e6": [], "levels": [], "write_amp": []
    }
    for et, g in daily.sort_values(["event_type", "d"]).groupby(
        "event_type", sort=True
    ):
        total = int(g["c"].sum())
        nb = int(g["d"].max()) - int(g["d"].min()) + 1
        mean_daily = float(total) / nb
        out["event_type"].append(et)
        out["mean_daily_x1e6"].append(
            int(_round_half_away(np.array([mean_daily * 1e6]))[0])
        )
        if mean_daily <= _LSM_MEMTABLE:
            levels = 0
        else:
            levels = int(
                np.ceil(
                    np.log(mean_daily / _LSM_MEMTABLE) / np.log(_LSM_FANOUT)
                )
            )
        out["levels"].append(levels)
        out["write_amp"].append(1 + levels)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "mean_daily_x1e6": pa.array(out["mean_daily_x1e6"], pa.int64()),
            "levels": pa.array(out["levels"], pa.int64()),
            "write_amp": pa.array(out["write_amp"], pa.int64()),
        }
    )


LSM_SQL = f"""
WITH daily AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 86400000000) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), a AS (
  SELECT event_type,
         CAST(SUM(c) AS DOUBLE)
           / (MAX(d) - MIN(d) + 1) AS mean_daily
  FROM daily GROUP BY 1
)
SELECT event_type,
       CAST(ROUND(mean_daily * 1000000, 0) AS BIGINT) AS mean_daily_x1e6,
       CAST(CASE WHEN mean_daily <= {_LSM_MEMTABLE} THEN 0
                 ELSE CEIL(LN(mean_daily / {_LSM_MEMTABLE})
                           / LN({_LSM_FANOUT!r})) END AS BIGINT) AS levels,
       CAST(1 + CASE WHEN mean_daily <= {_LSM_MEMTABLE} THEN 0
                     ELSE CEIL(LN(mean_daily / {_LSM_MEMTABLE})
                               / LN({_LSM_FANOUT!r})) END AS BIGINT)
         AS write_amp
FROM a ORDER BY 1
"""


def register_r4do(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "forget_cascade_sizes": q_forget_cascade_sizes,
            "event_id_gaps": q_event_id_gaps,
            "lsm_write_amp_model": q_lsm_write_amp_model,
        }
    )
    oracles.update(
        {
            "forget_cascade_sizes": FORGET_SQL,
            "event_id_gaps": ID_GAPS_SQL,
            "lsm_write_amp_model": LSM_SQL,
        }
    )
