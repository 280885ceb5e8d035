"""Round-4 batch BD: supplier-side geo revenue, a Simpson's-paradox
sign audit, and above-median balance shares.

Exactness discipline: revenue is exact cents through a broadcast
dimension; covariance SIGNS are sign(n*Sxy - Sx*Sy) — pure integers,
so sign flips are engine-independent; the global median balance is the
PERCENTILE_DISC cents value under the repo-wide rank rule.
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


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# revenue by SUPPLIER nation
# ---------------------------------------------------------------------------


def q_supplier_nation_revenue(sf_dir):
    """Per SUPPLIER nation: lineitem count and exact cents extended
    price — the supply-side geography cut (the customer-side twin is
    orders_per_nation). The suppkey -> nation name map broadcasts
    (supplier |x| nation built all-Arrow, J1); the fact pass emits
    decomposable integer partials."""
    from mimirsbrunn_ray.pipelines.queries import BROADCAST_BYTE_BUDGET
    from mimirsbrunn_ray.stages.join import (
        broadcast_join,
        make_lookup_ref_arrays,
    )

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice"],
    )
    if supp.nbytes > BROADCAST_BYTE_BUDGET:  # pragma: no cover - scale
        raise NotImplementedError(
            "distributed-dim fallback: Dataset.join lineitem to supplier"
        )
    dim = supp.join(nation, keys="s_nationkey", right_keys="n_nationkey")
    lookup = make_lookup_ref_arrays(
        dim["s_suppkey"].to_numpy(zero_copy_only=False),
        dim["n_name"].to_numpy(zero_copy_only=False),
    )
    joined = broadcast_join(
        li, lookup, key_col="l_suppkey", out_col="n_name",
        out_type=pa.string(),
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.is_valid(b["n_name"]), pc.is_valid(b["l_extendedprice"])
            )
        )
        x = _round_half_away(
            b["l_extendedprice"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        t = pa.table({"n_name": b["n_name"], "x": pa.array(x)})
        g = t.group_by(["n_name"]).aggregate(
            [([], "count_all"), ("x", "sum")]
        )
        g = g.select(["n_name", "count_all", "x_sum"])
        return g.rename_columns(["n_name", "n_items", "revenue_x100"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["n_name"]).aggregate(
            [("n_items", "sum"), ("revenue_x100", "sum")]
        )
        return g.rename_columns(["n_name", "n_items", "revenue_x100"])

    return tree_merge(
        joined.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        combine,
    )


SUPPLIER_NATION_SQL = """
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
            AS BIGINT) AS revenue_x100
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE l.l_extendedprice IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Simpson's paradox audit on the value-vs-hour covariance sign
# ---------------------------------------------------------------------------


def q_simpson_sign_audit(sf_dir):
    """Simpson's-paradox audit: the EXACT covariance sign between value
    and hour-of-day, pooled AND per event type — sign(n*Sxy - Sx*Sy)
    over integer sums, so a per-type sign flipping against the pooled
    sign is engine-independent evidence of confounding by type. Output:
    the pooled sign and per-type signs with a flip flag. One
    decomposable sextuple pass."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["event_type"]), pc.is_valid(b["value"])
                ),
                pc.is_valid(b["ts"]),
            )
        )
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        hod = ((ts_us // _HOUR_US) % 24).astype(np.int64)
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "x": pa.array(x),
                "h": pa.array(hod),
                "xh": pa.array(x * hod),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [([], "count_all"), ("x", "sum"), ("h", "sum"), ("xh", "sum")]
        )
        g = g.select(["event_type", "count_all", "x_sum", "h_sum",
                      "xh_sum"])
        return g.rename_columns(["event_type", "n", "sx", "sh", "sxh"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sh", "sum"), ("sxh", "sum")]
        )
        return g.rename_columns(["event_type", "n", "sx", "sh", "sxh"])

    m = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: one row per type

    if not len(m):
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "group_sign": pa.array([], pa.int64()),
                "pooled_sign": pa.array([], pa.int64()),
                "flipped": pa.array([], pa.int64()),
            }
        )
    n_t = int(m["n"].sum())
    sx_t = int(m["sx"].sum())
    sh_t = int(m["sh"].sum())
    sxh_t = int(m["sxh"].sum())
    pooled = int(np.sign(n_t * sxh_t - sx_t * sh_t))
    m = m.sort_values("event_type", ignore_index=True)
    gs = np.sign(
        m["n"].to_numpy(dtype=np.int64) * m["sxh"].to_numpy(dtype=np.int64)
        - m["sx"].to_numpy(dtype=np.int64)
        * m["sh"].to_numpy(dtype=np.int64)
    ).astype(np.int64)
    return pa.table(
        {
            "event_type": pa.array(m["event_type"], pa.string()),
            "group_sign": pa.array(gs),
            "pooled_sign": pa.array(
                np.full(len(m), pooled, dtype=np.int64)
            ),
            "flipped": pa.array(
                ((gs != 0) & (gs != pooled)).astype(np.int64)
            ),
        }
    )


SIMPSON_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x,
         CAST(hour(ts) AS BIGINT) AS h
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
), g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(h) AS BIGINT) AS sh,
         CAST(SUM(x * h) AS BIGINT) AS sxh
  FROM v GROUP BY 1
), p AS (
  SELECT CAST(SIGN(SUM(n) * SUM(sxh) - SUM(sx) * SUM(sh)) AS BIGINT)
           AS pooled_sign
  FROM g
)
SELECT g.event_type,
       CAST(SIGN(g.n * g.sxh - g.sx * g.sh) AS BIGINT) AS group_sign,
       p.pooled_sign,
       CAST(CASE WHEN SIGN(g.n * g.sxh - g.sx * g.sh) <> 0
                  AND SIGN(g.n * g.sxh - g.sx * g.sh) <> p.pooled_sign
                 THEN 1 ELSE 0 END AS BIGINT) AS flipped
FROM g, p
"""


# ---------------------------------------------------------------------------
# share of customers above the GLOBAL median balance, per nation
# ---------------------------------------------------------------------------


def q_nation_above_median_balance(sf_dir):
    """Per nation: customers above the GLOBAL median account balance —
    the relative-wealth geography cut where the threshold itself is a
    data-derived exact PERCENTILE_DISC cents value (the repo-wide
    ceil(q*n) rank rule), then one broadcast-threshold pass with the
    nation name attached via the J1 dimension map."""
    from mimirsbrunn_ray.pipelines.queries import BROADCAST_BYTE_BUDGET
    from mimirsbrunn_ray.stages.join import (
        broadcast_join,
        make_lookup_ref_arrays,
    )

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["c_acctbal"]))
        x = _round_half_away(
            b["c_acctbal"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        t = pa.table({"v": pa.array(x)})
        g = t.group_by(["v"]).aggregate([([], "count_all")])
        g = g.select(["v", "count_all"])
        return g.rename_columns(["v", "n"])

    def hist_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["v"]).aggregate([("n", "sum")])
        return g.rename_columns(["v", "n"])

    hist = tree_merge(
        cust.map_batches(hist_partial, batch_format="pyarrow",
                         batch_size=None),
        hist_combine,
    ).to_pandas()
    from mimirsbrunn_ray.stages.broadcast import ensure_cols

    hist = ensure_cols(hist, ["v", "n"]).sort_values("v")
    if not len(hist):  # empty-corpus guard
        return pa.table({
            "n_name": pa.array([], pa.string()),
            "n_customers": pa.array([], pa.int64()),
            "n_above": pa.array([], pa.int64()),
            "share_ppm": pa.array([], pa.int64()),
        })
    v = hist["v"].to_numpy(dtype=np.int64)
    cum = np.cumsum(hist["n"].to_numpy(dtype=np.int64))
    total = int(cum[-1])
    rank = int(np.ceil(0.5 * total - 1e-9))
    med = int(v[np.searchsorted(cum, rank, "left")])

    lookup = make_lookup_ref_arrays(
        nation["n_nationkey"].to_numpy(zero_copy_only=False),
        nation["n_name"].to_numpy(zero_copy_only=False),
    )
    joined = broadcast_join(
        cust, lookup, key_col="c_nationkey", out_col="n_name",
        out_type=pa.string(),
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["n_name"]), pc.is_valid(b["c_acctbal"]))
        )
        x = _round_half_away(
            b["c_acctbal"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        t = pa.table(
            {
                "n_name": b["n_name"],
                "one": pa.array(np.ones(len(x), np.int64)),
                "above": pa.array((x > med).astype(np.int64)),
            }
        )
        g = t.group_by(["n_name"]).aggregate(
            [("one", "sum"), ("above", "sum")]
        )
        g = g.select(["n_name", "one_sum", "above_sum"])
        return g.rename_columns(["n_name", "n_customers", "n_above"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["n_name"]).aggregate(
            [("n_customers", "sum"), ("n_above", "sum")]
        )
        return g.rename_columns(["n_name", "n_customers", "n_above"])

    out = tree_merge(
        joined.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        combine,
    ).to_pandas().sort_values("n_name", ignore_index=True)
    return pa.table(
        {
            "n_name": pa.array(out["n_name"], pa.string()),
            "n_customers": pa.array(
                out["n_customers"].to_numpy(dtype=np.int64)
            ),
            "n_above": pa.array(out["n_above"].to_numpy(dtype=np.int64)),
            "median_x100": pa.array(
                np.full(len(out), med, dtype=np.int64)
            ),
        }
    )


ABOVE_MEDIAN_SQL = """
WITH v AS MATERIALIZED (
  SELECT c_nationkey,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS x
  FROM customer WHERE c_acctbal IS NOT NULL
), m AS (
  SELECT CAST(quantile_disc(x, 0.5) AS BIGINT) AS med FROM v
)
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN v.x > m.med THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above,
       m.med AS median_x100
FROM v JOIN nation n ON n.n_nationkey = v.c_nationkey
CROSS JOIN m
GROUP BY 1, m.med
"""


def register_r4bd(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "supplier_nation_revenue": q_supplier_nation_revenue,
            "simpson_sign_audit": q_simpson_sign_audit,
            "nation_above_median_balance": q_nation_above_median_balance,
        }
    )
    oracles.update(
        {
            "supplier_nation_revenue": SUPPLIER_NATION_SQL,
            "simpson_sign_audit": SIMPSON_SQL,
            "nation_above_median_balance": ABOVE_MEDIAN_SQL,
        }
    )
