"""Round-4 batch GV: counterparty risk, regional concentration,
and simultaneity — supplier negative-balance risk (suppliers in
the red and the revenue share flowing through them — the
counterparty-exposure number), per-region revenue HHI over its
nations (the region dimension's concentration census: is a
region's demand one nation in a trench coat?), and the
simultaneous-type collision census (seconds in which two or more
DIFFERENT event types fire — the interleaving pressure on any
per-second dedup or ordering logic).

Exactness discipline: balances compare at exact cents; HHI folds
exact spend-cents shares per region; collision counts are pure
integer distinct-type-per-second tallies."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import _round_half_away
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_SNB_COLS = ["n_suppliers", "n_negative", "negative_ppm",
             "revenue_exposed_ppm"]


def q_supplier_negative_balance_risk(sf_dir):
    """Counterparty exposure: suppliers whose account balance is
    negative (at exact cents) and the share of total discounted
    revenue flowing through them — the revenue a credit freeze on
    distressed suppliers would interrupt.  The supplier dim
    broadcasts; revenue cents fold exactly."""
    # supplier counts reduce distributed; the balance attaches to
    # lineitem via budget-gated broadcast / join — the dim never lands
    # whole on the driver
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    def s_count(b: pa.Table) -> pa.Table:
        b = _valid(b, ("s_suppkey", "s_acctbal"))
        if b.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "neg": pa.array([], pa.int64())})
        bal = b["s_acctbal"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        bc = np.where(
            bal >= 0, np.floor(bal * 100.0 + 0.5),
            np.ceil(bal * 100.0 - 0.5)).astype(np.int64)
        return pa.table({
            "n": pa.array([np.int64(b.num_rows)]),
            "neg": pa.array([np.int64((bc < 0).sum())]),
        })

    sc = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_acctbal"],
    ).map_batches(s_count, batch_format="pyarrow",
                  batch_size=None).to_pandas()
    n_supp = int(sc["n"].sum()) if "n" in sc.columns else 0
    n_neg = int(sc["neg"].sum()) if "neg" in sc.columns else 0
    if n_supp == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SNB_COLS})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"])
    li = li.map_batches(
        lambda b: _valid(b, ("l_suppkey", "l_extendedprice",
                             "l_discount")),
        batch_format="pyarrow", batch_size=None)
    # left attach: every lineitem counts in the total, only matched
    # negative-balance suppliers count as exposed (the dict semantics)
    li = attach_dim(li, "l_suppkey", sf_dir, "supplier", "s_suppkey",
                    ["s_acctbal"], how="left")

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "total": pa.array([], pa.int64()),
                "exposed": pa.array([], pa.int64()),
            })
        rev = (b["l_extendedprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
            * (1.0 - b["l_discount"].cast(pa.float64()).to_numpy(
                zero_copy_only=False)))
        cents = np.where(
            rev >= 0, np.floor(rev * 100.0 + 0.5),
            np.ceil(rev * 100.0 - 0.5)).astype(np.int64)
        bal_col = b["s_acctbal"]
        valid = pc.is_valid(bal_col).to_numpy(zero_copy_only=False)
        bal = bal_col.to_numpy(zero_copy_only=False).astype(np.float64)
        bal = np.where(valid, bal, 0.0)
        bc = np.where(
            bal >= 0, np.floor(bal * 100.0 + 0.5),
            np.ceil(bal * 100.0 - 0.5)).astype(np.int64)
        is_neg = valid & (bc < 0)
        return pa.table({
            "total": pa.array([int(cents.sum())], pa.int64()),
            "exposed": pa.array(
                [int(cents[is_neg].sum())], pa.int64()),
        })

    def comb(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "total": pa.array([], pa.int64()),
                "exposed": pa.array([], pa.int64()),
            })
        return pa.table({
            c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
            for c in ["total", "exposed"]})

    t = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if ("total" not in t.columns or len(t) == 0
            or n_supp == 0 or int(t["total"].iloc[0]) == 0):
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SNB_COLS})
    total = int(t["total"].iloc[0])
    exposed = int(t["exposed"].iloc[0])
    return pa.table({
        "n_suppliers": pa.array([n_supp], pa.int64()),
        "n_negative": pa.array([n_neg], pa.int64()),
        "negative_ppm": pa.array(
            [_round_half_away(n_neg / n_supp * 1e6)], pa.int64()),
        "revenue_exposed_ppm": pa.array(
            [_round_half_away(exposed / total * 1e6)],
            pa.int64()),
    })


SNB_SQL = """
WITH s AS MATERIALIZED (
  SELECT s_suppkey,
         CASE WHEN CAST(ROUND(s_acctbal * 100, 0) AS BIGINT) < 0
              THEN 1 ELSE 0 END AS neg
  FROM supplier
  WHERE s_suppkey IS NOT NULL AND s_acctbal IS NOT NULL
), sc AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_supp,
         CAST(SUM(neg) AS BIGINT) AS n_neg
  FROM s
), rev AS MATERIALIZED (
  SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice
                             * (1 - l.l_discount) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS total,
         CAST(SUM(CASE WHEN s.neg = 1 THEN
                CAST(ROUND(l.l_extendedprice
                           * (1 - l.l_discount) * 100, 0)
                     AS BIGINT) ELSE 0 END) AS BIGINT)
           AS exposed
  FROM lineitem l JOIN s ON s.s_suppkey = l.l_suppkey
  WHERE l.l_extendedprice IS NOT NULL
    AND l.l_discount IS NOT NULL
)
SELECT sc.n_supp AS n_suppliers,
       sc.n_neg AS n_negative,
       CAST(ROUND(CAST(sc.n_neg AS DOUBLE) / sc.n_supp
            * 1000000, 0) AS BIGINT) AS negative_ppm,
       CAST(ROUND(CAST(rev.exposed AS DOUBLE) / rev.total
            * 1000000, 0) AS BIGINT) AS revenue_exposed_ppm
FROM sc CROSS JOIN rev
WHERE sc.n_supp > 0 AND rev.total <> 0
"""

_RH_COLS = ["regionkey", "n_nations", "spend_cents", "hhi_ppm"]


def q_region_revenue_hhi(sf_dir):
    """Regional demand concentration: per region, the HHI over its
    member nations' customer spend shares (sum of squared shares,
    in ppm — 1e6 means one nation IS the region) — the roll-up the
    region dimension exists for and flat nation tables never show.
    Both dims broadcast; spend cents fold exactly."""
    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_regionkey"]).to_pandas()
    if "n_nationkey" not in nat.columns:
        nat = pd.DataFrame({"n_nationkey": [], "n_regionkey": []})
    reg_map = dict(zip(nat["n_nationkey"].astype(np.int64),
                       nat["n_regionkey"].astype(np.int64)))
    # the customer nation attaches via budget-gated broadcast / join
    # (stages/broadcast.py) — the customer dim never lands whole on the
    # driver; the nation->region map is 25 rows (reference-blessed)
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"])
    orders = orders.map_batches(
        lambda b: _valid(b, ("o_custkey", "o_totalprice")),
        batch_format="pyarrow", batch_size=None)
    orders = attach_dim(orders, "o_custkey", sf_dir, "customer",
                        "c_custkey", ["c_nationkey"], how="inner")

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "nk": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        x = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(
            x >= 0, np.floor(x * 100.0 + 0.5),
            np.ceil(x * 100.0 - 0.5)).astype(np.int64)
        t = pa.table({
            "nk": pa.array(b["c_nationkey"].to_numpy(
                zero_copy_only=False).astype(np.int64)),
            "cents": pa.array(cents),
        })
        g = t.group_by(["nk"]).aggregate([("cents", "sum")])
        return g.rename_columns(["nk", "cents"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["nk"]).aggregate([("cents", "sum")])
        return g.rename_columns(["nk", "cents"])

    ns = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
    ).to_pandas()
    if "nk" not in ns.columns or len(ns) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _RH_COLS})
    ns["rk"] = ns["nk"].astype(np.int64).map(reg_map)
    ns = ns.dropna(subset=["rk"])
    out = {c: [] for c in _RH_COLS}
    for rk, g in ns.groupby("rk", sort=True):
        cents = g["cents"].to_numpy(np.int64)
        tot = int(cents.sum())
        if tot == 0:
            continue
        shares = cents.astype(np.float64) / tot
        hhi = float((shares * shares).sum())
        out["regionkey"].append(int(rk))
        out["n_nations"].append(len(g))
        out["spend_cents"].append(tot)
        out["hhi_ppm"].append(_round_half_away(hhi * 1e6))
    return pa.table(
        {c: pa.array(out[c], pa.int64()) for c in _RH_COLS})


REGION_HHI_SQL = """
WITH ns AS MATERIALIZED (
  SELECT c.c_nationkey AS nk,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_custkey IS NOT NULL AND o.o_totalprice IS NOT NULL
  GROUP BY 1
), rr AS MATERIALIZED (
  SELECT n.n_regionkey AS rk, ns.nk, ns.cents
  FROM ns JOIN nation n ON n.n_nationkey = ns.nk
), tot AS MATERIALIZED (
  SELECT rk, CAST(SUM(cents) AS BIGINT) AS t
  FROM rr GROUP BY 1
)
SELECT CAST(rr.rk AS BIGINT) AS regionkey,
       CAST(COUNT(*) AS BIGINT) AS n_nations,
       CAST(ANY_VALUE(tot.t) AS BIGINT) AS spend_cents,
       CAST(ROUND(SUM((CAST(rr.cents AS DOUBLE) / tot.t)
                      * (CAST(rr.cents AS DOUBLE) / tot.t))
            * 1000000, 0) AS BIGINT) AS hhi_ppm
FROM rr JOIN tot USING (rk)
WHERE tot.t <> 0
GROUP BY rr.rk
ORDER BY regionkey
"""

_SIM_COLS = ["n_active_seconds", "n_collision_seconds",
             "collision_ppm", "max_types_per_sec"]


def q_simultaneous_type_collisions(sf_dir):
    """Interleaving pressure: among seconds with any activity, the
    share in which two or more DIFFERENT event types fire (and the
    maximum distinct types ever packed into one second) — the
    stress number for per-second dedup keys, ordering
    assumptions, and clock-resolution bugs.  Distinct (second,
    type) pairs fold exactly in one distributed pass."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({
            "sec": pc.divide(us, 1_000_000),
            "event_type": b["event_type"],
        })
        return t.group_by(["sec", "event_type"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["sec", "event_type"]).group_by(
            ["sec", "event_type"]).aggregate([])

    st = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["sec"],
    )

    def sec_counts(b: pa.Table) -> pa.Table:
        cols = ["n_sec", "n_coll", "max_types"]
        if b.num_rows == 0 or "sec" not in b.column_names:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in cols})
        g = b.select(["sec"]).group_by(["sec"]).aggregate(
            [([], "count_all")])
        n = g["count_all"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_sec": pa.array([len(n)], pa.int64()),
            "n_coll": pa.array([int((n >= 2).sum())], pa.int64()),
            "max_types": pa.array([int(n.max())], pa.int64()),
        })

    def comb(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "n_sec": pa.array([], pa.int64()),
                "n_coll": pa.array([], pa.int64()),
                "max_types": pa.array([], pa.int64()),
            })
        return pa.table({
            "n_sec": pa.array([pc.sum(b["n_sec"]).as_py() or 0],
                              pa.int64()),
            "n_coll": pa.array(
                [pc.sum(b["n_coll"]).as_py() or 0], pa.int64()),
            "max_types": pa.array(
                [pc.max(b["max_types"]).as_py() or 0],
                pa.int64()),
        })

    t = tree_merge(
        st.map_batches(sec_counts, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "n_sec" not in t.columns or len(t) == 0 or int(
            t["n_sec"].iloc[0]) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SIM_COLS})
    n_sec = int(t["n_sec"].iloc[0])
    n_coll = int(t["n_coll"].iloc[0])
    return pa.table({
        "n_active_seconds": pa.array([n_sec], pa.int64()),
        "n_collision_seconds": pa.array([n_coll], pa.int64()),
        "collision_ppm": pa.array(
            [_round_half_away(n_coll / n_sec * 1e6)], pa.int64()),
        "max_types_per_sec": pa.array(
            [int(t["max_types"].iloc[0])], pa.int64()),
    })


SIM_SQL = """
WITH st AS MATERIALIZED (
  SELECT EPOCH_US(ts) // 1000000 AS sec,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_active_seconds,
       CAST(SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_collision_seconds,
       CAST(ROUND(CAST(SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*) * 1000000, 0)
            AS BIGINT) AS collision_ppm,
       CAST(MAX(k) AS BIGINT) AS max_types_per_sec
FROM st HAVING COUNT(*) > 0
"""


def register_r4gv(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "supplier_negative_balance_risk":
                q_supplier_negative_balance_risk,
            "region_revenue_hhi": q_region_revenue_hhi,
            "simultaneous_type_collisions":
                q_simultaneous_type_collisions,
        }
    )
    oracles.update(
        {
            "supplier_negative_balance_risk": SNB_SQL,
            "region_revenue_hhi": REGION_HHI_SQL,
            "simultaneous_type_collisions": SIM_SQL,
        }
    )
