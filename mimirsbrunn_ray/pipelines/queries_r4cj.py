"""Round-4 batch CJ: the two remaining TPC-H shapes (Q21 waiting
suppliers, Q22 global sales opportunity) plus a per-type G-test
(log-likelihood-ratio) hour-uniformity statistic.

Q21/Q22 close the full 22-query TPC-H suite on the available columns
(no commitdate/receiptdate/phone in the test tables, so each docstring
states the structural mapping). Exactness discipline: money quantizes
to int64 cents BEFORE any sum or compare; the Q22 average threshold is
an integer cross-multiplication (no float average feeds a filter); the
G statistic folds exact int64 hour counts and evaluates ONE mirrored
double expression per type, x1e6 snap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.context import pool_size
from mimirsbrunn_ray.pipelines.queries_r4d import _dim_pd
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.join import bloom_anti_join
from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000
_Q21_LATE_DAYS = 90
_Q21_LATE_US = np.int64(_Q21_LATE_DAYS) * 86_400_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


# ---------------------------------------------------------------------------
# TPC-H Q21: suppliers who kept finished multi-supplier orders waiting
# ---------------------------------------------------------------------------


def q_tpch_q21_waiting_suppliers(sf_dir):
    """TPC-H Q21's structural core on the available columns: for FINISHED
    orders ('F') involving >= 2 distinct suppliers, count per supplier
    the orders where that supplier was the ONLY late one (late =
    l_shipdate > o_orderdate + 90 days, the Q12 lag proxy for the
    missing receipt-vs-commit columns). The reference query's
    EXISTS/NOT-EXISTS double self-join folds to per-order supplier
    statistics: one big-big lineitem x orders exchange carries only
    (orderkey, suppkey, shipdate) x (orderkey, date); per-batch distinct
    (order, supplier, late-max) partials shrink the order-bucket
    shuffle; inside each hash bucket every row of an order is co-located
    so n_supp / n_late are exact; per-supplier waits tree-merge and the
    bounded supplier table takes names from a broadcast dim. Top 100 by
    (numwait DESC, s_name) mirrors the reference ordering."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
    ).map_batches(
        lambda b: b.filter(pc.equal(b["o_orderstatus"], "F")),
        batch_format="pyarrow",
        batch_size=None,
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

    n_part = max(8, pool_size())
    joined = _safe_join(
        li,
        orders.select_columns(["o_orderkey", "o_orderdate"]),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        join_type="inner",
        num_partitions=n_part,
    )

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(b["l_orderkey"]), pc.is_valid(b["l_suppkey"])),
            pc.and_(pc.is_valid(b["l_shipdate"]), pc.is_valid(b["o_orderdate"])),
        )
        b = b.filter(m)
        ship = b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
        ordd = b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
        late = (
            ship.to_numpy() - ordd.to_numpy() > _Q21_LATE_US
        ).astype(np.int64)
        t = pa.table(
            {
                "o": b["l_orderkey"].cast(pa.int64()),
                "s": b["l_suppkey"].cast(pa.int64()),
                "late": pa.array(late),
            }
        )
        # batch-local combiner: distinct (order, supplier) with late OR-ed
        g = t.group_by(["o", "s"]).aggregate([("late", "max")])
        g = g.select(["o", "s", "late_max"]).rename_columns(["o", "s", "late"])
        return add_bucket(g, "o", 64)

    pairs = joined.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "s": pd.Series([], dtype=np.int64),
                "numwait": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        # cross-batch re-distinct: the same (order, supplier) pair can
        # arrive from several batch partials
        d = (
            g.groupby(["o", "s"], sort=False)["late"]
            .max()
            .reset_index()
        )
        per_o = d.groupby("o", sort=False)["late"].agg(["size", "sum"])
        per_o.columns = ["n_supp", "n_late"]
        d = d.merge(per_o, left_on="o", right_index=True)
        win = d[(d["late"] == 1) & (d["n_supp"] >= 2) & (d["n_late"] == 1)]
        if not len(win):
            return empty
        out = win.groupby("s", sort=False).size().rename("numwait").reset_index()
        return out.astype({"s": np.int64, "numwait": np.int64})

    waits = tree_merge(
        pairs.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas"),
        lambda b: _sum_by(b, ["s"], ["numwait"]),
    ).to_pandas()  # bounded: one row per supplier

    sup = _dim_pd(sf_dir, "supplier", ["s_suppkey", "s_name"])
    names = dict(
        zip(
            sup["s_suppkey"].to_numpy().astype(np.int64),
            sup["s_name"].to_pylist(),
        )
    )
    if not len(waits) or "s" not in waits.columns:
        return pa.table(
            {
                "s_name": pa.array([], pa.string()),
                "numwait": pa.array([], pa.int64()),
            }
        )
    waits["s_name"] = waits["s"].map(names)
    waits = waits.dropna(subset=["s_name"]).sort_values(
        ["numwait", "s_name"], ascending=[False, True], ignore_index=True
    ).head(100)
    return pa.table(
        {
            "s_name": pa.array(waits["s_name"].tolist(), pa.string()),
            "numwait": pa.array(
                waits["numwait"].to_numpy(dtype=np.int64)
            ),
        }
    )


TPCH_Q21_SQL = f"""
WITH l AS (
  SELECT l.l_orderkey AS o, l.l_suppkey AS s,
         MAX(CASE WHEN l.l_shipdate > o2.o_orderdate
                       + INTERVAL {_Q21_LATE_DAYS} DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem l
  JOIN orders o2 ON o2.o_orderkey = l.l_orderkey
  WHERE o2.o_orderstatus = 'F'
    AND l.l_orderkey IS NOT NULL AND l.l_suppkey IS NOT NULL
    AND l.l_shipdate IS NOT NULL AND o2.o_orderdate IS NOT NULL
  GROUP BY 1, 2
), per AS (
  SELECT o, CAST(COUNT(*) AS BIGINT) AS n_supp,
         CAST(SUM(late) AS BIGINT) AS n_late
  FROM l GROUP BY 1
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM l
JOIN per ON per.o = l.o
JOIN supplier s ON s.s_suppkey = l.s
WHERE l.late = 1 AND per.n_supp >= 2 AND per.n_late = 1
GROUP BY 1
ORDER BY numwait DESC, s.s_name
LIMIT 100
"""


# ---------------------------------------------------------------------------
# TPC-H Q22: rich idle customers per country-code bucket
# ---------------------------------------------------------------------------

_Q22_CODES = (0, 1, 2, 3, 4, 5, 6)  # c_nationkey % 10 buckets (phone proxy)
_Q22_CUTOFF = "2001-01-01"  # "idle" = no orders at/after this date


def q_tpch_q22_global_sales(sf_dir):
    """TPC-H Q22's structural core: per country-code bucket (the tables
    carry no c_phone, so cntrycode = c_nationkey % 10 restricted to 7
    buckets), count customers whose account balance exceeds the average
    POSITIVE balance of the bucket set AND who placed no RECENT orders
    (the synthetic corpus gives every customer at least one lifetime
    order, so Q22's "no orders" becomes "no orders since 2001-01-01" —
    same NOT-EXISTS structure, non-degenerate result), with their total
    balance. Balances quantize to int64 cents on read; the scalar
    average threshold applies as the exact cross-multiplication
    ``bal_e2 * n_pos > sum_pos_e2``; the no-recent-orders predicate is
    the packaged bloom-pruned EXACT anti-join (D4 family) over the
    date-filtered orders scan, so only maybe-present custkeys pay the
    verify shuffle."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def prep(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(b["c_custkey"]), pc.is_valid(b["c_nationkey"])),
            pc.is_valid(b["c_acctbal"]),
        )
        b = b.filter(m)
        code = (
            b["c_nationkey"].cast(pa.int64()).to_numpy() % 10
        ).astype(np.int64)
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64)
        bal_e2 = _round_half_away(bal * 100.0)
        keep = np.isin(code, np.asarray(_Q22_CODES, dtype=np.int64))
        return pa.table(
            {
                "c_custkey": b["c_custkey"].cast(pa.int64()),
                "cntrycode": pa.array(code),
                "bal_e2": pa.array(bal_e2),
            }
        ).filter(pa.array(keep))

    pool = cust.map_batches(prep, batch_format="pyarrow", batch_size=None)

    # scalar threshold: average positive balance over the bucket set,
    # folded as exact int64 (sum_pos_e2, n_pos) partials
    def thr_partial(b: pa.Table) -> pa.Table:
        bal = b["bal_e2"].to_numpy()
        pos = bal > 0
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "sum_pos_e2": pa.array([int(bal[pos].sum())], pa.int64()),
                "n_pos": pa.array([int(pos.sum())], pa.int64()),
            }
        )

    thr = tree_merge(
        pool.map_batches(thr_partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["k"], ["sum_pos_e2", "n_pos"]),
    ).to_pandas()
    sum_pos = int(thr["sum_pos_e2"].iloc[0]) if len(thr) else 0
    n_pos = int(thr["n_pos"].iloc[0]) if len(thr) else 0

    if n_pos == 0:
        return pa.table(
            {
                "cntrycode": pa.array([], pa.int64()),
                "numcust": pa.array([], pa.int64()),
                "totacctbal_e2": pa.array([], pa.int64()),
            }
        )

    def rich_mask(b: pa.Table) -> pa.Table:
        bal = b["bal_e2"].to_numpy()
        return b.filter(pa.array(bal * n_pos > sum_pos))  # exact cross-mult

    rich = pool.map_batches(rich_mask, batch_format="pyarrow", batch_size=None)
    cutoff_us = np.int64(
        pd.Timestamp(_Q22_CUTOFF).value // 1000
    )  # pandas ns -> us

    recent = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(
            pa.array(
                b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
                .to_numpy(zero_copy_only=False)
                >= cutoff_us
            )
        ).select(["o_custkey"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    idle = bloom_anti_join(rich, recent, "c_custkey", "o_custkey")

    out = tree_merge(
        idle.map_batches(
            lambda b: _sum_by(
                b.append_column(
                    "numcust", pa.array(np.ones(b.num_rows, np.int64))
                ).select(["cntrycode", "numcust", "bal_e2"]),
                ["cntrycode"],
                ["numcust", "bal_e2"],
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        lambda b: _sum_by(b, ["cntrycode"], ["numcust", "bal_e2"]),
    ).to_pandas()
    if not len(out) or "cntrycode" not in out.columns:
        return pa.table(
            {
                "cntrycode": pa.array([], pa.int64()),
                "numcust": pa.array([], pa.int64()),
                "totacctbal_e2": pa.array([], pa.int64()),
            }
        )
    out = out.sort_values("cntrycode", ignore_index=True)
    return pa.table(
        {
            "cntrycode": pa.array(out["cntrycode"].to_numpy(dtype=np.int64)),
            "numcust": pa.array(out["numcust"].to_numpy(dtype=np.int64)),
            "totacctbal_e2": pa.array(out["bal_e2"].to_numpy(dtype=np.int64)),
        }
    )


TPCH_Q22_SQL = f"""
WITH pool AS (
  SELECT c_custkey, c_nationkey % 10 AS cntrycode,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_e2
  FROM customer
  WHERE c_custkey IS NOT NULL AND c_nationkey IS NOT NULL
    AND c_acctbal IS NOT NULL
    AND c_nationkey % 10 IN {_Q22_CODES}
), thr AS (
  SELECT CAST(SUM(CASE WHEN bal_e2 > 0 THEN bal_e2 ELSE 0 END) AS BIGINT)
           AS sum_pos,
         CAST(SUM(CASE WHEN bal_e2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
  FROM pool
)
SELECT p.cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(p.bal_e2) AS BIGINT) AS totacctbal_e2
FROM pool p, thr
WHERE p.bal_e2 * thr.n_pos > thr.sum_pos
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = p.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}')
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# G-test (log-likelihood ratio) hour-of-day uniformity per event type
# ---------------------------------------------------------------------------


def q_gtest_hour_uniformity(sf_dir):
    """Per event type: the G-statistic (likelihood-ratio chi-square,
    Sokal & Rohlf) testing hour-of-day uniformity —
    G = 2 * sum_h O_h * ln(24 * O_h / n). The additive companion to the
    Pearson chi-square query: G decomposes exactly across partitions of
    the categories, which is why it is the independence test of choice
    for hierarchical fold-ups. Hour counts are exact int64 from one
    combiner-first pass (types x 24 bounded); the single final
    expression is mirrored token-for-token vs DuckDB (unobserved hours
    contribute 0 = lim O->0 of O ln O), x1e6 snap."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"]))
        b = b.filter(m)
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        h = ((us // _HOUR_US) % 24).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "h": pa.array(h),
                "o": pa.array(np.ones(len(h), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "h"], ["o"])

    cont = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "h"], ["o"]),
    ).to_pandas()  # bounded: types x 24

    if not len(cont) or "event_type" not in cont.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "g_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "n": [], "g_x1e6": []}
    for et, g in cont.sort_values(["event_type", "h"]).groupby(
        "event_type", sort=True
    ):
        o = g["o"].to_numpy(dtype=np.int64)
        n = int(o.sum())
        gstat = 2.0 * float(
            np.sum(o * np.log(o.astype(np.float64) * 24 / n))
        )
        out["event_type"].append(et)
        out["n"].append(n)
        out["g_x1e6"].append(
            int(_round_half_away(np.array([gstat * 1e6]))[0])
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "g_x1e6": pa.array(out["g_x1e6"], pa.int64()),
        }
    )


GTEST_SQL = """
WITH c AS (
  SELECT event_type, hour(ts) AS h, CAST(COUNT(*) AS BIGINT) AS o
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), tot AS (
  SELECT event_type, CAST(SUM(o) AS BIGINT) AS n FROM c GROUP BY 1
)
SELECT c.event_type, tot.n,
       CAST(ROUND(2.0 * SUM(c.o * LN(CAST(c.o AS DOUBLE) * 24 / tot.n))
                  * 1000000, 0) AS BIGINT) AS g_x1e6
FROM c JOIN tot ON tot.event_type = c.event_type
GROUP BY 1, 2
ORDER BY 1
"""


def register_r4cj(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "tpch_q21_waiting_suppliers": q_tpch_q21_waiting_suppliers,
            "tpch_q22_global_sales": q_tpch_q22_global_sales,
            "gtest_hour_uniformity": q_gtest_hour_uniformity,
        }
    )
    oracles.update(
        {
            "tpch_q21_waiting_suppliers": TPCH_Q21_SQL,
            "tpch_q22_global_sales": TPCH_Q22_SQL,
            "gtest_hour_uniformity": GTEST_SQL,
        }
    )
