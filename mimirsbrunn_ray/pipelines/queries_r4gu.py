"""Round-4 batch GU: trade balance, spend escalation, and template
detection — per-nation trade balance (revenue earned by the
nation's suppliers versus spend by its customers, the two-sided
flow a single-dimension rollup never shows), order-value
escalation (the median within-customer OLS slope of order value
over their order sequence — do accounts grow or decay?), and a
template-prefix audit per source using the classic set-LCP trick
(the common prefix of ALL texts equals the common prefix of the
lexicographic MIN and MAX — one aggregate, no pairwise scan).

Exactness discipline: trade flows are exact cents via broadcast
dimension attaches; escalation slopes fold exact (index, cents)
sums per customer with the interpolated median across customers;
the LCP is exact integer character math on both engines."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import _round_half_away
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_LCP_MAX = 256


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_NTB_COLS = ["nationkey", "supplier_rev_cents",
             "customer_spend_cents", "balance_ppm"]


def q_nation_trade_balance(sf_dir):
    """Two-sided nation flow: revenue earned by each nation's
    SUPPLIERS (discounted lineitem revenue via the supplier dim)
    versus spend by its CUSTOMERS (order totals via the customer
    dim), with the balance supplier_rev / (supplier_rev + spend)
    in ppm — 500000 is balanced trade; a one-sided rollup can
    never show the asymmetry.  Both dims broadcast; cents fold
    exactly."""
    # both dims attach via budget-gated broadcast / join
    # (stages/broadcast.py) — neither lands whole on the driver
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"])
    li = li.map_batches(
        lambda b: _valid(b, ("l_suppkey", "l_extendedprice",
                             "l_discount")),
        batch_format="pyarrow", batch_size=None)
    li = attach_dim(li, "l_suppkey", sf_dir, "supplier", "s_suppkey",
                    ["s_nationkey"], how="inner")

    def s_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "nk": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        rev = (b["l_extendedprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
            * (1.0 - b["l_discount"].cast(pa.float64()).to_numpy(
                zero_copy_only=False)))
        cents = np.where(
            rev >= 0, np.floor(rev * 100.0 + 0.5),
            np.ceil(rev * 100.0 - 0.5)).astype(np.int64)
        t = pa.table({
            "nk": pa.array(b["s_nationkey"].to_numpy(
                zero_copy_only=False).astype(np.int64)),
            "cents": pa.array(cents),
        })
        g = t.group_by(["nk"]).aggregate([("cents", "sum")])
        return g.rename_columns(["nk", "cents"])

    def n_comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["nk"]).aggregate([("cents", "sum")])
        return g.rename_columns(["nk", "cents"])

    srev = tree_merge(
        li.map_batches(s_part, batch_format="pyarrow",
                       batch_size=None),
        n_comb,
    ).to_pandas()

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"])
    orders = orders.map_batches(
        lambda b: _valid(b, ("o_custkey", "o_totalprice")),
        batch_format="pyarrow", batch_size=None)
    orders = attach_dim(orders, "o_custkey", sf_dir, "customer",
                        "c_custkey", ["c_nationkey"], how="inner")

    def c_part(b: pa.Table) -> pa.Table:
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

    cspend = tree_merge(
        orders.map_batches(c_part, batch_format="pyarrow",
                           batch_size=None),
        n_comb,
    ).to_pandas()
    if ("nk" not in srev.columns and "nk" not in cspend.columns):
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _NTB_COLS})
    s_d = (dict(zip(srev["nk"].astype(np.int64),
                    srev["cents"].astype(np.int64)))
           if "nk" in srev.columns else {})
    c_d = (dict(zip(cspend["nk"].astype(np.int64),
                    cspend["cents"].astype(np.int64)))
           if "nk" in cspend.columns else {})
    out = {c: [] for c in _NTB_COLS}
    for nk in sorted(set(s_d) | set(c_d)):
        sr = int(s_d.get(nk, 0))
        cs = int(c_d.get(nk, 0))
        if sr + cs == 0:
            continue
        out["nationkey"].append(int(nk))
        out["supplier_rev_cents"].append(sr)
        out["customer_spend_cents"].append(cs)
        out["balance_ppm"].append(
            _round_half_away(sr / (sr + cs) * 1e6))
    return pa.table(
        {c: pa.array(out[c], pa.int64()) for c in _NTB_COLS})


TRADE_SQL = """
WITH srev AS MATERIALIZED (
  SELECT s.s_nationkey AS nk,
         CAST(SUM(CAST(ROUND(l.l_extendedprice
                             * (1 - l.l_discount) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l JOIN supplier s
    ON s.s_suppkey = l.l_suppkey
  WHERE l.l_suppkey IS NOT NULL
    AND l.l_extendedprice IS NOT NULL
    AND l.l_discount IS NOT NULL
  GROUP BY 1
), cspend AS MATERIALIZED (
  SELECT c.c_nationkey AS nk,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_custkey IS NOT NULL AND o.o_totalprice IS NOT NULL
  GROUP BY 1
), nations AS (
  SELECT nk FROM srev UNION SELECT nk FROM cspend
)
SELECT CAST(n.nk AS BIGINT) AS nationkey,
       CAST(COALESCE(s.cents, 0) AS BIGINT)
         AS supplier_rev_cents,
       CAST(COALESCE(c.cents, 0) AS BIGINT)
         AS customer_spend_cents,
       CAST(ROUND(CAST(COALESCE(s.cents, 0) AS DOUBLE)
            / (COALESCE(s.cents, 0) + COALESCE(c.cents, 0))
            * 1000000, 0) AS BIGINT) AS balance_ppm
FROM nations n
LEFT JOIN srev s ON s.nk = n.nk
LEFT JOIN cspend c ON c.nk = n.nk
WHERE COALESCE(s.cents, 0) + COALESCE(c.cents, 0) > 0
ORDER BY nationkey
"""

_ESC_COLS = ["n_customers", "median_slope_x1e3",
             "share_positive_ppm"]


def q_order_value_escalation(sf_dir):
    """Account-growth census: for every customer with at least
    three orders, the OLS slope of order value (cents) over their
    order sequence index (ordered by date then orderkey); reports
    the median slope and the share of customers with a positive
    one — are accounts expanding or quietly shrinking?  Customers
    resolve in disjoint hash shards; the median across customers
    is interpolated."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderkey", "o_orderdate",
                       "o_totalprice"))
        if b.num_rows == 0:
            return pa.table({
                "cust": pa.array([], pa.int64()),
                "us": pa.array([], pa.int64()),
                "okey": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        x = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(
            x >= 0, np.floor(x * 100.0 + 0.5),
            np.ceil(x * 100.0 - 0.5)).astype(np.int64)
        t = pa.table({
            "cust": b["o_custkey"].cast(pa.int64()),
            "us": b["o_orderdate"].cast(
                pa.timestamp("us")).cast(pa.int64()),
            "okey": b["o_orderkey"].cast(pa.int64()),
            "cents": pa.array(cents),
        })
        return add_bucket(t, "cust", 64)

    def slopes(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "slope": pd.Series([], dtype=np.float64),
        })
        if len(g) == 0:
            return empty
        g = g.sort_values(["cust", "us", "okey"],
                          kind="mergesort", ignore_index=True)
        cust = g["cust"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64).astype(np.float64)
        first = np.ones(len(g), dtype=bool)
        first[1:] = cust[1:] != cust[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(g))
        rows = []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 3:
                continue
            xi = np.arange(1, n + 1, dtype=np.float64)
            yi = cents[s:e]
            sx, sy = xi.sum(), yi.sum()
            sxx = (xi * xi).sum()
            sxy = (xi * yi).sum()
            den = n * sxx - sx * sx
            if den == 0:
                continue
            rows.append((n * sxy - sx * sy) / den)
        return pd.DataFrame(
            {"slope": np.array(rows, dtype=np.float64)})

    sl = (
        orders.map_batches(project, batch_format="pyarrow",
                           batch_size=None)
        .groupby(_BUCKET)
        .map_groups(slopes, batch_format="pandas")
        .to_pandas()
    )
    if "slope" not in sl.columns or len(sl) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ESC_COLS})
    v = sl["slope"].to_numpy(np.float64)
    n = len(v)
    return pa.table({
        "n_customers": pa.array([n], pa.int64()),
        "median_slope_x1e3": pa.array(
            [_round_half_away(float(np.percentile(v, 50))
                              * 1e3)], pa.int64()),
        "share_positive_ppm": pa.array(
            [_round_half_away(float((v > 0).sum()) / n * 1e6)],
            pa.int64()),
    })


ESCALATION_SQL = """
WITH seq AS MATERIALIZED (
  SELECT o_custkey AS cust,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
           AS xi,
         CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
              AS DOUBLE) AS yi
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL
    AND o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
), st AS MATERIALIZED (
  SELECT cust, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(xi) AS sx, SUM(yi) AS sy,
         SUM(xi * xi) AS sxx, SUM(xi * yi) AS sxy
  FROM seq GROUP BY 1
), sl AS MATERIALIZED (
  SELECT cust,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
  FROM st WHERE n >= 3 AND n * sxx - sx * sx <> 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(ROUND(MEDIAN(slope) * 1000, 0) AS BIGINT)
         AS median_slope_x1e3,
       CAST(ROUND(CAST(SUM(CASE WHEN slope > 0 THEN 1 ELSE 0
                           END) AS DOUBLE) / COUNT(*)
            * 1000000, 0) AS BIGINT) AS share_positive_ppm
FROM sl HAVING COUNT(*) > 0
"""

_TPL_COLS = ["source", "n_docs", "lcp_chars"]


def q_template_prefix_audit(sf_dir):
    """Template-header detector per source using the set-LCP
    identity: the longest common prefix of ALL of a source's texts
    equals the LCP of just its lexicographic MIN and MAX — so one
    min/max aggregate replaces any pairwise scan at any scale.  A
    nonzero LCP means every document starts with the same
    boilerplate.  Min/max fold distributed; the two-string LCP is
    exact character math."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("source", "text"))
        if b.num_rows == 0:
            return pa.table({
                "source": pa.array([], pa.string()),
                "tmin": pa.array([], pa.string()),
                "tmax": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            })
        g = b.group_by(["source"]).aggregate(
            [("text", "min"), ("text", "max"),
             ([], "count_all")])
        return g.rename_columns(["source", "tmin", "tmax", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate(
            [("tmin", "min"), ("tmax", "max"), ("n", "sum")])
        return g.rename_columns(["source", "tmin", "tmax", "n"])

    mm = tree_merge(
        docs.map_batches(part, batch_format="pyarrow",
                         batch_size=None),
        comb,
    ).to_pandas()
    if "source" not in mm.columns or len(mm) == 0:
        return pa.table({
            "source": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "lcp_chars": pa.array([], pa.int64()),
        })
    mm = mm.sort_values("source", ignore_index=True)
    lcps = []
    for a, b_ in zip(mm["tmin"], mm["tmax"]):
        k = 0
        for ca, cb in zip(a[:_LCP_MAX], b_[:_LCP_MAX]):
            if ca != cb:
                break
            k += 1
        lcps.append(k)
    return pa.table({
        "source": pa.array(mm["source"], pa.string()),
        "n_docs": pa.array(mm["n"].to_numpy(np.int64)),
        "lcp_chars": pa.array(lcps, pa.int64()),
    })


TEMPLATE_SQL = f"""
WITH mm AS MATERIALIZED (
  SELECT source, MIN(text) AS tmin, MAX(text) AS tmax,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
  GROUP BY 1
)
SELECT source,
       n AS n_docs,
       CAST(COALESCE((
         SELECT MAX(r.k) FROM range(1, {_LCP_MAX + 1}) r(k)
         WHERE r.k <= LEAST(LENGTH(mm.tmin), LENGTH(mm.tmax))
           AND substr(mm.tmin, 1, CAST(r.k AS INTEGER))
                 = substr(mm.tmax, 1, CAST(r.k AS INTEGER))
       ), 0) AS BIGINT) AS lcp_chars
FROM mm ORDER BY source
"""


def register_r4gu(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "nation_trade_balance": q_nation_trade_balance,
            "order_value_escalation": q_order_value_escalation,
            "template_prefix_audit": q_template_prefix_audit,
        }
    )
    oracles.update(
        {
            "nation_trade_balance": TRADE_SQL,
            "order_value_escalation": ESCALATION_SQL,
            "template_prefix_audit": TEMPLATE_SQL,
        }
    )
