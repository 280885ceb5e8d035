"""Round-4 batch BB: market-segment revenue profile, cross-table KS,
and weekly JSON-property drift.

Exactness discipline: revenue and balances are exact cents; the
cross-table KS keeps the integer numerator max|ca*nb - cb*na|; weekly
property sums are exact integers from the vectorized JSON extraction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_WEEK_US = 7 * 86_400_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# revenue profile per market segment
# ---------------------------------------------------------------------------


def q_segment_revenue_profile(sf_dir):
    """Per market segment: customer count, order count, and exact cents
    revenue — the segment P&L cut over the c_mktsegment dimension
    attribute. The custkey -> segment map broadcasts (J1); order
    partials decompose; the per-segment customer census comes from the
    bounded dimension itself."""
    from mimirsbrunn_ray.pipelines.queries import BROADCAST_BYTE_BUDGET
    from mimirsbrunn_ray.stages.join import (
        broadcast_join,
        make_lookup_ref_arrays,
    )

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    if cust.nbytes > BROADCAST_BYTE_BUDGET:  # pragma: no cover - scale path
        raise NotImplementedError(
            "distributed-dim fallback: Dataset.join orders to customer"
        )
    lookup = make_lookup_ref_arrays(
        cust["c_custkey"].to_numpy(zero_copy_only=False),
        cust["c_mktsegment"].to_numpy(zero_copy_only=False),
    )
    joined = broadcast_join(
        orders, lookup, key_col="o_custkey", out_col="seg",
        out_type=pa.string(),
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["seg"]), pc.is_valid(b["o_totalprice"]))
        )
        x = _round_half_away(
            b["o_totalprice"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        t = pa.table({"seg": b["seg"], "x": pa.array(x)})
        g = t.group_by(["seg"]).aggregate(
            [([], "count_all"), ("x", "sum")]
        )
        g = g.select(["seg", "count_all", "x_sum"])
        return g.rename_columns(["c_mktsegment", "n_orders",
                                 "revenue_x100"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["c_mktsegment"]).aggregate(
            [("n_orders", "sum"), ("revenue_x100", "sum")]
        )
        return g.rename_columns(
            ["c_mktsegment", "n_orders", "revenue_x100"]
        )

    rev = tree_merge(
        joined.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        combine,
    ).to_pandas()  # bounded: one row per segment
    from mimirsbrunn_ray.stages.broadcast import ensure_cols

    rev = ensure_cols(
        rev, ["c_mktsegment", "n_orders", "revenue_x100"])

    census = (
        pd.DataFrame(
            {
                "c_mktsegment": cust["c_mktsegment"].to_numpy(
                    zero_copy_only=False
                )
            }
        )
        .groupby("c_mktsegment")
        .size()
        .rename("n_customers")
        .reset_index()
    )
    out = census.merge(rev, on="c_mktsegment", how="left").fillna(0)
    out = out.sort_values("c_mktsegment", ignore_index=True)
    return pa.table(
        {
            "c_mktsegment": pa.array(out["c_mktsegment"], pa.string()),
            "n_customers": pa.array(
                out["n_customers"].to_numpy(dtype=np.int64)
            ),
            "n_orders": pa.array(
                out["n_orders"].to_numpy(dtype=np.int64)
            ),
            "revenue_x100": pa.array(
                out["revenue_x100"].to_numpy(dtype=np.int64)
            ),
        }
    )


SEGMENT_SQL = """
WITH r AS (
  SELECT c.c_mktsegment,
         CAST(COUNT(o.o_custkey) AS BIGINT) AS n_orders,
         CAST(COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100, 0)
                                AS BIGINT)), 0) AS BIGINT)
           AS revenue_x100
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_totalprice IS NOT NULL
  GROUP BY 1
), cen AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM customer GROUP BY 1
)
SELECT cen.c_mktsegment, cen.n_customers, r.n_orders, r.revenue_x100
FROM cen JOIN r USING (c_mktsegment)
"""


# ---------------------------------------------------------------------------
# cross-table KS: customer vs supplier account balances
# ---------------------------------------------------------------------------


def q_ks_acctbal_cust_supp(sf_dir):
    """Two-sample KS between the CUSTOMER and SUPPLIER account-balance
    distributions (cents) — the cross-table population compare (are the
    two ledgers drawn from the same balance regime?). The exact integer
    numerator max|ca*nb - cb*na| over the union grid, from two bounded
    cents histograms."""
    def hist_of(table, col):
        ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])

        def partial(b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_valid(b[col]))
            x = _round_half_away(
                b[col].cast(pa.float64()).to_numpy(zero_copy_only=False)
                * 100.0
            )
            t = pa.table({"v": pa.array(x)})
            g = t.group_by(["v"]).aggregate([([], "count_all")])
            g = g.select(["v", "count_all"])
            return g.rename_columns(["v", "n"])

        def combine(b: pa.Table) -> pa.Table:
            g = b.group_by(["v"]).aggregate([("n", "sum")])
            return g.rename_columns(["v", "n"])

        return tree_merge(
            ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
            combine,
        ).to_pandas()

    ha = hist_of("customer", "c_acctbal")
    hb = hist_of("supplier", "s_acctbal")
    if not len(ha) or not len(hb):
        return pa.table(
            {
                "n_cust": pa.array([0], pa.int64()),
                "n_supp": pa.array([0], pa.int64()),
                "ks_num": pa.array([None], pa.int64()),
            }
        )
    grid = np.union1d(
        ha["v"].to_numpy(dtype=np.int64), hb["v"].to_numpy(dtype=np.int64)
    )

    def cum_on(h):
        c = np.zeros(len(grid), dtype=np.int64)
        idx = np.searchsorted(grid, h["v"].to_numpy(dtype=np.int64))
        c[idx] = h["n"].to_numpy(dtype=np.int64)
        return np.cumsum(c)

    ca = cum_on(ha)
    cb = cum_on(hb)
    na = int(ca[-1])
    nb = int(cb[-1])
    ks = int(np.max(np.abs(ca * nb - cb * na)))
    return pa.table(
        {
            "n_cust": pa.array([na], pa.int64()),
            "n_supp": pa.array([nb], pa.int64()),
            "ks_num": pa.array([ks], pa.int64()),
        }
    )


KS_ACCTBAL_SQL = """
WITH a AS (
  SELECT CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS v
  FROM customer WHERE c_acctbal IS NOT NULL
), b AS (
  SELECT CAST(ROUND(s_acctbal * 100, 0) AS BIGINT) AS v
  FROM supplier WHERE s_acctbal IS NOT NULL
), tot AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS na,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS nb
), grid AS (
  SELECT DISTINCT v FROM (SELECT v FROM a UNION SELECT v FROM b)
), cum AS (
  SELECT g.v,
         (SELECT COUNT(*) FROM a WHERE a.v <= g.v) AS ca,
         (SELECT COUNT(*) FROM b WHERE b.v <= g.v) AS cb
  FROM grid g
)
SELECT tot.na AS n_cust, tot.nb AS n_supp,
       CAST(MAX(ABS(cum.ca * tot.nb - cum.cb * tot.na)) AS BIGINT)
         AS ks_num
FROM cum, tot
GROUP BY tot.na, tot.nb
"""


# ---------------------------------------------------------------------------
# weekly drift of the JSON 'k' property
# ---------------------------------------------------------------------------


def q_prop_k_weekly_stats(sf_dir):
    """Per epoch week: count and exact sum of the JSON 'k' property —
    the property-drift series a schema monitor plots (a shifting mean
    means upstream semantics changed). One streaming pass of the
    vectorized JSON extraction; bounded weekly output."""
    from mimirsbrunn_ray.functions.jsonx import extract_int_key

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "props"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        k = extract_int_key(b["props"], "k")
        keep = pc.is_valid(k)
        b = b.filter(keep)
        k = k.filter(keep)
        empty = pa.table(
            {
                "week_idx": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sum_k": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        wk = np.floor_divide(ts_us, _WEEK_US)
        t = pa.table(
            {"week_idx": pa.array(wk), "k": k.cast(pa.int64())}
        )
        g = t.group_by(["week_idx"]).aggregate(
            [([], "count_all"), ("k", "sum")]
        )
        g = g.select(["week_idx", "count_all", "k_sum"])
        return g.rename_columns(["week_idx", "n", "sum_k"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["week_idx"]).aggregate(
            [("n", "sum"), ("sum_k", "sum")]
        )
        return g.rename_columns(["week_idx", "n", "sum_k"])

    return tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


PROP_WEEKLY_SQL = """
SELECT CAST(FLOOR(epoch(ts) / 604800) AS BIGINT) AS week_idx,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k
FROM events
WHERE ts IS NOT NULL
  AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
GROUP BY 1
"""


def register_r4bb(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "segment_revenue_profile": q_segment_revenue_profile,
            "ks_acctbal_cust_supp": q_ks_acctbal_cust_supp,
            "prop_k_weekly_stats": q_prop_k_weekly_stats,
        }
    )
    oracles.update(
        {
            "segment_revenue_profile": SEGMENT_SQL,
            "ks_acctbal_cust_supp": KS_ACCTBAL_SQL,
            "prop_k_weekly_stats": PROP_WEEKLY_SQL,
        }
    )
