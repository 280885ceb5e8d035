"""Round-4 batch ET: TPC-H parity widening, part 2 — Q10 (returned-item
revenue top customers), Q13 (customer order-count distribution,
LEFT-join semantics with zero-order customers), Q18 (large-quantity
orders). Same integer-grid revenue discipline as batch ES
(``price_cents * (100 - disc_pct)`` summed as int64, x1e4); the only
snapped value is Q18's total_cents (already integral).

Shapes: Q10 is a big-big orderkey join of combiner-first lineitem
partials x date-filtered orders, a sharded custkey combine, and a
partial top-k prune (the tpch_q3 shape) with a TARGETED dim fetch
(predicate-pushdown read of just the 20 winners' customer rows) —
no customer broadcast. Q13 is the canonical LEFT join: sharded
order counts x the customer key column via Dataset.join left_outer,
null->0, then a tiny histogram tree-merge. Q18 is a sharded
per-order quantity sum, a >300 filter (result is by construction a
tail slice), and targeted orders/customer fetches for the survivors."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as _pq
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

from mimirsbrunn_ray.context import pool_size
from mimirsbrunn_ray.stages.rollup import tree_merge

_Q10_LO = np.datetime64("1996-01-01", "us").astype(np.int64)
_Q10_HI = np.datetime64("1996-04-01", "us").astype(np.int64)
_Q18_MIN_QTY = 300


def _rev_e4(b: pa.Table) -> np.ndarray:
    cents = np.floor(
        b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        + 0.5
    ).astype(np.int64)
    dpct = np.floor(
        b["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
    ).astype(np.int64)
    return cents * (100 - dpct)


def q_tpch_q10_returned_revenue(sf_dir):
    """TPC-H Q10: top-20 customers by revenue on returned items in one
    quarter. combiner-first per-orderkey partials (returnflag='R'
    rows only) join the date-filtered orders key column, revenue
    re-keys to custkey through a key-disjoint sharded tree-merge, and
    the top 20 survive a per-block partial prune; only the 20
    winners' customer/nation rows are fetched (predicate-pushdown
    read), never the dims."""
    n_part = max(8, pool_size())

    def li_partial(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["l_returnflag"], "R")
        b = b.filter(keep)
        t = pa.table(
            {"l_orderkey": b["l_orderkey"],
             "rev": pa.array(_rev_e4(b), pa.int64())}
        )
        g = t.group_by(["l_orderkey"]).aggregate([("rev", "sum")])
        return g.rename_columns(["l_orderkey", "rev"])

    li = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                     "l_discount"],
        )
        .map_batches(li_partial, batch_format="pyarrow",
                     batch_size=None)
        .repartition(n_part)
    )

    def ord_project(b: pa.Table) -> pa.Table:
        od = b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
        od = od.to_numpy(zero_copy_only=False)
        keep = pa.array((od >= _Q10_LO) & (od < _Q10_HI))
        b = b.filter(keep)
        return pa.table(
            {"o_orderkey": b["o_orderkey"], "o_custkey": b["o_custkey"]}
        )

    orders = (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        )
        .map_batches(ord_project, batch_format="pyarrow",
                     batch_size=None)
        .repartition(n_part)
    )

    joined = _safe_join(
        li, orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        join_type="inner",
        num_partitions=n_part,
    )

    def cust_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["o_custkey"]).aggregate([("rev", "sum")])
        return g.rename_columns(["o_custkey", "rev"])

    totals = tree_merge(
        joined.map_batches(cust_partial, batch_format="pyarrow",
                           batch_size=None),
        cust_partial,
        final_shards=8,
        shard_cols=["o_custkey"],
    )

    def local_top(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table(
                {"o_custkey": pa.array([], pa.int64()),
                 "rev": pa.array([], pa.int64())}
            )
        idx = pc.sort_indices(
            b, sort_keys=[("rev", "descending"),
                          ("o_custkey", "ascending")]
        )
        return b.take(idx[:20]).select(["o_custkey", "rev"])

    top = (
        totals.map_batches(local_top, batch_format="pyarrow",
                           batch_size=None)
        .to_pandas()
    )
    if "rev" not in top.columns:  # empty-corpus schema loss
        top = top.iloc[0:0].assign(rev=[], o_custkey=[])
    top = top.sort_values(["rev", "o_custkey"], ascending=[False, True],
                          ignore_index=True).head(20)
    if len(top) == 0:
        return pa.table(
            {"c_custkey": pa.array([], pa.int64()),
             "c_name": pa.array([], pa.string()),
             "n_name": pa.array([], pa.string()),
             "revenue_e4": pa.array([], pa.int64())}
        )
    keys = top["o_custkey"].to_numpy(dtype=np.int64)
    cust = _pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
        filters=[("c_custkey", "in", keys.tolist())],
    )
    nation = _pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nmap = dict(zip(nation["n_nationkey"].to_pylist(),
                    nation["n_name"].to_pylist()))
    cmap = {
        int(k): (nm, nmap.get(int(nk)))
        for k, nm, nk in zip(
            cust["c_custkey"].to_pylist(), cust["c_name"].to_pylist(),
            cust["c_nationkey"].to_pylist(),
        )
    }
    return pa.table(
        {
            "c_custkey": pa.array(keys, pa.int64()),
            "c_name": pa.array(
                [cmap.get(int(k), (None, None))[0] for k in keys],
                pa.string(),
            ),
            "n_name": pa.array(
                [cmap.get(int(k), (None, None))[1] for k in keys],
                pa.string(),
            ),
            "revenue_e4": pa.array(
                top["rev"].to_numpy(dtype=np.int64), pa.int64()
            ),
        }
    )


TPCH_Q10_SQL = """
WITH rev AS MATERIALIZED (
  SELECT o_custkey,
         SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)))
           AS revenue_e4
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1996-04-01'
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, n_name,
       CAST(revenue_e4 AS BIGINT) AS revenue_e4
FROM rev
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY revenue_e4 DESC, c_custkey
LIMIT 20
"""


def q_tpch_q13_order_counts(sf_dir):
    """TPC-H Q13: distribution of orders-per-customer INCLUDING the
    zero-order customers — the left-outer case the broadcast-denorm
    path can't express. Sharded per-custkey counts Dataset.join
    (left_outer, customer side preserved) the customer key column;
    nulls fold to 0 and the count histogram tree-merges."""
    n_part = max(8, pool_size())

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_custkey"]))
        g = b.group_by(["o_custkey"]).aggregate([([], "count_all")])
        g = g.select(["o_custkey", "count_all"])
        return g.rename_columns(["o_custkey", "n_orders"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["o_custkey"]).aggregate([("n_orders", "sum")])
        return g.rename_columns(["o_custkey", "n_orders"])

    counts = tree_merge(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["o_custkey"],
    ).repartition(n_part)

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).repartition(n_part)

    joined = _safe_join(
        cust, counts,
        on=("c_custkey",),
        right_on=("o_custkey",),
        join_type="left_outer",
        num_partitions=n_part,
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "c_custkey" not in b.column_names:
            return pa.table(
                {"c_count": pa.array([], pa.int64()),
                 "custdist": pa.array([], pa.int64())}
            )
        n = b["n_orders"].to_numpy(zero_copy_only=False)
        n = np.where(pd.isna(n), 0, n).astype(np.int64)
        t = pa.table({"c_count": pa.array(n, pa.int64())})
        g = t.group_by(["c_count"]).aggregate([([], "count_all")])
        g = g.select(["c_count", "count_all"])
        return g.rename_columns(["c_count", "custdist"])

    def hist_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["c_count"]).aggregate([("custdist", "sum")])
        return g.rename_columns(["c_count", "custdist"])

    hist = tree_merge(
        joined.map_batches(hist_partial, batch_format="pyarrow",
                           batch_size=None),
        hist_combine,
    ).to_pandas()
    if "custdist" not in hist.columns:  # empty-corpus schema loss
        return pa.table({"c_count": pa.array([], pa.int64()),
                         "custdist": pa.array([], pa.int64())})
    return hist.sort_values(
        ["custdist", "c_count"], ascending=[False, False],
        ignore_index=True,
    )


TPCH_Q13_SQL = """
WITH per_cust AS MATERIALIZED (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q18_large_orders(sf_dir):
    """TPC-H Q18: orders whose total line quantity exceeds 300 — a
    tail slice by construction (p99.9 of this corpus is ~330).
    Sharded per-orderkey integer quantity sums, the >300 filter runs
    distributed, and only the survivors' orders/customer rows are
    fetched by predicate-pushdown reads."""

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "q": pa.array(
                    b["l_quantity"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
            }
        )
        g = t.group_by(["l_orderkey"]).aggregate([("q", "sum")])
        return g.rename_columns(["l_orderkey", "q"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_orderkey"]).aggregate([("q", "sum")])
        return g.rename_columns(["l_orderkey", "q"])

    sums = tree_merge(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_quantity"],
        ).map_batches(partial, batch_format="pyarrow",
                      batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["l_orderkey"],
    )

    def tail_only(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "l_orderkey" not in b.column_names:
            return pa.table(
                {"l_orderkey": pa.array([], pa.int64()),
                 "q": pa.array([], pa.int64())}
            )
        return b.filter(pc.greater(b["q"], _Q18_MIN_QTY))

    big = (
        sums.map_batches(tail_only, batch_format="pyarrow",
                         batch_size=None)
        .to_pandas()
    )
    empty = pa.table(
        {
            "o_orderkey": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
            "c_name": pa.array([], pa.string()),
            "total_cents": pa.array([], pa.int64()),
            "sum_qty": pa.array([], pa.int64()),
        }
    )
    if len(big) == 0:
        return empty
    okeys = big["l_orderkey"].to_numpy(dtype=np.int64)
    qmap = dict(zip(okeys.tolist(),
                    big["q"].to_numpy(dtype=np.int64).tolist()))
    orders = _pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_totalprice"],
        filters=[("o_orderkey", "in", okeys.tolist())],
    )
    if orders.num_rows == 0:
        return empty
    cust = _pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name"],
        filters=[
            ("c_custkey", "in",
             pc.unique(orders["o_custkey"]).to_pylist())
        ],
    )
    cmap = dict(zip(cust["c_custkey"].to_pylist(),
                    cust["c_name"].to_pylist()))
    ok = orders["o_orderkey"].to_numpy()
    df = pd.DataFrame(
        {
            "o_orderkey": ok.astype(np.int64),
            "o_orderdate": orders["o_orderdate"]
            .cast(pa.timestamp("us"))
            .to_pandas(),
            "c_name": [
                cmap.get(int(k))
                for k in orders["o_custkey"].to_pylist()
            ],
            "total_cents": np.floor(
                orders["o_totalprice"].to_numpy(zero_copy_only=False)
                * 100.0 + 0.5
            ).astype(np.int64),
            "sum_qty": np.array(
                [qmap[int(k)] for k in ok], np.int64
            ),
        }
    )
    df = df.sort_values(
        ["sum_qty", "o_orderkey"], ascending=[False, True],
        ignore_index=True,
    )
    return pa.Table.from_pandas(df, preserve_index=False)


TPCH_Q18_SQL = f"""
WITH big AS MATERIALIZED (
  SELECT l_orderkey,
         SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > {_Q18_MIN_QTY}
)
SELECT o_orderkey, o_orderdate, c_name,
       CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS total_cents,
       CAST(sum_qty AS BIGINT) AS sum_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY sum_qty DESC, o_orderkey
"""


def register_r4et(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "tpch_q10_returned_revenue": q_tpch_q10_returned_revenue,
            "tpch_q13_order_counts": q_tpch_q13_order_counts,
            "tpch_q18_large_orders": q_tpch_q18_large_orders,
        }
    )
    oracles.update(
        {
            "tpch_q10_returned_revenue": TPCH_Q10_SQL,
            "tpch_q13_order_counts": TPCH_Q13_SQL,
            "tpch_q18_large_orders": TPCH_Q18_SQL,
        }
    )
