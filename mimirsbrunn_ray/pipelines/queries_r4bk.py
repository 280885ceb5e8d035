"""Round-4 batch BK: monthly return rate, identifier format audits,
and identity-space overlap.

Exactness discipline: all three are exact integer counting — returned
flags per month, regex-conformance counts, and distinct-key set
intersections.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

from mimirsbrunn_ray.stages.rollup import tree_merge


# ---------------------------------------------------------------------------
# monthly return rate over lineitems
# ---------------------------------------------------------------------------


def q_return_rate_monthly(sf_dir):
    """Per ship month: lineitem count and how many carried the 'R'
    return flag — the return-rate trend a quality dashboard tracks.
    One decomposable pass, bounded by months."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_shipdate", "l_returnflag"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.is_valid(b["l_shipdate"]), pc.is_valid(b["l_returnflag"])
            )
        )
        dt = b["l_shipdate"].cast(pa.timestamp("us"))
        yr = pc.year(dt).to_numpy(zero_copy_only=False).astype(np.int64)
        mo = pc.month(dt).to_numpy(zero_copy_only=False).astype(np.int64)
        ret = pc.equal(b["l_returnflag"], "R").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        t = pa.table(
            {
                "month_idx": pa.array(yr * 12 + mo - 1),
                "one": pa.array(np.ones(len(ret), np.int64)),
                "r": pa.array(ret),
            }
        )
        g = t.group_by(["month_idx"]).aggregate(
            [("one", "sum"), ("r", "sum")]
        )
        g = g.select(["month_idx", "one_sum", "r_sum"])
        return g.rename_columns(["month_idx", "n_items", "n_returned"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["month_idx"]).aggregate(
            [("n_items", "sum"), ("n_returned", "sum")]
        )
        return g.rename_columns(["month_idx", "n_items", "n_returned"])

    return tree_merge(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


RETURN_RATE_SQL = """
SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT)
         AS month_idx,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_returned
FROM lineitem
WHERE l_shipdate IS NOT NULL AND l_returnflag IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# identifier format audit
# ---------------------------------------------------------------------------

_NAME_PATTERNS = {
    "customer": ("c_name", r"^Customer#[0-9]{9}$"),
    "supplier": ("s_name", r"^Supplier#[0-9]{9}$"),
}


def q_name_format_audit(sf_dir):
    """Format-conformance audit of the identifier columns: per table,
    how many names match the canonical zero-padded pattern — the
    schema-contract check an ingest gate runs (one malformed id breaks
    every join downstream). Vectorized regex per batch; bounded
    two-row output."""
    rows = {"table_name": [], "n_rows": [], "n_conforming": []}
    for table, (col, pat) in sorted(_NAME_PATTERNS.items()):
        ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])

        def partial(b: pa.Table, col=col, pat=pat) -> pa.Table:
            b = b.filter(pc.is_valid(b[col]))
            ok = pc.match_substring_regex(b[col], pat)
            return pa.table(
                {
                    "n_rows": pa.array([b.num_rows], pa.int64()),
                    "n_conforming": pa.array(
                        [int(pc.sum(pc.cast(ok, pa.int64())).as_py()
                             or 0)],
                        pa.int64(),
                    ),
                }
            )

        def fold(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
                    for c in b.column_names
                }
            )

        out = tree_merge(
            ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
            fold,
        ).to_pandas()
        from mimirsbrunn_ray.stages.broadcast import scalar0

        rows["table_name"].append(table)
        rows["n_rows"].append(int(scalar0(out, "n_rows")))
        rows["n_conforming"].append(int(scalar0(out, "n_conforming")))
    return pa.table(
        {
            "table_name": pa.array(rows["table_name"], pa.string()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "n_conforming": pa.array(rows["n_conforming"], pa.int64()),
        }
    )


NAME_FORMAT_SQL = """
SELECT 'customer' AS table_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN regexp_matches(c_name,
                          '^Customer#[0-9]{9}$')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_conforming
FROM customer WHERE c_name IS NOT NULL
UNION ALL
SELECT 'supplier',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN regexp_matches(s_name,
                          '^Supplier#[0-9]{9}$')
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM supplier WHERE s_name IS NOT NULL
"""


# ---------------------------------------------------------------------------
# identity-space overlap: event users vs order customers
# ---------------------------------------------------------------------------


def q_user_custkey_overlap(sf_dir):
    """Identity reconciliation across id spaces: distinct event
    user_ids, distinct order custkeys, and how many ids exist in BOTH
    — the join-coverage audit run before trusting any events-to-orders
    linkage. Combiner-first distinct partials per side, one marker
    full-outer join over the distinct-key tables."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )

    def distinct_keys(ds, col):
        def partial(b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_valid(b[col]))
            g = b.group_by([col]).aggregate([([], "count_all")])
            return g.select([col]).rename_columns(["k"])

        def dedup(b: pa.Table) -> pa.Table:
            g = b.group_by(["k"]).aggregate([([], "count_all")])
            return g.select(["k"])

        return tree_merge(
            ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
            dedup,
            final_shards=4,
            shard_cols=["k"],
        )

    uk = distinct_keys(ev, "user_id").map_batches(
        lambda b: b.append_column(
            "in_u", pa.array(np.ones(b.num_rows, np.int64))
        ),
        batch_format="pyarrow", batch_size=None,
    ).repartition(4)
    ck = distinct_keys(orders, "o_custkey").map_batches(
        lambda b: b.append_column(
            "in_c", pa.array(np.ones(b.num_rows, np.int64))
        ),
        batch_format="pyarrow", batch_size=None,
    ).repartition(4)
    joined = _safe_join(
        uk, ck,
        on=("k",),
        join_type="full_outer",
        num_partitions=4,
    )

    def fold_partial(b: pa.Table) -> pa.Table:
        iu = pc.fill_null(b["in_u"], 0).to_numpy(zero_copy_only=False)
        ic = pc.fill_null(b["in_c"], 0).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_event_users": pa.array([int(iu.sum())], pa.int64()),
                "n_order_custs": pa.array([int(ic.sum())], pa.int64()),
                "n_common": pa.array(
                    [int(((iu == 1) & (ic == 1)).sum())], pa.int64()
                ),
            }
        )

    def fold(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
                for c in b.column_names
            }
        )

    return tree_merge(
        joined.map_batches(fold_partial, batch_format="pyarrow",
                           batch_size=None),
        fold,
    )


OVERLAP_SQL = """
WITH u AS (SELECT DISTINCT user_id AS k FROM events
           WHERE user_id IS NOT NULL),
c AS (SELECT DISTINCT o_custkey AS k FROM orders
      WHERE o_custkey IS NOT NULL)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS n_event_users,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_order_custs,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM u JOIN c ON u.k = c.k) AS n_common
"""


def register_r4bk(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "return_rate_monthly": q_return_rate_monthly,
            "name_format_audit": q_name_format_audit,
            "user_custkey_overlap": q_user_custkey_overlap,
        }
    )
    oracles.update(
        {
            "return_rate_monthly": RETURN_RATE_SQL,
            "name_format_audit": NAME_FORMAT_SQL,
            "user_custkey_overlap": OVERLAP_SQL,
        }
    )
