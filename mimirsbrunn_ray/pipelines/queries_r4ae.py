"""Round-4 batch AE: robust statistics and data-quality audits —
winsorized per-type value sums, a two-direction referential-integrity
audit between orders and lineitems, and argmedian event retrieval.

Exactness discipline: winsorization clips at exact PERCENTILE_DISC
cents values (the repo-wide ceil(q*n) rank rule) and sums integers;
the RI audit counts exact distinct-key set differences; the argmedian
returns the integer-keyed row at the exact median value.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

from mimirsbrunn_ray.stages.rollup import tree_merge


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# winsorized per-type value sums (clip at p05 / p95)
# ---------------------------------------------------------------------------

_WINS_LO = 0.05
_WINS_HI = 0.95


def q_winsorized_value_sums(sf_dir):
    """Per event type: count and sum of values after WINSORIZING at the
    type's exact p05/p95 (cents) — the robust-mean preparation that
    keeps heavy tails from dominating a mean. Two streaming passes:
    (1) the decomposable (type, cents) histogram (bounded by types x
    |domain|) from which the driver reads both exact PERCENTILE_DISC
    cut points; (2) a broadcast-bounds clip + integer partial sums,
    tree-merged. No sort shuffle anywhere."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["value"]))
        )
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        t = pa.table({"event_type": b["event_type"], "v": pa.array(x)})
        g = t.group_by(["event_type", "v"]).aggregate([([], "count_all")])
        g = g.select(["event_type", "v", "count_all"])
        return g.rename_columns(["event_type", "v", "n"])

    def hist_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "v"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "v", "n"])

    hist = tree_merge(
        ev.map_batches(hist_partial, batch_format="pyarrow",
                       batch_size=None),
        hist_combine,
    ).to_pandas()  # bounded: types x cents domain

    bounds: dict[str, tuple[int, int]] = {}
    if len(hist):
        for et, g in hist.groupby("event_type"):
            g = g.sort_values("v")
            v = g["v"].to_numpy(dtype=np.int64)
            cum = np.cumsum(g["n"].to_numpy(dtype=np.int64))
            total = int(cum[-1])
            cuts = []
            for q in (_WINS_LO, _WINS_HI):
                rank = int(np.ceil(q * total - 1e-9))  # PERCENTILE_DISC
                cuts.append(int(v[np.searchsorted(cum, rank, "left")]))
            bounds[et] = (cuts[0], cuts[1])
    import ray

    bounds_ref = ray.put(bounds)

    def clip_partial(b: pa.Table) -> pa.Table:
        bd = ray.get(bounds_ref)
        b = b.filter(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["value"]))
        )
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "wins_sum_x100": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        et = b["event_type"].to_numpy(zero_copy_only=False)
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        lo = np.empty(len(x), dtype=np.int64)
        hi = np.empty(len(x), dtype=np.int64)
        for s in pd.unique(et):  # bounded by type cardinality, not rows
            m = et == s
            l, h = bd[s]
            lo[m] = l
            hi[m] = h
        clipped = np.clip(x, lo, hi)
        t = pa.table(
            {"event_type": b["event_type"], "c": pa.array(clipped)}
        )
        g = t.group_by(["event_type"]).aggregate(
            [([], "count_all"), ("c", "sum")]
        )
        g = g.select(["event_type", "count_all", "c_sum"])
        return g.rename_columns(["event_type", "n", "wins_sum_x100"])

    def clip_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("wins_sum_x100", "sum")]
        )
        return g.rename_columns(["event_type", "n", "wins_sum_x100"])

    return tree_merge(
        ev.map_batches(clip_partial, batch_format="pyarrow",
                       batch_size=None),
        clip_combine,
    )


WINSORIZED_SQL = f"""
WITH v AS MATERIALIZED (
  SELECT event_type,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), b AS (
  SELECT event_type,
         CAST(quantile_disc(x, {_WINS_LO}) AS BIGINT) AS lo,
         CAST(quantile_disc(x, {_WINS_HI}) AS BIGINT) AS hi
  FROM v GROUP BY 1
)
SELECT v.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(LEAST(GREATEST(v.x, b.lo), b.hi)) AS BIGINT)
         AS wins_sum_x100
FROM v JOIN b USING (event_type)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# referential-integrity audit: orders <-> lineitem, both directions
# ---------------------------------------------------------------------------


def q_referential_integrity_orders(sf_dir):
    """The two-direction referential-integrity audit between the orders
    and lineitem tables: distinct order keys on each side, keys present
    only in orders (childless orders) and only in lineitem (orphaned
    items) — the first data-quality check any relational ingest runs.
    Distinct key sets are combiner-first (per-batch dedup partials,
    then one key-hash groupby each) and the set difference is a marker
    FULL OUTER join over the two distinct-key tables — never a row-level
    materialization."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    )
    items = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    )

    def distinct_keys(ds, col):
        def partial(b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_valid(b[col]))
            g = b.group_by([col]).aggregate([([], "count_all")])
            return g.select([col]).rename_columns(["k"])

        def combine(b: pa.Table) -> pa.Table:
            g = b.group_by(["k"]).aggregate([([], "count_all")])
            return g.select(["k"])

        return tree_merge(
            ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
            combine,
            final_shards=4,
            shard_cols=["k"],
        )

    ok = distinct_keys(orders, "o_orderkey").map_batches(
        lambda b: b.append_column("in_o", pa.array(np.ones(b.num_rows,
                                                           np.int64))),
        batch_format="pyarrow", batch_size=None,
    ).repartition(4)
    lk = distinct_keys(items, "l_orderkey").map_batches(
        lambda b: b.append_column("in_l", pa.array(np.ones(b.num_rows,
                                                           np.int64))),
        batch_format="pyarrow", batch_size=None,
    ).repartition(4)
    joined = _safe_join(
        ok, lk,
        on=("k",),
        join_type="full_outer",
        num_partitions=4,
    )

    def count_partial(b: pa.Table) -> pa.Table:
        in_o = pc.fill_null(b["in_o"], 0).to_numpy(zero_copy_only=False)
        in_l = pc.fill_null(b["in_l"], 0).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_order_keys": pa.array([int(in_o.sum())], pa.int64()),
                "n_item_keys": pa.array([int(in_l.sum())], pa.int64()),
                "n_childless_orders": pa.array(
                    [int(((in_o == 1) & (in_l == 0)).sum())], pa.int64()
                ),
                "n_orphaned_items": pa.array(
                    [int(((in_o == 0) & (in_l == 1)).sum())], pa.int64()
                ),
            }
        )

    def count_combine(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
                for c in b.column_names
            }
        )

    return tree_merge(
        joined.map_batches(count_partial, batch_format="pyarrow",
                           batch_size=None),
        count_combine,
    )


RI_AUDIT_SQL = """
WITH ok AS (SELECT DISTINCT o_orderkey AS k FROM orders
            WHERE o_orderkey IS NOT NULL),
lk AS (SELECT DISTINCT l_orderkey AS k FROM lineitem
       WHERE l_orderkey IS NOT NULL),
j AS (
  SELECT ok.k AS ko, lk.k AS kl
  FROM ok FULL OUTER JOIN lk ON ok.k = lk.k
)
SELECT CAST(COUNT(ko) AS BIGINT) AS n_order_keys,
       CAST(COUNT(kl) AS BIGINT) AS n_item_keys,
       CAST(SUM(CASE WHEN kl IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_childless_orders,
       CAST(SUM(CASE WHEN ko IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphaned_items
FROM j
"""


# ---------------------------------------------------------------------------
# argmedian: the concrete event sitting at each type's median value
# ---------------------------------------------------------------------------


def q_median_event_per_type(sf_dir):
    """Per event type, the CONCRETE event at the exact median value —
    argmedian retrieval (smallest event_id among rows carrying the
    PERCENTILE_DISC p50 cents value), the 'show me a representative
    row' twin of the scalar quantile. Pass 1 is the same bounded
    histogram as the winsorize query; pass 2 is a broadcast-value
    filtered min-reduce — no sort, no row pull."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "event_id", "value"],
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["value"]))
        )
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        t = pa.table({"event_type": b["event_type"], "v": pa.array(x)})
        g = t.group_by(["event_type", "v"]).aggregate([([], "count_all")])
        g = g.select(["event_type", "v", "count_all"])
        return g.rename_columns(["event_type", "v", "n"])

    def hist_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "v"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "v", "n"])

    hist = tree_merge(
        ev.map_batches(hist_partial, batch_format="pyarrow",
                       batch_size=None),
        hist_combine,
    ).to_pandas()

    med: dict[str, int] = {}
    if len(hist):
        for et, g in hist.groupby("event_type"):
            g = g.sort_values("v")
            v = g["v"].to_numpy(dtype=np.int64)
            cum = np.cumsum(g["n"].to_numpy(dtype=np.int64))
            rank = int(np.ceil(0.5 * int(cum[-1]) - 1e-9))
            med[et] = int(v[np.searchsorted(cum, rank, "left")])
    import ray

    med_ref = ray.put(med)

    def pick_partial(b: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        b = b.filter(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["value"]))
        )
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "median_x100": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        et = b["event_type"].to_numpy(zero_copy_only=False)
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        ids = b["event_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        rows = {"event_type": [], "median_x100": [], "event_id": []}
        for s in pd.unique(et):  # bounded by type cardinality
            mask = (et == s) & (x == m[s])
            if mask.any():
                rows["event_type"].append(s)
                rows["median_x100"].append(m[s])
                rows["event_id"].append(int(ids[mask].min()))
        return pa.table(
            {
                "event_type": pa.array(rows["event_type"], pa.string()),
                "median_x100": pa.array(rows["median_x100"], pa.int64()),
                "event_id": pa.array(rows["event_id"], pa.int64()),
            }
        )

    def pick_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "median_x100"]).aggregate(
            [("event_id", "min")]
        )
        g = g.select(["event_type", "median_x100", "event_id_min"])
        return g.rename_columns(["event_type", "median_x100", "event_id"])

    return tree_merge(
        ev.map_batches(pick_partial, batch_format="pyarrow",
                       batch_size=None),
        pick_combine,
    )


MEDIAN_EVENT_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), m AS (
  SELECT event_type, CAST(quantile_disc(x, 0.5) AS BIGINT) AS med
  FROM v GROUP BY 1
)
SELECT v.event_type, m.med AS median_x100,
       CAST(MIN(v.event_id) AS BIGINT) AS event_id
FROM v JOIN m ON m.event_type = v.event_type AND v.x = m.med
GROUP BY 1, 2
"""


def register_r4ae(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "winsorized_value_sums": q_winsorized_value_sums,
            "referential_integrity_orders": q_referential_integrity_orders,
            "median_event_per_type": q_median_event_per_type,
        }
    )
    oracles.update(
        {
            "winsorized_value_sums": WINSORIZED_SQL,
            "referential_integrity_orders": RI_AUDIT_SQL,
            "median_event_per_type": MEDIAN_EVENT_SQL,
        }
    )
