"""Round-4 batch BF: line-number contiguity audit, retail-vs-realized
pricing gap, and hour-profile cosine between types.

Exactness discipline: contiguity reduces to integer (count, min, max,
sum) invariants per order; the pricing gap ships exact cents sums on
both sides; profile cosine ships the integer triple (dot, |a|^2,
|b|^2) over 24-bin count vectors.
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
# l_linenumber contiguity audit
# ---------------------------------------------------------------------------


def q_linenumber_contiguity_audit(sf_dir):
    """Data-quality audit of the l_linenumber sequence per order: an
    order is CONTIGUOUS when its line numbers are exactly 1..n (checked
    by the integer invariants count == max, min == 1, and
    sum == n(n+1)/2 — the triangular-number test catches duplicates
    paired with holes). Per-order integer partials from key-disjoint
    shards; bounded ok/bad counts."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.is_valid(b["l_orderkey"]), pc.is_valid(b["l_linenumber"])
            )
        )
        t = pa.table(
            {
                "k": b["l_orderkey"],
                "ln": b["l_linenumber"].cast(pa.int64()),
            }
        )
        g = t.group_by(["k"]).aggregate(
            [([], "count_all"), ("ln", "min"), ("ln", "max"), ("ln", "sum")]
        )
        g = g.select(["k", "count_all", "ln_min", "ln_max", "ln_sum"])
        return g.rename_columns(["k", "n", "mn", "mx", "s"])

    def pair_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["k"]).aggregate(
            [("n", "sum"), ("mn", "min"), ("mx", "max"), ("s", "sum")]
        )
        return g.rename_columns(["k", "n", "mn", "mx", "s"])

    per_order = tree_merge(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        pair_combine,
        final_shards=8,
        shard_cols=["k"],
    )

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "k" not in b.column_names:
            return pa.table(
                {
                    "n_orders": pa.array([0], pa.int64()),
                    "n_contiguous": pa.array([0], pa.int64()),
                    "n_broken": pa.array([0], pa.int64()),
                }
            )
        n = b["n"].to_numpy(zero_copy_only=False)
        mn = b["mn"].to_numpy(zero_copy_only=False)
        mx = b["mx"].to_numpy(zero_copy_only=False)
        s = b["s"].to_numpy(zero_copy_only=False)
        ok = (mn == 1) & (mx == n) & (2 * s == n * (n + 1))
        return pa.table(
            {
                "n_orders": pa.array([len(n)], pa.int64()),
                "n_contiguous": pa.array([int(ok.sum())], pa.int64()),
                "n_broken": pa.array([int((~ok).sum())], pa.int64()),
            }
        )

    def fold_combine(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
                for c in b.column_names
            }
        )

    return tree_merge(
        per_order.map_batches(fold, batch_format="pyarrow",
                              batch_size=None),
        fold_combine,
    )


CONTIGUITY_SQL = """
WITH o AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MIN(l_linenumber) AS BIGINT) AS mn,
         CAST(MAX(l_linenumber) AS BIGINT) AS mx,
         CAST(SUM(l_linenumber) AS BIGINT) AS s
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
  GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN mn = 1 AND mx = n AND 2 * s = n * (n + 1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_contiguous,
       CAST(SUM(CASE WHEN mn = 1 AND mx = n AND 2 * s = n * (n + 1)
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_broken
FROM o
"""


# ---------------------------------------------------------------------------
# retail vs realized pricing gap per part type
# ---------------------------------------------------------------------------


def q_retail_vs_realized_gap(sf_dir):
    """Per part type: quantity-weighted RETAIL value (qty x
    p_retailprice) vs the REALIZED extended price, both exact cents —
    the pricing-power gap between list and street price. The partkey ->
    (type, retail cents) maps broadcast (J1); one decomposable fact
    pass."""
    from mimirsbrunn_ray.pipelines.queries import BROADCAST_BYTE_BUDGET
    from mimirsbrunn_ray.stages.join import (
        broadcast_join,
        make_lookup_ref_arrays,
    )

    part = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_type", "p_retailprice"],
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    if part.nbytes > BROADCAST_BYTE_BUDGET:  # pragma: no cover - scale
        raise NotImplementedError(
            "distributed-dim fallback: Dataset.join lineitem to part"
        )
    keys = part["p_partkey"].to_numpy(zero_copy_only=False)
    retail_x100 = _round_half_away(
        part["p_retailprice"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        * 100.0
    )
    # composite label "<type>\x1f<retail_x100>" through ONE broadcast
    lab = np.char.add(
        np.char.add(
            part["p_type"].to_numpy(zero_copy_only=False).astype(str),
            "\x1f",
        ),
        retail_x100.astype(str),
    )
    lookup = make_lookup_ref_arrays(keys, lab)
    joined = broadcast_join(
        li, lookup, key_col="l_partkey", out_col="lab",
        out_type=pa.string(),
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["lab"]), pc.is_valid(b["l_quantity"])
                ),
                pc.is_valid(b["l_extendedprice"]),
            )
        )
        empty = pa.table(
            {
                "p_type": pa.array([], pa.string()),
                "n_items": pa.array([], pa.int64()),
                "retail_value_x100": pa.array([], pa.int64()),
                "realized_x100": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        lab_np = b["lab"].to_numpy(zero_copy_only=False)
        split = np.char.partition(lab_np.astype(str), "\x1f")
        ptype = split[:, 0]
        retail = split[:, 2].astype(np.int64)
        qty = _round_half_away(
            b["l_quantity"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
        )
        px = _round_half_away(
            b["l_extendedprice"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        t = pa.table(
            {
                "p_type": pa.array(ptype),
                "rv": pa.array(qty * retail),
                "px": pa.array(px),
            }
        )
        g = t.group_by(["p_type"]).aggregate(
            [([], "count_all"), ("rv", "sum"), ("px", "sum")]
        )
        g = g.select(["p_type", "count_all", "rv_sum", "px_sum"])
        return g.rename_columns(
            ["p_type", "n_items", "retail_value_x100", "realized_x100"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["p_type"]).aggregate(
            [("n_items", "sum"), ("retail_value_x100", "sum"),
             ("realized_x100", "sum")]
        )
        return g.rename_columns(
            ["p_type", "n_items", "retail_value_x100", "realized_x100"]
        )

    return tree_merge(
        joined.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        combine,
    )


RETAIL_GAP_SQL = """
SELECT p.p_type,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l.l_quantity, 0) AS BIGINT)
                * CAST(ROUND(p.p_retailprice * 100, 0) AS BIGINT))
            AS BIGINT) AS retail_value_x100,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
            AS BIGINT) AS realized_x100
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_quantity IS NOT NULL AND l.l_extendedprice IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# hour-profile cosine between event types
# ---------------------------------------------------------------------------


def q_type_profile_cosine(sf_dir):
    """For every event-type pair: the cosine-similarity INGREDIENTS of
    their 24-bin hour-of-day count profiles — the exact integer triple
    (dot, |a|^2, |b|^2); cosine = dot/sqrt(|a|^2*|b|^2) — which types
    share a diurnal shape regardless of volume. One bounded (type, hod)
    pass; the pair fold runs over types x 24."""
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
        hod = ((ts_us // _HOUR_US) % 24).astype(np.int64)
        t = pa.table(
            {"event_type": b["event_type"], "hod": pa.array(hod)}
        )
        g = t.group_by(["event_type", "hod"]).aggregate(
            [([], "count_all")]
        )
        g = g.select(["event_type", "hod", "count_all"])
        return g.rename_columns(["event_type", "hod", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "hod"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "hod", "n"])

    grid = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: types x 24

    rows = {"type_a": [], "type_b": [], "dot": [], "norm_a2": [],
            "norm_b2": []}
    if len(grid):
        types = sorted(grid["event_type"].unique())
        prof = {}
        for et in types:
            g = grid[grid["event_type"] == et]
            v = np.zeros(24, dtype=np.int64)
            v[g["hod"].to_numpy(dtype=np.int64)] = g["n"].to_numpy(
                dtype=np.int64
            )
            prof[et] = v
        for i, ta in enumerate(types):
            for tb in types[i + 1:]:
                rows["type_a"].append(ta)
                rows["type_b"].append(tb)
                rows["dot"].append(int(np.dot(prof[ta], prof[tb])))
                rows["norm_a2"].append(int(np.dot(prof[ta], prof[ta])))
                rows["norm_b2"].append(int(np.dot(prof[tb], prof[tb])))
    return pa.table(
        {
            "type_a": pa.array(rows["type_a"], pa.string()),
            "type_b": pa.array(rows["type_b"], pa.string()),
            "dot": pa.array(rows["dot"], pa.int64()),
            "norm_a2": pa.array(rows["norm_a2"], pa.int64()),
            "norm_b2": pa.array(rows["norm_b2"], pa.int64()),
        }
    )


PROFILE_COSINE_SQL = """
WITH grid AS MATERIALIZED (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), hours AS (SELECT unnest(generate_series(0, 23)) AS hod),
types AS (SELECT DISTINCT event_type FROM grid),
dense AS (
  SELECT t.event_type, h.hod, CAST(COALESCE(g.n, 0) AS BIGINT) AS n
  FROM types t CROSS JOIN hours h
  LEFT JOIN grid g ON g.event_type = t.event_type AND g.hod = h.hod
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(SUM(a.n * b.n) AS BIGINT) AS dot,
       CAST(SUM(a.n * a.n) AS BIGINT) AS norm_a2,
       CAST(SUM(b.n * b.n) AS BIGINT) AS norm_b2
FROM dense a JOIN dense b
  ON a.hod = b.hod AND a.event_type < b.event_type
GROUP BY 1, 2
"""


def register_r4bf(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "linenumber_contiguity_audit": q_linenumber_contiguity_audit,
            "retail_vs_realized_gap": q_retail_vs_realized_gap,
            "type_profile_cosine": q_type_profile_cosine,
        }
    )
    oracles.update(
        {
            "linenumber_contiguity_audit": CONTIGUITY_SQL,
            "retail_vs_realized_gap": RETAIL_GAP_SQL,
            "type_profile_cosine": PROFILE_COSINE_SQL,
        }
    )
