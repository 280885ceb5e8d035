"""Round-4 batch GX: positional pricing, priority habits, and
dimension health — mean discount by lineitem position within the
order (does line 1 get a different deal than line 7? — positional
pricing bias), priority loyalty per customer (entropy of each
customer's order-priority mix plus the single-priority share — is
priority a customer trait or per-order noise?), and the embedding
dimension variance spectrum (min/median/max coordinate variance
and the extreme dims — dead dimensions waste index bits, screaming
ones dominate distances).

Exactness discipline: discounts fold as exact basis points (x1e4
integers) per position; per-customer priority counts are exact
with one mirrored entropy fold; dim variances use two-pass
centered moments with interpolated median across dims."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import _round_half_away
from mimirsbrunn_ray.stages.rollup import tree_merge

_EMB_DIM = 64


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_DLP_COLS = ["linenumber", "n_lineitems", "mean_discount_ppm"]


def q_discount_by_line_position(sf_dir):
    """Positional pricing audit: the mean discount by lineitem
    POSITION within its order (l_linenumber) — a monotone slope
    means the pricing engine treats later lines differently, a
    bias invisible to order-level averages.  Discounts snap to
    exact basis points (x1e4) before folding, so the per-position
    means are exact rationals."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_linenumber", "l_discount"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_linenumber", "l_discount"))
        if b.num_rows == 0:
            return pa.table({
                "ln": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "bp": pa.array([], pa.int64()),
            })
        d = b["l_discount"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        bp = np.where(
            d >= 0, np.floor(d * 1e4 + 0.5),
            np.ceil(d * 1e4 - 0.5)).astype(np.int64)
        t = pa.table({
            "ln": b["l_linenumber"].cast(pa.int64()),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
            "bp": pa.array(bp),
        })
        g = t.group_by(["ln"]).aggregate(
            [("n", "sum"), ("bp", "sum")])
        return g.rename_columns(["ln", "n", "bp"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["ln"]).aggregate(
            [("n", "sum"), ("bp", "sum")])
        return g.rename_columns(["ln", "n", "bp"])

    cc = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "ln" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DLP_COLS})
    cc = cc.sort_values("ln", ignore_index=True)
    ppm = [
        _round_half_away(bp / n * 100.0)
        for bp, n in zip(cc["bp"].astype(np.int64),
                         cc["n"].astype(np.int64))
    ]
    return pa.table({
        "linenumber": pa.array(cc["ln"].to_numpy(np.int64)),
        "n_lineitems": pa.array(cc["n"].to_numpy(np.int64)),
        "mean_discount_ppm": pa.array(ppm, pa.int64()),
    })


DLP_SQL = """
WITH li AS MATERIALIZED (
  SELECT CAST(l_linenumber AS BIGINT) AS ln,
         CAST(ROUND(l_discount * 10000, 0) AS BIGINT) AS bp
  FROM lineitem
  WHERE l_linenumber IS NOT NULL AND l_discount IS NOT NULL
)
SELECT ln AS linenumber,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(ROUND(CAST(SUM(bp) AS DOUBLE) / COUNT(*) * 100, 0)
            AS BIGINT) AS mean_discount_ppm
FROM li GROUP BY 1 ORDER BY linenumber
"""

_PL_COLS = ["n_customers", "single_priority_ppm",
            "mean_entropy_x1e6"]


def q_priority_loyalty(sf_dir):
    """Is order priority a CUSTOMER trait?  Per customer (with 2+
    orders) the entropy of their priority mix and the share using
    exactly one priority — high single-priority share means
    priority routing is account-level and cacheable, high entropy
    means it is per-order noise.  Per-(customer, priority) counts
    fold exactly; the entropy is one mirrored fold per
    customer."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderpriority"))
        g = b.group_by(["o_custkey", "o_orderpriority"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["cust", "prio", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["cust", "prio"]).aggregate([("n", "sum")])
        return g.rename_columns(["cust", "prio", "n"])

    cp = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["cust"],
    ).to_pandas()
    if "cust" not in cp.columns or len(cp) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PL_COLS})
    cp = cp.sort_values(["cust", "prio"], ignore_index=True)
    cust = cp["cust"].to_numpy(np.int64)
    n = cp["n"].to_numpy(np.int64).astype(np.float64)
    first = np.ones(len(cp), dtype=bool)
    first[1:] = cust[1:] != cust[:-1]
    starts = np.flatnonzero(first)
    lens = np.diff(np.append(starts, len(cp)))
    totals = np.add.reduceat(n, starts)
    keep = totals >= 2
    p = n / np.repeat(totals, lens)
    terms = -(p * np.log2(p))
    h = np.add.reduceat(terms, starts)
    h = h[keep]
    single = (lens == 1)[keep]
    nc = int(keep.sum())
    if nc == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PL_COLS})
    return pa.table({
        "n_customers": pa.array([nc], pa.int64()),
        "single_priority_ppm": pa.array(
            [_round_half_away(int(single.sum()) / nc * 1e6)],
            pa.int64()),
        "mean_entropy_x1e6": pa.array(
            [_round_half_away(float(h.mean()) * 1e6)],
            pa.int64()),
    })


PRIORITY_LOYALTY_SQL = """
WITH cp AS MATERIALIZED (
  SELECT o_custkey AS cust, o_orderpriority AS prio,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderpriority IS NOT NULL
  GROUP BY 1, 2
), pr AS MATERIALIZED (
  SELECT cust,
         CAST(n AS DOUBLE)
           / SUM(n) OVER (PARTITION BY cust) AS p,
         SUM(n) OVER (PARTITION BY cust) AS total
  FROM cp
), per_cust AS MATERIALIZED (
  SELECT cust,
         CAST(ANY_VALUE(total) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS n_prios,
         -SUM(p * LOG2(p)) AS h
  FROM pr GROUP BY cust
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(ROUND(CAST(SUM(CASE WHEN n_prios = 1 THEN 1 ELSE 0
                           END) AS DOUBLE) / COUNT(*)
            * 1000000, 0) AS BIGINT) AS single_priority_ppm,
       CAST(ROUND(AVG(h) * 1000000, 0) AS BIGINT)
         AS mean_entropy_x1e6
FROM per_cust
WHERE total >= 2
HAVING COUNT(*) > 0
"""

_DVS_COLS = ["dim", "n_vecs", "min_var_x1e9", "med_var_x1e9",
             "max_var_x1e9", "argmax_dim"]


def q_dim_variance_spectrum(sf_dir):
    """Embedding dimension health: the min / median / max
    coordinate variance across the 64 dims (two-pass centered) and
    which dim screams loudest — dead dims (tiny variance) waste
    index bits and quantizer budget, dominant ones swamp distance
    computations; a healthy learned space is roughly isotropic.
    Mean pass then centered second-moment pass, both
    distributed."""
    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["embedding"]).materialize()

    def mpart(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["embedding"]))
        if b.num_rows == 0:
            return pa.table({
                "j": pa.array([], pa.int64()),
                "s": pa.array([], pa.float64()),
                "n": pa.array([], pa.int64()),
            })
        x = b["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64).reshape(
            b.num_rows, -1)
        d = x.shape[1]
        return pa.table({
            "j": pa.array(np.arange(d, dtype=np.int64)),
            "s": pa.array(x.sum(axis=0)),
            "n": pa.array(np.full(d, len(x), np.int64)),
        })

    def mcomb(b: pa.Table) -> pa.Table:
        g = b.group_by(["j"]).aggregate(
            [("s", "sum"), ("n", "sum")])
        return g.rename_columns(["j", "s", "n"])

    mm = tree_merge(
        emb.map_batches(mpart, batch_format="pyarrow",
                        batch_size=None),
        mcomb,
    ).to_pandas()
    if "j" not in mm.columns or len(mm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DVS_COLS})
    mm = mm.sort_values("j")
    n_tot = int(mm["n"].iloc[0])
    mu = (mm["s"].to_numpy(np.float64)
          / mm["n"].to_numpy(np.float64))

    def vpart(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["embedding"]))
        if b.num_rows == 0:
            return pa.table({
                "j": pa.array([], pa.int64()),
                "ss": pa.array([], pa.float64()),
            })
        x = b["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64).reshape(
            b.num_rows, -1)
        d = x - mu[None, :]
        return pa.table({
            "j": pa.array(np.arange(x.shape[1], dtype=np.int64)),
            "ss": pa.array((d * d).sum(axis=0)),
        })

    def vcomb(b: pa.Table) -> pa.Table:
        g = b.group_by(["j"]).aggregate([("ss", "sum")])
        return g.rename_columns(["j", "ss"])

    vv = tree_merge(
        emb.map_batches(vpart, batch_format="pyarrow",
                        batch_size=None),
        vcomb,
    ).to_pandas()
    if "j" not in vv.columns or len(vv) == 0 or n_tot == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DVS_COLS})
    vv = vv.sort_values("j", ignore_index=True)
    var = vv["ss"].to_numpy(np.float64) / n_tot
    argmax = int(vv["j"].to_numpy(np.int64)[int(np.argmax(var))])
    return pa.table({
        "dim": pa.array([len(var)], pa.int64()),
        "n_vecs": pa.array([n_tot], pa.int64()),
        "min_var_x1e9": pa.array(
            [_round_half_away(float(var.min()) * 1e9)],
            pa.int64()),
        "med_var_x1e9": pa.array(
            [_round_half_away(float(np.percentile(var, 50))
                              * 1e9)], pa.int64()),
        "max_var_x1e9": pa.array(
            [_round_half_away(float(var.max()) * 1e9)],
            pa.int64()),
        "argmax_dim": pa.array([argmax], pa.int64()),
    })


DIM_VAR_SQL = f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, r.k - 1 AS j,
         CAST(embedding[CAST(r.k AS INTEGER)] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(1, {_EMB_DIM + 1}) r(k)
  WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
), mu AS MATERIALIZED (
  SELECT j, AVG(x) AS m, CAST(COUNT(*) AS BIGINT) AS n
  FROM v GROUP BY 1
), vr AS MATERIALIZED (
  SELECT v.j,
         SUM((v.x - mu.m) * (v.x - mu.m)) / ANY_VALUE(mu.n)
           AS var,
         ANY_VALUE(mu.n) AS n
  FROM v JOIN mu USING (j)
  GROUP BY 1
), am AS MATERIALIZED (
  SELECT j AS argmax_dim FROM vr
  ORDER BY var DESC, j LIMIT 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS dim,
       CAST(ANY_VALUE(vr.n) AS BIGINT) AS n_vecs,
       CAST(ROUND(MIN(vr.var) * 1000000000, 0) AS BIGINT)
         AS min_var_x1e9,
       CAST(ROUND(MEDIAN(vr.var) * 1000000000, 0) AS BIGINT)
         AS med_var_x1e9,
       CAST(ROUND(MAX(vr.var) * 1000000000, 0) AS BIGINT)
         AS max_var_x1e9,
       CAST(ANY_VALUE(am.argmax_dim) AS BIGINT) AS argmax_dim
FROM vr CROSS JOIN am
HAVING COUNT(*) > 0
"""


def register_r4gx(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "discount_by_line_position":
                q_discount_by_line_position,
            "priority_loyalty": q_priority_loyalty,
            "dim_variance_spectrum": q_dim_variance_spectrum,
        }
    )
    oracles.update(
        {
            "discount_by_line_position": DLP_SQL,
            "priority_loyalty": PRIORITY_LOYALTY_SQL,
            "dim_variance_spectrum": DIM_VAR_SQL,
        }
    )
