"""Round-4 batch JI: consecutive-day habits, the undiscounted
core, and embedding scale by class — the customer order-streak
record (the longest run of consecutive calendar days on which
one customer kept ordering, plus how many customers ever ran a
2+ day streak), the discount-free order census (orders where
EVERY line pays list price — the demand that needs no subsidy),
and the embedding norm quantiles by label (median and IQR of
vector norms per class: scale differences that break dot-product
comparisons).

Exactness discipline: streaks are integer gaps-and-islands per
customer; discount-free is an exact per-order max-bp == 0 test;
norms mirror the identical sum-of-squares expression with
interpolated quantiles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _round_half_away,
)
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_DIM = 64


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_COS_COLS = ["n_customers", "record_streak",
             "n_streak2plus", "streak2_ppm"]


def q_customer_order_streak_record(sf_dir):
    """Compulsive or scheduled?  Per customer, the longest run
    of CONSECUTIVE calendar days with at least one order; the
    global record and how many customers ever chained 2+ days —
    humans batch, schedulers drip daily.  Customers resolve
    whole in hash buckets; streaks are exact integer
    gaps-and-islands."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderdate"))
        us = b["o_orderdate"].cast(pa.timestamp("us")).cast(
            pa.int64())
        t = pa.table({
            "ck": b["o_custkey"].cast(pa.int64()),
            "day": pc.divide(us, _DAY_US),
        })
        g = t.group_by(["ck", "day"]).aggregate([])
        return add_bucket(g, "ck", 64)

    def streaks(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "best": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        # dedup (ck, day) across batch boundaries first
        g = g.drop_duplicates(["ck", "day"])
        out = []
        for ck, sub in g.groupby("ck"):
            d = np.sort(sub["day"].to_numpy(np.int64))
            best = cur = 1
            for i in range(1, len(d)):
                cur = cur + 1 if d[i] == d[i - 1] + 1 else 1
                best = max(best, cur)
            out.append(best)
        return pd.DataFrame(
            {"best": np.array(out, dtype=np.int64)})

    bb = (
        orders.map_batches(project, batch_format="pyarrow",
                           batch_size=None)
        .groupby(_BUCKET)
        .map_groups(streaks, batch_format="pandas")
        .to_pandas()
    )
    if "best" not in bb.columns or len(bb) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _COS_COLS})
    best = bb["best"].to_numpy(np.int64)
    n = len(best)
    s2 = int((best >= 2).sum())
    return pa.table({
        "n_customers": pa.array([n], pa.int64()),
        "record_streak": pa.array(
            [int(best.max())], pa.int64()),
        "n_streak2plus": pa.array([s2], pa.int64()),
        "streak2_ppm": pa.array(
            [_round_half_away(s2 / n * 1e6)], pa.int64()),
    })


COS_SQL = f"""
WITH cd AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS ck,
         EPOCH_US(o_orderdate) // {_DAY_US} AS day
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
), isl AS MATERIALIZED (
  SELECT ck,
         day - ROW_NUMBER() OVER (PARTITION BY ck
                                  ORDER BY day) AS grp
  FROM cd
), runs AS MATERIALIZED (
  SELECT ck, CAST(COUNT(*) AS BIGINT) AS len
  FROM isl GROUP BY ck, grp
), per AS MATERIALIZED (
  SELECT ck, CAST(MAX(len) AS BIGINT) AS best
  FROM runs GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(MAX(best) AS BIGINT) AS record_streak,
       CAST(SUM(CASE WHEN best >= 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_streak2plus,
       CAST(ROUND(CAST(SUM(CASE WHEN best >= 2 THEN 1 ELSE 0
                           END) AS DOUBLE) / COUNT(*)
            * 1000000, 0) AS BIGINT) AS streak2_ppm
FROM per HAVING COUNT(*) > 0
"""

_DFO_COLS = ["n_orders", "n_discount_free", "free_ppm",
             "n_all_discounted", "all_disc_ppm"]


def q_discount_free_orders(sf_dir):
    """The demand that needs no subsidy: orders where EVERY line
    pays full list (max discount bp = 0), versus orders where
    every line got a cut — the first set is pricing power, the
    second is habit.  Per-order min/max discount bp fold
    exactly."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_discount"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_orderkey", "l_discount"))
        if b.num_rows == 0:
            return pa.table({
                "ok": pa.array([], pa.int64()),
                "mn": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64()),
            })
        d = b["l_discount"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        bp = np.where(d >= 0, np.floor(d * 10000 + 0.5),
                      np.ceil(d * 10000 - 0.5)).astype(np.int64)
        t = pa.table({
            "ok": b["l_orderkey"].cast(pa.int64()),
            "mn": pa.array(bp),
            "mx": pa.array(bp),
        })
        g = t.group_by(["ok"]).aggregate(
            [("mn", "min"), ("mx", "max")])
        return g.rename_columns(["ok", "mn", "mx"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["ok"]).aggregate(
            [("mn", "min"), ("mx", "max")])
        return g.rename_columns(["ok", "mn", "mx"])

    def census(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "n": pa.array([], pa.int64()),
                "free": pa.array([], pa.int64()),
                "alld": pa.array([], pa.int64()),
            })
        mn = b["mn"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        mx = b["mx"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "n": pa.array([b.num_rows], pa.int64()),
            "free": pa.array([int((mx == 0).sum())],
                             pa.int64()),
            "alld": pa.array([int((mn > 0).sum())],
                             pa.int64()),
        })

    def ccomb(b: pa.Table) -> pa.Table:
        return pa.table({
            "n": pa.array(
                [pc.sum(b["n"]).as_py() or 0], pa.int64()),
            "free": pa.array(
                [pc.sum(b["free"]).as_py() or 0], pa.int64()),
            "alld": pa.array(
                [pc.sum(b["alld"]).as_py() or 0], pa.int64()),
        })

    per = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["ok"],
    )
    st = tree_merge(
        per.map_batches(census, batch_format="pyarrow",
                        batch_size=None), ccomb).to_pandas()
    if "n" not in st.columns or len(st) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DFO_COLS})
    n = int(st["n"].sum())
    if n == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DFO_COLS})
    free = int(st["free"].sum())
    alld = int(st["alld"].sum())
    return pa.table({
        "n_orders": pa.array([n], pa.int64()),
        "n_discount_free": pa.array([free], pa.int64()),
        "free_ppm": pa.array(
            [_round_half_away(free / n * 1e6)], pa.int64()),
        "n_all_discounted": pa.array([alld], pa.int64()),
        "all_disc_ppm": pa.array(
            [_round_half_away(alld / n * 1e6)], pa.int64()),
    })


DFO_SQL = """
WITH po AS MATERIALIZED (
  SELECT l_orderkey AS ok,
         CAST(MIN(CAST(ROUND(l_discount * 10000, 0) AS BIGINT))
              AS BIGINT) AS mn,
         CAST(MAX(CAST(ROUND(l_discount * 10000, 0) AS BIGINT))
              AS BIGINT) AS mx
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_discount IS NOT NULL
  GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN mx = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_discount_free,
       CAST(ROUND(CAST(SUM(CASE WHEN mx = 0 THEN 1 ELSE 0
                           END) AS DOUBLE) / COUNT(*)
            * 1000000, 0) AS BIGINT) AS free_ppm,
       CAST(SUM(CASE WHEN mn > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_all_discounted,
       CAST(ROUND(CAST(SUM(CASE WHEN mn > 0 THEN 1 ELSE 0
                           END) AS DOUBLE) / COUNT(*)
            * 1000000, 0) AS BIGINT) AS all_disc_ppm
FROM po HAVING COUNT(*) > 0
"""

_ENQ_COLS = ["label", "n_vecs", "median_norm_x1e6",
             "iqr_norm_x1e6"]


def q_embedding_norm_quantiles_by_label(sf_dir):
    """Scale drift between classes: the median and IQR of
    embedding vector norms per label — classes at different
    norms make raw dot products rank by scale, not similarity.
    Norms compute with the identical sum-of-squares expression
    per vector; quantiles interpolate identically."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["label", "embedding"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("label", "embedding"))
        if b.num_rows == 0:
            return pa.table({
                "label": pa.array([], pa.int64()),
                "norm": pa.array([], pa.float64()),
            })
        mat = np.vstack([np.asarray(v, np.float64)
                         for v in b["embedding"].to_pylist()])
        norm = np.sqrt((mat * mat).sum(axis=1))
        return pa.table({
            "label": b["label"].cast(pa.int64()),
            "norm": pa.array(norm),
        })

    nn = emb.map_batches(part, batch_format="pyarrow",
                         batch_size=None).to_pandas()
    if "label" not in nn.columns or len(nn) == 0:
        return pa.table({
            "label": pa.array([], pa.int64()),
            "n_vecs": pa.array([], pa.int64()),
            "median_norm_x1e6": pa.array([], pa.int64()),
            "iqr_norm_x1e6": pa.array([], pa.int64()),
        })
    rows = []
    for lb, g in nn.groupby("label"):
        v = g["norm"].to_numpy(np.float64)
        q1 = float(np.percentile(v, 25))
        q2 = float(np.percentile(v, 50))
        q3 = float(np.percentile(v, 75))
        rows.append((int(lb), len(v),
                     _round_half_away(q2 * 1e6),
                     _round_half_away((q3 - q1) * 1e6)))
    rows.sort()
    return pa.table({
        "label": pa.array([r[0] for r in rows], pa.int64()),
        "n_vecs": pa.array([r[1] for r in rows], pa.int64()),
        "median_norm_x1e6": pa.array(
            [r[2] for r in rows], pa.int64()),
        "iqr_norm_x1e6": pa.array(
            [r[3] for r in rows], pa.int64()),
    })


ENQ_SQL = f"""
WITH nm AS MATERIALIZED (
  SELECT label, vec_id,
         SQRT(SUM(CAST(embedding[CAST(r.k AS INTEGER)]
                       AS DOUBLE)
                  * embedding[CAST(r.k AS INTEGER)])) AS norm
  FROM embeddings CROSS JOIN range(1, {_DIM + 1}) r(k)
  WHERE label IS NOT NULL AND embedding IS NOT NULL
  GROUP BY 1, 2
), q AS MATERIALIZED (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
         QUANTILE_CONT(norm, 0.25) AS q1,
         QUANTILE_CONT(norm, 0.50) AS q2,
         QUANTILE_CONT(norm, 0.75) AS q3
  FROM nm GROUP BY 1
)
SELECT CAST(label AS BIGINT) AS label, n AS n_vecs,
       CAST(ROUND(q2 * 1000000, 0) AS BIGINT)
         AS median_norm_x1e6,
       CAST(ROUND((q3 - q1) * 1000000, 0) AS BIGINT)
         AS iqr_norm_x1e6
FROM q
ORDER BY label
"""


def register_r4ji(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "customer_order_streak_record":
                q_customer_order_streak_record,
            "discount_free_orders": q_discount_free_orders,
            "embedding_norm_quantiles_by_label":
                q_embedding_norm_quantiles_by_label,
        }
    )
    oracles.update(
        {
            "customer_order_streak_record": COS_SQL,
            "discount_free_orders": DFO_SQL,
            "embedding_norm_quantiles_by_label": ENQ_SQL,
        }
    )
