"""Round-4 batch GR: assortment lifecycle, metric-axiom violations,
and supply concentration — the part lifecycle census per quarter
(first-ever-shipped = launched, last-ever-shipped = retired, plus
active counts — assortment churn that totals hide), a triangle-
inequality violation count for cosine DISTANCE over consecutive
embedding id triples (1 - cos is NOT a metric; this measures how
often that actually bites on this corpus, which decides whether
metric-tree indexes are safe), and single-source supply risk
(parts with exactly one supplier and the revenue share riding on
them).

Exactness discipline: lifecycle and supplier counts are pure
integers from min/max/distinct folds; triangle checks compare
identically-computed float distances (d13 > d12 + d23 strictly);
revenue shares are exact cents."""

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


_LIFE_COLS = ["quarter", "n_active", "n_launched", "n_retired"]


def q_part_lifecycle_census(sf_dir):
    """Assortment churn per quarter: parts shipping for the first
    time ever (launched), for the last time ever (retired), and at
    all (active) — flat actives can hide violent churn underneath.
    Per-part first/last ship quarters fold as min/max in one
    distributed pass; the census is exact integers."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_shipdate"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_partkey", "l_shipdate"))
        if b.num_rows == 0:
            return pa.table({
                "pk": pa.array([], pa.int64()),
                "q": pa.array([], pa.int64()),
            })
        d = b["l_shipdate"].cast(pa.timestamp("us")).to_pandas()
        q = (d.dt.year * 4
             + (d.dt.month - 1) // 3).to_numpy(np.int64)
        t = pa.table({
            "pk": b["l_partkey"].cast(pa.int64()),
            "q": pa.array(q),
        })
        return t.group_by(["pk", "q"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["pk", "q"]).group_by(
            ["pk", "q"]).aggregate([])

    pq = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["pk"],
    ).to_pandas()
    if "pk" not in pq.columns or len(pq) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LIFE_COLS})
    span = pq.groupby("pk")["q"].agg(["min", "max"])
    active = pq.groupby("q").size()
    launched = span.groupby("min").size()
    retired = span.groupby("max").size()
    out = {c: [] for c in _LIFE_COLS}
    for q in sorted(active.index):
        out["quarter"].append(int(q))
        out["n_active"].append(int(active.loc[q]))
        out["n_launched"].append(int(launched.get(q, 0)))
        out["n_retired"].append(int(retired.get(q, 0)))
    return pa.table(
        {c: pa.array(out[c], pa.int64()) for c in _LIFE_COLS})


LIFECYCLE_SQL = """
WITH pq AS MATERIALIZED (
  SELECT DISTINCT l_partkey AS pk,
         YEAR(l_shipdate) * 4 + (MONTH(l_shipdate) - 1) // 3
           AS q
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_shipdate IS NOT NULL
), span AS MATERIALIZED (
  SELECT pk, MIN(q) AS fq, MAX(q) AS lq FROM pq GROUP BY 1
)
SELECT CAST(pq.q AS BIGINT) AS quarter,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN span.fq = pq.q THEN 1 ELSE 0 END)
            AS BIGINT) AS n_launched,
       CAST(SUM(CASE WHEN span.lq = pq.q THEN 1 ELSE 0 END)
            AS BIGINT) AS n_retired
FROM pq JOIN span USING (pk)
GROUP BY pq.q ORDER BY quarter
"""

_TRI_COLS = ["n_triples", "n_violations", "violation_ppm",
             "max_excess_x1e6"]


def q_cosine_triangle_violations(sf_dir):
    """Metric-axiom audit: over consecutive vec_id triples
    (v, v+1, v+2), count strict violations of the triangle
    inequality d(1,3) <= d(1,2) + d(2,3) for the cosine DISTANCE
    d = 1 - cos — which is not a metric, so metric-tree indexes
    (VP/BK-trees) silently lose recall exactly as often as this
    number says; also reports the worst excess.  Normalized
    vectors and the three dot products fold from identical
    inputs."""
    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"]).materialize()

    def collect(b: pa.Table) -> pa.Table:
        b = _valid(b, ("vec_id", "embedding"))
        if b.num_rows == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "x": pa.array([], pa.list_(pa.float64())),
            })
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        x = b["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64).reshape(
            len(vid), -1)
        return pa.table({
            "vec_id": pa.array(vid),
            "x": pa.array(list(x), pa.list_(pa.float64())),
        })

    tbl = emb.map_batches(collect, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if "vec_id" not in tbl.columns or len(tbl) < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _TRI_COLS})
    tbl = tbl.sort_values("vec_id", ignore_index=True)
    vid = tbl["vec_id"].to_numpy(np.int64)
    x = np.stack(tbl["x"].to_numpy())
    norms = np.maximum(np.sqrt((x * x).sum(axis=1)), 1e-12)
    xn = x / norms[:, None]
    tri = (vid[1:-1] == vid[:-2] + 1) & (vid[2:] == vid[1:-1] + 1)
    if not tri.any():
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _TRI_COLS})
    a = xn[:-2][tri]
    b_ = xn[1:-1][tri]
    c = xn[2:][tri]
    d12 = 1.0 - (a * b_).sum(axis=1)
    d23 = 1.0 - (b_ * c).sum(axis=1)
    d13 = 1.0 - (a * c).sum(axis=1)
    excess = d13 - (d12 + d23)
    viol = excess > 0
    n = int(tri.sum())
    return pa.table({
        "n_triples": pa.array([n], pa.int64()),
        "n_violations": pa.array([int(viol.sum())], pa.int64()),
        "violation_ppm": pa.array(
            [_round_half_away(int(viol.sum()) / n * 1e6)],
            pa.int64()),
        "max_excess_x1e6": pa.array(
            [_round_half_away(float(excess.max()) * 1e6)],
            pa.int64()),
    })


TRIANGLE_SQL = f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, r.k - 1 AS j,
         CAST(embedding[CAST(r.k AS INTEGER)] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(1, {_EMB_DIM + 1}) r(k)
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
), nrm AS MATERIALIZED (
  SELECT vec_id, GREATEST(SQRT(SUM(x * x)), 1e-12) AS nn
  FROM v GROUP BY 1
), dots AS MATERIALIZED (
  SELECT a.vec_id,
         SUM(a.x * b.x)
           / (ANY_VALUE(na.nn) * ANY_VALUE(nb.nn)) AS cos12
  FROM v a JOIN v b ON b.vec_id = a.vec_id + 1 AND b.j = a.j
  JOIN nrm na ON na.vec_id = a.vec_id
  JOIN nrm nb ON nb.vec_id = b.vec_id
  GROUP BY 1
), dots2 AS MATERIALIZED (
  SELECT a.vec_id,
         SUM(a.x * c.x)
           / (ANY_VALUE(na.nn) * ANY_VALUE(nc.nn)) AS cos13
  FROM v a JOIN v c ON c.vec_id = a.vec_id + 2 AND c.j = a.j
  JOIN nrm na ON na.vec_id = a.vec_id
  JOIN nrm nc ON nc.vec_id = c.vec_id
  GROUP BY 1
), tri AS (
  SELECT d1.vec_id,
         (1.0 - d2.cos13)
           - ((1.0 - d1.cos12) + (1.0 - dn.cos12)) AS excess
  FROM dots d1
  JOIN dots dn ON dn.vec_id = d1.vec_id + 1
  JOIN dots2 d2 ON d2.vec_id = d1.vec_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triples,
       CAST(SUM(CASE WHEN excess > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_violations,
       CAST(ROUND(CAST(SUM(CASE WHEN excess > 0 THEN 1 ELSE 0
                           END) AS DOUBLE) / COUNT(*)
            * 1000000, 0) AS BIGINT) AS violation_ppm,
       CAST(ROUND(MAX(excess) * 1000000, 0) AS BIGINT)
         AS max_excess_x1e6
FROM tri HAVING COUNT(*) > 0
"""

_SSR_COLS = ["n_parts", "n_single_source", "single_ppm",
             "revenue_at_risk_ppm"]


def q_single_source_risk(sf_dir):
    """Supply-chain fragility: parts served by exactly ONE
    distinct supplier across all lineitems, and the share of total
    discounted revenue flowing through them — the number a single
    supplier failure puts at risk.  Distinct supplier counts and
    revenue cents fold exactly in one distributed pass."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_partkey", "l_suppkey",
                       "l_extendedprice", "l_discount"))
        if b.num_rows == 0:
            return pa.table({
                "pk": pa.array([], pa.int64()),
                "sk": pa.array([], pa.int64()),
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
            "pk": b["l_partkey"].cast(pa.int64()),
            "sk": b["l_suppkey"].cast(pa.int64()),
            "cents": pa.array(cents),
        })
        g = t.group_by(["pk", "sk"]).aggregate([("cents", "sum")])
        return g.rename_columns(["pk", "sk", "cents"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["pk", "sk"]).aggregate([("cents", "sum")])
        return g.rename_columns(["pk", "sk", "cents"])

    ps = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["pk"],
    ).to_pandas()
    if "pk" not in ps.columns or len(ps) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SSR_COLS})
    agg = ps.groupby("pk").agg(
        n_supp=("sk", "nunique"),
        rev=("cents", "sum")).reset_index()
    n_parts = len(agg)
    single = agg["n_supp"].to_numpy(np.int64) == 1
    total_rev = int(agg["rev"].sum())
    risk_rev = int(agg["rev"].to_numpy(np.int64)[single].sum())
    if n_parts == 0 or total_rev == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SSR_COLS})
    return pa.table({
        "n_parts": pa.array([n_parts], pa.int64()),
        "n_single_source": pa.array(
            [int(single.sum())], pa.int64()),
        "single_ppm": pa.array(
            [_round_half_away(int(single.sum()) / n_parts * 1e6)],
            pa.int64()),
        "revenue_at_risk_ppm": pa.array(
            [_round_half_away(risk_rev / total_rev * 1e6)],
            pa.int64()),
    })


SINGLE_SOURCE_SQL = """
WITH ps AS MATERIALIZED (
  SELECT l_partkey AS pk,
         CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                             * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
  GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(CASE WHEN n_supp = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_single_source,
       CAST(ROUND(CAST(SUM(CASE WHEN n_supp = 1 THEN 1 ELSE 0
                           END) AS DOUBLE) / COUNT(*)
            * 1000000, 0) AS BIGINT) AS single_ppm,
       CAST(ROUND(CAST(SUM(CASE WHEN n_supp = 1 THEN rev
                                ELSE 0 END) AS DOUBLE)
            / SUM(rev) * 1000000, 0) AS BIGINT)
         AS revenue_at_risk_ppm
FROM ps
HAVING COUNT(*) > 0 AND SUM(rev) <> 0
"""


def register_r4gr(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "part_lifecycle_census": q_part_lifecycle_census,
            "cosine_triangle_violations":
                q_cosine_triangle_violations,
            "single_source_risk": q_single_source_risk,
        }
    )
    oracles.update(
        {
            "part_lifecycle_census": LIFECYCLE_SQL,
            "cosine_triangle_violations": TRIANGLE_SQL,
            "single_source_risk": SINGLE_SOURCE_SQL,
        }
    )
