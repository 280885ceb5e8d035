"""Round-4 batch AV: degree assortativity, supplier price spread, and
rank-product quality scoring.

Exactness discipline: assortativity reduces to exact integer sums over
edge-endpoint degrees feeding one identical double ratio; price spread
is integer cents; the rank product multiplies exact cumulative counts
(common denominator cancels), so ordering is pure integer comparison.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# degree assortativity of the part dependency graph
# ---------------------------------------------------------------------------


def q_degree_assortativity(sf_dir):
    """Degree assortativity of the part dependency graph (the k->k//2,
    k->k//3 edge set): the Pearson correlation between the UNDIRECTED
    degrees at the two ends of every edge — do high-degree parts link
    to high-degree parts? (Newman 2002.) The degree map is
    dimension-scale (built once from the key range); the correlation's
    sextuple (m, sx, sy, sxx, syy, sxy) is exact integers over the
    edge list, and the final rho is one identical double ratio x1e6.
    Each undirected edge contributes BOTH orientations (the standard
    symmetrized form), which keeps the statistic orientation-free."""
    part = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    _mx_raw = part.max("p_partkey")
    mx = int(_mx_raw) if _mx_raw is not None else 0
    ks = np.arange(2, mx + 1, dtype=np.int64)
    src = np.concatenate([ks, ks[ks >= 3]])
    dst = np.concatenate([ks // 2, ks[ks >= 3] // 3])
    deg = np.bincount(
        np.concatenate([src, dst]), minlength=mx + 1
    ).astype(np.int64)
    # symmetrize: both orientations of every edge
    a = np.concatenate([src, dst])
    b = np.concatenate([dst, src])
    dx = deg[a]
    dy = deg[b]
    m = len(a)
    sx = int(dx.sum())
    sy = int(dy.sum())
    sxx = int(np.dot(dx, dx))
    syy = int(np.dot(dy, dy))
    sxy = int(np.dot(dx, dy))
    num = m * sxy - sx * sy
    d1 = m * sxx - sx * sx
    d2 = m * syy - sy * sy
    if d1 > 0 and d2 > 0:
        rho = float(num) / (
            np.sqrt(np.float64(d1)) * np.sqrt(np.float64(d2))
        )
        rho_x = int(_round_half_away(np.array([rho * 1e6]))[0])
    else:
        rho_x = None
    return pa.table(
        {
            "n_edges_directed": pa.array([m], pa.int64()),
            "sxy": pa.array([sxy], pa.int64()),
            "assortativity_x1e6": pa.array([rho_x], pa.int64()),
        }
    )


ASSORT_SQL = """
WITH edges AS MATERIALIZED (
  SELECT p_partkey AS src, p_partkey // 2 AS dst
  FROM part WHERE p_partkey >= 2
  UNION ALL
  SELECT p_partkey, p_partkey // 3 FROM part WHERE p_partkey >= 3
), sym AS (
  SELECT src AS a, dst AS b FROM edges
  UNION ALL
  SELECT dst, src FROM edges
), deg AS (
  SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY 1
), pairs AS (
  SELECT da.d AS dx, db.d AS dy
  FROM sym
  JOIN deg da ON da.node = sym.a
  JOIN deg db ON db.node = sym.b
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
         CAST(SUM(dx * dx) AS BIGINT) AS sxx,
         CAST(SUM(dy * dy) AS BIGINT) AS syy,
         CAST(SUM(dx * dy) AS BIGINT) AS sxy
  FROM pairs
)
SELECT m AS n_edges_directed, sxy,
       CASE WHEN m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0
            THEN CAST(ROUND(
              CAST(m * sxy - sx * sy AS DOUBLE)
              / (SQRT(CAST(m * sxx - sx * sx AS DOUBLE))
                 * SQRT(CAST(m * syy - sy * sy AS DOUBLE)))
              * 1000000, 0) AS BIGINT)
            ELSE NULL END AS assortativity_x1e6
FROM s
"""


# ---------------------------------------------------------------------------
# supplier price spread per part
# ---------------------------------------------------------------------------

_SPREAD_TOPK = 20


def q_part_supplier_price_spread(sf_dir):
    """Per part: how many distinct suppliers shipped it and the cents
    spread between the highest and lowest extended price — the
    procurement arbitrage signal; top `_SPREAD_TOPK` parts by spread
    (ties by part key). Decomposable per-(part) partials carry
    (n_supp via per-shard distinct, min, max); suppliers dedupe in one
    key-disjoint shard pass."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["l_partkey"]),
                    pc.is_valid(b["l_suppkey"]),
                ),
                pc.is_valid(b["l_extendedprice"]),
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
                "l_partkey": b["l_partkey"],
                "l_suppkey": b["l_suppkey"],
                "px": pa.array(px),
            }
        )
        g = t.group_by(["l_partkey", "l_suppkey"]).aggregate(
            [("px", "min"), ("px", "max")]
        )
        g = g.select(["l_partkey", "l_suppkey", "px_min", "px_max"])
        return g.rename_columns(
            ["l_partkey", "l_suppkey", "px_min", "px_max"]
        )

    def pair_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_partkey", "l_suppkey"]).aggregate(
            [("px_min", "min"), ("px_max", "max")]
        )
        return g.rename_columns(
            ["l_partkey", "l_suppkey", "px_min", "px_max"]
        )

    pairs = tree_merge(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        pair_combine,
        final_shards=8,
        shard_cols=["l_partkey"],  # a part's suppliers stay together
    )

    def per_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "l_partkey" not in b.column_names:
            return pa.table(
                {
                    "p_partkey": pa.array([], pa.int64()),
                    "n_suppliers": pa.array([], pa.int64()),
                    "spread_x100": pa.array([], pa.int64()),
                }
            )
        g = b.group_by(["l_partkey"]).aggregate(
            [([], "count_all"), ("px_min", "min"), ("px_max", "max")]
        )
        g = g.select(
            ["l_partkey", "count_all", "px_min_min", "px_max_max"]
        )
        mn = g["px_min_min"].to_numpy(zero_copy_only=False)
        mx = g["px_max_max"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "p_partkey": g["l_partkey"].cast(pa.int64()),
                "n_suppliers": g["count_all"].cast(pa.int64()),
                "spread_x100": pa.array(mx - mn),
            }
        )
        order = [("spread_x100", "descending"), ("p_partkey", "ascending")]
        return t.sort_by(order).slice(0, _SPREAD_TOPK)

    def topk_combine(b: pa.Table) -> pa.Table:
        order = [("spread_x100", "descending"), ("p_partkey", "ascending")]
        return b.sort_by(order).slice(0, _SPREAD_TOPK)

    return tree_merge(
        pairs.map_batches(per_part, batch_format="pyarrow",
                          batch_size=None),
        topk_combine,
    )


SPREAD_SQL = f"""
WITH p AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS mn,
         MAX(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS mx
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
    AND l_extendedprice IS NOT NULL
  GROUP BY 1, 2
)
SELECT l_partkey AS p_partkey,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(MAX(mx) - MIN(mn) AS BIGINT) AS spread_x100
FROM p GROUP BY 1
ORDER BY spread_x100 DESC, p_partkey
LIMIT {_SPREAD_TOPK}
"""


# ---------------------------------------------------------------------------
# rank-product document quality score
# ---------------------------------------------------------------------------

_RANKPROD_K = 20


def q_doc_quality_rank_product(sf_dir):
    """Top `_RANKPROD_K` documents by RANK PRODUCT of two quality
    signals — length and distinct-word count — where each rank is the
    exact cumulative count of docs with metric <= the doc's (the shared
    denominator cancels, so the product of integer cumulative counts
    orders identically to the product of percentile ranks). The rank
    aggregation used when signals live on incomparable scales. Two
    bounded histograms broadcast; one streaming assign + top-k prune;
    ties break on doc_id."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )

    def metrics(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b["doc_id"]), pc.is_valid(b["text"])),
                pc.is_valid(b["n_chars"]),
            )
        )
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "len_": pa.array([], pa.int64()),
                "uniq": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        words = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        n_per = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        seg = np.repeat(np.arange(len(b)), n_per)
        uq = (
            pd.DataFrame({"seg": seg, "w": flat})
            .drop_duplicates()
            .groupby("seg", sort=False)
            .size()
        )
        u = np.zeros(len(b), dtype=np.int64)
        u[uq.index.to_numpy()] = uq.to_numpy(dtype=np.int64)
        return pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "len_": b["n_chars"].cast(pa.int64()),
                "uniq": pa.array(u),
            }
        )

    mdata = docs.map_batches(
        metrics, batch_format="pyarrow", batch_size=None
    ).materialize()

    def hist_of(col):
        def partial(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or col not in b.column_names:
                return pa.table(
                    {"v": pa.array([], pa.int64()),
                     "n": pa.array([], pa.int64())}
                )
            g = b.group_by([col]).aggregate([([], "count_all")])
            g = g.select([col, "count_all"])
            return g.rename_columns(["v", "n"])

        def combine(b: pa.Table) -> pa.Table:
            g = b.group_by(["v"]).aggregate([("n", "sum")])
            return g.rename_columns(["v", "n"])

        h = tree_merge(
            mdata.map_batches(partial, batch_format="pyarrow",
                              batch_size=None),
            combine,
        ).to_pandas()
        if "v" not in h.columns:  # empty-corpus schema loss
            h = pd.DataFrame({"v": pd.Series([], dtype=np.int64),
                              "n": pd.Series([], dtype=np.int64)})
        h = h.sort_values("v")
        v = h["v"].to_numpy(dtype=np.int64)
        cum = np.cumsum(h["n"].to_numpy(dtype=np.int64))
        return v, cum

    lv, lcum = hist_of("len_")
    uv, ucum = hist_of("uniq")
    import ray

    tabs = ray.put((lv, lcum, uv, ucum))

    def assign(b: pa.Table) -> pa.Table:
        lv_, lcum_, uv_, ucum_ = ray.get(tabs)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "rank_len": pa.array([], pa.int64()),
                "rank_uniq": pa.array([], pa.int64()),
                "rank_product": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0 or "doc_id" not in b.column_names:
            return empty
        ln = b["len_"].to_numpy(zero_copy_only=False)
        un = b["uniq"].to_numpy(zero_copy_only=False)
        rl = lcum_[np.searchsorted(lv_, ln, "right") - 1]
        ru = ucum_[np.searchsorted(uv_, un, "right") - 1]
        t = pa.table(
            {
                "doc_id": b["doc_id"],
                "rank_len": pa.array(rl),
                "rank_uniq": pa.array(ru),
                "rank_product": pa.array(rl * ru),
            }
        )
        order = [("rank_product", "descending"), ("doc_id", "ascending")]
        return t.sort_by(order).slice(0, _RANKPROD_K)

    def topk_combine(b: pa.Table) -> pa.Table:
        order = [("rank_product", "descending"), ("doc_id", "ascending")]
        return b.sort_by(order).slice(0, _RANKPROD_K)

    return tree_merge(
        mdata.map_batches(assign, batch_format="pyarrow",
                          batch_size=None),
        topk_combine,
    )


RANKPROD_SQL = f"""
WITH m AS MATERIALIZED (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS len_,
         CAST(len(list_distinct(string_split(lower(text), ' ')))
              AS BIGINT) AS uniq
  FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND n_chars IS NOT NULL
), r AS (
  SELECT doc_id,
         CAST(COUNT(*) OVER (ORDER BY len_
              RANGE UNBOUNDED PRECEDING) AS BIGINT) AS rank_len,
         CAST(COUNT(*) OVER (ORDER BY uniq
              RANGE UNBOUNDED PRECEDING) AS BIGINT) AS rank_uniq
  FROM m
)
SELECT doc_id, rank_len, rank_uniq,
       CAST(rank_len * rank_uniq AS BIGINT) AS rank_product
FROM r
ORDER BY rank_product DESC, doc_id
LIMIT {_RANKPROD_K}
"""


def register_r4av(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "degree_assortativity": q_degree_assortativity,
            "part_supplier_price_spread": q_part_supplier_price_spread,
            "doc_quality_rank_product": q_doc_quality_rank_product,
        }
    )
    oracles.update(
        {
            "degree_assortativity": ASSORT_SQL,
            "part_supplier_price_spread": SPREAD_SQL,
            "doc_quality_rank_product": RANKPROD_SQL,
        }
    )
