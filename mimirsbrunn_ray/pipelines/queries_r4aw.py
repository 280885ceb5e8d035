"""Round-4 batch AW: exact reciprocal nearest neighbors, whitespace-only
duplicate groups, and supplier market concentration (HHI).

Exactness discipline: similarities are integer dot products of
x1e6-quantized embedding codes (each term <= ~1e12, 64-dim sums
<= ~1e14 — exact in both int64 and double); duplicate grouping keys on
the canonical normalized text; HHI ships as the integer pair
(sum of squared supplier quantities, squared total).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# reciprocal nearest neighbors on quantized dot products
# ---------------------------------------------------------------------------


def q_reciprocal_nn_pairs(sf_dir):
    """Mutual (reciprocal) nearest-neighbor pairs over the embedding
    table: a <-> b where each is the other's argmax QUANTIZED dot
    product (codes = round(x*1e6); ties -> smaller vec_id) — the
    clustering primitive behind RNN-descent and the exact ground truth
    an ANN index is scored against. Integer similarities make the
    argmax engine-independent. The matmul runs per batch against the
    broadcast code matrix (the cosine_pairs block-broadcast shape);
    1-NNs then pair up in one bounded driver fold."""
    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    # broadcast the full quantized code matrix (dim x n is data-scale:
    # for corpora past the broadcast budget use the IVF/LSH path —
    # this operator is the exact ground-truth tool)
    from mimirsbrunn_ray.stages.broadcast import ensure_cols

    all_tbl = ensure_cols(emb.to_pandas(), ["vec_id", "embedding"])
    all_tbl = all_tbl.sort_values("vec_id", ignore_index=True)
    ids = all_tbl["vec_id"].to_numpy(dtype=np.int64)
    if len(ids) == 0:  # empty-corpus guard: nothing to pair
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "nn_id": pa.array([], pa.int64()),
                         "dot": pa.array([], pa.int64())})
    mat = _round_half_away(
        np.stack(all_tbl["embedding"].to_numpy()).astype(np.float64) * 1e6
    )
    import ray

    ref = ray.put((ids, mat))

    def nn(b: pa.Table) -> pa.Table:
        ids_, mat_ = ray.get(ref)
        b = b.filter(pc.is_valid(b["vec_id"]))
        empty = pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "nn_id": pa.array([], pa.int64()),
                "dot": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        col = b["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        dim = mat_.shape[1]
        q = _round_half_away(flat.reshape(len(b), dim) * 1e6)
        vid = b["vec_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        # exact: products <= ~1e12, 64-dim sums <= ~1e14 < 2^53
        sims = q.astype(np.float64) @ mat_.astype(np.float64).T
        # mask self: argmax over others, ties -> smaller vec_id (ids_
        # ascending, np.argmax returns the first max)
        self_pos = np.searchsorted(ids_, vid)
        rows = np.arange(len(b))
        sims[rows, self_pos] = -np.inf
        best = np.argmax(sims, axis=1)
        return pa.table(
            {
                "vec_id": pa.array(vid),
                "nn_id": pa.array(ids_[best]),
                "dot": pa.array(
                    sims[rows, best].astype(np.int64)
                ),
            }
        )

    nns = emb.map_batches(
        nn, batch_format="pyarrow", batch_size=None
    ).to_pandas()  # bounded: one row per vector (ids + nn ids only)
    nn_map = dict(zip(nns["vec_id"], nns["nn_id"]))
    dot_map = dict(zip(nns["vec_id"], nns["dot"]))
    out = {"vec_a": [], "vec_b": [], "dot": []}
    for a, b_ in nn_map.items():
        if a < b_ and nn_map.get(b_) == a:
            out["vec_a"].append(int(a))
            out["vec_b"].append(int(b_))
            out["dot"].append(int(dot_map[a]))
    order = np.argsort(out["vec_a"])
    return pa.table(
        {
            "vec_a": pa.array(
                np.asarray(out["vec_a"], dtype=np.int64)[order]
            ),
            "vec_b": pa.array(
                np.asarray(out["vec_b"], dtype=np.int64)[order]
            ),
            "dot": pa.array(
                np.asarray(out["dot"], dtype=np.int64)[order]
            ),
        }
    )


RNN_SQL = """
WITH q AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
                        x -> ROUND(CAST(x AS DOUBLE) * 1000000, 0)) AS c
  FROM embeddings WHERE vec_id IS NOT NULL
), sims AS MATERIALIZED (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         CAST(list_inner_product(a.c, b.c) AS BIGINT) AS dot
  FROM q a JOIN q b ON a.vec_id <> b.vec_id
), nn AS (
  SELECT va, vb, dot FROM sims
  QUALIFY ROW_NUMBER()
    OVER (PARTITION BY va ORDER BY dot DESC, vb) = 1
)
SELECT a.va AS vec_a, a.vb AS vec_b, a.dot
FROM nn a JOIN nn b ON a.vb = b.va AND b.vb = a.va
WHERE a.va < a.vb
ORDER BY vec_a
"""


# ---------------------------------------------------------------------------
# whitespace-only duplicate groups
# ---------------------------------------------------------------------------


def q_whitespace_only_dup_groups(sf_dir):
    """Documents that are duplicates UP TO canonical whitespace/case
    normalization but differ in raw bytes — the near-miss class exact
    dedup silently skips. Groups key on normalize_text's NFC -> lower
    -> whitespace-collapse -> trim form; a group counts when it holds
    >= 2 docs with > 1 DISTINCT raw text. One normalized-key shuffle of
    combiner-first (norm, raw) distinct pairs; output is the bounded
    (n_groups, n_docs_involved) audit row."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["doc_id"]), pc.is_valid(b["text"]))
        )
        empty = pa.table(
            {
                "norm": pa.array([], pa.string()),
                "raw": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        # stages/text.py:normalize_text's kernel chain, applied inline
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(pc.utf8_normalize(b["text"], form="NFC")),
                pattern=r"\s+",
                replacement=" ",
            )
        )
        t = pa.table(
            {"norm": norm, "raw": b["text"]}
        )
        g = t.group_by(["norm", "raw"]).aggregate([([], "count_all")])
        g = g.select(["norm", "raw", "count_all"])
        return g.rename_columns(["norm", "raw", "n_docs"])

    def pair_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["norm", "raw"]).aggregate([("n_docs", "sum")])
        return g.rename_columns(["norm", "raw", "n_docs"])

    pairs = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow",
                         batch_size=None),
        pair_combine,
        final_shards=8,
        shard_cols=["norm"],  # a group's variants stay in one shard
    )

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "norm" not in b.column_names:
            return pa.table(
                {
                    "n_groups": pa.array([0], pa.int64()),
                    "n_docs_involved": pa.array([0], pa.int64()),
                }
            )
        df = b.to_pandas()
        g = df.groupby("norm").agg(
            n_raw=("raw", "nunique"), n_docs=("n_docs", "sum")
        )
        hit = g[g["n_raw"] > 1]
        return pa.table(
            {
                "n_groups": pa.array([len(hit)], pa.int64()),
                "n_docs_involved": pa.array(
                    [int(hit["n_docs"].sum())], pa.int64()
                ),
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
        pairs.map_batches(fold, batch_format="pyarrow", batch_size=None),
        fold_combine,
    )


WS_DUP_SQL = """
WITH n AS (
  SELECT doc_id, text,
         trim(regexp_replace(lower(nfc_normalize(text)),
                             '\\s+', ' ', 'g')) AS norm
  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
), g AS (
  SELECT norm, CAST(COUNT(DISTINCT text) AS BIGINT) AS n_raw,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM n GROUP BY 1
)
SELECT CAST(SUM(CASE WHEN n_raw > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_groups,
       CAST(SUM(CASE WHEN n_raw > 1 THEN n_docs ELSE 0 END) AS BIGINT)
         AS n_docs_involved
FROM g
"""


# ---------------------------------------------------------------------------
# supplier concentration (HHI) per part type
# ---------------------------------------------------------------------------


def q_supplier_hhi_by_ptype(sf_dir):
    """Herfindahl-Hirschman supplier concentration per part type: per
    p_type, the integer pair (sum of squared per-supplier quantity
    totals, squared overall total) — HHI = num/den in [1/n_supp, 1],
    the market-concentration metric. The part dimension broadcasts
    (J1); per-(ptype, supplier) quantity totals come from key-disjoint
    shards; the squares fold over the bounded supplier grain."""
    from mimirsbrunn_ray.pipelines.queries import BROADCAST_BYTE_BUDGET
    from mimirsbrunn_ray.stages.join import (
        broadcast_join,
        make_lookup_ref_arrays,
    )

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity"],
    )
    if part.nbytes > BROADCAST_BYTE_BUDGET:  # pragma: no cover - scale path
        raise NotImplementedError(
            "distributed-dim fallback: Dataset.join lineitem to part"
        )
    lookup = make_lookup_ref_arrays(
        part["p_partkey"].to_numpy(zero_copy_only=False),
        part["p_type"].to_numpy(zero_copy_only=False),
    )
    joined = broadcast_join(
        li, lookup, key_col="l_partkey", out_col="p_type",
        out_type=pa.string(),
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["p_type"]), pc.is_valid(b["l_suppkey"])
                ),
                pc.is_valid(b["l_quantity"]),
            )
        )
        q = _round_half_away(
            b["l_quantity"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
        )
        t = pa.table(
            {
                "p_type": b["p_type"],
                "l_suppkey": b["l_suppkey"],
                "q": pa.array(q),
            }
        )
        g = t.group_by(["p_type", "l_suppkey"]).aggregate([("q", "sum")])
        g = g.select(["p_type", "l_suppkey", "q_sum"])
        return g.rename_columns(["p_type", "l_suppkey", "q"])

    def pair_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["p_type", "l_suppkey"]).aggregate([("q", "sum")])
        return g.rename_columns(["p_type", "l_suppkey", "q"])

    pairs = tree_merge(
        joined.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        pair_combine,
        final_shards=8,
        shard_cols=["p_type", "l_suppkey"],
    )

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "p_type" not in b.column_names:
            return pa.table(
                {
                    "p_type": pa.array([], pa.string()),
                    "n_suppliers": pa.array([], pa.int64()),
                    "hhi_num": pa.array([], pa.int64()),
                    "total_qty": pa.array([], pa.int64()),
                }
            )
        q = b["q"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "p_type": b["p_type"],
                "one": pa.array(np.ones(len(q), np.int64)),
                "q2": pa.array(q * q),
                "q": b["q"],
            }
        )
        g = t.group_by(["p_type"]).aggregate(
            [("one", "sum"), ("q2", "sum"), ("q", "sum")]
        )
        g = g.select(["p_type", "one_sum", "q2_sum", "q_sum"])
        return g.rename_columns(
            ["p_type", "n_suppliers", "hhi_num", "total_qty"]
        )

    def fold_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["p_type"]).aggregate(
            [("n_suppliers", "sum"), ("hhi_num", "sum"),
             ("total_qty", "sum")]
        )
        return g.rename_columns(
            ["p_type", "n_suppliers", "hhi_num", "total_qty"]
        )

    return tree_merge(
        pairs.map_batches(fold, batch_format="pyarrow", batch_size=None),
        fold_combine,
    )


HHI_SQL = """
WITH s AS (
  SELECT p.p_type, l.l_suppkey,
         CAST(SUM(CAST(ROUND(l.l_quantity, 0) AS BIGINT)) AS BIGINT)
           AS q
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_suppkey IS NOT NULL AND l.l_quantity IS NOT NULL
  GROUP BY 1, 2
)
SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(q * q) AS BIGINT) AS hhi_num,
       CAST(SUM(q) AS BIGINT) AS total_qty
FROM s GROUP BY 1
"""


def register_r4aw(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "reciprocal_nn_pairs": q_reciprocal_nn_pairs,
            "whitespace_only_dup_groups": q_whitespace_only_dup_groups,
            "supplier_hhi_by_ptype": q_supplier_hhi_by_ptype,
        }
    )
    oracles.update(
        {
            "reciprocal_nn_pairs": RNN_SQL,
            "whitespace_only_dup_groups": WS_DUP_SQL,
            "supplier_hhi_by_ptype": HHI_SQL,
        }
    )
