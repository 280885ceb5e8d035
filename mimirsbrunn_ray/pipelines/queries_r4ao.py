"""Round-4 batch AO: int8 embedding quantization audit, BM25 ranked
retrieval, and per-user behavioral entropy bands.

Exactness discipline: quantization codes are integers produced by the
identical double expression round(x/maxabs*127) on both engines
(float32 inputs widen exactly to float64); BM25 and entropy ride the
proven ln-parity and are rounded once at the end; band edges compare
identical doubles so assignment can't diverge.
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
# int8 symmetric quantization audit over the embedding table
# ---------------------------------------------------------------------------


def q_embedding_int8_quant_stats(sf_dir):
    """Per vector: the exact integer signature of symmetric int8
    quantization — code sum, saturated-code count (|q| = 127), and zero
    count after quantization — the audit run before shipping a
    quantized ANN index (saturation and dead zeros are the two failure
    modes). q = round(x / maxabs * 127) per vector; float32 components
    widen exactly to float64, so both engines produce identical codes.
    One streaming pass, flat vectorized reshape per batch."""
    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def batch(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["vec_id"]))
        empty = pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "code_sum": pa.array([], pa.int64()),
                "n_saturated": pa.array([], pa.int64()),
                "n_zero": pa.array([], pa.int64()),
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
        n_per = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        dim = int(n_per[0])
        m = flat.reshape(len(b), dim)
        maxabs = np.abs(m).max(axis=1)
        safe = np.where(maxabs == 0, 1.0, maxabs)
        q = _round_half_away(m / safe[:, None] * 127.0)
        q[maxabs == 0] = 0
        return pa.table(
            {
                "vec_id": b["vec_id"].cast(pa.int64()),
                "code_sum": pa.array(q.sum(axis=1)),
                "n_saturated": pa.array(
                    (np.abs(q) == 127).sum(axis=1).astype(np.int64)
                ),
                "n_zero": pa.array(
                    (q == 0).sum(axis=1).astype(np.int64)
                ),
            }
        )

    return emb.map_batches(batch, batch_format="pyarrow", batch_size=None)


QUANT_SQL = """
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings WHERE vec_id IS NOT NULL
), s AS (
  SELECT vec_id, e,
         list_max(list_transform(e, x -> ABS(x))) AS maxabs
  FROM v
), q AS (
  SELECT vec_id,
         CASE WHEN maxabs = 0
              THEN list_transform(e, x -> CAST(0 AS BIGINT))
              ELSE list_transform(
                e, x -> CAST(ROUND(x / maxabs * 127, 0) AS BIGINT))
         END AS codes
  FROM s
)
SELECT vec_id,
       CAST(list_sum(codes) AS BIGINT) AS code_sum,
       CAST(len(list_filter(codes, c -> ABS(c) = 127)) AS BIGINT)
         AS n_saturated,
       CAST(len(list_filter(codes, c -> c = 0)) AS BIGINT) AS n_zero
FROM q
"""


# ---------------------------------------------------------------------------
# BM25 ranked retrieval for a fixed query
# ---------------------------------------------------------------------------

_BM25_QUERY = ("dup", "line")  # 'dup' is the corpus's one rare term
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_K = 10


def q_bm25_search_docs(sf_dir):
    """BM25 ranked retrieval for a fixed term set — the standard lexical
    relevance function (Robertson/Sparck Jones), upgrading the trigram
    blend: score = sum over query terms of idf(t) * tf*(k1+1) /
    (tf + k1*(1-b+b*len/avglen)), idf = ln((N-df+0.5)/(df+0.5)).

    Scale shape: df/N/avglen come from ONE decomposable stats pass
    (query-term dfs only — the broadcast side is |query| counters, not
    a vocabulary); scoring is one streaming pass with vectorized
    term-count kernels and a per-batch top-k prune, tree-merged. Scores
    round x1e6 once at the end (ln parity is the engine convention)."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    terms = list(_BM25_QUERY)

    def stats_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        words = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        n_tok = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        seg = np.repeat(np.arange(len(b)), n_tok)
        cols = {
            "n_docs": pa.array([len(b)], pa.int64()),
            "sum_len": pa.array([int(n_tok.sum())], pa.int64()),
        }
        fl = flat.to_numpy(zero_copy_only=False)
        for t in terms:
            hit_docs = np.unique(seg[fl == t])
            cols[f"df_{t}"] = pa.array([len(hit_docs)], pa.int64())
        return pa.table(cols)

    def stats_combine(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
                for c in b.column_names
            }
        )

    st = tree_merge(
        docs.map_batches(stats_partial, batch_format="pyarrow",
                         batch_size=None),
        stats_combine,
    ).to_pandas()
    from mimirsbrunn_ray.stages.broadcast import scalar0

    n_docs = int(scalar0(st, "n_docs"))
    avglen = (float(scalar0(st, "sum_len")) / n_docs
              if n_docs else 1.0)
    idf = {
        t: float(np.log((n_docs - int(scalar0(st, f"df_{t}")) + 0.5)
                        / (int(scalar0(st, f"df_{t}")) + 0.5)))
        for t in terms
    }
    k1, bb = _BM25_K1, _BM25_B

    def score(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["doc_id"]), pc.is_valid(b["text"]))
        )
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "score_x1e6": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        words = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        n_tok = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        seg = np.repeat(np.arange(len(b)), n_tok.astype(np.int64))
        s = np.zeros(len(b), dtype=np.float64)
        norm = k1 * (1.0 - bb + bb * n_tok / avglen)
        for t in terms:
            tf = np.bincount(seg[flat == t], minlength=len(b)).astype(
                np.float64
            )
            s += idf[t] * (tf * (k1 + 1.0)) / (tf + norm)
        keep = s > 0
        t_out = pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()).filter(
                    pa.array(keep)
                ),
                "score_x1e6": pa.array(
                    _round_half_away(s[keep] * 1e6)
                ),
            }
        )
        order = [("score_x1e6", "descending"), ("doc_id", "ascending")]
        return t_out.sort_by(order).slice(0, _BM25_K)

    def topk_combine(b: pa.Table) -> pa.Table:
        order = [("score_x1e6", "descending"), ("doc_id", "ascending")]
        return b.sort_by(order).slice(0, _BM25_K)

    out = tree_merge(
        docs.map_batches(score, batch_format="pyarrow", batch_size=None),
        topk_combine,
    ).to_pandas()  # bounded: k rows
    if "doc_id" not in out.columns:  # all-miss corpus loses block schema
        out = pd.DataFrame({"doc_id": [], "score_x1e6": []})
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"].to_numpy(dtype=np.int64)),
            "score_x1e6": pa.array(
                out["score_x1e6"].to_numpy(dtype=np.int64)
            ),
        }
    )


def _bm25_sql(terms, k1: float, b: float, k: int) -> str:
    term_rows = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, string_split(lower(text), ' ') AS ws
  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
), meta AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         SUM(len(ws)) * 1.0 / COUNT(*) AS avglen
  FROM d
), q(term) AS (VALUES {term_rows}),
tf AS (
  SELECT d.doc_id, q.term, len(ws) AS doclen,
         CAST(len(list_filter(d.ws, w -> w = q.term)) AS BIGINT) AS tf
  FROM d CROSS JOIN q
), df AS (
  SELECT term, CAST(SUM(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS df
  FROM tf GROUP BY 1
), scored AS (
  SELECT tf.doc_id,
         SUM(
           LN((meta.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({k1} + 1.0))
           / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.doclen / meta.avglen))
         ) AS score
  FROM tf JOIN df USING (term) CROSS JOIN meta
  GROUP BY 1
)
SELECT doc_id, CAST(ROUND(score * 1000000, 0) AS BIGINT) AS score_x1e6
FROM scored WHERE score > 0
ORDER BY score DESC, doc_id LIMIT {k}
"""


# ---------------------------------------------------------------------------
# per-user behavioral entropy bands
# ---------------------------------------------------------------------------

_ENTROPY_EDGES = (1.55, 1.58, 1.60)  # nats; the 5-type mixes cluster ~1.5-1.61


def q_user_entropy_bands(sf_dir):
    """Users banded by the Shannon entropy of their event-type mix —
    behavioral diversity cohorts (H = -sum p*ln p in nats; bands at
    0.5/1.0/1.5). Per-user type counts come from one hash-bucket
    shuffle; each user's entropy is the identical double expression on
    both engines, so band assignment can't straddle. Output: band ->
    user count."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["event_type"]))
        )
        return add_bucket(b, "user_id", 64)

    proj = ev.map_batches(project, batch_format="pyarrow", batch_size=None)
    edges = np.array(_ENTROPY_EDGES, dtype=np.float64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "band": pd.Series([], dtype=np.int64),
                "n_users": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        cnt = g.groupby(["user_id", "event_type"], sort=False).size()
        tot = cnt.groupby(level=0).transform("sum")
        p = cnt.to_numpy(dtype=np.float64) / tot.to_numpy(dtype=np.float64)
        contrib = pd.Series(
            -p * np.log(p), index=cnt.index.get_level_values(0)
        )
        h = contrib.groupby(level=0).sum()
        band = np.searchsorted(edges, h.to_numpy(), side="right")
        lvl, c = np.unique(band, return_counts=True)
        return pd.DataFrame(
            {
                "band": lvl.astype(np.int64),
                "n_users": c.astype(np.int64),
            }
        )

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["band"]).aggregate([("n_users", "sum")])
        return g.rename_columns(["band", "n_users"])

    return tree_merge(partials, combine)


_edge_case = " ".join(
    f"WHEN h <= {e} THEN {i}" for i, e in enumerate(_ENTROPY_EDGES)
)
ENTROPY_BANDS_SQL = f"""
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
), t AS (
  SELECT user_id, n * 1.0 / SUM(n) OVER (PARTITION BY user_id) AS p
  FROM c
), h AS (
  SELECT user_id, SUM(-p * LN(p)) AS h FROM t GROUP BY 1
)
SELECT CAST(CASE {_edge_case} ELSE {len(_ENTROPY_EDGES)} END AS BIGINT)
         AS band,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM h GROUP BY 1
"""


def register_r4ao(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "embedding_int8_quant_stats": q_embedding_int8_quant_stats,
            "bm25_search_docs": q_bm25_search_docs,
            "user_entropy_bands": q_user_entropy_bands,
        }
    )
    oracles.update(
        {
            "embedding_int8_quant_stats": QUANT_SQL,
            "bm25_search_docs": _bm25_sql(
                _BM25_QUERY, _BM25_K1, _BM25_B, _BM25_K
            ),
            "user_entropy_bands": ENTROPY_BANDS_SQL,
        }
    )
