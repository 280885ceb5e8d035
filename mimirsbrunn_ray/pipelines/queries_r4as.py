"""Round-4 batch AS: hapax legomena share, per-vector top dimensions,
and iceberg cells.

Exactness discipline: hapax counts are exact vocabulary-grain
integers; top-dimension selection orders by (x1e6-quantized absolute
value DESC, dim ASC) so ties can't diverge; iceberg membership is the
scale-free integer cross-product n * n_cells >= 2 * total.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# hapax legomena share per source
# ---------------------------------------------------------------------------


def q_hapax_share_per_source(sf_dir):
    """Per source: vocabulary size and hapax count (words occurring
    exactly ONCE in that source) — the lexical-fragility signal (a high
    hapax share means the tail of the vocabulary is unsupported).
    One decomposable (source, word) count pass tree-merged on the
    vocabulary grain (for open web-scale vocabularies prune with a
    min-df pass first — the unigram-LM caveat), then a bounded
    per-source fold."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["source"]), pc.is_valid(b["text"]))
        )
        words = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        src = pa.chunked_array(
            [
                pa.array(
                    np.repeat(
                        b["source"].to_numpy(zero_copy_only=False), n_per
                    )
                )
            ]
        )
        t = pa.table({"source": src, "w": flat})
        g = t.group_by(["source", "w"]).aggregate([([], "count_all")])
        g = g.select(["source", "w", "count_all"])
        return g.rename_columns(["source", "w", "c"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "w"]).aggregate([("c", "sum")])
        return g.rename_columns(["source", "w", "c"])

    vocab = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["source", "w"],
    )

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "source" not in b.column_names:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_vocab": pa.array([], pa.int64()),
                    "n_hapax": pa.array([], pa.int64()),
                }
            )
        c = b["c"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "source": b["source"],
                "one": pa.array(np.ones(len(c), np.int64)),
                "hapax": pa.array((c == 1).astype(np.int64)),
            }
        )
        g = t.group_by(["source"]).aggregate(
            [("one", "sum"), ("hapax", "sum")]
        )
        g = g.select(["source", "one_sum", "hapax_sum"])
        return g.rename_columns(["source", "n_vocab", "n_hapax"])

    def fold_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate(
            [("n_vocab", "sum"), ("n_hapax", "sum")]
        )
        return g.rename_columns(["source", "n_vocab", "n_hapax"])

    return tree_merge(
        vocab.map_batches(fold, batch_format="pyarrow", batch_size=None),
        fold_combine,
    )


HAPAX_SQL = """
WITH w AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS w
  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
), c AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM w GROUP BY 1, 2
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_vocab,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hapax
FROM c GROUP BY 1
"""


# ---------------------------------------------------------------------------
# per-vector top-3 dimensions by absolute value
# ---------------------------------------------------------------------------

_TOPDIM_K = 3


def q_embedding_top_dims(sf_dir):
    """Per embedding vector, the `_TOPDIM_K` dimensions with the
    largest absolute value — the sparse signature used for vector
    debugging and feature attribution. Selection orders by the
    x1e6-quantized |value| DESC then dim ASC (ties can't diverge
    between engines); one streaming pass with a vectorized per-row
    argpartition."""
    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def batch(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["vec_id"]))
        empty = pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "absval_x1e6": pa.array([], pa.int64()),
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
        m = _round_half_away(np.abs(flat.reshape(len(b), dim)) * 1e6)
        # order by (absval DESC, dim ASC): lexsort on (-abs, dim)
        order = np.lexsort(
            (np.broadcast_to(np.arange(dim), m.shape), -m), axis=1
        )[:, :_TOPDIM_K]
        vid = b["vec_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        rows = len(b) * _TOPDIM_K
        out_vid = np.repeat(vid, _TOPDIM_K)
        out_rank = np.tile(
            np.arange(1, _TOPDIM_K + 1, dtype=np.int64), len(b)
        )
        out_dim = order.ravel().astype(np.int64)
        out_val = m[np.repeat(np.arange(len(b)), _TOPDIM_K),
                    order.ravel()]
        assert len(out_vid) == rows
        return pa.table(
            {
                "vec_id": pa.array(out_vid),
                "rank": pa.array(out_rank),
                "dim": pa.array(out_dim),
                "absval_x1e6": pa.array(out_val),
            }
        )

    return emb.map_batches(batch, batch_format="pyarrow", batch_size=None)


TOPDIM_SQL = f"""
WITH v AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id IS NOT NULL
), flat AS (
  SELECT vec_id,
         CAST(i - 1 AS BIGINT) AS dim,
         CAST(ROUND(ABS(CAST(embedding[i] AS DOUBLE)) * 1000000, 0)
              AS BIGINT) AS absval_x1e6
  FROM v, (SELECT unnest(generate_series(1, 64)) AS i) idx
  WHERE i <= len(embedding)
)
SELECT vec_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY absval_x1e6 DESC, dim) AS BIGINT) AS rank,
       dim, absval_x1e6
FROM flat
QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
        ORDER BY absval_x1e6 DESC, dim) <= {_TOPDIM_K}
"""


# ---------------------------------------------------------------------------
# iceberg cells: (type, dow, hod) cells holding >= 1% of all events
# ---------------------------------------------------------------------------


def q_iceberg_cells_1pct(sf_dir):
    """Iceberg query: the (event_type, day-of-week, hour-of-day) cells
    carrying at least TWICE the mean cell load — the classic
    'only-the-tip-of-the-cube' aggregate (Fang et al.), answered with
    the scale-free integer cross-product n * n_cells >= 2 * total.
    One decomposable cube pass bounded by types x 7 x 24."""
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
        dow = ((np.floor_divide(ts_us, _DAY_US) + 4) % 7).astype(np.int64)
        hod = ((ts_us // _HOUR_US) % 24).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "dow": pa.array(dow),
                "hod": pa.array(hod),
            }
        )
        g = t.group_by(["event_type", "dow", "hod"]).aggregate(
            [([], "count_all")]
        )
        g = g.select(["event_type", "dow", "hod", "count_all"])
        return g.rename_columns(["event_type", "dow", "hod", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "dow", "hod"]).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["event_type", "dow", "hod", "n"])

    cube = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: types x 7 x 24

    if not len(cube):
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "dow": pa.array([], pa.int64()),
                "hod": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "total": pa.array([], pa.int64()),
            }
        )
    total = int(cube["n"].sum())
    n_cells = len(cube)
    keep = cube[cube["n"] * n_cells >= 2 * total].sort_values(
        ["event_type", "dow", "hod"], ignore_index=True
    )
    return pa.table(
        {
            "event_type": pa.array(keep["event_type"], pa.string()),
            "dow": pa.array(keep["dow"].to_numpy(dtype=np.int64)),
            "hod": pa.array(keep["hod"].to_numpy(dtype=np.int64)),
            "n": pa.array(keep["n"].to_numpy(dtype=np.int64)),
            "total": pa.array(
                np.full(len(keep), total, dtype=np.int64)
            ),
        }
    )


ICEBERG_SQL = """
WITH cube_ AS MATERIALIZED (
  SELECT event_type,
         CAST(dayofweek(ts) AS BIGINT) AS dow,
         CAST(hour(ts) AS BIGINT) AS hod,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2, 3
), t AS (
  SELECT CAST(SUM(n) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS n_cells
  FROM cube_
)
SELECT c.event_type, c.dow, c.hod, c.n, t.total
FROM cube_ c, t
WHERE c.n * t.n_cells >= 2 * t.total
"""


def register_r4as(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "hapax_share_per_source": q_hapax_share_per_source,
            "embedding_top_dims": q_embedding_top_dims,
            "iceberg_cells_1pct": q_iceberg_cells_1pct,
        }
    )
    oracles.update(
        {
            "hapax_share_per_source": HAPAX_SQL,
            "embedding_top_dims": TOPDIM_SQL,
            "iceberg_cells_1pct": ICEBERG_SQL,
        }
    )
