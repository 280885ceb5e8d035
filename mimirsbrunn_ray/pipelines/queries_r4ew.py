"""Round-4 batch EW: corpus-hygiene + structure operators — a
paren/quote balance audit per source (the malformed-markup signal
quality filters gate on), the Zipf rank-frequency slope per source
(the companion to heaps_law: how steep the head of the vocabulary
is), and the global clustering coefficient (transitivity) of the
part dependency graph (triangle census — the one structural census
rich_club/HITS/assortativity don't cover).

Exactness discipline: balance counts are exact substring counts;
Zipf fits run on (ln rank, ln freq) snapped x1e4 from identical
integer (rank, count) pairs with the deterministic tie-break
(count DESC, word ASC), slope folding int64 sufficient statistics;
triangles/wedges are exact integer counts on the bounded
(dimension-scale) edge list and only transitivity snaps x1e6."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4ej import (
    _EDGES_SQL,
    _dep_edges,
    _undirected,
)
from mimirsbrunn_ray.stages.ordered import (
    _round_half_away as _rha_vec,
)
from mimirsbrunn_ray.stages.rollup import tree_merge


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _clean(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def q_paren_balance_audit(sf_dir):
    """Per source: documents with unbalanced parentheses (count of
    '(' differs from ')') and with an odd number of double-quote
    characters — exact substring counts via the Arrow kernel, one
    streaming pass, per-source integer partials tree-merged."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("source", "text"))
        n_open = pc.count_substring(b["text"], "(").to_numpy(
            zero_copy_only=False
        )
        n_close = pc.count_substring(b["text"], ")").to_numpy(
            zero_copy_only=False
        )
        n_quote = pc.count_substring(b["text"], '"').to_numpy(
            zero_copy_only=False
        )
        unbal = (n_open != n_close).astype(np.int64)
        oddq = (n_quote % 2 == 1).astype(np.int64)
        t = pa.table(
            {
                "source": b["source"],
                "n_docs": pa.array(
                    np.ones(len(unbal), np.int64)
                ),
                "unbal_paren_docs": pa.array(unbal),
                "odd_quote_docs": pa.array(oddq),
            }
        )
        g = t.group_by(["source"]).aggregate(
            [("n_docs", "sum"), ("unbal_paren_docs", "sum"),
             ("odd_quote_docs", "sum")]
        )
        return g.rename_columns(
            ["source", "n_docs", "unbal_paren_docs", "odd_quote_docs"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate(
            [("n_docs", "sum"), ("unbal_paren_docs", "sum"),
             ("odd_quote_docs", "sum")]
        )
        return g.rename_columns(
            ["source", "n_docs", "unbal_paren_docs", "odd_quote_docs"]
        )

    out = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow",
                         batch_size=None),
        combine,
    ).to_pandas()
    if "source" not in out.columns:  # empty-corpus schema loss
        out = pd.DataFrame({
            "source": pd.Series([], dtype=object),
            "n_docs": pd.Series([], dtype=np.int64),
            "unbal_paren_docs": pd.Series([], dtype=np.int64),
            "odd_quote_docs": pd.Series([], dtype=np.int64)})
    out = out.sort_values("source", ignore_index=True)
    dirty = (
        out["unbal_paren_docs"].to_numpy(dtype=np.int64)
        + out["odd_quote_docs"].to_numpy(dtype=np.int64)
    )
    n = out["n_docs"].to_numpy(dtype=np.int64)
    dirty_ppm = np.array(
        [
            _round_half_away(float(d) / float(k) * 1e6) if k else 0
            for d, k in zip(dirty, n)
        ],
        np.int64,
    )
    return pa.table(
        {
            "source": pa.array(out["source"], pa.string()),
            "n_docs": pa.array(n, pa.int64()),
            "unbal_paren_docs": pa.array(
                out["unbal_paren_docs"].to_numpy(dtype=np.int64)
            ),
            "odd_quote_docs": pa.array(
                out["odd_quote_docs"].to_numpy(dtype=np.int64)
            ),
            "dirty_ppm": pa.array(dirty_ppm),
        }
    )


PAREN_SQL = """
WITH per AS MATERIALIZED (
  SELECT source,
         CASE WHEN LENGTH(text) - LENGTH(REPLACE(text, '(', ''))
              <> LENGTH(text) - LENGTH(REPLACE(text, ')', ''))
              THEN 1 ELSE 0 END AS unbal,
         CASE WHEN (LENGTH(text)
              - LENGTH(REPLACE(text, '"', ''))) % 2 = 1
              THEN 1 ELSE 0 END AS oddq
  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(unbal) AS BIGINT) AS unbal_paren_docs,
       CAST(SUM(oddq) AS BIGINT) AS odd_quote_docs,
       CAST(ROUND(CAST(SUM(unbal) + SUM(oddq) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) * 1000000, 0) AS BIGINT)
         AS dirty_ppm
FROM per GROUP BY source ORDER BY source
"""

_ZIPF_TOP = 100


def q_zipf_slope_per_source(sf_dir):
    """Per source: the Zipf slope — OLS of ln(freq) on ln(rank) over
    the top-100 words (count DESC, word ASC tie-break; ~-1 for
    natural text). Word counts fold through a (source, word)-sharded
    combine; each shard emits its local top-100 per source (shards
    are key-disjoint so the global top-100 is a merge of local
    ones); the fit runs on x1e4-snapped logs of exact ints."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("source", "text"))
        words = pc.split_pattern(b["text"], pattern=" ")
        lens = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        )
        src = np.repeat(
            b["source"].to_numpy(zero_copy_only=False), lens
        )
        t = pa.table(
            {
                "source": pa.array(src, pa.string()),
                "w": pc.list_flatten(words),
                "c": pa.array(np.ones(int(lens.sum()), np.int64)),
            }
        )
        g = t.group_by(["source", "w"]).aggregate([("c", "sum")])
        return g.rename_columns(["source", "w", "c"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "w"]).aggregate([("c", "sum")])
        return g.rename_columns(["source", "w", "c"])

    counts = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow",
                         batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["source", "w"],
    )

    def local_top(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "source" not in b.column_names:
            return pa.table(
                {"source": pa.array([], pa.string()),
                 "w": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64())}
            )
        df = b.select(["source", "w", "c"]).to_pandas()
        df = df.sort_values(
            ["source", "c", "w"], ascending=[True, False, True],
            ignore_index=True,
        )
        df = df.groupby("source", sort=False).head(_ZIPF_TOP)
        return pa.Table.from_pandas(df, preserve_index=False)

    top = (
        counts.map_batches(local_top, batch_format="pyarrow",
                           batch_size=None)
        .to_pandas()
    )
    cols = ["source", "n_ranks", "slope_x1e6"]
    out = {c: [] for c in cols}
    if len(top):
        top = top.sort_values(
            ["source", "c", "w"], ascending=[True, False, True],
            ignore_index=True,
        )
        for s, g in top.groupby("source", sort=True):
            g = g.head(_ZIPF_TOP)
            n = len(g)
            if n < 2:
                continue
            rank = np.arange(1, n + 1, dtype=np.float64)
            freq = g["c"].to_numpy(dtype=np.float64)
            x = _rha_vec(np.log(rank) * 1e4)
            y = _rha_vec(np.log(freq) * 1e4)
            sx, sy = int(x.sum()), int(y.sum())
            sxx, sxy = int(np.sum(x * x)), int(np.sum(x * y))
            den = n * sxx - sx * sx
            if den == 0:
                continue
            slope = float(n * sxy - sx * sy) / float(den)
            out["source"].append(s)
            out["n_ranks"].append(n)
            out["slope_x1e6"].append(_round_half_away(slope * 1e6))
    return pa.table(
        {
            "source": pa.array(out["source"], pa.string()),
            "n_ranks": pa.array(out["n_ranks"], pa.int64()),
            "slope_x1e6": pa.array(out["slope_x1e6"], pa.int64()),
        }
    )


ZIPF_SLOPE_SQL = f"""
WITH w AS MATERIALIZED (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
), counts AS MATERIALIZED (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM w GROUP BY 1, 2
), ranked AS MATERIALIZED (
  SELECT source, c,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY c DESC, w ASC)
              AS BIGINT) AS rank
  FROM counts
), top AS MATERIALIZED (
  SELECT source, rank,
         CAST(ROUND(LN(rank) * 10000, 0) AS BIGINT) AS x,
         CAST(ROUND(LN(c) * 10000, 0) AS BIGINT) AS y
  FROM ranked WHERE rank <= {_ZIPF_TOP}
), fit AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM top GROUP BY 1 HAVING COUNT(*) >= 2
)
SELECT source, n AS n_ranks,
       CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
            / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000, 0)
            AS BIGINT) AS slope_x1e6
FROM fit WHERE n * sxx - sx * sx <> 0 ORDER BY source
"""


def q_dep_clustering_coefficient(sf_dir):
    """Global clustering coefficient (transitivity) of the
    undirected part dependency graph: 3 * triangles / wedges, with
    the triangle census done by the forward algorithm (intersect
    higher-neighbor lists along each u<v edge) over the bounded
    dimension-scale edge list — exact integer T and W, only the
    ratio snaps x1e6."""
    src, dst, mx = _dep_edges(sf_dir)
    eu, ev, _ = _undirected(src, dst, mx)
    deg = np.bincount(
        np.concatenate([eu, ev]), minlength=mx + 2
    ).astype(np.int64)
    wedges = int(np.sum(deg * (deg - 1) // 2))
    # higher-neighbor adjacency: for each node, sorted neighbors > node
    hi = {}
    for u, v in zip(eu.tolist(), ev.tolist()):  # eu < ev by contract
        hi.setdefault(u, []).append(v)
    for u in hi:
        hi[u] = np.array(sorted(hi[u]), np.int64)
    tri = 0
    for u, v in zip(eu.tolist(), ev.tolist()):
        a = hi.get(u)
        b = hi.get(v)
        if a is None or b is None:
            continue
        tri += len(np.intersect1d(a, b, assume_unique=True))
    n_nodes = int(np.sum(deg > 0))
    trans = (
        None if wedges == 0
        else _round_half_away(3.0 * tri / float(wedges) * 1e6)
    )
    return pa.table(
        {
            "n_nodes": pa.array([n_nodes], pa.int64()),
            "n_edges": pa.array([len(eu)], pa.int64()),
            "n_triangles": pa.array([tri], pa.int64()),
            "n_wedges": pa.array([wedges], pa.int64()),
            "transitivity_x1e6": pa.array([trans], pa.int64()),
        }
    )


CLUSTERING_SQL = (
    "WITH "
    + _EDGES_SQL.strip()
    + """
, tri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS t
  FROM uedges e1
  JOIN uedges e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN uedges e3 ON e3.u = e1.v AND e3.v = e2.v
), wed AS (
  SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS n_nodes
  FROM deg
), ecount AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS e FROM uedges
)
SELECT wed.n_nodes AS n_nodes, ecount.e AS n_edges,
       tri.t AS n_triangles, wed.w AS n_wedges,
       CASE WHEN wed.w > 0 THEN
         CAST(ROUND(3.0 * CAST(tri.t AS DOUBLE)
              / CAST(wed.w AS DOUBLE) * 1000000, 0) AS BIGINT)
       END AS transitivity_x1e6
FROM tri, wed, ecount
"""
)


def register_r4ew(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "paren_balance_audit": q_paren_balance_audit,
            "zipf_slope_per_source": q_zipf_slope_per_source,
            "dep_clustering_coefficient": q_dep_clustering_coefficient,
        }
    )
    oracles.update(
        {
            "paren_balance_audit": PAREN_SQL,
            "zipf_slope_per_source": ZIPF_SLOPE_SQL,
            "dep_clustering_coefficient": CLUSTERING_SQL,
        }
    )
