"""Round-4 batch J: deterministic 1-D k-means over the bounded value
histogram — the iterative-training-loop representative (fixed quantile
seeds, fixed 3 Lloyd iterations, integer centroids by floor division),
oracled by an UNROLLED SQL iteration chain like the PageRank oracle.

Scale shape: the clustering state is k integers and every iteration
runs over the (x100 -> count) HISTOGRAM — bounded by the value domain
(<= ~33k distinct cents here), never by input rows — built once with
combiner-first partials + tree merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_K = 4
_ITERS = 3


def _assign(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest centroid; ties -> smallest cluster index (strict < scan)."""
    d = np.abs(x[:, None] - cents[None, :])
    return np.argmin(d, axis=1)  # np.argmin takes the first minimum


def q_kmeans_1d_value(sf_dir):
    """3 Lloyd iterations of k=4 one-dimensional k-means over x100 event
    values: seeds are the PERCENTILE_DISC values at q=(2j+1)/8, each
    iteration assigns every DISTINCT value (histogram grain) to its
    nearest centroid (ties -> smaller index) and recomputes centroids as
    floor-divided integer means (empty clusters keep their centroid).
    Output per cluster: centroid_x100, n, sse (exact int64)."""
    from mimirsbrunn_ray.stages.rollup import tree_merge
    from mimirsbrunn_ray.stages.timeseries import _round_half_away_x

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["value"]))
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table({"x": pa.array(x)})
        return (
            t.group_by(["x"]).aggregate([([], "count_all")])
            .rename_columns(["x", "cnt"])
        )

    hist = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["x"]).aggregate([("cnt", "sum")])
        .rename_columns(["x", "cnt"]),
    ).to_pandas()
    empty = pd.DataFrame(
        {
            "cluster": pd.Series([], dtype=np.int64),
            "centroid_x100": pd.Series([], dtype=np.int64),
            "n": pd.Series([], dtype=np.int64),
            "sse": pd.Series([], dtype=np.int64),
        }
    )
    if len(hist) == 0:
        return pa.Table.from_pandas(empty, preserve_index=False)
    hist = hist.sort_values("x", ignore_index=True)
    x = hist["x"].to_numpy(dtype=np.int64)
    cnt = hist["cnt"].to_numpy(dtype=np.int64)
    cum = np.cumsum(cnt)
    n_total = int(cum[-1])
    # seeds: PERCENTILE_DISC at (2j+1)/(2k) — rollup.py:325 rank rule
    cents = np.array(
        [
            x[np.searchsorted(
                cum, int(np.ceil((2 * j + 1) / (2 * _K) * n_total - 1e-9))
            )]
            for j in range(_K)
        ],
        dtype=np.int64,
    )
    for _ in range(_ITERS):
        a = _assign(x, cents)
        sums = np.zeros(_K, dtype=np.int64)
        ns = np.zeros(_K, dtype=np.int64)
        np.add.at(sums, a, x * cnt)
        np.add.at(ns, a, cnt)
        cents = np.where(ns > 0, sums // np.maximum(ns, 1), cents)
    a = _assign(x, cents)
    ns = np.zeros(_K, dtype=np.int64)
    sse = np.zeros(_K, dtype=np.int64)
    np.add.at(ns, a, cnt)
    np.add.at(sse, a, cnt * (x - cents[a]) ** 2)
    return pa.table(
        {
            "cluster": pa.array(np.arange(_K, dtype=np.int64)),
            "centroid_x100": pa.array(cents),
            "n": pa.array(ns),
            "sse": pa.array(sse),
        }
    )


def _sql_assign(cent_cte: str) -> str:
    """Nearest-centroid CASE with ties -> smallest index."""
    return f"""
  SELECT h.x, h.cnt,
         CASE
           WHEN abs(h.x - c.c0) <= abs(h.x - c.c1)
            AND abs(h.x - c.c0) <= abs(h.x - c.c2)
            AND abs(h.x - c.c0) <= abs(h.x - c.c3) THEN 0
           WHEN abs(h.x - c.c1) <= abs(h.x - c.c2)
            AND abs(h.x - c.c1) <= abs(h.x - c.c3) THEN 1
           WHEN abs(h.x - c.c2) <= abs(h.x - c.c3) THEN 2
           ELSE 3
         END AS a
  FROM h CROSS JOIN {cent_cte} c
"""


def _sql_recenter(assign_cte: str, prev_cte: str) -> str:
    """Floor-divided integer means; empty clusters keep their centroid."""
    return f"""
  SELECT
    COALESCE((SELECT SUM(x * cnt) // SUM(cnt) FROM {assign_cte} WHERE a = 0),
             (SELECT c0 FROM {prev_cte})) AS c0,
    COALESCE((SELECT SUM(x * cnt) // SUM(cnt) FROM {assign_cte} WHERE a = 1),
             (SELECT c1 FROM {prev_cte})) AS c1,
    COALESCE((SELECT SUM(x * cnt) // SUM(cnt) FROM {assign_cte} WHERE a = 2),
             (SELECT c2 FROM {prev_cte})) AS c2,
    COALESCE((SELECT SUM(x * cnt) // SUM(cnt) FROM {assign_cte} WHERE a = 3),
             (SELECT c3 FROM {prev_cte})) AS c3
"""


KMEANS_SQL = f"""
WITH h AS MATERIALIZED (
  SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
cumh AS MATERIALIZED (
  SELECT x, cnt, SUM(cnt) OVER (ORDER BY x
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM h
),
tot AS MATERIALIZED (SELECT SUM(cnt) AS n FROM h),
seeds AS MATERIALIZED (
  -- smallest x with cum >= ceil(q*n) — the engine's PERCENTILE_DISC rank
  SELECT
    (SELECT MIN(x) FROM cumh WHERE cum >=
      CAST(ceil(0.125 * (SELECT n FROM tot) - 1e-9) AS BIGINT)) AS c0,
    (SELECT MIN(x) FROM cumh WHERE cum >=
      CAST(ceil(0.375 * (SELECT n FROM tot) - 1e-9) AS BIGINT)) AS c1,
    (SELECT MIN(x) FROM cumh WHERE cum >=
      CAST(ceil(0.625 * (SELECT n FROM tot) - 1e-9) AS BIGINT)) AS c2,
    (SELECT MIN(x) FROM cumh WHERE cum >=
      CAST(ceil(0.875 * (SELECT n FROM tot) - 1e-9) AS BIGINT)) AS c3
),
a1 AS MATERIALIZED ({_sql_assign('seeds')}),
c1 AS MATERIALIZED ({_sql_recenter('a1', 'seeds')}),
a2 AS MATERIALIZED ({_sql_assign('c1')}),
c2 AS MATERIALIZED ({_sql_recenter('a2', 'c1')}),
a3 AS MATERIALIZED ({_sql_assign('c2')}),
c3 AS MATERIALIZED ({_sql_recenter('a3', 'c2')}),
final AS MATERIALIZED ({_sql_assign('c3')}),
cents(cluster, centroid_x100) AS (
  SELECT 0, (SELECT c0 FROM c3) UNION ALL SELECT 1, (SELECT c1 FROM c3)
  UNION ALL SELECT 2, (SELECT c2 FROM c3)
  UNION ALL SELECT 3, (SELECT c3 FROM c3)
)
SELECT cents.cluster,
       CAST(cents.centroid_x100 AS BIGINT) AS centroid_x100,
       CAST(COALESCE(SUM(f.cnt), 0) AS BIGINT) AS n,
       CAST(COALESCE(SUM(f.cnt * (f.x - cents.centroid_x100)
                         * (f.x - cents.centroid_x100)), 0) AS BIGINT) AS sse
FROM cents LEFT JOIN final f ON f.a = cents.cluster
GROUP BY 1, 2
"""


def register_r4j(queries: dict, oracles: dict) -> None:
    queries.update({"kmeans_1d_value": q_kmeans_1d_value})
    oracles.update({"kmeans_1d_value": KMEANS_SQL})
